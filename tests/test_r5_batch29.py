"""Tests for the round-5 batch-29 stream/embedding operators
(streamstat_ops): prefix_autocomplete, cosine_histogram,
length_lag1_corr — DuckDB-oracle parity plus brute force. The lag
test plants a strongly alternating length sequence (negative serial
correlation) to exercise the signed-square floor convention.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.streamstat_ops import (
    COSINE_HISTOGRAM_SQL,
    HIST_SCALE,
    LENGTH_LAG1_CORR_SQL,
    PFX_LEN,
    PREFIX_AUTOCOMPLETE_SQL,
    q_cosine_histogram,
    q_length_lag1_corr,
    q_prefix_autocomplete,
)

N_DOCS = 40
DIM = 6


def _texts(n=N_DOCS):
    words = [
        "merge", "mercy", "mermaid", "window", "winner", "wind",
        "quark", "quartz",
    ]
    out = []
    for i in range(n):
        toks = [words[(i + j) % len(words)] for j in range(3 + i % 4)]
        toks += ["ab"]  # too short to have a completion
        out.append(" ".join(toks))
    return out


def _lengths(n=N_DOCS):
    # alternating short/long -> strongly negative lag-1 correlation
    return [50 if i % 2 == 0 else 400 + i % 7 for i in range(n)]


def _vecs(n=N_DOCS, dim=DIM):
    out = []
    for i in range(n):
        v = [
            ((int(hashlib.md5(f"ch|{i}|{j}".encode()).hexdigest()[:8], 16) % 2001)
             - 1000) / 1000.0
            for j in range(dim)
        ]
        out.append(v)
    return out


def _write_tables(d, n=N_DOCS):
    texts = _texts(n)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
                "n_chars": pa.array(_lengths(n), pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(_vecs(n), pa.list_(pa.float32())),
                "label": pa.array([i % 2 for i in range(n)], pa.int64()),
            }
        ),
        str(d / "embeddings.parquet"),
    )


def _oracle(d, sql):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _parity(ray_df, sql_df):
    pd.testing.assert_frame_equal(
        _canon(ray_df), _canon(sql_df), check_dtype=False
    )


def _unwrap(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def test_prefix_autocomplete_brute_force_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_prefix_autocomplete(str(tmp_path)))

    counts: dict[str, int] = {}
    for t in _texts():
        for tok in t.lower().split():
            if len(tok) > PFX_LEN:
                counts[tok] = counts.get(tok, 0) + 1
    exp: dict[str, tuple] = {}
    for tok, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])):
        p = tok[:PFX_LEN]
        if p not in exp:
            exp[p] = (tok, c)
    assert {
        r["prefix"]: (r["top_token"], int(r["n"])) for _, r in got.iterrows()
    } == exp
    # "ab" (len <= PFX_LEN) must NOT create a prefix entry
    assert "ab" not in set(got["prefix"])
    # "mer" prefix has three competing completions -> argmax exercised
    assert "mer" in exp

    _parity(got, _oracle(tmp_path, PREFIX_AUTOCOMPLETE_SQL))


def test_cosine_histogram_brute_force_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_cosine_histogram(str(tmp_path)))

    mat = np.floor(
        np.array(_vecs(), np.float32).astype(np.float64) * 1000.0
    ).astype(np.int64)
    n = len(mat)
    exp: dict[int, int] = {}
    for i in range(n):
        for j in range(i + 1, n):
            dot = int(mat[i] @ mat[j])
            a2 = int(mat[i] @ mat[i])
            b2 = int(mat[j] @ mat[j])
            denom = a2 * b2
            v = (dot * abs(dot) * HIST_SCALE + denom * HIST_SCALE) // denom - HIST_SCALE
            exp[v] = exp.get(v, 0) + 1
    assert {
        int(r["bucket"]): int(r["n_pairs"]) for _, r in got.iterrows()
    } == exp
    assert sum(exp.values()) == n * (n - 1) // 2
    # random vectors spread across negative AND positive buckets
    assert min(exp) < 0 < max(exp)

    _parity(got, _oracle(tmp_path, COSINE_HISTOGRAM_SQL))


def test_length_lag1_brute_force_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_length_lag1_corr(str(tmp_path)))

    v = _lengths()
    x, y = v[:-1], v[1:]
    m = len(x)
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sx2, sy2 = sum(a * a for a in x), sum(b * b for b in y)
    cov = m * sxy - sx * sy
    varx, vary = m * sx2 - sx * sx, m * sy2 - sy * sy
    corr2 = (1 if cov >= 0 else -1) * (
        (cov * cov) * 1_000_000 // (varx * vary)
    )
    r = got.iloc[0]
    assert int(r["n_pairs"]) == m
    assert int(r["corr2_ppm"]) == corr2
    # the planted alternation is strongly anti-correlated
    assert corr2 < -800_000

    _parity(got, _oracle(tmp_path, LENGTH_LAG1_CORR_SQL))
