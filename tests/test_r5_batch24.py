"""Tests for the round-5 batch-24 IR/distribution audit operators
(iraudit_ops): prf_expand, token_position_bias,
length_tolerance_interval — DuckDB-oracle parity plus brute force.
The position-bias test plants a header token pinned to position 0.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.iraudit_ops import (
    LENGTH_TOLERANCE_INTERVAL_SQL,
    PRF_T,
    TOKEN_POSITION_BIAS_SQL,
    TOL_ALPHA_BP,
    TPB_K,
    _prf_sql,
    q_length_tolerance_interval,
    q_prf_expand,
    q_token_position_bias,
)
from europarl_crawler_ray.pipelines.weblinkage_ops import BM25_QUERY, q_bm25_rank

N_DOCS = 60


def _texts(n=N_DOCS):
    out = []
    for i in range(n):
        body = [f"w{(i * 3 + j) % 15}" for j in range(4 + i % 6)]
        if i % 2 == 0:
            body.insert(0, BM25_QUERY[0])  # make the bm25 query non-empty
        if i % 3 == 0:
            body.append(BM25_QUERY[1])
        out.append("header " + " ".join(body))  # planted position-0 token
    return out


def _write_docs(d, n=N_DOCS):
    texts = _texts(n)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )


def _oracle(d, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
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


def test_prf_expand_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_prf_expand(str(tmp_path)))

    top = _unwrap(q_bm25_rank(str(tmp_path)))
    fb = set(int(v) for v in top["doc_id"])
    texts = _texts()
    tf: dict[str, int] = {}
    df_: dict[str, int] = {}
    for i in fb:
        toks = [t for t in texts[i].split(" ") if t and t not in BM25_QUERY]
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t in set(toks):
            df_[t] = df_.get(t, 0) + 1
    exp = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:PRF_T]
    assert [
        (r["token"], int(r["fb_tf"]), int(r["fb_df"]))
        for _, r in got.iterrows()
    ] == [(t, c, df_[t]) for t, c in exp]
    assert list(got["expansion_rank"]) == list(range(1, len(exp) + 1))
    # the planted header token dominates the feedback set
    assert got["token"].iloc[0] == "header"

    _parity(got, _oracle(tmp_path, _prf_sql()))


def test_token_position_bias_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_token_position_bias(str(tmp_path)))

    texts = _texts()
    glob: dict[str, int] = {}
    for t in texts:
        for tok in t.lower().split():
            glob[tok] = glob.get(tok, 0) + 1
    topk = {
        t
        for t, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:TPB_K]
    }
    acc: dict[str, list] = {}
    for t in texts:
        toks = t.lower().split()
        if len(toks) < 2:
            continue
        span = len(toks) - 1
        for i, tok in enumerate(toks):
            if tok in topk:
                r = acc.setdefault(tok, [0, 0])
                r[0] += i * 1_000_000 // span
                r[1] += 1
    exp = {t: (v[1], v[0] // v[1]) for t, v in acc.items()}
    assert {
        r["token"]: (int(r["n_occ"]), int(r["mean_pos_ppm"]))
        for _, r in got.iterrows()
    } == exp
    # the planted header token is pinned to position zero
    hdr = got[got["token"] == "header"]
    assert len(hdr) == 1 and int(hdr["mean_pos_ppm"].iloc[0]) == 0
    # body tokens spread across positions
    assert int(got["mean_pos_ppm"].max()) > 300_000

    _parity(got, _oracle(tmp_path, TOKEN_POSITION_BIAS_SQL))


def test_tolerance_interval_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_length_tolerance_interval(str(tmp_path)))

    lens = sorted(len(t) for t in _texts())
    n = len(lens)
    tail = n * TOL_ALPHA_BP // 2 // 10000
    lo_rank, hi_rank = tail + 1, n - tail
    r = got.iloc[0]
    assert int(r["n_docs"]) == n
    assert (int(r["lo_rank"]), int(r["hi_rank"])) == (lo_rank, hi_rank)
    assert int(r["lo_value"]) == lens[lo_rank - 1]
    assert int(r["hi_value"]) == lens[hi_rank - 1]
    assert int(r["lo_value"]) < int(r["hi_value"])

    _parity(got, _oracle(tmp_path, LENGTH_TOLERANCE_INTERVAL_SQL))
