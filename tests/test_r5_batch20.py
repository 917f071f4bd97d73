"""Tests for the round-5 batch-20 training-audit operators
(trainaudit_ops): shuffle_mixing_audit, otsu_threshold — DuckDB-oracle
parity plus brute force.
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

from europarl_crawler_ray.pipelines.trainaudit_ops import (
    OTSU_THRESHOLD_SQL,
    SHUFFLE_MIXING_AUDIT_SQL,
    q_otsu_threshold,
    q_shuffle_mixing_audit,
)
from europarl_crawler_ray.pipelines.webtext_ops import EPOCH_SEED

N_DOCS = 60


def _lengths(n=N_DOCS):
    # bimodal lengths so Otsu has a real valley to find
    return [30 + i % 7 if i % 2 == 0 else 400 + i % 11 for i in range(n)]


def _write_docs(d, n=N_DOCS):
    lens = _lengths(n)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x" * ln for ln in lens], pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
                "n_chars": pa.array(lens, pa.int64()),
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


def test_shuffle_mixing_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_shuffle_mixing_audit(str(tmp_path)))

    order = sorted(
        range(N_DOCS),
        key=lambda i: (
            hashlib.md5(f"{EPOCH_SEED}|{i}".encode()).hexdigest(),
            i,
        ),
    )
    srcs = [f"s{i % 3}" for i in order]
    same = sum(1 for a, b in zip(srcs, srcs[1:]) if a == b)
    counts = {s: srcs.count(s) for s in set(srcs)}
    exp_num = sum(c * (c - 1) for c in counts.values())
    r = got.iloc[0]
    assert int(r["n_docs"]) == N_DOCS
    assert int(r["n_adjacencies"]) == N_DOCS - 1
    assert int(r["same_src_pairs"]) == same
    assert int(r["observed_ppm"]) == same * 1_000_000 // (N_DOCS - 1)
    assert int(r["expected_ppm"]) == exp_num * 1_000_000 // N_DOCS
    # a real md5 shuffle should land within 3x of the expectation
    assert 0 < int(r["observed_ppm"]) < 3 * int(r["expected_ppm"])

    _parity(got, _oracle(tmp_path, SHUFFLE_MIXING_AUDIT_SQL))


def test_otsu_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_otsu_threshold(str(tmp_path)))

    lens = _lengths()
    vals = sorted(set(lens))
    n_tot, s_tot = len(lens), sum(lens)
    best = None
    for v in vals:
        n0 = sum(1 for x in lens if x <= v)
        s0 = sum(x for x in lens if x <= v)
        n1, s1 = n_tot - n0, s_tot - s0
        if n0 == 0 or n1 == 0:
            continue
        num = s0 * n1 - s1 * n0
        score = (num * num) // (n0 * n1)
        if best is None or score > best[0]:
            best = (score, v, n0, n1)
    score, thr, n0, n1 = best
    r = got.iloc[0]
    assert int(r["threshold"]) == thr
    assert (int(r["n_below"]), int(r["n_above"])) == (n0, n1)
    assert int(r["score"]) == score
    # bimodal data: the cutoff must close off the low mode (30..36)
    # before the high mode (400..410) starts
    assert 36 <= thr < 400

    _parity(got, _oracle(tmp_path, OTSU_THRESHOLD_SQL))


def test_otsu_single_value_fallback(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": pa.array(["xxxx"] * 5, pa.string()),
                "lang": pa.array(["en"] * 5, pa.string()),
                "source": pa.array(["s0"] * 5, pa.string()),
                "n_chars": pa.array([4] * 5, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = _unwrap(q_otsu_threshold(str(tmp_path)))
    r = got.iloc[0]
    assert int(r["threshold"]) == 4
    assert int(r["n_below"]) == 5
    assert int(r["n_above"]) == 0
    assert int(r["score"]) == 0

    _parity(got, _oracle(tmp_path, OTSU_THRESHOLD_SQL))
