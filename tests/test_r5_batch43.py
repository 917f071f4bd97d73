"""Tests for the round-5 batch-43 query-processing operators
(queryproc_ops): skyline_query, topk_threshold, priority_sample —
DuckDB parity plus independent brute force. The skyline test plants
dominated and incomparable points (ties included); the TA test
recomputes the exact stop round and checks it is genuinely early on a
correlated corpus; the priority-sampling test checks the estimator's
subset-sum accuracy and the top-(k+1) threshold rule.
"""

from __future__ import annotations

import hashlib
import re
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.queryproc_ops import (
    PRIORITY_SAMPLE_SQL,
    PS_K,
    PS_M,
    SKYLINE_QUERY_SQL,
    TA_K,
    TOPK_THRESHOLD_SQL,
    q_priority_sample,
    q_skyline_query,
    q_topk_threshold,
)

TOK = re.compile(r"[^ \t\n\r\f]+")


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _corpus():
    """x = n_chars, y = distinct tokens; correlated with planted
    skyline structure: doc 0 dominates everything except docs 1/2
    which are incomparable with it; doc 3 ties doc 1 exactly."""
    texts, n_chars = [], []
    texts.append(" ".join(f"t{j}" for j in range(50)))  # y=50
    n_chars.append(10_000)  # dominated by nobody
    texts.append(" ".join(f"u{j}" for j in range(80)))  # y=80 (max)
    n_chars.append(50)
    texts.append(" ".join(f"v{j}" for j in range(60)))  # y=60, x mid
    n_chars.append(9_000)
    texts.append(" ".join(f"u{j}" for j in range(80)))  # tie of doc 1
    n_chars.append(50)
    for i in range(56):
        texts.append(" ".join(f"w{j}" for j in range(5 + i % 20)))
        n_chars.append(100 + 10 * (i % 20))
    return texts, n_chars


def _write(d, texts=None, n_chars=None):
    if texts is None:
        texts, n_chars = _corpus()
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
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


def _xy(texts, n_chars):
    return [
        (x, len(set(TOK.findall(t.lower()))))
        for t, x in zip(texts, n_chars)
    ]


def test_skyline_brute_force_ties_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    texts, n_chars = _corpus()
    got = _unwrap(q_skyline_query(str(tmp_path)))
    pts = _xy(texts, n_chars)
    brute = {
        i
        for i, (x, y) in enumerate(pts)
        if not any(
            x2 >= x and y2 >= y and (x2 > x or y2 > y)
            for j, (x2, y2) in enumerate(pts)
            if j != i
        )
    }
    assert set(got["doc_id"].astype(int)) == brute
    # planted: 0 and 2 survive; the tied pair 1 and 3 BOTH survive
    assert {0, 1, 2, 3} <= brute
    _parity(got, _oracle(tmp_path, SKYLINE_QUERY_SQL))


def test_ta_stop_round_brute_force_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    texts, n_chars = _corpus()
    got = _unwrap(q_topk_threshold(str(tmp_path)))
    pts = _xy(texts, n_chars)
    scores = sorted(
        ((x + y, i) for i, (x, y) in enumerate(pts)),
        key=lambda t: (-t[0], t[1]),
    )
    kth = scores[min(TA_K, len(scores)) - 1][0]
    xs = sorted((x for x, _ in pts), reverse=True)
    ys = sorted((y for _, y in pts), reverse=True)
    stop = next(
        (
            r + 1
            for r in range(len(pts))
            if kth >= xs[r] + ys[r]
        ),
        len(pts),
    )
    assert int(got["stop_round"].iloc[0]) == stop
    assert stop < len(pts) // 2  # TA stops genuinely early here
    assert [int(s) for s in got["score"]] == [s for s, _ in scores[:TA_K]]
    _parity(got, _oracle(tmp_path, TOPK_THRESHOLD_SQL))


def test_priority_sample_estimator_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    texts, n_chars = _corpus()
    got = _unwrap(q_priority_sample(str(tmp_path)))
    assert len(got) == PS_K
    # brute force the priorities and tau
    pri = []
    for i, w in enumerate(n_chars):
        h = _md5_64(f"ps:42:{i}") % PS_M + 1
        pri.append((w * PS_M // h, i, w))
    pri.sort(key=lambda t: (-t[0], t[1]))
    tau = pri[PS_K][0]
    exp = {
        i: max(100 * w, 100 * tau // PS_M)
        for _, i, w in pri[:PS_K]
    }
    assert {
        int(r["doc_id"]): int(r["est_x100"]) for _, r in got.iterrows()
    } == exp
    # estimator property: the sample-sum estimate lands near the truth
    total = sum(n_chars)
    est = sum(exp.values()) / 100
    assert abs(est - total) / total < 0.5
    _parity(got, _oracle(tmp_path, PRIORITY_SAMPLE_SQL))
