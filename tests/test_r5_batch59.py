"""Tests for the round-5 batch-59 moment-fit operators
(momentfit_ops): lognormal_fit, gamma_fit, geometric_fit — DuckDB
parity plus brute force. Pins: the gamma moments match a hand
computation and a constant column degenerates to the −1 sentinel;
the log-normal μ of an exp-spaced corpus recovers the construction
mean; a corpus drawn EXACTLY from a geometric head matches its own
prediction cell-for-cell.
"""

from __future__ import annotations

import math
import sys
from datetime import datetime, timedelta

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.momentfit_ops import (
    GAMMA_FIT_SQL,
    GEO_K,
    LOGNORMAL_FIT_SQL,
    _geometric_sql,
    q_gamma_fit,
    q_geometric_fit,
    q_lognormal_fit,
)


def _write_docs(d, langs, n_chars):
    n = len(langs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )


def _write_events(d, user_counts):
    rows = []
    base = datetime(2024, 7, 1)
    for u, c in enumerate(user_counts):
        for j in range(c):
            rows.append((u, base + timedelta(minutes=u * 100 + j)))
    n = len(rows)
    us, ts = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(list(ts), pa.timestamp("us")),
                "user_id": pa.array(list(us), pa.int64()),
                "event_type": pa.array(["e"] * n, pa.string()),
                "value": pa.array([0.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )


def _oracle(d, sql, table="documents"):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{d}/{table}.parquet')"
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


def test_gamma_brute_force_and_degenerate(ray_session, tmp_path):
    langs = ["a"] * 30 + ["flat"] * 10
    chars = [100 + (i * 37) % 400 for i in range(30)] + [500] * 10
    _write_docs(tmp_path, langs, chars)
    got = _unwrap(q_gamma_fit(str(tmp_path)))
    g = {r["lang"]: r for _, r in got.iterrows()}
    xs = chars[:30]
    n, s1 = len(xs), sum(xs)
    s2 = sum(x * x for x in xs)
    var_num = n * s2 - s1 * s1
    assert int(g["a"]["k_x1e6"]) == 10**6 * s1 * s1 // var_num
    assert int(g["a"]["theta_x100"]) == 100 * var_num // (n * s1)
    # constant column: variance 0 -> sentinel
    assert int(g["flat"]["k_x1e6"]) == -1
    _parity(got, _oracle(tmp_path, GAMMA_FIT_SQL))


def test_lognormal_recovers_log_mean(ray_session, tmp_path):
    # exp-spaced lengths: ln values are 4.0 .. 8.0 evenly
    chars = [int(round(math.exp(4 + 0.5 * k))) for k in range(9)]
    _write_docs(tmp_path, ["en"] * 9, chars)
    got = _unwrap(q_lognormal_fit(str(tmp_path))).iloc[0]
    qs = [int(math.floor(1e9 * math.log(v))) for v in chars]
    assert int(got["mu_x1e9"]) == sum(qs) // len(qs)
    # mean log is ~6.0 (rounding shifts it slightly)
    assert abs(int(got["mu_x1e9"]) / 1e9 - 6.0) < 0.01
    _parity(
        _unwrap(q_lognormal_fit(str(tmp_path))),
        _oracle(tmp_path, LOGNORMAL_FIT_SQL),
    )


def test_geometric_exact_head_and_parity(ray_session, tmp_path):
    # build users whose count histogram IS a geometric head with
    # p = 1/2 over 64 users: 32 ones, 16 twos, 8 threes, ...
    counts = []
    n, k = 32, 1
    while n >= 1 and k <= GEO_K:
        counts += [k] * n
        n //= 2
        k += 1
    _write_events(tmp_path, counts)
    got = _unwrap(q_geometric_fit(str(tmp_path)))
    obs = dict(zip(got["k"].astype(int), got["observed"].astype(int)))
    assert obs[1] == 32 and obs[2] == 16 and obs[3] == 8
    # the MLE recovers p near 1/2, so predictions track observations
    for _, r in got.iterrows():
        o, p = int(r["observed"]), int(r["predicted_x100"]) / 100
        assert abs(o - p) <= max(2.0, 0.35 * max(o, 1))
    _parity(got, _oracle(tmp_path, _geometric_sql(), table="events"))
