"""Tests for the round-5 batch-65 online-algorithm operators
(onlinealgo_ops): secretary_stop, prophet_threshold, ski_rental —
DuckDB parity plus guarantee pins. The secretary test plants the
best candidate after the observation window (picked, is_best = 1)
and before it (fallback fires); the prophet pick is ≥ max/2 by
construction; every ski-rental per-user ratio respects the 2 − 1/B
competitive bound, hit exactly by users with d = B.
"""

from __future__ import annotations

import sys
from datetime import datetime, timedelta

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.onlinealgo_ops import (
    E_DEN,
    E_NUM,
    PROPHET_THRESHOLD_SQL,
    SECRETARY_STOP_SQL,
    SKI_B,
    SKI_RENTAL_SQL,
    q_prophet_threshold,
    q_secretary_stop,
    q_ski_rental,
)

BASE = datetime(2024, 11, 4)


def _write_docs(d, n_chars):
    n = len(n_chars)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )


def _write_events(d, user_days):
    rows = []
    for u, days in enumerate(user_days):
        for day in range(days):
            rows.append((u, BASE + timedelta(days=day)))
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
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _parity(ray_df, sql_df):
    pd.testing.assert_frame_equal(
        _canon(ray_df), _canon(sql_df), check_dtype=False
    )


def _unwrap(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def test_secretary_picks_late_best(ray_session, tmp_path):
    n = 100
    k = n * E_NUM // E_DEN  # 36
    chars = [100 + (i % 30) for i in range(n)]
    chars[70] = 10_000  # the best, after the window
    _write_docs(tmp_path, chars)
    got = _unwrap(q_secretary_stop(str(tmp_path))).iloc[0]
    assert int(got["k"]) == k
    assert int(got["picked_pos"]) == 71  # 1-based
    assert int(got["picked_value"]) == 10_000
    assert int(got["is_best"]) == 1
    _parity(
        _unwrap(q_secretary_stop(str(tmp_path))),
        _oracle(tmp_path, SECRETARY_STOP_SQL),
    )


def test_secretary_fallback_when_best_observed(ray_session, tmp_path):
    n = 100
    chars = [100 + (i % 30) for i in range(n)]
    chars[5] = 10_000  # the best sits INSIDE the observation window
    _write_docs(tmp_path, chars)
    got = _unwrap(q_secretary_stop(str(tmp_path))).iloc[0]
    assert int(got["picked_pos"]) == n  # classical fallback: last
    assert int(got["is_best"]) == 0
    _parity(
        _unwrap(q_secretary_stop(str(tmp_path))),
        _oracle(tmp_path, SECRETARY_STOP_SQL),
    )


def test_prophet_half_guarantee(ray_session, tmp_path):
    chars = [10, 400, 50, 900, 30, 1000, 20]
    _write_docs(tmp_path, chars)
    got = _unwrap(q_prophet_threshold(str(tmp_path))).iloc[0]
    assert int(got["threshold"]) == (1000 + 1) // 2
    # first value ≥ 500.5-ish → 900 at position 4
    assert int(got["picked_pos"]) == 4
    assert int(got["picked_value"]) == 900
    assert 2 * int(got["picked_value"]) >= int(got["max_value"])
    _parity(
        _unwrap(q_prophet_threshold(str(tmp_path))),
        _oracle(tmp_path, PROPHET_THRESHOLD_SQL),
    )


def test_ski_rental_bound_tight_at_B(ray_session, tmp_path):
    days = [1, 3, SKI_B, SKI_B + 5, 30, 2, SKI_B]
    _write_events(tmp_path, days)
    got = _unwrap(q_ski_rental(str(tmp_path))).iloc[0]
    # worst per-user ratio = (2B−1)/B, achieved at d = B exactly
    assert int(got["worst_ratio_x100"]) == 100 * (2 * SKI_B - 1) // SKI_B
    # aggregate online never beats OPT, never exceeds 2×OPT
    assert (
        int(got["total_opt"])
        <= int(got["total_online"])
        <= 2 * int(got["total_opt"])
    )
    _parity(
        _unwrap(q_ski_rental(str(tmp_path))),
        _oracle(tmp_path, SKI_RENTAL_SQL, "events"),
    )
