"""Tests for the round-5 batch-63 time-series operators
(robustts_ops): stl_lite, holt_linear, theil_sen — DuckDB parity
plus property pins. The decomposition identity value = trend +
seasonal + resid holds row-exactly by construction and a planted
weekly pattern is recovered in the seasonal component; Holt tracks a
linear ramp (trend ≈ the ramp slope); Theil-Sen ignores planted
outliers that wreck the least-squares slope.
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

from europarl_crawler_ray.pipelines.robustts_ops import (
    HOLT_H,
    HOLT_LINEAR_SQL,
    STL_LITE_SQL,
    THEIL_SEN_SQL,
    q_holt_linear,
    q_stl_lite,
    q_theil_sen,
)

BASE = datetime(2024, 10, 7)  # a Monday


def _write_events(d, day_values):
    rows = []
    for day, v in enumerate(day_values):
        for j in range(3):
            rows.append((BASE + timedelta(days=day, minutes=j), float(v)))
    n = len(rows)
    ts, vs = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(list(ts), pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["e"] * n, pa.string()),
                "value": pa.array(list(vs), pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )


def _oracle(d, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
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


def test_stl_identity_and_weekly_pattern(ray_session, tmp_path):
    # flat level 100 with a +40 bump every 7th day (same weekday)
    vals = [100 + (40 if d % 7 == 0 else 0) for d in range(28)]
    _write_events(tmp_path, vals)
    got = _unwrap(q_stl_lite(str(tmp_path))).sort_values("day")
    # exact identity
    assert (
        got["value_x100"].to_numpy(np.int64)
        == got["trend_x100"].to_numpy(np.int64)
        + got["seasonal_x100"].to_numpy(np.int64)
        + got["resid_x100"].to_numpy(np.int64)
    ).all()
    # the bump weekday carries the LARGEST seasonal component
    dow = got["day"].to_numpy(np.int64) % 7
    seas = got["seasonal_x100"].to_numpy(np.int64)
    bump_dow = int(dow[0])  # first written day is a bump day
    for w in set(int(x) for x in dow):
        if w != bump_dow:
            assert seas[dow == bump_dow][0] > seas[dow == w][0]
    _parity(
        _unwrap(q_stl_lite(str(tmp_path))), _oracle(tmp_path, STL_LITE_SQL)
    )


def test_holt_tracks_linear_ramp(ray_session, tmp_path):
    vals = [100 + 10 * d for d in range(40)]  # slope 10/day
    _write_events(tmp_path, vals)
    got = _unwrap(q_holt_linear(str(tmp_path))).iloc[0]
    # ×10⁴ scale (cents ×100): slope 10 → trend ≈ 10·10⁴
    assert abs(int(got["trend_x100"]) - 10 * 10**4) < 2 * 10**4
    # forecast extends the ramp
    last = (100 + 10 * 39) * 10**4
    fc = int(got["forecast_x100"])
    assert last < fc < last + 2 * HOLT_H * 10 * 10**4
    _parity(
        _unwrap(q_holt_linear(str(tmp_path))),
        _oracle(tmp_path, HOLT_LINEAR_SQL),
    )


def test_theil_sen_robust_to_outliers(ray_session, tmp_path):
    vals = [50 + 2 * d for d in range(30)]  # slope 2/day
    vals[5] = 100000  # wild outliers
    vals[20] = 0
    _write_events(tmp_path, vals)
    got = _unwrap(q_theil_sen(str(tmp_path))).iloc[0]
    # ×10⁶ on the ×10⁴ value scale: slope 2 → 2·10¹⁰
    slope = int(got["slope_x1e6"])
    assert abs(slope - 2 * 10**10) < 2 * 10**9  # within 10%
    assert int(got["n_pairs"]) == 30 * 29 // 2
    _parity(
        _unwrap(q_theil_sen(str(tmp_path))), _oracle(tmp_path, THEIL_SEN_SQL)
    )
