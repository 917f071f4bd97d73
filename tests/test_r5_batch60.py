"""Tests for the round-5 batch-60 sequential-control operators
(controlchart_ops): sprt_decision, page_hinkley, shewhart_chart —
DuckDB parity plus brute force. Pins: an all-success stream accepts
H1 at the exact Wald stopping time ⌈thr/A⌉; a mean-shift stream
raises the Page-Hinkley alarm after the shift day and a steady one
never does; Shewhart flags exactly the planted outlier day.
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

from europarl_crawler_ray.pipelines.controlchart_ops import (
    PAGE_HINKLEY_SQL,
    PH_LAMBDA,
    SHEWHART_CHART_SQL,
    SPRT_A,
    SPRT_B,
    SPRT_DECISION_SQL,
    SPRT_TERM,
    SPRT_THR,
    q_page_hinkley,
    q_shewhart_chart,
    q_sprt_decision,
)

BASE = datetime(2024, 8, 1)


def _write_docs(d, succ_pattern):
    n = len(succ_pattern)
    texts = [
        (f"filler {SPRT_TERM} words" if s else "filler words only")
        for s in succ_pattern
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )


def _write_events(d, day_values):
    rows = []
    for day, vals in enumerate(day_values):
        for j, v in enumerate(vals):
            rows.append((BASE + timedelta(days=day, minutes=j), v))
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


def _oracle(d, sql, table):
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


def test_sprt_all_success_wald_time(ray_session, tmp_path):
    _write_docs(tmp_path, [1] * 40)
    got = _unwrap(q_sprt_decision(str(tmp_path))).iloc[0]
    t_exp = -(-SPRT_THR // SPRT_A)  # ceil
    assert int(got["decision"]) == 1
    assert int(got["t_stop"]) == t_exp
    _parity(
        _unwrap(q_sprt_decision(str(tmp_path))),
        _oracle(tmp_path, SPRT_DECISION_SQL, "documents"),
    )


def test_sprt_alternating_undecided(ray_session, tmp_path):
    _write_docs(tmp_path, [1, 0] * 15)
    got = _unwrap(q_sprt_decision(str(tmp_path))).iloc[0]
    # balanced evidence: |LLR| stays tiny (|A| ≈ |B|), never crosses
    assert int(got["decision"]) == 0
    assert int(got["t_stop"]) == 30
    # brute-force the final LLR
    k, t = 15, 30
    assert int(got["llr_x1e9"]) == SPRT_A * k + SPRT_B * (t - k)
    _parity(
        _unwrap(q_sprt_decision(str(tmp_path))),
        _oracle(tmp_path, SPRT_DECISION_SQL, "documents"),
    )


def test_page_hinkley_shift_alarm_and_parity(ray_session, tmp_path):
    # 10 steady days at 100.0, then 10 collapsed days at 1.0
    days = [[100.0] * 5] * 10 + [[1.0] * 5] * 10
    _write_events(tmp_path, days)
    got = _unwrap(q_page_hinkley(str(tmp_path))).iloc[0]
    assert int(got["alarm_day"]) > 10  # fires after the shift
    assert int(got["alarm_day"]) <= 20
    _parity(
        _unwrap(q_page_hinkley(str(tmp_path))),
        _oracle(tmp_path, PAGE_HINKLEY_SQL, "events"),
    )
    # steady stream: no alarm
    _write_events(tmp_path, [[50.0] * 5] * 20)
    got2 = _unwrap(q_page_hinkley(str(tmp_path))).iloc[0]
    assert int(got2["alarm_day"]) == -1
    _parity(
        _unwrap(q_page_hinkley(str(tmp_path))),
        _oracle(tmp_path, PAGE_HINKLEY_SQL, "events"),
    )


def test_shewhart_flags_planted_outlier_and_parity(ray_session, tmp_path):
    days = [[10.0 + (d % 3)] * 4 for d in range(20)]
    days[13] = [500.0] * 4  # massive outlier day
    _write_events(tmp_path, days)
    got = _unwrap(q_shewhart_chart(str(tmp_path)))
    flagged = got[got["flagged"] == 1]["day"].to_numpy(np.int64)
    d13 = int(got.sort_values("day")["day"].iloc[13])
    assert list(flagged) == [d13]
    _parity(got, _oracle(tmp_path, SHEWHART_CHART_SQL, "events"))
