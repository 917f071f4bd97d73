"""Tests for the round-5 batch-50 survival operators (survival_ops):
kaplan_meier, nelson_aalen, logrank_test — DuckDB parity plus brute
force on a planted cohort: users with staggered lifetimes, some
censored (active on the final day). Pins: S is non-increasing and
matches the hand-walked product; H is non-decreasing; with identical
cohorts the log-rank O≈E; with one short-lived cohort O and E
diverge in the right direction.
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

from europarl_crawler_ray.pipelines.survival_ops import (
    KAPLAN_MEIER_SQL,
    KM_SCALE,
    LOGRANK_TEST_SQL,
    NELSON_AALEN_SQL,
    q_kaplan_meier,
    q_logrank_test,
    q_nelson_aalen,
)

BASE = datetime(2024, 5, 1)
SPAN = 30  # corpus day span: day 0 .. 29


def _events_for(user, first, last):
    """Two events marking a user's first and last active day."""
    return [
        (user, BASE + timedelta(days=first)),
        (user, BASE + timedelta(days=last)),
    ]


def _cohort():
    """Even users (group 0) live long; odd users (group 1) churn fast.
    A few of each are censored (alive on day SPAN-1)."""
    rows = []
    for u in range(40):
        if u % 2 == 0:
            first, last = 0, 20 + (u % 5)  # durations 21..25
        else:
            first, last = 0, 3 + (u % 4)  # durations 4..7
        if u % 10 == 0:
            last = SPAN - 1  # censored
        rows += _events_for(u, first, last)
    # anchor the span end so censoring is well-defined
    rows += _events_for(1000, 0, SPAN - 1)
    return rows


def _write(d, rows):
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


def _brute_life():
    users = {}
    for u, t in _cohort():
        d = (t - BASE).days
        lo, hi = users.get(u, (d, d))
        users[u] = (min(lo, d), max(hi, d))
    d1 = max(hi for _, hi in users.values())
    out = []
    for u, (lo, hi) in users.items():
        out.append((u, hi - lo + 1, 1 if hi == d1 else 0))
    return out


def test_km_brute_force_and_parity(ray_session, tmp_path):
    _write(tmp_path, _cohort())
    got = _unwrap(q_kaplan_meier(str(tmp_path)))
    life = _brute_life()
    total = len(life)
    deaths = {}
    counts = {}
    for _, t, c in life:
        counts[t] = counts.get(t, 0) + 1
        if not c:
            deaths[t] = deaths.get(t, 0) + 1
    s = KM_SCALE
    at_risk = total
    exp = []
    for t in sorted(counts):
        d = deaths.get(t, 0)
        if d > 0:
            s = s * (at_risk - d) // at_risk
            exp.append((t, at_risk, d, s))
        at_risk -= counts[t]
    assert [
        (int(r["t"]), int(r["n_risk"]), int(r["deaths"]), int(r["s_x1e9"]))
        for _, r in got.iterrows()
    ] == exp
    # S non-increasing and strictly < 1 after the first death
    sv = got["s_x1e9"].to_numpy(np.int64)
    assert (np.diff(sv) <= 0).all() and sv[0] < KM_SCALE
    _parity(got, _oracle(tmp_path, KAPLAN_MEIER_SQL))


def test_na_monotone_and_parity(ray_session, tmp_path):
    _write(tmp_path, _cohort())
    got = _unwrap(q_nelson_aalen(str(tmp_path)))
    h = got["h_x1e9"].to_numpy(np.int64)
    assert (np.diff(h) > 0).all()  # strictly increasing at death times
    # same death times as KM
    km = _unwrap(q_kaplan_meier(str(tmp_path)))
    assert list(got["t"]) == list(km["t"])
    _parity(got, _oracle(tmp_path, NELSON_AALEN_SQL))


def test_logrank_direction_and_parity(ray_session, tmp_path):
    _write(tmp_path, _cohort())
    got = _unwrap(q_logrank_test(str(tmp_path))).iloc[0]
    # group 1 (odd users) churns early: observed deaths exceed expected
    assert int(got["o1"]) * 10**6 > int(got["e1_x1e6"])
    assert int(got["o0"]) * 10**6 < int(got["e0_x1e6"])
    _parity(
        _unwrap(q_logrank_test(str(tmp_path))),
        _oracle(tmp_path, LOGRANK_TEST_SQL),
    )


def test_logrank_identical_cohorts_balanced(ray_session, tmp_path):
    rows = []
    for u in range(30):  # identical lifetime structure in both parities
        rows += _events_for(u, 0, 5 + (u // 2) % 4)
    rows += _events_for(998, 0, SPAN - 1)
    rows += _events_for(999, 0, SPAN - 1)
    _write(tmp_path, rows)
    got = _unwrap(q_logrank_test(str(tmp_path))).iloc[0]
    # identical cohorts: observed matches expected within quantization
    assert abs(int(got["o0"]) * 10**6 - int(got["e0_x1e6"])) < 10**6
    assert abs(int(got["o1"]) * 10**6 - int(got["e1_x1e6"])) < 10**6
