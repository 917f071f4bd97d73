"""Tests for the round-5 batch-52 event-mining operators
(eventmine_ops): seq_patterns, assoc_rules, burst_detect — DuckDB
parity plus brute force on planted behaviour: a strict A→B funnel
(the reversed pair must NOT appear), a perfectly-correlated rule with
lift > 1 and an anti-correlated one with lift < 1, and a planted
burst day with hysteresis (the state stays up until counts fall to
the mean).
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

from europarl_crawler_ray.pipelines.eventmine_ops import (
    ASSOC_RULES_SQL,
    BURST_DETECT_SQL,
    SEQ_PATTERNS_SQL,
    q_assoc_rules,
    q_burst_detect,
    q_seq_patterns,
)

BASE = datetime(2024, 6, 1)


def _write(d, rows):
    n = len(rows)
    us, ts, et = zip(*rows) if rows else ((), (), ())
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(list(ts), pa.timestamp("us")),
                "user_id": pa.array(list(us), pa.int64()),
                "event_type": pa.array(list(et), pa.string()),
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


def test_seq_strict_funnel_and_parity(ray_session, tmp_path):
    rows = []
    # 20 users do signup THEN purchase; nobody purchases before signup
    for u in range(20):
        rows.append((u, BASE + timedelta(hours=u), "signup"))
        rows.append((u, BASE + timedelta(hours=u, minutes=30), "purchase"))
    # 5 users only browse
    for u in range(20, 25):
        rows.append((u, BASE + timedelta(hours=u), "browse"))
    _write(tmp_path, rows)
    got = _unwrap(q_seq_patterns(str(tmp_path)))
    pairs = {
        (r["type_a"], r["type_b"]): int(r["n_users"])
        for _, r in got.iterrows()
    }
    assert pairs[("signup", "purchase")] == 20
    assert ("purchase", "signup") not in pairs  # strictly ordered
    assert not any("browse" in p for p in pairs)  # loners make no pairs
    _parity(got, _oracle(tmp_path, SEQ_PATTERNS_SQL))


def test_assoc_lift_directions_and_parity(ray_session, tmp_path):
    rows = []
    # types x,y always co-occur (10 users); type z occurs alone (10)
    for u in range(10):
        rows.append((u, BASE + timedelta(hours=u), "x"))
        rows.append((u, BASE + timedelta(hours=u, minutes=5), "y"))
    for u in range(10, 20):
        rows.append((u, BASE + timedelta(hours=u), "z"))
    # one bridge user has x and z so the (x,z) rule exists
    rows.append((30, BASE, "x"))
    rows.append((30, BASE + timedelta(minutes=1), "z"))
    _write(tmp_path, rows)
    got = _unwrap(q_assoc_rules(str(tmp_path)))
    g = {
        (r["type_a"], r["type_b"]): r for _, r in got.iterrows()
    }
    u = 21
    xy = g[("x", "y")]
    assert int(xy["support"]) == 10
    assert int(xy["confidence_x1e6"]) == 10**6 * 10 // 11
    assert int(xy["lift_x1e6"]) == 10**6 * 10 * u // (11 * 10)
    assert int(xy["lift_x1e6"]) > 10**6  # strong positive association
    xz = g[("x", "z")]
    assert int(xz["lift_x1e6"]) < 10**6  # near-disjoint types
    _parity(got, _oracle(tmp_path, ASSOC_RULES_SQL))


def test_burst_hysteresis_and_parity(ray_session, tmp_path):
    rows = []
    uid = 0
    # 12 quiet days of 2 events, a 3-day burst of 20, decay day of 3,
    # then quiet again — the state must stay UP through the decay day
    # only if 3 > mean; compute both engines either way
    plan = [2] * 12 + [20, 20, 20] + [3] + [2] * 8
    for day, k in enumerate(plan):
        for j in range(k):
            rows.append(
                (uid, BASE + timedelta(days=day, minutes=j), "e")
            )
            uid += 1
    _write(tmp_path, rows)
    got = _unwrap(q_burst_detect(str(tmp_path)))
    states = got.sort_values("day")["state"].to_numpy(np.int64)
    counts = got.sort_values("day")["count"].to_numpy(np.int64)
    assert list(counts) == plan
    total, span = sum(plan), len(plan)
    mean = total // span
    hi = 2 * mean + 1
    # brute-force the automaton
    exp, st = [], 0
    for c in plan:
        if st == 0 and c >= hi:
            st = 1
        elif st == 1 and c <= mean:
            st = 0
        exp.append(st)
    assert list(states) == exp
    assert states[12] == 1 and states[0] == 0  # burst day flips on
    _parity(got, _oracle(tmp_path, BURST_DETECT_SQL))
