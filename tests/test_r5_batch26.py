"""Tests for the round-5 batch-26 scheduling-audit operators
(schedaudit_ops): interarrival_cv, jain_fairness, politeness_makespan
— DuckDB-oracle parity plus brute force over synthetic events and a
skewed site allocation.
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

from europarl_crawler_ray.pipelines.schedaudit_ops import (
    INTERARRIVAL_CV_SQL,
    JAIN_FAIRNESS_SQL,
    POLITENESS_DELAY,
    POLITENESS_MAKESPAN_SQL,
    q_interarrival_cv,
    q_jain_fairness,
    q_politeness_makespan,
)
from europarl_crawler_ray.pipelines.sitegraph_ops import N_SITES

N_DOCS = 60
N_EVENTS = 90


def _events(n=N_EVENTS):
    base = datetime(2026, 1, 1)
    rows = []
    for i in range(n):
        et = ("click", "view", "buy")[i % 3]
        if et == "view":  # timer-like: constant gaps -> CV^2 ~ 0
            ts = base + timedelta(seconds=1000 * (i // 3))
        else:  # bursty-ish: quadratic spread
            ts = base + timedelta(seconds=(i // 3) ** 2 * 7 + i)
        rows.append((i, ts, i % 5, et, float(i), "{}"))
    return rows


def _write_tables(d):
    ev = _events()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in ev], pa.int64()),
                "ts": pa.array([r[1] for r in ev], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in ev], pa.int64()),
                "event_type": pa.array([r[3] for r in ev], pa.string()),
                "value": pa.array([r[4] for r in ev], pa.float64()),
                "props": pa.array([r[5] for r in ev], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    # skewed site allocation: doc_id % 97 touches sites 0..59 once,
    # then extra docs pile onto site 0
    ids = list(range(N_DOCS)) + [97 * j for j in range(1, 6)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(["t"] * len(ids), pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(["s0"] * len(ids), pa.string()),
                "n_chars": pa.array([1] * len(ids), pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return ids


def _oracle(d, sql):
    con = duckdb.connect()
    for t in ("documents", "events"):
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


def test_interarrival_cv_brute_force_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_interarrival_cv(str(tmp_path)))

    ev = _events()
    exp = {}
    for et in ("click", "view", "buy"):
        ts = sorted(
            int(r[1].timestamp() * 1_000_000) for r in ev if r[3] == et
        )
        d = [b - a for a, b in zip(ts, ts[1:])]
        n, s, sq = len(d), sum(d), sum(x * x for x in d)
        cv2 = n * sq * 1_000_000 // (s * s) - 1_000_000 if s > 0 else 0
        exp[et] = (n, s, cv2)
    assert {
        r["event_type"]: (
            int(r["n_gaps"]),
            int(r["sum_gap_us"]),
            int(r["cv2_ppm"]),
        )
        for _, r in got.iterrows()
    } == exp
    # the timer stream is near-deterministic; the quadratic one is not
    assert exp["view"][2] == 0
    assert exp["click"][2] > 100_000

    _parity(got, _oracle(tmp_path, INTERARRIVAL_CV_SQL))


def test_jain_fairness_brute_force_and_parity(ray_session, tmp_path):
    ids = _write_tables(tmp_path)
    got = _unwrap(q_jain_fairness(str(tmp_path)))

    loads: dict[int, int] = {}
    for i in ids:
        loads[i % N_SITES] = loads.get(i % N_SITES, 0) + 1
    xs = list(loads.values())
    tot, sq = sum(xs), sum(x * x for x in xs)
    jain = tot * tot * 1_000_000 // (len(xs) * sq)
    r = got.iloc[0]
    assert int(r["n_sites"]) == len(xs)
    assert int(r["n_docs"]) == tot
    assert int(r["jain_ppm"]) == jain
    # the planted skew must push Jain below 1
    assert jain < 1_000_000

    _parity(got, _oracle(tmp_path, JAIN_FAIRNESS_SQL))


def test_politeness_makespan_brute_force_and_parity(ray_session, tmp_path):
    ids = _write_tables(tmp_path)
    got = _unwrap(q_politeness_makespan(str(tmp_path)))

    loads: dict[int, int] = {}
    for i in ids:
        loads[i % N_SITES] = loads.get(i % N_SITES, 0) + 1
    n = sum(loads.values())
    cmax = max(loads.values())
    m = sum(1 for x in loads.values() if x == cmax)
    lb = max(n, (cmax - 1) * (POLITENESS_DELAY + 1) + m)
    r = got.iloc[0]
    assert int(r["n_urls"]) == n
    assert int(r["max_site_count"]) == cmax
    assert int(r["n_max_sites"]) == m
    assert int(r["makespan_lb"]) == lb
    assert int(r["politeness_overhead_bp"]) == (lb - n) * 10000 // n
    # site 0 holds 6 docs -> (6-1)*4+1 = 21 < 65 docs: work-bound here,
    # but the bound itself must reflect the hot site exactly
    assert cmax == 6 and m == 1

    _parity(got, _oracle(tmp_path, POLITENESS_MAKESPAN_SQL))
