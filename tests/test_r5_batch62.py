"""Tests for the round-5 batch-62 classical-scheduling operators
(shopsched_ops): johnson_schedule, smith_rule, interval_depth —
DuckDB parity plus optimality pins. Johnson's closed-form makespan is
checked against a direct job-by-job simulation AND against random
permutations (Johnson never loses); Smith's ΣwC never loses to the
FIFO proxy or to random orders; the interval depth matches a brute
sweep and the half-open touching-intervals convention.
"""

from __future__ import annotations

import hashlib
import sys
from datetime import datetime, timedelta

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.shopsched_ops import (
    A_MOD,
    INTERVAL_DEPTH_SQL,
    W_MOD,
    _johnson_sql,
    _smith_sql,
    q_interval_depth,
    q_johnson_schedule,
    q_smith_rule,
)

N_DOCS = 120
BASE = datetime(2024, 9, 1)


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _write_docs(d, n=N_DOCS):
    chars = [37 + (i * 13) % 400 for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array(chars, pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return chars


def _jobs(chars):
    return [
        (
            c % A_MOD + 1,
            _md5_64(f"jb:42:{i}") % A_MOD + 1,
            _md5_64(f"jw:42:{i}") % W_MOD + 1,
        )
        for i, c in enumerate(chars)
    ]


def _sim_makespan(jobs_ab):
    """Direct two-machine flow-shop simulation."""
    t1 = t2 = 0
    for a, b in jobs_ab:
        t1 += a
        t2 = max(t1, t2) + b
    return t2


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


def test_johnson_simulation_and_optimality(ray_session, tmp_path):
    chars = _write_docs(tmp_path)
    got = _unwrap(q_johnson_schedule(str(tmp_path))).iloc[0]
    jobs = [(a, b) for a, b, _ in _jobs(chars)]
    # Johnson order: class (a<=b by a asc), (a>b by b desc), tie (a,b)
    ordered = sorted(
        jobs,
        key=lambda ab: (
            0 if ab[0] <= ab[1] else 1,
            ab[0] if ab[0] <= ab[1] else -ab[1],
            ab[0],
            ab[1],
        ),
    )
    assert int(got["makespan_johnson"]) == _sim_makespan(ordered)
    # optimality: Johnson beats-or-ties the baseline and random orders
    assert int(got["makespan_johnson"]) <= int(got["makespan_baseline"])
    rng = np.random.RandomState(1)
    for _ in range(30):
        perm = [jobs[i] for i in rng.permutation(len(jobs))]
        assert int(got["makespan_johnson"]) <= _sim_makespan(perm)
    _parity(
        _unwrap(q_johnson_schedule(str(tmp_path))),
        _oracle(tmp_path, _johnson_sql()),
    )


def test_smith_optimal_vs_random(ray_session, tmp_path):
    chars = _write_docs(tmp_path)
    got = _unwrap(q_smith_rule(str(tmp_path))).iloc[0]

    def swc(order):
        t = tot = 0
        for p, w in order:
            t += p
            tot += w * t
        return tot

    jobs = [(a, w) for a, _, w in _jobs(chars)]
    assert int(got["sum_wc_smith"]) <= int(got["sum_wc_fifo"])
    rng = np.random.RandomState(2)
    for _ in range(30):
        perm = [jobs[i] for i in rng.permutation(len(jobs))]
        assert int(got["sum_wc_smith"]) <= swc(perm)
    # the exact-ratio Smith order achieves the same ΣwC (the quantized
    # key only reorders equal-ratio ties, which don't change the sum)
    exact = sorted(jobs, key=lambda pw: (-(pw[1] / pw[0]), pw[0], pw[1]))
    assert int(got["sum_wc_smith"]) == swc(exact)
    _parity(
        _unwrap(q_smith_rule(str(tmp_path))), _oracle(tmp_path, _smith_sql())
    )


def _write_events(d, intervals):
    rows = [
        (BASE + timedelta(minutes=s), float(dur)) for s, dur in intervals
    ]
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


def test_interval_depth_brute_and_halfopen(ray_session, tmp_path):
    # three overlapping + one touching: [0,10) [5,15) [8,12) [10,20)
    _write_events(tmp_path, [(0, 10), (5, 10), (8, 4), (10, 10)])
    got = _unwrap(q_interval_depth(str(tmp_path))).iloc[0]
    # depth 3 at t in [8,10); the touching [10,20) does NOT stack on
    # [0,10) (half-open)
    assert int(got["depth"]) == 3
    assert int(got["n_intervals"]) == 4
    _parity(
        _unwrap(q_interval_depth(str(tmp_path))),
        _oracle(tmp_path, INTERVAL_DEPTH_SQL, "events"),
    )


def test_interval_depth_disjoint_is_one(ray_session, tmp_path):
    _write_events(tmp_path, [(i * 100, 10) for i in range(12)])
    got = _unwrap(q_interval_depth(str(tmp_path))).iloc[0]
    assert int(got["depth"]) == 1
    _parity(
        _unwrap(q_interval_depth(str(tmp_path))),
        _oracle(tmp_path, INTERVAL_DEPTH_SQL, "events"),
    )
