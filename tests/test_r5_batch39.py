"""Tests for the round-5 batch-39 assignment/burstiness operators
(assignment_ops): mercator_queues, dispersion_index, hnsw_levels —
DuckDB parity plus independent brute force. The Mercator test pins the
one-host-one-queue invariant; the dispersion test plants a perfectly
regular stream (VMR → 0 over its span) and a bursty one; the HNSW
test checks the level histogram against a per-node trailing-zeros
computation and the geometric decay shape.
"""

from __future__ import annotations

import hashlib
import sys
from collections import Counter
from datetime import datetime, timedelta

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.assignment_ops import (
    DISPERSION_INDEX_SQL,
    HNSW_MAX_LEVEL,
    MERC_B,
    MERC_HOSTS,
    MERCATOR_QUEUES_SQL,
    q_dispersion_index,
    q_hnsw_levels,
    q_mercator_queues,
    _hnsw_sql,
)


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _oracle(d, sql, tables):
    con = duckdb.connect()
    for t in tables:
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


def test_mercator_one_host_one_queue_and_parity(ray_session, tmp_path):
    n = 500
    custkeys = [(i * 13) % 300 for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array(custkeys, pa.int64()),
                "o_totalprice": pa.array([1.0] * n, pa.float64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    got = _unwrap(q_mercator_queues(str(tmp_path)))
    # brute force
    hc = Counter(k % MERC_HOSTS for k in custkeys)
    per_q: dict[int, list] = {}
    for h, c in hc.items():
        per_q.setdefault(_md5_64(f"bq:42:{h}") % MERC_B, []).append(c)
    exp = {
        q: (len(cs), sum(cs), max(cs), 100 * max(cs) // sum(cs))
        for q, cs in per_q.items()
    }
    gotmap = {
        int(r["queue"]): (
            int(r["n_hosts"]),
            int(r["n_requests"]),
            int(r["max_host_requests"]),
            int(r["max_share_x100"]),
        )
        for _, r in got.iterrows()
    }
    assert gotmap == exp
    # invariant: total requests across queues == total orders
    assert sum(v[1] for v in gotmap.values()) == n
    _parity(got, _oracle(tmp_path, MERCATOR_QUEUES_SQL, ["orders"]))


def _write_events(d, rows):
    ts, et = zip(*rows) if rows else ((), ())
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(list(ts), pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(list(et), pa.string()),
                "value": pa.array([0.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )


def test_dispersion_regular_vs_bursty_and_parity(ray_session, tmp_path):
    base = datetime(2024, 1, 1)
    rows = []
    # 'steady': exactly 2/day for 10 days  -> variance < mean (VMR < 1)
    for day in range(10):
        for k in range(2):
            rows.append((base + timedelta(days=day, hours=k), "steady"))
    # 'burst': 20 events on one day       -> VMR >> 1
    for k in range(20):
        rows.append((base + timedelta(hours=k % 24), "burst"))
    _write_events(tmp_path, rows)
    got = _unwrap(q_dispersion_index(str(tmp_path)))
    g = {r["event_type"]: r for _, r in got.iterrows()}
    n = 10  # global span covers days 0..9
    # steady brute force: counts = [2]*10 over 10 days
    s1, s2 = 20, 40
    exp_steady = 10**6 * (n * s2 - s1 * s1) // ((n - 1) * s1)
    assert int(g["steady"]["vmr_x1e6"]) == exp_steady
    # bursty: 20 on day0, 0 elsewhere
    s1b, s2b = 20, 400
    exp_burst = 10**6 * (n * s2b - s1b * s1b) // ((n - 1) * s1b)
    assert int(g["burst"]["vmr_x1e6"]) == exp_burst
    assert int(g["burst"]["vmr_x1e6"]) > 10**6 > int(g["steady"]["vmr_x1e6"])
    _parity(got, _oracle(tmp_path, DISPERSION_INDEX_SQL, ["events"]))


def test_hnsw_levels_brute_force_and_parity(ray_session, tmp_path):
    n = 4000
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [[0.0, 1.0]] * n, pa.list_(pa.float32())
                ),
                "label": pa.array([0] * n, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    got = _unwrap(q_hnsw_levels(str(tmp_path)))
    exp = Counter()
    for i in range(n):
        h = _md5_64(f"hnsw:42:{i}")
        k = 0
        while k < HNSW_MAX_LEVEL and h % 4 == 0:
            h //= 4
            k += 1
        exp[k] += 1
    assert {
        int(r["level"]): int(r["n_nodes"]) for _, r in got.iterrows()
    } == dict(exp)
    # geometric decay: level 0 holds ~3/4 of nodes
    assert exp[0] > n // 2
    _parity(got, _oracle(tmp_path, _hnsw_sql(), ["embeddings"]))
