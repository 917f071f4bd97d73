"""Tests for the round-5 batch-36 distributed-join operators
(distjoin_ops): bloom_join, yannakakis_reduce, maximal_matching —
DuckDB parity plus independent brute force. The matching test
additionally pins VALIDITY (partners are mutual, every matched pair is
a real edge, no vertex matched twice) and MAXIMALITY (no edge between
two unmatched vertices remains).
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.distjoin_ops import (
    BLOOM_JOIN_SQL,
    BLOOM_K,
    BLOOM_M,
    YANNAKAKIS_REDUCE_SQL,
    q_bloom_join,
    q_maximal_matching,
    q_yannakakis_reduce,
    _matching_sql,
)

N_CUST = 120
N_ORDERS = 400
N_DOCS = 80


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _write_tpch(d):
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int64()),
                "r_name": pa.array([f"R{i}" for i in range(5)], pa.string()),
            }
        ),
        str(d / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int64()),
                "n_regionkey": pa.array(
                    [i % 5 for i in range(25)], pa.int64()
                ),
                "n_name": pa.array([f"N{i}" for i in range(25)], pa.string()),
            }
        ),
        str(d / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(N_CUST), pa.int64()),
                "c_nationkey": pa.array(
                    [i % 25 for i in range(N_CUST)], pa.int32()
                ),
            }
        ),
        str(d / "customer.parquet"),
    )
    # some orders reference custkeys outside the customer table (dangling)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
                "o_custkey": pa.array(
                    [(i * 7) % (N_CUST + 30) for i in range(N_ORDERS)],
                    pa.int64(),
                ),
                "o_totalprice": pa.array(
                    [100.25 + i for i in range(N_ORDERS)], pa.float64()
                ),
            }
        ),
        str(d / "orders.parquet"),
    )


def _write_docs(d, n=N_DOCS):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([10] * n, pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )


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


def test_bloom_join_brute_force_and_parity(ray_session, tmp_path):
    _write_tpch(tmp_path)
    got = _unwrap(q_bloom_join(str(tmp_path)))
    # brute force
    skeys = {i for i in range(N_CUST) if (i % 25) % 2 == 0}
    bits = set()
    for k in skeys:
        for i in range(BLOOM_K):
            bits.add(_md5_64(f"bloom:{i}:{k}") % BLOOM_M)
    okeys = [(i * 7) % (N_CUST + 30) for i in range(N_ORDERS)]
    cents = [int(np.floor((100.25 + i) * 100)) for i in range(N_ORDERS)]
    cand = [
        j
        for j, k in enumerate(okeys)
        if all(_md5_64(f"bloom:{i}:{k}") % BLOOM_M in bits for i in range(BLOOM_K))
    ]
    matched = [j for j in cand if okeys[j] in skeys]
    r = got.iloc[0]
    assert int(r["n_small"]) == len(skeys)
    assert int(r["n_big"]) == N_ORDERS
    assert int(r["n_candidates"]) == len(cand)
    assert int(r["n_matched"]) == len(matched)
    assert int(r["n_false_pos"]) == len(cand) - len(matched)
    assert int(r["sum_cents"]) == sum(cents[j] for j in matched)
    # every true match must be a candidate (no false negatives, ever)
    assert set(matched) <= set(cand)
    _parity(
        got,
        _oracle(tmp_path, BLOOM_JOIN_SQL, ["customer", "orders"]),
    )


def test_yannakakis_brute_force_and_parity(ray_session, tmp_path):
    _write_tpch(tmp_path)
    got = _unwrap(q_yannakakis_reduce(str(tmp_path)))
    rkeys = {0, 2, 4}
    nkeys = {i for i in range(25) if i % 5 in rkeys}
    ckeys = {i for i in range(N_CUST) if i % 25 in nkeys}
    okeys = [(i * 7) % (N_CUST + 30) for i in range(N_ORDERS)]
    o_red = [k for k in okeys if k in ckeys]
    r = got.iloc[0]
    assert int(r["nation_after"]) == len(nkeys)
    assert int(r["cust_after"]) == len(ckeys)
    assert int(r["orders_after"]) == len(o_red)
    assert int(r["cust_full"]) == len(set(o_red))
    assert int(r["join_rows"]) == len(o_red)
    _parity(
        got,
        _oracle(
            tmp_path,
            YANNAKAKIS_REDUCE_SQL,
            ["region", "nation", "customer", "orders"],
        ),
    )


def _edges(n):
    es = set()
    for v in range(n):
        k = 1 + _md5_64(f"lnkk:42:{v}") % 4
        for j in range(1, k + 1):
            d = (v * 37 + j * 101) % n
            if d != v:
                es.add((min(v, d), max(v, d)))
    return es


def test_matching_validity_maximality_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_maximal_matching(str(tmp_path)))
    part = dict(zip(got["doc_id"].astype(int), got["partner"].astype(int)))
    es = _edges(N_DOCS)
    matched = {v for v, p in part.items() if p >= 0}
    # validity: mutual partners along real edges, no double-matching
    for v, p in part.items():
        if p >= 0:
            assert part[p] == v
            assert (min(v, p), max(v, p)) in es
    # maximality: no edge joins two unmatched vertices
    for a, b in es:
        assert a in matched or b in matched
    _parity(got, _oracle(tmp_path, _matching_sql(), ["documents"]))


def test_matching_empty_and_single(ray_session, tmp_path):
    _write_docs(tmp_path, n=1)  # single node: self-loops dropped
    got = _unwrap(q_maximal_matching(str(tmp_path)))
    assert len(got) == 1 and int(got["partner"].iloc[0]) == -1
