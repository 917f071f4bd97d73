"""Tests for the round-5 batch-14 centrality operators (centrality_ops):
katz_centrality, opic_scores, bipartite_check — DuckDB-oracle parity
plus independent dict-based brute force on a small synthetic table,
and the OPIC cash-conservation invariant.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.centrality_ops import (
    BIPARTITE_CHECK_SQL,
    KATZ_ATT,
    KATZ_ROUNDS,
    KATZ_SCALE,
    OPIC_ROUNDS,
    OPIC_SCALE,
    q_bipartite_check,
    q_katz_centrality,
    q_opic_scores,
    _katz_sql,
    _opic_sql,
)
from europarl_crawler_ray.pipelines.queries import internal_edges_np
from europarl_crawler_ray.stages.multimodal import _md5_64

N_DOCS = 60


def _write_docs(d, n=N_DOCS):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["t"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
                "n_chars": pa.array([1] * n, pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )


def _oracle(d, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
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


def _edge_multiset(n=N_DOCS, drop_self=False):
    src, dst = internal_edges_np(list(range(n)), n, drop_self=drop_self)
    return list(zip(src.tolist(), dst.tolist()))


def test_katz_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_katz_centrality(str(tmp_path)))

    edges = _edge_multiset()
    c = {v: KATZ_SCALE for v in range(N_DOCS)}
    acc = dict(c)
    for _ in range(KATZ_ROUNDS):
        m = dict.fromkeys(range(N_DOCS), 0)
        for u, v in edges:
            m[v] += c[u] // KATZ_ATT
        c = m
        for v in range(N_DOCS):
            acc[v] += m[v]
    assert {int(r["doc_id"]): int(r["katz"]) for _, r in got.iterrows()} == acc
    # truncated Katz must separate nodes (a constant answer means the
    # propagation never ran)
    assert len(set(acc.values())) > 1

    _parity(got, _oracle(tmp_path, _katz_sql()))


def test_opic_brute_force_conservation_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_opic_scores(str(tmp_path)))

    edges = _edge_multiset()
    k = {
        v: 1 + _md5_64(f"lnkk:42:{v}") % 4 for v in range(N_DOCS)
    }
    cash = dict.fromkeys(range(N_DOCS), OPIC_SCALE)
    hist = dict.fromkeys(range(N_DOCS), 0)
    for _ in range(OPIC_ROUNDS):
        share = {v: cash[v] // k[v] for v in range(N_DOCS)}
        incoming = dict.fromkeys(range(N_DOCS), 0)
        for u, v in edges:
            incoming[v] += share[u]
        for v in range(N_DOCS):
            distributed = share[v] * k[v]
            hist[v] += distributed
            cash[v] = cash[v] - distributed + incoming[v]
    exp = {v: (cash[v], hist[v]) for v in range(N_DOCS)}
    assert {
        int(r["doc_id"]): (int(r["cash"]), int(r["history"]))
        for _, r in got.iterrows()
    } == exp
    # OPIC invariant: cash is conserved across rounds
    assert int(got["cash"].sum()) == N_DOCS * OPIC_SCALE
    assert int(got["history"].sum()) > 0

    _parity(got, _oracle(tmp_path, _opic_sql()))


def test_bipartite_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_bipartite_check(str(tmp_path)))

    und: dict[int, set] = {}
    pairs = set()
    for u, v in _edge_multiset(drop_self=True):
        und.setdefault(u, set()).add(v)
        und.setdefault(v, set()).add(u)
        pairs.add((min(u, v), max(u, v)))
    dist = {0: 0}
    frontier = [0]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for v in frontier:
            for u in und.get(v, ()):
                if u not in dist:
                    dist[u] = d
                    nxt.append(u)
        frontier = nxt
    reached_edges = [(a, b) for a, b in pairs if a in dist and b in dist]
    conf = sum(1 for a, b in reached_edges if dist[a] % 2 == dist[b] % 2)
    assert int(got["n_reached"].iloc[0]) == len(dist)
    assert int(got["n_edges_reached"].iloc[0]) == len(reached_edges)
    assert int(got["n_conflicts"].iloc[0]) == conf
    assert int(got["bipartite"].iloc[0]) == (1 if conf == 0 else 0)
    # the synthetic graph has triangles, so the audit must find odd cycles
    assert conf > 0

    _parity(got, _oracle(tmp_path, BIPARTITE_CHECK_SQL))
