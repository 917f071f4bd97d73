"""Tests for the round-5 batch-61 approximation operators
(approx_ops): densest_subgraph, vertex_cover_2approx, mst_pool —
DuckDB parity plus guarantee pins. The densest answer is checked
against a full Python replay of the peel AND against the density of
the whole graph (the answer can only be ≥); the cover must leave 0
uncovered edges and sit within 2× its matching lower bound; the MST
is compared against Kruskal-with-union-find (a different algorithm)
for total weight, with the spanning/acyclic property verified.
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

from europarl_crawler_ray.pipelines.approx_ops import (
    PEEL_ROUNDS,
    _densest_sql,
    _mst_sql,
    _vertex_cover_sql,
    q_densest_subgraph,
    q_mst_pool,
    q_vertex_cover_2approx,
)
from europarl_crawler_ray.pipelines.coreset_ops import CAND_N

N_DOCS = 90


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


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


def _write_embs(d, n=200, dim=6):
    rng = np.random.RandomState(3)
    vecs = np.round(rng.randn(n, dim), 3)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * n, pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return vecs


def _sym_edges(n):
    es = set()
    for v in range(n):
        k = 1 + _md5_64(f"lnkk:42:{v}") % 4
        for j in range(1, k + 1):
            t = (v * 37 + j * 101) % n
            if t != v:
                es.add((min(v, t), max(v, t)))
    return es


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


def test_densest_peel_replay_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_densest_subgraph(str(tmp_path))).iloc[0]
    es = _sym_edges(N_DOCS)
    nodes = {v for e in es for v in e}
    traj = []
    cur_n, cur_e = set(nodes), set(es)
    for t in range(PEEL_ROUNDS):
        if not cur_n:
            break
        V, E = len(cur_n), len(cur_e)
        traj.append((t, V, E))
        deg = {v: 0 for v in cur_n}
        for a, b in cur_e:
            deg[a] += 1
            deg[b] += 1
        keep = {v for v in cur_n if deg[v] * V > 4 * E}
        if keep == cur_n or not keep:
            break
        cur_n = keep
        cur_e = {(a, b) for a, b in cur_e if a in keep and b in keep}
    best = max(traj, key=lambda r: (r[2] / r[1], -r[0]))
    assert (int(got["best_round"]), int(got["n_nodes"]), int(got["n_edges"])) == best
    # guarantee direction: the answer is at least the full graph's density
    assert int(got["density_x1e6"]) >= 10**6 * len(es) // len(nodes)
    _parity(
        _unwrap(q_densest_subgraph(str(tmp_path))),
        _oracle(tmp_path, _densest_sql()),
    )


def test_vertex_cover_covers_and_bound(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_vertex_cover_2approx(str(tmp_path))).iloc[0]
    assert int(got["n_uncovered"]) == 0  # a real cover
    assert int(got["n_cover"]) == 2 * int(got["n_pairs"])  # matched pairs
    # 2-approx certificate: cover ≤ 2 × matching lower bound
    assert int(got["n_cover"]) <= 2 * int(got["lower_bound"]) * 2 // 2
    _parity(
        _unwrap(q_vertex_cover_2approx(str(tmp_path))),
        _oracle(tmp_path, _vertex_cover_sql()),
    )


def _kruskal_weight(ids, d2):
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = sorted(
        (int(d2[i, j]), int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if i < j
    )
    total = 0
    used = 0
    for w, u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            total += w
            used += 1
    return total, used


def test_mst_kruskal_cross_check_and_parity(ray_session, tmp_path):
    vecs = _write_embs(tmp_path)
    got = _unwrap(q_mst_pool(str(tmp_path)))
    cands = sorted(
        range(len(vecs)),
        key=lambda v: hashlib.md5(f"cand:{v}".encode()).hexdigest(),
    )[:CAND_N]
    qm = np.floor(
        vecs[cands].astype(np.float32).astype(np.float64) * 1000.0
    ).astype(np.int64)
    nrm = (qm * qm).sum(axis=1)
    d2 = nrm[:, None] - 2 * (qm @ qm.T) + nrm[None, :]
    ids = np.array(sorted(cands), dtype=np.int64)
    # re-index d2 rows to the sorted-id order used by the operator
    order = np.argsort(np.array(cands))
    d2s = d2[np.ix_(order, order)]
    k_total, k_used = _kruskal_weight(ids, d2s)
    assert len(got) == CAND_N - 1  # spanning
    assert int(got["d2"].sum()) == k_total  # MST weight is unique-ish
    assert k_used == CAND_N - 1
    # tree: each step adds exactly one previously-unseen vertex
    seen = {int(got["u"].iloc[0])}
    for _, r in got.iterrows():
        assert int(r["u"]) in seen or int(r["v"]) in seen
        seen.add(int(r["u"]))
        seen.add(int(r["v"]))
    assert len(seen) == CAND_N
    _parity(got, _oracle(tmp_path, _mst_sql(), table="embeddings"))
