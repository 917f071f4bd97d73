"""Tests for the round-5 batch-64 flow operators (flow_ops):
maxflow_mincut, minplus_relax, widest_path_pool — DuckDB parity plus
theorem pins. The min-cut value must EQUAL an independently-computed
Ford-Fulkerson max flow (the duality theorem as a test); min-plus
distances must match Dijkstra wherever 4 rounds suffice (they do on
a dense pool) and satisfy the relaxation invariant d[v] ≤ d[u]+w;
widths satisfy the bottleneck analogue and the source is full-width.
"""

from __future__ import annotations

import hashlib
import sys
from collections import deque

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.flow_ops import (
    FLOW_N,
    FLOW_S,
    FLOW_T,
    W_CAP,
    _caps,
    _mincut_sql,
    _minplus_sql,
    _widest_sql,
    q_maxflow_mincut,
    q_minplus_relax,
    q_widest_path_pool,
)
from europarl_crawler_ray.pipelines.coreset_ops import CAND_N

N_DOCS = 137


def _write_docs(d, n=N_DOCS):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([10] * n, pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )


def _write_embs(d, n=150, dim=5):
    rng = np.random.RandomState(9)
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


def _maxflow_ff(cap):
    """Edmonds-Karp max flow s→t on the small capacity matrix."""
    n = cap.shape[0]
    flow = np.zeros_like(cap)
    total = 0
    while True:
        parent = [-1] * n
        parent[FLOW_S] = FLOW_S
        q = deque([FLOW_S])
        while q:
            u = q.popleft()
            for v in range(n):
                if parent[v] < 0 and cap[u, v] - flow[u, v] > 0:
                    parent[v] = u
                    q.append(v)
        if parent[FLOW_T] < 0:
            return total
        aug = 1 << 60
        v = FLOW_T
        while v != FLOW_S:
            u = parent[v]
            aug = min(aug, int(cap[u, v] - flow[u, v]))
            v = u
        v = FLOW_T
        while v != FLOW_S:
            u = parent[v]
            flow[u, v] += aug
            flow[v, u] -= aug
            v = u
        total += aug


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


def test_mincut_equals_maxflow_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_maxflow_mincut(str(tmp_path))).iloc[0]
    v = np.zeros(FLOW_N, np.int64)
    for i in range(N_DOCS):
        v[i % FLOW_N] += 1
    cap = _caps(v)
    assert int(got["mincut"]) == _maxflow_ff(cap)  # the duality theorem
    mask = int(got["best_mask"])
    assert (mask >> FLOW_S) & 1 == 1 and (mask >> FLOW_T) & 1 == 0
    _parity(
        _unwrap(q_maxflow_mincut(str(tmp_path))),
        _oracle(tmp_path, _mincut_sql()),
    )


def _pool(vecs):
    cands = sorted(
        range(len(vecs)),
        key=lambda x: hashlib.md5(f"cand:{x}".encode()).hexdigest(),
    )[:CAND_N]
    ids = np.array(sorted(cands), np.int64)
    qm = np.floor(
        vecs[ids].astype(np.float32).astype(np.float64) * 1000.0
    ).astype(np.int64)
    nrm = (qm * qm).sum(axis=1)
    return ids, nrm[:, None] - 2 * (qm @ qm.T) + nrm[None, :]


def test_minplus_matches_dijkstra(ray_session, tmp_path):
    vecs = _write_embs(tmp_path)
    got = _unwrap(q_minplus_relax(str(tmp_path)))
    ids, d2 = _pool(vecs)
    # Dijkstra on the complete graph
    n = len(ids)
    INF = 1 << 60
    dist = np.full(n, INF, np.int64)
    dist[0] = 0
    done = np.zeros(n, bool)
    for _ in range(n):
        u = int(np.argmin(np.where(done, INF, dist)))
        done[u] = True
        dist = np.minimum(dist, dist[u] + d2[u])
    gmap = dict(zip(got["vec_id"].astype(int), got["dist"].astype(int)))
    # the op is DEFINED as the 4-round trajectory (d² is non-metric,
    # so long chains can keep improving): brute-force that recursion
    r4 = np.full(n, INF, np.int64)
    r4[0] = 0
    for _ in range(4):
        r4 = np.minimum(r4, (r4[:, None] + d2).min(axis=0))
    assert gmap == {int(i): int(d) for i, d in zip(ids, r4)}
    # 4-round distances can only overestimate the true shortest paths
    for i, dd in zip(ids, dist):
        assert gmap[int(i)] >= int(dd)
    _parity(got, _oracle(tmp_path, _minplus_sql(), "embeddings"))


def test_widest_bottleneck_and_parity(ray_session, tmp_path):
    vecs = _write_embs(tmp_path)
    got = _unwrap(q_widest_path_pool(str(tmp_path)))
    ids, d2 = _pool(vecs)
    w = W_CAP - np.minimum(d2, W_CAP)
    gmap = dict(zip(got["vec_id"].astype(int), got["width"].astype(int)))
    assert gmap[int(ids[0])] == W_CAP  # source full width
    # bottleneck invariant: width[v] ≥ min(width[u], w[u][v]) after
    # convergence-or-not the fixed rounds still satisfy ≥ for 1 hop
    # from the source
    for b in range(len(ids)):
        assert gmap[int(ids[b])] >= min(W_CAP, int(w[0, b]))
    _parity(got, _oracle(tmp_path, _widest_sql(), "embeddings"))
