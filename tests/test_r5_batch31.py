"""Tests for the round-5 batch-31 geometry operators (graphgeom_ops):
twonn_intrinsic_dim, diameter_double_sweep, molloy_reed_kappa —
DuckDB-oracle parity plus brute force. The TWO-NN test plants an
exact-duplicate pair (d1² = 0 → −1 marker) and a near-tie; the sweep
test brute-forces BFS over the synthetic edge model; κ is checked
against dict-counted degrees.
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

from europarl_crawler_ray.pipelines.graphgeom_ops import (
    DIAMETER_DOUBLE_SWEEP_SQL,
    MOLLOY_REED_KAPPA_SQL,
    TWONN_INTRINSIC_DIM_SQL,
    q_diameter_double_sweep,
    q_molloy_reed_kappa,
    q_twonn_intrinsic_dim,
)

N_DOCS = 60
DIM = 5


def _vecs(n=N_DOCS, dim=DIM):
    out = []
    for i in range(n):
        v = [
            ((int(hashlib.md5(f"tn|{i}|{j}".encode()).hexdigest()[:8], 16) % 2001)
             - 1000) / 1000.0
            for j in range(dim)
        ]
        out.append(v)
    out[7] = list(out[3])  # exact duplicate pair -> d1_sq = 0
    return out


def _write_tables(d, n=N_DOCS):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["w"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
                "n_chars": pa.array([10 + i for i in range(n)], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(_vecs(n), pa.list_(pa.float32())),
                "label": pa.array([i % 2 for i in range(n)], pa.int64()),
            }
        ),
        str(d / "embeddings.parquet"),
    )


def _oracle(d, sql):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
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


def _und_adj(n=N_DOCS):
    from europarl_crawler_ray.pipelines.queries import internal_edges_np

    src, dst = internal_edges_np(np.arange(n, dtype=np.int64), n, drop_self=True)
    adj: dict[int, set] = {i: set() for i in range(n)}
    for a, b in zip(src.tolist(), dst.tolist()):
        adj[a].add(b)
        adj[b].add(a)
    return src, dst, adj


def _bfs(adj, start, n):
    dist = {start: 0}
    q = deque([start])
    while q:
        u = q.popleft()
        for v in sorted(adj[u]):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_twonn_brute_force_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_twonn_intrinsic_dim(str(tmp_path)))

    mat = np.floor(
        np.array(_vecs(), np.float32).astype(np.float64) * 1000.0
    ).astype(np.int64)
    n = len(mat)
    exp = {}
    for i in range(n):
        ds = sorted(
            (int(((mat[i] - mat[j]) ** 2).sum()), j)
            for j in range(n)
            if j != i
        )
        d1, d2 = ds[0][0], ds[1][0]
        mu = d2 * 1_000_000 // d1 if d1 > 0 else -1
        exp[i] = (d1, d2, mu)
    assert {
        int(r["vec_id"]): (int(r["d1_sq"]), int(r["d2_sq"]), int(r["mu_sq_ppm"]))
        for _, r in got.iterrows()
    } == exp
    # the planted duplicate pair reports the -1 marker on both members
    assert exp[3][2] == -1 and exp[7][2] == -1
    # non-duplicate anchors have mu >= 1e6 (d2 >= d1)
    assert all(v[2] >= 1_000_000 for k, v in exp.items() if k not in (3, 7))

    _parity(got, _oracle(tmp_path, TWONN_INTRINSIC_DIM_SQL))


def test_diameter_double_sweep_brute_force_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_diameter_double_sweep(str(tmp_path)))

    _, _, adj = _und_adj()
    d1 = _bfs(adj, 0, N_DOCS)
    ecc1 = max(d1.values())
    far1 = min(v for v, dd in d1.items() if dd == ecc1)
    d2 = _bfs(adj, far1, N_DOCS)
    ecc2 = max(d2.values())
    far2 = min(v for v, dd in d2.items() if dd == ecc2)
    exp = pd.DataFrame(
        {
            "sweep": [1, 2],
            "start_node": [0, far1],
            "far_node": [far1, far2],
            "ecc": [ecc1, ecc2],
            "n_reached": [len(d1), len(d2)],
        }
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype(np.int64),
        exp.astype(np.int64),
    )
    # the second sweep's ecc is the diameter lower bound: >= first
    assert ecc2 >= ecc1

    _parity(got, _oracle(tmp_path, DIAMETER_DOUBLE_SWEEP_SQL))


def test_molloy_reed_kappa_brute_force_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_molloy_reed_kappa(str(tmp_path)))

    src, dst, _ = _und_adj()
    deg: dict[int, int] = {}
    for a in np.concatenate([src, dst]).tolist():
        deg[a] = deg.get(a, 0) + 1
    sd = sum(deg.values())
    sd2 = sum(k * k for k in deg.values())
    r = got.iloc[0]
    assert int(r["n_nodes"]) == N_DOCS
    assert int(r["sum_deg"]) == sd == 2 * len(src)
    assert int(r["sum_deg2"]) == sd2
    assert int(r["kappa_ppm"]) == 1_000_000 * sd2 // sd
    assert int(r["supercritical"]) == (1 if sd2 >= 2 * sd else 0)
    # the synthetic expander has kappa well above the threshold
    assert int(r["supercritical"]) == 1

    _parity(got, _oracle(tmp_path, MOLLOY_REED_KAPPA_SQL))
