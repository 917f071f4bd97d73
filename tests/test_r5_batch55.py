"""Tests for the round-5 batch-55 graph null-model operators
(nullmodel_ops): triangle_nullmodel, degree_gini, friendship_paradox
— DuckDB parity plus brute force on the derived link graph. Pins:
the observed triangle count equals a hand triple-loop; Gini matches
the pairwise-difference definition and is 0 for a regular degree
sequence; the friendship-paradox gap is nonnegative (Cauchy-Schwarz)
and matches the moment formula.
"""

from __future__ import annotations

import hashlib
import sys
from itertools import combinations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.nullmodel_ops import (
    _degree_gini_sql,
    _friendship_sql,
    _nullmodel_sql,
    q_degree_gini,
    q_friendship_paradox,
    q_triangle_nullmodel,
)

N_DOCS = 100


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _write(d, n=N_DOCS):
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


def _sym_adj(n):
    adj = {v: set() for v in range(n)}
    for v in range(n):
        k = 1 + _md5_64(f"lnkk:42:{v}") % 4
        for j in range(1, k + 1):
            t = (v * 37 + j * 101) % n
            if t != v:
                adj[v].add(t)
                adj[t].add(v)
    return adj


def _oracle(d, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
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


def test_triangle_nullmodel_brute_force_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_triangle_nullmodel(str(tmp_path))).iloc[0]
    adj = _sym_adj(N_DOCS)
    tri = sum(
        1
        for x, y, z in combinations(range(N_DOCS), 3)
        if y in adj[x] and z in adj[y] and x in adj[z]
    )
    degs = [len(adj[v]) for v in range(N_DOCS)]
    s1 = sum(degs)
    s2 = sum(d * (d - 1) for d in degs)
    assert int(got["n_triangles"]) == tri
    assert int(got["n_edges"]) == s1 // 2
    assert int(got["expected_x1e6"]) == 10**6 * s2**3 // (6 * s1**3)
    assert int(got["ratio_x100"]) == 100 * tri * 6 * s1**3 // s2**3
    _parity(
        _unwrap(q_triangle_nullmodel(str(tmp_path))),
        _oracle(tmp_path, _nullmodel_sql()),
    )


def test_degree_gini_brute_force_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_degree_gini(str(tmp_path))).iloc[0]
    adj = _sym_adj(N_DOCS)
    degs = [len(adj[v]) for v in range(N_DOCS)]
    n, s1 = len(degs), sum(degs)
    tot = sum(abs(a - b) for a in degs for b in degs)
    assert int(got["gini_x1e6"]) == 10**6 * tot // (2 * n * s1)
    assert int(got["n_nodes"]) == n
    _parity(
        _unwrap(q_degree_gini(str(tmp_path))),
        _oracle(tmp_path, _degree_gini_sql()),
    )


def test_friendship_paradox_gap_nonneg_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_friendship_paradox(str(tmp_path))).iloc[0]
    adj = _sym_adj(N_DOCS)
    degs = [len(adj[v]) for v in range(N_DOCS)]
    n, s1 = len(degs), sum(degs)
    s2 = sum(d * d for d in degs)
    assert int(got["mean_x1e6"]) == 10**6 * s1 // n
    assert int(got["nbr_mean_x1e6"]) == 10**6 * s2 // s1
    assert int(got["gap_x1e6"]) >= 0  # Cauchy-Schwarz
    _parity(
        _unwrap(q_friendship_paradox(str(tmp_path))),
        _oracle(tmp_path, _friendship_sql()),
    )
