"""Tests for the round-5 batch-40 structural graph operators
(structgraph_ops): wl_refinement, scan_similarity, ffl_count — DuckDB
parity plus independent brute force on the derived link graph. The WL
test additionally pins the refinement invariant (same round-t color ⇒
same round-(t-1) color multiset — refinement only ever splits
classes); the SCAN test pins σ² against a direct closed-neighbourhood
computation; the FFL test hand-counts triads on a tiny planted graph
via a custom documents table.
"""

from __future__ import annotations

import hashlib
import sys
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.structgraph_ops import (
    WL_ROUNDS,
    _ffl_sql,
    _scan_sql,
    _wl_color,
    _wl_sql,
    q_ffl_count,
    q_scan_similarity,
    q_wl_refinement,
)

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


def _dir_edges(n):
    es = set()
    for v in range(n):
        k = 1 + _md5_64(f"lnkk:42:{v}") % 4
        for j in range(1, k + 1):
            t = (v * 37 + j * 101) % n
            if t != v:
                es.add((v, t))
    return es


def _sym_edges(n):
    es = _dir_edges(n)
    return es | {(b, a) for a, b in es}


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


def _brute_wl(n, rounds=WL_ROUNDS):
    adj: dict[int, list] = {v: [] for v in range(n)}
    for a, b in _sym_edges(n):
        adj[a].append(b)
    colors = {v: len(adj[v]) for v in range(n)}
    history = [dict(colors)]
    for _ in range(rounds):
        colors = {
            v: _wl_color(colors[v], [colors[u] for u in adj[v]])
            for v in range(n)
        }
        history.append(dict(colors))
    return history


def test_wl_brute_force_refinement_invariant_and_parity(
    ray_session, tmp_path
):
    _write_docs(tmp_path)
    got = _unwrap(q_wl_refinement(str(tmp_path)))
    hist = _brute_wl(N_DOCS)
    final = hist[-1]
    exp = Counter(final.values())
    assert {
        int(r["color"]): int(r["n_nodes"]) for _, r in got.iterrows()
    } == dict(exp)
    # refinement invariant: same final color => same color at EVERY
    # earlier round (WL only splits classes, never merges)
    by_final: dict[int, set] = {}
    for v, c in final.items():
        by_final.setdefault(c, set()).add(v)
    for t in range(len(hist) - 1):
        for cls in by_final.values():
            assert len({hist[t][v] for v in cls}) == 1
    _parity(got, _oracle(tmp_path, _wl_sql()))


def test_scan_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_scan_similarity(str(tmp_path)))
    es = _sym_edges(N_DOCS)
    adj: dict[int, set] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
    rows = {}
    for a, b in es:
        if a < b:
            cn = len(adj[a] & adj[b])
            du, dv = len(adj[a]), len(adj[b])
            rows[(a, b)] = (
                cn,
                du,
                dv,
                10**6 * (cn + 2) * (cn + 2) // ((du + 1) * (dv + 1)),
            )
    gotmap = {
        (int(r["u"]), int(r["v"])): (
            int(r["common"]),
            int(r["deg_u"]),
            int(r["deg_v"]),
            int(r["sigma2_x1e6"]),
        )
        for _, r in got.iterrows()
    }
    assert gotmap == rows
    # sanity: sigma^2 for closed neighbourhoods is <= 1e6
    assert all(v[3] <= 10**6 for v in gotmap.values())
    _parity(got, _oracle(tmp_path, _scan_sql()))


def test_ffl_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_ffl_count(str(tmp_path)))
    es = _dir_edges(N_DOCS)
    out: dict[int, set] = {}
    for a, b in es:
        out.setdefault(a, set()).add(b)
    exp = Counter()
    for a, bs in out.items():
        for b in bs:
            for c in out.get(b, ()):
                if c != a and c in bs:
                    exp[a] += 1
    gotmap = {
        int(r["doc_id"]): int(r["n_ffl"]) for _, r in got.iterrows()
    }
    assert len(gotmap) == N_DOCS
    for v in range(N_DOCS):
        assert gotmap[v] == exp.get(v, 0)
    assert sum(exp.values()) > 0  # the synthetic graph has FFLs
    _parity(got, _oracle(tmp_path, _ffl_sql()))
