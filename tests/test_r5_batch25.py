"""Tests for the round-5 batch-25 graph-cut / priority operators
(graphcut_ops): site_conductance, local_bridges, ucb_host_priority —
DuckDB-oracle parity plus brute force.
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.graphcut_ops import (
    LOCAL_BRIDGES_SQL,
    SITE_CONDUCTANCE_SQL,
    UCB_HOST_PRIORITY_SQL,
    q_local_bridges,
    q_site_conductance,
    q_ucb_host_priority,
)
from europarl_crawler_ray.pipelines.queries import internal_edges_np
from europarl_crawler_ray.pipelines.sitegraph_ops import N_SITES

N_DOCS = 60


def _write_docs(d, n=N_DOCS):
    lens = [40 + (i * 13) % 200 for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x" * ln for ln in lens], pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
                "n_chars": pa.array(lens, pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return lens


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


def test_site_conductance_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_site_conductance(str(tmp_path)))

    src, dst = internal_edges_np(list(range(N_DOCS)), N_DOCS)
    vol = {}
    cut = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        su, sv = u % N_SITES, v % N_SITES
        if su == sv:
            vol[su] = vol.get(su, 0) + 2
        else:
            vol[su] = vol.get(su, 0) + 1
            vol[sv] = vol.get(sv, 0) + 1
            cut[su] = cut.get(su, 0) + 1
            cut[sv] = cut.get(sv, 0) + 1
    vt = sum(vol.values())
    for _, r in got.iterrows():
        s = int(r["site"])
        assert int(r["vol"]) == vol.get(s, 0)
        assert int(r["cut"]) == cut.get(s, 0)
        den = min(vol.get(s, 0), vt - vol.get(s, 0))
        assert int(r["phi_bp"]) == (
            cut.get(s, 0) * 10000 // den if den else 0
        )
    assert set(got["site"].astype(int)) == set(vol)
    # with 60 docs over 97 sites every site is tiny: cuts dominate
    assert int(got["phi_bp"].max()) > 5000

    _parity(got, _oracle(tmp_path, SITE_CONDUCTANCE_SQL))


def test_local_bridges_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_local_bridges(str(tmp_path)))

    src, dst = internal_edges_np(list(range(N_DOCS)), N_DOCS, drop_self=True)
    pairs = {(min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist())}
    adj: dict[int, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    bridges = sum(1 for a, b in pairs if not (adj[a] & adj[b]))
    r = got.iloc[0]
    assert int(r["n_edges"]) == len(pairs)
    assert int(r["n_bridges"]) == bridges
    assert int(r["bridge_bp"]) == bridges * 10000 // len(pairs)
    # the graph has triangles AND bridges: both classes non-empty
    assert 0 < bridges < len(pairs)

    _parity(got, _oracle(tmp_path, LOCAL_BRIDGES_SQL))


def test_ucb_priority_brute_force_and_parity(ray_session, tmp_path):
    lens = _write_docs(tmp_path)
    got = _unwrap(q_ucb_host_priority(str(tmp_path)))

    per: dict[int, list] = {}
    for i in range(N_DOCS):
        s = i % N_SITES
        r = per.setdefault(s, [0, 0])
        r[0] += 1
        r[1] += lens[i]
    ln_n = math.floor(1e6 * math.log(N_DOCS))
    for _, r in got.iterrows():
        s = int(r["site"])
        n, tot = per[s]
        mean = tot * 1000 // n
        bonus = ln_n // (n * 1000)
        assert int(r["n_pages"]) == n
        assert int(r["mean_x1000"]) == mean
        assert int(r["bonus_x1000"]) == bonus
        assert int(r["priority_x1000"]) == mean + bonus
    # under-crawled sites must receive a positive exploration bonus
    assert int(got["bonus_x1000"].max()) > 0

    _parity(got, _oracle(tmp_path, UCB_HOST_PRIORITY_SQL))
