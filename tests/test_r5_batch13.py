"""Tests for the round-5 batch-13 structure operators (webstructure_ops):
front_coding, graph_compress, bowtie_structure — DuckDB-oracle parity
plus independent brute-force recomputation on a small synthetic table.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.queries import internal_edges_np
from europarl_crawler_ray.pipelines.webcorpus_ops import _surt_url, surt_key
from europarl_crawler_ray.pipelines.webstructure_ops import (
    BOWTIE_STRUCTURE_SQL,
    FC_OVERHEAD,
    FRONT_CODING_SQL,
    GRAPH_COMPRESS_SQL,
    _bit_length_np,
    _shard_of,
    q_bowtie_structure,
    q_front_coding,
    q_graph_compress,
)

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


def test_bit_length_exact():
    xs = np.array(
        [1, 2, 3, 4, 7, 8, 1023, 1024, 1025, (1 << 40) - 1, 1 << 40],
        np.int64,
    )
    assert list(_bit_length_np(xs)) == [int(x).bit_length() for x in xs]


def test_front_coding_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_front_coding(str(tmp_path)))

    surts = [surt_key(_surt_url(i)) for i in range(N_DOCS)]
    shards = _shard_of(surts)
    exp = {}
    for sh in sorted(set(shards.tolist())):
        keys = sorted(s for s, g in zip(surts, shards) if g == sh)
        raw = sum(len(k) for k in keys)
        enc, lcp_sum = len(keys[0]), 0
        for a, b in zip(keys, keys[1:]):
            lcp = 0
            while lcp < min(len(a), len(b)) and a[lcp] == b[lcp]:
                lcp += 1
            enc += FC_OVERHEAD + len(b) - lcp
            lcp_sum += lcp
        exp[sh] = (len(keys), raw, enc, lcp_sum, max(raw - enc, 0) * 10000 // raw)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n, raw, enc, lcp, bp = exp[int(r["shard"])]
        assert (
            int(r["n_keys"]),
            int(r["raw_bytes"]),
            int(r["enc_bytes"]),
            int(r["lcp_bytes"]),
            int(r["saved_bp"]),
        ) == (n, raw, enc, lcp, bp)
    # front-coding must actually help overall (single-key shards are
    # stored verbatim, so the per-shard strict inequality can't hold)
    assert int(got["enc_bytes"].sum()) < int(got["raw_bytes"].sum())

    _parity(got, _oracle(tmp_path, FRONT_CODING_SQL))


def test_graph_compress_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_graph_compress(str(tmp_path)))

    src, dst = internal_edges_np(list(range(N_DOCS)), N_DOCS, drop_self=True)
    adj: dict[int, set] = {}
    for a, b in zip(src.tolist(), dst.tolist()):
        adj.setdefault(a, set()).add(b)
    agg: dict[int, list] = {}
    for v, ns in adj.items():
        succ = sorted(ns)
        gb = (succ[0] + 1).bit_length() + sum(
            (b - a).bit_length() for a, b in zip(succ, succ[1:])
        )
        rb = sum((x + 1).bit_length() for x in succ)
        agg.setdefault(len(succ), []).append((gb, rb))
    for _, r in got.iterrows():
        rows = agg[int(r["outdeg"])]
        gb = sum(g for g, _ in rows)
        rb = sum(b for _, b in rows)
        assert int(r["n_src"]) == len(rows)
        assert int(r["n_edges"]) == int(r["outdeg"]) * len(rows)
        assert int(r["gap_bits"]) == gb
        assert int(r["raw_bits"]) == rb
        assert int(r["saved_bp"]) == (rb - gb) * 10000 // rb
    assert set(got["outdeg"].astype(int)) == set(agg)

    _parity(got, _oracle(tmp_path, GRAPH_COMPRESS_SQL))


def test_bowtie_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_bowtie_structure(str(tmp_path)))

    src, dst = internal_edges_np(list(range(N_DOCS)), N_DOCS, drop_self=True)
    fwd_adj: dict[int, set] = {}
    bwd_adj: dict[int, set] = {}
    und_adj: dict[int, set] = {}
    for a, b in zip(src.tolist(), dst.tolist()):
        fwd_adj.setdefault(a, set()).add(b)
        bwd_adj.setdefault(b, set()).add(a)
        und_adj.setdefault(a, set()).add(b)
        und_adj.setdefault(b, set()).add(a)

    def bfs(adj):
        seen, todo = {0}, [0]
        while todo:
            v = todo.pop()
            for u in adj.get(v, ()):
                if u not in seen:
                    seen.add(u)
                    todo.append(u)
        return seen

    f, b, u = bfs(fwd_adj), bfs(bwd_adj), bfs(und_adj)
    exp = dict.fromkeys(("scc", "in", "out", "tendril", "disconnected"), 0)
    for v in range(N_DOCS):
        if v in f and v in b:
            exp["scc"] += 1
        elif v in b:
            exp["in"] += 1
        elif v in f:
            exp["out"] += 1
        elif v in u:
            exp["tendril"] += 1
        else:
            exp["disconnected"] += 1
    assert {r["component"]: int(r["n_docs"]) for _, r in got.iterrows()} == exp
    assert int(got["n_docs"].sum()) == N_DOCS
    assert exp["scc"] > 1  # the synthetic graph must have a real core

    _parity(got, _oracle(tmp_path, BOWTIE_STRUCTURE_SQL))
