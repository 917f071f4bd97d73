"""Tests for the round-5 batch-23 robustness operators
(robustness_ops): attack_tolerance, eval_quota_apportion, length_gmd
— DuckDB-oracle parity plus brute force.
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
from europarl_crawler_ray.pipelines.robustness_ops import (
    ATT_K,
    ATTACK_TOLERANCE_SQL,
    EVAL_BUDGET,
    LENGTH_GMD_SQL,
    _eval_quota_sql,
    q_attack_tolerance,
    q_eval_quota_apportion,
    q_length_gmd,
)

N_DOCS = 60


def _lengths(n=N_DOCS):
    return [50 + (i * 37) % 300 for i in range(n)]


def _write_docs(d, n=N_DOCS):
    lens = _lengths(n)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x" * ln for ln in lens], pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(
                    [f"s{i % 7}" for i in range(n)], pa.string()
                ),
                "n_chars": pa.array(lens, pa.int64()),
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


def _bfs(adj, start, removed=frozenset()):
    if start in removed:
        return set()
    seen, todo = {start}, [start]
    while todo:
        v = todo.pop()
        for u in adj.get(v, ()):
            if u not in seen and u not in removed:
                seen.add(u)
                todo.append(u)
    return seen


def test_attack_tolerance_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_attack_tolerance(str(tmp_path)))

    src, dst = internal_edges_np(list(range(N_DOCS)), N_DOCS, drop_self=True)
    indeg = dict.fromkeys(range(N_DOCS), 0)
    adj: dict[int, set] = {}
    for a, b in zip(src.tolist(), dst.tolist()):
        indeg[b] += 1
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    hubs = [
        v
        for v, _ in sorted(
            ((v, c) for v, c in indeg.items() if v != 0 and c > 0),
            key=lambda kv: (-kv[1], kv[0]),
        )[:ATT_K]
    ]
    full = len(_bfs(adj, 0))
    attacked = len(_bfs(adj, 0, frozenset(hubs)))
    rows = {r["variant"]: r for _, r in got.iterrows()}
    assert int(rows["full"]["n_reached"]) == full
    assert int(rows["hubs_removed"]["n_removed"]) == len(hubs)
    assert int(rows["hubs_removed"]["n_reached"]) == attacked
    # removing hubs must actually shrink the reach on this graph
    assert attacked < full

    _parity(got, _oracle(tmp_path, ATTACK_TOLERANCE_SQL))


def test_eval_quota_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_eval_quota_apportion(str(tmp_path)))

    counts: dict[str, int] = {}
    for i in range(N_DOCS):
        s = f"s{i % 7}"
        counts[s] = counts.get(s, 0) + 1
    n = N_DOCS
    base = {s: c * EVAL_BUDGET // n for s, c in counts.items()}
    rem = {s: c * EVAL_BUDGET % n for s, c in counts.items()}
    left = EVAL_BUDGET - sum(base.values())
    for s in sorted(rem, key=lambda x: (-rem[x], x))[:left]:
        base[s] += 1
    assert {
        r["source"]: (int(r["n_docs"]), int(r["quota"]))
        for _, r in got.iterrows()
    } == {s: (counts[s], base[s]) for s in counts}
    # quotas are exhaustive and exact
    assert int(got["quota"].sum()) == EVAL_BUDGET
    # 60 docs over 7 sources never divides evenly -> remainders used
    assert left > 0

    _parity(got, _oracle(tmp_path, _eval_quota_sql()))


def test_length_gmd_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_length_gmd(str(tmp_path)))

    lens = _lengths()
    pair_sum = sum(
        abs(a - b) for i, a in enumerate(lens) for b in lens[i + 1 :]
    )
    n_pairs = N_DOCS * (N_DOCS - 1) // 2
    r = got.iloc[0]
    assert int(r["n_docs"]) == N_DOCS
    assert int(r["pair_abs_sum"]) == pair_sum
    assert int(r["gmd_ppm"]) == pair_sum * 1_000_000 // n_pairs
    assert pair_sum > 0

    _parity(got, _oracle(tmp_path, LENGTH_GMD_SQL))
