"""Tests for the round-5 batch-47 mechanism-design operators
(mechdesign_ops): optimal_assignment, stable_matching,
top_trading_cycles — DuckDB parity plus mechanism-property pins. The
assignment test verifies global optimality against an independent
scipy-free exhaustive check and that the result is a permutation; the
GS test verifies NO BLOCKING PAIR exists and proposer-optimality
against the enumerated stable set; the TTC test verifies the
allocation is a permutation, each traded agent got its favourite
remaining shard in its round, and individual rationality under the
preference order.
"""

from __future__ import annotations

import hashlib
import sys
from itertools import permutations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.mechdesign_ops import (
    MD_D,
    _aff,
    _assignment_sql,
    _cap,
    _ideal,
    _lat,
    _qpref_key,
    _stable_sql,
    _ttc_sql,
    q_optimal_assignment,
    q_stable_matching,
    q_top_trading_cycles,
)

N_DOCS = 137  # uneven shard volumes


def _write(d, n=N_DOCS):
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


def _vols(n=N_DOCS):
    v = np.zeros(MD_D, np.int64)
    for i in range(n):
        v[i % MD_D] += 1
    return v


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


def test_assignment_optimality_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_optimal_assignment(str(tmp_path)))
    v = _vols()
    cost = {
        (s, w): int(v[s]) * _lat(w) + _aff(s, w)
        for s in range(MD_D)
        for w in range(MD_D)
    }
    assign = dict(zip(got["shard"].astype(int), got["worker"].astype(int)))
    assert sorted(assign.values()) == list(range(MD_D))  # permutation
    total = int(got["total_cost"].iloc[0])
    assert total == sum(cost[(s, w)] for s, w in assign.items())
    # optimality: nothing beats it
    best = min(
        sum(cost[(s, p[s])] for s in range(MD_D))
        for p in permutations(range(MD_D))
    )
    assert total == best
    _parity(got, _oracle(tmp_path, _assignment_sql()))


def test_stable_matching_no_blocking_pair_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_stable_matching(str(tmp_path)))
    v = _vols()
    vtot = int(v.sum())
    qpref = {
        q: sorted(range(MD_D), key=lambda w: _qpref_key(q, w))
        for q in range(MD_D)
    }
    wrank = {
        w: {
            q: r
            for r, q in enumerate(
                sorted(
                    range(MD_D),
                    key=lambda q: (abs(int(v[q]) - _cap(w, vtot)), q),
                )
            )
        }
        for w in range(MD_D)
    }
    match = dict(zip(got["queue"].astype(int), got["worker"].astype(int)))
    assert sorted(match.values()) == list(range(MD_D))
    w_of = {w: q for q, w in match.items()}
    # no blocking pair
    for q in range(MD_D):
        for w in range(MD_D):
            if match[q] == w:
                continue
            q_prefers = qpref[q].index(w) < qpref[q].index(match[q])
            w_prefers = wrank[w][q] < wrank[w][w_of[w]]
            assert not (q_prefers and w_prefers), (q, w)
    # proposer-optimality: no stable matching gives ANY queue a better
    # partner (enumerate the full stable set)
    def stable(p):
        wq = {p[q]: q for q in range(MD_D)}
        for q in range(MD_D):
            for w in range(MD_D):
                if p[q] == w:
                    continue
                if qpref[q].index(w) < qpref[q].index(p[q]) and (
                    wrank[w][q] < wrank[w][wq[w]]
                ):
                    return False
        return True

    for p in permutations(range(MD_D)):
        if stable(p):
            for q in range(MD_D):
                assert qpref[q].index(match[q]) <= qpref[q].index(p[q])
    _parity(got, _oracle(tmp_path, _stable_sql()))


def test_ttc_properties_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_top_trading_cycles(str(tmp_path)))
    v = _vols()
    vtot = int(v.sum())
    alloc = dict(zip(got["agent"].astype(int), got["shard"].astype(int)))
    rounds = dict(zip(got["agent"].astype(int), got["round"].astype(int)))
    assert sorted(alloc) == list(range(MD_D))
    assert sorted(alloc.values()) == list(range(MD_D))  # permutation

    def key(a, s):
        return (abs(int(v[s]) - _ideal(a, vtot)), s)

    # each agent's allocation is its favourite among shards still
    # remaining at the start of its round
    for a in range(MD_D):
        remaining = {
            s for b, s in alloc.items() if rounds[b] >= rounds[a]
        }
        fav = min(remaining, key=lambda s: key(a, s))
        assert alloc[a] == fav
    # individual rationality: nobody ends worse than their endowment
    for a in range(MD_D):
        assert key(a, alloc[a]) <= key(a, a)
    _parity(got, _oracle(tmp_path, _ttc_sql()))
