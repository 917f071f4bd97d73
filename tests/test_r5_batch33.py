"""Tests for the round-5 batch-33 serving operators (serving_ops):
rendezvous_assign, t_closeness_audit, ql_dirichlet_rank — DuckDB
parity plus brute force. The HRW test additionally pins the
minimal-churn guarantee (survivors only GAIN keys when node 0 dies,
and the gains sum to node 0's loss); the t-closeness test plants one
language whose length distribution is shifted far from the corpus.
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

from europarl_crawler_ray.pipelines.serving_ops import (
    HRW_DEAD,
    HRW_NODES,
    QL_DIRICHLET_RANK_SQL,
    QL_MU,
    QL_QUERY,
    QL_TOPK,
    RENDEZVOUS_ASSIGN_SQL,
    TCLOSE_CELL,
    TCLOSE_MAXCELL,
    T_CLOSENESS_AUDIT_SQL,
    q_ql_dirichlet_rank,
    q_rendezvous_assign,
    q_t_closeness_audit,
)

N_DOCS = 120


def _texts(n=N_DOCS):
    out = []
    for i in range(n):
        toks = ["merge"] * (i % 4) + ["window"] * (i % 3) + ["pad"] * (2 + i % 5)
        out.append(" ".join(toks))
    return out


def _langs(n=N_DOCS):
    return ["xx" if i % 10 == 0 else f"l{i % 3}" for i in range(n)]


def _lengths(n=N_DOCS):
    # 'xx' docs live in the top cell; others spread low cells
    return [
        TCLOSE_CELL * (TCLOSE_MAXCELL + 3) if i % 10 == 0
        else (i % 5) * TCLOSE_CELL
        for i in range(n)
    ]


def _write_tables(d, n=N_DOCS):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(_texts(n), pa.string()),
                "lang": pa.array(_langs(n), pa.string()),
                "source": pa.array(["s0"] * n, pa.string()),
                "n_chars": pa.array(_lengths(n), pa.int64()),
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


def _hrw_owner(i, exclude=None):
    best, arg = -1, -1
    for n in range(HRW_NODES):
        if exclude is not None and n == exclude:
            continue
        h = int(hashlib.md5(f"hrw|{i}|{n}".encode()).hexdigest()[:16], 16)
        if h > best:
            best, arg = h, n
    return arg


def test_rendezvous_brute_force_churn_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_rendezvous_assign(str(tmp_path)))

    full = [_hrw_owner(i) for i in range(N_DOCS)]
    after = [_hrw_owner(i, exclude=HRW_DEAD) for i in range(N_DOCS)]
    exp = {
        n: (full.count(n), after.count(n)) for n in range(HRW_NODES)
    }
    assert {
        int(r["node"]): (int(r["n_keys"]), int(r["n_keys_after"]))
        for _, r in got.iterrows()
    } == exp
    # minimal churn: only node 0's keys move; survivors never lose
    assert exp[HRW_DEAD][1] == 0
    for n in range(HRW_NODES):
        if n != HRW_DEAD:
            assert exp[n][1] >= exp[n][0]
    assert sum(v[1] for v in exp.values()) == N_DOCS
    # keys whose owner survived must NOT move
    for i in range(N_DOCS):
        if full[i] != HRW_DEAD:
            assert after[i] == full[i]

    _parity(got, _oracle(tmp_path, RENDEZVOUS_ASSIGN_SQL))


def test_t_closeness_brute_force_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_t_closeness_audit(str(tmp_path)))

    langs, lens = _langs(), _lengths()
    cell = [min(c // TCLOSE_CELL, TCLOSE_MAXCELL) for c in lens]
    cells = sorted(set(cell))
    n_total = len(langs)
    exp = {}
    for lg in sorted(set(langs)):
        idx = [i for i in range(n_total) if langs[i] == lg]
        ng = len(idx)
        acc, cum = 0, 0
        for cl in cells:
            gi = sum(1 for i in idx if cell[i] == cl)
            qi = sum(1 for i in range(n_total) if cell[i] == cl)
            acc += gi * n_total - qi * ng
            cum += abs(acc)
        t_ppm = 1_000_000 * cum // (ng * n_total * (len(cells) - 1))
        exp[lg] = (ng, t_ppm)
    assert {
        r["lang"]: (int(r["n_rows"]), int(r["t_ppm"]))
        for _, r in got.iterrows()
    } == exp
    # the planted 'xx' group is concentrated in the far cell: its t
    # dominates every balanced group
    assert exp["xx"][1] > max(v[1] for k, v in exp.items() if k != "xx")

    _parity(got, _oracle(tmp_path, T_CLOSENESS_AUDIT_SQL))


def test_ql_dirichlet_brute_force_and_parity(ray_session, tmp_path):
    _write_tables(tmp_path)
    got = _unwrap(q_ql_dirichlet_rank(str(tmp_path)))

    texts = _texts()
    toks = [t.split(" ") for t in texts]
    c_total = sum(len(ts) for ts in toks)
    cfs = [sum(ts.count(q) for ts in toks) for q in QL_QUERY]
    scored = []
    for i, ts in enumerate(toks):
        num = 1
        for j, q in enumerate(QL_QUERY):
            num *= ts.count(q) * c_total + QL_MU * cfs[j]
        den = (c_total * (len(ts) + QL_MU)) ** len(QL_QUERY)
        scored.append((10**12 * num // den, i))
    scored.sort(key=lambda x: (-x[0], x[1]))
    exp = [
        (r + 1, i, s) for r, (s, i) in enumerate(scored[:QL_TOPK])
    ]
    assert [
        (int(r["rank"]), int(r["doc_id"]), int(r["score_x1e12"]))
        for _, r in got.iterrows()
    ] == exp
    # docs with both query terms outrank term-free docs
    both = {i for i, ts in enumerate(toks)
            if ts.count(QL_QUERY[0]) and ts.count(QL_QUERY[1])}
    assert exp[0][1] in both

    _parity(got, _oracle(tmp_path, QL_DIRICHLET_RANK_SQL))
