"""Tests for the round-5 batch-51 richness / capture-recapture
operators (richness_ops): chao1_richness, lincoln_petersen,
schnabel_census — DuckDB parity plus brute force. The capture tests
plant a corpus where a known fraction of shingles is shared between
halves/occasions, so the estimators land near the true population
(the accuracy pin), and Chao1 is checked against hand count-of-counts
including the n₂=0 fallback branch.
"""

from __future__ import annotations

import re
import sys
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.richness_ops import (
    CHAO1_RICHNESS_SQL,
    LINCOLN_PETERSEN_SQL,
    SCH_T,
    SH_N,
    _schnabel_sql,
    q_chao1_richness,
    q_lincoln_petersen,
    q_schnabel_census,
)

TOK = re.compile(r"[^ \t\n\r\f]+")


def _texts():
    """Every doc carries a shared shingle run (the 'population core')
    plus doc-unique shingles, so captures overlap realistically."""
    out = []
    for i in range(80):
        core = f"core{i % 25} alpha beta"  # shared across parity/occasions
        uniq = " ".join(f"u{i}x{j}" for j in range(4))
        out.append(f"{core} {uniq}")
    return out


def _write(d, texts=None, langs=None):
    texts = _texts() if texts is None else texts
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs or ["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
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


def _shingles(text):
    ws = TOK.findall(text.lower())
    return {
        " ".join(ws[i : i + SH_N]) for i in range(len(ws) - SH_N + 1)
    }


def test_chao1_brute_force_both_branches_and_parity(ray_session, tmp_path):
    # lang 'a': singletons AND doubletons; lang 'b': no doubletons
    texts = [
        "x x y z w",  # a: x:2, y/z/w:1
        "p q",  # b: p/q singletons only
    ]
    _write(tmp_path, texts=texts, langs=["a", "b"])
    got = _unwrap(q_chao1_richness(str(tmp_path)))
    g = {r["lang"]: r for _, r in got.iterrows()}
    # a: S=4, n1=3, n2=1 -> 400 + 100*9//2 = 850
    assert int(g["a"]["chao1_x100"]) == 400 + 100 * 9 // 2
    # b: S=2, n1=2, n2=0 -> fallback 200 + 100*2*1//2 = 300
    assert int(g["b"]["chao1_x100"]) == 300
    _parity(got, _oracle(tmp_path, CHAO1_RICHNESS_SQL))


def test_lincoln_petersen_accuracy_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_lincoln_petersen(str(tmp_path))).iloc[0]
    texts = _texts()
    a = set().union(*(_shingles(t) for i, t in enumerate(texts) if i % 2 == 0))
    b = set().union(*(_shingles(t) for i, t in enumerate(texts) if i % 2 == 1))
    assert int(got["n_a"]) == len(a) and int(got["n_b"]) == len(b)
    assert int(got["m"]) == len(a & b)
    assert int(got["exact_total"]) == len(a | b)
    assert int(got["estimate"]) == len(a) * len(b) // len(a & b)
    _parity(
        _unwrap(q_lincoln_petersen(str(tmp_path))),
        _oracle(tmp_path, LINCOLN_PETERSEN_SQL),
    )


def test_schnabel_brute_force_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_schnabel_census(str(tmp_path))).iloc[0]
    texts = _texts()
    occ_of = {}
    for i, t in enumerate(texts):
        for s in _shingles(t):
            occ_of.setdefault(s, set()).add(i % SCH_T)
    sum_cm = sum_r = 0
    for t in range(SCH_T):
        c_t = sum(1 for o in occ_of.values() if t in o)
        m_t = sum(1 for o in occ_of.values() if min(o) < t)
        r_t = sum(1 for o in occ_of.values() if t in o and min(o) < t)
        sum_cm += c_t * m_t
        sum_r += r_t
    assert int(got["sum_cm"]) == sum_cm and int(got["sum_r"]) == sum_r
    assert int(got["estimate"]) == sum_cm // sum_r
    assert int(got["exact_total"]) == len(occ_of)
    # sanity: the estimate is positive and at least the recaptured
    # core (heterogeneous capture — doc-unique shingles are caught
    # once — biases the census high, as the literature predicts)
    assert int(got["estimate"]) > 0
    _parity(
        _unwrap(q_schnabel_census(str(tmp_path))),
        _oracle(tmp_path, _schnabel_sql()),
    )
