"""Tests for the round-5 batch-28 storage/IR audit operators
(storageir_ops): bbit_collision_rate, dict_encoding_gain,
shard_pruning — DuckDB-oracle parity plus brute force.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.functions.dedup import (
    N_PERM,
    batch_minhash_sigs_p,
    shingle_strings,
)
from europarl_crawler_ray.pipelines.storageir_ops import (
    BBIT_BS,
    DICT_COLS,
    SP_SHARDS,
    SP_TERMS,
    _bbit_sql,
    _dict_gain_sql,
    _shard_pruning_sql,
    q_bbit_collision_rate,
    q_dict_encoding_gain,
    q_shard_pruning,
)

N_DOCS = 40


def _texts(n=N_DOCS):
    out = []
    for i in range(n):
        toks = [f"w{(i * 7 + j) % 23}" for j in range(5 + i % 6)]
        if i % 4 == 0:
            toks.append("merge")
        if i % 8 == 0:
            toks.append("window")
        if i == 3:
            toks.append("theory")
        # "quantum" never appears: a fully-skippable probe term
        out.append(" ".join(toks))
    return out


def _write_docs(d, n=N_DOCS):
    texts = _texts(n)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(
                    [("en", "de", "fr")[i % 3] for i in range(n)], pa.string()
                ),
                "source": pa.array([f"s{i % 5}" for i in range(n)], pa.string()),
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


def test_bbit_collision_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_bbit_collision_rate(str(tmp_path)))

    texts = [t for t in _texts() if shingle_strings(t)]
    sigs = batch_minhash_sigs_p(texts)
    n = len(texts)
    exp = {}
    for b in BBIT_BS:
        bv = (sigs % np.uint64(1 << b)).astype(np.int64)
        sq = 0
        for j in range(N_PERM):
            _, cnts = np.unique(bv[:, j], return_counts=True)
            sq += int(sum(int(c) * int(c) for c in cnts))
        exp[b] = (n, sq * 1_000_000 // (N_PERM * n * n), 1_000_000 // (1 << b))
    assert {
        int(r["b"]): (
            int(r["n_docs"]),
            int(r["collision_ppm"]),
            int(r["ideal_ppm"]),
        )
        for _, r in got.iterrows()
    } == exp
    # the empirical base rate sits at or above the ideal 2^-b
    for b in BBIT_BS:
        assert exp[b][1] >= exp[b][2] - 1

    _parity(got, _oracle(tmp_path, _bbit_sql()))


def test_dict_gain_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_dict_encoding_gain(str(tmp_path)))

    vals = {
        "lang": [("en", "de", "fr")[i % 3] for i in range(N_DOCS)],
        "source": [f"s{i % 5}" for i in range(N_DOCS)],
    }
    for col in DICT_COLS:
        vs = vals[col]
        distinct = sorted(set(vs))
        raw = sum(len(v.encode()) for v in vs)
        code = ((len(distinct) - 1).bit_length() + 7) // 8
        dict_total = sum(len(v.encode()) for v in distinct) + N_DOCS * code
        r = got[got["column"] == col].iloc[0]
        assert int(r["n_rows"]) == N_DOCS
        assert int(r["n_distinct"]) == len(distinct)
        assert int(r["raw_bytes"]) == raw
        assert int(r["dict_bytes"]) == dict_total
        assert int(r["saved_bp"]) == max(raw - dict_total, 0) * 10000 // raw
    # 2-char values with <= 5 distinct: dictionary must win
    assert (got["saved_bp"] > 0).all()

    _parity(got, _oracle(tmp_path, _dict_gain_sql()))


def test_shard_pruning_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_shard_pruning(str(tmp_path)))

    texts = _texts()
    exp = {}
    for term in SP_TERMS:
        shards = {
            i * SP_SHARDS // N_DOCS
            for i, t in enumerate(texts)
            if term in t.split(" ")
        }
        exp[term] = (
            len(shards),
            (SP_SHARDS - len(shards)) * 10000 // SP_SHARDS,
        )
    assert {
        r["term"]: (int(r["n_shards_hit"]), int(r["skippable_bp"]))
        for _, r in got.iterrows()
    } == exp
    # absent term -> fully skippable; common term -> many shards hit
    assert exp["quantum"] == (0, 10000)
    assert exp["merge"][0] > SP_SHARDS // 2

    _parity(got, _oracle(tmp_path, _shard_pruning_sql()))
