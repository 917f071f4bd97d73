"""Tests for the round-5 batch-21 blocking/audit operators
(blocking_ops): snm_blocking, hash_balance_audit, token_cond_entropy
— DuckDB-oracle parity plus brute force. The SNM test also plants a
range SMALLER than the window so the multi-seam stitch is exercised.
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.blocking_ops import (
    HASH_BALANCE_AUDIT_SQL,
    HBA_PARTS,
    SNM_BLOCKING_SQL,
    SNM_KLEN,
    SNM_W,
    TOKEN_COND_ENTROPY_SQL,
    q_hash_balance_audit,
    q_snm_blocking,
    q_token_cond_entropy,
)

N_DOCS = 60


def _texts(n=N_DOCS):
    out = []
    for i in range(n):
        lead = "abcde"[i % 5]
        if i == 7:
            lead = "q"  # a singleton range, smaller than the window
        out.append(
            f"{lead}tok{(i * 3) % 9} " + " ".join(
                f"w{(i + j) % 11}" for j in range(3 + i % 4)
            )
        )
    return out


def _write_docs(d, n=N_DOCS):
    texts = _texts(n)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(
                    [("en", "de")[i % 2] for i in range(n)], pa.string()
                ),
                "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
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


def test_snm_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_snm_blocking(str(tmp_path)))

    texts = _texts()
    order = sorted(
        range(N_DOCS), key=lambda i: (texts[i].lower()[:SNM_KLEN], i)
    )
    srcs = [f"s{i % 3}" for i in order]
    cand = same = 0
    for a in range(N_DOCS):
        for b in range(a + 1, min(a + SNM_W, N_DOCS)):
            cand += 1
            same += int(srcs[a] == srcs[b])
    r = got.iloc[0]
    assert int(r["n_docs"]) == N_DOCS
    assert int(r["n_candidates"]) == cand
    assert int(r["n_same_source"]) == same
    assert int(r["same_source_bp"]) == same * 10000 // cand
    # the singleton 'q' range forces pairs that span three ranges
    leads = sorted({texts[i].lower()[0] for i in range(N_DOCS)})
    assert "q" in leads

    _parity(got, _oracle(tmp_path, SNM_BLOCKING_SQL))


def test_hash_balance_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_hash_balance_audit(str(tmp_path)))

    texts = _texts()
    loads = [0] * HBA_PARTS
    for t in texts:
        loads[
            int(hashlib.md5(t.encode()).hexdigest()[:16], 16) % HBA_PARTS
        ] += 1
    n = N_DOCS
    chi2 = (HBA_PARTS * sum(x * x for x in loads) - n * n) * 1000 // n
    r = got.iloc[0]
    assert int(r["n_parts"]) == HBA_PARTS
    assert int(r["n_docs"]) == n
    assert int(r["max_load"]) == max(loads)
    assert int(r["min_load"]) == min(loads)
    assert int(r["chi2_x1000"]) == chi2

    _parity(got, _oracle(tmp_path, HASH_BALANCE_AUDIT_SQL))


def test_token_cond_entropy_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_token_cond_entropy(str(tmp_path)))

    texts = _texts()
    pairs: dict[str, dict] = {}
    for i, t in enumerate(texts):
        lg = ("en", "de")[i % 2]
        toks = t.lower().split()
        for a, b in zip(toks, toks[1:]):
            d = pairs.setdefault(lg, {})
            d[(a, b)] = d.get((a, b), 0) + 1
    exp = {}
    for lg, d in pairs.items():
        ctx: dict[str, list] = {}
        for (a, _b), v in d.items():
            ctx.setdefault(a, []).append(v)
        n_big = sum(sum(v) for v in ctx.values())
        term = sum(
            sum(v) * math.floor(1e6 * math.log(sum(v)))
            - sum(c * math.floor(1e6 * math.log(c)) for c in v)
            for v in ctx.values()
        )
        exp[lg] = (n_big, len(ctx), term // n_big)
    assert {
        r["lang"]: (
            int(r["n_bigrams"]),
            int(r["n_contexts"]),
            int(r["cond_entropy_unats"]),
        )
        for _, r in got.iterrows()
    } == exp
    # entropy must be positive (contexts have multiple continuations)
    assert all(v[2] > 0 for v in exp.values())

    _parity(got, _oracle(tmp_path, TOKEN_COND_ENTROPY_SQL))
