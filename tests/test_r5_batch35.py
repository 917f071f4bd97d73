"""Tests for the round-5 batch-35 index-audit operators
(indexaudit_ops): distinctive_tokens, elias_fano_bits, wand_bounds —
DuckDB parity plus independent brute force. The log-odds test plants a
token exclusive to one language and asserts it tops that language's
list; the Elias-Fano test checks the closed form against a real
encoder-size computation; the WAND test pins the smallest-doc-id tie
rule.
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

from europarl_crawler_ray.pipelines.indexaudit_ops import (
    DISTINCT_K,
    DISTINCTIVE_TOKENS_SQL,
    ELIAS_FANO_BITS_SQL,
    WAND_BOUNDS_SQL,
    q_distinctive_tokens,
    q_elias_fano_bits,
    q_wand_bounds,
)

TOK = re.compile(r"[^ \t\n\r\f]+")


def _texts_langs():
    texts, langs = [], []
    for i in range(60):
        lg = f"l{i % 3}"
        words = ["the", "and", f"shared{i % 7}"]
        if lg == "l0":
            words += ["zebra", "zebra"]  # exclusive to l0
        if lg == "l1":
            words += ["yak"]
        words += [f"fill{i % 11}"] * (1 + i % 3)
        texts.append(" ".join(words))
        langs.append(lg)
    return texts, langs


def _write(d, texts=None, langs=None):
    if texts is None:
        texts, langs = _texts_langs()
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


def _brute_distinctive(texts, langs):
    c = Counter()
    for t, lg in zip(texts, langs):
        for w in TOK.findall(t.lower()):
            c[(lg, w)] += 1
    nl = Counter()
    ct = Counter()
    for (lg, w), k in c.items():
        nl[lg] += k
        ct[w] += k
    n_tot = sum(nl.values())
    v = len(ct)
    rows = []
    for (lg, w), k in c.items():
        cr = ct[w] - k
        num = (k + 1) * ((n_tot - nl[lg]) - cr + v)
        den = (cr + 1) * (nl[lg] - k + v)
        rows.append((lg, w, 10**9 * num // den))
    df = pd.DataFrame(rows, columns=["lang", "token", "score_x1e9"])
    df = df.sort_values(
        ["lang", "score_x1e9", "token"], ascending=[True, False, True]
    )
    df["rank"] = df.groupby("lang").cumcount() + 1
    return df[df["rank"] <= DISTINCT_K][
        ["lang", "token", "rank", "score_x1e9"]
    ].reset_index(drop=True)


def test_distinctive_brute_force_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    texts, langs = _texts_langs()
    got = _unwrap(q_distinctive_tokens(str(tmp_path)))
    exp = _brute_distinctive(texts, langs)
    # the planted exclusive token tops its language
    top_l0 = got[(got["lang"] == "l0") & (got["rank"] == 1)]["token"].iloc[0]
    assert top_l0 == "zebra"
    _parity(got, exp)
    _parity(got, _oracle(tmp_path, DISTINCTIVE_TOKENS_SQL))


def _ef_encode_bits(postings, u):
    """Actual Elias-Fano encoded size: l low bits per element + unary
    upper stream of n ones and (u >> l) zeros."""
    n = len(postings)
    l = max(0, (u // n).bit_length() - 1)
    return n * l + n + (u >> l)


def test_elias_fano_closed_form_matches_real_encoding(ray_session, tmp_path):
    _write(tmp_path)
    texts, langs = _texts_langs()
    got = _unwrap(q_elias_fano_bits(str(tmp_path)))
    u = len(texts)
    inv = {}
    for i, t in enumerate(texts):
        for w in set(TOK.findall(t.lower())):
            inv.setdefault(w, []).append(i)
    for _, r in got.iterrows():
        postings = inv[r["token"]]
        assert int(r["n_postings"]) == len(postings)
        assert int(r["ef_bits"]) == _ef_encode_bits(sorted(postings), u)
        assert int(r["plain_bits"]) == 64 * len(postings)
    _parity(got, _oracle(tmp_path, ELIAS_FANO_BITS_SQL))


def test_wand_tie_rule_and_parity(ray_session, tmp_path):
    # doc 0 and doc 1 both contain 'tie' exactly 3 times -> arg_doc 0
    texts = ["tie tie tie a", "tie tie tie b", "tie c", "d"]
    _write(tmp_path, texts=texts, langs=["en"] * 4)
    got = _unwrap(q_wand_bounds(str(tmp_path)))
    row = got[got["token"] == "tie"].iloc[0]
    assert int(row["max_tf"]) == 3 and int(row["arg_doc"]) == 0
    assert int(row["df"]) == 3
    _parity(got, _oracle(tmp_path, WAND_BOUNDS_SQL))


def test_empty_corpus_all_three(ray_session, tmp_path):
    _write(tmp_path, texts=[], langs=[])
    for fn in (q_distinctive_tokens, q_elias_fano_bits, q_wand_bounds):
        got = _unwrap(fn(str(tmp_path)))
        assert len(got) == 0 and len(got.columns) >= 4
