"""Tests for the round-5 batch-58 keyword operators (keyword_ops):
rake_keywords, textrank_keywords, lead_coverage — DuckDB parity plus
brute force on a corpus WITH planted stopwords (the rid-before-filter
SQL regression was exactly a stopword-splitting bug, so the fixtures
exercise real phrase splits). Pins: RAKE scores match a hand-rolled
deg/freq computation; TextRank's hub word (adjacent to everything)
ranks first; lead coverage is 100 for short docs and the lead set is
a subset bound.
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

from europarl_crawler_ray.pipelines.keyword_ops import (
    LEAD_COVERAGE_SQL,
    LEAD_K,
    RAKE_KEYWORDS_SQL,
    RAKE_TOPK,
    TR_ROUNDS,
    _phrases_of,
    _textrank_sql,
    q_lead_coverage,
    q_rake_keywords,
    q_textrank_keywords,
)

TOK = re.compile(r"[^ \t\n\r\f]+")


def _texts():
    """Docs with stopword-delimited phrases; 'hub' neighbours many."""
    out = []
    for i in range(50):
        out.append(
            f"alpha beta the hub gamma{i % 5} and hub delta{i % 3} "
            f"of epsilon zeta{i % 4}"
        )
    out.append("solo")
    return out


def _write(d, texts=None):
    texts = _texts() if texts is None else texts
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
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


def _brute_rake(texts):
    freq, deg = Counter(), Counter()
    phrases = Counter()
    for t in texts:
        for ph in _phrases_of(t, TOK):
            ln = len(ph)
            phrases[" ".join(ph)] += 1
            for w in ph:
                freq[w] += 1
                deg[w] += ln
    ws = {w: 100 * deg[w] // freq[w] for w in freq}
    rows = [
        (p, n, sum(ws[w] for w in p.split(" ")))
        for p, n in phrases.items()
    ]
    rows.sort(key=lambda r: (-r[2], r[0]))
    return pd.DataFrame(
        rows[:RAKE_TOPK],
        columns=["phrase", "n_occurrences", "score_x100"],
    )


def test_rake_brute_force_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_rake_keywords(str(tmp_path)))
    exp = _brute_rake(_texts())
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False,
    )
    # phrases really split at stopwords: no stopword inside any phrase
    for p in got["phrase"]:
        assert not ({"the", "and", "of"} & set(p.split(" ")))
    _parity(got, _oracle(tmp_path, RAKE_KEYWORDS_SQL))


def test_textrank_hub_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_textrank_keywords(str(tmp_path)))
    # 'hub' adjoins gamma*/delta* variants; after 2 iterations its
    # MASS flows to its neighbours (power iteration alternates), so
    # pin membership, not first place — exact ordering is pinned by
    # the brute-force equality below
    assert "hub" in set(got["token"])
    # brute-force the iteration
    adj = {}
    for t in _texts():
        for ph in _phrases_of(t, TOK):
            for a, b in zip(ph, ph[1:]):
                if a != b:
                    adj.setdefault(a, set()).add(b)
                    adj.setdefault(b, set()).add(a)
    score = {w: 1 for w in adj}
    for _ in range(TR_ROUNDS):
        score = {w: sum(score[x] for x in ns) for w, ns in adj.items()}
    exp = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert [
        (r["token"], int(r["score"])) for _, r in got.iterrows()
    ] == [(t, s) for t, s in exp]
    _parity(got, _oracle(tmp_path, _textrank_sql()))


def test_lead_coverage_bounds_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_lead_coverage(str(tmp_path)))
    texts = _texts()
    for _, r in got.iterrows():
        ws = TOK.findall(texts[int(r["doc_id"])].lower())
        assert int(r["n_distinct"]) == len(set(ws))
        assert int(r["lead_distinct"]) == len(set(ws[:LEAD_K]))
        assert int(r["lead_distinct"]) <= int(r["n_distinct"])
    # the single-token doc has full lead coverage
    solo = got[got["doc_id"] == len(texts) - 1].iloc[0]
    assert int(solo["coverage_x100"]) == 100
    _parity(got, _oracle(tmp_path, LEAD_COVERAGE_SQL))
