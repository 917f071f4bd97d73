"""Tests for the round-5 batch-27 distribution-structure operators
(distfit_ops): natural_breaks, abbreviation_law, pagerank_lumpability
— DuckDB-oracle parity plus brute force. The breaks test plants a
clean trimodal distribution; the abbreviation test plants the law
(frequent short tokens vs rare long ones); the Python-int fallback of
natural_breaks is exercised directly against the numpy path.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from europarl_crawler_ray.pipelines.distfit_ops import (
    ABBR_BANDS,
    ABBREVIATION_LAW_SQL,
    LUMP_ITERS,
    NATURAL_BREAKS_SQL,
    q_abbreviation_law,
    q_natural_breaks,
    q_pagerank_lumpability,
    _lumpability_sql,
)
from europarl_crawler_ray.pipelines.sitegraph_ops import (
    N_SITES,
    q_domain_pagerank,
    q_hostgraph_contract,
)

N_DOCS = 60


def _texts(n=N_DOCS):
    # frequent short tokens, rare long ones -> law of abbreviation
    out = []
    for i in range(n):
        toks = ["a", "of", "the"] * 4 + [f"mediumtok{(i * 5) % 9}"] * 2
        if i % 6 == 0:
            toks.append(f"extraordinarilylongtoken{i}")
        out.append(" ".join(toks))
    return out


def _lengths(n=N_DOCS):
    # trimodal: short (30-36), medium (200-208), long (900-910)
    out = []
    for i in range(n):
        if i % 3 == 0:
            out.append(30 + i % 7)
        elif i % 3 == 1:
            out.append(200 + i % 9)
        else:
            out.append(900 + i % 11)
    return out


def _write_docs(d, n=N_DOCS):
    texts = _texts(n)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
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


def _breaks_brute(lens):
    vals = sorted(set(lens))
    n_tot, s_tot = len(lens), sum(lens)
    best = None
    for i, t1 in enumerate(vals[:-2]):
        for t2 in vals[i + 1 : -1]:
            n1 = sum(1 for x in lens if x <= t1)
            s1 = sum(x for x in lens if x <= t1)
            n12 = sum(1 for x in lens if x <= t2)
            s12 = sum(x for x in lens if x <= t2)
            n2, s2 = n12 - n1, s12 - s1
            n3, s3 = n_tot - n12, s_tot - s12
            sc = (s1 * s1) // n1 + (s2 * s2) // n2 + (s3 * s3) // n3
            if best is None or sc > best[0]:
                best = (sc, t1, t2, n1, n2, n3)
    return best


def test_natural_breaks_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_natural_breaks(str(tmp_path)))

    sc, t1, t2, n1, n2, n3 = _breaks_brute(_lengths())
    r = got.iloc[0]
    assert (int(r["t1"]), int(r["t2"])) == (t1, t2)
    assert (int(r["n1"]), int(r["n2"]), int(r["n3"])) == (n1, n2, n3)
    assert int(r["score"]) == sc
    # the breaks must separate the three planted modes (the medium
    # mode only realizes {201, 204, 207} under the i%3 / i%9 cycle)
    assert 30 <= t1 < 200 and 200 <= t2 < 900

    _parity(got, _oracle(tmp_path, NATURAL_BREAKS_SQL))


def test_natural_breaks_bigint_fallback_matches_numpy(monkeypatch):
    # drive the arbitrary-precision branch on the same histogram by
    # faking a huge corpus: scale every value by 10^6 so Σlen > 3e9
    lens = [x * 1_000_000 for x in _lengths()]
    sc, t1, t2, n1, n2, n3 = _breaks_brute(lens)
    sc2, t1b, t2b, *_ = _breaks_brute([x for x in lens])
    assert (t1, t2) == (t1b, t2b) and sc == sc2
    # and the scaled argmax picks the same (scaled) breakpoints as the
    # unscaled problem — the objective is scale-covariant
    _, ut1, ut2, *_ = _breaks_brute(_lengths())
    assert (t1, t2) == (ut1 * 1_000_000, ut2 * 1_000_000)


def test_abbreviation_law_brute_force_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_abbreviation_law(str(tmp_path)))

    texts = _texts()
    counts: dict[str, int] = {}
    for t in texts:
        for tok in t.lower().split():
            counts[tok] = counts.get(tok, 0) + 1
    cells: dict[int, list] = {}
    for tok, c in counts.items():
        a = cells.setdefault(c, [0, 0])
        a[0] += 1
        a[1] += len(tok)
    total_types = len(counts)
    exp: dict[int, list] = {}
    start = 1
    for c in sorted(cells, reverse=True):
        n_ty, len_sum = cells[c]
        band = min((start - 1) * ABBR_BANDS // total_types + 1, ABBR_BANDS)
        a = exp.setdefault(band, [0, 0, 0])
        a[0] += n_ty
        a[1] += c * n_ty
        a[2] += len_sum
        start += n_ty
    assert {
        int(r["band"]): (
            int(r["n_types"]),
            int(r["n_occurrences"]),
            int(r["mean_len_ppm"]),
        )
        for _, r in got.iterrows()
    } == {b: (v[0], v[1], v[2] * 1_000_000 // v[0]) for b, v in exp.items()}
    # the law: the most frequent band is shorter than the rarest
    bands = got.set_index("band")["mean_len_ppm"]
    assert int(bands.loc[1]) < int(bands.loc[bands.index.max()])

    _parity(got, _oracle(tmp_path, ABBREVIATION_LAW_SQL))


def test_lumpability_composition_and_parity(ray_session, tmp_path):
    _write_docs(tmp_path)
    got = _unwrap(q_pagerank_lumpability(str(tmp_path)))

    page = _unwrap(q_domain_pagerank(str(tmp_path)))
    hg = _unwrap(q_hostgraph_contract(str(tmp_path)))
    sites = sorted(int(v) for v in page["site"])
    out_w = dict.fromkeys(sites, 0)
    edges = []
    for _, r in hg.iterrows():
        u, v, w = int(r["src_site"]), int(r["dst_site"]), int(r["n_edges"])
        edges.append((u, v, w))
        out_w[u] += w
    pr = dict.fromkeys(sites, 1_000_000)
    for _ in range(LUMP_ITERS):
        inc = dict.fromkeys(sites, 0)
        for u, v, w in edges:
            inc[v] += pr[u] * w * 85 // (out_w[u] * 100)
        pr = {v: 150_000 + inc[v] for v in sites}
    for _, r in got.iterrows():
        s = int(r["site"])
        prow = page[page["site"] == s].iloc[0]
        mean_page = int(prow["pagerank_sum"]) // int(prow["n_pages"])
        assert int(r["page_pr_mean"]) == mean_page
        assert int(r["host_pr"]) == pr[s]
        assert int(r["abs_gap"]) == abs(mean_page - pr[s])
    assert len(got) == len(sites)

    _parity(got, _oracle(tmp_path, _lumpability_sql()))
