"""Tests for the round-5 batch-42 significance operators
(significance_ops): permutation_test, bh_fdr, effect_size — DuckDB
parity plus independent brute force. The corpus plants one source
with a strongly shifted n_chars distribution (its test must reject /
show a large effect) and several exchangeable sources (high p,
negligible effect). The BH test additionally pins the step-up rule
on a hand-built p-value vector.
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

from europarl_crawler_ray.pipelines.significance_ops import (
    BH_ALPHA_DEN,
    BH_ALPHA_NUM,
    BH_FDR_SQL,
    EFFECT_SIZE_SQL,
    PERM_K,
    PERMUTATION_TEST_SQL,
    q_bh_fdr,
    q_effect_size,
    q_permutation_test,
)

N = 90


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _corpus():
    """s_big: 30 docs of ~5000 chars; s0/s1: 60 docs of ~100 chars."""
    sources, n_chars = [], []
    for i in range(N):
        if i < 30:
            sources.append("s_big")
            n_chars.append(5000 + i)
        else:
            sources.append(f"s{i % 2}")
            n_chars.append(100 + i % 7)
    return sources, n_chars


def _write(d, sources=None, n_chars=None):
    if sources is None:
        sources, n_chars = _corpus()
    n = len(sources)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
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


def _brute_extreme(sources, n_chars):
    n_total = len(sources)
    s_total = sum(n_chars)
    by_src = {}
    for s, x in zip(sources, n_chars):
        a = by_src.setdefault(s, [0, 0])
        a[0] += 1
        a[1] += x
    out = {}
    for s, (na, sa) in by_src.items():
        nb, sb = n_total - na, s_total - sa
        obs_num = abs(sa * nb - sb * na)
        obs_den = na * nb
        ext = 0
        for k in range(PERM_K):
            nak = sak = 0
            for d in range(n_total):
                if _md5_64(f"perm:42:{k}:{d}") % n_total < na:
                    nak += 1
                    sak += n_chars[d]
            nbk, sbk = n_total - nak, s_total - sak
            if nak == 0 or nbk == 0:
                ext += 1
                continue
            if abs(sak * nbk - sbk * nak) * obs_den >= obs_num * (nak * nbk):
                ext += 1
        out[s] = (na, nb, ext)
    return out


def test_permutation_brute_force_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    sources, n_chars = _corpus()
    got = _unwrap(q_permutation_test(str(tmp_path)))
    exp = _brute_extreme(sources, n_chars)
    gotmap = {
        r["source"]: (int(r["n_a"]), int(r["n_b"]), int(r["n_extreme"]))
        for _, r in got.iterrows()
    }
    assert gotmap == exp
    # the planted shifted source is extreme in no random split
    assert gotmap["s_big"][2] == 0
    _parity(got, _oracle(tmp_path, PERMUTATION_TEST_SQL))


def test_permutation_exchangeable_sources_not_significant(
    ray_session, tmp_path
):
    """With all sources drawn from the same distribution, the
    randomization test must NOT reject: p is large for every source."""
    sources = [f"s{i % 3}" for i in range(60)]
    n_chars = [100 + (i * 17) % 23 for i in range(60)]
    _write(tmp_path, sources=sources, n_chars=n_chars)
    got = _unwrap(q_permutation_test(str(tmp_path)))
    assert (got["n_extreme"].to_numpy(np.int64) > PERM_K // 8).all()
    _parity(got, _oracle(tmp_path, PERMUTATION_TEST_SQL))


def test_bh_stepup_rule_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    got = _unwrap(q_bh_fdr(str(tmp_path)))
    # recompute the step-up cutoff from the returned p-values
    m = len(got)
    df = got.sort_values("rank")
    ext = (df["p_x1e6"].to_numpy(np.int64) * PERM_K // 10**6).astype(int)
    ranks = df["rank"].to_numpy(np.int64)
    ok = ext * m * BH_ALPHA_DEN <= ranks * PERM_K * BH_ALPHA_NUM
    cutoff = int(ranks[ok].max()) if ok.any() else 0
    assert (
        df["rejected"].to_numpy(np.int64) == (ranks <= cutoff).astype(int)
    ).all()
    # the planted source must be rejected; p == 0
    big = got[got["source"] == "s_big"].iloc[0]
    assert int(big["rejected"]) == 1 and int(big["p_x1e6"]) == 0
    _parity(got, _oracle(tmp_path, BH_FDR_SQL))


def test_effect_size_brute_force_and_parity(ray_session, tmp_path):
    _write(tmp_path)
    sources, n_chars = _corpus()
    got = _unwrap(q_effect_size(str(tmp_path)))
    n_total = len(sources)
    s_total = sum(n_chars)
    q_total = sum(x * x for x in n_chars)
    for _, r in got.iterrows():
        s = r["source"]
        xs = [x for src, x in zip(sources, n_chars) if src == s]
        na, sa, qa = len(xs), sum(xs), sum(x * x for x in xs)
        nb, sb, qb = n_total - na, s_total - sa, q_total - qa
        diff_num = sa * nb - sb * na
        ssa = na * qa - sa * sa
        ssb = nb * qb - sb * sb
        sp_num = ssa * nb + ssb * na
        exp = 10**6 * diff_num * diff_num * (na + nb - 2) // (na * nb * sp_num)
        assert int(r["d2_x1e6"]) == exp
        assert int(r["sign_diff"]) == (1 if diff_num > 0 else -1)
    # planted source: huge effect (d >> 0.8 i.e. d2 >> 640000)
    big = got[got["source"] == "s_big"].iloc[0]
    assert int(big["d2_x1e6"]) > 640000 and int(big["sign_diff"]) == 1
    _parity(got, _oracle(tmp_path, EFFECT_SIZE_SQL))
