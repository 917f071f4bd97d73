"""Statistical-significance operators (round-5 batch 42): the
randomization test for a difference in means (Fisher 1935's
permutation argument, binomial-split variant, determinized),
Benjamini-Hochberg FDR control over the resulting per-source p-values
(Benjamini & Hochberg 1995), and Cohen's d effect size (Cohen 1969,
reported as the exact rational d² plus the sign) — the A/B toolkit a
data-curation team runs before trusting a source-level difference.

Determinism: trial k reassigns doc d to pseudo-group A iff
md5_64('perm:42:<k>:<d>') % n_total < n_source — the same draw in
both engines; every comparison (|diff_k| ≥ |diff_obs|, BH's
p_(i) ≤ i·α/m, d²) is an exact integer cross-multiplication
(HUGEINT in the oracle) — no float ever decides anything.

Scale idioms: the observed side is per-source moment partials
(n, Σx, Σx²) → #sources-row reduce; the trial side ships
(source, trial) partial sums — a ≤ m·K-key bounded groupby no matter
the corpus size (the md5 draw is the only per-row work); BH and the
effect size are driver math over those bounded tables.

Reference parity: the reference has no statistics surface; these
extend the brief's eval/validation families.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from ..stages.multimodal import _md5_64
from .ml_queries import _md5u

PERM_K = 64  # randomization trials
BH_ALPHA_NUM = 1  # α = 1/10
BH_ALPHA_DEN = 10


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _source_moments(sf_dir: str) -> pd.DataFrame:
    """(source, n, s1, s2) exact moments of n_chars — #sources rows."""
    d = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.int64)
        g = pd.DataFrame(
            {
                "source": df["source"].to_numpy(object),
                "n": np.ones(len(x), np.int64),
                "s1": x,
                "s2": x * x,
            }
        )
        return g.groupby("source", as_index=False)[["n", "s1", "s2"]].sum()

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
        )
        .to_pandas()
    )
    for c in ("n", "s1", "s2"):
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values("source").reset_index(drop=True)


def _perm_table(sf_dir: str) -> pd.DataFrame:
    """Per (source, trial): randomized pseudo-A size and sum —
    m·K bounded rows. The draw u(d,k) = md5 % n_total is shared across
    sources (assignment to source s's pseudo-A iff u < n_s)."""
    moments = _source_moments(sf_dir)
    n_total = int(moments["n"].sum())
    src_sizes = [
        (s, int(n)) for s, n in zip(moments["source"], moments["n"])
    ]
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        x = df["n_chars"].to_numpy(np.int64)
        u = np.empty((len(ids), PERM_K), np.int64)
        for r, did in enumerate(ids):
            for k in range(PERM_K):
                u[r, k] = _md5_64(f"perm:42:{k}:{int(did)}") % n_total
        rows = []
        for s, ns in src_sizes:
            inA = u < ns  # (docs, K) bool
            na = inA.sum(axis=0)
            sa = (inA * x[:, None]).sum(axis=0)
            for k in range(PERM_K):
                rows.append((s, k, int(na[k]), int(sa[k])))
        return pd.DataFrame(
            rows, columns=["source", "k", "na", "sa"]
        ).astype({"k": np.int64, "na": np.int64, "sa": np.int64})

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby(["source", "k"])
        .aggregate(Sum("na", alias_name="na"), Sum("sa", alias_name="sa"))
        .to_pandas()  # m*K rows
    )
    for c in ("k", "na", "sa"):
        agg[c] = agg[c].astype(np.int64)
    return agg, moments, n_total


_EXTREME_CACHE: dict[tuple, pd.DataFrame] = {}


def _extreme_counts(sf_dir: str) -> pd.DataFrame:
    """(source, n_a, n_b, n_extreme) via exact integer comparisons.

    Memoized per source-table identity (path + mtime + size):
    permutation_test and bh_fdr share the 64-trial grid, and a sweep
    that runs both would otherwise pay the trial pass twice."""
    import os

    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    ck = (os.path.abspath(sf_dir), st.st_mtime_ns, st.st_size)
    hit = _EXTREME_CACHE.get(ck)
    if hit is not None:
        return hit.copy()
    out = _extreme_counts_compute(sf_dir)
    _EXTREME_CACHE.clear()  # hold one table at a time
    _EXTREME_CACHE[ck] = out
    return out.copy()


def _extreme_counts_compute(sf_dir: str) -> pd.DataFrame:
    trials, moments, n_total = _perm_table(sf_dir)
    s_total = int(moments["s1"].sum())
    out = []
    for _, m in moments.iterrows():
        s = m["source"]
        na, sa = int(m["n"]), int(m["s1"])
        nb, sb = n_total - na, s_total - sa
        if nb == 0:
            continue
        obs_num = abs(sa * nb - sb * na)  # |diff| = obs_num/(na*nb)
        obs_den = na * nb
        ext = 0
        t = trials[trials["source"] == s]
        for _, r in t.iterrows():
            nak, sak = int(r["na"]), int(r["sa"])
            nbk, sbk = n_total - nak, s_total - sak
            if nak == 0 or nbk == 0:
                ext += 1  # degenerate split: infinitely extreme
                continue
            num_k = abs(sak * nbk - sbk * nak)
            # |diff_k| >= |diff_obs|  <=>  num_k*obs_den >= obs_num*den_k
            if num_k * obs_den >= obs_num * (nak * nbk):
                ext += 1
        out.append((s, na, nb, ext))
    df = pd.DataFrame(out, columns=["source", "n_a", "n_b", "n_extreme"])
    for c in ("n_a", "n_b", "n_extreme"):
        df[c] = df[c].astype(np.int64)
    return df


# ====================================================== permutation_test
#
# Per source s: is mean(n_chars | source=s) different from the rest?
# PERM_K randomized splits; p = (#trials at least as extreme) / K.
# Output: (source, n_a, n_b, n_extreme, p_x1e6).
#
# Scale shape: trial partials are a ≤ m·K-key bounded groupby; the
# extremeness comparisons are driver math over m·K rows of exact
# integers.


def q_permutation_test(sf_dir: str):
    empty = pd.DataFrame(
        {
            "source": pd.Series(dtype=object),
            "n_a": pd.Series(dtype=np.int64),
            "n_b": pd.Series(dtype=np.int64),
            "n_extreme": pd.Series(dtype=np.int64),
            "p_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    df = _extreme_counts(sf_dir)
    if not len(df):
        return empty
    df = df.copy()
    df["p_x1e6"] = (
        10**6 * df["n_extreme"].to_numpy(np.int64) // PERM_K
    ).astype(np.int64)
    return df.sort_values("source").reset_index(drop=True)


_PERM_CORE_SQL = rf"""
m AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s1
  FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s1) AS BIGINT) AS st
        FROM m),
u AS (
  SELECT d.doc_id, d.n_chars, CAST(k.k AS BIGINT) AS k,
         {_md5u("'perm:42:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)")}
           % tot.nt AS u
  FROM documents d, unnest(range(0, {PERM_K})) AS k(k), tot),
tr AS (
  SELECT m.source, u.k,
         CAST(SUM(CASE WHEN u.u < m.n THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN u.u < m.n THEN u.n_chars ELSE 0 END) AS BIGINT)
           AS sa
  FROM u, m GROUP BY 1, 2),
ext AS (
  SELECT m.source, m.n AS n_a, tot.nt - m.n AS n_b,
         CAST(SUM(CASE
           WHEN tr.na = 0 OR tot.nt - tr.na = 0 THEN 1
           WHEN ABS(CAST(tr.sa AS HUGEINT) * (tot.nt - tr.na)
                    - CAST(tot.st - tr.sa AS HUGEINT) * tr.na)
                * (CAST(m.n AS HUGEINT) * (tot.nt - m.n))
                >= ABS(CAST(m.s1 AS HUGEINT) * (tot.nt - m.n)
                       - CAST(tot.st - m.s1 AS HUGEINT) * m.n)
                   * (CAST(tr.na AS HUGEINT) * (tot.nt - tr.na))
           THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM m JOIN tr ON tr.source = m.source, tot
  WHERE tot.nt - m.n > 0
  GROUP BY 1, 2, 3)
"""

PERMUTATION_TEST_SQL = f"""
WITH {_PERM_CORE_SQL}
SELECT source, n_a, n_b, n_extreme,
       CAST(1000000 * n_extreme // {PERM_K} AS BIGINT) AS p_x1e6
FROM ext
"""


# ============================================================== bh_fdr
#
# Benjamini-Hochberg step-up over the m per-source randomization
# p-values at α = 0.1: sort p ascending (ties by source asc), find the
# largest i with p_(i) ≤ i·α/m — every rank ≤ i rejects. The
# comparison is n_extremeᵢ·m·{BH_ALPHA_DEN} ≤ i·K·{BH_ALPHA_NUM} —
# integers only. Output: (source, p_x1e6, rank, rejected).


def q_bh_fdr(sf_dir: str):
    empty = pd.DataFrame(
        {
            "source": pd.Series(dtype=object),
            "p_x1e6": pd.Series(dtype=np.int64),
            "rank": pd.Series(dtype=np.int64),
            "rejected": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    df = _extreme_counts(sf_dir)
    if not len(df):
        return empty
    m = len(df)
    df = df.sort_values(
        ["n_extreme", "source"], kind="mergesort"
    ).reset_index(drop=True)
    df["rank"] = np.arange(1, m + 1, dtype=np.int64)
    ext = df["n_extreme"].to_numpy(np.int64)
    rank = df["rank"].to_numpy(np.int64)
    ok = ext * m * BH_ALPHA_DEN <= rank * PERM_K * BH_ALPHA_NUM
    cutoff = int(rank[ok].max()) if ok.any() else 0
    out = pd.DataFrame(
        {
            "source": df["source"],
            "p_x1e6": (10**6 * ext // PERM_K).astype(np.int64),
            "rank": rank,
            "rejected": (rank <= cutoff).astype(np.int64),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


BH_FDR_SQL = f"""
WITH {_PERM_CORE_SQL},
r AS (
  SELECT source, n_extreme,
         CAST(ROW_NUMBER() OVER (ORDER BY n_extreme ASC, source ASC)
              AS BIGINT) AS rank,
         CAST(COUNT(*) OVER () AS BIGINT) AS m_total
  FROM ext),
cut AS (
  SELECT COALESCE(MAX(rank), 0) AS cutoff
  FROM r
  WHERE n_extreme * m_total * {BH_ALPHA_DEN}
        <= rank * {PERM_K} * {BH_ALPHA_NUM})
SELECT source,
       CAST(1000000 * n_extreme // {PERM_K} AS BIGINT) AS p_x1e6,
       rank,
       CAST(CASE WHEN rank <= cut.cutoff THEN 1 ELSE 0 END AS BIGINT)
         AS rejected
FROM r, cut
"""


# ========================================================= effect_size
#
# Cohen's d per source vs rest, reported exactly: the SIGN of the
# mean difference and d² = (ā−b̄)² / s_p² as a ×10⁶ integer quotient
# (s_p² = pooled variance, Bessel-corrected). d² is a monotone
# transform of |d|, so small/medium/large-effect thresholds translate
# directly (0.2→40000, 0.5→250000, 0.8→640000).
#
# Scale shape: pure driver math over the #sources-row moment table.


def q_effect_size(sf_dir: str):
    empty = pd.DataFrame(
        {
            "source": pd.Series(dtype=object),
            "sign_diff": pd.Series(dtype=np.int64),
            "d2_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    moments = _source_moments(sf_dir)
    n_total = int(moments["n"].sum())
    s_total = int(moments["s1"].sum())
    q_total = int(moments["s2"].sum())
    out = []
    for _, m in moments.iterrows():
        s = m["source"]
        na, sa, qa = int(m["n"]), int(m["s1"]), int(m["s2"])
        nb, sb, qb = n_total - na, s_total - sa, q_total - qa
        if nb == 0 or na == 0 or na + nb <= 2:
            continue
        # d² = diff² / s_p²; all terms scaled by (na·nb)² and the
        # pooled-variance denominator to stay integral:
        diff_num = sa * nb - sb * na  # diff = diff_num / (na*nb)
        ssa = na * qa - sa * sa  # na² · var_a_biased·na … exact: nΣx²−(Σx)²
        ssb = nb * qb - sb * sb
        # s_p² = (ssa/na + ssb/nb) / (na+nb-2)
        #      = (ssa·nb + ssb·na) / (na·nb·(na+nb−2))
        sp_num = ssa * nb + ssb * na
        if sp_num == 0:
            continue
        # d² = diff_num²/(na·nb)² ÷ sp_num/(na·nb·(na+nb−2))
        #    = diff_num²·(na+nb−2) / ((na·nb)·sp_num)
        d2 = 10**6 * diff_num * diff_num * (na + nb - 2) // (
            na * nb * sp_num
        )
        out.append((s, 1 if diff_num > 0 else (-1 if diff_num < 0 else 0), d2))
    df = pd.DataFrame(out, columns=["source", "sign_diff", "d2_x1e6"])
    for c in ("sign_diff", "d2_x1e6"):
        df[c] = df[c].astype(np.int64)
    return df.sort_values("source").reset_index(drop=True)


EFFECT_SIZE_SQL = """
WITH m AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s1,
         CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS s2
  FROM documents GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s1) AS BIGINT) AS st,
         CAST(SUM(s2) AS HUGEINT) AS qt
  FROM m),
e AS (
  SELECT m.source,
         CAST(m.s1 AS HUGEINT) * (tot.nt - m.n)
           - CAST(tot.st - m.s1 AS HUGEINT) * m.n AS diff_num,
         CAST(m.n AS HUGEINT) * m.s2 - CAST(m.s1 AS HUGEINT) * m.s1 AS ssa,
         CAST(tot.nt - m.n AS HUGEINT) * (tot.qt - m.s2)
           - CAST(tot.st - m.s1 AS HUGEINT) * (tot.st - m.s1) AS ssb,
         m.n AS na, tot.nt - m.n AS nb
  FROM m, tot
  WHERE m.n > 0 AND tot.nt - m.n > 0 AND tot.nt > 2)
SELECT source,
       CAST(CASE WHEN diff_num > 0 THEN 1
                 WHEN diff_num < 0 THEN -1 ELSE 0 END AS BIGINT)
         AS sign_diff,
       CAST(1000000 * diff_num * diff_num * (na + nb - 2)
            // (CAST(na AS HUGEINT) * nb * (ssa * nb + ssb * na))
            AS BIGINT) AS d2_x1e6
FROM e
WHERE ssa * nb + ssb * na <> 0
"""


SIGNIFICANCE_SQL_QUERIES: dict[str, tuple] = {
    "permutation_test": (q_permutation_test, PERMUTATION_TEST_SQL),
    "bh_fdr": (q_bh_fdr, BH_FDR_SQL),
    "effect_size": (q_effect_size, EFFECT_SIZE_SQL),
}
