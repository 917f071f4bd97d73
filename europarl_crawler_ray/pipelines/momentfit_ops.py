"""Moment-fitting operators (round-5 batch 59): the log-normal fit of
document lengths (the canonical web-document-size model since
Barford & Crovella 1998), the gamma fit by method of moments
(k = μ²/σ², θ = σ²/μ — pure integer rationals, no logarithm), and
the geometric fit of events-per-user with its predicted-vs-observed
head table (p̂ = n/Σx MLE; the churn-model sanity check) — three
parametric lenses on the corpus's size and activity distributions.

Exactness: gamma and geometric are integer rationals end to end;
the log-normal needs ln(value) ONCE PER DISTINCT LENGTH — evaluated
as the mirrored-verbatim ⌊10⁹·ln(value)⌋ on the value histogram
(the repo's single-float-expression rule), with every moment after
that exact integer arithmetic.

Scale idioms: each fit consumes one bounded reduce — the (lang,
value) length histogram (value-bounded domain) or the events-per-
user counts (coarse user exchange → count-histogram, count-bounded);
the fits themselves are driver math.

Reference parity: the reference records sizes but never models them
(europarl/db filesize column); these extend the brief's
distribution-fitting family (deg_powerlaw, hill_tail, zipf_slope are
the siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from .grouping import with_coarse_group as _with_coarse_group

GEO_K = 6  # predicted-head cells for the geometric fit


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _lang_value_hist(sf_dir: str) -> pd.DataFrame:
    """(lang, value, c) histogram of n_chars — value-bounded."""
    d = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "lang": df["lang"].to_numpy(object),
                "value": df["n_chars"].to_numpy(np.int64),
            }
        )
        s = g.groupby(["lang", "value"]).size().reset_index(name="c")
        s["c"] = s["c"].astype(np.int64)
        return s

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "value"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    agg["value"] = agg["value"].astype(np.int64)
    agg["c"] = agg["c"].astype(np.int64)
    return agg


# ======================================================== lognormal_fit
#
# Per language over values > 0: q(v) = ⌊10⁹·ln(v)⌋ (the one mirrored
# float expression, evaluated per DISTINCT value); μ̂ = Σq·c // n and
# σ̂² = (n·Σq²c − (Σqc)²) // n² — reported at ×10⁹ and ×10¹⁸ scales.


def q_lognormal_fit(sf_dir: str):
    empty = pd.DataFrame(
        {
            "lang": pd.Series(dtype=object),
            "n": pd.Series(dtype=np.int64),
            "mu_x1e9": pd.Series(dtype=np.int64),
            "sigma2_x1e18": pd.Series(dtype=object),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    h = _lang_value_hist(sf_dir)
    h = h[h["value"] > 0]
    rows = []
    for lang, g in h.groupby("lang"):
        v = g["value"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        q = np.floor(1e9 * np.log(v.astype(np.float64))).astype(np.int64)
        n = int(c.sum())
        s1 = int((q.astype(object) * c).sum())
        s2 = int(((q.astype(object) * q) * c).sum())
        mu = s1 // n
        sig2 = (n * s2 - s1 * s1) // (n * n)
        rows.append((lang, n, mu, str(sig2)))
    out = pd.DataFrame(
        rows, columns=["lang", "n", "mu_x1e9", "sigma2_x1e18"]
    )
    out["n"] = out["n"].astype(np.int64)
    out["mu_x1e9"] = out["mu_x1e9"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


LOGNORMAL_FIT_SQL = """
WITH h AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS value,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents WHERE n_chars > 0 GROUP BY 1, 2),
q AS (
  SELECT lang, c,
         CAST(floor(1000000000 * ln(value)) AS HUGEINT) AS q
  FROM h),
m AS (
  SELECT lang,
         CAST(SUM(c) AS HUGEINT) AS n,
         CAST(SUM(q * c) AS HUGEINT) AS s1,
         CAST(SUM(q * q * c) AS HUGEINT) AS s2
  FROM q GROUP BY 1)
SELECT lang, CAST(n AS BIGINT) AS n,
       CAST(s1 // n AS BIGINT) AS mu_x1e9,
       CAST((n * s2 - s1 * s1) // (n * n) AS VARCHAR) AS sigma2_x1e18
FROM m
"""


# ============================================================ gamma_fit
#
# Method of moments, logarithm-free: k̂ = μ²/σ² and θ̂ = σ²/μ reduce to
#   k_x1e6 = ⌊10⁶·(Σx)² / (n·Σx² − (Σx)²)⌋
#   theta_x100 = ⌊100·(n·Σx² − (Σx)²) / (n·Σx)⌋
# per language — exact integer rationals from two moments.


def q_gamma_fit(sf_dir: str):
    empty = pd.DataFrame(
        {
            "lang": pd.Series(dtype=object),
            "n": pd.Series(dtype=np.int64),
            "k_x1e6": pd.Series(dtype=np.int64),
            "theta_x100": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    h = _lang_value_hist(sf_dir)
    rows = []
    for lang, g in h.groupby("lang"):
        v = g["value"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        n = int(c.sum())
        s1 = int((v * c).sum())
        s2 = int(((v.astype(object) * v) * c).sum())
        var_num = n * s2 - s1 * s1
        if var_num <= 0 or s1 == 0:
            rows.append((lang, n, -1, -1))
            continue
        k = 10**6 * s1 * s1 // var_num
        theta = 100 * var_num // (n * s1)
        rows.append((lang, n, k, theta))
    out = pd.DataFrame(rows, columns=["lang", "n", "k_x1e6", "theta_x100"])
    for c_ in ("n", "k_x1e6", "theta_x100"):
        out[c_] = out[c_].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


GAMMA_FIT_SQL = """
WITH m AS (
  SELECT lang,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(n_chars) AS HUGEINT) AS s1,
         CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS s2
  FROM documents GROUP BY 1)
SELECT lang, CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN n * s2 - s1 * s1 > 0 AND s1 > 0
                 THEN 1000000 * s1 * s1 // (n * s2 - s1 * s1)
                 ELSE -1 END AS BIGINT) AS k_x1e6,
       CAST(CASE WHEN n * s2 - s1 * s1 > 0 AND s1 > 0
                 THEN 100 * (n * s2 - s1 * s1) // (n * s1)
                 ELSE -1 END AS BIGINT) AS theta_x100
FROM m
"""


# ========================================================= geometric_fit
#
# Events-per-user x ~ Geometric(p), MLE p̂ = n/Σx: for k = 1..GEO_K the
# predicted user count is n²·(Σx−n)^(k−1) // Σx^k (the rational
# n·p(1−p)^(k−1) with denominators cleared), ×100, next to the
# observed histogram — the per-cell model-fit table.
#
# Scale shape: coarse user exchange → per-user event counts →
# count-histogram bounded reduce → driver rationals.


def q_geometric_fit(sf_dir: str):
    empty = pd.DataFrame(
        {
            "k": pd.Series(dtype=np.int64),
            "observed": pd.Series(dtype=np.int64),
            "predicted_x100": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    ev = _read(sf_dir, "events", columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.Series(df["user_id"].to_numpy(np.int64)).value_counts()
        return pd.DataFrame(
            {
                "user_id": s.index.to_numpy(np.int64),
                "c": s.to_numpy(np.int64),
            }
        )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        s = t.groupby("user_id", as_index=False)["c"].sum()
        h = s.groupby("c", as_index=False).size()
        return pd.DataFrame(
            {
                "k": h["c"].to_numpy(np.int64),
                "n": h["size"].to_numpy(np.int64),
            }
        )

    hist = (
        _with_coarse_group(
            ev.map_batches(partial, batch_format="pandas"), "user_id"
        )
        .groupby("_g")
        .map_groups(per_user, batch_format="pandas")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    obs = dict(zip(hist["k"].astype(int), hist["n"].astype(int)))
    n_users = sum(obs.values())
    sx = sum(k * v for k, v in obs.items())
    rows = []
    for k in range(1, GEO_K + 1):
        pred = 100 * n_users * n_users * (sx - n_users) ** (k - 1) // sx**k
        rows.append((k, obs.get(k, 0), pred))
    return pd.DataFrame(
        rows, columns=["k", "observed", "predicted_x100"]
    ).astype(np.int64)


def _geometric_sql() -> str:
    preds = []
    for k in range(1, GEO_K + 1):
        num = (
            f"100 * m.n * m.n"
            + "".join(" * (m.sx - m.n)" for _ in range(k - 1))
        )
        den = " * ".join(["m.sx"] * k)
        preds.append(
            f"SELECT CAST({k} AS BIGINT) AS k, "
            f"CAST(({num}) // ({den}) AS BIGINT) AS predicted_x100 "
            f"FROM m"
        )
    return f"""
WITH u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
h AS (SELECT c AS k, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY 1),
m AS (
  SELECT CAST(SUM(n) AS HUGEINT) AS n,
         CAST(SUM(k * n) AS HUGEINT) AS sx
  FROM h),
pred AS ({" UNION ALL ".join(preds)})
SELECT pred.k,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS observed,
       pred.predicted_x100
FROM pred LEFT JOIN h ON h.k = pred.k
"""


MOMENTFIT_SQL_QUERIES: dict[str, tuple] = {
    "lognormal_fit": (q_lognormal_fit, LOGNORMAL_FIT_SQL),
    "gamma_fit": (q_gamma_fit, GAMMA_FIT_SQL),
    "geometric_fit": (q_geometric_fit, _geometric_sql()),
}
