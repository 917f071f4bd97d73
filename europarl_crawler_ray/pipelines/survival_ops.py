"""Survival-analysis operators (round-5 batch 50): the Kaplan-Meier
product-limit estimator (Kaplan & Meier 1958), the Nelson-Aalen
cumulative hazard (Nelson 1969; Aalen 1978), and the log-rank test
(Mantel 1966) — the retention toolkit, run on user lifetimes derived
from the events stream: a user's duration is last-day − first-day + 1
and the user is CENSORED when still active on the corpus's final day.

Determinization: the KM product accumulates as an integer
s ← s·(n−d) // n at 10⁹ scale (one floor per step — the documented
quantized-product rule), Nelson-Aalen sums ⌊10⁹·d/n⌋ terms, and the
log-rank expectations sum ⌊10⁶·d·n_g/n⌋ — every value both engines
can walk identically (the oracle replays the recurrence with a
RECURSIVE CTE over the ordered death times).

Scale idioms: ONE user-keyed coarse exchange builds per-user
(duration, censored, group) rows; durations live on the bounded
day-span domain, so the (t, group) life tables are a ≤span-row
reduce and the sequential estimators are driver math over that
bounded table — a 100-TB year is ~365 rows of state.

Reference parity: the reference has no user analytics; these extend
the brief's events/eval family (retention_cohorts, sessionize are
the siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from .grouping import with_coarse_group as _with_coarse_group

KM_SCALE = 10**9


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _life_table(sf_dir: str) -> pd.DataFrame:
    """(duration, group, n_users, deaths) — bounded by the day span.
    ONE coarse user exchange; the global last day comes from a
    2-scalar reduce."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def days(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].to_numpy("datetime64[us]").astype("datetime64[D]")
        ).astype(np.int64)
        g = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "day": day}
        )
        s = g.groupby("user_id", as_index=False).agg(
            lo=("day", "min"), hi=("day", "max")
        )
        return s.astype(np.int64)

    per_user_parts = ev.map_batches(days, batch_format="pandas").materialize()
    d1 = int(per_user_parts.max("hi"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        s = t.groupby("user_id", as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max")
        )
        dur = s["hi"].to_numpy(np.int64) - s["lo"].to_numpy(np.int64) + 1
        cens = (s["hi"].to_numpy(np.int64) == d1).astype(np.int64)
        grp = s["user_id"].to_numpy(np.int64) & 1
        out = pd.DataFrame(
            {
                "duration": dur,
                "grp": grp,
                "n": np.ones(len(s), np.int64),
                "deaths": (1 - cens).astype(np.int64),
            }
        )
        return out.groupby(["duration", "grp"], as_index=False)[
            ["n", "deaths"]
        ].sum()

    lt = (
        _with_coarse_group(per_user_parts, "user_id")
        .groupby("_g")
        .map_groups(combine, batch_format="pandas")
        .groupby(["duration", "grp"])
        .aggregate(
            Sum("n", alias_name="n_users"), Sum("deaths", alias_name="deaths")
        )
        .to_pandas()  # <= span × 2 rows
    )
    for c in ("duration", "grp", "n_users", "deaths"):
        lt[c] = lt[c].astype(np.int64)
    return lt.sort_values(["duration", "grp"]).reset_index(drop=True)


_LIFE_SQL = """
u AS (
  SELECT user_id,
         MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS lo,
         MAX(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS hi
  FROM events GROUP BY 1),
d1 AS (SELECT MAX(hi) AS d1 FROM u),
lt AS (
  SELECT CAST(hi - lo + 1 AS BIGINT) AS duration,
         CAST(user_id % 2 AS BIGINT) AS grp,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN hi = d1.d1 THEN 0 ELSE 1 END) AS BIGINT)
           AS deaths
  FROM u, d1 GROUP BY 1, 2)
"""


# ========================================================= kaplan_meier
#
# One row per distinct DEATH time t: the at-risk count
# n(t) = #users with duration ≥ t, deaths d(t), and the survival
# S(t) = Π_{t'≤t} (n(t')−d(t'))/n(t') accumulated as an integer
# (s·(n−d)) // n at 10⁹ scale.


def q_kaplan_meier(sf_dir: str):
    empty = pd.DataFrame(
        {
            "t": pd.Series(dtype=np.int64),
            "n_risk": pd.Series(dtype=np.int64),
            "deaths": pd.Series(dtype=np.int64),
            "s_x1e9": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    lt = _life_table(sf_dir)
    if not len(lt):
        return empty
    agg = lt.groupby("duration", as_index=False)[["n_users", "deaths"]].sum()
    total = int(agg["n_users"].sum())
    agg = agg.sort_values("duration")
    rows = []
    s = KM_SCALE
    at_risk = total
    for _, r in agg.iterrows():
        t, n_u, d = int(r["duration"]), int(r["n_users"]), int(r["deaths"])
        if d > 0:
            s = s * (at_risk - d) // at_risk
            rows.append((t, at_risk, d, s))
        at_risk -= n_u
    return pd.DataFrame(
        rows, columns=["t", "n_risk", "deaths", "s_x1e9"]
    ).astype(np.int64)


KAPLAN_MEIER_SQL = f"""
WITH {_LIFE_SQL},
g AS (
  SELECT duration, CAST(SUM(n_users) AS BIGINT) AS n_u,
         CAST(SUM(deaths) AS BIGINT) AS d
  FROM lt GROUP BY 1),
r AS (
  SELECT duration, n_u, d,
         CAST(SUM(n_u) OVER (
           ORDER BY duration DESC ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS n_risk,
         ROW_NUMBER() OVER (ORDER BY duration ASC) AS rn
  FROM g),
dr AS (
  SELECT duration, d, n_risk,
         ROW_NUMBER() OVER (ORDER BY duration ASC) AS drn
  FROM r WHERE d > 0),
km AS (
  WITH RECURSIVE walk(drn, duration, d, n_risk, s) AS (
    SELECT drn, duration, d, n_risk,
           CAST({KM_SCALE} * (n_risk - d) // n_risk AS BIGINT)
    FROM dr WHERE drn = 1
    UNION ALL
    SELECT dr.drn, dr.duration, dr.d, dr.n_risk,
           CAST(walk.s * (dr.n_risk - dr.d) // dr.n_risk AS BIGINT)
    FROM dr JOIN walk ON dr.drn = walk.drn + 1)
  SELECT * FROM walk)
SELECT duration AS t, n_risk, d AS deaths, s AS s_x1e9
FROM km
"""


# ========================================================= nelson_aalen
#
# Cumulative hazard H(t) = Σ_{t'≤t} d(t')/n(t') as the integer sum of
# ⌊10⁹·d/n⌋ terms — one row per death time, same life table.


def q_nelson_aalen(sf_dir: str):
    empty = pd.DataFrame(
        {
            "t": pd.Series(dtype=np.int64),
            "n_risk": pd.Series(dtype=np.int64),
            "deaths": pd.Series(dtype=np.int64),
            "h_x1e9": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    lt = _life_table(sf_dir)
    if not len(lt):
        return empty
    agg = lt.groupby("duration", as_index=False)[["n_users", "deaths"]].sum()
    total = int(agg["n_users"].sum())
    agg = agg.sort_values("duration")
    rows = []
    h = 0
    at_risk = total
    for _, r in agg.iterrows():
        t, n_u, d = int(r["duration"]), int(r["n_users"]), int(r["deaths"])
        if d > 0:
            h += KM_SCALE * d // at_risk
            rows.append((t, at_risk, d, h))
        at_risk -= n_u
    return pd.DataFrame(
        rows, columns=["t", "n_risk", "deaths", "h_x1e9"]
    ).astype(np.int64)


NELSON_AALEN_SQL = f"""
WITH {_LIFE_SQL},
g AS (
  SELECT duration, CAST(SUM(n_users) AS BIGINT) AS n_u,
         CAST(SUM(deaths) AS BIGINT) AS d
  FROM lt GROUP BY 1),
r AS (
  SELECT duration, n_u, d,
         CAST(SUM(n_u) OVER (
           ORDER BY duration DESC ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS n_risk
  FROM g)
SELECT duration AS t, n_risk, d AS deaths,
       CAST(SUM({KM_SCALE} * d // n_risk) OVER (
         ORDER BY duration ASC ROWS BETWEEN UNBOUNDED PRECEDING
         AND CURRENT ROW) AS BIGINT) AS h_x1e9
FROM r WHERE d > 0
"""


# ========================================================= logrank_test
#
# Mantel's log-rank between the user_id-parity groups: at each death
# time, group 1's expected deaths e₁ += ⌊10⁶·d·n₁/n⌋; the output row
# carries the observed and expected totals for both groups — the
# numbers whose divergence says the two cohorts churn differently.


def q_logrank_test(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n0_users": pd.Series(dtype=np.int64),
            "n1_users": pd.Series(dtype=np.int64),
            "o0": pd.Series(dtype=np.int64),
            "o1": pd.Series(dtype=np.int64),
            "e0_x1e6": pd.Series(dtype=np.int64),
            "e1_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    lt = _life_table(sf_dir)
    if not len(lt):
        return empty
    durs = sorted(lt["duration"].unique())
    n_at = {0: 0, 1: 0}
    totals = {0: 0, 1: 0}
    obs = {0: 0, 1: 0}
    for _, r in lt.iterrows():
        n_at[int(r["grp"])] += int(r["n_users"])
        totals[int(r["grp"])] += int(r["n_users"])
        obs[int(r["grp"])] += int(r["deaths"])
    e = {0: 0, 1: 0}
    risk = dict(n_at)
    for t in durs:
        sub = lt[lt["duration"] == t]
        d = int(sub["deaths"].sum())
        n = risk[0] + risk[1]
        if d > 0 and n > 0:
            e[0] += 10**6 * d * risk[0] // n
            e[1] += 10**6 * d * risk[1] // n
        for _, r in sub.iterrows():
            risk[int(r["grp"])] -= int(r["n_users"])
    return pd.DataFrame(
        {
            "n0_users": [np.int64(totals[0])],
            "n1_users": [np.int64(totals[1])],
            "o0": [np.int64(obs[0])],
            "o1": [np.int64(obs[1])],
            "e0_x1e6": [np.int64(e[0])],
            "e1_x1e6": [np.int64(e[1])],
        }
    )


LOGRANK_TEST_SQL = f"""
WITH {_LIFE_SQL},
g AS (
  SELECT duration,
         CAST(SUM(CASE WHEN grp = 0 THEN n_users ELSE 0 END) AS BIGINT)
           AS n0,
         CAST(SUM(CASE WHEN grp = 1 THEN n_users ELSE 0 END) AS BIGINT)
           AS n1,
         CAST(SUM(deaths) AS BIGINT) AS d
  FROM lt GROUP BY 1),
r AS (
  SELECT duration, d,
         CAST(SUM(n0) OVER (
           ORDER BY duration DESC ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS r0,
         CAST(SUM(n1) OVER (
           ORDER BY duration DESC ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS r1
  FROM g)
SELECT
  CAST((SELECT SUM(n_users) FROM lt WHERE grp = 0) AS BIGINT) AS n0_users,
  CAST((SELECT SUM(n_users) FROM lt WHERE grp = 1) AS BIGINT) AS n1_users,
  CAST((SELECT SUM(deaths) FROM lt WHERE grp = 0) AS BIGINT) AS o0,
  CAST((SELECT SUM(deaths) FROM lt WHERE grp = 1) AS BIGINT) AS o1,
  CAST(SUM(CASE WHEN d > 0 AND r0 + r1 > 0
                THEN 1000000 * d * r0 // (r0 + r1) ELSE 0 END) AS BIGINT)
    AS e0_x1e6,
  CAST(SUM(CASE WHEN d > 0 AND r0 + r1 > 0
                THEN 1000000 * d * r1 // (r0 + r1) ELSE 0 END) AS BIGINT)
    AS e1_x1e6
FROM r
"""


SURVIVAL_SQL_QUERIES: dict[str, tuple] = {
    "kaplan_meier": (q_kaplan_meier, KAPLAN_MEIER_SQL),
    "nelson_aalen": (q_nelson_aalen, NELSON_AALEN_SQL),
    "logrank_test": (q_logrank_test, LOGRANK_TEST_SQL),
}
