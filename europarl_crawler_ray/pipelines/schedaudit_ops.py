"""Scheduling / stream-audit operators (round-5 batch 26): inter-
arrival coefficient of variation (Poisson-ness of event streams),
Jain's fairness index over per-site crawl allocation, and the
politeness-bound makespan lower bound (the task-cooldown scheduling
bound applied to per-host crawl delays).

Scale idioms: type-domain / site-domain bounded exchanges, exact
integer moment sums (CV² as a ppm ratio of integer sums), and
closed-form driver math.

Reference parity: the reference's politeness envelope is its
throughput ceiling (settings.ini TokenBucket 0.33 pages/s);
politeness_makespan quantifies that bound for any allocation. These
extend the brief's crawl-scheduling / analytics families.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Sum

from .grouping import with_coarse_group as _with_coarse_group
from .sitegraph_ops import N_SITES


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ======================================================= interarrival_cv
#
# Inter-arrival CV² per event type: for the globally time-ordered
# stream of each type, the squared coefficient of variation of the
# microsecond gaps — CV² ≈ 1 is Poisson (memoryless), ≪ 1 is a timer,
# ≫ 1 is bursty. Reported as exact integer sums plus the ppm ratio
# cv2_ppm = n·Σd²·10^6 // (Σd)² − 10^6 (the algebraic CV² with one
# floor at the end; HUGEINT in SQL, Python ints on the driver).
#
# Scale shape: ONE exchange on the type (type-domain bounded); the
# per-type stream sorts in-task ((ts, event_id) total order) and only
# (n, Σd, Σd²) leaves each task. At 10^10 events a type's stream
# shards by time range with boundary-gap hand-off (the
# shuffle_mixing_audit seam shape); in-task sort suffices at gate
# scale and the seam upgrade is mechanical.


def q_interarrival_cv(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])
    empty = pd.DataFrame(
        {
            "event_type": pd.Series(dtype=str),
            "n_gaps": pd.Series(dtype=np.int64),
            "sum_gap_us": pd.Series(dtype=np.int64),
            "cv2_ppm": pd.Series(dtype=np.int64),
        }
    )

    # a type's whole stream is co-located by the coarse exchange, so
    # the per-type sums are FINAL in-task; Σd² exceeds int64 at long
    # time spans, so it travels in the tiny result as a decimal string
    # (SQL's HUGEINT twin) and the driver finishes with Python ints
    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in g.drop(columns=["_g"]).groupby("event_type"):
            t = grp.sort_values(["ts", "event_id"], kind="mergesort")
            us = t["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
            if len(us) < 2:
                rows.append((et, 0, 0, "0"))
                continue
            d = np.diff(us)
            rows.append(
                (
                    et,
                    len(d),
                    int(d.sum()),
                    str(sum(int(x) * int(x) for x in d)),
                )
            )
        return pd.DataFrame(
            rows, columns=["event_type", "n_gaps", "s_part", "sq_str"]
        ).astype({"n_gaps": np.int64, "s_part": np.int64})

    c = (
        _with_coarse_group(ev, "event_type")
        .groupby("_g")
        .map_groups(per_type, batch_format="pandas")
        .to_pandas()  # type-domain bounded (one row per type)
    )
    if not len(c):
        return empty
    rows = []
    for _, r in c.iterrows():
        n, s, sq = int(r["n_gaps"]), int(r["s_part"]), int(r["sq_str"])
        cv2 = n * sq * 1_000_000 // (s * s) - 1_000_000 if s > 0 else 0
        rows.append((r["event_type"], n, s, cv2))
    return (
        pd.DataFrame(
            rows,
            columns=["event_type", "n_gaps", "sum_gap_us", "cv2_ppm"],
        )
        .astype(
            {
                "n_gaps": np.int64,
                "sum_gap_us": np.int64,
                "cv2_ppm": np.int64,
            }
        )
        .sort_values("event_type")
        .reset_index(drop=True)
    )


INTERARRIVAL_CV_SQL = """
WITH o AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS HUGEINT) AS us,
         LAG(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS prev
  FROM events),
g AS (
  SELECT event_type, CAST(us - prev AS HUGEINT) AS d
  FROM o WHERE prev IS NOT NULL),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(d) AS HUGEINT) AS sd,
         CAST(SUM(d * d) AS HUGEINT) AS sq
  FROM g GROUP BY 1)
SELECT et.event_type,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_gaps,
       CAST(COALESCE(s.sd, 0) AS BIGINT) AS sum_gap_us,
       CAST(CASE WHEN COALESCE(s.sd, 0) > 0
            THEN s.n * s.sq * 1000000 // (s.sd * s.sd) - 1000000
            ELSE 0 END AS BIGINT) AS cv2_ppm
FROM (SELECT DISTINCT event_type FROM events) et
LEFT JOIN s ON s.event_type = et.event_type
"""


# ======================================================== jain_fairness
#
# Jain's fairness index (Jain, Chiu & Hawe 1984) of the per-site page
# allocation: J = (Σx)² / (n·Σx²) ∈ (1/n, 1], the networking-standard
# answer to "is the crawl budget spread evenly across hosts" — 1 is
# perfectly fair, 1/n is one host hoarding everything. Exact integer
# ppm floor; n counts sites WITH pages (the allocation's support, the
# standard convention).
#
# Scale shape: ≤ 97-row site count partials → tiny groupby → driver
# integer math.


def q_jain_fairness(sf_dir: str):
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"site": pd.Series(dtype=np.int64),
                 "n_part": pd.Series(dtype=np.int64)}
            )
        site = df["doc_id"].to_numpy(np.int64) % N_SITES
        vals, cnts = np.unique(site, return_counts=True)
        return pd.DataFrame(
            {"site": vals.astype(np.int64), "n_part": cnts.astype(np.int64)}
        )

    c = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("site")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()  # <= 97 rows
    )
    if not len(c):
        return pd.DataFrame(
            {
                "n_sites": [0],
                "n_docs": [0],
                "jain_ppm": [0],
            }
        ).astype(np.int64)
    xs = [int(v) for v in c["n"]]
    n_sites = len(xs)
    tot = sum(xs)
    sq = sum(x * x for x in xs)
    jain = tot * tot * 1_000_000 // (n_sites * sq)
    return pd.DataFrame(
        {
            "n_sites": [n_sites],
            "n_docs": [tot],
            "jain_ppm": [jain],
        }
    ).astype(np.int64)


JAIN_FAIRNESS_SQL = f"""
WITH per AS (
  SELECT doc_id % {N_SITES} AS site, CAST(COUNT(*) AS HUGEINT) AS x
  FROM documents GROUP BY 1),
agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n_sites,
         CAST(SUM(x) AS HUGEINT) AS tot,
         CAST(SUM(x * x) AS HUGEINT) AS sq
  FROM per)
SELECT CAST(n_sites AS BIGINT) AS n_sites,
       CAST(tot AS BIGINT) AS n_docs,
       CAST(tot * tot * 1000000 // (n_sites * sq) AS BIGINT) AS jain_ppm
FROM agg
"""


# ================================================== politeness_makespan
#
# Politeness-bound makespan lower bound: with a per-host crawl delay
# of D slots between same-host fetches, no schedule of the per-site
# page allocation finishes before max(N, (c_max − 1)·(D + 1) + m)
# slots, where c_max is the largest site count and m the number of
# sites at that count — the task-cooldown scheduling bound. The gap
# between N (the work) and the bound (the politeness wall) is exactly
# how much a skewed frontier costs in wall-clock, the number that
# justifies host-aware sharding before launch.
#
# Scale shape: ≤ 97-row site counts → closed-form driver math.

POLITENESS_DELAY = 3  # slots between same-host fetches


def q_politeness_makespan(sf_dir: str, delay: int = POLITENESS_DELAY):
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"site": pd.Series(dtype=np.int64),
                 "n_part": pd.Series(dtype=np.int64)}
            )
        site = df["doc_id"].to_numpy(np.int64) % N_SITES
        vals, cnts = np.unique(site, return_counts=True)
        return pd.DataFrame(
            {"site": vals.astype(np.int64), "n_part": cnts.astype(np.int64)}
        )

    c = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("site")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()  # <= 97 rows
    )
    if not len(c):
        return pd.DataFrame(
            {
                "n_urls": [0],
                "max_site_count": [0],
                "n_max_sites": [0],
                "politeness_delay": [delay],
                "makespan_lb": [0],
                "politeness_overhead_bp": [0],
            }
        ).astype(np.int64)
    xs = [int(v) for v in c["n"]]
    n = sum(xs)
    cmax = max(xs)
    m = sum(1 for x in xs if x == cmax)
    lb = max(n, (cmax - 1) * (delay + 1) + m)
    return pd.DataFrame(
        {
            "n_urls": [n],
            "max_site_count": [cmax],
            "n_max_sites": [m],
            "politeness_delay": [delay],
            "makespan_lb": [lb],
            "politeness_overhead_bp": [(lb - n) * 10000 // n if n else 0],
        }
    ).astype(np.int64)


POLITENESS_MAKESPAN_SQL = f"""
WITH per AS (
  SELECT doc_id % {N_SITES} AS site, CAST(COUNT(*) AS BIGINT) AS x
  FROM documents GROUP BY 1),
agg AS (
  SELECT CAST(SUM(x) AS BIGINT) AS n,
         CAST(MAX(x) AS BIGINT) AS cmax
  FROM per),
mm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m
  FROM per, agg WHERE per.x = agg.cmax)
SELECT agg.n AS n_urls, agg.cmax AS max_site_count, mm.m AS n_max_sites,
       CAST({POLITENESS_DELAY} AS BIGINT) AS politeness_delay,
       CAST(GREATEST(agg.n, (agg.cmax - 1) * {POLITENESS_DELAY + 1} + mm.m)
            AS BIGINT) AS makespan_lb,
       CAST((GREATEST(agg.n, (agg.cmax - 1) * {POLITENESS_DELAY + 1} + mm.m)
             - agg.n) * 10000 // agg.n AS BIGINT) AS politeness_overhead_bp
FROM agg, mm
"""


SCHEDAUDIT_SQL_QUERIES: dict[str, tuple] = {
    "interarrival_cv": (q_interarrival_cv, INTERARRIVAL_CV_SQL),
    "jain_fairness": (q_jain_fairness, JAIN_FAIRNESS_SQL),
    "politeness_makespan": (q_politeness_makespan, POLITENESS_MAKESPAN_SQL),
}
