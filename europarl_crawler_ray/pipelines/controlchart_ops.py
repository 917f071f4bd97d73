"""Sequential-control operators (round-5 batch 60): Wald's
sequential probability ratio test (Wald 1945 — stop as soon as the
evidence crosses a likelihood threshold), the Page-Hinkley drift
detector (Page 1954 — the cumulative-deviation-from-running-mean
alarm), and the Shewhart x̄ control chart (Shewhart 1931 — daily
means against ±3σ limits) — the three canonical monitors a
continuously-running crawl pipeline hangs off its metrics stream.

Determinization: SPRT's Bernoulli log-likelihood increments are the
two constants ⌊10⁹·ln(p₁/p₀)⌋ and ⌊10⁹·ln((1−p₁)/(1−p₀))⌋ (floats
appear ONCE, in those module constants — both engines share the
literal values, never re-derive them), so the walk is an integer
cumsum; Page-Hinkley quantizes each term 10⁶·xᵢ − ⌊10⁶·Sᵢ/i⌋ − 10⁶δ;
Shewhart compares (S_d·n − S·n_d)²·9⁻¹-cleared cross-products —
exact HUGEINT. Trials order by doc_id; series by day.

Scale idioms: SPRT and Page-Hinkley are PREFIX statistics over the
doc order — the contiguous-range two-pass (per-range partial sums →
≤64-row driver offsets → in-range vectorized prefix + first-crossing
scan) that runs_test introduced; Shewhart is a day-bounded reduce
plus driver comparisons.

Reference parity: the reference retries on failure but never
monitors a statistic (europarl/workers/); these extend the brief's
drift/monitoring family (cusum_drift, ewma_forecast are siblings).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from .grouping import with_coarse_group as _with_coarse_group

TOK_RE = r"[^ \t\n\r\f]+"
SPRT_TERM = "join"  # success = doc contains the term
# H0: p = 0.4, H1: p = 0.6; increments ⌊1e9·ln(p1/p0)⌋, ⌊1e9·ln(q1/q0)⌋
SPRT_A = int(math.floor(1e9 * math.log(0.6 / 0.4)))  # success step
SPRT_B = int(math.floor(1e9 * math.log(0.4 / 0.6)))  # failure step
SPRT_THR = 2_944_438_979  # ≈ ln(19)·1e9 — α = β = 0.05 boundaries
PH_DELTA_X1E6 = 0  # drift magnitude term (δ = 0: pure deviation)
PH_LAMBDA = 50_000_000  # alarm when max(PH) − PH ≥ λ (×1e6 cents)
R_RANGES = 64


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


# ======================================================== sprt_decision
#
# Trials in doc_id order; LLR_t = A·k_t + B·(t−k_t) with k_t the
# success prefix count. Stop at the first t where LLR ≥ +thr (accept
# H1), ≤ −thr (accept H0); decision 0 = still undecided at the end.
# Output one row: (n_trials, t_stop, decision, llr_x1e9).


def q_sprt_decision(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_trials": pd.Series(dtype=np.int64),
            "t_stop": pd.Series(dtype=np.int64),
            "decision": pd.Series(dtype=np.int64),
            "llr_x1e9": pd.Series(dtype=np.int64),
        }
    )
    n = _n_rows(sf_dir, "documents")
    if n == 0:
        return empty
    mx = _read(sf_dir, "documents", columns=["doc_id"]).max("doc_id")
    width = int(mx) // R_RANGES + 1
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tok_re = re.compile(TOK_RE)

    def add_rid(df: pd.DataFrame) -> pd.DataFrame:
        succ = np.fromiter(
            (
                SPRT_TERM in tok_re.findall(str(t).lower())
                for t in df["text"]
            ),
            np.int64,
            len(df),
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "s": succ,
                "rid": df["doc_id"].to_numpy(np.int64) // width,
            }
        )

    rows = _with_coarse_group(
        d.map_batches(add_rid, batch_format="pandas"), "rid"
    ).materialize()

    # pass 1: per-range (count, successes) -> driver offsets
    def range_sums(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        s = t.groupby("rid", as_index=False).agg(
            cnt=("s", "size"), k=("s", "sum")
        )
        return s.astype(np.int64)

    sums = (
        rows.groupby("_g")
        .map_groups(range_sums, batch_format="pandas")
        .to_pandas()
        .sort_values("rid")
    )
    off_t = {}
    off_k = {}
    at = ak = 0
    for _, r in sums.iterrows():
        off_t[int(r["rid"])] = at
        off_k[int(r["rid"])] = ak
        at += int(r["cnt"])
        ak += int(r["k"])

    # pass 2: in-range first crossing with offsets
    def crossing(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        outs = []
        for rid, grp in t.groupby("rid"):
            grp = grp.sort_values("doc_id", kind="mergesort")
            s = grp["s"].to_numpy(np.int64)
            k = np.cumsum(s) + off_k[int(rid)]
            tt = np.arange(1, len(s) + 1, dtype=np.int64) + off_t[int(rid)]
            llr = SPRT_A * k + SPRT_B * (tt - k)
            hit = np.flatnonzero(np.abs(llr) >= SPRT_THR)
            if len(hit):
                i = int(hit[0])
                outs.append((int(tt[i]), int(llr[i])))
        if not outs:
            return pd.DataFrame(
                {
                    "t": pd.Series(dtype=np.int64),
                    "llr": pd.Series(dtype=np.int64),
                }
            )
        outs.sort()
        return pd.DataFrame(
            [outs[0]], columns=["t", "llr"]
        ).astype(np.int64)

    cand = (
        rows.groupby("_g")
        .map_groups(crossing, batch_format="pandas")
        .to_pandas()  # <= R_RANGES rows
    )
    total_k = ak
    final_llr = SPRT_A * total_k + SPRT_B * (at - total_k)
    if len(cand):
        cand = cand.sort_values("t")
        t_stop = int(cand["t"].iloc[0])
        llr = int(cand["llr"].iloc[0])
        decision = 1 if llr > 0 else -1
    else:
        t_stop, llr, decision = at, final_llr, 0
    return pd.DataFrame(
        {
            "n_trials": [np.int64(at)],
            "t_stop": [np.int64(t_stop)],
            "decision": [np.int64(decision)],
            "llr_x1e9": [np.int64(llr)],
        }
    )


SPRT_DECISION_SQL = rf"""
WITH s AS (
  SELECT doc_id,
         CASE WHEN len(list_filter(
                regexp_extract_all(lower(text), '{TOK_RE}'),
                x -> x = '{SPRT_TERM}')) > 0 THEN 1 ELSE 0 END AS succ
  FROM documents),
w AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS t,
         CAST(SUM(succ) OVER (ORDER BY doc_id) AS BIGINT) AS k
  FROM s),
llr AS (
  SELECT t, {SPRT_A} * k + {SPRT_B} * (t - k) AS v FROM w),
hit AS (
  SELECT t, v FROM llr WHERE ABS(v) >= {SPRT_THR}
  ORDER BY t LIMIT 1),
fin AS (SELECT MAX(t) AS n FROM llr),
last AS (SELECT v FROM llr ORDER BY t DESC LIMIT 1)
SELECT CAST(fin.n AS BIGINT) AS n_trials,
       CAST(COALESCE((SELECT t FROM hit), fin.n) AS BIGINT) AS t_stop,
       CAST(CASE WHEN (SELECT t FROM hit) IS NULL THEN 0
                 WHEN (SELECT v FROM hit) > 0 THEN 1 ELSE -1 END AS BIGINT)
         AS decision,
       CAST(COALESCE((SELECT v FROM hit), (SELECT v FROM last)) AS BIGINT)
         AS llr_x1e9
FROM fin
"""


# ========================================================= page_hinkley
#
# Over daily mean cents (bounded day domain): term_i = 10⁶·x_i −
# ⌊10⁶·S_i/i⌋ − δ, PH_i = Σ term; alarm day = first i where
# max_{j≤i} PH_j − PH_i ≥ λ. Output: (n_days, alarm_day, ph_final,
# ph_max) — alarm_day −1 when no alarm.


def q_page_hinkley(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_days": pd.Series(dtype=np.int64),
            "alarm_day": pd.Series(dtype=np.int64),
            "ph_final": pd.Series(dtype=np.int64),
            "ph_max": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].to_numpy("datetime64[us]").astype("datetime64[D]")
        ).astype(np.int64)
        cents = np.floor(df["value"].to_numpy(np.float64) * 100).astype(
            np.int64
        )
        g = pd.DataFrame({"day": day, "c": cents, "n": np.int64(1)})
        return g.groupby("day", as_index=False)[["c", "n"]].sum()

    agg = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("c", alias_name="c"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("day")
    )
    x = (
        100 * agg["c"].to_numpy(np.int64) // agg["n"].to_numpy(np.int64)
    )  # daily mean ×100 cents = value ×10⁴... kept at x100-cents scale
    ph = 0
    mx = 0
    alarm = -1
    s = 0
    for i, xi in enumerate(x, start=1):
        s += int(xi)
        term = 10**4 * int(xi) - (10**4 * s) // i - PH_DELTA_X1E6
        ph += term
        mx = max(mx, ph)
        if alarm < 0 and mx - ph >= PH_LAMBDA:
            alarm = i
    return pd.DataFrame(
        {
            "n_days": [np.int64(len(x))],
            "alarm_day": [np.int64(alarm)],
            "ph_final": [np.int64(ph)],
            "ph_max": [np.int64(mx)],
        }
    )


PAGE_HINKLEY_SQL = f"""
WITH d AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
x AS (
  SELECT day, CAST(100 * c // n AS BIGINT) AS xm,
         ROW_NUMBER() OVER (ORDER BY day) AS i
  FROM d),
terms AS (
  SELECT i, xm,
         CAST(10000 * xm
              - (10000 * SUM(xm) OVER (ORDER BY i)) // i
              - {PH_DELTA_X1E6} AS BIGINT) AS term
  FROM x),
walk AS (
  SELECT i,
         CAST(SUM(term) OVER (ORDER BY i) AS BIGINT) AS ph
  FROM terms),
wmax AS (
  SELECT i, ph,
         CAST(MAX(ph) OVER (ORDER BY i) AS BIGINT) AS mx
  FROM walk),
alarm AS (
  SELECT MIN(i) AS a FROM wmax WHERE mx - ph >= {PH_LAMBDA})
SELECT CAST((SELECT COUNT(*) FROM x) AS BIGINT) AS n_days,
       CAST(COALESCE(alarm.a, -1) AS BIGINT) AS alarm_day,
       CAST((SELECT ph FROM wmax ORDER BY i DESC LIMIT 1) AS BIGINT)
         AS ph_final,
       CAST((SELECT MAX(ph) FROM wmax) AS BIGINT) AS ph_max
FROM alarm
"""


# ======================================================== shewhart_chart
#
# Daily means of event cents against the global ±3σ band — flag day d
# iff (S_d·n − S·n_d)²·n² ≥ 9·(n·Q − S²)·(n·n_d)², all HUGEINT-exact
# (Q = Σcents², S = Σcents, n over ALL events; S_d, n_d per day).
# Output per day: (day, n_events, mean_x100, flagged).


def q_shewhart_chart(sf_dir: str):
    empty = pd.DataFrame(
        {
            "day": pd.Series(dtype=np.int64),
            "n_events": pd.Series(dtype=np.int64),
            "mean_x100": pd.Series(dtype=np.int64),
            "flagged": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].to_numpy("datetime64[us]").astype("datetime64[D]")
        ).astype(np.int64)
        cents = np.floor(df["value"].to_numpy(np.float64) * 100).astype(
            np.int64
        )
        g = pd.DataFrame(
            {
                "day": day,
                "c": cents,
                "q": cents.astype(object) * cents,
                "n": np.int64(1),
            }
        )
        out = g.groupby("day", as_index=False).agg(
            c=("c", "sum"), q=("q", "sum"), n=("n", "sum")
        )
        out["q"] = out["q"].astype(np.int64)
        return out.astype({"day": np.int64, "c": np.int64, "n": np.int64})

    agg = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .aggregate(
            Sum("c", alias_name="c"),
            Sum("q", alias_name="q"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
        .sort_values("day")
    )
    n = int(agg["n"].sum())
    S = int(agg["c"].sum())
    Q = int(agg["q"].sum())
    var_num = n * Q - S * S  # σ² = var_num / n²
    rows = []
    for _, r in agg.iterrows():
        nd, sd = int(r["n"]), int(r["c"])
        lhs = (sd * n - S * nd) ** 2 * n * n
        rhs = 9 * var_num * (n * nd) ** 2
        rows.append(
            (
                int(r["day"]),
                nd,
                100 * sd // nd,
                1 if lhs >= rhs else 0,
            )
        )
    return pd.DataFrame(
        rows, columns=["day", "n_events", "mean_x100", "flagged"]
    ).astype(np.int64)


SHEWHART_CHART_SQL = """
WITH e AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(floor(value * 100) AS BIGINT) AS c
  FROM events),
d AS (
  SELECT day, CAST(SUM(c) AS HUGEINT) AS sd,
         CAST(COUNT(*) AS HUGEINT) AS nd,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS qd
  FROM e GROUP BY 1),
g AS (
  SELECT CAST(SUM(nd) AS HUGEINT) AS n, CAST(SUM(sd) AS HUGEINT) AS s,
         CAST(SUM(qd) AS HUGEINT) AS q
  FROM d)
SELECT CAST(d.day AS BIGINT) AS day,
       CAST(d.nd AS BIGINT) AS n_events,
       CAST(100 * d.sd // d.nd AS BIGINT) AS mean_x100,
       CAST(CASE WHEN (d.sd * g.n - g.s * d.nd) * (d.sd * g.n - g.s * d.nd)
                      * g.n * g.n
                 >= 9 * (g.n * g.q - g.s * g.s) * (g.n * d.nd)
                      * (g.n * d.nd)
                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM d, g
"""


CONTROLCHART_SQL_QUERIES: dict[str, tuple] = {
    "sprt_decision": (q_sprt_decision, SPRT_DECISION_SQL),
    "page_hinkley": (q_page_hinkley, PAGE_HINKLEY_SQL),
    "shewhart_chart": (q_shewhart_chart, SHEWHART_CHART_SQL),
}
