"""Event-mining operators (round-5 batch 52): sequential A-then-B
patterns (Agrawal & Srikant, ICDE 1995 — the mining-sequential-
patterns primitive), association rules with support / confidence /
lift (Agrawal, Imieliński & Swami, SIGMOD 1993), and burst detection
via a two-threshold hysteresis automaton (the determinized cousin of
Kleinberg's KDD 2002 burst model — enter on c ≥ 2·mean+1, exit on
c ≤ mean, which is the two-state automaton with infinite switching
cost outside the band) — the behavioural miners a crawl's event
stream feeds.

Scale idioms: both pattern miners reduce each user to its
TYPE-BOUNDED profile (first/last timestamp per type, or the distinct
type set) through ONE coarse user exchange; the pair space is
#types² — bounded — so pair counting is a per-group combiner into a
bounded groupby. Burst detection reduces to the day-span domain (one
row per day, zero days included via the closed-form span) and the
hysteresis recurrence is a driver walk the oracle replays with a
RECURSIVE CTE. Integer thresholds and counts throughout.

Reference parity: the reference logs request events but never mines
them (europarl/db/queries.py status counts only); these extend the
brief's events family (sessionize, funnel_counts, markov_stationary
are the siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

from .grouping import with_coarse_group as _with_coarse_group


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _user_type_spans(sf_dir: str) -> ray.data.Dataset:
    """(user_id, event_type, first_us, last_us) — exact, ONE coarse
    user exchange merging per-batch partial spans."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df.copy()
        t["us"] = t["ts"].to_numpy("datetime64[us]").astype(np.int64)
        g = t.groupby(["user_id", "event_type"], as_index=False).agg(
            first_us=("us", "min"), last_us=("us", "max")
        )
        return g.astype({"first_us": np.int64, "last_us": np.int64})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        return t.groupby(["user_id", "event_type"], as_index=False).agg(
            first_us=("first_us", "min"), last_us=("last_us", "max")
        )

    return (
        _with_coarse_group(
            ev.map_batches(partial, batch_format="pandas"), "user_id"
        )
        .groupby("_g")
        .map_groups(combine, batch_format="pandas")
    )


# ========================================================= seq_patterns
#
# (type_a, type_b, n_users): users for whom some A-event happens
# STRICTLY before some B-event — i.e. first(A) < last(B). Ordered
# pairs, a ≠ b, support > 0.
#
# Scale shape: the user-keyed span exchange above; per group a
# vectorized per-user pair expansion over the bounded type set →
# #types²-bounded groupby.


def q_seq_patterns(sf_dir: str):
    empty = pd.DataFrame(
        {
            "type_a": pd.Series(dtype=object),
            "type_b": pd.Series(dtype=object),
            "n_users": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    spans = _user_type_spans(sf_dir)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("user_id"):
            a = g.merge(g, how="cross", suffixes=("_a", "_b"))
            a = a[
                (a["event_type_a"] != a["event_type_b"])
                & (a["first_us_a"] < a["last_us_b"])
            ]
            if len(a):
                outs.append(a[["event_type_a", "event_type_b"]])
        if not outs:
            return pd.DataFrame(
                {
                    "type_a": pd.Series(dtype=object),
                    "type_b": pd.Series(dtype=object),
                    "n": pd.Series(dtype=np.int64),
                }
            )
        c = (
            pd.concat(outs, ignore_index=True)
            .groupby(["event_type_a", "event_type_b"], as_index=False)
            .size()
        )
        return pd.DataFrame(
            {
                "type_a": c["event_type_a"].to_numpy(object),
                "type_b": c["event_type_b"].to_numpy(object),
                "n": c["size"].to_numpy(np.int64),
            }
        )

    def pairs_group(g: pd.DataFrame) -> pd.DataFrame:
        return pairs(g.drop(columns=["_g"]))

    # a user's span rows must be COMPLETE in one task (map_batches may
    # split them) — re-key by user for the pair expansion
    agg = (
        _with_coarse_group(spans, "user_id")
        .groupby("_g")
        .map_groups(pairs_group, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()  # <= #types² rows
    )
    if not len(agg):
        return empty
    agg["n_users"] = agg["n_users"].astype(np.int64)
    return agg.sort_values(["type_a", "type_b"]).reset_index(drop=True)


SEQ_PATTERNS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
  FROM events GROUP BY 1, 2)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM s a JOIN s b ON b.user_id = a.user_id
WHERE a.event_type <> b.event_type AND a.first_us < b.last_us
GROUP BY 1, 2
"""


# ========================================================== assoc_rules
#
# Rules A → B over the per-user type sets: support n(A∧B),
# confidence_x1e6 = ⌊10⁶·n(AB)/n(A)⌋, lift_x1e6 =
# ⌊10⁶·n(AB)·U / (n(A)·n(B))⌋ with U = total users. Ordered pairs,
# support > 0.


def q_assoc_rules(sf_dir: str):
    empty = pd.DataFrame(
        {
            "type_a": pd.Series(dtype=object),
            "type_b": pd.Series(dtype=object),
            "support": pd.Series(dtype=np.int64),
            "confidence_x1e6": pd.Series(dtype=np.int64),
            "lift_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    spans = _user_type_spans(sf_dir)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"ta": [], "tb": [], "n": []}
        singles = {"t": [], "n": []}
        users = set()
        for uid, g in df.groupby("user_id"):
            users.add(uid)
            ts = sorted(set(g["event_type"]))
            for a in ts:
                singles["t"].append(a)
                singles["n"].append(1)
                for b in ts:
                    if a != b:
                        rows["ta"].append(a)
                        rows["tb"].append(b)
                        rows["n"].append(1)
        p = pd.DataFrame(rows).groupby(["ta", "tb"], as_index=False)["n"].sum() if rows["ta"] else pd.DataFrame({"ta": [], "tb": [], "n": []})
        s = pd.DataFrame(singles).groupby("t", as_index=False)["n"].sum() if singles["t"] else pd.DataFrame({"t": [], "n": []})
        out = pd.DataFrame(
            {
                "ta": list(p["ta"]) + list(s["t"]) + ["\x00users"],
                "tb": list(p["tb"]) + ["\x00single"] * len(s) + ["\x00"],
                "n": list(p["n"]) + list(s["n"]) + [len(users)],
            }
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    def pairs_group(g: pd.DataFrame) -> pd.DataFrame:
        return pairs(g.drop(columns=["_g"]))

    # user-complete groups (same split hazard as seq_patterns)
    agg = (
        _with_coarse_group(spans, "user_id")
        .groupby("_g")
        .map_groups(pairs_group, batch_format="pandas")
        .groupby(["ta", "tb"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: #types² + #types + 1 rows
    )
    if not len(agg):
        return empty
    u = int(agg.loc[agg["ta"] == "\x00users", "n"].sum())
    singles = {
        r["ta"]: int(r["n"])
        for _, r in agg[agg["tb"] == "\x00single"].iterrows()
    }
    rows = []
    for _, r in agg.iterrows():
        ta, tb = r["ta"], r["tb"]
        if ta.startswith("\x00") or tb.startswith("\x00"):
            continue
        nab = int(r["n"])
        na, nb = singles[ta], singles[tb]
        rows.append(
            (
                ta,
                tb,
                nab,
                10**6 * nab // na,
                10**6 * nab * u // (na * nb),
            )
        )
    out = pd.DataFrame(
        rows,
        columns=["type_a", "type_b", "support", "confidence_x1e6", "lift_x1e6"],
    )
    for c in ("support", "confidence_x1e6", "lift_x1e6"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


ASSOC_RULES_SQL = """
WITH s AS (
  SELECT DISTINCT user_id, event_type FROM events),
u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u FROM events),
singles AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY 1),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM s a JOIN s b ON b.user_id = a.user_id
  WHERE a.event_type <> b.event_type
  GROUP BY 1, 2)
SELECT p.type_a, p.type_b, p.support,
       CAST(1000000 * p.support // sa.n AS BIGINT) AS confidence_x1e6,
       CAST(1000000 * p.support * u.u // (sa.n * sb.n) AS BIGINT)
         AS lift_x1e6
FROM p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b, u
"""


# ========================================================= burst_detect
#
# Two-threshold hysteresis over the daily event-count series (zero
# days included): enter the burst state when c_d ≥ 2·mean+1, leave
# when c_d ≤ mean (mean = ⌊total/D⌋ over the full span) — the
# deterministic two-state automaton underlying Kleinberg-style burst
# models. Output per day: (day, count, state).
#
# Scale shape: one day-keyed bounded reduce (plus the 2-scalar span);
# the recurrence is a driver walk over ≤span rows, replayed in SQL
# with a RECURSIVE CTE.


def q_burst_detect(sf_dir: str):
    empty = pd.DataFrame(
        {
            "day": pd.Series(dtype=np.int64),
            "count": pd.Series(dtype=np.int64),
            "state": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    ev = _read(sf_dir, "events", columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].to_numpy("datetime64[us]").astype("datetime64[D]")
        ).astype(np.int64)
        s = pd.Series(day).value_counts()
        return pd.DataFrame(
            {"day": s.index.to_numpy(np.int64), "n": s.to_numpy(np.int64)}
        )

    agg = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("day")
    )
    d0, d1 = int(agg["day"].min()), int(agg["day"].max())
    counts = {int(r["day"]): int(r["n"]) for _, r in agg.iterrows()}
    span = d1 - d0 + 1
    total = sum(counts.values())
    mean = total // span
    hi, lo = 2 * mean + 1, mean
    rows = []
    state = 0
    for day in range(d0, d1 + 1):
        c = counts.get(day, 0)
        if state == 0 and c >= hi:
            state = 1
        elif state == 1 and c <= lo:
            state = 0
        rows.append((day, c, state))
    return pd.DataFrame(rows, columns=["day", "count", "state"]).astype(
        np.int64
    )


BURST_DETECT_SQL = """
WITH c0 AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
span AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1,
         CAST(SUM(n) // (MAX(day) - MIN(day) + 1) AS BIGINT) AS mean
  FROM c0),
days AS (
  SELECT CAST(span.d0 + i.i AS BIGINT) AS day,
         CAST(i.i + 1 AS BIGINT) AS rn
  FROM span, unnest(range(0, CAST(span.d1 - span.d0 + 1 AS BIGINT))) AS i(i)),
c AS (
  SELECT days.day, days.rn, CAST(COALESCE(c0.n, 0) AS BIGINT) AS n
  FROM days LEFT JOIN c0 ON c0.day = days.day),
walk AS (
  WITH RECURSIVE w(rn, day, n, state) AS (
    SELECT c.rn, c.day, c.n,
           CAST(CASE WHEN c.n >= 2 * span.mean + 1 THEN 1 ELSE 0 END
                AS BIGINT)
    FROM c, span WHERE c.rn = 1
    UNION ALL
    SELECT c.rn, c.day, c.n,
           CAST(CASE WHEN w.state = 0 AND c.n >= 2 * span.mean + 1 THEN 1
                     WHEN w.state = 1 AND c.n <= span.mean THEN 0
                     ELSE w.state END AS BIGINT)
    FROM c JOIN w ON c.rn = w.rn + 1, span)
  SELECT * FROM w)
SELECT day, n AS count, state FROM walk
"""


EVENTMINE_SQL_QUERIES: dict[str, tuple] = {
    "seq_patterns": (q_seq_patterns, SEQ_PATTERNS_SQL),
    "assoc_rules": (q_assoc_rules, ASSOC_RULES_SQL),
    "burst_detect": (q_burst_detect, BURST_DETECT_SQL),
}
