"""Online-algorithm operators (round-5 batch 65): the secretary
1/e stopping rule (the classical optimal-stopping solution — observe
⌊n/e⌋, then take the first record), the ½-prophet threshold rule
(Samuel-Cahn 1984 — a single threshold at max/2 earns half the
prophet's value), and ski rental (the canonical rent-vs-buy
2-competitive strategy) — three online decisions replayed offline
over the crawl's streams, with their guarantees VERIFIED per
instance where the theory makes per-instance claims.

Determinization: the observation phase is ⌊n·1000/2718⌋ (the
integer 1/e, shared literally); values are n_chars in doc_id order;
ski rental uses the per-user active-day count with buy cost B = 10.
Every comparison is integer.

Scale idioms: secretary/prophet need a prefix max and a
first-exceedance scan — the contiguous-range two-pass with a
broadcast threshold (runs_test machinery); ski rental is a coarse
user exchange into a day-count histogram (count-bounded) plus
driver ratios.

Reference parity: the reference never stops early or trades off
costs; these extend the brief's scheduling/decision family
(ucb_host_priority, crawl_budget_waterfill are the siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from .grouping import with_coarse_group as _with_coarse_group

R_RANGES = 64
SKI_B = 10  # buy cost in rental-days
E_NUM, E_DEN = 1000, 2718  # ⌊n/e⌋ as n·1000 // 2718


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _ranged_values(sf_dir: str):
    """(doc_id, x, rid) rows + the contiguous-range width — the
    doc-order machinery secretary/prophet share."""
    mx = _read(sf_dir, "documents", columns=["doc_id"]).max("doc_id")
    width = int(mx) // R_RANGES + 1
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def add_rid(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "x": df["n_chars"].to_numpy(np.int64),
                "rid": df["doc_id"].to_numpy(np.int64) // width,
            }
        )

    return (
        _with_coarse_group(
            d.map_batches(add_rid, batch_format="pandas"), "rid"
        ).materialize(),
        width,
    )


def _range_offsets(rows) -> dict:
    """rid -> count of rows in earlier ranges (driver, ≤64 rows)."""

    def cnt(g: pd.DataFrame) -> pd.DataFrame:
        s = g.drop(columns=["_g"]).groupby("rid", as_index=False).size()
        return pd.DataFrame(
            {
                "rid": s["rid"].to_numpy(np.int64),
                "n": s["size"].to_numpy(np.int64),
            }
        )

    sums = (
        rows.groupby("_g")
        .map_groups(cnt, batch_format="pandas")
        .to_pandas()
        .sort_values("rid")
    )
    off = {}
    acc = 0
    for _, r in sums.iterrows():
        off[int(r["rid"])] = acc
        acc += int(r["n"])
    return off, acc


# ======================================================= secretary_stop
#
# Observe positions 1..k (k = ⌊n·1000/2718⌋), remember their max T;
# pick the first later position with x > T (or the last position if
# none beats T — the classical fallback). Output: (n, k, threshold,
# picked_pos, picked_value, best_value, is_best).


def q_secretary_stop(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n": pd.Series(dtype=np.int64),
            "k": pd.Series(dtype=np.int64),
            "threshold": pd.Series(dtype=np.int64),
            "picked_pos": pd.Series(dtype=np.int64),
            "picked_value": pd.Series(dtype=np.int64),
            "best_value": pd.Series(dtype=np.int64),
            "is_best": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    rows, _ = _ranged_values(sf_dir)
    off, n = _range_offsets(rows)
    k = n * E_NUM // E_DEN

    # pass A: threshold = max over positions ≤ k; global max too
    def seg_max(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        outs = []
        for rid, grp in t.groupby("rid"):
            grp = grp.sort_values("doc_id", kind="mergesort")
            base = off[int(rid)]
            x = grp["x"].to_numpy(np.int64)
            pos = base + np.arange(1, len(x) + 1)
            obs = x[pos <= k]
            outs.append(
                (
                    int(obs.max()) if len(obs) else -1,
                    int(x.max()),
                )
            )
        return pd.DataFrame(outs, columns=["obs_max", "all_max"]).astype(
            np.int64
        )

    mx = (
        rows.groupby("_g")
        .map_groups(seg_max, batch_format="pandas")
        .to_pandas()
    )
    threshold = int(mx["obs_max"].max())
    best = int(mx["all_max"].max())

    # pass B: first position > k with x > threshold
    def first_hit(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        outs = []
        for rid, grp in t.groupby("rid"):
            grp = grp.sort_values("doc_id", kind="mergesort")
            base = off[int(rid)]
            x = grp["x"].to_numpy(np.int64)
            pos = base + np.arange(1, len(x) + 1)
            m = (pos > k) & (x > threshold)
            idx = np.flatnonzero(m)
            if len(idx):
                i = int(idx[0])
                outs.append((int(pos[i]), int(x[i])))
        if not outs:
            return pd.DataFrame(
                {
                    "pos": pd.Series(dtype=np.int64),
                    "val": pd.Series(dtype=np.int64),
                }
            )
        outs.sort()
        return pd.DataFrame([outs[0]], columns=["pos", "val"]).astype(
            np.int64
        )

    hits = (
        rows.groupby("_g")
        .map_groups(first_hit, batch_format="pandas")
        .to_pandas()
    )
    if len(hits):
        hits = hits.sort_values("pos")
        picked_pos, picked_val = int(hits["pos"].iloc[0]), int(
            hits["val"].iloc[0]
        )
    else:
        # fallback: the LAST candidate (position n, its value)
        def last_val(g: pd.DataFrame) -> pd.DataFrame:
            t = g.drop(columns=["_g"]).sort_values(
                "doc_id", kind="mergesort"
            )
            return pd.DataFrame(
                {
                    "pos": [
                        np.int64(
                            off[int(t["rid"].iloc[-1])] + len(
                                t[t["rid"] == t["rid"].iloc[-1]]
                            )
                        )
                    ],
                    "val": [np.int64(t["x"].iloc[-1])],
                }
            )

        lv = (
            rows.groupby("_g")
            .map_groups(last_val, batch_format="pandas")
            .to_pandas()
            .sort_values("pos")
        )
        picked_pos, picked_val = int(lv["pos"].iloc[-1]), int(
            lv["val"].iloc[-1]
        )
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "k": [np.int64(k)],
            "threshold": [np.int64(threshold)],
            "picked_pos": [np.int64(picked_pos)],
            "picked_value": [np.int64(picked_val)],
            "best_value": [np.int64(best)],
            "is_best": [np.int64(1 if picked_val == best else 0)],
        }
    )


SECRETARY_STOP_SQL = f"""
WITH r AS (
  SELECT n_chars AS x,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS pos,
         COUNT(*) OVER () AS n
  FROM documents),
k AS (SELECT CAST(MAX(n) * {E_NUM} // {E_DEN} AS BIGINT) AS k,
             CAST(MAX(n) AS BIGINT) AS n FROM r),
thr AS (
  SELECT CAST(MAX(x) AS BIGINT) AS t FROM r, k WHERE r.pos <= k.k),
hit AS (
  SELECT pos, x FROM r, k, thr
  WHERE r.pos > k.k AND r.x > thr.t
  ORDER BY pos LIMIT 1),
lastr AS (SELECT pos, x FROM r ORDER BY pos DESC LIMIT 1)
SELECT k.n, k.k, CAST(thr.t AS BIGINT) AS threshold,
       CAST(COALESCE((SELECT pos FROM hit),
                     (SELECT pos FROM lastr)) AS BIGINT) AS picked_pos,
       CAST(COALESCE((SELECT x FROM hit),
                     (SELECT x FROM lastr)) AS BIGINT) AS picked_value,
       CAST((SELECT MAX(x) FROM r) AS BIGINT) AS best_value,
       CAST(CASE WHEN COALESCE((SELECT x FROM hit),
                               (SELECT x FROM lastr))
                      = (SELECT MAX(x) FROM r)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_best
FROM k, thr
"""


# ==================================================== prophet_threshold
#
# The Samuel-Cahn single threshold T = ⌈max/2⌉: accept the first
# x ≥ T. Per instance the pick is ≥ half the prophet's value by
# construction — the pin the test states. Output: (n, threshold,
# picked_pos, picked_value, max_value).


def q_prophet_threshold(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n": pd.Series(dtype=np.int64),
            "threshold": pd.Series(dtype=np.int64),
            "picked_pos": pd.Series(dtype=np.int64),
            "picked_value": pd.Series(dtype=np.int64),
            "max_value": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    rows, _ = _ranged_values(sf_dir)
    off, n = _range_offsets(rows)
    mxv = int(
        rows.map_batches(
            lambda df: pd.DataFrame({"m": [df["x"].max()]}),
            batch_format="pandas",
        ).max("m")
    )
    thr = (mxv + 1) // 2

    def first_hit(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        outs = []
        for rid, grp in t.groupby("rid"):
            grp = grp.sort_values("doc_id", kind="mergesort")
            base = off[int(rid)]
            x = grp["x"].to_numpy(np.int64)
            pos = base + np.arange(1, len(x) + 1)
            idx = np.flatnonzero(x >= thr)
            if len(idx):
                i = int(idx[0])
                outs.append((int(pos[i]), int(x[i])))
        if not outs:
            return pd.DataFrame(
                {
                    "pos": pd.Series(dtype=np.int64),
                    "val": pd.Series(dtype=np.int64),
                }
            )
        outs.sort()
        return pd.DataFrame([outs[0]], columns=["pos", "val"]).astype(
            np.int64
        )

    hits = (
        rows.groupby("_g")
        .map_groups(first_hit, batch_format="pandas")
        .to_pandas()
        .sort_values("pos")
    )
    picked_pos, picked_val = int(hits["pos"].iloc[0]), int(
        hits["val"].iloc[0]
    )
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "threshold": [np.int64(thr)],
            "picked_pos": [np.int64(picked_pos)],
            "picked_value": [np.int64(picked_val)],
            "max_value": [np.int64(mxv)],
        }
    )


PROPHET_THRESHOLD_SQL = """
WITH r AS (
  SELECT n_chars AS x,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS pos,
         COUNT(*) OVER () AS n
  FROM documents),
m AS (SELECT CAST(MAX(x) AS BIGINT) AS mx, CAST(MAX(n) AS BIGINT) AS n
      FROM r),
hit AS (
  SELECT pos, x FROM r, m WHERE r.x >= (m.mx + 1) // 2
  ORDER BY pos LIMIT 1)
SELECT m.n,
       CAST((m.mx + 1) // 2 AS BIGINT) AS threshold,
       CAST((SELECT pos FROM hit) AS BIGINT) AS picked_pos,
       CAST((SELECT x FROM hit) AS BIGINT) AS picked_value,
       m.mx AS max_value
FROM m
"""


# =========================================================== ski_rental
#
# Per user: d = active-day count; the break-even strategy pays
# min(d, (B−1) + B) — rent for B−1 days, buy on day B — against
# OPT = min(d, B). Output: (n_users, total_online, total_opt,
# worst_ratio_x100) with worst ≤ 200 − 100/B (the 2−1/B bound).


def q_ski_rental(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_users": pd.Series(dtype=np.int64),
            "total_online": pd.Series(dtype=np.int64),
            "total_opt": pd.Series(dtype=np.int64),
            "worst_ratio_x100": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].to_numpy("datetime64[us]").astype("datetime64[D]")
        ).astype(np.int64)
        g = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "day": day}
        ).drop_duplicates()
        return g

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"]).drop_duplicates(["user_id", "day"])
        s = t.groupby("user_id", as_index=False).size()
        s = s.rename(columns={"size": "d"})
        h = s.groupby("d", as_index=False).size()
        return pd.DataFrame(
            {
                "d": h["d"].to_numpy(np.int64),
                "n": h["size"].to_numpy(np.int64),
            }
        )

    hist = (
        _with_coarse_group(
            ev.map_batches(partial, batch_format="pandas"), "user_id"
        )
        .groupby("_g")
        .map_groups(per_user, batch_format="pandas")
        .groupby("d")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    tot_on = tot_opt = 0
    worst = 0
    n_users = 0
    for _, r in hist.iterrows():
        d, cnt = int(r["d"]), int(r["n"])
        online = d if d < SKI_B else (SKI_B - 1) + SKI_B
        opt = min(d, SKI_B)
        tot_on += online * cnt
        tot_opt += opt * cnt
        worst = max(worst, 100 * online // opt)
        n_users += cnt
    return pd.DataFrame(
        {
            "n_users": [np.int64(n_users)],
            "total_online": [np.int64(tot_on)],
            "total_opt": [np.int64(tot_opt)],
            "worst_ratio_x100": [np.int64(worst)],
        }
    )


SKI_RENTAL_SQL = f"""
WITH u AS (
  SELECT user_id,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS d
  FROM events GROUP BY 1),
c AS (
  SELECT d,
         CASE WHEN d < {SKI_B} THEN d ELSE {2 * SKI_B - 1} END AS online,
         LEAST(d, {SKI_B}) AS opt,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM u GROUP BY 1)
SELECT CAST(SUM(n) AS BIGINT) AS n_users,
       CAST(SUM(online * n) AS BIGINT) AS total_online,
       CAST(SUM(opt * n) AS BIGINT) AS total_opt,
       CAST(MAX(100 * online // opt) AS BIGINT) AS worst_ratio_x100
FROM c
"""


ONLINEALGO_SQL_QUERIES: dict[str, tuple] = {
    "secretary_stop": (q_secretary_stop, SECRETARY_STOP_SQL),
    "prophet_threshold": (q_prophet_threshold, PROPHET_THRESHOLD_SQL),
    "ski_rental": (q_ski_rental, SKI_RENTAL_SQL),
}
