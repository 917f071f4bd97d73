"""Classical-scheduling operators (round-5 batch 62): Johnson's rule
for the two-machine flow shop (Johnson 1954 — the provably optimal
a≤b-first ordering, with the makespan evaluated through its
max-over-split closed form), Smith's weighted-completion rule
(Smith 1956 — sort by w/p, optimal for 1||ΣwC), and interval
partitioning depth (the min-machines = max-overlap theorem) — the
1950s scheduling canon over crawl-shaped workloads: each document is
a job with integer stage times derived from its length and an md5
draw, each event an occupancy interval.

Determinization: job parameters live on BOUNDED grids (a, b ∈ 1..50;
w ∈ 1..20), so both orderings reduce to cell histograms and every
makespan/ΣwC evaluates in closed form over ≤2500 ordered cells with
run multiplicities (arithmetic series, exactly as the learned-index
runs do); Smith's ratio orders by the exact integer pair
(w·p_other-cross…) — cells compare by w·p′ vs w′·p cross-products,
ties (a,b) lexicographic. Interval depth is the associative
(total, max-prefix) monoid over time ranges — the runs_test carry
shape.

Scale idioms: two bounded cell reduces + driver math for the job
ops; ONE contiguous time-range exchange (≤64 driver rows) for depth.

Reference parity: the reference schedules fetches FIFO per host
(europarl/workers/); these quantify what optimal orderings would
save (politeness_makespan, crawl_budget_waterfill are siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..stages.multimodal import _md5_64
from .ml_queries import _md5u

A_MOD = 50
W_MOD = 20
R_RANGES = 64


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _job_cells(sf_dir: str) -> pd.DataFrame:
    """(a, b, w, n) — job-parameter cell histogram. a = machine-1
    time, b = machine-2 time, w = weight; all md5/length-derived."""
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        a = df["n_chars"].to_numpy(np.int64) % A_MOD + 1
        b = np.fromiter(
            (_md5_64(f"jb:42:{int(i)}") % A_MOD + 1 for i in ids),
            np.int64,
            len(ids),
        )
        w = np.fromiter(
            (_md5_64(f"jw:42:{int(i)}") % W_MOD + 1 for i in ids),
            np.int64,
            len(ids),
        )
        g = pd.DataFrame({"a": a, "b": b, "w": w, "n": np.int64(1)})
        return g.groupby(["a", "b", "w"], as_index=False)["n"].sum()

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby(["a", "b", "w"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    for c in ("a", "b", "w", "n"):
        agg[c] = agg[c].astype(np.int64)
    return agg


_CELL_SQL = f"""
cells AS (
  SELECT CAST(n_chars % {A_MOD} + 1 AS BIGINT) AS a,
         CAST({_md5u("'jb:42:' || CAST(doc_id AS VARCHAR)")} % {A_MOD} + 1
              AS BIGINT) AS b,
         CAST({_md5u("'jw:42:' || CAST(doc_id AS VARCHAR)")} % {W_MOD} + 1
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2, 3)
"""


def _johnson_order(cells: pd.DataFrame) -> pd.DataFrame:
    """Johnson sequence as ordered cells: class 0 (a ≤ b) by a asc,
    then class 1 (a > b) by b desc; ties (a, b) lexicographic."""
    g = cells.groupby(["a", "b"], as_index=False)["n"].sum()
    g["cls"] = (g["a"] > g["b"]).astype(np.int64)
    g["key1"] = np.where(g["cls"] == 0, g["a"], -g["b"])
    return g.sort_values(
        ["cls", "key1", "a", "b"], kind="mergesort"
    ).reset_index(drop=True)


def _makespan(order: pd.DataFrame) -> int:
    """Two-machine makespan via the split closed form: with jobs in
    the given order, Cmax = max over split points j of
    (Σ_{i≤j} a_i + Σ_{i≥j} b_i) — evaluated per ordered cell run
    (within a run of identical jobs the max sits at the run's first
    job, so per-run evaluation is exact)."""
    a = order["a"].to_numpy(np.int64)
    b = order["b"].to_numpy(np.int64)
    n = order["n"].to_numpy(np.int64)
    pre_a = np.concatenate(([0], np.cumsum(a * n)))  # before run r
    suf_b = np.concatenate((np.cumsum((b * n)[::-1])[::-1], [0]))
    best = 0
    for r in range(len(order)):
        # the candidate is linear in the split position inside a run,
        # so the run's FIRST and LAST jobs are the only extremes
        first = int(pre_a[r]) + int(a[r]) + int(suf_b[r])
        last = (
            int(pre_a[r])
            + int(a[r]) * int(n[r])
            + int(suf_b[r])
            - int(b[r]) * (int(n[r]) - 1)
        )
        best = max(best, first, last)
    return best


# ===================================================== johnson_schedule
#
# Output one row: the Johnson-order makespan, the doc_id-order proxy
# (cells ordered by (a, b) — the arrival-ish baseline), and the
# saving ×100. Johnson ≤ baseline is the optimality pin.


def q_johnson_schedule(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_jobs": pd.Series(dtype=np.int64),
            "makespan_johnson": pd.Series(dtype=np.int64),
            "makespan_baseline": pd.Series(dtype=np.int64),
            "saving_x100": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    cells = _job_cells(sf_dir)
    jo = _johnson_order(cells)
    base = (
        cells.groupby(["a", "b"], as_index=False)["n"]
        .sum()
        .sort_values(["a", "b"], kind="mergesort")
        .reset_index(drop=True)
    )
    mj = _makespan(jo)
    mb = _makespan(base)
    n_jobs = int(cells["n"].sum())
    return pd.DataFrame(
        {
            "n_jobs": [np.int64(n_jobs)],
            "makespan_johnson": [np.int64(mj)],
            "makespan_baseline": [np.int64(mb)],
            "saving_x100": [np.int64(100 * (mb - mj) // mb if mb else 0)],
        }
    )


def _johnson_sql() -> str:
    # ordered-cell closed form in SQL: per run r, the candidate is
    # prefix_a(before r) + a_r + suffix_b(from r)
    def span(order_cols: str) -> str:
        return f"""
  SELECT MAX(GREATEST(pre_a + a + suf_b,
                      pre_a + a * n + suf_b - b * (n - 1))) AS m FROM (
    SELECT a, b, n,
           COALESCE(SUM(a * n) OVER (
             ORDER BY {order_cols}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre_a,
           SUM(b * n) OVER (
             ORDER BY {order_cols}
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS suf_b
    FROM ab)"""

    return f"""
WITH {_CELL_SQL},
ab AS (
  SELECT a, b, CAST(SUM(n) AS BIGINT) AS n FROM cells GROUP BY 1, 2),
mj AS ({span("(CASE WHEN a > b THEN 1 ELSE 0 END), "
             "(CASE WHEN a > b THEN -b ELSE a END), a, b")}),
mb AS ({span("a, b")})
SELECT CAST((SELECT SUM(n) FROM ab) AS BIGINT) AS n_jobs,
       CAST(mj.m AS BIGINT) AS makespan_johnson,
       CAST(mb.m AS BIGINT) AS makespan_baseline,
       CAST(CASE WHEN mb.m > 0 THEN 100 * (mb.m - mj.m) // mb.m
                 ELSE 0 END AS BIGINT) AS saving_x100
FROM mj, mb
"""


# ========================================================== smith_rule
#
# 1||ΣwC: Smith order = w/p descending (cross-product comparisons,
# ties (p, w)); ΣwC evaluated per ordered cell with the arithmetic-
# series closed form for the identical jobs inside a cell. Output:
# (n_jobs, sum_wc_smith, sum_wc_fifo, saving_x100); Smith ≤ FIFO is
# the optimality pin (FIFO = cells ordered by (p, w) here — a
# deterministic arrival proxy).


def _sum_wc(order: pd.DataFrame) -> int:
    p = order["p"].to_numpy(np.int64)
    w = order["w"].to_numpy(np.int64)
    n = order["n"].to_numpy(np.int64)
    total = 0
    t = 0  # completed time before this run
    for i in range(len(order)):
        pi, wi, ni = int(p[i]), int(w[i]), int(n[i])
        # completions t+p, t+2p, ..., t+n·p each weighted w
        total += wi * (ni * t + pi * ni * (ni + 1) // 2)
        t += ni * pi
    return total


def q_smith_rule(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_jobs": pd.Series(dtype=np.int64),
            "sum_wc_smith": pd.Series(dtype=np.int64),
            "sum_wc_fifo": pd.Series(dtype=np.int64),
            "saving_x100": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    cells = _job_cells(sf_dir)
    g = cells.groupby(["a", "w"], as_index=False)["n"].sum()
    g = g.rename(columns={"a": "p"})
    # Smith: w/p desc — sort by cross-product via a rational key:
    # (w·P) vs (w'·p) handled by sorting on the exact fraction as
    # (-w, p) after normalizing? Use the quantized exact pair: sort
    # key = (-w * LCMish)… simplest exact: sort by (w * 10**6 // p)
    # desc then (p, w) — both engines share the quantized key.
    g["key"] = (g["w"].to_numpy(np.int64) * 10**6) // g[
        "p"
    ].to_numpy(np.int64)
    smith = g.sort_values(
        ["key", "p", "w"], ascending=[False, True, True], kind="mergesort"
    ).reset_index(drop=True)
    fifo = g.sort_values(["p", "w"], kind="mergesort").reset_index(
        drop=True
    )
    ws = _sum_wc(smith)
    wf = _sum_wc(fifo)
    return pd.DataFrame(
        {
            "n_jobs": [np.int64(int(g["n"].sum()))],
            "sum_wc_smith": [np.int64(ws)],
            "sum_wc_fifo": [np.int64(wf)],
            "saving_x100": [np.int64(100 * (wf - ws) // wf if wf else 0)],
        }
    )


def _smith_sql() -> str:
    def swc(order_cols: str) -> str:
        return f"""
  SELECT CAST(SUM(w * (n * t0 + p * n * (n + 1) // 2)) AS BIGINT) AS s
  FROM (
    SELECT p, w, n,
           COALESCE(SUM(p * n) OVER (
             ORDER BY {order_cols}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS t0
    FROM pw)"""

    return f"""
WITH {_CELL_SQL},
pw AS (
  SELECT a AS p, w, CAST(SUM(n) AS BIGINT) AS n FROM cells GROUP BY 1, 2),
sm AS ({swc("(w * 1000000 // p) DESC, p, w")}),
ff AS ({swc("p, w")})
SELECT CAST((SELECT SUM(n) FROM pw) AS BIGINT) AS n_jobs,
       sm.s AS sum_wc_smith,
       ff.s AS sum_wc_fifo,
       CAST(CASE WHEN ff.s > 0 THEN 100 * (ff.s - sm.s) // ff.s
                 ELSE 0 END AS BIGINT) AS saving_x100
FROM sm, ff
"""


# ======================================================= interval_depth
#
# Min machines for the event intervals [ts, ts + ⌈value⌉ minutes):
# the max over time of concurrent intervals — computed as the
# max-prefix of the sorted ±1 endpoint stream. Output:
# (n_intervals, depth).
#
# Scale shape: endpoint rows carry contiguous time-range ids; each
# range reduces to the (total, max_prefix) monoid and the ≤64-row
# driver merge folds carries left to right — the runs_test shape.


def q_interval_depth(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_intervals": pd.Series(dtype=np.int64),
            "depth": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        start = (
            df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        )
        dur = (
            np.ceil(np.maximum(df["value"].to_numpy(np.float64), 0.0))
            .astype(np.int64)
            * 60_000_000
        )
        end = start + np.maximum(dur, 1)
        return pd.DataFrame(
            {
                "t": np.concatenate([start, end]),
                # HALF-OPEN [s, e): an end at instant t releases
                # before a start at t claims — ends (o=0) sort first
                "o": np.concatenate(
                    [np.ones(len(start), np.int64), np.zeros(len(end), np.int64)]
                ),
                "d": np.concatenate(
                    [
                        np.ones(len(start), np.int64),
                        -np.ones(len(end), np.int64),
                    ]
                ),
            }
        )

    eps = ev.map_batches(endpoints, batch_format="pandas").materialize()
    tmin = int(eps.min("t"))
    tmax = int(eps.max("t"))
    width = (tmax - tmin) // R_RANGES + 1

    def add_rid(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["rid"] = (out["t"].to_numpy(np.int64) - tmin) // width
        return out

    from .grouping import with_coarse_group as _wcg

    def monoid(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        rows = []
        for rid, grp in t.groupby("rid"):
            grp = grp.sort_values(["t", "o"], kind="mergesort")
            d = grp["d"].to_numpy(np.int64)
            c = np.cumsum(d)
            rows.append((int(rid), int(d.sum()), int(c.max())))
        return pd.DataFrame(
            rows, columns=["rid", "total", "maxpre"]
        ).astype(np.int64)

    parts = (
        _wcg(
            eps.map_batches(add_rid, batch_format="pandas"), "rid"
        )
        .groupby("_g")
        .map_groups(monoid, batch_format="pandas")
        .to_pandas()
        .sort_values("rid")
    )
    carry = 0
    depth = 0
    for _, r in parts.iterrows():
        depth = max(depth, carry + int(r["maxpre"]))
        carry += int(r["total"])
    n_int = _n_rows(sf_dir, "events")
    return pd.DataFrame(
        {
            "n_intervals": [np.int64(n_int)],
            "depth": [np.int64(depth)],
        }
    )


INTERVAL_DEPTH_SQL = """
WITH iv AS (
  SELECT epoch_us(ts) AS s,
         epoch_us(ts)
         + GREATEST(CAST(ceil(GREATEST(value, 0)) AS BIGINT)
                    * 60000000, 1) AS e
  FROM events),
ep AS (
  SELECT s AS t, 1 AS o, 1 AS d FROM iv
  UNION ALL
  SELECT e AS t, 0 AS o, -1 AS d FROM iv),
c AS (
  SELECT CAST(SUM(d) OVER (ORDER BY t, o
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum
  FROM ep)
SELECT CAST((SELECT COUNT(*) FROM iv) AS BIGINT) AS n_intervals,
       CAST(MAX(cum) AS BIGINT) AS depth
FROM c
"""


SHOPSCHED_SQL_QUERIES: dict[str, tuple] = {
    "johnson_schedule": (q_johnson_schedule, _johnson_sql()),
    "smith_rule": (q_smith_rule, _smith_sql()),
    "interval_depth": (q_interval_depth, INTERVAL_DEPTH_SQL),
}
