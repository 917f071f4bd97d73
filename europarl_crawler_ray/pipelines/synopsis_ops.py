"""Histogram-synopsis operators (round-5 batch 44): the V-optimal
histogram (Jagadish et al., VLDB 1998 — the DP that minimizes
frequency-approximation error), its equi-depth baseline (the
quantile-boundary histogram every engine ships), and isotonic
regression of a daily series via the minimax formula (the
pool-adjacent-violators fit, Ayer et al. 1955 / Barlow et al. 1972)
— the synopses a query optimizer and a drift monitor keep per
column.

Determinization: per-bucket SSE is quantized BEFORE the DP sums it
(sse_x100(j,i) = ⌊100·(len·Σf² − (Σf)²)/len⌋), and the isotonic fit
runs on floor-quantized daily means — both documented deviations
that make every comparison exact-integer and the two engines
bit-identical; argmin ties break on the smallest split point.

Scale idioms: all three live on BOUNDED domains — the value
histogram is a 64-cell count reduce (cells never exceed N_CELLS no
matter the corpus), the day series is one row per day — so the DP
(8×64×64), the quantile sweep, and the O(D³) minimax are driver
math over bounded tables; the corpus is scanned exactly once per op.

Reference parity: the reference keeps no column statistics; these
extend the brief's validation/profiling family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

N_CELLS = 64
CELL_W = 64  # cell = min(n_chars // CELL_W, N_CELLS - 1)
VOPT_B = 8


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _cell_counts(sf_dir: str) -> np.ndarray:
    """Exact 64-cell frequency vector of n_chars (bounded reduce)."""
    d = _read(sf_dir, "documents", columns=["n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.minimum(
            df["n_chars"].to_numpy(np.int64) // CELL_W, N_CELLS - 1
        )
        s = pd.Series(c).value_counts()
        return pd.DataFrame(
            {"cell": s.index.to_numpy(np.int64), "n": s.to_numpy(np.int64)}
        )

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    f = np.zeros(N_CELLS, np.int64)
    if len(agg):
        f[agg["cell"].to_numpy(np.int64)] = agg["n"].to_numpy(np.int64)
    return f


def _sse_x100(f: np.ndarray, j: int, i: int) -> int:
    """Quantized SSE of approximating cells j..i by their mean count."""
    seg = f[j : i + 1]
    ln = len(seg)
    s1 = int(seg.sum())
    s2 = int((seg * seg).sum())
    return (100 * (ln * s2 - s1 * s1)) // ln


_HIST_COLS = {
    "bucket": np.int64,
    "lo_cell": np.int64,
    "hi_cell": np.int64,
    "count_sum": np.int64,
    "sse_x100": np.int64,
}


def _hist_df(rows) -> pd.DataFrame:
    df = pd.DataFrame(
        rows, columns=["bucket", "lo_cell", "hi_cell", "count_sum", "sse_x100"]
    )
    return df.astype(_HIST_COLS)


_HIST_EMPTY = pd.DataFrame(
    {c: pd.Series(dtype=t) for c, t in _HIST_COLS.items()}
)


# ======================================================== voptimal_hist
#
# V-optimal: choose B−1 split points over the 64-cell frequency
# vector minimizing Σ_buckets sse_x100 (quantized per bucket, see
# module doc). DP: best[b][i] = min_j (best[b−1][j] + sse(j+1, i)),
# ties to the SMALLEST j. Output: the B buckets with their exact
# counts and errors.
#
# Scale shape: ONE bounded 64-cell reduce; the 8×64×64 DP is driver
# arithmetic.


def q_voptimal_hist(sf_dir: str):
    if _n_rows(sf_dir, "documents") == 0:
        return _HIST_EMPTY
    f = _cell_counts(sf_dir)
    n = N_CELLS
    sse = [[0] * n for _ in range(n)]
    for j in range(n):
        for i in range(j, n):
            sse[j][i] = _sse_x100(f, j, i)
    INF = 1 << 62
    best = [[INF] * n for _ in range(VOPT_B)]
    arg = [[-1] * n for _ in range(VOPT_B)]
    for i in range(n):
        best[0][i] = sse[0][i]
    for b in range(1, VOPT_B):
        for i in range(b, n):
            for j in range(b - 1, i):
                v = best[b - 1][j] + sse[j + 1][i]
                if v < best[b][i]:
                    best[b][i] = v
                    arg[b][i] = j
    # backtrack the exact B-bucket split of [0, n-1]
    bounds = []
    i = n - 1
    for b in range(VOPT_B - 1, 0, -1):
        j = arg[b][i]
        bounds.append((j + 1, i))
        i = j
    bounds.append((0, i))
    bounds.reverse()
    rows = [
        (
            k,
            lo,
            hi,
            int(f[lo : hi + 1].sum()),
            _sse_x100(f, lo, hi),
        )
        for k, (lo, hi) in enumerate(bounds)
    ]
    return _hist_df(rows)


def _voptimal_sql() -> str:
    # layered DP unroll over the bounded 64-cell domain
    head = f"""
WITH f0 AS (
  SELECT LEAST(n_chars // {CELL_W}, {N_CELLS - 1}) AS cell,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1),
cells AS (SELECT CAST(i.i AS BIGINT) AS cell
          FROM unnest(range(0, {N_CELLS})) AS i(i)),
f AS (
  SELECT cells.cell, CAST(COALESCE(f0.n, 0) AS BIGINT) AS n
  FROM cells LEFT JOIN f0 ON f0.cell = cells.cell),
sse AS (
  SELECT a.cell AS j, b.cell AS i,
         CAST(100 * ((b.cell - a.cell + 1)
                     * SUM(CAST(x.n AS HUGEINT) * x.n)
                     - CAST(SUM(x.n) AS HUGEINT) * SUM(x.n))
              // (b.cell - a.cell + 1) AS BIGINT) AS s,
         CAST(SUM(x.n) AS BIGINT) AS cnt
  FROM f a JOIN f b ON b.cell >= a.cell
  JOIN f x ON x.cell BETWEEN a.cell AND b.cell
  GROUP BY 1, 2),
best0 AS (
  SELECT i, s AS v, CAST(-1 AS BIGINT) AS arg FROM sse WHERE j = 0)"""
    layers = []
    for b in range(1, VOPT_B):
        layers.append(
            f"""best{b} AS (
  SELECT i, v, arg FROM (
    SELECT s.i, p.v + s2.s AS v, p.j AS arg,
           ROW_NUMBER() OVER (
             PARTITION BY s.i ORDER BY p.v + s2.s ASC, p.j ASC
           ) AS rn
    FROM (SELECT DISTINCT i FROM sse WHERE i >= {b}) s
    JOIN (SELECT i AS j, v FROM best{b - 1}) p ON p.j < s.i AND p.j >= {b - 1}
    JOIN sse s2 ON s2.j = p.j + 1 AND s2.i = s.i)
  WHERE rn = 1)"""
        )
    # backtrack: unrolled chain of B-1 argmins from i = N_CELLS-1
    bt = [f"bt{VOPT_B - 1} AS (SELECT CAST({N_CELLS - 1} AS BIGINT) AS i, "
          f"(SELECT arg FROM best{VOPT_B - 1} WHERE i = {N_CELLS - 1}) AS j)"]
    for b in range(VOPT_B - 2, 0, -1):
        bt.append(
            f"""bt{b} AS (
  SELECT bt{b + 1}.j AS i,
         (SELECT arg FROM best{b} WHERE i = bt{b + 1}.j) AS j
  FROM bt{b + 1})"""
        )
    # bucket k spans (bt{k}.j + 1 .. bt{k+1}-ish); assemble bounds rows
    bounds = [
        f"SELECT CAST(0 AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS lo, "
        f"CAST(bt1.j AS BIGINT) AS hi FROM bt1"
    ]
    for k in range(1, VOPT_B - 1):
        bounds.append(
            f"SELECT CAST({k} AS BIGINT), CAST(bt{k}.j + 1 AS BIGINT), "
            f"CAST(bt{k + 1}.j AS BIGINT) FROM bt{k}, bt{k + 1}"
        )
    bounds.append(
        f"SELECT CAST({VOPT_B - 1} AS BIGINT), "
        f"CAST(bt{VOPT_B - 1}.j + 1 AS BIGINT), "
        f"CAST({N_CELLS - 1} AS BIGINT) FROM bt{VOPT_B - 1}"
    )
    tail = f"""
b AS ({" UNION ALL ".join(bounds)})
SELECT b.bucket, b.lo AS lo_cell, b.hi AS hi_cell,
       sse.cnt AS count_sum, sse.s AS sse_x100
FROM b JOIN sse ON sse.j = b.lo AND sse.i = b.hi
"""
    return (
        head + ",\n" + ",\n".join(layers) + ",\n" + ",\n".join(bt)
        + ",\n" + tail
    )


# ======================================================== equidepth_hist
#
# The equi-depth baseline: boundary t is the smallest cell whose
# cumulative count reaches t/B of the total (B = VOPT_B). Same output
# schema as voptimal_hist so the two SSE columns compare directly —
# the classic "how much error does equi-depth leave on the table"
# optimizer exercise.


def q_equidepth_hist(sf_dir: str):
    if _n_rows(sf_dir, "documents") == 0:
        return _HIST_EMPTY
    f = _cell_counts(sf_dir)
    total = int(f.sum())
    cum = np.cumsum(f)
    bounds = []
    lo = 0
    for t in range(1, VOPT_B + 1):
        if t == VOPT_B:
            hi = N_CELLS - 1
        else:
            hi = int(np.searchsorted(cum, (total * t + VOPT_B - 1) // VOPT_B))
            hi = min(max(hi, lo), N_CELLS - 1)
        bounds.append((lo, hi))
        lo = min(hi + 1, N_CELLS - 1)
    rows = [
        (k, lo, hi, int(f[lo : hi + 1].sum()), _sse_x100(f, lo, hi))
        for k, (lo, hi) in enumerate(bounds)
    ]
    return _hist_df(rows)


def _equidepth_sql() -> str:
    head = f"""
WITH f0 AS (
  SELECT LEAST(n_chars // {CELL_W}, {N_CELLS - 1}) AS cell,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1),
cells AS (SELECT CAST(i.i AS BIGINT) AS cell
          FROM unnest(range(0, {N_CELLS})) AS i(i)),
f AS (
  SELECT cells.cell, CAST(COALESCE(f0.n, 0) AS BIGINT) AS n
  FROM cells LEFT JOIN f0 ON f0.cell = cells.cell),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM f),
cum AS (
  SELECT cell, n,
         CAST(SUM(n) OVER (ORDER BY cell) AS BIGINT) AS c
  FROM f)"""
    # boundary t: smallest cell with c >= ceil(total*t/B)
    bnds = []
    for t in range(1, VOPT_B):
        bnds.append(
            f"""bd{t} AS (
  SELECT LEAST(COALESCE(MIN(cell), {N_CELLS - 1}), {N_CELLS - 1}) AS hi
  FROM cum, tot
  WHERE c >= (tot.total * {t} + {VOPT_B - 1}) // {VOPT_B})"""
        )
    # lo/hi chain with the CLAMPED hi feeding the next lo, exactly
    # like the Python sweep (nested expressions, 8 deep)
    los, his = ["CAST(0 AS BIGINT)"], []
    for t in range(1, VOPT_B + 1):
        raw = (
            f"(SELECT hi FROM bd{t})"
            if t < VOPT_B
            else f"CAST({N_CELLS - 1} AS BIGINT)"
        )
        hi = f"GREATEST(LEAST({raw}, {N_CELLS - 1}), {los[t - 1]})"
        his.append(hi)
        los.append(f"LEAST({hi} + 1, {N_CELLS - 1})")
    rows = []
    for k in range(VOPT_B):
        rows.append(
            f"SELECT CAST({k} AS BIGINT) AS bucket, "
            f"CAST({los[k]} AS BIGINT) AS lo, "
            f"CAST({his[k]} AS BIGINT) AS hi"
        )
    tail = f"""
b AS ({" UNION ALL ".join(rows)}),
agg AS (
  SELECT b.bucket, b.lo, b.hi,
         CAST(SUM(f.n) AS BIGINT) AS cnt,
         CAST(100 * ((b.hi - b.lo + 1)
                     * SUM(CAST(f.n AS HUGEINT) * f.n)
                     - CAST(SUM(f.n) AS HUGEINT) * SUM(f.n))
              // (b.hi - b.lo + 1) AS BIGINT) AS s
  FROM b JOIN f ON f.cell BETWEEN b.lo AND b.hi
  GROUP BY 1, 2, 3)
SELECT bucket, lo AS lo_cell, hi AS hi_cell, cnt AS count_sum,
       s AS sse_x100
FROM agg
"""
    return head + ",\n" + ",\n".join(bnds) + ",\n" + tail


# ======================================================== isotonic_daily
#
# Isotonic (non-decreasing) fit of the quantized daily mean event
# value via the minimax formula iso_i = max_{j≤i} min_{k≥i} A(j,k),
# A(j,k) = ⌊100·Σcents(j..k) / count(j..k)⌋ — equivalent to the PAVA
# solution on the quantized means. Output per day: count, mean_x100,
# iso_x100 (non-decreasing by construction).
#
# Scale shape: one (day) bounded reduce (Σcents, n per day); the
# O(D³) minimax runs on the driver's D-row table (one row per day —
# a 100-TB year is ~365 rows).


def q_isotonic_daily(sf_dir: str):
    empty = pd.DataFrame(
        {
            "day": pd.Series(dtype=np.int64),
            "n_events": pd.Series(dtype=np.int64),
            "mean_x100": pd.Series(dtype=np.int64),
            "iso_x100": pd.Series(dtype=np.int64),
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
        .to_pandas()  # one row per day
        .sort_values("day")
        .reset_index(drop=True)
    )
    if not len(agg):
        return empty
    days = agg["day"].to_numpy(np.int64)
    c = agg["c"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    D = len(days)
    pc = np.concatenate(([0], np.cumsum(c)))
    pn = np.concatenate(([0], np.cumsum(n)))

    def A(j, k):
        return int(100 * (pc[k + 1] - pc[j])) // int(pn[k + 1] - pn[j])

    iso = np.empty(D, np.int64)
    for i in range(D):
        best = None
        for j in range(i + 1):
            mn = min(A(j, k) for k in range(i, D))
            best = mn if best is None else max(best, mn)
        iso[i] = best
    out = pd.DataFrame(
        {
            "day": days,
            "n_events": n,
            "mean_x100": (100 * c) // n,
            "iso_x100": iso,
        }
    )
    return out.astype(np.int64)


ISOTONIC_DAILY_SQL = """
WITH d AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events),
g AS (
  SELECT day, CAST(SUM(cents) AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM d GROUP BY 1),
a AS (
  SELECT j.day AS j, k.day AS k,
         CAST(100 * SUM(x.c) // SUM(x.n) AS BIGINT) AS avg_x100
  FROM g j JOIN g k ON k.day >= j.day
  JOIN g x ON x.day BETWEEN j.day AND k.day
  GROUP BY 1, 2),
mn AS (
  SELECT a.j, i.day AS i, CAST(MIN(a.avg_x100) AS BIGINT) AS mn
  FROM g i JOIN a ON a.j <= i.day AND a.k >= i.day
  GROUP BY 1, 2),
iso AS (
  SELECT i, CAST(MAX(mn) AS BIGINT) AS iso_x100
  FROM mn GROUP BY 1)
SELECT g.day, g.n AS n_events,
       CAST(100 * g.c // g.n AS BIGINT) AS mean_x100,
       iso.iso_x100
FROM g JOIN iso ON iso.i = g.day
"""


SYNOPSIS_SQL_QUERIES: dict[str, tuple] = {
    "voptimal_hist": (q_voptimal_hist, _voptimal_sql()),
    "equidepth_hist": (q_equidepth_hist, _equidepth_sql()),
    "isotonic_daily": (q_isotonic_daily, ISOTONIC_DAILY_SQL),
}
