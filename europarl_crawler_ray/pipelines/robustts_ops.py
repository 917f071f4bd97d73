"""Robust time-series operators (round-5 batch 63): additive
seasonal decomposition with a centered moving-average trend (the
classical decomposition every STL descends from), Holt's linear
double exponential smoothing (Holt 1957) with an h-step forecast,
and the Theil-Sen median-of-slopes robust trend (Theil 1950; Sen
1968) — the series toolkit a crawl-volume dashboard runs on its
daily counts.

Determinization: the trend is the exact ⌊Σwindow/7⌋ centered MA;
Holt's recurrences run at ×100-cents scale with α = 1/4, β = 1/4
implemented as integer ⌊·/4⌋ steps (the oracle replays them with a
RECURSIVE CTE); Theil-Sen quantizes each pairwise slope
⌊10⁶·Δy/Δx⌋ and takes the lower-middle median over the ≤D²/2
integer slopes — every choice shared verbatim by both engines.

Scale idioms: ONE day-bounded reduce feeds all three (a 100-TB year
is ~365 driver rows); the decomposition adds a 7-cell day-of-week
table; everything else is driver walks the oracles mirror with
windows or recursion.

Reference parity: the reference plots nothing; these extend the
brief's time-series family (acf_daily, ewma_forecast,
seasonality_index are the siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from .learnedindex_ops import _tdiv

MA_W = 7  # centered trend window (±3 days)
HOLT_H = 5  # forecast horizon


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _daily_means(sf_dir: str) -> pd.DataFrame:
    """(day, m) — daily mean cents ×100, contiguous day rows only
    where events exist (gaps stay absent, both engines)."""
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
        .reset_index(drop=True)
    )
    agg["m"] = (
        100 * agg["c"].to_numpy(np.int64) // agg["n"].to_numpy(np.int64)
    ).astype(np.int64)
    return agg[["day", "m"]]


_DAILY_SQL = """
dm AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(100 * SUM(CAST(floor(value * 100) AS BIGINT))
              // COUNT(*) AS BIGINT) AS m
  FROM events GROUP BY 1)
"""


# ============================================================= stl_lite
#
# Classical additive decomposition over the day-ROW index: trend_i =
# ⌊Σ_{|j−i|≤3} m_j / window⌋ (shrinking windows at the edges),
# seasonal = day-of-week mean of (m − trend), residual closes the
# identity m = trend + seasonal + resid + rounding (the quantized
# seasonal mean makes the identity hold only up to its own floor —
# resid is DEFINED as m − trend − seasonal, so the output is exact).


def q_stl_lite(sf_dir: str):
    empty = pd.DataFrame(
        {
            "day": pd.Series(dtype=np.int64),
            "value_x100": pd.Series(dtype=np.int64),
            "trend_x100": pd.Series(dtype=np.int64),
            "seasonal_x100": pd.Series(dtype=np.int64),
            "resid_x100": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    dm = _daily_means(sf_dir)
    m = dm["m"].to_numpy(np.int64)
    day = dm["day"].to_numpy(np.int64)
    n = len(m)
    half = MA_W // 2
    trend = np.empty(n, np.int64)
    for i in range(n):
        lo, hi = max(0, i - half), min(n, i + half + 1)
        trend[i] = _tdiv(int(m[lo:hi].sum()), hi - lo)
    det = m - trend
    dow = day % 7
    seas = np.empty(n, np.int64)
    for w in range(7):
        mask = dow == w
        if mask.any():
            seas[mask] = _tdiv(int(det[mask].sum()), int(mask.sum()))
    resid = m - trend - seas
    return pd.DataFrame(
        {
            "day": day,
            "value_x100": m,
            "trend_x100": trend,
            "seasonal_x100": seas,
            "resid_x100": resid,
        }
    ).astype(np.int64)


STL_LITE_SQL = f"""
WITH {_DAILY_SQL},
r AS (
  SELECT day, m, ROW_NUMBER() OVER (ORDER BY day) - 1 AS i,
         COUNT(*) OVER () AS n
  FROM dm),
tr AS (
  SELECT a.day, a.m, a.day % 7 AS dow,
         CAST(SUM(b.m) // COUNT(*) AS BIGINT) AS trend
  FROM r a JOIN r b ON b.i BETWEEN a.i - {MA_W // 2} AND a.i + {MA_W // 2}
  GROUP BY a.day, a.m, a.i),
se AS (
  SELECT dow, CAST(SUM(m - trend) // COUNT(*) AS BIGINT) AS s
  FROM tr GROUP BY 1)
SELECT tr.day, tr.m AS value_x100, tr.trend AS trend_x100,
       se.s AS seasonal_x100,
       CAST(tr.m - tr.trend - se.s AS BIGINT) AS resid_x100
FROM tr JOIN se ON se.dow = tr.dow
"""


# =========================================================== holt_linear
#
# Holt's method at α = β = 1/4 over the day-ordered means:
#   l₁ = m₁, b₁ = 0;
#   lₜ = (mₜ + 3·(lₜ₋₁ + bₜ₋₁)) // 4
#   bₜ = (lₜ − lₜ₋₁ + 3·bₜ₋₁) // 4
# Output one row: (n_days, level, trend, forecast_h) with the h-step
# forecast level + h·trend.


def q_holt_linear(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_days": pd.Series(dtype=np.int64),
            "level_x100": pd.Series(dtype=np.int64),
            "trend_x100": pd.Series(dtype=np.int64),
            "forecast_x100": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    dm = _daily_means(sf_dir)
    m = dm["m"].to_numpy(np.int64)
    l = int(m[0])
    b = 0
    for t in range(1, len(m)):
        l_new = _tdiv(int(m[t]) + 3 * (l + b), 4)
        b = _tdiv(l_new - l + 3 * b, 4)
        l = l_new
    return pd.DataFrame(
        {
            "n_days": [np.int64(len(m))],
            "level_x100": [np.int64(l)],
            "trend_x100": [np.int64(b)],
            "forecast_x100": [np.int64(l + HOLT_H * b)],
        }
    )


HOLT_LINEAR_SQL = f"""
WITH {_DAILY_SQL},
r AS (
  SELECT day, m, ROW_NUMBER() OVER (ORDER BY day) AS i FROM dm),
walk AS (
  WITH RECURSIVE w(i, l, b) AS (
    SELECT CAST(1 AS BIGINT), CAST(m AS BIGINT), CAST(0 AS BIGINT)
    FROM r WHERE i = 1
    UNION ALL
    SELECT r.i,
           CAST((r.m + 3 * (w.l + w.b)) // 4 AS BIGINT),
           CAST(((r.m + 3 * (w.l + w.b)) // 4 - w.l + 3 * w.b) // 4
                AS BIGINT)
    FROM r JOIN w ON r.i = w.i + 1)
  SELECT * FROM w)
SELECT CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_days,
       CAST(l AS BIGINT) AS level_x100,
       CAST(b AS BIGINT) AS trend_x100,
       CAST(l + {HOLT_H} * b AS BIGINT) AS forecast_x100
FROM walk ORDER BY i DESC LIMIT 1
"""


# ============================================================ theil_sen
#
# Slopes ⌊10⁶·(m_j − m_i)/(day_j − day_i)⌋ for every day pair i < j;
# the estimate is the lower-middle median of the sorted quantized
# slopes, with the intercept the lower-middle median of
# m_i·10⁶ − slope·day_i (both medians exact integer selections).


def q_theil_sen(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_days": pd.Series(dtype=np.int64),
            "n_pairs": pd.Series(dtype=np.int64),
            "slope_x1e6": pd.Series(dtype=np.int64),
            "intercept_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "events") == 0:
        return empty
    dm = _daily_means(sf_dir)
    day = dm["day"].to_numpy(np.int64)
    m = dm["m"].to_numpy(np.int64)
    n = len(m)
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            dx = int(day[j] - day[i])
            dy = int(m[j] - m[i])
            q = abs(10**6 * dy) // dx  # dx > 0
            slopes.append(q if dy >= 0 else -q)
    slopes.sort()
    # NOTE: quantization here truncates toward zero (sign applied to
    # the abs quotient) — shared verbatim with the oracle below
    slope = slopes[(len(slopes) - 1) // 2] if slopes else 0
    res = sorted(
        int(mi) * 10**6 - slope * int(d) for mi, d in zip(m, day)
    )
    intercept = res[(len(res) - 1) // 2]
    return pd.DataFrame(
        {
            "n_days": [np.int64(n)],
            "n_pairs": [np.int64(len(slopes))],
            "slope_x1e6": [np.int64(slope)],
            "intercept_x1e6": [np.int64(intercept)],
        }
    )


THEIL_SEN_SQL = f"""
WITH {_DAILY_SQL},
p AS (
  SELECT CASE WHEN b.m - a.m >= 0
              THEN ABS(1000000 * (b.m - a.m)) // (b.day - a.day)
              ELSE -(ABS(1000000 * (b.m - a.m)) // (b.day - a.day)) END
           AS s
  FROM dm a JOIN dm b ON b.day > a.day),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p),
sl AS (
  SELECT s FROM (
    SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn FROM p), np
  WHERE rn = (np.n - 1) // 2 + 1),
res AS (
  SELECT dm.m * 1000000 - (SELECT s FROM sl) * dm.day AS r FROM dm),
ic AS (
  SELECT r FROM (
    SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn FROM res),
    (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM res) nr
  WHERE rn = (nr.n - 1) // 2 + 1)
SELECT CAST((SELECT COUNT(*) FROM dm) AS BIGINT) AS n_days,
       np.n AS n_pairs,
       CAST((SELECT s FROM sl) AS BIGINT) AS slope_x1e6,
       CAST((SELECT r FROM ic) AS BIGINT) AS intercept_x1e6
FROM np
"""


ROBUSTTS_SQL_QUERIES: dict[str, tuple] = {
    "stl_lite": (q_stl_lite, STL_LITE_SQL),
    "holt_linear": (q_holt_linear, HOLT_LINEAR_SQL),
    "theil_sen": (q_theil_sen, THEIL_SEN_SQL),
}
