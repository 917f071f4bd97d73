"""Learned-index operators (round-5 batch 57): the linear
learned-index last-mile error (Kraska et al., SIGMOD 2018 — how far
a least-squares CDF model misses true positions, the bound that
sizes the RMI's final search window), its piecewise second level
(8 key-range submodels — the RMI layer-2 shape), and the
selectivity-estimation shoot-out between an equi-depth histogram and
the linear CDF model over md5-chosen range probes (the optimizer
question learned indexes were built to answer).

Exactness: every fit reduces to exact integer sums over the VALUE
HISTOGRAM — for a value v with count c at rank offset o, the element
positions are the run [o, o+c), so Σy, Σxy, and Σ|pred−y| all have
closed forms (split arithmetic series); the least-squares slope and
predictions evaluate as floored integer rationals (b_num/b_den
cross-multiplied, HUGEINT in the oracle). No float touches any
output.

Scale idioms: ONE bounded value-histogram reduce (the n_chars domain
is value-bounded — ≤ max doc length distinct keys regardless of
corpus size) feeds all three ops; everything after is driver math
over that table and the 16-probe grid.

Reference parity: the reference has no index-model surface; these
extend the brief's storage/optimizer family (zonemap_selectivity,
voptimal_hist are the siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from ..stages.multimodal import _md5_64
from .ml_queries import _md5u

PW_SEGS = 8
RE_PROBES = 16
RE_BUCKETS = 8


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _value_hist(sf_dir: str) -> pd.DataFrame:
    """(value, c, o) — n_chars histogram with rank offsets, sorted."""
    d = _read(sf_dir, "documents", columns=["n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.Series(df["n_chars"].to_numpy(np.int64)).value_counts()
        return pd.DataFrame(
            {"value": s.index.to_numpy(np.int64), "c": s.to_numpy(np.int64)}
        )

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("value")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("value")
        .reset_index(drop=True)
    )
    agg["value"] = agg["value"].astype(np.int64)
    agg["c"] = agg["c"].astype(np.int64)
    agg["o"] = np.concatenate(
        ([0], np.cumsum(agg["c"].to_numpy(np.int64))[:-1])
    ).astype(np.int64)
    return agg


def _fit(h: pd.DataFrame):
    """Exact least-squares sums over elements, from the histogram."""
    v = h["value"].to_numpy(np.int64)
    c = h["c"].to_numpy(np.int64)
    o = h["o"].to_numpy(np.int64)
    n = int(c.sum())
    sx = int((v * c).sum())
    sx2 = int((v * v * c).sum())
    # Σy over the run [o, o+c): c·o + c(c−1)/2
    sy_runs = c * o + c * (c - 1) // 2
    sy = int(sy_runs.sum())
    sxy = int((v * sy_runs).sum())
    b_num = n * sxy - sx * sy
    b_den = n * sx2 - sx * sx
    return n, sx, sy, b_num, b_den


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero division — DuckDB's integer `//` semantics
    (Python's // floors; the two differ on negative numerators, and
    predictions below position 0 hit exactly that case)."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def _pred(x: int, n: int, sx: int, sy: int, b_num: int, b_den: int) -> int:
    if b_den == 0:
        return sy // n if n else 0
    return _tdiv(b_num * x * n + sy * b_den - b_num * sx, n * b_den)


def _run_errs(p: int, o: int, c: int) -> tuple[int, int]:
    """(max |p−y|, Σ|p−y|) over the run y ∈ [o, o+c)."""
    hi = o + c - 1
    mx = max(abs(p - o), abs(p - hi))
    if p <= o:
        s = c * (o - p) + c * (c - 1) // 2
    elif p >= hi:
        s = c * (p - o) - c * (c - 1) // 2
    else:
        left = (p - o) * (p - o + 1) // 2
        right = (hi - p) * (hi - p + 1) // 2
        s = left + right
    return mx, s


# ================================================== learned_index_error
#
# One global least-squares line over (key = n_chars, position); the
# output row carries n, distinct keys, the slope ×10⁶ and the
# max / summed absolute position errors — the numbers that size the
# model's last-mile search window.


def q_learned_index_error(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n": pd.Series(dtype=np.int64),
            "n_distinct": pd.Series(dtype=np.int64),
            "slope_x1e6": pd.Series(dtype=np.int64),
            "max_err": pd.Series(dtype=np.int64),
            "sum_abs_err": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    h = _value_hist(sf_dir)
    n, sx, sy, b_num, b_den = _fit(h)
    slope = _tdiv(10**6 * b_num, b_den) if b_den else 0
    mx = 0
    sm = 0
    for _, r in h.iterrows():
        p = _pred(int(r["value"]), n, sx, sy, b_num, b_den)
        m, s = _run_errs(p, int(r["o"]), int(r["c"]))
        mx = max(mx, m)
        sm += s
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "n_distinct": [np.int64(len(h))],
            "slope_x1e6": [np.int64(slope)],
            "max_err": [np.int64(mx)],
            "sum_abs_err": [np.int64(sm)],
        }
    )


_HIST_SQL = """
h0 AS (
  SELECT CAST(n_chars AS BIGINT) AS value, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1),
h AS (
  SELECT value, c,
         CAST(COALESCE(SUM(c) OVER (
           ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS BIGINT) AS o
  FROM h0)
"""

_FIT_SQL = """
f AS (
  SELECT CAST(SUM(c) AS HUGEINT) AS n,
         CAST(SUM(value * c) AS HUGEINT) AS sx,
         CAST(SUM(CAST(value AS HUGEINT) * value * c) AS HUGEINT) AS sx2,
         CAST(SUM(c * o + c * (c - 1) // 2) AS HUGEINT) AS sy,
         CAST(SUM(CAST(value AS HUGEINT)
                  * (c * o + c * (c - 1) // 2)) AS HUGEINT) AS sxy
  FROM h),
coef AS (
  SELECT n, sx, sy,
         n * sxy - sx * sy AS b_num,
         n * sx2 - sx * sx AS b_den
  FROM f)
"""

# prediction and per-run error expressions shared by the two model SQLs
_PRED = (
    "CASE WHEN coef.b_den = 0 THEN coef.sy // coef.n "
    "ELSE (coef.b_num * h.value * coef.n + coef.sy * coef.b_den "
    "- coef.b_num * coef.sx) // (coef.n * coef.b_den) END"
)

_ERR_SQL = f"""
e AS (
  SELECT h.value, h.c, h.o, ({_PRED}) AS p,
         h.o + h.c - 1 AS hi
  FROM h, coef),
errs AS (
  SELECT value, c, o, p,
         GREATEST(ABS(p - o), ABS(p - hi)) AS mx,
         CASE WHEN p <= o THEN c * (o - p) + c * (c - 1) // 2
              WHEN p >= hi THEN c * (p - o) - c * (c - 1) // 2
              ELSE (p - o) * (p - o + 1) // 2
                   + (hi - p) * (hi - p + 1) // 2 END AS s
  FROM e)
"""

LEARNED_INDEX_ERROR_SQL = f"""
WITH {_HIST_SQL}, {_FIT_SQL}, {_ERR_SQL}
SELECT CAST(coef.n AS BIGINT) AS n,
       CAST((SELECT COUNT(*) FROM h) AS BIGINT) AS n_distinct,
       CAST(CASE WHEN coef.b_den = 0 THEN 0
                 ELSE 1000000 * coef.b_num // coef.b_den END AS BIGINT)
         AS slope_x1e6,
       CAST((SELECT MAX(mx) FROM errs) AS BIGINT) AS max_err,
       CAST((SELECT SUM(s) FROM errs) AS BIGINT) AS sum_abs_err
FROM coef
"""


# ================================================ piecewise_index_error
#
# The RMI second level: 8 equal-width key segments, each with its own
# exact least-squares line predicting GLOBAL positions. Output one
# row per non-empty segment: (seg, n, slope_x1e6, max_err,
# sum_abs_err) — the per-segment windows a two-level RMI would
# actually search.


def q_piecewise_index_error(sf_dir: str):
    empty = pd.DataFrame(
        {
            "seg": pd.Series(dtype=np.int64),
            "n": pd.Series(dtype=np.int64),
            "slope_x1e6": pd.Series(dtype=np.int64),
            "max_err": pd.Series(dtype=np.int64),
            "sum_abs_err": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    h = _value_hist(sf_dir)
    vmax = int(h["value"].max())
    width = vmax // PW_SEGS + 1
    rows = []
    for seg in range(PW_SEGS):
        sub = h[h["value"] // width == seg]
        if not len(sub):
            continue
        n, sx, sy, b_num, b_den = _fit(sub)
        slope = _tdiv(10**6 * b_num, b_den) if b_den else 0
        mx = 0
        sm = 0
        for _, r in sub.iterrows():
            p = _pred(int(r["value"]), n, sx, sy, b_num, b_den)
            m, s = _run_errs(p, int(r["o"]), int(r["c"]))
            mx = max(mx, m)
            sm += s
        rows.append((seg, n, slope, mx, sm))
    return pd.DataFrame(
        rows, columns=["seg", "n", "slope_x1e6", "max_err", "sum_abs_err"]
    ).astype(np.int64)


def _piecewise_sql() -> str:
    return f"""
WITH {_HIST_SQL},
vm AS (SELECT MAX(value) // {PW_SEGS} + 1 AS w FROM h),
hs AS (SELECT h.*, h.value // vm.w AS seg FROM h, vm),
f AS (
  SELECT seg,
         CAST(SUM(c) AS HUGEINT) AS n,
         CAST(SUM(value * c) AS HUGEINT) AS sx,
         CAST(SUM(CAST(value AS HUGEINT) * value * c) AS HUGEINT) AS sx2,
         CAST(SUM(c * o + c * (c - 1) // 2) AS HUGEINT) AS sy,
         CAST(SUM(CAST(value AS HUGEINT)
                  * (c * o + c * (c - 1) // 2)) AS HUGEINT) AS sxy
  FROM hs GROUP BY 1),
coef AS (
  SELECT seg, n, sx, sy,
         n * sxy - sx * sy AS b_num,
         n * sx2 - sx * sx AS b_den
  FROM f),
e AS (
  SELECT hs.seg, hs.value, hs.c, hs.o,
         (CASE WHEN coef.b_den = 0 THEN coef.sy // coef.n
               ELSE (coef.b_num * hs.value * coef.n
                     + coef.sy * coef.b_den - coef.b_num * coef.sx)
                    // (coef.n * coef.b_den) END) AS p,
         hs.o + hs.c - 1 AS hi
  FROM hs JOIN coef ON coef.seg = hs.seg),
errs AS (
  SELECT seg, c, o, p,
         GREATEST(ABS(p - o), ABS(p - hi)) AS mx,
         CASE WHEN p <= o THEN c * (o - p) + c * (c - 1) // 2
              WHEN p >= hi THEN c * (p - o) - c * (c - 1) // 2
              ELSE (p - o) * (p - o + 1) // 2
                   + (hi - p) * (hi - p + 1) // 2 END AS s
  FROM e)
SELECT CAST(errs.seg AS BIGINT) AS seg,
       CAST(coef.n AS BIGINT) AS n,
       CAST(CASE WHEN coef.b_den = 0 THEN 0
                 ELSE 1000000 * coef.b_num // coef.b_den END AS BIGINT)
         AS slope_x1e6,
       CAST(MAX(errs.mx) AS BIGINT) AS max_err,
       CAST(SUM(errs.s) AS BIGINT) AS sum_abs_err
FROM errs JOIN coef ON coef.seg = errs.seg
GROUP BY errs.seg, coef.n, coef.b_num, coef.b_den
"""


# ================================================= range_estimate_error
#
# 16 md5-chosen range probes [lo, hi): exact count vs (a) an 8-bucket
# equi-depth histogram with uniform-within-bucket interpolation ×100
# and (b) the linear CDF model ×100 (pred(hi) − pred(lo), clamped to
# [0, n]) — the optimizer's selectivity-estimation bake-off.


def q_range_estimate_error(sf_dir: str):
    empty = pd.DataFrame(
        {
            "probe": pd.Series(dtype=np.int64),
            "lo": pd.Series(dtype=np.int64),
            "hi": pd.Series(dtype=np.int64),
            "exact": pd.Series(dtype=np.int64),
            "hist_est_x100": pd.Series(dtype=np.int64),
            "model_est_x100": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    h = _value_hist(sf_dir)
    n, sx, sy, b_num, b_den = _fit(h)
    v = h["value"].to_numpy(np.int64)
    c = h["c"].to_numpy(np.int64)
    cum = np.cumsum(c)
    vmax = int(v.max())

    # equi-depth boundaries: bucket t spans value range
    # (bnd[t-1], bnd[t]], boundaries at the ceil(n·t/B) quantiles
    bnds = []
    for t in range(1, RE_BUCKETS):
        target = (n * t + RE_BUCKETS - 1) // RE_BUCKETS
        i = int(np.searchsorted(cum, target))
        bnds.append(int(v[min(i, len(v) - 1)]))
    bnds = sorted(set(bnds))

    def cdf_exact(x: int) -> int:
        """#elements with value < x."""
        i = int(np.searchsorted(v, x))
        return int(cum[i - 1]) if i > 0 else 0

    # bucket structure: edges (−∞, b1], (b1, b2], ..., (bk, +∞)
    edges = [-1] + bnds + [vmax]
    bcounts = [
        cdf_exact(edges[i + 1] + 1) - cdf_exact(edges[i] + 1)
        for i in range(len(edges) - 1)
    ]

    def hist_est_x100(lo: int, hi: int) -> int:
        """uniform-within-bucket estimate of #elements in [lo, hi)."""
        total = 0  # in x100 units
        for i in range(len(edges) - 1):
            blo, bhi = edges[i] + 1, edges[i + 1]  # values in [blo, bhi]
            w = bhi - blo + 1
            if w <= 0 or bcounts[i] == 0:
                continue
            ov = min(hi - 1, bhi) - max(lo, blo) + 1
            if ov <= 0:
                continue
            total += 100 * bcounts[i] * ov // w
        return total

    rows = []
    for k in range(RE_PROBES):
        lo = _md5_64(f"re:42:{k}") % (vmax + 1)
        hi = lo + _md5_64(f"rw:42:{k}") % (vmax // 4 + 1) + 1
        exact = cdf_exact(hi) - cdf_exact(lo)
        p_hi = min(max(_pred(hi, n, sx, sy, b_num, b_den), 0), n)
        p_lo = min(max(_pred(lo, n, sx, sy, b_num, b_den), 0), n)
        model = 100 * max(p_hi - p_lo, 0)
        rows.append((k, lo, hi, exact, hist_est_x100(lo, hi), model))
    return pd.DataFrame(
        rows,
        columns=["probe", "lo", "hi", "exact", "hist_est_x100", "model_est_x100"],
    ).astype(np.int64)


def _range_sql() -> str:
    lo_e = _md5u("'re:42:' || CAST(k.k AS VARCHAR)")
    w_e = _md5u("'rw:42:' || CAST(k.k AS VARCHAR)")
    return f"""
WITH {_HIST_SQL}, {_FIT_SQL},
vm AS (SELECT CAST(MAX(value) AS BIGINT) AS vmax,
              CAST(SUM(c) AS BIGINT) AS n FROM h),
bnd0 AS (
  SELECT DISTINCT (
    SELECT MIN(value) FROM (
      SELECT value,
             SUM(c) OVER (ORDER BY value) AS cc
      FROM h) WHERE cc >= (vm.n * t.t + {RE_BUCKETS - 1}) // {RE_BUCKETS}
  ) AS b
  FROM unnest(range(1, {RE_BUCKETS})) AS t(t), vm),
bnds AS (SELECT b FROM bnd0 WHERE b IS NOT NULL),
edges AS (
  SELECT b AS e, ROW_NUMBER() OVER (ORDER BY b) AS i FROM (
    SELECT CAST(-1 AS BIGINT) AS b
    UNION ALL SELECT b FROM bnds
    UNION ALL SELECT vmax FROM vm)),
bkt AS (
  SELECT a.i AS bi, a.e + 1 AS blo, b.e AS bhi,
         (SELECT COALESCE(SUM(c), 0) FROM h
          WHERE value BETWEEN a.e + 1 AND b.e) AS bc
  FROM edges a JOIN edges b ON b.i = a.i + 1),
probes AS (
  SELECT CAST(k.k AS BIGINT) AS probe,
         CAST({lo_e} % (vm.vmax + 1) AS BIGINT) AS lo,
         CAST({lo_e} % (vm.vmax + 1)
              + {w_e} % (vm.vmax // 4 + 1) + 1 AS BIGINT) AS hi
  FROM unnest(range(0, {RE_PROBES})) AS k(k), vm),
ex AS (
  SELECT p.probe, p.lo, p.hi,
         CAST((SELECT COALESCE(SUM(c), 0) FROM h
               WHERE value >= p.lo AND value < p.hi) AS BIGINT) AS exact
  FROM probes p),
he AS (
  SELECT p.probe,
         CAST(COALESCE(SUM(
           CASE WHEN bkt.bhi - bkt.blo + 1 > 0 AND bkt.bc > 0
                 AND LEAST(p.hi - 1, bkt.bhi) - GREATEST(p.lo, bkt.blo) + 1 > 0
                THEN 100 * bkt.bc
                     * (LEAST(p.hi - 1, bkt.bhi)
                        - GREATEST(p.lo, bkt.blo) + 1)
                     // (bkt.bhi - bkt.blo + 1)
                ELSE 0 END), 0) AS BIGINT) AS hist_est
  FROM probes p, bkt GROUP BY 1),
me AS (
  SELECT p.probe,
         CAST(100 * GREATEST(
           LEAST(GREATEST(CASE WHEN coef.b_den = 0 THEN coef.sy // coef.n
                 ELSE (coef.b_num * p.hi * coef.n + coef.sy * coef.b_den
                       - coef.b_num * coef.sx) // (coef.n * coef.b_den) END,
                 0), vm.n)
           - LEAST(GREATEST(CASE WHEN coef.b_den = 0 THEN coef.sy // coef.n
                 ELSE (coef.b_num * p.lo * coef.n + coef.sy * coef.b_den
                       - coef.b_num * coef.sx) // (coef.n * coef.b_den) END,
                 0), vm.n),
           0) AS BIGINT) AS model_est
  FROM probes p, coef, vm)
SELECT ex.probe, ex.lo, ex.hi, ex.exact,
       he.hist_est AS hist_est_x100,
       me.model_est AS model_est_x100
FROM ex JOIN he ON he.probe = ex.probe
JOIN me ON me.probe = ex.probe
"""


LEARNEDINDEX_SQL_QUERIES: dict[str, tuple] = {
    "learned_index_error": (q_learned_index_error, LEARNED_INDEX_ERROR_SQL),
    "piecewise_index_error": (
        q_piecewise_index_error,
        _piecewise_sql(),
    ),
    "range_estimate_error": (q_range_estimate_error, _range_sql()),
}
