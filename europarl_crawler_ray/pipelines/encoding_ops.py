"""Encoding-audit operators (round-5 batch 66): the Hilbert
space-filling curve index (Hilbert 1891, the xy2d bit-rotation walk
every spatial store uses for locality), the Hilbert-vs-Morton
locality shoot-out (the measurement that justifies Hilbert over
Z-order: spatially-adjacent points sit closer on the curve), and
Warner's randomized response with its debiased estimator (Warner
1965 — the original local-differential-privacy mechanism) — two
layout encoders and one privacy encoder, all exactly auditable.

Determinization: the Hilbert walk is the standard 16-level integer
rotation loop, UNROLLED identically in the oracle (one CTE per bit
level carrying (x, y, d)); Morton is the 16-term shift-interleave;
randomized response flips with the md5 coin (flip when
md5('rr:42:<doc>') % 4 == 3 — keep probability p = 3/4) and debiases
with the exact rational (4·obs − n)/2 ×100.

Scale idioms: hilbert/morton are pure per-row integer maps; the
locality comparison needs consecutive-in-sorted-order pairs — the
contiguous value-range two-pass with per-range first/last boundary
rows (the runs_test stitch); randomized response is a 3-scalar
reduce.

Reference parity: the reference stores rows unordered; these extend
the brief's storage-layout family (zorder_index, front_coding are
the siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from ..stages.multimodal import _md5_64
from .grouping import with_coarse_group as _with_coarse_group
from .ml_queries import _md5u

H_BITS = 16
R_RANGES = 64
RR_TERM = "join"

TOK_RE = r"[^ \t\n\r\f]+"


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _hilbert_xy2d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (H_BITS - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x_new = np.where(swap, y_f, x_f)
        y_new = np.where(swap, x_f, y_f)
        x, y = x_new, y_new
        s >>= 1
    return d


def _morton(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    z = np.zeros_like(x, dtype=np.int64)
    for k in range(H_BITS):
        z |= ((x >> k) & 1) << (2 * k)
        z |= ((y >> k) & 1) << (2 * k + 1)
    return z


# ======================================================== hilbert_index
#
# Per doc: x = n_chars & 0xFFFF, y = doc_id & 0xFFFF, the Hilbert d
# and the Morton z for the same point. Pure per-batch map.


def q_hilbert_index(sf_dir: str):
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype=np.int64),
            "x": pd.Series(dtype=np.int64),
            "y": pd.Series(dtype=np.int64),
            "hilbert_d": pd.Series(dtype=np.int64),
            "morton_z": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        x = df["n_chars"].to_numpy(np.int64) & 0xFFFF
        y = ids & 0xFFFF
        return pd.DataFrame(
            {
                "doc_id": ids,
                "x": x,
                "y": y,
                "hilbert_d": _hilbert_xy2d(x, y),
                "morton_z": _morton(x, y),
            }
        ).astype(np.int64)

    return d.map_batches(enc, batch_format="pandas")


def _hilbert_sql_core(src_cte: str) -> str:
    """Unrolled 16-level Hilbert walk over CTE `{src_cte}` exposing
    (doc_id, x, y); emits h{H_BITS} with (doc_id, x0, y0, x, y, d)."""
    parts = [
        f"""h0 AS (
  SELECT doc_id, x AS x0, y AS y0, x, y, CAST(0 AS BIGINT) AS d
  FROM {src_cte})"""
    ]
    for lvl in range(H_BITS):
        s = 1 << (H_BITS - 1 - lvl)
        parts.append(
            f"""h{lvl + 1} AS (
  SELECT doc_id, x0, y0,
         CASE WHEN (y & {s}) = 0
              THEN CASE WHEN (x & {s}) > 0 THEN {s} - 1 - y ELSE y END
              ELSE x END AS x,
         CASE WHEN (y & {s}) = 0
              THEN CASE WHEN (x & {s}) > 0 THEN {s} - 1 - x ELSE x END
              ELSE y END AS y,
         d + {s * s} * CAST(
           xor(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
               (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)) AS BIGINT)
           AS d
  FROM h{lvl})"""
        )
    return ",\n".join(parts)


def _morton_sql_expr(xc: str, yc: str) -> str:
    terms = []
    for k in range(H_BITS):
        terms.append(f"((({xc} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({yc} >> {k}) & 1) << {2 * k + 1})")
    return " | ".join(terms)


def _hilbert_sql() -> str:
    return f"""
WITH pts AS (
  SELECT doc_id,
         CAST(n_chars & 65535 AS BIGINT) AS x,
         CAST(doc_id & 65535 AS BIGINT) AS y
  FROM documents),
{_hilbert_sql_core("pts")}
SELECT doc_id, x0 AS x, y0 AS y,
       CAST(d AS BIGINT) AS hilbert_d,
       CAST({_morton_sql_expr("x0", "y0")} AS BIGINT) AS morton_z
FROM h{H_BITS}
"""


# ======================================================= curve_locality
#
# The Moon-et-al.-style clustering comparison on UNIT GRID STEPS:
# for every point p, the curve-index jumps |code(x+1,y) − code(x,y)|
# and |code(x,y+1) − code(x,y)| (steps that would leave the 16-bit
# grid contribute 0, both engines) — summed for Hilbert and Morton.
# The ratio column reports which curve clusters this dataset's
# points better (jump sums are heavy-tailed: quadrant-boundary
# steps dominate, so the famous average-case Hilbert advantage is a
# distributional statement, not a per-dataset one — measured, not
# assumed). Output: (n_points, sum_jump_hilbert,
# sum_jump_morton, ratio_x100). Pure per-batch map + 3-scalar reduce.

GRID_MAX = (1 << H_BITS) - 1


def q_curve_locality(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_points": pd.Series(dtype=np.int64),
            "sum_jump_hilbert": pd.Series(dtype=np.int64),
            "sum_jump_morton": pd.Series(dtype=np.int64),
            "ratio_x100": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def jumps(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        x = df["n_chars"].to_numpy(np.int64) & 0xFFFF
        y = ids & 0xFFFF
        h0, z0 = _hilbert_xy2d(x, y), _morton(x, y)
        okx = x < GRID_MAX
        oky = y < GRID_MAX
        hx = np.where(okx, np.abs(_hilbert_xy2d(x + 1, y) - h0), 0)
        hy = np.where(oky, np.abs(_hilbert_xy2d(x, y + 1) - h0), 0)
        zx = np.where(okx, np.abs(_morton(x + 1, y) - z0), 0)
        zy = np.where(oky, np.abs(_morton(x, y + 1) - z0), 0)
        return pd.DataFrame(
            {
                "n": [np.int64(len(x))],
                "jh": [np.int64(int(hx.sum()) + int(hy.sum()))],
                "jz": [np.int64(int(zx.sum()) + int(zy.sum()))],
            }
        )

    agg = d.map_batches(jumps, batch_format="pandas").to_pandas()
    n = int(agg["n"].sum())
    jh = int(agg["jh"].sum())
    jz = int(agg["jz"].sum())
    return pd.DataFrame(
        {
            "n_points": [np.int64(n)],
            "sum_jump_hilbert": [np.int64(jh)],
            "sum_jump_morton": [np.int64(jz)],
            "ratio_x100": [np.int64(100 * jh // jz if jz else 0)],
        }
    )


def _locality_sql() -> str:
    # three walks (base, +x, +y): the core instantiated per source
    def walk(name: str, src: str) -> str:
        w = _hilbert_sql_core(src)
        for lvl in range(H_BITS + 1):
            w = w.replace(f"h{lvl} AS (", f"{name}{lvl} AS (")
            w = w.replace(f"FROM h{lvl})", f"FROM {name}{lvl})")
        return w

    return f"""
WITH pts AS (
  SELECT doc_id,
         CAST(n_chars & 65535 AS BIGINT) AS x,
         CAST(doc_id & 65535 AS BIGINT) AS y
  FROM documents),
ptsx AS (
  SELECT doc_id, LEAST(x + 1, {GRID_MAX}) AS x, y FROM pts),
ptsy AS (
  SELECT doc_id, x, LEAST(y + 1, {GRID_MAX}) AS y FROM pts),
{walk("b", "pts")},
{walk("c", "ptsx")},
{walk("e", "ptsy")},
j AS (
  SELECT b.doc_id,
         b{H_BITS}.x0 AS x, b{H_BITS}.y0 AS y,
         b{H_BITS}.d AS hb, c{H_BITS}.d AS hc, e{H_BITS}.d AS he,
         CAST({_morton_sql_expr(f"b{H_BITS}.x0", f"b{H_BITS}.y0")}
              AS BIGINT) AS zb,
         CAST({_morton_sql_expr(f"c{H_BITS}.x0", f"c{H_BITS}.y0")}
              AS BIGINT) AS zc,
         CAST({_morton_sql_expr(f"e{H_BITS}.x0", f"e{H_BITS}.y0")}
              AS BIGINT) AS ze
  FROM pts b
  JOIN b{H_BITS} ON b{H_BITS}.doc_id = b.doc_id
  JOIN c{H_BITS} ON c{H_BITS}.doc_id = b.doc_id
  JOIN e{H_BITS} ON e{H_BITS}.doc_id = b.doc_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(CASE WHEN x < {GRID_MAX} THEN ABS(hc - hb) ELSE 0 END)
            + SUM(CASE WHEN y < {GRID_MAX} THEN ABS(he - hb) ELSE 0 END)
            AS BIGINT) AS sum_jump_hilbert,
       CAST(SUM(CASE WHEN x < {GRID_MAX} THEN ABS(zc - zb) ELSE 0 END)
            + SUM(CASE WHEN y < {GRID_MAX} THEN ABS(ze - zb) ELSE 0 END)
            AS BIGINT) AS sum_jump_morton,
       CAST(CASE WHEN SUM(CASE WHEN x < {GRID_MAX} THEN ABS(zc - zb)
                              ELSE 0 END)
                      + SUM(CASE WHEN y < {GRID_MAX} THEN ABS(ze - zb)
                                 ELSE 0 END) > 0
                 THEN 100 * (SUM(CASE WHEN x < {GRID_MAX}
                                      THEN ABS(hc - hb) ELSE 0 END)
                             + SUM(CASE WHEN y < {GRID_MAX}
                                        THEN ABS(he - hb) ELSE 0 END))
                      // (SUM(CASE WHEN x < {GRID_MAX} THEN ABS(zc - zb)
                              ELSE 0 END)
                          + SUM(CASE WHEN y < {GRID_MAX}
                                     THEN ABS(ze - zb) ELSE 0 END))
                 ELSE 0 END AS BIGINT) AS ratio_x100
FROM j
"""


# ================================================== randomized_response
#
# Warner's mechanism on the binary attribute "doc contains
# '{RR_TERM}'": report the truth unless md5('rr:42:<doc>') % 4 == 3
# (p = 3/4). The debiased count estimate is (4·reported − n)/2 ×100
# — compared against the true count the mechanism hid. Output:
# (n, true_count, reported_count, est_x100).


def q_randomized_response(sf_dir: str):
    import re as _re

    empty = pd.DataFrame(
        {
            "n": pd.Series(dtype=np.int64),
            "true_count": pd.Series(dtype=np.int64),
            "reported_count": pd.Series(dtype=np.int64),
            "est_x100": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tok_re = _re.compile(TOK_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        truth = np.fromiter(
            (
                RR_TERM in tok_re.findall(str(t).lower())
                for t in df["text"]
            ),
            np.int64,
            len(df),
        )
        flip = np.fromiter(
            (_md5_64(f"rr:42:{int(i)}") % 4 == 3 for i in ids),
            np.int64,
            len(ids),
        )
        rep = np.where(flip == 1, 1 - truth, truth)
        return pd.DataFrame(
            {
                "n": [np.int64(len(ids))],
                "t": [np.int64(truth.sum())],
                "r": [np.int64(rep.sum())],
            }
        )

    agg = (
        d.map_batches(partial, batch_format="pandas").to_pandas()
    )
    n = int(agg["n"].sum())
    t = int(agg["t"].sum())
    r = int(agg["r"].sum())
    est = 100 * (4 * r - n) // 2
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "true_count": [np.int64(t)],
            "reported_count": [np.int64(r)],
            "est_x100": [np.int64(est)],
        }
    )


RANDOMIZED_RESPONSE_SQL = rf"""
WITH s AS (
  SELECT doc_id,
         CASE WHEN len(list_filter(
                regexp_extract_all(lower(text), '{TOK_RE}'),
                x -> x = '{RR_TERM}')) > 0 THEN 1 ELSE 0 END AS truth,
         CASE WHEN {_md5u("'rr:42:' || CAST(doc_id AS VARCHAR)")} % 4 = 3
              THEN 1 ELSE 0 END AS flip
  FROM documents),
k AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(truth) AS BIGINT) AS t,
         CAST(SUM(CASE WHEN flip = 1 THEN 1 - truth ELSE truth END)
              AS BIGINT) AS r
  FROM s)
SELECT n, t AS true_count, r AS reported_count,
       CAST(100 * (4 * r - n) // 2 AS BIGINT) AS est_x100
FROM k
"""


ENCODING_SQL_QUERIES: dict[str, tuple] = {
    "hilbert_index": (q_hilbert_index, _hilbert_sql()),
    "curve_locality": (q_curve_locality, _locality_sql()),
    "randomized_response": (q_randomized_response, RANDOMIZED_RESPONSE_SQL),
}
