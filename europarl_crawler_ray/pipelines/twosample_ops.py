"""Two-sample test operators (round-5 batch 45): the Mann-Whitney U
statistic with midrank tie handling (Mann & Whitney 1947 — and its
U/(n₁n₂) = AUC identity), the Cramér-von Mises criterion (Cramér
1928), and the energy distance (Székely & Rizzo 2004) — three drift
detectors between the doc_id-parity halves of the corpus, the
deterministic A/B split the drift family (spearman_drift, ks_drift)
already uses.

Determinization: all three run on the 64-cell quantized n_chars
domain (cell = min(n_chars // 64, 63)) — the quantization is part of
each op's definition (documented), which turns every statistic into
exact integer arithmetic over two bounded histograms: U×2 handles
midranks without halves, CvM squares integer cumulative gaps, and
the energy terms Σf₁(c₁)f₂(c₂)|c₁−c₂| are 64×64 products.

Scale idioms: ONE bounded 64×2-cell count reduce feeds all driver
math — the corpus is scanned once per op and nothing data-scaled
reaches the driver; at 100 TB the histogram is still 128 rows.

Reference parity: the reference has no statistics surface; these
extend the brief's drift/eval family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

N_CELLS = 64
CELL_W = 64


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _split_hists(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Exact 64-cell histograms of n_chars for the even/odd doc_id
    halves — one bounded reduce."""
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cell = np.minimum(
            df["n_chars"].to_numpy(np.int64) // CELL_W, N_CELLS - 1
        )
        half = df["doc_id"].to_numpy(np.int64) & 1
        g = pd.DataFrame({"cell": cell, "half": half, "n": np.int64(1)})
        return g.groupby(["cell", "half"], as_index=False)["n"].sum()

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby(["cell", "half"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= 128 rows
    )
    fa = np.zeros(N_CELLS, np.int64)
    fb = np.zeros(N_CELLS, np.int64)
    for _, r in agg.iterrows():
        (fa if int(r["half"]) == 0 else fb)[int(r["cell"])] = int(r["n"])
    return fa, fb


_HIST_SQL = f"""
h AS (
  SELECT LEAST(n_chars // {CELL_W}, {N_CELLS - 1}) AS cell,
         CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS na,
         CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS nb
  FROM documents GROUP BY 1),
cells AS (SELECT CAST(i.i AS BIGINT) AS cell
          FROM unnest(range(0, {N_CELLS})) AS i(i)),
f AS (
  SELECT cells.cell,
         CAST(COALESCE(h.na, 0) AS BIGINT) AS na,
         CAST(COALESCE(h.nb, 0) AS BIGINT) AS nb
  FROM cells LEFT JOIN h ON h.cell = cells.cell)
"""


# ========================================================= mann_whitney
#
# U×2 (midranks without halves): U2_A = Σ_c fA(c)·(2·cumB(<c) + fB(c));
# U2_A + U2_B = 2·nA·nB. auc_x1e6 = ⌊10⁶·U2_A / (2·nA·nB)⌋ — the
# probability a random A value exceeds a random B value (ties count
# half), i.e. the AUC of the split.


def q_mann_whitney(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_a": pd.Series(dtype=np.int64),
            "n_b": pd.Series(dtype=np.int64),
            "u2_a": pd.Series(dtype=np.int64),
            "u2_b": pd.Series(dtype=np.int64),
            "auc_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    fa, fb = _split_hists(sf_dir)
    na, nb = int(fa.sum()), int(fb.sum())
    if na == 0 or nb == 0:
        return empty
    cum_b = np.concatenate(([0], np.cumsum(fb)))[:-1]  # cumB(< c)
    cum_a = np.concatenate(([0], np.cumsum(fa)))[:-1]
    u2a = int((fa * (2 * cum_b + fb)).sum())
    u2b = int((fb * (2 * cum_a + fa)).sum())
    assert u2a + u2b == 2 * na * nb
    return pd.DataFrame(
        {
            "n_a": [np.int64(na)],
            "n_b": [np.int64(nb)],
            "u2_a": [np.int64(u2a)],
            "u2_b": [np.int64(u2b)],
            "auc_x1e6": [np.int64(10**6 * u2a // (2 * na * nb))],
        }
    )


MANN_WHITNEY_SQL = f"""
WITH {_HIST_SQL},
c AS (
  SELECT cell, na, nb,
         CAST(COALESCE(SUM(nb) OVER (
           ORDER BY cell ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum_b,
         CAST(COALESCE(SUM(na) OVER (
           ORDER BY cell ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum_a
  FROM f),
s AS (
  SELECT CAST(SUM(na) AS BIGINT) AS n_a, CAST(SUM(nb) AS BIGINT) AS n_b,
         CAST(SUM(na * (2 * cum_b + nb)) AS BIGINT) AS u2_a,
         CAST(SUM(nb * (2 * cum_a + na)) AS BIGINT) AS u2_b
  FROM c)
SELECT n_a, n_b, u2_a, u2_b,
       CAST(1000000 * u2_a // (2 * n_a * n_b) AS BIGINT) AS auc_x1e6
FROM s WHERE n_a > 0 AND n_b > 0
"""


# ============================================================ cvm_drift
#
# Cramér-von Mises criterion on the quantized domain: the pooled-count
# weighted sum of squared ECDF gaps,
#   T = Σ_c (fA+fB)(c) · (nB·cumA(≤c) − nA·cumB(≤c))²,
# normalized t_x1e6 = ⌊10⁶·T / (nA·nB·(nA+nB)·nA·nB)⌋ — the classic
# ω² scaling with every term integer (HUGEINT in the oracle).


def q_cvm_drift(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_a": pd.Series(dtype=np.int64),
            "n_b": pd.Series(dtype=np.int64),
            "t_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    fa, fb = _split_hists(sf_dir)
    na, nb = int(fa.sum()), int(fb.sum())
    if na == 0 or nb == 0:
        return empty
    cum_a = np.cumsum(fa)
    cum_b = np.cumsum(fb)
    t = 0
    for c in range(N_CELLS):
        gap = nb * int(cum_a[c]) - na * int(cum_b[c])
        t += int(fa[c] + fb[c]) * gap * gap
    t_x = 10**6 * t // (na * nb * (na + nb) * na * nb)
    return pd.DataFrame(
        {
            "n_a": [np.int64(na)],
            "n_b": [np.int64(nb)],
            "t_x1e6": [np.int64(t_x)],
        }
    )


CVM_DRIFT_SQL = f"""
WITH {_HIST_SQL},
c AS (
  SELECT cell, na, nb,
         CAST(SUM(na) OVER (ORDER BY cell) AS BIGINT) AS cum_a,
         CAST(SUM(nb) OVER (ORDER BY cell) AS BIGINT) AS cum_b
  FROM f),
tot AS (SELECT CAST(SUM(na) AS BIGINT) AS n_a,
               CAST(SUM(nb) AS BIGINT) AS n_b FROM f),
t AS (
  SELECT CAST(SUM(CAST(c.na + c.nb AS HUGEINT)
                  * (CAST(tot.n_b AS HUGEINT) * c.cum_a
                     - CAST(tot.n_a AS HUGEINT) * c.cum_b)
                  * (CAST(tot.n_b AS HUGEINT) * c.cum_a
                     - CAST(tot.n_a AS HUGEINT) * c.cum_b))
              AS HUGEINT) AS t
  FROM c, tot)
SELECT tot.n_a, tot.n_b,
       CAST(1000000 * t.t
            // (CAST(tot.n_a AS HUGEINT) * tot.n_b
                * (tot.n_a + tot.n_b) * tot.n_a * tot.n_b)
            AS BIGINT) AS t_x1e6
FROM tot, t WHERE tot.n_a > 0 AND tot.n_b > 0
"""


# ======================================================= energy_distance
#
# Energy distance on the quantized domain:
#   E = 2·AB/(nA·nB) − AA/nA² − BB/nB²
# with AB = ΣΣ fA(c₁)fB(c₂)|c₁−c₂| (and AA, BB within-sample) —
# 64×64 products, exact. e_x1e6 uses the common denominator nA²nB².
# E ≥ 0 with equality iff the two cell distributions coincide — the
# property the test pins.


def q_energy_distance(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_a": pd.Series(dtype=np.int64),
            "n_b": pd.Series(dtype=np.int64),
            "ab": pd.Series(dtype=np.int64),
            "aa": pd.Series(dtype=np.int64),
            "bb": pd.Series(dtype=np.int64),
            "e_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    fa, fb = _split_hists(sf_dir)
    na, nb = int(fa.sum()), int(fb.sum())
    if na == 0 or nb == 0:
        return empty
    idx = np.arange(N_CELLS, dtype=np.int64)
    dist = np.abs(idx[:, None] - idx[None, :])
    ab = int(fa @ dist @ fb)
    aa = int(fa @ dist @ fa)
    bb = int(fb @ dist @ fb)
    num = 2 * ab * na * nb - aa * nb * nb - bb * na * na
    e_x = 10**6 * num // (na * na * nb * nb)
    return pd.DataFrame(
        {
            "n_a": [np.int64(na)],
            "n_b": [np.int64(nb)],
            "ab": [np.int64(ab)],
            "aa": [np.int64(aa)],
            "bb": [np.int64(bb)],
            "e_x1e6": [np.int64(e_x)],
        }
    )


ENERGY_DISTANCE_SQL = f"""
WITH {_HIST_SQL},
p AS (
  SELECT CAST(SUM(CAST(a.na AS HUGEINT) * b.nb * ABS(a.cell - b.cell))
              AS HUGEINT) AS ab,
         CAST(SUM(CAST(a.na AS HUGEINT) * b.na * ABS(a.cell - b.cell))
              AS HUGEINT) AS aa,
         CAST(SUM(CAST(a.nb AS HUGEINT) * b.nb * ABS(a.cell - b.cell))
              AS HUGEINT) AS bb
  FROM f a, f b),
tot AS (SELECT CAST(SUM(na) AS BIGINT) AS n_a,
               CAST(SUM(nb) AS BIGINT) AS n_b FROM f)
SELECT tot.n_a, tot.n_b,
       CAST(p.ab AS BIGINT) AS ab,
       CAST(p.aa AS BIGINT) AS aa,
       CAST(p.bb AS BIGINT) AS bb,
       CAST(1000000 * (2 * p.ab * tot.n_a * tot.n_b
                       - p.aa * CAST(tot.n_b AS HUGEINT) * tot.n_b
                       - p.bb * CAST(tot.n_a AS HUGEINT) * tot.n_a)
            // (CAST(tot.n_a AS HUGEINT) * tot.n_a * tot.n_b * tot.n_b)
            AS BIGINT) AS e_x1e6
FROM p, tot WHERE tot.n_a > 0 AND tot.n_b > 0
"""


TWOSAMPLE_SQL_QUERIES: dict[str, tuple] = {
    "mann_whitney": (q_mann_whitney, MANN_WHITNEY_SQL),
    "cvm_drift": (q_cvm_drift, CVM_DRIFT_SQL),
    "energy_distance": (q_energy_distance, ENERGY_DISTANCE_SQL),
}
