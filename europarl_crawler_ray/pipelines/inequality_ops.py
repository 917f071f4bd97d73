"""Inequality-index operators (round-5 batch 53): the Hoover / Robin
Hood index (Hoover 1936 — the share of mass that would have to move
to equalize), the Herfindahl-Hirschman concentration index
(Hirschman 1945; Herfindahl 1950 — the antitrust concentration
standard, here over source shares), and the Atkinson index at ε = 2
(Atkinson 1970 — welfare-weighted inequality, which at ε = 2 reduces
to 1 − harmonic/arithmetic mean) — the corpus-balance dashboard: how
unevenly documents' mass spreads over docs and sources.

Exactness: Hoover is Σ|n·xᵢ − X| / (2nX) — integer cross-
multiplication, quantized ×10⁶; HHI is Σnᵢ²·10⁸ // N²; Atkinson
uses the quantized-reciprocal harmonic sum S = Σ⌊10⁹/xᵢ⌋ (the
documented determinization — an exact rational harmonic mean would
need an n-term product) giving A = 10⁶ − 10⁶·n²·10⁹ // (Σx·S),
HUGEINT-safe. Zero-length docs are excluded from Atkinson in both
engines (1/0), included elsewhere.

Scale idioms: Hoover needs Σ|n·xᵢ − X| — a second pass with the
(n, X) scalars broadcast (two bounded reduces total); HHI and
Atkinson are single-pass (lang[, source]) moment partials into
bounded groupbys. Nothing data-scaled reaches the driver.

Reference parity: the reference has no distribution analytics; these
extend the brief's corpus-statistics family (top_decile_share,
zipf_slope are the siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

ATK_SCALE = 10**9


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _lang_scalars(sf_dir: str) -> pd.DataFrame:
    """(lang, n, X = Σ n_chars) — #langs-row reduce."""
    d = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "lang": df["lang"].to_numpy(object),
                "n": np.ones(len(df), np.int64),
                "x": df["n_chars"].to_numpy(np.int64),
            }
        )
        return g.groupby("lang", as_index=False)[["n", "x"]].sum()

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"), Sum("x", alias_name="x"))
        .to_pandas()
    )
    agg["n"] = agg["n"].astype(np.int64)
    agg["x"] = agg["x"].astype(np.int64)
    return agg


# ========================================================= hoover_index
#
# Per language: H = Σ|n·xᵢ − X| / (2·n·X) ×10⁶ — the fraction of
# total characters that would have to move between documents to make
# every document equally long.


def q_hoover_index(sf_dir: str):
    empty = pd.DataFrame(
        {
            "lang": pd.Series(dtype=object),
            "n": pd.Series(dtype=np.int64),
            "hoover_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    sc = _lang_scalars(sf_dir)
    nmap = dict(zip(sc["lang"], sc["n"]))
    xmap = dict(zip(sc["lang"], sc["x"]))
    d = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def dev(df: pd.DataFrame) -> pd.DataFrame:
        langs = df["lang"].to_numpy(object)
        x = df["n_chars"].to_numpy(np.int64)
        # n·x stays far inside int64 (n ≤ 1e10 docs/lang, x ≤ 1e5
        # chars → ≤ 1e15): plain vectorized integer math
        n = np.array([nmap[lg] for lg in langs], dtype=np.int64)
        X = np.array([xmap[lg] for lg in langs], dtype=np.int64)
        dv = np.abs(n * x - X)
        g = pd.DataFrame({"lang": langs, "d": dv})
        return g.groupby("lang", as_index=False)["d"].sum()

    agg = (
        d.map_batches(dev, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("d", alias_name="d"))
        .to_pandas()
    )
    rows = []
    for _, r in agg.iterrows():
        lg = r["lang"]
        n, X, dv = int(nmap[lg]), int(xmap[lg]), int(r["d"])
        h = 10**6 * dv // (2 * n * X) if n > 0 and X > 0 else 0
        rows.append((lg, n, h))
    out = pd.DataFrame(rows, columns=["lang", "n", "hoover_x1e6"])
    out["n"] = out["n"].astype(np.int64)
    out["hoover_x1e6"] = out["hoover_x1e6"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


HOOVER_INDEX_SQL = """
WITH m AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS x
  FROM documents GROUP BY 1),
d AS (
  SELECT doc.lang,
         CAST(SUM(ABS(CAST(m.n AS HUGEINT) * doc.n_chars - m.x))
              AS HUGEINT) AS dv
  FROM documents doc JOIN m ON m.lang = doc.lang
  GROUP BY 1)
SELECT d.lang, m.n,
       CAST(CASE WHEN m.n > 0 AND m.x > 0
                 THEN 1000000 * d.dv // (2 * CAST(m.n AS HUGEINT) * m.x)
                 ELSE 0 END AS BIGINT) AS hoover_x1e6
FROM d JOIN m ON m.lang = d.lang
"""


# ==================================================== hhi_concentration
#
# Per language: how concentrated the documents are across SOURCES —
# HHI = Σ_s (n_s/N)² ×10⁸ = Σn_s²·10⁸ // N². 10⁸/#sources ≈
# perfectly even; 10⁸ = single-source.


def q_hhi_concentration(sf_dir: str):
    empty = pd.DataFrame(
        {
            "lang": pd.Series(dtype=object),
            "n_sources": pd.Series(dtype=np.int64),
            "hhi_x1e8": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["lang", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "source"], as_index=False).size()
        return pd.DataFrame(
            {
                "lang": g["lang"].to_numpy(object),
                "source": g["source"].to_numpy(object),
                "n": g["size"].to_numpy(np.int64),
            }
        )

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # #langs × #sources rows — bounded
    )
    rows = []
    for lg, g in agg.groupby("lang"):
        ns = g["n"].astype(int)
        N = int(ns.sum())
        hhi = int(sum(int(v) * int(v) for v in ns)) * 10**8 // (N * N)
        rows.append((lg, len(ns), hhi))
    out = pd.DataFrame(rows, columns=["lang", "n_sources", "hhi_x1e8"])
    out["n_sources"] = out["n_sources"].astype(np.int64)
    out["hhi_x1e8"] = out["hhi_x1e8"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


HHI_CONCENTRATION_SQL = """
WITH c AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2),
m AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_sources,
         CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS s2,
         CAST(SUM(n) AS BIGINT) AS total
  FROM c GROUP BY 1)
SELECT lang, n_sources,
       CAST(s2 * 100000000 // (CAST(total AS HUGEINT) * total) AS BIGINT)
         AS hhi_x1e8
FROM m
"""


# ======================================================= atkinson_index
#
# Per language, ε = 2: A = 1 − harmonic/arithmetic mean, with the
# harmonic sum determinized as S = Σ⌊10⁹/xᵢ⌋ over docs with xᵢ > 0:
# a_x1e6 = 10⁶ − ⌊10⁶·n²·10⁹ / (Σx·S)⌋, clamped at ≥ 0 (the floor
# in S can nudge the ratio past 1 on perfectly equal data).


def q_atkinson_index(sf_dir: str):
    empty = pd.DataFrame(
        {
            "lang": pd.Series(dtype=object),
            "n": pd.Series(dtype=np.int64),
            "atkinson_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.int64)
        keep = x > 0
        langs = df["lang"].to_numpy(object)[keep]
        xs = x[keep]
        g = pd.DataFrame(
            {
                "lang": langs,
                "n": np.ones(len(xs), np.int64),
                "sx": xs,
                "sr": ATK_SCALE // xs,
            }
        )
        return g.groupby("lang", as_index=False)[["n", "sx", "sr"]].sum()

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sr", alias_name="sr"),
        )
        .to_pandas()
    )
    rows = []
    for _, r in agg.iterrows():
        n, sx, sr = int(r["n"]), int(r["sx"]), int(r["sr"])
        a = max(0, 10**6 - (10**6 * n * n * ATK_SCALE) // (sx * sr))
        rows.append((r["lang"], n, a))
    out = pd.DataFrame(rows, columns=["lang", "n", "atkinson_x1e6"])
    out["n"] = out["n"].astype(np.int64)
    out["atkinson_x1e6"] = out["atkinson_x1e6"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


ATKINSON_INDEX_SQL = f"""
WITH m AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS sx,
         CAST(SUM({ATK_SCALE} // n_chars) AS BIGINT) AS sr
  FROM documents WHERE n_chars > 0 GROUP BY 1)
SELECT lang, n,
       CAST(GREATEST(0,
            1000000
            - (CAST(1000000 AS HUGEINT) * n * n * {ATK_SCALE})
              // (CAST(sx AS HUGEINT) * sr)) AS BIGINT) AS atkinson_x1e6
FROM m
"""


INEQUALITY_SQL_QUERIES: dict[str, tuple] = {
    "hoover_index": (q_hoover_index, HOOVER_INDEX_SQL),
    "hhi_concentration": (q_hhi_concentration, HHI_CONCENTRATION_SQL),
    "atkinson_index": (q_atkinson_index, ATKINSON_INDEX_SQL),
}
