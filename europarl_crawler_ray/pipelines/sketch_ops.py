"""Mergeable-sketch operators (round-3, third batch): HyperLogLog
registers and a count-min sketch over the corpus vocabulary.

At 100 TB, "how many distinct X" and "roughly how often does Y occur"
must be answered WITHOUT a data-scaled exchange: both sketches here are
classic bounded-state combiners — every block contributes a fixed-size
partial (≤64 registers / ≤4096 cells), merge is an elementwise max/sum,
and the sketch (not the data) is the only thing that ever crosses the
wire or reaches the driver.

Unlike library HLL/CMS implementations whose hash seeds are
implementation-defined, these hash with the repo-standard first-8-bytes
md5 (``functions/dedup.md5_hash64`` == SQL ``CAST('0x'||substr(md5(s),
1,16) AS UBIGINT)``), so the oracle recomputes the register values
BIT-FOR-BIT in DuckDB — the same trick ``distinct_tokens_kmv``
(queries.py) uses, extended to HLL's leading-zero ranks via DuckDB's
``bin()`` (no-leading-zero binary string: rho = 59 - length(bin(rest))).

Complements the exact/KMV family: ``distinct_tokens_kmv`` carries the
exact count + KMV state; ``hll_distinct`` carries the HLL register
vector (the estimator everyone actually deploys for cross-partition
mergeability); ``cms_sketch`` is the frequency side (heavy-hitter
prefilter for ``token_topk``-style queries when the vocabulary itself
is too large to exchange).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.dedup import _WORD_RE, md5_hash64
from .grouping import with_coarse_group as _with_coarse_group


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ----------------------------------------------------------- HyperLogLog

HLL_P = 6                      # 2^6 = 64 registers
_HLL_REST_BITS = 64 - HLL_P    # 58
_HLL_REST_MASK = np.uint64((1 << _HLL_REST_BITS) - 1)


def _bitlen_u58(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 values < 2^58.

    float64 log2 is only floor-exact below 2^32 (a 55-bit integer can
    ROUND UP to a power of two when cast to float64, overstating the
    bit length by one), so split into exact 26/32-bit halves first.
    """
    hi = (x >> np.uint64(32)).astype(np.float64)  # < 2^26, exact
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)  # < 2^32, exact
    out = np.zeros(len(x), dtype=np.int64)
    m_hi = hi > 0
    out[m_hi] = 33 + np.floor(np.log2(hi[m_hi])).astype(np.int64)
    m_lo = ~m_hi & (lo > 0)
    out[m_lo] = 1 + np.floor(np.log2(lo[m_lo])).astype(np.int64)
    return out


def hll_partial(hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register, rho) per hash: register = top ``HLL_P`` bits, rho =
    1 + leading zeros of the remaining 58 bits (Flajolet et al. 2007,
    the '+1' convention: rho(0-bits-exhausted) = 59)."""
    reg = (hashes >> np.uint64(_HLL_REST_BITS)).astype(np.int64)
    rest = hashes & _HLL_REST_MASK
    rho = np.int64(_HLL_REST_BITS + 1) - _bitlen_u58(rest)
    return reg, rho


def q_hll_distinct(sf_dir: str):
    """Per-language HyperLogLog register vector over the token
    vocabulary — the mergeable distinct-count sketch. Emits one row per
    (lang, register) OBSERVED: (lang, reg, max_rho); the harmonic-mean
    estimate is derived downstream (it is a float — the registers are
    the integer-exact contract the oracle checks).

    Scale shape: per-batch combiner (per-lang token dedup → hash →
    per-register max, ≤ 64·n_langs rows per block regardless of block
    size) → one bounded-cardinality ``groupby(lang, reg).max()``. No
    data-scaled exchange; the merge is HLL's register-wise max, which
    is exactly what makes the sketch cluster-friendly."""
    docs = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, g in df.groupby("lang"):
            words = set()
            for t in g["text"]:
                words.update(_WORD_RE.findall((t or "").lower()))
            if not words:
                continue
            reg, rho = hll_partial(md5_hash64(sorted(words)))
            m = pd.DataFrame({"reg": reg, "part_rho": rho}).groupby("reg", as_index=False)[
                "part_rho"
            ].max()
            m.insert(0, "lang", lang)
            out.append(m)
        if not out:
            return pd.DataFrame(
                {
                    "lang": pd.Series([], dtype=object),
                    "reg": pd.Series([], dtype=np.int64),
                    "part_rho": pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(out, ignore_index=True)

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": df["lang"].astype(object),
                "reg": df["reg"].to_numpy().astype(np.int64),
                "max_rho": df["max(part_rho)"].to_numpy().astype(np.int64),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "reg"])
        .max("part_rho")
        .map_batches(rename, batch_format="pandas")
    )


HLL_DISTINCT_SQL = rf"""
WITH w AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '[^ \t\n\r\f]+')) AS tok
  FROM documents),
h AS (
  SELECT DISTINCT lang,
         CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS hv
  FROM w),
r AS (
  SELECT lang, CAST(hv >> {_HLL_REST_BITS} AS BIGINT) AS reg,
         CASE WHEN (hv & CAST({int(_HLL_REST_MASK)} AS UBIGINT)) = 0
              THEN {_HLL_REST_BITS + 1}
              ELSE {_HLL_REST_BITS + 1}
                   - length(bin(hv & CAST({int(_HLL_REST_MASK)} AS UBIGINT)))
         END AS rho
  FROM h)
SELECT lang, reg, CAST(MAX(rho) AS BIGINT) AS max_rho
FROM r GROUP BY lang, reg
"""


# ------------------------------------------------------ count-min sketch

CMS_DEPTH = 4
CMS_WIDTH = 1024


def q_cms_sketch(sf_dir: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """Count-min sketch (Cormode & Muthukrishnan 2005) of token
    OCCURRENCE frequencies: ``depth`` hash rows × ``width`` buckets,
    row j hashing with salt ``"{{j}}:"``. Emits (row_id, bucket,
    n_count) for every non-empty cell — the point estimate for a token
    is min over rows of its cell, an upper bound on the true count.

    Scale shape: per-batch combiner (``value_counts`` → salted hash →
    per-cell sum: ≤ depth·width rows per block) → coarse-hash exchange
    on the flat cell id → vectorized in-task sum. The sketch is
    ≤ {CMS_DEPTH * CMS_WIDTH} cells total regardless of corpus size —
    counts merge by addition, so this is the frequency sketch that
    survives any re-partitioning."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(_WORD_RE).explode().dropna()
        if toks.empty:
            return pd.DataFrame(
                {
                    "cell": pd.Series([], dtype=np.int64),
                    "part_n": pd.Series([], dtype=np.int64),
                }
            )
        vc = toks.value_counts()
        words = list(vc.index)
        counts = vc.to_numpy().astype(np.int64)
        cells, ns = [], []
        for j in range(depth):
            b = (md5_hash64([f"{j}:{w}" for w in words]) % np.uint64(width)).astype(
                np.int64
            )
            g = pd.DataFrame({"cell": j * width + b, "n": counts}).groupby(
                "cell", as_index=False
            )["n"].sum()
            cells.append(g["cell"].to_numpy())
            ns.append(g["n"].to_numpy())
        return pd.DataFrame(
            {
                "cell": np.concatenate(cells).astype(np.int64),
                "part_n": np.concatenate(ns).astype(np.int64),
            }
        )

    def sum_cells(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("cell", as_index=False)["part_n"].sum()
        return pd.DataFrame(
            {
                "row_id": (s["cell"] // width).to_numpy().astype(np.int64),
                "bucket": (s["cell"] % width).to_numpy().astype(np.int64),
                "n_count": s["part_n"].to_numpy().astype(np.int64),
            }
        )

    return (
        _with_coarse_group(docs.map_batches(partial, batch_format="pandas"), "cell")
        .groupby("_g")
        .map_groups(lambda g: sum_cells(g.drop(columns=["_g"])), batch_format="pandas")
    )


CMS_SKETCH_SQL = rf"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[^ \t\n\r\f]+')) AS tok
  FROM documents),
c AS (
  SELECT j.row_id,
         CAST(CAST(concat('0x', substr(md5(CAST(j.row_id AS VARCHAR) || ':' || tok), 1, 16))
              AS UBIGINT) % {CMS_WIDTH} AS BIGINT) AS bucket
  FROM tok, (SELECT unnest(range(0, {CMS_DEPTH})) AS row_id) j)
SELECT CAST(row_id AS BIGINT) AS row_id, bucket, CAST(COUNT(*) AS BIGINT) AS n_count
FROM c GROUP BY row_id, bucket
"""


SKETCH_SQL_QUERIES: dict[str, tuple] = {
    "hll_distinct": (q_hll_distinct, HLL_DISTINCT_SQL),
    "cms_sketch": (q_cms_sketch, CMS_SKETCH_SQL),
}
