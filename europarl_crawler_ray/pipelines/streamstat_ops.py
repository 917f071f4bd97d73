"""Stream / embedding statistics operators (round-5 batch 29): prefix
autocompletion tables, the pairwise-cosine histogram of the embedding
space, and lag-1 serial correlation of document length along crawl
order.

Scale idioms: two bounded exchanges for the autocomplete argmax
(token totals, then prefix argmax in-task); batched integer-dot
histograms against the broadcast quantized matrix (fixed 41-cell
domain); range-partitioned lag products with a one-row-per-block
boundary hand-off (the seam pattern).

Reference parity: the reference has no IR or statistics surface;
these extend the brief's text-analysis / similarity families.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from .grouping import with_coarse_group as _with_coarse_group


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


# =================================================== prefix_autocomplete
#
# Prefix → top-completion table (the query-autocomplete / type-ahead
# artifact): for every PFX_LEN-char token prefix, the corpus's most
# frequent completion (count DESC, token ASC tie-break) and its count.
# Only prefixes of tokens at least PFX_LEN+1 chars long participate
# (a completion must extend the prefix).
#
# Scale shape: per-batch token-count partials → ONE coarse token
# exchange (exact totals per token in-task) → per-task per-prefix
# argmax partials — but a prefix's tokens can span tasks, so the
# partial argmax re-keys on the PREFIX for a second bounded exchange
# whose per-task input is one candidate row per (task, prefix);
# the final argmax is exact because argmax-of-argmaxes under a total
# order is associative.

PFX_LEN = 3
_PFX_TOKEN_RE = r"[^ \t\n\r\f]+"


def q_prefix_autocomplete(sf_dir: str):
    d = _read(sf_dir, "documents", columns=["text"])
    tok_re = re.compile(_PFX_TOKEN_RE)
    empty = pd.DataFrame(
        {
            "prefix": pd.Series(dtype=str),
            "top_token": pd.Series(dtype=str),
            "n": pd.Series(dtype=np.int64),
        }
    )

    def tok_counts(df: pd.DataFrame) -> pd.DataFrame:
        rec: dict[str, int] = {}
        for t in df["text"]:
            for tok in tok_re.findall(str(t).lower()):
                if len(tok) > PFX_LEN:
                    rec[tok] = rec.get(tok, 0) + 1
        if not rec:
            return pd.DataFrame(
                {"token": pd.Series(dtype=object),
                 "n_part": pd.Series(dtype=np.int64)}
            )
        return pd.DataFrame(
            {"token": list(rec),
             "n_part": np.array(list(rec.values()), np.int64)}
        )

    def local_best(g: pd.DataFrame) -> pd.DataFrame:
        t = (
            g.drop(columns=["_g"])
            .groupby("token", as_index=False)["n_part"]
            .sum()
        )
        t["prefix"] = t["token"].str.slice(0, PFX_LEN)
        t = t.sort_values(["n_part", "token"], ascending=[False, True])
        best = t.groupby("prefix", as_index=False).head(1)
        return best[["prefix", "token", "n_part"]]

    def final_best(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"]).sort_values(
            ["n_part", "token"], ascending=[False, True]
        )
        best = t.groupby("prefix", as_index=False).head(1)
        return pd.DataFrame(
            {
                "prefix": best["prefix"].astype(object),
                "top_token": best["token"].astype(object),
                "n": best["n_part"].astype(np.int64),
            }
        )

    c = (
        _with_coarse_group(
            _with_coarse_group(
                d.map_batches(tok_counts, batch_format="pandas"), "token"
            )
            .groupby("_g")
            .map_groups(local_best, batch_format="pandas"),
            "prefix",
        )
        .groupby("_g")
        .map_groups(final_best, batch_format="pandas")
        .to_pandas()  # <= |prefixes| rows (alphabet-bounded)
    )
    if not len(c):
        return empty
    return c.sort_values("prefix").reset_index(drop=True)


PREFIX_AUTOCOMPLETE_SQL = rf"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '{_PFX_TOKEN_RE}')) AS token
  FROM documents),
ty AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n
  FROM toks WHERE length(token) > {PFX_LEN} GROUP BY 1),
ranked AS (
  SELECT substr(token, 1, {PFX_LEN}) AS prefix, token, n,
         ROW_NUMBER() OVER (PARTITION BY substr(token, 1, {PFX_LEN})
                            ORDER BY n DESC, token ASC) AS rk
  FROM ty)
SELECT prefix, token AS top_token, n FROM ranked WHERE rk = 1
"""


# ==================================================== cosine_histogram
#
# Pairwise-cosine histogram of the embedding space: the distribution
# of floor(cos·HIST_SCALE) over all unordered vector pairs — a
# concentrated spike near one value is the high-dimensional "distance
# concentration" pathology under which threshold-based near-dup and
# ANN recall both degrade; a spread histogram means thresholds are
# meaningful. Cosines use the repo's quantized-integer device
# (floor(x·1000) components, integer dots), then the bucket is the
# exact integer floor(dot·HIST_SCALE / (|a|·|b|)) computed with
# isqrt-free cross multiplication: bucket = the k with k ≤
# dot·S/(na·nb) < k+1, i.e. k = dot·S // denom where denom² =
# na²·nb² — since |a||b| is irrational, the EXACT convention used on
# both engines is the dot against the SQUARED norms: bucket =
# (dot·|dot|·S²) // (na2·nb2) signed-square trick. To keep it simple
# and bit-exact, the histogram buckets the SIGNED SQUARED cosine
# scaled by S: v = dot·|dot|·S // (na2·nb2) ∈ [−S, S].
#
# Scale shape: batched integer matmul against the broadcast quantized
# matrix (the brute-force baseline; IVF-bucketed at 10^10) → fixed
# (2·S+1)-cell histogram partials → bounded groupby.

HIST_SCALE = 20


def q_cosine_histogram(sf_dir: str):
    from .vectoraudit_ops import _quantized_matrix

    ids, mat = _quantized_matrix(sf_dir)
    empty = pd.DataFrame(
        {
            "bucket": pd.Series(dtype=np.int64),
            "n_pairs": pd.Series(dtype=np.int64),
        }
    )
    if not len(ids):
        return empty
    na2 = (mat.astype(object) ** 2).sum(axis=1)  # exact squared norms
    ref = ray.put((ids, mat, np.array([int(x) for x in na2], dtype=object)))
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat, all_na2 = ray.get(ref)
        qids = df["vec_id"].to_numpy(np.int64)
        qmat = np.floor(
            np.stack(df["embedding"].to_numpy()).astype(np.float64) * 1000.0
        ).astype(np.int64)
        qna2 = (qmat.astype(object) ** 2).sum(axis=1)
        rec: dict[int, int] = {}
        s2 = HIST_SCALE
        dots = qmat @ all_mat.T  # int64-safe: |dot| <= dim * 10^6
        for r in range(len(qids)):
            keep = all_ids > qids[r]  # each unordered pair once
            if not keep.any():
                continue
            dd = dots[r][keep]
            nb2 = all_na2[keep]
            a2 = int(qna2[r])
            for dv, b2 in zip(dd.tolist(), nb2.tolist()):
                denom = a2 * int(b2)
                if not denom:
                    continue
                # Cauchy-Schwarz gives dot·|dot| >= -denom, so adding
                # denom·S keeps the numerator nonnegative — floor and
                # truncate agree, and subtracting S restores the exact
                # floor(dot·|dot|·S / denom) on both engines
                v = (dv * abs(dv) * s2 + denom * s2) // denom - s2
                rec[v] = rec.get(v, 0) + 1
        if not rec:
            return pd.DataFrame(
                {"bucket": pd.Series(dtype=np.int64),
                 "n_part": pd.Series(dtype=np.int64)}
            )
        return pd.DataFrame(
            {
                "bucket": np.array(list(rec), np.int64),
                "n_part": np.array(list(rec.values()), np.int64),
            }
        )

    c = (
        emb.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("n_part", alias_name="n_pairs"))
        .to_pandas()  # <= 2*HIST_SCALE + 1 cells
    )
    if not len(c):
        return empty
    return (
        c.astype(np.int64).sort_values("bucket").reset_index(drop=True)
    )


COSINE_HISTOGRAM_SQL = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000) AS BIGINT)) AS q
  FROM embeddings),
n2 AS (
  SELECT vec_id, q,
         CAST(list_inner_product(q, q) AS HUGEINT) AS na2
  FROM e),
pairs AS (
  SELECT CAST(list_inner_product(a.q, b.q) AS HUGEINT) AS dot,
         a.na2 AS a2, b.na2 AS b2
  FROM n2 a JOIN n2 b ON b.vec_id > a.vec_id),
bucketed AS (
  SELECT CAST((dot * ABS(dot) * {HIST_SCALE} + a2 * b2 * {HIST_SCALE})
              // (a2 * b2) - {HIST_SCALE} AS BIGINT) AS bucket
  FROM pairs WHERE a2 > 0 AND b2 > 0)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM bucketed GROUP BY 1
"""


# ===================================================== length_lag1_corr
#
# Lag-1 serial correlation of document length along crawl order (the
# doc_id sequence): are long pages followed by long pages (template
# runs, listing traps) or is page size memoryless? Pearson needs a
# square root, so the exact integer report is the SIGNED SQUARED
# correlation: corr2_ppm = sign(cov)·cov²·10^6 // (varx·vary), with
# cov/var the raw centered-sum numerators n·Σxy − Σx·Σy etc. — one
# floor, Python-int driver math, HUGEINT in SQL.
#
# Scale shape: LLC_BLOCKS range blocks (block = doc_id·B // n); each
# block sorts in-task and emits its lag products plus its first/last
# row — the ≤ 2B boundary rows stitch the cross-block lags exactly on
# the driver (the seam pattern).

LLC_BLOCKS = 16


def q_length_lag1_corr(sf_dir: str):
    n_docs = _n_docs(sf_dir)
    empty = pd.DataFrame(
        {
            "n_pairs": [0],
            "corr2_ppm": [0],
        }
    ).astype(np.int64)
    if n_docs < 2:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def block_stats(g: pd.DataFrame) -> pd.DataFrame:
        t = g.sort_values("doc_id", kind="mergesort")
        v = t["n_chars"].to_numpy(np.int64)
        ids = t["doc_id"].to_numpy(np.int64)
        sxy = int((v[:-1].astype(object) * v[1:].astype(object)).sum()) if len(v) > 1 else 0
        return pd.DataFrame(
            {
                "blk": [int(t["blk"].iloc[0])],
                "n_rows": [len(v)],
                "sxy_str": [str(sxy)],
                "first_id": [int(ids[0])],
                "first_v": [int(v[0])],
                "last_id": [int(ids[-1])],
                "last_v": [int(v[-1])],
                "sum_v": [int(v.sum())],
                "sum_v2_str": [str(int((v.astype(object) ** 2).sum()))],
            }
        )

    def with_blk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["blk"] = (
            out["doc_id"].to_numpy(np.int64) * LLC_BLOCKS // n_docs
        )
        return out

    parts = (
        d.map_batches(with_blk, batch_format="pandas")
        .groupby("blk")
        .map_groups(block_stats, batch_format="pandas")
        .to_pandas()  # <= LLC_BLOCKS rows
    )
    parts = parts.sort_values("blk").reset_index(drop=True)
    # consecutive doc_ids are dense 0..n-1 (TESTDATA.md), so every lag
    # pair is either in-block or the (last of blk, first of blk+1) seam
    sxy = sum(int(s) for s in parts["sxy_str"])
    for i in range(len(parts) - 1):
        sxy += int(parts["last_v"].iloc[i]) * int(parts["first_v"].iloc[i + 1])
    sv = sum(int(x) for x in parts["sum_v"])
    sv2 = sum(int(s) for s in parts["sum_v2_str"])
    n = int(parts["n_rows"].sum())
    # x = v[0..n-2], y = v[1..n-1]
    first_v = int(parts["first_v"].iloc[0])
    last_v = int(parts["last_v"].iloc[-1])
    first_v2 = first_v * first_v
    last_v2 = last_v * last_v
    sx, sy = sv - last_v, sv - first_v
    sx2, sy2 = sv2 - last_v2, sv2 - first_v2
    m = n - 1
    cov = m * sxy - sx * sy
    varx = m * sx2 - sx * sx
    vary = m * sy2 - sy * sy
    # sign applied OUTSIDE the floor: the divided magnitude is
    # nonnegative, so floor (Python) and truncate (DuckDB) agree
    corr2 = (
        (1 if cov >= 0 else -1)
        * ((cov * cov) * 1_000_000 // (varx * vary))
        if varx > 0 and vary > 0
        else 0
    )
    return pd.DataFrame(
        {"n_pairs": [m], "corr2_ppm": [corr2]}
    ).astype(np.int64)


LENGTH_LAG1_CORR_SQL = """
WITH o AS (
  SELECT CAST(n_chars AS HUGEINT) AS v,
         LAG(CAST(n_chars AS HUGEINT)) OVER (ORDER BY doc_id) AS prev
  FROM documents),
p AS (SELECT prev AS x, v AS y FROM o WHERE prev IS NOT NULL),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS m,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sx2, SUM(y * y) AS sy2,
         SUM(x * y) AS sxy
  FROM p),
mm AS (
  SELECT m,
         m * sxy - sx * sy AS cov,
         m * sx2 - sx * sx AS varx,
         m * sy2 - sy * sy AS vary
  FROM s)
SELECT CAST(m AS BIGINT) AS n_pairs,
       CAST(CASE WHEN varx > 0 AND vary > 0
            THEN (CASE WHEN cov >= 0 THEN 1 ELSE -1 END)
                 * ((cov * cov) * 1000000 // (varx * vary))
            ELSE 0 END AS BIGINT) AS corr2_ppm
FROM mm
"""


STREAMSTAT_SQL_QUERIES: dict[str, tuple] = {
    "prefix_autocomplete": (q_prefix_autocomplete, PREFIX_AUTOCOMPLETE_SQL),
    "cosine_histogram": (q_cosine_histogram, COSINE_HISTOGRAM_SQL),
    "length_lag1_corr": (q_length_lag1_corr, LENGTH_LAG1_CORR_SQL),
}
