"""Query-processing operators (round-5 batch 43): the skyline /
maximal-vector query (Börzsönyi, Kossmann & Stocker, ICDE 2001),
Fagin's Threshold Algorithm early-stop audit (Fagin, Lotem & Naor,
PODS 2001), and priority sampling for subset-sum estimation
(Duffield, Lund & Thorup, JACM 2007) — three classics of top-k /
preference query evaluation.

Scale idioms: the skyline exploits its algebraic property —
skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — so it IS a
`global_prune` (per-block sweep → one distributed re-prune → O(|sky|)
driver rows, never a pairwise join); the TA audit fetches only
doubling PREFIXES of the two ranked lists via head-r prunes — the
whole point of TA is that the stop round is small, and the fetch
pattern matches it (no full sort ships anywhere); priority sampling
is a pure top-(k+1) prune under the exact integer priority
⌊w·M/h⌋. Every comparison is integer; ranks tie-break on doc_id in
both engines.

Reference parity: the reference's only ranked access is Postgres
ORDER BY ... LIMIT (europarl/db/queries.py todo-combos); these extend
the brief's query-surface family with preference and sampling
evaluation.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data

from ..stages.multimodal import _md5_64
from .grouping import global_prune
from .ml_queries import _md5u

TOK_RE = r"[^ \t\n\r\f]+"

TA_K = 10
PS_K = 16
PS_M = 1 << 32


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _doc_xy(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, x = n_chars, y = distinct token count) — the two
    rankings every op in this module scores over."""
    d = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    tok_re = re.compile(TOK_RE)

    def xy(df: pd.DataFrame) -> pd.DataFrame:
        y = np.fromiter(
            (
                len(set(tok_re.findall(str(t).lower())))
                for t in df["text"]
            ),
            np.int64,
            len(df),
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "x": df["n_chars"].to_numpy(np.int64),
                "y": y,
            }
        )

    return d.map_batches(xy, batch_format="pandas")


_XY_SQL = rf"""
  SELECT doc_id, n_chars AS x,
         CAST(len(list_distinct(
              regexp_extract_all(lower(text), '{TOK_RE}'))) AS BIGINT) AS y
  FROM documents
"""


# ======================================================== skyline_query
#
# Maximal vectors of (x, y): a doc survives iff no other doc is ≥ in
# both dimensions and > in one. Output the skyline, sorted by x desc.
#
# Scale shape: skyline is ASSOCIATIVE-IDEMPOTENT under union —
# per-block sweeps (sort by x desc, survive iff y strictly exceeds
# the best y of any strictly-larger x AND y is max within its own x)
# feed global_prune; the driver holds only the skyline itself.


def _local_skyline(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return df
    t = df.sort_values(["x", "y"], ascending=False, kind="mergesort")
    x = t["x"].to_numpy(np.int64)
    y = t["y"].to_numpy(np.int64)
    # best y among rows with STRICTLY larger x (x-desc order: prefix
    # max over previous distinct-x runs)
    new_x = np.ones(len(t), bool)
    new_x[1:] = x[1:] != x[:-1]
    run_id = np.cumsum(new_x) - 1
    run_max_y = np.maximum.reduceat(y, np.flatnonzero(new_x))
    prev_best = np.full(len(run_max_y), np.iinfo(np.int64).min)
    np.maximum.accumulate(run_max_y[:-1], out=run_max_y[:-1])
    prev_best[1:] = run_max_y[:-1]
    keep = (y > prev_best[run_id]) & (y == np.repeat(
        np.maximum.reduceat(y, np.flatnonzero(new_x)), np.diff(
            np.append(np.flatnonzero(new_x), len(y))
        )
    ))
    return t[keep]


def q_skyline_query(sf_dir: str):
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype=np.int64),
            "x": pd.Series(dtype=np.int64),
            "y": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    xy = _doc_xy(sf_dir)
    sky = global_prune(xy, _local_skyline)
    if not len(sky):
        return empty
    return (
        sky[["doc_id", "x", "y"]]
        .astype(np.int64)
        .sort_values(["x", "y", "doc_id"], ascending=[False, False, True])
        .reset_index(drop=True)
    )


SKYLINE_QUERY_SQL = f"""
WITH t AS ({_XY_SQL})
SELECT doc_id, x, y FROM t
WHERE NOT EXISTS (
  SELECT 1 FROM t o
  WHERE o.x >= t.x AND o.y >= t.y AND (o.x > t.x OR o.y > t.y))
"""


# ====================================================== topk_threshold
#
# Fagin's TA on score(d) = x + y with two ranked lists (x desc, y
# desc): at depth r the threshold is T(r) = x_(r) + y_(r); TA stops at
# the smallest r where the k-th best score ≥ T(r). Output: the top-k
# (rank, doc_id, score) with the stop round attached — the audit
# number that says how much of each ranked list a fair TA run reads.
#
# Scale shape: top-k and the x/y prefixes come from head-R
# global_prunes with R DOUBLING until the stop condition falls inside
# the fetched prefix — the access pattern mirrors TA's own early stop;
# no full sorted list ever ships.


def q_topk_threshold(sf_dir: str):
    empty = pd.DataFrame(
        {
            "rank": pd.Series(dtype=np.int64),
            "doc_id": pd.Series(dtype=np.int64),
            "score": pd.Series(dtype=np.int64),
            "stop_round": pd.Series(dtype=np.int64),
        }
    )
    n = _n_docs(sf_dir)
    if n == 0:
        return empty
    xy = _doc_xy(sf_dir).materialize()  # feeds 3+ prunes

    def head_score(df: pd.DataFrame) -> pd.DataFrame:
        t = df.copy()
        t["score"] = t["x"] + t["y"]
        return t.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(TA_K)

    top = global_prune(xy, head_score)
    if not len(top):
        return empty
    kth = int(top["score"].iloc[min(TA_K, len(top)) - 1])

    def head_col(col: str, r: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(
                [col, "doc_id"], ascending=[False, True], kind="mergesort"
            ).head(r)

        return fn

    stop = None
    r_fetch = max(TA_K, 16)
    while stop is None:
        r_fetch = min(r_fetch, n)
        xs = global_prune(xy, head_col("x", r_fetch))["x"].to_numpy(
            np.int64
        )
        ys = global_prune(xy, head_col("y", r_fetch))["y"].to_numpy(
            np.int64
        )
        depth = min(len(xs), len(ys))
        thr = xs[:depth] + ys[:depth]
        hit = np.flatnonzero(kth >= thr)
        if len(hit):
            stop = int(hit[0]) + 1
        elif r_fetch >= n:
            stop = n  # exhausted both lists
        else:
            r_fetch *= 2
    out = top.head(TA_K).copy().reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["stop_round"] = np.int64(stop)
    return out[["rank", "doc_id", "score", "stop_round"]].astype(np.int64)


TOPK_THRESHOLD_SQL = f"""
WITH t AS ({_XY_SQL}),
s AS (
  SELECT doc_id, x + y AS score,
         ROW_NUMBER() OVER (ORDER BY x + y DESC, doc_id ASC) AS rn
  FROM t),
kth AS (SELECT score AS kth FROM s WHERE rn = LEAST({TA_K}, (SELECT COUNT(*) FROM s))),
xr AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC, doc_id ASC) AS r FROM t),
yr AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y DESC, doc_id ASC) AS r FROM t),
thr AS (
  SELECT xr.r, xr.x + yr.y AS tr FROM xr JOIN yr ON yr.r = xr.r),
stop AS (
  SELECT COALESCE(MIN(thr.r), (SELECT COUNT(*) FROM t)) AS stop_round
  FROM thr, kth WHERE kth.kth >= thr.tr)
SELECT CAST(s.rn AS BIGINT) AS rank, s.doc_id,
       CAST(s.score AS BIGINT) AS score,
       CAST(stop.stop_round AS BIGINT) AS stop_round
FROM s, stop WHERE s.rn <= {TA_K}
"""


# ====================================================== priority_sample
#
# Priority sampling: item i with weight wᵢ = n_chars draws priority
# qᵢ = ⌊wᵢ·M / hᵢ⌋ with hᵢ = md5_64('ps:42:<doc>') % M + 1 (the
# determinized uniform); the sample is the top-PS_K by (qᵢ desc, doc
# asc) and τ is the (K+1)-th priority. Each sampled item's Horvitz-
# Thompson estimate is max(wᵢ, τ/M) — Σ over the sample is an
# unbiased estimator of Σw. Output per sampled item: rank, doc_id,
# weight, est_x100 = max(100·wᵢ, 100·τ // M).
#
# Scale shape: ONE top-(K+1) global_prune under the exact integer
# priority; the estimate is driver math on K+1 rows.


def q_priority_sample(sf_dir: str):
    empty = pd.DataFrame(
        {
            "rank": pd.Series(dtype=np.int64),
            "doc_id": pd.Series(dtype=np.int64),
            "weight": pd.Series(dtype=np.int64),
            "est_x100": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def pri(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        w = df["n_chars"].to_numpy(np.int64)
        h = np.fromiter(
            (_md5_64(f"ps:42:{int(i)}") % PS_M + 1 for i in ids),
            np.int64,
            len(ids),
        )
        q = np.array(
            [int(wi) * PS_M // int(hi) for wi, hi in zip(w, h)], np.int64
        )
        return pd.DataFrame({"doc_id": ids, "weight": w, "q": q})

    def head(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["q", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(PS_K + 1)

    top = global_prune(d.map_batches(pri, batch_format="pandas"), head)
    if not len(top):
        return empty
    top = top.sort_values(
        ["q", "doc_id"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    tau = int(top["q"].iloc[PS_K]) if len(top) > PS_K else 0
    samp = top.head(PS_K).copy()
    w = samp["weight"].to_numpy(np.int64)
    est = np.maximum(100 * w, np.int64(100 * tau // PS_M))
    samp["rank"] = np.arange(1, len(samp) + 1, dtype=np.int64)
    samp["est_x100"] = est.astype(np.int64)
    return samp[["rank", "doc_id", "weight", "est_x100"]].astype(np.int64)


PRIORITY_SAMPLE_SQL = f"""
WITH p AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         CAST(CAST(n_chars AS HUGEINT) * {PS_M}
              // ({_md5u("'ps:42:' || CAST(doc_id AS VARCHAR)")} % {PS_M} + 1)
              AS BIGINT) AS q
  FROM documents),
r AS (
  SELECT doc_id, weight, q,
         ROW_NUMBER() OVER (ORDER BY q DESC, doc_id ASC) AS rn
  FROM p),
tau AS (
  SELECT COALESCE(MAX(CASE WHEN rn = {PS_K} + 1 THEN q END), 0) AS tau
  FROM r)
SELECT CAST(rn AS BIGINT) AS rank, doc_id, weight,
       CAST(GREATEST(100 * weight, 100 * tau.tau // {PS_M}) AS BIGINT)
         AS est_x100
FROM r, tau WHERE rn <= {PS_K}
"""


QUERYPROC_SQL_QUERIES: dict[str, tuple] = {
    "skyline_query": (q_skyline_query, SKYLINE_QUERY_SQL),
    "topk_threshold": (q_topk_threshold, TOPK_THRESHOLD_SQL),
    "priority_sample": (q_priority_sample, PRIORITY_SAMPLE_SQL),
}
