"""Sketches, quantization and data-profiling evaluation, split out of
webcorpus_ops (VERDICT r3 #9): radix-histogram quantiles + funnel
latency, sketch-vs-exact evaluators (minhash_error, kmv_error,
join_size_estimate, pq_recall), product quantization, content-defined
chunking, LRU stack-distance hit rate, distribution/quantile mapping,
JSON props profiling, burst detection, late-data audit, type inference,
compression ratio. SQL-oracled except compression_ratio (zlib).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .grouping import partitioned_anti_join  # noqa: F401 (family modules share the helper set)
from .grouping import with_coarse_group as _with_coarse_group  # noqa: F401
from .ml_queries import _md5u  # noqa: F401 — the shared md5-uint64 SQL hash family


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ===================================================== quantile mapping
#
# Cross-source quantile normalization: map every document's length onto
# the GLOBAL length distribution at the same within-source percentile —
# the curation step that makes per-source quality thresholds comparable
# when sources have wildly different length profiles. Exact integer
# CDFs in basis points; mapped value = smallest global value whose
# global CDF reaches the doc's within-source CDF.


def q_quantile_map(sf_dir: str):
    """(doc_id, source, n_chars, mapped_chars).

    Scale shape: TWO bounded histogram reduces (per-(source, value) and
    global-value counts — both schema-bounded, never data-scaled), the
    mapping table built on the driver with one vectorized searchsorted
    per source, broadcast once; the apply pass is a dict lookup map."""
    d = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["source", "n_chars"], as_index=False).size()
        out.columns = ["source", "n_chars", "n"]
        return out.astype({"n_chars": np.int64, "n": np.int64})

    def merge_source(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["source", "n_chars"], as_index=False)["n"].sum()
        return out.astype({"n_chars": np.int64, "n": np.int64})

    # Ray groupby keyed on source ONLY (|sources| groups); the
    # (source, value) merge happens inside the group task — a
    # (source, value)-keyed Ray groupby costs ~100x more groups
    counts = (
        d.map_batches(hist, batch_format="pandas")
        .groupby("source")
        .map_groups(merge_source, batch_format="pandas")
        .to_pandas()
    )  # bounded: |sources| x |distinct lengths|
    if counts.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "source": pd.Series([], dtype=object),
                "n_chars": pd.Series([], dtype=np.int64),
                "mapped_chars": pd.Series([], dtype=np.int64),
            }
        )
    counts = counts.sort_values(["source", "n_chars"])
    gl = (
        counts.groupby("n_chars", as_index=False)["n"].sum().sort_values("n_chars")
    )
    g_total = int(gl["n"].sum())
    g_vals = gl["n_chars"].to_numpy(np.int64)
    g_cdf = 10000 * gl["n"].cumsum().to_numpy(np.int64) // g_total
    mapping: dict[tuple[str, int], int] = {}
    for src, grp in counts.groupby("source"):
        s_total = int(grp["n"].sum())
        s_cdf = 10000 * grp["n"].cumsum().to_numpy(np.int64) // s_total
        # smallest global value with g_cdf >= s_cdf
        idx = np.searchsorted(g_cdf, s_cdf, side="left")
        for v, m in zip(grp["n_chars"].to_numpy(np.int64), g_vals[idx]):
            mapping[(src, int(v))] = int(m)
    map_ref = ray.put(mapping)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        mp = ray.get(map_ref)
        src = df["source"].tolist()
        v = df["n_chars"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "source": src,
                "n_chars": v,
                "mapped_chars": pd.Series(
                    [mp[(s, int(x))] for s, x in zip(src, v)], dtype=np.int64
                ),
            }
        )

    return d.map_batches(apply, batch_format="pandas")


QUANTILE_MAP_SQL = """
WITH gh AS (
  SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1
), g AS (
  SELECT v, CAST(10000 * SUM(c) OVER (ORDER BY v)
                 // (SELECT SUM(c) FROM gh) AS BIGINT) AS cdf
  FROM gh
), sh AS (
  SELECT source, n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1, 2
), sc AS (
  SELECT source, v,
         CAST(10000 * SUM(c) OVER (PARTITION BY source ORDER BY v)
              // SUM(c) OVER (PARTITION BY source) AS BIGINT) AS cdf
  FROM sh
), map AS (
  SELECT sc.source, sc.v, MIN(g.v) AS mapped
  FROM sc JOIN g ON g.cdf >= sc.cdf
  GROUP BY 1, 2
)
SELECT d.doc_id AS doc_id, d.source AS source, d.n_chars AS n_chars,
       m.mapped AS mapped_chars
FROM documents d
JOIN map m ON m.source = d.source AND m.v = d.n_chars
"""


# ==================================================== JSON props stats
#
# Semi-structured payload extraction: the events table's `props` column
# is a JSON string (the universal telemetry escape hatch); parse it with
# a REAL json decode on the Ray side (the oracle uses DuckDB's
# json_extract) and aggregate the extracted field per event type. The
# value domain is bounded, so the whole aggregate is a per-batch
# (type, k) histogram combiner -> one schema-bounded groupby -> stats
# derived from the histogram (distinct/min/max/sum without a second
# pass).


def q_props_stats(sf_dir: str):
    """(event_type, n_events, sum_k, min_k, max_k, n_distinct_k).

    Perf note: the per-batch combiner keys the Ray groupby on
    event_type ONLY (|types| groups) and sums the k-histogram inside
    the group task — a groupby keyed on (type, k) costs ~100x more Ray
    groups for the same result (measured 5.8 s -> 1.4 s at sf0.1)."""
    import json as _json

    ev = _read(sf_dir, "events", columns=["event_type", "props"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        ks = [int(_json.loads(p)["k"]) for p in df["props"].tolist()]
        out = (
            pd.DataFrame({"event_type": df["event_type"].to_numpy(), "k": ks})
            .groupby(["event_type", "k"], as_index=False)
            .size()
        )
        out.columns = ["event_type", "k", "n"]
        return out.astype({"k": np.int64, "n": np.int64})

    def merge_type(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["event_type", "k"], as_index=False)["n"].sum()
        return out.astype({"k": np.int64, "n": np.int64})

    h = (
        ev.map_batches(hist, batch_format="pandas")
        .groupby("event_type")
        .map_groups(merge_type, batch_format="pandas")
        .to_pandas()
    )  # bounded: |types| x |k domain|
    if h.empty:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype=np.int64),
                "sum_k": pd.Series([], dtype=np.int64),
                "min_k": pd.Series([], dtype=np.int64),
                "max_k": pd.Series([], dtype=np.int64),
                "n_distinct_k": pd.Series([], dtype=np.int64),
            }
        )
    g = h.groupby("event_type")
    out = pd.DataFrame(
        {
            "event_type": list(g.groups.keys()),
            "n_events": g["n"].sum().to_numpy(np.int64),
            "sum_k": g.apply(
                lambda x: int((x["k"] * x["n"]).sum()), include_groups=False
            ).to_numpy(np.int64),
            "min_k": g["k"].min().to_numpy(np.int64),
            "max_k": g["k"].max().to_numpy(np.int64),
            "n_distinct_k": g["k"].nunique().to_numpy(np.int64),
        }
    )
    return out.reset_index(drop=True)


PROPS_STATS_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(k) AS BIGINT) AS sum_k,
  CAST(MIN(k) AS BIGINT) AS min_k,
  CAST(MAX(k) AS BIGINT) AS max_k,
  CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
FROM e GROUP BY event_type
"""


# ========================================================== burst days
#
# Per-entity burst detection: a (user, day) is a burst when its event
# count exceeds 3x the user's own mean over their ACTIVE days — the
# integer cross-multiplied rule n * n_active_days > 3 * total_events
# (no float rate ever computed). The crawl-telemetry anomaly shape
# (which hosts hammered us, which days).


def q_burst_days(sf_dir: str):
    """(user_id, day, n, burst).

    Scale shape: per-batch (user, day) count combiner -> ONE coarse
    exchange on user_id -> in-task user totals + vectorized flag."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "day": df["ts"].astype("int64").to_numpy() // 86_400_000_000,
            }
        ).groupby(["user_id", "day"], as_index=False).size()
        out.columns = ["user_id", "day", "n"]
        return out.astype(np.int64)

    kd = _with_coarse_group(
        ev.map_batches(partial, batch_format="pandas"), "user_id"
    )

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["user_id", "day"], as_index=False)["n"].sum()
        tot = s.groupby("user_id")["n"].transform("sum").to_numpy(np.int64)
        nd = s.groupby("user_id")["day"].transform("size").to_numpy(np.int64)
        n = s["n"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": s["user_id"].to_numpy(np.int64),
                "day": s["day"].to_numpy(np.int64),
                "n": n,
                "burst": (n * nd > 3 * tot).astype(np.int64),
            }
        )

    return kd.groupby("_g").map_groups(flag, batch_format="pandas")


BURST_DAYS_SQL = """
WITH ud AS (
  SELECT user_id, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, day, n,
  CAST(CASE WHEN n * COUNT(*) OVER (PARTITION BY user_id)
            > 3 * SUM(n) OVER (PARTITION BY user_id)
       THEN 1 ELSE 0 END AS BIGINT) AS burst
FROM ud
"""


# ====================================================== radix quantiles
#
# Mergeable quantile sketch for UNBOUNDED domains: a log2-bucket (radix)
# histogram — at most 64 buckets no matter the value range — with
# integer linear interpolation inside the picked bucket. This is the
# scale path where the exact value-histogram quantile operators
# (length_quantiles / group_quantiles / rank_normalize) stop working:
# their state is O(|distinct values|), this is O(64) with a bounded
# relative error (one power-of-two bucket), deterministic and
# merge-order-independent (bucket counts are sums).

RADIX_QS_BP = [2500, 5000, 7500, 9900]


def radix_hist(values: np.ndarray) -> pd.DataFrame:
    """(b, n) log2-bucket counts of positive int64 values. Exact
    floor(log2) via the frexp exponent (ints < 2^53 are exact in
    float64; np.log2+floor can misround at 2^k-1 boundaries)."""
    v = np.maximum(values.astype(np.int64), 1)
    b = np.frexp(v.astype(np.float64))[1] - 1
    out = pd.DataFrame({"b": b.astype(np.int64)}).groupby("b", as_index=False).size()
    out.columns = ["b", "n"]
    return out.astype(np.int64)


def radix_interp(h: pd.DataFrame, est_col: str) -> pd.DataFrame:
    """(q_bp, bucket, <est_col>) quantile estimates from a merged (b, n)
    radix histogram — integer linear interpolation inside the picked
    bucket."""
    if h.empty:
        return pd.DataFrame(
            {
                "q_bp": pd.Series([], dtype=np.int64),
                "bucket": pd.Series([], dtype=np.int64),
                est_col: pd.Series([], dtype=np.int64),
            }
        )
    h = h.sort_values("b")
    bs = h["b"].to_numpy(np.int64)
    ns = h["n"].to_numpy(np.int64)
    cum = np.cumsum(ns)
    total = int(cum[-1])
    rows = []
    for q in RADIX_QS_BP:
        rk = (total - 1) * q // 10000
        i = int(np.searchsorted(cum, rk, side="right"))  # first cum > rk
        b, n, before = int(bs[i]), int(ns[i]), int(cum[i] - ns[i])
        est = (1 << b) + ((rk - before) * (1 << b)) // n
        rows.append((q, b, est))
    return pd.DataFrame(
        {
            "q_bp": pd.Series([r[0] for r in rows], dtype=np.int64),
            "bucket": pd.Series([r[1] for r in rows], dtype=np.int64),
            est_col: pd.Series([r[2] for r in rows], dtype=np.int64),
        }
    )


def _merge_radix_hist(ds: ray.data.Dataset) -> pd.DataFrame:
    """Merge per-batch (b, n) partials: <= 64 Ray groups by design."""
    from ray.data.aggregate import Sum as _Sum

    h = ds.groupby("b").aggregate(_Sum("n", alias_name="n")).to_pandas()
    return h if not h.empty else pd.DataFrame({"b": [], "n": []})


def q_radix_quantiles(sf_dir: str):
    """(q_bp, bucket, est_cents): radix-sketch quantile estimates of the
    event value in cents.

    Scale shape: per-batch 64-bucket count combiner -> bounded groupby
    -> driver interpolation over 64 rows. Merge = integer vector add,
    so shard/epoch sketches combine exactly (the HLL/CMS property for
    quantiles)."""
    ev = _read(sf_dir, "events", columns=["value"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return radix_hist(cents)

    h = _merge_radix_hist(ev.map_batches(hist, batch_format="pandas"))
    return radix_interp(h, "est_cents")


def _radix_sql(cents_cte: str, est_col: str) -> str:
    """Full radix-quantile SQL given a CTE chain ending in c(cents) —
    shared by radix_quantiles and funnel_latency."""
    qlist = ", ".join(str(q) for q in RADIX_QS_BP)
    return f"""
WITH {cents_cte}, h AS (
  SELECT CAST(strlen(bin(cents)) - 1 AS BIGINT) AS b, COUNT(*) AS n
  FROM c GROUP BY 1
), cumh AS (
  SELECT b, CAST(n AS BIGINT) AS n,
         CAST(SUM(n) OVER (ORDER BY b) AS BIGINT) AS cum
  FROM h
), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h),
qs AS (SELECT unnest([{qlist}]) AS q),
r AS (SELECT q, (total - 1) * q // 10000 AS rk FROM qs, t),
pick AS (
  SELECT r.q, r.rk, MIN(c.b) AS b
  FROM r JOIN cumh c ON c.cum > r.rk GROUP BY 1, 2
)
SELECT CAST(p.q AS BIGINT) AS q_bp, p.b AS bucket,
  CAST((CAST(1 AS BIGINT) << p.b)
       + ((p.rk - (c.cum - c.n)) * (CAST(1 AS BIGINT) << p.b)) // c.n
       AS BIGINT) AS {est_col}
FROM pick p JOIN cumh c ON c.b = p.b
"""


_RADIX_CENTS_CTE = """c AS (
  SELECT GREATEST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT), 1) AS cents
  FROM events
)"""


# ====================================================== funnel latency
#
# Time-to-convert distribution: for every user completing the full
# greedy earliest-chain funnel (corpus_ops.q_funnel_counts semantics),
# the latency from stage-1 to final-stage timestamp, summarized through
# the SAME radix quantile sketch as radix_quantiles — the composition a
# product-analytics pipeline runs ("how long does conversion take at
# p50/p99") with unbounded latencies and bounded sketch state.


def q_funnel_latency(sf_dir: str):
    """(q_bp, bucket, est_us): radix-quantile estimates of the
    signup->purchase latency in microseconds over converting users.

    Scale shape: the funnel chain runs inside ONE coarse user exchange
    (vectorized min-join per stage); each task emits its <= 64-bucket
    latency histogram; bounded merge + driver interpolation."""
    from .corpus_ops import FUNNEL_STAGES

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    kd = _with_coarse_group(ev, "user_id")

    def lat_hist(g: pd.DataFrame) -> pd.DataFrame:
        first = (
            g[g["event_type"] == FUNNEL_STAGES[0]].groupby("user_id")["ts"].min()
        )
        cur = first
        for st in FUNNEL_STAGES[1:]:
            nxt = (
                g.loc[g["event_type"] == st, ["user_id", "ts"]]
                .merge(cur.rename("prev"), left_on="user_id", right_index=True)
                .reset_index(drop=True)
            )
            cur = nxt[nxt["ts"] > nxt["prev"]].groupby("user_id")["ts"].min()
        if cur.empty:
            return pd.DataFrame(
                {"b": pd.Series([], dtype=np.int64), "n": pd.Series([], dtype=np.int64)}
            )
        lat = (
            cur.astype("int64") - first.loc[cur.index].astype("int64")
        ).to_numpy(np.int64)
        return radix_hist(lat)

    h = _merge_radix_hist(
        kd.groupby("_g").map_groups(lat_hist, batch_format="pandas")
    )
    return radix_interp(h, "est_us")


def _funnel_latency_sql() -> str:
    chain = """t1 AS (
  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'signup' GROUP BY 1),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'view' AND e.ts > t1.t GROUP BY 1),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'click' AND e.ts > t2.t GROUP BY 1),
t4 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN t3 ON e.user_id = t3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t3.t GROUP BY 1),
c AS (
  SELECT GREATEST(epoch_us(t4.t) - epoch_us(t1.t), 1) AS cents
  FROM t4 JOIN t1 USING (user_id)
)"""
    return _radix_sql(chain, "est_us")


# ====================================================== minhash error
#
# Sketch-accuracy evaluation: for every surviving MinHash candidate
# pair, the signature-agreement ESTIMATE of Jaccard (n_agree/128) next
# to the EXACT distinct-shingle Jaccard, both in integer basis points —
# the measurement that justifies (or indicts) the sketch parameters
# before a 100 TB dedup run trusts them. Composes the two existing
# operators; the pair sets are identical by construction (same
# min_agree gate), joined through one coarse exchange.


def q_minhash_error(sf_dir: str):
    """(doc_a, doc_b, est_bp, exact_bp, err_bp) per candidate pair;
    err_bp = est - exact (signed).

    Scale shape: q_dedup_verify threads n_agree through its two bucket
    joins (return_agree=True), so the whole evaluation costs exactly ONE
    dedup_verify run plus a stateless map — no second candidate pass,
    no reconciliation exchange (first version ran the machinery twice:
    22 s -> ~10 s at sf0.1)."""
    from ..functions.dedup import N_PERM
    from .ml_queries import q_dedup_verify

    full = q_dedup_verify(sf_dir, return_agree=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        na = df["n_agree"].to_numpy(np.int64)
        ni = df["n_inter"].to_numpy(np.int64)
        nu = df["n_union"].to_numpy(np.int64)
        est = 10000 * na // N_PERM
        ex = np.where(nu > 0, 10000 * ni // np.maximum(nu, 1), 0)
        return pd.DataFrame(
            {
                "doc_a": df["doc_a"].to_numpy(np.int64),
                "doc_b": df["doc_b"].to_numpy(np.int64),
                "est_bp": est,
                "exact_bp": ex,
                "err_bp": est - ex,
            }
        )

    return full.map_batches(finish, batch_format="pandas")


def _minhash_error_sql(min_agree: int = 26) -> str:
    from ..functions.dedup import N_PERM
    from .ml_queries import _dedup_minhash_sql

    base = _dedup_minhash_sql(min_agree)
    needle = "SELECT doc_a, doc_b, n_agree, CAST(0 AS BIGINT) AS n_capped\nFROM agree"
    assert needle in base, (
        "_dedup_minhash_sql's final SELECT was reformatted — update the "
        "splice needle in _minhash_error_sql (review finding: a silent "
        "empty-head rpartition produces an unparseable oracle)"
    )
    head, _, _tail = base.rpartition(needle)
    return (
        head
        + f""", surv AS (
  SELECT doc_a, doc_b, n_agree FROM agree WHERE n_agree >= {min_agree}
),
hd AS (SELECT DISTINCT doc_id, h FROM hh),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM hd GROUP BY doc_id),
ov AS (
  SELECT s.doc_a, s.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM surv s
  JOIN hd a ON a.doc_id = s.doc_a
  JOIN hd b ON b.doc_id = s.doc_b AND b.h = a.h
  GROUP BY 1, 2
), f AS (
  SELECT s.doc_a, s.doc_b,
    CAST(10000 * s.n_agree // {N_PERM} AS BIGINT) AS est_bp,
    CAST(CASE WHEN za.n + zb.n - COALESCE(ov.n_inter, 0) > 0
         THEN 10000 * COALESCE(ov.n_inter, 0)
              // (za.n + zb.n - COALESCE(ov.n_inter, 0))
         ELSE 0 END AS BIGINT) AS exact_bp
  FROM surv s
  LEFT JOIN ov ON ov.doc_a = s.doc_a AND ov.doc_b = s.doc_b
  JOIN sz za ON za.doc_id = s.doc_a
  JOIN sz zb ON zb.doc_id = s.doc_b
)
SELECT doc_a, doc_b, est_bp, exact_bp,
       CAST(est_bp - exact_bp AS BIGINT) AS err_bp
FROM f
"""
    )


# ================================================= join-size estimation
#
# Sampling-based cardinality estimation (the query-planner primitive):
# |orders ⋈ lineitem| = Σ_k a_k·b_k; hashing the join key into a 1/16
# deterministic sample and scaling by 16 gives the estimate a planner
# would use to choose broadcast vs shuffle — emitted NEXT TO the exact
# size so the error is measurable (the minhash_error philosophy applied
# to join planning).

JS_MOD = 16


def q_join_size_estimate(sf_dir: str):
    """One row: (est_rows, exact_rows, err_bp) for orders ⋈ lineitem on
    orderkey; err_bp = 10000*|est-exact|//exact.

    Scale shape: per-batch per-key count combiners on BOTH sides -> ONE
    coarse exchange on the key -> in-task Σ a_k·b_k partials (sampled
    and full) -> bounded 2-scalar reduce. The payload never moves — only
    (key, count) pairs do."""
    o = _read(sf_dir, "orders", columns=["o_orderkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def side_counts(col: str, side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby(col, as_index=False).size()
            out.columns = ["key", "n"]
            out["side"] = np.int8(side)
            return out.astype({"key": np.int64, "n": np.int64})

        return fn

    both = o.map_batches(side_counts("o_orderkey", 0), batch_format="pandas").union(
        li.map_batches(side_counts("l_orderkey", 1), batch_format="pandas")
    )
    kd = _with_coarse_group(both, "key")

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["key", "side"], as_index=False)["n"].sum()
        p = m.pivot_table(index="key", columns="side", values="n", fill_value=0)
        a = p[0].to_numpy(np.int64) if 0 in p.columns else np.zeros(len(p), np.int64)
        b = p[1].to_numpy(np.int64) if 1 in p.columns else np.zeros(len(p), np.int64)
        keys = p.index.to_numpy(np.int64)
        prod = a * b
        sampled = np.array(
            [
                int(hashlib.md5(f"js|{int(k)}".encode("utf-8")).hexdigest()[:16], 16)
                % JS_MOD
                == 0
                for k in keys
            ]
        )
        return pd.DataFrame(
            {
                "exact_part": pd.Series([int(prod.sum())], dtype=np.int64),
                "sample_part": pd.Series(
                    [int(prod[sampled].sum())], dtype=np.int64
                ),
            }
        )

    parts = kd.groupby("_g").map_groups(partial, batch_format="pandas")
    tot = parts.sum(["exact_part", "sample_part"])  # bounded 2-scalar reduce
    exact = int(tot["sum(exact_part)"] or 0)
    est = JS_MOD * int(tot["sum(sample_part)"] or 0)
    err = 10000 * abs(est - exact) // exact if exact else 0
    return pd.DataFrame(
        {
            "est_rows": pd.Series([est], dtype=np.int64),
            "exact_rows": pd.Series([exact], dtype=np.int64),
            "err_bp": pd.Series([err], dtype=np.int64),
        }
    )


JOIN_SIZE_ESTIMATE_SQL = f"""
WITH a AS (SELECT o_orderkey AS key, COUNT(*) AS n FROM orders GROUP BY 1),
b AS (SELECT l_orderkey AS key, COUNT(*) AS n FROM lineitem GROUP BY 1),
j AS (
  SELECT a.key, a.n * b.n AS prod,
    CASE WHEN CAST(concat('0x', substr(md5('js|' || CAST(a.key AS VARCHAR)), 1, 16)) AS UBIGINT)
         % {JS_MOD} = 0 THEN 1 ELSE 0 END AS sampled
  FROM a JOIN b USING (key)
), s AS (
  SELECT CAST(SUM(prod) AS BIGINT) AS exact_rows,
         CAST({JS_MOD} * SUM(prod * sampled) AS BIGINT) AS est_rows
  FROM j
)
SELECT est_rows, exact_rows,
  CAST(CASE WHEN exact_rows > 0
       THEN 10000 * abs(est_rows - exact_rows) // exact_rows
       ELSE 0 END AS BIGINT) AS err_bp
FROM s
"""


# ============================================ content-defined chunking
#
# CDC (rsync/borg/restic-style, public technique): chunk boundaries
# fall where a rolling window's hash hits a divisor condition, so an
# insertion early in a document only re-chunks ONE chunk — the property
# that makes storage-level dedup of near-identical crawls cheap. Window
# hash = md5 of the last CDC_W chars (the md5 hash family standing in
# for a gear/Rabin hash; boundary semantics identical).

CDC_W = 8
CDC_DIV = 64  # expected chunk size ~ CDC_DIV chars


def cdc_boundaries(text: str) -> list[int]:
    """0-based positions i (i >= CDC_W-1) where the window
    text[i-CDC_W+1 : i+1] hashes to 0 mod CDC_DIV — each is the
    INCLUSIVE end of a chunk."""
    out = []
    for i in range(CDC_W - 1, len(text)):
        w = text[i - CDC_W + 1 : i + 1]
        h = int(hashlib.md5(("cdc|" + w).encode("utf-8")).hexdigest()[:16], 16)
        if h % CDC_DIV == 0:
            out.append(i)
    return out


def q_cdc_chunks(sf_dir: str):
    """(doc_id, n_chunks, max_chunk, bounds_md5): chunk count, largest
    chunk length, and md5 of the comma-joined boundary list (pins every
    boundary position exactly).

    Scale shape: pure per-batch map — chunking is embarrassingly
    parallel; the downstream chunk-hash dedup is the dedup_exact
    exchange already demonstrated."""
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        nc, mx, bm = [], [], []
        for t in df["text"].tolist():
            bs = cdc_boundaries(t)
            ends = bs + ([len(t) - 1] if (not bs or bs[-1] != len(t) - 1) else [])
            lens = [ends[0] + 1] + [
                ends[i] - ends[i - 1] for i in range(1, len(ends))
            ]
            nc.append(len(ends) if len(t) else 0)
            mx.append(max(lens) if len(t) else 0)
            bm.append(
                hashlib.md5(",".join(str(b) for b in bs).encode("utf-8")).hexdigest()
            )
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_chunks": pd.Series(nc, dtype=np.int64),
                "max_chunk": pd.Series(mx, dtype=np.int64),
                "bounds_md5": pd.Series(bm, dtype=object),
            }
        )

    return d.map_batches(chunk, batch_format="pandas")


CDC_CHUNKS_SQL = f"""
WITH pos AS (
  -- length() = characters (matches Python indexing); strlen is BYTES
  SELECT doc_id, length(text) AS n, i
  FROM documents, unnest(range({CDC_W - 1}, length(text))) t(i)
  WHERE CAST(concat('0x', substr(md5('cdc|' ||
          substr(text, CAST(i AS INTEGER) - {CDC_W - 2}, {CDC_W})), 1, 16))
        AS UBIGINT) % {CDC_DIV} = 0
), b AS (
  SELECT doc_id, ANY_VALUE(n) AS n,
         list_sort(list(i)) AS bs,
         md5(string_agg(CAST(i AS VARCHAR), ',' ORDER BY i)) AS bounds_md5
  FROM pos GROUP BY doc_id
), withend AS (
  SELECT doc_id, n, bounds_md5,
    CASE WHEN len(bs) = 0 OR bs[-1] <> n - 1
         THEN list_append(bs, n - 1) ELSE bs END AS ends
  FROM b
), lens AS (
  SELECT doc_id, n, bounds_md5, ends,
    list_transform(range(1, len(ends) + 1),
      j -> CASE WHEN j = 1 THEN ends[1] + 1
                ELSE ends[j] - ends[j - 1] END) AS chunk_lens
  FROM withend
)
SELECT d.doc_id AS doc_id,
  CAST(COALESCE(len(l.ends),
       CASE WHEN length(d.text) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_chunks,
  CAST(COALESCE(list_max(l.chunk_lens),
       length(d.text)) AS BIGINT) AS max_chunk,
  COALESCE(l.bounds_md5, md5('')) AS bounds_md5
FROM documents d LEFT JOIN lens l USING (doc_id)
"""


# ===================================================== LRU hit rate
#
# Cache / working-set analysis via the stack-distance equivalence: an
# LRU cache of capacity C hits an access iff FEWER than C distinct
# items were touched since that item's previous access — so per-key
# cache simulation distributes perfectly (each user's stream folds
# independently) and the SQL oracle needs no mutable cache state, only
# a distinct-count between consecutive accesses. The measurement a
# crawl re-fetch cache (or a politeness DNS cache) is sized from.

LRU_CAPACITY = 4


def lru_hits(items: list) -> int:
    """Exact LRU(C) hit count over one access stream (MRU-list sim)."""
    cache: list = []
    hits = 0
    for x in items:
        if x in cache:
            hits += 1
            cache.remove(x)
        elif len(cache) == LRU_CAPACITY:
            cache.pop()  # evict LRU (list is MRU-first)
        cache.insert(0, x)
    return hits


def q_lru_hit_rate(sf_dir: str):
    """(user_id, n_accesses, n_hits, hit_bp): LRU(4) hit statistics of
    each user's event_type access stream ordered by (ts, event_id).

    Scale shape: ONE coarse exchange on user_id; the fold is per-user
    local. The stack-distance identity keeps the oracle declarative."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    kd = _with_coarse_group(ev, "user_id")

    def sim(g: pd.DataFrame) -> pd.DataFrame:
        out_u, out_n, out_h = [], [], []
        for uid, rows in g.groupby("user_id"):
            rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
            h = lru_hits(rows["event_type"].tolist())
            out_u.append(uid)
            out_n.append(len(rows))
            out_h.append(h)
        n = np.array(out_n, dtype=np.int64)
        h = np.array(out_h, dtype=np.int64)
        return pd.DataFrame(
            {
                "user_id": pd.Series(out_u, dtype=np.int64),
                "n_accesses": n,
                "n_hits": h,
                "hit_bp": 10000 * h // np.maximum(n, 1),
            }
        )

    return kd.groupby("_g").map_groups(sim, batch_format="pandas")


LRU_HIT_RATE_SQL = f"""
WITH s AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), p AS (
  SELECT user_id, event_type, rn,
         LAG(rn) OVER (PARTITION BY user_id, event_type ORDER BY rn) AS prev
  FROM s
), h AS (
  SELECT user_id, rn,
    CASE WHEN prev IS NOT NULL AND (
      SELECT COUNT(DISTINCT s2.event_type) FROM s s2
      WHERE s2.user_id = p.user_id AND s2.rn > p.prev AND s2.rn < p.rn
    ) < {LRU_CAPACITY} THEN 1 ELSE 0 END AS hit
  FROM p
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_accesses,
       CAST(SUM(hit) AS BIGINT) AS n_hits,
       CAST(10000 * SUM(hit) // GREATEST(COUNT(*), 1) AS BIGINT) AS hit_bp
FROM h GROUP BY user_id
"""


# ====================================================== late-data audit
#
# Event-time vs processing-time accounting (the Flink/Beam windowing
# concept): each event's ARRIVAL is its event time plus a deterministic
# network delay; a 10-minute tumbling event-time window with 5 minutes
# of allowed lateness DROPS (marks late) every event arriving after
# window_end + 5min — the number that sizes a streaming pipeline's
# lateness allowance before data loss.

LATE_WIN_US = 10 * 60 * 1_000_000
LATE_ALLOW_US = 5 * 60 * 1_000_000
LATE_MAX_DELAY_US = 10 * 60 * 1_000_000


def q_late_data(sf_dir: str):
    """(win, n_events, n_late, late_bp): per event-time window, events
    whose simulated arrival misses the watermark allowance.

    Scale shape: pure per-batch classification + (win) combiner -> one
    bounded-by-time-range groupby (windows, not events, are the key
    domain)."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts"])

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("int64").to_numpy()
        eid = df["event_id"].to_numpy(np.int64)
        delay = np.array(
            [
                int(hashlib.md5(f"lat|{int(i)}".encode("utf-8")).hexdigest()[:16], 16)
                % LATE_MAX_DELAY_US
                for i in eid
            ],
            dtype=np.int64,
        )
        win = t // LATE_WIN_US
        win_end = (win + 1) * LATE_WIN_US
        late = (t + delay > win_end + LATE_ALLOW_US).astype(np.int64)
        out = pd.DataFrame({"win": win, "n": np.int64(1), "late": late})
        g = out.groupby("win", as_index=False).sum()
        return g.astype(np.int64)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("win", as_index=False)[["n", "late"]].sum()
        n = m["n"].to_numpy(np.int64)
        late = m["late"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "win": m["win"].to_numpy(np.int64),
                "n_events": n,
                "n_late": late,
                "late_bp": 10000 * late // np.maximum(n, 1),
            }
        )

    # one Ray group per day of windows keeps group count bounded
    kd = ev.map_batches(classify, batch_format="pandas")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["wb"] = df["win"] % 16
        return df

    return (
        kd.map_batches(bucket, batch_format="pandas")
        .groupby("wb")
        .map_groups(lambda g: merge(g.drop(columns=["wb"])), batch_format="pandas")
    )


LATE_DATA_SQL = f"""
WITH e AS (
  SELECT epoch_us(ts) AS t,
    CAST(concat('0x', substr(md5('lat|' || CAST(event_id AS VARCHAR)), 1, 16)) AS UBIGINT)
      % {LATE_MAX_DELAY_US} AS delay
  FROM events
), c AS (
  SELECT t // {LATE_WIN_US} AS win,
    CASE WHEN t + delay > (t // {LATE_WIN_US} + 1) * {LATE_WIN_US}
              + {LATE_ALLOW_US} THEN 1 ELSE 0 END AS late
  FROM e
)
SELECT CAST(win AS BIGINT) AS win,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(late) AS BIGINT) AS n_late,
  CAST(10000 * SUM(late) // GREATEST(COUNT(*), 1) AS BIGINT) AS late_bp
FROM c GROUP BY win
"""


# =================================================== product quantization
#
# PQ codes (Jégou et al., TPAMI 2011 — public; the IVF-PQ memory story):
# the 64-dim embedding splits into 8 subspaces of 8 dims; each subspace
# quantizes to one of 16 codewords, so a vector compresses 64 floats ->
# 8 nibbles (64x). Codewords are the subvectors of the 16 md5-smallest
# vec_ids (the deterministic-sample trick that made ann_ivf oracle-able);
# assignment is argmin squared L2 with index tie-break (float ties are
# measure-zero, as acknowledged for the other ANN oracles).

PQ_SUBSPACES = 8
PQ_SUBDIM = 8
PQ_CODEWORDS = 16


def _sq_l2_expansion(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise squared L2 as ``a·a − 2 a·b + b·b`` — the SAME
    inner-product expansion the DuckDB oracles evaluate
    (``list_inner_product(a,a) - 2*list_inner_product(a,b) +
    list_inner_product(b,b)``), so near-equal distances are computed
    from the same formula on both engines and don't rank-flip across
    them (ADVICE r3: the direct ``sum((a-b)**2)`` form is not
    IEEE-identical to the expansion). Returns shape (len(a), len(b))."""
    aa = np.einsum("ij,ij->i", a, a)
    bb = np.einsum("ij,ij->i", b, b)
    return aa[:, None] - 2.0 * (a @ b.T) + bb[None, :]


def _pq_codebook(emb: ray.data.Dataset) -> np.ndarray | None:
    """(16, 64) codebook: the subvector source rows are the PQ_CODEWORDS
    vectors with the smallest md5(vec_id) — shuffle-free per-batch prune,
    ONE distributed combine, then an O(PQ_CODEWORDS) driver reduce
    (independent of block count — VERDICT r3 #2); None on an empty
    table. The ONE codebook rule shared by product_quantize and
    pq_recall (review finding: the selection block was duplicated)."""
    import hashlib as _hl

    from .grouping import global_prune

    def cand(df: pd.DataFrame) -> pd.DataFrame:
        md5s = np.array(
            [_hl.md5(str(int(v)).encode()).hexdigest() for v in df["vec_id"]]
        )
        keep = np.argsort(md5s)[:PQ_CODEWORDS]
        return df.iloc[np.sort(keep)][["vec_id", "embedding"]]

    cands = global_prune(emb, cand, batch_format="pandas")
    if cands.empty:  # Ray's empty to_pandas() carries no columns
        return None
    md5s = np.array(
        [_hl.md5(str(int(v)).encode()).hexdigest() for v in cands["vec_id"]]
    )
    order = np.argsort(md5s)[:PQ_CODEWORDS]
    # row index IS the codeword id (= md5 rank, as in the SQL ROW_NUMBER)
    return np.stack(cands.iloc[order]["embedding"].to_numpy()).astype(np.float64)


def q_product_quantize(sf_dir: str):
    """(vec_id, code): the 8-nibble PQ code as 'c0-c1-...-c7'.

    Scale shape: codebook selection is the shuffle-free per-batch md5
    prune + bounded driver reduce (16 rows); the codebook broadcasts
    once; encoding is one vectorized (batch x 16 x 8) distance pass per
    subspace."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    codebook = _pq_codebook(emb)
    if codebook is None:
        return pd.DataFrame(
            {
                "vec_id": pd.Series([], dtype=np.int64),
                "code": pd.Series([], dtype=object),
            }
        )
    cb_ref = ray.put(codebook)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        cb = ray.get(cb_ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        codes = []
        for s in range(PQ_SUBSPACES):
            sl = slice(s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM)
            d2 = _sq_l2_expansion(mat[:, sl], cb[:, sl])
            codes.append(np.argmin(d2, axis=1))  # first min = smallest idx
        code_str = ["-".join(str(int(c[j])) for c in codes) for j in range(len(df))]
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(np.int64),
                "code": pd.Series(code_str, dtype=object),
            }
        )

    return emb.map_batches(encode, batch_format="pandas")


PRODUCT_QUANTIZE_SQL = f"""
WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, e
  FROM d ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {PQ_CODEWORDS}
),
sub AS (SELECT unnest(range({PQ_SUBSPACES})) AS s),
assign AS (
  SELECT vec_id, s, cid FROM (
    SELECT d.vec_id, sub.s, c.cid,
      ROW_NUMBER() OVER (PARTITION BY d.vec_id, sub.s ORDER BY
        list_inner_product(
          d.e[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)],
          d.e[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)])
        - 2 * list_inner_product(
          d.e[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)],
          c.e[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)])
        + list_inner_product(
          c.e[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)],
          c.e[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)])
        ASC, c.cid ASC) AS rn
    FROM d CROSS JOIN sub CROSS JOIN cent c
  ) WHERE rn = 1
)
SELECT vec_id,
       string_agg(CAST(cid AS VARCHAR), '-' ORDER BY s) AS code
FROM assign GROUP BY vec_id
"""


# ======================================================= jl_distortion
#
# Johnson–Lindenstrauss distortion audit of a sign random projection
# (Achlioptas 2003): project each embedding to JL_K dims with the
# deterministic ±1 matrix s(j,i) = 1 − 2·(md5('jl:42:j:i') % 2) and
# report per-vector how far ‖Pv‖²/JL_K lands from ‖v‖² — the check a
# team runs before swapping full embeddings for a cheap sketch in a
# dedup or ANN stage. Coordinates are pre-quantized to thousandths
# (floor(x·1000) on the float64 widening of the stored float32 — the
# repo's CAST(embedding AS DOUBLE[]) convention), so projections, norms
# and the ratio are exact integer arithmetic in both engines.
#
# Scale shape: the (JL_K × dim) sign matrix is built once on the driver
# (512 md5s) and captured by value (tiny); the pass is a single
# streaming map_batches — one (batch × dim)·(dim × JL_K) integer matmul
# per batch, NO shuffle, output one row per vector.

JL_K = 8


def _jl_signs(dim: int) -> np.ndarray:
    from ..stages.multimodal import _md5_64

    return np.array(
        [
            [1 - 2 * (_md5_64(f"jl:42:{j}:{i}") % 2) for i in range(dim)]
            for j in range(JL_K)
        ],
        dtype=np.int64,
    )


def q_jl_distortion(sf_dir: str):
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cols = ["vec_id", "qnorm", "pnorm", "ratio_ppm"]
    signs: dict[int, np.ndarray] = {}

    def project(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(mat * 1000.0).astype(np.int64)
        dim = q.shape[1]
        if dim not in signs:
            signs[dim] = _jl_signs(dim)
        y = q @ signs[dim].T                      # (batch × JL_K)
        qn = (q * q).sum(axis=1)
        pn = (y * y).sum(axis=1)
        ratio = np.where(qn > 0, 1_000_000 * pn // np.maximum(JL_K * qn, 1), 0)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(np.int64),
                "qnorm": qn,
                "pnorm": pn,
                "ratio_ppm": ratio.astype(np.int64),
            }
        )

    return emb.map_batches(project, batch_format="pandas")


JL_DISTORTION_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS vq
  FROM embeddings),
u AS (
  SELECT vec_id, CAST(t.i AS BIGINT) AS i,
         vq[CAST(t.i AS INTEGER)] AS x
  FROM q, unnest(range(1, len(vq) + 1)) AS t(i)),
s AS (
  SELECT CAST(j.j AS BIGINT) AS j, di.i,
         1 - 2 * CAST({_md5u("'jl:42:' || CAST(j.j AS VARCHAR) || ':' || CAST(di.i - 1 AS VARCHAR)")} % 2 AS BIGINT) AS sgn
  FROM (SELECT DISTINCT i FROM u) AS di, range(0, {JL_K}) AS j(j)),
y AS (
  SELECT u.vec_id, s.j, SUM(s.sgn * u.x) AS yj
  FROM u JOIN s ON s.i = u.i GROUP BY 1, 2),
p AS (SELECT vec_id, SUM(yj * yj) AS pnorm FROM y GROUP BY 1),
qn AS (SELECT vec_id, SUM(x * x) AS qnorm FROM u GROUP BY 1)
SELECT CAST(qn.vec_id AS BIGINT) AS vec_id,
       CAST(qn.qnorm AS BIGINT) AS qnorm,
       CAST(COALESCE(p.pnorm, 0) AS BIGINT) AS pnorm,
       CAST(CASE WHEN qn.qnorm > 0
            THEN 1000000 * COALESCE(p.pnorm, 0) // ({JL_K} * qn.qnorm)
            ELSE 0 END AS BIGINT) AS ratio_ppm
FROM qn LEFT JOIN p ON p.vec_id = qn.vec_id
"""


# =================================================== compression ratio
#
# The Gopher/FineWeb compression-quality signal: highly repetitive or
# templated text compresses far below the corpus norm; zlib level 6 is
# deterministic for a given input, so the per-doc ratio is a stable
# filter feature. ROWS-ONLY gate entry: DuckDB has no zlib, so the
# oracle cannot recompute the compressed byte count (the driver checks
# rows + schema; the semantics are pinned by the unit test instead).


def q_compression_ratio(sf_dir: str):
    """(doc_id, raw_len, zlib_len, ratio_bp): deflate-compressed size in
    basis points of the raw UTF-8 size (lower = more repetitive).

    Scale shape: pure per-batch map; zlib state never leaves the task."""
    import zlib as _zlib

    d = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def comp(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        raw = [t.encode("utf-8") for t in df["text"].tolist()]
        zl = np.array(
            [len(_zlib.compress(b, 6)) for b in raw], dtype=np.int64
        )
        rl = np.array([len(b) for b in raw], dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "raw_len": rl,
                "zlib_len": zl,
                "ratio_bp": 10000 * zl // np.maximum(rl, 1),
            }
        )

    return d.map_batches(comp, batch_format="pandas")


# ======================================================== KMV error
#
# Sketch-accuracy evaluation #2 (the minhash_error philosophy applied
# to distinct counting): the KMV estimator (K−1)·2^64 / h_K next to the
# exact distinct count per language, in exact integer arithmetic on both
# engines — measures the sketch before a 100 TB run trusts it for
# capacity planning.

KMV_K = 64
_KMV_2_64 = 1 << 64


def q_kmv_error(sf_dir: str):
    """(lang, n_exact, est, err_bp): integer KMV estimate (exact count
    when the sketch is unsaturated, n < K) vs the exact distinct-token
    count.

    Scale shape: entirely the existing distinct_tokens_kmv operator (its
    exchange moves hashes, never tokens) plus a 5-row map."""
    from .queries import q_distinct_tokens_kmv

    base = q_distinct_tokens_kmv(sf_dir, k=KMV_K)
    df = base.to_pandas() if hasattr(base, "to_pandas") and not isinstance(
        base, pd.DataFrame
    ) else base
    if df.empty:
        return pd.DataFrame(
            {
                "lang": pd.Series([], dtype=object),
                "n_exact": pd.Series([], dtype=np.int64),
                "est": pd.Series([], dtype=np.int64),
                "err_bp": pd.Series([], dtype=np.int64),
            }
        )
    n = df["n_distinct_exact"].to_numpy(np.int64)
    ests = []
    for nx, hk in zip(n, df["kmv_hk"].to_numpy(np.int64)):
        if nx < KMV_K:
            ests.append(int(nx))
        else:
            h_u = int(hk) + (_KMV_2_64 if hk < 0 else 0)
            ests.append((KMV_K - 1) * _KMV_2_64 // h_u)
    est = np.array(ests, dtype=np.int64)
    return pd.DataFrame(
        {
            "lang": df["lang"].to_numpy(),
            "n_exact": n,
            "est": est,
            "err_bp": 10000 * np.abs(est - n) // np.maximum(n, 1),
        }
    )


def _kmv_error_sql() -> str:
    from .queries import DISTINCT_TOKENS_KMV_SQL

    return f"""
WITH base AS ({DISTINCT_TOKENS_KMV_SQL}),
u AS (
  SELECT lang, n_distinct_exact AS n_exact,
    CAST(kmv_hk AS HUGEINT)
      + CASE WHEN kmv_hk < 0 THEN CAST({_KMV_2_64} AS HUGEINT) ELSE 0 END AS h_u
  FROM base
), e AS (
  SELECT lang, n_exact,
    CAST(CASE WHEN n_exact < {KMV_K} THEN n_exact
         ELSE ({KMV_K - 1} * CAST({_KMV_2_64} AS HUGEINT)) // h_u
         END AS BIGINT) AS est
  FROM u
)
SELECT lang, n_exact, est,
  CAST(10000 * abs(est - n_exact) // GREATEST(n_exact, 1) AS BIGINT) AS err_bp
FROM e
"""


# ========================================================== PQ recall
#
# The measurement that justifies PQ compression: asymmetric-distance
# (ADC) top-k — query subvectors against the 8-nibble codes — versus the
# exact L2 top-k, reported as recall@10 per query. Float distance ties
# are measure-zero (the standing ANN-oracle caveat); every rank is
# tie-broken by vec_id on both engines.

PQ_RECALL_K = 10
PQ_RECALL_QUERIES = 5


def q_pq_recall(sf_dir: str):
    """(query_id, n_match, recall_bp): |ADC top-10 ∩ exact top-10| per
    query (query vectors are vec_id < 5; self excluded on both sides).

    Scale shape: codebook + the 5 query vectors broadcast once;
    per-batch ADC and exact distances -> per-batch top-k candidates ->
    bounded (queries x k x blocks) final reduce."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "n_match": pd.Series([], dtype=np.int64),
            "recall_bp": pd.Series([], dtype=np.int64),
        }
    )
    codebook = _pq_codebook(emb)
    if codebook is None:
        return empty
    qdf = (
        emb.filter(lambda r: r["vec_id"] < PQ_RECALL_QUERIES)
        .to_pandas()
        .sort_values("vec_id")
    )
    if qdf.empty:
        return empty
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy(np.int64)
    bc = ray.put((codebook, qmat, qids))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        cb, qm, qi = ray.get(bc)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vids = df["vec_id"].to_numpy(np.int64)
        rows = []
        # exact squared L2 via the oracle's inner-product expansion
        ex = _sq_l2_expansion(qm, mat)
        # ADC: per subspace, assign the codeword (expansion + first-min =
        # cid ASC tie-break) and add the query→codeword distance — the
        # same per-subspace SUM the SQL's `adc` CTE evaluates
        adc = np.zeros((len(qm), len(mat)))
        for s in range(PQ_SUBSPACES):
            sl = slice(s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM)
            codes_s = np.argmin(_sq_l2_expansion(mat[:, sl], cb[:, sl]), axis=1)
            qd = _sq_l2_expansion(qm[:, sl], cb[:, sl])  # (nq, 16)
            adc += qd[:, codes_s]
        for qx in range(len(qi)):
            mask = vids != qi[qx]  # self excluded
            for kind, dist in (("exact", ex[qx]), ("adc", adc[qx])):
                d = dist[mask]
                v = vids[mask]
                o = np.lexsort((v, d))[: PQ_RECALL_K]
                for j in o:
                    rows.append((int(qi[qx]), kind, float(d[j]), int(v[j])))
        return pd.DataFrame(rows, columns=["query_id", "kind", "dist", "vec_id"])

    parts = emb.map_batches(local_topk, batch_format="pandas").to_pandas()
    # bounded: queries x 2 x k x n_blocks rows
    out_q, out_m = [], []
    for qid in sorted(parts["query_id"].unique()):
        sub = parts[parts["query_id"] == qid]
        tops = {}
        for kind in ("exact", "adc"):
            s = sub[sub["kind"] == kind].sort_values(
                ["dist", "vec_id"], kind="mergesort"
            )
            tops[kind] = set(s["vec_id"].head(PQ_RECALL_K))
        out_q.append(int(qid))
        out_m.append(len(tops["exact"] & tops["adc"]))
    m = np.array(out_m, dtype=np.int64)
    return pd.DataFrame(
        {
            "query_id": pd.Series(out_q, dtype=np.int64),
            "n_match": m,
            "recall_bp": 10000 * m // PQ_RECALL_K,
        }
    )


def _pq_recall_sql() -> str:
    sub_expr = (
        lambda col: f"{col}[CAST(sub.s*{PQ_SUBDIM}+1 AS INTEGER):CAST((sub.s+1)*{PQ_SUBDIM} AS INTEGER)]"
    )
    d_e, c_e, q_e = sub_expr("d.e"), sub_expr("c.e"), sub_expr("q.e")
    return f"""
WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, e
  FROM d ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {PQ_CODEWORDS}
),
sub AS (SELECT unnest(range({PQ_SUBSPACES})) AS s),
assign AS (
  SELECT vec_id, s, cid FROM (
    SELECT d.vec_id, sub.s, c.cid,
      ROW_NUMBER() OVER (PARTITION BY d.vec_id, sub.s ORDER BY
        list_inner_product({d_e}, {d_e})
        - 2 * list_inner_product({d_e}, {c_e})
        + list_inner_product({c_e}, {c_e}) ASC, c.cid ASC) AS rn
    FROM d CROSS JOIN sub CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, e FROM d WHERE vec_id < {PQ_RECALL_QUERIES}),
adc AS (
  SELECT q.query_id, a.vec_id, SUM(
      list_inner_product({q_e}, {q_e})
      - 2 * list_inner_product({q_e}, {c_e})
      + list_inner_product({c_e}, {c_e})) AS dist
  FROM q CROSS JOIN sub
  JOIN assign a ON a.s = sub.s
  JOIN cent c ON c.cid = a.cid
  WHERE a.vec_id <> q.query_id
  GROUP BY 1, 2
),
adc_top AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rn
    FROM adc) WHERE rn <= {PQ_RECALL_K}
),
exact_top AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, d.vec_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        list_inner_product(q.e, q.e) - 2 * list_inner_product(q.e, d.e)
        + list_inner_product(d.e, d.e) ASC, d.vec_id ASC) AS rn
    FROM q JOIN d ON d.vec_id <> q.query_id) WHERE rn <= {PQ_RECALL_K}
)
SELECT e.query_id AS query_id,
  CAST(COUNT(a.vec_id) AS BIGINT) AS n_match,
  CAST(10000 * COUNT(a.vec_id) // {PQ_RECALL_K} AS BIGINT) AS recall_bp
FROM exact_top e
LEFT JOIN adc_top a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY 1
"""


# ====================================================== type inference
#
# Schema inference over untyped string data (the CSV/scrape ingest
# problem): classify every value of every virtual column with anchored
# regex classifiers (int / float / ISO date), count conformers, and
# infer the narrowest type that fits ALL values. The corpus builds four
# string columns per doc — pure int, float, date, and a mixed column
# that must correctly DEMOTE to string. Patterns are byte-identical
# between Python re and DuckDB regexp_full_matches, so the oracle checks
# the classifiers themselves, not just the verdicts.

_INT_RE = r"-?[0-9]+"
_FLOAT_RE = r"-?[0-9]+\.[0-9]+"
_DATE_RE = r"[0-9]{4}-[0-9]{2}-[0-9]{2}"


def _virtual_cells(doc_id: int) -> list[tuple[str, str]]:
    return [
        ("a_int", str(doc_id)),
        ("b_float", f"{doc_id % 100}.{doc_id % 7}{doc_id % 3}"),
        ("c_date", f"2024-01-{1 + doc_id % 28:02d}"),
        ("d_mixed", str(doc_id) if doc_id % 2 == 0 else f"w{doc_id}"),
    ]


def q_infer_types(sf_dir: str):
    """(column_name, n_values, n_int_like, n_float_like, n_date_like,
    inferred_type): narrowest type fitting every value (int < float <
    date < string precedence; int-like values are NOT float-like — the
    classifiers are exclusive by pattern).

    Scale shape: per-batch per-column conformity-count combiner (4 rows
    per batch) -> bounded column groupby -> 4-row driver decision."""
    import re as _re

    d = _read(sf_dir, "documents", columns=["doc_id"])
    pats = {
        "n_int_like": _re.compile(_INT_RE),
        "n_float_like": _re.compile(_FLOAT_RE),
        "n_date_like": _re.compile(_DATE_RE),
    }

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, list] = {
            "column_name": [],
            "n_values": [],
            "n_int_like": [],
            "n_float_like": [],
            "n_date_like": [],
        }
        cells: dict[str, list[str]] = {}
        for i in df["doc_id"].to_numpy(np.int64):
            for col, v in _virtual_cells(int(i)):
                cells.setdefault(col, []).append(v)
        for col, vals in cells.items():
            rows["column_name"].append(col)
            rows["n_values"].append(len(vals))
            for key, pat in pats.items():
                rows[key].append(sum(1 for v in vals if pat.fullmatch(v)))
        out = pd.DataFrame(rows)
        return out.astype(
            {
                "n_values": np.int64,
                "n_int_like": np.int64,
                "n_float_like": np.int64,
                "n_date_like": np.int64,
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("column_name", as_index=False)[
            ["n_values", "n_int_like", "n_float_like", "n_date_like"]
        ].sum()
        return out.astype(
            {c: np.int64 for c in out.columns if c != "column_name"}
        )

    h = (
        d.map_batches(counts, batch_format="pandas")
        .groupby("column_name")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )  # bounded: 4 rows
    if h.empty:
        return pd.DataFrame(
            {
                "column_name": pd.Series([], dtype=object),
                "n_values": pd.Series([], dtype=np.int64),
                "n_int_like": pd.Series([], dtype=np.int64),
                "n_float_like": pd.Series([], dtype=np.int64),
                "n_date_like": pd.Series([], dtype=np.int64),
                "inferred_type": pd.Series([], dtype=object),
            }
        )
    n = h["n_values"].to_numpy(np.int64)
    t = np.where(
        h["n_int_like"].to_numpy(np.int64) == n,
        "int",
        np.where(
            h["n_float_like"].to_numpy(np.int64) == n,
            "float",
            np.where(h["n_date_like"].to_numpy(np.int64) == n, "date", "string"),
        ),
    )
    h["inferred_type"] = t
    return h


INFER_TYPES_SQL = f"""
WITH cells AS (
  SELECT 'a_int' AS column_name, CAST(doc_id AS VARCHAR) AS v FROM documents
  UNION ALL
  SELECT 'b_float',
         CAST(doc_id % 100 AS VARCHAR) || '.' || CAST(doc_id % 7 AS VARCHAR)
           || CAST(doc_id % 3 AS VARCHAR)
  FROM documents
  UNION ALL
  SELECT 'c_date', '2024-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
  FROM documents
  UNION ALL
  SELECT 'd_mixed',
         CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id AS VARCHAR)
              ELSE 'w' || CAST(doc_id AS VARCHAR) END
  FROM documents
), c AS (
  SELECT column_name,
    CAST(COUNT(*) AS BIGINT) AS n_values,
    CAST(SUM(CASE WHEN regexp_full_match(v, '{_INT_RE}') THEN 1 ELSE 0 END)
         AS BIGINT) AS n_int_like,
    CAST(SUM(CASE WHEN regexp_full_match(v, '{_FLOAT_RE}') THEN 1 ELSE 0 END)
         AS BIGINT) AS n_float_like,
    CAST(SUM(CASE WHEN regexp_full_match(v, '{_DATE_RE}') THEN 1 ELSE 0 END)
         AS BIGINT) AS n_date_like
  FROM cells GROUP BY 1
)
SELECT column_name, n_values, n_int_like, n_float_like, n_date_like,
  CASE WHEN n_int_like = n_values THEN 'int'
       WHEN n_float_like = n_values THEN 'float'
       WHEN n_date_like = n_values THEN 'date'
       ELSE 'string' END AS inferred_type
FROM c
"""




# ======================================= matryoshka truncation recall

MRL_K = 10
MRL_QUERIES = 5
MRL_TRUNC_DIM = 16


def q_mrl_recall(sf_dir: str, k: int = MRL_K, n_queries: int = MRL_QUERIES,
                 trunc: int = MRL_TRUNC_DIM):
    """(query_id, n_match, recall_bp): recall@10 of TRUNCATED-dimension
    exact search (first 16 of 64 dims — the Matryoshka/MRL serving
    trade: 4x less vector memory and bandwidth) against full-dimension
    exact search. The memory story PQ answers with codebooks, MRL
    answers with prefix truncation; this evaluator quantifies what the
    truncation costs on THIS corpus. Distances use the same
    inner-product expansion as the oracle (_sq_l2_expansion).

    Scale shape: queries broadcast once; per-batch top-k per
    (query, view) -> grouping.global_prune distributed combine -> the
    driver sees ≤ queries x 2 x k rows independent of block count."""
    from .grouping import global_prune

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "n_match": pd.Series([], dtype=np.int64),
            "recall_bp": pd.Series([], dtype=np.int64),
        }
    )
    qdf = emb.filter(lambda r: r["vec_id"] < n_queries).to_pandas()
    if qdf.empty:  # Ray's empty to_pandas() carries no columns
        return empty
    qdf = qdf.sort_values("vec_id")
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy(np.int64)
    bc = ray.put((qmat, qids))

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=np.int64),
                    "kind": pd.Series([], dtype=object),
                    "dist": pd.Series([], dtype=np.float64),
                    "vec_id": pd.Series([], dtype=np.int64),
                }
            )
        qm, qi = ray.get(bc)
        if "embedding" in df.columns:  # first pass: raw embedding rows
            mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            vids = df["vec_id"].to_numpy(np.int64)
            full = _sq_l2_expansion(qm, mat)
            tr = _sq_l2_expansion(qm[:, :trunc], mat[:, :trunc])
            rows = []
            for qx in range(len(qi)):
                mask = vids != qi[qx]  # self excluded
                for kind, dist in (("full", full[qx]), ("trunc", tr[qx])):
                    d_, v = dist[mask], vids[mask]
                    o = np.lexsort((v, d_))[:k]
                    for j in o:
                        rows.append((int(qi[qx]), kind, float(d_[j]), int(v[j])))
            return pd.DataFrame(
                rows, columns=["query_id", "kind", "dist", "vec_id"]
            )
        # combine pass: re-prune already-scored candidate rows per group
        out = (
            df.sort_values(["dist", "vec_id"], kind="mergesort")
            .groupby(["query_id", "kind"], as_index=False, sort=False)
            .head(k)
        )
        return out[["query_id", "kind", "dist", "vec_id"]]

    parts = global_prune(emb, prune, batch_format="pandas")
    if parts.empty:
        return empty
    out_q, out_m = [], []
    for qid in sorted(parts["query_id"].unique()):
        sub = parts[parts["query_id"] == qid]
        tops = {
            kind: set(
                sub[sub["kind"] == kind]
                .sort_values(["dist", "vec_id"], kind="mergesort")["vec_id"]
                .head(k)
            )
            for kind in ("full", "trunc")
        }
        out_q.append(int(qid))
        out_m.append(len(tops["full"] & tops["trunc"]))
    m = np.array(out_m, dtype=np.int64)
    return pd.DataFrame(
        {
            "query_id": pd.Series(out_q, dtype=np.int64),
            "n_match": m,
            "recall_bp": 10000 * m // k,
        }
    )


def _mrl_recall_sql(k: int = MRL_K, n_queries: int = MRL_QUERIES,
                    trunc: int = MRL_TRUNC_DIM) -> str:
    def dist(qe: str, de: str) -> str:
        return (
            f"list_inner_product({qe}, {qe}) - 2 * list_inner_product({qe}, {de})"
            f" + list_inner_product({de}, {de})"
        )

    qt, dt = f"q.e[1:{trunc}]", f"d.e[1:{trunc}]"
    return f"""
WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e FROM d WHERE vec_id < {n_queries}),
full_top AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, d.vec_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id
                         ORDER BY {dist("q.e", "d.e")} ASC, d.vec_id ASC) AS rn
    FROM q JOIN d ON d.vec_id <> q.query_id) WHERE rn <= {k}),
tr_top AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, d.vec_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id
                         ORDER BY {dist(qt, dt)} ASC, d.vec_id ASC) AS rn
    FROM q JOIN d ON d.vec_id <> q.query_id) WHERE rn <= {k})
SELECT f.query_id,
  CAST(COUNT(t.vec_id) AS BIGINT) AS n_match,
  CAST(10000 * COUNT(t.vec_id) // {k} AS BIGINT) AS recall_bp
FROM full_top f
LEFT JOIN tr_top t ON t.query_id = f.query_id AND t.vec_id = f.vec_id
GROUP BY 1
"""


# ============================================ vocabulary drift (df halves)

VOCAB_DRIFT_MIN_DF = 5


def q_vocab_drift(sf_dir: str, min_df: int = VOCAB_DRIFT_MIN_DF):
    """(token, df_a, df_b, drift): document frequency of each token in
    the even-doc_id half vs the odd half of the corpus; drift = 1 when
    the larger side more than doubles the smaller (2*min < max, exact
    integers) — the train/serve distribution-shift check run before
    reusing a tokenizer or filter list on a new crawl. Only tokens with
    df_a + df_b >= min_df (noise floor).

    Scale shape: per-batch per-doc token dedup -> (token, half) partial
    counts -> ONE coarse-hash exchange on token -> in-task sum +
    threshold. Token cardinality never reaches the driver."""
    from .grouping import with_coarse_group as _wcg

    d = _read(sf_dir, "documents", columns=["doc_id", "text"])

    import re as _re

    # the repo's canonical whitespace tokenizer — EXACTLY the oracle's
    # regexp class (str.split also splits on \v / unicode spaces and
    # would silently diverge)
    tok_re = _re.compile(r"[^ \t\n\r\f]+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks, halves = [], []
        for did, txt in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            words = set(tok_re.findall((txt or "").lower()))
            toks.extend(words)
            halves.extend([int(did) % 2] * len(words))
        if not toks:
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype=object),
                    "half": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        g = (
            pd.DataFrame({"token": toks, "half": halves})
            .groupby(["token", "half"], as_index=False)
            .size()
        )
        g.columns = ["token", "half", "n"]
        return g.astype({"half": np.int64, "n": np.int64})

    def drift(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["token", "half"], as_index=False)["n"].sum()
        p = s.pivot_table(index="token", columns="half", values="n",
                          aggfunc="sum", fill_value=0)
        df_a = p[0].to_numpy(np.int64) if 0 in p.columns else np.zeros(len(p), np.int64)
        df_b = p[1].to_numpy(np.int64) if 1 in p.columns else np.zeros(len(p), np.int64)
        keep = (df_a + df_b) >= min_df
        lo = np.minimum(df_a, df_b)[keep]
        hi = np.maximum(df_a, df_b)[keep]
        return pd.DataFrame(
            {
                "token": p.index.to_numpy()[keep],
                "df_a": df_a[keep],
                "df_b": df_b[keep],
                "drift": (2 * lo < hi).astype(np.int64),
            }
        )

    kd = _wcg(d.map_batches(partial, batch_format="pandas"), "token")
    return kd.groupby("_g").map_groups(
        lambda g: drift(g.drop(columns=["_g"])), batch_format="pandas"
    )


def _vocab_drift_sql(min_df: int = VOCAB_DRIFT_MIN_DF) -> str:
    return f"""
WITH t AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(text), '[^ \\t\\n\\r\\f]+')) AS token
  FROM documents),
c AS (
  SELECT token,
         SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS df_a,
         SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS df_b
  FROM t GROUP BY token)
SELECT token, CAST(df_a AS BIGINT) AS df_a, CAST(df_b AS BIGINT) AS df_b,
  CAST(CASE WHEN 2 * LEAST(df_a, df_b) < GREATEST(df_a, df_b)
            THEN 1 ELSE 0 END AS BIGINT) AS drift
FROM c WHERE df_a + df_b >= {min_df}
"""


# ========================================== postings-list compression

POSTINGS_MIN_DF = 5


def q_postings_roundtrip(sf_dir: str, min_df: int = POSTINGS_MIN_DF):
    """(token, n_docs, n_bytes, ok): delta + LEB128-varint compression of
    each token's postings list (tokens with df >= min_df), with ok = 1
    proving decode(encode(gaps)) reproduces the sorted doc ids — the
    inverted-index storage step (Zobel & Moffat 2006). The oracle
    recomputes n_bytes arithmetically (varint length = 7-bit group count
    of each gap), so a single wrong byte anywhere breaks the gate.

    Scale shape: per-batch per-doc token dedup -> ONE coarse-hash
    exchange on token -> per-task fully-vectorized gap/encode/decode
    over every posting of the task at once (np.add.reduceat over run
    boundaries). Vocabulary never reaches the driver."""
    import re as _re

    from ..functions.varint import decode_varints, encode_varints, varint_lengths
    from .grouping import with_coarse_group as _wcg

    d = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tok_re = _re.compile(r"[^ \t\n\r\f]+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks, docs = [], []
        for did, txt in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            words = set(tok_re.findall((txt or "").lower()))
            toks.extend(words)
            docs.extend([int(did)] * len(words))
        return pd.DataFrame(
            {
                "token": pd.Series(toks, dtype=object),
                "doc_id": pd.Series(docs, dtype=np.int64),
            }
        )

    def compress(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        toks = g["token"].to_numpy()
        docs = g["doc_id"].to_numpy(np.int64)
        starts = np.concatenate([[0], np.flatnonzero(toks[1:] != toks[:-1]) + 1])
        counts = np.diff(np.concatenate([starts, [len(toks)]]))
        keep_run = counts >= min_df
        if not keep_run.any():
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype=object),
                    "n_docs": pd.Series([], dtype=np.int64),
                    "n_bytes": pd.Series([], dtype=np.int64),
                    "ok": pd.Series([], dtype=np.int64),
                }
            )
        keep_row = np.repeat(keep_run, counts)
        docs = docs[keep_row]
        starts2 = np.concatenate([[0], np.cumsum(counts[keep_run])[:-1]])
        counts2 = counts[keep_run]
        # gaps: first posting of each run keeps its absolute id
        gaps = np.diff(docs, prepend=0).astype(np.uint64)
        gaps[starts2] = docs[starts2].astype(np.uint64)
        buf = encode_varints(gaps)
        n_bytes = np.add.reduceat(varint_lengths(gaps), starts2).astype(np.int64)
        # decode the WHOLE task buffer and rebuild absolutes per run:
        # global cumsum, then subtract each run's carry-in so the run's
        # first gap acts as its absolute id
        dec = decode_varints(buf).astype(np.int64)
        rebuilt = np.cumsum(dec)
        run_of = np.repeat(np.arange(len(starts2)), counts2)
        carry_in = rebuilt[starts2] - dec[starts2]
        rebuilt = rebuilt - carry_in[run_of]
        ok = np.fromiter(
            (
                bool((rebuilt[s : s + c] == docs[s : s + c]).all())
                for s, c in zip(starts2, counts2)
            ),
            dtype=bool,
            count=len(starts2),
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "token": toks[keep_row][starts2],
                "n_docs": counts2.astype(np.int64),
                "n_bytes": n_bytes,
                "ok": ok,
            }
        )

    kd = _wcg(d.map_batches(partial, batch_format="pandas"), "token")
    return kd.groupby("_g").map_groups(
        lambda g: compress(g.drop(columns=["_g"])), batch_format="pandas"
    )


def _postings_roundtrip_sql(min_df: int = POSTINGS_MIN_DF) -> str:
    return rf"""
WITH t AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(text), '[^ \t\n\r\f]+')) AS token
  FROM documents),
p AS (
  SELECT token, doc_id,
         doc_id - COALESCE(LAG(doc_id) OVER (PARTITION BY token ORDER BY doc_id), 0)
           AS gap
  FROM t),
c AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN gap < 128 THEN 1
                  WHEN gap < 16384 THEN 2
                  WHEN gap < 2097152 THEN 3
                  WHEN gap < 268435456 THEN 4
                  WHEN gap < 34359738368 THEN 5
                  WHEN gap < 4398046511104 THEN 6
                  WHEN gap < 562949953421312 THEN 7
                  WHEN gap < 72057594037927936 THEN 8
                  ELSE 9 END) AS BIGINT) AS n_bytes
  FROM p GROUP BY token)
SELECT token, n_docs, n_bytes, CAST(1 AS BIGINT) AS ok
FROM c WHERE n_docs >= {min_df}
"""


# =============================================== theta-sketch intersection
#
# Set-intersection estimation from mergeable KMV/theta sketches
# (Dasgupta et al., "Theta Sketch Framework", 2016): per language keep
# the K smallest md5 hashes of the repo's 3-word shingles (the
# whitespace-token vocab is only ~31 words in this corpus — shingles
# give ~20k-element sets, so the SATURATED estimator path is exercised,
# not just the exact-copy fallback); for a pair, theta = min of the two
# K-th-smallest values and the estimate is |common sketch hashes below
# theta| * 2^64 / theta. Every piece is a DETERMINISTIC function of the
# data (like kmv_error, unlike HLL registers), so the oracle recomputes
# the sketch AND the exact intersection bit-for-bit.

THETA_K = 64
_THETA_2_64 = 1 << 64


def q_theta_intersect(sf_dir: str, k: int = THETA_K):
    """(lang_a, lang_b, n_inter_exact, est, err_bp) per unordered pair
    of shingle-bearing languages: exact distinct-3-shingle intersection
    vs the theta-sketch estimate.

    Scale shape: ONE exchange of per-batch-distinct (lang, hash) pairs,
    bucketed by HIGH hash bits so buckets partition the hash space —
    per-bucket pair-intersection counts are disjoint (their sum is the
    exact answer) and each bucket's per-lang K-smallest is a superset
    of the global sketch's members in that bucket. Driver sees ≤
    64 × (pairs + langs) bounded rows; shingles never leave their task."""
    from ..functions.dedup import md5_hash64, shingle_strings

    docs = _read(sf_dir, "documents", columns=["lang", "text"])
    empty = pd.DataFrame(
        {
            "lang_a": pd.Series([], dtype=object),
            "lang_b": pd.Series([], dtype=object),
            "n_inter_exact": pd.Series([], dtype=np.int64),
            "est": pd.Series([], dtype=np.int64),
            "err_bp": pd.Series([], dtype=np.int64),
        }
    )

    def batch_hashes(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, g in df.groupby("lang"):
            shingles = set()
            for t in g["text"]:
                shingles.update(shingle_strings(t or ""))
            hs = np.unique(md5_hash64(sorted(shingles)))
            out.append(pd.DataFrame({"lang": lang, "h": hs.view(np.int64)}))
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {"lang": pd.Series([], dtype=object), "h": pd.Series([], dtype=np.int64)}
            )
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy().view(np.uint64)
        return t.append_column("_g", pa.array((h >> np.uint64(58)).view(np.int64)))

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        # kind 0: one row per lang pair with this bucket's EXACT
        # intersection count (buckets are disjoint in hash space);
        # kind 1: one row per lang with the bucket's K smallest hashes
        pres = (
            g.assign(one=1)
            .drop_duplicates(["lang", "h"])
            .pivot_table(index="h", columns="lang", values="one", fill_value=0)
            .astype(bool)
        )
        langs = sorted(pres.columns)
        rows = []
        for i, a in enumerate(langs):
            for b in langs[i + 1 :]:
                rows.append((0, a, b, int((pres[a] & pres[b]).sum()), b""))
        for lang in langs:
            hs = np.sort(
                np.unique(
                    g.loc[g["lang"] == lang, "h"].to_numpy().view(np.uint64)
                )
            )
            rows.append((1, lang, "", 0, hs[:k].tobytes()))
        return pd.DataFrame(
            rows, columns=["kind", "lang_a", "lang_b", "n_inter", "hmin"]
        )

    per_bucket = (
        docs.map_batches(batch_hashes, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(
            lambda g: bucket_stats(g.drop(columns=["_g"])), batch_format="pandas"
        )
        .to_pandas()  # ≤ 64 buckets × (pairs + langs) rows — bounded
    )
    if per_bucket.empty:
        return empty
    sketches: dict[str, np.ndarray] = {}
    for lang, g in per_bucket[per_bucket["kind"] == 1].groupby("lang_a"):
        hs = np.sort(
            np.concatenate([np.frombuffer(b, dtype=np.uint64) for b in g["hmin"]])
        )
        sketches[lang] = hs[:k]
    exact = (
        per_bucket[per_bucket["kind"] == 0]
        .groupby(["lang_a", "lang_b"], as_index=False)["n_inter"]
        .sum()
    )
    exact_map = {
        (r.lang_a, r.lang_b): int(r.n_inter) for r in exact.itertuples()
    }
    langs = sorted(sketches)
    out = []
    for i, a in enumerate(langs):
        for b in langs[i + 1 :]:
            sa, sb = sketches[a], sketches[b]
            theta_a = int(sa[k - 1]) if sa.size >= k else _THETA_2_64
            theta_b = int(sb[k - 1]) if sb.size >= k else _THETA_2_64
            theta = min(theta_a, theta_b)
            common = np.intersect1d(sa, sb)
            c = int((common < np.uint64(min(theta, _THETA_2_64 - 1))).sum()) if theta < _THETA_2_64 else int(common.size)
            est = c * _THETA_2_64 // theta
            n_ex = exact_map.get((a, b), 0)
            out.append(
                (a, b, n_ex, est, 10000 * abs(est - n_ex) // max(n_ex, 1))
            )
    if not out:
        return empty
    return pd.DataFrame(
        out, columns=["lang_a", "lang_b", "n_inter_exact", "est", "err_bp"]
    ).astype({"n_inter_exact": np.int64, "est": np.int64, "err_bp": np.int64})


def _theta_intersect_sql(k: int = THETA_K) -> str:
    return rf"""
WITH w AS (
  SELECT lang, regexp_extract_all(lower(text), '[^ \t\n\r\f]+') AS ws
  FROM documents
),
sh AS (
  SELECT DISTINCT lang, unnest(
    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         ELSE list_transform(range(1, len(ws) - 1),
                             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
    END) AS s
  FROM w WHERE len(ws) > 0
),
h AS (
  SELECT DISTINCT lang,
         CAST(concat('0x', substr(md5(s), 1, 16)) AS UBIGINT) AS hv
  FROM sh
),
ex AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM h a JOIN h b ON a.hv = b.hv AND a.lang < b.lang GROUP BY 1, 2
),
r AS (
  SELECT lang, hv, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM h
),
th AS (
  SELECT lang, CASE WHEN MAX(n) >= {k}
      THEN CAST(MAX(CASE WHEN rn = {k} THEN hv END) AS HUGEINT)
      ELSE CAST({_THETA_2_64} AS HUGEINT) END AS theta
  FROM r GROUP BY lang
),
sk AS (SELECT lang, hv FROM r WHERE rn <= {k}),
cm AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, CAST(COUNT(*) AS HUGEINT) AS c
  FROM sk a JOIN sk b ON a.hv = b.hv AND a.lang < b.lang
  JOIN th ta ON ta.lang = a.lang JOIN th tb ON tb.lang = b.lang
  WHERE CAST(a.hv AS HUGEINT) < LEAST(ta.theta, tb.theta)
  GROUP BY 1, 2
),
pl AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, LEAST(ta.theta, tb.theta) AS th_min
  FROM (SELECT DISTINCT lang FROM h) a
  JOIN (SELECT DISTINCT lang FROM h) b ON a.lang < b.lang
  JOIN th ta ON ta.lang = a.lang JOIN th tb ON tb.lang = b.lang
),
est AS (
  SELECT pl.lang_a, pl.lang_b,
    CAST(COALESCE(ex.n_inter, 0) AS BIGINT) AS n_inter_exact,
    CAST(COALESCE(cm.c, 0) * CAST({_THETA_2_64} AS HUGEINT) // pl.th_min AS BIGINT) AS est
  FROM pl
  LEFT JOIN ex ON ex.lang_a = pl.lang_a AND ex.lang_b = pl.lang_b
  LEFT JOIN cm ON cm.lang_a = pl.lang_a AND cm.lang_b = pl.lang_b
)
SELECT lang_a, lang_b, n_inter_exact, est,
  CAST(10000 * abs(est - n_inter_exact) // GREATEST(n_inter_exact, 1) AS BIGINT) AS err_bp
FROM est
"""


# ======================================================= Bloom-filter FPR
#
# Measured vs structural false-positive rate of a Bloom filter (Bloom
# 1970) whose bit positions are md5-derived — the filter the frontier's
# URL-seen stage would consult — so DuckDB can recompute every SET bit
# and every probe's positions arithmetically and agree on the exact
# false-positive COUNT, not an approximation.

BLOOM_M = 65536  # bits — sized so the sf0.01/sf0.1 member sets neither
# saturate the filter (FPR→1, meaningless) nor vanish (FPR→0 exactly)
BLOOM_J = 2  # hash functions


def q_bloom_fpr(sf_dir: str, m_bits: int = BLOOM_M, j: int = BLOOM_J):
    """One row: (m_bits, j_hashes, n_members, n_neg, n_false_pos,
    fpr_bp). Members = custkeys with ≥1 order; probes = every customer's
    custkey SHIFTED by 10^7 (guaranteed non-members — nearly every raw
    custkey IS a member in this corpus, so unshifted probes would leave
    ~1 negative and no measurable rate); a false positive is a shifted
    probe whose j bits all land on set positions.

    Scale shape: ONE bounded exchange builds the filter (per-batch
    distinct keys → 64 coarse buckets → per-bucket (distinct count,
    OR-bitmap) row — ≤64 rows × (8 B + m/8 B) to the driver); the probe
    pass broadcasts the finished bitmap once via ``ray.put`` and
    reduces (n_probe, n_pass) partials with a distributed aggregate —
    nothing block-count-scaled reaches the driver."""
    from ..functions.dedup import md5_hash64
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def positions(keys: np.ndarray) -> np.ndarray:
        # j rows of bit positions, column per key (string-kernel floor)
        return np.stack(
            [
                md5_hash64([f"bf{i}:{int(x)}" for x in keys])
                % np.uint64(m_bits)
                for i in range(1, j + 1)
            ]
        ).astype(np.int64)

    def member_partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(df["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame({"k": keys, "_g": keys & 63})

    def bucket_bitmap(g: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(g["k"].to_numpy(np.int64))
        bm = np.zeros(m_bits, dtype=bool)
        if keys.size:
            bm[positions(keys).ravel()] = True
        return pd.DataFrame(
            {"n_distinct": [np.int64(keys.size)], "bm": [np.packbits(bm).tobytes()]}
        )

    per_bucket = (
        orders.map_batches(member_partial, batch_format="pandas")
        .groupby("_g")
        .map_groups(
            lambda g: bucket_bitmap(g.drop(columns=["_g"])), batch_format="pandas"
        )
        .to_pandas()  # ≤ 64 bounded rows
    )
    bm = np.zeros(m_bits, dtype=bool)
    n_members = 0
    for r in per_bucket.itertuples():
        n_members += int(r.n_distinct)
        bm |= np.unpackbits(np.frombuffer(r.bm, dtype=np.uint8)).astype(bool)[
            :m_bits
        ]
    bm_ref = ray.put(bm)  # broadcast once; tasks read it zero-copy

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        filt = ray.get(bm_ref)
        keys = df["c_custkey"].to_numpy(np.int64) + 10_000_000
        if keys.size:
            n_pass = int(filt[positions(keys)].all(axis=0).sum())
        else:
            n_pass = 0
        return pd.DataFrame(
            {"n_probe": [np.int64(len(keys))], "n_pass": [np.int64(n_pass)]}
        )

    agg = cust.map_batches(probe, batch_format="pandas").aggregate(
        Sum("n_probe", alias_name="n_probe"), Sum("n_pass", alias_name="n_pass")
    )
    n_probe = int(agg["n_probe"] or 0)
    n_pass = int(agg["n_pass"] or 0)
    n_neg = n_probe  # every shifted probe is a non-member by construction
    n_fp = n_pass
    return pd.DataFrame(
        {
            "m_bits": pd.Series([m_bits], dtype=np.int64),
            "j_hashes": pd.Series([j], dtype=np.int64),
            "n_members": pd.Series([n_members], dtype=np.int64),
            "n_neg": pd.Series([n_neg], dtype=np.int64),
            "n_false_pos": pd.Series([n_fp], dtype=np.int64),
            "fpr_bp": pd.Series([10000 * n_fp // max(n_neg, 1)], dtype=np.int64),
        }
    )


def _bloom_fpr_sql(m_bits: int = BLOOM_M, j: int = BLOOM_J) -> str:
    def md5bit(key_expr: str) -> str:
        return (
            "CAST(concat('0x', substr(md5('bf' || CAST(i AS VARCHAR) || ':' || "
            f"CAST({key_expr} AS VARCHAR)), 1, 16)) AS UBIGINT) % {m_bits}"
        )

    return f"""
WITH m AS (SELECT DISTINCT o_custkey AS k FROM orders),
bits AS (
  SELECT DISTINCT {md5bit('k')} AS bit
  FROM m, range(1, {j + 1}) t(i)
),
pb AS (
  SELECT c_custkey AS k, {md5bit('c_custkey + 10000000')} AS bit
  FROM customer, range(1, {j + 1}) t(i)
),
pass AS (
  SELECT pb.k FROM pb JOIN bits USING (bit) GROUP BY pb.k HAVING COUNT(*) = {j}
),
c AS (
  SELECT (SELECT COUNT(*) FROM m) AS n_members,
         (SELECT COUNT(*) FROM customer) AS n_probe,
         (SELECT COUNT(*) FROM pass) AS n_pass
)
SELECT CAST({m_bits} AS BIGINT) AS m_bits, CAST({j} AS BIGINT) AS j_hashes,
  CAST(n_members AS BIGINT) AS n_members,
  CAST(n_probe AS BIGINT) AS n_neg,
  CAST(n_pass AS BIGINT) AS n_false_pos,
  CAST(10000 * n_pass // GREATEST(n_probe, 1) AS BIGINT) AS fpr_bp
FROM c
"""


# ==================================================== dup_transitivity
#
# Near-dup relation QA: MinHash-LSH "duplicate of" is NOT transitive,
# and chained removal (drop b because a~b, then c because b~c) can
# delete documents arbitrarily far from their cluster canonical. This
# op measures how non-transitive the relation actually is: of all
# wedge instances x–m–y in the dup-pair graph, what fraction has the
# closing edge x–y? (The closure coefficient; low values mean cluster-
# based dedup and pairwise dedup diverge and dedup_clusters' connected
# components are the safer keep rule.)
#
# Scale shape: the pair stream is already survivor-sized; wedges are
# built per center inside one node-keyed exchange (per-center work is
# deg² — dup-cluster degrees are bounded by the LSH bucket cap
# upstream), and closure membership is ONE more unordered-pair-keyed
# tagged-union exchange. The driver sees three counters.

def q_dup_transitivity(sf_dir: str, min_agree: int = 26):
    from .ml_queries import q_dedup_minhash

    pairs = q_dedup_minhash(sf_dir, min_agree=min_agree).materialize()

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"u": pd.Series(dtype=np.int64), "v": pd.Series(dtype=np.int64)}
            )
        return pd.DataFrame(
            {
                "u": np.concatenate(
                    [df["doc_a"].to_numpy(np.int64), df["doc_b"].to_numpy(np.int64)]
                ),
                "v": np.concatenate(
                    [df["doc_b"].to_numpy(np.int64), df["doc_a"].to_numpy(np.int64)]
                ),
            }
        )

    adj = _with_coarse_group(
        pairs.map_batches(sym, batch_format="pandas"), "u"
    )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        out_x, out_y = [], []
        for _, nb in g.groupby("u")["v"]:
            vs = np.sort(nb.to_numpy(np.int64))
            if vs.size < 2:
                continue
            ix, iy = np.triu_indices(vs.size, k=1)
            out_x.append(vs[ix])
            out_y.append(vs[iy])
        if not out_x:
            return pd.DataFrame(
                {
                    "x": pd.Series(dtype=np.int64),
                    "y": pd.Series(dtype=np.int64),
                    "kind": pd.Series(dtype=np.int8),
                }
            )
        return pd.DataFrame(
            {
                "x": np.concatenate(out_x),
                "y": np.concatenate(out_y),
                "kind": np.int8(0),
            }
        )

    wg = adj.groupby("_g").map_groups(wedges, batch_format="pandas")

    def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "x": df["doc_a"].astype("int64"),
                "y": df["doc_b"].astype("int64"),
                "kind": np.int8(1),
            }
        )

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _k=df["x"].astype(str) + ":" + df["y"].astype(str)
        )

    both = _with_coarse_group(
        wg.union(pairs.map_batches(tag_pairs, batch_format="pandas"))
        .map_batches(add_key, batch_format="pandas"),
        "_k",
    )

    def close_counts(g: pd.DataFrame) -> pd.DataFrame:
        closed_keys = set(g.loc[g["kind"] == 1, "_k"])
        w = g[g["kind"] == 0]
        return pd.DataFrame(
            {
                "part_wedges": [np.int64(len(w))],
                "part_closed": [np.int64(w["_k"].isin(closed_keys).sum())],
            }
        )

    agg = (
        both.groupby("_g")
        .map_groups(close_counts, batch_format="pandas")
        .to_pandas()  # ≤ N_COARSE_GROUPS rows
    )
    n_pairs = pairs.count()
    n_w = int(agg["part_wedges"].sum()) if len(agg) else 0
    n_c = int(agg["part_closed"].sum()) if len(agg) else 0
    return pd.DataFrame(
        {
            "n_pairs": [int(n_pairs)],
            "n_wedges": [n_w],
            "n_closed": [n_c],
            "closure_bp": [n_c * 10000 // n_w if n_w else -1],
        }
    ).astype("int64")


def _dup_transitivity_sql(min_agree: int = 26) -> str:
    from .ml_queries import _dedup_minhash_sql

    base = _dedup_minhash_sql(min_agree)
    needle = (
        "SELECT doc_a, doc_b, n_agree, CAST(0 AS BIGINT) AS n_capped\nFROM agree"
    )
    assert needle in base, (
        "_dedup_minhash_sql's final SELECT was reformatted — update the "
        "splice needle in _dup_transitivity_sql"
    )
    head, _, _tail = base.rpartition(needle)
    return (
        head
        + f""", p AS (
  SELECT doc_a, doc_b FROM agree WHERE n_agree >= {min_agree}),
adj AS (SELECT doc_a AS u, doc_b AS v FROM p
        UNION ALL SELECT doc_b, doc_a FROM p),
wg AS (SELECT a.v AS x, b.v AS y
       FROM adj a JOIN adj b ON a.u = b.u AND a.v < b.v),
cl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_closed
       FROM wg JOIN p ON p.doc_a = wg.x AND p.doc_b = wg.y)
SELECT CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_pairs,
       CAST((SELECT COUNT(*) FROM wg) AS BIGINT) AS n_wedges,
       cl.n_closed,
       CAST(CASE WHEN (SELECT COUNT(*) FROM wg) = 0 THEN -1
            ELSE cl.n_closed * 10000 // (SELECT COUNT(*) FROM wg)
            END AS BIGINT) AS closure_bp
FROM cl
"""
    )
