"""Corpus-mining operators: redirect-chain resolution by pointer
doubling, DSIR-style hashed n-gram importance scoring, and mergeable
Misra-Gries heavy hitters with an exact second pass.

Reference parity: the crawler resolves HTTP 3xx chains before frontier
insertion (reference: europarl-crawler frontier/url handling); the
importance-resampling and heavy-hitter ops are training-data additions
(DSIR, Xie et al. 2023; Misra-Gries 1982 / Agarwal et al. "Mergeable
Summaries" 2013). All SQL-oracled; scale idioms per pipelines/grouping.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

import pyarrow.compute as pc

from .grouping import with_coarse_group as _with_coarse_group
from .ml_queries import _md5u


def _pending_count(state: ray.data.Dataset) -> int:
    """Scalar count of not-yet-resolved rows via per-block partial sums
    (never collects rows to the driver)."""

    def part(t: pa.Table) -> pa.Table:
        n = pc.sum(pc.cast(pc.invert(t.column("done")), pa.int64())).as_py()
        return pa.table({"n": pa.array([n or 0], pa.int64())})

    res = state.map_batches(part, batch_format="pyarrow").sum("n")
    return int(res or 0)


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _md5_u64(prefix: str, ids: np.ndarray) -> np.ndarray:
    """The repo's md5-uint64 hash family (matches SQL _md5u), vectorized
    over an int array: h = int(md5(prefix||id)[:16], 16)."""
    return np.fromiter(
        (
            int(hashlib.md5(f"{prefix}{int(i)}".encode()).hexdigest()[:16], 16)
            for i in ids
        ),
        dtype=np.uint64,
        count=len(ids),
    )


# ================================================ redirect chain resolution
#
# The synthetic redirect graph over documents: ~2% of pages self-loop
# (classic misconfigured canonical-URL trap), a further ~25% 301 to an
# md5-uniform target page; the rest are terminal content pages. A
# crawler must resolve every chain to its final landing page (or flag
# the loop) before frontier dedup, else each alias is fetched separately.

REDIRECT_HOP_CAP = 32  # chains longer than this are treated as loops
_REDIRECT_ROUNDS = 9  # 2^9 = 512 doubling reach >> any true chain here


def _redirect_nodes(sf_dir: str) -> tuple[ray.data.Dataset, int]:
    docs = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = docs.count()  # parquet metadata, no scan

    def build(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        self_loop = _md5_u64("rcy:", ids) % 50 == 0
        plain = _md5_u64("rdr:", ids) % 4 == 0
        is_r = self_loop | plain
        tgt = (_md5_u64("rtg:", ids) % np.uint64(max(n_docs, 1))).astype(np.int64)
        tgt = np.where(self_loop, ids, tgt)
        # pointer-doubling state: succ = 2^k-step-ahead pointer, dist =
        # hops covered by succ, done = succ is the final landing page
        return pa.table(
            {
                "id": pa.array(ids),
                "orig_r": pa.array(is_r),
                "succ": pa.array(np.where(is_r, tgt, ids)),
                "dist": pa.array(np.where(is_r, 1, 0).astype(np.int64)),
                "done": pa.array(~is_r),
            }
        )

    return docs.map_batches(build, batch_format="pyarrow"), n_docs


def q_redirect_resolve(sf_dir: str):
    """(src_id, final_id, n_hops, status) for every redirect page:
    follow 301 pointers to the terminal page ('ok', hop count) or flag
    chains that do not terminate within REDIRECT_HOP_CAP hops ('cycle',
    final_id = n_hops = -1).

    Scale shape: PARALLEL POINTER DOUBLING, not per-row walking — each
    round every unresolved page jumps to its successor's current
    pointer, so reach doubles per round and the whole frontier resolves
    in O(log L) bucket exchanges (L = longest chain) instead of O(L)
    sequential lookups. Each round is one coarse-hash exchange
    (grouping.py) co-locating lookups with the pointer snapshot; the
    driver only sees the per-round pending COUNT (one scalar aggregate)
    and rounds are capped at 9 (2^9 reach ≫ the 32-hop cap), so cycles
    cannot loop the job."""
    state, _ = _redirect_nodes(sf_dir)
    state = state.materialize()

    def roles(t: pa.Table) -> pa.Table:
        # every node contributes its pointer record as the INDEX role
        # (keyed by id); pending nodes also emit a QUERY role keyed by
        # their current succ — one flat stream, so each round is exactly
        # one exchange with a stable block count (no per-round unions)
        idx = t.append_column("_k", t.column("id")).append_column(
            "_q", pa.array(np.zeros(t.num_rows, dtype=bool))
        )
        pend = t.filter(pc.invert(t.column("done")))
        qry = pend.append_column("_k", pend.column("succ")).append_column(
            "_q", pa.array(np.ones(pend.num_rows, dtype=bool))
        )
        return pa.concat_tables([idx, qry])

    _OUT = ["id", "orig_r", "succ", "dist", "done"]

    def jump(g: pd.DataFrame) -> pd.DataFrame:
        idx = g[~g["_q"]]
        q = g[g["_q"]]
        # done nodes are emitted once, from their index role; pending
        # nodes are emitted once, updated, from their query role
        keep = idx.loc[idx["done"], _OUT]
        if len(q) == 0:
            return keep.reset_index(drop=True)
        rec = idx.set_index("id")[["succ", "dist", "done"]]
        j = q.join(rec, on="succ", rsuffix="_r")
        upd = pd.DataFrame(
            {
                "id": j["id"].to_numpy(np.int64),
                "orig_r": j["orig_r"].to_numpy(bool),
                "succ": j["succ_r"].to_numpy(np.int64),
                "dist": (j["dist"] + j["dist_r"]).to_numpy(np.int64),
                "done": j["done_r"].to_numpy(bool),
            }
        )
        # dist > cap is already a 'cycle' verdict whatever the pointer
        # eventually resolves to (the SQL walk stops at the cap too), so
        # freeze the row — this is what bounds the loop at O(log cap)
        # rounds even when the graph contains real cycles
        upd.loc[upd["dist"] > REDIRECT_HOP_CAP, "done"] = True
        return pd.concat([keep, upd], ignore_index=True)

    for _ in range(_REDIRECT_ROUNDS):
        # cheap scalar: rows still carrying an unresolved pointer
        if _pending_count(state) == 0:
            break
        state = (
            _with_coarse_group(
                state.map_batches(roles, batch_format="pyarrow"), "_k", n=32
            )
            .groupby("_g")
            .map_groups(
                lambda g: jump(g.drop(columns=["_g", "_k"])), batch_format="pandas"
            )
            .materialize()
        )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["orig_r"]]
        ok = df["done"].to_numpy(bool) & (
            df["dist"].to_numpy(np.int64) <= REDIRECT_HOP_CAP
        )
        return pa.table(
            {
                "src_id": pa.array(df["id"].to_numpy(np.int64)),
                "final_id": pa.array(
                    np.where(ok, df["succ"].to_numpy(np.int64), -1)
                ),
                "n_hops": pa.array(
                    np.where(ok, df["dist"].to_numpy(np.int64), -1)
                ),
                "status": pa.array(np.where(ok, "ok", "cycle")),
            }
        )

    return state.map_batches(finish, batch_format="pyarrow")


REDIRECT_RESOLVE_SQL = f"""
WITH RECURSIVE node AS (
  SELECT doc_id,
    ({_md5u("'rcy:' || CAST(doc_id AS VARCHAR)")} % 50 = 0
     OR {_md5u("'rdr:' || CAST(doc_id AS VARCHAR)")} % 4 = 0) AS is_r,
    CASE WHEN {_md5u("'rcy:' || CAST(doc_id AS VARCHAR)")} % 50 = 0 THEN doc_id
         ELSE CAST({_md5u("'rtg:' || CAST(doc_id AS VARCHAR)")}
                   % (SELECT COUNT(*) FROM documents) AS BIGINT)
    END AS tgt
  FROM documents
),
walk AS (
  SELECT doc_id AS src, tgt AS cur, CAST(1 AS BIGINT) AS hops
  FROM node WHERE is_r
  UNION ALL
  SELECT w.src, nd.tgt, w.hops + 1
  FROM walk w JOIN node nd ON nd.doc_id = w.cur
  WHERE nd.is_r AND w.hops < {REDIRECT_HOP_CAP}
),
resolved AS (
  SELECT w.src, w.cur AS final_id, w.hops
  FROM walk w JOIN node nd ON nd.doc_id = w.cur
  WHERE NOT nd.is_r
)
SELECT n0.doc_id AS src_id,
  COALESCE(r.final_id, -1) AS final_id,
  COALESCE(r.hops, -1) AS n_hops,
  CASE WHEN r.src IS NULL THEN 'cycle' ELSE 'ok' END AS status
FROM node n0 LEFT JOIN resolved r ON r.src = n0.doc_id
WHERE n0.is_r
"""


# ======================================= DSIR hashed importance resampling
#
# Data Selection via Importance Resampling (Xie et al. 2023): score each
# raw document by how much its hashed n-gram profile resembles a curated
# target corpus, then keep the top slice. This integer-exact variant
# scores each token occurrence by the target's share of that feature
# bucket, floor(1e6 * cnt_target / cnt_all) — rank-equivalent to the
# target/raw probability ratio, but IEEE-free so the oracle is exact.

DSIR_BUCKETS = 4096
DSIR_TOPK = 100
_DSIR_SCALE = 1_000_000


def _dsir_target_mask(ids: np.ndarray) -> np.ndarray:
    # stand-in for the curated target corpus: a deterministic 1/8 sample
    return _md5_u64("dsirT:", ids) % 8 == 0


class _DsirTokens:
    """Per-batch tokenize + feature-hash, with a per-actor cache of
    token→bucket (vocab is heavy-tailed: the cache hits almost always)."""

    def __init__(self):
        self._cache: dict[str, np.uint64] = {}

    def buckets(self, toks: pd.Series) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(toks), dtype=np.uint64)
        for i, tok in enumerate(toks.to_numpy()):
            b = cache.get(tok)
            if b is None:
                b = (
                    int(hashlib.md5(f"dsirF:{tok}".encode()).hexdigest()[:16], 16)
                    % DSIR_BUCKETS
                )
                cache[tok] = b
            out[i] = b
        return out

    @staticmethod
    def explode(df: pd.DataFrame) -> pd.Series:
        return (
            df.set_index("doc_id")["text"]
            .str.lower()
            .str.findall(r"[^ \t\n\r\f]+")
            .explode()
            .dropna()
        )


def q_dsir_score(sf_dir: str):
    """(doc_id, score): DSIR-style target-affinity score per document;
    top-{DSIR_TOPK} by (score DESC, doc_id). Docs with no tokens score 0.

    Scale shape: pass 1 builds the per-bucket (cnt_all, cnt_target)
    table — per-batch combiner rows are bounded by the FIXED bucket
    space (4096), so the repartition(1) merge and the driver collect are
    O(buckets), independent of corpus size. The bucket table is then
    ray.put-broadcast once and pass 2 rescans documents scoring each
    batch vectorized against the shared arrays; the top-k leaves via the
    per-block-prune → single-combine path (grouping.global_prune
    contract). No shuffle touches a data-scaled key."""
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tok = _DsirTokens()

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = tok.explode(df)
        if len(toks) == 0:
            return pd.DataFrame(
                {
                    "f": pd.Series(dtype=np.int64),
                    "part_a": pd.Series(dtype=np.int64),
                    "part_t": pd.Series(dtype=np.int64),
                }
            )
        f = tok.buckets(toks).astype(np.int64)
        is_t = _dsir_target_mask(toks.index.to_numpy().astype(np.int64))
        g = pd.DataFrame({"f": f, "part_a": 1, "part_t": is_t.astype(np.int64)})
        out = g.groupby("f", as_index=False).sum()
        return out.astype({"f": np.int64, "part_a": np.int64, "part_t": np.int64})

    def bucket_merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return df.groupby("f", as_index=False)[["part_a", "part_t"]].sum()

    partial = d.map_batches(bucket_partial, batch_format="pandas")
    merged = (
        partial.repartition(1).map_batches(bucket_merge, batch_format="pandas")
    ).to_pandas()

    cnt_a = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    cnt_t = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    if len(merged):
        cnt_a[merged["f"].to_numpy(np.int64)] = merged["part_a"].to_numpy(np.int64)
        cnt_t[merged["f"].to_numpy(np.int64)] = merged["part_t"].to_numpy(np.int64)
    stats_ref = ray.put((cnt_a, cnt_t))

    class Scorer:
        def __init__(self):
            self.cnt_a, self.cnt_t = ray.get(stats_ref)
            self.tok = _DsirTokens()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            toks = self.tok.explode(df)
            base = pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(np.int64),
                    "score": np.zeros(len(df), dtype=np.int64),
                }
            )
            if len(toks) == 0:
                return base
            f = self.tok.buckets(toks).astype(np.int64)
            contrib = _DSIR_SCALE * self.cnt_t[f] // self.cnt_a[f]
            per_doc = (
                pd.DataFrame({"doc_id": toks.index.to_numpy(np.int64), "c": contrib})
                .groupby("doc_id")["c"]
                .sum()
            )
            base["score"] = (
                base["doc_id"].map(per_doc).fillna(0).to_numpy(np.int64)
            )
            return base

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "score" not in df.columns:
            # repartition(1) of an empty dataset hands the prune fn a
            # column-less empty frame (grouping.global_prune contract)
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype=np.int64),
                    "score": pd.Series(dtype=np.int64),
                }
            )
        return df.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(DSIR_TOPK)

    from .grouping import global_prune

    # autoscaling pool: a FIXED pool of size >= the session's CPU count
    # would reserve every core and starve the downstream repartition
    # (observed as a live-lock under the 4-CPU test fixture)
    scored = d.map_batches(Scorer, batch_format="pandas", concurrency=(1, 4))
    return global_prune(scored, prune)


DSIR_SCORE_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[^ \t\n\r\f]+')) AS token
  FROM documents
),
feat AS (
  SELECT doc_id,
         CAST({_md5u("'dsirF:' || token")} % {DSIR_BUCKETS} AS BIGINT) AS f
  FROM tok
),
cnts AS (
  SELECT f,
    CAST(COUNT(*) AS BIGINT) AS cnt_a,
    CAST(COUNT(*) FILTER (
      WHERE {_md5u("'dsirT:' || CAST(doc_id AS VARCHAR)")} % 8 = 0
    ) AS BIGINT) AS cnt_t
  FROM feat GROUP BY f
),
scored AS (
  SELECT feat.doc_id,
         SUM({_DSIR_SCALE} * c.cnt_t // c.cnt_a) AS score
  FROM feat JOIN cnts c USING (f) GROUP BY feat.doc_id
)
SELECT d.doc_id, CAST(COALESCE(s.score, 0) AS BIGINT) AS score
FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
ORDER BY score DESC, d.doc_id ASC
LIMIT {DSIR_TOPK}
"""


# ====================================== Misra-Gries heavy hitters (exact)
#
# Stream = a deterministic Zipf(~2) item stream derived from event_id:
# item = M // (1 + md5u('hh:'||event_id) % M), so P(item=j) ~ 1/(j(j+1))
# — item 1 carries ~half the stream, the tail is ~10^6 distinct items.
# A Misra-Gries summary per block (exact in-block counts truncated to k
# counters by subtracting the (k+1)-th largest) is MERGEABLE with
# undercount <= N/(k+1) (Agarwal et al. 2013), so the merged candidate
# set provably contains every item with true frequency > N/k; a second
# exact pass restricted to the candidates makes the output EXACT.

HH_M = 1 << 20
HH_K = 64
_HH_CAPACITY = 2 * HH_K  # summary capacity; extra margin over the bound


def _hh_items(event_ids: np.ndarray) -> np.ndarray:
    h = _md5_u64("hh:", event_ids) % np.uint64(HH_M)
    return (np.uint64(HH_M) // (h + np.uint64(1))).astype(np.int64)


def _mg_truncate(df: pd.DataFrame, cap: int = _HH_CAPACITY) -> pd.DataFrame:
    """Reduce exact/merged (item, part_n) counts to a Misra-Gries
    summary of <= cap counters: sum per item, subtract the (cap+1)-th
    largest count from all, keep positive."""
    if len(df) == 0 or "item" not in df.columns:
        return pd.DataFrame(
            {"item": pd.Series(dtype=np.int64), "part_n": pd.Series(dtype=np.int64)}
        )
    g = df.groupby("item", as_index=False)["part_n"].sum()
    if len(g) > cap:
        counts = np.sort(g["part_n"].to_numpy(np.int64))[::-1]
        off = counts[cap]
        g["part_n"] = g["part_n"] - off
        g = g[g["part_n"] > 0]
    return g.astype({"item": np.int64, "part_n": np.int64})


def q_heavy_hitters(sf_dir: str):
    """(item, cnt): EXACT counts of every stream item with frequency
    > N/{HH_K}, found without ever shuffling the full item space.

    Scale shape: pass 1 builds a per-block Misra-Gries summary (exact
    in-block value_counts truncated to 2k counters — a vectorized
    sort/subtract, no Python loop) and merges the O(blocks * k) summary
    rows in one repartition(1) task, so the driver receives <= 2k
    candidate rows regardless of stream size. The mergeable-summary
    bound guarantees the candidates cover all true heavy hitters; pass 2
    re-scans with the candidate set broadcast (ray.put once) and counts
    ONLY candidate items exactly — per-block partials are <= 2k rows, so
    the final merge is O(blocks * k) again, never O(distinct items)."""
    ev = _read(sf_dir, "events", columns=["event_id"])
    n_total = ev.count()

    def mg_partial(df: pd.DataFrame) -> pd.DataFrame:
        items = _hh_items(df["event_id"].to_numpy().astype(np.int64))
        vc = pd.Series(items).value_counts()
        return _mg_truncate(
            pd.DataFrame(
                {"item": vc.index.to_numpy(np.int64), "part_n": vc.to_numpy(np.int64)}
            )
        )

    candidates = (
        ev.map_batches(mg_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(_mg_truncate, batch_format="pandas")
        .to_pandas()
    )
    if "item" not in candidates.columns:  # zero-block input
        candidates = _mg_truncate(pd.DataFrame())
    cand_ref = ray.put(np.sort(candidates["item"].to_numpy(np.int64)))

    class ExactPass:
        def __init__(self):
            self.cand = ray.get(cand_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            items = _hh_items(df["event_id"].to_numpy().astype(np.int64))
            keep = items[np.isin(items, self.cand)]
            vc = pd.Series(keep).value_counts()
            return pd.DataFrame(
                {"item": vc.index.to_numpy(np.int64), "cnt": vc.to_numpy(np.int64)}
            )

    def exact_merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "item" not in df.columns:
            return pd.DataFrame(
                {"item": pd.Series(dtype=np.int64), "cnt": pd.Series(dtype=np.int64)}
            )
        return df.groupby("item", as_index=False)["cnt"].sum()

    exact = (
        ev.map_batches(ExactPass, batch_format="pandas", concurrency=(1, 4))
        .repartition(1)
        .map_batches(exact_merge, batch_format="pandas")
        .to_pandas()
    )
    if "item" not in exact.columns:
        exact = pd.DataFrame(
            {"item": pd.Series(dtype=np.int64), "cnt": pd.Series(dtype=np.int64)}
        )
    out = exact[exact["cnt"].to_numpy(np.int64) * HH_K > n_total]
    return (
        out.sort_values(["cnt", "item"], ascending=[False, True], kind="mergesort")
        .reset_index(drop=True)
        .astype({"item": np.int64, "cnt": np.int64})
    )


HEAVY_HITTERS_SQL = f"""
WITH stream AS (
  SELECT CAST(
    CAST({HH_M} AS UBIGINT)
    // (CAST(1 AS UBIGINT) + {_md5u("'hh:' || CAST(event_id AS VARCHAR)")} % {HH_M})
  AS BIGINT) AS item
  FROM events
),
c AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt FROM stream GROUP BY item)
SELECT item, cnt FROM c
WHERE cnt * {HH_K} > (SELECT COUNT(*) FROM events)
ORDER BY cnt DESC, item ASC
"""


MINING_SQL_QUERIES: dict[str, tuple] = {
    "redirect_resolve": (q_redirect_resolve, REDIRECT_RESOLVE_SQL),
    "dsir_score": (q_dsir_score, DSIR_SCORE_SQL),
    "heavy_hitters": (q_heavy_hitters, HEAVY_HITTERS_SQL),
}
