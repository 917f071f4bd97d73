"""Data-valuation operators (round-5 batch 46): exact KNN-Shapley
values (Jia et al., VLDB 2019 — the closed-form Shapley recursion for
KNN surrogates that made per-example valuation tractable), 1-NN
leave-one-out stability (the LOO flip test of Cover & Hart 1967's
rule), and label-centroid separation (the Fisher-style between-class
diagnostic) — the per-example / per-neighbourhood / per-class
triptych of training-data valuation.

Determinism: embeddings quantize per COMPONENT to ⌊1000·x⌋ (the
hard_negatives convention) so every dot product is an exact integer
in both engines; the Shapley recursion is rewritten by Abel summation
into s_i = ind_i·w_i + Σ_{j>i} ind_j·δ_j with w_j = ⌊10⁹/max(j,K)⌋
and δ_j = w_j − w_{j−1} — each term depends only on the row's label
indicator and its GLOBAL rank, never on a neighbouring row, which is
what makes the suffix distributable without halo exchanges.

Scale idioms: knn_shapley is a textbook distributed suffix sum —
(1) a narrow scored projection with contiguous dot-range ids, (2) a
bounded (test × range) count reduce → broadcast rank offsets, (3) a
range-keyed exchange computing per-row terms + per-range term sums
(bounded reduce → broadcast suffix offsets), (4) a second range-keyed
pass adds within-range suffixes. knn_loo prunes per-batch top-2
neighbours per probe (valid prune — scores are row-final) into a
≤2·Q-row reduce; centroid_separation is a #labels-row moment reduce
with exact cross-multiplied rational comparisons.

Reference parity: the reference has no ML surface; these extend the
brief's training-data curation family.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from .grouping import global_prune, with_coarse_group as _with_coarse_group

KS_T = 4  # test points (md5-chosen)
KS_K = 5  # the K of KNN-Shapley
KS_RANGES = 32
LOO_Q = 16  # probes for knn_loo


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _qmat(embs) -> np.ndarray:
    return np.floor(
        np.stack(embs).astype(np.float64) * 1000.0
    ).astype(np.int64)


def _md5_pick(emb: ray.data.Dataset, salt: str, k: int) -> pd.DataFrame:
    """The k vectors with smallest md5('<salt>:<vec_id>') — bounded
    global_prune broadcast (the hard_negatives idiom)."""

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "vec_id" not in df.columns:
            return df
        md5s = np.array(
            [
                hashlib.md5(f"{salt}:{int(v)}".encode()).hexdigest()
                for v in df["vec_id"]
            ]
        )
        return df.iloc[np.sort(np.argsort(md5s)[:k])]

    out = global_prune(emb, prune)
    if out.empty:
        return out
    md5s = np.array(
        [
            hashlib.md5(f"{salt}:{int(v)}".encode()).hexdigest()
            for v in out["vec_id"]
        ]
    )
    return out.iloc[np.argsort(md5s)[:k]].sort_values("vec_id")


# ========================================================= knn_shapley
#
# For each of KS_T test points: the exact KNN-Shapley value of every
# OTHER vector, ×10⁹. Ranks order training points by (integer dot
# desc, vec_id asc) — rank 1 is the nearest neighbour; w and δ are
# pure rank functions (see module doc). Output: (test_id, vec_id,
# rank, shapley_x1e9).


def q_knn_shapley(sf_dir: str):
    empty = pd.DataFrame(
        {
            "test_id": pd.Series(dtype=np.int64),
            "vec_id": pd.Series(dtype=np.int64),
            "rank": pd.Series(dtype=np.int64),
            "shapley_x1e9": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "embeddings") == 0:
        return empty
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    tests = _md5_pick(emb, "ks", KS_T)
    if tests.empty:
        return empty
    t_ids = tests["vec_id"].to_numpy(np.int64)
    t_labels = tests["label"].to_numpy(np.int64)
    t_mat = _qmat(tests["embedding"].to_numpy())

    # (1) narrow scored projection (test_id, vec_id, ind, dotq)
    def score(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "test_id": np.int64,
            "vec_id": np.int64,
            "ind": np.int64,
            "dotq": np.int64,
        }
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in cols.items()}
            )
        ids = df["vec_id"].to_numpy(np.int64)
        labels = df["label"].to_numpy(np.int64)
        mat = _qmat(df["embedding"].to_numpy())
        s = mat @ t_mat.T  # exact integer dots
        frames = []
        for j, (tid, tl) in enumerate(zip(t_ids, t_labels)):
            keep = ids != tid
            frames.append(
                pd.DataFrame(
                    {
                        "test_id": np.full(int(keep.sum()), tid, np.int64),
                        "vec_id": ids[keep],
                        "ind": (labels[keep] == tl).astype(np.int64),
                        "dotq": s[keep, j],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    scored = emb.map_batches(score, batch_format="pandas").materialize()

    # dot range ids: contiguous in the sort key, per test point
    stats = (
        scored.map_batches(
            lambda df: df.groupby("test_id", as_index=False).agg(
                lo=("dotq", "min"), hi=("dotq", "max")
            ),
            batch_format="pandas",
        )
        .groupby("test_id")
        .aggregate(
            ray.data.aggregate.Min("lo"), ray.data.aggregate.Max("hi")
        )
        .to_pandas()
    )
    rng = {
        int(r["test_id"]): (int(r["min(lo)"]), int(r["max(hi)"]))
        for _, r in stats.iterrows()
    }

    def add_range(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        rid = np.empty(len(df), np.int64)
        for tid, (lo, hi) in rng.items():
            m = (df["test_id"] == tid).to_numpy()
            width = (hi - lo) // KS_RANGES + 1
            # descending order: range 0 holds the LARGEST dots
            rid[m] = (hi - df.loc[m, "dotq"].to_numpy(np.int64)) // width
        out["rid"] = rid
        out["key"] = out["test_id"] * KS_RANGES + out["rid"]
        return out

    ranged = scored.map_batches(add_range, batch_format="pandas").materialize()

    # (2) bounded (test, range) counts -> rank offsets
    counts = (
        ranged.map_batches(
            lambda df: df.groupby(["test_id", "rid"], as_index=False)
            .size()
            .rename(columns={"size": "n"}),
            batch_format="pandas",
        )
        .groupby(["test_id", "rid"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= KS_T * KS_RANGES rows
        .sort_values(["test_id", "rid"])
    )
    offsets: dict[tuple, int] = {}
    n_per_test: dict[int, int] = {}
    for tid, g in counts.groupby("test_id"):
        acc = 0
        for _, r in g.iterrows():
            offsets[(int(tid), int(r["rid"]))] = acc
            acc += int(r["n"])
        n_per_test[int(tid)] = acc

    def w_of(rank: np.ndarray) -> np.ndarray:
        return 10**9 // np.maximum(rank, KS_K)

    # (3) per-row terms with global ranks; per-range term sums
    def terms(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        outs = []
        for (tid, rid), grp in t.groupby(["test_id", "rid"]):
            grp = grp.sort_values(
                ["dotq", "vec_id"], ascending=[False, True], kind="mergesort"
            )
            base = offsets[(int(tid), int(rid))]
            rank = base + np.arange(1, len(grp) + 1, dtype=np.int64)
            w = w_of(rank)
            w_prev = np.where(rank > 1, 10**9 // np.maximum(rank - 1, KS_K), 0)
            delta = w - w_prev
            ind = grp["ind"].to_numpy(np.int64)
            outs.append(
                pd.DataFrame(
                    {
                        "test_id": np.full(len(grp), int(tid), np.int64),
                        "rid": np.full(len(grp), int(rid), np.int64),
                        "key": np.full(
                            len(grp),
                            int(tid) * KS_RANGES + int(rid),
                            np.int64,
                        ),
                        "vec_id": grp["vec_id"].to_numpy(np.int64),
                        "rank": rank,
                        "ind": ind,
                        "w": w,
                        "term": ind * delta,
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    c: pd.Series(dtype=np.int64)
                    for c in (
                        "test_id",
                        "rid",
                        "key",
                        "vec_id",
                        "rank",
                        "ind",
                        "w",
                        "term",
                    )
                }
            )
        return pd.concat(outs, ignore_index=True)

    term_rows = (
        _with_coarse_group(ranged, "key")
        .groupby("_g")
        .map_groups(terms, batch_format="pandas")
        .materialize()
    )

    tsums = (
        term_rows.map_batches(
            lambda df: df.groupby(["test_id", "rid"], as_index=False)[
                "term"
            ].sum(),
            batch_format="pandas",
        )
        .groupby(["test_id", "rid"])
        .aggregate(Sum("term", alias_name="term"))
        .to_pandas()  # bounded
        .sort_values(["test_id", "rid"], ascending=[True, False])
    )
    suffix: dict[tuple, int] = {}
    for tid, g in tsums.groupby("test_id"):
        acc = 0
        for _, r in g.sort_values("rid", ascending=False).iterrows():
            suffix[(int(tid), int(r["rid"]))] = acc  # strictly-later ranges
            acc += int(r["term"])

    # (4) within-range suffixes + later-range offsets -> shapley
    def finish(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        outs = []
        for (tid, rid), grp in t.groupby(["test_id", "rid"]):
            grp = grp.sort_values("rank", kind="mergesort")
            term = grp["term"].to_numpy(np.int64)
            # suffix STRICTLY after each row, within range
            suf = np.concatenate(
                (np.cumsum(term[::-1])[::-1][1:], [0])
            )
            s = (
                grp["ind"].to_numpy(np.int64) * grp["w"].to_numpy(np.int64)
                + suf
                + suffix[(int(tid), int(rid))]
            )
            outs.append(
                pd.DataFrame(
                    {
                        "test_id": grp["test_id"].to_numpy(np.int64),
                        "vec_id": grp["vec_id"].to_numpy(np.int64),
                        "rank": grp["rank"].to_numpy(np.int64),
                        "shapley_x1e9": s.astype(np.int64),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    c: pd.Series(dtype=np.int64)
                    for c in ("test_id", "vec_id", "rank", "shapley_x1e9")
                }
            )
        return pd.concat(outs, ignore_index=True)

    return (
        _with_coarse_group(term_rows, "key")
        .groupby("_g")
        .map_groups(finish, batch_format="pandas")
    )


KNN_SHAPLEY_SQL = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000) AS BIGINT)) AS q
  FROM embeddings),
ts AS (SELECT vec_id AS tid, label AS tl, q AS tq FROM e
       ORDER BY md5('ks:' || CAST(vec_id AS VARCHAR)) LIMIT {KS_T}),
scored AS (
  SELECT ts.tid AS test_id, e.vec_id,
         CAST(CASE WHEN e.label = ts.tl THEN 1 ELSE 0 END AS BIGINT)
           AS ind,
         list_inner_product(ts.tq, e.q) AS dotq
  FROM ts JOIN e ON e.vec_id <> ts.tid),
r AS (
  SELECT test_id, vec_id, ind,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY test_id ORDER BY dotq DESC, vec_id ASC
         ) AS BIGINT) AS rank
  FROM scored),
t AS (
  SELECT test_id, vec_id, ind, rank,
         1000000000 // GREATEST(rank, {KS_K}) AS w,
         ind * (1000000000 // GREATEST(rank, {KS_K})
                - CASE WHEN rank > 1
                       THEN 1000000000 // GREATEST(rank - 1, {KS_K})
                       ELSE 0 END) AS term
  FROM r)
SELECT test_id, vec_id, rank,
       CAST(ind * w
            + COALESCE(SUM(term) OVER (
                PARTITION BY test_id ORDER BY rank
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
              ), 0) AS BIGINT) AS shapley_x1e9
FROM t
"""


# ============================================================= knn_loo
#
# 1-NN leave-one-out stability for LOO_Q md5-chosen probes: the
# prediction before (nearest neighbour's label) and after removing
# that neighbour (second-nearest's label), plus the flip flag — the
# certificate that says which predictions hang on a single example.
#
# Scale shape: per-batch top-2 neighbour prune per probe (row-final
# scores make the prune valid) → ≤2-row-per-(probe, block) exchange →
# bounded final reduce.


def q_knn_loo(sf_dir: str):
    empty = pd.DataFrame(
        {
            "probe_id": pd.Series(dtype=np.int64),
            "label": pd.Series(dtype=np.int64),
            "nn1": pd.Series(dtype=np.int64),
            "nn2": pd.Series(dtype=np.int64),
            "correct_before": pd.Series(dtype=np.int64),
            "correct_after": pd.Series(dtype=np.int64),
            "flipped": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "embeddings") == 0:
        return empty
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    probes = _md5_pick(emb, "loo", LOO_Q)
    if probes.empty:
        return empty
    p_ids = probes["vec_id"].to_numpy(np.int64)
    p_labels = probes["label"].to_numpy(np.int64)
    p_mat = _qmat(probes["embedding"].to_numpy())

    def top2(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "p": np.int64,
            "d": np.int64,
            "s": np.int64,
            "dl": np.int64,
        }
        if not len(df):
            return pd.DataFrame(
                {k: pd.Series(dtype=v) for k, v in cols.items()}
            )
        ids = df["vec_id"].to_numpy(np.int64)
        labels = df["label"].to_numpy(np.int64)
        mat = _qmat(df["embedding"].to_numpy())
        s = mat @ p_mat.T
        rows = []
        for j, pid in enumerate(p_ids):
            keep = ids != pid
            dd, sc, ll = ids[keep], s[keep, j], labels[keep]
            order = np.lexsort((dd, -sc))[:2]
            for i in order:
                rows.append((int(pid), int(dd[i]), int(sc[i]), int(ll[i])))
        return pd.DataFrame(rows, columns=list(cols)).astype(cols)

    pruned = emb.map_batches(top2, batch_format="pandas")

    def final2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["s", "d"], ascending=[False, True])
        return g.head(2)

    best = (
        pruned.groupby("p")
        .map_groups(final2, batch_format="pandas")
        .to_pandas()  # <= 2 * LOO_Q rows
    )
    rows = []
    for pid, pl in zip(p_ids, p_labels):
        g = best[best["p"] == pid].sort_values(
            ["s", "d"], ascending=[False, True]
        )
        if len(g) < 2:
            continue
        nn1, nn2 = g.iloc[0], g.iloc[1]
        cb = int(nn1["dl"] == pl)
        ca = int(nn2["dl"] == pl)
        rows.append(
            (
                int(pid),
                int(pl),
                int(nn1["d"]),
                int(nn2["d"]),
                cb,
                ca,
                int(cb != ca),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "probe_id",
            "label",
            "nn1",
            "nn2",
            "correct_before",
            "correct_after",
            "flipped",
        ],
    ).astype(np.int64)


KNN_LOO_SQL = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000) AS BIGINT)) AS q
  FROM embeddings),
ps AS (SELECT vec_id AS pid, label AS pl, q AS pq FROM e
       ORDER BY md5('loo:' || CAST(vec_id AS VARCHAR)) LIMIT {LOO_Q}),
r AS (
  SELECT ps.pid, ps.pl, e.vec_id AS did, e.label AS dl,
         ROW_NUMBER() OVER (
           PARTITION BY ps.pid
           ORDER BY list_inner_product(ps.pq, e.q) DESC, e.vec_id ASC
         ) AS rn
  FROM ps JOIN e ON e.vec_id <> ps.pid)
SELECT a.pid AS probe_id, CAST(a.pl AS BIGINT) AS label,
       a.did AS nn1, b.did AS nn2,
       CAST(CASE WHEN a.dl = a.pl THEN 1 ELSE 0 END AS BIGINT)
         AS correct_before,
       CAST(CASE WHEN b.dl = a.pl THEN 1 ELSE 0 END AS BIGINT)
         AS correct_after,
       CAST(CASE WHEN (a.dl = a.pl) <> (b.dl = a.pl) THEN 1 ELSE 0 END
            AS BIGINT) AS flipped
FROM r a JOIN r b ON b.pid = a.pid AND a.rn = 1 AND b.rn = 2
"""


# =================================================== centroid_separation
#
# Between-class diagnostic: for each label, the squared distance from
# its centroid to the NEAREST other centroid, exactly. Centroids are
# rational (component sums / counts); distances compare through the
# common-denominator expansion
#   |c_a − c_b|² = Σ_k (S_a[k]·n_b − S_b[k]·n_a)² / (n_a·n_b)²
# — integer numerators, so the argmin is exact; the reported
# separation quantizes ×10⁶. Output: (label, n, nearest_label,
# sep_x1e6).
#
# Scale shape: per-batch per-label component-sum partials (#labels ×
# dim bounded) → one bounded reduce → driver pairwise math over the
# #labels² grid.


def q_centroid_separation(sf_dir: str):
    empty = pd.DataFrame(
        {
            "label": pd.Series(dtype=np.int64),
            "n": pd.Series(dtype=np.int64),
            "nearest_label": pd.Series(dtype=np.int64),
            "sep_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "embeddings") == 0:
        return empty
    emb = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "label": pd.Series(dtype=np.int64),
                    "n": pd.Series(dtype=np.int64),
                    "sums": pd.Series(dtype=object),
                }
            )
        mat = _qmat(df["embedding"].to_numpy())
        labels = df["label"].to_numpy(np.int64)
        rows = []
        for lb in np.unique(labels):
            m = labels == lb
            rows.append(
                (
                    int(lb),
                    int(m.sum()),
                    mat[m].sum(axis=0).astype(np.int64).tobytes(),
                )
            )
        return pd.DataFrame(rows, columns=["label", "n", "sums"])

    parts = emb.map_batches(partial, batch_format="pandas").to_pandas()
    # #labels × n_blocks rows — combine exactly on the driver
    agg: dict[int, tuple[int, np.ndarray]] = {}
    for _, r in parts.iterrows():
        lb = int(r["label"])
        v = np.frombuffer(r["sums"], dtype=np.int64)
        n0, s0 = agg.get(lb, (0, np.zeros_like(v)))
        agg[lb] = (n0 + int(r["n"]), s0 + v)
    labels = sorted(agg)
    if len(labels) < 2:
        return empty
    rows = []
    for a in labels:
        na, sa = agg[a]
        best = None
        for b in labels:
            if b == a:
                continue
            nb, sb = agg[b]
            num = sum(
                int(x) * int(x)
                for x in (sa.astype(object) * nb - sb.astype(object) * na)
            )
            # the argmin runs over the PRE-QUANTIZED integer — the
            # same value both engines rank by (no rational ordering)
            sep_q = 10**6 * num // (na * na * nb * nb)
            if best is None or (sep_q, b) < best:
                best = (sep_q, b)
        rows.append((a, na, best[1], best[0]))
    return pd.DataFrame(
        rows, columns=["label", "n", "nearest_label", "sep_x1e6"]
    ).astype(np.int64)


CENTROID_SEPARATION_SQL = """
WITH e AS (
  SELECT label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000) AS BIGINT)) AS q
  FROM embeddings),
dims AS (SELECT CAST(i.i AS INTEGER) AS k
         FROM unnest(range(1, len((SELECT q FROM e LIMIT 1)) + 1)) AS i(i)),
s AS (
  SELECT label, k,
         CAST(SUM(q[k]) AS HUGEINT) AS sk,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e, dims GROUP BY 1, 2),
cn AS (SELECT label, MAX(n) AS n FROM s GROUP BY 1),
pair AS (
  SELECT a.label AS la, b.label AS lb,
         SUM((a.sk * cb.n - b.sk * ca.n) * (a.sk * cb.n - b.sk * ca.n))
           AS num,
         CAST(ca.n AS HUGEINT) * ca.n * cb.n * cb.n AS den
  FROM s a
  JOIN s b ON b.k = a.k AND b.label <> a.label
  JOIN cn ca ON ca.label = a.label
  JOIN cn cb ON cb.label = b.label
  GROUP BY 1, 2, den),
q AS (
  SELECT la, lb, CAST(1000000 * num // den AS BIGINT) AS sep_q
  FROM pair),
best AS (
  SELECT la, lb, sep_q,
         ROW_NUMBER() OVER (
           PARTITION BY la ORDER BY sep_q ASC, lb ASC
         ) AS rn
  FROM q)
SELECT CAST(la AS BIGINT) AS label, cn.n,
       CAST(lb AS BIGINT) AS nearest_label,
       sep_q AS sep_x1e6
FROM best JOIN cn ON cn.label = best.la
WHERE rn = 1
"""


VALUATION_SQL_QUERIES: dict[str, tuple] = {
    "knn_shapley": (q_knn_shapley, KNN_SHAPLEY_SQL),
    "knn_loo": (q_knn_loo, KNN_LOO_SQL),
    "centroid_separation": (q_centroid_separation, CENTROID_SEPARATION_SQL),
}
