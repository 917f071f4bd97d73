"""Graph/embedding geometry operators (round-5 batch 31): TWO-NN
intrinsic-dimension ratios of the embedding space (Facco et al. 2017),
the double-sweep BFS diameter lower bound (Magnien-Latapy-Habib 2009),
and the Molloy-Reed percolation criterion κ = Σk²/Σk (Molloy & Reed
1995; Cohen et al. 2000) — the three geometry numbers that size ANN
index parameters, BFS frontier budgets, and robustness expectations
before a 100-TB run.

Scale idioms: TWO-NN is batched integer squared-L2 against the
broadcast quantized matrix (the hubness/knn brute-force baseline;
IVF-bucketed at 10^10); the double sweep reuses the actor-Pregel BFS
(edges resident, frontier-only messages) twice with a distance column
and argmax-by-global_prune between sweeps; κ is one coarse exchange
of degree partials with a driver reduce over ≤256 task partials.

Reference parity: the reference has no graph or vector surface
(europarl/ is a crawler + Postgres rows); these extend the brief's
similarity-search and link-analysis families.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .grouping import global_prune, with_coarse_group as _with_coarse_group
from .ml_queries import _md5u


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


_LNK_MD5U = _md5u("'lnkk:42:' || CAST(doc_id AS VARCHAR)")

# shared undirected-edge CTE (self-loops dropped, both directions) —
# the attack_tolerance convention
_UND_EDGES_CTE = f"""
n AS (SELECT COUNT(*) AS cnt FROM documents),
kk AS (SELECT doc_id, CAST(1 + {_LNK_MD5U} % 4 AS BIGINT) AS k FROM documents),
e0 AS (
  SELECT doc_id AS src, (doc_id * 37 + j * 101) % cnt AS dst
  FROM (SELECT doc_id, unnest(range(1, k + 1)) AS j FROM kk), n
  WHERE (doc_id * 37 + j * 101) % cnt <> doc_id),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)
"""


# ==================================================== twonn_intrinsic_dim
#
# TWO-NN intrinsic-dimension ratios (Facco, Rodriguez, Laio, d'Errico
# 2017): for each vector, the squared distances to its first and
# second nearest neighbours and the exact integer ratio
# mu_sq_ppm = d2² · 10⁶ // d1² — the per-point statistic whose
# Pareto fit gives the manifold's intrinsic dimension (ID ≈
# 2·ln2 / ln(median μ²)). High ratios mean low intrinsic dimension
# (ANN indexes work); ratios near 1 mean distance concentration.
# Exact-duplicate anchors (d1² = 0) report −1.
#
# Scale shape: batched integer squared-L2 (floor(x·1000) components,
# a·a − 2a·b + b·b expansion) against the broadcast quantized matrix;
# ties broken (d² ASC, vec_id ASC) identically on both engines via
# stable argsort / ROW_NUMBER.


def q_twonn_intrinsic_dim(sf_dir: str):
    from .vectoraudit_ops import _quantized_matrix

    ids, mat = _quantized_matrix(sf_dir)
    empty = pd.DataFrame(
        {
            "vec_id": pd.Series(dtype=np.int64),
            "d1_sq": pd.Series(dtype=np.int64),
            "d2_sq": pd.Series(dtype=np.int64),
            "mu_sq_ppm": pd.Series(dtype=np.int64),
        }
    )
    if len(ids) < 3:
        return empty
    na2 = (mat * mat).sum(axis=1)
    ref = ray.put((ids, mat, na2))
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    big = np.int64(2**62)

    def two_nn(df: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat, all_na2 = ray.get(ref)
        qids = df["vec_id"].to_numpy(np.int64)
        qmat = np.floor(
            np.stack(df["embedding"].to_numpy()).astype(np.float64) * 1000.0
        ).astype(np.int64)
        qna2 = (qmat * qmat).sum(axis=1)
        # dsq[i, j] = |q_i - all_j|²  (int64-safe: <= dim · (2·10³)²)
        dsq = qna2[:, None] - 2 * (qmat @ all_mat.T) + all_na2[None, :]
        # exclude self; all_ids ascending => stable sort ties = id ASC
        dsq[qids[:, None] == all_ids[None, :]] = big
        order = np.argsort(dsq, axis=1, kind="stable")
        r = np.arange(len(qids))
        d1 = dsq[r, order[:, 0]]
        d2 = dsq[r, order[:, 1]]
        mu = np.where(d1 > 0, d2 * 1_000_000 // np.maximum(d1, 1), -1)
        return pd.DataFrame(
            {
                "vec_id": qids,
                "d1_sq": d1.astype(np.int64),
                "d2_sq": d2.astype(np.int64),
                "mu_sq_ppm": mu.astype(np.int64),
            }
        )

    return emb.map_batches(two_nn, batch_format="pandas")


TWONN_INTRINSIC_DIM_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000) AS BIGINT)) AS qv
  FROM embeddings),
p AS (
  SELECT a.vec_id AS va,
         CAST(list_inner_product(a.qv, a.qv)
              - 2 * list_inner_product(a.qv, b.qv)
              + list_inner_product(b.qv, b.qv) AS BIGINT) AS dsq,
         b.vec_id AS vb
  FROM q a JOIN q b ON a.vec_id <> b.vec_id),
rk AS (
  SELECT va, dsq,
         ROW_NUMBER() OVER (PARTITION BY va ORDER BY dsq ASC, vb ASC) AS r
  FROM p)
SELECT va AS vec_id,
       CAST(MAX(CASE WHEN r = 1 THEN dsq END) AS BIGINT) AS d1_sq,
       CAST(MAX(CASE WHEN r = 2 THEN dsq END) AS BIGINT) AS d2_sq,
       CAST(CASE WHEN MAX(CASE WHEN r = 1 THEN dsq END) > 0
            THEN MAX(CASE WHEN r = 2 THEN dsq END) * 1000000
                 // MAX(CASE WHEN r = 1 THEN dsq END)
            ELSE -1 END AS BIGINT) AS mu_sq_ppm
FROM rk WHERE r <= 2 GROUP BY va
"""


# ================================================= diameter_double_sweep
#
# Double-sweep BFS diameter lower bound (Magnien, Latapy, Habib 2009):
# BFS from a fixed pivot to its farthest node F (ties → smallest id),
# then BFS from F — F's eccentricity is the classic tight diameter
# lower bound at two-BFS cost, where the exact diameter needs n BFS
# runs. Output: one row per sweep with (start, farthest, eccentricity,
# nodes reached) over the undirected link graph.
#
# Scale shape: each sweep is the actor-Pregel BFS (adjacency loads
# once per sweep, frontier-only messages, per-round bytes = frontier
# size); the farthest-node argmax between sweeps goes through
# global_prune — O(1) driver rows regardless of block count. Both
# engines cap depth at DDS_CAP (64); the BFS converges far earlier on
# any web-like graph and the engine raises if it does not.

DDS_CAP = 64
_DDS_NB = 16


def _bfs_distances(sf_dir: str, pivot: int, n_docs: int):
    """Run one distance-tracking BFS; returns the roster Dataset with
    columns (n1=node, dist; dist −1 = unreached)."""
    from .pregel import pregel_actor_loop
    from .queries import internal_edges_np

    mask = _DDS_NB - 1
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def seed_rows(t: pa.Table) -> pd.DataFrame:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        src, dst = internal_edges_np(ids, n_docs, drop_self=True)
        n1 = np.concatenate([src, dst, ids])
        n2 = np.concatenate([dst, src, np.full(len(ids), -1, np.int64)])
        kind = np.concatenate(
            [np.zeros(2 * len(src), np.int8), np.ones(len(ids), np.int8)]
        )
        return pd.DataFrame(
            {
                "kind": kind,
                "n1": n1,
                "n2": n2,
                "dist": np.full(len(n1), -1, np.int64),
                "b": (n1 & mask),
            }
        )

    def bfs_step(actor_id, n_actors_, state, msgs, round_i):
        if state is None or not len(state):
            return state, None, 0
        edges = state[state["kind"] == 0]
        roster = state[state["kind"] == 1].copy()
        nodes = roster["n1"].to_numpy(np.int64)
        if round_i == 0:
            gained = nodes[nodes == pivot]
        else:
            if msgs is None or not len(msgs):
                return state, None, 0
            m = np.unique(msgs["node"].to_numpy(np.int64))
            unseen = nodes[roster["dist"].to_numpy(np.int64) < 0]
            gained = np.intersect1d(m, unseen)
        if len(gained) == 0:
            return state, None, 0
        roster.loc[roster["n1"].isin(gained), "dist"] = np.int64(round_i)
        nb = np.unique(
            edges.loc[edges["n1"].isin(gained), "n2"].to_numpy(np.int64)
        )
        out = pd.DataFrame({"b": nb & mask, "node": nb}) if len(nb) else None
        return (
            pd.concat([edges, roster], ignore_index=True),
            out,
            len(gained),
        )

    state_ds, converged, _ = pregel_actor_loop(
        d.map_batches(seed_rows, batch_format="pyarrow"),
        bfs_step,
        key="b",
        max_iters=DDS_CAP,
        n_actors=_DDS_NB,
    )
    if not converged:
        raise RuntimeError("diameter_double_sweep: BFS did not converge")
    return state_ds


def _sweep(sf_dir: str, pivot: int, n_docs: int):
    """(farthest_node, ecc, n_reached) of one BFS from ``pivot``."""
    state_ds = _bfs_distances(sf_dir, pivot, n_docs)
    if state_ds is None:
        return pivot, 0, 0

    def prune_far(df: pd.DataFrame) -> pd.DataFrame:
        t = df[(df["kind"] == 1) & (df["dist"] >= 0)]
        if not len(t):
            return t
        t = t.sort_values(["dist", "n1"], ascending=[False, True])
        return t.head(1)

    far = global_prune(state_ds, prune_far)
    if not len(far):
        return pivot, 0, 0

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        r = df[df["kind"] == 1]
        return pd.DataFrame(
            {"n_part": [int((r["dist"].to_numpy(np.int64) >= 0).sum())]}
        ).astype(np.int64)

    reached = int(
        state_ds.map_batches(count_part, batch_format="pandas").sum("n_part")
    )
    return int(far["n1"].iloc[0]), int(far["dist"].iloc[0]), reached


def q_diameter_double_sweep(sf_dir: str):
    n_docs = _n_docs(sf_dir)
    empty = pd.DataFrame(
        {
            "sweep": pd.Series(dtype=np.int64),
            "start_node": pd.Series(dtype=np.int64),
            "far_node": pd.Series(dtype=np.int64),
            "ecc": pd.Series(dtype=np.int64),
            "n_reached": pd.Series(dtype=np.int64),
        }
    )
    if n_docs == 0:
        return empty
    pivot = 0
    far1, ecc1, reach1 = _sweep(sf_dir, pivot, n_docs)
    far2, ecc2, reach2 = _sweep(sf_dir, far1, n_docs)
    return pd.DataFrame(
        {
            "sweep": [1, 2],
            "start_node": [pivot, far1],
            "far_node": [far1, far2],
            "ecc": [ecc1, ecc2],
            "n_reached": [reach1, reach2],
        }
    ).astype(np.int64)


DIAMETER_DOUBLE_SWEEP_SQL = f"""
WITH RECURSIVE
{_UND_EDGES_CTE},
w1(v, dep) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, w1.dep + 1 FROM w1 JOIN e ON e.src = w1.v
  WHERE w1.dep < {DDS_CAP}),
b1 AS (SELECT v, MIN(dep) AS d FROM w1 GROUP BY v),
f1 AS (SELECT v, d FROM b1 ORDER BY d DESC, v ASC LIMIT 1),
w2(v, dep) AS (
  SELECT v, 0 FROM f1
  UNION
  SELECT e.dst, w2.dep + 1 FROM w2 JOIN e ON e.src = w2.v
  WHERE w2.dep < {DDS_CAP}),
b2 AS (SELECT v, MIN(dep) AS d FROM w2 GROUP BY v),
f2 AS (SELECT v, d FROM b2 ORDER BY d DESC, v ASC LIMIT 1)
SELECT CAST(1 AS BIGINT) AS sweep, CAST(0 AS BIGINT) AS start_node,
       CAST(f1.v AS BIGINT) AS far_node, CAST(f1.d AS BIGINT) AS ecc,
       CAST((SELECT COUNT(*) FROM b1) AS BIGINT) AS n_reached
FROM f1
UNION ALL
SELECT 2, CAST(f1.v AS BIGINT), CAST(f2.v AS BIGINT), CAST(f2.d AS BIGINT),
       CAST((SELECT COUNT(*) FROM b2) AS BIGINT)
FROM f1, f2
"""


# ==================================================== molloy_reed_kappa
#
# Molloy-Reed percolation criterion: κ = <k²>/<k> = Σk²/Σk over the
# undirected degree sequence — a giant component exists iff κ ≥ 2
# (Molloy & Reed 1995), and the attack/failure robustness thresholds
# of Cohen et al. 2000 are functions of κ. Exact integer report:
# kappa_ppm = 10⁶·Σk² // Σk plus the 0/1 criterion (integer compare
# Σk² ≥ 2·Σk — no division involved in the verdict).
#
# Scale shape: per-batch endpoint-count partials → ONE coarse node
# exchange (exact per-node degrees in-task, squared there) → ≤256
# per-task (Σk, Σk²) partials → driver sum. Node ids never reach the
# driver. Degrees count the edge multiset with self-loops dropped —
# the attack_tolerance convention.


def q_molloy_reed_kappa(sf_dir: str):
    from .queries import internal_edges_np

    n_docs = _n_docs(sf_dir)
    empty = pd.DataFrame(
        {
            "n_nodes": pd.Series(dtype=np.int64),
            "sum_deg": pd.Series(dtype=np.int64),
            "sum_deg2": pd.Series(dtype=np.int64),
            "kappa_ppm": pd.Series(dtype=np.int64),
            "supercritical": pd.Series(dtype=np.int64),
        }
    )
    if n_docs == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        src, dst = internal_edges_np(ids, n_docs, drop_self=True)
        ep = np.concatenate([src, dst])
        vals, cnts = np.unique(ep, return_counts=True)
        return pd.DataFrame(
            {"node": vals.astype(np.int64), "c_part": cnts.astype(np.int64)}
        )

    def moment_partial(g: pd.DataFrame) -> pd.DataFrame:
        t = (
            g.drop(columns=["_g"])
            .groupby("node", as_index=False)["c_part"]
            .sum()
        )
        k = t["c_part"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "sd_part": [int(k.sum())],
                "sd2_part": [int((k * k).sum())],
            }
        ).astype(np.int64)

    parts = (
        _with_coarse_group(
            d.map_batches(deg_partial, batch_format="pandas"), "node"
        )
        .groupby("_g")
        .map_groups(moment_partial, batch_format="pandas")
        .to_pandas()  # <= 256 rows
    )
    sd = int(parts["sd_part"].sum()) if len(parts) else 0
    sd2 = int(parts["sd2_part"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "n_nodes": [n_docs],
            "sum_deg": [sd],
            "sum_deg2": [sd2],
            "kappa_ppm": [1_000_000 * sd2 // sd if sd else 0],
            "supercritical": [1 if sd2 >= 2 * sd and sd > 0 else 0],
        }
    ).astype(np.int64)


MOLLOY_REED_KAPPA_SQL = f"""
WITH {_UND_EDGES_CTE},
deg AS (SELECT src AS node, CAST(COUNT(*) AS HUGEINT) AS k FROM e GROUP BY 1),
s AS (SELECT SUM(k) AS sd, SUM(k * k) AS sd2 FROM deg)
SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_nodes,
       CAST(COALESCE(sd, 0) AS BIGINT) AS sum_deg,
       CAST(COALESCE(sd2, 0) AS BIGINT) AS sum_deg2,
       CAST(CASE WHEN COALESCE(sd, 0) > 0
            THEN 1000000 * sd2 // sd ELSE 0 END AS BIGINT) AS kappa_ppm,
       CAST(CASE WHEN COALESCE(sd, 0) > 0 AND sd2 >= 2 * sd
            THEN 1 ELSE 0 END AS BIGINT) AS supercritical
FROM s
"""


GRAPHGEOM_SQL_QUERIES: dict[str, tuple] = {
    "twonn_intrinsic_dim": (q_twonn_intrinsic_dim, TWONN_INTRINSIC_DIM_SQL),
    "diameter_double_sweep": (
        q_diameter_double_sweep,
        DIAMETER_DOUBLE_SWEEP_SQL,
    ),
    "molloy_reed_kappa": (q_molloy_reed_kappa, MOLLOY_REED_KAPPA_SQL),
}
