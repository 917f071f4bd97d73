"""Approximation-algorithm operators (round-5 batch 61): the
MapReduce densest-subgraph peel (Bahmani, Kumar & Vassilvitskii,
VLDB 2012 — remove every vertex of degree ≤ 2·avg each round, a
2(1+ε)-approximation of Charikar's greedy), the matching-based
2-approximate vertex cover (Gavril / Yannakakis folklore — the
endpoints of any maximal matching), and Prim's minimum spanning tree
(Prim 1957) over the 64-vector candidate pool with exact integer
distances — three textbook approximations with verifiable
guarantees.

Determinization: densities compare by cross-multiplication (E·V′ vs
E′·V) with earliest-round tie-break; the vertex cover reuses the
mutual-minimum maximal matching (distjoin_ops) so its 2·OPT bound is
inherited; Prim breaks distance ties by (u, v) and the oracle
replays the identical greedy with a RECURSIVE CTE holding the
visited set as a 64-bit mask.

Scale idioms: the peel runs ≤ PEEL_ROUNDS WL-style degree exchanges
over the resident symmetric edge list (each round one
attach/re-key/count pass + a 2-scalar stats reduce); the cover adds
one edge-coverage exchange to the matching result; the MST is
driver math over the bounded candidate pool (the SQL mask recursion
is the showpiece).

Reference parity: the reference has no graph optimization; these
extend the brief's web-graph family with guaranteed approximations
(kcore_peel, coverage_maxcover are the siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from .coreset_ops import _cand_pool, _qmat
from .grouping import compact_small, with_coarse_group as _with_coarse_group
from .ml_queries import _md5u
from .structgraph_ops import _n_docs, _sym_edges

PEEL_ROUNDS = 16


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ===================================================== densest_subgraph
#
# Round t: with V_t vertices and E_t edges, remove every vertex whose
# degree ≤ 2·avg (deg·V_t ≤ 4·E_t, cross-multiplied); the answer is
# the round whose (V, E) maximizes density E/V (earliest round on
# ties). Output one row: (best_round, n_nodes, n_edges,
# density_x1e6).


def q_densest_subgraph(sf_dir: str):
    empty = pd.DataFrame(
        {
            "best_round": pd.Series(dtype=np.int64),
            "n_nodes": pd.Series(dtype=np.int64),
            "n_edges": pd.Series(dtype=np.int64),
            "density_x1e6": pd.Series(dtype=np.int64),
        }
    )
    n_docs = _n_docs(sf_dir)
    if n_docs == 0:
        return empty
    edges = compact_small(_sym_edges(sf_dir, n_docs).materialize())

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns=["_g"]).drop_duplicates(["src", "dst"])

    adj = compact_small(
        _with_coarse_group(edges, "src")
        .groupby("_g")
        .map_groups(dedup, batch_format="pandas")
        .materialize()
    )

    trajectory = []  # (round, V, E)
    cur = adj
    for t in range(PEEL_ROUNDS):
        # degrees + stats of the CURRENT subgraph
        def degs(g: pd.DataFrame) -> pd.DataFrame:
            s = (
                g.drop(columns=["_g"])
                .groupby("src", as_index=False)
                .size()
            )
            return pd.DataFrame(
                {
                    "node": s["src"].to_numpy(np.int64),
                    "deg": s["size"].to_numpy(np.int64),
                }
            )

        dd = (
            _with_coarse_group(cur, "src")
            .groupby("_g")
            .map_groups(degs, batch_format="pandas")
            .to_pandas()  # one row per surviving vertex
        )
        V = len(dd)
        E = int(dd["deg"].sum()) // 2
        if V == 0:
            break
        trajectory.append((t, V, E))
        keep_nodes = dd.loc[
            dd["deg"].to_numpy(np.int64) * V > 4 * E, "node"
        ].to_numpy(np.int64)
        if len(keep_nodes) == V:
            break  # fixed point: nothing removable
        if len(keep_nodes) == 0:
            break
        keep_set_ref = ray.put(set(int(x) for x in keep_nodes))

        def flt(df: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(keep_set_ref)
            m = df["src"].isin(ks) & df["dst"].isin(ks)
            return df[m]

        cur = compact_small(
            cur.map_batches(flt, batch_format="pandas").materialize()
        )
    # best round by density, cross-multiplied, earliest tie
    best = None
    for t, V, E in trajectory:
        if best is None or E * best[1] > best[2] * V:
            best = (t, V, E)
    t, V, E = best
    return pd.DataFrame(
        {
            "best_round": [np.int64(t)],
            "n_nodes": [np.int64(V)],
            "n_edges": [np.int64(E)],
            "density_x1e6": [np.int64(10**6 * E // V)],
        }
    )


def _densest_sql() -> str:
    md5u = _md5u("'lnkk:42:' || CAST(doc_id AS VARCHAR)")
    parts = [
        f"""WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
kk AS (SELECT doc_id, CAST(1 + {md5u} % 4 AS BIGINT) AS k FROM documents),
de AS (
  SELECT DISTINCT doc_id AS src, (doc_id * 37 + j * 101) % cnt AS dst
  FROM (SELECT doc_id, unnest(range(1, k + 1)) AS j FROM kk), n
  WHERE (doc_id * 37 + j * 101) % cnt <> doc_id),
e0 AS MATERIALIZED (SELECT src, dst FROM de UNION SELECT dst, src FROM de),
v0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM e0)"""
    ]
    stats = []
    for t in range(PEEL_ROUNDS):
        parts.append(
            f"""d{t} AS MATERIALIZED (
  SELECT e0.src AS v, CAST(COUNT(*) AS BIGINT) AS deg
  FROM e0
  JOIN v{t} a ON a.v = e0.src JOIN v{t} b ON b.v = e0.dst
  GROUP BY 1),
st{t} AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS vv,
         CAST(COALESCE(SUM(deg), 0) // 2 AS BIGINT) AS ee
  FROM d{t}),
v{t + 1} AS MATERIALIZED (
  SELECT d{t}.v FROM d{t}, st{t}
  WHERE d{t}.deg * st{t}.vv > 4 * st{t}.ee)"""
        )
        stats.append(
            f"SELECT CAST({t} AS BIGINT) AS r, vv, ee FROM st{t} "
            f"WHERE vv > 0"
        )
    parts.append(
        f"""traj AS ({" UNION ALL ".join(stats)}),
best AS (
  SELECT r, vv, ee FROM traj a
  WHERE NOT EXISTS (
    SELECT 1 FROM traj b
    WHERE b.ee * a.vv > a.ee * b.vv
       OR (b.ee * a.vv = a.ee * b.vv AND b.r < a.r))
)
SELECT best.r AS best_round, best.vv AS n_nodes, best.ee AS n_edges,
       CAST(1000000 * best.ee // best.vv AS BIGINT) AS density_x1e6
FROM best"""
    )
    return ",\n".join(parts[:-1]) + ",\n" + parts[-1]


# ================================================== vertex_cover_2approx
#
# The endpoints of the mutual-minimum maximal matching cover every
# edge (if some edge had both ends unmatched the matching was not
# maximal) at ≤ 2·OPT (each matched pair needs ≥ 1 cover vertex).
# Output one row: (n_cover, n_pairs, n_uncovered, lower_bound) — the
# query VERIFIES coverage (n_uncovered must be 0) rather than
# assuming it.


def q_vertex_cover_2approx(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_cover": pd.Series(dtype=np.int64),
            "n_pairs": pd.Series(dtype=np.int64),
            "n_uncovered": pd.Series(dtype=np.int64),
            "lower_bound": pd.Series(dtype=np.int64),
        }
    )
    n_docs = _n_docs(sf_dir)
    if n_docs == 0:
        return empty
    from .distjoin_ops import q_maximal_matching

    m = q_maximal_matching(sf_dir)
    mdf = m.to_pandas() if hasattr(m, "to_pandas") else m
    cover = set(
        int(v)
        for v in mdf.loc[mdf["partner"] >= 0, "doc_id"].to_numpy(np.int64)
    )
    n_pairs = len(cover) // 2
    cover_ref = ray.put(cover)
    edges = _sym_edges(sf_dir, n_docs)

    def uncovered(df: pd.DataFrame) -> pd.DataFrame:
        cv = ray.get(cover_ref)
        bad = (~df["src"].isin(cv)) & (~df["dst"].isin(cv))
        return pd.DataFrame({"u": [np.int64(int(bad.sum()))]})

    n_unc = int(
        edges.map_batches(uncovered, batch_format="pandas").sum("u")
    )
    return pd.DataFrame(
        {
            "n_cover": [np.int64(len(cover))],
            "n_pairs": [np.int64(n_pairs)],
            "n_uncovered": [np.int64(n_unc)],
            "lower_bound": [np.int64(n_pairs)],
        }
    )


def _vertex_cover_sql() -> str:
    from .distjoin_ops import _matching_sql

    base = _matching_sql()
    # reuse the matching SQL's CTE chain; swap its final SELECT for
    # cover accounting over the symmetric edge set
    cut = base.rfind("SELECT d.doc_id AS doc_id")
    head = base[:cut].rstrip()
    if not head.endswith(","):
        head += ",\n"
    return (
        head
        + """cover AS (SELECT DISTINCT u AS v FROM pairs),
unc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS u FROM e0
  WHERE src NOT IN (SELECT v FROM cover)
    AND dst NOT IN (SELECT v FROM cover))
SELECT CAST((SELECT COUNT(*) FROM cover) AS BIGINT) AS n_cover,
       CAST((SELECT COUNT(*) FROM cover) // 2 AS BIGINT) AS n_pairs,
       unc.u AS n_uncovered,
       CAST((SELECT COUNT(*) FROM cover) // 2 AS BIGINT) AS lower_bound
FROM unc"""
    )


# ============================================================= mst_pool
#
# Prim over the CAND_N md5-chosen embedding pool with the exact
# integer squared distance d² = |a|² − 2⟨a,b⟩ + |b|², starting from
# the smallest vec_id, ties by (d², u, v). Output one row per MST
# edge: (step, u, v, d2) — Σd2 is the tree weight, and the tour
# bound (2·MST ≥ metric TSP tour) comes free.


def q_mst_pool(sf_dir: str):
    empty = pd.DataFrame(
        {
            "step": pd.Series(dtype=np.int64),
            "u": pd.Series(dtype=np.int64),
            "v": pd.Series(dtype=np.int64),
            "d2": pd.Series(dtype=np.int64),
        }
    )
    import pyarrow.parquet as _pq

    if _pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows == 0:
        return empty
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cands = _cand_pool(emb)
    if cands.empty or len(cands) < 2:
        return empty
    ids = cands["vec_id"].to_numpy(np.int64)
    mat = _qmat(cands["embedding"].to_numpy())
    nrm = (mat * mat).sum(axis=1)
    d2 = nrm[:, None] - 2 * (mat @ mat.T) + nrm[None, :]
    order = np.argsort(ids)
    visited = {int(order[0])}
    rows = []
    for step in range(1, len(ids)):
        best = None
        for i in visited:
            for j in range(len(ids)):
                if j in visited:
                    continue
                key = (int(d2[i, j]), int(ids[i]), int(ids[j]))
                if best is None or key < best:
                    best = key
        w, u, v = best
        rows.append((step, u, v, w))
        visited.add(int(np.flatnonzero(ids == v)[0]))
    return pd.DataFrame(rows, columns=["step", "u", "v", "d2"]).astype(
        np.int64
    )


def _mst_sql() -> str:
    from .coreset_ops import CAND_N

    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000) AS BIGINT)) AS q
  FROM embeddings),
cand AS MATERIALIZED (
  SELECT vec_id AS cid, q AS cv,
         CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS idx
  FROM (
    SELECT vec_id, q FROM e
    ORDER BY md5('cand:' || CAST(vec_id AS VARCHAR)) LIMIT {CAND_N})),
dist AS MATERIALIZED (
  SELECT a.idx AS ai, b.idx AS bi, a.cid AS u, b.cid AS v,
         CAST(list_inner_product(a.cv, a.cv)
              - 2 * list_inner_product(a.cv, b.cv)
              + list_inner_product(b.cv, b.cv) AS BIGINT) AS d2
  FROM cand a JOIN cand b ON b.cid <> a.cid),
nn AS (SELECT CAST(COUNT(*) AS INTEGER) AS n FROM cand),
walk AS (
  WITH RECURSIVE w(step, mask, u, v, d2) AS (
    SELECT 0,
           CAST(1 AS HUGEINT) << (SELECT MIN(idx) FROM cand
                                  WHERE cid = (SELECT MIN(cid) FROM cand)),
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT w.step + 1,
           w.mask | (CAST(1 AS HUGEINT) << pick.bi),
           pick.u, pick.v, pick.d2
    FROM w, nn,
    LATERAL (
      SELECT d.bi, d.u, d.v, d.d2
      FROM dist d
      WHERE (w.mask >> d.ai) & 1 = 1 AND (w.mask >> d.bi) & 1 = 0
      ORDER BY d.d2 ASC, d.u ASC, d.v ASC
      LIMIT 1) pick
    WHERE w.step < nn.n - 1)
  SELECT * FROM w)
SELECT CAST(step AS BIGINT) AS step, u, v, d2
FROM walk WHERE step >= 1
"""


APPROX_SQL_QUERIES: dict[str, tuple] = {
    "densest_subgraph": (q_densest_subgraph, _densest_sql()),
    "vertex_cover_2approx": (q_vertex_cover_2approx, _vertex_cover_sql()),
    "mst_pool": (q_mst_pool, _mst_sql()),
}
