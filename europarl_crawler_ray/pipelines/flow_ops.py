"""Network-flow operators (round-5 batch 64): the min-cut of the
8-node shard-transfer graph (verified against max-flow — the
Ford-Fulkerson/min-cut theorem, Ford & Fulkerson 1956; the cut side
enumerates ALL 2⁶ s-t partitions, which the bounded domain makes
exact), and the two classic path semirings over the 64-vector
candidate pool: min-plus (Bellman-Ford relaxation rounds, Bellman
1958) and max-min (widest / bottleneck paths, the Pollack 1960
variant) — fixed R-round relaxations, so both engines walk the
identical trajectory whether or not it has converged.

Determinization: capacities are md5 + shard-volume integers; path
weights are the exact integer d² distances; all three ops are pure
integer min/max arithmetic with smallest-mask / smallest-id ties.

Scale idioms: ONE 8-row shard-volume reduce feeds the cut
enumeration (driver math over 64 masks); the relaxations are driver
dynamic programming over the bounded pool's 64×64 weight matrix,
with the pool itself a global_prune broadcast.

Reference parity: the reference moves data point-to-point with no
flow model; these extend the brief's placement family
(optimal_assignment, mst_pool are the siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..stages.multimodal import _md5_64
from .coreset_ops import _cand_pool, _qmat
from .mechdesign_ops import _shard_volumes
from .ml_queries import _md5u

FLOW_N = 8
FLOW_S, FLOW_T = 0, 7
RELAX_R = 4


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _caps(v: np.ndarray) -> np.ndarray:
    cap = np.zeros((FLOW_N, FLOW_N), np.int64)
    for u in range(FLOW_N):
        for w in range(FLOW_N):
            if u != w:
                cap[u, w] = _md5_64(f"cap:42:{u}:{w}") % 30 + int(v[u]) % 20
    return cap


# ======================================================= maxflow_mincut
#
# min over the 64 s-side masks (bit FLOW_S set, bit FLOW_T clear) of
# Σ cap(u∈S, w∉S); ties to the smallest mask. Output:
# (mincut, best_mask, n_cut_edges).


def q_maxflow_mincut(sf_dir: str):
    empty = pd.DataFrame(
        {
            "mincut": pd.Series(dtype=np.int64),
            "best_mask": pd.Series(dtype=np.int64),
            "n_cut_edges": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    v = _shard_volumes(sf_dir)
    cap = _caps(v)
    best = None
    for mask in range(1 << FLOW_N):
        if not (mask >> FLOW_S) & 1 or (mask >> FLOW_T) & 1:
            continue
        cut = 0
        ne = 0
        for u in range(FLOW_N):
            if not (mask >> u) & 1:
                continue
            for w in range(FLOW_N):
                if (mask >> w) & 1 or cap[u, w] == 0:
                    continue
                cut += int(cap[u, w])
                ne += 1
        key = (cut, mask, ne)
        if best is None or key < best:
            best = key
    cut, mask, ne = best
    return pd.DataFrame(
        {
            "mincut": [np.int64(cut)],
            "best_mask": [np.int64(mask)],
            "n_cut_edges": [np.int64(ne)],
        }
    )


def _mincut_sql() -> str:
    cap = _md5u(
        "'cap:42:' || CAST(u.u AS VARCHAR) || ':' || CAST(w.w AS VARCHAR)"
    )
    return f"""
WITH vols AS MATERIALIZED (
  SELECT s.s AS shard,
         CAST(COALESCE(c.n, 0) AS BIGINT) AS v
  FROM unnest(range(0, {FLOW_N})) AS s(s)
  LEFT JOIN (
    SELECT doc_id % {FLOW_N} AS shard, COUNT(*) AS n
    FROM documents GROUP BY 1) c ON c.shard = s.s),
caps AS MATERIALIZED (
  SELECT CAST(u.u AS BIGINT) AS u, CAST(w.w AS BIGINT) AS w,
         CAST({cap} % 30 + vols.v % 20 AS BIGINT) AS cap
  FROM unnest(range(0, {FLOW_N})) AS u(u)
  CROSS JOIN unnest(range(0, {FLOW_N})) AS w(w)
  JOIN vols ON vols.shard = u.u
  WHERE u.u <> w.w),
cuts AS (
  SELECT CAST(m.m AS BIGINT) AS mask,
         CAST(COALESCE(SUM(CASE
           WHEN (m.m >> CAST(caps.u AS INTEGER)) & 1 = 1
            AND (m.m >> CAST(caps.w AS INTEGER)) & 1 = 0
            AND caps.cap > 0
           THEN caps.cap ELSE 0 END), 0) AS BIGINT) AS cut,
         CAST(COALESCE(SUM(CASE
           WHEN (m.m >> CAST(caps.u AS INTEGER)) & 1 = 1
            AND (m.m >> CAST(caps.w AS INTEGER)) & 1 = 0
            AND caps.cap > 0
           THEN 1 ELSE 0 END), 0) AS BIGINT) AS ne
  FROM unnest(range(0, {1 << FLOW_N})) AS m(m)
  CROSS JOIN caps
  WHERE (m.m >> {FLOW_S}) & 1 = 1 AND (m.m >> {FLOW_T}) & 1 = 0
  GROUP BY 1)
SELECT cut AS mincut, mask AS best_mask, ne AS n_cut_edges
FROM cuts ORDER BY cut ASC, mask ASC, ne ASC LIMIT 1
"""


# ================================== minplus_relax / widest_path_pool
#
# R fixed relaxation rounds over the candidate pool from the
# smallest-id source: min-plus (dist) and max-min (bottleneck width —
# width(u,v) of an edge is W_CAP − min(d², W_CAP), so similar pairs
# are "wide"). Both defined BY their round count: the trajectory,
# converged or not, is the contract.

W_CAP = 10**9


def _pool_weights(sf_dir: str):
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cands = _cand_pool(emb)
    if cands.empty:
        return None, None
    ids = cands["vec_id"].to_numpy(np.int64)
    mat = _qmat(cands["embedding"].to_numpy())
    nrm = (mat * mat).sum(axis=1)
    d2 = nrm[:, None] - 2 * (mat @ mat.T) + nrm[None, :]
    order = np.argsort(ids)
    return ids[order], d2[np.ix_(order, order)]


def q_minplus_relax(sf_dir: str):
    empty = pd.DataFrame(
        {
            "vec_id": pd.Series(dtype=np.int64),
            "dist": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "embeddings") == 0:
        return empty
    ids, d2 = _pool_weights(sf_dir)
    if ids is None:
        return empty
    INF = 1 << 60
    n = len(ids)
    dist = np.full(n, INF, dtype=np.int64)
    dist[0] = 0  # smallest id is the source
    for _ in range(RELAX_R):
        dist = np.minimum(dist, (dist[:, None] + d2).min(axis=0))
    out = pd.DataFrame({"vec_id": ids, "dist": dist})
    return out.astype(np.int64)


def q_widest_path_pool(sf_dir: str):
    empty = pd.DataFrame(
        {
            "vec_id": pd.Series(dtype=np.int64),
            "width": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "embeddings") == 0:
        return empty
    ids, d2 = _pool_weights(sf_dir)
    if ids is None:
        return empty
    w = W_CAP - np.minimum(d2, W_CAP)
    n = len(ids)
    width = np.zeros(n, dtype=np.int64)
    width[0] = W_CAP  # source reaches itself at full width
    for _ in range(RELAX_R):
        cand = np.minimum(width[:, None], w).max(axis=0)
        width = np.maximum(width, cand)
    out = pd.DataFrame({"vec_id": ids, "width": width})
    return out.astype(np.int64)


_POOL_SQL = """
e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000) AS BIGINT)) AS q
  FROM embeddings),
cand AS MATERIALIZED (
  SELECT vec_id AS cid, q AS cv FROM (
    SELECT vec_id, q FROM e
    ORDER BY md5('cand:' || CAST(vec_id AS VARCHAR)) LIMIT {CAND_N})),
wmat AS MATERIALIZED (
  SELECT a.cid AS u, b.cid AS v,
         CAST(list_inner_product(a.cv, a.cv)
              - 2 * list_inner_product(a.cv, b.cv)
              + list_inner_product(b.cv, b.cv) AS BIGINT) AS d2
  FROM cand a CROSS JOIN cand b),
src AS (SELECT MIN(cid) AS s FROM cand)
"""


def _minplus_sql() -> str:
    from .coreset_ops import CAND_N

    pool = _POOL_SQL.replace("{CAND_N}", str(CAND_N))
    parts = [f"WITH {pool}",
             """d0 AS MATERIALIZED (
  SELECT cand.cid AS v,
         CAST(CASE WHEN cand.cid = src.s THEN 0
                   ELSE 1152921504606846976 END AS BIGINT) AS d
  FROM cand, src)"""]
    for r in range(1, RELAX_R + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (
  SELECT w.v,
         CAST(LEAST(MIN(d{r - 1}p.d),
                    MIN(d{r - 1}q.d + w.d2)) AS BIGINT) AS d
  FROM wmat w
  JOIN d{r - 1} d{r - 1}p ON d{r - 1}p.v = w.v
  JOIN d{r - 1} d{r - 1}q ON d{r - 1}q.v = w.u
  GROUP BY 1)"""
        )
    parts.append(
        f"SELECT v AS vec_id, d AS dist FROM d{RELAX_R}"
    )
    return ",\n".join(parts[:-1]) + "\n" + parts[-1]


def _widest_sql() -> str:
    from .coreset_ops import CAND_N

    pool = _POOL_SQL.replace("{CAND_N}", str(CAND_N))
    parts = [f"WITH {pool}",
             f"""w0 AS MATERIALIZED (
  SELECT cand.cid AS v,
         CAST(CASE WHEN cand.cid = src.s THEN {W_CAP}
                   ELSE 0 END AS BIGINT) AS w
  FROM cand, src)"""]
    for r in range(1, RELAX_R + 1):
        parts.append(
            f"""w{r} AS MATERIALIZED (
  SELECT wm.v,
         CAST(GREATEST(MAX(wp.w),
                       MAX(LEAST(wq.w,
                                 {W_CAP} - LEAST(wm.d2, {W_CAP}))))
              AS BIGINT) AS w
  FROM wmat wm
  JOIN w{r - 1} wp ON wp.v = wm.v
  JOIN w{r - 1} wq ON wq.v = wm.u
  GROUP BY 1)"""
        )
    parts.append(
        f"SELECT v AS vec_id, w AS width FROM w{RELAX_R}"
    )
    return ",\n".join(parts[:-1]) + "\n" + parts[-1]


FLOW_SQL_QUERIES: dict[str, tuple] = {
    "maxflow_mincut": (q_maxflow_mincut, _mincut_sql()),
    "minplus_relax": (q_minplus_relax, _minplus_sql()),
    "widest_path_pool": (q_widest_path_pool, _widest_sql()),
}
