"""Graph null-model operators (round-5 batch 55): the observed
triangle count against its configuration-model expectation (Newman
2003 — the null that says whether clustering is structure or just
degree sequence), the Gini coefficient of the degree distribution
(the graph-inequality number), and the friendship paradox gap
(Feld 1991 — your neighbours have more links than you, exactly
⟨d²⟩/⟨d⟩ ≥ ⟨d⟩) — three degree-sequence diagnostics of the crawl
link graph.

Exactness: everything reduces to integer degree moments (S₁ = Σd,
S₂ = Σd(d−1), Σd²) and the exact triangle count (wedge-closure sum
/ 3); the expectation quantizes as ⌊10⁶·S₂³/(6·S₁³)⌋ and the Gini
comes from the bounded degree HISTOGRAM via
Σᵢⱼ h_i h_j |d_i − d_j| — all cross-multiplied integers.

Scale idioms: degrees ride the structgraph symmetric-edge machinery
(ONE src-keyed exchange, globally deduped); moments and the degree
histogram are bounded reduces (the histogram is max-degree-bounded);
triangles reuse the scan_similarity wedge-closure exchange shape
(Σd² wedge bound, documented there).

Reference parity: the reference has no graph analytics; these close
the web-graph family's null-model gap (triangle_count,
clustering_coeff, deg_powerlaw are the siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from .grouping import compact_small, with_coarse_group as _with_coarse_group
from .ml_queries import _md5u
from .structgraph_ops import _n_docs, _sym_edges


def _degree_hist(sf_dir: str) -> pd.DataFrame:
    """(degree, n_nodes) over the deduped symmetric graph, isolated
    nodes included at degree 0 — max-degree-bounded driver table."""
    n_docs = _n_docs(sf_dir)
    edges = compact_small(_sym_edges(sf_dir, n_docs).materialize())

    def deg(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"]).drop_duplicates(["src", "dst"])
        s = t.groupby("src", as_index=False).size()
        s = s.rename(columns={"size": "degree"})
        h = s.groupby("degree", as_index=False).size()
        return pd.DataFrame(
            {
                "degree": h["degree"].to_numpy(np.int64),
                "n": h["size"].to_numpy(np.int64),
            }
        )

    agg = (
        _with_coarse_group(edges, "src")
        .groupby("_g")
        .map_groups(deg, batch_format="pandas")
        .groupby("degree")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    agg["degree"] = agg["degree"].astype(np.int64)
    agg["n"] = agg["n"].astype(np.int64)
    n_with_edges = int(agg["n"].sum())
    iso = n_docs - n_with_edges
    if iso > 0:
        agg = pd.concat(
            [agg, pd.DataFrame({"degree": [0], "n": [iso]})],
            ignore_index=True,
        ).astype(np.int64)
    return agg.sort_values("degree").reset_index(drop=True)


def _deg_sql_head() -> str:
    md5u = _md5u("'lnkk:42:' || CAST(doc_id AS VARCHAR)")
    return f"""
n AS (SELECT COUNT(*) AS cnt FROM documents),
kk AS (SELECT doc_id, CAST(1 + {md5u} % 4 AS BIGINT) AS k FROM documents),
de AS (
  SELECT DISTINCT doc_id AS src, (doc_id * 37 + j * 101) % cnt AS dst
  FROM (SELECT doc_id, unnest(range(1, k + 1)) AS j FROM kk), n
  WHERE (doc_id * 37 + j * 101) % cnt <> doc_id),
e0 AS (SELECT src, dst FROM de UNION SELECT dst, src FROM de),
degs AS (
  SELECT d.doc_id,
         CAST(COALESCE(g.deg, 0) AS BIGINT) AS deg
  FROM documents d
  LEFT JOIN (SELECT src, COUNT(*) AS deg FROM e0 GROUP BY 1) g
    ON g.src = d.doc_id)"""


# =================================================== triangle_nullmodel
#
# Observed triangles T (wedge-closure sum / 3) vs the configuration-
# model expectation exp_x1e6 = ⌊10⁶·S₂³ / (6·S₁³)⌋; ratio_x100 =
# ⌊100·T·6·S₁³ / S₂³⌋ — ratio ≫ 100 means clustering beyond what the
# degree sequence alone predicts.


def q_triangle_nullmodel(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_nodes": pd.Series(dtype=np.int64),
            "n_edges": pd.Series(dtype=np.int64),
            "n_triangles": pd.Series(dtype=np.int64),
            "expected_x1e6": pd.Series(dtype=np.int64),
            "ratio_x100": pd.Series(dtype=np.int64),
        }
    )
    n_docs = _n_docs(sf_dir)
    if n_docs == 0:
        return empty
    edges = compact_small(_sym_edges(sf_dir, n_docs).materialize())

    # deduped adjacency with wedge emission (the scan_similarity shape)
    def dedup_adj(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns=["_g"]).drop_duplicates(["src", "dst"])

    adj = compact_small(
        _with_coarse_group(edges, "src")
        .groupby("_g")
        .map_groups(dedup_adj, batch_format="pandas")
        .materialize()
    )

    # degree moments from the COMPLETE histogram (compact_small
    # re-blocks adj, so per-block degree counts would be partial and
    # d(d−1) is nonlinear — the histogram sidesteps that)
    h = _degree_hist(sf_dir)
    dd = h["degree"].to_numpy(np.int64)
    cc = h["n"].to_numpy(np.int64)
    s1 = int((dd * cc).sum())
    s2 = int((dd * (dd - 1) * cc).sum())
    n_edges = s1 // 2

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        us, vs = [], []
        for _, grp in t.groupby("src"):
            nb = np.sort(grp["dst"].to_numpy(np.int64))
            if len(nb) < 2:
                continue
            iu, ju = np.triu_indices(len(nb), 1)
            us.append(nb[iu])
            vs.append(nb[ju])
        if not us:
            return pd.DataFrame(
                {
                    "u": pd.Series(dtype=np.int64),
                    "v": pd.Series(dtype=np.int64),
                    "kind": pd.Series(dtype=np.int64),
                }
            )
        u = np.concatenate(us)
        v = np.concatenate(vs)
        return pd.DataFrame(
            {"u": u, "v": v, "kind": np.zeros(len(u), np.int64)}
        )

    def edge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["src"] < df["dst"]]
        return pd.DataFrame(
            {
                "u": e["src"].to_numpy(np.int64),
                "v": e["dst"].to_numpy(np.int64),
                "kind": np.ones(len(e), np.int64),
            }
        )

    def pkey(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["pk"] = (out["u"].to_numpy(np.int64) << np.int64(32)) | out[
            "v"
        ].to_numpy(np.int64)
        return out

    def closed(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        es = set(t.loc[t["kind"] == 1, "pk"].tolist())
        w = t[t["kind"] == 0]
        return pd.DataFrame(
            {"c": [np.int64(int(w["pk"].isin(es).sum()))]}
        )

    wsum = int(
        _with_coarse_group(
            (
                _with_coarse_group(adj, "src")
                .groupby("_g")
                .map_groups(wedges, batch_format="pandas")
            )
            .union(adj.map_batches(edge_pairs, batch_format="pandas"))
            .map_batches(pkey, batch_format="pandas"),
            "pk",
        )
        .groupby("_g")
        .map_groups(closed, batch_format="pandas")
        .sum("c")
    )
    tri = wsum // 3
    if s1 > 0 and s2 > 0:
        exp_x = 10**6 * s2**3 // (6 * s1**3)
        ratio = 100 * tri * 6 * s1**3 // s2**3
    else:
        exp_x, ratio = 0, 0
    return pd.DataFrame(
        {
            "n_nodes": [np.int64(n_docs)],
            "n_edges": [np.int64(n_edges)],
            "n_triangles": [np.int64(tri)],
            "expected_x1e6": [np.int64(exp_x)],
            "ratio_x100": [np.int64(ratio)],
        }
    )


def _nullmodel_sql() -> str:
    return f"""
WITH {_deg_sql_head()},
m AS (
  SELECT CAST(SUM(deg) AS HUGEINT) AS s1,
         CAST(SUM(CAST(deg AS HUGEINT) * (deg - 1)) AS HUGEINT) AS s2,
         CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM degs),
tri AS (
  -- the x<y<z labeling admits exactly ONE (a,b,c) per triangle
  SELECT CAST(COUNT(*) AS BIGINT) AS t
  FROM e0 a
  JOIN e0 b ON b.src = a.dst AND a.src < a.dst AND b.dst <> a.src
  JOIN e0 c ON c.src = b.dst AND c.dst = a.src
  WHERE a.dst < b.dst)
SELECT m.n_nodes,
       CAST((SELECT COUNT(*) FROM e0) // 2 AS BIGINT) AS n_edges,
       tri.t AS n_triangles,
       CAST(CASE WHEN m.s1 > 0 AND m.s2 > 0
                 THEN 1000000 * m.s2 * m.s2 * m.s2
                      // (6 * m.s1 * m.s1 * m.s1)
                 ELSE 0 END AS BIGINT) AS expected_x1e6,
       CAST(CASE WHEN m.s1 > 0 AND m.s2 > 0
                 THEN 100 * tri.t * 6 * m.s1 * m.s1 * m.s1
                      // (m.s2 * m.s2 * m.s2)
                 ELSE 0 END AS BIGINT) AS ratio_x100
FROM m, tri
"""


# ========================================================= degree_gini
#
# Gini of the degree sequence from the degree histogram:
# G = Σᵢⱼ hᵢhⱼ|dᵢ−dⱼ| / (2·n·S₁) ×10⁶ — 0 = regular graph,
# → 1 = a few hubs hold all the links.


def q_degree_gini(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_nodes": pd.Series(dtype=np.int64),
            "gini_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    h = _degree_hist(sf_dir)
    d = h["degree"].to_numpy(np.int64)
    c = h["n"].to_numpy(np.int64)
    n = int(c.sum())
    s1 = int((d * c).sum())
    if s1 == 0:
        return pd.DataFrame(
            {"n_nodes": [np.int64(n)], "gini_x1e6": [np.int64(0)]}
        )
    diff = np.abs(d[:, None] - d[None, :])
    tot = int((c[:, None] * c[None, :] * diff).sum())
    g = 10**6 * tot // (2 * n * s1)
    return pd.DataFrame(
        {"n_nodes": [np.int64(n)], "gini_x1e6": [np.int64(g)]}
    )


def _degree_gini_sql() -> str:
    return f"""
WITH {_deg_sql_head()},
h AS (SELECT deg, CAST(COUNT(*) AS BIGINT) AS c FROM degs GROUP BY 1),
m AS (SELECT CAST(SUM(deg * c) AS HUGEINT) AS s1,
             CAST(SUM(c) AS BIGINT) AS n FROM h),
x AS (
  SELECT CAST(SUM(CAST(a.c AS HUGEINT) * b.c * ABS(a.deg - b.deg))
              AS HUGEINT) AS tot
  FROM h a, h b)
SELECT m.n AS n_nodes,
       CAST(CASE WHEN m.s1 > 0
                 THEN 1000000 * x.tot // (2 * m.n * m.s1)
                 ELSE 0 END AS BIGINT) AS gini_x1e6
FROM m, x
"""


# ==================================================== friendship_paradox
#
# Feld's paradox, exactly: mean degree μ = S₁/n vs mean NEIGHBOUR
# degree ν = Σd²/S₁; ν ≥ μ always (Cauchy-Schwarz), with equality
# only for regular graphs. Output: n, S₁, mean_x1e6, nbr_mean_x1e6,
# gap_x1e6 = nbr − mean (≥ 0 — the pinned invariant).


def q_friendship_paradox(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_nodes": pd.Series(dtype=np.int64),
            "sum_deg": pd.Series(dtype=np.int64),
            "mean_x1e6": pd.Series(dtype=np.int64),
            "nbr_mean_x1e6": pd.Series(dtype=np.int64),
            "gap_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    h = _degree_hist(sf_dir)
    d = h["degree"].to_numpy(np.int64)
    c = h["n"].to_numpy(np.int64)
    n = int(c.sum())
    s1 = int((d * c).sum())
    s2 = int((d * d * c).sum())
    mean = 10**6 * s1 // n if n else 0
    nbr = 10**6 * s2 // s1 if s1 else 0
    return pd.DataFrame(
        {
            "n_nodes": [np.int64(n)],
            "sum_deg": [np.int64(s1)],
            "mean_x1e6": [np.int64(mean)],
            "nbr_mean_x1e6": [np.int64(nbr)],
            "gap_x1e6": [np.int64(nbr - mean)],
        }
    )


def _friendship_sql() -> str:
    return f"""
WITH {_deg_sql_head()},
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(deg) AS BIGINT) AS s1,
         CAST(SUM(CAST(deg AS HUGEINT) * deg) AS HUGEINT) AS s2
  FROM degs)
SELECT n AS n_nodes, s1 AS sum_deg,
       CAST(CASE WHEN n > 0 THEN 1000000 * s1 // n ELSE 0 END AS BIGINT)
         AS mean_x1e6,
       CAST(CASE WHEN s1 > 0 THEN 1000000 * s2 // s1 ELSE 0 END AS BIGINT)
         AS nbr_mean_x1e6,
       CAST(CASE WHEN s1 > 0 AND n > 0
                 THEN 1000000 * s2 // s1 - 1000000 * s1 // n
                 ELSE 0 END AS BIGINT) AS gap_x1e6
FROM m
"""


NULLMODEL_SQL_QUERIES: dict[str, tuple] = {
    "triangle_nullmodel": (q_triangle_nullmodel, _nullmodel_sql()),
    "degree_gini": (q_degree_gini, _degree_gini_sql()),
    "friendship_paradox": (q_friendship_paradox, _friendship_sql()),
}
