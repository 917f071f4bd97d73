"""Structural graph operators (round-5 batch 40): 1-dimensional
Weisfeiler-Lehman color refinement (Weisfeiler & Lehman 1968; the
1-WL test GNN expressiveness is measured against), SCAN structural
similarity per edge (Xu et al., KDD 2007), and the feed-forward-loop
triad census (Milo et al., Science 2002 — the most over-represented
motif in information networks) — three structure detectors over the
crawl link graph.

Scale idioms: all three ride the symmetrized (or directed) resident
edge list with union-co-location exchanges — WL runs WL_ROUNDS
bounded rounds of (attach src color → re-key dst → per-node sorted
multiset hash), exchanging one row per edge per round; SCAN counts
common neighbours by routing each wedge to its (endpoints) key and
intersecting with the edge set in-group (wedge volume Σd² is the
documented bound — degree-capped here by the link rule's k ≤ 4);
FFL joins two directed hops and semi-joins the closing edge the same
way. Colors are 63-bit md5 values — identical arithmetic in both
engines, no Python hash() anywhere.

Reference parity: the reference stores links implicitly in crawled
HTML and never analyzes graph structure (europarl/rules/); these
extend the brief's web-graph family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..stages.multimodal import _md5_64
from .grouping import compact_small, with_coarse_group as _with_coarse_group
from .ml_queries import _md5u

WL_ROUNDS = 2


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _sym_edges(sf_dir: str, n_docs: int) -> ray.data.Dataset:
    """Deduped symmetric (src, dst) edges of the link graph. Per-batch
    dedup is batch-local; the global dedup happens inside the consuming
    group (all rows of one key co-locate) — the kcore lesson."""
    from .queries import internal_edges_np

    d = _read(sf_dir, "documents", columns=["doc_id"])

    def expand(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        src, dst = internal_edges_np(ids, n_docs, drop_self=True)
        own = np.concatenate([src, dst])
        nbr = np.concatenate([dst, src])
        e = pd.DataFrame({"src": own, "dst": nbr}).drop_duplicates()
        return pa.Table.from_pandas(e, preserve_index=False)

    return d.map_batches(expand, batch_format="pyarrow")


def _dir_edges(sf_dir: str, n_docs: int) -> ray.data.Dataset:
    """Deduped directed (src, dst) edges, self-loops dropped."""
    from .queries import internal_edges_np

    d = _read(sf_dir, "documents", columns=["doc_id"])

    def expand(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        src, dst = internal_edges_np(ids, n_docs, drop_self=True)
        e = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
        return pa.Table.from_pandas(e, preserve_index=False)

    return d.map_batches(expand, batch_format="pyarrow")


# ======================================================== wl_refinement
#
# 1-WL color refinement on the symmetric graph, WL_ROUNDS rounds:
# color₀(v) = degree(v); colorₜ(v) = md5_64(colorₜ₋₁(v) || '|' ||
# comma-joined SORTED multiset of neighbour colors) >> 1 (63-bit so
# both engines store it signed). Output: the color-class histogram
# (color, n_nodes) — two graphs 1-WL-distinguishable iff histograms
# differ, and the class sizes are the GNN-expressiveness diagnostic.
#
# Scale shape: per round, ONE src-keyed union-co-location exchange
# attaches each edge's source color, then ONE dst-keyed exchange
# delivers neighbour colors to their node, which hashes the sorted
# multiset in-group (vectorized string build per node). Edge rows
# ship once per round; isolated nodes keep hashing their own color.


def _wl_color(prev: int, nbrs: list[int]) -> int:
    s = f"{prev}|" + ",".join(str(c) for c in sorted(nbrs))
    return _md5_64(s) >> 1


def q_wl_refinement(sf_dir: str, n_rounds: int = WL_ROUNDS):
    empty = pd.DataFrame(
        {
            "color": pd.Series(dtype=np.int64),
            "n_nodes": pd.Series(dtype=np.int64),
        }
    )
    n_docs = _n_docs(sf_dir)
    if n_docs == 0:
        return empty
    edges = compact_small(_sym_edges(sf_dir, n_docs).materialize())  # reused every round

    # color_0 = degree over the globally-deduped symmetric adjacency
    def dedup_deg(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"]).drop_duplicates(["src", "dst"])
        s = t.groupby("src", as_index=False).size()
        return pd.DataFrame(
            {
                "node": s["src"].to_numpy(np.int64),
                "color": s["size"].to_numpy(np.int64),
            }
        )

    colors = compact_small(
        _with_coarse_group(edges, "src")
        .groupby("_g")
        .map_groups(dedup_deg, batch_format="pandas")
        .materialize()
    )
    # isolated nodes (degree 0) never appear in edges: add them
    d_all = _read(sf_dir, "documents", columns=["doc_id"])

    def iso_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        return pa.table(
            {
                "node": pa.array(ids),
                "color": pa.array(np.zeros(len(ids), np.int64)),
                "iso": pa.array(np.ones(len(ids), np.int8)),
            }
        )

    def pick_color(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        # real color row (iso=0) wins over the degree-0 placeholder
        t = t.sort_values(["node", "iso"], kind="mergesort")
        t = t.drop_duplicates("node", keep="first")
        return t[["node", "color"]]

    def with_iso(c: ray.data.Dataset) -> ray.data.Dataset:
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["iso"] = np.int8(0)
            return out

        return (
            _with_coarse_group(
                c.map_batches(tag, batch_format="pandas").union(
                    d_all.map_batches(iso_rows, batch_format="pyarrow")
                ),
                "node",
            )
            .groupby("_g")
            .map_groups(pick_color, batch_format="pandas")
        )

    colors = compact_small(with_iso(colors).materialize())

    for _ in range(n_rounds):
        # exchange A (key = src): attach source color to each edge
        def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
            e = df.drop_duplicates(["src", "dst"])
            return pd.DataFrame(
                {
                    "key": e["src"].to_numpy(np.int64),
                    "side": np.int64(0),
                    "other": e["dst"].to_numpy(np.int64),
                    "color": np.zeros(len(e), np.int64),
                }
            )

        def tag_color(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["node"].to_numpy(np.int64),
                    "side": np.int64(1),
                    "other": np.full(len(df), -1, np.int64),
                    "color": df["color"].to_numpy(np.int64),
                }
            )

        def attach_src(g: pd.DataFrame) -> pd.DataFrame:
            t = g.drop(columns=["_g"])
            cm = t[t["side"] == 1].set_index("key")["color"]
            e = t[t["side"] == 0]
            # global edge dedup: batch-local dedup may leave repeats
            e = e.drop_duplicates(["key", "other"])
            return pd.DataFrame(
                {
                    "key": e["other"].to_numpy(np.int64),  # re-key dst
                    "side": np.int64(0),
                    "other": e["key"].to_numpy(np.int64),
                    "color": e["key"].map(cm).to_numpy(np.int64),
                }
            )

        tagged = (
            _with_coarse_group(
                edges.map_batches(tag_edge, batch_format="pandas").union(
                    colors.map_batches(tag_color, batch_format="pandas")
                ),
                "key",
            )
            .groupby("_g")
            .map_groups(attach_src, batch_format="pandas")
        )

        # exchange B (key = dst): hash own color + sorted nbr colors
        def rehash(g: pd.DataFrame) -> pd.DataFrame:
            t = g.drop(columns=["_g"])
            own = t[t["side"] == 1]
            nb = t[t["side"] == 0]
            nbrs = {
                k: v["color"].tolist() for k, v in nb.groupby("key")
            }
            nodes = own["node"].to_numpy(np.int64)
            prev = own["color"].to_numpy(np.int64)
            out = np.fromiter(
                (
                    _wl_color(int(p), nbrs.get(int(v), []))
                    for v, p in zip(nodes, prev)
                ),
                np.int64,
                len(nodes),
            )
            return pd.DataFrame({"node": nodes, "color": out})

        def own_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["node"].to_numpy(np.int64),
                    "side": np.int64(1),
                    "node": df["node"].to_numpy(np.int64),
                    "color": df["color"].to_numpy(np.int64),
                }
            )

        def nbr_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["key"].to_numpy(np.int64),
                    "side": np.int64(0),
                    "node": df["other"].to_numpy(np.int64),
                    "color": df["color"].to_numpy(np.int64),
                }
            )

        colors = compact_small(
            _with_coarse_group(
                colors.map_batches(own_rows, batch_format="pandas").union(
                    tagged.map_batches(nbr_rows, batch_format="pandas")
                ),
                "key",
            )
            .groupby("_g")
            .map_groups(rehash, batch_format="pandas")
            .materialize()
        )

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("color", as_index=False).size()
        return pd.DataFrame(
            {
                "color": s["color"].to_numpy(np.int64),
                "n": s["size"].to_numpy(np.int64),
            }
        )

    agg = (
        colors.map_batches(hist, batch_format="pandas")
        .groupby("color")
        .aggregate(Sum("n", alias_name="n_nodes"))
        .to_pandas()  # color classes ≤ n_docs; typically far fewer
    )
    if not len(agg):
        return empty
    out = agg.astype({"color": np.int64, "n_nodes": np.int64})
    return out.sort_values("color").reset_index(drop=True)


def _wl_sql(n_rounds: int = WL_ROUNDS) -> str:
    md5u = _md5u("'lnkk:42:' || CAST(doc_id AS VARCHAR)")
    parts = [
        f"""WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
kk AS (SELECT doc_id, CAST(1 + {md5u} % 4 AS BIGINT) AS k FROM documents),
de AS (
  SELECT DISTINCT doc_id AS src, (doc_id * 37 + j * 101) % cnt AS dst
  FROM (SELECT doc_id, unnest(range(1, k + 1)) AS j FROM kk), n
  WHERE (doc_id * 37 + j * 101) % cnt <> doc_id),
e0 AS (SELECT src, dst FROM de UNION SELECT dst, src FROM de),
c0 AS (
  SELECT d.doc_id AS v,
         CAST(COALESCE(g.deg, 0) AS BIGINT) AS color
  FROM documents d
  LEFT JOIN (SELECT src, COUNT(*) AS deg FROM e0 GROUP BY 1) g
    ON g.src = d.doc_id)"""
    ]
    hashx = (
        "CAST(concat('0x', substr(md5({expr}), 1, 16)) AS UBIGINT) // 2"
    )
    for t in range(1, n_rounds + 1):
        expr = (
            f"CAST(c{t - 1}.color AS VARCHAR) || '|' || "
            f"COALESCE(m{t}.nbrs, '')"
        )
        parts.append(
            f"""m{t} AS (
  SELECT e0.dst AS v,
         string_agg(CAST(cs.color AS VARCHAR), ','
                    ORDER BY cs.color) AS nbrs
  FROM e0 JOIN c{t - 1} cs ON cs.v = e0.src
  GROUP BY 1),
c{t} AS (
  SELECT c{t - 1}.v,
         CAST({hashx.format(expr=expr)} AS BIGINT) AS color
  FROM c{t - 1} LEFT JOIN m{t} ON m{t}.v = c{t - 1}.v)"""
        )
    parts.append(
        f"""SELECT color, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM c{n_rounds} GROUP BY 1"""
    )
    head = ",\n".join(parts[:-1])
    return head + "\n" + parts[-1]


# ====================================================== scan_similarity
#
# SCAN structural similarity per undirected edge (u < v):
# σ(u,v) = |Γ(u) ∩ Γ(v)| / √(|Γ(u)||Γ(v)|) with CLOSED neighbourhoods
# (Γ includes the node). For an edge, |Γ∩| = common open neighbours
# + 2; sizes are degree + 1. To stay integer-exact both engines
# report σ² quantized: sigma2_x1e6 = ⌊10⁶·(cn+2)²/((du+1)(dv+1))⌋ —
# the ε-threshold SCAN clusters with is a monotone function of σ², so
# any clustering decision is preserved.
#
# Scale shape: wedges route to their (u,v) endpoint key and intersect
# with the edge set in ONE union-co-location group; degrees attach
# through the same group (they ride with the edge rows). Wedge volume
# Σd² is the bound — degree-capped at k ≤ 4 by the link rule here;
# salt hub keys at scale.


def q_scan_similarity(sf_dir: str):
    empty = pd.DataFrame(
        {
            "u": pd.Series(dtype=np.int64),
            "v": pd.Series(dtype=np.int64),
            "common": pd.Series(dtype=np.int64),
            "deg_u": pd.Series(dtype=np.int64),
            "deg_v": pd.Series(dtype=np.int64),
            "sigma2_x1e6": pd.Series(dtype=np.int64),
        }
    )
    n_docs = _n_docs(sf_dir)
    if n_docs == 0:
        return empty
    edges = compact_small(_sym_edges(sf_dir, n_docs).materialize())

    # exact degrees + globally deduped adjacency per src
    def dedup_adj(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"]).drop_duplicates(["src", "dst"])
        deg = t.groupby("src")["dst"].transform("size").to_numpy(np.int64)
        out = t.copy()
        out["deg"] = deg
        return out

    adj = compact_small(
        _with_coarse_group(edges, "src")
        .groupby("_g")
        .map_groups(dedup_adj, batch_format="pandas")
        .materialize()  # (src, dst, deg_src) — wedge + edge source
    )

    # wedges through middle node w: for each pair of w's neighbours
    # (u < v) emit one wedge row keyed (u, v)
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
                    "deg": pd.Series(dtype=np.int64),
                }
            )
        u = np.concatenate(us)
        v = np.concatenate(vs)
        return pd.DataFrame(
            {
                "u": u,
                "v": v,
                "kind": np.zeros(len(u), np.int64),  # wedge
                "deg": np.zeros(len(u), np.int64),
            }
        )

    wed = (
        _with_coarse_group(adj, "src")
        .groupby("_g")
        .map_groups(wedges, batch_format="pandas")
    )

    # edge rows (u < v) with both endpoint degrees: src-side deg rides
    # along; dst-side degree arrives via the mirrored direction row.
    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["src"] < df["dst"]]
        return pd.DataFrame(
            {
                "u": e["src"].to_numpy(np.int64),
                "v": e["dst"].to_numpy(np.int64),
                "kind": np.ones(len(e), np.int64),  # edge, deg = deg_u
                "deg": e["deg"].to_numpy(np.int64),
            }
        )

    def edge_rows_rev(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["src"] > df["dst"]]
        return pd.DataFrame(
            {
                "u": e["dst"].to_numpy(np.int64),
                "v": e["src"].to_numpy(np.int64),
                "kind": np.full(len(e), 2, np.int64),  # edge, deg = deg_v
                "deg": e["deg"].to_numpy(np.int64),
            }
        )

    def pair_key(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["pk"] = (out["u"].to_numpy(np.int64) << np.int64(32)) | out[
            "v"
        ].to_numpy(np.int64)
        return out

    unioned = (
        wed.union(adj.map_batches(edge_rows, batch_format="pandas"))
        .union(adj.map_batches(edge_rows_rev, batch_format="pandas"))
        .map_batches(pair_key, batch_format="pandas")
    )

    def intersect(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        e1 = t[t["kind"] == 1]
        if not len(e1):
            return empty
        e2 = t[t["kind"] == 2].set_index("pk")["deg"]
        wn = t[t["kind"] == 0].groupby("pk").size()
        u = e1["u"].to_numpy(np.int64)
        v = e1["v"].to_numpy(np.int64)
        du = e1["deg"].to_numpy(np.int64)
        dv = e1["pk"].map(e2).to_numpy(np.int64)
        cn = e1["pk"].map(wn).fillna(0).to_numpy(np.int64)
        s2 = 10**6 * (cn + 2) * (cn + 2) // ((du + 1) * (dv + 1))
        return pd.DataFrame(
            {
                "u": u,
                "v": v,
                "common": cn,
                "deg_u": du,
                "deg_v": dv,
                "sigma2_x1e6": s2,
            }
        )

    return (
        _with_coarse_group(unioned, "pk")
        .groupby("_g")
        .map_groups(intersect, batch_format="pandas")
    )


def _scan_sql() -> str:
    md5u = _md5u("'lnkk:42:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
kk AS (SELECT doc_id, CAST(1 + {md5u} % 4 AS BIGINT) AS k FROM documents),
de AS (
  SELECT DISTINCT doc_id AS src, (doc_id * 37 + j * 101) % cnt AS dst
  FROM (SELECT doc_id, unnest(range(1, k + 1)) AS j FROM kk), n
  WHERE (doc_id * 37 + j * 101) % cnt <> doc_id),
e0 AS (SELECT src, dst FROM de UNION SELECT dst, src FROM de),
deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM e0 GROUP BY 1),
eu AS (SELECT src AS u, dst AS v FROM e0 WHERE src < dst),
cn AS (
  SELECT a.dst AS u, b.dst AS v, CAST(COUNT(*) AS BIGINT) AS common
  FROM e0 a JOIN e0 b ON b.src = a.src AND a.dst < b.dst
  GROUP BY 1, 2)
SELECT eu.u, eu.v,
       CAST(COALESCE(cn.common, 0) AS BIGINT) AS common,
       du.d AS deg_u, dv.d AS deg_v,
       CAST(1000000 * (COALESCE(cn.common, 0) + 2)
            * (COALESCE(cn.common, 0) + 2)
            // ((du.d + 1) * (dv.d + 1)) AS BIGINT) AS sigma2_x1e6
FROM eu
JOIN deg du ON du.v = eu.u
JOIN deg dv ON dv.v = eu.v
LEFT JOIN cn ON cn.u = eu.u AND cn.v = eu.v
"""


# ============================================================ ffl_count
#
# Feed-forward-loop census on the DIRECTED deduped link graph: the
# number of (a→b, b→c, a→c) transitive triads, globally and per
# source node a — the motif whose over-representation separates
# information/regulation networks from random graphs.
#
# Scale shape: two-hop wedges (a→b→c, a≠c) route to their (a,c) key
# and semi-join the closing edge set in ONE union-co-location group;
# per-a counts come back through a bounded second groupby. Wedge
# volume Σ(in·out) is the documented bound.


def q_ffl_count(sf_dir: str):
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype=np.int64),
            "n_ffl": pd.Series(dtype=np.int64),
        }
    )
    n_docs = _n_docs(sf_dir)
    if n_docs == 0:
        return empty
    edges = compact_small(_dir_edges(sf_dir, n_docs).materialize())

    # globally deduped adjacency resident per src-group
    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns=["_g"]).drop_duplicates(["src", "dst"])

    adj = compact_small(
        _with_coarse_group(edges, "src")
        .groupby("_g")
        .map_groups(dedup, batch_format="pandas")
        .materialize()
    )

    # wedges a→b→c: co-locate by middle b (edges keyed dst=b union
    # edges keyed src=b), emit (a, c) pairs
    def in_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["dst"].to_numpy(np.int64),
                "side": np.int64(0),
                "node": df["src"].to_numpy(np.int64),
            }
        )

    def out_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["src"].to_numpy(np.int64),
                "side": np.int64(1),
                "node": df["dst"].to_numpy(np.int64),
            }
        )

    def make_wedges(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        outs = []
        for _, grp in t.groupby("key"):
            a = grp.loc[grp["side"] == 0, "node"].to_numpy(np.int64)
            c = grp.loc[grp["side"] == 1, "node"].to_numpy(np.int64)
            if not len(a) or not len(c):
                continue
            aa = np.repeat(a, len(c))
            cc = np.tile(c, len(a))
            keep = aa != cc
            outs.append((aa[keep], cc[keep]))
        if not outs:
            return pd.DataFrame(
                {
                    "u": pd.Series(dtype=np.int64),
                    "v": pd.Series(dtype=np.int64),
                    "kind": pd.Series(dtype=np.int64),
                }
            )
        u = np.concatenate([o[0] for o in outs])
        v = np.concatenate([o[1] for o in outs])
        return pd.DataFrame(
            {"u": u, "v": v, "kind": np.zeros(len(u), np.int64)}
        )

    wed = (
        _with_coarse_group(
            adj.map_batches(in_rows, batch_format="pandas").union(
                adj.map_batches(out_rows, batch_format="pandas")
            ),
            "key",
        )
        .groupby("_g")
        .map_groups(make_wedges, batch_format="pandas")
    )

    def edge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": df["src"].to_numpy(np.int64),
                "v": df["dst"].to_numpy(np.int64),
                "kind": np.ones(len(df), np.int64),
            }
        )

    def pair_key(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["pk"] = (out["u"].to_numpy(np.int64) << np.int64(32)) | out[
            "v"
        ].to_numpy(np.int64)
        return out

    def close_triads(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        closed = set(t.loc[t["kind"] == 1, "pk"].tolist())
        w = t[t["kind"] == 0]
        hit = w["pk"].isin(closed)
        s = w.loc[hit].groupby("u", as_index=False).size()
        return pd.DataFrame(
            {
                "doc_id": s["u"].to_numpy(np.int64),
                "n": s["size"].to_numpy(np.int64),
            }
        )

    counts = (
        _with_coarse_group(
            wed.union(
                adj.map_batches(edge_pairs, batch_format="pandas")
            ).map_batches(pair_key, batch_format="pandas"),
            "pk",
        )
        .groupby("_g")
        .map_groups(close_triads, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(Sum("n", alias_name="n_ffl"))
        .to_pandas()
    )
    d = _read(sf_dir, "documents", columns=["doc_id"]).to_pandas()
    out = d.merge(
        counts.rename(columns={"doc_id": "doc_id"}), on="doc_id", how="left"
    )
    out["n_ffl"] = out["n_ffl"].fillna(0).astype(np.int64)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _ffl_sql() -> str:
    md5u = _md5u("'lnkk:42:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
kk AS (SELECT doc_id, CAST(1 + {md5u} % 4 AS BIGINT) AS k FROM documents),
e AS (
  SELECT DISTINCT doc_id AS src, (doc_id * 37 + j * 101) % cnt AS dst
  FROM (SELECT doc_id, unnest(range(1, k + 1)) AS j FROM kk), n
  WHERE (doc_id * 37 + j * 101) % cnt <> doc_id),
w AS (
  SELECT a.src AS a, b.dst AS c
  FROM e a JOIN e b ON b.src = a.dst
  WHERE a.src <> b.dst),
f AS (
  SELECT w.a, CAST(COUNT(*) AS BIGINT) AS n_ffl
  FROM w JOIN e ON e.src = w.a AND e.dst = w.c
  GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(f.n_ffl, 0) AS BIGINT) AS n_ffl
FROM documents d LEFT JOIN f ON f.a = d.doc_id
"""


STRUCTGRAPH_SQL_QUERIES: dict[str, tuple] = {
    "wl_refinement": (q_wl_refinement, _wl_sql()),
    "scan_similarity": (q_scan_similarity, _scan_sql()),
    "ffl_count": (q_ffl_count, _ffl_sql()),
}
