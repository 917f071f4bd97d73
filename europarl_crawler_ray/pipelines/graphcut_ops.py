"""Graph-cut / frontier-priority operators (round-5 batch 25): site
conductance (community quality of the registrable-domain partition),
local-bridge census (Granovetter 1973 weak ties — edges in no
triangle), and an integer UCB1-style host crawl priority.

Scale idioms: per-batch site partials over the bounded 97-site
domain; the bridge census is the triangle node-iterator with one
extra edge-keyed exchange to mark triangle edges distinct; UCB uses
the repo's floor(1e6·ln) quantized-ln device.

Reference parity: the reference crawls one host with a fixed queue
(europarl/db/urls.py); these extend the brief's link-analysis /
crawl-prioritization families.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Sum

from .grouping import with_coarse_group as _with_coarse_group
from .ml_queries import _md5u
from .sitegraph_ops import N_SITES


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


_LNK_MD5U = _md5u("'lnkk:42:' || CAST(doc_id AS VARCHAR)")


# ===================================================== site_conductance
#
# Conductance of each registrable-domain cut: φ(S) = cut(S) /
# min(vol(S), vol(V)−vol(S)) over the directed edge multiset, where
# vol counts edge endpoints in S and cut counts edges with exactly one
# endpoint in S — the community-quality number that says whether site
# boundaries are real link communities (low φ) or arbitrary slices of
# one mesh (φ near 1). All integer; basis-point floor.
#
# Scale shape: every edge contributes to exactly two (or one) site
# partials computed per batch — the 97-site domain bounds the groupby
# and the driver math. Page ids never leave the tasks.


def q_site_conductance(sf_dir: str):
    from .queries import internal_edges_np

    n_docs = _n_docs(sf_dir)
    empty = pd.DataFrame(
        {
            "site": pd.Series(dtype=np.int64),
            "vol": pd.Series(dtype=np.int64),
            "cut": pd.Series(dtype=np.int64),
            "phi_bp": pd.Series(dtype=np.int64),
        }
    )
    if n_docs == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        src, dst = internal_edges_np(ids, n_docs)
        su = src % N_SITES
        sv = dst % N_SITES
        intra = su == sv
        rows: dict[int, list] = {}
        for s, v_add, c_add in (
            *((int(s), 2, 0) for s in su[intra]),
            *((int(s), 1, 1) for s in su[~intra]),
            *((int(s), 1, 1) for s in sv[~intra]),
        ):
            r = rows.setdefault(s, [0, 0])
            r[0] += v_add
            r[1] += c_add
        if not rows:
            return pd.DataFrame(
                {
                    "site": pd.Series(dtype=np.int64),
                    "v_part": pd.Series(dtype=np.int64),
                    "c_part": pd.Series(dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "site": list(rows),
                "v_part": np.array([v[0] for v in rows.values()], np.int64),
                "c_part": np.array([v[1] for v in rows.values()], np.int64),
            }
        )

    c = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("site")
        .aggregate(
            Sum("v_part", alias_name="vol"),
            Sum("c_part", alias_name="cut"),
        )
        .to_pandas()  # <= 97 rows
    )
    if not len(c):
        return empty
    c = c.astype(np.int64)
    vol_total = int(c["vol"].sum())
    rows = []
    for _, r in c.iterrows():
        vol, cut = int(r["vol"]), int(r["cut"])
        den = min(vol, vol_total - vol)
        rows.append(
            (int(r["site"]), vol, cut, cut * 10000 // den if den else 0)
        )
    return (
        pd.DataFrame(rows, columns=["site", "vol", "cut", "phi_bp"])
        .astype(np.int64)
        .sort_values("site")
        .reset_index(drop=True)
    )


SITE_CONDUCTANCE_SQL = f"""
WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
kk AS (SELECT doc_id, CAST(1 + {_LNK_MD5U} % 4 AS BIGINT) AS k FROM documents),
e AS (
  SELECT doc_id AS src, (doc_id * 37 + j * 101) % cnt AS dst
  FROM (SELECT doc_id, unnest(range(1, k + 1)) AS j FROM kk), n),
per_site AS (
  SELECT src % {N_SITES} AS site,
         CASE WHEN src % {N_SITES} = dst % {N_SITES} THEN 2 ELSE 1 END AS v,
         CASE WHEN src % {N_SITES} = dst % {N_SITES} THEN 0 ELSE 1 END AS c
  FROM e
  UNION ALL
  SELECT dst % {N_SITES}, 1, 1 FROM e WHERE src % {N_SITES} <> dst % {N_SITES}),
agg AS (
  SELECT site, CAST(SUM(v) AS BIGINT) AS vol, CAST(SUM(c) AS BIGINT) AS cut
  FROM per_site GROUP BY 1),
tot AS (SELECT CAST(SUM(vol) AS BIGINT) AS vt FROM agg)
SELECT agg.site, agg.vol, agg.cut,
       CAST(CASE WHEN LEAST(agg.vol, tot.vt - agg.vol) > 0
            THEN agg.cut * 10000 // LEAST(agg.vol, tot.vt - agg.vol)
            ELSE 0 END AS BIGINT) AS phi_bp
FROM agg, tot
"""


# ======================================================== local_bridges
#
# Local bridges (Granovetter 1973): undirected edges whose endpoints
# share NO common neighbour — in no triangle — the "weak ties" whose
# removal lengthens paths and through which novel content reaches a
# crawl. A corpus graph that is mostly bridges has no community
# structure for a cluster-dedup to exploit.
#
# Scale shape — the triangle node-iterator with an edge-marking tail:
# canonical edges dedup in the smallest-endpoint bucket, wedges emit
# keyed by their closing node, closed triangles emit their three
# canonical edges; ONE more exchange on the canonical pair co-locates
# marks with edges and each task counts its unmarked (bridge) edges.

_LB_NB = 64


def q_local_bridges(sf_dir: str, n_buckets: int = _LB_NB):
    from .queries import internal_edges_np

    n_docs = _n_docs(sf_dir)
    if n_docs == 0:
        return pd.DataFrame(
            {"n_edges": [0], "n_bridges": [0], "bridge_bp": [0]}
        ).astype(np.int64)
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def canon_edges(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        src, dst = internal_edges_np(ids, n_docs, drop_self=True)
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        e = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
        return e.assign(k=e["a"].to_numpy(np.int64) % n_buckets)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"]).drop_duplicates(["a", "b"])
        rows_u, rows_b, rows_c = [], [], []
        for u, grp in t.groupby("a"):
            nb = np.sort(grp["b"].to_numpy(np.int64))
            if len(nb) >= 2:
                i, j = np.triu_indices(len(nb), k=1)
                rows_u.extend([int(u)] * len(i))
                rows_b.extend(int(x) for x in nb[i])
                rows_c.extend(int(x) for x in nb[j])
        # pass edges through (kind 0) alongside wedges (kind 1) keyed by
        # the wedge's closing smaller node b
        edges = t.assign(kind=np.int64(0), u=np.int64(-1), c=np.int64(-1))
        edges = edges.rename(columns={"a": "key", "b": "other"})[
            ["kind", "key", "other", "u", "c"]
        ]
        wd = pd.DataFrame(
            {
                "kind": np.int64(1),
                "key": np.array(rows_b, np.int64),
                "other": np.array(rows_c, np.int64),
                "u": np.array(rows_u, np.int64),
                "c": np.array(rows_c, np.int64),
            }
        )
        out = pd.concat([edges, wd], ignore_index=True)
        out["k2"] = out["key"].to_numpy(np.int64) % n_buckets
        return out

    def close(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        ed = t[t["kind"] == 0][["key", "other"]].drop_duplicates()
        wd = t[t["kind"] == 1]
        if not len(wd) or not len(ed):
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype=np.int64),
                    "b": pd.Series(dtype=np.int64),
                    "mark": pd.Series(dtype=np.int64),
                }
            )
        j = wd.merge(
            ed.rename(columns={"key": "key", "other": "c"}), on=["key", "c"]
        )
        if not len(j):
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype=np.int64),
                    "b": pd.Series(dtype=np.int64),
                    "mark": pd.Series(dtype=np.int64),
                }
            )
        u = j["u"].to_numpy(np.int64)
        v = j["key"].to_numpy(np.int64)
        w = j["c"].to_numpy(np.int64)
        marks = pd.DataFrame(
            {
                "a": np.concatenate([u, u, v]),
                "b": np.concatenate([v, w, w]),
                "mark": np.ones(3 * len(j), np.int64),
            }
        ).drop_duplicates(["a", "b"])
        return marks

    edges_ds = _with_coarse_group(
        d.map_batches(canon_edges, batch_format="pandas"), "k"
    )
    wedge_ds = edges_ds.groupby("_g").map_groups(
        wedges, batch_format="pandas"
    )
    marks_ds = (
        _with_coarse_group(wedge_ds, "k2")
        .groupby("_g")
        .map_groups(close, batch_format="pandas")
    )

    # final exchange: edges + marks co-located on the canonical pair
    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        src, dst = internal_edges_np(ids, n_docs, drop_self=True)
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        e = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
        return e.assign(mark=np.zeros(len(e), np.int64))

    def tally(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        per = t.groupby(["a", "b"], as_index=False)["mark"].max()
        return pd.DataFrame(
            {
                "e_part": [len(per)],
                "b_part": [int((per["mark"] == 0).sum())],
            }
        ).astype(np.int64)

    def with_pk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["pk"] = (
            out["a"].astype(np.int64).astype(str)
            + "|"
            + out["b"].astype(np.int64).astype(str)
        )
        return out

    unioned = (
        d.map_batches(edge_rows, batch_format="pandas")
        .map_batches(with_pk, batch_format="pandas")
        .union(marks_ds.map_batches(with_pk, batch_format="pandas"))
    )
    c = (
        _with_coarse_group(unioned, "pk")
        .groupby("_g")
        .map_groups(tally, batch_format="pandas")
        .sum(["e_part", "b_part"])
    )
    n_edges = int(c["sum(e_part)"])
    n_bridges = int(c["sum(b_part)"])
    return pd.DataFrame(
        {
            "n_edges": [n_edges],
            "n_bridges": [n_bridges],
            "bridge_bp": [n_bridges * 10000 // n_edges if n_edges else 0],
        }
    ).astype(np.int64)


LOCAL_BRIDGES_SQL = f"""
WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
kk AS (SELECT doc_id, CAST(1 + {_LNK_MD5U} % 4 AS BIGINT) AS k FROM documents),
e AS (
  SELECT doc_id AS src, (doc_id * 37 + j * 101) % cnt AS dst
  FROM (SELECT doc_id, unnest(range(1, k + 1)) AS j FROM kk), n
  WHERE (doc_id * 37 + j * 101) % cnt <> doc_id),
ue AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e),
adj AS (
  SELECT a AS u, b AS v FROM ue UNION ALL SELECT b, a FROM ue),
marked AS (
  SELECT ue.a, ue.b
  FROM ue
  WHERE EXISTS (
    SELECT 1 FROM adj x JOIN adj y ON x.v = y.v
    WHERE x.u = ue.a AND y.u = ue.b)),
agg AS (
  SELECT CAST((SELECT COUNT(*) FROM ue) AS BIGINT) AS n_edges,
         CAST((SELECT COUNT(*) FROM ue)
              - (SELECT COUNT(*) FROM marked) AS BIGINT) AS n_bridges)
SELECT n_edges, n_bridges,
       CAST(CASE WHEN n_edges > 0
            THEN n_bridges * 10000 // n_edges ELSE 0 END AS BIGINT)
           AS bridge_bp
FROM agg
"""


# ==================================================== ucb_host_priority
#
# Integer UCB1-style crawl priority per site: exploit = mean document
# length (the stand-in reward, ×1000 floor), explore = the
# quantized-ln bonus floor(1e6·ln N) // n — a site crawled little gets
# a large bonus, a mined-out site competes on reward alone. The
# documented integer variant of UCB1 (no square root: the bonus decays
# ~1/n rather than 1/√n, trading exploration length for bit-exact
# cross-engine arithmetic).
#
# Scale shape: per-batch (site, n, Σchars) partials → ≤ 97-row groupby
# → driver integer math.


def q_ucb_host_priority(sf_dir: str):
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    empty = pd.DataFrame(
        {
            "site": pd.Series(dtype=np.int64),
            "n_pages": pd.Series(dtype=np.int64),
            "mean_x1000": pd.Series(dtype=np.int64),
            "bonus_x1000": pd.Series(dtype=np.int64),
            "priority_x1000": pd.Series(dtype=np.int64),
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "site": pd.Series(dtype=np.int64),
                    "n_part": pd.Series(dtype=np.int64),
                    "s_part": pd.Series(dtype=np.int64),
                }
            )
        site = df["doc_id"].to_numpy(np.int64) % N_SITES
        out = (
            pd.DataFrame(
                {"site": site, "ch": df["n_chars"].to_numpy(np.int64)}
            )
            .groupby("site", as_index=False)
            .agg(n_part=("ch", "size"), s_part=("ch", "sum"))
        )
        return out.astype(np.int64)

    c = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("site")
        .aggregate(
            Sum("n_part", alias_name="n_pages"),
            Sum("s_part", alias_name="sum_chars"),
        )
        .to_pandas()  # <= 97 rows
    )
    if not len(c):
        return empty
    c = c.astype(np.int64)
    n_total = int(c["n_pages"].sum())
    ln_n = math.floor(1e6 * math.log(n_total)) if n_total > 1 else 0
    rows = []
    for _, r in c.iterrows():
        n, s = int(r["n_pages"]), int(r["sum_chars"])
        mean = s * 1000 // n
        bonus = ln_n // (n * 1000)
        rows.append((int(r["site"]), n, mean, bonus, mean + bonus))
    return (
        pd.DataFrame(
            rows,
            columns=[
                "site",
                "n_pages",
                "mean_x1000",
                "bonus_x1000",
                "priority_x1000",
            ],
        )
        .astype(np.int64)
        .sort_values("site")
        .reset_index(drop=True)
    )


UCB_HOST_PRIORITY_SQL = f"""
WITH per AS (
  SELECT doc_id % {N_SITES} AS site,
         CAST(COUNT(*) AS BIGINT) AS n_pages,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1),
tot AS (
  SELECT CASE WHEN SUM(n_pages) > 1
         THEN CAST(FLOOR(1e6 * ln(SUM(n_pages))) AS BIGINT)
         ELSE 0 END AS ln_n
  FROM per)
SELECT per.site, per.n_pages,
       CAST(per.sum_chars * 1000 // per.n_pages AS BIGINT) AS mean_x1000,
       CAST(tot.ln_n // (per.n_pages * 1000) AS BIGINT) AS bonus_x1000,
       CAST(per.sum_chars * 1000 // per.n_pages
            + tot.ln_n // (per.n_pages * 1000) AS BIGINT) AS priority_x1000
FROM per, tot
"""


GRAPHCUT_SQL_QUERIES: dict[str, tuple] = {
    "site_conductance": (q_site_conductance, SITE_CONDUCTANCE_SQL),
    "local_bridges": (q_local_bridges, LOCAL_BRIDGES_SQL),
    "ucb_host_priority": (q_ucb_host_priority, UCB_HOST_PRIORITY_SQL),
}
