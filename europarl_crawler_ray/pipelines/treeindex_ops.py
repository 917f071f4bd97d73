"""Tree-index operators (round-5 batch 68): treap node depths
(Seidel & Aragon 1996 — the md5 priorities make the random BST
deterministic, and depth(v) counts the interval-maximum ancestors),
PR-quadtree settle depths (Finkel & Bentley 1974 — the level at
which a point's cell holds ≤ C points), and the B-tree
height/fan-out table (Bayer & McCreight 1972 closed forms) — the
three index geometries a storage engine chooses between, measured
on the corpus's own key distribution.

Determinization: treap priorities are md5('tp:<value>'); the
ancestor rule (u is an ancestor of v iff prio[u] beats every prio
strictly between u and v, and beats prio[v]) is evaluated
identically in both engines; quadtree cells are coordinate shifts;
B-tree heights are integer ceil-log closed forms via repeated
division.

Scale idioms: treap lives on the DISTINCT-value domain (bounded —
a treap indexes keys, not rows) with the driver building the tree
by the O(D) stack construction; the quadtree needs per-level cell
counts — one (level, cell)-keyed exchange emits them and a second
union-co-location join assigns each point its settle depth;
B-tree math is driver arithmetic over the distinct count.

Reference parity: the reference delegates indexing to Postgres
B-trees blindly (europarl/db/); these make the choice measurable
(learned_index_error is the sibling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from ..stages.multimodal import _md5_64
from .grouping import with_coarse_group as _with_coarse_group
from .ml_queries import _md5u

QT_LEVELS = 8  # quadtree levels 1..8 (cell = coords >> (16 - l))
QT_CAP = 4  # leaf capacity
BT_FANOUTS = (16, 64, 256)


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


# =========================================================== treap_depth
#
# Keys = distinct n_chars values; priorities md5. The root has depth
# 0. Output per key: (value, depth) plus the count of docs at that
# key. The O(D) stack build is the driver construction; the oracle
# uses the interval-maximum ancestor characterization.


def q_treap_depth(sf_dir: str):
    empty = pd.DataFrame(
        {
            "value": pd.Series(dtype=np.int64),
            "n_docs": pd.Series(dtype=np.int64),
            "depth": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.Series(df["n_chars"].to_numpy(np.int64)).value_counts()
        return pd.DataFrame(
            {
                "value": s.index.to_numpy(np.int64),
                "n": s.to_numpy(np.int64),
            }
        )

    hist = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("value")
        .reset_index(drop=True)
    )
    vals = hist["value"].to_numpy(np.int64)
    prio = np.fromiter(
        (_md5_64(f"tp:{int(v)}") for v in vals), np.uint64, len(vals)
    )
    # right-spine stack build (keys ascending): parent links
    parent = [-1] * len(vals)
    stack: list[int] = []
    for i in range(len(vals)):
        last = -1
        while stack and prio[stack[-1]] < prio[i]:
            last = stack.pop()
        if last >= 0:
            parent[last] = i
        if stack:
            parent[i] = stack[-1]
        stack.append(i)
    depth = [0] * len(vals)

    def get_depth(i: int) -> int:
        chain = []
        while i >= 0 and depth[i] == 0 and parent[i] >= 0:
            chain.append(i)
            i = parent[i]
        base = depth[i] if i >= 0 else 0
        for j in reversed(chain):
            base += 1
            depth[j] = base
        return base

    for i in range(len(vals)):
        get_depth(i)
    return pd.DataFrame(
        {
            "value": vals,
            "n_docs": hist["n"].to_numpy(np.int64),
            "depth": np.asarray(depth, np.int64),
        }
    ).astype(np.int64)


def _treap_sql() -> str:
    prio = _md5u("'tp:' || CAST(value AS VARCHAR)")
    prio_u = _md5u("'tp:' || CAST(u.value AS VARCHAR)")
    prio_v = _md5u("'tp:' || CAST(v.value AS VARCHAR)")
    prio_w = _md5u("'tp:' || CAST(w.value AS VARCHAR)")
    return f"""
WITH h AS (
  SELECT CAST(n_chars AS BIGINT) AS value,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1),
anc AS (
  SELECT v.value,
         CAST(COUNT(*) AS BIGINT) AS depth
  FROM h v JOIN h u ON u.value <> v.value
  WHERE {prio_u} > {prio_v}
    AND NOT EXISTS (
      SELECT 1 FROM h w
      WHERE w.value > LEAST(u.value, v.value)
        AND w.value < GREATEST(u.value, v.value)
        AND {prio_w} > {prio_u})
  GROUP BY 1)
SELECT h.value, h.n AS n_docs,
       CAST(COALESCE(anc.depth, 0) AS BIGINT) AS depth
FROM h LEFT JOIN anc ON anc.value = h.value
"""


# ======================================================== quadtree_depth
#
# Point (x, y) = (n_chars & 0xFFFF, doc_id & 0xFFFF); at level l the
# cell is (x >> (16−l), y >> (16−l)). The settle depth is the
# SMALLEST level whose cell holds ≤ QT_CAP points (capped at
# QT_LEVELS when even the deepest cell is crowded). Output: the
# (depth, n_points) histogram.
#
# Scale shape: each point emits its QT_LEVELS (level, cell) keys →
# ONE coarse exchange counts cells; a second union-co-location join
# hands every point its per-level counts and the min qualifying
# level — per-point state never exceeds QT_LEVELS rows.


def q_quadtree_depth(sf_dir: str):
    empty = pd.DataFrame(
        {
            "depth": pd.Series(dtype=np.int64),
            "n_points": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        x = df["n_chars"].to_numpy(np.int64) & 0xFFFF
        y = ids & 0xFFFF
        rows = {"key": [], "doc_id": [], "lvl": []}
        for l in range(1, QT_LEVELS + 1):
            sh = 16 - l
            ck = ((x >> sh) << np.int64(20)) | (y >> sh)
            key = (np.int64(l) << np.int64(40)) | ck
            rows["key"].append(key)
            rows["doc_id"].append(ids)
            rows["lvl"].append(np.full(len(ids), l, np.int64))
        return pd.DataFrame(
            {
                "key": np.concatenate(rows["key"]),
                "doc_id": np.concatenate(rows["doc_id"]),
                "lvl": np.concatenate(rows["lvl"]),
            }
        )

    pts = d.map_batches(cells, batch_format="pandas").materialize()

    def cell_counts(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        s = t.groupby("key", as_index=False).size()
        return pd.DataFrame(
            {
                "key": s["key"].to_numpy(np.int64),
                "side": np.ones(len(s), np.int64),
                "doc_id": np.full(len(s), -1, np.int64),
                "lvl": np.zeros(len(s), np.int64),
                "cnt": s["size"].to_numpy(np.int64),
            }
        )

    counts = (
        _with_coarse_group(pts, "key")
        .groupby("_g")
        .map_groups(cell_counts, batch_format="pandas")
    )

    def pt_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["key"].to_numpy(np.int64),
                "side": np.zeros(len(df), np.int64),
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "lvl": df["lvl"].to_numpy(np.int64),
                "cnt": np.zeros(len(df), np.int64),
            }
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        cm = t[t["side"] == 1].set_index("key")["cnt"]
        p = t[t["side"] == 0]
        return pd.DataFrame(
            {
                "doc_id": p["doc_id"].to_numpy(np.int64),
                "lvl": p["lvl"].to_numpy(np.int64),
                "cnt": p["key"].map(cm).to_numpy(np.int64),
            }
        )

    per_pt = (
        _with_coarse_group(
            pts.map_batches(pt_rows, batch_format="pandas").union(counts),
            "key",
        )
        .groupby("_g")
        .map_groups(attach, batch_format="pandas")
    )

    def settle(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        rows = []
        for did, grp in t.groupby("doc_id"):
            ok = grp[grp["cnt"] <= QT_CAP]
            depth = (
                int(ok["lvl"].min()) if len(ok) else QT_LEVELS
            )
            rows.append(depth)
        s = pd.Series(rows).value_counts()
        return pd.DataFrame(
            {
                "depth": s.index.to_numpy(np.int64),
                "n": s.to_numpy(np.int64),
            }
        )

    agg = (
        _with_coarse_group(per_pt, "doc_id")
        .groupby("_g")
        .map_groups(settle, batch_format="pandas")
        .groupby("depth")
        .aggregate(Sum("n", alias_name="n_points"))
        .to_pandas()
    )
    agg["depth"] = agg["depth"].astype(np.int64)
    agg["n_points"] = agg["n_points"].astype(np.int64)
    return agg.sort_values("depth").reset_index(drop=True)


def _quadtree_sql() -> str:
    lvls = ", ".join(str(l) for l in range(1, QT_LEVELS + 1))
    return f"""
WITH pts AS (
  SELECT doc_id,
         CAST(n_chars & 65535 AS BIGINT) AS x,
         CAST(doc_id & 65535 AS BIGINT) AS y
  FROM documents),
pl AS (
  SELECT doc_id, CAST(l.l AS BIGINT) AS lvl,
         ((x >> CAST(16 - l.l AS INTEGER)) << 20)
         | (y >> CAST(16 - l.l AS INTEGER)) AS ck
  FROM pts, unnest([{lvls}]) AS l(l)),
cc AS (
  SELECT lvl, ck, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pl GROUP BY 1, 2),
st AS (
  SELECT pl.doc_id,
         CAST(COALESCE(MIN(CASE WHEN cc.cnt <= {QT_CAP}
                                THEN pl.lvl END), {QT_LEVELS})
              AS BIGINT) AS depth
  FROM pl JOIN cc ON cc.lvl = pl.lvl AND cc.ck = pl.ck
  GROUP BY 1)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_points
FROM st GROUP BY 1
"""


# ======================================================= btree_heights
#
# For each fanout F: the height of a B-tree indexing the corpus's
# DISTINCT keys (⌈log_F⌉ by repeated division; height 1 = a single
# leaf) and the leaf count ⌈D / F⌉. Driver closed forms over the
# 1-scalar distinct count.


def q_btree_heights(sf_dir: str):
    empty = pd.DataFrame(
        {
            "fanout": pd.Series(dtype=np.int64),
            "n_keys": pd.Series(dtype=np.int64),
            "height": pd.Series(dtype=np.int64),
            "n_leaves": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["n_chars"])

    def distinct_part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"value": np.unique(df["n_chars"].to_numpy(np.int64))}
        )

    def vcount(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"v": [np.int64(g["value"].nunique())]}
        )

    n_keys = int(
        _with_coarse_group(
            d.map_batches(distinct_part, batch_format="pandas"), "value"
        )
        .groupby("_g")
        .map_groups(vcount, batch_format="pandas")
        .sum("v")
    )
    rows = []
    for f in BT_FANOUTS:
        h = 1
        cap = f
        while cap < n_keys:
            cap *= f
            h += 1
        rows.append((f, n_keys, h, (n_keys + f - 1) // f))
    return pd.DataFrame(
        rows, columns=["fanout", "n_keys", "height", "n_leaves"]
    ).astype(np.int64)


def _btree_sql() -> str:
    per_f = []
    for f in BT_FANOUTS:
        # height via CASE ladder: smallest h with f^h >= D (h ≤ 8
        # covers any realistic distinct count)
        conds = " ".join(
            f"WHEN d.d <= {f ** h} THEN {h}" for h in range(1, 9)
        )
        per_f.append(
            f"SELECT CAST({f} AS BIGINT) AS fanout, d.d AS n_keys, "
            f"CAST(CASE {conds} ELSE 9 END AS BIGINT) AS height, "
            f"CAST((d.d + {f} - 1) // {f} AS BIGINT) AS n_leaves "
            f"FROM d"
        )
    return f"""
WITH d AS (
  SELECT CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS d FROM documents)
{" UNION ALL ".join(per_f)}
"""


TREEINDEX_SQL_QUERIES: dict[str, tuple] = {
    "treap_depth": (q_treap_depth, _treap_sql()),
    "quadtree_depth": (q_quadtree_depth, _quadtree_sql()),
    "btree_heights": (q_btree_heights, _btree_sql()),
}
