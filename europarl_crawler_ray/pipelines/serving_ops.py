"""Serving-side operators (round-5 batch 33): rendezvous-hash shard
placement with its minimal-churn audit (Thaler & Ravishankar 1998),
the t-closeness privacy audit (Li, Li, Venkatasubramanian 2007), and
query-likelihood ranking with Dirichlet smoothing (Zhai & Lafferty
2001) — the placement / compliance / retrieval trio a corpus serves
queries through once built.

Scale idioms: HRW placement is a pure per-batch map (|nodes| string
hashes per key, node domain bounded at 8) with an 8-row count
groupby; t-closeness is (lang, cell) count partials over a fixed
16-cell value histogram with exact-integer EMD on the driver;
QL-Dirichlet is the bm25_rank shape — one reduce pass for corpus
constants broadcast into a scoring map, exact HUGEINT rational
scores (ranking by the probability PRODUCT, which is order-identical
to the log score and needs no float ln), then sort+limit top-k.

Reference parity: the reference serves documents through an
Elasticsearch index with no ranking/placement/privacy surface
(europarl/elasticsearch/); these extend the brief's IR / governance
families.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from .ml_queries import _md5u


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ===================================================== rendezvous_assign
#
# Highest-random-weight (rendezvous) placement: owner(key) =
# argmax_n md5('hrw|key|n') — every router can place every key with
# zero shared state, and when a node dies ONLY its own keys move (the
# HRW minimal-churn guarantee, audited here by computing the
# assignment twice: all 8 nodes, then with node 0 removed). Output
# per node: key count before and after the death of node 0 — the
# after-counts of surviving nodes can only grow, and the sum of
# growth equals node 0's loss.
#
# Scale shape: pure per-batch map (8 hashes per key — the same
# string-kernel floor as the ring router) → 8-row bounded groupby of
# count partials. No exchange touches key ids.

HRW_NODES = 8
HRW_DEAD = 0


def _hrw_hashes(ids: np.ndarray) -> np.ndarray:
    """(len(ids), HRW_NODES) uint64 weight matrix."""
    out = np.empty((len(ids), HRW_NODES), dtype=np.uint64)
    for j, i in enumerate(ids):
        for n in range(HRW_NODES):
            out[j, n] = int(
                hashlib.md5(f"hrw|{int(i)}|{n}".encode()).hexdigest()[:16], 16
            )
    return out

def q_rendezvous_assign(sf_dir: str):
    d = _read(sf_dir, "documents", columns=["doc_id"])
    empty = pd.DataFrame(
        {
            "node": pd.Series(dtype=np.int64),
            "n_keys": pd.Series(dtype=np.int64),
            "n_keys_after": pd.Series(dtype=np.int64),
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        if not len(ids):
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype=np.int64),
                    "k_part": pd.Series(dtype=np.int64),
                    "a_part": pd.Series(dtype=np.int64),
                }
            )
        h = _hrw_hashes(ids)
        full = h.argmax(axis=1)  # ties -> lowest node (argmax first-max)
        h2 = h.copy()
        h2[:, HRW_DEAD] = 0
        after = h2.argmax(axis=1)
        rows = []
        for n in range(HRW_NODES):
            rows.append(
                {
                    "node": n,
                    "k_part": int((full == n).sum()),
                    "a_part": int((after == n).sum()),
                }
            )
        return pd.DataFrame(rows).astype(np.int64)

    c = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("node")
        .aggregate(
            Sum("k_part", alias_name="n_keys"),
            Sum("a_part", alias_name="n_keys_after"),
        )
        .to_pandas()  # <= HRW_NODES rows
    )
    if not len(c):
        return empty
    return c.astype(np.int64).sort_values("node").reset_index(drop=True)


RENDEZVOUS_ASSIGN_SQL = f"""
WITH w AS (
  SELECT doc_id, n,
         {_md5u("'hrw|' || CAST(doc_id AS VARCHAR) || '|' || CAST(n AS VARCHAR)")} AS h
  FROM documents, range({HRW_NODES}) t(n)),
full_a AS (
  SELECT doc_id, n FROM (
    SELECT doc_id, n,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY h DESC, n ASC) AS rk
    FROM w) WHERE rk = 1),
after_a AS (
  SELECT doc_id, n FROM (
    SELECT doc_id, n,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY h DESC, n ASC) AS rk
    FROM w WHERE n <> {HRW_DEAD}) WHERE rk = 1)
SELECT CAST(t.n AS BIGINT) AS node,
       CAST(COALESCE(f.c, 0) AS BIGINT) AS n_keys,
       CAST(COALESCE(a.c, 0) AS BIGINT) AS n_keys_after
FROM range({HRW_NODES}) t(n)
LEFT JOIN (SELECT n, COUNT(*) AS c FROM full_a GROUP BY 1) f ON f.n = t.n
LEFT JOIN (SELECT n, COUNT(*) AS c FROM after_a GROUP BY 1) a ON a.n = t.n
"""


# ===================================================== t_closeness_audit
#
# t-closeness (Li, Li, Venkatasubramanian 2007): for each
# quasi-identifier group (lang), the Earth-Mover's-Distance between
# the group's sensitive-value distribution and the GLOBAL one, over
# the ordered 16-cell length histogram (cell = min(n_chars//256, 15))
# with unit adjacent-cell ground distance, normalized to [0,1] by
# (cells−1). Exact integer: EMD numerator Σ_j |Σ_{i≤j}(g_i·N −
# q_i·n_g)|, so t_ppm = 10⁶·Σ|cum| // (n_g·N·(C−1)) — completes the
# k_anon_audit / l_diversity privacy trio.
#
# Scale shape: per-batch (lang, cell) count partials over the fixed
# 16-cell domain → ≤|langs|·16-row groupby → exact Python-int driver
# math over the bounded grid.

TCLOSE_CELL = 256
TCLOSE_MAXCELL = 15


def q_t_closeness_audit(sf_dir: str):
    d = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    empty = pd.DataFrame(
        {
            "lang": pd.Series(dtype=object),
            "n_rows": pd.Series(dtype=np.int64),
            "t_ppm": pd.Series(dtype=np.int64),
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cell = np.minimum(
            df["n_chars"].to_numpy(np.int64) // TCLOSE_CELL, TCLOSE_MAXCELL
        )
        t = pd.DataFrame({"lang": df["lang"].astype(object), "cell": cell})
        g = t.groupby(["lang", "cell"], as_index=False).size()
        return pd.DataFrame(
            {
                "lang": g["lang"].astype(object),
                "cell": g["cell"].astype(np.int64),
                "n_part": g["size"].astype(np.int64),
            }
        )

    c = (
        d.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "cell"])
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()  # <= |langs| x 16 rows
    )
    if not len(c):
        return empty
    cells = np.sort(c["cell"].unique())
    q = c.groupby("cell")["n"].sum().reindex(cells, fill_value=0)
    n_total = int(q.sum())
    n_cells = len(cells)
    rows = []
    for lang, grp in c.groupby("lang"):
        g = grp.set_index("cell")["n"].reindex(cells, fill_value=0)
        ng = int(g.sum())
        cum, acc = 0, 0
        for cl in cells:
            acc += int(g[cl]) * n_total - int(q[cl]) * ng
            cum += abs(acc)
        t_ppm = (
            1_000_000 * cum // (ng * n_total * (n_cells - 1))
            if n_cells > 1 and ng > 0
            else 0
        )
        rows.append({"lang": lang, "n_rows": ng, "t_ppm": t_ppm})
    out = pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["t_ppm"] = out["t_ppm"].astype(np.int64)
    return out


T_CLOSENESS_AUDIT_SQL = f"""
WITH cnt AS (
  SELECT lang, LEAST(n_chars // {TCLOSE_CELL}, {TCLOSE_MAXCELL}) AS cell,
         CAST(COUNT(*) AS HUGEINT) AS n
  FROM documents GROUP BY 1, 2),
gl AS (SELECT cell, SUM(n) AS q FROM cnt GROUP BY 1),
lg AS (SELECT lang, SUM(n) AS ng FROM cnt GROUP BY 1),
tot AS (SELECT SUM(q) AS nt, CAST(COUNT(*) AS HUGEINT) AS c
        FROM gl),
grid AS (
  SELECT l.lang, g.cell, g.q, l.ng, COALESCE(cnt.n, 0) AS gi
  FROM lg l CROSS JOIN gl g
  LEFT JOIN cnt ON cnt.lang = l.lang AND cnt.cell = g.cell),
cum AS (
  SELECT lang, ng,
         SUM(gi * (SELECT nt FROM tot) - q * ng)
           OVER (PARTITION BY lang ORDER BY cell) AS acc
  FROM grid)
SELECT lang,
       CAST(MAX(ng) AS BIGINT) AS n_rows,
       CAST(CASE WHEN (SELECT c FROM tot) > 1 AND MAX(ng) > 0
            THEN 1000000 * SUM(ABS(acc))
                 // (MAX(ng) * (SELECT nt FROM tot)
                     * ((SELECT c FROM tot) - 1))
            ELSE 0 END AS BIGINT) AS t_ppm
FROM cum GROUP BY lang
"""


# ===================================================== ql_dirichlet_rank
#
# Query-likelihood ranking with Dirichlet smoothing (Zhai & Lafferty
# 2001): p(Q|d) = Π_t (tf_t + μ·cf_t/|C|) / (dl + μ). Ranking by the
# PRODUCT is order-identical to the usual log score, so the exact
# HUGEINT rational num = Π_t (tf_t·|C| + μ·cf_t),
# den = (|C|·(dl+μ))^|Q| replaces the float ln entirely (the
# bm25_rank exact-fraction precedent); the reported score is
# floor(10¹² · num / den). SQL headroom: safe through |C| ≈ 10⁹
# tokens in HUGEINT; the Ray side is unbounded Python int (the
# natural_breaks precedent for documenting the oracle's range).
#
# Scale shape: per-batch (doc, tf_t, dl) combiner for the fixed query
# terms; corpus constants (|C|, cf_t) from ONE reduce broadcast into
# the scoring map; top-k is sort+limit on the narrow scored table.

QL_QUERY = ["merge", "window"]
QL_MU = 50
QL_TOPK = 10


def q_ql_dirichlet_rank(sf_dir: str):
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])
    empty = pd.DataFrame(
        {
            "rank": pd.Series(dtype=np.int64),
            "doc_id": pd.Series(dtype=np.int64),
            "score_x1e12": pd.Series(dtype=np.int64),
        }
    )

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        toks = [str(t).split(" ") if t else [] for t in df["text"].tolist()]
        out = {
            "doc_id": ids,
            "dl": np.array([len(ts) for ts in toks], dtype=np.int64),
        }
        for i, qt in enumerate(QL_QUERY):
            out[f"tf{i}"] = np.array(
                [ts.count(qt) for ts in toks], dtype=np.int64
            )
        return pd.DataFrame(out)

    scored_input = d.map_batches(stats, batch_format="pandas").materialize()
    cols = ["dl"] + [f"tf{i}" for i in range(len(QL_QUERY))]
    tot = scored_input.sum(cols)
    if tot is None:
        return empty
    c_total = int(tot["sum(dl)"] or 0)
    cfs = [int(tot[f"sum(tf{i})"] or 0) for i in range(len(QL_QUERY))]
    if c_total == 0:
        return empty
    const_ref = ray.put((c_total, cfs))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        c_tot, cfs_ = ray.get(const_ref)
        dl = df["dl"].to_numpy(np.int64)
        tfs = [df[f"tf{i}"].to_numpy(np.int64) for i in range(len(QL_QUERY))]
        vals = []
        for j in range(len(df)):
            num = 1
            for i in range(len(QL_QUERY)):
                num *= int(tfs[i][j]) * c_tot + QL_MU * cfs_[i]
            den = (c_tot * (int(dl[j]) + QL_MU)) ** len(QL_QUERY)
            vals.append(10**12 * num // den if den else 0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "score_x1e12": np.array(vals, dtype=np.int64),
            }
        )

    top = (
        scored_input.map_batches(score, batch_format="pandas")
        .sort(["score_x1e12", "doc_id"], descending=[True, False])
        .limit(QL_TOPK)
        .to_pandas()
    )
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top


def _ql_sql() -> str:
    tf_cols = []
    num_terms = []
    for i, qt in enumerate(QL_QUERY):
        tf_cols.append(
            f"CAST(len(list_filter(string_split(text, ' '),"
            f" w -> w = '{qt}')) AS HUGEINT) AS tf{i}"
        )
        num_terms.append(
            f"(s.tf{i} * c.ct + {QL_MU} * c.cf{i})"
        )
    cf_sel = ", ".join(f"SUM(tf{i}) AS cf{i}" for i in range(len(QL_QUERY)))
    num = " * ".join(num_terms)
    k = len(QL_QUERY)
    den = " * ".join([f"(c.ct * (s.dl + {QL_MU}))"] * k)
    return f"""
WITH s AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS HUGEINT) AS dl,
         {", ".join(tf_cols)}
  FROM documents),
c AS (SELECT SUM(dl) AS ct, {cf_sel} FROM s),
scored AS (
  SELECT s.doc_id,
         CAST(1000000000000 * ({num}) // ({den}) AS BIGINT) AS score_x1e12
  FROM s, c)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_x1e12 DESC, doc_id ASC)
            AS BIGINT) AS rank,
       doc_id, score_x1e12
FROM scored
ORDER BY score_x1e12 DESC, doc_id ASC
LIMIT {QL_TOPK}
"""


QL_DIRICHLET_RANK_SQL = _ql_sql()


SERVING_SQL_QUERIES: dict[str, tuple] = {
    "rendezvous_assign": (q_rendezvous_assign, RENDEZVOUS_ASSIGN_SQL),
    "t_closeness_audit": (q_t_closeness_audit, T_CLOSENESS_AUDIT_SQL),
    "ql_dirichlet_rank": (q_ql_dirichlet_rank, QL_DIRICHLET_RANK_SQL),
}
