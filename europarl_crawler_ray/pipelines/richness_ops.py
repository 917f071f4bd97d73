"""Richness / capture-recapture operators (round-5 batch 51): the
Chao1 species-richness lower bound (Chao 1984), the Lincoln-Petersen
two-sample abundance estimate (Petersen 1896; Lincoln 1930), and the
Schnabel multi-sample census (Schnabel 1938) — the "how much corpus
have we NOT crawled yet" estimators: vocabulary richness from
count-of-counts, and total-shingle-population estimates from treating
doc_id splits as capture occasions.

All three are exact-integer: Chao1's n₁²/(2n₂) bias term quantizes
×100 (with the n₂=0 fallback n₁(n₁−1)/2 both engines share);
Lincoln-Petersen is n₁·n₂ // m; Schnabel is ΣC_t·M_t // ΣR_t — and
the capture bookkeeping reduces per shingle to a 4-bit OCCASION
PATTERN, so the whole multi-sample census is a 16-row pattern table.

Scale idioms: one coarse token/shingle exchange each; Chao1 ships
(lang, n₁/n₂/types) partials into a #langs reduce; the capture ops
ship per-shingle half/occasion masks into ≤16-row bounded reduces —
driver math never sees a shingle.

Reference parity: the reference never estimates its frontier's size
(europarl/db has only exact counts); these are the sketch-family
complement (hll_distinct, kmv are the siblings) for the 10^10-URL
regime where "how many pages exist" is itself an estimate.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from .grouping import with_coarse_group as _with_coarse_group

TOK_RE = r"[^ \t\n\r\f]+"
SH_N = 3
SCH_T = 4  # Schnabel capture occasions (doc_id % 4)


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


# ======================================================= chao1_richness
#
# Per language: observed types S, singletons n₁, doubletons n₂, and
# Chao1 = S + n₁²/(2n₂) (or S + n₁(n₁−1)/2 when n₂ = 0), ×100.
#
# Scale shape: (lang, token) partial counts → ONE coarse token
# exchange → per-group (S, n₁, n₂) partials → #langs reduce.


def q_chao1_richness(sf_dir: str):
    empty = pd.DataFrame(
        {
            "lang": pd.Series(dtype=object),
            "s_obs": pd.Series(dtype=np.int64),
            "n1": pd.Series(dtype=np.int64),
            "n2": pd.Series(dtype=np.int64),
            "chao1_x100": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["lang", "text"])
    tok_re = re.compile(TOK_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.lower().str.findall(tok_re)
        n = toks.str.len().to_numpy(np.int64)
        if not n.sum():
            return pd.DataFrame(
                {
                    "lang": pd.Series(dtype=object),
                    "token": pd.Series(dtype=object),
                    "c": pd.Series(dtype=np.int64),
                }
            )
        flat = pd.DataFrame(
            {
                "lang": np.repeat(df["lang"].to_numpy(object), n),
                "token": np.concatenate(
                    [np.array(t, dtype=object) for t in toks]
                ),
            }
        )
        s = flat.groupby(["lang", "token"]).size().reset_index(name="c")
        s["c"] = s["c"].astype(np.int64)
        return s

    def coc(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        s = t.groupby(["lang", "token"], as_index=False)["c"].sum()
        c = s["c"].to_numpy(np.int64)
        s["s_obs"] = np.int64(1)
        s["n1"] = (c == 1).astype(np.int64)
        s["n2"] = (c == 2).astype(np.int64)
        return s.groupby("lang", as_index=False)[["s_obs", "n1", "n2"]].sum()

    agg = (
        _with_coarse_group(
            d.map_batches(partial, batch_format="pandas"), "token"
        )
        .groupby("_g")
        .map_groups(coc, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("s_obs", alias_name="s_obs"),
            Sum("n1", alias_name="n1"),
            Sum("n2", alias_name="n2"),
        )
        .to_pandas()
    )
    if not len(agg):
        return empty
    rows = []
    for _, r in agg.iterrows():
        s, n1, n2 = int(r["s_obs"]), int(r["n1"]), int(r["n2"])
        bias = (
            100 * n1 * n1 // (2 * n2) if n2 > 0 else 100 * n1 * (n1 - 1) // 2
        )
        rows.append((r["lang"], s, n1, n2, 100 * s + bias))
    out = pd.DataFrame(
        rows, columns=["lang", "s_obs", "n1", "n2", "chao1_x100"]
    )
    for c in ("s_obs", "n1", "n2", "chao1_x100"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


CHAO1_RICHNESS_SQL = rf"""
WITH t AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '{TOK_RE}')) AS token
  FROM documents),
c AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
m AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS s_obs,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM c GROUP BY 1)
SELECT lang, s_obs, n1, n2,
       CAST(100 * s_obs
            + CASE WHEN n2 > 0 THEN 100 * n1 * n1 // (2 * n2)
                   ELSE 100 * n1 * (n1 - 1) // 2 END AS BIGINT)
         AS chao1_x100
FROM m
"""


def _doc_shingle_rows(sf_dir: str, tag_col: str, mod: int) -> ray.data.Dataset:
    """(shingle, tag) distinct rows; tag = doc_id % mod."""
    d = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tok_re = re.compile(TOK_RE)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        shs, tags = [], []
        for did, text in zip(
            df["doc_id"].to_numpy(np.int64), df["text"].astype(str)
        ):
            ws = tok_re.findall(text.lower())
            if len(ws) < SH_N:
                continue
            uniq = {
                " ".join(ws[i : i + SH_N]) for i in range(len(ws) - SH_N + 1)
            }
            shs.extend(uniq)
            tags.extend([int(did) % mod] * len(uniq))
        out = pd.DataFrame(
            {
                "token": np.asarray(shs, dtype=object),
                tag_col: np.asarray(tags, dtype=np.int64),
            }
        )
        return out.drop_duplicates()

    return d.map_batches(expand, batch_format="pandas")


# ===================================================== lincoln_petersen
#
# Two "captures" of the shingle population — the even-doc half marks,
# the odd-doc half recaptures: N̂ = n₁·n₂ // m (−1 when no overlap).
# The exact distinct union rides along as the audit column.
#
# Scale shape: ONE coarse shingle exchange → per-group (n_a, n_b, m,
# union) partials → 4-scalar reduce.


def q_lincoln_petersen(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_a": pd.Series(dtype=np.int64),
            "n_b": pd.Series(dtype=np.int64),
            "m": pd.Series(dtype=np.int64),
            "estimate": pd.Series(dtype=np.int64),
            "exact_total": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    rows = _doc_shingle_rows(sf_dir, "half", 2)

    def counts(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"]).drop_duplicates(["token", "half"])
        m = t.groupby("token")["half"].agg(["nunique", "min"])
        both = int((m["nunique"] == 2).sum())
        in_a = int(
            ((m["nunique"] == 2) | (m["min"] == 0)).sum()
        )
        in_b = int(((m["nunique"] == 2) | (m["min"] == 1)).sum())
        return pd.DataFrame(
            {
                "n_a": [np.int64(in_a)],
                "n_b": [np.int64(in_b)],
                "m": [np.int64(both)],
                "total": [np.int64(len(m))],
            }
        )

    agg = (
        _with_coarse_group(rows, "token")
        .groupby("_g")
        .map_groups(counts, batch_format="pandas")
        .to_pandas()
    )
    n_a, n_b = int(agg["n_a"].sum()), int(agg["n_b"].sum())
    m = int(agg["m"].sum())
    total = int(agg["total"].sum())
    est = n_a * n_b // m if m > 0 else -1
    return pd.DataFrame(
        {
            "n_a": [np.int64(n_a)],
            "n_b": [np.int64(n_b)],
            "m": [np.int64(m)],
            "estimate": [np.int64(est)],
            "exact_total": [np.int64(total)],
        }
    )


_SHINGLE_SQL = rf"""
w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOK_RE}') AS ws
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         ws[CAST(i.i AS INTEGER)] || ' ' || ws[CAST(i.i AS INTEGER) + 1]
           || ' ' || ws[CAST(i.i AS INTEGER) + 2] AS token
  FROM w, unnest(range(1, len(ws) - 1)) AS i(i))
"""

LINCOLN_PETERSEN_SQL = f"""
WITH {_SHINGLE_SQL},
h AS (
  SELECT token,
         MAX(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS a,
         MAX(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS b
  FROM sh GROUP BY 1),
k AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n_a,
         CAST(SUM(b) AS BIGINT) AS n_b,
         CAST(SUM(a * b) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS exact_total
  FROM h)
SELECT n_a, n_b, m,
       CAST(CASE WHEN m > 0 THEN n_a * n_b // m ELSE -1 END AS BIGINT)
         AS estimate,
       exact_total
FROM k
"""


# ====================================================== schnabel_census
#
# Four capture occasions (doc_id % 4, processed in order): at
# occasion t, C_t shingles are captured, R_t of them were already
# marked, M_t were marked before t; N̂ = Σ C_t·M_t // Σ R_t. Every
# term derives from each shingle's 4-bit occasion pattern, so the
# whole census reduces to a 16-row pattern table.


def q_schnabel_census(sf_dir: str):
    empty = pd.DataFrame(
        {
            "sum_cm": pd.Series(dtype=np.int64),
            "sum_r": pd.Series(dtype=np.int64),
            "estimate": pd.Series(dtype=np.int64),
            "exact_total": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    rows = _doc_shingle_rows(sf_dir, "occ", SCH_T)

    def patterns(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"]).drop_duplicates(["token", "occ"])
        mask = t.groupby("token")["occ"].agg(
            lambda s: int(np.bitwise_or.reduce(1 << s.to_numpy(np.int64)))
        )
        s = pd.Series(mask).value_counts()
        return pd.DataFrame(
            {
                "pattern": s.index.to_numpy(np.int64),
                "n": s.to_numpy(np.int64),
            }
        )

    agg = (
        _with_coarse_group(rows, "token")
        .groupby("_g")
        .map_groups(patterns, batch_format="pandas")
        .groupby("pattern")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= 16 rows
    )
    pat = dict(zip(agg["pattern"].astype(int), agg["n"].astype(int)))
    total = sum(pat.values())
    sum_cm = sum_r = 0
    for t in range(SCH_T):
        c_t = sum(n for p, n in pat.items() if p & (1 << t))
        m_t = sum(
            n
            for p, n in pat.items()
            if p & ((1 << t) - 1)  # marked before t
        )
        r_t = sum(
            n
            for p, n in pat.items()
            if (p & (1 << t)) and (p & ((1 << t) - 1))
        )
        sum_cm += c_t * m_t
        sum_r += r_t
    est = sum_cm // sum_r if sum_r > 0 else -1
    return pd.DataFrame(
        {
            "sum_cm": [np.int64(sum_cm)],
            "sum_r": [np.int64(sum_r)],
            "estimate": [np.int64(est)],
            "exact_total": [np.int64(total)],
        }
    )


def _schnabel_sql() -> str:
    ct = " + ".join(
        f"""(SELECT CAST(SUM(CASE WHEN p & {1 << t} > 0 THEN n ELSE 0 END)
     * SUM(CASE WHEN p & {(1 << t) - 1} > 0 THEN n ELSE 0 END)
     AS BIGINT) FROM pat)"""
        for t in range(SCH_T)
    )
    rt = " + ".join(
        f"""(SELECT CAST(SUM(CASE WHEN p & {1 << t} > 0
                        AND p & {(1 << t) - 1} > 0 THEN n ELSE 0 END)
     AS BIGINT) FROM pat)"""
        for t in range(SCH_T)
    )
    return f"""
WITH {_SHINGLE_SQL},
pm AS (
  SELECT token,
         CAST(SUM(DISTINCT CAST(1 AS BIGINT) << CAST(doc_id % {SCH_T} AS INTEGER))
              AS BIGINT) AS p
  FROM sh GROUP BY 1),
pat AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM pm GROUP BY 1),
k AS (
  SELECT CAST({ct} AS BIGINT) AS sum_cm,
         CAST({rt} AS BIGINT) AS sum_r,
         CAST((SELECT SUM(n) FROM pat) AS BIGINT) AS exact_total)
SELECT sum_cm, sum_r,
       CAST(CASE WHEN sum_r > 0 THEN sum_cm // sum_r ELSE -1 END AS BIGINT)
         AS estimate,
       exact_total
FROM k
"""


RICHNESS_SQL_QUERIES: dict[str, tuple] = {
    "chao1_richness": (q_chao1_richness, CHAO1_RICHNESS_SQL),
    "lincoln_petersen": (q_lincoln_petersen, LINCOLN_PETERSEN_SQL),
    "schnabel_census": (q_schnabel_census, _schnabel_sql()),
}
