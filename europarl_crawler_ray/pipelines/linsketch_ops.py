"""Linear-sketch operators (round-5 batch 41): the AMS tug-of-war
second-moment estimator (Alon, Matias & Szegedy 1996 — the STOC
best-paper streaming classic), Count-Sketch point estimates
(Charikar, Chen & Farach-Colton 2002), and linear counting (Whang,
Vander-Zanden & Taylor 1990) — three LINEAR sketches, i.e. their
partials add, which is exactly what makes them embarrassing to
distribute: every batch contributes a bounded-size partial and ONE
bounded reduce finishes the sketch.

Scale idioms: AMS ships d=8 signed partial sums (a 8-int vector per
batch); Count-Sketch ships a 3×1024 signed counter table; linear
counting ships set-bit positions of a 4096-bit bitmap — none of the
three ever exchanges the token domain. The EXACT baselines each audit
against (F2 = Σc², true counts of the top-K tokens, true distinct
count) ride the repo's one-coarse-token-exchange shape. All sketch
arithmetic is integer-exact; linear counting's single ln() is the
repo's mirrored-verbatim-float convention (one final expression,
identical text in both engines).

Reference parity: the reference deduplicates with exact Postgres
UNIQUE constraints (europarl/db/urls.py) — sketches are what replaces
that at 10^10-URL scale; these extend the brief's sketch family.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from ..stages.multimodal import _md5_64
from .grouping import global_prune, with_coarse_group as _with_coarse_group
from .ml_queries import _md5u

TOK_RE = r"[^ \t\n\r\f]+"

AMS_D = 8
CS_D = 3
CS_W = 1024
LC_M = 4096


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _batch_token_counts(df: pd.DataFrame, tok_re) -> pd.Series:
    toks = df["text"].astype(str).str.lower().str.findall(tok_re)
    flat = [t for lst in toks for t in lst]
    if not flat:
        return pd.Series(dtype=np.int64)
    return pd.Series(flat).value_counts()


def _exact_token_counts(sf_dir: str) -> ray.data.Dataset:
    """(token, c) exact global counts via ONE coarse token exchange."""
    d = _read(sf_dir, "documents", columns=["text"])
    tok_re = re.compile(TOK_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = _batch_token_counts(df, tok_re)
        return pd.DataFrame(
            {
                "token": s.index.to_numpy(object),
                "c": s.to_numpy(np.int64),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"])
        return t.groupby("token", as_index=False)["c"].sum()

    return (
        _with_coarse_group(
            d.map_batches(partial, batch_format="pandas"), "token"
        )
        .groupby("_g")
        .map_groups(combine, batch_format="pandas")
    )


def _sign(salt: str, j: int, token: str) -> int:
    return 1 if _md5_64(f"{salt}:{j}:{token}") % 2 == 0 else -1


# =============================================================== ams_f2
#
# Tug-of-war: estimator j keeps S_j = Σ_t sign_j(t)·c_t; E[S_j²] = F2.
# Output one row per estimator: S_j, the estimate S_j², the exact
# F2 = Σc², and the relative error ×10⁶ — the table that justifies
# (or rejects) sketch-based join-size/self-join estimation at scale.
#
# Scale shape: the sketch is LINEAR — each batch contributes an 8-int
# partial vector (signs applied to batch-local counts), one bounded
# reduce sums them; the exact F2 rides the coarse token exchange.


def q_ams_f2(sf_dir: str):
    empty = pd.DataFrame(
        {
            "estimator": pd.Series(dtype=np.int64),
            "s": pd.Series(dtype=np.int64),
            "estimate": pd.Series(dtype=np.int64),
            "exact_f2": pd.Series(dtype=np.int64),
            "err_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["text"])
    tok_re = re.compile(TOK_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = _batch_token_counts(df, tok_re)
        out = np.zeros(AMS_D, np.int64)
        for tok, c in s.items():
            for j in range(AMS_D):
                out[j] += _sign("ams", j, tok) * int(c)
        return pd.DataFrame(
            {"estimator": np.arange(AMS_D, dtype=np.int64), "s": out}
        )

    sums = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("estimator")
        .aggregate(Sum("s", alias_name="s"))
        .to_pandas()  # AMS_D rows
    )

    def f2_part(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(np.int64)
        return pd.DataFrame({"f2": [np.int64((c * c).sum())]})

    f2 = int(
        _exact_token_counts(sf_dir)
        .map_batches(f2_part, batch_format="pandas")
        .sum("f2")
    )
    s = sums["s"].to_numpy(np.int64)
    est = s * s
    err = (
        10**6 * np.abs(est - f2) // max(f2, 1)
    )
    out = pd.DataFrame(
        {
            "estimator": sums["estimator"].astype(np.int64),
            "s": s,
            "estimate": est.astype(np.int64),
            "exact_f2": np.full(len(s), f2, np.int64),
            "err_x1e6": err.astype(np.int64),
        }
    )
    return out.sort_values("estimator").reset_index(drop=True)


AMS_F2_SQL = rf"""
WITH t AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOK_RE}')) AS token
  FROM documents),
c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1),
f2 AS (SELECT CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS f2 FROM c),
s AS (
  SELECT CAST(j.j AS BIGINT) AS estimator,
         CAST(SUM(CASE WHEN {_md5u("'ams:' || CAST(j.j AS VARCHAR) || ':' || token")} % 2 = 0
                       THEN c ELSE -c END) AS BIGINT) AS s
  FROM c, unnest(range(0, {AMS_D})) AS j(j)
  GROUP BY 1)
SELECT estimator, s,
       CAST(s * s AS BIGINT) AS estimate,
       f2.f2 AS exact_f2,
       CAST(1000000 * ABS(s * s - f2.f2) // GREATEST(f2.f2, 1) AS BIGINT)
         AS err_x1e6
FROM s, f2
"""


# ========================================================= count_sketch
#
# Count-Sketch point estimation for the CS_TOPK highest-count tokens:
# C[j, h_j(t)] += sign_j(t)·c_t over d=3 rows × w=1024 buckets; the
# estimate for t is the MEDIAN over rows of sign_j(t)·C[j, h_j(t)]
# (median-of-3 computed as a+b+c − max − min: exact integers, no
# interpolating median). Output per top token: exact count, estimate,
# absolute error.
#
# Scale shape: the 3×1024 counter table is the only sketch state —
# per-batch signed partials → 3072-key bounded groupby; the top-K
# truth rides the coarse token exchange + global_prune.

CS_TOPK = 10


def q_count_sketch(sf_dir: str):
    empty = pd.DataFrame(
        {
            "token": pd.Series(dtype=object),
            "exact": pd.Series(dtype=np.int64),
            "estimate": pd.Series(dtype=np.int64),
            "abs_err": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["text"])
    tok_re = re.compile(TOK_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = _batch_token_counts(df, tok_re)
        rows: dict[tuple, int] = {}
        for tok, c in s.items():
            for j in range(CS_D):
                h = _md5_64(f"csh:{j}:{tok}") % CS_W
                rows[(j, h)] = rows.get((j, h), 0) + _sign(
                    "css", j, tok
                ) * int(c)
        if not rows:
            return pd.DataFrame(
                {
                    "j": pd.Series(dtype=np.int64),
                    "h": pd.Series(dtype=np.int64),
                    "v": pd.Series(dtype=np.int64),
                }
            )
        ks = np.array(list(rows.keys()), np.int64)
        return pd.DataFrame(
            {
                "j": ks[:, 0],
                "h": ks[:, 1],
                "v": np.fromiter(rows.values(), np.int64, len(rows)),
            }
        )

    table = (
        d.map_batches(partial, batch_format="pandas")
        .groupby(["j", "h"])
        .aggregate(Sum("v", alias_name="v"))
        .to_pandas()  # <= CS_D * CS_W rows
    )
    cmap = {
        (int(r["j"]), int(r["h"])): int(r["v"]) for _, r in table.iterrows()
    }

    counts = _exact_token_counts(sf_dir)

    def head(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["c"].sum()
        return g.sort_values(
            ["c", "token"], ascending=[False, True], kind="mergesort"
        ).head(CS_TOPK)

    top = global_prune(counts, head)
    if not len(top):
        return empty
    rows = []
    for _, r in top.iterrows():
        tok = r["token"]
        ests = sorted(
            _sign("css", j, tok)
            * cmap.get((j, _md5_64(f"csh:{j}:{tok}") % CS_W), 0)
            for j in range(CS_D)
        )
        med = ests[CS_D // 2]
        exact = int(r["c"])
        rows.append((tok, exact, med, abs(med - exact)))
    out = pd.DataFrame(
        rows, columns=["token", "exact", "estimate", "abs_err"]
    )
    for c in ("exact", "estimate", "abs_err"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("token").reset_index(drop=True)


COUNT_SKETCH_SQL = rf"""
WITH t AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOK_RE}')) AS token
  FROM documents),
c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1),
cs AS (
  SELECT CAST(j.j AS BIGINT) AS j,
         {_md5u("'csh:' || CAST(j.j AS VARCHAR) || ':' || token")} % {CS_W}
           AS h,
         CAST(SUM(CASE WHEN {_md5u("'css:' || CAST(j.j AS VARCHAR) || ':' || token")} % 2 = 0
                       THEN c ELSE -c END) AS BIGINT) AS v
  FROM c, unnest(range(0, {CS_D})) AS j(j)
  GROUP BY 1, 2),
topk AS (
  SELECT token, c FROM (
    SELECT token, c, ROW_NUMBER() OVER (ORDER BY c DESC, token ASC) AS rn
    FROM c) WHERE rn <= {CS_TOPK}),
grid AS (
  SELECT k.token, k.c, CAST(j.j AS BIGINT) AS j
  FROM topk k, unnest(range(0, {CS_D})) AS j(j)),
ests AS (
  SELECT g.token, g.c,
         CASE WHEN {_md5u("'css:' || CAST(g.j AS VARCHAR) || ':' || g.token")} % 2 = 0
              THEN 1 ELSE -1 END
         * COALESCE(cs.v, 0) AS e
  FROM grid g
  LEFT JOIN cs ON cs.j = g.j
    AND cs.h = {_md5u("'csh:' || CAST(g.j AS VARCHAR) || ':' || g.token")} % {CS_W}),
med AS (
  SELECT token, c,
         CAST(SUM(e) - MAX(e) - MIN(e) AS BIGINT) AS estimate
  FROM ests GROUP BY 1, 2)
SELECT token, c AS exact, estimate,
       CAST(ABS(estimate - c) AS BIGINT) AS abs_err
FROM med
"""


# ======================================================= linear_counting
#
# Linear counting: distinct tokens estimated from a 4096-bit bitmap —
# bit md5('lc:42:'||t) % m sets; with V empty bits the MLE is
# m·ln(m/V). Output: exact distinct count, set-bit count, the
# estimate (the ln is the ONE mirrored-verbatim float expression),
# and the relative error ×10⁶.
#
# Scale shape: per-batch distinct positions → ≤m-row bounded reduce;
# exact distinct rides the coarse token exchange (group-partitioned
# nunique partials).


def q_linear_counting(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_exact": pd.Series(dtype=np.int64),
            "n_set": pd.Series(dtype=np.int64),
            "estimate": pd.Series(dtype=np.int64),
            "err_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["text"])
    tok_re = re.compile(TOK_RE)

    def positions(df: pd.DataFrame) -> pd.DataFrame:
        toks = set()
        for lst in df["text"].astype(str).str.lower().str.findall(tok_re):
            toks.update(lst)
        pos = np.unique(
            np.fromiter(
                (_md5_64(f"lc:42:{t}") % LC_M for t in toks),
                np.int64,
                len(toks),
            )
        )
        return pd.DataFrame({"pos": pos})

    pos_rows = (
        d.map_batches(positions, batch_format="pandas")
        .groupby("pos")
        .count()
        .to_pandas()  # <= LC_M rows
    )
    n_set = len(pos_rows)

    def vgroup(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"v": [np.int64(g["token"].nunique())]}
        )

    n_exact = int(
        _with_coarse_group(_exact_token_counts(sf_dir), "token")
        .groupby("_g")
        .map_groups(vgroup, batch_format="pandas")
        .sum("v")
    )
    v = LC_M - n_set
    if v <= 0:
        est = -1  # bitmap saturated: linear counting undefined
    else:
        # mirrored-verbatim float expression (see LINEAR_COUNTING_SQL)
        est = int(np.floor(LC_M * np.log(LC_M / v)))
    err = 10**6 * abs(est - n_exact) // max(n_exact, 1) if est >= 0 else -1
    return pd.DataFrame(
        {
            "n_exact": [np.int64(n_exact)],
            "n_set": [np.int64(n_set)],
            "estimate": [np.int64(est)],
            "err_x1e6": [np.int64(err)],
        }
    )


LINEAR_COUNTING_SQL = rf"""
WITH dt AS (
  SELECT DISTINCT
         unnest(regexp_extract_all(lower(text), '{TOK_RE}')) AS token
  FROM documents),
b AS (
  SELECT DISTINCT {_md5u("'lc:42:' || token")} % {LC_M} AS pos FROM dt),
k AS (
  SELECT CAST((SELECT COUNT(*) FROM dt) AS BIGINT) AS n_exact,
         CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_set)
SELECT n_exact, n_set,
       CAST(CASE WHEN {LC_M} - n_set <= 0 THEN -1
                 ELSE CAST(floor({LC_M} * ln({LC_M} / ({LC_M} - n_set)))
                      AS BIGINT) END AS BIGINT) AS estimate,
       CAST(CASE WHEN {LC_M} - n_set <= 0 THEN -1
                 ELSE 1000000
                      * ABS(CAST(floor({LC_M} * ln({LC_M} / ({LC_M} - n_set)))
                            AS BIGINT) - n_exact)
                      // GREATEST(n_exact, 1) END AS BIGINT) AS err_x1e6
FROM k
"""


LINSKETCH_SQL_QUERIES: dict[str, tuple] = {
    "ams_f2": (q_ams_f2, AMS_F2_SQL),
    "count_sketch": (q_count_sketch, COUNT_SKETCH_SQL),
    "linear_counting": (q_linear_counting, LINEAR_COUNTING_SQL),
}
