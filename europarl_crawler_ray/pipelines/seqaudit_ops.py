"""Sequence-audit operators (round-5 batch 49): the Wald-Wolfowitz
runs test (Wald & Wolfowitz 1940), the turning-point test (Kendall's
classic randomness check on local extrema), and the Luhn checksum
census (Luhn 1960 — the mod-10 validator that separates real
card-shaped numbers from digit noise in PII scrubbing) — three
order-sensitive audits of the corpus stream.

The two randomness tests are the interesting distributed case: they
need ADJACENCY in doc_id order, which a block-parallel engine does
not have for free. Both use the contiguous-range two-level shape:
ranges = doc_id // width partition the sorted order, each range
reduces to (internal count + edge window) — the ≤4 boundary values a
cross-range triple can touch — and the driver stitches the ≤R_RANGES
edge windows. No halo exchange, no global sort; the merge state is
bounded by construction.

All statistics are exact integers (the above/below split uses the
floor-mean threshold; expected-runs quantizes the rational 1+2n₁n₀/n
×10⁶; Luhn is pure mod-10 arithmetic).

Reference parity: the reference scrubs nothing and audits no order;
these extend the brief's validation/PII families (pii_scrub,
cusum_drift are the siblings).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

TOK_RE = r"[^ \t\n\r\f]+"
R_RANGES = 64


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _range_width(sf_dir: str) -> int:
    mx = _read(sf_dir, "documents", columns=["doc_id"]).max("doc_id")
    return int(mx) // R_RANGES + 1 if mx is not None else 1


# ============================================================ runs_test
#
# Signs: s_i = 1 iff n_chars > ⌊Σx/n⌋ (floor-mean threshold, ties
# below). R = 1 + #(adjacent sign changes in doc_id order);
# E[R] = 1 + 2n₁n₀/n. Output: (n0, n1, runs, expected_x1e6).
#
# Scale shape: one mean reduce; one range pass emitting per range
# (count, changes, first_sign, last_sign) → ≤R_RANGES driver rows
# stitched in order.


def q_runs_test(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n0": pd.Series(dtype=np.int64),
            "n1": pd.Series(dtype=np.int64),
            "runs": pd.Series(dtype=np.int64),
            "expected_x1e6": pd.Series(dtype=np.int64),
        }
    )
    n = _n_docs(sf_dir)
    if n == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    tot = d.sum("n_chars")
    thr = int(tot) // n
    width = _range_width(sf_dir)

    # adjacency needs each range COMPLETE in one task: a rid-keyed
    # exchange co-locates it (blocks may split a range otherwise)
    from .grouping import with_coarse_group as _wcg

    def edges(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"]).sort_values("doc_id", kind="mergesort")
        s = (t["n_chars"].to_numpy(np.int64) > thr).astype(np.int64)
        rid = t["doc_id"].to_numpy(np.int64) // width
        rows = []
        for r in np.unique(rid):
            ss = s[rid == r]
            rows.append(
                (
                    int(r),
                    len(ss),
                    int((ss[1:] != ss[:-1]).sum()),
                    int(ss[0]),
                    int(ss[-1]),
                    int(ss.sum()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["rid", "cnt", "changes", "first_s", "last_s", "ones"],
        ).astype(np.int64)

    def add_rid(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["rid"] = out["doc_id"].to_numpy(np.int64) // width
        return out

    parts = (
        _wcg(d.map_batches(add_rid, batch_format="pandas"), "rid")
        .groupby("_g")
        .map_groups(edges, batch_format="pandas")
        .to_pandas()  # <= R_RANGES rows
        .sort_values("rid")
    )
    n1 = int(parts["ones"].sum())
    n0 = n - n1
    runs = 1 + int(parts["changes"].sum())
    last = None
    for _, r in parts.iterrows():
        if last is not None and int(r["first_s"]) != last:
            runs += 1
        last = int(r["last_s"])
    exp = 10**6 + 10**6 * 2 * n1 * n0 // n
    return pd.DataFrame(
        {
            "n0": [np.int64(n0)],
            "n1": [np.int64(n1)],
            "runs": [np.int64(runs)],
            "expected_x1e6": [np.int64(exp)],
        }
    )


RUNS_TEST_SQL = """
WITH thr AS (
  SELECT CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS t FROM documents),
s AS (
  SELECT doc_id,
         CASE WHEN n_chars > thr.t THEN 1 ELSE 0 END AS sgn
  FROM documents, thr),
ch AS (
  SELECT sgn,
         CASE WHEN LAG(sgn) OVER (ORDER BY doc_id) IS NOT NULL
               AND LAG(sgn) OVER (ORDER BY doc_id) <> sgn
              THEN 1 ELSE 0 END AS c
  FROM s)
SELECT CAST(SUM(1 - sgn) AS BIGINT) AS n0,
       CAST(SUM(sgn) AS BIGINT) AS n1,
       CAST(1 + SUM(c) AS BIGINT) AS runs,
       CAST(1000000 + 1000000 * 2 * SUM(sgn) * SUM(1 - sgn)
            // COUNT(*) AS BIGINT) AS expected_x1e6
FROM ch
"""


# ======================================================== turning_points
#
# T = #positions (in doc_id order, excluding the ends) that are a
# STRICT local max or min of n_chars; E[T] = 2(n−2)/3. Output:
# (n, turning, expected_x1e6).
#
# Scale shape: the same contiguous-range pass — per range: internal
# turning count (centers fully inside) + the ≤2 first/last (doc_id,
# value) pairs; the driver resolves only the centers sitting at range
# edges from the stitched ≤4·R_RANGES edge values.


def q_turning_points(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n": pd.Series(dtype=np.int64),
            "turning": pd.Series(dtype=np.int64),
            "expected_x1e6": pd.Series(dtype=np.int64),
        }
    )
    n = _n_docs(sf_dir)
    if n == 0:
        return empty
    width = _range_width(sf_dir)
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    from .grouping import with_coarse_group as _wcg

    def add_rid(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["rid"] = out["doc_id"].to_numpy(np.int64) // width
        return out

    def per_range(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop(columns=["_g"]).sort_values("doc_id", kind="mergesort")
        rid = t["doc_id"].to_numpy(np.int64) // width
        x = t["n_chars"].to_numpy(np.int64)
        ids = t["doc_id"].to_numpy(np.int64)
        rows = []
        for r in np.unique(rid):
            m = rid == r
            xs, ds = x[m], ids[m]
            k = len(xs)
            internal = 0
            if k >= 3:
                a, b, c = xs[:-2], xs[1:-1], xs[2:]
                internal = int(
                    (((b > a) & (b > c)) | ((b < a) & (b < c))).sum()
                )
            head = list(zip(ds[:2], xs[:2]))
            tail = list(zip(ds[-2:], xs[-2:]))
            rows.append(
                (
                    int(r),
                    k,
                    internal,
                    ";".join(f"{i}:{v}" for i, v in head),
                    ";".join(f"{i}:{v}" for i, v in tail),
                )
            )
        return pd.DataFrame(
            rows, columns=["rid", "cnt", "internal", "head", "tail"]
        )

    parts = (
        _wcg(d.map_batches(add_rid, batch_format="pandas"), "rid")
        .groupby("_g")
        .map_groups(per_range, batch_format="pandas")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    # stitch edge windows: centers at a range's first/last position
    # were NOT counted internally (internal covers centers at range
    # positions 1..k-2); resolve them from neighbours in the stitched
    # edge sequence, deduped by doc_id.
    def parse(s):
        return [
            (int(p.split(":")[0]), int(p.split(":")[1]))
            for p in s.split(";")
            if p
        ]

    edge_seq = []
    boundaries = []  # (doc_id of first, doc_id of last) per range
    for _, r in parts.iterrows():
        head, tail = parse(r["head"]), parse(r["tail"])
        merged = {i: v for i, v in head + tail}
        edge_seq.append((sorted(merged.items()), int(r["cnt"])))
        boundaries.append(
            (head[0][0], tail[-1][0]) if head else (None, None)
        )
    # flat ordered edge list with neighbour links across ranges
    flat = []
    for k, (vals, cnt) in enumerate(edge_seq):
        for i, v in vals:
            flat.append((i, v, k))
    flat.sort()
    turning = int(parts["internal"].sum())
    counted = set()
    # a center at global edge position needs both neighbours IN flat —
    # guaranteed: its in-range neighbour is in the head/tail window and
    # its cross-range neighbour is the adjacent range's edge value
    pos = {i: idx for idx, (i, v, k) in enumerate(flat)}
    firsts = {b[0] for b in boundaries if b[0] is not None}
    lasts = {b[1] for b in boundaries if b[1] is not None}
    for idx in range(1, len(flat) - 1):
        i, v, k = flat[idx]
        if i not in firsts and i not in lasts:
            continue
        i_prev, v_prev, k_prev = flat[idx - 1]
        i_next, v_next, k_next = flat[idx + 1]
        # neighbours must be the TRUE sequence neighbours: the edge
        # windows contain every element adjacent to a range edge, so
        # flat-adjacency equals sequence-adjacency here
        if (v > v_prev and v > v_next) or (v < v_prev and v < v_next):
            if i not in counted:
                turning += 1
                counted.add(i)
    exp = 10**6 * 2 * max(n - 2, 0) // 3
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "turning": [np.int64(turning)],
            "expected_x1e6": [np.int64(exp)],
        }
    )


TURNING_POINTS_SQL = """
WITH s AS (
  SELECT doc_id, n_chars,
         LAG(n_chars) OVER (ORDER BY doc_id) AS p,
         LEAD(n_chars) OVER (ORDER BY doc_id) AS q
  FROM documents)
SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN p IS NOT NULL AND q IS NOT NULL
                      AND ((n_chars > p AND n_chars > q)
                           OR (n_chars < p AND n_chars < q))
                     THEN 1 ELSE 0 END) AS BIGINT) AS turning,
       CAST(1000000 * 2 * GREATEST((SELECT COUNT(*) FROM documents) - 2, 0)
            // 3 AS BIGINT) AS expected_x1e6
FROM s
"""


# ========================================================== luhn_census
#
# Luhn mod-10 validation over card-shaped tokens (pure digits, length
# 13..19): per language, how many digit tokens exist and how many
# pass the checksum — the count a PII scrubber uses to separate
# card-like numbers worth redacting from digit noise.
#
# Scale shape: pure per-batch map (vectorized digit array per token)
# → #langs-bounded groupby.

LUHN_MIN, LUHN_MAX = 13, 19


def _luhn_ok(tok: str) -> bool:
    digits = [int(c) for c in tok][::-1]
    total = 0
    for i, dd in enumerate(digits):
        if i % 2 == 1:
            dd *= 2
            if dd > 9:
                dd -= 9
        total += dd
    return total % 10 == 0


def q_luhn_census(sf_dir: str):
    empty = pd.DataFrame(
        {
            "lang": pd.Series(dtype=object),
            "n_digit_tokens": pd.Series(dtype=np.int64),
            "n_luhn_valid": pd.Series(dtype=np.int64),
        }
    )
    if _n_docs(sf_dir) == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["lang", "text"])
    tok_re = re.compile(TOK_RE)
    dig_re = re.compile(r"[0-9]{%d,%d}$" % (LUHN_MIN, LUHN_MAX))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        langs, nd, nv = [], [], []
        for lg, text in zip(
            df["lang"].to_numpy(object), df["text"].astype(str)
        ):
            cnt_d = cnt_v = 0
            for t in tok_re.findall(text):
                if dig_re.fullmatch(t):
                    cnt_d += 1
                    if _luhn_ok(t):
                        cnt_v += 1
            langs.append(lg)
            nd.append(cnt_d)
            nv.append(cnt_v)
        g = pd.DataFrame(
            {
                "lang": np.asarray(langs, object),
                "nd": np.asarray(nd, np.int64),
                "nv": np.asarray(nv, np.int64),
            }
        )
        return g.groupby("lang", as_index=False)[["nd", "nv"]].sum()

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("nd", alias_name="n_digit_tokens"),
            Sum("nv", alias_name="n_luhn_valid"),
        )
        .to_pandas()
    )
    if not len(agg):
        return empty
    agg["n_digit_tokens"] = agg["n_digit_tokens"].astype(np.int64)
    agg["n_luhn_valid"] = agg["n_luhn_valid"].astype(np.int64)
    return agg.sort_values("lang").reset_index(drop=True)


LUHN_CENSUS_SQL = rf"""
WITH t AS (
  SELECT lang, unnest(regexp_extract_all(text, '{TOK_RE}')) AS tok
  FROM documents),
dtok AS (
  SELECT lang, tok, length(tok) AS ln FROM t
  WHERE regexp_full_match(tok, '[0-9]{{{LUHN_MIN},{LUHN_MAX}}}')),
digits AS (
  SELECT lang, tok, ln, CAST(i.i AS BIGINT) AS i,
         CAST(substr(tok, CAST(i.i AS INTEGER), 1) AS BIGINT) AS d
  FROM dtok, unnest(range(1, ln + 1)) AS i(i)),
luhn AS (
  SELECT lang, tok,
         SUM(CASE WHEN (ln - i) % 2 = 0 THEN d
                  WHEN 2 * d > 9 THEN 2 * d - 9
                  ELSE 2 * d END) % 10 AS rem
  FROM digits GROUP BY lang, tok, ln),
per_tok AS (
  SELECT t2.lang,
         CASE WHEN luhn.rem = 0 THEN 1 ELSE 0 END AS ok
  FROM (SELECT lang, tok FROM t
        WHERE regexp_full_match(tok, '[0-9]{{{LUHN_MIN},{LUHN_MAX}}}')) t2
  JOIN (SELECT DISTINCT lang, tok, rem FROM luhn) luhn
    ON luhn.lang = t2.lang AND luhn.tok = t2.tok),
agg AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd,
         CAST(SUM(ok) AS BIGINT) AS nv
  FROM per_tok GROUP BY 1)
SELECT l.lang,
       CAST(COALESCE(agg.nd, 0) AS BIGINT) AS n_digit_tokens,
       CAST(COALESCE(agg.nv, 0) AS BIGINT) AS n_luhn_valid
FROM (SELECT DISTINCT lang FROM documents) l
LEFT JOIN agg ON agg.lang = l.lang
"""


SEQAUDIT_SQL_QUERIES: dict[str, tuple] = {
    "runs_test": (q_runs_test, RUNS_TEST_SQL),
    "turning_points": (q_turning_points, TURNING_POINTS_SQL),
    "luhn_census": (q_luhn_census, LUHN_CENSUS_SQL),
}
