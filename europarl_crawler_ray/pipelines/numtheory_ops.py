"""Number-theoretic operators (round-5 batch 69): Zeckendorf /
Fibonacci universal coding (Zeckendorf 1972; Apostolico & Fraenkel
1987 — the self-delimiting gap code that competes with varint),
the base-2 Fermat primality census with its PSEUDOPRIME exposure
(Fermat's little theorem vs the liars 341, 561, … — the reason
Miller-Rabin exists), and the pairwise coprimality rate (whose
uniform-integer limit is 6/π², Cesàro 1881) — all over the corpus's
length values, exact integer end to end.

Determinization: Zeckendorf is the greedy largest-Fibonacci
subtraction (unrolled over the 23 Fibonacci numbers ≤ 2¹⁶ in the
oracle); the Fermat test computes 2^(n−1) mod n by 16 unrolled
square-and-multiply steps (values < 2¹⁶ keep every product in
BIGINT); true primality is trial division; gcd is 24 unrolled
Euclid steps (enough for 16-bit inputs).

Scale idioms: everything reduces to the DISTINCT-value histogram
(value-bounded) — coding and primality are per-distinct-value maps,
and the coprimality rate weights the D² distinct pairs by their
count products (driver/SQL math over the bounded grid).

Reference parity: none — these extend the brief's
compression/validation families (delta_varint_gain, benford_audit
are the siblings).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

FIBS = []
_a, _b = 1, 2
while _a <= (1 << 16):
    FIBS.append(_a)
    _a, _b = _b, _a + _b
FIBS = FIBS[::-1]  # descending


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _value_hist(sf_dir: str) -> pd.DataFrame:
    d = _read(sf_dir, "documents", columns=["n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.Series(df["n_chars"].to_numpy(np.int64)).value_counts()
        return pd.DataFrame(
            {
                "value": s.index.to_numpy(np.int64),
                "n": s.to_numpy(np.int64),
            }
        )

    agg = (
        d.map_batches(partial, batch_format="pandas")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("value")
        .reset_index(drop=True)
    )
    agg["value"] = agg["value"].astype(np.int64)
    agg["n"] = agg["n"].astype(np.int64)
    return agg


# =========================================================== fib_coding
#
# Zeckendorf bit count of v ≥ 1 = (index of the largest Fibonacci ≤
# v, counted from F(2)=1) + 1 terminator bit; varint bytes·8 is the
# baseline. Output per distinct value: (value, n_docs, fib_bits,
# varint_bits, fib_wins).


def _fib_bits(v: int) -> int:
    if v <= 0:
        return 0
    # position of the largest fib ≤ v within the ASCENDING sequence
    asc = FIBS[::-1]
    k = 0
    for i, f in enumerate(asc):
        if f <= v:
            k = i + 1
    return k + 1  # + the '11' terminator's extra bit


def _varint_bits(v: int) -> int:
    if v == 0:
        return 8
    b = 0
    while v > 0:
        b += 8
        v >>= 7
    return b


def q_fib_coding(sf_dir: str):
    empty = pd.DataFrame(
        {
            "value": pd.Series(dtype=np.int64),
            "n_docs": pd.Series(dtype=np.int64),
            "fib_bits": pd.Series(dtype=np.int64),
            "varint_bits": pd.Series(dtype=np.int64),
            "fib_wins": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    h = _value_hist(sf_dir)
    h = h[h["value"] > 0]
    rows = []
    for _, r in h.iterrows():
        v = int(r["value"])
        fb = _fib_bits(v)
        vb = _varint_bits(v)
        rows.append((v, int(r["n"]), fb, vb, 1 if fb < vb else 0))
    return pd.DataFrame(
        rows, columns=["value", "n_docs", "fib_bits", "varint_bits", "fib_wins"]
    ).astype(np.int64)


def _fib_sql() -> str:
    asc = FIBS[::-1]
    conds = " ".join(
        f"WHEN value >= {f} THEN {i + 1}" for i, f in zip(
            range(len(asc) - 1, -1, -1), reversed(asc)
        )
    )
    vb = " ".join(
        f"WHEN value < {1 << (7 * k)} THEN {8 * k}" for k in range(1, 4)
    )
    return f"""
WITH h AS (
  SELECT CAST(n_chars AS BIGINT) AS value,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents WHERE n_chars > 0 GROUP BY 1)
SELECT value, n AS n_docs,
       CAST((CASE {conds} ELSE 0 END) + 1 AS BIGINT) AS fib_bits,
       CAST(CASE {vb} ELSE 32 END AS BIGINT) AS varint_bits,
       CAST(CASE WHEN (CASE {conds} ELSE 0 END) + 1
                      < (CASE {vb} ELSE 32 END)
                 THEN 1 ELSE 0 END AS BIGINT) AS fib_wins
FROM h
"""


# ============================================================ fermat_test
#
# For every distinct value v ≥ 3: the base-2 Fermat test
# (2^(v−1) ≡ 1 mod v) against true primality (trial division).
# Output one row: (n_values, n_fermat_pass, n_prime, n_pseudoprime)
# — pseudoprimes are the Fermat liars (341 is the smallest).


def _modpow2(e: int, m: int) -> int:
    """2^e mod m via square-and-multiply over e's 16 bits."""
    r = 1 % m
    base = 2 % m
    for k in range(17):
        if (e >> k) & 1:
            r = (r * base) % m
        base = (base * base) % m
    return r


def _is_prime(v: int) -> bool:
    if v < 2:
        return False
    i = 2
    while i * i <= v:
        if v % i == 0:
            return False
        i += 1
    return True


def q_fermat_test(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_values": pd.Series(dtype=np.int64),
            "n_fermat_pass": pd.Series(dtype=np.int64),
            "n_prime": pd.Series(dtype=np.int64),
            "n_pseudoprime": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    h = _value_hist(sf_dir)
    vals = [int(v) for v in h["value"] if int(v) >= 3]
    npass = nprime = npseudo = 0
    for v in vals:
        fp = _modpow2(v - 1, v) == 1
        pr = _is_prime(v)
        npass += int(fp)
        nprime += int(pr)
        npseudo += int(fp and not pr)
    return pd.DataFrame(
        {
            "n_values": [np.int64(len(vals))],
            "n_fermat_pass": [np.int64(npass)],
            "n_prime": [np.int64(nprime)],
            "n_pseudoprime": [np.int64(npseudo)],
        }
    )


def _fermat_sql() -> str:
    # 17 unrolled square-and-multiply steps carrying (r, base)
    parts = [
        """WITH h AS (
  SELECT DISTINCT CAST(n_chars AS BIGINT) AS v
  FROM documents WHERE n_chars >= 3),
m0 AS (
  SELECT v, v - 1 AS e, CAST(1 % v AS BIGINT) AS r,
         CAST(2 % v AS BIGINT) AS b
  FROM h)"""
    ]
    for k in range(17):
        parts.append(
            f"""m{k + 1} AS (
  SELECT v, e,
         CASE WHEN (e >> {k}) & 1 = 1 THEN (r * b) % v ELSE r END AS r,
         (b * b) % v AS b
  FROM m{k})"""
        )
    parts.append(
        """pr AS (
  SELECT h.v,
         CASE WHEN NOT EXISTS (
           SELECT 1 FROM unnest(range(2, 1024)) AS t(t)
           WHERE t.t * t.t <= h.v AND h.v % t.t = 0)
         THEN 1 ELSE 0 END AS is_prime
  FROM h)
SELECT CAST((SELECT COUNT(*) FROM h) AS BIGINT) AS n_values,
       CAST((SELECT SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) FROM m17)
            AS BIGINT) AS n_fermat_pass,
       CAST((SELECT SUM(is_prime) FROM pr) AS BIGINT) AS n_prime,
       CAST((SELECT COUNT(*) FROM m17 f JOIN pr ON pr.v = f.v
             WHERE f.r = 1 AND pr.is_prime = 0) AS BIGINT)
         AS n_pseudoprime"""
    )
    return ",\n".join(parts[:-1]) + ",\n" + parts[-1]


# =========================================================== coprime_rate
#
# Over all ordered pairs of distinct values (u < v), weighted by
# count products: the share with gcd(u, v) = 1 — the statistic whose
# uniform-integer limit is 6/π² ≈ 0.6079. Output: (n_pairs_weighted,
# n_coprime_weighted, rate_x1e6).


def q_coprime_rate(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_pairs_weighted": pd.Series(dtype=np.int64),
            "n_coprime_weighted": pd.Series(dtype=np.int64),
            "rate_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    h = _value_hist(sf_dir)
    h = h[h["value"] > 0]
    vals = h["value"].to_numpy(np.int64)
    cnt = h["n"].to_numpy(np.int64)
    tot = cop = 0
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            w = int(cnt[i]) * int(cnt[j])
            tot += w
            if math.gcd(int(vals[i]), int(vals[j])) == 1:
                cop += w
    rate = 10**6 * cop // tot if tot else 0
    return pd.DataFrame(
        {
            "n_pairs_weighted": [np.int64(tot)],
            "n_coprime_weighted": [np.int64(cop)],
            "rate_x1e6": [np.int64(rate)],
        }
    )


def _coprime_sql() -> str:
    # 24 unrolled Euclid steps (a, b) -> (b, a mod b)
    parts = [
        """WITH h AS (
  SELECT CAST(n_chars AS BIGINT) AS value,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents WHERE n_chars > 0 GROUP BY 1),
p0 AS (
  SELECT a.value AS u, b.value AS v, a.n * b.n AS w,
         a.value AS x, b.value AS y
  FROM h a JOIN h b ON b.value > a.value)"""
    ]
    for k in range(24):
        parts.append(
            f"""p{k + 1} AS (
  SELECT u, v, w,
         CASE WHEN y = 0 THEN x ELSE y END AS x,
         CASE WHEN y = 0 THEN 0 ELSE x % y END AS y
  FROM p{k})"""
        )
    parts.append(
        """SELECT CAST(SUM(w) AS BIGINT) AS n_pairs_weighted,
       CAST(SUM(CASE WHEN x = 1 THEN w ELSE 0 END) AS BIGINT)
         AS n_coprime_weighted,
       CAST(CASE WHEN SUM(w) > 0
                 THEN 1000000 * SUM(CASE WHEN x = 1 THEN w ELSE 0 END)
                      // SUM(w)
                 ELSE 0 END AS BIGINT) AS rate_x1e6
FROM p24"""
    )
    return ",\n".join(parts[:-1]) + "\n" + parts[-1]


NUMTHEORY_SQL_QUERIES: dict[str, tuple] = {
    "fib_coding": (q_fib_coding, _fib_sql()),
    "fermat_test": (q_fermat_test, _fermat_sql()),
    "coprime_rate": (q_coprime_rate, _coprime_sql()),
}
