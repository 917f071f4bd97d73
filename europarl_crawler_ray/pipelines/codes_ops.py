"""Coding-theory operators (round-5 batch 67): Hamming(7,4)
single-error correction (Hamming 1950 — encode, corrupt with an
md5-chosen bit flip, decode via the syndrome, and verify the
correction), the Gray code roundtrip with its single-bit-step
property (Gray 1953), and the von Neumann extractor (von Neumann
1951 — turn a biased coin into a fair one by keeping only 01/10
pairs) — the storage/transport-integrity corner of the engine, all
pure integer bit arithmetic mirrored bit-for-bit in the oracle.

Scale idioms: hamming/gray are per-row maps (data = n_chars
nibbles/words; the corruption position is the md5 draw); the
extractor is a per-row 16-pair evaluation into a 4-scalar reduce.
Nothing exchanges beyond bounded partials.

Reference parity: the reference trusts its bytes end-to-end; these
extend the brief's storage-audit family (luhn_census,
delta_varint_gain are the siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from ..stages.multimodal import _md5_64
from .ml_queries import _md5u

VN_PAIRS = 16


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


# ============================================================ hamming74
#
# Standard positional layout (1-indexed): bit 1 = p1, 2 = p2, 3 = d1,
# 4 = p3, 5 = d2, 6 = d3, 7 = d4 with p1 = d1⊕d2⊕d4, p2 = d1⊕d3⊕d4,
# p3 = d2⊕d3⊕d4. The corruption flips bit (md5 % 8) when nonzero;
# the syndrome (s1 + 2·s2 + 4·s3) NAMES the flipped position — the
# theorem the `corrected_ok` column verifies on every row.


def _h74_encode(nib: np.ndarray) -> np.ndarray:
    d1 = (nib >> 3) & 1
    d2 = (nib >> 2) & 1
    d3 = (nib >> 1) & 1
    d4 = nib & 1
    p1 = d1 ^ d2 ^ d4
    p2 = d1 ^ d3 ^ d4
    p3 = d2 ^ d3 ^ d4
    # codeword bits 1..7 packed MSB-first: p1 p2 d1 p3 d2 d3 d4
    return (
        (p1 << 6) | (p2 << 5) | (d1 << 4) | (p3 << 3) | (d2 << 2)
        | (d3 << 1) | d4
    )


def q_hamming74(sf_dir: str):
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype=np.int64),
            "nibble": pd.Series(dtype=np.int64),
            "codeword": pd.Series(dtype=np.int64),
            "flip_pos": pd.Series(dtype=np.int64),
            "syndrome": pd.Series(dtype=np.int64),
            "corrected_ok": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def code(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        nib = df["n_chars"].to_numpy(np.int64) & 0xF
        cw = _h74_encode(nib)
        pos = np.fromiter(
            (_md5_64(f"hf:42:{int(i)}") % 8 for i in ids),
            np.int64,
            len(ids),
        )
        # flip bit `pos` (1..7 from the MSB side: position k flips
        # bit 7-k); pos 0 = clean
        corrupted = np.where(pos > 0, cw ^ (1 << (7 - pos)), cw)
        # syndrome from the received word
        b = [(corrupted >> (7 - k)) & 1 for k in range(1, 8)]
        p1r, p2r, d1r, p3r, d2r, d3r, d4r = b
        s1 = p1r ^ d1r ^ d2r ^ d4r
        s2 = p2r ^ d1r ^ d3r ^ d4r
        s3 = p3r ^ d2r ^ d3r ^ d4r
        syn = s1 + 2 * s2 + 4 * s3
        fixed = np.where(syn > 0, corrupted ^ (1 << (7 - syn)), corrupted)
        dec = (
            (((fixed >> 4) & 1) << 3)
            | (((fixed >> 2) & 1) << 2)
            | (((fixed >> 1) & 1) << 1)
            | (fixed & 1)
        )
        return pd.DataFrame(
            {
                "doc_id": ids,
                "nibble": nib,
                "codeword": cw,
                "flip_pos": pos,
                "syndrome": syn,
                "corrected_ok": (dec == nib).astype(np.int64),
            }
        ).astype(np.int64)

    return d.map_batches(code, batch_format="pandas")


def _h74_sql() -> str:
    pos = _md5u("'hf:42:' || CAST(doc_id AS VARCHAR)") + " % 8"
    return f"""
WITH base AS (
  SELECT doc_id, CAST(n_chars & 15 AS BIGINT) AS nib,
         CAST({pos} AS BIGINT) AS pos
  FROM documents),
bits AS (
  SELECT doc_id, nib, pos,
         (nib >> 3) & 1 AS d1, (nib >> 2) & 1 AS d2,
         (nib >> 1) & 1 AS d3, nib & 1 AS d4
  FROM base),
enc AS (
  SELECT doc_id, nib, pos,
         (xor(xor(d1, d2), d4) << 6) | (xor(xor(d1, d3), d4) << 5)
         | (d1 << 4) | (xor(xor(d2, d3), d4) << 3) | (d2 << 2)
         | (d3 << 1) | d4 AS cw
  FROM bits),
rx AS (
  SELECT doc_id, nib, pos, cw,
         CASE WHEN pos > 0 THEN xor(cw, 1 << CAST(7 - pos AS INTEGER))
              ELSE cw END AS r
  FROM enc),
syn AS (
  SELECT doc_id, nib, pos, cw, r,
         xor(xor(xor((r >> 6) & 1, (r >> 4) & 1), (r >> 2) & 1), r & 1)
         + 2 * xor(xor(xor((r >> 5) & 1, (r >> 4) & 1), (r >> 1) & 1),
                   r & 1)
         + 4 * xor(xor(xor((r >> 3) & 1, (r >> 2) & 1), (r >> 1) & 1),
                   r & 1) AS s
  FROM rx),
fx AS (
  SELECT doc_id, nib, pos, cw, s,
         CASE WHEN s > 0 THEN xor(r, 1 << CAST(7 - s AS INTEGER))
              ELSE r END AS f
  FROM syn)
SELECT doc_id, nib AS nibble, CAST(cw AS BIGINT) AS codeword,
       pos AS flip_pos, CAST(s AS BIGINT) AS syndrome,
       CAST(CASE WHEN (((f >> 4) & 1) << 3) | (((f >> 2) & 1) << 2)
                      | (((f >> 1) & 1) << 1) | (f & 1) = nib
                 THEN 1 ELSE 0 END AS BIGINT) AS corrected_ok
FROM fx
"""


# ======================================================== gray_roundtrip
#
# g = x ⊕ (x >> 1) over the 16-bit word x = n_chars & 0xFFFF; the
# inverse is the shift-xor cascade b = g⊕(g>>1)⊕(g>>2)⊕… (closed by
# the 1/2/4/8 doubling). Output per doc: (doc_id, x, gray,
# roundtrip_ok, step_bits = popcount(gray(x) ⊕ gray(x+1)), which the
# theorem says is exactly 1 inside the grid).


def q_gray_roundtrip(sf_dir: str):
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype=np.int64),
            "x": pd.Series(dtype=np.int64),
            "gray": pd.Series(dtype=np.int64),
            "roundtrip_ok": pd.Series(dtype=np.int64),
            "step_bits": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        x = df["n_chars"].to_numpy(np.int64) & 0xFFFF
        g = x ^ (x >> 1)
        b = g.copy()
        for sh in (1, 2, 4, 8):
            b ^= b >> sh
        gn = ((x + 1) & 0xFFFF) ^ (((x + 1) & 0xFFFF) >> 1)
        step = np.fromiter(
            (bin(int(v)).count("1") for v in (g ^ gn)),
            np.int64,
            len(x),
        )
        return pd.DataFrame(
            {
                "doc_id": ids,
                "x": x,
                "gray": g,
                "roundtrip_ok": (b == x).astype(np.int64),
                "step_bits": step,
            }
        ).astype(np.int64)

    return d.map_batches(enc, batch_format="pandas")


GRAY_ROUNDTRIP_SQL = """
WITH b0 AS (
  SELECT doc_id, CAST(n_chars & 65535 AS BIGINT) AS x
  FROM documents),
g AS (
  SELECT doc_id, x, xor(x, x >> 1) AS gr,
         xor((x + 1) & 65535, ((x + 1) & 65535) >> 1) AS gn
  FROM b0),
inv1 AS (SELECT doc_id, x, gr, gn, xor(gr, gr >> 1) AS b FROM g),
inv2 AS (SELECT doc_id, x, gr, gn, xor(b, b >> 2) AS b FROM inv1),
inv3 AS (SELECT doc_id, x, gr, gn, xor(b, b >> 4) AS b FROM inv2),
inv4 AS (SELECT doc_id, x, gr, gn, xor(b, b >> 8) AS b FROM inv3)
SELECT doc_id, x, CAST(gr AS BIGINT) AS gray,
       CAST(CASE WHEN b = x THEN 1 ELSE 0 END AS BIGINT) AS roundtrip_ok,
       CAST(bit_count(xor(gr, gn)) AS BIGINT) AS step_bits
FROM inv4
"""


# =================================================== von_neumann_extract
#
# Input: a BIASED md5 stream (bit = 1 iff md5('vn:42:<doc>:<j>') % 4
# == 0, p = 1/4); pairs (2k, 2k+1) emit the first bit when the two
# differ and nothing otherwise — von Neumann's debiasing. Output:
# (n_pairs, n_emitted, n_ones, input_ones, ones_x1e6) — the emitted
# stream sits near ½ while the input sits near ¼.


def q_von_neumann_extract(sf_dir: str):
    empty = pd.DataFrame(
        {
            "n_pairs": pd.Series(dtype=np.int64),
            "n_emitted": pd.Series(dtype=np.int64),
            "n_ones": pd.Series(dtype=np.int64),
            "input_ones": pd.Series(dtype=np.int64),
            "ones_x1e6": pd.Series(dtype=np.int64),
        }
    )
    if _n_rows(sf_dir, "documents") == 0:
        return empty
    d = _read(sf_dir, "documents", columns=["doc_id"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        np_, ne, no, io = 0, 0, 0, 0
        for i in ids:
            for k in range(VN_PAIRS):
                a = _md5_64(f"vn:42:{int(i)}:{2 * k}") % 4 == 0
                b = _md5_64(f"vn:42:{int(i)}:{2 * k + 1}") % 4 == 0
                np_ += 1
                io += int(a) + int(b)
                if a != b:
                    ne += 1
                    no += int(a)
        return pd.DataFrame(
            {
                "p": [np.int64(np_)],
                "e": [np.int64(ne)],
                "o": [np.int64(no)],
                "i": [np.int64(io)],
            }
        )

    agg = d.map_batches(extract, batch_format="pandas").to_pandas()
    p = int(agg["p"].sum())
    e = int(agg["e"].sum())
    o = int(agg["o"].sum())
    i = int(agg["i"].sum())
    return pd.DataFrame(
        {
            "n_pairs": [np.int64(p)],
            "n_emitted": [np.int64(e)],
            "n_ones": [np.int64(o)],
            "input_ones": [np.int64(i)],
            "ones_x1e6": [np.int64(10**6 * o // e if e else 0)],
        }
    )


def _vn_sql() -> str:
    bita = _md5u(
        "'vn:42:' || CAST(doc_id AS VARCHAR) || ':' "
        "|| CAST(2 * k AS VARCHAR)"
    )
    bitb = _md5u(
        "'vn:42:' || CAST(doc_id AS VARCHAR) || ':' "
        "|| CAST(2 * k + 1 AS VARCHAR)"
    )
    return f"""
WITH grid AS (
  SELECT doc_id, CAST(k.k AS BIGINT) AS k
  FROM documents, unnest(range(0, {VN_PAIRS})) AS k(k)),
pairs AS (
  SELECT doc_id, k,
         CASE WHEN {bita} % 4 = 0 THEN 1 ELSE 0 END AS a,
         CASE WHEN {bitb} % 4 = 0 THEN 1 ELSE 0 END AS b
  FROM grid)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN a <> b THEN 1 ELSE 0 END) AS BIGINT)
         AS n_emitted,
       CAST(SUM(CASE WHEN a <> b THEN a ELSE 0 END) AS BIGINT) AS n_ones,
       CAST(SUM(a + b) AS BIGINT) AS input_ones,
       CAST(CASE WHEN SUM(CASE WHEN a <> b THEN 1 ELSE 0 END) > 0
                 THEN 1000000 * SUM(CASE WHEN a <> b THEN a ELSE 0 END)
                      // SUM(CASE WHEN a <> b THEN 1 ELSE 0 END)
                 ELSE 0 END AS BIGINT) AS ones_x1e6
FROM pairs
"""


CODES_SQL_QUERIES: dict[str, tuple] = {
    "hamming74": (q_hamming74, _h74_sql()),
    "gray_roundtrip": (q_gray_roundtrip, GRAY_ROUNDTRIP_SQL),
    "von_neumann_extract": (q_von_neumann_extract, _vn_sql()),
}
