"""Vectorized LEB128 varints for delta-encoded postings lists.

The classic inverted-index compression step (Zobel & Moffat, "Inverted
files for text search engines", CSUR 2006): doc ids sort ascending, gaps
replace absolutes, and each gap packs into 7-bit groups little-endian
with a continuation high bit. Both directions here are numpy-vectorized
over the WHOLE buffer (no per-value Python loop): encode builds an
(n, max_groups) byte matrix and flattens through its validity mask;
decode finds value boundaries from the continuation bits and reduces
each group with ``np.add.reduceat``.
"""

from __future__ import annotations

import numpy as np

_MAX_GROUPS = 10  # 64-bit values need at most ceil(64/7) = 10 groups


def varint_lengths(vals: np.ndarray) -> np.ndarray:
    """Encoded byte count per value (1 for 0..127, 2 for 128..16383, …)."""
    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        return np.zeros(0, dtype=np.int64)
    bits = np.zeros(v.shape, dtype=np.int64)
    x = v.copy()
    nz = x > 0
    while nz.any():
        bits[nz] += 1
        x >>= np.uint64(1)
        nz = x > 0
    return np.maximum((bits + 6) // 7, 1)


def encode_varints(vals: np.ndarray) -> bytes:
    """LEB128-encode an array; bytes of each value are contiguous."""
    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    lens = varint_lengths(v)
    width = int(lens.max())
    k = np.arange(width, dtype=np.uint64)
    groups = (v[:, None] >> (np.uint64(7) * k[None, :])) & np.uint64(0x7F)
    valid = k[None, :] < lens[:, None].astype(np.uint64)
    not_last = k[None, :] < (lens[:, None] - 1).astype(np.uint64)
    groups = np.where(not_last, groups | np.uint64(0x80), groups)
    return groups.astype(np.uint8)[valid].tobytes()


def decode_varints(buf: bytes) -> np.ndarray:
    """Inverse of encode_varints; returns uint64 values."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (arr & 0x80) == 0
    if not is_last[-1]:
        raise ValueError("truncated varint stream")
    # group id of each byte = number of completed values before it
    gid = np.concatenate([[0], np.cumsum(is_last)[:-1]])
    starts = np.concatenate([[0], np.flatnonzero(is_last)[:-1] + 1])
    pos = np.arange(arr.size) - starts[gid]
    if pos.max() >= _MAX_GROUPS:
        raise ValueError("varint longer than 10 bytes")
    contrib = (arr & 0x7F).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(contrib, starts)
