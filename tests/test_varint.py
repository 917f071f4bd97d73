"""LEB128 varint kernels (functions/varint.py): byte-exact against the
reference scalar algorithm, roundtrip-fuzzed, boundary values."""

import numpy as np

from europarl_crawler_ray.functions.varint import (
    decode_varints,
    encode_varints,
    varint_lengths,
)


def _scalar_encode(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_known_boundaries():
    vals = [0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 2**32, 2**63, 2**64 - 1]
    enc = encode_varints(np.array(vals, dtype=np.uint64))
    assert enc == b"".join(_scalar_encode(v) for v in vals)
    assert varint_lengths(np.array(vals, dtype=np.uint64)).tolist() == [
        1, 1, 1, 2, 2, 3, 3, 4, 5, 10, 10
    ]
    assert decode_varints(enc).tolist() == vals


def test_roundtrip_fuzz():
    rng = np.random.default_rng(42)
    for _ in range(50):
        n = int(rng.integers(0, 300))
        mags = rng.integers(0, 64, size=n)
        vals = (rng.integers(0, 2**31, size=n).astype(np.uint64) << mags.astype(np.uint64)) >> np.uint64(3)
        enc = encode_varints(vals)
        assert enc == b"".join(_scalar_encode(int(v)) for v in vals)
        assert (decode_varints(enc) == vals).all()


def test_empty_and_errors():
    import pytest

    assert encode_varints(np.array([], dtype=np.uint64)) == b""
    assert decode_varints(b"").size == 0
    with pytest.raises(ValueError):
        decode_varints(b"\x80")  # truncated
