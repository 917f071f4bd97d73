"""From-scratch Avro OCF codec (sources/avro.py): golden-byte spec
compliance, roundtrip, corruption detection."""

import json
import zlib

import numpy as np
import pytest

from europarl_crawler_ray.sources.avro import (
    MAGIC,
    SCHEMA,
    read_ocf,
    sync_marker,
    write_ocf,
)


def _golden_null_file(sync: bytes) -> bytes:
    """Hand-constructed OCF per the Avro 1.11 spec for one record
    {doc_id: 1, text: 'ab'} with the null codec — built independently
    of the writer so both sides of the spec are pinned."""
    def long_(n):
        u = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def string_(s):
        return long_(len(s)) + s

    schema = json.dumps(SCHEMA, separators=(",", ":")).encode()
    body = long_(1) + string_(b"ab")  # doc_id=1 → zigzag 2; 'ab'
    return (
        MAGIC
        + long_(2)
        + string_(b"avro.schema") + string_(schema)
        + string_(b"avro.codec") + string_(b"null")
        + long_(0)
        + sync
        + long_(1) + long_(len(body)) + body
        + sync
    )


def test_writer_matches_hand_built_golden_bytes(tmp_path):
    sync = sync_marker("golden")
    p = tmp_path / "g.avro"
    write_ocf(str(p), [1], ["ab"], codec="null", sync=sync)
    assert p.read_bytes() == _golden_null_file(sync)


def test_roundtrip_deflate_multiblock(tmp_path):
    rng = np.random.default_rng(7)
    ids = rng.integers(-(2**40), 2**40, size=1500).tolist()
    texts = ["δoc %d —\n\ttext" % i for i in ids]
    p = tmp_path / "r.avro"
    write_ocf(str(p), ids, texts, records_per_block=128)
    rid, rtext = read_ocf(p.read_bytes())
    assert rid.tolist() == ids and rtext == texts
    # deflate blocks really are raw DEFLATE (decompressible with -15)
    data = p.read_bytes()
    assert b"deflate" in data[:200]


def test_corruption_detected(tmp_path):
    p = tmp_path / "c.avro"
    write_ocf(str(p), [1, 2, 3], ["a", "b", "c"], codec="null")
    data = bytearray(p.read_bytes())
    data[-1] ^= 0xFF  # flip a sync byte
    with pytest.raises(ValueError, match="sync"):
        read_ocf(bytes(data))
    with pytest.raises(ValueError, match="not an Avro"):
        read_ocf(b"PAR1" + bytes(data))


def test_zigzag_extremes(tmp_path):
    vals = [0, -1, 1, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    p = tmp_path / "z.avro"
    write_ocf(str(p), vals, [""] * len(vals), codec="null")
    rid, rtext = read_ocf(p.read_bytes())
    assert rid.tolist() == vals and rtext == [""] * len(vals)
