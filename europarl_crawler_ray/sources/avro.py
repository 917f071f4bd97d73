"""From-scratch Apache Avro Object Container Files (spec 1.11.x, public:
avro.apache.org/docs/current/specification — no avro library in this
environment, none needed).

Wire format implemented here:
- magic ``Obj\\x01``; file-metadata MAP (``avro.schema`` JSON,
  ``avro.codec``) — a map is a sequence of count-prefixed blocks of
  key/value strings terminated by a zero count; a 16-byte sync marker.
- data blocks: ``long`` record count, ``long`` byte size, the encoded
  records (raw-DEFLATE-compressed for the ``deflate`` codec — no zlib
  framing, per spec), then the sync marker again.
- primitives: ``long`` is zigzag + unsigned LEB128 varint; ``string``
  is a length-prefixed UTF-8 byte run.

Only the record schema this repo ships — ``{doc_id: long, text:
string}`` — is supported; the reader VERIFIES magic, schema fields,
codec, and every block's sync marker, so a single corrupt byte fails
loudly instead of yielding garbage rows.
"""

from __future__ import annotations

import hashlib
import json
import zlib

import numpy as np

MAGIC = b"Obj\x01"

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
    ],
}

_U64 = (1 << 64) - 1


def _zigzag(n: int) -> int:
    return ((n << 1) ^ (n >> 63)) & _U64


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _write_long(out: bytearray, n: int) -> None:
    u = _zigzag(n)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    u, shift = 0, 0
    while True:
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u), pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _write_bytes(out: bytearray, raw: bytes) -> None:
    _write_long(out, len(raw))
    out += raw


def _read_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(data, pos)
    if n < 0 or pos + n > len(data):
        raise ValueError("bad byte-run length")
    return data[pos : pos + n], pos + n


def sync_marker(seed: str) -> bytes:
    return hashlib.md5(f"avrosync|{seed}".encode()).digest()


def write_ocf(
    path: str,
    doc_ids,
    texts,
    *,
    codec: str = "deflate",
    sync: bytes | None = None,
    records_per_block: int = 512,
) -> None:
    """Write one Object Container File with the repo's doc schema."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = sync or sync_marker(path)
    assert len(sync) == 16
    out = bytearray(MAGIC)
    # file metadata map: one block of 2 entries, then end-of-map
    _write_long(out, 2)
    _write_bytes(out, b"avro.schema")
    _write_bytes(out, json.dumps(SCHEMA, separators=(",", ":")).encode())
    _write_bytes(out, b"avro.codec")
    _write_bytes(out, codec.encode())
    _write_long(out, 0)
    out += sync
    ids = np.asarray(doc_ids, dtype=np.int64)
    for s in range(0, len(ids), records_per_block):
        body = bytearray()
        chunk_ids = ids[s : s + records_per_block]
        chunk_texts = texts[s : s + records_per_block]
        for did, txt in zip(chunk_ids, chunk_texts):
            _write_long(body, int(did))
            _write_bytes(body, (txt or "").encode("utf-8"))
        payload = bytes(body)
        if codec == "deflate":  # raw DEFLATE, no zlib framing (spec)
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        _write_long(out, len(chunk_ids))
        _write_long(out, len(payload))
        out += payload
        out += sync
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_ocf(data: bytes) -> tuple[np.ndarray, list[str]]:
    """Parse one OCF; verifies magic, schema fields, codec, and every
    block's sync marker. Returns (doc_ids, texts)."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[bytes, bytes] = {}
    while True:
        count, pos = _read_long(data, pos)
        if count == 0:
            break
        if count < 0:  # negative count = block with a byte size to skip
            count = -count
            _, pos = _read_long(data, pos)
        for _ in range(count):
            k, pos = _read_bytes(data, pos)
            v, pos = _read_bytes(data, pos)
            meta[k] = v
    schema = json.loads(meta.get(b"avro.schema", b"{}"))
    fields = [f["name"] for f in schema.get("fields", [])]
    if fields != ["doc_id", "text"]:
        raise ValueError(f"unexpected schema fields {fields}")
    codec = meta.get(b"avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = data[pos : pos + 16]
    pos += 16
    ids: list[int] = []
    texts: list[str] = []
    while pos < len(data):
        n_rec, pos = _read_long(data, pos)
        n_bytes, pos = _read_long(data, pos)
        payload = data[pos : pos + n_bytes]
        pos += n_bytes
        if data[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch — corrupt block")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        p = 0
        for _ in range(n_rec):
            did, p = _read_long(payload, p)
            raw, p = _read_bytes(payload, p)
            ids.append(did)
            texts.append(raw.decode("utf-8"))
        if p != len(payload):
            raise ValueError("trailing bytes in record block")
    return np.asarray(ids, dtype=np.int64), texts
