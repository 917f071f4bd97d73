"""Multimodal column stages — opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT available in this container, so
the decode kernels are STUBS behind ``use_stub`` (deterministic fake
parser of a tiny synthetic header). Everything Ray-side is real and
tested: binary columns through ``map_batches``, actor-pool stages with
per-actor init, small batch sizes for wide rows, schema handling.

Synthetic payload format ("FIMG" fake image): 4-byte magic + uint16 width
+ uint16 height + uint8 channels + payload bytes. A real deployment swaps
``_decode_stub`` for PIL/libvips inside the same actor.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

MAGIC = b"FIMG"


def _md5_64(s: str) -> int:
    """First 8 md5 bytes big-endian — the same value DuckDB computes with
    ``CAST(concat('0x', substr(md5(s),1,16)) AS UBIGINT)``, which lets the
    multimodal_meta oracle recompute the header fields arithmetically."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def make_fake_image(key: str, seed: int = 42) -> bytes:
    """Deterministic synthetic 'image' blob for a key. Header fields are
    md5-derived (SQL-replicable); the payload bytes are rng filler (their
    content is never decoded, only their length is)."""
    w = 16 + _md5_64(f"imgw:{seed}:{key}") % 496
    h = 16 + _md5_64(f"imgh:{seed}:{key}") % 496
    c = 3
    n_payload = 64 + _md5_64(f"imgl:{seed}:{key}") % 1984
    payload = np.random.default_rng(zlib.crc32(f"img:{seed}:{key}".encode())).bytes(n_payload)
    return MAGIC + struct.pack("<HHB", w, h, c) + payload


class DecodeImageMeta:
    """Actor-pool stage: binary image column → (width, height, channels,
    n_bytes). Use with ``map_batches(DecodeImageMeta, concurrency=N,
    batch_size=small)`` — wide binary rows need small batches.
    """

    def __init__(self, use_stub: bool = True, binary_col: str = "image"):
        if not use_stub:
            # Real decoder would be loaded once per actor here, e.g.:
            #   from PIL import Image  # noqa
            raise NotImplementedError(
                "no image decode library in this environment — use_stub=True"
            )
        self.binary_col = binary_col

    @staticmethod
    def _decode_stub(blob: bytes | None) -> tuple[int | None, int | None, int | None]:
        if not blob or len(blob) < 9 or blob[:4] != MAGIC:
            return None, None, None
        w, h, c = struct.unpack("<HHB", blob[4:9])
        return int(w), int(h), int(c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.binary_col)
        ws, hs, cs, nb = [], [], [], []
        for i in range(len(blobs)):
            blob = blobs[i].as_py()
            w, h, c = self._decode_stub(blob)
            ws.append(w)
            hs.append(h)
            cs.append(c)
            nb.append(len(blob) if blob is not None else None)
        out = batch.drop_columns([self.binary_col])
        out = out.append_column("width", pa.array(ws, pa.int32()))
        out = out.append_column("height", pa.array(hs, pa.int32()))
        out = out.append_column("channels", pa.array(cs, pa.int32()))
        out = out.append_column("n_bytes", pa.array(nb, pa.int64()))
        return out
