"""From-scratch BMP and PNG codecs (stdlib + numpy only).

The container ships no image libraries, so — like ``functions/pdf.py``
for PDF — the multimodal stage gets real decoders written against the
public specs: PNG per ISO/IEC 15948 (signature, chunk CRCs, IHDR/IDAT/
IEND, all five scanline filters) and BMP per the classic
BITMAPFILEHEADER + BITMAPINFOHEADER 24-bit layout (bottom-up BGR rows
padded to 4 bytes). Encoders emit structurally valid files that external
viewers can open; decoders reject malformed input with ``ValueError``.

Scope: 8-bit RGB truecolor PNG (color type 2, no interlace, no palette)
and uncompressed 24-bit BMP — the layouts the synthetic corpus uses. A
production deployment would swap these kernels for PIL/libvips inside
the same actor-pool stage without touching any Ray plumbing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ------------------------------------------------------------------ PNG


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a pixel row."""
    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_encode(pixels: np.ndarray, filters: str = "mixed", level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array as a truecolor PNG.

    ``filters``: 'none' writes filter 0 rows; 'mixed' cycles through all
    five filter types row by row (deterministic), exercising every decode
    path end to end; 'fast' cycles only None/Sub/Up — the filters whose
    reconstruction is fully vectorizable (Average/Paeth decode has a
    sequential left-dependency → per-pixel loop), so bulk synthetic
    corpora decode at numpy speed while all five stay covered by tests.
    """
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    zero3 = np.zeros(3, dtype=np.uint8)
    raw = bytearray()
    for r in range(h):
        ft = 0 if filters == "none" else (r % 3 if filters == "fast" else r % 5)
        cur = px[r].reshape(-1)
        prev = px[r - 1].reshape(-1) if r > 0 else np.zeros(w * 3, dtype=np.uint8)
        left = np.concatenate([zero3, cur[:-3]]) if w > 0 else cur
        upleft = np.concatenate([zero3, prev[:-3]]) if w > 0 else prev
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = cur - left
        elif ft == 2:
            filt = cur - prev
        elif ft == 3:
            filt = cur - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(
                np.uint8
            )
        else:
            filt = cur - _paeth(left, prev, upleft)
        raw.append(ft)
        raw += filt.astype(np.uint8).tobytes()
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode a truecolor (type 2, bit depth 8, non-interlaced) PNG into
    an (h, w, 3) uint8 array, verifying chunk CRCs and defiltering all
    five scanline filter types."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("not bytes")
    data = bytes(data)
    if data[:8] != PNG_SIG:
        raise ValueError("bad PNG signature")
    pos, w = 8, None
    h = bitdepth = ctype = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r}")
        if typ == b"IHDR":
            w, h, bitdepth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if (bitdepth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError("unsupported PNG flavor")
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (1 + stride):
        raise ValueError("bad scanline payload size")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes, rows = arr[:, 0], arr[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ft, filt = int(ftypes[r]), rows[r]
        prev = out[r - 1] if r > 0 else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[r] = filt
        elif ft == 1:
            # recon[x] = filt[x] + recon[x-3]: per-channel cumsum mod 256
            out[r] = np.cumsum(filt.reshape(-1, 3), axis=0, dtype=np.uint64).astype(
                np.uint8
            ).reshape(-1)
        elif ft == 2:
            out[r] = filt + prev
        elif ft in (3, 4):
            # sequential left-dependency — per-pixel loop, vectorized over
            # the 3 channels (images here are small; a SIMD defilter is a
            # kernel swap, not a structure change)
            rec = out[r]
            prev3 = prev.reshape(-1, 3)
            f3 = filt.reshape(-1, 3)
            r3 = rec.reshape(-1, 3)
            left = np.zeros(3, dtype=np.uint8)
            upleft = np.zeros(3, dtype=np.uint8)
            for x in range(w):
                up = prev3[x]
                if ft == 3:
                    pred = ((left.astype(np.uint16) + up.astype(np.uint16)) // 2).astype(
                        np.uint8
                    )
                else:
                    pred = _paeth(left, up, upleft)
                r3[x] = f3[x] + pred
                left, upleft = r3[x], up
        else:
            raise ValueError(f"bad filter type {ft}")
    return out.reshape(h, w, 3)


# ------------------------------------------------------------------ BMP


def bmp_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (bottom-up BGR rows, 4-byte padded)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("bmp_encode expects (h, w, 3) uint8")
    h, w, _ = px.shape
    stride = (3 * w + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    size = 54 + h * stride
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * stride, 2835, 2835, 0, 0
    )
    return header + body.tobytes()


def bmp_size(w: int, h: int) -> int:
    """File size of a ``bmp_encode`` output — closed-form (the SQL oracle
    recomputes it from the md5-derived dimensions)."""
    return 54 + h * ((3 * w + 3) & ~3)


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into (h, w, 3) uint8 RGB."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("not bytes")
    data = bytes(data)
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("bad BMP header")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0 or planes != 1:
        raise ValueError("unsupported BMP flavor")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    stride = (3 * w + 3) & ~3
    body = data[offset : offset + h * stride]
    if len(body) != h * stride:
        raise ValueError("truncated BMP body")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)[:, : 3 * w]
    px = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return px[::-1] if flip else px
