"""From-scratch WAV (RIFF/WAVE, ISO/IEC-style chunked) codec — PCM 8/16-bit.

Written against the public RIFF/WAVE layout (the canonical 44-byte PCM
header: 'RIFF' size 'WAVE', an 'fmt ' chunk with PCM fields, a 'data'
chunk of interleaved frames), the same way ``functions/pdf.py`` is
written against ISO 32000 and ``functions/imagecodec.py`` against the
PNG/BMP specs. No audio library is involved anywhere.

Encoder and decoder are both real:
- ``wav_encode`` emits a valid file (optionally with an extra LIST/INFO
  chunk between fmt and data, so decoders must actually walk chunks).
- ``wav_decode`` walks chunks by id/size (word-aligned), parses the fmt
  fields, and decodes samples with ``np.frombuffer`` (vectorized — no
  per-sample Python loop). 8-bit PCM is unsigned per spec and is
  centered to [-128, 127] on decode so both depths share a convention.

The multimodal audio stage (``stages/multimodal.DecodeAudioMeta``) runs
this inside an actor-pool ``map_batches``; per-blob parse is the
string-kernel floor, the sample math is numpy.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def wav_encode(
    samples: np.ndarray,
    sample_rate: int,
    bits: int = 16,
    info: bytes | None = None,
) -> bytes:
    """Encode interleaved PCM frames to a WAV file.

    ``samples``: int array of shape (n_frames,) or (n_frames, channels),
    values already centered (int16 range for 16-bit, [-128,127] for
    8-bit — 8-bit storage adds the spec's +128 offset). ``info`` adds a
    LIST/INFO comment chunk between fmt and data (chunk-walk exercise).
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, channels = samples.shape
    if bits == 16:
        payload = samples.astype("<i2").tobytes()
    elif bits == 8:
        payload = (samples.astype(np.int16) + 128).astype(np.uint8).tobytes()
    else:
        raise WavError(f"unsupported bits={bits}")
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    chunks = [(b"fmt ", fmt)]
    if info is not None:
        # LIST chunk: form type 'INFO', one 'ICMT' sub-chunk
        sub = b"ICMT" + struct.pack("<I", len(info)) + info + (b"\x00" if len(info) % 2 else b"")
        chunks.append((b"LIST", b"INFO" + sub))
    chunks.append((b"data", payload))
    body = b"WAVE"
    for cid, data in chunks:
        body += cid + struct.pack("<I", len(data)) + data
        if len(data) % 2:  # RIFF chunks are word-aligned
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(blob: bytes) -> dict:
    """Decode a WAV file → dict(samples (n_frames, channels) int32
    centered, sample_rate, channels, bits). Unknown chunks are skipped
    by their declared size (word-aligned), as the RIFF spec requires."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    if riff_size + 8 > len(blob):
        raise WavError("truncated RIFF payload")
    pos, end = 12, 8 + riff_size
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        start = pos + 8
        if start + size > end:
            raise WavError(f"chunk {cid!r} overruns file")
        if cid == b"fmt ":
            if size < 16:
                raise WavError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", blob, start)
        elif cid == b"data":
            data = blob[start : start + size]
        pos = start + size + (size % 2)
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise WavError(f"unsupported (non-PCM) format {audio_format}")
    if channels < 1:
        raise WavError("zero channels")
    if bits == 16:
        flat = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2").astype(np.int32)
    elif bits == 8:
        flat = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise WavError(f"unsupported bits={bits}")
    n_frames = len(flat) // channels
    samples = flat[: n_frames * channels].reshape(n_frames, channels)
    return {
        "samples": samples,
        "sample_rate": int(sample_rate),
        "channels": int(channels),
        "bits": int(bits),
    }
