"""AVI codec + DecodeVideoMeta stage: container round trip, byte-level
agreement with the BMP pixel convention, structure validation (idx1 /
avih / strf cross-checks), frame sampling, malformed-input null rows.
Oracle parity is covered by the gate."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from europarl_crawler_ray.functions.imagecodec import bmp_encode
from europarl_crawler_ray.functions.videocodec import AviError, avi_decode, avi_encode
from europarl_crawler_ray.stages.multimodal import (
    DecodeVideoMeta,
    fake_video_params,
    make_fake_video,
)


def _frames(n=3, h=5, w=7, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8) for _ in range(n)]


def test_avi_roundtrip_exact_pixels():
    frames = _frames()
    d = avi_decode(avi_encode(frames, us_per_frame=33_000))
    assert (d["width"], d["height"], d["n_frames"], d["us_per_frame"]) == (7, 5, 3, 33_000)
    for a, b in zip(d["frames"], frames):
        assert (a == b).all()


def test_avi_frame_chunk_equals_bmp_body():
    # an AVI 'DIB ' frame payload IS the body of the same frame's BMP
    frame = _frames(n=1)[0]
    blob = avi_encode([frame])
    movi = blob.index(b"movi")
    assert blob[movi + 4 : movi + 8] == b"00db"
    (size,) = struct.unpack_from("<I", blob, movi + 8)
    payload = blob[movi + 12 : movi + 12 + size]
    assert payload == bmp_encode(frame)[54:]


def test_avi_structure_validation():
    frames = _frames(n=2)
    blob = bytearray(avi_encode(frames))
    with pytest.raises(AviError):
        avi_decode(b"RIFF\x04\x00\x00\x00WAVE")  # wrong RIFF type
    with pytest.raises(AviError):
        avi_decode(bytes(blob[:40]))  # truncated
    # corrupt the avih frame count -> count cross-check must fire
    avih = blob.index(b"avih")
    struct.pack_into("<I", blob, avih + 8 + 16, 99)
    with pytest.raises(AviError, match="frame count"):
        avi_decode(bytes(blob))


def test_avi_rejects_frame_shape_mismatch():
    a, b = _frames(n=2)
    with pytest.raises(AviError):
        avi_encode([a, b[:-1]])
    with pytest.raises(AviError):
        avi_encode([])


def test_make_fake_video_matches_params():
    p = fake_video_params("17")
    d = avi_decode(make_fake_video("17"))
    assert (d["width"], d["height"], d["n_frames"]) == (
        p["width"],
        p["height"],
        p["n_frames"],
    )
    for k, f in enumerate(d["frames"]):
        assert (f[:, :, 0] == (p["r"] + 13 * k) % 256).all()
        assert (f[:, :, 1] == (p["g"] + 13 * k) % 256).all()
        assert (f[:, :, 2] == (p["b"] + 13 * k) % 256).all()


def test_decode_stage_sampling_and_nulls():
    frames = _frames(n=5, h=4, w=4, seed=2)
    good = avi_encode(frames, us_per_frame=20_000)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "video": pa.array([good, b"garbage", None], pa.binary()),
        }
    )
    out = DecodeVideoMeta(sample_stride=2)(t).to_pandas().set_index("doc_id")
    sums = [int(f.sum(dtype=np.int64)) for f in frames]
    assert out.loc[1, "pixel_sum_all"] == sum(sums)
    assert out.loc[1, "pixel_sum_sampled"] == sums[0] + sums[2] + sums[4]
    assert out.loc[1, "frame0_sum"] == sums[0]
    assert out.loc[1, "duration_ms"] == 5 * 20_000 // 1000
    assert out.loc[2].isna().all() and out.loc[3].isna().all()
