"""From-scratch WAV codec (functions/audiocodec.py) + DecodeAudioMeta
stage: sample-exact round trips across depths/channel counts, RIFF chunk
walking, malformed-input behavior. Oracle parity of multimodal_audio is
covered by the gate (check_oracles)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from europarl_crawler_ray.functions.audiocodec import WavError, wav_decode, wav_encode
from europarl_crawler_ray.stages.multimodal import (
    DecodeAudioMeta,
    fake_audio_params,
    make_fake_audio,
)


@pytest.mark.parametrize("bits", [8, 16])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_exact(bits, channels):
    rng = np.random.default_rng(7)
    lo, hi = (-128, 128) if bits == 8 else (-32768, 32768)
    s = rng.integers(lo, hi, size=(100, channels), dtype=np.int64)
    d = wav_decode(wav_encode(s, 22050, bits=bits))
    assert d["sample_rate"] == 22050
    assert d["channels"] == channels and d["bits"] == bits
    np.testing.assert_array_equal(d["samples"], s)


def test_mono_1d_input_and_extreme_values():
    s = np.array([-32768, 32767, 0, -1], dtype=np.int64)
    d = wav_decode(wav_encode(s, 8000))
    np.testing.assert_array_equal(d["samples"][:, 0], s)


def test_info_chunk_is_skipped():
    s = np.arange(-5, 6, dtype=np.int64)[:, None]
    plain = wav_decode(wav_encode(s, 16000))
    with_info = wav_decode(wav_encode(s, 16000, info=b"odd-length!"))
    np.testing.assert_array_equal(plain["samples"], with_info["samples"])


def test_unknown_chunk_word_alignment():
    # hand-build: fmt, then an odd-sized junk chunk (pad byte), then data
    s = np.array([[1], [2], [3]], dtype=np.int64)
    good = wav_encode(s, 8000)
    fmt_chunk = good[12 : 12 + 8 + 16]
    data_chunk = good[12 + 8 + 16 :]
    junk = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"
    body = b"WAVE" + fmt_chunk + junk + data_chunk
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    np.testing.assert_array_equal(wav_decode(blob)["samples"], s)


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"RIFF\x04\x00\x00\x00WAVE",  # no chunks
        b"NOPE" + b"\x00" * 40,
        wav_encode(np.array([[1]], dtype=np.int64), 8000)[:20],  # truncated
    ],
)
def test_malformed_raises_waverror(blob):
    with pytest.raises(WavError):
        wav_decode(blob)


def test_non_pcm_format_rejected():
    s = np.array([[0]], dtype=np.int64)
    blob = bytearray(wav_encode(s, 8000))
    blob[20] = 3  # fmt audio_format -> IEEE float
    with pytest.raises(WavError):
        wav_decode(bytes(blob))


def test_fake_audio_matches_params():
    for key in ["0", "17", "499"]:
        p = fake_audio_params(key)
        d = wav_decode(make_fake_audio(key))
        assert d["sample_rate"] == p["sample_rate"]
        assert d["channels"] == p["channels"]
        assert d["bits"] == p["bits"]
        assert d["samples"].shape == (p["n_frames"], p["channels"])
        mod = 256 if p["bits"] == 8 else 65536
        k = np.arange(p["n_frames"] * p["channels"], dtype=np.int64)
        expect = (p["a"] + k * p["b"]) % mod - mod // 2
        np.testing.assert_array_equal(d["samples"].ravel(), expect)


def test_decode_stage_nulls_on_garbage(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "audio": pa.array([make_fake_audio("0"), b"garbage", None], pa.binary()),
        }
    )
    out = DecodeAudioMeta()(t)
    df = out.to_pandas()
    assert df.loc[0, "n_frames"] == fake_audio_params("0")["n_frames"]
    assert df.loc[1, ["sample_rate", "sample_sum"]].isna().all()
    assert df.loc[2, ["sample_rate", "sample_sum"]].isna().all()
