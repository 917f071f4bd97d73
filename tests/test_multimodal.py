"""From-scratch BMP/PNG codecs + the multimodal actor-pool stage."""

import numpy as np
import pyarrow as pa
import pytest

from europarl_crawler_ray.functions.imagecodec import (
    bmp_decode,
    bmp_encode,
    bmp_size,
    png_decode,
    png_encode,
)
from europarl_crawler_ray.stages.multimodal import (
    DecodeImageMeta,
    fake_image_params,
    make_fake_image,
)


def _random_px(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 7), (16, 16), (23, 41), (64, 5)])
def test_bmp_roundtrip(h, w):
    rng = np.random.default_rng(h * 100 + w)
    px = _random_px(rng, h, w)
    data = bmp_encode(px)
    assert len(data) == bmp_size(w, h)
    assert data[:2] == b"BM"
    np.testing.assert_array_equal(bmp_decode(data), px)


@pytest.mark.parametrize("filters", ["none", "mixed"])
@pytest.mark.parametrize("h,w", [(1, 1), (3, 7), (16, 16), (23, 41), (64, 5)])
def test_png_roundtrip(h, w, filters):
    rng = np.random.default_rng(h * 100 + w)
    px = _random_px(rng, h, w)
    data = png_encode(px, filters=filters)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    np.testing.assert_array_equal(png_decode(data), px)


def test_png_mixed_exercises_all_five_filters():
    # 7 rows -> filter types 0,1,2,3,4,0,1
    px = _random_px(np.random.default_rng(0), 7, 9)
    np.testing.assert_array_equal(png_decode(png_encode(px, filters="mixed")), px)


def test_png_rejects_corruption():
    px = _random_px(np.random.default_rng(1), 8, 8)
    data = bytearray(png_encode(px))
    data[40] ^= 0xFF  # flip a byte inside IDAT/IHDR region
    with pytest.raises(ValueError):
        png_decode(bytes(data))
    with pytest.raises(ValueError):
        png_decode(b"\x89PNG\r\n\x1a\nshort")
    with pytest.raises(ValueError):
        bmp_decode(b"BMshort")


def test_make_fake_image_is_decodable_real_file():
    seen = set()
    for key in map(str, range(40)):
        p = fake_image_params(key)
        blob = make_fake_image(key)
        seen.add(p["format"])
        px = bmp_decode(blob) if p["format"] == "bmp" else png_decode(blob)
        assert px.shape == (p["height"], p["width"], 3)
        assert (px[:, :, 0] == p["r"]).all()
        assert (px[:, :, 1] == p["g"]).all()
        assert (px[:, :, 2] == p["b"]).all()
        if p["format"] == "bmp":
            assert len(blob) == bmp_size(p["width"], p["height"])
    assert seen == {"bmp", "png"}  # both codecs exercised


def test_decode_image_meta_stage():
    keys = [str(i) for i in range(12)]
    blobs = [make_fake_image(k) for k in keys] + [None, b"garbage"]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(blobs))), pa.int64()),
            "image": pa.array(blobs, pa.binary()),
        }
    )
    out = DecodeImageMeta()(t).to_pandas()
    for i, k in enumerate(keys):
        p = fake_image_params(k)
        row = out.iloc[i]
        assert row["format"] == p["format"]
        assert (row["width"], row["height"], row["channels"]) == (
            p["width"],
            p["height"],
            3,
        )
        assert (row["pix_r"], row["pix_g"], row["pix_b"]) == (p["r"], p["g"], p["b"])
        assert row["pixel_sum"] == (p["r"] + p["g"] + p["b"]) * p["width"] * p["height"]
        assert row["n_bytes"] == len(blobs[i])
    assert out.iloc[12].isna()["format"] and out.iloc[13].isna()["width"]


def test_legacy_fimg_blob_still_decodes_header():
    import struct

    blob = b"FIMG" + struct.pack("<HHB", 32, 20, 3) + b"\x00" * 10
    out = DecodeImageMeta()(
        pa.table({"doc_id": pa.array([1], pa.int64()), "image": pa.array([blob], pa.binary())})
    ).to_pandas()
    assert out.iloc[0]["format"] == "fimg"
    assert (out.iloc[0]["width"], out.iloc[0]["height"]) == (32, 20)
    assert np.isnan(out.iloc[0]["pixel_sum"])


def test_truncated_png_yields_null_row_not_task_failure():
    """Review finding: zlib.error (truncated IDAT) and struct.error (cut
    mid chunk-header) must yield null rows, not crash the stage."""
    import struct
    import zlib

    from europarl_crawler_ray.functions.imagecodec import _chunk

    good = make_fake_image("7")  # ensure one decodable row beside the bad ones
    # valid-CRC chunks but the IDAT deflate payload is truncated garbage
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    trunc_idat = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(
        b"IDAT", zlib.compress(b"x" * 100)[:5]
    ) + _chunk(b"IEND", b"")
    cut_header = make_fake_image("1")[:30]  # mid-chunk cut
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "image": pa.array([good, trunc_idat, cut_header], pa.binary()),
        }
    )
    out = DecodeImageMeta()(t).to_pandas()
    assert out.iloc[0]["format"] in ("bmp", "png")
    assert out.iloc[1].isna()["format"]
    assert out.iloc[2].isna()["format"]
