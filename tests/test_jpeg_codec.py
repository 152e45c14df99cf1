"""Baseline JPEG codec: the entropy+marker layer must be LOSSLESS
(decoded quantized coefficients == the encoder's, bit for bit) and the
pixel path deterministic (decode == direct dequant->IDCT->upsample of
those coefficients).  JPEG itself is lossy, so pixel round-trips are
held to PSNR sanity, not equality."""

import numpy as np
import pytest

from news_information_retrieval_system_ray.functions.jpeg import (
    ZIGZAG,
    _dequant_idct,
    _ycbcr_to_rgb,
    decode_jpeg,
    decode_quantized,
    encode_jpeg,
    quant_tables,
    quantized_planes,
)


def _gradient_img(h, w, seed=3):
    rng = np.random.default_rng(seed)
    gx = np.linspace(0, 255, w)
    gy = np.linspace(0, 255, h)
    return np.stack([
        np.add.outer(gy * 0, gx),
        np.add.outer(gy, gx * 0),
        rng.integers(0, 256, size=(h, w)).astype(np.float64),
    ], axis=2).astype(np.uint8)


def test_zigzag_is_the_standard_order():
    assert ZIGZAG[:16].tolist() == [0, 1, 8, 16, 9, 2, 3, 10,
                                    17, 24, 32, 25, 18, 11, 4, 5]
    assert ZIGZAG[-4:].tolist() == [47, 55, 62, 63]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_quant_tables_quality_scaling():
    q50l, q50c = quant_tables(50)
    assert q50l[0] == 16 and q50c[0] == 17  # Annex K verbatim at q=50
    q100l, _ = quant_tables(100)
    assert (q100l == 1).all()
    q10l, _ = quant_tables(10)
    assert (q10l >= q50l).all()


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("dims", [(64, 64), (17, 23), (8, 8), (33, 50)])
def test_entropy_layer_bit_exact(subsampling, dims):
    """decode_quantized(encode(img)) == quantized_planes(img): Huffman +
    byte stuffing + markers invert exactly, every block, every coeff."""
    h, w = dims
    img = _gradient_img(h, w)
    for quality in (30, 75, 95):
        payload = encode_jpeg(img, quality=quality, subsampling=subsampling)
        want = quantized_planes(img, quality=quality, subsampling=subsampling)
        got = decode_quantized(payload)
        assert len(got) == len(want) == 3
        for (wy, wx, wzz), (gy, gx, gzz) in zip(want, got):
            assert (wy, wx) == (gy, gx)
            np.testing.assert_array_equal(wzz, gzz)


def test_entropy_layer_bit_exact_grayscale():
    img = _gradient_img(40, 56)[:, :, 1].copy()
    payload = encode_jpeg(img, quality=80)
    want = quantized_planes(img, quality=80)
    got = decode_quantized(payload)
    assert len(got) == len(want) == 1
    np.testing.assert_array_equal(want[0][2], got[0][2])


def test_pixel_path_matches_direct_reconstruction():
    """decode_jpeg == dequant->IDCT->(upsample)->YCbCr-matrix applied
    directly to the encoder's coefficient planes: the decoder adds no
    hidden transforms."""
    img = _gradient_img(24, 40)
    payload = encode_jpeg(img, quality=75, subsampling="420")
    ql, qc = quant_tables(75)
    planes = quantized_planes(img, quality=75, subsampling="420")
    px = []
    for (by, bx, zz), qtab in zip(planes, (ql, qc, qc)):
        blocks = _dequant_idct(zz, qtab)
        plane = blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8)
        px.append(plane)
    y = px[0][:24, :40]
    cb = np.repeat(np.repeat(px[1], 2, axis=0), 2, axis=1)[:24, :40]
    cr = np.repeat(np.repeat(px[2], 2, axis=0), 2, axis=1)[:24, :40]
    expect = _ycbcr_to_rgb(y, cb, cr)
    np.testing.assert_array_equal(decode_jpeg(payload), expect)


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_high_quality_psnr(subsampling):
    # realistic smooth content (gradients + low-frequency waves): the
    # per-pixel-noise case is excluded deliberately — 4:2:0 averages
    # away pixel-rate chroma BY DESIGN, so PSNR there measures the
    # format, not the codec
    h, w = 48, 48
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.stack([
        xx / (w - 1) * 255,
        yy / (h - 1) * 255,
        127.5 + 80 * np.sin(xx / 6) * np.cos(yy / 7),
    ], axis=2)
    img = np.clip(np.floor(img + 0.5), 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=subsampling))
    assert out.shape == img.shape and out.dtype == np.uint8
    mse = float(np.mean((out.astype(np.float64) - img) ** 2))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr > (34 if subsampling == "420" else 38), psnr


def test_decode_deterministic_and_stuffing_robust():
    """A flat 255-white image maximizes 0xFF-adjacent entropy bytes;
    decode must be stable and exact across calls."""
    img = np.full((16, 24, 3), 255, dtype=np.uint8)
    payload = encode_jpeg(img, quality=90)
    a = decode_jpeg(payload)
    b = decode_jpeg(payload)
    np.testing.assert_array_equal(a, b)
    assert (np.abs(a.astype(int) - 255) <= 1).all()
    # flat black too (DC-only negative diffs)
    img0 = np.zeros((16, 16, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_quantized(encode_jpeg(img0, quality=50))[0][2],
        quantized_planes(img0, quality=50)[0][2])


def test_bad_inputs_raise():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 3), dtype=np.float64))  # not uint8
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="422")
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")


def test_mjpeg_avi_roundtrip():
    """Motion-JPEG AVI: every frame an independent baseline JPEG in a
    00dc chunk with biCompression='MJPG'; decode_avi dispatches on the
    BITMAPINFOHEADER compression field."""
    from news_information_retrieval_system_ray.stages.multimodal import (
        decode_avi, encode_avi)

    h, w = 16, 22  # odd-ish dims exercise JPEG padding inside frames
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    frames = np.stack([np.stack([
        np.clip(xx * 10 + f * 5, 0, 255),
        np.clip(yy * 12, 0, 255),
        np.full((h, w), 90.0 + 8 * f),
    ], axis=2) for f in range(5)]).astype(np.uint8)
    payload = encode_avi(frames, fps=8, codec="MJPG", quality=92)
    assert b"MJPG" in payload[:200]
    back, fps = decode_avi(payload)
    assert fps == 8 and back.shape == frames.shape and back.dtype == np.uint8
    # lossy but tight on smooth content at q=92
    mse = float(np.mean((back.astype(np.float64) - frames) ** 2))
    assert mse < 30, mse
    # deterministic decode
    np.testing.assert_array_equal(back, decode_avi(payload)[0])
    # DIB stays bit-exact through the same dispatcher
    dib = encode_avi(frames, fps=8, codec="DIB")
    np.testing.assert_array_equal(decode_avi(dib)[0], frames)
    with pytest.raises(ValueError):
        encode_avi(frames, codec="h264")


def test_decoder_survives_truncation_and_corruption():
    """Malformed payloads must raise cleanly (never hang or return
    garbage silently): truncations at every 37-byte stride and
    single-byte corruptions across the header and entropy segment."""
    img = _gradient_img(16, 16, seed=1)
    payload = encode_jpeg(img, quality=70)
    for cut in range(2, len(payload), 37):
        try:
            out = decode_jpeg(payload[:cut])
            assert out.dtype == np.uint8  # decoded despite truncation: fine
        except Exception as e:
            assert isinstance(e, (ValueError, KeyError, IndexError)), \
                (cut, type(e))
    rng = np.random.default_rng(5)
    for _ in range(60):
        pos = int(rng.integers(2, len(payload)))
        mutated = bytearray(payload)
        mutated[pos] ^= 0xFF
        try:
            out = decode_jpeg(bytes(mutated))
            assert out.dtype == np.uint8
        except Exception as e:
            assert isinstance(e, (ValueError, KeyError, IndexError)), \
                (pos, type(e))


def test_crafted_sof_sampling_zero_raises_valueerror():
    """A SOF with a 0 h/v sampling nibble must stay inside the
    malformed-payload ValueError contract, not ZeroDivisionError."""
    img = _gradient_img(16, 16, seed=3)
    payload = bytearray(encode_jpeg(img, quality=70))
    sof = payload.find(b"\xff\xc0")
    assert sof >= 0
    # marker(2) + len(2) + prec(1) + h(2) + w(2) + nc(1) + cid(1) -> hv
    hv_off = sof + 2 + 2 + 1 + 2 + 2 + 1 + 1
    for bad in (0x01, 0x10, 0x00):  # h=0 / v=0 / both
        mutated = bytearray(payload)
        mutated[hv_off] = bad
        with pytest.raises(ValueError):
            decode_jpeg(bytes(mutated))


def test_truncated_strf_raises_valueerror():
    """A strf chunk shorter than BITMAPINFOHEADER must raise ValueError,
    not struct.error (the malformed-payload contract)."""
    import struct

    from news_information_retrieval_system_ray.stages.multimodal import decode_avi

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data + b"\x00" * (len(data) % 2)

    body = b"AVI " + chunk(b"strf", b"\x00" * 10)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        decode_avi(payload)
    # truncated strh too
    body2 = b"AVI " + chunk(b"strh", b"\x00" * 12)
    payload2 = b"RIFF" + struct.pack("<I", len(body2)) + body2
    with pytest.raises(ValueError):
        decode_avi(payload2)
