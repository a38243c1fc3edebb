"""Baseline JPEG decode/encode (pure NumPy, operators/jpeg.py).

Oracle strategy for a lossy codec: (1) the IDCT is pinned against an
independent scalar transcription of the T.81 A.3.3 equation; (2) one
compressed stream is assembled BY HAND at the bit level straight from
the spec (trivial Huffman tables, DC-only block) with its expected
pixels derived mathematically — a fixture no code in this repo
produced; (3) flat blocks quantize exactly, so flat-color roundtrips
assert byte equality; (4) smooth-image roundtrips assert PSNR bounds;
(5) q=100 makes the luma quant table all-ones so gray roundtrips are
near-lossless (|err| <= 1 from DCT float rounding).
"""

import struct

import numpy as np
import pytest

from polars_matmul_spark.operators.jpeg import (
    _DCT_M,
    _idct2,
    decode_jpeg,
    encode_jpeg,
)


def test_idct_matches_spec_transcription():
    """T.81 A.3.3: f(x,y) = 1/4 sum_u sum_v C(u)C(v) S(u,v)
    cos((2x+1)u pi/16) cos((2y+1)v pi/16)."""
    rng = np.random.default_rng(5)
    S = rng.integers(-200, 200, (8, 8)).astype(np.float64)
    want = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv * S[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            want[x, y] = acc / 4.0
    np.testing.assert_allclose(_idct2(S), want, atol=1e-9)
    # and the basis is orthonormal, so idct(dct(f)) == f
    f = rng.normal(size=(8, 8))
    np.testing.assert_allclose(_idct2(_DCT_M @ f @ _DCT_M.T), f, atol=1e-12)


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _hand_built_dc_only(dc=80, prec=8):
    """Single 8x8 gray block, quant all-ones, DC coefficient `dc`, no
    AC: trivial Huffman tables (one 1-bit code each). Expected output:
    every pixel = 128 + dc/8 (only the S00 basis function, constant
    C(0)C(0)/4 * cos0 * cos0 = 1/8)."""
    cat = int(abs(dc)).bit_length()
    qt = _seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = _seg(0xC0, struct.pack(">BHHB", prec, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht_dc = _seg(0xC4, bytes([0x00, 1] + [0] * 15 + [cat]))
    dht_ac = _seg(0xC4, bytes([0x10, 1] + [0] * 15 + [0x00]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # bitstream: DC huff code '0', then `cat` magnitude bits of dc
    # (negative values use the spec's v + 2^t - 1 representation),
    # then AC huff code '0' = EOB; pad with 1-bits
    mag = dc if dc >= 0 else dc + (1 << cat) - 1
    bits = "0" + format(mag, f"0{cat}b") + "0"
    bits += "1" * (-len(bits) % 8)
    data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    return b"\xff\xd8" + qt + sof + dht_dc + dht_ac + sos + data + b"\xff\xd9"


def test_hand_built_stream_decodes_exactly():
    img = decode_jpeg(_hand_built_dc_only(dc=80))
    assert img.shape == (8, 8) and img.dtype == np.uint8
    np.testing.assert_array_equal(img, np.full((8, 8), 138))  # 128 + 80/8
    np.testing.assert_array_equal(
        decode_jpeg(_hand_built_dc_only(dc=-40)), np.full((8, 8), 123)
    )  # 128 - 5


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (17, 9)])
def test_flat_roundtrips_are_exact(shape):
    for val in (0, 77, 128, 255):
        img = np.full(shape, val, np.uint8)
        np.testing.assert_array_equal(decode_jpeg(encode_jpeg(img, 90)), img)
    rgb = np.zeros((*shape, 3), np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 100, 50
    np.testing.assert_array_equal(decode_jpeg(encode_jpeg(rgb, 95)), rgb)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def test_smooth_image_psnr():
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.dstack(
        [np.clip(yy * 4, 0, 255), np.clip(xx * 3, 0, 255),
         np.clip(255 - yy * 2 - xx, 0, 255)]
    ).astype(np.uint8)
    assert _psnr(decode_jpeg(encode_jpeg(img, 90)), img) > 40
    assert _psnr(decode_jpeg(encode_jpeg(img, 70)), img) > 35
    # 4:2:0 subsampling + restart markers still reconstruct well
    assert _psnr(
        decode_jpeg(encode_jpeg(img, 90, subsample=True, restart_interval=2)),
        img,
    ) > 35


def test_q100_gray_near_lossless():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 24), np.uint8)
    out = decode_jpeg(encode_jpeg(img, 100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_restart_interval_resets_dc_prediction():
    # non-multiple-of-8 width forces edge MCUs; DRI=1 restarts between
    # every MCU — any DC-predictor bug shifts whole blocks
    rng = np.random.default_rng(4)
    base = np.repeat(np.repeat(rng.integers(0, 256, (3, 5)), 8, 0), 8, 1)
    img = base.astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, 95, restart_interval=1))
    assert _psnr(out, img) > 40


def test_errors():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nxxxx")
    good = encode_jpeg(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError, match="truncated|no SOS"):
        decode_jpeg(good[:20])
    # progressive: patch SOF0 marker (FFC0) to SOF2 (FFC2)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(_hand_built_dc_only(prec=12))
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(np.zeros((8, 8), np.uint8), quality=0)
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), np.float64))


def test_multimodal_integration(spark):
    from polars_matmul_spark.operators.multimodal import (
        _decode_image_rgb,
        decode_asset,
        decoded_asset_stats,
    )

    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 11, 22, 33
    payload = encode_jpeg(rgb, 95)
    assert decode_asset(payload, "image").shape == (8, 8, 3)
    np.testing.assert_array_equal(_decode_image_rgb(payload), rgb)
    rows = [
        (1, bytearray(payload)),
        (2, bytearray(encode_jpeg(np.full((4, 4), 50, np.uint8)))),
        (3, bytearray(b"\xff\xd8\xff" + b"\x00" * 20)),  # corrupt -> opaque
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = {r.asset_id: r for r in decoded_asset_stats(df).collect()}
    assert out[1].container == "jpeg" and (out[1].width, out[1].height) == (8, 8)
    assert (out[1].mean_r, out[1].mean_g, out[1].mean_b) == (11.0, 22.0, 33.0)
    assert out[2].container == "jpeg" and out[2].mean_r == 50.0
    assert out[3].container == "opaque"
