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
    # a baseline stream relabeled SOF2 is MALFORMED progressive: its
    # baseline SOS tail (Ss=0, Se=63) breaks the DC-scan rule
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(prog)
    # lossless (SOF3) stays unsupported
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc3", 1))
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


# ---------------------------------------------------------------------------
# progressive (SOF2)


def _hand_built_progressive():
    """Single 8x8 gray block, quant all-ones, four hand-assembled
    scans straight from T.81 annex G — DC first (Al=1), DC refine,
    AC first (Al=1, EOB-run code), AC refine (correction bits behind
    the EOB symbol). Target coefficients (zigzag): [6, 3, -2, 0...].

    Scan bit math: DC first sends diff=6>>1=3 (cat 2, bits '11');
    DC refine sends bit 6&1=0; AC first sends +1 at k=1 and -1 at
    k=2 (each (0,1) + sign-magnitude bit) then EOB; AC refine sends
    one EOB symbol whose appended correction bits 1,0 lift |2|->3 and
    keep |-2|."""
    qt = _seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out = b"\xff\xd8" + qt + sof
    # scan 1: DC first, Al=1 — DC table: one symbol (cat 2), code '0'
    out += _seg(0xC4, bytes([0x00, 1] + [0] * 15 + [2]))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    out += bytes([0b01111111])  # '0' + '11' + pad
    # scan 2: DC refine (Ah=1, Al=0) — raw bit, no Huffman table
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    out += bytes([0b01111111])  # bit 0 + pad
    # scan 3: AC first, Ss=1 Se=63 Al=1 — AC table: 0x01->'0', 0x00->'10'
    out += _seg(0xC4, bytes([0x10, 1, 1] + [0] * 14 + [0x01, 0x00]))
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    out += bytes([0b01001011])  # (0,1)+ , (0,1)- , EOB, pad
    # scan 4: AC refine, Ah=1 Al=0 — AC table: 0x00->'0'
    out += _seg(0xC4, bytes([0x10, 1] + [0] * 15 + [0x00]))
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    out += bytes([0b01011111])  # EOB + correction bits 1,0 + pad
    return out + b"\xff\xd9"


def test_hand_built_progressive_stream_decodes_exactly():
    from polars_matmul_spark.operators.jpeg import _ZIGZAG

    img = decode_jpeg(_hand_built_progressive())
    assert img.shape == (8, 8) and img.dtype == np.uint8
    zz = np.zeros(64, np.int64)
    zz[0], zz[1], zz[2] = 6, 3, -2
    nat = np.zeros(64, np.int64)
    nat[_ZIGZAG] = zz
    want = np.clip(
        np.round(_idct2(nat.reshape(8, 8).astype(float)) + 128.0), 0, 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(img, want)


class TestProgressive:
    """decode(progressive) == decode(baseline) BIT-identically: both
    encoders quantize with the same per-block routine and the default
    scan script refines to Al=0, so the decoded pixels must match
    exactly — the strongest cross-check a lossy format allows."""

    @pytest.mark.parametrize(
        "shape,q,sub,dri",
        [
            ((40, 48, 3), 90, False, 0),
            ((40, 48, 3), 50, True, 0),
            ((33, 41, 3), 75, True, 0),   # odd dims: partial MCUs and
            ((33, 41, 3), 75, False, 0),  # nominal-vs-MCU block grids
            ((17, 23), 85, False, 0),
            ((8, 8), 90, False, 0),
            ((33, 41, 3), 75, True, 3),   # restarts inside every scan
            ((17, 23), 85, False, 2),
        ],
    )
    def test_equals_baseline_bitwise(self, shape, q, sub, dri):
        from polars_matmul_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(hash(shape) % 2**32)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, q, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, q, subsample=sub, restart_interval=dri
            )
        )
        np.testing.assert_array_equal(base, prog)

    def test_smooth_image_long_eob_runs(self):
        # smooth content -> sparse AC spectra -> multi-block EOB runs
        # with appended-bit counts (EOBn, n > 0) in both AC scan kinds
        from polars_matmul_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )

        yy, xx = np.mgrid[0:64, 0:80]
        img = (128 + 100 * np.sin(xx / 9.0) * np.cos(yy / 13.0)).astype(
            np.uint8
        )
        for q in (90, 96):
            base = decode_jpeg(encode_jpeg(img, q))
            prog = decode_jpeg(encode_jpeg_progressive(img, q))
            np.testing.assert_array_equal(base, prog)

    def test_stream_is_really_progressive(self):
        from polars_matmul_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )

        payload = encode_jpeg_progressive(
            np.zeros((16, 16, 3), np.uint8), 90
        )
        assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
        assert payload.count(b"\xff\xda") == 10  # default 3-comp script
        # and it beats the fixed-table baseline on a typical image
        # (per-scan optimal Huffman tables) — sanity, not a perf gate
        rng = np.random.default_rng(3)
        img = (rng.integers(0, 4, (64, 64, 3)) * 80).astype(np.uint8)
        assert len(encode_jpeg_progressive(img, 90)) < len(
            encode_jpeg(img, 90)
        ) * 1.2

    def test_scan_script_validation(self):
        from polars_matmul_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )

        img = np.zeros((8, 8, 3), np.uint8)
        with pytest.raises(ValueError, match="Se=0"):
            encode_jpeg_progressive(img, scans=[([0, 1, 2], 0, 5, 0, 0)])
        with pytest.raises(ValueError, match="one component"):
            encode_jpeg_progressive(img, scans=[([0, 1], 1, 63, 0, 0)])

    def test_spectral_selection_only_script(self):
        # a script with NO successive approximation (Al=0 everywhere)
        # exercises the pure spectral-selection decode path
        from polars_matmul_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
        scans = [([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0), ([0], 6, 63, 0, 0)]
        base = decode_jpeg(encode_jpeg(img, 80))
        prog = decode_jpeg(encode_jpeg_progressive(img, 80, scans=scans))
        np.testing.assert_array_equal(base, prog)

    def test_multimodal_dispatch(self):
        from polars_matmul_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )
        from polars_matmul_spark.operators.multimodal import (
            _decode_image_rgb,
            decode_asset,
        )

        rgb = np.zeros((8, 8, 3), np.uint8)
        rgb[..., 0], rgb[..., 1], rgb[..., 2] = 11, 22, 33
        payload = encode_jpeg_progressive(rgb, 95)
        assert decode_asset(payload, "image").shape == (8, 8, 3)
        np.testing.assert_array_equal(_decode_image_rgb(payload), rgb)


def test_gen_huffman_table_is_valid_and_optimalish():
    from polars_matmul_spark.operators.jpeg import (
        _build_decode_table,
        _build_encode_table,
        _gen_huffman_table,
    )

    rng = np.random.default_rng(7)
    freq = [0] * 256
    for sym in rng.integers(0, 40, 500):
        freq[sym] += int(rng.integers(1, 50))
    bits, huffval = _gen_huffman_table(freq)
    assert len(bits) == 16 and sum(bits) == len(huffval)
    # Kraft inequality strictly < 1: the all-ones code stays unused
    assert sum(n * 2.0 ** -(i + 1) for i, n in enumerate(bits)) < 1.0
    # every symbol with nonzero frequency got a code
    assert set(huffval) == {i for i, f in enumerate(freq) if f}
    # encode table and decode table invert each other
    enc = _build_encode_table(bits, huffval)
    dec = _build_decode_table(bits, huffval)
    for sym, (code, length) in enc.items():
        assert dec[(length, code)] == sym
    # more-frequent symbols never get longer codes
    lengths = {s: enc[s][1] for s in enc}
    syms = sorted(enc, key=lambda s: -freq[s])
    for a, b in zip(syms, syms[1:]):
        if freq[a] > freq[b]:
            assert lengths[a] <= lengths[b]
