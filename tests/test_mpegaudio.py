"""MPEG-1 Layer I payload decode (operators/mpegaudio.py).

The primary fixtures are hand-assembled at the BIT level (a local
bit-string builder, independent of the module's _BitWriter), so the
decoder is not graded by its own encoder; the encoder is then gated
by round-tripping against the hand-verified decoder.
"""

from fractions import Fraction

import numpy as np
import pytest

from polars_matmul_spark.operators.mpegaudio import (
    decode_layer1,
    decode_layer1_table,
    encode_layer1,
    requantize,
    scalefactor,
)


def _bits_to_bytes(bits: str, total_bytes: int) -> bytes:
    bits = bits + "0" * (total_bytes * 8 - len(bits))
    return bytes(
        int(bits[i : i + 8], 2) for i in range(0, total_bytes * 8, 8)
    )


def _hand_frame(alloc, sf_idx, codes, channels=1):
    """Assemble one 32 kbps @ 32 kHz layer-I frame (48 bytes) from a
    bit string written out field by field."""
    header = bytes([0xFF, 0xFF, 0x18, 0xC0 if channels == 1 else 0x00])
    bits = ""
    for sb in range(32):
        for ch in range(channels):
            a = alloc[sb] if channels == 1 else alloc[sb][ch]
            bits += f"{a:04b}"
    it = iter(sf_idx)
    for sb in range(32):
        for ch in range(channels):
            a = alloc[sb] if channels == 1 else alloc[sb][ch]
            if a:
                bits += f"{next(it):06b}"
    for s in range(12):
        for sb in range(32):
            for ch in range(channels):
                a = alloc[sb] if channels == 1 else alloc[sb][ch]
                if a:
                    c = codes[s][sb] if channels == 1 else codes[s][sb][ch]
                    bits += format(c, f"0{a + 1}b")
    return header + _bits_to_bytes(bits, 44)


class TestFormulas:
    def test_scalefactor_exact_powers(self):
        assert scalefactor(0) == 2.0
        assert scalefactor(3) == 1.0
        assert scalefactor(6) == 0.5
        assert scalefactor(62) == 2.0 * 2.0 ** (-62 / 3.0)
        for bad in (-1, 63):
            with pytest.raises(ValueError):
                scalefactor(bad)

    def test_requantize_against_fraction_arithmetic(self):
        # the exact rational the spec formula defines, evaluated in
        # unbounded precision, must match the float path to 1 ulp-ish
        for nb in (2, 3, 8, 15):
            for c in (0, 1, (1 << nb) // 2, (1 << nb) - 1):
                exact = (
                    (Fraction(c, 1 << (nb - 1)) - 1 + Fraction(1, 1 << nb))
                    * Fraction(1 << nb, (1 << nb) - 1)
                    * Fraction(1, 2)
                )
                got = requantize(c, nb, 0.5)
                assert got == pytest.approx(float(exact), rel=1e-14)

    def test_requantize_range(self):
        # normalized mid-rise grid: extremes land exactly on +-1 (to
        # float rounding of the 2^nb/(2^nb - 1) factor), symmetric
        for nb in (2, 8, 15):
            lo = requantize(0, nb, 1.0)
            hi = requantize((1 << nb) - 1, nb, 1.0)
            assert lo == pytest.approx(-1.0, abs=1e-14)
            assert hi == pytest.approx(1.0, abs=1e-14)
            assert lo == -hi
        # nb=2 grid is exactly {-1, -1/3, 1/3, 1}
        assert requantize(1, 2, 1.0) == pytest.approx(-1 / 3, abs=1e-15)
        assert requantize(2, 2, 1.0) == pytest.approx(1 / 3, abs=1e-15)


class TestHandAssembled:
    def test_mono_single_subband(self):
        alloc = [0] * 32
        alloc[5] = 2  # nb = 3
        codes = [[0] * 32 for _ in range(12)]
        vals = [0, 1, 2, 3, 4, 5, 6, 7, 0, 1, 2, 3]
        for s in range(12):
            codes[s][5] = vals[s]
        payload = _hand_frame(alloc, [6], codes)  # sf = 0.5
        d = decode_layer1(payload)
        assert d["sample_rate"] == 32000
        assert d["bitrate_kbps"] == 32
        assert d["channels"] == 1 and d["n_frames"] == 1
        assert d["alloc"][0, 5] == 2 and d["sf_idx"][0, 5] == 6
        assert d["sf_idx"][0, 4] == -1
        np.testing.assert_array_equal(d["codes"][0, :, 5], vals)
        for s, c in enumerate(vals):
            assert d["subbands"][0, s, 5] == requantize(c, 3, 0.5)
        # unallocated subbands decode to exactly 0
        assert np.all(d["subbands"][0, :, 6:] == 0.0)

    def test_stereo_independent_channels(self):
        alloc = [[0, 0] for _ in range(32)]
        alloc[0] = [1, 3]  # nb 2 and 4: per-channel allocations differ
        codes = [[[0, 0] for _ in range(32)] for _ in range(12)]
        for s in range(12):
            codes[s][0] = [s % 4, s % 16]
        payload = _hand_frame(alloc, [3, 9], codes, channels=2)
        d = decode_layer1(payload)
        assert d["channels"] == 2
        assert d["alloc"][0, 0, 0] == 1 and d["alloc"][0, 0, 1] == 3
        np.testing.assert_array_equal(
            d["codes"][0, :, 0, 0], [s % 4 for s in range(12)]
        )
        np.testing.assert_array_equal(
            d["codes"][0, :, 0, 1], [s % 16 for s in range(12)]
        )
        assert d["subbands"][0, 1, 0, 0] == requantize(1, 2, scalefactor(3))
        assert d["subbands"][0, 1, 0, 1] == requantize(1, 4, scalefactor(9))

    def test_joint_stereo_hand_assembled(self):
        # mode 01, mode_extension 0 -> bound 4: subband 0 is
        # independent (left-only allocation here), subband 5 is in the
        # intensity region — ONE allocation field, ONE code per sample
        # time, but per-channel scalefactors
        header = bytes([0xFF, 0xFF, 0x18, 0x40])
        bits = ""
        for sb in range(4):  # below bound: two alloc fields each
            bits += ("0001" "0000") if sb == 0 else "00000000"
        for sb in range(4, 32):  # at/above bound: one alloc field
            bits += "0010" if sb == 5 else "0000"
        bits += "000000"  # sf for sb0 left (idx 0)
        bits += "000011" + "000110"  # sb5: left sf 3, right sf 6
        left_codes = [s % 4 for s in range(12)]
        shared_codes = [(s * 3) % 8 for s in range(12)]
        for s in range(12):
            bits += f"{left_codes[s]:02b}"  # sb0 left, nb=2
            bits += f"{shared_codes[s]:03b}"  # sb5 shared, nb=3
        payload = header + _bits_to_bytes(bits, 44)
        d = decode_layer1(payload)
        assert d["channels"] == 2 and d["bound"] == 4
        assert d["alloc"][0, 0, 0] == 1 and d["alloc"][0, 0, 1] == 0
        assert d["alloc"][0, 5, 0] == 2 and d["alloc"][0, 5, 1] == 2
        assert d["sf_idx"][0, 5, 0] == 3 and d["sf_idx"][0, 5, 1] == 6
        np.testing.assert_array_equal(d["codes"][0, :, 0, 0], left_codes)
        np.testing.assert_array_equal(d["codes"][0, :, 5, 0], shared_codes)
        np.testing.assert_array_equal(  # shared code mirrored
            d["codes"][0, :, 5, 0], d["codes"][0, :, 5, 1]
        )
        # intensity: same shape, per-channel level
        for s, c in enumerate(shared_codes):
            assert d["subbands"][0, s, 5, 0] == requantize(c, 3, scalefactor(3))
            assert d["subbands"][0, s, 5, 1] == requantize(c, 3, scalefactor(6))

    def test_two_frames(self):
        alloc = [0] * 32
        alloc[0] = 1
        codes = [[0] * 32 for _ in range(12)]
        one = _hand_frame(alloc, [0], codes)
        d = decode_layer1(one + one)
        assert d["n_frames"] == 2 and d["codes"].shape == (2, 12, 32)

    def test_errors(self):
        alloc = [0] * 32
        codes = [[0] * 32 for _ in range(12)]
        good = _hand_frame(alloc, [], codes)
        with pytest.raises(ValueError, match="sync"):
            decode_layer1(b"\x00\x00\x00\x00")
        with pytest.raises(ValueError, match="layer I"):
            decode_layer1(bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 413)
        with pytest.raises(ValueError, match="truncated"):
            decode_layer1(good[:20])
        with pytest.raises(ValueError, match="trailing"):
            decode_layer1(good + b"\x01")
        # an all-silent joint frame is legal (bound 4, no allocations):
        # alloc bits = 4*8 + 28*4 = 144 bits, rest padding
        silent = decode_layer1(bytes([0xFF, 0xFF, 0x18, 0x40]) + b"\x00" * 44)
        assert silent["bound"] == 4 and silent["channels"] == 2
        bad_alloc = bytearray(good)
        bad_alloc[4] = 0xF0  # subband 0 allocation = 15
        with pytest.raises(ValueError, match="allocation 15"):
            decode_layer1(bytes(bad_alloc))
        # scalefactor 63: alloc sb0 = 1 then 111111
        a = [0] * 32
        a[0] = 1
        sf63 = _hand_frame(a, [63], codes)
        with pytest.raises(ValueError, match="scalefactor"):
            decode_layer1(sf63)


class TestEncoder:
    def test_round_trip_mono(self):
        rng = np.random.default_rng(11)
        alloc = [0] * 32
        for sb in (0, 3, 11, 31):
            alloc[sb] = 6  # nb = 7
        sfs = [3, 6, 9, 12]
        codes = rng.integers(0, 128, size=(5, 12, 4))
        payload = encode_layer1(codes, alloc, sfs, 448, 32000)
        d = decode_layer1(payload)
        assert d["n_frames"] == 5 and d["bitrate_kbps"] == 448
        active = [0, 3, 11, 31]
        np.testing.assert_array_equal(d["codes"][:, :, active], codes)
        for i, sb in enumerate(active):
            assert np.all(d["sf_idx"][:, sb] == sfs[i])

    def test_round_trip_stereo(self):
        rng = np.random.default_rng(12)
        alloc = [0] * 32
        alloc[2] = 4  # nb = 5
        codes = rng.integers(0, 32, size=(2, 12, 1, 2))
        payload = encode_layer1(codes, alloc, [30], 448, 32000, channels=2)
        d = decode_layer1(payload)
        assert d["channels"] == 2
        np.testing.assert_array_equal(d["codes"][:, :, 2, :], codes[:, :, 0, :])

    def test_round_trip_joint(self):
        rng = np.random.default_rng(13)
        alloc = [0] * 32
        alloc[1] = 3  # below bound 8: independent channels
        alloc[20] = 5  # above: shared codes
        codes = np.zeros((3, 12, 2, 2), np.int64)
        codes[:, :, 0, :] = rng.integers(0, 16, size=(3, 12, 2))
        shared = rng.integers(0, 64, size=(3, 12))
        codes[:, :, 1, 0] = shared
        codes[:, :, 1, 1] = shared
        payload = encode_layer1(
            codes, alloc, [(3, 3), (9, 21)], 448, 32000,
            channels=2, joint_bound=8,
        )
        d = decode_layer1(payload)
        assert d["bound"] == 8
        np.testing.assert_array_equal(d["codes"][:, :, 1, :], codes[:, :, 0, :])
        np.testing.assert_array_equal(d["codes"][:, :, 20, 0], shared)
        np.testing.assert_array_equal(d["codes"][:, :, 20, 1], shared)
        assert np.all(d["sf_idx"][:, 20, 0] == 9)
        assert np.all(d["sf_idx"][:, 20, 1] == 21)

    def test_joint_requires_identical_shared_codes(self):
        codes = np.zeros((1, 12, 1, 2), np.int64)
        codes[0, 0, 0, 0] = 1  # differs across channels at sb >= bound
        alloc = [0] * 32
        alloc[10] = 1
        with pytest.raises(ValueError, match="identical codes"):
            encode_layer1(
                codes, alloc, [0], 448, 32000, channels=2, joint_bound=4
            )
        with pytest.raises(ValueError, match="joint_bound"):
            encode_layer1(
                np.zeros((1, 12, 1), np.int64), alloc, [0], 448, 32000,
                channels=1, joint_bound=4,
            )
        with pytest.raises(ValueError, match="joint_bound"):
            encode_layer1(
                codes, alloc, [0], 448, 32000, channels=2, joint_bound=5
            )

    def test_encoder_validation(self):
        codes = np.zeros((1, 12, 1), np.int64)
        with pytest.raises(ValueError, match="bitrate"):
            encode_layer1(codes, [1] + [0] * 31, [0], 447, 32000)
        with pytest.raises(ValueError, match="sample rate"):
            encode_layer1(codes, [1] + [0] * 31, [0], 448, 8000)
        with pytest.raises(ValueError, match="allocation"):
            encode_layer1(codes, [15] + [0] * 31, [0], 448, 32000)
        with pytest.raises(ValueError, match="out of range"):
            encode_layer1(
                np.full((1, 12, 1), 4), [1] + [0] * 31, [0], 448, 32000
            )
        # frame too small for the payload: 32 kbps fits no nb=15 wall
        big = np.zeros((1, 12, 32), np.int64)
        with pytest.raises(ValueError, match="exceeds frame size"):
            encode_layer1(big, [14] * 32, [0] * 32, 32, 32000)

    def test_probe_agrees_with_decoder(self):
        # the mediaprobe header walk and the payload decoder must tell
        # one story about the same stream
        from polars_matmul_spark.operators.mediaprobe import probe_mp3

        alloc = [0] * 32
        alloc[0] = 1
        codes = np.zeros((3, 12, 1), np.int64)
        payload = encode_layer1(codes, alloc, [0], 448, 32000)
        info = probe_mp3(payload)
        assert info["layer"] == 1 and info["n_frames"] == 3
        assert info["sample_rate"] == 32000 and not info["vbr"]
        assert info["duration_s"] == pytest.approx(3 * 384 / 32000)
        assert decode_layer1(payload)["n_frames"] == 3


class TestProperties:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @staticmethod
    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 4),  # n_frames
        st.lists(  # (subband, alloc) for up to 4 active subbands
            st.tuples(st.integers(0, 31), st.integers(1, 8)),
            min_size=1, max_size=4, unique_by=lambda t: t[0],
        ),
        st.lists(st.integers(0, 62), min_size=4, max_size=4),
        st.randoms(use_true_random=False),
    )
    def test_round_trip_any_allocation(nf, subs, sfs, rnd):
        # every (allocation, scalefactor, code) combination the format
        # allows must survive encode -> decode bit-exactly
        alloc = [0] * 32
        for sb, a in subs:
            alloc[sb] = a
        active = [sb for sb in range(32) if alloc[sb]]
        codes = np.array(
            [
                [
                    [rnd.randrange(1 << (alloc[sb] + 1)) for sb in active]
                    for _ in range(12)
                ]
                for _ in range(nf)
            ],
            np.int64,
        )
        sf_idx = sfs[: len(active)] + [0] * max(0, len(active) - 4)
        payload = encode_layer1(codes, alloc, sf_idx, 448, 32000)
        d = decode_layer1(payload)
        assert d["n_frames"] == nf
        np.testing.assert_array_equal(d["codes"][:, :, active], codes)
        for i, sb in enumerate(active):
            assert np.all(d["sf_idx"][:, sb] == sf_idx[i])
            assert np.all(d["alloc"][:, sb] == alloc[sb])


def test_decode_table_quarantines_bad_payloads(spark):
    alloc = [0] * 32
    alloc[7] = 6
    codes = np.arange(24, dtype=np.int64).reshape(2, 12, 1) % 128
    good = encode_layer1(codes, alloc, [3], 448, 32000)
    rows = decode_layer1_table(
        spark.createDataFrame(
            [(1, good), (2, b"\xff\xff\x18\xc0 broken")],
            "asset_id long, payload binary",
        )
    ).collect()
    got = {r.asset_id: r for r in rows}
    assert got[1].error is None and got[1].n_frames == 2
    assert got[1].n_codes == 24
    flat = codes.ravel()
    assert got[1].code_digest == int(
        (flat * (np.arange(flat.size) + 1)).sum()
    )
    assert got[2].error is not None and got[2].n_frames is None


def test_empty_input_tables_yield_empty_not_error(spark):
    # the verify-probe doctrine: an empty query side must produce a
    # typed empty result, never an exception
    from polars_matmul_spark.operators.mediaprobe import probe_media_table
    from polars_matmul_spark.operators.multimodal import triage_assets
    from polars_matmul_spark.operators.rawbytes import (
        decode_text_payloads,
        expand_archives,
    )

    empty = spark.createDataFrame([], "asset_id long, payload binary")
    assert decode_layer1_table(empty).count() == 0
    assert probe_media_table(empty).count() == 0
    assert expand_archives(empty).count() == 0
    assert decode_text_payloads(empty).count() == 0
    out = triage_assets(empty)
    assert out.count() == 0
    assert "l1_code_digest" in out.columns  # schema stable when empty
