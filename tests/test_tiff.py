"""TIFF codec (pure stdlib + NumPy, operators/tiff.py).

Oracle strategy for a lossless codec: round trips assert BIT-exact
pixels across compressions, depths and strip layouts; decode-only
features the encoder never writes (MM byte order, WhiteIsZero,
palette, 1-bit bilevel) are pinned by streams hand-assembled with
struct straight from the TIFF 6.0 layout."""

import struct

import numpy as np
import pytest

from polars_matmul_spark.operators.tiff import (
    _lzw_decode_tiff,
    _lzw_encode_tiff,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)

RNG = np.random.default_rng(0x71FF)


# ---------------------------------------------------------------------------
# codec primitives


class TestPrimitives:
    def test_tiff_lzw_round_trip_with_width_growth(self):
        data = bytes(RNG.integers(0, 256, 20_000, dtype=np.uint8))
        assert _lzw_decode_tiff(_lzw_encode_tiff(data), len(data)) == data

    def test_tiff_lzw_dictionary_reset(self):
        data = bytes(RNG.integers(0, 256, 80_000, dtype=np.uint8))
        assert _lzw_decode_tiff(_lzw_encode_tiff(data), len(data)) == data

    def test_tiff_lzw_differs_from_gif_lzw(self):
        # the early-change variant must NOT be interchangeable with
        # the GIF packer (different bit order + width schedule)
        from polars_matmul_spark.operators.gif import _lzw_encode

        data = bytes(RNG.integers(0, 256, 1000, dtype=np.uint8))
        assert _lzw_encode_tiff(data) != _lzw_encode(data, 8)

    def test_packbits_spec_cases(self):
        # literal + run mix, and the 128 no-op on decode
        assert _packbits_decode(b"\x00A", 1) == b"A"
        assert _packbits_decode(b"\xfeB", 3) == b"BBB"  # 257-254=3
        assert _packbits_decode(b"\x80\x00C", 1) == b"C"  # no-op skipped
        data = b"aaaa" + bytes(range(40)) + b"zz" * 70
        assert _packbits_decode(_packbits_encode(data), len(data)) == data

    def test_truncated_streams_raise(self):
        with pytest.raises(ValueError):
            _packbits_decode(b"\x05ab", 6)
        enc = _lzw_encode_tiff(b"hello world")
        with pytest.raises(ValueError):
            _lzw_decode_tiff(enc[:2], 11)


# ---------------------------------------------------------------------------
# round trips


class TestRoundTrip:
    @pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
    @pytest.mark.parametrize(
        "shape", [(1, 1), (37, 53), (20, 31, 3), (9, 9, 4)]
    )
    def test_uint8_exact(self, comp, shape):
        img = RNG.integers(0, 256, shape, dtype=np.uint8)
        out = decode_tiff(encode_tiff(img, compression=comp))
        assert out.shape == img.shape and out.dtype == np.uint8
        np.testing.assert_array_equal(out, img)

    @pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
    def test_uint16_gray(self, comp):
        img = RNG.integers(0, 65536, (15, 17), dtype=np.uint16)
        out = decode_tiff(encode_tiff(img, compression=comp))
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out, img)

    def test_lzw_predictor(self):
        # smooth content: horizontal differencing is the wins-case
        base = np.repeat(np.arange(64, dtype=np.uint8)[None, :] * 4, 30, 0)
        plain = encode_tiff(base, compression="lzw")
        pred = encode_tiff(base, compression="lzw", predictor=True)
        np.testing.assert_array_equal(decode_tiff(pred), base)
        assert len(pred) < len(plain)  # the predictor must actually help
        rgb = RNG.integers(0, 256, (12, 19, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_tiff(
                encode_tiff(rgb, compression="lzw", predictor=True,
                            rows_per_strip=3)
            ),
            rgb,
        )

    def test_strip_layouts(self):
        img = RNG.integers(0, 256, (33, 7), dtype=np.uint8)
        for rps in (1, 2, 32, 33, 1000):
            np.testing.assert_array_equal(
                decode_tiff(encode_tiff(img, rows_per_strip=rps)), img
            )

    def test_encoder_validation(self):
        with pytest.raises(ValueError, match="uint8 or uint16"):
            encode_tiff(np.zeros((4, 4), np.float32))
        with pytest.raises(ValueError, match="compression"):
            encode_tiff(np.zeros((4, 4), np.uint8), compression="jpeg")
        with pytest.raises(ValueError, match="lzw only"):
            encode_tiff(np.zeros((4, 4), np.uint8), predictor=True)
        with pytest.raises(ValueError, match="rows_per_strip"):
            encode_tiff(np.zeros((4, 4), np.uint8), rows_per_strip=0)
        with pytest.raises(ValueError, match="grayscale"):
            encode_tiff(np.zeros((4, 4, 3), np.uint16))


# ---------------------------------------------------------------------------
# hand-assembled decode-only fixtures


def _hand_tiff(bo, tags, image_bytes, data_blobs=()):
    """Assemble a single-IFD TIFF by hand. ``tags`` is a list of
    (tag, type, values); values that overflow 4 bytes reference
    ``data_blobs`` entries by ('blob', i) placeholders already laid
    out after the IFD."""
    fmt = {3: "H", 4: "I"}
    size = {3: 2, 4: 4}
    n = len(tags)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    blob_offsets = []
    pos = data_off
    for blob in data_blobs:
        blob_offsets.append(pos)
        pos += len(blob)
    img_off = pos
    body = struct.pack(bo + "H", n)
    for tag, vtype, values in tags:
        if values == "IMG":
            values = [img_off]
        if values and isinstance(values[0], tuple):
            # ('blob', i, count): the value slot holds the blob OFFSET,
            # the count is the number of typed values stored there
            _, bi, count = values[0]
            body += struct.pack(bo + "HHI", tag, vtype, count)
            body += struct.pack(bo + "I", blob_offsets[bi])
            continue
        total = size[vtype] * len(values)
        packed = struct.pack(bo + fmt[vtype] * len(values), *values)
        val = packed + b"\x00" * (4 - total)
        assert total <= 4, "hand fixture keeps non-blob values inline"
        body += struct.pack(bo + "HHI", tag, vtype, len(values)) + val
    body += struct.pack(bo + "I", 0)
    order = b"II*\x00" if bo == "<" else b"MM\x00*"
    out = order + struct.pack(bo + "I", ifd_off) + body
    for blob in data_blobs:
        out += blob
    return out + image_bytes


class TestHandBuilt:
    def test_big_endian_gray(self):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        payload = _hand_tiff(
            ">",
            [
                (256, 4, [4]), (257, 4, [3]), (258, 3, [8]), (259, 3, [1]),
                (262, 3, [1]), (273, 4, "IMG"), (277, 3, [1]),
                (278, 4, [3]), (279, 4, [12]),
            ],
            img.tobytes(),
        )
        np.testing.assert_array_equal(decode_tiff(payload), img)

    def test_big_endian_16bit_respects_byte_order(self):
        img = np.array([[0x0102, 0xFFEE]], dtype=np.uint16)
        payload = _hand_tiff(
            ">",
            [
                (256, 4, [2]), (257, 4, [1]), (258, 3, [16]), (259, 3, [1]),
                (262, 3, [1]), (273, 4, "IMG"), (277, 3, [1]),
                (278, 4, [1]), (279, 4, [4]),
            ],
            img.astype(">u2").tobytes(),
        )
        np.testing.assert_array_equal(decode_tiff(payload), img)

    def test_white_is_zero_inverts(self):
        img = np.array([[0, 100], [200, 255]], dtype=np.uint8)
        payload = _hand_tiff(
            "<",
            [
                (256, 4, [2]), (257, 4, [2]), (258, 3, [8]), (259, 3, [1]),
                (262, 3, [0]), (273, 4, "IMG"), (277, 3, [1]),
                (278, 4, [2]), (279, 4, [4]),
            ],
            img.tobytes(),
        )
        np.testing.assert_array_equal(decode_tiff(payload), 255 - img)

    def test_bilevel_one_bit(self):
        # 10 pixels/row -> 2 bytes/row with pad bits, MSB-first
        bits = np.zeros((3, 10), np.uint8)
        bits[0, 0] = bits[1, 5] = bits[2, 9] = 1
        rows = np.packbits(bits, axis=1).tobytes()
        payload = _hand_tiff(
            "<",
            [
                (256, 4, [10]), (257, 4, [3]), (258, 3, [1]), (259, 3, [1]),
                (262, 3, [1]), (273, 4, "IMG"), (277, 3, [1]),
                (278, 4, [3]), (279, 4, [len(rows)]),
            ],
            rows,
        )
        np.testing.assert_array_equal(decode_tiff(payload), bits * 255)

    def test_palette(self):
        # 4-entry ColorMap (3 planes of 16-bit values, 257 * 8-bit)
        pal8 = np.array(
            [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)], np.uint8
        )
        cmap = (pal8.T.astype(np.int64) * 257).ravel()
        blob = struct.pack("<" + "H" * 12, *cmap)
        idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
        payload = _hand_tiff(
            "<",
            [
                (256, 4, [2]), (257, 4, [2]), (258, 3, [8]), (259, 3, [1]),
                (262, 3, [3]), (273, 4, "IMG"), (277, 3, [1]),
                (278, 4, [2]), (279, 4, [4]), (320, 3, [("blob", 0, 12)]),
            ],
            idx.tobytes(),
            data_blobs=[blob],
        )
        np.testing.assert_array_equal(decode_tiff(payload), pal8[idx])

    def test_one_bit_palette(self):
        # legal 1-bit palette TIFF: indices are the RAW 0/1 bits (no
        # 0/255 scaling before the ColorMap lookup)
        pal8 = np.array([(10, 20, 30), (200, 100, 50)], np.uint8)
        cmap = (pal8.T.astype(np.int64) * 257).ravel()
        blob = struct.pack("<" + "H" * 6, *cmap)
        bits = np.array([[1, 0, 1, 0, 0, 1, 1, 0, 0, 1]], np.uint8)
        rows = np.packbits(bits, axis=1).tobytes()
        payload = _hand_tiff(
            "<",
            [
                (256, 4, [10]), (257, 4, [1]), (258, 3, [1]), (259, 3, [1]),
                (262, 3, [3]), (273, 4, "IMG"), (277, 3, [1]),
                (278, 4, [1]), (279, 4, [len(rows)]),
                (320, 3, [("blob", 0, 6)]),
            ],
            rows,
            data_blobs=[blob],
        )
        np.testing.assert_array_equal(decode_tiff(payload), pal8[bits])

    def test_palette_index_out_of_range_raises(self):
        cmap = struct.pack("<" + "H" * 6, *([0] * 6))  # 2 entries
        idx = np.array([[5]], dtype=np.uint8)
        payload = _hand_tiff(
            "<",
            [
                (256, 4, [1]), (257, 4, [1]), (258, 3, [8]), (259, 3, [1]),
                (262, 3, [3]), (273, 4, "IMG"), (277, 3, [1]),
                (278, 4, [1]), (279, 4, [1]), (320, 3, [("blob", 0, 6)]),
            ],
            idx.tobytes(),
            data_blobs=[cmap],
        )
        with pytest.raises(ValueError, match="palette index"):
            decode_tiff(payload)


class TestErrors:
    def test_not_tiff(self):
        for bad in [b"", b"II", b"PNG stuff", b"II+\x00\x08\x00\x00\x00"]:
            with pytest.raises(ValueError):
                decode_tiff(bad)

    def test_exotic_features_raise(self):
        img = np.zeros((4, 4), np.uint8)
        good = bytearray(encode_tiff(img))
        # rewrite the compression tag (259) value to JPEG (7)
        at = good.find(struct.pack("<HHI", 259, 3, 1))
        good[at + 8 : at + 10] = struct.pack("<H", 7)
        with pytest.raises(ValueError, match="compression 7"):
            decode_tiff(bytes(good))

    def test_truncated_strip_raises(self):
        payload = encode_tiff(np.zeros((8, 8), np.uint8))
        with pytest.raises(ValueError):
            decode_tiff(payload[:-10])


# ---------------------------------------------------------------------------
# multimodal integration


class TestIntegration:
    def test_decode_asset_and_image_rgb(self):
        from polars_matmul_spark.operators.multimodal import (
            _decode_image_rgb,
            decode_asset,
        )

        rgb = np.zeros((5, 6, 3), np.uint8)
        rgb[..., 0], rgb[..., 1], rgb[..., 2] = 10, 20, 30
        payload = encode_tiff(rgb, compression="lzw")
        np.testing.assert_array_equal(decode_asset(payload, "image"), rgb)
        np.testing.assert_array_equal(_decode_image_rgb(payload), rgb)
        gray16 = np.full((3, 3), 0xAB12, np.uint16)
        got = _decode_image_rgb(encode_tiff(gray16))
        assert got.shape == (3, 3, 3) and (got == 0xAB).all()

    def test_decoded_asset_stats_tiff_row(self, spark):
        from polars_matmul_spark.operators.multimodal import (
            decoded_asset_stats,
        )

        rgb = np.zeros((4, 8, 3), np.uint8)
        rgb[..., 0], rgb[..., 1], rgb[..., 2] = 11, 22, 33
        df = spark.createDataFrame(
            [(1, encode_tiff(rgb, compression="packbits"))],
            "asset_id long, payload binary",
        )
        row = decoded_asset_stats(df).collect()[0]
        assert row.container == "tiff"
        assert (row.width, row.height) == (8, 4)
        assert (row.mean_r, row.mean_g, row.mean_b) == (11.0, 22.0, 33.0)

    def test_probe_media_table_tags_tiff(self, spark):
        from polars_matmul_spark.operators.mediaprobe import (
            probe_media_table,
        )

        df = spark.createDataFrame(
            [(1, encode_tiff(np.zeros((2, 2), np.uint8)))],
            "asset_id long, payload binary",
        )
        assert probe_media_table(df).collect()[0].container == "tiff"

    def test_zero_rows_per_strip_raises(self):
        payload = bytearray(encode_tiff(np.zeros((4, 4), np.uint8)))
        at = payload.find(struct.pack("<HHI", 278, 4, 1))
        payload[at + 8 : at + 12] = struct.pack("<I", 0)
        with pytest.raises(ValueError, match="RowsPerStrip"):
            decode_tiff(bytes(payload))
