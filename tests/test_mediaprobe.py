"""MP3/MP4 container probing (operators/mediaprobe.py).

Every fixture is hand-assembled from the specs (ISO 11172-3 frame
headers, ISO-BMFF box layout) with struct.pack — no codec or muxer
code in this repo produced them, so the prober is graded against the
format definitions themselves."""

import struct

import numpy as np
import pytest

from polars_matmul_spark.operators.mediaprobe import (
    probe_media_table,
    probe_mp3,
    probe_mp4,
)

# ---------------------------------------------------------------------------
# MP3 fixtures: MPEG1 layer III 128 kbps 44.1 kHz stereo -> 417-byte
# frames; MPEG2 layer III 64 kbps 16 kHz mono -> 288-byte frames


def _mp3_frames(n, header=bytes([0xFF, 0xFB, 0x90, 0x00]), size=417):
    return b"".join(header + b"\x00" * (size - 4) for _ in range(n))


def _id3v2(pad=10):
    return b"ID3\x04\x00\x00" + bytes([0, 0, 0, pad]) + b"\x00" * pad


class TestMp3:
    def test_cbr_stream(self):
        info = probe_mp3(_mp3_frames(5))
        assert info["version"] == "1" and info["layer"] == 3
        assert info["bitrate_kbps"] == 128
        assert info["sample_rate"] == 44100 and info["channels"] == 2
        assert info["n_frames"] == 5 and not info["vbr"]
        assert info["duration_s"] == pytest.approx(5 * 1152 / 44100)

    def test_id3v2_and_id3v1_tags_skipped(self):
        payload = _id3v2() + _mp3_frames(3) + b"TAG" + b"\x00" * 125
        info = probe_mp3(payload)
        assert info["n_frames"] == 3

    def test_resync_skips_leading_garbage(self):
        # junk that even contains a lone false sync byte
        payload = b"junk\xff\x00garbage" + _mp3_frames(4)
        assert probe_mp3(payload)["n_frames"] == 4

    def test_mpeg2_mono(self):
        hdr = bytes([0xFF, 0xF3, 0x88, 0xC0])  # MPEG2 L3 64k 16kHz mono
        info = probe_mp3(_mp3_frames(6, header=hdr, size=288))
        assert info["version"] == "2" and info["channels"] == 1
        assert info["bitrate_kbps"] == 64 and info["sample_rate"] == 16000
        assert info["duration_s"] == pytest.approx(6 * 576 / 16000)

    def test_xing_vbr_header_wins(self):
        frame1 = bytearray(_mp3_frames(1))
        at = 36  # inside frame 1's body (past the side info)
        frame1[at : at + 4] = b"Xing"
        frame1[at + 4 : at + 8] = struct.pack(">I", 0x1)  # frames flag
        frame1[at + 8 : at + 12] = struct.pack(">I", 999)
        info = probe_mp3(bytes(frame1) + _mp3_frames(2))
        assert info["n_frames"] == 999 and info["vbr"]
        assert info["duration_s"] == pytest.approx(999 * 1152 / 44100)

    def test_lame_info_header_is_cbr(self):
        # LAME writes 'Info' (not 'Xing') into CBR streams: the frame
        # count must still be taken from it, but vbr must stay False
        frame1 = bytearray(_mp3_frames(1))
        at = 36
        frame1[at : at + 4] = b"Info"
        frame1[at + 4 : at + 8] = struct.pack(">I", 0x1)
        frame1[at + 8 : at + 12] = struct.pack(">I", 500)
        info = probe_mp3(bytes(frame1) + _mp3_frames(2))
        assert info["n_frames"] == 500 and not info["vbr"]

    def test_xing_ignored_on_layer1(self):
        # the Xing/LAME convention is Layer III-only: a Layer I frame
        # whose PAYLOAD bits happen to spell 'Xing' (sample bits are
        # arbitrary data in the triage battery) must NOT replace the
        # walked frame count with the bytes that follow (round 9)
        from polars_matmul_spark.operators.mpegaudio import encode_layer1

        import numpy as np

        alloc = [6] * 12 + [0] * 20
        codes = np.zeros((2, 12, 12), dtype=np.int64)
        stream = bytearray(encode_layer1(codes, alloc, [3] * 12, 448, 32000))
        at = 40  # inside frame 1's sample-bit region
        stream[at : at + 4] = b"Xing"
        stream[at + 4 : at + 8] = struct.pack(">I", 0x1)
        stream[at + 8 : at + 12] = struct.pack(">I", 999)
        info = probe_mp3(bytes(stream))
        assert info["layer"] == 1
        assert info["n_frames"] == 2  # walked, not the fake Xing count
        assert not info["vbr"]

    def test_vbr_detected_from_bitrate_changes(self):
        h128 = bytes([0xFF, 0xFB, 0x90, 0x00])
        h160 = bytes([0xFF, 0xFB, 0xA0, 0x00])  # idx 10 -> 160 kbps
        payload = _mp3_frames(2, h128, 417) + _mp3_frames(
            2, h160, 144 * 160000 // 44100
        )
        info = probe_mp3(payload)
        assert info["vbr"] and info["n_frames"] == 4

    def test_no_sync_raises(self):
        with pytest.raises(ValueError, match="frame sync"):
            probe_mp3(b"\x00" * 1000)
        with pytest.raises(ValueError, match="frame sync"):
            probe_mp3(b"")


# ---------------------------------------------------------------------------
# MP4 fixtures: hand-assembled box tree


def _box(btype, body):
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mvhd(timescale, duration):
    body = b"\x00" * 4 + struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
    body += b"\x00" * 10 + b"\x00" * 36 + b"\x00" * 24
    body += struct.pack(">I", 3)
    return _box(b"mvhd", body)


def _trak(kind, codec, timescale, duration, w=0, h=0, ch=0, rate=0, n=0):
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07" + struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", duration) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0) + b"\x00" * 36
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _box(
        b"mdhd",
        b"\x00" * 4 + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),
    )
    handler = {"video": b"vide", "audio": b"soun"}[kind]
    hdlr = _box(
        b"hdlr", b"\x00" * 4 + b"\x00" * 4 + handler + b"\x00" * 12 + b"x\x00"
    )
    if kind == "video":
        entry = _box(
            codec,
            b"\x00" * 6 + struct.pack(">H", 1)  # data ref idx
            + b"\x00" * 16 + struct.pack(">HH", w, h) + b"\x00" * 46
            + b"\x00" * 4,
        )
    else:
        entry = _box(
            codec,
            b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
            + struct.pack(">HHHH", ch, 16, 0, 0)
            + struct.pack(">I", rate << 16),
        )
    stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
    stsz = _box(
        b"stsz", b"\x00" * 4 + struct.pack(">II", 0, n)
    )
    stbl = _box(b"stbl", stsd + stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", tkhd + mdia)


def _mp4_fixture():
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"iso2mp41")
    video = _trak("video", b"avc1", 30000, 150000, w=640, h=360, n=300)
    audio = _trak("audio", b"mp4a", 44100, 220500, ch=2, rate=44100, n=215)
    moov = _box(b"moov", _mvhd(1000, 5000) + video + audio)
    mdat = _box(b"mdat", b"\x00" * 64)
    return ftyp + moov + mdat


class TestMp4:
    def test_full_fixture(self):
        info = probe_mp4(_mp4_fixture())
        assert info["brand"] == "isom"
        assert info["duration_s"] == pytest.approx(5.0)
        assert len(info["tracks"]) == 2
        video, audio = info["tracks"]
        assert video["kind"] == "video" and video["codec"] == "avc1"
        assert (video["width"], video["height"]) == (640, 360)
        assert video["duration_s"] == pytest.approx(5.0)
        assert video["n_samples"] == 300
        assert audio["kind"] == "audio" and audio["codec"] == "mp4a"
        assert audio["channels"] == 2 and audio["sample_rate"] == 44100
        assert audio["n_samples"] == 215

    def test_largesize_box(self):
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512))
        body = _mvhd(1000, 2000)
        large = (
            struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(body))
            + body
        )
        info = probe_mp4(ftyp + large)
        assert info["duration_s"] == pytest.approx(2.0)

    def test_ftyp_only_fragment(self):
        info = probe_mp4(_box(b"ftyp", b"dash" + struct.pack(">I", 0)))
        assert info["brand"] == "dash" and info["duration_s"] is None
        assert info["tracks"] == []

    def test_not_bmff_raises(self):
        with pytest.raises(ValueError, match="ftyp"):
            probe_mp4(b"RIFF....WAVE")
        with pytest.raises(ValueError, match="ftyp"):
            probe_mp4(b"")

    def test_bad_box_size_raises(self):
        payload = bytearray(_mp4_fixture())
        # corrupt the moov size field to overflow the payload
        at = payload.find(b"moov") - 4
        payload[at : at + 4] = struct.pack(">I", 2**31)
        with pytest.raises(ValueError, match="box size"):
            probe_mp4(bytes(payload))


# ---------------------------------------------------------------------------
# the Spark surface


def test_probe_media_table(spark):
    from polars_matmul_spark.operators.flac import encode_flac

    rows = [
        (1, _mp3_frames(5)),
        (2, _mp4_fixture()),
        (3, encode_flac(np.arange(-500, 500), 8000)),
        (4, b"no container here"),
        (5, _id3v2() + _mp3_frames(2)),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r.asset_id: r for r in probe_media_table(df).collect()}
    mp3 = got[1]
    assert mp3.container == "mp3" and mp3.codec == "mpeg1-layer3"
    assert mp3.bitrate_kbps == 128 and mp3.sample_rate == 44100
    assert mp3.n_frames == 5
    assert mp3.duration_s == pytest.approx(5 * 1152 / 44100)
    mp4 = got[2]
    assert mp4.container == "mp4" and mp4.codec == "avc1"
    assert (mp4.width, mp4.height) == (640, 360)
    assert (mp4.sample_rate, mp4.channels) == (44100, 2)
    assert mp4.n_tracks == 2 and mp4.n_frames == 300
    assert mp4.duration_s == pytest.approx(5.0)
    assert got[3].container == "flac"
    assert got[4].container == "opaque"
    assert got[5].container == "mp3" and got[5].n_frames == 2


class TestParseFailureContract:
    def test_short_box_bodies_raise_valueerror_not_struct_error(self):
        # fuzz-found (round 8): a correctly-SIZED box with a short BODY
        # walked into unpack_from/indexing and escaped as struct.error/
        # IndexError — in probe_media_table that kills the Spark task
        # instead of quarantining the asset
        def box(t, body):
            return struct.pack(">I", 8 + len(body)) + t + body

        ftyp = box(b"ftyp", b"isom" + b"\x00" * 4)
        cases = [
            ftyp + box(b"moov", box(b"mvhd", b"")),
            ftyp + box(b"moov", box(b"mvhd", b"\x00" * 8)),
            ftyp + box(b"moov", box(b"trak", box(b"mdia", box(b"mdhd", b"")))),
            ftyp + box(b"moov", box(b"trak", box(b"mdia",
                box(b"mdhd", b"\x01" + b"\x00" * 10)))),
            ftyp + box(b"moov", box(b"trak", box(b"mdia", box(b"minf",
                box(b"stbl", box(b"stsd", b"\x00" * 5)))))),
            ftyp + box(b"moov", box(b"trak", box(b"mdia", box(b"minf",
                box(b"stbl", box(b"stsz", b"\x00" * 5)))))),
        ]
        for p in cases:
            with pytest.raises(ValueError):
                probe_mp4(p)

    def test_probe_table_quarantines_short_bodies(self, spark):
        def box(t, body):
            return struct.pack(">I", 8 + len(body)) + t + body

        bad = (box(b"ftyp", b"isom" + b"\x00" * 4)
               + box(b"moov", box(b"mvhd", b"\x00" * 8)))
        rows = probe_media_table(
            spark.createDataFrame(
                [(1, bad)], "asset_id long, payload binary"
            )
        ).collect()
        assert rows[0].container == "opaque"  # quarantined, not crashed
