"""Archive expansion + text transcoding (operators/rawbytes.py).

Every archive fixture is produced by the stdlib writers (zipfile /
tarfile / gzip / bz2 / lzma) — independent of the code under test,
which only READS. Encoding fixtures come from Python's own codecs."""

import bz2
import gzip
import io
import lzma
import tarfile
import zipfile

import pytest

from polars_matmul_spark.operators.rawbytes import (
    decode_text_payloads,
    detect_encoding,
    expand_archives,
    sniff_archive,
)


def _zip(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _tar(members: dict[str, bytes], mode="w") -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, data in members.items():
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


MEMBERS = {"a.txt": b"alpha", "dir/b.bin": bytes(range(256)), "c": b""}


class TestSniff:
    def test_magics(self):
        assert sniff_archive(_zip(MEMBERS)) == "zip"
        assert sniff_archive(_tar(MEMBERS)) == "tar"
        assert sniff_archive(gzip.compress(b"x")) == "gzip"
        assert sniff_archive(bz2.compress(b"x")) == "bz2"
        assert sniff_archive(lzma.compress(b"x")) == "xz"
        assert sniff_archive(b"just some text") is None
        assert sniff_archive(b"") is None

    def test_v7_tar_checksum_heuristic(self):
        # strip the ustar magic: detection must fall back to checksum
        t = bytearray(_tar(MEMBERS))
        t[257:262] = b"\x00" * 5
        # recompute the header checksum for the mutated block
        block = bytes(t[:148]) + b" " * 8 + bytes(t[156:512])
        t[148:156] = f"{sum(block):06o}\x00 ".encode()
        assert sniff_archive(bytes(t)) == "tar"

    def test_random_bytes_not_tar(self):
        assert sniff_archive(b"\x01" * 600) is None


class TestExpand:
    @pytest.mark.parametrize(
        "payload,label",
        [
            (_zip(MEMBERS), "zip"),
            (_tar(MEMBERS), "tar"),
            (_tar(MEMBERS, "w:gz"), "tar.gzip"),
            (_tar(MEMBERS, "w:bz2"), "tar.bz2"),
            (_tar(MEMBERS, "w:xz"), "tar.xz"),
        ],
    )
    def test_archive_kinds(self, spark, payload, label):
        df = spark.createDataFrame(
            [(1, payload)], "asset_id long, payload binary"
        )
        rows = expand_archives(df).collect()
        got = {r.member_path: bytes(r.member_bytes) for r in rows}
        assert got == MEMBERS
        assert {r.archive for r in rows} == {label}
        assert all(r.error is None for r in rows)
        assert {r.member_size for r in rows} == {0, 5, 256}

    def test_bare_gzip_bz2_xz_single_stream(self, spark):
        body = b"single stream body" * 10
        rows = expand_archives(
            spark.createDataFrame(
                [
                    (1, gzip.compress(body)),
                    (2, bz2.compress(body)),
                    (3, lzma.compress(body)),
                    (4, b"not an archive"),
                ],
                "asset_id long, payload binary",
            )
        ).collect()
        got = {r.asset_id: r for r in rows}
        assert set(got) == {1, 2, 3}  # non-archives emit nothing
        for aid, kind in [(1, "gzip"), (2, "bz2"), (3, "xz")]:
            assert got[aid].archive == kind
            assert got[aid].member_path == "-"
            assert bytes(got[aid].member_bytes) == body

    def test_member_cap_is_visible(self, spark):
        payload = _zip({f"f{i}": b"x" for i in range(10)})
        rows = expand_archives(
            spark.createDataFrame(
                [(1, payload)], "asset_id long, payload binary"
            ),
            max_members=4,
        ).collect()
        errors = [r for r in rows if r.error == "member cap"]
        assert len(errors) == 1 and len(rows) == 5  # 4 members + 1 marker

    def test_zip_bomb_guard(self, spark):
        # 1 MB of zeros deflates tiny; with a 1 KB cap the member must
        # surface as metadata-only, not as inflated bytes
        payload = _zip({"bomb": b"\x00" * (1 << 20), "ok": b"fine"})
        rows = expand_archives(
            spark.createDataFrame(
                [(1, payload)], "asset_id long, payload binary"
            ),
            max_member_bytes=1024,
        ).collect()
        by_path = {r.member_path: r for r in rows}
        assert by_path["bomb"].error == "too large"
        assert by_path["bomb"].member_bytes is None
        assert bytes(by_path["ok"].member_bytes) == b"fine"

    def test_lying_zip_header_still_capped(self, spark):
        # rewrite the central directory's size field to claim 10 bytes
        payload = bytearray(_zip({"liar": b"\x00" * (1 << 20)}))
        # the capped READ (not the header) must catch it
        rows = expand_archives(
            spark.createDataFrame(
                [(1, bytes(payload))], "asset_id long, payload binary"
            ),
            max_member_bytes=1024,
        ).collect()
        assert rows[0].error == "too large"

    def test_big_compressed_tar_still_expands_members(self, spark):
        # a .tar.gz whose TOTAL decompressed size exceeds
        # max_member_bytes but whose members are individually small
        # (the arXiv-bundle shape) must expand member-by-member, not
        # collapse into one 'too large' row
        members = {f"d/f{i}.txt": bytes([65 + i]) * 700 for i in range(20)}
        payload = _tar(members, "w:gz")
        rows = expand_archives(
            spark.createDataFrame(
                [(1, payload)], "asset_id long, payload binary"
            ),
            max_member_bytes=4096,  # << 20*700 total
        ).collect()
        got = {r.member_path: bytes(r.member_bytes) for r in rows}
        assert got == members
        assert all(r.error is None for r in rows)

    def test_zip_directory_entries_dont_eat_member_cap(self, spark):
        # directory entries must not count toward max_members: a zip
        # with 6 dirs then 4 files under max_members=4 yields all 4
        # files and NO cap row
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for i in range(6):
                zf.writestr(f"dir{i}/", b"")
            for i in range(4):
                zf.writestr(f"dir0/f{i}", b"x")
        rows = expand_archives(
            spark.createDataFrame(
                [(1, buf.getvalue())], "asset_id long, payload binary"
            ),
            max_members=4,
        ).collect()
        assert len(rows) == 4
        assert all(r.error is None for r in rows)

    def test_corrupt_archive_is_a_row(self, spark):
        corrupt = _zip(MEMBERS)[:40]  # zip magic, truncated directory
        rows = expand_archives(
            spark.createDataFrame(
                [(1, corrupt)], "asset_id long, payload binary"
            )
        ).collect()
        assert len(rows) == 1 and rows[0].error.startswith("corrupt:")

    def test_bad_params(self, spark):
        df = spark.createDataFrame([(1, b"")], "asset_id long, payload binary")
        with pytest.raises(ValueError, match="max_members"):
            expand_archives(df, max_members=0)


class TestEncoding:
    @pytest.mark.parametrize(
        "enc",
        ["utf-8-sig", "utf-16-le", "utf-16-be", "utf-32-le", "utf-32-be"],
    )
    def test_bom_detection(self, enc):
        bom = {"utf-8-sig": b"\xef\xbb\xbf", "utf-16-le": b"\xff\xfe",
               "utf-16-be": b"\xfe\xff", "utf-32-le": b"\xff\xfe\x00\x00",
               "utf-32-be": b"\x00\x00\xfe\xff"}[enc]
        body = "héllo wörld".encode(enc.replace("-sig", ""))
        if enc == "utf-8-sig":
            payload = bom + "héllo wörld".encode("utf-8")
        else:
            payload = bom + body if not body.startswith(bom) else body
        assert detect_encoding(payload) == enc

    def test_utf8_and_latin1(self):
        assert detect_encoding("日本語テキスト".encode("utf-8")) == "utf-8"
        assert detect_encoding(b"plain ascii") == "utf-8"
        assert detect_encoding("café".encode("latin-1")) == "latin-1"

    def test_bomless_utf16(self):
        text = "ascii heavy content, no bom here" * 4
        assert detect_encoding(text.encode("utf-16-le")) == "utf-16-le"
        assert detect_encoding(text.encode("utf-16-be")) == "utf-16-be"

    def test_decode_text_payloads(self, spark):
        rows = decode_text_payloads(
            spark.createDataFrame(
                [
                    (1, "héllo".encode("utf-8")),
                    (2, "wörld".encode("utf-16")),  # BOM included
                    (3, "café".encode("latin-1")),
                    (4, b""),
                ],
                "asset_id long, payload binary",
            )
        ).collect()
        got = {r.asset_id: r for r in rows}
        assert got[1].encoding == "utf-8" and got[1].text == "héllo"
        assert got[2].text == "wörld"
        assert got[3].encoding == "latin-1" and got[3].text == "café"
        assert got[4].text == "" and got[4].replacement_ratio == 0.0
        assert all(r.replacement_ratio == 0.0 for r in rows)

    def test_bomless_utf16_keeps_first_character(self, spark):
        # detect_encoding returns utf-16-le for BOM-LESS streams too;
        # the decoder must only strip a BOM that is actually present —
        # a blind 2-byte strip would turn 'hello...' into 'ello...'
        text = "hello ascii heavy content no bom" * 3
        rows = decode_text_payloads(
            spark.createDataFrame(
                [
                    (1, text.encode("utf-16-le")),
                    (2, text.encode("utf-16-be")),
                ],
                "asset_id long, payload binary",
            )
        ).collect()
        got = {r.asset_id: r for r in rows}
        assert got[1].encoding == "utf-16-le" and got[1].text == text
        assert got[2].encoding == "utf-16-be" and got[2].text == text
        assert all(r.replacement_ratio == 0.0 for r in rows)

    def test_replacement_ratio_measures_mojibake(self, spark):
        # truncated UTF-8 multibyte sequences -> U+FFFD under 'replace';
        # craft bytes that are NOT valid utf-8 and NOT utf-16-shaped
        payload = ("ok " .encode("utf-8") + b"\xff\xfe\xfd") * 3 + b"x"
        # \xff.. makes it fall to latin-1 (total): ratio stays 0 but
        # encoding says latin-1 — the label IS the signal
        rows = decode_text_payloads(
            spark.createDataFrame(
                [(1, payload)], "asset_id long, payload binary"
            )
        ).collect()
        assert rows[0].encoding == "latin-1"
        # and a BOM-tagged utf-16 stream with a torn tail DOES count
        torn = "abcdef".encode("utf-16") + b"\x41"  # odd trailing byte
        rows = decode_text_payloads(
            spark.createDataFrame(
                [(1, torn)], "asset_id long, payload binary"
            )
        ).collect()
        assert rows[0].replacement_ratio > 0.0


def test_round_trip_through_pipeline(spark):
    """The composed ingest shape: tar.gz of text files in three
    encodings -> expand -> transcode -> every document intact."""
    from pyspark.sql import functions as F

    wanted = {
        "a/utf8.txt": "první dokument — ěščř",
        "b/utf16.txt": "second document",
        "c/latin1.txt": "tercer documento: señal",
    }
    docs = {
        "a/utf8.txt": wanted["a/utf8.txt"].encode("utf-8"),
        "b/utf16.txt": wanted["b/utf16.txt"].encode("utf-16"),
        "c/latin1.txt": wanted["c/latin1.txt"].encode("latin-1"),
    }
    df = spark.createDataFrame(
        [(7, _tar(docs, "w:gz"))], "asset_id long, payload binary"
    )
    members = expand_archives(df).withColumn(
        "mid", F.monotonically_increasing_id()
    )
    decoded = decode_text_payloads(
        members.select(
            F.col("mid").alias("asset_id"),
            F.col("member_bytes").alias("payload"),
        ),
    )
    joined = decoded.join(
        members.select(F.col("mid").alias("asset_id"), "member_path"),
        "asset_id",
    )
    texts = {r.member_path: r.text for r in joined.collect()}
    assert texts == wanted
