"""WARC parsing (operators/warc.py). Record fixtures are assembled
byte-by-byte from the ISO 28500 layout (version line, CRLF named
fields, Content-Length body, CRLF CRLF separator); gzip members come
from stdlib ``gzip`` — no writer code in the module under test."""

import gzip

import pytest

from polars_matmul_spark.operators.warc import (
    parse_http_response,
    parse_warc_records,
    split_gzip_members,
    warc_table,
)


def _record(wtype, body, uri=None, rid="<urn:uuid:1>", extra=()):
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + wtype.encode(),
        b"WARC-Record-ID: " + rid.encode(),
    ]
    if uri:
        head.append(b"WARC-Target-URI: " + uri.encode())
    head.extend(extra)
    head.append(b"Content-Length: " + str(len(body)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _http(body, status=200, ctype="text/html"):
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


WINFO = _record("warcinfo", b"software: test\r\n")
RESP = _record(
    "response",
    _http(b"<html>hello</html>"),
    uri="http://example.com/",
    extra=(b"Content-Type: application/http;msgtype=response",),
)
REQ = _record("request", b"GET / HTTP/1.1\r\n", uri="http://example.com/")


class TestGzipMembers:
    def test_multi_member_round_trip(self):
        data = gzip.compress(b"alpha") + gzip.compress(b"") + gzip.compress(
            b"beta" * 100
        )
        assert split_gzip_members(data) == [b"alpha", b"", b"beta" * 100]

    def test_truncated_member_raises(self):
        data = gzip.compress(b"alpha" * 50)[:-8]
        with pytest.raises(ValueError, match="truncated|corrupt"):
            split_gzip_members(data)

    def test_bomb_guard(self):
        data = gzip.compress(b"\x00" * (1 << 20))
        with pytest.raises(ValueError, match="exceeds"):
            split_gzip_members(data, max_member_bytes=1024)

    def test_garbage_between_members_raises(self):
        data = gzip.compress(b"a") + b"JUNK" + gzip.compress(b"b")
        with pytest.raises(ValueError):
            split_gzip_members(data)


class TestRecords:
    def test_two_records(self):
        recs = parse_warc_records(WINFO + RESP)
        assert [r["headers"]["warc-type"] for r in recs] == [
            "warcinfo", "response",
        ]
        assert recs[0]["offset"] == 0 and recs[1]["offset"] == len(WINFO)
        assert recs[1]["headers"]["warc-target-uri"] == "http://example.com/"
        assert recs[1]["body"].startswith(b"HTTP/1.1 200")

    def test_continuation_lines_fold(self):
        rec = _record(
            "metadata", b"x",
            extra=(b"X-Long: first part", b"\t second part"),
        )
        (r,) = parse_warc_records(rec)
        assert r["headers"]["x-long"] == "first part second part"

    @pytest.mark.parametrize(
        "mutant,msg",
        [
            (b"HARC" + WINFO[4:], "version line"),
            (WINFO.replace(b"Content-Length: 16", b"Content-Length: -1"),
             "Content-Length|negative"),
            (WINFO.replace(b"Content-Length: 16", b"Content-Length: zz"),
             "Content-Length"),
            (WINFO[:-4], "separator|truncated"),
            (WINFO[:30], "truncated"),
            (WINFO.replace(b"WARC/1.0", b"WARC/3.0"), "version"),
        ],
    )
    def test_malformed_records_raise(self, mutant, msg):
        with pytest.raises(ValueError, match=msg):
            parse_warc_records(mutant)

    def test_missing_content_length(self):
        bad = b"WARC/1.0\r\nWARC-Type: metadata\r\n\r\nbody\r\n\r\n"
        with pytest.raises(ValueError, match="Content-Length"):
            parse_warc_records(bad)


class TestHttp:
    def test_response_split(self):
        status, headers, body = parse_http_response(_http(b"payload"))
        assert status == 200 and body == b"payload"
        assert headers["content-type"] == "text/html"

    def test_non_http_passthrough(self):
        status, headers, body = parse_http_response(b"raw dns bytes")
        assert status is None and headers == {} and body == b"raw dns bytes"

    def test_truncated_head_raises(self):
        with pytest.raises(ValueError, match="truncated"):
            parse_http_response(b"HTTP/1.1 200 OK\r\nNo: end")


class TestWarcTable:
    def _collect(self, spark, payloads):
        return warc_table(
            spark.createDataFrame(
                list(enumerate(payloads)), "asset_id long, payload binary"
            )
        ).collect()

    def test_uncompressed_and_gzip_per_record_agree(self, spark):
        plain = WINFO + RESP + REQ
        gz = (
            gzip.compress(WINFO) + gzip.compress(RESP) + gzip.compress(REQ)
        )
        rows = self._collect(spark, [plain, gz])
        by_asset = {}
        for r in rows:
            by_asset.setdefault(r.asset_id, []).append(r)
        for aid in (0, 1):
            got = sorted(by_asset[aid], key=lambda r: r.record_offset)
            assert [r.warc_type for r in got] == [
                "warcinfo", "response", "request",
            ]
            resp = got[1]
            assert resp.http_status == 200
            assert resp.http_content_type == "text/html"
            assert bytes(resp.body) == b"<html>hello</html>"
            assert resp.target_uri == "http://example.com/"
            assert got[2].http_status is None  # request: raw body kept
            assert all(r.error is None for r in got)

    def test_corrupt_payload_quarantines(self, spark):
        rows = self._collect(spark, [b"not a warc", WINFO])
        by_asset = {r.asset_id: r for r in rows}
        assert by_asset[0].error is not None
        assert by_asset[0].warc_type is None
        assert by_asset[1].error is None
        assert by_asset[1].warc_type == "warcinfo"

    def test_bad_http_in_response_is_row_level_error(self, spark):
        bad = _record(
            "response", b"HTTP/1.1 200 OK\r\nNo: end",
            uri="http://x/",
        )
        rows = self._collect(spark, [bad])
        (r,) = rows
        assert r.warc_type == "response" and r.error is not None
        assert bytes(r.body).startswith(b"HTTP/1.1")  # raw body kept

    def test_full_segment_all_four_record_types_no_quarantine(self, spark):
        # the layout a real Common Crawl segment ships: warcinfo header,
        # request/response pair, metadata trailer — every record type
        # becomes an ordinary row; quarantine is reserved for actual
        # corruption (r8 verdict stretch #7)
        meta = _record(
            "metadata",
            b"fetchTimeMs: 12\r\n",
            uri="http://example.com/",
            extra=(b"Content-Type: application/warc-fields",),
        )
        seg = WINFO + REQ + RESP + meta
        rows = sorted(self._collect(spark, [seg]), key=lambda r: r.record_offset)
        assert [r.warc_type for r in rows] == [
            "warcinfo", "request", "response", "metadata",
        ]
        assert all(r.error is None for r in rows)
        assert rows[3].warc_content_type == "application/warc-fields"
        assert bytes(rows[3].body) == b"fetchTimeMs: 12\r\n"
        assert all(r.truncated is None for r in rows)

    def test_warc_truncated_surfaces(self, spark):
        cut = _record(
            "response",
            _http(b"partial"),
            uri="http://example.com/big",
            extra=(b"WARC-Truncated: length",),
        )
        (r,) = self._collect(spark, [cut])
        assert r.truncated == "length" and r.error is None
        assert r.http_status == 200  # what WAS captured still parses

    def test_record_types_filter(self, spark):
        meta = _record("metadata", b"x: 1\r\n")
        seg = WINFO + REQ + RESP + meta
        df = spark.createDataFrame(
            [(0, seg)], "asset_id long, payload binary"
        )
        only_resp = warc_table(df, record_types={"response"}).collect()
        assert [r.warc_type for r in only_resp] == ["response"]
        assert bytes(only_resp[0].body) == b"<html>hello</html>"
        both = warc_table(df, record_types={"request", "metadata"}).collect()
        assert sorted(r.warc_type for r in both) == ["metadata", "request"]
        # corruption still quarantines even when filtered: the error
        # row has warc_type None (not in any filter set) but must
        # surface regardless — quarantine is not subject to routing
        bad = warc_table(
            spark.createDataFrame(
                [(1, b"garbage")], "asset_id long, payload binary"
            ),
            record_types={"response"},
        ).collect()
        assert len(bad) == 1 and bad[0].error is not None

    def test_empty_input(self, spark):
        assert (
            warc_table(
                spark.createDataFrame([], "asset_id long, payload binary")
            ).count()
            == 0
        )
