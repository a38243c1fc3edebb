"""WARC (Web ARChive, ISO 28500) record parsing — the format raw web
crawls actually arrive in (Common Crawl ships WARC/1.0), completing
the ingestion layer next to ``rawbytes.expand_archives``: a WARC file
is a SEQUENCE of records, conventionally each compressed as its own
gzip MEMBER (so readers can seek), which the single-stream gzip path
in ``rawbytes`` deliberately does not model.

Scope, all first-principles from the public spec (ISO 28500 / the
WARC/1.0 format description) and RFC 1952 (gzip members) / RFC 9112
(HTTP message framing):

- multi-member gzip splitting (``split_gzip_members`` — stdlib
  ``zlib`` with per-member ``unused_data`` handoff, bounded output);
- record parsing (``parse_warc_records``): version line, CRLF header
  block (with RFC-style continuation lines), ``Content-Length`` body
  bytes, the mandatory CRLF CRLF record separator;
- HTTP response payload splitting for ``WARC-Type: response`` records
  (status line + headers + body — the body is what a text pipeline
  actually wants);
- the Spark surface ``warc_table``: one row per record with quarantine
  semantics (malformed records/members surface as ``error`` rows,
  never exceptions — the ``rawbytes`` contract).

Scale notes: parsing runs inside mapInPandas batches per WARC payload
— no shuffle, bounded memory (member decompression is capped like
``rawbytes``); at 100 TB each executor parses its own WARC chunks and
only the extracted records flow on.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "split_gzip_members",
    "parse_warc_records",
    "parse_http_response",
    "warc_table",
]


def split_gzip_members(
    data: bytes, max_member_bytes: int = 16 << 20, max_members: int = 100_000
) -> list[bytes]:
    """Decompress a multi-member gzip stream into its members (RFC
    1952 allows any number of concatenated members; WARC writers emit
    one per record). Output per member is capped at
    ``max_member_bytes`` (ValueError beyond — the bomb guard), and the
    member count at ``max_members``. Raises ValueError on corrupt
    streams."""
    members = []
    pos = 0
    while pos < len(data):
        if len(members) >= max_members:
            raise ValueError(f"more than {max_members} gzip members")
        d = zlib.decompressobj(wbits=31)
        try:
            # one capped call: zlib stops at max_length, so a member
            # that would exceed the cap returns exactly cap+1 bytes
            # (too big), and a member that returns less WITHOUT
            # reaching eof ran out of input (truncated)
            out = d.decompress(data[pos:], max_member_bytes + 1)
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member {len(members)}: {exc}")
        if len(out) > max_member_bytes:
            raise ValueError(
                f"gzip member {len(members)} exceeds {max_member_bytes} bytes"
            )
        if not d.eof:
            raise ValueError(f"truncated gzip member {len(members)}")
        members.append(out)
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member consumed no input")
        pos += consumed
    return members


def _parse_headers(block: bytes) -> dict[str, str]:
    """Parse a CRLF header block (WARC named fields / HTTP headers),
    folding RFC-style continuation lines (leading SP/TAB)."""
    headers: dict[str, str] = {}
    last = None
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        if b":" not in line:
            raise ValueError(f"malformed header line: {line[:40]!r}")
        name, _, value = line.partition(b":")
        last = name.strip().decode("latin-1").lower()
        headers[last] = value.strip().decode("latin-1")
    return headers


def parse_warc_records(data: bytes) -> list[dict]:
    """Parse every WARC record in an UNCOMPRESSED byte stream. Each
    record is: ``WARC/1.x`` version line, CRLF header block, blank
    line, exactly ``Content-Length`` body bytes, CRLF CRLF. Returns
    dicts with ``headers`` (lower-cased names), ``body`` bytes and
    ``offset``. Raises ValueError on malformed records — callers that
    must not abort (the Spark surface) catch per payload."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(f"expected WARC/ version line at offset {pos}")
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        head = data[pos:head_end]
        version_line, _, header_block = head.partition(b"\r\n")
        version = version_line[5:].decode("latin-1")
        if not version.startswith("0.") and not version.startswith("1."):
            raise ValueError(f"unsupported WARC version {version!r}")
        headers = _parse_headers(header_block)
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        try:
            length = int(headers["content-length"])
        except ValueError:
            raise ValueError(
                f"bad Content-Length {headers['content-length']!r}"
            )
        if length < 0:
            raise ValueError("negative Content-Length")
        body_start = head_end + 4
        body_end = body_start + length
        if body_end + 4 > n:
            raise ValueError("truncated WARC record body")
        if data[body_end : body_end + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record separator")
        records.append(
            {
                "offset": pos,
                "version": version,
                "headers": headers,
                "body": data[body_start:body_end],
            }
        )
        pos = body_end + 4
    return records


def parse_http_response(body: bytes) -> tuple[int | None, dict, bytes]:
    """Split an HTTP/1.x response message (the payload of a WARC
    ``response`` record) into (status, headers, body). Returns
    ``(None, {}, body)`` when the payload is not an HTTP message —
    WARC response records may carry other protocols."""
    if not body.startswith(b"HTTP/"):
        return None, {}, body
    head_end = body.find(b"\r\n\r\n")
    if head_end < 0:
        raise ValueError("truncated HTTP response head")
    head = body[:head_end]
    status_line, _, header_block = head.partition(b"\r\n")
    parts = status_line.split(b" ", 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError(f"malformed HTTP status line: {status_line[:40]!r}")
    return int(parts[1]), _parse_headers(header_block), body[head_end + 4 :]


def warc_table(
    df: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    max_member_bytes: int = 16 << 20,
    record_types: set[str] | None = None,
) -> DataFrame:
    """Explode raw WARC payloads (gzip-per-record, multi-member gzip,
    or uncompressed) into one row per record:

    -> (asset_id, record_offset, warc_type, record_id, target_uri,
    warc_content_type, http_status, http_content_type, truncated,
    body, error).

    A real Common Crawl segment interleaves ``warcinfo`` (file
    header), ``request``/``response`` pairs and ``metadata`` records —
    ALL of them parse into ordinary rows here (``body`` is the HTTP
    response body for response records, the raw record body
    otherwise); quarantine ``error`` rows are reserved for ACTUAL
    corruption (bad gzip, broken framing, malformed HTTP). The spec's
    ``WARC-Truncated`` field (a crawler cut the capture short:
    ``length``/``time``/``disconnect``/``unspecified``) surfaces as
    its own column so a pipeline can filter partial captures without
    re-reading headers.

    ``record_types`` filters at parse time (e.g. ``{"response"}`` —
    the usual text-pipeline front door): non-matching records are
    skipped BEFORE their bodies are materialized into rows, so at
    100 TB only the wanted records' bytes flow downstream. ``None``
    keeps every type. mapInPandas, no shuffle, bounded member
    decompression.
    """
    schema = (
        f"{id_col} long, record_offset long, warc_type string, "
        "record_id string, target_uri string, warc_content_type string, "
        "http_status long, http_content_type string, truncated string, "
        "body binary, error string"
    )
    cols = [
        id_col, "record_offset", "warc_type", "record_id", "target_uri",
        "warc_content_type", "http_status", "http_content_type",
        "truncated", "body", "error",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(payload)
                try:
                    if p[:2] == b"\x1f\x8b":
                        stream = b"".join(
                            split_gzip_members(p, max_member_bytes)
                        )
                    else:
                        stream = p
                    records = parse_warc_records(stream)
                except ValueError as exc:
                    rows.append(
                        (aid, None, None, None, None, None, None, None,
                         None, None, str(exc))
                    )
                    continue
                for rec in records:
                    h = rec["headers"]
                    wtype = h.get("warc-type")
                    if record_types is not None and wtype not in record_types:
                        continue
                    status, ctype, body = None, None, rec["body"]
                    err = None
                    if wtype == "response":
                        try:
                            status, hh, body = parse_http_response(
                                rec["body"]
                            )
                            ctype = hh.get("content-type")
                        except ValueError as exc:
                            err = str(exc)
                            body = rec["body"]
                    rows.append(
                        (
                            aid, rec["offset"], wtype,
                            h.get("warc-record-id"),
                            h.get("warc-target-uri"),
                            h.get("content-type"),
                            status, ctype,
                            h.get("warc-truncated"),
                            body, err,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, schema)
