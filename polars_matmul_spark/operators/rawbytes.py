"""Raw-crawl byte ingestion: archive expansion + text transcoding.

Two steps every 100 TB crawl pipeline runs before ANY text operator
can touch the data, both fully real here because the stdlib ships the
codecs: (1) EXPAND archives — web dumps arrive as zip/tar.gz (arXiv
source bundles, GitHub exports, Common Crawl sidecars); (2) DECODE
text — raw bytes arrive in whatever encoding the origin server chose,
and a corpus builder must transcode to UTF-8 while MEASURING the
damage (mojibake ratio) instead of silently corrupting documents.

Both operators follow the quarantine philosophy of
``sources/ingest.py``: nothing is dropped or crashed on — corrupt
archives and undecodable members surface as rows with an ``error``
column, oversized members surface with metadata but no bytes (the
zip-bomb guard), so the pipeline's loss is always measurable.

Scale notes: expansion and transcoding run inside mapInPandas batches
per asset — embarrassingly parallel, no shuffle; decompression is
bounded per member (``max_member_bytes`` via streaming decompressors,
never a trusting ``.read()``), so one hostile payload cannot OOM an
executor. Bytes stay in executor Arrow buffers end-to-end.
"""

from __future__ import annotations

import bz2
import io
import lzma
import tarfile
import zipfile
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "sniff_archive",
    "expand_archives",
    "detect_encoding",
    "decode_text_payloads",
]

_XZ_MAGIC = b"\xfd7zXZ\x00"


def sniff_archive(payload: bytes) -> str | None:
    """Container kind by magic bytes: 'zip' | 'tar' (incl. compressed
    tars, resolved AFTER the outer codec) | 'gzip' | 'bz2' | 'xz' |
    None. A gzip/bz2/xz stream is reported as itself — whether it
    wraps a tar is decided by :func:`expand_archives` after one
    bounded decompression step. (Multi-member gzip — the WARC
    per-record layout — is the scope of ``operators.warc``.)"""
    if payload[:4] in (b"PK\x03\x04", b"PK\x05\x06", b"PK\x07\x08"):
        return "zip"
    if payload[:2] == b"\x1f\x8b":
        return "gzip"
    if payload[:3] == b"BZh" and len(payload) > 4 and payload[3:4].isdigit():
        return "bz2"
    if payload[:6] == _XZ_MAGIC:
        return "xz"
    if _looks_like_tar(payload):
        return "tar"
    return None


def _looks_like_tar(payload: bytes) -> bool:
    """A tar has no magic at offset 0; validate the first 512-byte
    header: the ustar magic at 257, or (old V7 tars) a correct header
    checksum — the field is stored as octal at 148:156 and computed
    with itself blanked to spaces."""
    if len(payload) < 512:
        return False
    if payload[257:262] == b"ustar":
        return True
    raw = payload[148:156].split(b"\x00")[0].strip(b" \x00")
    try:
        stored = int(raw or b"0", 8)
    except ValueError:
        return False
    block = payload[:148] + b" " * 8 + payload[156:512]
    return stored != 0 and sum(block) == stored


def _bounded_decompress(payload: bytes, kind: str, limit: int) -> tuple[bytes, bool]:
    """Decompress a single gzip/bz2/xz stream reading at most
    ``limit`` output bytes (+1 to detect overflow). Returns
    (data, truncated)."""
    if kind == "gzip":
        d = zlib.decompressobj(wbits=31)
    elif kind == "bz2":
        d = bz2.BZ2Decompressor()
    else:
        d = lzma.LZMADecompressor()
    out = d.decompress(payload, limit + 1)
    return out[:limit], len(out) > limit


def expand_archives(
    df: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    max_members: int = 10_000,
    max_member_bytes: int = 16 << 20,
) -> DataFrame:
    """Explode archive payloads into one row per member file:
    zip (stdlib ``zipfile``), tar and compressed tars — .tar.gz /
    .tar.bz2 / .tar.xz (``tarfile``) — and bare gzip/bz2/xz single
    streams (one member, path ``'-'``). Guards a 100 TB ingest needs:
    at most ``max_members`` rows per archive (the excess surfaces as
    one ``error='member cap'`` row, never silence), members that
    inflate past ``max_member_bytes`` keep their metadata but carry
    NULL bytes + ``error='too large'`` (the zip-bomb guard — zip
    members are streamed through a capped read, never trusted),
    corrupt archives emit one ``error`` row. Non-archive payloads emit
    nothing — route them through the text/codec operators directly.

    -> (asset_id, archive, member_path, member_size, member_bytes,
    error). mapInPandas, no shuffle, bounded memory per member.
    """
    if max_members < 1 or max_member_bytes < 1:
        raise ValueError("max_members and max_member_bytes must be >= 1")
    schema = (
        f"{id_col} long, archive string, member_path string, "
        "member_size long, member_bytes binary, error string"
    )
    cols = [
        id_col, "archive", "member_path", "member_size", "member_bytes",
        "error",
    ]

    def _zip_rows(aid, p):
        with zipfile.ZipFile(io.BytesIO(p)) as zf:
            count = 0  # emitted FILE rows, like _tar_rows — the raw
            for zi in zf.infolist():  # infolist index counts dirs too
                if zi.is_dir():
                    continue
                if count >= max_members:
                    yield (aid, "zip", None, None, None, "member cap")
                    return
                count += 1
                if zi.file_size > max_member_bytes:
                    yield (
                        aid, "zip", zi.filename, zi.file_size, None,
                        "too large",
                    )
                    continue
                with zf.open(zi) as fh:  # capped read: never trust sizes
                    data = fh.read(max_member_bytes + 1)
                if len(data) > max_member_bytes:
                    yield (
                        aid, "zip", zi.filename, len(data), None,
                        "too large",
                    )
                    continue
                yield (aid, "zip", zi.filename, len(data), data, None)

    def _tar_rows(aid, p, label):
        with tarfile.open(fileobj=io.BytesIO(p), mode="r:*") as tf:
            count = 0
            for ti in tf:
                if not ti.isfile():
                    continue
                if count >= max_members:
                    yield (aid, label, None, None, None, "member cap")
                    return
                count += 1
                if ti.size > max_member_bytes:
                    yield (
                        aid, label, ti.name, ti.size, None, "too large"
                    )
                    continue
                fh = tf.extractfile(ti)
                data = fh.read(max_member_bytes + 1) if fh else b""
                if len(data) > max_member_bytes:
                    yield (aid, label, ti.name, len(data), None, "too large")
                    continue
                yield (aid, label, ti.name, len(data), data, None)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(payload)
                kind = sniff_archive(p)
                if kind is None:
                    continue
                try:
                    if kind == "zip":
                        rows.extend(_zip_rows(aid, p))
                    elif kind == "tar":
                        rows.extend(_tar_rows(aid, p, "tar"))
                    else:  # gzip / bz2 / xz: tar inside, or one stream
                        data, truncated = _bounded_decompress(
                            p, kind, max_member_bytes
                        )
                        # Tar-ness is decided by the FIRST 512 decoded
                        # bytes, so a compressed tar whose total
                        # decompressed size exceeds max_member_bytes
                        # still expands member-by-member (tarfile
                        # streams; per-member reads stay bounded) —
                        # 'too large' is only for non-tar single
                        # streams.
                        if _looks_like_tar(data[:512]):
                            rows.extend(_tar_rows(aid, p, f"tar.{kind}"))
                        elif truncated:
                            rows.append(
                                (aid, kind, "-", None, None, "too large")
                            )
                        else:
                            rows.append(
                                (aid, kind, "-", len(data), data, None)
                            )
                except Exception as exc:  # corrupt archive: visible row
                    rows.append(
                        (aid, kind, None, None, None,
                         f"corrupt: {type(exc).__name__}")
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(expand, schema)


# ---------------------------------------------------------------------------
# text transcoding


_BOMS = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]


def detect_encoding(payload: bytes) -> str:
    """Charset sniff: BOMs first (UTF-8/16/32), then the NUL-density
    heuristic for BOM-less UTF-16 — it must run BEFORE the UTF-8
    attempt, because ASCII-heavy UTF-16 places NUL bytes on one
    parity of offsets and NULs are VALID UTF-8 (the classic
    transcoder trap: 'strict utf-8 accepted it' does not mean it was
    text) — then strict UTF-8, else latin-1 (total — every byte
    string decodes; the label itself is the mojibake signal)."""
    for bom, name in _BOMS:
        if payload[: len(bom)] == bom:
            return name
    if len(payload) >= 4 and len(payload) % 2 == 0:
        sample = payload[:4096]
        even = sample[0::2].count(0) / max(1, len(sample) // 2)
        odd = sample[1::2].count(0) / max(1, len(sample) // 2)
        if odd > 0.4 and even < 0.05:
            return "utf-16-le"
        if even > 0.4 and odd < 0.05:
            return "utf-16-be"
    try:
        payload.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    return "latin-1"


def decode_text_payloads(
    df: DataFrame, id_col: str = "asset_id", payload_col: str = "payload"
) -> DataFrame:
    """Transcode binary payloads to UTF-8 text with measured damage:
    sniff the encoding (:func:`detect_encoding`), decode with
    replacement, and report ``replacement_ratio`` — the fraction of
    decoded characters that are U+FFFD — so downstream quality gates
    can drop mojibake numerically instead of the transcoder deciding
    silently. latin-1 never produces replacements by construction;
    its signal is the encoding label itself.

    -> (asset_id, encoding, text, n_bytes, replacement_ratio).
    mapInPandas, no shuffle; decoding is C-speed per payload."""
    schema = (
        f"{id_col} long, encoding string, text string, n_bytes long, "
        "replacement_ratio double"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(payload)
                enc = detect_encoding(p)
                body = p
                # BOM is a marker, not content — but detect_encoding
                # also returns utf-16-le/be for BOM-LESS payloads (the
                # NUL-density heuristic), so only strip bytes that are
                # actually the BOM; a blind strip would eat the first
                # character of BOM-less UTF-16 text.
                for bom, name in _BOMS:
                    if name == enc and p.startswith(bom):
                        body = p[len(bom) :]
                        break
                codec = "utf-8" if enc == "utf-8-sig" else enc
                text = body.decode(codec, "replace")
                ratio = text.count("�") / len(text) if text else 0.0
                rows.append(
                    {
                        id_col: aid, "encoding": enc, "text": text,
                        "n_bytes": len(p), "replacement_ratio": ratio,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "encoding", "text", "n_bytes",
                    "replacement_ratio",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema)
