"""HTML text extraction — the stage between WARC bodies and the text
pipeline: real crawls ship HTML, not plain text, so the front-door
lineage (warc_table -> documents) needs a tag stripper before any
text operator sees a byte.

Scope is the "extraction-lite" every large corpus pipeline starts
from (C4/Gopher-class preprocessing, not a DOM): script/style/comment
block removal, tag removal, the common entity decodes, whitespace
normalization, plus the classic boilerplate SIGNAL — link density
(anchor-text chars / total text chars; navigation- and footer-heavy
pages score high and get filtered, the content pages survive). A DOM-
accurate extractor (trafilatura-class) is a library swap at the same
surface; the contract here is Spark-native and oracle-replayable.

Everything is PURE Catalyst regexp/string expressions — whole-stage
codegen, no Python worker, scan-speed at 100 TB — and every regex is
RE2-compatible (non-greedy quantifiers, (?is) flags, no
backreferences), so DuckDB replays each step bit-for-bit (the repo's
oracle-parity property; pinned by a DuckDB twin in tests/test_html.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["strip_html", "extract_title", "link_density", "html_entities"]

# the five XML predefined entities + the three numeric/named forms a
# text pipeline actually meets at volume; a full entity table is data,
# not code (broadcast-join it if ever needed)
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: '&amp;lt;' must become '&lt;' literal, not '<'
)

# two separate block patterns, NOT one with a backreference: RE2 (the
# DuckDB engine the oracles replay in) has no backreferences
_SCRIPT = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_COMMENTS = r"(?s)<!--.*?-->"
_TAGS = r"(?s)<[^>]*>"
_ANCHORS = r"(?is)<a\b[^>]*>(.*?)</a\s*>"


def html_entities(col: Column) -> Column:
    """Decode the common HTML entities (see module constant; ``&amp;``
    decodes LAST so double-escaped text stays escaped one level)."""
    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def strip_html(col: Column) -> Column:
    """Visible text of an HTML document: script/style blocks, comments
    and tags removed, common entities decoded, whitespace runs
    collapsed, trimmed. NULL-safe (null in, null out). Plain text
    passes through unchanged (modulo whitespace normalization), so the
    extractor can run unconditionally on mixed crawls."""
    out = F.regexp_replace(col, _SCRIPT, " ")
    out = F.regexp_replace(out, _STYLE, " ")
    out = F.regexp_replace(out, _COMMENTS, " ")
    out = F.regexp_replace(out, _TAGS, " ")
    out = html_entities(out)
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def extract_title(col: Column) -> Column:
    """The document ``<title>`` (entity-decoded, whitespace-collapsed);
    empty string when absent — the cheapest document label a crawl
    yields, and the join key quality-dedup often wants."""
    raw = F.regexp_extract(col, r"(?is)<title\b[^>]*>(.*?)</title", 1)
    return F.trim(F.regexp_replace(html_entities(raw), r"\s+", " "))


def link_density(col: Column) -> Column:
    """Anchor-text chars / total visible-text chars, in [0, 1] —
    the classic boilerplate signal: navigation/footer/link-farm pages
    read high, content pages low (filter at ~0.5 by convention; 0.0
    for an empty or non-HTML document). Both numerator and denominator
    run the SAME strip pipeline, so markup inside anchors cannot skew
    the ratio."""
    anchors = F.array_join(F.regexp_extract_all(col, F.lit(_ANCHORS), 1), " ")
    num = F.length(strip_html(anchors))
    den = F.length(strip_html(col))
    return F.when(
        den > 0, F.least(num.cast("double") / den, F.lit(1.0))
    ).otherwise(F.lit(0.0))
