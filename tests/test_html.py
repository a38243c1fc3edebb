"""HTML text extraction (operators/html.py): unit semantics, the
plain-text passthrough property, the link-density boilerplate signal,
a JVM-only plan gate, and — the repo's oracle-parity discipline — a
full DuckDB replay of the strip pipeline over synthesized HTML (every
regex is RE2-compatible by construction; this test is what keeps it
so)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.html import (
    extract_title,
    link_density,
    strip_html,
)
from polars_matmul_spark.plans.inspect import uses_python_worker


def _strip(spark, docs):
    df = spark.createDataFrame([(d,) for d in docs], "html string")
    return [
        r.t for r in df.select(strip_html(F.col("html")).alias("t")).collect()
    ]


CASES = [
    # tags removed, entities decoded, whitespace collapsed
    (
        "<html><body><h1>Hello</h1><p>a &amp; b &lt;c&gt;</p></body></html>",
        "Hello a & b <c>",
    ),
    # script/style bodies are NOT text
    (
        "<p>keep</p><script>var x = '<b>no</b>';</script><p>this</p>",
        "keep this",
    ),
    ("<style type='text/css'>p { color: red }</style>text", "text"),
    # comments (including markup inside them) vanish
    ("a<!-- <p>hidden</p> -->b", "a b"),
    # double-escaped text decodes ONE level
    ("&amp;lt;tag&amp;gt;", "&lt;tag&gt;"),
    # nbsp + quote entities
    ("x&nbsp;y &quot;z&quot; &#39;w&#39;", "x y \"z\" 'w'"),
    # plain text passes through (whitespace normalized)
    ("just   plain\n\ttext", "just plain text"),
    # an unclosed '<' fragment is NOT a tag — it survives, which also
    # keeps legitimate prose like '1 < 2' intact in non-HTML text
    ("trailing <b", "trailing <b"),
    ("if 1 < 2 then", "if 1 < 2 then"),
]


class TestStripHtml:
    def test_cases(self, spark):
        got = _strip(spark, [h for h, _ in CASES])
        for (src, want), g in zip(CASES, got):
            assert g == want, f"{src!r} -> {g!r}, want {want!r}"

    def test_null_safe(self, spark):
        df = spark.createDataFrame([(None,)], "html string")
        assert df.select(strip_html(F.col("html"))).collect()[0][0] is None

    def test_title(self, spark):
        rows = [
            ("<html><head><title>My &amp; Page\n 2</title></head></html>", "My & Page 2"),
            ("<TITLE lang=en>Caps</TITLE>", "Caps"),
            ("<p>no title</p>", ""),
        ]
        df = spark.createDataFrame(rows, "html string, want string")
        for r in df.select(
            extract_title(F.col("html")).alias("t"), "want"
        ).collect():
            assert r.t == r.want

    def test_jvm_only_plan(self, spark):
        df = spark.createDataFrame([("<p>x</p>",)], "html string")
        out = df.select(
            strip_html(F.col("html")),
            extract_title(F.col("html")),
            link_density(F.col("html")),
        )
        assert not uses_python_worker(out)


class TestLinkDensity:
    def test_boilerplate_vs_content(self, spark):
        nav = (
            "<ul>"
            + "".join(f"<li><a href='/{i}'>Section {i}</a></li>" for i in range(8))
            + "</ul>"
        )
        article = (
            "<h1>Title</h1><p>" + "Long prose sentence. " * 30
            + "</p><p>See <a href='/ref'>one reference</a>.</p>"
        )
        df = spark.createDataFrame(
            [(1, nav), (2, article), (3, "no markup at all"), (4, "")],
            "doc_id long, html string",
        )
        got = {
            r.doc_id: r.d
            for r in df.select(
                "doc_id", link_density(F.col("html")).alias("d")
            ).collect()
        }
        assert got[1] > 0.9  # pure navigation
        assert got[2] < 0.1  # content page
        assert got[3] == 0.0 and got[4] == 0.0

    def test_markup_inside_anchor_does_not_skew(self, spark):
        html = "<a href='/x'><b>bold</b> link</a> plus body text here"
        df = spark.createDataFrame([(html,)], "html string")
        (d,) = df.select(link_density(F.col("html")).alias("d")).collect()[0]
        # anchor text = 'bold link' (9 chars), total = 'bold link plus
        # body text here' (29 chars)
        assert d == pytest.approx(9 / 29)


def test_strip_pipeline_replays_in_duckdb(spark):
    """The oracle-parity property: the ENTIRE strip pipeline replayed
    step-for-step in DuckDB (RE2) must equal Spark (Java regex) on
    synthesized messy HTML — this is the gate that keeps every pattern
    RE2-compatible (no backreferences, no lookarounds)."""
    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    ).withColumn(
        "html",
        F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</title><style>p{}</style></head><body><h1>H</h1>"),
            F.lit("<script>if (1 < 2) { x = '<p>'; }</script><p>body &amp; "),
            F.col("doc_id").cast("string"),
            F.lit(" &lt;end&gt;</p><!-- c --><a href='/n'>nav</a></body></html>"),
        ),
    )
    got = {
        r.doc_id: (r.t, r.ti)
        for r in docs.select(
            "doc_id",
            strip_html(F.col("html")).alias("t"),
            extract_title(F.col("html")).alias("ti"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("docs", docs.toPandas()[["doc_id", "html"]])
    sql = r"""
SELECT doc_id,
  trim(regexp_replace(
    replace(replace(replace(replace(replace(replace(replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(html, '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
          '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
        '(?s)<!--.*?-->', ' ', 'g'),
      '(?s)<[^>]*>', ' ', 'g'),
    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
    '&apos;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
  '\s+', ' ', 'g')) AS t,
  trim(regexp_replace(
    replace(replace(replace(replace(replace(replace(replace(
      regexp_extract(html, '(?is)<title\b[^>]*>(.*?)</title', 1),
    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
    '&apos;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
  '\s+', ' ', 'g')) AS ti
FROM docs
"""
    want = {int(r[0]): (r[1], r[2]) for r in con.sql(sql).fetchall()}
    assert got == want
