"""Count-Min sketch: guarantees, merge algebra, DuckDB replay, plan shape.

The CMS guarantee is one-sided — estimate >= true always, and
estimate <= true + eps*N with probability >= 1 - delta. The first
half is deterministic and asserted for EVERY key; the second is
asserted in aggregate at a comfortable margin (fixed md5 hashing, no
flakiness).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.cms import (
    build_cms,
    cms_lookup,
    cms_params,
    merge_cms,
)
from polars_matmul_spark.plans.inspect import count_shuffles, explain_str
from polars_matmul_spark.sources.tables import load_table

WIDTH, DEPTH = 272, 5  # cms_params(0.01, 0.01)


@pytest.fixture(scope="module")
def words(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    w = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return w.cache()


@pytest.fixture(scope="module")
def exact(words):
    return {
        r["word"]: r["n"]
        for r in words.groupBy("word").agg(F.count("*").alias("n")).collect()
    }


def test_cms_params():
    w, d = cms_params(0.01, 0.01)
    assert w == 272 and d == 5
    with pytest.raises(ValueError):
        cms_params(0.0)
    with pytest.raises(ValueError):
        cms_params(0.01, 1.5)


def test_estimate_never_undercounts_and_bounds_error(spark, words, exact):
    cms = build_cms(words, "word", WIDTH, DEPTH).cache()
    n_total = sum(exact.values())
    keys = spark.createDataFrame([(k,) for k in exact], "word string")
    got = {
        r["word"]: r["est_count"]
        for r in cms_lookup(keys, cms, "word", WIDTH, DEPTH).collect()
    }
    assert set(got) == set(exact)
    eps = 2.718281828 / WIDTH
    over = 0
    for k, true_n in exact.items():
        assert got[k] >= true_n, f"undercount for {k!r}"
        if got[k] > true_n + eps * n_total:
            over += 1
    # P(exceed) <= delta = e^-depth < 0.7% per key; allow a hair of slack
    assert over <= max(1, int(0.02 * len(exact))), over


def test_sketch_is_bounded_and_single_shuffle(words):
    # width differs from the other tests' sketch so the cache manager
    # cannot substitute the cached InMemoryRelation (whose stored plan
    # text would add phantom Exchange lines to the explain)
    cms = build_cms(words, "word", WIDTH + 1, DEPTH)
    assert cms.count() <= (WIDTH + 1) * DEPTH
    assert count_shuffles(cms) == 1, explain_str(cms, "simple")


def test_lookup_broadcasts_the_sketch(spark, words):
    cms = build_cms(words, "word", WIDTH, DEPTH)
    keys = spark.createDataFrame([("alpha",), ("beta",)], "word string")
    plan = explain_str(cms_lookup(keys, cms, "word", WIDTH, DEPTH), "simple")
    assert "BroadcastHashJoin" in plan, plan


def test_merge_equals_build_on_union(words):
    a = words.filter(F.length("word") % 2 == 0)
    b = words.filter(F.length("word") % 2 == 1)
    merged = merge_cms(
        build_cms(a, "word", WIDTH, DEPTH), build_cms(b, "word", WIDTH, DEPTH)
    )
    full = build_cms(words, "word", WIDTH, DEPTH)
    sym = merged.exceptAll(full).union(full.exceptAll(merged))
    assert sym.count() == 0


def test_weighted_build_counts_weights(spark):
    df = spark.createDataFrame(
        [("x", 3), ("x", 2), ("y", 7)], "k string, w int"
    )
    cms = build_cms(df, "k", WIDTH, DEPTH, weight_col="w")
    got = {
        r["k"]: r["est_count"]
        for r in cms_lookup(
            spark.createDataFrame([("x",), ("y",)], "k string"),
            cms,
            "k",
            WIDTH,
            DEPTH,
        ).collect()
    }
    assert got["x"] >= 5 and got["y"] >= 7


def test_unseen_key_estimate_is_small(spark, words, exact):
    cms = build_cms(words, "word", WIDTH, DEPTH)
    keys = spark.createDataFrame(
        [("__never_seen_anywhere__",)], "word string"
    )
    [row] = cms_lookup(keys, cms, "word", WIDTH, DEPTH).collect()
    n_total = sum(exact.values())
    assert 0 <= row["est_count"] <= (2.718281828 / WIDTH) * n_total * 2


def test_sketch_replays_in_duckdb(spark, words, sf_dir):
    # the md5 double-hashing makes the COUNTER TABLE engine-portable:
    # DuckDB rebuilds it bit-for-bit from the same parquet
    cms = build_cms(words, "word", WIDTH, DEPTH)
    got = {(r["row"], r["col"]): r["n"] for r in cms.collect()}
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    oracle = con.sql(f"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
), h AS (
  SELECT ('0x' || substr(md5(word), 1, 12))::BIGINT AS h1,
         ('0x' || substr(md5(word), 13, 12))::BIGINT * 2 + 1 AS h2
  FROM w WHERE word <> ''
), p AS (
  SELECT r.range AS row, (h1 + r.range * h2) % {WIDTH} AS col
  FROM h CROSS JOIN range(0, {DEPTH}) r
)
SELECT row, col, COUNT(*) AS n FROM p GROUP BY row, col
""").fetchall()
    assert {(r, c): n for r, c, n in oracle} == got


# --- CMS-backed line dedup (bounded-state CCNet) ----------------------------


def test_cms_line_dedup_matches_exact_when_generously_sized(spark, sf_dir):
    from polars_matmul_spark.operators.linededup import (
        build_line_cms,
        strip_frequent_lines,
        strip_frequent_lines_cms,
    )

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.regexp_replace("text", " ", "\n").alias("text")
    )
    w, d = 8192, 5  # eps*N far under min_docs at this corpus size
    cms = build_line_cms(docs, w, d)
    got = strip_frequent_lines_cms(docs, cms, w, d, min_docs=3)
    exact = strip_frequent_lines(docs, min_docs=3)
    sym = got.exceptAll(exact).union(exact.exceptAll(got))
    assert sym.count() == 0


def test_cms_line_dedup_is_incremental(spark, sf_dir):
    # the merged per-batch sketches strip identically to the sketch
    # built over the full corpus — history never re-scans
    from polars_matmul_spark.operators.cms import merge_cms
    from polars_matmul_spark.operators.linededup import (
        build_line_cms,
        strip_frequent_lines_cms,
    )

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.regexp_replace("text", " ", "\n").alias("text")
    )
    w, d = 8192, 5
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    merged = merge_cms(build_line_cms(b1, w, d), build_line_cms(b2, w, d))
    full = build_line_cms(docs, w, d)
    a = strip_frequent_lines_cms(b2, merged, w, d, min_docs=3)
    b = strip_frequent_lines_cms(b2, full, w, d, min_docs=3)
    sym = a.exceptAll(b).union(b.exceptAll(a))
    assert sym.count() == 0


def test_cms_line_dedup_never_misses_frequent_lines(spark):
    # one-sided guarantee: even an undersized sketch strips every truly
    # frequent line (it can only over-strip, never under-strip)
    from polars_matmul_spark.operators.linededup import (
        build_line_cms,
        strip_frequent_lines_cms,
    )

    rows = [(i, "COOKIE BANNER\nunique body %d" % i) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w, d = 16, 2  # deliberately tiny
    cms = build_line_cms(df, w, d)
    out = strip_frequent_lines_cms(df, cms, w, d, min_docs=2).collect()
    assert all("COOKIE BANNER" not in r["text"] for r in out)


class TestOneSidedProperty:
    """Hypothesis: ``estimate >= true`` holds for EVERY key — present
    or absent — on arbitrary multisets under a deliberately tiny,
    collision-saturated sketch (4x2; every cell carries several keys'
    mass), where any under-count bug that the comfortably-sized fixed
    sketches above mask would surface. Upper envelope: a cell never
    exceeds the total inserted mass N, so est <= N."""

    @pytest.mark.slow
    def test_estimate_dominates_truth(self, spark):
        from collections import Counter

        from hypothesis import given, settings
        from hypothesis import strategies as st

        universe = [f"k{i}" for i in range(12)]
        multisets = st.lists(
            st.sampled_from(universe), min_size=1, max_size=40
        )

        @settings(max_examples=6, deadline=None)
        @given(vals=multisets)
        def check(vals):
            true = Counter(vals)
            w, d = 4, 2
            cms = build_cms(
                spark.createDataFrame([(v,) for v in vals], "v string"),
                "v", w, d,
            )
            # probe the full universe PLUS keys never inserted
            probe = spark.createDataFrame(
                [(f"k{i}",) for i in range(14)], "v string"
            )
            est = {
                r["v"]: r["est_count"]
                for r in cms_lookup(probe, cms, "v", w, d).collect()
            }
            n_total = len(vals)
            assert len(est) == 14
            for key, e in est.items():
                assert true.get(key, 0) <= e <= n_total, (
                    key, true.get(key, 0), e, n_total,
                )

        check()
