"""Source/sink connectors and skew-mitigation equivalence.

Connectors: the reference is in-memory-only (SURVEY §2.3); the Spark
engine adds real format support — roundtrips prove schema fidelity
through partitioned parquet, JSON, and CSV sinks.

Skew: salted forms must be row-identical to their unsalted twins.
"""

import pytest
import os
import tempfile

from pyspark.sql import functions as F

from polars_matmul_spark.operators.skew import salted_join
from polars_matmul_spark.sources.tables import load_table


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_partitioned_parquet_roundtrip(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "docs_by_lang")
        docs.write.partitionBy("lang").mode("overwrite").parquet(path)
        back = spark.read.parquet(path)
        # partition pruning: a lang filter must prune directories
        pruned = back.filter(F.col("lang") == "en")
        assert pruned.count() == docs.filter(F.col("lang") == "en").count()
        assert _sorted_rows(back, ["doc_id", "n_chars", "lang"]) == _sorted_rows(
            docs, ["doc_id", "n_chars", "lang"]
        )


def test_json_and_csv_roundtrip(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir).limit(200)
    cols = ["c_custkey", "c_name", "c_acctbal"]
    with tempfile.TemporaryDirectory() as tmp:
        jpath, cpath = os.path.join(tmp, "j"), os.path.join(tmp, "c")
        cust.select(*cols).write.json(jpath)
        cust.select(*cols).write.option("header", True).csv(cpath)
        jback = spark.read.json(jpath)
        cback = (
            spark.read.option("header", True)
            .schema("c_custkey long, c_name string, c_acctbal double")
            .csv(cpath)
        )
        assert _sorted_rows(jback, cols) == _sorted_rows(cust, cols)
        assert _sorted_rows(cback, cols) == _sorted_rows(cust, cols)


def test_salted_join_equals_plain_join(spark, sf_dir):
    events = load_table(spark, "events", sf_dir)
    dim = events.groupBy("event_type").agg(F.count("*").alias("type_total"))
    plain = events.join(dim, "event_type")
    salted = salted_join(events, dim, "event_type", n_salt=8)
    cols = ["event_id", "event_type", "type_total"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_range_join_left_outer_keeps_unmatched(spark):
    from polars_matmul_spark.operators.rangejoin import range_join_bucketed

    pts = spark.createDataFrame([(1, 5.0), (2, 50.0)], "id long, x double")
    iv = spark.createDataFrame([(10, 0.0, 9.9)], "band long, lo double, hi double")
    out = range_join_bucketed(pts, iv, "x", "lo", "hi", 10.0, how="left").collect()
    got = {r.id: r.band for r in out}
    assert got == {1: 10, 2: None}  # unmatched point survives the left join


def test_minhash_array_and_flat_signatures_identical(spark, sf_dir):
    from pyspark.sql import functions as F

    from polars_matmul_spark.operators.dedup import (
        _minhash_signature,
        _minhash_signature_flat,
        shingled,
    )

    docs = load_table(spark, "documents", sf_dir).filter("doc_id < 40")
    sh = shingled(docs)
    arr = {
        r.doc_id: list(r.mh)
        for r in sh.select("doc_id", _minhash_signature(F.col("shingles"), 16).alias("mh")).collect()
    }
    flat = {r[0]: list(r[1:]) for r in _minhash_signature_flat(sh, "doc_id", 16).collect()}
    assert arr == flat


def test_salted_join_left_outer(spark, sf_dir):
    events = load_table(spark, "events", sf_dir)
    dim = (
        events.groupBy("event_type")
        .agg(F.count("*").alias("type_total"))
        .filter(F.col("event_type") == "click")  # partial dim -> unmatched rows
    )
    plain = events.join(dim, "event_type", "left")
    salted = salted_join(events, dim, "event_type", n_salt=4, how="left")
    cols = ["event_id", "event_type", "type_total"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_normalize_ts_both_parquet_encodings(spark, tmp_path):
    # the driver testdata has shipped ts as TIMESTAMP(NANOS)-read-as-long
    # (rounds <=1) AND as timestamp[us]/TIMESTAMP_NTZ (round 2+); every
    # reader must produce the SAME canonical timestamp column for both
    import pyarrow as pa
    import pyarrow.parquet as pq

    from polars_matmul_spark.sources.tables import normalize_ts

    micros = [1_700_000_000_123_456, 1_700_003_600_654_321]
    tbl_ns = pa.table(
        {"ts": pa.array([m * 1000 for m in micros], pa.timestamp("ns")),
         "v": [1.0, 2.0]}
    )
    tbl_us = pa.table(
        {"ts": pa.array(micros, pa.timestamp("us")), "v": [1.0, 2.0]}
    )
    pq.write_table(tbl_ns, str(tmp_path / "ns.parquet"))
    pq.write_table(tbl_us, str(tmp_path / "us.parquet"))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for name in ("ns", "us"):
        df = normalize_ts(spark.read.parquet(str(tmp_path / f"{name}.parquet")))
        assert df.schema["ts"].dataType.simpleString() == "timestamp", name
        out[name] = [
            r["ts"] for r in df.orderBy("v").select("ts").collect()
        ]
    assert out["ns"] == out["us"]
    # and the values are the actual instants, not off by 1000x
    assert out["us"][0].year == 2023


def test_orc_roundtrip(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir).limit(200)
    cols = ["c_custkey", "c_name", "c_acctbal"]
    with tempfile.TemporaryDirectory() as tmp:
        opath = os.path.join(tmp, "o")
        cust.select(*cols).write.orc(opath)
        oback = spark.read.orc(opath)
        assert _sorted_rows(oback, cols) == _sorted_rows(cust, cols)


def test_unpivot_stack_vs_pivot(spark, sf_dir):
    # unpivot (df.unpivot / stack) is pivot's inverse: wide order-status
    # counts back to long form must equal the original long-form counts
    from pyspark.sql import functions as F

    orders = load_table(spark, "orders", sf_dir)
    long_form = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n")
    )
    wide = (
        long_form.groupBy("o_orderpriority")
        .pivot("o_orderstatus")
        .agg(F.first("n"))
    )
    status_cols = [c for c in wide.columns if c != "o_orderpriority"]
    back = (
        wide.unpivot(
            "o_orderpriority", status_cols, "o_orderstatus", "n"
        )
        .filter(F.col("n").isNotNull())
    )
    a = sorted(
        (r["o_orderpriority"], r["o_orderstatus"], r["n"])
        for r in long_form.collect()
    )
    b = sorted(
        (r["o_orderpriority"], r["o_orderstatus"], r["n"]) for r in back.collect()
    )
    assert a == b and len(a) > 0


# --- quarantine ingestion ----------------------------------------------------


def test_jsonl_quarantine_splits_good_and_bad(spark, tmp_path):
    from pyspark.sql import types as T

    from polars_matmul_spark.sources.ingest import read_jsonl_quarantine

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        '{"doc_id": 2, "text": "beta"\n'          # truncated JSON
        '{"doc_id": "not a number", "text": "x"}\n'  # type failure
        'garbage line\n'
        '{"doc_id": 4, "text": "delta"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    good, bad = read_jsonl_quarantine(spark, str(p), schema)
    assert sorted((r["doc_id"], r["text"]) for r in good.collect()) == [
        (1, "alpha"),
        (4, "delta"),
    ]
    bad_rows = bad.collect()
    assert len(bad_rows) == 3
    assert all(r["raw"] and "feed.jsonl" in r["source_file"] for r in bad_rows)
    # raw text of every rejected line is preserved verbatim
    assert any("garbage line" in r["raw"] for r in bad_rows)


def test_jsonl_quarantine_rejects_reserved_field(spark):
    from pyspark.sql import types as T

    from polars_matmul_spark.sources.ingest import read_jsonl_quarantine

    schema = T.StructType([T.StructField("__corrupt_record", T.StringType())])
    with pytest.raises(ValueError):
        read_jsonl_quarantine(spark, "/nonexistent", schema)


def test_csv_quarantine_malformed_rows(spark, tmp_path):
    from pyspark.sql import types as T

    from polars_matmul_spark.sources.ingest import read_csv_quarantine

    p = tmp_path / "feed.csv"
    p.write_text(
        "id,score\n"
        "1,0.5\n"
        "2,not_a_double\n"
        "3,0.25\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    good, bad = read_csv_quarantine(spark, str(p), schema)
    assert sorted((r["id"], r["score"]) for r in good.collect()) == [
        (1, 0.5),
        (3, 0.25),
    ]
    [b] = bad.collect()
    assert "not_a_double" in b["raw"]


def test_csv_quarantine_honors_delimiter_alias(spark, tmp_path):
    # from_csv accepts both sep= and delimiter=; the header-drop filter
    # must render the header with whichever the caller used
    from pyspark.sql import types as T

    from polars_matmul_spark.sources.ingest import read_csv_quarantine

    p = tmp_path / "feed.csv"
    p.write_text("id;score\n1;0.5\n2;0.25\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    good, bad = read_csv_quarantine(spark, str(p), schema, delimiter=";")
    assert sorted((r["id"], r["score"]) for r in good.collect()) == [
        (1, 0.5),
        (2, 0.25),
    ]
    assert bad.count() == 0  # the header must NOT land in quarantine


def test_csv_quarantine_tolerant_header_match(spark, tmp_path):
    # round-6 ADVICE: a real-world header with quoting, whitespace or
    # different case must still be recognized as a header (dropped, not
    # quarantined); a header with genuinely DIFFERENT names is a format
    # break and must land in `bad`
    from pyspark.sql import types as T

    from polars_matmul_spark.sources.ingest import read_csv_quarantine

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    p = tmp_path / "quoted.csv"
    p.write_text('"Id" , "SCORE"\n1,0.5\n2,0.25\n')
    good, bad = read_csv_quarantine(spark, str(p), schema)
    assert sorted((r["id"], r["score"]) for r in good.collect()) == [
        (1, 0.5),
        (2, 0.25),
    ]
    assert bad.count() == 0

    # renamed upstream column -> header does NOT match -> quarantined
    p2 = tmp_path / "renamed.csv"
    p2.write_text("doc_id,score\n1,0.5\n")
    good2, bad2 = read_csv_quarantine(spark, str(p2), schema)
    assert [(r["id"], r["score"]) for r in good2.collect()] == [(1, 0.5)]
    [b] = bad2.collect()
    assert b["raw"] == "doc_id,score"


def test_cms_lookup_shuffle_join_matches_broadcast(spark):
    # round-6 ADVICE: broadcast=False is the escape hatch for oversized
    # sketches — same estimates, plain shuffle join
    from polars_matmul_spark.operators.cms import build_cms, cms_lookup

    df = spark.createDataFrame(
        [(f"k{i % 7}",) for i in range(50)], "k string"
    )
    cms = build_cms(df, "k", width=64, depth=3)
    keys = df.distinct()
    a = {r["k"]: r["est_count"] for r in cms_lookup(keys, cms, "k", 64, 3).collect()}
    b = {
        r["k"]: r["est_count"]
        for r in cms_lookup(keys, cms, "k", 64, 3, broadcast=False).collect()
    }
    assert a == b
    assert set(a) == {f"k{i}" for i in range(7)}
