"""Deterministic sampling/splitting and sequence packing."""

import hashlib

import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.packing import pack_sequences
from polars_matmul_spark.operators.sampling import (
    hash_split,
    stratified_sample,
    top_n_per_key,
)
from polars_matmul_spark.operators.text import token_count
from polars_matmul_spark.sources.tables import load_table

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _expected_split(doc_id, salt=""):
    h = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()
    b = int(h[:12], 16) % 1_000_000
    if b < 800_000:
        return "train"
    if b < 900_000:
        return "val"
    return "test"


def test_hash_split_matches_md5_oracle_and_partition_invariant(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    got1 = {r.doc_id: r.split for r in hash_split(docs, "doc_id", FRACS).collect()}
    got16 = {
        r.doc_id: r.split
        for r in hash_split(docs.repartition(16), "doc_id", FRACS).collect()
    }
    assert got1 == got16  # partitioning-independent
    assert len(got1) == docs.count()  # fractions sum to 1 -> nothing dropped
    for doc_id, split in got1.items():
        assert split == _expected_split(doc_id)  # engine-portable md5 rule
    n = len(got1)
    train = sum(1 for s in got1.values() if s == "train")
    assert abs(train / n - 0.8) < 0.05


def test_hash_split_salt_derives_independent_split(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    a = {r.doc_id: r.split for r in hash_split(docs, "doc_id", FRACS).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, "doc_id", FRACS, salt="v2").collect()}
    assert a != b
    for doc_id, split in b.items():
        assert split == _expected_split(doc_id, salt="v2")


def test_hash_split_subsample_and_validation(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    kept = hash_split(docs, "doc_id", {"train": 0.5}).count()
    n = docs.count()
    assert abs(kept / n - 0.5) < 0.05
    with pytest.raises(ValueError, match="> 1"):
        hash_split(docs, "doc_id", {"a": 0.8, "b": 0.3})


def test_stratified_sample_per_stratum_fractions(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    target = {langs[0]: 1.0, langs[1]: 0.3}
    out = stratified_sample(docs, "lang", "doc_id", target)
    base = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get(langs[0]) == base[langs[0]]  # fraction 1.0 keeps all
    assert abs(got.get(langs[1], 0) / base[langs[1]] - 0.3) < 0.12
    for lang in langs[2:]:
        assert lang not in got  # default_fraction 0 drops the rest
    # deterministic: second run identical
    again = {r.lang: r.n for r in stratified_sample(docs, "lang", "doc_id", target)
             .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == again


def test_top_n_per_key_matches_pandas(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "n_chars")
    out = top_n_per_key(docs, "lang", "n_chars", 3, "doc_id").toPandas()
    pdf = docs.toPandas()
    exp = (
        pdf.sort_values(["n_chars", "doc_id"], ascending=[False, True], kind="stable")
        .groupby("lang", sort=False)
        .head(3)
    )
    got_ids = set(out["doc_id"])
    assert got_ids == set(exp["doc_id"])
    assert out.groupby("lang")["doc_id"].count().max() <= 3


def test_pack_sequences_budget_and_completeness(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    budget = 256
    packed = pack_sequences(docs, budget, partitions=8).cache()
    n_docs = docs.count()
    assert packed.count() == n_docs  # every doc exactly once
    assert packed.select("doc_id").distinct().count() == n_docs

    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("tok"),
        F.max("bin_fill").alias("fill"),
        F.min("bin_fill").alias("fill_min"),
        F.max(F.col("oversize").cast("int")).alias("over"),
        F.count("*").alias("members"),
    )
    rows = bins.collect()
    assert rows
    for r in rows:
        assert r.tok == r.fill == r.fill_min  # bin_fill consistent = member sum
        if r.over:
            assert r.members == 1  # oversize docs are alone in their bin
        else:
            assert r.tok <= budget
    # first-fit-decreasing should fill bins reasonably (non-oversize,
    # non-last bins); check aggregate utilization
    util = (
        packed.filter(~F.col("oversize"))
        .select("bin_id", "bin_fill")
        .distinct()
        .agg(F.avg("bin_fill"))
        .collect()[0][0]
    )
    assert util >= budget * 0.5


def test_pack_sequences_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(empty, 128, partitions=2).count() == 0


def test_priority_sample_replays_in_duckdb(spark, sf_dir):
    # the E-S priority ln(u)/w is engine-portable: same md5-derived u,
    # same ordering -> DuckDB picks the exact same id set
    import duckdb

    from polars_matmul_spark.operators.sampling import priority_sample

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.length("text").alias("w")
    )
    got = sorted(
        r["doc_id"] for r in priority_sample(docs, "doc_id", 25, "w").collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    oracle = sorted(
        r[0]
        for r in con.sql("""
SELECT doc_id FROM (
  SELECT doc_id,
         ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT + 0.5)
            / 281474976710656.0) / length(text) AS pri
  FROM documents WHERE length(text) > 0
) ORDER BY pri DESC, doc_id ASC LIMIT 25
""").fetchall()
    )
    assert got == oracle


def test_priority_sample_weights_bias_selection(spark):
    from polars_matmul_spark.operators.sampling import priority_sample

    rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    picked = priority_sample(df, "id", 200, "w").collect()
    heavy = sum(1 for r in picked if r["id"] % 2 == 0)
    # heavy rows are 10x likelier; expectation ~#180/200 — assert well
    # above the unweighted 100 but loose enough to be deterministic-safe
    assert heavy > 140, heavy


def test_priority_sample_clamps_excludes_and_plans(spark):
    from polars_matmul_spark.operators.sampling import priority_sample
    from polars_matmul_spark.plans.inspect import explain_str

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -4.0), (4, None), (5, 2.0)],
        "id long, w double",
    )
    out = priority_sample(df, "id", 10, "w")
    assert sorted(r["id"] for r in out.collect()) == [1, 5]  # w<=0/null drop
    assert "TakeOrderedAndProject" in explain_str(out, "simple")
    with pytest.raises(ValueError):
        priority_sample(df, "id", 0)


def test_reservoir_sample_uniform_and_partition_invariant(spark, sf_dir):
    from polars_matmul_spark.operators.sampling import reservoir_sample

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    a = sorted(r["doc_id"] for r in reservoir_sample(docs, "doc_id", 17).collect())
    b = sorted(
        r["doc_id"]
        for r in reservoir_sample(docs.repartition(13), "doc_id", 17).collect()
    )
    assert a == b and len(a) == 17
    # a different salt draws a different (deterministic) subset
    c = sorted(
        r["doc_id"] for r in reservoir_sample(docs, "doc_id", 17, salt="v2").collect()
    )
    assert c != a
