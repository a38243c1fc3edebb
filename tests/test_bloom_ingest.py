"""Streaming exact dedup with a persisted Bloom bitmap
(streaming/bloom_ingest.py): accepted corpus has unique fingerprints,
planted cross-batch dups are rejected, within-batch dups collapse to
the lowest id, epoch replay is idempotent, and the result equals a
one-shot batch dedup of the same input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.text import fingerprint
from polars_matmul_spark.sources.tables import load_table
from polars_matmul_spark.streaming.bloom_ingest import (
    bloom_ingest_batch,
    run_bloom_ingest_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _mk_input(spark, root):
    """Two file-batches: batch0 = docs [0, 300); batch1 = docs
    [300, 500) PLUS exact copies of five batch0 docs under new ids
    (planted cross-batch dups) and one within-batch dup pair."""
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    inp = str(root / "in")
    b0 = docs.filter(F.col("doc_id") < 300)
    dup_src = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text"
    )
    within = docs.filter(F.col("doc_id") == 450).select(
        (F.col("doc_id") + 9500).alias("doc_id"), "text"
    )
    b1 = (
        docs.filter(F.col("doc_id") >= 300)
        .unionByName(dup_src)
        .unionByName(within)
    )
    b0.coalesce(1).write.parquet(f"{inp}/a")
    b1.coalesce(1).write.parquet(f"{inp}/b")
    import glob
    import shutil

    flat = sorted(glob.glob(f"{inp}/*/part-*.parquet"))
    for i, f in enumerate(flat):
        shutil.move(f, f"{inp}/batch{i}.parquet")
    shutil.rmtree(f"{inp}/a"), shutil.rmtree(f"{inp}/b")
    return inp


@pytest.fixture(scope="module")
def ingest_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bloom_ingest")
    inp = _mk_input(spark, root)
    bloom, corpus, ckpt = (str(root / d) for d in ("bloom", "corpus", "ckpt"))
    run_bloom_ingest_stream(spark, inp, bloom, corpus, ckpt)
    return inp, bloom, corpus


class TestBloomIngest:
    def test_accepted_fps_unique(self, spark, ingest_dirs):
        _, _, corpus_dir = ingest_dirs
        acc = spark.read.parquet(corpus_dir)
        assert acc.count() == acc.select("fp").distinct().count()
        assert acc.count() > 0

    def test_planted_cross_batch_dups_rejected(self, spark, ingest_dirs):
        _, _, corpus_dir = ingest_dirs
        acc = spark.read.parquet(corpus_dir)
        assert acc.filter(F.col("doc_id") >= 9000).filter(
            F.col("doc_id") < 9500
        ).count() == 0

    def test_within_batch_dup_lowest_id_wins(self, spark, ingest_dirs):
        _, _, corpus_dir = ingest_dirs
        acc = spark.read.parquet(corpus_dir)
        # 450 (lower id) survives; its 9950 copy doesn't
        assert acc.filter(F.col("doc_id") == 450).count() == 1
        assert acc.filter(F.col("doc_id") == 9950).count() == 0

    def test_equals_one_shot_batch_dedup(self, spark, ingest_dirs):
        inp, _, corpus_dir = ingest_dirs
        acc = {r["fp"] for r in spark.read.parquet(corpus_dir).collect()}
        allin = spark.read.parquet(inp).withColumn(
            "fp", fingerprint(F.col("text"))
        )
        want = {r["fp"] for r in allin.select("fp").distinct().collect()}
        assert acc == want

    def test_exact_gate_survives_missing_bloom_dir(self, spark, tmp_path):
        """Regression (round-5): both gates used to key off the bloom
        dir alone — a deleted/relocated bitmap with a surviving corpus
        silently accepted duplicates. The exact anti-join now runs
        whenever history exists; the bitmap is only the pre-filter."""
        import shutil

        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        bloom, corpus = str(tmp_path / "bloom"), str(tmp_path / "corpus")
        b0 = docs.filter(F.col("doc_id") < 100)
        bloom_ingest_batch(spark, b0, 0, bloom, corpus)
        shutil.rmtree(bloom)
        dup = docs.filter(F.col("doc_id") < 5).select(
            (F.col("doc_id") + 7000).alias("doc_id"), "text"
        )
        b1 = (
            docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150))
            .unionByName(dup)
        )
        bloom_ingest_batch(spark, b1, 1, bloom, corpus)
        acc = spark.read.parquet(corpus)
        assert acc.filter(F.col("doc_id") >= 7000).count() == 0
        assert acc.count() == acc.select("fp").distinct().count()

    def test_epoch_replay_idempotent(self, spark, ingest_dirs):
        inp, bloom_dir, corpus_dir = ingest_dirs
        before = sorted(
            (r["doc_id"], r["fp"])
            for r in spark.read.parquet(corpus_dir).collect()
        )
        # replay the LAST batch as its own epoch (the crash-replay
        # scenario: epoch written, checkpoint lost)
        import glob

        last = sorted(glob.glob(f"{inp}/batch*.parquet"))[-1]
        batch = spark.read.parquet(last)
        bloom_ingest_batch(spark, batch, 1, bloom_dir, corpus_dir)
        after = sorted(
            (r["doc_id"], r["fp"])
            for r in spark.read.parquet(corpus_dir).collect()
        )
        assert before == after
