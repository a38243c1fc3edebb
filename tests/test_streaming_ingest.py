"""Streaming dedup-on-ingest: the accepted corpus is pairwise
non-duplicate, counts conserve, and epoch replay is idempotent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.dedup import neardup_pairs_minhash
from polars_matmul_spark.sources.tables import load_table
from polars_matmul_spark.streaming.ingest import (
    ingest_documents_batch,
    run_dedup_ingest_stream,
)

SF_DIR = "/root/testdata/sf0.001"
SPLIT = 400


@pytest.fixture(scope="module")
def ingest_dirs(spark, tmp_path_factory):
    """Run the full ingest stream once over two file-batches of the
    sf0.001 documents; yield (input, index, corpus) dirs."""
    root = tmp_path_factory.mktemp("ingest")
    inp, index, corpus, ckpt = (
        str(root / d) for d in ("in", "index", "corpus", "ckpt")
    )
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    # two input files -> two micro-batches (maxFilesPerTrigger=1)
    docs.filter(F.col("doc_id") < SPLIT).coalesce(1).write.parquet(f"{inp}/a")
    docs.filter(F.col("doc_id") >= SPLIT).coalesce(1).write.parquet(f"{inp}/b")
    import glob
    import shutil

    flat = sorted(glob.glob(f"{inp}/*/part-*.parquet"))
    for i, f in enumerate(flat):
        shutil.move(f, f"{inp}/batch{i}.parquet")
    shutil.rmtree(f"{inp}/a"), shutil.rmtree(f"{inp}/b")

    run_dedup_ingest_stream(spark, inp, index, corpus, ckpt)
    return inp, index, corpus


class TestDedupIngest:
    def test_accepted_corpus_pairwise_unique(self, spark, ingest_dirs):
        _, _, corpus_dir = ingest_dirs
        accepted = spark.read.parquet(corpus_dir).select("doc_id", "text")
        n = accepted.count()
        total = load_table(spark, "documents", SF_DIR).count()
        assert 0 < n < total, "some docs must be accepted and some rejected"
        # completeness: no near-dup pair should survive ingestion
        leftover = neardup_pairs_minhash(accepted, threshold=0.8)
        assert leftover.count() == 0

    def test_index_matches_corpus(self, spark, ingest_dirs):
        _, index_dir, corpus_dir = ingest_dirs
        idx_ids = spark.read.parquet(index_dir).select("doc_id").distinct()
        doc_ids = spark.read.parquet(corpus_dir).select("doc_id").distinct()
        assert idx_ids.exceptAll(doc_ids).count() == 0
        assert doc_ids.exceptAll(idx_ids).count() == 0

    def test_epoch_replay_idempotent(self, spark, ingest_dirs):
        _, index_dir, corpus_dir = ingest_dirs
        before = spark.read.parquet(corpus_dir).count()
        # crash-replay epoch 1: re-ingest the second batch with the
        # same epoch id — counts must not change
        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        batch2 = docs.filter(F.col("doc_id") >= SPLIT)
        ingest_documents_batch(spark, batch2, 1, index_dir, corpus_dir)
        after = spark.read.parquet(corpus_dir).count()
        assert after == before

    def test_corrupt_index_fails_loudly(self, spark, tmp_path):
        # a corrupt index parquet must abort the batch, not be silently
        # treated as "no history" (which would re-accept every dup)
        import pytest

        from polars_matmul_spark.streaming.ingest import _read_or_empty

        bad = tmp_path / "index"
        bad.mkdir()
        (bad / "part-00000.parquet").write_bytes(b"this is not parquet")
        with pytest.raises(Exception):
            df = _read_or_empty(spark, str(bad), "doc_id long, band_idx int, band_hash long")
            df.count() if df is not None else None

    def test_missing_index_is_empty_history(self, spark, tmp_path):
        from polars_matmul_spark.streaming.ingest import _read_or_empty

        df = _read_or_empty(
            spark, str(tmp_path / "never-written"), "doc_id long, band_idx int, band_hash long"
        )
        assert df is not None and df.count() == 0
        assert _read_or_empty(spark, str(tmp_path / "nope2"), None) is None
