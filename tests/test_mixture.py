"""Weighted training-mixture sampling, and the chunk -> pack
composition (long docs windowed into context budgets, then binned)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.chunking import chunk_documents
from polars_matmul_spark.operators.packing import pack_sequences
from polars_matmul_spark.operators.sampling import mixture_sample
from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpora(spark):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    return {
        "web": docs.filter(F.col("doc_id") % 3 == 0),
        "books": docs.filter(F.col("doc_id") % 3 == 1),
        "code": docs.filter(F.col("doc_id") % 3 == 2),
    }


class TestMixture:
    def test_proportions_and_tags(self, spark, corpora):
        mix = mixture_sample(
            corpora, {"web": 1.0, "books": 2.0, "code": 1.0}, target_rows=300
        )
        counts = {
            r["source"]: r["n"]
            for r in mix.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert set(counts) == {"web", "books", "code"}
        # expected 75 / 150 / 75 rows; hash sampling is binomial — allow 3 sigma
        assert abs(counts["web"] - 75) < 30
        assert abs(counts["books"] - 150) < 35
        assert abs(counts["code"] - 75) < 30

    def test_deterministic_and_partitioning_invariant(self, spark, corpora):
        w = {"web": 1.0, "books": 2.0, "code": 1.0}
        a = mixture_sample(corpora, w, 300).select("source", "epoch", "doc_id")
        shuffled = {k: v.repartition(13) for k, v in corpora.items()}
        b = mixture_sample(shuffled, w, 300).select("source", "epoch", "doc_id")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_oversampling_epochs(self, spark, corpora):
        # demand ~2.5x the 'books' corpus: epochs 0 and 1 complete,
        # epoch 2 partial
        n_books = corpora["books"].count()
        mix = mixture_sample(
            {"books": corpora["books"]}, {"books": 1.0}, target_rows=int(2.5 * n_books)
        )
        per_epoch = {
            r["epoch"]: r["n"]
            for r in mix.groupBy("epoch").agg(F.count("*").alias("n")).collect()
        }
        assert per_epoch[0] == n_books and per_epoch[1] == n_books
        assert 0 < per_epoch[2] < n_books

    def test_missing_weight_raises(self, spark, corpora):
        with pytest.raises(ValueError, match="without a weight"):
            mixture_sample(corpora, {"web": 1.0}, 100)


class TestChunkThenPack:
    def test_chunks_pack_within_budget(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        # encode (doc_id, chunk_id) into one bigint sequence id for the
        # packer (chunk_id < 2^20 here)
        chunks = chunk_documents(docs, chunk_tokens=32, overlap=8).select(
            (F.col("doc_id") * (1 << 20) + F.col("chunk_id")).alias("seq_id"),
            F.col("n_chunk_tokens").alias("n_tokens"),
        )
        packed = pack_sequences(chunks, budget=128, id_col="seq_id")
        stats = packed.groupBy("bin_id").agg(
            F.sum("n_tokens").alias("fill"), F.count("*").alias("n_seqs")
        )
        pdf = stats.toPandas()
        assert (pdf["fill"] <= 128).all()
        # chunks are <=32 tokens, so bins should pack several sequences
        assert pdf["n_seqs"].mean() > 2
        # completeness: every chunk lands in exactly one bin (the
        # packer names its id column doc_id)
        assert packed.count() == chunks.count()
        assert packed.select("doc_id").distinct().count() == chunks.count()
