"""Context-window chunking (DuckDB oracle + coverage invariants) and
incremental MinHash dedup (new batch vs persisted band index == the
full-corpus run restricted to crossing pairs)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.chunking import chunk_documents
from polars_matmul_spark.operators.dedup import (
    build_minhash_bands,
    neardup_new_vs_index,
    neardup_pairs_minhash,
)
from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestChunking:
    CHUNK, OVERLAP = 32, 8

    def test_vs_duckdb(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        got = (
            chunk_documents(docs, self.CHUNK, self.OVERLAP)
            .toPandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        stride = self.CHUNK - self.OVERLAP
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
        want = con.sql(
            f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents WHERE trim(text) <> ''
), counted AS (
  SELECT doc_id, toks, len(toks) AS n,
         greatest(1, CAST(ceil((len(toks) - {self.OVERLAP}) / {stride}.0) AS BIGINT)) AS n_chunks
  FROM t
), chunks AS (
  SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_id, toks, n, n_chunks
  FROM counted
)
SELECT doc_id, chunk_id, n_chunks,
       chunk_id * {stride} AS chunk_start,
       len(toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {self.CHUNK}]) AS n_chunk_tokens,
       array_to_string(toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {self.CHUNK}], ' ') AS chunk_text
FROM chunks ORDER BY doc_id, chunk_id
"""
        ).df()
        assert len(got) == len(want) and len(got) > len(
            got["doc_id"].unique()
        ), "expected some multi-chunk docs"
        for c in ["doc_id", "chunk_id", "n_chunks", "chunk_start", "n_chunk_tokens"]:
            np.testing.assert_array_equal(got[c].values, want[c].values, err_msg=c)
        assert (got["chunk_text"].values == want["chunk_text"].values).all()

    def test_every_token_covered_once_per_window(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        ch = chunk_documents(docs, self.CHUNK, self.OVERLAP)
        stride = self.CHUNK - self.OVERLAP
        # coverage: last chunk must reach the end of the doc
        toks = docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).filter(F.col("n") > 0)
        last = ch.groupBy("doc_id").agg(
            F.max(F.col("chunk_start") + F.col("n_chunk_tokens")).alias("covered"),
            F.count("*").alias("rows"),
            F.first("n_chunks").alias("n_chunks"),
        )
        j = last.join(toks, "doc_id").toPandas()
        assert (j["covered"] == j["n"]).all()
        assert (j["rows"] == j["n_chunks"]).all()
        # chunk sizes: all but the last are exactly CHUNK; consecutive
        # starts differ by stride
        pdf = ch.toPandas().sort_values(["doc_id", "chunk_id"])
        not_last = pdf[pdf["chunk_id"] < pdf["n_chunks"] - 1]
        assert (not_last["n_chunk_tokens"] == self.CHUNK).all()
        starts = pdf.groupby("doc_id")["chunk_start"].diff().dropna()
        assert (starts == stride).all()

    def test_short_doc_single_chunk(self, spark):
        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        r = chunk_documents(df, 32, 8).collect()
        assert len(r) == 1
        assert r[0].n_chunk_tokens == 3 and r[0].chunk_text == "a b c"

    def test_empty_doc_no_rows(self, spark):
        df = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
        assert chunk_documents(df, 32, 8).count() == 0

    def test_bad_overlap_raises(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, 16, 16)


class TestIncrementalDedup:
    SPLIT = 400  # docs < SPLIT are the indexed corpus; >= SPLIT arrive new

    def test_matches_full_run_crossing_pairs(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        old = docs.filter(F.col("doc_id") < self.SPLIT)
        new = docs.filter(F.col("doc_id") >= self.SPLIT)

        index = build_minhash_bands(old)
        got = (
            neardup_new_vs_index(new, index, old, threshold=0.8)
            .toPandas()
            .sort_values(["new_id", "old_id"])
            .reset_index(drop=True)
        )

        full = neardup_pairs_minhash(docs, threshold=0.8).toPandas()
        lo, hi = full[["d1", "d2"]].min(axis=1), full[["d1", "d2"]].max(axis=1)
        crossing = full[(lo < self.SPLIT) & (hi >= self.SPLIT)].copy()
        crossing["new_id"], crossing["old_id"] = hi[crossing.index], lo[crossing.index]
        want = crossing.sort_values(["new_id", "old_id"]).reset_index(drop=True)

        assert len(got) > 0, "test split produced no crossing near-dups"
        assert list(got["new_id"]) == list(want["new_id"])
        assert list(got["old_id"]) == list(want["old_id"])
        np.testing.assert_allclose(got["jaccard"].values, want["jaccard"].values)

    def test_new_side_broadcasts_index_not_shuffled(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        old = docs.filter(F.col("doc_id") < self.SPLIT)
        new = docs.filter(F.col("doc_id") >= self.SPLIT)
        plan = (
            neardup_new_vs_index(new, build_minhash_bands(old), old)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan, plan

    def test_disjoint_batch_no_pairs(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        old = docs.filter(F.col("doc_id") < self.SPLIT)
        new = spark.createDataFrame(
            [(10_000, "totally novel text with no duplicate whatsoever xyzzy")],
            "doc_id long, text string",
        )
        assert neardup_new_vs_index(new, build_minhash_bands(old), old).count() == 0


class TestBandTableParamGuard:
    """build_minhash_bands stamps its LSH params into band_idx column
    metadata; neardup_pairs_minhash(band_table=...) validates them —
    a drifted caller fails loudly instead of silently losing candidate
    recall (ADVICE r11)."""

    def _docs(self, spark):
        return load_table(spark, "documents", SF_DIR).filter(
            F.col("doc_id") < 200
        )

    def test_matching_params_accepted_and_identical(self, spark):
        docs = self._docs(spark)
        bt = build_minhash_bands(docs)
        got = sorted(
            map(tuple, neardup_pairs_minhash(docs, band_table=bt)
                .select("d1", "d2").collect())
        )
        want = sorted(
            map(tuple, neardup_pairs_minhash(docs)
                .select("d1", "d2").collect())
        )
        assert got == want

    def test_drifted_params_raise(self, spark):
        docs = self._docs(spark)
        bt = build_minhash_bands(docs, num_perm=32, bands=16)
        with pytest.raises(ValueError, match="drifted"):
            neardup_pairs_minhash(docs, band_table=bt)  # expects 64/32

    def test_metadata_survives_parquet_roundtrip(self, spark, tmp_path):
        docs = self._docs(spark)
        path = str(tmp_path / "bands")
        build_minhash_bands(docs, n=4).write.parquet(path)
        bt = spark.read.parquet(path)
        with pytest.raises(ValueError, match="drifted"):
            neardup_pairs_minhash(docs, band_table=bt)  # expects n=3
        # and the matching call still goes through
        assert neardup_pairs_minhash(docs, n=4, band_table=bt) is not None

    def test_untagged_table_still_accepted(self, spark):
        # a user-built table without the stamp keeps working (no
        # metadata -> no check, documented best-effort guard)
        docs = self._docs(spark)
        bt = build_minhash_bands(docs).select(
            "doc_id", (F.col("band_idx") + 0).alias("band_idx"), "band_hash"
        )
        assert bt.schema["band_idx"].metadata in ({}, None)
        neardup_pairs_minhash(docs, band_table=bt).count()

    def test_index_path_drift_raises(self, spark):
        # the persisted-index consumer validates the stamp too — the
        # path the parquet-surviving metadata exists for
        docs = self._docs(spark)
        old = docs.filter(F.col("doc_id") < 100)
        new = docs.filter(F.col("doc_id") >= 100)
        index = build_minhash_bands(old, num_perm=64, bands=32)
        with pytest.raises(ValueError, match="drifted"):
            neardup_new_vs_index(new, index, old, bands=16)
