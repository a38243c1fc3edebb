"""Distributed Bloom filter (operators/bloom.py): the no-false-negative
guarantee, the theoretical FP rate, bitmap merge, the two-gate
incremental dedup vs a plain anti-join oracle, and DuckDB bitmap
parity (the engine-portability claim)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.bloom import (
    bloom_dedup_new_batch,
    bloom_params,
    build_bloom,
    probe_bloom,
)
from polars_matmul_spark.operators.text import fingerprint
from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _fps(spark, lo, hi):
    docs = load_table(spark, "documents", SF_DIR)
    return docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


class TestBloomCore:
    def test_params_sane(self):
        m, k = bloom_params(10_000, 0.01)
        assert m % 63 == 0
        # textbook: ~9.6 bits/item, ~7 hashes at 1%
        assert 9 * 10_000 < m < 11 * 10_000
        assert 6 <= k <= 8
        with pytest.raises(ValueError):
            bloom_params(0, 0.01)
        with pytest.raises(ValueError):
            bloom_params(10, 1.5)

    def test_no_false_negatives(self, spark):
        seen = _fps(spark, 0, 300)
        m, k = bloom_params(300, 0.01)
        bloom = build_bloom(seen, "fp", m, k)
        probed = probe_bloom(seen, bloom, "fp", m, k)
        assert probed.filter(~F.col("maybe_seen")).count() == 0

    def test_fp_rate_near_theory(self, spark):
        # membership of DISJOINT fingerprints: hits are false positives
        seen = _fps(spark, 0, 300)
        fresh = _fps(spark, 300, 500)
        m, k = bloom_params(300, 0.01)
        bloom = build_bloom(seen, "fp", m, k)
        probed = probe_bloom(fresh, bloom, "fp", m, k)
        n = probed.count()
        fp = probed.filter(F.col("maybe_seen")).count()
        # 1% design rate; allow generous sampling noise on 200 probes
        assert fp / n < 0.10, f"{fp}/{n} false positives"

    def test_merge_is_union_bit_or(self, spark):
        a, b = _fps(spark, 0, 150), _fps(spark, 150, 300)
        m, k = bloom_params(300, 0.01)
        merged = (
            build_bloom(a, "fp", m, k)
            .unionByName(build_bloom(b, "fp", m, k))
            .groupBy("word_idx")
            .agg(F.bit_or("bits").alias("bits"))
        )
        direct = build_bloom(_fps(spark, 0, 300), "fp", m, k)
        got = {r["word_idx"]: r["bits"] for r in merged.collect()}
        want = {r["word_idx"]: r["bits"] for r in direct.collect()}
        assert got == want

    def test_two_gate_dedup_equals_anti_join(self, spark):
        history = _fps(spark, 0, 300)
        # new batch: 100 true dups + 200 fresh
        new = _fps(spark, 200, 500)
        m, k = bloom_params(300, 0.01)
        bloom = build_bloom(history, "fp", m, k)
        got = bloom_dedup_new_batch(new, bloom, history, "fp", m, k)
        want = new.join(history.select("fp").distinct(), "fp", "left_anti")
        got_ids = sorted(r["doc_id"] for r in got.collect())
        want_ids = sorted(r["doc_id"] for r in want.collect())
        assert got_ids == want_ids
        assert len(got_ids) > 0

    def test_history_never_shuffles_in_probe(self, spark):
        from polars_matmul_spark.plans.inspect import explain_str, uses_python_worker

        seen = _fps(spark, 0, 300)
        m, k = bloom_params(300, 0.01)
        bloom = build_bloom(seen, "fp", m, k)
        probed = probe_bloom(_fps(spark, 300, 500), bloom, "fp", m, k)
        plan = explain_str(probed, "simple")
        assert "BroadcastHashJoin" in plan, plan
        assert not uses_python_worker(probed)


class TestBloomPortability:
    def test_bitmap_matches_duckdb(self, spark):
        """The bitmap is a deterministic function of the values — any
        engine with md5 reproduces it bit-for-bit."""
        m, k = 63 * 64, 5
        seen = _fps(spark, 0, 200)
        got = {
            r["word_idx"]: r["bits"]
            for r in build_bloom(seen, "fp", m, k).collect()
        }
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        want_rows = con.sql(
            rf"""
WITH fps AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents WHERE doc_id >= 0 AND doc_id < 200
), hashed AS (
  SELECT md5(fp) AS h FROM fps
), hh AS (
  SELECT ('0x' || substr(h, 1, 12))::BIGINT AS h1,
         ('0x' || substr(h, 13, 12))::BIGINT * 2 + 1 AS h2
  FROM hashed
), pos AS (
  SELECT (h1 + i * h2) % {m} AS p
  FROM hh, unnest(range(0, {k})) AS t(i)
)
SELECT p // 63 AS word_idx,
       bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS bits
FROM pos GROUP BY 1
"""
        ).fetchall()
        want = {int(w): int(b) for w, b in want_rows}
        assert got == want and len(got) > 0
