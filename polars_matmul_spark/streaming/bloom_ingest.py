"""Streaming EXACT dedup-on-ingest with a persisted Bloom bitmap.

The exact-dedup sibling of ``streaming/ingest.py`` (MinHash near-dup)
and ``streaming/embeddings.py`` (IVF embedding near-dup), completing
the dedup-on-ingest triple. Each micro-batch:

1. fingerprint (md5 of normalized text) and collapse within-batch
   exact dups (lowest id wins — deterministic);
2. probe the MERGED persisted Bloom bitmap (OR of every epoch's
   bitmap — associativity pinned in test_bloom.py). Bloom-NEGATIVE
   rows are accepted immediately: at a steady-state duplicate rate of
   a few percent, the expensive exact gate sees a few percent of the
   batch, not all of it;
3. Bloom-POSITIVE rows anti-join the accepted-corpus fingerprints
   (exact gate — false positives survive, true dups don't);
4. idempotent epoch writes: the batch's accepted docs AND the bitmap
   of their fingerprints each overwrite their own ``epoch=N``
   directory. Crash-replay of a half-committed epoch overwrites
   itself; a replayed batch finding its OWN fingerprints in history is
   un-rejected by the self-id guard (same rule as the MinHash ingest).

Scale notes: the merged bitmap is MBs regardless of corpus size and
broadcasts; the exact gate's history scan touches only suspect
fingerprints (at 100 TB, lay the corpus out partitioned by fp prefix
so that scan prunes to the suspects' partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_matmul_spark.operators.bloom import build_bloom, probe_bloom
from polars_matmul_spark.operators.text import fingerprint

__all__ = ["bloom_ingest_batch", "run_bloom_ingest_stream"]


from polars_matmul_spark.streaming.hygiene import (
    read_or_empty as _read_or_empty,
)


def bloom_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    bloom_dir: str,
    corpus_dir: str,
    m_bits: int = 63 * 4096,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Accept the exactly-novel subset of one micro-batch; append docs
    (with their ``fp``) to ``corpus_dir/epoch=N`` and their bitmap to
    ``bloom_dir/epoch=N``."""
    batch = batch_df.withColumn("fp", fingerprint(F.col(text_col)))

    # 1. within-batch exact collapse: lowest id per fingerprint
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy(F.asc(id_col))
    # lazy pin (round 12): materializes inside the novel checkpoint's
    # job (the first action touching the batch) — still before any
    # epoch write; the eager form paid a dedicated fingerprint pass
    # per epoch, and on a first epoch it double-checkpointed the batch
    # (novel == batch there)
    batch = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=False)
    )

    # 2+3. two-gate check: the EXACT gate runs whenever an accepted
    # corpus exists — the bitmap is only the pre-filter that shrinks
    # the exact gate's input, never the gate itself. (Gating both on
    # the bloom dir alone would silently accept duplicates if the
    # bitmap is deleted/relocated while the corpus survives, or under
    # manual composition outside the availableNow driver.)
    # schema=None -> None when a state dir does not exist yet (the
    # first epoch), decided at plan time: the empty-history epoch skips
    # both emptiness-probe jobs outright (round 12; the gate itself is
    # unchanged whenever a corpus dir exists)
    bloom_parts = _read_or_empty(spark, bloom_dir, None)
    corpus = _read_or_empty(spark, corpus_dir, None)
    if corpus is not None and corpus.limit(1).count() > 0:
        if bloom_parts is not None and bloom_parts.limit(1).count() > 0:
            merged = bloom_parts.groupBy("word_idx").agg(
                F.bit_or("bits").alias("bits")
            )
            probed = probe_bloom(batch, merged, "fp", m_bits, k)
            clean = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
            suspects = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        else:
            # no bitmap: every row is a suspect for the exact gate
            clean = None
            suspects = batch
        # exact gate with the crash-replay self-id guard, as ONE
        # left-anti join: drop a suspect iff some history row shares
        # its fingerprint under a DIFFERENT doc id (a same-id history
        # row is this epoch's own half-committed write, not a dup)
        hist = corpus.select(
            F.col("fp").alias("__h_fp"), F.col(id_col).alias("__h_id")
        )
        confirmed = suspects.join(
            hist,
            (suspects["fp"] == hist["__h_fp"])
            & (suspects[id_col] != hist["__h_id"]),
            "left_anti",
        )
        batch = confirmed if clean is None else clean.unionByName(confirmed)

    novel = batch.localCheckpoint(eager=True)

    # 4. idempotent epoch writes — independent (both read the pinned
    # novel set), so they overlap (round 13, guide §2.6); each still
    # completes before the stage returns
    from polars_matmul_spark.streaming.hygiene import commit_epoch_writes

    commit_epoch_writes(
        lambda: novel.write.mode("overwrite").parquet(
            f"{corpus_dir}/epoch={epoch_id}"
        ),
        lambda: build_bloom(novel, "fp", m_bits, k)
        .write.mode("overwrite")
        .parquet(f"{bloom_dir}/epoch={epoch_id}"),
    )


def run_bloom_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    bloom_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    m_bits: int = 63 * 4096,
    k: int = 5,
    max_files_per_trigger: int = 1,
):
    """Drive the exact-dedup ingest loop over a document file stream
    (availableNow); returns the finished query."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        bloom_ingest_batch(
            spark, batch_df, epoch_id, bloom_dir, corpus_dir, m_bits, k
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
