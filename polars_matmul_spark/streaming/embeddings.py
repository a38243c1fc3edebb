"""Streaming embedding ingest with near-dup rejection: each arriving
micro-batch of vectors is checked against the persisted IVF-assigned
index (and within itself); novel rows are assigned to their centroid
list and appended — the embedding-space twin of
``streaming.ingest`` (text MinHash).

Scale/semantics notes:

- The vs-history check is ``ann.embedding_neardup_new_vs_index``: the
  batch broadcasts into the centroid-partitioned index scan; the
  TB-scale index is never shuffled.
- Within-batch duplicates collapse greedily by ascending id AGAINST
  SURVIVORS: a row is dropped only if similar to an already-kept row,
  so chain members whose only witness was itself dropped still enter
  the index (batch-sized brute force via the same blocked join —
  micro-batches are small by construction).
- Writes use the repo's idempotent epoch-sink pattern (one OVERWRITTEN
  ``epoch=N`` subdir per foreachBatch epoch), and a replayed batch
  that finds ITSELF in the index must not self-reject (same guard as
  the text loop).
- Centroids are FIXED at stream start (trained or modular). Centroid
  drift/retraining is a rebuild operation, not a per-batch one — the
  standard IVF maintenance contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_matmul_spark.operators.ann import (
    assign_ivf,
    embedding_neardup_new_vs_index,
)

__all__ = ["ingest_embeddings_batch", "run_embedding_ingest_stream"]


def _read_index_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    # same corrupt-vs-missing classification as the text ingest loop —
    # one implementation, one test (corrupt index must fail loudly)
    from polars_matmul_spark.streaming.ingest import _read_or_empty

    return _read_or_empty(spark, path, None)


def ingest_embeddings_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    index_dir: str,
    centroids: DataFrame,
    threshold: float = 0.95,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> None:
    """Accept the novel subset of one micro-batch of (id, embedding);
    append IVF-assigned rows to ``index_dir/epoch=N``."""
    batch = batch_df.localCheckpoint(eager=True)

    # 1. within-batch collapse: greedy keep-lowest-id AGAINST SURVIVORS.
    # A row is dropped only if it is similar to a row that was itself
    # kept — plain pairwise drop mishandles chains (A~B, B~C, A!~C: C's
    # only witness B is dropped by A, so C is novel relative to the
    # kept set and must enter the index). The pair graph is batch-sized
    # (micro-batches are small by construction), so the exact greedy
    # pass runs on the driver over the collected pairs — one collect
    # per micro-batch, the normal foreachBatch coordination cost.
    # Probe ALL lists here (genuine batch-sized brute force): with the
    # caller's nprobe a boundary-straddling within-batch pair could slip
    # through and BOTH copies would enter the index permanently.
    self_pairs = embedding_neardup_new_vs_index(
        batch.select(F.col(id_col).alias("new_id"), "embedding"),
        assign_ivf(batch.withColumnRenamed(id_col, "old_id"), centroids, "old_id"),
        centroids,
        threshold=threshold,
        nprobe=10**9,
    ).filter(F.col("new_id") > F.col("old_id"))
    adj: dict[int, set[int]] = {}
    for r in self_pairs.select("new_id", "old_id").collect():
        adj.setdefault(r.new_id, set()).add(r.old_id)
        adj.setdefault(r.old_id, set()).add(r.new_id)
    if adj:
        kept: set[int] = set()
        dropped: list[int] = []
        for i in sorted(adj):  # rows with no similar pair are trivially kept
            if adj[i] & kept:
                dropped.append(i)
            else:
                kept.add(i)
        if dropped:
            batch = batch.filter(~F.col(id_col).isin(dropped))

    # 2. vs everything accepted so far (self-id guard for crash replay)
    index = _read_index_or_none(spark, index_dir)
    if index is not None:
        dups = embedding_neardup_new_vs_index(
            batch.select(F.col(id_col).alias("new_id"), "embedding"),
            index.select(F.col(id_col).alias("old_id"), "embedding", "centroid_id"),
            centroids,
            threshold=threshold,
            nprobe=nprobe,
        ).filter(F.col("new_id") != F.col("old_id"))
        batch = batch.join(
            dups.select(F.col("new_id").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )

    novel = assign_ivf(batch, centroids, id_col).localCheckpoint(eager=True)
    novel.write.mode("overwrite").parquet(f"{index_dir}/epoch={epoch_id}")


def run_embedding_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    centroids: DataFrame,
    schema: str = "vec_id long, embedding array<float>",
    threshold: float = 0.95,
    nprobe: int = 2,
    max_files_per_trigger: int = 1,
):
    """Drive the ingest loop over an embedding file stream
    (availableNow); returns the finished query."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_embeddings_batch(
            spark, batch_df, epoch_id, index_dir, centroids, threshold, nprobe
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
