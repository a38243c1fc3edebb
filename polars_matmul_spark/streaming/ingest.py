"""Streaming dedup-on-ingest: each arriving micro-batch of documents
is near-dup-checked within itself AND against everything already
accepted, then the survivors and their MinHash bands are appended to
the persisted corpus/index — the continuous form of the batch
corpus-prep pipeline.

Scale/semantics notes:

- The vs-history check is :func:`operators.dedup.neardup_new_vs_index`:
  the batch's band table broadcasts, the TB-scale index is scanned
  map-side and never shuffled, exact verification touches only
  candidate docs.
- Within-batch duplicates collapse via pairs -> connected components ->
  canonical keep (``dedup_groups``/``keep_canonical``) — batch-sized
  iterative work, bounded by the micro-batch.
- Writes are the repo's idempotent epoch-sink pattern (one OVERWRITTEN
  ``epoch=N`` subdirectory per foreachBatch epoch): replaying a
  half-committed epoch after a crash overwrites its own output instead
  of appending duplicates.
- The accept/reject DECISION is pinned by the eager ``novel``
  checkpoint before any write mutates the index/corpus dirs — that is
  the invariant replay correctness needs (the decision cannot be
  re-derived mid-write while the directories change underneath the
  plan). The batch/band ``localCheckpoint(eager=False)`` pins are a
  performance measure only (compute-once across their consumers); if
  Spark ever recomputes a lazily-pinned ancestor, its lineage reads
  only immutable source files, never the state dirs this epoch
  writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_matmul_spark.operators.dedup import (
    build_minhash_bands,
    keep_canonical,
    neardup_new_vs_index,
    neardup_pairs_minhash,
)

__all__ = ["ingest_documents_batch", "run_dedup_ingest_stream"]

_BANDS_SCHEMA = "doc_id long, band_idx int, band_hash long"


from polars_matmul_spark.streaming.hygiene import (
    read_or_empty as _read_or_empty,
)


def ingest_documents_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    index_dir: str,
    corpus_dir: str,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Accept the novel subset of one micro-batch; append docs to
    ``corpus_dir/epoch=N`` and bands to ``index_dir/epoch=N``
    (overwrite-in-place per epoch => idempotent replay)."""
    # lazy pin (round 12): materializes inside the first consuming job
    # (the within-batch pair probe) — still strictly before any of
    # this epoch's writes mutate the index/corpus dirs, which is what
    # the pin is for; the eager form paid a dedicated pass per epoch
    batch = batch_df.localCheckpoint(eager=False)

    # the batch's band table is computed ONCE: it drives the
    # within-batch banding below AND (filtered to the novel ids) the
    # index append at the end — the num_perm-way signature fold used
    # to run twice per epoch
    batch_bands = build_minhash_bands(batch, text_col, id_col).localCheckpoint(
        eager=False
    )

    # 1. within-batch near-dup collapse (chains included). The pair
    # search (band self-join + exact verify) is pinned once: the
    # emptiness probe below and keep_canonical's component closure
    # otherwise each re-run it from scratch
    pairs = neardup_pairs_minhash(
        batch, threshold, text_col, id_col, band_table=batch_bands
    ).localCheckpoint(eager=False)
    if pairs.limit(1).count() > 0:
        batch = keep_canonical(batch, pairs, id_col=id_col).drop("group_size")

    # 2. vs everything accepted so far — the survivors' bands are a
    # filter of the batch band table (a doc's bands are independent of
    # other docs), so the vs-history check reuses the one signature
    # fold instead of running its own
    index = _read_or_empty(spark, index_dir, _BANDS_SCHEMA)
    corpus = _read_or_empty(spark, corpus_dir, None)
    if corpus is not None and index is not None and index.limit(1).count() > 0:
        dups = neardup_new_vs_index(
            batch,
            index.select(id_col, "band_idx", "band_hash"),
            corpus,
            threshold,
            text_col,
            id_col,
            new_bands=batch_bands.join(
                batch.select(id_col), id_col, "left_semi"
            ),
        )
        # crash-replay safety: if this epoch's own writes landed before
        # the checkpoint committed, the replayed batch finds ITSELF in
        # the index — a self-id match must not reject the doc, or the
        # replay would overwrite the epoch with an empty accept set
        dups = dups.filter(F.col("new_id") != F.col("old_id"))
        batch = batch.join(
            dups.select(F.col("new_id").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )

    novel = batch.localCheckpoint(eager=True)

    # 3. idempotent append: one overwritten epoch subdir each; the
    # novel docs' bands are a FILTER of the batch band table computed
    # above (a doc's bands are independent of other docs), not a
    # second signature pass. The two writes are independent (both read
    # the pinned novel set / band table), so they overlap (round 13,
    # guide §2.6); each completes before the stage returns
    from polars_matmul_spark.streaming.hygiene import commit_epoch_writes

    commit_epoch_writes(
        lambda: novel.write.mode("overwrite").parquet(
            f"{corpus_dir}/epoch={epoch_id}"
        ),
        lambda: batch_bands.join(novel.select(id_col), id_col, "left_semi")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/epoch={epoch_id}"),
    )


def run_dedup_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    threshold: float = 0.8,
    max_files_per_trigger: int = 1,
):
    """Drive the ingest loop over a document file stream
    (availableNow): one micro-batch per ``max_files_per_trigger``
    files, each dedup-checked and appended via
    :func:`ingest_documents_batch`. Returns the finished query."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_documents_batch(
            spark, batch_df, epoch_id, index_dir, corpus_dir, threshold
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
