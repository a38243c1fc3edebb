"""Streaming SUBSTRING dedup-on-ingest with a persisted winnow index.

The fourth modality of the dedup-on-ingest family — MinHash shingle
near-dup (``streaming/ingest.py``), IVF embedding near-dup
(``streaming/embeddings.py``), Bloom exact (``streaming/
bloom_ingest.py``), and now winnowing substring overlap: a batch whose
docs merely EMBED a long verbatim span already in the corpus (quoted
paragraph, license boilerplate, copied code) has low set-Jaccard and a
different exact fingerprint, yet is exactly what substring dedup
rejects. Each micro-batch:

1. fingerprint row-locally (``winnow_fp_values`` — no shuffle) and
   collapse WITHIN the batch: any doc sharing >= ``min_shared``
   selected fingerprints with a lower-id batch doc drops (lowest id
   wins, the family's deterministic rule);
2. check survivors against the MERGED persisted index
   (:func:`operators.winnow.winnow_new_vs_index`): the batch's small
   (id, fp) table broadcasts, the index is scanned in place — never
   shuffled. A replayed batch finding its OWN fingerprints in a
   half-committed epoch is un-rejected by the self-id guard
   (``old_id != new_id``), same rule as every sibling;
3. idempotent epoch writes: accepted docs to ``corpus_dir/epoch=N``
   and their fingerprint rows to ``index_dir/epoch=N`` — crash-replay
   overwrites itself.

Scale notes: the index grows ~2/(window+1) of the text's char count
in 16-byte rows; ``max_hash_docs`` (applied per epoch at build time)
bounds every posting list before it is written, so boilerplate spans
can never make one fingerprint's posting list quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_matmul_spark.operators.winnow import (
    build_winnow_index,
    winnow_dup_pairs,
    winnow_new_vs_index,
)

__all__ = ["winnow_ingest_batch", "run_winnow_ingest_stream"]


from polars_matmul_spark.streaming.hygiene import (
    read_or_empty as _read_or_empty,
)


def winnow_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    index_dir: str,
    corpus_dir: str,
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_hash_docs: int | None | str = "auto",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Accept the substring-novel subset of one micro-batch; append
    docs to ``corpus_dir/epoch=N`` and their fingerprint index rows to
    ``index_dir/epoch=N``. ``max_hash_docs`` default "auto" derives
    the per-fingerprint doc-frequency cap from the batch size
    (operators/winnow.py::winnow_hash_cap); None opts out. The cap is
    resolved ONCE here and threaded into BOTH the within-batch
    collapse and the index build — one count job per batch, and an
    explicit value (or the None opt-out) reaches every stage."""
    from polars_matmul_spark.operators.winnow import winnow_hash_cap

    batch = batch_df.localCheckpoint(eager=True)
    if max_hash_docs == "auto":
        max_hash_docs = winnow_hash_cap(batch.count())

    # 1. within-batch collapse, chains included: connected components
    # over the overlap pairs, lowest id of each cluster survives —
    # keep_canonical, the family's exact rule (same call as the
    # MinHash ingest)
    from polars_matmul_spark.operators.dedup import keep_canonical

    pairs = winnow_dup_pairs(
        batch, k, window, min_shared, text_col, id_col, max_hash_docs
    )
    if pairs.limit(1).count() > 0:
        batch = keep_canonical(batch, pairs, id_col=id_col).drop("group_size")

    # 2. vs-index check with the crash-replay self-id guard
    index = _read_or_empty(spark, index_dir, f"{id_col} long, fp long")
    if index.limit(1).count() > 0:
        hits = winnow_new_vs_index(
            batch, index, k, window, min_shared, text_col, id_col
        ).filter(F.col("new_id") != F.col("old_id"))
        dup_ids = hits.select(F.col("new_id").alias(id_col)).distinct()
        batch = batch.join(F.broadcast(dup_ids), id_col, "left_anti")

    novel = batch.localCheckpoint(eager=True)

    # 3. idempotent epoch writes
    novel.write.mode("overwrite").parquet(f"{corpus_dir}/epoch={epoch_id}")
    build_winnow_index(
        novel, k, window, text_col, id_col, max_hash_docs
    ).write.mode("overwrite").parquet(f"{index_dir}/epoch={epoch_id}")


def run_winnow_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_files_per_trigger: int = 1,
):
    """Drive the substring-dedup ingest loop over a document file
    stream (availableNow); returns the finished query."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        winnow_ingest_batch(
            spark,
            batch_df,
            epoch_id,
            index_dir,
            corpus_dir,
            k,
            window,
            min_shared,
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
