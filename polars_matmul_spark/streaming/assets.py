"""Streaming asset triage-on-ingest: each arriving micro-batch of raw
binary assets is probed + decoded (``multimodal.triage_assets``) and
exact-deduplicated by payload SHA-256 against everything already
cataloged, then appended to the persisted asset catalog — the
continuous form of the round-8 asset pipeline (expand -> probe ->
decode -> catalog), completing the streaming-twin story for the
multimodal layer the way ``ingest.py`` does for documents.

Scale/semantics notes:

- Triage is STATELESS per asset (header walks + decodes, no shuffle),
  so the streaming form adds only the dedup state: the catalog's
  (payload_sha) set, touched via a left-anti join — the batch side is
  micro-batch-sized, the catalog is scanned in place and never
  shuffled (the slim sha column is all that the join reads; at 100 TB
  persist the catalog bucketed by sha so the anti-join is bucket-local).
- Writes are the repo's idempotent epoch-sink pattern (one OVERWRITTEN
  ``epoch=N`` subdirectory per foreachBatch epoch). Crash-replay
  safety: a replayed epoch would find its OWN half-committed rows in
  the catalog and reject everything — so the dedup ignores catalog
  rows from the current epoch (the partition column the epoch-dir
  layout provides).
- The batch is pinned with ``localCheckpoint`` before any write so the
  accept set is decided once against the pre-batch catalog state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_matmul_spark.operators.multimodal import triage_assets
from polars_matmul_spark.streaming.hygiene import (
    read_or_empty as _read_or_empty,
)

__all__ = ["triage_assets_batch", "run_asset_triage_stream"]


def triage_assets_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    catalog_dir: str,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> None:
    """Catalog the novel assets of one micro-batch: payload-sha exact
    dedup vs the persisted catalog, triage (probe + decode stats), and
    an idempotent ``epoch=N`` overwrite-append."""
    batch = batch_df.localCheckpoint(eager=True)
    hashed = batch.withColumn("payload_sha", F.sha2(F.col(payload_col), 256))
    # within-batch exact dups collapse first (deterministic: min id wins)
    win = hashed.groupBy("payload_sha").agg(F.min(id_col).alias(id_col))
    hashed = hashed.join(win, [id_col, "payload_sha"])

    catalog = _read_or_empty(spark, catalog_dir, None)
    if catalog is not None and catalog.limit(1).count() > 0:
        seen = catalog.select("payload_sha")
        if "epoch" in catalog.columns:  # replay safety: ignore own epoch
            seen = catalog.filter(F.col("epoch") != epoch_id).select(
                "payload_sha"
            )
        hashed = hashed.join(seen, "payload_sha", "left_anti")

    novel = hashed.localCheckpoint(eager=True)
    out = triage_assets(novel, id_col, payload_col).join(
        novel.select(id_col, "payload_sha"), id_col
    )
    out.write.mode("overwrite").parquet(f"{catalog_dir}/epoch={epoch_id}")


def run_asset_triage_stream(
    spark: SparkSession,
    input_dir: str,
    catalog_dir: str,
    checkpoint_dir: str,
    schema: str = "asset_id long, payload binary",
    max_files_per_trigger: int = 1,
):
    """Drive the asset-catalog loop over a binary-asset file stream
    (availableNow): one micro-batch per ``max_files_per_trigger``
    files, each triaged + deduped + appended via
    :func:`triage_assets_batch`. Returns the finished query."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        triage_assets_batch(spark, batch_df, epoch_id, catalog_dir)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
