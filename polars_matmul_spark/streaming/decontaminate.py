"""Streaming benchmark decontamination on ingest — the eval-overlap
gate (``text_filters.tag_contaminated``) applied as documents arrive,
completing the streaming-ingest family (minhash / bloom / winnow / CMS
/ excise / embeddings / assets / URL quota) with the hygiene leg a
training pipeline runs continuously: eval sets land as probe files,
and every arriving document is admitted or flagged against the probe
catalog KNOWN AT ITS ARRIVAL EPOCH.

Semantics: arrival-time decisions. A document admitted before a probe
set lands stays admitted (the retroactive sweep is the batch operator
over the accepted corpus — one anti-join); a document arriving after
sees the grown catalog. This mirrors production: ingest-time
decontamination uses the eval sets you have, retro sweeps are batch
jobs.

Scale/state notes:

- There is NO evolving operator state: the decision joins the arriving
  batch's exploded n-grams against the probe-gram table — which is
  small by nature (benchmarks are KBs) and BROADCAST. The corpus side
  never shuffles; per-epoch cost is one scan of the batch.
- Probe catalog = a parquet directory re-read each epoch (cheap — KB
  scale), so newly landed eval sets take effect on the NEXT
  micro-batch with no restart.
- Writes are the repo's idempotent epoch-sink pattern (one overwritten
  ``epoch=N`` directory per foreachBatch epoch, for BOTH the clean and
  the flagged sink). Replay recomputes the same stateless decision, so
  crash-replay is trivially idempotent as long as the probe catalog is
  append-only (the contract probes-as-files gives for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_matmul_spark.operators.text_filters import tag_contaminated
from polars_matmul_spark.streaming.hygiene import (
    read_or_empty as _read_or_empty,
)

__all__ = ["decontaminate_ingest_batch", "run_decontaminate_stream"]

_PROBE_SCHEMA = "probe_id long, text string"


def decontaminate_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    probes_dir: str,
    clean_dir: str,
    flagged_dir: str,
    n: int = 8,
    hash_fn: str = "xxhash64",
) -> None:
    """Admit one micro-batch: tag docs sharing any word ``n``-gram with
    the CURRENT probe catalog, route clean rows to ``clean_dir`` and
    flagged rows (with hit counts + probe attributions) to
    ``flagged_dir`` — both as idempotent ``epoch=N`` overwrites."""
    # lazy pin (round 12): the batch feeds the flagged tagging AND the
    # clean anti-join; the pin materializes inside the first write's
    # job instead of paying its own pass (nothing in the batch's
    # lineage reads the dirs this epoch writes)
    batch = batch_df.localCheckpoint(eager=False)
    probes = _read_or_empty(spark, probes_dir, _PROBE_SCHEMA)

    if probes.limit(1).count() == 0:
        flagged = spark.createDataFrame(
            [], "doc_id long, n_hits long, probe_ids array<long>"
        )
    else:
        # lazy pin (round 13): flagged feeds BOTH sinks (the flagged
        # write and the clean anti-join), so the probe-gram tagging
        # join used to run twice per epoch; the pin materializes
        # inside the first consuming write's job
        flagged = tag_contaminated(
            batch, probes, n=n, hash_fn=hash_fn
        ).localCheckpoint(eager=False)
    clean = batch.join(flagged.select("doc_id"), "doc_id", "left_anti")
    flagged_out = flagged.select(
        "doc_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        F.array_join(F.col("probe_ids").cast("array<string>"), ":").alias(
            "probe_ids"
        ),
    )
    # independent sinks over the pinned batch/flagged frames: overlap
    # (round 13, guide §2.6); both complete before the stage returns
    from polars_matmul_spark.streaming.hygiene import commit_epoch_writes

    commit_epoch_writes(
        lambda: clean.write.mode("overwrite").parquet(
            f"{clean_dir}/epoch={epoch_id}"
        ),
        lambda: flagged_out.write.mode("overwrite").parquet(
            f"{flagged_dir}/epoch={epoch_id}"
        ),
    )


def run_decontaminate_stream(
    spark: SparkSession,
    input_dir: str,
    probes_dir: str,
    clean_dir: str,
    flagged_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    n: int = 8,
    hash_fn: str = "xxhash64",
    max_files_per_trigger: int = 1,
):
    """Drive the decontamination loop over a document file stream
    (availableNow): each micro-batch is admitted against the probe
    catalog as it exists at that epoch. Returns the finished query."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        decontaminate_ingest_batch(
            spark, batch_df, epoch_id, probes_dir, clean_dir, flagged_dir,
            n=n, hash_fn=hash_fn,
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
