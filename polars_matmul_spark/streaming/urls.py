"""Streaming per-domain quota on ingest — the crawl-native twin of
``urls.cap_docs_per_domain``, completing the streaming-ingest family
(minhash / bloom / winnow / CMS / excise / embeddings / assets) with
the URL leg the round-9 front-door pipeline implies: documents arrive
continuously from WARC extraction, and each domain may contribute at
most ``max_per_domain`` documents EVER, enforced at arrival time.

Semantics: ARRIVAL-ORDER quota (first-come, first-kept — the batch
operator's quality-ranked cap needs the whole corpus; a stream by
definition does not have it). Within a micro-batch, ties are broken
deterministically by ``id_col`` so replays decide identically.

Scale/state notes:

- The only state is the accepted catalog's (domain_key, count) — read
  back as ONE map-side-combinable groupBy over the slim domain column,
  never the bodies. At 100 TB persist the catalog partitioned by
  epoch (this layout) and let the count aggregate prune to the one
  column it reads.
- Writes are the repo's idempotent epoch-sink pattern (one OVERWRITTEN
  ``epoch=N`` directory per foreachBatch epoch). Crash-replay safety:
  a replayed epoch ignores its OWN half-committed rows when counting
  history, so the decision set is identical on replay.
- Domain keying is the batch operator's: ``with_registrable_domain``
  (public-suffix table optional) — pure Catalyst + broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polars_matmul_spark.operators.urls import with_registrable_domain
from polars_matmul_spark.streaming.hygiene import (
    read_or_empty as _read_or_empty,
)

__all__ = ["domain_quota_batch", "run_domain_quota_stream"]


def domain_quota_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    accepted_dir: str,
    max_per_domain: int = 1000,
    url_col: str = "url",
    id_col: str = "doc_id",
    psl: DataFrame | None = None,
) -> None:
    """Admit one micro-batch against the per-domain quota: key every
    row by registrable domain, count what the persisted catalog has
    already accepted per domain (ignoring this epoch's own rows — the
    crash-replay guard), rank the batch within each domain by
    ``id_col``, and keep rows while history + rank stays within
    ``max_per_domain``. Idempotent ``epoch=N`` overwrite-append."""
    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    # no checkpoint: the keyed batch has exactly ONE consumer (the
    # accepted plan below), so pinning it cost a full extra pass per
    # epoch for nothing — the decision is deterministic on replay
    # either way (rank orders by id_col, history prunes this epoch's
    # partition). Round 12, guide §1.2.
    batch = with_registrable_domain(
        batch_df, url_col, psl=psl, out_col="domain_key"
    )

    history = _read_or_empty(spark, accepted_dir, None)
    if history is not None and "epoch" in history.columns:
        history = history.filter(F.col("epoch") != epoch_id)
    if history is not None:
        # no emptiness probe (round 13, guide §1.2): the groupBy of an
        # empty history IS the empty counts frame, so the former
        # limit(1).count() pre-check was one full scan job per epoch
        # that changed nothing downstream
        counts = history.groupBy("domain_key").agg(
            F.count("*").alias("__hist")
        )
    else:
        counts = spark.createDataFrame([], "domain_key string, __hist long")

    w = Window.partitionBy("domain_key").orderBy(F.col(id_col).asc())
    accepted = (
        batch.withColumn("__rank", F.row_number().over(w))
        .join(F.broadcast(counts), "domain_key", "left")
        .filter(
            F.col("__rank") + F.coalesce(F.col("__hist"), F.lit(0))
            <= max_per_domain
        )
        .drop("__rank", "__hist")
    )
    accepted.write.mode("overwrite").parquet(f"{accepted_dir}/epoch={epoch_id}")


def run_domain_quota_stream(
    spark: SparkSession,
    input_dir: str,
    accepted_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, url string, text string",
    max_per_domain: int = 1000,
    psl: DataFrame | None = None,
    max_files_per_trigger: int = 1,
):
    """Drive the quota loop over a document file stream (availableNow):
    one micro-batch per ``max_files_per_trigger`` files, each admitted
    via :func:`domain_quota_batch`. Returns the finished query."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        domain_quota_batch(
            spark, batch_df, epoch_id, accepted_dir,
            max_per_domain=max_per_domain, psl=psl,
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
