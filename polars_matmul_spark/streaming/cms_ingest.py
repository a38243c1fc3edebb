"""Streaming boilerplate-strip-on-ingest with a persisted Count-Min sketch.

The hygiene sibling of the dedup-on-ingest family (``ingest.py``
MinHash, ``embeddings.py`` IVF, ``bloom_ingest.py`` Bloom,
``winnow_ingest.py`` winnowing): instead of REJECTING duplicate
documents, each micro-batch is CLEANED — lines whose estimated
distinct-doc frequency (across all history plus this batch) reaches
``min_docs`` are stripped before the batch lands, the CCNet rule
applied at the door.

Why a CMS and not the exact frequent-line set: the exact state is
every line hash ever seen (unbounded); the sketch is ``depth x width``
counters forever, merged by summing — the only frequency state a
never-ending stream can afford. The one-sided error strips every truly
frequent line (recall 1.0) and over-strips a rare line only on a
counter collision (see ``operators/cms.py``).

Epoch idempotence, the family's standard contract: epoch N's line
counts live ONLY in ``cms_dir/epoch=N`` (its per-batch sketch), and a
crash-replayed batch OVERWRITES that directory — counters are never
double-added, because merge-on-read sums one sketch per epoch. The
cleaned output overwrites ``out_dir/epoch=N`` the same way.

Known-by-design: a line only becomes strippable once enough history
has seen it — epochs ingested BEFORE the threshold crossing keep it
(re-strip history offline with ``strip_frequent_lines_cms`` against
the final sketch if retroactive cleaning matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_matmul_spark.operators.cms import merge_cms
from polars_matmul_spark.operators.linededup import (
    build_line_cms,
    strip_frequent_lines_cms,
)

__all__ = ["cms_strip_ingest_batch", "run_cms_strip_stream"]

_CMS_SCHEMA = "row long, col long, n long"


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        condition = getattr(e, "getCondition", lambda: None)() or ""
        if "PATH_NOT_FOUND" in condition or "Path does not exist" in str(e):
            return spark.createDataFrame([], schema)
        raise


def cms_strip_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    cms_dir: str,
    out_dir: str,
    width: int = 8192,
    depth: int = 5,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Clean one micro-batch against history + itself, then commit the
    batch's own sketch and its cleaned docs to their epoch dirs."""
    batch = batch_df.localCheckpoint(eager=True)

    # this batch's sketch FIRST (distinct-per-doc line hashes), so the
    # strip sees history + current — a line ubiquitous within one
    # batch is boilerplate on arrival, not only in hindsight
    own = build_line_cms(
        batch, width, depth, id_col=id_col, text_col=text_col
    ).localCheckpoint(eager=True)

    # merge-on-read: one sketch per PRIOR epoch (this epoch's counts
    # enter via `own`, never via a previously half-committed write —
    # the crash-replay guard; `epoch` appears as a partition column
    # once any epoch dir exists)
    prior = _read_or_empty(spark, cms_dir, _CMS_SCHEMA)
    if "epoch" in prior.columns:
        prior = prior.filter(F.col("epoch") != epoch_id).select("row", "col", "n")
    # unconditional merge: union+sum over an empty prior IS own's
    # counters — a non-empty guard would cost an extra job per batch
    merged = merge_cms(prior, own)

    cleaned = strip_frequent_lines_cms(
        batch.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        merged,
        width,
        depth,
        min_docs=min_docs,
    )

    # idempotent epoch commits
    own.write.mode("overwrite").parquet(f"{cms_dir}/epoch={epoch_id}")
    cleaned.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")


def run_cms_strip_stream(
    spark: SparkSession,
    input_dir: str,
    cms_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    width: int = 8192,
    depth: int = 5,
    min_docs: int = 3,
    max_files_per_trigger: int = 1,
):
    """Drive the strip-on-ingest loop over a document file stream
    (availableNow); returns the finished query."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        cms_strip_ingest_batch(
            spark,
            batch_df,
            epoch_id,
            cms_dir,
            out_dir,
            width=width,
            depth=depth,
            min_docs=min_docs,
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
