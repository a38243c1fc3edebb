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

from polars_matmul_spark.operators.linededup import (
    build_line_cms,
    strip_frequent_lines_cms,
)
from polars_matmul_spark.streaming.hygiene import (
    hygiene_ingest_batch,
    run_hygiene_stream,
)

__all__ = ["cms_strip_ingest_batch", "run_cms_strip_stream"]


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
    batch's own sketch and its cleaned docs to their epoch dirs (the
    shared hygiene protocol — see ``streaming/hygiene.py``)."""
    hygiene_ingest_batch(
        spark,
        batch_df,
        epoch_id,
        cms_dir,
        out_dir,
        build_fn=lambda b: build_line_cms(
            b, width, depth, id_col=id_col, text_col=text_col
        ),
        clean_fn=lambda b, cms: strip_frequent_lines_cms(
            b, cms, width, depth, min_docs=min_docs
        ),
        id_col=id_col,
        text_col=text_col,
    )


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

    return run_hygiene_stream(
        spark,
        input_dir,
        checkpoint_dir,
        process,
        schema=schema,
        max_files_per_trigger=max_files_per_trigger,
    )
