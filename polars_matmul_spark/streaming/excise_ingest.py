"""Streaming span-excision-on-ingest with a persisted gram Count-Min sketch.

The sixth modality of the ingest family — and the second HYGIENE one
(``cms_ingest.py`` strips duplicated LINES; this strips duplicated
SUBSTRINGS): each micro-batch has every cross-document verbatim span
of length >= ``k`` — duplicated across all history plus this batch —
cut out before the batch lands. The Lee-et-al exact-substring-dedup
policy applied at the door, in strip-everywhere mode (span ownership
needs per-gram owner ids, which bounded sketch state cannot store; a
canonical-copy pass belongs in the offline batch path,
``winnow.excise_duplicate_spans``).

Why a CMS and not the exact gram-frequency table: the exact state is
every k-gram hash ever seen — O(corpus bytes), unbounded on a stream;
the sketch is ``depth x width`` counters forever, merged by summing.
The one-sided error excises every truly duplicated span (recall 1.0)
and over-cuts only on a counter collision (see ``operators/cms.py``).

Epoch idempotence, the family's standard contract: epoch N's gram
counts live ONLY in ``cms_dir/epoch=N`` (its per-batch sketch), and a
crash-replayed batch OVERWRITES that directory — counters are never
double-added, because merge-on-read sums one sketch per epoch. The
cleaned output overwrites ``out_dir/epoch=N`` the same way.

Known-by-design: a span only becomes excisable once enough history has
seen it — epochs ingested BEFORE the threshold crossing keep their
copy (re-excise history offline with ``excise_duplicate_spans_cms``
against the final sketch if retroactive cleaning matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_matmul_spark.operators.winnow import (
    build_gram_cms,
    excise_duplicate_spans_cms,
)
from polars_matmul_spark.streaming.hygiene import (
    hygiene_ingest_batch,
    run_hygiene_stream,
)

__all__ = ["excise_ingest_batch", "run_excise_stream"]


def excise_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    cms_dir: str,
    out_dir: str,
    k: int = 20,
    width: int = 65536,
    depth: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Excise one micro-batch against history + itself, then commit
    the batch's own gram sketch and its cleaned docs to their epoch
    dirs (the shared hygiene protocol — see ``streaming/hygiene.py``).

    The batch's k-gram hash arrays are computed ONCE (checkpointed,
    canonical column names) and shared between the sketch build and
    the clean pass via the operators' ``grams=`` parameter — the md5
    per char position is the dominant per-batch cost, and each epoch
    used to pay it twice."""
    from polars_matmul_spark.operators.winnow import gram_arrays

    cell: dict = {}

    def _grams(b: DataFrame) -> DataFrame:
        if "g" not in cell:
            canon = b.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
            )
            cell["g"] = gram_arrays(canon, k).localCheckpoint(eager=False)
        return cell["g"]

    hygiene_ingest_batch(
        spark,
        batch_df,
        epoch_id,
        cms_dir,
        out_dir,
        build_fn=lambda b: build_gram_cms(
            b.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
            ),
            k,
            width,
            depth,
            grams=_grams(b),
        ),
        # the protocol builds ``own`` before it cleans, so the cache is
        # always populated here (KeyError = protocol order changed)
        clean_fn=lambda b, cms: excise_duplicate_spans_cms(
            b,
            cms,
            k=k,
            width=width,
            depth=depth,
            min_docs=min_docs,
            grams=cell["g"],
        ),
        id_col=id_col,
        text_col=text_col,
    )


def run_excise_stream(
    spark: SparkSession,
    input_dir: str,
    cms_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    k: int = 20,
    width: int = 65536,
    depth: int = 5,
    min_docs: int = 2,
    max_files_per_trigger: int = 1,
):
    """Drive the excise-on-ingest loop over a document file stream
    (availableNow); returns the finished query."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        excise_ingest_batch(
            spark,
            batch_df,
            epoch_id,
            cms_dir,
            out_dir,
            k=k,
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
