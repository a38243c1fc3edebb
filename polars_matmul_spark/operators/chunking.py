"""Context-window chunking: split documents into overlapping
fixed-token-budget chunks — the step between corpus prep and sequence
packing in a training-data pipeline (long docs must be windowed before
``operators.packing`` bins them).

Pure Catalyst: tokenize once, explode a chunk-index sequence, slice the
token array per chunk. No Python in the path; at 100 TB this is a
scan-speed map (the explode multiplies rows ~n_tokens/stride x, which
is the inherent output size, not overhead).

Chunk model (documented for the DuckDB oracle in
``tests/test_chunking.py``): whitespace tokens; chunk ``i`` covers
tokens ``[i*stride, i*stride + chunk_tokens)`` with
``stride = chunk_tokens - overlap``; the last chunk may be short;
``n_chunks = max(1, ceil((n_tokens - overlap) / stride))`` so every
token lands in >=1 chunk and no chunk starts past the end. Documents
with zero tokens yield no rows.

Plan-shape note: the token array crosses a Generate (explode) boundary
before the per-chunk ``slice``, so the slice reads an attribute, not an
inlined re-evaluation of ``split()`` — the same Catalyst pitfall
``text.shingles`` documents (nested lambdas re-evaluate inlined
expressions per element).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_matmul_spark.operators.text import tokens

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, chunk_id, n_chunks, chunk_start, n_chunk_tokens,
    chunk_text), one row per chunk.

    ``chunk_start`` is the 0-based token offset; ``chunk_text`` re-joins
    the chunk's tokens with single spaces (tokenization-normalized, as
    a training pipeline wants).
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    # whitespace-only text would tokenize to [""] (size 1), so the
    # zero-token filter runs on the trimmed text, not the array size
    base = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
        .withColumn("n", F.size("toks"))
    )
    with_counts = base.withColumn(
        "n_chunks",
        F.greatest(
            F.lit(1), F.ceil((F.col("n") - F.lit(overlap)) / F.lit(stride))
        ).cast("long"),
    )
    # Generate boundary: one row per chunk BEFORE slicing, so the slice
    # below references the materialized token-array attribute
    per_chunk = with_counts.select(
        "doc_id",
        "toks",
        "n",
        "n_chunks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("toks"), F.col("chunk_id").cast("int") * stride + 1, chunk_tokens
    )
    return per_chunk.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "n_chunks",
        (F.col("chunk_id") * stride).cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
