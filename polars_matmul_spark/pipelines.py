"""End-to-end training-corpus preparation: the operators composed.

One call chains the hygiene/dedup/sampling/packing family the way a
production pipeline would:

    scan -> quality + repetition filter -> PII redaction
         -> exact dedup -> MinHash near-dup -> connected components
         -> canonical keep -> deterministic train/val split
         -> sequence packing (train split)

Each stage is the scale-shaped operator documented in its module; the
composition adds nothing imperative — it is one lazy DataFrame plan up
to the iterative components step, then two short plans after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_matmul_spark.operators.dedup import keep_canonical, neardup_pairs_minhash
from polars_matmul_spark.operators.packing import pack_sequences
from polars_matmul_spark.operators.sampling import hash_split
from polars_matmul_spark.operators.text import quality_score, token_count
from polars_matmul_spark.operators.text_filters import redact_pii, repetition_score
from polars_matmul_spark.sources.tables import load_table

__all__ = ["prepare_training_corpus"]


def prepare_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    min_quality: float = 0.3,
    max_repetition: float = 0.3,
    neardup_threshold: float = 0.8,
    split_fractions: dict[str, float] | None = None,
    pack_budget: int = 512,
) -> dict[str, DataFrame]:
    """Returns {"corpus": kept+split docs, "packed": train-split bins,
    "stats": one-row funnel counts}.

    The funnel row (docs_in / after_filter / after_dedup / packed_bins)
    is the pipeline observability a 100 TB run needs — each count is an
    aggregate over an already-computed stage, not an extra scan.
    """
    split_fractions = split_fractions or {"train": 0.9, "val": 0.1}
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    n_in = docs.count()

    # --- hygiene: quality floor, repetition ceiling, PII scrub ---
    scored = docs.withColumn("quality", quality_score(F.col("text")))
    rep = repetition_score(docs)  # (doc_id, n_grams, top_gram_ratio)
    filtered = (
        scored.join(rep.select("doc_id", "top_gram_ratio"), "doc_id")
        .filter((F.col("quality") >= min_quality) & (F.col("top_gram_ratio") <= max_repetition))
        .select("doc_id", redact_pii(F.col("text")).alias("text"))
    )
    # the dedup stages below traverse `filtered` multiple times (shingle
    # postings + verify + join-back); cache the filtered slice once
    filtered = filtered.cache()
    n_filtered = filtered.count()

    # --- dedup: near-dup pairs -> duplicate groups -> canonical docs ---
    pairs = neardup_pairs_minhash(filtered, threshold=neardup_threshold)
    kept = keep_canonical(filtered, pairs)  # adds group_size
    n_kept = kept.count()

    # --- deterministic split, then pack the train split ---
    corpus = hash_split(kept, "doc_id", split_fractions)
    train = corpus.filter(F.col("split") == "train").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(train, pack_budget, partitions=8)

    stats = spark.createDataFrame(
        [(n_in, n_filtered, n_kept)],
        "docs_in long, after_filter long, after_dedup long",
    ).withColumn("packed_bins", F.lit(packed.select("bin_id").distinct().count()))
    return {"corpus": corpus, "packed": packed, "stats": stats}
