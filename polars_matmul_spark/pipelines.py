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
from polars_matmul_spark.operators.text_filters import redact_pii, repetition_expr
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
    # both signals are row-local expressions, so the whole hygiene
    # stage is ONE scan-speed filter — repetition_expr replaced the
    # explode+agg+join-back form that shuffled (doc, gram) rows twice
    # and moved the text a third time for the join
    filtered = (
        docs.withColumn("quality", quality_score(F.col("text")))
        .withColumn("__rep", repetition_expr(F.col("text")))
        .filter(
            (F.col("quality") >= min_quality)
            & (F.col("__rep.top_gram_ratio") <= max_repetition)
        )
        .select("doc_id", redact_pii(F.col("text")).alias("text"))
    )
    # the dedup stages below traverse `filtered` multiple times (shingle
    # postings + verify + join-back); cache the filtered slice once
    filtered = filtered.cache()
    n_filtered = filtered.count()

    # --- dedup: near-dup pairs -> duplicate groups -> canonical docs ---
    # kept is the fan-out point: the funnel count, the split/corpus
    # output AND the packing input all traverse it. Cache it once —
    # uncached, each downstream force re-ran the canonical-keep joins
    # (the pair search itself is already materialized exactly once by
    # dedup_groups' eager checkpoint)
    pairs = neardup_pairs_minhash(filtered, threshold=neardup_threshold)
    kept = keep_canonical(filtered, pairs).cache()  # adds group_size
    n_kept = kept.count()

    # --- deterministic split, then pack the train split ---
    corpus = hash_split(kept, "doc_id", split_fractions)
    train = corpus.filter(F.col("split") == "train").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(train, pack_budget, partitions=8)

    # the bin count joins in LAZILY: an eager .count() here would run
    # the whole packing stage at construction time and again when the
    # caller forces `packed` — observability must not double the work
    stats = spark.createDataFrame(
        [(n_in, n_filtered, n_kept)],
        "docs_in long, after_filter long, after_dedup long",
    ).crossJoin(packed.agg(F.count_distinct("bin_id").alias("packed_bins")))
    return {"corpus": corpus, "packed": packed, "stats": stats}


def curate_and_export(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    target_lang: str = "en",
    select_k: int = 300,
    min_logit: float = -0.5,
    tokens_per_shard: int = 20_000,
    quality_weights: list[float] | None = None,
    gopher_min_words: int | None = None,
) -> DataFrame:
    """The round-4 curation flow, composed end to end (round 5 adds
    the heuristic-rule front gate):

        scan -> Gopher quality rules (optional front gate)
             -> line-level dedup (boilerplate strip)
             -> learned quality floor (hashed-token linear scorer)
             -> exact dedup via the Bloom two-gate
             -> DSIR selection toward the target-language slice
             -> token-budget shards written to ``out_dir``

    Returns the selected, shard-assigned corpus (also persisted).
    Every stage is the scale-shaped operator from its module; the
    composition stays one lazy plan up to the two LM ``collect``s
    (n_buckets doubles each) and the final write.

    ``gopher_min_words``: when set, documents failing the Gopher rule
    set (operators/text_filters.py::gopher_quality with that word
    floor) drop before any dedup work — the standard
    rules-before-dedup ordering (cheap scan-speed predicates shrink
    the corpus the expensive stages see). ``None`` skips the gate.
    """
    from polars_matmul_spark.operators.bloom import (
        bloom_dedup_new_batch,
        bloom_params,
        build_bloom,
    )
    from polars_matmul_spark.operators.dsir import dsir_select
    from polars_matmul_spark.operators.linededup import strip_frequent_lines
    from polars_matmul_spark.operators.quality_model import linear_quality_score
    from polars_matmul_spark.operators.shards import assign_token_shards
    from polars_matmul_spark.operators.text import fingerprint

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "text")

    # 0. optional Gopher front gate: scan-speed rule predicates drop
    # low-quality docs before any dedup stage pays for them
    if gopher_min_words is not None:
        from polars_matmul_spark.operators.text_filters import gopher_quality

        ok = gopher_quality(docs, min_words=gopher_min_words).filter(
            F.col("gopher_ok")
        )
        docs = docs.join(ok.select("doc_id"), "doc_id", "left_semi")

    # 1. boilerplate strip (docs emptied by the strip drop out with the
    # quality floor below — their logit is sigmoid-centered at bias)
    stripped = strip_frequent_lines(docs, min_docs=3).join(
        docs.select("doc_id", "lang"), "doc_id"
    )

    # 2. learned quality floor (dyadic weights default: deterministic;
    # logit form — monotone in the sigmoid — same rule as the registry
    # row)
    from polars_matmul_spark.operators.quality_model import (
        dyadic_weights,
        linear_quality_logit,
    )

    w = quality_weights or dyadic_weights(64)
    scored = stripped.withColumn(
        "q_logit", linear_quality_logit(F.col("text"), w)
    ).filter(F.col("q_logit") >= min_logit)

    # 3. exact dedup, two-gate: history = even ids, new = odd ids (the
    # incremental contract; a from-scratch run can pass any split).
    # Each side first collapses WITHIN itself (lowest id per
    # fingerprint — the streaming-ingest rule): the two-gate check is
    # new-vs-history only, so same-side duplicates would otherwise
    # both survive.
    from pyspark.sql import Window

    fps = scored.withColumn("fp", fingerprint(F.col("text")))
    wfp = Window.partitionBy("fp").orderBy(F.asc("doc_id"))

    def _collapse(side):
        return (
            side.withColumn("__rn", F.row_number().over(wfp))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    hist = _collapse(fps.filter(F.col("doc_id") % 2 == 0))
    new = _collapse(fps.filter(F.col("doc_id") % 2 == 1))
    m_bits, kh = bloom_params(100_000, 0.01)
    bloom = build_bloom(hist, "fp", m_bits, kh)
    deduped = hist.unionByName(
        bloom_dedup_new_batch(new, bloom, hist, "fp", m_bits, kh)
    )

    # 4. DSIR toward the target slice
    target = deduped.filter(F.col("lang") == target_lang)
    selected = dsir_select(deduped, target, k=select_k)

    # 5. shard and export
    from polars_matmul_spark.operators.text import token_count

    sharded = assign_token_shards(
        selected.withColumn("n_tokens", token_count(F.col("text"))),
        tokens_per_shard=tokens_per_shard,
    )
    (
        sharded.repartition(F.col("shard_id"))
        .sortWithinPartitions("__order", "doc_id")
        .drop("__order")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    return sharded
