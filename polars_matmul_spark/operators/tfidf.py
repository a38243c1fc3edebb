"""Corpus term-weighting: TF-IDF, Okapi BM25 scoring, vocabulary
building — the `ml.feature`-free, oracle-checkable forms (SURVEY §7.3
step 7's text-analysis item).

All pure Catalyst (explode + groupBy + join): no Python in the hot
path, so at 100 TB these run as ordinary shuffled aggregations.

Scale shape:

- ``tf_idf``: one explode (map-side), one (doc_id, term) partial agg,
  one term-keyed agg for document frequency, one term-keyed join.
  Hot terms ("the") skew the term-keyed stages; AQE skew-join handles
  the join and the df agg is a partial-agg count (map-side combine
  bounds the skew to one reducer holding one hot term's partials).
- ``bm25_score``: the corpus is exploded then immediately
  broadcast-joined against the (tiny) probe term list, so only rows
  matching query terms ever reach a shuffle — the TB-scale corpus is
  never shuffled in full. Doc length is computed scan-side; the
  average-doc-length scalar joins back via a 1-row broadcast.
- ``build_vocab``: term counts (partial agg) then a distributed
  TakeOrdered top-V (orderBy+limit — no global window over the full
  term set); ranks are assigned on the bounded V-row result.

Term model: whitespace tokens of lowercased text (``text.tokens``),
empty tokens dropped. Formulas (documented so the DuckDB oracle in
``tests/test_tfidf.py`` can reproduce them bit-for-bit in double
arithmetic):

- smooth idf (sklearn-style): ``ln((1 + N) / (1 + df)) + 1``
- tf-idf: ``tf * idf`` (raw counts, no normalization; callers can L2-
  normalize per doc with one more windowless agg+join if needed)
- BM25 idf: ``ln(1 + (N - df + 0.5) / (df + 0.5))``
- BM25: ``idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))``
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_matmul_spark.operators.text import tokens

__all__ = [
    "doc_terms",
    "tf_idf",
    "bm25_score",
    "bm25_score_multi",
    "build_vocab",
    "oov_rate",
    "unigram_logprob",
]


def doc_terms(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per (doc_id, term) occurrence: lowercased whitespace
    tokens, empties dropped. The shared explode for everything below."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")


def _n_docs(df: DataFrame, id_col: str) -> DataFrame:
    """1-row (n_docs) frame for broadcast join-back (keeps the plan
    lazy — no driver collect)."""
    return df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))


def tf_idf(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-(doc, term) TF-IDF weights: (doc_id, term, tf, tf_idf).

    tf is the raw in-doc count; idf is the smooth form
    ``ln((1+N)/(1+df)) + 1`` (never zero, no div-by-zero for unseen
    terms). The term-keyed join is skew-prone on stopword-class terms
    — AQE splits those reducers; the df side is one row per term so it
    broadcasts whenever the vocabulary fits (Spark decides via AQE
    runtime stats).
    """
    terms = doc_terms(df, id_col, text_col)
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = _n_docs(df, id_col)
    return (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            (
                F.col("tf").cast("double")
                * (
                    F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
                    + F.lit(1.0)
                )
            ).alias("tf_idf"),
        )
    )


def bm25_score(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a bag of query terms:
    (doc_id, bm25) — docs matching no query term are omitted.

    The probe list is broadcast; the exploded corpus filters against it
    before any shuffle, so only matching (doc, term) rows aggregate.
    Document length rides along from the scan (no separate pass), and
    the avgdl scalar is a 1-row broadcast join — the full corpus is
    scanned once and never fully shuffled.
    """
    spark = df.sparkSession
    probe = spark.createDataFrame([(t.lower(),) for t in query_terms], "term string")

    # dl counts NON-EMPTY tokens (a whitespace-only doc tokenizes to
    # [""], which must count as length 0, matching the oracle)
    nonempty = F.filter(
        tokens(F.lower(F.col(text_col))), lambda t: t != F.lit("")
    )
    with_len = df.select(
        F.col(id_col).alias("doc_id"), nonempty.alias("toks")
    ).select(
        "doc_id",
        F.explode("toks").alias("term"),
        F.size("toks").cast("double").alias("dl"),
    )

    hits = with_len.join(F.broadcast(probe), "term")
    tf = hits.groupBy("doc_id", "term", "dl").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))

    # scalars: corpus size and average doc length over ALL docs
    # (including non-matching ones), per Okapi
    n = _n_docs(df, id_col)
    avgdl = df.select(nonempty.alias("t")).select(
        F.size("t").cast("double").alias("dl")
    ).agg(F.avg("dl").alias("avgdl"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    per_term = (idf * tf_d * F.lit(k1 + 1.0) / denom).alias("w")

    return (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(avgdl))
        .select("doc_id", per_term)
        .groupBy("doc_id")
        .agg(F.sum("w").alias("bm25"))
    )


def bm25_score_multi(
    df: DataFrame,
    queries: dict[int, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """:func:`bm25_score` for MANY query bags in ONE corpus pass:
    (query_id, doc_id, bm25), docs matching none of a query's terms
    omitted for that query — value-identical per query to running
    :func:`bm25_score` once per bag (pinned in tests/test_tfidf.py).

    Why it exists (round-12, guide §2.3/§2.4): a hybrid-search row
    scoring Q query bags as Q independent ``bm25_score`` calls
    tokenizes and scans the corpus ~3 Q times — the probe term list is
    the ONLY thing that differs between legs. Tagging the probe table
    with ``query_id`` turns the per-leg scans into one tokenize pass
    for the hits, one tokenize pass for the corpus-wide scalars
    (n_docs and avgdl fused into a single aggregate scan), and
    per-(query, doc, term) aggregation downstream of the same
    broadcast-probe filter — the corpus is still never shuffled in
    full, and adding query bags now costs rows in a broadcast, not
    corpus scans.
    """
    spark = df.sparkSession
    probe = spark.createDataFrame(
        [
            (int(qid), t.lower())
            for qid, terms in queries.items()
            for t in terms
        ],
        "query_id long, term string",
    )

    nonempty = F.filter(
        tokens(F.lower(F.col(text_col))), lambda t: t != F.lit("")
    )
    with_len = df.select(
        F.col(id_col).alias("doc_id"), nonempty.alias("toks")
    ).select(
        "doc_id",
        F.explode("toks").alias("term"),
        F.size("toks").cast("double").alias("dl"),
    )

    hits = with_len.join(F.broadcast(probe), "term")
    tf = hits.groupBy("query_id", "doc_id", "term", "dl").agg(
        F.count("*").alias("tf")
    )
    df_t = tf.groupBy("query_id", "term").agg(F.count("*").alias("df"))

    # corpus-wide scalars (same values as bm25_score's separate
    # _n_docs + avgdl passes, one scan): count_distinct(doc_id) and
    # avg(dl) over one row per input row
    stats = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(nonempty).cast("double").alias("dl"),
    ).agg(
        F.count_distinct(F.col("doc_id")).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    per_term = (idf * tf_d * F.lit(k1 + 1.0) / denom).alias("w")

    return (
        tf.join(F.broadcast(df_t), ["query_id", "term"])
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", per_term)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("bm25"))
    )


# orderBy+limit plans as TakeOrderedAndProject for ANY limit below
# spark.sql.execution.topKSortFallbackThreshold (default ~Int.Max in
# Spark 4), and TakeOrdered's per-task top-k buffer (Guava leastOf)
# allocates 2*k OBJECT SLOTS up front REGARDLESS of input size —
# limit(10**9) is a ~16 GB zeroed allocation per task even over a
# 31-term vocabulary (measured round 12: G1 humongous-allocation
# storms, safepoint-unreachable zeroing, a dead driver JVM). Above
# this cap the top-V is planned as rank-then-filter instead: the
# window's group-limit execution counts rows, allocating nothing.
_TAKE_ORDERED_CAP = 1_000_000


def build_vocab(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_size: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Top-``max_size`` terms by corpus frequency: (term, count, rank).

    Deterministic: ties break on term ASC. For ``max_size`` up to
    ``_TAKE_ORDERED_CAP`` the top-V select is orderBy+limit (Spark's
    distributed TakeOrdered — per-partition top-V then a driver merge
    of V-row partials, NO global window over the unbounded term set);
    row_number runs only on the bounded V-row result. Beyond the cap
    (an "effectively whole vocabulary" request — TakeOrdered would
    allocate O(max_size) per task, see ``_TAKE_ORDERED_CAP``) the
    SAME rows come from ranking the full term set and filtering
    ``rank <= max_size``: (count DESC, term ASC) is a TOTAL order
    (term is unique), so row_number is deterministic and the two
    formulations are value-identical by construction.
    """
    from pyspark.sql import Window

    counts = (
        doc_terms(df, id_col, text_col)
        .groupBy("term")
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= min_count)
    )
    w = Window.orderBy(F.col("count").desc(), F.col("term").asc())
    if max_size > _TAKE_ORDERED_CAP:
        ranked = counts.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        return ranked.filter(F.col("rank") <= max_size)
    top = counts.orderBy(F.col("count").desc(), F.col("term").asc()).limit(max_size)
    # bounded at max_size rows — the unpartitioned window is safe here
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document out-of-vocabulary token rate: (doc_id, n_tokens,
    n_oov, oov_rate). Vocab broadcasts (bounded by ``max_size``); the
    corpus explode left-joins it map-side — no corpus shuffle before
    the per-doc agg."""
    terms = doc_terms(df, id_col, text_col)
    joined = terms.join(
        F.broadcast(vocab.select("term", F.lit(True).alias("in_vocab"))),
        "term",
        "left",
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        )
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style unigram language-model score: per document, the mean
    log-probability of its tokens under the CORPUS unigram
    distribution -> (doc_id, n_tokens, mean_logprob). Unusually high
    scores mark repetitive/templated text, unusually low ones mark
    noise — the standard cheap proxy where a real LM is unavailable.

    Plan: the unigram table is one term-keyed partial agg; per-doc
    scoring is the same explode joined back to it (term-keyed join,
    AQE-skew-handled, broadcast when the vocab fits). Smoothing-free by
    construction: every scored token exists in the corpus counts, so
    probabilities are never zero.

    Fully deterministic given the corpus (ln rounded by callers when an
    engine-parity comparison is needed).
    """
    terms = doc_terms(df, id_col, text_col)
    counts = terms.groupBy("term").agg(F.count("*").alias("cnt"))
    total = terms.agg(F.count("*").alias("total"))
    scored = (
        terms.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (F.log(F.col("cnt").cast("double")) - F.log(F.col("total").cast("double"))).alias(
                "lp"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.avg("lp").alias("mean_logprob"),
    )
