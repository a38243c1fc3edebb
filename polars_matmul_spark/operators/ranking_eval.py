"""Retrieval-quality evaluation: MRR, recall@k, precision@k, nDCG@k,
AP@k (MAP).

The measurement loop every retrieval / hybrid-search / dedup-tuning
pipeline runs: given a RUN (per-query ranked candidates) and QRELS
(graded relevance judgments), score each query and the macro average.
Standard definitions (TREC):

- reciprocal rank: 1/rank of the first relevant (rel > 0) hit, 0 if
  none in the top-k;
- recall@k: |relevant in top-k| / |relevant|;
- precision@k: |relevant in top-k| / k;
- nDCG@k (Jarvelin & Kekalainen 2002, the (2^rel - 1) gain form):
  DCG@k / IDCG@k, where DCG = sum over retrieved positions of
  (2^rel - 1) / log2(pos + 1) and IDCG is the same sum over the
  query's relevance grades sorted descending (truncated at k);
- AP@k (the trec_eval convention, macro mean = MAP): sum over
  RELEVANT retrieved ranks r <= k of (relevant-in-top-r / r),
  divided by the query's TOTAL relevant count — the denominator is
  all judged-relevant docs, not min(k, R), so truncation genuinely
  costs score.

Float discipline (the repo's oracle-parity rule): every sum that
reaches the output folds SEQUENTIALLY in a pinned order —
``aggregate(transform(sort_array(collect_list(...))))`` over rank
order for DCG, grade-descending for IDCG, query-id order for the
macro averages — which DuckDB replays with ``list_reduce(list(...
ORDER BY ...))``. Outputs round to 9 dp.

100 TB shape: one equi-join of the run against qrels on
(query, doc) — qrels are benchmark-sized, BROADCAST — then two
partial-aggregable group-bys (per query, then the 1-row macro). The
run is never shuffled wider than its own (query, rank) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ranking_metrics", "macro_metrics"]


def _fold_sum(sorted_vals: Column) -> Column:
    """Sequential f64 fold over an already-ordered array<double>."""
    return F.aggregate(
        sorted_vals, F.lit(0.0).cast("double"), lambda s, x: s + x
    )


def ranking_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    score_dp: int = 9,
) -> DataFrame:
    """Per-query metrics: (query_col, n_retrieved, n_relevant, rr,
    recall_at_k, precision_at_k, ndcg_at_k, ap_at_k).

    ``run`` carries one row per retrieved candidate with a 1-based
    ``rank_col`` (ranks > k are ignored). ``qrels`` carries graded
    judgments; rel > 0 means relevant. Queries present in qrels but
    retrieving nothing still get a row (all-zero metrics) — silently
    dropping them would inflate every macro average.

    Preconditions: ranks are unique within a query (a run IS a
    ranking; duplicated ranks make the DCG fold order depend on the
    tie) and qrels carry one judgment per (query, doc) — duplicate
    judgments would double-join hits.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    run_k = run.filter(F.col(rank_col) <= k).select(
        query_col, doc_col, F.col(rank_col).cast("long").alias("__rank")
    )
    qr = qrels.select(
        query_col, doc_col, F.col(rel_col).cast("long").alias("__rel")
    )

    # per-query relevant counts + IDCG from the grade multiset. Grouped
    # over ALL distinct qrels query ids — rel>0 filtering happens
    # INSIDE the aggregates (collect_list skips the when()'s nulls), so
    # a query whose judgments are all rel=0 and that retrieves nothing
    # still gets its promised all-zero row instead of silently
    # shrinking macro_metrics' denominator (round-10 ADVICE fix).
    per_q_rel = qr.groupBy(query_col).agg(
        F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_relevant"),
        # IDCG@k: grades sorted DESCENDING, positions 1..k — fold over
        # the (-rel) sort so the order is pinned without a reverse()
        _fold_sum(
            F.transform(
                F.slice(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("__rel") > 0,
                                F.struct((-F.col("__rel")).alias("nr")),
                            )
                        )
                    ),
                    1,
                    k,
                ),
                lambda s, i: (F.pow(F.lit(2.0), -s["nr"]) - F.lit(1.0))
                / F.log2(i.cast("double") + F.lit(2.0)),
            )
        ).alias("__idcg"),
    )

    hits = run_k.join(F.broadcast(qr), [query_col, doc_col], "left").select(
        query_col,
        "__rank",
        F.coalesce(F.col("__rel"), F.lit(0)).alias("__rel"),
    )
    # AP@k needs relevant-in-top-r at each relevant rank r: a rank-
    # ordered cumulative count within the query (the run is already
    # cut to <= k rows per query, so this window is candidate-list
    # sized, never corpus-sized)
    wcum = (
        Window.partitionBy(query_col)
        .orderBy(F.col("__rank").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hits = hits.withColumn(
        "__cum", F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0)).over(wcum)
    )
    per_q_run = hits.groupBy(query_col).agg(
        F.count("*").alias("n_retrieved"),
        F.min(F.when(F.col("__rel") > 0, F.col("__rank"))).alias("__first"),
        F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0)).alias("__n_hits"),
        # DCG@k folds in ascending rank order
        _fold_sum(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__rank", "__rel"))),
                lambda s: (F.pow(F.lit(2.0), s["__rel"]) - F.lit(1.0))
                / F.log2(s["__rank"].cast("double") + F.lit(1.0)),
            )
        ).alias("__dcg"),
        # AP numerator: sum over relevant ranks of cum/r, folded in
        # ascending rank (collect_list skips the when()'s nulls at
        # non-relevant ranks)
        _fold_sum(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("__rel") > 0,
                            F.struct(
                                "__rank",
                                (
                                    F.col("__cum").cast("double")
                                    / F.col("__rank")
                                ).alias("__pr"),
                            ),
                        )
                    )
                ),
                lambda s: s["__pr"],
            )
        ).alias("__ap_num"),
    )

    joined = per_q_rel.join(per_q_run, query_col, "full")
    return joined.select(
        query_col,
        F.coalesce(F.col("n_retrieved"), F.lit(0)).cast("long").alias("n_retrieved"),
        F.coalesce(F.col("n_relevant"), F.lit(0)).cast("long").alias("n_relevant"),
        F.round(
            F.when(
                F.col("__first").isNotNull(), F.lit(1.0) / F.col("__first")
            ).otherwise(F.lit(0.0)),
            score_dp,
        ).alias("rr"),
        F.round(
            F.when(
                F.coalesce(F.col("n_relevant"), F.lit(0)) > 0,
                F.coalesce(F.col("__n_hits"), F.lit(0))
                / F.col("n_relevant").cast("double"),
            ).otherwise(F.lit(0.0)),
            score_dp,
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(F.col("__n_hits"), F.lit(0)) / F.lit(float(k)), score_dp
        ).alias("precision_at_k"),
        F.round(
            F.when(
                F.coalesce(F.col("__idcg"), F.lit(0.0)) > 0.0,
                F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.col("__idcg"),
            ).otherwise(F.lit(0.0)),
            score_dp,
        ).alias("ndcg_at_k"),
        F.round(
            F.when(
                F.coalesce(F.col("n_relevant"), F.lit(0)) > 0,
                F.coalesce(F.col("__ap_num"), F.lit(0.0))
                / F.col("n_relevant").cast("double"),
            ).otherwise(F.lit(0.0)),
            score_dp,
        ).alias("ap_at_k"),
    )


def macro_metrics(
    per_query: DataFrame,
    query_col: str = "query_id",
    score_dp: int = 9,
) -> DataFrame:
    """One macro row: arithmetic mean of each per-query metric, summed
    in query-id order (pinned fold) over exact per-query values."""
    metrics = ["rr", "recall_at_k", "precision_at_k", "ndcg_at_k", "ap_at_k"]

    def _field(name):
        # single-parameter lambda (a two-parameter one would be read as
        # the (element, index) form by F.transform)
        return lambda s: s[name]

    aggs = [F.count("*").alias("n_queries")]
    for m in metrics:
        aggs.append(
            F.round(
                F.aggregate(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct(query_col, m))
                        ),
                        _field(m),
                    ),
                    F.lit(0.0).cast("double"),
                    lambda s, x: s + x,
                )
                / F.count("*"),
                score_dp,
            ).alias(f"mean_{m}")
        )
    return per_query.agg(*aggs)
