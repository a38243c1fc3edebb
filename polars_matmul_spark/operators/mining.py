"""Contrastive-pair mining for embedding-model training data.

Training a retrieval/embedding model needs (query, positive,
negatives) triples where the negatives are HARD — near the query in
the current embedding space but not labeled positive (random negatives
are too easy and stop teaching after the first epochs). That is a
top-k similarity search with an exclusion set — a composition of the
repo's search surface:

- ``hard_negatives``: k most-similar corpus items per query that are
  not in the positive set. Search via the SQL-exact blocked top-k
  (operators/similarity_join.py) with the search depth widened by the
  per-query positive count, then a broadcast anti-join against the
  positive pairs and a re-rank down to k. The positive table is
  training labels — tiny by nature — so exclusion never shuffles the
  corpus.
- ``in_batch_negatives``: the cheap baseline — deterministic
  md5-bucketed batch assignment (sampling.hash_bucket) so each
  query's negatives are the OTHER queries' positives in its batch,
  reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_matmul_spark.operators.sampling import hash_bucket
from polars_matmul_spark.operators.similarity_join import topk_join_exact

__all__ = ["hard_negatives", "in_batch_negatives"]


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    positives: DataFrame,
    k: int = 5,
    metric: str = "cosine",
    q_id: str = "query_id",
    c_id: str = "corpus_id",
    q_emb: str = "q_emb",
    c_emb: str = "c_emb",
    search_depth: int | None = None,
) -> DataFrame:
    """(query_id, rank, corpus_id, score): the k nearest non-positive
    corpus items per query. ``positives`` is (query_id, corpus_id).

    ``search_depth`` defaults to k + the LARGEST per-query positive
    count (so exclusion can never leave a query short); pass a smaller
    depth to trade completeness for speed on huge positive sets.
    """
    if search_depth is None:
        counts = positives.groupBy(q_id).agg(F.count("*").alias("c"))
        row = counts.agg(F.max("c")).collect()[0][0]
        search_depth = k + int(row or 0)
    short = topk_join_exact(
        queries, corpus, q_id, c_id, q_emb, c_emb, k=search_depth, metric=metric
    )
    # positives are labels — broadcast; LEFT ANTI on the pair
    pruned = short.join(
        F.broadcast(positives.select(q_id, c_id)), [q_id, c_id], "left_anti"
    )
    order = (
        [F.desc("score"), F.asc(c_id)]
        if metric in ("cosine", "dot")
        else [F.asc("score"), F.asc(c_id)]
    )
    w = Window.partitionBy(q_id).orderBy(*order)
    return (
        pruned.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .select(q_id, F.col("__r").alias("rank"), c_id, "score")
    )


def in_batch_negatives(
    pairs: DataFrame,
    n_batches: int,
    q_id: str = "query_id",
    c_id: str = "corpus_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic in-batch negative assignment: each (query,
    positive) pair lands in batch md5(query_id) mod n_batches; within
    a batch, every OTHER pair's positive is this query's negative.
    Returns (batch_id, query_id, corpus_id, neg_corpus_id) — one row
    per (pair, negative). Reproducible across runs, partitionings and
    engines (the md5 contract of sampling.hash_bucket).

    One shuffle on batch_id; batch sizes are ~|pairs|/n_batches, so
    the within-batch join is quadratic only in the (caller-chosen)
    batch size — the standard contrastive-training shape.
    """
    if n_batches <= 0:
        raise ValueError(f"n_batches must be positive, got {n_batches}")
    b = pairs.withColumn(
        "batch_id", hash_bucket(F.col(q_id), salt) % n_batches
    ).select("batch_id", q_id, c_id)
    other = b.select(
        "batch_id",
        F.col(q_id).alias("__oq"),
        F.col(c_id).alias("neg_corpus_id"),
    )
    return (
        b.join(other, "batch_id")
        .filter(F.col(q_id) != F.col("__oq"))
        .select("batch_id", q_id, c_id, "neg_corpus_id")
    )
