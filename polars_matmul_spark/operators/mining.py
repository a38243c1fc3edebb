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

    By default every query searches at depth ``k + ITS OWN positive
    count`` (the per-query count joined into the window limit — no
    driver scalar, no collect): exclusion can never leave a query
    short, and one query with 10k labeled positives no longer widens
    every OTHER query's retained candidate set to 10k+k. Pass an
    explicit ``search_depth`` to force one fixed depth for all queries
    (e.g. to cap work on adversarial positive sets — queries whose
    positive count exceeds the cap may then return fewer than k rows).
    """
    from polars_matmul_spark import kernels as K
    from polars_matmul_spark.operators.similarity_join import (
        similarity_join_exact,
    )

    scored = similarity_join_exact(
        queries, corpus, q_col=q_emb, c_col=c_emb, metric=metric
    )
    c_id_eff = f"c_{c_id}" if c_id in queries.columns else c_id
    higher = K.higher_is_better(K._canonical_metric(metric))
    sdir = (
        [F.desc("score"), F.asc(c_id_eff)]
        if higher
        else [F.asc("score"), F.asc(c_id_eff)]
    )
    sw = Window.partitionBy(q_id).orderBy(*sdir)
    ranked = scored.withColumn("__sr", F.row_number().over(sw))
    if search_depth is None:
        counts = positives.groupBy(q_id).agg(F.count("*").alias("__pos_n"))
        ranked = ranked.join(F.broadcast(counts), q_id, "left")
        depth = F.lit(k) + F.coalesce(F.col("__pos_n"), F.lit(0))
    else:
        depth = F.lit(int(search_depth))
    short = (
        ranked.filter(F.col("__sr") <= depth)
        .drop("__sr", "__pos_n")
        .withColumnRenamed(c_id_eff, c_id)
    )
    # positives are labels — broadcast; LEFT ANTI on the pair
    pruned = short.join(
        F.broadcast(positives.select(q_id, c_id)), [q_id, c_id], "left_anti"
    )
    order = (
        [F.desc("score"), F.asc(c_id)]
        if higher
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
