"""Skew and balance diagnostics — know a hot key BEFORE the join dies.

At 100 TB the difference between a 20-minute and a 6-hour job is
usually one key owning a percent of the rows (a null join key, a bot
user_id, an empty-string document). These operators are the cheap
probes a pipeline runs on a sample or a full table before picking a
join strategy (broadcast / salted / AQE-skew):

- ``key_skew_report``: per-key row counts for the heaviest ``top_n``
  keys, each annotated with its share of all rows and its ratio over
  the mean key load. One map-side-combinable groupBy (the only
  shuffle carries (key, partial_count)); the global totals ride along
  via a 1-row broadcast join, and top-n is a TakeOrdered — no global
  sort.
- ``partition_balance``: per-partition row counts folded to one
  summary row (n_partitions, min/max/avg rows, coefficient of
  variation, max/avg imbalance). ``spark_partition_id()`` is evaluated
  before any exchange, so this measures the df's CURRENT layout — run
  it after the repartition/bucketing you intend to ship.

The salting twins that consume these diagnostics live in
:mod:`polars_matmul_spark.operators.skew`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["key_skew_report", "partition_balance"]


def key_skew_report(df: DataFrame, keys: list[str], top_n: int = 20) -> DataFrame:
    """Top-``top_n`` heaviest keys with share-of-total and skew ratio.

    Output columns: the key columns, ``n_rows`` (exact count),
    ``share`` (n_rows / total rows), ``skew_ratio`` (n_rows / mean
    rows per distinct key; 1.0 == perfectly uniform). A key with
    ``skew_ratio`` in the hundreds is a salting / AQE-skew candidate.

    NULL keys group together (Spark groupBy semantics) — deliberately,
    since a null-heavy join key is the most common real-world skew.
    """
    if not keys:
        raise ValueError("key_skew_report needs at least one key column")
    counts = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.avg("n_rows").alias("__mean"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows") / F.col("__total")).alias("share"),
            (F.col("n_rows") / F.col("__mean")).alias("skew_ratio"),
        )
        .orderBy(F.desc("n_rows"), *keys)
        .limit(top_n)
    )


def partition_balance(df: DataFrame) -> DataFrame:
    """One summary row describing how evenly ``df``'s rows are spread
    over its partitions right now.

    Columns: ``n_partitions`` (non-empty), ``total_rows``,
    ``min_rows`` / ``max_rows`` / ``avg_rows``, ``cv`` (stddev/mean;
    0 == perfectly even), ``imbalance`` (max/avg; the straggler
    multiplier — a task holding 8x the average rows finishes ~8x
    late). Empty partitions don't emit rows and are therefore not
    counted; for straggler analysis that is the conservative choice
    (an empty partition can't be the straggler).
    """
    per_part = df.select(
        F.spark_partition_id().alias("__pid")
    ).groupBy("__pid").agg(F.count(F.lit(1)).alias("n"))
    return per_part.agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.sum("n").alias("total_rows"),
        F.min("n").alias("min_rows"),
        F.max("n").alias("max_rows"),
        F.avg("n").alias("avg_rows"),
        (F.coalesce(F.stddev_pop("n"), F.lit(0.0)) / F.avg("n")).alias("cv"),
        (F.max("n") / F.avg("n")).alias("imbalance"),
    )
