"""Sketch-based approximate aggregates — the 100 TB summary layer.

Exact distinct counts and percentiles need a full shuffle of the key
space; sketches bound both memory and shuffle at a fixed size per
group, mergeable across partitions (map-side combine) and across days
(union of serialized sketches). Spark 4 ships Apache DataSketches HLL
natively; quantiles use approx_percentile.

Approximate results cannot hash-match an exact oracle, so the registry
entries are rows-only; the pytest gate bounds the relative error vs the
exact answer instead (HLL lgK=12 -> ~1.6% standard error).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_distinct", "hll_merge_sketches", "quantile_summary"]


def hll_distinct(df: DataFrame, keys: list[str], col: str, lg_k: int = 12) -> DataFrame:
    """Per-group approximate distinct count via a DataSketches HLL
    sketch (fixed 2^lg_k registers per group, mergeable)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col(col), F.lit(lg_k))).alias(
            "approx_distinct"
        )
    )


def hll_merge_sketches(df: DataFrame, keys: list[str], col: str, lg_k: int = 12):
    """The two-level pattern a partitioned warehouse uses: per-partition
    sketches persisted as binary, merged later with hll_union_agg.
    Returns (sketch_df, merge_fn) so callers can store the sketches."""
    sketches = df.groupBy(*keys, F.spark_partition_id().alias("__pid")).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sketch")
    )

    def merged(sketch_df: DataFrame) -> DataFrame:
        return sketch_df.groupBy(*keys).agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
                "approx_distinct"
            )
        )

    return sketches, merged


def quantile_summary(
    df: DataFrame, keys: list[str], col: str, quantiles=(0.5, 0.95, 0.99)
) -> DataFrame:
    """Per-group approximate quantiles (Greenwald-Khanna style
    approx_percentile, bounded-memory, mergeable)."""
    q = F.percentile_approx(
        F.col(col), F.array(*[F.lit(x) for x in quantiles]), F.lit(10000)
    )
    out = df.groupBy(*keys).agg(q.alias("__qs"))
    return out.select(
        *keys,
        *[F.col("__qs")[i].alias(f"p{int(x * 100)}") for i, x in enumerate(quantiles)],
    )
