"""Range join — point-in-interval equi-join acceleration.

A naive ``l.x BETWEEN r.lo AND r.hi`` join is a BroadcastNestedLoop
(or worse, cartesian) — O(n*m) comparisons. The bucketed form maps
each interval to the integer buckets it overlaps (explode) and each
point to its bucket, turning the range predicate into an equi-join on
the bucket plus a residual filter. Comparisons drop to
O(n + m * avg_buckets_per_interval + candidates); both sides shuffle
by bucket, so it scales like any hash join at 100 TB.

Intervals are treated as CLOSED on both ends ([lo, hi]).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_bucketed"]


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` via integer bucketing on ``bucket_width``.

    Pick ``bucket_width`` near the typical interval length: too small
    explodes the interval side, too large inflates candidates.
    """
    p = points.withColumn(
        "__pbucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    iv = intervals.withColumn(
        "__ibucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    # the range predicate lives IN the join condition: a post-join
    # filter would silently turn outer joins into inner ones (unmatched
    # rows carry null lo/hi and fail the filter)
    cond = (
        (F.col("__pbucket") == F.col("__ibucket"))
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col))
    )
    return p.join(iv, cond, how).drop("__pbucket", "__ibucket")
