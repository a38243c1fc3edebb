"""As-of (backward) join — an operator Spark SQL lacks as a primitive.

Composed from built-ins the scalable way: tag both sides, UNION them,
sort once per key by (ts, side) inside a window, and carry the last
right-side payload forward with ``last(..., ignorenulls=True)``. One
shuffle on the key, one window sort — no range cross-join, no
per-key Python. Equal timestamps match (right row sorts before the
left probe at the same ts), i.e. the inclusive ``l.ts >= r.ts``
semantics of DuckDB's native ASOF JOIN, which serves as the oracle.

At 100 TB: partitions by the join key exactly like any groupBy; a
hot key degrades to one big sorted partition — pre-bucket by
(key, time-bucket) when a single key's history exceeds a partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join_backward"]


def _epoch_seconds(df: DataFrame, col: str) -> Column:
    """Epoch seconds as double, keeping sub-second precision.

    ``CAST(TIMESTAMP AS DOUBLE)`` gives fractional epoch seconds, but
    TIMESTAMP_NTZ refuses that cast (DATATYPE_MISMATCH) — route it
    through timestamp_ltz first (session TZ is pinned UTC, lossless).
    Numeric inputs pass through so callers may as-of join on plain
    numeric time axes too.
    """
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, T.TimestampNTZType):
        c = c.cast("timestamp")
    return c.cast("double")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance_sec: int | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right_ts <= left_ts`` for the same ``by`` key (inclusive).

    Returns the left rows plus ``payload_cols`` (null when no prior
    right row exists, or when it is older than ``tolerance_sec``).
    """
    l_tagged = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    for c in payload_cols + ["__rt"]:
        l_tagged = l_tagged.withColumn(f"__p_{c}", F.lit(None).cast(
            "double" if c == "__rt" else dict(right.dtypes).get(c, "string")
        ))
    r_tagged = right.withColumn("__t", F.col(right_ts)).withColumn("__side", F.lit(0))
    # timestamp -> double keeps sub-second precision (unix_timestamp
    # truncates to whole seconds and misjudges tolerance boundaries)
    r_tagged = r_tagged.withColumn("__p___rt", _epoch_seconds(right, right_ts))
    for c in payload_cols:
        r_tagged = r_tagged.withColumn(f"__p_{c}", F.col(c))

    lcols = [f for f in left.columns]
    keep = [by, "__t", "__side"] + [f"__p_{c}" for c in payload_cols + ["__rt"]]
    l_u = l_tagged.select(*keep, *[F.col(c).alias(f"__l_{c}") for c in lcols if c != by])
    r_u = r_tagged.select(*keep, *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}") for c in lcols if c != by])
    u = l_u.unionByName(r_u)

    w = Window.partitionBy(by).orderBy(F.col("__t").asc(), F.col("__side").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    for c in payload_cols + ["__rt"]:
        u = u.withColumn(f"__m_{c}", F.last(f"__p_{c}", ignorenulls=True).over(w))

    out = u.filter(F.col("__side") == 1)
    if tolerance_sec is not None:
        within = _epoch_seconds(out, "__t") - F.col("__m___rt") <= F.lit(tolerance_sec)
        for c in payload_cols:
            out = out.withColumn(f"__m_{c}", F.when(within, F.col(f"__m_{c}")))
    return out.select(
        F.col(by),
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c != by],
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in payload_cols],
    )
