"""Z-order (Morton-curve) data layout for multi-column scan pruning.

Sorting a table by one column gives perfect min/max pruning on that
column and none on any other. Interleaving the bits of several
columns' ranks (the Morton curve) gives GOOD pruning on every
participating column at once: each written file covers a small
hyper-rectangle of the key space, so a predicate on ANY z-column
skips most files on parquet row-group/file statistics alone — the
layout feature Delta/Iceberg `OPTIMIZE ZORDER BY` provides, here on
plain parquet.

Everything is pure Catalyst:

1. per-column rank -> bounded integer bucket. Ranks (not raw values)
   make the curve distribution-free: skewed or arbitrary-typed
   columns spread uniformly. `percent_rank` costs one window per
   column over the SORT of that column — at 100 TB replace with
   `approxQuantile`-derived cut points broadcast as a literal (same
   contract, sampled; the ``cuts`` parameter).
2. bit-interleave the buckets into one long (fixed expression tree of
   shifts/masks — no UDF, no loop at runtime).
3. `repartitionByRange` on the z-value (range partitioner => each
   output file owns a contiguous z-range = a compact hyper-rectangle)
   with an in-partition sort for row-group-level stats.

The pruning claim is tested from actual parquet footers: after
z-order writing, a range predicate on EITHER column must prune most
files, and strictly more than a single-column sort prunes on its
non-sort column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_value", "zorder_write", "bits_per_column"]


def bits_per_column(n_cols: int) -> int:
    """Bits per column such that the interleaved z stays within a
    SIGNED 63-bit budget (bit 63 is the sign — setting it would both
    overflow ``F.lit`` at 1<<63 and flip range ordering): 16 bits up
    to 3 columns, 15 at 4 (still 32k buckets/column — far finer than
    any realistic file count resolves)."""
    return min(16, 63 // n_cols)


def _bucket(col: Column, cuts: list[float] | None, bits: int) -> Column:
    """Rank-based bucket in [0, 2^bits): distribution-free."""
    n_buckets = 1 << bits
    if cuts is not None:
        # broadcast-literal cut points (the at-scale path): bucket =
        # count of cuts below the value, scaled into the bit range.
        # Scale AFTER multiplying (below * (n_buckets-1)) / len(cuts):
        # the old integer pre-division (n_buckets-1)//len(cuts) hit 0
        # whenever len(cuts) >= n_buckets, silently dropping the column
        # from the z-order (every row -> bucket 0), and floor-wasted
        # resolution for smaller cut lists.
        if not cuts:
            raise ValueError("cuts must be a non-empty list of cut points")
        if len(cuts) >= n_buckets:
            raise ValueError(
                f"len(cuts)={len(cuts)} must be < n_buckets={n_buckets} "
                f"({bits} bits/column): more cuts than buckets cannot be "
                "represented — pass fewer quantiles or fewer z-columns"
            )
        arr = F.array(*[F.lit(float(c)) for c in cuts])
        below = F.size(F.filter(arr, lambda c: c <= col.cast("double")))
        return ((below * (n_buckets - 1)) / F.lit(len(cuts))).cast("long")
    from pyspark.sql import Window

    pr = F.percent_rank().over(Window.orderBy(col))
    return F.least(
        (pr * n_buckets).cast("long"), F.lit(n_buckets - 1).cast("long")
    )


def z_value(buckets: list[Column]) -> Column:
    """Morton interleave of per-column bucket ints (each <
    2^bits_per_column(n)) into one long: bit j of column i lands at
    position j * n_cols + i. Fixed expression tree — no loops at
    runtime. Highest used bit is bits*n - 1 <= 62, so z is always a
    non-negative long and range-partitions correctly."""
    n = len(buckets)
    if not (1 <= n <= 4):
        raise ValueError(f"z-order supports 1..4 columns, got {n}")
    bits = bits_per_column(n)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, b in enumerate(buckets):
            bit = F.shiftright(b.cast("long"), j).bitwiseAND(F.lit(1))
            z = z + (bit * F.lit(1 << (j * n + i)).cast("long"))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    cuts: dict[str, list[float]] | None = None,
) -> None:
    """Write ``df`` as ``n_files`` parquet files z-ordered on ``cols``.

    ``cuts``: optional per-column pre-computed cut points (e.g. from
    ``df.approxQuantile``) — the 100 TB path that avoids the global
    per-column rank windows. Without it, exact percent_rank windows
    are used (fine up to the scale where a global sort per column is
    acceptable; the windows run sequentially but each is one sort of
    a single column).
    """
    bits = bits_per_column(len(cols))
    buckets = [
        _bucket(F.col(c), (cuts or {}).get(c), bits).alias(f"__b_{i}")
        for i, c in enumerate(cols)
    ]
    withb = df.select("*", *buckets)
    z = z_value([F.col(f"__b_{i}") for i in range(len(cols))]).alias("__z")
    zdf = withb.select("*", z).drop(*[f"__b_{i}" for i in range(len(cols))])
    (
        zdf.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
