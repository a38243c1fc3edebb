"""Skew mitigation primitives for hot-key workloads.

AQE's skew-join handling (enabled in plans.session) covers moderate
skew at runtime; these are the explicit forms for the pathological
cases a 100 TB pipeline hits (one user_id owning 1% of all events, a
stopword shingle in every document):

- ``salted_agg``: two-phase aggregation — partial groupBy on
  (key, salt) spreads one hot key over ``n_salt`` reducers, then a
  cheap merge groupBy on the key. Only merge-associative aggregates
  (count/sum/min/max) are offered; results are identical to the
  unsalted form (the registry query proves it against a plain-SQL
  oracle).
- ``salted_join``: replicate the small side ``n_salt`` times, salt the
  large side deterministically (hash-mod of its key + a row
  discriminator), join on (key, salt) — each hot key's rows spread
  across ``n_salt`` tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join"]

_MERGE = {
    "count": ("count", F.count, F.sum),
    "sum": ("sum", F.sum, F.sum),
    "min": ("min", F.min, F.min),
    "max": ("max", F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salt: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``aggs`` maps output column -> (kind, input column) with kind in
    count/sum/min/max. ``salt_on`` picks the salt (default: a
    deterministic hash of the whole row via xxhash64 of the key cols
    plus input cols — uniform enough to split a hot key).
    """
    for kind, _ in aggs.values():
        if kind not in _MERGE:
            raise ValueError(f"Unsupported salted aggregate '{kind}'. Supported: {', '.join(_MERGE)}")
    if salt_on is None:
        salt_on = F.xxhash64(*[F.col(k) for k in keys], *[c for _, c in aggs.values()])
    salted = df.withColumn("__salt", F.pmod(salt_on, F.lit(n_salt)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_MERGE[kind][1](col).alias(out) for out, (kind, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[kind][2](out).alias(out) for out, (kind, _col) in aggs.items()]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
    discriminator: Column | None = None,
) -> DataFrame:
    """Equi-join where ``large`` has hot keys: replicate ``small``
    ``n_salt`` times, salt ``large`` rows deterministically, join on
    (key, salt). Row-for-row identical to ``large.join(small, on, how)``.
    """
    if discriminator is None:
        discriminator = F.xxhash64(*[F.col(c) for c in large.columns])
    l_salted = large.withColumn("__salt", F.pmod(discriminator, F.lit(n_salt)))
    s_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    out = l_salted.join(s_salted, [on, "__salt"], how)
    return out.drop("__salt")
