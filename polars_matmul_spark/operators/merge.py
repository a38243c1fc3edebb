"""CDC merge and SCD2 history — MERGE INTO emulated on plain parquet.

Spark's SQL ``MERGE INTO`` needs a transactional table format (Delta/
Iceberg), whose jars are not on this classpath. The same semantics
compose from built-ins — the guide-book emulation (anti-join + union
+ window), shaped for scale:

- ``merge_upsert``: one hash join on the key (AQE broadcasts the
  changes side when it fits — the common CDC case: small delta, huge
  target), one union. No window, no global sort.
- ``scd2_apply``: slowly-changing-dimension type 2 — closing the
  current version of changed keys and appending the new version, with
  ``valid_from``/``valid_to`` columns. The only window runs per key
  over version history, which is bounded (versions per key), not
  corpus-sized.

Both are deterministic (no timestamps generated inside — the caller
supplies the change timestamp), so they are DuckDB-oracle testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "scd2_apply", "scd2_current"]


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str | None = None,
) -> DataFrame:
    """MERGE semantics: rows of ``changes`` replace same-key rows of
    ``target``; unmatched change rows are inserts. Schemas must match.

    A batch may carry at most one row per key — enforced, because two
    same-key rows have no defined winner. Pass ``seq_col`` to instead
    apply documented last-wins: per key, the change row with the
    highest ``seq_col`` value is applied and the rest are dropped
    (deterministic; ties broken by the remaining columns descending).

    Keys are matched null-safely (``<=>``): a NULL key in changes
    replaces the NULL-key target row rather than inserting a duplicate.

    Plan: target LEFT ANTI changes (drop rows being replaced) UNION ALL
    changes. One shuffle (or broadcast) on the key; linear in
    |target| + |changes|. The optional last-wins dedup is one extra
    partial-aggregatable ``max(struct(...))`` over the (small) changes
    side only.
    """
    missing = [c for c in target.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")
    if seq_col is not None:
        if seq_col not in changes.columns:
            raise ValueError(f"seq_col {seq_col!r} not in changes")
        # last-wins: max(struct(seq, payload...)) per key is map-side
        # combinable — no window, no global sort over the batch.
        payload = [c for c in changes.columns if c not in key_cols]
        ordered = [seq_col] + [c for c in payload if c != seq_col]
        changes = (
            changes.groupBy(*key_cols)
            .agg(F.max(F.struct(*ordered)).alias("__w"))
            .select(*key_cols, *[F.col(f"__w.{c}").alias(c) for c in payload])
        )
    else:
        dup = (
            changes.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "changes batch has multiple rows for one key; pass seq_col "
                "for last-wins semantics"
            )
    cond = None
    for k in key_cols:
        c = target[k].eqNullSafe(changes[k])
        cond = c if cond is None else cond & c
    kept = target.join(changes.select(*key_cols).distinct(), cond, "left_anti")
    return kept.unionByName(changes.select(*target.columns))


def _differs(a: Column, b: Column) -> Column:
    # null-safe inequality: a change to/from NULL is still a change
    return ~a.eqNullSafe(b)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    change_ts_col: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Apply one batch of changes to an SCD2 dimension.

    ``dim`` carries (key_cols, attribute cols, valid_from, valid_to)
    with ``valid_to IS NULL`` marking current rows. ``changes`` carries
    (key_cols, attribute cols, change_ts_col). For each change row:

    - same key, attributes differ (null-safely) from the CURRENT row →
      close the current row (``valid_to = change_ts``) and append the
      new version (``valid_from = change_ts``, ``valid_to = NULL``);
    - same key, attributes identical → no-op (idempotent re-delivery);
    - new key → insert as first version.

    History rows (``valid_to`` already set) are untouched. One batch
    may contain at most one change row per key (the usual CDC compact
    contract) — enforced, because "two versions in one batch" has no
    well-defined SCD2 answer without intra-batch ordering.
    """
    compare_cols = compare_cols or [
        c
        for c in changes.columns
        if c not in set(key_cols) | {change_ts_col}
    ]
    dup = (
        changes.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError("changes batch has multiple rows for one key")

    cur = dim.filter(F.col("valid_to").isNull())
    hist = dim.filter(F.col("valid_to").isNotNull())

    chg = changes.select(
        *key_cols,
        *[F.col(c).alias(f"__new_{c}") for c in compare_cols],
        F.col(change_ts_col).alias("__chg_ts"),
    )
    # Explicit presence marker: valid_from nullability is NOT a safe
    # proxy — initial-load SCD2 rows legitimately carry NULL valid_from
    # and must still count as "current row existed".
    joined = cur.withColumn("__had_cur", F.lit(True)).join(
        chg, key_cols, "full_outer"
    )
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | _differs(F.col(c), F.col(f"__new_{c}"))
    has_change = F.col("__chg_ts").isNotNull()
    had_current = F.col("__had_cur").isNotNull()

    # current rows: closed if a differing change arrived, else kept
    kept_current = joined.filter(had_current).select(
        *key_cols,
        *compare_cols,
        "valid_from",
        F.when(has_change & differs, F.col("__chg_ts")).alias("valid_to"),
    )
    # new versions: differing change on existing key, or brand-new key
    new_versions = joined.filter(
        has_change & (differs | ~had_current)
    ).select(
        *key_cols,
        *[F.col(f"__new_{c}").alias(c) for c in compare_cols],
        F.col("__chg_ts").alias("valid_from"),
        F.lit(None).cast(dict(dim.dtypes)["valid_to"]).alias("valid_to"),
    )
    out_cols = key_cols + compare_cols + ["valid_from", "valid_to"]
    return (
        hist.select(*out_cols)
        .unionByName(kept_current.select(*out_cols))
        .unionByName(new_versions.select(*out_cols))
    )


def scd2_current(dim: DataFrame) -> DataFrame:
    """The current snapshot of an SCD2 dimension."""
    return dim.filter(F.col("valid_to").isNull()).drop("valid_to")
