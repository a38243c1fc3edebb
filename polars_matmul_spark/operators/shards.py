"""Training-data export: deterministic global shuffle + token-budget
shard assignment + partitioned write.

The last mile of a corpus pipeline: the cleaned, deduped, selected
documents must land on disk (a) in a DETERMINISTIC pseudorandom order
(training wants shuffled data, reproducibility wants the same shuffle
every run), (b) cut into shards of roughly equal TOKEN count (loader
work-balance is measured in tokens, not rows or bytes).

The global order is md5(id) — the same engine-portable mechanism as
sampling.hash_split, so the order (and therefore every shard's exact
contents) replays in any engine.

Shard assignment needs a global running token total — a prefix sum —
which a naive ``Window.orderBy(...)`` computes on ONE partition (the
classic single-reducer trap; Spark even warns). The scalable shape is
the textbook two-phase scan:

1. bucket = first 2 hex chars of md5(id) -> 256 buckets. Bucket order
   concatenated = global md5 order, because the bucket IS the hash
   prefix.
2. within-bucket prefix sums: Window.partitionBy(bucket) — 256
   bounded partitions, parallel.
3. per-bucket totals -> 256-row table -> driver-side running offsets
   -> broadcast join back. The only global structure that ever exists
   is 256 longs.

global_start(row) = bucket_offset + within_bucket_prefix; shard_id =
floor(global_start / budget). At 1000 executors the window partitions
are ~corpus/256 — raise ``n_buckets`` (any power of 16 via more hex
chars) to keep them executor-sized; the offsets table stays tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_token_shards", "write_token_shards"]


def assign_token_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    tokens_per_shard: int = 1_000_000,
    salt: str = "",
    hex_chars: int = 2,
) -> DataFrame:
    """Adds (__order, shard_start, shard_id): the md5 global-shuffle
    order key, the document's global token start offset, and its shard.

    A document is assigned to the shard its FIRST token falls in, so
    shards can exceed the budget by at most one document — the
    standard greedy cut that never splits a document.
    """
    if tokens_per_shard <= 0:
        raise ValueError(f"tokens_per_shard must be positive, got {tokens_per_shard}")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    keyed = df.withColumn("__order", h).withColumn(
        "__bucket", F.conv(F.substring("__order", 1, hex_chars), 16, 10).cast("long")
    )
    # phase 2: within-bucket exclusive prefix sum (bounded partitions)
    w = (
        Window.partitionBy("__bucket")
        .orderBy(F.asc("__order"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keyed = keyed.withColumn(
        "__local_start", F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    )
    # phase 3: bucket totals -> running offsets (n_buckets rows, a
    # driver-size table regardless of corpus size) -> broadcast back
    totals = keyed.groupBy("__bucket").agg(F.sum(token_col).alias("__tot"))
    woff = (
        Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__tot").over(woff), F.lit(0)).cast("long")
    ).select("__bucket", "__offset")
    out = keyed.join(F.broadcast(offsets), "__bucket")
    out = out.withColumn(
        "shard_start", (F.col("__offset") + F.col("__local_start")).cast("long")
    ).withColumn(
        "shard_id",
        F.floor(F.col("shard_start") / F.lit(int(tokens_per_shard))).cast("long"),
    )
    return out.drop("__bucket", "__local_start", "__offset")


def write_token_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    tokens_per_shard: int = 1_000_000,
    salt: str = "",
) -> None:
    """Materialize shards: one parquet directory per shard_id, rows
    within each file sorted by the shuffle order (so a loader streaming
    a shard front-to-back sees the global order restricted to that
    shard). repartition BY shard -> sortWithinPartitions: exactly one
    shuffle to co-locate each shard's rows.
    """
    assigned = assign_token_shards(
        df, id_col, token_col, tokens_per_shard, salt
    )
    (
        assigned.repartition(F.col("shard_id"))
        .sortWithinPartitions("__order", id_col)
        .drop("__order")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
