"""Distributed Bloom filter for incremental exact dedup — pure Catalyst.

The incremental-dedup family (operators/dedup.py, operators/ann.py,
streaming/ingest.py) checks new batches against a PERSISTED index.
For exact dedup the full fingerprint set works but grows with the
corpus (32 B/doc of md5 hex = ~3 TB/100 B docs). A Bloom filter
compresses "have we seen this fingerprint" into a few GB with a
tunable false-positive rate and a HARD no-false-negative guarantee —
the standard first gate before the exact check.

Spark's built-in ``DataFrameStatFunctions.bloomFilter`` builds the
filter ON THE DRIVER and probing from Python needs a per-row UDF
round-trip. This implementation keeps both sides distributed and
JVM-only:

- the filter IS a DataFrame: (word_idx, bits) — an m-bit bitmap cut
  into 63-BIT words (m/63 rows; ~2 MB per 2^24 bits as parquet). 63,
  not 64: engines disagree on shifting into a BIGINT's sign bit
  (DuckDB raises on 1 << 63), and capping the shift at 62 keeps every
  word a plain non-negative BIGINT in every engine. It persists like
  any table and unions/ORs with later builds.
- build: per row, k bit positions from two md5-derived 48-bit hashes
  via the standard double-hashing scheme h1 + i*h2 (Kirsch &
  Mitzenmacher 2006) -> explode -> groupBy word_idx with bit_or.
  One shuffle whose key space is m/64 words, map-side combinable.
- probe: each new row re-derives its k positions, equi-joins the
  (broadcast) word table, and is "maybe seen" iff ALL k bits are set.
  The history NEVER shuffles — it's already reduced to the bitmap.

Determinism: md5-based (engine-portable; a DuckDB oracle reproduces
the bitmap bit-for-bit). No SipHash/xxhash seed drift across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_params",
    "build_bloom",
    "probe_bloom",
    "bloom_dedup_new_batch",
]


def bloom_params(n_items: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits rounded up to a multiple of 63 — the word
    width, see module docstring) and k for an expected ``n_items`` at
    ``fp_rate``: m = -n ln p / ln(2)^2, k = (m/n) ln 2."""
    if not (0.0 < fp_rate < 1.0):
        raise ValueError(f"fp_rate must be in (0, 1), got {fp_rate}")
    if n_items <= 0:
        raise ValueError(f"n_items must be positive, got {n_items}")
    m = int(math.ceil(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
    m = ((m + 62) // 63) * 63
    k = max(1, int(round(m / n_items * math.log(2))))
    return m, k


def _h1h2(col: Column) -> tuple[Column, Column]:
    # two independent 48-bit hashes from one md5: hex chars [1..12]
    # and [13..24]. 48 bits stay exact through the double that
    # ``conv`` returns (same envelope as sampling.hash_bucket).
    h = F.md5(col.cast("string"))
    h1 = F.conv(F.substring(h, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 13, 12), 16, 10).cast("long")
    # force h2 odd so strides never collapse to 0 mod small powers
    return h1, h2 * 2 + 1


def _positions(col: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions for a value: (h1 + i*h2) mod m."""
    h1, h2 = _h1h2(col)
    return F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(k - 1).cast("long")),
        lambda i: F.pmod(h1 + i * h2, F.lit(m_bits)),
    )


def build_bloom(
    df: DataFrame, value_col: str, m_bits: int, k: int
) -> DataFrame:
    """Aggregate ``df[value_col]`` into the bitmap table
    (word_idx long, bits long). Rows appear only for words with at
    least one set bit (the probe treats absent words as all-zero).

    One explode (k rows per input) + one groupBy over at most m/63
    keys — uniform, map-side-combinable, and the output is tiny.
    Filters built with the same (m_bits, k) merge by
    ``union -> groupBy word_idx -> bit_or`` (see the test).
    """
    if m_bits % 63 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 63, got {m_bits}")
    pos = _positions(F.col(value_col), m_bits, k)
    bits = df.select(F.explode(pos).alias("p")).select(
        F.expr("p DIV 63").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias("b"),
    )
    return bits.groupBy("word_idx").agg(F.bit_or("b").alias("bits"))


def probe_bloom(
    new_df: DataFrame,
    bloom: DataFrame,
    value_col: str,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Adds ``maybe_seen``: True iff every one of the row's k bits is
    set in ``bloom``. False means DEFINITELY not seen (the Bloom
    guarantee); True means "check exactly or accept the fp_rate".

    Plan: explode the new rows' positions, broadcast-join the word
    table (MBs by construction), count hits per row — the history
    bitmap never shuffles and the new batch shuffles only its
    (row, word) pairs.
    """
    pos = _positions(F.col(value_col), m_bits, k)
    probes = new_df.select(
        F.col(value_col).alias("__v"), F.explode(pos).alias("p")
    ).select(
        "__v",
        F.expr("p DIV 63").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias("b"),
    )
    hits = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "__v",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("b"))
                != 0
            ).alias("hit"),
        )
        .groupBy("__v")
        .agg(F.min("hit").alias("maybe_seen"))  # AND over the k probes
    )
    return new_df.join(
        hits.withColumnRenamed("__v", value_col), value_col, "left"
    ).withColumn("maybe_seen", F.coalesce(F.col("maybe_seen"), F.lit(False)))


def bloom_dedup_new_batch(
    new_df: DataFrame,
    bloom: DataFrame,
    history: DataFrame,
    value_col: str,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Two-gate incremental exact dedup: rows whose ``maybe_seen`` is
    False pass immediately (no-false-negative guarantee — the history
    is never touched for them); only Bloom-positive rows anti-join the
    exact ``history`` fingerprint set to weed out false positives.

    At 100 TB this is the point of the filter: the expensive exact
    anti-join runs over fp_rate + true-dup fraction of the batch, not
    all of it, and the broadcast bitmap replaces a full history scan
    for the clean majority.
    """
    probed = probe_bloom(new_df, bloom, value_col, m_bits, k)
    clean = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = suspects.join(
        history.select(F.col(value_col)).distinct(), value_col, "left_anti"
    )
    return clean.unionByName(confirmed_new)
