"""Multimodal query registry with DuckDB oracles.

The Spark implementations live in ``operators.multimodal``. Documents
text is pure ASCII (verified at sf0.01), so byte == codepoint and the
deterministic fake decoders are exactly replicable in DuckDB: VARCHAR
``substring``+``sha256`` equals binary-slice hashing, and
``unicode(substring(text, i, 1))`` equals the payload byte at i.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from polars_matmul_spark.operators import multimodal as M
from polars_matmul_spark.sources.tables import load_table


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.asset_table(load_table(spark, "documents", sf_dir))


# --- asset table metadata --------------------------------------------------

def _asset_meta(spark, sf_dir):
    from pyspark.sql import functions as F

    return _assets(spark, sf_dir).select(
        "asset_id",
        "kind",
        "width",
        "height",
        "n_bytes",
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
    )


_ASSET_META_ORACLE = """
SELECT doc_id AS asset_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       16 AS width,
       CAST(octet_length(text::BLOB) // 16 AS INTEGER) AS height,
       CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
       sha256(text) AS payload_sha256
FROM documents
"""


# --- byte-histogram features ----------------------------------------------

def _byte_histogram(spark, sf_dir):
    # the feature operator emits array<double>; the driver-facing query
    # posexplodes it to scalar (asset_id, bin, freq) rows because the
    # driver's canonicalizer cannot sort/hash ndarray cells (round-1
    # CORRECTNESS err on the array-shaped output)
    from pyspark.sql import functions as F

    feats = M.byte_histogram_features(_assets(spark, sf_dir), bins=16)
    return feats.select(
        "asset_id", F.posexplode("features").alias("bin", "freq")
    ).select("asset_id", F.col("bin").cast("long").alias("bin"), "freq")


def _duck_histogram_oracle(bins: int = 16) -> str:
    width = 256 // bins
    sums = ", ".join(
        f"SUM(CASE WHEN code // {width} = {j} THEN 1 ELSE 0 END) AS b{j}"
        for j in range(bins)
    )
    arr = ", ".join(f"CAST(b{j} AS DOUBLE) / n" for j in range(bins))
    return f"""
WITH px AS (
  SELECT doc_id, length(text) AS n, unnest(range(1, length(text) + 1)) AS i, text
  FROM documents
), codes AS (
  SELECT doc_id, n, unicode(substring(text, CAST(i AS INTEGER), 1)) AS code FROM px
), sums AS (
  SELECT doc_id, n, {sums} FROM codes GROUP BY doc_id, n
), arrs AS (
  SELECT doc_id AS asset_id, [{arr}] AS features FROM sums
)
SELECT asset_id,
       CAST(generate_subscripts(features, 1) - 1 AS BIGINT) AS bin,
       unnest(features) AS freq
FROM arrs
"""


# --- fake image decode + pixel stats --------------------------------------

def _pixel_stats(spark, sf_dir):
    return M.pixel_stats(_assets(spark, sf_dir))


_PIXEL_STATS_ORACLE = """
WITH dims AS (
  SELECT doc_id, text, 16 * (length(text) // 16) AS np FROM documents
), px AS (
  SELECT doc_id, np, unnest(range(1, np + 1)) AS i, text FROM dims
), codes AS (
  SELECT doc_id, np, unicode(substring(text, CAST(i AS INTEGER), 1)) AS code FROM px
)
SELECT doc_id AS asset_id,
       CAST(np AS BIGINT) AS n_pixels,
       CAST(SUM(code) AS DOUBLE) / np AS mean_px,
       CAST(MIN(code) AS INTEGER) AS min_px,
       CAST(MAX(code) AS INTEGER) AS max_px
FROM codes GROUP BY doc_id, np
"""


# --- frame sampling (pure Catalyst on Spark side) -------------------------

def _frame_sample(spark, sf_dir):
    return M.frame_sample(_assets(spark, sf_dir), frame_bytes=64, every=2)


_FRAME_SAMPLE_ORACLE = """
WITH f AS (
  SELECT doc_id AS asset_id, text,
         unnest(range(0, octet_length(text::BLOB) // 64)) AS frame_no
  FROM documents
)
SELECT asset_id, CAST(frame_no AS BIGINT) AS frame_no,
       sha256(substring(text, CAST(frame_no * 64 + 1 AS INTEGER), 64)) AS frame_sha256
FROM f WHERE frame_no % 2 = 0
"""


MULTIMODAL_QUERIES: dict[str, tuple] = {
    "mm_asset_meta": (_asset_meta, _ASSET_META_ORACLE),
    "mm_byte_histogram": (_byte_histogram, _duck_histogram_oracle()),
    # mm_pixel_stats rotated out in round 5 (same vectorized-decode
    # family as mm_byte_histogram, which stays; the function remains
    # above, importable and pinned by tests/test_multimodal.py) so the
    # round-4 embedding-dedup families get driver rows. Later in round
    # 5 mm_frame_sample rotates out too (frame sampling stays pinned by
    # tests/test_multimodal.py and its posexplode row-index shape stays
    # driver-gated through matmul_flatten) so the winnowing / retention
    # / hard-negative families get driver rows.
}
