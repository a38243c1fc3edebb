"""Parquet table sources for the sf* test datasets.

Columnar parquet scans with Catalyst pushdown; schemas are whatever the
driver generated (TESTDATA.md). At cluster scale the same loaders point
at a directory of many files — Spark parallelizes the scan by file
split, `spark.sql.files.maxPartitionBytes` controls split size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: every event-time/date-time column the testdata ships; all get the
#: same canonical treatment so an encoding flip in ANY of them (the
#: round-2 `ts` incident) is absorbed here, not in seven consumers
TS_COLUMNS = ("ts", "l_shipdate", "o_orderdate")


def normalize_ts(df: DataFrame, cols=TS_COLUMNS) -> DataFrame:
    """Normalize event-time columns to one canonical TIMESTAMP (ltz) type,
    whatever the parquet writer emitted. The testdata has shipped two
    encodings across rounds:

    - TIMESTAMP(NANOS): only readable under ``nanosAsLong`` — arrives as
      LongType ns-since-epoch. Integer ``div`` (not float /): ns exceeds
      double's 2^53 integer range.
    - timestamp[us] (no UTC adjustment): arrives natively as
      TIMESTAMP_NTZ. The session TZ is pinned UTC, so casting NTZ→LTZ is
      a lossless reinterpretation of the same wall-clock instant.

    Every downstream consumer (as-of join, windows, unix_timestamp
    oracles) sees a plain ``timestamp`` either way.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name not in cols:
            continue
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(field.name, F.expr(f"timestamp_micros({field.name} div 1000)"))
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def spread_to_cores(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Round-robin repartition to defaultParallelism ONLY when the
    input arrives with fewer splits (the one-file test-SF layout):
    spreading a single-split synth/decode chain across cores is a win
    locally, but at real scale the scan is already multi-split and an
    unconditional repartition would be a full exchange ahead of
    row-local work (round 13, r12 verdict #5; guide §2.4 — never
    shuffle to restore parallelism you already have). Callers run
    row-local expression/decode chains, so values are unaffected
    either way."""
    want = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"Unknown table '{name}'. Known: {', '.join(TABLES)}")
    # defensive session confs, in case the caller's session wasn't built
    # by plans.session.get_spark (e.g. the round driver's own session):
    # legacy TIMESTAMP(NANOS) events.ts is unreadable without nanosAsLong,
    # and every date/unix_timestamp oracle comparison assumes UTC.
    # Both are runtime-settable; verified against a bare session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_ts(df)


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables=TABLES) -> None:
    """Register each table as a temp view so SQL-form queries can run."""
    for name in tables:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
