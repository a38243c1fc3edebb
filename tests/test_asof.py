"""As-of join: tolerance behavior + hand-checked edge semantics."""

import pandas as pd
from pyspark.sql import functions as F

from polars_matmul_spark.operators.asof import asof_join_backward


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_inclusive_equal_ts_and_no_prior(spark):
    left = _mk(
        spark,
        [(1, "2020-01-01 10:00:00", 100), (1, "2020-01-01 09:00:00", 101), (2, "2020-01-01 10:00:00", 102)],
        "user_id long, ts string, lid long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = _mk(
        spark,
        [(1, "2020-01-01 10:00:00", 7, 0.5), (1, "2020-01-01 08:00:00", 8, 0.25)],
        "user_id long, ts string, rid long, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = asof_join_backward(left, right, "user_id", "ts", "ts", ["rid", "value"])
    got = {r.lid: (r.asof_rid, r.asof_value) for r in out.collect()}
    assert got[100] == (7, 0.5)  # equal ts matches (inclusive)
    assert got[101] == (8, 0.25)  # strictly prior
    assert got[102] == (None, None)  # other key: no prior right row


def test_asof_tolerance_nulls_out_stale_matches(spark):
    left = _mk(spark, [(1, "2020-01-01 10:00:00", 100)], "user_id long, ts string, lid long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    right = _mk(spark, [(1, "2020-01-01 08:00:00", 8, 1.0)], "user_id long, ts string, rid long, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    wide = asof_join_backward(left, right, "user_id", "ts", "ts", ["rid", "value"], tolerance_sec=3 * 3600)
    tight = asof_join_backward(left, right, "user_id", "ts", "ts", ["rid", "value"], tolerance_sec=3600)
    assert wide.collect()[0].asof_rid == 8
    assert tight.collect()[0].asof_rid is None  # 2h-old match outside 1h tolerance
