"""Sketch accuracy gates and bucketed co-located joins.

Sketches: approximate answers bounded against exact ones (HLL lgK=12
standard error ~1.6%; gate at 5%).

Bucketing: writing both join sides bucketed by the key lets the join
run with NO Exchange — the co-location strategy for a recurring 100 TB
join. The plan assertion is the test.
"""

import math
import os
import tempfile

from pyspark.sql import functions as F

from polars_matmul_spark.operators.sketches import (
    hll_distinct,
    hll_merge_sketches,
    quantile_summary,
)
from polars_matmul_spark.sources.tables import load_table


def test_hll_distinct_within_error(spark, sf_dir):
    events = load_table(spark, "events", sf_dir)
    approx = {
        r.event_type: r.approx_distinct
        for r in hll_distinct(events, ["event_type"], "user_id").collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.05 * n, 2), (k, approx[k], n)


def test_hll_two_level_merge_equals_single_level(spark, sf_dir):
    events = load_table(spark, "events", sf_dir)
    sketches, merge = hll_merge_sketches(events, ["event_type"], "user_id")
    merged = {r.event_type: r.approx_distinct for r in merge(sketches).collect()}
    single = {
        r.event_type: r.approx_distinct
        for r in hll_distinct(events, ["event_type"], "user_id").collect()
    }
    # HLL union is lossless over the same data: identical estimates
    assert merged == single


def test_quantile_summary_sane(spark, sf_dir):
    events = load_table(spark, "events", sf_dir)
    rows = quantile_summary(events, ["event_type"], "value").collect()
    assert len(rows) == 5
    for r in rows:
        assert r.p50 <= r.p95 <= r.p99


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    from polars_matmul_spark.plans.inspect import explain_str

    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(tmp, "orders_b"))
            .mode("overwrite")
            .saveAsTable("orders_b")
        )
        (
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(tmp, "lineitem_b"))
            .mode("overwrite")
            .saveAsTable("lineitem_b")
        )
        # disable broadcast: at real scale neither side broadcasts —
        # the point is that bucketing removes the SHUFFLE exchange
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
            plan = explain_str(joined, "simple")
            assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        n = joined.count()
        want = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert n == want
        spark.sql("DROP TABLE orders_b")
        spark.sql("DROP TABLE lineitem_b")
