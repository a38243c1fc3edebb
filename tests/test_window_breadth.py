"""Window/grouping breadth beyond the registry queries: range-frame
(value-based) windows and explicit GROUPING SETS, each vs a DuckDB
oracle. These are H-surface semantics a warehouse user expects even
though the 50-slot registry doesn't carry dedicated rows for them."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    return con


def test_range_frame_trailing_30_days(spark):
    # trailing-30-day revenue per customer: a VALUE-based (RANGE) frame,
    # not a row-count frame — rows with gaps in the date axis must pull
    # in everything within the window, however many rows that is.
    # Engine-portable spelling: order by integer day number, RANGE
    # BETWEEN 30 PRECEDING AND CURRENT ROW.
    orders = load_table(spark, "orders", SF_DIR)
    day = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, 0)
    )
    got = (
        orders.select(
            "o_custkey",
            "o_orderkey",
            day.alias("day_no"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("rev_30d"),
        )
        .toPandas()
        .sort_values(["o_custkey", "o_orderkey"])
        .reset_index(drop=True)
    )
    con = _duck()
    want = (
        con
        .sql(
            """
SELECT o_custkey, o_orderkey,
       datediff('day', DATE '1990-01-01', o_orderdate) AS day_no,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey
         ORDER BY datediff('day', DATE '1990-01-01', o_orderdate)
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_30d
FROM orders
"""
        )
        .df()
        .sort_values(["o_custkey", "o_orderkey"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity that the frame is genuinely value-based: at least one
    # customer has >1 order inside 30 days of another
    multi = got.groupby("o_custkey").apply(
        lambda g: (g["day_no"].sort_values().diff() <= 30).any(), include_groups=False
    )
    assert multi.any()


def test_grouping_sets_with_grouping_id(spark):
    orders = load_table(spark, "orders", SF_DIR)
    orders.createOrReplaceTempView("orders_gs")
    got = (
        spark.sql(
            """
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) AS g_status,
       grouping(o_orderpriority) AS g_prio,
       count(*) AS n
FROM orders_gs
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""
        )
        .toPandas()
        .fillna({"o_orderstatus": "<null>", "o_orderpriority": "<null>"})
        .sort_values(["g_status", "g_prio", "o_orderstatus", "o_orderpriority"])
        .reset_index(drop=True)
    )
    con = _duck()
    want = (
        con
        .sql(
            """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""
        )
        .df()
        .fillna({"o_orderstatus": "<null>", "o_orderpriority": "<null>"})
        .sort_values(["g_status", "g_prio", "o_orderstatus", "o_orderpriority"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got[["o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n"]],
        want[["o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n"]],
        check_dtype=False,
    )
