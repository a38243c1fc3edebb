"""MERGE upsert and SCD2 history vs a DuckDB oracle on the customer
table, plus idempotence/edge semantics."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.merge import (
    merge_upsert,
    scd2_apply,
    scd2_current,
)
from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _sorted(pdf, keys):
    return pdf.sort_values(keys).reset_index(drop=True)


class TestMergeUpsert:
    def test_vs_duckdb(self, spark):
        cust = load_table(spark, "customer", SF_DIR).select(
            "c_custkey", "c_name", "c_acctbal"
        )
        changes = (
            cust.filter(F.col("c_custkey") % 7 == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
        ).unionByName(
            spark.createDataFrame(
                pd.DataFrame(
                    {
                        "c_custkey": [900001, 900002],
                        "c_name": ["new-a", "new-b"],
                        "c_acctbal": [1.5, 2.5],
                    }
                )
            )
        )
        got = _sorted(merge_upsert(cust, changes, ["c_custkey"]).toPandas(), ["c_custkey"])

        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'"
        )
        con.sql(
            """CREATE VIEW changes AS
               SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
               FROM customer WHERE c_custkey % 7 = 0
               UNION ALL SELECT * FROM (VALUES
                 (900001, 'new-a', 1.5), (900002, 'new-b', 2.5))
                 t(c_custkey, c_name, c_acctbal)"""
        )
        want = _sorted(
            con.sql(
                """SELECT c.c_custkey, c.c_name, c.c_acctbal FROM customer c
                   WHERE c.c_custkey NOT IN (SELECT c_custkey FROM changes)
                   UNION ALL SELECT * FROM changes"""
            ).df(),
            ["c_custkey"],
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_missing_column_raises(self, spark):
        cust = load_table(spark, "customer", SF_DIR).select("c_custkey", "c_name")
        with pytest.raises(ValueError, match="missing columns"):
            merge_upsert(cust, cust.drop("c_name"), ["c_custkey"])


class TestScd2:
    def _dim(self, spark):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "k": [1, 1, 2, 3],
                    "attr": ["a0", "a1", "b0", "c0"],
                    "valid_from": [0, 10, 0, 0],
                    "valid_to": [10, None, None, None],
                }
            ).astype({"valid_to": "object"})
        ).select(
            "k",
            "attr",
            F.col("valid_from").cast("long"),
            F.col("valid_to").cast("long"),
        )

    def _changes(self, spark, rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["k", "attr", "ts"])
        ).select("k", "attr", F.col("ts").cast("long"))

    def test_change_insert_noop(self, spark):
        dim = self._dim(spark)
        ch = self._changes(
            spark,
            [
                (1, "a2", 20),  # changed attr -> close + new version
                (2, "b0", 20),  # identical -> no-op
                (9, "z0", 20),  # new key -> first version
            ],
        )
        out = scd2_apply(dim, ch, ["k"], "ts").toPandas()
        out = out.sort_values(["k", "valid_from"]).reset_index(drop=True)
        rows = {(r.k, r.attr, r.valid_from, r.valid_to if pd.notna(r.valid_to) else None) for r in out.itertuples()}
        assert rows == {
            (1, "a0", 0, 10),
            (1, "a1", 10, 20),   # closed at change ts
            (1, "a2", 20, None),
            (2, "b0", 0, None),  # untouched
            (3, "c0", 0, None),
            (9, "z0", 20, None),
        }
        # current snapshot
        cur = scd2_current(scd2_apply(dim, ch, ["k"], "ts")).toPandas()
        assert set(zip(cur["k"], cur["attr"])) == {
            (1, "a2"),
            (2, "b0"),
            (3, "c0"),
            (9, "z0"),
        }

    def test_idempotent_redelivery(self, spark):
        dim = self._dim(spark)
        ch = self._changes(spark, [(1, "a2", 20)])
        once = scd2_apply(dim, ch, ["k"], "ts")
        twice = scd2_apply(once, ch, ["k"], "ts")
        a = once.toPandas().sort_values(["k", "valid_from"]).reset_index(drop=True)
        b = twice.toPandas().sort_values(["k", "valid_from"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_null_attr_transition_counts_as_change(self, spark):
        dim = spark.createDataFrame(
            pd.DataFrame({"k": [1], "attr": [None], "valid_from": [0], "valid_to": [None]})
        ).select("k", F.col("attr").cast("string"), F.col("valid_from").cast("long"), F.col("valid_to").cast("long"))
        ch = self._changes(spark, [(1, "x", 5)])
        out = scd2_apply(dim, ch, ["k"], "ts").toPandas()
        assert len(out) == 2  # closed null-version + new version

    def test_two_changes_same_key_rejected(self, spark):
        dim = self._dim(spark)
        ch = self._changes(spark, [(1, "a2", 20), (1, "a3", 21)])
        with pytest.raises(ValueError, match="multiple rows"):
            scd2_apply(dim, ch, ["k"], "ts")


class TestMergeUpsertContracts:
    def _target(self, spark):
        return spark.createDataFrame(
            pd.DataFrame({"k": [1, 2, 3], "v": ["t1", "t2", "t3"]})
        ).select(F.col("k").cast("long"), "v")

    def test_dup_key_batch_raises(self, spark):
        tgt = self._target(spark)
        ch = spark.createDataFrame(
            pd.DataFrame({"k": [1, 1], "v": ["c1a", "c1b"]})
        ).select(F.col("k").cast("long"), "v")
        with pytest.raises(ValueError, match="multiple rows"):
            merge_upsert(tgt, ch, ["k"]).count()

    def test_seq_col_last_wins(self, spark):
        tgt = self._target(spark)
        ch = spark.createDataFrame(
            pd.DataFrame(
                {"k": [1, 1, 4], "v": ["old", "new", "ins"], "seq": [5, 9, 1]}
            )
        ).select(F.col("k").cast("long"), "v", F.col("seq").cast("long"))
        out = merge_upsert(
            tgt.withColumn("seq", F.lit(0).cast("long")), ch, ["k"], seq_col="seq"
        ).toPandas()
        got = dict(zip(out["k"], out["v"]))
        assert got == {1: "new", 2: "t2", 3: "t3", 4: "ins"}

    def test_null_key_null_safe_replace(self, spark):
        tgt = spark.createDataFrame(
            pd.DataFrame({"k": [1.0, None], "v": ["t1", "tnull"]})
        ).select(F.col("k").cast("long"), "v")
        ch = spark.createDataFrame(
            pd.DataFrame({"k": [None], "v": ["cnull"]})
        ).select(F.col("k").cast("long"), "v")
        out = merge_upsert(tgt, ch, ["k"]).toPandas()
        # the NULL-key change REPLACES the NULL-key target row (<=>),
        # it must not append a duplicate
        assert len(out) == 2
        vals = set(out["v"])
        assert vals == {"t1", "cnull"}


class TestScd2InitialLoadNullValidFrom:
    def test_null_valid_from_current_row_not_dropped(self, spark):
        # initial-load SCD2 rows often carry NULL valid_from; the row
        # must still count as an existing current version
        dim = spark.createDataFrame(
            pd.DataFrame(
                {"k": [1], "attr": ["a0"], "valid_from": [None], "valid_to": [None]}
            )
        ).select(
            "k",
            "attr",
            F.col("valid_from").cast("long"),
            F.col("valid_to").cast("long"),
        )
        ch = spark.createDataFrame(
            pd.DataFrame({"k": [1], "attr": ["a1"], "ts": [20]})
        ).select("k", "attr", F.col("ts").cast("long"))
        out = scd2_apply(dim, ch, ["k"], "ts").toPandas()
        out = out.sort_values(["k", "attr"]).reset_index(drop=True)
        rows = {
            (r.k, r.attr, None if pd.isna(r.valid_from) else r.valid_from,
             None if pd.isna(r.valid_to) else r.valid_to)
            for r in out.itertuples()
        }
        # old version kept AND closed at ts=20; new version current
        assert rows == {(1, "a0", None, 20), (1, "a1", 20, None)}

    def test_identical_change_on_null_valid_from_is_noop(self, spark):
        dim = spark.createDataFrame(
            pd.DataFrame(
                {"k": [1], "attr": ["a0"], "valid_from": [None], "valid_to": [None]}
            )
        ).select(
            "k",
            "attr",
            F.col("valid_from").cast("long"),
            F.col("valid_to").cast("long"),
        )
        ch = spark.createDataFrame(
            pd.DataFrame({"k": [1], "attr": ["a0"], "ts": [20]})
        ).select("k", "attr", F.col("ts").cast("long"))
        out = scd2_apply(dim, ch, ["k"], "ts").toPandas()
        assert len(out) == 1
        assert pd.isna(out["valid_to"].iloc[0])
