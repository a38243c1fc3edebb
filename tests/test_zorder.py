"""Z-order layout (operators/zorder.py): Morton interleave correctness
vs a Python oracle, and the pruning claim measured from real parquet
footers — a range predicate on EITHER z-column must skip most files,
and beat a single-column sort's pruning on its non-sort column."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as papq
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.zorder import z_value, zorder_write
from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _morton(vals, bits=16):
    z = 0
    n = len(vals)
    for j in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> j) & 1) << (j * n + i)
    return z


class TestZValue:
    def test_matches_python_oracle(self, spark):
        rows = [(1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 65535, 65535), (5, 1234, 567)]
        df = spark.createDataFrame(rows, "id long, a long, b long")
        got = {
            r["id"]: r["z"]
            for r in df.select(
                "id", z_value([F.col("a"), F.col("b")]).alias("z")
            ).collect()
        }
        for i, a, b in rows:
            assert got[i] == _morton([a, b])

    def test_col_count_validation(self, spark):
        with pytest.raises(ValueError, match="1..4"):
            z_value([])

    def test_four_columns_stay_in_signed_range(self, spark):
        # 4 cols x 15 bits = 60 used bits: must build (no 1<<63
        # literal) and stay non-negative so range ordering holds
        from polars_matmul_spark.operators.zorder import bits_per_column

        assert bits_per_column(4) == 15
        mx = (1 << 15) - 1
        rows = [(1, 0, 0, 0, 0), (2, mx, mx, mx, mx), (3, 5, 9, 1, 7)]
        df = spark.createDataFrame(rows, "id long, a long, b long, c long, d long")
        got = {
            r["id"]: r["z"]
            for r in df.select(
                "id",
                z_value([F.col(x) for x in ("a", "b", "c", "d")]).alias("z"),
            ).collect()
        }
        for i, a, b, c, d in rows:
            want = _morton([a, b, c, d], bits=15)
            assert got[i] == want and got[i] >= 0


def _file_stats(path, col):
    """(min, max) per parquet file for a column."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        pf = papq.ParquetFile(f)
        lo, hi = None, None
        for rg in range(pf.metadata.num_row_groups):
            md = pf.metadata.row_group(rg)
            for ci in range(md.num_columns):
                c = md.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    st = c.statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def _files_overlapping(stats, lo, hi):
    return sum(1 for mn, mx in stats if not (mx < lo or mn > hi))


class TestZorderPruning:
    @pytest.fixture(scope="class")
    def layouts(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("zorder")
        li = load_table(spark, "lineitem", SF_DIR).select(
            "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
        )
        zpath = str(root / "z")
        spath = str(root / "s")
        zorder_write(li, zpath, ["l_orderkey", "l_partkey"], n_files=64)
        # baseline: plain single-column range sort at the same file count
        (
            li.repartitionByRange(64, F.col("l_orderkey"))
            .sortWithinPartitions("l_orderkey")
            .write.mode("overwrite")
            .parquet(spath)
        )
        return li, zpath, spath

    def test_rows_preserved(self, spark, layouts):
        li, zpath, _ = layouts
        back = spark.read.parquet(zpath)
        assert back.count() == li.count()
        assert sorted(back.columns) == sorted(li.columns)

    def test_prunes_on_both_columns(self, spark, layouts):
        li, zpath, spath = layouts
        ok_min, ok_max = (
            li.agg(F.min("l_orderkey"), F.max("l_orderkey")).collect()[0]
        )
        pk_min, pk_max = (
            li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()[0]
        )
        # a 5%-wide range on each column, away from the top-level
        # curve boundaries (quadrant edges at 25/50/75%)
        ok_lo = ok_min + (ok_max - ok_min) * 30 // 100
        ok_hi = ok_min + (ok_max - ok_min) * 35 // 100
        pk_lo = pk_min + (pk_max - pk_min) * 30 // 100
        pk_hi = pk_min + (pk_max - pk_min) * 35 // 100

        z_ok = _file_stats(zpath, "l_orderkey")
        z_pk = _file_stats(zpath, "l_partkey")
        s_pk = _file_stats(spath, "l_partkey")
        n = len(z_ok)
        assert n >= 32  # enough files for pruning to mean anything

        # z-order: BOTH columns prune (each file covers a compact
        # hyper-rectangle, so a 5% range touches a minority of files)
        assert _files_overlapping(z_ok, ok_lo, ok_hi) <= n // 2
        assert _files_overlapping(z_pk, pk_lo, pk_hi) <= n // 2
        # single-column sort: its NON-sort column prunes ~nothing
        # (every file spans ~the full partkey range) — z-order must be
        # strictly better there
        assert _files_overlapping(z_pk, pk_lo, pk_hi) < _files_overlapping(
            s_pk, pk_lo, pk_hi
        )

    def test_cuts_path_prunes_too(self, spark, layouts, tmp_path):
        # the at-scale path: approxQuantile cut points instead of
        # exact rank windows — same layout contract
        li, _, _ = layouts
        cuts = {
            "l_orderkey": li.approxQuantile("l_orderkey", [i / 32 for i in range(1, 32)], 0.01),
            "l_partkey": li.approxQuantile("l_partkey", [i / 32 for i in range(1, 32)], 0.01),
        }
        path = os.path.join(str(tmp_path), "zc")
        zorder_write(li, path, ["l_orderkey", "l_partkey"], n_files=64, cuts=cuts)
        pk_min, pk_max = (
            li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()[0]
        )
        lo = pk_min + (pk_max - pk_min) * 30 // 100
        hi = pk_min + (pk_max - pk_min) * 35 // 100
        stats = _file_stats(path, "l_partkey")
        assert len(stats) >= 32
        assert _files_overlapping(stats, lo, hi) <= len(stats) * 2 // 3


class TestBucketCuts:
    def test_cuts_scale_to_full_bit_range(self, spark):
        """Regression (round-5): the cuts path used to pre-divide
        (n_buckets-1)//len(cuts), so len(cuts) >= n_buckets silently
        mapped every row to bucket 0 (dropping the column from the
        z-order) and smaller cut lists floor-wasted resolution."""
        from polars_matmul_spark.operators.zorder import _bucket

        bits = 4  # 16 buckets
        df = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
        cuts = [float(c) for c in range(10, 100, 10)]  # 9 cuts
        rows = (
            df.select("v", _bucket(F.col("v"), cuts, bits).alias("b"))
            .orderBy("v")
            .collect()
        )
        bs = [r["b"] for r in rows]
        assert min(bs) == 0 and max(bs) == 15  # full range used
        assert all(bs[i] <= bs[i + 1] for i in range(len(bs) - 1))

    def test_cuts_validation(self, spark):
        from polars_matmul_spark.operators.zorder import _bucket

        with pytest.raises(ValueError, match="n_buckets"):
            _bucket(F.col("v"), [float(i) for i in range(16)], 4)
        with pytest.raises(ValueError, match="n_buckets"):
            _bucket(F.col("v"), [float(i) for i in range(20)], 4)
        with pytest.raises(ValueError, match="non-empty"):
            _bucket(F.col("v"), [], 4)
