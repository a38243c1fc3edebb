"""Streaming asset triage-on-ingest (streaming/assets.py): the
catalog a two-micro-batch stream builds must equal the batch
`triage_assets` answer over the sha-unique union — stream == batch,
the repo's streaming contract."""

import glob
import shutil
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.multimodal import triage_assets
from polars_matmul_spark.streaming.assets import (
    run_asset_triage_stream,
    triage_assets_batch,
)


def _wav(sig8):
    data = ((np.asarray(sig8, np.int64) - 128) * 256).astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


@pytest.fixture(scope="module")
def asset_stream(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("assets")
    inp, catalog, ckpt = (str(root / d) for d in ("in", "catalog", "ckpt"))
    dup = _wav(range(40, 140))  # same payload lands in BOTH batches
    batch_a = [
        (1, _wav(range(100))),
        (2, b"\x00opaque-a"),
        (3, dup),
    ]
    batch_b = [
        (4, dup),  # cross-batch exact dup: must NOT re-catalog
        (5, _wav(range(30, 230))),
        (6, b"\x00opaque-b"),
        (7, b"\x00opaque-b"),  # within-batch dup of 6 by payload
    ]
    for i, rows in enumerate([batch_a, batch_b]):
        spark.createDataFrame(
            rows, "asset_id long, payload binary"
        ).coalesce(1).write.parquet(f"{inp}/b{i}")
    flat = sorted(glob.glob(f"{inp}/*/part-*.parquet"))
    for i, f in enumerate(flat):
        shutil.move(f, f"{inp}/batch{i}.parquet")
    shutil.rmtree(f"{inp}/b0"), shutil.rmtree(f"{inp}/b1")

    run_asset_triage_stream(spark, inp, catalog, ckpt)
    return inp, catalog


class TestAssetTriageStream:
    def test_catalog_is_sha_unique(self, spark, asset_stream):
        _inp, catalog = asset_stream
        cat = spark.read.parquet(catalog)
        n = cat.count()
        assert n == cat.select("payload_sha").distinct().count()
        # 7 inputs, 2 exact dups removed -> 5 cataloged
        assert n == 5
        # first sighting wins: the dup payload is cataloged as asset 3
        assert cat.filter(F.col("asset_id") == 4).count() == 0
        assert cat.filter(F.col("asset_id") == 7).count() == 0

    def test_stream_equals_batch(self, spark, asset_stream):
        inp, catalog = asset_stream
        cat = spark.read.parquet(catalog).drop("epoch")
        union = spark.read.parquet(inp)
        batch = triage_assets(union).join(
            union.select(
                "asset_id", F.sha2("payload", 256).alias("payload_sha")
            ),
            "asset_id",
        )
        # restrict the batch answer to the stream's winners, then the
        # triage columns must match row for row
        winners = cat.select("asset_id")
        want = {
            r.asset_id: r.asDict()
            for r in batch.join(winners, "asset_id").collect()
        }
        got = {r.asset_id: r.asDict() for r in cat.collect()}
        assert got == want

    def test_replay_of_own_epoch_is_idempotent(self, spark, asset_stream):
        inp, catalog = asset_stream
        before = sorted(
            r.payload_sha for r in spark.read.parquet(catalog).collect()
        )
        # re-run epoch 1's batch AGAINST a catalog that already contains
        # epoch 1's rows (the crash-replay scenario): must not empty it
        batch1 = spark.read.parquet(f"{inp}/batch1.parquet")
        triage_assets_batch(spark, batch1, 1, catalog)
        after = sorted(
            r.payload_sha for r in spark.read.parquet(catalog).collect()
        )
        assert after == before
