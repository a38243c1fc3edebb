"""Streaming embedding ingest: planted near-dups rejected across and
within micro-batches; index grows only by novelties; epoch replay is
idempotent."""

from __future__ import annotations

import glob
import shutil

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.ann import pick_centroids
from polars_matmul_spark.sources.tables import load_table
from polars_matmul_spark.streaming.embeddings import (
    ingest_embeddings_batch,
    run_embedding_ingest_stream,
)

SF_DIR = "/root/testdata/sf0.001"
DIM = None  # resolved from data


def _base(spark):
    emb = load_table(spark, "embeddings", SF_DIR).select("vec_id", "embedding")
    return emb


@pytest.fixture(scope="module")
def ingest_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("emb_ingest")
    inp, index, ckpt = str(root / "in"), str(root / "index"), str(root / "ckpt")

    emb = _base(spark)
    pdf = emb.orderBy("vec_id").toPandas()
    rng = np.random.default_rng(5)

    # batch A: first 60 originals
    a = pdf.iloc[:60][["vec_id", "embedding"]]
    # batch B: 20 fresh originals + 15 near-dups of batch-A rows
    fresh = pdf.iloc[60:80][["vec_id", "embedding"]]
    dup_rows = pd.DataFrame(
        {
            "vec_id": [10_000 + i for i in range(15)],
            "embedding": [
                (
                    np.asarray(v, dtype=np.float64) + rng.normal(0, 0.01, len(v))
                ).tolist()
                for v in pdf.iloc[:15]["embedding"]
            ],
        }
    )
    # plus one within-batch dup pair: 20000 ~ 20001
    v0 = np.asarray(pdf.iloc[90]["embedding"], dtype=np.float64)
    pair = pd.DataFrame(
        {
            "vec_id": [20_000, 20_001],
            "embedding": [v0.tolist(), (v0 + rng.normal(0, 0.01, len(v0))).tolist()],
        }
    )
    b = pd.concat([fresh, dup_rows, pair], ignore_index=True)

    def write(pdf, name):
        (
            spark.createDataFrame(pdf)
            .select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
            .coalesce(1)
            .write.parquet(f"{inp}/{name}")
        )

    write(a, "tmp_a")
    write(b, "tmp_b")
    for i, f in enumerate(sorted(glob.glob(f"{inp}/tmp_*/part-*.parquet"))):
        shutil.move(f, f"{inp}/batch{i}.parquet")
    shutil.rmtree(f"{inp}/tmp_a"), shutil.rmtree(f"{inp}/tmp_b")

    centroids = pick_centroids(
        emb.withColumnRenamed("vec_id", "corpus_id"), "corpus_id", every=37
    ).localCheckpoint(eager=True)
    run_embedding_ingest_stream(
        spark, inp, index, ckpt, centroids, threshold=0.95, nprobe=4
    )
    return inp, index, centroids


class TestEmbeddingIngest:
    def test_planted_dups_rejected_novelties_kept(self, spark, ingest_dirs):
        _, index_dir, _ = ingest_dirs
        accepted = spark.read.parquet(index_dir)
        ids = {r["vec_id"] for r in accepted.select("vec_id").collect()}
        # all 60 batch-A originals and all 20 batch-B fresh rows kept
        assert all(i in ids for i in range(80))
        # every cross-batch planted dup rejected
        assert not any((10_000 + i) in ids for i in range(15))
        # within-batch pair: lowest id kept, other rejected
        assert 20_000 in ids and 20_001 not in ids

    def test_index_rows_carry_centroid_assignment(self, spark, ingest_dirs):
        _, index_dir, centroids = ingest_dirs
        accepted = spark.read.parquet(index_dir)
        assert "centroid_id" in accepted.columns
        cents = {r["centroid_id"] for r in centroids.select("centroid_id").collect()}
        got = {r["centroid_id"] for r in accepted.select("centroid_id").distinct().collect()}
        assert got <= cents

    def test_chain_collapse_keeps_novel_endpoint(self, spark, tmp_path):
        # A~B and B~C but A!~C (cos 15deg = .966 >= .95, cos 30deg =
        # .866 < .95): greedy-vs-survivors must drop only B — C's sole
        # witness was itself dropped, so C is novel relative to the
        # kept set and enters the index. Plain pairwise drop would
        # wrongly reject C too.
        import math

        a15, a30 = math.radians(15), math.radians(30)
        vecs = {
            1: [1.0, 0.0, 0.0, 0.0],
            2: [math.cos(a15), math.sin(a15), 0.0, 0.0],
            3: [math.cos(a30), math.sin(a30), 0.0, 0.0],
        }
        batch = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id long, embedding array<float>",
        )
        centroids = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0, 0.0])],
            "centroid_id long, centroid_emb array<float>",
        )
        index_dir = str(tmp_path / "chain_index")
        ingest_embeddings_batch(
            spark, batch, 0, index_dir, centroids, threshold=0.95, nprobe=1
        )
        ids = {r["vec_id"] for r in spark.read.parquet(index_dir).collect()}
        assert ids == {1, 3}

    def test_epoch_replay_idempotent(self, spark, ingest_dirs):
        inp, index_dir, centroids = ingest_dirs
        before = spark.read.parquet(index_dir).count()
        batch1 = spark.read.parquet(f"{inp}/batch1.parquet")
        ingest_embeddings_batch(
            spark, batch1, 1, index_dir, centroids, threshold=0.95, nprobe=4
        )
        after = spark.read.parquet(index_dir).count()
        assert after == before
