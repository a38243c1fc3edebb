"""Unsupervised semantic dedup: precision-1.0 verified pairs, recall
floor vs exact all-pairs under cluster blocking, chain collapse, and
seeded determinism."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark import kernels as K
from polars_matmul_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dedup_pairs,
)
from polars_matmul_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.95


@pytest.fixture(scope="module")
def planted(spark):
    """sf0.001 embeddings + 20 planted near-dups of the first rows."""
    emb = load_table(spark, "embeddings", SF).select("vec_id", "embedding")
    pdf = emb.orderBy("vec_id").toPandas()
    rng = np.random.default_rng(11)
    dups = pd.DataFrame(
        {
            "vec_id": [10_000 + i for i in range(20)],
            "embedding": [
                (
                    np.asarray(v, dtype=np.float64) + rng.normal(0, 0.008, len(v))
                ).tolist()
                for v in pdf.iloc[:20]["embedding"]
            ],
        }
    )
    full = pd.concat([pdf[["vec_id", "embedding"]], dups], ignore_index=True)
    df = spark.createDataFrame(full).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    X = np.stack([np.asarray(v, dtype=np.float64) for v in full["embedding"]])
    ids = full["vec_id"].to_numpy()
    S = K.similarity_matrix(X / np.linalg.norm(X, axis=1, keepdims=True), X / np.linalg.norm(X, axis=1, keepdims=True), "dot")
    iu = np.triu_indices(len(ids), k=1)
    hit = S[iu] >= THRESHOLD
    exact = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(iu[0][hit], iu[1][hit])
    }
    return df, exact


def test_pairs_precision_one_and_recall_floor(spark, planted):
    df, exact = planted
    got_rows = semantic_dedup_pairs(df, threshold=THRESHOLD).collect()
    got = {(r.id_a, r.id_b) for r in got_rows}
    assert len(exact) >= 20  # the plant worked
    # precision 1.0: every emitted pair is exact-verified
    assert got <= exact, f"{len(got - exact)} false positives"
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"semantic-dedup recall {recall:.3f} over {len(exact)} pairs"
    # emitted cosines match the verification rule
    assert all(r.cosine >= THRESHOLD for r in got_rows)


def test_top1_blocking_recall_strictly_below_top2(spark, planted):
    # the reason n_probe defaults to 2: boundary-straddling pairs
    df, exact = planted
    r = {}
    for n_probe in (1, 2):
        got = {
            (x.id_a, x.id_b)
            for x in semantic_dedup_pairs(
                df, threshold=THRESHOLD, n_probe=n_probe
            ).collect()
        }
        r[n_probe] = len(got & exact) / len(exact)
    assert r[2] >= r[1]


def test_chain_collapses_to_lowest_id(spark):
    # A~B, B~C, A!~C (15/15/30 degrees at threshold .95) in one
    # cluster: the component {A,B,C} must keep only A with group_size 3
    a15, a30 = math.radians(15), math.radians(30)
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [math.cos(a15), math.sin(a15), 0.0, 0.0]),
        (3, [math.cos(a30), math.sin(a30), 0.0, 0.0]),
        (9, [0.0, 0.0, 1.0, 0.0]),  # unrelated singleton
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])],
        "centroid_id long, centroid_emb array<double>",
    )
    kept = semantic_dedup(df, threshold=THRESHOLD, centroids=centroids).collect()
    by_id = {r.vec_id: r.group_size for r in kept}
    assert set(by_id) == {1, 9}
    assert by_id[1] == 3 and by_id[9] == 1


def test_seeded_determinism(spark, planted):
    df, _ = planted
    runs = [
        {
            (r.id_a, r.id_b, round(r.cosine, 9))
            for r in semantic_dedup_pairs(df, threshold=THRESHOLD, seed=7).collect()
        }
        for _ in range(2)
    ]
    assert runs[0] == runs[1] and len(runs[0]) > 0
