"""IVF-PQ (operators/ivfpq.py): recall on planted clusters, nprobe
monotonicity, residual-PQ beats raw-PQ at equal code budget, and the
one-Exchange search plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.ivfpq import build_ivfpq, ivfpq_topk


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(5)
    centers = rng.normal(0, 10, size=(12, 32))
    X = np.repeat(centers, 30, axis=0) + rng.normal(0, 0.6, size=(360, 32))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(360)],
        "vec_id long, embedding array<double>",
    )
    qX = centers + rng.normal(0, 0.2, size=(12, 32))
    queries = spark.createDataFrame(
        [(i, [float(x) for x in qX[i]]) for i in range(12)],
        "query_id long, embedding array<double>",
    )
    return corpus, queries, X, qX


def _exact_topk(X, qX, k):
    out = {}
    for qi in range(len(qX)):
        d = ((X - qX[qi]) ** 2).sum(1)
        out[qi] = set(np.argsort(d)[:k].tolist())
    return out


def _recall(got_rows, exact, k):
    per_q = {}
    for r in got_rows:
        per_q.setdefault(r["query_id"], set()).add(r["corpus_id"])
    hits = sum(len(per_q.get(qi, set()) & exact[qi]) for qi in exact)
    return hits / (len(exact) * k)


class TestIvfPq:
    @pytest.fixture(scope="class")
    def built(self, clustered):
        corpus, _, _, _ = clustered
        return build_ivfpq(corpus, n_centroids=12, m=4, n_codes=16, seed=3)

    def test_index_schema_and_coverage(self, clustered, built):
        corpus, _, _, _ = clustered
        index, centroids, books = built
        assert centroids.shape == (12, 32)
        assert books.shape == (4, 16, 8)
        rows = index.collect()
        assert len(rows) == corpus.count()
        assert all(len(r["pq_codes"]) == 4 for r in rows)
        # every list non-degenerate: no single centroid hogs everything
        per_c = index.groupBy("centroid_id").count().collect()
        assert len(per_c) > 1

    def test_shortlist_recall(self, clustered, built):
        corpus, queries, X, qX = clustered
        index, centroids, books = built
        got = ivfpq_topk(queries, index, centroids, books, k=40, nprobe=3).collect()
        exact = _exact_topk(X, qX, 10)
        r = _recall(got, exact, 10)
        assert r >= 0.9, f"shortlist recall {r}"

    def test_nprobe_monotone(self, clustered, built):
        corpus, queries, X, qX = clustered
        index, centroids, books = built
        exact = _exact_topk(X, qX, 10)
        recalls = []
        for p in (1, 3, 12):
            got = ivfpq_topk(
                queries, index, centroids, books, k=40, nprobe=p
            ).collect()
            recalls.append(_recall(got, exact, 10))
        assert recalls[0] <= recalls[1] <= recalls[2] + 1e-9
        # probe-all must be near-perfect on this shortlist size
        assert recalls[2] >= 0.95

    @pytest.mark.slow
    def test_residuals_beat_raw_pq(self, clustered):
        # same code budget (m=4, 16 codes): PQ on residuals must beat
        # PQ on raw vectors — the reason IVF-PQ exists
        from polars_matmul_spark.operators.pq import encode_pq, pq_topk, train_pq

        corpus, queries, X, qX = clustered
        exact = _exact_topk(X, qX, 10)
        index, centroids, books = build_ivfpq(
            corpus, n_centroids=12, m=4, n_codes=16, seed=3
        )
        got_ivfpq = ivfpq_topk(
            queries, index, centroids, books, k=40, nprobe=12
        ).collect()
        raw_books = train_pq(corpus, m=4, n_codes=16, seed=3)
        raw_codes = encode_pq(corpus, raw_books)
        got_raw = pq_topk(queries, raw_codes, raw_books, k=40).collect()
        r_ivfpq = _recall(got_ivfpq, exact, 10)
        r_raw = _recall(got_raw, exact, 10)
        assert r_ivfpq >= r_raw, f"ivfpq {r_ivfpq} < raw {r_raw}"
        assert r_ivfpq >= 0.85

    def test_one_candidate_exchange(self, spark, clustered, built):
        # over a MATERIALIZED index (the production shape: the index is
        # written once and scanned at search time), search itself adds
        # exactly one slim candidate Exchange
        from polars_matmul_spark.plans.inspect import explain_str

        _, queries, _, _ = clustered
        index, centroids, books = built
        stored = index.localCheckpoint(eager=True)
        out = ivfpq_topk(queries, stored, centroids, books, k=5, nprobe=2)
        plan = explain_str(out, "simple")
        assert plan.count("Exchange") == 1, plan

    def test_empty_queries(self, spark, clustered, built):
        _, queries, _, _ = clustered
        index, centroids, books = built
        empty = queries.filter(F.col("query_id") < 0)
        assert ivfpq_topk(empty, index, centroids, books, k=5).count() == 0
