"""Product quantization (operators/pq.py): encode parity with NumPy,
ADC distance parity, recall against exact search, storage claim, plan
shape (coded corpus never shuffled), and the exact-rerank composition."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.pq import encode_pq, pq_topk, train_pq
from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF_DIR).select("vec_id", "embedding")


@pytest.fixture(scope="module")
def books(spark, emb):
    return train_pq(emb, m=8, n_codes=16, seed=7, max_iter=10)


def _np_codes(X, books):
    m, n_codes, d_sub = books.shape
    n = X.shape[0]
    Xs = X.reshape(n, m, d_sub)
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        d = ((Xs[:, j, None, :] - books[j][None, :, :]) ** 2).sum(-1)
        codes[:, j] = d.argmin(1)
    return codes


class TestPq:
    def test_geometry_validation(self, emb):
        with pytest.raises(ValueError, match="not divisible"):
            train_pq(emb, m=7, n_codes=16)
        with pytest.raises(ValueError, match="n_codes"):
            train_pq(emb, m=8, n_codes=1000)

    def test_books_shape(self, books):
        assert books.shape == (8, 16, 8)

    def test_encode_matches_numpy(self, spark, emb, books):
        rows = emb.orderBy("vec_id").collect()
        X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
        want = _np_codes(X, books)
        got_rows = encode_pq(emb, books).orderBy("vec_id").collect()
        got = np.frombuffer(
            b"".join(r["pq_codes"] for r in got_rows), dtype=np.uint8
        ).reshape(len(rows), 8)
        assert [r["vec_id"] for r in got_rows] == [r["vec_id"] for r in rows]
        assert (got == want).all()

    def test_codes_are_m_bytes(self, emb, books):
        lens = (
            encode_pq(emb, books)
            .select(F.length("pq_codes").alias("l"))
            .distinct()
            .collect()
        )
        assert [r["l"] for r in lens] == [8]  # 64 f32 -> 8 bytes = 32x

    def test_adc_matches_numpy(self, spark, emb, books):
        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        codes = encode_pq(emb.filter(F.col("vec_id") >= 5), books)
        got = pq_topk(q, codes, books, k=3, metric="l2").collect()
        # numpy replication
        qrows = q.orderBy("query_id").collect()
        crows = (
            emb.filter(F.col("vec_id") >= 5).orderBy("vec_id").collect()
        )
        Q = np.array([list(r["embedding"]) for r in qrows], dtype=np.float64)
        X = np.array([list(r["embedding"]) for r in crows], dtype=np.float64)
        cids = np.array([r["vec_id"] for r in crows])
        C = _np_codes(X, books)
        m, n_codes, d_sub = books.shape
        # reconstruct each corpus vec from its codes, distance to query
        recon = books[np.arange(m)[None, :], C.astype(int), :].reshape(len(cids), -1)
        for r in got:
            qi = int(r["query_id"])
            d = ((Q[qi].reshape(m, d_sub)[None, :, :]
                  - recon[cids == r["corpus_id"]].reshape(1, m, d_sub)) ** 2).sum()
            assert abs(r["adist"] - d) < 1e-9
        # ranks are dense 1..3 per query
        per_q = {}
        for r in got:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert all(sorted(v) == [1, 2, 3] for v in per_q.values())

    @pytest.mark.slow
    def test_recall_on_planted_structure(self, spark):
        # clustered synthetic data: 16 well-separated centers, queries
        # are jittered copies — PQ@k must recover the exact top-k
        # neighborhood with high overlap
        rng = np.random.default_rng(3)
        centers = rng.normal(0, 10, size=(16, 32))
        X = np.repeat(centers, 20, axis=0) + rng.normal(0, 0.5, size=(320, 32))
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in range(320)],
            "vec_id long, embedding array<double>",
        )
        qX = X[:16] + rng.normal(0, 0.1, size=(16, 32))
        queries = spark.createDataFrame(
            [(i, [float(x) for x in qX[i]]) for i in range(16)],
            "query_id long, embedding array<double>",
        )
        books = train_pq(corpus, m=4, n_codes=32, seed=11, max_iter=10)
        codes = encode_pq(corpus, books)
        # the metric that matters for the two-stage design is SHORTLIST
        # recall: a 4x shortlist must contain the exact top-10 (ranking
        # WITHIN it is the rerank stage's job — PQ cells are coarser
        # than within-cluster distance gaps by construction)
        got = pq_topk(queries, codes, books, k=40).collect()
        hits = 0
        for qi in range(16):
            d = ((X - qX[qi]) ** 2).sum(1)
            exact = set(np.argsort(d)[:10].tolist())
            approx = {r["corpus_id"] for r in got if r["query_id"] == qi}
            hits += len(exact & approx)
        recall = hits / (16 * 10)
        assert recall >= 0.9, f"shortlist recall {recall}"

    def test_dot_metric_descending(self, spark, emb, books):
        q = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        codes = encode_pq(emb.filter(F.col("vec_id") >= 3), books)
        got = pq_topk(q, codes, books, k=5, metric="dot").collect()
        per_q = {}
        for r in got:
            per_q.setdefault(r["query_id"], []).append((r["rank"], r["adist"]))
        for v in per_q.values():
            v.sort()
            scores = [s for _, s in v]
            assert scores == sorted(scores, reverse=True)

    def test_unknown_metric(self, spark, emb, books):
        with pytest.raises(ValueError, match="Unknown metric"):
            pq_topk(emb.limit(1), encode_pq(emb, books), books, metric="manhattan")

    def test_corpus_never_shuffles_before_candidates(self, spark, emb, books):
        from polars_matmul_spark.plans.inspect import explain_str

        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        codes = encode_pq(emb.filter(F.col("vec_id") >= 5), books)
        out = pq_topk(q, codes, books, k=3)
        plan = explain_str(out, "simple")
        # exactly one Exchange: the slim (query_id, corpus_id, adist)
        # candidate shuffle for the final window — the coded corpus
        # itself streams through ArrowEvalPython/mapInArrow unshuffled
        assert plan.count("Exchange") == 1, plan

    @pytest.mark.slow
    def test_rerank_composition_recovers_exact(self, spark, emb):
        # PQ shortlist + full-precision rerank ~= exact top-k. The
        # synthetic embeddings table is a near-UNIFORM cloud — the
        # worst case for any ANN (all pairwise distances nearly equal),
        # so this uses the measured-recall configuration for that
        # regime: 64 codes/subspace, ~5x shortlist (probed 0.96 here;
        # clustered real-world data needs far less — see the planted-
        # structure test)
        q = emb.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        c = emb.filter(F.col("vec_id") >= 20).select(
            F.col("vec_id").alias("corpus_id"), "embedding"
        )
        books = train_pq(c, vec_col="embedding", m=8, n_codes=64, seed=7, max_iter=10)
        codes = encode_pq(c, books, id_col="corpus_id")
        short = pq_topk(q, codes, books, k=100, codes_id_col="corpus_id")
        rer = (
            short.join(c, "corpus_id")
            .join(q.select("query_id", F.col("embedding").alias("q_emb")), "query_id")
            .withColumn(
                "d",
                F.aggregate(
                    F.zip_with(
                        F.col("q_emb").cast("array<double>"),
                        F.col("embedding").cast("array<double>"),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("corpus_id"))
        got = (
            rer.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 5)
            .select("query_id", "corpus_id")
            .collect()
        )
        # exact top-5 by brute force
        qrows = q.collect()
        crows = c.collect()
        X = {r["corpus_id"]: np.array(list(r["embedding"])) for r in crows}
        hits = tot = 0
        for qr in qrows:
            qv = np.array(list(qr["embedding"]))
            d = sorted((float(((v - qv) ** 2).sum()), cid) for cid, v in X.items())
            exact = {cid for _, cid in d[:5]}
            approx = {
                r["corpus_id"] for r in got if r["query_id"] == qr["query_id"]
            }
            hits += len(exact & approx)
            tot += 5
        assert hits / tot >= 0.9, f"rerank recall {hits / tot}"


def test_codes_shrink_parquet(spark, tmp_path, emb, books):
    # the 32x claim on actual storage: coded corpus parquet must be
    # much smaller than the f32 embedding parquet (codes are opaque
    # bytes, so parquet encodings can't hide the difference)
    import os

    from polars_matmul_spark.operators.pq import encode_pq

    full = os.path.join(str(tmp_path), "full")
    coded = os.path.join(str(tmp_path), "coded")
    emb.coalesce(1).write.parquet(full)
    encode_pq(emb, books).coalesce(1).write.parquet(coded)

    def size(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    assert size(full) / size(coded) >= 6.0
