"""Contrastive mining (operators/mining.py): hard negatives exclude
exactly the positive set and match a NumPy oracle; in-batch negatives
are deterministic, partitioning-invariant, and never pair a query with
its own positive."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.mining import hard_negatives, in_batch_negatives
from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sides(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("c_emb")
    )
    return q, c


class TestHardNegatives:
    def test_matches_numpy_oracle(self, spark, sides):
        q, c = sides
        # positives: fixed ids so exclusion is visible
        pos = spark.createDataFrame(
            [(i, 10 + i) for i in range(10)] + [(i, 20 + i) for i in range(10)],
            "query_id long, corpus_id long",
        )
        got = hard_negatives(q, c, pos, k=5).collect()
        qr = {r["query_id"]: np.array(list(r["q_emb"])) for r in q.collect()}
        cr = {r["corpus_id"]: np.array(list(r["c_emb"])) for r in c.collect()}
        excluded = {(i, 10 + i) for i in range(10)} | {(i, 20 + i) for i in range(10)}
        per_q = {}
        for r in got:
            per_q.setdefault(r["query_id"], []).append((r["rank"], r["corpus_id"]))
        assert set(per_q) == set(qr)
        for qi, lst in per_q.items():
            assert sorted(r for r, _ in lst) == [1, 2, 3, 4, 5]
            # no positive leaked
            for _, cid in lst:
                assert (qi, cid) not in excluded
            # oracle: cosine top-5 after exclusion
            qv = qr[qi]
            scores = []
            for cid, cv in cr.items():
                if (qi, cid) in excluded:
                    continue
                s = float(qv @ cv / (np.linalg.norm(qv) * np.linalg.norm(cv)))
                scores.append((-s, cid))
            want = [cid for _, cid in sorted(scores)[:5]]
            gotc = [cid for _, cid in sorted(lst)]
            assert gotc == want

    def test_depth_guarantees_k(self, spark, sides):
        q, c = sides
        # a query with MANY positives still gets exactly k negatives
        pos = spark.createDataFrame(
            [(0, cid) for cid in range(10, 40)],
            "query_id long, corpus_id long",
        )
        got = hard_negatives(q, c, pos, k=5)
        n0 = got.filter(F.col("query_id") == 0).count()
        assert n0 == 5

    def test_per_query_depth_with_heavy_positive_query(self, spark, sides):
        # one query with a huge positive set must not widen anyone
        # else's search: the default depth is k + THAT query's positive
        # count, joined per query. Results must equal (a) the NumPy
        # oracle after exclusion and (b) the old global-max-depth form
        # (explicit search_depth = k + max positives).
        q, c = sides
        heavy = [(0, cid) for cid in range(10, 50)]  # 40 positives
        light = [(1, 11)]
        pos = spark.createDataFrame(
            heavy + light, "query_id long, corpus_id long"
        )
        k = 3
        got = hard_negatives(q, c, pos, k=k).collect()
        excluded = set(heavy) | set(light)
        qr = {r["query_id"]: np.array(list(r["q_emb"])) for r in q.collect()}
        cr = {r["corpus_id"]: np.array(list(r["c_emb"])) for r in c.collect()}
        per_q = {}
        for r in got:
            per_q.setdefault(r["query_id"], []).append((r["rank"], r["corpus_id"]))
        assert set(per_q) == set(qr)
        for qi, lst in per_q.items():
            qv = qr[qi]
            scores = []
            for cid, cv in cr.items():
                if (qi, cid) in excluded:
                    continue
                s = float(qv @ cv / (np.linalg.norm(qv) * np.linalg.norm(cv)))
                scores.append((-s, cid))
            want = [cid for _, cid in sorted(scores)[:k]]
            assert [cid for _, cid in sorted(lst)] == want
        # old global-depth behavior agrees
        legacy = hard_negatives(q, c, pos, k=k, search_depth=k + 40).collect()
        assert sorted((r["query_id"], r["rank"], r["corpus_id"]) for r in got) == sorted(
            (r["query_id"], r["rank"], r["corpus_id"]) for r in legacy
        )


    def test_metric_alias_case_matches_canonical(self, spark, sides):
        """r6 ADVICE regression: 'COSINE' passed canonicalization for
        the depth window but the final re-rank checked the RAW string,
        sorting ascending and returning the WORST retained candidates.
        Both orderings now derive from one canonical direction."""
        q, c = sides
        pos = spark.createDataFrame(
            [(i, 10 + i) for i in range(10)], "query_id long, corpus_id long"
        )
        key = lambda rows: sorted(  # noqa: E731
            (r["query_id"], r["rank"], r["corpus_id"]) for r in rows
        )
        canon = key(hard_negatives(q, c, pos, k=4, metric="cosine").collect())
        assert key(hard_negatives(q, c, pos, k=4, metric="COSINE").collect()) == canon
        l2 = key(hard_negatives(q, c, pos, k=4, metric="euclidean").collect())
        assert key(hard_negatives(q, c, pos, k=4, metric="L2").collect()) == l2

    def test_empty_positives(self, spark, sides):
        # no labels at all: hard negatives degrade to plain exact top-k
        from polars_matmul_spark.operators.mining import hard_negatives
        from polars_matmul_spark.operators.similarity_join import (
            topk_join_exact,
        )

        q, c = sides
        empty_pos = spark.createDataFrame([], "query_id long, corpus_id long")
        got = sorted(
            (r.query_id, r.rank, r.corpus_id)
            for r in hard_negatives(q, c, empty_pos, k=3).collect()
        )
        want = sorted(
            (r.query_id, r.rank, r.corpus_id)
            for r in topk_join_exact(
                q, c, "query_id", "corpus_id", "q_emb", "c_emb", k=3
            ).collect()
        )
        assert got == want and len(got) > 0


class TestInBatchNegatives:
    def test_semantics_and_determinism(self, spark):
        pairs = spark.createDataFrame(
            [(i, 100 + i) for i in range(50)], "query_id long, corpus_id long"
        )
        a = in_batch_negatives(pairs, n_batches=4)
        rows = a.collect()
        assert len(rows) > 0
        for r in rows:
            assert r["neg_corpus_id"] != r["corpus_id"]
        # deterministic + partitioning-invariant
        b = in_batch_negatives(pairs.repartition(7), n_batches=4)
        ka = sorted(map(tuple, ((r["query_id"], r["neg_corpus_id"]) for r in rows)))
        kb = sorted(
            (r["query_id"], r["neg_corpus_id"]) for r in b.collect()
        )
        assert ka == kb
        # every in-batch pairing is used: for each batch of size s,
        # each query gets s-1 negatives
        import collections

        per_q = collections.Counter(r["query_id"] for r in rows)
        batch_of = {r["query_id"]: r["batch_id"] for r in rows}
        bsize = collections.Counter(batch_of.values())
        for qid, n in per_q.items():
            assert n == bsize[batch_of[qid]] - 1

    def test_validation(self, spark):
        pairs = spark.createDataFrame([(1, 2)], "query_id long, corpus_id long")
        with pytest.raises(ValueError, match="positive"):
            in_batch_negatives(pairs, 0)
