"""Int8 quantization: roundtrip error, cosine scale-cancellation,
recall of the shortlist+rerank search, and the 4x storage claim."""

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.quantize import (
    int8_cosine,
    int8_dot,
    quantize_int8,
    quantized_topk_rerank,
)
from polars_matmul_spark.operators.similarity_join import topk_join_blocked
from polars_matmul_spark.sources.tables import load_table


def _emb_frames(spark, sf_dir, n_q=20):
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = emb.filter(F.col("vec_id") >= n_q).select(
        F.col("vec_id").alias("corpus_id"), "embedding"
    )
    return q, c


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    """|x - scale*q| <= scale/2 per element (symmetric round-to-nearest)."""
    emb = load_table(spark, "embeddings", sf_dir).limit(50)
    qdf = quantize_int8(emb.select("vec_id", "embedding"), prefix="q_")
    joined = qdf.join(emb.select("vec_id", "embedding"), "vec_id")
    rows = joined.collect()
    assert rows
    for r in rows:
        x = np.asarray(r.embedding, dtype=np.float64)
        dec = float(r.q_scale) * np.asarray(r.q_vec, dtype=np.float64)
        assert np.max(np.abs(x - dec)) <= float(r.q_scale) / 2 + 1e-7
        assert max(abs(v) for v in r.q_vec) <= 127


def test_int8_cosine_close_to_exact(spark, sf_dir):
    """Quantized-domain cosine within 0.02 of float cosine (256-dim)."""
    q, c = _emb_frames(spark, sf_dir, n_q=5)
    qq = quantize_int8(q, prefix="q_")
    cq = quantize_int8(c.limit(50), prefix="c_")
    approx = qq.crossJoin(cq).select(
        "query_id", "corpus_id", int8_cosine(F.col("q_vec"), F.col("c_vec")).alias("a")
    )
    from polars_matmul_spark.operators.similarity_join import score_expr

    exact = (
        q.crossJoin(
            c.limit(50).select("corpus_id", F.col("embedding").alias("c_emb"))
        ).select(
            "query_id",
            "corpus_id",
            score_expr(F.col("embedding"), F.col("c_emb"), "cosine").alias("e"),
        )
    )
    m = approx.join(exact, ["query_id", "corpus_id"]).collect()
    assert m
    for r in m:
        assert abs(r.a - r.e) < 0.02, (r.query_id, r.corpus_id, r.a, r.e)


def test_int8_dot_scales_applied(spark):
    df = spark.createDataFrame([(1, [2.0, -4.0, 8.0])], "id long, embedding array<double>")
    qdf = quantize_int8(df, prefix="q_")
    r = qdf.select(
        int8_dot(F.col("q_vec"), F.col("q_scale"), F.col("q_vec"), F.col("q_scale")).alias("d")
    ).collect()[0]
    exact = 2.0**2 + 4.0**2 + 8.0**2
    assert math.isclose(r.d, exact, rel_tol=0.01)


@pytest.mark.slow
def test_zero_vector_handling(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "id long, embedding array<double>"
    )
    qdf = quantize_int8(df, prefix="q_")
    rows = {r.id: r for r in qdf.collect()}
    assert rows[1].q_scale == 1.0
    assert list(rows[1].q_vec) == [0, 0]
    pair = qdf.filter(F.col("id") == 1).crossJoin(
        qdf.filter(F.col("id") == 2).select(F.col("q_vec").alias("v2"))
    )
    assert pair.select(int8_cosine(F.col("q_vec"), F.col("v2")).alias("c")).collect()[0].c == 0.0


def test_rerank_recall_vs_exact(spark, sf_dir):
    """Shortlist+rerank top-5 vs exact top-5: recall >= 0.95, and every
    returned score is the EXACT score (approximation never leaks into
    the output values)."""
    q, c = _emb_frames(spark, sf_dir, n_q=20)
    exact = topk_join_blocked(q, c, k=5, metric="cosine")
    approx = quantized_topk_rerank(q, c, k=5, rerank_factor=4)
    e = {(r.query_id, r.corpus_id): r.score for r in exact.collect()}
    a = {(r.query_id, r.corpus_id): r.score for r in approx.collect()}
    assert len(e) == len(a)
    hit = sum(1 for key in a if key in e)
    assert hit / len(e) >= 0.95
    # rel_tol 1e-6: both sides are full-precision, but the two plans can
    # sum the f32-sourced products in different orders
    for key in a:
        if key in e:
            assert math.isclose(a[key], e[key], rel_tol=1e-6)


def test_storage_4x_smaller(spark, sf_dir, tmp_path):
    """Quantized parquet is at least 2.5x smaller than float parquet
    (4x raw; parquet framing/encoding eats some of it)."""
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    f_path = os.path.join(str(tmp_path), "full")
    q_path = os.path.join(str(tmp_path), "quant")
    emb.write.mode("overwrite").parquet(f_path)
    quantize_int8(emb, prefix="q_").write.mode("overwrite").parquet(q_path)

    def _bytes(p):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )

    assert _bytes(f_path) / _bytes(q_path) >= 2.5


class TestF16Storage:
    def test_roundtrip_within_half_precision(self, spark, sf_dir):
        import numpy as np

        from polars_matmul_spark.operators.quantize import pack_f16, unpack_f16
        from polars_matmul_spark.sources.tables import load_table

        emb = load_table(spark, "embeddings", sf_dir).limit(200)
        orig = emb.orderBy("vec_id").toPandas()
        back = (
            unpack_f16(pack_f16(emb))
            .orderBy("vec_id")
            .toPandas()
        )
        A = np.stack(orig["embedding"].to_numpy()).astype(np.float64)
        B = np.stack(back["embedding"].to_numpy()).astype(np.float64)
        # half has ~3 decimal digits: rel err bound 2^-10
        np.testing.assert_allclose(B, A, rtol=1.5e-3, atol=1e-6)

    def test_compute_form_is_f32(self, spark, sf_dir):
        from polars_matmul_spark.operators.quantize import pack_f16, unpack_f16
        from polars_matmul_spark.sources.tables import load_table

        emb = load_table(spark, "embeddings", sf_dir).limit(10)
        out = unpack_f16(pack_f16(emb))
        assert out.schema["embedding"].dataType.simpleString() == "array<float>"

    def test_parquet_bytes_shrink(self, spark, sf_dir, tmp_path):
        import os

        from polars_matmul_spark.operators.quantize import pack_f16
        from polars_matmul_spark.sources.tables import load_table

        emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
        emb.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "f32"))
        pack_f16(emb).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "f16"))

        def sz(d):
            return sum(
                os.path.getsize(os.path.join(d, f))
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )

        # random floats barely compress, so the 2-bytes-vs-4 ratio
        # should survive parquet encoding nearly intact
        assert sz(str(tmp_path / "f16")) < 0.65 * sz(str(tmp_path / "f32"))

    def test_null_rows_pass_through(self, spark):
        import pandas as pd

        from polars_matmul_spark.operators.quantize import pack_f16, unpack_f16

        df = spark.createDataFrame(
            pd.DataFrame({"vec_id": [0, 1], "embedding": [[1.5, -2.25], None]})
        )
        out = unpack_f16(pack_f16(df)).orderBy("vec_id").collect()
        assert out[0]["embedding"] == [1.5, -2.25]  # exact in f16
        assert out[1]["embedding"] is None

    def test_f16_storage_composes_with_topk(self, spark, sf_dir):
        # the documented f16 contract: store half, compute f32 — the
        # unpacked column must feed the kernel path and agree with the
        # full-precision answer on which neighbors it finds
        import numpy as np

        from polars_matmul_spark import kernels as K
        from polars_matmul_spark.functions import topk_exploded
        from polars_matmul_spark.operators.quantize import pack_f16, unpack_f16
        from polars_matmul_spark.sources.tables import load_table

        emb = load_table(spark, "embeddings", sf_dir)
        q = emb.filter("vec_id < 20").select("vec_id", "embedding")
        c = emb.filter("vec_id >= 50").orderBy("vec_id")
        cp = c.toPandas()
        C = np.stack(cp["embedding"].to_numpy()).astype(np.float64)

        q16 = unpack_f16(pack_f16(q))
        from pyspark.sql import functions as F

        got = (
            topk_exploded(q16, F.col("embedding"), C, k=5, keep=["vec_id"])
            .toPandas()
            .groupby("vec_id")["index"]
            .apply(set)
        )
        qp = q.orderBy("vec_id").toPandas()
        Q = np.stack(qp["embedding"].to_numpy()).astype(np.float64)
        idx, _ = K.topk(Q, C, 5, "cosine")
        exact = {qid: set(idx[i]) for i, qid in enumerate(qp["vec_id"])}
        overlap = sum(len(got[qid] & exact[qid]) for qid in exact)
        # half-precision perturbs scores by ~1e-3 relative; at k=5 on
        # 450 corpus rows the neighbor sets stay essentially identical
        assert overlap >= 0.9 * 5 * len(exact)
