"""MLlib BlockMatrix path vs the NumPy kernel (the two exact matmul
paths must agree to rounding)."""

import numpy as np
from pyspark.sql import functions as F

from polars_matmul_spark import kernels as K
from polars_matmul_spark.operators.mllib_matmul import blockmatrix_topk
from polars_matmul_spark.sources.tables import load_table


def test_blockmatrix_topk_matches_kernel(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    c = emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 150)).select(
        (F.col("vec_id") - 50).alias("corpus_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    got = blockmatrix_topk(q, c, k=5).toPandas()

    qp = q.orderBy("query_id").toPandas()
    cp = c.orderBy("corpus_id").toPandas()
    Q = np.stack(qp["embedding"].to_numpy())
    C = np.stack(cp["embedding"].to_numpy())
    idx, scores = K.topk(Q, C, 5, "dot")

    assert len(got) == 8 * 5
    for qi, grp in got.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert np.allclose(grp["score"].to_numpy(), scores[qi], rtol=1e-9)
        assert grp["corpus_id"].tolist() == idx[qi].tolist()


def test_blockmatrix_orthogonal_pairs_score_zero(spark):
    # exact-zero dot products must be PRESENT with score 0.0, not
    # dropped (the CoordinateMatrix readback silently omitted them)
    import pandas as pd

    from polars_matmul_spark.operators.mllib_matmul import blockmatrix_matmul

    q = spark.createDataFrame(
        pd.DataFrame({"query_id": [0, 1], "embedding": [[1.0, 0.0], [0.0, 1.0]]})
    )
    c = spark.createDataFrame(
        pd.DataFrame({"corpus_id": [0, 1], "embedding": [[0.0, 1.0], [1.0, 1.0]]})
    )
    got = blockmatrix_matmul(q, c).toPandas().sort_values(["query_id", "corpus_id"])
    assert len(got) == 4  # every pair, including the orthogonal one
    assert got["score"].tolist() == [0.0, 1.0, 1.0, 1.0]


def test_blockmatrix_readback_is_jvm_side(spark):
    # the flatten of the (n_q x n_c) product must be a Catalyst
    # Generate (posexplode over vector_to_array), never a Python
    # flatMap pickling every element — pin it in the physical plan
    import pandas as pd

    from polars_matmul_spark.operators.mllib_matmul import blockmatrix_matmul

    q = spark.createDataFrame(
        pd.DataFrame({"query_id": [0, 1], "embedding": [[1.0, 0.0], [0.0, 1.0]]})
    )
    c = spark.createDataFrame(
        pd.DataFrame({"corpus_id": [0, 1], "embedding": [[0.0, 1.0], [1.0, 1.0]]})
    )
    plan = blockmatrix_matmul(q, c)._jdf.queryExecution().executedPlan().toString()
    assert "Generate posexplode" in plan
    # the only scan is the JVM object scan of IndexedRows; no
    # BatchEvalPython / PythonRDD stage evaluates the elements
    assert "BatchEvalPython" not in plan and "EvalPython" not in plan
