"""The four exact similarity paths must agree on the same input.

1. broadcast pandas-UDF kernel   (functions.topk — reference-faithful)
2. SQL crossJoin + window        (operators.similarity_join.topk_join_exact)
3. blocked local-topk + merge    (operators.similarity_join.topk_join_blocked)
4. MLlib BlockMatrix multiply    (operators.mllib_matmul.blockmatrix_topk)

Dot metric (no normalization differences); scores rounded to 9
decimals to absorb BLAS-order ulps; result SETS of (query, corpus)
pairs and rounded scores must be identical.
"""

import numpy as np
from pyspark.sql import functions as F

from polars_matmul_spark.functions import topk_exploded
from polars_matmul_spark.kernels import to_matrix
from polars_matmul_spark.operators.mllib_matmul import blockmatrix_topk
from polars_matmul_spark.operators.similarity_join import (
    topk_join_blocked,
    topk_join_exact,
)
from polars_matmul_spark.sources.tables import load_table

K = 5


def _canon(pdf, qcol, ccol, scol):
    return sorted(
        (int(q), int(c), round(float(s), 9))
        for q, c, s in zip(pdf[qcol], pdf[ccol], pdf[scol])
    )


def test_all_exact_paths_same_answer(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    c = emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 250)).select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )

    # 1. broadcast kernel (index = corpus position -> +50)
    cpdf = c.orderBy("corpus_id").toPandas()
    corpus = to_matrix(cpdf["embedding"].tolist())
    p1 = topk_exploded(q, F.col("embedding"), corpus, k=K, metric="dot", keep=["query_id"]).toPandas()
    p1["corpus_id"] = p1["index"] + 50
    r1 = _canon(p1, "query_id", "corpus_id", "score")

    # 2. SQL window form
    p2 = topk_join_exact(
        q.withColumnRenamed("embedding", "q_emb"),
        c.withColumnRenamed("embedding", "c_emb"),
        "query_id", "corpus_id", "q_emb", "c_emb", k=K, metric="dot",
    ).toPandas()
    r2 = _canon(p2, "query_id", "corpus_id", "score")

    # 3. blocked distributed form
    p3 = topk_join_blocked(q, c, k=K, metric="dot").toPandas()
    r3 = _canon(p3, "query_id", "corpus_id", "score")

    # 4. MLlib BlockMatrix form (needs dense 0-based corpus ids)
    c0 = c.withColumn("corpus_id", F.col("corpus_id") - 50)
    p4 = blockmatrix_topk(q, c0, k=K).toPandas()
    p4["corpus_id"] = p4["corpus_id"] + 50
    r4 = _canon(p4, "query_id", "corpus_id", "score")

    assert r1 == r2 == r3 == r4
    assert len(r1) == 20 * K
