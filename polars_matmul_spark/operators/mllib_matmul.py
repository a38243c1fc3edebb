"""MLlib distributed linear algebra path for the matmul surface.

The broadcast pandas-UDF kernel (functions/similarity.py) assumes the
corpus fits in one executor's memory. When BOTH sides are too large,
the remaining exact option is distributed block matrix multiplication:
``BlockMatrix.multiply`` shuffles compatible blocks together and runs a
local GEMM per block pair — O(n_q x n_c) output, but no single node
ever holds either full matrix. This is the reference's `Q @ C^T`
(src/matmul.rs:295-417) at the scale where nothing broadcasts.

Returns are flattened back to the (query_id, corpus_id, score) triple
form so the result composes with the rest of the DataFrame surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["blockmatrix_matmul"]


def blockmatrix_matmul(
    queries: DataFrame,
    corpus: DataFrame,
    q_id: str = "query_id",
    c_id: str = "corpus_id",
    emb_col: str = "embedding",
    block_size: int = 1024,
) -> DataFrame:
    """Exact all-pairs dot products via MLlib BlockMatrix multiply.

    queries/corpus: (id, embedding array<numeric>). Ids must be
    0..n-1-dense per side (use row_number()-1 upstream if not) — they
    become matrix row indices. Returns (q_id, c_id, score double) for
    EVERY pair, including exact-zero dot products (orthogonal vectors
    score 0.0 rather than vanishing): the result is read back through
    ``toIndexedRowMatrix`` dense rows, not ``toCoordinateMatrix``,
    which silently drops entries whose value is exactly 0.0.
    """
    from pyspark.ml.functions import vector_to_array
    from pyspark.mllib.common import callMLlibFunc
    from pyspark.mllib.linalg import Vectors
    from pyspark.mllib.linalg.distributed import IndexedRow, IndexedRowMatrix

    def to_irm(df: DataFrame, id_col: str) -> IndexedRowMatrix:
        rdd = df.select(id_col, emb_col).rdd.map(
            lambda r: IndexedRow(r[0], Vectors.dense(r[1]))
        )
        return IndexedRowMatrix(rdd)

    q_bm = to_irm(queries, q_id).toBlockMatrix(block_size, block_size)
    # C^T: transpose the corpus block matrix (block-level, no collect)
    ct_bm = to_irm(corpus, c_id).toBlockMatrix(block_size, block_size).transpose()
    product = q_bm.multiply(ct_bm)  # (n_q x n_c) scores, block-partitioned

    # Readback stays JVM-side: the Python `.rows` property would pull
    # every IndexedRow through pickling and the old flatMap pushed all
    # n_q x n_c entries through per-element Python — the bottleneck at
    # exactly the nothing-broadcasts scale this operator exists for.
    # Instead grab the (index, vector) DataFrame that the JVM already
    # materializes for that property and posexplode the vector as a
    # Generate, so the whole flatten is whole-stage-codegen.
    irm = product.toIndexedRowMatrix()
    rows_df = callMLlibFunc("getIndexedRows", irm._java_matrix_wrapper._java_model)
    return rows_df.select(
        F.col("index").alias(q_id),
        F.posexplode(vector_to_array(F.col("vector"), "float64")).alias(
            c_id, "score"
        ),
    ).select(F.col(q_id), F.col(c_id).cast("long"), F.col("score"))


def blockmatrix_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "query_id",
    c_id: str = "corpus_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Top-k by raw dot product over the BlockMatrix scores (window
    per query, rank tie-broken by corpus id)."""
    from pyspark.sql import Window

    scores = blockmatrix_matmul(queries, corpus, q_id, c_id, emb_col)
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id, "rank", c_id, "score")
    )
