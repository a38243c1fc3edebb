"""Int8 embedding quantization — the storage/shuffle scale lever.

At 100 TB an `array<float>` embedding column is usually the widest
thing in the table; symmetric per-vector int8 quantization cuts it 4x
(storage, scan bytes, shuffle bytes, broadcast size) at ~0.2-0.5% top-k
recall loss. The classic layout: store int8 + one float scale per
vector, search on int8, exact-rerank a shortlist in full precision.

All pure Catalyst column expressions (single-level higher-order
functions only — nested lambdas defeat whole-stage codegen):

- ``quantize_int8``    embedding -> (qvec array<tinyint>, qscale float)
- ``int8_dot``         approximate dot: qscale_a*qscale_b*sum(qa*qb)
- ``int8_cosine``      approximate cosine DIRECTLY on int8 vectors —
                       the per-vector scales cancel in the ratio, so no
                       dequantize step exists at all
- ``quantized_topk_rerank``  int8 shortlist (k*factor) -> full-precision
                       rerank -> exact top-k ordering on the shortlist
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_matmul_spark.operators.similarity_join import _fold_dot, score_expr

__all__ = ["quantize_int8", "int8_dot", "int8_cosine", "quantized_topk_rerank"]


def quantize_int8(
    df: DataFrame, emb_col: str = "embedding", prefix: str = "q"
) -> DataFrame:
    """Symmetric per-vector int8: scale = max|x|/127, q_i = round(x_i/scale).

    max|x| maps to exactly +-127, so no clamp is needed. Zero vectors get
    scale 1.0 (all-zero codes decode to the zero vector). Adds columns
    ``{prefix}vec`` (array<tinyint>) and ``{prefix}scale`` (float) and
    drops the original embedding — the point is not to carry it.
    """
    x = F.col(emb_col).cast("array<double>")
    amax = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    qvec = F.transform(x, lambda v: F.round(v / F.col(f"{prefix}scale")).cast("tinyint"))
    return (
        df.withColumn(f"{prefix}scale", scale.cast("float"))
        .withColumn(f"{prefix}vec", qvec)
        .drop(emb_col)
    )


def int8_dot(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Approximate dot product of two quantized vectors."""
    return (sa.cast("double") * sb.cast("double") * _fold_dot(qa, qb)).alias("dot")


def int8_cosine(qa: Column, qb: Column) -> Column:
    """Approximate cosine directly on int8 code vectors.

    cos(sa*a, sb*b) == cos(a, b): positive per-vector scales cancel, so
    the quantized-domain cosine needs no scales and no dequantization.
    Same per-norm zero guard as the exact path (eps on the int-domain
    norms; a zero CODE vector scores 0.0 against everything).
    """
    dot = _fold_dot(qa, qb)
    na = F.sqrt(_fold_dot(qa, qa))
    nb = F.sqrt(_fold_dot(qb, qb))
    return F.when((na > 1e-10) & (nb > 1e-10), dot / (na * nb)).otherwise(F.lit(0.0))


def quantized_topk_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    rerank_factor: int = 4,
    q_id: str = "query_id",
    c_id: str = "corpus_id",
) -> DataFrame:
    """Two-stage search: int8 shortlist, full-precision rerank.

    Stage 1 scans the QUANTIZED corpus (4x fewer bytes moved; at
    cluster scale this is the stored form — quantize once at ingest)
    and keeps the top ``k*rerank_factor`` per query by int8 cosine.
    Stage 2 joins the shortlist — k*factor rows per query, not the
    corpus — back to full-precision embeddings and reranks exactly.

    Returns (q_id, rank, c_id, score) with exact scores; approximation
    only affects which candidates make the shortlist (recall gated in
    tests/test_quantize.py). Both argselect stages are windows over
    per-query groups — stage 1's input is the scored scan (same order
    of work as brute force but on int8 arithmetic), stage 2's is
    k*factor rows per query.
    """
    # int8 code norms once per ROW before the cross join (the naive
    # int8_cosine form would recompute both norms per PAIR — 3x the
    # fold work on the n_q x n_c product); same arithmetic, same values
    qq = quantize_int8(queries, prefix="q_").withColumn(
        "__qn", F.sqrt(_fold_dot(F.col("q_vec"), F.col("q_vec")))
    )
    cq = quantize_int8(corpus, prefix="c_").withColumn(
        "__cn", F.sqrt(_fold_dot(F.col("c_vec"), F.col("c_vec")))
    )
    approx = F.when(
        (F.col("__qn") > 1e-10) & (F.col("__cn") > 1e-10),
        _fold_dot(F.col("q_vec"), F.col("c_vec")) / (F.col("__qn") * F.col("__cn")),
    ).otherwise(F.lit(0.0))
    scored = qq.crossJoin(F.broadcast(cq)).withColumn("__approx", approx)
    w1 = Window.partitionBy(q_id).orderBy(F.desc("__approx"), F.asc(c_id))
    shortlist = (
        scored.withColumn("__r", F.row_number().over(w1))
        .filter(F.col("__r") <= k * rerank_factor)
        .select(q_id, c_id)
    )
    exact = (
        shortlist.join(queries.select(q_id, F.col("embedding").alias("__qe")), q_id)
        .join(F.broadcast(corpus.select(c_id, F.col("embedding").alias("__ce"))), c_id)
        .withColumn("score", score_expr(F.col("__qe"), F.col("__ce"), "cosine"))
    )
    w2 = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id, "rank", c_id, "score")
    )


# --- float16 storage path --------------------------------------------------
#
# The reference documents f16 as STORAGE-ONLY: unsupported for compute
# (reference README.md:154-156 — "Float16: not supported ... convert to
# Float32"). Spark SQL likewise has no half-precision type, so the
# storage form here is a binary column of packed IEEE-754 half floats
# (2 bytes/element, half the bytes of array<float> before parquet
# encoding) and compute ALWAYS promotes to f32 on unpack — the same
# contract as the reference, with the conversion built in rather than
# left to the user.


def pack_f16(
    df: DataFrame, emb_col: str = "embedding", out_col: str = "emb_f16"
) -> DataFrame:
    """embedding array<float|double> -> packed half-float binary.

    Arrow-batched pandas UDF (the hot loop is one ``np.stack`` +
    ``astype(float16)`` + per-row ``tobytes`` — no per-element Python).
    Values outside f16 range (|x| > 65504) saturate to +-inf, matching
    NumPy's cast; embeddings are normalized in practice so this is a
    non-issue, but it is the documented edge.
    """
    @F.pandas_udf("binary")
    def _pack(s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if v is None else np.asarray(v, dtype=np.float16).tobytes()
                for v in s
            ],
            dtype=object,
        )

    return df.withColumn(out_col, _pack(F.col(emb_col))).drop(emb_col)


def unpack_f16(
    df: DataFrame, bin_col: str = "emb_f16", out_col: str = "embedding"
) -> DataFrame:
    """Packed half-float binary -> array<float> (compute form).

    Promotion to f32 on the way out is the reference's f16 rule: storage
    may be half-width, compute never is.
    """
    @F.pandas_udf("array<float>")
    def _unpack(s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if b is None
                else np.frombuffer(b, dtype=np.float16).astype(np.float32)
                for b in s
            ],
            dtype=object,
        )

    return df.withColumn(out_col, _unpack(F.col(bin_col))).drop(bin_col)
