"""Similarity matmul / top-k as Spark Column functions — the
reference-faithful "broadcast corpus" path.

Maps the reference plugin surface (python/polars_matmul/__init__.py:63-196)
to idiomatic Spark:

- the corpus is a *materialized* host object (NumPy matrix), exactly as
  the reference requires a materialized ``pl.Series`` and rejects
  expressions with TypeError (python/polars_matmul/__init__.py:109-114).
  Here it ships to executors as a SparkContext broadcast — the
  distributed analog of the reference's broadcast-by-closure.
- the kernel runs inside an Arrow-batched pandas UDF: JVM -> Arrow ->
  NumPy BLAS, the Spark analog of the reference's GIL-released Rust/faer
  call (src/lib.rs:45, src/metrics.rs:85-93).
- output schemas are DECLARED to Catalyst via returnType, like the
  reference's return_dtype declaration (python/polars_matmul/__init__.py:118).
- pandas UDFs are elementwise (row-preserving), so Catalyst pushes
  filters/projections around them — the is_elementwise=True analog.

Scale note (100 TB): this path requires the corpus to fit in executor
memory (same constraint as the reference's single-node Series). Queries
are partitioned across executors, corpus broadcast once per executor —
embarrassingly parallel, no shuffle at all. For corpora beyond broadcast
size, use ``polars_matmul_spark.operators.similarity_join`` (the
partitioned crossJoin+window exact path) or ``operators.ann`` (IVF/LSH).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_matmul_spark import kernels as K

__all__ = [
    "matmul",
    "matmul_arrow",
    "matmul_flatten",
    "matmul_flatten_series",
    "topk",
    "topk_arrow",
    "topk_exploded",
    "corpus_to_matrix",
]


TOPK_ELEMENT = T.StructType(
    [
        # reference index is u32 (src/matmul.rs:482); Spark has no unsigned
        # ints, so we use long — safe past 2^31 corpus rows (SURVEY §7.4)
        T.StructField("index", T.LongType(), False),
        # score is ALWAYS f64, even on the f32 path (src/matmul.rs:446-447)
        T.StructField("score", T.DoubleType(), False),
    ]
)
TOPK_TYPE = T.ArrayType(TOPK_ELEMENT, containsNull=False)


def corpus_to_matrix(corpus) -> np.ndarray:
    """Materialize a corpus argument into a dense 2-D ndarray.

    Accepts ndarray (n, d), pandas Series of vectors, or a list of
    vectors. Spark Columns / DataFrames are rejected with TypeError,
    mirroring the reference's Series-only contract
    (python/polars_matmul/__init__.py:109-114, 159-163).
    """
    if isinstance(corpus, (Column, DataFrame)):
        raise TypeError(
            "corpus must be a materialized matrix (numpy ndarray, pandas "
            "Series, or list of vectors), not a Spark Column/DataFrame. "
            "Collect it first (it must fit in memory — that is the "
            "contract of the broadcast path), or use "
            "polars_matmul_spark.operators.similarity_join for the "
            "fully-distributed exact path."
        )
    if isinstance(corpus, np.ndarray):
        if corpus.ndim != 2:
            corpus = K.to_matrix(list(corpus))
        mat = corpus
    elif isinstance(corpus, pd.Series):
        mat = K.to_matrix(corpus.tolist())
    elif isinstance(corpus, Iterable):
        mat = K.to_matrix(list(corpus))
    else:
        raise TypeError(f"Unsupported corpus type: {type(corpus).__name__}")
    if mat.shape[0] == 0:
        # reference: empty corpus errors with "Empty series" (src/matmul.rs:134)
        raise ValueError("Empty series: corpus has no rows")
    return mat


def _active_sc():
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("No active SparkSession")
    return spark.sparkContext


def _batch_to_matrix(s: pd.Series, dtype=None) -> np.ndarray:
    """Arrow batch (Series of ndarrays) -> dense (n, d) matrix.

    One np.stack per batch — the Spark analog of the reference's
    zero-copy contiguous extraction (src/matmul.rs:21-95): no
    per-element Python loop in the common (null-free) case.
    Null elements inside vectors become 0.0 (src/matmul.rs:251); whole
    null rows become zero vectors.
    """
    vals = s.to_numpy()
    n = len(vals)
    if n == 0:
        return np.empty((0, 0), dtype=dtype or np.float64)
    first = vals[0]
    if first is None:
        raise ValueError("First element is null")
    try:
        mat = np.stack(vals)  # keeps the Arrow dtype (f32 stays f32)
        if dtype is not None:
            mat = mat.astype(dtype, copy=False)
        elif not np.issubdtype(mat.dtype, np.floating):
            mat = mat.astype(np.float64)
    except ValueError:
        # ragged rows or None rows: fall back to the careful path
        dim = len(first)
        mat = np.zeros((n, dim), dtype=dtype or np.float64)
        for i, v in enumerate(vals):
            if v is None:
                continue
            a = np.asarray(v, dtype=np.float64)
            if a.shape[0] != dim:
                raise ValueError(
                    f"Dimension mismatch: left has {dim} dimensional "
                    f"vectors, right has {a.shape[0]} dimensional vectors"
                )
            mat[i, :] = a
    # null float elements arrive from Arrow as NaN -> 0.0 per the
    # reference's null-element rule (src/matmul.rs:192, 224)
    return np.nan_to_num(mat, nan=0.0, copy=False)


def _input_is_f32(df_or_col_dtype) -> bool:
    return isinstance(df_or_col_dtype, T.ArrayType) and isinstance(
        df_or_col_dtype.elementType, T.FloatType
    )


def topk(col, corpus, k: int, metric: str = "cosine") -> Column:
    """Fused similarity top-k against a broadcast corpus.

    Returns ``array<struct<index: long, score: double>>`` sorted
    best-first (direction per metric), with k clamped to n_corpus.
    Reference: Expr.pmm.topk (python/polars_matmul/__init__.py:63-119,
    src/matmul.rs:419-519).
    """
    K._canonical_metric(metric)  # validate eagerly, like the Python wrapper
    mat = corpus_to_matrix(corpus)
    bc = _active_sc().broadcast(mat)
    kk = int(k)

    @F.pandas_udf(TOPK_TYPE)
    def _topk_udf(s: pd.Series) -> pd.Series:
        C = bc.value
        Q = _batch_to_matrix(s)  # keep native dtype: f32 stays f32
        if Q.shape[0] == 0:
            return pd.Series([], dtype=object)
        # f32 kernel iff BOTH sides f32 (src/matmul.rs:307-314)
        Q = Q.astype(K.promote_dtype(Q.dtype, C.dtype), copy=False)
        idx, sc = K.topk(Q, C, kk, metric)
        return pd.Series(
            [
                [{"index": int(i), "score": float(v)} for i, v in zip(row_i, row_s)]
                for row_i, row_s in zip(idx, sc)
            ]
        )

    return _topk_udf(col)


def matmul(col, corpus, flatten: bool = False, input_is_f32: bool = False) -> Column:
    """All-pairs dot products: for each query row, an array of scores
    against every corpus row (``Q @ C.T`` row).

    Output element type follows the promotion rule from BOTH sides
    (f32 iff both sides f32, src/matmul.rs:307-314) — fixing the
    reference's corpus-only-dtype wrinkle (SURVEY §1.2). Because a bare
    Column's dtype is unknown at plan time, the caller asserts the input
    width with ``input_is_f32`` (the DataFrame helpers in
    ``operators.similarity`` resolve it from the schema automatically).

    ``flatten=True`` returns a generator expression
    (``explode(matmul(...))``): used in a ``select``/``withColumn`` it
    yields one row per (query, corpus) pair in the reference's
    row-major order — the Column-level analog of Polars'
    ``map_batches(is_elementwise=False)``
    (python/polars_matmul/__init__.py:173-187). Spark's generator
    restrictions apply (one generator per select list, not nestable
    inside other expressions); for multi-generator plans or to carry
    query ids through shuffles use :func:`matmul_flatten` /
    :func:`matmul_flatten_series`.
    """
    if flatten:
        return F.explode(matmul(col, corpus, input_is_f32=input_is_f32))
    mat = corpus_to_matrix(corpus)
    bc = _active_sc().broadcast(mat)
    out_np = K.promote_dtype(
        np.float32 if input_is_f32 else np.float64, mat.dtype
    )
    out_elem = T.FloatType() if out_np == np.float32 else T.DoubleType()

    @F.pandas_udf(T.ArrayType(out_elem, containsNull=False))
    def _matmul_udf(s: pd.Series) -> pd.Series:
        C = bc.value
        Q = _batch_to_matrix(s, out_np)
        if Q.shape[0] == 0:
            return pd.Series([], dtype=object)
        S = K.similarity_matrix(Q, C.astype(out_np, copy=False), "dot")
        return pd.Series(list(S.astype(out_np, copy=False)))

    return _matmul_udf(col)


def matmul_flatten(
    df: DataFrame,
    col,
    corpus,
    out_col: str = "score",
    keep: list[str] | None = None,
    input_is_f32: bool = False,
) -> DataFrame:
    """``matmul(flatten=True)`` analog: one row per (query, corpus) pair
    in row-major (query-major) order — n_q * n_c rows total.

    The reference implements this as an is_elementwise=False map_batches
    (python/polars_matmul/__init__.py:173-187). In Spark the idiomatic
    equivalent is matmul + posexplode — Catalyst knows the row count
    changes and plans accordingly (SURVEY §2.1 N2). ``keep`` preserves
    query-id columns so row-major order is recoverable after shuffles.
    """
    nested = matmul(col, corpus, input_is_f32=input_is_f32)
    return df.select(*(keep or []), F.posexplode(nested).alias("corpus_index", out_col))


def matmul_flatten_series(
    df: DataFrame,
    col,
    corpus,
    out_col: str = "score",
    input_is_f32: bool = False,
) -> DataFrame:
    """The reference's column-level ``matmul(flatten=True)`` ported 1:1
    (python/polars_matmul/__init__.py:173-187, test
    tests/test_polars_matmul.py:204-222): a single-column DataFrame of
    ``n_q * n_c`` scores in row-major (query-major) order, element type
    following the f32-iff-both-f32 promotion rule.

    Order note: explode preserves intra-partition row order and
    ``collect()`` concatenates partitions in order, so with no shuffle
    between this call and the collect the reference's global row-major
    order holds exactly — the same contract as Polars' ``to_numpy()``
    interop use. If a shuffle may intervene, use :func:`matmul_flatten`
    with ``keep=[query_id]`` and sort.
    """
    return matmul_flatten(
        df, col, corpus, out_col=out_col, input_is_f32=input_is_f32
    ).select(out_col)


def _arrow_list_to_matrix(arr, dtype=None, expected_dim=None) -> np.ndarray:
    """Arrow list column -> dense (n, d) matrix, reading the flat child
    buffer directly — the closest Spark gets to the reference's
    zero-copy contiguous extraction (src/matmul.rs:21-95): one
    ``reshape`` over the values buffer, no pandas, no per-row objects.
    Falls back to the careful row loop for ragged/null rows.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype or np.float64)
    offsets = arr.offsets.to_numpy()
    widths = np.diff(offsets)
    if arr.null_count == 0 and arr.values.null_count == 0 and (widths == widths[0]).all():
        values = arr.values.to_numpy(zero_copy_only=True)
        mat = values[offsets[0] : offsets[-1]].reshape(n, int(widths[0]))
        if dtype is not None:
            mat = mat.astype(dtype, copy=False)
        elif not np.issubdtype(mat.dtype, np.floating):
            mat = mat.astype(np.float64)
        return mat
    # distributed deviation from the reference's "First element is
    # null" rule (src/matmul.rs:238): a partition-local batch can start
    # with a null row even when the dataset has valid rows, so the
    # width is inferred from the first VALID row; only an all-null
    # batch is unrecoverable.
    rows = arr.to_pylist()
    first_valid = next((r for r in rows if r is not None), None)
    if first_valid is None:
        # an entirely-null batch: the width comes from the corpus when
        # the caller knows it (null vectors are zero vectors per
        # src/matmul.rs:251); without it the batch is unrecoverable
        if expected_dim is None:
            raise ValueError("First element is null")
        return np.zeros((n, expected_dim), dtype=dtype or np.float64)
    if rows[0] is None:
        rows = [first_valid] + rows[1:]
        mat = K.to_matrix(rows, dtype=dtype)
        mat[0, :] = 0.0
        return mat
    return K.to_matrix(rows, dtype=dtype)


def topk_arrow(
    df: DataFrame,
    emb_col: str,
    corpus,
    k: int,
    metric: str = "cosine",
    out_col: str = "matches",
) -> DataFrame:
    """Fused top-k as a ``mapInArrow`` transform — same semantics and
    output schema as :func:`topk`, minus the pandas layer.

    The pandas-UDF path pays two per-row costs at reference shapes
    (1000 x 10000 x 256): Arrow -> pandas object-Series materialization
    on input, and a Python list-of-dicts per row on output. Here the
    query batch is read straight off the Arrow list buffer (one
    reshape) and the result is assembled as flat index/score buffers +
    a ListArray offset vector — zero per-row Python. This is the
    engine's fast kernel path; ``topk`` remains the Column-level
    ergonomic form (and the `.pmm` namespace maps to it).

    All non-embedding columns pass through unchanged.
    """
    import pyarrow as pa

    K._canonical_metric(metric)
    mat = corpus_to_matrix(corpus)
    bc = _active_sc().broadcast(mat)
    kk = int(k)
    passthrough = [f.name for f in df.schema.fields if f.name != emb_col]
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != emb_col]
        + [T.StructField(out_col, TOPK_TYPE, False)]
    )

    def fn(batches):
        C = bc.value
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            # no nan_to_num here: unlike the pandas path, Arrow keeps
            # null elements distinct from NaN values — the fallback in
            # _arrow_list_to_matrix zeroes genuine nulls, and data NaNs
            # propagate into the NaN-safe topk exactly like the
            # reference (src/topk.rs:19-29)
            Q = _arrow_list_to_matrix(
                rb.column(rb.schema.get_field_index(emb_col)),
                expected_dim=C.shape[1],
            )
            Q = Q.astype(K.promote_dtype(Q.dtype, C.dtype), copy=False)
            idx, sc = K.topk(Q, C, kk, metric)
            kreal = idx.shape[1]
            struct = pa.StructArray.from_arrays(
                [
                    pa.array(idx.ravel(), type=pa.int64()),
                    pa.array(sc.ravel(), type=pa.float64()),
                ],
                ["index", "score"],
            )
            offs = pa.array(
                np.arange(0, n * kreal + 1, kreal, dtype=np.int32), type=pa.int32()
            )
            matches = pa.ListArray.from_arrays(offs, struct)
            cols = [
                rb.column(rb.schema.get_field_index(name)) for name in passthrough
            ]
            yield pa.RecordBatch.from_arrays(cols + [matches], names=passthrough + [out_col])

    return df.mapInArrow(fn, out_schema)


def matmul_arrow(
    df: DataFrame,
    emb_col: str,
    corpus,
    input_is_f32: bool = False,
    out_col: str = "scores",
) -> DataFrame:
    """All-pairs matmul as a ``mapInArrow`` transform — same semantics
    as :func:`matmul`, with the (n, n_corpus) score matrix emitted as
    ONE flat Arrow values buffer + an offsets vector instead of a
    pandas Series of per-row ndarrays. At reference shapes the output
    is the dominant cost (1000 x 10000 floats), so skipping the
    per-row object layer is the big win.
    """
    import pyarrow as pa

    mat = corpus_to_matrix(corpus)
    bc = _active_sc().broadcast(mat)
    out_np = K.promote_dtype(
        np.float32 if input_is_f32 else np.float64, mat.dtype
    )
    pa_elem = pa.float32() if out_np == np.float32 else pa.float64()
    out_elem = T.FloatType() if out_np == np.float32 else T.DoubleType()
    passthrough = [f.name for f in df.schema.fields if f.name != emb_col]
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != emb_col]
        + [T.StructField(out_col, T.ArrayType(out_elem, containsNull=False), False)]
    )

    def fn(batches):
        C = bc.value.astype(out_np, copy=False)
        for rb in batches:
            if rb.num_rows == 0:
                continue
            Q = _arrow_list_to_matrix(
                rb.column(rb.schema.get_field_index(emb_col)),
                out_np,
                expected_dim=C.shape[1],
            )
            n_c = C.shape[0]
            # Spark only accepts 32-bit-offset List from mapInArrow, so
            # cap rows-per-emitted-batch to keep n*n_c under 2^31
            step = max(1, (2**31 - 2) // max(n_c, 1))
            for lo in range(0, rb.num_rows, step):
                sub = rb.slice(lo, step)
                n = sub.num_rows
                S = K.similarity_matrix(Q[lo : lo + n], C, "dot")
                values = pa.array(S.ravel().astype(out_np, copy=False), type=pa_elem)
                offs = pa.array(
                    np.arange(0, n * n_c + 1, n_c, dtype=np.int32), type=pa.int32()
                )
                scores = pa.ListArray.from_arrays(offs, values)
                cols = [
                    sub.column(sub.schema.get_field_index(name)) for name in passthrough
                ]
                yield pa.RecordBatch.from_arrays(
                    cols + [scores], names=passthrough + [out_col]
                )

    return df.mapInArrow(fn, out_schema)


def topk_exploded(
    df: DataFrame,
    col,
    corpus,
    k: int,
    metric: str = "cosine",
    keep: list[str] | None = None,
) -> DataFrame:
    """Convenience: topk -> inline (explode+unnest in one) — the
    README's documented retrieval pattern (reference README.md:110-124,
    tests/test_polars_matmul.py:55-75) as a single call.

    Returns one row per (query, match) with ``index`` and ``score``
    columns plus any ``keep`` passthrough columns.
    """
    keep = keep or []
    matches = topk(col, corpus, k, metric)
    return df.select(*keep, F.inline(matches))
