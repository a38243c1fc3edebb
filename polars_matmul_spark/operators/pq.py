"""Product quantization (PQ) with asymmetric-distance search (ADC).

The third rung of the compression ladder (f32 -> f16 storage ->
symmetric int8 -> PQ): split each d-dim vector into ``m`` subvectors,
k-means each subspace into ``n_codes`` centroids, store each vector as
``m`` one-byte codes (d=64 f32 -> 8 bytes = 32x). Search never
decodes: a query builds one lookup table of exact query-subvector ->
centroid distances, and a corpus vector's approximate distance is the
sum of m table entries (Jegou, Douze, Schmid: "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

Spark shapes, designed for a corpus that fits NOWHERE:

- ``train_pq``     — m MLlib KMeans fits over ``slice()``d subvectors
                     (per-iteration: broadcast k centers + map + k-row
                     reduce; the corpus never shuffles). Run it on a
                     sample; codebooks are m*n_codes*d/m floats — KBs.
- ``encode_pq``    — one ``mapInArrow`` pass: vectorized argmin over
                     the broadcast codebooks, codes emitted as a
                     BINARY column (m bytes/row — the storage claim is
                     literal). Scan-speed, no shuffle.
- ``pq_topk``      — the blocked-top-k shape (operators/
                     similarity_join.py): queries broadcast with their
                     precomputed LUTs, each CODE partition emits its
                     local top-k per query, one slim shuffle of
                     (query_id, corpus_id, dist) candidates, window
                     take-k. The coded corpus is never shuffled and
                     never decoded.

Exact rerank composes downstream exactly like operators/quantize.py:
PQ shortlist -> join full-precision vectors for the survivors only.

Metrics: 'l2' (classic ADC) and 'dot' (inner-product LUTs, higher is
better). Cosine on unit-normalized embeddings == 'l2' ordering
(||q-c||^2 = 2 - 2cos) — normalize upstream and use 'l2'.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["train_pq", "encode_pq", "pq_topk"]


def _check_geometry(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subvectors")
    return dim // m


def train_pq(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    seed: int = 7,
    max_iter: int = 20,
) -> np.ndarray:
    """Fit the (m, n_codes, d/m) codebook tensor with one seeded MLlib
    KMeans per subspace. ``n_codes`` <= 256 keeps codes one byte."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if not (1 < n_codes <= 256):
        raise ValueError(f"n_codes must be in (1, 256], got {n_codes}")
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("Empty series")
    dim = len(first[0])
    d_sub = _check_geometry(dim, m)
    vecs = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    books = []
    for j in range(m):
        sub = vecs.select(
            array_to_vector(F.slice("v", j * d_sub + 1, d_sub)).alias("features")
        )
        model = KMeans(
            k=n_codes, seed=seed + j, maxIter=max_iter, featuresCol="features"
        ).fit(sub)
        books.append(np.array(model.clusterCenters(), dtype=np.float64))
    return np.stack(books)  # (m, n_codes, d_sub)


def _codes_matrix(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 argmin codes. ||x-c||^2 = x.x - 2 x.c + c.c; x.x is
    constant per argmin, so only the cross and centroid terms matter."""
    n, dim = X.shape
    m, n_codes, d_sub = books.shape
    Xs = X.reshape(n, m, d_sub)
    # cross[n, m, n_codes] = Xs . books^T per subspace
    cross = np.einsum("nmd,mkd->nmk", Xs, books)
    cnorm = np.einsum("mkd,mkd->mk", books, books)  # (m, n_codes)
    return np.argmin(cnorm[None, :, :] - 2.0 * cross, axis=2).astype(np.uint8)


def encode_pq(
    df: DataFrame,
    books: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pq_codes",
) -> DataFrame:
    """(id, pq_codes binary): each row's m one-byte codes. One
    ``mapInArrow`` pass, codebooks broadcast, batch-vectorized NumPy —
    no per-row Python, no shuffle."""
    import pyarrow as pa

    m = int(books.shape[0])
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(np.ascontiguousarray(books, dtype=np.float64))
    src = df.select(id_col, vec_col)
    out_schema = T.StructType(
        [src.schema[id_col], T.StructField(out_col, T.BinaryType(), False)]
    )

    def fn(batches):
        B = bc.value
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            col = rb.column(1)
            flat = np.asarray(col.flatten(), dtype=np.float64)
            X = flat.reshape(n, -1)
            codes = _codes_matrix(X, B)  # (n, m) uint8
            buf = codes.tobytes()
            bins = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(m), n, [None, pa.py_buffer(buf)]
            ).cast(pa.binary())
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), bins], names=[id_col, out_col]
            )

    return src.mapInArrow(fn, out_schema)


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    books: np.ndarray,
    k: int = 10,
    metric: str = "l2",
    query_vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codes_id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """ADC top-k: (query_id, rank, corpus_id, adist). 'l2' ranks
    ascending (smaller = closer), 'dot' descending.

    The query side is collected and broadcast WITH its LUTs — the
    documented envelope of every broadcast-kernel path in this repo
    (queries are the small side by contract; the blocked form in
    operators/similarity_join.py is the template when they are not).
    The coded corpus streams through one mapInArrow; only
    per-partition top-k candidate rows (#partitions * k per query)
    are shuffled for the final window.
    """
    import pyarrow as pa

    if metric not in ("l2", "dot"):
        raise ValueError(f"Unknown metric: {metric}")
    m, n_codes, d_sub = books.shape
    qrows = queries.select(query_id_col, query_vec_col).collect()
    if not qrows:
        return codes.sparkSession.createDataFrame(
            [], f"query_id long, rank int, corpus_id long, adist double"
        )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    Qs = Q.reshape(len(qids), m, d_sub)
    if metric == "l2":
        # LUT[q, j, c] = ||q_sub - centroid||^2
        diff = Qs[:, :, None, :] - books[None, :, :, :]
        lut = np.einsum("nmkd,nmkd->nmk", diff, diff)
        sign = 1.0  # ascending
    else:
        lut = np.einsum("nmd,mkd->nmk", Qs, books)
        sign = -1.0  # descending via negated sort keys
    flat_lut = lut.reshape(len(qids), m * n_codes)
    sc = codes.sparkSession.sparkContext
    bc = sc.broadcast((qids, flat_lut.astype(np.float64)))
    kk = int(k)
    offsets = (np.arange(m) * n_codes).astype(np.int64)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("corpus_id", T.LongType(), False),
            T.StructField("adist", T.DoubleType(), False),
        ]
    )
    src = codes.select(codes_id_col, codes_col)

    def fn(batches):
        ids_q, L = bc.value
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            cid = np.asarray(rb.column(0), dtype=np.int64)
            raw = b"".join(rb.column(1).to_pylist())
            C = np.frombuffer(raw, dtype=np.uint8).reshape(n, m)
            flat_idx = C.astype(np.int64) + offsets[None, :]  # (n, m)
            # dists[q, n] = sum over subspaces of LUT entries
            D = L[:, flat_idx].sum(axis=2) * sign
            keep = min(kk, n)
            part = np.argpartition(D, keep - 1, axis=1)[:, :keep]
            rows_q = np.repeat(np.arange(len(ids_q)), keep)
            rows_c = part.ravel()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids_q, keep), type=pa.int64()),
                    pa.array(cid[rows_c], type=pa.int64()),
                    pa.array(D[rows_q, rows_c] * sign, type=pa.float64()),
                ],
                names=["query_id", "corpus_id", "adist"],
            )

    cands = src.mapInArrow(fn, out_schema)
    from pyspark.sql import Window

    order = (
        [F.asc("adist"), F.asc("corpus_id")]
        if metric == "l2"
        else [F.desc("adist"), F.asc("corpus_id")]
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("query_id", "rank", "corpus_id", "adist")
    )
