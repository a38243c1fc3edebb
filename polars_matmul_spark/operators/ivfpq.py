"""IVF-PQ: coarse inverted lists + product-quantized residuals — the
composition of operators/ann.py (IVF) and operators/pq.py (PQ), i.e.
the FAISS ``IVFx,PQy`` index, the standard billion-scale ANN layout.

Why residuals: within an inverted list every vector is near its
centroid, so the residual (vector - centroid) occupies a far smaller
ball than the raw vector — the same PQ code budget quantizes it with
much less error (Jegou et al. 2011, §IV). Search probes ``nprobe``
lists and scores codes with per-(query, list) lookup tables built on
the query's OWN residual against that list's centroid.

Scale shape:

- build: one broadcast-centroid assignment (map-side-combinable argmax
  — operators/ann.py), one zip_with residual projection, one
  mapInArrow encode. The corpus shuffles ONCE (if the caller
  repartitions by centroid_id for locality) or never.
- search: centroids + codebooks + query LUTs broadcast (n_q * nprobe
  tables of m*n_codes doubles); the coded corpus streams through one
  mapInArrow emitting per-batch top-k candidates only; one slim
  shuffle for the final window. A query's work touches only its
  nprobe lists — rows outside them are skipped by a vectorized mask,
  and at scale the index is written partitioned by ``centroid_id`` so
  partition pruning skips them at the SCAN.

Metric: L2 (ADC's native space). For cosine, L2-normalize upstream —
||q-c||^2 = 2 - 2 cos on unit vectors, identical ordering.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["build_ivfpq", "ivfpq_topk"]


def _assign_l2(corpus: DataFrame, cen_df: DataFrame, id_col: str) -> DataFrame:
    """Nearest centroid by EUCLIDEAN distance — the same map-side-
    combinable max(struct) shape as ann.assign_ivf, but L2 so the
    build-side list assignment agrees with the search-side coarse
    probe (argmin ||q-c||^2). ann.assign_ivf uses cosine; mixing the
    two rules strands boundary vectors in lists the probe never
    visits when centroid norms differ. argmin ||v-c||^2 = argmax
    (v.c - c.c/2), so the centroid self-term is computed once per
    centroid, not per pair."""
    from polars_matmul_spark.operators.ann import _fold_dot

    cen = cen_df.withColumn(
        "__half_cc",
        _fold_dot(F.col("centroid_emb"), F.col("centroid_emb")) / 2.0,
    )
    v = F.col("embedding").cast("array<double>")
    scored = corpus.crossJoin(F.broadcast(cen)).withColumn(
        "__s", _fold_dot(v, F.col("centroid_emb")) - F.col("__half_cc")
    )
    best = scored.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("__s").alias("s"),
                (-F.col("centroid_id")).alias("neg_id"),
                F.col("centroid_id").alias("cid"),
            )
        ).alias("__best"),
        F.first("embedding").alias("embedding"),
    )
    return best.select(
        id_col, "embedding", F.col("__best.cid").alias("centroid_id")
    )


def build_ivfpq(
    corpus: DataFrame,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 256,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Returns (index_df, centroids, books): the index DataFrame
    (id, centroid_id, pq_codes binary) plus the two broadcast-sized
    numpy artifacts search needs (centroids (C, d); residual
    codebooks (m, n_codes, d/m))."""
    from polars_matmul_spark.operators.ann import train_centroids_kmeans
    from polars_matmul_spark.operators.pq import encode_pq, train_pq

    src = corpus.select(F.col(id_col), F.col(vec_col).alias("embedding"))
    cen_df = train_centroids_kmeans(src, n_centroids, seed=seed, id_col=id_col)
    assigned = _assign_l2(src, cen_df, id_col=id_col)
    cen_rows = cen_df.orderBy("centroid_id").collect()
    centroids = np.array([list(r["centroid_emb"]) for r in cen_rows], dtype=np.float64)
    # residual = vector - its centroid (JVM zip_with; the centroid
    # table rides the broadcast join already done inside assign_ivf's
    # output via a second broadcast here — C rows, trivially small)
    res = assigned.join(F.broadcast(cen_df), "centroid_id").select(
        id_col,
        "centroid_id",
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("centroid_emb"),
            lambda a, b: a - b,
        ).alias("residual"),
    )
    # train the codebooks on a bounded deterministic sample of the
    # residuals (keyed on the id, same cap pattern as the coarse
    # trainer): train_pq's contract is sample-in, and m full-corpus
    # MLlib fits would make the BUILD superlinear at scale. ~100 points
    # per code cell places codebook centroids for quantization; the
    # full corpus is still encoded below.
    from polars_matmul_spark.operators.ann import _hash_sample

    res_train = _hash_sample(
        res, cap=100 * n_codes, seed=seed + 101, key_cols=[F.col(id_col)],
        min_rows=n_codes,
    )
    books = train_pq(
        res_train, vec_col="residual", m=m, n_codes=n_codes, seed=seed
    )
    codes = encode_pq(res, books, vec_col="residual", id_col=id_col)
    index = res.select(id_col, "centroid_id").join(codes, id_col)
    return index, centroids, books


def ivfpq_topk(
    queries: DataFrame,
    index: DataFrame,
    centroids: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    nprobe: int = 3,
    query_vec_col: str = "embedding",
    query_id_col: str = "query_id",
    index_id_col: str = "vec_id",
) -> DataFrame:
    """ADC search over the probed lists: (query_id, rank, corpus_id,
    adist) with L2 semantics (ascending)."""
    import pyarrow as pa

    m, n_codes, d_sub = books.shape
    nprobe = min(int(nprobe), centroids.shape[0])
    qrows = queries.select(query_id_col, query_vec_col).collect()
    if not qrows:
        return index.sparkSession.createDataFrame(
            [], "query_id long, rank int, corpus_id long, adist double"
        )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    # coarse probe: nprobe nearest centroids per query (tiny, driver)
    cd = ((Q[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    probed = np.argsort(cd, axis=1)[:, :nprobe].astype(np.int64)  # (n_q, P)
    # per-(query, slot) LUT on the query's residual vs that centroid
    n_q = len(qids)
    luts = np.empty((n_q, nprobe, m * n_codes), dtype=np.float64)
    for s in range(nprobe):
        R = Q - centroids[probed[:, s]]  # (n_q, d) residual queries
        Rs = R.reshape(n_q, m, d_sub)
        diff = Rs[:, :, None, :] - books[None, :, :, :]
        luts[:, s, :] = np.einsum("nmkd,nmkd->nmk", diff, diff).reshape(
            n_q, m * n_codes
        )
    sc = index.sparkSession.sparkContext
    bc = sc.broadcast((qids, probed, luts))
    kk = int(k)
    offsets = (np.arange(m) * n_codes).astype(np.int64)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("corpus_id", T.LongType(), False),
            T.StructField("adist", T.DoubleType(), False),
        ]
    )
    src = index.select(index_id_col, "centroid_id", "pq_codes")

    def fn(batches):
        ids_q, P, L = bc.value
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            rid = np.asarray(rb.column(0), dtype=np.int64)
            cid = np.asarray(rb.column(1), dtype=np.int64)
            raw = b"".join(rb.column(2).to_pylist())
            C = np.frombuffer(raw, dtype=np.uint8).reshape(n, m)
            flat_idx = C.astype(np.int64) + offsets[None, :]
            out_q, out_c, out_d = [], [], []
            for qi in range(len(ids_q)):
                # rows of this batch inside any of qi's probed lists
                mask = np.isin(cid, P[qi])
                if not mask.any():
                    continue
                rows = np.nonzero(mask)[0]
                # slot of each row's centroid in qi's probe list
                slot = np.searchsorted(
                    P[qi], cid[rows], sorter=np.argsort(P[qi])
                )
                slot = np.argsort(P[qi])[slot]
                d = np.take_along_axis(
                    L[qi, slot, :], flat_idx[rows], axis=1
                ).sum(axis=1)
                keep = min(kk, len(rows))
                top = np.argpartition(d, keep - 1)[:keep]
                out_q.append(np.full(keep, ids_q[qi], dtype=np.int64))
                out_c.append(rid[rows[top]])
                out_d.append(d[top])
            if not out_q:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q), type=pa.int64()),
                    pa.array(np.concatenate(out_c), type=pa.int64()),
                    pa.array(np.concatenate(out_d), type=pa.float64()),
                ],
                names=["query_id", "corpus_id", "adist"],
            )

    cands = src.mapInArrow(fn, out_schema)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("corpus_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("query_id", "rank", "corpus_id", "adist")
    )
