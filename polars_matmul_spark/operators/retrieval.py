"""Hybrid retrieval: reciprocal-rank fusion + ColBERT-style MaxSim.

Two retrieval capabilities a training-data / RAG pipeline runs on top
of the lexical (BM25, ``operators.tfidf``) and dense (cosine top-k,
``operators.similarity_join`` / ``operators.ann``) legs this engine
already provides:

- ``rrf_fuse`` — Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
  SIGIR 2009): fuse N per-leg rankings into one list with
  ``score = sum_legs 1 / (k_const + rank_leg)``. Rank-based, so it
  needs no score calibration between BM25-scale and cosine-scale
  numbers — which is exactly why production hybrid search (lexical +
  embedding) standardizes on it.
- ``maxsim_topk`` / ``maxsim_topk_blocked`` — late-interaction
  multi-vector scoring (Khattab & Zaharia, ColBERT, SIGIR 2020): a
  query and a document are each a SET of vectors; the pair score is
  ``sum over query vectors of (max over doc vectors of sim)``.

Oracle discipline (the driver hash-compares values):

- RRF: per-leg ranks are ``row_number`` over (rounded score, id)
  windows — integer, engine-exact. The fused score is a FIXED-ORDER
  expression over the pivoted per-leg rank columns
  (``coalesce(1/(k+r_1),0) + coalesce(1/(k+r_2),0) + ...``), not a
  float aggregate, so it is bit-reproducible for ANY number of legs
  (IEEE division is correctly rounded; the addition order is part of
  the expression).
- MaxSim: per-(q_vec, doc) maxima are order-insensitive float max;
  the per-pair sum folds those maxima SEQUENTIALLY in ascending query
  position (``aggregate(transform(sort_array(collect_list(...))))``),
  which DuckDB replays with ``list_reduce(list(... ORDER BY pos))``
  (a fold seeded at 0.0 equals a first-element-seeded fold because
  ``0.0 + x == x`` exactly).

100 TB shape:

- ``rrf_fuse`` runs AFTER per-leg retrieval has already cut each leg
  to its top candidates, so its input is O(n_queries * top_per_leg *
  n_legs) rows no matter the corpus size. Per-leg ranking windows
  partition by the query/group columns (never a global single-window
  sort); the fuse itself is one (group, id)-keyed aggregation.
- ``maxsim_topk`` is the declarative crossJoin twin (the
  oracle-parity form, |Q_vecs| x |C_vecs| pairs — fine to ~10^8
  pairs, same envelope as ``similarity_join_exact``).
  ``maxsim_topk_blocked`` is the corpus-unbounded exact path:
  broadcast the (small) query vector set, group the corpus by
  document id (the ONE shuffle — in a real deployment the corpus is
  already stored doc-clustered, making it shuffle-free), compute each
  document's full MaxSim against every query locally in one BLAS
  batch, emit one row per (query_doc, corpus_doc), merge with a
  bounded per-query window. Candidate volume after the map stage is
  O(n_q_docs * n_c_docs) scores, each a scalar — the vectors
  themselves never shuffle.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_matmul_spark import kernels as K
from polars_matmul_spark.operators.similarity_join import (
    score_expr,
    similarity_join_exact,
)

__all__ = [
    "rrf_fuse",
    "maxsim_topk",
    "maxsim_topk_blocked",
    "maxsim_topk_ivf",
]


def rrf_fuse(
    legs: Mapping[str, DataFrame],
    id_cols: Sequence[str],
    score_col: str = "score",
    group_cols: Sequence[str] = (),
    k_const: int = 60,
    top_per_leg: int | None = 20,
    ascending: Sequence[str] = (),
    score_dp: int = 9,
    k: int | None = None,
    weights: Mapping[str, float] | None = None,
) -> DataFrame:
    """Fuse named ranked legs into one RRF ranking.

    Each leg DataFrame carries ``group_cols + id_cols + score_col``
    (extra columns are dropped). Ranks are assigned per leg with a
    ``row_number`` window partitioned by ``group_cols`` (e.g. the
    query id — rankings are per-query in retrieval), ordered by the
    score rounded to ``score_dp`` decimals (descending unless the leg
    name is listed in ``ascending``) with the id columns as tiebreak —
    so rank assignment is deterministic on both engines even when two
    candidates' float scores differ below the rounding grid.

    Output: ``group_cols + id_cols`` + one ``<leg>_rank`` column per
    leg (null where the candidate missed that leg's top list) +
    ``rrf_score`` (rounded to ``score_dp``) + ``fused_rank``. ``k``
    truncates the fused ranking per group.

    Precondition: one row per (group, id) within each leg — a leg IS a
    ranking, so duplicated candidates are malformed input (the rank
    pivot would keep the WORST duplicate's rank). Deduplicate upstream
    (e.g. ``groupBy(...).agg(F.max(score))``) if a leg can repeat ids.

    Scale note: empty ``group_cols`` means ONE global ranking window —
    a single partition. That is fine for an already-cut candidate set
    (the normal fuse input); for corpus-wide per-query retrieval,
    always partition by the query column.

    ``weights`` (weighted RRF): per-leg multiplier on the
    ``1/(k_const + rank)`` contribution, default 1.0 — still a
    fixed-order expression, so determinism is unchanged.
    """
    if not legs:
        raise ValueError("Empty series: no legs to fuse")
    gcols = list(group_cols)
    icols = list(id_cols)
    ranked = []
    for name, df in legs.items():
        direction = F.round(F.col(score_col), score_dp)
        order = [direction.asc() if name in ascending else direction.desc()]
        order += [F.col(c).asc() for c in icols]
        w = Window.partitionBy(*gcols).orderBy(*order) if gcols else (
            Window.partitionBy().orderBy(*order)
        )
        r = df.select(*gcols, *icols, score_col).withColumn(
            "__rank", F.row_number().over(w)
        )
        if top_per_leg is not None:
            r = r.filter(F.col("__rank") <= top_per_leg)
        ranked.append(
            r.select(
                *gcols,
                *icols,
                F.lit(name).alias("__leg"),
                F.col("__rank").cast("long").alias("__rank"),
            )
        )
    allrows = ranked[0]
    for r in ranked[1:]:
        allrows = allrows.unionByName(r)

    # pivot per-leg ranks into columns, then build the fused score as a
    # fixed-order expression over them (deterministic for any N legs)
    leg_names = list(legs)
    agg = [
        F.max(F.when(F.col("__leg") == name, F.col("__rank"))).alias(f"{name}_rank")
        for name in leg_names
    ]
    fused = allrows.groupBy(*gcols, *icols).agg(*agg)
    rrf: Column = F.lit(0.0)
    for name in leg_names:
        w = float(weights.get(name, 1.0)) if weights else 1.0
        rrf = rrf + F.coalesce(
            F.lit(w) / (F.lit(float(k_const)) + F.col(f"{name}_rank")),
            F.lit(0.0),
        )
    fused = fused.withColumn("rrf_score", F.round(rrf, score_dp))
    order = [F.col("rrf_score").desc()] + [F.col(c).asc() for c in icols]
    w = Window.partitionBy(*gcols).orderBy(*order) if gcols else (
        Window.partitionBy().orderBy(*order)
    )
    fused = fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
    if k is not None:
        fused = fused.filter(F.col("fused_rank") <= k)
    return fused


def _fold_sum_by_pos(pos_col: str, val_col: str) -> Column:
    """Sequential f64 sum of ``val_col`` in ascending ``pos_col`` order
    (aggregate expression). Bit-identical to DuckDB's
    ``list_reduce(list(val ORDER BY pos), (s, x) -> s + x)``."""
    return F.aggregate(
        F.transform(
            F.sort_array(F.collect_list(F.struct(pos_col, val_col))),
            lambda s: s[val_col],
        ),
        F.lit(0.0).cast("double"),
        lambda s, x: s + x,
    )


def maxsim_topk(
    queries: DataFrame,
    corpus: DataFrame,
    q_doc: str = "q_doc",
    q_pos: str = "q_pos",
    c_doc: str = "c_doc",
    q_col: str = "q_emb",
    c_col: str = "c_emb",
    k: int = 5,
    metric: str = "cosine",
    score_dp: int = 9,
) -> DataFrame:
    """Late-interaction top-k, declarative exact form.

    ``queries``: one row per query vector (q_doc, q_pos, q_emb).
    ``corpus``: one row per corpus vector (c_doc, c_emb) — corpus
    vector position is irrelevant (max is position-free).

    score(q, d) = sum over q_pos of max over d's vectors of
    sim(q_vec, d_vec), summed sequentially in ascending q_pos. Output:
    (q_doc, rank, c_doc, maxsim) with maxsim rounded to ``score_dp``
    and the top-k window ordered on the ROUNDED score with a c_doc
    tiebreak (identical rank frontiers on both engines).
    """
    if not K.higher_is_better(metric):
        raise ValueError(f"Unknown metric: {metric} (maxsim needs a similarity)")
    # similarity_join_exact renames colliding corpus columns with a c_
    # prefix; if c_doc/c_col also exist on the QUERY side, the groupBy
    # in _maxsim_tail would silently resolve to the query-side column
    # and collapse every corpus doc into one garbage row — refuse
    # loudly instead (round-10 ADVICE fix).
    collisions = {c for c in (c_doc, c_col) if c in set(queries.columns)}
    if collisions:
        raise ValueError(
            "maxsim_topk: corpus column(s) "
            f"{sorted(collisions)} collide with query-side columns; "
            "rename one side (the corpus id/vector columns must not "
            "exist on the query DataFrame)"
        )
    scored = similarity_join_exact(
        queries, corpus, q_col, c_col, metric=metric, score_col="__sim"
    )
    return _maxsim_tail(scored, q_doc, q_pos, c_doc, k, score_dp)


def _maxsim_tail(scored, q_doc, q_pos, c_doc, k, score_dp):
    """Shared max -> ordered fold -> top-k tail over per-vector-pair
    scores in a ``__sim`` column."""
    per_qvec = scored.groupBy(q_doc, q_pos, c_doc).agg(
        F.max("__sim").alias("__best")
    )
    pairs = per_qvec.groupBy(q_doc, c_doc).agg(
        F.round(_fold_sum_by_pos(q_pos, "__best"), score_dp).alias("maxsim")
    )
    w = Window.partitionBy(q_doc).orderBy(
        F.col("maxsim").desc(), F.col(c_doc).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_doc, "rank", c_doc, "maxsim")
    )


def maxsim_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    q_doc: str = "q_doc",
    q_pos: str = "q_pos",
    c_doc: str = "c_doc",
    q_col: str = "q_emb",
    c_col: str = "c_emb",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    seed: int = 7,
    score_dp: int = 9,
) -> DataFrame:
    """Centroid-pruned MaxSim — the ColBERTv2/PLAID retrieval shape,
    the approximate scale path next to the exact ``maxsim_topk`` /
    ``maxsim_topk_blocked`` pair.

    Index: seeded-KMeans centroids over the corpus VECTORS
    (``ann.train_centroids_kmeans``, bounded training sample); every
    corpus vector routes to its nearest centroid via a pure-projection
    argmax fold over the centroid array riding as ONE broadcast data
    row — no explode, no per-vector id, no shuffle. Query: each query
    vector probes its ``nprobe`` nearest centroids (tiny
    query x centroid cross join + per-vector window). Candidate docs =
    docs with at least one vector routed to a probed centroid for the
    query doc. Exact cosine MaxSim then runs RESTRICTED to candidate
    (q_doc, c_doc) pairs — scores of emitted pairs are exact (the
    ``semdedup``/IVF contract: approximation only prunes candidates),
    recall is pytest-gated against the exhaustive path.

    100 TB shape: assignment is a map over the corpus (centroids
    broadcast); the candidate join carries (c_doc, centroid_id)
    DISTINCT pairs — slim longs, not vectors; the exact stage's pair
    volume is bounded by the probed lists instead of |Q| x |C|. The
    one corpus-sized shuffle is the c_doc-keyed candidate equi-join,
    which doc-clustered storage makes map-side.

    A query doc whose probed centroids hold no corpus vectors yields
    NO output rows (the exhaustive paths always emit k): that means
    ``nprobe``/``n_centroids`` are mistuned for the data — raise
    nprobe rather than treating absence as an empty result.
    """
    from polars_matmul_spark.operators.ann import train_centroids_kmeans

    spark = queries.sparkSession
    cent = train_centroids_kmeans(
        corpus.select(F.col(c_col).alias("embedding")),
        n_centroids=n_centroids,
        seed=seed,
    )
    cent_rows = [
        (int(r["centroid_id"]), [float(x) for x in r["centroid_emb"]])
        for r in cent.collect()
    ]
    cent_rows.sort()
    one_row = spark.createDataFrame(
        [(cent_rows,)],
        "cents array<struct<cid: long, emb: array<double>>>",
    )

    def _dot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda s, x: s + x,
        )

    # corpus-side routing: argmax cosine over the centroid array as a
    # sequential fold (ascending cid; strict > keeps the lowest cid on
    # ties) — zero shuffles, zero explodes, runs in the scan projection.
    # The cosine is computed ONCE per centroid in a transform() to
    # (sim, cid) structs, then the fold is a cheap scalar argmax —
    # under interpreted higher-order functions the previous form
    # re-evaluated each centroid's cosine in both the when() condition
    # and the result struct (round-10 ADVICE fix).
    v = F.col(c_col).cast("array<double>")
    init = F.struct(
        F.lit(-2.0).cast("double").alias("s"), F.lit(-1).cast("long").alias("cid")
    )
    cent_sims = F.transform(
        F.col("cents"),
        lambda ce: F.struct(
            (
                _dot(v, ce["emb"])
                / F.greatest(
                    F.sqrt(_dot(v, v)) * F.sqrt(_dot(ce["emb"], ce["emb"])),
                    F.lit(1e-10),
                )
            ).alias("s"),
            ce["cid"].alias("cid"),
        ),
    )
    best = F.aggregate(
        cent_sims,
        init,
        lambda acc, e: F.when(e["s"] > acc["s"], e).otherwise(acc),
    )
    routed = (
        corpus.crossJoin(F.broadcast(one_row))
        .select(c_doc, best["cid"].alias("centroid_id"))
        .distinct()
    )

    # query-side probing: tiny (n_qvecs x n_centroids) cross join,
    # top-nprobe per query vector, then the DISTINCT probed set per
    # query doc
    qv = queries.select(q_doc, q_pos, F.col(q_col).cast("array<double>").alias("__q"))
    scored_cent = qv.crossJoin(F.broadcast(cent)).select(
        q_doc,
        q_pos,
        F.col("centroid_id"),
        (
            _dot(F.col("__q"), F.col("centroid_emb"))
            / F.greatest(
                F.sqrt(_dot(F.col("__q"), F.col("__q")))
                * F.sqrt(_dot(F.col("centroid_emb"), F.col("centroid_emb"))),
                F.lit(1e-10),
            )
        ).alias("__s"),
    )
    wp = Window.partitionBy(q_doc, q_pos).orderBy(
        F.col("__s").desc(), F.col("centroid_id").asc()
    )
    probes = (
        scored_cent.withColumn("__r", F.row_number().over(wp))
        .filter(F.col("__r") <= nprobe)
        .select(q_doc, "centroid_id")
        .distinct()
    )

    cand = probes.join(routed, "centroid_id").select(q_doc, c_doc).distinct()

    # exact MaxSim restricted to candidate pairs (scores exact; only
    # the candidate set is approximate)
    qn = queries.withColumn("__qq", _dot(F.col(q_col).cast("array<double>"),
                                         F.col(q_col).cast("array<double>")))
    cn = corpus.withColumn("__cc", _dot(F.col(c_col).cast("array<double>"),
                                        F.col(c_col).cast("array<double>")))
    pairs = cand.join(qn, q_doc).join(cn, c_doc)
    dot = _dot(F.col(q_col).cast("array<double>"), F.col(c_col).cast("array<double>"))
    qnorm = F.sqrt(F.col("__qq"))
    cnorm = F.sqrt(F.col("__cc"))
    sim = F.when(
        (qnorm > F.lit(K.EPS_F64)) & (cnorm > F.lit(K.EPS_F64)),
        dot / (qnorm * cnorm),
    ).otherwise(F.lit(0.0))
    scored = pairs.withColumn("__sim", sim)
    return _maxsim_tail(scored, q_doc, q_pos, c_doc, k, score_dp)


def maxsim_topk_blocked(
    queries: DataFrame,
    corpus: DataFrame,
    q_doc: str = "q_doc",
    q_pos: str = "q_pos",
    c_doc: str = "c_doc",
    q_col: str = "q_emb",
    c_col: str = "c_emb",
    k: int = 5,
    metric: str = "cosine",
    score_dp: int = 9,
) -> DataFrame:
    """Late-interaction top-k, corpus-unbounded exact path.

    Query vectors are collected + broadcast (they are the small side);
    the corpus is grouped by document (applyInPandas over ``c_doc`` —
    the one shuffle; doc-clustered storage makes it map-side) and each
    group computes its MaxSim against EVERY query in one vectorized
    kernel call, emitting one scalar row per (q_doc, c_doc). A final
    per-query window keeps the global top-k. Exact — no candidate
    generation, the max/sum decomposition is just evaluated
    doc-locally. Agreement with ``maxsim_topk`` is pytest-gated.
    """
    if not K.higher_is_better(metric):
        raise ValueError(f"Unknown metric: {metric} (maxsim needs a similarity)")
    spark = queries.sparkSession
    qpdf = (
        queries.select(q_doc, q_pos, q_col)
        .sort(q_doc, q_pos)
        .toPandas()
    )
    if len(qpdf) == 0:
        raise ValueError("Empty series: query side has no rows")
    # re-sort pandas-side as a guard (works for ANY orderable id dtype,
    # unlike np.lexsort on object arrays); Spark already emitted
    # (q_doc, q_pos) order, so this is a stable no-op in practice
    qpdf = qpdf.sort_values([q_doc, q_pos], kind="mergesort").reset_index(
        drop=True
    )
    Q = K.to_matrix(qpdf[q_col].tolist()).astype(np.float64)
    qdocs = qpdf[q_doc].to_numpy()
    # array is sorted, so first-occurrence order IS ascending order
    uniq_qdocs = pd.unique(qdocs)
    bc = spark.sparkContext.broadcast((Q, qdocs, uniq_qdocs))

    # derive the id column types from the inputs — doc ids can be
    # strings/ints/anything orderable, not just longs (round-10 ADVICE
    # fix; the declarative twin maxsim_topk was already id-generic)
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField(q_doc, queries.schema[q_doc].dataType),
            StructField(c_doc, corpus.schema[c_doc].dataType),
            StructField("maxsim", DoubleType()),
        ]
    )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        Qb, qdocs_b, uq = bc.value
        doc = pdf[c_doc].iloc[0]
        C = K.to_matrix(pdf[c_col].tolist()).astype(np.float64)
        S = K.similarity_matrix(Qb, C, metric)  # (n_qvecs, n_cvecs)
        best = S.max(axis=1)  # order-insensitive float max
        sums = np.zeros(len(uq))
        # sequential fold in ascending q_pos within each q_doc — the
        # rows were sorted (q_doc, q_pos) driver-side, so a running
        # Python fold per segment matches the declarative twin's
        # sort_array fold bit-for-bit
        for i, qd in enumerate(uq):
            seg = best[qdocs_b == qd]
            acc = 0.0
            for v in seg:
                acc = acc + float(v)
            sums[i] = acc
        return pd.DataFrame({q_doc: uq, c_doc: doc, "maxsim": sums})

    pairs = (
        corpus.select(c_doc, c_col)
        .groupBy(c_doc)
        .applyInPandas(score_group, schema=out_schema)
        .withColumn("maxsim", F.round("maxsim", score_dp))
    )
    w = Window.partitionBy(q_doc).orderBy(
        F.col("maxsim").desc(), F.col(c_doc).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_doc, "rank", c_doc, "maxsim")
    )
