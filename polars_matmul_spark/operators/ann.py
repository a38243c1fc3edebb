"""Approximate nearest-neighbor search — the similarity-search scale
path when neither exact form fits the budget.

Strategies:

- ``ivf_topk``: IVF (inverted-file) coarse quantization. Corpus rows
  are assigned to their nearest centroid (one broadcast join — the
  "index build"); a query scores the centroids, probes the ``nprobe``
  nearest lists, and exact-reranks only those lists. With C centroids
  and P probes the scan cost drops to ~P/C of brute force. Everything
  is declarative DataFrame ops -> a DuckDB oracle can replicate the
  algorithm exactly (deterministic centroids + deterministic
  tie-breaks), so even the *approximate* operator gets an exact
  correctness gate.

- ``brp_lsh_similarity_join``: MLlib BucketedRandomProjectionLSH
  (euclidean) approx similarity join — the built-in scale-out LSH;
  seeded for determinism, but its hash family is JVM-internal so it
  gets a rows-only check rather than a value oracle.

At 100 TB: the centroid table stays broadcast-sized (C ~ sqrt(n) rows);
the corpus is hash-partitioned by centroid_id (clustered index); a
query touches nprobe partitions — the classic IVF layout, expressed as
one equi-join on centroid_id that AQE turns into a partial scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_matmul_spark.operators.similarity_join import _fold_dot

__all__ = [
    "pick_centroids",
    "train_centroids_kmeans",
    "assign_ivf",
    "ivf_topk",
    "brp_lsh_similarity_join",
    "embedding_neardup_new_vs_index",
]


def pick_centroids(corpus: DataFrame, id_col: str, every: int = 37) -> DataFrame:
    """Deterministic centroid choice: every ``every``-th corpus row by id.

    K-means would give better lists but is seed-dependent; modular
    selection is reproducible in any engine (the oracle re-derives it)
    and good enough to demonstrate the IVF pruning structure.
    """
    return corpus.filter(F.col(id_col) % every == 0).select(
        F.col(id_col).alias("centroid_id"),
        F.col("embedding").alias("centroid_emb"),
    )


def _hash_sample(
    df: DataFrame,
    cap: int,
    seed: int,
    key_cols: list,
    min_rows: int = 0,
) -> DataFrame:
    """Deterministic keep-one-in-m downsample to ~``cap`` rows, keyed on
    ``key_cols`` — which must include a UNIQUE per-row column (an id),
    never just the vector value: duplicate vectors share one hash
    residue, so on a duplicate-heavy corpus (the normal input of a
    dedup framework) a value-keyed sample is badly skewed, and in the
    worst case (every row one value) EMPTY. Partitioning- and
    row-order-invariant, no RNG state, scan-speed.

    Falls back to the full ``df`` when the sample would land under
    ``min_rows`` (e.g. fewer rows than KMeans clusters) — a crash guard
    for adversarial hash/key distributions.
    """
    n = df.count()
    if n <= cap:
        return df
    m = max(n // cap, 1)
    sampled = df.filter(
        F.pmod(F.xxhash64(*key_cols, F.lit(seed)), F.lit(m)) == 0
    )
    if min_rows and sampled.count() < min_rows:
        return df
    return sampled


def train_centroids_kmeans(
    corpus: DataFrame,
    n_centroids: int = 26,
    seed: int = 7,
    max_iter: int = 20,
    max_train_rows: int | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Seeded MLlib KMeans centroids — the quality alternative to
    :func:`pick_centroids` (same output schema, drop-in for
    ``ivf_topk``). Trained lists pack genuinely-near rows together, so
    recall at equal nprobe improves substantially over modular picks
    (gated in tests/test_ann_recall.py); the modular form remains the
    engine-portable oracle path.

    Scale shape: k-means|| init + Lloyd iterations are MLlib's
    distributed implementation (per-iteration cost = one broadcast of k
    centers + one map over the corpus + one k-row reduce — no corpus
    shuffle). ``clusterCenters()`` brings k vectors (~sqrt(n), the same
    broadcast-sized centroid table IVF needs anyway) to the driver.
    Euclidean Lloyd on unit-norm embeddings orders assignments
    identically to cosine (||q-c||^2 = 2 - 2 cos for unit vectors).

    Training runs on a bounded sample: at most ``max_train_rows``
    (default ``100 * n_centroids``) rows, selected by a deterministic
    hash keyed on ``id_col`` when given, else on ALL columns of the
    frame (partitioning-invariant, no RNG state). Pass the id column:
    hashing only the embedding VALUE makes duplicate embeddings share
    one residue, so a duplicate-heavy corpus gets a skewed sample — and
    an all-one-value corpus an empty one. When the sample lands under
    ``n_centroids`` rows the full corpus is used instead (crash guard).
    Per-iteration training cost scales with n x k, so training on the
    full corpus makes the TRAINER the scale bottleneck precisely when
    both n and k grow — the round-4 scaling probe measured exactly that
    (semantic dedup wall 15x for 8x corpus, dominated by KMeans, while
    assign+verify stayed linear). ~100 points per center is plenty to
    place centers for BLOCKING purposes (recall gates in
    tests/test_ann_recall.py and test_semdedup.py hold on sampled
    training); pass ``max_train_rows=None``-> default cap, or a larger
    cap when centers must resolve finer structure.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cap = 100 * n_centroids if max_train_rows is None else max_train_rows
    key_cols = (
        [F.col(id_col)] if id_col else [F.col(c) for c in corpus.columns]
    )
    sample = _hash_sample(
        corpus, cap, seed, key_cols, min_rows=n_centroids
    )
    feats = sample.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="features"
    ).fit(feats)
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [
            (i, [float(x) for x in center])
            for i, center in enumerate(model.clusterCenters())
        ],
        "centroid_id long, centroid_emb array<double>",
    )


def _cosine(q, c, qn, cn):
    # per-norm zero guard, matching the reference [src/metrics.rs:276-288]
    sq = F.sqrt(qn)
    sc = F.sqrt(cn)
    return F.when(
        (sq > 1e-10) & (sc > 1e-10), _fold_dot(q, c) / (sq * sc)
    ).otherwise(F.lit(0.0))


def assign_ivf(
    corpus: DataFrame, centroids: DataFrame, id_col: str = "corpus_id"
) -> DataFrame:
    """Index build: nearest centroid (cosine) per corpus row.

    broadcast(centroids) x corpus, then argmax as a map-side-combinable
    ``max(struct(score, -centroid_id, centroid_id))`` aggregation:
    struct ordering gives (best score, then lowest id) and partial
    aggregation collapses each partition to one row per corpus id
    BEFORE the shuffle — the shuffle carries O(n_corpus) rows, never
    the cross product. (A row_number window here would sort the whole
    cross product through one shuffle; at 1000 executors that shuffle
    is the bottleneck.) Scoring stays flat column arithmetic =
    whole-stage codegen; centroid norms are computed once per centroid
    before the join, not per pair.
    """
    c = corpus.withColumn("__cc", _fold_dot(F.col("embedding"), F.col("embedding")))
    cen = centroids.withColumn(
        "__nn", _fold_dot(F.col("centroid_emb"), F.col("centroid_emb"))
    )
    scored = c.crossJoin(F.broadcast(cen)).withColumn(
        "__s",
        _cosine(F.col("embedding"), F.col("centroid_emb"), F.col("__cc"), F.col("__nn")),
    )
    best = (
        scored.groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("__s").alias("s"),
                    (-F.col("centroid_id")).alias("neg_id"),
                    F.col("centroid_id").alias("cid"),
                )
            ).alias("__best"),
            F.first("embedding").alias("embedding"),  # constant within group
        )
    )
    return best.select(id_col, "embedding", F.col("__best.cid").alias("centroid_id"))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    q_id: str = "query_id",
    c_id: str = "corpus_id",
) -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest centroid lists, exact
    cosine rerank within them. Returns (q_id, rank, c_id, score).

    Probe selection (top-nprobe centroids per query) uses a window over
    queries x centroids — that product is tiny (n_queries x sqrt(n))
    and stays broadcast-side.
    """
    indexed = assign_ivf(corpus, centroids, c_id)
    q = queries.withColumn("__qq", _fold_dot(F.col("embedding"), F.col("embedding")))
    cen = centroids.withColumn(
        "__nn", _fold_dot(F.col("centroid_emb"), F.col("centroid_emb"))
    )
    probe_w = Window.partitionBy(q_id).orderBy(F.desc("__ps"), F.asc("centroid_id"))
    probes = (
        q.crossJoin(F.broadcast(cen))
        .withColumn(
            "__ps",
            _cosine(
                F.col("embedding"), F.col("centroid_emb"), F.col("__qq"), F.col("__nn")
            ),
        )
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= nprobe)
        .select(q_id, F.col("embedding").alias("q_emb"), "__qq", "centroid_id")
    )
    # scan only the probed lists: equi-join on centroid_id
    # corpus self-dot ONCE per corpus row, before the probe join —
    # after the join it would be recomputed per (query, corpus) pair
    corpus_side = indexed.select(
        c_id, F.col("embedding").alias("c_emb"), "centroid_id"
    ).withColumn("__cc2", _fold_dot(F.col("c_emb"), F.col("c_emb")))
    cand = probes.join(corpus_side, "centroid_id")
    scored = cand.withColumn(
        "score", _cosine(F.col("q_emb"), F.col("c_emb"), F.col("__qq"), F.col("__cc2"))
    )
    # a corpus row can appear once per (query, centroid) pair only if it
    # lives in one list — assignment is unique, so no dedup needed
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id, "rank", c_id, "score")
    )


def brp_lsh_similarity_join(
    a: DataFrame,
    b: DataFrame,
    threshold: float,
    id_a: str = "id_a",
    id_b: str = "id_b",
    bucket_length: float = 1.0,
    num_hash_tables: int = 6,
    seed: int = 42,
    dedupe_self: bool = True,
) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH approx similarity join
    (euclidean distance <= threshold). Seeded; returns
    (id_a, id_b, dist). Rows-only correctness (JVM-internal hashes);
    quality is gated in pytest instead (tests/test_ann_recall.py):
    precision 1.0 by construction (candidates are filtered by true
    distance), recall >= 0.95 vs the exact all-pairs answer.

    ``num_hash_tables`` trades shuffle volume (each row lands in one
    bucket PER table, so candidate-join input scales linearly with
    tables) against recall via OR-amplification: measured on the
    sf0.01 unit-norm embeddings at threshold 1.2 — 2 tables: 0.84,
    4: 0.97, 6: 0.995, 8: 0.999. Default 6.

    ``dedupe_self=True`` (default) keeps only ``id_a < id_b`` — correct
    for a SELF-join over one table's id space. Pass False when a and b
    are different tables with independent ids, or half the matches
    vanish."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    fa = a.select(F.col(id_a), array_to_vector(F.col("embedding").cast("array<double>")).alias("features"))
    fb = b.select(F.col(id_b), array_to_vector(F.col("embedding").cast("array<double>")).alias("features"))
    brp = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = brp.fit(fa)
    joined = model.approxSimilarityJoin(fa, fb, threshold, distCol="dist")
    out = joined.select(
        F.col(f"datasetA.{id_a}").alias(id_a),
        F.col(f"datasetB.{id_b}").alias(id_b),
        F.col("dist"),
    )
    if dedupe_self:
        out = out.filter(F.col(id_a) < F.col(id_b))
    return out


def embedding_neardup_new_vs_index(
    new_batch: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    nprobe: int = 2,
    new_id: str = "new_id",
    old_id: str = "old_id",
) -> DataFrame:
    """Incremental embedding near-dup: which rows of a NEW batch are
    near-duplicates (cosine >= threshold) of an already-indexed corpus —
    the embedding-space analog of ``dedup.neardup_new_vs_index``.

    ``index`` is the persisted output of :func:`assign_ivf` (id,
    embedding, centroid_id) — at 100 TB it lives partitioned by
    centroid_id and is NEVER shuffled here: the new batch (small) is
    assigned to its ``nprobe`` nearest centroids via a broadcast of the
    centroid table, then broadcast into an equi-join on centroid_id, so
    the big side is a pruned map-side scan. Exact cosine verifies every
    candidate pair.

    ``nprobe > 1`` catches pairs that straddle a centroid boundary: a
    true near-dup whose indexed twin was assigned to the query row's
    2nd-nearest list. Measured on planted dups over the sf data
    (tests/test_ann_recall.py): 29/30 recall at nprobe=2 and 30/30 at
    nprobe=4 even with untrained modular centroids; trained KMeans
    lists tighten the cells further. For a guaranteed-exhaustive pass,
    probe all lists (== blocked brute force, still index-shuffle-free).

    Returns (new_id, old_id, score), one row per crossing pair.
    """
    cen = centroids.withColumn(
        "__nn", _fold_dot(F.col("centroid_emb"), F.col("centroid_emb"))
    )
    q = new_batch.select(
        F.col(new_id), F.col("embedding").alias("q_emb")
    ).withColumn("__qq", _fold_dot(F.col("q_emb"), F.col("q_emb")))
    probe_w = Window.partitionBy(new_id).orderBy(F.desc("__ps"), F.asc("centroid_id"))
    probes = (
        q.crossJoin(F.broadcast(cen))
        .withColumn(
            "__ps",
            _cosine(F.col("q_emb"), F.col("centroid_emb"), F.col("__qq"), F.col("__nn")),
        )
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= nprobe)
        .select(new_id, "q_emb", "__qq", "centroid_id")
    )
    idx = index.select(
        F.col(old_id), F.col("embedding").alias("c_emb"), "centroid_id"
    ).withColumn("__cc", _fold_dot(F.col("c_emb"), F.col("c_emb")))
    # broadcast the probed batch INTO the index scan: the TB side stays
    # where it is, candidates stream out of the pruned lists
    cand = idx.join(F.broadcast(probes), "centroid_id")
    scored = cand.withColumn(
        "score", _cosine(F.col("q_emb"), F.col("c_emb"), F.col("__qq"), F.col("__cc"))
    )
    # each (new_id, old_id) pair surfaces at most once: an index row
    # lives in exactly one list (assign_ivf argmax) and probes carries
    # one row per (new_id, centroid_id), so no distinct() is needed —
    # and on the streaming ingest hot path it would be a full extra
    # shuffle of the candidate set per micro-batch
    return scored.filter(F.col("score") >= threshold).select(new_id, old_id, "score")
