"""Core query registry: similarity operators + relational analytics
surface, each as a (spark_fn, duckdb_oracle_sql) pair.

Design rule for oracle parity (the driver hash-compares values): every
float that reaches the output is produced by arithmetic that is
bit-for-bit reproducible in DuckDB —

- similarity scores: sequential f64 fold (``aggregate(zip_with(..))``
  in Spark == ``list_dot_product`` on DOUBLE[] in DuckDB; verified
  empirically, 0 mismatches on the sf0.01 tables);
- money aggregates: per-row double expression cast to DECIMAL before
  SUM (exact, order-independent), cast back to DOUBLE after;
- averages: exact decimal sum divided by exact count, in double;
- rankings: ordered by exact-equal keys with an id tiebreak, so window
  frontiers are identical on both engines.

The reference's own surface is N1-N10 + H1-H14 (SURVEY §2); each query
below names the inventory items it covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polars_matmul_spark.operators.similarity_join import (
    similarity_join_exact,
    topk_join_exact,
)
from polars_matmul_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# similarity surface (reference N1-N8)
# ---------------------------------------------------------------------------

# DuckDB-side score expressions, mirroring operators.similarity_join.score_expr
_DUCK_DOT = "list_dot_product({a}, {b})"


def _duck_score(metric: str, a: str = "q_emb", c: str = "c_emb") -> str:
    dot = _DUCK_DOT.format(a=a, b=c)
    qq = _DUCK_DOT.format(a=a, b=a)
    cc = _DUCK_DOT.format(a=c, b=c)
    if metric == "dot":
        return dot
    if metric == "cosine":
        # per-norm zero guard (q_norm > eps AND c_norm > eps), mirroring
        # the reference [src/metrics.rs:276-288] and score_expr exactly
        return (
            f"CASE WHEN sqrt({qq}) > 1e-10 AND sqrt({cc}) > 1e-10 "
            f"THEN {dot} / (sqrt({qq}) * sqrt({cc})) ELSE 0.0 END"
        )
    return f"sqrt(greatest({qq} + {cc} - 2 * {dot}, 0.0))"


def _split_embeddings(spark: SparkSession, sf_dir: str, n_queries: int = 50):
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("c_emb")
    )
    return q, c


def _make_topk(metric: str, k: int = 5):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        # N3 fused top-k in its SQL-expressible exact form (SURVEY N3):
        # crossJoin + window. Covers H7/H10/H11 composition too.
        q, c = _split_embeddings(spark, sf_dir)
        out = topk_join_exact(
            q, c, "query_id", "corpus_id", "q_emb", "c_emb", k=k, metric=metric
        )
        return out.select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "corpus_id",
            "score",
        )

    order = "DESC" if metric in ("cosine", "dot") else "ASC"
    oracle = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
           FROM embeddings WHERE vec_id < 50),
     c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS c_emb
           FROM embeddings WHERE vec_id >= 50),
     scored AS (
       SELECT query_id, corpus_id, {_duck_score(metric)} AS score
       FROM q CROSS JOIN c),
     ranked AS (
       SELECT query_id, corpus_id, score,
              row_number() OVER (
                PARTITION BY query_id
                ORDER BY score {order}, corpus_id ASC) AS rank
       FROM scored)
SELECT query_id, rank, corpus_id, score FROM ranked WHERE rank <= {k}
"""
    return fn, oracle


def _matmul_flatten_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # N1/N2: all-pairs dot products, flattened one row per (q, c) pair
    q, c = _split_embeddings(spark, sf_dir)
    q = q.filter(F.col("query_id") < 10)
    c = c.filter(F.col("corpus_id") < 150)
    out = similarity_join_exact(q, c, "q_emb", "c_emb", metric="dot")
    return out.select("query_id", "corpus_id", "score")


_MATMUL_FLATTEN_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS c_emb
           FROM embeddings WHERE vec_id >= 50 AND vec_id < 150)
SELECT query_id, corpus_id, {_duck_score('dot')} AS score
FROM q CROSS JOIN c
"""


def _matmul_nested_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # N1 nested output shape: one array<double> score row per query
    # (ordered by corpus position), SQL-exact via sort_array(collect_list).
    # The nested array is then posexploded back to scalar (query_id,
    # pos, score) rows: the driver's canonicalizer sorts output columns
    # with pandas and cannot hash ndarray cells, so the driver-facing
    # shape must be scalar-sortable (round-1 CORRECTNESS err). The
    # row-major nested assembly [src/matmul.rs:100-125] is still what is
    # computed — pos IS the corpus position within each query's row.
    q, c = _split_embeddings(spark, sf_dir)
    q = q.filter(F.col("query_id") < 10)
    c = c.filter(F.col("corpus_id") < 150)
    out = similarity_join_exact(q, c, "q_emb", "c_emb", metric="dot")
    nested = out.groupBy("query_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("corpus_id", "score"))),
            lambda s: s["score"],
        ).alias("scores")
    )
    return nested.select(
        "query_id", F.posexplode("scores").alias("pos", "score")
    ).select("query_id", F.col("pos").cast("long").alias("pos"), "score")


_MATMUL_NESTED_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS c_emb
           FROM embeddings WHERE vec_id >= 50 AND vec_id < 150),
     nested AS (
       SELECT query_id, list({_duck_score('dot')} ORDER BY corpus_id) AS scores
       FROM q CROSS JOIN c GROUP BY query_id)
SELECT query_id,
       CAST(generate_subscripts(scores, 1) - 1 AS BIGINT) AS pos,
       unnest(scores) AS score
FROM nested
"""


def _embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with label blocking.

    The blocking key stands in for the LSH bucket a 100 TB pipeline
    would use (operators.ann): candidate generation is an equi-join on
    the block, never an unblocked O(n^2) cross join.
    """
    from polars_matmul_spark.operators.similarity_join import _fold_dot

    emb = load_table(spark, "embeddings", sf_dir)
    # norms once per row (O(n*d)), not per pair — bitwise-identical folds
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("label"),
        F.col("embedding").alias("q_emb"),
    ).withColumn("qn", F.sqrt(_fold_dot(F.col("q_emb"), F.col("q_emb"))))
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label"),
        F.col("embedding").alias("c_emb"),
    ).withColumn("cn", F.sqrt(_fold_dot(F.col("c_emb"), F.col("c_emb"))))
    pairs = a.join(b, "label").filter(F.col("id_a") < F.col("id_b"))
    dot = _fold_dot(F.col("q_emb"), F.col("c_emb"))
    # per-norm zero guard, matching the reference [src/metrics.rs:276-288]
    scored = pairs.withColumn(
        "cosine",
        F.when(
            (F.col("qn") > 1e-10) & (F.col("cn") > 1e-10),
            dot / (F.col("qn") * F.col("cn")),
        ).otherwise(F.lit(0.0)),
    )
    return scored.filter(F.col("cosine") >= 0.3).select("id_a", "id_b", "label", "cosine")


_EMBEDDING_NEARDUP_ORACLE = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
       {_duck_score('cosine', 'a.embedding::DOUBLE[]', 'b.embedding::DOUBLE[]')} AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_duck_score('cosine', 'a.embedding::DOUBLE[]', 'b.embedding::DOUBLE[]')} >= 0.3
"""


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with an exact oracle: deterministic
    centroids (every 37th corpus id) + deterministic probe/rerank
    tie-breaks let DuckDB replicate the whole algorithm."""
    from polars_matmul_spark.operators.ann import ivf_topk, pick_centroids

    q, c = _split_embeddings(spark, sf_dir)
    q = q.withColumnRenamed("q_emb", "embedding")
    c = c.withColumnRenamed("c_emb", "embedding")
    centroids = pick_centroids(c, "corpus_id", every=37)
    return ivf_topk(q, c, centroids, k=5, nprobe=3)


def _duck_ivf_oracle() -> str:
    cos_cn = _duck_score("cosine", "c_emb", "n_emb")
    cos_qn = _duck_score("cosine", "q_emb", "n_emb")
    cos_qc = _duck_score("cosine", "q_emb", "c_emb")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
           FROM embeddings WHERE vec_id < 50),
     c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS c_emb
           FROM embeddings WHERE vec_id >= 50),
     cen AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS n_emb
             FROM embeddings WHERE vec_id >= 50 AND vec_id % 37 = 0),
     assign AS (
       SELECT corpus_id, c_emb, centroid_id FROM (
         SELECT c.corpus_id, c.c_emb, cen.centroid_id,
                row_number() OVER (PARTITION BY c.corpus_id
                                   ORDER BY {cos_cn} DESC, cen.centroid_id ASC) AS rn
         FROM c CROSS JOIN cen) WHERE rn = 1),
     probes AS (
       SELECT query_id, q_emb, centroid_id FROM (
         SELECT q.query_id, q.q_emb, cen.centroid_id,
                row_number() OVER (PARTITION BY q.query_id
                                   ORDER BY {cos_qn} DESC, cen.centroid_id ASC) AS rn
         FROM q CROSS JOIN cen) WHERE rn <= 3),
     scored AS (
       SELECT p.query_id, a.corpus_id, {cos_qc} AS score
       FROM probes p JOIN assign a ON p.centroid_id = a.centroid_id),
     ranked AS (
       SELECT query_id, corpus_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, corpus_id ASC) AS rank
       FROM scored)
SELECT query_id, rank, corpus_id, score FROM ranked WHERE rank <= 5
"""


def _ann_brp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MLlib LSH approx similarity join (rows-only check: JVM hash family)
    from polars_matmul_spark.operators.ann import brp_lsh_similarity_join

    # embeddings are unit-norm (pairwise distances ~N(sqrt(2), .07));
    # threshold 1.2 ~ the 1st percentile -> a selective near-neighbor
    # join (1% of pairs), not a disguised cross join
    emb = load_table(spark, "embeddings", sf_dir)
    a = emb.select(F.col("vec_id").alias("id_a"), "embedding")
    b = emb.select(F.col("vec_id").alias("id_b"), "embedding")
    return brp_lsh_similarity_join(a, b, threshold=1.2)


# --- p-stable Euclidean LSH join (round 9) ----------------------------------
#
# The engine-replayable successor to the ann_brp_lsh_join driver row:
# MLlib's BRP-LSH draws its projection vectors from a JVM-private RNG,
# so that row could only ever be rows-only. pstable_lsh_join ships its
# OWN seeded Gaussian family (Datar et al. 2004) as broadcast data, so
# the ENTIRE operator — floor-bucket hashing, table equi-join, exact
# Euclidean verify — replays bit-for-bit in DuckDB (the
# srp_neardup_bands recipe at Euclidean granularity). To make the row
# non-degenerate on the unit-norm embeddings (where random pairwise
# distances concentrate at sqrt(2), far above any useful threshold),
# near-pairs are PLANTED deterministically: every third vector gets a
# clone shifted by a constant 0.001*(1 + vec_id % 5) per coordinate
# (planted distance = 8*delta in 64-d, well inside threshold 0.5) —
# pure double arithmetic the oracle mirrors exactly. The MLlib
# integration stays pytest-gated (test_ann_recall.py).

_LSH_EUC_TABLES, _LSH_EUC_M, _LSH_EUC_W = 6, 5, 1.0
_LSH_EUC_SEED, _LSH_EUC_THRESH, _LSH_EUC_DIM = 11, 0.5, 64
_LSH_EUC_CLONE_OFF = 1000000


def _lsh_euclidean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_matmul_spark.operators.projection import pstable_lsh_join

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    delta = F.lit(0.001) * (F.lit(1) + F.col("vec_id") % 5)
    clones = emb.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + _LSH_EUC_CLONE_OFF).alias("vec_id"),
        F.transform("e", lambda x: x + delta).alias("e"),
    )
    pts = emb.unionByName(clones)
    return pstable_lsh_join(
        pts,
        id_col="vec_id",
        emb_col="e",
        threshold=_LSH_EUC_THRESH,
        n_tables=_LSH_EUC_TABLES,
        hashes_per_table=_LSH_EUC_M,
        bucket_width=_LSH_EUC_W,
        seed=_LSH_EUC_SEED,
    )


def _lsh_euclidean_oracle() -> str:
    from polars_matmul_spark.operators.projection import pstable_params

    A, B = pstable_params(
        _LSH_EUC_DIM, _LSH_EUC_TABLES, _LSH_EUC_M, _LSH_EUC_W, _LSH_EUC_SEED
    )

    def vec(row):
        return "[" + ", ".join(repr(float(x)) for x in row) + "]::DOUBLE[]"

    m, w = _LSH_EUC_M, _LSH_EUC_W
    key_cols = []
    for t in range(_LSH_EUC_TABLES):
        hs = [
            f"CAST(floor((list_dot_product(e, {vec(A[t * m + j])}) + "
            f"({B[t * m + j]!r})::DOUBLE) / ({w!r})::DOUBLE) AS BIGINT)"
            for j in range(m)
        ]
        key_cols.append("concat_ws(':', " + ", ".join(hs) + f") AS k{t}")
    bands_union = "\n  UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, k{t} AS key FROM sig"
        for t in range(_LSH_EUC_TABLES)
    )
    return f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), pts AS (
  SELECT vec_id, e FROM emb
  UNION ALL
  SELECT vec_id + {_LSH_EUC_CLONE_OFF},
         list_transform(e, x -> x + 0.001::DOUBLE * (1 + vec_id % 5))
  FROM emb WHERE vec_id % 3 = 0
), sig AS (
  SELECT vec_id, {", ".join(key_cols)} FROM pts
), bands AS (
  {bands_union}
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b
    ON a.tbl = b.tbl AND a.key = b.key AND a.vec_id < b.vec_id
), nn AS (
  SELECT vec_id, e, list_dot_product(e, e) AS n2 FROM pts
), v AS (
  SELECT cand.id_a, cand.id_b,
         sqrt(greatest(
           na.n2 - 2 * list_dot_product(na.e, nb.e) + nb.n2, 0.0
         )) AS dist
  FROM cand
  JOIN nn na ON cand.id_a = na.vec_id
  JOIN nn nb ON cand.id_b = nb.vec_id
)
SELECT id_a, id_b, dist FROM v WHERE dist <= {_LSH_EUC_THRESH}
"""


def _explode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # H5 explode + H8 row-position: first 8 dims of each vector
    emb = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 20)
    return emb.select(
        "vec_id",
        F.posexplode(F.slice(F.col("embedding").cast("array<double>"), 1, 8)).alias(
            "pos0", "val"
        ),
    ).select("vec_id", (F.col("pos0") + 1).cast("long").alias("dim_idx"), "val")


_EXPLODE_EMBEDDING_ORACLE = """
SELECT vec_id,
       CAST(generate_subscripts(e, 1) AS BIGINT) AS dim_idx,
       unnest(e) AS val
FROM (SELECT vec_id, (embedding::DOUBLE[])[1:8] AS e
      FROM embeddings WHERE vec_id < 20)
"""


# ---------------------------------------------------------------------------
# relational analytics surface (H1-H14 + general OLAP)
# ---------------------------------------------------------------------------

# Q1: identical SQL text runs on both engines (decimal-exact aggregates)
_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem")
    return spark.sql(_Q1_SQL)


def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # H7 joins + H9 agg + H10 sort + H11 limit; deterministic top-N via
    # decimal-exact revenue and an orderkey tiebreak
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, customer.c_custkey == orders.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_ORACLE = """
SELECT l_orderkey, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 6-way join; small dims (region/nation) broadcast by Catalyst/AQE
    region = load_table(spark, "region", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .join(customer, nation.n_nationkey == customer.c_nationkey)
        .join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .join(
            supplier,
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (supplier.s_nationkey == nation.n_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


_Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM region
JOIN nation ON r_regionkey = n_regionkey
JOIN customer ON n_nationkey = c_nationkey
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
GROUP BY n_name
"""

_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def _q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem")
    return spark.sql(_Q6_SQL)


def _top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # window function coverage: top-3 suppliers per nation by revenue
    lineitem = load_table(spark, "lineitem", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    rev = (
        lineitem.groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
    joined = rev.join(
        F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey
    ).join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("s_suppkey"))
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("n_name", "rank", "s_suppkey", "s_name", "revenue")
    )


_TOP_SUPPLIERS_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_suppkey
), ranked AS (
  SELECT n_name, s_suppkey, s_name, revenue,
         row_number() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey ASC) AS rank
  FROM rev
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
)
SELECT n_name, rank, s_suppkey, s_name, revenue FROM ranked WHERE rank <= 3
"""

# ROLLUP: identical SQL text on both engines
_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def _rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem")
    return spark.sql(_ROLLUP_SQL)


def _pivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pivot: order counts per priority x status
    orders = load_table(spark, "orders", sf_dir)
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    # pivot yields nullable counts; normalize null -> 0 like the FILTER form
    return out.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("F", "O", "P")],
    )


_PIVOT_ORDERS_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders GROUP BY o_orderpriority
"""


def _sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a new session starts after a >30 min gap.

    lag + cumulative-sum window pattern; at 100 TB this partitions
    cleanly by user_id (one shuffle), no skew expected on synthetic ids.
    """
    events = load_table(spark, "events", sf_dir)
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_user = Window.partitionBy("user_id").orderBy(*order)
    w_cum = w_user.rowsBetween(Window.unboundedPreceding, 0)
    sess = (
        events.withColumn("tse", F.unix_timestamp("ts"))
        .withColumn("prev", F.lag("tse").over(w_user))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev").isNull() | (F.col("tse") - F.col("prev") > 1800), 1
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("is_new").over(w_cum))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("tse") - F.min("tse")).alias("duration_sec"),
    )


_SESSIONIZE_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, ts, epoch_us(ts) // 1000000 AS tse,
         lag(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev IS NULL OR tse - prev > 1800 THEN 1 ELSE 0 END AS is_new
  FROM ordered
), sess AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MAX(tse) - MIN(tse) AS duration_sec
FROM sess GROUP BY user_id, session_id
"""


def _event_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tumbling-window agg in batch form (streaming twin lives in
    # polars_matmul_spark.streaming); window start as epoch seconds
    events = load_table(spark, "events", sf_dir)
    return (
        events.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


_EVENT_HOURLY_ORACLE = """
SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


def _json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    # JSON scalar extraction from the events.props column
    events = load_table(spark, "events", sf_dir)
    return (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


_JSON_PROPS_ORACLE = """
SELECT event_type, COUNT(*) AS n,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""


def _set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # set-operation coverage: customers with orders vs high-balance
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    with_orders = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey")
    high_bal = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    both = with_orders.intersect(high_bal).withColumn("bucket", F.lit("both"))
    only_orders = with_orders.exceptAll(high_bal).distinct().withColumn(
        "bucket", F.lit("orders_only")
    )
    return both.unionByName(only_orders).groupBy("bucket").agg(
        F.count("*").alias("n_customers")
    )


_SET_OPS_ORACLE = """
WITH with_orders AS (
  SELECT DISTINCT c_custkey FROM customer
  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
), high_bal AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
), b AS (
  SELECT c_custkey, 'both' AS bucket FROM with_orders INTERSECT
  SELECT c_custkey, 'both' FROM high_bal
), oo AS (
  SELECT c_custkey, 'orders_only' AS bucket FROM with_orders
  EXCEPT SELECT c_custkey, 'orders_only' FROM high_bal
)
SELECT bucket, COUNT(*) AS n_customers FROM (SELECT * FROM b UNION ALL SELECT * FROM oo)
GROUP BY bucket
"""


def _q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXISTS decorrelated to a left-semi join (Catalyst does the same
    # rewrite for the SQL form); late-ship lineitems in a quarter window
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    lo = F.lit("1995-04-01 00:00:00").cast("timestamp")
    hi = F.lit("1995-07-01 00:00:00").cast("timestamp")
    late = lineitem.filter(F.col("l_shipdate") > hi).select("l_orderkey")
    return (
        orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1995-07-01 00:00:00')
GROUP BY o_orderpriority
"""


def _anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # left-anti join: customers with no order since 1997, per segment
    # (every customer has SOME order at small SF, so the unfiltered
    # variant would be a degenerate empty-result test)
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_lapsed"),
            F.min("c_custkey").alias("first_custkey"),
        )
    )


_ANTI_JOIN_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_lapsed, MIN(c_custkey) AS first_custkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
GROUP BY c_mktsegment
"""


def _q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    # promo revenue share in one month: conditional agg over a join;
    # ratio of two decimal-exact sums -> bit-reproducible double
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    lo = F.lit("1995-09-01 00:00:00").cast("timestamp")
    hi = F.lit("1995-10-01 00:00:00").cast("timestamp")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,6)"))).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_items"),
        )
    )


_Q14_ORACLE = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
"""


def _brand_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # correlated scalar subquery (price > brand average), decorrelated
    # to groupBy + broadcast join-back; the comparison is done as
    # price*cnt > sum (exact decimal arithmetic, no float average)
    part = load_table(spark, "part", sf_dir)
    price_dec = F.col("p_retailprice").cast("decimal(18,4)")
    stats = part.groupBy(F.col("p_brand").alias("b_brand")).agg(
        F.sum(price_dec).alias("sum_price"),
        F.count("*").alias("cnt"),
    )
    return (
        part.join(F.broadcast(stats), part.p_brand == stats.b_brand)
        .withColumn("above", price_dec * F.col("cnt") > F.col("sum_price"))
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("above"), 1).otherwise(0)).alias("n_above_avg"),
            F.count("*").alias("n_parts"),
        )
    )


_BRAND_ABOVE_AVG_ORACLE = """
WITH stats AS (
  SELECT p_brand AS b_brand,
         SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS sum_price,
         COUNT(*) AS cnt
  FROM part GROUP BY p_brand
)
SELECT p_brand,
       CAST(SUM(CASE WHEN CAST(p_retailprice AS DECIMAL(18,4)) * cnt > sum_price
                THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg,
       COUNT(*) AS n_parts
FROM part JOIN stats ON p_brand = b_brand
GROUP BY p_brand
"""


def _cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CUBE via pre-aggregation: the fact table aggregates ONCE to the
    # finest grain (a handful of rows), then CUBE expands only that
    # partial — sum-of-sums is exact for count/decimal-sum. Cubing the
    # raw table would Expand every input row x 4 grouping sets (at
    # 100 TB: 4x the scan volume through the shuffle).
    lineitem = load_table(spark, "lineitem", sf_dir)
    grain = lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("__n"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("__qty"),
    )
    return (
        grain.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("__n").alias("n"),
            F.sum("__qty").cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


_CUBE_SALES_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def _cust_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ntile window: account-balance quartiles within each nation
    customer = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return (
        customer.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("c_nationkey", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


_CUST_QUARTILES_ORACLE = """
SELECT c_nationkey, quartile, COUNT(*) AS n,
       MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
FROM (SELECT c_nationkey, c_acctbal,
             ntile(4) OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
      FROM customer)
GROUP BY c_nationkey, quartile
"""


def _string_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scalar-function surface: substring/cast on strings, year/month
    # extraction, exact distinct count
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.withColumn("prio_num", F.substring("o_orderpriority", 1, 1).cast("int"))
        .groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            "prio_num",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.max(F.upper(F.col("o_orderstatus"))).alias("max_status"),
        )
    )


_STRING_DATE_ORACLE = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
       CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       MAX(UPPER(o_orderstatus)) AS max_status
FROM orders
GROUP BY 1, 2, 3
"""


def _moving_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # two-level windowing: exact monthly revenue, then a 3-month moving
    # average with an explicit ROWS frame (decimal window sum / count)
    lineitem = load_table(spark, "lineitem", sf_dir)
    monthly = (
        lineitem.groupBy(
            F.year("l_shipdate").cast("int").alias("yr"),
            F.month("l_shipdate").cast("int").alias("mo"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
            ).alias("rev_dec")
        )
    )
    # Unpartitioned window is intentional and scale-safe: it runs AFTER the
    # groupBy collapses the table to one row per (yr, mo) — bounded by the
    # calendar (~84 rows for TPC-H date ranges), independent of input size.
    w = Window.orderBy("yr", "mo").rowsBetween(-2, 0)
    return monthly.select(
        "yr",
        "mo",
        F.col("rev_dec").cast("double").alias("revenue"),
        (F.sum("rev_dec").over(w).cast("double") / F.count("*").over(w)).alias("ma3"),
    )


_MOVING_AVG_ORACLE = """
WITH monthly AS (
  SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS yr,
         CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS mo,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev_dec
  FROM lineitem GROUP BY 1, 2
)
SELECT yr, mo, CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(SUM(rev_dec) OVER w AS DOUBLE) / COUNT(*) OVER w AS ma3
FROM monthly
WINDOW w AS (ORDER BY yr, mo ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def _q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # returned-item revenue per customer/nation in a quarter, top 20
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    lo = F.lit("1995-06-01 00:00:00").cast("timestamp")
    hi = F.lit("1995-09-01 00:00:00").cast("timestamp")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-06-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-09-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def _q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    # order-count distribution: LEFT OUTER join keeps zero-order
    # customers, then a histogram over the per-customer counts
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count skips nulls
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
"""


def _q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # large orders: HAVING over a sum, then join back to headers
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


_Q18_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, CAST(sum_qty_dec AS DOUBLE) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty_dec
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150) big
  ON o_orderkey = big.l_orderkey
"""


def _mllib_blockmatmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BlockMatrix matmul (the nothing-broadcasts exact
    path). BLAS block GEMM differs from the sequential fold in final
    ulps, so scores are rounded to 6 decimals on both sides."""
    from polars_matmul_spark.operators.mllib_matmul import blockmatrix_matmul

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("embedding")
    )
    c = emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 250)).select(
        (F.col("vec_id") - 50).alias("corpus_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    out = blockmatrix_matmul(q, c)
    return out.select(
        "query_id",
        (F.col("corpus_id") + 50).alias("corpus_id"),
        F.round("score", 6).alias("score_r"),
    )


_MLLIB_BLOCKMATMUL_ORACLE = """
SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS score_r
FROM embeddings q CROSS JOIN embeddings c
WHERE q.vec_id < 10 AND c.vec_id >= 50 AND c.vec_id < 250
"""


def _range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # range join (bucketed): parts matched to price bands via an
    # equi-join on the bucket + residual filter, never a nested loop
    from polars_matmul_spark.operators.rangejoin import range_join_bucketed

    part = load_table(spark, "part", sf_dir)
    # retail prices span [900, 1000): 10 bands of width 10
    bands = spark.createDataFrame(
        [(i, 900.0 + i * 10, 900.0 + (i + 1) * 10 - 0.01) for i in range(10)],
        "band_id long, lo double, hi double",
    )
    joined = range_join_bucketed(
        part.select("p_partkey", "p_retailprice"), bands, "p_retailprice", "lo", "hi", 10.0
    )
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n_parts"),
        F.min("p_partkey").alias("min_partkey"),
        F.max("p_partkey").alias("max_partkey"),
    )


_RANGE_JOIN_ORACLE = """
WITH bands AS (
  SELECT i AS band_id, 900.0 + i * 10 AS lo, 900.0 + (i + 1) * 10 - 0.01 AS hi
  FROM (SELECT unnest(range(0, 10)) AS i)
)
SELECT band_id, COUNT(*) AS n_parts,
       MIN(p_partkey) AS min_partkey, MAX(p_partkey) AS max_partkey
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice <= hi
GROUP BY band_id
"""


def _hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hypertable-style continuous aggregate: hour/day/month grains in
    # ONE pass — pre-aggregate to the finest (hour) grain, then ROLLUP
    # the partial (sum-of-sums exact); the multi-granularity
    # materialization a time-series store maintains incrementally
    events = load_table(spark, "events", sf_dir)
    hourly = (
        events.withColumn("month", F.date_trunc("month", F.col("ts")))
        .withColumn("day", F.date_trunc("day", F.col("ts")))
        .withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("month", "day", "hour")
        .agg(
            F.count("*").alias("__n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("__v"),
        )
    )
    return (
        hourly.rollup("month", "day", "hour")
        .agg(F.sum("__n").alias("n"), F.sum("__v").cast("double").alias("total_value"))
        .select(
            F.unix_timestamp("month").alias("month_start"),
            F.unix_timestamp("day").alias("day_start"),
            F.unix_timestamp("hour").alias("hour_start"),
            "n",
            "total_value",
        )
    )


_HYPERTABLE_ROLLUP_ORACLE = """
SELECT epoch(date_trunc('month', ts))::BIGINT AS month_start,
       epoch(date_trunc('day', ts))::BIGINT AS day_start,
       epoch(date_trunc('hour', ts))::BIGINT AS hour_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (date_trunc('month', ts), date_trunc('day', ts), date_trunc('hour', ts))
"""


def _asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    # as-of backward join (operator Spark lacks natively): each purchase
    # gets the same user's most recent prior-or-simultaneous click;
    # oracle is DuckDB's native ASOF LEFT JOIN
    from polars_matmul_spark.operators.asof import asof_join_backward

    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts", "value"
    )
    out = asof_join_backward(
        purchases, clicks, "user_id", "ts", "ts", ["click_id", "value"]
    )
    return out.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("tse"),
        F.col("asof_click_id").alias("click_id"),
        F.col("asof_value").alias("click_value"),
    )


_ASOF_ORACLE = """
WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id AS click_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.user_id, p.event_id, epoch_us(p.ts) // 1000000 AS tse,
       c.click_id, c.value AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def _sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataSketches HLL + approx quantiles — approximate by design, so
    # rows-only for the driver; the pytest gate bounds error vs exact
    # (tests/test_sketches_and_bucketing.py)
    from polars_matmul_spark.operators.sketches import hll_distinct, quantile_summary

    events = load_table(spark, "events", sf_dir)
    d = hll_distinct(events, ["event_type"], "user_id")
    q = quantile_summary(events, ["event_type"], "value")
    return d.join(q, "event_type")


def _topk_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FLAGSHIP pandas-UDF kernel path (N3) under the oracle gate.

    NumPy's BLAS dot and DuckDB's sequential fold differ in the last
    ulps, so scores are rounded to 6 decimals on both sides; ranks use
    the kernel's own ordering (ties broken by corpus index ascending,
    matching np.argpartition+stable sort in kernels.topk_select —
    replicated in the oracle by (score, corpus_id) ordering).
    """
    from polars_matmul_spark.functions import topk_exploded
    from polars_matmul_spark.kernels import to_matrix

    emb = load_table(spark, "embeddings", sf_dir)
    corpus_pdf = (
        emb.filter(F.col("vec_id") >= 50)
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    corpus = to_matrix(corpus_pdf["embedding"].tolist()).astype("float64")
    queries_df = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("embedding")
    )
    matches = topk_exploded(
        queries_df, F.col("embedding"), corpus, k=5, metric="cosine", keep=["query_id"]
    )
    return matches.select(
        "query_id",
        (F.col("index") + 50).alias("corpus_id"),  # corpus position -> vec_id
        F.round(F.col("score"), 6).alias("score_r"),
    )


def _topk_kernel_oracle() -> str:
    cos = _duck_score("cosine", "q_emb", "c_emb")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
           FROM embeddings WHERE vec_id < 50),
     c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS c_emb
           FROM embeddings WHERE vec_id >= 50),
     ranked AS (
       SELECT query_id, corpus_id, {cos} AS score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY {cos} DESC, corpus_id ASC) AS rn
       FROM q CROSS JOIN c)
SELECT query_id, corpus_id, round(score, 6) AS score_r
FROM ranked WHERE rn <= 5
"""


def _salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # two-phase salted aggregation == plain groupBy (proven vs the
    # unsalted SQL oracle); the form that absorbs hot-key skew at scale
    from polars_matmul_spark.operators.skew import salted_agg

    events = load_table(spark, "events", sf_dir)
    out = salted_agg(
        events,
        ["event_type"],
        {
            "n": ("count", F.col("event_id")),
            "total_value": ("sum", F.col("value").cast("decimal(18,6)")),
            "min_user": ("min", F.col("user_id")),
            "max_user": ("max", F.col("user_id")),
        },
        n_salt=8,
    )
    return out.withColumn("total_value", F.col("total_value").cast("double"))


_SALTED_EVENT_COUNTS_ORACLE = """
SELECT event_type, COUNT(event_id) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       MIN(user_id) AS min_user, MAX(user_id) AS max_user
FROM events GROUP BY event_type
"""


def _funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase conversion funnel over the
    events table (operators/funnel.py): one user-keyed shuffle with a
    pure-Catalyst chain fold — no O(steps) self-joins. The DuckDB
    oracle is the classic chained-min formulation (min step-i timestamp
    strictly after the user's min qualifying step-(i-1) timestamp),
    which the greedy fold provably equals without a deadline window."""
    from polars_matmul_spark.operators.funnel import funnel

    events = load_table(spark, "events", sf_dir)
    return funnel(events, ["view", "click", "purchase"])


_FUNNEL_ORACLE = """
WITH r0 AS (
  SELECT user_id, min(epoch(ts)) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
), r1 AS (
  SELECT e.user_id, min(epoch(e.ts)) AS t
  FROM events e JOIN r0 USING (user_id)
  WHERE e.event_type = 'click' AND epoch(e.ts) > r0.t GROUP BY 1
), r2 AS (
  SELECT e.user_id, min(epoch(e.ts)) AS t
  FROM events e JOIN r1 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch(e.ts) > r1.t GROUP BY 1
)
SELECT CAST(0 AS INT) AS step_idx, 'view' AS step,
       CAST((SELECT count(*) FROM r0) AS BIGINT) AS n_users
UNION ALL SELECT CAST(1 AS INT), 'click',
       CAST((SELECT count(*) FROM r1) AS BIGINT)
UNION ALL SELECT CAST(2 AS INT), 'purchase',
       CAST((SELECT count(*) FROM r2) AS BIGINT)
"""

_FUNNEL_W = 3600  # 1-hour conversion deadline


def _funnel_levels_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 rotation: the WINDOWED per-user funnel fold (the
    per-anchor greedy chain with a t0+W deadline, bounded by the
    distinct-t0 candidate cap) gets a driver row. The DuckDB oracle is
    the EXISTS formulation — a user reaches level 3 iff SOME
    view<click<purchase chain fits inside [t_view, t_view + W] — which
    the per-anchor greedy fold provably equals for a fixed deadline
    (earliest qualifying next step maximizes the remaining window).

    ``max_t0_candidates=None``: the oracle is the UNCAPPED EXISTS
    formulation, so the Spark side must evaluate every candidate too —
    the default 1024 cap would diverge at an SF where some user
    accumulates >1024 distinct step-0 timestamps (round-6 ADVICE;
    greedy==EXISTS only holds over the same candidate set)."""
    from polars_matmul_spark.operators.funnel import funnel_user_levels

    events = load_table(spark, "events", sf_dir)
    lv = funnel_user_levels(
        events,
        ["view", "click", "purchase"],
        within_seconds=_FUNNEL_W,
        max_t0_candidates=None,
    )
    return lv.select(
        "user_id", F.col("funnel_level").cast("long").alias("funnel_level")
    )


_FUNNEL_LEVELS_ORACLE = f"""
WITH u AS (
  SELECT DISTINCT user_id FROM events
), v AS (
  SELECT user_id, epoch(ts) AS t FROM events WHERE event_type = 'view'
), c AS (
  SELECT user_id, epoch(ts) AS t FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id, epoch(ts) AS t FROM events WHERE event_type = 'purchase'
), l3 AS (
  SELECT DISTINCT v.user_id
  FROM v JOIN c ON c.user_id = v.user_id
             AND c.t > v.t AND c.t <= v.t + {_FUNNEL_W}
         JOIN p ON p.user_id = v.user_id
             AND p.t > c.t AND p.t <= v.t + {_FUNNEL_W}
), l2 AS (
  SELECT DISTINCT v.user_id
  FROM v JOIN c ON c.user_id = v.user_id
             AND c.t > v.t AND c.t <= v.t + {_FUNNEL_W}
)
SELECT u.user_id,
       CAST(CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
                 WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
                 WHEN u.user_id IN (SELECT user_id FROM v) THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_level
FROM u
"""


def _zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values for lineitem rows over (l_extendedprice,
    l_quantity) with literal cut points — the at-scale bucketing path
    of operators/zorder.py (no per-column rank window), exactly the
    keys `zorder_write` range-partitions on. Pure integer arithmetic
    once the cuts are literals, so DuckDB replays bucket + interleave
    bit-for-bit. The footer-measured pruning property stays pytest-
    gated (tests/test_sources_and_skew.py); this row gates the key
    computation itself."""
    from polars_matmul_spark.operators.zorder import (
        _bucket,
        bits_per_column,
        z_value,
    )

    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_orderkey") % 7 == 0
    )
    bits = bits_per_column(2)
    b0 = _bucket(F.col("l_extendedprice"), _Z_CUTS_PRICE, bits)
    b1 = _bucket(F.col("l_quantity"), _Z_CUTS_QTY, bits)
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        z_value([b0, b1]).alias("zkey"),
    )


_Z_CUTS_PRICE = [10000.0, 20000.0, 30000.0, 40000.0, 50000.0, 60000.0, 70000.0]
_Z_CUTS_QTY = [10.0, 20.0, 30.0, 40.0]


def _zorder_oracle() -> str:
    nb1 = (1 << 16) - 1  # bits_per_column(2) = 16
    price_arr = "[" + ", ".join(repr(c) for c in _Z_CUTS_PRICE) + "]"
    qty_arr = "[" + ", ".join(repr(c) for c in _Z_CUTS_QTY) + "]"
    # Morton interleave: bit j of column i lands at position j*2 + i.
    # Multiplication by the literal power of two, not <<, to dodge
    # operator-precedence surprises across dialects.
    z_terms = " + ".join(
        f"(((b0 // {1 << j}) % 2) * {1 << (j * 2)}) + "
        f"(((b1 // {1 << j}) % 2) * {1 << (j * 2 + 1)})"
        for j in range(16)
    )
    return f"""
WITH li AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(len(list_filter({price_arr},
              c -> c <= CAST(l_extendedprice AS DOUBLE))) AS BIGINT) AS below0,
         CAST(len(list_filter({qty_arr},
              c -> c <= CAST(l_quantity AS DOUBLE))) AS BIGINT) AS below1
  FROM lineitem WHERE l_orderkey % 7 = 0
), b AS (
  SELECT l_orderkey, l_linenumber,
         CAST(floor(below0 * {nb1} / {len(_Z_CUTS_PRICE)}) AS BIGINT) AS b0,
         CAST(floor(below1 * {nb1} / {len(_Z_CUTS_QTY)}) AS BIGINT) AS b1
  FROM li
)
SELECT l_orderkey, l_linenumber, CAST({z_terms} AS BIGINT) AS zkey FROM b
"""


def _retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily retention cohorts over the events table
    (operators/funnel.py): first-seen day per user, then cohort x
    day-offset distinct-user counts — two map-side-combinable shuffles.
    Daily periods (weekly collapses this corpus's ~5-week span into a
    single 5-row cohort — daily yields 59 informative rows at sf0.01)."""
    from polars_matmul_spark.operators.funnel import retention_cohorts

    events = load_table(spark, "events", sf_dir)
    return retention_cohorts(events, period_seconds=86400)


_RETENTION_ORACLE = """
WITH up AS (
  SELECT user_id AS u, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS p
  FROM events
), f AS (SELECT u, min(p) AS cohort FROM up GROUP BY u)
SELECT f.cohort AS cohort_period, up.p - f.cohort AS period_offset,
       CAST(count(DISTINCT up.u) AS BIGINT) AS n_users
FROM up JOIN f USING (u) GROUP BY 1, 2
"""


CORE_QUERIES: dict[str, tuple] = {
    # similarity surface
    "topk_cosine": _make_topk("cosine"),
    "topk_kernel_cosine": (_topk_kernel, _topk_kernel_oracle()),
    # topk_euclidean rotated out in round 6 (the euclidean metric stays
    # pytest-gated in test_kernels/test_similarity_functions and its
    # exact value comparison moves to test_oracle_parity's
    # rotated-query gate) so the CMS/sampling/Hamming families get
    # driver rows in queries_datapipe:
    "matmul_flatten": (_matmul_flatten_scores, _MATMUL_FLATTEN_ORACLE),
    # embedding_neardup_cosine rotated out in the round-9 third wave
    # (brute-force cosine thresholding stays driver-gated through
    # topk_cosine / semantic_dedup_pairs / srp_neardup_bands; exact
    # value comparison kept in test_oracle_parity's rotated gate) so
    # the perceptual image-dedup family gets its oracle row
    # (queries_multimodal.py):
    "ann_ivf_topk": (_ann_ivf, _duck_ivf_oracle()),
    # ann_brp_lsh_join rotated out in round 9: MLlib's JVM-private RNG
    # made it the registry's one permanently rows-only row. Its
    # replacement covers the same Euclidean-LSH-join semantics with an
    # engine-replayable seeded family (full DuckDB value oracle); the
    # MLlib integration keeps its recall/precision/determinism gates in
    # tests/test_ann_recall.py and a rows-sanity gate there too.
    "lsh_euclidean_join": (_lsh_euclidean, _lsh_euclidean_oracle()),
    # relational surface
    "q1_pricing_summary": (_q1, _Q1_SQL),
    "q3_shipping_priority": (_q3, _Q3_ORACLE),
    "q5_local_supplier": (_q5, _Q5_ORACLE),
    # top_suppliers_per_nation rotated out in the round-7 second
    # rotation (dense_rank window class stays pinned via the rotated
    # gate + cust_quartiles there; q3/q5 keep the join surface
    # driver-gated) — slot freed for shared_span_stats:
    # event_hourly_windows and cube_sales rotated out in round 6
    # (tumbling windows stay driver-gated through hypertable_rollup
    # and the stream==batch pytests; GROUPING SETS stay pinned in
    # test_window_breadth; both keep exact value comparisons in the
    # rotated-query gate) — slots freed for the round-6 second
    # rotation in queries_datapipe:
    # moving_avg_revenue rotated out late in round 5 (the sliding ROWS
    # frame keeps its exact oracle comparison in test_oracle_parity's
    # rotated-query gate; window functions stay driver-gated via
    # cust_quartiles/top_suppliers/sessionize) so the z-order layout
    # family gets a driver row:
    # zorder_keys rotated out in the round-7 second rotation (the
    # bit-interleave mechanism is single-purpose and fully pinned in
    # tests/test_zorder.py + the rotated gate) — slot freed for
    # profile_diff (queries_pipeline.py):
    "funnel_user_levels_windowed": (
        _funnel_levels_windowed,
        _FUNNEL_LEVELS_ORACLE,
    ),
    # Rotated out in round 3 to stay under the driver's 50-query cap
    # while the round-2 pipeline families (queries_pipeline.py) get
    # driver rows: q4_order_priority (EXISTS semi-join — anti/semi
    # joins covered by anti_join_customers + customer_set_ops),
    # q14_promo_revenue (conditional agg — covered by q1/q6),
    # json_event_props (get_json_object projection — props parsing also
    # exercised by sessionize/event queries), q10_returned_items and
    # q13_order_distribution (join+agg shapes covered by q3/q5/q18).
    # Round 4 rotates out explode_embedding (H5/H8 posexplode+row-index
    # — also exercised by matmul_flatten and mm_frame_sample) and
    # q6_forecast_revenue (filter+agg subsumed by q1) so the SCD2 and
    # int8-rerank families get driver rows (queries_pipeline.py); then
    # customer_set_ops / anti_join_customers / string_date_funcs /
    # pivot_order_status (set ops + anti joins live inside
    # merge_upsert/domain_filter paths, pivot is pinned by the
    # unpivot-inverts-pivot test, scalar funcs run everywhere) so the
    # line-dedup / quality-model / DSIR / sharding families get driver
    # rows (queries_datapipe.py).
    # Round 5 rotates out topk_dot (N4's dot metric stays driver-gated
    # via matmul_flatten's dot scores plus kernel pytests) and
    # salted_event_counts (salting==plain-groupBy equivalence is
    # pytest-pinned in test_sources_and_skew.py; the unsalted groupBy
    # shape stays driver-gated through q1/cube_sales) so the funnel and
    # embedding-dedup families get driver rows (funnel_steps below,
    # srp_neardup_bands + semantic_dedup_pairs in queries_datapipe.py).
    # Later in round 5, lang_id / mm_frame_sample / hash_split_docs
    # rotate out of their packs (each pytest-pinned, each family still
    # represented by a sibling green row) so retention_cohorts (above),
    # winnow_dup_pairs (queries_text.py) and hard_negatives_topk
    # (queries_datapipe.py) get driver rows.
    # Round 6 rotates out q18_large_orders (having+join-back agg —
    # covered by q3/q5/cube_sales), cust_quartiles_by_nation (ntile
    # window — rank windows stay driver-gated via
    # top_suppliers_per_nation, frame windows via sessionize) and
    # brand_above_avg_parts (scalar-subquery broadcast — the shape
    # lives inside dsir/quality plan-literal paths too) so c4_clean +
    # dedup_groups (queries_text.py), the windowed funnel fold (above),
    # ivfpq_adc_topk (queries_datapipe.py) and mm_decoded_stats
    # (queries_multimodal.py) get driver rows — all four keep exact
    # oracle comparisons in test_oracle_parity's rotated-query gate.
    # Round 7 rotates out matmul_nested (N1's kernel + Series assembly
    # stay driver-gated through matmul_flatten and topk rows; the
    # nested form keeps its exact comparison in the rotated gate),
    # sessionize_events (gap windows also live in funnel/retention
    # pytests and the session window stays pinned in test_plans),
    # funnel_steps (the windowed per-user funnel fold above is the
    # strictly richer driver row of the same family),
    # retention_cohorts (cohort windows multiply covered:
    # funnel_user_levels_windowed + scd2 + hypertable_rollup),
    # asof_purchase_click and range_join_price_bands (single-mechanism
    # join rows with dedicated pytest modules test_asof.py /
    # rangejoin tests) — six slots for the span-excision family
    # (queries_text.py) and the within-doc strip / bin
    # materialization / mixture / BPE rows (queries_datapipe.py).
    # The query functions remain above, importable and unit-covered.
    # sketch_distinct_users rotated out in round 8 (rows-only by
    # design — its <=5% HLL/quantile error bound lives in
    # tests/test_sketches_and_bucketing.py, which stays) so the
    # mediaprobe family gets a driver row (queries_multimodal.py):
    "mllib_blockmatrix_matmul": (_mllib_blockmatmul, _MLLIB_BLOCKMATMUL_ORACLE),
    # hypertable_rollup rotated out in the round-7 second rotation
    # (time-bucket rollup class stays driver-gated through
    # funnel_user_levels_windowed and pinned in the rotated gate +
    # stream==batch pytests) — slot freed for merge_upsert
    # (queries_pipeline.py):
}
