"""Driver-facing queries for the round-2 pipeline operator families:
TF-IDF, BM25, context chunking, table profiling, deterministic splits.

These operators shipped in round 2 with in-repo DuckDB-oracle pytests
only (the driver registry sat at its 50-query cap). Round 3 rotates
five redundant relational slots out (q4_order_priority,
q14_promo_revenue, json_event_props, q13_order_distribution,
q10_returned_items — each one's operator class is exercised by other
registered queries) so these families get independent driver
CORRECTNESS rows too.

Float discipline: tf_idf/bm25 involve ``ln`` whose last-ulp rounding is
not guaranteed identical across engines — both the Spark query and the
oracle round scores to 9 decimals, far above ulp noise (values are
O(1..10)), far below any semantic difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_matmul_spark.operators.chunking import chunk_documents
from polars_matmul_spark.operators.profile import profile_table
from polars_matmul_spark.operators.sampling import hash_split
from polars_matmul_spark.operators.tfidf import bm25_score, tf_idf
from polars_matmul_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "documents", sf_dir)


# --- TF-IDF ----------------------------------------------------------------

def _tfidf_weights(spark, sf_dir):
    out = tf_idf(_docs(spark, sf_dir))
    return out.withColumn("tf_idf", F.round("tf_idf", 9))


_TFIDF_ORACLE = r"""
WITH terms AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents
), terms_ne AS (
  SELECT * FROM terms WHERE term <> ''
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms_ne GROUP BY 1, 2
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM documents
)
SELECT doc_id, tf.term, tf,
       round(tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0), 9) AS tf_idf
FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN n
"""

# --- BM25 ------------------------------------------------------------------

_BM25_TERMS = ["data", "learning", "model"]


def _bm25_search(spark, sf_dir):
    out = bm25_score(_docs(spark, sf_dir), _BM25_TERMS)
    return out.withColumn("bm25", F.round("bm25", 9))


_BM25_ORACLE = rf"""
WITH dl AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                              t -> t <> '')) AS DOUBLE) AS dl
  FROM documents
), terms AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents
), hits AS (
  SELECT * FROM terms
  WHERE term <> '' AND term IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
), tf AS (
  SELECT h.doc_id, term, dl, count(*) AS tf
  FROM hits h JOIN dl ON h.doc_id = dl.doc_id GROUP BY 1, 2, 3
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM documents
), ad AS (
  SELECT avg(dl) AS avgdl FROM dl
)
SELECT doc_id,
       round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))),
             9) AS bm25
FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN n CROSS JOIN ad
GROUP BY doc_id
"""

# --- context chunking ------------------------------------------------------

_CHUNK, _OVERLAP = 64, 8
_STRIDE = _CHUNK - _OVERLAP


def _chunk_docs(spark, sf_dir):
    return chunk_documents(_docs(spark, sf_dir), _CHUNK, _OVERLAP)


_CHUNK_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE trim(text) <> ''
), counted AS (
  SELECT doc_id, toks, len(toks) AS n,
         greatest(1, CAST(ceil((len(toks) - {_OVERLAP}) / {_STRIDE}.0) AS BIGINT)) AS n_chunks
  FROM t
), chunks AS (
  SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_id, toks, n, n_chunks
  FROM counted
)
SELECT doc_id, chunk_id, n_chunks,
       chunk_id * {_STRIDE} AS chunk_start,
       CAST(len(toks[chunk_id * {_STRIDE} + 1 : chunk_id * {_STRIDE} + {_CHUNK}]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[chunk_id * {_STRIDE} + 1 : chunk_id * {_STRIDE} + {_CHUNK}], ' ') AS chunk_text
FROM chunks
"""

# --- table profiler --------------------------------------------------------

_PROFILE_COLS = ["l_orderkey", "l_quantity", "l_returnflag"]


def _profile_lineitem(spark, sf_dir):
    # the deterministic subset of the profile: HLL distinct and
    # stddev/mean are engine- or summation-order-approximate, so the
    # driver row pins the exact stats; the full profile (incl. HLL and
    # moments) is oracle-checked in tests/test_profile_and_materialize.py
    li = load_table(spark, "lineitem", sf_dir)
    return profile_table(li, _PROFILE_COLS).select(
        F.col("column").alias("col_name"),
        "dtype",
        "n_rows",
        "n_nulls",
        F.col("min").alias("min_val"),
        F.col("max").alias("max_val"),
    )


def _profile_oracle() -> str:
    dtypes = {"l_orderkey": "bigint", "l_quantity": "double", "l_returnflag": "string"}
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            f"""
SELECT '{c}' AS col_name, '{dtypes[c]}' AS dtype,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(min({c}) AS VARCHAR) AS min_val,
       CAST(max({c}) AS VARCHAR) AS max_val
FROM lineitem"""
        )
    return "\nUNION ALL\n".join(parts)


# --- deterministic hash split ---------------------------------------------

_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _hash_split_docs(spark, sf_dir):
    out = hash_split(_docs(spark, sf_dir), "doc_id", _SPLITS)
    return out.select("doc_id", "lang", "split")


_HASH_SPLIT_ORACLE = """
WITH b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
           % 1000000 AS bucket
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN bucket < 800000 THEN 'train'
            WHEN bucket < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


PIPELINE_QUERIES: dict[str, tuple] = {
    "tfidf_weights": (_tfidf_weights, _TFIDF_ORACLE),
    "bm25_search": (_bm25_search, _BM25_ORACLE),
    "chunk_documents": (_chunk_docs, _CHUNK_ORACLE),
    "profile_lineitem": (_profile_lineitem, _profile_oracle()),
    "hash_split_docs": (_hash_split_docs, _HASH_SPLIT_ORACLE),
}
