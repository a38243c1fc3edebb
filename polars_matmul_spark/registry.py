"""Unified query registry: name -> (spark_fn, duckdb_oracle_sql | None).

``spark_fn(spark, sf_dir) -> DataFrame``. Oracle SQL runs in DuckDB
against views named after the parquet tables. Queries without an
SQL-expressible twin carry ``None`` (driver records a rows-only check).
"""

from __future__ import annotations

from polars_matmul_spark.queries_core import CORE_QUERIES
from polars_matmul_spark.queries_datapipe import DATAPIPE_QUERIES
from polars_matmul_spark.queries_multimodal import MULTIMODAL_QUERIES
from polars_matmul_spark.queries_pipeline import PIPELINE_QUERIES
from polars_matmul_spark.queries_text import TEXT_QUERIES

ALL_QUERIES: dict[str, tuple] = {}
ALL_QUERIES.update(CORE_QUERIES)
ALL_QUERIES.update(TEXT_QUERIES)
ALL_QUERIES.update(MULTIMODAL_QUERIES)
ALL_QUERIES.update(PIPELINE_QUERIES)
ALL_QUERIES.update(DATAPIPE_QUERIES)


def queries():
    return {name: fn for name, (fn, _oracle) in ALL_QUERIES.items()}


def oracles():
    return {
        name: oracle
        for name, (_fn, oracle) in ALL_QUERIES.items()
        if oracle is not None
    }
