from polars_matmul_spark.sources.tables import TABLES, load_table, register_views  # noqa: F401
from polars_matmul_spark.sources.ingest import (  # noqa: F401
    read_csv_quarantine,
    read_jsonl_quarantine,
)
