"""Column-level Spark surface of the engine.

``pmm`` mirrors the reference's ``Expr.pmm`` namespace
(reference: python/polars_matmul/__init__.py:39-196) as module-level
functions over Spark Columns.
"""

from polars_matmul_spark.functions import similarity as pmm  # noqa: F401
from polars_matmul_spark.functions.similarity import (  # noqa: F401
    matmul,
    matmul_arrow,
    matmul_flatten,
    matmul_flatten_series,
    topk,
    topk_arrow,
    topk_exploded,
)
