from polars_matmul_spark.plans.session import get_spark, stop_spark  # noqa: F401
