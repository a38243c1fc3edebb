"""Physical-plan inspection helpers.

The 100 TB design claims (filters reach the parquet scan, small dims
broadcast, dedup is one shuffle, kernels stay elementwise) are
assertable facts about the physical plan — tests/test_plans.py pins
them so a regression that silently de-optimizes a plan fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The string ``df.explain(mode)`` would print."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators in the (initial) physical plan."""
    plan = explain_str(df, "simple")
    return plan.count("Exchange")


def uses_python_worker(df: DataFrame) -> bool:
    """True if any Python-UDF evaluation operator appears in the plan."""
    plan = explain_str(df, "simple")
    return any(
        marker in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
    )
