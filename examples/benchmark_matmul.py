"""Raw matmul benchmark harness, ported from the reference's
examples/benchmark_matmul.py (base config 1000x10000x256 at :105,
sweep axes at :110-143).

Measures the all-pairs score kernel (one array<float|double> score row
per query) against same-hardware NumPy, plus the flatten variant.

Usage: python examples/benchmark_matmul.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run_config(spark, n_q, n_c, dim, dtype, flatten=False):
    from polars_matmul_spark.functions import matmul, matmul_flatten

    rng = np.random.default_rng(42)
    Q = rng.standard_normal((n_q, dim)).astype(dtype)
    C = rng.standard_normal((n_c, dim)).astype(dtype)

    t0 = time.perf_counter()
    Q @ C.T
    t_np = time.perf_counter() - t0

    is_f32 = dtype == np.float32
    typ = "float" if is_f32 else "double"
    df = (
        spark.createDataFrame(
            [(i, q.tolist()) for i, q in enumerate(Q)],
            f"query_id long, embedding array<{typ}>",
        )
        .coalesce(8)
        .cache()
    )
    df.count()
    if flatten:
        out = matmul_flatten(df, F.col("embedding"), C, keep=["query_id"], input_is_f32=is_f32)
    else:
        out = df.withColumn("s", matmul(F.col("embedding"), C, input_is_f32=is_f32))
    run = lambda: out.write.format("noop").mode("overwrite").save()
    run()
    t_spark = None
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        t_spark = min(t_spark or 1e9, time.perf_counter() - t0)
    df.unpersist()
    print(
        json.dumps(
            {
                "config": {
                    "n_q": n_q,
                    "n_c": n_c,
                    "dim": dim,
                    "dtype": str(np.dtype(dtype)),
                    "flatten": flatten,
                },
                "spark_sec": round(t_spark, 4),
                "numpy_sec": round(t_np, 4),
                "ratio": round(t_spark / max(t_np, 1e-9), 2),
            }
        ),
        flush=True,
    )


def main():
    from polars_matmul_spark.plans.session import get_spark, ship_package

    quick = "--quick" in sys.argv
    spark = get_spark("benchmark_matmul")
    ship_package(spark)
    base = dict(n_q=1000, n_c=10000, dim=256)
    run_config(spark, **base, dtype=np.float32)
    run_config(spark, **base, dtype=np.float64)
    if not quick:
        for n_q in (500, 2000):
            run_config(spark, **{**base, "n_q": n_q}, dtype=np.float32)
        for dim in (128, 512):
            run_config(spark, **{**base, "dim": dim}, dtype=np.float32)
        run_config(spark, n_q=200, n_c=2000, dim=64, dtype=np.float32, flatten=True)
    spark.stop()


if __name__ == "__main__":
    main()
