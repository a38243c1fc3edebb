"""End-to-end top-k benchmark harness, ported from the reference's
examples/benchmark_topk.py (sweep axes at :152-185, NumPy correctness
check at :122-138, base config 1000x10000x256 k=10 at :147).

Sweeps queries/corpus/dim/k/dtype around the base config, verifies the
Spark kernel against a NumPy oracle (rtol 1e-4, score-sorted like the
reference's own comparison), and prints one JSON line per config.

Usage: python examples/benchmark_topk.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def np_topk(Q, C, k, metric="cosine"):
    # the reference's NumPy baseline (examples/benchmark_topk.py:26-33)
    if metric == "cosine":
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-10)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-10)
        S = Qn @ Cn.T
    else:
        S = Q @ C.T
    k = min(k, len(C))
    idx = np.argpartition(S, -k, axis=1)[:, -k:]
    scores = np.take_along_axis(S, idx, 1)
    order = np.argsort(-scores, axis=1)
    return np.take_along_axis(scores, order, 1)


def run_config(spark, n_q, n_c, dim, k, dtype, verify=False):
    from polars_matmul_spark.functions import topk
    from polars_matmul_spark.kernels import topk as kernel_topk

    rng = np.random.default_rng(42)
    Q = rng.standard_normal((n_q, dim)).astype(dtype)
    C = rng.standard_normal((n_c, dim)).astype(dtype)

    t0 = time.perf_counter()
    S = np_topk(Q, C, k)
    t_np = time.perf_counter() - t0

    typ = "float" if dtype == np.float32 else "double"
    df = (
        spark.createDataFrame(
            [(i, q.tolist()) for i, q in enumerate(Q)],
            f"query_id long, embedding array<{typ}>",
        )
        .coalesce(8)
        .cache()
    )
    df.count()
    out = df.withColumn("m", topk(F.col("embedding"), C, k=k))
    run = lambda: out.write.format("noop").mode("overwrite").save()
    run()  # warm python workers / plans
    t_spark = None
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        t_spark = min(t_spark or 1e9, time.perf_counter() - t0)

    ok = None
    if verify:
        # order rows by query_id; compare score matrices sorted per row
        rows = out.select("query_id", "m.score").orderBy("query_id").collect()
        got = np.array([r["m.score" if "m.score" in r else "score"] for r in rows])
        _, want = kernel_topk(Q, C, k, "cosine")
        ok = bool(np.allclose(np.sort(got, 1), np.sort(want, 1), rtol=1e-4))
        ok = ok and bool(np.allclose(np.sort(got, 1), np.sort(S, 1), rtol=1e-4))
    df.unpersist()
    print(
        json.dumps(
            {
                "config": {"n_q": n_q, "n_c": n_c, "dim": dim, "k": k, "dtype": str(np.dtype(dtype))},
                "spark_sec": round(t_spark, 4),
                "numpy_sec": round(t_np, 4),
                "ratio": round(t_spark / max(t_np, 1e-9), 2),
                **({"verified": ok} if ok is not None else {}),
            }
        ),
        flush=True,
    )


def main():
    from polars_matmul_spark.plans.session import get_spark, ship_package

    quick = "--quick" in sys.argv
    spark = get_spark("benchmark_topk")
    ship_package(spark)
    base = dict(n_q=1000, n_c=10000, dim=256, k=10, dtype=np.float32)
    run_config(spark, **{**base, "n_q": 100, "n_c": 500}, verify=True)  # correctness
    run_config(spark, **base)
    if not quick:
        # the reference sweep axes (examples/benchmark_topk.py:152-185)
        for n_q in (500, 2000):
            run_config(spark, **{**base, "n_q": n_q})
        for n_c in (5000, 20000):
            run_config(spark, **{**base, "n_c": n_c})
        for dim in (128, 512):
            run_config(spark, **{**base, "dim": dim})
        for k in (5, 20):
            run_config(spark, **{**base, "k": k})
        run_config(spark, **{**base, "dtype": np.float64})
    spark.stop()


if __name__ == "__main__":
    main()
