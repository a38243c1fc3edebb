"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the same configs are the ones that
matter on a real cluster (AQE, Arrow, shuffle partition sizing). Keep
every scale-relevant knob here so tests, bench, and the driver share
one profile.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


_WORKER_BLAS = os.environ.get("SPARK_GRAFT_WORKER_BLAS_THREADS", "1")


def get_spark(app_name: str = "polars_matmul_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # shuffle partitions ~ cores locally; on a 1000-executor cluster
        # this is raised to ~2-3x total cores (or left to AQE coalesce)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime re-plan — coalesces small shuffle partitions and
        # splits skewed ones; essential at 100 TB, harmless locally
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batches between JVM and Python workers — the analog of
        # the reference's zero-copy Series->matrix path
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # oracle comparison: DuckDB timestamps are UTC-naive
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata stores TIMESTAMP(NANOS) which Spark cannot read
        # natively; read as long and convert in sources.tables.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # each Spark task owns ~1 core, so worker-side BLAS must be
        # single-threaded: with N parallel python workers each spawning
        # a cores-wide OpenBLAS pool, the ref-shape GEMM ran under up
        # to 8x32 threads on 32 cores — scheduler roulette that made
        # kernel rows read 0.19s or 0.45s run to run (the round-7
        # "contaminated sidecar"). Pinning removes the oversubscription
        # at the source; driver-side NumPy (the bench denominators)
        # keeps the machine-wide default pool. Override via
        # SPARK_GRAFT_WORKER_BLAS_THREADS for few-task/big-GEMM jobs.
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", _WORKER_BLAS)
        .config("spark.executorEnv.OMP_NUM_THREADS", _WORKER_BLAS)
        .config("spark.executorEnv.MKL_NUM_THREADS", _WORKER_BLAS)
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ship_package(spark: SparkSession) -> None:
    """Make this package importable inside executor Python workers no
    matter what cwd/PYTHONPATH the driver process has (and, on a real
    cluster, on executors that don't share the driver's filesystem):
    zip the package once per SparkContext and addPyFile it."""
    import shutil
    import tempfile

    import polars_matmul_spark

    sc = spark.sparkContext
    if getattr(sc, "_pmm_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(polars_matmul_spark.__file__))
    tmp = tempfile.mkdtemp(prefix="pmm_ship_")
    zip_path = shutil.make_archive(
        os.path.join(tmp, "polars_matmul_spark"),
        "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir="polars_matmul_spark",
    )
    sc.addPyFile(zip_path)
    sc._pmm_shipped = True


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
