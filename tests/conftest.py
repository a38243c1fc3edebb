import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_matmul_spark.plans.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF01_DIR = "/root/testdata/sf0.01"


def pytest_collection_modifyitems(session, config, items):
    """Run tests/test_performance.py FIRST (round-6 verdict #1: isolate
    the measurement instead of widening ceilings). Its gates compare
    Spark walls against same-run NumPy baselines; deep inside a ~20-min
    suite the heated JVM (GC pressure, shuffle-file churn) inflates
    Spark walls in ways the md5 calibration probe under-reads, which
    made the ref-shape gate flake three rounds running. On a cold
    session the perf numbers match bench.py's isolated runs."""
    perf = [i for i in items if "test_performance" in i.nodeid]
    if perf:
        rest = [i for i in items if "test_performance" not in i.nodeid]
        items[:] = perf + rest


@pytest.fixture(scope="session")
def spark():
    s = get_spark("polars_matmul_spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
