"""Machine-load calibration shared by the perf gates and bench.py.

Timing assertions on a shared CI box are only meaningful relative to
how contended the box is *right now*. The calibration job is a fixed
JVM-only workload (cached scan + small agg — no Python stage, so its
wall tracks JVM/CPU contention, which is what inflates Spark walls,
while leaving single-threaded NumPy baselines untouched).

The idle baseline is NOT a hard-coded constant (a constant measured on
one box mis-scales every other box — slower hardware would read as
"permanently contended"). Instead the minimum calibration wall ever
observed on this machine is persisted to ``.perf_baseline.json`` at
the repo root and used as the denominator; the min converges on the
true idle floor after a handful of runs. The seed is
``min(first_wall, 0.15)`` — 0.15 s is the documented idle ballpark of
the dev box, and seeding with the min keeps the factor conservative
(factor >= 1 on slower hardware loosens gates, never tightens them).

Round-3 postmortem that motivates all of this: the r2 bench recorded
2-6x slowdowns on five queries whose code had not changed; idle reruns
put every one back at r1 levels. Gates must therefore *scale* with
measured load — not skip, which silences real regressions on a
perpetually busy box (round-3 verdict, "What's wrong" #1).
"""

from __future__ import annotations

import json
import os
import time

__all__ = ["calibration_wall", "load_factor", "BASELINE_PATH"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_PATH = os.path.join(_REPO_ROOT, ".perf_baseline.json")

# documented idle ballpark of the original dev box; only used to cap
# the first-run seed so a loaded first run cannot poison the baseline
_SEED_CAP = 0.15


def calibration_wall(spark, sf_dir: str = "/root/testdata/sf0.01") -> float:
    """Wall of the fixed JVM-only calibration job (best of 3)."""
    from polars_matmul_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", sf_dir).cache()
    li.count()

    def run():
        li.groupBy("l_returnflag").count().collect()

    run()
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        walls.append(time.perf_counter() - t0)
    li.unpersist()
    return min(walls)


def _read_baseline() -> float | None:
    try:
        with open(BASELINE_PATH) as fh:
            v = json.load(fh).get("min_calibration_wall")
        return float(v) if v else None
    except (OSError, ValueError, TypeError):
        return None


def _write_baseline(value: float) -> None:
    try:
        with open(BASELINE_PATH, "w") as fh:
            json.dump({"min_calibration_wall": round(value, 4)}, fh)
    except OSError:
        pass  # read-only checkout: fall back to in-run baseline only


def load_factor(wall: float) -> tuple[float, float]:
    """(factor, baseline) for a measured calibration ``wall``.

    factor = wall / baseline where baseline is the persisted
    min-observed wall on this machine (updated here when ``wall`` sets
    a new min). factor ~1 means idle; >2 means the box is visibly
    contended and Spark walls are inflated accordingly.
    """
    stored = _read_baseline()
    baseline = min(stored, wall) if stored is not None else min(wall, _SEED_CAP)
    if stored is None or baseline < stored:
        _write_baseline(baseline)
    return wall / baseline, baseline
