"""Machine-load calibration shared by the perf gates and bench.py.

Timing assertions on a shared CI box are only meaningful relative to
how contended the box is *right now*. The calibration job is a fixed
JVM-only PARALLEL workload (32-way md5 map landed in a noop write —
no Python stage, so its wall tracks the JVM/CPU contention that
inflates Spark walls while leaving single-threaded NumPy baselines
untouched; see ``calibration_wall`` for why it must be parallel and
shuffle-free).

The idle baseline is NOT a hard-coded constant (a constant measured on
one box mis-scales every other box — slower hardware would read as
"permanently contended"). The five smallest calibration walls ever
observed on this machine are persisted to ``.perf_baseline.json`` at
the repo root and their MEDIAN is the denominator: one lucky reading
(warm page cache + momentarily quiet hypervisor) cannot drag the
baseline down forever — round 4 observed exactly that failure with
the round-3 single-min scheme (a 0.064 s fluke vs a 0.13-0.23 s
steady state made every honest reading look 3x "contended"). The
early-run seed is ``min(first_wall, _SEED_CAP)`` — the cap is the
documented idle ballpark of the dev box for the parallel job,
keeping the factor conservative (factor >= 1 on slower hardware
loosens gates, never tightens them).

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

# documented idle ballpark of the dev box for the PARALLEL calibration
# job below; only used to cap the early-run seed so loaded first runs
# cannot poison the baseline
_SEED_CAP = 0.5

_CAL_ROWS = 32_000_000


def calibration_wall(spark, sf_dir: str = "/root/testdata/sf0.01") -> float:
    """Wall of the fixed JVM-only calibration job (best of 3): md5
    over 32M synthetic rows across 32 partitions, landed in a noop
    write.

    Two properties matter, both learned the hard way in round 4:

    - PARALLEL and compute-bound: the round-3 job (cached scan +
      tiny groupBy) saturated nothing, so hypervisor noise that
      inflated 32-thread query walls ~2.8x moved the calibration only
      ~1.5x — ceilings scaled too little and a healthy gate flaked.
      This job keeps every core busy for ~hundreds of ms, so its
      inflation tracks what real queries experience (the same box
      showed 20 s stalls of this job mid-noise — exactly the signal).
    - NO shuffle: Spark silently REUSES a plan's shuffle stage across
      jobs in a session, so re-collecting the same aggregate measures
      scheduling latency, not compute (the round-3 job's repeat runs
      did exactly that — its 'idle floor' was mostly scheduler time).
      A map-only noop write has nothing to reuse and recomputes fully
      every run while still hitting the codegen cache.
    """
    from pyspark.sql import functions as F

    df = spark.range(0, _CAL_ROWS, 1, 32).select(
        F.md5(F.col("id").cast("string")).alias("h")
    )

    def run():
        df.write.format("noop").mode("overwrite").save()

    run()  # codegen warmup
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        walls.append(time.perf_counter() - t0)
    return min(walls)


#: state key version: the calibration WORKLOAD defines the wall's
#: units, so a workload change must orphan old observations (a 0.06 s
#: scheduler-latency floor is meaningless for the parallel job)
_STATE_KEY = "best_walls_parallel_v1"


def _read_state() -> list[float]:
    """The K smallest calibration walls ever observed (ascending)."""
    try:
        with open(BASELINE_PATH) as fh:
            data = json.load(fh)
        best = data.get(_STATE_KEY)
        return sorted(float(x) for x in best) if best else []
    except (OSError, ValueError, TypeError):
        return []


_KEEP_BEST = 5


def _write_state(best: list[float]) -> None:
    try:
        with open(BASELINE_PATH, "w") as fh:
            json.dump(
                {_STATE_KEY: [round(x, 4) for x in sorted(best)[:_KEEP_BEST]]},
                fh,
            )
    except OSError:
        pass  # read-only checkout: fall back to in-run baseline only


def load_factor(wall: float) -> tuple[float, float]:
    """(factor, baseline) for a measured calibration ``wall``.

    baseline = MEDIAN of the ``_KEEP_BEST`` smallest walls ever
    observed on this machine (persisted; this run's wall joins the
    pool). The round-3 design used the single min, which a lone lucky
    reading (warm page cache + quiet hypervisor) drags down forever,
    after which every honest reading looks "contended" — observed in
    round 4: one 0.064 s fluke against a 0.13-0.23 s steady state.
    The median-of-best-5 needs three lucky readings to move, while
    still converging to the true floor on a genuinely idle box.
    factor ~1 means idle; >2 means visibly contended.
    """
    best = _read_state()
    best = sorted(best + [wall])[:_KEEP_BEST]
    _write_state(best)
    if len(best) < 3:
        # too few observations for a meaningful median: cap at the
        # seed so early LOADED runs cannot set the baseline high
        # (which would read a genuinely contended box as idle and
        # refuse to loosen the gates — the conservative direction is
        # a LOW baseline: factor >= 1 loosens, never tightens). Raw
        # walls are persisted uncapped so the pool stays honest.
        baseline = min(best[0], _SEED_CAP)
    else:
        baseline = best[len(best) // 2]
    return wall / baseline, baseline
