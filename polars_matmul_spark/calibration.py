"""Machine-load calibration shared by the perf gates and bench.py.

Timing assertions on a shared CI box are only meaningful relative to
how contended the box is *right now*. The calibration job is a fixed
composite of the THREE contention channels a real query feels
(round-6 verdict #3 — the md5-only v1 job under-read the contention
that slowed BLAS-heavy queries 27-55% while stamping the box
"1.08x, idle"):

1. a 32-way JVM md5 map landed in a noop write — JVM/CPU scheduling
   pressure (the v1 job, kept);
2. a threaded-BLAS GEMM at the reference shape (1000x256 @
   256x10000 f32) — the hypervisor/SMT contention that slows
   multithreaded OpenBLAS, which is exactly what the NumPy
   denominators and the Arrow kernels run on;
3. a small 32-partition shuffle with a per-call varying literal (so
   Spark can never reuse the exchange) — shuffle-service /disk
   pressure, which map-only jobs never touch.

The three walls are SUMMED per trial (best of 3 trials): per-trial
summing preserves the correlation a contention burst induces across
channels, where per-component minima would each dodge it.

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

# documented idle ballpark of the dev box for the COMPOSITE
# calibration job below; only used to cap the early-run seed so loaded
# first runs cannot poison the baseline
_SEED_CAP = 1.0

_CAL_ROWS = 32_000_000
_SHUFFLE_ROWS = 500_000

# BLAS component matrices, built once (generation time must not leak
# into the timed section): the bench's reference shape, f32, so the
# component slows under exactly the contention that slows the NumPy
# denominators and the Arrow kernels
_GEMM_CACHE = None
# per-call shuffle salt: a fresh literal each run changes the plan, so
# Spark cannot silently reuse the exchange (which would turn repeat
# runs into a scheduler-latency measurement — the round-3 bug)
_SHUFFLE_SALT = 0


def _gemm_mats():
    global _GEMM_CACHE
    if _GEMM_CACHE is None:
        import numpy as np

        rng = np.random.default_rng(7)
        _GEMM_CACHE = (
            rng.standard_normal((1000, 256)).astype(np.float32),
            rng.standard_normal((10000, 256)).astype(np.float32),
        )
    return _GEMM_CACHE


def calibration_wall(spark, sf_dir: str = "/root/testdata/sf0.01") -> float:
    """Wall of the fixed composite calibration job (best of 3 trials;
    each trial sums the three channel walls — see module docstring).

    Channel design notes, learned the hard way across rounds 3-6:

    - md5 map: PARALLEL and compute-bound — keeps every core busy for
      ~hundreds of ms so its inflation tracks 32-thread query walls
      (the round-3 cached-scan job saturated nothing and under-read a
      2.8x slowdown as 1.5x). Map-only noop write: nothing to reuse,
      recomputes fully every run, still hits the codegen cache.
    - GEMM: multithreaded OpenBLAS at the reference shape. Round 6
      showed the md5 job alone reading 1.08x while BLAS-heavy
      queries ran 27-55% over their r5 walls — hypervisor/SMT
      contention hits BLAS threads harder than a JVM hash loop, and
      only a BLAS probe feels it.
    - small shuffle: 32-partition groupBy with a per-call varying
      literal. Spark silently REUSES an unchanged plan's shuffle
      stage across jobs in a session (the round-3 'idle floor' was
      mostly scheduler time because of exactly this); the fresh
      literal forces a real exchange write+read every run.
    """
    global _SHUFFLE_SALT
    from pyspark.sql import functions as F

    df = spark.range(0, _CAL_ROWS, 1, 32).select(
        F.md5(F.col("id").cast("string")).alias("h")
    )
    Q, C = _gemm_mats()

    def run_md5():
        df.write.format("noop").mode("overwrite").save()

    def run_gemm():
        Q @ C.T

    def run_shuffle():
        global _SHUFFLE_SALT
        _SHUFFLE_SALT += 1
        (
            spark.range(0, _SHUFFLE_ROWS, 1, 32)
            .select(((F.col("id") + F.lit(_SHUFFLE_SALT)) % 8192).alias("k"))
            .groupBy("k")
            .agg(F.count("*").alias("n"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    run_md5(), run_gemm(), run_shuffle()  # codegen/BLAS warmup
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_md5()
        run_gemm()
        run_shuffle()
        walls.append(time.perf_counter() - t0)
    return min(walls)


#: state key version: the calibration WORKLOAD defines the wall's
#: units, so a workload change must orphan old observations (v1 was
#: the md5-only parallel job; v2 adds the BLAS GEMM and the
#: non-reusable shuffle — round-6 verdict #3)
_STATE_KEY = "best_walls_composite_v2"


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
