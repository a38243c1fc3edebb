"""Event-sequence analytics: conversion funnels and retention cohorts.

The events-side companions to sessionization/windowing (queries_core)
and the hypertable rollup (operators/rangejoin.py) — the two queries
every product-analytics workload runs against an events table.

Both are one-shuffle shapes:

- ``funnel``: ordered multi-step conversion per user. Step i counts a
  user iff they performed step i's event AFTER their earliest
  qualifying step i-1 event (strictly ordered, optional window).
  Implemented as one groupBy(user) with conditional min-timestamp
  aggregates chained left-to-right — NO self-joins, NO window
  functions: the classic n-way funnel self-join plan is O(steps)
  shuffles; this is exactly one, and the chain is resolved per row in
  the aggregate's finishing projection.
- ``retention_cohorts``: users grouped by first-activity period
  (cohort) x activity period offset. Two aggs: first-seen per user
  (one shuffle on user), then cohort x offset distinct-user counts
  (one shuffle on the pair) — both map-side combinable.

Period arithmetic uses integer epoch-day/week buckets (engine-portable
— DuckDB replicates with the same divisions; no timezone/locale
functions, which differ across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "funnel_user_levels", "py_funnel_level", "retention_cohorts"]


def funnel_user_levels(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
    max_t0_candidates: int | None = 1024,
) -> DataFrame:
    """(user, funnel_level): the deepest step each user reached IN
    ORDER — a user reaches step i iff SOME strictly-increasing event
    chain step_0 < step_1 < ... < step_i exists (with
    ``within_seconds``, one whose whole span fits in
    [t0, t0 + within] for SOME step-0 event t0).

    One shuffle: groupBy(user) collecting sorted per-step timestamp
    lists, then a pure-Catalyst fold in the projection. Without a
    window, the fold is single-pass greedy from the earliest step-0
    event — taking the earliest qualifying event at each step
    dominates any other choice, so greedy == exists. WITH a window,
    greedy-from-the-earliest-t0 undercounts (an earlier t0 also
    closes the deadline earlier), so the fold instead evaluates the
    greedy chain per CANDIDATE t0 — exact for a fixed deadline — and
    takes the max reached level over the user's step-0 events.

    That per-candidate evaluation is quadratic in a user's step-0
    events, so the candidate set is BOUNDED: candidates are first
    deduplicated to DISTINCT timestamp values (two step-0 events at
    the same exact ts share the same (t0, deadline), so the dedup is
    lossless — no per-second collapse, which would be lossy for
    fractional timestamps), then capped at the first
    ``max_t0_candidates`` distinct values. Exact for any user with at
    most ``max_t0_candidates`` DISTINCT step-0 timestamps (every human
    user at the default 1024); for an adversarial burst-bot the result
    is the funnel over the capped candidate list — a documented lower
    bound, never an overcount, equal to :func:`py_funnel_level` on the
    same capped input (pinned in tests/test_funnel.py). Pass ``None``
    to evaluate every candidate (the exact-but-unbounded form).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    t = F.col(ts_col).cast("double")
    # earliest ts of each step type per user, unconditionally; the
    # ORDER constraint is applied after aggregation. NOTE: min over
    # all of a user's step-i events is not enough when an earlier
    # step-i event precedes step i-1 — so collect the full sorted ts
    # list per step (bounded by per-user event counts) and pick the
    # first qualifying one in the fold.
    aggs = [
        F.sort_array(
            F.collect_list(F.when(F.col(type_col) == s, t))
        ).alias(f"__ts_{i}")
        for i, s in enumerate(steps)
    ]
    per_user = events.groupBy(F.col(user_col)).agg(*aggs)

    n_steps = len(steps)
    if within_seconds is None:
        # single-pass greedy from the earliest step-0 event (exact
        # without a deadline); try_element_at -> NULL (not an ANSI
        # error) for users who never reach a step
        # NB: predicates are bound via closure factories, NOT default
        # args — PySpark reads a lambda's arity to decide the HOF
        # variable count, so `lambda x, p=prev:` would be (element,
        # index) and silently drop the ordering constraint
        def _after(p):
            return lambda x: x > p

        reach = [F.try_element_at(F.col("__ts_0"), F.lit(1))]
        for i in range(1, n_steps):
            cand = F.filter(F.col(f"__ts_{i}"), _after(reach[i - 1]))
            reach.append(F.try_element_at(cand, F.lit(1)))
        lvl = F.lit(0)
        for i in range(n_steps):
            lvl = F.when(reach[i].isNotNull(), F.lit(i + 1)).otherwise(lvl)
        user_level = lvl
    else:
        w_lit = F.lit(float(within_seconds))
        t0s = F.col("__ts_0")
        if max_t0_candidates is not None:
            # bound the per-user candidate set: drop exact-duplicate
            # timestamps (two step-0 events at the SAME ts value have
            # the same (t0, deadline) pair, so dropping the later copy
            # is lossless — unlike a per-second collapse, which with
            # fractional timestamps could hide a later same-second t0
            # whose later deadline reaches deeper), then keep the first
            # N distinct values. filter's 0-based index i vs 1-based
            # element_at(arr, i) = the previous element of the sorted
            # list. Pure Catalyst, no extra shuffle.
            distinct_t0 = F.filter(
                F.col("__ts_0"),
                lambda x, i: (i == F.lit(0))
                | (x != F.element_at(F.col("__ts_0"), i)),
            )
            t0s = F.slice(distinct_t0, 1, int(max_t0_candidates))

        def _level_for(t0):
            # greedy chain anchored at t0 with deadline t0 + W: exact
            # for a fixed deadline. A null prev poisons every later
            # comparison -> empty filter -> level stops incrementing.
            def _in_window(p):
                return lambda x: (x > p) & (x <= t0 + w_lit)

            lvl = F.lit(1)
            prev = t0
            for i in range(1, n_steps):
                cand = F.filter(F.col(f"__ts_{i}"), _in_window(prev))
                nxt = F.try_element_at(cand, F.lit(1))
                lvl = F.when(nxt.isNotNull(), lvl + 1).otherwise(lvl)
                prev = nxt
            return lvl

        levels = F.transform(t0s, _level_for)
        user_level = F.when(
            F.size("__ts_0") > 0, F.array_max(levels)
        ).otherwise(F.lit(0))

    return per_user.select(
        F.col(user_col), user_level.cast("int").alias("funnel_level")
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """(step_idx, step, n_users): the funnel counts — users with
    :func:`funnel_user_levels` >= i+1 per step i."""
    n_steps = len(steps)
    lv = funnel_user_levels(
        events, steps, user_col, type_col, ts_col, within_seconds
    )
    counts = lv.agg(
        *[
            F.sum((F.col("funnel_level") >= i + 1).cast("long")).alias(f"__n_{i}")
            for i in range(n_steps)
        ]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("step_idx"),
                        F.lit(s).alias("step"),
                        F.col(f"__n_{i}").cast("long").alias("n_users"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.step_idx", "r.step", "r.n_users")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 86400,
) -> DataFrame:
    """(cohort_period, period_offset, n_users): distinct users from
    first-activity period ``cohort_period`` active again
    ``period_offset`` periods later. Offset 0 row = cohort size.

    Periods are integer buckets of epoch seconds — engine-portable and
    timezone-free.
    """
    period = F.floor(F.col(ts_col).cast("double") / period_seconds).cast("long")
    up = events.select(F.col(user_col).alias("u"), period.alias("p"))
    first = up.groupBy("u").agg(F.min("p").alias("cohort"))
    joined = up.join(first, "u")
    return (
        joined.groupBy(
            F.col("cohort").alias("cohort_period"),
            (F.col("p") - F.col("cohort")).alias("period_offset"),
        )
        .agg(F.count_distinct("u").alias("n_users"))
    )

def py_funnel_level(
    ts_lists: list[list[float]], within_seconds: float | None = None
) -> int:
    """Pure-Python twin of the :func:`funnel_user_levels` fold over one
    user's per-step SORTED timestamp lists — the update function of the
    stateful streaming funnel (streaming/events.py) and the oracle the
    property test holds both to."""
    import bisect

    n = len(ts_lists)
    if not ts_lists or not ts_lists[0]:
        return 0
    if within_seconds is None:
        prev = ts_lists[0][0]
        lvl = 1
        for i in range(1, n):
            j = bisect.bisect_right(ts_lists[i], prev)
            if j >= len(ts_lists[i]):
                break
            prev = ts_lists[i][j]
            lvl += 1
        return lvl
    best = 1
    for t0 in ts_lists[0]:
        prev, lvl = t0, 1
        deadline = t0 + within_seconds
        for i in range(1, n):
            j = bisect.bisect_right(ts_lists[i], prev)
            if j >= len(ts_lists[i]) or ts_lists[i][j] > deadline:
                break
            prev = ts_lists[i][j]
            lvl += 1
        best = max(best, lvl)
    return best
