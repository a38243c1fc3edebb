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

__all__ = ["funnel", "retention_cohorts"]


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """(step_idx, step, n_users): how many users reached each step IN
    ORDER. A user reaches step i at their EARLIEST step-i event that is
    strictly after their step-(i-1) reach time (and, with
    ``within_seconds``, within that window of the step-0 reach time).

    One shuffle: groupBy(user) with per-step conditional min-ts
    aggregates; the strictly-after chaining is a driver-side fold over
    the aggregated struct, evaluated per user row in the projection.
    min-ts chaining is the standard greedy funnel semantics: taking the
    earliest qualifying event at every step dominates any other choice
    (it can only admit MORE later steps), so the greedy count equals
    the exists-an-ordered-subsequence count.
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

    # fold: reach_0 = first ts of step 0; reach_i = first ts_i >
    # reach_{i-1} (and <= reach_0 + within). filter() + try_element_at
    # (NULL, not an ANSI error, on users who never reach) keeps it
    # pure Catalyst.
    reach = [F.try_element_at(F.col("__ts_0"), F.lit(1))]
    deadline = (
        reach[0] + F.lit(float(within_seconds))
        if within_seconds is not None
        else None
    )

    def _qualifies(prev, dl):
        if dl is None:
            return lambda x: x > prev
        return lambda x: (x > prev) & (x <= dl)

    for i in range(1, len(steps)):
        cand = F.filter(F.col(f"__ts_{i}"), _qualifies(reach[i - 1], deadline))
        reach.append(F.try_element_at(cand, F.lit(1)))
    proj = per_user.select(
        *[reach[i].alias(f"__r_{i}") for i in range(len(steps))]
    )
    counts = proj.agg(
        *[
            F.count(F.col(f"__r_{i}")).alias(f"__n_{i}")
            for i in range(len(steps))
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
