"""Funnel + retention cohorts (operators/funnel.py): hand-built
semantics matrix (ordering, windows, the early-event trap) and full
DuckDB replication on the events table."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.funnel import funnel, retention_cohorts
from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    yield con
    con.close()


def _mk_events(spark, rows):
    # rows: (user_id, event_type, t_seconds)
    return spark.createDataFrame(
        [(u, e, float(t)) for u, e, t in rows],
        "user_id long, event_type string, ts double",
    )


class TestFunnelSemantics:
    def test_ordering_matrix(self, spark):
        rows = [
            # u1: perfect A -> B -> C
            (1, "A", 10), (1, "B", 20), (1, "C", 30),
            # u2: B before A only -> stops after A
            (2, "B", 5), (2, "A", 10),
            # u3: A only
            (3, "A", 1),
            # u4: the early-event trap — a B BEFORE A and another after:
            # must still convert via the later B
            (4, "B", 1), (4, "A", 10), (4, "B", 20), (4, "C", 25),
            # u5: never does A -> counted nowhere
            (5, "B", 1), (5, "C", 2),
            # u6: simultaneous A and B (strictly-after excludes ties)
            (6, "A", 10), (6, "B", 10),
        ]
        out = {
            r["step"]: r["n_users"]
            for r in funnel(_mk_events(spark, rows), ["A", "B", "C"]).collect()
        }
        # A: u1,u2,u3,u4,u6 (u5 never does A); B: u1,u4 (u2's B is
        # before its A, u6's is simultaneous); C: u1,u4
        assert out == {"A": 5, "B": 2, "C": 2}

    def test_window_expiry(self, spark):
        rows = [
            (1, "A", 0), (1, "B", 50),        # inside 100s window
            (2, "A", 0), (2, "B", 150),       # outside
        ]
        out = {
            r["step"]: r["n_users"]
            for r in funnel(
                _mk_events(spark, rows), ["A", "B"], within_seconds=100
            ).collect()
        }
        assert out == {"A": 2, "B": 1}

    def test_window_anchors_on_any_step0_event(self, spark):
        # the earliest-A-only trap: (A@0, A@60, B@70, W=50) converts
        # via the A@60 anchor even though the A@0 window closed at 50
        rows = [
            (1, "A", 0), (1, "A", 60), (1, "B", 70),
            # u2: only the early anchor exists -> no conversion
            (2, "A", 0), (2, "B", 70),
        ]
        out = {
            r["step"]: r["n_users"]
            for r in funnel(
                _mk_events(spark, rows), ["A", "B"], within_seconds=50
            ).collect()
        }
        assert out == {"A": 2, "B": 1}

    def test_window_chain_must_share_one_anchor(self, spark):
        # three steps: each consecutive hop fits SOME window but no
        # single anchor covers the whole chain -> stops at B
        rows = [(1, "A", 0), (1, "B", 40), (1, "C", 80)]
        out = {
            r["step"]: r["n_users"]
            for r in funnel(
                _mk_events(spark, rows), ["A", "B", "C"], within_seconds=50
            ).collect()
        }
        assert out == {"A": 1, "B": 1, "C": 0}

    def test_empty_steps_raises(self, spark):
        with pytest.raises(ValueError, match="at least one step"):
            funnel(_mk_events(spark, [(1, "A", 1)]), [])

    def test_single_shuffle_plan(self, spark):
        from polars_matmul_spark.plans.inspect import count_shuffles, uses_python_worker

        ev = load_table(spark, "events", SF_DIR)
        out = funnel(ev, ["view", "click", "purchase"])
        # one user-keyed exchange + the final single-row agg exchange;
        # crucially NOT O(steps) self-join shuffles
        assert count_shuffles(out) <= 2
        assert not uses_python_worker(out)

    def test_vs_duckdb(self, spark, duck):
        ev = load_table(spark, "events", SF_DIR)
        got = {
            r["step"]: r["n_users"]
            for r in funnel(ev, ["view", "click", "purchase"]).collect()
        }
        want_rows = duck.sql(
            """
WITH r0 AS (
  SELECT user_id, min(epoch(ts)) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
), r1 AS (
  SELECT e.user_id, min(epoch(e.ts)) AS t
  FROM events e JOIN r0 USING (user_id)
  WHERE e.event_type = 'click' AND epoch(e.ts) > r0.t GROUP BY 1
), r2 AS (
  SELECT e.user_id, min(epoch(e.ts)) AS t
  FROM events e JOIN r1 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch(e.ts) > r1.t GROUP BY 1
)
SELECT 'view' AS step, (SELECT count(*) FROM r0) AS n
UNION ALL SELECT 'click', (SELECT count(*) FROM r1)
UNION ALL SELECT 'purchase', (SELECT count(*) FROM r2)
"""
        ).fetchall()
        want = {s: int(n) for s, n in want_rows}
        assert got == want
        assert got["view"] > 0 and got["view"] >= got["click"] >= got["purchase"]

    def test_windowed_counts_vs_exists_oracle(self, spark, duck):
        # windowed form vs a DuckDB EXISTS replication (any anchor)
        ev = load_table(spark, "events", SF_DIR)
        got = {
            r["step"]: r["n_users"]
            for r in funnel(
                ev, ["view", "click"], within_seconds=86400
            ).collect()
        }
        want_rows = duck.sql(
            """
WITH r0 AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
), r1 AS (
  -- exists-form: ANY view anchor whose window admits a later click
  SELECT DISTINCT a.user_id
  FROM events a JOIN events b USING (user_id)
  WHERE a.event_type = 'view' AND b.event_type = 'click'
        AND epoch(b.ts) > epoch(a.ts)
        AND epoch(b.ts) <= epoch(a.ts) + 86400
)
SELECT 'view' AS step, (SELECT count(*) FROM r0) AS n
UNION ALL SELECT 'click', (SELECT count(*) FROM r1)
"""
        ).fetchall()
        want = {s: int(n) for s, n in want_rows}
        assert got == want


class TestRetention:
    def test_vs_duckdb(self, spark, duck):
        ev = load_table(spark, "events", SF_DIR)
        got = {
            (r["cohort_period"], r["period_offset"]): r["n_users"]
            for r in retention_cohorts(ev).collect()
        }
        want_rows = duck.sql(
            """
WITH up AS (
  SELECT user_id AS u, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS p
  FROM events
), first AS (
  SELECT u, min(p) AS cohort FROM up GROUP BY 1
)
SELECT cohort AS cohort_period, p - cohort AS period_offset,
       count(DISTINCT u) AS n_users
FROM up JOIN first USING (u)
GROUP BY 1, 2
"""
        ).fetchall()
        want = {(int(c), int(o)): int(n) for c, o, n in want_rows}
        assert got == want and len(got) > 0

    def test_offset_zero_is_cohort_size(self, spark):
        ev = load_table(spark, "events", SF_DIR)
        out = retention_cohorts(ev)
        zero = out.filter(F.col("period_offset") == 0)
        # every cohort has an offset-0 row and it is the max of its row
        per_cohort = (
            out.groupBy("cohort_period").agg(F.max("n_users").alias("mx"))
        )
        j = zero.join(per_cohort, "cohort_period").collect()
        assert len(j) > 0
        for r in j:
            assert r["n_users"] == r["mx"]

class TestPyTwin:
    def test_py_level_matches_spark_fold(self, spark):
        # pseudo-random event streams, both windowed and not: the pure-
        # Python twin (the streaming state update) must agree with the
        # Catalyst fold user-by-user
        import random

        from polars_matmul_spark.operators.funnel import (
            funnel_user_levels,
            py_funnel_level,
        )

        rng = random.Random(17)
        types = ["A", "B", "C", "noise"]
        rows = []
        for u in range(40):
            for _ in range(rng.randint(1, 15)):
                rows.append((u, rng.choice(types), float(rng.randint(0, 200))))
        df = _mk_events(spark, rows)
        per_user = {}
        for u, et, t in rows:
            per_user.setdefault(u, {k: [] for k in ("A", "B", "C")})
            if et in per_user[u]:
                per_user[u][et].append(t)
        for w in (None, 60.0):
            got = {
                r["user_id"]: r["funnel_level"]
                for r in funnel_user_levels(
                    df, ["A", "B", "C"], within_seconds=w
                ).collect()
            }
            for u, lists in per_user.items():
                want = py_funnel_level(
                    [sorted(lists[s]) for s in ("A", "B", "C")], w
                )
                assert got[u] == want, (u, w, lists, got[u], want)


class TestT0CandidateCap:
    def test_bot_user_bounded_and_matches_capped_oracle(self, spark):
        """Adversarial burst bot: 10k step-0 events packed into 10
        seconds. The windowed fold evaluates only the CAPPED candidate
        set (first 1024 DISTINCT timestamp values), so the per-user
        work is bounded and the result equals py_funnel_level on the
        same capped input."""
        import time

        from polars_matmul_spark.operators.funnel import (
            funnel_user_levels,
            py_funnel_level,
        )

        t0s = [i / 1000.0 for i in range(10_000)]  # 10k distinct values
        rows = [(1, "A", t) for t in t0s] + [(1, "B", 10.5), (1, "C", 11.0)]
        ev = _mk_events(spark, rows)
        start = time.monotonic()
        got = [
            (r["user_id"], r["funnel_level"])
            for r in funnel_user_levels(
                ev, ["A", "B", "C"], within_seconds=5
            ).collect()
        ]
        wall = time.monotonic() - start
        capped = sorted(set(t0s))[:1024]
        want = py_funnel_level([capped, [10.5], [11.0]], within_seconds=5)
        assert got == [(1, want)]
        assert wall < 60.0  # bounded fold, not 10k chains x 10k-scans

    def test_fractional_ts_same_second_not_collapsed(self, spark):
        """Two step-0 events inside the SAME epoch second where only
        the LATER one's deadline reaches step B: a per-second collapse
        (the pre-r6 bound) silently undercounted this to level 1; the
        distinct-value dedup keeps both candidates, so the capped
        default matches the exact (uncapped) fold."""
        from polars_matmul_spark.operators.funnel import funnel_user_levels

        rows = [(1, "A", 0.0), (1, "A", 0.9), (1, "B", 5.5)]
        ev = _mk_events(spark, rows)
        capped = funnel_user_levels(ev, ["A", "B"], within_seconds=5).collect()
        exact = funnel_user_levels(
            ev, ["A", "B"], within_seconds=5, max_t0_candidates=None
        ).collect()
        assert [tuple(r) for r in capped] == [(1, 2)]
        assert [tuple(r) for r in capped] == [tuple(r) for r in exact]

    def test_exact_duplicate_t0s_dedup_lossless(self, spark):
        # repeated identical step-0 timestamps collapse to one
        # candidate with no semantic change
        from polars_matmul_spark.operators.funnel import funnel_user_levels

        rows = [(1, "A", 2.5)] * 50 + [(1, "B", 7.0), (1, "C", 8.0)]
        ev = _mk_events(spark, rows)
        got = funnel_user_levels(ev, ["A", "B", "C"], within_seconds=6).collect()
        assert [tuple(r) for r in got] == [(1, 3)]

    def test_cap_noop_when_t0s_span_distinct_seconds(self, spark):
        # for human-scale users (every step-0 event in its own second,
        # fewer than the cap) the capped and exact folds agree
        from polars_matmul_spark.operators.funnel import funnel_user_levels

        rows = [
            (1, "A", 0), (1, "A", 3), (1, "B", 4), (1, "C", 5),
            (2, "A", 0), (2, "B", 100),
            (3, "B", 1), (3, "C", 2),
        ]
        ev = _mk_events(spark, rows)
        capped = funnel_user_levels(ev, ["A", "B", "C"], within_seconds=10)
        exact = funnel_user_levels(
            ev, ["A", "B", "C"], within_seconds=10, max_t0_candidates=None
        )
        assert sorted(map(tuple, capped.collect())) == sorted(
            map(tuple, exact.collect())
        )
