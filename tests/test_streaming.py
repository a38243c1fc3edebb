"""Structured Streaming operators vs their batch twins.

With a file source + availableNow trigger the stream is a deterministic
replay of the parquet input, so every streaming aggregation must equal
the equivalent batch query on the same data (exactly-once semantics).
"""

import math
import os

import pytest

from polars_matmul_spark import queries_core as qc
from polars_matmul_spark.queries_core import CORE_QUERIES
from polars_matmul_spark.streaming.events import (
    hourly_event_counts_stream,
    run_stream_to_memory,
    session_windows_stream,
    stateful_user_totals,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_hourly_counts_stream_equals_batch(spark):
    stream_df = hourly_event_counts_stream(spark, SF_DIR)
    run_stream_to_memory(stream_df, "hourly_mem", output_mode="complete")
    got = spark.sql("SELECT * FROM hourly_mem").toPandas()

    batch_fn = qc._event_hourly  # rotated out of the registry in round 6
    want = batch_fn(spark, SF_DIR).toPandas()

    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    assert got[key + ["n"]].equals(want[key + ["n"]])
    for g, w in zip(got["total_value"], want["total_value"]):
        assert math.isclose(g, w, rel_tol=1e-9)


def test_session_windows_stream_matches_batch_sessionization(spark):
    stream_df = session_windows_stream(spark, SF_DIR, gap="30 minutes")
    run_stream_to_memory(stream_df, "sessions_mem", output_mode="complete")
    got = spark.sql("SELECT * FROM sessions_mem").toPandas()

    # sessionize_events rotated out of the registry in round 7; the
    # batch twin stays the stream==batch oracle via its query function
    from polars_matmul_spark.queries_core import _sessionize

    want = _sessionize(spark, SF_DIR).toPandas()

    # same session structure: per user, the multiset of session sizes
    assert len(got) == len(want)
    g = sorted(map(tuple, got[["user_id", "n_events"]].values.tolist()))
    w = sorted(map(tuple, want[["user_id", "n_events"]].values.tolist()))
    assert g == w


def test_streaming_dedup_matches_batch_distinct(spark):
    from polars_matmul_spark.sources.tables import load_table
    from polars_matmul_spark.streaming.events import dedup_events_stream

    stream_df = dedup_events_stream(spark, SF_DIR)
    run_stream_to_memory(stream_df, "dedup_mem", output_mode="append")
    got = spark.sql("SELECT user_id, event_type FROM dedup_mem").toPandas()

    want = (
        load_table(spark, "events", SF_DIR)
        .select("user_id", "event_type")
        .distinct()
        .toPandas()
    )
    assert len(got) == len(want)
    assert sorted(map(tuple, got.values.tolist())) == sorted(
        map(tuple, want.values.tolist())
    )


def test_stream_to_parquet_sink_roundtrip(spark):
    import tempfile

    from pyspark.sql import functions as F

    from polars_matmul_spark.streaming.events import (
        hourly_event_counts_stream,
        stream_to_parquet,
    )

    with tempfile.TemporaryDirectory() as tmp:
        # append-mode file sink requires finalized (watermark-closed)
        # windows; with availableNow over a finite file the watermark
        # advances to max(ts) - 2h, so only older windows land — verify
        # the landed subset matches batch exactly
        stream_df = hourly_event_counts_stream(spark, SF_DIR)
        stream_to_parquet(stream_df, f"{tmp}/out", f"{tmp}/ckpt")
        landed = spark.read.parquet(f"{tmp}/out").toPandas()
        assert len(landed) > 0

        batch_fn = qc._event_hourly  # rotated out of the registry in round 6
        want = batch_fn(spark, SF_DIR).toPandas()
        merged = landed.merge(
            want, on=["window_start", "event_type"], suffixes=("", "_b")
        )
        assert len(merged) == len(landed)  # every landed window exists in batch
        assert (merged["n"] == merged["n_b"]).all()


def test_custom_stateful_sessionizer_closed_sessions(spark):
    # emitted = every session closed by a later event, PLUS each user's
    # final session IF the terminal watermark (max_ts - 2h) passed its
    # event-time timeout (last_ts + gap): availableNow runs a final
    # no-data batch that fires timed-out state before terminating
    from polars_matmul_spark.sources.tables import load_table
    from polars_matmul_spark.streaming.events import sessionize_stream

    stream_df = sessionize_stream(spark, SF_DIR, gap_minutes=30)
    run_stream_to_memory(stream_df, "sess_state_mem", output_mode="append")
    got = spark.sql(
        "SELECT user_id, n_events, duration_sec FROM sess_state_mem"
    ).toPandas()

    ev = (
        load_table(spark, "events", SF_DIR)
        .selectExpr("user_id", "unix_timestamp(ts) AS tse", "event_id")
        .toPandas()
        .sort_values(["user_id", "tse", "event_id"])
    )
    horizon = ev["tse"].max() - 7200
    want = []
    for user, grp in ev.groupby("user_id"):
        ts = grp["tse"].tolist()
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > 1800:
                want.append((user, n, last - start))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if last + 1800 < horizon:  # final session flushed by timeout
            want.append((user, n, last - start))

    assert len(got) == len(want)
    got_set = sorted(
        map(tuple, got[["user_id", "n_events", "duration_sec"]].values.tolist())
    )
    assert got_set == sorted(want)


def test_stream_stream_interval_join_matches_batch(spark):
    from pyspark.sql import functions as F

    from polars_matmul_spark.sources.tables import load_table
    from polars_matmul_spark.streaming.events import click_purchase_attribution_stream

    stream_df = click_purchase_attribution_stream(spark, SF_DIR, within="1 hour")
    run_stream_to_memory(stream_df, "attr_mem", output_mode="append")
    got = spark.sql("SELECT user_id, click_id, purchase_id FROM attr_mem").toPandas()

    ev = load_table(spark, "events", SF_DIR)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = clicks.join(
        purchases,
        F.expr("c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + interval 1 hour"),
    ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id").toPandas()

    assert len(got) == len(want) and len(want) > 0
    key = ["user_id", "click_id", "purchase_id"]
    assert sorted(map(tuple, got[key].values.tolist())) == sorted(
        map(tuple, want[key].values.tolist())
    )


def test_stateful_user_totals_matches_batch(spark):
    from pyspark.sql import functions as F

    stream_df = stateful_user_totals(spark, SF_DIR)
    run_stream_to_memory(stream_df, "totals_mem", output_mode="update")
    got = spark.sql(
        # update mode emits one row per user per micro-batch; the final
        # state is the row with the largest running count
        """SELECT user_id, n, total FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n DESC) rn
             FROM totals_mem) WHERE rn = 1"""
    ).toPandas()

    from polars_matmul_spark.sources.tables import load_table

    want = (
        load_table(spark, "events", SF_DIR)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .toPandas()
    )
    key = "user_id"
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    for g, w in zip(got["total"], want["total"]):
        assert math.isclose(g, w, rel_tol=1e-6)


def test_funnel_stream_matches_batch(spark):
    """The stateful streaming funnel's final per-user levels equal the
    batch operator's, windowed and not."""
    from polars_matmul_spark.operators.funnel import funnel_user_levels
    from polars_matmul_spark.sources.tables import load_table
    from polars_matmul_spark.streaming.events import funnel_level_stream

    steps = ["view", "click", "purchase"]
    for w, name in ((None, "funnel_mem"), (86400.0, "funnel_mem_w")):
        stream_df = funnel_level_stream(spark, SF_DIR, steps, within_seconds=w)
        run_stream_to_memory(stream_df, name, output_mode="update")
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        # availableNow over the single events file = one batch -> one
        # update row per user
        got = {r["user_id"]: r["funnel_level"] for r in rows}
        assert len(got) == len(rows), "duplicate user rows in one batch"
        ev = load_table(spark, "events", SF_DIR)
        want = {
            r["user_id"]: r["funnel_level"]
            for r in funnel_user_levels(ev, steps, within_seconds=w).collect()
        }
        assert got == want and len(got) > 0
