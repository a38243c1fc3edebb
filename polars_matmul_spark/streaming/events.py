"""Structured Streaming operators over the events table.

The reference has no streaming surface (SURVEY §2.3); this is the
extension layer a live ingest pipeline needs. Batch twins of these
aggregations live in the query registry (``event_hourly_windows``,
``sessionize_events``) and the tests assert stream == batch on the same
input — the exactly-once replay property Structured Streaming
guarantees with file sources.

Scale notes: watermarks bound state; the hourly window agg keeps
O(active windows x event types) rows of state per partition; the
stateful per-user operator partitions by user_id (state lives with the
partition, no driver involvement).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# schema-peek cache: one footer read per (sf_dir) per session — the
# peek costs a Spark job (file listing + footer), and every stream
# START repeats it otherwise (5+ stream builders x restarts added
# whole seconds to the round-3 streaming bench). The testdata tables
# are immutable within a session, so caching is safe; streaming-ingest
# paths with evolving directories use their own readers.
_EVENTS_SCHEMA_CACHE: dict[str, object] = {}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same defensive confs as sources.tables.load_table — the stream
    # must read whichever ts encoding the data ships (see normalize_ts)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from ..sources.tables import normalize_ts

    # Streams require an explicit schema; peek it from the parquet footer
    # via a batch read so the declared type matches the actual encoding
    # (hard-coding LongType against timestamp[us] data silently yields
    # micros-as-nanos, timestamps 1000x too small). Footer-only: no data
    # scan happens here.
    schema = _EVENTS_SCHEMA_CACHE.get(sf_dir)
    if schema is None:
        schema = (
            spark.read.option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .schema
        )
        _EVENTS_SCHEMA_CACHE[sf_dir] = schema
    # the file source wants a directory; glob-filter down to the one table
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_ts(raw)


def hourly_event_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type with a 2-hour watermark
    (late events beyond the watermark are dropped deterministically)."""
    events = read_events_stream(spark, sf_dir)
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows_stream(spark: SparkSession, sf_dir: str, gap: str = "30 minutes") -> DataFrame:
    """Built-in session windows: sessions close after ``gap`` of
    inactivity per user (the streaming twin of the batch lag+cumsum
    sessionization)."""
    events = read_events_stream(spark, sf_dir)
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("session_window.start").alias("session_start"),
            "n_events",
        )
    )


def sessionize_stream(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful sessionizer via applyInPandasWithState with an
    EVENT-TIME timeout: per user, events are merged into the open
    session; a gap > ``gap_minutes`` closes it (emitted immediately);
    the still-open session is kept in state with a timeout at
    last_ts + gap so the watermark eventually flushes it.

    Output: (user_id, session_start, n_events, duration_sec) for every
    CLOSED session. With a finite availableNow replay the final session
    of each user stays open in state (no later watermark to flush it) —
    the test accounts for exactly that set.

    State is one small tuple per active user, partitioned with the key:
    the 100 TB shape (no driver involvement, state store scales with
    executors).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    events = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    gap = gap_minutes * 60
    out_cols = ["user_id", "session_start", "n_events", "duration_sec"]
    out_schema = "user_id long, session_start long, n_events bigint, duration_sec long"
    state_schema = "start long, last long, n bigint"

    def fn(key, pdfs, state: GroupState):
        rows = []
        ts_sec: list[int] = []
        for pdf in pdfs:
            ts_sec.extend(
                (pdf["ts"].astype("datetime64[ns]").astype("int64") // 10**9).tolist()
            )
        ts_sec.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        for t in ts_sec:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap:
                rows.append((key[0], start, n, last - start))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if state.hasTimedOut:
            if start is not None:
                rows.append((key[0], start, n, last - start))
            state.remove()
        else:
            state.update((start, last, n))
            state.setTimeoutTimestamp((last + gap) * 1000)  # event-time ms
        yield pd.DataFrame(rows, columns=out_cols)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user totals that survive across micro-batches.

    State schema: (n bigint, total double). Emits one row per user per
    micro-batch with the updated running totals.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    events = read_events_stream(spark, sf_dir)

    out_schema = "user_id long, n bigint, total double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def click_purchase_attribution_stream(
    spark: SparkSession, sf_dir: str, within: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: every purchase attributed to the
    same user's clicks within the preceding ``within``. Watermarks on
    both sides let Spark bound the join state (clicks older than the
    horizon are evicted); the time-range predicate keeps it an interval
    join rather than an ever-growing cross join."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    return clicks.join(
        purchases,
        F.expr(
            f"c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + interval {within}"
        ),
    ).select(
        F.col("c_user").alias("user_id"), "click_id", "purchase_id", "value"
    )


def dedup_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: first event per (user_id, event_type)
    key within the watermark horizon — the streaming twin of batch
    ``dropDuplicates``. Uses ``dropDuplicatesWithinWatermark``: plain
    ``dropDuplicates`` without the event-time column in its subset
    NEVER evicts state (the watermark is a no-op for it), so a
    long-running ingest would accumulate one state entry per key
    forever. WithinWatermark bounds state to keys seen inside the
    horizon. At scale state lives with the key's partition."""
    events = read_events_stream(spark, sf_dir)
    return events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def stream_to_parquet(df: DataFrame, path: str, checkpoint: str):
    """File-sink path: land the stream in a parquet directory via
    foreachBatch, one OVERWRITTEN subdirectory per epoch — genuinely
    idempotent: replaying a half-committed epoch after a crash
    overwrites its own output instead of appending duplicates. Readers
    load the root path (epoch shows up as a partition column)."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/epoch={epoch_id}")

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming frame to completion synchronously against the
    memory sink (availableNow) and return the query handle."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def funnel_level_stream(
    spark: SparkSession,
    sf_dir: str,
    steps: list[str],
    within_seconds: float | None = None,
) -> DataFrame:
    """Incremental per-user funnel via applyInPandasWithState: state =
    the user's per-step sorted timestamp lists (bounded by that user's
    activity, partitioned with the key — the scalable state shape);
    each micro-batch appends its events and re-evaluates the EXACT
    batch fold (operators/funnel.py::py_funnel_level, the same
    semantics the batch operator compiles to Catalyst), emitting
    (user_id, funnel_level) in UPDATE mode.

    Late events are handled by construction: the state keeps the full
    per-step lists, so an out-of-order arrival can still raise the
    level on its batch (unlike reach-time-only state, which cannot
    revise a greedy chain). stream == batch is pinned in
    tests/test_streaming.py.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from polars_matmul_spark.operators.funnel import py_funnel_level

    events = read_events_stream(spark, sf_dir)
    n = len(steps)
    if n == 0:
        raise ValueError("funnel needs at least one step")
    idx = {s: i for i, s in enumerate(steps)}
    out_schema = "user_id long, funnel_level int"
    state_schema = ", ".join(f"ts_{i} array<double>" for i in range(n))

    def update(key, pdfs, state: GroupState):
        stored = state.get if state.exists else tuple([] for _ in range(n))
        lists = [list(x) if x is not None else [] for x in stored]
        for pdf in pdfs:
            sub = pdf[pdf["event_type"].isin(idx)]
            if len(sub) == 0:
                continue
            ts = (
                sub["ts"].astype("datetime64[ns]").astype("int64") // 1000
            ) / 1e6  # epoch seconds (microsecond-exact, matches
            # the batch operator's cast("double"))
            for et, t in zip(sub["event_type"], ts):
                lists[idx[et]].append(float(t))
        for lst in lists:
            lst.sort()
        state.update(tuple(lists))
        lvl = py_funnel_level(lists, within_seconds)
        yield pd.DataFrame({"user_id": [key[0]], "funnel_level": [lvl]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
