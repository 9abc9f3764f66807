"""Structured Streaming monitors (SURVEY.md §2.9 T1).

The reference's monitors poll-and-reaggregate in a sleep loop
(monitor_task at manager.py:209-244, monitor_nestedTasks at
manager.py:915-939). The streaming-native form is one continuous
aggregation the engine keeps up to date:

  - ``state_count_stream``: complete-mode counts per state — the
    monitor_task analogue (the batch form is q_state_counts).
  - ``windowed_event_stream``: watermarked tumbling-window counts over
    an event-time column — the q_event_window analogue with late-data
    handling, which the polling reference cannot express at all.

Tests drive both with ``Trigger.AvailableNow`` over the parquet
fixtures into memory sinks, so the streaming plans are exercised
without wall-clock waits. DuckDB cannot check streams, so these carry
no declared oracle; their batch-equivalent shapes are the
hash-checked q_state_counts / q_event_window (SURVEY §7.4.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def normalize_event_time(stream: DataFrame, col: str = "ts") -> DataFrame:
    """Make ``col`` a watermark-able TIMESTAMP for either fixture
    vintage: TIMESTAMP(NANOS) scans as long under nanosAsLong (divide
    to micros), TIMESTAMP(MICROS) scans as timestamp_ntz (watermarks
    reject NTZ; session tz is UTC so the cast is a pure type change).
    Callers must derive their stream schema from the actual data (see
    tests) so a bigint here always means the nanos vintage."""
    ts_type = dict(stream.dtypes).get(col)
    if ts_type == "bigint":
        return stream.withColumn(
            col, F.expr(f"timestamp_micros({col} div 1000)")
        )
    if ts_type == "timestamp_ntz":
        return stream.withColumn(col, F.col(col).cast("timestamp"))
    return stream


def state_count_stream(
    spark: SparkSession, tasks_path: str, schema: str
) -> DataFrame:
    """Continuous per-state item counts (monitor_task analogue).

    ``tasks_path`` is a directory of task-table parquet; new files are
    incrementally aggregated — the reference's poll loop with the poll
    removed.
    """
    stream = spark.readStream.schema(schema).parquet(tasks_path)
    return stream.groupBy("ItemState").agg(F.count("*").alias("n_items"))


def windowed_event_stream(
    spark: SparkSession,
    events_path: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked windowed event counts: late rows beyond the
    watermark are dropped, state for closed windows is evicted — the
    property that bounds memory at 100 TB/day event volumes. Pass
    ``slide`` for overlapping windows (the q_sliding_window streaming
    twin; each event lands in window/slide windows, state per open
    window is still bounded by the watermark)."""
    stream = normalize_event_time(
        spark.readStream.schema(schema).parquet(events_path)
    )
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_event_stream(
    spark: SparkSession,
    events_path: str,
    schema: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization: ``session_window`` merges each user's
    events whose gaps stay under ``gap`` — the continuous twin of the
    batch gaps-and-islands q_sessionize, with state for a session held
    only until the watermark passes its close (bounded memory under
    unbounded users, which the lag-window batch form cannot offer).

    Boundary note: session_window merges two events iff their distance
    is strictly UNDER the gap, while the batch lag form keeps events
    exactly ``gap`` apart together; fixture timestamps are not
    minute-aligned so the two agree there (asserted by the test).
    """
    stream = normalize_event_time(
        spark.readStream.schema(schema).parquet(events_path)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", gap).alias("win"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
):
    """Drain everything currently available into an in-memory table and
    stop — the deterministic test/monitor-snapshot harness."""
    query = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return query
