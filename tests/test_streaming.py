"""Structured Streaming monitor tests (SURVEY.md §2.9 T1): drive the
streaming plans with AvailableNow over the parquet fixtures into memory
sinks and cross-check against the batch-equivalent aggregations."""

from __future__ import annotations

from pyanamo_spark.streaming.monitor import (
    run_available_now,
    session_event_stream,
    state_count_stream,
    windowed_event_stream,
)

def events_schema(spark, events_dir):
    """Stream schema mirrors the staged parquet, so the tests track the
    fixture's timestamp vintage instead of hard-coding one (a forced
    bigint read of TIMESTAMP(MICROS) data would yield raw micros that
    the nanos conversion then mangles)."""
    return spark.read.parquet(events_dir).schema


def test_windowed_event_stream_matches_batch(spark, sf_dir, tmp_path):
    # the file stream source monitors a directory; the fixture is a
    # single parquet file, so stage it into one
    events_dir = str(tmp_path / "events")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(events_dir)
    stream_df = windowed_event_stream(
        spark, events_dir, events_schema(spark, events_dir)
    )
    assert stream_df.isStreaming
    query = run_available_now(stream_df, "win_counts")
    try:
        got = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in spark.table("win_counts").collect()
        }
    finally:
        query.stop()

    from pyanamo_spark.registry import QUERIES, load_all

    load_all()
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in QUERIES["q_event_window"](spark, sf_dir).collect()
    }
    assert got == batch


def test_session_stream_matches_batch_sessionize(spark, sf_dir, tmp_path):
    """The streaming session_window must carve the same sessions as the
    batch gaps-and-islands q_sessionize: compare the multiset of
    (user_id, n_events, session_value) across all sessions. Complete
    output mode emits every session (no watermark holdback), making the
    comparison exact."""
    events_dir = str(tmp_path / "events")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(events_dir)
    stream_df = session_event_stream(
        spark, events_dir, events_schema(spark, events_dir)
    )
    assert stream_df.isStreaming
    query = run_available_now(stream_df, "sessions", output_mode="complete")
    try:
        got = sorted(
            (r.user_id, r.n_events, r.session_value)
            for r in spark.table("sessions").collect()
        )
    finally:
        query.stop()

    from pyanamo_spark.registry import QUERIES, load_all

    load_all()
    batch = sorted(
        (r.user_id, r.n_events, r.session_value)
        for r in QUERIES["q_sessionize"](spark, sf_dir).collect()
    )
    assert got == batch


def test_state_count_stream_counts_fixture_rows(spark, sf_dir, tmp_path):
    # materialize the tasks view as parquet — the streaming monitor
    # watches a tasks-table directory in production
    from pyanamo_spark import semantics

    semantics.ensure_views(spark, sf_dir)
    tasks_dir = str(tmp_path / "tasks")
    spark.table("tasks").write.mode("overwrite").parquet(tasks_dir)

    stream_df = state_count_stream(spark, tasks_dir, spark.table("tasks").schema)
    assert stream_df.isStreaming
    query = run_available_now(stream_df, "state_counts")
    try:
        got = {
            r.ItemState: r.n_items
            for r in spark.table("state_counts").collect()
        }
    finally:
        query.stop()
    batch = {
        r.ItemState: r.cnt
        for r in spark.table("tasks")
        .groupBy("ItemState")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert got == batch
    assert set(got) == {"todo", "locked", "done", "Wall_Time_Exceeded"}


def test_sliding_window_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming sliding windows (1h/15min) over the staged events ==
    the batch q_sliding_window aggregation, summed across event
    types."""
    events_dir = str(tmp_path / "events_sw")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(events_dir)
    stream_df = windowed_event_stream(
        spark,
        events_dir,
        events_schema(spark, events_dir),
        slide="15 minutes",
    )
    assert stream_df.isStreaming
    query = run_available_now(stream_df, "sw_counts")
    try:
        got = {}
        for r in spark.table("sw_counts").collect():
            n, v = got.get(r.window_start, (0, 0.0))
            got[r.window_start] = (n + r.n_events, round(v + r.total_value, 2))
    finally:
        query.stop()

    from pyanamo_spark.registry import QUERIES, load_all

    load_all()
    batch = {
        r.window_start: (r.n_events, r.total_value)
        for r in QUERIES["q_sliding_window"](spark, sf_dir).collect()
    }
    assert got == batch
