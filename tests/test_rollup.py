"""Incremental continuous-aggregate tests (streaming/rollup.py): the
rollup store must equal the from-scratch batch aggregate after events
arrive incrementally across separately-triggered runs sharing one
checkpoint (exactly-once across restarts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyanamo_spark.streaming.rollup import (
    run_rollup,
    windowed_rollup_stream,
)

def test_rollup_matches_batch_after_incremental_arrival(
    spark, sf_dir, tmp_path
):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # approxQuantile supports no timestamp type; median the epoch
    # micros instead (works for both fixture vintages: TIMESTAMP(NANOS)
    # scanned as long and TIMESTAMP(MICROS) scanned as timestamp_ntz)
    ts_us = (
        F.col("ts")
        if dict(events.dtypes)["ts"] == "bigint"
        else F.unix_micros(F.col("ts").cast("timestamp"))
    )
    median_us = (
        events.select(ts_us.alias("us")).approxQuantile("us", [0.5], 0.0)[0]
    )
    events_dir = str(tmp_path / "events")
    rollup_dir = str(tmp_path / "rollup")
    ckpt_dir = str(tmp_path / "ckpt")

    # first half of the timeline arrives, first run drains it
    events.filter(ts_us <= median_us).write.mode("append").parquet(
        events_dir
    )
    # stream schema mirrors whatever the batch write produced, so the
    # test tracks the fixture vintage instead of hard-coding one
    events_schema = spark.read.parquet(events_dir).schema
    stream = windowed_rollup_stream(spark, events_dir, events_schema)
    assert stream.isStreaming
    run_rollup(stream, rollup_dir, ckpt_dir).stop()
    n_first = spark.read.parquet(rollup_dir).count()
    assert n_first > 0

    # second half arrives later; the shared checkpoint resumes state,
    # update-mode re-emits touched windows with their NEW totals
    events.filter(ts_us > median_us).write.mode("append").parquet(
        events_dir
    )
    stream = windowed_rollup_stream(spark, events_dir, events_schema)
    run_rollup(stream, rollup_dir, ckpt_dir).stop()

    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.read.parquet(rollup_dir).collect()
    }

    from pyanamo_spark.registry import QUERIES, load_all

    load_all()
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in QUERIES["q_event_window"](spark, sf_dir).collect()
    }
    assert got == batch


def test_rollup_store_is_date_partitioned(spark, sf_dir, tmp_path):
    """Partition layout is the contract that bounds rewrite scope: a
    micro-batch rewrites only window_date partitions it touches."""
    events_dir = str(tmp_path / "events")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(events_dir)
    rollup_dir = str(tmp_path / "rollup")
    events_schema = spark.read.parquet(events_dir).schema
    stream = windowed_rollup_stream(spark, events_dir, events_schema)
    run_rollup(stream, rollup_dir, str(tmp_path / "ckpt")).stop()

    import os

    parts = [d for d in os.listdir(rollup_dir) if d.startswith("window_date=")]
    assert parts, "rollup store must be partitioned by window_date"


def test_sliding_window_covers_each_event_four_times(spark, sf_dir):
    from pyanamo_spark.operators.windows import q_sliding_window

    rows = q_sliding_window(spark, sf_dir).collect()
    total = spark.table("events").count()
    assert sum(r["n_events"] for r in rows) == 4 * total
    # windows advance on the slide grid
    assert all(
        r["window_start"].minute % 15 == 0
        and r["window_start"].second == 0
        for r in rows
    )
