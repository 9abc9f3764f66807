"""Streaming transition-matrix parity: summed per-batch increments
must equal the batch lag-window counts, including across a
checkpointed restart where a user's pair spans the batch boundary."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pyanamo_spark.streaming.transitions import streaming_transitions


def _drain(spark, events_dir, checkpoint, name):
    stream = streaming_transitions(
        spark, events_dir, spark.read.parquet(events_dir).schema
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    q.stop()


def test_stream_counts_match_batch(spark, sf_dir, tmp_path):
    events_dir = str(tmp_path / "events")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch.write.parquet(events_dir)

    _drain(spark, events_dir, str(tmp_path / "ckpt"), "trans_stream")
    got = {
        (r.prev_type, r.next_type): r.total
        for r in spark.table("trans_stream")
        .groupBy("prev_type", "next_type")
        .agg(F.sum("n").alias("total"))
        .collect()
    }

    w = "PARTITION BY user_id ORDER BY ts, event_id"
    expected = {
        (r.prev_type, r.next_type): r.n
        for r in spark.sql(
            f"""
            SELECT prev_type, event_type AS next_type, COUNT(*) AS n
            FROM (SELECT event_type,
                         LAG(event_type) OVER ({w}) AS prev_type
                  FROM parquet.`{events_dir}`)
            WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
            """
        ).collect()
    }
    assert got == expected


def _drain_to_parquet(spark, events_dir, checkpoint, out_dir):
    """Checkpoint-recoverable drain: the memory sink refuses checkpoint
    recovery, so the restart test appends emissions to parquet via
    foreachBatch (the production shape for an increment store)."""
    stream = streaming_transitions(
        spark, events_dir, spark.read.parquet(events_dir).schema
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _epoch: df.write.mode("append").parquet(out_dir)
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    q.stop()


def test_boundary_pair_counted_once_across_restart(spark, tmp_path):
    """Feed a→b in drain 1, then c in drain 2 against the SAME
    checkpoint: the b→c pair spans the restart and must be counted
    exactly once via the persisted last-state."""
    events_dir = tmp_path / "events"
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "increments")
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    )

    spark.createDataFrame(
        [(1, t0, 7, "a", 0.0), (2, t0 + dt.timedelta(minutes=1), 7, "b", 0.0)],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(events_dir))
    _drain_to_parquet(spark, str(events_dir), ckpt, out_dir)

    spark.createDataFrame(
        [(3, t0 + dt.timedelta(minutes=2), 7, "c", 0.0)], schema
    ).coalesce(1).write.mode("append").parquet(str(events_dir))
    # same checkpoint: the file-source ledger skips batch-1 files
    _drain_to_parquet(spark, str(events_dir), ckpt, out_dir)

    totals: dict = {}
    for r in spark.read.parquet(out_dir).collect():
        k = (r.prev_type, r.next_type)
        totals[k] = totals.get(k, 0) + r.n
    assert totals == {("a", "b"): 1, ("b", "c"): 1}
