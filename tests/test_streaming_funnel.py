"""Streaming funnel == batch funnel when events arrive in event-time
order across micro-batched runs sharing one checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyanamo_spark.registry import QUERIES, load_all
from pyanamo_spark.streaming.funnel import funnel_stream

load_all()


def test_streaming_funnel_matches_batch(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_us = (
        F.col("ts")
        if dict(events.dtypes)["ts"] == "bigint"
        else F.unix_micros(F.col("ts").cast("timestamp"))
    )
    median_us = (
        events.select(ts_us.alias("us")).approxQuantile("us", [0.5], 0.0)[0]
    )
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    emitted = []  # (user_id, stage) in emission order across runs

    def drain():
        schema = spark.read.parquet(events_dir).schema

        def sink(batch, _id):
            emitted.extend(
                (r.user_id, r.stage_reached) for r in batch.collect()
            )

        q = (
            funnel_stream(spark, events_dir, schema)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    # chronological halves: arrival order == event-time order, so the
    # streaming fold must reproduce the batch result exactly
    events.filter(ts_us <= median_us).write.mode("append").parquet(events_dir)
    drain()
    events.filter(ts_us > median_us).write.mode("append").parquet(events_dir)
    drain()

    # latest emitted row per user (update mode re-emits on change)
    latest = {}
    for user_id, stage in emitted:
        latest[user_id] = stage
    got = {
        s: sum(1 for v in latest.values() if v >= s) for s in (1, 2, 3)
    }

    batch = {
        r.stage_no: r.n_users
        for r in QUERIES["q_funnel"](spark, sf_dir).collect()
    }
    assert got == batch
