"""Incremental continuous aggregate ("hypertable rollup" pattern).

The reference's monitors recompute their summaries from scratch on
every poll (manager.py:209-244). The scale-correct form keeps a
persistent rollup table that each micro-batch UPDATES incrementally:

  events stream --window agg (update mode)--> foreachBatch MERGE
      --> rollup store (parquet, partitioned by window date)

Update-mode streaming emits only the windows a micro-batch touched, so
each MERGE rewrites just those groups — at 100 TB/day the rollup write
is proportional to the batch, not to history. The watermark bounds
which windows can still change, so closed partitions are immutable and
readable by dashboards without any stream-side coordination.

The MERGE itself is the q_merge_upsert plan shape (broadcast the
touched-window batch against the store's key column); with a
transactional table format the same callback becomes MERGE INTO. Here
the store is plain parquet, so the callback rewrites only the
partitions the batch touches (delete-matched + union semantics via
dynamic partition overwrite).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_rollup_stream(
    spark: SparkSession,
    events_path: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Update-mode windowed aggregate over the events directory — the
    deltas feeding the rollup store. Partial (map-side) aggregation
    still applies inside each micro-batch; the state store holds one
    row per open (window, event_type)."""
    from pyanamo_spark.streaming.monitor import normalize_event_time

    stream = normalize_event_time(
        spark.readStream.schema(schema).parquet(events_path)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
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


def merge_rollup_batch(batch: DataFrame, rollup_dir: str) -> None:
    """foreachBatch callback: upsert the touched windows into the
    rollup store.

    Update-mode batches carry the NEW TOTAL for every touched
    (window_start, event_type) — not an increment — so the merge is
    replace-matched + insert-unmatched. The store is partitioned by
    window date; dynamic partition overwrite rewrites only partitions
    present in the batch (a day's worth of windows), never history.
    """
    spark = batch.sparkSession
    if batch.isEmpty():
        return
    staged = batch.withColumn(
        "window_date", F.to_date("window_start")
    ).persist()
    try:
        if os.path.exists(rollup_dir):
            existing = spark.read.parquet(rollup_dir)
            touched_dates = [
                r.window_date
                for r in staged.select("window_date").distinct().collect()
            ]
            keep = (
                existing.filter(F.col("window_date").isin(touched_dates))
                .alias("e")
                .join(
                    F.broadcast(
                        staged.select("window_start", "event_type")
                    ).alias("b"),
                    ["window_start", "event_type"],
                    "left_anti",
                )
            )
            out = staged.unionByName(keep)
        else:
            out = staged
        (
            out.repartition("window_date")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_date")
            .parquet(rollup_dir)
        )
    finally:
        staged.unpersist()


def run_rollup(
    stream_df: DataFrame, rollup_dir: str, checkpoint_dir: str
):
    """Drive the continuous aggregate with AvailableNow (tests) — in
    production the same query runs with a processing-time trigger."""
    query = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(lambda b, _id: merge_rollup_batch(b, rollup_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return query
