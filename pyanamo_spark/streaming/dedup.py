"""Streaming deduplication — the continuous form of
pyanamo_spark.dedup.incremental.

Documents arrive as files in a directory; each micro-batch dedups
within itself, anti-joins the fingerprint store, and appends its
survivors as its own ``batch=<epoch>`` partition. The store doubles as
the exactly-once ledger: a replayed epoch (restart after a crash
between write and commit) finds its partition's ``_SUCCESS`` marker
and skips, so reprocessing cannot double-accept; a partial partition
(crash mid-write, no marker) is cleared and re-accepted, so a replay
cannot drop records either.

This is the production layout for continuous ingest at 100 TB: the
native alternative, ``dropDuplicates`` on an unbounded stream, keeps
every fingerprint in executor state-store memory forever; parking the
ledger in partitioned parquet keeps stream state empty and makes the
accepted set a queryable table. (With event-time bounds on duplicate
arrival, ``dropDuplicatesWithinWatermark`` trims that state instead —
that variant needs no store but forgets old fingerprints.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyanamo_spark.dedup.incremental import (
    accept_batch,
    batch_committed,
    clear_partial_batch,
)
from pyanamo_spark.streaming.monitor import normalize_event_time


def dedup_sink(store_dir: str):
    """foreachBatch callback: accept each micro-batch against the
    fingerprint store, idempotently per epoch."""

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        # exactly-once gate: the committer's _SUCCESS marker, not bare
        # isdir — a crash mid-accept leaves a partial directory that
        # must be cleared and re-accepted, not skipped
        if batch_committed(store_dir, epoch_id):
            return  # replayed epoch — already accepted
        clear_partial_batch(store_dir, epoch_id)
        accept_batch(batch.sparkSession, batch, store_dir, epoch_id)

    return _sink


def streaming_dedup(
    spark: SparkSession,
    docs_path: str,
    schema: str,
    store_dir: str,
    max_files_per_trigger: int = 1,
):
    """Continuous dedup over a document directory. Returns the started
    query; the accepted corpus accumulates under ``store_dir`` (read it
    with pyanamo_spark.dedup.incremental.accepted_corpus)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_path)
    )
    return (
        stream.select("doc_id", "text")
        .writeStream.foreachBatch(dedup_sink(store_dir))
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(store_dir, "_checkpoint")
        )
        .start()
    )


def windowed_dedup_stream(
    spark: SparkSession,
    events_path: str,
    schema,
    watermark: str = "30 minutes",
) -> DataFrame:
    """In-stream exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes its event time — the native operator
    for "duplicates arrive close together" (at-least-once sources,
    retried producers), where the store-based ledger above would be
    overkill.

    The two dedup modes split cleanly by duplicate-arrival bound:
    unbounded duplicate lag → fingerprint store (state parked in
    parquet); bounded lag → this operator (state evicted by
    watermark, no store to manage). Emits first-seen rows per
    (user_id, event_type, ts) key in append mode."""
    ev = normalize_event_time(
        spark.readStream.schema(schema).parquet(events_path)
    )
    return (
        ev.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "ts"])
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


def batch_windowed_dedup(spark: SparkSession, events_dir: str) -> DataFrame:
    """Batch twin of ``windowed_dedup_stream``: one survivor per
    (user_id, event_type, ts) key — min event_id, the deterministic
    keeper. The stream keeps the first ARRIVAL (partition-order
    dependent within a micro-batch), so stream/batch agree on the
    SURVIVOR KEY SET and count; keeper identity is only pinned on the
    batch side."""
    ev = spark.read.parquet(events_dir)
    w_min = F.min("event_id").over(
        Window.partitionBy("user_id", "event_type", "ts")
    )
    return (
        ev.withColumn("_keep", w_min)
        .filter(F.col("event_id") == F.col("_keep"))
        .select("event_id", "user_id", "event_type", "ts", "value")
    )
