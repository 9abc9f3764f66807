"""Continuous crawl ingest — the streaming twin of the batch
web-ingest chain (sources/warc.py → functions/html.py →
dedup/incremental.py).

WARC chunk objects land in a directory as a crawler uploads them;
each micro-batch parses its chunks (per-record gzip members), keeps
the 200s, extracts visible text from the HTML bodies, and accepts the
results against the incremental-dedup fingerprint store. The store's
``batch=<epoch>`` partitions double as the exactly-once ledger (same
recovery contract as streaming/dedup.py: a replayed epoch finds its
partition present and skips), so a crashed crawler-ingest resumes
without double-accepting.

100 TB framing: this is the continuous shape of Common Crawl intake —
state lives in partitioned parquet (not the stream state store), the
parse is bytes-local per task, and the only cross-task exchange is
the fingerprint anti-join inside ``accept_batch``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.dedup.incremental import (
    accept_batch,
    batch_committed,
    clear_partial_batch,
)
from pyanamo_spark.functions.html import html_to_text
from pyanamo_spark.sources.warc import warc_records

#: parquet schema of a staged chunk object
CHUNK_SCHEMA = "chunk_id long, payload binary"


def web_ingest_batch(chunks: DataFrame) -> DataFrame:
    """(chunk_id, payload) WARC chunks → (doc_id, text) documents:
    parse records, keep HTTP 200s, extract visible text."""
    recs = warc_records(chunks)
    return recs.filter(F.col("http_status") == 200).select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        html_to_text(F.decode("body", "utf-8")).alias("text"),
    )


def ingest_sink(store_dir: str):
    """foreachBatch callback: parse + extract + accept, idempotently
    per epoch."""

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        # exactly-once gate: the committer's _SUCCESS marker, not bare
        # isdir — a crash mid-accept leaves a partial directory that
        # must be cleared and re-accepted, not skipped
        if batch_committed(store_dir, epoch_id):
            return  # replayed epoch — already accepted
        clear_partial_batch(store_dir, epoch_id)
        accept_batch(
            batch.sparkSession, web_ingest_batch(batch), store_dir, epoch_id
        )

    return _sink


def streaming_web_ingest(
    spark: SparkSession,
    chunks_path: str,
    store_dir: str,
    max_files_per_trigger: int = 1,
):
    """Continuous WARC ingest over a chunk directory. Returns the
    started query; the accepted (fingerprint, doc_id) ledger
    accumulates under ``store_dir``."""
    stream = (
        spark.readStream.schema(CHUNK_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(chunks_path)
    )
    return (
        stream.writeStream.foreachBatch(ingest_sink(store_dir))
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(store_dir, "_checkpoint")
        )
        .start()
    )
