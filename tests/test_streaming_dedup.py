"""Streaming dedup (streaming/dedup.py): file-arrival micro-batches
through the fingerprint store must accept exactly the global-dedup
fingerprint set, and epoch replay must be a no-op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyanamo_spark import semantics
from pyanamo_spark.dedup.incremental import accepted_corpus
from pyanamo_spark.streaming.dedup import dedup_sink, streaming_dedup


def test_streaming_dedup_matches_global(spark, sf_dir, tmp_path):
    semantics.ensure_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text").limit(300)
    # stage arrivals: two files, the second repeating 50 docs of the
    # first under new ids (cross-batch dups)
    in_dir = str(tmp_path / "arrivals")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        in_dir + "/f0"
    )
    second = docs.filter(F.col("doc_id") % 2 == 1).unionByName(
        docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 6 == 0))
        .select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
    )
    second.coalesce(1).write.parquet(in_dir + "/f1")
    flat = str(tmp_path / "in")
    os.makedirs(flat)
    for i, src in enumerate(("f0", "f1")):
        for f in os.listdir(in_dir + "/" + src):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(in_dir, src, f),
                    os.path.join(flat, f"{i}_{f}"),
                )

    store = str(tmp_path / "store")
    q = streaming_dedup(
        spark, flat, "doc_id long, text string", store
    )
    assert q.awaitTermination(300), "stream drain timed out"

    got = {r.fingerprint for r in accepted_corpus(spark, store).collect()}
    want = {
        r.fp
        for r in docs.select(F.md5("text").alias("fp")).distinct().collect()
    }
    assert got == want
    # at least two epochs actually ran (maxFilesPerTrigger=1)
    batches = [d for d in os.listdir(store) if d.startswith("batch=")]
    assert len(batches) >= 2


def test_epoch_replay_is_noop(spark, sf_dir, tmp_path):
    semantics.ensure_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text").limit(50)
    store = str(tmp_path / "store")
    sink = dedup_sink(store)
    sink(docs, 3)
    before = accepted_corpus(spark, store).count()
    sink(docs, 3)  # replay of the same epoch
    assert accepted_corpus(spark, store).count() == before


def test_crashed_epoch_is_reaccepted_not_skipped(spark, sf_dir, tmp_path):
    """A partial batch directory WITHOUT the committer's _SUCCESS
    marker (crash mid-accept) must be cleared and re-accepted on
    replay — gating on bare isdir would silently drop the epoch."""
    semantics.ensure_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text").limit(50)
    store = str(tmp_path / "store")
    # simulate the crash: the epoch's directory exists but holds only
    # uncommitted scratch state
    partial = os.path.join(store, "batch=3", "_temporary")
    os.makedirs(partial)
    sink = dedup_sink(store)
    sink(docs, 3)  # replay after the crash
    assert os.path.isfile(os.path.join(store, "batch=3", "_SUCCESS"))
    assert accepted_corpus(spark, store).count() == docs.distinct().count()


def test_windowed_dedup_drops_close_duplicates(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark: planted duplicates (same user/
    type/ts, new event_id) are removed; drained survivors == the batch
    min-id keeper over the same directory."""
    from pyspark.sql import functions as F

    from pyanamo_spark.streaming.dedup import (
        batch_windowed_dedup,
        windowed_dedup_stream,
    )

    events_dir = str(tmp_path / "events_dd")
    base = spark.read.parquet(f"{sf_dir}/events.parquet")
    dupes = base.limit(50).withColumn(
        "event_id", F.col("event_id") + 1_000_000
    )
    base.unionByName(dupes).coalesce(1).write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema

    q = (
        windowed_dedup_stream(spark, events_dir, schema)
        .writeStream.format("memory")
        .queryName("dd_within")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    q.stop()

    got = {
        (r.user_id, r.event_type, r.ts)
        for r in spark.table("dd_within").collect()
    }
    want_keys = {
        (r.user_id, r.event_type, r.ts)
        for r in batch_windowed_dedup(spark, events_dir).collect()
    }
    n_base = base.count()
    # every key survives exactly once; planted duplicates are gone
    assert spark.table("dd_within").count() == n_base
    assert got == want_keys
