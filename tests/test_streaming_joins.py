"""Stream-stream interval join: the drained streaming join, aggregated,
must equal the oracle-checked batch twin — across a single drain AND an
incremental two-batch arrival resuming the same checkpoint."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from pyanamo_spark.streaming.joins import error_context_stream


def _batch_expected(spark, sf_dir):
    from pyanamo_spark.registry import QUERIES

    return {
        r.err_id: (r.n_context, r.n_action_types)
        for r in QUERIES["q_error_context"](spark, sf_dir).collect()
    }


def _pairs_to_result(pairs):
    """(err_id, action) pairs → {err_id: (n_context, n_action_types)}"""
    n = Counter(e for e, _ in pairs)
    kinds: dict = {}
    for e, a in pairs:
        kinds.setdefault(e, set()).add(a)
    return {e: (n[e], len(kinds[e])) for e in n}


def _drain(spark, events_dir, schema, ckpt, collected):
    def sink(batch, _id):
        collected.extend(
            (r.err_id, r.action) for r in batch.collect()
        )

    q = (
        error_context_stream(spark, events_dir, schema)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    q.stop()


def test_interval_join_matches_batch(spark, sf_dir, tmp_path):
    events_dir = str(tmp_path / "events")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema
    pairs: list = []
    _drain(spark, events_dir, schema, str(tmp_path / "ck"), pairs)
    assert _pairs_to_result(pairs) == _batch_expected(spark, sf_dir)


def test_interval_join_incremental_two_batches(spark, sf_dir, tmp_path):
    """Events arriving in two chronological files across two drains of
    the SAME checkpoint produce exactly the single-drain pairs:
    boundary-spanning pairs (batch-2 error ↔ batch-1 action) come from
    the join state, and nothing duplicates. Works because an action is
    only evictable once the error-side watermark passes
    act_ts + lookback — batch 1's watermark (30 min behind its max)
    never reaches the actions batch 2's errors still need."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cut = ev.approxQuantile("event_id", [0.5], 0.001)[0]
    events_dir = str(tmp_path / "events_inc")
    ck = str(tmp_path / "ck_inc")
    pairs: list = []
    # fixture event ids are assigned in time order, so an id split is a
    # chronological split
    ev.filter(F.col("event_id") <= cut).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema
    _drain(spark, events_dir, schema, ck, pairs)
    n_first = len(pairs)
    ev.filter(F.col("event_id") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)
    _drain(spark, events_dir, schema, ck, pairs)
    assert n_first > 0 and len(pairs) > n_first
    assert _pairs_to_result(pairs) == _batch_expected(spark, sf_dir)
