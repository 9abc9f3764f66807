"""Custom stateful operator + foreachBatch sink-router integration
tests — the two streaming paths beyond plain aggregations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyanamo_spark.streaming.stateful import running_user_totals


@pytest.fixture(autouse=True)
def _no_nodata(no_nodata_batches):
    """This module drains timeout-bearing stateful operators — see
    conftest.no_nodata_batches for the Spark 4.1.2 defect it works
    around."""
    yield



def test_stateful_running_totals_match_batch(spark, sf_dir, tmp_path):
    events_dir = str(tmp_path / "events")
    batch_events = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch_events.write.parquet(events_dir)

    # schema mirrors the staged parquet so the fixture's timestamp
    # vintage round-trips instead of being force-read as bigint
    stream_df = running_user_totals(
        spark, events_dir, spark.read.parquet(events_dir).schema
    )
    assert stream_df.isStreaming
    query = (
        stream_df.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert query.awaitTermination(300), "stream drain timed out"
    try:
        got = {
            r.user_id: (r.n_events, round(r.total_value, 4), r.last_event_id)
            for r in spark.table("user_totals").collect()
        }
    finally:
        query.stop()

    expected = {
        r.user_id: (r.n, round(r.total, 4), r.last)
        for r in batch_events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.max("event_id").alias("last"),
        )
        .collect()
    }
    assert got == expected


def test_foreachbatch_sink_router_integration(spark, tmp_path):
    """Drive route_and_write as a real foreachBatch sink over a
    file stream — the streaming form of the S12 log router."""
    from pyanamo_spark.executor.sink_router import route_and_write

    logs_dir = tmp_path / "logs_in"
    out_dir = tmp_path / "routed"
    df = spark.createDataFrame(
        [("i1", "short"), ("i2", "PyAnamo:\tkeep\n" + "x" * 5000)],
        "itemID string, stdout string",
    )
    df.write.parquet(str(logs_dir))

    stream = spark.readStream.schema("itemID string, stdout string").parquet(
        str(logs_dir)
    )
    batches = []
    query = (
        stream.writeStream.foreachBatch(
            lambda b, bid: batches.append(
                route_and_write(b, str(out_dir), batch_id=bid)
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    assert query.awaitTermination(300), "stream drain timed out"
    query.stop()

    assert batches, "foreachBatch must have fired"
    paths = batches[0]
    inline = spark.read.parquet(paths["inline"])
    assert [r.itemID for r in inline.collect()] == ["i1"]
    cw = spark.read.parquet(paths["cloudwatch"])
    row = cw.collect()[0]
    assert row.itemID == "i2" and row.salvaged == "keep"


def test_v2_transform_with_state_matches_v1_and_batch(
    spark, sf_dir, tmp_path
):
    """The transformWithStateInPandas (arbitrary-state v2) operator
    produces the same per-user totals as the v1 applyInPandasWithState
    operator and the batch aggregate — across an incremental two-file
    arrival where cross-batch state must carry.

    The v2 Python runner ships state over a protobuf channel. No real
    google.protobuf wheel exists in this container; the session
    factory activates the vendored pure-Python wire shim
    (vendor/google/protobuf), so this test executes the full
    worker↔JVM state protocol — the JVM parses the shim's bytes with
    real protobuf and the shim parses the JVM's responses."""
    import pytest

    pytest.importorskip("google.protobuf")  # shim activated by get_spark
    from pyanamo_spark.streaming.stateful import running_user_totals_v2

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events_dir = str(tmp_path / "events_v2")
    ck = str(tmp_path / "ck_v2")
    half = events.approxQuantile("event_id", [0.5], 0.001)[0]
    events.filter(F.col("event_id") <= half).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema

    latest: dict = {}

    def drain():
        def sink(batch, _id):
            for r in batch.collect():
                latest[r.user_id] = (
                    r.n_events,
                    round(r.total_value, 4),
                    r.last_event_id,
                )

        q = (
            running_user_totals_v2(spark, events_dir, schema)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream drain timed out"
        q.stop()

    drain()
    events.filter(F.col("event_id") > half).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)
    drain()

    expected = {
        r.user_id: (r.n, round(r.total, 4), r.last)
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.max("event_id").alias("last"),
        )
        .collect()
    }
    assert latest == expected


def test_v2_plan_builds_without_protobuf(spark, sf_dir, tmp_path):
    """Plan construction (analysis) for the v2 operator needs no
    optional dependency — only execution does. Guards against the
    operator regressing into an import-time protobuf requirement."""
    from pyanamo_spark.streaming.stateful import running_user_totals_v2

    events_dir = str(tmp_path / "events_v2_plan")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(
        events_dir
    )
    df = running_user_totals_v2(
        spark, events_dir, spark.read.parquet(events_dir).schema
    )
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "n_events",
        "total_value",
        "last_event_id",
    ]
