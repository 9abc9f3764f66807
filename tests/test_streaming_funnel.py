"""Streaming funnel == batch funnel when events arrive in event-time
order across micro-batched runs sharing one checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyanamo_spark.registry import QUERIES, load_all
from pyanamo_spark.streaming.funnel import funnel_stream
import pytest


@pytest.fixture(autouse=True)
def _no_nodata(no_nodata_batches):
    """funnel_stream is a timeout-bearing stateful operator — see
    conftest.no_nodata_batches for the Spark 4.1.2 defect it works
    around."""
    yield

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
        assert q.awaitTermination(300), "stream drain timed out"
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


def test_timeout_emits_terminal_row_before_eviction():
    """State eviction on idle timeout must emit the user's final funnel
    row (the episode's terminal record) — silent removal would let a
    later event restart the user at stage 0 and regress conversion
    counts vs the batch definition."""
    from pyanamo_spark.streaming.funnel import _NONE, _fold_user

    class FakeState:
        hasTimedOut = True
        exists = True
        get = (100, 200, _NONE)  # view + click reached, no purchase
        removed = False

        def remove(self):
            self.removed = True

    st = FakeState()
    out = list(_fold_user((7,), iter([]), st))
    assert st.removed
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (
        int(row["user_id"]),
        int(row["first_view"]),
        int(row["first_click"]),
        int(row["stage_reached"]),
    ) == (7, 100, 200, 2)
