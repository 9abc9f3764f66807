"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10 / north star: "custom stateful operators").

``running_user_totals`` maintains per-user running aggregates
(event count, value total, last event id) across micro-batches — the
streaming-native form of the reference's cumulative monitoring state,
which it recomputes from scratch on every poll (manager.py:209-244).
State lives in the state store keyed by user_id: bounded per key,
partitioned across executors, checkpointable — the shape that holds at
100 TB/day event volumes where a poll-and-rescan cannot.

A processing-time timeout evicts idle users (the streaming analogue of
the reference's wall-time-bounded sessions, timeKeeper.py:33-73).

Known engine defect (Spark 4.1.2): with a processing-time timeout
registered, the NO-DATA cleanup micro-batch scheduled after an
``availableNow`` drain re-plans the Python stateful operator without
an active session (PythonSQLMetrics NPE) and the stream retries it
forever. Until fixed upstream, drain-style consumers should set
``spark.sql.streaming.noDataMicroBatches.enabled=false`` for the
session (timeout eviction still fires on every data batch);
continuously-fed production streams never sit in the no-data path
long enough to care.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_event_id bigint"
STATE_SCHEMA = "n_events bigint, total_value double, last_event_id bigint"


def _update_user(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # idle eviction: emit the final snapshot and drop the state
        n, total, last = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": total,
              "last_event_id": last}]
        )
        return
    n, total, last = state.get if state.exists else (0, 0.0, -1)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last = max(last, int(pdf["event_id"].max()))
    state.update((n, round(total, 6), last))
    state.setTimeoutDuration(60_000)
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": round(total, 6),
          "last_event_id": last}]
    )


def running_user_totals(
    spark: SparkSession, events_path: str, schema
) -> DataFrame:
    from pyanamo_spark.streaming.monitor import normalize_event_time

    stream = normalize_event_time(
        spark.readStream.schema(schema).parquet(events_path)
    )
    return (
        stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state v2) twin
# ---------------------------------------------------------------------------


def make_running_totals_processor(ttl_ms: int | None = None):
    """Factory returning a StatefulProcessor (imported lazily so the
    module stays importable on Spark versions without the v2 API)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", STATE_SCHEMA, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            n, total, last = (
                self._totals.get() if self._totals.exists() else (0, 0.0, -1)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                last = max(last, int(pdf["event_id"].max()))
            self._totals.update((n, round(total, 6), last))
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "n_events": n,
                        "total_value": round(total, 6),
                        "last_event_id": last,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def running_user_totals_v2(
    spark: SparkSession, events_path: str, schema
) -> DataFrame:
    """``running_user_totals`` on ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state v2 operator (typed ValueState/ListState/
    MapState handles, per-state TTL, timers). Semantics are pinned
    identical to the v1 operator and the batch aggregate in
    tests/test_stateful_streaming.py; the state store layout is the
    same user_id-partitioned RocksDB-backed store, so the scale
    contract (bounded per-key state, checkpointable, executor-
    partitioned) carries over unchanged.

    Runtime requirements (v2 runner): the RocksDB state store
    provider (``spark.sql.streaming.stateStore.providerClass``) and
    ``google.protobuf`` (the runner's state channel) — the latter is
    absent in this container, so the equivalence test import-skips;
    the operator itself builds its plan without it and runs where
    protobuf is installed."""
    from pyanamo_spark.streaming.monitor import normalize_event_time

    stream = normalize_event_time(
        spark.readStream.schema(schema).parquet(events_path)
    )
    return (
        stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_running_totals_processor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
