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
