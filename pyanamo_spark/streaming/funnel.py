"""Streaming funnel: per-user view→click→purchase stage tracking as a
custom stateful operator — the continuous twin of the batch
``q_funnel`` (operators/analytics.py).

State per user is three nullable event-time stamps (first view, first
click strictly after it, first purchase strictly after that): bounded
per key regardless of event volume, partitioned across executors,
checkpointable. Each micro-batch is sorted by event time within the
group before folding, so ordered arrival across batches reproduces the
batch funnel exactly (asserted by the incremental==batch test); events
that arrive out of event-time order can only DELAY a stage stamp,
never fabricate one — the conservative direction for a conversion
metric. A production deployment bounds that staleness with the
source's watermark, exactly as the sessionization stream does.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, first_view bigint, first_click bigint, "
    "first_purchase bigint, stage_reached int"
)
STATE_SCHEMA = "tv bigint, tc bigint, tp bigint"
_NONE = -1  # state tuples cannot hold None portably; sentinel instead


def _fold_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # Evicting silently would FORGET the user's reached stages: a
        # later event would restart them at stage 0 and, in update
        # mode, overwrite the sink's higher row — conversion counts
        # would regress vs the batch definition. Emit the final row as
        # the episode's terminal record before dropping state; any
        # later activity is a NEW funnel episode (sessionized-funnel
        # semantics), so per-episode counts stay monotone.
        tv, tc, tp = state.get if state.exists else (_NONE, _NONE, _NONE)
        state.remove()
        stage = (
            3 if tp != _NONE else 2 if tc != _NONE else 1 if tv != _NONE else 0
        )
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "first_view": tv,
                    "first_click": tc,
                    "first_purchase": tp,
                    "stage_reached": stage,
                }
            ]
        )
        return
    tv, tc, tp = state.get if state.exists else (_NONE, _NONE, _NONE)
    events = pd.concat(list(pdfs), ignore_index=True)
    events = events.sort_values("ts_us", kind="stable")
    for ts, etype in zip(events["ts_us"], events["event_type"]):
        ts = int(ts)
        if etype == "view" and tv == _NONE:
            tv = ts
        elif etype == "click" and tc == _NONE and tv != _NONE and ts > tv:
            tc = ts
        elif (
            etype == "purchase"
            and tp == _NONE
            and tc != _NONE
            and ts > tc
        ):
            tp = ts
    state.update((tv, tc, tp))
    state.setTimeoutDuration(300_000)
    stage = 3 if tp != _NONE else 2 if tc != _NONE else 1 if tv != _NONE else 0
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "first_view": tv,
                "first_click": tc,
                "first_purchase": tp,
                "stage_reached": stage,
            }
        ]
    )


def funnel_stream(
    spark: SparkSession, events_path: str, schema
) -> DataFrame:
    """Per-user funnel stage stream over an events directory."""
    from pyanamo_spark.streaming.monitor import normalize_event_time

    stream = normalize_event_time(
        spark.readStream.schema(schema).parquet(events_path)
    )
    return (
        stream.select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _fold_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
