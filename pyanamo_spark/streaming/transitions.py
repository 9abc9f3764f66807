"""Streaming twin of the batch Markov transition matrix
(operators/graph.q_transitions): per-user last-state carried in the
state store, per-batch transition-count increments emitted downstream.

Reference parity: the reference's monitors re-scan cumulative state on
every poll (manager.py:209-244); the streaming form folds each event
into O(1) per-user state exactly once. The emitted rows are signed
increments for a downstream counter store — the same
delta-aggregation contract as operators/cdc.q_mv_refresh, so a
transition dashboard stays fresh at event-stream rates without ever
re-reading history.

Scale shape: state per user is ONE string (the last event type) —
bounded, keyed, checkpointable; emissions per batch are bounded by
STATES² per active user-batch, not by event volume. Delivery contract:
within a micro-batch events are sorted by (ts, event_id) before
folding; ACROSS batches the source must deliver each user's events in
event-time order (a per-key ordered log — e.g. a queue partitioned by
user — provides this; a backfill that interleaves old and new files
does not, and should replay through the batch operator instead).

No timeout is registered: the 4.1.2 no-data-batch defect documented in
streaming/stateful.py only bites timeout-bearing operators, so this
one drains cleanly under default configs.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "prev_type string, next_type string, n bigint"
STATE_SCHEMA = "last_type string"


def _fold_transitions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    prev = state.get[0] if state.exists else None
    counts: Counter = Counter()
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        batch = batch.sort_values(["ts", "event_id"])
        for cur in batch["event_type"]:
            if prev is not None:
                counts[(prev, cur)] += 1
            prev = cur
        state.update((prev,))
    if counts:
        yield pd.DataFrame(
            [
                {"prev_type": a, "next_type": b, "n": n}
                for (a, b), n in counts.items()
            ]
        )


def streaming_transitions(
    spark: SparkSession, events_path: str, schema
) -> DataFrame:
    """Stream of per-batch transition-count increments; summing ``n``
    per (prev_type, next_type) downstream reproduces the batch
    q_transitions counts exactly (pinned in
    tests/test_streaming_transitions.py, including a checkpointed
    two-drain restart where a pair spans the batch boundary)."""
    from pyanamo_spark.streaming.monitor import normalize_event_time

    stream = normalize_event_time(
        spark.readStream.schema(schema).parquet(events_path)
    )
    return (
        stream.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _fold_transitions,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
