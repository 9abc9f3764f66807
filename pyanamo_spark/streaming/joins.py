"""Stream-stream interval join (SURVEY.md §2.9 extension): correlate
each error event with the same user's actions in the minutes before it
— "what did the user do right before things broke", continuously.

The reference can only produce this correlation by re-querying history
in its poll loop (manager.py's monitors re-read the table each sweep);
the streaming-native form is ONE stateful join the engine keeps up to
date, with state bounded by watermark + interval:

- both sides carry a watermark, and the join condition bounds the
  action time to [error_ts - lookback, error_ts] — Spark derives from
  this exactly how long each side's rows must be buffered, so state
  per user is (events within watermark+lookback), never unbounded
- the join shuffles both streams on user_id once; at 100 TB/day the
  state store is partitioned the same way, and skewed users bound
  their own state by the time interval, not by total history

The batch twin ``q_error_context`` (same predicate as a batch
self-join + aggregate) is hash-checked against DuckDB; the streaming
test pins the drained join equal to the batch aggregation, so the
stream's semantics inherit the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register
from pyanamo_spark.streaming.monitor import normalize_event_time

#: context window: actions this long before an error are correlated
LOOKBACK = "10 minutes"
LOOKBACK_SQL = "INTERVAL 10 MINUTE"
#: how late events may arrive before being dropped
WATERMARK = "30 minutes"


def error_context_stream(
    spark: SparkSession, events_path: str, schema
) -> DataFrame:
    """Streaming error↔action interval join: one output row per
    (error, preceding action within LOOKBACK) pair, append mode.

    Both sides are the SAME source stream filtered two ways — Spark
    plans them as two scans of the directory, each with its own
    watermark; the time-bound join condition is what lets the state
    store evict."""
    ev = normalize_event_time(
        spark.readStream.schema(schema).parquet(events_path)
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("err_user"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", WATERMARK)
    )
    actions = (
        ev.filter(F.col("event_type") != "error")
        .select(
            F.col("user_id").alias("act_user"),
            F.col("event_type").alias("action"),
            F.col("ts").alias("act_ts"),
        )
        .withWatermark("act_ts", WATERMARK)
    )
    return errors.join(
        actions,
        F.expr(
            f"err_user = act_user AND act_ts <= err_ts "
            f"AND act_ts >= err_ts - {LOOKBACK_SQL}"
        ),
        "inner",
    )


@register(
    "q_error_context",
    oracle=f"""
SELECT e.event_id AS err_id,
       COUNT(*) AS n_context,
       COUNT(DISTINCT a.event_type) AS n_action_types
FROM events e
JOIN events a
  ON a.user_id = e.user_id
 AND a.event_type <> 'error'
 AND a.ts <= e.ts
 AND a.ts >= e.ts - {LOOKBACK_SQL}
WHERE e.event_type = 'error'
GROUP BY e.event_id
""",
)
def q_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming interval join: per error, how many
    same-user actions landed in the preceding {LOOKBACK} and how many
    distinct action types. Scale shape: the self-join shuffles both
    filtered sides on user_id once; the time bound is a join residual,
    so per-user state in a merge join is the interval's rows — the
    same bound the streaming state store gets from the watermark."""
    ev = spark.table("events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("err_user"),
        F.col("ts").alias("err_ts"),
    )
    actions = ev.filter(F.col("event_type") != "error").select(
        F.col("user_id").alias("act_user"),
        F.col("event_type").alias("action"),
        F.col("ts").alias("act_ts"),
    )
    joined = errors.join(
        actions,
        (F.col("err_user") == F.col("act_user"))
        & (F.col("act_ts") <= F.col("err_ts"))
        & (F.col("act_ts") >= F.col("err_ts") - F.expr(LOOKBACK_SQL)),
    )
    return joined.groupBy("err_id").agg(
        F.count("*").alias("n_context"),
        F.count_distinct("action").alias("n_action_types"),
    )
