"""Temporal table shapes: SCD-2 validity intervals from a change log,
and ordered per-entity event assembly.

Reference parity: the reference's task table is last-write-wins — item
state history is lost the moment ``updateItemStates`` runs
(/root/reference/code/modifier.py update paths). Deriving validity
intervals from an event log is how a warehouse keeps the history the
reference discards; the assembled per-entity event sequence is the
training-data form (conversation/behavior-sequence assembly). Both are
north-star extensions directed by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyanamo_spark.registry import register


@register(
    "q_scd2",
    oracle="""
SELECT user_id,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       LEAD(ts) OVER w IS NULL AS is_current,
       ROUND(value, 2) AS value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: each
    event's value is valid from its timestamp until the user's next
    event (NULL valid_to = current row). ONE window pass — the
    standard LEAD derivation; no self-join, no per-entity loop.

    Scale shape: the window partitions by user_id (one hash exchange
    of (user, ts, value) rows) and sorts within user — per-partition
    sort bounded by the heaviest user's history, which SortExec
    spills; a known-hot entity goes through the salted pattern first.
    Ties break on event_id so both engines pick the same successor."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return spark.table("events").select(
        "user_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.round("value", 2).alias("value"),
    )


@register(
    "q_session_events",
    oracle="""
SELECT user_id,
       CAST(ts AS DATE) AS day,
       COUNT(*) AS n_events,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS event_seq
FROM events
GROUP BY 1, 2
""",
)
def q_session_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event assembly per (user, day): the behavior-sequence /
    conversation-assembly shape a training pipeline feeds to sequence
    models — each entity-period becomes one row carrying its ordered
    event array (emitted '>'-joined so the result stays a scalar
    string column — the harness's canonicalizer cannot hash array
    cells, and downstream consumers split on the delimiter).

    Scale shape: ONE aggregation; ordering rides inside the group via
    sort_array over (ts, event_id, type) structs (deterministic
    tie-break, matching the oracle's ORDER BY), so there is no window
    pass and no second shuffle. Group size is bounded by events per
    entity-day — the period key is the lever that keeps assembled
    arrays executor-sized at any corpus scale."""
    assembled = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("ts"), F.col("event_id"), F.col("event_type")
                    )
                )
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    return (
        spark.table("events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            assembled.alias("event_seq"),
        )
    )
