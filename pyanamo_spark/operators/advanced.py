"""Advanced analytics: sessionization, pivot, cube, exact percentiles.

Sessionization is the gaps-and-islands pattern (lag → new-session flag
→ running sum), the batch-checkable twin of the streaming
``session_window`` in pyanamo_spark.streaming; at 100 TB the window
partitions by user_id so state is bounded per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pyanamo_spark.functions.quantiles import (
    exact_group_percentiles_lowcard,
)
from pyanamo_spark.registry import register

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "q_sessionize",
    oracle=f"""
WITH marked AS (
  SELECT user_id, event_id, value,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                OR LAG(epoch_us(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, value,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS session_value
FROM sess
GROUP BY user_id, session_id
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap: lag-based
    new-session flags, running-sum session ids, per-session rollup —
    three window/agg stages over one user-partitioned sort. (Ordering
    by event_id in the running sum is safe: event_id increases with ts
    in the fixture, and the tiebreak keeps it deterministic.)"""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    new_sess = F.when(
        (us - F.lag(us).over(w) > SESSION_GAP_US)
        | F.lag(us).over(w).isNull(),
        1,
    ).otherwise(0)
    w_run = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sess = (
        spark.table("events")
        .select("user_id", "event_id", "value", new_sess.alias("new_sess"))
        .withColumn("session_id", F.sum("new_sess").over(w_run).cast("long"))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


@register(
    "q_pivot",
    oracle="""
SELECT o_orderstatus,
       COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
       COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS high,
       COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium,
       COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
         AS not_specified,
       COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low
FROM orders
GROUP BY o_orderstatus
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts by status × priority. The value list is
    explicit — with it, Spark plans a single-pass pivot (no extra
    distinct-values job, which at 100 TB would be a full scan)."""
    renames = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "not_specified",
        "5-LOW": "low",
    }
    df = (
        spark.table("orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", PRIORITIES)
        .count()
    )
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    # pivot leaves absent cells null; the oracle's COUNT(CASE) yields 0
    return df.na.fill(0, list(renames.values()))


@register(
    "q_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 cube: all grouping-set combinations of (returnflag,
    linestatus) in one pass."""
    return (
        spark.table("lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "q_percentiles",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
       ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
       ROUND(MAX(l_quantity), 2) AS p_max
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (≡ DuckDB
    `quantile_cont`) — NOT Spark's exact `percentile`, whose single
    aggregation buffer holds every value of a group and OOMs on giant
    groups. l_quantity is an integral measure with ~50 distinct
    values, so this takes the value-histogram path: the shuffle
    carries one (group, value) count row per distinct value —
    independent of group row count at any scale. Continuous measures
    take the sketch-prefilter path instead (see q_equidepth,
    q_outliers). Results are bit-identical to the exact aggregate
    (same interpolation expression), so the oracle stays green."""
    li = spark.table("lineitem")
    pct = exact_group_percentiles_lowcard(
        li,
        ["l_returnflag"],
        "l_quantity",
        {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p_max": 1.0},
    )
    return pct.select(
        "l_returnflag",
        F.round("p25", 4).alias("p25"),
        F.round("p50", 4).alias("p50"),
        F.round("p75", 4).alias("p75"),
        F.round("p_max", 2).alias("p_max"),
    )
