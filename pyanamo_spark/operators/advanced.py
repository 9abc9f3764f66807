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


@register(
    "q_winsorize",
    oracle="""
WITH pct AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS p05,
         quantile_cont(o_totalprice, 0.95) AS p95
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       COUNT(*) AS n_rows,
       COUNT(CASE WHEN o.o_totalprice < p.p05 THEN 1 END) AS n_capped_low,
       COUNT(CASE WHEN o.o_totalprice > p.p95 THEN 1 END) AS n_capped_high,
       ROUND(AVG(o.o_totalprice), 2) AS mean_raw,
       ROUND(AVG(GREATEST(LEAST(o.o_totalprice, p.p95), p.p05)), 2)
         AS mean_winsorized,
       ROUND(CAST(MAX(p.p05) AS DOUBLE), 2) AS p05,
       ROUND(CAST(MAX(p.p95) AS DOUBLE), 2) AS p95
FROM orders o
JOIN pct p USING (o_orderpriority)
GROUP BY o.o_orderpriority
""",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust mean per priority class: clamp order values
    into the group's exact [p05, p95] band and report raw vs capped
    means with cap counts — the outlier-resistant aggregate a metrics
    pipeline publishes when a handful of whale orders would otherwise
    move the average (complement of q_outliers, which REPORTS the
    whales; this neutralizes them).

    Scale shape: the cutoffs come from the bounded-memory exact
    percentile machinery (functions/quantiles.py — sketch prefilter +
    spillable interior, ≡ quantile_cont, never a per-group value
    buffer); the GROUPS-sized cutoff table broadcast-joins back onto
    the scan and the readout is ONE aggregation. Clamping is a pure
    codegen'd greatest/least expression.
    """
    from pyanamo_spark.functions.quantiles import exact_group_percentiles

    orders = spark.table("orders")
    pct = exact_group_percentiles(
        orders, ["o_orderpriority"], "o_totalprice", {"p05": 0.05, "p95": 0.95}
    )
    j = orders.join(F.broadcast(pct), "o_orderpriority")
    capped = F.greatest(
        F.least(F.col("o_totalprice"), F.col("p95")), F.col("p05")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("o_totalprice") < F.col("p05"), 1)).alias(
            "n_capped_low"
        ),
        F.count(F.when(F.col("o_totalprice") > F.col("p95"), 1)).alias(
            "n_capped_high"
        ),
        F.round(F.avg("o_totalprice"), 2).alias("mean_raw"),
        F.round(F.avg(capped), 2).alias("mean_winsorized"),
        F.round(F.max("p05").cast("double"), 2).alias("p05"),
        F.round(F.max("p95").cast("double"), 2).alias("p95"),
    )


@register(
    "q_session_stats",
    oracle=f"""
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                OR LAG(epoch_us(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
per AS (
  SELECT user_id, session_id,
         COUNT(*) AS n_events,
         (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 1000000.0 AS dur_sec,
         CAST(MIN(ts) AS DATE) AS day
  FROM sess GROUP BY user_id, session_id
)
SELECT day,
       COUNT(*) AS n_sessions,
       COUNT(CASE WHEN n_events = 1 THEN 1 END) AS bounces,
       ROUND(COUNT(CASE WHEN n_events = 1 THEN 1 END) * 1.0 / COUNT(*),
             6) AS bounce_rate,
       ROUND(AVG(n_events * 1.0), 4) AS avg_events,
       ROUND(AVG(dur_sec), 4) AS avg_duration_sec
FROM per
GROUP BY day
""",
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily session-quality report over the 30-minute-gap sessions
    of q_sessionize: session count, bounce count/rate (single-event
    sessions), mean events and mean duration per session — the
    engagement dashboard one step up from raw sessionization.

    Scale shape: the same single user-partitioned sort powers the
    gap flags and the running session ids; sessions collapse in a
    (user, session)-keyed aggregate and the daily readout is
    DAYS-sized. Durations subtract epoch-micros extrema inside the
    session aggregate — no second window pass.
    """
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
        .select("user_id", "event_id", "ts", new_sess.alias("new_sess"))
        .withColumn("session_id", F.sum("new_sess").over(w_run))
    )
    per = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        ((F.max(us) - F.min(us)) / 1_000_000.0).alias("dur_sec"),
        F.to_date(F.min("ts")).alias("day"),
    )
    bounce = F.count(F.when(F.col("n_events") == 1, 1))
    return per.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        bounce.alias("bounces"),
        F.round(bounce / F.count("*"), 6).alias("bounce_rate"),
        F.round(F.avg(F.col("n_events") * 1.0), 4).alias("avg_events"),
        F.round(F.avg("dur_sec"), 4).alias("avg_duration_sec"),
    )
