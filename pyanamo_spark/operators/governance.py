"""Data-governance analytics: k-anonymity re-identification audit and
conversion touch attribution.

Reference parity: the reference ships user data straight into task
payloads and logs (/root/reference/code/pyanamo/modifier.py put paths)
with no privacy posture; a curation engine feeding model training
needs a first-class answer to "which quasi-identifier combinations
isolate individuals" before a corpus leaves the boundary. Attribution
is the standard product-analytics readout over the same event stream
the funnel/cohort operators consume — north-star extensions.

Scale shapes: both are single-pass. The k-anonymity audit is two
chained aggregations (facts → quasi-identifier groups → per-dimension
rollup), each map-side-combined; nothing driver-side. Attribution is
one per-entity window pass (the same exchange the sequence operators
pay) collapsing into a CHANNELS²-bounded aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

_K = 5
_TOUCH_TYPES = ("click", "view", "signup")


@register(
    "q_kanon",
    oracle=f"""
WITH g AS (
  SELECT c_nationkey,
         c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
         COUNT(*) AS n
  FROM customer
  GROUP BY c_nationkey, c_mktsegment, bal_bucket
)
SELECT c_nationkey,
       COUNT(*) AS n_groups,
       CAST(SUM(CASE WHEN n < {_K} THEN 1 ELSE 0 END) AS BIGINT) AS risky_groups,
       CAST(SUM(CASE WHEN n < {_K} THEN n ELSE 0 END) AS BIGINT) AS risky_rows,
       ROUND(SUM(CASE WHEN n < {_K} THEN n ELSE 0 END) * 1.0 / SUM(n),
             6) AS risk_rate,
       MIN(n) AS min_group_size
FROM g
GROUP BY c_nationkey
""",
)
def q_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the quasi-identifier tuple
    (nation, market segment, account-balance bucket): per nation, how
    many quasi-identifier groups exist, how many isolate fewer than k
    individuals, and what fraction of rows those risky groups expose.
    The pre-release re-identification check for a curated corpus.

    Scale shape: two chained aggregations. The first shuffles on the
    quasi-identifier tuple with full map-side combine (output is
    bounded by the quasi-identifier domain, not the row count); the
    second rolls that bounded table up per nation. No window, no
    join, no driver-side state.
    """
    k = F.lit(_K)
    groups = (
        spark.table("customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        )
        .agg(F.count("*").alias("n"))
    )
    risky_n = F.when(F.col("n") < k, F.col("n")).otherwise(F.lit(0))
    return groups.groupBy("c_nationkey").agg(
        F.count("*").alias("n_groups"),
        F.sum(F.when(F.col("n") < k, 1).otherwise(0)).alias("risky_groups"),
        F.sum(risky_n).alias("risky_rows"),
        F.round(F.sum(risky_n) / F.sum("n"), 6).alias("risk_rate"),
        F.min("n").alias("min_group_size"),
    )


@register(
    "q_attribution",
    oracle=f"""
WITH t AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN event_type IN {_TOUCH_TYPES!r}
              THEN event_type END AS touch
  FROM events
),
a AS (
  SELECT event_type, value,
         COALESCE(FIRST_VALUE(touch IGNORE NULLS) OVER w,
                  'direct') AS first_touch,
         COALESCE(LAST_VALUE(touch IGNORE NULLS) OVER w,
                  'direct') AS last_touch
  FROM t
  WINDOW w AS (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  )
)
SELECT first_touch, last_touch,
       COUNT(*) AS conversions,
       ROUND(SUM(value), 2) AS revenue
FROM a
WHERE event_type = 'purchase'
GROUP BY first_touch, last_touch
""",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution: for every purchase, the first and the
    most recent preceding touch channel (click/view/signup; 'direct'
    when none), with conversion counts and attributed revenue per
    (first, last) channel pair — the first-touch/last-touch readout
    marketing analytics runs over an event stream.

    Scale shape: ONE window pass per user (first_value/last_value
    with IGNORE NULLS over the preceding frame — running state, no
    self-join against touch history) feeding a CHANNELS²-bounded
    aggregate. The unbounded-preceding frame is running-accumulation,
    not a buffered frame, so per-row cost stays O(1).
    """
    touch = F.when(
        F.col("event_type").isin(*_TOUCH_TYPES), F.col("event_type")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    attributed = spark.table("events").select(
        "event_type",
        "value",
        F.coalesce(F.first(touch, ignorenulls=True).over(w), F.lit("direct"))
        .alias("first_touch"),
        F.coalesce(F.last(touch, ignorenulls=True).over(w), F.lit("direct"))
        .alias("last_touch"),
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .groupBy("first_touch", "last_touch")
        .agg(
            F.count("*").alias("conversions"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
    )
