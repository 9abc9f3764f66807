"""Time-series regularization: resample an irregular event stream onto
a fixed grid and gap-fill with last-observation-carried-forward.

The reference's monitors poll on a fixed cadence but its tables record
irregular arrivals (``/root/reference/code/manager.py:220-237`` polls;
items arrive whenever workers write) — turning the irregular record
into a regular series is the batch analytic a monitoring dashboard or a
training-curriculum scheduler needs. North-star extension of SURVEY.md
§2.5 (windows) directed by BASELINE.json.

Scale design (the whole point — a naive gap-fill joins the fact against
a dense calendar table):

- The ONLY fact-sized operation is the first bucket aggregation, with
  map-side combine; everything downstream is grid-sized (series ×
  slots), orders of magnitude smaller than the raw events.
- The grid is generated from a SERIES-sized bounds aggregate via
  ``sequence()`` + ``explode`` — no driver loop, no calendar table
  scan, and the per-series fan-out is bounded by the span/step ratio.
- The gap left-join runs grid-vs-buckets on (series, slot): both sides
  hash-partition on the same key, and the buckets side is already
  aggregated, so the join moves grid-sized data only.
- LOCF is one window per series ordered by slot. Grids are bounded per
  series (span/step slots), so no window partition can exceed that
  bound no matter how many raw events a series has — the skew of the
  EVENT distribution never reaches the window. 100 TB of events with
  10k series × 1-year × 15-min grid is 350M grid rows — trivially
  shuffleable — while the raw fact never moves twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

#: grid step; 900 s keeps the oracle's time_bucket epoch-aligned with
#: Spark's F.window (both align 15-min buckets to the Unix epoch).
STEP = "15 minutes"
STEP_SQL = "INTERVAL 15 MINUTE"


@register(
    "q_resample",
    oracle=f"""
WITH obs AS (
  SELECT event_type,
         time_bucket({STEP_SQL}, ts) AS slot,
         AVG(value) AS avg_value,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(slot) AS lo, MAX(slot) AS hi FROM obs GROUP BY 1
),
grid AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, {STEP_SQL})) AS slot
  FROM bounds
),
joined AS (
  SELECT g.event_type, g.slot, o.avg_value,
         COALESCE(o.n_events, 0) AS n_events
  FROM grid g
  LEFT JOIN obs o ON o.event_type = g.event_type AND o.slot = g.slot
)
SELECT event_type, slot, n_events,
       ROUND(COALESCE(avg_value, 0.0), 4) AS avg_raw,
       ROUND(COALESCE(last_value(avg_value IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY slot
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 4)
         AS avg_filled
FROM joined
""",
)
def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample per-type event values onto a 15-minute grid between
    each series' first and last observation, carrying the last observed
    average forward across empty slots (LOCF; 0.0 before the first
    observation, matching the oracle's COALESCE).

    ``F.window(ts, step).start`` and DuckDB's ``time_bucket`` both
    align 15-minute buckets to the Unix epoch, so the slot sets agree
    exactly; averages are rounded on both sides."""
    ts = F.col("ts").cast("timestamp")
    obs = (
        spark.table("events")
        .groupBy(
            F.col("event_type"),
            F.window(ts, STEP)["start"].alias("slot"),
        )
        .agg(
            F.avg("value").alias("avg_value"),
            F.count("*").alias("n_events"),
        )
        # grid-sized (series × slots); checkpointing it makes BOTH
        # consumers (bounds→grid and the gap join) read the
        # materialized buckets, so the raw fact is scanned once by
        # construction instead of once per printed subtree copy
        .localCheckpoint()
    )
    grid = (
        obs.groupBy(F.col("event_type").alias("g_type"))
        .agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"))
        .select(
            "g_type",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {STEP}"))
            ).alias("g_slot"),
        )
    )
    joined = grid.join(
        obs,
        (F.col("g_type") == F.col("event_type"))
        & (F.col("g_slot") == F.col("slot")),
        "left",
    ).select(
        F.col("g_type").alias("event_type"),
        F.col("g_slot").alias("slot"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "avg_value",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "slot",
        "n_events",
        F.round(F.coalesce("avg_value", F.lit(0.0)), 4).alias("avg_raw"),
        F.round(
            F.coalesce(
                F.last("avg_value", ignorenulls=True).over(w), F.lit(0.0)
            ),
            4,
        ).alias("avg_filled"),
    )
