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
         CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_cents,
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
  SELECT g.event_type, g.slot, o.sum_cents,
         COALESCE(o.n_events, 0) AS n_events
  FROM grid g
  LEFT JOIN obs o ON o.event_type = g.event_type AND o.slot = g.slot
),
filled AS (
  SELECT event_type, slot, n_events, sum_cents,
         last_value(sum_cents IGNORE NULLS) OVER w AS f_sum,
         last_value(CASE WHEN sum_cents IS NOT NULL THEN n_events END
                    IGNORE NULLS) OVER w AS f_n
  FROM joined
  WINDOW w AS (PARTITION BY event_type ORDER BY slot
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, slot, n_events,
       COALESCE(CAST(sum_cents * 100 // n_events AS BIGINT), 0)
         AS avg_raw_e4,
       COALESCE(CAST(f_sum * 100 // f_n AS BIGINT), 0) AS avg_filled_e4
FROM filled
""",
)
def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample per-type event values onto a 15-minute grid between
    each series' first and last observation, carrying the last observed
    bucket forward across empty slots (LOCF; 0 before the first
    observation, matching the oracle's COALESCE).

    ``F.window(ts, step).start`` and DuckDB's ``time_bucket`` both
    align 15-minute buckets to the Unix epoch, so the slot sets agree
    exactly.

    Averages are emitted as EXACT fixed-point integers
    (``avg_*_e4`` = floor(bucket sum · 10⁴ / bucket count), i.e. the
    mean in 10⁻⁴ value units): the fixture's values are 2-decimal
    currency, so a bucket mean is an exact 5+-decimal rational that
    lands PRECISELY on the ROUND(x, 4) half-way boundary whenever the
    bucket count is a power of two — and Spark (string-based HALF_UP
    via BigDecimal) and DuckDB (numeric rounding) resolve that
    boundary in opposite directions for the same double (63 of 14 400
    buckets at sf0.1 — found by the r09 cross-scale oracle sweep; the
    sf0.01 gate never hits a boundary). Summing to integer cents and
    floor-dividing keeps every compared value in exact integer
    arithmetic on both engines at any scale; clients divide by 10⁴
    for display."""
    ts = F.col("ts").cast("timestamp")
    obs = (
        spark.table("events")
        .groupBy(
            F.col("event_type"),
            F.window(ts, STEP)["start"].alias("slot"),
        )
        .agg(
            # exact integer cents: the true sum is an integral number
            # of cents, float error << 0.5, so both engines round to
            # the same integer
            F.round(F.sum("value") * 100)
            .cast("long")
            .alias("sum_cents"),
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
        "sum_cents",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # LOCF carries the (sum, count) PAIR so the filled mean is the
    # last observed bucket's exact mean, not a re-rounded echo
    f_sum = F.last("sum_cents", ignorenulls=True).over(w)
    f_n = F.last(
        F.when(F.col("sum_cents").isNotNull(), F.col("n_events")),
        ignorenulls=True,
    ).over(w)
    filled = joined.select(
        "*", f_sum.alias("f_sum"), f_n.alias("f_n")
    )
    return filled.select(
        "event_type",
        "slot",
        "n_events",
        F.coalesce(
            F.expr("(sum_cents * 100) div n_events"), F.lit(0)
        ).alias("avg_raw_e4"),
        F.coalesce(
            F.expr("(f_sum * 100) div f_n"), F.lit(0)
        ).alias("avg_filled_e4"),
    )


@register(
    "q_autocorr",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
  FROM orders GROUP BY d
),
s AS (
  SELECT rev,
         LAG(rev, 1) OVER (ORDER BY d) AS rev_lag1,
         LAG(rev, 7) OVER (ORDER BY d) AS rev_lag7
  FROM daily
)
SELECT COUNT(*) AS n_days,
       ROUND(CORR(rev, rev_lag1), 6) AS acf_1,
       ROUND(CORR(rev, rev_lag7), 6) AS acf_7
FROM s
""",
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of the daily revenue series —
    the stationarity/seasonality probe run before fitting any
    forecaster (lag-7 exposes weekly cycles).

    Scale shape: the corpus collapses to the DAYS-sized daily series
    in one map-combined aggregation; the lag window and the Pearson
    corr then run on that bounded model (the documented global-window
    exception — thousands of rows however big the fact table). corr
    is the two-pass-free JVM aggregate on both engines; null pairs
    from the warm-up lags fall out of corr on both sides identically.
    """
    daily = (
        spark.table("orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.orderBy("d")
    s = daily.select(
        "rev",
        F.lag("rev", 1).over(w).alias("rev_lag1"),
        F.lag("rev", 7).over(w).alias("rev_lag7"),
    )
    return s.agg(
        F.count("*").alias("n_days"),
        F.round(F.corr("rev", "rev_lag1"), 6).alias("acf_1"),
        F.round(F.corr("rev", "rev_lag7"), 6).alias("acf_7"),
    )


@register(
    "q_backtest",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
  FROM orders GROUP BY d
),
s AS (
  SELECT rev,
         LAG(rev, 1) OVER (ORDER BY d) AS f_naive,
         LAG(rev, 7) OVER (ORDER BY d) AS f_seasonal
  FROM daily
)
SELECT COUNT(*) AS n_eval,
       ROUND(AVG(ABS(rev - f_naive)), 2) AS mae_naive,
       ROUND(AVG(ABS(rev - f_seasonal)), 2) AS mae_seasonal,
       ROUND(AVG(ABS(rev - f_naive) / rev), 6) AS mape_naive,
       ROUND(AVG(ABS(rev - f_seasonal) / rev), 6) AS mape_seasonal
FROM s
WHERE f_seasonal IS NOT NULL
""",
)
def q_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest on the daily revenue series:
    score the naive (yesterday) and seasonal-naive (same weekday last
    week) forecasters by MAE and MAPE over every day where both have
    a history — the evaluation harness that decides whether a fitted
    model (q_revenue_forecast) actually beats the trivial baselines.

    Scale shape: identical to q_autocorr — corpus collapses to the
    DAYS-sized series in one map-combined aggregation; lags + the
    error fold run on that bounded model (documented global-window
    exception). The 7-day warm-up is excluded on both engines by the
    same predicate.
    """
    daily = (
        spark.table("orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.orderBy("d")
    s = daily.select(
        "rev",
        F.lag("rev", 1).over(w).alias("f_naive"),
        F.lag("rev", 7).over(w).alias("f_seasonal"),
    ).filter(F.col("f_seasonal").isNotNull())
    err = lambda f: F.abs(F.col("rev") - F.col(f))  # noqa: E731
    return s.agg(
        F.count("*").alias("n_eval"),
        F.round(F.avg(err("f_naive")), 2).alias("mae_naive"),
        F.round(F.avg(err("f_seasonal")), 2).alias("mae_seasonal"),
        F.round(F.avg(err("f_naive") / F.col("rev")), 6).alias("mape_naive"),
        F.round(F.avg(err("f_seasonal") / F.col("rev")), 6).alias(
            "mape_seasonal"
        ),
    )


@register(
    "q_seasonality",
    oracle="""
WITH cell AS (
  SELECT CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
         CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
         COUNT(*) AS n_events,
         CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_cents
  FROM events GROUP BY dow, hr
),
tot AS (SELECT SUM(n_events) AS tn FROM cell)
SELECT dow, hr, n_events,
       CAST(sum_cents * 100 // n_events AS BIGINT) AS avg_value_e4,
       CAST(n_events * 168 * 10000 // (SELECT tn FROM tot) AS BIGINT)
         AS load_index_e4
FROM cell
""",
)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: event volume and mean value per
    (day-of-week × hour) cell, plus a load index normalizing each
    cell against a perfectly uniform week (1.0 = average traffic;
    168 = 7·24 cells) — the capacity-planning heat-map.

    Scale shape: ONE map-combined aggregation to the 168-cell grid;
    the normalizing total is a 1-row broadcast scalar. Day-of-week
    numbering is aligned across engines (Spark's dayofweek is
    1=Sunday, DuckDB's dow is 0=Sunday — the Spark side shifts).

    Means and load index are exact fixed-point integers (×10⁴), the
    q_resample pattern: the fixture's 2-decimal values make cell means
    exact rationals that can sit precisely on a ROUND(x, 4) half-way
    boundary (ONE sf0.1 cell does today), where Spark and DuckDB round
    the same double in opposite directions; integer floor-division
    never consults a boundary. Clients divide by 10⁴ for display.
    """
    cell = spark.table("events").groupBy(
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").alias("hr"),
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value") * 100).cast("long").alias("sum_cents"),
    )
    tot = cell.agg(F.sum("n_events").alias("tn"))
    return cell.join(F.broadcast(tot)).select(
        "dow",
        "hr",
        "n_events",
        F.expr("(sum_cents * 100) div n_events").alias("avg_value_e4"),
        F.expr("(n_events * 168 * 10000) div tn").alias("load_index_e4"),
    )


@register(
    "q_changepoint",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
  FROM orders GROUP BY d
),
stats AS (
  SELECT AVG(rev) AS mu, STDDEV_SAMP(rev) AS sd, COUNT(*) AS nd
  FROM daily
),
cus AS (
  SELECT d,
         SUM(rev - (SELECT mu FROM stats)) OVER (ORDER BY d)
           / ((SELECT sd FROM stats) * SQRT((SELECT nd FROM stats)))
           AS cusum
  FROM daily
)
SELECT d AS change_date,
       ROUND(cusum, 6) AS cusum_peak,
       ROUND(ABS(cusum), 6) AS magnitude
FROM cus
ORDER BY ABS(cusum) DESC, d
LIMIT 1
""",
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily revenue series: the
    normalized cumulative deviation from the global mean (Brownian-
    bridge scaling: /(σ·√n)) peaks at the most likely level-shift
    point — the alarm a data pipeline raises when a source's volume
    regime changes (crawler breakage, upstream migration).

    Scale shape: the corpus collapses to the DAYS-sized series; the
    global mean/σ are a 1-row broadcast scalar, the running sum is an
    ordered window over the bounded series (documented exception),
    and the peak is a 1-row TakeOrdered. The ordered accumulation
    makes the float fold deterministic on both engines.
    """
    daily = (
        spark.table("orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    stats = daily.agg(
        F.avg("rev").alias("mu"),
        F.stddev_samp("rev").alias("sd"),
        F.count("*").alias("nd"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cus = daily.join(F.broadcast(stats)).select(
        "d",
        (
            F.sum(F.col("rev") - F.col("mu")).over(w)
            / (F.col("sd") * F.sqrt(F.col("nd")))
        ).alias("cusum"),
    )
    # order on the UNROUNDED statistic (matching the oracle), round
    # only in the final projection
    return (
        cus.orderBy(F.abs(F.col("cusum")).desc(), "d")
        .limit(1)
        .select(
            F.col("d").alias("change_date"),
            F.round("cusum", 6).alias("cusum_peak"),
            F.round(F.abs("cusum"), 6).alias("magnitude"),
        )
    )


@register(
    "q_anomaly_seasonal",
    oracle="""
WITH obs AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
         CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
         SUM(value) AS v
  FROM events GROUP BY day, dow, hr
),
prof AS (
  SELECT dow, hr, AVG(v) AS mu, STDDEV_SAMP(v) AS sd
  FROM obs GROUP BY dow, hr
)
SELECT o.day, o.hr,
       ROUND(o.v, 2) AS actual,
       ROUND(p.mu, 4) AS expected,
       ROUND((o.v - p.mu) / NULLIF(p.sd, 0), 4) AS z
FROM obs o JOIN prof p ON p.dow = o.dow AND p.hr = o.hr
WHERE ABS((o.v - p.mu) / NULLIF(p.sd, 0)) >= 1.2
""",
)
def q_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly detection: each hourly total is
    scored against the expectation for ITS (day-of-week × hour) cell,
    so Monday 9am is judged against Monday-9am history — the alarm
    q_anomaly (flat rolling bands) raises falsely every weekend is
    silenced, and true off-cycle spikes stand out. Emits the
    anomalous hours with actual, expected, and z. The threshold is
    1.2 because the z here is SELF-INCLUSIVE (the point contributes
    to its own cell's mean/σ), which caps |z| at (n−1)/√n — ~1.8 for
    the fixture's 4-5 observations per cell; a production profile
    built from held-out history would use the conventional 2-3.

    Scale shape: the corpus collapses to the date×hour observation
    grid in one map-combined aggregation; the 168-cell profile
    aggregates from the grid; the join back is grid-keyed (AQE
    broadcasts the profile); output is anomalies-sized. The divisor
    is NULLIF-guarded on both engines, so constant cells drop out
    instead of dividing by zero.
    """
    obs = spark.table("events").groupBy(
        F.to_date("ts").alias("day"),
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").alias("hr"),
    ).agg(F.sum("value").alias("v"))
    prof = obs.groupBy("dow", "hr").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sd")
    )
    z = (F.col("v") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0))
    return (
        obs.join(prof, ["dow", "hr"])
        .filter(F.abs(z) >= 1.2)
        .select(
            "day",
            "hr",
            F.round("v", 2).alias("actual"),
            F.round("mu", 4).alias("expected"),
            F.round(z, 4).alias("z"),
        )
    )
