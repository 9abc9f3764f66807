"""Monitoring analytics: rolling-band anomaly detection and cohort
retention — the two reports the reference's polling monitors gesture
at (manager.py's count sweeps) but cannot compute from point-in-time
counts alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

#: rolling window: this many PRIOR slots form the expectation band
ANOMALY_LOOKBACK = 8
#: flag threshold in rolling-sigma units
ANOMALY_K = 3.0


@register(
    "q_anomaly",
    oracle=f"""
WITH slots AS (
  SELECT event_type,
         time_bucket(INTERVAL 1 HOUR, ts) AS slot,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
banded AS (
  SELECT event_type, slot, n,
         AVG(n) OVER w AS mu,
         STDDEV_SAMP(n) OVER w AS sigma,
         COUNT(*) OVER w AS n_prior
  FROM slots
  WINDOW w AS (PARTITION BY event_type ORDER BY slot
               ROWS BETWEEN {ANOMALY_LOOKBACK} PRECEDING
                        AND 1 PRECEDING)
)
SELECT event_type, slot, n,
       ROUND(mu, 4) AS expected,
       ROUND(ABS(n - mu) / sigma, 4) AS z
FROM banded
WHERE n_prior = {ANOMALY_LOOKBACK}
  AND sigma > 0
  AND ABS(n - mu) / sigma > {ANOMALY_K}
""",
)
def q_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-band anomaly detection: hourly per-type event counts
    flagged when they sit more than {ANOMALY_K} rolling sigmas from
    the trailing-{ANOMALY_LOOKBACK}-slot mean (slots with a full
    trailing window and non-degenerate sigma only) — the alert rule a
    monitoring deployment runs on the resampled series.

    Scale shape: the fact collapses to (series × slots) in ONE
    map-side-combined aggregation; the rolling window runs on that
    grid partitioned by series — bounded by span/step per series, the
    q_resample contract. Epoch-aligned hour buckets keep both engines
    on identical slots; the z-expression is arithmetic on the same
    doubles both sides."""
    slots = (
        spark.table("events")
        .groupBy(
            "event_type",
            F.window(F.col("ts").cast("timestamp"), "1 hour")[
                "start"
            ].alias("slot"),
        )
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(-ANOMALY_LOOKBACK, -1)
    )
    banded = slots.select(
        "event_type",
        "slot",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
        F.count("*").over(w).alias("n_prior"),
    )
    z = F.abs(F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        banded.filter(
            (F.col("n_prior") == ANOMALY_LOOKBACK)
            & (F.col("sigma") > 0)
            & (z > ANOMALY_K)
        )
        .select(
            "event_type",
            "slot",
            "n",
            F.round("mu", 4).alias("expected"),
            F.round(z, 4).alias("z"),
        )
    )


@register(
    "q_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY 1
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
  FROM events e JOIN firsts f ON f.user_id = e.user_id
),
sizes AS (
  SELECT cohort_day, COUNT(*) AS cohort_size FROM firsts GROUP BY 1
)
SELECT a.cohort_day, a.day_offset,
       COUNT(*) AS n_active,
       ROUND(CAST(COUNT(*) AS DOUBLE) / s.cohort_size, 4) AS retention
FROM activity a JOIN sizes s ON s.cohort_day = a.cohort_day
WHERE a.day_offset <= 14
GROUP BY a.cohort_day, a.day_offset, s.cohort_size
""",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, and
    for each day offset (0..14) the count and share of the cohort
    active that day — THE longitudinal engagement report.

    Scale shape: first-seen is one user-keyed aggregate; activity
    dedups to (user, day) rows (map-side distinct partials); the
    cohort join is user-keyed on already-aggregated rows, and cohort
    sizes ride back as a broadcast onto the cohort×offset-sized
    result. Nothing fact-sized shuffles twice."""
    days = spark.table("events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    # users-sized; BOTH consumers (activity join, cohort sizes) read
    # the materialized rows — one fact scan by construction
    firsts = (
        days.groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
        .localCheckpoint()
    )
    activity = (
        days.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 14)
        .distinct()
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"),
                4,
            ).alias("retention"),
        )
    )


@register(
    "q_funnel_latency",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
  FROM events GROUP BY 1
),
lat AS (
  SELECT epoch(t_buy) - epoch(t_view) AS secs
  FROM firsts
  WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy >= t_view
)
SELECT COUNT(*) AS n_converted,
       ROUND(quantile_cont(secs, 0.5), 4) AS p50_secs,
       ROUND(quantile_cont(secs, 0.9), 4) AS p90_secs
FROM lat
""",
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert percentiles: seconds from a user's first view
    to their first purchase (users whose first purchase follows their
    first view), p50/p90 exact — the funnel report's missing HOW-LONG
    axis.

    Scale shape: first-touch timestamps fold in ONE user-keyed
    conditional-MIN aggregation (map-side combined); latencies are a
    users-sized frame, and the percentiles run through the
    bounded-memory exact machinery (functions/quantiles.py, empty
    group list) — no percentile aggregation buffer holds the latency
    set even when "users-sized" means billions."""
    from pyanamo_spark.functions.quantiles import exact_group_percentiles

    ev = spark.table("events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_buy"),
    )
    lat = firsts.filter(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_view"))
    ).select(
        (
            F.unix_micros(F.col("t_buy").cast("timestamp"))
            - F.unix_micros(F.col("t_view").cast("timestamp"))
        ).cast("double").alias("secs_us")
    ).select((F.col("secs_us") / 1e6).alias("secs"))
    lat = lat.localCheckpoint()  # two consumers: count + percentile fit
    pct = exact_group_percentiles(
        lat, [], "secs", {"p50_secs": 0.5, "p90_secs": 0.9}
    )
    n = lat.agg(F.count("*").alias("n_converted"))
    return n.crossJoin(F.broadcast(pct)).select(
        "n_converted",
        F.round("p50_secs", 4).alias("p50_secs"),
        F.round("p90_secs", 4).alias("p90_secs"),
    )


# ---------------------------------------------------------------------
# A/B experiment analysis

_AB_ORACLE = """
WITH assigned AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1)
                   < '8' THEN 'control' ELSE 'treatment' END AS variant,
         value
  FROM events WHERE event_type = 'purchase'
),
stats AS (
  SELECT variant, COUNT(*) AS n, AVG(value) AS mean,
         VAR_SAMP(value) AS var
  FROM assigned GROUP BY variant
),
wide AS (
  SELECT
    MAX(CASE WHEN variant = 'control' THEN n END) AS n_c,
    MAX(CASE WHEN variant = 'control' THEN mean END) AS mean_c,
    MAX(CASE WHEN variant = 'control' THEN var END) AS var_c,
    MAX(CASE WHEN variant = 'treatment' THEN n END) AS n_t,
    MAX(CASE WHEN variant = 'treatment' THEN mean END) AS mean_t,
    MAX(CASE WHEN variant = 'treatment' THEN var END) AS var_t
  FROM stats
)
SELECT CAST(n_c AS BIGINT) AS n_control, CAST(n_t AS BIGINT) AS n_treatment,
       ROUND(mean_c, 4) AS mean_control, ROUND(mean_t, 4) AS mean_treatment,
       ROUND(mean_t - mean_c, 4) AS lift,
       ROUND((mean_t - mean_c) / SQRT(var_c / n_c + var_t / n_t), 4)
         AS z_score
FROM wide
"""


@register("q_ab_test", oracle=_AB_ORACLE)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: hash users into control/treatment
    (engine-portable md5 split, salted ':ab' so assignment is
    independent of every other hash draw in the pipeline), compare
    purchase values with a Welch z-score. One aggregation to
    2 variant rows, then scalar arithmetic — the experiment readout
    costs the same at any event volume. (The synthetic fixture has no
    real treatment effect, so z lands near 0 — the null behaving as
    a null is the correct readout.)"""
    assigned = (
        spark.table("events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.substring(
                    F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))),
                    1,
                    1,
                )
                < "8",
                "control",
            )
            .otherwise("treatment")
            .alias("variant"),
            "value",
        )
    )
    stats = assigned.groupBy("variant").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("var"),
    )
    wide = stats.agg(
        F.max(F.when(F.col("variant") == "control", F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("variant") == "control", F.col("mean"))).alias("mean_c"),
        F.max(F.when(F.col("variant") == "control", F.col("var"))).alias("var_c"),
        F.max(F.when(F.col("variant") == "treatment", F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("variant") == "treatment", F.col("mean"))).alias("mean_t"),
        F.max(F.when(F.col("variant") == "treatment", F.col("var"))).alias("var_t"),
    )
    lift = F.col("mean_t") - F.col("mean_c")
    z = lift / F.sqrt(
        F.col("var_c") / F.col("n_c") + F.col("var_t") / F.col("n_t")
    )
    return wide.select(
        F.col("n_c").cast("long").alias("n_control"),
        F.col("n_t").cast("long").alias("n_treatment"),
        F.round("mean_c", 4).alias("mean_control"),
        F.round("mean_t", 4).alias("mean_treatment"),
        F.round(lift, 4).alias("lift"),
        F.round(z, 4).alias("z_score"),
    )


@register(
    "q_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
isl AS (
  SELECT user_id,
         DATEDIFF('day', DATE '1970-01-01', day)
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM days
),
st AS (
  SELECT user_id, island, COUNT(*) AS len FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       COUNT(*) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak
FROM st
GROUP BY user_id
""",
)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity streaks per user (gaps-and-islands): consecutive
    active days collapse into islands via the classic day-number −
    row-number trick; per user, the active-day count, streak count,
    and the longest streak — the engagement shape a retention model
    features on.

    Scale shape: distinct (user, day) first (map-side combine bounds
    the stream at entity-days), then ONE per-user window (the same
    exchange every sequence op pays, reused by the island groupBy via
    the shared user_id prefix) and two entity-bounded aggregations.
    No self-join — the naive "join each day to the next" form is
    quadratic per user.
    """
    days = (
        spark.table("events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    island = (
        F.datediff("day", F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w)
    )
    streaks = (
        days.select("user_id", island.alias("island"))
        .groupBy("user_id", "island")
        .agg(F.count("*").alias("len"))
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count("*").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
    )


@register(
    "q_survival",
    oracle="""
WITH bounds AS (SELECT MAX(ts) AS mx FROM events),
u AS (
  SELECT user_id,
         DATEDIFF('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
           AS dur,
         CASE WHEN MAX(ts) < (SELECT mx FROM bounds) - INTERVAL 7 DAY
              THEN 1 ELSE 0 END AS observed
  FROM events GROUP BY user_id
),
tot AS (SELECT COUNT(*) AS n FROM u),
d AS (
  SELECT dur,
         COUNT(CASE WHEN observed = 1 THEN 1 END) AS deaths,
         COUNT(*) AS leaving
  FROM u GROUP BY dur
),
km AS (
  SELECT dur, deaths,
         (SELECT n FROM tot)
           - COALESCE(SUM(leaving) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS at_risk
  FROM d
)
SELECT dur AS duration_days,
       CAST(deaths AS BIGINT) AS deaths,
       CAST(at_risk AS BIGINT) AS at_risk,
       CASE WHEN MAX(CASE WHEN deaths >= at_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY dur) = 1
            THEN 0.0
            ELSE ROUND(EXP(SUM(
                   CASE WHEN deaths < at_risk
                        THEN LN(1 - deaths * 1.0 / at_risk)
                        ELSE 0 END) OVER (ORDER BY dur)), 6)
       END AS survival
FROM km
""",
)
def q_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes: duration =
    days between a user's first and last event; users still active
    within 7 days of the corpus end are right-censored (they count in
    the at-risk denominator but never as churn). S(t) multiplies
    (1 − d/n) over event times — computed as exp of a running log-sum
    so the cumulative product is one ordered window, with an explicit
    zero once the at-risk set is exhausted (log of zero never
    evaluates on either engine).

    Scale shape: per-user min/max is one entity-bounded aggregation;
    everything after runs on the DURATIONS-sized table (distinct
    day-counts), where the global ordered windows are the documented
    bounded-model exception. The censor cutoff is a 1-row broadcast
    scalar, not a driver round-trip.
    """
    events = spark.table("events")
    bounds = events.agg(F.max("ts").alias("mx"))
    u = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .join(F.broadcast(bounds))
        .select(
            F.datediff(F.to_date("last_ts"), F.to_date("first_ts")).alias(
                "dur"
            ),
            F.when(
                F.col("last_ts")
                < F.col("mx") - F.expr("INTERVAL 7 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("observed"),
        )
    )
    d = u.groupBy("dur").agg(
        F.count(F.when(F.col("observed") == 1, 1)).alias("deaths"),
        F.count("*").alias("leaving"),
    )
    tot = u.agg(F.count("*").alias("n"))
    w_prev = (
        Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.orderBy("dur")
    km = d.join(F.broadcast(tot)).select(
        "dur",
        "deaths",
        (
            F.col("n") - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("at_risk"),
    )
    factor = F.when(
        F.col("deaths") < F.col("at_risk"),
        F.log(1 - F.col("deaths") / F.col("at_risk")),
    ).otherwise(F.lit(0.0))
    exhausted = F.max(
        F.when(F.col("deaths") >= F.col("at_risk"), 1).otherwise(0)
    ).over(w_run)
    return km.select(
        F.col("dur").alias("duration_days"),
        F.col("deaths").cast("long").alias("deaths"),
        F.col("at_risk").cast("long").alias("at_risk"),
        F.when(exhausted == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(factor).over(w_run)), 6))
        .alias("survival"),
    )


@register(
    "q_ltv",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY 1
),
rev AS (
  SELECT f.cohort_day,
         datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
         SUM(e.value) AS period_rev
  FROM events e JOIN firsts f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND datediff('day', f.cohort_day, CAST(e.ts AS DATE)) <= 14
  GROUP BY 1, 2
),
sizes AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM firsts GROUP BY 1)
SELECT r.cohort_day, r.day_offset,
       ROUND(r.period_rev, 2) AS period_revenue,
       ROUND(SUM(r.period_rev) OVER w, 2) AS cum_revenue,
       ROUND(SUM(r.period_rev) OVER w / s.cohort_size, 4) AS ltv_per_user
FROM rev r JOIN sizes s ON s.cohort_day = r.cohort_day
WINDOW w AS (PARTITION BY r.cohort_day ORDER BY r.day_offset)
""",
)
def q_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: purchase revenue by cohort and
    day offset (0..14), cumulated into the running LTV per cohort
    user — the financial twin of q_retention's engagement matrix
    (retention says who came back; this says what coming back was
    worth).

    Scale shape: mirrors q_retention — one user-keyed aggregate for
    cohort assignment, a user-keyed join of already-filtered purchase
    facts, a cohort×offset-sized revenue aggregate, a broadcast of
    cohort sizes, and the cumulative window runs over the bounded
    cohort grid (≤15 offsets per cohort), never the facts.
    """
    events = spark.table("events")
    days = events.select("user_id", F.to_date("ts").alias("day"))
    firsts = (
        days.groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
        .localCheckpoint()
    )
    rev = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("day"), "value")
        .join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
            "value",
        )
        .filter(F.col("day_offset") <= 14)
        .groupBy("cohort_day", "day_offset")
        .agg(F.sum("value").alias("period_rev"))
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("period_rev").over(w)
    return rev.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        F.round("period_rev", 2).alias("period_revenue"),
        F.round(cum, 2).alias("cum_revenue"),
        F.round(cum / F.col("cohort_size"), 4).alias("ltv_per_user"),
    )
