"""Window functions — the timeKeeper rolling average plus the ranking
suite the rebuild exposes natively (SURVEY.md §2.5, §2.10 X7).

Scale notes: every window here partitions by a high-cardinality key
(user_id, order status) so state is bounded per partition; none uses a
global ORDER BY without PARTITION BY (which would funnel 100 TB through
one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pyanamo_spark.registry import register


def rank_width(df: DataFrame) -> int:
    """Width of the global-rank range exchange.

    The pattern exists to avoid the single-task global window, so its
    parallelism must track the input rather than a constant: at 100 TB
    a fixed 32 would put ~3 TB in every range partition and cap the
    per-partition sorts at 32 concurrent tasks on a thousand-core
    cluster. We take the max of the input's own partition count (scan
    splits grow with data volume) and the session shuffle width (the
    floor the user sized for this cluster), so tiny fixtures keep
    their current plans while big inputs fan out with their scans.
    The driver-side offset table is one integer pair per partition —
    still negligible at any realistic width.
    """
    try:
        shuffle = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except (TypeError, ValueError):  # e.g. "auto" under some AQE configs
        shuffle = 200
    return max(df.rdd.getNumPartitions(), shuffle, 1)


def global_rank_frame(
    df: DataFrame,
    *keys: str,
    base: int = 0,
    extra: tuple[str, ...] = (),
    width: int | None = None,
) -> DataFrame:
    """(keys…, extra…, rank): contiguous global ranks of ``keys``,
    ``base``-based; ``extra`` columns ride along unexamined.

    Accepts a compound order key (e.g. score with a unique tiebreak);
    ranks follow the lexicographic order of ``keys``. Descending
    orders negate the key on the way in (callers re-negate on the way
    out) — exact for counts and all finite doubles.

    The scale shape for global numbering (the naive ``row_number()``
    over an unpartitioned window collapses the table into ONE task):

      1. ``repartitionByRange`` on the order key — one range exchange,
         partition p holds keys strictly below partition p+1; width
         from :func:`rank_width`, never a constant
      2. per-partition ``row_number`` (partitioned by
         ``spark_partition_id``, so every window sort fits one task)
      3. per-partition row counts — #partitions integers — cumulated
         into offsets by a triangular self-join over that tiny frame
         and broadcast back

    rank = offset(p) + local row_number − 1 + base. Deterministic for
    a unique key, hence oracle-exact against ``ROW_NUMBER() OVER
    (ORDER BY key)``. Nothing leaves its partition after the single
    range exchange.

    The whole thing is ONE lazy plan (r10 — the r07 form ran an eager
    ``localCheckpoint`` plus a driver ``collect`` of the counts: two
    extra job rounds, ~0.8 s per call at sf0.1). Both consumers of the
    range exchange — the pid-count aggregate and the ranking pass —
    canonicalize identically when their projections match, so runtime
    ReuseExchange reads ONE shuffle and ``spark_partition_id`` is
    trivially consistent between them.
    ``tests/test_views.py`` pins the reuse in every registered
    consumer's EXECUTED plan.

    Reuse is an optimizer behavior, not a guarantee (ADVICE r10): a
    diverging projection (column pruning of ``extra`` on the count
    side), an AQE re-plan, or a Spark upgrade could silently recompute
    the exchange, and RangePartitioner's reservoir seed derives from
    the RDD id — a recomputed exchange may sample DIFFERENT boundaries
    and the two passes then disagree on pid→range mapping. So ranks
    carry a runtime guard: the broadcast offsets row also carries each
    pid's counted ``n``, and the rank expression raises if any local
    row_number exceeds it. The offsets attach via a LEFT join (ADVICE
    r11): an inner join would silently DROP rows that a recomputed
    exchange routed to a pid the count pass saw as empty (no offsets
    row at all), so a null ``n`` raises too. With both checks, any
    pid-count disagreement over the same N rows either lands a row on
    an uncounted pid (null ``n``) or overfills a counted one
    (``local > n``) — corruption surfaces as a loud error, never as
    silently wrong ranks or silently missing rows; the cost is one
    codegen'd branch per row.

    ``width``: callers ranking an AGGREGATE output should pass the
    session shuffle width — an agg's output is at most that wide by
    construction, and :func:`rank_width`'s ``df.rdd`` probe compiles
    the whole physical plan (~0.3 s of pure planning per call at
    sf0.1) just to learn it. Leave None for data-sized inputs (scans),
    where the probe's input tracking is the point.

    Range-partitioner caveat: ``repartitionByRange`` runs a SAMPLING
    pass over its child before the shuffle, so an expensive lineage
    (a corpus aggregation) computes twice per action — callers should
    ``persist()`` such inputs first (the sampling job then populates
    the cache and the main job reads it; q_zipf does this). At 100 TB
    the vocabulary you are ranking is worth materializing anyway.
    """
    ranged = (
        df.select(*keys, *extra)
        .repartitionByRange(width or rank_width(df), *keys)
        .withColumn("pid", F.spark_partition_id())
    )
    pidc = ranged.groupBy("pid").agg(F.count("*").alias("n"))
    # offsets via a triangular join on the #partitions-sized count
    # frame: offset(p) = sum of counts of partitions before p — no
    # driver round-trip, no unpartitioned window. Each pid's own count
    # rides along for the runtime consistency guard below.
    offsets = (
        pidc.alias("x")
        .join(
            pidc.select(
                F.col("pid").alias("ypid"), F.col("n").alias("yn")
            ),
            F.col("ypid") < F.col("x.pid"),
            "left",
        )
        .groupBy(F.col("x.pid").alias("pid"), F.col("x.n").alias("n"))
        .agg(F.coalesce(F.sum("yn"), F.lit(0)).alias("offset"))
    )
    w = W.partitionBy("pid").orderBy(*keys)
    rank = (F.col("offset") + F.col("local") - 1 + F.lit(base)).cast(
        "long"
    )
    # loud-failure guard (ADVICE r10/r11): if the count pass and the
    # ranking pass ever see DIFFERENT range boundaries (exchange reuse
    # silently failing + reservoir re-sampling), either some partition
    # holds more rows than its broadcast count (local > n) or a row
    # lands on a pid the count pass never saw (left-join miss, n IS
    # NULL — an inner join here would silently drop such rows before
    # the guard could fire). Raise on both, never emit corrupt ranks.
    guarded = F.when(F.col("local") <= F.col("n"), rank).otherwise(
        F.raise_error(
            F.format_string(
                "global_rank_frame pid consistency violated: partition "
                "%s holds row %s but counted %s — the range exchange "
                "was recomputed with different boundaries (ReuseExchange "
                "failed); ranks would be silently wrong",
                F.col("pid"),
                F.col("local"),
                F.coalesce(F.col("n").cast("string"), F.lit("NULL (pid unseen by count pass)")),
            )
        ).cast("long")
    )
    return (
        ranged.join(F.broadcast(offsets), "pid", "left")
        .withColumn("local", F.row_number().over(w))
        .select(*keys, *extra, guarded.alias("rank"))
    )


@register(
    "q_rolling_avg",
    oracle="""
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 14 PRECEDING AND CURRENT ROW
       ), 6) AS rolling_avg
FROM events
""",
)
def q_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 timeKeeper semantics (timeKeeper.py:50-58): running average
    of the last ≤15 elapsed times, used to predict whether the next
    task fits the wall-time budget. Expressed as a bounded rows window
    per user over the events fixture."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-14, W.currentRow)
    )
    return spark.table("events").select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("rolling_avg"),
    )


@register(
    "q_window_rank",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       ROW_NUMBER() OVER (
         PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
       ) AS rn,
       RANK() OVER (
         PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
       ) AS rnk
FROM orders
QUALIFY rn <= 5
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 ranking: top-5 orders by price per status. row_number with a
    key tiebreak keeps the result deterministic for the oracle."""
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        spark.table("orders")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "q_window_lag",
    oracle="""
SELECT event_id, user_id,
       ROUND(value - LAG(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta_prev,
       LEAD(event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
""",
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 lag/lead: per-user deltas between consecutive events."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return spark.table("events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_event_window",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def q_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 monitoring loop, batch-equivalent form (manager.py:220-237):
    tumbling hourly counts per event type. The Structured Streaming
    variant (same aggregation over readStream + watermark) lives in
    pyanamo_spark.streaming.monitor; this batch shape is what the
    DuckDB oracle can check (SURVEY §7.4.6)."""
    return (
        spark.table("events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "q_sliding_window",
    oracle="""
WITH hits AS (
  SELECT e.user_id, e.value,
         time_bucket(INTERVAL 15 MINUTE, e.ts)
           - t.k * INTERVAL 15 MINUTE AS window_start
  FROM events e, unnest([0, 1, 2, 3]) AS t(k)
  WHERE e.ts < time_bucket(INTERVAL 15 MINUTE, e.ts)
              - t.k * INTERVAL 15 MINUTE + INTERVAL 1 HOUR
)
SELECT window_start,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 2) AS total_value
FROM hits
GROUP BY 1
""",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window traffic profile: 1-hour windows advancing every
    15 minutes (each event lands in 4 overlapping windows), with event
    count, distinct users, and value total per window — the
    overlapping-window shape ``q_event_window``'s tumbling hour can't
    express and the batch twin of a ``readStream`` + ``F.window(ts,
    '1 hour', '15 minutes')`` streaming aggregation.

    Scale shape: ``F.window`` expands each row to its 4 windows
    map-side (a bounded ×(duration/slide) fan-out of narrow rows, no
    self-join against a window table); the distinct-user count is the
    standard two-phase Expand aggregation. The oracle replays the
    same expansion with epoch-aligned ``time_bucket`` arithmetic —
    Spark aligns window starts to the epoch on the slide interval,
    so the window sets agree exactly."""
    w = F.window(F.col("ts").cast("timestamp"), "1 hour", "15 minutes")
    return (
        spark.table("events")
        .groupBy(w.alias("w"), )
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "n_users",
            "total_value",
        )
    )


@register(
    "q_global_ids",
    oracle="""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS global_id
FROM documents
""",
)
def q_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row numbering at scale.

    The naive form — ``row_number()`` over a window with no
    partitionBy — collapses the entire table into ONE task (Spark even
    warns); at 100 TB it simply never finishes. The scale shape keeps
    the sort distributed:

      1. ``repartitionByRange`` on the order key: one range exchange,
         partition p holds keys strictly below partition p+1
      2. a per-partition ``row_number`` (partitioned by
         ``spark_partition_id``, so every window fits one task)
      3. per-partition row counts — a count per partition id, driver
         cumsum over #partitions integers — become offsets, joined
         back as a broadcast

    global_id = offset(p) + local rank. Deterministic for a unique
    order key, hence oracle-exact against ROW_NUMBER. The offset
    table is bounded by partition count, not data size; nothing else
    leaves its partition after the single range exchange. Shared
    machinery: :func:`global_rank_frame` (exchange width tracks the
    input via :func:`rank_width`, never a constant).
    """
    return global_rank_frame(
        spark.table("documents"), "doc_id", base=1
    ).withColumnRenamed("rank", "global_id")


@register(
    "q_rolling_median",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate,
       ROUND(CAST(quantile_cont(o_totalprice, 0.5) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 3) AS rolling_median
FROM orders
""",
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of order value over each customer's last
    ≤7 orders — the robust centre-line a spend-anomaly monitor tracks
    (median shrugs off the one-off spike that drags a rolling mean).

    Spark has no exact-median window function; the frame here is
    BOUNDED (7 rows), so the scale-safe expression is collect_list
    over the rows frame → array_sort → midpoint (mean of the two
    middle values when the frame is even) — O(frame) per row, never
    O(history), and the per-user window is the same single exchange
    every sequence operator pays. An UNBOUNDED frame would need the
    running-sketch path instead (functions/quantiles.py); this
    operator deliberately pins the exact-bounded-frame variant.
    """
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, W.currentRow)
    )
    arr = F.array_sort(F.collect_list(F.col("o_totalprice")).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, (F.floor((n - 1) / 2) + 1).cast("int"))
    hi = F.element_at(arr, (F.floor(n / 2) + 1).cast("int"))
    return spark.table("orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        # round to 3, not 2: the even-frame midpoint of two 2-decimal
        # prices sits exactly on a .xx5 rounding tie, where engine
        # ROUND semantics diverge; the 3rd decimal is tie-free
        F.round(((lo + hi) / 2).cast("double"), 3).alias("rolling_median"),
    )
