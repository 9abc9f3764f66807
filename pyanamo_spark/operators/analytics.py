"""Headline analytical queries over the relational spine — classic
TPC-H shapes exercising the scan→join→aggregate→order→limit pipeline
end-to-end (the "would a warehouse user switch?" queries).

Scale notes: Q1-shape is a pure partial-aggregated scan (no join);
Q3-shape joins two facts on their keys with dimension filters applied
*before* the join so pushdown shrinks both shuffle sides; top-k is
TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.functions.quantiles import exact_group_percentiles
from pyanamo_spark.registry import register


@register(
    "q_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary report — one scan with the
    ship-date filter pushed to parquet, partial aggregation on a
    6-group key; the canonical whole-stage-codegen pipeline."""
    li = spark.table("lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias(
            "sum_charge"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q_revenue_forecast",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS potential_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue-change forecast — a pure
    filter-and-aggregate where every predicate (date range, discount
    band, quantity cap) pushes to the parquet scan; the whole query is
    one codegen'd pipeline with a single-row result."""
    li = spark.table("lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("potential_revenue")
        )
    )


@register(
    "q_local_volume",
    oracle="""
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
               AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
""",
)
def q_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier volume — the 5-table join chain
    with the supplier-nation = customer-nation co-location predicate.
    supplier/nation broadcast; the orders⨝lineitem fact join shuffles
    on the order key only."""
    c = spark.table("customer")
    o = spark.table("orders")
    li = spark.table("lineitem")
    s = spark.table("supplier")
    n = spark.table("nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q_top_orders",
    oracle="""
SELECT o.o_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 open BUILDING-segment orders by revenue.
    The customer filter broadcasts into the orders join; the final
    top-k is TakeOrderedAndProject (no global sort of the aggregate)."""
    cust = (
        spark.table("customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = spark.table("orders").filter(F.col("o_orderstatus") != "F")
    li = spark.table("lineitem")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


#: robust-z threshold — the fixture's price distribution is bounded
#: (max z ~2.0), so 1.95 flags the ~1% tail; heavy-tailed production
#: data uses the conventional 3-3.5
_ROBUST_Z = 1.95


@register(
    "q_outliers",
    oracle=f"""
WITH med AS (
  SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS med
  FROM orders GROUP BY 1
),
mad AS (
  SELECT o.o_orderstatus,
         quantile_cont(abs(o.o_totalprice - m.med), 0.5) AS mad,
         MAX(m.med) AS med
  FROM orders o JOIN med m USING (o_orderstatus)
  GROUP BY 1
)
SELECT o.o_orderkey, o.o_orderstatus,
       ROUND((o.o_totalprice - m.med) / m.mad, 4) AS robust_z
FROM orders o JOIN mad m USING (o_orderstatus)
WHERE m.mad > 0
  AND abs(o.o_totalprice - m.med) > {_ROBUST_Z} * m.mad
""",
)
def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flagging per group: median/MAD instead of
    mean/stddev, so the detector's own statistics cannot be dragged by
    the outliers it hunts — the standard quality-filter shape for
    curation thresholds.

    Two median passes (median, then MAD around it). The group
    statistics are GROUPS-sized models, so — exactly like the IVF
    centroid table — they are collected and ride back into the plan as
    LITERAL maps rather than joined subtrees: leaving them lazy makes
    every downstream consumer re-print (and without exchange reuse,
    re-run) the whole upstream scan, while the literal form keeps the
    final filter a single codegen'd pass over the fact table. Both
    medians go through the bounded-memory sketch-prefilter plan in
    functions/quantiles.py (bit-identical to quantile_cont, so the
    oracle stays green) instead of Spark's exact `percentile`, whose
    per-group buffer holds every value — an OOM with 3 status groups
    over a 100 TB orders table."""
    orders = spark.table("orders")
    med_rows = exact_group_percentiles(
        orders, ["o_orderstatus"], "o_totalprice", {"med": 0.5}
    ).collect()  # bounded: one row per o_orderstatus group
    # a null group key would be a null MAP key — a runtime error in
    # Spark. Null-status rows can never match the oracle's JOIN USING
    # anyway, so dropping the null group (not the whole query) is the
    # semantics-preserving guard.
    med_rows = [r for r in med_rows if r["o_orderstatus"] is not None]
    if not med_rows:  # empty table: no groups, no outliers
        return orders.select(
            "o_orderkey",
            "o_orderstatus",
            F.lit(0.0).alias("robust_z"),
        ).filter(F.lit(False))
    med_map = F.create_map(
        *[
            F.lit(x)
            for r in med_rows
            for x in (r["o_orderstatus"], float(r["med"]))
        ]
    )
    dev = orders.withColumn("med", med_map[F.col("o_orderstatus")]).withColumn(
        "dev", F.abs(F.col("o_totalprice") - F.col("med"))
    )
    mad_rows = exact_group_percentiles(
        dev, ["o_orderstatus"], "dev", {"mad": 0.5}
    ).collect()
    mad_rows = [r for r in mad_rows if r["o_orderstatus"] is not None]
    mad_map = F.create_map(
        *[
            F.lit(x)
            for r in mad_rows
            for x in (r["o_orderstatus"], float(r["mad"]))
        ]
    )
    med_c = med_map[F.col("o_orderstatus")]
    mad_c = mad_map[F.col("o_orderstatus")]
    return (
        orders.filter(
            (mad_c > 0)
            & (F.abs(F.col("o_totalprice") - med_c) > _ROBUST_Z * mad_c)
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(
                (F.col("o_totalprice") - med_c) / mad_c, 4
            ).alias("robust_z"),
        )
    )


FUNNEL_STAGES = ("view", "click", "purchase")


@register(
    "q_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t
  GROUP BY e.user_id
)
SELECT stage, stage_no, n_users FROM (
  SELECT 'view' AS stage, 1 AS stage_no, COUNT(*) AS n_users FROM v
  UNION ALL
  SELECT 'click', 2, COUNT(*) FROM c
  UNION ALL
  SELECT 'purchase', 3, COUNT(*) FROM p
)
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view → click → purchase, strictly
    increasing timestamps): how many users reach each stage.

    One shuffle total: everything is windows over a single
    user-partitioned time sort. The running min of view-times makes
    "click after first view" a per-row predicate (the running min at
    any click row already equals the user's global first view, or is
    NULL if none happened yet), the whole-partition min of those
    qualifying clicks feeds the purchase predicate, and the final
    per-user rollup reuses the same partitioning, so Catalyst plans
    zero additional exchanges. The driver-side shape a reference user
    would write — three self-joins — is what the oracle runs."""
    from pyspark.sql import Window as W

    ev = spark.table("events").select("user_id", "ts", "event_type")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("user_id")
    is_type = lambda t: F.col("event_type") == t  # noqa: E731
    first_view_sofar = F.min(F.when(is_type("view"), F.col("ts"))).over(w_run)
    ev = ev.withColumn(
        "_click_ok",
        F.when(is_type("click") & (F.col("ts") > first_view_sofar), F.col("ts")),
    )
    first_click = F.min("_click_ok").over(w_all)
    ev = ev.withColumn(
        "_purchase_ok",
        F.when(is_type("purchase") & (F.col("ts") > first_click), F.col("ts")),
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(is_type("view"), F.col("ts"))).alias("_tv"),
        F.min("_click_ok").alias("_tc"),
        F.min("_purchase_ok").alias("_tp"),
    )
    counts = per_user.agg(
        F.count("_tv").alias("_nv"),
        F.count("_tc").alias("_nc"),
        F.count("_tp").alias("_np"),
    )
    stages = F.array(
        F.struct(F.lit("view").alias("stage"), F.lit(1).alias("stage_no"), F.col("_nv").alias("n_users")),
        F.struct(F.lit("click").alias("stage"), F.lit(2).alias("stage_no"), F.col("_nc").alias("n_users")),
        F.struct(F.lit("purchase").alias("stage"), F.lit(3).alias("stage_no"), F.col("_np").alias("n_users")),
    )
    return counts.select(F.explode(stages).alias("s")).select(
        "s.stage", "s.stage_no", "s.n_users"
    )


@register(
    "q_table_stats",
    oracle="""
SELECT 'o_orderkey' AS col,
       COUNT(o_orderkey) AS n_rows,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(o_custkey), COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       CAST(ROUND(MIN(o_totalprice), 2) AS VARCHAR),
       CAST(ROUND(MAX(o_totalprice), 2) AS VARCHAR)
FROM orders
""",
)
def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics for the orders table: non-null
    count, exact distinct count, min/max per profiled column — the
    stats a cost-based optimizer (or a pipeline owner sizing a join)
    reads. ONE scan and ONE aggregation for all profiled columns:
    the four exact count(distinct)s share a single Expand rewrite
    (x4 row fan-out map-side, still one exchange pair), and the
    4-column report unpivots from the 1-row aggregate. At 100 TB the
    same query swaps ``count_distinct`` for ``approx_count_distinct``
    (functions/sketches.py HLL) and the Expand disappears — the exact
    form stays oracle-checkable here.

    r12: min/max of the CHAR(1) status column ride the aggregate as
    codepoints (``char(min(ascii(c)))`` — lexicographic order equals
    codepoint order for a single ASCII char, the column's TPC-H spec
    type). A STRING min/max buffer is not mutable-fixed-width, which
    forced the WHOLE Expand rewrite into SortAggregate: two full sorts
    of the x4-expanded rows. With every buffer slot fixed-width the
    plan is pure HashAggregate — 4 Sort nodes -> 0, sf0.1
    2.64 -> 1.15 s, output identical."""
    o = spark.table("orders")
    as_str = lambda c: c.cast("string")  # noqa: E731
    money = lambda c: F.round(c, 2).cast("string")  # noqa: E731
    cols = [
        ("o_orderkey", as_str),
        ("o_custkey", as_str),
        ("o_totalprice", money),
    ]
    agg = o.agg(
        *[
            a
            for c, render in cols
            for a in (
                F.count(c).alias(f"n_{c}"),
                F.count_distinct(F.col(c)).alias(f"d_{c}"),
                render(F.min(c)).alias(f"lo_{c}"),
                render(F.max(c)).alias(f"hi_{c}"),
            )
        ],
        F.count("o_orderstatus").alias("n_o_orderstatus"),
        F.count_distinct(F.col("o_orderstatus")).alias("d_o_orderstatus"),
        F.expr("char(min(ascii(o_orderstatus)))").alias("lo_o_orderstatus"),
        F.expr("char(max(ascii(o_orderstatus)))").alias("hi_o_orderstatus"),
    )
    structs = ",".join(
        f"struct('{c}' AS col, n_{c} AS n_rows, d_{c} AS n_distinct,"
        f" lo_{c} AS min_val, hi_{c} AS max_val)"
        for c in ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    return agg.selectExpr(f"inline(array({structs}))")


#: top keys reported by the skew profile
SKEW_TOP_K = 10


@register(
    "q_skew_profile",
    oracle=f"""
WITH k AS (
  SELECT o_custkey AS key, COUNT(*) AS n
  FROM orders GROUP BY 1
),
t AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM k)
SELECT k.key, k.n,
       ROUND(k.n * 1.0 / t.total, 6) AS share,
       ROUND(k.n * t.n_keys * 1.0 / t.total, 2) AS x_mean
FROM k CROSS JOIN t
ORDER BY k.n DESC, k.key
LIMIT {SKEW_TOP_K}
""",
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis for orders.o_custkey: the top
    {SKEW_TOP_K} heaviest keys with their row share and multiple of
    the mean key size — the report that decides between a plain
    shuffle join, AQE skew splitting, and salting
    (functions/skew.salted_agg) BEFORE the job runs. One
    map-side-combinable key count; the totals ride back as a 1-row
    broadcast; top-k is TakeOrderedAndProject, no global sort."""
    o = spark.table("orders")
    k = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("n")
    )
    t = k.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_keys")
    )
    return (
        k.crossJoin(F.broadcast(t))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(
                F.col("n") * F.col("n_keys") / F.col("total"), 2
            ).alias("x_mean"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(SKEW_TOP_K)
    )


# ---------------------------------------------------------------------
# distribution drift (population stability index per source)

#: fixed n_chars bucketing for the drift report: 10 × 100-char buckets
_DRIFT_BUCKETS, _DRIFT_WIDTH = 10, 100
#: Laplace smoothing so empty buckets don't blow up the log-ratio —
#: identical constant on both engines
_DRIFT_ALPHA = 0.5

_DRIFT_ORACLE = f"""
WITH bucketed AS (
  SELECT source,
         LEAST(n_chars // {_DRIFT_WIDTH}, {_DRIFT_BUCKETS - 1}) AS bucket
  FROM documents
),
per_source AS (
  SELECT source, bucket, COUNT(*) AS n
  FROM bucketed GROUP BY source, bucket
),
grid AS (
  SELECT s.source, b.bucket
  FROM (SELECT DISTINCT source FROM bucketed) s
  CROSS JOIN (SELECT unnest(generate_series(0, {_DRIFT_BUCKETS - 1})) AS bucket) b
),
filled AS (
  SELECT g.source, g.bucket, COALESCE(p.n, 0) AS n
  FROM grid g LEFT JOIN per_source p
    ON g.source = p.source AND g.bucket = p.bucket
),
global_b AS (
  SELECT bucket, SUM(n) AS n FROM filled GROUP BY bucket
),
sized AS (
  SELECT f.source, f.bucket, f.n,
         gb.n - f.n AS n_rest,
         SUM(f.n) OVER (PARTITION BY f.source) AS n_src,
         (SELECT SUM(n) FROM global_b) AS n_all
  FROM filled f JOIN global_b gb USING (bucket)
),
probs AS (
  SELECT source, bucket,
         (n + {_DRIFT_ALPHA})
           / (n_src + {_DRIFT_ALPHA * _DRIFT_BUCKETS}) AS pa,
         (n_rest + {_DRIFT_ALPHA})
           / ((n_all - n_src) + {_DRIFT_ALPHA * _DRIFT_BUCKETS}) AS pb
  FROM sized
)
SELECT source, ROUND(SUM((pa - pb) * ln(pa / pb)), 6) AS psi
FROM probs GROUP BY source
"""


@register("q_drift", oracle=_DRIFT_ORACLE)
def q_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report: population stability index of each
    source's document-length distribution against the REST of the
    corpus — the crawl-batch QA check that flags a source whose
    content shifted before it contaminates a training mix.

    Scale shape: one bucketing aggregation over the corpus →
    (sources × buckets)-sized everything after (dense grid via a
    cross join of two tiny frames, rest-counts by subtracting the
    source's own counts from the broadcast global bucket totals,
    PSI as a per-source fold). Laplace smoothing keeps empty buckets
    finite and is applied identically in both engines.
    """
    bucketed = spark.table("documents").select(
        "source",
        F.least(
            F.floor(F.col("n_chars") / _DRIFT_WIDTH).cast("long"),
            F.lit(_DRIFT_BUCKETS - 1),
        ).alias("bucket"),
    )
    per_source = bucketed.groupBy("source", "bucket").agg(
        F.count("*").alias("n")
    )
    sources = bucketed.select("source").distinct()
    buckets = spark.range(_DRIFT_BUCKETS).select(
        F.col("id").alias("bucket")
    )
    grid = sources.crossJoin(F.broadcast(buckets))
    filled = (
        grid.join(per_source, ["source", "bucket"], "left")
        .fillna(0, subset=["n"])
    )
    global_b = filled.groupBy("bucket").agg(F.sum("n").alias("gn"))
    from pyspark.sql import Window as W

    n_src = F.sum("n").over(W.partitionBy("source"))
    sized = (
        filled.join(F.broadcast(global_b), "bucket")
        .withColumn("n_src", n_src)
        .crossJoin(
            F.broadcast(
                filled.agg(F.sum("n").alias("n_all"))
            )
        )
    )
    pa = (F.col("n") + _DRIFT_ALPHA) / (
        F.col("n_src") + _DRIFT_ALPHA * _DRIFT_BUCKETS
    )
    pb = (F.col("gn") - F.col("n") + _DRIFT_ALPHA) / (
        (F.col("n_all") - F.col("n_src")) + _DRIFT_ALPHA * _DRIFT_BUCKETS
    )
    return (
        sized.withColumn("term", (pa - pb) * F.log(pa / pb))
        .groupBy("source")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
    )


_KS_ORACLE = """
WITH vals AS (
  SELECT source, n_chars AS v FROM documents
),
per_sv AS (
  SELECT source, v, COUNT(*) AS n FROM vals GROUP BY source, v
),
per_v AS (
  SELECT v, SUM(n) AS gn FROM per_sv GROUP BY v
),
grid AS (
  SELECT s.source, pv.v, pv.gn, COALESCE(p.n, 0) AS n
  FROM (SELECT DISTINCT source FROM vals) s
  CROSS JOIN per_v pv
  LEFT JOIN per_sv p ON p.source = s.source AND p.v = pv.v
),
sized AS (
  SELECT source, v,
         SUM(n) OVER (PARTITION BY source ORDER BY v) AS cum_src,
         SUM(gn - n) OVER (PARTITION BY source ORDER BY v) AS cum_rest,
         SUM(n) OVER (PARTITION BY source) AS n_src,
         SUM(gn - n) OVER (PARTITION BY source) AS n_rest
  FROM grid
)
SELECT source,
       ROUND(MAX(ABS(CAST(cum_src AS DOUBLE) / NULLIF(n_src, 0)
                     - CAST(cum_rest AS DOUBLE) / NULLIF(n_rest, 0))), 6)
         AS ks
FROM sized GROUP BY source
"""


@register("q_ks_drift", oracle=_KS_ORACLE)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift: for each source, the max
    ECDF gap of its document-length distribution against the rest of
    the corpus — the binning-free twin of q_drift's PSI (PSI needs
    bucket choices; KS sees any shape difference the buckets blur).

    Scale shape: one (source, value) counting aggregation, the dense
    (sources × distinct-values) grid from two small frames, then the
    ECDFs as cumulative windows per source — everything after the
    first aggregation is grid-sized. Distinct value counts bound the
    state (lengths, scores, and similar profile metrics have small
    value domains; for continuous metrics quantize first — q_drift's
    buckets ARE that quantization)."""
    from pyspark.sql import Window as W

    vals = spark.table("documents").select(
        "source", F.col("n_chars").alias("v")
    )
    per_sv = vals.groupBy("source", "v").agg(F.count("*").alias("n"))
    per_v = per_sv.groupBy("v").agg(F.sum("n").alias("gn"))
    sources = vals.select("source").distinct()
    grid = (
        sources.crossJoin(F.broadcast(per_v))
        .join(per_sv, ["source", "v"], "left")
        .fillna(0, subset=["n"])
    )
    cum = W.partitionBy("source").orderBy("v")
    tot = W.partitionBy("source")
    sized = grid.select(
        "source",
        "v",
        F.sum("n").over(cum).alias("cum_src"),
        F.sum(F.col("gn") - F.col("n")).over(cum).alias("cum_rest"),
        F.sum("n").over(tot).alias("n_src"),
        F.sum(F.col("gn") - F.col("n")).over(tot).alias("n_rest"),
    )
    # NULLIF guards the single-source corpus (empty "rest") — the KS
    # of a population against nothing is undefined, reported as null
    gap = F.abs(
        F.col("cum_src").cast("double")
        / F.nullif(F.col("n_src"), F.lit(0))
        - F.col("cum_rest").cast("double")
        / F.nullif(F.col("n_rest"), F.lit(0))
    )
    return (
        sized.groupBy("source")
        .agg(F.round(F.max(gap), 6).alias("ks"))
    )


@register(
    "q_gini",
    oracle="""
WITH pc AS (
  SELECT o_custkey, SUM(o_totalprice) AS rev FROM orders GROUP BY o_custkey
),
r AS (
  SELECT rev,
         ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rnk,
         COUNT(*) OVER () AS n
  FROM pc
)
SELECT CAST(MAX(n) AS BIGINT) AS n_entities,
       ROUND(2.0 * SUM(rnk * rev) / (MAX(n) * SUM(rev))
             - (MAX(n) + 1.0) / MAX(n), 6) AS gini,
       ROUND(SUM(CASE WHEN rnk > 0.9 * n THEN rev ELSE 0 END)
             / SUM(rev), 6) AS top_decile_share
FROM r
""",
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration diagnostics of customer revenue: the Gini
    coefficient (rank-sum form G = 2·Σ rᵢxᵢ / (n·Σxᵢ) − (n+1)/n over
    ascending values) and the top-decile revenue share — the same
    readout a corpus curator runs per source to spot a crawl
    dominated by a handful of domains.

    Scale shape: revenue collapses to one row per entity first
    (map-combined). The ascending global rank is the one step that
    must not be a naive unpartitioned window; it reuses
    :func:`~pyanamo_spark.operators.windows.global_rank_frame`
    (range exchange with input-tracked width + broadcast offsets).
    The entity count rides along as a 1-row broadcast scalar and the
    Gini fold is ONE single-row aggregation — no Lorenz self-join,
    no driver-side curve.
    """
    from pyanamo_spark.operators.windows import global_rank_frame

    pc = (
        spark.table("orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    ranked = global_rank_frame(
        pc,
        "rev",
        "o_custkey",
        base=1,
        # pc is an aggregate output — at most shuffle-width wide, so
        # skip rank_width's plan-compiling probe (r10)
        width=int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        ),
    )
    total = ranked.agg(F.max("rank").alias("n_total"))
    n = F.max("rank").cast("double")
    return ranked.join(F.broadcast(total)).agg(
        F.max("rank").cast("long").alias("n_entities"),
        F.round(
            2.0 * F.sum(F.col("rank") * F.col("rev")) / (n * F.sum("rev"))
            - (n + 1.0) / n,
            6,
        ).alias("gini"),
        F.round(
            F.sum(
                F.when(
                    F.col("rank") > 0.9 * F.col("n_total"), F.col("rev")
                ).otherwise(0.0)
            )
            / F.sum("rev"),
            6,
        ).alias("top_decile_share"),
    )
