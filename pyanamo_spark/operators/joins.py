"""Joins — the reference's single enrichment join plus the full Spark
join family the rebuild gets natively (SURVEY.md §2.3, §2.10 X6).

Scale notes (100 TB):
  - J1's dimension (job states) is tiny → explicit ``broadcast()``; the
    fact side never shuffles.
  - The equi-join suite joins fact tables on their keys; AQE picks
    broadcast vs sort-merge at runtime, and nation/region dims are
    hinted broadcast.
  - The range join is expressed as fact × broadcast-banded dim — the
    scalable pattern for banding (a shuffle range-join on 100 TB would
    be a cross-product disaster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pyanamo_spark.registry import register


@register(
    "q_state_join",
    oracle="""
SELECT COALESCE(j.job_status, 'ERROR_FETCHING') AS job_status,
       COUNT(*) AS n_items,
       string_agg(t.itemID, ',' ORDER BY t.itemID) AS items
FROM (
  SELECT itemID,
         regexp_replace(InstanceID, '-([^-]*)$', ':\\1') AS jobID
  FROM tasks
  WHERE ItemState = 'locked' AND InstanceID <> 'NULL'
) t
LEFT JOIN job_states j ON t.jobID = j.jobID
GROUP BY 1
""",
    needs_views=("tasks", "job_states"),
)
def q_state_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 getItem_JobStates (manager.py:943-995): project locked items,
    derive jobID from InstanceID by string surgery — split on '-',
    rejoin, ':' + last token (manager.py:977-978) — then enrich with
    job states and bucket counts per status (manager.py:985-992).

    The reference probes AWS Batch once per row; here it is one
    broadcast left join against the job-state dimension, so 100 TB of
    locked items never shuffles.
    """
    tasks = spark.table("tasks")
    derived = (
        tasks.filter(
            (F.col("ItemState") == "locked") & (F.col("InstanceID") != "NULL")
        )
        .withColumn("parts", F.split("InstanceID", "-"))
        .withColumn(
            "jobID",
            F.concat_ws(
                ":",
                F.array_join(F.slice("parts", 1, F.size("parts") - 1), "-"),
                F.element_at("parts", -1),
            ),
        )
        .select("itemID", "jobID")
    )
    job_states = spark.table("job_states")
    return (
        derived.join(F.broadcast(job_states), "jobID", "left")
        .withColumn(
            "job_status", F.coalesce(F.col("job_status"), F.lit("ERROR_FETCHING"))
        )
        .groupBy("job_status")
        .agg(
            F.count("*").alias("n_items"),
            F.array_join(F.sort_array(F.collect_list("itemID")), ",").alias(
                "items"
            ),
        )
    )


@register(
    "q_map_align",
    oracle="""
SELECT itemID, nestID, script, stdout
FROM nests
WHERE status = 'done'
""",
    needs_views=("tasks", "nests"),
)
def q_map_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 Log↔TaskScript key alignment (modifier.py:226-237,
    managing-item-logs.py:61-71): the reference pairs two parallel maps
    by Task_i key. In the exploded child-table model both maps land on
    the SAME row keyed (itemID, nestID), so the alignment "join"
    collapses to a filter + projection — zero shuffles, one derivation
    of the nests view instead of two (the naive scripts⨝logs self-join
    re-derives the view, including its stdout reconstruction, on both
    sides and shuffles each). The genuine distributed join shapes live
    in q_join_* / q_state_join."""
    return (
        spark.table("nests")
        .filter(F.col("status") == "done")
        .select("itemID", "nestID", "script", "stdout")
    )


@register(
    "q_join_equi",
    oracle="""
SELECT n.n_name,
       COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS total_revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q_join_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 equi-join chain: orders ⨝ customer ⨝ nation → revenue per
    nation. nation is broadcast (25 rows); orders⨝customer is a key
    shuffle AQE can convert to broadcast at small SF."""
    orders = spark.table("orders")
    customer = spark.table("customer")
    nation = spark.table("nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


@register(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
)
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 left-semi: customers having at least one finished order.
    Semi-join ships no payload columns from the probe side."""
    customer = spark.table("customer")
    orders = spark.table("orders").filter(F.col("o_orderstatus") == "F")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 left-anti: customers with no orders (the delete-by-id shape
    M11 also uses, manager.py:690-723)."""
    customer = spark.table("customer")
    orders = spark.table("orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_join_asof",
    oracle="""
WITH sub AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
  FROM events
  WHERE event_type IN ('click', 'purchase')
), m AS (
  SELECT *,
         LAST_VALUE(CASE WHEN side = 0 THEN us END IGNORE NULLS)
           OVER w AS last_click_us,
         LAST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
           OVER w AS last_click_id
  FROM sub
  WINDOW w AS (PARTITION BY user_id ORDER BY us, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id, us AS purchase_us,
       last_click_us, last_click_id
FROM m WHERE side = 1
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (X6 extension): each purchase matched to the SAME
    user's latest click at-or-before it — the attribution shape pandas
    spells merge_asof and time-series stores spell ASOF JOIN.

    Expressed as the sorted-merge form, not a join: both sides interleave
    in one window ordered (ts, side, event_id) per user, and a running
    last-ignoring-nulls over the click-only columns is exactly "most
    recent right row ≤ t". One hash shuffle on user_id + an in-partition
    sort; the naive inequality join is clicks × purchases per user
    before its max — a per-key cross product no 100 TB plan survives.
    Ties: a click at the purchase's exact microsecond matches (side
    orders clicks first); equal-time clicks resolve to max event_id.
    Per-user history length bounds partition memory; production bounds
    it further by time-slicing with carried-over last-click state.
    """
    sub = (
        spark.table("events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.when(F.col("event_type") == "purchase", F.lit(1))
            .otherwise(F.lit(0))
            .alias("side"),
        )
    )
    w = W.partitionBy("user_id").orderBy("us", "side", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    click_only = lambda c: F.when(F.col("side") == 0, F.col(c))
    return (
        sub.withColumn(
            "last_click_us", F.last(click_only("us"), ignorenulls=True).over(w)
        )
        .withColumn(
            "last_click_id",
            F.last(click_only("event_id"), ignorenulls=True).over(w),
        )
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("us").alias("purchase_us"),
            "last_click_us",
            "last_click_id",
        )
    )


@register(
    "q_join_range",
    oracle="""
WITH bands AS (
  SELECT r_name AS band,
         900.0 + r_regionkey * 20.0 AS lo,
         900.0 + (r_regionkey + 1) * 20.0 AS hi
  FROM region
)
SELECT b.band,
       COUNT(*) AS n_parts,
       ROUND(AVG(p.p_retailprice), 4) AS avg_price
FROM part p
JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band
""",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 range (non-equi) join: parts banded by retail-price interval.
    The band dimension is derived from region (5 rows) and broadcast —
    a nested-loop join against a broadcast side, which is the only
    range-join shape that survives 100 TB (the fact side streams)."""
    part = spark.table("part")
    bands = spark.table("region").select(
        F.col("r_name").alias("band"),
        (F.lit(900.0) + F.col("r_regionkey") * 20.0).alias("lo"),
        (F.lit(900.0) + (F.col("r_regionkey") + 1) * 20.0).alias("hi"),
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


#: fuzzy-lookup probe strings: one substitution, one deletion, one
#: insertion, one case error against fixture customer names — all
#: within edit distance 2 of names present at every scale factor
FUZZY_PROBES = (
    "Custoner#000000042",
    "Customer#00000011",
    "Customer#0000001033",
    "customer#000000007",
)
FUZZY_MAX_DIST = 2


@register(
    "q_fuzzy_match",
    oracle=f"""
SELECT p.probe, c.c_custkey, c.c_name,
       CAST(levenshtein(c.c_name, p.probe) AS INT) AS dist
FROM customer c
CROSS JOIN (VALUES {", ".join(f"('{p}')" for p in FUZZY_PROBES)}) AS p(probe)
WHERE levenshtein(c.c_name, p.probe) <= {FUZZY_MAX_DIST}
""",
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy lookup: resolve typo'd probe names
    against the customer dimension by edit distance ≤ 2.

    The probe set rides in as a broadcast literal table, so the plan
    is ONE scan of the dimension with a codegen'd levenshtein filter —
    no shuffle, no all-pairs. (All-pairs fuzzy self-join is the
    anti-pattern; with a real workload the blocking key — phonetic
    code, name prefix, length band — bounds candidates first. The
    probe-lookup shape here is what a reference user's point-query
    path needs, reference parity: manager.py name-keyed getItem
    calls.)"""
    cust = spark.table("customer")
    dist = F.levenshtein(F.col("c_name"), F.col("probe"))
    # the probe set rides as an exploded literal array — same semantics
    # as a broadcast join against a probe table, minus the exchange
    return (
        cust.select(
            "c_custkey",
            "c_name",
            F.explode(
                F.array(*[F.lit(p) for p in FUZZY_PROBES])
            ).alias("probe"),
        )
        .filter(dist <= FUZZY_MAX_DIST)
        .select(
            "probe",
            "c_custkey",
            "c_name",
            dist.cast("int").alias("dist"),
        )
    )
