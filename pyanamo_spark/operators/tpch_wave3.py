"""Third wave of warehouse-mart query shapes: the four classic TPC-H
plan shapes the first two waves (analytics.py, tpch_mart.py) do not yet
exercise — Q2 (correlated MIN over a supply relation), Q11 (HAVING
against a global scalar aggregate), Q12 (two-class conditional counts
across a fact join), Q20 (nested aggregate-filtered semi-join chain).

The fixture has no ``partsupp`` table, so Q2/Q11/Q20 derive their
supply/stock relation from ``lineitem`` history (per (partkey, suppkey)
minimum observed unit price / shipped value / shipped quantity) — same
plan shape, derived inventory. No ``l_shipmode`` exists either, so Q12
classifies by ``l_returnflag`` with ``o_orderpriority`` as the
high/low-urgency payload, which preserves Q12's essence: a fact-fact
join feeding CASE-bucketed counts.

Oracle-parity discipline (same as tpch_mart.py): every value that feeds
a MIN-winner selection or threshold comparison is computed in integer
cents per row and aggregated as BIGINT, so winner/cut decisions can
never flip on float summation order. Quantity sums are integral doubles
(exact below 2^53). The Q11 threshold comparison is done entirely in
integers (``v_cents * n_groups > 2 * total_cents``) — no float
division knife-edge; the BIGINT product is bounded far below 2^63 at
any fixture scale (documented in q_important_stock).

Reference parity: north-star extension of SURVEY.md §2 (the reference
has no warehouse queries; BASELINE.json directs this extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyanamo_spark.registry import register


@register(
    "q_min_cost_supplier",
    oracle="""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(ROUND(l_extendedprice / l_quantity * 100) AS BIGINT))
           AS unit_cents
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
eligible AS (
  SELECT sp.l_partkey, sp.l_suppkey, sp.unit_cents,
         s.s_name, s.s_acctbal, n.n_name
  FROM supply sp
  JOIN supplier s ON s.s_suppkey = sp.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
),
best AS (
  SELECT l_partkey, MIN(unit_cents) AS best_cents
  FROM eligible GROUP BY l_partkey
)
SELECT e.s_name, e.n_name, ROUND(e.s_acctbal, 2) AS s_acctbal,
       p.p_partkey, p.p_name,
       ROUND(CAST(e.unit_cents AS DOUBLE) / 100.0, 2) AS unit_price
FROM eligible e
JOIN best b ON b.l_partkey = e.l_partkey AND e.unit_cents = b.best_cents
JOIN part p ON p.p_partkey = e.l_partkey
WHERE p.p_size = 15 AND p.p_type = 'PROMO'
""",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the in-region
    supplier(s) offering the minimum unit cost — the correlated scalar
    MIN subquery, rewritten as aggregate-then-self-join on the derived
    supply relation (per (part, supplier) minimum observed unit price
    from lineitem history; the fixture has no partsupp).

    Scale plan: the supply relation is ONE map-side-combined aggregate
    of lineitem on (partkey, suppkey) — at 100 TB it collapses ~30
    lines per pair before the only fact-sized shuffle, and the fact is
    scanned exactly once. The region filter arrives via a broadcast of
    the (region-filtered) 100-ish-row supplier×nation dim; the winner
    selection is a MIN window over partkey on the supply-sized rows
    (one supply-sized shuffle — NOT the classic aggregate-then-
    self-join, which would print the fact aggregation twice and bet on
    ReuseExchange to avoid a second scan). The part filter broadcasts.
    MIN-winner selection is on integer cents → ties are exact and both
    engines return the identical winner set."""
    li = spark.table("lineitem")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100)
            .cast("long")
        ).alias("unit_cents")
    )
    eu_supp = (
        spark.table("supplier")
        .join(
            F.broadcast(
                spark.table("nation").join(
                    F.broadcast(
                        spark.table("region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = supply.join(
        F.broadcast(eu_supp), supply.l_suppkey == eu_supp.s_suppkey
    )
    best = F.min("unit_cents").over(Window.partitionBy("l_partkey"))
    parts = spark.table("part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    return (
        eligible.withColumn("best_cents", best)
        .filter(F.col("unit_cents") == F.col("best_cents"))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "p_partkey",
            "p_name",
            F.round(F.col("unit_cents").cast("double") / 100.0, 2).alias(
                "unit_price"
            ),
        )
    )


@register(
    "q_important_stock",
    oracle="""
WITH val AS (
  SELECT l.l_partkey,
         SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS v_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
),
tot AS (SELECT SUM(v_cents) AS t_cents, COUNT(*) AS n_parts FROM val)
SELECT v.l_partkey,
       ROUND(CAST(v.v_cents AS DOUBLE) / 100.0, 2) AS part_value
FROM val v, tot
WHERE v.v_cents * tot.n_parts > 2 * tot.t_cents
""",
)
def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose one-nation shipped value exceeds a
    fraction of the nation's total — HAVING against a global scalar
    aggregate. The stock value derives from lineitem history (no
    partsupp in the fixture); the threshold is "more than 2× the
    average per-part value", which is scale-invariant (a fixed
    global fraction would empty out as the part count grows with SF).

    Scale plan: nation filter broadcasts into the lineitem scan (100 →
    4 suppliers), so the only fact shuffle is the partkey aggregate of
    the ~1/25 surviving lines, with map-side partial combine. The
    parts-sized aggregate is localCheckpoint'ed so BOTH its consumers
    (the 1-row global total and the filtered output) read the
    materialized rows — the fact is scanned exactly once by
    construction, not by hoping ReuseExchange dedups two printed
    copies of the subtree. The total rides back as a broadcast cross
    join — no second pass over the fact. The cut compares
    integers only: v_cents * n_parts > 2 * t_cents, exact in BIGINT
    (t_cents ~ 1.8e12 at sf0.1 and n_parts ~ 2e4 → product ~ 3.6e16,
    three orders below 2^63; a 100 TB deployment re-scales cents to
    dollars to keep the same headroom)."""
    nation_supp = (
        spark.table("supplier")
        .join(
            F.broadcast(
                spark.table("nation").filter(F.col("n_name") == "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    val = (
        spark.table("lineitem")
        .join(F.broadcast(nation_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("v_cents")
        )
        .localCheckpoint()
    )
    tot = val.agg(
        F.sum("v_cents").alias("t_cents"), F.count("*").alias("n_parts")
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("v_cents") * F.col("n_parts") > 2 * F.col("t_cents")
        )
        .select(
            "l_partkey",
            F.round(F.col("v_cents").cast("double") / 100.0, 2).alias(
                "part_value"
            ),
        )
    )


@register(
    "q_shipmode_priority",
    oracle="""
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_returnflag
""",
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per shipping class, how many lines belong to
    urgent vs non-urgent orders — CASE-bucketed conditional counts over
    an order×lineitem join (the fixture has no l_shipmode, so
    l_returnflag is the class column; o_orderpriority is the payload).

    Scale plan: the ship-year filter pushes to the lineitem scan
    (~1/6 survives) and only (orderkey, returnflag) is shuffled for
    the join; orders projects (orderkey, priority) only. Both sides
    shuffle on o_orderkey — a layout bucketed on the order key runs it
    exchange-free. The CASE counts fold in the final 3-group aggregate
    with map-side combine; no distinct, no window."""
    li = (
        spark.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    o = spark.table("orders").select("o_orderkey", "o_orderpriority")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_excess_suppliers",
    oracle="""
WITH small_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
),
ship AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  JOIN small_parts ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey AS t_partkey, SUM(qty) AS total_qty
  FROM ship GROUP BY l_partkey
),
dominant AS (
  SELECT DISTINCT sh.l_suppkey
  FROM ship sh JOIN tot t ON t.t_partkey = sh.l_partkey
  WHERE 2 * sh.qty > t.total_qty
)
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IN ('NATION_3', 'NATION_7')
  AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
""",
)
def q_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in chosen nations who dominated the
    supply of some small part — the nested aggregate-filtered IN-chain
    (part-name subquery → per-pair shipped-quantity aggregate →
    correlated half-of-total threshold → supplier semi-join), with the
    availability relation derived from lineitem (no partsupp).

    Scale plan: the part-name filter broadcasts into the lineitem scan
    together with the ship-year pushdown, so the single fact shuffle
    aggregates only matching-year lines of matching parts on
    (partkey, suppkey) — and the fact is scanned exactly once. The
    per-part total is a SUM window over partkey on the supply-sized
    aggregate (one supply-sized shuffle, replacing the aggregate-then-
    self-join that would print the fact subtree twice). The
    dominant-supplier set dedups to ≤ |suppliers| keys and broadcasts
    into the supplier semi-join. The 2*qty > total cut is exact:
    quantities are integral doubles, sums stay below 2^53."""
    small_parts = (
        spark.table("part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    ship = (
        spark.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    total = F.sum("qty").over(Window.partitionBy("l_partkey"))
    dominant = (
        ship.withColumn("total_qty", total)
        .filter(2 * F.col("qty") > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = spark.table("supplier").join(
        F.broadcast(
            spark.table("nation").filter(
                F.col("n_name").isin("NATION_3", "NATION_7")
            )
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        supp.join(
            F.broadcast(dominant),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "n_name")
    )
