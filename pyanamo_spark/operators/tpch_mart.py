"""Second wave of warehouse-mart query shapes (TPC-H Q4/Q7/Q15/Q17/Q18
analogues adapted to the fixture schema — no partsupp / commitdate
columns exist, so predicates use the columns that do).

These exercise the plan shapes the first wave (analytics.py) does not:
EXISTS semi-joins, correlated scalar subqueries (rewritten as
aggregate-then-join), global-max selection, and HAVING pushback joins.

Oracle-parity discipline: every revenue comparison that feeds a
threshold, max, or output value is computed in *integer cents*
(``CAST(ROUND(x * 100) AS BIGINT)`` per row, summed as BIGINT).
Float sums are order-dependent in the last ulp and Spark/DuckDB
partition sums differently; integer sums are exact and engine-
independent, so max-winner selection and HAVING cuts can never flip.
Averages of integral doubles (l_quantity) are exact-sum / exact-count
and therefore also deterministic.

Reference parity: these extend the X-series north-star analytics
(SURVEY.md §2 "North-star extensions"); the reference itself has no
warehouse queries — BASELINE.json directs this extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register


def _cents(col, scale: int = 100):
    """Per-row integer scaling: deterministic across engines (same
    input double -> same product -> same round), then exact BIGINT
    sums regardless of partitioning/order."""
    return F.round(col * scale).cast("long")


@register(
    "q_priority_pending",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o.o_orderpriority
""",
)
def q_priority_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority distribution of one quarter's orders
    that have at least one returned line — EXISTS as a left-semi join.
    The quarter filter pushes to the orders scan; the returnflag filter
    pushes to the lineitem scan BEFORE the semi join, so the shuffle
    carries only ('R' lines) x (one quarter) keys. Semi-join emits at
    most one match per order (no fan-out, no post-dedup)."""
    orders = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = (
        spark.table("lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q_nation_traffic",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       ROUND(CAST(SUM(volume_cents) AS DOUBLE) / 100.0, 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT) AS volume_cents
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q_nation_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.

    Scale plan: the nation-pair predicate is applied to supplier and
    customer BEFORE their fact joins — each side shrinks to 2/25 of its
    table and becomes broadcastable, so the only shuffle left is
    lineitem x orders on the order key. The (n1,n2)-pair disjunction is
    evaluated after both broadcasts as a cheap row filter on two
    in-memory strings."""
    n = spark.table("nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = (
        spark.table("supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        spark.table("customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = spark.table("orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _cents(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume_cents"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(F.sum("volume_cents") / 100.0, 2).alias("revenue")
        )
    )


@register(
    "q_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT)) AS rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       ROUND(CAST(r.rev_e4 AS DOUBLE) / 10000.0, 2) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.rev_e4 = (SELECT MAX(rev_e4) FROM revenue)
""",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the quarter's maximum revenue
    — the correlated MAX subquery rewritten as aggregate + broadcast of
    a single-row max. Revenue ranks in integer e-4 units so the winner
    is engine-exact (a float-sum max can flip the winner between
    engines when two suppliers differ by < 1 ulp).

    Scale plan: one shuffle (groupBy suppkey) over a date-pruned scan;
    the max is a 1-row broadcast back across the aggregate, and the
    supplier join broadcasts the (tiny) winning set — no global sort.

    The aggregated revenue table is persisted: it feeds BOTH the max
    scalar and the winners join, and Spark's ReuseExchange does not
    canonicalize the two branches together, so without the persist the
    full lineitem scan + shuffle would run twice. Materializing
    ~#suppliers rows (3 orders of magnitude under lineitem) to reuse
    beats re-scanning the fact table at any scale."""
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                _cents(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    10000,
                )
            ).alias("rev_e4")
        )
        .persist()
    )
    best = revenue.agg(F.max("rev_e4").alias("best_rev"))
    winners = revenue.join(
        F.broadcast(best), revenue.rev_e4 == best.best_rev
    )
    s = spark.table("supplier")
    return s.join(
        F.broadcast(winners), s.s_suppkey == winners.supplier_no
    ).select(
        "s_suppkey",
        "s_name",
        F.round(F.col("rev_e4") / 10000.0, 2).alias("total_revenue"),
    )


@register(
    "q_small_qty_revenue",
    oracle="""
SELECT ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0 / 7.0, 2) AS avg_yearly
FROM (
  SELECT CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#23' AND p.p_size < 5
    AND l.l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
) t
""",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — the
    correlated per-part AVG threshold rewritten as a per-part aggregate
    joined back to the fact. The threshold compare is deterministic
    across engines because l_quantity is integral: exact sum / exact
    count -> identical IEEE division -> identical 0.2x product.

    Scale plan: the brand/size filter broadcasts part keys into BOTH
    the threshold aggregation and the fact scan, so the per-part AVG is
    computed only over the ~1/1000 selected parts (Q17's subquery is
    formally over all lineitem, but rows for unselected parts can never
    match — the restriction is semantics-preserving). One shuffle on
    l_partkey for the aggregate; the threshold table (one row per
    selected part) broadcasts back. The filtered fact slice is
    persisted because it feeds both the threshold aggregate and the
    final compare — without it the lineitem scan runs twice."""
    sel_parts = (
        spark.table("part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") < 5))
        .select("p_partkey")
    )
    li = (
        spark.table("lineitem")
        .join(
            F.broadcast(sel_parts),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .persist()
    )
    thresholds = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    small = li.join(
        F.broadcast(thresholds.withColumnRenamed("l_partkey", "t_partkey")),
        F.col("l_partkey") == F.col("t_partkey"),
    ).filter(F.col("l_quantity") < F.col("qty_thresh"))
    return small.agg(
        F.round(
            F.sum(_cents(F.col("l_extendedprice"))) / 100.0 / 7.0, 2
        ).alias("avg_yearly")
    )


@register(
    "q_returned_customers",
    oracle="""
SELECT c.c_custkey, n.n_name,
       ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                 * 100) AS BIGINT)) AS DOUBLE) / 100.0,
             2) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c.c_custkey, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in a
    half-year — fact⨝fact on the order key with both scans pre-filtered
    (returnflag on lineitem, date range on orders, both pushed to
    parquet), then a dimension broadcast and top-k. Revenue ranks in
    integer cents so the LIMIT cut is engine-exact; the (revenue,
    custkey) sort is total, so top-20 is deterministic and plans as
    TakeOrderedAndProject."""
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = spark.table("lineitem").filter(F.col("l_returnflag") == "R")
    c = spark.table("customer")
    n = spark.table("nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "n_name")
        .agg(
            F.round(
                F.sum(
                    _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                )
                / 100.0,
                2,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_promo_share",
    oracle="""
SELECT ROUND(
         100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(ROUND(l.l_extendedprice
                                          * (1 - l.l_discount) * 100)
                                    AS BIGINT) ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                               * 100) AS BIGINT)) AS DOUBLE),
         4) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
""",
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month — a
    conditional aggregate over a broadcast dimension join. Both the
    numerator and denominator sum in integer cents (exact), so the
    final ratio is one double division — identical across engines. The
    date filter pushes to the fact scan; part broadcasts."""
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = spark.table("part").select("p_partkey", "p_type")
    cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", cents).otherwise(
                        F.lit(0).cast("long")
                    )
                )
                / F.sum(cents),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q_brand_revenue",
    oracle="""
SELECT ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                 * 100) AS BIGINT)) AS DOUBLE) / 100.0,
             2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three-way disjunctive brand/size/quantity
    predicate spanning both join sides. The part-only disjuncts
    (brand, size) pre-filter the dimension before the broadcast — the
    optimizer cannot split a cross-side OR itself, so the derivable
    union of part filters (brand IN + size <= 15) is applied manually,
    shrinking the broadcast; the full disjunction then evaluates
    post-join as a cheap row filter."""
    p = spark.table("part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    )
    li = spark.table("lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(
                    _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                )
                / 100.0,
                2,
            ).alias("revenue")
        )
    )


@register(
    "q_market_share",
    oracle="""
SELECT l_year,
       ROUND(
         CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume_cents
                       ELSE 0 END) AS DOUBLE)
         / CAST(SUM(volume_cents) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS l_year,
         n1.n_name AS supp_nation,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT) AS volume_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n2.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'REGION_0'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
) volumes
GROUP BY l_year
""",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's order
    volume by year — conditional-sum ratio over a 6-table join. Both
    ratio terms sum in integer cents, so the share division is a single
    engine-exact double op.

    Scale plan: region→nation→customer collapses to a broadcast chain
    (region filter first, 25-row nation tables); supplier+nation
    broadcasts the other side; the one real shuffle is
    lineitem⨝orders on the order key, both date-pruned."""
    n2 = spark.table("nation")
    r = spark.table("region").filter(F.col("r_name") == "REGION_0")
    cust_in_region = (
        spark.table("customer")
        .join(
            F.broadcast(
                n2.join(
                    F.broadcast(r),
                    n2.n_regionkey == r.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        spark.table("supplier")
        .join(
            F.broadcast(spark.table("nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = spark.table("lineitem")
    volume = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_in_region), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("l_year"),
            "supp_nation",
            volume.alias("volume_cents"),
        )
        .groupBy("l_year")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_1",
                        F.col("volume_cents"),
                    ).otherwise(F.lit(0).cast("long"))
                )
                / F.sum("volume_cents"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q_product_profit",
    oracle="""
SELECT nation, o_year,
       ROUND(CAST(SUM(profit_cents) AS DOUBLE) / 100.0, 2) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT)
         - CAST(ROUND(p.p_retailprice * l.l_quantity * 100) AS BIGINT)
           AS profit_cents
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%green%'
) profit
GROUP BY nation, o_year
""",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and year.
    The fixture has no partsupp.ps_supplycost, so cost is
    p_retailprice x quantity — same plan shape (dimension predicate on
    a part name substring, revenue-minus-cost arithmetic spanning two
    tables, two-key rollup). Profit is computed per-row in integer
    cents BEFORE summing, keeping the aggregate engine-exact.

    Scale plan: part (name-filtered) and supplier+nation broadcast;
    lineitem⨝orders on the order key is the single real shuffle."""
    p = (
        spark.table("part")
        .filter(F.col("p_name").like("%green%"))
        .select("p_partkey", "p_retailprice")
    )
    s_nation = (
        spark.table("supplier")
        .join(
            F.broadcast(spark.table("nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = spark.table("lineitem")
    o = spark.table("orders")
    profit_cents = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) - _cents(F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s_nation), li.l_suppkey == F.col("s_suppkey"))
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit_cents.alias("profit_cents"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum("profit_cents") / 100.0, 2).alias("sum_profit")
        )
    )


@register(
    "q_custdist",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
)
def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer,
    INCLUDING zero-order customers — the left outer join + COUNT(col)
    (which skips the nulls the outer join manufactures) that an inner
    join cannot express.

    Scale plan: two aggregations but only ONE data shuffle — orders
    pre-aggregates per custkey (map-side combine collapses each
    customer's orders before the exchange), the customer join then
    completes the left side, and the second groupBy is over an
    already-tiny (customer-cardinality) relation."""
    per_cust = (
        spark.table("orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    c = spark.table("customer")
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q_idle_customers",
    oracle="""
WITH eligible AS (
  SELECT c_custkey, c_acctbal,
         SUBSTRING(CAST(c_nationkey AS STRING), 1, 1) AS cntrycode
  FROM customer
  WHERE c_nationkey % 5 = 0
)
SELECT cntrycode,
       COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS totacctbal
FROM eligible e
WHERE c_acctbal > (
    SELECT AVG(c_acctbal) FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey % 5 = 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = e.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  )
GROUP BY cntrycode
""",
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers (balance above the
    positive-balance average of their cohort) with no recent orders —
    scalar AVG subquery + NOT EXISTS anti-join.

    Engine-parity note: the AVG threshold divides an exact-integer-
    representable sum only in spirit — balances are arbitrary doubles,
    so instead the compare uses the same expression tree on both
    engines and customers sit far from the boundary with probability 1
    (balance vs an average of ~thousands of rows; an exact tie is a
    measure-zero event the fixture does not contain).

    Scale plan: the cohort AVG is a 1-row broadcast; the anti-join
    against recent orders projects orders to its key column only and
    pre-filters by date before shuffling."""
    cohort = spark.table("customer").filter(F.col("c_nationkey") % 5 == 0)
    avg_bal = cohort.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        spark.table("orders")
        .filter(
            F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
        )
        .select("o_custkey")
    )
    return (
        cohort.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .select(
            F.substring(F.col("c_nationkey").cast("string"), 1, 1).alias(
                "cntrycode"
            ),
            "c_acctbal",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_cents(F.col("c_acctbal"))) / 100.0, 2).alias(
                "totacctbal"
            ),
        )
    )


@register(
    "q_supplier_parts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_size IN (1, 4, 9, 16, 25)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part group. The
    fixture has no partsupp, so lineitem IS the observed part↔supplier
    relation — same plan shape (negated dimension predicates, IN-list,
    COUNT DISTINCT over a 3-key group).

    Scale plan: part filters broadcast into the fact scan; the count-
    distinct plans as two-stage aggregation (partial distinct on
    (group, suppkey), then the count) — Spark's Expand-free path since
    there is a single distinct column."""
    p = spark.table("part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 4, 9, 16, 25)
    )
    li = spark.table("lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_waiting_suppliers",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'A'
  AND n.n_name = 'NATION_3'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'A'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for failed lines
    in multi-supplier orders — the compound correlated EXISTS (another
    supplier touched the order) + NOT EXISTS (no other supplier also
    failed), as a left-semi then left-anti join, each with the
    suppkey-inequality as a residual join condition on the order key.

    Scale plan: all three lineitem legs pre-filter before their
    shuffles (l1 by returnflag + the broadcast nation-filtered
    supplier; l3 by returnflag; l2 projects keys only); the three
    shuffles share one key (l_orderkey), so a production layout
    bucketed on l_orderkey runs the whole chain exchange-free.
    Top-10 is a total order (numwait desc, name) →
    TakeOrderedAndProject."""
    s = (
        spark.table("supplier")
        .join(
            F.broadcast(
                spark.table("nation").filter(F.col("n_name") == "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    o = (
        spark.table("orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = spark.table("lineitem")
    l1 = (
        li.filter(F.col("l_returnflag") == "A")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    l3 = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    waited = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        waited.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "q_big_orders",
    oracle="""
SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
       ROUND(SUM(l.l_quantity), 0) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate
HAVING SUM(l.l_quantity) > 150
ORDER BY total_qty DESC, o_orderkey
LIMIT 100
""",
)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — HAVING over a fact
    aggregate, then joined back to the order/customer detail.

    Scale plan: aggregate lineitem FIRST on its own key (one shuffle,
    map-side partial combine collapses ~4 lines/order before shuffling)
    and apply the HAVING cut there, so only qualifying order keys — a
    few thousand out of billions — reach the orders join, which then
    broadcasts. The quantity cut is exact (integral doubles). Top-k by
    (total_qty, o_orderkey) is a total order, so LIMIT is deterministic
    across engines, and plans as TakeOrderedAndProject."""
    big = (
        spark.table("lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
    )
    o = spark.table("orders")
    c = spark.table("customer")
    qualified = o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
    return (
        c.join(F.broadcast(qualified), c.c_custkey == qualified.o_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("qty"), 0).alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(100)
    )
