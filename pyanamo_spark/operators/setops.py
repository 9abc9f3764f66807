"""Set operations and multi-level aggregation (SURVEY.md §2.7 tail,
§2.10 X8/X9).

The reference's only set-op shapes are disjoint state partitions (A1)
and the Completed/Failed split (q_partition_split); the rebuild exposes
the full relational family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register


@register(
    "q_setops",
    oracle="""
WITH o_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     f_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT 'both' AS subset, o_custkey FROM (SELECT o_custkey FROM o_cust INTERSECT SELECT o_custkey FROM f_cust)
UNION ALL
SELECT 'only_open' AS subset, o_custkey FROM (SELECT o_custkey FROM o_cust EXCEPT SELECT o_custkey FROM f_cust)
UNION ALL
SELECT 'only_finished' AS subset, o_custkey FROM (SELECT o_custkey FROM f_cust EXCEPT SELECT o_custkey FROM o_cust)
""",
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 set ops: customers with open vs finished orders —
    intersect/except/union tagged into one relation."""
    orders = spark.table("orders")
    o_cust = (
        orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    )
    f_cust = (
        orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    )
    both = o_cust.intersect(f_cust).select(
        F.lit("both").alias("subset"), "o_custkey"
    )
    only_o = o_cust.exceptAll(f_cust).select(
        F.lit("only_open").alias("subset"), "o_custkey"
    )
    only_f = f_cust.exceptAll(o_cust).select(
        F.lit("only_finished").alias("subset"), "o_custkey"
    )
    return both.unionByName(only_o).unionByName(only_f)


@register(
    "q_setops_fused",
    oracle="""
SELECT CASE
         WHEN has_o AND has_f THEN 'both'
         WHEN has_o THEN 'only_open'
         ELSE 'only_finished'
       END AS subset,
       o_custkey
FROM (
  SELECT o_custkey,
         MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) = 1 AS has_o,
         MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) = 1 AS has_f
  FROM orders
  WHERE o_orderstatus IN ('O', 'F')
  GROUP BY o_custkey
)
""",
)
def q_setops_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_setops rewritten for scale: the intersect/except form plans 12
    static exchanges (each branch re-scans and re-aggregates orders);
    this equivalent computes per-key membership flags in ONE scan and
    one exchange, then derives the subset label. Same rows, 6× fewer
    shuffles — the rewrite you'd apply at 100 TB."""
    orders = spark.table("orders").filter(
        F.col("o_orderstatus").isin("O", "F")
    )
    flags = orders.groupBy("o_custkey").agg(
        (F.max(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)) == 1)
        .alias("has_o"),
        (F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)) == 1)
        .alias("has_f"),
    )
    return flags.select(
        F.when(F.col("has_o") & F.col("has_f"), "both")
        .when(F.col("has_o"), "only_open")
        .otherwise("only_finished")
        .alias("subset"),
        "o_custkey",
    )


@register(
    "q_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 rollup: order counts/revenue at (status, priority), (status),
    and grand-total levels in one pass — partial aggregation handles
    all levels without separate scans."""
    return (
        spark.table("orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "q_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
         AS grouping_lvl,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 explicit GROUPING SETS — the non-hierarchical level list
    neither rollup nor cube expresses (each single-column marginal +
    grand total, WITHOUT the (status, priority) cross level), plus
    ``grouping_id`` to disambiguate a real NULL group key from a
    superaggregate row. One pass: Spark plans the set list as a single
    Expand + aggregation, so the fact is scanned once regardless of
    how many sets are requested."""
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority)
                    AS BIGINT) AS grouping_lvl,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
