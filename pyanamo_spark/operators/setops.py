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
