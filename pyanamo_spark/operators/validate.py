"""One-pass data-quality validation (a Deequ-style constraint report):
declare row-level predicates, get per-constraint violation counts from
a SINGLE aggregation over the table — plus referential checks as
broadcast anti-join counts.

The reference validates imports imperatively (field-count checks before
import_item, ``/root/reference/code/pyanamo.py`` import path; blank-line
and header filters in the CSV ingest) — one row at a time, one rule at
a time. The engine form evaluates EVERY declared rule in one
map-side-combined pass: each predicate becomes a conditional count in
the same aggregate, so N rules cost one scan, not N.

Scale notes:
- row-level rules never shuffle rows — one 1-row aggregate per table
  regardless of rule count
- referential rules are LEFT ANTI joins counting orphans; the dim side
  ships its join KEY column only (broadcast when small, shuffle
  otherwise — the planner's choice), never its payload
- the report is rules-sized; unioning per-table reports gives the
  whole-warehouse run the same way
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register


def check_rows(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Row-level rules: {name: boolean Column that HOLDS for valid
    rows}. One aggregation; violations count rows where the rule is
    false OR null (a null predicate cannot certify validity)."""
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.count_if(~F.coalesce(cond, F.lit(False))).alias(f"_v{i}")
            for i, cond in enumerate(rules.values())
        ],
    )
    entries = ", ".join(
        f"struct('{name}' AS rule, _v{i} AS n_violations, _n AS n_rows)"
        for i, name in enumerate(rules)
    )
    return agg.selectExpr(f"inline(array({entries}))").withColumn(
        "pass", F.col("n_violations") == 0
    )


def check_reference(
    fact: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    rule_name: str,
) -> DataFrame:
    """Referential rule: count fact rows whose key has no match in
    ``dim_keys`` (single-column DataFrame). Null keys are orphans."""
    n = fact.count()
    orphans = fact.select(F.col(fact_key).alias("_k")).join(
        dim_keys.toDF("_k"), "_k", "left_anti"
    )
    n_orphans = orphans.count()
    return fact.sparkSession.createDataFrame(
        [(rule_name, n_orphans, n, n_orphans == 0)],
        "rule string, n_violations bigint, n_rows bigint, pass boolean",
    )


@register(
    "q_validate",
    oracle="""
WITH o AS (SELECT COUNT(*) AS n FROM orders),
rows_report AS (
  SELECT 'orderdate_in_range' AS rule,
         COUNT(CASE WHEN NOT (o_orderdate >= TIMESTAMP '1992-01-01'
                         AND o_orderdate < TIMESTAMP '1999-01-01')
                    OR o_orderdate IS NULL THEN 1 END) AS n_violations
  FROM orders
  UNION ALL
  SELECT 'status_known',
         COUNT(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                    OR o_orderstatus IS NULL THEN 1 END)
  FROM orders
  UNION ALL
  SELECT 'totalprice_positive',
         COUNT(CASE WHEN NOT (o_totalprice > 0)
                    OR o_totalprice IS NULL THEN 1 END)
  FROM orders
  UNION ALL
  SELECT 'custkey_references_customer',
         COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END)
  FROM orders LEFT JOIN customer c ON c.c_custkey = orders.o_custkey
)
SELECT r.rule, r.n_violations, o.n AS n_rows,
       r.n_violations = 0 AS pass
FROM rows_report r CROSS JOIN o
""",
)
def q_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders-table quality report: three row-level rules in one
    aggregation pass plus one referential rule as a broadcast
    anti-join count."""
    orders = spark.table("orders")
    report = check_rows(
        orders,
        {
            "orderdate_in_range": (
                F.col("o_orderdate") >= F.lit("1992-01-01").cast("timestamp")
            )
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")),
            "status_known": F.col("o_orderstatus").isin("O", "F", "P"),
            "totalprice_positive": F.col("o_totalprice") > 0,
        },
    )
    ref = check_reference(
        orders,
        "o_custkey",
        spark.table("customer").select("c_custkey"),
        "custkey_references_customer",
    )
    return report.unionByName(ref)
