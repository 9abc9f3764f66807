"""Change-data-capture query surface over ``sources/snapshots``'s
``table_diff``: what changed between two table states, as data.

Reference parity: the reference's "what moved" story is polling GSI
counts (``monitor_task``) — it can say HOW MANY items are in each
state, never WHICH rows changed between two points in time. Snapshot
versions + key-level diff close that gap; north-star extension
directed by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register
from pyanamo_spark.sources.snapshots import table_diff

#: deterministic mutation moduli (see q_snapshot_diff)
_DEL_MOD, _UPD_MOD, _INS_MOD = 97, 101, 103
_INS_OFFSET = 10_000_000


@register(
    "q_snapshot_diff",
    oracle=f"""
SELECT 'delete' AS change, o_orderkey
FROM orders WHERE o_orderkey % {_DEL_MOD} = 0
UNION ALL
SELECT 'update', o_orderkey
FROM orders
WHERE o_orderkey % {_DEL_MOD} <> 0 AND o_orderkey % {_UPD_MOD} = 0
UNION ALL
SELECT 'insert', o_orderkey + {_INS_OFFSET}
FROM orders WHERE o_orderkey % {_INS_MOD} = 0
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC report between the orders table and a deterministically
    mutated successor (drop keys ≡0 mod {_DEL_MOD}, bump price on
    survivors ≡0 mod {_UPD_MOD}, insert offset copies of keys ≡0 mod
    {_INS_MOD}) — the diff runs the REAL full-outer-join operator
    while the oracle derives the expected change set independently
    from the moduli, so a diff bug cannot cancel itself out.

    Scale shape: one key shuffle for the full-outer join; payload
    equality is column-wise null-safe comparison (no digest), and the
    output is changes-sized."""
    old = spark.table("orders")
    survivors = old.filter(F.col("o_orderkey") % _DEL_MOD != 0)
    new = survivors.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % _UPD_MOD == 0,
            F.col("o_totalprice") + 1.0,
        ).otherwise(F.col("o_totalprice")),
    ).unionByName(
        old.filter(F.col("o_orderkey") % _INS_MOD == 0).withColumn(
            "o_orderkey", F.col("o_orderkey") + _INS_OFFSET
        )
    )
    return table_diff(old, new, ["o_orderkey"])


@register(
    "q_mv_refresh",
    oracle=f"""
WITH new_tbl AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderkey % {_UPD_MOD} = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS p
  FROM orders WHERE o_orderkey % {_DEL_MOD} <> 0
  UNION ALL
  SELECT o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey % {_INS_MOD} = 0
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(p), 2) AS total_price
FROM new_tbl
GROUP BY o_orderpriority
""",
)
def q_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a stored per-priority
    aggregate (count, revenue) is brought up to date after the same
    deterministic mutation batch as ``q_snapshot_diff`` — WITHOUT
    re-aggregating the new table. Changed rows are detected by a
    key-level diff; each contributes signed deltas (−1/−price for the
    old image, +1/+price for the new); the delta aggregate merges into
    the stored view by a GROUPS-sized outer join. The oracle
    re-aggregates the post-change table from scratch, so the
    incremental path must land on exactly the full-recompute answer.

    Scale shape: the refresh cost is O(changes), not O(table) — one
    key shuffle for the diff, a changes-sized delta aggregation, and
    a view-sized merge join. At 100 TB with a 0.1% daily churn this
    is the difference between re-reading 100 TB and reading the delta.
    """
    old = spark.table("orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    new = (
        old.filter(F.col("o_orderkey") % _DEL_MOD != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % _UPD_MOD == 0,
                F.col("o_totalprice") + 1.0,
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            old.filter(F.col("o_orderkey") % _INS_MOD == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + _INS_OFFSET
            )
        )
    )
    # the stored view (in production: read back from the MV table)
    mv_old = old.groupBy("o_orderpriority").agg(
        F.count("*").alias("n0"), F.sum("o_totalprice").alias("s0")
    )
    # key-level diff with both row images; unchanged rows drop out so
    # everything downstream is changes-sized
    o = old.alias("o")
    nw = new.alias("n")
    changed = o.join(
        nw, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer"
    ).filter(
        ~F.col("o.o_totalprice").eqNullSafe(F.col("n.o_totalprice"))
    )
    contrib = changed.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("o.o_orderpriority").alias("g"),
                    F.lit(-1).alias("w"),
                    (-F.col("o.o_totalprice")).alias("dp"),
                ),
                F.struct(
                    F.col("n.o_orderpriority").alias("g"),
                    F.lit(1).alias("w"),
                    F.col("n.o_totalprice").alias("dp"),
                ),
            )
        ).alias("c")
    ).select("c.*").filter(F.col("g").isNotNull())
    delta = contrib.groupBy("g").agg(
        F.sum("w").alias("dn"), F.sum("dp").alias("ds")
    )
    merged = mv_old.join(
        delta, mv_old["o_orderpriority"] == delta["g"], "full_outer"
    )
    n_new = F.coalesce("n0", F.lit(0)) + F.coalesce("dn", F.lit(0))
    return (
        merged.select(
            F.coalesce(mv_old["o_orderpriority"], delta["g"]).alias(
                "o_orderpriority"
            ),
            n_new.alias("n_orders"),
            F.round(
                F.coalesce("s0", F.lit(0.0)) + F.coalesce("ds", F.lit(0.0)),
                2,
            ).alias("total_price"),
        )
        .filter(F.col("n_orders") > 0)
    )
