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
