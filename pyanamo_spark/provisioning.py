"""Capacity provisioning — the executable twin of the reference's
throughput-management surface (the one reference behavior that
previously had documentation-only coverage).

Reference parity map (all /root/reference/code/manager.py):
  - ``set_hardProvision`` (manager.py:999-1031): fixed read/write
    capacity units applied to the table and its 4 GSIs. Spark's
    analogue of a fixed capacity unit is fixed job sizing —
    ``set_hard_provision`` pins the shuffle partition count and scan
    split size on the session, the two knobs that decide how many
    concurrent units of work a stage presents.
  - ``setAutoScalingTarget`` (manager.py:1034-1093): a [min, max]
    scalable-target band per resource. Spark scales WITHIN a job via
    AQE runtime coalescing — ``set_autoscaling_target`` turns AQE on
    and binds its partition count to the same [min, max] band
    (``initialPartitionNum`` is the scale-out ceiling, ``minPartitionNum``
    the scale-in floor).
  - ``putScalingPolicy`` (manager.py:1096-1167): target-tracking on
    capacity utilization with scale-in/out cooldowns. AQE's target
    metric is bytes-per-partition — ``set_scaling_policy`` maps the
    utilization target to ``advisoryPartitionSizeInBytes`` (and skew
    thresholds), which AQE then tracks per stage exactly the way the
    DynamoDB policy tracks consumed/provisioned per minute. Cooldowns
    have no analogue: AQE re-plans per stage boundary, which is
    strictly finer-grained.

The reference applies capacity to the base table plus its four GSIs
(ItemState/TaskState/InstanceState/Logging indexes); this engine's
GSI analogue is the ItemState partition layout (engine.py), so one
session-level setting covers what the reference sets five times.

``q_capacity_plan`` is the stats-driven side: the reference sizes
capacity by table; the Spark twin derives per-table parallelism and
broadcastability from row counts — the plan a provisioning script
would feed into ``set_hard_provision``. Counts-only by design so the
DuckDB oracle can re-derive every number exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.catalog import TABLES
from pyanamo_spark.registry import register

#: one task per ~1M rows — at the fixture's ~128 B/row this is the
#: classic ~128 MB scan/shuffle unit; the constant is part of the
#: declared plan so the oracle can replay the arithmetic
PARTITION_TARGET_ROWS = 1_000_000
#: dimension tables at or under this row count broadcast (the 10 MB
#: default threshold at ~100 B/row)
BROADCAST_ROW_BOUND = 100_000


def set_hard_provision(
    spark: SparkSession,
    shuffle_partitions: int,
    max_partition_bytes: int = 128 * 1024 * 1024,
) -> dict[str, str]:
    """Fixed job sizing (twin of ``set_hardProvision``): pin the
    shuffle width and the scan split size for the session. Returns
    the settings applied, like the reference returns the
    TableDescription."""
    applied = {
        "spark.sql.shuffle.partitions": str(int(shuffle_partitions)),
        "spark.sql.files.maxPartitionBytes": str(int(max_partition_bytes)),
        # hard provisioning means NO runtime rescale, same as the
        # reference's fixed capacity units
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    for k, v in applied.items():
        spark.conf.set(k, v)
    return applied


def set_autoscaling_target(
    spark: SparkSession, min_partitions: int, max_partitions: int
) -> dict[str, str]:
    """[min, max] scalable-target band (twin of ``setAutoScalingTarget``):
    AQE coalesces each stage's shuffle between the two bounds."""
    if not 0 < int(min_partitions) <= int(max_partitions):
        raise ValueError(
            f"need 0 < min <= max, got [{min_partitions}, {max_partitions}]"
        )
    applied = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": str(
            int(max_partitions)
        ),
        "spark.sql.adaptive.coalescePartitions.minPartitionNum": str(
            int(min_partitions)
        ),
    }
    for k, v in applied.items():
        spark.conf.set(k, v)
    return applied


def set_scaling_policy(
    spark: SparkSession, target_partition_mb: int = 64
) -> dict[str, str]:
    """Target-tracking policy (twin of ``putScalingPolicy``): AQE
    tracks bytes-per-partition toward the advisory size per stage,
    the way the reference's policy tracks capacity utilization per
    minute; the skew factor is the scale-out trigger for hot keys."""
    applied = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            int(target_partition_mb) * 1024 * 1024
        ),
        "spark.sql.adaptive.skewJoin.enabled": "true",
    }
    for k, v in applied.items():
        spark.conf.set(k, v)
    return applied


_PLAN_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       GREATEST(CAST(1 AS BIGINT),
                CAST(CEIL(COUNT(*) / {PARTITION_TARGET_ROWS}.0) AS BIGINT))
         AS recommended_partitions,
       CAST(COUNT(*) <= {BROADCAST_ROW_BOUND} AS INTEGER) AS broadcastable
FROM {t}"""
    for t in TABLES
)


@register("q_capacity_plan", oracle=_PLAN_ORACLE)
def q_capacity_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-driven capacity plan over every base table: row count,
    the parallelism ``set_hard_provision`` should pin for a job
    dominated by that table, and whether the table broadcasts. The
    derivation is counts-only (declared constants above) so the
    oracle replays every number; byte-level refinements belong to the
    runtime policy (AQE advisory size), not the static plan."""
    plans = [
        spark.table(t).agg(
            F.lit(t).alias("table_name"),
            F.count("*").alias("n_rows"),
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.count("*") / float(PARTITION_TARGET_ROWS)).cast(
                    "long"
                ),
            ).alias("recommended_partitions"),
            (F.count("*") <= BROADCAST_ROW_BOUND)
            .cast("int")
            .alias("broadcastable"),
        )
        for t in TABLES
    ]
    out = plans[0]
    for p in plans[1:]:
        out = out.unionByName(p)
    return out
