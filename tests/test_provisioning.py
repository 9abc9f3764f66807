"""Capacity-provisioning twins (provisioning.py): the settings really
land on the session, bands validate, and the capacity plan derives
from actual table stats (oracle parity runs in the driver harness)."""

from __future__ import annotations

import pytest

from pyanamo_spark.provisioning import (
    BROADCAST_ROW_BOUND,
    PARTITION_TARGET_ROWS,
    set_autoscaling_target,
    set_hard_provision,
    set_scaling_policy,
)
from pyanamo_spark.registry import QUERIES, load_all

load_all()


@pytest.fixture
def restore_conf(spark):
    keys = [
        "spark.sql.shuffle.partitions",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        "spark.sql.adaptive.coalescePartitions.minPartitionNum",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.enabled",
    ]
    before = {}
    for k in keys:
        try:
            before[k] = spark.conf.get(k)
        except Exception:
            before[k] = None
    yield
    for k, v in before.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_hard_provision_pins_and_disables_rescale(spark, restore_conf):
    applied = set_hard_provision(spark, 48, 64 * 1024 * 1024)
    assert spark.conf.get("spark.sql.shuffle.partitions") == "48"
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == str(
        64 * 1024 * 1024
    )
    # fixed capacity = no runtime coalesce, like the reference's
    # hard-provisioned (non-autoscaled) table
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        == "false"
    )
    assert set(applied) == {
        "spark.sql.shuffle.partitions",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
    }


def test_autoscaling_band_applies_and_validates(spark, restore_conf):
    set_autoscaling_target(spark, 4, 256)
    assert (
        spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
        )
        == "256"
    )
    assert (
        spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.minPartitionNum"
        )
        == "4"
    )
    with pytest.raises(ValueError, match="min <= max"):
        set_autoscaling_target(spark, 9, 3)
    with pytest.raises(ValueError, match="min <= max"):
        set_autoscaling_target(spark, 0, 3)


def test_scaling_policy_sets_advisory_target(spark, restore_conf):
    set_scaling_policy(spark, target_partition_mb=32)
    assert spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ) == str(32 * 1024 * 1024)
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_capacity_plan_matches_real_counts(spark, sf_dir):
    import math

    from pyanamo_spark.catalog import TABLES

    rows = {r.table_name: r for r in QUERIES["q_capacity_plan"](spark, sf_dir).collect()}
    assert set(rows) == set(TABLES)
    for t in TABLES:
        n = spark.table(t).count()
        r = rows[t]
        assert r.n_rows == n
        assert r.recommended_partitions == max(
            1, math.ceil(n / PARTITION_TARGET_ROWS)
        )
        assert r.broadcastable == int(n <= BROADCAST_ROW_BOUND)
