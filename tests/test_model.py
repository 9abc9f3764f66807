"""Batch model inference: tree-compiler parity, in-engine OLS vs
numpy, and the no-Python-stage plan guarantee."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyanamo_spark.functions.model import (
    ORDER_TREE,
    linear_fit,
    linear_score,
    q_model_score,
    tree_column,
    tree_predict,
    tree_sql,
)


@pytest.fixture()
def frame(spark):
    rows = [
        (float(q), float(d), float(p))
        for q in (1, 10, 24, 25, 26, 50)
        for d in (0.0, 0.04, 0.05, 0.1)
        for p in (100.0, 29999.0, 30000.0, 60000.0)
    ]
    return spark.createDataFrame(
        rows, "l_quantity double, l_discount double, l_extendedprice double"
    )


def test_tree_column_matches_reference_eval(frame):
    got = frame.withColumn("cls", tree_column(ORDER_TREE)).collect()
    for r in got:
        assert r["cls"] == tree_predict(ORDER_TREE, r.asDict()), r


def test_tree_sql_matches_tree_column(spark, frame):
    """Both compilers come from one spec; prove it end-to-end by
    running the SQL text through Spark's own parser on the same rows."""
    frame.createOrReplaceTempView("tree_probe")
    sql = spark.sql(
        f"SELECT l_quantity, l_discount, l_extendedprice, "
        f"{tree_sql(ORDER_TREE)} AS cls FROM tree_probe"
    ).collect()
    col = frame.withColumn("cls", tree_column(ORDER_TREE)).collect()
    assert sorted(map(tuple, sql)) == sorted(map(tuple, col))


def test_linear_fit_matches_numpy(spark):
    rng = np.random.default_rng(7)
    x = rng.uniform(1, 50, 400)
    y = 3.5 * x + 12.0 + rng.normal(0, 2.0, 400)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    row = linear_fit(df, y="y", x="x").collect()[0]
    slope, icept = np.polyfit(x, y, 1)
    assert row["slope"] == pytest.approx(slope, abs=1e-5)
    assert row["icept"] == pytest.approx(icept, abs=1e-5)


def test_linear_score_residuals(spark):
    """An exact linear relation scores with zero residual per group."""
    rows = [
        ("a", float(x), 2.0 * x + 5.0) for x in range(1, 20)
    ] + [("b", float(x), -1.0 * x + 100.0) for x in range(1, 20)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    model = linear_fit(df, y="y", x="x", by=["g"])
    scored = linear_score(df, model, y="y", x="x", by=["g"])
    assert scored.agg(F.max(F.abs("resid"))).collect()[0][0] < 1e-9


def test_scoring_plan_has_no_python_stage(spark, sf_dir):
    """The whole train+score pipeline must stay JVM-side: no
    BatchEvalPython / ArrowEvalPython / mapInPandas anywhere in the
    physical plan (the reference pays a subprocess per task here)."""
    plan = q_model_score(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas", "PythonMapInArrow"):
        assert marker not in plan, marker
    # and the GROUPS-sized model really broadcasts
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
