"""Constraint validator: planted violations, null-predicate handling,
referential orphans — beyond what the fixture oracle (0 violations
everywhere) exercises."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyanamo_spark.operators.validate import check_reference, check_rows


def test_check_rows_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 0.0)],
        "id long, price double",
    )
    report = {
        r.rule: (r.n_violations, r.n_rows, r["pass"])
        for r in check_rows(
            df,
            {
                "price_positive": F.col("price") > 0,
                "id_nonnull": F.col("id").isNotNull(),
            },
        ).collect()
    }
    # -3.0 and 0.0 violate; the NULL price cannot certify -> violation
    assert report["price_positive"] == (3, 4, False)
    assert report["id_nonnull"] == (0, 4, True)


def test_check_reference_counts_orphans_and_null_keys(spark):
    fact = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "k long"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    r = check_reference(fact, "k", dim, "fk").collect()[0]
    assert (r.rule, r.n_violations, r.n_rows, r["pass"]) == (
        "fk",
        2,  # 99 and NULL
        4,
        False,
    )


def test_check_rows_single_aggregation_plan(spark):
    """N rules must not mean N scans: the physical plan contains
    exactly one parquet-free local scan feeding one aggregate."""
    df = spark.createDataFrame([(1,)], "id long")
    report = check_rows(
        df, {f"r{i}": F.col("id") > i for i in range(10)}
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 1
