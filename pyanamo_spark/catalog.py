"""Fixture-table loaders.

All declared queries read the driver-generated parquet tables at an
``sf_dir`` (see /root/repo/TESTDATA.md). On a real cluster these reads
are partitioned parquet scans with column pruning + predicate pushdown;
nothing here materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: fixture columns written as TIMESTAMP(NANOS): Spark's parquet reader has
#: no nanos timestamp type, so they are scanned as long (see session.py
#: nanosAsLong) and converted here with integer division — truncation to
#: micros matches how DuckDB reads the same files. The conversion is a
#: projection expression (JVM-side, codegen), not a driver round-trip.
_NANOS_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def register_base_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (idempotent)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
