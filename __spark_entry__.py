"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``pyanamo_spark`` — this module only adapts the
registry to the driver's contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyanamo_spark.registry import (  # noqa: E402
    QUERIES,
    load_all,
    ordered_oracles,
    ordered_queries,
)

load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's "how far along is my workflow?"
    (state counts + nested-task progress histogram,
    /root/reference/code/manager.py:840-911) over the sf0.001 fixtures.
    """
    return QUERIES["q_progress_histogram"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    SURVEY §2-declared query ids lead the dict so a driver that records
    a bounded prefix always covers the declared inventory.
    """
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query;
    rows-only queries (seeded-random order, LSH dedup, …) are omitted
    per the driver contract."""
    return ordered_oracles()
