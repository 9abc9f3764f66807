"""Declared-query registry.

Every operator from SURVEY.md §2 with a declared query id registers
here: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) the equivalent DuckDB oracle SQL. The
driver consumes these via ``__spark_entry__.queries()`` /
``oracle_sql()``; ``tests/test_parity.py`` runs the same comparison
locally.

Column-name discipline: the driver's compare sorts columns by name and
hashes values, so every computed column is aliased identically on both
sides. Double-typed aggregates are rounded on both sides to absorb
summation-order differences between engines.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyanamo_spark import semantics

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}


def register(
    name: str,
    oracle: str | None = None,
    needs_views: tuple[str, ...] = (),
):
    """Decorator: register a declared query.

    ``oracle=None`` marks a rows-only query (non-deterministic or not
    SQL-expressible); the driver then records the weaker check.
    ``needs_views`` lists semantic views (tasks/nests/job_states) the
    oracle SQL references — they are inlined as DuckDB CTEs.
    """

    def deco(fn):
        def wrapped(spark, sf_dir: str):
            semantics.ensure_views(spark, sf_dir)
            return fn(spark, sf_dir)

        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = (
                semantics.oracle_with_views(oracle, needs_views)
                if needs_views
                else oracle
            )
        return wrapped

    return deco


def load_all() -> None:
    """Import every module that registers declared queries."""
    import pyanamo_spark.operators.read_path  # noqa: F401
    import pyanamo_spark.operators.aggregates  # noqa: F401
    import pyanamo_spark.operators.joins  # noqa: F401
    import pyanamo_spark.operators.windows  # noqa: F401
    import pyanamo_spark.operators.mutation  # noqa: F401
    import pyanamo_spark.operators.ingest  # noqa: F401
    import pyanamo_spark.operators.logs  # noqa: F401
    import pyanamo_spark.operators.setops  # noqa: F401
    import pyanamo_spark.operators.analytics  # noqa: F401
    import pyanamo_spark.operators.tpch_mart  # noqa: F401
    import pyanamo_spark.operators.advanced  # noqa: F401
    import pyanamo_spark.operators.curation  # noqa: F401
    import pyanamo_spark.operators.packing  # noqa: F401
    import pyanamo_spark.functions.text  # noqa: F401
    import pyanamo_spark.functions.vectors  # noqa: F401
    import pyanamo_spark.functions.sketches  # noqa: F401
    import pyanamo_spark.dedup.exact  # noqa: F401
    import pyanamo_spark.dedup.minhash  # noqa: F401
    import pyanamo_spark.dedup.simhash  # noqa: F401
    import pyanamo_spark.dedup.ngram  # noqa: F401
    import pyanamo_spark.dedup.embedding  # noqa: F401
    import pyanamo_spark.dedup.incremental  # noqa: F401
    import pyanamo_spark.dedup.clusters  # noqa: F401
    import pyanamo_spark.similarity.knn  # noqa: F401
    import pyanamo_spark.similarity.ivf  # noqa: F401
    import pyanamo_spark.multimodal.pipeline  # noqa: F401
    import pyanamo_spark.executor.pipe  # noqa: F401
