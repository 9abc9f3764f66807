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
    # Rotation rule (one rotation per round, at round START so every
    # seat is actually recorded): driver-green ids cede their seats to
    # ids never yet driver-recorded; the entry() smoke query and a
    # small §2-spanning canary set never rotate, and any RED seat
    # stays until its fix is driver-green. r06 note: the original rule
    # required green in TWO consecutive windows before ceding, but the
    # never-recorded backlog hit 86/188 in r05, so the r06 rotation
    # relaxes to once-green-cede (every ceded id stays registered and
    # fully replayed by driver_sim/test_parity each round — only the
    # official recording rotates). r06 window: 5 canaries + the 2
    # r05-red seats (q_join_cardinality, q_session_events — fixes must
    # record green) + the 4 §2 rows-only ids (last recorded r03; the
    # verdict asks for a modern record of every §2 id) + 39
    # never-recorded ids, one family representative first. Cumulative
    # recorded coverage 102 → ~141 of 188.
    #
    # canaries — one per §2 family, never rotated: scan+scalar
    # (q_ingest_csv), the entry() smoke (q_progress_histogram), join
    # (q_state_join), window (q_rolling_avg), dedup (q_dedup_exact)
    "q_ingest_csv",
    "q_progress_histogram",
    "q_state_join",
    "q_rolling_avg",
    "q_dedup_exact",
    # red in CORRECTNESS_r05 (harness-canon bugs, fixed in r06) —
    # seated until driver-green
    "q_join_cardinality",
    "q_session_events",
    # §2-declared rows-only ids (seeded randomness / sketches — no
    # oracle by contract): re-recorded once in their modern form
    "q_rand_order",
    "q_sample_topk",
    "q_dedup_near",
    "q_approx_distinct",
    # never-driver-recorded: family representatives first
    "q_pagerank",
    "q_survival",
    "q_bm25",
    "q_hybrid_search",
    "q_crossval",
    "q_drift",
    "q_kanon",
    "q_basket_rules",
    "q_mv_refresh",
    "q_shard_plan",
    "q_token_budget",
    "q_dataset_card",
    # r02-era stragglers
    "q_pivot",
    "q_funnel",
    "q_token_count",
    "q_lang_id",
    # TPC-H wave
    "q_big_orders",
    "q_brand_revenue",
    "q_custdist",
    "q_excess_suppliers",
    "q_idle_customers",
    "q_important_stock",
    "q_market_share",
    "q_min_cost_supplier",
    "q_product_profit",
    "q_promo_share",
    "q_returned_customers",
    "q_shipmode_priority",
    "q_small_qty_revenue",
    "q_supplier_parts",
    "q_waiting_suppliers",
    # remaining family fill
    "q_dedup_contain",
    "q_transitions",
    "q_ltv",
    "q_gini",
    "q_pmi",
    "q_fingerprint",
    "q_quality_score",
    "q_heavy_hitters",
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
    import pyanamo_spark.operators.locking  # noqa: F401
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
    import pyanamo_spark.operators.graph  # noqa: F401
    import pyanamo_spark.operators.governance  # noqa: F401
    import pyanamo_spark.operators.market  # noqa: F401
    import pyanamo_spark.functions.text  # noqa: F401
    import pyanamo_spark.functions.html  # noqa: F401
    import pyanamo_spark.functions.bpe  # noqa: F401
    import pyanamo_spark.functions.vectors  # noqa: F401
    import pyanamo_spark.functions.sketches  # noqa: F401
    import pyanamo_spark.functions.pca  # noqa: F401
    import pyanamo_spark.functions.model  # noqa: F401
    import pyanamo_spark.dedup.exact  # noqa: F401
    import pyanamo_spark.dedup.urls  # noqa: F401
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
    import pyanamo_spark.similarity.hybrid  # noqa: F401
    import pyanamo_spark.multimodal.pipeline  # noqa: F401
    import pyanamo_spark.sources.warc  # noqa: F401
    import pyanamo_spark.sources.pdf  # noqa: F401
    import pyanamo_spark.executor.pipe  # noqa: F401
