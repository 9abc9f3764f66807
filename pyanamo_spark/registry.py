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
#: why each oracle-less query is rows-only BY CONTRACT (VERDICT r06
#: item 2: every rows-only id carries either an oracle or a documented
#: reason); surfaced in OPERATORS.md and enforced by
#: tests/test_registry_contract.py
ROWS_ONLY_REASONS: dict[str, str] = {}

#: SURVEY.md §2 declared query ids, in inventory order.  The driver's
#: CORRECTNESS recorder keeps only the first ~50 entries of ``queries()``,
#: so the declared inventory must lead the iteration order — extensions
#: follow (see ``ordered_queries``).
DECLARED: tuple[str, ...] = (
    # Rotation rule (one rotation per round, at round START so every
    # seat is actually recorded): driver-green ids cede their seats to
    # ids never yet driver-recorded; the entry() smoke query and a
    # small §2-spanning canary set never rotate, and any RED seat
    # stays until its fix is driver-green. Every ceded id stays
    # registered and fully replayed by driver_sim/test_parity each
    # round — only the official recording rotates.
    #
    # r12 window (VERDICT r11 item 6 — keep the rotation contract
    # rolling): 5 canaries + ALL 27 remaining r07-recorded greens
    # (after this window no id's driver record is older than 5 rounds)
    # + 10 changed-this-round re-seats (the global_rank_frame guard
    # became a left join with a null-n raise, changing every rank
    # consumer's plan — q_zipf/q_gini/q_curriculum/q_global_ids/
    # q_contrastive_pairs; the dedup family heads carry this round's
    # VERDICT cost work — simhash broadcast kernel, ngram df-broadcast
    # + slim pair dedup, clusters closure trim, embed tiling +
    # in-kernel verify, contain positional prune) + the 8
    # alphabetically-first r08 ids to fill the 50.
    #
    # canaries — one per §2 family, never rotated: scan+scalar
    # (q_ingest_csv), the entry() smoke (q_progress_histogram), join
    # (q_state_join), window (q_rolling_avg), dedup (q_dedup_exact)
    "q_ingest_csv",
    "q_progress_histogram",
    "q_state_join",
    "q_rolling_avg",
    "q_dedup_exact",
    # stale-proofing: every remaining r07-recorded green
    "q_autocorr",
    "q_backtest",
    "q_bigram_entropy",
    "q_changepoint",
    "q_decode_quarantine",
    "q_dedup_url",
    "q_degree_stats",
    "q_dup_by_source",
    "q_error_context",
    "q_fuzzy_match",
    "q_html_extract",
    "q_ks_drift",
    "q_langid_eval",
    "q_lock_protocol",
    "q_quality_filter",
    "q_quantize",
    "q_repetition",
    "q_rolling_median",
    "q_score_calibrate",
    "q_session_stats",
    "q_sliding_window",
    "q_streaks",
    "q_time_split",
    "q_top_paths",
    "q_vocab_coverage",
    "q_warc_ingest",
    "q_winsorize",
    # changed-this-round re-seats
    "q_zipf",
    "q_gini",
    "q_curriculum",
    "q_global_ids",
    "q_contrastive_pairs",
    "q_dedup_ngram",
    "q_dedup_clusters",
    "q_dedup_contain",
    "q_dedup_simhash",
    "q_dedup_embed",
    # oldest r08 greens (alphabetical; the rest rotate in r13)
    "q_bulk_update",
    "q_date_format",
    "q_dedup_lines",
    "q_delete_anti",
    "q_done_nests",
    "q_dup_spans",
    "q_event_window",
    "q_filter_project",
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
    rows_only_reason: str | None = None,
):
    """Decorator: register a declared query.

    ``oracle=None`` marks a rows-only query (non-deterministic or not
    SQL-expressible); the driver then records the weaker check, and
    ``rows_only_reason`` must say WHY no oracle is possible and what
    pins the semantics instead (the contract test enforces this).
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
        if rows_only_reason is not None:
            ROWS_ONLY_REASONS[name] = rows_only_reason
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
    import pyanamo_spark.provisioning  # noqa: F401
