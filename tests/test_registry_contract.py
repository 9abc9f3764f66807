"""Registry/driver-contract invariants: the declared window is what the
driver records, so its composition and ordering must never regress."""

from __future__ import annotations

from pyanamo_spark.registry import (
    DECLARED,
    ORACLES,
    QUERIES,
    load_all,
    ordered_oracles,
    ordered_queries,
)

load_all()

#: declared ids that are rows-only BY CONTRACT: seeded randomness or a
#: sketch algorithm DuckDB cannot replicate — engines cannot agree on
#: a value hash. As of the r04 rotation every id in the recorded
#: window carries an oracle; the contractually rows-only ids
#: (q_rand_order, q_sample_topk, q_dedup_near, q_approx_distinct)
#: rotated out to the extensions tail — they stay registered and
#: replay-checked, their recorded seat was the weak rows-only check.
DECLARED_ROWS_ONLY: set[str] = set()

#: ids whose recorded-window seat was ceded in the r04 rotation; they
#: must remain registered (and oracle'd where applicable) so the full
#: replay keeps verifying them
ROTATED_OUT_R04 = {
    "q_rand_order",
    "q_sample_topk",
    "q_dedup_near",
    "q_approx_distinct",
    "q_limit",
    "q_point_lookup",
    "q_date_format",
    "q_threshold_counts",
}


def test_rotated_out_ids_stay_registered():
    missing = [n for n in ROTATED_OUT_R04 if n not in QUERIES]
    assert not missing, missing
    # oracle'd ids keep their oracles when they leave the window
    for n in ("q_limit", "q_point_lookup", "q_date_format", "q_threshold_counts"):
        assert n in ORACLES, n


def test_rotated_in_ids_sit_in_the_window():
    for n in (
        "q_global_ids",
        "q_join_asof",
        "q_merge_upsert",
        "q_setops_fused",
        "q_dedup_stats",
        "q_mixture_weights",
        "q_bpe_pairs",
        "q_equidepth",
    ):
        assert n in DECLARED, n
        assert n in ORACLES, n


def test_declared_ids_all_registered():
    missing = [n for n in DECLARED if n not in QUERIES]
    assert not missing, missing


def test_declared_lead_the_iteration_order():
    order = list(ordered_queries())
    assert order[: len(DECLARED)] == [n for n in DECLARED if n in QUERIES]
    # the recorded window (~50 entries) must be exactly the declared set
    assert len(DECLARED) == 50


def test_declared_have_oracles_unless_contractually_rows_only():
    missing = [
        n
        for n in DECLARED
        if n not in ORACLES and n not in DECLARED_ROWS_ONLY
    ]
    assert not missing, missing


def test_oracle_order_mirrors_query_order():
    qs = [n for n in ordered_queries() if n in ORACLES]
    assert qs == list(ordered_oracles())
