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
#: a value hash
DECLARED_ROWS_ONLY = {
    "q_rand_order",
    "q_sample_topk",
    "q_dedup_near",
    "q_approx_distinct",
}


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
