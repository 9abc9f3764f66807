"""Dedup-suite behavioral tests beyond oracle parity: the rows-only
operators (MinHash-LSH, SimHash) must actually find the planted
mutant pairs, deterministically."""

from __future__ import annotations

from pyanamo_spark.dedup import MUTANT_OFFSET
from pyanamo_spark.registry import QUERIES, load_all

load_all()


def _mutant_pairs(rows):
    return {
        (r.doc_a, r.doc_b)
        for r in rows
        if r.doc_b - r.doc_a == MUTANT_OFFSET
    }


def test_minhash_finds_all_planted_mutants(spark, sf_dir):
    rows = QUERIES["q_dedup_near"](spark, sf_dir).collect()
    docs = QUERIES["q_text_stats"]  # force registry import side effects
    _ = docs
    planted = {
        (r.doc_id, r.doc_id + MUTANT_OFFSET)
        for r in spark.table("documents")
        .filter("doc_id % 100 = 0")
        .select("doc_id")
        .collect()
    }
    found = _mutant_pairs(rows)
    # every planted near-dup must surface through the LSH bands
    assert planted <= found
    # and every reported pair must clear the verify threshold
    assert all(r.jaccard >= 0.5 for r in rows)


def test_minhash_deterministic(spark, sf_dir):
    a = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in QUERIES["q_dedup_near"](spark, sf_dir).collect()
    )
    b = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in QUERIES["q_dedup_near"](spark, sf_dir).collect()
    )
    assert a == b


def test_simhash_finds_mutants_within_radius(spark, sf_dir):
    from pyanamo_spark.dedup import MUTANT_SUFFIX
    from pyanamo_spark.dedup.simhash import HAMMING_MAX, _simhash64

    rows = QUERIES["q_dedup_simhash"](spark, sf_dir).collect()
    # blocking guarantees detection only within the Hamming radius —
    # compute each planted pair's true distance and expect exactly those
    expected = set()
    for r in (
        spark.table("documents")
        .filter("doc_id % 100 = 0")
        .select("doc_id", "text")
        .collect()
    ):
        a = _simhash64(r.text)
        b = _simhash64(r.text + MUTANT_SUFFIX)
        if bin((a ^ b) & ((1 << 64) - 1)).count("1") <= HAMMING_MAX:
            expected.add((r.doc_id, r.doc_id + MUTANT_OFFSET))
    assert expected, "fixture must contain in-radius mutant pairs"
    found = _mutant_pairs(rows)
    assert expected <= found
    assert all(r.hamming <= HAMMING_MAX for r in rows)


def test_simhash_deterministic_across_runs(spark, sf_dir):
    a = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in QUERIES["q_dedup_simhash"](spark, sf_dir).collect()
    )
    b = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in QUERIES["q_dedup_simhash"](spark, sf_dir).collect()
    )
    assert a == b
