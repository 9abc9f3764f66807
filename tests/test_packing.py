"""Sequence-packing invariants (operators/packing.py) — the raw
assignment's properties are pinned here; the declared query is the
oracle-checked audit over the same assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyanamo_spark import semantics
from pyanamo_spark.operators.packing import BIN_CAPACITY, pack_sequences
from pyanamo_spark.registry import QUERIES


def test_audit_flags_green_and_catch_regressions(spark, sf_dir):
    """The declared audit certifies the fixture (all flags 1), and a
    sabotaged packing (every doc crammed into one bucket-wide bin —
    capacity blown AND every other bin gone) flips bin_ok — otherwise
    the oracle seat proves nothing."""
    from pyanamo_spark import operators

    rows = QUERIES["q_pack_sequences"](spark, sf_dir).collect()
    assert rows and all(r.bin_ok == 1 and r.fill_ok == 1 for r in rows)
    mod = operators.packing
    orig = mod.pack_sequences
    try:
        mod.pack_sequences = lambda spark: orig(spark).withColumn(
            "bin_id",
            (F.col("bin_id") / mod._BIN_STRIDE).cast("long")
            * mod._BIN_STRIDE,
        )
        broken = QUERIES["q_pack_sequences"](spark, sf_dir).collect()
    finally:
        mod.pack_sequences = orig
    # merging a bucket's bins into its bin 0 blows the capacity bound
    # for every multi-bin bucket; at least the merged docs must flip
    assert any(r.bin_ok == 0 for r in broken)


def test_every_doc_packed_exactly_once(spark, sf_dir):
    semantics.ensure_views(spark, sf_dir)
    packed = pack_sequences(spark)
    n_docs = spark.table("documents").count()
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs


def test_bins_respect_capacity(spark, sf_dir):
    semantics.ensure_views(spark, sf_dir)
    packed = pack_sequences(spark)
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("tok"), F.count("*").alias("n")
    )
    # a bin may exceed capacity only as a single oversized doc
    assert bins.filter(
        (F.col("tok") > BIN_CAPACITY) & (F.col("n") > 1)
    ).count() == 0


def test_packing_deterministic_and_efficient(spark, sf_dir):
    semantics.ensure_views(spark, sf_dir)
    a = {
        (r.doc_id, r.bin_id)
        for r in pack_sequences(spark).collect()
    }
    b = {
        (r.doc_id, r.bin_id)
        for r in pack_sequences(spark).collect()
    }
    assert a == b
    # fill efficiency: total bins within 25% of the token-mass lower
    # bound (FFD guarantees far better; this catches gross regressions)
    packed = pack_sequences(spark)
    total_tokens = packed.agg(F.sum("n_tokens")).collect()[0][0]
    n_bins = packed.select("bin_id").distinct().count()
    lower_bound = -(-total_tokens // BIN_CAPACITY)
    assert n_bins <= 1.25 * lower_bound + 16  # +1 tail bin per bucket
