"""Text-function behavioral tests for the claims the DuckDB oracle
cannot check: HLL estimate accuracy and language-mix invariants."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from pyanamo_spark import semantics
from pyanamo_spark.registry import QUERIES, load_all

load_all()


def test_approx_distinct_within_rsd(spark, sf_dir):
    """q_approx_distinct's HyperLogLog++ vocabulary estimate must land
    within a conservative multiple of the configured 2% rsd of the
    exact per-language vocabulary (rows-only query — this test is its
    accuracy contract)."""
    got = {
        r["lang"]: r["approx_vocab"]
        for r in QUERIES["q_approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["lang"]: r["exact_vocab"]
        for r in (
            spark.table("documents")
            .select("lang", F.explode(F.split("text", " ")).alias("tok"))
            .groupBy("lang")
            .agg(F.count_distinct("tok").alias("exact_vocab"))
            .collect()
        )
    }
    assert set(got) == set(exact)
    for lang, est in got.items():
        rel_err = abs(est - exact[lang]) / exact[lang]
        assert rel_err < 0.10, (lang, est, exact[lang])


def test_lang_mix_invariants(spark, sf_dir):
    """Per-source shares must sum to 1, entropy must be constant within
    a source, bounded by log2(#langs), and char volumes must tie back
    to the raw table."""
    semantics.ensure_views(spark, sf_dir)
    rows = QUERIES["q_lang_mix"](spark, sf_dir).collect()
    by_source = defaultdict(list)
    for r in rows:
        by_source[r["source"]].append(r)
    import math

    total_chars = spark.table("documents").agg(F.sum("n_chars")).first()[0]
    assert sum(r["n_chars"] for r in rows) == total_chars
    for source, rs in by_source.items():
        assert abs(sum(r["share"] for r in rs) - 1.0) < 1e-4, source
        ents = {r["source_entropy"] for r in rs}
        assert len(ents) == 1, source
        assert 0.0 <= ents.pop() <= math.log2(len(rs)) + 1e-9, source
