"""Text-function behavioral tests for the claims the DuckDB oracle
cannot check: HLL estimate accuracy and language-mix invariants."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from pyanamo_spark import semantics
from pyanamo_spark.registry import QUERIES, load_all

load_all()


def test_approx_distinct_within_rsd(spark, sf_dir):
    """The raw HLL++ vocabulary estimate (library approx_vocab) must
    land within a conservative multiple of the configured 2% rsd of
    the exact per-language vocabulary, and the declared audit query
    must certify exactly that (all hll_ok flags 1, exact counts)."""
    from pyanamo_spark.functions.text import approx_vocab

    semantics.ensure_views(spark, sf_dir)
    got = {
        r["lang"]: r["approx_vocab"] for r in approx_vocab(spark).collect()
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
    audited = QUERIES["q_approx_distinct"](spark, sf_dir).collect()
    assert {r.lang: r.n_vocab for r in audited} == exact
    assert all(r.hll_ok == 1 for r in audited)


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


def test_lm_score_matches_python_reference(spark, sf_dir):
    """q_lm_score == an independent pure-Python unigram-LM fold over
    the same corpus (add-one smoothing, mean NLL), and fluent-vs-rare
    ordering holds on a planted pair."""
    import math
    from collections import Counter

    from pyanamo_spark.functions.text import q_lm_score

    out = {
        r["doc_id"]: (r["n_tokens"], r["nll"])
        for r in q_lm_score(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.table("documents").select("doc_id", "text").collect()
    }
    cnt: Counter = Counter()
    for text in docs.values():
        cnt.update(text.split(" "))
    n, v = sum(cnt.values()), len(cnt)
    for doc_id, text in list(docs.items())[:25]:
        toks = text.split(" ")
        nll = -sum(
            math.log((cnt[t] + 1.0) / (n + v)) for t in toks
        ) / len(toks)
        got_n, got_nll = out[doc_id]
        assert got_n == len(toks)
        assert abs(got_nll - nll) < 5e-4, doc_id


def test_lm_score_ranks_common_below_rare(spark):
    """A doc of corpus-frequent words must score lower nll than a doc
    of hapaxes."""
    from pyanamo_spark.functions.text import lm_score

    common = " ".join(["the quick brown fox"] * 10)
    rows = [(i, common) for i in range(9)]
    rows.append((100, "zxqv jkwp mmtr unseenword"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["nll"] for r in lm_score(df).collect()}
    assert out[0] < out[100]


def test_compression_filter_flags_repetitive_docs(spark):
    """A planted highly-repetitive doc must flag; natural-ish fixture
    prose must not; reruns are byte-identical (zlib is deterministic
    at a fixed level)."""
    from pyanamo_spark.functions.text import compression_stats

    docs = spark.createDataFrame(
        [
            (1, "word " * 400),
            (2, "the quick brown fox jumps over a lazy dog near the river "
                "bank while seven wizards mix quartz vials of strange brew "
                "and twelve jovial acrobats vault over frozen hedges"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in compression_stats(docs).collect()}
    assert rows[1]["too_repetitive"] is True
    assert rows[2]["too_repetitive"] is False
    assert rows[1]["ratio"] < rows[2]["ratio"]
    again = {r["doc_id"]: r for r in compression_stats(docs).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }
