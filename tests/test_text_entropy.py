"""Behavioral checks for vocab coverage and bigram conditional
entropy: full-coverage and boundary-tie vocab semantics; templated
corpora must score lower entropy than diverse ones."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("planted_views")


def _docs(spark, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars int"
    ).createOrReplaceTempView("documents")


def test_vocab_coverage_full_and_partial(spark):
    """A corpus whose whole vocabulary fits in the top-K is fully
    covered; a language made of rare one-off tokens is not."""
    from pyanamo_spark.functions.text import q_vocab_coverage

    rows = [(i, "a b a b", "en", "s", 7) for i in range(5)]
    # 300 distinct single-use tokens in 'xx': they lose every top-256
    # seat to the frequent en tokens except the lexicographic winners
    rows.append(
        (99, " ".join(f"tok{i:03d}" for i in range(300)), "xx", "s", 0)
    )
    _docs(spark, rows)
    got = {
        r["lang"]: (r["n_tokens"], r["coverage"])
        for r in q_vocab_coverage.__wrapped__(spark, "").collect()
    }
    assert got["en"] == (20, 1.0)  # 'a' and 'b' dominate the vocab
    n_xx, cov_xx = got["xx"]
    assert n_xx == 300
    # 254 of the 256 vocab seats go to xx tokens (a, b take two)
    assert cov_xx == pytest.approx(254 / 300, abs=1e-6)


def test_bigram_entropy_templated_below_diverse(spark):
    """A deterministic repeating template (every bigram predictable)
    has conditional entropy 0; a corpus where each 'a' is followed by
    a different word does not."""
    from pyanamo_spark.functions.text import q_bigram_entropy

    rows = [(i, "go stop go stop go", "tmpl", "s", 0) for i in range(3)]
    rows += [(10 + i, f"a w{i} a v{i}", "div", "s", 0) for i in range(4)]
    _docs(spark, rows)
    got = {
        r["lang"]: r["cond_entropy"]
        for r in q_bigram_entropy.__wrapped__(spark, "").collect()
    }
    assert got["tmpl"] == pytest.approx(0.0, abs=1e-9)
    assert got["div"] > 0.5


def test_dataset_card_planted_corpus(spark):
    """Hand-checkable card: 4 docs (one exact dup), two langs, one
    source; dup ratio 0.25, top lang 'en' at 0.75."""
    from pyanamo_spark.operators.curation import q_dataset_card

    rows = [
        (1, "a b c", "en", "s1", 5),
        (2, "a b c", "en", "s1", 5),  # exact duplicate of 1
        (3, "d e", "en", "s1", 3),
        (4, "f", "xx", "s1", 1),
    ]
    _docs(spark, rows)
    r = q_dataset_card.__wrapped__(spark, "").collect()[0]
    assert (r["n_docs"], r["n_sources"], r["n_langs"]) == (4, 1, 2)
    assert r["total_chars"] == 14 and r["total_ws_tokens"] == 9
    assert r["exact_dup_ratio"] == pytest.approx(0.25, abs=1e-6)
    assert r["mean_doc_chars"] == pytest.approx(3.5, abs=1e-6)
    assert r["median_doc_chars"] == pytest.approx(4.0, abs=1e-6)
    assert r["top_lang"] == "en"
    assert r["top_lang_share"] == pytest.approx(0.75, abs=1e-6)


def test_score_calibrate_aligns_shifted_sources(spark):
    """Source A has lengths {1,2,3,4}, source B {11,12,13,14}: raw
    thresholds are incomparable, but each source's calibrated scores
    are the identical ladder 0.25/0.5/0.75/1.0."""
    from pyanamo_spark.operators.curation import q_score_calibrate

    rows = []
    for i, n_tok in enumerate([1, 2, 3, 4]):
        rows.append((i, " ".join(["w"] * n_tok), "en", "A", 0))
    for i, n_tok in enumerate([11, 12, 13, 14]):
        rows.append((10 + i, " ".join(["w"] * n_tok), "en", "B", 0))
    _docs(spark, rows)
    out = q_score_calibrate.__wrapped__(spark, "").collect()
    by_source = {"A": {}, "B": {}}
    for r in out:
        by_source[r["source"]][r["raw_score"]] = r["calibrated"]
    assert by_source["A"] == {1: 0.25, 2: 0.5, 3: 0.75, 4: 1.0}
    assert by_source["B"] == {11: 0.25, 12: 0.5, 13: 0.75, 14: 1.0}


def test_langid_eval_confusion_cells(spark):
    """3 stopword-heavy docs labeled en, 1 labeled xx; 1 stopword-free
    doc labeled en → diagonal (en,en)=3 with row_share 0.75,
    off-diagonals (en,unknown)=1 and (xx,en)=1."""
    from pyanamo_spark.functions.text import q_langid_eval

    rows = [
        (1, "the cat of it", "en", "s", 0),
        (2, "the dog and it", "en", "s", 0),
        (3, "a fish is here", "en", "s", 0),
        (4, "the bird in sky", "xx", "s", 0),
        (5, "qqq www eee rrr", "en", "s", 0),
    ]
    _docs(spark, rows)
    got = {
        (r["lang"], r["predicted_lang"]): (r["n"], r["row_share"])
        for r in q_langid_eval.__wrapped__(spark, "").collect()
    }
    assert got == {
        ("en", "en"): (3, 0.75),
        ("en", "unknown"): (1, 0.25),
        ("xx", "en"): (1, 1.0),
    }


def test_token_budget_selects_best_buckets(spark):
    """Quality 1.0 docs hold 40 of 100 tokens, quality 0.5 docs hold
    60: a 50-token budget takes all of the best bucket (40) and
    cannot afford the next whole bucket."""
    from pyanamo_spark.operators.curation import q_token_budget

    rows = []
    # 4 docs of 10 tokens, all stopwords -> s = 1.0
    for i in range(4):
        rows.append((i, " ".join(["the"] * 10), "en", "s", 0))
    # 6 docs of 10 tokens, half stopwords -> s = 0.5
    for i in range(6):
        rows.append((10 + i, " ".join(["the"] * 5 + ["zz"] * 5), "en", "s", 0))
    _docs(spark, rows)
    r = q_token_budget.__wrapped__(spark, "").collect()[0]
    assert r["budget_tokens"] == 50.0
    assert r["threshold_score"] == 1.0
    assert (r["n_docs_selected"], r["tokens_selected"]) == (4, 40)
    assert r["utilization"] == 0.8


def test_coverage_curve_monotone_and_exact(spark):
    """Coverage is non-decreasing in k and hits 1.0 once the vocab
    holds every distinct token."""
    from pyanamo_spark.functions.text import q_coverage_curve

    rows = [(i, "a a b c d" + f" tok{i}", "en", "s", 0) for i in range(10)]
    _docs(spark, rows)
    out = sorted(
        q_coverage_curve.__wrapped__(spark, "").collect(),
        key=lambda r: r["vocab_size"],
    )
    assert [r["vocab_size"] for r in out] == [64, 128, 256, 512, 1024]
    covs = [r["coverage"] for r in out]
    assert covs == sorted(covs)
    assert covs[-1] == 1.0  # 14 distinct tokens all fit at k=64 too
    assert covs[0] == 1.0


def test_dup_by_source_cross_source_attribution(spark):
    """doc 100 is copied into the planted recrawl source: both its
    original source and recrawl show one cross-source duplicate; the
    untouched source shows zero."""
    from pyanamo_spark.dedup.exact import q_dup_by_source

    rows = [
        (100, "shared text", "en", "A", 11),  # doc_id%100==0 -> copied
        (3, "unique a", "en", "A", 8),
        (7, "unique b", "en", "B", 8),
    ]
    _docs(spark, rows)
    got = {
        r["source"]: (
            r["n_docs"],
            r["dup_docs"],
            r["cross_source_docs"],
        )
        for r in q_dup_by_source.__wrapped__(spark, "").collect()
    }
    assert got == {
        "A": (2, 1, 1),
        "B": (1, 0, 0),
        "recrawl": (1, 1, 1),
    }
