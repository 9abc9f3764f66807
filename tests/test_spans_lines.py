"""Behavioral tests for line-boilerplate and span dedup beyond the
driver oracle: planted recovery, short-doc edges, all-boilerplate
fingerprint parity."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pyanamo_spark.dedup.lines import (
    HEADER_A,
    boilerplate_lines,
    chunk_lines,
    remove_boilerplate,
)
from pyanamo_spark.dedup.spans import (
    SPAN_WORDS,
    doc_spans,
    duplicated_spans,
    source_overlap,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_planted_span_found_and_short_docs_skipped(spark):
    span = "alpha beta gamma delta epsilon"
    assert len(span.split()) == SPAN_WORDS
    rows = [(i, f"{span} filler{i} tail{i}") for i in range(4)]
    rows += [(10, "too short"), (11, "one two three four")]  # < SPAN_WORDS
    corpus = _docs(spark, rows)
    assert (
        doc_spans(corpus).filter(F.col("doc_id").isin(10, 11)).count() == 0
    )
    found = duplicated_spans(corpus, min_docs=4).collect()
    assert [r["gram"] for r in found] == [span]
    assert found[0]["n_docs"] == 4 and found[0]["n_hits"] == 4


def test_all_boilerplate_doc_fingerprints_empty_join(spark):
    """A doc whose every chunk is boilerplate must fingerprint as
    md5('') — the cross-engine agreement ADVICE flagged."""
    ten = HEADER_A  # exactly 10 words, chunk-aligned
    rows = [(i, ten) for i in range(30)]  # 30 identical all-boiler docs
    rows.append((99, "unique words " + " ".join(f"w{j}" for j in range(8))))
    corpus = _docs(spark, rows)
    lines = chunk_lines(corpus)
    boiler = boilerplate_lines(lines, min_docs=30)
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate(lines, boiler).collect()
    }
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert out[0]["n_removed"] == 1
    assert out[0]["clean_fingerprint"] == empty_md5
    assert out[99]["n_removed"] == 0
    assert out[99]["clean_fingerprint"] != empty_md5


def test_source_overlap_counts_distinct_spans_once(spark):
    shared = "one two three four five"
    corpus = spark.createDataFrame(
        [
            (1, "sA", f"{shared} xA yA"),
            (2, "sA", f"{shared} zA qA"),  # same span again in sA
            (3, "sB", f"{shared} xB yB"),
            (4, "sC", "totally different words here now"),
        ],
        ["doc_id", "source", "text"],
    )
    got = {
        (r["source_a"], r["source_b"]): r["n_shared_grams"]
        for r in source_overlap(corpus).collect()
    }
    # the shared 5-gram counts ONCE per source pair despite appearing
    # in two sA docs; sC shares nothing
    assert got == {("sA", "sB"): 1}


def test_incremental_boilerplate_equals_global(spark, sf_dir, tmp_path):
    """Folding the corpus in as two disjoint crawl batches must yield
    exactly the global boilerplate digest set."""
    from pyanamo_spark import semantics
    from pyanamo_spark.dedup.lines import (
        _planted_corpus,
        current_boilerplate,
        update_boilerplate_store,
    )

    semantics.ensure_views(spark, sf_dir)
    corpus = _planted_corpus(
        spark.table("documents").select("doc_id", "text")
    )
    store = str(tmp_path / "boiler_store")
    update_boilerplate_store(
        spark, store, corpus.filter(F.col("doc_id") % 2 == 0), "b0"
    )
    update_boilerplate_store(
        spark, store, corpus.filter(F.col("doc_id") % 2 == 1), "b1"
    )
    incr = {
        (r["line_hash"], r["n_docs"])
        for r in current_boilerplate(spark, store).collect()
    }
    glob = {
        (r["line_hash"], r["n_docs"])
        for r in boilerplate_lines(chunk_lines(corpus)).collect()
    }
    assert incr == glob and incr


def test_boilerplate_store_rejects_recrawled_doc_ids(spark, sf_dir, tmp_path):
    """A batch re-ingesting doc_ids already folded into the store must
    fail loudly BEFORE writing: per-batch distinct counts would
    silently double-count re-crawled docs toward the threshold."""
    import os

    import pytest

    from pyanamo_spark import semantics
    from pyanamo_spark.dedup.lines import (
        _planted_corpus,
        update_boilerplate_store,
    )

    semantics.ensure_views(spark, sf_dir)
    corpus = _planted_corpus(
        spark.table("documents").select("doc_id", "text")
    )
    store = str(tmp_path / "boiler_store")
    update_boilerplate_store(
        spark, store, corpus.filter(F.col("doc_id") < 100), "b0"
    )
    overlapping = corpus.filter(F.col("doc_id") < 150)  # re-crawls 0..99
    with pytest.raises(ValueError, match="re-ingests doc_ids"):
        update_boilerplate_store(spark, store, overlapping, "b1")
    # nothing was written for the rejected batch
    assert not os.path.isdir(os.path.join(store, "batch=b1"))
    # a genuinely disjoint follow-up still lands
    update_boilerplate_store(
        spark, store, corpus.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 200)
        ), "b2"
    )


def test_dup_passages_merge_overlapping_hits(spark):
    """A 12-word passage shared by 3 docs must come back as ONE merged
    interval per doc (8 overlapping 5-grams -> one island), and an
    isolated shared 5-gram elsewhere as its own 5-word interval."""
    from pyanamo_spark.dedup.spans import duplicated_passages

    passage = " ".join(f"p{j}" for j in range(12))
    lone = "alpha beta gamma delta epsilon"
    rows = [
        (1, f"{passage} u1a u1b u1c {lone}"),
        (2, f"u2a {passage} u2b u2c {lone}"),
        (3, f"u3a u3b {passage} {lone} u3c"),
        (4, "totally different words with no shared grams at all"),
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicated_passages(corpus, min_docs=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["start_word"], r["end_word"], r["n_words"])
        )
    assert 4 not in by_doc
    # doc 1: passage at words 1-12, lone span at words 16-20
    assert sorted(by_doc[1]) == [(1, 12, 12), (16, 20, 5)]
    # doc 2: passage at words 2-13, lone at 16-20
    assert sorted(by_doc[2]) == [(2, 13, 12), (16, 20, 5)]
    # doc 3: passage at 3-14, lone IMMEDIATELY follows (words 15-19):
    # gap from gram start 10 to 15 is 5 == SPAN_WORDS -> same island,
    # one merged 3-19 interval
    assert sorted(by_doc[3]) == [(3, 19, 17)]


def test_dup_passages_empty_on_no_duplication(spark):
    from pyanamo_spark.dedup.spans import duplicated_passages

    rows = [(1, "a b c d e f"), (2, "g h i j k l")]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    assert duplicated_passages(corpus, min_docs=2).count() == 0


def test_dup_passages_randomized_brute_force(spark):
    """Randomized corpora vs an independent brute-force reference:
    tiny alphabet forces heavy gram collisions, mixed doc lengths
    exercise the sub-span and island edges."""
    import random

    from pyanamo_spark.dedup.spans import (
        SPAN_WORDS,
        duplicated_passages,
    )

    def brute(docs, min_docs):
        grams = {}
        for did, text in docs:
            ws = text.split(" ")
            for i in range(len(ws) - SPAN_WORDS + 1):
                g = " ".join(ws[i : i + SPAN_WORDS])
                grams.setdefault(g, set()).add(did)
        dup = {g for g, ds in grams.items() if len(ds) >= min_docs}
        out = set()
        for did, text in docs:
            ws = text.split(" ")
            hits = [
                i + 1
                for i in range(len(ws) - SPAN_WORDS + 1)
                if " ".join(ws[i : i + SPAN_WORDS]) in dup
            ]
            start = prev = None
            for i in hits:
                if start is None:
                    start = prev = i
                elif i - prev > SPAN_WORDS:
                    out.add((did, start, prev + SPAN_WORDS - 1))
                    start = prev = i
                else:
                    prev = i
            if start is not None:
                out.add((did, start, prev + SPAN_WORDS - 1))
        return out

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        docs = [
            (
                did,
                " ".join(
                    rng.choice("abcde")
                    for _ in range(rng.randint(0, 12))
                ),
            )
            for did in range(30)
        ]
        got = {
            (r["doc_id"], r["start_word"], r["end_word"])
            for r in duplicated_passages(
                spark.createDataFrame(docs, ["doc_id", "text"]),
                min_docs=3,
            ).collect()
        }
        assert got == brute(docs, 3), seed


def test_overlap_estimate_tracks_exact_matrix(spark, sf_dir):
    """HLL inclusion-exclusion estimates stay within sketch tolerance
    of the exact shared-gram counts for every source pair (error is
    ~1.6% of the UNION size, amplified by the subtraction — bound it
    by a few percent of the larger source)."""
    from pyanamo_spark import semantics
    from pyanamo_spark.dedup.spans import (
        source_overlap,
        source_overlap_estimate,
    )

    semantics.ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    exact = {
        (r.source_a, r.source_b): r.n_shared_grams
        for r in source_overlap(docs).collect()
    }
    sizes = {
        r.source: r.n
        for r in docs.selectExpr(
            "source", "explode(split(text, ' ')) AS w"
        )
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    est = {
        (r.source_a, r.source_b): r.est_shared_grams
        for r in source_overlap_estimate(docs).collect()
    }
    # every exact pair is present in the estimate matrix
    assert set(exact) <= set(est)
    for pair, e in est.items():
        x = exact.get(pair, 0)
        # three ±0.8% estimates (lgk=14) feed the subtraction, each
        # proportional to SET size: bound by ~2.5% of |A|+|B|
        tol = 0.025 * (sizes.get(pair[0], 0) + sizes.get(pair[1], 0)) + 5
        assert abs(e - x) <= tol, (pair, e, x, tol)


def test_boilerplate_store_rejects_legacy_format_before_writing(
    spark, sf_dir, tmp_path
):
    """Appending to a pre-r08 (md5-string line_hash) store must fail
    BEFORE the new bigint batch lands: a mixed-type store silently
    stops flagging old boilerplate, and the old deferred check only
    fired after the corruption had been written."""
    import os

    import pytest

    from pyanamo_spark import semantics
    from pyanamo_spark.dedup.lines import (
        _planted_corpus,
        update_boilerplate_store,
    )

    semantics.ensure_views(spark, sf_dir)
    store = str(tmp_path / "legacy_store")
    spark.createDataFrame(
        [("deadbeef" * 4, 31)], ["line_hash", "n_docs"]
    ).write.parquet(os.path.join(store, "batch=legacy"))
    corpus = _planted_corpus(
        spark.table("documents").select("doc_id", "text")
    )
    with pytest.raises(ValueError, match="line_hash type"):
        update_boilerplate_store(
            spark, store, corpus.filter(F.col("doc_id") < 50), "b_new"
        )
    assert not os.path.isdir(os.path.join(store, "batch=b_new"))
    assert not os.path.isdir(os.path.join(store, "_seen_docs"))
