"""Curation operators (operators/curation.py): value correctness is
oracle-checked by test_parity/driver_sim; these pin the *properties*
a training pipeline relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyanamo_spark.registry import QUERIES


def test_hash_split_fractions_and_stability(spark, sf_dir):
    rows = QUERIES["q_hash_split"](spark, sf_dir).collect()
    n = len(rows)
    frac = {
        s: sum(1 for r in rows if r.split == s) / n
        for s in ("train", "val", "test")
    }
    # 12/16 : 2/16 : 2/16 with generous tolerance at small n
    assert 0.65 < frac["train"] < 0.85
    assert 0.05 < frac["val"] < 0.20
    assert 0.05 < frac["test"] < 0.20
    # same assignment on a rerun — the split is a pure function of key
    again = {r.doc_id: r.split for r in QUERIES["q_hash_split"](spark, sf_dir).collect()}
    assert all(again[r.doc_id] == r.split for r in rows)


def test_scrub_removes_every_occurrence(spark, sf_dir):
    df = QUERIES["q_scrub"](spark, sf_dir)
    assert df.filter(F.col("scrubbed").rlike(r"\b(customer|supplier)\b")).count() == 0
    assert df.filter(F.col("n_scrubbed") > 0).count() > 0


def test_decontaminate_excludes_benchmark_docs(spark, sf_dir):
    df = QUERIES["q_decontaminate"](spark, sf_dir)
    assert df.filter(F.col("doc_id") % 500 == 0).count() == 0
    assert df.filter(F.col("n_bench_hits") <= 0).count() == 0


def test_stratified_sample_rates_and_stability(spark, sf_dir):
    from pyanamo_spark.operators.curation import _STRATA_THRESHOLDS

    docs = spark.table("documents")
    before = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    kept_rows = QUERIES["q_stratified_sample"](spark, sf_dir).collect()
    kept = {}
    for r in kept_rows:
        kept[r.lang] = kept.get(r.lang, 0) + 1
    for lang, n in before.items():
        rate = (
            int(_STRATA_THRESHOLDS[lang], 16) / 65536
            if lang in _STRATA_THRESHOLDS
            else 1.0
        )
        if rate == 1.0:
            # unsampled strata pass through untouched, exactly
            assert kept.get(lang, 0) == n
        else:
            # hash draws are uniform; binomial 4-sigma tolerance
            import math

            sigma = math.sqrt(n * rate * (1 - rate))
            assert abs(kept.get(lang, 0) - n * rate) < 4 * sigma + 1
    # pure function of the key: identical set on rerun
    again = {
        (r.doc_id, r.lang)
        for r in QUERIES["q_stratified_sample"](spark, sf_dir).collect()
    }
    assert again == {(r.doc_id, r.lang) for r in kept_rows}


def test_chunking_reconstructs_documents(spark, sf_dir):
    from pyanamo_spark.operators.curation import _CHUNK, _OVERLAP

    chunks = QUERIES["q_chunk_documents"](spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.table("documents").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        # dropping each successor's overlap reconstructs the doc exactly
        toks = rs[0].chunk.split(" ")
        for r in rs[1:]:
            toks += r.chunk.split(" ")[_OVERLAP:]
        assert toks == docs[doc_id]
        for r in rs:
            assert 1 <= r.chunk_tokens <= _CHUNK
            assert r.chunk_tokens == len(r.chunk.split(" "))


def test_group_sample_fixed_size_and_stable(spark, sf_dir):
    from pyanamo_spark.operators.curation import _GROUP_SAMPLE_K

    rows = QUERIES["q_group_sample"](spark, sf_dir).collect()
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    totals = {
        r.lang: r.n
        for r in spark.table("documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, total in totals.items():
        assert per_lang.get(lang, 0) == min(_GROUP_SAMPLE_K, total)
    again = {
        (r.doc_id, r.lang)
        for r in QUERIES["q_group_sample"](spark, sf_dir).collect()
    }
    assert again == {(r.doc_id, r.lang) for r in rows}


def test_curation_funnel_monotone(spark, sf_dir):
    from pyanamo_spark.operators.curation import q_curation_funnel

    rows = sorted(
        q_curation_funnel(spark, sf_dir).collect(),
        key=lambda r: r["stage_rank"],
    )
    assert [r["stage"] for r in rows] == [
        "raw", "dedup", "quality", "fluent", "train",
    ]
    counts = [r["n_docs"] for r in rows]
    chars = [r["n_chars"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert chars == sorted(chars, reverse=True)
    assert counts[0] == spark.table("documents").count()
    # the quality and fluency gates must actually discriminate
    assert counts[2] < counts[1]
    assert counts[3] < counts[2]
    # fluency keeps ~half of the quality survivors (median cutoff)
    assert abs(counts[3] - counts[2] / 2) <= counts[2] * 0.1 + 1
