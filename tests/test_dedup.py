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
    from pyanamo_spark import semantics
    from pyanamo_spark.dedup.minhash import near_dup_pairs

    semantics.ensure_views(spark, sf_dir)
    rows = near_dup_pairs(spark).collect()
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
    from pyanamo_spark import semantics
    from pyanamo_spark.dedup.minhash import near_dup_pairs

    semantics.ensure_views(spark, sf_dir)
    a = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in near_dup_pairs(spark).collect()
    )
    b = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in near_dup_pairs(spark).collect()
    )
    assert a == b


def test_minhash_audit_certifies_and_catches_misses(spark, sf_dir):
    """The declared q_dedup_near audit must (a) certify the fixture —
    every planted mutant expected to match is found, found_ok all 1 —
    and (b) actually flip when the pipeline misses a pair."""
    rows = QUERIES["q_dedup_near"](spark, sf_dir).collect()
    n_planted = (
        spark.table("documents").filter("doc_id % 100 = 0").count()
    )
    assert len(rows) == n_planted
    assert all(r.found_ok == 1 for r in rows)
    assert any(r.expected_match == 1 for r in rows)
    # sabotage: recompute the audit against an EMPTY pair table — all
    # expected matches must now report found_ok = 0
    import pyanamo_spark.dedup.minhash as mh

    empty = spark.createDataFrame(
        [], "doc_a long, doc_b long, jaccard double"
    )
    orig = mh.near_dup_pairs
    mh.near_dup_pairs = lambda s, sf_dir=None: empty
    try:
        broken = QUERIES["q_dedup_near"].__wrapped__(spark, sf_dir).collect()
    finally:
        mh.near_dup_pairs = orig
    assert all(
        r.found_ok == (0 if r.expected_match else 1) for r in broken
    )


def test_simhash_finds_mutants_within_radius(spark, sf_dir):
    from pyanamo_spark.dedup import MUTANT_SUFFIX
    from pyanamo_spark.dedup.simhash import (
        HAMMING_MAX,
        _simhash64,
        simhash_pairs,
    )
    from pyanamo_spark import semantics

    semantics.ensure_views(spark, sf_dir)
    rows = simhash_pairs(spark).collect()
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


def test_simhash_triple_scheme_matches_pair_scheme(spark, sf_dir):
    """The adaptive blocking (r11/r12) must be output-invariant across
    ALL THREE regimes: the broadcast numpy kernel (the default at
    fixture scale), the 9-block pair-key JVM join, and the 10-block
    triple-key grouped JVM emission (the >_BROADCAST_MAX scale form).
    Each only fires in its measured window, so pin equality here by
    forcing the switches and comparing full pair sets. All three carry
    the same pigeonhole guarantee; any divergence is a blocking-recall
    (or broadcast first-combo-dedup) bug."""
    from pyanamo_spark import semantics
    from pyanamo_spark.dedup import simhash as sh

    semantics.ensure_views(spark, sf_dir)
    base = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in sh.simhash_pairs(spark).collect()
    )
    old_bc, old_tri = sh._BROADCAST_MAX, sh._TRIPLE_SWITCH
    sh._BROADCAST_MAX = 0  # force the JVM pair-key path
    try:
        pair = sorted(
            (r.doc_a, r.doc_b, r.hamming)
            for r in sh.simhash_pairs(spark).collect()
        )
        sh._TRIPLE_SWITCH = 0  # force the JVM triple-key path
        tri = sorted(
            (r.doc_a, r.doc_b, r.hamming)
            for r in sh.simhash_pairs(spark).collect()
        )
    finally:
        sh._BROADCAST_MAX, sh._TRIPLE_SWITCH = old_bc, old_tri
    assert base == pair
    assert base == tri


def test_simhash_deterministic_across_runs(spark, sf_dir):
    from pyanamo_spark import semantics
    from pyanamo_spark.dedup.simhash import simhash_pairs

    semantics.ensure_views(spark, sf_dir)
    a = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(spark).collect()
    )
    b = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(spark).collect()
    )
    assert a == b


def test_simhash_audit_flags_green_and_catch_regressions(spark, sf_dir):
    """The declared audit certifies the fixture (all ok=1 — what the
    oracle asserts as literal 1s), and a sabotaged pipeline (every
    pair dropped) must flip the flags of genuinely-findable pairs."""
    from pyanamo_spark.dedup import simhash as sh

    rows = QUERIES["q_dedup_simhash"](spark, sf_dir).collect()
    assert rows and all(r.ok == 1 for r in rows)
    assert {r.kind for r in rows} == {"dup", "mutant"}
    orig = sh.simhash_pairs
    try:
        sh.simhash_pairs = lambda spark, corpus=None: orig(
            spark, corpus
        ).filter("doc_a < 0")
        broken = QUERIES["q_dedup_simhash"](spark, sf_dir).collect()
    finally:
        sh.simhash_pairs = orig
    # every dup pair is findable by construction; a dropped pipeline
    # must zero those flags (mutant flags flip only where the
    # reference says the pair was in radius)
    assert all(r.ok == 0 for r in broken if r.kind == "dup")
    assert any(r.ok == 0 for r in broken if r.kind == "mutant")


def test_contain_prefix_filter_finds_all_boilerplate_pairs(
    spark, planted_views
):
    """ADVICE r05 regression: a contained doc whose shared shingles are
    ALL high-df (boilerplate duplicated across the whole corpus —
    exactly the content containment targets) must still pair with its
    containers. The old absolute max-df posting prune silently dropped
    such docs from candidate generation; the prefix filter's pigeonhole
    bound (keep the |A|−⌈T·|A|⌉+1 lowest-df shingles) guarantees recall
    at ANY df skew. 150 identical boilerplate docs make every shingle's
    df ≈ 150; the excerpt doc is fully contained in each of them."""
    from pyanamo_spark.dedup.ngram import CONTAIN_T, q_dedup_contain

    boiler = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    excerpt = "gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, boiler, "en") for i in range(150)] + [(900, excerpt, "en")]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).createOrReplaceTempView("documents")
    spark.conf.set("pyanamo_spark.views.sf_dir", "planted")

    out = q_dedup_contain.__wrapped__(spark, "planted").collect()
    found = {
        (r.contained_doc, r.container_doc)
        for r in out
        if r.contained_doc == 900
    }
    # the excerpt must be reported as contained in EVERY boilerplate doc
    # (corpus_with_mutants adds mutated copies — also valid containers)
    assert found >= {(900, i) for i in range(150)}
    assert all(
        r.containment >= CONTAIN_T for r in out if r.contained_doc == 900
    )


def test_ngram_index_cache_semantics(spark, sf_dir, tmp_path):
    """The shared prefix-filter index caches per (app, sf_dir) for real
    fixture directories, BYPASSES the cache for sentinel sf_dirs (tests
    plant ad-hoc documents views there), and evicts+unpersists the old
    corpus when a new one arrives."""
    from pyanamo_spark import semantics
    from pyanamo_spark.dedup import _NGRAM_INDEX, ngram_index

    semantics.ensure_views(spark, sf_dir)
    idx1 = ngram_index(spark, sf_dir)
    assert ngram_index(spark, sf_dir) is idx1  # cache hit
    key = (spark.sparkContext.applicationId, sf_dir)
    assert key in _NGRAM_INDEX

    # sentinel sf_dir: never cached, never evicts the real entry.
    # The conf marker must move with the replaced view, or a later
    # ensure_views(sf_dir) would skip re-registering and every
    # subsequent test would silently run on this 1-row corpus.
    spark.createDataFrame(
        [(1, "a b c d e", "en")], "doc_id long, text string, lang string"
    ).createOrReplaceTempView("documents")
    spark.conf.set("pyanamo_spark.views.sf_dir", "planted-sentinel")
    adhoc = ngram_index(spark, "planted-sentinel")
    assert adhoc is not ngram_index(spark, "planted-sentinel")
    assert key in _NGRAM_INDEX and _NGRAM_INDEX[key] is idx1

    # a second real corpus evicts (and unpersists) the first
    other = str(tmp_path / "corpus2")
    import os

    os.makedirs(other)
    semantics.ensure_views(spark, sf_dir)  # restore real views
    idx2 = ngram_index(spark, other)
    assert (spark.sparkContext.applicationId, other) in _NGRAM_INDEX
    assert key not in _NGRAM_INDEX
    # the NEW index is cached; eviction ran BEFORE persist, so even a
    # plan-identical old entry (same underlying view, as here) cannot
    # have cancelled it (idx1's storageLevel may still READ as cached
    # for exactly that plan-identity reason — only idx2's matters)
    assert idx2.prepped.storageLevel.useMemory
    assert idx2.prefix_pool.storageLevel.useMemory
    # leave the real-corpus index in place for other tests
    _NGRAM_INDEX.clear()
    ngram_index(spark, sf_dir)


def test_verified_pairs_memoized_on_shared_index(spark, sf_dir):
    """The family computes candidates+verify ONCE per cacheable
    corpus: q_dedup_ngram memoizes its verified pair frame on the
    shared index and q_dedup_clusters consumes the same frame — a
    second ngram call returns the memoized object, not a new plan."""
    from pyanamo_spark.dedup import _NGRAM_INDEX, ngram_index
    from pyanamo_spark.registry import QUERIES

    _NGRAM_INDEX.clear()
    first = QUERIES["q_dedup_ngram"](spark, sf_dir)
    idx = ngram_index(spark, sf_dir)
    assert idx.ngram_pairs is first
    assert first.storageLevel.useMemory
    assert QUERIES["q_dedup_ngram"](spark, sf_dir) is first
    # non-directory sf_dirs (planted test corpora) must NOT memoize:
    # a later planted corpus would otherwise read this corpus' pairs
    assert ngram_index(spark, "").ngram_pairs is None


def test_index_rebuilds_after_session_clearcache(spark, sf_dir):
    """bench.py runs spark.catalog.clearCache() after every query: the
    memoized index/pairs must detect the eviction and rebuild with a
    fresh persist, not serve frames that silently recompute on every
    action."""
    from pyanamo_spark.dedup import _NGRAM_INDEX, ngram_index
    from pyanamo_spark.registry import QUERIES

    _NGRAM_INDEX.clear()
    QUERIES["q_dedup_ngram"](spark, sf_dir)
    idx_before = ngram_index(spark, sf_dir)
    spark.catalog.clearCache()
    idx_after = ngram_index(spark, sf_dir)
    assert idx_after is not idx_before
    pairs = QUERIES["q_dedup_ngram"](spark, sf_dir)
    assert pairs.storageLevel.useMemory
    assert idx_after.prepped.storageLevel.useMemory


def test_minhash_mega_bucket_routes_through_skew_join(spark):
    """A boilerplate mega-cluster (one band bucket holding far more
    docs than MAX_COMBO_BUCKET) must still yield every pair: oversized
    buckets skip the in-task combinations explode and pair via the
    skew-splittable self-join branch instead."""
    from pyanamo_spark.dedup.minhash import (
        MAX_COMBO_BUCKET,
        candidate_pairs,
        JACCARD_THRESHOLD,
    )

    n = MAX_COMBO_BUCKET + 44  # forces the big-bucket branch
    same = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, same) for i in range(n)]
    rows += [(1000 + i, f"unique doc {i} " + " ".join(f"w{i}x{j}" for j in range(12)))
             for i in range(6)]
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = candidate_pairs(spark, corpus)
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in pairs.filter(jac >= JACCARD_THRESHOLD).collect()
    }
    want = {(a, b) for a in range(n) for b in range(n) if a < b}
    assert got == want  # all k(k-1)/2 identical-doc pairs, nothing else


def test_mutant_candidate_cache_semantics(spark, sf_dir):
    """The shared mutant-corpus LSH candidate table caches per
    (app, sf_dir) for real fixture dirs (q_dedup_near and
    q_contrastive_pairs consume one pipeline run), bypasses the cache
    for sentinel sf_dirs, and rebuilds after a session clearCache
    unpersists the memoized frame."""
    from pyanamo_spark import semantics
    from pyanamo_spark.dedup.minhash import (
        _MUTANT_CANDIDATES,
        mutant_candidate_pairs,
    )

    semantics.ensure_views(spark, sf_dir)
    p1 = mutant_candidate_pairs(spark, sf_dir)
    assert mutant_candidate_pairs(spark, sf_dir) is p1  # cache hit
    key = (spark.sparkContext.applicationId, sf_dir)
    assert key in _MUTANT_CANDIDATES
    # sentinel dirs never cache and never evict the real entry
    adhoc = mutant_candidate_pairs(spark, "planted-sentinel")
    assert adhoc is not p1
    assert _MUTANT_CANDIDATES[key] is p1
    # clearCache eviction: the memo must detect the lost storage and
    # rebuild rather than serve a silently-recomputing frame
    spark.catalog.clearCache()
    p2 = mutant_candidate_pairs(spark, sf_dir)
    assert p2 is not p1
    lvl = p2.storageLevel
    assert lvl.useMemory or lvl.useDisk


def test_embed_float32_candidates_superset_of_float64(spark):
    """The float32 chunked candidate stage may only ADD candidates
    relative to exact float64 selection at the tight margin — never
    drop one (the margin proof in dedup/embedding.py). Random blocks,
    including sizes that straddle the chunk boundary."""
    import numpy as np
    import pandas as pd

    from pyanamo_spark.dedup.embedding import (
        CAND_MARGIN,
        THRESHOLD,
        block_candidates,
    )

    rng = np.random.default_rng(7)
    for n in (3, 65, 513, 1030):
        base = rng.normal(size=(max((n + 3) // 4, 2), 64))
        # near-duplicate structure: jittered copies so pairs exist at
        # the threshold boundary region
        mat = np.concatenate(
            [base + rng.normal(0, 0.15, base.shape) for _ in range(4)]
        )[:n]
        ids = np.arange(n)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        sims = (mat @ mat.T) / np.outer(nrm, nrm)
        ai, bi = np.nonzero(np.triu(sims >= THRESHOLD - 2e-6, k=1))
        exact64 = set(zip(ai.tolist(), bi.tolist()))
        pdf = pd.DataFrame(
            {
                "vec_id": ids,
                "embedding": pd.Series(list(mat), dtype=object),
            }
        )
        got = block_candidates(pdf, THRESHOLD - CAND_MARGIN)
        got_pairs = set(zip(got["vec_a"].tolist(), got["vec_b"].tolist()))
        assert exact64 <= got_pairs, (n, exact64 - got_pairs)


def test_ngram_mega_bucket_routes_through_skew_join(spark, planted_views):
    """The r10 grouped bucket emission's skew valve: a boilerplate
    mega-cluster (every doc identical, so every prefix bucket holds
    far more members than MAX_COMBO_BUCKET) must route through the
    AQE-splittable self-join branch and still yield EXACTLY the
    all-pairs set — completeness and precision, both branches."""
    from pyanamo_spark.dedup import ngram_index
    from pyanamo_spark.dedup.minhash import MAX_COMBO_BUCKET
    from pyanamo_spark.dedup.ngram import verified_ngram_pairs

    n = MAX_COMBO_BUCKET + 44  # forces the big-bucket branch
    same = "the quick brown fox jumps over the lazy dog again and again"
    # odd ids: corpus_with_mutants plants mutants at doc_id % 100 == 0,
    # which would add near-dup pairs beyond the clean expectation
    rows = [(2 * i + 1, same, "en") for i in range(n)]
    rows += [
        (9001 + 2 * i, " ".join(f"u{i}x{j}" for j in range(14)), "en")
        for i in range(5)
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang"]
    ).createOrReplaceTempView("documents")
    try:
        idx = ngram_index(spark, "ngram-mega-sentinel")
        got = {
            (r.doc_a, r.doc_b)
            for r in verified_ngram_pairs(idx).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")
    ids = sorted(2 * i + 1 for i in range(n))
    want = {(a, b) for a in ids for b in ids if a < b}
    assert got == want


def test_embed_tiled_candidates_match_block_path(spark, sf_dir):
    """The sharded tile plan (r12) must be candidate-set-invariant vs
    the single-block-per-label form: a pair's two shards define exactly
    one tile, the fan-out puts both members there, and the bipartite
    kernel compares the sides completely. Forced here by shrinking
    _SHARD_ROWS so the fixture's labels split into several shards;
    survivors are compared on the DECLARED output (after exact float64
    verify, so float32 chunk-order noise inside the margin cannot flip
    the comparison)."""
    from pyanamo_spark import semantics
    from pyanamo_spark.dedup import embedding as em
    from pyanamo_spark.registry import QUERIES

    semantics.ensure_views(spark, sf_dir)
    base = sorted(
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in QUERIES["q_dedup_embed"](spark, sf_dir).collect()
    )
    old = em._SHARD_ROWS
    em._SHARD_ROWS = 37  # every label becomes multiple shards
    try:
        tiled = sorted(
            (r.vec_a, r.vec_b, r.cos_sim)
            for r in QUERIES["q_dedup_embed"](spark, sf_dir).collect()
        )
    finally:
        em._SHARD_ROWS = old
    assert base == tiled
    assert len(base) > 0  # the fixture plants a high-similarity tail
