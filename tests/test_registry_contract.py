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

#: registered ids that are rows-only BY CONTRACT: seeded randomness or
#: a sketch/codec algorithm DuckDB cannot replicate — engines cannot
#: agree on a value hash. Each carries a documented reason
#: (ROWS_ONLY_REASONS) plus the behavioral test SURVEY §2.10 names as
#: its bar. r09 converted SIX ids out of this set: q_knn_lsh /
#: q_knn_ivf / q_approx_distinct / q_dedup_near / q_sample_topk via
#: in-engine audits (the q_percentiles_approx pattern), and
#: q_rand_order whose shuffled CONTENT was always order-insensitively
#: hashable. 20 -> 14 -> 0: the second conversion wave ended with
#: q_bpe_train (rank-1 merge checked exactly, later ranks certified
#: buildable), so every declared query now carries an oracle. The set
#: stays as the contract hook should a future operator genuinely need
#: the weaker check.
ROWS_ONLY_IDS: set[str] = set()

#: never-rotated seats: the entry() smoke plus one canary per §2 family
CANARIES = {
    "q_ingest_csv",
    "q_progress_histogram",
    "q_state_join",
    "q_rolling_avg",
    "q_dedup_exact",
}

#: re-seats whose semantics, oracle SQL, or physical plan changed in
#: r13 — a changed query must re-record or its cumulative row is stale
CHANGED_R13 = {
    # simhash: combo fan-out sized to cores, regime probe fused into
    # one limit-collect
    "q_dedup_simhash",
    # ngram family: struct-hashed shingles (no per-shingle string)
    "q_dedup_ngram",
    "q_dedup_contain",
    "q_dedup_clusters",
    # IVF: refined-centroid persist + append assignment persist
    "q_knn_ivf",
    "q_index_lifecycle",
    # BPE: vocabulary probe fused into one limit-collect
    "q_bpe_encode",
    "q_bpe_pairs",
    "q_bpe_train",
    # minhash: keyed doc_id prep partitioning (both consumers)
    "q_dedup_near",
    "q_contrastive_pairs",
}

#: stale-proof re-seats: ALL 28 remaining r08-recorded greens (after
#: this window no id's driver record is older than 5 rounds)
STALE_R13 = {
    "q_item_finalize", "q_item_reset", "q_join_anti", "q_join_equi",
    "q_join_range", "q_join_semi", "q_json_roundtrip", "q_knn_topk",
    "q_lang_mix", "q_limit", "q_line_count", "q_local_volume",
    "q_log_mine", "q_log_route", "q_logit_score", "q_map_align",
    "q_map_remove", "q_map_update", "q_nation_traffic", "q_nest_build",
    "q_outliers", "q_point_lookup", "q_pricing_summary",
    "q_priority_pending", "q_revenue_forecast", "q_threshold_counts",
    "q_top_orders", "q_top_supplier",
}

#: fill seats: the alphabetically-first r09 ids (the rest rotate r14)
FILL_R13 = {
    "q_anomaly", "q_approx_distinct", "q_audio_features",
    "q_bloom_join", "q_chunk_documents", "q_compress_filter",
}

#: every id the driver has EVER recorded (cumulative through r08 —
#: 194/194 as of the r08 close-out). Rotation never un-registers a
#: query: ceding a recorded seat only moves the official recording,
#: the full replay (driver_sim / test_parity) keeps verifying all of
#: them every round. This set is the anti-deletion contract.
EVER_RECORDED: set[str] = {
    "q_ab_test", "q_anomaly", "q_anomaly_seasonal", "q_approx_distinct",
    "q_attribution", "q_audio_features", "q_autocorr", "q_backtest",
    "q_basket_rules", "q_big_orders", "q_bigram_entropy", "q_bloom_join",
    "q_bm25", "q_bpe_encode", "q_bpe_pairs", "q_bpe_train",
    "q_brand_revenue", "q_bulk_update", "q_changepoint", "q_chunk_documents",
    "q_compress_filter", "q_contrastive_pairs", "q_coverage_curve", "q_crossval",
    "q_cube", "q_curation_funnel", "q_curriculum", "q_custdist",
    "q_dataset_card", "q_date_format", "q_decode_quarantine", "q_decontaminate",
    "q_dedup_clusters", "q_dedup_contain", "q_dedup_embed", "q_dedup_exact",
    "q_dedup_incremental", "q_dedup_lines", "q_dedup_near", "q_dedup_ngram",
    "q_dedup_simhash", "q_dedup_stats", "q_dedup_url", "q_degree_stats",
    "q_delete_anti", "q_done_nests", "q_drift", "q_dup_by_source",
    "q_dup_passages", "q_dup_spans", "q_embed_covariance", "q_equidepth",
    "q_error_context", "q_event_window", "q_excess_suppliers", "q_filter_project",
    "q_fingerprint", "q_funnel", "q_funnel_latency", "q_fuzzy_match",
    "q_gini", "q_global_ids", "q_group_sample", "q_group_split",
    "q_grouping_sets", "q_hash_split", "q_heavy_hitters", "q_html_extract",
    "q_hybrid_search", "q_idle_customers", "q_important_stock", "q_ingest_csv",
    "q_item_finalize", "q_item_reset", "q_join_anti", "q_join_asof",
    "q_join_auto", "q_join_cardinality", "q_join_equi", "q_join_range",
    "q_join_semi", "q_json_roundtrip", "q_kanon", "q_knn_ivf",
    "q_knn_lsh", "q_knn_quantized", "q_knn_topk", "q_ks_drift",
    "q_lang_id", "q_lang_mix", "q_langid_eval", "q_limit",
    "q_line_count", "q_lm_score", "q_local_volume", "q_lock_protocol",
    "q_log_mine", "q_log_route", "q_logit_score", "q_ltv",
    "q_map_align", "q_map_remove", "q_map_update", "q_market_share",
    "q_merge_upsert", "q_min_cost_supplier", "q_mixture_weights", "q_model_score",
    "q_multimodal_decode", "q_multimodal_features", "q_mv_refresh", "q_nation_traffic",
    "q_nest_build", "q_nest_filter", "q_outliers", "q_overlap_estimate",
    "q_pack_sequences", "q_pagerank", "q_partition_split", "q_pca_project",
    "q_pdf_extract", "q_percentiles", "q_percentiles_approx", "q_pipe_exec",
    "q_pivot", "q_pmi", "q_point_lookup", "q_pricing_summary",
    "q_priority_pending", "q_product_profit", "q_progress_histogram", "q_promo_share",
    "q_quality_filter", "q_quality_score", "q_quantize", "q_rand_order",
    "q_repetition", "q_resample", "q_retention", "q_returned_customers",
    "q_revenue_forecast", "q_rolling_avg", "q_rolling_median", "q_rollup",
    "q_salted_join", "q_sample_topk", "q_scd2", "q_score_calibrate",
    "q_scrub", "q_seasonality", "q_semantic_prune", "q_session_events",
    "q_session_stats", "q_sessionize", "q_setops", "q_setops_fused",
    "q_shard_plan", "q_shipmode_priority", "q_skew_profile", "q_sliding_window",
    "q_small_qty_revenue", "q_snapshot_diff", "q_source_overlap", "q_source_similarity",
    "q_state_counts", "q_state_join", "q_stratified_sample", "q_streaks",
    "q_supplier_parts", "q_survival", "q_table_stats", "q_tag_extract",
    "q_text_stats", "q_tfidf", "q_threshold_counts", "q_time_split",
    "q_token_budget", "q_token_count", "q_top_orders", "q_top_paths",
    "q_top_supplier", "q_transitions", "q_validate", "q_vector_math",
    "q_video_frames", "q_vocab_coverage", "q_waiting_suppliers", "q_warc_ingest",
    "q_weighted_sample", "q_width_profile", "q_window_lag", "q_window_rank",
    "q_winsorize", "q_zipf",
}


def test_ever_recorded_ids_stay_registered():
    missing = [n for n in EVER_RECORDED if n not in QUERIES]
    assert not missing, missing
    # every recorded id keeps an oracle unless contractually rows-only
    missing_oracle = [
        n
        for n in EVER_RECORDED
        if n not in ORACLES and n not in ROWS_ONLY_IDS
    ]
    assert not missing_oracle, missing_oracle


def test_canaries_hold_their_seats():
    for n in CANARIES:
        assert n in DECLARED, n


def test_r13_window_composition():
    # window is exactly canaries + changed re-seats + the stale-proof
    # cohort + the r09 fill seats
    assert (
        set(DECLARED) == CANARIES | CHANGED_R13 | STALE_R13 | FILL_R13
    )


def test_declared_ids_all_registered():
    missing = [n for n in DECLARED if n not in QUERIES]
    assert not missing, missing


def test_declared_lead_the_iteration_order():
    order = list(ordered_queries())
    assert order[: len(DECLARED)] == [n for n in DECLARED if n in QUERIES]
    # the recorded window (~50 entries) must be exactly the declared set
    assert len(DECLARED) == 50
    assert len(set(DECLARED)) == 50


def test_declared_have_oracles_unless_contractually_rows_only():
    missing = [
        n
        for n in DECLARED
        if n not in ORACLES and n not in ROWS_ONLY_IDS
    ]
    assert not missing, missing


def test_oracle_order_mirrors_query_order():
    qs = [n for n in ordered_queries() if n in ORACLES]
    assert qs == list(ordered_oracles())


def test_declared_queries_return_scalar_columns_only(spark, sf_dir):
    """Driver-canon contract: the driver canonicalizes results through
    pandas (sort_values + astype(str)), which CRASHES on array/map
    cells — CORRECTNESS_r05's q_session_events burned an oracle seat
    this way, and CORRECTNESS_r07's q_pca_project/q_multimodal_decode
    burned two ROWS-ONLY seats the same way (the driver sorts rows-only
    results too before counting). So the ban covers EVERY registered
    query, not just oracle-paired ones: complex values are emitted
    delimiter-joined (array_join / concat_ws) or unpacked into scalar
    columns at the declared-query boundary; the library functions keep
    the real array columns for direct callers.

    Schema-only: building the DataFrame is lazy for all but the few
    checkpoint-using plans, so this sweeps all ~194 queries in seconds
    at sf0.001.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, fn in ordered_queries().items():
        schema = fn(spark, sf_dir).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, f"complex-typed declared results: {offenders}"


def test_every_rows_only_query_documents_why():
    """VERDICT r06 item 2: each oracle-less query carries a documented
    reason (why no oracle is possible + what pins semantics instead),
    surfaced in OPERATORS.md."""
    from pyanamo_spark.registry import ROWS_ONLY_REASONS

    rows_only = [n for n in QUERIES if n not in ORACLES]
    missing = [n for n in rows_only if n not in ROWS_ONLY_REASONS]
    assert not missing, f"rows-only ids without a reason: {missing}"
    stale = [n for n in ROWS_ONLY_REASONS if n in ORACLES]
    assert not stale, f"reasons on oracle-backed ids: {stale}"
    short = [n for n, r in ROWS_ONLY_REASONS.items() if len(r) < 40]
    assert not short, f"reasons too thin to be useful: {short}"
