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
#: sketch/codec algorithm DuckDB cannot replicate — engines cannot
#: agree on a value hash. The r08 window's rows-only seats: the 2 r07
#: red re-seats (arrays now serialized at the query boundary) plus the
#: 6 rows-only ids of the final never-recorded mop-up
#: (q_percentiles_approx and q_logit_score were converted rows-only →
#: oracle per VERDICT r07 item 5 and sit in ROTATED_IN_R08).
DECLARED_ROWS_ONLY: set[str] = {
    "q_pca_project",
    "q_multimodal_decode",
    "q_bpe_encode",
    "q_compress_filter",
    "q_knn_lsh",
    "q_knn_quantized",
    "q_semantic_prune",
    "q_multimodal_features",
}

#: never-rotated seats: the entry() smoke plus one canary per §2 family
CANARIES = {
    "q_ingest_csv",
    "q_progress_histogram",
    "q_state_join",
    "q_rolling_avg",
    "q_dedup_exact",
}

#: the two r07 RED seats (array-column canon crash): a red seat keeps
#: its place until it records clean — both now serialize their arrays
RED_SEATS_HELD: set[str] = {"q_pca_project", "q_multimodal_decode"}

#: ids whose recorded-window seat was ceded in the r07 rotation
#: (recorded in the r06 window: 46 green oracle seats + 4 rows-only by
#: contract); they must remain registered so the full replay keeps
#: verifying them
ROTATED_OUT_R07 = {
    # r05 reds, re-recorded green in r06
    "q_join_cardinality",
    "q_session_events",
    # §2 rows-only ids, re-recorded in modern form in r06 (no oracle)
    "q_rand_order",
    "q_sample_topk",
    "q_dedup_near",
    "q_approx_distinct",
    # the 39 oracle seats rotated in at r06, all recorded green
    "q_pagerank",
    "q_survival",
    "q_bm25",
    "q_hybrid_search",
    "q_crossval",
    "q_drift",
    "q_kanon",
    "q_basket_rules",
    "q_mv_refresh",
    "q_shard_plan",
    "q_token_budget",
    "q_dataset_card",
    "q_pivot",
    "q_funnel",
    "q_token_count",
    "q_lang_id",
    "q_big_orders",
    "q_brand_revenue",
    "q_custdist",
    "q_excess_suppliers",
    "q_idle_customers",
    "q_important_stock",
    "q_market_share",
    "q_min_cost_supplier",
    "q_product_profit",
    "q_promo_share",
    "q_returned_customers",
    "q_shipmode_priority",
    "q_small_qty_revenue",
    "q_supplier_parts",
    "q_waiting_suppliers",
    "q_dedup_contain",
    "q_transitions",
    "q_ltv",
    "q_gini",
    "q_pmi",
    "q_fingerprint",
    "q_quality_score",
    "q_heavy_hitters",
}

#: rows-only ids among the r07-rotated-out set (never had oracles)
ROTATED_OUT_ROWS_ONLY = {
    "q_rand_order",
    "q_sample_topk",
    "q_dedup_near",
    "q_approx_distinct",
}

#: r06-era rotation history, folded into the earlier set
ROTATED_OUT_R06 = {
    # green first recorded in r04 (and again in r05)
    "q_embed_covariance",
    "q_global_ids",
    "q_join_asof",
    "q_merge_upsert",
    "q_setops_fused",
    "q_dedup_stats",
    "q_mixture_weights",
    "q_bpe_pairs",
    "q_equidepth",
    # green first recorded in r05
    "q_model_score",
    "q_join_auto",
    "q_bloom_join",
    "q_salted_join",
    "q_skew_profile",
    "q_snapshot_diff",
    "q_scd2",
    "q_validate",
    "q_table_stats",
    "q_anomaly",
    "q_retention",
    "q_funnel_latency",
    "q_resample",
    "q_percentiles",
    "q_cube",
    "q_grouping_sets",
    "q_dedup_ngram",
    "q_dedup_embed",
    "q_dedup_incremental",
    "q_dedup_clusters",
    "q_dup_passages",
    "q_source_overlap",
    "q_source_similarity",
    "q_tfidf",
    "q_lm_score",
    "q_curation_funnel",
    "q_hash_split",
    "q_group_split",
    "q_scrub",
    "q_decontaminate",
    "q_chunk_documents",
    "q_stratified_sample",
    "q_group_sample",
    "q_weighted_sample",
}

#: ids rotated out in r05 or earlier — same staying-registered contract
ROTATED_OUT_EARLIER = {
    "q_filter_project",
    "q_nest_filter",
    "q_log_route",
    "q_map_align",
    "q_state_counts",
    "q_line_count",
    "q_done_nests",
    "q_item_finalize",
    "q_width_profile",
    "q_nest_build",
    "q_bulk_update",
    "q_item_reset",
    "q_map_update",
    "q_map_remove",
    "q_delete_anti",
    "q_partition_split",
    "q_tag_extract",
    "q_log_mine",
    "q_json_roundtrip",
    "q_event_window",
    "q_pipe_exec",
    "q_dedup_lines",
    "q_knn_topk",
    "q_text_stats",
    "q_vector_math",
    "q_join_equi",
    "q_join_semi",
    "q_join_anti",
    "q_join_range",
    "q_window_rank",
    "q_window_lag",
    "q_rollup",
    "q_setops",
    "q_sessionize",
    "q_dup_spans",
    "q_lang_mix",
    "q_limit",
    "q_point_lookup",
    "q_date_format",
    "q_threshold_counts",
}

#: ids whose seats were ceded in the r08 rotation, all recorded in the
#: r07 window: the 35 oracle seats rotated in at r07 (below) plus the
#: 8 rows-only family reps that recorded clean in r07
#: (q_dedup_simhash, q_knn_ivf, q_bpe_train, q_audio_features,
#: q_video_frames, q_pack_sequences, q_contrastive_pairs,
#: q_overlap_estimate)
ROTATED_OUT_R08_ROWS_ONLY = {
    "q_dedup_simhash",
    "q_knn_ivf",
    "q_bpe_train",
    "q_audio_features",
    "q_video_frames",
    "q_pack_sequences",
    "q_contrastive_pairs",
    "q_overlap_estimate",
}

#: the final 8 never-driver-recorded ids, seated at r08 (the r07
#: deferred mop-up): 2 newly oracle-backed + 6 rows-only (in
#: DECLARED_ROWS_ONLY). After these record, cumulative coverage is
#: 194/194.
ROTATED_IN_R08 = {
    "q_bpe_encode",
    "q_compress_filter",
    "q_knn_lsh",
    "q_knn_quantized",
    "q_logit_score",
    "q_multimodal_features",
    "q_percentiles_approx",
    "q_semantic_prune",
}

#: stale-proof re-seats (VERDICT r07 item 6): greens last recorded in
#: r01/r03/r04, re-recorded at r08 against the heavily-refactored
#: codebase — all 8 remaining r01 records, all 4 r03, and the 23
#: alphabetically-first r04 records. These ids appear in the
#: rotated-out history below; re-seating supersedes that.
RESEATED_R08 = {
    # r01 cohort
    "q_local_volume",
    "q_nation_traffic",
    "q_outliers",
    "q_pricing_summary",
    "q_priority_pending",
    "q_revenue_forecast",
    "q_top_orders",
    "q_top_supplier",
    # r03 cohort
    "q_date_format",
    "q_limit",
    "q_point_lookup",
    "q_threshold_counts",
    # r04 cohort (alphabetical prefix)
    "q_bulk_update",
    "q_dedup_lines",
    "q_delete_anti",
    "q_done_nests",
    "q_dup_spans",
    "q_event_window",
    "q_filter_project",
    "q_item_finalize",
    "q_item_reset",
    "q_join_anti",
    "q_join_equi",
    "q_join_range",
    "q_join_semi",
    "q_json_roundtrip",
    "q_knn_topk",
    "q_lang_mix",
    "q_line_count",
    "q_log_mine",
    "q_log_route",
    "q_map_align",
    "q_map_remove",
    "q_map_update",
    "q_nest_build",
}

#: the 35 oracle-backed seats rotated IN at r07 — never driver-recorded
#: before that window; all recorded green in r07 and ceded at r08
ROTATED_IN_R07 = {
    "q_lock_protocol",
    "q_dedup_url",
    "q_html_extract",
    "q_warc_ingest",
    "q_pdf_extract",
    "q_decode_quarantine",
    "q_repetition",
    "q_quality_filter",
    "q_zipf",
    "q_vocab_coverage",
    "q_bigram_entropy",
    "q_langid_eval",
    "q_fuzzy_match",
    "q_error_context",
    "q_sliding_window",
    "q_rolling_median",
    "q_ks_drift",
    "q_autocorr",
    "q_backtest",
    "q_seasonality",
    "q_changepoint",
    "q_anomaly_seasonal",
    "q_ab_test",
    "q_streaks",
    "q_winsorize",
    "q_session_stats",
    "q_coverage_curve",
    "q_curriculum",
    "q_time_split",
    "q_score_calibrate",
    "q_quantize",
    "q_degree_stats",
    "q_attribution",
    "q_top_paths",
    "q_dup_by_source",
}


def test_rotated_out_ids_stay_registered():
    gone = (
        ROTATED_IN_R07
        | ROTATED_OUT_R08_ROWS_ONLY
        | ROTATED_OUT_R07
        | ROTATED_OUT_R06
        | ROTATED_OUT_EARLIER
    ) - RESEATED_R08
    missing = [n for n in gone if n not in QUERIES]
    assert not missing, missing
    # every oracle'd rotated-out id keeps its oracle
    missing_oracle = [
        n
        for n in (ROTATED_IN_R07 | ROTATED_OUT_R07 | ROTATED_OUT_R06)
        - ROTATED_OUT_ROWS_ONLY
        - RESEATED_R08
        if n not in ORACLES
    ]
    assert not missing_oracle, missing_oracle
    # none of them still occupies a seat
    still_in = [n for n in gone if n in DECLARED]
    assert not still_in, still_in


def test_canaries_hold_their_seats():
    for n in CANARIES:
        assert n in DECLARED, n


def test_rotated_in_ids_sit_in_the_window():
    for n in ROTATED_IN_R08 | RESEATED_R08:
        assert n in DECLARED, n
    for n in RESEATED_R08:
        assert n in ORACLES, n
    for n in RED_SEATS_HELD | DECLARED_ROWS_ONLY:
        assert n in DECLARED, n
    # the converted ids really did gain oracles (VERDICT r07 item 5)
    assert "q_percentiles_approx" in ORACLES
    assert "q_logit_score" in ORACLES
    # window composition is exactly canaries + held red re-seats + the
    # final never-recorded mop-up + the stale-proof re-seats
    assert set(DECLARED) == (
        CANARIES | RED_SEATS_HELD | ROTATED_IN_R08 | RESEATED_R08
    )
    # every rows-only seat in the window is contractually documented
    assert DECLARED_ROWS_ONLY <= set(DECLARED)


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
        if n not in ORACLES and n not in DECLARED_ROWS_ONLY
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
