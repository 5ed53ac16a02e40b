"""The named-query catalog: every engine capability is exposed as a
(name -> Spark builder, name -> oracle SQL) pair.

The Spark builder takes (spark, sf_dir) and returns a DataFrame; the
oracle is the equivalent ANSI SQL DuckDB runs on the same parquet
(views: region nation customer supplier part orders lineitem events
documents embeddings). Column names are aliased identically on both
sides — the correctness gate hashes values under sorted column names.

Determinism conventions (SURVEY §5):
- Aggregates over floating columns cast per-row to DECIMAL first,
  so the sum is exact and order-independent; final outputs cast back
  to DOUBLE (same exact value -> same double on both engines).
- Ratios/scores derived from exact integers go through :func:`ratio6`
  (pure int64 half-up rescaling) — never ``round()`` on a raw double,
  whose tie behavior differs between engines (round-3 lesson).
- Derived floats (sqrt, quantization error) are quantized to integer
  micro/nano-units with ``floor`` BEFORE any sum.
- Single correctly-rounded IEEE ops (sqrt, *, /, floor, max) on
  identical inputs are safe cross-engine; multi-term double sums and
  ``round()`` are not.
- Every top-k imposes a total order (unique-key tie-break).
- Array outputs are sorted before comparison.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def ratio6(num_sql: str, den_sql: str) -> Column:
    """``num/den`` rounded half-up to 6 dp via pure int64 arithmetic.

    ``round()`` on raw doubles is engine-fragile: Spark rounds the exact
    decimal expansion of the double (BigDecimal HALF_UP) while DuckDB
    rounds ``value * 1e6`` after an inexact multiply — near-tie values
    flip between them (the round-3 driver-gate failure class). Rescaling
    in integers sidesteps both: ``(a*2e6 + b) div (2*b)`` is the exact
    half-up integer, and dividing an int <= 2e6 by 1e6 is a single
    correctly-rounded IEEE op identical on every engine.

    Requires ``num >= 0`` and ``den > 0`` (both int64), with
    ``num * 2_000_000`` inside int64 — holds for all count/share ratios.
    """
    return F.expr(
        f"CAST((CAST(({num_sql}) AS BIGINT) * 2000000 + CAST(({den_sql}) AS BIGINT)) "
        f"div (2 * CAST(({den_sql}) AS BIGINT)) AS DOUBLE) / 1000000.0"
    )


def ratio6_sql(num_sql: str, den_sql: str) -> str:
    """DuckDB twin of :func:`ratio6` — identical integer arithmetic."""
    return (
        f"CAST((CAST(({num_sql}) AS BIGINT) * 2000000 + CAST(({den_sql}) AS BIGINT)) "
        f"// (2 * CAST(({den_sql}) AS BIGINT)) AS DOUBLE) / 1000000.0"
    )


def sratio6(num_sql: str, den_sql: str) -> Column:
    """Signed :func:`ratio6`: ``num`` may be negative, ``den`` > 0.

    Rounds half-AWAY-FROM-ZERO to 6 dp: the magnitude goes through the
    same exact non-negative int64 rescaling as ratio6, the sign is
    reapplied with a CASE (``sign()`` return types differ between
    engines; a comparison does not). Requires ``abs(num) * 2_000_000``
    inside int64.
    """
    n = f"CAST(({num_sql}) AS BIGINT)"
    d = f"CAST(({den_sql}) AS BIGINT)"
    mag = f"((abs({n}) * 2000000 + {d}) div (2 * {d}))"
    return F.expr(
        f"CAST((CASE WHEN {n} < 0 THEN -{mag} ELSE {mag} END) AS DOUBLE) / 1000000.0"
    )


def sratio6_sql(num_sql: str, den_sql: str) -> str:
    """DuckDB twin of :func:`sratio6` — identical integer arithmetic."""
    n = f"CAST(({num_sql}) AS BIGINT)"
    d = f"CAST(({den_sql}) AS BIGINT)"
    mag = f"((abs({n}) * 2000000 + {d}) // (2 * {d}))"
    return (
        f"CAST((CASE WHEN {n} < 0 THEN -{mag} ELSE {mag} END) AS DOUBLE) / 1000000.0"
    )


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => not SQL-expressible; rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}

# Queries already value-verified by a driver correctness gate.
# The driver samples the FIRST 50 entries of ``queries()``, so
# ``load_all`` orders (1) not-yet-driver-verified queries first —
# newly added queries and the three round-3 hash-fail fixes
# (doc_repetition_stats, events_props_typed, source_mixing_weights —
# deliberately NOT listed here) automatically land inside the sampling
# window — then (2) proven queries by EVIDENCE AGE, oldest first, so
# the window's remaining slots rotate re-verification through the
# queries whose green row is most stale.
_DRIVER_VERIFIED_R03: frozenset[str] = frozenset(
    {
        # hash-green rows of CORRECTNESS_r03.json
        "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_exact", "ann_lsh_topk",
        "benchmark_decontamination", "big_spenders_no_orders",
        "copurchase_triangles", "corpus_stage_counts",
        "customer_spend_percentiles", "customers_inactive_1998",
        "disjunctive_revenue", "doc_pii_scrub", "doc_sequence_packing",
        "doc_train_val_split", "embedding_centroids", "embedding_dim_stats",
        "embedding_norm_stats", "events_daily_deltas",
        "events_retention_cohorts", "events_running_value",
        "events_sliding_hour_value", "events_status_pivot",
        "events_user_type_cube", "image_header_dims",
        "important_stock_shares", "job_cv_matching_capped",
        "large_volume_customers", "media_header_meta",
        "nation_pair_trade_volumes", "nation_revenue_share",
        "parts_never_bulk_ordered", "parts_supplier_diversity",
        "purchase_click_attribution", "salted_event_type_stats",
        "signup_followup_counts", "skill_category_tags",
        "skill_confidence_scores", "skills_nlp_extraction",
        "small_quantity_revenue", "stratified_sample_lcg",
        "suppliers_with_bulk_shipments", "tfidf_top_terms",
        "token_budget_selection", "top_supplier_revenue", "user_top_event",
    }
)

_DRIVER_VERIFIED_R02: frozenset[str] = frozenset(
    {
        # CORRECTNESS_r02.json (oldest standing evidence)
        "doc_stats", "doc_language_id", "doc_quality", "keyword_catalog_tags",
        "doc_fingerprints", "doc_gopher_filter", "customer_order_history",
        "doc_bigrams", "skill_cooccurrence", "avg_price_by_segment_priority",
        "price_quantiles", "approx_distinct_stats", "price_qty_correlation",
        "docs_exact_dedup", "docs_jaccard_pairs", "docs_dedup_keep_best",
        "docs_ngram_jaccard_pairs", "docs_minhash_near_dups",
        "docs_simhash_near_dups", "embeddings_near_dup_cosine",
        "fuzzy_title_pairs", "minhash_md5_near_dups",
        "simhash_md5_signatures", "salary_parse_roundtrip",
        "salary_inference_grid", "surrogate_dim_ids", "sector_scoring_full",
        "contract_type_mix", "job_cv_matching", "top_matches_per_candidate",
        "events_daily_by_type", "events_hourly_windows",
        "events_sessionization", "events_type_mix", "user_funnel_conversion",
        "order_price_deciles", "events_json_props",
        "events_multi_grain_rollup", "q1_pricing_summary",
        "q3_top_unshipped", "q5_region_revenue", "q6_revenue_delta",
        "customers_without_orders", "active_nations_union",
        "top_parts_per_brand", "order_priority_mix", "part_size_rollup",
        "order_priority_check", "customer_order_distribution",
        "promo_revenue_share",
    }
)

_DRIVER_VERIFIED_R04: frozenset[str] = frozenset(
    {
        # hash-green rows of CORRECTNESS_r04.json
        "audio_frame_plan", "copurchase_clustering", "copurchase_jaccard_recs",
        "copurchase_kcore", "corpus_shuffle_plan", "cross_source_duplication",
        "customer_rfm_scores", "customer_spend_cumedist",
        "doc_bigram_commonness", "doc_chunk_spans", "doc_duplicate_ngram_frac",
        "doc_keyword_contexts", "docs_containment_pairs",
        "docs_prefix_filter_pairs", "event_type_transitions",
        "event_type_trend_slope", "event_value_gini", "events_dau_wau",
        "events_lttb_downsample", "events_sequence_match",
        "events_value_log2_histogram", "image_resize_dims",
        "minhash_estimate_error", "nation_top2_acctbal_lateral",
        "orders_fulfillment_lag", "simhash_md5_hamming_pairs",
        "user_status_intervals",
    }
)

_DRIVER_VERIFIED_R05: frozenset[str] = frozenset(
    {
        # hash-green rows of CORRECTNESS_r05.json (47/47 oracled sampled)
        "ann_cosine_range", "ann_l2_topk", "bpe_merge_candidates",
        "copurchase_pagerank", "curriculum_schedule", "cv_profile_stats",
        "doc_charclass_audit", "doc_repetition_ngram", "doc_repetition_stats",
        "doc_substring_dup_spans", "doc_tokenizer_fertility",
        "docs_dedup_cluster_sizes", "embedding_cross_moments",
        "embedding_ivf_balance", "embedding_pq_codes",
        "embedding_quantization_stats", "epoch_mixture_plan",
        "event_heavy_hitters", "event_path_counts", "events_ewma_daily",
        "events_hourly_anomalies", "events_props_typed",
        "events_props_variant", "events_rate_outliers",
        "excess_stock_suppliers", "image_pixel_stats",
        "image_resize_pixel_stats", "join_key_skew_audit",
        "label_centroid_similarity", "label_class_weights",
        "last_shippers_by_supplier", "min_cost_suppliers",
        "minhash_band_load", "nation_market_share", "open_orders_by_month",
        "orders_column_profile", "product_profit_by_nation",
        "referential_integrity_audit", "returned_revenue_topk",
        "skew_split_brand_volumes", "source_lang_mismatch",
        "source_mixing_weights", "supplier_market_concentration",
        "user_status_point_in_time", "user_value_twa", "vocab_oov_rate",
        "weighted_median_price",
    }
)

_DRIVER_VERIFIED_R06: frozenset[str] = frozenset(
    {
        # hash-green rows of CORRECTNESS_r06.json (47/47 oracled sampled;
        # 21 new round-6 queries + 26 rotated re-proofs of r02-era rows)
        "sentence_span_stats", "bigram_pmi_topk", "corpus_checksum",
        "lake_match_stats", "events_debounce", "events_sliding_distinct_users",
        "parts_pareto_frontier", "customers_all_priorities",
        "als_preference_matrix", "supplier_chain_rollup",
        "ffd_packing_invariants", "padding_waste_audit",
        "token_systematic_sample", "gif_pixel_stats", "jpeg_pixel_stats",
        "wav_sample_stats", "tiff_pixel_stats", "ann_hard_negatives",
        "embedding_truncation_audit", "version_diff_audit",
        # re-proofs of r02-era evidence against round-6 code:
        "doc_stats", "doc_language_id", "doc_quality", "keyword_catalog_tags",
        "doc_fingerprints", "doc_gopher_filter", "customer_order_history",
        "doc_bigrams", "skill_cooccurrence", "avg_price_by_segment_priority",
        "price_quantiles", "price_qty_correlation", "docs_exact_dedup",
        "docs_jaccard_pairs", "docs_dedup_keep_best",
        "docs_ngram_jaccard_pairs", "embeddings_near_dup_cosine",
        "fuzzy_title_pairs", "minhash_md5_near_dups",
        "simhash_md5_signatures", "salary_parse_roundtrip",
        "salary_inference_grid", "surrogate_dim_ids", "sector_scoring_full",
        "contract_type_mix", "job_cv_matching", "top_matches_per_candidate",
    }
)

_DRIVER_VERIFIED_R07: frozenset[str] = frozenset(
    {
        # hash-green rows of CORRECTNESS_r07.json (49/50; the one ERR,
        # inverted_index_stats, was an array-typed output column — fixed
        # in round 8 and deliberately NOT listed so it re-enters the
        # window as unproven)
        "active_nations_union", "ann_recall_audit", "bloom_prefilter_audit",
        "bm25_topk", "bpe_apply_fertility", "copurchase_label_propagation",
        "countmin_user_estimates", "customer_order_distribution",
        "customers_without_orders", "doc_winnowing_fingerprints",
        "embedding_kmeans_exact", "events_cusum_changepoint",
        "events_daily_by_type", "events_distribution_drift",
        "events_hourly_windows", "events_json_props",
        "events_multi_grain_rollup", "events_session_spans",
        "events_sessionization", "events_theilsen_slope", "events_type_mix",
        "fk_integrity_audit", "gif_frame_census", "greedy_vocab_cover",
        "grouped_kfold_assignment", "hll_registers_audit",
        "incremental_agg_refresh", "interlaced_png_pixel_stats",
        "kmv_distinct_estimate", "mp4_track_census", "nb_token_label_stats",
        "order_price_deciles", "order_priority_check", "order_priority_mix",
        "palette_png_pixel_stats", "part_size_rollup", "png16_pixel_stats",
        "price_mad_outliers", "priority_rate_by_price_decile",
        "promo_revenue_share", "q1_pricing_summary", "q3_top_unshipped",
        "q5_region_revenue", "rrf_hybrid_fusion", "source_vocab_jaccard",
        "token_simpson_diversity", "user_funnel_conversion",
        "vocab_coverage_curve", "zonemap_pruning_audit",
    }
)

_DRIVER_VERIFIED_R08: frozenset[str] = frozenset(
    {
        # hash-green rows of CORRECTNESS_r08.json (50/50 sampled green;
        # includes the round-7 red row inverted_index_stats, now fixed,
        # 12 first-contact round-8 queries, and 38 rotated re-proofs)
        "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_exact", "ann_lsh_topk",
        "benchmark_decontamination", "blocking_recall_audit",
        "cm_join_size_estimate", "copurchase_triangles",
        "corpus_stage_counts", "customer_spend_percentiles",
        "customers_inactive_1998", "doc_pii_scrub", "doc_sequence_packing",
        "doc_train_val_split", "embedding_centroids", "embedding_dim_stats",
        "embedding_norm_stats", "events_daily_deltas",
        "events_retention_cohorts", "events_running_value",
        "events_sliding_hour_value", "events_user_type_cube",
        "image_header_dims", "important_stock_shares",
        "interlaced_gif_pixel_stats", "inverted_index_stats",
        "job_cv_matching_capped", "job_cv_matching_prefiltered",
        "large_volume_customers", "log2_quantile_audit",
        "lowbit_png_pixel_stats", "lzw_tiff_pixel_stats",
        "media_header_meta", "nation_pair_trade_volumes",
        "nation_revenue_share", "parts_never_bulk_ordered",
        "progressive_jpeg_pixel_stats", "purchase_click_attribution",
        "q6_revenue_delta", "salted_event_type_stats",
        "signup_followup_counts", "stratified_sample_lcg",
        "suppliers_with_bulk_shipments", "tfidf_top_terms",
        "token_budget_selection", "top_parts_per_brand",
        "top_supplier_revenue", "trns_png_pixel_stats",
        "url_canonical_dedup", "webp_lossless_pixel_stats",
    }
)

_DRIVER_VERIFIED_R09: frozenset[str] = frozenset(
    {
        # hash-green rows of CORRECTNESS_r09.json (49/50; the one red,
        # semantic_dedup_stats, was rebuilt in round 10 — portable
        # shift-arithmetic oracle + the paper's keep-farthest rule —
        # and deliberately NOT listed so it re-enters as unproven.
        # Also not listed despite green r09 rows:
        # semantic_blocking_recall_audit (rebuilt r10 at tau=0.95
        # with planted twins) and events_sequence_match (r09 green
        # was a vacuous 0=0; de-vacuated r10 with a 6 h gap).
        "doc_unigram_surprisal", "dsir_importance_proxy",
        "flac_sample_stats", "jpeg12_pixel_stats",
        "manifest_pruning_audit", "mor_delete_audit",
        "schema_evolution_audit", "user_top_event",
        "big_spenders_no_orders", "disjunctive_revenue",
        "events_status_pivot", "parts_supplier_diversity",
        "skill_category_tags", "skill_confidence_scores",
        "skills_nlp_extraction", "small_quantity_revenue",
        "audio_frame_plan", "copurchase_clustering",
        "copurchase_jaccard_recs", "copurchase_kcore",
        "corpus_shuffle_plan", "cross_source_duplication",
        "customer_rfm_scores", "customer_spend_cumedist",
        "doc_bigram_commonness", "doc_chunk_spans",
        "doc_duplicate_ngram_frac", "doc_keyword_contexts",
        "docs_containment_pairs", "docs_prefix_filter_pairs",
        "event_type_transitions", "event_type_trend_slope",
        "event_value_gini", "events_dau_wau", "events_lttb_downsample",
        "events_value_log2_histogram", "image_resize_dims",
        "minhash_estimate_error", "nation_top2_acctbal_lateral",
        "orders_fulfillment_lag", "simhash_md5_hamming_pairs",
        "user_status_intervals", "ann_cosine_range", "ann_l2_topk",
        "bpe_merge_candidates", "copurchase_pagerank",
        "curriculum_schedule",
    }
)

# Queries whose SEMANTICS changed in a round AFTER older green rows
# were recorded: proofs from rounds BEFORE the reopen round no longer
# attest the current code, so only newer greens count. Round 10
# reopened events_sequence_match (r04/r09 greens were vacuous 0=0)
# and customers_without_orders (r02/r07 greens matched 0 rows at the
# gate SF); both earned genuine non-vacuous greens in the r10 gate
# (14 and 25 rows, CORRECTNESS_r10.json), which close the reopen.
_REOPENED_AT: dict[str, int] = {
    "events_sequence_match": 10,
    "customers_without_orders": 10,
    # r11 reopened the incremental match: probe-side sub-prefix cut
    # (sawtooth smoothing, r10 verdict task #5) changes its semantics
    # above the factor-1.5 tiers, so the r10 green no longer attests
    # the current code even though the sf0.01 output is unchanged.
    "semantic_incremental_match": 11,
    # r13 rewrote the three partitionless-ntile plans to distributed
    # bucketed ranking (deterministic order-aligned value buckets +
    # per-bucket row_number + broadcast prefix offsets, r12 verdict
    # task #1) and gave vocab_coverage_curve AND bm25_topk
    # group-limit-pushable rank<=max pre-filters (task #3). Outputs
    # are designed to be byte-identical, but the proofs that attested
    # the OLD plans no longer attest the new code, so all five
    # re-prove at the front of the r13 window.
    "order_price_deciles": 13,
    "priority_rate_by_price_decile": 13,
    "customer_rfm_scores": 13,
    "vocab_coverage_curve": 13,
    "bm25_topk": 13,
}

_DRIVER_VERIFIED_R10: frozenset[str] = frozenset(
    {
        # hash-green rows of CORRECTNESS_r10.json (49/50; the one red,
        # semantic_dedup_stats, is deliberately NOT listed — it has
        # never carried a green driver row and stays at the front of
        # the window alongside the round-11 probe queries that
        # decompose it).
        "audio_fp_near_dups", "bloom_point_lookup_audit",
        "customers_without_orders", "cv_profile_stats",
        "doc_charclass_audit", "doc_repetition_ngram",
        "doc_repetition_stats", "doc_substring_dup_spans",
        "doc_tokenizer_fertility", "docs_dedup_cluster_sizes",
        "embedding_cross_moments", "embedding_ivf_balance",
        "embedding_pq_codes", "embedding_quantization_stats",
        "epoch_mixture_plan", "event_heavy_hitters",
        "event_path_counts", "events_ewma_daily",
        "events_gapfill_ffill", "events_gapfill_lerp",
        "events_hourly_anomalies", "events_props_typed",
        "events_props_variant", "events_rate_outliers",
        "events_sequence_match", "image_dhash_hamming_pairs",
        "image_phash_near_dups", "image_pixel_stats",
        "image_resize_pixel_stats", "join_key_skew_audit",
        "k_anonymity_census", "label_centroid_similarity",
        "label_class_weights", "minhash_band_load",
        "mmr_diversified_topk", "mv_rollup_serving",
        "neardup_leakfree_split", "open_orders_by_month",
        "orders_column_profile", "referential_integrity_audit",
        "semantic_blocking_recall_audit", "semantic_incremental_match",
        "skew_split_brand_volumes", "source_lang_mismatch",
        "source_mixing_weights", "supplier_market_concentration",
        "user_status_point_in_time", "user_value_twa",
        "vocab_oov_rate",
    }
)

_DRIVER_VERIFIED_R11: frozenset[str] = frozenset(
    {
        # hash-green rows of CORRECTNESS_r11.json (49/50; the one red,
        # sdd_probe_dec38, was the DELIBERATE DECIMAL(38,0) rendering
        # canary — red exactly as designed, proving the r09/r10
        # semantic_dedup_stats divergence was a driver-environment
        # DECIMAL(38,0) fetch-rendering defect, not an engine wrong
        # answer. Finding banked; the canary is retired in round 12
        # (tools/oracle_type_audit.py enforces the resulting law:
        # no p>18 or scale-0 decimals at any gate output boundary).
        "candidate_recs_diversified", "sdd_probe_counts",
        "sdd_probe_dot_mod", "sdd_probe_drops", "sdd_probe_pairset",
        "semantic_dedup_stats", "semantic_incremental_match",
        "substring_family_census", "weighted_median_price",
        "excess_stock_suppliers", "last_shippers_by_supplier",
        "min_cost_suppliers", "nation_market_share",
        "product_profit_by_nation", "returned_revenue_topk",
        "als_preference_matrix", "ann_hard_negatives",
        "avg_price_by_segment_priority", "bigram_pmi_topk",
        "contract_type_mix", "corpus_checksum",
        "customer_order_history", "customers_all_priorities",
        "doc_bigrams", "doc_fingerprints", "doc_gopher_filter",
        "doc_language_id", "doc_quality", "doc_stats",
        "docs_dedup_keep_best", "docs_exact_dedup",
        "docs_jaccard_pairs", "docs_ngram_jaccard_pairs",
        "embedding_truncation_audit", "embeddings_near_dup_cosine",
        "events_debounce", "events_sliding_distinct_users",
        "ffd_packing_invariants", "fuzzy_title_pairs",
        "gif_pixel_stats", "job_cv_matching", "jpeg_pixel_stats",
        "keyword_catalog_tags", "lake_match_stats",
        "minhash_md5_near_dups", "padding_waste_audit",
        "parts_pareto_frontier", "price_qty_correlation",
        "price_quantiles",
    }
)

_DRIVER_VERIFIED_R12: frozenset[str] = frozenset(
    {
        # hash-green rows of CORRECTNESS_r12.json (50/50 — the first
        # fully-clean gate; the dec38 canary was retired in r12, its
        # finding banked as the no-p>18/scale-0-decimal law enforced
        # by tools/oracle_type_audit.py).
        "active_nations_union", "ann_recall_audit",
        "bloom_prefilter_audit", "bm25_topk", "bpe_apply_fertility",
        "candidate_recs_incremental", "copurchase_label_propagation",
        "countmin_user_estimates", "customer_order_distribution",
        "doc_winnowing_fingerprints", "embedding_kmeans_exact",
        "events_cusum_changepoint", "events_daily_by_type",
        "events_distribution_drift", "events_hourly_windows",
        "events_json_props", "events_multi_grain_rollup",
        "events_session_spans", "events_sessionization",
        "events_theilsen_slope", "events_type_mix",
        "fk_integrity_audit", "gif_frame_census", "greedy_vocab_cover",
        "grouped_kfold_assignment", "hll_registers_audit",
        "incremental_agg_refresh", "interlaced_png_pixel_stats",
        "mp4_track_census", "order_price_deciles",
        "palette_png_pixel_stats", "png16_pixel_stats",
        "price_mad_outliers", "priority_rate_by_price_decile",
        "salary_inference_grid", "salary_parse_roundtrip",
        "sector_scoring_full", "sentence_span_stats",
        "simhash_md5_signatures", "skill_cooccurrence",
        "substring_family_census_winnowed", "supplier_chain_rollup",
        "surrogate_dim_ids", "tiff_pixel_stats",
        "token_systematic_sample", "top_matches_per_candidate",
        "user_funnel_conversion", "version_diff_audit",
        "vocab_coverage_curve", "wav_sample_stats",
    }
)

_DRIVER_VERIFIED_R13: frozenset[str] = frozenset(
    {
        # hash-green rows of CORRECTNESS_r13.json (50/50 — second
        # consecutive fully-clean gate: 7 unproven new/reopened faces
        # + 13 r07-age + 30 r08-age re-proofs).
        "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_exact",
        "ann_lsh_topk", "benchmark_decontamination",
        "blocking_recall_audit", "bm25_topk",
        "candidate_recs_offer_arrivals", "copurchase_triangles",
        "corpus_stage_counts", "customer_rfm_scores",
        "customer_spend_percentiles", "customers_inactive_1998",
        "doc_pii_scrub", "doc_sequence_packing",
        "doc_train_val_split", "embedding_centroids",
        "embedding_dim_stats", "embedding_norm_stats",
        "events_daily_deltas", "events_retention_cohorts",
        "events_running_value", "events_sliding_hour_value",
        "events_user_type_cube", "image_header_dims",
        "important_stock_shares", "interlaced_gif_pixel_stats",
        "job_cv_matching_capped", "job_cv_matching_prefiltered",
        "kmv_distinct_estimate", "large_volume_customers",
        "lowbit_png_pixel_stats", "lzw_tiff_pixel_stats",
        "media_header_meta", "nb_token_label_stats",
        "order_price_deciles", "order_priority_check",
        "order_priority_mix", "part_size_rollup",
        "priority_rate_by_price_decile", "promo_revenue_share",
        "q1_pricing_summary", "q3_top_unshipped",
        "q5_region_revenue", "rrf_hybrid_fusion",
        "source_vocab_jaccard", "substring_family_census_hybrid",
        "token_simpson_diversity", "vocab_coverage_curve",
        "zonemap_pruning_audit",
    }
)

# Semantics note (round-5 verdict nit #3): membership in a
# _DRIVER_VERIFIED_R0N set means "the driver's round-N gate sampled the
# query and it did not fail". For ORACLED queries that is the strong
# claim: rows + schema + value-hash matched DuckDB. For the handful of
# rows-only queries (oracle=None — approx_distinct_stats,
# docs_minhash_near_dups, docs_simhash_near_dups in R02), it is the
# weaker claim "sampled in >=2 rounds with stable row counts"; their
# VALUE evidence lives in exact oracled twins (minhash_md5_near_dups,
# simhash_md5_hamming_pairs) and invariant test suites, not in the gate
# row itself. Keep that distinction in mind before citing this set as
# hash-green proof.
#
# Evidence age (round-6 verdict task #1): a query's effective proof age
# is the NEWEST round that sampled it green, so the 26 rows the round-6
# rotation re-proved carry r06 age even though they first passed in r02.
_PROOF_ROUNDS: tuple[tuple[int, frozenset[str]], ...] = (
    (2, _DRIVER_VERIFIED_R02),
    (3, _DRIVER_VERIFIED_R03),
    (4, _DRIVER_VERIFIED_R04),
    (5, _DRIVER_VERIFIED_R05),
    (6, _DRIVER_VERIFIED_R06),
    (7, _DRIVER_VERIFIED_R07),
    (8, _DRIVER_VERIFIED_R08),
    (9, _DRIVER_VERIFIED_R09),
    (10, _DRIVER_VERIFIED_R10),
    (11, _DRIVER_VERIFIED_R11),
    (12, _DRIVER_VERIFIED_R12),
    (13, _DRIVER_VERIFIED_R13),
)

_DRIVER_VERIFIED: frozenset[str] = frozenset().union(
    *(names for _, names in _PROOF_ROUNDS)
)

# Query modules whose source changed in rounds 5-6 AFTER older proof
# rows were recorded (git diff 83eb097..HEAD, the round-4 snapshot).
# Within an evidence-age block, queries built in these modules rotate
# into the window first: their green row is the most likely to have
# silently aged out from under them.
_MODULES_CHANGED_SINCE_R04: frozenset[str] = frozenset(
    {
        "dedup_queries", "domain_queries", "events_queries",
        "graph_queries", "mixing_queries", "multimodal_queries",
        "profiling_queries", "relational_extra2", "temporal_queries",
        "text_queries", "vector_queries", "versioned_queries",
        "analytics_queries",
    }
)


def _newest_proof_round(name: str) -> int:
    reopened_at = _REOPENED_AT.get(name, 0)
    newest = 0
    for rnd, names in _PROOF_ROUNDS:
        if rnd >= reopened_at and name in names:
            newest = rnd
    return newest


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    REGISTRY[spec.name] = spec
    return spec


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect registration)."""
    from . import analytics_queries  # noqa: F401
    from . import dedup_queries  # noqa: F401
    from . import domain_queries  # noqa: F401
    from . import events_queries  # noqa: F401
    from . import graph_queries  # noqa: F401
    from . import index_queries  # noqa: F401
    from . import layout_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import relational_extra  # noqa: F401
    from . import mixing_queries  # noqa: F401
    from . import multimodal_queries  # noqa: F401
    from . import profiling_queries  # noqa: F401
    from . import relational_extra2  # noqa: F401
    from . import relational_extra4  # noqa: F401
    from . import sketch_queries  # noqa: F401
    from . import skills_queries  # noqa: F401
    from . import temporal_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import vector_queries  # noqa: F401
    from . import versioned_queries  # noqa: F401

    # Driver-window ordering (the gate samples the FIRST 50 entries):
    #   1. unproven ORACLED queries — every new query gets a full value
    #      verification on first gate contact;
    #   2. proven oracled queries by EVIDENCE AGE, stalest first (age =
    #      newest round that sampled the query green, so rotated
    #      re-proofs reset their age); within an age block, queries
    #      whose implementing module changed since round 4 come first;
    #   3. ALL rows-only (oracle=None) queries at the very back —
    #      proven or not, their gate row can never say more than "rows
    #      stable" (round-6 verdict task #2: this includes the three
    #      _DRIVER_VERIFIED_R02 members that previously burned window
    #      slots), so the slot re-proves a stale hash-green query
    #      instead; their value evidence lives in oracled twins.
    def _order_key(item: tuple[str, QuerySpec]) -> tuple:
        name, spec = item
        if spec.oracle is None:
            return (3, 0, 0, name)
        newest = _newest_proof_round(name)
        if newest == 0:
            return (1, 0, 0, name)
        module = spec.spark.__module__.rsplit(".", 1)[-1]
        changed = 0 if module in _MODULES_CHANGED_SINCE_R04 else 1
        return (2, newest, changed, name)

    return dict(sorted(REGISTRY.items(), key=_order_key))
