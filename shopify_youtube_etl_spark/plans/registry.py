"""Declared-query registry — the driver contract.

Every operator claimed in SURVEY.md §2 registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
an equivalent ANSI-SQL oracle string that DuckDB runs on the same
parquet tables.  ``__spark_entry__.py`` re-exports this registry.

Parity rules (SURVEY §7 risks 3-6):
- alias every computed column identically in Spark and oracle SQL;
- round double aggregates (helper ``MONEY_ROUND``) so summation-order
  float residue can't flip the driver's value hash;
- cast DuckDB integer aggregates to BIGINT (DuckDB SUM(int)→HUGEINT);
- format raw ``events.ts`` (ns parquet) through microsecond truncation
  on both engines before exposing it.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import.
_PLAN_MODULES = [
    "shopify_youtube_etl_spark.plans.relational",
    "shopify_youtube_etl_spark.plans.analytics",
    "shopify_youtube_etl_spark.plans.nested",
    "shopify_youtube_etl_spark.plans.etl",
    "shopify_youtube_etl_spark.plans.windows",
    "shopify_youtube_etl_spark.plans.llm_text",
    "shopify_youtube_etl_spark.plans.llm_similarity",
    "shopify_youtube_etl_spark.plans.multimodal",
    "shopify_youtube_etl_spark.plans.advanced_io",
    "shopify_youtube_etl_spark.plans.scale_ops",
]

# Canary queries: PERMANENTLY pinned to the front of the driver's
# correctness window, one per testdata table / type family.  Round 3
# proved the failure mode of a pure rotation: a regression in a
# rotated-out family (events.ts TIMESTAMP handling) produced an
# all-green CORRECTNESS file while the build was red.  These five never
# rotate out, so every round's external record re-exercises each family:
_CANARIES = [
    "flagship_revenue",  # orders⋈lineitem star join (scan/filter/join/agg)
    "sessionize_gaps_islands",  # events.ts — needs true TIMESTAMP (the r03 break)
    "uniqueness_profile",  # exact multi-column countDistinct on orders
    "token_stats",  # documents text family (split/regexp expressions)
    "ann_cosine_topk",  # embeddings array<float> family (Arrow batch path)
    "merge_upsert",  # ParquetTable/MERGE family (the engine's custom write path)
]

# Queries surfaced FIRST in ``all_queries()`` iteration order.
#
# The per-round correctness harness samples queries in registration order
# with a bounded window (observed: first ~50).  With 297/297 union
# coverage reached, the priority is a STALENESS rotation (r7 verdict #2)
# with one override that OUTRANKS staleness age (r10 verdict #6, the
# `embedding_near_dup` lesson): a query whose CODE or ORACLE changed
# after its most recent external green record goes to the very front of
# the rotation — its green record no longer certifies the shipped
# implementation, which is strictly worse than an old record of an
# unchanged one.  When you edit a query (probe-twin rewrites included)
# or add/alter its oracle, move it into the changed-after-green block
# below.  Edits to a SHARED HELPER count as edits to every query that
# executes it (r11 verdict #1: the funnel-state materializer changed in
# 1661b19/7a4938e after both funnel IVMs' r6 records, and the rotation
# missed them because only directly-edited queries were considered —
# when a commit touches a plans/ or operators/ helper, walk its callers
# before closing the round).  After that block: canaries stay pinned,
# any never-verified newcomer leads (prefix invariant, test-enforced),
# and every verified query follows ordered by the round of its most
# recent external record (oldest first, ties by name).  Names listed
# here must exist in the registry (enforced in ``all_queries``) so a
# rename can't silently drop a query out of the priority window;
# tests/test_plans.py globs CORRECTNESS_r*.json so the ordering can't
# silently go stale.
# Re-sorted for round 13 against the CORRECTNESS_r01-r12 union
# latest-green rounds (no net-new queries BY DESIGN): the ~44 non-canary
# slots go to the queries the r13 OPTIMIZATION edits touched (funnel
# restructure, streaming width/Arrow collect, components iterative
# checkpoint, double_literal consumers — the shared-helper rule), then
# the r12 plan-shape edits whose last record predates r12 (verdict #7's
# named list), then the oldest 14 of the remaining r06 staleness
# cohort; the 50 queries refreshed in round 12 rotate to the back.
#
# Canary lesson worth keeping (r8 red row → r9 fix): the only external
# failure this repo has ever recorded was `repeat_purchase_hazard`, an
# oracle-side TYPE leak, not a value bug — DuckDB widens a windowed
# integer SUM to HUGEINT → pandas float64, while Spark stays int64, and
# the driver hashes dtype kinds.  The fix is `CAST(... AS BIGINT)` in
# the oracle (analytics.py); the in-repo guard is the per-column
# dtype-KIND comparator in tests/conftest.py::assert_frames_match, which
# re-proves every oracle at sf0.001 each pytest run.  Any query whose
# oracle sums/windows integers needs that CAST — check the comparator
# output before burning a driver slot on it.
_DRIVER_PRIORITY = _CANARIES + [
    # --- changed after last external green, ROUND 13 edits (the
    # shared-helper rule): the funnel report/batch restructure
    # (llm_text.py single-tokenize metadata passes, lazy report
    # checkpoints), the streaming state-width derivation + Arrow
    # collect (advanced_io.py/common.py), connected_components'
    # iterative-path edge checkpoint (components.py — every
    # consumer counts), and the double_literal SQL builder
    # (similarity.py — hyperplane/_ivf_dists/probe/knee consumers).
    # Their previous green records no longer certify the shipped
    # implementation. ---
    "curation_funnel_report",
    "incremental_curation_funnel",
    "incremental_funnel_two_batch",
    "pagestore_stream_ingest",
    "stream_stream_join_attribution",
    "stream_state_inspection",
    "neardup_components",
    "copurchase_components",
    "incremental_component_delete",
    "incremental_component_maintenance",
    "dedup_representative_pick",
    "leakage_safe_split",
    "recursive_nation_reach",
    "embedding_lsh_neardup",
    "embedding_decontamination",
    "ivf_incremental_assign",
    "ivfpq_code_refresh",
    "quality_knee_quantile_grid",
    "rrf_hybrid_retrieval",
    "ivf_hot_cell_split",
    "semantic_cluster_dedup",
    # --- changed in ROUND 12 with no post-change external record
    # (r12 verdict item 7: plan-shape edits whose last record
    # predates the r12 optimizations). ---
    "minhash_lsh_neardup",
    "bm25_incremental_index",
    "tpch_refresh_q1",
    "tpch_q2_real",
    "tpch_q20_surplus_suppliers",
    "incremental_attribution_revenue",
    "incremental_kll_maintenance",
    "zorder_box_scan",
    "incremental_cluster_maintenance",
    # --- staleness rotation: every remaining query ordered by the
    # round of its most recent external record (oldest first, ties
    # by name; derived from the CORRECTNESS_r01-r12 union). ---
    # --- last external record: round 6 ---
    "ivf_train_centroids",
    "ivfpq_ann_topk",
    "linear_attribution_revenue",
    "pagestore_pruned_ingest",
    "param_sql_segment_topk",
    "pipe_syntax_revenue",
    "pq_train_codebooks",
    "pseudonymize_join_integrity",
    "sql_script_recent_rollup",
    "subject_access_report",
    "table_file_audit",
    "top_event_paths",
    "tpch_q11_real",
    "tpch_q12_late_lines_by_class",
    "tpch_q16_supplier_counts",
    "tpch_q4_priority_census",
    "tpch_q9_product_profit",
    "two_stage_distinct_daily_users",
    "udtf_burst_sessions",
    "variant_json_analytics",
    "weighted_median_price",
    "xml_roundtrip_ingest",
    "zorder_multidim_scan",
    # --- last external record: round 7 ---
    "ab_test_conversion",
    "allocation_proportional",
    "ansi_safe_arithmetic",
    "benford_law_audit",
    "bom_explosion",
    "chi_square_independence",
    "cohort_ltv_curve",
    "conversion_lag_percentiles",
    "cusum_daily_drift",
    "dictionary_encode_types",
    "duplicate_payment_audit",
    "equi_depth_histogram",
    "exact_stratified_split_manifest",
    "filter_conjunction",
    "gini_segment_inequality",
    "hhi_market_concentration",
    "lorenz_curve_points",
    "market_basket_lift",
    "matryoshka_truncation_recall",
    "ndcg_retrieval_eval",
    "new_vs_returning_revenue",
    "order_cycle_time_percentiles",
    "percent_of_parent_share",
    "position_based_attribution",
    "price_elasticity_by_brand",
    "pvm_decomposition",
    "quality_threshold_knee",
    "rfm_segmentation",
    "robust_trend_theil_sen",
    "seasonal_decompose_daily",
    "skyline_pareto_parts",
    "sql_scalar_udf_revenue",
    "supply_concentration_risk",
    "survivorship_golden_record",
    "tumbling_window_15m",
    "window_funnel_depths",
    "winsorized_mean_profile",
    # --- last external record: round 8 ---
    "abc_xyz_classification",
    "ann_erasure_maintenance",
    "approx_distinct_profile",
    "array_functions",
    "asof_click_attribution",
    "behavior_entropy_census",
    "below_avg_quantity_revenue",
    "brand_substitution_screen",
    "cube_status_priority",
    "customers_without_orders",
    "daily_revenue_autocorr",
    "datetime_functions",
    "dau_mau_stickiness",
    "day_over_day_delta",
    "distinct_projection",
    "doc_novelty_profile",
    "duplicate_inspection",
    "edit_distance_pairs",
    "events_daily_rollup",
    "ewma_daily_revenue",
    "except_churned_buyers",
    "explode_outer_guard",
    "fulfillment_sla_attainment",
    "grouping_sets_revenue",
    "incremental_rollup_merge",
    "intersect_repeat_buyers",
    "json_extraction",
    "json_roundtrip_ingest",
    "keep_first_dedup",
    "knn_label_eval",
    "latest_event",
    "latest_order_per_customer",
    "longest_active_streak",
    "pivot_revenue_matrix",
    "seasonal_naive_backtest",
    "segment_migration_matrix",
    "sliding_distinct_users_7d",
    "triplet_margin_mining",
    "unpivot_charge_components",
    # --- last external record: round 9 ---
    "ann_ivf_topk",
    "anti_join_decontaminate",
    "benchmark_contamination",
    "bigram_top_terms",
    "char_ngram_neardup",
    "csv_roundtrip_ingest",
    "dedup_exact",
    "doc_chunking",
    "doc_fingerprint",
    "embedding_centroid_per_label",
    "except_all_multiset_diff",
    "funnel_conversion",
    "groupwise_quality_zscore",
    "interval_join_clicks_before_purchase",
    "knn_label_accuracy",
    "lang_id_confusion",
    "lateral_top3_orders_per_customer",
    "moving_average_7d",
    "nested_explode_roundtrip",
    "order_count_distribution",
    "orders_without_lineitems",
    "percentile_order_value",
    "pivot_status_counts",
    "posexplode_tokens",
    "range_join_value_bands",
    "ranked_customers_per_segment",
    "repeat_purchase_hazard",
    "running_revenue_by_day",
    "scalar_functions",
    "semi_join_urgent_customers",
    "sql_nation_rank",
    "star_join_revenue_by_nation",
    "stats_profile",
    "status_priority_rollup",
    "struct_extract_roundtrip",
    "topk_orders",
    "union_append",
    "union_distinct_active_keys",
    "upsert_idempotency",
    "verify_fk_integrity",
    "verify_uniqueness",
    # --- last external record: round 10 ---
    "adaptive_join_revenue",
    "approx_quantiles_profile",
    "bigram_pmi_top",
    "bloom_prefilter_join",
    "bpe_sequence_packing",
    "cdc_apply_changes",
    "cohort_retention",
    "containment_pairs",
    "cross_source_dup_matrix",
    "daily_anomaly_mad",
    "deletion_propagation_report",
    "embedding_norm_profile",
    "event_transition_matrix",
    "exists_late_shipment_priority",
    "expectations_report",
    "gap_fill_daily_revenue",
    "media_frame_sample",
    "media_payload_features",
    "mixture_rebalance",
    "ngram_jaccard_pairs",
    "order_value_extremes_per_segment",
    "pagestore_distributed_ingest",
    "pagestore_ingest",
    "pii_redaction",
    "quality_scores",
    "repetition_profile",
    "resize_media",
    "rolling_distinct_users_7d",
    "run_ledger_daily_summary",
    "salted_join_revenue",
    "sequence_packing",
    "session_window_30m",
    "simhash_neardup",
    "sliding_window_30m_15m",
    "source_lang_entropy",
    "stable_sample_split",
    "stateful_user_totals",
    "stratified_sample_by_lang",
    "tfidf_top_terms",
    "token_length_histogram",
    "tpch_q1_pricing_summary",
    "vocab_top_tokens",
    # --- last external record: round 11 ---
    "acctbal_rank_profile",
    "bloom_indexed_point_lookup",
    "bm25_search_topk",
    "bpe_encode_stats",
    "bpe_train_merges",
    "duplicated_span_profile",
    "dynamic_partition_overwrite",
    "embedding_near_dup",
    "expectation_gated_ingest",
    "hashed_linear_quality_score",
    "hll_daily_users_rollup",
    "incremental_dedup_report",
    "incremental_rollup_maintenance",
    "int8_ann_topk",
    "interval_left_join_attribution",
    "iqr_outlier_profile",
    "key_skew_profile",
    "kll_daily_value_quantiles",
    "media_header_decode",
    "media_payload_dedup",
    "ntile_value_quartiles",
    "observed_pipeline_metrics",
    "orc_roundtrip_ingest",
    "pagerank_nation_trade",
    "partition_pruned_ingest",
    "quality_quantile_filter",
    "reconcile_tables",
    "regr_price_by_size",
    "scd2_pointintime_join",
    "scd2_status_history",
    "schema_evolution_union",
    "segment_price_quantiles",
    "source_token_kl",
    "temperature_resample_weights",
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "triangle_count_copurchase",
    "unpivot_part_metrics",
    "value_histogram",
    "weighted_sample_per_group",
    "zorder_locality_profile",
    # --- last external record: round 12 ---
    "approx_top_terms_sketch",
    "arrow_native_quant_error",
    "bigram_lm_heldout_ppl",
    "clustered_range_scan",
    "collated_cross_source_census",
    "column_profile_orders",
    "debounce_events",
    "erasure_cascade_apply",
    "fuzzy_blocked_join",
    "incremental_hll_maintenance",
    "pagestore_stream_sink_roundtrip",
    "pagestore_write_roundtrip",
    "pq_ann_topk",
    "range_sorted_layout",
    "repeated_span_removal",
    "segment_skipping_scan",
    "snapshot_time_travel",
    "stateful_sessionize",
    "table_change_feed",
    "targeted_reprocess",
    "theta_audience_overlap",
    "tpch_q11_important_parts",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_waiting_supplier",
    "tpch_q22_idle_rich_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "two_level_window_hourly",
    "unigram_logprob_score",
    "zipf_alpha_fit",
]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    ref: str  # SURVEY.md §2 operator ids this query covers
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, ref: str = "", doc: str = ""):
    """Decorator registering a declared query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, ref=ref, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load() -> None:
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, QuerySpec]:
    """Registry keyed by name, priority queries first (see _DRIVER_PRIORITY)."""
    _load()
    missing = [n for n in _DRIVER_PRIORITY if n not in _REGISTRY]
    if missing:
        raise KeyError(f"_DRIVER_PRIORITY names not registered: {missing}")
    ordered: dict[str, QuerySpec] = {n: _REGISTRY[n] for n in _DRIVER_PRIORITY}
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
