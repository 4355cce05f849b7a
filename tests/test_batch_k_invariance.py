"""Partition-count invariance for the batch-K (round-3) operators.

Same contract as the batch-J sweep: every round-3 operator claims
order-independent output (exact longs, per-term micro-nat quantization
before any sum, selected order statistics, or one fixed IEEE pipeline
over identical exact longs); this re-runs each under a hostile
``shuffle.partitions=3`` and asserts EXACT equality with the session's
default partitioning — the same bar as the driver's value-hash.

Streaming drains are exercised by their own batch-parity tests (the
drain result equals a batch aggregation that IS in this sweep) and are
excluded here to keep the sweep's runtime bounded.
"""

from __future__ import annotations

import pytest

from parquet_to_csv_spark.plans.registry import QUERIES

BATCH_K = [
    "ohlc_bars",
    "time_weighted_avg",
    "last_touch_attribution",
    "zipf_slope",
    "lang_source_mi",
    "embedding_dim_correlation",
    "mrr_label_match",
    "ivf_nprobe_sweep",
    "dead_stock_parts",
    "winsorize_values",
    "transition_entropy",
    "poisson_bootstrap_ci",
    "survivorship_merge",
    "bounded_funnel",
    "kcore_decomposition",
    "quantile_normalize_lengths",
    "order_consolidation_pairs",
    "aa_test_calibration",
    "mutual_nn_pairs",
    "price_consistency_audit",
    "jaccard_threshold_profile",
    "skipgram_pmi",
    "late_event_profile",
    "tfidf_cosine_pairs",
    "group_quota_sample",
    "holt_linear_forecast",
    "blocking_recall_audit",
    "quality_token_tradeoff",
    "adamic_adar_links",
    "parquet_footer_stats",
    "spc_control_limits",
    "chunk_dedup_report",
    "sort_key_advisor",
    "daily_acf",
    "hill_tail_index",
    "receivables_aging",
    "simpsons_check",
    "asof_nearest_join",
    "circadian_profile",
    "retrieval_diversity_report",
    "mmr_rerank",
    "abc_classification",
    "dau_mau_stickiness",
    "order_fill_rate",
    "importance_weighted_stats",
    "matched_pairs_diff",
    "substitution_savings",
    "dow_type_residuals",
    "neardup_evidence",
    "error_burst_sessions",
    "discount_leakage",
    "supplier_concentration_profile",
    "incremental_join_maintenance",
    "hapax_rate",
    "order_reconciliation",
    "abandonment_last_event",
    "cross_source_dup_matrix",
    "engagement_value_quadrants",
    "quantization_recall_sweep",
    "priority_mix_drift",
    "onboarding_latency",
    "nation_league_table",
    "type_comovement",
    "structuring_screen",
    "partitioned_roundtrip",
    "bounce_rate",
    "centroid_drift",
    "similarity_calibration",
    "funnel_stage_lags",
    "similarity_pr_curve",
    "two_stage_retrieval_audit",
    "retention_policy_audit",
    "lm_heldout_eval",
    "functional_dependency_audit",
    "open_orders_timeline",
    "weekday_index",
    "neyman_allocation",
    "order_regularity",
    "topk_customer_share",
    "pair_review_queue",
    "knn_classifier_eval",
    "position_based_attribution",
    "winback_orders",
    "quality_metric_agreement",
    "token_fertility",
    "type_user_overlap",
    "supplier_share_movers",
]


def _canon(rows):
    return sorted(tuple(r) for r in (row.asDict().values() for row in rows))


@pytest.mark.parametrize("name", BATCH_K)
def test_partition_count_invariance(spark, sf_dir, name):
    base = _canon(QUERIES[name](spark, sf_dir).collect())
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = _canon(QUERIES[name](spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert alt == base
