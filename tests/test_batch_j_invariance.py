"""Partition-count invariance for the batch-J operators.

The round-1 gate flap (`hourly_to_daily_rollup`) was a partial-
aggregation-order float divergence that only surfaced under the
driver's partitioning. Every batch-J operator claims order-independent
output (exact longs, micro-nat rounding before summation, or a fixed
IEEE pipeline over identical longs); this suite re-runs each one under
a deliberately hostile partitioning (repartition(3) on load via a
conf override, shuffle.partitions=3 vs the session's 8) and asserts
EXACT result equality — the same bar the driver's value-hash applies.
"""

from __future__ import annotations

import pytest

from parquet_to_csv_spark.plans.registry import QUERIES

BATCH_J = [
    "span_dedup_scrub",
    "bigram_lm_score",
    "chi2_distinctive_tokens",
    "seasonal_naive_backtest",
    "ks_source_pairs",
    "event_sequence_lm_score",
    "grouped_ols_features",
    "spearman_by_group",
    "cluster_topic_terms",
    "neardup_graph_assortativity",
    "conversion_survival_curve",
    "benford_price_audit",
    "k_anonymity_audit",
    "value_quintile_transitions",
    "top_event_trigrams",
    "session_entry_exit",
    "phash_dup_groups",
    "weighted_sample_fixed_k",
    "embedding_standardize",
    "weighted_jaccard_pairs",
    "skew_key_profile",
    "incremental_dedup_report",
    "kfold_balance_report",
    "sampling_ladder",
    "decayed_event_trend",
    "daily_value_bands",
    "windowed_conversion_rate",
    "psi_value_drift",
    "theil_sen_trend",
    "udtf_chunks",
    "rolling_distinct_hll",
    "partition_layout_advisor",
    "conversion_ztest",
    "dedup_strategy_report",
    "product_quantization",
    "ann_recall_report",
    "truncation_quality",
    "cohort_ltv_curve",
    "duplicate_payment_pairs",
    "taint_closure_report",
    "source_centroid_distances",
    "novelty_scores",
    "fold_auc_variance",
    "packing_efficiency",
    "cluster_quality_index",
    "transition_dwell_percentiles",
    "region_share_report",
    "token_rank_movers",
    "annotation_batch",
    "shared_frame_pairs",
    "props_typed_promotion",
    "join_fanout_estimate",
    "blocklist_screen",
    "release_manifest",
    "discount_elasticity",
    "supplier_leadtime_variability",
    "markov_prediction_accuracy",
    "value_qq_table",
    "curation_ledger",
    "filter_selectivity_advisor",
    "embedding_norm_audit",
    "length_bias_audit",
    "cluster_size_distribution",
    "sampler_representativeness",
    "vocab_growth_curve",
    "return_rate_leaders",
    "canonical_quality_gap",
    "engagement_conversion_curve",
    "bursty_token_leaders",
    "rollup_lattice_check",
]


def _canon(rows):
    return sorted(tuple(r) for r in (row.asDict().values() for row in rows))


@pytest.mark.parametrize("name", BATCH_J)
def test_partition_count_invariance(spark, sf_dir, name):
    base = _canon(QUERIES[name](spark, sf_dir).collect())
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = _canon(QUERIES[name](spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert alt == base
