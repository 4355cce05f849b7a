"""Registry-wide partition-count invariance sweep (float-adjacent tier).

The batch-J suite pins the newest operators; this sweep targets the
OLDER queries whose outputs pass through any float machinery (stable
sums, fixed IEEE pipelines, micro/ppm quantization, ln/sqrt/pow) — the
population where a latent summation-order flap would hide. Each runs
under shuffle.partitions=3 vs the session default with exact result
comparison, the same bar as the driver's value-hash.

Streaming drains are excluded (availableNow drains are separate
machinery with their own parity tests), as are queries already in
tests/test_batch_j_invariance.py.
"""

from __future__ import annotations

import pytest

from parquet_to_csv_spark.plans.registry import QUERIES

FLOAT_ADJACENT = [
    "q1_pricing_summary",
    "q9_product_profit",
    "q17_small_quantity_revenue",
    "hourly_to_daily_rollup",
    "sliding_window_stats",
    "stats_moments_lineitem",
    "unigram_lm_score",
    "tfidf_top_terms",
    "quality_score",
    "ab_test_welch",
    "gini_revenue",
    "auc_ranker",
    "target_encoding_loo",
    "user_event_entropy",
    "cusum_changepoints",
    "weighted_median_price",
    "calibration_bins",
    "logbucket_quantiles",
    "pmi_bigrams",
    "distribution_drift",
    "robust_outliers",
    "user_value_ewma",
    "monthly_growth",
    "order_percentile_ranks",
    "interarrival_burstiness",
    "nation_supplier_hhi",
    "embedding_outlier_scores",
    "hll_distinct_estimate",
    "label_centroids",
    "shipping_sla_percentiles",
    # round-3 additions: the new float-adjacent / windowless-rewrite tier
    "order_value_deciles",
    "rfm_segments",
    "annotation_batch",
    "ivf_indexed_topk",
    "ivf_index_staleness",
    "semdedup_prune",
    "hard_negative_mining",
    "dsir_weights",
    "mixture_allocation",
    "top_principal_component",
    "label_cohesion_exact",
    "leakage_safe_split",
    "dup_provenance",
    "curriculum_schedule",
    "conformal_intervals",
    "embedding_abtt",
    "markov_attribution",
    "multimodal_real_decode",
    "purged_timeseries_folds",
    "loo_source_influence",
    "dynamic_gap_sessions",
    "quality_signals_long",
    "similarity_order_benefit",
    "synthetic_source_digest",
    "cluster_design_effect",
    "arrival_completeness",
    "stl_lite_decomposition",
    "kcenter_coreset",
    "growth_accounting",
    "count_overdispersion",
    "label_diag_fid",
    "hybrid_backfill_union",
    "lsh_parameter_advisor",
    "dedup_savings_projection",
    "source_entropy_budget",
    "shrunk_conversion_rates",
    "expected_calibration_error",
]


def _canon(rows):
    return sorted(
        tuple(
            tuple(v) if isinstance(v, list) else v
            for v in row.asDict().values()
        )
        for row in rows
    )


@pytest.mark.parametrize("name", [n for n in FLOAT_ADJACENT if n in QUERIES])
def test_float_adjacent_partition_invariance(spark, sf_dir, name):
    base = _canon(QUERIES[name](spark, sf_dir).collect())
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = _canon(QUERIES[name](spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert alt == base
