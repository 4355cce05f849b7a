"""Partition-count invariance for the round-4 (E363–E398) operators.

Same contract as the batch-J/K sweeps: each round-4 operator claims
order-independent output (exact integer units, floored-once micro
constants, selected order statistics, or one fixed IEEE pipeline over
identical exact longs); this re-runs each under a hostile
``shuffle.partitions=3`` and asserts EXACT equality with the session's
default partitioning — the same bar as the driver's value-hash.

Excluded, with reasons:
- streaming drains (``python_stream_digest``, ``streaming_variant_drain``)
  — covered by their own batch-parity tests; their memoized staging
  would also serve the first run's artifact to the second, making the
  re-run vacuous rather than hostile;
- build-once artifact consumers whose process-level memo would be
  served identically on the second run (``snapshot_delta_scan``,
  ``ivf_index_append_topk``) — the memo makes the comparison
  tautological; their correctness gates cover them;
- ``scripted_threshold_walk`` — each run re-executes the script
  statements, and the walk's ladder is already one aggregate whose
  invariance this sweep covers via the other entries (kept out to
  bound sweep runtime, ~0.6 s/statement fixed scripting overhead).
"""

from __future__ import annotations

import pytest

from parquet_to_csv_spark.plans.registry import QUERIES

BATCH_R4 = [
    "pivot_status_revenue",
    "grouping_sets_revenue",
    "rbo_rank_agreement",
    "vocab_coverage_ladder",
    "variant_promotion",
    "neardup_reach_hops",
    "lift_gains_table",
    "xml_roundtrip",
    "arrow_grouped_profile",
    "collated_token_counts",
    "fim_transform_audit",
    "nullsafe_join_audit",
    "sprt_monitor",
    "bloom_skipping_report",
    "closing_balance_report",
    "mix_shift_decomposition",
    "fs_linkage_patterns",
    "approx_distinct_audit",
    "slo_burn_alerts",
    "dup_weighted_mixture",
    "median_polish_dow_type",
    "lateral_topk_per_region",
    "fs_em_weights",
    "fairness_gap_audit",
    "bh_fdr_screen",
    "parameterized_orders_report",
    "sql_udf_report",
    "udtf_polymorphic_profile",
    "leakage_release_certificate",
    "leakage_safe_split_v2",
    "bm25_dedup_topk",
]


def _canon(rows):
    # key=repr: None-safe total order (GROUPING SETS subtotal rows put
    # NULLs next to strings, which tuple '<' cannot compare)
    return sorted(
        (tuple(r) for r in (row.asDict().values() for row in rows)),
        key=repr,
    )


@pytest.mark.parametrize("name", BATCH_R4)
def test_round4_partition_count_invariance(spark, sf_dir, name):
    base = _canon(QUERIES[name](spark, sf_dir).collect())
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = _canon(QUERIES[name](spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert alt == base
