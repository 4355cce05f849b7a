"""ML-eval / feature-engineering tier (mlmetrics.py): semantics spot
checks against independent recomputation + the plan-shape scale
contract (banded join instead of inequality join, broadcast dims,
partition-count invariance of the distributed rank)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import mlmetrics
from parquet_to_csv_spark.sources.tables import load_table


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_auc_matches_naive_pair_count(spark, sf_dir):
    """AUC == P(score_pos > score_neg) + 0.5*P(tie), the definition."""
    row = mlmetrics.auc_ranker(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select(
        "n_chars", (F.col("lang") == "en").alias("is_pos")
    )
    pos = [r.n_chars for r in docs.filter("is_pos").collect()]
    neg = [r.n_chars for r in docs.filter("NOT is_pos").collect()]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert row.pos_n == len(pos) and row.neg_n == len(neg)
    assert math.isclose(row.auc, expect, rel_tol=0, abs_tol=1e-12)
    assert row.auc_ppm == math.floor(expect * 1_000_000 + 1e-9)


def test_rfm_partitions_all_customers(spark, sf_dir):
    grid = mlmetrics.rfm_segments(spark, sf_dir)
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    rows = grid.collect()
    assert sum(r.n_customers for r in rows) == n_cust
    assert all(1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
               for r in rows)


def test_gini_partition_count_invariant(spark, sf_dir):
    """The two-phase distributed rank must not depend on how many range
    partitions the relation is split into."""
    a = mlmetrics.gini_revenue(spark, sf_dir, n_parts=2).collect()[0]
    b = mlmetrics.gini_revenue(spark, sf_dir, n_parts=13).collect()[0]
    assert a == b
    assert 0.0 <= a.gini <= 1.0


def test_target_encoding_excludes_self(spark, sf_dir):
    enc = mlmetrics.target_encoding_loo(spark, sf_dir)
    rows = enc.collect()
    # independent recomputation of one segment's LOO values
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per = {
        r.o_custkey: (r.n, r.cents)
        for r in orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)).alias("cents"),
        )
        .collect()
    }
    seg_of = {r.c_custkey: r.c_mktsegment for r in cust.collect()}
    seg_tot: dict[str, list[int]] = {}
    for ck, (n, cents) in per.items():
        s = seg_tot.setdefault(seg_of[ck], [0, 0])
        s[0] += n
        s[1] += cents
    for r in rows:
        n, cents = per[r.o_custkey]
        sn, sc = seg_tot[r.c_mktsegment]
        if sn > n:
            assert r.loo_avg_cents == (sc - cents) // (sn - n)
        else:
            assert r.loo_avg_cents is None


def test_entropy_bounds_and_mode(spark, sf_dir):
    df = mlmetrics.user_event_entropy(spark, sf_dir).collect()
    for r in df:
        # 0 <= H <= ln(n_types), in micro-nats (integer floor slack 1)
        assert 0 <= r.entropy_unats <= int(math.log(r.n_types) * 1e6) + 1
        if r.n_types == 1:
            assert r.entropy_unats == 0
    ev = load_table(spark, sf_dir, "events")
    one = df[0]
    counts = (
        ev.filter(F.col("user_id") == one.user_id)
        .groupBy("event_type")
        .count()
        .collect()
    )
    mx = max(r["count"] for r in counts)
    assert one.mode_type == min(r.event_type for r in counts if r["count"] == mx)


def test_trailing_features_match_naive(spark, sf_dir):
    feats = {
        r.event_id: (r.clicks_24h, r.clicks_1h)
        for r in mlmetrics.trailing_window_features(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    clicks: dict[int, list[int]] = {}
    for r in ev.filter("event_type = 'click'").collect():
        clicks.setdefault(r.user_id, []).append(r.ts_us)
    purchases = ev.filter("event_type = 'purchase'").collect()
    assert len(feats) == len(purchases)
    for r in purchases:
        cs = clicks.get(r.user_id, [])
        c24 = sum(1 for t in cs if r.ts_us - 86_400_000_000 <= t < r.ts_us)
        c1 = sum(1 for t in cs if r.ts_us - 3_600_000_000 <= t < r.ts_us)
        assert feats[r.event_id] == (c24, c1)


def test_trailing_features_plan_is_banded_equi_join(spark, sf_dir):
    """The scale contract: the time-range count must plan as a hash
    equi-join on (user, band) — no BroadcastNestedLoopJoin, and the
    event-type filters reach the scan."""
    plan = _physical(mlmetrics.trailing_window_features(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan


def test_loo_encoding_broadcasts_dims(spark, sf_dir):
    plan = _physical(mlmetrics.target_encoding_loo(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
