"""Batch tests: MoM growth floor-division parity, acquisition split,
ppm percentile ranks, vocab drift, churn-risk features."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import relational, text, timeops
from parquet_to_csv_spark.sources.tables import load_table


def test_monthly_growth_floor_division_on_down_months(spark, sf_dir):
    rows = sorted(timeops.monthly_growth(spark, sf_dir).collect(), key=lambda r: r.ym)
    assert rows[0].mom_growth_ppm is None
    downs = 0
    for prev, cur in zip(rows, rows[1:]):
        expect = (cur.rev_cents - prev.rev_cents) * 1_000_000
        # python // is floor division — the convention both engines match
        assert cur.mom_growth_ppm == expect // prev.rev_cents
        if cur.rev_cents < prev.rev_cents:
            downs += 1
    assert downs > 0  # the signed path is actually exercised


def test_new_vs_returning_consistency(spark, sf_dir):
    rows = sorted(timeops.new_vs_returning(spark, sf_dir).collect(), key=lambda r: r.week)
    # first active week has no returning users
    assert rows[0].returning_users == 0
    ev = load_table(spark, sf_dir, "events")
    total_users = ev.select("user_id").distinct().count()
    assert sum(r.new_users for r in rows) == total_users
    for r in rows:
        tot = r.new_users + r.returning_users
        assert r.returning_share_ppm == r.returning_users * 1_000_000 // tot


def test_percentile_ranks_bounds(spark, sf_dir):
    df = relational.order_percentile_ranks(spark, sf_dir)
    n = df.count()
    mn, mx = df.agg(F.min("pct_rank_ppm"), F.max("pct_rank_ppm")).first()
    assert (mn, mx) == (0, 1_000_000)
    cd = df.agg(F.min("cume_dist_ppm"), F.max("cume_dist_ppm")).first()
    assert cd[1] == 1_000_000 and cd[0] == 1_000_000 // n


def test_vocab_drift_bounds(spark, sf_dir):
    rows = timeops and text.vocab_drift_daily(spark, sf_dir).collect()
    assert len(rows) == 9  # days 0..9 → 9 consecutive pairs
    for r in rows:
        assert r.day_b == r.day_a + 1
        assert 0 < r.jaccard_ppm <= 1_000_000
        assert r.n_shared <= 20


def test_churn_features_point_in_time(spark, sf_dir):
    rows = {r.user_id: r for r in timeops.churn_risk_features(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("us"), "event_type"
    ).collect()
    snap = 1_706_659_032_195_000
    per: dict[int, list] = {}
    for r in ev:
        if r.us <= snap:
            per.setdefault(r.user_id, []).append(r)
    assert set(rows) == set(per)
    for uid, es in per.items():
        r = rows[uid]
        assert r.recency_us == snap - max(e.us for e in es)
        assert r.n_events_total == len(es)
        assert r.n_events_7d == sum(1 for e in es if e.us >= snap - 7 * 86_400_000_000)
        assert r.n_purchases == sum(1 for e in es if e.event_type == "purchase")
