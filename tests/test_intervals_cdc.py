"""Interval overlap join + CDC merge + stratified sample tests:
brute-force parity, exactly-once emission, plan contract (no BNLJ —
the point of the band rewrite), and the MERGE round-trip identity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import corpus, intervals, relational
from parquet_to_csv_spark.sources.tables import load_table


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _brute_overlap(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts_us").alias("v_s"),
        (F.col("ts_us") + F.lit(intervals._VIEW_DUR_US)).alias("v_e"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts_us").alias("c_s"),
        (F.col("ts_us") + F.lit(intervals._CLICK_DUR_US)).alias("c_e"),
    )
    return v.join(
        c,
        (v.user_id == c.c_user)
        & (F.col("v_s") <= F.col("c_e"))
        & (F.col("c_s") <= F.col("v_e")),
    ).select(
        "view_id",
        "click_id",
        "user_id",
        (
            F.least(F.col("v_e"), F.col("c_e"))
            - F.greatest(F.col("v_s"), F.col("c_s"))
        ).alias("overlap_us"),
    )


def test_overlap_matches_bruteforce(spark, sf_dir):
    fast = intervals.interval_overlap_join(spark, sf_dir)
    brute = _brute_overlap(spark, sf_dir)
    assert fast.count() == brute.count()  # exactly-once emission
    assert fast.exceptAll(brute).count() == 0
    assert brute.exceptAll(fast).count() == 0


def test_overlap_plan_has_no_bnlj(spark, sf_dir):
    plan = _physical(intervals.interval_overlap_join(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cdc_merge_reconstructs_v2(spark, sf_dir):
    """merge(v1, diff(v1, v2)) == v2 — the round-trip identity."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.round("value", 2).alias("value")
    )
    v2_base = ev.filter(F.col("event_id") % 7 != 0).select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.round(F.col("value") + 1.0, 2))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    v2 = v2_base.unionByName(
        ev.filter(F.col("event_id") % 11 == 0).select(
            (F.col("event_id") + F.lit(10_000_000)).alias("event_id"), "value"
        )
    )
    merged = relational.cdc_merge_events(spark, sf_dir)
    assert merged.count() == v2.count()
    assert merged.exceptAll(v2).count() == 0


def test_merge_changes_noop_on_empty_changes(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.round("value", 2).alias("value")
    )
    empty = relational.snapshot_diff(ev, ev, "event_id", "value")
    merged = relational.merge_changes(ev, empty)
    assert merged.count() == ev.count()
    assert merged.exceptAll(ev).count() == 0


def test_stratified_sample_nested_and_rated(spark, sf_dir):
    """Raising a rate only ADDS documents (hash keys on doc_id alone),
    and each stratum honours its own cut."""
    small = corpus.stratified_sample(spark, sf_dir, rates={"en": 10}, default_pct=10)
    big = corpus.stratified_sample(spark, sf_dir, rates={"en": 60}, default_pct=10)
    assert small.exceptAll(big).count() == 0  # nested
    assert big.count() > small.count()
    full = corpus.stratified_sample(spark, sf_dir, rates={"zh": 100}, default_pct=0)
    docs = load_table(spark, sf_dir, "documents")
    assert full.count() == docs.filter(F.col("lang") == "zh").count()
    assert full.filter(F.col("lang") != "zh").count() == 0
