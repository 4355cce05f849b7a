"""Temporal-join tests: as-of and banded range join vs brute-force
inequality formulations, plus the plan contract (no BNLJ/cartesian —
the whole point of the union-merge / bucketing rewrites).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import rangejoin, relational
from parquet_to_csv_spark.sources.tables import load_table


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _ev(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.expr("ts div 1000").alias("ts_us"),
    )


def test_asof_matches_bruteforce(spark, sf_dir):
    fast = rangejoin.asof_join_purchase_click(spark, sf_dir)
    ev = _ev(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts_us").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("c_ts"),
    )
    brute = (
        p.join(c, (p.user_id == c.c_user) & (F.col("c_ts") <= F.col("p_ts")), "left")
        .groupBy("purchase_id")
        .agg(F.max_by("click_id", "c_ts").alias("click_id"))
    )
    diff = (
        fast.select("purchase_id", "click_id")
        .join(brute, "purchase_id")
        .filter(
            ~(
                fast.click_id.eqNullSafe(brute.click_id)
            )
        )
    )
    assert fast.count() == p.count()
    assert diff.count() == 0


def test_asof_plan_single_shuffle_no_bnlj(spark, sf_dir):
    plan = _physical(rangejoin.asof_join_purchase_click(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # union-merge: one exchange for the window, no join operator at all
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_range_join_matches_bruteforce(spark, sf_dir):
    fast = rangejoin.range_join_error_clicks(spark, sf_dir)
    ev = _ev(spark, sf_dir)
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts_us").alias("e_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("c_ts"),
    )
    brute = (
        e.join(
            c,
            (e.user_id == c.c_user)
            & (F.col("c_ts") >= F.col("e_ts") - 300_000_000)
            & (F.col("c_ts") <= F.col("e_ts")),
            "left",
        )
        .groupBy("error_id")
        .agg(F.count("click_id").alias("n_brute"))
    )
    joined = fast.join(brute, "error_id")
    assert fast.count() == e.count()
    assert joined.filter(F.col("n_clicks_5m") != F.col("n_brute")).count() == 0


def test_range_join_plans_as_hash_join(spark, sf_dir):
    plan = _physical(rangejoin.range_join_error_clicks(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cube_totals_consistent(spark, sf_dir):
    df = relational.cube_orders(spark, sf_dir)
    rows = {(r.o_orderstatus, r.o_orderpriority): r.n_orders for r in df.collect()}
    grand = rows[(None, None)]
    by_status = sum(v for (s, p), v in rows.items() if s is not None and p is None)
    by_prio = sum(v for (s, p), v in rows.items() if s is None and p is not None)
    leaves = sum(v for (s, p), v in rows.items() if s is not None and p is not None)
    assert grand == by_status == by_prio == leaves


def test_set_ops(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").count()
    inter = relational.segment_intersect(spark, sf_dir).count()
    exc = relational.segment_except(spark, sf_dir).count()
    assert 0 < inter <= building
    assert exc <= building


def test_quantiles_ordered(spark, sf_dir):
    for r in relational.price_quantiles(spark, sf_dir).collect():
        assert r.p25 <= r.p50 <= r.p75


def test_salted_join_parity(spark, sf_dir):
    """Salted join must be row-identical to the plain join."""
    from parquet_to_csv_spark.operators import skew

    salted = {
        r.o_orderstatus: (r.n_lines, r.revenue)
        for r in skew.salted_join_revenue(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plain = {
        r.o_orderstatus: (r.n_lines, r.revenue)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .collect()
    }
    assert salted == plain


def test_scd2_point_in_time_no_leakage(spark, sf_dir):
    """Every order resolves exactly one version, and the chosen
    version's valid_from never postdates the order (no feature
    leakage from the future)."""
    out = rangejoin.scd2_point_in_time_join(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    assert out.count() == orders.count()
    j = out.join(
        orders.select("o_orderkey", "o_orderdate"), "o_orderkey"
    ).withColumn(
        "od_ms", F.expr("unix_millis(cast(cast(o_orderdate as date) as timestamp))")
    )
    assert j.filter(F.col("version_from_ms") > F.col("od_ms")).count() == 0
