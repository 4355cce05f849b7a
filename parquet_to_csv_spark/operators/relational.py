"""Relational breadth — EXT tier 1 (SURVEY.md §2.5 E6/E7/E8/E11).

The reference has no joins/aggregations/windows (SURVEY.md §2.4); these
are the north-star extensions over the TPC-H-ish star schema, written
so Catalyst gets the plan it wants at 100 TB:

- dims (`region`, `nation`, tiny `supplier`/`customer` slices) are
  explicitly ``broadcast()`` — no shuffle for the small side;
- aggregates are declared on the grouped keys so partial (map-side)
  aggregation happens before the exchange;
- top-k per group is a windowed ``row_number() <= k`` — never a global
  sort — and global top-k is ``orderBy().limit(k)`` which Spark plans
  as TakeOrderedAndProject (per-partition heap + driver merge, no full
  sort/shuffle);
- double aggregates are ``round()``ed (2dp sums / 4dp ratios): the
  partial-agg combine order is nondeterministic at cluster scale, so
  unrounded float sums are not reproducible run-to-run — rounding is
  both the oracle-parity tool and the honest contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from parquet_to_csv_spark.functions.stable import (
    exact_units,
    stable_avg_2dp,
    stable_sum_2dp,
)
from parquet_to_csv_spark.sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-heavy grouped aggregation.

    One wide scan + one exchange on (returnflag, linestatus); the date
    filter and 7-column projection push into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # disc_price is a true 4-decimal rational, charge 6-decimal:
            # their sums land exactly on .xx5 rounding boundaries ~1/50
            # of the time, where round(sum(·),2) flips with summation
            # order — stable_sum_2dp sums exact integer units instead.
            stable_sum_2dp(disc_price, 4).alias("sum_disc_price"),
            stable_sum_2dp(charge, 6).alias("sum_charge"),
            # stable_avg: float avgs tie at .xxxx5 and round divergently
            # per engine/summation order — see functions.stable.
            stable_avg_2dp(F.sum("l_quantity"), F.count(F.lit(1))).alias("avg_qty"),
            stable_avg_2dp(F.sum("l_extendedprice"), F.count(F.lit(1))).alias("avg_price"),
            stable_avg_2dp(F.sum("l_discount"), F.count(F.lit(1))).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join + grouped revenue + global top-10.

    customer is the small side of orders⋈customer → broadcast; the
    lineitem⋈orders join shuffles on orderkey (the natural key). The
    final top-10 is orderBy+limit = TakeOrderedAndProject.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            stable_sum_2dp(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            F.expr("unix_millis(cast(o_orderdate as timestamp))").alias("o_date_ms"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: 6-way star join, revenue by nation in a region.

    region/nation/supplier are broadcast; only customer⋈orders⋈lineitem
    move through exchanges. The local-supplier condition
    (c_nationkey = s_nationkey) is the classic join-graph cycle.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            stable_sum_2dp(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
    )


def broadcast_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 broadcast join: fact side never shuffles for dim lookups."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            stable_avg_2dp(F.sum("c_acctbal"), F.count(F.lit(1))).alias("avg_acctbal"),
        )
    )


def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 left-semi (EXISTS): customers having at least one URGENT order.

    Semi joins only carry the left side through the shuffle — at scale
    strictly better than join+distinct.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 left-anti (NOT EXISTS): customers with no order in 2001+.

    (Every fixture customer has some order, so the anti join runs
    against a filtered orders side — FIXTURES.md note.)
    """
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01")
    )
    return cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def window_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 windows: rank/lag/running sum per customer, fully deterministic
    ordering (totalprice desc, orderkey asc tie-break) so float window
    aggregates are reproducible cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("price"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_total"),
    )


def topk_orders_per_customer(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """E11 top-k per group: windowed row_number ≤ k — no global sort,
    one hash exchange on the group key."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn")
    )


def moving_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 frame-based moving aggregate (4-row trailing mean)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    frame = w.rowsBetween(-3, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        stable_avg_2dp(
            F.sum("o_totalprice").over(frame), F.count(F.lit(1)).over(frame)
        ).alias("trailing_avg"),
    )


def agg_suite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 grouped aggregation suite (count / distinct / sum / avg /
    min / max) — partial-aggregated map-side before one exchange."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        stable_avg_2dp(F.sum("o_totalprice"), F.count(F.lit(1))).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 hierarchical totals: ROLLUP(returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 pivot with an explicit value list (no extra pass to discover
    pivot values — required at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_finished")
    )


def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS: orders with at least one line shipped
    more than 90 days after the order date, counted per priority.

    The EXISTS is a left-semi join with a non-equi residual condition —
    only the order side survives the exchange, and each order is
    counted once no matter how many late lines it has."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == late.l_orderkey) & (
        late.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(late, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
    )


def q10_returned_revenue(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10-shaped: top-k customers by revenue on returned items.

    lineitem⋈orders shuffles on orderkey; customer joins on custkey;
    nation broadcasts. Global top-k = TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            stable_sum_2dp(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str, brand: str = "Brand#1"
) -> DataFrame:
    """TPC-H Q17-shaped correlated aggregate: revenue from lines whose
    quantity is below 20% of that part's average quantity.

    Canonical Q17 plan: lineitem is first semi-joined to the BROADCAST
    brand-filtered part, and the per-part average is computed over that
    reduced relation only — so the broadcast aggregate carries one row
    per *brand* part, not one per distinct partkey in all of lineitem
    (the unbounded variant is tens of GB at 100 TB). lineitem is
    scanned twice, both scans pruned by the broadcast/bloom semi-join.

    The quantity cutoff ``q < 0.2·avg(q)`` is evaluated in exact
    integer units (``100q·5·n < Σ100q``) — no float boundary, so the
    filtered row set is identical in any engine/summation order."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == brand
    ).select("p_partkey")
    li_brand = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi"
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    part_avg = li_brand.groupBy("l_partkey").agg(
        F.sum(exact_units(F.col("l_quantity"), 2)).alias("qsum_u"),
        F.count(F.lit(1)).alias("qn"),
    )
    cents = F.sum(exact_units(F.col("l_extendedprice"), 2))
    avg_yearly = (
        F.floor((cents / F.lit(100.0) / F.lit(7.0)) * F.lit(100.0) + F.lit(0.5))
        / F.lit(100.0)
    )
    return (
        li_brand.join(
            F.broadcast(part_avg.withColumnRenamed("l_partkey", "pk")),
            F.col("l_partkey") == F.col("pk"),
        )
        .filter(
            exact_units(F.col("l_quantity"), 2) * F.lit(5) * F.col("qn")
            < F.col("qsum_u")
        )
        .agg(avg_yearly.alias("avg_yearly"))
    )


def q18_large_orders(spark: SparkSession, sf_dir: str, min_qty: float = 300.0) -> DataFrame:
    """TPC-H Q18-shaped HAVING: orders whose total line quantity exceeds
    the threshold, with their customer. The HAVING runs on the grouped
    relation *before* the joins — the join input is already reduced to
    qualifying orders."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
    )


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 CUBE: all 4 grouping combinations of (status, priority) in one
    pass — Spark expands grouping sets before the single exchange, so
    the scan is not repeated per combination."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6/E18 explicit GROUPING SETS: exactly the two single-dimension
    rollups in one pass (no leaf or grand-total rows — the asymmetric
    shape CUBE/ROLLUP cannot express). Like CUBE, Spark expands the
    sets before a single exchange; `grouping_id` disambiguates the
    all-null markers."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("t_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM t_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 exact quantiles per group (linear-interpolated, the SQL
    ``percentile_cont`` semantics). Exact percentile needs the group's
    values collected per key — fine for bounded group counts; at 100 TB
    with huge groups the approx path (``approx_percentile`` /
    ``percentile_approx``, a mergeable t-digest-style sketch) is the
    drop-in replacement at the same call site."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("round(percentile(o_totalprice, 0.25), 2)").alias("p25"),
        F.expr("round(percentile(o_totalprice, 0.50), 2)").alias("p50"),
        F.expr("round(percentile(o_totalprice, 0.75), 2)").alias("p75"),
        F.count("*").alias("n_orders"),
    )


def segment_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op INTERSECT: BUILDING-segment customers who also placed an
    URGENT order. Plans as a distinct-ing hash semi-structure — one
    exchange per side on the full row (here a single key column)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(urgent)


def segment_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op EXCEPT: BUILDING-segment customers with no 1998+ order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    recent = orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01")).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.subtract(recent)


def price_histogram(spark: SparkSession, sf_dir: str, width: int = 25000) -> DataFrame:
    """E6 distribution histogram: fixed-width buckets of o_totalprice.
    Bucket ids are exact integer floors of 2dp data — no float
    boundary; one scan, one partial-aggregated exchange."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(float(width)))
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .withColumn("bucket_lo", F.col("bucket") * width)
    )


def stats_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 second-moment suite: population covariance / correlation /
    stddev of (quantity, extendedprice) per returnflag.

    Engine-stable by construction: all five sums run over EXACT integer
    units (2dp cents — order-independent long/decimal addition), and
    the final moments are a fixed chain of double ops on those exact
    integers, identical in any engine. ``corr()``/``covar_pop()``
    builtins would be order-dependent float folds — not reproducible."""
    li = load_table(spark, sf_dir, "lineitem")
    qu = exact_units(F.col("l_quantity"), 2)
    pu = exact_units(F.col("l_extendedprice"), 2)
    a = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qu).alias("sx"),
        F.sum(pu).alias("sy"),
        F.sum(qu * pu).alias("sxy"),
        F.sum(qu * qu).alias("sxx"),
        # pu² sums pass 2^63 at scale — exact decimal accumulation
        F.sum((pu * pu).cast("decimal(38,0)")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    cov_num = nd * F.col("sxy").cast("double") - sxd * syd
    var_x = nd * F.col("sxx").cast("double") - sxd * sxd
    var_y = nd * F.col("syy").cast("double") - syd * syd
    return a.select(
        "l_returnflag",
        "n",
        F.round(cov_num / (nd * nd) / F.lit(10000.0), 4).alias("covar_pop"),
        F.round(cov_num / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
        F.round(F.sqrt(var_x) / nd / F.lit(100.0), 6).alias("stddev_qty"),
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, cmp_col: str
) -> DataFrame:
    """CDC-style snapshot diff: full outer join on the key, classify
    each row as insert / delete / update (value changed); unchanged
    rows are dropped. One shuffle per side on the key — with bucketed
    layout (E25) the exchange disappears entirely."""
    o = old.select(F.col(key).alias("k"), F.col(cmp_col).alias("old_v"))
    n = new.select(F.col(key).alias("k"), F.col(cmp_col).alias("new_v"))
    j = o.join(n, "k", "full_outer")
    change = (
        F.when(F.col("old_v").isNull(), F.lit("insert"))
        .when(F.col("new_v").isNull(), F.lit("delete"))
        .when(F.col("old_v") != F.col("new_v"), F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(F.col("k").alias("key"), "change_type", "old_v", "new_v")
    )


def cdc_events_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-CDC demo over deterministic synthetic versions of ``events``:
    v2 drops event_id % 7 == 0 (deletes), shifts value by +1.00 for
    event_id % 5 == 0 (updates), and appends re-keyed copies of
    event_id % 11 == 0 (inserts). Values stay exact 2dp, so the value
    comparison is bit-deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.round("value", 2).alias("value")
    )
    v1 = ev
    v2_base = ev.filter(F.col("event_id") % 7 != 0).select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.round(F.col("value") + 1.0, 2))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    v2_new = ev.filter(F.col("event_id") % 11 == 0).select(
        (F.col("event_id") + F.lit(10_000_000)).alias("event_id"), "value"
    )
    v2 = v2_base.unionByName(v2_new)
    return snapshot_diff(v1, v2, "event_id", "value")


def merge_changes(base: DataFrame, changes: DataFrame) -> DataFrame:
    """Apply a :func:`snapshot_diff`-shaped change set (key, change_type,
    old_v, new_v) onto ``base`` (k/value columns) — the MERGE/upsert
    primitive of every CDC pipeline (Delta/Iceberg ``MERGE INTO``
    semantics, expressed on stock Spark):

    - ``delete``  → key removed;
    - ``update``  → value replaced with ``new_v``;
    - ``insert``  → (key, new_v) appended.

    Plan: ONE left join of base onto the keyed change set (deletes and
    updates resolved with ``when``), plus a union of the insert slice —
    no full-outer, no second pass over base. With both sides bucketed
    on the key (E25) the join exchange disappears; AQE broadcasts the
    change set when it is small relative to base, which is the common
    CDC case (daily delta ≪ snapshot).
    """
    ch = changes.select(
        F.col("key").alias("k"), "change_type", F.col("new_v").alias("_new_v")
    )
    kept = (
        base.join(ch, F.col("event_id") == F.col("k"), "left")
        .filter((F.col("change_type").isNull()) | (F.col("change_type") == "update"))
        .select(
            "event_id",
            F.when(F.col("change_type") == "update", F.col("_new_v"))
            .otherwise(F.col("value"))
            .alias("value"),
        )
    )
    inserts = changes.filter(F.col("change_type") == "insert").select(
        F.col("key").alias("event_id"), F.col("new_v").alias("value")
    )
    return kept.unionByName(inserts)


def cdc_merge_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip gate for MERGE: applying :func:`cdc_events_diff`'s
    change set onto v1 must reconstruct v2 exactly — the oracle computes
    v2 directly from its definition, so any drop/dup/misclassification
    in EITHER the diff or the merge breaks the hash match."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.round("value", 2).alias("value")
    )
    changes = cdc_events_diff(spark, sf_dir)
    return merge_changes(ev, changes)


def robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group anomaly detection: flag events whose value sits
    more than 3 robust z-units from the group median, with the MAD
    (median absolute deviation) as the scale — the outlier filter that
    survives the skew/fat tails that wreck mean/stddev z-scores (and a
    data-quality pass every training pipeline runs on numeric fields).

    Two-pass shape: tiny per-type median (5 rows, broadcast back), then
    per-type MAD over the deviations (again tiny, broadcast back), then
    one codegen'd filter — two scans, two broadcast joins, zero wide
    shuffles of the fact side. At 100 TB ``percentile`` swaps for
    ``approx_percentile`` (mergeable sketch) at the same call sites;
    1.4826 is the usual normal-consistency constant.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return robust_outliers_df(ev)


def robust_outliers_df(ev: DataFrame) -> DataFrame:
    """Core of :func:`robust_outliers` over any
    (event_id, event_type, value) relation."""
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    scored = ev.join(F.broadcast(med), "event_type").join(
        F.broadcast(mad), "event_type"
    )
    # zero-MAD guard: a constant group (mad = 0) would DIVIDE_BY_ZERO
    # under ANSI mode — there any deviation is an outlier (the filter
    # below already says so with no division) and the z-score is
    # undefined → NULL
    rz = F.when(
        F.col("mad") > 0,
        (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad")),
    )
    return (
        scored.filter(F.abs(F.col("value") - F.col("med")) > F.lit(3 * 1.4826) * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            F.round(rz, 4).alias("robust_z"),
        )
    )


def ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with Welch's t — users hash-split into
    two arms (deterministic md5 bucket, the same reproducible-split
    primitive as E37/E45), per-event-type mean difference and t
    statistic.

    Determinism: Σcents and Σcents² are EXACT integer sums (order-
    independent across any partitioning); every downstream step (means,
    Welch variance, t, ν) is scalar double math in one fixed expression
    order, so both engines produce bit-identical statistics. Variance
    products run in double (not long·long) to stay overflow-free at
    any SF.
    """
    from parquet_to_csv_spark.operators.corpus import md5_bucket

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        md5_bucket(F.col("user_id"), 2).alias("arm"),
        exact_units(F.col("value"), 2).alias("cents"),
    )
    g = ev.groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sc"),
        F.sum(F.col("cents") * F.col("cents")).alias("sc2"),
    )
    a = g.filter(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n_a"), F.col("sc").alias("sc_a"), F.col("sc2").alias("sc2_a"),
    )
    b = g.filter(F.col("arm") == 1).select(
        "event_type",
        F.col("n").alias("n_b"), F.col("sc").alias("sc_b"), F.col("sc2").alias("sc2_b"),
    )

    def mean(sc, n):
        return F.col(sc).cast("double") / F.lit(100.0) / F.col(n)

    def var(n, sc, sc2):
        nn = F.col(n).cast("double")
        # n = 1 → no variance estimate (and an ANSI divide-by-zero if
        # computed) — NULL propagates through se into the t/df guards
        return F.when(
            nn > 1,
            (nn * F.col(sc2).cast("double") - F.col(sc).cast("double") * F.col(sc).cast("double"))
            / (nn * (nn - F.lit(1.0)))
            / F.lit(10000.0),
        )

    va_n = var("n_a", "sc_a", "sc2_a") / F.col("n_a")
    vb_n = var("n_b", "sc_b", "sc2_b") / F.col("n_b")
    se = F.sqrt(va_n + vb_n)
    # degenerate-arm guards (ANSI divide-by-zero): an arm of size 1 has
    # no variance estimate, two constant arms have se = 0 — t and the
    # Welch df are undefined there (NULL), never a crash
    defined = (F.col("n_a") > 1) & (F.col("n_b") > 1)
    t = F.when(defined & (se > 0), (mean("sc_a", "n_a") - mean("sc_b", "n_b")) / se)
    nu = F.when(
        defined & (se > 0),
        (va_n + vb_n) * (va_n + vb_n)
        / (va_n * va_n / (F.col("n_a") - 1) + vb_n * vb_n / (F.col("n_b") - 1)),
    )
    return a.join(b, "event_type").select(
        "event_type",
        "n_a",
        "n_b",
        F.round(mean("sc_a", "n_a"), 4).alias("mean_a"),
        F.round(mean("sc_b", "n_b"), 4).alias("mean_b"),
        F.round(t, 4).alias("t_stat"),
        F.round(nu, 2).alias("welch_df"),
    )


def table_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content fingerprint per table — the
    data-versioning primitive: two copies of a table (different
    partitioning, different engines, different file layout) agree on
    the fingerprint iff they hold the same multiset of rows... up to
    XOR's duplicate-pair blindness, so the row count rides along to
    close the obvious hole.

    Per row: a 60-bit sha256-derived hash of the canonical row string
    (the shared cross-engine hash, ``dedup._h60``); per table:
    ``bit_xor`` — associative, commutative, overflow-free — so the
    aggregate is identical under ANY partitioning, with no rounding
    contract needed at all.
    """
    from parquet_to_csv_spark.operators.dedup import _h60

    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    d = docs.select(
        F.lit("documents").alias("table_name"),
        _h60(F.concat_ws("|", F.col("doc_id"), F.col("lang"), F.col("text"))).alias("h"),
    )
    e = ev.select(
        F.lit("events").alias("table_name"),
        _h60(
            F.concat_ws(
                "|",
                F.col("event_id"),
                F.col("user_id"),
                F.col("event_type"),
                F.round("value", 2),
            )
        ).alias("h"),
    )
    return (
        d.unionByName(e)
        .groupBy("table_name")
        .agg(
            F.expr("bit_xor(h)").alias("fingerprint"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def banded_row_number(
    df: DataFrame,
    order_cols,
    band_col,
    out_col: str = "rn",
    group_cols=(),
    total_col: str | None = None,
) -> DataFrame:
    """EXACT ``row_number()`` over a unique total order — globally or
    per group — WITHOUT an unpartitioned data window: the shared
    two-phase banded rank behind :func:`distributed_ntile`,
    ``gini_revenue``, and the round-4 sweep over the remaining
    global-window operators.

    ``order_cols`` is the ascending unique sort key (callers wanting a
    DESC rank pre-negate the value into a helper column).
    ``band_col`` must be a deterministic integer expression, MONOTONE
    non-decreasing in the FIRST order column within each group, derived
    from the row itself (``floor(value / width)``) — never
    ``repartitionByRange``, whose sampled boundaries differ across plan
    branches. Three bounded steps:

    1. local rank: one ``row_number`` window hash-partitioned on
       (group, band) — parallel across bands, the only per-row window;
    2. band offsets: per-(group, band) counts (one row per band —
       a tiny relation) prefix-summed over the BAND COUNT, not the
       data, then broadcast back;
    3. global rank = offset + local rank.

    With ``total_col`` set, the per-group row count rides along as an
    extra broadcast column (the n used by ntile folds / percentile
    picks). Output: input rows + ``out_col`` (long, 1-based)
    [+ ``total_col``], values identical to
    ``row_number() OVER ([PARTITION BY group] ORDER BY order_cols)``.
    """
    g = list(group_cols)
    banded = df.withColumn("_band", band_col.cast("long"))
    w_local = W.partitionBy(*g, "_band").orderBy(*[F.asc(c) for c in order_cols])
    local = banded.withColumn("_lr", F.row_number().over(w_local).cast("long"))
    counts = banded.groupBy(*g, "_band").agg(F.count(F.lit(1)).alias("_bn"))
    if g:
        w_off = W.partitionBy(*g).orderBy("_band").rowsBetween(
            W.unboundedPreceding, -1
        )
    else:
        # over the band-count relation (one row per band), not the data
        w_off = W.orderBy("_band").rowsBetween(W.unboundedPreceding, -1)
    offs = counts.select(
        *g,
        "_band",
        F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off"),
    )
    out = local.join(F.broadcast(offs), g + ["_band"]).withColumn(
        out_col, F.col("_off") + F.col("_lr")
    )
    if total_col is not None:
        if g:
            tot = counts.groupBy(*g).agg(F.sum("_bn").alias(total_col))
            out = out.join(F.broadcast(tot), g)
        else:
            tot = counts.agg(F.sum("_bn").alias(total_col))
            out = out.join(F.broadcast(tot))
    return out.drop("_band", "_lr", "_off")


def banded_prefix_sum(
    df: DataFrame,
    order_cols,
    sum_col: str,
    band_col,
    out_col: str = "cum",
    group_cols=(),
) -> DataFrame:
    """EXACT inclusive running SUM of ``sum_col`` over a unique total
    order — globally or per group — without an unpartitioned data
    window; the weighted twin of :func:`banded_row_number` (weighted
    medians, cumulative-weight order statistics).

    Same banding contract; step 1 computes a local cumulative sum per
    (group, band) and step 2 prefix-sums the per-band TOTALS (tiny
    relation) for the broadcast offsets. Output: input rows +
    ``out_col`` (long), identical to
    ``sum(sum_col) OVER ([PARTITION BY group] ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING)``.
    """
    g = list(group_cols)
    banded = df.withColumn("_band", band_col.cast("long"))
    w_local = (
        W.partitionBy(*g, "_band")
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = banded.withColumn("_lc", F.sum(sum_col).over(w_local).cast("long"))
    totals = banded.groupBy(*g, "_band").agg(
        F.sum(sum_col).cast("long").alias("_bs")
    )
    if g:
        w_off = W.partitionBy(*g).orderBy("_band").rowsBetween(
            W.unboundedPreceding, -1
        )
    else:
        w_off = W.orderBy("_band").rowsBetween(W.unboundedPreceding, -1)
    offs = totals.select(
        *g,
        "_band",
        F.coalesce(F.sum("_bs").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offs), g + ["_band"])
        .withColumn(out_col, F.col("_off") + F.col("_lc"))
        .drop("_band", "_lc", "_off")
    )


def distributed_ntile(
    df: DataFrame,
    val_col: str,
    key_col: str,
    n_tiles: int,
    band_col,
    out_col: str = "tile",
) -> DataFrame:
    """EXACT ``ntile(n)`` over the unique total order (val, key)
    WITHOUT a global single-partition sort — the at-scale form the
    round-2 docstrings deferred.

    ``band_col`` must be a deterministic, MONOTONE (non-decreasing in
    ``val_col``) integer banding expression derived from the row
    itself — e.g. ``floor(value / width)`` — NOT ``repartitionByRange``
    (whose sampled boundaries aren't identical across plan branches).
    Three steps, all bounded:

    1. local rank: one ``row_number`` window hashed on the band
       (parallel across bands — the only per-row window);
    2. band offsets: per-band counts (tiny relation, one row per
       band) prefix-summed with a single-partition window over the
       band COUNT, not the data, then broadcast;
    3. global rank = offset + local rank, folded to the exact ntile
       tile: with n rows and t tiles, q = n div t, r = n mod t, the
       first r tiles hold q+1 rows —
       ``rank <= (q+1)*r ? ceil(rank/(q+1)) : r + ceil((rank-(q+1)*r)/q)``
       in pure integer arithmetic (ceil(a/b) = (a+b-1) div b).

    Output: the input rows plus ``out_col`` (int) — values identical
    to ``F.ntile(n_tiles).over(W.orderBy(val, key))``, pinned by a
    partition-count invariance test.
    """
    ranked = banded_row_number(
        df, [val_col, key_col], band_col, out_col="_grn", total_col="_n"
    )
    rank = "_grn"
    t = n_tiles
    tile = (
        f"CASE WHEN {rank} <= ((_n div {t}) + 1) * (_n % {t}) "
        f"THEN ({rank} + (_n div {t})) div ((_n div {t}) + 1) "
        f"ELSE (_n % {t}) + ({rank} - ((_n div {t}) + 1) * (_n % {t}) "
        f"      + greatest(_n div {t}, 1) - 1) div greatest(_n div {t}, 1) END"
    )
    return (
        ranked.withColumn(out_col, F.expr(tile).cast("int"))
        .drop("_grn", "_n")
    )


def order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile bucketing of order values — exact ``ntile``
    semantics over the unique total order (o_totalprice, o_orderkey),
    computed by :func:`distributed_ntile` (deterministic value-banded
    local ranks + broadcast band offsets) instead of round 2's single
    global-sort window, so no task ever holds the whole relation.
    Output aggregates per decile so the gate stays small."""
    orders = load_table(spark, sf_dir, "orders")
    tiled = distributed_ntile(
        orders.select("o_orderkey", "o_totalprice"),
        "o_totalprice",
        "o_orderkey",
        10,
        F.floor(F.col("o_totalprice") / F.lit(20000.0)),
        out_col="decile",
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


def forget_users_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-propagation (right-to-be-forgotten) audit: purge a
    deterministic user cohort (user_id % 97 == 0) from the events
    table and emit the post-purge evidence — remaining row count,
    remaining-cohort count (must be 0), and the XOR content
    fingerprint (E71) of the surviving rows, which any replica can
    recompute independently to prove it purged the SAME rows.

    The purge itself is a scan predicate (no shuffle, no join — the
    cohort is defined by the key); the audit rides on the same scan.
    """
    from parquet_to_csv_spark.operators.dedup import _h60

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
    )
    kept = ev.filter(F.col("user_id") % 97 != 0).withColumn(
        "h",
        _h60(
            F.concat_ws(
                "|",
                F.col("event_id"),
                F.col("user_id"),
                F.col("event_type"),
                F.col("value"),
            )
        ),
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("user_id") % 97 == 0, 1)).alias("n_cohort_left"),
        F.expr("bit_xor(h)").alias("fingerprint"),
    )


def part_cooccurrence_topk(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Market-basket co-occurrence: the top-k part pairs that appear in
    the same order — the support counts of recommendation / frequent-
    itemset mining.

    Self-join on orderkey with ``a < b`` orientation: fan-out is
    quadratic in LINES PER ORDER (a small bounded constant, ~7 max in
    TPC-H-shaped data), never in table size; the pair counts get
    map-side partial aggregation and the global top-k is
    TakeOrderedAndProject. At 100 TB the same plan holds as long as
    basket size stays bounded — the skew lever for a pathological
    giant basket is the E23 salt or a per-order combination cap.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(k)
    )


# lineitem columns for the profiling pass: (name, kind). Timestamps
# surface as epoch-µs (the registry-wide convention) so both engines
# profile the identical value domain.
_PROFILE_COLS = [
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of ``lineitem``: row/null
    counts, exact distinct count, numeric min/max — the table-health
    pass every ingest pipeline runs before training-data release.

    Plan: ONE scan, unpivoted via ``stack`` into narrow
    (col_name, sval, nval) rows, one col_name-keyed exchange with
    two-phase partial aggregation — never |cols| separate scans, and
    never an ``expand``-based multi-column COUNT DISTINCT (which
    multiplies the UNSHUFFLED fact table by the distinct-agg count).
    The 11× row fan-out is of 3-column rows, not full rows.

    At 100 TB exact per-column distincts are still a shuffle of every
    distinct (col, value) pair; the at-scale drop-in is
    ``approx_count_distinct`` (single pass, mergeable HLL registers,
    no per-value shuffle) once ±2% is acceptable — same plan
    otherwise. Distinct counting runs on the canonical string form,
    which is injective per engine, so counts agree even where the two
    engines' string formatting differs.
    """
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    parts = []
    for name, kind in _PROFILE_COLS:
        if kind == "num":
            parts.append(f"'{name}', CAST({name} AS STRING), CAST({name} AS DOUBLE)")
        elif kind == "str":
            parts.append(f"'{name}', {name}, CAST(NULL AS DOUBLE)")
        else:  # ts → epoch µs (NTZ→LTZ cast is identity under the UTC session tz)
            us = f"unix_micros(CAST({name} AS TIMESTAMP))"
            parts.append(f"'{name}', CAST({us} AS STRING), CAST({us} AS DOUBLE)")
    stacked = li.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {', '.join(parts)}) AS (col_name, sval, nval)"
    )
    return stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("sval")).alias("n_nulls"),
        F.count_distinct("sval").alias("n_distinct"),
        F.min("nval").alias("min_val"),
        F.max("nval").alias("max_val"),
    )


def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of orders under (earlier ``o_orderdate``,
    higher ``o_totalprice``): an order survives iff no other order has a
    date ≤ its date AND a price ≥ its price with at least one strict.
    The skyline is what "best tradeoff" dashboards and multi-objective
    pruning (cheapest-earliest supplier, fastest-smallest model run)
    compute; the naive form is the quadratic NOT EXISTS self-join the
    DuckDB oracle runs.

    Scalable form: for a 2-D skyline, sort by date and keep rows whose
    price beats the running max of everything earlier — O(n log n), no
    self-join. A bare ``Window.orderBy`` would move the whole relation
    onto one task, so the running max is the two-phase distributed
    scan, banded by a DETERMINISTIC function of the data (calendar
    month) rather than ``repartitionByRange`` + ``spark_partition_id``:
    range boundaries come from sampling, so two branches reading the
    scan are not guaranteed the same pid→range mapping unless the
    exchange is physically reused — a month band derived from the row
    itself is identical in every branch, plan shape, and engine by
    construction. Per-band running max in parallel (window hashed on
    band), band maxima prefix-maxed on the band-count-sized tiny
    relation, broadcast back. Dominance on exact integer cents; ties
    (same date+price) are co-frontier — neither strictly dominates.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.unix_date(F.col("o_orderdate").cast("date")).alias("d"),
        F.col("o_totalprice"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = o.withColumn(
        "band",
        F.year(F.col("o_orderdate").cast("date")) * 12
        + F.month(F.col("o_orderdate").cast("date")),
    )
    w_strict = (
        W.partitionBy("band").orderBy("d").rangeBetween(W.unboundedPreceding, -1)
    )
    w_upto = (
        W.partitionBy("band").orderBy("d").rangeBetween(W.unboundedPreceding, 0)
    )
    local = base.select(
        "*",
        F.max("cents").over(w_strict).alias("lmax_before"),
        F.max("cents").over(w_upto).alias("lmax_upto"),
    )
    w_off = W.orderBy("band").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        base.groupBy("band")
        .agg(F.max("cents").alias("bmax"))
        .withColumn("prev_max", F.max("bmax").over(w_off))
        .select("band", "prev_max")
    )
    j = local.join(F.broadcast(offsets), "band")
    # strictly-earlier-date dominator with price >= mine, or
    # same-or-earlier-date dominator with price strictly > mine
    max_before = F.greatest(
        F.coalesce(F.col("lmax_before"), F.lit(-1)),
        F.coalesce(F.col("prev_max"), F.lit(-1)),
    )
    max_upto = F.greatest(
        F.coalesce(F.col("lmax_upto"), F.lit(-1)),
        F.coalesce(F.col("prev_max"), F.lit(-1)),
    )
    dominated = (max_before >= F.col("cents")) | (max_upto > F.col("cents"))
    # date surfaced as epoch-day long (registry parity convention —
    # raw timestamps realize ns in Spark vs µs in DuckDB)
    return (
        j.filter(~dominated)
        .select(
            "o_orderkey",
            F.col("d").cast("long").alias("order_day"),
            "o_totalprice",
        )
    )


def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint suite (the
    expectation-suite / dbt-test pattern) evaluated in bulk: one row
    per named constraint with the violation count, so a pipeline gate
    is a single ``filter(n_violations > 0)`` on a tiny relation.

    Constraint families and their plan shapes, chosen for 100 TB:

    - **uniqueness** (pk_orders_unique, pk_lineitem_unique): count −
      count(distinct key) via one partial-agg groupBy per table — no
      self-join, no sort;
    - **referential integrity** (fk_orders_customer,
      fk_lineitem_orders): LEFT ANTI join child→parent — only the
      child side streams through the exchange, parent side is the
      build side (broadcast when small, shuffle-hash otherwise; AQE
      decides);
    - **domain / range + uniqueness, fused per table**: ALL scalar
      constraints on a table evaluate in ONE aggregate over one scan
      (conditional counts + count−count_distinct side by side), then
      ``stack`` unpivots the scalars into report rows — lineitem is
      read once for its four checks, not four times. At 100 TB the
      number of fact-table scans IS the cost of the suite.

    Everything is an exact long count: no float to flip, trivially
    oracle-checkable, and the report stays bytes-sized however large
    the inputs.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")

    li_scalars = li.agg(
        (F.count("*") - F.count_distinct("l_orderkey", "l_linenumber")).alias(
            "pk_lineitem_unique"
        ),
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("chk_quantity_range"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
        ).alias("chk_discount_range"),
        F.count(
            F.when(
                (F.col("l_shipdate") < F.lit("1995-01-01"))
                | (F.col("l_shipdate") > F.lit("2002-12-31")),
                1,
            )
        ).alias("chk_shipdate_epoch"),
    ).select(
        F.expr(
            "stack(4,"
            " 'pk_lineitem_unique', pk_lineitem_unique,"
            " 'chk_quantity_range', chk_quantity_range,"
            " 'chk_discount_range', chk_discount_range,"
            " 'chk_shipdate_epoch', chk_shipdate_epoch"
            ") AS (constraint_name, n_violations)"
        )
    )
    o_scalars = orders.agg(
        (F.count("*") - F.count_distinct("o_orderkey")).alias("pk_orders_unique"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias(
            "chk_totalprice_positive"
        ),
    ).select(
        F.expr(
            "stack(2,"
            " 'pk_orders_unique', pk_orders_unique,"
            " 'chk_totalprice_positive', chk_totalprice_positive"
            ") AS (constraint_name, n_violations)"
        )
    )
    fk_orders_cust = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_violations"))
        .select(
            F.lit("fk_orders_customer").alias("constraint_name"), "n_violations"
        )
    )
    fk_li_orders = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("n_violations"))
        .select(
            F.lit("fk_lineitem_orders").alias("constraint_name"), "n_violations"
        )
    )
    return (
        o_scalars.unionByName(li_scalars)
        .unionByName(fk_orders_cust)
        .unionByName(fk_li_orders)
    )


def association_rules(
    spark: SparkSession, sf_dir: str, min_pair: int = 5, k: int = 25
) -> DataFrame:
    """Market-basket association rules (antecedent → consequent) with
    support / confidence / lift — the directed extension of
    :func:`part_cooccurrence_topk` (which stops at pair counts).

    Plan: one distinct (order, part) pass feeds item counts, the
    basket count, and the oriented pair self-join (fan-out quadratic
    in basket size — bounded — not table size, same contract as the
    co-occurrence op); the three measures are pure integer-ppm
    arithmetic on exact long counts:
    support = P(a∧b), confidence = P(b|a) = c_ab/c_a,
    lift = c_ab·n_orders / (c_a·c_b) (>1e6 ppm ⇒ positive
    association). Overflow bound: c_ab·n_orders·1e6 needs
    c_ab·n_orders ≤ 9.2e12 — at warehouse scale carry DECIMAL(38,0),
    plan unchanged. Top-k by lift is TakeOrderedAndProject.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c_item"))
    n_orders = F.broadcast(
        li.select("l_orderkey").distinct().agg(F.count(F.lit(1)).alias("n_orders"))
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("antecedent"),
            F.col("b.l_partkey").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_pair)
    )
    return (
        pairs.join(
            item.select(F.col("l_partkey").alias("antecedent"), F.col("c_item").alias("c_a")),
            "antecedent",
        )
        .join(
            item.select(F.col("l_partkey").alias("consequent"), F.col("c_item").alias("c_b")),
            "consequent",
        )
        .join(n_orders)
        .select(
            "antecedent",
            "consequent",
            "c_ab",
            F.expr("c_ab * 1000000 div n_orders").alias("support_ppm"),
            F.expr("c_ab * 1000000 div c_a").alias("confidence_ppm"),
            F.expr("c_ab * n_orders * 1000000 div (c_a * c_b)").alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "antecedent", "consequent")
        .limit(k)
    )


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (by quantity) of extended price per return
    flag — the robust central-tendency stat when rows carry unequal
    mass (percentile() can't weight; sampling changes the answer).

    Definition: the smallest value v (in the unique total order value,
    orderkey, linenumber) whose running weight reaches half the group
    total. The running weight comes from :func:`banded_prefix_sum`
    partitioned on (returnflag × price band) — l_returnflag has only 3
    values, so a flag-partitioned window would still push ~1/3 of
    lineitem through one task's sort; price-banding caps every task at
    one (flag, band) slice. Then a broadcast of the tiny per-group
    totals + a min-style relational argmin — everything exact integer
    cents / integer quantity units, so both engines agree bit-for-bit.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_quantity") + 0.5).alias("w"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).alias("price_cents"),
    )
    run = banded_prefix_sum(
        li,
        ["price_cents", "l_orderkey", "l_linenumber"],
        "w",
        F.expr("price_cents div 500000"),
        out_col="cumw",
        group_cols=["l_returnflag"],
    )
    tot = run.groupBy("l_returnflag").agg(F.sum("w").alias("totw"))
    hit = (
        run.join(F.broadcast(tot), "l_returnflag")
        .filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price_cents").alias("median_cents"),
            F.first("totw").alias("total_weight"),
        )
    )
    return hit.select("l_returnflag", "median_cents", "total_weight")


def order_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist over the unique (totalprice, orderkey)
    order, surfaced as exact integer ppm — "what percentile is this
    order's value" without float window functions (whose (rank−1)/(n−1)
    division both engines would round differently only in the last
    ulp, but ppm integers remove even that).

    rank == row_number here (unique order), so pct = (rn−1)·1e6 div
    (n−1) and cume = rn·1e6 div n. The rank comes from
    :func:`banded_row_number` (value-banded local ranks + broadcast
    prefix-summed band offsets) — no task ever sorts the whole
    relation; the band width is the parallelism knob at 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("cents"),
    )
    ranked = banded_row_number(
        base,
        ["cents", "o_orderkey"],
        F.expr("cents div 2000000"),
        out_col="rn",
        total_col="n",
    )
    return ranked.select(
        "o_orderkey",
        "cents",
        F.expr("(rn - 1) * 1000000 div (n - 1)").alias("pct_rank_ppm"),
        F.expr("rn * 1000000 div n").alias("cume_dist_ppm"),
    )


def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market-concentration index per nation:
    each supplier's revenue share (ppm) of their nation's total,
    squared and summed — the supply-risk KPI (10 000 ppm-of-ppm ≈ a
    monopoly; regulators flag > 250 000).

    Two keyed aggregations (supplier grain from one lineitem pass,
    then nation grain) + one broadcast dim join; shares are floored
    integer ppm of exact cents, the index a pure long sum — engine-
    exact end to end. Shuffle ∝ suppliers after the first partial agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.select(
            "l_suppkey",
            exact_units(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("u4"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("u4").alias("rev_u4"))
    )
    per_supp = rev.join(
        F.broadcast(supp), rev.l_suppkey == supp.s_suppkey
    ).select("s_nationkey", "rev_u4")
    nat = per_supp.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"), F.sum("rev_u4").alias("nat_u4")
    )
    shares = per_supp.join(F.broadcast(nat), "s_nationkey").select(
        "s_nationkey",
        "n_suppliers",
        F.expr("rev_u4 * 1000000 div nat_u4").alias("share_ppm"),
    )
    return shares.groupBy("s_nationkey").agg(
        F.first("n_suppliers").alias("n_suppliers"),
        F.expr("sum(share_ppm * share_ppm) div 1000000").alias("hhi_ppm"),
        F.max("share_ppm").alias("top_share_ppm"),
    )


def item_item_cosine_topk(
    spark: SparkSession, sf_dir: str, min_pair: int = 3, k: int = 3
) -> DataFrame:
    """Item-item collaborative filtering: each part's top-``k`` most
    similar parts by cosine over binary basket vectors —
    ``cos(a,b) = c_ab / sqrt(c_a·c_b)`` — the classic "customers who
    bought X also bought Y" neighbor table.

    Ranking never touches a float: cosine is monotone in
    ``c_ab²·1e6 div (c_a·c_b)`` (exact long arithmetic), which also
    serves as the reported score in ppm-of-cos². The oriented pair
    join is the same basket self-join as association_rules (fan-out ∝
    basket size², never table size); per-item top-k is a windowed rank
    over candidate pairs only.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c_item"))
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("item"),
            F.col("b.l_partkey").alias("neighbor"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_pair)
    )
    scored = (
        pairs.join(
            item.select(F.col("l_partkey").alias("item"), F.col("c_item").alias("c_a")),
            "item",
        )
        .join(
            item.select(
                F.col("l_partkey").alias("neighbor"), F.col("c_item").alias("c_b")
            ),
            "neighbor",
        )
        .select(
            "item",
            "neighbor",
            "c_ab",
            F.expr("c_ab * c_ab * 1000000 div (c_a * c_b)").alias("cos_sq_ppm"),
        )
    )
    w = W.partitionBy("item").orderBy(
        F.desc("cos_sq_ppm"), F.desc("c_ab"), F.asc("neighbor")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("item", "neighbor", "c_ab", "cos_sq_ppm", "rnk")
    )


# Benford expected first-digit shares in ppm: round(log10(1+1/d)*1e6).
# Hard literals so both engines compare against the SAME integers.
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals — the classic
    fabricated-data / unit-mixup screen on any monetary column.

    The first significant digit comes from the STRING of the exact
    integer cents (`substring(cast(cents as string), 1, 1)`) — never
    from `log10`/`pow`, whose float boundaries misclassify exact powers
    of ten. Observed shares in exact integer ppm; expected shares are
    hard integer literals (same nine constants in both engines), so the
    signed deviation is pure long arithmetic. One scan, one 9-group
    aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = exact_units(F.col("o_totalprice"), 2)
    digit = F.substring(cents.cast("string"), 1, 1).cast("long")
    counts = (
        orders.select(digit.alias("digit"))
        .filter(F.col("digit") >= 1)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    total = F.broadcast(counts.agg(F.sum("n_orders").alias("n_total")))
    expect = None
    for d, p in BENFORD_PPM.items():
        expect = F.when(F.col("digit") == d, F.lit(p)) if expect is None else expect.when(F.col("digit") == d, F.lit(p))
    return (
        counts.join(total)
        .select(
            "digit",
            "n_orders",
            F.expr("n_orders * 1000000 div n_total").alias("obs_ppm"),
            expect.alias("exp_ppm"),
        )
        .withColumn("dev_ppm", F.col("obs_ppm") - F.col("exp_ppm"))
    )


def value_quintile_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value quintile transition matrix, month over month —
    the "movement" view of customer health: how many users migrate
    from spend quintile q to quintile q' between consecutive months
    (upgrades, downgrades; absence = churn, handled by the churn ops).

    Per (customer, month) spend collapses in one scan (exact cents);
    quintiles come from ``ntile(5)`` partitioned by month and ordered
    by (spend, custkey) — the custkey tiebreak makes the total order
    unique, so ntile's remainder distribution is deterministic and
    identical in both engines. The month self-join is an equi-join on
    (custkey, month+shift) — same key family as the per-month
    exchange. Output is bounded: months × 25 cells.
    """
    orders = load_table(spark, sf_dir, "orders")
    ts = F.expr("cast(o_orderdate as timestamp)")
    per = (
        orders.select(
            "o_custkey",
            (F.year(ts) * 12 + F.month(ts)).alias("m"),
            exact_units(F.col("o_totalprice"), 2).alias("cents"),
        )
        .groupBy("o_custkey", "m")
        .agg(F.sum("cents").alias("spend"))
    )
    w = W.partitionBy("m").orderBy("spend", "o_custkey")
    q = per.withColumn("quintile", F.ntile(5).over(w))
    a = q.select(
        "o_custkey", F.col("m").alias("m_from"), F.col("quintile").alias("q_from")
    )
    b = q.select(
        "o_custkey", (F.col("m") - 1).alias("m_from"), F.col("quintile").alias("q_to")
    )
    return (
        a.join(b, ["o_custkey", "m_from"])
        .groupBy("m_from", "q_from", "q_to")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def skew_key_profile(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Shuffle-skew profiler for a join/aggregation key — the
    diagnostic run BEFORE a 100 TB join to decide whether salting or
    AQE skew-handling is needed: the hottest keys, their share of all
    rows, and their ratio to the mean key load.

    One groupBy to the key-count relation (map-side combine), one tiny
    global aggregate (key count, row total, max) broadcast back, and a
    global top-k planned as TakeOrderedAndProject. All shares are
    exact integer ppm; the mean ratio is cross-multiplied long
    arithmetic (``cnt·n_keys·10⁶ div total``), so no float division.
    """
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cnt"))
    stats = F.broadcast(
        counts.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("total_rows"),
        )
    )
    return (
        counts.join(stats)
        .select(
            F.col("l_orderkey").alias("key"),
            "cnt",
            F.expr("cnt * 1000000 div total_rows").alias("share_ppm"),
            F.expr("cnt * n_keys * 1000000 div total_rows").alias("vs_mean_ppm"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
    )


def partition_layout_advisor(
    spark: SparkSession, sf_dir: str, target_bytes: int = 134217728
) -> DataFrame:
    """Partition-layout advisor: per table, estimated logical bytes
    (exact per-row widths: 8 per int64/double column + string lengths)
    and the partition count that hits the 128 MB target — the sizing
    pass run before `repartition`/`maxPartitionBytes` are set on a new
    dataset, answering "how many output files should this write?".

    One aggregate per table (column widths are row-local arithmetic),
    a tiny union; partition counts are ceiling integer division on
    exact longs. At 100 TB this is the same single-scan shape — or
    free, read straight from parquet footers.
    """
    def est(table: str, width_expr: str) -> DataFrame:
        df = load_table(spark, sf_dir, table)
        return df.select(F.expr(width_expr).alias("row_bytes")).agg(
            F.lit(table).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("row_bytes").alias("est_bytes"),
        )

    parts = [
        est("documents", "8 + length(text) + length(lang) + length(source) + 8"),
        est("events", "8 + 8 + 8 + length(event_type) + 8 + length(props)"),
        est("orders", "8 + 8 + length(o_orderstatus) + 8 + 8 + length(o_orderpriority)"),
        est(
            "lineitem",
            "8 * 8 + 4 + length(l_returnflag) + length(l_linestatus)",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.select(
        "table_name",
        "n_rows",
        "est_bytes",
        F.expr(f"(est_bytes + {target_bytes} - 1) div {target_bytes}").alias(
            "parts_128mb"
        ),
        F.expr("est_bytes div n_rows").alias("avg_row_bytes"),
    )


def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: for each acquisition-month cohort,
    cumulative revenue per user at every tenure month — the table
    under every LTV/payback chart, computed at COHORT grain so
    per-user tenure gaps never need filling.

    One scan to (customer, month) spend (exact cents), a broadcast
    cohort join (per-customer min month — the same relation retention
    uses), then incremental cohort spend and ONE cumulative window
    over tenure per cohort (bounded by the calendar). All division is
    floored integer cents.
    """
    orders = load_table(spark, sf_dir, "orders")
    ts = F.expr("cast(o_orderdate as timestamp)")
    per = (
        orders.select(
            "o_custkey",
            (F.year(ts) * 12 + F.month(ts)).alias("m"),
            exact_units(F.col("o_totalprice"), 2).alias("cents"),
        )
        .groupBy("o_custkey", "m")
        .agg(F.sum("cents").alias("spend"))
    )
    cohorts = per.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    sizes = cohorts.groupBy("m0").agg(F.count(F.lit(1)).alias("n_users"))
    inc = (
        per.join(F.broadcast(cohorts), "o_custkey")
        .groupBy("m0", (F.col("m") - F.col("m0")).alias("tenure"))
        .agg(F.sum("spend").alias("inc_cents"))
    )
    w = (
        W.partitionBy("m0")
        .orderBy("tenure")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        inc.withColumn("cum_cents", F.sum("inc_cents").over(w))
        .join(F.broadcast(sizes), "m0")
        .select(
            F.col("m0").alias("cohort_month"),
            "tenure",
            "n_users",
            "cum_cents",
            F.expr("cum_cents div n_users").alias("avg_ltv_cents"),
        )
    )


def duplicate_payment_pairs(
    spark: SparkSession, sf_dir: str, window_days: int = 1
) -> DataFrame:
    """Duplicate-transaction screen: pairs of orders by the SAME
    customer for the SAME exact amount within ``window_days`` of each
    other — the double-charge / replay detector every payments
    pipeline runs nightly.

    The synthetic order stream has no duplicate charges (continuous
    prices ⇒ collision probability ~0), so — exactly like the PII
    op's planted matches — every 97th order is augmented with a
    deterministic next-day "retry" clone, making the parity check
    non-vacuous; the oracle replays the same augmentation.

    The join is EQUI on (custkey, exact cents) — the high-selectivity
    keys — with the day window as a residual predicate, so the shuffle
    carries each (customer, amount) bucket once and the quadratic is
    bounded by per-bucket multiplicity (at 100 TB: salt a pathological
    single amount, same recipe as the salted-join op). Day distance is
    exact integer epoch arithmetic.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        exact_units(F.col("o_totalprice"), 2).alias("cents"),
        F.expr(
            "unix_millis(cast(o_orderdate as timestamp)) div 86400000"
        ).alias("day"),
    )
    retries = orders.filter(F.pmod(F.col("o_orderkey"), F.lit(97)) == 0).select(
        (F.col("o_orderkey") + F.lit(1000000000)).alias("o_orderkey"),
        "o_custkey",
        "cents",
        (F.col("day") + 1).alias("day"),
    )
    aug = orders.unionAll(retries)
    a = aug.alias("a")
    b = aug.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.cents") == F.col("b.cents"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .filter(
            F.abs(F.col("a.day") - F.col("b.day")) <= window_days
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("order_a"),
            F.col("b.o_orderkey").alias("order_b"),
            F.col("a.cents").alias("amount_cents"),
            F.abs(F.col("a.day") - F.col("b.day")).alias("day_gap"),
        )
    )


def region_share_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total BI report: each region's share of every
    month's revenue plus its cumulative (running) share of all revenue
    to date — the two normalizations every exec dashboard shows next
    to the raw trend.

    One fact pass (orders ⋈ broadcast customer→nation→region dims) to
    (month, region) cents; month totals re-aggregate that tiny
    relation; cumulative sums are calendar-bounded windows per region.
    Shares are exact floored ppm — cross-multiplied longs, no float
    division.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    ts = F.expr("cast(o_orderdate as timestamp)")
    per = (
        orders.select(
            "o_custkey",
            (F.year(ts) * 100 + F.month(ts)).alias("ym"),
            exact_units(F.col("o_totalprice"), 2).alias("cents"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("ym", "r_name")
        .agg(F.sum("cents").alias("cents"))
    )
    month_tot = per.groupBy("ym").agg(F.sum("cents").alias("m_total"))
    w_cum = (
        W.partitionBy("r_name")
        .orderBy("ym")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_cum_all = W.orderBy("ym").rangeBetween(W.unboundedPreceding, 0)
    cum = per.withColumn("cum_cents", F.sum("cents").over(w_cum))
    grand = (
        month_tot.withColumn("cum_total", F.sum("m_total").over(w_cum_all))
        .select("ym", "m_total", "cum_total")
    )
    return (
        cum.join(grand, "ym")
        .select(
            "ym",
            "r_name",
            "cents",
            F.expr("cents * 1000000 div m_total").alias("month_share_ppm"),
            F.expr("cum_cents * 1000000 div cum_total").alias("ytd_share_ppm"),
        )
    )


def join_fanout_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join fan-out check: the EXACT output cardinality of
    orders ⋈ lineitem on orderkey computed WITHOUT running the join —
    Σ_k cnt_A(k)·cnt_B(k) over the two key-count relations — plus the
    max single-key fan-out. The guard run before any unfamiliar join
    at 100 TB: a blown-up estimate (or one hot key) means rethink the
    join, for the cost of two count aggregations instead of the join
    itself.

    The key-count relations are map-side-combined groupBys; their join
    carries one row per DISTINCT key; everything downstream is exact
    long sums. Avg fan-out is floored milli.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ca = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    cb = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    joined = ca.join(cb, "k")
    return joined.agg(
        F.count(F.lit(1)).alias("n_matching_keys"),
        F.sum(F.col("ca") * F.col("cb")).alias("est_join_rows"),
        F.max(F.col("ca") * F.col("cb")).alias("max_key_fanout"),
        F.expr("sum(ca * cb) * 1000 div count(1)").alias("avg_fanout_milli"),
    )


def discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-band elasticity table: average order quantity per
    discount band and its lift over the zero-discount baseline — the
    pricing team's first-order read on whether discounts move volume.

    One scan to (band, sums); the baseline band joins back as a one-row
    broadcast. Quantities are exact 2dp units; averages are floored
    milli-units and the lift is cross-multiplied exact ppm, so no
    float division anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem")
    band = F.expr("CAST(round(l_discount * 100) AS BIGINT)")
    per = (
        li.select(band.alias("disc_pct"), exact_units(F.col("l_quantity"), 2).alias("q"))
        .groupBy("disc_pct")
        .agg(F.count(F.lit(1)).alias("n_lines"), F.sum("q").alias("qsum"))
    )
    base = F.broadcast(
        per.filter(F.col("disc_pct") == 0).select(
            F.col("n_lines").alias("b_n"), F.col("qsum").alias("b_q")
        )
    )
    return (
        per.join(base)
        .select(
            "disc_pct",
            "n_lines",
            F.expr("qsum * 10 div n_lines").alias("avg_qty_milli"),
            F.expr("(qsum * b_n) * 1000000 div (b_q * n_lines)").alias(
                "lift_vs_base_ppm"
            ),
        )
    )


def supplier_leadtime_variability(
    spark: SparkSession, sf_dir: str, k: int = 15
) -> DataFrame:
    """Supplier lead-time variability ranking: which suppliers deliver
    LEAST predictably — ranked by the variance of their order→ship
    lag, the procurement metric that matters more than the mean (a
    slow-but-consistent supplier is plannable; an erratic one is not).

    Lag is an exact integer day count; variance comes from exact long
    sums (n·Σx² − (Σx)², cross-multiplied — no mean subtraction
    rounding), reported in milli-day² via floored division. One join
    orders⋈lineitem (the natural orderkey key), one supplier groupBy,
    global top-k as TakeOrderedAndProject.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        F.expr("unix_millis(cast(l_shipdate as timestamp)) div 86400000").alias("sd"),
    )
    lag = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_suppkey", (F.col("sd") - F.col("od")).alias("lag")
    )
    s = lag.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lag").alias("sx"),
        F.sum(F.col("lag") * F.col("lag")).alias("sxx"),
    )
    return (
        s.filter(F.col("n") >= 2)
        .select(
            "l_suppkey",
            "n",
            F.expr("sx * 1000 div n").alias("mean_lag_milli"),
            F.expr("(n * sxx - sx * sx) * 1000 div (n * n)").alias("var_milli"),
        )
        .orderBy(F.desc("var_milli"), F.asc("l_suppkey"))
        .limit(k)
    )


def return_rate_leaders(
    spark: SparkSession, sf_dir: str, k: int = 15, min_lines: int = 5
) -> DataFrame:
    """Return-rate leaders: the parts whose line items are returned
    most often (share of ``l_returnflag = 'R'`` lines), support-
    filtered and ranked — the product-quality screen behind every
    returns dashboard.

    One scan with map-side combine to (part, counts); rates are exact
    floored ppm; a deterministic global top-k (rate desc, part asc)
    plans as TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "n_returned"
        ),
    )
    return (
        per.filter(F.col("n_lines") >= min_lines)
        .withColumn(
            "return_ppm", F.expr("n_returned * 1000000 div n_lines")
        )
        .orderBy(F.desc("return_ppm"), F.asc("l_partkey"))
        .limit(k)
    )


def dead_stock_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E217: dead-stock report — per brand, how many parts had NO
    shipment in the trailing 90 days of the dataset (inventory the
    warehouse is still carrying but nobody buys; the slow-mover audit
    of every retail/supply-chain deployment).

    The anchor date is the global ``max(l_shipdate)`` computed INSIDE
    the plan (1-row broadcast, no driver action — the lesson of the
    round-1 ivf count() defect); "recently shipped" partkeys come from
    one filtered scan distinct'd to part cardinality; dead = LEFT ANTI
    against that set, so the fact table streams through exactly once
    and nothing quadratic exists.
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate")
    anchor = li.agg(F.max("l_shipdate").alias("max_ship"))
    recent = (
        li.crossJoin(F.broadcast(anchor))
        .filter(F.col("l_shipdate") >= F.col("max_ship") - F.expr("INTERVAL 90 DAYS"))
        .select("l_partkey")
        .distinct()
    )
    dead = part.join(
        recent, part.p_partkey == recent.l_partkey, "left_anti"
    ).groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_dead"))
    tot = part.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_parts"))
    return (
        tot.join(dead, "p_brand", "left")
        .select(
            "p_brand",
            "n_parts",
            F.coalesce("n_dead", F.lit(0)).alias("n_dead"),
            F.expr("coalesce(n_dead, 0) * 1000000 div n_parts").alias("dead_ppm"),
        )
    )


def price_consistency_audit(
    spark: SparkSession, sf_dir: str, k: int = 15, min_lines: int = 5
) -> DataFrame:
    """EXT E228: price-consistency leaders — the parts whose realized
    UNIT price varies most across line items (same item sold at wildly
    different prices: a pricing-policy or data-entry defect either
    way). The catalog-hygiene sibling of the lead-time variability
    screen, ranked by relative dispersion so cheap and expensive parts
    compare fairly.

    Unit price is an exact per-row integer: (price_cents · 100) div
    qty_cents — a deterministic quantization both engines compute
    identically; n/Σx/Σx² are exact long sums with map-side combine
    (bounds: unit ≤ 1e7 centi-cents, Σx² ≤ ~1e17 per part at 10³
    lines — widen to decimal past that). Dispersion = n·CV² in ppm,
    computed as ONE fixed IEEE pipeline over the exact longs then
    floored (the grouped_ols convention — the ×1e6 in pure long space
    would overflow at ~1e13 numerators). Global top-k is
    TakeOrderedAndProject.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (
            (exact_units(F.col("l_extendedprice"), 2) * 100)
        ).alias("pc"),
        exact_units(F.col("l_quantity"), 2).alias("qc"),
    )
    unit = li.select("l_partkey", F.expr("pc div qc").alias("x"))
    s = unit.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return (
        s.filter(F.col("n_lines") >= min_lines)
        .select(
            "l_partkey",
            "n_lines",
            F.expr("sx div n_lines").alias("mean_unit_cents"),
            F.expr(
                "CAST(floor((CAST(n_lines AS DOUBLE) * CAST(sxx AS DOUBLE)"
                " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
                " / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
                " * 1000000.0) AS BIGINT)"
            ).alias("dispersion_ppm"),
        )
        .orderBy(F.desc("dispersion_ppm"), F.asc("l_partkey"))
        .limit(k)
    )


def adamic_adar_links(
    spark: SparkSession, sf_dir: str, k: int = 20, max_degree: int = 50
) -> DataFrame:
    """EXT E237: Adamic-Adar link prediction on the co-purchase graph —
    part pairs NEVER ordered together but sharing common co-purchase
    neighbors, scored by Σ 1/ln(deg(z)) over the common neighbors z
    (rare shared neighbors weigh more). The recommender-candidate
    generator of graph ML, as pure relational algebra.

    Wedge enumeration is quadratic in the DEGREE of the pivot node, so
    hub nodes above ``max_degree`` are excluded from pivoting (the
    standard AA truncation — a part in every basket predicts nothing
    anyway); cost is then Σ_z min(deg_z, cap)², bounded. Existing
    edges are removed with one LEFT ANTI join. Per-z weights quantize
    to exact micro-units (``round(1e6/ln(deg))``, ln-of-integer
    convention) so the score sum is exact long arithmetic;
    top-k is TakeOrderedAndProject on (score, pair).
    """
    from parquet_to_csv_spark.operators.dedup import _materialize_once

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    # Round 12: the edge and pivot relations are branch-shared (edges
    # feeds und twice + the final anti-join; pivot is both wedge
    # sides), and Spark re-derives duplicated subtrees — the before
    # plan ran the orderkey self-join + distinct NINE times (20
    # Exchanges, 20 scans). One lazy localCheckpoint each computes
    # them once; every branch reads the materialized blocks.
    edges = _materialize_once(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
    )
    und = edges.select(F.col("pa").alias("z"), F.col("pb").alias("x")).unionAll(
        edges.select(F.col("pb").alias("z"), F.col("pa").alias("x"))
    )
    deg = und.groupBy("z").agg(F.count(F.lit(1)).alias("d"))
    pivot = _materialize_once(
        und.join(
            F.broadcast(deg.filter(F.col("d") <= max_degree)), "z"
        ).select("z", "x", "d")
    )
    w1 = pivot.alias("w1")
    w2 = pivot.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.z") == F.col("w2.z")) & (F.col("w1.x") < F.col("w2.x")),
    ).select(
        F.col("w1.x").alias("part_a"),
        F.col("w2.x").alias("part_b"),
        F.expr("CAST(round(1000000.0 / ln(CAST(w1.d AS DOUBLE))) AS BIGINT)").alias("u"),
    )
    scored = wedges.groupBy("part_a", "part_b").agg(
        F.sum("u").alias("aa_micro"), F.count(F.lit(1)).alias("n_common")
    )
    non_edges = scored.join(
        edges.select(
            F.col("pa").alias("part_a"), F.col("pb").alias("part_b")
        ),
        ["part_a", "part_b"],
        "left_anti",
    )
    return non_edges.orderBy(
        F.desc("aa_micro"), F.asc("part_a"), F.asc("part_b")
    ).limit(k)


def spc_control_limits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E239: XmR control chart (statistical process control) over
    monthly order revenue — center line, upper/lower control limits
    from the mean moving range (the 2.66·mR̄ individuals-chart rule),
    and each month flagged in/out of control. The ops-review chart
    that separates signal from noise in a KPI series.

    Monthly totals are exact cents; the moving range |Δ| comes from
    one lag window over the tiny month relation; limits are one fixed
    IEEE pipeline over exact longs (floored to cents), so the
    out-of-control flag is pure integer comparison. Calendar months
    use year·100+month under the UTC session contract (session.py) —
    identical in DuckDB.
    """
    from pyspark.sql import Window as W

    from parquet_to_csv_spark.functions.stable import exact_units

    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.select(
            (
                F.year(F.col("o_orderdate").cast("date")) * 100
                + F.month(F.col("o_orderdate").cast("date"))
            ).cast("long").alias("ym"),
            exact_units(F.col("o_totalprice"), 2).alias("cents"),
        )
        .groupBy("ym")
        .agg(F.sum("cents").alias("rev_cents"))
    )
    w = W.orderBy("ym")
    with_mr = monthly.withColumn(
        "mr", F.abs(F.col("rev_cents") - F.lag("rev_cents").over(w))
    )
    stats = with_mr.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("rev_cents").alias("tot"),
        F.sum("mr").alias("mr_sum"),
        F.count("mr").alias("mr_n"),
    )
    center = "CAST(tot AS DOUBLE) / CAST(n_months AS DOUBLE)"
    mrbar = "CAST(mr_sum AS DOUBLE) / CAST(mr_n AS DOUBLE)"
    lims = stats.select(
        "n_months",
        F.expr(f"CAST(floor({center}) AS BIGINT)").alias("center_cents"),
        F.expr(f"CAST(floor({center} + 2.66 * {mrbar}) AS BIGINT)").alias("ucl_cents"),
        F.expr(f"CAST(floor({center} - 2.66 * {mrbar}) AS BIGINT)").alias("lcl_cents"),
    )
    return (
        with_mr.crossJoin(F.broadcast(lims))
        .select(
            "ym",
            "rev_cents",
            "mr",
            "center_cents",
            "ucl_cents",
            "lcl_cents",
            (
                (F.col("rev_cents") > F.col("ucl_cents"))
                | (F.col("rev_cents") < F.col("lcl_cents"))
            ).cast("long").alias("out_of_control"),
        )
    )


def receivables_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E244: receivables aging — outstanding (non-'F'inal) order
    value bucketed by age at the as-of date (0-30 / 31-60 / 61-90 /
    90+ days), rolled up per customer nation. The working-capital
    report every finance close produces; as a query shape it is the
    as-of-anchored conditional rollup: anchor = max order date, a
    1-row broadcast computed IN the plan (no driver action), age
    buckets by pure integer day arithmetic, money in exact cents.

    One orders scan + one broadcast customer→nation dim chain — the
    fact table never shuffles except for the final tiny (nation ×
    bucket) aggregation with map-side combine.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    anchor = orders.agg(
        F.max(F.expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000")).alias(
            "anchor_day"
        )
    )
    aged = (
        orders.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            exact_units(F.col("o_totalprice"), 2).alias("cents"),
            (
                F.col("anchor_day")
                - F.expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000")
            ).alias("age_days"),
        )
        .select(
            "o_custkey",
            "cents",
            F.when(F.col("age_days") <= 30, "0-30")
            .when(F.col("age_days") <= 60, "31-60")
            .when(F.col("age_days") <= 90, "61-90")
            .otherwise("90+")
            .alias("bucket"),
        )
    )
    return (
        aged.join(F.broadcast(cust), aged.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("cents") / F.lit(100.0)).alias("outstanding"),
        )
    )


def abc_classification(
    spark: SparkSession, sf_dir: str, n_parts_range: int = 8
) -> DataFrame:
    """EXT E251: ABC inventory classification — parts ranked by
    revenue; class A = the head up to 80% of cumulative revenue,
    B = to 95%, C = the tail (the Pareto stock-policy segmentation
    every inventory system runs).

    Revenue per part is exact cents from one fact scan; the global
    revenue rank + running total use the two-phase range-partition
    prefix-sum (sequence_packing) — no single-task window ever sees
    the part relation. Class boundaries compare exact integer
    cumulative cents against 80%/95% of the exact total (cross-
    multiplied: ``cum·100 <= total·80`` — no float share). Output one
    row per part with rank, cumulative ppm and class.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        exact_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "units"
        ),
    )
    per = li.groupBy("l_partkey").agg(F.sum("units").alias("rev_u"))
    from pyspark.sql import Window as W

    base = per.repartitionByRange(
        n_parts_range, F.desc("rev_u"), F.asc("l_partkey")
    ).withColumn("pid", F.spark_partition_id())
    w_local = W.partitionBy("pid").orderBy(F.desc("rev_u"), F.asc("l_partkey"))
    local = base.withColumn("lrn", F.row_number().over(w_local)).withColumn(
        "lcum", F.sum("rev_u").over(w_local.rowsBetween(W.unboundedPreceding, 0))
    )
    totals = local.groupBy("pid").agg(
        F.max("lrn").alias("cnt"), F.sum("rev_u").alias("psum")
    )
    w_off = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "pid",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("roff"),
        F.coalesce(F.sum("psum").over(w_off), F.lit(0)).alias("coff"),
    )
    tot = per.agg(F.sum("rev_u").alias("total_u"))
    return (
        local.join(F.broadcast(offsets), "pid")
        .crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            (F.col("rev_u") / F.lit(100.0) / F.lit(100.0)).alias("revenue"),
            (F.col("lrn") + F.col("roff")).alias("rev_rank"),
            # cum·1e6 would overflow long at real totals; divide the
            # total down first — identical formula in the oracle.
            F.expr("(lcum + coff) div (total_u div 1000000)").alias("cum_ppm"),
            F.expr(
                "CASE WHEN (lcum + coff) * 100 <= total_u * 80 THEN 'A'"
                " WHEN (lcum + coff) * 100 <= total_u * 95 THEN 'B'"
                " ELSE 'C' END"
            ).alias("abc_class"),
        )
    )


def order_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E253: order fill-rate distribution — per order, the share of
    its line items already shipped at the as-of date, histogrammed
    into fill bands (0%, 1-49%, 50-99%, 100%) by order priority. The
    partial-shipment operational report: a priority class drifting
    toward low fill bands is a fulfillment failure the average hides.

    One lineitem scan to (order × shipped/total) counts with map-side
    combine (the anchor is the plan-internal broadcast max ship date
    minus 30 days, so 'shipped' is non-trivially partial), one
    orderkey equi-join against orders (both sides order-cardinality —
    NO broadcast hint; at scale this is a fact⋈fact join AQE plans as
    shuffle-hash, or exchange-free under the E25 bucketed layout), and
    a tiny (priority × band) rollup. Bands compare exact integer
    counts cross-multiplied — no float percentages anywhere.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    anchor = li.agg(
        (
            F.max(F.expr("unix_millis(cast(l_shipdate as timestamp)) div 86400000"))
            - F.lit(30)
        ).alias("anchor_day")
    )
    per_order = (
        li.crossJoin(F.broadcast(anchor))
        .select(
            "l_orderkey",
            (
                F.expr("unix_millis(cast(l_shipdate as timestamp)) div 86400000")
                <= F.col("anchor_day")
            ).cast("long").alias("shipped"),
        )
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"), F.sum("shipped").alias("n_shipped"))
    )
    banded = per_order.select(
        "l_orderkey",
        F.when(F.col("n_shipped") == 0, "0%")
        .when(F.col("n_shipped") * 2 < F.col("n_lines"), "1-49%")
        .when(F.col("n_shipped") < F.col("n_lines"), "50-99%")
        .otherwise("100%")
        .alias("fill_band"),
    )
    return (
        banded.join(orders, banded.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority", "fill_band")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def substitution_savings(
    spark: SparkSession, sf_dir: str, min_brands: int = 2
) -> DataFrame:
    """EXT E256: substitution-savings screen — within each
    interchangeable part family (same type × size), the spread between
    the cheapest brand's retail price and the family average: what
    procurement could save by switching brands. Families with one
    brand are excluded (nothing to switch to).

    One scan of ``part`` to the (type × size) grain with map-side
    combine — family stats (min / max / avg over exact cents, brand
    count) all ride a single aggregation; the savings ppm is exact
    integer arithmetic on cents. Output one row per multi-brand
    family.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    part = load_table(spark, sf_dir, "part").select(
        "p_type",
        "p_size",
        "p_brand",
        exact_units(F.col("p_retailprice"), 2).alias("cents"),
    )
    fam = part.groupBy("p_type", "p_size").agg(
        F.countDistinct("p_brand").alias("n_brands"),
        F.count(F.lit(1)).alias("n_parts"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.sum("cents").alias("sum_cents"),
    )
    return (
        fam.filter(F.col("n_brands") >= min_brands)
        .select(
            "p_type",
            "p_size",
            "n_brands",
            "n_parts",
            (F.col("min_cents") / F.lit(100.0)).alias("cheapest"),
            (F.col("max_cents") / F.lit(100.0)).alias("dearest"),
            F.expr("sum_cents div n_parts").alias("avg_cents"),
            F.expr(
                "(sum_cents div n_parts - min_cents) * 1000000"
                " div greatest(sum_cents div n_parts, 1)"
            ).alias("savings_ppm"),
        )
    )


def discount_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E260: discount-leakage audit — per brand: the list value of
    everything sold (retail price × quantity), the realized value
    (extended price after discount), and the leakage between them in
    exact ppm. The pricing-governance number: a brand whose leakage
    far exceeds the portfolio's is where discounting is out of
    control.

    lineitem⋈part on partkey: part is the build side (broadcast here;
    at 100 TB part is itself large — AQE picks shuffle-hash, and the
    E25 bucketed layout on partkey makes it exchange-free). List value
    = retail_cents × qty_cents div 100 — exact integer; realized =
    exact 4dp units of price×(1−disc). One scan each side, one tiny
    brand rollup.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        exact_units(F.col("l_quantity"), 2).alias("qty_c"),
        exact_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "real_u"
        ),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        exact_units(F.col("p_retailprice"), 2).alias("retail_c"),
    )
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.expr("retail_c * qty_c div 100").alias("list_c"),
        F.expr("real_u div 100").alias("real_c"),
    )
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.sum("list_c") / F.lit(100.0)).alias("list_value"),
        (F.sum("real_c") / F.lit(100.0)).alias("realized_value"),
        F.expr(
            "(sum(list_c) - sum(real_c)) div (sum(list_c) div 1000000)"
        ).alias("leakage_ppm"),
    )


def supplier_concentration_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E261: supplier-concentration profile — per part type: the
    distribution of each part's DOMINANT-supplier revenue share (mean
    and worst-case ppm) plus the thinnest supplier bench. The
    part-grain resilience view beside the nation-level HHI: a type
    whose max dominant share approaches 1e6 has parts that are
    de-facto single-sourced even when several suppliers nominally
    exist. (A boolean "single-sourced" flag would be vacuous on this
    fixture — every part has ≥8 suppliers — so the profile reports
    the shares themselves; the consumer picks the alarm threshold.)

    Two keyed aggregations with map-side combine: (part × supplier)
    revenue, then per-part max/total via one more groupBy; the
    dominant share is exact floored ppm of exact 4dp units; the type
    rollup is tiny. One broadcast part-dim join for the type.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        exact_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "rev_u"
        ),
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("rev_u").alias("r"))
    per_part = per_ps.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.max("r").alias("mx"),
        F.sum("r").alias("tot"),
    ).select(
        "l_partkey",
        "n_suppliers",
        F.expr("mx div (tot div 1000000)").alias("dom_ppm"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = per_part.join(F.broadcast(part), per_part.l_partkey == part.p_partkey)
    return j.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("n_suppliers").alias("min_suppliers"),
        F.expr("sum(dom_ppm) div count(1)").alias("mean_dom_ppm"),
        F.max("dom_ppm").alias("max_dom_ppm"),
    )


def incremental_join_maintenance(
    spark: SparkSession, sf_dir: str, cutoff: str = "1997-01-01"
) -> DataFrame:
    """EXT E262: incremental JOIN maintenance — the delta-join identity
    of incremental view maintenance: with orders split into base (<
    cutoff) and delta (≥ cutoff), the per-nation revenue view updates
    as  view(base ∪ Δ) = agg(base⋈C) ⊕ agg(Δ⋈C)  — only the delta
    side touches the join at refresh time. This query computes the
    incrementally-maintained result (base partial + delta partial,
    merged); the oracle computes the view from scratch — the gate IS
    the proof the maintenance is lossless, extending E?'s
    aggregation-only incrementality to joins.

    Customer/nation dims broadcast into both partials; the partials
    are mergeable exact-cent sums (order-independent), so at 100 TB
    yesterday's materialized partial + today's delta partial replace a
    full-history rescan.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        exact_units(F.col("o_totalprice"), 2).alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def partial(df: DataFrame) -> DataFrame:
        return (
            df.join(F.broadcast(cust), df.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c"))
        )

    base = partial(orders.filter(F.col("o_orderdate") < F.lit(cutoff)))
    delta = partial(orders.filter(F.col("o_orderdate") >= F.lit(cutoff)))
    return (
        base.unionByName(delta)
        .groupBy("n_name")
        .agg(F.sum("n").alias("n_orders"), (F.sum("c") / F.lit(100.0)).alias("revenue"))
    )


def order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E264: cross-table reconciliation audit — does
    ``o_totalprice`` equal the order's lineitem-derived total
    (Σ extended·(1−disc)·(1+tax), the TPC-H invariant)? Per order
    status: orders checked, orders with NO lineitems at all, invariant
    violations (off by more than a cent), and the worst/mean absolute
    error in exact cents. The fixture does NOT maintain the invariant
    (every joined order mismatches, and 257 orders have no lines at
    sf0.01) — which is exactly why a reconciliation audit exists: it
    measures drift between tables that should agree.

    The per-line product of three 2dp factors is an exact 6dp
    rational → exact integer micro-units per line, exact long sums per
    order; diffs, maxima and means are pure integer arithmetic. One
    lineitem aggregation + one LEFT join from orders (keeps the
    no-lineitem orders countable) + a tiny status rollup.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        exact_units(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            6,
        ).alias("u6"),
    )
    per_order = li.groupBy("l_orderkey").agg(F.sum("u6").alias("li_u6"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        (exact_units(F.col("o_totalprice"), 2) * F.lit(10000)).alias("o_u6"),
    )
    j = orders.join(
        per_order, orders.o_orderkey == per_order.l_orderkey, "left"
    ).select(
        "o_orderstatus",
        F.col("li_u6").isNull().cast("long").alias("no_lines"),
        F.when(
            F.col("li_u6").isNotNull(), F.abs(F.col("o_u6") - F.col("li_u6"))
        ).alias("diff_u6"),
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("no_lines").alias("n_no_lines"),
        F.sum((F.col("diff_u6") > 10000).cast("long")).alias("n_mismatch"),
        F.expr("max(diff_u6) div 10000").alias("max_abs_diff_cents"),
        F.expr("sum(diff_u6) div (count(diff_u6) * 10000)").alias(
            "mean_abs_diff_cents"
        ),
    )


def nation_league_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E271: nation league table — every nation ranked on three
    metrics at once (order revenue, order count, average order value)
    with per-metric dense ranks side by side: the multi-metric
    executive league table, showing where single-metric rankings
    disagree (high revenue via few huge orders vs many small ones).

    One orders aggregation to customer grain is avoided entirely —
    orders join the broadcast customer→nation chain and aggregate
    straight to the 25-row nation grain; the three rank windows then
    run over 25 rows. Money exact cents; avg is the floored-cents
    convention; ranks are integer.
    """
    from pyspark.sql import Window as W

    from parquet_to_csv_spark.functions.stable import exact_units

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", exact_units(F.col("o_totalprice"), 2).alias("cents")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_nation = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("rev_cents"))
        .withColumn("avg_cents", F.expr("rev_cents div n_orders"))
    )
    return per_nation.select(
        "n_name",
        (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
        "n_orders",
        "avg_cents",
        F.rank().over(W.orderBy(F.desc("rev_cents"), F.asc("n_name"))).alias("rev_rank"),
        F.rank().over(W.orderBy(F.desc("n_orders"), F.asc("n_name"))).alias("count_rank"),
        F.rank().over(W.orderBy(F.desc("avg_cents"), F.asc("n_name"))).alias("avg_rank"),
    )


def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E283: functional-dependency audit — for each candidate FD
    the schema IMPLIES, the number of violating determinant values
    (keys mapping to >1 dependent value). Checked: o_orderkey →
    o_orderdate within lineitem-joined rows (should hold: one order,
    one date), l_orderkey → o_custkey (FK chain), p_partkey → p_brand
    (dimension integrity), and user_id → first event type (expected
    to FAIL — a behavioral non-FD included so the audit demonstrably
    distinguishes holding from violated dependencies). Schema
    inference, CDC sanity and denormalization safety all start from
    exactly this table.

    Each FD is one groupBy(det) with countDistinct(dep) — map-side
    combined, shuffle ∝ determinant cardinality; the four audits union
    into one tidy relation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    ev = load_table(spark, sf_dir, "events")

    def fd(df: DataFrame, name: str, det: str, dep) -> DataFrame:
        per = df.groupBy(F.col(det).alias("k")).agg(
            F.countDistinct(dep).alias("nd")
        )
        return per.agg(
            F.lit(name).alias("dependency"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum((F.col("nd") > 1).cast("long")).alias("n_violating"),
            F.expr(
                "sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1000000 div count(1)"
            ).alias("violation_ppm"),
        )

    lio = li.join(orders, li.l_orderkey == orders.o_orderkey)
    first_ev = ev.groupBy("user_id", F.expr("ts div 86400000000000").alias("day")).agg(
        F.expr("min_by(event_type, struct(ts, event_id))").alias("fe")
    )
    audits = [
        fd(lio, "l_orderkey->o_orderdate", "l_orderkey", F.col("o_orderdate")),
        fd(lio, "l_orderkey->o_custkey", "l_orderkey", F.col("o_custkey")),
        fd(part, "p_partkey->p_brand", "p_partkey", F.col("p_brand")),
        fd(first_ev, "user_id->daily_first_event", "user_id", F.col("fe")),
    ]
    out = audits[0]
    for a in audits[1:]:
        out = out.unionAll(a)
    return out


def open_orders_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E284: open-order burn-down — for each calendar month, how
    many orders were already placed but not yet fully shipped (and the
    open value in exact cents): the WIP/backlog timeline every
    operations review tracks. An order is open from its order month
    through the month BEFORE its last line ships; never-shipped
    (orphan) orders are excluded with the caveat counted.

    Shape: per-order open interval from one lineitem max + one join;
    each order explodes only into the months of ITS OWN interval
    (sequence over month indexes — bounded fan-out, the interval-
    explode trick), then one (month) rollup with map-side combine.
    No sweep over the cross product of orders × months.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (
            F.year(F.col("o_orderdate").cast("date")) * 12
            + F.month(F.col("o_orderdate").cast("date"))
        ).cast("long").alias("om"),
        exact_units(F.col("o_totalprice"), 2).alias("cents"),
    )
    last_ship = load_table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        (
            F.year(F.max("l_shipdate").cast("date")) * 12
            + F.month(F.max("l_shipdate").cast("date"))
        ).cast("long").alias("sm")
    )
    j = orders.join(last_ship, orders.o_orderkey == last_ship.l_orderkey).filter(
        F.col("sm") > F.col("om")
    )
    months = j.select(
        F.explode(F.sequence(F.col("om"), F.col("sm") - 1)).alias("m"),
        "cents",
    )
    return months.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_open"),
        (F.sum("cents") / F.lit(100.0)).alias("open_value"),
    ).select(
        F.expr("m div 12").alias("year"),
        F.expr("m % 12").alias("month0"),
        "n_open",
        "open_value",
    )


def order_regularity(
    spark: SparkSession, sf_dir: str, min_gaps: int = 5, k: int = 15
) -> DataFrame:
    """EXT E287: purchase-regularity leaders — customers whose
    inter-order gaps are most METRONOMIC (lowest relative dispersion
    of day gaps, min support): the replenishment-subscription
    candidates of CRM, the behavioral complement of RFM (which sees
    volume, not rhythm).

    Support is expressed in GAPS: ``min_gaps`` inter-order gaps means
    at least ``min_gaps + 1`` orders for the customer.

    One orders scan → per-customer ordered day gaps via one lag window
    (shuffle on custkey); gap sufficient statistics are exact longs;
    the dispersion n·CV² lands in ppm via the fixed-IEEE-floor
    convention (E228); bottom-k = most regular via
    TakeOrderedAndProject on (dispersion ASC, custkey).
    """
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000").alias("od"),
    )
    w = W.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    gaps = orders.withColumn("gap", F.col("od") - F.lag("od").over(w)).filter(
        F.col("gap").isNotNull()
    )
    s = gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap").alias("sx"),
        F.sum(F.col("gap") * F.col("gap")).alias("sxx"),
    )
    disp = (
        "CAST(floor((CAST(n_gaps AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000.0) AS BIGINT)"
    )
    return (
        s.filter((F.col("n_gaps") >= min_gaps) & (F.col("sx") > 0))
        .select(
            "o_custkey",
            "n_gaps",
            F.expr("sx div n_gaps").alias("mean_gap_days"),
            F.expr(disp).alias("dispersion_ppm"),
        )
        .orderBy(F.asc("dispersion_ppm"), F.asc("o_custkey"))
        .limit(k)
    )


def topk_customer_share(
    spark: SparkSession, sf_dir: str, k: int = 10
) -> DataFrame:
    """EXT E288: key-account concentration — per nation, the revenue
    share held by its top-``k`` customers (exact ppm): the
    account-risk number sales leadership tracks (a nation at 600k ppm
    from 10 accounts is a key-account business; losing one hurts).
    The nation-grain drill-down of the global Gini (E?).

    Per-customer revenue is one aggregation; the per-nation top-k is a
    rank window PARTITIONED by nation (bounded by customers-per-
    nation, never a global sort); shares are exact integer ppm of
    exact cents.
    """
    from pyspark.sql import Window as W

    from parquet_to_csv_spark.functions.stable import exact_units

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", exact_units(F.col("o_totalprice"), 2).alias("cents")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.sum("cents").alias("c"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "o_custkey", "c")
    )
    w = W.partitionBy("n_name").orderBy(F.desc("c"), F.asc("o_custkey"))
    ranked = per_cust.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.when(F.col("rn") <= k, F.col("c")).otherwise(F.lit(0))).alias(
            "topk_cents"
        ),
        F.sum("c").alias("total_cents"),
    ).select(
        "n_name",
        "n_customers",
        (F.col("topk_cents") / F.lit(100.0)).alias("topk_revenue"),
        F.expr("topk_cents * 1000000 div total_cents").alias("topk_share_ppm"),
    )


def winback_orders(
    spark: SparkSession, sf_dir: str, dormancy_days: int = 90
) -> DataFrame:
    """EXT E292: win-back (resurrection) analysis — orders placed after
    the customer had been dormant more than ``dormancy_days``, counted
    per quarter with their share of the quarter's orders and the
    reactivated revenue. The lifecycle metric between "new" and
    "returning" (E?'s split is blind to it): rising win-backs mean
    re-engagement is working — or that retention broke first.

    One lag window per customer gives the previous-order gap (shuffle
    on custkey); quarters are integer epoch arithmetic; all counts
    and cents exact; the quarter rollup is tiny.
    """
    from pyspark.sql import Window as W

    from parquet_to_csv_spark.functions.stable import exact_units

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000").alias("od"),
        (
            F.year(F.col("o_orderdate").cast("date")) * 4
            + F.quarter(F.col("o_orderdate").cast("date")) - 1
        ).cast("long").alias("yq"),
        exact_units(F.col("o_totalprice"), 2).alias("cents"),
    )
    w = W.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    gapped = orders.withColumn("gap", F.col("od") - F.lag("od").over(w))
    return gapped.groupBy("yq").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            (F.col("gap") > F.lit(dormancy_days)).cast("long")
        ).alias("n_winback"),
        F.expr(
            f"sum(CASE WHEN gap > {dormancy_days} THEN 1 ELSE 0 END) * 1000000"
            " div count(1)"
        ).alias("winback_ppm"),
        (
            F.sum(
                F.when(F.col("gap") > F.lit(dormancy_days), F.col("cents")).otherwise(
                    F.lit(0)
                )
            )
            / F.lit(100.0)
        ).alias("winback_revenue"),
    ).select(
        F.expr("yq div 4").alias("year"),
        F.expr("yq % 4 + 1").alias("quarter"),
        "n_orders",
        "n_winback",
        "winback_ppm",
        "winback_revenue",
    )


def supplier_share_movers(
    spark: SparkSession, sf_dir: str, k: int = 10
) -> DataFrame:
    """EXT E296: supplier share movers — each supplier's revenue share
    (ppm) in the dataset's FIRST full year vs its LAST, ranked by
    absolute share delta: who is winning and losing the book of
    business. The supply-side twin of the token rank movers (E?) at
    the business grain; a big mover either earned share or inherited
    a failing rival's — both worth a look.

    Year bounds come from plan-internal min/max broadcast (no driver
    action); per-(supplier, year) cents are one map-side-combined
    aggregation; shares are exact ppm per year; the top-k movers by
    |Δ| are TakeOrderedAndProject.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.year(F.col("l_shipdate").cast("date")).cast("long").alias("yr"),
        exact_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "rev_u"
        ),
    )
    bounds = li.agg(F.min("yr").alias("y0"), F.max("yr").alias("y1"))
    tagged = li.crossJoin(F.broadcast(bounds)).filter(
        (F.col("yr") == F.col("y0")) | (F.col("yr") == F.col("y1"))
    )
    per = tagged.groupBy("l_suppkey", (F.col("yr") == F.col("y0")).alias("is_first")).agg(
        F.sum("rev_u").alias("r")
    )
    tot = per.groupBy("is_first").agg(F.sum("r").alias("t"))
    shares = per.join(F.broadcast(tot), "is_first").select(
        "l_suppkey",
        "is_first",
        F.expr("r * 1000000 div t").alias("share_ppm"),
    )
    first = shares.filter(F.col("is_first")).select(
        "l_suppkey", F.col("share_ppm").alias("first_ppm")
    )
    last = shares.filter(~F.col("is_first")).select(
        "l_suppkey", F.col("share_ppm").alias("last_ppm")
    )
    return (
        first.join(last, "l_suppkey", "full")
        .select(
            "l_suppkey",
            F.coalesce("first_ppm", F.lit(0)).alias("first_ppm"),
            F.coalesce("last_ppm", F.lit(0)).alias("last_ppm"),
            (
                F.coalesce("last_ppm", F.lit(0)) - F.coalesce("first_ppm", F.lit(0))
            ).alias("delta_ppm"),
        )
        .orderBy(F.desc(F.abs(F.col("delta_ppm"))), F.asc("l_suppkey"))
        .limit(k)
    )


def rec_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E356: catalog-coverage / popularity-concentration audit of
    the E135 item-item recommender — the standard recsys health check:
    a neighbor table that only ever surfaces the head of the catalog
    amplifies popularity bias no matter how good its similarities are.

    Reports, from the recommender's own output relation: catalog size,
    items holding any recommendation slot (as source and as target),
    coverage ppm of each, total slots, the share of slots captured by
    the top-decile most-recommended neighbors (exact
    ``distributed_ntile`` over neighbor slot counts), and the Gini
    concentration of neighbor slots in ppm (the gini_revenue
    banded-rank formula — no unpartitioned window anywhere).
    """
    from parquet_to_csv_spark.operators.dedup import _materialize_once

    # materialize the recommender output ONCE (guide §5): five audit
    # branches (slots, sources, ntile, banded rank, gini) read it, and
    # un-materialized each re-ran the full item-item cosine join
    recs = _materialize_once(item_item_cosine_topk(spark, sf_dir))
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    n_cat = F.broadcast(part.agg(F.count(F.lit(1)).alias("n_catalog")))
    slots = recs.groupBy("neighbor").agg(F.count(F.lit(1)).alias("n_slots"))
    srcs = recs.select("item").distinct().agg(
        F.count(F.lit(1)).alias("n_source_items")
    )
    tgts = slots.agg(
        F.count(F.lit(1)).alias("n_target_items"),
        F.sum("n_slots").alias("n_total_slots"),
    )
    tiled = distributed_ntile(
        slots, "n_slots", "neighbor", 10, F.expr("n_slots div 4"), out_col="dec"
    )
    top_share = tiled.agg(
        F.sum(F.when(F.col("dec") == 10, F.col("n_slots"))).alias("top_slots"),
        F.sum("n_slots").alias("all_slots"),
    ).select(
        F.expr("top_slots * 1000000 div all_slots").alias("top_decile_share_ppm")
    )
    # Gini over neighbor slot counts: G = (2·Σ i·x_(i) − (n+1)·Σx) /
    # (n·Σx) with ranks from the banded machinery, floored ppm
    ranked = banded_row_number(
        slots, ["n_slots", "neighbor"], F.expr("n_slots div 4"),
        out_col="rn", total_col="n",
    )
    gini = ranked.agg(
        F.sum(F.expr("rn * n_slots")).alias("swx"),
        F.sum("n_slots").alias("sx"),
        F.max("n").alias("nn"),
    ).select(
        F.expr(
            "(2 * swx - (nn + 1) * sx) * 1000000 div (nn * sx)"
        ).alias("gini_slots_ppm")
    )
    return (
        srcs.crossJoin(F.broadcast(tgts))
        .crossJoin(n_cat)
        .crossJoin(F.broadcast(top_share))
        .crossJoin(F.broadcast(gini))
        .select(
            "n_catalog",
            "n_source_items",
            F.expr("n_source_items * 1000000 div n_catalog").alias(
                "source_coverage_ppm"
            ),
            "n_target_items",
            F.expr("n_target_items * 1000000 div n_catalog").alias(
                "target_coverage_ppm"
            ),
            "n_total_slots",
            "top_decile_share_ppm",
            "gini_slots_ppm",
        )
    )


def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface (E363): monthly revenue spread WIDE across order
    statuses — the long→wide twin of the UNPIVOT/melt surface (E326).
    A reference user reshaping query output for a report gets
    ``df.groupBy(...).pivot(...)`` here; values are passed EXPLICITLY
    (``["F", "O", "P"]``) so the plan stays single-pass — an implicit
    pivot first runs a distinct-collection job and yields a
    data-dependent schema, both wrong at 100 TB.

    Plan: one orders scan (2 columns read) → ``pivot`` lowers to ONE
    hash aggregate of conditional sums (map-side combine, single
    exchange on ym) — identical shape to hand-written
    ``sum(CASE WHEN ...)`` columns. Exact integer cents throughout.
    """
    o = load_table(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
        "o_orderstatus",
        exact_units(F.col("o_totalprice"), 2).alias("cents"),
    )
    wide = o.groupBy("ym").pivot("o_orderstatus", ["F", "O", "P"]).agg(
        F.sum("cents")
    )
    filled = wide.select(
        "ym",
        F.coalesce(F.col("F"), F.lit(0).cast("long")).alias("f_cents"),
        F.coalesce(F.col("O"), F.lit(0).cast("long")).alias("o_cents"),
        F.coalesce(F.col("P"), F.lit(0).cast("long")).alias("p_cents"),
    )
    return filled.withColumn(
        "total_cents",
        F.col("f_cents") + F.col("o_cents") + F.col("p_cents"),
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS surface (E364): revenue by (region, priority) with
    region subtotals and a grand total in ONE pass — the general form
    of CUBE/ROLLUP (E18/E208) where the caller names exactly the
    lattice levels wanted, with ``grouping()`` provenance flags so
    subtotal rows are distinguishable from genuine NULL groups.

    Plan: fact scan joins customer on the distributed key, then nation
    → region as broadcast dims; ``groupingSets`` lowers to a single
    Expand + hash aggregate — one data pass emits all three levels
    (3× the exchange rows of the finest level, NOT 3 scans). The
    grouping-flag ints are engine-portable (0 = grouped, 1 = rolled
    up), unlike the bit-packed ``grouping_id`` whose bit order is
    engine-specific.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").alias("priority"),
        exact_units(F.col("o_totalprice"), 2).alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("region", "priority", "cents")
    )
    return (
        base.groupingSets(
            [["region", "priority"], ["region"], []], "region", "priority"
        )
        .agg(
            F.grouping("region").cast("int").alias("g_region"),
            F.grouping("priority").cast("int").alias("g_priority"),
            F.sum("cents").alias("rev_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "region", "priority", "g_region", "g_priority",
            "rev_cents", "n_orders",
        )
    )


def nullsafe_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E376: null-safe equality join (``<=>`` / IS NOT DISTINCT
    FROM) — the join SQL equality silently drops. Entity-resolution
    keys are routinely partial (email/phone/attribute NULL = unknown);
    plain ``=`` evaluates NULL = NULL to NULL, so every
    unknown-keyed row falls out of an inner join and the loss is
    invisible. ``<=>`` treats NULL as a VALUE (matches NULL with
    NULL, hashes and shuffles like any key — still a plain hash join,
    no plan penalty).

    Fixture: the props-bag ``k`` banded then NULLed on one band
    (``nullif`` — the "unknown" class), distinct per-user keys from
    the even/odd event-id halves, joined both ways. The audit row
    quantifies exactly what ``=`` lost: ``n_nullsafe - n_eq`` =
    unknown-to-unknown matches, the rows an entity-resolution run
    would silently fail to link.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(
            "nullif(cast(get_json_object(props, '$.k') as int) div 25, 1)"
        ).alias("k_null"),
    )
    a = ev.filter(F.col("event_id") % 2 == 0).select("user_id", "k_null").distinct()
    b = ev.filter(F.col("event_id") % 2 == 1).select("user_id", "k_null").distinct()
    eq = a.join(
        b,
        (a.user_id == b.user_id) & (a.k_null == b.k_null),
    )
    ns = a.join(
        b,
        (a.user_id == b.user_id) & a.k_null.eqNullSafe(b.k_null),
    )
    return (
        a.agg(
            F.count(F.lit(1)).alias("n_a"),
            F.sum(F.col("k_null").isNull().cast("long")).alias("n_null_a"),
        )
        .join(F.broadcast(b.agg(F.count(F.lit(1)).alias("n_b"))))
        .join(F.broadcast(eq.agg(F.count(F.lit(1)).alias("n_eq"))))
        .join(F.broadcast(ns.agg(F.count(F.lit(1)).alias("n_nullsafe"))))
        .select(
            "n_a",
            "n_b",
            "n_null_a",
            "n_eq",
            "n_nullsafe",
            (F.col("n_nullsafe") - F.col("n_eq")).alias("n_rescued_links"),
        )
    )


def mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E380: Oaxaca-style mix-vs-within decomposition — the "why
    did the average move" readout. The change in overall mean order
    value between two halves of the date range is attributed per
    priority group g:

        mix_g    = (share2_g − share1_g) · mean1_g     (composition)
        within_g = share2_g · (mean2_g − mean1_g)      (behavior)

    with Σ_g (mix_g + within_g) = Δmean exactly in rational
    arithmetic; the integer-unit outputs quantize shares to ppm, so
    the reconstruction residual is bounded by Σ_g mean_g/10^6 — a
    few cents on dollar-scale means, pinned by the pytest bound.
    Shares in exact ppm, means in 4dp-cents; both engines truncate
    integer division identically (probed: both round toward zero).
    One scan → (period × priority) partials (bounded grain); every
    division happens on the tiny aggregate relation.
    """
    orders = load_table(spark, sf_dir, "orders")
    per = (
        orders.select(
            F.when(F.year("o_orderdate") <= 1997, F.lit(1))
            .otherwise(F.lit(2))
            .alias("period"),
            F.col("o_orderpriority").alias("priority"),
            F.expr("cast(floor(o_totalprice * 100 + 0.5) as long)").alias(
                "cents"
            ),
        )
        .groupBy("period", "priority")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("cents").alias("s"))
    )
    tot = per.groupBy("period").agg(
        F.sum("c").alias("tc"), F.sum("s").alias("ts")
    )
    j = (
        per.join(F.broadcast(tot), "period")
        .select(
            "period",
            "priority",
            F.expr("c * 1000000 div tc").alias("share_ppm"),
            F.expr("s * 10000 div c").alias("mean_c4"),
            F.expr("ts * 10000 div tc").alias("gmean_c4"),
        )
    )
    p1 = j.filter(F.col("period") == 1).select(
        "priority",
        F.col("share_ppm").alias("share1_ppm"),
        F.col("mean_c4").alias("mean1_c4"),
        F.col("gmean_c4").alias("gmean1_c4"),
    )
    p2 = j.filter(F.col("period") == 2).select(
        "priority",
        F.col("share_ppm").alias("share2_ppm"),
        F.col("mean_c4").alias("mean2_c4"),
        F.col("gmean_c4").alias("gmean2_c4"),
    )
    return p1.join(p2, "priority").select(
        "priority",
        "share1_ppm",
        "share2_ppm",
        "mean1_c4",
        "mean2_c4",
        F.expr("(share2_ppm - share1_ppm) * mean1_c4 div 1000000").alias(
            "mix_c4"
        ),
        F.expr("share2_ppm * (mean2_c4 - mean1_c4) div 1000000").alias(
            "within_c4"
        ),
        (F.col("gmean2_c4") - F.col("gmean1_c4")).alias("delta_mean_c4"),
    )


def approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E382: approx_count_distinct error audit — the measurement
    that justifies every "HLL++ is the 100 TB drop-in" note in this
    repo's exact-distinct operators. Per event_type, the exact
    distinct user count runs next to the sketch at two precisions
    (rsd 5 % and 1 %), and the audit emits the exact count plus
    in-bound flags (|approx − exact| ≤ 4·rsd·exact — HLL++'s rsd is a
    standard deviation, so 4σ is a generous determinism-safe bound).

    Oracle subtlety: DuckDB cannot replay Spark's HLL++ register
    values, but it doesn't need to — the sketch is DETERMINISTIC for
    fixed input data, so the bound FLAGS are stable engine-side facts
    the oracle asserts as constants (TRUE). If a Spark upgrade or a
    data rewrite ever pushed the sketch out of bound, the gate goes
    red. Scale note: the sketch is mergeable and fixed-size (2^p
    registers) — at 100 TB it replaces exact distinct wherever the
    consumer tolerates the published rsd; this audit is how that
    tolerance gets decided.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", 0.05).alias("_a5"),
        F.approx_count_distinct("user_id", 0.01).alias("_a1"),
    )
    return per.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("_a5") - F.col("n_exact"))
            <= F.lit(4) * F.lit(0.05) * F.col("n_exact")
        ).alias("rsd5_within_4sigma"),
        (
            F.abs(F.col("_a1") - F.col("n_exact"))
            <= F.lit(4) * F.lit(0.01) * F.col("n_exact")
        ).alias("rsd1_within_4sigma"),
    )




def lateral_topk_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E388: correlated LATERAL subquery — the "for each outer row,
    run this parameterized query" SQL surface (Spark 4 LATERAL): per
    region, the top-2 customers by account balance, written exactly as
    the analyst thinks it ("for each region: SELECT ... ORDER BY ...
    LIMIT 2"), with the deterministic (cents DESC, custkey) tie-break.

    The honest scale note: Catalyst DECORRELATES this — the physical
    plan is a join + per-group limit, not an N-times re-execution of
    the inner query, so the surface costs what the equivalent
    window/top-k plan costs (E11). The gate pins both the decorrelated
    semantics and the tie-break against DuckDB's own LATERAL.
    """
    load_table(spark, sf_dir, "region").createOrReplaceTempView("t_lat_region")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("t_lat_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "t_lat_customer"
    )
    return spark.sql(
        """
        SELECT r.r_name AS region, t.c_custkey, t.c_name, t.bal_cents
        FROM t_lat_region r,
        LATERAL (
          SELECT c.c_custkey, c.c_name,
                 cast(floor(c.c_acctbal * 100 + 0.5) as long) AS bal_cents
          FROM t_lat_customer c
          JOIN t_lat_nation n ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          ORDER BY bal_cents DESC, c.c_custkey
          LIMIT 2
        ) t
        """
    )


def incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E403: incremental view maintenance with RETRACTIONS — keep a
    materialized AGGREGATE current by applying a CDC delta to the
    aggregate itself, never re-scanning the base. The IVM contract:
    count/sum aggregates are self-maintainable, so inserts contribute
    (+1, +cents), deletes (−1, −cents), and updates (0, Δcents); the
    maintained view must equal a full recompute over the post-CDC
    table. Maintenance cost is O(|delta|) whatever the base size —
    at 100 TB the delta is the day's changes, the base is never read.

    Deterministic CDC workload over ``events`` (md5-bucket arithmetic,
    engine-replayable): base = buckets 0–79, inserts = buckets 80–99,
    deletes = base buckets ≡ 0 (mod 7), updates = base buckets ≡ 1
    (mod 7) with value + 10.00. Output carries the maintained state
    AND the per-type delta audit columns, so a wrong retraction sign
    or a missed update shifts a visible column, not just the total.
    """
    from parquet_to_csv_spark.operators.corpus import md5_bucket

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("cast(floor(value * 100 + 0.5) as long)").alias("cents"),
        md5_bucket(F.col("event_id"), 100).alias("b"),
    )
    base = ev.filter(F.col("b") < 80)
    view = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n0"), F.sum("cents").alias("c0")
    )
    # delta stream with per-row (dn, dc) contributions
    inserts = ev.filter(F.col("b") >= 80).select(
        "event_type",
        F.lit(1).cast("long").alias("dn"),
        F.col("cents").alias("dc"),
        F.lit("insert").alias("op"),
    )
    deletes = base.filter(F.col("b") % 7 == 0).select(
        "event_type",
        F.lit(-1).cast("long").alias("dn"),
        (-F.col("cents")).alias("dc"),
        F.lit("delete").alias("op"),
    )
    updates = base.filter(F.col("b") % 7 == 1).select(
        "event_type",
        F.lit(0).cast("long").alias("dn"),
        F.lit(1000).cast("long").alias("dc"),  # +10.00 per updated row
        F.lit("update").alias("op"),
    )
    delta = (
        inserts.unionByName(deletes)
        .unionByName(updates)
        .groupBy("event_type")
        .agg(
            F.sum("dn").alias("dn"),
            F.sum("dc").alias("dc"),
            F.sum((F.col("op") == "insert").cast("long")).alias("n_inserted"),
            F.sum((F.col("op") == "delete").cast("long")).alias("n_deleted"),
            F.sum((F.col("op") == "update").cast("long")).alias("n_updated"),
        )
    )
    return (
        view.join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce("n0", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias(
                "n_events"
            ),
            (F.coalesce("c0", F.lit(0)) + F.coalesce("dc", F.lit(0))).alias(
                "value_cents"
            ),
            F.coalesce("n_inserted", F.lit(0)).alias("n_inserted"),
            F.coalesce("n_deleted", F.lit(0)).alias("n_deleted"),
            F.coalesce("n_updated", F.lit(0)).alias("n_updated"),
        )
    )


def largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E408: largest-remainder (Hamilton) allocation — the exact
    penny-splitting rule finance pipelines need: allocate each order's
    total price across its line items proportionally to quantity, in
    integer cents, such that the parts sum EXACTLY to the order total
    (floor every share, then distribute the remaining pennies one each
    to the largest fractional remainders, ties by line number).

    Naive proportional rounding drifts by ±n/2 cents per order and the
    books don't balance; this is the standard fix. All arithmetic is
    integer (shares in cents, remainders in exact numerator units), so
    the oracle replays it bit-for-bit. Plan shape: one orders⋈lineitem
    join partitioned on the order key, one per-order window for the
    remainder ranks — the window grain is the order (bounded fan-out),
    never global. Output digests per-order allocations corpus-wide so
    the gate sees every order: total allocation drift must be ZERO.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("long").alias("qty")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("cast(floor(o_totalprice * 100 + 0.5) as long)").alias("total_c"),
    )
    j = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select("l_orderkey", "l_linenumber", "qty", "total_c")
    sums = j.groupBy("l_orderkey").agg(F.sum("qty").alias("qsum"))
    base = (
        j.join(sums, "l_orderkey")
        .select(
            "l_orderkey",
            "l_linenumber",
            "total_c",
            "qsum",
            "qty",
            F.expr("total_c * qty div qsum").alias("floor_c"),
            # remainder numerator (exact integers; comparing these IS
            # comparing fractional parts at common denominator qsum)
            F.expr("total_c * qty % qsum").alias("rem_num"),
        )
    )
    # the fixture carries duplicate (orderkey, linenumber) pairs, so
    # qty joins the tie-break; fully-identical rows are interchangeable
    # (any assignment yields the same per-order aggregates)
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("rem_num"), F.asc("l_linenumber"), F.asc("qty")
    )
    alloc = base.withColumn("rnk", F.row_number().over(w)).withColumn(
        "extra",
        (
            F.col("rnk")
            <= F.col("total_c")
            - F.sum("floor_c").over(
                Window.partitionBy("l_orderkey")
            )
        ).cast("long"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("floor_c") + F.col("extra")).alias("alloc_c"),
    )
    per_order = alloc.groupBy("l_orderkey").agg(
        F.sum("alloc_c").alias("alloc_sum"),
        F.count(F.lit(1)).alias("n_lines"),
        F.max("alloc_c").alias("max_line_c"),
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("alloc_sum") - F.col("total_c")).alias("drift_c"),
            "n_lines",
            "max_line_c",
        )
        .groupBy("n_lines")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.abs("drift_c")).alias("total_abs_drift_c"),
            F.sum("max_line_c").alias("sum_max_line_c"),
        )
    )


def approx_percentile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E419: approx_percentile error audit — the percentile twin of
    E382's approx_count_distinct audit, and the measurement behind
    every "swap percentile() for approx_percentile at scale" note in
    this repo. Per l_returnflag over lineitem: the EXACT interpolated
    p50/p90 (``percentile()``, the semantics the DuckDB oracle replays
    with quantile_cont) runs next to ``approx_percentile`` at accuracy
    1 000, and the audit emits the exact values plus in-bound flags on
    the approx answer's ACTUAL RANK DISPLACEMENT: Greenwald-Khanna
    guarantees the returned element's rank r satisfies
    |r − q·n| ≤ n/accuracy, so the flag checks the observed rank
    interval [count(<x), count(≤x)] against q·n ± (n/accuracy + 1).

    Oracle subtlety (the E382 discipline): DuckDB cannot replay the GK
    sketch, and doesn't need to — the flags are deterministic
    engine-side facts (the guarantee is an algorithm invariant, valid
    under ANY merge order, so partition scrambling cannot flip them);
    the oracle asserts them as constants and recomputes the exact
    percentiles. Scale: the sketch is mergeable and O(accuracy·log n)
    — the 100 TB drop-in wherever the consumer tolerates the published
    rank error; this audit is how that tolerance gets decided.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("round(percentile(l_extendedprice, 0.5), 2)").alias("p50_exact"),
        F.expr("round(percentile(l_extendedprice, 0.9), 2)").alias("p90_exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("_a50"),
        F.expr("approx_percentile(l_extendedprice, 0.9, 1000)").alias("_a90"),
    )
    ranks = (
        li.join(
            F.broadcast(agg.select("l_returnflag", "_a50", "_a90")),
            "l_returnflag",
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("_a50"), 1).otherwise(0)
            ).alias("r50_lt"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("_a50"), 1).otherwise(0)
            ).alias("r50_le"),
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("_a90"), 1).otherwise(0)
            ).alias("r90_lt"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("_a90"), 1).otherwise(0)
            ).alias("r90_le"),
        )
    )
    slack = F.col("n") / 1000 + 1

    def within(q, lt, le):
        target = F.lit(q) * F.col("n")
        return (F.col(le) >= target - slack) & (F.col(lt) <= target + slack)

    return agg.join(ranks, "l_returnflag").select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        "p50_exact",
        "p90_exact",
        within(0.5, "r50_lt", "r50_le").alias("p50_within_guarantee"),
        within(0.9, "r90_lt", "r90_le").alias("p90_within_guarantee"),
    )


def hits_copurchase(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """EXT E483: HITS hubs & authorities (Kleinberg 1999) on the
    bipartite customer↔part co-purchase graph — the OTHER classic
    link-analysis fixpoint beside PageRank (E91/E347/E441): a part is
    an authority when bought by strong hub customers; a customer is a
    hub when buying strong authority parts. On retail data this
    surfaces catalogue anchors (authorities) and taste-making broad
    buyers (hubs), which degree alone misranks.

    Two mutual-reinforcement rounds from h₀ = 1, unnormalized so every
    score is an exact long (a₁ = part degree; h₁(c) = Σ_{p∼c} a₁(p);
    a₂(p) = Σ_{c∼p} h₁(c)) — normalization only rescales ranks, so
    dropping it preserves the ranking while removing every float. The
    part cohort is bounded (partkey ≡ 0 mod 7) to hold score growth
    ~deg² inside long headroom at any SF. Top-k authorities break ties
    on partkey.

    Scale: the edge relation (distinct cust–part) is the unit of
    work; each round is one keyed exchange (join + groupBy on the
    edge's own keys), never a cartesian, and the top-k is a
    TakeOrderedAndProject over the part aggregate.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("cust")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 7 == 0
    ).select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part"))
    edges = orders.join(li, "ok").select("cust", "part").distinct()
    a1 = edges.groupBy("part").agg(F.count(F.lit(1)).cast("long").alias("a1"))
    h1 = (
        edges.join(a1, "part")
        .groupBy("cust")
        .agg(F.sum("a1").alias("h1"))
    )
    a2 = (
        edges.join(h1, "cust")
        .groupBy("part")
        .agg(F.sum("h1").alias("auth_score"), F.count(F.lit(1)).alias("degree"))
    )
    return (
        a2.orderBy(F.desc("auth_score"), F.asc("part"))
        .limit(k)
        .select(
            "part",
            F.col("degree").cast("long").alias("degree"),
            "auth_score",
            F.row_number()
            .over(W.orderBy(F.desc("auth_score"), F.asc("part")))
            .alias("rnk"),
        )
    )


def candidate_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E485: candidate-key discovery over ``orders`` — the data-
    profiling question BEFORE the functional-dependency audit (E283):
    which column (sets) uniquely identify a row? Classic TANE/profiling
    territory, scoped to a fixed candidate lattice (4 single columns +
    the 3 business-plausible pairs) so the search is a declared
    relation, not a combinatorial sweep.

    ONE aggregate pass computes every exact distinct count
    side-by-side (Spark plans multi-distinct via a single expand —
    still one scan of the table); uniqueness = ndv/n in exact ppm;
    ``is_key`` is the exact equality. At 100 TB you'd screen with
    approx_count_distinct first (E382 prices that error) and confirm
    only the screened winners exactly — documented trade, same shape.
    """
    orders = load_table(spark, sf_dir, "orders")
    singles = ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    pairs = [
        ("o_custkey", "o_orderdate"),
        ("o_custkey", "o_totalprice"),
        ("o_orderdate", "o_totalprice"),
    ]
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    names = []
    for c in singles:
        names.append(c)
        aggs.append(F.countDistinct(c).alias(f"ndv_{len(names)}"))
    for c1, c2 in pairs:
        names.append(f"{c1},{c2}")
        aggs.append(F.countDistinct(c1, c2).alias(f"ndv_{len(names)}"))
    wide = orders.agg(*aggs)
    rows = [
        wide.select(
            F.lit(nm).alias("col_set"),
            "n_rows",
            F.col(f"ndv_{i + 1}").alias("n_distinct"),
            F.expr(f"ndv_{i + 1} * 1000000 div n_rows").alias("unique_ppm"),
            (F.col(f"ndv_{i + 1}") == F.col("n_rows"))
            .cast("long")
            .alias("is_key"),
        )
        for i, nm in enumerate(names)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def linear_interp_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E506: calendar gap-fill with LINEAR interpolation — the
    numeric-series complement to E113's forward-fill (right for
    balances/states) : for rates and volumes a gap is better estimated
    by the line between its bracketing observations. Shape: one daily
    aggregate per type, a sequence-exploded day spine (bounded by the
    calendar), two ignorenulls window fills carrying both the
    bracketing VALUES and their DAYS, then one exact integer lerp
    ``prev + (next−prev)·(day−prev_day) div (next_day−prev_day)``.
    Edges (before first / after last observation) stay NULL —
    interpolation, not extrapolation.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day"),
        )
        .agg(F.sum(exact_units(F.col("value"), 2)).alias("cents"))
    )
    # thin the series so the fixture actually HAS gaps at every SF
    observed = daily.filter(F.expr("pmod(day, 3) != 1"))
    span = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "event_type", F.explode(F.expr("sequence(d0, d1)")).alias("day")
    )
    grid = spine.join(observed, ["event_type", "day"], "left")
    w_prev = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(0, W.unboundedFollowing)
    )
    obs_day = F.when(F.col("cents").isNotNull(), F.col("day"))
    filled = grid.select(
        "event_type",
        "day",
        "cents",
        F.last("cents", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("cents", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("nd"),
    )
    lerp = F.expr("pv + (nv - pv) * (day - pd) div (nd - pd)")
    return filled.select(
        "event_type",
        "day",
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .otherwise(
            F.when(
                F.col("pv").isNotNull() & F.col("nv").isNotNull(), lerp
            )
        )
        .alias("cents_filled"),
        F.col("cents").isNull().cast("long").alias("is_interpolated"),
    )
