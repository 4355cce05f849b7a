"""Physical-layout tests: bucketed co-located joins and partition
pruning — the write-side scale contract of SCALE.md."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_csv_spark.sources import layout
from parquet_to_csv_spark.sources.tables import load_table


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    layout.write_bucketed(orders, "t_orders_b", "o_orderkey")
    layout.write_bucketed(li, "t_lineitem_b", "o_orderkey")
    joined = layout.colocated_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
    plan = _physical(joined)
    assert "Exchange" not in plan, plan
    # sanity: same result as the plain shuffled join
    plain = orders.join(li, "o_orderkey")
    assert joined.count() == plain.count()


def test_partition_pruning(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.timestamp_micros(F.expr("ts div 1000")))
    )
    out = str(tmp_path / "events_by_day")
    layout.write_partitioned(ev, out, "day")
    some_day = ev.select(F.min("day")).first()[0]
    pruned = spark.read.parquet(out).filter(F.col("day") == F.lit(some_day))
    plan = _physical(pruned)
    assert "PartitionFilters" in plan
    # the partition predicate must NOT appear as a post-scan data filter
    assert pruned.count() == ev.filter(F.col("day") == F.lit(some_day)).count()


def test_compact_small_files(spark, sf_dir, tmp_path):
    from parquet_to_csv_spark.sources import layout
    import os

    src = str(tmp_path / "shattered")
    out = str(tmp_path / "compacted")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.repartition(64).write.parquet(src)
    n_in = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_in >= 32  # genuinely shattered
    n_out = layout.compact_small_files(spark, src, out, target_file_mb=512)
    assert n_out == 1  # tiny data -> one file
    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert b.count() == a.count()
    assert b.exceptAll(a).count() == 0


def test_minmax_manifest_skips_files(spark, sf_dir, tmp_path):
    from parquet_to_csv_spark.sources import layout

    src = str(tmp_path / "ranged")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # range-partition by event_id so files have disjoint id ranges
    ev.repartitionByRange(8, "event_id").write.parquet(src)
    man = layout.minmax_manifest(spark, src, "event_id").collect()
    assert len(man) == 8
    full = spark.read.parquet(src)
    lo = full.agg(F.min("event_id")).collect()[0][0]
    manifest = layout.minmax_manifest(spark, src, "event_id")
    picked = layout.skipped_read(spark, src, manifest, "event_id", lo, lo + 10)
    expect = full.filter((F.col("event_id") >= lo) & (F.col("event_id") <= lo + 10))
    assert picked.count() == expect.count()
    assert picked.exceptAll(expect).count() == 0
    # the skipping actually skipped: the pruned plan reads < all files
    n_kept = manifest.filter(
        (F.col("max_event_id") >= lo) & (F.col("min_event_id") <= lo + 10)
    ).count()
    assert n_kept < 8


def test_skipped_read_empty_range(spark, sf_dir, tmp_path):
    from parquet_to_csv_spark.sources import layout

    src = str(tmp_path / "ranged2")
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    ev.repartitionByRange(4, "event_id").write.parquet(src)
    manifest = layout.minmax_manifest(spark, src, "event_id")
    none = layout.skipped_read(spark, src, manifest, "event_id", -10_000, -9_999)
    assert none.count() == 0


def test_zorder_layout_prunes_both_dims(spark, sf_dir, tmp_path):
    """Sorting by the Morton key bounds BOTH dims per file: a day
    predicate prunes z-ordered files while a user-sorted layout keeps
    every file (day is uncorrelated with user, so each user-sorted
    file spans all days)."""
    from parquet_to_csv_spark.sources import layout

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 4096).cast("int").alias("x"),
        F.expr("ts div 86400000000000 - 19723").cast("int").alias("y"),
    )
    # scale BOTH dims to ~8 bits first (x: 15 users → ×16, y: 30 days →
    # ×8): with unequal bit widths the key's top bits all come from the
    # wider dim and the split degenerates to a single-column sort (the
    # standard z-order normalization requirement)
    zed = ev.withColumn(
        "zkey",
        layout.morton_key((F.col("x") * 16).cast("int"), (F.col("y") * 8).cast("int")),
    )
    z_path = str(tmp_path / "byz")
    u_path = str(tmp_path / "byuser")
    layout.write_sorted_export(zed, z_path, 8, "zkey")
    layout.write_sorted_export(zed, u_path, 8, "x")

    def kept(path, col, lo, hi):
        man = layout.minmax_manifest(spark, path, col)
        return man.filter(
            (F.col(f"max_{col}") >= lo) & (F.col(f"min_{col}") <= hi)
        ).count(), man.count()

    day = 10
    # note: manifest pruning is on the RAW y column; the scaling only
    # shapes the sort key
    z_kept, z_total = kept(z_path, "y", day, day)
    u_kept, u_total = kept(u_path, "y", day, day)
    assert z_total == 8 and u_total == 8
    assert u_kept == 8  # user sort shatters the day dimension
    assert z_kept < 8  # z-order bounds it
    # and the z layout still prunes on user too (probe a quarter of the
    # 15-user domain)
    zx_kept, _ = kept(z_path, "x", 0, 3)
    assert zx_kept < 8


def test_dynamic_partition_pruning_engages(spark, sf_dir, tmp_path):
    """EXT E351: partition-pruned layouts must prune DYNAMICALLY too —
    when the filter arrives through a dim join rather than a literal,
    Spark injects a dynamicpruning#... subquery on the fact scan's
    partition column (the 100 TB star-join pattern: scan only the
    partitions the filtered dim selects). Pins (a) the plan carries
    the DPP expression, (b) results equal the literal-filter plan."""
    import os

    from pyspark.sql import functions as F

    from parquet_to_csv_spark.sources.tables import load_table

    fact_dir = str(tmp_path / "orders_by_prio")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(fact_dir)

    dim = (
        orders.select("o_orderpriority").distinct()
        .filter(F.col("o_orderpriority").startswith("1"))
    )
    fact = spark.read.parquet(fact_dir)
    joined = fact.join(dim, "o_orderpriority").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_custkey").alias("s")
    )
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    got = {(r["o_orderpriority"], r["n"], r["s"]) for r in joined.collect()}
    want = {
        (r["o_orderpriority"], r["n"], r["s"])
        for r in orders.filter(F.col("o_orderpriority").startswith("1"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_custkey").alias("s"))
        .collect()
    }
    assert got == want and len(got) > 0
