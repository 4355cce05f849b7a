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
