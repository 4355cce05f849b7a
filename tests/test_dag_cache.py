"""Pipeline DAG materializer + plan-fingerprint result cache (✅T
components — file/workflow semantics, no SQL oracle; tests carry the
correctness weight: topological order, freshness skipping, staleness
cascade, cache hit/miss discipline, vacuum determinism)."""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from parquet_to_csv_spark.plans import result_cache
from parquet_to_csv_spark.plans.dag import Dag, Node
from parquet_to_csv_spark.sources.tables import load_table


def test_result_cache_hit_miss_and_salt(spark, sf_dir, tmp_path):
    cd = str(tmp_path / "cache")
    df = load_table(spark, sf_dir, "orders").groupBy("o_orderstatus").count()
    assert not result_cache.warm_hit(df, cd)
    first = sorted(map(tuple, result_cache.cached(df, cd).collect()))
    assert result_cache.warm_hit(df, cd)
    # identical plan built independently → HIT (semantic hash, not identity)
    df2 = load_table(spark, sf_dir, "orders").groupBy("o_orderstatus").count()
    assert result_cache.warm_hit(df2, cd)
    assert sorted(map(tuple, result_cache.cached(df2, cd).collect())) == first
    # a different plan → MISS
    df3 = load_table(spark, sf_dir, "orders").groupBy("o_orderpriority").count()
    assert not result_cache.warm_hit(df3, cd)
    # same plan, different salt (input snapshot moved) → MISS
    assert not result_cache.warm_hit(df, cd, salt="v2")
    assert len(result_cache.cache_entries(cd)) == 1


def test_result_cache_vacuum(spark, sf_dir, tmp_path):
    cd = str(tmp_path / "cache")
    df = load_table(spark, sf_dir, "region").select("r_name")
    result_cache.cached(df, cd)
    (key, mtime) = result_cache.cache_entries(cd)[0]
    assert result_cache.vacuum_cache(cd, max_age_seconds=3600, now=mtime + 10) == []
    assert result_cache.vacuum_cache(cd, max_age_seconds=5, now=mtime + 10) == [key]
    assert result_cache.cache_entries(cd) == []


def test_dag_builds_skips_and_cascades(spark, sf_dir, tmp_path):
    out = str(tmp_path / "dag")

    def top_customers(spark_, inputs):
        return (
            inputs["orders_agg"]
            .orderBy(F.desc("total"), F.asc("o_custkey"))
            .limit(10)
        )

    def orders_agg(spark_, inputs):
        return (
            load_table(spark_, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
        )

    dag = Dag(
        [
            Node("orders_agg", orders_agg),
            Node("top_customers", top_customers, deps=["orders_agg"]),
            Node("exact_dedup", "exact_dedup"),  # registry node
        ]
    )
    s1 = dag.run(spark, out, sf_dir=sf_dir)
    assert s1 == {
        "orders_agg": "built",
        "top_customers": "built",
        "exact_dedup": "built",
    }
    # second run: everything fresh
    s2 = dag.run(spark, out, sf_dir=sf_dir)
    assert set(s2.values()) == {"fresh"}
    # touch a dependency → ONLY its downstream rebuilds
    time.sleep(1.1)
    os.utime(os.path.join(out, "orders_agg", "_SUCCESS"))
    s3 = dag.run(spark, out, sf_dir=sf_dir)
    assert s3["orders_agg"] == "fresh"
    assert s3["top_customers"] == "built"
    assert s3["exact_dedup"] == "fresh"
    # results are readable and correct shape
    top = spark.read.parquet(os.path.join(out, "top_customers")).collect()
    assert len(top) == 10


def test_dag_rejects_cycles_and_unknown_deps():
    with pytest.raises(ValueError):
        Dag([Node("a", lambda s, i: None, deps=["b"])])
    dag = Dag(
        [
            Node("a", lambda s, i: None, deps=["b"]),
            Node("b", lambda s, i: None, deps=["a"]),
        ]
    )
    with pytest.raises(ValueError):
        dag.topo_order()
