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


def test_registry_query_views_compose_in_sql(spark, sf_dir):
    """Registry operators exposed as SQL views compose with ad-hoc SQL
    (join an operator result against a raw table view)."""
    from parquet_to_csv_spark.plans import sqlapi

    created = sqlapi.register_query_views(
        spark, sf_dir, names=["exact_dedup", "text_stats"]
    )
    assert created == ["q_exact_dedup", "q_text_stats"]
    out = sqlapi.sql(
        spark,
        """
        SELECT d.lang, count(*) AS n_unique_docs
        FROM q_exact_dedup e JOIN documents d ON e.doc_id = d.doc_id
        GROUP BY d.lang ORDER BY d.lang
        """,
        sf_dir=sf_dir,
    ).collect()
    langs = {r["lang"]: r["n_unique_docs"] for r in out}
    assert sum(langs.values()) > 0
    # cross-check against the operator executed directly
    from parquet_to_csv_spark.operators.dedup import exact_dedup
    from parquet_to_csv_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    want = {
        r["lang"]: r["n"]
        for r in exact_dedup(spark, sf_dir)
        .join(docs, "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert langs == want
