"""SQL entry point (SURVEY.md §3, engine entry point 3).

The reference has no query language — its one pipeline is hard-coded.
The engine exposes the full Spark SQL surface over the fixture tables
for free: register views once, then ``sql(spark, "...")``. Catalyst
produces identical plans for SQL and DataFrame formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquet_to_csv_spark.sources.tables import register_views


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run ANSI SQL against the engine's tables. If ``sf_dir`` is given,
    (re)register the fixture tables from that directory first."""
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(query)


def register_query_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Expose registry operators to plain SQL users: each named query
    becomes a TEMP VIEW ``q_<name>`` wrapping its (lazy) DataFrame
    plan, so ``sql(spark, "SELECT ... FROM q_exact_dedup JOIN ...")``
    composes operator results with ad-hoc SQL — the engine's operators
    and its SQL surface are the same Catalyst plans either way.

    Pass ``names`` to register a subset: a handful of operators run
    EAGER build steps at plan-construction time (persisted-index and
    iterative ops such as ``ivf_indexed_topk`` / ``markov_attribution``
    — their materializations/lineage cuts execute jobs), so
    registering the full 350+ registry in one call is a deliberate
    choice, not the default usage. Returns the view names created.
    """
    from parquet_to_csv_spark.plans.registry import QUERIES

    created = []
    for name in (names if names is not None else list(QUERIES)):
        view = f"q_{name}"
        QUERIES[name](spark, sf_dir).createOrReplaceTempView(view)
        created.append(view)
    return created
