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
