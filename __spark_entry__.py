"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as a named
DataFrame builder; ``oracle_sql()`` — matching DuckDB SQL. Registry
lives in ``parquet_to_csv_spark/plans/registry.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from parquet_to_csv_spark.plans.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full transform pipeline (scan → derive
    duration_ms → filter → distinct) aggregated by event type."""
    from parquet_to_csv_spark.operators.refpipe import duration_pipeline

    spans = duration_pipeline(spark, "/root/testdata/sf0.001")
    return (
        spans.groupBy("event_type")
        .agg(
            F.count("*").alias("n_spans"),
            F.round(F.avg("duration_ms"), 2).alias("avg_duration_ms"),
            F.max("duration_ms").alias("max_duration_ms"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
