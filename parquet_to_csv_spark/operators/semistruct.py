"""Semi-structured (JSON) column handling — EXT north-star.

The ``events.props`` fixture column is a JSON string (``{"k": 69}``),
the classic "properties bag" of event pipelines. The scalable pattern:
extract the needed paths with JVM-side JSON expressions
(``get_json_object`` / ``from_json``) *before* any aggregation, so the
string parse happens exactly once per row inside whole-stage codegen
and only the extracted (pruned) columns cross the exchange. Never ship
the raw JSON through a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from parquet_to_csv_spark.functions.stable import stable_avg_2dp
from parquet_to_csv_spark.sources.tables import load_table


def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract ``$.k`` from the JSON props bag, aggregate per type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            stable_avg_2dp(F.sum("k"), F.count("k")).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
