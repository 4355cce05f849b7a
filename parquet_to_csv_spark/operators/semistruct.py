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


def props_typed_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON promotion: parse the props bag ONCE into a typed
    struct with an EXPLICIT schema (``from_json`` — never schema
    inference, which is a full extra pass at 100 TB) and land it as
    first-class columns — the semi-structured → structured promotion
    every ingest pipeline performs before analytics touch the data.

    Vs ``get_json_object`` (per-path string extraction, one parse per
    path), ``from_json`` parses once for all fields and yields NULL on
    malformed rows, which the report surfaces as a parse-health count.
    Output: per (event_type, k-decile band) counts — the profile of
    the promoted column, plus the corpus parse-failure count on every
    row (broadcast join of a 1-row aggregate).
    """
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k INT").alias("p"),
    )
    health = F.broadcast(
        parsed.agg(
            F.sum(F.when(F.col("p").isNull() | F.col("p.k").isNull(), 1).otherwise(0)).alias(
                "n_unparsed"
            )
        )
    )
    return (
        parsed.filter(F.col("p.k").isNotNull())
        .select("event_type", F.expr("p.k div 10").alias("k_band"))
        .groupBy("event_type", "k_band")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .join(health)
    )
