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


def variant_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E367: Spark 4 VARIANT ingestion of the props bag.

    ``parse_json`` parses each JSON string ONCE into the binary
    VARIANT encoding (shredded, field-indexed — Spark 4's answer to
    the open-format semi-structured column); every subsequent
    ``variant_get('$.path', type)`` is an O(depth) binary probe, not a
    re-parse, so N typed path extractions cost one parse + N probes
    instead of N parses (``get_json_object``'s model in
    :func:`props_json_stats`). At 100 TB this is the difference
    between CPU-bound JSON parsing and IO-bound scanning; VARIANT
    also stays inside whole-stage codegen. The report extracts
    ``$.k`` twice at different types (int aggregate + parity class)
    from ONE variant value per row and surfaces parse health
    (``try_parse_json`` → NULL on malformed rows, poison-pill-safe).

    Oracle twin: DuckDB ``json_extract`` casts — the OUTPUT is plain
    typed columns, so the gate checks the promotion, not the binary
    encoding.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.expr("try_parse_json(props)").alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'int')").alias("k"),
        F.col("v").isNull().cast("long").alias("unparsed"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_k"),
        F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_k_even"),
        F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("sum_k"),
        F.max("k").alias("max_k"),
        F.sum("unparsed").alias("n_unparsed"),
    )


def props_map_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E436: schema-LESS JSON promotion through the MAP type — the
    third leg of the semi-structured ladder: E19 extracts KNOWN paths
    (``$.k``), E367 defers typing to VARIANT, and this operator
    handles the "keys unknown until runtime" case every event-props
    pipeline hits: ``from_json(props, 'map<string,string>')`` turns
    each document into a key→value MAP with NO schema declaration,
    ``explode`` fans the entries to rows, and per-(event_type, key)
    aggregates profile whatever keys the data actually carries.

    This is the generic ingestion shape for heterogeneous JSON at
    100 TB: one parse per row, entry fan-out ∝ actual keys (never a
    declared superset), aggregation keyed on (type, key) — high
    cardinality, parallelizes. The DuckDB oracle walks the same keys
    dynamically with json_keys/json_extract_string.
    """
    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        "event_type",
        F.explode(F.from_json("props", "map<string,string>")).alias(
            "key", "val"
        ),
    )
    return entries.groupBy("event_type", "key").agg(
        F.count(F.lit(1)).cast("long").alias("n_entries"),
        F.sum(F.col("val").cast("long")).cast("long").alias("sum_val"),
        F.count_distinct("val").cast("long").alias("n_distinct_vals"),
    )
