"""The reference's full dataflow surface, Spark-first (SURVEY.md §2.1-2.3).

Covers: P1 derived duration, P2/P3 duration filters, P4 column
reordering, D1 value-distinct, S3/P5 schema-union + null-fill, P6 UUID
row ids, P7 sink-time cast projection. Each builder takes
``(spark, sf_dir)`` and returns a DataFrame so it can be both a
`queries()` entry and a building block of ``pipeline.convert``.

Reference citations are in the docstrings; semantics notes:
- D1 dedup is *intended but inoperative* in the reference (JS ``Set``
  compares object identity, ``main.js:77,152,177``); we implement the
  intent — value-based DISTINCT.
- Null-fill (``src/notFoundKeys.js:3-20``) sees a growing schema in the
  reference; we apply the final unified schema uniformly (stronger,
  clearly-intended semantics — SURVEY.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from parquet_to_csv_spark.functions.trace import (
    MAX_DURATION_MS,
    MIN_DURATION_MS,
    NUMBER_KEYS,
    trace_spans,
)
from parquet_to_csv_spark.sources.tables import load_table


def duration_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P4+D1: derive duration_ms, keep >= 2000 ms, distinct.

    The core transform loop of the reference (``main.js:156-179``):
    per-record duration computation, min-duration filter, dedup — here
    one declarative plan: scan → project → filter (pushed to parquet
    where possible) → hash-distinct (the only shuffle).
    """
    spans = trace_spans(load_table(spark, sf_dir, "events"))
    return spans.filter(F.col("duration_ms") >= F.lit(MIN_DURATION_MS)).dropDuplicates()


def long_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: the "long queries" subset, duration_ms >= 2650 (inclusive,
    ``main.js:247``), applied after the main pipeline like the
    reference's second CSV stream (``main.js:244-255``)."""
    return duration_pipeline(spark, sf_dir).filter(
        F.col("duration_ms") >= F.lit(MAX_DURATION_MS)
    )


def schema_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+P5: cross-file schema union with missing-column null fill.

    The reference unions every file's keys into a global registry and
    back-fills nulls (``src/notFoundKeys.js``). Emulated here by
    projecting ``events`` onto two overlapping column subsets (two
    "files" with different schemas) and ``unionByName(...,
    allowMissingColumns=True)`` — the same engine path
    ``mergeSchema`` uses for real multi-file trees.
    """
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "event_type")
    right = ev.select("event_id", "event_type", "value")
    return left.unionByName(right, allowMissingColumns=True)


def distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: whole-row value-distinct over the raw events table.

    ``ts`` is exposed as µs-since-epoch so the oracle (whose parquet
    reader truncates ns→µs) agrees bit-for-bit.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.expr("ts div 1000").alias("ts_us"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    ).dropDuplicates()


def cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 (+P4): the reference's sink-time type discipline.

    Its SQLite DDL types the closed set ``NUMBER_KEYS`` INTEGER and
    everything else TEXT (``main.js:287-301``); values are coerced
    ``Number(v)`` / ``\\`${v}\\``` at insert (``main.js:331-341``).
    Here: cast numeric keys long, string keys string. (The reference's
    falsy→"NULL" bug, ``main.js:331-335``, is NOT reproduced — real
    SQL nulls, SURVEY.md §1.)
    """
    spans = duration_pipeline(spark, sf_dir)
    cols = []
    for name in spans.columns:
        if name in NUMBER_KEYS:
            cols.append(F.col(name).cast("long").alias(name))
        elif name in ("event_id", "user_id"):
            # int64 ids: TEXT per the reference's "everything else" rule
            cols.append(F.col(name).cast("string").alias(name))
        else:
            cols.append(F.col(name))
    return spans.select(*cols)


def with_row_uid(df: DataFrame) -> DataFrame:
    """P6: synthetic UID per output row (``main.js:342``); Spark's
    ``uuid()`` — random like the reference's uuidv4, so excluded from
    correctness hashes."""
    return df.withColumn("UID", F.expr("uuid()"))
