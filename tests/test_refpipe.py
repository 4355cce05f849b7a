"""REF-surface tests: duration semantics, filters, dedup, schema union.

Encodes the reference-fidelity cases of SURVEY.md §5: floor-before-
subtract on ns timestamps, inclusive 2000/2650 thresholds
(``/root/reference/main.js:48-49,164,247``), value-based distinct,
two-schema union null-fill.
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from parquet_to_csv_spark.functions.trace import duration_ms_col, trace_spans
from parquet_to_csv_spark.operators import refpipe
from parquet_to_csv_spark.pipeline import ConvertConfig, transform


def test_duration_floor_before_subtract(spark):
    # 999_999_999 ns → 999 ms; end 2_000_500_000 ns → 2000 ms; naive
    # (end-start)/1e6 would give 1000.5→1000/1001, floor-first gives 1001.
    df = spark.createDataFrame(
        [Row(start_time=999_999_999, end_time=2_000_500_000)]
    )
    got = df.select(duration_ms_col().alias("d")).collect()[0]["d"]
    assert got == 2000 - 999


def test_min_threshold_inclusive(spark):
    # main.js:164: `if (minDurationMs > durationMs) continue` — 2000 kept.
    df = spark.createDataFrame(
        [
            Row(start_time=0, end_time=1_999_999_999),  # 1999 ms → dropped
            Row(start_time=0, end_time=2_000_000_000),  # 2000 ms → kept
        ]
    )
    out = transform(df, ConvertConfig(write_csv=True))
    assert [r["duration_ms"] for r in out.collect()] == [2000]


def test_long_threshold_inclusive(spark, sf_dir):
    longs = refpipe.long_split(spark, sf_dir)
    mins = [r[0] for r in longs.agg(F.min("duration_ms")).collect()]
    assert mins[0] is None or mins[0] >= 2650


def test_trace_spans_columns_duration_first(spark, sf_dir):
    from parquet_to_csv_spark.sources.tables import load_table

    spans = trace_spans(load_table(spark, sf_dir, "events"))
    assert spans.columns[0] == "duration_ms"  # P4 column reorder
    assert {"start_time", "end_time"} <= set(spans.columns)


def test_distinct_drops_value_duplicates(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=1, b="x"), Row(a=2, b="y")]
    )
    assert df.dropDuplicates().count() == 2


def test_schema_union_null_fill(spark, sf_dir):
    out = refpipe.schema_union(spark, sf_dir)
    assert set(out.columns) == {"event_id", "user_id", "event_type", "value"}
    n = out.count()
    # each side contributes all events; nulls fill the missing column
    assert out.filter(F.col("value").isNull()).count() == n / 2
    assert out.filter(F.col("user_id").isNull()).count() == n / 2


def test_cast_projection_types(spark, sf_dir):
    out = refpipe.cast_projection(spark, sf_dir)
    dt = dict(out.dtypes)
    assert dt["duration_ms"] == "bigint"
    assert dt["start_time"] == "bigint"
    assert dt["event_id"] == "string"


def test_row_uid_unique(spark, sf_dir):
    df = refpipe.with_row_uid(refpipe.duration_pipeline(spark, sf_dir))
    n = df.count()
    assert df.select("UID").distinct().count() == n
