"""Trace-span semantics of the reference pipeline (SURVEY.md §2.2).

The reference computes, per record (``/root/reference/main.js:158-162``)::

    durationMs = Number(BigInt(end_time)/1000000n - BigInt(start_time)/1000000n)

i.e. **truncating integer division of each ns-epoch timestamp to ms
BEFORE subtracting** — up to 1 ms different from ``(end-start)/1e6``.
Both timestamps are non-negative ns-epoch values, so BigInt truncation
== floor == Spark's ``div``. We keep the arithmetic in exact integer
space (``div``, never ``/`` which is double-valued and loses ulps at
1e18 magnitudes).

Filters (``main.js:48-49,164,247``): keep ``duration_ms >= 2000``
(minDurationMs, inclusive — ``if (minDurationMs > durationMs) continue``),
and the "long" CSV split keeps ``duration_ms >= 2650`` (inclusive).

The fixtures carry no native ``start_time``/``end_time`` columns; per
FIXTURES.md they are derived deterministically from ``events``:
``start_time = ts`` (ns-epoch long), ``end_time = start_time +
floor(value * 1e7)`` — i.e. ``value`` × 10 as milliseconds. (FIXTURES
suggested ``value`` ms directly, but the generated ``value`` tops out
~560 so the reference's 2000/2650 ms thresholds would select nothing;
the ×10 scale puts both thresholds inside the data.) We align
``start_time`` to whole microseconds first so the DuckDB oracle — whose
parquet reader truncates ns timestamps to µs — sees bit-identical
inputs; ms-level results are unaffected (ns mod 1000 never changes
``x div 1_000_000``... except within 1 µs of a boundary, which the
alignment removes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MIN_DURATION_MS = 2000  # /root/reference/main.js:49
MAX_DURATION_MS = 2650  # /root/reference/main.js:48

# The reference's closed set of numeric columns; everything else is TEXT
# in its SQLite sink (/root/reference/main.js:287-301).
NUMBER_KEYS = ["_timestamp", "duration", "duration_ms", "end_time", "start_time"]


def duration_ms_col(end_time: str = "end_time", start_time: str = "start_time") -> Column:
    """Floor-each-then-subtract ms duration, exact integer arithmetic.

    ``div`` (integer division) rather than ``floor(x / 1e6)``: ``/`` is
    double-valued in Spark SQL and a ns-epoch long (~1.7e18) exceeds
    2^53, so the float path can flip the floor at ms boundaries.
    """
    return F.expr(f"({end_time} div 1000000) - ({start_time} div 1000000)")


def trace_spans(events: DataFrame) -> DataFrame:
    """Derive the reference's trace-span relation from ``events``.

    Output columns: duration_ms first (the reference prepends it,
    ``main.js:169-172``), then the span fields.
    """
    start = (F.col("ts").cast("long") - F.col("ts").cast("long") % F.lit(1000)).alias("start_time")
    spans = events.select(
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        start,
    ).withColumn(
        "end_time",
        F.col("start_time") + F.floor(F.col("value") * F.lit(10_000_000)).cast("long"),
    )
    spans = spans.withColumn(
        "duration_ms",
        F.expr("(end_time div 1000000) - (start_time div 1000000)"),
    )
    front = ["duration_ms"]
    rest = [c for c in spans.columns if c not in front]
    return spans.select(*front, *rest)
