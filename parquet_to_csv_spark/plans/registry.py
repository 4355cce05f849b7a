"""Query registry: every operator of SURVEY.md §2 as a named plan.

``QUERIES[name](spark, sf_dir) -> DataFrame`` — the Spark plan.
``ORACLES[name]`` — equivalent ANSI SQL for the DuckDB oracle (driver
contract, ``__spark_entry__.py``). Keys without an oracle get the
weaker rows-only check (reserved for genuinely non-SQL-expressible
ops: LSH/minhash/simhash variants with engine-private hashes).

Cross-engine parity rules used throughout (so order-insensitive
value-hashes match):
- every computed column aliased identically on both sides;
- ns-epoch arithmetic via integer ``div`` (``//`` in DuckDB), never
  double division;
- timestamps surfaced as epoch µs/ms longs (DuckDB truncates parquet
  ns→µs; Spark reads ns as long — µs alignment makes them agree);
- double aggregates rounded (sum/avg to 2/4 dp) — partial-aggregation
  order differs between engines, rounding absorbs the float jitter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_to_csv_spark.operators import refpipe

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# --------------------------------------------------------------------------
# REF surface (SURVEY.md §2.1-2.3) — the reference's own dataflow
# --------------------------------------------------------------------------

# Shared oracle CTE: the trace-span derivation (FIXTURES.md):
# start_time = µs-aligned ns epoch of events.ts, end_time = start +
# floor(value ms * 1e6) ns.  duration_ms = floor-each-then-subtract
# (/root/reference/main.js:158-162) via exact integer division.
_TRACE_CTE = """
WITH trace AS (
  SELECT
    epoch_us(ts) * 1000 AS start_time,
    epoch_us(ts) * 1000 + CAST(floor(value * 10000000) AS BIGINT) AS end_time,
    event_id, user_id, event_type, value
  FROM events
), spans AS (
  SELECT
    (end_time // 1000000) - (start_time // 1000000) AS duration_ms,
    event_id, user_id, event_type, value, start_time, end_time
  FROM trace
)
"""

QUERIES["ref_duration_pipeline"] = refpipe.duration_pipeline
ORACLES["ref_duration_pipeline"] = _TRACE_CTE + """
SELECT DISTINCT duration_ms, event_id, user_id, event_type, value, start_time, end_time
FROM spans
WHERE duration_ms >= 2000
"""

QUERIES["ref_long_split"] = refpipe.long_split
ORACLES["ref_long_split"] = _TRACE_CTE + """
SELECT DISTINCT duration_ms, event_id, user_id, event_type, value, start_time, end_time
FROM spans
WHERE duration_ms >= 2000 AND duration_ms >= 2650
"""

QUERIES["ref_schema_union"] = refpipe.schema_union
ORACLES["ref_schema_union"] = """
SELECT event_id, user_id, event_type, CAST(NULL AS DOUBLE) AS value FROM events
UNION ALL
SELECT event_id, CAST(NULL AS BIGINT) AS user_id, event_type, value FROM events
"""

QUERIES["ref_distinct"] = refpipe.distinct_events
ORACLES["ref_distinct"] = """
SELECT DISTINCT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
FROM events
"""

QUERIES["ref_cast_projection"] = refpipe.cast_projection
ORACLES["ref_cast_projection"] = _TRACE_CTE + """
SELECT DISTINCT duration_ms,
       CAST(event_id AS VARCHAR) AS event_id,
       CAST(user_id AS VARCHAR) AS user_id,
       event_type, value, start_time, end_time
FROM spans
WHERE duration_ms >= 2000
"""
