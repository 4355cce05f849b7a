"""Fixture-table loaders (TESTDATA.md / FIXTURES.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under a scale-factor
directory. ``events.ts`` is a nanosecond parquet timestamp; we read it
as a ns-since-epoch long (see session.py) which matches the reference's
BigInt-ns trace arithmetic (``/root/reference/main.js:158-162``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _ensure_engine_confs(spark: SparkSession) -> None:
    """Apply runtime-settable confs the engine depends on.

    The driver may hand us a session we didn't build; these are all
    dynamic SQL confs, safe to set on a live session.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


# Raw (pre-conversion) parquet schemas keyed by (path, stat salt):
# schema inference runs a one-task footer job per spark.read.parquet
# call, which a hot loop of plan builds (the registry runs load_table
# ~2-3x per query) pays hundreds of times for identical files. With
# the schema cached, later reads pass it explicitly and construct the
# plan with ZERO jobs. The stat salt (mtime_ns, size) invalidates the
# entry when a fixture is rewritten in-process.
_SCHEMA_CACHE: dict[tuple, T.StructType] = {}


def _stat_salt(path: str) -> tuple:
    st = os.stat(path)
    if os.path.isdir(path):
        parts = []
        for entry in sorted(os.listdir(path)):
            est = os.stat(os.path.join(path, entry))
            parts.append((entry, est.st_mtime_ns, est.st_size))
        return tuple(parts)
    return (st.st_mtime_ns, st.st_size)


def source_salt(sf_dir: str, name: str) -> str:
    """16-hex content salt for build-once artifact keys (materialized
    near-dup edges, persisted IVF indexes): md5 of the table path plus
    its (mtime_ns, size) stat salt. Stable across processes for
    unchanged data — unlike Python's per-process-salted ``hash()`` —
    and different the moment the fixture is rewritten, so a cached
    artifact can never silently serve stale rows."""
    import hashlib

    path = os.path.join(sf_dir, f"{name}.parquet")
    return hashlib.md5(repr((path, _stat_salt(path))).encode()).hexdigest()[:16]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_engine_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (path, _stat_salt(path))
    raw_schema = _SCHEMA_CACHE.get(key)
    if raw_schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(raw_schema).parquet(path)
    if name == "events" and not isinstance(df.schema["ts"].dataType, T.LongType):
        # Engine contract: events.ts is a ns-since-epoch long (the
        # reference's BigInt-ns trace arithmetic). Fixtures generated
        # with a µs/ns parquet TIMESTAMP arrive as timestamp_ntz on
        # Spark ≥4.1 (the nanosAsLong legacy conf is gone), so convert
        # at the loader choke point: ntz → timestamp is exact under the
        # UTC session zone, and unix_micros×1000 cannot overflow long.
        df = df.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql``."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
