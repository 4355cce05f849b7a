"""SparkSession factory with scale-appropriate defaults.

The reference (``/root/reference/main.js``) is a single-threaded Node
process with a 64 GB heap (``package.json:12``); its only "tuning" is a
10k-record JSON chunk cache. Here the session is configured so Catalyst
+ AQE do the equivalent work at cluster scale:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting)
  — replaces any hand-tuned partition count at 100 TB.
- ``nanosAsLong`` is set for engines that still honor it (≤4.0 read
  ns-precision parquet timestamps as raw longs under this flag; 4.1+
  ignores it and yields timestamp_ntz). The engine contract —
  ``events.ts`` is a ns-since-epoch long, matching the reference's
  BigInt-ns arithmetic (``main.js:158-162``) — is enforced at the
  loader choke point instead (``sources/tables.py load_table``):
  a timestamp-typed ``ts`` is converted once via exact integer
  ``unix_micros × 1000``, so all downstream arithmetic stays in exact
  integer space (no double rounding at 1e18 magnitudes) on every
  Spark version.
- Arrow enabled for any pandas-UDF escape hatch.
- UTC session timezone so timestamp arithmetic matches the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "parquet_to_csv_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for local runs;
    on a real cluster, leave it unset and let spark-submit provide it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_env) if cpus_env and cpus_env.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # min/max/count against parquet footer stats — metadata-only scans
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # runtime bloom filter from the filtered side of a join pushed
        # into the other side's scan — prunes fact-table IO at 100 TB
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    # Only force master when not already launched under a cluster manager.
    if "SPARK_MASTER" not in os.environ and not os.environ.get("SPARK_SUBMIT"):
        builder = builder.master(master)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
