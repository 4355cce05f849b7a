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

# --- whole-stage-codegen fallback sniffer (round-5 verdict item 4) ---
# Spark falls back to interpreted execution when Janino rejects the
# generated Java; the answer stays right, the plan silently loses
# WholeStageCodegen, and nothing in the bench/correctness gates used to
# notice (markov_attribution shipped weak this way).  get_spark routes
# the `org.apache.spark.sql.catalyst.expressions.codegen` logger to a
# per-process file at JVM launch; bench.py / tools/check.py read the
# file between queries and attribute every "Failed to compile" to the
# query that triggered it.

_LOG4J2_TEMPLATE = """\
rootLogger.level = warn
rootLogger.appenderRef.stdout.ref = console

appender.console.type = Console
appender.console.name = console
appender.console.target = SYSTEM_ERR
appender.console.layout.type = PatternLayout
appender.console.layout.pattern = %d{{yy/MM/dd HH:mm:ss}} %p %c{{1}}: %m%n

appender.codegen.type = File
appender.codegen.name = codegen
appender.codegen.fileName = {log_path}
appender.codegen.layout.type = PatternLayout
appender.codegen.layout.pattern = %p %c{{1}}: %m%n
appender.codegen.filter.threshold.type = ThresholdFilter
appender.codegen.filter.threshold.level = error

logger.codegen.name = org.apache.spark.sql.catalyst.expressions.codegen
logger.codegen.level = warn
logger.codegen.additivity = true
logger.codegen.appenderRef.codegen.ref = codegen
"""


def codegen_log_path() -> str:
    """Per-process file the JVM's codegen ERROR stream is routed to."""
    return f"/tmp/spark_graft_codegen_{os.getpid()}.log"


def _codegen_log_jvm_opt() -> str:
    """Write the log4j2 config and return the -D option enabling it."""
    props_path = f"/tmp/spark_graft_log4j2_{os.getpid()}.properties"
    with open(props_path, "w") as f:
        f.write(_LOG4J2_TEMPLATE.format(log_path=codegen_log_path()))
    return f"-Dlog4j2.configurationFile=file:{props_path}"


def read_codegen_failures(offset: int = 0) -> tuple[int, int]:
    """Count new 'Failed to compile' errors past ``offset``.

    Returns ``(new_offset, n_new_failures)``.  The file only exists once
    the JVM has logged at least one codegen-level event; absence means
    zero failures.
    """
    path = codegen_log_path()
    try:
        with open(path, "rb") as f:
            f.seek(offset)
            chunk = f.read()
    except FileNotFoundError:
        return offset, 0
    n = chunk.count(b"Failed to compile")
    return offset + len(chunk), n


def get_spark(
    app_name: str = "parquet_to_csv_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for local runs;
    on a real cluster, leave it unset and let spark-submit provide it.

    ``extra_conf`` (round 10) is applied LAST, overriding any default —
    the hook the measurement harnesses use to e.g. re-enable the UI for
    the status REST API or shrink the heap for constrained-memory
    probes, without forking this factory's defaults. Launch-time
    options (heap size, UI) only take effect for the process's FIRST
    session.
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
        # route codegen ERRORs to a per-process file so the bench /
        # check harnesses can fail on silent interpreted fallbacks;
        # only effective at JVM launch (first session in the process)
        .config("spark.driver.extraJavaOptions", _codegen_log_jvm_opt())
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    # Only force master when not already launched under a cluster manager.
    if "SPARK_MASTER" not in os.environ and not os.environ.get("SPARK_SUBMIT"):
        builder = builder.master(master)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
