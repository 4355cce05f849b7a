"""Round-9 executor-retry idempotence probe (verdict item 7).

Runs in its OWN process because task retries in local mode require the
``local[N,F]`` master form (maxFailures is fixed at session start; the
shared test session is plain ``local[N]`` = fail-fast).

Injects ONE deterministic first-attempt task failure (mapInPandas
raising on ``attemptNumber() == 0`` for partition 0) inside the data
write of a ``commit_version``, then verifies Spark's task-commit
protocol composed with the snapshot store: the committed manifest
references exactly the files that survived task commit (no partial
output from the failed attempt), and row counts are exact.

Usage: ``python retry_probe_worker.py <table_dir> <marker_path>``
Prints one JSON line for the parent test.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main() -> None:
    table_dir, marker = sys.argv[1], sys.argv[2]
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "2g")

    from pyspark import TaskContext
    from pyspark.sql import functions as F

    import parquet_to_csv_spark.sources.layout as L
    from parquet_to_csv_spark.session import get_spark

    # local[4,3]: 4 threads, spark.task.maxFailures=3 — the retry path
    spark = get_spark("retry-probe", master="local[4,3]", shuffle_partitions=4)

    def fail_first_attempt(batches):
        tc = TaskContext.get()
        if tc.partitionId() == 0 and tc.attemptNumber() == 0:
            # record that the injection actually fired before dying
            open(marker, "a").write(f"attempt0-pid{os.getpid()}\n")
            raise RuntimeError("injected first-attempt task failure")
        yield from batches

    df = (
        spark.range(0, 1000)
        .repartition(4)
        .select(F.col("id").alias("k"))
        .mapInPandas(fail_first_attempt, "k long")
    )
    v = L.commit_version(spark, table_dir, df)

    man = L._load_manifest(table_dir, v)
    referenced = sorted(L._man_files(table_dir, man))
    on_disk = sorted(
        glob.glob(os.path.join(table_dir, "data", "*", "*.parquet"))
    )
    got = L.read_version(spark, table_dir, v)
    rows = got.count()
    ksum = got.agg(F.sum("k").alias("s")).collect()[0]["s"]
    # per-file footer row counts embedded at commit must sum exactly too
    seg_rows = sum(
        L._seg_load(e).get("n_rows", {}).get(f, 0)
        for e in L._man_data_segments(table_dir, man)
        for f in L._seg_load(e)["files"]
    )
    leftovers = glob.glob(
        os.path.join(table_dir, "data", "*", "_temporary*")
    ) + glob.glob(os.path.join(table_dir, "data", "*", "*.parquet.*"))
    print(json.dumps({
        "version": v,
        "rows": rows,
        "ksum": ksum,
        "seg_rows": seg_rows,
        "referenced_equals_disk": referenced == on_disk,
        "n_files": len(referenced),
        "leftovers": leftovers,
        "injection_fired": os.path.exists(marker),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
