"""Physical table layout — the write-side half of 100 TB performance.

Two layout tools the query side exploits:

- **Bucketing** (`write_bucketed`): hash-bucket + sort a table by its
  join/agg key at write time. Two tables bucketed on the same key with
  the same bucket count join with NO exchange on either side — the
  shuffle is paid once at ingest, then every subsequent join/groupBy
  on that key is co-located. At 100 TB, fact⋈fact joins (lineitem ⋈
  orders on orderkey) are exactly the joins you cannot afford to
  re-shuffle per query; bucketing amortizes them. Asserted
  exchange-free in tests/test_layout.py.
- **Date partitioning** (`write_partitioned`): directory-partition by
  a derived date column. Predicates on the partition column prune at
  the *file listing* level (`PartitionFilters` in the scan node) —
  a day query over a year of data lists 1/365th of the files before a
  single byte is read.

Both are standard Spark writers — the value is the documented pairing
with the read-side plans that exploit them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table. The sort makes
    the downstream join a zero-sort SortMergeJoin per bucket."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an in-memory catalog forgets tables across sessions but leaves the
    # warehouse directory behind — clear a stale location defensively
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    local = wh.removeprefix("file:")
    import os
    import shutil

    stale = os.path.join(local, table.split(".")[-1])
    if os.path.isdir(stale):
        shutil.rmtree(stale)
    (
        df.write.bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Persist ``df`` directory-partitioned by ``partition_cols``."""
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def colocated_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with no
    Exchange on either side (the point of the layout).

    The MERGE hint pins the sort-merge strategy: on toy data the
    planner would rather broadcast (which ignores bucketing); at scale
    SMJ-over-buckets is the plan this layout exists for, and the hint
    makes the shape deterministic so tests can assert it."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), key)
