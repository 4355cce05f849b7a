"""Parquet tree source — the reference's S1/S2/S3 scan semantics.

Reference behavior (SURVEY.md §2.1):
- S1: recursive glob ``input/**/*.parquet`` → every file is part of one
  logical table (``/root/reference/main.js:39,106-107``).
- S2: a file that fails to decode is logged and skipped
  (``main.js:122-127``).
- S3: the table schema is the union of all per-file schemas, with
  missing columns null-filled (``/root/reference/src/notFoundKeys.js``).

Spark-first mapping: one declarative reader call. ``mergeSchema`` gives
the cross-file schema union + null fill, ``recursiveFileLookup`` gives
the glob, ``ignoreCorruptFiles`` gives per-file tolerance. At 100 TB
this is also the *fast* path: schema merge happens once on footers
(driver-side, parallelized), and each file still supports predicate
pushdown + column pruning — nothing is materialized row-wise.

The reference's two-level JSON materialization cache (S7/S8,
``main.js:80-121,140-194``) exists only because it re-decodes Parquet
row-at-a-time in JS; under Spark a pushdown-pruned columnar re-scan is
cheaper than a JSON round-trip, so the cache is subsumed by
``persist()``/``checkpoint()`` exposed here as an option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel


def read_parquet_tree(
    spark: SparkSession,
    path: str,
    *,
    merge_schema: bool = True,
    ignore_corrupt: bool = True,
    cache: bool = False,
) -> DataFrame:
    """Read a recursive directory (or glob) of Parquet files as one table.

    ``cache=True`` persists the scan at DISK_ONLY — the Spark-native
    replacement for the reference's ``.raw.cache`` JSON chunk files
    (S7). Unlike the reference's cache there is no truncated-file
    hazard (S9): Spark task outputs are committed atomically.
    """
    reader = (
        spark.read.option("recursiveFileLookup", "true")
        .option("mergeSchema", str(merge_schema).lower())
    )
    if ignore_corrupt:
        reader = reader.option("ignoreCorruptFiles", "true")
    df = reader.parquet(path)
    if cache:
        df = df.persist(StorageLevel.DISK_ONLY)
    return df
