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


def read_jsonl_quarantined(
    spark, path: str, schema: str, quarantine_dir: str | None = None
):
    """S13: malformed-record-tolerant JSONL ingestion — the line-level
    sibling of S2's file-level corrupt tolerance: PERMISSIVE parse with
    ``_corrupt_record`` capture splits the input into (good, bad)
    DataFrames in ONE scan definition; ``quarantine_dir`` additionally
    persists the bad lines for replay/forensics (the dead-letter
    pattern) instead of silently dropping them (DROPMALFORMED) or
    failing the job (FAILFAST).

    Returns (good, bad): ``good`` carries the declared schema columns,
    ``bad`` the raw offending lines. Spark requires the corrupt-record
    query to run off a materialization boundary (the parsed relation
    may not be re-derived lazily per SPARK-38398-adjacent semantics),
    so ``bad`` reads from the cached parse — documented single-pass
    cost.
    """
    from pyspark.sql import functions as F

    full_schema = schema + ", _corrupt_record string"
    parsed = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    good = parsed.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    bad = parsed.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    if quarantine_dir:
        bad.write.mode("overwrite").text(quarantine_dir)
    return good, bad
