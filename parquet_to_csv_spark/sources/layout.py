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


def compact_small_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 512,
) -> int:
    """Small-files compaction — the maintenance pass every long-lived
    100 TB table needs (streaming ingests and over-parallel writers
    leave thousands of KB-sized files; each costs a task + an open +
    footer parse per query, and at 1000 executors the scheduler, not
    the I/O, becomes the bottleneck).

    Sizing is metadata-only: the input's total byte size comes from the
    file listing (no data scan), target file count = ceil(bytes /
    target), and ONE ``coalesce`` (NOT ``repartition`` — no shuffle,
    tasks just read several input files each) rewrites the data.
    Returns the output file count.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(in_path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_out = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    df.coalesce(n_out).write.mode("overwrite").parquet(out_path)
    return sum(
        1 for f in os.listdir(out_path) if f.endswith(".parquet")
    )


def minmax_manifest(spark: SparkSession, path: str, *cols: str) -> DataFrame:
    """Per-file min/max/count manifest over ``cols`` — the data-skipping
    index (Delta/Iceberg file statistics, hand-rolled on stock Spark).

    One scan groups by ``input_file_name()`` with partial aggregation —
    the manifest is tiny (one row per file) and, persisted next to the
    table, lets a planner (or :func:`skipped_read`) prune files whose
    [min, max] range excludes a predicate BEFORE listing-level I/O —
    the 100 TB point lookup goes from "open every footer" to "read the
    manifest, open the 2 files that can match".
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return (
        df.select(F.input_file_name().alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def skipped_read(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Read only the files whose [min, max] for ``col`` intersects
    [lo, hi], per ``manifest`` — file-level skipping on top of the
    row-group pushdown Spark already does. The manifest is tiny, so
    the file list is a driver-side collect of a few hundred strings
    (NOT a data scan); correctness does not depend on the manifest
    being fresh as long as it covers every live file.
    """
    from pyspark.sql import functions as F

    keep = [
        r["file"].removeprefix("file://")
        for r in manifest.filter(
            (F.col(f"max_{col}") >= lo) & (F.col(f"min_{col}") <= hi)
        ).collect()
    ]
    if not keep:
        return spark.read.parquet(path).filter(F.lit(False))
    return (
        spark.read.parquet(*keep)
        .filter((F.col(col) >= lo) & (F.col(col) <= hi))
    )


def write_sorted_export(
    df: DataFrame, path: str, n_files: int, *sort_cols: str
) -> None:
    """Globally-sorted sharded export: `repartitionByRange` gives
    disjoint, ORDERED key ranges per output file and
    `sortWithinPartitions` orders rows inside each — together a total
    order across the shard sequence WITHOUT a single-node sort. This is
    the layout that makes downstream merges/binary-search reads/range
    splits trivial, and the range exchange is the same one shuffle any
    global sort pays."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def morton_key(x, y, bits: int = 12):
    """Z-order (Morton) interleave of two non-negative int columns —
    the multi-dimensional clustering key (Delta OPTIMIZE ZORDER's core)
    on stock Spark: sorting by the interleaved key bounds BOTH
    dimensions within any contiguous key range, so per-file min/max
    stats prune on either predicate column, where a single-column sort
    clusters one dimension and shatters the other.

    Pure integer shifts/masks (identical in any engine): bit i of x →
    key bit 2i, bit i of y → key bit 2i+1.

    Scale both dims to comparable bit widths first (e.g. multiply the
    narrower one up): with unequal widths the key's top bits all come
    from the wider dim and sorting degenerates to a single-column
    cluster — the standard z-order normalization requirement.
    """
    from pyspark.sql import functions as F

    k = F.lit(0).cast("long")
    for i in range(bits):
        k = (
            k
            + ((x.bitwiseAND(F.lit(1 << i))).cast("long") * F.lit(1 << i))
            + ((y.bitwiseAND(F.lit(1 << i))).cast("long") * F.lit(1 << (i + 1)))
        )
    return k


def parquet_footer_stats(spark: SparkSession, sf_dir: str, table: str = "lineitem"):
    """EXT E238: storage-layout introspection from the parquet FOOTER —
    per column: value count, compressed/uncompressed bytes, and the
    compression ratio. The numbers behind every layout decision the
    advisors make (which columns pay for dictionary encoding, whether
    a sort key would compress deltas, what a column-pruned scan
    actually saves) — read from metadata only, zero data pages.

    The footer read is a catalog-sized driver call (KBs per file) BY
    DESIGN — at a million-file scale the same pyarrow call moves into
    ``mapInPandas`` over the file listing and this relation becomes
    its aggregation; the output contract is unchanged. DuckDB's
    ``parquet_metadata()`` reads the identical footer, making this
    fully gate-checkable.
    """
    import os

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F  # noqa: F401

    md = pq.ParquetFile(os.path.join(sf_dir, f"{table}.parquet")).metadata
    acc: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            n, comp, unc = acc.get(name, (0, 0, 0))
            acc[name] = (
                n + c.num_values,
                comp + c.total_compressed_size,
                unc + c.total_uncompressed_size,
            )
    rows = [
        (name, n, comp, unc, comp * 1_000_000 // unc)
        for name, (n, comp, unc) in sorted(acc.items())
    ]
    return spark.createDataFrame(
        rows,
        "column_name string, n_values long, compressed_bytes long, "
        "uncompressed_bytes long, compression_ppm long",
    )


def sort_key_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E241: sort-key advisor — for each candidate clustering
    column of ``lineitem``: exact distinct count, key density, and the
    expected RUN LENGTH a sort on that key would produce (rows div
    distinct values) — the first-order predictor of RLE/dictionary
    compression benefit and min-max-pruning selectivity. Read next to
    parquet_footer_stats (E238): a long expected run on a wide column
    is where re-sorting pays.

    One scan; the multi-column exact distinct is Spark's Expand-based
    multi-count-distinct (one shuffle carrying an expand factor of
    |candidates| — at 100 TB swap exact distinct for HLL sketches at
    the same call sites, E?-style). Output unpivots via ``stack``.
    """
    from pyspark.sql import functions as F

    from parquet_to_csv_spark.sources.tables import load_table

    cands = {
        "ship_day": "CAST(unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000 AS BIGINT)",
        "l_partkey": "l_partkey",
        "l_suppkey": "l_suppkey",
        "l_orderkey": "l_orderkey",
        "l_returnflag": "l_returnflag",
        "l_linestatus": "l_linestatus",
    }
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        *[f"{expr} AS {name}" for name, expr in cands.items()]
    )
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.countDistinct(name).alias(f"d_{name}") for name in cands
    ]
    s = li.agg(*aggs)
    rows = ", ".join(
        f"'{name}', d_{name}, n div d_{name}, d_{name} * 1000000 div n"
        for name in cands
    )
    return s.selectExpr(
        f"stack({len(cands)}, {rows})"
        " AS (column_name, n_distinct, expected_run_len, density_ppm)"
    )
