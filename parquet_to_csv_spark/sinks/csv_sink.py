"""CSV sinks — S4 (full) and S5 (filtered "long") of SURVEY.md §2.1.

The reference streams all surviving records to one headered CSV and the
``duration_ms >= 2650`` subset to a second one
(``/root/reference/main.js:225-256``), single-threaded. Spark-first:
``df.write.csv`` — every partition writes in parallel, output is a
directory of part files (the 100 TB-sane layout; a single .csv file is
inherently one writer). Timestamped run directories mirror the
reference's ``output/<ts>/`` naming (``main.js:42-46``) — and fix its
undefined-``writeTimestamp`` crash (``main.js:228``, SURVEY.md §3).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, functions as F

from parquet_to_csv_spark.functions.trace import MAX_DURATION_MS


def write_csv(df: DataFrame, path: str, *, single_file: bool = False) -> None:
    """Headered CSV write. ``single_file=True`` coalesces to one part
    file for small outputs (never at scale)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def write_csv_splits(
    df: DataFrame,
    out_dir: str,
    *,
    long_threshold_ms: int = MAX_DURATION_MS,
    run_timestamp: int | None = None,
) -> dict[str, str]:
    """S4+S5: full CSV plus the "long" subset in a timestamped run dir.

    Returns the two output paths. The long split re-reads nothing — both
    writes share the same upstream plan; Spark recomputes the cheap
    scan rather than materializing (SURVEY.md §4: recompute beats a
    JSON cache round-trip).
    """
    ts = run_timestamp if run_timestamp is not None else int(time.time() * 1000)
    run_dir = os.path.join(out_dir, str(ts))
    full_path = os.path.join(run_dir, f"output-{ts}.csv")
    long_path = os.path.join(run_dir, f"output-{ts}.long.csv")
    write_csv(df, full_path)
    write_csv(df.filter(F.col("duration_ms") >= F.lit(long_threshold_ms)), long_path)
    return {"full": full_path, "long": long_path}
