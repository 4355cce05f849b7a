"""Empirical scale probe for the round-7 lakehouse write path.

The dedup (round 6) and ANN (round 7) tiers have measured growth
ladders; this probe does the same for the snapshot store: synthesize
`events` tables at 1×/2×/5×/10× sf0.1 (ts shifted, ids offset per
copy), then measure per factor:

- initial `commit_version` (bulk load) wall,
- `merge_into` wall at a FIXED 1 % change fraction (expected: one
  O(N) key-probe scan + O(|changes|) writes ⇒ ~linear in N at fixed
  fraction — the honest bound; copy-on-write would also REWRITE O(N)),
- `commit_deletes` (predicate delete vector) wall,
- `snapshot_cdc_feed` v0→v2 count wall,
- whole-table `optimize_table` wall (O(N) rewrite by design) and the
  `optimize_batches` single-batch wall (bounded, ~flat — the 100 TB
  loop's claim),
- stats-pruned band read before/after a CLUSTERED optimize (files
  opened / total).

Usage: python tools/scale_probe_lakehouse.py [--factors 1,2,5,10]
Markdown table to stdout for SCALE.md.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def build_events(spark, sf_dir: str, factor: int):
    from parquet_to_csv_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n = ev.agg(F.max("event_id")).collect()[0][0] + 1
    parts = [ev]
    for c in range(1, factor):
        parts.append(
            ev.select(
                (F.col("event_id") + c * n).alias("event_id"),
                (F.col("ts") + F.lit(c * 3_600_000_000_000)).alias("ts"),
                "user_id", "event_type", "value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, n


def timed(fn):
    t0 = time.perf_counter()
    r = fn()
    return round(time.perf_counter() - t0, 2), r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,2,5,10")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]

    from parquet_to_csv_spark.session import get_spark
    from parquet_to_csv_spark.sources import layout

    spark = get_spark("scale_probe_lakehouse")
    work = tempfile.mkdtemp(prefix="lakescale_")
    print(f"work dir: {work}", file=sys.stderr)

    rows = []
    for f in factors:
        t = os.path.join(work, f"tbl{f}")
        ev, n0 = build_events(spark, args.sf_dir, f)
        n = ev.count()
        rec = {"factor": f, "rows": n}
        rec["load_s"], _ = timed(
            lambda: layout.commit_version(spark, t, ev.repartition(4 * f))
        )
        changes = ev.filter(F.col("event_id") % 100 == 0).withColumn(
            "value", F.col("value") + F.lit(10.0)
        )
        rec["merge_1pct_s"], _ = timed(
            lambda: layout.merge_into(spark, t, changes, "event_id")
        )
        rec["delete_s"], _ = timed(
            lambda: layout.commit_deletes(spark, t, "event_type = 'error'")
        )
        rec["cdc_s"], rec["cdc_rows"] = timed(
            lambda: layout.snapshot_cdc_feed(spark, t, 0, 2).count()
        )
        rec["opt_batch_s"], _ = timed(
            lambda: layout.optimize_batches(
                spark, t, target_rows=n0 // 2, max_batches=1
            )
        )
        rec["opt_full_s"], _ = timed(
            lambda: layout.optimize_table(
                spark, t, target_file_bytes=1 << 21, order_col="value"
            )
        )
        dfp, opened, total = layout.pruned_snapshot_read(
            spark, t, "value", 2.0, 2.5
        )
        t0 = time.perf_counter()
        rec["pruned_rows"] = dfp.count()
        rec["pruned_read_s"] = round(time.perf_counter() - t0, 2)
        rec["files_opened"] = opened
        rec["files_total"] = total
        rows.append(rec)
        print("ROW", rec, flush=True)
        spark.catalog.clearCache()

    cols = [
        "factor", "rows", "load_s", "merge_1pct_s", "delete_s", "cdc_s",
        "cdc_rows", "opt_batch_s", "opt_full_s", "pruned_read_s",
        "files_opened", "files_total",
    ]
    print("\n| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |")

    def slope(r1, r2, key):
        if not r1[key] or not r2[key]:
            return float("nan")
        return math.log(r2[key] / r1[key]) / math.log(r2["rows"] / r1["rows"])

    print("\ngrowth exponents (log-log slope vs rows):")
    for r1, r2 in zip(rows, rows[1:]):
        print(
            f"  {r1['factor']}→{r2['factor']}: "
            + ", ".join(
                f"{k} {slope(r1, r2, k):.2f}"
                for k in (
                    "load_s", "merge_1pct_s", "delete_s", "cdc_s",
                    "opt_batch_s", "opt_full_s", "pruned_read_s",
                )
            )
        )


if __name__ == "__main__":
    main()
