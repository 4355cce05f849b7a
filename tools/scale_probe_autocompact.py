"""Round-9 probe: commit wall + metadata growth with the commit-time
auto-compaction policy ON vs OFF (verdict item 2's SCALE.md row).

Drives N tiny appends into a fresh snapshot-store table under each
policy setting and records: total append wall, the largest manifest-
list entry count ever observed, the final commit's manifest-list
bytes, and the wall to resolve + count the latest snapshot at the end
(the read-side cost the bounded list buys).

Usage: python tools/scale_probe_autocompact.py [--appends 150]
Prints the markdown rows for SCALE.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--appends", type=int, default=150)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import parquet_to_csv_spark.sources.layout as L
    from parquet_to_csv_spark.session import get_spark

    spark = get_spark("autocompact-probe", shuffle_partitions=4)
    root = tempfile.mkdtemp(prefix="autocompact_probe_")

    seq = iter(range(100))

    def run(policy: str) -> dict:
        t = os.path.join(root, f"tbl_{policy}_{next(seq)}")
        spark.conf.set("spark.graft.manifest.maxEntries", policy)
        max_entries = 0
        t0 = time.perf_counter()
        for i in range(args.appends):
            v = L.commit_version(
                spark, t,
                spark.range(2 * i, 2 * i + 2).select(F.col("id").alias("k"))
                .coalesce(1),
            )
            man = L._load_manifest(t, v)
            max_entries = max(max_entries, len(L._man_data_segments(t, man)))
        wall = time.perf_counter() - t0
        latest = L.latest_version(t)
        man_bytes = os.path.getsize(L._manifest_path(t, latest))
        r0 = time.perf_counter()
        n = L.read_version(spark, t).count()
        resolve = time.perf_counter() - r0
        assert n == 2 * args.appends
        spark.conf.unset("spark.graft.manifest.maxEntries")
        return {
            "policy": policy,
            "wall_s": round(wall, 2),
            "s_per_append": round(wall / args.appends, 4),
            "max_list_entries": max_entries,
            "final_manifest_bytes": man_bytes,
            "latest_read_s": round(resolve, 3),
        }

    run("16")  # warmup pass: JVM/codegen/commit-path startup
    rows = [run("0"), run("16"), run("100")]
    print(
        f"| policy (maxEntries) | {args.appends} appends wall (s) | s/append "
        "| max list entries | final manifest bytes | latest read (s) |"
    )
    print("| --- | --- | --- | --- | --- | --- |")
    for r in rows:
        label = {"0": "off", "16": "16", "100": "100 (default)"}[r["policy"]]
        print(
            f"| {label} | {r['wall_s']} | {r['s_per_append']} "
            f"| {r['max_list_entries']} | {r['final_manifest_bytes']} "
            f"| {r['latest_read_s']} |"
        )


if __name__ == "__main__":
    main()
