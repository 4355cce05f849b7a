"""Round-8 probe: snapshot-store COMMIT metadata cost vs table size.

The round-7 verdict flagged single-level manifests (every v{N}.json
listed every live file) as the one genuine 100x-scale design gap:
commit metadata cost grew with TABLE size, not with files touched.
Round 8 restructured to a manifest list + immutable segment manifests.
This probe measures the payoff on a 10^2 / 10^3 / 10^4 live-file
ladder: for each rung, build a table with that many live files, then
append ONE small file and record

- append commit wall,
- metadata bytes actually written by the append (new manifest list +
  new segment),
- the LEGACY counterfactual (bytes of the full live-file list the old
  single-level manifest would have re-serialized — exactly what the
  pre-round-8 format wrote), and the ratio.

Usage: python tools/scale_probe_manifests.py [--rungs 100,1000,10000]
Markdown table to stdout for SCALE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def meta_bytes(t: str) -> int:
    return sum(
        os.path.getsize(p)
        for pat in ("manifests/v*.json", "segments/s-*.json")
        for p in glob.glob(os.path.join(t, pat))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="100,1000,10000")
    args = ap.parse_args()
    rungs = [int(x) for x in args.rungs.split(",")]

    from parquet_to_csv_spark.session import get_spark

    import parquet_to_csv_spark.sources.layout as L

    spark = get_spark()
    root = tempfile.mkdtemp(prefix="manifest_probe_")
    rows = []
    for n_files in rungs:
        t = os.path.join(root, f"t{n_files}")
        # bulk-load the rung in a few commits (segments accumulate the
        # way a real append-heavy table's do)
        per = max(1, n_files // 4)
        for i in range(4):
            spark.range(i * per * 10, (i + 1) * per * 10).repartition(
                per
            ).write.parquet(os.path.join(t, "data", f"bulk{i}"))
            files = sorted(
                glob.glob(os.path.join(t, "data", f"bulk{i}", "*.parquet"))
            )
            # commit via the public path but point at pre-written files
            # through a plain append of the same DataFrame is slower at
            # 10^4 files; manifest-level bulk registration is the probe's
            # concern, so register the files directly:
            entry = L._write_segment(t, files)
            prev = L.latest_version(t)
            v = 0 if prev is None else prev + 1
            man = {
                "version": v,
                "mode": "append",
                "segments": (
                    (
                        L._man_data_segments(t, L._load_manifest(t, prev))
                        if prev is not None
                        else []
                    )
                    + [entry]
                ),
                "schema": spark.range(1).schema.jsonValue(),
                "ts": time.time(),
            }
            os.makedirs(os.path.join(t, "manifests"), exist_ok=True)
            with open(L._manifest_path(t, v), "w") as f:
                json.dump(man, f)
        live = L.json_manifest_files(t, L.latest_version(t))
        assert len(live) >= n_files, (len(live), n_files)
        before = meta_bytes(t)
        t0 = time.time()
        L.commit_version(spark, t, spark.range(5).repartition(1))
        wall = time.time() - t0
        new_bytes = meta_bytes(t) - before
        legacy_bytes = len(
            json.dumps(live + ["x"])
        )  # what the old manifest re-serialized per commit
        # read-side metadata resolution: cold (fresh segment cache)
        # full-file-list expansion, and a stats-pruned plan that needs
        # only the manifest list + surviving segments
        L._SEGMENT_CACHE.clear()
        v = L.latest_version(t)
        t0 = time.time()
        L.json_manifest_files(t, v)
        read_cold = time.time() - t0
        L._SEGMENT_CACHE.clear()
        t0 = time.time()
        # a selective band over the narrow last commit — level-1 rollup
        # pruning should open few segment JSONs
        L.pruned_snapshot_read(spark, t, "id", 0, 4, version=v)
        prune_cold = time.time() - t0
        rows.append(
            (
                len(live), wall, new_bytes, legacy_bytes,
                legacy_bytes / new_bytes, read_cold, prune_cold,
            )
        )
        print(
            f"rung {n_files}: live={len(live)} wall={wall:.2f}s "
            f"new={new_bytes}B legacy={legacy_bytes}B "
            f"read={read_cold*1000:.1f}ms prune={prune_cold*1000:.1f}ms",
            file=sys.stderr,
        )

    print("| live files | 1-file append wall (s) | metadata bytes written "
          "| legacy counterfactual (B) | legacy/new | full-list resolve "
          "(ms) | pruned-plan resolve (ms) |")
    print("| --- | --- | --- | --- | --- | --- | --- |")
    for n, wall, nb, lb, ratio, rc, pc in rows:
        print(
            f"| {n} | {wall:.2f} | {nb} | {lb} | {ratio:.1f}x "
            f"| {rc*1000:.1f} | {pc*1000:.1f} |"
        )
    # growth exponent of metadata-bytes-written vs live files
    if len(rows) >= 2:
        e_new = math.log(rows[-1][2] / rows[0][2]) / math.log(
            rows[-1][0] / rows[0][0]
        )
        e_old = math.log(rows[-1][3] / rows[0][3]) / math.log(
            rows[-1][0] / rows[0][0]
        )
        print(
            f"\ncommit-metadata growth exponent vs live files: "
            f"new={e_new:.2f}, legacy={e_old:.2f} (1.0 = linear in table "
            "size; 0 = independent)"
        )


if __name__ == "__main__":
    main()
