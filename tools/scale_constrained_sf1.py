"""Round-10 verdict item 1: constrained-memory proof for the headline
tier at sf1.

Every prior measurement ran under an 8 GiB driver heap on a 128 GiB
box where all execution state fits comfortably — so "would survive
100x" rested on plan arguments plus α-exponents, neither of which can
show what happens when state EXCEEDS memory. This runs the full
22-entry headline tier (20 queries + the 2 priced artifact builds) at
the sf1 rung under a DELIBERATELY small JVM heap (default 5 GiB,
verdict's 4–6 GiB band; the reference needs a 64 GB Node heap for its
row array — package.json:12), with ``spark.sql.shuffle.partitions``
held at 32, and records per query from the Spark status REST API:

  wall        best-of-N wall seconds under the small heap
  spill_mem   sum of memoryBytesSpilled over the best run's stages
  spill_disk  sum of diskBytesSpilled over the best run's stages
  peak_exec   max per-stage peakExecutionMemory over the best run

The UI is enabled for this probe only (the REST status API is the
public surface for executor metrics; ``session.get_spark`` keeps it
off for production). A query that OOMs or errors fails the probe —
that is the point: graceful spill, not silent collapse.

Usage:
  python tools/scale_constrained_sf1.py [--sf1 DIR] [--heap 5g] [--runs 2]

Prints the SCALE.md markdown table on stdout + one JSON line; run
separately for the oracle half of the gate:
  SPARK_DRIVER_MEMORY=5g python tools/check.py /tmp/spark_graft_sfdata/sf1 <queries...>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# same 22 rows as tools/scale_ladder_sf1.py (the round-9 rung), so the
# two tables in SCALE.md are row-for-row comparable
HEADLINE = [
    "ref_duration_pipeline",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "dup_clusters",
    "cosine_topk",
    "ivf_topk",
    "session_windows",
    "tumbling_window_stats",
    "text_stats",
    "token_freq",
    "quality_score",
    "bm25_topk",
    "bitemporal_asof_report",
    "unigram_lm_score",
    "perplexity_pruning_report",
]


def _fmt_bytes(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024:
            return f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} TiB"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/tmp/spark_graft_sfdata/sf1")
    ap.add_argument("--heap", default="5g")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of the headline tier (e.g. the "
        "non-pair queries when probing sf10, where the pair relation "
        "is output-quadratic in replicated dup structure)",
    )
    args = ap.parse_args()
    headline = (
        [q for q in args.queries.split(",") if q]
        if args.queries
        else HEADLINE
    )

    from parquet_to_csv_spark.operators.corpus import _unigram_lm_base
    from parquet_to_csv_spark.operators.dedup import _token_base
    from parquet_to_csv_spark.plans.registry import QUERIES
    from parquet_to_csv_spark.session import get_spark

    spark = get_spark(
        "constrained-sf1",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": args.heap,
            "spark.ui.enabled": "true",
            # keep retained jobs/stages comfortably above the tier size
            "spark.ui.retainedJobs": "4000",
            "spark.ui.retainedStages": "4000",
        },
    )
    sc = spark.sparkContext
    jvm_max = sc._jvm.java.lang.Runtime.getRuntime().maxMemory()
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    def rest(path: str):
        with urllib.request.urlopen(f"{base}{path}", timeout=30) as r:
            return json.loads(r.read())

    def job_ids() -> set[int]:
        return {j["jobId"] for j in rest("/jobs")}

    def run_metrics(pre_jobs: set[int]) -> dict[str, int]:
        stage_ids: set[int] = set()
        for j in rest("/jobs"):
            if j["jobId"] not in pre_jobs:
                stage_ids.update(j.get("stageIds", []))
        mem = disk = peak = 0
        for sid in stage_ids:
            try:
                attempts = rest(f"/stages/{sid}")
            except Exception:  # stage evicted/skipped — count as zero
                continue
            for a in attempts:
                mem += int(a.get("memoryBytesSpilled", 0))
                disk += int(a.get("diskBytesSpilled", 0))
                peak = max(peak, int(a.get("peakExecutionMemory", 0)))
        return {"spill_mem": mem, "spill_disk": disk, "peak_exec": peak}

    def fresh_artifact_root(tag: str) -> None:
        # cleared memos + fresh root: builds are true cold builds in a
        # warm session (the scale_ladder_sf1 discipline)
        import parquet_to_csv_spark.operators.corpus as _c
        import parquet_to_csv_spark.operators.dedup as _d

        _d._TOKEN_BASE_CACHE.clear()
        _d._EDGE_CACHE.clear()
        _c._UNIGRAM_LM_CACHE.clear()
        spark.conf.set(
            "spark.graft.artifactDir",
            tempfile.mkdtemp(prefix=f"constrained_{tag}_"),
        )

    print(
        f"heap requested {args.heap}; JVM Runtime.maxMemory = "
        f"{_fmt_bytes(jvm_max)}",
        file=sys.stderr,
    )

    # untimed warmup at sf0.01 (tiny): pay JVM/codegen/Python-worker
    # startup without touching the measured rung
    fresh_artifact_root("warm")
    warm_dir = "/root/testdata/sf0.01"
    _token_base(spark, warm_dir).count()
    _unigram_lm_base(spark, warm_dir).count()
    for name in headline:
        QUERIES[name](spark, warm_dir).collect()
    print("  warmup done", file=sys.stderr)

    fresh_artifact_root("sf1")
    results: dict[str, dict] = {}
    failures: list[str] = []

    def timed(name: str, thunk) -> None:
        best = None
        for _ in range(args.runs):
            spark.catalog.clearCache()
            pre = job_ids()
            sc.setJobGroup(name, name)
            t0 = time.perf_counter()
            try:
                thunk()
            except Exception as e:  # noqa: BLE001 — an OOM IS the finding
                failures.append(f"{name}: {type(e).__name__}: {e}")
                print(f"  FAIL {name}: {type(e).__name__}", file=sys.stderr)
                return
            finally:
                sc.setJobGroup("", "")
            wall = time.perf_counter() - t0
            m = run_metrics(pre)
            if best is None or wall < best["wall"]:
                best = {"wall": round(wall, 3), **m}
        results[name] = best
        print(
            f"  sf1/{args.heap} {name}: {best['wall']}s  "
            f"spill_disk={_fmt_bytes(best['spill_disk'])}  "
            f"peak_exec={_fmt_bytes(best['peak_exec'])}",
            file=sys.stderr,
        )

    # builds are single-shot (a second run would be a memo no-op)
    for build_name, builder in (
        ("tokbase_build", _token_base),
        ("uniglm_build", _unigram_lm_base),
    ):
        pre = job_ids()
        sc.setJobGroup(build_name, build_name)
        t0 = time.perf_counter()
        try:
            builder(spark, args.sf1).count()
            results[build_name] = {
                "wall": round(time.perf_counter() - t0, 3),
                **run_metrics(pre),
            }
        except Exception as e:  # noqa: BLE001
            failures.append(f"{build_name}: {type(e).__name__}: {e}")
        finally:
            sc.setJobGroup("", "")
        if build_name in results:
            b = results[build_name]
            print(
                f"  sf1/{args.heap} {build_name}: {b['wall']}s  "
                f"spill_disk={_fmt_bytes(b['spill_disk'])}",
                file=sys.stderr,
            )

    for name in headline:
        timed(name, lambda n=name: QUERIES[n](spark, args.sf1).collect())

    print(
        "| query | wall (s) | mem spilled | disk spilled | peak exec mem |"
    )
    print("| --- | --- | --- | --- | --- |")
    for name, r in results.items():
        print(
            f"| {name} | {r['wall']:.3f} | {_fmt_bytes(r['spill_mem'])} "
            f"| {_fmt_bytes(r['spill_disk'])} | {_fmt_bytes(r['peak_exec'])} |"
        )
    summary = {
        "heap": args.heap,
        "jvm_max_bytes": jvm_max,
        "shuffle_partitions": 32,
        "sf1": args.sf1,
        "n_entries": len(results),
        "n_failures": len(failures),
        "failures": failures,
        "total_wall": round(sum(r["wall"] for r in results.values()), 2),
        "total_disk_spilled": sum(r["spill_disk"] for r in results.values()),
        "queries": results,
    }
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
