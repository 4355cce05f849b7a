"""Round-10 verdict item 3: bench-noise adjudication as an ARTIFACT.

The box's bench passes vary up to ±15 % between same-code runs and
individual sub-second readings up to 3× under co-tenant load; rounds
8–9 burned judge + builder time hand-re-measuring every >2× reading
(17 in round 9 — all noise). This tool does that adjudication
automatically and writes it INTO the bench artifact:

1. read ``BENCH_OUT.json`` (a just-finished bench pass) and the merged
   per-query best-of table in ``BASELINE.md`` (last row per query
   wins, matching later-section re-baselines);
2. every query whose reading exceeds ``--threshold`` (default 2.0) ×
   its baseline row is re-measured solo best-of-``--runs`` (default 3)
   in THIS quiet session — same discipline as bench.py (fresh artifact
   root, warmup first, ``clearCache()`` between runs);
3. the streaming micro-tier (stateless / window_agg / dedup rows/s) is
   adjudicated the same way against the ``### Streaming-tier
   baseline`` table: any rate below baseline/threshold is re-measured
   via ``streaming_throughput`` best-of-``--runs`` (for rates LOWER is
   worse, so the flag condition inverts);
4. an ``adjudications`` block is appended to ``BENCH_OUT.json``:
   per flagged query {bench_sec, baseline_sec, ratio, solo_runs,
   solo_best, solo_ratio, verdict} where verdict is
     "noise"        solo best back under threshold × baseline
     "beats_row"    solo best at-or-under the baseline row itself
     "regression"   solo best STILL over threshold — engineer it
   plus a ``streaming`` sub-block with the same shape on rates.

Usage:
  python tools/bench_adjudicate.py [--bench BENCH_OUT.json]
      [--baseline BASELINE.md] [--threshold 2.0] [--runs 3]
      [--sf-dir /root/testdata/sf0.1] [--skip-streaming]

Exit 0 when every flag adjudicates to noise/beats_row; 1 when any
regression survives (the committed artifact then carries the proof
either way).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries/streams the bench prices but the baseline table does not row
# (one-shot e2e composite); never flagged
UNBASELINED_OK = {"ref_convert_e2e"}

STREAM_RATE_KEYS = (
    "stateless_rows_per_sec",
    "window_agg_rows_per_sec",
    "dedup_rows_per_sec",
)


def load_baseline_rows(path: str) -> dict[str, float]:
    """Last `| query | tier | best_sec | n_runs |` row per query wins —
    later BASELINE.md sections re-baseline earlier ones."""
    rows: dict[str, float] = {}
    pat = re.compile(
        r"^\|\s*([A-Za-z0-9_]+)\s*\|\s*(?:hot|audit|infra|e2e)\s*\|"
        r"\s*([0-9.]+)\s*\|\s*\d+"
    )
    for line in open(path):
        m = pat.match(line)
        if m:
            rows[m.group(1)] = float(m.group(2))
    return rows


def load_streaming_baseline(path: str) -> dict[str, float]:
    """Parse the `### Streaming-tier baseline` table:
    `| <rate key> | <rows/s> |` rows."""
    rates: dict[str, float] = {}
    in_section = False
    for line in open(path):
        if line.startswith("### Streaming-tier baseline"):
            in_section = True
            continue
        if in_section:
            if line.startswith("#"):
                break
            m = re.match(r"^\|\s*([a-z_]+_rows_per_sec)\s*\|\s*([0-9.]+)", line)
            if m:
                rates[m.group(1)] = float(m.group(2))
    return rates


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if os.path.basename(os.path.dirname(os.path.abspath(__file__)))
        == "tools" else os.getcwd(), "BENCH_OUT.json"))
    ap.add_argument("--baseline", default=None)
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--skip-streaming", action="store_true")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_path = args.bench if os.path.isabs(args.bench) else os.path.join(
        repo, args.bench)
    baseline_path = args.baseline or os.path.join(repo, "BASELINE.md")

    bench = json.load(open(bench_path))
    baseline = load_baseline_rows(baseline_path)
    stream_baseline = load_streaming_baseline(baseline_path)

    flagged: list[tuple[str, float, float]] = []
    unbaselined: list[str] = []
    for name, sec in bench.get("queries", {}).items():
        if sec < 0:
            continue
        row = baseline.get(name)
        if row is None:
            if name not in UNBASELINED_OK:
                unbaselined.append(name)
            continue
        if sec > args.threshold * row:
            flagged.append((name, sec, row))
    flagged.sort(key=lambda t: -(t[1] / t[2]))

    tier = bench.get("streaming_tier", {}) or {}
    stream_flagged = [
        (k, float(tier[k]), stream_baseline[k])
        for k in STREAM_RATE_KEYS
        if k in tier and k in stream_baseline
        and float(tier[k]) < stream_baseline[k] / args.threshold
    ]

    print(
        f"{len(flagged)} query reading(s) over {args.threshold}x baseline; "
        f"{len(stream_flagged)} streaming rate(s) under baseline/"
        f"{args.threshold}; {len(unbaselined)} unbaselined",
        file=sys.stderr,
    )
    if unbaselined:
        print(f"  unbaselined (add rows!): {unbaselined}", file=sys.stderr)

    adjudications: dict = {
        "threshold": args.threshold,
        "runs": args.runs,
        "n_flagged": len(flagged),
        "queries": {},
        "streaming": {},
        "unbaselined": unbaselined,
    }

    if flagged or stream_flagged:
        from parquet_to_csv_spark.plans.registry import QUERIES
        from parquet_to_csv_spark.session import get_spark

        os.environ.setdefault(
            "SPARK_GRAFT_ARTIFACT_DIR",
            tempfile.mkdtemp(prefix="adjudicate_artifacts_"),
        )
        spark = get_spark("bench-adjudicate")
        spark.read.parquet(
            os.path.join(args.sf_dir, "lineitem.parquet")
        ).count()  # warmup

        any_regression = False
        for name, sec, row in flagged:
            runs: list[float] = []
            for _ in range(args.runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                try:
                    QUERIES[name](spark, args.sf_dir).collect()
                except Exception as e:  # noqa: BLE001
                    runs.append(-1.0)
                    print(f"  {name}: solo run FAILED {e}", file=sys.stderr)
                    break
                runs.append(round(time.perf_counter() - t0, 3))
            ok_runs = [r for r in runs if r >= 0]
            solo = min(ok_runs) if ok_runs else -1.0
            if solo < 0:
                verdict = "error"
                any_regression = True
            elif solo <= row:
                verdict = "beats_row"
            elif solo <= args.threshold * row:
                verdict = "noise"
            else:
                verdict = "regression"
                any_regression = True
            adjudications["queries"][name] = {
                "bench_sec": sec,
                "baseline_sec": row,
                "ratio": round(sec / row, 2),
                "solo_runs": runs,
                "solo_best": solo,
                "solo_ratio": round(solo / row, 2) if solo > 0 else None,
                "verdict": verdict,
            }
            print(
                f"  {name}: bench {sec}s = {sec / row:.2f}x row {row}s; "
                f"solo best {solo}s = "
                f"{solo / row:.2f}x -> {verdict}",
                file=sys.stderr,
            )

        if stream_flagged and not args.skip_streaming:
            from parquet_to_csv_spark.streaming.stream import (
                streaming_throughput,
            )

            best: dict[str, float] = {}
            for _ in range(args.runs):
                spark.catalog.clearCache()
                t = streaming_throughput(spark, args.sf_dir)
                for k in STREAM_RATE_KEYS:
                    if k in t:
                        best[k] = max(best.get(k, 0.0), float(t[k]))
            for k, rate, row in stream_flagged:
                solo = best.get(k, -1.0)
                if solo >= row:
                    verdict = "beats_row"
                elif solo >= row / args.threshold:
                    verdict = "noise"
                else:
                    verdict = "regression"
                    any_regression = True
                adjudications["streaming"][k] = {
                    "bench_rows_per_sec": rate,
                    "baseline_rows_per_sec": row,
                    "solo_best_rows_per_sec": solo,
                    "verdict": verdict,
                }
                print(
                    f"  {k}: bench {rate:.0f} vs row {row:.0f}; "
                    f"solo best {solo:.0f} -> {verdict}",
                    file=sys.stderr,
                )
    else:
        any_regression = False

    bench["adjudications"] = adjudications
    with open(bench_path, "w") as f:
        json.dump(bench, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "n_flagged": len(flagged),
        "n_stream_flagged": len(stream_flagged),
        "n_regressions": sum(
            1
            for blk in (adjudications["queries"], adjudications["streaming"])
            for v in blk.values()
            if v["verdict"] in ("regression", "error")
        ),
        "written": bench_path,
    }))
    return 1 if any_regression else 0


if __name__ == "__main__":
    raise SystemExit(main())
