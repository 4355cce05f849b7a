"""Round-9 verdict item 5: ONE real 10× data rung for the headline
tier. Every scale claim above sf0.1 was a plan argument or a synthetic
per-family ladder; this runs the ~20 headline-tier queries (plus the
priced infra builds) at sf0.1 AND at the gen_sf_scale.py sf1 rung and
records the per-query growth exponent

    alpha = log10(best_sf1 / best_sf01)        (data grew exactly 10x)

alpha <= 1 is linear-or-better; alpha > 1 (wall grows faster than
data) flags the query for a plan trace. best-of-2 per (query, sf) so a
first-run build/codegen doesn't masquerade as data scaling; tokbase /
uniglm artifact builds are priced as their own rows per sf, exactly
like bench.py.

Usage: python tools/scale_ladder_sf1.py [--sf1 /tmp/spark_graft_sfdata/sf1]
Prints the markdown table for SCALE.md.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", default="/tmp/spark_graft_sfdata/sf1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from parquet_to_csv_spark.operators.corpus import _unigram_lm_base
    from parquet_to_csv_spark.operators.dedup import _token_base
    from parquet_to_csv_spark.plans.registry import QUERIES
    from parquet_to_csv_spark.session import get_spark

    spark = get_spark("scale-ladder-sf1")
    results: dict[str, dict[str, float]] = {}

    def set_artifact_root(tag: str) -> None:
        # fresh root per phase AND cleared process memos: timed builds
        # stay COLD builds, while the session itself is warm
        # (codegen/JIT paid in the warmup phase). Without clearing the
        # memos, the timed sf0.1 "build" is a no-op dict hit serving the
        # warmup root and the build ratio reads as fake superlinear.
        import parquet_to_csv_spark.operators.corpus as _c
        import parquet_to_csv_spark.operators.dedup as _d

        _d._TOKEN_BASE_CACHE.clear()
        _d._EDGE_CACHE.clear()
        _c._UNIGRAM_LM_CACHE.clear()
        spark.conf.set(
            "spark.graft.artifactDir",
            tempfile.mkdtemp(prefix=f"ladder_{tag}_"),
        )

    # WARMUP phase (untimed): run every build + headline query once at
    # sf0.1 so JVM/codegen/Python-worker startup is never attributed to
    # the first timed phase — without this the sf0.1 column reads
    # 3-10x its warm floor and every ratio is biased sublinear.
    set_artifact_root("warm")
    spark.read.parquet(os.path.join(args.sf01, "lineitem.parquet")).count()
    _token_base(spark, args.sf01).count()
    _unigram_lm_base(spark, args.sf01).count()
    for name in HEADLINE:
        QUERIES[name](spark, args.sf01).collect()
    print("  warmup done", file=sys.stderr)

    for sf_name, sf_dir in (("sf0.1", args.sf01), ("sf1", args.sf1)):
        set_artifact_root(sf_name.replace(".", "_"))
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
        for build_name, builder in (
            ("tokbase_build", _token_base),
            ("uniglm_build", _unigram_lm_base),
        ):
            t0 = time.perf_counter()
            builder(spark, sf_dir).count()
            results.setdefault(build_name, {})[sf_name] = round(
                time.perf_counter() - t0, 3
            )
        for name in HEADLINE:
            runs = []
            for _ in range(args.runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
            results.setdefault(name, {})[sf_name] = round(min(runs), 3)
            print(
                f"  {sf_name} {name}: {[round(r, 2) for r in runs]}",
                file=sys.stderr,
            )

    print("| query | sf0.1 best (s) | sf1 best (s) | ratio | alpha | verdict |")
    print("| --- | --- | --- | --- | --- | --- |")
    for name, r in results.items():
        ratio = r["sf1"] / max(r["sf0.1"], 1e-9)
        alpha = math.log10(max(ratio, 1e-9))
        verdict = "OK" if ratio <= 10 else "SUPERLINEAR - trace"
        print(
            f"| {name} | {r['sf0.1']:.3f} | {r['sf1']:.3f} "
            f"| {ratio:.2f}x | {alpha:.2f} | {verdict} |"
        )


if __name__ == "__main__":
    main()
