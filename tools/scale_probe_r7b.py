"""Empirical scale probe for the round-7 additions that carry their
own growth claims: NN-Descent (E488), sorted-neighborhood blocking
(E484), and the KMV theta sketch (E479).

Same discipline as tools/scale_probe.py (dedup tier) and
tools/scale_probe_ann.py (IVF/LSH tier): synthesize 1×/2×/5×/10×
corpora in a temp dir (never touching /root/testdata), measure wall +
the operator's own quality metric per factor, print the markdown table
for SCALE.md.

- NN-Descent: embeddings grow by the ann-probe's 0.8/0.2 vector-mix
  (densifying neighborhoods — the hard case for a neighbor-propagation
  graph); measures build wall + recall@5 vs exact for the fixed query
  set. Claim under test: O(k²·N·d) per round — wall ~linear in N,
  recall stable.
- SNM: documents grow by suffix-perturbed copies (adjacent sort keys —
  the hard case for a window method); measures wall + verified pairs.
  Claim: candidates exactly (w−1)·N → wall linear, pairs ~linear.
- KMV: events grow by user-id-shifted copies (true ndv grows ×factor);
  measures wall + worst per-type |err| ppm. Claim: fixed-size sketch,
  error flat as ndv grows.

Usage: python tools/scale_probe_r7b.py [--factors 1,2,5,10]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_probe_ann import build_corpus, recall, topk_sets  # noqa: E402


def build_docs(spark, sf_dir: str, out_dir: str, factor: int) -> str:
    from parquet_to_csv_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [docs]
    for c in range(1, factor):
        parts.append(
            docs.select(
                (F.col("doc_id") + c * n).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" rev{c}")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + 5).alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    path = os.path.join(out_dir, f"d{factor}")
    os.makedirs(path, exist_ok=True)
    out.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    return path


def build_events(spark, sf_dir: str, out_dir: str, factor: int) -> str:
    from parquet_to_csv_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    u = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n = ev.agg(F.max("event_id")).collect()[0][0] + 1
    parts = [ev]
    for c in range(1, factor):
        parts.append(
            ev.select(
                (F.col("event_id") + c * n).alias("event_id"),
                "ts",
                (F.col("user_id") + c * u).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    path = os.path.join(out_dir, f"e{factor}")
    os.makedirs(path, exist_ok=True)
    out.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(path, "events.parquet")
    )
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,2,5,10")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]

    from parquet_to_csv_spark.operators.dedup import sorted_neighborhood_pairs
    from parquet_to_csv_spark.operators.similarity import (
        cosine_topk,
        nndescent_topk,
    )
    from parquet_to_csv_spark.operators.sketch import kmv_distinct_estimate
    from parquet_to_csv_spark.session import get_spark

    spark = get_spark("scale_r7b")
    tmp = tempfile.mkdtemp(prefix="scale_r7b_")
    rows = []
    for f in factors:
        edir = build_corpus(spark, args.sf, tmp, f)
        t0 = time.perf_counter()
        nnd = nndescent_topk(spark, edir)
        approx = topk_sets(nnd, 5)
        w_nnd = time.perf_counter() - t0
        truth = topk_sets(cosine_topk(spark, edir, n_queries=12, k=5), 5)
        r_nnd = recall(approx, truth, 5)

        ddir = build_docs(spark, args.sf, tmp, f)
        t0 = time.perf_counter()
        n_pairs = sorted_neighborhood_pairs(spark, ddir).count()
        w_snm = time.perf_counter() - t0

        vdir = build_events(spark, args.sf, tmp, f)
        t0 = time.perf_counter()
        kmv = {
            r["scope"]: r for r in kmv_distinct_estimate(spark, vdir).collect()
        }
        w_kmv = time.perf_counter() - t0
        worst = max(
            r["abs_err_ppm"]
            for s, r in kmv.items()
            if s != "view&click"
        )
        rows.append((f, w_nnd, r_nnd, w_snm, n_pairs, w_kmv, worst))
        print(
            f"| {f}× | {w_nnd:.1f} | {r_nnd} | {w_snm:.1f} | {n_pairs} "
            f"| {w_kmv:.1f} | {worst} |",
            flush=True,
        )

    print("\n| factor | nnd_wall_s | nnd_recall@5 | snm_wall_s | snm_pairs "
          "| kmv_wall_s | kmv_worst_err_ppm |")
    for f, w1, r1, w2, p2, w3, e3 in rows:
        print(f"| {f}× | {w1:.1f} | {r1} | {w2:.1f} | {p2} | {w3:.1f} | {e3} |")


if __name__ == "__main__":
    main()
