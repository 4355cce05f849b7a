"""Empirical scale probe for the similarity/ANN tier (round-6 verdict
item 3).

The dedup tier's 100 TB claims are MEASURED (tools/scale_probe.py);
the ANN tier's were still analytic — and `embedding_neardup_pairs`
drifted +21 % in round 6. This script synthesizes embedding corpora at
1×/2×/5×/10× the sf0.1 `embeddings` table (in a temp dir, never
touching /root/testdata) and measures, per factor:

- exact brute-force top-k (ground truth + its own wall),
- persisted IVF index BUILD wall (E297, fresh artifact root per run),
- IVF indexed query wall + recall@k vs the exact truth,
- SRP-LSH query wall + recall@k (E46),
- SemDeDup prune wall + rows (E300, riding the same index),
- embedding_neardup_pairs wall + pairs (E3 — the round-6 watch item).

Corpus synthesis — realistic, not rigged: copy 0 is the original
corpus verbatim; copy c>0 takes vector i's label but MIXES the vector:
0.8·v_i + 0.2·v_{(i+c) mod N} per dimension. New vectors are highly
correlated with (cosine ≈ .97 to) their parents — the densifying-
neighborhood stress a growing real corpus applies to ANN recall and to
near-dup pair counts — while queries (vec_id < n_queries) stay the
original vectors at every factor, so recall numbers are comparable.

IVF cells scale as n_cells = base_cells × factor (constant expected
cell size — the production sizing the E300 docstring claims); pass
--fixed-cells to measure the mis-sized alternative for contrast.

Usage: python tools/scale_probe_ann.py [--factors 1,2,5,10]
Writes the measured markdown table to stdout for SCALE.md.
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


def build_corpus(spark, sf_dir: str, out_dir: str, factor: int) -> str:
    from parquet_to_csv_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = [emb]
    for c in range(1, factor):
        right = emb.select(
            ((F.col("vec_id") - c + n) % n).alias("vec_id"),
            F.col("embedding").alias("e2"),
        )
        mixed = emb.join(right, "vec_id").select(
            (F.col("vec_id") + c * n).alias("vec_id"),
            F.zip_with(
                "embedding",
                "e2",
                lambda x, y: (x * F.lit(0.8) + y * F.lit(0.2)).cast("float"),
            ).alias("embedding"),
            "label",
        )
        parts.append(mixed)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    path = os.path.join(out_dir, f"f{factor}")
    os.makedirs(path, exist_ok=True)
    out.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(path, "embeddings.parquet")
    )
    return path


def topk_sets(df, k: int) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["cand_id"])
    return out


def recall(approx: dict[int, set[int]], truth: dict[int, set[int]], k: int):
    if not truth:
        return float("nan")
    return round(
        sum(len(approx.get(q, set()) & t) / min(k, len(t))
            for q, t in truth.items()) / len(truth),
        4,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,2,5,10")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n-queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--base-cells", type=int, default=16)
    ap.add_argument(
        "--cells-mode", choices=("linear", "sqrt", "fixed"), default="linear",
        help="n_cells sizing: linear = base×factor (constant cell size, "
        "O(N·k)=O(N²) assignment), sqrt = base×√factor (FAISS nlist≈√N "
        "sizing — assignment and within-cell work both O(N^1.5)), "
        "fixed = base (cells grow linearly, within-cell work O(N²))",
    )
    ap.add_argument("--neardup-threshold", type=float, default=0.4)
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]

    os.environ.setdefault(
        "SPARK_GRAFT_ARTIFACT_DIR", tempfile.mkdtemp(prefix="annscale_art_")
    )
    from parquet_to_csv_spark.operators import similarity
    from parquet_to_csv_spark.session import get_spark

    spark = get_spark("scale_probe_ann")
    work = tempfile.mkdtemp(prefix="annscale_")
    print(f"work dir: {work}", file=sys.stderr)

    nq, k = args.n_queries, args.k
    rows = []
    for f in factors:
        cdir = build_corpus(spark, args.sf_dir, work, f)
        ndocs = spark.read.parquet(
            os.path.join(cdir, "embeddings.parquet")
        ).count()
        n_cells = {
            "linear": args.base_cells * f,
            "sqrt": int(args.base_cells * math.sqrt(f)),
            "fixed": args.base_cells,
        }[args.cells_mode]
        rec = {"factor": f, "vecs": ndocs, "n_cells": n_cells}

        t0 = time.perf_counter()
        truth_df = similarity.cosine_topk(spark, cdir, n_queries=nq, k=k)
        truth = topk_sets(truth_df, k)
        rec["exact_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        idx = similarity._ivf_index_dir(spark, cdir, n_cells, 2)
        rec["ivf_build_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        approx = topk_sets(
            similarity.ivf_indexed_topk(
                spark, cdir, n_queries=nq, k=k, n_cells=n_cells,
                nprobe=max(4, n_cells // 4), index_dir=idx,
            ),
            k,
        )
        rec["ivf_query_sec"] = round(time.perf_counter() - t0, 2)
        rec["ivf_recall"] = recall(approx, truth, k)

        t0 = time.perf_counter()
        srp = topk_sets(
            similarity.srp_lsh_topk(spark, cdir, n_queries=nq, k=k), k
        )
        rec["srp_sec"] = round(time.perf_counter() - t0, 2)
        rec["srp_recall"] = recall(srp, truth, k)

        t0 = time.perf_counter()
        pruned = similarity.semdedup_prune(
            spark, cdir, eps=0.9, n_cells=n_cells, index_dir=idx
        ).count()
        rec["semdedup_sec"] = round(time.perf_counter() - t0, 2)
        rec["semdedup_pruned"] = pruned

        t0 = time.perf_counter()
        pairs = similarity.embedding_neardup_pairs(
            spark, cdir, threshold=args.neardup_threshold
        ).count()
        rec["neardup_sec"] = round(time.perf_counter() - t0, 2)
        rec["neardup_pairs"] = pairs

        rows.append(rec)
        print("ROW", rec, flush=True)
        spark.catalog.clearCache()

    print("\n| factor | vecs | cells | exact s | ivf build s | ivf query s "
          "| ivf R@%d | srp s | srp R@%d | semdedup s | pruned "
          "| neardup s | pairs |" % (k, k))
    print("|" + "---|" * 13)
    for r in rows:
        print(
            f"| {r['factor']} | {r['vecs']} | {r['n_cells']} "
            f"| {r['exact_sec']} | {r['ivf_build_sec']} "
            f"| {r['ivf_query_sec']} | {r['ivf_recall']} "
            f"| {r['srp_sec']} | {r['srp_recall']} "
            f"| {r['semdedup_sec']} | {r['semdedup_pruned']} "
            f"| {r['neardup_sec']} | {r['neardup_pairs']} |"
        )

    def slope(r1, r2, key):
        v1, v2 = r1[key], r2[key]
        if not v1 or not v2:
            return float("nan")
        return math.log(v2 / v1) / math.log(r2["vecs"] / r1["vecs"])

    print("\ngrowth exponents (log-log slope vs vecs, successive factors):")
    for r1, r2 in zip(rows, rows[1:]):
        print(
            f"  {r1['factor']}→{r2['factor']}: "
            f"ivf build {slope(r1, r2, 'ivf_build_sec'):.2f}, "
            f"ivf query {slope(r1, r2, 'ivf_query_sec'):.2f}, "
            f"srp {slope(r1, r2, 'srp_sec'):.2f}, "
            f"semdedup {slope(r1, r2, 'semdedup_sec'):.2f}, "
            f"neardup sec {slope(r1, r2, 'neardup_sec'):.2f}, "
            f"neardup pairs {slope(r1, r2, 'neardup_pairs'):.2f}"
        )


if __name__ == "__main__":
    main()
