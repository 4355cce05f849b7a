"""Empirical scale probe for the dedup tier (round-5 verdict item 2).

Every 100×-scale claim in the dedup docstrings (prefix-filter
candidate growth, CC round counts) was argued analytically and
measured only at sf0.1 (5 k docs). This script MEASURES the growth:
it synthesizes corpora at 1×/2×/5×/10× the sf0.1 documents table in a
temp dir (never touching /root/testdata), re-runs the dedup tier, and
records docs / prefix postings / candidate pairs / verified pairs /
wall seconds per factor. The fitted log-log exponent between
successive factors is the sub-quadratic evidence (or the fix list).

Corpus synthesis — designed so growth is REALISTIC, not rigged:

- copy 0 is the original corpus verbatim;
- copy c>0 keeps doc i's (lang, source) but SPLICES its text: first
  half of doc i's tokens + second half of doc (i+c mod N)'s tokens.
  The global vocabulary is preserved and every token's corpus
  frequency scales ×k (shared-vocab posting lists grow like a real
  corpus — the exact stress the prefix filter must survive), while a
  spliced copy is only ~J=1/3 similar to its parents, so the 0.8 true
  pair set stays dominated by the original corpus's duplicate
  structure replicated per copy.

Usage: python tools/scale_probe.py [--factors 1,2,5,10] [--skip-unblocked-at 10]
Writes the measured table to stdout (markdown) for SCALE.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, sf_dir: str, out_dir: str, factor: int) -> str:
    """Write the factor-k corpus to out_dir/documents.parquet."""
    from parquet_to_csv_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [docs]
    tok = docs.select(
        "doc_id", "lang", "source",
        F.split(F.col("text"), r"\s+").alias("w"),
    )
    for c in range(1, factor):
        left = tok.select(
            "doc_id", "lang", "source",
            F.slice("w", F.lit(1), (F.size("w") / 2).cast("int")).alias("wl"),
        )
        right = tok.select(
            ((F.col("doc_id") - c + n) % n).alias("doc_id"),
            F.expr("slice(w, cast(size(w)/2 as int)+1, size(w))").alias("wr"),
        )
        spliced = left.join(right, "doc_id").select(
            (F.col("doc_id") + c * n).alias("doc_id"),
            "lang", "source",
            F.concat_ws(" ", F.concat(F.col("wl"), F.col("wr"))).alias("text"),
        )
        parts.append(spliced)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    path = os.path.join(out_dir, f"f{factor}")
    os.makedirs(path, exist_ok=True)
    out.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    return path


def probe(spark, corpus_dir: str, threshold: float, blocked: bool) -> dict:
    """Candidate diagnostics + timed edge build for one corpus."""
    from parquet_to_csv_spark.operators import dedup

    base = dedup._token_base(spark, corpus_dir)
    plen = (F.col("sz") - F.floor(F.lit(threshold) * F.col("sz")) + 1).cast("int")
    pref = base.select(
        "doc_id", "lang", "source", "sz",
        F.explode(F.slice("toks", F.lit(1), plen)).alias("ptok"),
    )
    postings = pref.count()
    a, b = pref.alias("a"), pref.alias("b")
    eps = 1e-9
    cond = (
        (F.col("a.ptok") == F.col("b.ptok"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.col("a.sz") >= F.lit(threshold) * F.col("b.sz") - F.lit(eps))
        & (F.col("b.sz") >= F.lit(threshold) * F.col("a.sz") - F.lit(eps))
    )
    if blocked:
        cond = (
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & cond
        )
    candidates = (
        a.join(b, cond)
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .count()
    )
    t0 = time.perf_counter()
    pairs = dedup.ngram_jaccard_pairs(
        spark, corpus_dir, threshold, blocked=blocked
    ).count()
    wall = round(time.perf_counter() - t0, 2)
    return {
        "postings": postings,
        "candidates": candidates,
        "pairs": pairs,
        "sec": wall,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,2,5,10")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument(
        "--skip-unblocked-at", type=int, default=0,
        help="skip the unblocked probe at factors >= this (0 = never)",
    )
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]

    os.environ.setdefault(
        "SPARK_GRAFT_ARTIFACT_DIR", tempfile.mkdtemp(prefix="scale_art_")
    )
    from parquet_to_csv_spark.operators import dedup
    from parquet_to_csv_spark.session import get_spark

    spark = get_spark("scale_probe")
    work = tempfile.mkdtemp(prefix="scale_probe_")
    print(f"work dir: {work}", file=sys.stderr)

    rows = []
    for k in factors:
        cdir = build_corpus(spark, args.sf_dir, work, k)
        ndocs = spark.read.parquet(
            os.path.join(cdir, "documents.parquet")
        ).count()
        rec = {"factor": k, "docs": ndocs}
        rec["blocked"] = probe(spark, cdir, args.threshold, blocked=True)

        if not args.skip_unblocked_at or k < args.skip_unblocked_at:
            rec["unblocked"] = probe(spark, cdir, args.threshold, blocked=False)

        # MinHash-LSH pairs + clusters on the same corpus
        t0 = time.perf_counter()
        mh = dedup.minhash_lsh_pairs(spark, cdir).count()
        rec["minhash"] = {"pairs": mh, "sec": round(time.perf_counter() - t0, 2)}
        t0 = time.perf_counter()
        cl = dedup.dup_clusters(spark, cdir, args.threshold).count()
        rec["clusters"] = {
            "rows": cl,
            "sec": round(time.perf_counter() - t0, 2),
            "cc_rounds": dict(dedup.LAST_CC_ROUNDS),
        }
        rows.append(rec)
        print("ROW", rec, flush=True)
        spark.catalog.clearCache()

    # markdown table + successive log-log exponents
    import math

    def exp_between(r1, r2, path):
        v1, v2 = r1, r2
        for p in path:
            v1, v2 = v1[p], v2[p]
        if not v1 or not v2:
            return float("nan")
        return math.log(v2 / v1) / math.log(r2["docs"] / r1["docs"])

    print("\n| factor | docs | postings(B) | candidates(B) | pairs(B) | sec(B) "
          "| postings(U) | candidates(U) | pairs(U) | sec(U) | mh pairs | mh sec "
          "| cluster rows | cluster sec |")
    print("|" + "---|" * 14)
    for r in rows:
        b = r["blocked"]
        u = r.get("unblocked", {})
        m, c = r["minhash"], r["clusters"]
        print(
            f"| {r['factor']} | {r['docs']} | {b['postings']} | {b['candidates']} "
            f"| {b['pairs']} | {b['sec']} | {u.get('postings','—')} "
            f"| {u.get('candidates','—')} | {u.get('pairs','—')} "
            f"| {u.get('sec','—')} | {m['pairs']} | {m['sec']} "
            f"| {c['rows']} | {c['sec']} |"
        )
    print("\ngrowth exponents (log-log slope vs docs, successive factors):")
    for r1, r2 in zip(rows, rows[1:]):
        line = (
            f"  {r1['factor']}→{r2['factor']}: "
            f"blocked candidates {exp_between(r1, r2, ['blocked', 'candidates']):.2f}, "
            f"blocked sec {exp_between(r1, r2, ['blocked', 'sec']):.2f}"
        )
        if "unblocked" in r1 and "unblocked" in r2:
            line += (
                f", unblocked candidates "
                f"{exp_between(r1, r2, ['unblocked', 'candidates']):.2f}, "
                f"unblocked sec {exp_between(r1, r2, ['unblocked', 'sec']):.2f}"
            )
        line += (
            f", cluster sec {exp_between(r1, r2, ['clusters', 'sec']):.2f}"
        )
        print(line)


if __name__ == "__main__":
    main()
