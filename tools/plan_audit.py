"""Plan audit: physical-plan quality summary for every registry query.

Writes PLAN_AUDIT.md — one row per query with the plan features that
matter at 100 TB: exchange count, join strategies, codegen spans,
whether parquet filter pushdown engaged. This is the artifact behind
SCALE.md's claims; regenerate after plan-affecting changes:

    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_csv_spark.plans.registry import QUERIES  # noqa: E402
from parquet_to_csv_spark.session import get_spark  # noqa: E402

# streaming/stateful queries materialize at build time — skip planning them
SKIP = {n for n in QUERIES if n.endswith("_drain") or "_drain_" in n}

# Unpartitioned-window whitelist: an empty-partition-spec WindowExec is
# the one plan shape that serializes a whole relation through a single
# task's sort, so the audit is red on ANY occurrence unless every
# ordering column proves the window runs over a tiny non-data relation:
# band-offset prefix sums (one row per value band — banded_row_number /
# banded_prefix_sum / distributed_ntile), partition-id ladders, and
# coarse calendar / decile / band grains whose cardinality is bounded
# by construction (months, deciles, quantile grid points), or bounded
# top-k relations that a LIMIT already collapsed (reflected in the plan
# as a preceding TakeOrderedAndProject / Limit, matched per-query).
_ALLOWED_ORDER_COLS = {
    "_band",          # band-count relation: one row per value band
    "pid",            # partition-id ladder (spark_partition_id grains)
    "band",           # explicit band grains (log buckets, score bands)
    "month", "mon", "day", "week", "wk",       # calendar grains
    "decile", "bin", "tile", "quantile",       # bounded tile grids
    "bucket", "stratum",                       # bounded strata grids
    "version", "snap_id",                      # snapshot ledger grains
}
# Per-query allowances where the window provably runs over a bounded
# relation but the ordering columns are data-named, so the column
# whitelist can't see it: query name -> (max occurrences, why the
# window's input is tiny by construction). Reviewed 2026-08-14; any
# NEW unpartitioned window in these queries past the count still flags.
_TINY_WINDOWS: dict[str, tuple[int, str]] = {
    "auc_ranker": (1, "distinct 4-dp score grid, <=10001 rows"),
    "vocab_dictionary": (1, "post-limit(v) top-v token relation"),
    "zipf_slope": (1, "post-limit(top_n) token relation"),
    "token_rank_movers": (1, "post-limit(k) mover relation"),
    "hill_tail_index": (2, "post-limit(k+1) tail relation"),
    "logbucket_quantiles": (4, "(digits x lead) log buckets, dozens"),
    "monthly_growth": (1, "calendar month grain"),
    "region_share_report": (1, "calendar month grain"),
    "spc_control_limits": (2, "calendar month grain"),
    "conversion_survival_curve": (2, "distinct whole-day durations, calendar-bounded"),
    "nelson_aalen_hazard": (2, "distinct whole-day durations, calendar-bounded"),
    "hits_copurchase": (1, "post-limit(k) top-k authority relation"),
    "unimax_allocation": (2, "language-grain relation, |langs| rows"),
    "delong_auc_ci": (1, "distinct score grid, same relation as auc_ranker"),
    "negative_sampling_quota": (2, "vocab-grain remainder rank, duplicated by the top/checksum union branches (fixture vocab is dozens of tokens; web scale swaps to banded rank)"),
    "top_event_trigrams": (1, "|event types|^3 trigram-type relation"),
    "group_quota_sample": (2, "|languages| strata relation"),
    "neyman_allocation": (1, "|languages| strata relation"),
    "nation_league_table": (3, "25-nation relation"),
    "bradley_terry_sources": (1, "|sources| relation (rank over the strength table)"),
    "bh_fdr_screen": (2, "20-cell hypothesis relation (5 types x 4 hour-bands)"),
    "bm25_dedup_topk": (1, "post-TakeOrdered(pool=30) candidate relation"),
    # round 6
    "sequential_pattern_topk": (1, "|event types|^3 pattern relation"),
    "rake_keywords": (1, "phrase-vocabulary aggregate (post word-score join)"),
    "doremi_lite_weights": (6, "|sources| relation (uniform init + 4 MW renorm ranks + slack)"),
    "personalized_pagerank": (1, "post-TakeOrdered(k=20) relation"),
}


def _strip_ref(col: str) -> str:
    # "cents#6L ASC NULLS FIRST" -> "cents"
    return re.sub(r"#\d+[A-Za-z]*$", "", col.strip().split(" ")[0])


def _top_level_groups(args: str) -> list[str]:
    groups, depth, start = [], 0, None
    for i, ch in enumerate(args):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(args[start:i])
    return groups


def unpartitioned_windows(plan: str) -> list[str]:
    """Ordering-column signatures of every WindowExec whose partition
    spec is empty AND whose ordering columns are not all whitelisted
    tiny-relation grains. Empty list = plan is scale-safe on this axis.
    """
    bad = []
    for block in plan.split("\n\n"):
        m = re.match(r"\(\d+\) Window(?:GroupLimit)?\s*$", block.split("\n")[0].strip())
        if not m:
            continue
        arg_line = next(
            (l for l in block.split("\n") if l.startswith("Arguments: ")), None
        )
        if arg_line is None:
            continue
        groups = _top_level_groups(arg_line[len("Arguments: "):])
        # Window: 3 groups = [exprs], [partition], [order] ->
        # partitioned. 2 groups is ambiguous — the empty spec is
        # OMITTED, not rendered [] — so the last group is the ORDER
        # spec iff it carries ASC/DESC markers, else it is the
        # partition spec of an unordered window (partitioned -> fine).
        # WindowGroupLimit: [partition], [order], fn, k, mode; a
        # global one omits the partition group, leaving 1 group.
        def is_order(g: str) -> bool:
            return bool(re.search(r"\b(ASC|DESC)\b", g))

        if "WindowGroupLimit" in block.split("\n")[0]:
            if len(groups) >= 2:
                continue
            order_group = groups[0] if groups and is_order(groups[0]) else ""
            if not order_group:
                continue
        else:
            if len(groups) != 2 or not is_order(groups[-1]):
                continue
            order_group = groups[-1]
        cols = [_strip_ref(c) for c in order_group.split(",") if "#" in c]
        if cols and all(c in _ALLOWED_ORDER_COLS for c in cols):
            continue
        bad.append("+".join(cols) or "<no-order>")
    return bad


def audit(plan: str, name: str = "") -> dict[str, object]:
    joins = sorted(
        {m for m in re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)}
    )
    uw = unpartitioned_windows(plan)
    if name in _TINY_WINDOWS:
        uw = uw[_TINY_WINDOWS[name][0]:]
    return {
        "exchanges": len(re.findall(r"\(\d+\) (?:Exchange|BroadcastExchange)", plan)),
        "joins": "+".join(j.replace("Join", "") for j in joins) or "—",
        "pushdown": "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "—",
        # a BNLJ always has a bounded broadcast side (query sets /
        # centroids in the similarity tier) — intentional there; an
        # unbounded CartesianProduct is always a defect.
        "cartesian": "CartesianProduct" in plan,
        "unpart_windows": uw,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    rows = []
    for name, fn in QUERIES.items():
        if name in SKIP:
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        rows.append((name, audit(plan, name)))

    lines = [
        "# PLAN AUDIT — physical-plan quality per query",
        "",
        f"Generated by `tools/plan_audit.py` at `{sf_dir}`. Columns:",
        "exchanges (shuffle+broadcast boundaries), join strategies chosen,",
        "parquet filter pushdown engaged.",
        "BroadcastNestedLoop appears only where designed (similarity tier:",
        "bounded broadcast query/centroid sides against the scan); an",
        "unbounded CartesianProduct is always a defect (flagged ⚠), and so",
        "is any WindowExec with an empty partition spec over a data-grain",
        "relation (flagged ⚠WINDOW with its ordering columns; band-offset /",
        "calendar / tile-grid windows over provably tiny relations are",
        "whitelisted in tools/plan_audit.py).",
        "",
        "| query | exchanges | joins | pushdown |",
        "| --- | --- | --- | --- |",
    ]
    for name, a in rows:
        flag = " ⚠CARTESIAN" if a["cartesian"] else ""
        if a["unpart_windows"]:
            flag += " ⚠WINDOW[" + "; ".join(a["unpart_windows"]) + "]"
        lines.append(
            f"| {name} | {a['exchanges']} | {a['joins']}{flag} | {a['pushdown']} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(rows)} queries)")
    n_cart = sum(1 for _, a in rows if a["cartesian"])
    n_uw = sum(1 for _, a in rows if a["unpart_windows"])
    print(f"cartesian plans: {n_cart}")
    print(f"unpartitioned data windows: {n_uw}")
    for name, a in rows:
        if a["unpart_windows"]:
            print(f"  {name}: {a['unpart_windows']}")
    if n_cart or n_uw:
        sys.exit(1)


if __name__ == "__main__":
    main()
