"""Merge N bench passes into the per-query best-of table (round-6
verdict item 4: BASELINE.md must carry a best-of row for EVERY
registry query, tiered, so any future per-query regression can be
attributed from committed artifacts alone).

Usage: python tools/merge_bench.py out.md run1.json run2.json [...]

Each runN.json is a `BENCH_OUT.json` from one full `bench.py` pass.
Emits a markdown table (query | tier | best_sec | n_runs) sorted by
best_sec descending, plus tier subtotals — paste/commit into
BASELINE.md.
"""

from __future__ import annotations

import json
import sys

AUDIT_TIER = {
    "blocking_recall_report",
    "leakage_release_certificate",
    "leakage_safe_split_v2",
    "leakage_safe_split_v3",
}
INFRA_TIER = {"tokbase_build"}


def main() -> None:
    out_path, runs = sys.argv[1], sys.argv[2:]
    best: dict[str, float] = {}
    seen: dict[str, int] = {}
    for p in runs:
        q = json.load(open(p))["queries"]
        for name, sec in q.items():
            if sec < 0:
                continue
            seen[name] = seen.get(name, 0) + 1
            if name not in best or sec < best[name]:
                best[name] = sec

    def tier(name: str) -> str:
        if name in AUDIT_TIER:
            return "audit"
        if name in INFRA_TIER:
            return "infra"
        if name == "ref_convert_e2e":
            return "e2e"
        return "hot"

    lines = [
        "| query | tier | best_sec | n_runs |",
        "| --- | --- | --- | --- |",
    ]
    for name in sorted(best, key=lambda n: -best[n]):
        lines.append(
            f"| {name} | {tier(name)} | {best[name]:.3f} | {seen[name]} |"
        )
    totals: dict[str, float] = {}
    for name, sec in best.items():
        totals[tier(name)] = totals.get(tier(name), 0.0) + sec
    summary = (
        f"**Merged best-of-{len(runs)}: {sum(best.values()):.1f} s / "
        f"{len(best)} entries** — "
        + ", ".join(f"{k} {v:.1f} s" for k, v in sorted(totals.items()))
    )
    with open(out_path, "w") as f:
        f.write(summary + "\n\n" + "\n".join(lines) + "\n")
    print(summary)
    print(f"wrote {out_path} ({len(best)} rows)")


if __name__ == "__main__":
    main()
