"""Bench regression diff — compare two BENCH_OUT.json artifacts.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold]

Prints per-query regressions past ``threshold``× (default 1.5, only
for queries slower than 0.5 s — sub-second timings carry ±20-50 %
co-tenant noise on this box, see BASELINE.md methodology), plus
added/removed queries and the total-wall movement. Exit 1 when any
regression crosses the bar, so CI can gate on it.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old_p, new_p = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_p))["queries"]
    new = json.load(open(new_p))["queries"]
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    regressions = []
    for q in sorted(set(old) & set(new)):
        a, b = old[q], new[q]
        if a <= 0 or b <= 0:
            continue
        if a >= 0.5 and b > a * threshold:
            regressions.append((q, a, b, b / a))
    tot_old = sum(v for v in old.values() if v > 0)
    tot_new = sum(v for v in new.values() if v > 0)
    print(f"total wall: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({len(old)} -> {len(new)} queries)")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    for q, a, b, r in sorted(regressions, key=lambda t: -t[3]):
        print(f"REGRESSION {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    if not regressions:
        print(f"no regressions past {threshold}x (queries >= 0.5s)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
