"""Round-10 ADVICE worker: cross-process conditional-PUT race.

Two instances of this script race ``put_if_absent`` on the SAME
sequence of target paths through ``ConditionalPutCommitBackend`` —
whose in-process ``threading.Lock`` serializes NOTHING between two
interpreters. Pre-round-10 (``exists()`` + ``os.replace``) both
processes could "win" a path, the later replace silently clobbering
the earlier committed object; the staged-payload + ``os.link``
check-and-create must yield exactly one winner per path, with the
winner's exact payload surviving.

A pairwise file barrier per round keeps the two PUTs back-to-back so
the race window is actually exercised, not just possible.

Usage: ``python cput_race_worker.py <arena_dir> <worker_id:0|1> <n_rounds>``
Prints one JSON line: ``{"w": id, "wins": [round indices won]}``.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from parquet_to_csv_spark.sources.layout import (  # noqa: E402
    ConditionalPutCommitBackend,
)


def main() -> None:
    arena, w, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    backend = ConditionalPutCommitBackend()
    wins: list[int] = []
    for i in range(n):
        # pairwise barrier: announce readiness, hot-spin for the peer —
        # both processes then issue their PUT within microseconds
        open(os.path.join(arena, f"r{i}.w{w}"), "w").write("1")
        peer = os.path.join(arena, f"r{i}.w{1 - w}")
        deadline = time.time() + 60
        while not os.path.exists(peer):
            if time.time() > deadline:
                raise TimeoutError(f"worker {w} round {i}: peer never arrived")
        if backend.put_if_absent(
            os.path.join(arena, f"target-{i}.json"),
            json.dumps({"winner": w, "round": i}),
        ):
            wins.append(i)
    print(json.dumps({"w": w, "wins": wins}))


if __name__ == "__main__":
    main()
