"""Registry-wide partition-count AND input-order invariance sweep.

The driver's correctness gate samples only the first 50 registry
entries; this module is the independent guard for the rest (round-4
verdict item 1). EVERY batch query in ``QUERIES`` re-runs under a
hostile execution layout and must reproduce its default-layout result
EXACTLY (same bar as the driver's value-hash):

- ``spark.sql.shuffle.partitions = 3`` (vs the session's 8) — flushes
  out any dependence on the number of reduce partitions;
- every ``load_table`` input round-robin ``repartition(7)``-ed — moves
  every row to an arbitrary partition in an arbitrary slot order,
  flushing out any dependence on file layout, input row order, or
  map-side partition boundaries (the property that actually breaks on
  a real cluster, where input splits differ run to run).

This consolidates and supersedes the older partial sweeps
(test_invariance_sweep / test_batch_j_invariance /
test_batch_k_invariance / test_round4_invariance, ~150 queries at
shuffle.partitions=3 only) with strictly stronger hostility and full
registry coverage.

Excluded, each with a reason (everything else runs — additions to the
registry are swept automatically):

- streaming drains (``*_drain``, ``python_stream_digest``,
  ``hybrid_backfill_union``) — availableNow drains re-serve their
  content-salted staging artifacts, making a second run vacuous; each
  has its own batch-parity test;
- ``snapshot_delta_scan`` / ``ivf_index_append_topk`` — build-once
  process memos would serve the first run's artifact to the second
  (tautological comparison); their own gates cover them;
- ``scripted_threshold_walk`` — SQL scripting carries ~0.6 s/statement
  fixed overhead and its ladder walk re-executes per run; the
  aggregate it walks is swept via the other entries.
"""

from __future__ import annotations

import sys
from contextlib import contextmanager

import pytest

from parquet_to_csv_spark.plans.registry import QUERIES
from parquet_to_csv_spark.sources import tables as _tables

EXCLUDED = {
    name
    for name in QUERIES
    if name.endswith("_drain") or name.startswith("streaming_")
} | {
    "python_stream_digest",
    "hybrid_backfill_union",
    "snapshot_delta_scan",
    "ivf_index_append_topk",
    "scripted_threshold_walk",
}

BATCH = [n for n in QUERIES if n not in EXCLUDED]


def _canon(rows):
    # key=repr: None-safe total order (subtotal rows put NULLs next to
    # strings, which tuple '<' cannot compare)
    return sorted(
        (tuple(r) for r in (row.asDict().values() for row in rows)),
        key=repr,
    )


@contextmanager
def _hostile_layout(spark):
    """shuffle.partitions=3 + every load_table round-robin scrambled."""
    real = _tables.load_table

    def scrambled(spark_, sf_dir_, name_):
        return real(spark_, sf_dir_, name_).repartition(7)

    patched = [
        mod
        for mod in list(sys.modules.values())
        if getattr(mod, "load_table", None) is real
    ]
    for mod in patched:
        mod.load_table = scrambled
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        for mod in patched:
            mod.load_table = real


@pytest.mark.parametrize("name", BATCH)
def test_registry_invariance(spark, sf_dir, name):
    base = _canon(QUERIES[name](spark, sf_dir).collect())
    with _hostile_layout(spark):
        alt = _canon(QUERIES[name](spark, sf_dir).collect())
    assert alt == base
