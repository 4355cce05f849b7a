"""Plan-fingerprint result cache — memoized materialization.

The reference's two-layer JSON cache (S7/S8) existed to avoid
recomputing one hard-coded pipeline. The engine generalizes the idea
the Spark-native way: any DataFrame can be materialized once to
parquet under a key derived from its ANALYZED-PLAN semantic hash
(`DataFrame.semanticHash` — stable across sessions for the same
logical plan, insensitive to alias/ordering noise the way
`sameSemantics` is). A later run that builds the same plan gets a
parquet scan instead of recomputation; a changed plan gets a new key
and a fresh materialization — no stale-cache reads by construction.

Scale: this is the ad-hoc cousin of the materialized relations the
operators already use (`dedup_edges`, the IVF index): those encode
KNOWN reuse; the cache catches reuse the pipeline author didn't
declare. Entries are plain parquet directories — vacuumable by mtime,
shareable across processes on shared storage.

Caveat (documented, test-pinned): the key covers the PLAN, not the
INPUT BYTES — rewriting an input path's files without changing the
path keeps the key. Pass ``salt`` (e.g. a snapshot version from
`sources.layout.latest_version`) when inputs are mutable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def cached(df: DataFrame, cache_dir: str, salt: str = "") -> DataFrame:
    """Materialize-once: returns a parquet-backed DataFrame with the
    same rows as ``df``, computing and writing only on first call for
    this (plan, salt)."""
    key = f"{df.semanticHash() & 0xFFFFFFFF:08x}" + (f"_{salt}" if salt else "")
    path = os.path.join(cache_dir, key)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def cache_entries(cache_dir: str) -> list[tuple[str, float]]:
    """(key, last-modified) per entry — the vacuum input."""
    if not os.path.isdir(cache_dir):
        return []
    out = []
    for k in sorted(os.listdir(cache_dir)):
        p = os.path.join(cache_dir, k, "_SUCCESS")
        if os.path.exists(p):
            out.append((k, os.path.getmtime(p)))
    return out


def vacuum_cache(cache_dir: str, max_age_seconds: float, now: float) -> list[str]:
    """Drop entries older than ``max_age_seconds`` (caller supplies
    ``now`` — keeps the function deterministic and testable). Returns
    removed keys."""
    import shutil

    removed = []
    for k, mtime in cache_entries(cache_dir):
        if now - mtime > max_age_seconds:
            shutil.rmtree(os.path.join(cache_dir, k))
            removed.append(k)
    return removed


def warm_hit(df: DataFrame, cache_dir: str, salt: str = "") -> bool:
    """True iff ``cached(df, ...)`` would be served without compute."""
    key = f"{df.semanticHash() & 0xFFFFFFFF:08x}" + (f"_{salt}" if salt else "")
    return os.path.exists(os.path.join(cache_dir, key, "_SUCCESS"))
