"""Plan-fingerprint result cache — memoized materialization.

The reference's two-layer JSON cache (S7/S8) existed to avoid
recomputing one hard-coded pipeline. The engine generalizes the idea
the Spark-native way: any DataFrame can be materialized once to
parquet under a key derived from its CANONICALIZED analyzed plan —
md5 of the expression-id-normalized plan string plus the schema JSON
(the full-width form of `DataFrame.semanticHash`: stable across
sessions for the same logical plan, insensitive to alias/ordering
noise the way `sameSemantics` is, without the 32-bit birthday-collision
ceiling). A later run that builds the same plan gets a
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


def _plan_key(df: DataFrame) -> str:
    """Full-width semantic key: md5 of the CANONICALIZED analyzed plan
    (expression ids normalized — the string `semanticHash` hashes)
    plus the schema JSON. `semanticHash` alone is a 32-bit int, which
    makes silent birthday collisions likely around 10^4-10^5 distinct
    plans — at which point two different queries would serve each
    other's parquet. 128 bits + the schema component puts collision
    odds past any real workload."""
    canon = df._jdf.queryExecution().analyzed().canonicalized().toString()
    import hashlib

    return hashlib.md5((canon + df.schema.json()).encode()).hexdigest()[:16]


def cached(df: DataFrame, cache_dir: str, salt: str = "") -> DataFrame:
    """Materialize-once: returns a parquet-backed DataFrame with the
    same rows as ``df``, computing and writing only on first call for
    this (plan, salt)."""
    key = _plan_key(df) + (f"_{salt}" if salt else "")
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
    key = _plan_key(df) + (f"_{salt}" if salt else "")
    return os.path.exists(os.path.join(cache_dir, key, "_SUCCESS"))
