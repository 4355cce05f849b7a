"""Round-9 lakehouse hardening: bounded-LRU segment/legacy-wrap caches
(verdict item 4 + ADVICE cache-safety), vacuum grace period, pluggable
atomic-commit backend, auto manifest compaction, multi-process commit
stress, executor-retry idempotence."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

import parquet_to_csv_spark.sources.layout as L


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


# --- bounded LRU caches (verdict item 4) -----------------------------------


def test_segment_cache_lru_no_full_flush():
    """Insert #8193 must evict exactly the oldest entry, not clear-all
    (the pre-round-9 behavior re-read every cached segment at once)."""
    with L._CACHE_LOCK:
        saved = dict(L._SEGMENT_CACHE)
        L._SEGMENT_CACHE.clear()
    try:
        for i in range(L._SEGMENT_CACHE_MAX + 1):
            L._seg_cache_put(f"/fake/seg-{i}.json", {"files": []})
        assert len(L._SEGMENT_CACHE) == L._SEGMENT_CACHE_MAX
        assert "/fake/seg-0.json" not in L._SEGMENT_CACHE  # oldest out
        # survivors prove it was LRU eviction, not a flush
        assert "/fake/seg-1.json" in L._SEGMENT_CACHE
        assert f"/fake/seg-{L._SEGMENT_CACHE_MAX}.json" in L._SEGMENT_CACHE
    finally:
        with L._CACHE_LOCK:
            L._SEGMENT_CACHE.clear()
            L._SEGMENT_CACHE.update(saved)


def test_segment_cache_get_refreshes_recency(tmp_path, monkeypatch):
    """_seg_load touches move an entry to MRU: with capacity 3, loading
    A,B,C then re-reading A then loading D must evict B, not A."""
    monkeypatch.setattr(L, "_SEGMENT_CACHE_MAX", 3)
    with L._CACHE_LOCK:
        saved = dict(L._SEGMENT_CACHE)
        L._SEGMENT_CACHE.clear()
    try:
        paths = []
        for name in "abcd":
            p = str(tmp_path / f"s-{name}.json")
            json.dump({"files": [name]}, open(p, "w"))
            paths.append(p)
        a, b, c, d = paths
        for p in (a, b, c):
            L._seg_load({"path": p})
        L._seg_load({"path": a})  # refresh A
        L._seg_load({"path": d})  # evicts LRU == B
        assert a in L._SEGMENT_CACHE and d in L._SEGMENT_CACHE
        assert b not in L._SEGMENT_CACHE
        assert c in L._SEGMENT_CACHE
    finally:
        with L._CACHE_LOCK:
            L._SEGMENT_CACHE.clear()
            L._SEGMENT_CACHE.update(saved)


def test_legacy_wrap_cache_bounded():
    with L._CACHE_LOCK:
        saved = dict(L._LEGACY_WRAP_CACHE)
        L._LEGACY_WRAP_CACHE.clear()
    try:
        for i in range(L._LEGACY_WRAP_CACHE_MAX + 5):
            L._legacy_wrap_put(("t", "data", i), [{"path": f"/x{i}"}])
        assert len(L._LEGACY_WRAP_CACHE) == L._LEGACY_WRAP_CACHE_MAX
        assert ("t", "data", 0) not in L._LEGACY_WRAP_CACHE
        assert ("t", "data", 5) in L._LEGACY_WRAP_CACHE
    finally:
        with L._CACHE_LOCK:
            L._LEGACY_WRAP_CACHE.clear()
            L._LEGACY_WRAP_CACHE.update(saved)


def test_vacuum_evicts_reclaimed_segments_from_cache(spark, tmp_path):
    """Vacuumed segment paths must leave the process-global cache (a
    stale positive entry would serve a deleted segment's content)."""
    t = str(tmp_path / "tbl")
    L.commit_version(spark, t, _df(spark, 0, 50))
    L.commit_version(spark, t, _df(spark, 50, 90), mode="overwrite")
    pre = set(glob.glob(os.path.join(t, "segments", "s-*.json")))
    assert pre <= set(L._SEGMENT_CACHE)  # both segments were cached
    L.vacuum(t, keep_versions=1, grace_seconds=0)
    survivors = set(glob.glob(os.path.join(t, "segments", "s-*.json")))
    reclaimed = pre - survivors
    assert reclaimed
    assert not reclaimed & set(L._SEGMENT_CACHE)
    assert survivors <= set(L._SEGMENT_CACHE)


def test_vacuum_grace_period_spares_fresh_artifacts(spark, tmp_path):
    """ADVICE (round 9): with the default grace window, vacuum must NOT
    reclaim freshly written unreferenced data files / segments — they
    may belong to an in-flight commit that hasn't linked its manifest
    yet. grace_seconds=0 restores immediate reclaim."""
    t = str(tmp_path / "tbl")
    L.commit_version(spark, t, _df(spark, 0, 50))
    L.commit_version(spark, t, _df(spark, 50, 90), mode="overwrite")
    orphans = L.orphan_files(t, keep_versions=1)
    assert orphans  # v0's files are unreferenced at keep_versions=1
    segs_pre = set(glob.glob(os.path.join(t, "segments", "s-*.json")))
    # default grace: everything here is seconds old -> nothing reclaimed
    assert L.vacuum(t, keep_versions=1) == []
    assert set(glob.glob(os.path.join(t, "segments", "s-*.json"))) == segs_pre
    assert all(os.path.exists(p) for p in orphans)
    # aged-out artifacts (mtime pushed past the window) are reclaimed
    past = L._time.time() - 3600
    for p in orphans:
        os.utime(p, (past, past))
    for p in segs_pre:
        os.utime(p, (past, past))
    deleted = L.vacuum(t, keep_versions=1)
    assert sorted(deleted) == sorted(orphans)
    assert len(glob.glob(os.path.join(t, "segments", "s-*.json"))) == 1
