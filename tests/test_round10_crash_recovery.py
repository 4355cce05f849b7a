"""Round-10 verdict item 6: crash-recovery sweep on the commit seam.

Round 9 emulated LOST RACES; this emulates CRASHES — a writer dying at
each stage of the claim -> data write -> segment write -> manifest
publish protocol, under BOTH commit backends (POSIX and the
conditional-PUT object-store double). Invariants proved at every crash
point:

  1. the table still reads at the prior version (atomicity: nothing
     published means nothing visible);
  2. vacuum (past grace; grace_seconds=0 here with no live writers)
     reclaims exactly the crash debris — orphan data files,
     unreferenced segment manifests, stale claim markers — and nothing
     referenced;
  3. a retried commit lands exactly-once (old rows + new rows, no
     duplicates, no manual cleanup needed first).

Crash points:
  A  post-claim     claimed a writer dir, died before writing data
  B  post-data      data parquet written, died before the segment
  C  post-segment   segment manifest written, died before the
                    manifest-list publish (the commit point)
  D  mid-rewrite    the commit landed, the auto metadata-fold wrote
                    its merged segment and died before publishing —
                    the caller must still see SUCCESS (round-10
                    ADVICE: the append already committed) and the
                    debris must vacuum away
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

import parquet_to_csv_spark.sources.layout as L


class CrashError(RuntimeError):
    """The injected 'process died here'."""


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


BACKENDS = {
    "posix": L.PosixCommitBackend,
    "condput": L.ConditionalPutCommitBackend,
}


def _all_referenced_files(t: str) -> set[str]:
    refs: set[str] = set()
    for p in glob.glob(os.path.join(t, "manifests", "v*.json")):
        v = int(os.path.basename(p)[1:-5])
        refs.update(L._man_files(t, L._load_manifest(t, v)))
    return refs


def _assert_clean_after_vacuum(t: str) -> None:
    """Post-vacuum: disk holds exactly the referenced data files, every
    referenced file exists, no unreferenced segments, no stale markers
    of file-less dirs."""
    L.vacuum(t, keep_versions=100, grace_seconds=0)
    refs = _all_referenced_files(t)
    on_disk = set(glob.glob(os.path.join(t, "data", "v*", "*.parquet")))
    assert on_disk == refs
    kept_segs = {
        e["path"]
        for p in glob.glob(os.path.join(t, "manifests", "v*.json"))
        for key in ("segments", "delete_segments")
        for e in __import__("json").load(open(p)).get(key, [])
    }
    assert set(glob.glob(os.path.join(t, "segments", "s-*.json"))) <= kept_segs
    for marker in glob.glob(os.path.join(t, "data", "*.__claim__")):
        d = marker[: -len(".__claim__")]
        assert os.path.isdir(d) and any(
            f.endswith(".parquet") for f in os.listdir(d)
        ), f"stale marker survived vacuum: {marker}"


def _crash_then_recover(spark, tmp_path, backend_name, crash_patch, monkeypatch):
    """Shared driver: seed v0, inject, crash a v1 commit, verify the
    three invariants, then retry clean."""
    t = str(tmp_path / "tbl")
    with L.commit_backend(BACKENDS[backend_name]()):
        L.commit_version(spark, t, _df(spark, 0, 10))  # v0
        crash_patch(monkeypatch)
        with pytest.raises(CrashError):
            L.commit_version(spark, t, _df(spark, 10, 15))
        monkeypatch.undo()
        # invariant 1: prior snapshot intact, nothing half-published
        assert L.latest_version(t) == 0
        got = sorted(r["k"] for r in L.read_version(spark, t).collect())
        assert got == list(range(10))
        # invariant 2: vacuum reclaims exactly the debris
        _assert_clean_after_vacuum(t)
        assert L.latest_version(t) == 0
        got = sorted(r["k"] for r in L.read_version(spark, t).collect())
        assert got == list(range(10))
        # invariant 3: the retried commit lands exactly-once
        v = L.commit_version(spark, t, _df(spark, 10, 15))
        assert v == 1
        got = sorted(r["k"] for r in L.read_version(spark, t).collect())
        assert got == list(range(15))
        _assert_clean_after_vacuum(t)


@pytest.mark.parametrize("backend_name", list(BACKENDS))
def test_crash_post_claim(spark, tmp_path, backend_name, monkeypatch):
    """Point A: died right after claiming the writer directory."""
    real = L._claim_data_dir

    def patch(mp):
        def claim_then_die(table_dir, prefix):
            real(table_dir, prefix)
            raise CrashError("died after claim, before data write")

        mp.setattr(L, "_claim_data_dir", claim_then_die)

    _crash_then_recover(spark, tmp_path, backend_name, patch, monkeypatch)


@pytest.mark.parametrize("backend_name", list(BACKENDS))
def test_crash_post_data(spark, tmp_path, backend_name, monkeypatch):
    """Point B: data parquet on disk, died before the segment write."""

    def patch(mp):
        def die(*a, **kw):
            raise CrashError("died after data write, before segment")

        mp.setattr(L, "_write_segment", die)

    _crash_then_recover(spark, tmp_path, backend_name, patch, monkeypatch)


@pytest.mark.parametrize("backend_name", list(BACKENDS))
def test_crash_post_segment(spark, tmp_path, backend_name, monkeypatch):
    """Point C: data + segment written, died AT the commit point
    (before the manifest-list put-if-absent)."""

    def patch(mp):
        def die(path, obj):
            raise CrashError("died before manifest publish")

        mp.setattr(L, "_put_if_absent", die)

    _crash_then_recover(spark, tmp_path, backend_name, patch, monkeypatch)


@pytest.mark.parametrize("backend_name", list(BACKENDS))
def test_crash_mid_rewrite_after_commit(
    spark, tmp_path, backend_name, monkeypatch
):
    """Point D: the append PUBLISHED, then the auto metadata-fold wrote
    its merged segment and died before publishing the folded manifest.
    The caller must still get its committed version back (the round-10
    ADVICE contract), the fold's debris must vacuum away, and the next
    fold must land."""
    t = str(tmp_path / "tbl")
    real_put = L._put_if_absent
    with L.commit_backend(BACKENDS[backend_name]()):
        L.commit_version(spark, t, _df(spark, 0, 10))  # v0

        def die_on_fold(path, obj):
            if obj.get("mode") == "rewrite_manifests":
                raise CrashError("died publishing the folded manifest")
            return real_put(path, obj)

        monkeypatch.setattr(L, "_put_if_absent", die_on_fold)
        spark.conf.set("spark.graft.manifest.maxEntries", "1")
        try:
            # 2 data segments > maxEntries=1 -> the fold fires and dies
            v = L.commit_version(spark, t, _df(spark, 10, 15))
        finally:
            spark.conf.unset("spark.graft.manifest.maxEntries")
            monkeypatch.undo()
        assert v == 1  # the append's success is never forfeited
        assert L.latest_version(t) == 1
        got = sorted(r["k"] for r in L.read_version(spark, t).collect())
        assert got == list(range(15))
        # the fold's merged segment is unreferenced debris -> reclaimed
        segs_pre = set(glob.glob(os.path.join(t, "segments", "s-*.json")))
        _assert_clean_after_vacuum(t)
        segs_post = set(glob.glob(os.path.join(t, "segments", "s-*.json")))
        assert len(segs_pre - segs_post) == 1  # exactly the dead fold's
        # the retried fold (next commit's policy, run explicitly) lands
        folded = L.rewrite_segments(t, max_entries=1)
        assert folded == 2
        man = L._load_manifest(t, folded)
        assert len(L._man_data_segments(t, man)) == 1
        got = sorted(r["k"] for r in L.read_version(spark, t).collect())
        assert got == list(range(15))


@pytest.mark.parametrize("backend_name", list(BACKENDS))
def test_crash_point_c_leaves_readable_debris_window(
    spark, tmp_path, backend_name, monkeypatch
):
    """Between the crash and the vacuum, the table must ALREADY read
    correctly with the debris still on disk (readers resolve manifests,
    never directory listings) — recovery needs no quiesce window."""
    t = str(tmp_path / "tbl")
    with L.commit_backend(BACKENDS[backend_name]()):
        L.commit_version(spark, t, _df(spark, 0, 10))

        def die(path, obj):
            raise CrashError("died before manifest publish")

        monkeypatch.setattr(L, "_put_if_absent", die)
        with pytest.raises(CrashError):
            L.commit_version(spark, t, _df(spark, 10, 15))
        monkeypatch.undo()
        # debris IS on disk right now
        assert L.orphan_files(t, keep_versions=100)
        # ... and reads are untouched by it
        got = sorted(r["k"] for r in L.read_version(spark, t).collect())
        assert got == list(range(10))
