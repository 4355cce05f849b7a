"""Round 11: metadata-path scale hardening (round-9 verdict, "What's
wrong" note 2 — the one remaining at-scale observation).

The snapshot store's driver-side metadata work must hold at ~10⁶ live
files: counts come from manifest-list ``n_files`` rollups (O(list),
zero segment JSONs opened), pruning walks segment-at-a-time (memory
bounded by keep-list + one segment), and the Py4J path handoff chunks
past ``spark.graft.read.pathChunk`` so no single command serializes a
million-string argument list. Equality of the chunked and unchunked
reads is pinned on real tables; the 10⁶-file behavior is pinned on a
synthetic two-level manifest (the files never need to exist — the
functions under test are pure metadata)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

import parquet_to_csv_spark.sources.layout as layout


@pytest.fixture()
def table(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("value")
    )
    layout.commit_version(spark, tdir, df.repartition(3))
    layout.commit_version(
        spark,
        tdir,
        spark.range(100, 200).select(
            F.col("id"), (F.col("id") * 2).alias("value")
        ).repartition(2),
    )
    return tdir


def test_n_files_rollup_opens_no_segments(spark, table, monkeypatch):
    man = layout._load_manifest(table, layout.latest_version(table))
    expect = len(layout._man_files(table, man))
    calls = []
    real = layout._seg_load
    monkeypatch.setattr(
        layout, "_seg_load", lambda e: calls.append(e) or real(e)
    )
    assert layout._man_n_files(table, man) == expect
    assert calls == []  # count came from list rollups alone


def test_iter_man_files_matches_list(spark, table):
    man = layout._load_manifest(table, layout.latest_version(table))
    assert list(layout._iter_man_files(table, man)) == layout._man_files(
        table, man
    )


def test_chunked_read_version_equals_unchunked(spark, table):
    base = sorted(
        tuple(r) for r in layout.read_version(spark, table).collect()
    )
    spark.conf.set("spark.graft.read.pathChunk", "2")
    try:
        chunked = sorted(
            tuple(r) for r in layout.read_version(spark, table).collect()
        )
    finally:
        spark.conf.unset("spark.graft.read.pathChunk")
    assert chunked == base and len(base) == 200


def test_chunked_skipped_scan_equals_unchunked(spark, table):
    df, opened, total = layout.pruned_snapshot_read(
        spark, table, "value", 100, 150
    )
    base = sorted(tuple(r) for r in df.collect())
    spark.conf.set("spark.graft.read.pathChunk", "1")
    try:
        df2, opened2, total2 = layout.pruned_snapshot_read(
            spark, table, "value", 100, 150
        )
        got = sorted(tuple(r) for r in df2.collect())
    finally:
        spark.conf.unset("spark.graft.read.pathChunk")
    assert got == base and (opened2, total2) == (opened, total)
    assert opened < total  # the skip actually happened


def test_chunked_read_with_schema_evolution(spark, tmp_path):
    tdir = str(tmp_path / "evo")
    layout.commit_version(
        spark, tdir, spark.range(10).select(F.col("id"))
    )
    layout.commit_version(
        spark,
        tdir,
        spark.range(10, 20).select(
            F.col("id"), F.lit("x").alias("tag")
        ),
        merge_schema=True,
    )
    base = sorted(
        tuple(r) for r in layout.read_version(spark, tdir).collect()
    )
    spark.conf.set("spark.graft.read.pathChunk", "1")
    try:
        chunked = sorted(
            tuple(r) for r in layout.read_version(spark, tdir).collect()
        )
    finally:
        spark.conf.unset("spark.graft.read.pathChunk")
    assert chunked == base and len(base) == 20
    # older files null-fill the evolved column in both paths
    assert {r[1] for r in base} == {None, "x"}


# --- synthetic 10⁶-file manifest: the at-scale metadata contract -------------


def _synthetic_manifest(n_segments: int, files_per_seg: int):
    """A two-level manifest whose segment s covers value range
    [1000*s, 1000*s + 999]; list entries carry the n_files and stats
    rollups exactly as _write_segment records them."""
    entries = []
    for s in range(n_segments):
        entries.append(
            {
                "path": f"/nonexistent/s-{s}.json",
                "kind": "data",
                "n_files": files_per_seg,
                "stats": {"value": [1000 * s, 1000 * s + 999]},
            }
        )
    return {"version": 1, "segments": entries}


def test_million_file_count_is_o_list(monkeypatch):
    man = _synthetic_manifest(10_000, 100)  # 1M live files
    monkeypatch.setattr(
        layout,
        "_seg_load",
        lambda e: (_ for _ in ()).throw(AssertionError("segment opened")),
    )
    t0 = time.perf_counter()
    assert layout._man_n_files("/tbl", man) == 1_000_000
    assert time.perf_counter() - t0 < 0.5  # O(list), not O(files)


def test_million_file_prune_opens_only_overlapping_segments(monkeypatch):
    man = _synthetic_manifest(10_000, 100)
    opened = []

    def fake_seg_load(e):
        opened.append(e["path"])
        s = int(e["path"].rsplit("-", 1)[1].split(".")[0])
        files = [f"/data/f-{s}-{i}.parquet" for i in range(100)]
        if s == 0:
            return {"files": files}  # no per-file bounds at all
        return {
            "files": files,
            "stats": {
                f: {"value": [1000 * s + 10 * i, 1000 * s + 10 * i + 9]}
                for i, f in enumerate(files)
            },
        }

    monkeypatch.setattr(layout, "_seg_load", fake_seg_load)
    t0 = time.perf_counter()
    keep = layout._pruned_files(man, "value", 5_000_000, 5_001_999)
    wall = time.perf_counter() - t0
    # band covers exactly segments 5000-5001 → 2 JSONs opened of 10 000
    assert len(opened) == 2
    assert len(keep) == 200
    assert wall < 1.0
    # a segment with no LIST rollup is opened, and its bounds-less
    # files are conservatively kept (E454's contract)
    man["segments"][0].pop("stats")
    opened.clear()
    keep = layout._pruned_files(man, "value", 5_000_000, 5_001_999)
    assert len(opened) == 3 and len(keep) == 300


def test_large_keep_list_chunks_py4j_handoff(spark, tmp_path):
    # many small files; chunk=16 → several relations unioned, same rows
    tdir = str(tmp_path / "many")
    layout.commit_version(spark, tdir, spark.range(640).repartition(64))
    man = layout._load_manifest(tdir, layout.latest_version(tdir))
    files = layout._man_files(tdir, man)
    assert len(files) > 32  # enough to force multiple chunks
    spark.conf.set("spark.graft.read.pathChunk", "16")
    try:
        df = layout._read_parquet_paths(spark, files)
        assert df.count() == 640
        # the union is scan-only: no exchange in the physical plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.conf.unset("spark.graft.read.pathChunk")


def test_claim_survives_the_entire_data_write(spark, tmp_path):
    """Round-11 race regression: a claimed data/v{N} directory must
    exist CONTINUOUSLY from claim_dir() through the data write —
    mode('overwrite')'s delete phase used to drop it mid-write,
    letting a concurrent claimant win the bare name and destroy the
    writer's staging. With the claim held, a spinner hammers
    claim_dir(bare) for the whole duration of the commit-path write;
    it must never win."""
    import threading

    tdir = str(tmp_path / "tbl")
    os.makedirs(os.path.join(tdir, "data"))
    data_dir = layout._claim_data_dir(tdir, "v1")
    assert data_dir.endswith("/data/v1")  # the bare name was free
    wins = []
    stop = threading.Event()

    def spinner():
        while not stop.is_set():
            if layout._COMMIT_BACKEND.claim_dir(data_dir):
                wins.append(True)  # claim stolen mid-write — the bug
                os.rmdir(data_dir)

    th = threading.Thread(target=spinner)
    th.start()
    try:
        # the exact write commit_version performs; 64 partitions
        # stretch it long enough for thousands of spinner probes
        spark.range(2000).repartition(64).write.mode("append").parquet(
            data_dir
        )
    finally:
        stop.set()
        th.join()
    assert wins == [], "bare-name claim was lost during the data write"
    files = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    assert files  # the write landed intact
