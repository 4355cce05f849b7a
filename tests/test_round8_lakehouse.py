"""Round-8 lakehouse fixes: the ref-head CAS (commit_to_ref /
fast_forward lost-update race, round-8 ADVICE item 1) and the
commit_partitioned partition-tuple recovery hardening (item 2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import parquet_to_csv_spark.sources.layout as L


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


# --- ref-head CAS (ADVICE: commit_to_ref lost-update race) ----------------


def test_ref_commit_race_rebase_keeps_both(spark, tmp_path, monkeypatch):
    """Two concurrent commit_to_ref on the same ref: the loser's CAS
    fails, it rebases on the racer's head and recommits — BOTH commits'
    rows are present at the final head (mirrors
    test_tx_write_write_conflict_raises, but here the contract is
    rebase-and-land, not raise)."""
    t = str(tmp_path / "tbl")
    L.commit_version(spark, t, _df(spark, 0, 3))
    L.create_ref(t, "main")
    orig = L.commit_version
    state = {"fired": False}

    def sneaky(spark_, tdir, df, **kw):
        v = orig(spark_, tdir, df, **kw)
        if not state["fired"]:
            state["fired"] = True
            # a racer publishes on the SAME ref between our data commit
            # and our head advance
            L.commit_to_ref(spark_, t, "main", _df(spark_, 50, 52))
        return v

    monkeypatch.setattr(L, "commit_version", sneaky)
    L.commit_to_ref(spark, t, "main", _df(spark, 3, 6))
    assert state["fired"]
    got = sorted(r["k"] for r in L.read_ref(spark, t, "main").collect())
    # pre-fix this was [0,1,2,3,4,5]: the racer's 50,51 silently dropped
    assert got == [0, 1, 2, 3, 4, 5, 50, 51]


def test_ref_fast_forward_race_revalidates(spark, tmp_path, monkeypatch):
    """fast_forward re-validates the git rule if the target head moved
    between the ancestry check and the advance: a divergent racer turns
    the FF into a loud non-fast-forward error, never a clobber."""
    t = str(tmp_path / "tbl")
    L.commit_version(spark, t, _df(spark, 0, 3))
    L.create_ref(t, "main")
    L.create_ref(t, "exp", from_ref="main")
    L.commit_to_ref(spark, t, "exp", _df(spark, 3, 5))
    main_rows_pre = sorted(
        r["k"] for r in L.read_ref(spark, t, "main").collect()
    )

    orig_advance = L._advance_ref
    state = {"fired": False}

    def sneaky(table_dir, name, version, ancestry, **kw):
        if name == "main" and not state["fired"]:
            state["fired"] = True
            # a racer diverges main AFTER fast_forward validated ancestry
            L.commit_to_ref(spark, t, "main", _df(spark, 90, 92))
        return orig_advance(table_dir, name, version, ancestry, **kw)

    monkeypatch.setattr(L, "_advance_ref", sneaky)
    with pytest.raises(ValueError, match="non-fast-forward"):
        L.fast_forward(t, "main", "exp")
    assert state["fired"]
    # the racer's publish survived; nothing was clobbered
    got = sorted(r["k"] for r in L.read_ref(spark, t, "main").collect())
    assert got == main_rows_pre + [90, 91]


def test_create_ref_duplicate_conflicts(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_version(spark, t, _df(spark, 0, 3))
    L.create_ref(t, "main")
    with pytest.raises(RuntimeError, match="moved"):
        L.create_ref(t, "main")


# --- commit_partitioned up-front transform validation ----------------------


def test_commit_partitioned_rejects_null_transform(spark, tmp_path):
    """A transform that yields NULL must fail BEFORE any data file is
    written (pre-fix: int('__HIVE_DEFAULT_PARTITION__') blew up after
    the write, stranding orphans)."""
    import os

    t = str(tmp_path / "pt")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 8, F.col("id") % 3).alias("g"),
    )
    with pytest.raises(ValueError, match="NULL"):
        L.commit_partitioned(spark, t, df, [("pg", F.col("g"))])
    assert not os.path.exists(os.path.join(t, "data"))  # no orphans


def test_commit_partitioned_rejects_non_integer_transform(spark, tmp_path):
    import os

    t = str(tmp_path / "pt")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("s")
    )
    with pytest.raises(ValueError, match="integer-typed"):
        L.commit_partitioned(spark, t, df, [("ps", F.col("s"))])
    assert not os.path.exists(os.path.join(t, "data"))


# --- two-level manifests: commit bytes are proportional to files touched ----


def _meta_bytes(t):
    import glob
    import os

    return sum(
        os.path.getsize(p)
        for pat in ("manifests/v*.json", "segments/s-*.json")
        for p in glob.glob(os.path.join(t, pat))
    )


def test_commit_metadata_cost_is_o_files_touched(spark, tmp_path):
    """Round-8 manifest redesign contract: appending ONE file to a
    table writes metadata ∝ files touched, NOT ∝ table size. A table
    with 20x the live files must not pay materially more per-append
    metadata than a small one (pre-redesign the big table's manifest
    re-serialized every live path: ~20x)."""
    small = str(tmp_path / "small")
    big = str(tmp_path / "big")
    L.commit_version(spark, small, _df(spark, 0, 100).repartition(10))
    for i in range(3):
        L.commit_version(
            spark, big,
            _df(spark, i * 1000, (i + 1) * 1000).repartition(64),
        )
    assert len(L.json_manifest_files(big, 2)) >= 150

    def append_cost(t):
        before = _meta_bytes(t)
        L.commit_version(spark, t, _df(spark, 9000, 9010).repartition(1))
        return _meta_bytes(t) - before

    c_small, c_big = append_cost(small), append_cost(big)
    # pre-redesign this ratio tracked the live-file ratio (~20x); the
    # manifest list still grows by one ENTRY per commit, so allow the
    # small constant factor, nothing like O(files)
    assert c_big < 4 * c_small, (c_small, c_big)


def test_segment_stats_embedded_and_pruning_uses_them(spark, tmp_path):
    """Segments embed per-file min/max at write; snapshot_file_stats
    serves them without footer reads and pruned_snapshot_read skips
    whole segments via manifest-list rollup bounds."""
    import json
    import os

    t = str(tmp_path / "tbl")
    L.commit_version(spark, t, _df(spark, 0, 100).repartition(2))
    L.commit_version(spark, t, _df(spark, 1000, 1100).repartition(2))
    man = json.load(open(os.path.join(t, "manifests", "v1.json")))
    assert [e["kind"] for e in man["segments"]] == ["data", "data"]
    # rollup bounds on the manifest-list entries
    assert man["segments"][0]["stats"]["k"] == [0, 99]
    assert man["segments"][1]["stats"]["k"] == [1000, 1099]
    assert man["segments"][1]["n_rows"] == 100
    stats = L.snapshot_file_stats(t, "k")
    assert all(lo is not None for lo, _ in stats.values())
    df, opened, total = L.pruned_snapshot_read(spark, t, "k", 1050, 1060)
    assert total == 4 and opened <= 2
    assert df.count() == 11


def test_vacuum_reclaims_unreferenced_segments(spark, tmp_path):
    import glob
    import os

    t = str(tmp_path / "tbl")
    L.commit_version(spark, t, _df(spark, 0, 50))
    L.commit_version(spark, t, _df(spark, 50, 90), mode="overwrite")
    n_segs_pre = len(glob.glob(os.path.join(t, "segments", "s-*.json")))
    assert n_segs_pre == 2
    L.vacuum(t, keep_versions=1, grace_seconds=0)
    survivors = glob.glob(os.path.join(t, "segments", "s-*.json"))
    assert len(survivors) == 1
    # the surviving segment is exactly v1's
    assert L.read_version(spark, t, 1).count() == 40


def test_hidden_partition_segment_level_pruning(spark, tmp_path):
    """Two commit_partitioned appends with disjoint transform ranges →
    two segments whose manifest-list pstats rollups are disjoint; a
    range predicate on one side must prune the OTHER segment without
    opening its segment JSON (pinned via the pstats fields) and still
    return exactly the matching files/rows."""
    import json
    import os

    t = str(tmp_path / "pt")
    df1 = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )
    df2 = spark.range(100, 140).select(
        F.col("id").alias("k"), (F.col("id") % 4 + 10).alias("g")
    )
    L.commit_partitioned(spark, t, df1, [("pg", F.col("g"))])
    L.commit_partitioned(spark, t, df2, [("pg", F.col("g"))], mode="append")
    man = json.load(open(os.path.join(t, "manifests", "v1.json")))
    assert [e["pstats"]["pg"] for e in man["segments"]] == [[0, 3], [10, 13]]
    df, scanned, total = L.read_hidden_partitioned(spark, t, {"pg": (10, 11)})
    assert scanned < total
    got = sorted(r["k"] for r in df.collect())
    assert got == [k for k in range(100, 140) if k % 4 in (0, 1)]


# --- stateful property test: random op sequences vs a Python model ---------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_snapshot_store_random_op_sequences(spark, data):
    """Random append/overwrite/delete/optimize/restore sequences over
    the two-level store: every committed version must read back exactly
    the Python model's state for that version (multiset equality), and
    vacuum at the end must not disturb the latest read."""
    import itertools
    import tempfile

    t = tempfile.mkdtemp(prefix="prop_store_") + "/tbl"
    ks = itertools.count()

    def fresh_rows(m):
        return [(next(ks), None) for _ in range(m)]

    def mk_df(rows):
        return spark.createDataFrame(
            [(k, k % 7) for k, _ in rows], "k long, g long"
        )

    state: list[int] = []       # live ks
    history: list[list[int]] = []  # per committed version

    # v0 seed
    seed = [k for k, _ in fresh_rows(data.draw(st.integers(3, 8)))]
    L.commit_version(spark, t, mk_df([(k, None) for k in seed]))
    state = list(seed)
    history.append(list(state))

    n_ops = data.draw(st.integers(2, 5))
    for _ in range(n_ops):
        op = data.draw(
            st.sampled_from(["append", "overwrite", "delete", "optimize", "restore"])
        )
        if op == "append":
            rows = [k for k, _ in fresh_rows(data.draw(st.integers(1, 6)))]
            L.commit_version(spark, t, mk_df([(k, None) for k in rows]))
            state = state + rows
        elif op == "overwrite":
            rows = [k for k, _ in fresh_rows(data.draw(st.integers(1, 6)))]
            L.commit_version(
                spark, t, mk_df([(k, None) for k in rows]), mode="overwrite"
            )
            state = rows
        elif op == "delete":
            g = data.draw(st.integers(0, 6))
            if not any(k % 7 == g for k in state):
                # empty delete vectors are a no-op shape the store
                # rejects upstream; draw a live g when one exists
                if state:
                    g = state[0] % 7
                else:
                    continue
            L.commit_deletes(spark, t, f"g = {g}")
            state = [k for k in state if k % 7 != g]
        elif op == "optimize":
            L.optimize_table(spark, t)
        elif op == "restore":
            v = data.draw(st.integers(0, len(history) - 1))
            L.restore_table(spark, t, v)
            state = list(history[v])
        history.append(list(state))

    assert L.latest_version(t) == len(history) - 1
    # every version reads back its model state exactly
    for v, want in enumerate(history):
        got = sorted(r["k"] for r in L.read_version(spark, t, v).collect())
        assert got == sorted(want), (v, got, want)
    # vacuum keeps the latest version intact
    L.vacuum(t, keep_versions=1, grace_seconds=0)
    got = sorted(r["k"] for r in L.read_version(spark, t).collect())
    assert got == sorted(history[-1])


# --- metadata-only segment compaction (rewriteManifests) --------------------


def test_rewrite_segments_is_metadata_only_and_bounds_list(spark, tmp_path):
    """10 appends → 10 manifest-list entries; rewrite_segments merges
    them into ONE without moving a data byte (same file set), carries
    per-file stats/rows (pruning still skips), keeps delete vectors
    live, and leaves time travel intact. A second call is a no-op."""
    import glob
    import json
    import os

    t = str(tmp_path / "tbl")
    for i in range(10):
        L.commit_version(
            spark, t,
            spark.range(i * 100, (i + 1) * 100).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("g")
            ),
        )
    L.commit_deletes(spark, t, "g = 3")
    pre_files = set(L.json_manifest_files(t, 10))
    pre_rows = sorted(r["k"] for r in L.read_version(spark, t).collect())
    man_pre = json.load(open(os.path.join(t, "manifests", "v10.json")))
    assert len(man_pre["segments"]) == 10

    v = L.rewrite_segments(t, max_entries=4)
    assert v == 11
    man = json.load(open(os.path.join(t, "manifests", "v11.json")))
    assert len(man["segments"]) == 1
    assert man["mode"] == "rewrite_manifests"
    # same data files — zero bytes moved
    assert set(L.json_manifest_files(t, 11)) == pre_files
    # rows identical, delete vector still applied
    got = sorted(r["k"] for r in L.read_version(spark, t).collect())
    assert got == pre_rows and not any(k % 7 == 3 for k in got)
    # merged entry carries rollup stats; stats pruning still works
    assert man["segments"][0]["stats"]["k"] == [0, 999]
    df, opened, total = L.pruned_snapshot_read(spark, t, "k", 450, 460)
    assert opened < total
    # time travel to pre-rewrite versions intact
    assert L.read_version(spark, t, 5).count() == 600
    # under budget → no-op
    assert L.rewrite_segments(t, max_entries=4) == 11


def test_rewrite_segments_preserves_partition_pruning(spark, tmp_path):
    import json
    import os

    t = str(tmp_path / "pt")
    for lo in (0, 100):
        L.commit_partitioned(
            spark, t,
            spark.range(lo, lo + 40).select(
                F.col("id").alias("k"),
                (F.col("id") % 4 + (10 if lo else 0)).alias("g"),
            ),
            [("pg", F.col("g"))],
            mode="append" if lo else "overwrite",
        )
    v = L.rewrite_segments(t, max_entries=1)
    man = json.load(open(os.path.join(t, "manifests", f"v{v}.json")))
    assert len(man["segments"]) == 1
    assert man["segments"][0]["pstats"]["pg"] == [0, 13]
    df, scanned, total = L.read_hidden_partitioned(spark, t, {"pg": (10, 11)})
    assert scanned < total
    got = sorted(r["k"] for r in df.collect())
    assert got == [k for k in range(100, 140) if k % 4 in (0, 1)]


# --- round-8 self-review regressions ---------------------------------------


def test_delta_scan_correct_across_rewrite_manifests(spark, tmp_path):
    """A rewrite_manifests commit inside the range repackages the SAME
    files under a new segment path; the delta must still be exactly
    the appended rows (segment-path fast diff would have re-emitted
    every pre-rewrite row as new)."""
    t = str(tmp_path / "tbl")
    L.commit_version(spark, t, _df(spark, 0, 5))     # v0
    L.commit_version(spark, t, _df(spark, 5, 8))     # v1
    assert L.rewrite_segments(t, max_entries=1) == 2  # v2: metadata only
    L.commit_version(spark, t, _df(spark, 8, 11))    # v3
    got = sorted(r["k"] for r in L.read_version_delta(spark, t, 1, 3).collect())
    assert got == [8, 9, 10]
    # lineage-replacing commits in range still reject loudly
    L.optimize_table(spark, t)                        # v4
    with pytest.raises(ValueError, match="optimize"):
        L.read_version_delta(spark, t, 3, L.latest_version(t))


def test_segment_rollup_requires_full_column_coverage(spark, tmp_path):
    """A column whose bounds only SOME files carry must not appear in
    the segment-entry rollup — a partial rollup would let level-1
    pruning skip the bounds-less file (silent missing rows)."""
    import json
    import os

    t = str(tmp_path / "tbl")
    L.commit_version(spark, t, _df(spark, 0, 100).repartition(2))
    man = json.load(open(os.path.join(t, "manifests", "v0.json")))
    entry = man["segments"][0]
    seg = json.load(open(entry["path"]))
    # sanity: full coverage -> rollup present
    assert entry["stats"]["k"] == [0, 99]
    # simulate a file with unrecordable bounds: strip one file's stats
    # and re-wrap through _write_segment's accounting by direct check
    # of the invariant on a hand-built partial-stats segment
    import parquet_to_csv_spark.sources.layout as layout_mod

    files = seg["files"]
    orig = layout_mod._file_footer_stats
    try:
        def flaky(path):
            if path == files[0]:
                raise OSError("transient footer read failure")
            return orig(path)

        layout_mod._file_footer_stats = flaky
        e2 = L._write_segment(t, files)
    finally:
        layout_mod._file_footer_stats = orig
    assert "stats" not in e2 or "k" not in e2.get("stats", {})
    # and pruning through a manifest carrying that entry stays
    # conservative: the bounds-less file is opened, rows intact
    man2 = {
        "version": 99, "mode": "append", "segments": [e2],
        "schema": man["schema"],
    }
    with open(os.path.join(t, "manifests", "v1.json"), "w") as f:
        json.dump(man2, f)
    df, opened, total = L.pruned_snapshot_read(spark, t, "k", 0, 5, version=1)
    assert opened >= 1 and df.count() == 6


# --- true-thread concurrency stress (no monkeypatch injection) --------------


def test_concurrent_commits_all_land(spark, tmp_path):
    """4 real threads x 3 appends each against one table: optimistic
    concurrency must land ALL 12 commits (contiguous versions, no
    losses) and the final snapshot must contain every writer's rows
    exactly once."""
    import threading

    t = str(tmp_path / "tbl")
    L.commit_version(spark, t, _df(spark, 0, 1))  # v0 seed

    errors = []

    def writer(w):
        try:
            for j in range(3):
                lo = 1000 * (w + 1) + 10 * j
                L.commit_version(
                    spark, t, _df(spark, lo, lo + 5), max_attempts=20
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert L.latest_version(t) == 12  # v0 + 12 appends, none lost
    got = sorted(r["k"] for r in L.read_version(spark, t).collect())
    want = [0] + sorted(
        k
        for w in range(4)
        for j in range(3)
        for k in range(1000 * (w + 1) + 10 * j, 1000 * (w + 1) + 10 * j + 5)
    )
    assert got == want


def test_concurrent_ref_commits_all_land(spark, tmp_path):
    """3 real threads publishing on the SAME ref concurrently: the CAS
    + rebase path must land every commit's rows at the final head."""
    import threading

    t = str(tmp_path / "tbl")
    L.commit_version(spark, t, _df(spark, 0, 1))
    L.create_ref(t, "main")
    errors = []

    def writer(w):
        try:
            lo = 100 * (w + 1)
            L.commit_to_ref(
                spark, t, "main", _df(spark, lo, lo + 3), max_attempts=20
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    got = sorted(r["k"] for r in L.read_ref(spark, t, "main").collect())
    want = [0] + sorted(
        k for w in range(3) for k in range(100 * (w + 1), 100 * (w + 1) + 3)
    )
    assert got == want


def test_concurrent_merges_all_land(spark, tmp_path):
    """3 real threads MERGE disjoint key ranges concurrently: the
    manifest retry loop recomputes each loser's delete vector against
    the racer's snapshot, so all upserts land and no update is lost."""
    import threading

    t = str(tmp_path / "tbl")
    base = spark.range(0, 30).select(
        F.col("id").alias("k"), F.lit(0).alias("v")
    )
    L.commit_version(spark, t, base)
    errors = []

    def writer(w):
        try:
            lo = 10 * w
            changes = spark.range(lo, lo + 10).select(
                F.col("id").alias("k"), F.lit(w + 1).alias("v")
            )
            L.merge_into(spark, t, changes, "k", max_attempts=20)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    rows = {r["k"]: r["v"] for r in L.read_version(spark, t).collect()}
    assert len(rows) == 30
    assert all(rows[k] == k // 10 + 1 for k in range(30))
