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
