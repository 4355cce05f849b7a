"""Batch tests: sweep-line concurrency correctness + partition
invariance, HHI bounds and replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import relational, timeops
from parquet_to_csv_spark.sources.tables import load_table


def test_max_concurrency_matches_naive_sweep(spark, sf_dir):
    got = {
        r.hour_bucket: r.max_concurrent
        for r in timeops.max_concurrent_spans(spark, sf_dir).collect()
    }
    spans = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.expr("ts div 1000").alias("s"),
        (F.expr("ts div 1000") + F.floor(F.col("value") * 100 + 0.5) * 10).alias("e"),
    ).collect()
    pts = []
    for r in spans:
        pts.append((r.s, 1, r.event_id))
        pts.append((r.e, -1, r.event_id))
    pts.sort()
    run = 0
    best: dict[int, int] = {}
    for t, d, _ in pts:
        run += d
        h = t // 3_600_000_000
        best[h] = max(best.get(h, run), run)
    assert got == best


def test_max_concurrency_partition_invariant(spark, sf_dir):
    a = sorted(
        map(tuple, timeops.max_concurrent_spans(spark, sf_dir, n_parts=2).collect())
    )
    b = sorted(
        map(tuple, timeops.max_concurrent_spans(spark, sf_dir, n_parts=11).collect())
    )
    assert a == b


def test_hhi_bounds_and_replay(spark, sf_dir):
    rows = relational.nation_supplier_hhi(spark, sf_dir).collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_suppkey",
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
            ).alias("u4"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("u4").alias("rev"))
        .collect()
    )
    snat = {
        r.s_suppkey: r.s_nationkey
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    per_nat: dict[int, list[int]] = {}
    for r in li:
        per_nat.setdefault(snat[r.l_suppkey], []).append(r.rev)
    for r in rows:
        revs = per_nat[r.s_nationkey]
        tot = sum(revs)
        shares = [v * 1_000_000 // tot for v in revs]
        assert r.n_suppliers == len(revs)
        assert r.top_share_ppm == max(shares)
        assert r.hhi_ppm == sum(s * s for s in shares) // 1_000_000
        # HHI bounds: 1e6/n (perfect split) .. 1e6 (monopoly)
        assert 1_000_000 // len(revs) - 1 <= r.hhi_ppm <= 1_000_000
