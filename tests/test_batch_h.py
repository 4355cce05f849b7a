"""Batch tests: item-item CF ranking monotonicity + replay,
burstiness statistics replay."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import relational, timeops
from parquet_to_csv_spark.sources.tables import load_table


def test_item_item_cosine_replay(spark, sf_dir):
    rows = relational.item_item_cosine_topk(spark, sf_dir).collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict[int, set] = {}
    item: dict[int, int] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    for parts in baskets.values():
        for p in parts:
            item[p] = item.get(p, 0) + 1
    for r in rows:
        c_ab = sum(
            1 for parts in baskets.values() if r.item in parts and r.neighbor in parts
        )
        assert r.c_ab == c_ab
        assert r.cos_sq_ppm == c_ab * c_ab * 1_000_000 // (item[r.item] * item[r.neighbor])
        # ppm-of-cos² stays a genuine cosine bound
        assert 0 < r.cos_sq_ppm <= 1_000_000
    # per-item ranks contiguous from 1, at most k
    by_item: dict[int, list] = {}
    for r in rows:
        by_item.setdefault(r.item, []).append(r.rnk)
    for rnks in by_item.values():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= 3


def test_burstiness_replay(spark, sf_dir):
    rows = {r.user_id: r for r in timeops.interarrival_burstiness(spark, sf_dir).collect()}
    p = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .select("user_id", F.expr("ts div 1000").alias("us"), "event_id")
        .collect()
    )
    per: dict[int, list] = {}
    for r in p:
        per.setdefault(r.user_id, []).append((r.us, r.event_id))
    for uid, es in per.items():
        es.sort()
        gaps = [(b[0] - a[0]) // 1_000_000 for a, b in zip(es, es[1:])]
        if len(gaps) < 2:
            assert uid not in rows
            continue
        r = rows[uid]
        n, s1, s2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        assert (r.n_gaps, r.mean_gap_s) == (n, s1 // n)
        sd = math.sqrt((n * s2 - s1 * s1) / (n * n))
        mean = s1 / n
        assert abs(r.sd_gap_s - sd) < 1e-3 + 1e-9
        assert abs(r.burstiness - (sd - mean) / (sd + mean)) < 1e-6 + 1e-9
        assert -1.0 <= r.burstiness <= 1.0
