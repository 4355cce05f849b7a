"""Batch tests: outer stream-stream join parity, log-bucket quantile
guarantees, boilerplate reach, label-propagation convergence."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import dedup, sketch, text
from parquet_to_csv_spark.sources.tables import load_table
from parquet_to_csv_spark.streaming import stream


def test_left_join_drain_equals_batch(spark, sf_dir):
    """The drained outer join (matched + watermark-flushed unmatched)
    must equal the batch LEFT JOIN — including purchases with no click
    in the final watermark window (the sentinel-flush contract; a
    pushed-down sentinel filter silently breaks this, see docstring)."""
    got = stream.left_join_drain_query(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.expr("ts div 1000").alias("us")
    )
    p = [r for r in ev.collect() if r.event_type == "purchase"]
    clicks: dict[int, list] = {}
    for r in ev.collect():
        if r.event_type == "click":
            clicks.setdefault(r.user_id, []).append(r)
    expect = set()
    for r in p:
        ms = [
            c
            for c in clicks.get(r.user_id, [])
            if r.us - 3_600_000_000 <= c.us <= r.us
        ]
        if ms:
            for c in ms:
                expect.add((r.event_id, c.event_id))
        else:
            expect.add((r.event_id, None))
    assert {(r.purchase_id, r.click_id) for r in got} == expect
    # every purchase present; unmatched carry NULL click columns
    assert {r.purchase_id for r in got} == {r.event_id for r in p}
    assert any(r.click_id is None for r in got)


def test_logbucket_quantiles_error_bound(spark, sf_dir):
    rows = {r.q_ppm: r for r in sketch.logbucket_quantiles(spark, sf_dir).collect()}
    cents = sorted(
        r.c
        for r in load_table(spark, sf_dir, "orders")
        .select(F.floor(F.col("o_totalprice") * 100 + 0.5).alias("c"))
        .collect()
    )
    n = len(cents)
    for q_ppm, r in rows.items():
        true_q = cents[(q_ppm * n + 999_999) // 1_000_000 - 1]
        # lower bound never exceeds the true quantile, and the true
        # quantile sits inside the bucket (within one leading-digit width)
        assert r.est_lo_cents <= true_q
        width = 10 ** (r.digits - 1)
        assert true_q < r.est_lo_cents + width
        assert r.n_total == n


def test_boilerplate_counts_distinct_docs(spark, sf_dir):
    rows = text.boilerplate_ngrams(spark, sf_dir, n=6, k=10).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    top = rows[0]
    # recompute the top gram's reach independently
    got = docs.filter(
        F.col("text").contains(top.gram) | F.lower(F.col("text")).contains(top.gram)
    ).count()
    assert top.doc_count <= got  # contains() over-counts (substring), never under
    assert top.doc_share_ppm == top.doc_count * 1_000_000 // n_docs
    counts = [r.doc_count for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_label_propagation_communities(spark, sf_dir):
    labels = {
        r.doc_id: r.community
        for r in dedup.label_propagation(spark, sf_dir).collect()
    }
    edges = [
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .collect()
    ]
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    assert set(labels) == nodes
    # python replay of 2 synchronous LPA rounds with min tie-break
    adj: dict[int, list] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    cur = {v: v for v in nodes}
    for _ in range(2):
        nxt = {}
        for v in nodes:
            freq: dict[int, int] = {}
            for nb in adj[v]:
                freq[cur[nb]] = freq.get(cur[nb], 0) + 1
            mx = max(freq.values())
            nxt[v] = min(l for l, c in freq.items() if c == mx)
        cur = nxt
    assert labels == cur
