"""Round-5 operator tests: blocking-recall telemetry (E399) and the
unblocked prefix-filter edge path."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import dedup


def _pairset(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_unblocked_pairs_superset_of_blocked(spark, sf_dir):
    blocked = _pairset(dedup.ngram_jaccard_pairs(spark, sf_dir, 0.8))
    unblocked = _pairset(
        dedup.ngram_jaccard_pairs(spark, sf_dir, 0.8, blocked=False)
    )
    # blocking only ever restricts the candidate space
    assert blocked <= unblocked
    # every extra pair must genuinely cross a lang×source block
    extra = unblocked - blocked
    if extra:
        docs = {
            r["doc_id"]: (r["lang"], r["source"])
            for r in dedup.load_table(spark, sf_dir, "documents")
            .select("doc_id", "lang", "source")
            .collect()
        }
        assert all(docs[a] != docs[b] for a, b in extra)


def test_blocking_recall_report_consistency(spark, sf_dir):
    row = dedup.blocking_recall_report(spark, sf_dir).collect()[0]
    assert row["threshold_bp"] == 8000
    assert (
        row["n_pairs_blocked"] + row["n_pairs_cross_block"]
        == row["n_pairs_unblocked"]
    )
    assert 0 <= row["recall_ppm"] <= 1000000
    blocked = _pairset(dedup.ngram_jaccard_pairs(spark, sf_dir, 0.8))
    assert row["n_pairs_blocked"] == len(blocked)


def test_strategy_report_carries_measured_recall(spark, sf_dir):
    rows = {r["tier"]: r for r in dedup.dedup_strategy_report(spark, sf_dir).collect()}
    assert rows["exact"]["blocking_recall_ppm"] == 1000000
    assert rows["normalized"]["blocking_recall_ppm"] == 1000000
    audit = dedup.blocking_recall_audit(spark, sf_dir).collect()[0]
    assert (
        rows["near_dup_j08"]["blocking_recall_ppm"]
        == 1000000 - audit["missed_ppm"]
    )


def test_unblocked_edges_conf_switches_build(spark, sf_dir):
    """spark.graft.unblockedEdges=true must route dedup_edges through
    the unblocked build, keyed separately from the blocked artifact."""
    blocked_edges = _pairset(dedup.dedup_edges(spark, sf_dir, 0.8))
    spark.conf.set("spark.graft.unblockedEdges", "true")
    try:
        unblocked_edges = _pairset(dedup.dedup_edges(spark, sf_dir, 0.8))
    finally:
        spark.conf.set("spark.graft.unblockedEdges", "false")
    assert blocked_edges <= unblocked_edges
    assert unblocked_edges == _pairset(
        dedup.ngram_jaccard_pairs(spark, sf_dir, 0.8, blocked=False)
    )
    # the conf reset serves the BLOCKED artifact again (no key bleed)
    assert _pairset(dedup.dedup_edges(spark, sf_dir, 0.8)) == blocked_edges


def test_backpressure_drain_splits_batches(spark, sf_dir):
    """E401: the maxFilesPerTrigger=2 rate limit must actually split
    the 6-file drain into >1 micro-batch (exactly 3), and the merged
    partials must equal the batch aggregation."""
    from parquet_to_csv_spark.sources.tables import load_table
    from parquet_to_csv_spark.streaming.stream import backpressure_drain_query

    rows = backpressure_drain_query(spark, sf_dir).collect()
    assert rows and all(r["n_batches"] == 3 for r in rows)
    want = {
        r["event_type"]: (r["n"], r["cents"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("cast(floor(value * 100 + 0.5) as long)")).alias(
                "cents"
            ),
        )
        .collect()
    }
    got = {r["event_type"]: (r["n_events"], r["value_cents"]) for r in rows}
    assert got == want
