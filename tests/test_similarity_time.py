"""Similarity + time-window tier tests: IVF recall, session semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import similarity, timeops
from parquet_to_csv_spark.sources.tables import load_table


def test_cosine_topk_shape(spark, sf_dir):
    out = similarity.cosine_topk(spark, sf_dir).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rows in by_q.values():
        assert len(rows) == 5
        sims = [r["cosine"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert sims == sorted(sims, reverse=True)


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with nprobe=4/16 cells should recover most exact neighbors;
    with nprobe=16 (probe everything) it must equal exact top-k."""
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.cosine_topk(spark, sf_dir).collect()
    }
    full_probe = {
        (r["query_id"], r["cand_id"])
        for r in similarity.ivf_topk(spark, sf_dir, n_cells=16, nprobe=16).collect()
    }
    assert full_probe == exact
    partial = {
        (r["query_id"], r["cand_id"])
        for r in similarity.ivf_topk(spark, sf_dir, n_cells=16, nprobe=4).collect()
    }
    recall = len(partial & exact) / len(exact)
    assert recall >= 0.4, f"IVF recall collapsed: {recall}"


def test_session_window_gap_semantics(spark, sf_dir):
    sessions = timeops.session_windows(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n_events"] for r in sessions) == ev.count()
    gap_us = 30 * 60 * 1_000_000
    for r in sessions:
        assert r["session_end_us"] - r["session_start_us"] >= gap_us


def test_sliding_double_counts(spark, sf_dir):
    ev_n = load_table(spark, sf_dir, "events").count()
    total = (
        timeops.sliding_window_stats(spark, sf_dir)
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    assert total == 2 * ev_n  # 1h window / 30m slide → every event twice
