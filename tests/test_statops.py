"""Batch tests: CUSUM closure correctness, weighted median definition,
calibration bin structure, vocab coverage monotonicity, dim profile."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import relational, similarity, text, timeops
from parquet_to_csv_spark.sources.tables import load_table


def test_cusum_equals_recurrence(spark, sf_dir):
    """The windowed closure must equal the literal sequential
    recurrence S_t = max(0, S_{t-1} + (x_t - mu0))."""
    rows = timeops.cusum_changepoints(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: (r.ts_us, r.event_id))
        mu0 = sum(r.cents for r in rs) // len(rs)
        s = 0
        for r in rs:
            s = max(0, s + (r.cents - mu0))
            assert r.cusum_cents == s
            assert r.alarm == (s > 10_000)


def test_weighted_median_definition(spark, sf_dir):
    got = {
        r.l_returnflag: (r.median_cents, r.total_weight)
        for r in relational.weighted_median_price(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_quantity") + 0.5).alias("w"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).alias("c"),
    ).collect()
    groups: dict[str, list] = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(r)
    for flag, rs in groups.items():
        rs.sort(key=lambda r: (r.c, r.l_orderkey, r.l_linenumber))
        totw = sum(r.w for r in rs)
        cum = 0
        for r in rs:
            cum += r.w
            if 2 * cum >= totw:
                assert got[flag] == (r.c, totw)
                break


def test_calibration_bins_monotone_and_complete(spark, sf_dir):
    rows = sorted(text.calibration_bins(spark, sf_dir).collect(), key=lambda r: r.bin)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert [r.bin for r in rows] == list(range(1, 11))
    assert sum(r.n_docs for r in rows) == n_docs
    # deciles ordered by score: mean score must be non-decreasing
    means = [r.mean_score_e4 for r in rows]
    assert means == sorted(means)
    for r in rows:
        assert r.pos_rate_ppm == r.n_pos * 1_000_000 // r.n_docs


def test_vocab_dictionary_coverage(spark, sf_dir):
    rows = sorted(text.vocab_dictionary(spark, sf_dir).collect(), key=lambda r: r.token_id)
    assert [r.token_id for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    cov = [r.coverage_ppm for r in rows]
    assert cov == sorted(cov)
    # full vocab (fixture vocab < v) ⇒ full coverage within floor slack
    assert cov[-1] in (999_999, 1_000_000)


def test_embedding_dim_profile(spark, sf_dir):
    rows = similarity.embedding_dim_profile(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    assert len(rows) == dim
    for r in rows:
        assert r.n_vecs == n
        assert r.min_val <= r.mean_val <= r.max_val
