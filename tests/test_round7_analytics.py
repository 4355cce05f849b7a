"""Round-7 analytics batch (E456-E459): semantic properties the oracle
hash can't express — bounds, symmetry, ordering, and composition
invariants of Cohen's kappa, Jensen-Shannon divergence, Rocchio PRF,
and TextRank."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators.mlmetrics import cohen_kappa_report
from parquet_to_csv_spark.operators.text import (
    js_source_divergence,
    rocchio_prf_topk,
    textrank_keywords,
)


def test_cohen_kappa_bounds_and_marginals(spark, sf_dir):
    rows = cohen_kappa_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["po_ppm"] <= 1_000_000
        assert 0 <= r["pe_ppm"] <= 1_000_000
        if r["kappa_ppm"] is not None:
            assert -1_000_000 <= r["kappa_ppm"] <= 1_000_000
        assert 0 <= r["n_both"] <= r["n_docs"]


def test_js_divergence_bounds_and_pair_count(spark, sf_dir):
    df = js_source_divergence(spark, sf_dir)
    rows = df.collect()
    n_sources = df.select("s1").union(df.select("s2")).distinct().count()
    assert len(rows) == n_sources * (n_sources - 1) // 2
    ln2_unats = int(math.log(2) * 1e6)
    for r in rows:
        assert r["s1"] < r["s2"]
        # JS is bounded by ln 2 (µnat rounding gives ±ε headroom)
        assert -5 <= r["js_micro_nats"] <= ln2_unats + 5
        assert r["n_union_vocab"] > 0


def test_rocchio_expands_beyond_seed_terms(spark, sf_dir):
    rows = rocchio_prf_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r["score_units"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # expanded query has 3 originals + 5 expansions ⇒ up to 8 matches;
    # the corpus vocabulary guarantees expansion actually fires
    assert max(r["n_matched"] for r in rows) > 3


def test_textrank_ranks_are_valid_pageranks(spark, sf_dir):
    rows = textrank_keywords(spark, sf_dir, min_freq=5).collect()
    assert 0 < len(rows) <= 25
    for r in rows:
        assert r["pr_ppb"] >= 150_000_000  # damping floor
        assert r["deg"] >= 1
    prs = [r["pr_ppb"] for r in rows]
    assert prs == sorted(prs, reverse=True)


def test_textrank_prefers_connected_tokens(spark, sf_dir):
    """A token adjacent to many distinct frequent tokens outranks a
    leaf: rank correlates with degree on this graph (sanity of the
    centrality claim vs plain frequency)."""
    rows = textrank_keywords(spark, sf_dir, min_freq=5, k=100).collect()
    if len(rows) >= 4:
        top_deg = sum(r["deg"] for r in rows[: len(rows) // 2])
        bot_deg = sum(r["deg"] for r in rows[len(rows) // 2 :])
        assert top_deg >= bot_deg


def test_kneser_ney_scores_are_valid_logprobs(spark, sf_dir):
    from parquet_to_csv_spark.operators.corpus import kneser_ney_bigram_score

    rows = kneser_ney_bigram_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_scored"] > 0
        assert r["avg_logprob_unats"] < 0  # log of probabilities < 1
        # KN probabilities over the 31-word vocab can't be worse than
        # a uniform guess over the bigram-type inventory by much
        assert r["avg_logprob_unats"] > -20_000_000


def test_qini_curve_is_cumulative_and_exhaustive(spark, sf_dir):
    from parquet_to_csv_spark.operators.mlmetrics import qini_uplift_curve
    from parquet_to_csv_spark.sources.tables import load_table

    rows = sorted(
        qini_uplift_curve(spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert b["cum_treated"] >= a["cum_treated"]
        assert b["cum_treated_conv"] >= a["cum_treated_conv"]
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert rows[-1]["cum_treated"] + rows[-1]["cum_control"] == n_users


def test_did_four_cells_cover_all_events(spark, sf_dir):
    from parquet_to_csv_spark.operators.mlmetrics import did_estimate
    from parquet_to_csv_spark.sources.tables import load_table

    r = did_estimate(spark, sf_dir).collect()[0]
    total = (
        r["n_treated_post"] + r["n_treated_pre"]
        + r["n_control_post"] + r["n_control_pre"]
    )
    assert total == load_table(spark, sf_dir, "events").count()


def test_experiment_suite_consistency(spark, sf_dir):
    """SRM/CUPED/MDE/τ-b are mutually consistent on the same split:
    the parity split passes SRM, CUPED reduces (or matches) nothing
    worse than the raw estimator's variance, MDE is positive, and
    Kendall counts partition the pair universe."""
    from parquet_to_csv_spark.operators.mlmetrics import (
        cuped_adjusted_effect,
        experiment_power_mde,
        kendall_tau_daily,
        srm_check,
    )

    srm = srm_check(spark, sf_dir).collect()[0]
    assert not srm["srm_flag"]  # parity split is balanced by design
    assert srm["n_treated"] + srm["n_control"] > 0

    cuped = cuped_adjusted_effect(spark, sf_dir).collect()[0]
    assert 0 <= cuped["variance_reduction_ppm"] <= 1_000_000

    mde = experiment_power_mde(spark, sf_dir).collect()[0]
    assert mde["mde_milli"] > 0 and mde["mde_relative_ppm"] > 0

    kt = kendall_tau_daily(spark, sf_dir).collect()[0]
    assert -1_000_000 <= kt["tau_b_ppm"] <= 1_000_000
    assert (
        kt["concordant"] + kt["discordant"] <= kt["n0"]
    )


def test_shapley_efficiency_axiom(spark, sf_dir):
    """Sum of Shapley values = v(grand coalition) − v(∅), exactly
    (integer ×24 arithmetic makes this an equality, not an approx)."""
    from parquet_to_csv_spark.operators.timeops import shapley_attribution

    rows = shapley_attribution(spark, sf_dir).collect()
    assert len(rows) == 4
    total = sum(r["shapley_conv_x24"] for r in rows)
    # v(∅) = conversions with NO touched channels (mask 0) — users who
    # only purchased; subtract it from the covered total
    from parquet_to_csv_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("c"),
        F.max(F.when(F.col("event_type") != "purchase", 1).otherwise(0)).alias("t"),
    )
    v_empty = per.filter((F.col("c") == 1) & (F.col("t") == 0)).count()
    v_full = rows[0]["n_conv_covered"]
    assert total == 24 * (v_full - v_empty)


def test_croston_base_and_fold(spark, sf_dir):
    from parquet_to_csv_spark.operators.pandas_ops import croston_forecast

    rows = croston_forecast(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["interval_smoothed"] >= 1.0  # intervals are >= 1 day
        assert r["demand_rate"] > 0
        if r["n_demands"] == 1:
            # base case: z = first demand, p = 1
            assert r["interval_smoothed"] == 1.0
            assert r["z_smoothed"] == r["total_qty"]
