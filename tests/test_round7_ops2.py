"""Round-7 ops batch: Observation API (E493), grouped-agg pandas UDAF
semantics (E492), and exactly-once resume internals (E494)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_csv_spark.functions.stable import exact_units
from parquet_to_csv_spark.sources.tables import load_table


def test_observation_api_metrics_match_recompute(spark, sf_dir):
    """E493: df.observe attaches aggregate metrics to a query that are
    collected as a side effect of the SAME action — the free-lunch
    audit channel (no second scan) every production pipeline should
    hang its row-count/invariant assertions on. Metrics must equal an
    independent recomputation, and observe() must not perturb the
    observed query's result."""
    from pyspark.sql import Observation

    ev = load_table(spark, sf_dir, "events")
    obs = Observation("audit")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(exact_units(F.col("value"), 2)).alias("sum_cents"),
        F.min("event_id").alias("min_id"),
    )
    out = observed.filter(F.col("event_type") == "purchase").count()
    got = obs.get
    base = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(exact_units(F.col("value"), 2)).alias("s"),
        F.min("event_id").alias("m"),
    ).collect()[0]
    assert got["n_rows"] == base["n"]
    assert got["sum_cents"] == base["s"]
    assert got["min_id"] == base["m"]
    # observe is transparent to the query result
    assert out == ev.filter(F.col("event_type") == "purchase").count()


def test_pandas_udaf_quartiles_ordering_and_bounds(spark, sf_dir):
    from parquet_to_csv_spark.operators.pandas_ops import pandas_udaf_quartiles

    rows = pandas_udaf_quartiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n"] > 0
        assert r["q25_cents"] <= r["q50_cents"] <= r["q75_cents"]
        # the interquartile mean lives inside the interquartile range
        assert r["q25_cents"] / 100.0 - 0.01 <= r["iq_mean"] <= r["q75_cents"] / 100.0 + 0.01


def test_streaming_resume_skips_committed_files(spark, sf_dir):
    """The second incarnation must process ONLY the appended files:
    the per-type counts equal the full batch aggregate (no dups from
    re-reading the first batch, no losses)."""
    from parquet_to_csv_spark.streaming.stream import streaming_resume_drain

    got = {
        r["event_type"]: (r["n_events"], r["sum_cents"])
        for r in streaming_resume_drain(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["event_type"]: (r["n"], r["s"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(exact_units(F.col("value"), 2)).alias("s"),
        )
        .collect()
    }
    assert got == want
