"""Event-time windowing over ``events`` — EXT E9/E10.

The fixture ``ts`` is a ns-epoch long (see functions.trace); windowing
runs on ``timestamp_micros(ts div 1000)`` — µs-aligned exactly like
the DuckDB oracle's parquet reader, so bucket boundaries agree.

All three shapes (tumbling, sliding, session) use Spark's native
window operators — the same expressions run unchanged under Structured
Streaming with a watermark (see streaming.stream), which is the point:
batch backfill and the live path share one definition.

Scale notes: tumbling/sliding group on (window × keys) — partial
aggregation applies, the exchange carries only group rows. Session
windows shuffle on user_id then merge sessions locally; skewed users
are the risk at 100 TB (AQE skew handling, or pre-filter bots).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from parquet_to_csv_spark.functions.stable import (
    exact_units,
    stable_avg_2dp,
    stable_sum_2dp,
)
from parquet_to_csv_spark.sources.tables import load_table
from parquet_to_csv_spark.operators.dedup import _cut_lineage as _dedup_cut


def _ts_micros() -> Column:
    return F.timestamp_micros(F.expr("ts div 1000"))


import contextlib as _contextlib
import threading as _threading

# Serializes session-conf toggles (one SparkSession conf is process-
# global): overlapping scoped_session_conf blocks on other threads
# would otherwise race the save/restore and can restore the WRONG
# previous value on nesting. A single lock + depth counter makes the
# toggle re-entrant and excludes concurrent planners for the (short,
# plan-construction-only) critical section.
_CONF_TOGGLE_LOCK = _threading.RLock()
_CONF_TOGGLE_DEPTH: dict[str, int] = {}


@_contextlib.contextmanager
def scoped_session_conf(spark: SparkSession, key: str, value: str):
    """Set ``key`` to ``value`` for the block, restoring the previous
    value on exit — serialized process-wide so concurrent/nested scopes
    can't interleave a wrong restore. Hold only around PLAN
    construction (the returned DataFrames are already optimized-enough
    snapshots of the conf state); never around long-running actions.
    """
    with _CONF_TOGGLE_LOCK:
        depth = _CONF_TOGGLE_DEPTH.get(key, 0)
        prev = spark.conf.get(key, None) if depth == 0 else None
        if depth == 0:
            spark.conf.set(key, value)
        _CONF_TOGGLE_DEPTH[key] = depth + 1
        try:
            yield
        finally:
            _CONF_TOGGLE_DEPTH[key] = depth
            if depth == 0:
                if prev is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, prev)


def tumbling_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: 1-hour tumbling windows × event_type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window(_ts_micros(), "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            stable_sum_2dp(F.col("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("ws_ms"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: 1-hour windows sliding every 30 minutes (each event lands in
    two windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window(_ts_micros(), "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            stable_avg_2dp(F.sum("value"), F.count(F.lit(1))).alias("avg_value"),
        )
        .select(F.unix_millis(F.col("w.start")).alias("ws_ms"), "n_events", "avg_value")
    )


def session_windows(spark: SparkSession, sf_dir: str, gap: str = "30 minutes") -> DataFrame:
    """E10: per-user sessions with a 30-minute inactivity gap.

    Session end = last event + gap (Spark semantics; the oracle's
    gaps-and-islands formulation reproduces it exactly: a new session
    starts when the gap to the previous event is >= the gap duration).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(_ts_micros(), gap).alias("s"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            stable_sum_2dp(F.col("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("s.start")).alias("session_start_us"),
            F.unix_micros(F.col("s.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def hourly_to_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate chain: raw → hourly → daily.

    The daily tier re-aggregates the hourly tier (not the raw events) —
    at 100 TB the hourly materialization is what makes the daily sweep
    cheap; expressed here as two chained groupBys in one plan.

    Determinism (round-1 gate flap): the hourly tier carries the value
    sum as exact integer cents (``functions.stable.exact_units`` — the
    fixture values are 2dp), so the daily tier is a pure long sum with
    no float rounding anywhere; and day truncation is epoch integer
    arithmetic, not ``date_trunc`` (which reads the session timezone).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window(_ts_micros(), "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(exact_units(F.col("value"), 2)).alias("sv_cents"),
        )
        .select(F.unix_millis(F.col("w.start")).alias("hs_ms"), "event_type", "n", "sv_cents")
    )
    day_ms = (F.col("hs_ms") - F.pmod(F.col("hs_ms"), F.lit(86400000))).alias("day_ms")
    return (
        hourly.groupBy(day_ms, F.col("event_type"))
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("sv_cents") / F.lit(100.0)).alias("sum_value"),
            F.max("n").alias("max_hourly_events"),
        )
        .select("day_ms", "event_type", "n_events", "sum_value", "max_hourly_events")
    )


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase) per user — the
    conversion query of every product/behavior pipeline.

    Sequencing ("first click AFTER the first view") looks like three
    dependent scans, but stacked running-min windows express it in ONE
    shuffle on user_id + one per-user sort:

    - ``run_t1`` = min view-time so far: a click is stage-2-qualified
      iff its ts ≥ run_t1 at that row (⇔ some view precedes it — and
      then its ts is ≥ the FIRST view, so min over qualified clicks IS
      "first click after first view");
    - ``run_t2`` = min qualified-click-time so far: a purchase
      qualifies iff its ts ≥ run_t2 (same argument, one stage up).

    Both windows share one frame spec, so Catalyst plans a single sort.
    The DuckDB oracle replays the identical window formulation.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts_us"), F.asc("event_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts_us"))
    run_t1 = F.min(view_ts).over(w)
    click_q = F.when(
        (F.col("event_type") == "click") & (F.col("ts_us") >= run_t1), F.col("ts_us")
    )
    run_t2 = F.min(click_q).over(w)
    purch_q = F.when(
        (F.col("event_type") == "purchase") & (F.col("ts_us") >= run_t2),
        F.col("ts_us"),
    )
    staged = ev.select(
        "user_id",
        view_ts.alias("v_ts"),
        click_q.alias("c_ts"),
        purch_q.alias("p_ts"),
    )
    agg = staged.groupBy("user_id").agg(
        F.min("v_ts").alias("t_view_us"),
        F.min("c_ts").alias("t_click_us"),
        F.min("p_ts").alias("t_purchase_us"),
    )
    stage = (
        F.when(F.col("t_purchase_us").isNotNull(), F.lit(3))
        .when(F.col("t_click_us").isNotNull(), F.lit(2))
        .when(F.col("t_view_us").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
    )
    return agg.select(
        "user_id", "t_view_us", "t_click_us", "t_purchase_us", stage.alias("stage")
    )


def incremental_user_totals(
    spark: SparkSession, sf_dir: str, cutover_ms: int = 1_705_276_800_000
) -> DataFrame:
    """Incremental aggregation via mergeable partials: history (< T)
    and delta (≥ T) are aggregated separately and MERGED (sum of sums,
    sum of counts) — the pattern that lets a daily 100 TB pipeline
    aggregate only the new partition and fold it into yesterday's
    rollup instead of rescanning history.

    The gate's oracle computes the total directly from the raw table,
    so the merge is verified to be lossless. Sums are exact integer
    cents (functions.stable) — merge order can never change the result.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        exact_units(F.col("value"), 2).alias("cents"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c")
        )

    hist = partial(ev.filter(F.col("ts_ms") < cutover_ms))
    delta = partial(ev.filter(F.col("ts_ms") >= cutover_ms))
    return (
        hist.unionByName(delta)
        .groupBy("user_id")
        .agg(F.sum("n").alias("n_events"), F.sum("c").alias("sum_cents"))
        .select(
            "user_id",
            "n_events",
            (F.col("sum_cents") / F.lit(100.0)).alias("sum_value"),
        )
    )


def distribution_drift(
    spark: SparkSession, sf_dir: str, cutover_ms: int = 1_705_276_800_000
) -> DataFrame:
    """Distribution drift per event type: smoothed KL(P‖Q) between the
    value histograms before/after a cutover — the monitoring pass that
    catches a feature's distribution shifting under a model.

    Determinism recipe (the unigram-LM pattern): per-bucket work is
    scalar double math in one fixed order (counts → add-one-smoothed
    probabilities → ln ratio), each bucket's contribution is rounded to
    integer micro-nats and WEIGHTED by its integer count, and only the
    exact long sum crosses partitions — the float fold order that
    makes naive Σ p·ln(p/q) irreproducible never occurs. Buckets are
    fixed-width floors clamped to [0, 10] (11-way domain, generated —
    zero-count buckets participate via smoothing).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(10)).alias("bucket"),
        (F.expr("ts div 1000000") < cutover_ms).alias("is_before"),
    )
    g = ev.groupBy("event_type", "bucket").agg(
        F.count(F.when(F.col("is_before"), 1)).alias("cb"),
        F.count(F.when(~F.col("is_before"), 1)).alias("ca"),
    )
    domain = (
        ev.select("event_type")
        .distinct()
        .select("event_type", F.explode(F.sequence(F.lit(0), F.lit(10))).alias("bucket"))
    )
    full = domain.join(g, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        (F.coalesce(F.col("cb"), F.lit(0)) + 1).alias("cb1"),
        (F.coalesce(F.col("ca"), F.lit(0)) + 1).alias("ca1"),
    )
    tot = full.groupBy("event_type").agg(
        F.sum("cb1").alias("nb"), F.sum("ca1").alias("na")
    )
    j = full.join(F.broadcast(tot), "event_type")
    # ln(p/q) with p = cb1/nb, q = ca1/na — one fixed-order expression
    ratio = (
        F.col("cb1").cast("double")
        * F.col("na").cast("double")
        / (F.col("ca1").cast("double") * F.col("nb").cast("double"))
    )
    term_units = F.round(F.log(ratio) * F.lit(1e6), 0).cast("long")
    return (
        j.groupBy("event_type")
        .agg(
            F.max("nb").alias("n_before_sm"),
            F.max("na").alias("n_after_sm"),
            F.sum(F.col("cb1") * term_units).alias("units"),
        )
        .select(
            "event_type",
            (F.col("n_before_sm") - 11).alias("n_before"),
            (F.col("n_after_sm") - 11).alias("n_after"),
            F.round(
                F.col("units").cast("double")
                / F.col("n_before_sm").cast("double")
                / F.lit(1e6),
                6,
            ).alias("kl_nats"),
        )
    )


def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users (the DAU/WAU curve). COUNT(DISTINCT)
    over a sliding window has no direct window form — and the naive
    per-day re-scan is 7× the work — so the scalable rewrite is:

    1. collapse to the (day, user) grain ONCE (one distinct — the only
       pass over the fact table);
    2. band-join the tiny day-grain relation to a generated day axis
       (each (day, user) row serves every window day it falls in — ≤7
       rows each, array-local explode);
    3. one distinct count per window day over day-grain rows.

    At 100 TB step 1's output is |days|×|active users| — orders of
    magnitude smaller than events — and everything after never touches
    the fact table again.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts div 86400000000000").alias("day"), "user_id"
    )
    day_user = ev.distinct()
    served = day_user.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("win_day"),
    )
    days = ev.select(F.col("day").alias("win_day")).distinct()
    return (
        served.join(days, "win_day")
        .groupBy("win_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition counts per user journey (the
    Markov matrix of product analytics): one shuffle on user_id, one
    per-user sort shared by the single `lead` window, then a tiny
    grouped count with map-side partials."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("ts_us"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id"))
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def signup_churn_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn shape: signups with NO purchase by the same user within
    the following 7 days — NOT EXISTS over a time range, decorrelated
    into the banded-bucket equi-join (rangejoin.py's trick) + left-anti
    instead of the quadratic inequality join the naive form plans.

    Each signup probes its own and the next 7-day band; a purchase
    within the window lives in exactly one of them. Integer-µs
    arithmetic end to end.
    """
    band_us = 7 * 86_400_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"), "user_id",
            F.col("ts_us").alias("s_ts"),
        )
        .withColumn(
            "band",
            F.explode(
                F.array(
                    F.expr(f"s_ts div {band_us}"), F.expr(f"s_ts div {band_us} + 1")
                )
            ),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts_us").alias("p_ts"),
        F.expr(f"ts_us div {band_us}").alias("band"),
    )
    converted = (
        signups.join(purchases, ["user_id", "band"])
        .filter(
            (F.col("p_ts") >= F.col("s_ts"))
            & (F.col("p_ts") <= F.col("s_ts") + F.lit(band_us))
        )
        .select("signup_id")
        .distinct()
    )
    return (
        signups.select("signup_id", "user_id", "s_ts")
        .distinct()
        .join(converted, "signup_id", "left_anti")
        .select("signup_id", "user_id", F.col("s_ts").alias("signup_ts_us"))
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention-cohort matrix: users grouped by first-seen week
    (cohort), counted as retained in each subsequent week they were
    active — THE product-analytics query.

    One pass to the (user, week) activity grain, a tiny per-user min
    for the cohort, one broadcast-sized join back, one grouped count.
    At 100 TB the day/week-grain collapse (as in rolling WAU) is again
    what keeps everything after the first scan small.
    """
    week_us = 7 * 86_400_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"(ts div 1000) div {week_us}").alias("week")
    )
    user_weeks = ev.distinct()
    cohorts = user_weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        user_weeks.join(F.broadcast(cohorts), "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap — the usage-pattern rollup.

    dow/hour come from pure integer µs arithmetic ((epoch days + 4) % 7
    — 1970-01-01 was a Thursday — and hours mod 24) rather than the
    engines' calendar functions, whose dow NUMBERING conventions
    differ (Spark 1=Sunday, DuckDB 0=Sunday): integer math sidesteps
    the whole convention class. One scan, one small exchange.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("((ts div 86400000000000) + 4) % 7").alias("dow"),
        F.expr("(ts div 3600000000000) % 24").alias("hour"),
        "value",
    )
    return ev.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(exact_units(F.col("value"), 2)) / F.lit(100.0)).alias("sum_value"),
    )


def shipping_sla_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lag percentiles per priority — the SLA report.

    Lag is an exact integer day count (date-truncated timestamps), so
    the percentile interpolation runs on integers — the cross-engine
    percentile convention already proven by price_quantiles.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_orderdate").cast("date").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    lag = F.datediff(F.col("sd"), F.col("od"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_orderpriority", lag.alias("lag_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.expr("round(percentile(lag_days, 0.5), 1)").alias("p50_days"),
            F.expr("round(percentile(lag_days, 0.9), 1)").alias("p90_days"),
            F.expr("round(percentile(lag_days, 0.99), 1)").alias("p99_days"),
        )
    )


def rolling_anomaly_zscore(
    spark: SparkSession, sf_dir: str, lookback: int = 10, min_n: int = 5
) -> DataFrame:
    """Per-user rolling z-score anomaly flags: each event's value is
    scored against the mean/std of that user's previous ``lookback``
    events — the streaming-able data-quality screen for metric spikes.

    Exactness discipline: frame sums run over integer cents (sum and
    sum-of-squares are exact longs; frame membership is fixed by the
    total (ts_us, event_id) order), and the anomaly predicate is the
    PURE-INTEGER inequality (n·x − Σ)² > 9·(n·Σx² − Σ²) — algebraically
    |x−μ| > 3σ with no division, no sqrt, no float boundary to flip
    between engines. The reported z itself is one double division
    (rounded 4dp) for human consumption only.

    One shuffle (hash by user_id, sort by time within partition);
    state per row is O(1) — the same window runs under Structured
    Streaming with ``rowsBetween`` semantics replaced by
    ``applyInPandasWithState`` if per-key online scoring is needed.
    """
    from pyspark.sql import Window

    from parquet_to_csv_spark.functions.stable import exact_units

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "value",
            exact_units(F.col("value"), 2).alias("x"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts_us"), F.asc("event_id"))
        .rowsBetween(-lookback, -1)
    )
    scored = ev.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        "x",
        F.count("x").over(w).alias("n"),
        F.coalesce(F.sum("x").over(w), F.lit(0)).alias("s"),
        F.coalesce(F.sum(F.col("x") * F.col("x")).over(w), F.lit(0)).alias("ss"),
    ).filter(F.col("n") >= min_n)
    num = F.col("n") * F.col("x") - F.col("s")
    den = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    z = F.when(den > 0, num.cast("double") / F.sqrt(den.cast("double")))
    return scored.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.col("n").cast("long").alias("n_window"),
        F.round(z, 4).alias("z"),
        ((den > 0) & (num * num > F.lit(9) * den)).alias("is_anomaly"),
    )


def debounce_events(
    spark: SparkSession, sf_dir: str, gap_us: int = 43_200_000_000
) -> DataFrame:
    """Event debouncing: within each (user, event_type) stream, keep
    only the first event of every burst — consecutive events closer
    than ``gap_us`` collapse onto their leader. The near-time twin of
    dedup: telemetry retries / double-clicks / at-least-once sources
    produce semantic duplicates that exact dedup can't see because the
    payloads differ.

    One shuffle (hash by user+type, sort by time within partition),
    one ``lag`` — O(1) state per row, and the same expression runs
    under Structured Streaming as dropDuplicatesWithinWatermark's
    value-insensitive cousin. All arithmetic is integer µs.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("ts_us"), F.asc("event_id")
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    gapped = ev.withColumn("prev_ts", F.lag("ts_us").over(w)).withColumn(
        "gap_us", F.coalesce(F.col("ts_us") - F.col("prev_ts"), F.lit(-1))
    )
    return gapped.filter(
        (F.col("gap_us") < 0) | (F.col("gap_us") >= gap_us)
    ).select("event_id", "user_id", "event_type", "ts_us", "gap_us")


def daily_balance_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill + forward fill: each user's daily purchase
    total, densified over the user's own active span (every calendar
    day between their first and last purchase) with gaps carrying the
    last observed value forward — the standard time-series
    regularization step before windowed features or charting.

    Plan: one scan collapses to the (user, day) grain; per-user spans
    are a tiny aggregate; the day spine is an array-local
    ``sequence``+``explode`` (rows ∝ active span, NOT |users|×|global
    days| — the cross-join trap); one left join puts observations on
    the spine and one per-user ordered window does the forward fill.
    All arithmetic is integer days / exact cents.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr("ts div 1000 div 86400000000").alias("day"),
            exact_units(F.col("value"), 2).alias("cents"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("cents").alias("day_cents"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select("user_id", F.explode(F.sequence("mn", "mx")).alias("day"))
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "day",
        F.last("day_cents", ignorenulls=True).over(w).alias("filled_cents"),
        F.col("day_cents").isNull().alias("is_gap"),
    )


def cusum_changepoints(
    spark: SparkSession, sf_dir: str, h_cents: int = 10_000
) -> DataFrame:
    """Upper-CUSUM change-point detection per user over purchase
    amounts — the classic drift monitor (has this user's spend level
    shifted up?), usually written as the recurrence
    ``S_t = max(0, S_{t-1} + (x_t - mu0))`` which looks inherently
    sequential.

    Relational rewrite: with prefix sums ``P_t = sum_{j<=t}(x_j - mu0)``,
    the recurrence closes to ``S_t = P_t - min(0, min_{j<=t} P_j)`` —
    i.e. ONE per-user ordered prefix-sum window plus ONE running-min
    window over it, no iteration and no Python fold (the same
    prefix-closure trick as pareto_frontier's staircase). mu0 is the
    user's own integer-floor mean (exact cents); every step is long
    arithmetic, so alarms (S_t > h) are engine-exact.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        exact_units(F.col("value"), 2).alias("cents"),
    )
    mu = p.groupBy("user_id").agg(
        F.expr("sum(cents) div count(1)").alias("mu0_cents")
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    d = p.join(mu, "user_id").withColumn(
        "pfx", F.sum(F.col("cents") - F.col("mu0_cents")).over(w_run)
    )
    s = d.withColumn(
        "cusum_cents",
        F.col("pfx") - F.least(F.lit(0).cast("long"), F.min("pfx").over(w_run)),
    )
    return s.select(
        "user_id",
        "event_id",
        "ts_us",
        "cents",
        "cusum_cents",
        (F.col("cusum_cents") > h_cents).alias("alarm"),
    )


def monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the reporting query behind
    every KPI dashboard, kept engine-exact: revenue in integer cents,
    growth as floored ppm of the previous month (NULL for the first
    month, not a divide-by-zero).

    One scan collapses to the month grain (tiny relation), one lag
    window over months. Month key is calendar year*100+month — both
    engines derive it identically from the same timestamp.

    Signed-division trap: growth is NEGATIVE in down months, and Spark
    ``div`` truncates toward zero while DuckDB ``//`` floors — they
    disagree by 1 ppm on every down month. Both sides therefore use
    explicit FLOOR division via the pmod normalization
    (functions.stable.duck_sum_2dp's documented convention):
    ``(num − pmod(num, den)) div den`` with den > 0.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    ts = F.expr("cast(o_orderdate as timestamp)")
    per = (
        orders.select(
            (F.year(ts) * 100 + F.month(ts)).alias("ym"),
            exact_units(F.col("o_totalprice"), 2).alias("cents"),
        )
        .groupBy("ym")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("rev_cents"))
    )
    w = Window.orderBy("ym")
    stepped = per.withColumn("prev_cents", F.lag("rev_cents", 1).over(w))
    num = "((rev_cents - prev_cents) * 1000000)"
    return stepped.select(
        "ym",
        "n_orders",
        "rev_cents",
        F.when(
            F.col("prev_cents") > 0,
            F.expr(f"({num} - pmod({num}, prev_cents)) div prev_cents"),
        ).alias("mom_growth_ppm"),
    )


def new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly new-vs-returning user split — the acquisition/retention
    headline. One pass to the (user, week) activity grain, a per-user
    min week (the cohort), then each active week classifies the user
    as new (first week) or returning; counts per week.

    Same day/week-grain collapse as retention_cohorts — everything
    after the first scan is key-cardinality-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.expr("ts div 1000 div 604800000000").alias("week")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("week").alias("first_week"))
    return (
        uw.join(first, "user_id")
        .groupBy("week")
        .agg(
            F.sum(F.when(F.col("week") == F.col("first_week"), 1).otherwise(0)).alias(
                "new_users"
            ),
            F.sum(F.when(F.col("week") != F.col("first_week"), 1).otherwise(0)).alias(
                "returning_users"
            ),
        )
        .withColumn(
            "returning_share_ppm",
            F.expr(
                "returning_users * 1000000 div (new_users + returning_users)"
            ),
        )
    )


def churn_risk_features(
    spark: SparkSession, sf_dir: str, snapshot_ms: int = 1_706_659_032_195
) -> DataFrame:
    """Point-in-time churn-risk feature vector per user AT a snapshot
    instant: recency (µs since last event), activity counts in the
    trailing 7/30 days, purchase share — the feature row a churn model
    scores. Strictly point-in-time (no post-snapshot leakage): events
    after the snapshot are excluded by a pushed scan predicate.

    One scan, conditional partial-aggregated sums, zero joins. The
    default snapshot is just past the fixture's max event time so every
    user appears; a production run parameterizes it per scoring day.
    """
    snap_us = snapshot_ms * 1000
    d7 = snap_us - 7 * 86_400_000_000
    d30 = snap_us - 30 * 86_400_000_000
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_type",
        )
        .filter(F.col("ts_us") <= snap_us)
    )
    return ev.groupBy("user_id").agg(
        (F.lit(snap_us) - F.max("ts_us")).alias("recency_us"),
        F.count(F.lit(1)).alias("n_events_total"),
        F.sum(F.when(F.col("ts_us") >= d7, 1).otherwise(0)).alias("n_events_7d"),
        F.sum(F.when(F.col("ts_us") >= d30, 1).otherwise(0)).alias("n_events_30d"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_purchases"),
    )


def max_concurrent_spans(
    spark: SparkSession, sf_dir: str, n_parts: int = 8
) -> DataFrame:
    """Peak concurrency per hour over the trace spans — "how many
    spans were in flight at once" — THE operational query over the
    reference's own data model (events as spans: start = ts, duration
    = value ms; cf. /root/reference/main.js:158-162 trace arithmetic).

    Classic sweep-line: every span contributes (+1 at start, −1 at
    end) points; concurrency is the running sum over the global point
    order (end before start at the same instant — half-open spans);
    the hourly report takes the max per hour bucket. The global
    running sum is the single-task trap again, so it reuses the
    two-phase distributed prefix sum (range partition by the total
    point order → local sums + tiny broadcast offsets). All integer µs
    / counts.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    spans = ev.select(
        "event_id",
        F.expr("ts div 1000").alias("s_us"),
        # value is a 2dp ms duration: exact µs via cents*10
        (F.expr("ts div 1000") + exact_units(F.col("value"), 2) * 10).alias("e_us"),
    )
    points = spans.select(
        F.col("s_us").alias("t"), F.lit(1).alias("d"), "event_id"
    ).unionAll(
        spans.select(F.col("e_us").alias("t"), F.lit(-1).alias("d"), "event_id")
    )
    base = points.repartitionByRange(n_parts, "t", "d", "event_id").withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("t", "d", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = base.withColumn("local_sum", F.sum("d").over(w_local))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        base.groupBy("pid")
        .agg(F.sum("d").alias("ptotal"))
        .withColumn("p_offset", F.coalesce(F.sum("ptotal").over(w_off), F.lit(0)))
        .select("pid", "p_offset")
    )
    conc = local.join(F.broadcast(offsets), "pid").withColumn(
        "running", F.col("p_offset") + F.col("local_sum")
    )
    return (
        conc.groupBy(F.expr("t div 3600000000").alias("hour_bucket"))
        .agg(F.max("running").alias("max_concurrent"))
    )


def interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user purchase inter-arrival statistics + burstiness — the
    behavioral signature separating periodic buyers (B → −1) from
    bursty ones (B → +1): ``B = (σ−μ)/(σ+μ)`` over the gaps between
    consecutive purchases.

    One lag window per user gives integer-SECOND gaps (second grain,
    not µs: Σg² of µs gaps spanning days overflows a long — seconds
    keep n·Σg² < 2^63 out to ~10⁶-gap users); mean and variance come
    from the three exact long sums (n, Σg, Σg²) via ``n·Σg² − (Σg)²``
    — order-independent where a float variance fold is not. Only the
    final σ (one sqrt) and B (one division) are doubles — a fixed
    IEEE pipeline both engines evaluate identically on identical
    longs. Users with < 3 purchases (< 2 gaps) are excluded — σ of
    one gap is 0/undefined noise.
    """
    from pyspark.sql import Window

    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.expr("ts div 1000").alias("ts_us"), "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = p.withColumn("prev", F.lag("ts_us", 1).over(w)).filter(
        F.col("prev").isNotNull()
    ).select("user_id", F.expr("(ts_us - prev) div 1000000").alias("g"))
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("g").alias("s1"),
        F.sum(F.col("g") * F.col("g")).alias("s2"),
    ).filter(F.col("n_gaps") >= 2)
    mean = F.col("s1").cast("double") / F.col("n_gaps")
    # population variance: (n*s2 - s1^2) / n^2 — exact longs upstairs
    var = (
        (F.col("n_gaps") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        / (F.col("n_gaps") * F.col("n_gaps")).cast("double")
    )
    sd = F.sqrt(var)
    return stats.select(
        "user_id",
        "n_gaps",
        F.expr("s1 div n_gaps").alias("mean_gap_s"),
        F.round(sd, 3).alias("sd_gap_s"),
        F.round((sd - mean) / (sd + mean), 6).alias("burstiness"),
    )


def seasonal_naive_backtest(
    spark: SparkSession, sf_dir: str, lag_days: int = 7
) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each (event_type, day)
    count with the count ``lag_days`` earlier and score MAE/MAPE — the
    baseline every capacity/traffic forecasting model must beat, and
    the cheapest continuous sanity monitor on an ingest volume series.

    Plan: ONE daily aggregation (map-side combine, day from pure
    integer epoch arithmetic — no session-timezone ``date_trunc``),
    self-equi-joined on (event_type, day) after shifting the forecast
    branch by ``lag_days`` — an exchange on the same grouping key both
    branches share, so AQE reuses the exchange. Errors are exact longs;
    MAE in milli-units and MAPE in ppm via floored integer division
    (counts ≥ 1 by construction — no divide-by-zero under ANSI).
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("(ts div 1000) div 86400000000")
    daily = ev.groupBy(day.alias("day"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    pred = daily.select(
        "event_type", (F.col("day") + lag_days).alias("day"), F.col("n").alias("n_pred")
    )
    scored = daily.join(pred, ["event_type", "day"]).select(
        "event_type",
        F.abs(F.col("n") - F.col("n_pred")).alias("abs_err"),
        F.expr("abs(n - n_pred) * 1000000 div n").alias("ape_ppm"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("sum(abs_err) * 1000 div count(1)").alias("mae_milli"),
        F.expr("sum(ape_ppm) div count(1)").alias("mape_ppm"),
    )


def conversion_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of view→purchase conversion time —
    the censoring-correct answer to "how long until a viewer buys?",
    where naive averaging of observed conversions is biased (users who
    haven't bought YET are evidence, not missing data).

    Cohort: each user's FIRST view; event = first purchase at-or-after
    it; users with no qualifying purchase are right-censored at the
    corpus horizon (max event time). Durations in whole days.

    Relational KM: one row per distinct duration with event count d and
    censor count c; the risk set n is the reverse cumulative total
    (computed as total − running prefix via one global window — the
    relation has one row per distinct DAY, so the single-partition
    window is bounded by the calendar, not the data). The curve is
    reported as LOG-survival in integer micro-nats: each step's
    ``ln(1 − d/n) = ln((n−d)/n)`` rounds to micro-nats FIRST
    (irrational except the never-occurring ln(1)), then the cumulative
    long sum is exact — no cumulative float product anywhere, so the
    curve is engine- and order-exact. Steps where d = n (survival hits
    zero) end the curve and are dropped (log S = −∞).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    first_buy = (
        views.join(
            buys,
            (F.col("user_id") == F.col("b_user")) & (F.col("b_ts") >= F.col("v_ts")),
            "left",
        )
        .groupBy("user_id", "v_ts")
        .agg(F.min("b_ts").alias("p_ts"))
    )
    horizon = F.broadcast(ev.agg(F.max("ts").alias("h_ts")))
    durs = first_buy.join(horizon).select(
        F.when(
            F.col("p_ts").isNotNull(),
            F.expr("(p_ts - v_ts) div 86400000000000"),
        )
        .otherwise(F.expr("(h_ts - v_ts) div 86400000000000"))
        .alias("dur"),
        F.col("p_ts").isNotNull().cast("long").alias("is_event"),
    )
    steps = durs.groupBy("dur").agg(
        F.sum("is_event").alias("d"),
        F.sum(1 - F.col("is_event")).alias("c"),
    )
    total = F.broadcast(durs.agg(F.count(F.lit(1)).alias("n_total")))
    w_prev = (
        Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    )
    at_risk = steps.join(total).withColumn(
        "n_risk",
        F.col("n_total")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    term = F.round(
        F.log(F.expr("CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)")) * 1e6, 0
    ).cast("long")
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    return (
        at_risk.filter((F.col("d") > 0) & (F.col("n_risk") > F.col("d")))
        .withColumn("term_micro", term)
        .withColumn("log_surv_micro", F.sum("term_micro").over(w_cum))
        .select(
            F.col("dur").alias("duration_days"),
            "n_risk",
            F.col("d").alias("n_events"),
            "log_surv_micro",
        )
    )


def top_event_trigrams(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Top sequential behavior patterns: the most common length-3
    chains of consecutive event types per user — the sequence-mining
    report (what do users DO, in order?) behind funnel design.

    Two ``lead`` steps over one (user, time) window build the trigram
    relation — the SAME per-user exchange the Markov op uses, no
    self-joins; occurrence and distinct-user counts aggregate on the
    trigram key (domain-bounded: |types|³ rows), then one global rank
    over that tiny relation. Ordering ties break on the trigram text.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
        .select("user_id", F.col("event_type").alias("e1"), "e2", "e3")
    )
    counts = tri.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("user_id").alias("n_users"),
    )
    wr = Window.orderBy(
        F.desc("n_users"), F.desc("n_occurrences"), "e1", "e2", "e3"
    )
    return (
        counts.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= k)
        .select("e1", "e2", "e3", "n_occurrences", "n_users", "rnk")
    )


def session_entry_exit(
    spark: SparkSession, sf_dir: str, gap_us: int = 1800000000
) -> DataFrame:
    """Session entry/exit path report: for every (first event type,
    last event type) pair of a session, how many sessions follow that
    path and how long they run — where users land and where they leave.

    Sessions are the same gaps-and-islands formulation the
    sessionization oracle uses (new session when the gap ≥ 30 min), so
    the whole derivation is ONE per-user time window reused three ways
    (gap flag, session id via running sum, first/last extraction via
    row_number from both ends). Durations are exact µs; the mean is
    floored integer milli-seconds. Output bounded by |types|².
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("tus").over(w).isNull()
            | ((F.col("tus") - F.lag("tus").over(w)) >= gap_us),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("tus", "event_id")
    wse = Window.partitionBy("user_id", "sid").orderBy(
        F.desc("tus"), F.desc("event_id")
    )
    marked = sess.withColumn("rf", F.row_number().over(ws)).withColumn(
        "rl", F.row_number().over(wse)
    )
    per_session = marked.groupBy("user_id", "sid").agg(
        F.max(F.when(F.col("rf") == 1, F.col("event_type"))).alias("entry_type"),
        F.max(F.when(F.col("rl") == 1, F.col("event_type"))).alias("exit_type"),
        (F.max("tus") - F.min("tus")).alias("dur_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_session.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.expr("sum(dur_us) div (count(1) * 1000)").alias("mean_dur_ms"),
    )


def decayed_event_trend(
    spark: SparkSession, sf_dir: str, half_life_days: int = 7
) -> DataFrame:
    """Time-decay-weighted event counts ("trending score"): recent
    events count fully, older ones at ``2^(−age/half_life)`` — the
    freshness-weighted ranking every trending/leaderboard surface
    uses, without re-aggregating history on every query.

    Ages collapse to WHOLE DAYS first (integer epoch arithmetic), so
    the decay factor has a bounded domain (one value per distinct age)
    and is computed as one fixed IEEE ``pow`` per (type, age) row —
    AFTER the count aggregation, never per event — then quantized to
    ppm and folded in exact longs. Plan: one groupBy(type, age) with
    map-side combine (the only data-proportional exchange), a
    broadcast horizon row, one tiny groupBy(type).
    """
    ev = load_table(spark, sf_dir, "events")
    horizon = F.broadcast(
        ev.agg(F.expr("max(ts div 86400000000000)").alias("h_day"))
    )
    daily = ev.select(
        "event_type", F.expr("ts div 86400000000000").alias("day")
    ).groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    w_ppm = F.expr(
        f"CAST(round(pow(2.0, -CAST(h_day - day AS DOUBLE) / {half_life_days}.0)"
        " * 1000000.0) AS BIGINT)"
    )
    return (
        daily.join(horizon)
        .select("event_type", "n", w_ppm.alias("w_ppm"))
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum(F.col("n") * F.col("w_ppm")).alias("score_e6"),
        )
        .select(
            "event_type",
            "n_events",
            F.expr("score_e6 div 1000000").alias("trend_score"),
            "score_e6",
        )
    )


def daily_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily P50/P90/P99 value bands per event type — the latency/size
    band chart on every operations dashboard.

    Percentiles are TYPE-1 (discrete): the value at 0-based rank
    ``floor((n−1)·p)`` of the group's sorted cents — selected
    explicitly via one row_number window + a conditional aggregate, so
    the semantics are a fixed formula both engines evaluate literally
    (the engines' interpolating percentile internals differ in
    unspecifiable last-ulp ways; a selected ORDER STATISTIC of exact
    cents cannot). One per-(day, type) window + one groupBy sharing
    the exchange; outputs are exact integer cents.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts div 86400000000000").alias("day"),
        exact_units(F.col("value"), 2).alias("cents"),
    )
    w = Window.partitionBy("day", "event_type").orderBy("cents")
    wc = Window.partitionBy("day", "event_type")
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    def pick(p: str, alias: str):
        idx = f"CAST(floor(CAST(n - 1 AS DOUBLE) * {p}) AS BIGINT) + 1"
        return F.expr(f"max(CASE WHEN rn = {idx} THEN cents END)").alias(alias)
    return ranked.groupBy("day", "event_type").agg(
        F.max("n").alias("n_events"),
        pick("0.5", "p50_cents"),
        pick("0.9", "p90_cents"),
        pick("0.99", "p99_cents"),
    )


def windowed_conversion_rate(
    spark: SparkSession, sf_dir: str, window_hours: int = 24
) -> DataFrame:
    """Windowed conversion rate by acquisition-day cohort: of users
    whose FIRST view landed on day d, what fraction purchased within
    24 hours of it? The bounded-window form every production funnel
    metric uses (unbounded "ever converted" rates drift forever and
    can't be compared across cohorts).

    One aggregation to first views, one as-of-style min over
    qualifying purchases (equi-join on user, ≥ filter, min — no
    window), one cohort groupBy. Conversion flag and rate are exact
    integers/ppm.
    """
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    conv = (
        views.join(
            buys,
            (F.col("user_id") == F.col("b_user")) & (F.col("b_ts") >= F.col("v_ts")),
            "left",
        )
        .groupBy("user_id", "v_ts")
        .agg(F.min("b_ts").alias("p_ts"))
        .select(
            F.expr("v_ts div 86400000000000").alias("cohort_day"),
            F.when(
                F.col("p_ts").isNotNull()
                & (F.col("p_ts") - F.col("v_ts") < window_hours * 3600 * 10**9),
                1,
            )
            .otherwise(0)
            .alias("converted"),
        )
    )
    return conv.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_cohort"),
        F.sum("converted").alias("n_converted"),
        F.expr("sum(converted) * 1000000 div count(1)").alias("cvr_ppm"),
    )


def transition_dwell_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time percentiles per event-type TRANSITION: for every
    consecutive (prev → next) pair in a user's stream, the P50/P90 of
    the gap — where users hesitate (long view→click) vs race (instant
    click→purchase bots), at the transition grain the funnel summary
    hides.

    One lag window per user (the exchange the Markov/trigram ops
    share), gaps as exact integer seconds, and the same TYPE-1
    order-statistic selection as daily_value_bands — one window per
    transition + a conditional aggregate, no interpolation internals.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gaps = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("prev_tus", F.lag("tus").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select(
            "prev_type",
            F.col("event_type").alias("next_type"),
            F.expr("(tus - prev_tus) div 1000000").alias("gap_s"),
        )
    )
    wr = Window.partitionBy("prev_type", "next_type").orderBy("gap_s")
    wc = Window.partitionBy("prev_type", "next_type")
    ranked = gaps.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    def pick(p: str, alias: str):
        idx = f"CAST(floor(CAST(n - 1 AS DOUBLE) * {p}) AS BIGINT) + 1"
        return F.expr(f"max(CASE WHEN rn = {idx} THEN gap_s END)").alias(alias)
    return ranked.groupBy("prev_type", "next_type").agg(
        F.max("n").alias("n_transitions"),
        pick("0.5", "p50_gap_s"),
        pick("0.9", "p90_gap_s"),
    )


def engagement_conversion_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement→conversion curve: users bucketed by how many
    SESSIONS they ran, with each bucket's view→purchase conversion
    rate — the growth-analytics curve that says whether driving a
    second session actually moves conversion.

    Session counts reuse the gaps-and-islands derivation (one per-user
    window, sum of session starts); conversion reuses the first-view /
    first-qualifying-purchase shape. One join on user, one bounded
    groupBy (10-session bands, capped at 90+). Exact counts and ppm.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    sessions = (
        ev.withColumn(
            "new_s",
            F.when(
                F.lag("tus").over(w).isNull()
                | ((F.col("tus") - F.lag("tus").over(w)) >= 1800000000),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"))
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tus").alias("v_tus"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("tus").alias("b_tus")
    )
    conv = (
        views.join(
            buys,
            (F.col("user_id") == F.col("b_user")) & (F.col("b_tus") >= F.col("v_tus")),
            "left",
        )
        .groupBy("user_id")
        .agg(F.max(F.col("b_tus").isNotNull().cast("long")).alias("converted"))
    )
    return (
        sessions.join(conv, "user_id", "left")
        .select(
            F.least(F.expr("n_sessions div 10"), F.lit(9)).alias("session_bucket"),
            F.coalesce("converted", F.lit(0)).alias("converted"),
        )
        .groupBy("session_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").alias("n_converted"),
        )
        .withColumn("cvr_ppm", F.expr("n_converted * 1000000 div n_users"))
    )


def rollup_lattice_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation-lattice consistency check: the SAME total (event
    count + exact cents) computed at raw, hourly-rollup, and
    daily-rollup grain — three rows that must agree, turning "did a
    rollup drop rows?" into a single hash-gated query. The continuous-
    aggregate freshness check every tiered warehouse runs.

    All three tiers share the exact-cents convention, so agreement is
    EXACT (not approximate); the hourly and daily tiers re-aggregate
    the same chained plan hourly_to_daily_rollup uses.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = exact_units(F.col("value"), 2)
    raw = ev.agg(
        F.lit("raw").alias("grain"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("sum_cents"),
    )
    hourly_rel = (
        ev.groupBy(F.window(_ts_micros(), "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("c"))
    )
    hourly = hourly_rel.agg(
        F.lit("hourly").alias("grain"),
        F.sum("n").alias("n_events"),
        F.sum("c").alias("sum_cents"),
    )
    daily = (
        hourly_rel.select(
            F.expr(
                "unix_millis(w.start) - pmod(unix_millis(w.start), 86400000)"
            ).alias("day_ms"),
            "n",
            "c",
        )
        .groupBy("day_ms")
        .agg(F.sum("n").alias("n"), F.sum("c").alias("c"))
        .agg(
            F.lit("daily").alias("grain"),
            F.sum("n").alias("n_events"),
            F.sum("c").alias("sum_cents"),
        )
    )
    return raw.unionAll(hourly).unionAll(daily)


def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E209: hourly OHLC (open/high/low/close) bars per event_type —
    the candlestick rollup of every market-data / metrics warehouse
    (TimescaleDB ``candlestick_agg``, kdb+ bars), here over
    ``events.value``.

    Spark-first shape: ONE ``groupBy(window × type)`` with ``min_by`` /
    ``max_by`` keyed on the (tus, event_id) arrival struct — all four
    bar fields are classic algebraic aggregates with map-side partial
    aggregation, so the exchange carries one row per (hour × type)
    regardless of input size. The alternative (row_number window to
    pick first/last) would sort every partition; min_by folds instead.

    Determinism: (tus, event_id) is a unique ordering key (event_id is
    unique), so open/close are well-defined — no arbitrary-tie
    ``first()``; values travel as exact integer cents and divide back
    to 2dp doubles only at the end.
    """
    ev = load_table(spark, sf_dir, "events")
    tus = F.expr("ts div 1000")
    key = F.struct(tus.alias("t"), F.col("event_id").alias("e"))
    cents = exact_units(F.col("value"), 2)
    return (
        ev.select(
            F.window(_ts_micros(), "1 hour").alias("w"),
            F.col("event_type"),
            key.alias("k"),
            cents.alias("cents"),
        )
        .groupBy(F.unix_millis(F.col("w.start")).alias("hs_ms"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.min_by("cents", "k") / F.lit(100.0)).alias("open_v"),
            (F.max("cents") / F.lit(100.0)).alias("high_v"),
            (F.min("cents") / F.lit(100.0)).alias("low_v"),
            (F.max_by("cents", "k") / F.lit(100.0)).alias("close_v"),
        )
    )


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E210: per-user daily TIME-WEIGHTED average value (TWAP) with
    last-observation-carried-forward — the irregular-series average of
    sensor/price pipelines (TimescaleDB ``time_weight('LOCF')``), where
    a plain ``avg`` over-weights bursty samplers.

    Each event's value is held from its timestamp to the next event in
    the same user-day, the last until the day boundary; the average
    weights each value by its holding time.

    One shuffle total: ``lead`` over (user_id, day) supplies the hold
    interval, and the groupBy reuses the exact same keys, so Catalyst
    plans a single hash exchange feeding both the window sort and the
    aggregation.

    Determinism at the gate: weights are exact µs longs, values exact
    cents — ``Σ(cents·dt)`` stays below 2^63 (≤ 9e15 per user-day at
    cents ≤ 5e4, dt ≤ 8.64e10), and the final TWAP is a pure integer
    ``div`` (values non-negative, so trunc = floor across engines) to
    4dp units. No float ever enters an aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    tus = F.expr("ts div 1000")
    base = ev.select(
        F.col("user_id"),
        F.col("event_id"),
        tus.alias("tus"),
        exact_units(F.col("value"), 2).alias("cents"),
    ).withColumn("day_ms", F.expr("(tus div 86400000000) * 86400000"))
    w = W.partitionBy("user_id", "day_ms").orderBy("tus", "event_id")
    held = base.withColumn(
        "dt_us",
        F.coalesce(F.lead("tus").over(w), F.col("day_ms") * 1000 + F.lit(86400000000))
        - F.col("tus"),
    )
    return (
        held.groupBy("user_id", "day_ms")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("dt_us").alias("held_us"),
            F.sum(F.col("cents") * F.col("dt_us")).alias("wsum"),
        )
        .select(
            "user_id",
            "day_ms",
            "n_events",
            "held_us",
            (F.expr("(wsum * 100) div held_us") / F.lit(10000.0)).alias("twap_v"),
        )
    )


def last_touch_attribution(
    spark: SparkSession, sf_dir: str, lookback_us: int = 604_800_000_000
) -> DataFrame:
    """EXT E211: last-touch revenue attribution — every purchase is
    credited to the same user's most recent preceding touch event
    (view / click / signup) within a 7-day lookback, else ``direct``;
    reported as purchases + exact revenue per attributed channel.

    Spark-first shape: NOT an as-of join of two relations (that would
    shuffle both sides) — touches and purchases already live in one
    table, so a single ``last(..., ignorenulls=True)`` running window
    over (user, time) carries the latest touch forward to each
    purchase row: ONE shuffle on user_id, one per-user sort, then a
    tiny groupBy. Same-instant touches attribute (ties order touches
    before purchases via a 0/1 rank key, making the semantics — and
    the hash — deterministic).

    At 100 TB the window state is O(1) per row (running last, no
    frame buffering); skewed users are the only risk — the same AQE /
    bot-prefilter note as sessionization (E10) applies.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("tus"),
        exact_units(F.col("value"), 2).alias("cents"),
        F.col("event_type").isin("view", "click", "signup").cast("int").alias("is_touch"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tus", (1 - F.col("is_touch")).asc(), "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = base.select(
        "*",
        F.last(F.when(F.col("is_touch") == 1, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("lt_type"),
        F.last(F.when(F.col("is_touch") == 1, F.col("tus")), ignorenulls=True)
        .over(w)
        .alias("lt_tus"),
    )
    return (
        flagged.filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("lt_tus").isNotNull()
                & (F.col("lt_tus") >= F.col("tus") - F.lit(lookback_us)),
                F.col("lt_type"),
            )
            .otherwise(F.lit("direct"))
            .alias("channel"),
            "cents",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            (F.sum("cents") / F.lit(100.0)).alias("revenue"),
        )
    )


def transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E219: next-step predictability — per from-type, the Shannon
    entropy of the next-event distribution (micro-nats) plus the modal
    next step. Low entropy ⇒ the journey is deterministic (good for
    prefetching / next-action models); high ⇒ the Markov LM adds
    nothing over marginals. Composes the verified transition counts
    with the user_event_entropy exactness convention: per-cell
    ``round(−ln(c/t)·1e6)`` BEFORE the weighted sum, floored integer
    division — no float aggregate anywhere.
    """
    trans = event_transition_matrix(spark, sf_dir)
    tot = trans.groupBy("from_type").agg(
        F.sum("n_transitions").alias("t"),
        F.count(F.lit(1)).alias("n_to_types"),
        F.max("n_transitions").alias("mx"),
    )
    j = trans.join(F.broadcast(tot), "from_type")
    ent = j.groupBy("from_type").agg(
        F.max("t").alias("n_transitions"),
        F.max("n_to_types").alias("n_to_types"),
        F.sum(
            F.expr(
                "n_transitions * CAST(round(ln(CAST(n_transitions AS DOUBLE)"
                " / CAST(t AS DOUBLE)) * -1000000, 0) AS BIGINT)"
            )
        ).alias("sum_units"),
    )
    mode = (
        j.filter(F.col("n_transitions") == F.col("mx"))
        .groupBy("from_type")
        .agg(F.min("to_type").alias("mode_to_type"))
    )
    return (
        ent.join(F.broadcast(mode), "from_type")
        .select(
            "from_type",
            "n_transitions",
            "n_to_types",
            "mode_to_type",
            F.expr("sum_units div n_transitions").alias("entropy_micro"),
        )
    )


def bounded_funnel(
    spark: SparkSession,
    sf_dir: str,
    click_window_us: int = 3_600_000_000,
    purchase_window_us: int = 86_400_000_000,
) -> DataFrame:
    """EXT E222: TIME-BOUNDED funnel — view → click within 1 h of the
    first view → purchase within 24 h of the first qualifying click.
    The realistic variant of E? funnel_stages: unbounded funnels credit
    conversions weeks later; bounded windows are what growth teams
    actually report.

    Same stacked running-min window trick as funnel_stages — the upper
    bound composes because ``run_t1`` is non-increasing in event-time
    order, so at any row it equals the first view seen so far and
    ``ts ≤ run_t1 + W`` is exactly "within W of the first view". One
    shuffle on user_id, one shared sort, then a 1-row global fold.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts_us"), F.asc("event_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts_us"))
    run_t1 = F.min(view_ts).over(w)
    click_q = F.when(
        (F.col("event_type") == "click")
        & (F.col("ts_us") >= run_t1)
        & (F.col("ts_us") <= run_t1 + F.lit(click_window_us)),
        F.col("ts_us"),
    )
    run_t2 = F.min(click_q).over(w)
    purch_q = F.when(
        (F.col("event_type") == "purchase")
        & (F.col("ts_us") >= run_t2)
        & (F.col("ts_us") <= run_t2 + F.lit(purchase_window_us)),
        F.col("ts_us"),
    )
    agg = (
        ev.select(
            "user_id",
            view_ts.alias("v_ts"),
            click_q.alias("c_ts"),
            purch_q.alias("p_ts"),
        )
        .groupBy("user_id")
        .agg(
            F.min("v_ts").alias("tv"),
            F.min("c_ts").alias("tc"),
            F.min("p_ts").alias("tp"),
        )
    )
    return agg.agg(
        F.sum(F.col("tv").isNotNull().cast("long")).alias("n_view_users"),
        F.sum(F.col("tc").isNotNull().cast("long")).alias("n_click_1h"),
        F.sum(F.col("tp").isNotNull().cast("long")).alias("n_purchase_24h"),
    ).select(
        "n_view_users",
        "n_click_1h",
        "n_purchase_24h",
        F.expr("n_click_1h * 1000000 div n_view_users").alias("view_to_click_ppm"),
        F.expr("n_purchase_24h * 1000000 div n_click_1h").alias("click_to_purchase_ppm"),
    )


def late_event_profile(
    spark: SparkSession,
    sf_dir: str,
    lateness_ms: tuple = (0, 300_000, 1_800_000),
    n_parts: int = 8,
) -> DataFrame:
    """EXT E231: watermark lateness audit — for each candidate allowed
    lateness L, how many events would a streaming watermark drop?
    An event is late when its event-time is older than (max event-time
    ARRIVED strictly before it) − L. This table IS how you pick
    ``withWatermark`` delay: the smallest L whose drop rate is
    acceptable.

    The fixture's ingestion id is perfectly time-ordered (a generator
    artifact no real pipeline has), so arrival time is modeled as
    event-time + a DETERMINISTIC md5 ingestion jitter of 0–10 minutes
    per event — the transport-delay distribution a watermark actually
    absorbs, reproducible in both engines (the md5_bucket convention,
    never rand()).

    The global running max over arrival order is the single-task
    window trap, so it uses the sequence_packing two-phase scan:
    range-partition by arrival key, per-partition local running max,
    tiny per-partition maxima prefix-maxed and broadcast back. All
    levels read the SAME staged relation — one pass, three counters.
    """
    from pyspark.sql import Window as W

    from parquet_to_csv_spark.operators.corpus import md5_bucket

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        (
            F.expr("ts div 1000000")
            + md5_bucket(F.col("event_id"), 600_000).cast("long")
        ).alias("arr_ms"),
    )
    base = ev.repartitionByRange(n_parts, "arr_ms", "event_id").withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = (
        W.partitionBy("pid")
        .orderBy("arr_ms", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = base.withColumn("lmax", F.max("ts_ms").over(w_local))
    totals = base.groupBy("pid").agg(F.max("ts_ms").alias("pmax"))
    w_off = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.withColumn("omax", F.max("pmax").over(w_off)).select("pid", "omax")
    run = local.join(F.broadcast(offsets), "pid").select(
        "event_id",
        "ts_ms",
        F.greatest(
            F.coalesce("lmax", F.lit(-(2**62))), F.coalesce("omax", F.lit(-(2**62)))
        ).alias("wm_base"),
    )
    levels = []
    for lat in lateness_ms:
        levels.append(
            run.agg(
                F.lit(lat).cast("long").alias("lateness_ms"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum(
                    (F.col("ts_ms") < F.col("wm_base") - F.lit(lat)).cast("long")
                ).alias("n_late"),
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionAll(lv)
    return out.select(
        "lateness_ms",
        "n_events",
        "n_late",
        F.expr("n_late * 1000000 div n_events").alias("late_ppm"),
    )


def daily_acf(spark: SparkSession, sf_dir: str, max_lag: int = 7) -> DataFrame:
    """EXT E242: autocorrelation function of the daily value series at
    lags 1..7 — the numeric seasonality detector (a lag-7 spike IS
    weekly seasonality; lag-1 persistence says how smoothable the
    series is). Complements the seasonal-naive backtest (which assumes
    lag-7) by MEASURING which lag carries signal.

    The raw scan collapses to the tiny daily relation (exact cents)
    once; each lag is one self-join on day+lag over ~|days| rows, and
    r(ℓ) comes from the standard sufficient statistics in one fixed
    IEEE pipeline over exact longs, floored to micro-units. Day gaps
    simply drop pairs (both sides must exist) — the same contract an
    ACF over a calendar with holes needs.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts div 86400000000000").alias("day"),
        exact_units(F.col("value"), 2).alias("cents"),
    )
    daily = ev.groupBy("day").agg(F.sum("cents").alias("y")).transform(_dedup_cut)
    out = None
    num = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    den = (
        "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
    )
    for lag in range(1, max_lag + 1):
        a = daily.select(F.col("day").alias("d"), F.col("y").alias("x"))
        b = daily.select((F.col("day") - lag).alias("d"), F.col("y").alias("z"))
        s = (
            a.join(b, "d")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"),
                F.sum("z").alias("sy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("z") * F.col("z")).alias("syy"),
                F.sum(F.col("x") * F.col("z")).alias("sxy"),
            )
            .select(
                F.lit(lag).cast("long").alias("lag"),
                "n",
                F.expr(
                    f"CAST(floor({num} / {den} * 1000000.0) AS BIGINT)"
                ).alias("acf_micro"),
            )
        )
        out = s if out is None else out.unionAll(s)
    return out


def circadian_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E248: circular statistics of activity time-of-day per event
    type — the MEAN HOUR via the circular mean (arctan of summed unit
    vectors) and the resultant length R (0 = uniform around the clock,
    1 = perfectly peaked). Plain averages of hour-of-day are wrong at
    the midnight wrap (mean of 23h and 1h is 12h); circular stats are
    the correct tool, and R is the concentration score a scheduling /
    anomaly system actually wants.

    Determinism: hours are 24 discrete angles, so cos/sin take only 24
    values — each quantized ONCE to integer micro-units (fixed
    constants both engines compute identically from ``cos(h·π/12)``),
    making the vector sums exact long arithmetic; the final atan2 /
    sqrt run as one fixed IEEE pipeline over two exact longs. One
    groupBy with map-side combine; output is micro-radians and ppm.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("(ts div 3600000000000) % 24").alias("h"),
    )
    cos_u = "CAST(round(cos(CAST(h AS DOUBLE) * pi() / 12.0) * 1000000) AS BIGINT)"
    sin_u = "CAST(round(sin(CAST(h AS DOUBLE) * pi() / 12.0) * 1000000) AS BIGINT)"
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(cos_u)).alias("sc"),
        F.sum(F.expr(sin_u)).alias("ss"),
    )
    r_expr = (
        "sqrt(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)"
        " + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * 1000000.0)"
    )
    ang = "atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE))"
    return s.select(
        "event_type",
        "n",
        F.expr(f"CAST(floor({ang} * 1000000.0) AS BIGINT)").alias("mean_angle_micro"),
        F.expr(f"CAST(floor({r_expr} * 1000000.0) AS BIGINT)").alias("resultant_ppm"),
    )


def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E252: DAU/MAU stickiness — per calendar month: monthly
    active users, average daily active users, and the stickiness ratio
    (avg DAU / MAU, in ppm) — the engagement-density KPI every
    consumer product reports. avg-DAU folds the per-day distinct
    counts; MAU is the month-level distinct — two keyed aggregations
    over one scan-derived relation, both with map-side combine, the
    month relation tiny.

    Integer determinism: day and month keys are pure epoch integer
    arithmetic (UTC contract); the ratio is floored ppm of exact
    longs (sum of daily DAUs ·1e6 div (days·MAU)).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts div 86400000000000").alias("day"),
    )
    # month key from the epoch day via integer civil-calendar arithmetic
    # would need a calendar; the events span ~1-2 months so use the
    # day-granular timestamp's year*100+month under UTC (session.py).
    ev = ev.withColumn(
        "ym",
        F.expr(
            "CAST(year(timestamp_micros(day * 86400000000)) * 100"
            " + month(timestamp_micros(day * 86400000000)) AS BIGINT)"
        ),
    )
    daily = ev.groupBy("ym", "day").agg(F.countDistinct("user_id").alias("dau"))
    monthly = ev.groupBy("ym").agg(F.countDistinct("user_id").alias("mau"))
    dsum = daily.groupBy("ym").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("dau").alias("dau_sum")
    )
    return (
        dsum.join(monthly, "ym")
        .select(
            "ym",
            "n_days",
            "mau",
            F.expr("dau_sum div n_days").alias("avg_dau"),
            F.expr("dau_sum * 1000000 div (n_days * mau)").alias("stickiness_ppm"),
        )
    )


def dow_type_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E257: day-of-week × event-type MOSAIC residuals — for each
    cell of the contingency table, the standardized Pearson residual
    (obs − exp)/√exp under independence. The inference layer on top of
    the raw activity heatmap: |residual| > 2 marks cells where the
    weekly rhythm genuinely differs by event type rather than by
    volume.

    Expected counts are exact integer cross-products over the marginal
    relations (row·col, total); the residual is one fixed IEEE
    pipeline over three exact longs, floored to milli-units; the flag
    is an integer comparison on the milli value so it can never flap.
    One scan, two tiny broadcast marginals.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("((ts div 86400000000000) + 4) % 7").alias("dow"), "event_type"
    )
    cells = ev.groupBy("dow", "event_type").agg(F.count(F.lit(1)).alias("o"))
    rows_ = ev.groupBy("dow").agg(F.count(F.lit(1)).alias("r"))
    cols = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    resid = (
        "(CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)"
        " / CAST(n AS DOUBLE))"
        " / sqrt(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
    )
    return (
        cells.join(F.broadcast(rows_), "dow")
        .join(F.broadcast(cols), "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "event_type",
            "o",
            F.expr("r * c div n").alias("expected"),
            F.expr(f"CAST(floor({resid} * 1000.0) AS BIGINT)").alias("resid_milli"),
            (
                F.abs(F.expr(f"CAST(floor({resid} * 1000.0) AS BIGINT)"))
                > 2000
            ).cast("long").alias("significant"),
        )
    )


def error_burst_sessions(
    spark: SparkSession, sf_dir: str, min_events: int = 2
) -> DataFrame:
    """EXT E259: error-interrupted session detector — sessions (30-min
    gap, the E10 definition) where an error occurred amid other
    activity (≥ ``min_events`` events, ≥1 error): the rule-based CEP
    alert of reliability dashboards ("this user hit a failure
    mid-journey"), with the error share and the session's value at
    stake. The threshold is a knob; the fixture's sessions are short
    (≤3 events), so the gate pins the ≥2-with-error shape — the
    plan is identical at any cut.

    Composes the verified session_window aggregation — the detector
    adds conditional counts inside the SAME groupBy (zero extra
    shuffles) and one integer-ppm filter. At scale, alerting runs the
    identical expressions on the streaming session path (E9/E10
    parity contract).
    """
    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy(F.session_window(_ts_micros(), "30 minutes").alias("s"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
            F.sum(exact_units(F.col("value"), 2)).alias("sv_cents"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("s.start")).alias("session_start_us"),
            "n_events",
            "n_errors",
            F.expr("n_errors * 1000000 div n_events").alias("error_ppm"),
            (F.col("sv_cents") / F.lit(100.0)).alias("session_value"),
        )
    )
    return sess.filter(
        (F.col("n_events") >= min_events) & (F.col("n_errors") >= 1)
    )


def abandonment_last_event(
    spark: SparkSession, sf_dir: str, window_us: int = 86_400_000_000
) -> DataFrame:
    """EXT E265: abandonment analysis — among users who did NOT
    purchase within 24 h of their first view, where did that bounded
    journey end? The distribution of the LAST event type inside the
    24 h post-first-view window, shares in exact ppm. The
    funnel-debugging companion to the windowed-conversion queries: an
    abandonment tail dominated by 'error' says the product broke; by
    'click' says intent died at the decision point. (The unbounded
    "never purchased" cohort is empty in this fixture — every user
    eventually buys — so the op measures the bounded-window cohort,
    which is also what a growth team actually reviews.)

    Two keyed aggregations: first-view times (tiny), then one joined
    pass computing the window's last event (``max_by`` over the unique
    (tus, event_id) struct) and the conversion flag in the SAME
    groupBy — no window function, one shuffle on user_id.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("ts div 1000").alias("tus"),
        "event_id",
    )
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tus").alias("vt"))
    )
    windowed = ev.join(first_view, "user_id").filter(
        (F.col("tus") >= F.col("vt"))
        & (F.col("tus") < F.col("vt") + F.lit(window_us))
    )
    per_user = windowed.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("long")).alias("purchased"),
        F.expr("max_by(event_type, struct(tus, event_id))").alias("last_type"),
    )
    nonconv = per_user.filter(F.col("purchased") == 0)
    counts = nonconv.groupBy("last_type").agg(F.count(F.lit(1)).alias("n_users"))
    tot = nonconv.agg(F.count(F.lit(1)).alias("n_tot"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "last_type",
        "n_users",
        F.expr("n_users * 1000000 div n_tot").alias("share_ppm"),
    )


def onboarding_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E270: onboarding latency — from each user's FIRST signup to
    their next event of any other type: P50/P90 and the count still
    waiting (signup is the last thing they ever did). The
    activation-speed metric of onboarding funnels; slow or absent
    follow-up is the earliest churn signal there is.

    Per-user gap in one pass: the signup anchor and the first
    post-signup event come from conditional ``min`` aggregates in a
    single groupBy (no window, no self-join); percentiles are selected
    order statistics of exact µs gaps over the users relation
    (daily_value_bands convention), ranked by
    ``relational.banded_row_number`` (hour-banded local ranks +
    broadcast band offsets — no unpartitioned window over the user
    grain).
    """
    from parquet_to_csv_spark.operators.relational import banded_row_number

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("tus")
    )
    su = F.when(F.col("event_type") == "signup", F.col("tus"))
    per_user = ev.groupBy("user_id").agg(F.min(su).alias("signup_tus"))
    after = (
        ev.join(per_user, "user_id")
        .filter(
            F.col("signup_tus").isNotNull()
            & (F.col("tus") > F.col("signup_tus"))
            & (F.col("event_type") != "signup")
        )
        .groupBy("user_id")
        .agg(F.min("tus").alias("next_tus"))
    )
    gaps = (
        per_user.filter(F.col("signup_tus").isNotNull())
        .join(after, "user_id", "left")
        .select(
            "user_id",
            (F.col("next_tus") - F.col("signup_tus")).alias("gap_us"),
        )
    )
    ranked = banded_row_number(
        gaps.filter(F.col("gap_us").isNotNull()),
        ["gap_us", "user_id"],
        F.expr("gap_us div 3600000000"),
        out_col="rn",
        total_col="n",
    ).select("gap_us", "rn", "n")

    def pick(p: str, alias: str):
        idx = f"CAST(floor(CAST(n - 1 AS DOUBLE) * {p}) AS BIGINT) + 1"
        return F.expr(f"max(CASE WHEN rn = {idx} THEN gap_us END)").alias(alias)

    stats = ranked.agg(
        F.count(F.lit(1)).alias("n_activated"),
        pick("0.5", "p50_gap_us"),
        pick("0.9", "p90_gap_us"),
    )
    waiting = gaps.agg(
        F.sum(F.col("gap_us").isNull().cast("long")).alias("n_waiting")
    )
    return stats.crossJoin(F.broadcast(waiting))


def type_comovement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E272: event-type co-movement — Pearson correlation of DAILY
    value sums between every pair of event types (days present in
    both). A high click↔purchase daily correlation says the funnel
    moves as one system; an error series uncorrelated with everything
    else says failures are exogenous. The cross-series sibling of the
    within-series ACF (E242).

    The raw scan collapses once to the tiny (type × day) relation
    (exact cents, localCheckpoint so the 10 pair branches never
    re-derive it); each pair is one equi-join on day + sufficient
    statistics + one fixed-IEEE r floored to micro-units. The type
    domain is the declared closed set (the explicit-pivot-values
    convention) — enumerating it with a ``.distinct().collect()``
    would put a driver action in the plan-build path, the round-1
    ivf_topk defect class.
    """
    types = ["click", "error", "purchase", "signup", "view"]
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts div 86400000000000").alias("day"),
        exact_units(F.col("value"), 2).alias("cents"),
    )
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.sum("cents").alias("y"))
        .transform(_dedup_cut)
    )
    num = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    den = (
        "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
    )
    out = None
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            a = daily.filter(F.col("event_type") == ta).select(
                "day", F.col("y").alias("x")
            )
            b = daily.filter(F.col("event_type") == tb).select(
                "day", F.col("y").alias("z")
            )
            s = (
                a.join(b, "day")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("x").alias("sx"),
                    F.sum("z").alias("sy"),
                    F.sum(F.col("x") * F.col("x")).alias("sxx"),
                    F.sum(F.col("z") * F.col("z")).alias("syy"),
                    F.sum(F.col("x") * F.col("z")).alias("sxy"),
                )
                .select(
                    F.lit(ta).alias("type_a"),
                    F.lit(tb).alias("type_b"),
                    "n",
                    F.expr(
                        f"CAST(floor({num} / {den} * 1000000.0) AS BIGINT)"
                    ).alias("corr_micro"),
                )
            )
            out = s if out is None else out.unionAll(s)
    return out


def bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E275: bounce rate by entry type — per session entry event
    type: sessions started, single-event sessions ("bounces"), and the
    bounce ppm. THE landing-quality number of web analytics: an entry
    type with a high bounce share acquires visits that go nowhere.

    Reuses the E10 session definition (30-min gaps) via one
    gaps-and-islands window; entry type and session size come from the
    same per-session aggregation (``min_by`` on the arrival struct +
    count — one exchange); the rollup is |types| rows.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("tus"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = ev.withColumn(
        "new_s",
        (
            F.col("tus") - F.lag("tus").over(w) >= 1_800_000_000
        ).cast("long"),
    ).withColumn(
        "sid",
        F.sum(F.coalesce("new_s", F.lit(1))).over(
            w.rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    sessions = flagged.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("min_by(event_type, struct(tus, event_id))").alias("entry_type"),
    )
    return sessions.groupBy("entry_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long")).alias("n_bounces"),
        F.expr(
            "sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000 div count(1)"
        ).alias("bounce_ppm"),
    )


def funnel_stage_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E278: funnel stage-lag decomposition — for users who
    completed the unbounded funnel (E?), the P50/P90 of each stage
    transition (first view → first qualified click, click → purchase).
    Conversion RATES say where users are lost; stage LAGS say where
    the product is slow — the other half of funnel diagnostics.

    Reuses the verified funnel_stages per-user relation; lags are
    exact µs integers; percentiles are selected order statistics per
    stage over the converters (daily_value_bands convention), stacked
    into one tidy (stage × stats) output.
    """
    from pyspark.sql import Window as W

    per_user = funnel_stages(spark, sf_dir)
    lags = per_user.filter(F.col("stage") == 3).select(
        (F.col("t_click_us") - F.col("t_view_us")).alias("view_to_click"),
        (F.col("t_purchase_us") - F.col("t_click_us")).alias("click_to_purchase"),
    )
    stacked = lags.selectExpr(
        "stack(2, 'view_to_click', view_to_click,"
        " 'click_to_purchase', click_to_purchase) AS (stage, lag_us)"
    )
    w = W.partitionBy("stage").orderBy("lag_us")
    wc = W.partitionBy("stage")
    ranked = stacked.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )

    def pick(p: str, alias: str):
        idx = f"CAST(floor(CAST(n - 1 AS DOUBLE) * {p}) AS BIGINT) + 1"
        return F.expr(f"max(CASE WHEN rn = {idx} THEN lag_us END)").alias(alias)

    return ranked.groupBy("stage").agg(
        F.max("n").alias("n_converters"),
        pick("0.5", "p50_lag_us"),
        pick("0.9", "p90_lag_us"),
    )


def retention_policy_audit(
    spark: SparkSession, sf_dir: str, policy_days: tuple = (7, 14, 30)
) -> DataFrame:
    """EXT E281: data-retention policy audit — per event type and
    candidate retention policy: rows OLDER than the policy at the
    as-of date (the deletion backlog a GDPR/data-minimization sweep
    would have to remove) and their share of the type's volume. The
    governance planning table read before committing to a retention
    period: it prices each policy in rows before any deletion runs.

    One scan; the as-of anchor is the plan-internal broadcast max
    event day (no driver action); every policy folds into the SAME
    aggregate as conditional counts; the unpivot is a |types| ×
    |policies| stack. All exact integers.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("ts div 86400000000000").alias("day")
    )
    anchor = ev.agg(F.max("day").alias("anchor_day"))
    base = ev.crossJoin(F.broadcast(anchor))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for d in policy_days:
        aggs.append(
            F.sum((F.col("day") < F.col("anchor_day") - F.lit(d)).cast("long")).alias(
                f"old_{d}"
            )
        )
    s = base.groupBy("event_type").agg(*aggs)
    rows = ", ".join(
        f"{d}L, old_{d}, old_{d} * 1000000 div n_rows" for d in policy_days
    )
    return s.selectExpr(
        "event_type",
        "n_rows",
        f"stack({len(policy_days)}, {rows})"
        " AS (policy_days, n_expired, expired_ppm)",
    )


def weekday_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E285: weekday seasonal index — per event type and day of
    week: the mean daily value as a ratio to the type's overall mean
    daily value, in ppm (100% = 1e6). The classical seasonal index
    table (what seasonal-naive forecasting implicitly assumes, made
    inspectable): a flat row of indexes near 1e6 says weekday
    seasonality is noise; E257's residuals test the same thing for
    COUNTS — this is the value-weighted view.

    Daily sums in exact cents feed both the per-dow and overall means;
    the index is one cross-multiplied integer division (mean_dow·1e6
    div mean_all expressed on exact long sums and counts — no float
    mean ever materializes).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts div 86400000000000").alias("day"),
        exact_units(F.col("value"), 2).alias("cents"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.sum("cents").alias("y"))
    with_dow = daily.select(
        "event_type", F.expr("(day + 4) % 7").alias("dow"), "y"
    )
    per_dow = with_dow.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("y").alias("sd")
    )
    overall = with_dow.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("na"), F.sum("y").alias("sa")
    )
    return (
        per_dow.join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            "dow",
            "nd",
            # index = (sd/nd) / (sa/na) — cross-multiplied on exact longs
            F.expr("sd * na * 1000000 div (nd * sa)").alias("index_ppm"),
        )
    )


def position_based_attribution(
    spark: SparkSession, sf_dir: str, lookback_us: int = 604_800_000_000
) -> DataFrame:
    """EXT E291: position-based (U-shaped) multi-touch attribution —
    each purchase's credit splits 40% to the FIRST touch, 40% to the
    LAST touch, and 20% evenly across the middles (the standard
    40/20/40 model), over the same 7-day lookback as last-touch
    (E211). Reported per channel in exact integer milli-credits, so
    total credit = 1000 × purchases by construction (integer
    remainders go to the first touch — a deterministic rule, not a
    float split).

    Plan: purchases join their lookback touches via the banded-bucket
    trick (7-day bands, ±1 probe); per purchase one grouped pass
    computes first/last/middle counts (``min_by``/``max_by`` on the
    arrival struct — no window); per-touch credit is then a pure
    integer expression and the channel rollup is tiny. Purchases with
    NO touch credit 'direct' in full.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("tus"),
    )
    purch = base.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("pid"),
        F.col("tus").alias("ptus"),
        F.expr(f"tus div {lookback_us}").alias("band"),
    )
    touch = base.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        F.col("user_id").alias("tu"),
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("ttype"),
        F.col("tus").alias("ttus"),
        F.explode(
            F.array(
                F.expr(f"tus div {lookback_us}"),
                F.expr(f"tus div {lookback_us} + 1"),
            )
        ).alias("band"),
    )
    j = purch.join(touch, (purch.pu == touch.tu) & (purch.band == touch.band)).filter(
        (F.col("ttus") <= F.col("ptus"))
        & (F.col("ttus") >= F.col("ptus") - F.lit(lookback_us))
    )
    per_p = j.groupBy("pid").agg(
        F.count(F.lit(1)).alias("n_touch"),
        F.expr("min_by(struct(ttype, tid), struct(ttus, tid))").alias("first_t"),
        F.expr("max_by(struct(ttype, tid), struct(ttus, tid))").alias("last_t"),
    )
    # credit rules in milli-units per purchase (sum always = 1000):
    # 1 touch: 1000 to it; 2 touches: 500/500; >=3: first 400 + ALL
    # integer remainders, last 400, middles (n-2) get 200 div (n-2).
    per_touch = j.join(per_p, "pid").select(
        "pid",
        "n_touch",
        "ttype",
        "tid",
        (F.col("tid") == F.col("first_t.tid")).alias("is_first"),
        (F.col("tid") == F.col("last_t.tid")).alias("is_last"),
    )
    mid_each = F.expr("CASE WHEN n_touch > 2 THEN 200 div (n_touch - 2) ELSE 0 END")
    mid_rem = F.expr(
        "CASE WHEN n_touch > 2 THEN 200 - (200 div (n_touch - 2)) * (n_touch - 2)"
        " ELSE 0 END"
    )
    credit = (
        F.when(F.col("n_touch") == 1, F.lit(1000))
        .when((F.col("n_touch") == 2) & F.col("is_first"), F.lit(500))
        .when((F.col("n_touch") == 2) & F.col("is_last"), F.lit(500))
        .when(F.col("is_first"), F.lit(400) + mid_rem)
        .when(F.col("is_last"), F.lit(400))
        .otherwise(mid_each)
    )
    attributed = per_touch.select("pid", "ttype", credit.alias("credit_milli"))
    n_direct = purch.join(
        per_p, purch.pid == per_p.pid, "left_anti"
    ).select(F.lit("direct").alias("ttype"), F.lit(1000).alias("credit_milli"))
    return (
        attributed.select("ttype", "credit_milli")
        .unionAll(n_direct)
        .groupBy(F.col("ttype").alias("channel"))
        .agg(
            F.sum("credit_milli").alias("credit_milli"),
            F.count(F.lit(1)).alias("n_touchpoints"),
        )
    )


def type_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E295: event-type co-usage — for every pair of event types,
    the Jaccard overlap of their USER bases (exact ppm): which
    behaviors share an audience (click∩purchase high = the funnel is
    one population) and which are disjoint segments. The audience
    view that E272's value co-movement (time view) and E219's
    transitions (sequence view) don't give.

    One distinct (type, user) relation feeds everything: per-type
    counts, and pair intersections via a self-join on user_id
    (fan-out bounded by types-per-user ≤ 5). All exact integers.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    sizes = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ev.select(F.col("event_type").alias("ta"), "user_id")
    b = ev.select(F.col("event_type").alias("tb"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("ta"), F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("tb"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .select(
            "ta",
            "tb",
            "n_both",
            F.expr("n_both * 1000000 div (na + nb - n_both)").alias("jaccard_ppm"),
        )
    )


def markov_attribution(
    spark: SparkSession, sf_dir: str, n_iter: int = 12
) -> DataFrame:
    """EXT E314: Markov removal-effect attribution — the data-driven
    multi-touch model that completes the attribution family (E211
    last-touch, E291 position-based): build the first-order journey
    chain (START → touches → CONV/NULL, purchase absorbing), compute
    the absorption probability P(CONV | START) by fixed-point
    iteration, and credit each channel by its REMOVAL EFFECT — how
    much conversion probability disappears when that channel's
    inbound edges are redirected to NULL (Anderl et al. 2014).

    Everything is relational and bounded: journeys are one ordered
    window per user; the transition matrix is a tiny (states²)
    relation; the ``n_iter`` fixed-point steps and the 1+k removal
    scenarios iterate over SCENARIO-TAGGED copies of that tiny
    relation (one groupBy per step, products cast to DECIMAL(38,18)
    before summation so the ≤|states| additions are order-exact). The
    DuckDB oracle unrolls the same iterations symbolically — bit-for-
    bit parity, no tolerance.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("us"),
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    seq = ev.withColumn("rn", F.row_number().over(w))
    conv = (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("crn"))
    )
    kept = (
        seq.join(conv, "user_id", "left")
        .filter(F.col("crn").isNull() | (F.col("rn") <= F.col("crn")))
        .select(
            "user_id",
            "rn",
            F.when(F.col("event_type") == "purchase", F.lit("CONV"))
            .otherwise(F.col("event_type"))
            .alias("st"),
        )
    )
    w2 = W.partitionBy("user_id").orderBy("rn")
    steps = (
        kept.withColumn("nxt", F.coalesce(F.lead("st").over(w2), F.lit("NULL")))
        .filter(F.col("st") != "CONV")
        .select(F.col("st").alias("cur"), "nxt")
    )
    start = kept.filter(F.col("rn") == 1).select(
        F.lit("START").alias("cur"), F.col("st").alias("nxt")
    )
    trans = steps.union(start).groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).alias("n")
    )
    # Row-normalize with a PARTITIONED window sum instead of a
    # trans⋈outs self-join: one shuffle on `cur` total, and — the real
    # reason — no shuffle join for InjectRuntimeFilter to decorate.
    # The self-join formulation made Spark push a runtime Bloom filter
    # through the steps∪start union; in the `start` branch the join key
    # is lit("START"), xxhash64 constant-folds to a NEGATIVE long, and
    # BloomFilterMightContain's codegen emits `(Long)-82…L`, which
    # Janino parses as `java.lang.Long minus literal` → 12
    # CompileException/interpreted-fallback per run (round-5 verdict
    # weak #1). The window shape is also strictly better: trans is a
    # ≤states² relation.
    wcur = W.partitionBy("cur")
    pm = trans.select(
        "cur", "nxt", (F.col("n") / F.sum("n").over(wcur)).alias("p")
    )

    # Scope runtime Bloom-filter injection OFF for the fixed-point
    # cuts executed below: every relation past this point is ≤ states²
    # × |scenarios| rows (post-cut LogicalRDDs with UNKNOWN size, so
    # the optimizer treats each loop join as "probably shuffle" and
    # would bolt two bloom_filter_agg full scans onto a ~26-row join —
    # pure overhead at any scale, and the trigger for the Janino
    # fallback documented above). The toggle is process-global session
    # conf, so it runs under scoped_session_conf's lock: concurrent
    # planners on other threads are excluded for the (construction-
    # only) critical section instead of silently losing runtime-filter
    # injection, and nesting restores the right previous value. The
    # returned plan is post-cut and join-free except 1-row broadcasts,
    # so the caller-side execution never needed the filters either.
    rbf_key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    with scoped_session_conf(spark, rbf_key, "false"):

        channels = ["view", "click", "signup", "error"]
        scen = pm.withColumn("scenario", F.lit("base"))
        for c in channels:
            redirected = pm.filter(F.col("cur") != c).select(
                "cur",
                F.when(F.col("nxt") == c, F.lit("NULL")).otherwise(F.col("nxt")).alias(
                    "nxt"
                ),
                "p",
                F.lit(c).alias("scenario"),
            )
            scen = scen.unionByName(redirected)
        # merge duplicate (scenario, cur, nxt) rows created by redirection —
        # <=2 doubles per group, summed DECIMAL-exact for order independence.
        # The lineage cut matters: `scen` is referenced by all n_iter joins;
        # without it Catalyst re-analyzes the full journey subtree at every
        # level and the lazy plan goes quadratic (measured minutes at 12
        # iterations) — cut once, iterate over a flat tiny relation.
        # coalesce(1): the matrix is <=|states|^2 x 5 rows; every fixed-point
        # job after the cut becomes a single task instead of 32 shuffle
        # partitions of nothing
        scen = _dedup_cut(
            scen.groupBy("scenario", "cur", "nxt")
            .agg(F.sum(F.col("p").cast("decimal(38,18)")).cast("double").alias("p"))
            .coalesce(1)
        )

        scenarios = scen.select("scenario").distinct()
        # NON-FOLDABLE "CONV" literal (concat with an empty slice of a real
        # column): InjectRuntimeFilter pushes might_contain(xxhash64(state))
        # into this union branch even under a broadcast hint (post-cut
        # LogicalRDDs have unknown size, so every loop join "is probably
        # shuffle"); with a plain lit("CONV") the hash constant-folds to
        # -8209931977688059988 and BloomFilterMightContain's codegen emits
        # `(Long)-82…L`, which Janino parses as `java.lang.Long - literal`
        # → CompileException + interpreted fallback (round-5 weak #1).
        # Keeping the key an expression over `scenario` keeps the generated
        # cast on a variable, which always compiles.
        conv_lit = F.concat(F.lit("CONV"), F.substring(F.col("scenario"), 1, 0))
        pk = scenarios.select("scenario", conv_lit.alias("state"),
                              F.lit(1.0).alias("pv"))
        for i in range(n_iter):
            # broadcast the (tiny, cut) transition matrix: a shuffle join
            # here invites InjectRuntimeFilter to push might_contain blooms
            # into pk's union branches, where state=lit("CONV") constant-
            # folds xxhash64 to a negative long and BloomFilterMightContain
            # codegen emits Janino-unparseable `(Long)-…L` (the other half
            # of round-5 weak #1). Broadcast joins are exempt from runtime
            # filter injection and are the correct plan for a ≤states²×|scen|
            # relation anyway.
            s = F.broadcast(scen).alias(f"s{i}")
            q = pk.alias(f"q{i}")
            stepped = (
                s.join(
                    q,
                    (F.col(f"s{i}.scenario") == F.col(f"q{i}.scenario"))
                    & (F.col(f"s{i}.nxt") == F.col(f"q{i}.state")),
                )
                .groupBy(F.col(f"s{i}.scenario"), F.col(f"s{i}.cur"))
                .agg(
                    F.sum((F.col(f"s{i}.p") * F.col(f"q{i}.pv")).cast("decimal(38,18)"))
                    .cast("double")
                    .alias("pv")
                )
                .select(
                    F.col("scenario"), F.col("cur").alias("state"), F.col("pv")
                )
            )
            # periodic cut (the CC/LPA discipline): a tiny-relation join
            # chain is cheap to ANALYZE three levels deep, so cutting every
            # third round balances job overhead vs plan growth
            pk = stepped.unionByName(
                scenarios.select(
                    "scenario", conv_lit.alias("state"), F.lit(1.0).alias("pv")
                )
            )
            if i % 3 == 2:
                pk = _dedup_cut(pk.coalesce(1))
    pstart = pk.filter(F.col("state") == "START").select("scenario", "pv")
    base = F.broadcast(
        pstart.filter(F.col("scenario") == "base").select(
            F.col("pv").alias("p_base")
        )
    )
    eff = (
        pstart.filter(F.col("scenario") != "base")
        .join(base)
        .select(
            F.col("scenario").alias("channel"),
            "p_base",
            F.col("pv").alias("p_removed"),
            F.floor(
                F.greatest(F.col("p_base") - F.col("pv"), F.lit(0.0)) * 1e6
            ).cast("long").alias("effect_micro"),
        )
    )
    tot = F.broadcast(eff.agg(F.sum("effect_micro").alias("tot_eff")))
    return (
        eff.join(tot)
        .select(
            "channel",
            F.round("p_base", 6).alias("p_conv_base"),
            F.round("p_removed", 6).alias("p_conv_removed"),
            "effect_micro",
            F.when(
                F.col("tot_eff") > 0,
                F.expr("effect_micro * 1000000 div tot_eff"),
            ).otherwise(F.lit(0)).alias("share_ppm"),
        )
    )


def dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E325: DYNAMIC-GAP sessionization — Spark's
    ``session_window`` with a per-event gap EXPRESSION (error events
    hold a session open 1 day, normal activity 3 days): the activity-
    episode model where incident-adjacent events glue together less
    readily than routine ones. The fixed-gap E10 sessionizer can't
    express this; the dynamic gap is a first-class Spark feature this
    engine exposes and gate-verifies.

    Exact semantics (oracle-replayed): each event spans
    ``[ts, ts+gap(event))``; overlapping spans merge transitively; a
    session's end is the max span end. The DuckDB twin rebuilds this
    with a strictly-prior running max of span ends and a boundary
    cumsum — new session iff ``ts >= max_prior_end`` (half-open
    windows). Epochs in exact µs.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
    )
    gap = F.when(F.col("event_type") == "error", F.lit("1 day")).otherwise(
        F.lit("3 days")
    )
    return (
        ev.groupBy("user_id", F.session_window("event_time", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("long")).alias(
                "n_errors"
            ),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("sess_start_us"),
            F.unix_micros(F.col("w.end")).alias("sess_end_us"),
            "n_events",
            "n_errors",
        )
    )


def arrival_completeness(
    spark: SparkSession, sf_dir: str, alert_below_ppm: int = 900000
) -> DataFrame:
    """EXT E330: data-arrival completeness monitor — the freshness/
    completeness SLA check an ingest pipeline alerts on: each day's
    row count scored against a SEASONAL baseline (exact median of the
    same weekday's counts over all OTHER weeks — leave-one-out so a
    partial day can't lower its own bar), in ppm, with the alert flag
    a scheduler pages on.

    The baseline median is an exact order statistic over a BOUNDED
    relation (one row per day, grouped by weekday — at 100 TB the
    day-count relation is still tiny); the leave-one-out median is
    computed pairwise within the weekday group (≤ weeks² tiny rows).
    All integer.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        F.expr("(ts div 1000) div 86400000000").alias("day")
    )
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    d = daily.withColumn("dow", F.expr("pmod(day + 4, 7)"))  # 1970-01-01 = Thursday
    a = d.select("day", "dow", "n")
    b = d.select(F.col("day").alias("o_day"), F.col("dow").alias("o_dow"),
                 F.col("n").alias("o_n"))
    # leave-one-out same-weekday peers
    peers = a.join(b, (a.dow == b.o_dow) & (a.day != b.o_day))
    w = Window.partitionBy("day").orderBy("o_n", "o_day")
    ranked = peers.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("day"))
    )
    # exact lower median: element at ceil(cnt/2)
    med = ranked.filter(F.col("rn") == F.expr("(cnt + 1) div 2")).select(
        "day", "dow", "n", F.col("o_n").alias("baseline_n")
    )
    return med.select(
        "day",
        "dow",
        "n",
        "baseline_n",
        F.expr("n * 1000000 div baseline_n").alias("completeness_ppm"),
        (F.expr("n * 1000000 div baseline_n") < alert_below_ppm)
        .cast("long")
        .alias("alert"),
    )


def stl_lite_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E331: STL-lite decomposition of the daily revenue series —
    value = trend + weekday seasonal + residual, the additive
    decomposition every anomaly/forecast pipeline starts from (the
    moving-average + seasonal-means skeleton of classical
    decomposition; full LOESS-STL swaps the smoother, same shape).

    All EXACT integer cents: trend = centered 7-day window mean
    (floored div over however many neighbors exist at the edges),
    seasonal = per-weekday mean of the detrended series (floored div),
    residual = the exact remainder. Windows run over the bounded
    one-row-per-day relation — series length, not event count.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        F.expr("(ts div 1000) div 86400000000").alias("day"),
        exact_units(F.col("value"), 2).alias("cents"),
    )
    daily = ev.groupBy("day").agg(F.sum("cents").alias("cents"))
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.select(
        "day",
        "cents",
        F.expr(
            "CAST(sum(cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING"
            " AND 3 FOLLOWING) div count(cents) OVER (ORDER BY day ROWS"
            " BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)"
        ).alias("trend_cents"),
    ).withColumn("dow", F.expr("pmod(day + 4, 7)"))
    det = t.withColumn("det", F.col("cents") - F.col("trend_cents"))
    seas = det.groupBy("dow").agg(
        F.expr("sum(det) div count(1)").alias("seasonal_cents")
    )
    return (
        det.join(F.broadcast(seas), "dow")
        .select(
            "day",
            "dow",
            "cents",
            "trend_cents",
            "seasonal_cents",
            (
                F.col("cents") - F.col("trend_cents") - F.col("seasonal_cents")
            ).alias("residual_cents"),
        )
    )


def growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E333: monthly growth accounting — the canonical MAU
    decomposition (the "growth accounting" framework popularized by
    a16z/Social Capital): every active user-month is NEW (first month
    ever), RETAINED (active previous month) or RESURRECTED (active
    before, not previous month); churn is last month's actives who
    vanished. The identity ``MAU(t) = new + retained + resurrected``
    holds by construction and the oracle checks it row by row.

    One scan → distinct (user, month) → two lag windows per user
    (previous active month + first month), tiny month rollup. E129's
    weekly new/returning and E292's win-back are the adjacent views;
    this is the full ledger.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("(ts div 1000) div 86400000000 div 30").alias("mo"),
    )
    um = ev.distinct()
    w = Window.partitionBy("user_id").orderBy("mo")
    tagged = um.select(
        "user_id",
        "mo",
        F.lag("mo").over(w).alias("prev_mo"),
        F.min("mo").over(
            Window.partitionBy("user_id").orderBy("mo").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("first_mo"),
    ).withColumn(
        "status",
        F.when(F.col("mo") == F.col("first_mo"), F.lit("new"))
        .when(F.col("prev_mo") == F.col("mo") - 1, F.lit("retained"))
        .otherwise(F.lit("resurrected")),
    )
    mau = tagged.groupBy("mo").agg(
        F.count(F.lit(1)).alias("mau"),
        F.sum((F.col("status") == "new").cast("long")).alias("n_new"),
        F.sum((F.col("status") == "retained").cast("long")).alias("n_retained"),
        F.sum((F.col("status") == "resurrected").cast("long")).alias(
            "n_resurrected"
        ),
    )
    # churned(t) = actives(t-1) − retained(t)
    prev = mau.select((F.col("mo") + 1).alias("mo"), F.col("mau").alias("prev_mau"))
    return (
        mau.join(prev, "mo", "left")
        .select(
            "mo",
            "mau",
            "n_new",
            "n_retained",
            "n_resurrected",
            (F.coalesce(F.col("prev_mau"), F.lit(0)) - F.col("n_retained")).alias(
                "n_churned"
            ),
        )
    )


def count_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E334: overdispersion screen for daily event counts — the
    variance-to-mean (Fisher dispersion) index per event type: ≈1e6
    ppm means Poisson-like arrivals, ≫1e6 means bursty/contagious
    processes (and invalidates Poisson-based alert thresholds —
    pairs with E136 interarrival burstiness and the E330 SLA
    monitor). Exact integer sufficient statistics over the bounded
    day relation; index in floored ppm of the population
    variance/mean ratio: ``(k·Σn² − (Σn)²) · 10⁶ div (k·Σn)``.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("(ts div 1000) div 86400000000").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("k_days"),
            F.sum("n").alias("total"),
            F.sum(F.col("n") * F.col("n")).alias("ss"),
        )
        .select(
            "event_type",
            "k_days",
            "total",
            F.expr("total div k_days").alias("mean_daily"),
            F.expr(
                "(k_days * ss - total * total) * 1000000 div (k_days * total)"
            ).alias("dispersion_ppm"),
        )
    )


def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E362: Mann–Kendall trend test on the daily value series —
    the standard nonparametric "is this metric actually trending?"
    test (no linearity or normality assumption, robust to outliers),
    the inferential companion to E167's Theil–Sen slope: Theil–Sen
    says how steep, Mann–Kendall says whether the monotone trend is
    statistically real.

    Exact integer statistics: S = Σ_{i<j} sign(y_j − y_i) over all
    day pairs, and the tie-corrected variance carried as the integer
    numerator var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) (18·Var — no
    division until the end). The z score applies the standard ±1
    continuity correction and is the only float: two correctly-rounded
    IEEE ops (sqrt, divide) on identical exact integers, so both
    engines realize the same double bit-for-bit; the trend call
    compares |z| to 1.96.

    Scale: the raw scan collapses to the calendar-day grain first
    (map-side combine); the O(n²) pair enumeration runs on the tiny
    broadcast daily relation (n = days, bounded by the calendar — a
    century is 36 525 rows), never on events.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts div 86400000000000").alias("day"),
        exact_units(F.col("value"), 2).alias("cents"),
    )
    daily = ev.groupBy("day").agg(F.sum("cents").alias("y")).transform(_dedup_cut)
    a = daily.select(F.col("day").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("day").alias("db"), F.col("y").alias("yb"))
    s_stat = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
                .cast("long")
            ).alias("s")
        )
    )
    n_agg = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.expr("t * (t - 1) * (2 * t + 5)")), F.lit(0)
            ).alias("tie_sum")
        )
    )
    z = (
        "CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)"
        " / sqrt(CAST(var18 AS DOUBLE) / 18.0)"
        " WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)"
        " / sqrt(CAST(var18 AS DOUBLE) / 18.0)"
        " ELSE 0.0 END"
    )
    return (
        s_stat.crossJoin(F.broadcast(n_agg))
        .crossJoin(F.broadcast(ties))
        .select(
            "n",
            "s",
            F.expr("n * (n - 1) * (2 * n + 5) - tie_sum").alias("var18"),
        )
        .select(
            "n",
            "s",
            "var18",
            F.expr(z).alias("z"),
            F.expr(
                f"CASE WHEN {z} > 1.96 THEN 'increasing'"
                f" WHEN {z} < -1.96 THEN 'decreasing'"
                " ELSE 'no_trend' END"
            ).alias("trend"),
        )
    )


def closing_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E379: semi-additive measure — the accounting aggregation
    rule additive rollups get WRONG. A balance-like measure (here: a
    user's running engagement value, stand-in for an account balance)
    is additive ACROSS accounts but NOT across time: a month's figure
    is the sum of each account's LAST observation in that month, not
    the sum of all observations. Plan: per (user, month) closing value
    via one PARTITIONED row_number window (user×month grain — hashes
    across the cluster, never global), then an additive rollup across
    users, then month-over-month delta over the bounded calendar
    grain. Ties on ts break by event_id — deterministic in both
    engines.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.expr("cast((ts div 86400000000000) div 30 as int)").alias("month"),
        exact_units(F.col("value"), 2).alias("cents"),
    )
    # Order at µs grain (the fixture's timestamp resolution): Spark holds
    # ns-as-long, DuckDB truncates to µs — ordering raw ns here against an
    # ms/µs oracle would pick a different "last" row on sub-grain ties.
    w = Window.partitionBy("user_id", "month").orderBy(
        F.desc(F.expr("ts div 1000")), F.desc("event_id")
    )
    closing = (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("month", "cents")
    )
    monthly = closing.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_accounts"),
        F.sum("cents").alias("closing_total_cents"),
    )
    wm = Window.orderBy("month")
    return monthly.select(
        "month",
        "n_accounts",
        "closing_total_cents",
        (
            F.col("closing_total_cents")
            - F.coalesce(
                F.lag("closing_total_cents").over(wm), F.lit(0)
            )
        ).alias("mom_delta_cents"),
    )


def slo_burn_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E383: multi-window SLO burn-rate alerting (the SRE-workbook
    pattern, public): an alert fires only when BOTH a fast window
    (1 day here; 1 h in an ops deployment) and a slow window (7 days)
    burn error budget faster than threshold — the fast window gives
    response time, the slow window suppresses blips, and requiring
    both kills the flappiness either alone would have.

    error rate = error events / all events per calendar day (exact
    ppm); slow window = 7-day rolling sums over the bounded calendar
    grain (rows, not ranges — day gaps carry forward honestly); burn
    = rate / SLO-budget-rate with SLO 99 % ⇒ budget 10 000 ppm; alert
    when fast burn ≥ 2 AND slow burn ≥ 2 (integer comparisons — ppm
    vs 2×budget — so the flags are engine-exact). One scan → day
    partials; every window runs over the day grain.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr("ts div 86400000000000").alias("day"),
            (F.col("event_type") == "error").cast("long").alias("is_err"),
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("is_err").alias("n_err"))
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    rates = daily.select(
        "day",
        "n",
        "n_err",
        F.expr("n_err * 1000000 div n").alias("fast_ppm"),
        F.sum("n_err").over(w7).alias("_e7"),
        F.sum("n").over(w7).alias("_n7"),
    ).select(
        "day",
        "n",
        "n_err",
        "fast_ppm",
        F.expr("_e7 * 1000000 div _n7").alias("slow_ppm"),
    )
    budget = 10_000  # 99% SLO -> 1% error budget in ppm
    return rates.select(
        "day",
        "n",
        "n_err",
        "fast_ppm",
        "slow_ppm",
        (
            (F.col("fast_ppm") >= 2 * budget)
            & (F.col("slow_ppm") >= 2 * budget)
        ).alias("page_alert"),
    )


def median_polish_dow_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E387: Tukey median polish of the (day-of-week × event-type)
    revenue table — the ROBUST two-way decomposition (E257's mosaic
    uses Pearson residuals under independence; this fits additive
    row + column effects by medians, so a single wild cell cannot
    drag the fit the way mean-based two-way ANOVA lets it).

    Two full sweeps (row medians subtracted into row effects, then
    column medians into column effects — the classic fixed-iteration
    form). Every median is the LOWER median over a tiny bounded axis
    (7 rows / 5 columns, both odd ⇒ true middle element), computed as
    ``element_at(sort_array(collect_list(...)))`` on exact cents —
    integers end-to-end, DuckDB ``quantile_disc(0.5)`` is the twin.
    The data touch is ONE scan into the 35-cell table; the polish
    itself runs on metadata-sized relations.
    """
    from parquet_to_csv_spark.operators.dedup import _materialize_once

    ev = load_table(spark, sf_dir, "events")
    # Round 12 (guide §5 — cut lineage for iterative reuse): the 35-cell
    # table is referenced by every polish sweep AND the final 4-way
    # join; un-materialized, each broadcast median branch re-planned the
    # full events scan+aggregate (exchange reuse saved the scan but the
    # plan still carried ~25 copies of the subtree). One lazy
    # localCheckpoint makes the polish run on a 35-row relation.
    cells = _materialize_once(
        ev.select(
            F.expr("cast(((ts div 86400000000000) + 4) % 7 as int)").alias(
                "dow"
            ),
            "event_type",
            exact_units(F.col("value"), 2).alias("cents"),
        )
        .groupBy("dow", "event_type")
        .agg(F.sum("cents").alias("z"))
    )
    lower_med = "element_at(sort_array(collect_list(z)), cast((count(*) + 1) div 2 as int))"
    z = cells
    reff = None
    ceff = None
    for _ in range(2):
        rm = z.groupBy("dow").agg(F.expr(lower_med).alias("_rm"))
        z = z.join(F.broadcast(rm), "dow").select(
            "dow", "event_type", (F.col("z") - F.col("_rm")).alias("z")
        )
        reff = (
            rm.select("dow", F.col("_rm").alias("row_effect"))
            if reff is None
            else reff.join(rm, "dow").select(
                "dow",
                (F.col("row_effect") + F.col("_rm")).alias("row_effect"),
            )
        )
        cm = z.groupBy("event_type").agg(F.expr(lower_med).alias("_cm"))
        z = z.join(F.broadcast(cm), "event_type").select(
            "dow", "event_type", (F.col("z") - F.col("_cm")).alias("z")
        )
        ceff = (
            cm.select("event_type", F.col("_cm").alias("col_effect"))
            if ceff is None
            else ceff.join(cm, "event_type").select(
                "event_type",
                (F.col("col_effect") + F.col("_cm")).alias("col_effect"),
            )
        )
    return (
        cells.select("dow", "event_type", F.col("z").alias("cell_cents"))
        .join(F.broadcast(reff), "dow")
        .join(F.broadcast(ceff), "event_type")
        .join(
            z.select("dow", "event_type", F.col("z").alias("residual_cents")),
            ["dow", "event_type"],
        )
        .select(
            "dow",
            "event_type",
            "cell_cents",
            "row_effect",
            "col_effect",
            "residual_cents",
        )
    )


def sequential_pattern_topk(
    spark: SparkSession, sf_dir: str, k: int = 15
) -> DataFrame:
    """EXT E423: sequential pattern mining — top-k length-3 SUBSEQUENCE
    patterns (gaps allowed) by distinct-user support, the
    PrefixSpan-family generalization of E153's CONTIGUOUS trigrams: a
    user supports pattern a→b→c iff positions pa < pb < pc exist in
    their event stream, regardless of what happens in between — the
    shape behavioral-funnel and session-abandonment analyses actually
    want (users rarely click three steps back-to-back).

    Distributed shape: one windowed position per event, then ONE
    per-(user, type) reduction to a sorted position array with its
    min/max — after which support needs NO per-occurrence work:
    a→b→c is supported iff some pb ∈ pos(b) has min(pos(a)) < pb <
    max(pos(c)) (any such pb proves pa<pb<pc exists, and none can be
    missed because min/max are the loosest witnesses). The 3-way
    self-join is on the COMPRESSED (user × present-type) relation —
    ≤ |types|³ candidate rows per user, never events³ — and all three
    legs share one hash partitioning on user_id. The final top-k
    window ranks a ≤|types|³-row aggregate.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("us")
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    pos = ev.withColumn("rn", F.row_number().over(w))
    utp = pos.groupBy("user_id", F.col("event_type").alias("t")).agg(
        F.sort_array(F.collect_list("rn")).alias("ps"),
        F.min("rn").alias("minp"),
        F.max("rn").alias("maxp"),
    )
    a, b, c = utp.alias("a"), utp.alias("b"), utp.alias("c")
    supported = (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .join(c, F.col("a.user_id") == F.col("c.user_id"))
        .filter(
            F.exists(
                F.col("b.ps"),
                lambda p: (p > F.col("a.minp")) & (p < F.col("c.maxp")),
            )
        )
        .groupBy(
            F.col("a.t").alias("step_1"),
            F.col("b.t").alias("step_2"),
            F.col("c.t").alias("step_3"),
        )
        .agg(F.count_distinct(F.col("a.user_id")).alias("support"))
    )
    wr = W.orderBy(
        F.col("support").desc(), "step_1", "step_2", "step_3"
    )
    return (
        supported.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("step_1", "step_2", "step_3", "support",
                F.col("rank").cast("long").alias("rank"))
    )


def pinball_loss_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E440: quantile-forecast backtest under PINBALL LOSS — the
    proper scoring rule for quantile forecasts (the metric of the M5
    competition and every SLA-band forecaster): a trailing-week
    order-statistic forecast of the daily value total is scored at
    q = 0.5 and q = 0.9 with
    L_q(y, ŷ) = q·(y−ŷ)⁺ + (1−q)·(ŷ−y)⁺, and — the part a mean-error
    backtest can't show — the ASYMMETRY is the point: under-forecast
    days dominate the q=0.9 loss 9:1, so a forecaster that nails the
    median but misses spikes scores well at 0.5 and badly at 0.9
    (E142's seasonal-naive backtest measures central error; this
    measures band calibration).

    Exactness: daily totals are exact cents; the forecast is a
    TYPE-1 (discrete) order statistic of the trailing 7 days (the
    E-band convention — engine interpolation internals never touch
    it); pinball losses are integers in MILLI-cents (q folded in as
    500/900 per-mille). One day-grain aggregate + one 7-row trailing
    window ordered by day — bounded frame, day grain.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts div 86400000000000").alias("day"),
        exact_units(F.col("value"), 2).alias("cents"),
    )
    daily = ev.groupBy("day").agg(F.sum("cents").alias("y"))
    wt = W.orderBy("day").rowsBetween(-7, -1)
    trail = daily.withColumn(
        "hist", F.array_sort(F.collect_list("y").over(wt))
    ).filter(F.size("hist") == 7)
    fore = trail.select(
        "day",
        "y",
        F.element_at("hist", 4).alias("f50"),   # 4th of 7 = median
        F.element_at("hist", 7).alias("f90"),   # ceil(0.9*7) = 7th
    )
    loss = fore.select(
        "day",
        F.expr(
            "case when y >= f50 then 500 * (y - f50)"
            " else 500 * (f50 - y) end"
        ).alias("l50_milli"),
        F.expr(
            "case when y >= f90 then 900 * (y - f90)"
            " else 100 * (f90 - y) end"
        ).alias("l90_milli"),
    )
    return loss.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("l50_milli").cast("long").alias("pinball50_milli"),
        F.sum("l90_milli").cast("long").alias("pinball90_milli"),
        F.expr("sum(l50_milli) div count(1)").alias("mean50_milli"),
        F.expr("sum(l90_milli) div count(1)").alias("mean90_milli"),
    )


def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E477: exact SHAPLEY-value channel attribution — the
    game-theoretic top of the attribution ladder (E211 last-touch →
    E291 position → E314 Markov removal → Shapley): each channel's
    credit is its average marginal contribution over ALL coalition
    orderings (Shapley 1953; Dalessandro et al. 2012 for the marketing
    form). Characteristic function v(S) = conversions among users
    whose touched-channel set ⊆ S (journeys fully explained by the
    coalition).

    EXACT and INTEGER end to end: users collapse to a 4-bit channel
    mask (≤16 distinct masks — the data-scale work is ONE groupBy),
    v(·) is a 16-row subset-sum, and φᵢ is computed ×24 (= 4!) so the
    |S|!·(3−|S|)! weights are integers — no float anywhere, and the
    efficiency axiom Σφᵢ = v(full) − v(∅) is a pytest assertion.
    Everything past the first aggregate is broadcast metadata."""
    ev = load_table(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "error", 8)
        .otherwise(0)
    )
    per_user = ev.groupBy("user_id").agg(
        F.bit_or(bit).alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    by_mask = per_user.filter(F.col("converted") == 1).groupBy("mask").agg(
        F.count(F.lit(1)).cast("long").alias("n_conv")
    )
    coal = spark.range(16).select(F.col("id").cast("int").alias("s"))
    v = (
        F.broadcast(coal)
        .join(by_mask, F.expr("(mask & (15 - s)) = 0"))
        .groupBy("s")
        .agg(F.sum("n_conv").alias("v"))
    )
    # all-16 coalition table with v=0 for empty coalitions
    v = coal.join(v, "s", "left").select(
        "s", F.coalesce("v", F.lit(0)).cast("long").alias("v")
    )
    channels = spark.createDataFrame(
        [(1, "view"), (2, "click"), (4, "signup"), (8, "error")],
        "bit int, channel string",
    )
    pop = (
        "((s & 1) + ((s div 2) & 1) + ((s div 4) & 1) + ((s div 8) & 1))"
    )
    weight = F.expr(
        f"CASE {pop} WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"
    )
    pairs = (
        F.broadcast(channels)
        .join(coal, F.expr("(s & bit) = 0"))
        .select("channel", "bit", "s", weight.cast("long").alias("w"))
    )
    vs = v.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
    vsi = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    phi = (
        pairs.join(F.broadcast(vs), F.col("s") == F.col("s0"))
        .join(F.broadcast(vsi), F.expr("(s | bit) = s1"))
        .groupBy("channel")
        .agg(
            F.sum(F.col("w") * (F.col("v1") - F.col("v0"))).cast("long")
            .alias("shapley_conv_x24")
        )
    )
    tot = F.broadcast(
        v.filter(F.col("s") == 15).select(F.col("v").alias("n_conv_covered"))
    )
    return phi.join(tot).select(
        "channel", "shapley_conv_x24", "n_conv_covered"
    )


def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E480: Nelson–Aalen cumulative-hazard estimator for
    signup→purchase conversion — the counting-process complement to
    the Kaplan–Meier curve (E149): Ĥ(t) = Σ_{tᵢ≤t} dᵢ/nᵢ. Survival
    analysis reports both because they answer different questions —
    KM gives P(not yet converted), NA gives accumulated instantaneous
    risk, is defined even where KM hits zero, and its increments are
    the raw material for hazard-ratio models.

    Cohort: each user's FIRST signup; event = first purchase at-or-
    after it; users with no qualifying purchase are right-censored at
    the corpus horizon. Same relational shape as E149 (one row per
    distinct duration day; risk set = total − prefix via one
    calendar-bounded global window), so the two curves are directly
    comparable row for row.

    Determinism: each step dᵢ/nᵢ becomes a floor(x·1e6 + 0.5) integer
    FIRST (the quotient's double is correctly rounded, and the only
    representable ties land exactly ON .5 where floor(+0.5) is exact
    in both engines), then the cumulative sum is exact long addition.
    The −ln KM step is emitted beside it in the same micro-units: the
    classical inequality Ĥ_NA(t) ≤ −ln Ŝ_KM(t) is asserted by pytest.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    first_buy = (
        signups.join(
            buys,
            (F.col("user_id") == F.col("b_user")) & (F.col("b_ts") >= F.col("s_ts")),
            "left",
        )
        .groupBy("user_id", "s_ts")
        .agg(F.min("b_ts").alias("p_ts"))
    )
    horizon = F.broadcast(ev.agg(F.max("ts").alias("h_ts")))
    durs = first_buy.join(horizon).select(
        F.when(
            F.col("p_ts").isNotNull(),
            F.expr("(p_ts - s_ts) div 86400000000000"),
        )
        .otherwise(F.expr("(h_ts - s_ts) div 86400000000000"))
        .alias("dur"),
        F.col("p_ts").isNotNull().cast("long").alias("is_event"),
    )
    steps = durs.groupBy("dur").agg(
        F.sum("is_event").alias("d"),
        F.sum(1 - F.col("is_event")).alias("c"),
    )
    total = F.broadcast(durs.agg(F.count(F.lit(1)).alias("n_total")))
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = steps.join(total).withColumn(
        "n_risk",
        F.col("n_total")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    na_step = F.floor(
        F.col("d").cast("double") / F.col("n_risk") * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    km_step = F.round(
        -F.log(F.expr("CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)"))
        * 1e6,
        0,
    ).cast("long")
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    return (
        at_risk.filter((F.col("d") > 0) & (F.col("n_risk") > F.col("d")))
        .withColumn("na_step_micro", na_step)
        .withColumn("neg_log_km_step_micro", km_step)
        .select(
            F.col("dur").alias("duration_days"),
            "n_risk",
            F.col("d").alias("n_events"),
            F.sum("na_step_micro").over(w_cum).alias("na_cum_micro"),
            F.sum("neg_log_km_step_micro")
            .over(w_cum)
            .alias("neg_log_km_cum_micro"),
        )
    )


def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E499: build an SCD-2 dimension FROM a change stream — the
    write-side complement to the E55 point-in-time JOIN (which assumed
    the validity intervals already existed): collapse each user's
    event history into versioned rows (state, valid_from, valid_to,
    version_no) where the tracked state is the user's value band and
    a new version opens only when the band actually CHANGES
    (consecutive-duplicate suppression — Kimball's type-2 contract).

    One per-user window (ordered by ts, event_id — a unique total
    order) does everything: ``lag`` detects the change points,
    ``lead`` over the surviving rows closes each interval; the current
    version stays open (valid_to NULL). Exact µs-epoch longs
    throughout.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    states = ev.select(
        "user_id",
        F.expr("ts div 1000").alias("us"),
        "event_id",
        F.least(F.floor(F.col("value") / 2).cast("long"), F.lit(4)).alias(
            "band"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    changes = states.withColumn("prev_band", F.lag("band").over(w)).filter(
        F.col("prev_band").isNull() | (F.col("band") != F.col("prev_band"))
    )
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    return changes.select(
        "user_id",
        F.row_number().over(w2).alias("version_no"),
        "band",
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w2).alias("valid_to_us"),
    )


def incremental_sessionization(
    spark: SparkSession, sf_dir: str, split_day: int = 19746, gap: str = "30 minutes"
) -> DataFrame:
    """EXT E501: INCREMENTAL sessionization — merge a new batch of
    events into an existing session table without re-sessionizing
    history, completing the incremental family (E54 aggs, E160 dedup,
    E262 joins, E403 views). The subtle case is the BOUNDARY: a new
    event inside the gap of a user's last old session must extend it,
    not open a new one.

    With an event-time split (delta strictly after base), only the
    LAST old session and FIRST new session per user can fuse:
    sessionize each side independently (the native
    ``session_window``), then one keyed join merges the fusable pairs
    (first-delta start < last-state end, i.e. within gap of the last
    old event, since end = last + gap). Work is O(|delta| + one pass
    over the per-user session heads) — history is never rescanned,
    which is the whole point at 100 TB/day ingest. Counts and cent
    sums are additive longs, so merged rows are exact.

    The oracle sessionizes ALL events from scratch — incremental ==
    rebuild is the gate.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    day = F.expr("(ts div 1000) div 86400000000")

    def sessions_of(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                F.session_window(_ts_micros(), gap).alias("s"),
                F.col("user_id"),
            )
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.sum(exact_units(F.col("value"), 2)).alias("sum_cents"),
            )
            .select(
                "user_id",
                F.unix_micros(F.col("s.start")).alias("session_start_us"),
                F.unix_micros(F.col("s.end")).alias("session_end_us"),
                "n_events",
                "sum_cents",
            )
        )

    state = sessions_of(ev.filter(day < split_day))
    delta = sessions_of(ev.filter(day >= split_day))
    w_last = Window.partitionBy("user_id").orderBy(F.desc("session_end_us"))
    w_first = Window.partitionBy("user_id").orderBy(F.asc("session_start_us"))
    last_state = (
        state.withColumn("_r", F.row_number().over(w_last))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )
    first_delta = (
        delta.withColumn("_r", F.row_number().over(w_first))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )
    fused = (
        last_state.alias("l")
        .join(first_delta.alias("d"), "user_id")
        .filter(F.col("d.session_start_us") < F.col("l.session_end_us"))
        .select(
            "user_id",
            F.col("l.session_start_us").alias("session_start_us"),
            F.col("d.session_end_us").alias("session_end_us"),
            (F.col("l.n_events") + F.col("d.n_events")).alias("n_events"),
            (F.col("l.sum_cents") + F.col("d.sum_cents")).alias("sum_cents"),
        )
    )
    fkeys = fused.select("user_id", F.col("session_start_us").alias("_ls"))
    dkeys = fused.select("user_id", F.col("session_end_us").alias("_de"))
    keep_state = state.join(
        fkeys,
        (state.user_id == fkeys.user_id)
        & (state.session_start_us == fkeys._ls),
        "left_anti",
    )
    keep_delta = delta.join(
        dkeys,
        (delta.user_id == dkeys.user_id)
        & (delta.session_end_us == dkeys._de),
        "left_anti",
    )
    return keep_state.unionByName(keep_delta).unionByName(fused)


def stl_residual_anomalies(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """EXT E505: seasonal-aware anomaly screen (the S-H-ESD shape
    Twitter popularized): raw daily revenue triggers false alarms on
    every weekend, so detect on the STL RESIDUAL instead — compose the
    E331 decomposition with the E47 median/MAD robust z. Report = the
    top-k most anomalous days by |robust z| (this corpus's residuals
    are well-behaved — max |z| ≈ 1.7 — so a fixed 3.5 threshold would
    gate nothing; the ranked report keeps the gate non-trivial while
    the ``is_anomaly`` flag carries the conventional cut).

    Exact integer residual cents feed the same percentile/quantile_
    cont parity convention as E47; everything past the daily aggregate
    is bounded by the calendar.
    """
    res = stl_lite_decomposition(spark, sf_dir)
    stats = F.broadcast(
        res.agg(
            F.expr("percentile(residual_cents, 0.5)").alias("med"),
        )
    )
    mad = F.broadcast(
        res.join(stats).agg(
            F.expr("percentile(abs(residual_cents - med), 0.5)").alias("mad")
        )
    )
    scored = res.join(stats).join(mad).select(
        "day",
        "dow",
        "cents",
        "residual_cents",
        F.round("med", 4).alias("med"),
        F.round("mad", 4).alias("mad"),
        F.when(
            F.col("mad") > 0,
            F.round(
                (F.col("residual_cents") - F.col("med"))
                / (F.lit(1.4826) * F.col("mad")),
                4,
            ),
        ).alias("robust_z"),
    )
    return (
        scored.filter(F.col("robust_z").isNotNull())
        .orderBy(F.abs(F.col("robust_z")).desc(), F.asc("day"))
        .limit(k)
        .withColumn(
            "is_anomaly",
            (F.abs(F.col("robust_z")) > 3.5).cast("long"),
        )
    )
