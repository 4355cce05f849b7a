"""Temporal joins the reference lacks and Spark has no native operator
for — EXT north-star (as-of join, banded range join) over ``events``.

The reference has no joins at all (SURVEY.md §2.4); these are the two
time-series join shapes every trace/event pipeline eventually needs:

- **As-of join**: for each left row, the single most recent right row
  at-or-before it (per key). The naive formulation is an inequality
  join + argmax — quadratic per key. The scalable formulation used
  here is the *union-merge*: tag both sides, union, sort per key by
  time, and carry the last-seen right row forward with a running
  ``last(..., ignorenulls=True)`` window. Cost = ONE shuffle on the
  key (same as any groupBy), state = one row — this survives 100 TB
  because it never materializes candidate pairs at all.
- **Banded range join**: join rows within a bounded time distance.
  Naive inequality join is again quadratic; bucketing time into
  band-sized buckets and equi-joining on (key, bucket) ∪ (key,
  bucket−1) makes Catalyst plan a plain hash join whose per-bucket
  fan-out is bounded by data density × band width — the standard
  interval-bucketing trick (each matching pair collides on exactly
  one of the two probed buckets, so no dedup pass is needed).

Both are pure DataFrame compositions — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from parquet_to_csv_spark.sources.tables import load_table

# 5-minute band in µs for the range join.
_BAND_US = 300_000_000


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with µs-epoch time (ts at rest is a ns-epoch long)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", "user_id", "event_type", "value",
        F.expr("ts div 1000").alias("ts_us"),
    )


def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event paired with the same user's most
    recent click at-or-before it (NULL if the user never clicked yet).

    Union-merge plan: clicks and purchases union into one relation,
    one exchange on user_id, one per-user sort by time; a running
    ``last(click, ignorenulls=True)`` carries the latest click forward
    into each purchase row. Clicks sort before purchases on time ties
    (src 0 < 1) so an equal-timestamp click is visible, matching the
    oracle's ``p.ts >= c.ts`` ASOF semantics.
    """
    ev = _events_us(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts_us",
        F.lit(0).alias("src"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.col("event_id").alias("c_id"),
        F.col("ts_us").alias("c_ts_us"),
        F.col("value").alias("c_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_us",
        F.lit(1).alias("src"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("c_id"),
        F.lit(None).cast("long").alias("c_ts_us"),
        F.lit(None).cast("double").alias("c_value"),
    )
    merged = clicks.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts_us"), F.asc("src"), F.asc("c_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        merged.select(
            "user_id",
            "purchase_id",
            "ts_us",
            F.last("c_id", ignorenulls=True).over(w).alias("click_id"),
            F.last("c_ts_us", ignorenulls=True).over(w).alias("click_ts_us"),
            F.last("c_value", ignorenulls=True).over(w).alias("click_value"),
        )
        .filter(F.col("purchase_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            (F.col("ts_us") - F.col("click_ts_us")).alias("lag_us"),
            F.round("click_value", 2).alias("click_value"),
        )
    )


def range_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: per error event, how many clicks (and how much
    click value) the same user produced in the preceding 5 minutes
    (inclusive bounds).

    Each error probes two 5-minute buckets (its own and the previous);
    any click within the band lives in exactly one of them, so the
    equi-join on (user_id, bucket) is exact — Catalyst plans a plain
    shuffled hash join, no inequality-join fallback to BNLJ.
    """
    ev = _events_us(spark, sf_dir)
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.col("ts_us").alias("e_ts_us"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.expr(f"(e_ts_us div {_BAND_US})"),
                    F.expr(f"(e_ts_us div {_BAND_US}) - 1"),
                )
            ),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("c_ts_us"),
        F.col("value").alias("c_value"),
        F.expr(f"ts_us div {_BAND_US}").alias("bucket"),
    )
    in_band = (F.col("c_ts_us") >= F.col("e_ts_us") - F.lit(_BAND_US)) & (
        F.col("c_ts_us") <= F.col("e_ts_us")
    )
    joined = errors.join(clicks, ["user_id", "bucket"], "left").select(
        "error_id",
        "user_id",
        F.when(in_band, F.col("click_id")).alias("m_click"),
        F.when(in_band, F.col("c_value")).alias("m_value"),
    )
    return joined.groupBy("error_id", "user_id").agg(
        F.count("m_click").alias("n_clicks_5m"),
        F.coalesce(F.round(F.sum("m_value"), 2), F.lit(0.0)).alias("click_value_5m"),
    )


def asof_forward_error_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each error event paired with the same user's
    NEXT purchase at-or-after it (NULL if none follows) — the
    time-to-recovery / conversion-lag shape.

    Same union-merge plan as the backward as-of, scanned in reverse:
    one exchange on user_id, per-user sort by time DESC, and a running
    ``last(purchase, ignorenulls=True)`` carries the nearest following
    purchase back into each error row. Purchases sort before errors on
    time ties (src 0 < 1) so an equal-timestamp purchase is visible —
    matching the oracle's ``e.ts <= p.ts`` forward-ASOF semantics.
    """
    ev = _events_us(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_us",
        F.lit(0).alias("src"),
        F.col("event_id").alias("p_id"),
        F.col("value").alias("p_value"),
        F.lit(None).cast("long").alias("e_id"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts_us",
        F.lit(1).alias("src"),
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("double").alias("p_value"),
        F.col("event_id").alias("e_id"),
    )
    merged = purchases.unionByName(errors)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.desc("ts_us"), F.asc("src"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = merged.select(
        "user_id",
        "ts_us",
        "src",
        "e_id",
        F.last("p_id", ignorenulls=True).over(w).alias("purchase_id"),
        F.last("p_value", ignorenulls=True).over(w).alias("p_value"),
        F.last(F.when(F.col("p_id").isNotNull(), F.col("ts_us")), ignorenulls=True)
        .over(w)
        .alias("p_ts_us"),
    )
    return carried.filter(F.col("src") == 1).select(
        F.col("e_id").alias("error_id"),
        "user_id",
        "purchase_id",
        (F.col("p_ts_us") - F.col("ts_us")).alias("lead_us"),
        F.round("p_value", 2).alias("purchase_value"),
    )


def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (SCD-2) dimension join: each order picks the
    customer attribute version that was valid ON ITS ORDER DATE — the
    feature-leakage-safe join a training pipeline must use instead of
    joining today's dimension onto historical facts.

    The versioned dim is synthesized deterministically (3 effective-
    dated versions per customer keyed off custkey) since the fixtures
    carry no history; the join shape is the real thing: versions are
    dim-sized (×3) and broadcast, facts join on the key, validity
    filters, and ``max_by(attr, valid_from)`` picks the latest version
    ≤ the fact date with map-side partial aggregation — one broadcast
    join + one aggregation, no window sort, no shuffle of the fact
    side beyond the final groupBy on its own key.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    v1_from = F.date_add(F.lit("1996-01-01").cast("date"), (F.col("c_custkey") % 365).cast("int"))
    v2_from = F.date_add(F.lit("1998-07-01").cast("date"), (F.col("c_custkey") % 365).cast("int"))
    ver = cust.select(
        "c_custkey",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("v"), F.lit("1990-01-01").cast("date").alias("valid_from")),
                F.struct(F.lit(1).alias("v"), v1_from.alias("valid_from")),
                F.struct(F.lit(2).alias("v"), v2_from.alias("valid_from")),
            )
        ).alias("s"),
        "c_mktsegment",
    ).select(
        "c_custkey",
        F.col("s.v").alias("v"),
        F.col("s.valid_from").alias("valid_from"),
        F.concat_ws("#", F.col("c_mktsegment"), F.col("s.v").cast("string")).alias("attr"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("o_date")
    )
    joined = orders.join(
        F.broadcast(ver), orders.o_custkey == ver.c_custkey
    ).filter(F.col("valid_from") <= F.col("o_date"))
    return (
        joined.groupBy("o_orderkey", "o_custkey")
        .agg(
            F.max_by("attr", F.col("valid_from")).alias("attr_at_order"),
            F.max("valid_from").alias("version_from"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "attr_at_order",
            F.expr("unix_millis(cast(version_from as timestamp))").alias("version_from_ms"),
        )
    )


def order_consolidation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E225: shipping-consolidation candidates — pairs of orders by
    the SAME customer placed within one day of each other (orders a
    warehouse would merge into one shipment; the working-capital lever
    of fulfillment analytics).

    The |Δdate| ≤ 1 day self-join uses the banded-bucket trick every
    range join here uses: each order lands in its epoch-day band and
    probes (band−1, band, band+1) — an EQUI-join on (custkey, band)
    Catalyst hash-partitions, instead of the quadratic per-customer
    inequality join. Within-band residual filter is exact integer ms.
    Output: the pair, the day gap, and the combined value in exact
    cents (what consolidating would ship together).
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("unix_millis(cast(o_orderdate as timestamp))").alias("od_ms"),
        exact_units(F.col("o_totalprice"), 2).alias("cents"),
    )
    a = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("order_a"),
        F.col("od_ms").alias("ms_a"),
        F.col("cents").alias("cents_a"),
        F.expr("od_ms div 86400000").alias("band"),
    )
    b_base = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("order_b"),
        F.col("od_ms").alias("ms_b"),
        F.col("cents").alias("cents_b"),
        F.expr("od_ms div 86400000").alias("bband"),
    )
    b = b_base.select(
        "ck", "order_b", "ms_b", "cents_b",
        F.explode(F.array(F.col("bband") - 1, F.col("bband"), F.col("bband") + 1)).alias("band"),
    )
    return (
        a.join(b, ["ck", "band"])
        .filter(
            (F.col("order_a") < F.col("order_b"))
            & (F.abs(F.col("ms_a") - F.col("ms_b")) <= F.lit(86400000))
        )
        .select(
            F.col("ck").alias("o_custkey"),
            "order_a",
            "order_b",
            F.expr("abs(ms_a - ms_b) div 86400000").alias("gap_days"),
            ((F.col("cents_a") + F.col("cents_b")) / F.lit(100.0)).alias("combined_value"),
        )
        # no distinct needed: b's three probe bands are distinct values,
        # so exactly one can equal a's band — each pair matches once.
    )


def asof_nearest_join(
    spark: SparkSession, sf_dir: str, tolerance_us: int = 3_600_000_000
) -> DataFrame:
    """EXT E247: NEAREST as-of join — each error event matched to the
    same user's temporally CLOSEST click within ±1 h (backward-or-
    forward, whichever is nearer). Completes the as-of family:
    backward (E16), forward, and now nearest — pandas.merge_asof's
    ``direction='nearest'`` at Spark scale.

    Nearest can't ride the union-merge running-window trick (it needs
    both sides of the timeline), so it uses the banded-bucket
    equi-join: each error probes its hour band ±1 (tolerance = one
    band width ⇒ 3 bands always suffice), then one ``min_by`` over the
    (|Δt|, click_ts, click_id) struct picks the closest with a
    deterministic tie-break (earlier click wins). Aggregation gets
    map-side combine; no window sort.
    """
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("u"),
        F.expr("ts div 1000").alias("e_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.expr("ts div 1000").alias("c_us"),
    )
    band = tolerance_us
    e = errors.withColumn("band", F.expr(f"e_us div {band}"))
    c = clicks.select(
        "click_id",
        "cu",
        "c_us",
        F.explode(
            F.array(
                F.expr(f"c_us div {band} - 1"),
                F.expr(f"c_us div {band}"),
                F.expr(f"c_us div {band} + 1"),
            )
        ).alias("band"),
    )
    j = e.join(
        c,
        (e.u == c.cu) & (e.band == c.band),
    ).filter(F.abs(F.col("e_us") - F.col("c_us")) <= tolerance_us)
    pick = F.expr(
        "min_by(struct(click_id, c_us), struct(abs(e_us - c_us), c_us, click_id))"
    )
    return (
        j.groupBy("error_id", "u", "e_us")
        .agg(pick.alias("nearest"))
        .select(
            "error_id",
            F.col("u").alias("user_id"),
            "e_us",
            F.col("nearest.click_id").alias("click_id"),
            F.col("nearest.c_us").alias("click_us"),
            F.abs(F.col("e_us") - F.col("nearest.c_us")).alias("gap_us"),
        )
    )


def bitemporal_asof_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E406: BITEMPORAL as-of join — two time axes, not one.
    SCD-2 (E55) answers "which version was valid at time V"; an
    auditable store must also answer "which version did we BELIEVE at
    transaction time T" — the axis that makes corrections reproducible
    (a restated balance must not rewrite history reports generated
    before the restatement).

    The versioned dim is synthesized deterministically per customer
    (the fixtures carry no history; the join shape is the real thing):

    - v1: valid [0, 100), recorded tx [0, ∞)      — bal = cents
    - v2: valid [100, ∞), recorded tx [0, 50)     — bal = cents + 500
    - v3: valid [100, ∞), recorded tx [50, ∞)     — bal = cents + 700
      (the correction: at tx 50 the belief about the [100, ∞) period
      was restated from +500 to +700)

    Four probes (valid V × as-of T) hit every quadrant: (50, 25) and
    (50, 75) must agree (v1 — history untouched by the restatement);
    (150, 25) sees the PRE-correction v2; (150, 75) the corrected v3.
    Both interval predicates are half-open, the dim is version-bounded
    (3 × customers) and the probe table broadcast — one scan, map-side
    heavy, no window."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.expr("cast(floor(c_acctbal * 100 + 0.5) as long)").alias("cents"),
    )
    ver = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("vf"), F.lit(100).alias("vt"),
                    F.lit(0).alias("tf"), F.lit(1000000).alias("tt"),
                    F.col("cents").alias("bal"),
                ),
                F.struct(
                    F.lit(100).alias("vf"), F.lit(1000000).alias("vt"),
                    F.lit(0).alias("tf"), F.lit(50).alias("tt"),
                    (F.col("cents") + 500).alias("bal"),
                ),
                F.struct(
                    F.lit(100).alias("vf"), F.lit(1000000).alias("vt"),
                    F.lit(50).alias("tf"), F.lit(1000000).alias("tt"),
                    (F.col("cents") + 700).alias("bal"),
                ),
            )
        ).alias("v"),
    ).select("c_custkey", "c_mktsegment", "v.*")
    # pure-JVM literal relation (round 8): createDataFrame routed the
    # 4-row probe table through a Python RDD (Scan ExistingRDD →
    # applySchemaToPythonRDD), paying a Python-worker round trip on
    # every cold execution of an otherwise all-JVM plan
    probes = F.broadcast(
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(v).cast("int").alias("probe_v"),
                            F.lit(t).cast("int").alias("probe_t"),
                        )
                        for v, t in ((50, 25), (150, 25), (150, 75), (50, 75))
                    ]
                )
            ).alias("p")
        )
        .select("p.*")
    )
    return (
        ver.join(
            probes,
            (F.col("probe_v") >= F.col("vf"))
            & (F.col("probe_v") < F.col("vt"))
            & (F.col("probe_t") >= F.col("tf"))
            & (F.col("probe_t") < F.col("tt")),
        )
        .groupBy("probe_v", "probe_t", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("bal").alias("bal_cents"),
        )
    )
