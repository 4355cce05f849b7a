"""Interval overlap join — EXT north-star (temporal/interval analytics).

The reference has no joins at all (SURVEY.md §2.4; its dataflow is the
fixed per-record transform of ``/root/reference/main.js:156-179``), but
every trace/session pipeline eventually needs *interval × interval*
overlap — "which browsing windows overlapped which ad exposures" — a
shape distinct from the point-in-band range join (``rangejoin.py``):
both sides are intervals, and the naive formulation
``a.start <= b.end AND b.start <= a.end`` is an inequality join that
Catalyst can only plan as a broadcast-nested-loop — quadratic, a
scale-killer.

Scalable formulation (interval bucketing, the standard trick from
spatial/temporal engines): split time into fixed-width bands; each
interval registers in every band it touches (``sequence`` + ``explode``
— band count per row is bounded by interval_length/band + 2, a small
constant when the band is chosen ≳ the typical interval length);
equi-join on (key, band); keep truly-overlapping pairs; and emit each
pair EXACTLY once by requiring the band to be the one containing
``greatest(a.start, b.start)`` — that instant lies inside both
intervals (it is ≤ both ends whenever the pair overlaps), so exactly
one joined band row survives, with no distinct/dedup pass.

Cost at 100 TB: one shuffle per side on (user, band) into a plain hash
join; per-band fan-out is bounded by data density × band width. No
BNLJ, no pair materialization beyond true band collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from parquet_to_csv_spark.sources.tables import load_table

# Band width: 6 h in µs — ≥ the longest interval below, so each
# interval touches ≤ 2 bands.
_BAND_US = 21_600_000_000
# Interval lengths (µs): views open a 4 h window, clicks a 2 h one
# (sized so the sf0.01 gate sees a few hundred overlapping pairs).
_VIEW_DUR_US = 14_400_000_000
_CLICK_DUR_US = 7_200_000_000


def _intervals(ev: DataFrame, etype: str, dur_us: int, pfx: str) -> DataFrame:
    """[ts, ts+dur] intervals for one event type, exploded to the bands
    they span. ``sequence`` is array-local; rows fan out by at most
    ``dur_us // _BAND_US + 2``."""
    return (
        ev.filter(F.col("event_type") == etype)
        .select(
            F.col("event_id").alias(f"{pfx}_id"),
            "user_id",
            F.col("ts_us").alias(f"{pfx}_s"),
            (F.col("ts_us") + F.lit(dur_us)).alias(f"{pfx}_e"),
        )
        .withColumn(
            "band",
            F.explode(
                F.sequence(
                    F.expr(f"{pfx}_s div {_BAND_US}"),
                    F.expr(f"{pfx}_e div {_BAND_US}"),
                )
            ),
        )
    )


def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user overlap pairs between view windows ([ts, ts+4 h]) and
    click windows ([ts, ts+2 h]), with the overlap length.

    Emitted once per overlapping pair via the greatest-start band rule
    (module docstring); all arithmetic is integer µs, so the output is
    engine-exact with no rounding.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    views = _intervals(ev, "view", _VIEW_DUR_US, "v")
    clicks = _intervals(ev, "click", _CLICK_DUR_US, "c")
    overlap = (F.col("v_s") <= F.col("c_e")) & (F.col("c_s") <= F.col("v_e"))
    once = F.expr(f"greatest(v_s, c_s) div {_BAND_US}") == F.col("band")
    return (
        views.join(clicks, ["user_id", "band"])
        .filter(overlap & once)
        .select(
            F.col("v_id").alias("view_id"),
            F.col("c_id").alias("click_id"),
            "user_id",
            (
                F.least(F.col("v_e"), F.col("c_e"))
                - F.greatest(F.col("v_s"), F.col("c_s"))
            ).alias("overlap_us"),
        )
    )
