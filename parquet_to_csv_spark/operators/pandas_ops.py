"""E12 — the sanctioned Pandas-UDF escape hatch (SURVEY.md §2.6).

Policy: native Column expressions first; when semantics genuinely need
Python (exotic tokenizers, model scoring), use Arrow-vectorized Pandas
UDFs — never row-at-a-time ``F.udf``. This module is the worked
example: a whitespace token counter as a ``pandas_udf``, semantically
identical to the native ``size(split(...))`` path in operators.text,
so the oracle checks it and the bench quantifies the escape-hatch tax.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from parquet_to_csv_spark.sources.tables import load_table


@F.pandas_udf(T.IntegerType())
def n_tokens_pandas(text: pd.Series) -> pd.Series:
    """Vectorized whitespace token count (empty tokens dropped), same
    semantics as ``size(filter(split(lower(text), '\\s+'), _ != ''))``."""
    return (
        text.str.lower()
        .str.split()
        .map(lambda toks: len(toks) if toks is not None else None)
        .astype("Int32")
    )


def token_counts_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The E12 demo query: per-doc token count via the Arrow UDF path."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", n_tokens_pandas(F.col("text")).alias("n_tokens_ws"))


def user_value_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12 grouped-map escape hatch (``applyInPandas``): per-user OLS
    slope of value-vs-time — the per-entity trend fit no built-in
    aggregate expresses.

    Determinism contract: the slope's five sufficient statistics are
    computed in unbounded Python integers over exact inputs (µs epochs,
    2dp cents), so they are order-independent and engine-exact; only
    the final division runs in float, identically everywhere. The
    DuckDB oracle mirrors the same integer sums in HUGEINT.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        exact_units(F.col("value"), 2).alias("cents"),
    )

    def _slope(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(v) for v in pdf["ts_us"]]
        ys = [int(v) for v in pdf["cents"]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        den = n * sxx - sx * sx
        num = n * sxy - sx * sy
        slope = (
            None
            if den == 0
            else round(float(num) / float(den) * 3600000000.0, 6)
        )
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [n],
                "slope_cph": [slope],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        _slope, "user_id long, n_events long, slope_cph double"
    )


def user_value_ewma(
    spark: SparkSession, sf_dir: str, alpha: float = 0.1
) -> DataFrame:
    """E12 grouped-map: per-user exponentially-weighted moving average
    of ``value`` over event time — the time-decayed feature every
    behavioral model wants, and a genuinely sequential recurrence
    (``y_t = α·x_t + (1-α)·y_{t-1}``) no built-in window expresses
    without overflow (the closed-form ``(1-α)^{-t}`` trick explodes
    past ~700 steps).

    Plan: one shuffle on user_id into ``applyInPandas``; state is O(1)
    per key and each group streams through one Arrow batch.
    Determinism: rows are sorted by (ts, event_id) — a total order —
    and the fold is the same float64 op sequence in any engine, so
    results are bit-identical; the DuckDB oracle replays the recurrence
    with a recursive CTE over the identically-ordered sequence.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts div 1000").alias("ts_us"), "value"
    )

    def _ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        prev = None
        out = []
        for x in pdf["value"]:
            prev = float(x) if prev is None else alpha * float(x) + (1.0 - alpha) * prev
            out.append(prev)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "ts_us": pdf["ts_us"],
                "ewma": out,
            }
        )

    # raw state leaves the UDF; the 6dp rounding is F.round (JVM) so the
    # Python half-even round never enters the parity surface
    return (
        ev.groupBy("user_id")
        .applyInPandas(_ewma, "event_id long, user_id long, ts_us long, ewma double")
        .select("event_id", "user_id", "ts_us", F.round("ewma", 6).alias("ewma"))
    )


def cogroup_click_purchase_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-pandas escape hatch (``groupBy().cogroup().
    applyInPandas``): per user, the MEDIAN lag from each purchase to
    its most recent prior click — two keyed relations arriving as
    separate pandas frames per key, the API for per-entity logic that
    needs both sides materialized (backtesting, trajectory alignment).

    The pandas body is a sort + ``searchsorted`` (vectorized); lags are
    integer µs and the median of integers is exact in float64, so the
    DuckDB oracle (as-of join + ``quantile_cont``) hash-matches.
    Plan: ONE shuffle per side on user_id, Arrow batches per cogroup —
    never a row-at-a-time boundary.
    """
    import numpy as np

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts_us")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us"
    )

    def _lag(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(r) == 0:
            return pd.DataFrame(
                columns=["user_id", "n_purchases", "n_matched", "med_lag_us"]
            )
        uid = int(r["user_id"].iloc[0]) if len(r) else int(l["user_id"].iloc[0])
        c = np.sort(l["ts_us"].to_numpy()) if len(l) else np.array([], dtype="int64")
        p = r["ts_us"].to_numpy()
        idx = np.searchsorted(c, p, side="right") - 1
        ok = idx >= 0
        lags = p[ok] - c[idx[ok]]
        med = float(np.median(lags)) if len(lags) else None
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_purchases": [len(p)],
                "n_matched": [int(ok.sum())],
                "med_lag_us": [med],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            _lag,
            "user_id long, n_purchases long, n_matched long, med_lag_us double",
        )
    )


def udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12-family UDTF surface demo: the sliding-window chunker as a
    Python TABLE function (one input row → N output rows via LATERAL),
    completing the UDF/UDAF/UDTF coverage of SURVEY §2.6. Semantics
    are IDENTICAL to the relational ``corpus.doc_chunks`` (the
    production path — array-local, codegen'd); the gate runs the same
    oracle against both, so the UDTF's per-row Python tax buys parity,
    not different answers. Use this shape only when chunking logic
    genuinely needs Python (model-based splitters); otherwise the
    relational twin wins.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx bigint, chunk_text string, n_tokens bigint")
    class ChunkerUDTF:
        def eval(self, text: str):  # noqa: ANN001
            toks = [t for t in (text or "").lower().split() if t]
            starts = range(0, max(len(toks), 1), 48)
            for i, s in enumerate(starts):
                chunk = toks[s : s + 64]
                if chunk:
                    yield i, " ".join(chunk), len(chunk)

    spark.udtf.register("chunker_udtf", ChunkerUDTF)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens "
        "FROM _udtf_docs d, LATERAL chunker_udtf(d.text) c"
    )


def holt_linear_forecast(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """EXT E234: Holt double-exponential smoothing per event type —
    level + trend over the daily value series, the one-step forecast
    for the next day, and the in-sample one-step SSE. The trend-aware
    upgrade of EWMA (E12) and the seasonal-naive backtest's (E?)
    standard competitor: three queries now triangulate forecasting
    (naive / decay / trend).

    Plan: the raw scan collapses to (type × day) sums in exact cents —
    map-side combine, tiny recurrence input (|types|·|days| rows); the
    sequential Holt fold runs in ``applyInPandas`` per type, O(1)
    state, streaming one Arrow batch per group. Determinism: the fold
    is the same float64 op sequence over identical exact-cent inputs
    in day order in both engines (the user_value_ewma contract); the
    oracle replays it with a recursive CTE; rounding happens JVM-side.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts div 86400000000000").alias("day"),
        exact_units(F.col("value"), 2).alias("cents"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.sum("cents").alias("y"))

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        ys = [float(v) for v in pdf["y"]]
        et = pdf["event_type"].iloc[0]
        if len(ys) < 2:
            return pd.DataFrame(
                {
                    "event_type": [et],
                    "n_days": [len(ys)],
                    "level": [ys[0] if ys else 0.0],
                    "trend": [0.0],
                    "forecast_next": [ys[0] if ys else 0.0],
                    "sse": [0.0],
                }
            )
        lvl, tr = ys[0], ys[1] - ys[0]
        sse = 0.0
        for y in ys[1:]:
            pred = lvl + tr
            err = y - pred
            sse = sse + err * err
            new_lvl = alpha * y + (1.0 - alpha) * (lvl + tr)
            tr = beta * (new_lvl - lvl) + (1.0 - beta) * tr
            lvl = new_lvl
        return pd.DataFrame(
            {
                "event_type": [et],
                "n_days": [len(ys)],
                "level": [lvl],
                "trend": [tr],
                "forecast_next": [lvl + tr],
                "sse": [sse],
            }
        )

    out = daily.groupBy("event_type").applyInPandas(
        _holt,
        "event_type string, n_days long, level double, trend double, "
        "forecast_next double, sse double",
    )
    return out.select(
        "event_type",
        "n_days",
        F.round((F.col("level") / 100.0), 4).alias("level_v"),
        F.round((F.col("trend") / 100.0), 4).alias("trend_v"),
        F.round((F.col("forecast_next") / 100.0), 4).alias("forecast_v"),
        F.round((F.col("sse") / 10000.0), 2).alias("sse_v2"),
    )


def arrow_grouped_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E372: ``applyInArrow`` — Spark 4's Arrow-NATIVE grouped map.

    One tier below the Pandas escape hatch: the worker hands each
    group to Python as a ``pyarrow.Table`` and takes one back, with NO
    pandas materialization on either side — no object-dtype strings,
    no index bookkeeping, no copy out of Arrow buffers. For
    numeric/kernel-style per-group logic (here: exact doc-length
    profile per language via ``pyarrow.compute``) this is the cheapest
    possible Python round-trip; the rule of thumb the repo enforces is
    built-ins > applyInArrow > applyInPandas > never row-at-a-time.

    The median is the LOWER median (sorted index (n-1)//2) — exactly
    DuckDB's ``quantile_disc(0.5)`` — so the gate stays integer-exact.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.length("text").cast("long").alias("n_chars")
    )

    def profile(t: pa.Table) -> pa.Table:
        chars = t.column("n_chars")
        srt = pc.array_sort_indices(chars)
        lower_median = chars.take([srt[(len(chars) - 1) // 2]])[0].as_py()
        return pa.table(
            {
                "lang": [t.column("lang")[0].as_py()],
                "n_docs": [len(chars)],
                "sum_chars": [pc.sum(chars).as_py()],
                "max_chars": [pc.max(chars).as_py()],
                "median_chars": [lower_median],
            }
        )

    return docs.groupBy("lang").applyInArrow(
        profile,
        "lang string, n_docs long, sum_chars long, max_chars long, "
        "median_chars long",
    )


def udtf_polymorphic_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E395: POLYMORPHIC Python UDTF — the ``analyze`` phase (Spark
    4): output schema computed at plan time FROM the input table's
    schema (pass-through columns + an appended audit column), so one
    UDTF serves any relation — the generic-tool contract static
    ``returnType`` UDTFs (E12/E168) cannot express.

    Scale discipline: the UDTF consumes a PRE-AGGREGATED 5-row
    relation (TABLE(... GROUP BY lang)), never document grain — the
    rule for any row-at-a-time Python surface; the heavy lifting
    stays in the JVM aggregate below it.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    from parquet_to_csv_spark.sources.tables import register_views

    class ExpandRow:
        @staticmethod
        def analyze(t: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for f in t.dataType.fields:
                st = st.add(f.name, f.dataType)
            st = st.add("n_fields", IntegerType())
            return AnalyzeResult(schema=st)

        def eval(self, row):
            yield (*row, len(row))

    register_views(spark, sf_dir)
    spark.udtf.register("pq_expandrow", udtf(ExpandRow))
    return spark.sql(
        """
        SELECT * FROM pq_expandrow(TABLE(
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(length(text)) AS BIGINT) AS sum_chars
          FROM documents GROUP BY lang
        ))
        """
    )


def udtf_table_partition_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E446: Python UDTF with a TABLE ARGUMENT + ``PARTITION BY``
    (Spark 4) — the SQL-native spelling of "run this stateful function
    once per group, streaming the group's rows through it": the
    planner shuffles on the partition expression and feeds each
    partition's rows to one UDTF instance (``eval`` per row,
    ``terminate`` emits the group summary). This is the fourth leg of
    the UDTF surface (E168 static schema, E395 polymorphic analyze,
    E392/E394 SQL-side): where applyInPandas needs a DataFrame-API
    call site, a TABLE-argument UDTF composes in PLAIN SQL — any BI
    tool or scripted statement can invoke it.

    Exactness: cents are pre-computed relationally and summed as
    Python ints (arbitrary precision), so the gate is integer-exact
    against the relational twin. Scale: one shuffle on the partition
    key, one UDTF instance per group — the same execution shape as
    applyInPandas, minus Arrow batching (documented trade: per-row
    Python eval, so this surface is for LOW-VOLUME-per-group logic;
    the vectorized escape hatches remain the data-grain tools).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="event_type string, n_events bigint, sum_cents bigint")
    class PartitionSummary:
        def __init__(self) -> None:
            self._type = None
            self._n = 0
            self._cents = 0

        def eval(self, row) -> None:
            self._type = row["event_type"]
            self._n += 1
            self._cents += row["cents"]

        def terminate(self):
            if self._type is not None:
                yield self._type, self._n, self._cents

    spark.udtf.register("t_partition_summary", PartitionSummary)
    from parquet_to_csv_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT * FROM t_partition_summary(
          TABLE(
            SELECT event_type,
                   cast(floor(value * 100 + 0.5) as bigint) AS cents
            FROM events
          )
          PARTITION BY event_type
        )
        """
    )


def croston_forecast(
    spark: SparkSession, sf_dir: str, alpha: float = 0.1
) -> DataFrame:
    """EXT E478: Croston's method (Croston 1972) — THE intermittent-
    demand forecaster (spare parts, slow movers), where Holt/seasonal
    models (E234/E142) break down because most periods are zero:
    smooth demand SIZES and demand INTERVALS separately over demand
    points only; forecast rate = z/p per day. Scoped to the
    ``l_partkey % 97 = 0`` slow-mover cohort (≈1 % of parts — the
    population the method exists for).

    The recurrence is genuinely sequential, so it runs as the E48/E234
    shape: one shuffle on partkey into ``applyInPandas``, state O(1)
    per part, rows pre-sorted by the (ship-day) total order. Both
    engines execute the IDENTICAL float64 op sequence (α·x + (1−α)·s —
    the oracle replays it with a recursive CTE over the same
    integer-day/quantity sequence), so results are bit-identical; the
    6-dp display round is JVM-side."""
    li = load_table(spark, sf_dir, "lineitem")
    demands = (
        li.filter(F.col("l_partkey") % 97 == 0)
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.expr("datediff(l_shipdate, DATE'1970-01-01')").alias("day"),
        )
        .agg(
            F.sum(F.expr("cast(floor(l_quantity + 0.5) as long)"))
            .alias("q")
        )
    )

    def _croston(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        z = p = None
        prev_day = None
        for day, q in zip(pdf["day"], pdf["q"]):
            if z is None:
                z, p = float(q), 1.0
            else:
                z = alpha * float(q) + (1.0 - alpha) * z
                p = alpha * float(day - prev_day) + (1.0 - alpha) * p
            prev_day = day
        part = int(pdf["part"].iloc[0])
        return pd.DataFrame(
            {
                "part": [part],
                "n_demands": [len(pdf)],
                "total_qty": [int(pdf["q"].sum())],
                "z": [z],
                "p": [p],
                "rate": [z / p],
            }
        )

    out = demands.groupBy("part").applyInPandas(
        _croston,
        "part long, n_demands long, total_qty long, z double, p double, "
        "rate double",
    )
    return out.select(
        "part", "n_demands", "total_qty",
        F.round("z", 6).alias("z_smoothed"),
        F.round("p", 6).alias("interval_smoothed"),
        F.round("rate", 6).alias("demand_rate"),
    )


def pandas_udaf_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E492: pandas GROUPED_AGG UDAF — the one vectorized-Python
    surface the suite didn't yet exercise (scalar E12, grouped-map
    E33, cogrouped E64, Arrow E372, UDTF E168/E395/E446 all exist):
    ``F.pandas_udf`` aggregations compose INSIDE a normal ``agg(...)``
    beside JVM aggregates, receiving each group's column as one Arrow
    batch — the right escape hatch when the reduction needs numpy but
    the query shape stays relational.

    Metrics: per-event-type value quartiles and the interquartile
    (trimmed) mean. Determinism: everything computes on exact integer
    CENTS; quartile interpolation fractions are quarters, so
    ``a + (b−a)·f`` is EXACT in doubles (no rounding step exists for
    engines to disagree on), and the trimmed mean replays the
    stable_avg_2dp integer recipe. At scale each UDF ships one
    (type, column) Arrow batch per group — for million-row groups
    you'd pre-aggregate to cents×count or switch to the E73
    distributed-ntile path; this is the bounded-group tool.
    """
    import numpy as np

    @F.pandas_udf("double")
    def q_cents(v: pd.Series, q: pd.Series) -> float:
        cents = np.floor(v.values * 100.0 + 0.5).astype(np.int64)
        return float(np.percentile(cents, float(q.iloc[0])))

    @F.pandas_udf("double")
    def iq_mean(v: pd.Series) -> float:
        cents = np.floor(v.values * 100.0 + 0.5).astype(np.int64)
        lo = np.percentile(cents, 25.0)
        hi = np.percentile(cents, 75.0)
        kept = cents[(cents >= lo) & (cents <= hi)]
        return float(np.floor(kept.sum() * 100.0 / len(kept)) / 10000.0)

    # Spark refuses to mix GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a
    # pandas aggregate too — the constraint is part of the surface.
    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            n_rows(F.col("value")).alias("n"),
            q_cents(F.col("value"), F.lit(25.0)).alias("q25_cents"),
            q_cents(F.col("value"), F.lit(50.0)).alias("q50_cents"),
            q_cents(F.col("value"), F.lit(75.0)).alias("q75_cents"),
            iq_mean(F.col("value")).alias("iq_mean"),
        )
    )


def theta_forecast(
    spark: SparkSession, sf_dir: str, alpha: float = 0.5, horizon: int = 7
) -> DataFrame:
    """EXT E507: the Theta method (Assimakopoulos & Nikolopoulos 2000)
    — the M3-competition winner and still the univariate baseline to
    beat: decompose the series into theta-lines θ=0 (the linear trend,
    carrying long-run drift) and θ=2 (2y − trend, double the local
    curvature), forecast the first by extrapolation and the second by
    SES, and average. Completes the forecast ladder E142 (seasonal
    naive) → E234 (Holt) → E478 (Croston).

    Series: daily order revenue in exact cents per order-priority
    class. The trend coefficients come from exact long moments (Σt,
    Σy, Σty, Σt²) — closed form, no iteration; only the SES recursion
    is sequential, run as the E478 shape (one shuffle into
    ``applyInPandas``, identical float64 op sequence replayed by the
    oracle's recursive CTE). Emits h=1..horizon forecasts per class.
    """
    import numpy as np  # noqa: F401

    from parquet_to_csv_spark.functions.stable import exact_units
    from pyspark.sql import functions as FF

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.expr(
                "CAST(datediff(o_orderdate, DATE'1970-01-01') AS BIGINT)"
            ).alias("day"),
        )
        .agg(F.sum(exact_units(F.col("o_totalprice"), 2)).alias("cents"))
    )

    def _theta(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        n = len(pdf)
        t = pdf.index.values.astype("int64")  # 0-based position
        y = pdf["cents"].values.astype("float64")
        st, sy = float(t.sum()), float(y.sum())
        sty = float((t * y).sum())
        stt = float((t * t).sum())
        # OLS on position: b = (n·Σty − Σt·Σy)/(n·Σt² − (Σt)²)
        den = n * stt - st * st
        b = (n * sty - st * sy) / den
        a = (sy - b * st) / n
        level = None
        for i in range(n):
            x2 = 2.0 * y[i] - (a + b * i)
            level = x2 if level is None else alpha * x2 + (1.0 - alpha) * level
        prio = pdf["prio"].iloc[0]
        out = []
        for h in range(1, horizon + 1):
            theta0 = a + b * (n - 1 + h)
            fc = 0.5 * (theta0 + level)
            out.append((prio, h, n, a, b, level, fc))
        return pd.DataFrame(
            out,
            columns=["prio", "h", "n_days", "a_cents", "b_cents",
                     "ses_level_cents", "forecast_cents"],
        )

    raw = daily.groupBy("prio").applyInPandas(
        _theta,
        "prio string, h int, n_days long, a_cents double, b_cents double, "
        "ses_level_cents double, forecast_cents double",
    )
    # floor(x·1e4 + 0.5) integers, not round(): the engines' round()
    # disagree exactly ON .5 boundaries (the documented Spark-shortest-
    # decimal vs DuckDB-binary divergence); floor/+ are exact IEEE ops
    return raw.select(
        "prio", "h", "n_days",
        F.floor(F.col("a_cents") * F.lit(1e4) + F.lit(0.5))
        .cast("long").alias("a_cents_e4"),
        F.floor(F.col("b_cents") * F.lit(1e4) + F.lit(0.5))
        .cast("long").alias("b_cents_e4"),
        F.floor(F.col("ses_level_cents") * F.lit(1e4) + F.lit(0.5))
        .cast("long").alias("ses_level_e4"),
        F.floor(F.col("forecast_cents") * F.lit(1e4) + F.lit(0.5))
        .cast("long").alias("forecast_e4"),
    )


def holt_winters_forecast(
    spark: SparkSession, sf_dir: str, horizon: int = 7
) -> DataFrame:
    """EXT E511: additive Holt–Winters (triple exponential smoothing,
    Winters 1960) on the daily revenue series — the classical seasonal
    forecaster that tops the ladder E142 (seasonal naive) → E234
    (Holt, no seasonality) → E507 (Theta, deseasonalized): level,
    trend AND a period-7 seasonal state updated jointly.

    α=0.3, β=0.1, γ=0.2; textbook init (level = first-week mean,
    trend = week-over-week mean diff / 7, s_j = y_j − level). The
    recursion is genuinely sequential with an 9-number state
    (l, b, s₀..s₆) — run as the E478 fold; the oracle replays the
    IDENTICAL float64 op sequence via a recursive CTE carrying all
    nine columns, updating exactly one seasonal slot per step (slot =
    position mod 7; every (1−α) is written as the literal subtraction
    in BOTH engines so the multipliers are bit-identical). Output:
    final state + h=1..7 forecasts, floor-e4 integers.
    """
    from parquet_to_csv_spark.functions.stable import exact_units

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.expr("(ts div 1000) div 86400000000").alias("day"))
        .agg(F.sum(exact_units(F.col("value"), 2)).alias("cents"))
    )

    A, B, G = 0.3, 0.1, 0.2

    def _hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        y = pdf["cents"].values.astype("float64")
        n = len(y)
        w1 = y[:7].sum() / 7.0
        w2 = y[7:14].sum() / 7.0
        level = w1
        trend = (w2 - w1) / 7.0
        s = [y[j] - w1 for j in range(7)]
        for t in range(7, n):
            j = t % 7
            l_new = A * (y[t] - s[j]) + (1.0 - A) * (level + trend)
            trend = B * (l_new - level) + (1.0 - B) * trend
            s[j] = G * (y[t] - l_new) + (1.0 - G) * s[j]
            level = l_new
        out = []
        for h in range(1, horizon + 1):
            slot = (n - 1 + h) % 7
            fc = level + h * trend + s[slot]
            out.append((h, n, level, trend, fc))
        return pd.DataFrame(
            out, columns=["h", "n_days", "level", "trend", "forecast"]
        )

    raw = daily.withColumn("g", F.lit(1)).groupBy("g").applyInPandas(
        lambda pdf: _hw(pdf),
        "h int, n_days long, level double, trend double, forecast double",
    )
    return raw.select(
        "h",
        "n_days",
        F.floor(F.col("level") * F.lit(1e4) + F.lit(0.5))
        .cast("long")
        .alias("level_e4"),
        F.floor(F.col("trend") * F.lit(1e4) + F.lit(0.5))
        .cast("long")
        .alias("trend_e4"),
        F.floor(F.col("forecast") * F.lit(1e4) + F.lit(0.5))
        .cast("long")
        .alias("forecast_e4"),
    )
