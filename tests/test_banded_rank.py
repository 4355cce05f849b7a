"""Property tests for the round-4 shared banded-rank machinery.

``relational.banded_row_number`` / ``banded_prefix_sum`` are the
drop-ins that retired the last unpartitioned data windows; each must
equal Spark's own window function over the same unique total order for
ANY value distribution, banding width, and grouping — including
degenerate cases (one band, one band per row, negative values, all
values equal).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Window as W, functions as F

from parquet_to_csv_spark.operators.relational import (
    banded_prefix_sum,
    banded_row_number,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # group
        st.integers(min_value=-1000, max_value=1000),  # val
        st.integers(min_value=0, max_value=50),  # weight
    ),
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(rows=_ROWS, band_width=st.integers(min_value=1, max_value=500))
def test_banded_row_number_global(spark, rows, band_width):
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v, _) in enumerate(rows)], "k long, g long, val long"
    )
    got = {
        (r["k"]): (r["rn"], r["n"])
        for r in banded_row_number(
            df, ["val", "k"], F.expr(f"val div {band_width}"),
            out_col="rn", total_col="n",
        ).collect()
    }
    w = W.orderBy(F.asc("val"), F.asc("k"))
    want = {
        r["k"]: (r["rn"], len(rows))
        for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(rows=_ROWS, band_width=st.integers(min_value=1, max_value=500))
def test_banded_row_number_grouped(spark, rows, band_width):
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v, _) in enumerate(rows)], "k long, g long, val long"
    )
    got = {
        r["k"]: r["rn"]
        for r in banded_row_number(
            df, ["val", "k"], F.expr(f"val div {band_width}"),
            out_col="rn", group_cols=["g"],
        ).collect()
    }
    w = W.partitionBy("g").orderBy(F.asc("val"), F.asc("k"))
    want = {
        r["k"]: r["rn"]
        for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(rows=_ROWS, band_width=st.integers(min_value=1, max_value=500))
def test_banded_prefix_sum_grouped(spark, rows, band_width):
    df = spark.createDataFrame(
        [(i, g, v, w_) for i, (g, v, w_) in enumerate(rows)],
        "k long, g long, val long, w long",
    )
    got = {
        r["k"]: r["cum"]
        for r in banded_prefix_sum(
            df, ["val", "k"], "w", F.expr(f"val div {band_width}"),
            out_col="cum", group_cols=["g"],
        ).collect()
    }
    w = (
        W.partitionBy("g")
        .orderBy(F.asc("val"), F.asc("k"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    want = {
        r["k"]: r["cum"]
        for r in df.select("k", F.sum("w").over(w).alias("cum")).collect()
    }
    assert got == want
