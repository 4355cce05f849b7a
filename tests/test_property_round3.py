"""Property-based tests (hypothesis) for the round-3 algorithmic cores.

Two pieces carry subtle invariants that example-based tests undercover:

- ``relational.distributed_ntile`` must equal Spark's own
  ``F.ntile`` over the same unique total order for ANY value
  distribution, tile count, and banding width — including degenerate
  cases (n < tiles, all-equal values, single band, one band per row).
- the pure-Python PNG codec must round-trip ANY uint8 image through
  encode→decode (the decoder additionally has hand-built multi-filter
  fixtures in test_imagecodec.py).
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Window as W, functions as F

from parquet_to_csv_spark.functions import imagecodec as ic
from parquet_to_csv_spark.operators.relational import distributed_ntile

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60),
    n_tiles=st.integers(min_value=1, max_value=12),
    band_width=st.integers(min_value=1, max_value=500),
)
def test_distributed_ntile_equals_spark_ntile(spark, vals, n_tiles, band_width):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, val long"
    )
    got = {
        r["k"]: r["tile"]
        for r in distributed_ntile(
            df, "val", "k", n_tiles, F.expr(f"val div {band_width}")
        ).collect()
    }
    w = W.orderBy(F.asc("val"), F.asc("k"))
    want = {
        r["k"]: r["t"]
        for r in df.select("k", F.ntile(n_tiles).over(w).alias("t")).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_random_images(h, w, c, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    assert np.array_equal(ic.decode_png(ic.encode_png(img)), img)


@settings(**_SETTINGS)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_random_images(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(img)), img)
