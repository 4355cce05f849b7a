"""Cross-engine float-stability contract: the Spark `stable_avg`
expressions and their DuckDB twins must agree EXACTLY (not within
epsilon) on a large randomized sample — this is what makes the oracle
value-hashes reproducible at any partition count.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from parquet_to_csv_spark.functions.stable import (
    duck_avg_2dp,
    duck_avg_int,
    duck_sum_2dp,
    stable_avg_2dp,
    stable_avg_int,
    stable_sum_2dp,
)


def _sample(n=2000, seed=42):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        cnt = rng.randint(1, 500)
        # 2-decimal values summed: sum is (close to) an integer number of cents
        cents = rng.randint(0, 10_000_000)
        rows.append((i, cents / 100.0, cnt))
    return pd.DataFrame(rows, columns=["gid", "sum_2dp", "cnt"])


def test_stable_avg_2dp_matches_duckdb(spark):
    pdf = _sample()
    sdf = spark.createDataFrame(pdf)
    got = {
        r["gid"]: r["avg"]
        for r in sdf.select(
            "gid", stable_avg_2dp(F.col("sum_2dp"), F.col("cnt")).alias("avg")
        ).collect()
    }
    duck = duckdb.connect()
    duck.register("t", pdf)
    expr = duck_avg_2dp("sum_2dp", "cnt")
    want = dict(duck.execute(f"SELECT gid, {expr} FROM t").fetchall())
    assert got == want  # exact equality, all 2000 groups


def test_stable_avg_int_matches_duckdb(spark):
    rng = random.Random(7)
    pdf = pd.DataFrame(
        [(i, rng.randint(0, 10**9), rng.randint(1, 999)) for i in range(2000)],
        columns=["gid", "s", "cnt"],
    )
    sdf = spark.createDataFrame(pdf)
    got = {
        r["gid"]: r["avg"]
        for r in sdf.select(
            "gid", stable_avg_int(F.col("s"), F.col("cnt")).alias("avg")
        ).collect()
    }
    duck = duckdb.connect()
    duck.register("t", pdf)
    expr = duck_avg_int("s", "cnt")
    want = dict(duck.execute(f"SELECT gid, {expr} FROM t").fetchall())
    assert got == want


def _money_sample(dp: int, n_groups=200, rows_per_group=40, seed=11):
    """Random true-dp-decimal 'money' values; every 5th group is rigged
    so its exact decimal sum lands EXACTLY on a `.xx5` rounding
    boundary — the case where round(sum(double), 2) is decided by
    summation order and a float-sum parity would flap."""
    rng = random.Random(seed)
    scale = 10**dp
    rows = []
    for g in range(n_groups):
        units = [rng.randint(0, 10**7) for _ in range(rows_per_group - 1)]
        tail = rng.randint(0, 10**7)
        if g % 5 == 0:
            # force sum ≡ half-cent (mod one cent): exactly on boundary
            half = scale // 100 // 2
            tail += (half - (sum(units) + tail)) % (scale // 100)
        units.append(tail)
        rows.extend((g, u / scale) for u in units)
    return pd.DataFrame(rows, columns=["gid", "v"])


@pytest.mark.parametrize("dp", [2, 4, 6])
@pytest.mark.parametrize("n_parts", [1, 7, 32])
def test_stable_sum_2dp_partition_invariant_and_matches_duckdb(spark, dp, n_parts):
    """The stable 2dp sum must be bit-identical to its DuckDB twin at
    ANY partition count, including on exact half-cent boundary sums."""
    pdf = _money_sample(dp)
    sdf = spark.createDataFrame(pdf).repartition(n_parts)
    got = {
        r["gid"]: r["s"]
        for r in sdf.groupBy("gid")
        .agg(stable_sum_2dp(F.col("v"), dp).alias("s"))
        .collect()
    }
    duck = duckdb.connect()
    duck.register("t", pdf)
    want = dict(
        duck.execute(
            f"SELECT gid, {duck_sum_2dp('v', dp)} FROM t GROUP BY gid"
        ).fetchall()
    )
    assert got == want  # exact float equality, all groups


@pytest.mark.parametrize("n_parts", [1, 7])
def test_stable_sum_2dp_signed_matches_duckdb(spark, n_parts):
    """Mixed-sign sums (profit-style): Spark's pmod floor-division and
    the DuckDB twin must agree on NEGATIVE totals too — DuckDB's `//`
    truncates toward zero, which silently disagreed by one cent on
    negative sums until the twin switched to explicit floor division
    (first surfaced by Q9's profit)."""
    rng = random.Random(23)
    rows = []
    for g in range(200):
        units = [rng.randint(-(10**7), 10**7) for _ in range(39)]
        tail = rng.randint(-(10**7), 10**7)
        if g % 5 == 0:
            # rig the total onto a half-cent boundary, negative side
            half = 10**4 // 100 // 2
            tail += (half - (sum(units) + tail)) % (10**4 // 100)
            if sum(units) + tail > 0:
                tail -= 2 * (sum(units) + tail)
        units.append(tail)
        rows.extend((g, u / 10**4) for u in units)
    pdf = pd.DataFrame(rows, columns=["gid", "v"])
    sdf = spark.createDataFrame(pdf).repartition(n_parts)
    got = {
        r["gid"]: r["s"]
        for r in sdf.groupBy("gid").agg(stable_sum_2dp(F.col("v"), 4).alias("s")).collect()
    }
    duck = duckdb.connect()
    duck.register("t", pdf)
    want = dict(
        duck.execute(f"SELECT gid, {duck_sum_2dp('v', 4)} FROM t GROUP BY gid").fetchall()
    )
    assert got == want
