"""Cross-engine float-stability contract: the Spark `stable_avg`
expressions and their DuckDB twins must agree EXACTLY (not within
epsilon) on a large randomized sample — this is what makes the oracle
value-hashes reproducible at any partition count.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from parquet_to_csv_spark.functions.stable import (
    duck_avg_2dp,
    duck_avg_int,
    stable_avg_2dp,
    stable_avg_int,
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
