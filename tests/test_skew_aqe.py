"""AQE runtime skew-join handling — the engine's second skew lever
beside the explicit salted join (operators/skew.py): prove that with
skew thresholds scaled to the toy fixture, Spark's adaptive planner
actually SPLITS the hot partition at runtime (``skew=true`` in the
final executed plan) and the join result is unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    # the downstream groupBy(k) needs hash partitioning on k, which a
    # skew split breaks — this conf tells AQE to split anyway and pay
    # the extra exchange (exactly the trade a real skewed pipeline
    # makes: one more shuffle of the aggregate side vs a straggler
    # task holding the whole job)
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


@pytest.fixture()
def skew_session(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_partition(skew_session):
    spark = skew_session
    # one hot key carrying ~95% of the fact side
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_v")
    )
    joined = fact.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dim_v").alias("s")
    )
    rows = {r["k"]: r["n"] for r in joined.collect()}
    # correctness first: hot key kept every row
    assert rows[7] == sum(1 for i in range(200_000) if i % 20 != 0)
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final_plan, final_plan[:2000]
