"""Skew mitigation — explicit key salting for hot-key joins.

AQE's skew-join splitting (on in ``session.get_spark``) is the first
line of defense and needs no code. Salting is the deliberate,
plan-time alternative for *known* hot keys — e.g. the null/default key
of an event stream, or a bot user owning 1% of a 100 TB fact table —
where one shuffle partition would otherwise hold the whole hot key.

Mechanics: the fact side computes a salt in [0, n_salt) from columns
*other than* the join key (same-key rows must scatter); the dim side
replicates each row n_salt times (explode). The join key becomes
(key, salt): the hot key now occupies n_salt partitions. Join output
is bit-identical to the unsalted join — the salt never escapes — so
the operator is oracle-checked against the plain SQL join.

Cost model: dim side inflates ×n_salt through its exchange — salting
pays when (hot-key row share) × (fact size) dwarfs n_salt × dim size,
i.e. exactly the broadcast-ineligible big⋈medium case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from parquet_to_csv_spark.functions.stable import stable_sum_2dp
from parquet_to_csv_spark.sources.tables import load_table


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_expr: Column,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted key. ``salt_expr`` must be deterministic
    per fact row and independent of ``key`` (e.g. a hash of other
    columns) so one key's rows spread over all salts."""
    f = fact.withColumn("_salt", F.pmod(salt_expr, F.lit(n_salt)).cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo query: lineitem ⋈ orders with an 8-way salted orderkey,
    aggregated per status — results identical to the plain join (the
    oracle runs the unsalted SQL)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_partkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    joined = salted_equi_join(
        li,
        orders,
        "o_orderkey",
        salt_expr=F.xxhash64(F.col("l_partkey"), F.col("l_linenumber")),
        n_salt=8,
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_lines"),
        # exact-units sum: a true-4dp revenue sum rounds flakily at 2dp
        # (see functions.stable) — integer units are order-independent.
        stable_sum_2dp(rev, 4).alias("revenue"),
    )
