"""Bloom-filter sketch as pure relational algebra — EXT north-star
("a novel sketch" tier beside MinHash/SimHash).

A Bloom filter is usually an imperative bit array; here both phases are
DataFrame aggregations, which is exactly how you build one over 100 TB:

- **build**: every key emits k bit positions (md5-derived, the shared
  cross-engine hash family); positions group into 64-bit words and fold
  with ``bit_or`` — associative/commutative, so the bitmap is identical
  under any partitioning, and the result is m/64 rows (tiny) that
  broadcast to probes. This is precisely the map-side-combine shape a
  distributed Bloom build wants — no driver-side bit array ever exists.
- **probe**: each candidate key recomputes its k positions and checks
  all bits via a broadcast join against the word relation; membership =
  every probed bit set.

The gate query verifies the DEFINING properties against exact
membership: zero false negatives (a Bloom guarantee — any FN is a bug,
not a tuning issue) and the observed false-positive count (a fixed
deterministic number here, since hashes and data are fixed).

Spark's own runtime bloom-filter join pruning (enabled in session.py)
is the planner-internal cousin; this operator is the *user-level* one
you persist and ship (e.g. "which of yesterday's URLs might be in the
corpus" without touching the corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from parquet_to_csv_spark.sources.tables import load_table

_HEX = "0123456789abcdef"

# m = 2^14 bits (512 32-bit words), k = 3 hash functions. ~1500 keys at
# m=16384 → load factor ~0.27 bits/key·k, FP rate ≈ (1-e^(-kn/m))^k ≈ 2%.
M_BITS = 16_384
N_WORDS = M_BITS // 32
K_HASHES = 3


def _md5_slice_bucket(col: Column, start: int, buckets: int) -> Column:
    """Integer in [0, buckets) from 4 hex nibbles of md5(col) starting
    at 1-based position ``start`` — the same instr-per-nibble construction
    as corpus.md5_bucket, offset-parameterized so one md5 yields
    independent hash functions (nibbles 1-4, 5-8, 9-12)."""
    h = F.md5(col.cast("string"))
    v = F.lit(0)
    for i, w in enumerate((4096, 256, 16, 1)):
        d = F.call_function("instr", F.lit(_HEX), F.substring(h, start + i, 1)) - 1
        v = v + d * F.lit(w)
    return v % buckets


def duck_md5_slice_bucket(expr: str, start: int, buckets: int) -> str:
    """DuckDB twin of :func:`_md5_slice_bucket` — keep in sync."""
    h = f"md5(CAST({expr} AS VARCHAR))"
    parts = " + ".join(
        f"(instr('{_HEX}', substring({h}, {start + i}, 1)) - 1) * {w}"
        for i, w in enumerate((4096, 256, 16, 1))
    )
    return f"(({parts}) % {buckets})"


def _positions(col: Column) -> list[Column]:
    return [
        _md5_slice_bucket(col, 1 + 4 * j, M_BITS) for j in range(K_HASHES)
    ]


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """(word_idx, bits) bitmap relation — m/32 rows, broadcastable.

    32 bits per long word: bit 63 never participates, so no engine's
    shift/sign-bit range rules are ever in play."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col)))).alias("p")
    )
    return (
        pos.select(
            F.expr("p div 32").cast("int").alias("word_idx"),
            # SQL shiftleft: the Python helper wants a literal bit count
            F.expr("shiftleft(cast(1 as bigint), cast(p % 32 as int))").alias("w"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(w)").alias("bits"))
    )


def bloom_membership_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: build the filter over customer keys, probe a key
    range twice the key domain, and report TP / FP / FN (must be 0)
    against exact membership, all deterministic."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    bitmap = bloom_build(cust, "c_custkey")
    probes = spark.range(0, 3000).select(F.col("id").alias("k"))
    probe_pos = probes.select(
        "k", F.posexplode(F.array(*_positions(F.col("k")))).alias("j", "p")
    ).select(
        "k",
        "j",
        F.expr("p div 32").cast("int").alias("word_idx"),
        (F.col("p") % 32).cast("int").alias("bit"),
    )
    # AND-mask membership (never right-shift: the sign bit makes >> of
    # a negative word engine-dependent; x & (1<<b) != 0 is sign-safe)
    mask = F.expr("shiftleft(cast(1 as bigint), bit)")
    checked = (
        probe_pos.join(F.broadcast(bitmap), "word_idx", "left")
        .select(
            "k",
            (
                F.coalesce(F.col("bits"), F.lit(0).cast("long")).bitwiseAND(mask)
                != 0
            ).cast("int").alias("hit"),
        )
        .groupBy("k")
        .agg((F.sum("hit") == K_HASHES).alias("in_bloom"))
    )
    exact = cust.select(F.col("c_custkey").alias("k")).withColumn(
        "in_exact", F.lit(True)
    )
    j = checked.join(exact, "k", "left").select(
        "k", "in_bloom", F.coalesce(F.col("in_exact"), F.lit(False)).alias("in_exact")
    )
    return j.agg(
        F.count(F.when(F.col("in_bloom") & F.col("in_exact"), 1)).alias("n_tp"),
        F.count(F.when(F.col("in_bloom") & ~F.col("in_exact"), 1)).alias("n_fp"),
        F.count(F.when(~F.col("in_bloom") & F.col("in_exact"), 1)).alias("n_fn"),
        F.count(F.when(~F.col("in_bloom") & ~F.col("in_exact"), 1)).alias("n_tn"),
    )
