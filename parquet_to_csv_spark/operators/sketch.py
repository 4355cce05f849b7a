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


# --------------------------------------------------------------------------
# HyperLogLog distinct sketch — mergeable cardinality registers as a groupBy
# --------------------------------------------------------------------------

# m = 2^8 registers. Spark's approx_count_distinct is the planner-internal
# cousin (HLL++ under the hood); this is the *user-level* register relation
# you persist per partition/day and merge later with a plain max-groupBy —
# the mergeability is the whole point at 100 TB (sketch once per ingest
# batch, union register tables, max per bucket, estimate — never rescan).
HLL_M = 256


def _nibble(col: Column) -> Column:
    """Value 0-15 of one hex character."""
    return F.call_function("instr", F.lit(_HEX), col) - 1


def hll_registers(keys: DataFrame, key_col: str) -> DataFrame:
    """(bucket, m) register relation, ≤ HLL_M rows.

    bucket = first 8 bits of md5(key); rho = 1 + number of leading zero
    bits of the following 60 bits (nibbles 3-17), derived purely from
    string ops (ltrim of leading '0' nibbles + a CASE on the first
    non-zero nibble) so both engines compute the identical integer —
    no float log2 anywhere. Duplicate keys are free: max() absorbs
    them, which is why HLL needs no pre-distinct pass.
    """
    h = F.md5(F.col(key_col).cast("string"))
    bucket = _nibble(F.substring(h, 1, 1)) * 16 + _nibble(F.substring(h, 2, 1))
    t = F.expr(
        "trim(LEADING '0' FROM substring(md5(cast({k} as string)), 3, 15))".format(
            k=key_col
        )
    )
    d = _nibble(F.substring(t, 1, 1))
    rho = F.when(F.length(t) == 0, F.lit(61)).otherwise(
        (F.lit(15) - F.length(t)) * 4
        + F.when(d >= 8, 1).when(d >= 4, 2).when(d >= 2, 3).otherwise(4)
    )
    return (
        keys.select(bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: sketch ``events.user_id``, estimate cardinality, and
    surface the exact distinct beside it (the error is part of the
    hashed output, so the gate pins both the registers and the math).

    The harmonic-mean denominator is summed as exact integers
    (2^(61-rho) per register, DECIMAL(38,0) — powers of two, no float
    until the single final division), so the estimate is identical
    under any partitioning/engine. Small-range linear counting applies
    below 2.5·m with empty registers present (the standard HLL
    correction).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    regs = hll_registers(ev, "user_id")
    acc = regs.agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.expr("cast(shiftleft(cast(1 as bigint), 61 - m) as decimal(38,0))")
        ).alias("s_present"),
    ).select(
        (F.lit(HLL_M) - F.col("n_present")).alias("n_zero_registers"),
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("n_present")).cast("decimal(38,0)")
            * F.lit(2305843009213693952).cast("decimal(38,0)")
        ).cast("double").alias("s_total"),
    )
    raw = F.lit((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 2305843009213693952.0) / F.col("s_total")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("n_zero_registers") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("n_zero_registers")),
    ).otherwise(raw)
    exact = ev.agg(F.count_distinct("user_id").alias("n_exact"))
    return acc.crossJoin(exact).select(
        "n_exact",
        "n_zero_registers",
        F.round(est, 2).alias("hll_estimate"),
    )


# --------------------------------------------------------------------------
# Count-min sketch — heavy-hitter frequency estimation as two groupBys
# --------------------------------------------------------------------------

# d = 3 hash rows × w = 1024 columns. Build shuffles ≤ d·w rows after
# map-side combine regardless of corpus size; the sketch broadcasts to
# probes. Guarantee under test: n_cms >= n_exact always (min of
# overcounts), overshoot bounded by the collision mass.
CMS_D = 3
CMS_W = 1024


def cms_build(items: DataFrame, item_col: str) -> DataFrame:
    """(j, c, n) count matrix, ≤ CMS_D · CMS_W rows."""
    pos = items.select(
        F.posexplode(
            F.array(*[
                _md5_slice_bucket(F.col(item_col), 1 + 4 * j, CMS_W)
                for j in range(CMS_D)
            ])
        ).alias("j", "c")
    )
    return pos.groupBy("j", "c").agg(F.count("*").alias("n"))


def cms_heavy_hitters(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Gate query: build the CMS over every token instance of
    ``documents``, probe the exact top-k tokens, and emit exact vs
    sketch counts side by side (overcount ≥ 0 by construction —
    a negative value would be a bug, same class as a Bloom FN)."""
    docs = load_table(spark, sf_dir, "documents")
    from parquet_to_csv_spark.functions.textfn import tokens_col

    toks = docs.select(F.explode(tokens_col("text")).alias("token"))
    cms = cms_build(toks, "token")
    exact = toks.groupBy("token").agg(F.count("*").alias("n_exact"))
    top = exact.orderBy(F.desc("n_exact"), F.asc("token")).limit(k)
    probe = top.select(
        "token",
        "n_exact",
        F.posexplode(
            F.array(*[
                _md5_slice_bucket(F.col("token"), 1 + 4 * j, CMS_W)
                for j in range(CMS_D)
            ])
        ).alias("j", "c"),
    )
    return (
        probe.join(F.broadcast(cms), ["j", "c"])
        .groupBy("token", "n_exact")
        .agg(F.min("n").alias("n_cms"))
        .select(
            "token",
            "n_exact",
            "n_cms",
            (F.col("n_cms") - F.col("n_exact")).alias("overcount"),
        )
    )


def _hll_estimate_by_tag(regs: DataFrame) -> DataFrame:
    """(tag, estimate) from a (tag, bucket, m) register relation —
    the grouped form of the ``hll_distinct_estimate`` math: exact
    integer power-of-two harmonic sums per tag, one final double
    division, the standard linear-counting correction below 2.5·m."""
    acc = regs.groupBy("tag").agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.expr("cast(shiftleft(cast(1 as bigint), 61 - m) as decimal(38,0))")
        ).alias("s_present"),
    ).select(
        "tag",
        (F.lit(HLL_M) - F.col("n_present")).alias("n_zero"),
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("n_present")).cast("decimal(38,0)")
            * F.lit(2305843009213693952).cast("decimal(38,0)")
        ).cast("double").alias("s_total"),
    )
    raw = F.lit((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 2305843009213693952.0) / F.col("s_total")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("n_zero") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("n_zero")),
    ).otherwise(raw)
    return acc.select("tag", F.round(est, 2).alias("est"))


def hll_segment_overlap(
    spark: SparkSession, sf_dir: str, seg_a: str = "click", seg_b: str = "purchase"
) -> DataFrame:
    """Sketch set-algebra: audience overlap between two event segments
    estimated from their HLL register tables ALONE — |A| and |B| from
    each segment's registers, |A∪B| from the max-merge of the two
    register tables (never rescanning either segment), and |A∩B| by
    inclusion-exclusion on the three (already-rounded, hence
    deterministic) estimates. This is the operation that makes
    per-segment sketches composable at 100 TB: daily audience registers
    merge into weekly/monthly/any-ad-hoc union without touching raw
    events, at kilobytes per segment.

    Exact distincts ride along so the gate pins both the register
    relations and the estimate math; the inclusion-exclusion error
    compounds the three sketches' errors — expected, and visible in
    the output.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    tagged = ev.filter(F.col("event_type").isin(seg_a, seg_b)).select(
        F.when(F.col("event_type") == seg_a, F.lit("a")).otherwise(F.lit("b")).alias("tag"),
        "user_id",
    )
    h = F.md5(F.col("user_id").cast("string"))
    bucket = _nibble(F.substring(h, 1, 1)) * 16 + _nibble(F.substring(h, 2, 1))
    t = F.expr("trim(LEADING '0' FROM substring(md5(cast(user_id as string)), 3, 15))")
    d = _nibble(F.substring(t, 1, 1))
    rho = F.when(F.length(t) == 0, F.lit(61)).otherwise(
        (F.lit(15) - F.length(t)) * 4
        + F.when(d >= 8, 1).when(d >= 4, 2).when(d >= 2, 3).otherwise(4)
    )
    regs = (
        tagged.select("tag", bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("tag", "bucket")
        .agg(F.max("rho").alias("m"))
    )
    union_regs = (
        regs.groupBy("bucket")
        .agg(F.max("m").alias("m"))
        .select(F.lit("u").alias("tag"), "bucket", "m")
    )
    est = _hll_estimate_by_tag(regs.union(union_regs))
    wide = est.groupBy().pivot("tag", ["a", "b", "u"]).agg(F.first("est"))
    exact = tagged.groupBy().agg(
        F.count_distinct(F.when(F.col("tag") == "a", F.col("user_id"))).alias("n_exact_a"),
        F.count_distinct(F.when(F.col("tag") == "b", F.col("user_id"))).alias("n_exact_b"),
        F.count_distinct("user_id").alias("n_exact_union"),
    )
    return wide.crossJoin(exact).select(
        F.col("a").alias("est_a"),
        F.col("b").alias("est_b"),
        F.col("u").alias("est_union"),
        F.round(F.col("a") + F.col("b") - F.col("u"), 2).alias("est_intersection"),
        "n_exact_a",
        "n_exact_b",
        "n_exact_union",
        (F.col("n_exact_a") + F.col("n_exact_b") - F.col("n_exact_union")).alias(
            "n_exact_intersection"
        ),
    )


def logbucket_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable float-free quantile sketch: order values histogrammed
    into (decimal digits, leading digit) buckets — ~9 buckets per
    decade, giving quantile estimates with bounded ≤11% relative error
    (the bucket's own width) from a relation of AT MOST a few dozen
    rows regardless of input size.

    Why not approx_percentile: this sketch is MERGEABLE BY SUM — per
    ingest-batch bucket counts fold into the corpus sketch with a
    groupBy, never rescanning history (the HLL-register pattern for
    quantiles) — and it contains no float operation at all: bucketing
    is string-length/leading-digit arithmetic on exact integer cents,
    rank cuts are ceiling integer divisions, so every engine returns
    the identical bucket for every quantile.

    Output: one row per requested quantile with the bucket's lower
    bound (a guaranteed underestimate by < one leading-digit width),
    the bucket coordinates, and the covered rank mass.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    buckets = (
        orders.select(cents.alias("cents"))
        .select(
            F.length(F.col("cents").cast("string")).alias("digits"),
            F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias("lead"),
        )
        .groupBy("digits", "lead")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("digits", "lead")
    ranked = buckets.withColumn(
        "cum_n", F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("ord", F.row_number().over(w))
    total = F.broadcast(ranked.agg(F.max("cum_n").alias("n_total")))
    qs = spark.createDataFrame(
        [(500_000,), (900_000,), (990_000,)], "q_ppm long"
    )
    hits = (
        ranked.join(total)
        .join(F.broadcast(qs))
        .filter(
            F.col("cum_n") >= F.expr("(q_ppm * n_total + 999999) div 1000000")
        )
    )
    first = hits.groupBy("q_ppm").agg(F.min("ord").alias("ord"))
    return (
        first.join(ranked, "ord")
        .join(total)
        .select(
            "q_ppm",
            (
                F.col("lead").cast("long")
                * F.expr("cast(pow(10, digits - 1) as long)")
            ).alias("est_lo_cents"),
            "digits",
            "lead",
            "cum_n",
            "n_total",
        )
    )


def hll_registers_by(keys: DataFrame, key_col: str, *group_cols: str) -> DataFrame:
    """(group..., bucket, m) register relation — :func:`hll_registers`
    generalized to one sketch PER GROUP (per day, per segment…), the
    building block of mergeable-sketch rollups: ≤ HLL_M rows per group
    regardless of input size."""
    h = F.md5(F.col(key_col).cast("string"))
    bucket = _nibble(F.substring(h, 1, 1)) * 16 + _nibble(F.substring(h, 2, 1))
    t = F.expr(
        "trim(LEADING '0' FROM substring(md5(cast({k} as string)), 3, 15))".format(
            k=key_col
        )
    )
    d = _nibble(F.substring(t, 1, 1))
    rho = F.when(F.length(t) == 0, F.lit(61)).otherwise(
        (F.lit(15) - F.length(t)) * 4
        + F.when(d >= 8, 1).when(d >= 4, 2).when(d >= 2, 3).otherwise(4)
    )
    return (
        keys.select(*group_cols, bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m"))
    )


def rolling_distinct_hll(
    spark: SparkSession, sf_dir: str, window_days: int = 7
) -> DataFrame:
    """Rolling 7-day distinct users from MERGED daily HLL sketches —
    the re-aggregation pattern that makes rolling distincts affordable
    at 100 TB: the raw data is touched ONCE (daily register build,
    ≤256 rows/day); every window estimate then folds register rows,
    never events. Exact rolling distinct (the expensive way) is
    computed beside it, so the gate pins registers, merge, estimate
    AND the sketch's actual error.

    Register merge = max per (window, bucket) — associative and
    order-free; the harmonic-mean denominator sums exact powers of two
    in DECIMAL (no float until one final division), same convention as
    hll_distinct_estimate.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 86400000000000").alias("day")
    )
    daily = hll_registers_by(ev, "user_id", "day")
    t = F.broadcast(ev.select("day").distinct().select(F.col("day").alias("t_day")))
    merged = (
        daily.join(
            t,
            (F.col("day") <= F.col("t_day"))
            & (F.col("day") > F.col("t_day") - window_days),
        )
        .groupBy("t_day", "bucket")
        .agg(F.max("m").alias("m"))
    )
    acc = merged.groupBy("t_day").agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.expr("cast(shiftleft(cast(1 as bigint), 61 - m) as decimal(38,0))")
        ).alias("s_present"),
    ).select(
        "t_day",
        (F.lit(HLL_M) - F.col("n_present")).alias("n_zero_registers"),
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("n_present")).cast("decimal(38,0)")
            * F.lit(2305843009213693952).cast("decimal(38,0)")
        ).cast("double").alias("s_total"),
    )
    raw = F.lit(
        (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 2305843009213693952.0
    ) / F.col("s_total")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("n_zero_registers") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("n_zero_registers")),
    ).otherwise(raw)
    exact = (
        ev.distinct()
        .join(
            t,
            (F.col("day") <= F.col("t_day"))
            & (F.col("day") > F.col("t_day") - window_days),
        )
        .groupBy("t_day")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return (
        acc.join(exact, "t_day")
        .select(
            F.col("t_day").alias("day"),
            "n_exact",
            "n_zero_registers",
            F.round(est, 2).alias("hll_estimate"),
        )
    )


def bbit_minhash_calibration(
    spark: SparkSession, sf_dir: str, n_perm: int = 16
) -> DataFrame:
    """EXT E355: 1-bit (b-bit) minwise-hash estimator calibration
    (Li & König) — storing only the LOWEST BIT of each minhash shrinks
    signatures 64×, and Ĵ = 2·(bit-agreement) − 1 unbiases the
    estimate; this table shows, per exact-Jaccard band, what the 1-bit
    estimator actually reads on this corpus — the sizing evidence for
    shipping 2-byte signatures at 100 TB instead of 256-byte ones.

    Engine-exact construction: the "permutations" are md5 rings —
    minhash_p(doc) = min over grams of md5(gram:p), compared
    LEXICOGRAPHICALLY (identical in any engine; the md5 convention),
    bit = parity of the first hex nibble. Candidate pairs ride the
    materialized near-dup edge relation at its build floor; exact
    Jaccard is recomputed over the SAME gram sets the sketch hashes.
    All outputs floored integer milli units.
    """
    from parquet_to_csv_spark.functions.textfn import tokens_col
    from parquet_to_csv_spark.operators.dedup import _gram_strings, dedup_edges

    # spread=True: the 16 per-gram md5 rings below run in the scan's
    # pipelined stage — single-task on a one-file fixture (guide §2.5)
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", tokens_col("text").alias("toks")
    )
    pairs = dedup_edges(spark, sf_dir, 0.5).select("doc_a", "doc_b")
    # only pair members need gram sets or signatures — semi-join first
    # (at 100 TB the pair-involved docs are a sliver of the corpus),
    # and materialize the gram relation once: it feeds the exact-
    # jaccard sides AND the 16 min-hash aggregates
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    from parquet_to_csv_spark.operators.dedup import _materialize_once

    grams = _materialize_once(
        docs.join(members, "doc_id", "left_semi").select(
            "doc_id", _gram_strings(F.col("toks"), 3).alias("grams")
        )
    )
    ex = grams.select("doc_id", F.explode("grams").alias("g"))
    bits_row = ex.groupBy("doc_id").agg(
        *[
            (
                # LOW bit of the min (last hex nibble): the min's HIGH
                # nibbles are biased toward 0 by the min itself (a 30-gram
                # doc's min md5 starts with '0' ~86% of the time), so
                # first-nibble parity of two unrelated docs agrees far
                # above 1/2 — the low bit is uniform and independent
                F.expr(
                    f"ascii(substr(min(md5(concat(g, ':{p}'))), 32, 1))"
                ) % 2
            ).cast("long").alias(f"b{p}")
            for p in range(n_perm)
        ]
    )
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("gr_a"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gr_b"))
    ba = bits_row.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{p}").alias(f"a{p}") for p in range(n_perm)],
    )
    bb = bits_row.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{p}").alias(f"c{p}") for p in range(n_perm)],
    )
    agree = sum(
        (F.col(f"a{p}") == F.col(f"c{p}")).cast("long") for p in range(n_perm)
    )
    scored = (
        pairs.join(ga, "doc_a").join(gb, "doc_b").join(ba, "doc_a").join(bb, "doc_b")
        .select(
            agree.alias("agree"),
            F.expr(
                f"size(array_intersect(gr_a, gr_b)) * 1000"
                f" div (size(gr_a) + size(gr_b) - size(array_intersect(gr_a, gr_b)))"
            ).alias("exact_milli"),
        )
        .select(
            "agree",
            "exact_milli",
            F.expr(f"agree * 2000 div {n_perm} - 1000").alias("est_milli"),
        )
    )
    return (
        scored.withColumn("band", F.expr("exact_milli div 50"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.expr("sum(exact_milli) div count(*)").alias("mean_exact_milli"),
            F.expr("sum(est_milli) div count(*)").alias("mean_est_milli"),
        )
    )


def join_size_prediction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E407: sketch-based join-size prediction vs ground truth —
    the estimate a distributed planner makes BEFORE committing to a
    shuffle strategy. For each join pair the report carries the
    textbook uniformity estimate |A⋈B| ≈ |A|·|B| / max(ndv_A, ndv_B)
    with both NDVs from the engine-replayable HLL sketch (E88 math:
    string-op rho, exact power-of-two register sums), next to the
    exact join cardinality and the signed error ppm — the table that
    says where uniformity lies (FK joins: near-exact; skewed/filtered
    keys: the planner's blind spot, quantified).

    Sketch cost: one pass per side, ≤ 256 register rows per sketch —
    at 100 TB this is how you size a join without running it."""
    spec = [
        ("customer_orders", ("customer", "c_custkey"), ("orders", "o_custkey")),
        ("orders_lineitem", ("orders", "o_orderkey"), ("lineitem", "l_orderkey")),
        ("part_lineitem", ("part", "p_partkey"), ("lineitem", "l_partkey")),
    ]
    keyed = None
    for jn, left, right in spec:
        for side, (t, k) in (("l", left), ("r", right)):
            df = load_table(spark, sf_dir, t).select(
                F.lit(f"{jn}|{side}").alias("tag"),
                F.col(k).cast("long").alias("key"),
            )
            keyed = df if keyed is None else keyed.unionByName(df)
    est = _hll_estimate_by_tag(hll_registers_by(keyed, "key", "tag"))
    counts = keyed.groupBy("tag").agg(F.count(F.lit(1)).alias("n"))
    meta = est.join(counts, "tag").select(
        F.split("tag", "\\|")[0].alias("join_name"),
        F.split("tag", "\\|")[1].alias("side"),
        "n",
        "est",
    )
    l = meta.filter(F.col("side") == "l").select(
        "join_name",
        F.col("n").alias("n_left"),
        F.col("est").alias("ndv_left_est"),
    )
    r = meta.filter(F.col("side") == "r").select(
        "join_name",
        F.col("n").alias("n_right"),
        F.col("est").alias("ndv_right_est"),
    )
    actual = None
    for jn, (lt, lk), (rt, rk) in spec:
        a = load_table(spark, sf_dir, lt).select(F.col(lk).alias("k"))
        b = load_table(spark, sf_dir, rt).select(F.col(rk).alias("k"))
        row = a.join(b, "k").agg(
            F.count(F.lit(1)).alias("actual_rows")
        ).select(F.lit(jn).alias("join_name"), "actual_rows")
        actual = row if actual is None else actual.unionByName(row)
    return (
        l.join(r, "join_name")
        .join(actual, "join_name")
        .withColumn(
            "predicted_rows",
            F.expr(
                "cast(floor(cast(n_left as double) * cast(n_right as double)"
                " / greatest(ndv_left_est, ndv_right_est)) as bigint)"
            ),
        )
        .withColumn(
            "err_ppm",
            F.expr("(predicted_rows - actual_rows) * 1000000 div actual_rows"),
        )
    )


# --------------------------------------------------------------------------
# E479 — KMV / theta distinct sketch with set intersection
# --------------------------------------------------------------------------

KMV_K = 64
KMV_DOMAIN = 1 << 48  # 48-bit hash universe (12 md5 nibbles)


def _md5_hash48(col: Column) -> Column:
    """Uniform 48-bit integer from the first 12 hex nibbles of
    md5(col) — the same instr-per-nibble construction as
    :func:`_md5_slice_bucket`, widened to a full sortable value (no
    modulo) so order statistics over it are well-defined."""
    h = F.md5(col.cast("string"))
    v = F.lit(0).cast("long")
    for i in range(12):
        d = F.call_function("instr", F.lit(_HEX), F.substring(h, 1 + i, 1)) - 1
        v = v * F.lit(16) + d.cast("long")
    return v


def duck_md5_hash48(expr: str) -> str:
    """DuckDB twin of :func:`_md5_hash48` — keep in sync."""
    h = f"md5(CAST({expr} AS VARCHAR))"
    acc = "CAST(0 AS BIGINT)"
    for i in range(12):
        d = f"(instr('{_HEX}', substring({h}, {1 + i}, 1)) - 1)"
        acc = f"({acc} * 16 + {d})"
    return acc


def kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E479: KMV (k-minimum-values) / theta distinct sketch
    (Bar-Yossef et al. 2002; Dasu et al.; the DataSketches theta
    family) — the OTHER mergeable distinct sketch beside HLL (E88),
    and the one that supports set INTERSECTION natively, which HLL
    only reaches through inclusion–exclusion (E101) with error that
    explodes on small overlaps.

    Sketch = the k smallest 48-bit hash values of the key set. With
    n ≥ k the unbiased estimate is (k−1)/θ where θ = h₍ₖ₎/2⁴⁸ (the
    k-th minimum normalized); with n < k the sketch holds the whole
    hash set and is EXACT. Intersection (theta algebra): cut both
    k-sets at θ = min(θ_a, θ_b), count common hashes below the cut,
    estimate = c/θ. Everything is order statistics + integer floor
    division over md5-derived longs — deterministic in any engine, at
    any partitioning.

    Scale shape: one distinct-project per type (map-side combined),
    then a TWO-PHASE k-set — a local rank partitioned by
    (type, spark_partition_id) keeps each task's own k smallest
    (the k smallest of a union is contained in the union of local
    k-sets, so this prunes losslessly), and the global rank then
    orders only ≤ k·n_partitions survivors per type. No single task
    ever sorts a type's full ndv; the result is partitioning-
    invariant. The set algebra runs over 2×k = 128 rows.

    Gate: per-type rows (est vs exact ndv of user_id) + one
    ``view&click`` intersection row — abs error in ppm of truth.
    """
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select("event_type", "user_id").distinct()
    hashed = pairs.select(
        F.col("event_type").alias("scope"),
        _md5_hash48(F.col("user_id")).alias("h"),
    )
    from pyspark.sql import Window as W

    rn_local = F.row_number().over(
        W.partitionBy("scope", "pid").orderBy(F.asc("h"))
    )
    pruned = (
        hashed.withColumn("pid", F.spark_partition_id())
        .withColumn("rn_l", rn_local)
        .filter(F.col("rn_l") <= KMV_K)
        .select("scope", "h")
    )
    rn = F.row_number().over(W.partitionBy("scope").orderBy(F.asc("h")))
    kset = pruned.withColumn("rn", rn).filter(F.col("rn") <= KMV_K)
    stats = kset.groupBy("scope").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_hash"),
    )
    truth = pairs.groupBy(F.col("event_type").alias("scope")).agg(
        F.countDistinct("user_id").alias("true_distinct")
    )
    per_type = stats.join(truth, "scope").select(
        "scope",
        "n_kept",
        F.when(F.col("n_kept") < KMV_K, F.col("true_distinct"))
        .otherwise(
            F.expr(f"({KMV_K} - 1) * {KMV_DOMAIN}L div kth_hash")
        )
        .alias("est_distinct"),
        "true_distinct",
    )
    # theta intersection of the view/click k-sets
    theta = lambda scope: F.when(  # noqa: E731
        F.col(f"n_{scope}") < KMV_K, F.lit(KMV_DOMAIN).cast("long")
    ).otherwise(F.col(f"kth_{scope}"))
    v = kset.filter(F.col("scope") == "view").select("h")
    c = kset.filter(F.col("scope") == "click").select("h")
    vs = stats.filter(F.col("scope") == "view").select(
        F.col("n_kept").alias("n_view"), F.col("kth_hash").alias("kth_view")
    )
    cs = stats.filter(F.col("scope") == "click").select(
        F.col("n_kept").alias("n_click"), F.col("kth_hash").alias("kth_click")
    )
    cut = F.least(theta("view"), theta("click"))
    common = (
        v.join(c, "h")
        .join(F.broadcast(vs.join(cs)))
        .filter(F.col("h") < cut)
        .select(F.lit(1).alias("one"), cut.alias("cut"))
    )
    both_true = (
        pairs.filter(F.col("event_type") == "view")
        .select("user_id")
        .join(
            pairs.filter(F.col("event_type") == "click").select("user_id"),
            "user_id",
        )
        .agg(F.countDistinct("user_id").alias("true_distinct"))
    )
    inter = (
        common.groupBy("cut")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .join(both_true)
        .select(
            F.lit("view&click").alias("scope"),
            F.col("n_kept").cast("long").alias("n_kept"),
            F.when(
                F.col("cut") == KMV_DOMAIN, F.col("n_kept").cast("long")
            )
            .otherwise(F.expr(f"n_kept * {KMV_DOMAIN}L div cut"))
            .alias("est_distinct"),
            "true_distinct",
        )
    )
    out = per_type.select(
        "scope", F.col("n_kept").cast("long").alias("n_kept"),
        "est_distinct", "true_distinct",
    ).unionByName(inter)
    return out.select(
        "scope", "n_kept", "est_distinct", "true_distinct",
        F.expr(
            "abs(est_distinct - true_distinct) * 1000000 div true_distinct"
        ).alias("abs_err_ppm"),
    )


OPH_BINS = 32


def oph_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT E502: one-permutation hashing (Li, Owen & Zhang, NIPS 2012)
    — the O(tokens) MinHash: instead of k independent hash passes
    (E2's k=128 permutations), hash every token ONCE, partition the
    hash space into k bins, and keep the per-bin minimum. Same sketch
    size, k× less hashing — the variant you actually run over 100 TB.
    Estimator on matched non-empty bins: Ĵ = matches / both_nonempty
    (the paper's unbiased form; empty bins are skipped rather than
    densified — the densified rotation is E355's b-bit cousin's
    territory).

    Gate = a calibration table (the E355 discipline): deterministic
    doc pairs (id offsets 1 and 5), OPH estimate vs EXACT distinct-
    token Jaccard, banded; a broken sketch shifts whole bands. All
    order statistics on md5-derived longs — engine-exact.
    """
    from parquet_to_csv_spark.functions.textfn import tokens_col
    from parquet_to_csv_spark.sources.tables import load_table as _lt

    docs = _lt(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(tokens_col("text")).alias("toks")
    )
    tok = docs.select("doc_id", F.explode("toks").alias("t"))
    hashed = tok.select(
        "doc_id",
        _md5_hash48(F.col("t")).alias("h"),
    )
    sketch = hashed.groupBy(
        "doc_id", (F.col("h") % OPH_BINS).alias("bin")
    ).agg(F.min("h").alias("mh"))
    offsets = spark.range(1).select(F.lit(1).alias("off")).unionAll(
        spark.range(1).select(F.lit(5).alias("off"))
    )
    ids = docs.select("doc_id")
    pairs = (
        ids.join(F.broadcast(offsets))
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + F.col("off")).alias("doc_b"),
        )
        .join(ids.select(F.col("doc_id").alias("doc_b")), "doc_b")
    )
    sa = sketch.select(
        F.col("doc_id").alias("doc_a"), "bin", F.col("mh").alias("ma")
    )
    sb = sketch.select(
        F.col("doc_id").alias("doc_b"), "bin", F.col("mh").alias("mb")
    )
    matched = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "bin"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("both_bins"),
            F.sum((F.col("ma") == F.col("mb")).cast("long")).alias("match_bins"),
        )
    )
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    exact = matched.join(ta, "doc_a").join(tb, "doc_b").select(
        "doc_a",
        "both_bins",
        "match_bins",
        F.expr("match_bins * 1000 div both_bins").alias("oph_milli"),
        (
            inter.cast("long") * 1000
        ).alias("_in1000"),
        (F.size("toks_a") + F.size("toks_b") - inter).cast("long").alias("_u"),
    ).withColumn("exact_milli", F.expr("_in1000 div _u"))
    # integer mean (exact long sum, one correctly-rounded division) —
    # avg() over doubles would be summation-order-dependent
    return (
        exact.groupBy(F.expr("oph_milli div 100").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.floor(
                F.sum("exact_milli").cast("double") / F.count(F.lit(1))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("mean_exact_milli"),
        )
        .filter(F.col("band").isNotNull())
    )
