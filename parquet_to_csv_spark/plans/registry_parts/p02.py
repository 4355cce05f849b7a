"""Registry segment 2/13 — mechanically split from the
round-4 plans/registry.py (12k lines). QUERIES insertion order is
load-bearing (the driver's correctness window samples the first 50
entries), so each segment imports its predecessor: importing ANY
segment executes the full prefix in the original order.
"""
from __future__ import annotations

from parquet_to_csv_spark.plans.registry_core import (QUERIES, ORACLES, query)  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts import p01 as _prev_segment  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p01 import (  # noqa: F401
    DataFrame,
    SparkSession,
    _D_REV,
    _TOKS,
    _duck_cos,
    _stream,
    dedup,
    duck_sum_2dp,
    duck_units,
    multimodal,
    pandas_ops,
    rangejoin,
    relational,
    similarity,
    timeops,
)

ORACLES["user_value_slope"] = f"""
WITH u AS (
  SELECT user_id, epoch_us(ts) AS x, {duck_units("value", 2)} AS y FROM events
), a AS (
  SELECT user_id, count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy, sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM u GROUP BY 1
)
SELECT user_id, n AS n_events,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) * 3600000000.0, 6)
       END AS slope_cph
FROM a
"""

QUERIES["price_histogram"] = relational.price_histogram
ORACLES["price_histogram"] = """
SELECT floor(o_totalprice / 25000.0) AS bucket,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price,
       CAST(floor(o_totalprice / 25000.0) * 25000 AS BIGINT) AS bucket_lo
FROM orders
GROUP BY 1
"""

# Second moments over EXACT integer units (functions.stable): the five
# sums are order-independent; the closing double chain is identical in
# both engines. Builtin corr()/covar_pop() are order-dependent float
# folds — not reproducible across engines or partition counts.
QUERIES["stats_moments_lineitem"] = relational.stats_moments_lineitem
ORACLES["stats_moments_lineitem"] = f"""
WITH u AS (
  SELECT l_returnflag,
         {duck_units("l_quantity", 2)} AS qu,
         {duck_units("l_extendedprice", 2)} AS pu
  FROM lineitem
), a AS (
  SELECT l_returnflag, count(*) AS n,
         sum(qu) AS sx, sum(pu) AS sy,
         sum(qu * pu) AS sxy, sum(qu * qu) AS sxx, sum(pu * pu) AS syy
  FROM u GROUP BY 1
)
SELECT l_returnflag, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 10000.0, 4) AS covar_pop,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_qty_price,
       round(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) / 100.0, 6) AS stddev_qty
FROM a
"""

# Per-label centroid: decimal-exact float sums (order-independent),
# one double division at the end.
QUERIES["label_centroids"] = similarity.label_centroids
ORACLES["label_centroids"] = """
SELECT label, CAST(i - 1 AS INT) AS pos, count(*) AS n_vecs,
       round(CAST(sum(CAST(embedding[i] AS DECIMAL(27,10))) AS DOUBLE) / count(*), 6) AS centroid_val
FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
GROUP BY 1, 2
"""

QUERIES["grouping_sets_orders"] = relational.grouping_sets_orders
ORACLES["grouping_sets_orders"] = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


# ---------------------------------------------------------------------------
# TPC-H-shaped batch 2 (operators/tpch_ext.py). Money/ratio outputs use
# the integer-units discipline; the Q21/Q22 oracles deliberately keep
# the correlated EXISTS / scalar-subquery form so the parity check
# proves the Spark-side decorrelation.
from parquet_to_csv_spark.operators import tpch_ext  # noqa: E402

QUERIES["q6_forecast_revenue"] = tpch_ext.q6_forecast_revenue
ORACLES["q6_forecast_revenue"] = f"""
SELECT {duck_sum_2dp("l_extendedprice * l_discount", 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

QUERIES["q7_volume_shipping"] = tpch_ext.q7_volume_shipping
ORACLES["q7_volume_shipping"] = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       {_D_REV} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""

QUERIES["q8_market_share"] = tpch_ext.q8_market_share
ORACLES["q8_market_share"] = f"""
WITH vol AS (
  SELECT year(o_orderdate) AS o_year,
         {duck_units("l_extendedprice * (1 - l_discount)", 4)} AS u,
         CASE WHEN n1.n_name = 'NATION_3'
              THEN {duck_units("l_extendedprice * (1 - l_discount)", 4)}
              ELSE 0 END AS nu
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT o_year,
       (sum(nu) * 1000000 // sum(u)) / 1000000.0 AS mkt_share,
       sum(u) / 10000.0 AS total_revenue
FROM vol GROUP BY 1
"""

QUERIES["q13_customer_distribution"] = tpch_ext.q13_customer_distribution
ORACLES["q13_customer_distribution"] = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""

QUERIES["q14_promo_effect"] = tpch_ext.q14_promo_effect
ORACLES["q14_promo_effect"] = f"""
WITH j AS (
  SELECT {duck_units("l_extendedprice * (1 - l_discount)", 4)} AS u,
         CASE WHEN p_type = 'PROMO'
              THEN {duck_units("l_extendedprice * (1 - l_discount)", 4)}
              ELSE 0 END AS pu
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
)
SELECT (sum(pu) * 1000000 // sum(u)) / 10000.0 AS promo_revenue_pct FROM j
"""

QUERIES["q15_top_supplier"] = tpch_ext.q15_top_supplier
ORACLES["q15_top_supplier"] = f"""
WITH rev AS (
  SELECT l_suppkey,
         sum({duck_units("l_extendedprice * (1 - l_discount)", 4)}) AS rev_units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT l_suppkey AS suppkey, s_name, rev_units / 10000.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_units = (SELECT max(rev_units) FROM rev)
"""

QUERIES["q19_disjunctive_revenue"] = tpch_ext.q19_disjunctive_revenue
ORACLES["q19_disjunctive_revenue"] = f"""
SELECT {_D_REV} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)
"""

QUERIES["q21_waiting_supplier"] = tpch_ext.q21_waiting_supplier
ORACLES["q21_waiting_supplier"] = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
  AND l1.l_shipdate = (
        SELECT max(l4.l_shipdate) FROM lineitem l4
        WHERE l4.l_orderkey = l1.l_orderkey AND l4.l_suppkey = l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""

QUERIES["q22_global_sales_opportunity"] = tpch_ext.q22_global_sales_opportunity
ORACLES["q22_global_sales_opportunity"] = f"""
WITH cust AS (
  SELECT c_custkey,
         {duck_units("c_acctbal", 2)} AS bal_cents,
         c_custkey % 10 AS cntrycode
  FROM customer
  WHERE c_custkey % 10 IN (1, 3, 5, 7, 9)
), a AS (
  SELECT sum(bal_cents) AS sum_cents, count(*) AS n_pos
  FROM cust WHERE bal_cents > 0
)
SELECT cntrycode, count(*) AS numcust,
       sum(bal_cents) / 100.0 AS totacctbal
FROM cust, a
WHERE bal_cents * n_pos > sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cntrycode
"""


# ---------------------------------------------------------------------------
# Training-data pipeline batch 2 (operators/corpus.py): chunking,
# deterministic sampling, PII scan/redaction, unigram-LM scoring. The
# PII oracle plants the same doc_id-derived spans the Spark query does,
# and verifies redaction byte-exactly via md5 of the redacted text.
from parquet_to_csv_spark.operators import corpus  # noqa: E402

QUERIES["doc_chunks"] = corpus.doc_chunks
ORACLES["doc_chunks"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), s AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, greatest(len(toks), 1), 48)) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) / 48 AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(toks, start, start + 63), ' ') AS chunk_text,
       CAST(len(list_slice(toks, start, start + 63)) AS BIGINT) AS n_tokens
FROM s
WHERE len(list_slice(toks, start, start + 63)) > 0
"""

QUERIES["deterministic_sample"] = corpus.deterministic_sample
ORACLES["deterministic_sample"] = f"""
SELECT doc_id, lang,
       CAST({corpus.duck_md5_bucket("doc_id", 100)} AS BIGINT) AS sample_bucket
FROM documents
WHERE {corpus.duck_md5_bucket("doc_id", 100)} < 10
"""

_D_PII_AUG = r"""
concat(text,
  CASE WHEN doc_id % 7 = 0
       THEN concat(' contact user', CAST(doc_id AS VARCHAR), '@example.com')
       ELSE '' END,
  CASE WHEN doc_id % 11 = 0
       THEN concat(' call 555-', lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'), '-0199')
       ELSE '' END,
  CASE WHEN doc_id % 13 = 0 THEN ' id 987-65-4320' ELSE '' END,
  CASE WHEN doc_id % 17 = 0
       THEN concat(' host 10.0.', CAST(doc_id % 256 AS VARCHAR), '.42')
       ELSE '' END)
""".strip()

QUERIES["pii_scan"] = corpus.pii_scan
ORACLES["pii_scan"] = f"""
WITH a AS (SELECT doc_id, {_D_PII_AUG} AS aug FROM documents),
c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
         CAST(len(regexp_extract_all(aug, '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b')) AS BIGINT) AS n_ssn,
         CAST(len(regexp_extract_all(aug, '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b')) AS BIGINT) AS n_phone,
         CAST(len(regexp_extract_all(aug, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ip,
         md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(aug,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
             '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '[SSN]', 'g'),
             '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b', '[PHONE]', 'g'),
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '[IP]', 'g')) AS redacted_fp
  FROM a
)
SELECT doc_id, n_email, n_ssn, n_phone, n_ip,
       n_email + n_ssn + n_phone + n_ip AS n_pii, redacted_fp
FROM c
WHERE n_email + n_ssn + n_phone + n_ip > 0
"""

QUERIES["unigram_lm_score"] = corpus.unigram_lm_score
ORACLES["unigram_lm_score"] = f"""
WITH pairs AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM pairs GROUP BY doc_id, term
), lm AS (
  SELECT term, sum(tf) AS cnt FROM tf GROUP BY term
), tot AS (
  SELECT sum(cnt) AS t_total FROM lm
)
SELECT doc_id, sum(tf) AS n_tokens,
       floor(sum(tf * CAST(round(ln(cnt / t_total) * 1000000) AS BIGINT))
             / sum(tf)) / 1000000.0 AS avg_logprob
FROM tf JOIN lm USING (term), tot
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Streaming batch 2 + embedding quantization.
from parquet_to_csv_spark.operators import similarity as _sim  # noqa: E402
from parquet_to_csv_spark.streaming import stream as _stream  # noqa: E402

QUERIES["streaming_join_drain"] = _stream.join_drain_query
ORACLES["streaming_join_drain"] = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       p.user_id AS user_id,
       epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
 AND epoch_us(c.ts) <= epoch_us(p.ts)
"""

QUERIES["streaming_dedup_drain"] = _stream.dedup_drain_query
ORACLES["streaming_dedup_drain"] = """
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
FROM events
"""

QUERIES["embedding_quantize"] = _sim.embedding_quantize_gate
ORACLES["embedding_quantize"] = """
WITH xd AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), s AS (
  SELECT vec_id, label, v,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
              THEN 127.0 / list_max(list_transform(v, x -> abs(x)))
              ELSE 0.0 END AS scale
  FROM xd
)
SELECT vec_id, label, scale,
       array_to_string(list_transform(v, x -> CAST(CAST(floor(x * scale + 0.5) AS INTEGER) AS VARCHAR)), ',') AS q_csv
FROM s
"""

# ---------------------------------------------------------------------------
# Round-2 batch: interval overlap join, CDC MERGE round-trip, stratified
# sampling. All-integer outputs (overlap/merge) or hash-bucket filters
# (sample) — engine-exact, no rounding conventions needed.
from parquet_to_csv_spark.operators import intervals as _intervals  # noqa: E402

QUERIES["interval_overlap_join"] = _intervals.interval_overlap_join
ORACLES["interval_overlap_join"] = """
WITH v AS (
  SELECT event_id AS view_id, user_id,
         epoch_us(ts) AS v_s, epoch_us(ts) + 14400000000 AS v_e
  FROM events WHERE event_type = 'view'
), c AS (
  SELECT event_id AS click_id, user_id,
         epoch_us(ts) AS c_s, epoch_us(ts) + 7200000000 AS c_e
  FROM events WHERE event_type = 'click'
)
SELECT view_id, click_id, v.user_id AS user_id,
       least(v_e, c_e) - greatest(v_s, c_s) AS overlap_us
FROM v JOIN c ON v.user_id = c.user_id
WHERE v_s <= c_e AND c_s <= v_e
"""

# MERGE round-trip: applying the diff onto v1 must reconstruct v2 — the
# oracle *is* v2's definition, so the gate catches any drop/dup in
# either the diff or the merge.
QUERIES["cdc_merge_events"] = relational.cdc_merge_events
ORACLES["cdc_merge_events"] = """
SELECT event_id,
       CASE WHEN event_id % 5 = 0 THEN round(round(value, 2) + 1.0, 2)
            ELSE round(value, 2) END AS value
FROM events WHERE event_id % 7 <> 0
UNION ALL
SELECT event_id + 10000000 AS event_id, round(value, 2) AS value
FROM events WHERE event_id % 11 = 0
"""

_STRAT_CUT = """CASE WHEN lang = 'de' THEN 50 WHEN lang = 'en' THEN 30
                     WHEN lang = 'zh' THEN 100 ELSE 10 END"""
QUERIES["stratified_sample"] = corpus.stratified_sample
ORACLES["stratified_sample"] = f"""
SELECT doc_id, lang,
       CAST({corpus.duck_md5_bucket("doc_id", 100)} AS BIGINT) AS sample_bucket
FROM documents
WHERE {corpus.duck_md5_bucket("doc_id", 100)} < {_STRAT_CUT}
"""

# SRP-LSH ANN: the plane literals, sign folds and cosine are all
# bit-deterministic IEEE ops evaluated in the same order in both
# engines, so the oracle replays the index + multiprobe + scoring at
# full hash strength (same contract as ivf_topk).
def _duck_dot_lit(vec: str, plane: list[float]) -> str:
    lits = ", ".join(repr(v) for v in plane)
    return (
        f"list_sum(list_transform(list_zip({vec}, [{lits}]), "
        f"p -> CAST(p[1] AS DOUBLE) * p[2]))"
    )


def _duck_srp_bucket(vec: str, planes: list[list[float]]) -> str:
    terms = [
        f"(CASE WHEN {_duck_dot_lit(vec, h)} > 0 THEN {1 << j} ELSE 0 END)"
        for j, h in enumerate(planes)
    ]
    return " + ".join(terms)


_SRP_TABS = _sim.srp_planes()
_SRP_NB = 6
_SRP_FLIPS = ", ".join(str(f) for f in [0] + [1 << j for j in range(_SRP_NB)])
_SRP_BUCKET_COLS = ",\n         ".join(
    f"{_duck_srp_bucket('embedding', t)} AS b{i}" for i, t in enumerate(_SRP_TABS)
)
_SRP_UNION = "\n  UNION ALL\n".join(
    f"  SELECT vec_id, embedding, {i} AS t, b{i} AS bkt FROM b"
    for i in range(len(_SRP_TABS))
)

QUERIES["srp_lsh_topk"] = _sim.srp_lsh_topk
ORACLES["srp_lsh_topk"] = f"""
WITH b AS (
  SELECT vec_id, embedding,
         {_SRP_BUCKET_COLS}
  FROM embeddings
), cand AS (
{_SRP_UNION}
), probes AS (
  SELECT c.vec_id AS query_id, c.embedding AS q_emb, c.t,
         xor(c.bkt, f.f) AS bkt
  FROM cand c CROSS JOIN (SELECT unnest([{_SRP_FLIPS}]) AS f) f
  WHERE c.vec_id < 5
), scored AS (
  SELECT p.query_id, c.vec_id AS cand_id,
         max({_duck_cos('p.q_emb', 'c.embedding')}) AS sim
  FROM probes p JOIN cand c ON p.t = c.t AND p.bkt = c.bkt
  WHERE p.query_id <> c.vec_id
  GROUP BY p.query_id, c.vec_id
), ranked AS (
  SELECT query_id, cand_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT query_id, cand_id, round(sim, 6) AS cosine, rnk
FROM ranked WHERE rnk <= 5
"""

# Robust outliers: median/MAD are quantile_cont ↔ percentile (the
# price_quantiles parity convention); everything downstream is the same
# doubles in both engines, so comparisons and 4dp rounding agree.
QUERIES["robust_outliers"] = relational.robust_outliers
ORACLES["robust_outliers"] = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, e.value,
       round(m.med, 4) AS med, round(d.mad, 4) AS mad,
       CASE WHEN d.mad > 0
            THEN round((e.value - m.med) / (1.4826 * d.mad), 4) END AS robust_z
FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
WHERE abs(e.value - m.med) > 3 * 1.4826 * d.mad
"""

# EWMA: the recurrence runs the same float64 op sequence over the same
# (ts, event_id)-ordered rows in both engines (grouped-pandas fold vs
# recursive CTE), so raw state is bit-identical; 6dp rounding is
# engine-side on both.
QUERIES["user_value_ewma"] = pandas_ops.user_value_ewma
ORACLES["user_value_ewma"] = """
WITH RECURSIVE seq AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS rn
  FROM events
), r AS (
  SELECT event_id, user_id, ts_us, rn, value AS ewma
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.event_id, s.user_id, s.ts_us, s.rn,
         0.1 * s.value + 0.9 * r.ewma AS ewma
  FROM seq s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT event_id, user_id, ts_us, round(ewma, 6) AS ewma FROM r
"""

# Frame-sampling plumbing: geometry-only gate (offsets/lengths from
# octet_length arithmetic); per-frame digests are pytest-pinned since
# DuckDB cannot slice BLOBs.
QUERIES["multimodal_frames"] = multimodal.multimodal_frames
ORACLES["multimodal_frames"] = """
SELECT d.doc_id,
       f.i AS frame_idx,
       f.i * 256 AS frame_off,
       least(256, octet_length(encode(d.text)) - f.i * 256) AS frame_len
FROM documents d,
     unnest(range(0, CAST(ceil(octet_length(encode(d.text)) / 256.0) AS BIGINT), 2)) AS f(i)
"""

# Funnel: the stacked running-min window formulation is replayed
# verbatim; all values are integer µs, no float surface at all.
QUERIES["funnel_stages"] = timeops.funnel_stages
ORACLES["funnel_stages"] = """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
), staged AS (
  SELECT user_id,
         CASE WHEN event_type = 'view' THEN ts_us END AS v_ts,
         CASE WHEN event_type = 'click' AND ts_us >= min(CASE WHEN event_type = 'view' THEN ts_us END)
              OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
              THEN ts_us END AS c_ts,
         ts_us, event_type, event_id, user_id AS u
  FROM ev
), staged2 AS (
  SELECT user_id, v_ts, c_ts,
         CASE WHEN event_type = 'purchase' AND ts_us >= min(c_ts)
              OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
              THEN ts_us END AS p_ts
  FROM staged
), agg AS (
  SELECT user_id, min(v_ts) AS t_view_us, min(c_ts) AS t_click_us,
         min(p_ts) AS t_purchase_us
  FROM staged2 GROUP BY user_id
)
SELECT user_id, t_view_us, t_click_us, t_purchase_us,
       CASE WHEN t_purchase_us IS NOT NULL THEN 3
            WHEN t_click_us IS NOT NULL THEN 2
            WHEN t_view_us IS NOT NULL THEN 1
            ELSE 0 END AS stage
FROM agg
"""

# Directed containment: oracle recomputes C(A,B)=|A∩B|/|A| exhaustively
# within blocks — the prefix-filtered join must find exactly that set.
QUERIES["containment_quotes"] = dedup.containment_pairs_quotes
ORACLES["containment_quotes"] = f"""
WITH tt AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.toks, b.toks))
             / CAST(len(a.toks) AS DOUBLE), 4) AS containment
FROM tt a JOIN tt b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
WHERE round(len(list_intersect(a.toks, b.toks))
             / CAST(len(a.toks) AS DOUBLE), 4) >= 0.7
"""

# Incremental agg: the oracle aggregates the raw table directly — the
# history+delta partial merge must be lossless (exact integer cents
# make merge order irrelevant).
QUERIES["incremental_user_totals"] = timeops.incremental_user_totals
ORACLES["incremental_user_totals"] = f"""
SELECT user_id, count(*) AS n_events,
       sum({duck_units("value", 2)}) / 100.0 AS sum_value
FROM events GROUP BY user_id
"""

# SCD-2 point-in-time join: deterministic synthesized versions; the
# oracle picks the latest valid version per order with row_number.
QUERIES["scd2_point_in_time"] = rangejoin.scd2_point_in_time_join
ORACLES["scd2_point_in_time"] = """
WITH ver AS (
  SELECT c_custkey, v,
         CASE v
           WHEN 0 THEN DATE '1990-01-01'
           WHEN 1 THEN DATE '1996-01-01' + (c_custkey % 365) * INTERVAL 1 DAY
           ELSE DATE '1998-07-01' + (c_custkey % 365) * INTERVAL 1 DAY
         END AS valid_from,
         concat(c_mktsegment, '#', CAST(v AS VARCHAR)) AS attr
  FROM customer, unnest([0, 1, 2]) AS t(v)
), ranked AS (
  SELECT o.o_orderkey, o.o_custkey, ver.attr, ver.valid_from,
         row_number() OVER (
           PARTITION BY o.o_orderkey ORDER BY ver.valid_from DESC
         ) AS rn
  FROM orders o JOIN ver ON o.o_custkey = ver.c_custkey
  WHERE ver.valid_from <= CAST(o.o_orderdate AS DATE)
)
SELECT o_orderkey, o_custkey, attr AS attr_at_order,
       epoch_ms(CAST(valid_from AS TIMESTAMP)) AS version_from_ms
FROM ranked WHERE rn = 1
"""

# k-means (2 Lloyd iterations): every step — init, argmin assignment,
# DECIMAL-exact centroid means, second assignment — is an identical-
# order fold in both engines; the oracle replays the loop in SQL.
_KM_SQD = (
    "list_sum(list_transform(list_zip({v}, {c}), "
    "p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])))"
)

QUERIES["kmeans_assign"] = _sim.kmeans_iterations
ORACLES["kmeans_assign"] = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), c0 AS (
  SELECT vec_id AS cell, v AS c FROM emb WHERE vec_id < 8
), d1 AS (
  SELECT e.vec_id, e.v, c0.cell, {_KM_SQD.format(v='e.v', c='c0.c')} AS d
  FROM emb e CROSS JOIN c0
), a1 AS (
  SELECT vec_id, v, cell FROM (
    SELECT vec_id, v, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM d1
  ) WHERE rn = 1
), upd AS (
  SELECT cell, t.pos,
         CAST(sum(CAST(v[t.pos + 1] AS DECIMAL(27,10))) AS DOUBLE) / count(*) AS cval
  FROM a1, unnest(range(0, len(v))) AS t(pos)
  GROUP BY cell, t.pos
), c1 AS (
  SELECT cell, list(cval ORDER BY pos) AS c FROM upd GROUP BY cell
), d2 AS (
  SELECT e.vec_id, c1.cell, {_KM_SQD.format(v='e.v', c='c1.c')} AS d
  FROM emb e CROSS JOIN c1
)
SELECT vec_id, cell, round(d, 6) AS sq_dist FROM (
  SELECT vec_id, cell, d,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
  FROM d2
) WHERE rn = 1
"""

# Welch A/B: arms from the md5-bucket split; Σcents/Σcents² exact, all
# downstream statistics one fixed double expression order (x*x squares,
# never pow(x,2) — libm pow is not guaranteed to equal the multiply).
QUERIES["ab_test_welch"] = relational.ab_test_welch
ORACLES["ab_test_welch"] = f"""
WITH ev AS (
  SELECT event_type,
         {corpus.duck_md5_bucket("user_id", 2)} AS arm,
         {duck_units("value", 2)} AS cents
  FROM events
), g AS (
  SELECT event_type, arm, count(*) AS n,
         sum(cents) AS sc, sum(cents * cents) AS sc2
  FROM ev GROUP BY event_type, arm
), a AS (SELECT event_type, n AS n_a, sc AS sc_a, sc2 AS sc2_a FROM g WHERE arm = 0),
   b AS (SELECT event_type, n AS n_b, sc AS sc_b, sc2 AS sc2_b FROM g WHERE arm = 1),
   s AS (
  SELECT a.event_type, n_a, n_b,
         CAST(sc_a AS DOUBLE) / 100.0 / n_a AS mean_a,
         CAST(sc_b AS DOUBLE) / 100.0 / n_b AS mean_b,
         (CAST(n_a AS DOUBLE) * CAST(sc2_a AS DOUBLE)
            - CAST(sc_a AS DOUBLE) * CAST(sc_a AS DOUBLE))
           / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)) / 10000.0 / n_a AS va_n,
         (CAST(n_b AS DOUBLE) * CAST(sc2_b AS DOUBLE)
            - CAST(sc_b AS DOUBLE) * CAST(sc_b AS DOUBLE))
           / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)) / 10000.0 / n_b AS vb_n
  FROM a JOIN b USING (event_type)
)
SELECT event_type, n_a, n_b,
       round(mean_a, 4) AS mean_a,
       round(mean_b, 4) AS mean_b,
       CASE WHEN n_a > 1 AND n_b > 1 AND sqrt(va_n + vb_n) > 0
            THEN round((mean_a - mean_b) / sqrt(va_n + vb_n), 4) END AS t_stat,
       CASE WHEN n_a > 1 AND n_b > 1 AND sqrt(va_n + vb_n) > 0
            THEN round((va_n + vb_n) * (va_n + vb_n)
                 / (va_n * va_n / (n_a - 1) + vb_n * vb_n / (n_b - 1)), 2) END AS welch_df
FROM s
"""

# JSONL round-trip: the oracle reads the ORIGINAL parquet — any row
# loss / unicode mangling / type drift in the JSONL write+read breaks
# the (lang, source) content digests.
QUERIES["jsonl_roundtrip"] = corpus.jsonl_roundtrip
ORACLES["jsonl_roundtrip"] = """
SELECT lang, source, count(*) AS n_docs, sum(doc_id) AS sum_doc_id,
       count(DISTINCT md5(text)) AS n_distinct_md5
FROM documents GROUP BY lang, source
"""

# KL drift: per-bucket scalars in fixed order, integer micro-nat
# contributions, exact long sums — the unigram-LM determinism recipe.
QUERIES["distribution_drift"] = timeops.distribution_drift
ORACLES["distribution_drift"] = """
WITH ev AS (
  SELECT event_type,
         least(CAST(floor(value / 50) AS BIGINT), 10) AS bucket,
         (epoch_ms(ts) < 1705276800000) AS is_before
  FROM events
), g AS (
  SELECT event_type, bucket,
         count(*) FILTER (is_before) AS cb,
         count(*) FILTER (NOT is_before) AS ca
  FROM ev GROUP BY event_type, bucket
), domain AS (
  SELECT DISTINCT event_type, t.bucket
  FROM ev, unnest(range(0, 11)) AS t(bucket)
), full_g AS (
  SELECT d.event_type, d.bucket,
         coalesce(g.cb, 0) + 1 AS cb1, coalesce(g.ca, 0) + 1 AS ca1
  FROM domain d LEFT JOIN g ON d.event_type = g.event_type AND d.bucket = g.bucket
), tot AS (
  SELECT event_type, sum(cb1) AS nb, sum(ca1) AS na FROM full_g GROUP BY event_type
), terms AS (
  SELECT f.event_type, f.cb1, tot.nb, tot.na,
         CAST(round(ln(CAST(f.cb1 AS DOUBLE) * CAST(tot.na AS DOUBLE)
                       / (CAST(f.ca1 AS DOUBLE) * CAST(tot.nb AS DOUBLE))) * 1e6, 0) AS BIGINT) AS tu
  FROM full_g f JOIN tot USING (event_type)
)
SELECT event_type,
       max(nb) - 11 AS n_before,
       max(na) - 11 AS n_after,
       round(CAST(sum(cb1 * tu) AS DOUBLE) / CAST(max(nb) AS DOUBLE) / 1e6, 6) AS kl_nats
FROM terms GROUP BY event_type
"""

QUERIES["orc_roundtrip"] = corpus.orc_roundtrip
ORACLES["orc_roundtrip"] = ORACLES["jsonl_roundtrip"]

# ---------------------------------------------------------------------------
# TPC-H batch 3 over the synthesized partsupp (operators/tpch_ext.py
# synth_partsupp — both engines derive the identical relation from
# part, so Q2/Q9/Q11/Q20 run at full oracle strength). The oracles
# keep the literal correlated-subquery forms; the Spark plans are the
# decorrelated rewrites — parity proves the rewrite.
_PS_CTE = """
WITH partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + t.i * 25) % 100 AS ps_suppkey,
         (90000 + (p_partkey % 100) * 10 + t.i * 25) / 100.0 AS ps_supplycost,
         1 + (p_partkey * 4 + t.i) % 9999 AS ps_availqty
  FROM part, unnest([0, 1, 2, 3]) AS t(i)
)
"""

QUERIES["q2_min_cost_supplier"] = tpch_ext.q2_min_cost_supplier
ORACLES["q2_min_cost_supplier"] = _PS_CTE + """
, eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
), eps AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, eu.s_suppkey, eu.s_name,
         eu.s_acctbal, eu.n_name
  FROM partsupp ps JOIN eu ON ps.ps_suppkey = eu.s_suppkey
)
SELECT round(e.s_acctbal, 2) AS s_acctbal, e.s_name, e.n_name, p.p_partkey,
       round(e.ps_supplycost, 2) AS ps_supplycost
FROM eps e JOIN part p ON e.ps_partkey = p.p_partkey AND p.p_type = 'SMALL'
WHERE e.ps_supplycost = (
  SELECT min(e2.ps_supplycost) FROM eps e2 WHERE e2.ps_partkey = e.ps_partkey
)
ORDER BY s_acctbal DESC, e.s_name ASC, p.p_partkey ASC
LIMIT 10
"""

QUERIES["q9_product_profit"] = tpch_ext.q9_product_profit
ORACLES["q9_product_profit"] = _PS_CTE + f"""
SELECT n.n_name, year(o.o_orderdate) AS o_year,
       {duck_sum_2dp("l.l_extendedprice * (1 - l.l_discount) - ps.ps_supplycost * l.l_quantity", 4)} AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY n.n_name, year(o.o_orderdate)
"""

QUERIES["q11_important_stock"] = tpch_ext.q11_important_stock
ORACLES["q11_important_stock"] = _PS_CTE + f"""
, nps AS (
  SELECT ps_partkey, {duck_units("ps_supplycost * ps_availqty", 2)} AS v_cents
  FROM partsupp JOIN supplier s ON ps_suppkey = s.s_suppkey AND s.s_nationkey = 3
)
SELECT ps_partkey, sum(v_cents) / 100.0 AS stock_value
FROM nps GROUP BY ps_partkey
HAVING sum(v_cents) * 10000 > (SELECT sum(v_cents) FROM nps)
"""

QUERIES["q20_excess_stock_suppliers"] = tpch_ext.q20_excess_stock_suppliers
ORACLES["q20_excess_stock_suppliers"] = _PS_CTE + """
, shipped AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
)
SELECT s.s_suppkey, s.s_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_regionkey = 2
WHERE s.s_suppkey IN (
  SELECT ps.ps_suppkey
  FROM partsupp ps JOIN shipped sh
    ON ps.ps_partkey = sh.l_partkey AND ps.ps_suppkey = sh.l_suppkey
  WHERE 2 * ps.ps_availqty > sh.qty
)
"""

QUERIES["q12_shipping_priority_dist"] = tpch_ext.q12_shipping_priority_dist
ORACLES["q12_shipping_priority_dist"] = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag IN ('R', 'A')
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""

QUERIES["q16_supplier_part_count"] = tpch_ext.q16_supplier_part_count
ORACLES["q16_supplier_part_count"] = _PS_CTE + """
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 24, 34, 44)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
"""

# Cogrouped pandas: oracle = as-of join (max prior click per purchase)
# + quantile_cont median over integer-µs lags.
QUERIES["cogroup_click_purchase_lag"] = pandas_ops.cogroup_click_purchase_lag
ORACLES["cogroup_click_purchase_lag"] = """
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase'
), lagged AS (
  SELECT p.user_id, p.ts_us,
         p.ts_us - (
           SELECT max(c.ts_us) FROM c
           WHERE c.user_id = p.user_id AND c.ts_us <= p.ts_us
         ) AS lag_us
  FROM p
)
SELECT user_id,
       count(*) AS n_purchases,
       count(lag_us) AS n_matched,
       quantile_cont(lag_us, 0.5) AS med_lag_us
FROM lagged GROUP BY user_id
"""

QUERIES["rolling_distinct_users"] = timeops.rolling_distinct_users
ORACLES["rolling_distinct_users"] = """
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events
), days AS (
  SELECT DISTINCT day AS win_day FROM du
)
SELECT d.win_day, count(DISTINCT du.user_id) AS wau
FROM days d JOIN du ON du.day BETWEEN d.win_day - 6 AND d.win_day
GROUP BY d.win_day
"""

QUERIES["event_transition_matrix"] = timeops.event_transition_matrix
ORACLES["event_transition_matrix"] = """
WITH t AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS to_type
  FROM events
)
SELECT from_type, to_type, count(*) AS n_transitions
FROM t WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""

# Triangles over the exact near-dup graph (edge relation = the
# ngram_jaccard oracle at t=0.8, oriented a<b).
QUERIES["neardup_triangles"] = dedup.neardup_triangles
ORACLES["neardup_triangles"] = f"""
WITH tt AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), e AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM tt a JOIN tt b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
               / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.8
), tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT doc_id, count(*) AS n_triangles FROM (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b AS doc_id FROM tri
  UNION ALL SELECT c AS doc_id FROM tri
) GROUP BY doc_id
"""

# Edit-distance near-dup: oracle is the exhaustive Levenshtein pair
# relation — the deletion-signature join must find exactly that set.
QUERIES["editdist_neardup_pairs"] = dedup.editdist_neardup_pairs
ORACLES["editdist_neardup_pairs"] = """
WITH p AS (
  SELECT doc_id, left(text, 24) AS pfx FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.pfx, b.pfx) AS dist
FROM p a JOIN p b ON a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= 1
"""

# Z-order key: pure integer shifts/masks, replayed verbatim.
from parquet_to_csv_spark.sources import layout as _layout  # noqa: E402


def _zorder_key_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from parquet_to_csv_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 4096).cast("int").alias("x"),
        F.expr("ts div 86400000000000 - 19723").cast("int").alias("y"),
    )
    return ev.select(
        "event_id", "x", "y", _layout.morton_key(F.col("x"), F.col("y")).alias("zkey")
    )


QUERIES["zorder_key"] = _zorder_key_query
_Z_TERMS = " + ".join(
    f"((x & {1 << i}) * {1 << i}) + ((y & {1 << i}) * {1 << (i + 1)})"
    for i in range(12)
)
ORACLES["zorder_key"] = f"""
WITH ev AS (
  SELECT event_id,
         CAST(user_id % 4096 AS INTEGER) AS x,
         CAST(epoch_us(ts) // 86400000000 - 19723 AS INTEGER) AS y
  FROM events
)
SELECT event_id, x, y, CAST({_Z_TERMS} AS BIGINT) AS zkey FROM ev
"""

# Nearest-centroid eval: centroids, argmin and the confusion counts
# replayed step for step (same determinism basis as kmeans_assign).
QUERIES["nearest_centroid_confusion"] = _sim.nearest_centroid_confusion
