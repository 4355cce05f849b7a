"""Registry segment 1/13 — mechanically split from the
round-4 plans/registry.py (12k lines). QUERIES insertion order is
load-bearing (the driver's correctness window samples the first 50
entries), so each segment imports its predecessor: importing ANY
segment executes the full prefix in the original order.
"""
from __future__ import annotations

from parquet_to_csv_spark.plans.registry_core import (QUERIES, ORACLES, query)  # noqa: F401


from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_to_csv_spark.functions.stable import duck_sum_2dp, duck_units
from parquet_to_csv_spark.operators import dedup, refpipe, relational, text

# Engine-stable 2dp revenue sum (see functions.stable.stable_sum_2dp):
# sums of true-4dp/6dp money expressions land exactly on .xx5 rounding
# boundaries often enough that round(sum(·),2) flips with summation
# order — both sides sum exact integer units instead.
_D_REV = duck_sum_2dp("l_extendedprice * (1 - l_discount)", 4)


# --------------------------------------------------------------------------
# REF surface (SURVEY.md §2.1-2.3) — the reference's own dataflow
# --------------------------------------------------------------------------

# Shared oracle CTE: the trace-span derivation (FIXTURES.md):
# start_time = µs-aligned ns epoch of events.ts, end_time = start +
# floor(value ms * 1e6) ns.  duration_ms = floor-each-then-subtract
# (/root/reference/main.js:158-162) via exact integer division.
_TRACE_CTE = """
WITH trace AS (
  SELECT
    epoch_us(ts) * 1000 AS start_time,
    epoch_us(ts) * 1000 + CAST(floor(value * 10000000) AS BIGINT) AS end_time,
    event_id, user_id, event_type, value
  FROM events
), spans AS (
  SELECT
    (end_time // 1000000) - (start_time // 1000000) AS duration_ms,
    event_id, user_id, event_type, value, start_time, end_time
  FROM trace
)
"""

QUERIES["ref_duration_pipeline"] = refpipe.duration_pipeline
ORACLES["ref_duration_pipeline"] = _TRACE_CTE + """
SELECT DISTINCT duration_ms, event_id, user_id, event_type, value, start_time, end_time
FROM spans
WHERE duration_ms >= 2000
"""

QUERIES["ref_long_split"] = refpipe.long_split
ORACLES["ref_long_split"] = _TRACE_CTE + """
SELECT DISTINCT duration_ms, event_id, user_id, event_type, value, start_time, end_time
FROM spans
WHERE duration_ms >= 2000 AND duration_ms >= 2650
"""

QUERIES["ref_schema_union"] = refpipe.schema_union
ORACLES["ref_schema_union"] = """
SELECT event_id, user_id, event_type, CAST(NULL AS DOUBLE) AS value FROM events
UNION ALL
SELECT event_id, CAST(NULL AS BIGINT) AS user_id, event_type, value FROM events
"""

QUERIES["ref_distinct"] = refpipe.distinct_events
ORACLES["ref_distinct"] = """
SELECT DISTINCT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
FROM events
"""

QUERIES["ref_cast_projection"] = refpipe.cast_projection
ORACLES["ref_cast_projection"] = _TRACE_CTE + """
SELECT DISTINCT duration_ms,
       CAST(event_id AS VARCHAR) AS event_id,
       CAST(user_id AS VARCHAR) AS user_id,
       event_type, value, start_time, end_time
FROM spans
WHERE duration_ms >= 2000
"""


# --------------------------------------------------------------------------
# EXT tier 1 — relational breadth (SURVEY.md §2.5 E6/E7/E8/E11)
# --------------------------------------------------------------------------

QUERIES["q1_pricing_summary"] = relational.q1_pricing_summary
ORACLES["q1_pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       {_D_REV} AS sum_disc_price,
       {duck_sum_2dp("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
       floor(round(sum(l_quantity) * 100) * 100 / count(*)) / 10000.0 AS avg_qty,
       floor(round(sum(l_extendedprice) * 100) * 100 / count(*)) / 10000.0 AS avg_price,
       floor(round(sum(l_discount) * 100) * 100 / count(*)) / 10000.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

QUERIES["q3_shipping_priority"] = relational.q3_shipping_priority
ORACLES["q3_shipping_priority"] = f"""
SELECT o_orderkey,
       epoch_ms(o_orderdate) AS o_date_ms,
       o_orderpriority,
       {_D_REV} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '2000-03-15'
  AND l_shipdate > TIMESTAMP '1997-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

QUERIES["q5_region_revenue"] = relational.q5_region_revenue
ORACLES["q5_region_revenue"] = f"""
SELECT n_name,
       {_D_REV} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""

QUERIES["broadcast_dim_enrich"] = relational.broadcast_dim_enrich
ORACLES["broadcast_dim_enrich"] = """
SELECT r_name, n_name,
       count(*) AS n_customers,
       floor(round(sum(c_acctbal) * 100) * 100 / count(*)) / 10000.0 AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

QUERIES["semi_join_customers"] = relational.semi_join_customers
ORACLES["semi_join_customers"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""

QUERIES["anti_join_customers"] = relational.anti_join_customers
ORACLES["anti_join_customers"] = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
)
"""

QUERIES["window_order_rank"] = relational.window_order_rank
ORACLES["window_order_rank"] = """
SELECT o_orderkey, o_custkey,
       round(o_totalprice, 2) AS price,
       row_number() OVER w AS rn,
       rank() OVER w AS rnk,
       round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
"""

QUERIES["topk_orders_per_customer"] = relational.topk_orders_per_customer
ORACLES["topk_orders_per_customer"] = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
"""

QUERIES["moving_avg_orders"] = relational.moving_avg_orders
ORACLES["moving_avg_orders"] = """
SELECT o_custkey, o_orderkey,
       floor(round(sum(o_totalprice) OVER w * 100) * 100 / count(*) OVER w) / 10000.0 AS trailing_avg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""

QUERIES["agg_suite_orders"] = relational.agg_suite_orders
ORACLES["agg_suite_orders"] = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       round(sum(o_totalprice), 2) AS sum_price,
       floor(round(sum(o_totalprice) * 100) * 100 / count(*)) / 10000.0 AS avg_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderpriority, o_orderstatus
"""

QUERIES["rollup_lineitem"] = relational.rollup_lineitem
ORACLES["rollup_lineitem"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

QUERIES["pivot_linestatus"] = relational.pivot_linestatus
ORACLES["pivot_linestatus"] = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_finished
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# EXT tier 2 — text analysis + deduplication (SURVEY.md §2.5 E1/E4/E5)
# --------------------------------------------------------------------------

# Shared oracle fragment: whitespace tokens of lowercased text, empties
# removed — the DuckDB twin of functions.textfn.tokens_col.
_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"

QUERIES["text_stats"] = text.text_stats
ORACLES["text_stats"] = f"""
SELECT lang, count(*) AS n_docs,
       floor(sum(n_chars) * 10000 / count(*)) / 10000.0 AS avg_chars,
       floor(sum(n_tokens) * 10000 / count(*)) / 10000.0 AS avg_tokens,
       max(n_tokens) AS max_tokens
FROM (
  SELECT lang, length(text) AS n_chars, len({_TOKS}) AS n_tokens
  FROM documents
)
GROUP BY lang
"""

QUERIES["token_freq"] = text.token_freq
ORACLES["token_freq"] = f"""
SELECT token, count(*) AS freq
FROM (SELECT unnest({_TOKS}) AS token FROM documents)
GROUP BY token
ORDER BY freq DESC, token ASC
LIMIT 20
"""

QUERIES["token_counts"] = text.token_counts
ORACLES["token_counts"] = f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens_ws,
       len(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens_bpe,
       length(text) AS n_chars
FROM documents
"""

QUERIES["doc_fingerprint"] = text.doc_fingerprint
ORACLES["doc_fingerprint"] = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
       count(*) AS n_docs,
       min(doc_id) AS representative
FROM documents
GROUP BY 1
"""

QUERIES["quality_score"] = text.quality_score
ORACLES["quality_score"] = f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS toks FROM documents
), m AS (
  SELECT doc_id, text, toks, len(toks) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) END AS uniq_ratio,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / CAST(length(text) AS DOUBLE) END AS alpha_ratio,
         CASE WHEN len(toks) > 0
              THEN list_sum(list_transform(toks, x -> length(x))) / CAST(len(toks) AS DOUBLE) END AS mean_token_len
  FROM t
)
SELECT doc_id, n_tokens,
       round(uniq_ratio, 4) AS uniq_ratio,
       round(alpha_ratio, 4) AS alpha_ratio,
       round(mean_token_len, 4) AS mean_token_len,
       CASE WHEN n_tokens < 5 THEN 'too_short'
            WHEN uniq_ratio < 0.3 THEN 'repetitive'
            WHEN alpha_ratio < 0.5 THEN 'symbol_heavy'
            ELSE 'ok' END AS quality_bucket
FROM m
"""

_EN_SW = "['" + "', '".join(text.EN_STOPWORDS) + "']"
QUERIES["lang_id"] = text.lang_id
ORACLES["lang_id"] = f"""
WITH t AS (
  SELECT doc_id, lang, list_distinct({_TOKS}) AS dtoks FROM documents
), s AS (
  SELECT doc_id, lang,
         CASE WHEN len(dtoks) > 0
              THEN len(list_intersect(dtoks, {_EN_SW})) / CAST(len(dtoks) AS DOUBLE) END AS score
  FROM t
)
SELECT doc_id, lang, round(score, 4) AS en_score,
       CASE WHEN score >= 0.05 THEN 'en' ELSE 'unknown' END AS predicted_lang
FROM s
"""

QUERIES["tfidf_top_terms"] = text.tfidf_top_terms
ORACLES["tfidf_top_terms"] = f"""
WITH pairs AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM pairs GROUP BY 1, 2
), df AS (
  SELECT term, count(*) AS df_docs FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df_docs,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df_docs), 4) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df_docs, score, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
  FROM scored
) WHERE rnk <= 3
"""

QUERIES["exact_dedup"] = dedup.exact_dedup
ORACLES["exact_dedup"] = """
SELECT sha256(text) AS content_hash,
       min(doc_id) AS doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""

# served through the materialized edge table: the first family member
# to run pays the prefix-filter join once; the other 13 consumers scan
QUERIES["ngram_jaccard_pairs"] = lambda spark, sf_dir: dedup.dedup_edges(
    spark, sf_dir, 0.8
)
ORACLES["ngram_jaccard_pairs"] = f"""
WITH t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.toks, b.toks))
             / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) AS jaccard
FROM t a JOIN t b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.toks, b.toks))
             / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.8
"""

QUERIES["minhash_lsh_pairs"] = dedup.minhash_lsh_pairs
QUERIES["simhash_pairs"] = dedup.simhash_pairs

# DuckDB twin of dedup._shingles_from_tokens: distinct word-3-gram
# shingles (short docs yield their 1-2-token shingle, empty docs "" —
# matching Spark's slice semantics). Spark intersects xxhash64'd
# shingles; equal cardinalities bar 64-bit collisions (~1e-10 here).
_DUCK_SHINGLES = (
    "list_distinct(list_transform(range(0, greatest(len(toks)-3, 0)+1), "
    "i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3])))"
)

# Oracle contract: the emitted pair set equals the EXACT shingle-Jaccard
# relation at the verify threshold — i.e. the gate asserts soundness
# (every pair's jaccard is exact and ≥ t: true by construction, the
# verify pass computes exact Jaccard) AND 100% LSH recall on this
# corpus (deterministic — fixed permutation constants, fixed data;
# verified identical at sf0.001/sf0.01). A recall loss on changed data
# would surface here, which is what a dedup gate SHOULD catch.
ORACLES["minhash_lsh_pairs"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM t
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sh, b.sh))
             / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 4) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))
      / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5
"""

# Near-dup clustering: connected components over the (exact-verified)
# Jaccard pair relation + canonical min-id selection. The oracle runs
# the same min-label closure as a recursive CTE — exact integer labels,
# engine-independent.
QUERIES["dup_clusters"] = dedup.dup_clusters
ORACLES["dup_clusters"] = f"""
WITH RECURSIVE t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.8
), edges AS (
  SELECT doc_a AS u, doc_b AS w FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS w FROM pairs
), cc(v, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, cc.l FROM edges e JOIN cc ON cc.v = e.w
)
SELECT v AS doc_id, min(l) AS cluster_id, (v = min(l)) AS is_canonical
FROM cc GROUP BY v
"""


# Benchmark contamination: exact integer shared-gram counts.
QUERIES["contamination_pairs"] = dedup.contamination_pairs
ORACLES["contamination_pairs"] = f"""
WITH t AS (
  SELECT doc_id, source, {_TOKS} AS toks FROM documents
), g AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(range(0, greatest(len(toks)-5, 0)+1),
           i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3], toks[i+4], toks[i+5])))) AS gram
  FROM t
)
SELECT tr.doc_id AS doc_id, b.doc_id AS bench_id, count(*) AS n_shared_grams
FROM (SELECT * FROM g WHERE source <> 'src0') tr
JOIN (SELECT * FROM g WHERE source = 'src0') b USING (gram)
GROUP BY 1, 2
"""


# DuckDB twin of dedup.simhash_signatures: the 60-bit sha256-derived
# token hash is computed bit-identically in both engines (dedup._h60),
# so the oracle rebuilds the signatures and takes the ALL-PAIRS
# hamming≤3 relation — which the banded Spark plan equals by pigeonhole
# (4 chunks × 15 bits). Full oracle strength, no recall caveat.
_DUCK_H60 = "CAST(concat('0x', substr(sha256(tk), 1, 15)) AS BIGINT)"
_DUCK_SIMHASH = " + ".join(
    f"(CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> {i}) & 1)) - n > 0 "
    f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
    for i in range(60)
)
ORACLES["simhash_pairs"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), h AS (
  SELECT doc_id, len(toks) AS n,
         list_transform(toks, tk -> {_DUCK_H60}) AS hs
  FROM t WHERE len(toks) > 0
), sig AS (
  SELECT doc_id, ({_DUCK_SIMHASH}) AS simhash FROM h
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# --------------------------------------------------------------------------
# EXT tier 3 — similarity search + event-time windows (E3/E9/E10)
# --------------------------------------------------------------------------

from parquet_to_csv_spark.operators import similarity, timeops  # noqa: E402

# DuckDB twin of functions.vectors.cosine_similarity: double-accumulated
# dot / (norm * norm) over the float lists.
def _duck_cos(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
    )


QUERIES["cosine_topk"] = similarity.cosine_topk
ORACLES["cosine_topk"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS cand_id, embedding AS c_emb FROM embeddings
), scored AS (
  SELECT query_id, cand_id, {_duck_cos('q_emb', 'c_emb')} AS sim
  FROM q JOIN c ON query_id <> cand_id
), ranked AS (
  SELECT query_id, cand_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id ASC) AS rnk
  FROM scored
)
SELECT query_id, cand_id, round(sim, 6) AS cosine, rnk
FROM ranked WHERE rnk <= 5
"""

QUERIES["embedding_neardup_pairs"] = similarity.embedding_neardup_pairs
ORACLES["embedding_neardup_pairs"] = f"""
WITH pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
         round({_duck_cos('a.embedding', 'b.embedding')}, 6) AS cosine
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, label, cosine FROM pairs WHERE cosine >= 0.4
"""

# IVF ANN: the whole procedure (first-n_cells centroids → argmax-cosine
# assignment → nprobe probing → per-cell exact top-k) is deterministic
# and SQL-expressible, so the oracle replicates it step for step —
# full-strength gate; recall-vs-exact stays in tests/test_similarity_time.py.
QUERIES["ivf_topk"] = similarity.ivf_topk
ORACLES["ivf_topk"] = f"""
WITH cents AS (
  SELECT vec_id AS cell_id, embedding AS cent_emb FROM embeddings WHERE vec_id < 16
), asg AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell_id AS cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_duck_cos('e.embedding', 'c.cent_emb')} DESC, c.cell_id ASC
           ) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5
), probes AS (
  SELECT query_id, q_emb, cell FROM (
    SELECT q.query_id, q.q_emb, c.cell_id AS cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_duck_cos('q.q_emb', 'c.cent_emb')} DESC, c.cell_id ASC
           ) AS rn
    FROM q CROSS JOIN cents c
  ) WHERE rn <= 4
), scored AS (
  SELECT p.query_id, a.vec_id AS cand_id,
         {_duck_cos('p.q_emb', 'a.embedding')} AS sim
  FROM probes p JOIN asg a ON p.cell = a.cell
  WHERE p.query_id <> a.vec_id
)
SELECT query_id, cand_id, round(sim, 6) AS cosine, rnk FROM (
  SELECT query_id, cand_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 5
"""

QUERIES["tumbling_window_stats"] = timeops.tumbling_window_stats
ORACLES["tumbling_window_stats"] = f"""
SELECT (epoch_ms(ts) // 3600000) * 3600000 AS ws_ms,
       event_type,
       count(*) AS n_events,
       {duck_sum_2dp("value", 2)} AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""

QUERIES["sliding_window_stats"] = timeops.sliding_window_stats
ORACLES["sliding_window_stats"] = """
WITH w AS (
  SELECT (epoch_ms(ts) // 1800000) * 1800000 AS ws_ms, value FROM events
  UNION ALL
  SELECT (epoch_ms(ts) // 1800000) * 1800000 - 1800000 AS ws_ms, value FROM events
)
SELECT ws_ms, count(*) AS n_events,
       floor(round(sum(value) * 100) * 100 / count(*)) / 10000.0 AS avg_value
FROM w GROUP BY 1
"""

QUERIES["session_windows"] = timeops.session_windows
ORACLES["session_windows"] = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, value FROM events
), flagged AS (
  SELECT user_id, tus, value,
         CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
                   OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
), sessions AS (
  SELECT user_id, tus, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       min(tus) AS session_start_us,
       max(tus) + 1800000000 AS session_end_us,
       count(*) AS n_events,
       {duck_sum_2dp("value", 2)} AS sum_value
FROM sessions
GROUP BY user_id, sid
"""

QUERIES["hourly_to_daily_rollup"] = timeops.hourly_to_daily_rollup
# Two-tier rollup with exact integer cents through both tiers — the
# round-1 gate flap was a float rounding on the re-aggregated doubles.
ORACLES["hourly_to_daily_rollup"] = f"""
WITH hourly AS (
  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hs_ms, event_type,
         count(*) AS n, sum({duck_units("value", 2)}) AS sv_cents
  FROM events GROUP BY 1, 2
)
SELECT (hs_ms // 86400000) * 86400000 AS day_ms, event_type,
       sum(n) AS n_events,
       (sum(sv_cents) / 100.0) AS sum_value,
       max(n) AS max_hourly_events
FROM hourly GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# EXT tier 4 — multimodal metadata pass (north-star; decode is stubbed,
# plumbing is real — operators/multimodal.py)
# --------------------------------------------------------------------------

from parquet_to_csv_spark.operators import multimodal  # noqa: E402

QUERIES["multimodal_meta"] = multimodal.multimodal_meta
ORACLES["multimodal_meta"] = """
SELECT doc_id,
       'text' AS modality,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5,
       source
FROM documents
"""


# --------------------------------------------------------------------------
# E12 pandas-UDF escape hatch + SQL entry point demos
# --------------------------------------------------------------------------

from parquet_to_csv_spark.operators import pandas_ops  # noqa: E402
from parquet_to_csv_spark.plans import sqlapi  # noqa: E402

QUERIES["token_counts_pandas"] = pandas_ops.token_counts_pandas
ORACLES["token_counts_pandas"] = f"""
SELECT doc_id, len({_TOKS}) AS n_tokens_ws
FROM documents
"""


def _sql_passthrough(spark, sf_dir):
    """Entry point 3 (SURVEY.md §3): raw ANSI SQL over registered views;
    Catalyst plans it identically to the DataFrame formulation."""
    return sqlapi.sql(
        spark,
        """
        SELECT o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY o_orderstatus
        """,
        sf_dir,
    )


QUERIES["sql_passthrough"] = _sql_passthrough
ORACLES["sql_passthrough"] = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Temporal joins (as-of / banded range), CUBE, quantiles, set ops, JSON
# --------------------------------------------------------------------------

from parquet_to_csv_spark.operators import rangejoin, semistruct  # noqa: E402

# Shared oracle CTE: events with µs-epoch time, split by type. DuckDB's
# parquet reader truncates the ns timestamp to µs; Spark reads ns-as-long
# and does `ts div 1000` — both floor, so the µs values agree.
_EV_US_CTE = """
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
  FROM events
)
"""

QUERIES["asof_purchase_click"] = rangejoin.asof_join_purchase_click
ORACLES["asof_purchase_click"] = _EV_US_CTE + """
SELECT p.event_id AS purchase_id,
       p.user_id,
       c.event_id AS click_id,
       p.ts_us - c.ts_us AS lag_us,
       round(c.value, 2) AS click_value
FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
"""

QUERIES["asof_forward_error_purchase"] = rangejoin.asof_forward_error_purchase
ORACLES["asof_forward_error_purchase"] = _EV_US_CTE + """
SELECT e.event_id AS error_id,
       e.user_id,
       p.event_id AS purchase_id,
       p.ts_us - e.ts_us AS lead_us,
       round(p.value, 2) AS purchase_value
FROM (SELECT * FROM ev WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts_us <= p.ts_us
"""

QUERIES["range_join_error_clicks"] = rangejoin.range_join_error_clicks
ORACLES["range_join_error_clicks"] = _EV_US_CTE + """
SELECT e.event_id AS error_id,
       e.user_id,
       count(c.event_id) AS n_clicks_5m,
       coalesce(round(sum(c.value), 2), 0.0) AS click_value_5m
FROM (SELECT * FROM ev WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') c
  ON e.user_id = c.user_id
 AND c.ts_us BETWEEN e.ts_us - 300000000 AND e.ts_us
GROUP BY e.event_id, e.user_id
"""

QUERIES["cube_orders"] = relational.cube_orders
ORACLES["cube_orders"] = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

QUERIES["price_quantiles"] = relational.price_quantiles
ORACLES["price_quantiles"] = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""

QUERIES["segment_intersect"] = relational.segment_intersect
ORACLES["segment_intersect"] = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""

QUERIES["segment_except"] = relational.segment_except
ORACLES["segment_except"] = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderdate >= DATE '1998-01-01'
"""

QUERIES["props_json_stats"] = semistruct.props_json_stats
ORACLES["props_json_stats"] = """
SELECT event_type,
       count(k) AS n_with_k,
       floor(round(sum(k) * 100) * 100 / count(k)) / 10000.0 AS avg_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# TPC-H-shaped breadth: EXISTS, top-k revenue, correlated agg, HAVING
# --------------------------------------------------------------------------

QUERIES["q4_late_orders"] = relational.q4_late_orders
ORACLES["q4_late_orders"] = """
SELECT o_orderpriority, count(*) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
"""

QUERIES["q10_returned_revenue"] = relational.q10_returned_revenue
ORACLES["q10_returned_revenue"] = f"""
SELECT c_custkey, c_name, n_name,
       {_D_REV} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

QUERIES["q17_small_quantity_revenue"] = relational.q17_small_quantity_revenue
# Mirrors the canonical-Q17 Spark plan: per-part stats over the
# brand-reduced lineitem only; cutoff compared in exact integer units
# (100q·5·n < Σ100q ⇔ q < 0.2·avg(q) for exact-2dp quantities).
ORACLES["q17_small_quantity_revenue"] = f"""
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
), cut AS (
  SELECT l_partkey AS pk,
         sum({duck_units("l_quantity", 2)}) AS qsum_u,
         count(*) AS qn
  FROM brand_li GROUP BY l_partkey
)
SELECT floor((sum({duck_units("l_extendedprice", 2)}) / 100.0 / 7.0) * 100.0 + 0.5) / 100.0 AS avg_yearly
FROM brand_li
JOIN cut ON l_partkey = pk
WHERE {duck_units("l_quantity", 2)} * 5 * qn < qsum_u
"""

QUERIES["q18_large_orders"] = relational.q18_large_orders
ORACLES["q18_large_orders"] = """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING round(sum(l_quantity), 2) > 300.0
)
SELECT c_custkey, c_name, o_orderkey,
       round(o_totalprice, 2) AS total_price, total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# Skew-salted join (oracle = the plain unsalted join)
# --------------------------------------------------------------------------

from parquet_to_csv_spark.operators import skew  # noqa: E402

QUERIES["salted_join_revenue"] = skew.salted_join_revenue
ORACLES["salted_join_revenue"] = f"""
SELECT o_orderstatus,
       count(*) AS n_lines,
       {_D_REV} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Structured Streaming through the correctness gate (batch/stream parity)
# --------------------------------------------------------------------------

from parquet_to_csv_spark.streaming import stream as _stream  # noqa: E402

QUERIES["streaming_tumbling_drain"] = _stream.tumbling_drain_query
ORACLES["streaming_tumbling_drain"] = f"""
SELECT (epoch_ms(ts) // 3600000) * 3600000 AS ws_ms,
       event_type,
       count(*) AS n_events,
       {duck_sum_2dp("value", 2)} AS sum_value
FROM events
GROUP BY 1, 2
"""

# E10 streaming sessions drained availableNow — equal to the batch
# gaps-and-islands session relation (count + start only: the streaming
# twin's projection).
QUERIES["streaming_sessions_drain"] = _stream.sessions_drain_query
ORACLES["streaming_sessions_drain"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus FROM events
), flagged AS (
  SELECT user_id, tus,
         CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
                   OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
), sessions AS (
  SELECT user_id, tus,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       min(tus) AS session_start_us,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, sid
"""

# E20: the custom applyInPandasWithState operator, drained availableNow
# in ONE micro-batch — update-mode emits the final running row per user,
# which equals the plain batch aggregation.
QUERIES["stateful_totals_drain"] = _stream.stateful_totals_drain
ORACLES["stateful_totals_drain"] = f"""
SELECT user_id,
       count(*) AS n_events,
       {duck_sum_2dp("value", 2)} AS sum_value,
       max(epoch_us(ts)) AS last_ts_us
FROM events
GROUP BY user_id
"""


# CDC snapshot diff over deterministic synthetic v1/v2 of events.
QUERIES["cdc_events_diff"] = relational.cdc_events_diff
ORACLES["cdc_events_diff"] = """
WITH v1 AS (
  SELECT event_id, round(value, 2) AS value FROM events
), v2 AS (
  SELECT event_id,
         CASE WHEN event_id % 5 = 0 THEN round(round(value, 2) + 1.0, 2)
              ELSE round(value, 2) END AS value
  FROM events WHERE event_id % 7 <> 0
  UNION ALL
  SELECT event_id + 10000000 AS event_id, round(value, 2) AS value
  FROM events WHERE event_id % 11 = 0
)
SELECT coalesce(v1.event_id, v2.event_id) AS key,
       CASE WHEN v1.event_id IS NULL THEN 'insert'
            WHEN v2.event_id IS NULL THEN 'delete'
            WHEN v1.value <> v2.value THEN 'update' END AS change_type,
       v1.value AS old_v, v2.value AS new_v
FROM v1 FULL OUTER JOIN v2 ON v1.event_id = v2.event_id
WHERE CASE WHEN v1.event_id IS NULL THEN 'insert'
           WHEN v2.event_id IS NULL THEN 'delete'
           WHEN v1.value <> v2.value THEN 'update' END IS NOT NULL
"""

# E12 grouped-map: per-user OLS slope; sufficient statistics are exact
# integer sums (Python unbounded ints / DuckDB HUGEINT), one final
# float division each side.
QUERIES["user_value_slope"] = pandas_ops.user_value_slope
