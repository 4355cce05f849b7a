"""Registry segment 3/13 — mechanically split from the
round-4 plans/registry.py (12k lines). QUERIES insertion order is
load-bearing (the driver's correctness window samples the first 50
entries), so each segment imports its predecessor: importing ANY
segment executes the full prefix in the original order.
"""
from __future__ import annotations

from parquet_to_csv_spark.plans.registry_core import (QUERIES, ORACLES, query)  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts import p02 as _prev_segment  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p01 import (  # noqa: F401
    _TOKS,
    _duck_cos,
    dedup,
    duck_units,
    relational,
    similarity,
    text,
    timeops,
)
from parquet_to_csv_spark.plans.registry_parts.p02 import _KM_SQD, _stream, corpus  # noqa: F401

ORACLES["nearest_centroid_confusion"] = f"""
WITH emb AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), train AS (SELECT * FROM emb WHERE vec_id % 5 <> 0),
   test AS (SELECT * FROM emb WHERE vec_id % 5 = 0),
   upd AS (
  SELECT label, t.pos,
         CAST(sum(CAST(v[t.pos + 1] AS DECIMAL(27,10))) AS DOUBLE) / count(*) AS cval
  FROM train, unnest(range(0, len(v))) AS t(pos)
  GROUP BY label, t.pos
), cents AS (
  SELECT label AS pred_label, list(cval ORDER BY pos) AS c FROM upd GROUP BY label
), d AS (
  SELECT e.vec_id, e.label, c.pred_label,
         {_KM_SQD.format(v='e.v', c='c.c')} AS d
  FROM test e CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, label, pred_label FROM (
    SELECT vec_id, label, pred_label,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, pred_label) AS rn
    FROM d
  ) WHERE rn = 1
)
SELECT label AS true_label, pred_label AS predicted, count(*) AS n_vecs
FROM assigned GROUP BY label, pred_label
"""

# Table fingerprints: shared 60-bit sha256 row hash + bit_xor — no
# float surface, no ordering contract; DuckDB builds the identical
# canonical row strings.
QUERIES["table_fingerprints"] = relational.table_fingerprints
ORACLES["table_fingerprints"] = """
WITH d AS (
  SELECT 'documents' AS table_name,
         CAST(concat('0x', substr(sha256(
           concat_ws('|', CAST(doc_id AS VARCHAR), lang, text)
         ), 1, 15)) AS BIGINT) AS h
  FROM documents
), e AS (
  SELECT 'events' AS table_name,
         CAST(concat('0x', substr(sha256(
           concat_ws('|', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR),
                     event_type, CAST(round(value, 2) AS VARCHAR))
         ), 1, 15)) AS BIGINT) AS h
  FROM events
)
SELECT table_name, bit_xor(h) AS fingerprint, count(*) AS n_rows
FROM (SELECT * FROM d UNION ALL SELECT * FROM e) GROUP BY table_name
"""

QUERIES["weighted_sample"] = corpus.weighted_sample
ORACLES["weighted_sample"] = f"""
WITH d AS (
  SELECT doc_id, lang,
         len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS n_tokens,
         CAST({corpus.duck_md5_bucket("doc_id", 10000)} AS BIGINT) AS sample_bucket
  FROM documents
)
SELECT doc_id, lang, n_tokens, sample_bucket,
       least(n_tokens * 40, 10000) AS keep_cut
FROM d WHERE sample_bucket < least(n_tokens * 40, 10000)
"""

QUERIES["order_value_deciles"] = relational.order_value_deciles
ORACLES["order_value_deciles"] = """
WITH t AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile, count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
FROM t GROUP BY decile
"""

# Capstone composition: quality filter → exact dedup (min-struct
# survivor) → 50% deterministic sample → chunking → accounting, all
# replayed stage for stage.
QUERIES["corpus_curation_pipeline"] = corpus.corpus_curation_pipeline
ORACLES["corpus_curation_pipeline"] = f"""
WITH q AS (
  SELECT doc_id, lang, text, {_TOKS} AS toks FROM documents
  WHERE len({_TOKS}) >= 5
    AND len(list_distinct({_TOKS})) / CAST(len({_TOKS}) AS DOUBLE) >= 0.3
), surv AS (
  SELECT min(doc_id) AS doc_id,
         arg_min(lang, doc_id) AS lang,
         arg_min(text, doc_id) AS text
  FROM q GROUP BY sha256(text)
), samp AS (
  SELECT doc_id, lang, {_TOKS} AS toks FROM surv
  WHERE {corpus.duck_md5_bucket("doc_id", 100)} < 50
), ch AS (
  SELECT doc_id, lang,
         list_slice(toks, start, start + 63) AS chunk_toks
  FROM (
    SELECT doc_id, lang, toks,
           unnest(generate_series(1, greatest(len(toks), 1), 48)) AS start
    FROM samp
  )
  WHERE len(list_slice(toks, start, start + 63)) > 0
)
SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
       sum(len(chunk_toks)) AS n_tokens
FROM ch GROUP BY lang
"""

# Deletion-propagation audit + co-occurrence: both all-integer outputs.
QUERIES["forget_users_audit"] = relational.forget_users_audit
ORACLES["forget_users_audit"] = """
WITH kept AS (
  SELECT event_id, user_id, event_type, round(value, 2) AS value,
         CAST(concat('0x', substr(sha256(
           concat_ws('|', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR),
                     event_type, CAST(round(value, 2) AS VARCHAR))
         ), 1, 15)) AS BIGINT) AS h
  FROM events WHERE user_id % 97 <> 0
)
SELECT count(*) AS n_rows,
       count(CASE WHEN user_id % 97 = 0 THEN 1 END) AS n_cohort_left,
       bit_xor(h) AS fingerprint
FROM kept
"""

QUERIES["part_cooccurrence_topk"] = relational.part_cooccurrence_topk
ORACLES["part_cooccurrence_topk"] = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT part_a, part_b, n_orders FROM pairs
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 20
"""

# Bloom sketch: md5-derived positions and bit_or words are identical in
# both engines; the oracle replays build + probe and the defining
# properties (FN = 0, fixed FP count) are part of the hashed output.
from parquet_to_csv_spark.operators import sketch as _sketch  # noqa: E402

QUERIES["bloom_membership_stats"] = _sketch.bloom_membership_stats
_B_POS = lambda expr: ", ".join(  # noqa: E731
    _sketch.duck_md5_slice_bucket(expr, 1 + 4 * j, _sketch.M_BITS)
    for j in range(_sketch.K_HASHES)
)
ORACLES["bloom_membership_stats"] = f"""
WITH pos AS (
  SELECT unnest([{_B_POS("c_custkey")}]) AS p FROM customer
), bitmap AS (
  SELECT p // 32 AS word_idx, bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) AS bits
  FROM pos GROUP BY p // 32
), probes AS (
  SELECT unnest(range(0, 3000)) AS k
), ppos AS (
  SELECT k, unnest([{_B_POS("k")}]) AS p FROM probes
), checked AS (
  SELECT ppos.k,
         CASE WHEN coalesce(bitmap.bits, 0) & (1::BIGINT << CAST(ppos.p % 32 AS INTEGER)) <> 0
              THEN 1 ELSE 0 END AS hit
  FROM ppos LEFT JOIN bitmap ON ppos.p // 32 = bitmap.word_idx
), agg AS (
  SELECT k, (sum(hit) = 3) AS in_bloom FROM checked GROUP BY k
), j AS (
  SELECT agg.k, agg.in_bloom,
         (c.c_custkey IS NOT NULL) AS in_exact
  FROM agg LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON agg.k = c.c_custkey
)
SELECT count(CASE WHEN in_bloom AND in_exact THEN 1 END) AS n_tp,
       count(CASE WHEN in_bloom AND NOT in_exact THEN 1 END) AS n_fp,
       count(CASE WHEN NOT in_bloom AND in_exact THEN 1 END) AS n_fn,
       count(CASE WHEN NOT in_bloom AND NOT in_exact THEN 1 END) AS n_tn
FROM j
"""

# Churn + retention: integer-µs / week arithmetic only.
QUERIES["signup_churn_7d"] = timeops.signup_churn_7d
ORACLES["signup_churn_7d"] = """
WITH s AS (
  SELECT event_id AS signup_id, user_id, epoch_us(ts) AS s_ts
  FROM events WHERE event_type = 'signup'
), p AS (
  SELECT user_id, epoch_us(ts) AS p_ts FROM events WHERE event_type = 'purchase'
)
SELECT signup_id, user_id, s_ts AS signup_ts_us
FROM s
WHERE NOT EXISTS (
  SELECT 1 FROM p
  WHERE p.user_id = s.user_id
    AND p.p_ts >= s.s_ts AND p.p_ts <= s.s_ts + 604800000000
)
"""

QUERIES["retention_cohorts"] = timeops.retention_cohorts
ORACLES["retention_cohorts"] = """
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events
), c AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
       count(DISTINCT uw.user_id) AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY c.cohort_week, uw.week - c.cohort_week
"""

# Heatmap + SLA: integer dow/hour arithmetic and integer-day lags.
QUERIES["activity_heatmap"] = timeops.activity_heatmap
ORACLES["activity_heatmap"] = f"""
SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
       (epoch_us(ts) // 3600000000) % 24 AS hour,
       count(*) AS n_events,
       sum({duck_units("value", 2)}) / 100.0 AS sum_value
FROM events GROUP BY dow, hour
"""

QUERIES["shipping_sla_percentiles"] = timeops.shipping_sla_percentiles
ORACLES["shipping_sla_percentiles"] = """
WITH j AS (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS lag_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority, count(*) AS n_lines,
       round(quantile_cont(lag_days, 0.5), 1) AS p50_days,
       round(quantile_cont(lag_days, 0.9), 1) AS p90_days,
       round(quantile_cont(lag_days, 0.99), 1) AS p99_days
FROM j GROUP BY o_orderpriority
"""

# BM25 sparse retrieval: contributions rounded to integer micro-units
# then summed exactly; dl/avgdl as dl*n/sum_dl (one double division)
# so both engines evaluate the identical float expression.
QUERIES["bm25_topk"] = text.bm25_topk
ORACLES["bm25_topk"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), stats AS (
  SELECT doc_id, len(toks) AS dl, toks FROM toks
), n AS (
  SELECT count(*) AS n_docs, sum(len(toks)) AS sum_dl FROM toks
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM (
    SELECT doc_id, dl,
           unnest(list_filter(toks, t -> t IN ('vector', 'hash', 'scan'))) AS term
    FROM stats
  ) GROUP BY 1, 2, 3
), df AS (
  SELECT term, count(*) AS df_docs FROM tf GROUP BY 1
), contrib AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (n.n_docs - df.df_docs + 0.5) / (df.df_docs + 0.5))
           * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * (tf.dl * n.n_docs) / n.sum_dl)))
           * 1000000.0) AS BIGINT) AS u
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, count(*) AS n_matched, sum(u) / 1000000.0 AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""

# Stream-static join: stateless broadcast enrichment per micro-batch —
# drained output equals the plain batch equi-join exactly.
QUERIES["streaming_static_enrich_drain"] = _stream.static_enrich_drain_query
ORACLES["streaming_static_enrich_drain"] = """
SELECT event_id, epoch_us(ts) AS ts_us, user_id, c_name, c_mktsegment, value
FROM events JOIN customer ON user_id = c_custkey
"""

# Column profile: distinct counts run on the canonical string form
# (injective per engine); numeric min/max on the raw double domain,
# timestamps through the epoch-µs convention.
QUERIES["column_profile"] = relational.column_profile
ORACLES["column_profile"] = """
WITH p AS (
  SELECT 'l_orderkey' AS col_name, CAST(l_orderkey AS VARCHAR) AS sval, CAST(l_orderkey AS DOUBLE) AS nval FROM lineitem
  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR), CAST(l_partkey AS DOUBLE) FROM lineitem
  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR), CAST(l_suppkey AS DOUBLE) FROM lineitem
  UNION ALL SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR), CAST(l_linenumber AS DOUBLE) FROM lineitem
  UNION ALL SELECT 'l_quantity', CAST(l_quantity AS VARCHAR), CAST(l_quantity AS DOUBLE) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS VARCHAR), CAST(l_extendedprice AS DOUBLE) FROM lineitem
  UNION ALL SELECT 'l_discount', CAST(l_discount AS VARCHAR), CAST(l_discount AS DOUBLE) FROM lineitem
  UNION ALL SELECT 'l_tax', CAST(l_tax AS VARCHAR), CAST(l_tax AS DOUBLE) FROM lineitem
  UNION ALL SELECT 'l_returnflag', l_returnflag, CAST(NULL AS DOUBLE) FROM lineitem
  UNION ALL SELECT 'l_linestatus', l_linestatus, CAST(NULL AS DOUBLE) FROM lineitem
  UNION ALL SELECT 'l_shipdate', CAST(epoch_us(l_shipdate) AS VARCHAR), CAST(epoch_us(l_shipdate) AS DOUBLE) FROM lineitem
)
SELECT col_name, count(*) AS n_rows, count(*) - count(sval) AS n_nulls,
       count(DISTINCT sval) AS n_distinct,
       min(nval) AS min_val, max(nval) AS max_val
FROM p GROUP BY col_name
"""

# Sequence packing: concat-and-chunk context-window layout. The oracle
# states the SPEC (one global ordered prefix sum); the engine computes
# the same numbers with the two-phase distributed scan — identical
# integers either way, which is exactly what the hash check pins.
QUERIES["sequence_packing"] = corpus.sequence_packing
ORACLES["sequence_packing"] = f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
), nz AS (
  SELECT doc_id, n_tokens FROM t WHERE n_tokens > 0
), c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum_before
  FROM nz
)
SELECT doc_id, n_tokens, cum_before,
       cum_before // 256 AS seq_id,
       cum_before % 256 AS seq_offset,
       ((cum_before + n_tokens - 1) // 256) - (cum_before // 256) + 1 AS n_seqs
FROM c
"""

# --------------------------------------------------------------------------
# Round-2 additions (cont.): HLL / CMS sketches, repetition quality,
# PageRank over the near-dup graph.
# --------------------------------------------------------------------------

# HyperLogLog: bucket/rho are pure string ops over the shared md5 hash
# (no float log2), register sums are exact powers-of-two integers, and
# the one final division + ln is a fixed-order double expression — the
# oracle replays the whole sketch.
_HLL_RHO = """
  SELECT (instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
       + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) AS bucket,
         ltrim(substring(h, 3, 15), '0') AS t
  FROM (SELECT md5(CAST(user_id AS VARCHAR)) AS h FROM events)
"""

QUERIES["hll_distinct_estimate"] = _sketch.hll_distinct_estimate
ORACLES["hll_distinct_estimate"] = f"""
WITH hh AS (
{_HLL_RHO}
), r AS (
  SELECT bucket,
         CASE WHEN t = '' THEN 61
              ELSE (15 - length(t)) * 4 +
                   CASE WHEN (instr('0123456789abcdef', substring(t, 1, 1)) - 1) >= 8 THEN 1
                        WHEN (instr('0123456789abcdef', substring(t, 1, 1)) - 1) >= 4 THEN 2
                        WHEN (instr('0123456789abcdef', substring(t, 1, 1)) - 1) >= 2 THEN 3
                        ELSE 4 END
         END AS rho
  FROM hh
), regs AS (
  SELECT bucket, max(rho) AS m FROM r GROUP BY bucket
), acc AS (
  SELECT count(*) AS n_present,
         sum(1::BIGINT << CAST(61 - m AS INTEGER)) AS s_present
  FROM regs
), s AS (
  SELECT (256 - n_present) AS n_zero_registers,
         CAST(s_present + (256 - n_present)::HUGEINT * 2305843009213693952::HUGEINT AS DOUBLE) AS s_total
  FROM acc
), e AS (
  SELECT n_zero_registers,
         (0.7213 / (1 + 1.079 / 256.0)) * 65536.0 * 2305843009213693952.0 / s_total AS raw
  FROM s
)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_exact,
       CAST(n_zero_registers AS BIGINT) AS n_zero_registers,
       round(CASE WHEN raw <= 640.0 AND n_zero_registers > 0
                  THEN 256.0 * ln(256.0 / n_zero_registers)
                  ELSE raw END, 2) AS hll_estimate
FROM e
"""

# Count-min: the j-th hash row reuses the Bloom md5 nibble slices.
_CMS_H = lambda expr: ", ".join(  # noqa: E731
    _sketch.duck_md5_slice_bucket(expr, 1 + 4 * j, _sketch.CMS_W)
    for j in range(_sketch.CMS_D)
)
QUERIES["cms_heavy_hitters"] = _sketch.cms_heavy_hitters
ORACLES["cms_heavy_hitters"] = f"""
WITH tok AS (
  SELECT unnest({_TOKS}) AS token FROM documents
), pos AS (
  SELECT generate_subscripts(hs, 1) - 1 AS j, unnest(hs) AS c
  FROM (SELECT [{_CMS_H("token")}] AS hs FROM tok)
), cms AS (
  SELECT j, c, CAST(count(*) AS BIGINT) AS n FROM pos GROUP BY j, c
), exact AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n_exact FROM tok GROUP BY token
), top AS (
  SELECT token, n_exact FROM exact ORDER BY n_exact DESC, token ASC LIMIT 20
), ppos AS (
  SELECT token, n_exact, generate_subscripts(hs, 1) - 1 AS j, unnest(hs) AS c
  FROM (SELECT token, n_exact, [{_CMS_H("token")}] AS hs FROM top)
), est AS (
  SELECT token, n_exact, min(n) AS n_cms
  FROM ppos JOIN cms USING (j, c) GROUP BY token, n_exact
)
SELECT token, n_exact, n_cms, n_cms - n_exact AS overcount FROM est
"""

# Repetition quality: integer ppm fractions ((x·1e6) div total) — no
# float division anywhere, any partitioning/engine yields identical longs.
QUERIES["repetition_stats"] = text.repetition_stats
ORACLES["repetition_stats"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), base AS (
  SELECT doc_id, toks FROM t WHERE len(toks) >= 3
), g AS (
  SELECT doc_id, 2 AS n, toks[i] || ' ' || toks[i + 1] AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM base)
  UNION ALL
  SELECT doc_id, 3 AS n, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM base)
), pg AS (
  SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY doc_id, n, gram
), pd AS (
  SELECT doc_id, n, CAST(sum(cnt) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(cnt) AS BIGINT) AS top_n
  FROM pg GROUP BY doc_id, n
)
SELECT doc_id,
  max(CASE WHEN n = 2 THEN total END) AS n_bigrams,
  max(CASE WHEN n = 2 THEN ((total - n_distinct) * 1000000) // total END) AS dup_bigram_ppm,
  max(CASE WHEN n = 2 THEN (top_n * 1000000) // total END) AS top_bigram_ppm,
  max(CASE WHEN n = 3 THEN total END) AS n_trigrams,
  max(CASE WHEN n = 3 THEN ((total - n_distinct) * 1000000) // total END) AS dup_trigram_ppm
FROM pd GROUP BY doc_id
"""

# PageRank: the near-dup edge relation is the exact-verified Jaccard
# pair set (same blocked exhaustive relation the dup_clusters oracle
# proves complete); both iterations replay as CTE levels in exact
# integer ppb arithmetic.
QUERIES["neardup_pagerank"] = dedup.neardup_pagerank
ORACLES["neardup_pagerank"] = f"""
WITH t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.8
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), nodes AS (
  SELECT src AS v, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src
), pr0 AS (
  SELECT v, deg, 1000000000::BIGINT AS pr FROM nodes
), c1 AS (
  SELECT e.dst, CAST(sum(p.pr // p.deg) AS BIGINT) AS inc
  FROM pr0 p JOIN edges e ON p.v = e.src GROUP BY e.dst
), pr1 AS (
  SELECT n.v, n.deg,
         CAST(150000000 + (85 * coalesce(c1.inc, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN c1 ON n.v = c1.dst
), c2 AS (
  SELECT e.dst, CAST(sum(p.pr // p.deg) AS BIGINT) AS inc
  FROM pr1 p JOIN edges e ON p.v = e.src GROUP BY e.dst
), pr2 AS (
  SELECT n.v, n.deg,
         CAST(150000000 + (85 * coalesce(c2.inc, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN c2 ON n.v = c2.dst
)
SELECT v AS doc_id, deg, pr AS pr_ppb FROM pr2
"""

# Hybrid RRF retrieval: sparse BM25 ranks (integer µ-unit scores) and
# dense cosine ranks fuse via integer reciprocal-rank micro-units —
# no float in the fusion; absent ranks surface as 0, never NULL.
QUERIES["hybrid_rrf_topk"] = similarity.hybrid_rrf_topk
ORACLES["hybrid_rrf_topk"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), stats AS (
  SELECT doc_id, len(toks) AS dl, toks FROM toks
), n AS (
  SELECT count(*) AS n_docs, sum(len(toks)) AS sum_dl FROM toks
), qt AS (
  SELECT doc_id AS query_id, unnest(list_distinct(toks)) AS term
  FROM stats WHERE doc_id < 5
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM (
    SELECT doc_id, dl, unnest(toks) AS term FROM stats
  ) GROUP BY 1, 2, 3
), tfq AS (
  SELECT tf.* FROM tf JOIN (SELECT DISTINCT term FROM qt) q USING (term)
), df AS (
  SELECT term, count(*) AS df_docs FROM tfq GROUP BY 1
), contrib AS (
  SELECT qt.query_id, tfq.doc_id,
         CAST(round(
           ln(1.0 + (n.n_docs - df.df_docs + 0.5) / (df.df_docs + 0.5))
           * (tfq.tf * 2.2 / (tfq.tf + 1.2 * (0.25 + 0.75 * (tfq.dl * n.n_docs) / n.sum_dl)))
           * 1000000.0) AS BIGINT) AS u
  FROM tfq JOIN df USING (term) JOIN qt USING (term) CROSS JOIN n
  WHERE tfq.doc_id <> qt.query_id
), s AS (
  SELECT query_id, doc_id, CAST(sum(u) AS BIGINT) AS s_score
  FROM contrib GROUP BY 1, 2
), sr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY s_score DESC, doc_id ASC) AS s_rnk
  FROM s QUALIFY s_rnk <= 20
), q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS doc_id, embedding AS c_emb FROM embeddings
), dsim AS (
  SELECT query_id, doc_id, {_duck_cos('q_emb', 'c_emb')} AS sim
  FROM q JOIN c ON query_id <> doc_id
), dr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id ASC) AS d_rnk
  FROM dsim QUALIFY d_rnk <= 20
), f AS (
  SELECT coalesce(sr.query_id, dr.query_id) AS query_id,
         coalesce(sr.doc_id, dr.doc_id) AS doc_id,
         CAST(coalesce(sr.s_rnk, 0) AS INTEGER) AS s_rnk,
         CAST(coalesce(dr.d_rnk, 0) AS INTEGER) AS d_rnk,
         CAST(coalesce(1000000 // (60 + sr.s_rnk), 0)
            + coalesce(1000000 // (60 + dr.d_rnk), 0) AS BIGINT) AS rrf_micro
  FROM sr FULL OUTER JOIN dr
    ON sr.query_id = dr.query_id AND sr.doc_id = dr.doc_id
)
SELECT query_id, doc_id, s_rnk, d_rnk, rrf_micro,
       row_number() OVER (PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id ASC) AS rnk
FROM f QUALIFY rnk <= 10
"""

# Negative sampling: md5-bucket draws replayed verbatim; min/arg_min
# pick the deterministic candidate per draw.
QUERIES["negative_pairs"] = similarity.negative_pairs
_NP_CAND_B = _sketch.duck_md5_slice_bucket("vec_id", 5, 256)
_NP_DRAW_B = _sketch.duck_md5_slice_bucket("(e.vec_id * 8 + j)", 1, 256)
ORACLES["negative_pairs"] = f"""
WITH e AS (
  SELECT vec_id, label FROM embeddings
), cand AS (
  SELECT vec_id AS neg_id, label AS neg_label, {_NP_CAND_B} AS bucket FROM e
), draws AS (
  SELECT e.vec_id AS anchor_id, e.label AS anchor_label, j,
         {_NP_DRAW_B} AS bucket
  FROM e, (SELECT unnest(range(1, 5)) AS j)
)
SELECT anchor_id, anchor_label, CAST(j AS INTEGER) AS j,
       min(neg_id) AS neg_id, arg_min(neg_label, neg_id) AS neg_label
FROM draws JOIN cand USING (bucket)
WHERE neg_label <> anchor_label AND neg_id <> anchor_id
GROUP BY anchor_id, anchor_label, j
"""

# Rolling anomaly: frame sums over exact integer cents; the anomaly
# predicate is the pure-integer |x−μ|>3σ inequality — z's single double
# division is for reporting only.
QUERIES["rolling_anomaly_zscore"] = timeops.rolling_anomaly_zscore
ORACLES["rolling_anomaly_zscore"] = f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
         {duck_units("value", 2)} AS x
  FROM events WHERE value IS NOT NULL
), w AS (
  SELECT event_id, user_id, ts_us, value, x,
         count(x) OVER fr AS n,
         coalesce(sum(x) OVER fr, 0) AS s,
         coalesce(sum(x * x) OVER fr, 0) AS ss
  FROM ev
  WINDOW fr AS (
    PARTITION BY user_id ORDER BY ts_us, event_id
    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING
  )
)
SELECT event_id, user_id, ts_us, value,
       CAST(n AS BIGINT) AS n_window,
       round(CASE WHEN (n * ss - s * s) > 0
                  THEN (n * x - s) / sqrt(CAST(n * ss - s * s AS DOUBLE)) END, 4) AS z,
       ((n * ss - s * s) > 0 AND (n * x - s) * (n * x - s) > 9 * (n * ss - s * s)) AS is_anomaly
FROM w WHERE n >= 5
"""

# Debounce: integer-µs burst-leader selection via one lag window.
QUERIES["debounce_events"] = timeops.debounce_events
ORACLES["debounce_events"] = """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
), g AS (
  SELECT event_id, user_id, event_type, ts_us,
         coalesce(ts_us - lag(ts_us) OVER (
           PARTITION BY user_id, event_type ORDER BY ts_us, event_id
         ), -1) AS gap_us
  FROM ev
)
SELECT event_id, user_id, event_type, ts_us, gap_us
FROM g WHERE gap_us < 0 OR gap_us >= 43200000000
"""

# OOV rate: top-V vocabulary by (count desc, token) — deterministic
# tie-break — probed with a broadcast left join; ppm is integer div.
QUERIES["oov_rate"] = text.oov_rate
ORACLES["oov_rate"] = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({_TOKS}) AS token FROM documents
), vocab AS (
  SELECT token FROM (
    SELECT token, count(*) AS n FROM tok GROUP BY token
  ) ORDER BY n DESC, token ASC LIMIT 30
), j AS (
  SELECT tok.lang, (vocab.token IS NOT NULL) AS in_vocab
  FROM tok LEFT JOIN vocab ON tok.token = vocab.token
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(CASE WHEN NOT in_vocab THEN 1 END) AS BIGINT) AS n_oov,
       (CAST(count(CASE WHEN NOT in_vocab THEN 1 END) AS BIGINT) * 1000000)
         // CAST(count(*) AS BIGINT) AS oov_ppm
FROM j GROUP BY lang
"""

# CSV round-trip: the reference's own output format proven lossless —
# explicit dialect (quoteAll + escape) on write, explicit schema on
# read; digest computed from the ORIGINAL parquet.
QUERIES["csv_roundtrip"] = corpus.csv_roundtrip
ORACLES["csv_roundtrip"] = ORACLES["jsonl_roundtrip"]

# Pareto frontier: the oracle runs the literal quadratic NOT EXISTS
# dominance; the Spark plan is the sorted running-max staircase with
# the two-phase distributed scan. Dominance compares exact cents.
QUERIES["pareto_frontier"] = relational.pareto_frontier
ORACLES["pareto_frontier"] = """
SELECT a.o_orderkey,
       CAST(CAST(a.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS order_day,
       a.o_totalprice
FROM orders a
WHERE NOT EXISTS (
  SELECT 1 FROM orders b
  WHERE (b.o_orderdate < a.o_orderdate
         AND CAST(round(b.o_totalprice * 100) AS BIGINT)
             >= CAST(round(a.o_totalprice * 100) AS BIGINT))
     OR (b.o_orderdate <= a.o_orderdate
         AND CAST(round(b.o_totalprice * 100) AS BIGINT)
             > CAST(round(a.o_totalprice * 100) AS BIGINT))
)
"""

# Cross-source n-gram containment: distinct (source, gram) relation
# self-joined on gram; integer-ppm containment.
QUERIES["source_ngram_overlap"] = text.source_ngram_overlap
ORACLES["source_ngram_overlap"] = f"""
WITH t AS (
  SELECT source, {_TOKS} AS toks FROM documents
), g AS (
  SELECT DISTINCT source,
         toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
  FROM (SELECT source, toks, unnest(range(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 3)
), sizes AS (
  SELECT source, count(*) AS n_grams_a FROM g GROUP BY source
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
  FROM g a JOIN g b USING (gram)
  GROUP BY a.source, b.source
)
SELECT src_a, src_b, n_shared, n_grams_a,
       (n_shared * 1000000) // n_grams_a AS containment_ppm
FROM inter JOIN sizes ON sizes.source = inter.src_a
WHERE src_a <> src_b
"""

# Inverted index: set-exact sharded postings, order-canonical digest.
QUERIES["posting_lists"] = text.posting_lists
ORACLES["posting_lists"] = f"""
WITH posts AS (
  SELECT DISTINCT token, doc_id // 100 AS shard, doc_id
  FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
)
SELECT token, shard, CAST(count(*) AS BIGINT) AS df_shard,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS postings_md5
FROM posts GROUP BY token, shard
"""

# HLL segment overlap: per-segment register tables, max-merged union,
# inclusion-exclusion on the rounded estimates — the oracle replays
# registers and estimate math for all three tags.
QUERIES["hll_segment_overlap"] = _sketch.hll_segment_overlap
ORACLES["hll_segment_overlap"] = """
WITH ev AS (
  SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS tag, user_id
  FROM events WHERE event_type IN ('click', 'purchase')
), hh AS (
  SELECT tag,
         (instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
       + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) AS bucket,
         ltrim(substring(h, 3, 15), '0') AS t
  FROM (SELECT tag, md5(CAST(user_id AS VARCHAR)) AS h FROM ev)
), r AS (
  SELECT tag, bucket,
         CASE WHEN t = '' THEN 61
              ELSE (15 - length(t)) * 4 +
                   CASE WHEN (instr('0123456789abcdef', substring(t, 1, 1)) - 1) >= 8 THEN 1
                        WHEN (instr('0123456789abcdef', substring(t, 1, 1)) - 1) >= 4 THEN 2
                        WHEN (instr('0123456789abcdef', substring(t, 1, 1)) - 1) >= 2 THEN 3
                        ELSE 4 END
         END AS rho
  FROM hh
), regs AS (
  SELECT tag, bucket, max(rho) AS m FROM r GROUP BY tag, bucket
), allregs AS (
  SELECT tag, bucket, m FROM regs
  UNION ALL
  SELECT 'u' AS tag, bucket, max(m) AS m FROM regs GROUP BY bucket
), acc AS (
  SELECT tag, count(*) AS n_present,
         sum(1::BIGINT << CAST(61 - m AS INTEGER)) AS s_present
  FROM allregs GROUP BY tag
), s AS (
  SELECT tag, (256 - n_present) AS n_zero,
         CAST(s_present + (256 - n_present)::HUGEINT * 2305843009213693952::HUGEINT AS DOUBLE) AS s_total
  FROM acc
), e AS (
  SELECT tag, n_zero,
         (0.7213 / (1 + 1.079 / 256.0)) * 65536.0 * 2305843009213693952.0 / s_total AS raw
  FROM s
), est AS (
  SELECT tag,
         round(CASE WHEN raw <= 640.0 AND n_zero > 0
                    THEN 256.0 * ln(256.0 / n_zero)
                    ELSE raw END, 2) AS est
  FROM e
), wide AS (
  SELECT max(CASE WHEN tag = 'a' THEN est END) AS est_a,
         max(CASE WHEN tag = 'b' THEN est END) AS est_b,
         max(CASE WHEN tag = 'u' THEN est END) AS est_union
  FROM est
), ex AS (
  SELECT count(DISTINCT CASE WHEN tag = 'a' THEN user_id END) AS n_exact_a,
         count(DISTINCT CASE WHEN tag = 'b' THEN user_id END) AS n_exact_b,
         count(DISTINCT user_id) AS n_exact_union
  FROM ev
)
SELECT est_a, est_b, est_union,
       round(est_a + est_b - est_union, 2) AS est_intersection,
       n_exact_a, n_exact_b, n_exact_union,
       n_exact_a + n_exact_b - n_exact_union AS n_exact_intersection
FROM wide, ex
"""

# DQ constraint suite: every check an exact long count; anti-join RI,
# groupBy-free uniqueness (count - count distinct), scan-predicate
# range checks.
QUERIES["dq_constraint_report"] = relational.dq_constraint_report
ORACLES["dq_constraint_report"] = """
SELECT 'pk_orders_unique' AS constraint_name,
       count(*) - count(DISTINCT o_orderkey) AS n_violations FROM orders
UNION ALL
SELECT 'pk_lineitem_unique',
       count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
UNION ALL
SELECT 'fk_orders_customer', count(*) FROM orders a
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = a.o_custkey)
UNION ALL
SELECT 'fk_lineitem_orders', count(*) FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'chk_quantity_range',
       count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) FROM lineitem
UNION ALL
SELECT 'chk_discount_range',
       count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END) FROM lineitem
UNION ALL
SELECT 'chk_shipdate_epoch',
       count(CASE WHEN l_shipdate < '1995-01-01' OR l_shipdate > '2002-12-31' THEN 1 END) FROM lineitem
UNION ALL
SELECT 'chk_totalprice_positive',
       count(CASE WHEN o_totalprice <= 0 THEN 1 END) FROM orders
"""

# BPE learn: k=3 merge rules; the oracle replays the identical
# count->argmax->greedy-replace recurrence as unrolled CTE levels.
QUERIES["bpe_learn"] = text.bpe_learn
_BPE_PAIRS = """
  SELECT arr[i] AS lhs, arr[i + 1] AS rhs, CAST(sum(freq) AS BIGINT) AS n_occ
  FROM (SELECT freq, string_split(ltrim(s, ' '), ' ') AS arr, """ + \
  """unnest(range(1, len(string_split(ltrim(s, ' '), ' ')))) AS i FROM {w})
  GROUP BY 1, 2
"""
ORACLES["bpe_learn"] = f"""
WITH words AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest({_TOKS}) AS word FROM documents) GROUP BY word
), w1 AS (
  SELECT freq, regexp_replace(word, '(.)', ' \\1', 'g') AS s FROM words
), p1 AS ({_BPE_PAIRS.format(w='w1')}
), t1 AS (
  SELECT lhs, rhs, n_occ FROM p1 ORDER BY n_occ DESC, lhs, rhs LIMIT 1
), w2 AS (
  SELECT freq, replace(s, ' ' || t.lhs || ' ' || t.rhs, ' ' || t.lhs || t.rhs) AS s
  FROM w1, t1 t
), p2 AS ({_BPE_PAIRS.format(w='w2')}
), t2 AS (
  SELECT lhs, rhs, n_occ FROM p2 ORDER BY n_occ DESC, lhs, rhs LIMIT 1
), w3 AS (
  SELECT freq, replace(s, ' ' || t.lhs || ' ' || t.rhs, ' ' || t.lhs || t.rhs) AS s
  FROM w2, t2 t
), p3 AS ({_BPE_PAIRS.format(w='w3')}
), t3 AS (
  SELECT lhs, rhs, n_occ FROM p3 ORDER BY n_occ DESC, lhs, rhs LIMIT 1
)
SELECT 1 AS step, lhs, rhs, lhs || rhs AS merged, n_occ FROM t1
UNION ALL
SELECT 2, lhs, rhs, lhs || rhs, n_occ FROM t2
UNION ALL
SELECT 3, lhs, rhs, lhs || rhs, n_occ FROM t3
"""

# --------------------------------------------------------------------------
# EXT E104-E109 — model-eval / feature-engineering tier (mlmetrics.py)
# --------------------------------------------------------------------------
from parquet_to_csv_spark.operators import mlmetrics  # noqa: E402

# Exact tie-corrected ROC AUC (Mann-Whitney). All-long rank algebra on
# the per-distinct-score relation; the final double is ONE IEEE division
# of exact longs — bit-deterministic, no rounding step needed.
QUERIES["auc_ranker"] = mlmetrics.auc_ranker
ORACLES["auc_ranker"] = """
WITH s AS (
  SELECT n_chars AS score, count(*) AS n,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p
  FROM documents GROUP BY 1
), c AS (
  SELECT score, n, p,
         sum(n) OVER (ORDER BY score
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
  FROM s
), t AS (
  SELECT CAST(sum(p) AS BIGINT) AS pos_n,
         CAST(sum(n) - sum(p) AS BIGINT) AS neg_n,
         CAST(sum(p * (2 * (cum_n - n) + n + 1)) AS BIGINT) AS s2
  FROM c
)
SELECT pos_n, neg_n,
       CAST((s2 - pos_n * (pos_n + 1)) * 1000000 // (2 * pos_n * neg_n) AS BIGINT)
         AS auc_ppm,
       CAST(s2 - pos_n * (pos_n + 1) AS DOUBLE)
         / CAST(2 * pos_n * neg_n AS DOUBLE) AS auc
FROM t
"""

# RFM quintile grid. ntile(5) over UNIQUE (metric, custkey) orders —
# identical first-buckets-get-the-remainder semantics in both engines.
QUERIES["rfm_segments"] = mlmetrics.rfm_segments
ORACLES["rfm_segments"] = f"""
WITH per AS (
  SELECT o_custkey,
         max(epoch_us(o_orderdate) // 86400000000) AS last_day,
         count(*) AS freq,
         sum({duck_units('o_totalprice', 2)}) AS mon_cents
  FROM orders GROUP BY 1
), g AS (SELECT max(last_day) AS g_day FROM per
), t AS (
  SELECT ntile(5) OVER (ORDER BY g_day - last_day, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY freq, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY mon_cents, o_custkey) AS m_score,
         mon_cents
  FROM per, g
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(mon_cents) AS BIGINT) AS cell_cents
FROM t GROUP BY 1, 2, 3
"""

# Gini: exact long numerator/denominator, one correctly-rounded double
# division — deterministic without ppm rounding. The oracle ranks with
# a plain window; the engine uses the two-phase distributed prefix sum.
QUERIES["gini_revenue"] = mlmetrics.gini_revenue
ORACLES["gini_revenue"] = f"""
WITH per AS (
  SELECT o_custkey, sum({duck_units('o_totalprice', 2)}) AS cents
  FROM orders GROUP BY 1
), r AS (
  SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS i FROM per
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(sum(i * cents) AS BIGINT) AS s_ix
  FROM r
)
SELECT n_customers, total_cents,
       CAST(2 * s_ix - (n_customers + 1) * total_cents AS DOUBLE)
         / CAST(n_customers * total_cents AS DOUBLE) AS gini
FROM t
"""

# Leave-one-out target encoding; floored division of non-negative longs.
QUERIES["target_encoding_loo"] = mlmetrics.target_encoding_loo
ORACLES["target_encoding_loo"] = f"""
WITH per AS (
  SELECT o_custkey, count(*) AS n_orders,
         sum({duck_units('o_totalprice', 2)}) AS own_cents
  FROM orders GROUP BY 1
), j AS (
  SELECT o_custkey, c_mktsegment, n_orders, own_cents
  FROM per JOIN customer ON o_custkey = c_custkey
), seg AS (
  SELECT c_mktsegment, sum(n_orders) AS seg_orders, sum(own_cents) AS seg_cents
  FROM j GROUP BY 1
)
SELECT j.o_custkey, j.c_mktsegment, j.n_orders,
       CASE WHEN seg.seg_orders > j.n_orders
            THEN CAST((seg.seg_cents - j.own_cents)
                      // (seg.seg_orders - j.n_orders) AS BIGINT)
       END AS loo_avg_cents
FROM j JOIN seg ON j.c_mktsegment = seg.c_mktsegment
"""

# Per-user entropy in integer micro-nats (unigram-LM ln convention) +
# relational mode (max count, min type tie-break — replayed verbatim).
QUERIES["user_event_entropy"] = mlmetrics.user_event_entropy
ORACLES["user_event_entropy"] = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
), t AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
         CAST(count(*) AS BIGINT) AS n_types
  FROM c GROUP BY 1
), e AS (
  SELECT c.user_id, t.n_events, t.n_types,
         CAST(sum(c.c * CAST(round(ln(CAST(c.c AS DOUBLE) / t.n_events) * -1e6, 0)
                             AS BIGINT)) AS BIGINT) AS sum_units
  FROM c JOIN t ON c.user_id = t.user_id
  GROUP BY 1, 2, 3
), mx AS (
  SELECT user_id, max(c) AS mx FROM c GROUP BY 1
), md AS (
  SELECT c.user_id, min(c.event_type) AS mode_type
  FROM c JOIN mx ON c.user_id = mx.user_id AND c.c = mx.mx
  GROUP BY 1
)
SELECT e.user_id, e.n_events, e.n_types, md.mode_type,
       CAST(e.sum_units // e.n_events AS BIGINT) AS entropy_unats
FROM e JOIN md ON e.user_id = md.user_id
"""

# Trailing-window point-in-time features; the oracle keeps the literal
# correlated time-range counts the banded join decorrelates.
QUERIES["trailing_window_features"] = mlmetrics.trailing_window_features
ORACLES["trailing_window_features"] = """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(ts) AS c_ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts_us,
       CAST((SELECT count(*) FROM c
             WHERE c.user_id = p.user_id
               AND c.c_ts >= p.ts_us - 86400000000
               AND c.c_ts < p.ts_us) AS BIGINT) AS clicks_24h,
       CAST((SELECT count(*) FROM c
             WHERE c.user_id = p.user_id
               AND c.c_ts >= p.ts_us - 3600000000
               AND c.c_ts < p.ts_us) AS BIGINT) AS clicks_1h
FROM p
"""

# --------------------------------------------------------------------------
# EXT E110-E113 — collocations, leakage audit, feature hashing, gap-fill
# --------------------------------------------------------------------------
from parquet_to_csv_spark.operators.corpus import duck_md5_bucket  # noqa: E402

# PMI collocations: per-count integer micro-nats assembled additively —
# exact long algebra, no float products; (pmi, w1, w2) total order.
QUERIES["pmi_bigrams"] = text.pmi_bigrams
_UNATS = "CAST(round(ln(CAST({c} AS DOUBLE)) * 1e6, 0) AS BIGINT)"
ORACLES["pmi_bigrams"] = f"""
WITH t AS (
  SELECT {_TOKS} AS toks FROM documents
), bi AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2, CAST(count(*) AS BIGINT) AS n_xy
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2)
  GROUP BY 1, 2
), uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n_w
  FROM (SELECT unnest({_TOKS}) AS w FROM documents) GROUP BY 1
), tb AS (SELECT CAST(sum(n_xy) AS BIGINT) AS t_bi FROM bi
), tu AS (SELECT CAST(sum(n_w) AS BIGINT) AS t_uni FROM uni
)
SELECT w1, w2, n_xy,
       {_UNATS.format(c='n_xy')} + 2 * {_UNATS.format(c='t_uni')}
         - {_UNATS.format(c='t_bi')} - {_UNATS.format(c='x.n_w')}
         - {_UNATS.format(c='y.n_w')} AS pmi_unats
FROM bi
JOIN uni x ON bi.w1 = x.w
JOIN uni y ON bi.w2 = y.w
CROSS JOIN tb CROSS JOIN tu
WHERE n_xy >= 5
ORDER BY pmi_unats DESC, w1, w2
LIMIT 20
"""

# Hashing-trick vectorizer: md5-bucket index/sign, order-canonical
# sparse-vector digest (posting_lists convention).
QUERIES["feature_hashing"] = text.feature_hashing
