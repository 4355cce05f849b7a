"""Registry segment 6/13 — mechanically split from the
round-4 plans/registry.py (12k lines). QUERIES insertion order is
load-bearing (the driver's correctness window samples the first 50
entries), so each segment imports its predecessor: importing ANY
segment executes the full prefix in the original order.
"""
from __future__ import annotations

from parquet_to_csv_spark.plans.registry_core import (QUERIES, ORACLES, query)  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts import p05 as _prev_segment  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p01 import (  # noqa: F401
    _TOKS,
    _duck_cos,
    dedup,
    duck_units,
    multimodal,
    relational,
    similarity,
    timeops,
)
from parquet_to_csv_spark.plans.registry_parts.p02 import (  # noqa: F401
    _D_PII_AUG,
    _sim,
    _stream,
    corpus,
)
from parquet_to_csv_spark.plans.registry_parts.p03 import mlmetrics  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p04 import _text  # noqa: F401

ORACLES["taint_closure_report"] = f"""
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
), members AS (
  SELECT cc.v AS doc_id, min(cc.l) AS cluster_id FROM cc GROUP BY cc.v
), flagged AS (
  SELECT m.cluster_id,
         CASE WHEN d.source LIKE '%3' THEN 1 ELSE 0 END AS tainted
  FROM members m JOIN documents d USING (doc_id)
)
SELECT cluster_id, count(*) AS n_docs,
       sum(tainted) AS n_tainted_direct,
       count(*) - sum(tainted) AS n_tainted_via_closure
FROM flagged GROUP BY cluster_id
HAVING max(tainted) = 1
"""

# --------------------------------------------------------------------------
# EXT E179-E180 — source centroid distances, document novelty
# --------------------------------------------------------------------------

QUERIES["source_centroid_distances"] = _sim.source_centroid_distances
ORACLES["source_centroid_distances"] = """
WITH ex AS (
  SELECT d.source, u.pos - 1 AS pos, u.val
  FROM embeddings e
  JOIN documents d ON d.doc_id = e.vec_id,
       LATERAL (SELECT unnest(generate_series(1, len(e.embedding))) AS pos,
                       unnest(e.embedding) AS val) u
), cent AS (
  SELECT source, pos,
         round(CAST(sum(CAST(val AS DECIMAL(27,10))) AS DOUBLE) / count(*), 6)
           AS mu
  FROM ex GROUP BY 1, 2
)
SELECT a.source AS source_a, b.source AS source_b,
       sum(CAST(round((a.mu - b.mu) * 1000000) AS BIGINT)
           * CAST(round((a.mu - b.mu) * 1000000) AS BIGINT)) AS dist_sq_e12
FROM cent a JOIN cent b ON a.pos = b.pos AND a.source < b.source
GROUP BY 1, 2
"""

QUERIES["novelty_scores"] = dedup.novelty_scores
ORACLES["novelty_scores"] = f"""
WITH t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(len(list_intersect(a.toks, b.toks))
               / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4)
           AS jaccard
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.5
), charged AS (
  SELECT greatest(doc_a, doc_b) AS doc_id, least(doc_a, doc_b) AS earlier_doc,
         CAST(round(jaccard * 1000) AS BIGINT) AS j_milli
  FROM pairs
), ranked AS (
  SELECT doc_id, earlier_doc, j_milli,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY j_milli DESC, earlier_doc ASC) AS rn,
         count(*) OVER (PARTITION BY doc_id) AS n_matches,
         max(j_milli) OVER (PARTITION BY doc_id) AS mx
  FROM charged
)
SELECT doc_id, earlier_doc AS nearest_earlier, n_matches AS n_earlier_matches,
       1000 - mx AS novelty_milli
FROM ranked WHERE rn = 1
"""

# --------------------------------------------------------------------------
# EXT E181-E182 — fold AUC variance, packing-efficiency table
# --------------------------------------------------------------------------

QUERIES["fold_auc_variance"] = mlmetrics.fold_auc_variance
ORACLES["fold_auc_variance"] = f"""
WITH by_score AS (
  SELECT CAST({corpus.duck_md5_bucket("doc_id", 1000)} % 5 AS BIGINT) AS fold,
         n_chars AS score, count(*) AS n,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p
  FROM documents GROUP BY 1, 2
), ranked AS (
  SELECT fold, score, n, p,
         sum(n) OVER (PARTITION BY fold ORDER BY score
                      ROWS UNBOUNDED PRECEDING) AS cum_n
  FROM by_score
), per_fold AS (
  SELECT fold, sum(p) AS pos_n, sum(n) - sum(p) AS neg_n,
         sum(p * (2 * (cum_n - n) + n + 1)) AS s2
  FROM ranked GROUP BY fold
), aucs AS (
  SELECT fold, pos_n, neg_n,
         (s2 - pos_n * (pos_n + 1)) * 1000000 // (2 * pos_n * neg_n) AS auc_ppm
  FROM per_fold
), m AS (
  SELECT sum(auc_ppm) // 5 AS mean_auc_ppm FROM aucs
)
SELECT fold, pos_n, neg_n, auc_ppm, auc_ppm - mean_auc_ppm AS dev_ppm
FROM aucs, m
"""

QUERIES["packing_efficiency"] = corpus.packing_efficiency
ORACLES["packing_efficiency"] = f"""
WITH base AS (
  SELECT CAST(len({_TOKS}) AS BIGINT) AS nt FROM documents
  WHERE len({_TOKS}) > 0
), wide AS (
  SELECT count(*) AS n_docs, sum(nt) AS total_tokens,
         sum((nt + 127) // 128) AS pad128,
         sum((nt + 255) // 256) AS pad256,
         sum((nt + 511) // 512) AS pad512
  FROM base
)
SELECT 128 AS ctx_len, n_docs, total_tokens, pad128 AS padded_seqs,
       (total_tokens + 127) // 128 AS packed_seqs,
       (pad128 * 128 - total_tokens) * 1000000 // (pad128 * 128) AS padded_waste_ppm,
       (((total_tokens + 127) // 128) * 128 - total_tokens) * 1000000
         // (((total_tokens + 127) // 128) * 128) AS packed_waste_ppm
FROM wide
UNION ALL
SELECT 256, n_docs, total_tokens, pad256,
       (total_tokens + 255) // 256,
       (pad256 * 256 - total_tokens) * 1000000 // (pad256 * 256),
       (((total_tokens + 255) // 256) * 256 - total_tokens) * 1000000
         // (((total_tokens + 255) // 256) * 256)
FROM wide
UNION ALL
SELECT 512, n_docs, total_tokens, pad512,
       (total_tokens + 511) // 512,
       (pad512 * 512 - total_tokens) * 1000000 // (pad512 * 512),
       (((total_tokens + 511) // 512) * 512 - total_tokens) * 1000000
         // (((total_tokens + 511) // 512) * 512)
FROM wide
"""

# --------------------------------------------------------------------------
# EXT E183-E184 — cluster-quality index, transition dwell percentiles
# --------------------------------------------------------------------------

_CQ_DSQ = (
    "list_sum(list_transform(list_zip(e.embedding, c.cent_emb),"
    " p -> CAST(round((CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * 1000000) AS BIGINT)"
    " * CAST(round((CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * 1000000) AS BIGINT)))"
)

QUERIES["cluster_quality_index"] = _sim.cluster_quality_index
ORACLES["cluster_quality_index"] = f"""
WITH cents AS (
  SELECT vec_id AS cell_id, embedding AS cent_emb FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT e.vec_id, c.cell_id,
         {_duck_cos('e.embedding', 'c.cent_emb')} AS cs,
         {_CQ_DSQ} AS dsq
  FROM embeddings e CROSS JOIN cents c
), asg AS (
  SELECT vec_id, cell_id AS cell FROM (
    SELECT vec_id, cell_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cs DESC, cell_id ASC) AS rn
    FROM scored
  ) WHERE rn = 1
), per_member AS (
  SELECT s.vec_id, a.cell,
         max(CASE WHEN s.cell_id = a.cell THEN s.dsq END) AS own_dsq,
         min(CASE WHEN s.cell_id <> a.cell THEN s.dsq END) AS other_dsq
  FROM scored s JOIN asg a USING (vec_id)
  GROUP BY 1, 2
)
SELECT cell, count(*) AS n_members,
       sum(own_dsq) // count(*) AS mean_own_dsq_e12,
       sum(other_dsq) // count(*) AS mean_other_dsq_e12,
       (sum(own_dsq) // count(*)) * 1000000
         // (sum(other_dsq) // count(*)) AS separation_ppm
FROM per_member GROUP BY cell
"""

QUERIES["transition_dwell_percentiles"] = timeops.transition_dwell_percentiles
ORACLES["transition_dwell_percentiles"] = """
WITH gaps AS (
  SELECT lag(event_type) OVER w AS prev_type, event_type AS next_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER w) // 1000000 AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), f AS (
  SELECT prev_type, next_type, gap_s FROM gaps WHERE prev_type IS NOT NULL
), ranked AS (
  SELECT prev_type, next_type, gap_s,
         row_number() OVER (PARTITION BY prev_type, next_type
                            ORDER BY gap_s) AS rn,
         count(*) OVER (PARTITION BY prev_type, next_type) AS n
  FROM f
)
SELECT prev_type, next_type, max(n) AS n_transitions,
       max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1
                THEN gap_s END) AS p50_gap_s,
       max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 1
                THEN gap_s END) AS p90_gap_s
FROM ranked GROUP BY prev_type, next_type
"""

# --------------------------------------------------------------------------
# EXT E185-E186 — region share-of-total, token rank movers
# --------------------------------------------------------------------------

QUERIES["region_share_report"] = relational.region_share_report
ORACLES["region_share_report"] = f"""
WITH per AS (
  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym, r.r_name,
         sum({duck_units("o_totalprice", 2)}) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
), month_tot AS (
  SELECT ym, sum(cents) AS m_total FROM per GROUP BY ym
), cum AS (
  SELECT ym, r_name, cents,
         sum(cents) OVER (PARTITION BY r_name ORDER BY ym
                          ROWS UNBOUNDED PRECEDING) AS cum_cents
  FROM per
), grand AS (
  SELECT ym, m_total,
         sum(m_total) OVER (ORDER BY ym
                            RANGE UNBOUNDED PRECEDING) AS cum_total
  FROM month_tot
)
SELECT cum.ym, r_name, cents,
       cents * 1000000 // m_total AS month_share_ppm,
       cum_cents * 1000000 // cum_total AS ytd_share_ppm
FROM cum JOIN grand ON cum.ym = grand.ym
"""

QUERIES["token_rank_movers"] = _text.token_rank_movers
ORACLES["token_rank_movers"] = f"""
WITH mid AS (
  SELECT (min(doc_id) + max(doc_id) + 1) // 2 AS mid FROM documents
), toks AS (
  SELECT CASE WHEN doc_id >= mid THEN 1 ELSE 0 END AS late,
         unnest({_TOKS}) AS token
  FROM documents, mid
), counts AS (
  SELECT late, token, count(*) AS freq FROM toks GROUP BY 1, 2
), ranked AS (
  SELECT late, token, freq,
         row_number() OVER (PARTITION BY late
                            ORDER BY freq DESC, token ASC) AS rnk
  FROM counts
), joined AS (
  SELECT a.token, a.rnk AS rank_early, b.rnk AS rank_late,
         a.freq AS freq_early, b.freq AS freq_late
  FROM ranked a JOIN ranked b ON a.token = b.token
  WHERE a.late = 0 AND b.late = 1
), movers AS (
  SELECT token, rank_early, rank_late, rank_late - rank_early AS rank_delta,
         freq_early, freq_late,
         row_number() OVER (ORDER BY abs(rank_early - rank_late) DESC,
                            token ASC) AS mover_rnk
  FROM joined
)
SELECT token, rank_early, rank_late, rank_delta, freq_early, freq_late,
       mover_rnk
FROM movers WHERE mover_rnk <= 20
"""

# --------------------------------------------------------------------------
# EXT E187-E188 — annotation-batch sampler, shared-frame payload pairs
# --------------------------------------------------------------------------

QUERIES["annotation_batch"] = dedup.annotation_batch
ORACLES["annotation_batch"] = f"""
WITH t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(len(list_intersect(a.toks, b.toks))
               / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4)
           AS jaccard
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.5
), banded AS (
  SELECT doc_a, doc_b,
         CAST(round(jaccard * 1000) AS BIGINT) AS j_milli,
         CAST(round(jaccard * 1000) AS BIGINT) // 100 AS band
  FROM pairs
), ranked AS (
  SELECT band, doc_a, doc_b, j_milli,
         row_number() OVER (
           PARTITION BY band
           ORDER BY md5(CAST(doc_a AS VARCHAR) || ':' || CAST(doc_b AS VARCHAR)),
                    doc_a, doc_b
         ) AS sample_rank
  FROM banded
)
SELECT band, doc_a, doc_b, j_milli, sample_rank
FROM ranked WHERE sample_rank <= 3
"""

QUERIES["shared_frame_pairs"] = multimodal.shared_frame_pairs
ORACLES["shared_frame_pairs"] = """
WITH frames AS (
  SELECT doc_id, u.i AS frame_idx,
         md5(substring(text, u.i * 64 + 1, 64)) AS frame_md5
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0,
                  CAST((strlen(text) + 63) // 64 AS INTEGER) - 1, 2)) AS i) u
  WHERE strlen(text) > 0
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_frames
FROM frames a JOIN frames b
  ON a.frame_md5 = b.frame_md5 AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# EXT E189-E190 — typed JSON promotion, join fan-out estimator
# --------------------------------------------------------------------------

from parquet_to_csv_spark.operators import semistruct as _semistruct  # noqa: E402

QUERIES["props_typed_promotion"] = _semistruct.props_typed_promotion
ORACLES["props_typed_promotion"] = """
WITH parsed AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
), health AS (
  SELECT sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS n_unparsed FROM parsed
)
SELECT event_type, k // 10 AS k_band, count(*) AS n_events, n_unparsed
FROM parsed, health
WHERE k IS NOT NULL
GROUP BY 1, 2, 4
"""

QUERIES["join_fanout_estimate"] = relational.join_fanout_estimate
ORACLES["join_fanout_estimate"] = """
WITH ca AS (
  SELECT o_orderkey AS k, count(*) AS ca FROM orders GROUP BY 1
), cb AS (
  SELECT l_orderkey AS k, count(*) AS cb FROM lineitem GROUP BY 1
)
SELECT count(*) AS n_matching_keys,
       sum(ca * cb) AS est_join_rows,
       max(ca * cb) AS max_key_fanout,
       sum(ca * cb) * 1000 // count(*) AS avg_fanout_milli
FROM ca JOIN cb USING (k)
"""

# --------------------------------------------------------------------------
# EXT E191-E192 — blocklist screening, release manifest capstone
# --------------------------------------------------------------------------

_DUCK_BL = "['spam', 'dup', 'slow']"

QUERIES["blocklist_screen"] = corpus.blocklist_screen
ORACLES["blocklist_screen"] = f"""
WITH base AS (
  SELECT source,
         len(list_intersect({_TOKS}, {_DUCK_BL})) AS n_distinct_hits,
         len(list_filter({_TOKS}, t -> list_contains({_DUCK_BL}, t)))
           AS n_hit_tokens
  FROM documents
)
SELECT source, count(*) AS n_docs,
       sum(CASE WHEN n_distinct_hits > 0 THEN 1 ELSE 0 END) AS n_flagged,
       sum(n_hit_tokens) AS total_hits,
       sum(CASE WHEN n_distinct_hits > 0 THEN 1 ELSE 0 END) * 1000000
         // count(*) AS flagged_ppm
FROM base GROUP BY source
"""

QUERIES["release_manifest"] = corpus.release_manifest
ORACLES["release_manifest"] = f"""
WITH text_stats AS (
  SELECT count(*) AS n_docs,
         sum(len({_TOKS})) AS n_tokens,
         count(DISTINCT sha256(text)) AS n_unique,
         sum(CASE WHEN len({_TOKS}) >= 5
                   AND len(list_distinct({_TOKS}))
                       / CAST(len({_TOKS}) AS DOUBLE) >= 0.3
                   AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       / CAST(length(text) AS DOUBLE) >= 0.5
                  THEN 1 ELSE 0 END) AS n_quality_ok,
         sum(CASE WHEN len(list_intersect({_TOKS}, {_DUCK_BL})) > 0
                  THEN 1 ELSE 0 END) AS n_blocklisted
  FROM documents
), pii AS (
  SELECT count(*) AS n_pii_docs FROM (
    SELECT doc_id FROM (SELECT doc_id, {_D_PII_AUG} AS aug FROM documents)
    WHERE len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
        + len(regexp_extract_all(aug, '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b'))
        + len(regexp_extract_all(aug, '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b'))
        + len(regexp_extract_all(aug, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) > 0
  )
), k_risk AS (
  SELECT sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS n_k5_risk_docs FROM (
    SELECT count(*) AS sz FROM documents
    GROUP BY lang, source, n_chars // 100
  )
)
SELECT n_docs, n_tokens,
       (n_docs - n_unique) * 1000000 // n_docs AS dup_ppm,
       n_quality_ok * 1000000 // n_docs AS quality_ok_ppm,
       n_pii_docs * 1000000 // n_docs AS pii_ppm,
       n_blocklisted * 1000000 // n_docs AS blocklist_ppm,
       n_k5_risk_docs * 1000000 // n_docs AS k5_risk_ppm
FROM text_stats, pii, k_risk
"""

# --------------------------------------------------------------------------
# EXT E193-E194 — discount elasticity, supplier lead-time variability
# --------------------------------------------------------------------------

QUERIES["discount_elasticity"] = relational.discount_elasticity
ORACLES["discount_elasticity"] = f"""
WITH per AS (
  SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
         count(*) AS n_lines,
         sum({duck_units("l_quantity", 2)}) AS qsum
  FROM lineitem GROUP BY 1
), base AS (
  SELECT n_lines AS b_n, qsum AS b_q FROM per WHERE disc_pct = 0
)
SELECT disc_pct, n_lines,
       qsum * 10 // n_lines AS avg_qty_milli,
       (qsum * b_n) * 1000000 // (b_q * n_lines) AS lift_vs_base_ppm
FROM per, base
"""

QUERIES["supplier_leadtime_variability"] = relational.supplier_leadtime_variability
ORACLES["supplier_leadtime_variability"] = """
WITH lag AS (
  SELECT l_suppkey,
         epoch_ms(l_shipdate) // 86400000 - epoch_ms(o_orderdate) // 86400000
           AS lag
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), s AS (
  SELECT l_suppkey, count(*) AS n, sum(lag) AS sx, sum(lag * lag) AS sxx
  FROM lag GROUP BY l_suppkey
)
SELECT l_suppkey, n,
       sx * 1000 // n AS mean_lag_milli,
       (n * sxx - sx * sx) * 1000 // (n * n) AS var_milli
FROM s WHERE n >= 2
ORDER BY var_milli DESC, l_suppkey ASC
LIMIT 15
"""

# --------------------------------------------------------------------------
# EXT E195-E196 — Markov prediction backtest, QQ mapping table
# --------------------------------------------------------------------------

QUERIES["markov_prediction_accuracy"] = mlmetrics.markov_prediction_accuracy
ORACLES["markov_prediction_accuracy"] = """
WITH seq AS (
  SELECT user_id, event_type AS nxt,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), pairs AS (
  SELECT prev, nxt FROM seq WHERE prev IS NOT NULL
), trans AS (
  SELECT prev, nxt, count(*) AS c FROM pairs GROUP BY 1, 2
), pred AS (
  SELECT prev, nxt AS predicted, c AS top_c, n_transitions FROM (
    SELECT prev, nxt, c, sum(c) OVER (PARTITION BY prev) AS n_transitions,
           row_number() OVER (PARTITION BY prev
                              ORDER BY c DESC, nxt DESC) AS rn
    FROM trans
  ) WHERE rn = 1
), g AS (
  SELECT nxt AS g_pred FROM (
    SELECT nxt, count(*) AS gc,
           row_number() OVER (ORDER BY count(*) DESC, nxt DESC) AS rn
    FROM pairs GROUP BY nxt
  ) WHERE rn = 1
), base_hits AS (
  SELECT prev, sum(CASE WHEN nxt = g_pred THEN 1 ELSE 0 END) AS n_base_hits
  FROM pairs, g GROUP BY prev
)
SELECT pred.prev, predicted, n_transitions,
       top_c * 1000000 // n_transitions AS accuracy_ppm,
       n_base_hits * 1000000 // n_transitions AS baseline_ppm,
       top_c * 1000000 // n_transitions
         - n_base_hits * 1000000 // n_transitions AS lift_ppm
FROM pred JOIN base_hits ON pred.prev = base_hits.prev
"""

QUERIES["value_qq_table"] = mlmetrics.value_qq_table
ORACLES["value_qq_table"] = f"""
WITH ranked AS (
  SELECT event_type, {duck_units("value", 2)} AS cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY {duck_units("value", 2)}) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE event_type IN ('view', 'purchase')
), picks AS (
  SELECT event_type, q.d AS decile,
         max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * (q.d / 10.0))
                                 AS BIGINT) + 1 THEN cents END) AS v
  FROM ranked, LATERAL (SELECT unnest(generate_series(1, 9)) AS d) q
  GROUP BY 1, 2
)
SELECT a.decile, a.v AS view_cents, b.v AS purchase_cents,
       b.v * 1000000 // a.v AS ratio_ppm
FROM picks a JOIN picks b ON a.decile = b.decile
WHERE a.event_type = 'view' AND b.event_type = 'purchase'
"""

# --------------------------------------------------------------------------
# EXT E197-E198 — curation ledger, filter-selectivity advisor
# --------------------------------------------------------------------------

QUERIES["curation_ledger"] = corpus.curation_ledger
ORACLES["curation_ledger"] = f"""
WITH base AS (
  SELECT doc_id, sha256(text) AS h,
         CASE WHEN len({_TOKS}) >= 5
               AND len(list_distinct({_TOKS}))
                   / CAST(len({_TOKS}) AS DOUBLE) >= 0.3
              THEN 1 ELSE 0 END AS q,
         CASE WHEN {corpus.duck_md5_bucket("doc_id", 100)} < 50
              THEN 1 ELSE 0 END AS samp
  FROM documents
), keeps AS (
  SELECT h, min(doc_id) AS keep_id FROM base WHERE q = 1 GROUP BY h
), flagged AS (
  SELECT b.q, b.samp,
         CASE WHEN k.keep_id IS NOT NULL THEN 1 ELSE 0 END AS survivor
  FROM base b LEFT JOIN keeps k ON b.h = k.h AND b.doc_id = k.keep_id
), wide AS (
  SELECT count(*) AS n_raw, sum(q) AS n_quality,
         sum(survivor) AS n_deduped,
         sum(survivor * samp) AS n_sampled
  FROM flagged
)
SELECT 1 AS stage, 'raw' AS stage_name, n_raw AS n_docs,
       1000000 AS retained_ppm FROM wide
UNION ALL
SELECT 2, 'quality', n_quality, n_quality * 1000000 // n_raw FROM wide
UNION ALL
SELECT 3, 'deduped', n_deduped, n_deduped * 1000000 // n_quality FROM wide
UNION ALL
SELECT 4, 'sampled', n_sampled, n_sampled * 1000000 // n_deduped FROM wide
"""

QUERIES["filter_selectivity_advisor"] = corpus.filter_selectivity_advisor
ORACLES["filter_selectivity_advisor"] = f"""
WITH wide AS (
  SELECT count(*) AS n,
         sum(CASE WHEN len({_TOKS}) >= 5 THEN 1 ELSE 0 END) AS pa,
         sum(CASE WHEN len({_TOKS}) > 0
                   AND len(list_distinct({_TOKS}))
                       / CAST(len({_TOKS}) AS DOUBLE) >= 0.3
                  THEN 1 ELSE 0 END) AS pb,
         sum(CASE WHEN length(text) > 0
                   AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       / CAST(length(text) AS DOUBLE) >= 0.5
                  THEN 1 ELSE 0 END) AS pc,
         sum(CASE WHEN len({_TOKS}) >= 5
                   AND len(list_distinct({_TOKS}))
                       / CAST(len({_TOKS}) AS DOUBLE) >= 0.3
                   AND length(text) > 0
                   AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       / CAST(length(text) AS DOUBLE) >= 0.5
                  THEN 1 ELSE 0 END) AS pall
  FROM documents
)
SELECT 'min_tokens' AS predicate, pa * 1000000 // n AS pass_ppm,
       'token_count' AS cost_class FROM wide
UNION ALL
SELECT 'unique_ratio', pb * 1000000 // n, 'array_distinct' FROM wide
UNION ALL
SELECT 'alpha_ratio', pc * 1000000 // n, 'regex' FROM wide
UNION ALL
SELECT 'ALL', pall * 1000000 // n, 'conjunction' FROM wide
"""

# --------------------------------------------------------------------------
# EXT E199-E200 — embedding-norm audit, length-bias audit
# --------------------------------------------------------------------------

QUERIES["embedding_norm_audit"] = _sim.embedding_norm_audit
ORACLES["embedding_norm_audit"] = """
WITH banded AS (
  SELECT CAST(floor(sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 10.0)
              AS BIGINT) AS norm_band,
         CASE WHEN sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0.0
              THEN 1 ELSE 0 END AS is_zero
  FROM embeddings
), tot AS (
  SELECT count(*) AS n_total FROM banded
)
SELECT norm_band, count(*) AS n_vectors, sum(is_zero) AS n_zero,
       count(*) * 1000000 // n_total AS share_ppm
FROM banded, tot GROUP BY norm_band, n_total
"""

QUERIES["length_bias_audit"] = corpus.length_bias_audit
ORACLES["length_bias_audit"] = f"""
WITH base AS (
  SELECT len({_TOKS}) // 20 AS len_band,
         CASE WHEN len({_TOKS}) >= 5
               AND len(list_distinct({_TOKS}))
                   / CAST(len({_TOKS}) AS DOUBLE) >= 0.3
               AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   / CAST(length(text) AS DOUBLE) >= 0.5
              THEN 1 ELSE 0 END AS ok
  FROM documents
), tot AS (
  SELECT sum(ok) AS n_ok_total FROM base
)
SELECT len_band, count(*) AS n_docs, sum(ok) AS n_pass,
       sum(ok) * 1000000 // count(*) AS pass_ppm,
       sum(ok) * 1000000 // n_ok_total AS share_of_pass_ppm
FROM base, tot GROUP BY len_band, n_ok_total
"""

# --------------------------------------------------------------------------
# EXT E201-E202 — cluster-size distribution, sampler representativeness
# --------------------------------------------------------------------------

QUERIES["cluster_size_distribution"] = dedup.cluster_size_distribution
ORACLES["cluster_size_distribution"] = f"""
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
), members AS (
  SELECT v, min(l) AS cluster_id FROM cc GROUP BY v
), sizes AS (
  SELECT cluster_id, count(*) AS sz FROM members GROUP BY cluster_id
), tot AS (
  SELECT sum(sz) AS n_clustered FROM sizes
)
SELECT sz AS cluster_size, count(*) AS n_clusters,
       sz * count(*) AS n_docs,
       sz * count(*) * 1000000 // n_clustered AS doc_share_ppm
FROM sizes, tot GROUP BY sz, n_clustered
"""

QUERIES["sampler_representativeness"] = corpus.sampler_representativeness
ORACLES["sampler_representativeness"] = f"""
WITH base AS (
  SELECT lang, source,
         CASE WHEN {corpus.duck_md5_bucket("doc_id", 100)} < 10
              THEN 1 ELSE 0 END AS s
  FROM documents
), tot AS (
  SELECT count(*) AS n_total, sum(s) AS n_sample FROM base
)
SELECT lang, source, count(*) AS n_pop, sum(s) AS n_samp,
       count(*) * 1000000 // n_total AS pop_share_ppm,
       CASE WHEN n_sample > 0 THEN sum(s) * 1000000 // n_sample
            ELSE 0 END AS samp_share_ppm,
       CASE WHEN n_sample > 0 THEN sum(s) * 1000000 // n_sample
            ELSE 0 END - count(*) * 1000000 // n_total AS dev_ppm
FROM base, tot GROUP BY lang, source, n_total, n_sample
"""

# --------------------------------------------------------------------------
# EXT E203-E204 — vocabulary growth curve, return-rate leaders
# --------------------------------------------------------------------------

QUERIES["vocab_growth_curve"] = _text.vocab_growth_curve
ORACLES["vocab_growth_curve"] = f"""
WITH span AS (
  SELECT min(doc_id) AS lo, max(doc_id) + 1 AS hi FROM documents
), pairs AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
), firsts AS (
  SELECT token, min(doc_id) AS first_doc FROM pairs GROUP BY token
), new_types AS (
  SELECT least((first_doc - lo) * 10 // (hi - lo), 9) AS decile,
         count(*) AS n_new_types
  FROM firsts, span GROUP BY 1
), tokens_per AS (
  SELECT least((doc_id - lo) * 10 // (hi - lo), 9) AS decile,
         count(*) AS n_tokens
  FROM pairs, span GROUP BY 1
), joined AS (
  SELECT coalesce(n.decile, t.decile) AS decile,
         coalesce(n_new_types, 0) AS n_new_types,
         coalesce(n_tokens, 0) AS n_tokens
  FROM new_types n FULL JOIN tokens_per t ON n.decile = t.decile
)
SELECT decile, n_new_types, n_tokens,
       sum(n_new_types) OVER (ORDER BY decile
                              ROWS UNBOUNDED PRECEDING) AS vocab_size,
       sum(n_tokens) OVER (ORDER BY decile
                           ROWS UNBOUNDED PRECEDING) AS cum_tokens
FROM joined
"""

QUERIES["return_rate_leaders"] = relational.return_rate_leaders
ORACLES["return_rate_leaders"] = """
WITH per AS (
  SELECT l_partkey, count(*) AS n_lines,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, n_lines, n_returned,
       n_returned * 1000000 // n_lines AS return_ppm
FROM per WHERE n_lines >= 5
ORDER BY return_ppm DESC, l_partkey ASC
LIMIT 15
"""

# --------------------------------------------------------------------------
# EXT E205-E206 — canonical quality gap, engagement-conversion curve
# --------------------------------------------------------------------------

QUERIES["canonical_quality_gap"] = dedup.canonical_quality_gap
ORACLES["canonical_quality_gap"] = f"""
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
), members AS (
  SELECT v AS doc_id, min(l) AS cluster_id FROM cc GROUP BY v
), m AS (
  SELECT mem.cluster_id, mem.doc_id,
         CAST(len({_TOKS}) AS BIGINT) AS nt,
         (mem.doc_id = mem.cluster_id) AS is_canonical
  FROM members mem JOIN documents d ON mem.doc_id = d.doc_id
)
SELECT cluster_id, count(*) AS n_docs,
       max(CASE WHEN is_canonical THEN nt END) AS canon_nt,
       max(nt) AS best_nt,
       max(nt) - max(CASE WHEN is_canonical THEN nt END) AS gap_tokens,
       (max(nt) - max(CASE WHEN is_canonical THEN nt END)) * 1000000
         // max(nt) AS gap_ppm
FROM m GROUP BY cluster_id
"""

QUERIES["engagement_conversion_curve"] = timeops.engagement_conversion_curve
ORACLES["engagement_conversion_curve"] = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events
), flagged AS (
  SELECT user_id,
         CASE WHEN lag(tus) OVER (PARTITION BY user_id
                                  ORDER BY tus, event_id) IS NULL
                   OR tus - lag(tus) OVER (PARTITION BY user_id
                                           ORDER BY tus, event_id) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
), sessions AS (
  SELECT user_id, sum(new_s) AS n_sessions FROM flagged GROUP BY user_id
), views AS (
  SELECT user_id, min(tus) AS v_tus FROM e
  WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT v.user_id,
         max(CASE WHEN b.tus IS NOT NULL THEN 1 ELSE 0 END) AS converted
  FROM views v LEFT JOIN e b
    ON b.user_id = v.user_id AND b.event_type = 'purchase'
   AND b.tus >= v.v_tus
  GROUP BY v.user_id
)
SELECT least(s.n_sessions // 10, 9) AS session_bucket,
       count(*) AS n_users,
       sum(coalesce(converted, 0)) AS n_converted,
       sum(coalesce(converted, 0)) * 1000000 // count(*) AS cvr_ppm
FROM sessions s LEFT JOIN conv USING (user_id)
GROUP BY 1
"""

# --------------------------------------------------------------------------
# EXT E207-E208 — bursty tokens, rollup-lattice consistency
# --------------------------------------------------------------------------

QUERIES["bursty_token_leaders"] = _text.bursty_token_leaders
ORACLES["bursty_token_leaders"] = f"""
WITH pairs AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
), stats AS (
  SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
  FROM pairs GROUP BY token
)
SELECT token, tf, df, tf * 1000 // df AS burst_milli
FROM stats WHERE tf >= 50
ORDER BY burst_milli DESC, token ASC
LIMIT 20
"""

QUERIES["rollup_lattice_check"] = timeops.rollup_lattice_check
ORACLES["rollup_lattice_check"] = f"""
WITH raw AS (
  SELECT 'raw' AS grain, count(*) AS n_events,
         sum({duck_units("value", 2)}) AS sum_cents
  FROM events
), hourly_rel AS (
  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hs_ms,
         count(*) AS n, sum({duck_units("value", 2)}) AS c
  FROM events GROUP BY 1
), hourly AS (
  SELECT 'hourly' AS grain, sum(n) AS n_events, sum(c) AS sum_cents
  FROM hourly_rel
), daily AS (
  SELECT 'daily' AS grain, sum(n) AS n_events, sum(c) AS sum_cents
  FROM (
    SELECT hs_ms - hs_ms % 86400000 AS day_ms, sum(n) AS n, sum(c) AS c
    FROM hourly_rel GROUP BY 1
  )
)
SELECT * FROM raw UNION ALL SELECT * FROM hourly UNION ALL SELECT * FROM daily
"""

# --------------------------------------------------------------------------
# EXT E209-E210 — hourly OHLC bars, daily time-weighted average (TWAP)
# --------------------------------------------------------------------------

QUERIES["ohlc_bars"] = timeops.ohlc_bars
ORACLES["ohlc_bars"] = f"""
WITH e AS (
  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hs_ms, event_type,
         epoch_us(ts) AS tus, event_id,
         {duck_units("value", 2)} AS cents
  FROM events
)
, r AS (
  SELECT *,
         row_number() OVER (PARTITION BY hs_ms, event_type
                            ORDER BY tus, event_id) AS rn_a,
         row_number() OVER (PARTITION BY hs_ms, event_type
                            ORDER BY tus DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT hs_ms, event_type, count(*) AS n_events,
       max(CASE WHEN rn_a = 1 THEN cents END) / 100.0 AS open_v,
       max(cents) / 100.0 AS high_v,
       min(cents) / 100.0 AS low_v,
       max(CASE WHEN rn_d = 1 THEN cents END) / 100.0 AS close_v
FROM r GROUP BY 1, 2
"""

QUERIES["time_weighted_avg"] = timeops.time_weighted_avg
ORACLES["time_weighted_avg"] = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
         {duck_units("value", 2)} AS cents,
         (epoch_us(ts) // 86400000000) * 86400 * 1000 AS day_ms
  FROM events
), held AS (
  SELECT user_id, day_ms, cents,
         coalesce(lead(tus) OVER (PARTITION BY user_id, day_ms
                                  ORDER BY tus, event_id),
                  day_ms * 1000 + 86400000000) - tus AS dt_us
  FROM e
)
SELECT user_id, day_ms, count(*) AS n_events,
       sum(dt_us) AS held_us,
       (sum(cents * dt_us) * 100 // sum(dt_us)) / 10000.0 AS twap_v
FROM held GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# EXT E211 + streaming sliding parity — last-touch attribution, E9 drain
# --------------------------------------------------------------------------

QUERIES["streaming_sliding_drain"] = _stream.sliding_drain_query
ORACLES["streaming_sliding_drain"] = ORACLES["sliding_window_stats"]

QUERIES["last_touch_attribution"] = timeops.last_touch_attribution
ORACLES["last_touch_attribution"] = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
         {duck_units("value", 2)} AS cents,
         CASE WHEN event_type IN ('view', 'click', 'signup')
              THEN 1 ELSE 0 END AS is_touch
  FROM events
), flagged AS (
  SELECT *,
         last_value(CASE WHEN is_touch = 1 THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY tus, 1 - is_touch, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_type,
         last_value(CASE WHEN is_touch = 1 THEN tus END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY tus, 1 - is_touch, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_tus
  FROM e
)
SELECT CASE WHEN lt_tus IS NOT NULL AND lt_tus >= tus - 604800000000
            THEN lt_type ELSE 'direct' END AS channel,
       count(*) AS n_purchases,
       sum(cents) / 100.0 AS revenue
FROM flagged WHERE event_type = 'purchase'
GROUP BY 1
"""

# --------------------------------------------------------------------------
# EXT E212-E213 — Zipf slope, lang×source mutual information
# --------------------------------------------------------------------------

QUERIES["zipf_slope"] = _text.zipf_slope
ORACLES["zipf_slope"] = f"""
WITH freq AS (
  SELECT token, count(*) AS freq
  FROM (SELECT unnest({_TOKS}) AS token FROM documents)
  GROUP BY token
  ORDER BY freq DESC, token ASC
  LIMIT 100
), ranked AS (
  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY freq DESC, token ASC)
                           AS DOUBLE)) * 1000000) AS BIGINT) AS x,
         CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT) AS y
  FROM freq
), s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM ranked
)
SELECT n,
       CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS slope_micro,
       CAST(floor((CAST(sy AS DOUBLE)
                   - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * CAST(sx AS DOUBLE))
                  / CAST(n AS DOUBLE)) AS BIGINT) AS intercept_micro
FROM s
"""

QUERIES["lang_source_mi"] = mlmetrics.lang_source_mi
ORACLES["lang_source_mi"] = """
WITH cells AS (
  SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2
), lm AS (
  SELECT lang, count(*) AS r FROM documents GROUP BY 1
), sm AS (
  SELECT source, count(*) AS s FROM documents GROUP BY 1
), nn AS (
  SELECT count(*) AS n FROM documents
)
SELECT lang, source, c,
       (r * s) // n AS expected,
       CAST(round(ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
                     / (CAST(r AS DOUBLE) * CAST(s AS DOUBLE))) * 1000000)
            AS BIGINT) AS pmi_micro,
       c * CAST(round(ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
                         / (CAST(r AS DOUBLE) * CAST(s AS DOUBLE))) * 1000000)
                AS BIGINT) AS mi_contrib_micro
FROM cells JOIN lm USING (lang) JOIN sm USING (source) CROSS JOIN nn
"""

# --------------------------------------------------------------------------
# EXT E214-E215 — embedding dim correlation, MRR retrieval metric
# --------------------------------------------------------------------------

QUERIES["embedding_dim_correlation"] = similarity.embedding_dim_correlation
