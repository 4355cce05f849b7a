"""Registry segment 5/13 — mechanically split from the
round-4 plans/registry.py (12k lines). QUERIES insertion order is
load-bearing (the driver's correctness window samples the first 50
entries), so each segment imports its predecessor: importing ANY
segment executes the full prefix in the original order.
"""
from __future__ import annotations

from parquet_to_csv_spark.plans.registry_core import (QUERIES, ORACLES, query)  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts import p04 as _prev_segment  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p01 import (  # noqa: F401
    _TOKS,
    _duck_cos,
    dedup,
    duck_units,
    multimodal,
    pandas_ops,
    relational,
    timeops,
)
from parquet_to_csv_spark.plans.registry_parts.p02 import _sim, corpus  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p03 import _sketch, mlmetrics  # noqa: F401


# --------------------------------------------------------------------------
# EXT E147-E148 — cluster topic labeling, near-dup graph assortativity
# --------------------------------------------------------------------------

# Centroid-cell assignment replayed exactly as ivf_topk's oracle does;
# presence lift in exact integer ppm.
QUERIES["cluster_topic_terms"] = _sim.cluster_topic_terms
ORACLES["cluster_topic_terms"] = f"""
WITH cents AS (
  SELECT vec_id AS cell_id, embedding AS cent_emb FROM embeddings WHERE vec_id < 8
), asg AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell_id AS cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_duck_cos('e.embedding', 'c.cent_emb')} DESC, c.cell_id ASC
           ) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
), pres AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS term FROM documents
), tot AS (
  SELECT count(*) AS n_total FROM documents
), cell_sizes AS (
  SELECT cell, count(*) AS n_cell FROM asg GROUP BY cell
), term_totals AS (
  SELECT term, count(*) AS n_t FROM pres GROUP BY term
), cell_terms AS (
  SELECT asg.cell, pres.term, count(*) AS a
  FROM pres JOIN asg ON pres.doc_id = asg.vec_id
  GROUP BY 1, 2
), scored AS (
  SELECT cell, term, a, a * n_total * 1000000 // (n_cell * n_t) AS lift_ppm
  FROM cell_terms JOIN term_totals USING (term) JOIN cell_sizes USING (cell), tot
  WHERE a >= 3
), r AS (
  SELECT cell, term, a, lift_ppm,
         row_number() OVER (PARTITION BY cell
                            ORDER BY lift_ppm DESC, term ASC) AS rnk
  FROM scored
)
SELECT cell, term, a AS n_docs_in, lift_ppm, rnk FROM r WHERE rnk <= 5
"""

# Mirrored-edge Pearson over endpoint degrees; edges = the exact
# prefix-filtered Jaccard relation at 0.8.
QUERIES["neardup_graph_assortativity"] = dedup.neardup_graph_assortativity
ORACLES["neardup_graph_assortativity"] = f"""
WITH t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), edges AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
             / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.8
), deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT doc_a AS node FROM edges UNION ALL SELECT doc_b FROM edges
  ) GROUP BY node
), s AS (
  SELECT count(*) AS m,
         sum(da.deg + db.deg) AS sx,
         sum(da.deg * da.deg + db.deg * db.deg) AS sxx,
         sum(da.deg * db.deg) AS sab
  FROM edges e JOIN deg da ON e.doc_a = da.node JOIN deg db ON e.doc_b = db.node
), nn AS (
  SELECT count(*) AS n_nodes FROM deg
)
SELECT n_nodes, m AS n_edges,
       CAST(floor((2.0 * CAST(m AS DOUBLE) * (2.0 * CAST(sab AS DOUBLE))
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            / (2.0 * CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * 1000000.0) AS BIGINT) AS assortativity_micro
FROM s, nn
WHERE (2.0 * CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0.0
"""

# --------------------------------------------------------------------------
# EXT E149-E150 — Kaplan-Meier conversion survival, Benford audit
# --------------------------------------------------------------------------

# Censoring-correct KM curve; micro-nat step terms summed exactly.
QUERIES["conversion_survival_curve"] = timeops.conversion_survival_curve
ORACLES["conversion_survival_curve"] = """
WITH views AS (
  SELECT user_id, min(epoch_us(ts)) AS v_us FROM events
  WHERE event_type = 'view' GROUP BY user_id
), fb AS (
  SELECT v.user_id, v.v_us, min(epoch_us(b.ts)) AS p_us
  FROM views v LEFT JOIN events b
    ON b.user_id = v.user_id AND b.event_type = 'purchase'
   AND epoch_us(b.ts) >= v.v_us
  GROUP BY v.user_id, v.v_us
), hz AS (
  SELECT max(epoch_us(ts)) AS h_us FROM events
), durs AS (
  SELECT CASE WHEN p_us IS NOT NULL THEN (p_us - v_us) // 86400000000
              ELSE (h_us - v_us) // 86400000000 END AS dur,
         CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS is_event
  FROM fb, hz
), steps AS (
  SELECT dur, sum(is_event) AS d, sum(1 - is_event) AS c
  FROM durs GROUP BY dur
), tot AS (
  SELECT count(*) AS n_total FROM durs
), at_risk AS (
  SELECT dur, d, c,
         n_total - coalesce(sum(d + c) OVER (ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM steps, tot
), terms AS (
  SELECT dur, d, n_risk,
         CAST(round(ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                    * 1000000) AS BIGINT) AS term_micro
  FROM at_risk WHERE d > 0 AND n_risk > d
)
SELECT dur AS duration_days, n_risk, d AS n_events,
       sum(term_micro) OVER (ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS log_surv_micro
FROM terms
"""

# First digit from the string of exact cents; hard Benford literals.
QUERIES["benford_price_audit"] = relational.benford_price_audit
ORACLES["benford_price_audit"] = f"""
WITH counts AS (
  SELECT CAST(substring(CAST({duck_units("o_totalprice", 2)} AS VARCHAR), 1, 1)
              AS BIGINT) AS digit,
         count(*) AS n_orders
  FROM orders
  GROUP BY 1
  HAVING CAST(substring(CAST({duck_units("o_totalprice", 2)} AS VARCHAR), 1, 1)
              AS BIGINT) >= 1
), tot AS (
  SELECT sum(n_orders) AS n_total FROM counts
)
SELECT digit, n_orders,
       n_orders * 1000000 // n_total AS obs_ppm,
       CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
                  WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
                  WHEN 7 THEN 57992 WHEN 8 THEN 51153 WHEN 9 THEN 45757
       END AS exp_ppm,
       n_orders * 1000000 // n_total
         - CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
                      WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
                      WHEN 7 THEN 57992 WHEN 8 THEN 51153 WHEN 9 THEN 45757
           END AS dev_ppm
FROM counts, tot
"""

# --------------------------------------------------------------------------
# EXT E151-E152 — k-anonymity audit, value-quintile transition matrix
# --------------------------------------------------------------------------

QUERIES["k_anonymity_audit"] = corpus.k_anonymity_audit
ORACLES["k_anonymity_audit"] = """
WITH groups AS (
  SELECT lang, source, n_chars // 100 AS len_band, count(*) AS sz
  FROM documents GROUP BY 1, 2, 3
), tot AS (
  SELECT sum(sz) AS n_total FROM groups
), wide AS (
  SELECT sum(CASE WHEN sz < 2 THEN 1 ELSE 0 END) AS g2,
         sum(CASE WHEN sz < 2 THEN sz ELSE 0 END) AS d2,
         sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS g5,
         sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS d5,
         sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS g10,
         sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS d10
  FROM groups
)
SELECT 2 AS k, g2 AS n_groups_below, d2 AS n_docs_at_risk,
       d2 * 1000000 // n_total AS risk_share_ppm FROM wide, tot
UNION ALL
SELECT 5, g5, d5, d5 * 1000000 // n_total FROM wide, tot
UNION ALL
SELECT 10, g10, d10, d10 * 1000000 // n_total FROM wide, tot
"""

# ntile over a UNIQUE order (spend, custkey) is deterministic and
# identical across engines (remainder rows go to the leading tiles).
QUERIES["value_quintile_transitions"] = relational.value_quintile_transitions
ORACLES["value_quintile_transitions"] = f"""
WITH per AS (
  SELECT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) AS m,
         sum({duck_units("o_totalprice", 2)}) AS spend
  FROM orders GROUP BY 1, 2
), q AS (
  SELECT o_custkey, m,
         ntile(5) OVER (PARTITION BY m ORDER BY spend, o_custkey) AS quintile
  FROM per
)
SELECT a.m AS m_from, a.quintile AS q_from, b.quintile AS q_to,
       count(*) AS n_users
FROM q a JOIN q b ON a.o_custkey = b.o_custkey AND b.m = a.m + 1
GROUP BY 1, 2, 3
"""

# --------------------------------------------------------------------------
# EXT E153-E154 — sequential trigram mining, session entry/exit paths
# --------------------------------------------------------------------------

QUERIES["top_event_trigrams"] = timeops.top_event_trigrams
ORACLES["top_event_trigrams"] = """
WITH tri AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e3
  FROM events
), counts AS (
  SELECT e1, e2, e3, count(*) AS n_occurrences,
         count(DISTINCT user_id) AS n_users
  FROM tri WHERE e3 IS NOT NULL GROUP BY 1, 2, 3
), r AS (
  SELECT e1, e2, e3, n_occurrences, n_users,
         row_number() OVER (ORDER BY n_users DESC, n_occurrences DESC,
                            e1, e2, e3) AS rnk
  FROM counts
)
SELECT e1, e2, e3, n_occurrences, n_users, rnk FROM r WHERE rnk <= 20
"""

QUERIES["session_entry_exit"] = timeops.session_entry_exit
ORACLES["session_entry_exit"] = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events
), flagged AS (
  SELECT user_id, event_id, event_type, tus,
         CASE WHEN lag(tus) OVER (PARTITION BY user_id
                                  ORDER BY tus, event_id) IS NULL
                   OR tus - lag(tus) OVER (PARTITION BY user_id
                                           ORDER BY tus, event_id) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
), sess AS (
  SELECT user_id, event_id, event_type, tus,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), marked AS (
  SELECT user_id, sid, event_type, tus,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY tus, event_id) AS rf,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY tus DESC, event_id DESC) AS rl
  FROM sess
), per_session AS (
  SELECT user_id, sid,
         max(CASE WHEN rf = 1 THEN event_type END) AS entry_type,
         max(CASE WHEN rl = 1 THEN event_type END) AS exit_type,
         max(tus) - min(tus) AS dur_us,
         count(*) AS n_events
  FROM marked GROUP BY 1, 2
)
SELECT entry_type, exit_type, count(*) AS n_sessions,
       sum(n_events) AS n_events,
       sum(dur_us) // (count(*) * 1000) AS mean_dur_ms
FROM per_session GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# EXT E155-E156 — perceptual-hash dup groups, fixed-k weighted sampling
# --------------------------------------------------------------------------

# The pandas-UDF pHash is pure integer byte arithmetic, so the oracle
# replays it from the ASCII text bytes (chars == bytes on the fixture).
QUERIES["phash_dup_groups"] = multimodal.phash_dup_groups
ORACLES["phash_dup_groups"] = """
WITH chars AS (
  SELECT doc_id, ascii(u.c) // 16 AS b
  FROM documents, LATERAL (SELECT unnest(string_split(text, '')) AS c) u
  WHERE strlen(text) > 0
), bins AS (
  SELECT doc_id, b, count(*) AS c FROM chars GROUP BY 1, 2
), tot AS (
  SELECT doc_id, strlen(text) AS total FROM documents
), corpus AS (
  SELECT b, sum(c) AS corpus_c FROM bins GROUP BY b
), corpus_tot AS (
  SELECT sum(corpus_c) AS corpus_total FROM corpus
), hashes AS (
  SELECT t.doc_id, t.total,
         coalesce(sum(CASE WHEN bins.c * corpus_total > corpus.corpus_c * t.total
                           THEN (CAST(1 AS BIGINT) << bins.b) ELSE 0 END), 0)
           AS phash
  FROM tot t
  LEFT JOIN bins ON bins.doc_id = t.doc_id
  LEFT JOIN corpus ON corpus.b = bins.b, corpus_tot
  GROUP BY 1, 2
)
SELECT phash, count(*) AS n_payloads, min(doc_id) AS min_doc,
       max(doc_id) AS max_doc, sum(total) AS total_bytes
FROM hashes GROUP BY phash HAVING count(*) >= 2
"""

_H48 = " + ".join(
    f"(instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1) * {16 ** (11 - i)}"
    for i in range(12)
)
QUERIES["weighted_sample_fixed_k"] = corpus.weighted_sample_fixed_k
ORACLES["weighted_sample_fixed_k"] = f"""
WITH base AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS w,
         CAST({_H48} AS BIGINT) AS h48
  FROM documents
  WHERE len({_TOKS}) > 0
)
SELECT doc_id, w,
       CAST(floor(ln((CAST(h48 AS DOUBLE) + 1.0) / 281474976710656.0)
            / CAST(w AS DOUBLE) * 1000000000.0) AS BIGINT) AS key_nano
FROM base
ORDER BY key_nano DESC, doc_id ASC
LIMIT 50
"""

# --------------------------------------------------------------------------
# EXT E157-E158 — embedding standardization, IDF-weighted Jaccard
# --------------------------------------------------------------------------

# DECIMAL(18,8) sums/squares fit DECIMAL(37,16) exactly in BOTH engines
# (no precision-loss divergence); z quantizes before aggregation.
QUERIES["embedding_standardize"] = _sim.embedding_standardize
ORACLES["embedding_standardize"] = """
WITH ex AS (
  SELECT vec_id, u.pos - 1 AS pos, u.val
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
                       unnest(embedding) AS val) u
), stats AS (
  SELECT pos, count(*) AS n,
         sum(CAST(val AS DECIMAL(18,8))) AS s,
         sum(CAST(val AS DECIMAL(18,8)) * CAST(val AS DECIMAL(18,8))) AS ssq
  FROM ex GROUP BY pos
), st AS (
  SELECT pos,
         round(CAST(s AS DOUBLE) / n, 6) AS mu,
         sqrt((CAST(ssq AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE)
               / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
              / CAST(n AS DOUBLE)) AS sd
  FROM stats
), z AS (
  SELECT ex.vec_id, ex.pos,
         CAST(floor((CAST(ex.val AS DOUBLE) - st.mu) / st.sd * 1000.0) AS BIGINT) AS z
  FROM ex JOIN st ON ex.pos = st.pos
  WHERE st.sd > 0
)
SELECT vec_id, count(*) AS n_dims,
       sum(CASE WHEN z >= 3000 OR z < -3000 THEN 1 ELSE 0 END) AS n_outlier_dims,
       md5(string_agg(CAST(z AS VARCHAR), ',' ORDER BY pos)) AS z_fp
FROM z GROUP BY vec_id
"""

QUERIES["weighted_jaccard_pairs"] = dedup.weighted_jaccard_pairs
ORACLES["weighted_jaccard_pairs"] = f"""
WITH toks AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS t FROM documents
), pres AS (
  SELECT doc_id, lang, source, unnest(t) AS tok FROM toks
), nd AS (
  SELECT count(*) AS n_total FROM documents
), idf AS (
  SELECT tok, CAST(round(ln(CAST(n_total AS DOUBLE) / df) * 1000) AS BIGINT)
           AS idf_milli
  FROM (SELECT tok, count(*) AS df FROM pres GROUP BY tok), nd
), weighted AS (
  SELECT pres.doc_id, pres.lang, pres.source, pres.tok, idf.idf_milli
  FROM pres JOIN idf USING (tok)
), doc_w AS (
  SELECT doc_id, sum(idf_milli) AS w FROM weighted GROUP BY doc_id
), shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         sum(a.idf_milli) AS w_shared, count(*) AS n_shared
  FROM weighted a JOIN weighted b
    ON a.lang = b.lang AND a.source = b.source AND a.tok = b.tok
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared,
       w_shared * 1000 // (wa.w + wb.w - w_shared) AS wjaccard_milli
FROM shared
JOIN doc_w wa ON wa.doc_id = doc_a
JOIN doc_w wb ON wb.doc_id = doc_b
WHERE w_shared * 1000 // (wa.w + wb.w - w_shared) >= 500
"""

# --------------------------------------------------------------------------
# EXT E159-E160 — shuffle-skew key profiler, incremental append dedup
# --------------------------------------------------------------------------

QUERIES["skew_key_profile"] = relational.skew_key_profile
ORACLES["skew_key_profile"] = """
WITH counts AS (
  SELECT l_orderkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1
), stats AS (
  SELECT count(*) AS n_keys, sum(cnt) AS total_rows FROM counts
)
SELECT key, cnt,
       cnt * 1000000 // total_rows AS share_ppm,
       cnt * n_keys * 1000000 // total_rows AS vs_mean_ppm
FROM counts, stats
ORDER BY cnt DESC, key ASC
LIMIT 10
"""

QUERIES["incremental_dedup_report"] = dedup.incremental_dedup_report
ORACLES["incremental_dedup_report"] = f"""
WITH d AS (
  SELECT doc_id, source, sha256(text) AS h,
         {corpus.duck_md5_bucket("doc_id", 100)} AS bucket
  FROM documents
), hist AS (
  SELECT DISTINCT h FROM d WHERE bucket < 80
), delta AS (
  SELECT doc_id, source, h FROM d WHERE bucket >= 80
), vs_hist AS (
  SELECT doc_id, source FROM delta WHERE h IN (SELECT h FROM hist)
), fresh AS (
  SELECT doc_id, source, h FROM delta WHERE h NOT IN (SELECT h FROM hist)
), firsts AS (
  SELECT h, min(doc_id) AS keep_id FROM fresh GROUP BY h
), in_delta_dups AS (
  SELECT f.doc_id, f.source FROM fresh f JOIN firsts USING (h)
  WHERE f.doc_id <> keep_id
), base AS (
  SELECT source, count(*) AS n_delta FROM delta GROUP BY source
), vh AS (
  SELECT source, count(*) AS n_dup_vs_history FROM vs_hist GROUP BY source
), dd AS (
  SELECT source, count(*) AS n_dup_in_delta FROM in_delta_dups GROUP BY source
)
SELECT base.source, n_delta,
       coalesce(n_dup_vs_history, 0) AS n_dup_vs_history,
       coalesce(n_dup_in_delta, 0) AS n_dup_in_delta,
       n_delta - coalesce(n_dup_vs_history, 0) - coalesce(n_dup_in_delta, 0)
         AS n_new_unique,
       (coalesce(n_dup_vs_history, 0) + coalesce(n_dup_in_delta, 0))
         * 1000000 // n_delta AS drop_ppm
FROM base
LEFT JOIN vh ON vh.source = base.source
LEFT JOIN dd ON dd.source = base.source
"""

# --------------------------------------------------------------------------
# EXT E161-E163 — k-fold balance, sampling ladder, decayed trending
# --------------------------------------------------------------------------

QUERIES["kfold_balance_report"] = corpus.kfold_balance_report
ORACLES["kfold_balance_report"] = f"""
WITH cell AS (
  SELECT CAST({corpus.duck_md5_bucket("doc_id", 1000)} % 5 AS BIGINT) AS fold,
         lang, count(*) AS cnt
  FROM documents GROUP BY 1, 2
), strata AS (
  SELECT lang, sum(cnt) AS stratum_total FROM cell GROUP BY lang
)
SELECT fold, cell.lang, cnt,
       cnt * 5 * 1000000 // stratum_total - 1000000 AS dev_ppm
FROM cell JOIN strata ON cell.lang = strata.lang
"""

QUERIES["sampling_ladder"] = corpus.sampling_ladder
ORACLES["sampling_ladder"] = f"""
WITH base AS (
  SELECT CAST({corpus.duck_md5_bucket("doc_id", 1000)} AS BIGINT) AS bucket,
         CAST(len({_TOKS}) AS BIGINT) AS nt
  FROM documents
), tot AS (
  SELECT count(*) AS n_total, sum(nt) AS tok_total FROM base
), wide AS (
  SELECT sum(CASE WHEN bucket < 100 THEN 1 ELSE 0 END) AS n100,
         sum(CASE WHEN bucket < 100 THEN nt ELSE 0 END) AS t100,
         sum(CASE WHEN bucket < 200 THEN 1 ELSE 0 END) AS n200,
         sum(CASE WHEN bucket < 200 THEN nt ELSE 0 END) AS t200,
         sum(CASE WHEN bucket < 400 THEN 1 ELSE 0 END) AS n400,
         sum(CASE WHEN bucket < 400 THEN nt ELSE 0 END) AS t400,
         sum(CASE WHEN bucket < 800 THEN 1 ELSE 0 END) AS n800,
         sum(CASE WHEN bucket < 800 THEN nt ELSE 0 END) AS t800
  FROM base
)
SELECT 10 AS target_pct, n100 AS n_docs, t100 AS n_tokens,
       n100 * 1000000 // n_total AS realized_ppm FROM wide, tot
UNION ALL
SELECT 20, n200, t200, n200 * 1000000 // n_total FROM wide, tot
UNION ALL
SELECT 40, n400, t400, n400 * 1000000 // n_total FROM wide, tot
UNION ALL
SELECT 80, n800, t800, n800 * 1000000 // n_total FROM wide, tot
"""

QUERIES["decayed_event_trend"] = timeops.decayed_event_trend
ORACLES["decayed_event_trend"] = """
WITH hz AS (
  SELECT max(epoch_us(ts) // 86400000000) AS h_day FROM events
), daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), weighted AS (
  SELECT event_type, n,
         CAST(round(pow(2.0, -CAST(h_day - day AS DOUBLE) / 7.0)
                    * 1000000.0) AS BIGINT) AS w_ppm
  FROM daily, hz
)
SELECT event_type, sum(n) AS n_events,
       sum(n * w_ppm) // 1000000 AS trend_score,
       sum(n * w_ppm) AS score_e6
FROM weighted GROUP BY event_type
"""

# --------------------------------------------------------------------------
# EXT E164-E165 — daily percentile bands, windowed conversion rate
# --------------------------------------------------------------------------

# Type-1 (discrete) percentiles: a selected order statistic of exact
# cents via an explicit floor((n-1)*p) index — no interpolation
# internals to diverge.
QUERIES["daily_value_bands"] = timeops.daily_value_bands
ORACLES["daily_value_bands"] = f"""
WITH base AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         {duck_units("value", 2)} AS cents
  FROM events
), ranked AS (
  SELECT event_type, day, cents,
         row_number() OVER (PARTITION BY day, event_type
                            ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY day, event_type) AS n
  FROM base
)
SELECT day, event_type, max(n) AS n_events,
       max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1
                THEN cents END) AS p50_cents,
       max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 1
                THEN cents END) AS p90_cents,
       max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 1
                THEN cents END) AS p99_cents
FROM ranked GROUP BY day, event_type
"""

QUERIES["windowed_conversion_rate"] = timeops.windowed_conversion_rate
ORACLES["windowed_conversion_rate"] = """
WITH views AS (
  SELECT user_id, min(epoch_us(ts)) AS v_us FROM events
  WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT v.user_id, v.v_us, min(epoch_us(b.ts)) AS p_us
  FROM views v LEFT JOIN events b
    ON b.user_id = v.user_id AND b.event_type = 'purchase'
   AND epoch_us(b.ts) >= v.v_us
  GROUP BY v.user_id, v.v_us
), flags AS (
  SELECT v_us // 86400000000 AS cohort_day,
         CASE WHEN p_us IS NOT NULL AND p_us - v_us < 86400000000
              THEN 1 ELSE 0 END AS converted
  FROM conv
)
SELECT cohort_day, count(*) AS n_cohort, sum(converted) AS n_converted,
       sum(converted) * 1000000 // count(*) AS cvr_ppm
FROM flags GROUP BY cohort_day
"""

# --------------------------------------------------------------------------
# EXT E166-E168 — PSI drift, Theil-Sen trend, Python UDTF surface
# --------------------------------------------------------------------------

QUERIES["psi_value_drift"] = mlmetrics.psi_value_drift
ORACLES["psi_value_drift"] = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         {duck_units("value", 2)} AS cents
  FROM events
), span AS (
  SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev
), tagged AS (
  SELECT event_type, cents,
         CASE WHEN day >= mid THEN 1 ELSE 0 END AS late
  FROM ev, span
), ranked AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM tagged WHERE late = 0
), cuts AS (
  SELECT event_type,
         list_value(
           {", ".join(f"max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * {j / 10}) AS BIGINT) + 1 THEN cents END)" for j in range(1, 10))}
         ) AS cuts
  FROM ranked GROUP BY event_type
), bucketed AS (
  SELECT t.event_type, t.late,
         len(list_filter(c.cuts, x -> x <= t.cents)) AS bucket,
         count(*) AS cnt
  FROM tagged t JOIN cuts c ON t.event_type = c.event_type
  GROUP BY 1, 2, 3
), grid AS (
  SELECT ty.event_type, l.late, bk.bucket,
         coalesce(b.cnt, 0) + 1 AS c_s
  FROM (SELECT DISTINCT event_type FROM bucketed) ty
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bucket) bk
  CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS late) l
  LEFT JOIN bucketed b ON b.event_type = ty.event_type
   AND b.late = l.late AND b.bucket = bk.bucket
), tot AS (
  SELECT event_type, late, sum(c_s) AS n_s FROM grid GROUP BY 1, 2
), joined AS (
  SELECT a.event_type, a.bucket,
         a.c_s AS ca, ta.n_s AS na, b.c_s AS cb, tb.n_s AS nb
  FROM grid a
  JOIN grid b ON a.event_type = b.event_type AND a.bucket = b.bucket
   AND a.late = 0 AND b.late = 1
  JOIN tot ta ON ta.event_type = a.event_type AND ta.late = 0
  JOIN tot tb ON tb.event_type = a.event_type AND tb.late = 1
), terms AS (
  SELECT event_type, bucket,
         CAST(round((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
              - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
              * ln(CAST(ca AS DOUBLE) * CAST(nb AS DOUBLE)
              / (CAST(cb AS DOUBLE) * CAST(na AS DOUBLE)))
              * 1000000.0) AS BIGINT) AS t_micro
  FROM joined
)
SELECT event_type, sum(t_micro) AS psi_micro, max(t_micro) AS worst_bin_micro
FROM terms GROUP BY event_type
"""

QUERIES["theil_sen_trend"] = mlmetrics.theil_sen_trend
ORACLES["theil_sen_trend"] = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, a.day AS d1, b.day AS d2,
         CAST(b.n - a.n AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
), ranked AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope, d1, d2) AS rn,
         count(*) OVER (PARTITION BY event_type) AS np
  FROM pairs
)
SELECT event_type, np AS n_pairs,
       CAST(floor(slope * 1000000.0) AS BIGINT) AS slope_micro
FROM ranked
WHERE rn = CAST(floor(CAST(np - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1
"""

# UDTF surface: same oracle contract as the relational chunker.
QUERIES["udtf_chunks"] = pandas_ops.udtf_chunks
ORACLES["udtf_chunks"] = ORACLES["doc_chunks"]

# --------------------------------------------------------------------------
# EXT E169-E170 — rolling HLL distinct, partition-layout advisor
# --------------------------------------------------------------------------

QUERIES["rolling_distinct_hll"] = _sketch.rolling_distinct_hll
ORACLES["rolling_distinct_hll"] = """
WITH hh AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         (instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
       + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) AS bucket,
         ltrim(substring(h, 3, 15), '0') AS t
  FROM (SELECT ts, md5(CAST(user_id AS VARCHAR)) AS h FROM events)
), r AS (
  SELECT day, bucket,
         CASE WHEN t = '' THEN 61
              ELSE (15 - length(t)) * 4 +
                   CASE WHEN (instr('0123456789abcdef', substring(t, 1, 1)) - 1) >= 8 THEN 1
                        WHEN (instr('0123456789abcdef', substring(t, 1, 1)) - 1) >= 4 THEN 2
                        WHEN (instr('0123456789abcdef', substring(t, 1, 1)) - 1) >= 2 THEN 3
                        ELSE 4 END
         END AS rho
  FROM hh
), daily AS (
  SELECT day, bucket, max(rho) AS m FROM r GROUP BY day, bucket
), days AS (
  SELECT DISTINCT day AS t_day FROM hh
), merged AS (
  SELECT t_day, bucket, max(m) AS m
  FROM daily JOIN days ON day <= t_day AND day > t_day - 7
  GROUP BY t_day, bucket
), acc AS (
  SELECT t_day, count(*) AS n_present,
         sum(1::BIGINT << CAST(61 - m AS INTEGER)) AS s_present
  FROM merged GROUP BY t_day
), s AS (
  SELECT t_day, (256 - n_present) AS n_zero_registers,
         CAST(s_present + (256 - n_present)::HUGEINT
              * 2305843009213693952::HUGEINT AS DOUBLE) AS s_total
  FROM acc
), e AS (
  SELECT t_day, n_zero_registers,
         (0.7213 / (1 + 1.079 / 256.0)) * 65536.0 * 2305843009213693952.0
           / s_total AS raw
  FROM s
), exact AS (
  SELECT d.t_day, count(DISTINCT u.user_id) AS n_exact
  FROM days d JOIN (SELECT DISTINCT user_id,
                           epoch_us(ts) // 86400000000 AS day FROM events) u
    ON u.day <= d.t_day AND u.day > d.t_day - 7
  GROUP BY d.t_day
)
SELECT e.t_day AS day, exact.n_exact,
       CAST(e.n_zero_registers AS BIGINT) AS n_zero_registers,
       round(CASE WHEN raw <= 640.0 AND e.n_zero_registers > 0
                  THEN 256.0 * ln(256.0 / e.n_zero_registers)
                  ELSE raw END, 2) AS hll_estimate
FROM e JOIN exact ON exact.t_day = e.t_day
"""

QUERIES["partition_layout_advisor"] = relational.partition_layout_advisor
ORACLES["partition_layout_advisor"] = """
WITH est AS (
  SELECT 'documents' AS table_name, count(*) AS n_rows,
         sum(8 + length(text) + length(lang) + length(source) + 8) AS est_bytes
  FROM documents
  UNION ALL
  SELECT 'events', count(*),
         sum(8 + 8 + 8 + length(event_type) + 8 + length(props))
  FROM events
  UNION ALL
  SELECT 'orders', count(*),
         sum(8 + 8 + length(o_orderstatus) + 8 + 8 + length(o_orderpriority))
  FROM orders
  UNION ALL
  SELECT 'lineitem', count(*),
         sum(8 * 8 + 4 + length(l_returnflag) + length(l_linestatus))
  FROM lineitem
)
SELECT table_name, n_rows, est_bytes,
       (est_bytes + 134217728 - 1) // 134217728 AS parts_128mb,
       est_bytes // n_rows AS avg_row_bytes
FROM est
"""

# --------------------------------------------------------------------------
# EXT E171-E172 — two-proportion z-test, dedup strategy report
# --------------------------------------------------------------------------

QUERIES["conversion_ztest"] = mlmetrics.conversion_ztest
ORACLES["conversion_ztest"] = """
WITH views AS (
  SELECT user_id, min(epoch_us(ts)) AS v_us FROM events
  WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT v.user_id, v.v_us, min(epoch_us(b.ts)) AS p_us
  FROM views v LEFT JOIN events b
    ON b.user_id = v.user_id AND b.event_type = 'purchase'
   AND epoch_us(b.ts) >= v.v_us
  GROUP BY v.user_id, v.v_us
), flags AS (
  SELECT CASE WHEN (v_us // 86400000000 + 4) % 7 >= 5 THEN 1 ELSE 0 END AS weekend,
         CASE WHEN p_us IS NOT NULL AND p_us - v_us < 86400000000
              THEN 1 ELSE 0 END AS converted
  FROM conv
), arms AS (
  SELECT weekend, count(*) AS n, sum(converted) AS x FROM flags GROUP BY weekend
), a AS (SELECT n AS n1, x AS x1 FROM arms WHERE weekend = 1),
b AS (SELECT n AS n2, x AS x2 FROM arms WHERE weekend = 0)
SELECT n1, x1, n2, x2,
       x1 * 1000000 // n1 AS cvr1_ppm,
       x2 * 1000000 // n2 AS cvr2_ppm,
       CAST(floor((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
            / sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
            * (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
            * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
            * 1000.0) AS BIGINT) AS z_milli
FROM a, b
WHERE x1 + x2 > 0 AND x1 + x2 < n1 + n2
"""

QUERIES["dedup_strategy_report"] = dedup.dedup_strategy_report
ORACLES["dedup_strategy_report"] = f"""
WITH d AS (
  SELECT doc_id, lang, source, sha256(text) AS exact_h,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_h,
         CAST(len({_TOKS}) AS BIGINT) AS nt,
         list_distinct({_TOKS}) AS toks
  FROM documents
), ex_f AS (
  SELECT exact_h, min(doc_id) AS keep, count(*) AS sz FROM d GROUP BY exact_h
), exact_dups AS (
  SELECT d.doc_id, d.nt FROM d JOIN ex_f USING (exact_h)
  WHERE sz >= 2 AND doc_id <> keep
), nf AS (
  SELECT norm_h, min(doc_id) AS keep, count(*) AS sz FROM d GROUP BY norm_h
), norm_all AS (
  SELECT d.doc_id, d.nt FROM d JOIN nf USING (norm_h)
  WHERE sz >= 2 AND doc_id <> keep
), norm_dups AS (
  SELECT * FROM norm_all WHERE doc_id NOT IN (SELECT doc_id FROM exact_dups)
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM d a JOIN d b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
             / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.8
), near_docs AS (
  SELECT nd.doc_id, d.nt
  FROM (SELECT DISTINCT doc_id FROM
         (SELECT doc_a AS doc_id FROM pairs
          UNION ALL SELECT doc_b FROM pairs)) nd
  JOIN d USING (doc_id)
  WHERE nd.doc_id NOT IN (SELECT doc_id FROM norm_all)
    AND nd.doc_id NOT IN (SELECT doc_id FROM exact_dups)
), bsample AS (
  SELECT doc_id, lang, source, toks FROM d
  WHERE {corpus.duck_md5_bucket("doc_id", 100)} < 10
), bpairs AS (
  SELECT CASE WHEN a.lang = b.lang AND a.source = b.source
              THEN 1 ELSE 0 END AS same_block
  FROM bsample a JOIN bsample b ON a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
              / CAST(len(a.toks) + len(b.toks)
                     - len(list_intersect(a.toks, b.toks)) AS DOUBLE), 4)
        >= 0.8
), baudit AS (
  SELECT 1000000 - CASE WHEN count(*) > 0
           THEN coalesce(sum(1 - same_block), 0) * 1000000 // count(*)
           ELSE 0 END AS recall_ppm
  FROM bpairs
)
SELECT 'exact' AS tier, count(*) AS n_docs_removable,
       coalesce(sum(nt), 0) AS tokens_removable,
       CAST(1000000 AS BIGINT) AS blocking_recall_ppm FROM exact_dups
UNION ALL
SELECT 'normalized', count(*), coalesce(sum(nt), 0),
       CAST(1000000 AS BIGINT) FROM norm_dups
UNION ALL
SELECT 'near_dup_j08', count(*), coalesce(sum(nt), 0),
       CAST((SELECT recall_ppm FROM baudit) AS BIGINT) FROM near_docs
"""

# --------------------------------------------------------------------------
# EXT E173-E174 — product quantization, ANN recall report
# --------------------------------------------------------------------------

_PQ_DIST = (
    "list_sum(list_transform(list_zip(s.subvec, c.cent_sub),"
    " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
)

QUERIES["product_quantization"] = _sim.product_quantization
ORACLES["product_quantization"] = f"""
WITH subs AS (
  SELECT vec_id, u.s AS sub,
         list_slice(embedding, u.s * 8 + 1, u.s * 8 + 8) AS subvec
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(0, 7)) AS s) u
), cents AS (
  SELECT vec_id AS cent_id, u.s AS sub,
         list_slice(embedding, u.s * 8 + 1, u.s * 8 + 8) AS cent_sub
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(0, 7)) AS s) u
  WHERE vec_id < 16
), scored AS (
  SELECT s.vec_id, s.sub, c.cent_id, c.cent_sub,
         row_number() OVER (
           PARTITION BY s.vec_id, s.sub
           ORDER BY {_PQ_DIST} ASC, c.cent_id ASC
         ) AS rn,
         list_sum(list_transform(list_zip(s.subvec, c.cent_sub),
           p -> CAST(round((CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * 1000000) AS BIGINT)
              * CAST(round((CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * 1000000) AS BIGINT)))
           AS err
  FROM subs s JOIN cents c ON s.sub = c.sub
)
SELECT vec_id,
       string_agg(CAST(cent_id AS VARCHAR), '-' ORDER BY sub) AS code_word,
       CAST(sum(err) AS BIGINT) AS recon_err_e12
FROM scored WHERE rn = 1
GROUP BY vec_id
"""

QUERIES["ann_recall_report"] = _sim.ann_recall_report
ORACLES["ann_recall_report"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS cand_id, embedding AS c_emb FROM embeddings
), exact AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY {_duck_cos('q_emb', 'c_emb')} DESC, cand_id ASC) AS rnk
    FROM q JOIN c ON query_id <> cand_id
  ) WHERE rnk <= 5
), ivf_cents AS (
  SELECT vec_id AS cell_id, embedding AS cent_emb FROM embeddings WHERE vec_id < 16
), asg AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, ic.cell_id AS cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_duck_cos('e.embedding', 'ic.cent_emb')} DESC, ic.cell_id ASC
           ) AS rn
    FROM embeddings e CROSS JOIN ivf_cents ic
  ) WHERE rn = 1
), probes AS (
  SELECT query_id, q_emb, cell FROM (
    SELECT q.query_id, q.q_emb, ic.cell_id AS cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_duck_cos('q.q_emb', 'ic.cent_emb')} DESC, ic.cell_id ASC
           ) AS rn
    FROM q CROSS JOIN ivf_cents ic
  ) WHERE rn <= 4
), approx AS (
  SELECT query_id, cand_id FROM (
    SELECT p.query_id, a.vec_id AS cand_id,
           row_number() OVER (PARTITION BY p.query_id
             ORDER BY {_duck_cos('p.q_emb', 'a.embedding')} DESC, a.vec_id ASC) AS rnk
    FROM probes p JOIN asg a ON p.cell = a.cell
    WHERE p.query_id <> a.vec_id
  ) WHERE rnk <= 5
), hits AS (
  SELECT e.query_id, count(*) AS n_common
  FROM exact e JOIN approx x ON e.query_id = x.query_id AND e.cand_id = x.cand_id
  GROUP BY e.query_id
), base AS (
  SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id
)
SELECT base.query_id, n_exact,
       coalesce(n_common, 0) AS n_common,
       coalesce(n_common, 0) * 1000000 // n_exact AS recall_ppm
FROM base LEFT JOIN hits ON hits.query_id = base.query_id
"""

# --------------------------------------------------------------------------
# EXT E175-E176 — matryoshka truncation audit, cohort LTV curve
# --------------------------------------------------------------------------

def _duck_cos_slice(a: str, b: str, length: int) -> str:
    sa = f"list_slice({a}, 1, {length})"
    sb = f"list_slice({b}, 1, {length})"
    return (
        f"list_sum(list_transform(list_zip({sa}, {sb}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform({sa}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform({sb}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
    )


QUERIES["truncation_quality"] = _sim.truncation_quality
ORACLES["truncation_quality"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS cand_id, embedding AS c_emb FROM embeddings
), scored AS (
  SELECT query_id, cand_id,
         {", ".join(
           f"CAST(round(abs({_duck_cos_slice('q_emb', 'c_emb', L)} - {_duck_cos_slice('q_emb', 'c_emb', 64)}) * 1000000) AS BIGINT) AS d{L}"
           for L in (8, 16, 32)
         )}
  FROM q JOIN c ON query_id <> cand_id
)
SELECT 8 AS prefix_dims, count(*) AS n_pairs,
       sum(d8) // count(*) AS mean_absdelta_micro,
       max(d8) AS max_absdelta_micro
FROM scored WHERE d8 IS NOT NULL
UNION ALL
SELECT 16, count(*), sum(d16) // count(*), max(d16) FROM scored WHERE d16 IS NOT NULL
UNION ALL
SELECT 32, count(*), sum(d32) // count(*), max(d32) FROM scored WHERE d32 IS NOT NULL
"""

QUERIES["cohort_ltv_curve"] = relational.cohort_ltv_curve
ORACLES["cohort_ltv_curve"] = f"""
WITH per AS (
  SELECT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) AS m,
         sum({duck_units("o_totalprice", 2)}) AS spend
  FROM orders GROUP BY 1, 2
), cohorts AS (
  SELECT o_custkey, min(m) AS m0 FROM per GROUP BY o_custkey
), sizes AS (
  SELECT m0, count(*) AS n_users FROM cohorts GROUP BY m0
), inc AS (
  SELECT c.m0, p.m - c.m0 AS tenure, sum(p.spend) AS inc_cents
  FROM per p JOIN cohorts c USING (o_custkey)
  GROUP BY 1, 2
)
SELECT m0 AS cohort_month, tenure, n_users,
       sum(inc_cents) OVER (PARTITION BY m0 ORDER BY tenure
                            ROWS UNBOUNDED PRECEDING) AS cum_cents,
       sum(inc_cents) OVER (PARTITION BY m0 ORDER BY tenure
                            ROWS UNBOUNDED PRECEDING) // n_users AS avg_ltv_cents
FROM inc JOIN sizes USING (m0)
"""

# --------------------------------------------------------------------------
# EXT E177-E178 — duplicate-payment screen, contamination taint closure
# --------------------------------------------------------------------------

QUERIES["duplicate_payment_pairs"] = relational.duplicate_payment_pairs
ORACLES["duplicate_payment_pairs"] = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, {duck_units("o_totalprice", 2)} AS cents,
         epoch_ms(o_orderdate) // 86400000 AS day
  FROM orders
), o AS (
  SELECT * FROM base
  UNION ALL
  SELECT o_orderkey + 1000000000, o_custkey, cents, day + 1
  FROM base WHERE o_orderkey % 97 = 0
)
SELECT a.o_custkey AS custkey, a.o_orderkey AS order_a,
       b.o_orderkey AS order_b, a.cents AS amount_cents,
       abs(a.day - b.day) AS day_gap
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.cents = b.cents
 AND a.o_orderkey < b.o_orderkey
WHERE abs(a.day - b.day) <= 1
"""

QUERIES["taint_closure_report"] = dedup.taint_closure_report
