"""Registry segment 4/13 — mechanically split from the
round-4 plans/registry.py (12k lines). QUERIES insertion order is
load-bearing (the driver's correctness window samples the first 50
entries), so each segment imports its predecessor: importing ANY
segment executes the full prefix in the original order.
"""
from __future__ import annotations

from parquet_to_csv_spark.plans.registry_core import (QUERIES, ORACLES, query)  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts import p03 as _prev_segment  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p01 import (  # noqa: F401
    _EN_SW,
    _TOKS,
    _duck_cos,
    dedup,
    duck_units,
    relational,
    text,
    timeops,
)
from parquet_to_csv_spark.plans.registry_parts.p02 import _sim, corpus  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p03 import (  # noqa: F401
    _sketch,
    duck_md5_bucket,
    mlmetrics,
)

ORACLES["feature_hashing"] = f"""
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
  GROUP BY 1, 2
), cells AS (
  SELECT doc_id,
         CAST({duck_md5_bucket('term', 1024)} AS BIGINT) AS idx,
         CAST(sum(CASE WHEN {duck_md5_bucket("'sign:' || term", 2)} = 0
                       THEN tf ELSE -tf END) AS BIGINT) AS val
  FROM tf GROUP BY 1, 2
), nz AS (SELECT * FROM cells WHERE val <> 0)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS nnz,
       CAST(sum(abs(val)) AS BIGINT) AS l1,
       md5(string_agg(idx || ':' || val, ',' ORDER BY idx)) AS vec_digest
FROM nz GROUP BY doc_id
"""

# Split-leakage audit: md5 split + gram-keyed containment, worst
# offender per val doc via relational argmax.
QUERIES["split_leakage"] = corpus.split_leakage
ORACLES["split_leakage"] = f"""
WITH g AS (
  SELECT DISTINCT doc_id, {duck_md5_bucket('doc_id', 100)} AS bucket,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
         toks[i+3] || ' ' || toks[i+4] AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
        WHERE len(toks) >= 5)
), v AS (SELECT doc_id AS val_doc, gram FROM g WHERE bucket >= 80
), tr AS (SELECT doc_id AS train_doc, gram FROM g WHERE bucket < 80
), sizes AS (SELECT val_doc, CAST(count(*) AS BIGINT) AS n_grams FROM v GROUP BY 1
), shared AS (
  SELECT val_doc, train_doc, CAST(count(*) AS BIGINT) AS n_shared
  FROM v JOIN tr USING (gram) GROUP BY 1, 2
), scored AS (
  SELECT shared.val_doc, train_doc, n_grams,
         n_shared * 1000000 // n_grams AS containment_ppm
  FROM shared JOIN sizes ON shared.val_doc = sizes.val_doc
  WHERE n_shared * 1000000 // n_grams >= 500000
), worst AS (SELECT val_doc, max(containment_ppm) AS mx FROM scored GROUP BY 1)
SELECT s.val_doc, min(s.train_doc) AS train_doc,
       CAST(any_value(s.n_grams) AS BIGINT) AS n_grams,
       CAST(any_value(s.mx) AS BIGINT) AS containment_ppm
FROM (SELECT scored.*, worst.mx FROM scored
      JOIN worst ON scored.val_doc = worst.val_doc
                AND scored.containment_ppm = worst.mx) s
GROUP BY s.val_doc
"""

# Calendar gap-fill + forward fill over each user's own active span.
QUERIES["daily_balance_gapfill"] = timeops.daily_balance_gapfill
ORACLES["daily_balance_gapfill"] = f"""
WITH d AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         CAST(sum({duck_units('value', 2)}) AS BIGINT) AS day_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), span AS (
  SELECT user_id, min(day) AS mn, max(day) AS mx FROM d GROUP BY 1
), spine AS (
  SELECT user_id, unnest(generate_series(mn, mx)) AS day FROM span
), j AS (
  SELECT spine.user_id, spine.day, d.day_cents
  FROM spine LEFT JOIN d ON spine.user_id = d.user_id AND spine.day = d.day
)
SELECT user_id, day,
       last_value(day_cents IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
       day_cents IS NULL AS is_gap
FROM j
"""

# --------------------------------------------------------------------------
# EXT E114-E118 — ranking eval, quota sampling, classifier eval,
# association rules, graph clustering coefficient
# --------------------------------------------------------------------------

# NDCG@10 vs label-match relevance. The ranked CTE replays the
# gate-verified cosine ranking; discounts/IDCG are integer micro-units.
QUERIES["ndcg_label_match"] = _sim.ndcg_label_match
ORACLES["ndcg_label_match"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS cand_id, embedding AS c_emb, label AS c_label FROM embeddings
), scored AS (
  SELECT query_id, q_label, cand_id, c_label,
         {_duck_cos('q_emb', 'c_emb')} AS sim
  FROM q JOIN c ON query_id <> cand_id
), ranked AS (
  SELECT query_id, q_label, c_label,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id ASC) AS rnk
  FROM scored
), topk AS (SELECT * FROM ranked WHERE rnk <= 10
), per_q AS (
  SELECT query_id, q_label,
         CAST(sum(CASE WHEN q_label = c_label
                  THEN CAST(round(1e6 / log2(rnk + 1), 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS dcg_units,
         CAST(sum(CASE WHEN q_label = c_label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rel_at_k
  FROM topk GROUP BY 1, 2
), lab AS (
  SELECT label, count(*) AS n_label FROM embeddings GROUP BY 1
), idcg AS (
  SELECT query_id, n_rel_at_k, dcg_units,
         CASE WHEN least(10, n_label - 1) >= 1 THEN
           CAST(list_sum(list_transform(range(1, least(10, n_label - 1) + 1),
                i -> CAST(round(1e6 / log2(i + 1), 0) AS BIGINT))) AS BIGINT)
         END AS idcg_units
  FROM per_q JOIN lab ON per_q.q_label = lab.label
)
SELECT query_id, n_rel_at_k, dcg_units,
       CASE WHEN idcg_units > 0
            THEN dcg_units * 1000000 // idcg_units END AS ndcg_ppm
FROM idcg
"""

# Fixed-size per-group quota sample in md5 order.
QUERIES["group_sample_fixed"] = corpus.group_sample_fixed
ORACLES["group_sample_fixed"] = """
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS sample_rank
  FROM documents
)
SELECT doc_id, lang, sample_rank FROM r WHERE sample_rank <= 20
"""

# Lang-ID confusion matrix: the lang_id oracle lifted to cell counts.
QUERIES["langid_confusion"] = text.langid_confusion
ORACLES["langid_confusion"] = f"""
WITH t AS (
  SELECT doc_id, lang, list_distinct({_TOKS}) AS dtoks FROM documents
), s AS (
  SELECT lang,
         CASE WHEN len(dtoks) > 0
              THEN len(list_intersect(dtoks, {_EN_SW})) / CAST(len(dtoks) AS DOUBLE) END AS score
  FROM t
), p AS (
  SELECT lang AS true_lang,
         CASE WHEN score >= 0.05 THEN 'en' ELSE 'unknown' END AS predicted_lang
  FROM s
), conf AS (
  SELECT true_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM p GROUP BY 1, 2
), tot AS (
  SELECT true_lang, CAST(sum(n_docs) AS BIGINT) AS n_true FROM conf GROUP BY 1
)
SELECT conf.true_lang, predicted_lang, n_docs,
       n_docs * 1000000 // n_true AS share_ppm
FROM conf JOIN tot ON conf.true_lang = tot.true_lang
"""

# Association rules: integer-ppm support/confidence/lift, top-k by lift.
QUERIES["association_rules"] = relational.association_rules
ORACLES["association_rules"] = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), item AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c_item FROM li GROUP BY 1
), n AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM li
), pairs AS (
  SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
         CAST(count(*) AS BIGINT) AS c_ab
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 5
)
SELECT antecedent, consequent, c_ab,
       c_ab * 1000000 // n_orders AS support_ppm,
       c_ab * 1000000 // x.c_item AS confidence_ppm,
       c_ab * n_orders * 1000000 // (x.c_item * y.c_item) AS lift_ppm
FROM pairs
JOIN item x ON pairs.antecedent = x.l_partkey
JOIN item y ON pairs.consequent = y.l_partkey
CROSS JOIN n
ORDER BY lift_ppm DESC, antecedent, consequent
LIMIT 25
"""

# Clustering coefficient over the exact near-dup graph; the oracle
# rebuilds edges from the exact-Jaccard relation and closes triangles
# with the same oriented wedge join.
QUERIES["clustering_coefficient"] = dedup.clustering_coefficient
ORACLES["clustering_coefficient"] = f"""
WITH t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), e AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
              / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.8
), deg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS degree
  FROM (SELECT a AS doc_id FROM e UNION ALL SELECT b FROM e) GROUP BY 1
), tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM e e1 JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), pv AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
  FROM (SELECT a AS doc_id FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri) GROUP BY 1
)
SELECT deg.doc_id, degree,
       COALESCE(pv.n_triangles, 0) AS n_triangles,
       CASE WHEN degree >= 2
            THEN 2 * COALESCE(pv.n_triangles, 0) * 1000000
                 // (degree * (degree - 1)) END AS cc_ppm
FROM deg LEFT JOIN pv ON deg.doc_id = pv.doc_id
"""

# --------------------------------------------------------------------------
# EXT E119-E123 — CUSUM, weighted median, calibration, vocab, dim profile
# --------------------------------------------------------------------------

# CUSUM via the prefix-closure rewrite S_t = P_t - min(0, min P_j);
# the oracle replays the same two windows.
QUERIES["cusum_changepoints"] = timeops.cusum_changepoints
ORACLES["cusum_changepoints"] = f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         {duck_units('value', 2)} AS cents
  FROM events WHERE event_type = 'purchase'
), mu AS (
  SELECT user_id, CAST(sum(cents) // count(*) AS BIGINT) AS mu0 FROM p GROUP BY 1
), d AS (
  SELECT p.*, sum(cents - mu0) OVER (
           PARTITION BY p.user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
  FROM p JOIN mu ON p.user_id = mu.user_id
), s AS (
  SELECT user_id, event_id, ts_us, cents,
         pfx - least(CAST(0 AS BIGINT), min(pfx) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum_cents
  FROM d
)
SELECT user_id, event_id, ts_us, cents, cusum_cents,
       cusum_cents > 10000 AS alarm
FROM s
"""

# Exact weighted median: first value whose running weight reaches half
# the group total, on the unique (price, orderkey, linenumber) order.
QUERIES["weighted_median_price"] = relational.weighted_median_price
ORACLES["weighted_median_price"] = """
WITH li AS (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS w,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM lineitem
), run AS (
  SELECT l_returnflag, price_cents, w,
         sum(w) OVER (PARTITION BY l_returnflag
                      ORDER BY price_cents, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
  FROM li
), tot AS (
  SELECT l_returnflag, CAST(sum(w) AS BIGINT) AS totw FROM li GROUP BY 1
)
SELECT run.l_returnflag,
       CAST(min(price_cents) AS BIGINT) AS median_cents,
       CAST(any_value(totw) AS BIGINT) AS total_weight
FROM run JOIN tot ON run.l_returnflag = tot.l_returnflag
WHERE 2 * cumw >= totw
GROUP BY run.l_returnflag
"""

# Calibration deciles of the lang-ID score vs true-label rate.
QUERIES["calibration_bins"] = text.calibration_bins
ORACLES["calibration_bins"] = f"""
WITH t AS (
  SELECT doc_id, lang, list_distinct({_TOKS}) AS dtoks FROM documents
), s AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos,
         CAST(floor(round(
           CASE WHEN len(dtoks) > 0
                THEN len(list_intersect(dtoks, {_EN_SW}))
                     / CAST(len(dtoks) AS DOUBLE) END, 4) * 10000 + 0.5)
           AS BIGINT) AS score_e4
  FROM t
), b AS (
  SELECT is_pos, score_e4,
         ntile(10) OVER (ORDER BY score_e4, doc_id) AS bin
  FROM s
)
SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_pos) AS BIGINT) AS n_pos,
       sum(is_pos) * 1000000 // count(*) AS pos_rate_ppm,
       sum(score_e4) // count(*) AS mean_score_e4
FROM b GROUP BY bin
"""

# Vocabulary dictionary: ids in (freq desc, token) order + cumulative
# corpus coverage ppm.
QUERIES["vocab_dictionary"] = text.vocab_dictionary
ORACLES["vocab_dictionary"] = f"""
WITH counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({_TOKS}) AS token FROM documents) GROUP BY 1
), tot AS (SELECT CAST(sum(freq) AS BIGINT) AS t_total FROM counts
), top AS (
  SELECT token, freq FROM counts ORDER BY freq DESC, token LIMIT 1000
)
SELECT row_number() OVER (ORDER BY freq DESC, token) AS token_id,
       token, freq,
       (sum(freq) OVER (ORDER BY freq DESC, token
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         * 1000000 // t_total AS coverage_ppm
FROM top CROSS JOIN tot
"""

# Per-dimension embedding profile; DECIMAL-exact sums (centroid
# convention), one rounded division.
QUERIES["embedding_dim_profile"] = _sim.embedding_dim_profile
ORACLES["embedding_dim_profile"] = """
WITH ex AS (
  SELECT u.pos - 1 AS pos, u.val
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
                       unnest(embedding) AS val) u
)
SELECT pos, CAST(count(*) AS BIGINT) AS n_vecs,
       round(CAST(sum(CAST(val AS DECIMAL(27,10))) AS DOUBLE) / count(*), 6)
         AS mean_val,
       min(CAST(val AS DOUBLE)) AS min_val,
       max(CAST(val AS DOUBLE)) AS max_val
FROM ex GROUP BY pos
"""

# --------------------------------------------------------------------------
# EXT E124-E127 — outer stream-stream join, log-bucket quantile sketch,
# boilerplate n-grams, label propagation
# --------------------------------------------------------------------------
from parquet_to_csv_spark.streaming import stream as _stream2  # noqa: E402

# Left-outer stream-stream join drained availableNow == the batch LEFT
# JOIN with the identical time band (watermark flushes the unmatched).
QUERIES["streaming_left_join_drain"] = _stream2.left_join_drain_query
ORACLES["streaming_left_join_drain"] = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_time FROM events
  WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS click_id, user_id, ts AS c_time FROM events
  WHERE event_type = 'click'
)
SELECT purchase_id, p.user_id, epoch_us(p_time) AS purchase_us,
       click_id, epoch_us(c_time) AS click_us
FROM p LEFT JOIN c
  ON p.user_id = c.user_id
 AND c.c_time >= p.p_time - INTERVAL 1 HOUR
 AND c.c_time <= p.p_time
"""

# Log-bucket quantile sketch: replayed bucket-for-bucket in SQL.
QUERIES["logbucket_quantiles"] = _sketch.logbucket_quantiles
ORACLES["logbucket_quantiles"] = """
WITH b AS (
  SELECT length(CAST(cents AS VARCHAR)) AS digits,
         CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS lead,
         count(*) AS n
  FROM (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders)
  GROUP BY 1, 2
), r AS (
  SELECT digits, lead, n,
         sum(n) OVER (ORDER BY digits, lead
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         row_number() OVER (ORDER BY digits, lead) AS ord
  FROM b
), t AS (SELECT max(cum_n) AS n_total FROM r
), q AS (SELECT unnest([500000, 900000, 990000]) AS q_ppm
), hit AS (
  SELECT q_ppm, min(ord) AS ord
  FROM r CROSS JOIN t CROSS JOIN q
  WHERE cum_n >= (q_ppm * n_total + 999999) // 1000000
  GROUP BY q_ppm
)
SELECT CAST(q_ppm AS BIGINT) AS q_ppm,
       CAST(lead AS BIGINT) * CAST(pow(10, digits - 1) AS BIGINT) AS est_lo_cents,
       digits, lead, CAST(cum_n AS BIGINT) AS cum_n,
       CAST(n_total AS BIGINT) AS n_total
FROM hit JOIN r USING (ord) CROSS JOIN t
"""

# Cross-document boilerplate n-grams (per-doc distinct, top-k by reach).
QUERIES["boilerplate_ngrams"] = text.boilerplate_ngrams
ORACLES["boilerplate_ngrams"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), g AS (
  SELECT DISTINCT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
         toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 4)) AS i
        FROM t WHERE len(toks) >= 6)
), nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT gram, CAST(count(*) AS BIGINT) AS doc_count,
       count(*) * 1000000 // n_docs AS doc_share_ppm
FROM g CROSS JOIN nd
GROUP BY gram, n_docs
ORDER BY doc_count DESC, gram
LIMIT 20
"""

# Label propagation, 2 synchronous rounds unrolled as CTE levels.
QUERIES["label_propagation"] = dedup.label_propagation
ORACLES["label_propagation"] = f"""
WITH t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), e AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
              / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.8
), nbr AS (
  SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b, a FROM e
), l0 AS (
  SELECT DISTINCT node, node AS lbl FROM nbr
), c1 AS (
  SELECT nbr.node, l0.lbl, count(*) AS c
  FROM nbr JOIN l0 ON nbr.nbr = l0.node GROUP BY 1, 2
), m1 AS (SELECT node, max(c) AS mc FROM c1 GROUP BY 1
), l1 AS (
  SELECT c1.node, min(c1.lbl) AS lbl
  FROM c1 JOIN m1 ON c1.node = m1.node AND c1.c = m1.mc GROUP BY 1
), c2 AS (
  SELECT nbr.node, l1.lbl, count(*) AS c
  FROM nbr JOIN l1 ON nbr.nbr = l1.node GROUP BY 1, 2
), m2 AS (SELECT node, max(c) AS mc FROM c2 GROUP BY 1
), l2 AS (
  SELECT c2.node, min(c2.lbl) AS lbl
  FROM c2 JOIN m2 ON c2.node = m2.node AND c2.c = m2.mc GROUP BY 1
)
SELECT node AS doc_id, lbl AS community FROM l2
"""

# --------------------------------------------------------------------------
# EXT E128-E132 — growth, acquisition split, percentile ranks, vocab
# drift, churn-risk features
# --------------------------------------------------------------------------

# MoM growth with explicit floor division on both sides (signed ppm).
QUERIES["monthly_growth"] = timeops.monthly_growth
_MG_NUM = "((rev_cents - prev_cents) * 1000000)"
ORACLES["monthly_growth"] = f"""
WITH per AS (
  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum({duck_units('o_totalprice', 2)}) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
), s AS (
  SELECT ym, n_orders, rev_cents,
         lag(rev_cents, 1) OVER (ORDER BY ym) AS prev_cents
  FROM per
)
SELECT ym, n_orders, rev_cents,
       CASE WHEN prev_cents > 0 THEN
         ({_MG_NUM} - (({_MG_NUM} % prev_cents + prev_cents) % prev_cents))
           // prev_cents
       END AS mom_growth_ppm
FROM s
"""

# Weekly new-vs-returning split from the (user, week) grain.
QUERIES["new_vs_returning"] = timeops.new_vs_returning
ORACLES["new_vs_returning"] = """
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events
), f AS (
  SELECT user_id, min(week) AS first_week FROM uw GROUP BY 1
)
SELECT week,
       CAST(sum(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(sum(CASE WHEN week <> first_week THEN 1 ELSE 0 END) AS BIGINT) AS returning_users,
       sum(CASE WHEN week <> first_week THEN 1 ELSE 0 END) * 1000000
         // count(*) AS returning_share_ppm
FROM uw JOIN f USING (user_id)
GROUP BY week
"""

# Exact-ppm percent_rank / cume_dist on the unique value order.
QUERIES["order_percentile_ranks"] = relational.order_percentile_ranks
ORACLES["order_percentile_ranks"] = """
WITH b AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), r AS (
  SELECT o_orderkey, cents,
         row_number() OVER (ORDER BY cents, o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM b
)
SELECT o_orderkey, cents,
       (rn - 1) * 1000000 // (n - 1) AS pct_rank_ppm,
       rn * 1000000 // n AS cume_dist_ppm
FROM r
"""

# Day-over-day top-k vocabulary Jaccard drift.
QUERIES["vocab_drift_daily"] = text.vocab_drift_daily
ORACLES["vocab_drift_daily"] = f"""
WITH c AS (
  SELECT doc_id % 10 AS day, token, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
  GROUP BY 1, 2
), top AS (
  SELECT day, token FROM (
    SELECT day, token,
           row_number() OVER (PARTITION BY day ORDER BY freq DESC, token) AS rnk
    FROM c
  ) WHERE rnk <= 20
), sz AS (
  SELECT day, CAST(count(*) AS BIGINT) AS sz FROM top GROUP BY 1
), inter AS (
  SELECT a.day AS day_a, b.day AS day_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM top a JOIN top b ON b.day = a.day + 1 AND a.token = b.token
  GROUP BY 1, 2
)
SELECT day_a, day_b, n_shared,
       n_shared * 1000000 // (x.sz + y.sz - n_shared) AS jaccard_ppm
FROM inter
JOIN sz x ON inter.day_a = x.day
JOIN sz y ON inter.day_b = y.day
"""

# Point-in-time churn-risk features at a fixed snapshot.
QUERIES["churn_risk_features"] = timeops.churn_risk_features
ORACLES["churn_risk_features"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
  WHERE epoch_us(ts) <= 1706659032195000
)
SELECT user_id,
       CAST(1706659032195000 - max(ts_us) AS BIGINT) AS recency_us,
       CAST(count(*) AS BIGINT) AS n_events_total,
       CAST(sum(CASE WHEN ts_us >= 1706659032195000 - 604800000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_events_7d,
       CAST(sum(CASE WHEN ts_us >= 1706659032195000 - 2592000000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_events_30d,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchases
FROM e GROUP BY user_id
"""

# --------------------------------------------------------------------------
# EXT E133-E134 — sweep-line concurrency, market concentration
# --------------------------------------------------------------------------

# Peak concurrency per hour: sweep-line prefix sum over span endpoints
# (end before start at equal instants — half-open spans). The oracle
# uses the plain global window the engine decomposes two-phase.
QUERIES["max_concurrent_spans"] = timeops.max_concurrent_spans
ORACLES["max_concurrent_spans"] = f"""
WITH spans AS (
  SELECT event_id, epoch_us(ts) AS s_us,
         epoch_us(ts) + {duck_units('value', 2)} * 10 AS e_us
  FROM events
), pts AS (
  SELECT s_us AS t, 1 AS d, event_id FROM spans
  UNION ALL
  SELECT e_us AS t, -1 AS d, event_id FROM spans
), run AS (
  SELECT t, sum(d) OVER (ORDER BY t, d, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM pts
)
SELECT t // 3600000000 AS hour_bucket,
       CAST(max(running) AS BIGINT) AS max_concurrent
FROM run GROUP BY 1
"""

# Nation-level supplier HHI from floored integer ppm shares.
QUERIES["nation_supplier_hhi"] = relational.nation_supplier_hhi
ORACLES["nation_supplier_hhi"] = f"""
WITH rev AS (
  SELECT l_suppkey,
         sum({duck_units('l_extendedprice * (1 - l_discount)', 4)}) AS rev_u4
  FROM lineitem GROUP BY 1
), per AS (
  SELECT s_nationkey, rev_u4
  FROM rev JOIN supplier ON l_suppkey = s_suppkey
), nat AS (
  SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
         sum(rev_u4) AS nat_u4
  FROM per GROUP BY 1
), shares AS (
  SELECT per.s_nationkey, nat.n_suppliers,
         CAST(per.rev_u4 * 1000000 // nat.nat_u4 AS BIGINT) AS share_ppm
  FROM per JOIN nat ON per.s_nationkey = nat.s_nationkey
)
SELECT s_nationkey, any_value(n_suppliers) AS n_suppliers,
       CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm,
       CAST(max(share_ppm) AS BIGINT) AS top_share_ppm
FROM shares GROUP BY s_nationkey
"""

# --------------------------------------------------------------------------
# EXT E135-E136 — item-item CF neighbors, inter-arrival burstiness
# --------------------------------------------------------------------------

# Item-item cosine: ranking on integer cos² ppm, never a float.
QUERIES["item_item_cosine_topk"] = relational.item_item_cosine_topk
ORACLES["item_item_cosine_topk"] = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), item AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c_item FROM li GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS item, b.l_partkey AS neighbor,
         CAST(count(*) AS BIGINT) AS c_ab
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 3
), scored AS (
  SELECT item, neighbor, c_ab,
         CAST(c_ab * c_ab * 1000000 // (x.c_item * y.c_item) AS BIGINT)
           AS cos_sq_ppm
  FROM pairs
  JOIN item x ON pairs.item = x.l_partkey
  JOIN item y ON pairs.neighbor = y.l_partkey
), ranked AS (
  SELECT item, neighbor, c_ab, cos_sq_ppm,
         row_number() OVER (PARTITION BY item
                            ORDER BY cos_sq_ppm DESC, c_ab DESC, neighbor ASC)
           AS rnk
  FROM scored
)
SELECT item, neighbor, c_ab, cos_sq_ppm, rnk FROM ranked WHERE rnk <= 3
"""

# Burstiness from exact second-grain gap sums; σ and B are a fixed
# IEEE pipeline on identical longs.
QUERIES["interarrival_burstiness"] = timeops.interarrival_burstiness
ORACLES["interarrival_burstiness"] = """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
  WHERE event_type = 'purchase'
), g AS (
  SELECT user_id,
         (ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id)) // 1000000 AS g
  FROM p
), s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(g) AS BIGINT) AS s1, CAST(sum(g * g) AS BIGINT) AS s2
  FROM g WHERE g IS NOT NULL GROUP BY 1
  HAVING count(*) >= 2
)
SELECT user_id, n_gaps,
       s1 // n_gaps AS mean_gap_s,
       round(sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)
                  / CAST(n_gaps * n_gaps AS DOUBLE)), 3) AS sd_gap_s,
       round((sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)
                   / CAST(n_gaps * n_gaps AS DOUBLE))
              - CAST(s1 AS DOUBLE) / n_gaps)
             / (sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)
                     / CAST(n_gaps * n_gaps AS DOUBLE))
                + CAST(s1 AS DOUBLE) / n_gaps), 6) AS burstiness
FROM s
"""

# --------------------------------------------------------------------------
# EXT E137-E138 — label-noise outliers, per-source dataset card
# --------------------------------------------------------------------------

# Distance-to-centroid outliers; the oracle replays the decimal-exact
# centroid means and the integer-unit square sums.
QUERIES["embedding_outlier_scores"] = _sim.embedding_outlier_scores
ORACLES["embedding_outlier_scores"] = """
WITH ex AS (
  SELECT vec_id, label, u.pos - 1 AS pos, u.val
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
                       unnest(embedding) AS val) u
), cent AS (
  SELECT label, pos,
         round(CAST(sum(CAST(val AS DECIMAL(27,10))) AS DOUBLE) / count(*), 6)
           AS mu
  FROM ex GROUP BY 1, 2
), dist AS (
  SELECT vec_id, ex.label,
         CAST(sum(CAST(round((CAST(ex.val AS DOUBLE) - cent.mu) * 1e6, 0)
                       AS BIGINT)
                  * CAST(round((CAST(ex.val AS DOUBLE) - cent.mu) * 1e6, 0)
                        AS BIGINT)) AS BIGINT) AS dist_sq_e12
  FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
  GROUP BY 1, 2
), r AS (
  SELECT label, vec_id, dist_sq_e12,
         row_number() OVER (PARTITION BY label
                            ORDER BY dist_sq_e12 DESC, vec_id ASC) AS rnk
  FROM dist
)
SELECT label, vec_id, dist_sq_e12, rnk FROM r WHERE rnk <= 5
"""

# Per-source dataset card: dup rate + quality pass rate in one scan.
QUERIES["source_quality_report"] = corpus.source_quality_report
ORACLES["source_quality_report"] = f"""
WITH base AS (
  SELECT source,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         len({_TOKS}) AS nt,
         CASE WHEN len({_TOKS}) >= 5
               AND len(list_distinct({_TOKS}))
                   / CAST(len({_TOKS}) AS DOUBLE) >= 0.3
               AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   / CAST(length(text) AS DOUBLE) >= 0.5
              THEN 1 ELSE 0 END AS ok
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       (count(*) - count(DISTINCT fp)) * 1000000 // count(*) AS dup_ppm,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       sum(ok) * 1000000 // count(*) AS quality_ok_ppm
FROM base GROUP BY source
"""

# --------------------------------------------------------------------------
# EXT E139-E140 — span-level dedup scrub, bigram LM scoring
# --------------------------------------------------------------------------

# Repeated-span removal with exact reassembled-text fingerprints; the
# oracle replays the hot-gram set, position coverage, and the
# position-ordered rebuild.
QUERIES["span_dedup_scrub"] = corpus.span_dedup_scrub
ORACLES["span_dedup_scrub"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), occ AS (
  SELECT doc_id, u.i AS s, concat_ws(' ', list_slice(t, u.i, u.i + 3)) AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 3)) AS i) u
  WHERE len(t) >= 4
), hot AS (
  SELECT gram FROM occ GROUP BY gram HAVING count(DISTINCT doc_id) >= 3
), cov AS (
  SELECT DISTINCT occ.doc_id, occ.s + v.d AS pos
  FROM occ JOIN hot USING (gram),
       LATERAL (SELECT unnest(generate_series(0, 3)) AS d) v
), positions AS (
  SELECT doc_id, u.pos, u.tok
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS pos,
                             unnest(t) AS tok) u
  WHERE len(t) > 0
), kept AS (
  SELECT p.doc_id, p.pos, p.tok
  FROM positions p ANTI JOIN cov c ON p.doc_id = c.doc_id AND p.pos = c.pos
), totals AS (
  SELECT doc_id, count(*) AS n_tokens FROM positions GROUP BY doc_id
), scrub AS (
  SELECT doc_id, count(*) AS n_kept,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens,
       t.n_tokens - coalesce(s.n_kept, 0) AS n_removed,
       coalesce(s.fp, md5('')) AS scrubbed_fp
FROM totals t LEFT JOIN scrub s USING (doc_id)
WHERE t.n_tokens - coalesce(s.n_kept, 0) > 0
"""

# Add-one bigram LM; micro-nat integer log-probs, exact long sums.
QUERIES["bigram_lm_score"] = corpus.bigram_lm_score
ORACLES["bigram_lm_score"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), pairs AS (
  SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) u
  WHERE len(t) >= 2
), tf AS (
  SELECT doc_id, w1, w2, count(*) AS tf FROM pairs GROUP BY doc_id, w1, w2
), big AS (
  SELECT w1, w2, sum(tf) AS c12 FROM tf GROUP BY w1, w2
), uni AS (
  SELECT w1, sum(c12) AS c1 FROM big GROUP BY w1
), vocab AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
)
SELECT doc_id, sum(tf) AS n_bigrams,
       floor(sum(tf * CAST(round(ln((c12 + 1) / CAST(c1 + v AS DOUBLE)) * 1000000)
                           AS BIGINT))
             / sum(tf)) / 1000000.0 AS avg_logprob
FROM tf JOIN big USING (w1, w2) JOIN uni USING (w1), vocab
GROUP BY doc_id
"""

# --------------------------------------------------------------------------
# EXT E141-E142 — chi-squared distinctive tokens, seasonal-naive backtest
# --------------------------------------------------------------------------

# 2x2 presence contingency per (lang, token); chi2 as ONE fixed
# IEEE-double expression over identical exact longs in both engines.
from parquet_to_csv_spark.operators import text as _text  # noqa: E402

QUERIES["chi2_distinctive_tokens"] = _text.chi2_distinctive_tokens
ORACLES["chi2_distinctive_tokens"] = f"""
WITH pres AS (
  SELECT DISTINCT doc_id, lang, unnest(list_distinct({_TOKS})) AS token
  FROM documents
), lang_n AS (
  SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang
), tot AS (
  SELECT count(*) AS n_total FROM documents
), a_rel AS (
  SELECT lang, token, count(*) AS a FROM pres GROUP BY lang, token
), tok_n AS (
  SELECT token, sum(a) AS n_tok FROM a_rel GROUP BY token
), scored AS (
  SELECT a_rel.lang, a_rel.token, a, n_tok, n_lang, n_total,
         a * n_total - n_lang * n_tok AS det
  FROM a_rel JOIN tok_n USING (token) JOIN lang_n ON a_rel.lang = lang_n.lang,
       tot
  WHERE a >= 5 AND n_tok < n_total AND n_lang < n_total
        AND a * n_total - n_lang * n_tok > 0
), chi AS (
  SELECT lang, token, a,
         CAST(floor(CAST(n_total AS DOUBLE) * CAST(det AS DOUBLE)
              * CAST(det AS DOUBLE)
              / (CAST(n_lang AS DOUBLE) * CAST(n_total - n_lang AS DOUBLE)
              * CAST(n_tok AS DOUBLE) * CAST(n_total - n_tok AS DOUBLE))
              * 1000.0) AS BIGINT) AS chi2_milli
  FROM scored
), r AS (
  SELECT lang, token, a, chi2_milli,
         row_number() OVER (PARTITION BY lang
                            ORDER BY chi2_milli DESC, token ASC) AS rnk
  FROM chi
)
SELECT lang, token, a AS n_docs_in, chi2_milli, rnk FROM r WHERE rnk <= 10
"""

# Seasonal-naive backtest; integer day grain, floored MAE/MAPE units.
QUERIES["seasonal_naive_backtest"] = timeops.seasonal_naive_backtest
ORACLES["seasonal_naive_backtest"] = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT a.event_type, count(*) AS n_days,
       sum(abs(a.n - f.n)) * 1000 // count(*) AS mae_milli,
       sum(abs(a.n - f.n) * 1000000 // a.n) // count(*) AS mape_ppm
FROM daily a JOIN daily f
  ON f.event_type = a.event_type AND f.day = a.day - 7
GROUP BY a.event_type
"""

# --------------------------------------------------------------------------
# EXT E143-E144 — KS two-sample drift, behavioral-sequence Markov LM
# --------------------------------------------------------------------------

# KS over the dense (source x value) ECDF grid; integer cross-multiplied
# ECDF comparison, ppm output.
QUERIES["ks_source_pairs"] = mlmetrics.ks_source_pairs
ORACLES["ks_source_pairs"] = """
WITH counts AS (
  SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2
), vals AS (
  SELECT DISTINCT n_chars FROM documents
), srcs AS (
  SELECT source, count(*) AS n_src FROM documents GROUP BY 1
), grid AS (
  SELECT s.source, s.n_src, v.n_chars, coalesce(c.c, 0) AS c
  FROM vals v CROSS JOIN srcs s
  LEFT JOIN counts c ON c.source = s.source AND c.n_chars = v.n_chars
), ecdf AS (
  SELECT source, n_src, n_chars,
         sum(c) OVER (PARTITION BY source ORDER BY n_chars
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM grid
)
SELECT a.source AS source_a, b.source AS source_b,
       a.n_src AS n_a, b.n_src AS n_b,
       max(abs(a.cum * b.n_src - b.cum * a.n_src)) * 1000000
         // (a.n_src * b.n_src) AS ks_d_ppm
FROM ecdf a JOIN ecdf b ON a.n_chars = b.n_chars AND a.source < b.source
GROUP BY 1, 2, 3, 4
"""

# First-order Markov LM over per-user event-type transitions.
QUERIES["event_sequence_lm_score"] = mlmetrics.event_sequence_lm_score
ORACLES["event_sequence_lm_score"] = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), pairs AS (
  SELECT user_id, prev, event_type FROM seq WHERE prev IS NOT NULL
), tf AS (
  SELECT user_id, prev, event_type, count(*) AS tf
  FROM pairs GROUP BY 1, 2, 3
), trans AS (
  SELECT prev, event_type, sum(tf) AS cab FROM tf GROUP BY 1, 2
), ca AS (
  SELECT prev, sum(cab) AS ca FROM trans GROUP BY 1
), kinds AS (
  SELECT count(DISTINCT event_type) AS k FROM events
)
SELECT user_id, sum(tf) AS n_transitions,
       floor(sum(tf * CAST(round(ln((cab + 1) / CAST(ca + k AS DOUBLE)) * 1000000)
                           AS BIGINT))
             / sum(tf)) / 1000000.0 AS avg_logprob
FROM tf JOIN trans USING (prev, event_type) JOIN ca USING (prev), kinds
GROUP BY user_id
"""

# --------------------------------------------------------------------------
# EXT E145-E146 — grouped multivariate OLS, Spearman rank correlation
# --------------------------------------------------------------------------

_OLS_DET = (
    "(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE)"
    " - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))"
    " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE)"
    " - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))"
    " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE)"
    " - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))"
)
_OLS_DET0 = (
    "(CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE)"
    " - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))"
    " - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE)"
    " - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))"
    " + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE)"
    " - CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)))"
)
_OLS_DET1 = (
    "(CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE)"
    " - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))"
    " - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE)"
    " - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))"
    " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE)"
    " - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE)))"
)
_OLS_DET2 = (
    "(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)"
    " - CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE))"
    " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE)"
    " - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE))"
    " + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE)"
    " - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))"
)

QUERIES["grouped_ols_features"] = mlmetrics.grouped_ols_features
ORACLES["grouped_ols_features"] = f"""
WITH base AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 % 24 AS x1,
         (epoch_us(ts) // 86400000000 + 4) % 7 AS x2,
         {duck_units("value", 2)} AS y
  FROM events
), s AS (
  SELECT event_type, count(*) AS n,
         sum(x1) AS s1, sum(x2) AS s2,
         sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
         sum(y) AS sy, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
  FROM base GROUP BY event_type
)
SELECT event_type, n,
       CAST(floor({_OLS_DET0} / {_OLS_DET} * 1000000.0) AS BIGINT) AS b0_micro,
       CAST(floor({_OLS_DET1} / {_OLS_DET} * 1000000.0) AS BIGINT) AS b1_micro,
       CAST(floor({_OLS_DET2} / {_OLS_DET} * 1000000.0) AS BIGINT) AS b2_micro
FROM s WHERE {_OLS_DET} <> 0.0
"""

QUERIES["spearman_by_group"] = mlmetrics.spearman_by_group
ORACLES["spearman_by_group"] = f"""
WITH base AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 % 24 AS x,
         {duck_units("value", 2)} AS y
  FROM events
), ranked AS (
  SELECT event_type,
         2 * rank() OVER (PARTITION BY event_type ORDER BY x)
           + count(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
         2 * rank() OVER (PARTITION BY event_type ORDER BY y)
           + count(*) OVER (PARTITION BY event_type, y) - 1 AS ry
  FROM base
), s AS (
  SELECT event_type, count(*) AS n,
         sum(rx) AS sx, sum(ry) AS sy,
         sum(rx * rx) AS sxx, sum(ry * ry) AS syy, sum(rx * ry) AS sxy
  FROM ranked GROUP BY event_type
)
SELECT event_type, n,
       CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
            * 1000000.0) AS BIGINT) AS rho_micro
FROM s
WHERE sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) <> 0.0
"""
