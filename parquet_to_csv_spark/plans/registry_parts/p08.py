"""Registry segment 8/13 — mechanically split from the
round-4 plans/registry.py (12k lines). QUERIES insertion order is
load-bearing (the driver's correctness window samples the first 50
entries), so each segment imports its predecessor: importing ANY
segment executes the full prefix in the original order.
"""
from __future__ import annotations

from parquet_to_csv_spark.plans.registry_core import (QUERIES, ORACLES, query)  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts import p07 as _prev_segment  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p01 import (  # noqa: F401
    _TOKS,
    _duck_cos,
    dedup,
    duck_units,
    rangejoin,
    relational,
    similarity,
    timeops,
)
from parquet_to_csv_spark.plans.registry_parts.p02 import corpus  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p03 import mlmetrics  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p04 import _text  # noqa: F401

ORACLES["streaming_upsert_drain"] = f"""
WITH ranked AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         {duck_units("value", 2)} AS cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, ts_us AS last_ts_us, event_id AS last_event_id,
       cents / 100.0 AS last_value
FROM ranked WHERE rn = 1
"""

QUERIES["asof_nearest_join"] = rangejoin.asof_nearest_join
ORACLES["asof_nearest_join"] = """
WITH errors AS (
  SELECT event_id AS error_id, user_id, epoch_us(ts) AS e_us
  FROM events WHERE event_type = 'error'
), clicks AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
), cand AS (
  SELECT e.error_id, e.user_id, e.e_us, c.click_id, c.c_us,
         abs(e.e_us - c.c_us) AS gap_us,
         row_number() OVER (PARTITION BY e.error_id
                            ORDER BY abs(e.e_us - c.c_us), c.c_us, c.click_id)
           AS rn
  FROM errors e JOIN clicks c
    ON e.user_id = c.user_id AND abs(e.e_us - c.c_us) <= 3600000000
)
SELECT error_id, user_id, e_us, click_id, c_us AS click_us, gap_us
FROM cand WHERE rn = 1
"""

# --------------------------------------------------------------------------
# EXT E248-E249 — circadian circular stats, retrieval diversity
# --------------------------------------------------------------------------

QUERIES["circadian_profile"] = timeops.circadian_profile
ORACLES["circadian_profile"] = """
WITH e AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS h FROM events
), s AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(round(cos(CAST(h AS DOUBLE) * pi() / 12.0) * 1000000)
                  AS BIGINT)) AS sc,
         sum(CAST(round(sin(CAST(h AS DOUBLE) * pi() / 12.0) * 1000000)
                  AS BIGINT)) AS ss
  FROM e GROUP BY 1
)
SELECT event_type, n,
       CAST(floor(atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE)) * 1000000.0)
            AS BIGINT) AS mean_angle_micro,
       CAST(floor(sqrt(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                       + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
                  / (CAST(n AS DOUBLE) * 1000000.0) * 1000000.0)
            AS BIGINT) AS resultant_ppm
FROM s
"""

QUERIES["retrieval_diversity_report"] = similarity.retrieval_diversity_report
ORACLES["retrieval_diversity_report"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS cand_id, embedding AS c_emb, label FROM embeddings
), ranked AS (
  SELECT query_id, cand_id, c_emb, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_duck_cos('q_emb', 'c_emb')} DESC,
                                     cand_id ASC) AS rnk
  FROM q JOIN c ON query_id <> cand_id
), topk AS (
  SELECT query_id, cand_id, c_emb, label FROM ranked WHERE rnk <= 10
), pairs AS (
  SELECT a.query_id,
         CAST(round(round({_duck_cos('a.c_emb', 'b.c_emb')}, 6) * 1000000)
              AS BIGINT) AS u
  FROM topk a JOIN topk b
    ON a.query_id = b.query_id AND a.cand_id < b.cand_id
), p AS (
  SELECT query_id, count(*) AS n_pairs,
         sum(u) // count(*) AS mean_pair_cosine_micro
  FROM pairs GROUP BY 1
), l AS (
  SELECT query_id, count(DISTINCT label) AS n_labels, count(*) AS k_returned
  FROM topk GROUP BY 1
)
SELECT l.query_id, l.k_returned, l.n_labels, p.n_pairs, p.mean_pair_cosine_micro
FROM l JOIN p USING (query_id)
"""

# --------------------------------------------------------------------------
# EXT E250 — MMR re-ranking (greedy unrolled in the oracle)
# --------------------------------------------------------------------------

QUERIES["mmr_rerank"] = similarity.mmr_rerank


def _mmr_oracle(k: int = 10) -> str:
    head = f"""
WITH q AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5
), c AS MATERIALIZED (
  SELECT vec_id AS cand_id, embedding AS c_emb FROM embeddings
), topk AS MATERIALIZED (
  SELECT query_id, cand_id, c_emb,
         CAST(round(round(sim, 6) * 1000000) AS BIGINT) AS simq_u, rnk
  FROM (
    SELECT query_id, cand_id, c_emb, {_duck_cos('q_emb', 'c_emb')} AS sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {_duck_cos('q_emb', 'c_emb')} DESC,
                                       cand_id ASC) AS rnk
    FROM q JOIN c ON query_id <> cand_id
  ) WHERE rnk <= {k}
), pairs AS MATERIALIZED (
  SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
         CAST(round(round({_duck_cos('a.c_emb', 'b.c_emb')}, 6) * 1000000)
              AS BIGINT) AS pu
  FROM topk a JOIN topk b
    ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
), sel1 AS MATERIALIZED (
  SELECT query_id, cand_id, rnk AS orig_rank, CAST(1 AS BIGINT) AS mmr_rank
  FROM (
    SELECT query_id, cand_id, rnk,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY 7 * simq_u DESC, cand_id ASC) AS pick
    FROM topk
  ) WHERE pick = 1
)"""
    steps = []
    for t in range(2, k + 1):
        prev = f"sel{t - 1}"
        steps.append(f""", sel{t} AS MATERIALIZED (
  SELECT * FROM {prev}
  UNION ALL
  SELECT query_id, cand_id, orig_rank, CAST({t} AS BIGINT) AS mmr_rank
  FROM (
    SELECT tt.query_id, tt.cand_id, tt.rnk AS orig_rank,
           row_number() OVER (
             PARTITION BY tt.query_id
             ORDER BY 7 * tt.simq_u
                      - 3 * (SELECT max(p.pu) FROM pairs p
                             JOIN {prev} s
                               ON s.query_id = p.query_id
                              AND s.cand_id = p.cb
                             WHERE p.query_id = tt.query_id
                               AND p.ca = tt.cand_id) DESC,
                      tt.cand_id ASC) AS pick
    FROM topk tt
    WHERE NOT EXISTS (SELECT 1 FROM {prev} s
                      WHERE s.query_id = tt.query_id
                        AND s.cand_id = tt.cand_id)
  ) WHERE pick = 1
)""")
    return (
        head
        + "".join(steps)
        + f"\nSELECT query_id, cand_id, orig_rank, mmr_rank FROM sel{k}"
    )


ORACLES["mmr_rerank"] = _mmr_oracle()

# --------------------------------------------------------------------------
# EXT E251 — ABC inventory classification
# --------------------------------------------------------------------------

QUERIES["abc_classification"] = relational.abc_classification
ORACLES["abc_classification"] = f"""
WITH per AS (
  SELECT l_partkey,
         sum({duck_units("l_extendedprice * (1 - l_discount)", 4)}) AS rev_u
  FROM lineitem GROUP BY 1
), ranked AS (
  SELECT l_partkey, rev_u,
         row_number() OVER (ORDER BY rev_u DESC, l_partkey ASC) AS rev_rank,
         sum(rev_u) OVER (ORDER BY rev_u DESC, l_partkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_u,
         (SELECT sum(rev_u) FROM per) AS total_u
  FROM per
)
SELECT l_partkey, rev_u / 100.0 / 100.0 AS revenue, rev_rank,
       cum_u // (total_u // 1000000) AS cum_ppm,
       CASE WHEN cum_u * 100 <= total_u * 80 THEN 'A'
            WHEN cum_u * 100 <= total_u * 95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
"""

# --------------------------------------------------------------------------
# EXT E252-E253 — DAU/MAU stickiness, order fill-rate bands
# --------------------------------------------------------------------------

QUERIES["dau_mau_stickiness"] = timeops.dau_mau_stickiness
ORACLES["dau_mau_stickiness"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), e2 AS (
  SELECT user_id, day,
         CAST(year(make_timestamp(day * 86400000000)) * 100
              + month(make_timestamp(day * 86400000000)) AS BIGINT) AS ym
  FROM e
), daily AS (
  SELECT ym, day, count(DISTINCT user_id) AS dau FROM e2 GROUP BY 1, 2
), monthly AS (
  SELECT ym, count(DISTINCT user_id) AS mau FROM e2 GROUP BY 1
), dsum AS (
  SELECT ym, count(*) AS n_days, sum(dau) AS dau_sum FROM daily GROUP BY 1
)
SELECT d.ym, d.n_days, m.mau,
       d.dau_sum // d.n_days AS avg_dau,
       d.dau_sum * 1000000 // (d.n_days * m.mau) AS stickiness_ppm
FROM dsum d JOIN monthly m USING (ym)
"""

QUERIES["order_fill_rate"] = relational.order_fill_rate
ORACLES["order_fill_rate"] = """
WITH anchor AS (
  SELECT max(epoch_ms(l_shipdate) // 86400000) - 30 AS anchor_day FROM lineitem
), per_order AS (
  SELECT l_orderkey, count(*) AS n_lines,
         sum(CASE WHEN epoch_ms(l_shipdate) // 86400000 <= anchor_day
                  THEN 1 ELSE 0 END) AS n_shipped
  FROM lineitem CROSS JOIN anchor GROUP BY 1
), banded AS (
  SELECT l_orderkey,
         CASE WHEN n_shipped = 0 THEN '0%'
              WHEN n_shipped * 2 < n_lines THEN '1-49%'
              WHEN n_shipped < n_lines THEN '50-99%'
              ELSE '100%' END AS fill_band
  FROM per_order
)
SELECT o.o_orderpriority, b.fill_band, count(*) AS n_orders
FROM banded b JOIN orders o ON b.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# EXT E254-E255 — importance-weighted stats, matched-pairs diff
# --------------------------------------------------------------------------

QUERIES["importance_weighted_stats"] = mlmetrics.importance_weighted_stats
ORACLES["importance_weighted_stats"] = """
WITH shares AS (
  SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1
), tot AS (
  SELECT count(*) AS n_tot, count(DISTINCT lang) AS k FROM documents
), weighted AS (
  SELECT d.lang, d.n_chars,
         n_tot * 1000000 // (k * s.n_lang) AS w
  FROM documents d JOIN shares s USING (lang) CROSS JOIN tot
), grps AS (
  SELECT lang AS grp, count(*) AS n, sum(w) AS sw, sum(w * w) AS sww,
         sum(w * n_chars) AS swx
  FROM weighted GROUP BY 1
  UNION ALL
  SELECT 'overall', count(*), sum(w), sum(w * w), sum(w * n_chars)
  FROM weighted
)
SELECT grp, n, swx // sw AS weighted_mean_chars,
       CAST(floor((CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sww AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS ess_ratio_ppm
FROM grps
"""

QUERIES["matched_pairs_diff"] = mlmetrics.matched_pairs_diff
ORACLES["matched_pairs_diff"] = f"""
WITH activity AS (
  SELECT user_id, count(*) AS act FROM events GROUP BY 1
), purch AS (
  SELECT e.event_id, e.user_id,
         ((epoch_us(e.ts) // 86400000000) + 4) % 7 >= 5 AS weekend,
         {duck_units("e.value", 2)} AS cents, a.act
  FROM events e JOIN activity a USING (user_id)
  WHERE e.event_type = 'purchase'
), t AS (
  SELECT event_id AS t_id, cents AS t_cents, act AS t_act
  FROM purch WHERE weekend
), c AS (
  SELECT event_id AS c_id, cents AS c_cents, act AS c_act
  FROM purch WHERE NOT weekend
), matched AS (
  SELECT t_id, t_cents, t_cents - c_cents AS diff FROM (
    SELECT t.t_id, t.t_cents, c.c_cents,
           row_number() OVER (PARTITION BY t.t_id
                              ORDER BY abs(t.t_act - c.c_act), c.c_id) AS rn
    FROM t JOIN c ON abs(t.t_act - c.c_act) <= 8
  ) WHERE rn = 1
)
SELECT count(*) AS n_matched,
       sum(diff) // count(*) AS mean_diff_cents,
       sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS n_positive,
       sum(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS n_negative
FROM matched
"""

# --------------------------------------------------------------------------
# EXT E256-E257 — substitution savings, dow×type mosaic residuals
# --------------------------------------------------------------------------

QUERIES["substitution_savings"] = relational.substitution_savings
ORACLES["substitution_savings"] = f"""
WITH part_c AS (
  SELECT p_type, p_size, p_brand, {duck_units("p_retailprice", 2)} AS cents
  FROM part
), fam AS (
  SELECT p_type, p_size, count(DISTINCT p_brand) AS n_brands,
         count(*) AS n_parts, min(cents) AS min_cents, max(cents) AS max_cents,
         sum(cents) AS sum_cents
  FROM part_c GROUP BY 1, 2
)
SELECT p_type, p_size, n_brands, n_parts,
       min_cents / 100.0 AS cheapest,
       max_cents / 100.0 AS dearest,
       sum_cents // n_parts AS avg_cents,
       (sum_cents // n_parts - min_cents) * 1000000
         // greatest(sum_cents // n_parts, 1) AS savings_ppm
FROM fam WHERE n_brands >= 2
"""

QUERIES["dow_type_residuals"] = timeops.dow_type_residuals
_DTR = (
    "(CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)"
    " / CAST(n AS DOUBLE))"
    " / sqrt(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
)
ORACLES["dow_type_residuals"] = f"""
WITH e AS (
  SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow, event_type
  FROM events
), cells AS (
  SELECT dow, event_type, count(*) AS o FROM e GROUP BY 1, 2
), rows_ AS (
  SELECT dow, count(*) AS r FROM e GROUP BY 1
), cols AS (
  SELECT event_type, count(*) AS c FROM e GROUP BY 1
), tot AS (
  SELECT count(*) AS n FROM e
)
SELECT cells.dow, cells.event_type, cells.o,
       r * c // n AS expected,
       CAST(floor({_DTR} * 1000.0) AS BIGINT) AS resid_milli,
       CASE WHEN abs(CAST(floor({_DTR} * 1000.0) AS BIGINT)) > 2000
            THEN 1 ELSE 0 END AS significant
FROM cells JOIN rows_ USING (dow) JOIN cols USING (event_type) CROSS JOIN tot
"""

# --------------------------------------------------------------------------
# EXT E258-E259 — near-dup evidence, error-interrupted sessions
# --------------------------------------------------------------------------

QUERIES["neardup_evidence"] = dedup.neardup_evidence
ORACLES["neardup_evidence"] = f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS dtoks
  FROM documents
), tdf AS MATERIALIZED (
  SELECT token, count(*) AS df_docs
  FROM (SELECT doc_id, unnest(dtoks) AS token FROM t) GROUP BY 1
), pairs AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(len(list_intersect(a.dtoks, b.dtoks))
               / CAST(len(list_distinct(list_concat(a.dtoks, b.dtoks)))
                      AS DOUBLE), 4) AS jaccard
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.dtoks, b.dtoks))
               / CAST(len(list_distinct(list_concat(a.dtoks, b.dtoks)))
                      AS DOUBLE), 4) >= 0.8
  ORDER BY jaccard DESC, doc_a ASC, doc_b ASC
  LIMIT 10
), shared AS (
  SELECT p.doc_a, p.doc_b, p.jaccard, s.token, tdf.df_docs
  FROM pairs p
  JOIN t ta ON ta.doc_id = p.doc_a
  JOIN t tb ON tb.doc_id = p.doc_b,
  LATERAL (SELECT unnest(list_intersect(ta.dtoks, tb.dtoks)) AS token) s
  JOIN tdf ON tdf.token = s.token
)
SELECT doc_a, doc_b, jaccard, token, df_docs, evidence_rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_a, doc_b
                               ORDER BY df_docs ASC, token ASC) AS evidence_rank
  FROM shared
) WHERE evidence_rank <= 3
"""

QUERIES["error_burst_sessions"] = timeops.error_burst_sessions
ORACLES["error_burst_sessions"] = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, event_type,
         {duck_units("value", 2)} AS cents
  FROM events
), flagged AS (
  SELECT user_id, tus, event_type, cents,
         CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
                   OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus)
                      >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
), sessions AS (
  SELECT user_id, tus, event_type, cents,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), agg AS (
  SELECT user_id, sid, min(tus) AS session_start_us, count(*) AS n_events,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors,
         sum(cents) AS sv_cents
  FROM sessions GROUP BY 1, 2
)
SELECT user_id, session_start_us, n_events, n_errors,
       n_errors * 1000000 // n_events AS error_ppm,
       sv_cents / 100.0 AS session_value
FROM agg WHERE n_events >= 2 AND n_errors >= 1
"""

# --------------------------------------------------------------------------
# EXT E260-E261 — discount leakage, single-source risk
# --------------------------------------------------------------------------

QUERIES["discount_leakage"] = relational.discount_leakage
ORACLES["discount_leakage"] = f"""
WITH j AS (
  SELECT p.p_brand,
         {duck_units("p.p_retailprice", 2)} * {duck_units("l.l_quantity", 2)}
           // 100 AS list_c,
         {duck_units("l.l_extendedprice * (1 - l.l_discount)", 4)} // 100
           AS real_c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT p_brand, count(*) AS n_lines,
       sum(list_c) / 100.0 AS list_value,
       sum(real_c) / 100.0 AS realized_value,
       (sum(list_c) - sum(real_c)) // (sum(list_c) // 1000000) AS leakage_ppm
FROM j GROUP BY 1
"""

QUERIES["supplier_concentration_profile"] = relational.supplier_concentration_profile
ORACLES["supplier_concentration_profile"] = f"""
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         sum({duck_units("l_extendedprice * (1 - l_discount)", 4)}) AS r
  FROM lineitem GROUP BY 1, 2
), per_part AS (
  SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers,
         max(r) // (sum(r) // 1000000) AS dom_ppm
  FROM per_ps GROUP BY 1
)
SELECT p.p_type, count(*) AS n_parts,
       min(n_suppliers) AS min_suppliers,
       sum(dom_ppm) // count(*) AS mean_dom_ppm,
       max(dom_ppm) AS max_dom_ppm
FROM per_part pp JOIN part p ON pp.l_partkey = p.p_partkey
GROUP BY 1
"""

# --------------------------------------------------------------------------
# EXT E262-E263 — incremental join maintenance, hapax profile
# --------------------------------------------------------------------------

QUERIES["incremental_join_maintenance"] = relational.incremental_join_maintenance
ORACLES["incremental_join_maintenance"] = f"""
SELECT n.n_name, count(*) AS n_orders,
       sum({duck_units("o.o_totalprice", 2)}) / 100.0 AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""

QUERIES["hapax_rate"] = _text.hapax_rate
ORACLES["hapax_rate"] = f"""
WITH tk AS (
  SELECT source, {_TOKS} AS toks FROM documents
), grams AS (
  SELECT source,
         unnest(list_transform(range(0, len(toks) - 3 + 1),
                i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]))) AS gram
  FROM tk
  WHERE len(toks) >= 3
), st AS (
  SELECT source, gram, count(*) AS n_occ FROM grams GROUP BY 1, 2
), df AS (
  SELECT gram, sum(n_occ) AS corpus_occ FROM st GROUP BY 1
), j AS (
  SELECT st.source, st.n_occ,
         CASE WHEN df.corpus_occ = 1 THEN 1 ELSE 0 END AS is_hapax
  FROM st JOIN df USING (gram)
)
SELECT source, count(*) AS vocab, sum(is_hapax) AS n_hapax,
       sum(is_hapax) * 1000000 // count(*) AS hapax_vocab_ppm,
       sum(n_occ) AS gram_mass,
       sum(CASE WHEN is_hapax = 1 THEN n_occ ELSE 0 END) * 1000000
         // sum(n_occ) AS hapax_mass_ppm
FROM j GROUP BY 1
"""

# --------------------------------------------------------------------------
# EXT E264-E265 — order reconciliation, abandonment last event
# --------------------------------------------------------------------------

QUERIES["order_reconciliation"] = relational.order_reconciliation
ORACLES["order_reconciliation"] = f"""
WITH per_order AS (
  SELECT l_orderkey,
         sum({duck_units("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)})
           AS li_u6
  FROM lineitem GROUP BY 1
), j AS (
  SELECT o.o_orderstatus,
         CASE WHEN p.li_u6 IS NULL THEN 1 ELSE 0 END AS no_lines,
         CASE WHEN p.li_u6 IS NOT NULL
              THEN abs({duck_units("o.o_totalprice", 2)} * 10000 - p.li_u6)
         END AS diff_u6
  FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
)
SELECT o_orderstatus, count(*) AS n_orders,
       sum(no_lines) AS n_no_lines,
       sum(CASE WHEN diff_u6 > 10000 THEN 1 ELSE 0 END) AS n_mismatch,
       max(diff_u6) // 10000 AS max_abs_diff_cents,
       sum(diff_u6) // (count(diff_u6) * 10000) AS mean_abs_diff_cents
FROM j GROUP BY 1
"""

QUERIES["abandonment_last_event"] = timeops.abandonment_last_event
ORACLES["abandonment_last_event"] = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events
), fv AS (
  SELECT user_id, min(tus) AS vt FROM e WHERE event_type = 'view' GROUP BY 1
), w AS (
  SELECT e.user_id, e.event_type, e.tus, e.event_id
  FROM e JOIN fv USING (user_id)
  WHERE e.tus >= fv.vt AND e.tus < fv.vt + 86400000000
), per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased,
         max(CASE WHEN rn = 1 THEN event_type END) AS last_type
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY tus DESC, event_id DESC) AS rn
    FROM w
  ) GROUP BY 1
), nonconv AS (
  SELECT * FROM per_user WHERE purchased = 0
)
SELECT last_type, count(*) AS n_users,
       count(*) * 1000000 // (SELECT count(*) FROM nonconv) AS share_ppm
FROM nonconv GROUP BY 1
"""

# --------------------------------------------------------------------------
# EXT E266-E267 — cross-source dup matrix, engagement-value quadrants
# --------------------------------------------------------------------------

QUERIES["cross_source_dup_matrix"] = dedup.cross_source_dup_matrix
ORACLES["cross_source_dup_matrix"] = f"""
WITH clusters AS (
  SELECT md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp,
         list_sort(list(DISTINCT source)) AS sources,
         count(*) AS n_docs
  FROM documents GROUP BY 1
  HAVING len(list(DISTINCT source)) >= 2
), pairs AS (
  SELECT n_docs, sources[i] AS source_a, sources[j] AS source_b
  FROM clusters,
       unnest(range(1, len(sources) + 1)) AS t1(i),
       unnest(range(1, len(sources) + 1)) AS t2(j)
  WHERE i < j
)
SELECT source_a, source_b, count(*) AS n_shared_clusters,
       sum(n_docs) AS docs_in_shared_clusters
FROM pairs GROUP BY 1, 2
"""

QUERIES["engagement_value_quadrants"] = mlmetrics.engagement_value_quadrants
ORACLES["engagement_value_quadrants"] = f"""
WITH per_user AS (
  SELECT user_id, count(*) AS act, sum({duck_units("value", 2)}) AS cents
  FROM events GROUP BY 1
), ranked AS (
  SELECT act, cents,
         row_number() OVER (ORDER BY act, user_id) AS ra,
         row_number() OVER (ORDER BY cents, user_id) AS rv,
         count(*) OVER () AS n
  FROM per_user
), med AS (
  SELECT
    max(CASE WHEN ra = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1
             THEN act END) AS med_act,
    max(CASE WHEN rv = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1
             THEN cents END) AS med_cents
  FROM ranked
), labeled AS (
  SELECT concat(CASE WHEN act > med_act THEN 'hi_act' ELSE 'lo_act' END,
                '/',
                CASE WHEN cents > med_cents THEN 'hi_val' ELSE 'lo_val' END)
           AS quadrant,
         cents
  FROM per_user CROSS JOIN med
)
SELECT quadrant, count(*) AS n_users,
       sum(cents) / 100.0 AS quadrant_value,
       sum(cents) * 1000000 // (SELECT sum(cents) FROM per_user)
         AS value_share_ppm
FROM labeled GROUP BY 1
"""

# --------------------------------------------------------------------------
# EXT E268-E269 — quantization recall sweep, priority-mix drift
# --------------------------------------------------------------------------

QUERIES["quantization_recall_sweep"] = similarity.quantization_recall_sweep


def _quant_sweep_oracle(bits=(8, 4, 2), k=5) -> str:
    head = f"""
WITH q AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5
), exact AS MATERIALIZED (
  SELECT query_id, e_cand FROM (
    SELECT qq.query_id, c.vec_id AS e_cand,
           row_number() OVER (PARTITION BY qq.query_id
                              ORDER BY {_duck_cos('qq.q_emb', 'c.embedding')} DESC,
                                       c.vec_id ASC) AS rnk
    FROM q qq JOIN embeddings c ON qq.query_id <> c.vec_id
  ) WHERE rnk <= {k}
)"""
    levels = []
    for b in bits:
        qmax = float(2 ** (b - 1) - 1)
        qexpr = (
            "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
            f" * (CASE WHEN list_max(list_transform(embedding,"
            f" y -> abs(CAST(y AS DOUBLE)))) > 0 THEN {qmax}"
            f" / list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE))))"
            f" ELSE 0.0 END) + 0.5) AS BIGINT))"
        )
        levels.append(f"""
SELECT CAST({b} AS BIGINT) AS bits,
       (SELECT count(*) FROM exact e JOIN (
          SELECT query_id, cand_id FROM (
            SELECT qa.vec_id AS query_id, cb.vec_id AS cand_id,
                   CAST(list_sum(list_transform(list_zip(qa.q, cb.q),
                        p -> p[1] * p[2])) AS DOUBLE)
                   / sqrt(CAST(list_sum(list_transform(qa.q, x -> x * x))
                          AS DOUBLE)
                          * CAST(list_sum(list_transform(cb.q, x -> x * x))
                            AS DOUBLE)) AS qsim,
                   row_number() OVER (PARTITION BY qa.vec_id
                     ORDER BY CAST(list_sum(list_transform(list_zip(qa.q, cb.q),
                              p -> p[1] * p[2])) AS DOUBLE)
                              / sqrt(CAST(list_sum(list_transform(qa.q,
                                     x -> x * x)) AS DOUBLE)
                                     * CAST(list_sum(list_transform(cb.q,
                                       x -> x * x)) AS DOUBLE)) DESC,
                              cb.vec_id ASC) AS rnk
            FROM (SELECT vec_id, {qexpr} AS q FROM embeddings WHERE vec_id < 5) qa
            JOIN (SELECT vec_id, {qexpr} AS q FROM embeddings) cb
              ON qa.vec_id <> cb.vec_id
          ) WHERE rnk <= {k}
        ) a ON e.query_id = a.query_id AND e.e_cand = a.cand_id) AS n_hits,
       (SELECT count(*) FROM exact) AS n_expected""")
    body = "\nUNION ALL\n".join(levels)
    return (
        head
        + f"\nSELECT bits, n_hits, n_expected,"
        f" n_hits * 1000000 // n_expected AS recall_ppm FROM ({body})"
    )


ORACLES["quantization_recall_sweep"] = _quant_sweep_oracle()

QUERIES["priority_mix_drift"] = mlmetrics.priority_mix_drift
ORACLES["priority_mix_drift"] = """
WITH counts AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority,
         count(*) AS c
  FROM orders GROUP BY 1, 2
), totals AS (
  SELECT yr, sum(c) AS t FROM counts GROUP BY 1
), cur AS (
  SELECT c.yr, c.o_orderpriority, c.c AS pc, t.t AS pt
  FROM counts c JOIN totals t USING (yr)
), prev AS (
  SELECT c.yr + 1 AS yr, c.o_orderpriority, c.c AS qc, t.t AS qt
  FROM counts c JOIN totals t USING (yr)
), terms AS (
  SELECT cur.yr,
         (pc * 1000000 // pt - qc * 1000000 // qt)
         * CAST(round(ln(CAST(pc AS DOUBLE) * CAST(qt AS DOUBLE)
                         / (CAST(qc AS DOUBLE) * CAST(pt AS DOUBLE))) * 1000000)
                AS BIGINT) AS term_pico
  FROM cur JOIN prev USING (yr, o_orderpriority)
)
SELECT yr AS year, count(*) AS n_categories,
       sum(term_pico) // 1000000 AS psi_micro
FROM terms GROUP BY 1
"""

# --------------------------------------------------------------------------
# EXT E270-E271 — onboarding latency, nation league table
# --------------------------------------------------------------------------

QUERIES["onboarding_latency"] = timeops.onboarding_latency
ORACLES["onboarding_latency"] = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
), pu AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN tus END) AS signup_tus
  FROM e GROUP BY 1
), af AS (
  SELECT e.user_id, min(e.tus) AS next_tus
  FROM e JOIN pu USING (user_id)
  WHERE pu.signup_tus IS NOT NULL AND e.tus > pu.signup_tus
    AND e.event_type <> 'signup'
  GROUP BY 1
), gaps AS (
  SELECT pu.user_id, af.next_tus - pu.signup_tus AS gap_us
  FROM pu LEFT JOIN af USING (user_id)
  WHERE pu.signup_tus IS NOT NULL
), ranked AS (
  SELECT gap_us,
         row_number() OVER (ORDER BY gap_us, user_id) AS rn,
         count(*) OVER () AS n
  FROM gaps WHERE gap_us IS NOT NULL
)
SELECT count(*) AS n_activated,
       max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1
                THEN gap_us END) AS p50_gap_us,
       max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 1
                THEN gap_us END) AS p90_gap_us,
       (SELECT count(*) FROM gaps WHERE gap_us IS NULL) AS n_waiting
FROM ranked
"""

QUERIES["nation_league_table"] = relational.nation_league_table
ORACLES["nation_league_table"] = f"""
WITH per_nation AS (
  SELECT n.n_name, count(*) AS n_orders,
         sum({duck_units("o.o_totalprice", 2)}) AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT n_name, rev_cents / 100.0 AS revenue, n_orders,
       rev_cents // n_orders AS avg_cents,
       rank() OVER (ORDER BY rev_cents DESC, n_name ASC) AS rev_rank,
       rank() OVER (ORDER BY n_orders DESC, n_name ASC) AS count_rank,
       rank() OVER (ORDER BY rev_cents // n_orders DESC, n_name ASC) AS avg_rank
FROM per_nation
"""

# --------------------------------------------------------------------------
# EXT E272-E273 — type co-movement, structuring screen
# --------------------------------------------------------------------------

QUERIES["type_comovement"] = timeops.type_comovement
_CM_NUM = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_CM_DEN = (
    "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)
_CM_TYPES = ["click", "error", "purchase", "signup", "view"]
ORACLES["type_comovement"] = (
    f"""WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         sum({duck_units("value", 2)}) AS y
  FROM events GROUP BY 1, 2
)
"""
    + "\nUNION ALL\n".join(
        f"""SELECT '{ta}' AS type_a, '{tb}' AS type_b, n,
       CAST(floor({_CM_NUM} / {_CM_DEN} * 1000000.0) AS BIGINT) AS corr_micro
FROM (
  SELECT count(*) AS n, sum(a.y) AS sx, sum(b.y) AS sy,
         sum(a.y * a.y) AS sxx, sum(b.y * b.y) AS syy,
         sum(a.y * b.y) AS sxy
  FROM daily a JOIN daily b ON a.day = b.day
  WHERE a.event_type = '{ta}' AND b.event_type = '{tb}'
)"""
        for i, ta in enumerate(_CM_TYPES)
        for tb in _CM_TYPES[i + 1:]
    )
)

QUERIES["structuring_screen"] = mlmetrics.structuring_screen


def _structuring_oracle(thresholds=(50, 100, 200)) -> str:
    pieces = []
    for t in thresholds:
        tc = t * 100
        lo, hi = tc * 95 // 100, tc * 105 // 100
        pieces.append(
            f"SELECT CAST({t} AS BIGINT) AS threshold,\n"
            f"  sum(CASE WHEN cents >= {lo} AND cents <= {tc} THEN 1 ELSE 0 END)"
            f" AS n_below,\n"
            f"  sum(CASE WHEN cents > {tc} AND cents <= {hi} THEN 1 ELSE 0 END)"
            f" AS n_above,\n"
            f"  CASE WHEN sum(CASE WHEN cents > {tc} AND cents <= {hi}"
            f" THEN 1 ELSE 0 END) > 0\n"
            f"  THEN sum(CASE WHEN cents >= {lo} AND cents <= {tc} THEN 1 ELSE 0 END)"
            f" * 1000000 // sum(CASE WHEN cents > {tc} AND cents <= {hi}"
            f" THEN 1 ELSE 0 END) ELSE -1 END AS ratio_ppm\n"
            f"FROM p"
        )
    head = (
        "WITH p AS (SELECT "
        + duck_units("value", 2)
        + " AS cents FROM events WHERE event_type = 'purchase')\n"
    )
    return head + "\nUNION ALL\n".join(pieces)


ORACLES["structuring_screen"] = _structuring_oracle()

# --------------------------------------------------------------------------
# EXT E274-E275 — partitioned roundtrip, bounce rate
# --------------------------------------------------------------------------

QUERIES["partitioned_roundtrip"] = corpus.partitioned_roundtrip
ORACLES["partitioned_roundtrip"] = f"""
SELECT event_type, count(*) AS n_events,
       sum(event_id) AS sum_event_id,
       sum(epoch_us(ts) % 1000000007) AS tus_checksum,
       sum({duck_units("value", 2)}) AS sum_cents,
       count(DISTINCT user_id) AS n_users
FROM events WHERE event_type = 'purchase'
GROUP BY 1
"""

QUERIES["bounce_rate"] = timeops.bounce_rate
ORACLES["bounce_rate"] = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events
), flagged AS (
  SELECT user_id, event_type, tus, event_id,
         CASE WHEN lag(tus) OVER w IS NULL
                   OR tus - lag(tus) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
), sess AS (
  SELECT user_id, event_type, tus, event_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), agg AS (
  SELECT user_id, sid, count(*) AS n_events,
         max(CASE WHEN rn = 1 THEN event_type END) AS entry_type
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, sid
                                 ORDER BY tus, event_id) AS rn
    FROM sess
  ) GROUP BY 1, 2
)
SELECT entry_type, count(*) AS n_sessions,
       sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS n_bounces,
       sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
         // count(*) AS bounce_ppm
FROM agg GROUP BY 1
"""

# --------------------------------------------------------------------------
# EXT E276-E277 — centroid drift, similarity calibration
# --------------------------------------------------------------------------

QUERIES["centroid_drift"] = similarity.centroid_drift
ORACLES["centroid_drift"] = """
WITH comp AS (
  SELECT label, vec_id % 2 = 0 AS early, t.i - 1 AS dim,
         CAST(round(CAST(embedding[t.i] AS DOUBLE) * 10000) AS BIGINT) AS qv
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), sums AS (
  SELECT label, early, dim, sum(qv) AS s FROM comp GROUP BY 1, 2, 3
), counts AS (
  SELECT label, vec_id % 2 = 0 AS early, count(*) AS n
  FROM embeddings GROUP BY 1, 2
), dots AS (
  SELECT a.label,
         sum(a.s * b.s) AS dot, sum(a.s * a.s) AS na, sum(b.s * b.s) AS nb
  FROM (SELECT * FROM sums WHERE early) a
  JOIN (SELECT * FROM sums WHERE NOT early) b
    ON a.label = b.label AND a.dim = b.dim
  GROUP BY 1
)
SELECT d.label,
       ne.n AS n_early, nl.n AS n_late,
       CAST(floor(CAST(dot AS DOUBLE)
                  / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS drift_cos_micro
FROM dots d
JOIN (SELECT label, n FROM counts WHERE early) ne ON d.label = ne.label
JOIN (SELECT label, n FROM counts WHERE NOT early) nl ON d.label = nl.label
"""

QUERIES["similarity_calibration"] = similarity.similarity_calibration
ORACLES["similarity_calibration"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS cand_id, embedding AS c_emb, label AS c_label
  FROM embeddings
), scored AS (
  SELECT CASE WHEN q_label = c_label THEN 1 ELSE 0 END AS same,
         round({_duck_cos('q_emb', 'c_emb')}, 6) AS s
  FROM q CROSS JOIN c WHERE query_id <> cand_id
)
SELECT least(greatest(CAST(floor((s + 1.0) * 5.0) AS BIGINT), 0), 9) AS bin,
       count(*) AS n_pairs,
       sum(same) AS n_same_label,
       sum(same) * 1000000 // count(*) AS same_label_ppm
FROM scored GROUP BY 1
"""

# --------------------------------------------------------------------------
# EXT E278-E279 — funnel stage lags, similarity PR curve
# --------------------------------------------------------------------------

QUERIES["funnel_stage_lags"] = timeops.funnel_stage_lags
ORACLES["funnel_stage_lags"] = """
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
), staged AS (
  SELECT user_id, ts_us, event_type, event_id,
         CASE WHEN event_type = 'view' THEN ts_us END AS v_ts,
         CASE WHEN event_type = 'click'
                   AND ts_us >= min(CASE WHEN event_type = 'view' THEN ts_us END)
                       OVER w
              THEN ts_us END AS c_ts
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), staged2 AS (
  SELECT user_id, v_ts, c_ts,
         CASE WHEN event_type = 'purchase'
                   AND ts_us >= min(c_ts) OVER w2
              THEN ts_us END AS p_ts
  FROM staged
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), agg AS (
  SELECT user_id, min(v_ts) AS tv, min(c_ts) AS tc, min(p_ts) AS tp
  FROM staged2 GROUP BY 1
), conv AS (
  SELECT tv, tc, tp FROM agg WHERE tp IS NOT NULL
), stacked AS (
  SELECT 'view_to_click' AS stage, tc - tv AS lag_us FROM conv
  UNION ALL
  SELECT 'click_to_purchase', tp - tc FROM conv
), ranked AS (
  SELECT stage, lag_us,
         row_number() OVER (PARTITION BY stage ORDER BY lag_us) AS rn,
         count(*) OVER (PARTITION BY stage) AS n
  FROM stacked
)
SELECT stage, max(n) AS n_converters,
       max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1
                THEN lag_us END) AS p50_lag_us,
       max(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 1
                THEN lag_us END) AS p90_lag_us
FROM ranked GROUP BY 1
"""

QUERIES["similarity_pr_curve"] = similarity.similarity_pr_curve


def _pr_curve_oracle(thresholds=(20, 40, 60, 80)) -> str:
    pieces = []
    for t in thresholds:
        cut = t * 10000
        pieces.append(
            f"SELECT CAST({t} AS BIGINT) AS threshold_pct,\n"
            f"  sum(CASE WHEN su >= {cut} THEN 1 ELSE 0 END) AS n_predicted,\n"
            f"  sum(CASE WHEN su >= {cut} AND same = 1 THEN 1 ELSE 0 END)"
            f" AS n_true_pos,\n"
            f"  CASE WHEN sum(CASE WHEN su >= {cut} THEN 1 ELSE 0 END) > 0\n"
            f"  THEN sum(CASE WHEN su >= {cut} AND same = 1 THEN 1 ELSE 0 END)"
            f" * 1000000 // sum(CASE WHEN su >= {cut} THEN 1 ELSE 0 END)"
            f" ELSE -1 END AS precision_ppm,\n"
            f"  CASE WHEN sum(same) > 0\n"
            f"  THEN sum(CASE WHEN su >= {cut} AND same = 1 THEN 1 ELSE 0 END)"
            f" * 1000000 // sum(same) ELSE -1 END AS recall_ppm\n"
            f"FROM scored"
        )
    head = f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS cand_id, embedding AS c_emb, label AS c_label
  FROM embeddings
), scored AS MATERIALIZED (
  SELECT CASE WHEN q_label = c_label THEN 1 ELSE 0 END AS same,
         CAST(round(round({_duck_cos('q_emb', 'c_emb')}, 6) * 1000000)
              AS BIGINT) AS su
  FROM q CROSS JOIN c WHERE query_id <> cand_id
)
"""
    return head + "\nUNION ALL\n".join(pieces)


ORACLES["similarity_pr_curve"] = _pr_curve_oracle()

# --------------------------------------------------------------------------
# EXT E280-E281 — two-stage retrieval audit, retention policy audit
# --------------------------------------------------------------------------

QUERIES["two_stage_retrieval_audit"] = similarity.two_stage_retrieval_audit
