"""Registry segment 12/13 — mechanically split from the
round-4 plans/registry.py (12k lines). QUERIES insertion order is
load-bearing (the driver's correctness window samples the first 50
entries), so each segment imports its predecessor: importing ANY
segment executes the full prefix in the original order.
"""
from __future__ import annotations

from parquet_to_csv_spark.plans.registry_core import (QUERIES, ORACLES, query)  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts import p11 as _prev_segment  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p01 import (  # noqa: F401
    _TOKS,
    dedup,
    duck_units,
    pandas_ops,
    relational,
    similarity,
    sqlapi,
    text,
    timeops,
)
from parquet_to_csv_spark.plans.registry_parts.p02 import _stream, corpus  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p03 import mlmetrics  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p07 import _layout  # noqa: F401

ORACLES["python_stream_digest"] = """
WITH g AS (
  SELECT t.i AS id, (t.i * 2654435761) % 1000003 AS v
  FROM unnest(range(0, 3000)) AS t(i)
)
SELECT v % 10 AS bucket, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(id) AS BIGINT) AS id_sum,
       CAST(sum(v) AS BIGINT) AS v_sum,
       CAST(count(DISTINCT id) AS BIGINT) AS n_distinct_ids
FROM g GROUP BY 1
"""


# ---------------------------------------------------------------------------
# E372 — applyInArrow grouped profile; lower median (sorted index
# (n-1)//2) == DuckDB quantile_disc(0.5), integer-exact.
# ---------------------------------------------------------------------------

QUERIES["arrow_grouped_profile"] = pandas_ops.arrow_grouped_profile
ORACLES["arrow_grouped_profile"] = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
       CAST(max(length(text)) AS BIGINT) AS max_chars,
       CAST(quantile_disc(length(text), 0.5) AS BIGINT) AS median_chars
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# E373 — collation-aware grouping: UTF8_LCASE groupBy must reproduce
# the lower()-keyed oracle counts bit-for-bit.
# ---------------------------------------------------------------------------

QUERIES["collated_token_counts"] = text.collated_token_counts
ORACLES["collated_token_counts"] = f"""
WITH toks AS (
  SELECT CASE WHEN doc_id % 2 = 1 THEN upper(token) ELSE token END AS token
  FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
)
SELECT min(token) AS canonical, CAST(count(*) AS BIGINT) AS n_occ,
       CAST(count(DISTINCT token) AS BIGINT) AS n_forms
FROM toks GROUP BY lower(token)
"""


# ---------------------------------------------------------------------------
# E374 — incremental snapshot consumption: the delta scan digest must
# equal the %3==2 slice recomputed from the raw table (manifest file
# set difference == exactly the appended rows).
# ---------------------------------------------------------------------------

from parquet_to_csv_spark.sources import layout as _layout  # noqa: E402

QUERIES["snapshot_delta_scan"] = _layout.snapshot_delta_scan
ORACLES["snapshot_delta_scan"] = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       CAST(sum({duck_units("o_totalprice", 2)}) AS BIGINT) AS rev_cents
FROM orders WHERE o_orderkey % 3 = 2 GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# E375 — FIM split conservation audit; pure integer substring bounds,
# identical 1-based substring semantics in both engines.
# ---------------------------------------------------------------------------

QUERIES["fim_transform_audit"] = corpus.fim_transform_audit
ORACLES["fim_transform_audit"] = """
WITH s AS (
  SELECT lang,
         CASE WHEN doc_id % 2 = 0 THEN 'psm' ELSE 'spm' END AS mode,
         length(text) AS n,
         length(substring(text, 1, (length(text) * 4) // 10)) AS np,
         length(substring(text, (length(text) * 4) // 10 + 1,
                (length(text) * 85) // 100 - (length(text) * 4) // 10)) AS nm,
         length(substring(text, (length(text) * 85) // 100 + 1,
                length(text) - (length(text) * 85) // 100)) AS ns
  FROM documents
)
SELECT lang, mode, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(np) AS BIGINT) AS prefix_chars,
       CAST(sum(nm) AS BIGINT) AS middle_chars,
       CAST(sum(ns) AS BIGINT) AS suffix_chars,
       CAST(sum(n) AS BIGINT) AS total_chars,
       CAST(sum(CASE WHEN np + nm + ns = n THEN 0 ELSE 1 END) AS BIGINT)
         AS n_conservation_violations
FROM s GROUP BY lang, mode
"""


# ---------------------------------------------------------------------------
# E376 — null-safe join audit: DuckDB IS NOT DISTINCT FROM is the
# <=> twin; the distinct per-half key relations bound the join.
# ---------------------------------------------------------------------------

QUERIES["nullsafe_join_audit"] = relational.nullsafe_join_audit
ORACLES["nullsafe_join_audit"] = """
WITH ev AS (
  SELECT event_id, user_id,
         nullif(CAST(json_extract(props, '$.k') AS INTEGER) // 25, 1) AS k_null
  FROM events
), a AS (SELECT DISTINCT user_id, k_null FROM ev WHERE event_id % 2 = 0),
b AS (SELECT DISTINCT user_id, k_null FROM ev WHERE event_id % 2 = 1),
eq AS (
  SELECT CAST(count(*) AS BIGINT) AS n_eq
  FROM a JOIN b ON a.user_id = b.user_id AND a.k_null = b.k_null
), ns AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nullsafe
  FROM a JOIN b ON a.user_id = b.user_id
              AND a.k_null IS NOT DISTINCT FROM b.k_null
), ca AS (
  SELECT CAST(count(*) AS BIGINT) AS n_a,
         CAST(coalesce(sum(CASE WHEN k_null IS NULL THEN 1 END), 0) AS BIGINT)
           AS n_null_a
  FROM a
), cb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM b)
SELECT n_a, n_b, n_null_a, n_eq, n_nullsafe,
       CAST(n_nullsafe - n_eq AS BIGINT) AS n_rescued_links
FROM ca CROSS JOIN cb CROSS JOIN eq CROSS JOIN ns
"""


# ---------------------------------------------------------------------------
# E377 — SPRT anytime-valid monitor: integer multiples of two
# micro-rounded ln constants; decisions vs ±ln(19) thresholds.
# ---------------------------------------------------------------------------

QUERIES["sprt_monitor"] = mlmetrics.sprt_monitor
ORACLES["sprt_monitor"] = f"""
WITH daily AS (
  SELECT epoch_ms(ts) // 86400000 AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
              AS BIGINT) AS s
  FROM events
  WHERE {corpus.duck_md5_bucket("user_id", 2)} = 1
  GROUP BY 1
), cum AS (
  SELECT day,
         CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS n_cum,
         CAST(sum(s) OVER (ORDER BY day) AS BIGINT) AS s_cum
  FROM daily
), llr AS (
  SELECT day, n_cum, s_cum,
         CAST(s_cum * CAST(floor(ln(5.0 / 4.0) * 1000000 + 0.5) AS BIGINT)
              + (n_cum - s_cum)
                * CAST(floor(ln(95.0 / 96.0) * 1000000 + 0.5) AS BIGINT)
              AS BIGINT) AS llr_micro
  FROM cum
)
SELECT day, n_cum, s_cum, llr_micro,
       CASE WHEN llr_micro >= CAST(floor(ln(19.0) * 1000000 + 0.5) AS BIGINT)
              THEN 'accept_h1'
            WHEN llr_micro <= -CAST(floor(ln(19.0) * 1000000 + 0.5) AS BIGINT)
              THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM llr
"""


# ---------------------------------------------------------------------------
# E378 — Bloom file-skipping: the oracle replays the exact k=3 md5 bit
# positions over deterministic key-range shards.
# ---------------------------------------------------------------------------

QUERIES["bloom_skipping_report"] = _layout.bloom_skipping_report
_BLOOM_POS = lambda expr, j: corpus.duck_md5_bucket(  # noqa: E731
    f"CAST({expr} AS VARCHAR) || '#b{j}'", 8192
)
ORACLES["bloom_skipping_report"] = f"""
WITH mx AS (SELECT max(o_orderkey) AS _mx FROM orders),
keyed AS (
  SELECT CAST(o_orderkey * 16 // (_mx + 1) AS INTEGER) AS shard, o_custkey
  FROM orders CROSS JOIN mx
),
manifest AS (
  SELECT DISTINCT shard, pos FROM (
    SELECT shard, unnest([{_BLOOM_POS("o_custkey", 0)},
                          {_BLOOM_POS("o_custkey", 1)},
                          {_BLOOM_POS("o_custkey", 2)}]) AS pos
    FROM keyed
  )
),
probes AS (
  SELECT c_custkey FROM customer
  WHERE {corpus.duck_md5_bucket("c_custkey", 997)} < 50
),
ppos AS (
  SELECT c_custkey, unnest([{_BLOOM_POS("c_custkey", 0)},
                            {_BLOOM_POS("c_custkey", 1)},
                            {_BLOOM_POS("c_custkey", 2)}]) AS pos
  FROM probes
),
hits AS (
  SELECT c_custkey, shard
  FROM ppos JOIN manifest USING (pos)
  GROUP BY c_custkey, shard HAVING count(*) = 3
),
truth AS (
  SELECT DISTINCT p.c_custkey, k.shard
  FROM keyed k JOIN probes p ON k.o_custkey = p.c_custkey
),
joined AS (
  SELECT h.c_custkey IS NOT NULL AS bloom_hit,
         t.c_custkey IS NOT NULL AS present
  FROM hits h FULL OUTER JOIN truth t
    ON h.c_custkey = t.c_custkey AND h.shard = t.shard
),
agg AS (
  SELECT CAST(coalesce(sum(CASE WHEN bloom_hit THEN 1 END), 0) AS BIGINT)
           AS n_bloom_hits,
         CAST(coalesce(sum(CASE WHEN present THEN 1 END), 0) AS BIGINT)
           AS n_true_pairs,
         CAST(coalesce(sum(CASE WHEN bloom_hit AND NOT present THEN 1 END), 0)
              AS BIGINT) AS n_false_positives,
         CAST(coalesce(sum(CASE WHEN NOT bloom_hit AND present THEN 1 END), 0)
              AS BIGINT) AS n_false_negatives
  FROM joined
), np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM probes)
SELECT n_probes, n_bloom_hits, n_true_pairs, n_false_positives,
       n_false_negatives,
       CAST((n_probes * 16 - n_bloom_hits) * 1000000 // (n_probes * 16)
            AS BIGINT) AS skip_rate_ppm
FROM agg CROSS JOIN np
"""


# ---------------------------------------------------------------------------
# E379 — semi-additive closing balance: last-per-(user, month) via a
# PARTITIONED row_number, additive only across accounts.
# ---------------------------------------------------------------------------

QUERIES["closing_balance_report"] = timeops.closing_balance_report
ORACLES["closing_balance_report"] = f"""
WITH ev AS (
  SELECT user_id, event_id,
         CAST((epoch_ms(ts) // 86400000) // 30 AS INTEGER) AS month,
         {duck_units("value", 2)} AS cents,
         row_number() OVER (
           PARTITION BY user_id, (epoch_ms(ts) // 86400000) // 30
           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
), closing AS (
  SELECT month, cents FROM ev WHERE rn = 1
), monthly AS (
  SELECT month, CAST(count(*) AS BIGINT) AS n_accounts,
         CAST(sum(cents) AS BIGINT) AS closing_total_cents
  FROM closing GROUP BY month
)
SELECT month, n_accounts, closing_total_cents,
       CAST(closing_total_cents
            - coalesce(lag(closing_total_cents) OVER (ORDER BY month), 0)
            AS BIGINT) AS mom_delta_cents
FROM monthly
"""


# ---------------------------------------------------------------------------
# E380 — mix-vs-within decomposition; all divisions on the tiny
# (period × priority) aggregate, identical truncation both engines.
# ---------------------------------------------------------------------------

QUERIES["mix_shift_decomposition"] = relational.mix_shift_decomposition
ORACLES["mix_shift_decomposition"] = f"""
WITH per AS (
  SELECT CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 2 END AS period,
         o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS c,
         CAST(sum({duck_units("o_totalprice", 2)}) AS BIGINT) AS s
  FROM orders GROUP BY 1, 2
), tot AS (
  SELECT period, CAST(sum(c) AS BIGINT) AS tc, CAST(sum(s) AS BIGINT) AS ts
  FROM per GROUP BY period
), j AS (
  SELECT per.period, priority,
         CAST(c * 1000000 // tc AS BIGINT) AS share_ppm,
         CAST(s * 10000 // c AS BIGINT) AS mean_c4,
         CAST(ts * 10000 // tc AS BIGINT) AS gmean_c4
  FROM per JOIN tot ON per.period = tot.period
)
SELECT p1.priority AS priority,
       p1.share_ppm AS share1_ppm, p2.share_ppm AS share2_ppm,
       p1.mean_c4 AS mean1_c4, p2.mean_c4 AS mean2_c4,
       CAST((p2.share_ppm - p1.share_ppm) * p1.mean_c4 // 1000000 AS BIGINT)
         AS mix_c4,
       CAST(p2.share_ppm * (p2.mean_c4 - p1.mean_c4) // 1000000 AS BIGINT)
         AS within_c4,
       CAST(p2.gmean_c4 - p1.gmean_c4 AS BIGINT) AS delta_mean_c4
FROM (SELECT * FROM j WHERE period = 1) p1
JOIN (SELECT * FROM j WHERE period = 2) p2 USING (priority)
"""


# ---------------------------------------------------------------------------
# E381 — Fellegi–Sunter linkage pattern table; identical e0-literal ln
# constants, identical md5 corruption model.
# ---------------------------------------------------------------------------

QUERIES["fs_linkage_patterns"] = dedup.fs_linkage_patterns
_FS_W = lambda e: f"CAST(floor(({e}) * 1000000 + 0.5) AS BIGINT)"  # noqa: E731
ORACLES["fs_linkage_patterns"] = f"""
WITH a AS (
  SELECT c_custkey AS a_id, c_nationkey AS nation,
         lower(c_name) AS a_name_ci, c_mktsegment AS a_seg,
         {duck_units("c_acctbal", 2)} // 1000 AS a_band
  FROM customer
), b AS (
  SELECT c_custkey + 10000000 AS b_id, c_custkey AS b_orig,
         c_nationkey AS nation, lower(c_name) AS b_name_ci,
         CASE WHEN {corpus.duck_md5_bucket("CAST(c_custkey AS VARCHAR) || '#seg'", 5)} = 0
              THEN 'CORRUPTED' ELSE c_mktsegment END AS b_seg,
         ({duck_units("c_acctbal", 2)}
          + CASE WHEN {corpus.duck_md5_bucket("CAST(c_custkey AS VARCHAR) || '#bal'", 3)} = 0
                 THEN 37 ELSE 0 END) // 1000 AS b_band
  FROM customer
  WHERE {corpus.duck_md5_bucket("c_custkey", 4)} = 0
), pairs AS (
  SELECT (a_name_ci = b_name_ci) AS name_agree,
         (a_seg = b_seg) AS seg_agree,
         (a_band = b_band) AS band_agree,
         CASE WHEN a_id = b_orig THEN 1 ELSE 0 END AS is_true
  FROM a JOIN b USING (nation)
)
SELECT name_agree, seg_agree, band_agree,
       CAST(CASE WHEN name_agree THEN {_FS_W("ln(99e0/1e0)")}
                 ELSE {_FS_W("ln(1e0/99e0)")} END
          + CASE WHEN seg_agree THEN {_FS_W("ln(80e0/20e0)")}
                 ELSE {_FS_W("ln(20e0/80e0)")} END
          + CASE WHEN band_agree THEN {_FS_W("ln(90e0/10e0)")}
                 ELSE {_FS_W("ln(10e0/90e0)")} END AS BIGINT) AS score_micro,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(is_true) AS BIGINT) AS n_true,
       CAST(sum(is_true) * 1000000 // count(*) AS BIGINT) AS precision_ppm
FROM pairs GROUP BY name_agree, seg_agree, band_agree
"""


# ---------------------------------------------------------------------------
# E382 — approx-distinct audit: the sketch is deterministic for fixed
# data, so the oracle asserts the exact counts plus constant TRUE
# bound flags; a sketch regression turns the gate red.
# ---------------------------------------------------------------------------

QUERIES["approx_distinct_audit"] = relational.approx_distinct_audit
ORACLES["approx_distinct_audit"] = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS rsd5_within_4sigma,
       TRUE AS rsd1_within_4sigma
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# E383 — multi-window SLO burn alerts; integer ppm vs 2x budget, both
# windows over the bounded calendar grain.
# ---------------------------------------------------------------------------

QUERIES["slo_burn_alerts"] = timeops.slo_burn_alerts
ORACLES["slo_burn_alerts"] = """
WITH daily AS (
  SELECT epoch_ms(ts) // 86400000 AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0)
              AS BIGINT) AS n_err
  FROM events GROUP BY 1
), rates AS (
  SELECT day, n, n_err,
         CAST(n_err * 1000000 // n AS BIGINT) AS fast_ppm,
         CAST(sum(n_err) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING
                               AND CURRENT ROW) * 1000000
              // sum(n) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS slow_ppm
  FROM daily
)
SELECT day, n, n_err, fast_ppm, slow_ppm,
       (fast_ppm >= 20000 AND slow_ppm >= 20000) AS page_alert
FROM rates
"""


# ---------------------------------------------------------------------------
# E384 — fairness gaps: per-group exact ppm rates, gaps vs bucket 0.
# ---------------------------------------------------------------------------

QUERIES["fairness_gap_audit"] = mlmetrics.fairness_gap_audit
ORACLES["fairness_gap_audit"] = f"""
WITH ev AS (
  SELECT {corpus.duck_md5_bucket("user_id", 3)} AS grp,
         CASE WHEN {duck_units("value", 2)} >= 5000 THEN 1 ELSE 0 END AS pred,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
), per AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pred) AS BIGINT) AS n_sel,
         CAST(sum(label) AS BIGINT) AS n_pos,
         CAST(sum(pred * label) AS BIGINT) AS n_tp,
         CAST(sum(pred * (1 - label)) AS BIGINT) AS n_fp
  FROM ev GROUP BY grp
), rates AS (
  SELECT grp, n,
         CAST(n_sel * 1000000 // n AS BIGINT) AS sel_ppm,
         CAST(n_tp * 1000000 // n_pos AS BIGINT) AS tpr_ppm,
         CAST(n_fp * 1000000 // (n - n_pos) AS BIGINT) AS fpr_ppm
  FROM per
), ref AS (
  SELECT sel_ppm AS _rs, tpr_ppm AS _rt, fpr_ppm AS _rf FROM rates WHERE grp = 0
)
SELECT CAST(grp AS INTEGER) AS grp, n, sel_ppm, tpr_ppm, fpr_ppm,
       CAST(sel_ppm - _rs AS BIGINT) AS dp_gap_ppm,
       CAST(tpr_ppm - _rt AS BIGINT) AS eo_tpr_gap_ppm,
       CAST(fpr_ppm - _rf AS BIGINT) AS eo_fpr_gap_ppm
FROM rates CROSS JOIN ref
"""


# ---------------------------------------------------------------------------
# E385 — BH-FDR screen: identical zcrit literals inlined into both
# engines (stdlib inverse normal CDF, evaluated once in Python).
# ---------------------------------------------------------------------------

QUERIES["bh_fdr_screen"] = mlmetrics.bh_fdr_screen
_BH_CRIT_SQL = (
    "[" + ", ".join(str(c) for c in mlmetrics._bh_crit_ratio_milli()) + "]"
)
ORACLES["bh_fdr_screen"] = f"""
WITH ev AS (
  SELECT event_type,
         CAST((epoch_ms(ts) // 3600000) % 24 // 6 AS INTEGER) AS hband,
         epoch_ms(ts) // 86400000 AS day,
         CASE WHEN {duck_units("value", 2)} >= 5000 THEN 1 ELSE 0 END AS hi
  FROM events
), mid AS (
  SELECT CAST((min(day) + max(day)) // 2 AS BIGINT) AS _mid FROM ev
), cells AS (
  SELECT event_type, hband,
         CASE WHEN day >= _mid THEN 1 ELSE 0 END AS half,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(hi) AS BIGINT) AS x
  FROM ev CROSS JOIN mid GROUP BY 1, 2, 3
), h1 AS (
  SELECT event_type, hband, n AS n1, x AS x1 FROM cells WHERE half = 0
), h2 AS (
  SELECT event_type, hband, n AS n2, x AS x2 FROM cells WHERE half = 1
), scored AS (
  SELECT event_type, hband, n1, x1, n2, x2,
         abs(CAST(floor(((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
              / sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
              * (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
              * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))))
              * 1000.0) AS BIGINT)) AS abs_z_milli
  FROM h1 JOIN h2 USING (event_type, hband)
  WHERE x1 + x2 > 0 AND x1 + x2 < n1 + n2
), ranked AS (
  SELECT *, CAST(row_number() OVER (
              ORDER BY abs_z_milli DESC, event_type, hband) AS INTEGER) AS rnk
  FROM scored
), withm AS (
  SELECT *, count(*) OVER () AS _m FROM ranked
), withcrit AS (
  SELECT * EXCLUDE (_m),
         CAST(({_BH_CRIT_SQL})[CAST((rnk * 1000 + _m - 1) // _m AS INTEGER)]
              AS INTEGER) AS crit_milli
  FROM withm
)
SELECT event_type, hband, n1, x1, n2, x2, abs_z_milli, rnk, crit_milli,
       rnk <= coalesce(max(CASE WHEN abs_z_milli >= crit_milli THEN rnk END)
                       OVER (), 0) AS rejected
FROM withcrit
"""


# ---------------------------------------------------------------------------
# E386 — duplicate-aware loss weighting; reuses the verified cluster
# oracle as a CTE, floored ppm weights identical in both engines.
# ---------------------------------------------------------------------------

QUERIES["dup_weighted_mixture"] = dedup.dup_weighted_mixture
ORACLES["dup_weighted_mixture"] = f"""
WITH clusters AS MATERIALIZED (
{ORACLES["dup_clusters"]}
), sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
  FROM clusters GROUP BY cluster_id
), membership AS (
  SELECT c.doc_id, s.csize FROM clusters c JOIN sizes s USING (cluster_id)
), weighted AS (
  SELECT d.lang, d.source, coalesce(m.csize, 1) AS csize
  FROM documents d LEFT JOIN membership m ON d.doc_id = m.doc_id
)
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(CASE WHEN csize > 1 THEN 1 END), 0) AS BIGINT)
         AS n_dup_docs,
       CAST(sum(1000000 // csize) AS BIGINT) AS eff_docs_ppm,
       CAST(count(*) * 1000000 - sum(1000000 // csize) AS BIGINT)
         AS removed_mass_ppm
FROM weighted GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# E387 — Tukey median polish, two unrolled sweeps; lower medians via
# quantile_disc on exact cents.
# ---------------------------------------------------------------------------

QUERIES["median_polish_dow_type"] = timeops.median_polish_dow_type
ORACLES["median_polish_dow_type"] = f"""
WITH cells AS MATERIALIZED (
  SELECT CAST(((epoch_ms(ts) // 86400000) + 4) % 7 AS INTEGER) AS dow,
         event_type,
         CAST(sum({duck_units("value", 2)}) AS BIGINT) AS z
  FROM events GROUP BY 1, 2
), rm1 AS (SELECT dow, quantile_disc(z, 0.5) AS m FROM cells GROUP BY dow),
z1 AS MATERIALIZED (
  SELECT c.dow, c.event_type, c.z - rm1.m AS z FROM cells c JOIN rm1 USING (dow)
), cm1 AS (SELECT event_type, quantile_disc(z, 0.5) AS m FROM z1 GROUP BY event_type),
z2 AS MATERIALIZED (
  SELECT z1.dow, z1.event_type, z1.z - cm1.m AS z
  FROM z1 JOIN cm1 USING (event_type)
), rm2 AS (SELECT dow, quantile_disc(z, 0.5) AS m FROM z2 GROUP BY dow),
z3 AS MATERIALIZED (
  SELECT z2.dow, z2.event_type, z2.z - rm2.m AS z FROM z2 JOIN rm2 USING (dow)
), cm2 AS (SELECT event_type, quantile_disc(z, 0.5) AS m FROM z3 GROUP BY event_type),
z4 AS MATERIALIZED (
  SELECT z3.dow, z3.event_type, z3.z - cm2.m AS z
  FROM z3 JOIN cm2 USING (event_type)
)
SELECT c.dow, c.event_type, c.z AS cell_cents,
       CAST(rm1.m + rm2.m AS BIGINT) AS row_effect,
       CAST(cm1.m + cm2.m AS BIGINT) AS col_effect,
       CAST(z4.z AS BIGINT) AS residual_cents
FROM cells c
JOIN rm1 USING (dow) JOIN rm2 USING (dow)
JOIN cm1 USING (event_type) JOIN cm2 USING (event_type)
JOIN z4 ON z4.dow = c.dow AND z4.event_type = c.event_type
"""


# ---------------------------------------------------------------------------
# E388 — correlated LATERAL top-k; DuckDB's own LATERAL is the twin.
# ---------------------------------------------------------------------------

QUERIES["lateral_topk_per_region"] = relational.lateral_topk_per_region
ORACLES["lateral_topk_per_region"] = f"""
SELECT r.r_name AS region, t.c_custkey, t.c_name, t.bal_cents
FROM region r,
LATERAL (
  SELECT c.c_custkey, c.c_name, {duck_units("c.c_acctbal", 2)} AS bal_cents
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  ORDER BY bal_cents DESC, c.c_custkey
  LIMIT 2
) t
"""


# ---------------------------------------------------------------------------
# E389 — streaming VARIANT promotion drain; batch SQL is the oracle
# (stream/batch parity on the typed extraction).
# ---------------------------------------------------------------------------

QUERIES["streaming_variant_drain"] = _stream.streaming_variant_drain
ORACLES["streaming_variant_drain"] = """
SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
         AS n_k,
       CAST(coalesce(sum(CAST(json_extract(props, '$.k') AS INTEGER)), 0)
            AS BIGINT) AS sum_k
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# E390 — EM-fitted FS parameters: the oracle unrolls the same three
# E/M iterations, generated by the same loop shape as the Spark side
# (identical double parenthesization, identical integer M-steps).
# ---------------------------------------------------------------------------

QUERIES["fs_em_weights"] = dedup.fs_em_weights


def _fs_em_oracle(iterations: int = 3) -> str:
    def w_expr(p: str, m: list[str], u: list[str]) -> str:
        pm = f"({p} / 1e6)"
        pu = f"((1000000 - {p}) / 1e6)"
        for i in (0, 1, 2):
            pm += f" * if(a{i+1}, {m[i]} / 1e6, 1e0 - {m[i]} / 1e6)"
            pu += f" * if(a{i+1}, {u[i]} / 1e6, 1e0 - {u[i]} / 1e6)"
        return f"CAST(floor(({pm}) / (({pm}) + ({pu})) * 1e6 + 0.5) AS BIGINT)"

    pat = f"""pat AS MATERIALIZED (
  SELECT (a_name_ci = b_name_ci) AS a1, (a_seg = b_seg) AS a2,
         (a_band = b_band) AS a3, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT c_custkey AS a_id, c_nationkey AS nation,
           lower(c_name) AS a_name_ci, c_mktsegment AS a_seg,
           {duck_units("c_acctbal", 2)} // 1000 AS a_band
    FROM customer
  ) a JOIN (
    SELECT c_custkey AS b_orig, c_nationkey AS nation,
           lower(c_name) AS b_name_ci,
           CASE WHEN {corpus.duck_md5_bucket("CAST(c_custkey AS VARCHAR) || '#seg'", 5)} = 0
                THEN 'CORRUPTED' ELSE c_mktsegment END AS b_seg,
           ({duck_units("c_acctbal", 2)}
            + CASE WHEN {corpus.duck_md5_bucket("CAST(c_custkey AS VARCHAR) || '#bal'", 3)} = 0
                   THEN 37 ELSE 0 END) // 1000 AS b_band
    FROM customer
    WHERE {corpus.duck_md5_bucket("c_custkey", 4)} = 0
  ) b USING (nation)
  GROUP BY 1, 2, 3
)"""
    ctes = [pat]
    p, m, u = "10000", ["900000"] * 3, ["100000"] * 3
    for k in range(1, iterations + 1):
        ctes.append(
            f"w{k} AS (SELECT *, {w_expr(p, m, u)} AS w FROM pat"
            + ("" if k == 1 else f" CROSS JOIN par{k-1}")
            + ")"
        )
        ctes.append(
            f"""agg{k} AS (
  SELECT CAST(sum(n * w) AS BIGINT) AS sw,
         CAST(sum(n * (1000000 - w)) AS BIGINT) AS swc,
         CAST(sum(n) AS BIGINT) AS nn,
         {", ".join(f"CAST(sum(CASE WHEN a{i+1} THEN n * w ELSE 0 END) AS BIGINT) AS swa{i+1}" for i in (0, 1, 2))},
         {", ".join(f"CAST(sum(CASE WHEN a{i+1} THEN n * (1000000 - w) ELSE 0 END) AS BIGINT) AS swca{i+1}" for i in (0, 1, 2))}
  FROM w{k})"""
        )
        ctes.append(
            f"""par{k} AS (
  SELECT CAST(sw // nn AS BIGINT) AS p_micro,
         {", ".join(f"CAST(swa{i+1} * 1000000 // sw AS BIGINT) AS m{i+1}_micro" for i in (0, 1, 2))},
         {", ".join(f"CAST(swca{i+1} * 1000000 // swc AS BIGINT) AS u{i+1}_micro" for i in (0, 1, 2))}
  FROM agg{k})"""
        )
        p = "p_micro"
        m = [f"m{i+1}_micro" for i in (0, 1, 2)]
        u = [f"u{i+1}_micro" for i in (0, 1, 2)]
    final = f"""
SELECT a1, a2, a3, n, {w_expr(p, m, u)} AS w_micro,
       p_micro, m1_micro, m2_micro, m3_micro, u1_micro, u2_micro, u3_micro
FROM pat CROSS JOIN par{iterations}"""
    return "WITH " + ",\n".join(ctes) + final


ORACLES["fs_em_weights"] = _fs_em_oracle()


# ---------------------------------------------------------------------------
# E391 — IVF index append: the oracle is E297's verified replay with
# the BUILD CTEs base-filtered (append == assign-all to base
# centroids, by construction of the shared assignment rule).
# ---------------------------------------------------------------------------

QUERIES["ivf_index_append_topk"] = similarity.ivf_index_append_topk
_IVF_BASE_PRED = corpus.duck_md5_bucket("vec_id", 5) + " <> 0"
ORACLES["ivf_index_append_topk"] = (
    ORACLES["ivf_indexed_topk"]
    .replace(
        "SELECT vec_id AS cell, v AS c FROM emb WHERE vec_id < 16",
        "SELECT vec_id AS cell, v AS c FROM emb WHERE vec_id < 16"
        f" AND {_IVF_BASE_PRED}",
    )
    .replace(
        "FROM emb e CROSS JOIN c0",
        f"FROM (SELECT * FROM emb WHERE {_IVF_BASE_PRED}) e CROSS JOIN c0",
    )
)
assert ORACLES["ivf_index_append_topk"] != ORACLES["ivf_indexed_topk"]


# ---------------------------------------------------------------------------
# E392 — SQL scripting walk: the oracle computes the loop's fixed
# point set-wise (min k with n_above(k) < 1000 over the same exact
# integer power ladder).
# ---------------------------------------------------------------------------

QUERIES["scripted_threshold_walk"] = sqlapi.scripted_threshold_walk
ORACLES["scripted_threshold_walk"] = f"""
WITH q AS (
  SELECT o_orderkey, {duck_units("o_totalprice", 2)} // 1000000 AS q
  FROM orders
  WHERE {duck_units("o_totalprice", 2)} // 1000000 >= 1
), powers AS (
  SELECT CAST(t.i AS INTEGER) AS b, CAST(power(2, t.i) AS BIGINT) AS lo
  FROM unnest(range(0, 40)) AS t(i)
), buck AS (
  SELECT b, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT o_orderkey, max(b) AS b
    FROM q JOIN powers ON q.q >= lo GROUP BY o_orderkey
  ) GROUP BY b
), lad AS (
  SELECT k.i AS k,
         CAST(coalesce((SELECT sum(n) FROM buck WHERE b >= k.i), 0) AS BIGINT)
           AS n_above
  FROM unnest(range(0, 41)) AS k(i)
), fixp AS (
  SELECT CAST(min(k) AS INTEGER) AS steps FROM lad WHERE n_above < 1000
)
SELECT steps,
       CAST(1000000 * power(2, steps) AS BIGINT) AS final_threshold_cents,
       (SELECT n_above FROM lad WHERE k = steps) AS n_above_final
FROM fixp
"""


# ---------------------------------------------------------------------------
# E393 — parameterized SQL: the oracle inlines the same constants the
# parser binds; identical plans by constant folding.
# ---------------------------------------------------------------------------

QUERIES["parameterized_orders_report"] = sqlapi.parameterized_orders_report
ORACLES["parameterized_orders_report"] = f"""
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS ym,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum({duck_units("o_totalprice", 2)}) AS BIGINT) AS rev_cents
FROM orders
WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) >= 1996
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# E394 — SQL UDFs (scalar + table-valued): oracle inlines the bodies.
# ---------------------------------------------------------------------------

QUERIES["sql_udf_report"] = sqlapi.sql_udf_report
ORACLES["sql_udf_report"] = f"""
WITH m AS (
  SELECT o_orderpriority AS priority,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS ym,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum({duck_units("o_totalprice", 2)}) AS BIGINT) AS rev_cents
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY 1, 2
)
SELECT priority, ym, n_orders, rev_cents FROM m
"""


# ---------------------------------------------------------------------------
# E395 — polymorphic UDTF: schema computed by analyze(); oracle checks
# the pass-through values plus the appended audit column.
# ---------------------------------------------------------------------------

QUERIES["udtf_polymorphic_profile"] = pandas_ops.udtf_polymorphic_profile
ORACLES["udtf_polymorphic_profile"] = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
       CAST(3 AS INTEGER) AS n_fields
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# E396 — leakage release certificate: composes the verified cluster,
# pair, and contamination oracles; the contamination row is expected
# NOT to pass on this fixture (the action-item row).
# ---------------------------------------------------------------------------

QUERIES["leakage_release_certificate"] = dedup.leakage_release_certificate
ORACLES["leakage_release_certificate"] = f"""
WITH clusters AS MATERIALIZED (
{ORACLES["dup_clusters"]}
), assign AS MATERIALIZED (
  SELECT d.doc_id,
         CASE WHEN {corpus.duck_md5_bucket("coalesce(c.cluster_id, d.doc_id)", 100)} < 20
              THEN 'val' ELSE 'train' END AS split
  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
), pairs AS MATERIALIZED (
{ORACLES["ngram_jaccard_pairs"]}
), straddle AS (
  SELECT 'split_straddle_pairs' AS "check",
         CAST(count(*) AS BIGINT) AS n_checked,
         CAST(coalesce(sum(CASE WHEN a.split <> b.split THEN 1 END), 0)
              AS BIGINT) AS n_violations
  FROM pairs p
  JOIN assign a ON p.doc_a = a.doc_id
  JOIN assign b ON p.doc_b = b.doc_id
), exact_g AS (
  SELECT 'exact_dup_split_crossover' AS "check",
         CAST(count(*) AS BIGINT) AS n_checked,
         CAST(coalesce(sum(CASE WHEN nsplits > 1 THEN 1 END), 0) AS BIGINT)
           AS n_violations
  FROM (
    SELECT md5(text) AS h, count(*) AS sz,
           count(DISTINCT a.split) AS nsplits
    FROM documents d JOIN assign a ON d.doc_id = a.doc_id
    GROUP BY md5(text) HAVING count(*) > 1
  )
), contam_hits AS (
{ORACLES["contamination_pairs"]}
), contam AS (
  SELECT 'benchmark_contamination_train' AS "check",
         (SELECT CAST(count(*) AS BIGINT) FROM documents
          WHERE source <> 'src0') AS n_checked,
         (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM contam_hits)
           AS n_violations
)
SELECT "check", n_checked, n_violations, n_violations = 0 AS passed
FROM (SELECT * FROM straddle UNION ALL SELECT * FROM exact_g
      UNION ALL SELECT * FROM contam)
"""


# ---------------------------------------------------------------------------
# E397 — the fix for E396's blind spot: CC over near-dup ∪ exact-hash
# edges; both straddle checks must certify zero.
# ---------------------------------------------------------------------------

QUERIES["leakage_safe_split_v2"] = dedup.leakage_safe_split_v2
ORACLES["leakage_safe_split_v2"] = f"""
WITH RECURSIVE t AS (
  SELECT doc_id, lang, source,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '')) AS toks
  FROM documents
), pairs AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4)
        >= 0.8
), hx AS (
  SELECT md5(text) AS h, doc_id FROM documents
), roots AS (
  SELECT h, min(doc_id) AS root, count(*) AS sz FROM hx GROUP BY h
), exact_edges AS MATERIALIZED (
  SELECT r.root AS src, hx.doc_id AS dst
  FROM hx JOIN roots r USING (h)
  WHERE r.sz > 1 AND hx.doc_id <> r.root
), edges AS MATERIALIZED (
  SELECT doc_a AS u, doc_b AS w FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS w FROM pairs
  UNION
  SELECT src AS u, dst AS w FROM exact_edges
  UNION
  SELECT dst AS u, src AS w FROM exact_edges
), cc(v, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, cc.l FROM edges e JOIN cc ON cc.v = e.w
), comp AS MATERIALIZED (
  SELECT v AS doc_id, min(l) AS cluster_id FROM cc GROUP BY v
), assign AS MATERIALIZED (
  SELECT d.doc_id,
         CASE WHEN {corpus.duck_md5_bucket("coalesce(c.cluster_id, d.doc_id)", 100)} < 20
              THEN 'val' ELSE 'train' END AS split
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
), nd AS (
  SELECT 'near_dup_straddle_pairs' AS "check",
         CAST(count(*) AS BIGINT) AS n_checked,
         CAST(coalesce(sum(CASE WHEN a.split <> b.split THEN 1 END), 0)
              AS BIGINT) AS n_violations
  FROM pairs p
  JOIN assign a ON p.doc_a = a.doc_id
  JOIN assign b ON p.doc_b = b.doc_id
), ex AS (
  SELECT 'exact_dup_straddle_edges' AS "check",
         CAST(count(*) AS BIGINT) AS n_checked,
         CAST(coalesce(sum(CASE WHEN a.split <> b.split THEN 1 END), 0)
              AS BIGINT) AS n_violations
  FROM exact_edges e
  JOIN assign a ON e.src = a.doc_id
  JOIN assign b ON e.dst = b.doc_id
)
SELECT "check", n_checked, n_violations, n_violations = 0 AS passed
FROM (SELECT * FROM nd UNION ALL SELECT * FROM ex)
"""


# ---------------------------------------------------------------------------
# E398 — dup-collapsed retrieval: composes the verified BM25 (pool=30)
# and cluster oracles; collapse + final rank over the 30-row pool.
# ---------------------------------------------------------------------------

QUERIES["bm25_dedup_topk"] = text.bm25_dedup_topk
assert ORACLES["bm25_topk"].rstrip().endswith("LIMIT 10")
ORACLES["bm25_dedup_topk"] = f"""
WITH cands AS MATERIALIZED (
{ORACLES["bm25_topk"].rstrip()[: -len("LIMIT 10")]} LIMIT 30
), clusters AS MATERIALIZED (
{ORACLES["dup_clusters"]}
), units AS (
  SELECT c.doc_id, c.n_matched, c.score,
         coalesce(cl.cluster_id, c.doc_id) AS unit_id
  FROM cands c LEFT JOIN clusters cl ON c.doc_id = cl.doc_id
), best AS (
  SELECT doc_id, n_matched, score, unit_id, n_collapsed FROM (
    SELECT *,
           row_number() OVER (PARTITION BY unit_id
                              ORDER BY score DESC, doc_id ASC) AS rn,
           count(*) OVER (PARTITION BY unit_id) AS n_collapsed
    FROM units
  ) WHERE rn = 1
)
SELECT CAST(rnk AS INTEGER) AS rnk, doc_id, unit_id, n_matched, score,
       CAST(n_collapsed AS BIGINT) AS n_collapsed
FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
  FROM best
) WHERE rnk <= 10
"""


# ---------------------------------------------------------------------------
# E399 — full-corpus measured blocking recall: the UNBLOCKED
# prefix-filter join (inverted index, never all-pairs) finds every
# true pair ≥ t; the oracle replays the exact set-Jaccard quadratically
# (fixture-sized) and classifies pairs by lang×source block membership.
# ---------------------------------------------------------------------------

QUERIES["blocking_recall_report"] = dedup.blocking_recall_report
ORACLES["blocking_recall_report"] = f"""
WITH d AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), p AS (
  SELECT CASE WHEN a.lang = b.lang AND a.source = b.source
              THEN 1 ELSE 0 END AS same_block
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
              / CAST(len(a.toks) + len(b.toks)
                     - len(list_intersect(a.toks, b.toks)) AS DOUBLE), 4)
        >= 0.8
)
SELECT CAST(8000 AS BIGINT) AS threshold_bp,
       CAST(count(*) AS BIGINT) AS n_pairs_unblocked,
       CAST(coalesce(sum(same_block), 0) AS BIGINT) AS n_pairs_blocked,
       CAST(coalesce(sum(1 - same_block), 0) AS BIGINT) AS n_pairs_cross_block,
       CAST(CASE WHEN count(*) > 0
                 THEN coalesce(sum(same_block), 0) * 1000000 // count(*)
                 ELSE 1000000 END AS BIGINT) AS recall_ppm
FROM p
"""


# ---------------------------------------------------------------------------
# E401 — bounded-rate ingestion: maxFilesPerTrigger=2 over a 6-file
# staged source ⇒ exactly 3 availableNow micro-batches; per-batch
# partial aggregates merge declaratively and must equal the batch
# totals whatever the file→batch assignment was.
# ---------------------------------------------------------------------------

QUERIES["streaming_backpressure_drain"] = _stream.backpressure_drain_query
ORACLES["streaming_backpressure_drain"] = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum({duck_units("value", 2)}) AS BIGINT) AS value_cents,
       CAST(3 AS BIGINT) AS n_batches
FROM events
GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# E402 — clustering-depth audit: simulated date-range vs hash-ingest
# layouts of orders, measured as probe overlap depth + skip ratio on
# the o_orderdate predicate column (the OPTIMIZE decision metric).
# ---------------------------------------------------------------------------

from parquet_to_csv_spark.sources import layout as _layout2  # noqa: E402

QUERIES["clustering_depth_report"] = _layout2.clustering_depth_report
ORACLES["clustering_depth_report"] = """
WITH o AS (
  SELECT o_orderkey, epoch_ms(o_orderdate) // 86400000 AS day FROM orders
), b AS (
  SELECT min(day) AS d0, max(day) AS d1 FROM o
), assigned AS (
  SELECT day,
         CAST((day - d0) * 16 // (d1 - d0 + 1) AS INTEGER) AS f_date,
         CAST(o_orderkey % 16 AS INTEGER) AS f_hash
  FROM o CROSS JOIN b
), manif AS (
  SELECT 'date_range' AS layout, f_date AS f, min(day) AS mn, max(day) AS mx
  FROM assigned GROUP BY 2
  UNION ALL
  SELECT 'hash_ingest', f_hash, min(day), max(day) FROM assigned GROUP BY 2
), probes AS (
  SELECT d0 + t.i * (d1 - d0) // 10 AS p
  FROM b, unnest(range(0, 11)) AS t(i)
), hits AS (
  SELECT layout, p,
         CAST(sum(CASE WHEN p BETWEEN mn AND mx THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
  FROM manif CROSS JOIN probes GROUP BY 1, 2
), pf AS (
  SELECT layout, CAST(count(DISTINCT f) AS BIGINT) AS n_files
  FROM manif GROUP BY 1
), agg AS (
  SELECT layout,
         CAST(sum(n_hit) * 1000 // count(*) AS BIGINT) AS avg_overlap_milli,
         CAST(max(n_hit) AS BIGINT) AS max_overlap,
         CAST(count(*) AS BIGINT) AS n_probes,
         CAST(sum(n_hit) AS BIGINT) AS _tot
  FROM hits GROUP BY 1
)
SELECT a.layout, pf.n_files, a.n_probes, a.avg_overlap_milli, a.max_overlap,
       CAST(1000000 - _tot * 1000000 // (a.n_probes * pf.n_files) AS BIGINT)
         AS skip_ppm
FROM agg a JOIN pf USING (layout)
"""

# ---------------------------------------------------------------------------
# E403 — incremental view maintenance with retractions: the maintained
# aggregate (base view + CDC delta applied to the AGGREGATE) must equal
# the oracle's independent full recompute of the post-CDC table.
# ---------------------------------------------------------------------------

from parquet_to_csv_spark.operators.corpus import duck_md5_bucket  # noqa: E402

QUERIES["incremental_view_maintenance"] = relational.incremental_view_maintenance
ORACLES["incremental_view_maintenance"] = f"""
WITH ev AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         {duck_md5_bucket("event_id", 100)} AS b
  FROM events
), final AS (
  SELECT event_type,
         CASE WHEN b < 80 AND b % 7 = 1 THEN cents + 1000
              ELSE cents END AS cents
  FROM ev
  WHERE b >= 80 OR (b < 80 AND b % 7 <> 0)
), audit AS (
  SELECT event_type,
         CAST(coalesce(sum(CASE WHEN b >= 80 THEN 1 END), 0) AS BIGINT)
           AS n_inserted,
         CAST(coalesce(sum(CASE WHEN b < 80 AND b % 7 = 0 THEN 1 END), 0)
           AS BIGINT) AS n_deleted,
         CAST(coalesce(sum(CASE WHEN b < 80 AND b % 7 = 1 THEN 1 END), 0)
           AS BIGINT) AS n_updated
  FROM ev GROUP BY 1
), fin AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS value_cents
  FROM final GROUP BY 1
)
SELECT a.event_type, coalesce(f.n_events, 0) AS n_events,
       coalesce(f.value_cents, 0) AS value_cents,
       a.n_inserted, a.n_deleted, a.n_updated
FROM audit a LEFT JOIN fin f USING (event_type)
"""

# ---------------------------------------------------------------------------
# E404 — encoding-health audit; regex classes are shared Java/RE2
# syntax, replayed verbatim by the oracle.
# ---------------------------------------------------------------------------

QUERIES["encoding_health_report"] = text.encoding_health_report
ORACLES["encoding_health_report"] = """
WITH d AS (
  SELECT lang, source,
         CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END AS has_repl,
         CASE WHEN regexp_matches(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')
              THEN 1 ELSE 0 END AS has_ctrl,
         CASE WHEN regexp_matches(text, '(â€|Ã[©¤¼¨¶]|ï»¿)')
              THEN 1 ELSE 0 END AS has_moji,
         CAST(len(text) AS BIGINT) AS n_chars,
         CAST(len(text) - len(regexp_replace(text, '[^\\x00-\\x7f]', '', 'g'))
              AS BIGINT) AS n_nonascii
  FROM documents
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(has_repl) AS BIGINT) AS n_replacement_docs,
       CAST(sum(has_ctrl) AS BIGINT) AS n_control_docs,
       CAST(sum(has_moji) AS BIGINT) AS n_mojibake_docs,
       CAST(CASE WHEN sum(n_chars) > 0
                 THEN sum(n_nonascii) * 1000000 // sum(n_chars)
                 ELSE 0 END AS BIGINT) AS nonascii_ppm
FROM d GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# E405 — LSH operating-point report: exact shingle-Jaccard truth per
# 0.05 band vs the MinHash-LSH verified output; the oracle replays the
# exact quadratic truth and pins the 100%-recall contract per band
# (the s-curve theory column is Python-evaluated literals — the
# BH-crit discipline, neither engine touches pow()).
# ---------------------------------------------------------------------------

from parquet_to_csv_spark.plans.registry_parts.p01 import _DUCK_SHINGLES  # noqa: E402,F401

_LSH_THEORY_SQL = "[" + ", ".join(
    str(t) for t in dedup._lsh_theory_micro(dedup._LSH_BANDS_BP)
) + "]"
_SHJ = (
    "round(len(list_intersect(a.sh, b.sh)) / CAST(len(a.sh) + len(b.sh)"
    " - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 4)"
)

QUERIES["lsh_operating_point_report"] = dedup.lsh_operating_point_report
ORACLES["lsh_operating_point_report"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM t
), pairs AS (
  SELECT least(CAST(floor({_SHJ} * 10000) AS BIGINT) // 500 * 500, 9500)
           AS band_lo_bp
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE {_SHJ} >= 0.5
)
SELECT band_lo_bp,
       CAST(count(*) AS BIGINT) AS n_true_pairs,
       CAST(count(*) AS BIGINT) AS n_lsh_found,
       CAST(1000000 AS BIGINT) AS recall_ppm,
       CAST(({_LSH_THEORY_SQL})[CAST((band_lo_bp - 5000) // 500 AS INTEGER) + 1]
            AS BIGINT) AS theory_candidate_micro
FROM pairs GROUP BY 1
"""

# ---------------------------------------------------------------------------
# E406 — bitemporal as-of join: valid-time x transaction-time probes
# over a deterministic versioned dim; corrections must not rewrite
# reports generated before the restatement.
# ---------------------------------------------------------------------------

from parquet_to_csv_spark.operators import rangejoin  # noqa: E402

QUERIES["bitemporal_asof_report"] = rangejoin.bitemporal_asof_report
ORACLES["bitemporal_asof_report"] = """
WITH c AS (
  SELECT c_custkey, c_mktsegment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
), ver AS (
  SELECT c_custkey, c_mktsegment, 0 AS vf, 100 AS vt, 0 AS tf,
         1000000 AS tt, cents AS bal FROM c
  UNION ALL
  SELECT c_custkey, c_mktsegment, 100, 1000000, 0, 50, cents + 500 FROM c
  UNION ALL
  SELECT c_custkey, c_mktsegment, 100, 1000000, 50, 1000000, cents + 700 FROM c
), probes AS (
  SELECT * FROM (VALUES (50, 25), (150, 25), (150, 75), (50, 75))
    AS t(probe_v, probe_t)
)
SELECT CAST(probe_v AS INTEGER) AS probe_v,
       CAST(probe_t AS INTEGER) AS probe_t,
       c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(bal) AS BIGINT) AS bal_cents
FROM ver JOIN probes
  ON probe_v >= vf AND probe_v < vt AND probe_t >= tf AND probe_t < tt
GROUP BY 1, 2, 3
"""

# ---------------------------------------------------------------------------
# E407 — sketch-based join-size prediction: the E88 HLL replay per join
# side (generated SQL, 6 sketches), uniformity estimate vs exact count.
# ---------------------------------------------------------------------------

from parquet_to_csv_spark.plans.registry_parts.p03 import _sketch  # noqa: E402,F401


def _duck_hll_scalar(table: str, key: str) -> str:
    """Scalar subquery: the E88 HLL estimate for ``key`` of ``table``."""
    return f"""(
WITH hh AS (
  SELECT (instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
       + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) AS bucket,
         ltrim(substring(h, 3, 15), '0') AS t
  FROM (SELECT md5(CAST({key} AS VARCHAR)) AS h FROM {table})
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
  SELECT (256 - n_present) AS n_zero,
         CAST(s_present + (256 - n_present)::HUGEINT
              * 2305843009213693952::HUGEINT AS DOUBLE) AS s_total
  FROM acc
), e AS (
  SELECT n_zero,
         (0.7213 / (1 + 1.079 / 256.0)) * 65536.0
           * 2305843009213693952.0 / s_total AS raw
  FROM s
)
SELECT round(CASE WHEN raw <= 640.0 AND n_zero > 0
                  THEN 256.0 * ln(256.0 / n_zero)
                  ELSE raw END, 2) FROM e)"""


_JOIN_SPEC = [
    ("customer_orders", ("customer", "c_custkey"), ("orders", "o_custkey")),
    ("orders_lineitem", ("orders", "o_orderkey"), ("lineitem", "l_orderkey")),
    ("part_lineitem", ("part", "p_partkey"), ("lineitem", "l_partkey")),
]

_JOIN_ROWS = "\nUNION ALL\n".join(
    f"""SELECT '{jn}' AS join_name,
       CAST((SELECT count(*) FROM {lt}) AS BIGINT) AS n_left,
       CAST((SELECT count(*) FROM {rt}) AS BIGINT) AS n_right,
       {_duck_hll_scalar(lt, lk)} AS ndv_left_est,
       {_duck_hll_scalar(rt, rk)} AS ndv_right_est,
       CAST((SELECT count(*) FROM {lt} a JOIN {rt} b ON a.{lk} = b.{rk})
            AS BIGINT) AS actual_rows"""
    for jn, (lt, lk), (rt, rk) in _JOIN_SPEC
)

QUERIES["join_size_prediction_report"] = _sketch.join_size_prediction_report
ORACLES["join_size_prediction_report"] = f"""
WITH base AS (
{_JOIN_ROWS}
)
SELECT join_name, n_left, n_right, ndv_left_est, ndv_right_est, actual_rows,
       CAST(floor(CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
                  / greatest(ndv_left_est, ndv_right_est)) AS BIGINT)
         AS predicted_rows,
       CAST((CAST(floor(CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
                  / greatest(ndv_left_est, ndv_right_est)) AS BIGINT)
             - actual_rows) * 1000000 // actual_rows AS BIGINT) AS err_ppm
FROM base
"""

# ---------------------------------------------------------------------------
# E408 — largest-remainder (Hamilton) penny allocation: floor shares +
# remainder-ranked pennies; books must balance to ZERO drift.
# ---------------------------------------------------------------------------

QUERIES["largest_remainder_allocation"] = relational.largest_remainder_allocation
ORACLES["largest_remainder_allocation"] = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
), o AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_c
  FROM orders
), j AS (
  SELECT l_orderkey, l_linenumber, qty, total_c
  FROM li JOIN o ON l_orderkey = o_orderkey
), s AS (
  SELECT l_orderkey, CAST(sum(qty) AS BIGINT) AS qsum FROM j GROUP BY 1
), base AS (
  SELECT j.l_orderkey, l_linenumber, qty, total_c, qsum,
         total_c * qty // qsum AS floor_c,
         total_c * qty % qsum AS rem_num
  FROM j JOIN s ON j.l_orderkey = s.l_orderkey
), ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY rem_num DESC, l_linenumber ASC, qty ASC) AS rnk,
         sum(floor_c) OVER (PARTITION BY l_orderkey) AS floor_sum
  FROM base
), alloc AS (
  SELECT l_orderkey, l_linenumber,
         floor_c + CASE WHEN rnk <= total_c - floor_sum THEN 1 ELSE 0 END
           AS alloc_c
  FROM ranked
), per_order AS (
  SELECT a.l_orderkey,
         CAST(sum(alloc_c) AS BIGINT) AS alloc_sum,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(max(alloc_c) AS BIGINT) AS max_line_c
  FROM alloc a GROUP BY 1
)
SELECT n_lines,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(abs(alloc_sum - total_c)) AS BIGINT) AS total_abs_drift_c,
       CAST(sum(max_line_c) AS BIGINT) AS sum_max_line_c
FROM per_order JOIN o ON per_order.l_orderkey = o.o_orderkey
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# E409 — multi-k k-core fixpoint summary (extends E223): Spark peels
# to proven fixpoint per k; the oracle
# unrolls 6 peel rounds (MATERIALIZED — DuckDB re-inlines
# multiply-referenced CTEs) and gates convergence via n_unstable = 0.
# ---------------------------------------------------------------------------


def _kcore_oracle_sql(ks=(2, 3), rounds=6) -> str:
    ctes = [
        f"""t AS MATERIALIZED (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), p AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4)
        >= 0.5
), e0 AS MATERIALIZED (
  SELECT doc_a AS u, doc_b AS v FROM p
  UNION
  SELECT doc_b, doc_a FROM p
)"""
    ]
    finals = []
    for k in ks:
        prev = "e0"
        for r in range(1, rounds + 1):
            name = f"k{k}r{r}"
            ctes.append(
                f"""{name} AS MATERIALIZED (
  SELECT u, v FROM {prev}
  WHERE u IN (SELECT u FROM {prev} GROUP BY u HAVING count(*) >= {k})
    AND v IN (SELECT u FROM {prev} GROUP BY u HAVING count(*) >= {k})
)"""
            )
            prev = name
        finals.append(
            f"""SELECT CAST({k} AS INTEGER) AS k,
       CAST(count(DISTINCT u) AS BIGINT) AS n_core_nodes,
       CAST(count(*) // 2 AS BIGINT) AS n_core_edges,
       CAST((SELECT count(*) FROM (
              SELECT u FROM {prev} GROUP BY u HAVING count(*) < {k}))
            AS BIGINT) AS n_unstable
FROM {prev}"""
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(finals)


QUERIES["kcore_summary_sweep"] = dedup.kcore_summary_sweep
ORACLES["kcore_summary_sweep"] = _kcore_oracle_sql()

# ---------------------------------------------------------------------------
# E410 — append-mode watermark finalization audit (out-of-order files):
# emitted = windows with end <= ms-floored global max event time - 30 min,
# exactly once; deep-late rows land because their windows were never
# finalized (numRowsDroppedByWatermark == 0 pinned in pytest).
# ---------------------------------------------------------------------------

QUERIES["streaming_latedrop_drain"] = _stream.latedrop_drain_query
ORACLES["streaming_latedrop_drain"] = """
WITH ev AS (
  SELECT event_type, epoch_ms(ts) AS ems FROM events
), wm AS (
  SELECT max(ems) - 1800000 AS wm3 FROM ev
)
SELECT (ems // 3600000) * 3600000 AS ws_ms, event_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM ev CROSS JOIN wm
WHERE (ems // 3600000 + 1) * 3600000 <= wm3
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# E411 — denormalize-once serving table: Spark scans the materialized
# wide artifact; the oracle recomputes from the NORMALIZED tables, so
# flattening defects (fan-out dups, dropped rows) shift the hash.
# ---------------------------------------------------------------------------

QUERIES["denormalized_serving_report"] = _layout2.denormalized_serving_report
ORACLES["denormalized_serving_report"] = """
SELECT r_name AS region, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS rev_cents,
       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# E412 — Poisson bootstrap CI: 16-bit-quantized inverse-CDF weights
# (Python-evaluated literals), exact integer resample means, CI = order
# statistics of the B-row means relation; oracle replays the full
# bootstrap bit-for-bit.
# ---------------------------------------------------------------------------

_P1_TH = mlmetrics._poisson1_thresholds_u16()
_BOOT_U = duck_md5_bucket("o_orderkey || ':' || b", 65536)
_BOOT_W = " + ".join(f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in _P1_TH)

QUERIES["bootstrap_mean_ci"] = mlmetrics.bootstrap_mean_ci
ORACLES["bootstrap_mean_ci"] = f"""
WITH keyed AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         c_mktsegment AS seg
  FROM orders JOIN customer ON o_custkey = c_custkey
), rs AS (
  SELECT o_orderkey, cents, seg, t.b,
         {_BOOT_U} AS u
  FROM keyed, unnest(range(0, 32)) AS t(b)
), wgt AS (
  SELECT seg, b, cents, ({_BOOT_W}) AS w FROM rs
), means AS (
  SELECT seg, b,
         CAST(CASE WHEN sum(w) > 0
              THEN sum(w * cents) * 100 // sum(w) ELSE 0 END AS BIGINT)
           AS mean_c4
  FROM wgt GROUP BY 1, 2
), ranked AS (
  SELECT seg, b, mean_c4,
         row_number() OVER (PARTITION BY seg ORDER BY mean_c4, b) AS rnk
  FROM means
), point AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) * 100 // count(*) AS BIGINT) AS point_mean_c4
  FROM keyed GROUP BY 1
), ci AS (
  SELECT seg,
         CAST(max(CASE WHEN rnk = 1 THEN mean_c4 END) AS BIGINT) AS ci_lo_c4,
         CAST(max(CASE WHEN rnk = 31 THEN mean_c4 END) AS BIGINT) AS ci_hi_c4
  FROM ranked GROUP BY 1
)
SELECT point.seg, n_orders, point_mean_c4, ci_lo_c4, ci_hi_c4
FROM point JOIN ci USING (seg)
"""

# ---------------------------------------------------------------------------
# E413 — golden-record survivorship: longest-text keep + merged
# cluster facts over the verified closure (composes the dup_clusters
# oracle as a CTE, the dup_weighted_mixture pattern).
# ---------------------------------------------------------------------------

QUERIES["golden_record_report"] = dedup.golden_record_report
ORACLES["golden_record_report"] = f"""
WITH clusters AS MATERIALIZED (
{ORACLES["dup_clusters"]}
), d AS (
  SELECT doc_id, lang, source, CAST(length(text) AS BIGINT) AS len
  FROM documents
), members AS (
  SELECT c.doc_id, c.cluster_id, d.lang, d.source, d.len
  FROM clusters c JOIN d USING (doc_id)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
                               ORDER BY len DESC, doc_id ASC) AS rn
  FROM members
), facts AS (
  SELECT cluster_id,
         CAST(count(*) AS BIGINT) AS n_members,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(sum(len) AS BIGINT) AS total_chars
  FROM members GROUP BY 1
)
SELECT r.cluster_id, r.doc_id AS keep_doc_id, r.len AS keep_chars,
       r.source AS keep_source, f.n_members, f.n_sources, f.n_langs,
       f.total_chars
FROM ranked r JOIN facts f USING (cluster_id)
WHERE r.rn = 1
"""

# ---------------------------------------------------------------------------
# E414 — off-policy bandit replay: train-half argmax policy, eval-half
# replay estimator; exact ppm integers end to end.
# ---------------------------------------------------------------------------

QUERIES["bandit_replay_eval"] = mlmetrics.bandit_replay_eval
ORACLES["bandit_replay_eval"] = f"""
WITH ev AS (
  SELECT (epoch_ms(ts) // 3600000) % 24 // 6 AS ctx,
         event_type AS arm,
         CASE WHEN {duck_units("value", 2)} >= 5000 THEN 1 ELSE 0 END
           AS reward,
         epoch_ms(ts) // 86400000 AS day
  FROM events
), mid AS (
  SELECT CAST((min(day) + max(day)) // 2 AS BIGINT) AS midday FROM ev
), log AS (
  SELECT ctx, arm, reward, day < midday AS is_train
  FROM ev CROSS JOIN mid
), train AS (
  SELECT ctx, arm,
         CAST(sum(reward) * 1000000 // count(*) AS BIGINT) AS cvr_ppm
  FROM log WHERE is_train GROUP BY 1, 2
), policy AS (
  SELECT ctx, arm AS policy_arm FROM (
    SELECT *, row_number() OVER (PARTITION BY ctx
                                 ORDER BY cvr_ppm DESC, arm ASC) AS rn
    FROM train
  ) WHERE rn = 1
)
SELECT CAST(l.ctx AS INTEGER) AS ctx, p.policy_arm,
       CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(CASE WHEN l.arm = p.policy_arm THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched,
       CAST(CASE WHEN sum(CASE WHEN l.arm = p.policy_arm THEN 1 ELSE 0 END) > 0
            THEN sum(CASE WHEN l.arm = p.policy_arm THEN reward ELSE 0 END)
                 * 1000000 // sum(CASE WHEN l.arm = p.policy_arm THEN 1 ELSE 0 END)
            ELSE 0 END AS BIGINT) AS replay_cvr_ppm,
       CAST(sum(reward) * 1000000 // count(*) AS BIGINT) AS baseline_cvr_ppm,
       CAST(CASE WHEN sum(CASE WHEN l.arm = p.policy_arm THEN 1 ELSE 0 END) > 0
            THEN sum(CASE WHEN l.arm = p.policy_arm THEN reward ELSE 0 END)
                 * 1000000 // sum(CASE WHEN l.arm = p.policy_arm THEN 1 ELSE 0 END)
            ELSE 0 END
            - sum(reward) * 1000000 // count(*) AS BIGINT) AS lift_ppm
FROM log l JOIN policy p ON l.ctx = p.ctx
WHERE NOT l.is_train
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# E415 — leakage-safe split v3: E399's measured blocking gap applied to
# the E397 certificate — v2 units straddle under the UNBLOCKED truth
# (the finding, 7,484/30,328 pairs at sf0.01); v3 units = CC over
# unblocked ∪ exact star edges re-certify zero. Oracle replays both
# closures recursively (per-level DISTINCT via UNION — clique graphs).
# ---------------------------------------------------------------------------

QUERIES["leakage_safe_split_v3"] = dedup.leakage_safe_split_v3
ORACLES["leakage_safe_split_v3"] = f"""
WITH RECURSIVE t AS MATERIALIZED (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), up AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CASE WHEN a.lang = b.lang AND a.source = b.source
              THEN 1 ELSE 0 END AS same_block
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4)
        >= 0.8
), ex AS MATERIALIZED (
  SELECT r.root AS src, d.doc_id AS dst
  FROM (SELECT md5(text) AS h, doc_id FROM documents) d
  JOIN (SELECT md5(text) AS h, min(doc_id) AS root, count(*) AS c
        FROM documents GROUP BY 1) r USING (h)
  WHERE r.c > 1 AND d.doc_id <> r.root
), e2 AS MATERIALIZED (
  SELECT doc_a AS u, doc_b AS w FROM up WHERE same_block = 1
  UNION SELECT doc_b, doc_a FROM up WHERE same_block = 1
  UNION SELECT src, dst FROM ex
  UNION SELECT dst, src FROM ex
), e3 AS MATERIALIZED (
  SELECT doc_a AS u, doc_b AS w FROM up
  UNION SELECT doc_b, doc_a FROM up
  UNION SELECT src, dst FROM ex
  UNION SELECT dst, src FROM ex
), cc2(v, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e2)
  UNION
  SELECT e2.u, cc2.l FROM e2 JOIN cc2 ON cc2.v = e2.w
), cc3(v, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e3)
  UNION
  SELECT e3.u, cc3.l FROM e3 JOIN cc3 ON cc3.v = e3.w
), lab2 AS MATERIALIZED (
  SELECT v AS doc_id, min(l) AS cluster_id FROM cc2 GROUP BY v
), lab3 AS MATERIALIZED (
  SELECT v AS doc_id, min(l) AS cluster_id FROM cc3 GROUP BY v
), asg2 AS MATERIALIZED (
  SELECT d.doc_id,
         CASE WHEN {duck_md5_bucket("coalesce(l.cluster_id, d.doc_id)", 100)}
              < 20 THEN 'val' ELSE 'train' END AS split
  FROM documents d LEFT JOIN lab2 l USING (doc_id)
), asg3 AS MATERIALIZED (
  SELECT d.doc_id,
         CASE WHEN {duck_md5_bucket("coalesce(l.cluster_id, d.doc_id)", 100)}
              < 20 THEN 'val' ELSE 'train' END AS split
  FROM documents d LEFT JOIN lab3 l USING (doc_id)
)
SELECT 'v2_unblocked_near_dup_straddle' AS check,
       CAST(count(*) AS BIGINT) AS n_checked,
       CAST(coalesce(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_violations,
       coalesce(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END), 0) = 0
         AS passed
FROM up JOIN asg2 sa ON up.doc_a = sa.doc_id
        JOIN asg2 sb ON up.doc_b = sb.doc_id
UNION ALL
SELECT 'v3_unblocked_near_dup_straddle',
       CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END), 0)
            AS BIGINT),
       coalesce(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END), 0) = 0
FROM up JOIN asg3 sa ON up.doc_a = sa.doc_id
        JOIN asg3 sb ON up.doc_b = sb.doc_id
UNION ALL
SELECT 'v3_exact_dup_straddle',
       CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END), 0)
            AS BIGINT),
       coalesce(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END), 0) = 0
FROM ex JOIN asg3 sa ON ex.src = sa.doc_id
        JOIN asg3 sb ON ex.dst = sb.doc_id
"""

# ---------------------------------------------------------------------------
# E416 — dedup ROI threshold sweep: one blocked pair base at the 0.5
# floor, per-threshold recursive closures + keep-one token mass.
# ---------------------------------------------------------------------------


def _dedup_sweep_oracle(thresholds=(0.5, 0.65, 0.8)) -> str:
    ctes = [
        f"""t AS MATERIALIZED (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), dt AS MATERIALIZED (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS nt FROM documents
), allp AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(len(list_intersect(a.toks, b.toks))
               / CAST(len(list_distinct(list_concat(a.toks, b.toks)))
                      AS DOUBLE), 4) AS j
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4)
        >= 0.5
)"""
    ]
    finals = []
    for t in thresholds:
        g = int(round(t * 100))
        ctes.append(
            f"""p{g} AS MATERIALIZED (
  SELECT doc_a, doc_b FROM allp WHERE j >= {t}
), e{g} AS MATERIALIZED (
  SELECT doc_a AS u, doc_b AS w FROM p{g}
  UNION SELECT doc_b, doc_a FROM p{g}
), cc{g}(v, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e{g})
  UNION
  SELECT e{g}.u, cc{g}.l FROM e{g} JOIN cc{g} ON cc{g}.v = e{g}.w
), mem{g} AS MATERIALIZED (
  SELECT lab.doc_id, lab.cluster_id, dt.nt
  FROM (SELECT v AS doc_id, min(l) AS cluster_id FROM cc{g} GROUP BY v) lab
  JOIN dt USING (doc_id)
)"""
        )
        finals.append(
            f"""SELECT CAST({g} AS INTEGER) AS threshold_pct,
       (SELECT CAST(count(*) AS BIGINT) FROM p{g}) AS n_pairs,
       CAST(count(*) AS BIGINT) AS n_docs_touched,
       CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(sum(nt) - sum(CASE WHEN doc_id = cluster_id THEN nt ELSE 0 END)
            AS BIGINT) AS tokens_removable
FROM mem{g}"""
        )
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(finals)
    )


QUERIES["dedup_threshold_sweep"] = dedup.dedup_threshold_sweep
ORACLES["dedup_threshold_sweep"] = _dedup_sweep_oracle()

# ---------------------------------------------------------------------------
# E417/E418 — riders on the unblocked edge artifact: paraphrase-level
# benchmark contamination per training source, and the cross-source
# syndication matrix. Oracles replay the exact unblocked pair base.
# ---------------------------------------------------------------------------

_UB_PAIR_BASE = f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents
), up AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4)
        >= 0.8
), meta AS (
  SELECT doc_id, source FROM documents
)"""

QUERIES["paraphrase_contamination_report"] = dedup.paraphrase_contamination_report
ORACLES["paraphrase_contamination_report"] = f"""{_UB_PAIR_BASE}
, cross_p AS (
  SELECT CASE WHEN ma.source = 'src0' THEN up.doc_a ELSE up.doc_b END
           AS bench_doc,
         CASE WHEN ma.source = 'src0' THEN up.doc_b ELSE up.doc_a END
           AS train_doc,
         CASE WHEN ma.source = 'src0' THEN mb.source ELSE ma.source END
           AS train_source
  FROM up JOIN meta ma ON up.doc_a = ma.doc_id
          JOIN meta mb ON up.doc_b = mb.doc_id
  WHERE (ma.source = 'src0') <> (mb.source = 'src0')
)
SELECT train_source,
       CAST(count(*) AS BIGINT) AS n_contaminated_pairs,
       CAST(count(DISTINCT bench_doc) AS BIGINT) AS n_bench_docs_reached,
       CAST(count(DISTINCT train_doc) AS BIGINT) AS n_train_docs_implicated
FROM cross_p GROUP BY 1
"""

QUERIES["syndication_matrix"] = dedup.syndication_matrix
ORACLES["syndication_matrix"] = f"""{_UB_PAIR_BASE}
SELECT least(ma.source, mb.source) AS source_1,
       greatest(ma.source, mb.source) AS source_2,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM up JOIN meta ma ON up.doc_a = ma.doc_id
        JOIN meta mb ON up.doc_b = mb.doc_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round 6 — E419-E423
# ---------------------------------------------------------------------------

from parquet_to_csv_spark.plans.registry_parts.p01 import _duck_cos  # noqa: E402

QUERIES["approx_percentile_audit"] = relational.approx_percentile_audit
# E382 discipline: the guarantee flags are deterministic engine-side
# invariants (GK rank error <= n/accuracy under ANY merge order), so
# the oracle asserts them as constants and recomputes the exact side.
ORACLES["approx_percentile_audit"] = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(quantile_cont(l_extendedprice, 0.5), 2) AS p50_exact,
       round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_exact,
       TRUE AS p50_within_guarantee,
       TRUE AS p90_within_guarantee
FROM lineitem GROUP BY 1
"""

QUERIES["pipe_syntax_report"] = sqlapi.pipe_syntax_report
ORACLES["pipe_syntax_report"] = """
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(count(*) AS BIGINT) AS n_returned_lines,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS returned_charge_cents
FROM lineitem
WHERE l_returnflag = 'R'
GROUP BY 1
HAVING count(*) > 10
"""

QUERIES["statestore_introspection_drain"] = _stream.statestore_introspection_drain
ORACLES["statestore_introspection_drain"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""

QUERIES["embedding_contamination_report"] = similarity.embedding_contamination_report
ORACLES["embedding_contamination_report"] = f"""
WITH b AS (
  SELECT vec_id AS bench_id, embedding AS be FROM embeddings WHERE label = 0
), t AS (
  SELECT vec_id, label, embedding AS e FROM embeddings WHERE label <> 0
), pv AS (
  SELECT t.label, t.vec_id,
         max(round({_duck_cos('t.e', 'b.be')}, 6)) AS max_cos
  FROM t CROSS JOIN b GROUP BY 1, 2
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN max_cos >= 0.35 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       max(max_cos) AS max_similarity
FROM pv GROUP BY 1
"""

QUERIES["sequential_pattern_topk"] = timeops.sequential_pattern_topk
ORACLES["sequential_pattern_topk"] = """
WITH e AS (
  SELECT user_id, event_type,
         row_number() OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS rn
  FROM events
), utp AS (
  SELECT user_id, event_type AS t, list_sort(list(rn)) AS ps,
         min(rn) AS minp, max(rn) AS maxp
  FROM e GROUP BY 1, 2
), supp AS (
  SELECT a.t AS step_1, b.t AS step_2, c.t AS step_3,
         CAST(count(DISTINCT a.user_id) AS BIGINT) AS support
  FROM utp a
  JOIN utp b ON a.user_id = b.user_id
  JOIN utp c ON a.user_id = c.user_id
  WHERE len(list_filter(b.ps, p -> p > a.minp AND p < c.maxp)) > 0
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, row_number() OVER (
           ORDER BY support DESC, step_1, step_2, step_3
         ) AS rnk
  FROM supp
)
SELECT step_1, step_2, step_3, support, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 15
"""


QUERIES["identifier_parameterized_report"] = sqlapi.identifier_parameterized_report
ORACLES["identifier_parameterized_report"] = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM orders GROUP BY 1
"""

# E428 — modularity of the dup-cluster partition; pairs + min-label CC
# replayed exactly as in the dup_clusters oracle, then Q from exact
# integers in one shared-shape double expression.
QUERIES["cluster_modularity_report"] = dedup.cluster_modularity_report
ORACLES["cluster_modularity_report"] = f"""
WITH RECURSIVE t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), pairs AS MATERIALIZED (
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
), labels AS MATERIALIZED (
  SELECT v AS doc_id, min(l) AS cluster_id FROM cc GROUP BY v
), tagged AS MATERIALIZED (
  SELECT la.cluster_id AS ca, lb.cluster_id AS cb
  FROM pairs p
  JOIN labels la ON p.doc_a = la.doc_id
  JOIN labels lb ON p.doc_b = lb.doc_id
), mm AS (
  SELECT count(*) AS m FROM tagged
), deg AS (
  SELECT c, count(*) AS deg_c FROM (
    SELECT ca AS c FROM tagged UNION ALL SELECT cb AS c FROM tagged
  ) GROUP BY 1
), intra AS (
  SELECT ca AS c, count(*) AS e_c FROM tagged WHERE ca = cb GROUP BY 1
), per_c AS (
  SELECT d.c, coalesce(i.e_c, 0) AS e_c, d.deg_c
  FROM deg d LEFT JOIN intra i USING (c)
), sums AS (
  SELECT count(*) AS n_clusters, sum(e_c) AS se, sum(deg_c * deg_c) AS sd2
  FROM per_c
)
SELECT CAST(mm.m AS BIGINT) AS m_edges,
       CAST(sums.n_clusters AS BIGINT) AS n_clusters,
       CAST(floor((CAST(sums.se AS DOUBLE) / mm.m
                   - CAST(sums.sd2 AS DOUBLE)
                     / (CAST(4 AS DOUBLE) * mm.m * mm.m)) * 1e6
                  + 0.5) AS BIGINT) AS modularity_micro
FROM sums, mm
"""


# E427 — RAKE keywords; corpus-defined stopword set (top-15 df), the
# same window cumsum / integer scoring replayed in DuckDB.
QUERIES["rake_keywords"] = text.rake_keywords
ORACLES["rake_keywords"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), tok AS (
  SELECT doc_id, unnest(list_transform(range(0, len(toks)),
         i -> {{'pos': i, 'w': toks[i+1]}})) AS pw
  FROM t
), tk AS (
  SELECT doc_id, (pw).pos AS pos, (pw).w AS w FROM tok
), stop AS (
  SELECT w AS sw FROM (
    SELECT w, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1
    ORDER BY df DESC, w LIMIT 15
  )
), marked AS (
  SELECT tk.doc_id, tk.pos, tk.w, (stop.sw IS NOT NULL) AS is_stop
  FROM tk LEFT JOIN stop ON tk.w = stop.sw
), ph AS (
  SELECT doc_id, pos, w, is_stop,
         sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
  FROM marked
), phr AS (
  SELECT doc_id, phrase_id, list(w ORDER BY pos) AS ws, count(*) AS plen
  FROM ph WHERE NOT is_stop
  GROUP BY 1, 2
  HAVING count(*) <= 4
), member AS (
  SELECT doc_id, phrase_id, plen,
         array_to_string(ws, ' ') AS phrase, unnest(ws) AS w
  FROM phr
), wscore AS (
  SELECT w, (1000 * sum(plen)) // count(*) AS wscore_milli
  FROM member GROUP BY 1
), occ AS (
  SELECT m.doc_id, m.phrase_id, m.phrase,
         sum(ws.wscore_milli) AS occ_score
  FROM member m JOIN wscore ws USING (w)
  GROUP BY 1, 2, 3
), agg AS (
  SELECT phrase, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(max(occ_score) AS BIGINT) AS score_milli
  FROM occ GROUP BY 1
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY score_milli DESC, phrase) AS rnk
  FROM agg
)
SELECT phrase, n_docs, score_milli, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 15
"""


# E426 — position delete vectors: non-error types untouched, error rows
# deleted positionally then re-appended for value > 2 only.
QUERIES["position_delete_scan"] = _layout.position_delete_scan
ORACLES["position_delete_scan"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct_ids
FROM events WHERE event_type <> 'error'
GROUP BY 1
UNION ALL
SELECT 'error' AS event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct_ids
FROM events WHERE event_type = 'error' AND value > 2.0
HAVING count(*) > 0
"""


# E424 — DoReMi-lite mixture reweighting: the MW fixed point unrolled
# (MATERIALIZED per step — DuckDB re-inlines multiply-referenced CTEs
# otherwise); every step is BIGINT arithmetic, replayed bit for bit.
def _doremi_oracle(n_steps: int = 4) -> str:
    head = f"""
WITH t AS (
  SELECT source, {_TOKS} AS toks FROM documents
), occ AS MATERIALIZED (
  SELECT source, unnest(toks) AS w FROM t
), model AS MATERIALIZED (
  SELECT w, count(*) AS cnt FROM occ GROUP BY 1
), scored AS MATERIALIZED (
  SELECT w, CAST(floor(ln(CAST((SELECT sum(cnt) FROM model) AS DOUBLE) / cnt)
                 * 1000000 + 0.5) AS BIGINT) AS s_micro
  FROM model
), per_src AS MATERIALIZED (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(s_micro) AS BIGINT) AS sum_s
  FROM occ JOIN scored USING (w) GROUP BY 1
), base AS MATERIALIZED (
  SELECT source, n_tokens, CAST(sum_s // n_tokens AS BIGINT) AS loss_micro
  FROM per_src
), ex AS MATERIALIZED (
  SELECT source, n_tokens, loss_micro,
         loss_micro - (SELECT min(loss_micro) FROM base) AS excess_micro
  FROM base
), gains AS MATERIALIZED (
  SELECT source, n_tokens, loss_micro, excess_micro,
         CASE WHEN (SELECT max(excess_micro) FROM ex) > 0
              THEN excess_micro * 200000 // (SELECT max(excess_micro) FROM ex)
              ELSE 0 END AS gain_ppm
  FROM ex
), w0 AS MATERIALIZED (
  SELECT source, n_tokens, loss_micro, excess_micro, gain_ppm,
         CAST(1000000 // (SELECT count(*) FROM gains)
              + CASE WHEN row_number() OVER (ORDER BY source)
                     <= 1000000 % (SELECT count(*) FROM gains)
                THEN 1 ELSE 0 END AS BIGINT) AS w_ppm
  FROM gains
)"""
    steps = []
    for i in range(1, n_steps + 1):
        p = f"w{i - 1}"
        steps.append(f""", r{i} AS MATERIALIZED (
  SELECT *, w_ppm * (1000000 + gain_ppm) AS raw FROM {p}
), s{i} AS MATERIALIZED (
  SELECT source, n_tokens, loss_micro, excess_micro, gain_ppm,
         raw * 1000000 // (SELECT sum(raw) FROM r{i}) AS fl,
         raw * 1000000 % (SELECT sum(raw) FROM r{i}) AS rem
  FROM r{i}
), w{i} AS MATERIALIZED (
  SELECT source, n_tokens, loss_micro, excess_micro, gain_ppm,
         CAST(fl + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                        <= 1000000 - (SELECT sum(fl) FROM s{i})
                   THEN 1 ELSE 0 END AS BIGINT) AS w_ppm
  FROM s{i}
)""")
    tail = f"""
SELECT source, n_tokens, loss_micro, excess_micro,
       CAST(w_ppm AS BIGINT) AS weight_ppm
FROM w{n_steps}
"""
    return head + "".join(steps) + tail


QUERIES["doremi_lite_weights"] = corpus.doremi_lite_weights
ORACLES["doremi_lite_weights"] = _doremi_oracle()


# E429 — REAL WAV (RIFF PCM) decode gate: the oracle regenerates every
# waveform's features from the closed-form square-wave formulas without
# touching a byte (the E309 discipline, audio edition).
from parquet_to_csv_spark.operators import multimodal as _mm  # noqa: E402

QUERIES["multimodal_audio_decode"] = _mm.multimodal_audio_decode
ORACLES["multimodal_audio_decode"] = """
WITH c AS (SELECT unnest(range(0, 16)) AS cid)
SELECT CAST(cid AS BIGINT) AS clip_id,
       CAST(CASE WHEN cid % 2 = 1 THEN 2 ELSE 1 END AS INT) AS channels,
       CAST(8000 + 1000 * (cid % 3) AS INT) AS sample_rate,
       CAST(400 * (1 + cid % 4) AS BIGINT) AS n_samples,
       CAST(400 * (1 + cid % 4) * 500 * (cid + 1)
            * (CASE WHEN cid % 2 = 1 THEN 2 ELSE 1 END) AS BIGINT) AS sum_abs,
       CAST(500 * (cid + 1) AS BIGINT) AS max_abs,
       CAST((400 * (1 + cid % 4) - 1) // (2 + cid % 5) AS BIGINT)
         AS n_zero_cross
FROM c
"""


# E523 — FLAC decode gate (round 8): same feature formulas as E429 but
# through the pure-Python FLAC bitstream (fixed/LPC predictors, Rice
# partitions + escapes, mid/side stereo, CRC-8/16, STREAMINFO MD5).
# Constant clips (cid % 5 = 0) have zero crossings 0; square clips
# (n-1) // half. sum_abs and max_abs share one closed form.
QUERIES["multimodal_flac_decode"] = _mm.multimodal_flac_decode
ORACLES["multimodal_flac_decode"] = """
WITH c AS (SELECT unnest(range(0, 16)) AS cid)
SELECT CAST(cid AS BIGINT) AS clip_id,
       CAST(CASE WHEN cid % 2 = 1 THEN 2 ELSE 1 END AS INT) AS channels,
       CAST(8000 + 1000 * (cid % 3) AS INT) AS sample_rate,
       CAST(400 * (1 + cid % 4) AS BIGINT) AS n_samples,
       CAST(400 * (1 + cid % 4) * 300 * (cid + 1)
            * (CASE WHEN cid % 2 = 1 THEN 2 ELSE 1 END) AS BIGINT) AS sum_abs,
       CAST(300 * (cid + 1) AS BIGINT) AS max_abs,
       CAST(CASE WHEN cid % 5 = 0 THEN 0
                 ELSE (400 * (1 + cid % 4) - 1) // (2 + cid % 5) END
            AS BIGINT) AS n_zero_cross
FROM c
"""


QUERIES["state_metadata_report"] = _stream.state_metadata_report
ORACLES["state_metadata_report"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'stateStoreSave', 'default', CAST(8 AS INT),
   CAST(1 AS BIGINT)),
  (CAST(1 AS BIGINT), 'dedupe', 'default', CAST(8 AS INT), CAST(1 AS BIGINT))
) AS t(operator_id, operator_name, state_store_name, n_partitions, n_batches)
"""


# E431 — Hilbert key digest: the oracle replays the SAME per-round SQL
# text (shared generator, '//' for DuckDB's integer division) through a
# generated CTE chain.
from parquet_to_csv_spark.sources.layout import _hilbert_round_exprs  # noqa: E402


def _hilbert_oracle(bits: int = 12) -> str:
    parts = [
        "WITH r_init AS (SELECT CAST(o_orderkey % 4096 AS BIGINT) AS _hx, "
        "CAST(o_custkey % 4096 AS BIGINT) AS _hy, CAST(0 AS BIGINT) AS _hd "
        "FROM orders)"
    ]
    prev = "r_init"
    for i in range(bits - 1, -1, -1):
        sa, sb = _hilbert_round_exprs(1 << i, "//")
        parts.append(f", a{i} AS (SELECT *, {', '.join(sa)} FROM {prev})")
        parts.append(f", b{i} AS (SELECT {', '.join(sb)} FROM a{i})")
        prev = f"b{i}"
    parts.append(
        f" SELECT CAST(_hd // 1048576 AS BIGINT) AS bucket, "
        f"CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(sum(_hd) AS BIGINT) AS key_sum FROM {prev} GROUP BY 1"
    )
    return "".join(parts)


QUERIES["hilbert_layout_digest"] = _layout.hilbert_layout_digest
ORACLES["hilbert_layout_digest"] = _hilbert_oracle()


# E434 — trigram stupid backoff on the md5 heldout split; each tier's
# score is one ln of an exact integer rational (0.4 factors folded in).
QUERIES["trigram_backoff_score"] = corpus.trigram_backoff_score
ORACLES["trigram_backoff_score"] = f"""
WITH tagged0 AS (
  SELECT doc_id, source, {_TOKS} AS tk,
         {duck_md5_bucket("doc_id", 100)} < 80 AS is_train
  FROM documents
), tagged AS MATERIALIZED (
  SELECT * FROM tagged0 WHERE len(tk) >= 3
), tri AS MATERIALIZED (
  SELECT source, is_train, p[1] AS w1, p[2] AS w2, p[3] AS w3
  FROM (
    SELECT source, is_train,
           unnest(list_zip(list_slice(tk, 1, greatest(len(tk) - 2, 0)),
                           list_slice(tk, 2, len(tk) - 1),
                           list_slice(tk, 3, len(tk)))) AS p
    FROM tagged
  ) WHERE p[1] IS NOT NULL AND p[2] IS NOT NULL AND p[3] IS NOT NULL
), train_tri AS MATERIALIZED (
  SELECT w1, w2, w3, count(*) AS c123 FROM tri WHERE is_train GROUP BY 1, 2, 3
), bi AS MATERIALIZED (
  SELECT is_train, p[1] AS w1, p[2] AS w2
  FROM (
    SELECT is_train,
           unnest(list_zip(list_slice(tk, 1, greatest(len(tk) - 1, 0)),
                           list_slice(tk, 2, len(tk)))) AS p
    FROM tagged
  ) WHERE p[1] IS NOT NULL AND p[2] IS NOT NULL
), train_bi AS MATERIALIZED (
  SELECT w1, w2, count(*) AS cb FROM bi WHERE is_train GROUP BY 1, 2
), b2tot AS MATERIALIZED (
  SELECT w1 AS l2, sum(cb) AS c2b FROM train_bi GROUP BY 1
), train_uni AS MATERIALIZED (
  SELECT t, count(*) AS c3
  FROM (SELECT unnest(tk) AS t FROM tagged WHERE is_train) GROUP BY 1
), nv AS (
  SELECT count(*) AS n_tok, count(DISTINCT t) AS v
  FROM (SELECT unnest(tk) AS t FROM tagged WHERE is_train)
), scored AS MATERIALIZED (
  SELECT h.source,
         CASE WHEN tt.c123 IS NOT NULL THEN 1
              WHEN t23.cb IS NOT NULL THEN 2 ELSE 3 END AS tier,
         CAST(round(CASE
           WHEN tt.c123 IS NOT NULL
             THEN ln(CAST(tt.c123 AS DOUBLE) / t12.cb)
           WHEN t23.cb IS NOT NULL
             THEN ln(CAST(4 * t23.cb AS DOUBLE) / (10 * b2.c2b))
           ELSE ln(CAST(16 * (coalesce(tu.c3, 0) + 1) AS DOUBLE)
                   / (100 * (nv.n_tok + nv.v)))
         END * 1000000) AS BIGINT) AS u
  FROM tri h
  LEFT JOIN train_tri tt ON h.w1 = tt.w1 AND h.w2 = tt.w2 AND h.w3 = tt.w3
  LEFT JOIN train_bi t12 ON h.w1 = t12.w1 AND h.w2 = t12.w2
  LEFT JOIN train_bi t23 ON h.w2 = t23.w1 AND h.w3 = t23.w2
  LEFT JOIN b2tot b2 ON h.w2 = b2.l2
  LEFT JOIN train_uni tu ON h.w3 = tu.t
  CROSS JOIN nv
  WHERE NOT h.is_train
)
SELECT source, CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(sum(u) // count(*) AS BIGINT) AS mean_score_micro,
       CAST(sum(CASE WHEN tier = 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS trigram_hit_ppm,
       CAST(sum(CASE WHEN tier = 2 THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS bigram_hit_ppm
FROM scored GROUP BY 1
"""


# E435 — Luhn audit; the checksum is the same integer lambda in both
# engines, and the planted check digits make precision exact.
QUERIES["pii_luhn_audit"] = corpus.pii_luhn_audit
ORACLES["pii_luhn_audit"] = r"""
WITH staged AS (
  SELECT doc_id, source, text,
         lpad(CAST((doc_id * 2654435761) % 1000000000000000 AS VARCHAR),
              15, '0') AS pfx
  FROM documents
), withpart AS (
  SELECT *,
         list_sum(list_transform(range(1, 16), i ->
           CASE WHEN i % 2 = 1 THEN
             CASE WHEN 2 * CAST(substr(pfx, CAST(i AS INT), 1) AS INT) < 10
                  THEN 2 * CAST(substr(pfx, CAST(i AS INT), 1) AS INT)
                  ELSE 2 * CAST(substr(pfx, CAST(i AS INT), 1) AS INT) - 9 END
           ELSE CAST(substr(pfx, CAST(i AS INT), 1) AS INT) END)) AS partial
  FROM staged
), aug AS (
  SELECT doc_id, source,
         text || CASE WHEN doc_id % 5 = 0
           THEN ' card ' || pfx || CAST(
             CASE WHEN doc_id % 2 = 0 THEN (10 - partial % 10) % 10
                  ELSE ((10 - partial % 10) % 10 + 1) % 10 END AS VARCHAR)
           ELSE '' END AS t
  FROM withpart
), cands AS (
  SELECT source, unnest(regexp_extract_all(t, '\b\d{16}\b')) AS cand
  FROM aug
), flagged AS (
  SELECT source,
         CASE WHEN list_sum(list_transform(range(1, 17), i ->
           CASE WHEN i % 2 = 1 THEN
             CASE WHEN 2 * CAST(substr(cand, CAST(i AS INT), 1) AS INT) < 10
                  THEN 2 * CAST(substr(cand, CAST(i AS INT), 1) AS INT)
                  ELSE 2 * CAST(substr(cand, CAST(i AS INT), 1) AS INT) - 9 END
           ELSE CAST(substr(cand, CAST(i AS INT), 1) AS INT) END)) % 10 = 0
         THEN 1 ELSE 0 END AS ok
  FROM cands
)
SELECT source, CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(ok) AS BIGINT) AS n_luhn_valid,
       CAST(sum(ok) * 1000000 // count(*) AS BIGINT) AS precision_ppm
FROM flagged GROUP BY 1
"""


from parquet_to_csv_spark.operators import semistruct as _semi  # noqa: E402

QUERIES["props_map_promotion"] = _semi.props_map_promotion
ORACLES["props_map_promotion"] = """
SELECT event_type, k AS key,
       CAST(count(*) AS BIGINT) AS n_entries,
       CAST(sum(CAST(json_extract_string(props, '$.' || k) AS BIGINT))
            AS BIGINT) AS sum_val,
       CAST(count(DISTINCT json_extract_string(props, '$.' || k)) AS BIGINT)
         AS n_distinct_vals
FROM (
  SELECT event_type, props, unnest(json_keys(props)) AS k FROM events
)
GROUP BY 1, 2
"""


# E438 — MP4 container metadata: oracle recomputes from the clip
# formulas (E309/E429 discipline, video edition).
QUERIES["multimodal_video_meta"] = _mm.multimodal_video_meta
ORACLES["multimodal_video_meta"] = """
WITH c AS (SELECT unnest(range(0, 16)) AS cid)
SELECT CAST(cid AS BIGINT) AS clip_id,
       CASE WHEN cid % 2 = 0 THEN 'isom' ELSE 'mp42' END AS major_brand,
       CAST(1000 * (1 + cid % 3) AS INT) AS timescale,
       CAST(2500 * (cid + 1) AS BIGINT) AS duration,
       CAST(1 + cid % 2 AS INT) AS n_tracks,
       CAST(2500 * (cid + 1) * 1000 // (1000 * (1 + cid % 3)) AS BIGINT)
         AS duration_ms
FROM c
"""


# E439 — deterministic DP release; md5-u16 inverse-CDF Laplace, one
# micro-floored ln of an exact rational per group.
QUERIES["dp_release_counts"] = mlmetrics.dp_release_counts
_DP_U16 = duck_md5_bucket("event_type || '_dp1'", 65536)
ORACLES["dp_release_counts"] = f"""
WITH per AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY 1
), st AS (
  SELECT event_type, n,
         abs(2 * {_DP_U16} + 2 - 65537) AS k,
         CASE WHEN 2 * {_DP_U16} + 2 - 65537 >= 0 THEN 1 ELSE -1 END AS sgn
  FROM per
)
SELECT event_type,
       CAST(-sgn * CAST(floor(ln(CAST(65537 - k AS DOUBLE) / 65537)
            * 1000000 + 0.5) AS BIGINT) AS BIGINT) AS noise_micro,
       CAST(n + CAST(floor((-sgn * CAST(floor(ln(CAST(65537 - k AS DOUBLE)
            / 65537) * 1000000 + 0.5) AS BIGINT)) / 1e6 + 0.5) AS BIGINT)
            AS BIGINT) AS released_count,
       CAST(1000000 AS BIGINT) AS epsilon_ppm
FROM st
"""


# E440 — pinball-loss quantile backtest; trailing 7-day order-statistic
# forecast, milli-cent integer losses.
QUERIES["pinball_loss_backtest"] = timeops.pinball_loss_backtest
ORACLES["pinball_loss_backtest"] = """
WITH daily AS (
  SELECT tns // 86400000000000 AS day,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS y
  FROM (SELECT epoch_us(ts) * 1000 AS tns, value FROM events) GROUP BY 1
), trail AS (
  SELECT day, y,
         list_sort(list(y) OVER (ORDER BY day
           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) AS hist
  FROM daily
), fore AS (
  SELECT day, y, hist[4] AS f50, hist[7] AS f90
  FROM trail WHERE len(hist) = 7
), loss AS (
  SELECT day,
         CASE WHEN y >= f50 THEN 500 * (y - f50)
              ELSE 500 * (f50 - y) END AS l50,
         CASE WHEN y >= f90 THEN 900 * (y - f90)
              ELSE 100 * (f90 - y) END AS l90
  FROM fore
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(l50) AS BIGINT) AS pinball50_milli,
       CAST(sum(l90) AS BIGINT) AS pinball90_milli,
       CAST(sum(l50) // count(*) AS BIGINT) AS mean50_milli,
       CAST(sum(l90) // count(*) AS BIGINT) AS mean90_milli
FROM loss
"""


# E441 — personalized PageRank, 3 unrolled MATERIALIZED levels over the
# blocked 0.8 pair relation; integer ppb mass.
def _ppr_oracle(iters: int = 3, k: int = 20) -> str:
    head = f"""{_UB_PAIR_BASE}
, pairs AS (SELECT doc_a, doc_b FROM up)
, edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), nodes AS MATERIALIZED (
  SELECT e.src AS v, count(*) AS deg, (d.source = 'src0') AS is_seed
  FROM edges e JOIN documents d ON e.src = d.doc_id
  GROUP BY e.src, d.source
), ns AS (
  SELECT count(*) AS ns FROM nodes WHERE is_seed
), base AS MATERIALIZED (
  SELECT v, deg, is_seed,
         CASE WHEN is_seed THEN 1000000000 // ns ELSE 0 END AS e
  FROM nodes, ns
), p0 AS MATERIALIZED (
  SELECT v, deg, is_seed, e, e AS pr FROM base
)"""
    parts = [head]
    for i in range(1, iters + 1):
        parts.append(f""", c{i} AS MATERIALIZED (
  SELECT e2.dst, sum(p.pr // p.deg) AS inc
  FROM p{i - 1} p JOIN edges e2 ON p.v = e2.src GROUP BY 1
), p{i} AS MATERIALIZED (
  SELECT b.v, b.deg, b.is_seed, b.e,
         (15 * b.e) // 100 + (85 * coalesce(c{i}.inc, 0)) // 100 AS pr
  FROM base b LEFT JOIN c{i} ON b.v = c{i}.dst
)""")
    parts.append(f"""
SELECT v AS doc_id, CAST(deg AS BIGINT) AS deg,
       CAST(pr AS BIGINT) AS ppr_ppb, CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (ORDER BY pr DESC, v) AS rnk
  FROM p{iters} WHERE NOT is_seed AND pr > 0
) WHERE rnk <= {k}
""")
    return "".join(parts)


QUERIES["personalized_pagerank"] = dedup.personalized_pagerank
ORACLES["personalized_pagerank"] = _ppr_oracle()


# E442 — Hilbert vs Morton pruning comparison; both curve constructions
# replayed arithmetically in the oracle.
from parquet_to_csv_spark.sources.layout import _morton_arith_expr  # noqa: E402


def _curve_pruning_oracle(bits: int = 12, n_files: int = 24) -> str:
    span = (4 ** bits) // n_files
    parts = ["""
WITH hsrc AS (
  SELECT o_orderkey % 4096 AS x, o_custkey % 4096 AS y,
         CAST(o_orderkey % 4096 AS BIGINT) AS _hx,
         CAST(o_custkey % 4096 AS BIGINT) AS _hy,
         CAST(0 AS BIGINT) AS _hd
  FROM orders
)"""]
    prev = "hsrc"
    for i in range(bits - 1, -1, -1):
        sa, sb = _hilbert_round_exprs(1 << i, "//")
        parts.append(f", ha{i} AS (SELECT *, {', '.join(sa)} FROM {prev})")
        parts.append(f", hb{i} AS (SELECT x, y, {', '.join(sb)} FROM ha{i})")
        prev = f"hb{i}"
    parts.append(f""", keyed AS MATERIALIZED (
  SELECT x, y, 'hilbert' AS curve, _hd AS key FROM {prev}
  UNION ALL
  SELECT x, y, 'morton' AS curve,
         CAST({_morton_arith_expr('//')} AS BIGINT) AS key
  FROM (SELECT o_orderkey % 4096 AS x, o_custkey % 4096 AS y FROM orders)
), manifest AS MATERIALIZED (
  SELECT curve, key // {span} AS fid,
         min(x) AS minx, max(x) AS maxx,
         min(y) AS miny, max(y) AS maxy, count(*) AS n_rows
  FROM keyed GROUP BY 1, 2
), boxes AS (
  SELECT CAST(i AS INT) AS box_id, CAST((i * 512) % 4096 AS INT) AS x0,
         CAST((i * 1280 + 256) % 4096 AS INT) AS y0
  FROM (SELECT unnest(range(0, 8)) AS i)
), kept AS (
  SELECT curve, box_id, CAST(count(*) AS BIGINT) AS n_files_kept,
         CAST(sum(n_rows) AS BIGINT) AS n_rows_scanned
  FROM manifest m JOIN boxes b
    ON m.maxx >= b.x0 AND m.minx <= b.x0 + 255
   AND m.maxy >= b.y0 AND m.miny <= b.y0 + 255
  GROUP BY 1, 2
), matches AS (
  SELECT box_id, CAST(count(*) AS BIGINT) AS n_rows_matching
  FROM (SELECT o_orderkey % 4096 AS x, o_custkey % 4096 AS y FROM orders) d
  JOIN boxes b ON d.x >= b.x0 AND d.x <= b.x0 + 255
              AND d.y >= b.y0 AND d.y <= b.y0 + 255
  GROUP BY 1
)
SELECT k.curve, k.box_id, k.n_files_kept, k.n_rows_scanned,
       coalesce(m.n_rows_matching, CAST(0 AS BIGINT)) AS n_rows_matching
FROM kept k LEFT JOIN matches m USING (box_id)""")
    return "".join(parts)


QUERIES["curve_pruning_comparison"] = _layout.curve_pruning_comparison
ORACLES["curve_pruning_comparison"] = _curve_pruning_oracle()


# E443 — contributor capping; md5-ordered deterministic per-user keep.
QUERIES["contributor_cap_sample"] = corpus.contributor_cap_sample
ORACLES["contributor_cap_sample"] = """
WITH ranked AS (
  SELECT event_type, user_id,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY md5(CAST(event_id AS VARCHAR) || '_cap'), event_id
         ) AS rn
  FROM events
), per_ut AS (
  SELECT event_type, user_id, count(*) AS n_b,
         sum(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS n_a
  FROM ranked GROUP BY 1, 2
)
SELECT event_type,
       CAST(sum(n_b) AS BIGINT) AS n_before,
       CAST(sum(n_a) AS BIGINT) AS n_after,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(max(n_b) * 1000000 // sum(n_b) AS BIGINT)
         AS max_user_share_before_ppm,
       CAST(max(n_a) * 1000000 // sum(n_a) AS BIGINT)
         AS max_user_share_after_ppm
FROM per_ut GROUP BY 1
"""


# E444 — tokenizer round-trip fidelity vs RAW text.
QUERIES["tokenizer_roundtrip_audit"] = text.tokenizer_roundtrip_audit
ORACLES["tokenizer_roundtrip_audit"] = f"""
WITH per AS (
  SELECT source,
         CASE WHEN array_to_string({_TOKS}, ' ') = text THEN 1 ELSE 0 END
           AS exact,
         length(text) - length(array_to_string({_TOKS}, ' ')) AS lost
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(exact) AS BIGINT) AS n_roundtrip_exact,
       CAST(sum(exact) * 1000000 // count(*) AS BIGINT) AS exact_ppm,
       CAST(sum(lost) AS BIGINT) AS chars_lost
FROM per GROUP BY 1
"""


# E445 — posting-list delta+varint estimate; identical integer CASE
# ladders in both engines.
QUERIES["postings_compression_estimate"] = text.postings_compression_estimate
ORACLES["postings_compression_estimate"] = f"""
WITH posting AS (
  SELECT t, list_sort(list(DISTINCT doc_id)) AS ids
  FROM (SELECT doc_id, unnest({_TOKS}) AS t FROM documents)
  GROUP BY 1
), per_tok AS (
  SELECT len(ids) AS df,
         list_sum(list_transform(range(1, len(ids) + 1), i ->
           CASE WHEN (CASE WHEN i = 1 THEN ids[1] + 1
                      ELSE ids[CAST(i AS INT)] - ids[CAST(i AS INT) - 1] END) < 128 THEN 1
                WHEN (CASE WHEN i = 1 THEN ids[1] + 1
                      ELSE ids[CAST(i AS INT)] - ids[CAST(i AS INT) - 1] END) < 16384 THEN 2
                WHEN (CASE WHEN i = 1 THEN ids[1] + 1
                      ELSE ids[CAST(i AS INT)] - ids[CAST(i AS INT) - 1] END) < 2097152 THEN 3
                WHEN (CASE WHEN i = 1 THEN ids[1] + 1
                      ELSE ids[CAST(i AS INT)] - ids[CAST(i AS INT) - 1] END) < 268435456 THEN 4
                ELSE 5 END)) AS varint_bytes
  FROM posting
), banded AS (
  SELECT CASE WHEN df = 1 THEN '1' WHEN df <= 10 THEN '2-10'
              WHEN df <= 100 THEN '11-100' ELSE '101+' END AS df_band,
         df, varint_bytes
  FROM per_tok
)
SELECT df_band, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(df) AS BIGINT) AS n_postings,
       CAST(sum(df) * 8 AS BIGINT) AS raw_bytes,
       CAST(sum(varint_bytes) AS BIGINT) AS varint_bytes,
       CAST((sum(df) * 8 - sum(varint_bytes)) * 1000000 // (sum(df) * 8)
            AS BIGINT) AS savings_ppm
FROM banded GROUP BY 1
"""


# E446 — UDTF with TABLE argument + PARTITION BY; relational twin.
QUERIES["udtf_table_partition_summary"] = pandas_ops.udtf_table_partition_summary
ORACLES["udtf_table_partition_summary"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events GROUP BY 1
"""


# E447 — shallow clone lifecycle; closed-form per-table counts.
QUERIES["shallow_clone_scan"] = _layout.shallow_clone_scan
ORACLES["shallow_clone_scan"] = """
WITH base AS (
  SELECT event_type, count(*) AS n FROM events
  WHERE event_type <> 'error' GROUP BY 1
), extra AS (
  SELECT event_type, count(*) AS n FROM events
  WHERE value > 3.0 AND event_type IN ('click', 'purchase') GROUP BY 1
)
SELECT 'source' AS tbl, b.event_type,
       CAST(b.n + CASE WHEN b.event_type = 'purchase'
                       THEN coalesce(e.n, 0) ELSE 0 END AS BIGINT) AS n_rows
FROM base b LEFT JOIN extra e USING (event_type)
UNION ALL
SELECT 'clone' AS tbl, b.event_type,
       CAST(b.n + CASE WHEN b.event_type = 'click'
                       THEN coalesce(e.n, 0) ELSE 0 END AS BIGINT) AS n_rows
FROM base b LEFT JOIN extra e USING (event_type)
"""


# E448 — CDC feed over the posdel lifecycle artifact.
QUERIES["snapshot_cdc_report"] = _layout.snapshot_cdc_report
ORACLES["snapshot_cdc_report"] = """
SELECT 'delete' AS _change_type, 'error' AS event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct_ids
FROM events WHERE event_type = 'error'
UNION ALL
SELECT 'insert' AS _change_type, 'error' AS event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct_ids
FROM events WHERE event_type = 'error' AND value > 2.0
"""


# ---------------------------------------------------------------------------
# Round 7 — lakehouse write-path completion (E449-E451).
# ---------------------------------------------------------------------------

# E449 — MERGE INTO (upsert): final state after two merges, where the
# second merge's delete vector binds to files appended by the first.
QUERIES["merge_upsert_report"] = _layout.merge_upsert_report
ORACLES["merge_upsert_report"] = """
WITH base AS (SELECT event_id, event_type, value FROM events),
final AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 13 = 0 THEN value + 7.0
              WHEN event_id % 7 = 0 THEN value + 100.0
              ELSE value END AS value
  FROM base
  UNION ALL
  SELECT event_id + 100000000, 'merged', value + 1000.0
  FROM base WHERE event_id % 11 = 0
  UNION ALL
  SELECT event_id + 200000000, 'merged2', value
  FROM base WHERE event_id % 17 = 0
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids
FROM final GROUP BY event_type
"""

# E449 (CDC side) — v0→v2 net change feed: update = delete + insert;
# rows merged at v1 then re-merged at v2 net out of the inserts.
QUERIES["merge_cdc_report"] = _layout.merge_cdc_report
ORACLES["merge_cdc_report"] = """
WITH base AS (SELECT event_id, event_type FROM events),
changes AS (
  SELECT 'delete' AS _change_type, event_id, event_type FROM base
  WHERE event_id % 7 = 0 OR event_id % 13 = 0
  UNION ALL
  SELECT 'insert', event_id, event_type FROM base
  WHERE event_id % 7 = 0 AND event_id % 13 <> 0
  UNION ALL
  SELECT 'insert', event_id, event_type FROM base WHERE event_id % 13 = 0
  UNION ALL
  SELECT 'insert', event_id + 100000000, 'merged' FROM base
  WHERE event_id % 11 = 0
  UNION ALL
  SELECT 'insert', event_id + 200000000, 'merged2' FROM base
  WHERE event_id % 17 = 0
)
SELECT _change_type, event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids
FROM changes GROUP BY 1, 2
"""

# E450 — OPTIMIZE executor: pre- and post-rewrite states must agree.
QUERIES["optimize_table_report"] = _layout.optimize_table_report
ORACLES["optimize_table_report"] = """
WITH agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM events WHERE value > 1.0 GROUP BY 1
)
SELECT s.stage, a.event_type, a.n_rows, a.sum_cents
FROM (VALUES ('pre'), ('post')) s(stage) CROSS JOIN agg a
"""

# E451 — schema evolution on snapshot append (mergeSchema semantics).
QUERIES["schema_evolution_report"] = _layout.schema_evolution_report
ORACLES["schema_evolution_report"] = """
SELECT event_type, CAST(NULL AS VARCHAR) AS channel,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events GROUP BY 1
UNION ALL
SELECT 'evolved' AS event_type,
       CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'web' WHEN 1 THEN 'app'
            ELSE 'api' END AS channel,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
"""

# E452 — CDC apply / replication: feed(v0→v2) applied to a v0 clone
# must reproduce the source's post-merge state exactly.
QUERIES["cdc_replication_report"] = _layout.cdc_replication_report
ORACLES["cdc_replication_report"] = """
WITH base AS (SELECT event_id, event_type, value FROM events),
final AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 13 = 0 THEN value + 7.0
              WHEN event_id % 7 = 0 THEN value + 100.0
              ELSE value END AS value
  FROM base
  UNION ALL
  SELECT event_id + 100000000, 'merged', value + 1000.0
  FROM base WHERE event_id % 11 = 0
  UNION ALL
  SELECT event_id + 200000000, 'merged2', value
  FROM base WHERE event_id % 17 = 0
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids
FROM final GROUP BY event_type
"""

# E453 — streaming MERGE sink: per-micro-batch upsert into the
# snapshot store; final state invariant to the batch split.
from parquet_to_csv_spark.streaming import stream as _stream_mod  # noqa: E402

QUERIES["streaming_merge_sink_drain"] = _stream_mod.streaming_merge_sink_drain
ORACLES["streaming_merge_sink_drain"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids
FROM events GROUP BY event_type
"""

# E454 — stats-pruned snapshot scan: band predicate over the clustered
# table; a wrongly-skipped file loses rows.
QUERIES["pruned_snapshot_scan"] = _layout.pruned_snapshot_scan
ORACLES["pruned_snapshot_scan"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events WHERE value > 0.5 AND value >= 2.0 AND value <= 4.0
GROUP BY event_type
"""

# E455 — clustered OPTIMIZE preserves content across the rewrite.
QUERIES["clustered_optimize_report"] = _layout.clustered_optimize_report
ORACLES["clustered_optimize_report"] = """
WITH agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM events WHERE value > 0.5 GROUP BY 1
)
SELECT s.stage, a.event_type, a.n_rows, a.sum_cents
FROM (VALUES ('pre'), ('post')) s(stage) CROSS JOIN agg a
"""


# ---------------------------------------------------------------------------
# Round 7 analytics batch (E456-E459).
# ---------------------------------------------------------------------------

# E456 — Cohen's kappa inter-annotator agreement per source; counts are
# exact longs, kappa/po/pe emitted as floor-ppm integers.
QUERIES["cohen_kappa_report"] = mlmetrics.cohen_kappa_report
ORACLES["cohen_kappa_report"] = f"""
WITH lab AS (
  SELECT source, (length(text) > 400) AS a, (len({_TOKS}) > 80) AS b
  FROM documents
), g AS (
  SELECT source, count(*) AS n,
         count(*) FILTER (a AND b) AS n11,
         count(*) FILTER (a AND NOT b) AS n10,
         count(*) FILTER (NOT a AND b) AS n01,
         count(*) FILTER (NOT a AND NOT b) AS n00
  FROM lab GROUP BY 1
), p AS (
  SELECT source, n, n11,
         (n11 + n00) / CAST(n AS DOUBLE) AS po,
         ((n11 + n10) / CAST(n AS DOUBLE)) * ((n11 + n01) / CAST(n AS DOUBLE))
         + (1.0 - (n11 + n10) / CAST(n AS DOUBLE))
           * (1.0 - (n11 + n01) / CAST(n AS DOUBLE)) AS pe
  FROM g
)
SELECT source, CAST(n AS BIGINT) AS n_docs, CAST(n11 AS BIGINT) AS n_both,
       CAST(floor(po * 1000000.0 + 0.5) AS BIGINT) AS po_ppm,
       CAST(floor(pe * 1000000.0 + 0.5) AS BIGINT) AS pe_ppm,
       CASE WHEN pe < 1.0 THEN
         CAST(floor((po - pe) / (1.0 - pe) * 1000000.0 + 0.5) AS BIGINT)
       END AS kappa_ppm
FROM p
"""

# E457 — Jensen-Shannon divergence between source unigram
# distributions; per-term µnats from exact long rationals, exact sums.
QUERIES["js_source_divergence"] = text.js_source_divergence
ORACLES["js_source_divergence"] = f"""
WITH cnt AS MATERIALIZED (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source, unnest({_TOKS}) AS token FROM documents)
  GROUP BY 1, 2
), tot AS (
  SELECT source, sum(c) AS n FROM cnt GROUP BY 1
), pairs AS (
  SELECT a.source AS s1, b.source AS s2, a.n AS na, b.n AS nb
  FROM tot a JOIN tot b ON a.source < b.source
), vocab AS (
  SELECT DISTINCT s1, s2, na, nb, token FROM (
    SELECT p.s1, p.s2, p.na, p.nb, c.token
    FROM pairs p JOIN cnt c ON c.source = p.s1
    UNION ALL
    SELECT p.s1, p.s2, p.na, p.nb, c.token
    FROM pairs p JOIN cnt c ON c.source = p.s2
  )
), j AS (
  SELECT v.s1, v.s2, v.na, v.nb,
         coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
  FROM vocab v
  LEFT JOIN cnt ca ON ca.source = v.s1 AND ca.token = v.token
  LEFT JOIN cnt cb ON cb.source = v.s2 AND cb.token = v.token
), u AS (
  SELECT s1, s2, na, nb, ca, cb,
    CASE WHEN ca > 0 THEN CAST(round(
      ln(2.0 * ca * nb / (ca * nb + cb * na)) * 1000000.0) AS BIGINT)
    ELSE 0 END AS ua,
    CASE WHEN cb > 0 THEN CAST(round(
      ln(2.0 * cb * na / (ca * nb + cb * na)) * 1000000.0) AS BIGINT)
    ELSE 0 END AS ub
  FROM j
)
SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_union_vocab,
       CAST(na AS BIGINT) AS n_tokens_a, CAST(nb AS BIGINT) AS n_tokens_b,
       CAST(floor(0.5 * (sum(ca * ua) / CAST(na AS DOUBLE)
                         + sum(cb * ub) / CAST(nb AS DOUBLE)) + 0.5)
            AS BIGINT) AS js_micro_nats
FROM u GROUP BY s1, s2, na, nb
"""

# E458 — Rocchio PRF: seed BM25 -> expansion mining -> weighted
# rescore; every stage in integer µ-units, every top-N (units DESC,
# key ASC).
QUERIES["rocchio_prf_topk"] = text.rocchio_prf_topk
ORACLES["rocchio_prf_topk"] = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), stats AS MATERIALIZED (
  SELECT doc_id, len(toks) AS dl, toks FROM toks
), n AS MATERIALIZED (
  SELECT count(*) AS n_docs, sum(len(toks)) AS sum_dl FROM toks
), tf1 AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM (
    SELECT doc_id, dl,
           unnest(list_filter(toks, t -> t IN ('vector', 'hash', 'scan'))) AS term
    FROM stats
  ) GROUP BY 1, 2, 3
), df1 AS (
  SELECT term, count(*) AS df_docs FROM tf1 GROUP BY 1
), seed AS MATERIALIZED (
  SELECT doc_id FROM (
    SELECT tf1.doc_id, sum(CAST(round(
      ln(1.0 + (n.n_docs - df1.df_docs + 0.5) / (df1.df_docs + 0.5))
      * (tf1.tf * 2.2 / (tf1.tf + 1.2 * (0.25 + 0.75 * (tf1.dl * n.n_docs) / n.sum_dl)))
      * 1000000.0) AS BIGINT)) AS su
    FROM tf1 JOIN df1 USING (term) CROSS JOIN n GROUP BY 1
  ) ORDER BY su DESC, doc_id ASC LIMIT 5
), fb_cnt AS MATERIALIZED (
  SELECT t, count(*) AS c_fb FROM (
    SELECT unnest(toks) AS t FROM stats JOIN seed USING (doc_id)
  ) WHERE length(t) >= 4 AND t NOT IN ('vector', 'hash', 'scan')
  GROUP BY 1
), cand_df AS (
  SELECT t, count(*) AS df_docs FROM (
    SELECT unnest(list_distinct(toks)) AS t FROM stats
  ) WHERE t IN (SELECT t FROM fb_cnt) GROUP BY 1
), expansion AS (
  SELECT term, CAST(1 AS BIGINT) AS qw FROM (
    SELECT fb.t AS term,
           fb.c_fb * CAST(round(
             ln(1.0 + (n.n_docs - cd.df_docs + 0.5) / (cd.df_docs + 0.5))
             * 1000000.0) AS BIGINT) AS w
    FROM fb_cnt fb JOIN cand_df cd ON fb.t = cd.t CROSS JOIN n
  ) ORDER BY w DESC, term ASC LIMIT 5
), qterms AS MATERIALIZED (
  SELECT term, CAST(qw AS BIGINT) AS qw
  FROM (VALUES ('vector', 2), ('hash', 2), ('scan', 2)) q(term, qw)
  UNION ALL SELECT term, qw FROM expansion
), tf2 AS (
  SELECT doc_id, dl, term, qw, count(*) AS tf FROM (
    SELECT s.doc_id, s.dl, unnest(s.toks) AS term FROM stats s
  ) x JOIN qterms USING (term) GROUP BY 1, 2, 3, 4
), df2 AS (
  SELECT term, count(*) AS df_docs FROM tf2 GROUP BY 1
)
SELECT doc_id, count(*) AS n_matched, CAST(sum(u) AS BIGINT) AS score_units
FROM (
  SELECT tf2.doc_id, tf2.qw * CAST(round(
    ln(1.0 + (n.n_docs - df2.df_docs + 0.5) / (df2.df_docs + 0.5))
    * (tf2.tf * 2.2 / (tf2.tf + 1.2 * (0.25 + 0.75 * (tf2.dl * n.n_docs) / n.sum_dl)))
    * 1000000.0) AS BIGINT) AS u
  FROM tf2 JOIN df2 USING (term) CROSS JOIN n
) GROUP BY doc_id
ORDER BY score_units DESC, doc_id ASC
LIMIT 10
"""

# E459 — TextRank keywords: integer-ppb PageRank over the adjacent-
# token co-occurrence graph, iterations unrolled as CTE levels.
QUERIES["textrank_keywords"] = text.textrank_keywords
ORACLES["textrank_keywords"] = f"""
WITH toks AS MATERIALIZED (
  SELECT {_TOKS} AS w FROM documents
), freq AS (
  SELECT t FROM (SELECT unnest(w) AS t FROM toks)
  GROUP BY 1 HAVING count(*) >= 50
), adj AS (
  SELECT p[1] AS u, p[2] AS v
  FROM (SELECT unnest(list_zip(w[:-1], w[2:])) AS p FROM toks)
  WHERE p[2] IS NOT NULL AND p[1] <> p[2]
), und AS (
  SELECT a.u, a.v FROM adj a
  WHERE a.u IN (SELECT t FROM freq) AND a.v IN (SELECT t FROM freq)
), edges AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM und
  UNION
  SELECT v AS src, u AS dst FROM und
), nodes AS MATERIALIZED (
  SELECT src AS t, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src
), pr0 AS (
  SELECT t, deg, 1000000000::BIGINT AS pr FROM nodes
), c1 AS (
  SELECT e.dst, CAST(sum(p.pr // p.deg) AS BIGINT) AS inc
  FROM pr0 p JOIN edges e ON p.t = e.src GROUP BY e.dst
), pr1 AS MATERIALIZED (
  SELECT n.t, n.deg,
         CAST(150000000 + (85 * coalesce(c1.inc, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN c1 ON n.t = c1.dst
), c2 AS (
  SELECT e.dst, CAST(sum(p.pr // p.deg) AS BIGINT) AS inc
  FROM pr1 p JOIN edges e ON p.t = e.src GROUP BY e.dst
), pr2 AS (
  SELECT n.t, n.deg,
         CAST(150000000 + (85 * coalesce(c2.inc, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN c2 ON n.t = c2.dst
)
SELECT t AS token, deg, pr AS pr_ppb FROM pr2
ORDER BY pr_ppb DESC, token ASC
LIMIT 25
"""

# E460 — Good-Turing unseen-mass estimate per source.
QUERIES["good_turing_estimate"] = text.good_turing_estimate
ORACLES["good_turing_estimate"] = f"""
WITH tf AS (
  SELECT source, t, count(*) AS r
  FROM (SELECT source, unnest({_TOKS}) AS t FROM documents) GROUP BY 1, 2
), fof AS (
  SELECT source, CAST(sum(r) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab,
         CAST(count(*) FILTER (r = 1) AS BIGINT) AS n1,
         CAST(count(*) FILTER (r = 2) AS BIGINT) AS n2
  FROM tf GROUP BY 1
)
SELECT source, n_tokens, vocab, n1, n2,
       CAST(floor(n1 / CAST(n_tokens AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS p0_ppm,
       CASE WHEN n1 > 0 THEN
         CAST(floor(2.0 * n2 / n1 * 1000000.0 + 0.5) AS BIGINT)
       END AS r1_star_ppm
FROM fof
"""

# E461+E462 — RESTORE + DESCRIBE HISTORY over the lifecycle table.
QUERIES["table_history_report"] = _layout.table_history_report
ORACLES["table_history_report"] = """
WITH n AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
         CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS errs,
         CAST(count(*) FILTER (event_type = 'error' AND value > 2.0)
              AS BIGINT) AS errs_hi
  FROM events
)
SELECT 0 AS version, 'append' AS mode, total AS n_live_rows,
       -1 AS restored_from FROM n
UNION ALL
SELECT 1, 'delete', total - errs, -1 FROM n
UNION ALL
SELECT 2, 'append', total - errs + errs_hi, -1 FROM n
UNION ALL
SELECT 3, 'restore', total, 0 FROM n
"""

# E464 — CHECK constraint validation report over the events batch.
QUERIES["constraint_validation_report"] = _layout.constraint_validation_report
ORACLES["constraint_validation_report"] = """
WITH n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) FILTER (NOT (event_id >= 0)) AS BIGINT) AS v_id,
         CAST(count(*) FILTER (NOT (event_type <> 'error')) AS BIGINT)
           AS v_err,
         CAST(count(*) FILTER (NOT (value > 1.0)) AS BIGINT) AS v_val
  FROM events
)
SELECT 'id_nonneg' AS constraint_name, v_id AS n_violations, n_rows,
       (v_id = 0) AS passes FROM n
UNION ALL
SELECT 'no_errors', v_err, n_rows, (v_err = 0) FROM n
UNION ALL
SELECT 'value_floor', v_val, n_rows, (v_val = 0) FROM n
"""

# E463 — RocksDB state-store provider: state read back through the
# statestore source equals the batch aggregate.
QUERIES["rocksdb_state_drain"] = _stream_mod.rocksdb_state_drain
ORACLES["rocksdb_state_drain"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
"""

# E465 — incremental (batched) OPTIMIZE: one bounded rewrite batch,
# content exactly preserved, vector applied to the rewritten subset.
QUERIES["incremental_optimize_report"] = _layout.incremental_optimize_report
ORACLES["incremental_optimize_report"] = """
WITH agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM events WHERE value > 1.5 GROUP BY 1
)
SELECT s.stage, a.event_type, a.n_rows, a.sum_cents
FROM (VALUES ('pre'), ('post')) s(stage) CROSS JOIN agg a
"""

# E466 — class-balanced effective sample sizes + loss weights.
QUERIES["class_balance_weights"] = mlmetrics.class_balance_weights
ORACLES["class_balance_weights"] = """
WITH g AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY 1
), s AS (
  SELECT label, n,
         CAST(floor((1.0 - exp(n * ln(0.999)))
              / (CAST(1 AS DOUBLE) - CAST(0.999 AS DOUBLE)) * 1000000.0 + 0.5)
              AS BIGINT) AS eff_n_micro,
         CAST(floor(1000000.0 / ((1.0 - exp(n * ln(0.999)))
              / (CAST(1 AS DOUBLE) - CAST(0.999 AS DOUBLE))) + 0.5)
              AS BIGINT) AS inv_u
  FROM g
), t AS (
  SELECT sum(inv_u) AS sum_inv, CAST(count(*) AS BIGINT) AS n_labels FROM s
)
SELECT label, n, eff_n_micro,
       CAST(floor(inv_u * n_labels / CAST(sum_inv AS DOUBLE) * 1000000.0
                  + 0.5) AS BIGINT) AS weight_ppm
FROM s CROSS JOIN t
"""

# E467 — Simpson lexical concentration per source.
QUERIES["token_simpson_diversity"] = text.token_simpson_diversity
ORACLES["token_simpson_diversity"] = f"""
WITH tf AS (
  SELECT source, t, CAST(count(*) AS BIGINT) AS r
  FROM (SELECT source, unnest({_TOKS}) AS t FROM documents) GROUP BY 1, 2
), g AS (
  SELECT source, CAST(sum(r) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(r * (r - 1)) AS BIGINT) AS num
  FROM tf GROUP BY 1
)
SELECT source, n_tokens, vocab,
       CAST(floor(num / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS simpson_ppm,
       CAST(floor(CAST(n_tokens * (n_tokens - 1) AS DOUBLE) / num
                  * 1000.0 + 0.5) AS BIGINT) AS inv_simpson_milli
FROM g
"""

# E470 — interpolated Kneser-Ney bigram LM scored on the 10% heldout.
QUERIES["kneser_ney_bigram_score"] = corpus.kneser_ney_bigram_score
ORACLES["kneser_ney_bigram_score"] = f"""
WITH toks AS MATERIALIZED (
  SELECT lang, doc_id, {_TOKS} AS w, (doc_id % 10 = 0) AS is_heldout
  FROM documents
), big AS MATERIALIZED (
  SELECT lang, is_heldout, p[1] AS w1, p[2] AS w2
  FROM (
    SELECT lang, is_heldout,
           unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS p
    FROM toks
  )
), c12 AS MATERIALIZED (
  SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c12
  FROM big WHERE NOT is_heldout GROUP BY 1, 2, 3
), c1 AS (
  SELECT lang, w1, CAST(sum(c12) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n_follow
  FROM c12 GROUP BY 1, 2
), cont AS (
  SELECT lang, w2, CAST(count(*) AS BIGINT) AS n_precede
  FROM c12 GROUP BY 1, 2
), types AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_types FROM c12 GROUP BY 1
), held AS (
  SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS n_obs
  FROM big WHERE is_heldout GROUP BY 1, 2, 3
), j AS (
  SELECT h.lang, h.n_obs,
         coalesce(c12.c12, 0) AS c12, coalesce(c1.c1, 0) AS c1,
         coalesce(c1.n_follow, 0) AS n_follow,
         coalesce(cont.n_precede, 0) AS n_precede, t.n_types
  FROM held h
  LEFT JOIN c12 ON c12.lang = h.lang AND c12.w1 = h.w1 AND c12.w2 = h.w2
  LEFT JOIN c1 ON c1.lang = h.lang AND c1.w1 = h.w1
  LEFT JOIN cont ON cont.lang = h.lang AND cont.w2 = h.w2
  JOIN types t ON t.lang = h.lang
), scored AS (
  SELECT lang, n_obs,
    CASE WHEN p > 0.0 THEN CAST(round(ln(p) * 1000000.0) AS BIGINT) END AS u
  FROM (
    SELECT lang, n_obs,
      CASE WHEN c1 > 0 THEN
        greatest(c12 - 0.75, 0.0) / c1
        + 0.75 * n_follow / c1 * (n_precede / CAST(n_types AS DOUBLE))
      ELSE n_precede / CAST(n_types AS DOUBLE) END AS p
    FROM j
  )
)
SELECT lang,
       CAST(sum(CASE WHEN u IS NOT NULL THEN n_obs ELSE 0 END) AS BIGINT)
         AS n_scored,
       CAST(sum(CASE WHEN u IS NULL THEN n_obs ELSE 0 END) AS BIGINT)
         AS n_unseen,
       CAST(floor(sum(n_obs * coalesce(u, 0))
                  / CAST(sum(CASE WHEN u IS NOT NULL THEN n_obs ELSE 0 END)
                         AS DOUBLE) + 0.5) AS BIGINT) AS avg_logprob_unats
FROM scored GROUP BY lang
"""

# E471 — Qini uplift curve over the parity treatment split.
QUERIES["qini_uplift_curve"] = mlmetrics.qini_uplift_curve
ORACLES["qini_uplift_curve"] = """
WITH per AS (
  SELECT user_id,
         CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS score,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS converted,
         CAST(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS treated
  FROM events GROUP BY user_id
), tiled AS (
  SELECT *, ntile(10) OVER (ORDER BY -score ASC, user_id ASC) AS decile
  FROM per
), g AS (
  SELECT decile,
         sum(treated) AS n_treat, sum(1 - treated) AS n_ctrl,
         sum(treated * converted) AS conv_treat,
         sum((1 - treated) * converted) AS conv_ctrl
  FROM tiled GROUP BY decile
), cum AS (
  SELECT decile,
         sum(n_treat) OVER w AS ct_n, sum(n_ctrl) OVER w AS cc_n,
         sum(conv_treat) OVER w AS ct_conv, sum(conv_ctrl) OVER w AS cc_conv
  FROM g WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
)
SELECT CAST(decile AS INTEGER) AS decile, CAST(ct_n AS BIGINT) AS cum_treated,
       CAST(cc_n AS BIGINT) AS cum_control,
       CAST(ct_conv AS BIGINT) AS cum_treated_conv,
       CAST(cc_conv AS BIGINT) AS cum_control_conv,
       CAST(floor((ct_conv - cc_conv * (ct_n / CAST(cc_n AS DOUBLE)))
                  * 1000.0 + 0.5) AS BIGINT) AS qini_milli
FROM cum
"""

# E472 — difference-in-differences over (parity treatment × cutover).
QUERIES["did_estimate"] = mlmetrics.did_estimate
ORACLES["did_estimate"] = """
WITH cells AS (
  SELECT (user_id % 2 = 0) AS treated,
         (epoch_us(ts) // 1000 >= 1705276800000) AS post,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2
), flat AS (
  SELECT
    sum(CASE WHEN treated AND post THEN cents END) AS tp_c,
    sum(CASE WHEN treated AND post THEN n END) AS tp_n,
    sum(CASE WHEN treated AND NOT post THEN cents END) AS tq_c,
    sum(CASE WHEN treated AND NOT post THEN n END) AS tq_n,
    sum(CASE WHEN NOT treated AND post THEN cents END) AS cp_c,
    sum(CASE WHEN NOT treated AND post THEN n END) AS cp_n,
    sum(CASE WHEN NOT treated AND NOT post THEN cents END) AS cq_c,
    sum(CASE WHEN NOT treated AND NOT post THEN n END) AS cq_n
  FROM cells
)
SELECT CAST(tp_n AS BIGINT) AS n_treated_post,
       CAST(tq_n AS BIGINT) AS n_treated_pre,
       CAST(cp_n AS BIGINT) AS n_control_post,
       CAST(cq_n AS BIGINT) AS n_control_pre,
       CAST(floor((tp_c / CAST(tp_n AS DOUBLE)) * 10.0 + 0.5) AS BIGINT)
         AS treated_post_mean_milli,
       CAST(floor(((tp_c / CAST(tp_n AS DOUBLE) - tq_c / CAST(tq_n AS DOUBLE))
                   - (cp_c / CAST(cp_n AS DOUBLE) - cq_c / CAST(cq_n AS DOUBLE)))
                  * 10.0 + 0.5) AS BIGINT) AS did_milli
FROM flat
"""

# E473 — sample-ratio-mismatch check over the parity split.
QUERIES["srm_check"] = mlmetrics.srm_check
ORACLES["srm_check"] = """
WITH u AS (
  SELECT DISTINCT user_id, (user_id % 2 = 0) AS treated FROM events
), g AS (
  SELECT CAST(count(*) FILTER (treated) AS BIGINT) AS n_treated,
         CAST(count(*) FILTER (NOT treated) AS BIGINT) AS n_control
  FROM u
)
SELECT n_treated, n_control,
       CAST(floor((n_treated - n_control) * (n_treated - n_control)
                  / CAST(n_treated + n_control AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS chi2_micro,
       ((n_treated - n_control) * (n_treated - n_control)
        / CAST(n_treated + n_control AS DOUBLE) > 3.841459) AS srm_flag
FROM g
"""

# E474 — CUPED variance-reduced treatment effect.
QUERIES["cuped_adjusted_effect"] = mlmetrics.cuped_adjusted_effect
ORACLES["cuped_adjusted_effect"] = """
WITH per AS (
  SELECT user_id, (user_id % 2 = 0) AS treated,
         CAST(sum(CASE WHEN epoch_us(ts) // 1000 < 1705276800000
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN epoch_us(ts) // 1000 >= 1705276800000
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(CASE WHEN treated THEN y END) AS BIGINT) AS syt,
         CAST(count(*) FILTER (treated) AS BIGINT) AS nt,
         CAST(sum(CASE WHEN NOT treated THEN y END) AS BIGINT) AS syc,
         CAST(count(*) FILTER (NOT treated) AS BIGINT) AS nc,
         CAST(sum(CASE WHEN treated THEN x END) AS BIGINT) AS sxt,
         CAST(sum(CASE WHEN NOT treated THEN x END) AS BIGINT) AS sxc
  FROM per
), e AS (
  SELECT nt, nc,
    ((sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
      / ((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS theta,
    (syt / CAST(nt AS DOUBLE) - syc / CAST(nc AS DOUBLE)) AS raw,
    (sxt / CAST(nt AS DOUBLE) - sxc / CAST(nc AS DOUBLE)) AS xdiff,
    ((sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
      * ((sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
      / (((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
         * ((syy - sy * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
      AS rho2
  FROM g
)
SELECT nt AS n_treated, nc AS n_control,
       CAST(floor(theta * 1000000.0 + 0.5) AS BIGINT) AS theta_micro,
       CAST(floor(raw * 10.0 + 0.5) AS BIGINT) AS raw_effect_milli,
       CAST(floor((raw - theta * xdiff) * 10.0 + 0.5) AS BIGINT)
         AS cuped_effect_milli,
       CAST(floor(rho2 * 1000000.0 + 0.5) AS BIGINT)
         AS variance_reduction_ppm
FROM e
"""

# E475 — power / minimum-detectable-effect calculator.
QUERIES["experiment_power_mde"] = mlmetrics.experiment_power_mde
ORACLES["experiment_power_mde"] = """
WITH per AS (
  SELECT user_id, (user_id % 2 = 0) AS treated,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE epoch_us(ts) // 1000 >= 1705276800000
  GROUP BY 1, 2
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(count(*) FILTER (treated) AS BIGINT) AS nt,
         CAST(count(*) FILTER (NOT treated) AS BIGINT) AS nc,
         CAST(sum(CASE WHEN NOT treated THEN y END) AS BIGINT) AS syc
  FROM per
), e AS (
  SELECT nt, nc, syc,
    (syy - sy * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var
  FROM g
)
SELECT nt AS n_treated, nc AS n_control,
       CAST(floor(var * 10.0 + 0.5) AS BIGINT) AS variance_deci_cents2,
       CAST(floor((CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
                  * sqrt(var / nt + var / nc) * 10.0 + 0.5) AS BIGINT)
         AS mde_milli,
       CAST(floor((CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
                  * sqrt(var / nt + var / nc)
                  / (syc / CAST(nc AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         AS mde_relative_ppm
FROM e
"""

# E476 — Kendall tau-b between daily click and purchase volumes.
QUERIES["kendall_tau_daily"] = mlmetrics.kendall_tau_daily
ORACLES["kendall_tau_daily"] = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS a,
         CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS b
  FROM events GROUP BY 1
), pairs AS (
  SELECT sign(r.a - l.a) AS sa, sign(r.b - l.b) AS sb
  FROM daily l JOIN daily r ON l.day < r.day
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n0,
         CAST(count(*) FILTER (sa * sb > 0) AS BIGINT) AS concordant,
         CAST(count(*) FILTER (sa * sb < 0) AS BIGINT) AS discordant,
         CAST(count(*) FILTER (sa = 0) AS BIGINT) AS ties_a,
         CAST(count(*) FILTER (sb = 0) AS BIGINT) AS ties_b
  FROM pairs
)
SELECT n0, concordant, discordant, ties_a, ties_b,
       CAST(floor((concordant - discordant)
                  / sqrt(CAST(n0 - ties_a AS DOUBLE)
                         * CAST(n0 - ties_b AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS tau_b_ppm
FROM g
"""

# E477 — exact Shapley channel attribution (integer x24 credits).
QUERIES["shapley_attribution"] = timeops.shapley_attribution
ORACLES["shapley_attribution"] = """
WITH per_user AS MATERIALIZED (
  SELECT user_id,
         bit_or(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                WHEN 'signup' THEN 4 WHEN 'error' THEN 8 ELSE 0 END)
           AS mask,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY 1
), by_mask AS (
  SELECT mask, CAST(count(*) AS BIGINT) AS n_conv FROM per_user
  WHERE converted = 1 GROUP BY 1
), coal AS (
  SELECT CAST(i AS INTEGER) AS s FROM range(0, 16) t(i)
), v AS MATERIALIZED (
  SELECT c.s, CAST(coalesce(sum(b.n_conv), 0) AS BIGINT) AS v
  FROM coal c LEFT JOIN by_mask b ON (b.mask & (15 - c.s)) = 0
  GROUP BY c.s
), channels AS (
  SELECT * FROM (VALUES (1, 'view'), (2, 'click'), (4, 'signup'),
                        (8, 'error')) ch(bit, channel)
), pairs AS (
  SELECT ch.channel, ch.bit, c.s,
    CAST(CASE ((c.s & 1) + ((c.s // 2) & 1) + ((c.s // 4) & 1)
               + ((c.s // 8) & 1))
      WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END AS BIGINT) AS w
  FROM channels ch JOIN coal c ON (c.s & ch.bit) = 0
)
SELECT p.channel,
       CAST(sum(p.w * (v1.v - v0.v)) AS BIGINT) AS shapley_conv_x24,
       CAST(max(t.v) AS BIGINT) AS n_conv_covered
FROM pairs p
JOIN v v0 ON v0.s = p.s
JOIN v v1 ON v1.s = (p.s | p.bit)
CROSS JOIN (SELECT v FROM v WHERE s = 15) t
GROUP BY p.channel
"""

# E478 — Croston intermittent-demand forecast; the oracle replays the
# identical float64 fold with a recursive CTE over the same sequence.
QUERIES["croston_forecast"] = pandas_ops.croston_forecast
ORACLES["croston_forecast"] = """
WITH RECURSIVE d AS MATERIALIZED (
  SELECT l_partkey AS part,
         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem WHERE l_partkey % 97 = 0 GROUP BY 1, 2
), rk AS MATERIALIZED (
  SELECT part, day, q,
         row_number() OVER (PARTITION BY part ORDER BY day) AS i
  FROM d
), steps AS (
  SELECT part, i, day, CAST(q AS DOUBLE) AS z, CAST(1 AS DOUBLE) AS p
  FROM rk WHERE i = 1
  UNION ALL
  SELECT r.part, r.i, r.day,
         CAST(0.1 AS DOUBLE) * r.q
           + (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * s.z,
         CAST(0.1 AS DOUBLE) * (r.day - s.day)
           + (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * s.p
  FROM steps s JOIN rk r ON r.part = s.part AND r.i = s.i + 1
), final AS (
  SELECT s.part, s.z, s.p FROM steps s
  JOIN (SELECT part, max(i) AS mi FROM steps GROUP BY 1) m
    ON s.part = m.part AND s.i = m.mi
)
SELECT f.part, t.n AS n_demands, t.tq AS total_qty,
       round(f.z, 6) AS z_smoothed,
       round(f.p, 6) AS interval_smoothed,
       round(f.z / f.p, 6) AS demand_rate
FROM final f JOIN (
  SELECT part, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS tq
  FROM d GROUP BY 1
) t USING (part)
"""

# --------------------------------------------------------------------------
# E479–E483 — KMV theta sketch, Nelson–Aalen, l-diversity, MAP, HITS
# --------------------------------------------------------------------------
from parquet_to_csv_spark.operators import sketch as _sketch  # noqa: E402
from parquet_to_csv_spark.operators.sketch import duck_md5_hash48  # noqa: E402

# E479 — KMV/theta distinct sketch: per-type estimates + one theta-
# algebra intersection row; the oracle replays the identical 48-bit
# hash order statistics.
QUERIES["kmv_distinct_estimate"] = _sketch.kmv_distinct_estimate
_H48 = duck_md5_hash48("user_id")
ORACLES["kmv_distinct_estimate"] = f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT event_type, user_id FROM events
), hashed AS (
  SELECT event_type AS scope, {_H48} AS h FROM pairs
), ranked AS (
  SELECT scope, h,
         row_number() OVER (PARTITION BY scope ORDER BY h ASC) AS rn
  FROM hashed
), kset AS MATERIALIZED (
  SELECT scope, h FROM ranked WHERE rn <= 64
), stats AS MATERIALIZED (
  SELECT scope, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth
  FROM kset GROUP BY scope
), truth AS (
  SELECT event_type AS scope,
         CAST(count(DISTINCT user_id) AS BIGINT) AS true_distinct
  FROM pairs GROUP BY event_type
), per_type AS (
  SELECT s.scope, s.n_kept,
         CASE WHEN s.n_kept < 64 THEN t.true_distinct
              ELSE CAST((63 * 281474976710656) // s.kth AS BIGINT) END
           AS est_distinct,
         t.true_distinct
  FROM stats s JOIN truth t USING (scope)
), cutrel AS (
  SELECT least(
    (SELECT CASE WHEN n_kept < 64 THEN 281474976710656 ELSE kth END
     FROM stats WHERE scope = 'view'),
    (SELECT CASE WHEN n_kept < 64 THEN 281474976710656 ELSE kth END
     FROM stats WHERE scope = 'click')) AS cut
), common AS (
  SELECT r.cut, CAST(count(*) AS BIGINT) AS n_kept
  FROM kset a JOIN kset b ON a.h = b.h
  CROSS JOIN cutrel r
  WHERE a.scope = 'view' AND b.scope = 'click' AND a.h < r.cut
  GROUP BY r.cut
), both_true AS (
  SELECT CAST(count(*) AS BIGINT) AS true_distinct
  FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'view') v
  JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') c
    USING (user_id)
), inter AS (
  SELECT 'view&click' AS scope, g.n_kept,
         CASE WHEN g.cut = 281474976710656 THEN g.n_kept
              ELSE CAST(g.n_kept * 281474976710656 // g.cut AS BIGINT) END
           AS est_distinct,
         bt.true_distinct
  FROM common g CROSS JOIN both_true bt
), unioned AS (
  SELECT * FROM per_type UNION ALL SELECT * FROM inter
)
SELECT scope, n_kept, est_distinct, true_distinct,
       CAST(abs(est_distinct - true_distinct) * 1000000 // true_distinct
            AS BIGINT) AS abs_err_ppm
FROM unioned
"""

# E480 — Nelson–Aalen cumulative hazard (signup→purchase), beside the
# −ln Kaplan–Meier steps in the same micro-units.
QUERIES["nelson_aalen_hazard"] = timeops.nelson_aalen_hazard
ORACLES["nelson_aalen_hazard"] = """
WITH signups AS (
  SELECT user_id, min(epoch_us(ts)) AS s_us FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), fb AS (
  SELECT v.user_id, v.s_us, min(epoch_us(b.ts)) AS p_us
  FROM signups v LEFT JOIN events b
    ON b.user_id = v.user_id AND b.event_type = 'purchase'
   AND epoch_us(b.ts) >= v.s_us
  GROUP BY v.user_id, v.s_us
), hz AS (
  SELECT max(epoch_us(ts)) AS h_us FROM events
), durs AS (
  SELECT CASE WHEN p_us IS NOT NULL THEN (p_us - s_us) // 86400000000
              ELSE (h_us - s_us) // 86400000000 END AS dur,
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
         CAST(floor(CAST(d AS DOUBLE) / n_risk * 1000000 + 0.5) AS BIGINT)
           AS na_step_micro,
         CAST(round(-ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                    * 1000000) AS BIGINT) AS km_step_micro
  FROM at_risk WHERE d > 0 AND n_risk > d
)
SELECT dur AS duration_days, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       CAST(sum(na_step_micro) OVER (ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS na_cum_micro,
       CAST(sum(km_step_micro) OVER (ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS neg_log_km_cum_micro
FROM terms
"""

# E481 — l-diversity audit: sensitive attribute = source, QI =
# (lang, 100-char band); per-value floor-micro entropy terms.
QUERIES["l_diversity_audit"] = corpus.l_diversity_audit
ORACLES["l_diversity_audit"] = """
WITH cells AS (
  SELECT lang, n_chars // 100 AS len_band, source,
         CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2, 3
), tot AS (
  SELECT lang, len_band, CAST(sum(c) AS BIGINT) AS n_docs
  FROM cells GROUP BY 1, 2
), joined AS (
  SELECT cells.lang, cells.len_band, tot.n_docs, cells.c,
         CAST(floor(CAST(cells.c AS DOUBLE) / tot.n_docs
                    * ln(CAST(tot.n_docs AS DOUBLE) / cells.c)
                    * 1000000 + 0.5) AS BIGINT) AS term
  FROM cells JOIN tot USING (lang, len_band)
)
SELECT lang, len_band, n_docs,
       CAST(count(*) AS BIGINT) AS l_distinct,
       CAST(sum(term) AS BIGINT) AS entropy_micro,
       CAST(max(c) * 1000000 // n_docs AS BIGINT) AS dominant_share_ppm,
       CAST(CASE WHEN count(*) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS l3_ok
FROM joined
GROUP BY lang, len_band, n_docs
"""

# E482 — AP@k against label-match relevance (the MAP leg of the
# NDCG/MRR/AP triad); replays cosine_topk's total order.
QUERIES["map_label_match"] = similarity.map_label_match
ORACLES["map_label_match"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
  FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id AS cand_id, embedding AS c_emb, label AS c_label
  FROM embeddings
), ranked AS (
  SELECT query_id, q_label, c_label,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY {_duck_cos('q_emb', 'c_emb')} DESC, cand_id ASC
         ) AS rnk
  FROM q JOIN c ON query_id <> cand_id
), top AS (
  SELECT query_id, q_label, rnk,
         CASE WHEN q_label = c_label THEN 1 ELSE 0 END AS rel
  FROM ranked WHERE rnk <= 10
), cum AS (
  SELECT query_id, q_label, rnk, rel,
         sum(rel) OVER (PARTITION BY query_id ORDER BY rnk
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_rel
  FROM top
), scored AS (
  SELECT query_id, q_label, rel,
         CAST(floor(CAST(cum_rel AS DOUBLE) / rnk * 1000000 + 0.5) AS BIGINT)
           AS p_at_i_micro
  FROM cum
), per_q AS (
  SELECT query_id, q_label,
         CAST(sum(rel * p_at_i_micro) AS BIGINT) AS ap_sum_micro,
         CAST(sum(rel) AS BIGINT) AS n_rel_at_k
  FROM scored GROUP BY query_id, q_label
), lab AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_label FROM embeddings GROUP BY 1
)
SELECT p.query_id, p.n_rel_at_k,
       least(10, l.n_label - 1) AS r_norm,
       CASE WHEN least(10, l.n_label - 1) > 0
            THEN CAST(p.ap_sum_micro // least(10, l.n_label - 1) AS BIGINT)
       END AS ap_micro
FROM per_q p JOIN lab l ON p.q_label = l.label
"""

# E483 — HITS authorities on the bounded customer↔part co-purchase
# bipartite graph: two exact-integer reinforcement rounds, top-20.
QUERIES["hits_copurchase"] = relational.hits_copurchase
ORACLES["hits_copurchase"] = """
WITH edges AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE l.l_partkey % 7 = 0
), a1 AS (
  SELECT part, CAST(count(*) AS BIGINT) AS a1 FROM edges GROUP BY part
), h1 AS (
  SELECT e.cust, CAST(sum(a.a1) AS BIGINT) AS h1
  FROM edges e JOIN a1 a USING (part) GROUP BY e.cust
), a2 AS (
  SELECT e.part, CAST(sum(h.h1) AS BIGINT) AS auth_score,
         CAST(count(*) AS BIGINT) AS degree
  FROM edges e JOIN h1 h USING (cust) GROUP BY e.part
)
SELECT part, degree, auth_score,
       CAST(row_number() OVER (ORDER BY auth_score DESC, part ASC)
            AS INTEGER) AS rnk
FROM a2
ORDER BY auth_score DESC, part ASC
LIMIT 20
"""

# --------------------------------------------------------------------------
# E484–E486 — sorted-neighborhood blocking, candidate keys, KNN-Shapley
# --------------------------------------------------------------------------

# E484 — SNM blocking + exact Jaccard verification of window candidates.
QUERIES["sorted_neighborhood_pairs"] = dedup.sorted_neighborhood_pairs
ORACLES["sorted_neighborhood_pairs"] = f"""
WITH docs AS MATERIALIZED (
  SELECT doc_id,
         substring(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   1, 24) AS snm_key,
         list_distinct({_TOKS}) AS toks
  FROM documents
), ranked AS MATERIALIZED (
  SELECT doc_id, toks,
         row_number() OVER (ORDER BY snm_key, doc_id) AS rn
  FROM docs
), cands AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, o.off,
         CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS i,
         CAST(len(a.toks) + len(b.toks)
              - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS u
  FROM ranked a
  JOIN (SELECT unnest(range(1, 4)) AS off) o ON TRUE
  JOIN ranked b ON b.rn = a.rn + o.off
)
SELECT doc_a, doc_b, CAST(off AS BIGINT) AS window_offset,
       CAST(i * 1000 // u AS BIGINT) AS jaccard_milli
FROM cands
WHERE u > 0 AND i * 1000 // u >= 500
"""

# E485 — candidate-key discovery: one multi-distinct aggregate pass.
QUERIES["candidate_key_discovery"] = relational.candidate_key_discovery
_CKD_SETS = [
    ("o_orderkey", "count(DISTINCT o_orderkey)"),
    ("o_custkey", "count(DISTINCT o_custkey)"),
    ("o_orderdate", "count(DISTINCT o_orderdate)"),
    ("o_totalprice", "count(DISTINCT o_totalprice)"),
    ("o_custkey,o_orderdate", "count(DISTINCT (o_custkey, o_orderdate))"),
    ("o_custkey,o_totalprice", "count(DISTINCT (o_custkey, o_totalprice))"),
    ("o_orderdate,o_totalprice", "count(DISTINCT (o_orderdate, o_totalprice))"),
]
ORACLES["candidate_key_discovery"] = "WITH wide AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, " + ", ".join(
    f"CAST({expr} AS BIGINT) AS ndv_{i + 1}" for i, (_, expr) in enumerate(_CKD_SETS)
) + " FROM orders)\n" + "\nUNION ALL\n".join(
    f"SELECT '{nm}' AS col_set, n_rows, ndv_{i + 1} AS n_distinct, "
    f"CAST(ndv_{i + 1} * 1000000 // n_rows AS BIGINT) AS unique_ppm, "
    f"CAST(CASE WHEN ndv_{i + 1} = n_rows THEN 1 ELSE 0 END AS BIGINT) AS is_key "
    "FROM wide"
    for i, (nm, _) in enumerate(_CKD_SETS)
)

# E486 — exact KNN-Shapley: the oracle replays the closed-form
# recurrence with lead() + a suffix-sum window over the same total
# order (cosine DESC, cand_id) in the same integer micro-units.
QUERIES["knn_shapley_values"] = similarity.knn_shapley_values
ORACLES["knn_shapley_values"] = f"""
WITH test AS (
  SELECT vec_id AS test_id, embedding AS t_emb, label AS t_label
  FROM embeddings WHERE vec_id < 4
), train AS (
  SELECT vec_id AS cand_id, embedding AS c_emb, label AS c_label
  FROM embeddings WHERE vec_id >= 4
), scored AS (
  SELECT test_id, cand_id,
         -({_duck_cos('t_emb', 'c_emb')}) AS neg_sim,
         CASE WHEN t_label = c_label THEN 1 ELSE 0 END AS m
  FROM test, train
), ranked AS MATERIALIZED (
  SELECT test_id, cand_id, m,
         row_number() OVER (PARTITION BY test_id
                            ORDER BY neg_sim, cand_id) AS rn,
         count(*) OVER (PARTITION BY test_id) AS n_train
  FROM scored
), steps AS (
  SELECT test_id, cand_id, m, rn, n_train,
         lead(m) OVER (PARTITION BY test_id ORDER BY rn) AS m_next
  FROM ranked
), d AS (
  SELECT test_id, cand_id, rn,
         CASE WHEN m_next IS NOT NULL
              THEN (m - m_next) * (1000000 // greatest(rn, 5))
              ELSE m * (1000000 // n_train) END AS d_micro
  FROM steps
), s AS (
  SELECT test_id, cand_id,
         sum(d_micro) OVER (PARTITION BY test_id ORDER BY rn
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS s_micro
  FROM d
), vals AS MATERIALIZED (
  SELECT cand_id, CAST(sum(s_micro) AS BIGINT) AS shap_sum_micro,
         CAST(count(*) AS BIGINT) AS n_tests
  FROM s GROUP BY cand_id
), top AS (
  SELECT 'top' AS side, cand_id, shap_sum_micro, n_tests
  FROM vals ORDER BY shap_sum_micro DESC, cand_id ASC LIMIT 20
), bottom AS (
  SELECT 'bottom' AS side, cand_id, shap_sum_micro, n_tests
  FROM vals ORDER BY shap_sum_micro ASC, cand_id ASC LIMIT 20
)
SELECT * FROM top UNION ALL SELECT * FROM bottom
"""

# --------------------------------------------------------------------------
# E487–E488 — hidden partitioning, NN-Descent graph ANN
# --------------------------------------------------------------------------
from parquet_to_csv_spark.plans.registry_parts.p02 import _duck_srp_bucket  # noqa: E402
from parquet_to_csv_spark.operators.sketch import duck_md5_slice_bucket as _duck_bkt  # noqa: E402

# E487 — hidden partitioning: the scan is served purely by manifest
# pruning (no row filter in the Spark plan); the oracle recomputes the
# same 7-day × bucket window from raw events with the identical
# transform expressions — a wrongly-included OR wrongly-skipped file
# turns the gate red.
QUERIES["hidden_partition_scan"] = _layout.hidden_partition_scan
ORACLES["hidden_partition_scan"] = f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum({duck_units('value', 2)}) AS BIGINT) AS sum_cents
FROM events
WHERE epoch_us(ts) // 86400000000 BETWEEN 19733 AND 19739
  AND {_duck_bkt('user_id', 1, 8)} = 3
GROUP BY event_type
"""

# E488 — NN-Descent: the oracle replays the LSH seeding and both
# expansion rounds step for step (same plane literals, same top-k
# total order).
QUERIES["nndescent_topk"] = similarity.nndescent_topk
_NND_TABS = similarity.srp_planes()[:2]


def _nnd_oracle() -> str:
    cos = _duck_cos("ea.embedding", "eb.embedding")
    parts = [f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
), b AS MATERIALIZED (
  SELECT vec_id,
         {_duck_srp_bucket('embedding', _NND_TABS[0])} AS b0,
         {_duck_srp_bucket('embedding', _NND_TABS[1])} AS b1
  FROM embeddings
), seeds AS (
  SELECT 0 AS t, b0 AS bkt, vec_id FROM b
  UNION ALL
  SELECT 1 AS t, b1 AS bkt, vec_id FROM b
), cand0 AS MATERIALIZED (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM seeds x JOIN seeds y ON x.t = y.t AND x.bkt = y.bkt
  WHERE x.vec_id <> y.vec_id
)"""]
    for r in range(4):
        parts.append(f""", scored{r} AS (
  SELECT p.a, p.b, {cos} AS sim
  FROM cand{r} p
  JOIN emb ea ON ea.vec_id = p.a
  JOIN emb eb ON eb.vec_id = p.b
), knn{r} AS MATERIALIZED (
  SELECT a, b, sim, rn FROM (
    SELECT a, b, sim,
           row_number() OVER (PARTITION BY a ORDER BY sim DESC, b ASC) AS rn
    FROM scored{r}
  ) WHERE rn <= 16
)""")
        if r < 3:
            parts.append(f""", und{r + 1} AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM knn{r}
    UNION ALL
    SELECT b AS a, a AS b FROM knn{r}
  )
), cand{r + 1} AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM und{r + 1}
    UNION ALL
    SELECT x.a, y.b
    FROM und{r + 1} x JOIN und{r + 1} y ON x.b = y.a
    WHERE x.a <> y.b
  )
)""")
    parts.append("""
SELECT a AS query_id, b AS cand_id, round(sim, 6) AS cosine,
       CAST(rn AS INTEGER) AS rnk
FROM knn3 WHERE a < 12 AND rn <= 5
""")
    return "".join(parts)


ORACLES["nndescent_topk"] = _nnd_oracle()

# --------------------------------------------------------------------------
# E489–E491 — DeLong AUC CI, t-closeness, multi-table transactions
# --------------------------------------------------------------------------

# E489 — DeLong variance/CI from exact placement moments at the
# distinct-score grain; auc_ppm must agree with E104.
QUERIES["delong_auc_ci"] = mlmetrics.delong_auc_ci
ORACLES["delong_auc_ci"] = """
WITH by_score AS (
  SELECT n_chars AS score, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p
  FROM documents GROUP BY 1
), g AS (
  SELECT score, n, p, n - p AS gneg FROM by_score
), ranked AS (
  SELECT score, n, p, gneg,
         CAST(coalesce(sum(gneg) OVER (ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS g_lt,
         CAST(coalesce(sum(p) OVER (ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS p_lt
  FROM g
), tot AS (
  SELECT CAST(sum(p) AS BIGINT) AS m, CAST(sum(gneg) AS BIGINT) AS nn,
         CAST(sum(p * (2 * g_lt + gneg)) AS BIGINT) AS s_a,
         CAST(sum(p * (2 * g_lt + gneg) * (2 * g_lt + gneg)) AS BIGINT) AS q_a,
         CAST(sum(gneg * (2 * p_lt + p)) AS BIGINT) AS s_b,
         CAST(sum(gneg * (2 * p_lt + p) * (2 * p_lt + p)) AS BIGINT) AS q_b
  FROM ranked
), v AS (
  SELECT m, nn, s_a,
         CAST(q_a * m - s_a * s_a AS DOUBLE)
           / CAST(m * (m - 1) AS DOUBLE)
           / CAST(2 * nn * 2 * nn AS DOUBLE) / m
         + CAST(q_b * nn - s_b * s_b AS DOUBLE)
           / CAST(nn * (nn - 1) AS DOUBLE)
           / CAST(2 * m * 2 * m AS DOUBLE) / nn AS var_auc,
         CAST(s_a AS DOUBLE) / CAST(2 * m * nn AS DOUBLE) AS auc
  FROM tot
)
SELECT m AS pos_n, nn AS neg_n,
       CAST(s_a * 1000000 // (2 * m * nn) AS BIGINT) AS auc_ppm,
       CAST(floor(var_auc * 1e12 + 0.5) AS BIGINT) AS var_e12,
       CAST(floor(sqrt(var_auc) * 1e6 + 0.5) AS BIGINT) AS se_micro,
       CAST(floor((auc - 1.959964 * sqrt(var_auc)) * 1e6 + 0.5) AS BIGINT)
         AS ci_lo_micro,
       CAST(floor((auc + 1.959964 * sqrt(var_auc)) * 1e6 + 0.5) AS BIGINT)
         AS ci_hi_micro
FROM v
"""

# E490 — t-closeness: TV distance to the global sensitive distribution
# over the full group × value lattice (absent values keep their global
# mass), one floor-ppm division per group.
QUERIES["t_closeness_audit"] = corpus.t_closeness_audit
ORACLES["t_closeness_audit"] = """
WITH cells AS (
  SELECT lang, n_chars // 100 AS len_band, source,
         CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2, 3
), groups AS (
  SELECT lang, len_band, CAST(sum(c) AS BIGINT) AS n_docs
  FROM cells GROUP BY 1, 2
), gdist AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS gc FROM cells GROUP BY 1
), total AS (
  SELECT CAST(sum(gc) AS BIGINT) AS n_total FROM gdist
), lattice AS (
  SELECT g.lang, g.len_band, g.n_docs, t.n_total,
         abs(coalesce(cl.c, 0) * t.n_total - v.gc * g.n_docs) AS gap
  FROM groups g
  CROSS JOIN gdist v
  CROSS JOIN total t
  LEFT JOIN cells cl
    ON cl.lang = g.lang AND cl.len_band = g.len_band AND cl.source = v.source
)
SELECT lang, len_band, n_docs,
       CAST(sum(gap) * 1000000 // (2 * n_docs * n_total) AS BIGINT) AS tv_ppm,
       CAST(max(gap) * 1000000 // (n_docs * n_total) AS BIGINT)
         AS worst_value_gap_ppm,
       CAST(CASE WHEN sum(gap) * 1000000 // (2 * n_docs * n_total) <= 200000
                 THEN 1 ELSE 0 END AS BIGINT) AS t02_ok
FROM lattice
GROUP BY lang, len_band, n_docs, n_total
"""

# E491 — multi-table atomic transactions: the gate reads both tables
# through the catalog at each tx; the oracle recomputes the two
# consistent snapshots from raw data (the abandoned poison commit is
# in NEITHER — catalog isolation is the thing under test).
QUERIES["tx_snapshot_report"] = _layout.tx_snapshot_report
ORACLES["tx_snapshot_report"] = f"""
WITH ord0 AS (
  SELECT o_orderkey AS okey, {duck_units('o_totalprice', 2)} AS cents
  FROM orders
), rev0 AS (
  SELECT l_orderkey AS okey,
         CAST(sum({duck_units('l_extendedprice * (1 - l_discount)', 4)})
              AS BIGINT) AS rev_4dp_units
  FROM lineitem GROUP BY 1
), mark_ord AS (
  SELECT -i AS okey, i * 100 AS cents FROM range(1, 9) t(i)
), mark_rev AS (
  SELECT -i AS okey, i * 1000000 AS rev_4dp_units FROM range(1, 9) t(i)
), tx0 AS (
  SELECT 0 AS tx, o.okey AS ok_o, r.okey AS ok_r, o.cents, r.rev_4dp_units
  FROM ord0 o FULL JOIN rev0 r ON o.okey = r.okey
), tx1 AS (
  SELECT 1 AS tx, o.okey AS ok_o, r.okey AS ok_r, o.cents, r.rev_4dp_units
  FROM (SELECT * FROM ord0 UNION ALL SELECT * FROM mark_ord) o
  FULL JOIN (SELECT * FROM rev0 UNION ALL SELECT * FROM mark_rev) r
    ON o.okey = r.okey
), unioned_tx AS (
  SELECT * FROM tx0 UNION ALL SELECT * FROM tx1
)
SELECT CAST(tx AS BIGINT) AS tx,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS rev_only,
       CAST(sum(CASE WHEN rev_4dp_units IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS ord_only,
       CAST(sum(CASE WHEN coalesce(ok_o, ok_r) < 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_marker,
       CAST(sum(CASE WHEN coalesce(ok_o, ok_r) = -999999 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_poison,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM unioned_tx GROUP BY tx
"""

# --------------------------------------------------------------------------
# E492 / E494 — pandas GROUPED_AGG UDAF, streaming exactly-once resume
# --------------------------------------------------------------------------

# E492 — grouped-agg pandas UDAF: quartiles + interquartile mean on
# exact cents (interpolation fractions are quarters — no rounding step
# exists, so numpy and DuckDB agree bit-for-bit).
QUERIES["pandas_udaf_quartiles"] = pandas_ops.pandas_udaf_quartiles
ORACLES["pandas_udaf_quartiles"] = f"""
WITH c AS (
  SELECT event_type, {duck_units('value', 2)} AS cents FROM events
), q AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         quantile_cont(cents, 0.25) AS q25_cents,
         quantile_cont(cents, 0.50) AS q50_cents,
         quantile_cont(cents, 0.75) AS q75_cents
  FROM c GROUP BY event_type
)
SELECT q.event_type, q.n, q.q25_cents, q.q50_cents, q.q75_cents,
       (SELECT floor(sum(cents) * 100.0 / count(*)) / 10000.0
        FROM c
        WHERE c.event_type = q.event_type
          AND c.cents >= q.q25_cents AND c.cents <= q.q75_cents)
         AS iq_mean
FROM q
"""

# E494 — exactly-once resume: the drained two-incarnation sink must
# equal the batch aggregate over ALL events (each row exactly once).
QUERIES["streaming_resume_drain"] = _stream.streaming_resume_drain
ORACLES["streaming_resume_drain"] = f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum({duck_units('value', 2)}) AS BIGINT) AS sum_cents
FROM events GROUP BY event_type
"""

# --------------------------------------------------------------------------
# E495–E497 — partition evolution, Krippendorff's alpha, CA trend
# --------------------------------------------------------------------------

# E495 — partition evolution: old-spec files (no bucket dimension) are
# conservatively kept inside the day window, so the oracle's window
# predicate is `even-id OR bucket = 3`.
QUERIES["partition_evolution_scan"] = _layout.partition_evolution_scan
ORACLES["partition_evolution_scan"] = f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_even,
       CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_odd,
       CAST(sum({duck_units('value', 2)}) AS BIGINT) AS sum_cents
FROM events
WHERE epoch_us(ts) // 86400000000 BETWEEN 19733 AND 19739
  AND (event_id % 2 = 0 OR {_duck_bkt('user_id', 1, 8)} = 3)
GROUP BY event_type
"""

# E496 — Krippendorff's alpha: exact integer coincidence algebra at
# m=3 raters; De=0 sources emit NULL (the spec's undefined case).
QUERIES["krippendorff_alpha"] = mlmetrics.krippendorff_alpha
ORACLES["krippendorff_alpha"] = f"""
WITH per_unit AS (
  SELECT source,
         (CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END)
         + (CASE WHEN len({_TOKS}) >= 40 THEN 1 ELSE 0 END)
         + (CASE WHEN length(regexp_replace(text, '[^0-9]', '', 'g')) >= 3
                 THEN 1 ELSE 0 END) AS k
  FROM documents
), g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_units,
         CAST(sum(k) AS BIGINT) AS n1,
         CAST(sum(k * (3 - k)) AS BIGINT) AS dis
  FROM per_unit GROUP BY source
)
SELECT source, n_units, n1 AS pos_votes, dis AS disagree_mass,
       CASE WHEN 2 * (3 * n_units - n1) * n1 > 0
            THEN 1000000 - CAST(floor(
                   CAST(dis AS DOUBLE) * (3 * n_units - 1) * 1e6
                   / CAST(2 * (3 * n_units - n1) * n1 AS DOUBLE))
                 AS BIGINT)
       END AS alpha_ppm
FROM g
"""

# E497 — Cochran–Armitage: five exact long sums over the band
# relation, one fixed double z expression.
QUERIES["cochran_armitage_trend"] = mlmetrics.cochran_armitage_trend
ORACLES["cochran_armitage_trend"] = """
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv
  FROM events GROUP BY user_id
), banded AS (
  SELECT least(n_ev // 5, 9) AS w, conv AS r FROM per_user
), bands AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n, CAST(sum(r) AS BIGINT) AS r
  FROM banded GROUP BY w
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_bands,
         CAST(sum(n) AS BIGINT) AS big_n,
         CAST(sum(r) AS BIGINT) AS big_r,
         CAST(sum(w * n) AS BIGINT) AS swn,
         CAST(sum(w * r) AS BIGINT) AS swr,
         CAST(sum(w * w * n) AS BIGINT) AS sw2n
  FROM bands
)
SELECT n_bands, big_n AS n_users, big_r AS n_converters,
       CASE WHEN big_r * (big_n - big_r) * (big_n * sw2n - swn * swn) > 0
            THEN CAST(floor(
                   CAST(big_n * swr - big_r * swn AS DOUBLE)
                   * sqrt(CAST(big_n AS DOUBLE))
                   / sqrt(CAST(big_r * (big_n - big_r)
                               * (big_n * sw2n - swn * swn) AS DOUBLE))
                   * 1e6 + 0.5) AS BIGINT)
       END AS z_micro,
       CASE WHEN big_r * (big_n - big_r) * (big_n * sw2n - swn * swn) > 0
            THEN CAST(CASE WHEN abs(
                   CAST(big_n * swr - big_r * swn AS DOUBLE)
                   * sqrt(CAST(big_n AS DOUBLE))
                   / sqrt(CAST(big_r * (big_n - big_r)
                               * (big_n * sw2n - swn * swn) AS DOUBLE)))
                   > 1.959964 THEN 1 ELSE 0 END AS BIGINT)
       END AS significant
FROM tot
"""

# --------------------------------------------------------------------------
# E498–E500 — OBF interim monitor, SCD2 build, UniMax allocation
# --------------------------------------------------------------------------
# E498 — O'Brien–Fleming interim looks over the md5-parity arms.
QUERIES["obf_interim_monitor"] = mlmetrics.obf_interim_monitor
ORACLES["obf_interim_monitor"] = """
WITH per_user AS (
  SELECT user_id,
         min(epoch_us(ts) // 86400000000) AS first_day,
         min(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(ts) // 86400000000 END) AS conv_day,
         ((instr('0123456789abcdef',
                 substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 4096
          + (instr('0123456789abcdef',
                 substring(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1) * 256
          + (instr('0123456789abcdef',
                 substring(md5(CAST(user_id AS VARCHAR)), 3, 1)) - 1) * 16
          + (instr('0123456789abcdef',
                 substring(md5(CAST(user_id AS VARCHAR)), 4, 1)) - 1)) % 2
           AS arm
  FROM events GROUP BY user_id
), spine AS (
  SELECT day, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS look_k
  FROM (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day FROM events)
), hz AS (
  SELECT CAST(count(*) AS BIGINT) AS big_k FROM spine
), grid AS (
  SELECT s.day, a.arm,
         CAST(coalesce(sum(CASE WHEN u.first_day = s.day THEN 1 END)
             FILTER (WHERE u.arm = a.arm), 0) AS BIGINT) AS e,
         CAST(coalesce(sum(CASE WHEN u.conv_day = s.day THEN 1 END)
             FILTER (WHERE u.arm = a.arm), 0) AS BIGINT) AS c
  FROM spine s
  CROSS JOIN (SELECT unnest([0, 1]) AS arm) a
  LEFT JOIN per_user u ON u.arm = a.arm
  GROUP BY s.day, a.arm
), cum AS (
  SELECT arm, day,
         CAST(sum(e) OVER (PARTITION BY arm ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n,
         CAST(sum(c) OVER (PARTITION BY arm ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS x
  FROM grid
), looks AS (
  SELECT a0.day, s.look_k, a0.n AS n1, a0.x AS x1, a1.n AS n2, a1.x AS x2,
         h.big_k
  FROM (SELECT day, n, x FROM cum WHERE arm = 0) a0
  JOIN (SELECT day, n, x FROM cum WHERE arm = 1) a1 USING (day)
  JOIN spine s USING (day)
  CROSS JOIN hz h
), scored AS (
  SELECT look_k AS look, n1, x1, n2, x2, big_k,
         CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2 AS diff,
         sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
              * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
              * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))) AS se,
         2.2414 / sqrt(CAST(look_k AS DOUBLE) / CAST(big_k AS DOUBLE))
           AS boundary
  FROM looks
)
SELECT CAST(look AS BIGINT) AS look, n1, x1, n2, x2,
       CASE WHEN n1 > 0 AND n2 > 0 AND se > 0
            THEN CAST(floor(diff / se * 1e6 + 0.5) AS BIGINT) END AS z_micro,
       CAST(floor(boundary * 1e6 + 0.5) AS BIGINT) AS boundary_micro,
       CASE WHEN n1 > 0 AND n2 > 0 AND se > 0
            THEN CAST(CASE WHEN abs(diff / se) > boundary THEN 1 ELSE 0 END
                      AS BIGINT) END AS crossed
FROM scored
"""

# E499 — SCD-2 dimension build: change-point + interval-close windows.
QUERIES["scd2_build"] = timeops.scd2_build
ORACLES["scd2_build"] = """
WITH states AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         least(CAST(floor(value / 2) AS BIGINT), 4) AS band
  FROM events
), lagged AS (
  SELECT user_id, us, event_id, band,
         lag(band) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS prev_band
  FROM states
), changes AS (
  SELECT user_id, us, event_id, band FROM lagged
  WHERE prev_band IS NULL OR band <> prev_band
)
SELECT user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
            AS INTEGER) AS version_no,
       band, us AS valid_from_us,
       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         AS valid_to_us
FROM changes
"""

# E500 — UniMax waterfilling on the language-grain relation.
QUERIES["unimax_allocation"] = corpus.unimax_allocation
ORACLES["unimax_allocation"] = f"""
WITH sizes AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens
  FROM (SELECT lang, unnest({_TOKS}) AS t FROM documents)
  GROUP BY lang
), tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_langs
  FROM sizes
), ranked AS (
  SELECT lang, n_tokens, n_langs,
         total * 500000 // 1000000 AS budget,
         CAST(row_number() OVER (ORDER BY n_tokens, lang) AS BIGINT) AS i,
         CAST(sum(n_tokens) OVER (ORDER BY n_tokens, lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS prefix
  FROM sizes CROSS JOIN tot
), feasible AS (
  SELECT *, CASE WHEN prefix + (n_langs - i) * n_tokens <= budget
                 THEN 1 ELSE 0 END AS whole_ok
  FROM ranked
), jrel AS (
  SELECT CAST(sum(whole_ok) AS BIGINT) AS j,
         CAST(coalesce(sum(CASE WHEN whole_ok = 1 THEN n_tokens END), 0)
              AS BIGINT) AS prefix_j
  FROM feasible
), filled AS (
  SELECT f.*, r.j, r.prefix_j,
         CASE WHEN f.n_langs > r.j
              THEN CAST((f.budget - r.prefix_j) // (f.n_langs - r.j)
                        AS BIGINT) END AS fill
  FROM feasible f CROSS JOIN jrel r
)
SELECT lang, n_tokens,
       CAST(CASE WHEN i <= j THEN n_tokens
                 ELSE least(n_tokens, fill) END AS BIGINT) AS alloc_tokens,
       CAST(CASE WHEN n_tokens > 0 THEN
            (CASE WHEN i <= j THEN n_tokens ELSE least(n_tokens, fill) END)
            * 1000000 // n_tokens END AS BIGINT) AS epoch_ppm,
       CAST(CASE WHEN i <= j THEN 1 ELSE 0 END AS BIGINT) AS taken_whole
FROM filled
"""

# --------------------------------------------------------------------------
# E501–E503 — incremental sessionization, OPH MinHash, watermark dedup
# --------------------------------------------------------------------------

# E501 — incremental == rebuild: the oracle sessionizes ALL events
# from scratch (E10's gaps-and-islands), cents exact.
QUERIES["incremental_sessionization"] = timeops.incremental_sessionization
ORACLES["incremental_sessionization"] = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, value FROM events
), flagged AS (
  SELECT user_id, tus, value,
         CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
                   OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus)
                      >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
), sessions AS (
  SELECT user_id, tus, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM flagged
)
SELECT user_id,
       min(tus) AS session_start_us,
       max(tus) + 1800000000 AS session_end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum({duck_units("value", 2)}) AS BIGINT) AS sum_cents
FROM sessions
GROUP BY user_id, sid
"""

# E502 — OPH calibration: full replay of the one-pass sketch.
QUERIES["oph_minhash_calibration"] = _sketch.oph_minhash_calibration
_H48T = duck_md5_hash48("t")
ORACLES["oph_minhash_calibration"] = f"""
WITH docs AS MATERIALIZED (
  SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents
), tok AS (
  SELECT doc_id, unnest(toks) AS t FROM docs
), sketch AS MATERIALIZED (
  SELECT doc_id, ({_H48T}) % 32 AS bin, min({_H48T}) AS mh
  FROM tok GROUP BY doc_id, ({_H48T}) % 32
), pairs AS (
  SELECT a.doc_id AS doc_a, a.doc_id + o.off AS doc_b
  FROM docs a
  CROSS JOIN (SELECT unnest([1, 5]) AS off) o
  JOIN docs b ON b.doc_id = a.doc_id + o.off
), matched AS (
  SELECT p.doc_a, p.doc_b,
         CAST(count(*) AS BIGINT) AS both_bins,
         CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
           AS match_bins
  FROM pairs p
  JOIN sketch sa ON sa.doc_id = p.doc_a
  JOIN sketch sb ON sb.doc_id = p.doc_b AND sb.bin = sa.bin
  GROUP BY p.doc_a, p.doc_b
), exact AS (
  SELECT m.doc_a, m.match_bins * 1000 // m.both_bins AS oph_milli,
         (CAST(len(list_intersect(ta.toks, tb.toks)) AS BIGINT) * 1000)
         // (len(ta.toks) + len(tb.toks)
             - len(list_intersect(ta.toks, tb.toks))) AS exact_milli
  FROM matched m
  JOIN docs ta ON ta.doc_id = m.doc_a
  JOIN docs tb ON tb.doc_id = m.doc_b
)
SELECT oph_milli // 100 AS band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(floor(CAST(sum(exact_milli) AS DOUBLE) / count(*) + 0.5)
            AS BIGINT) AS mean_exact_milli
FROM exact
GROUP BY oph_milli // 100
"""

# E503 — watermark-bounded streaming dedup: drained aggregate equals
# the batch aggregate over the ORIGINAL (pre-injection) events.
QUERIES["streaming_dedup_watermark_drain"] = _stream.streaming_dedup_watermark_drain
ORACLES["streaming_dedup_watermark_drain"] = f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum({duck_units('value', 2)}) AS BIGINT) AS sum_cents
FROM events GROUP BY event_type
"""

# --------------------------------------------------------------------------
# E504–E506 — double-sweep diameter, STL anomalies, linear gap-fill
# --------------------------------------------------------------------------
# E504 — double-sweep diameter over the same 0.8-threshold edge
# relation E368 uses (its oracle pair relation nested verbatim); the
# oracle replays both BFS sweeps. Recursive members use UNION (set
# semantics): a node's first appearance is its BFS level, so min(hop)
# is exact and the recursion is guaranteed to terminate.
QUERIES["graph_diameter_sweep"] = dedup.graph_diameter_sweep
ORACLES["graph_diameter_sweep"] = f"""
WITH edges AS MATERIALIZED (
{ORACLES["ngram_jaccard_pairs"]}
), und AS MATERIALIZED (
  SELECT doc_a AS u, doc_b AS w FROM edges
  UNION ALL
  SELECT doc_b AS u, doc_a AS w FROM edges
), seed1 AS (
  SELECT u AS doc_id FROM (
    SELECT u, count(*) AS deg FROM und GROUP BY u
    ORDER BY deg DESC, u ASC LIMIT 1
  )
), s1 AS MATERIALIZED (
  WITH RECURSIVE r(doc_id, hop) AS (
    SELECT doc_id, 0 FROM seed1
    UNION
    SELECT e.w, r.hop + 1
    FROM r JOIN und e ON e.u = r.doc_id
    WHERE r.hop < 12
  )
  SELECT doc_id, CAST(min(hop) AS INTEGER) AS hop FROM r GROUP BY doc_id
), seed2 AS (
  SELECT min(doc_id) AS doc_id FROM s1
  WHERE hop = (SELECT max(hop) FROM s1)
), s2 AS MATERIALIZED (
  WITH RECURSIVE r(doc_id, hop) AS (
    SELECT doc_id, 0 FROM seed2
    UNION
    SELECT e.w, r.hop + 1
    FROM r JOIN und e ON e.u = r.doc_id
    WHERE r.hop < 12
  )
  SELECT doc_id, CAST(min(hop) AS INTEGER) AS hop FROM r GROUP BY doc_id
)
SELECT (SELECT doc_id FROM seed1) AS root_doc,
       (SELECT doc_id FROM seed2) AS far_doc,
       (SELECT max(hop) FROM s1) AS ecc_root,
       (SELECT max(hop) FROM s2) AS diameter_lb,
       (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_reached_root,
       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_reached_far
"""

# E505 — STL residual anomalies: E331's exact decomposition feeding
# the E47 percentile parity convention.
QUERIES["stl_residual_anomalies"] = timeops.stl_residual_anomalies
ORACLES["stl_residual_anomalies"] = f"""
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(sum({duck_units('value', 2)}) AS BIGINT) AS cents
  FROM events GROUP BY 1
), t AS (
  SELECT day, cents,
         CAST(sum(cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND
              3 FOLLOWING)
              // count(cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
              AND 3 FOLLOWING) AS BIGINT) AS trend_cents,
         CAST(((day + 4) % 7 + 7) % 7 AS BIGINT) AS dow
  FROM daily
), det AS (
  SELECT day, dow, cents, trend_cents, cents - trend_cents AS det FROM t
), seas AS (
  SELECT dow, CAST(sum(det) // count(*) AS BIGINT) AS seasonal_cents
  FROM det GROUP BY dow
), res AS MATERIALIZED (
  SELECT d.day, d.dow, d.cents,
         d.det - s.seasonal_cents AS residual_cents
  FROM det d JOIN seas s USING (dow)
), med AS (
  SELECT quantile_cont(residual_cents, 0.5) AS med FROM res
), mad AS (
  SELECT quantile_cont(abs(r.residual_cents - m.med), 0.5) AS mad
  FROM res r CROSS JOIN med m
), scored AS (
  SELECT r.day, r.dow, r.cents, r.residual_cents,
         round(m.med, 4) AS med, round(d.mad, 4) AS mad,
         CASE WHEN d.mad > 0
              THEN round((r.residual_cents - m.med) / (1.4826 * d.mad), 4)
         END AS robust_z
  FROM res r CROSS JOIN med m CROSS JOIN mad d
)
SELECT *, CAST(CASE WHEN abs(robust_z) > 3.5 THEN 1 ELSE 0 END AS BIGINT)
         AS is_anomaly
FROM scored WHERE robust_z IS NOT NULL
ORDER BY abs(robust_z) DESC, day ASC LIMIT 5
"""

# E506 — linear-interpolation gap-fill: exact integer lerp between the
# bracketing observations; edges stay NULL.
QUERIES["linear_interp_gapfill"] = relational.linear_interp_gapfill
ORACLES["linear_interp_gapfill"] = f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(sum({duck_units('value', 2)}) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('purchase', 'signup')
  GROUP BY 1, 2
), observed AS (
  SELECT * FROM daily WHERE ((day % 3) + 3) % 3 <> 1
), span AS (
  SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
), spine AS (
  SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM span
), grid AS (
  SELECT s.event_type, s.day, o.cents
  FROM spine s LEFT JOIN observed o USING (event_type, day)
), filled AS (
  SELECT event_type, day, cents,
         last_value(cents IGNORE NULLS) OVER (PARTITION BY event_type
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS pv,
         last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         first_value(cents IGNORE NULLS) OVER (PARTITION BY event_type
           ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS nv,
         first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM grid
)
SELECT event_type, day,
       CAST(CASE WHEN cents IS NOT NULL THEN cents
                 WHEN pv IS NOT NULL AND nv IS NOT NULL
                 THEN pv + (nv - pv) * (day - pd) // (nd - pd)
            END AS BIGINT) AS cents_filled,
       CAST(CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS is_interpolated
FROM filled
"""

# --------------------------------------------------------------------------
# E507–E509 — Theta forecast, Wilson intervals, ridge CV sweep
# --------------------------------------------------------------------------

# E507 — Theta: trend from exact integer moments (sums of exact
# integers stay exact in float64 — order-free), SES replayed by a
# recursive CTE with the identical 0.5·x2 + 0.5·level op sequence.
QUERIES["theta_forecast"] = pandas_ops.theta_forecast
ORACLES["theta_forecast"] = f"""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT o_orderpriority AS prio,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(sum({duck_units('o_totalprice', 2)}) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
), rk AS MATERIALIZED (
  SELECT prio, day, cents,
         row_number() OVER (PARTITION BY prio ORDER BY day) - 1 AS t,
         CAST(count(*) OVER (PARTITION BY prio) AS BIGINT) AS n
  FROM daily
), mom AS MATERIALIZED (
  SELECT prio, max(n) AS n,
         CAST(sum(t) AS DOUBLE) AS st,
         CAST(sum(cents) AS DOUBLE) AS sy,
         CAST(sum(t * cents) AS DOUBLE) AS sty,
         CAST(sum(t * t) AS DOUBLE) AS stt
  FROM rk GROUP BY prio
), coefs AS MATERIALIZED (
  SELECT prio, n,
         (n * sty - st * sy) / (n * stt - st * st) AS b,
         (sy - ((n * sty - st * sy) / (n * stt - st * st)) * st)
           / CAST(n AS DOUBLE) AS a
  FROM mom
), ses(prio, i, lvl) AS (
  SELECT r.prio, CAST(0 AS BIGINT),
         2.0 * r.cents - (c.a + c.b * 0)
  FROM rk r JOIN coefs c USING (prio) WHERE r.t = 0
  UNION ALL
  SELECT s.prio, s.i + 1,
         0.5 * (2.0 * r.cents - (c.a + c.b * (s.i + 1))) + 0.5 * s.lvl
  FROM ses s
  JOIN rk r ON r.prio = s.prio AND r.t = s.i + 1
  JOIN coefs c ON c.prio = s.prio
), final AS (
  SELECT s.prio, s.lvl FROM ses s
  JOIN (SELECT prio, max(i) AS mi FROM ses GROUP BY 1) m
    ON s.prio = m.prio AND s.i = m.mi
)
SELECT c.prio, CAST(h.h AS INTEGER) AS h, c.n AS n_days,
       CAST(floor(c.a * 1e4 + 0.5) AS BIGINT) AS a_cents_e4,
       CAST(floor(c.b * 1e4 + 0.5) AS BIGINT) AS b_cents_e4,
       CAST(floor(f.lvl * 1e4 + 0.5) AS BIGINT) AS ses_level_e4,
       CAST(floor(0.5 * ((c.a + c.b * (c.n - 1 + h.h)) + f.lvl) * 1e4 + 0.5)
            AS BIGINT) AS forecast_e4
FROM coefs c
JOIN final f USING (prio)
CROSS JOIN (SELECT unnest(range(1, 8)) AS h) h
"""

# E508 — Wilson score intervals per event type.
QUERIES["wilson_conversion_intervals"] = mlmetrics.wilson_conversion_intervals
_WILSON_TYPES = ("view", "click", "signup", "error")
ORACLES["wilson_conversion_intervals"] = "WITH per_user AS (SELECT user_id, " + ", ".join(
    f"max(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS has_{t}"
    for t in list(_WILSON_TYPES) + ["purchase"]
) + """ FROM events GROUP BY user_id
), base AS (
""" + "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS event_type, CAST(sum(has_{t}) AS BIGINT) AS n,
       CAST(sum(has_{t} * has_purchase) AS BIGINT) AS x FROM per_user"""
    for t in _WILSON_TYPES
) + """
)
SELECT event_type, n, x,
       CAST(x * 1000000 // n AS BIGINT) AS p_hat_ppm,
       CAST(floor((
         ((CAST(x AS DOUBLE) / n + 1.959964 * 1.959964 / n / 2)
          - 1.959964 * sqrt(CAST(x AS DOUBLE) / n
              * (1.0 - CAST(x AS DOUBLE) / n) / n
              + 1.959964 * 1.959964 / (4 * CAST(n AS DOUBLE) * n)))
         / (1 + 1.959964 * 1.959964 / n)) * 1e6 + 0.5) AS BIGINT)
         AS wilson_lo_ppm,
       CAST(floor((
         ((CAST(x AS DOUBLE) / n + 1.959964 * 1.959964 / n / 2)
          + 1.959964 * sqrt(CAST(x AS DOUBLE) / n
              * (1.0 - CAST(x AS DOUBLE) / n) / n
              + 1.959964 * 1.959964 / (4 * CAST(n AS DOUBLE) * n)))
         / (1 + 1.959964 * 1.959964 / n)) * 1e6 + 0.5) AS BIGINT)
         AS wilson_hi_ppm
FROM base
"""

# E509 — ridge CV: exact (HUGEINT) moments, the identical double
# Cramer solve and moment-form SSE.
QUERIES["ridge_cv_sweep"] = mlmetrics.ridge_cv_sweep
ORACLES["ridge_cv_sweep"] = f"""
WITH rows_ AS (
  SELECT {corpus.duck_md5_bucket('l_orderkey', 3)} AS fold,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS x1,
         {duck_units('p_retailprice', 2)} AS x2,
         {duck_units('l_extendedprice', 2)} AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
), mom AS MATERIALIZED (
  SELECT fold, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x1 AS HUGEINT) * x1) AS s11,
         sum(CAST(x1 AS HUGEINT) * x2) AS s12,
         sum(CAST(x2 AS HUGEINT) * x2) AS s22,
         sum(CAST(x1 AS HUGEINT) * y) AS s1y,
         sum(CAST(x2 AS HUGEINT) * y) AS s2y,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM rows_ GROUP BY fold
), tot AS (
  SELECT sum(n) AS t_n, sum(s1) AS t_s1, sum(s2) AS t_s2, sum(sy) AS t_sy,
         sum(s11) AS t_s11, sum(s12) AS t_s12, sum(s22) AS t_s22,
         sum(s1y) AS t_s1y, sum(s2y) AS t_s2y, sum(syy) AS t_syy
  FROM mom
), g AS (
  SELECT m.*, t.*, l.lam,
         CAST(t.t_n - m.n AS DOUBLE) AS a11,
         CAST(t.t_s1 - m.s1 AS DOUBLE) AS a12,
         CAST(t.t_s2 - m.s2 AS DOUBLE) AS a13,
         CAST(t.t_s11 - m.s11 AS DOUBLE) + l.lam AS a22,
         CAST(t.t_s12 - m.s12 AS DOUBLE) AS a23,
         CAST(t.t_s22 - m.s22 AS DOUBLE) + l.lam AS a33,
         CAST(t.t_sy - m.sy AS DOUBLE) AS b1,
         CAST(t.t_s1y - m.s1y AS DOUBLE) AS b2,
         CAST(t.t_s2y - m.s2y AS DOUBLE) AS b3
  FROM mom m CROSS JOIN tot t
  CROSS JOIN (SELECT unnest([0.0, 1e4, 1e7, 1e10]) AS lam) l
), solved AS (
  SELECT *,
    (a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13)
     + a13 * (a12 * a23 - a22 * a13)) AS det,
    (b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3)
     + a13 * (b2 * a23 - a22 * b3)) AS det1,
    (a11 * (b2 * a33 - a23 * b3) - b1 * (a12 * a33 - a23 * a13)
     + a13 * (a12 * b3 - b2 * a13)) AS det2,
    (a11 * (a22 * b3 - b2 * a23) - a12 * (a12 * b3 - b2 * a13)
     + b1 * (a12 * a23 - a22 * a13)) AS det3
  FROM g
), betas AS (
  SELECT *, det1 / det AS beta0, det2 / det AS beta1, det3 / det AS beta2
  FROM solved
)
SELECT lam, CAST(fold AS BIGINT) AS fold, n AS n_test,
       CAST(floor(beta0 * 1e4 + 0.5) AS BIGINT) AS beta0_e4,
       CAST(floor(beta1 * 1e6 + 0.5) AS BIGINT) AS beta1_micro,
       CAST(floor(beta2 * 1e6 + 0.5) AS BIGINT) AS beta2_micro,
       CAST(floor(((CAST(syy AS DOUBLE)
              - 2 * (beta0 * CAST(sy AS DOUBLE) + beta1 * CAST(s1y AS DOUBLE)
                     + beta2 * CAST(s2y AS DOUBLE))
              + beta0 * (beta0 * CAST(n AS DOUBLE) + beta1 * CAST(s1 AS DOUBLE)
                         + beta2 * CAST(s2 AS DOUBLE))
              + beta1 * (beta0 * CAST(s1 AS DOUBLE) + beta1 * CAST(s11 AS DOUBLE)
                         + beta2 * CAST(s12 AS DOUBLE))
              + beta2 * (beta0 * CAST(s2 AS DOUBLE) + beta1 * CAST(s12 AS DOUBLE)
                         + beta2 * CAST(s22 AS DOUBLE)))
             / CAST(n AS DOUBLE)) * 100.0 + 0.5) AS BIGINT)
         AS test_mse_cents2_x100
FROM betas
"""

# --------------------------------------------------------------------------
# E510–E511 — MERGE with DELETE branch, Holt–Winters
# --------------------------------------------------------------------------

# E510 — MERGE applying upsert + DELETE branches atomically; the
# oracle recomputes the surviving-row state from raw events.
QUERIES["merge_delete_report"] = _layout.merge_delete_report
ORACLES["merge_delete_report"] = f"""
WITH survived AS (
  SELECT event_type,
         CASE WHEN event_id % 13 = 0 THEN {duck_units('value * 2', 2)}
              ELSE {duck_units('value', 2)} END AS cents
  FROM events
  WHERE event_id % 17 <> 0
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM survived GROUP BY event_type
"""

# E511 — Holt–Winters: recursive CTE carrying the full 9-number state,
# one seasonal slot updated per step, identical float64 op sequence.
QUERIES["holt_winters_forecast"] = pandas_ops.holt_winters_forecast


def _hw_oracle() -> str:
    sel_s = lambda i: " ".join(  # noqa: E731
        [f"CASE ({i}) % 7"]
        + [f"WHEN {j} THEN s{j}" for j in range(7)]
        + ["END"]
    )
    l_new = (
        f"0.3 * (r.cents - ({sel_s('hw.i + 1')})) "
        "+ (1.0 - 0.3) * (hw.level + hw.trend)"
    )
    s_updates = ",\n         ".join(
        f"CASE WHEN (hw.i + 1) % 7 = {j} "
        f"THEN 0.2 * (r.cents - ({l_new})) + (1.0 - 0.2) * hw.s{j} "
        f"ELSE hw.s{j} END AS s{j}"
        for j in range(7)
    )
    s_init_cols = ",\n         ".join(
        f"(SELECT cents FROM rk WHERE t = {j}) - w1 AS s{j}"
        for j in range(7)
    )
    fc_slot = " ".join(
        ["CASE (f.n - 1 + h.h) % 7"]
        + [f"WHEN {j} THEN f.s{j}" for j in range(7)]
        + ["END"]
    )
    return f"""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(sum({duck_units('value', 2)}) AS BIGINT) AS cents
  FROM events GROUP BY 1
), rk AS MATERIALIZED (
  SELECT day, CAST(cents AS DOUBLE) AS cents,
         row_number() OVER (ORDER BY day) - 1 AS t,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM daily
), init AS (
  SELECT CAST((SELECT sum(cents) FROM rk WHERE t < 7) AS DOUBLE) / 7.0 AS w1,
         CAST((SELECT sum(cents) FROM rk WHERE t >= 7 AND t < 14) AS DOUBLE)
           / 7.0 AS w2
), s_init AS (
  SELECT w1 AS level, (w2 - w1) / 7.0 AS trend,
         {s_init_cols}
  FROM init
), hw(i, level, trend, s0, s1, s2, s3, s4, s5, s6) AS (
  SELECT CAST(6 AS BIGINT), level, trend, s0, s1, s2, s3, s4, s5, s6
  FROM s_init
  UNION ALL
  SELECT hw.i + 1,
         {l_new} AS level,
         0.1 * (({l_new}) - hw.level) + (1.0 - 0.1) * hw.trend AS trend,
         {s_updates}
  FROM hw JOIN rk r ON r.t = hw.i + 1
), fin AS (
  SELECT hw.*, (SELECT max(n) FROM rk) AS n FROM hw
  WHERE hw.i = (SELECT max(i) FROM hw)
)
SELECT CAST(h.h AS INTEGER) AS h, f.n AS n_days,
       CAST(floor(f.level * 1e4 + 0.5) AS BIGINT) AS level_e4,
       CAST(floor(f.trend * 1e4 + 0.5) AS BIGINT) AS trend_e4,
       CAST(floor((f.level + h.h * f.trend + ({fc_slot})) * 1e4 + 0.5)
            AS BIGINT) AS forecast_e4
FROM fin f CROSS JOIN (SELECT unnest(range(1, 8)) AS h) h
"""


ORACLES["holt_winters_forecast"] = _hw_oracle()

# --------------------------------------------------------------------------
# E512–E514 — negative-sampling quotas, JL distortion, MaxSim retrieval
# --------------------------------------------------------------------------

# E512 — unigram^0.75 quotas by exact integer largest remainder.
QUERIES["negative_sampling_quota"] = corpus.negative_sampling_quota
ORACLES["negative_sampling_quota"] = f"""
WITH tf AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest({_TOKS}) AS t FROM documents) GROUP BY t
), powed AS (
  SELECT t, n,
         CAST(floor(pow(CAST(n AS DOUBLE), 0.75) * 1000.0 + 0.5) AS BIGINT)
           AS w
  FROM tf
), tot AS (
  SELECT CAST(sum(w) AS BIGINT) AS wsum FROM powed
), flo AS MATERIALIZED (
  SELECT t, n, w * 100000 // wsum AS base_q,
         (w * 100000) % wsum AS rem_num
  FROM powed CROSS JOIN tot
), short AS (
  SELECT CAST(100000 - sum(base_q) AS BIGINT) AS pennies FROM flo
), quotas AS MATERIALIZED (
  SELECT t, n,
         CAST(base_q + CASE WHEN row_number() OVER (
                ORDER BY rem_num DESC, t ASC) <= pennies
              THEN 1 ELSE 0 END AS BIGINT) AS quota
  FROM flo CROSS JOIN short
)
SELECT 'top' AS kind, t, n, quota FROM (
  SELECT t, n, quota FROM quotas ORDER BY quota DESC, t ASC LIMIT 40
)
UNION ALL
SELECT 'checksum' AS kind, '*' AS t, CAST(sum(n) AS BIGINT) AS n,
       CAST(sum(quota) AS BIGINT) AS quota
FROM quotas
"""

# E513 — JL distortion bands: identical projection literals both sides.
QUERIES["jl_distortion_audit"] = similarity.jl_distortion_audit
_JL_TABS = similarity.srp_planes(n_bits=16, n_tables=1, dim=64, seed=99)[0]
_JL_PROJ = ", ".join(
    "list_sum(list_transform(list_zip(embedding, ["
    + ", ".join(repr(v) for v in plane)
    + "]), p -> CAST(p[1] AS DOUBLE) * p[2]))"
    for plane in _JL_TABS
)
ORACLES["jl_distortion_audit"] = f"""
WITH base AS MATERIALIZED (
  SELECT vec_id, embedding, [{_JL_PROJ}] AS p FROM embeddings
), pairs AS (
  SELECT a.vec_id AS doc_a, a.embedding AS ea, a.p AS pa,
         b.vec_id AS doc_b, b.embedding AS eb, b.p AS pb
  FROM base a
  CROSS JOIN (SELECT unnest([1, 5]) AS off) o
  JOIN base b ON b.vec_id = a.vec_id + o.off
), scored AS (
  SELECT sqrt(list_sum(list_transform(list_zip(ea, eb),
           q -> (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))
                * (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))))) AS d_full,
         sqrt(list_sum(list_transform(list_zip(pa, pb),
           q -> (q[1] - q[2]) * (q[1] - q[2]))) / 16.0) AS d_proj
  FROM pairs
)
SELECT CAST(floor(d_proj / d_full * 10.0) AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM scored WHERE d_full > 0
GROUP BY 1
"""

# E514 — MaxSim: 4×16 sub-vector decomposition, per-slot max pivoted
# into FIXED-ORDER addition (no float sum aggregate).
QUERIES["maxsim_late_interaction_topk"] = similarity.maxsim_late_interaction_topk
_MS_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
ORACLES["maxsim_late_interaction_topk"] = f"""
WITH base AS MATERIALIZED (
  SELECT vec_id, s.slot,
         list_slice(embedding, 1 + 16 * s.slot, 16 + 16 * s.slot) AS sub
  FROM embeddings
  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS slot) s
), q AS (
  SELECT vec_id AS query_id, slot AS q_slot, sub AS q_sub
  FROM base WHERE vec_id < 5
), c AS (
  SELECT vec_id AS cand_id, sub AS c_sub FROM base
), dots AS (
  SELECT q.query_id, c.cand_id, q.q_slot,
         max({_MS_DOT.format(a='q.q_sub', b='c.c_sub')}) AS best
  FROM q JOIN c ON q.query_id <> c.cand_id
  GROUP BY q.query_id, c.cand_id, q.q_slot
), pivoted AS (
  SELECT query_id, cand_id,
         max(CASE WHEN q_slot = 0 THEN best END) AS b0,
         max(CASE WHEN q_slot = 1 THEN best END) AS b1,
         max(CASE WHEN q_slot = 2 THEN best END) AS b2,
         max(CASE WHEN q_slot = 3 THEN best END) AS b3
  FROM dots GROUP BY query_id, cand_id
), summed AS (
  SELECT query_id, cand_id, ((b0 + b1) + (b2 + b3)) AS maxsim
  FROM pivoted
), ranked AS (
  SELECT query_id, cand_id, maxsim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY maxsim DESC, cand_id ASC) AS rnk
  FROM summed
)
SELECT query_id, cand_id,
       CAST(floor(maxsim * 1e6 + 0.5) AS BIGINT) AS maxsim_micro,
       CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 5
"""

# --------------------------------------------------------------------------
# E515–E516 — branch/tag refs, readability
# --------------------------------------------------------------------------

# E515 — write-audit-publish on refs: the oracle recomputes all three
# staged states from raw events (mod-3 batches).
QUERIES["branch_refs_report"] = _layout.branch_refs_report
ORACLES["branch_refs_report"] = f"""
WITH staged AS (
  SELECT 'main_before_ff' AS stage, event_type, value
  FROM events WHERE event_id % 3 = 0
  UNION ALL
  SELECT 'exp_head', event_type, value FROM events
  UNION ALL
  SELECT 'main_after_ff', event_type, value FROM events
)
SELECT stage, event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum({duck_units('value', 2)}) AS BIGINT) AS sum_cents
FROM staged GROUP BY stage, event_type
"""

# E516 — Flesch readability from exact counts.
QUERIES["readability_scores"] = text.readability_scores
ORACLES["readability_scores"] = f"""
WITH per_doc AS (
  SELECT source,
         CAST(len({_TOKS}) AS BIGINT) AS words,
         CAST(greatest(len(list_filter(string_split_regex(text, '[.!?]'),
              s -> trim(s) <> '')), 1) AS BIGINT) AS sents,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+', 0))
              AS BIGINT) AS sylls
  FROM documents
), per_source AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(words) AS BIGINT) AS n_words,
         CAST(sum(sents) AS BIGINT) AS n_sents,
         CAST(sum(sylls) AS BIGINT) AS n_sylls
  FROM per_doc GROUP BY source
)
SELECT source, n_docs, n_words, n_sents, n_sylls,
       CAST(floor(CAST(n_words AS DOUBLE) / n_sents * 1000.0 + 0.5)
            AS BIGINT) AS words_per_sent_milli,
       CAST(floor(CAST(n_sylls AS DOUBLE) / n_words * 1000.0 + 0.5)
            AS BIGINT) AS sylls_per_word_milli,
       CAST(floor((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                   - 84.6 * (CAST(n_sylls AS DOUBLE) / n_words)) * 1000.0
                  + 0.5) AS BIGINT) AS flesch_milli
FROM per_source
"""

# --------------------------------------------------------------------------
# E517–E519 — replaceWhere, user-level DP sums, IV/Wald
# --------------------------------------------------------------------------

# E517 — predicate-scoped atomic overwrite.
QUERIES["replace_where_report"] = _layout.replace_where_report
ORACLES["replace_where_report"] = f"""
WITH state AS (
  SELECT event_type,
         CASE WHEN event_type = 'error' THEN 0
              ELSE {duck_units('value', 2)} END AS cents
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM state GROUP BY event_type
"""

# E518 — user-level DP sum: clip → exact sums → deterministic Laplace.
QUERIES["dp_user_sum_release"] = mlmetrics.dp_user_sum_release
_DPU_U16 = corpus.duck_md5_bucket("event_type || '_dpu1'", 65536)
ORACLES["dp_user_sum_release"] = f"""
WITH per_user AS (
  SELECT event_type, user_id,
         CAST(sum({duck_units('value', 2)}) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), clipped AS (
  SELECT event_type, least(cents, 50000) AS clipped,
         cents - least(cents, 50000) AS excess
  FROM per_user
), per AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(clipped) AS BIGINT) AS true_sum_cents,
         CAST(sum(excess) AS BIGINT) AS clipped_away_cents,
         CAST(sum(CASE WHEN excess > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped
  FROM clipped GROUP BY event_type
), staged AS (
  SELECT *, abs(2 * ({_DPU_U16}) + 2 - 65537) AS k,
         CASE WHEN 2 * ({_DPU_U16}) + 2 - 65537 >= 0 THEN 1 ELSE -1 END
           AS sgn
  FROM per
)
SELECT event_type, n_users, true_sum_cents,
       CAST(floor(-sgn * 50000 * ln(CAST(65537 - k AS DOUBLE) / 65537)
                  + 0.5) AS BIGINT) AS noise_cents,
       true_sum_cents
         + CAST(floor(-sgn * 50000 * ln(CAST(65537 - k AS DOUBLE) / 65537)
                      + 0.5) AS BIGINT) AS released_sum_cents,
       clipped_away_cents, n_clipped,
       CAST(1000000 AS BIGINT) AS epsilon_ppm
FROM staged
"""

# E519 — IV / Wald encouragement-design estimator.
QUERIES["iv_wald_estimate"] = mlmetrics.iv_wald_estimate
ORACLES["iv_wald_estimate"] = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN {duck_units('value', 2)} ELSE 0 END)
              AS BIGINT) AS y_cents,
         {corpus.duck_md5_bucket('user_id', 2)} AS z
  FROM events GROUP BY user_id
), cells AS (
  SELECT z, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y_cents) AS BIGINT) AS sy
  FROM per_user GROUP BY z
), j AS (
  SELECT z0.n AS n0, z0.sx AS sx0, z0.sy AS sy0,
         z1.n AS n1, z1.sx AS sx1, z1.sy AS sy1
  FROM (SELECT * FROM cells WHERE z = 0) z0
  CROSS JOIN (SELECT * FROM cells WHERE z = 1) z1
)
SELECT n0, n1,
       CAST(sx0 * 1000000 // n0 AS BIGINT) AS uptake0_ppm,
       CAST(sx1 * 1000000 // n1 AS BIGINT) AS uptake1_ppm,
       CAST(floor((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0)
                  * 1000.0 + 0.5) AS BIGINT) AS reduced_form_milli_cents,
       CAST(floor((CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0)
                  * 1e6 + 0.5) AS BIGINT) AS first_stage_micro,
       CASE WHEN abs(CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0) > 0
            THEN CAST(floor(
                   (CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0)
                   / (CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0)
                   * 1000.0 + 0.5) AS BIGINT)
       END AS wald_late_milli_cents
FROM j
"""

# --------------------------------------------------------------------------
# E521–E522 — IVF-PQ composite index, perplexity pruning
# --------------------------------------------------------------------------

# E521 — IVF-PQ: full replay (assignment → residual → codebook argmin
# → compressed MIP scoring with fixed-order subspace addition).
QUERIES["ivfpq_topk"] = similarity.ivfpq_topk
_PQ_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_PQ_DOT_DD = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " p -> p[1] * p[2]))"
)
ORACLES["ivfpq_topk"] = f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
), cents AS MATERIALIZED (
  SELECT vec_id AS cell_id, embedding AS cent FROM emb WHERE vec_id < 16
), asg AS MATERIALIZED (
  SELECT vec_id, cell, list_transform(list_zip(embedding, cent),
           p -> CAST(p[1] AS DOUBLE) - p[2]) AS resid
  FROM (
    SELECT e.vec_id, e.embedding, c.cell_id AS cell, c.cent,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_PQ_DOT.format(a='e.embedding', b='c.cent')} DESC,
                      c.cell_id ASC) AS rn
    FROM emb e CROSS JOIN cents c
  ) WHERE rn = 1
), subs AS MATERIALIZED (
  SELECT vec_id, cell, s.m,
         list_slice(resid, 1 + 16 * s.m, 16 + 16 * s.m) AS rsub
  FROM asg CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS m) s
), books AS MATERIALIZED (
  SELECT m, vec_id - 16 AS code, rsub AS cw
  FROM subs WHERE vec_id >= 16 AND vec_id < 32
), coded AS MATERIALIZED (
  SELECT vec_id, cell, m, code FROM (
    SELECT s.vec_id, s.cell, s.m, b.code,
           row_number() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY list_sum(list_transform(list_zip(s.rsub, b.cw),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
                      b.code ASC) AS rn
    FROM subs s JOIN books b ON b.m = s.m
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM emb WHERE vec_id < 5
), probes AS MATERIALIZED (
  SELECT query_id, q_emb, cell, cip FROM (
    SELECT q.query_id, q.q_emb, c.cell_id AS cell,
           {_PQ_DOT.format(a='q.q_emb', b='c.cent')} AS cip,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_PQ_DOT.format(a='q.q_emb', b='c.cent')} DESC,
                      c.cell_id ASC) AS pr
    FROM q CROSS JOIN cents c
  ) WHERE pr <= 8
), q_subs AS (
  SELECT query_id, cell, cip, s.m,
         list_transform(
           list_slice(q_emb, 1 + 16 * s.m, 16 + 16 * s.m),
           x -> CAST(x AS DOUBLE)) AS q_sub
  FROM probes CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS m) s
), partials AS (
  SELECT qs.query_id, cd.vec_id AS cand_id, qs.cip,
         max(CASE WHEN qs.m = 0
             THEN {_PQ_DOT_DD.format(a='qs.q_sub', b='b.cw')} END) AS p0,
         max(CASE WHEN qs.m = 1
             THEN {_PQ_DOT_DD.format(a='qs.q_sub', b='b.cw')} END) AS p1,
         max(CASE WHEN qs.m = 2
             THEN {_PQ_DOT_DD.format(a='qs.q_sub', b='b.cw')} END) AS p2,
         max(CASE WHEN qs.m = 3
             THEN {_PQ_DOT_DD.format(a='qs.q_sub', b='b.cw')} END) AS p3
  FROM q_subs qs
  JOIN coded cd ON cd.cell = qs.cell AND cd.m = qs.m
  JOIN books b ON b.m = qs.m AND b.code = cd.code
  WHERE qs.query_id <> cd.vec_id
  GROUP BY qs.query_id, cd.vec_id, qs.cip
), shortlist AS MATERIALIZED (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cip + ((p0 + p1) + (p2 + p3)) DESC, cand_id ASC)
             AS rnk
    FROM partials
  ) WHERE rnk <= 20
), refined AS (
  SELECT s.query_id, s.cand_id,
         {_PQ_DOT.format(a='qe.embedding', b='ce.embedding')} AS score
  FROM shortlist s
  JOIN emb qe ON qe.vec_id = s.query_id
  JOIN emb ce ON ce.vec_id = s.cand_id
), ranked AS (
  SELECT query_id, cand_id, score,
         row_number() OVER (PARTITION BY query_id
           ORDER BY score DESC, cand_id ASC) AS rnk
  FROM refined
)
SELECT query_id, cand_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micro,
       CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 5
"""

# E522 — perplexity pruning: nests the E39 per-doc scorer verbatim.
QUERIES["perplexity_pruning_report"] = corpus.perplexity_pruning_report
ORACLES["perplexity_pruning_report"] = f"""
WITH perdoc AS MATERIALIZED (
{ORACLES["unigram_lm_score"]}
), scored AS (
  SELECT p.doc_id, CAST(p.n_tokens AS BIGINT) AS n_tokens,
         CAST(round(p.avg_logprob * 1000000) AS BIGINT) AS lm_micro,
         p.avg_logprob, d.source
  FROM perdoc p JOIN documents d USING (doc_id)
), cut AS (
  SELECT quantile_cont(avg_logprob, 0.1) AS p10 FROM scored
), flagged AS (
  SELECT s.*, CASE WHEN s.avg_logprob >= c.p10 THEN 1 ELSE 0 END AS keep
  FROM scored s CROSS JOIN cut c
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       CAST(sum(keep) * 1000000 // count(*) AS BIGINT) AS kept_ppm,
       CAST(sum(n_tokens) AS BIGINT) AS tokens,
       CAST(sum(keep * n_tokens) AS BIGINT) AS tokens_kept,
       CAST(sum(lm_micro) // count(*) AS BIGINT) AS mean_lm_before_micro,
       CASE WHEN sum(keep) > 0
            THEN CAST(sum(keep * lm_micro) // sum(keep) AS BIGINT)
       END AS mean_lm_after_micro
FROM flagged GROUP BY source
"""

# --------------------------------------------------------------------------
# EXT E524 (round 10) — REAL WebP-lossless (VP8L) decode gate: the WebP
# twin of E309/E343/E400/E429/E523. The Spark side generates formula
# images with horizontal runs, encodes them through the pure-Python
# VP8L encoder (id-varied SUBTRACT_GREEN / color-cache options, LZ77
# refs firing on the runs) and decodes back through the full container
# + prefix-code + inverse-transform pipeline; VP8L is lossless, so the
# oracle recomputes the 16-bin integer luma histograms straight from
# the generating formula — no byte ever crosses engines, any decode
# defect shifts a bin. Appended AFTER the driver's pinned first-50
# window per the round-7 registry-freeze rule.
# --------------------------------------------------------------------------

from parquet_to_csv_spark.operators import multimodal as _mm524  # noqa: E402

QUERIES["multimodal_webp_decode"] = _mm524.multimodal_webp_decode
ORACLES["multimodal_webp_decode"] = """
WITH imgs AS (
  SELECT t.i AS img_id, 8 + t.i % 5 AS h, 8 + (t.i * 5) % 9 AS w
  FROM unnest(range(0, 16)) AS t(i)
), px AS (
  SELECT img_id, h, w,
         ((x.x // 4) * 40 + img_id * 7) % 256 AS r,
         ((y.y // 2) * 23 + img_id * 11) % 256 AS g,
         ((x.x // 4) + y.y * 3 + img_id) % 256 AS b
  FROM imgs, unnest(range(0, h)) AS y(y), unnest(range(0, w)) AS x(x)
), lm AS (
  SELECT img_id, h, w,
         ((299 * r + 587 * g + 114 * b) // 1000) // 16 AS bin
  FROM px
), hist AS (
  SELECT img_id, h, w, bin, count(*) AS n_px FROM lm GROUP BY 1, 2, 3, 4
), allbins AS (
  SELECT img_id, h, w, b.bin FROM imgs, unnest(range(0, 16)) AS b(bin)
)
SELECT a.img_id, 'vp8l' AS fmt,
       CAST(a.h AS BIGINT) AS height, CAST(a.w AS BIGINT) AS width,
       CAST(a.bin AS BIGINT) AS bin,
       CAST(coalesce(hist.n_px, 0) AS BIGINT) AS n_px
FROM allbins a
LEFT JOIN hist ON a.img_id = hist.img_id AND a.bin = hist.bin
"""
