"""Registry segment 11/13 — mechanically split from the
round-4 plans/registry.py (12k lines). QUERIES insertion order is
load-bearing (the driver's correctness window samples the first 50
entries), so each segment imports its predecessor: importing ANY
segment executes the full prefix in the original order.
"""
from __future__ import annotations

from parquet_to_csv_spark.plans.registry_core import (QUERIES, ORACLES, query)  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts import p10 as _prev_segment  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p01 import (  # noqa: F401
    _EN_SW,
    _TOKS,
    dedup,
    duck_units,
    relational,
    semistruct,
    similarity,
    text,
    timeops,
)
from parquet_to_csv_spark.plans.registry_parts.p02 import corpus  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p03 import _sketch, mlmetrics  # noqa: F401

ORACLES["interleave_audit"] = """
WITH d AS (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS mk FROM documents
), r AS (
  SELECT doc_id, source, row_number() OVER (ORDER BY mk, doc_id) AS rn,
         count(*) OVER () AS n
  FROM d
), pairs AS (
  SELECT a.source, CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS same
  FROM r a JOIN r b ON b.rn = a.rn + 1
), adj AS (
  SELECT source, count(*) AS n_pairs_from, sum(same) AS n_same
  FROM pairs GROUP BY 1
), per_src AS (
  SELECT source, rn, n, row_number() OVER (PARTITION BY source ORDER BY rn) AS sr
  FROM r
), runs AS (
  SELECT source, max(run_len) AS max_run FROM (
    SELECT source, rn - sr AS island, count(*) AS run_len
    FROM per_src GROUP BY source, rn - sr
  ) GROUP BY 1
), counts AS (
  SELECT source, count(*) AS n_docs, max(n) AS n FROM per_src GROUP BY 1
)
SELECT c.source, CAST(c.n_docs AS BIGINT) AS n_docs,
       CAST(coalesce(a.n_pairs_from, 0) AS BIGINT) AS n_pairs_from,
       CAST(coalesce(a.n_same, 0) AS BIGINT) AS n_adjacent_same,
       CAST(CASE WHEN coalesce(a.n_pairs_from, 0) > 0
                 THEN coalesce(a.n_same, 0) * 1000000 // a.n_pairs_from
                 ELSE 0 END AS BIGINT) AS same_ppm,
       CAST((c.n_docs - 1) * 1000000 // (c.n - 1) AS BIGINT) AS expected_ppm,
       CAST(ru.max_run AS BIGINT) AS max_run
FROM counts c
LEFT JOIN adj a USING (source)
JOIN runs ru USING (source)
"""


# --------------------------------------------------------------------------
# EXT E345 — batch padding efficiency (length-grouped batching)
# --------------------------------------------------------------------------

QUERIES["batch_padding_efficiency"] = corpus.batch_padding_efficiency
ORACLES["batch_padding_efficiency"] = f"""
WITH d AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
), arr AS (
  SELECT n_tokens, (row_number() OVER (ORDER BY doc_id) - 1) // 32 AS batch
  FROM d
), srt AS (
  SELECT n_tokens,
         (row_number() OVER (ORDER BY n_tokens, doc_id) - 1) // 32 AS batch
  FROM d
), agg_a AS (
  SELECT batch, count(*) AS n_b, max(n_tokens) AS mx, sum(n_tokens) AS real
  FROM arr GROUP BY 1
), agg_s AS (
  SELECT batch, count(*) AS n_b, max(n_tokens) AS mx, sum(n_tokens) AS real
  FROM srt GROUP BY 1
), rows_a AS (
  SELECT 'arrival' AS strategy, CAST(count(*) AS BIGINT) AS n_batches,
         CAST(sum(real) AS BIGINT) AS real_tokens,
         CAST(sum(n_b * mx) AS BIGINT) AS padded_tokens
  FROM agg_a
), rows_s AS (
  SELECT 'length_sorted' AS strategy, CAST(count(*) AS BIGINT) AS n_batches,
         CAST(sum(real) AS BIGINT) AS real_tokens,
         CAST(sum(n_b * mx) AS BIGINT) AS padded_tokens
  FROM agg_s
), u AS (
  SELECT * FROM rows_a UNION ALL SELECT * FROM rows_s
)
SELECT strategy, n_batches, real_tokens, padded_tokens,
       CAST((padded_tokens - real_tokens) * 1000000 // padded_tokens
            AS BIGINT) AS waste_ppm
FROM u
"""


# --------------------------------------------------------------------------
# EXT E346 — Bradley-Terry source-preference fit (iterative; oracle
# unrolls the 6 Zermelo rounds with AS MATERIALIZED per round)
# --------------------------------------------------------------------------

QUERIES["bradley_terry_sources"] = mlmetrics.bradley_terry_sources
ORACLES["bradley_terry_sources"] = f"""
WITH d AS (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS mk,
         len(list_distinct({_TOKS})) * 1000000 // len({_TOKS}) AS q
  FROM documents
  WHERE len({_TOKS}) > 0
), r AS (
  SELECT doc_id, source, q, row_number() OVER (ORDER BY mk, doc_id) AS rn
  FROM d
), m AS (
  SELECT a.source AS src_a, b.source AS src_b, a.q AS q, b.q AS q_b,
         a.doc_id AS doc_id, b.doc_id AS id_b
  FROM r a JOIN r b ON b.rn = a.rn + 1
  WHERE a.source <> b.source
), pr AS MATERIALIZED (
  SELECT i, j, count(*) AS n_ij, CAST(sum(win) AS BIGINT) AS w_ij FROM (
    SELECT src_a AS i, src_b AS j,
           CASE WHEN q > q_b OR (q = q_b AND doc_id < id_b)
                THEN 1 ELSE 0 END AS win
    FROM m
    UNION ALL
    SELECT src_b, src_a,
           CASE WHEN q_b > q OR (q_b = q AND id_b < doc_id)
                THEN 1 ELSE 0 END
    FROM m
  ) GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT i, CAST(sum(n_ij) AS BIGINT) AS n_matches,
         CAST(sum(w_ij) AS BIGINT) AS n_wins
  FROM pr GROUP BY 1
), ns AS (
  SELECT count(*) AS n_src FROM tot
), s0 AS MATERIALIZED (
  SELECT i, CAST(1000000 AS BIGINT) AS s FROM tot
), d1 AS MATERIALIZED (
  SELECT pr.i, sum(pr.n_ij * 1000000000000 // (si.s + sj.s)) AS den
  FROM pr JOIN s0 si ON si.i = pr.i JOIN s0 sj ON sj.i = pr.j
  GROUP BY 1
), r1 AS MATERIALIZED (
  SELECT t.i, t.n_wins * 1000000000000 // d1.den AS raw
  FROM tot t JOIN d1 ON d1.i = t.i
), s1 AS MATERIALIZED (
  SELECT r1.i,
         greatest(CAST(r1.raw * ns.n_src * 1000000
                       // (SELECT sum(raw) FROM r1) AS BIGINT),
                  1) AS s
  FROM r1, ns
), d2 AS MATERIALIZED (
  SELECT pr.i, sum(pr.n_ij * 1000000000000 // (si.s + sj.s)) AS den
  FROM pr JOIN s1 si ON si.i = pr.i JOIN s1 sj ON sj.i = pr.j
  GROUP BY 1
), r2 AS MATERIALIZED (
  SELECT t.i, t.n_wins * 1000000000000 // d2.den AS raw
  FROM tot t JOIN d2 ON d2.i = t.i
), s2 AS MATERIALIZED (
  SELECT r2.i,
         greatest(CAST(r2.raw * ns.n_src * 1000000
                       // (SELECT sum(raw) FROM r2) AS BIGINT),
                  1) AS s
  FROM r2, ns
), d3 AS MATERIALIZED (
  SELECT pr.i, sum(pr.n_ij * 1000000000000 // (si.s + sj.s)) AS den
  FROM pr JOIN s2 si ON si.i = pr.i JOIN s2 sj ON sj.i = pr.j
  GROUP BY 1
), r3 AS MATERIALIZED (
  SELECT t.i, t.n_wins * 1000000000000 // d3.den AS raw
  FROM tot t JOIN d3 ON d3.i = t.i
), s3 AS MATERIALIZED (
  SELECT r3.i,
         greatest(CAST(r3.raw * ns.n_src * 1000000
                       // (SELECT sum(raw) FROM r3) AS BIGINT),
                  1) AS s
  FROM r3, ns
), d4 AS MATERIALIZED (
  SELECT pr.i, sum(pr.n_ij * 1000000000000 // (si.s + sj.s)) AS den
  FROM pr JOIN s3 si ON si.i = pr.i JOIN s3 sj ON sj.i = pr.j
  GROUP BY 1
), r4 AS MATERIALIZED (
  SELECT t.i, t.n_wins * 1000000000000 // d4.den AS raw
  FROM tot t JOIN d4 ON d4.i = t.i
), s4 AS MATERIALIZED (
  SELECT r4.i,
         greatest(CAST(r4.raw * ns.n_src * 1000000
                       // (SELECT sum(raw) FROM r4) AS BIGINT),
                  1) AS s
  FROM r4, ns
), d5 AS MATERIALIZED (
  SELECT pr.i, sum(pr.n_ij * 1000000000000 // (si.s + sj.s)) AS den
  FROM pr JOIN s4 si ON si.i = pr.i JOIN s4 sj ON sj.i = pr.j
  GROUP BY 1
), r5 AS MATERIALIZED (
  SELECT t.i, t.n_wins * 1000000000000 // d5.den AS raw
  FROM tot t JOIN d5 ON d5.i = t.i
), s5 AS MATERIALIZED (
  SELECT r5.i,
         greatest(CAST(r5.raw * ns.n_src * 1000000
                       // (SELECT sum(raw) FROM r5) AS BIGINT),
                  1) AS s
  FROM r5, ns
), d6 AS MATERIALIZED (
  SELECT pr.i, sum(pr.n_ij * 1000000000000 // (si.s + sj.s)) AS den
  FROM pr JOIN s5 si ON si.i = pr.i JOIN s5 sj ON sj.i = pr.j
  GROUP BY 1
), r6 AS MATERIALIZED (
  SELECT t.i, t.n_wins * 1000000000000 // d6.den AS raw
  FROM tot t JOIN d6 ON d6.i = t.i
), s6 AS MATERIALIZED (
  SELECT r6.i,
         greatest(CAST(r6.raw * ns.n_src * 1000000
                       // (SELECT sum(raw) FROM r6) AS BIGINT),
                  1) AS s
  FROM r6, ns
)
SELECT t.i AS source,
       CAST(t.n_matches AS BIGINT) AS n_matches,
       CAST(t.n_wins AS BIGINT) AS n_wins,
       CAST(s6.s AS BIGINT) AS strength_micro,
       CAST(row_number() OVER (ORDER BY s6.s DESC, t.i ASC) AS INTEGER)
         AS rank
FROM tot t JOIN s6 ON s6.i = t.i
"""


# --------------------------------------------------------------------------
# EXT E347 — similarity-weighted PageRank (rides the materialized edges)
# --------------------------------------------------------------------------

QUERIES["weighted_pagerank"] = dedup.weighted_pagerank
ORACLES["weighted_pagerank"] = f"""
WITH t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(round(round(len(list_intersect(a.toks, b.toks))
               / CAST(len(list_distinct(list_concat(a.toks, b.toks)))
                      AS DOUBLE), 4) * 10000) AS BIGINT) AS w
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.8
), edges AS (
  SELECT doc_a AS src, doc_b AS dst, w FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst, w FROM pairs
), nodes AS (
  SELECT src AS v, CAST(sum(w) AS BIGINT) AS wdeg FROM edges GROUP BY src
), pr0 AS (
  SELECT v, wdeg, 1000000000::BIGINT AS pr FROM nodes
), c1 AS (
  SELECT e.dst, CAST(sum((p.pr * e.w) // p.wdeg) AS BIGINT) AS inc
  FROM pr0 p JOIN edges e ON p.v = e.src GROUP BY e.dst
), pr1 AS (
  SELECT n.v, n.wdeg,
         CAST(150000000 + (85 * coalesce(c1.inc, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN c1 ON n.v = c1.dst
), c2 AS (
  SELECT e.dst, CAST(sum((p.pr * e.w) // p.wdeg) AS BIGINT) AS inc
  FROM pr1 p JOIN edges e ON p.v = e.src GROUP BY e.dst
), pr2 AS (
  SELECT n.v, n.wdeg,
         CAST(150000000 + (85 * coalesce(c2.inc, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN c2 ON n.v = c2.dst
)
SELECT v AS doc_id, wdeg, pr AS pr_ppb FROM pr2
"""


# --------------------------------------------------------------------------
# EXT E349 — shard-placement rebalance cost (rendezvous vs modulo)
# --------------------------------------------------------------------------

QUERIES["shard_rebalance_report"] = corpus.shard_rebalance_report
ORACLES["shard_rebalance_report"] = """
WITH d AS (
  SELECT doc_id FROM documents
), grid AS (
  SELECT s FROM unnest(generate_series(0, 4)) AS t(s)
), scored AS (
  SELECT doc_id, s, md5(doc_id || ':' || s) AS hk FROM d, grid
), old AS (
  SELECT doc_id, max_by(s, hk) AS shard_old FROM scored WHERE s < 4 GROUP BY 1
), neu AS (
  SELECT doc_id, max_by(s, hk) AS shard_new FROM scored GROUP BY 1
), hrw AS (
  SELECT 'rendezvous' AS strategy,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN shard_old <> shard_new THEN 1 ELSE 0 END)
              AS BIGINT) AS n_moved
  FROM old JOIN neu USING (doc_id)
), mod_ AS (
  SELECT 'mod' AS strategy,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN doc_id % 4 <> doc_id % 5 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_moved
  FROM d
), share_h AS (
  SELECT CAST(max(n) * 1000000 // sum(n) AS BIGINT) AS max_share_ppm
  FROM (SELECT shard_new, count(*) AS n FROM neu GROUP BY 1)
), share_m AS (
  SELECT CAST(max(n) * 1000000 // sum(n) AS BIGINT) AS max_share_ppm
  FROM (SELECT doc_id % 5 AS sh, count(*) AS n FROM d GROUP BY 1)
)
SELECT strategy, n_docs, n_moved,
       CAST(n_moved * 1000000 // n_docs AS BIGINT) AS moved_ppm,
       share_h.max_share_ppm
FROM hrw, share_h
UNION ALL
SELECT strategy, n_docs, n_moved,
       CAST(n_moved * 1000000 // n_docs AS BIGINT) AS moved_ppm,
       share_m.max_share_ppm
FROM mod_, share_m
"""


# --------------------------------------------------------------------------
# EXT E350 — isotonic (PAV) calibration map over the reliability bins
# (exact minmax formula on the tiny bins relation; reuses the verified
# calibration_bins oracle as a subquery, like E342)
# --------------------------------------------------------------------------

QUERIES["isotonic_calibration"] = text.isotonic_calibration
ORACLES["isotonic_calibration"] = f"""
WITH bins AS (
{ORACLES["calibration_bins"]}
), g AS (
  SELECT bin, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_pos AS BIGINT) AS n_pos,
         CAST(pos_rate_ppm AS BIGINT) AS pos_rate_ppm,
         CAST(mean_score_e4 AS BIGINT) AS mean_score_e4
  FROM bins
), spans AS (
  SELECT a.bin AS j, b.bin AS k,
         CAST(sum(m.n_docs) AS BIGINT) AS cnt,
         CAST(sum(m.n_pos) AS BIGINT) AS pos,
         CAST(sum(m.n_pos) AS DOUBLE) / CAST(sum(m.n_docs) AS DOUBLE) AS avg
  FROM g a
  JOIN g b ON a.bin <= b.bin
  JOIN g m ON m.bin BETWEEN a.bin AND b.bin
  GROUP BY 1, 2
), tri AS (
  SELECT g.bin, s.j, s.k, s.cnt, s.pos, s.avg
  FROM g, spans s
  WHERE s.j <= g.bin AND s.k >= g.bin
), inner_ AS (
  SELECT bin, j, min(avg) AS mn,
         min_by(pos, avg) AS mn_pos, min_by(cnt, avg) AS mn_cnt
  FROM tri GROUP BY 1, 2
), fit AS (
  SELECT bin, max_by(mn_pos, mn) AS f_pos, max_by(mn_cnt, mn) AS f_cnt
  FROM inner_ GROUP BY 1
)
SELECT g.bin, g.n_docs, g.pos_rate_ppm, g.mean_score_e4,
       CAST(f.f_pos * 1000000 // f.f_cnt AS BIGINT) AS iso_ppm,
       CAST(CASE WHEN f.f_pos * 1000000 // f.f_cnt <> g.pos_rate_ppm
                 THEN 1 ELSE 0 END AS INTEGER) AS pooled
FROM g JOIN fit f ON f.bin = g.bin
"""


# --------------------------------------------------------------------------
# EXT E352 — incremental near-dup edge maintenance. The oracle is the
# FULL rebuild (the verified ngram_jaccard_pairs SQL): incremental
# base-union-delta must equal recompute, pair for pair.
# --------------------------------------------------------------------------

QUERIES["incremental_neardup_edges"] = dedup.incremental_neardup_edges
ORACLES["incremental_neardup_edges"] = ORACLES["ngram_jaccard_pairs"]


# --------------------------------------------------------------------------
# EXT E353 — multi-epoch shuffle decorrelation (exact Spearman in ppm)
# --------------------------------------------------------------------------

QUERIES["epoch_shuffle_decorrelation"] = corpus.epoch_shuffle_decorrelation
ORACLES["epoch_shuffle_decorrelation"] = """
WITH d AS (
  SELECT doc_id FROM documents
), r0 AS (
  SELECT doc_id, row_number() OVER (
           ORDER BY md5(doc_id || ':' || 'e0'), doc_id) AS r
  FROM d
), r1 AS (
  SELECT doc_id, row_number() OVER (
           ORDER BY md5(doc_id || ':' || 'e1'), doc_id) AS r
  FROM d
), p00 AS (
  SELECT 'e0~e0' AS pair, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum((a.r - b.r) * (a.r - b.r)) AS BIGINT) AS sum_d2,
         CAST(max(abs(a.r - b.r)) AS BIGINT) AS max_displacement
  FROM r0 a JOIN r0 b USING (doc_id)
), p01 AS (
  SELECT 'e0~e1' AS pair, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum((a.r - b.r) * (a.r - b.r)) AS BIGINT) AS sum_d2,
         CAST(max(abs(a.r - b.r)) AS BIGINT) AS max_displacement
  FROM r0 a JOIN r1 b USING (doc_id)
), u AS (
  SELECT * FROM p00 UNION ALL SELECT * FROM p01
)
SELECT pair, n_docs, sum_d2,
       CAST(1000000 - 6 * CAST(sum_d2 AS HUGEINT) * 1000000
            // (CAST(n_docs AS HUGEINT) * n_docs * n_docs - n_docs) AS BIGINT) AS rho_ppm,
       max_displacement
FROM u
"""


# --------------------------------------------------------------------------
# EXT E354 — continuous x categorical MI via exact quantile binning
# --------------------------------------------------------------------------

QUERIES["value_hour_mi"] = mlmetrics.value_hour_mi
ORACLES["value_hour_mi"] = f"""
WITH ev AS (
  SELECT event_id, {duck_units("value", 2)} AS cents,
         (epoch_us(ts) // 3600000000) % 24 AS hour
  FROM events
), tiled AS (
  SELECT ntile(10) OVER (ORDER BY cents, event_id) AS decile, hour
  FROM ev
), cells AS (
  SELECT decile, hour, CAST(count(*) AS BIGINT) AS c
  FROM tiled GROUP BY 1, 2
), dm AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS r FROM tiled GROUP BY 1
), hm AS (
  SELECT hour, CAST(count(*) AS BIGINT) AS s FROM tiled GROUP BY 1
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM tiled
)
SELECT cells.decile, cells.hour, cells.c,
       CAST((dm.r * hm.s) // n.n AS BIGINT) AS expected,
       CAST(round(ln(CAST(cells.c AS DOUBLE) * CAST(n.n AS DOUBLE)
            / (CAST(dm.r AS DOUBLE) * CAST(hm.s AS DOUBLE))) * 1000000)
         AS BIGINT) AS pmi_micro,
       CAST(cells.c * CAST(round(ln(CAST(cells.c AS DOUBLE)
            * CAST(n.n AS DOUBLE) / (CAST(dm.r AS DOUBLE)
            * CAST(hm.s AS DOUBLE))) * 1000000) AS BIGINT)
         AS BIGINT) AS mi_contrib_micro
FROM cells JOIN dm USING (decile) JOIN hm USING (hour) CROSS JOIN n
"""


# --------------------------------------------------------------------------
# EXT E355 — 1-bit minwise-hash estimator calibration (md5-ring
# permutations, engine-exact; pairs = the near-dup relation at its
# 0.5 build floor)
# --------------------------------------------------------------------------

QUERIES["bbit_minhash_calibration"] = _sketch.bbit_minhash_calibration
ORACLES["bbit_minhash_calibration"] = f"""
WITH t AS (
  SELECT doc_id, lang, source, {_TOKS} AS toks FROM documents
), tok AS (
  SELECT doc_id, lang, source, list_distinct(toks) AS dtoks FROM t
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, greatest(len(toks)-3, 0)+1),
           i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]))) AS grams
  FROM t
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM tok a JOIN tok b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.dtoks, b.dtoks))
        / CAST(len(list_distinct(list_concat(a.dtoks, b.dtoks)))
               AS DOUBLE), 4) >= 0.5
), gx AS (
  SELECT doc_id, unnest(grams) AS gr FROM g
), bits AS (
  SELECT doc_id, pp.p,
         ascii(substring(min(md5(gr || ':' || pp.p)), 32, 1)) % 2 AS b
  FROM gx, unnest(range(0, 16)) AS pp(p)
  GROUP BY 1, 2
), agree AS (
  SELECT ba.doc_id AS doc_a, bb.doc_id AS doc_b,
         sum(CASE WHEN ba.b = bb.b THEN 1 ELSE 0 END) AS agree
  FROM bits ba JOIN bits bb ON ba.p = bb.p AND ba.doc_id < bb.doc_id
  JOIN pairs ON pairs.doc_a = ba.doc_id AND pairs.doc_b = bb.doc_id
  GROUP BY 1, 2
), scored AS (
  SELECT p.doc_a, p.doc_b, a.agree,
         len(list_intersect(ga.grams, gb.grams)) * 1000
           // (len(ga.grams) + len(gb.grams)
               - len(list_intersect(ga.grams, gb.grams))) AS exact_milli
  FROM pairs p
  JOIN agree a ON a.doc_a = p.doc_a AND a.doc_b = p.doc_b
  JOIN g ga ON ga.doc_id = p.doc_a
  JOIN g gb ON gb.doc_id = p.doc_b
)
SELECT CAST(exact_milli // 50 AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(exact_milli) // count(*) AS BIGINT) AS mean_exact_milli,
       CAST(sum(agree * 2000 // 16 - 1000) // count(*) AS BIGINT)
         AS mean_est_milli
FROM scored
GROUP BY 1
"""


# --------------------------------------------------------------------------
# EXT E356 — recommender coverage/concentration audit (reuses the
# verified E135 relation as a subquery)
# --------------------------------------------------------------------------

QUERIES["rec_coverage_audit"] = relational.rec_coverage_audit
ORACLES["rec_coverage_audit"] = f"""
WITH recs AS (
{ORACLES["item_item_cosine_topk"]}
), slots AS (
  SELECT neighbor, CAST(count(*) AS BIGINT) AS n_slots
  FROM recs GROUP BY 1
), srcs AS (
  SELECT CAST(count(DISTINCT item) AS BIGINT) AS n_source_items FROM recs
), tgts AS (
  SELECT CAST(count(*) AS BIGINT) AS n_target_items,
         CAST(sum(n_slots) AS BIGINT) AS n_total_slots
  FROM slots
), cat AS (
  SELECT CAST(count(*) AS BIGINT) AS n_catalog FROM part
), tiled AS (
  SELECT n_slots, ntile(10) OVER (ORDER BY n_slots, neighbor) AS dec
  FROM slots
), top_share AS (
  SELECT CAST(sum(CASE WHEN dec = 10 THEN n_slots END) * 1000000
              // sum(n_slots) AS BIGINT) AS top_decile_share_ppm
  FROM tiled
), ranked AS (
  SELECT n_slots,
         row_number() OVER (ORDER BY n_slots, neighbor) AS rn,
         count(*) OVER () AS nn
  FROM slots
), gini AS (
  SELECT CAST((2 * sum(rn * n_slots) - (max(nn) + 1) * sum(n_slots))
              * 1000000 // (max(nn) * sum(n_slots)) AS BIGINT)
           AS gini_slots_ppm
  FROM ranked
)
SELECT cat.n_catalog, srcs.n_source_items,
       CAST(srcs.n_source_items * 1000000 // cat.n_catalog AS BIGINT)
         AS source_coverage_ppm,
       tgts.n_target_items,
       CAST(tgts.n_target_items * 1000000 // cat.n_catalog AS BIGINT)
         AS target_coverage_ppm,
       tgts.n_total_slots, top_share.top_decile_share_ppm,
       gini.gini_slots_ppm
FROM srcs, tgts, cat, top_share, gini
"""


# --------------------------------------------------------------------------
# EXT E357 — cross-document attention exposure of packed sequences
# --------------------------------------------------------------------------

QUERIES["packing_attention_stats"] = corpus.packing_attention_stats
ORACLES["packing_attention_stats"] = f"""
WITH d AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
), nz AS (
  SELECT doc_id, n_tokens FROM d WHERE n_tokens > 0
), packed AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM nz
), spans AS (
  SELECT doc_id, n_tokens, cum_before,
         cum_before // 256 AS s0,
         (cum_before + n_tokens - 1) // 256 AS s1
  FROM packed
), segs AS (
  SELECT t.s,
         least((t.s + 1) * 256, cum_before + n_tokens)
           - greatest(t.s * 256, cum_before) AS seg
  FROM spans, unnest(generate_series(s0, s1)) AS t(s)
), per_seq AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n_docs_in_seq,
         CAST(sum(seg) AS BIGINT) AS len,
         CAST(sum(seg * (seg + 1) // 2) AS BIGINT) AS within_pairs
  FROM segs GROUP BY 1
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_seqs,
         CAST(sum(len * (len + 1) // 2) AS BIGINT) AS causal_pairs,
         CAST(sum(len * (len + 1) // 2 - within_pairs) AS BIGINT)
           AS cross_pairs,
         CAST(sum(n_docs_in_seq) * 1000 // count(*) AS BIGINT)
           AS mean_docs_per_seq_milli,
         CAST(max(n_docs_in_seq) AS BIGINT) AS max_docs_in_seq
  FROM per_seq
)
SELECT n_seqs, causal_pairs, cross_pairs,
       CAST(cross_pairs * 1000000 // causal_pairs AS BIGINT) AS cross_ppm,
       mean_docs_per_seq_milli, max_docs_in_seq
FROM agg
"""


# --------------------------------------------------------------------------
# EXT E358 — in-batch duplicate collision audit (contrastive training)
# --------------------------------------------------------------------------

QUERIES["inbatch_collision_audit"] = corpus.inbatch_collision_audit
ORACLES["inbatch_collision_audit"] = f"""
WITH t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks)))
               AS DOUBLE), 4) >= 0.8
), d AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS mk FROM documents
), arr AS (
  SELECT doc_id, (row_number() OVER (ORDER BY doc_id) - 1) // 32 AS batch
  FROM d
), shf AS (
  SELECT doc_id, (row_number() OVER (ORDER BY mk, doc_id) - 1) // 32 AS batch
  FROM d
), hit_a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN ba.batch = bb.batch THEN 1 ELSE 0 END)
              AS BIGINT) AS n_collisions
  FROM pairs JOIN arr ba ON ba.doc_id = pairs.doc_a
             JOIN arr bb ON bb.doc_id = pairs.doc_b
), hit_s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN ba.batch = bb.batch THEN 1 ELSE 0 END)
              AS BIGINT) AS n_collisions
  FROM pairs JOIN shf ba ON ba.doc_id = pairs.doc_a
             JOIN shf bb ON bb.doc_id = pairs.doc_b
), exp_a AS (
  SELECT CAST(sum(n_b * (n_b - 1)) * 1000000
              // (sum(n_b) * (sum(n_b) - 1)) AS BIGINT) AS expected_ppm
  FROM (SELECT batch, count(*) AS n_b FROM arr GROUP BY 1)
), exp_s AS (
  SELECT CAST(sum(n_b * (n_b - 1)) * 1000000
              // (sum(n_b) * (sum(n_b) - 1)) AS BIGINT) AS expected_ppm
  FROM (SELECT batch, count(*) AS n_b FROM shf GROUP BY 1)
)
SELECT 'arrival' AS strategy, n_pairs, n_collisions,
       CAST(CASE WHEN n_pairs > 0
                 THEN n_collisions * 1000000 // n_pairs ELSE 0 END
            AS BIGINT) AS collision_ppm,
       expected_ppm
FROM hit_a, exp_a
UNION ALL
SELECT 'md5_shuffle', n_pairs, n_collisions,
       CAST(CASE WHEN n_pairs > 0
                 THEN n_collisions * 1000000 // n_pairs ELSE 0 END
            AS BIGINT) AS collision_ppm,
       expected_ppm
FROM hit_s, exp_s
"""


# --------------------------------------------------------------------------
# EXT E359 — code-switching / mixed-language audit (half-score gap)
# --------------------------------------------------------------------------

QUERIES["code_switching_audit"] = text.code_switching_audit
ORACLES["code_switching_audit"] = f"""
WITH t AS (
  SELECT doc_id, source, {_TOKS} AS toks FROM documents
), halves AS (
  SELECT doc_id, source, len(toks) AS n_tokens,
         list_slice(toks, 1, len(toks) // 2) AS h1,
         list_slice(toks, len(toks) // 2 + 1, len(toks)) AS h2
  FROM t
), scored AS (
  SELECT source, n_tokens,
         CASE WHEN len(list_distinct(h1)) > 0
              THEN CAST(floor(len(list_intersect(list_distinct(h1), {_EN_SW}))
                   * 10000 / len(list_distinct(h1))) AS BIGINT)
              ELSE 0 END AS s1_e4,
         CASE WHEN len(list_distinct(h2)) > 0
              THEN CAST(floor(len(list_intersect(list_distinct(h2), {_EN_SW}))
                   * 10000 / len(list_distinct(h2))) AS BIGINT)
              ELSE 0 END AS s2_e4
  FROM halves
), g AS (
  SELECT source, n_tokens, abs(s1_e4 - s2_e4) AS gap_e4 FROM scored
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN gap_e4 >= 500 AND n_tokens >= 8
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
       CAST(sum(CASE WHEN gap_e4 >= 500 AND n_tokens >= 8
                     THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         AS mixed_ppm,
       CAST(sum(gap_e4) // count(*) AS BIGINT) AS mean_gap_e4
FROM g GROUP BY 1
"""


# --------------------------------------------------------------------------
# EXT E360 — adversarial-validation split audit (train/val separability)
# --------------------------------------------------------------------------

QUERIES["adversarial_split_audit"] = corpus.adversarial_split_audit
ORACLES["adversarial_split_audit"] = f"""
WITH base AS (
  SELECT doc_id, list_distinct({_TOKS}) AS toks,
         CAST(substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
              IN ('0','2','4','6','8','a','c','e') AS INT) AS side_r,
         CAST(substr(md5(source), 32, 1)
              IN ('0','2','4','6','8','a','c','e') AS INT) AS side_s
  FROM documents
), tot AS (
  SELECT sum(side_r) AS na_r, sum(1 - side_r) AS nb_r,
         sum(side_s) AS na_s, sum(1 - side_s) AS nb_s
  FROM base
), lng AS (
  SELECT doc_id, side_r, side_s, unnest(toks) AS token FROM base
), tok_c AS (
  SELECT token, sum(side_r) AS ca_r, sum(1 - side_r) AS cb_r,
         sum(side_s) AS ca_s, sum(1 - side_s) AS cb_s
  FROM lng GROUP BY 1
), tok_w AS (
  SELECT token,
         ca_r * 1000000 // na_r - cb_r * 1000000 // nb_r AS w_r,
         ca_s * 1000000 // na_s - cb_s * 1000000 // nb_s AS w_s
  FROM tok_c CROSS JOIN tot
), per_doc AS (
  SELECT l.doc_id, l.side_r, l.side_s, count(*) AS n_toks,
         sum(w.w_r) AS sw_r, sum(w.w_s) AS sw_s
  FROM lng l JOIN tok_w w USING (token)
  GROUP BY 1, 2, 3
), scored AS (
  SELECT 'random' AS strategy, side_r AS is_pos,
         sw_r // n_toks // 100 AS score_q FROM per_doc
  UNION ALL
  SELECT 'by_source', side_s, sw_s // n_toks // 100 FROM per_doc
), by_score AS (
  SELECT strategy, score_q, count(*) AS n, sum(is_pos) AS p
  FROM scored GROUP BY 1, 2
), ranked AS (
  SELECT strategy, n, p,
         sum(n) OVER (PARTITION BY strategy ORDER BY score_q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_n
  FROM by_score
)
SELECT strategy, CAST(sum(p) AS BIGINT) AS pos_n,
       CAST(sum(n) - sum(p) AS BIGINT) AS neg_n,
       CAST(CASE WHEN sum(p) > 0 AND sum(n) - sum(p) > 0 THEN
         (sum(p * (2 * (cum_n - n) + n + 1)) - sum(p) * (sum(p) + 1))
           * 1000000 // (2 * sum(p) * (sum(n) - sum(p)))
         ELSE 500000 END AS BIGINT) AS auc_ppm
FROM ranked GROUP BY strategy
"""


# --------------------------------------------------------------------------
# EXT E361 — Brier score decomposition (summary of E121's bins)
# --------------------------------------------------------------------------

QUERIES["brier_decomposition"] = text.brier_decomposition
ORACLES["brier_decomposition"] = f"""
WITH bins AS (
{ORACLES["calibration_bins"]}
), g AS (
  SELECT bin, n_docs, n_pos, CAST(pos_rate_ppm AS BIGINT) AS pos_rate_ppm,
         CAST(mean_score_e4 * 100 AS BIGINT) AS conf_ppm
  FROM bins
), tot AS (
  SELECT sum(n_pos) * 1000000 // sum(n_docs) AS obar_ppm FROM g
)
SELECT CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(n_docs * (conf_ppm - pos_rate_ppm)
                * (conf_ppm - pos_rate_ppm))
            // sum(n_docs) // 1000000 AS BIGINT) AS reliability_micro,
       CAST(sum(n_docs * (pos_rate_ppm - obar_ppm)
                * (pos_rate_ppm - obar_ppm))
            // sum(n_docs) // 1000000 AS BIGINT) AS resolution_micro,
       CAST(min(obar_ppm * (1000000 - obar_ppm) // 1000000) AS BIGINT)
         AS uncertainty_micro,
       CAST(sum(n_docs * (conf_ppm - pos_rate_ppm)
                * (conf_ppm - pos_rate_ppm)) // sum(n_docs) // 1000000
            - sum(n_docs * (pos_rate_ppm - obar_ppm)
                  * (pos_rate_ppm - obar_ppm)) // sum(n_docs) // 1000000
            + min(obar_ppm * (1000000 - obar_ppm) // 1000000) AS BIGINT)
         AS brier_binned_micro
FROM g CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# EXT E362 — Mann–Kendall monotone-trend test (daily value series)
# --------------------------------------------------------------------------

_MK_Z = (
    "CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)"
    " / sqrt(CAST(var18 AS DOUBLE) / 18.0)"
    " WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)"
    " / sqrt(CAST(var18 AS DOUBLE) / 18.0)"
    " ELSE 0.0 END"
)
QUERIES["mann_kendall_trend"] = timeops.mann_kendall_trend
ORACLES["mann_kendall_trend"] = f"""
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         sum({duck_units("value", 2)}) AS y
  FROM events GROUP BY 1
), s_stat AS (
  SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM daily a JOIN daily b ON a.day < b.day
), n_agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM daily
), ties AS (
  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie_sum
  FROM (SELECT count(*) AS t FROM daily GROUP BY y)
), g AS (
  SELECT n, s, CAST(n * (n - 1) * (2 * n + 5) - tie_sum AS BIGINT) AS var18
  FROM s_stat CROSS JOIN n_agg CROSS JOIN ties
)
SELECT n, s, var18, {_MK_Z} AS z,
       CASE WHEN {_MK_Z} > 1.96 THEN 'increasing'
            WHEN {_MK_Z} < -1.96 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM g
"""


# ---------------------------------------------------------------------------
# E363/E364 — relational reshaping surfaces: PIVOT (the long→wide twin
# of E326's UNPIVOT) and GROUPING SETS with grouping() provenance.
# ---------------------------------------------------------------------------

QUERIES["pivot_status_revenue"] = relational.pivot_status_revenue
ORACLES["pivot_status_revenue"] = f"""
WITH o AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS ym,
         o_orderstatus, {duck_units("o_totalprice", 2)} AS cents
  FROM orders
), wide AS (
  SELECT ym,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN cents END), 0) AS BIGINT) AS f_cents,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN cents END), 0) AS BIGINT) AS o_cents,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN cents END), 0) AS BIGINT) AS p_cents
  FROM o GROUP BY ym
)
SELECT ym, f_cents, o_cents, p_cents,
       f_cents + o_cents + p_cents AS total_cents
FROM wide
"""

QUERIES["grouping_sets_revenue"] = relational.grouping_sets_revenue
ORACLES["grouping_sets_revenue"] = f"""
WITH base AS (
  SELECT r.r_name AS region, o.o_orderpriority AS priority,
         {duck_units("o.o_totalprice", 2)} AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT region, priority,
       CAST(grouping(region) AS INTEGER) AS g_region,
       CAST(grouping(priority) AS INTEGER) AS g_priority,
       CAST(sum(cents) AS BIGINT) AS rev_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM base
GROUP BY GROUPING SETS ((region, priority), (region), ())
"""


# ---------------------------------------------------------------------------
# E365 — rank-biased overlap between the exact and IVF rankings.
# p = 1/2 makes every truncated-RBO weight an exact dyadic rational:
# D = 2^5 · lcm(1..5) = 1920; a matched pair first co-present at depth
# m = max(rank_exact, rank_ivf) contributes the integer suffix weight
# W_m = Σ_{d=m..5} D/(d·2^d) → [1322, 362, 122, 42, 12]. The oracle
# reuses the two verified ranking oracles verbatim as CTEs.
# ---------------------------------------------------------------------------

QUERIES["rbo_rank_agreement"] = similarity.rbo_rank_agreement
ORACLES["rbo_rank_agreement"] = f"""
WITH exact_r AS (
{ORACLES["cosine_topk"]}
), approx_r AS (
{ORACLES["ivf_topk"]}
), matched AS (
  SELECT e.query_id, greatest(e.rnk, a.rnk) AS m
  FROM exact_r e JOIN approx_r a USING (query_id, cand_id)
), agg AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(CASE m WHEN 1 THEN 1322 WHEN 2 THEN 362 WHEN 3 THEN 122
                         WHEN 4 THEN 42 WHEN 5 THEN 12 END) AS BIGINT)
           AS rbo_num
  FROM matched GROUP BY query_id
)
SELECT q.query_id,
       coalesce(n_common, CAST(0 AS BIGINT)) AS n_common,
       coalesce(rbo_num, CAST(0 AS BIGINT)) AS rbo_num,
       round(coalesce(rbo_num, CAST(0 AS BIGINT)) / 1920.0, 6) AS rbo
FROM (SELECT DISTINCT query_id FROM exact_r) q LEFT JOIN agg USING (query_id)
"""


# ---------------------------------------------------------------------------
# E366 — vocab-size coverage ladder (the V-sweep pricing curve; E122
# prices one vocab). The oracle may sort the whole vocab single-node;
# the Spark plan uses the banded global rank.
# ---------------------------------------------------------------------------

QUERIES["vocab_coverage_ladder"] = text.vocab_coverage_ladder
ORACLES["vocab_coverage_ladder"] = f"""
WITH counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({_TOKS}) AS token FROM documents) GROUP BY 1
), ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, token) AS rnk
  FROM counts
), tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM counts),
ladder AS (SELECT unnest([100, 300, 1000, 3000, 10000]) AS v)
SELECT CAST(v AS INTEGER) AS vocab_size,
       CAST(coalesce(sum(CASE WHEN rnk <= v THEN 1 END), 0) AS BIGINT)
         AS vocab_used,
       CAST(coalesce(sum(CASE WHEN rnk <= v THEN freq END), 0) AS BIGINT)
         AS covered_tokens,
       total AS total_tokens,
       CAST(coalesce(sum(CASE WHEN rnk <= v THEN freq END), 0) AS BIGINT)
         * 1000000 // total AS coverage_ppm
FROM ladder CROSS JOIN ranked CROSS JOIN tot
GROUP BY v, total
"""


# ---------------------------------------------------------------------------
# E367 — Spark 4 VARIANT ingestion surface. The oracle checks the
# typed PROMOTION (plain columns out), not the binary encoding.
# ---------------------------------------------------------------------------

QUERIES["variant_promotion"] = semistruct.variant_promotion
ORACLES["variant_promotion"] = """
WITH v AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS INTEGER) AS k,
         CASE WHEN props IS NULL OR NOT json_valid(props)
              THEN 1 ELSE 0 END AS unparsed
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(k) AS BIGINT) AS n_k,
       CAST(coalesce(sum(CASE WHEN k % 2 = 0 THEN 1 END), 0) AS BIGINT)
         AS n_k_even,
       CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
       CAST(max(k) AS INTEGER) AS max_k,
       CAST(sum(unparsed) AS BIGINT) AS n_unparsed
FROM v GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# E368 — recursive-CTE BFS hop distance over the near-dup graph.
# Both engines run a GENUINE recursive CTE (Spark 4.1 WITH RECURSIVE /
# DuckDB WITH RECURSIVE), UNION ALL + hop cap; min(hop) collapses path
# multiplicity so the two engines' different frontier orders can't
# show. pairs/edges are MATERIALIZED: DuckDB re-inlines
# multiply-referenced CTEs and the recursion re-reads edges per round.
# ---------------------------------------------------------------------------

QUERIES["neardup_reach_hops"] = dedup.neardup_reach_hops
ORACLES["neardup_reach_hops"] = f"""
WITH RECURSIVE pairs AS MATERIALIZED (
{ORACLES["ngram_jaccard_pairs"]}
), edges AS MATERIALIZED (
  SELECT doc_a AS u, doc_b AS w FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS w FROM pairs
), seeds AS (
  SELECT doc_id FROM documents WHERE {corpus.duck_md5_bucket("doc_id", 20)} = 0
), r(doc_id, hop) AS (
  SELECT doc_id, 0 FROM seeds
  UNION ALL
  SELECT DISTINCT e.w, r.hop + 1 FROM r JOIN edges e ON e.u = r.doc_id
  WHERE r.hop < 3
), m AS (
  SELECT doc_id, CAST(min(hop) AS INTEGER) AS hop FROM r GROUP BY doc_id
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
SELECT hop, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) * 1000000 // n AS BIGINT) AS share_ppm
FROM m CROSS JOIN tot GROUP BY hop, n
"""


# ---------------------------------------------------------------------------
# E369 — cumulative-gains / lift table over exact customer deciles.
# lift is ONE correctly rounded IEEE division of two exact ppm ints.
# ---------------------------------------------------------------------------

QUERIES["lift_gains_table"] = mlmetrics.lift_gains_table
ORACLES["lift_gains_table"] = f"""
WITH c AS (
  SELECT c_custkey, -({duck_units("c_acctbal", 2)}) AS neg_cents FROM customer
), t AS (
  SELECT c_custkey, ntile(10) OVER (ORDER BY neg_cents, c_custkey) AS decile
  FROM c
), rv AS (
  SELECT o_custkey,
         CAST(sum({duck_units("o_totalprice", 2)}) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
), per AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(coalesce(sum(rev_cents), 0) AS BIGINT) AS rev_cents
  FROM t LEFT JOIN rv ON t.c_custkey = rv.o_custkey GROUP BY decile
), cum AS (
  SELECT decile, n_customers, rev_cents,
         CAST(sum(n_customers) OVER (ORDER BY decile) AS BIGINT)
           AS cum_customers,
         CAST(sum(rev_cents) OVER (ORDER BY decile) AS BIGINT)
           AS cum_rev_cents
  FROM per
), tot AS (
  SELECT CAST(sum(n_customers) AS BIGINT) AS tn,
         CAST(sum(rev_cents) AS BIGINT) AS tr
  FROM per
)
SELECT CAST(decile AS INTEGER) AS decile, n_customers, rev_cents,
       cum_customers, cum_rev_cents,
       CAST(cum_rev_cents * 1000000 // tr AS BIGINT) AS gain_ppm,
       CAST(cum_customers * 1000000 // tn AS BIGINT) AS pop_ppm,
       round(CAST(cum_rev_cents * 1000000 // tr AS DOUBLE)
             / CAST(cum_customers * 1000000 // tn AS DOUBLE), 6) AS lift
FROM cum CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# E370 — native-XML round-trip: same digest oracle as the other
# source/sink identities (the oracle sees the ORIGINAL parquet; only a
# lossless write+read can match it).
# ---------------------------------------------------------------------------

QUERIES["xml_roundtrip"] = corpus.xml_roundtrip
ORACLES["xml_roundtrip"] = """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_md5
FROM documents GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# E371 — Python STREAMING DataSource drain: the oracle replays the
# drained stream from the generator formulas over range(n) — any
# offset-advance bug (skipped range, double-read, replay drift) breaks
# the exact sums.
# ---------------------------------------------------------------------------

from parquet_to_csv_spark.sources import pysource as _pysource  # noqa: E402

QUERIES["python_stream_digest"] = _pysource.python_stream_digest
