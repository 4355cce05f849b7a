"""Registry segment 10/13 — mechanically split from the
round-4 plans/registry.py (12k lines). QUERIES insertion order is
load-bearing (the driver's correctness window samples the first 50
entries), so each segment imports its predecessor: importing ANY
segment executes the full prefix in the original order.
"""
from __future__ import annotations

from parquet_to_csv_spark.plans.registry_core import (QUERIES, ORACLES, query)  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts import p09 as _prev_segment  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p01 import (  # noqa: F401
    _TOKS,
    _duck_cos,
    dedup,
    duck_sum_2dp,
    duck_units,
    text,
    timeops,
)
from parquet_to_csv_spark.plans.registry_parts.p02 import _sim, _stream, corpus  # noqa: F401
from parquet_to_csv_spark.plans.registry_parts.p03 import mlmetrics  # noqa: F401

ORACLES["multimodal_real_decode"] = """
WITH imgs AS (
  SELECT t.i AS img_id, 8 + t.i % 5 AS h, 8 + (t.i * 3) % 7 AS w
  FROM unnest(range(0, 16)) AS t(i)
), px AS (
  SELECT img_id, h, w,
         (x.x * 255) // (w - 1) AS r,
         (y.y * 255) // (h - 1) AS g,
         ((x.x + y.y) * 255) // (w + h - 2) AS b
  FROM imgs, unnest(range(0, h)) AS y(y), unnest(range(0, w)) AS x(x)
), lm AS (
  SELECT img_id, h, w,
         ((299 * r + 587 * g + 114 * b) // 1000) // 16 AS bin
  FROM px
), hist AS (
  SELECT img_id, h, w, bin, count(*) AS n_px FROM lm GROUP BY 1, 2, 3, 4
), allbins AS (
  SELECT img_id, h, w, b.bin FROM imgs, unnest(range(0, 16)) AS b(bin)
), png_rows AS (
  SELECT a.img_id, 'png' AS fmt,
         CAST(a.h AS BIGINT) AS height, CAST(a.w AS BIGINT) AS width,
         CAST(a.bin AS BIGINT) AS bin,
         CAST(coalesce(hist.n_px, 0) AS BIGINT) AS n_px
  FROM allbins a
  LEFT JOIN hist ON a.img_id = hist.img_id AND a.bin = hist.bin
), jimgs AS (
  SELECT t.i AS img_id, 1 + t.i % 3 AS ht, 1 + (t.i * 2) % 4 AS wt
  FROM unnest(range(0, 16)) AS t(i)
), jtiles AS (
  -- each 8x8 tile is constant: 64 pixels of the formula value
  SELECT img_id, ht, wt,
         ((img_id * 37 + ty.ty * 19 + tx.tx * 7) % 256) // 16 AS bin
  FROM jimgs, unnest(range(0, ht)) AS ty(ty), unnest(range(0, wt)) AS tx(tx)
), jhist AS (
  SELECT img_id, ht, wt, bin, 64 * count(*) AS n_px
  FROM jtiles GROUP BY 1, 2, 3, 4
), jallbins AS (
  SELECT img_id, ht, wt, b.bin FROM jimgs, unnest(range(0, 16)) AS b(bin)
), jpeg_rows AS (
  SELECT a.img_id, 'jpeg' AS fmt,
         CAST(a.ht * 8 AS BIGINT) AS height, CAST(a.wt * 8 AS BIGINT) AS width,
         CAST(a.bin AS BIGINT) AS bin,
         CAST(coalesce(jhist.n_px, 0) AS BIGINT) AS n_px
  FROM jallbins a
  LEFT JOIN jhist ON a.img_id = jhist.img_id AND a.bin = jhist.bin
), pimgs AS (
  -- progressive-JPEG leg (round 5): distinct constant-tile formula,
  -- decoded through the full SOF2 scan-accumulation pipeline
  SELECT t.i AS img_id, 1 + (t.i * 3) % 3 AS ht, 1 + t.i % 4 AS wt
  FROM unnest(range(0, 16)) AS t(i)
), ptiles AS (
  SELECT img_id, ht, wt,
         ((img_id * 53 + ty.ty * 11 + tx.tx * 29) % 256) // 16 AS bin
  FROM pimgs, unnest(range(0, ht)) AS ty(ty), unnest(range(0, wt)) AS tx(tx)
), phist AS (
  SELECT img_id, ht, wt, bin, 64 * count(*) AS n_px
  FROM ptiles GROUP BY 1, 2, 3, 4
), pallbins AS (
  SELECT img_id, ht, wt, b.bin FROM pimgs, unnest(range(0, 16)) AS b(bin)
), jpegp_rows AS (
  SELECT a.img_id, 'jpegp' AS fmt,
         CAST(a.ht * 8 AS BIGINT) AS height, CAST(a.wt * 8 AS BIGINT) AS width,
         CAST(a.bin AS BIGINT) AS bin,
         CAST(coalesce(phist.n_px, 0) AS BIGINT) AS n_px
  FROM pallbins a
  LEFT JOIN phist ON a.img_id = phist.img_id AND a.bin = phist.bin
)
SELECT * FROM png_rows UNION ALL SELECT * FROM jpeg_rows
UNION ALL SELECT * FROM jpegp_rows
"""


# --------------------------------------------------------------------------
# EXT E310 — duplication provenance forest
# --------------------------------------------------------------------------

QUERIES["dup_provenance"] = dedup.dup_provenance
ORACLES["dup_provenance"] = f"""
WITH RECURSIVE t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), prs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(len(list_intersect(a.toks, b.toks))
               / CAST(len(list_distinct(list_concat(a.toks, b.toks)))
                      AS DOUBLE), 4) AS jaccard
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.8
), edges AS (
  SELECT doc_a AS u, doc_b AS w FROM prs
  UNION
  SELECT doc_b AS u, doc_a AS w FROM prs
), cc(v, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, cc.l FROM edges e JOIN cc ON cc.v = e.w
), cl AS (
  SELECT v AS doc_id, min(l) AS cluster_id FROM cc GROUP BY v
), par AS (
  SELECT doc_id, earlier_doc AS parent_id, jaccard AS parent_jaccard FROM (
    SELECT doc_b AS doc_id, doc_a AS earlier_doc, jaccard,
           row_number() OVER (PARTITION BY doc_b
                              ORDER BY jaccard DESC, doc_a ASC) AS rn
    FROM prs
  ) WHERE rn = 1
)
SELECT cl.doc_id, cl.cluster_id,
       CAST(CASE WHEN cl.doc_id = cl.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_root,
       par.parent_id, par.parent_jaccard
FROM cl LEFT JOIN par USING (doc_id)
"""


# --------------------------------------------------------------------------
# EXT E311 — quality-first curriculum admission (token budget)
# --------------------------------------------------------------------------

QUERIES["curriculum_schedule"] = corpus.curriculum_schedule
ORACLES["curriculum_schedule"] = f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         coalesce(CASE WHEN len({_TOKS}) > 0
           THEN CAST(round(len(list_distinct({_TOKS}))
                     / CAST(len({_TOKS}) AS DOUBLE) * 10000) AS BIGINT)
           END, -1) AS q
  FROM documents
), b AS (
  SELECT sum(n_tokens) * 600000 // 1000000 AS budget FROM base
), cum AS (
  SELECT doc_id, source, n_tokens, q,
         sum(n_tokens) OVER (ORDER BY q DESC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS c
  FROM base
), adm AS (
  SELECT source, n_tokens, q, c <= (SELECT budget FROM b) AS admitted FROM cum
)
SELECT source,
       CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       CAST(sum(CASE WHEN admitted THEN n_tokens ELSE 0 END) AS BIGINT)
         AS tokens_admitted,
       min(CASE WHEN admitted THEN q END) AS cutoff_q
FROM adm GROUP BY 1
"""


# --------------------------------------------------------------------------
# EXT E312 — split-conformal prediction intervals
# --------------------------------------------------------------------------

QUERIES["conformal_intervals"] = mlmetrics.conformal_intervals
ORACLES["conformal_intervals"] = f"""
WITH base AS (
  SELECT o.o_orderkey, {duck_units('o.o_totalprice', 2)} AS cents,
         c.c_mktsegment, (((instr('0123456789abcdef', substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1) * 4096 + (instr('0123456789abcdef', substring(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1) * 256 + (instr('0123456789abcdef', substring(md5(CAST(o_orderkey AS VARCHAR)), 3, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(md5(CAST(o_orderkey AS VARCHAR)), 4, 1)) - 1) * 1) % 3) AS fold
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), pred AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_train,
         CAST(sum(cents) // count(*) AS BIGINT) AS pred_cents
  FROM base WHERE fold = 0 GROUP BY 1
), cal AS (
  SELECT b.c_mktsegment, b.o_orderkey, abs(b.cents - p.pred_cents) AS r
  FROM base b JOIN pred p USING (c_mktsegment) WHERE b.fold = 1
), nc AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cal FROM cal GROUP BY 1
), kk AS (
  SELECT c_mktsegment, n_cal,
         least(((n_cal + 1) * 900000 + 999999) // 1000000, n_cal) AS k
  FROM nc
), qh AS (
  SELECT c_mktsegment, CAST(r AS BIGINT) AS qhat_cents FROM (
    SELECT c.c_mktsegment, c.r,
           row_number() OVER (PARTITION BY c.c_mktsegment
                              ORDER BY c.r, c.o_orderkey) AS rn,
           kk.k
    FROM cal c JOIN kk USING (c_mktsegment)
  ) WHERE rn = k
), ev AS (
  SELECT b.c_mktsegment, CAST(count(*) AS BIGINT) AS n_eval,
         CAST(sum(CASE WHEN abs(b.cents - p.pred_cents) <= q.qhat_cents
                  THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
           AS coverage_ppm
  FROM base b JOIN pred p USING (c_mktsegment) JOIN qh q USING (c_mktsegment)
  WHERE b.fold = 2 GROUP BY 1
)
SELECT p.c_mktsegment, p.n_train, p.pred_cents, nc.n_cal,
       qh.qhat_cents, ev.n_eval, ev.coverage_ppm
FROM pred p JOIN nc USING (c_mktsegment) JOIN qh USING (c_mktsegment)
JOIN ev USING (c_mktsegment)
"""


# --------------------------------------------------------------------------
# EXT E314 — Markov removal-effect attribution (unrolled fixed point)
# --------------------------------------------------------------------------

def _markov_oracle(n_iter: int = 12) -> str:
    """Symbolically unrolls the same fixed-point iterations the Spark
    builder runs — no recursive CTE (aggregation inside recursion is
    engine-dependent), just n_iter generated CTE stages."""
    chans = ["view", "click", "signup", "error"]
    scen_union = "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS scenario, cur,\n"
        f"         CASE WHEN nxt = '{c}' THEN 'NULL' ELSE nxt END AS nxt, p\n"
        f"  FROM pm WHERE cur <> '{c}'"
        for c in chans
    )
    head = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
), seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
  FROM ev
), conv AS (
  SELECT user_id, min(rn) AS crn FROM seq WHERE event_type = 'purchase' GROUP BY 1
), kept AS (
  SELECT s.user_id, s.rn,
         CASE WHEN s.event_type = 'purchase' THEN 'CONV' ELSE s.event_type END AS st
  FROM seq s LEFT JOIN conv c USING (user_id)
  WHERE c.crn IS NULL OR s.rn <= c.crn
), steps AS (
  SELECT user_id, st,
         coalesce(lead(st) OVER (PARTITION BY user_id ORDER BY rn), 'NULL') AS nxt
  FROM kept
), st2 AS (
  SELECT st AS cur, nxt FROM steps WHERE st <> 'CONV'
  UNION ALL
  SELECT 'START' AS cur, st AS nxt FROM kept WHERE rn = 1
), trans AS (
  SELECT cur, nxt, count(*) AS n FROM st2 GROUP BY 1, 2
), outs AS (
  SELECT cur, sum(n) AS out_n FROM trans GROUP BY 1
), pm AS (
  SELECT t.cur, t.nxt, t.n / CAST(o.out_n AS DOUBLE) AS p
  FROM trans t JOIN outs o USING (cur)
), scen0 AS (
  SELECT 'base' AS scenario, cur, nxt, p FROM pm
  UNION ALL
{scen_union}
), scen AS MATERIALIZED (
  SELECT scenario, cur, nxt,
         CAST(sum(CAST(p AS DECIMAL(38,18))) AS DOUBLE) AS p
  FROM scen0 GROUP BY 1, 2, 3
), scenarios AS MATERIALIZED (
  SELECT DISTINCT scenario FROM scen
), p0 AS (
  SELECT scenario, 'CONV' AS state, CAST(1.0 AS DOUBLE) AS pv FROM scenarios
)"""
    its = []
    for k in range(1, n_iter + 1):
        its.append(f""", p{k} AS MATERIALIZED (
  SELECT s.scenario, s.cur AS state,
         CAST(sum(CAST(s.p * q.pv AS DECIMAL(38,18))) AS DOUBLE) AS pv
  FROM scen s JOIN p{k - 1} q ON s.scenario = q.scenario AND s.nxt = q.state
  GROUP BY 1, 2
  UNION ALL
  SELECT scenario, 'CONV' AS state, CAST(1.0 AS DOUBLE) AS pv FROM scenarios
)""")
    tail = f""", pstart AS (
  SELECT scenario, pv FROM p{n_iter} WHERE state = 'START'
), base AS (
  SELECT pv AS p_base FROM pstart WHERE scenario = 'base'
), eff AS (
  SELECT ps.scenario AS channel, b.p_base, ps.pv AS p_removed,
         CAST(floor(greatest(b.p_base - ps.pv, 0.0) * 1000000) AS BIGINT)
           AS effect_micro
  FROM pstart ps CROSS JOIN base b WHERE ps.scenario <> 'base'
), tot AS (
  SELECT sum(effect_micro) AS tot_eff FROM eff
)
SELECT channel, round(p_base, 6) AS p_conv_base,
       round(p_removed, 6) AS p_conv_removed, effect_micro,
       CAST(CASE WHEN t.tot_eff > 0
            THEN effect_micro * 1000000 // t.tot_eff ELSE 0 END AS BIGINT) AS share_ppm
FROM eff CROSS JOIN tot t
"""
    return head + "".join(its) + tail


QUERIES["markov_attribution"] = timeops.markov_attribution
ORACLES["markov_attribution"] = _markov_oracle(12)


# --------------------------------------------------------------------------
# EXT E318 — similarity-ordered layout benefit
# --------------------------------------------------------------------------

QUERIES["similarity_order_benefit"] = corpus.similarity_order_benefit
ORACLES["similarity_order_benefit"] = f"""
WITH t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks,
         len(list_distinct({_TOKS})) AS sz,
         list_aggregate(list_distinct({_TOKS}), 'min') AS mintok
  FROM documents
), arr AS (
  SELECT lang, source, toks,
         lead(toks) OVER (PARTITION BY lang, source ORDER BY doc_id) AS nt
  FROM t
), srt AS (
  SELECT lang, source, toks,
         lead(toks) OVER (PARTITION BY lang, source
                          ORDER BY sz, mintok, doc_id) AS nt
  FROM t
), ja AS (
  SELECT lang, source,
         CAST(round(len(list_intersect(toks, nt))
              / CAST(len(toks) + len(nt) - len(list_intersect(toks, nt))
                     AS DOUBLE) * 1000) AS BIGINT) AS j
  FROM arr WHERE nt IS NOT NULL
), js AS (
  SELECT lang, source,
         CAST(round(len(list_intersect(toks, nt))
              / CAST(len(toks) + len(nt) - len(list_intersect(toks, nt))
                     AS DOUBLE) * 1000) AS BIGINT) AS j
  FROM srt WHERE nt IS NOT NULL
), aa AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(j) // count(*) AS BIGINT) AS adj_milli_arrival
  FROM ja GROUP BY 1, 2
), bb AS (
  SELECT lang, source, CAST(sum(j) // count(*) AS BIGINT) AS adj_milli_sorted
  FROM js GROUP BY 1, 2
)
SELECT aa.lang, aa.source, aa.n_pairs, aa.adj_milli_arrival,
       bb.adj_milli_sorted,
       bb.adj_milli_sorted - aa.adj_milli_arrival AS gain_milli
FROM aa JOIN bb USING (lang, source)
"""


# --------------------------------------------------------------------------
# EXT E319 — Python DataSource (Spark 4 API): synthetic corpus source
# --------------------------------------------------------------------------

from parquet_to_csv_spark.sources.pysource import synthetic_source_digest as _synth_digest  # noqa: E402

# The oracle derives the digest from the CONTENT FORMULAS over
# range(n) — the Python source never runs in DuckDB, so any
# generation defect (partition boundaries, modulo drift) breaks a value.
QUERIES["synthetic_source_digest"] = _synth_digest
ORACLES["synthetic_source_digest"] = """
WITH g AS (
  SELECT t.i AS doc_id,
         (['en','de','fr','es','pt'])[(t.i % 5) + 1] AS lang,
         'synth' || CAST(t.i % 4 AS VARCHAR) AS source,
         t.i % 13 + 3 AS reps,
         t.i % 97 AS tokid
  FROM unnest(range(0, 20000)) AS t(i)
)
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(reps) AS BIGINT) AS token_mass,
       CAST(count(DISTINCT 'tok' || CAST(tokid AS VARCHAR) || '_'
                  || CAST(reps AS VARCHAR)) AS BIGINT) AS n_distinct_texts,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(sum(reps * length('tok' || CAST(tokid AS VARCHAR)) + reps - 1)
            AS BIGINT) AS char_mass
FROM g GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# EXT E320 — custom stateful streaming anomaly detector
# --------------------------------------------------------------------------

QUERIES["streaming_anomaly_drain"] = _stream.anomaly_drain_query
ORACLES["streaming_anomaly_drain"] = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), pre AS (
  SELECT user_id, event_id, us, cents,
         count(*) OVER w AS n_prior,
         coalesce(sum(cents) OVER w, 0) AS sc_prior,
         coalesce(sum(cents * cents) OVER w, 0) AS ss_prior
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), flagged AS (
  SELECT user_id, us,
         CASE WHEN n_prior >= 5
              AND (cents * n_prior - sc_prior) * (cents * n_prior - sc_prior)
                  > 9 * (n_prior * ss_prior - sc_prior * sc_prior)
              THEN 1 ELSE 0 END AS flag
  FROM pre
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(flag) AS BIGINT) AS n_flagged,
       CAST(coalesce(max(CASE WHEN flag = 1 THEN us END), 0) AS BIGINT)
         AS last_flag_us
FROM flagged GROUP BY 1
"""


# --------------------------------------------------------------------------
# EXT E323-E324 — purged time-series CV folds, leave-one-source-out influence
# --------------------------------------------------------------------------

QUERIES["purged_timeseries_folds"] = mlmetrics.purged_timeseries_folds
ORACLES["purged_timeseries_folds"] = """
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS day FROM events
), days AS (
  SELECT day, count(*) AS n FROM ev GROUP BY 1
), tot AS (
  SELECT sum(n) AS n_total FROM days
), cum AS (
  SELECT day, n,
         sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS c
  FROM days
), fd AS (
  SELECT day, n,
         CAST(floor((c - 1) * 4 / (SELECT n_total FROM tot)) AS INT) AS fold
  FROM cum
), pf AS (
  SELECT fold, min(day) AS test_start_day, max(day) AS test_end_day,
         CAST(sum(n) AS BIGINT) AS n_test
  FROM fd GROUP BY 1
), tr AS (
  SELECT pf.fold, pf.test_start_day, pf.test_end_day, pf.n_test,
         fd.day AS d, fd.n AS m,
         fd.day < pf.test_start_day - 7 AS in_train,
         fd.day >= pf.test_start_day - 7 AND fd.day < pf.test_start_day AS leaked
  FROM pf CROSS JOIN fd
)
SELECT fold, test_start_day, test_end_day, n_test,
       CAST(sum(CASE WHEN in_train THEN m ELSE 0 END) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN leaked THEN m ELSE 0 END) AS BIGINT) AS n_embargoed,
       CAST(sum(CASE WHEN in_train AND d >= test_start_day THEN m ELSE 0 END)
            AS BIGINT) AS n_leaking_train_rows
FROM tr GROUP BY 1, 2, 3, 4
"""

QUERIES["loo_source_influence"] = mlmetrics.loo_source_influence
ORACLES["loo_source_influence"] = f"""
WITH per AS (
  SELECT source,
         sum(coalesce(CASE WHEN len({_TOKS}) > 0
             THEN CAST(round(len(list_distinct({_TOKS}))
                       / CAST(len({_TOKS}) AS DOUBLE) * 1000000) AS BIGINT)
             END, 0)) AS sr,
         count(*) AS n
  FROM documents GROUP BY 1
), tot AS (
  SELECT sum(sr) AS tsr, sum(n) AS tn FROM per
)
SELECT source, CAST(n AS BIGINT) AS n,
       CAST(tsr // tn AS BIGINT) AS corpus_mean_ppm,
       CAST((tsr - sr) // (tn - n) AS BIGINT) AS loo_mean_ppm,
       CAST((tsr - sr) // (tn - n) - tsr // tn AS BIGINT) AS influence_ppm
FROM per CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# EXT E325 — dynamic-gap sessionization
# --------------------------------------------------------------------------

QUERIES["dynamic_gap_sessions"] = timeops.dynamic_gap_sessions
ORACLES["dynamic_gap_sessions"] = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         CASE WHEN event_type = 'error' THEN 86400000000
              ELSE 259200000000 END AS gap_us
  FROM events
), marked AS (
  SELECT user_id, event_type, us, gap_us,
         max(us + gap_us) OVER (PARTITION BY user_id ORDER BY us
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prior_end
  FROM ev
), bounded AS (
  SELECT user_id, event_type, us, gap_us,
         CASE WHEN prior_end IS NULL OR us >= prior_end THEN 1 ELSE 0 END
           AS is_new
  FROM marked
), sess AS (
  SELECT user_id, event_type, us, gap_us,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY us
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM bounded
)
SELECT user_id,
       CAST(min(us) AS BIGINT) AS sess_start_us,
       CAST(max(us + gap_us) AS BIGINT) AS sess_end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors
FROM sess GROUP BY user_id, sid
"""


# --------------------------------------------------------------------------
# EXT E326 — UNPIVOT (melt) surface: quality signals long-form rollup
# --------------------------------------------------------------------------

QUERIES["quality_signals_long"] = text.quality_signals_long
ORACLES["quality_signals_long"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks, text FROM documents
), wide AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0
              THEN CAST(round(round(len(list_distinct(toks))
                   / CAST(len(toks) AS DOUBLE), 4) * 10000) AS BIGINT) END
           AS uniq_ratio,
         CASE WHEN length(text) > 0
              THEN CAST(round(round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   / CAST(length(text) AS DOUBLE), 4) * 10000) AS BIGINT) END
           AS alpha_ratio,
         CASE WHEN len(toks) > 0
              THEN CAST(round(round(list_sum(list_transform(toks, x -> length(x)))
                   / CAST(len(toks) AS DOUBLE), 4) * 10000) AS BIGINT) END
           AS mean_token_len
  FROM t
), long AS (
  SELECT doc_id, 'uniq_ratio' AS signal, uniq_ratio AS v_4dp FROM wide
  UNION ALL
  SELECT doc_id, 'alpha_ratio', alpha_ratio FROM wide
  UNION ALL
  SELECT doc_id, 'mean_token_len', mean_token_len FROM wide
)
SELECT signal, CAST(count(v_4dp) AS BIGINT) AS n_measured,
       CAST(sum(v_4dp) AS BIGINT) AS sum_4dp,
       CAST(sum(v_4dp) // count(v_4dp) AS BIGINT) AS mean_4dp,
       min(v_4dp) AS min_4dp, max(v_4dp) AS max_4dp
FROM long GROUP BY 1
"""


# --------------------------------------------------------------------------
# EXT E328 — cluster-sampling design effect (ICC / DEFF)
# --------------------------------------------------------------------------

QUERIES["cluster_design_effect"] = mlmetrics.cluster_design_effect
ORACLES["cluster_design_effect"] = f"""
WITH ev AS (
  SELECT event_type, user_id, {duck_units('value', 2)} AS cents FROM events
), pu AS (
  SELECT event_type, user_id, count(*) AS m, sum(cents) AS s,
         sum(cents * cents) AS ss
  FROM ev GROUP BY 1, 2
), g AS (
  SELECT event_type, count(*) AS k, sum(m) AS n, sum(s) AS ts, sum(ss) AS tss,
         CAST(sum(CAST((CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / CAST(m AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           AS sb_raw
  FROM pu GROUP BY 1
), e AS (
  SELECT event_type, k, n, n // k AS mean_cluster_size,
         CAST(tss AS DOUBLE) - sb_raw AS ssw,
         sb_raw - (CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)) / CAST(n AS DOUBLE)
           AS ssb
  FROM g
), f AS (
  SELECT event_type, k, n, mean_cluster_size,
         ssw / CAST(n - k AS DOUBLE) AS msw,
         ssb / CAST(k - 1 AS DOUBLE) AS msb,
         CAST(n AS DOUBLE) / CAST(k AS DOUBLE) AS mbar
  FROM e
)
SELECT event_type, CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       CAST(mean_cluster_size AS BIGINT) AS mean_cluster_size,
       CAST(round((msb - msw) / (msb + (mbar - 1.0) * msw) * 1000000)
            AS BIGINT) AS icc_ppm,
       CAST(round((1.0 + (mbar - 1.0) * (msb - msw)
            / (msb + (mbar - 1.0) * msw)) * 1000000) AS BIGINT) AS deff_ppm,
       round(CAST(n AS DOUBLE) / (1.0 + (mbar - 1.0) * (msb - msw)
            / (msb + (mbar - 1.0) * msw)), 2) AS effective_n
FROM f
"""


# --------------------------------------------------------------------------
# EXT E330 — data-arrival completeness monitor
# --------------------------------------------------------------------------

QUERIES["arrival_completeness"] = timeops.arrival_completeness
ORACLES["arrival_completeness"] = """
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS day FROM events
), daily AS (
  SELECT day, count(*) AS n FROM ev GROUP BY 1
), d AS (
  SELECT day, n, (day + 4) % 7 AS dow FROM daily
), peers AS (
  SELECT a.day, a.dow, a.n, b.day AS o_day, b.n AS o_n
  FROM d a JOIN d b ON a.dow = b.dow AND a.day <> b.day
), ranked AS (
  SELECT day, dow, n, o_n,
         row_number() OVER (PARTITION BY day ORDER BY o_n, o_day) AS rn,
         count(*) OVER (PARTITION BY day) AS cnt
  FROM peers
), med AS (
  SELECT day, dow, n, o_n AS baseline_n FROM ranked
  WHERE rn = (cnt + 1) // 2
)
SELECT day, CAST(dow AS BIGINT) AS dow, CAST(n AS BIGINT) AS n,
       CAST(baseline_n AS BIGINT) AS baseline_n,
       CAST(n * 1000000 // baseline_n AS BIGINT) AS completeness_ppm,
       CAST(CASE WHEN n * 1000000 // baseline_n < 900000 THEN 1 ELSE 0 END
            AS BIGINT) AS alert
FROM med
"""


# --------------------------------------------------------------------------
# EXT E331 — STL-lite seasonal decomposition
# --------------------------------------------------------------------------

QUERIES["stl_lite_decomposition"] = timeops.stl_lite_decomposition
ORACLES["stl_lite_decomposition"] = f"""
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS day, {duck_units('value', 2)} AS cents
  FROM events
), daily AS (
  SELECT day, sum(cents) AS cents FROM ev GROUP BY 1
), t AS (
  SELECT day, cents,
         sum(cents) OVER w // count(cents) OVER w AS trend_cents,
         (day + 4) % 7 AS dow
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), det AS (
  SELECT day, dow, cents, trend_cents, cents - trend_cents AS det FROM t
), seas AS (
  SELECT dow, sum(det) // count(*) AS seasonal_cents FROM det GROUP BY 1
)
SELECT det.day, CAST(det.dow AS BIGINT) AS dow, CAST(det.cents AS BIGINT) AS cents,
       CAST(det.trend_cents AS BIGINT) AS trend_cents,
       CAST(seas.seasonal_cents AS BIGINT) AS seasonal_cents,
       CAST(det.cents - det.trend_cents - seas.seasonal_cents AS BIGINT)
         AS residual_cents
FROM det JOIN seas USING (dow)
"""


# --------------------------------------------------------------------------
# EXT E332 — k-center greedy coreset (farthest-point sampling)
# --------------------------------------------------------------------------

QUERIES["kcenter_coreset"] = _sim.kcenter_coreset
ORACLES["kcenter_coreset"] = f"""
WITH s0 AS MATERIALIZED (
  SELECT CAST(0 AS BIGINT) AS vec_id
), m1 AS MATERIALIZED (
  SELECT e.vec_id, min(1 - ({_duck_cos('e.embedding', 'se.embedding')})) AS md
  FROM embeddings e
  CROSS JOIN (SELECT x.vec_id, x.embedding FROM embeddings x
              JOIN s0 USING (vec_id)) se
  WHERE e.vec_id NOT IN (SELECT vec_id FROM s0)
  GROUP BY e.vec_id
), p1 AS MATERIALIZED (
  SELECT 1 AS pick, vec_id, round(md, 6) AS sel_dist FROM (
    SELECT vec_id, md,
           row_number() OVER (ORDER BY md DESC, vec_id ASC) AS rn
    FROM m1
  ) WHERE rn = 1
), s1 AS MATERIALIZED (
  SELECT vec_id FROM s0 UNION ALL SELECT vec_id FROM p1
), m2 AS MATERIALIZED (
  SELECT e.vec_id, min(1 - ({_duck_cos('e.embedding', 'se.embedding')})) AS md
  FROM embeddings e
  CROSS JOIN (SELECT x.vec_id, x.embedding FROM embeddings x
              JOIN s1 USING (vec_id)) se
  WHERE e.vec_id NOT IN (SELECT vec_id FROM s1)
  GROUP BY e.vec_id
), p2 AS MATERIALIZED (
  SELECT 2 AS pick, vec_id, round(md, 6) AS sel_dist FROM (
    SELECT vec_id, md,
           row_number() OVER (ORDER BY md DESC, vec_id ASC) AS rn
    FROM m2
  ) WHERE rn = 1
), s2 AS MATERIALIZED (
  SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM p2
), m3 AS MATERIALIZED (
  SELECT e.vec_id, min(1 - ({_duck_cos('e.embedding', 'se.embedding')})) AS md
  FROM embeddings e
  CROSS JOIN (SELECT x.vec_id, x.embedding FROM embeddings x
              JOIN s2 USING (vec_id)) se
  WHERE e.vec_id NOT IN (SELECT vec_id FROM s2)
  GROUP BY e.vec_id
), p3 AS MATERIALIZED (
  SELECT 3 AS pick, vec_id, round(md, 6) AS sel_dist FROM (
    SELECT vec_id, md,
           row_number() OVER (ORDER BY md DESC, vec_id ASC) AS rn
    FROM m3
  ) WHERE rn = 1
), s3 AS MATERIALIZED (
  SELECT vec_id FROM s2 UNION ALL SELECT vec_id FROM p3
), m4 AS MATERIALIZED (
  SELECT e.vec_id, min(1 - ({_duck_cos('e.embedding', 'se.embedding')})) AS md
  FROM embeddings e
  CROSS JOIN (SELECT x.vec_id, x.embedding FROM embeddings x
              JOIN s3 USING (vec_id)) se
  WHERE e.vec_id NOT IN (SELECT vec_id FROM s3)
  GROUP BY e.vec_id
), p4 AS MATERIALIZED (
  SELECT 4 AS pick, vec_id, round(md, 6) AS sel_dist FROM (
    SELECT vec_id, md,
           row_number() OVER (ORDER BY md DESC, vec_id ASC) AS rn
    FROM m4
  ) WHERE rn = 1
), s4 AS MATERIALIZED (
  SELECT vec_id FROM s3 UNION ALL SELECT vec_id FROM p4
), m5 AS MATERIALIZED (
  SELECT e.vec_id, min(1 - ({_duck_cos('e.embedding', 'se.embedding')})) AS md
  FROM embeddings e
  CROSS JOIN (SELECT x.vec_id, x.embedding FROM embeddings x
              JOIN s4 USING (vec_id)) se
  WHERE e.vec_id NOT IN (SELECT vec_id FROM s4)
  GROUP BY e.vec_id
), p5 AS MATERIALIZED (
  SELECT 5 AS pick, vec_id, round(md, 6) AS sel_dist FROM (
    SELECT vec_id, md,
           row_number() OVER (ORDER BY md DESC, vec_id ASC) AS rn
    FROM m5
  ) WHERE rn = 1
), s5 AS MATERIALIZED (
  SELECT vec_id FROM s4 UNION ALL SELECT vec_id FROM p5
), m6 AS MATERIALIZED (
  SELECT e.vec_id, min(1 - ({_duck_cos('e.embedding', 'se.embedding')})) AS md
  FROM embeddings e
  CROSS JOIN (SELECT x.vec_id, x.embedding FROM embeddings x
              JOIN s5 USING (vec_id)) se
  WHERE e.vec_id NOT IN (SELECT vec_id FROM s5)
  GROUP BY e.vec_id
), p6 AS MATERIALIZED (
  SELECT 6 AS pick, vec_id, round(md, 6) AS sel_dist FROM (
    SELECT vec_id, md,
           row_number() OVER (ORDER BY md DESC, vec_id ASC) AS rn
    FROM m6
  ) WHERE rn = 1
), s6 AS MATERIALIZED (
  SELECT vec_id FROM s5 UNION ALL SELECT vec_id FROM p6
), m7 AS MATERIALIZED (
  SELECT e.vec_id, min(1 - ({_duck_cos('e.embedding', 'se.embedding')})) AS md
  FROM embeddings e
  CROSS JOIN (SELECT x.vec_id, x.embedding FROM embeddings x
              JOIN s6 USING (vec_id)) se
  WHERE e.vec_id NOT IN (SELECT vec_id FROM s6)
  GROUP BY e.vec_id
), p7 AS MATERIALIZED (
  SELECT 7 AS pick, vec_id, round(md, 6) AS sel_dist FROM (
    SELECT vec_id, md,
           row_number() OVER (ORDER BY md DESC, vec_id ASC) AS rn
    FROM m7
  ) WHERE rn = 1
), s7 AS MATERIALIZED (
  SELECT vec_id FROM s6 UNION ALL SELECT vec_id FROM p7
)
SELECT 0 AS pick, CAST(0 AS BIGINT) AS vec_id, CAST(NULL AS DOUBLE) AS sel_dist
UNION ALL
SELECT pick, vec_id, sel_dist FROM p1
UNION ALL
SELECT pick, vec_id, sel_dist FROM p2
UNION ALL
SELECT pick, vec_id, sel_dist FROM p3
UNION ALL
SELECT pick, vec_id, sel_dist FROM p4
UNION ALL
SELECT pick, vec_id, sel_dist FROM p5
UNION ALL
SELECT pick, vec_id, sel_dist FROM p6
UNION ALL
SELECT pick, vec_id, sel_dist FROM p7
"""


# --------------------------------------------------------------------------
# EXT E333-E334 — growth accounting, count overdispersion
# --------------------------------------------------------------------------

QUERIES["growth_accounting"] = timeops.growth_accounting
ORACLES["growth_accounting"] = """
WITH um AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 // 30 AS mo FROM events
), tagged AS (
  SELECT user_id, mo,
         lag(mo) OVER (PARTITION BY user_id ORDER BY mo) AS prev_mo,
         min(mo) OVER (PARTITION BY user_id ORDER BY mo
                       ROWS UNBOUNDED PRECEDING) AS first_mo
  FROM um
), st AS (
  SELECT mo,
         CASE WHEN mo = first_mo THEN 'new'
              WHEN prev_mo = mo - 1 THEN 'retained'
              ELSE 'resurrected' END AS status
  FROM tagged
), mau AS (
  SELECT mo, count(*) AS mau,
         sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS n_new,
         sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS n_retained,
         sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
           AS n_resurrected
  FROM st GROUP BY 1
)
SELECT a.mo, CAST(a.mau AS BIGINT) AS mau, CAST(a.n_new AS BIGINT) AS n_new,
       CAST(a.n_retained AS BIGINT) AS n_retained,
       CAST(a.n_resurrected AS BIGINT) AS n_resurrected,
       CAST(coalesce(b.mau, 0) - a.n_retained AS BIGINT) AS n_churned
FROM mau a LEFT JOIN mau b ON b.mo = a.mo - 1
"""

QUERIES["count_overdispersion"] = timeops.count_overdispersion
ORACLES["count_overdispersion"] = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, CAST(count(*) AS BIGINT) AS k_days,
       CAST(sum(n) AS BIGINT) AS total,
       CAST(sum(n) // count(*) AS BIGINT) AS mean_daily,
       CAST((count(*) * sum(n * n) - sum(n) * sum(n)) * 1000000
            // (count(*) * sum(n)) AS BIGINT) AS dispersion_ppm
FROM daily GROUP BY 1
"""


# --------------------------------------------------------------------------
# EXT E336 — diagonal-covariance Frechet distance between labels
# --------------------------------------------------------------------------

QUERIES["label_diag_fid"] = _sim.label_diag_fid
ORACLES["label_diag_fid"] = """
WITH emb AS (
  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), comp AS (
  SELECT label, t.pos,
         CAST(sum(CAST(v[t.pos + 1] AS DECIMAL(38,12))) AS DOUBLE) AS s,
         CAST(sum(CAST(v[t.pos + 1] * v[t.pos + 1] AS DECIMAL(38,12)))
              AS DOUBLE) AS ss,
         count(*) AS n
  FROM emb, unnest(range(0, len(v))) AS t(pos)
  GROUP BY 1, 2
), ms AS (
  SELECT label, pos, s / n AS mu,
         sqrt(greatest(ss / n - (s / n) * (s / n), 0.0)) AS sigma
  FROM comp
), pr AS (
  SELECT a.label AS label_a, b.label AS label_b, a.pos,
         (a.mu - b.mu) * (a.mu - b.mu)
         + (a.sigma - b.sigma) * (a.sigma - b.sigma) AS term
  FROM ms a JOIN ms b ON a.pos = b.pos AND a.label < b.label
)
SELECT label_a, label_b,
       round(CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6) AS diag_fid
FROM pr GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# EXT E337 — Lambda backfill parity (batch half ∪ streaming half)
# --------------------------------------------------------------------------

# The oracle is the SINGLE full-range batch aggregation — equality
# proves the batch-backfill + streaming-tail union reconstructs it
# exactly (same windows, same counts, same exact-cents sums).
QUERIES["hybrid_backfill_union"] = _stream.hybrid_backfill_union
ORACLES["hybrid_backfill_union"] = f"""
SELECT (epoch_ms(ts) // 3600000) * 3600000 AS ws_ms,
       event_type,
       count(*) AS n_events,
       {duck_sum_2dp("value", 2)} AS sum_value
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# EXT E338 — MinHash-LSH banding design table
# --------------------------------------------------------------------------

QUERIES["lsh_parameter_advisor"] = dedup.lsh_parameter_advisor
ORACLES["lsh_parameter_advisor"] = """
WITH cfg AS (
  SELECT b.b AS bands, 32 // b.b AS rows_per_band
  FROM (SELECT unnest([2, 4, 8, 16]) AS b) b
), js AS (
  SELECT unnest([50, 60, 70, 80, 90, 95]) AS j_centi
)
SELECT CAST(bands AS INTEGER) AS bands,
       CAST(rows_per_band AS INTEGER) AS rows_per_band,
       CAST(floor(pow(1.0 / bands, 1.0 / rows_per_band) * 1000000) AS BIGINT)
         AS threshold_ppm,
       CAST(j_centi AS INTEGER) AS j_centi,
       CAST(floor((1.0 - pow(1.0 - pow(j_centi / 100.0, CAST(rows_per_band AS DOUBLE)),
                             CAST(bands AS DOUBLE))) * 1000000) AS BIGINT)
         AS p_detect_ppm
FROM cfg CROSS JOIN js
"""


# --------------------------------------------------------------------------
# EXT E339 — dedup savings projection (the business case)
# --------------------------------------------------------------------------

QUERIES["dedup_savings_projection"] = dedup.dedup_savings_projection
ORACLES["dedup_savings_projection"] = f"""
WITH RECURSIVE t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
), prs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.toks, b.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) >= 0.8
), edges AS (
  SELECT doc_a AS u, doc_b AS w FROM prs
  UNION
  SELECT doc_b AS u, doc_a AS w FROM prs
), cc(v, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, cc.l FROM edges e JOIN cc ON cc.v = e.w
), cl AS (
  SELECT v AS doc_id, min(l) AS cluster_id FROM cc GROUP BY v
), tg AS (
  SELECT d.doc_id, d.source,
         CAST(length(d.text) AS BIGINT) AS n_chars,
         CAST(len({_TOKS.replace('text', 'd.text')}) AS BIGINT) AS n_tokens,
         CASE WHEN cl.doc_id IS NOT NULL AND cl.doc_id <> cl.cluster_id
              THEN 1 ELSE 0 END AS gone
  FROM documents d LEFT JOIN cl USING (doc_id)
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(gone) AS BIGINT) AS n_removed,
       CAST(sum(gone) * 1000000 // count(*) AS BIGINT) AS docs_removed_ppm,
       CAST(sum(gone * n_chars) AS BIGINT) AS chars_removed,
       CAST(sum(gone * n_chars) * 1000000 // sum(n_chars) AS BIGINT)
         AS chars_removed_ppm,
       CAST(sum(gone * n_tokens) AS BIGINT) AS tokens_removed,
       CAST(sum(gone * n_tokens) * 1000000 // sum(n_tokens) AS BIGINT)
         AS tokens_removed_ppm
FROM tg GROUP BY 1
"""


# --------------------------------------------------------------------------
# EXT E340 — per-source entropy + compression budget
# --------------------------------------------------------------------------

QUERIES["source_entropy_budget"] = corpus.source_entropy_budget
ORACLES["source_entropy_budget"] = f"""
WITH tf AS (
  SELECT source, unnest({_TOKS}) AS term FROM documents
), c AS (
  SELECT source, term, count(*) AS n FROM tf GROUP BY 1, 2
), tot AS (
  SELECT source, sum(n) AS nn FROM c GROUP BY 1
), j AS (
  SELECT c.source, t.nn,
         c.n * CAST(round(ln(CAST(t.nn AS DOUBLE) / CAST(c.n AS DOUBLE))
                          * 1000000) AS BIGINT) AS contrib
  FROM c JOIN tot t USING (source)
)
SELECT source, CAST(nn AS BIGINT) AS n_tokens,
       CAST(sum(contrib) // nn AS BIGINT) AS entropy_micronats_per_token,
       CAST(sum(contrib) // 693147 // 8 AS BIGINT) AS min_compressed_bytes
FROM j GROUP BY source, nn
"""


# --------------------------------------------------------------------------
# EXT E341 — empirical-Bayes shrunk conversion rates
# --------------------------------------------------------------------------

QUERIES["shrunk_conversion_rates"] = mlmetrics.shrunk_conversion_rates
ORACLES["shrunk_conversion_rates"] = """
WITH per AS (
  SELECT user_id, count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
  FROM events GROUP BY 1
), g AS (
  SELECT sum(x) * 1000000 // sum(n) AS global_ppm FROM per
)
SELECT user_id, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
       CAST(x * 1000000 // n AS BIGINT) AS raw_ppm,
       CAST((x * 1000000 + 20 * g.global_ppm) // (n + 20) AS BIGINT)
         AS shrunk_ppm
FROM per CROSS JOIN g
ORDER BY shrunk_ppm DESC, user_id ASC
LIMIT 15
"""


# --------------------------------------------------------------------------
# EXT E342 — expected calibration error (summary of E121's bins)
# --------------------------------------------------------------------------

# reuse the verified bins oracle as a subquery (pre-cast version is
# fine: the arithmetic below re-derives exact integers)
QUERIES["expected_calibration_error"] = text.expected_calibration_error
ORACLES["expected_calibration_error"] = f"""
WITH bins AS (
{ORACLES["calibration_bins"]}
), g AS (
  SELECT bin, n_docs, CAST(pos_rate_ppm AS BIGINT) AS pos_rate_ppm,
         CAST(mean_score_e4 * 100 AS BIGINT) AS conf_ppm
  FROM bins
), r AS (
  SELECT bin, n_docs, pos_rate_ppm, conf_ppm,
         abs(pos_rate_ppm - conf_ppm) AS gap,
         pos_rate_ppm - conf_ppm AS signed_gap,
         row_number() OVER (ORDER BY abs(pos_rate_ppm - conf_ppm) DESC,
                            bin ASC) AS rn
  FROM g
)
SELECT CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(n_docs * gap) // sum(n_docs) AS BIGINT) AS ece_ppm,
       CAST(max(gap) AS BIGINT) AS max_gap_ppm,
       CAST(max(CASE WHEN rn = 1 THEN bin END) AS INTEGER) AS worst_bin,
       CAST(max(CASE WHEN rn = 1 THEN signed_gap END) AS BIGINT)
         AS worst_bin_signed_gap_ppm
FROM r
"""


# --------------------------------------------------------------------------
# EXT E344 — deterministic-interleave (training order) audit
# --------------------------------------------------------------------------

QUERIES["interleave_audit"] = corpus.interleave_audit
