"""Round-3 curation tier: semantic dedup, DSIR, hard negatives,
mixture allocation, secret scan, leakage-safe split.

The driver-gate oracles pin exact values vs DuckDB; these tests pin
the SEMANTIC properties each operator exists for (the things a value
hash can't articulate: no straddling pairs, budget feasibility,
target-lang lift, injection-derived hit counts).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import corpus, dedup, similarity
from parquet_to_csv_spark.sources.tables import load_table


def test_semdedup_prune_replay(spark, sf_dir):
    out = similarity.semdedup_prune(spark, sf_dir, eps=0.4).collect()
    idx = similarity._ivf_index_dir(spark, sf_dir, 16, 2)
    _, assign = similarity.load_ivf_index(spark, idx)
    cells = {r["vec_id"]: r["cell"] for r in assign.collect()}
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na > 0 and nb > 0 else None

    expect = {}
    for v, cv in cells.items():
        mates = [
            (cos(emb[u], emb[v]), u)
            for u, cu in cells.items()
            if cu == cv and u < v
        ]
        dups = [(c, u) for c, u in mates if c is not None and c >= 0.4]
        if dups:
            best = max(dups, key=lambda t: (t[0], -t[1]))
            expect[v] = (cv, best[1], round(best[0], 6), len(dups))
    got = {
        r["vec_id"]: (r["cell"], r["dup_of"], r["max_cosine"], r["n_earlier_dups"])
        for r in out
    }
    assert got == expect
    assert len(got) > 0  # non-vacuous at fixture scale


def test_hard_negative_mining_replay(spark, sf_dir):
    emb_rows = load_table(spark, sf_dir, "embeddings").collect()
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb_rows}
    lab = {r["vec_id"]: r["label"] for r in emb_rows}
    out = {r["anchor_id"]: r for r in similarity.hard_negative_mining(spark, sf_dir).collect()}
    assert set(out) == {v for v in emb if v < 8}
    for aid, row in out.items():
        a = emb[aid]

        def cands(same):
            res = []
            for v, e in emb.items():
                if v == aid or (lab[v] == lab[aid]) != same:
                    continue
                res.append((float(a @ e / (np.linalg.norm(a) * np.linalg.norm(e))), v))
            return res

        pc, pid = max(cands(True), key=lambda t: (t[0], -t[1]))
        nc, nid = max(cands(False), key=lambda t: (t[0], -t[1]))
        assert (row["pos_id"], row["neg_id"]) == (pid, nid)
        assert row["pos_cosine"] == round(pc, 6)
        assert row["neg_cosine"] == round(nc, 6)
        assert row["margin_micro"] == int(np.floor((pc - nc) * 1e6))


def test_dsir_weights_lift_target_lang(spark, sf_dir):
    """DSIR's point: target-lang docs must score higher on average."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = corpus.dsir_weights(spark, sf_dir, target_lang="en").join(docs, "doc_id")
    rows = w.groupBy(F.col("lang") == "en").agg(
        F.avg("w_micro_per_token").alias("m")
    ).collect()
    means = {r[0]: r["m"] for r in rows}
    assert means[True] > means[False]


def test_mixture_allocation_feasible_and_uniform(spark, sf_dir):
    rows = corpus.mixture_allocation(spark, sf_dir).collect()
    avail = {r["source"]: r["avail_tokens"] for r in rows}
    alloc = {r["source"]: r["alloc_tokens"] for r in rows}
    total = sum(avail.values())
    budget = total * 500000 // 1000000
    k = len(rows)
    assert all(0 <= alloc[s] <= avail[s] for s in avail)
    # floored divisions may strand at most one token per source per pass
    assert budget - 2 * k <= sum(alloc.values()) <= budget
    # sources below the uniform share are taken in full
    desired = budget // k
    for s in avail:
        if avail[s] <= desired:
            assert alloc[s] == avail[s]
    for r in rows:
        assert r["fill_ppm"] == r["alloc_tokens"] * 10**6 // r["avail_tokens"]


def test_secret_scan_matches_injection_schedule(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    expect_flagged: dict = {}
    expect_aws: dict = {}
    for r in docs:
        d, s = r["doc_id"], r["source"]
        planted = any(d % m == 0 for m in (19, 23, 29, 31, 37))
        expect_flagged[s] = expect_flagged.get(s, 0) + (1 if planted else 0)
        expect_aws[s] = expect_aws.get(s, 0) + (1 if d % 19 == 0 else 0)
    out = {r["source"]: r for r in corpus.secret_scan(spark, sf_dir).collect()}
    for s, row in out.items():
        assert row["n_flagged"] == expect_flagged[s]
        assert row["hits_aws_key"] == expect_aws[s]
    # deterministic digest across invocations
    out2 = {r["source"]: r for r in corpus.secret_scan(spark, sf_dir).collect()}
    assert {s: r["redacted_digest"] for s, r in out.items()} == {
        s: r["redacted_digest"] for s, r in out2.items()
    }


def test_leakage_safe_split_never_straddles(spark, sf_dir):
    rows = dedup.leakage_safe_split(spark, sf_dir).collect()
    assert all(r["n_straddling_pairs"] == 0 for r in rows)
    n_docs_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val"}


def test_top_principal_component_replays_numpy(spark, sf_dir):
    """The distributed power iteration must match the same algorithm
    run in numpy (seed e0, 2 iterations, mean-centering) to rounding
    tolerance — and the Rayleigh quotient must be at least the mean
    per-dim variance (the top eigenvalue can't be below average)."""
    emb = np.array(
        [
            r["embedding"]
            for r in load_table(spark, sf_dir, "embeddings")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    c = emb - emb.mean(axis=0)
    w = np.zeros(c.shape[1])
    w[0] = 1.0
    for _ in range(2):
        w = c.T @ (c @ w)
        w = w / np.linalg.norm(w)
    lam = float(((c @ w) ** 2).sum() / c.shape[0])

    rows = similarity.top_principal_component(spark, sf_dir).collect()
    got = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["pos"])])
    assert np.allclose(got, np.round(w, 6), atol=2e-6)
    assert abs(rows[0]["eigval"] - round(lam, 4)) < 2e-3
    assert rows[0]["eigval"] >= (c.var(axis=0).sum() / c.shape[1]) - 1e-6


def test_label_cohesion_identity_equals_bruteforce(spark, sf_dir):
    emb_rows = load_table(spark, sf_dir, "embeddings").collect()
    by_label: dict = {}
    for r in emb_rows:
        v = np.array(r["embedding"], dtype=np.float64)
        n = np.linalg.norm(v)
        if n > 0:
            by_label.setdefault(r["label"], []).append(v / n)
    got = {
        r["label"]: (r["n_vecs"], r["mean_pair_cos_micro"])
        for r in similarity.label_cohesion_exact(spark, sf_dir).collect()
    }
    for lab, vs in by_label.items():
        if len(vs) < 2:
            assert lab not in got
            continue
        n = len(vs)
        brute = sum(
            float(vs[i] @ vs[j])
            for i in range(n)
            for j in range(n)
            if i != j
        ) / (n * (n - 1))
        n_got, micro = got[lab]
        assert n_got == n
        # identity and brute force agree to well under a micro unit
        assert abs(micro / 1e6 - brute) < 5e-6


def test_streaming_secret_scrub_parity(spark, sf_dir):
    """The streaming drain must equal the batch scan row-for-row —
    one definition, two execution paths (the E9 parity contract
    applied to the ingest-time safety filter)."""
    from parquet_to_csv_spark.streaming import stream as st

    batch = {
        r["source"]: tuple(r) for r in corpus.secret_scan(spark, sf_dir).collect()
    }
    streamed = {
        r["source"]: tuple(r)
        for r in st.secret_scrub_drain_query(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_dup_provenance_forest_properties(spark, sf_dir):
    rows = dedup.dup_provenance(spark, sf_dir).collect()
    assert rows
    by_doc = {r["doc_id"]: r for r in rows}
    for r in rows:
        if r["is_root"]:
            # roots are cluster minima and never have an earlier parent
            assert r["doc_id"] == r["cluster_id"]
            assert r["parent_id"] is None
        if r["parent_id"] is not None:
            # parents are earlier arrivals in the SAME cluster
            assert r["parent_id"] < r["doc_id"]
            assert by_doc[r["parent_id"]]["cluster_id"] == r["cluster_id"]
            assert r["parent_jaccard"] >= 0.8


def test_curriculum_schedule_budget_and_ordering(spark, sf_dir):
    rows = corpus.curriculum_schedule(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    tot = sum(len([t for t in r["text"].lower().split() if t]) for r in docs)
    budget = tot * 600000 // 10**6
    admitted_tokens = sum(r["tokens_admitted"] for r in rows)
    assert admitted_tokens <= budget
    # the next-best rejected doc would not have fit (prefix maximality):
    # admitted token mass plus the smallest rejected doc exceeds budget
    # is not guaranteed per-source, so assert the global bound + nonempty
    assert admitted_tokens > 0
    for r in rows:
        assert r["n_admitted"] >= 0
        if r["n_admitted"] == 0:
            assert r["tokens_admitted"] == 0 and r["cutoff_q"] is None


def test_conformal_coverage_guarantee(spark, sf_dir):
    """Split-conformal guarantee: coverage >= 1 - alpha in expectation.
    With alpha=0.1 and the fixture sizes, realized coverage per segment
    should sit near 900000 ppm — assert it exceeds 850000 everywhere
    (deterministic: fixed folds, exact arithmetic)."""
    from parquet_to_csv_spark.operators import mlmetrics

    rows = mlmetrics.conformal_intervals(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["coverage_ppm"] >= 850000
        assert r["qhat_cents"] > 0
        assert r["n_train"] > 0 and r["n_cal"] > 0 and r["n_eval"] > 0


def test_embedding_abtt_removes_top_component(spark, sf_dir):
    """After all-but-the-top, every vector's norm can only shrink
    (Pythagoras: we removed an orthogonal projection), and the
    projection of the REWRITTEN vectors on w must be ~0 — verified in
    numpy against the same 2-iteration power vector."""
    rows = similarity.embedding_abtt(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["norm_after"] <= r["norm_before"] + 1e-6
        # norm_after^2 + t^2 ≈ norm_before^2
        lhs = r["norm_after"] ** 2 + r["proj_coeff"] ** 2
        assert abs(lhs - r["norm_before"] ** 2) < 1e-3


def test_markov_attribution_properties(spark, sf_dir):
    """Removal-effect sanity: shares are a partition of ~1e6 ppm,
    effects are non-negative, removing a channel can only REDUCE
    conversion probability, and p_conv_base matches an independent
    numpy absorbing-chain replay of the same 12 iterations."""
    from collections import defaultdict

    from parquet_to_csv_spark.operators import timeops

    rows = timeops.markov_attribution(spark, sf_dir).collect()
    assert {r["channel"] for r in rows} == {"view", "click", "signup", "error"}
    tot = sum(r["share_ppm"] for r in rows)
    assert 0 < tot <= 10**6
    for r in rows:
        assert 0 <= r["p_conv_removed"] <= r["p_conv_base"] + 1e-9
        assert r["effect_micro"] >= 0

    # independent replay: rebuild journeys + base-chain absorption in python
    ev = sorted(
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_id", "event_type", "ts div 1000 AS us")
        .collect(),
        key=lambda r: (r["user_id"], r["us"], r["event_id"]),
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r["event_type"])
    trans = defaultdict(int)
    for types in by_user.values():
        journey = []
        for t in types:
            journey.append("CONV" if t == "purchase" else t)
            if t == "purchase":
                break
        trans[("START", journey[0])] += 1
        for a, b in zip(journey, journey[1:]):
            if a != "CONV":
                trans[(a, b)] += 1
        if journey[-1] != "CONV":
            trans[(journey[-1], "NULL")] += 1
    outs = defaultdict(int)
    for (a, _), n in trans.items():
        outs[a] += n
    p = {k: n / outs[k[0]] for k, n in trans.items()}
    pv = {"CONV": 1.0}
    for _ in range(12):
        nxt = {}
        for s in outs:
            nxt[s] = sum(pr * pv.get(t, 0.0) for (a, t), pr in p.items() if a == s)
        nxt["CONV"] = 1.0
        pv = nxt
    base = {r["channel"]: r for r in rows}
    some = next(iter(base.values()))
    assert abs(some["p_conv_base"] - round(pv["START"], 6)) < 1e-5


def test_similarity_order_benefit_measures_real_gain(spark, sf_dir):
    """The content sort key must beat arrival order on average across
    blocks (it was chosen by measurement), and every block's metrics
    must be valid milli values."""
    rows = corpus.similarity_order_benefit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["adj_milli_arrival"] <= 1000
        assert 0 <= r["adj_milli_sorted"] <= 1000
        assert r["gain_milli"] == r["adj_milli_sorted"] - r["adj_milli_arrival"]
    mean_gain = sum(r["gain_milli"] for r in rows) / len(rows)
    assert mean_gain > 0


def test_python_datasource_partition_parallel(spark):
    """E319: the Python DataSource generates the identical corpus at
    any partition count (partition-boundary correctness), and the row
    count / schema match the options."""
    from parquet_to_csv_spark.sources.pysource import synthetic_docs

    a = sorted(map(tuple, synthetic_docs(spark, n_rows=500, n_partitions=1).collect()))
    b = sorted(map(tuple, synthetic_docs(spark, n_rows=500, n_partitions=7).collect()))
    assert a == b and len(a) == 500
    df = synthetic_docs(spark, n_rows=10, n_partitions=3)
    assert df.rdd.getNumPartitions() == 3 or df.count() == 10
    assert dict(df.dtypes) == {
        "doc_id": "bigint", "lang": "string", "source": "string",
        "text": "string", "n_tokens": "bigint",
    }


def test_streaming_anomaly_detector_replay(spark, sf_dir):
    """E320: the stateful streaming detector must equal a python
    replay of the exact per-event decision procedure (warmup 5,
    cross-multiplied 3-sigma rule on prior stats, event order)."""
    from collections import defaultdict

    from parquet_to_csv_spark.streaming import stream as st

    got = {
        r["user_id"]: (r["n_events"], r["n_flagged"], r["last_flag_us"])
        for r in st.anomaly_drain_query(spark, sf_dir).collect()
    }
    ev = sorted(
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_id", "ts div 1000 AS us", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["us"], r["event_id"]),
    )
    stats = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, sc, ss, flags, last
    for r in ev:
        s = stats[r["user_id"]]
        v = int(round(r["value"] * 100))
        if s[0] >= 5 and (v * s[0] - s[1]) ** 2 > 9 * (s[0] * s[2] - s[1] ** 2):
            s[3] += 1
            s[4] = r["us"]
        s[0] += 1
        s[1] += v
        s[2] += v * v
    expect = {u: (s[0], s[3], s[4]) for u, s in stats.items()}
    assert got == expect
    assert sum(f for _, f, _ in got.values()) > 0  # detector non-vacuous


def test_purged_folds_never_leak(spark, sf_dir):
    from parquet_to_csv_spark.operators import mlmetrics

    rows = mlmetrics.purged_timeseries_folds(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_leaking_train_rows"] == 0
        assert r["test_start_day"] <= r["test_end_day"]
        assert r["n_test"] > 0
    # folds tile the timeline in order; fold 0 has no earlier train data
    srt = sorted(rows, key=lambda r: r["fold"])
    assert srt[0]["n_train"] == 0
    for a, b in zip(srt, srt[1:]):
        assert a["test_end_day"] < b["test_start_day"]
        assert b["n_train"] >= a["n_train"]


def test_loo_influence_additivity(spark, sf_dir):
    from parquet_to_csv_spark.operators import mlmetrics

    rows = mlmetrics.loo_source_influence(spark, sf_dir).collect()
    assert rows
    means = {r["corpus_mean_ppm"] for r in rows}
    assert len(means) == 1  # one corpus mean repeated
    for r in rows:
        assert r["influence_ppm"] == r["loo_mean_ppm"] - r["corpus_mean_ppm"]
    # influence must be two-sided on a heterogeneous corpus
    assert any(r["influence_ppm"] > 0 for r in rows)
    assert any(r["influence_ppm"] < 0 for r in rows)


def test_dynamic_gap_sessions_replay(spark, sf_dir):
    """E325: the dynamic session_window must equal a python replay of
    the half-open running-max merge rule with per-event gaps."""
    from collections import defaultdict

    from parquet_to_csv_spark.operators import timeops

    got = sorted(
        map(
            tuple,
            timeops.dynamic_gap_sessions(spark, sf_dir)
            .select("user_id", "sess_start_us", "sess_end_us", "n_events", "n_errors")
            .collect(),
        )
    )
    ev = sorted(
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_type", "ts div 1000 AS us")
        .collect(),
        key=lambda r: (r["user_id"], r["us"]),
    )
    GAP = {"error": 86_400_000_000}
    DEFAULT = 259_200_000_000
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["us"], r["event_type"]))
    expect = []
    for u, rows in by_user.items():
        cur = None
        for us, et in rows:
            g = GAP.get(et, DEFAULT)
            if cur is None or us >= cur["end"]:
                if cur:
                    expect.append(
                        (u, cur["start"], cur["end"], cur["n"], cur["ne"])
                    )
                cur = {"start": us, "end": us + g, "n": 0, "ne": 0}
            cur["end"] = max(cur["end"], us + g)
            cur["n"] += 1
            cur["ne"] += et == "error"
        expect.append((u, cur["start"], cur["end"], cur["n"], cur["ne"]))
    assert got == sorted(expect)
    # dynamic gaps must actually split differently than a uniform 3-day
    # gap somewhere (the feature is non-vacuous on the fixture)
    n_uniform = 0
    for u, rows in by_user.items():
        cur_end = None
        for us, _ in rows:
            if cur_end is None or us >= cur_end:
                n_uniform += 1
                cur_end = us + DEFAULT
            cur_end = max(cur_end, us + DEFAULT)
    assert len(got) != n_uniform


def test_cluster_design_effect_sane(spark, sf_dir):
    """DEFF >= ~1 when clustering is non-negative; effective_n <= n;
    ICC replayed in numpy from raw values per event type."""
    from collections import defaultdict

    from parquet_to_csv_spark.operators import mlmetrics

    rows = {r["event_type"]: r for r in mlmetrics.cluster_design_effect(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "user_id", "CAST(round(value * 100) AS LONG) AS cents"
    ).collect()
    by = defaultdict(lambda: defaultdict(list))
    for r in ev:
        by[r["event_type"]][r["user_id"]].append(r["cents"])
    for et, users in by.items():
        groups = list(users.values())
        k = len(groups)
        n = sum(len(g) for g in groups)
        tss = sum(v * v for g in groups for v in g)
        ts = sum(v for g in groups for v in g)
        sb = sum((sum(g) ** 2) / len(g) for g in groups)
        ssw, ssb = tss - sb, sb - ts**2 / n
        msw, msb = ssw / (n - k), ssb / (k - 1)
        mbar = n / k
        icc = (msb - msw) / (msb + (mbar - 1) * msw)
        r = rows[et]
        assert abs(r["icc_ppm"] / 1e6 - icc) < 5e-5
        # internal consistency: DEFF = 1 + (m̄−1)·ICC and
        # effective_n = n / DEFF (negative ICC ⇒ DEFF < 1 ⇒
        # effective_n > n — legitimate for near-independent values)
        deff = 1 + (mbar - 1) * icc
        assert abs(r["deff_ppm"] / 1e6 - deff) < 5e-5
        assert abs(r["effective_n"] - round(n / deff, 2)) < 0.5


def test_arrival_completeness_leave_one_out(spark, sf_dir):
    """E330: baseline is the leave-one-out same-weekday median — a
    day's own count never feeds its baseline; alert fires iff below
    the ppm bar; replayed in python."""
    from collections import defaultdict
    from statistics import median_low

    from parquet_to_csv_spark.operators import timeops

    rows = {r["day"]: r for r in timeops.arrival_completeness(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "(ts div 1000) div 86400000000 AS day"
    ).collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r["day"]] += 1
    by_dow = defaultdict(list)
    for day, n in daily.items():
        by_dow[(day + 4) % 7].append((day, n))
    for day, r in rows.items():
        peers = sorted(n for d2, n in by_dow[(day + 4) % 7] if d2 != day)
        assert r["baseline_n"] == median_low(peers)
        assert r["completeness_ppm"] == r["n"] * 10**6 // r["baseline_n"]
        assert r["alert"] == (1 if r["completeness_ppm"] < 900000 else 0)


def test_stl_lite_identity_and_seasonality(spark, sf_dir):
    """E331: value == trend + seasonal + residual EXACTLY per day, and
    weekday seasonal components sum (weighted by day counts) to ~0
    relative to total mass (the decomposition centers the detrended
    series per weekday)."""
    from parquet_to_csv_spark.operators import timeops

    rows = timeops.stl_lite_decomposition(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            r["cents"]
            == r["trend_cents"] + r["seasonal_cents"] + r["residual_cents"]
        )
    # per-weekday residual means are in (-1, 1) cents of zero up to the
    # floored-division remainder
    from collections import defaultdict

    res = defaultdict(list)
    for r in rows:
        res[r["dow"]].append(r["residual_cents"] + r["seasonal_cents"])
    for dow, dets in res.items():
        mean_det = sum(dets) / len(dets)
        seas = next(r["seasonal_cents"] for r in rows if r["dow"] == dow)
        assert abs(mean_det - seas) < 1  # seasonal = floor(mean detrended)


def test_kcenter_coreset_greedy_replay(spark, sf_dir):
    """E332: the distributed farthest-point sampler must equal the
    numpy greedy (seed 0, cosine distance, min-id tie-break), and the
    selection-distance curve must be non-increasing (each pick covers
    the worst remaining gap)."""
    rows = sorted(
        similarity.kcenter_coreset(spark, sf_dir).collect(),
        key=lambda r: r["pick"],
    )
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    unit = {v: e / np.linalg.norm(e) for v, e in emb.items()}
    sel = [0]
    log = [(0, 0, None)]
    for pick in range(1, 8):
        best = None
        for v, u in unit.items():
            if v in sel:
                continue
            md = min(1.0 - float(u @ unit[s]) for s in sel)
            if best is None or (md, -v) > (best[1], -best[0]):
                best = (v, md)
        sel.append(best[0])
        log.append((pick, best[0], round(best[1], 6)))
    got = [(r["pick"], r["vec_id"], r["sel_dist"]) for r in rows]
    assert got == log
    dists = [d for _, _, d in got[1:]]
    assert dists == sorted(dists, reverse=True)


def test_growth_accounting_identity(spark, sf_dir):
    """E333: MAU(t) == new + retained + resurrected per month, month 0
    is all-new, and churn reconciles: churned(t) = MAU(t-1) −
    retained(t) >= 0."""
    from parquet_to_csv_spark.operators import timeops

    rows = sorted(
        timeops.growth_accounting(spark, sf_dir).collect(), key=lambda r: r["mo"]
    )
    assert rows
    by_mo = {r["mo"]: r for r in rows}
    first = rows[0]
    assert first["n_new"] == first["mau"]
    # no prior month: nothing retained, so churn = 0 − 0
    assert first["n_retained"] == 0 and first["n_churned"] == 0
    for r in rows:
        assert r["mau"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_churned"] == prev["mau"] - cur["n_retained"]
        assert cur["n_churned"] >= 0


def test_count_overdispersion_replay(spark, sf_dir):
    from collections import defaultdict

    from parquet_to_csv_spark.operators import timeops

    got = {r["event_type"]: r for r in timeops.count_overdispersion(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "(ts div 1000) div 86400000000 AS day"
    ).collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["day"])] += 1
    per_type = defaultdict(list)
    for (et, _), n in daily.items():
        per_type[et].append(n)
    for et, ns in per_type.items():
        k, tot, ss = len(ns), sum(ns), sum(n * n for n in ns)
        r = got[et]
        assert (r["k_days"], r["total"]) == (k, tot)
        assert r["dispersion_ppm"] == (k * ss - tot * tot) * 10**6 // (k * tot)


def test_python_datasource_jsonl_sink_roundtrip(spark, sf_dir, tmp_path):
    """E335: the Python-DataSource JSONL SINK commits atomically
    (task temp -> driver rename, _SUCCESS row count) and round-trips
    the data exactly through Spark's JSON reader."""
    import glob
    import os

    from parquet_to_csv_spark.sources.pysource import write_jsonl_sink

    out = str(tmp_path / "sink")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    write_jsonl_sink(src, out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    n_total = src.count()
    assert int(open(os.path.join(out, "_SUCCESS")).read()) == n_total
    # no stray temp files after commit
    assert glob.glob(os.path.join(out, "_tmp", "*")) == []
    back = spark.read.schema("doc_id long, lang string, source string").json(
        os.path.join(out, "part-*.jsonl")
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_label_diag_fid_replay(spark, sf_dir):
    """E336: diag-FID replayed in numpy (population sigma); symmetric
    inputs produce strictly positive distances on distinct labels."""
    from collections import defaultdict

    got = {
        (r["label_a"], r["label_b"]): r["diag_fid"]
        for r in similarity.label_diag_fid(spark, sf_dir).collect()
    }
    by_label = defaultdict(list)
    for r in load_table(spark, sf_dir, "embeddings").collect():
        by_label[r["label"]].append(np.array(r["embedding"], dtype=np.float64))
    stats = {
        lab: (np.mean(vs, axis=0), np.std(vs, axis=0))
        for lab, vs in by_label.items()
    }
    labs = sorted(stats)
    for i, la in enumerate(labs):
        for lb in labs[i + 1:]:
            mu_a, sg_a = stats[la]
            mu_b, sg_b = stats[lb]
            fid = float(((mu_a - mu_b) ** 2).sum() + ((sg_a - sg_b) ** 2).sum())
            assert abs(got[(la, lb)] - fid) < 1e-4
            assert got[(la, lb)] > 0


def test_source_entropy_budget_replay(spark, sf_dir):
    """E340: entropy replayed in python (same micro-rounded ln
    contributions); bounds: 0 <= H <= ln(vocab) per source; the
    compressed floor is below the raw token bytes."""
    import math
    from collections import defaultdict

    got = {r["source"]: r for r in corpus.source_entropy_budget(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    cnt: dict = defaultdict(lambda: defaultdict(int))
    for r in docs:
        for t in r["text"].lower().split():
            if t:
                cnt[r["source"]][t] += 1
    for src, terms in cnt.items():
        nn = sum(terms.values())
        contrib = sum(n * round(math.log(nn / n) * 1e6) for n in terms.values())
        r = got[src]
        assert r["n_tokens"] == nn
        assert r["entropy_micronats_per_token"] == contrib // nn
        assert 0 <= r["entropy_micronats_per_token"] <= round(
            math.log(len(terms)) * 1e6
        )
        assert r["min_compressed_bytes"] == contrib // 693147 // 8


def test_shrunk_rates_fix_small_sample_ranking(spark, sf_dir):
    """E341: shrinkage must (a) sit between raw and global rates, (b)
    pull small-n users harder than large-n users, and (c) be exact per
    the integer formula."""
    from parquet_to_csv_spark.operators import mlmetrics

    rows = mlmetrics.shrunk_conversion_rates(spark, sf_dir, k=1000).collect()
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS c"
    ).collect()
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for r in ev:
        agg[r["user_id"]][0] += 1
        agg[r["user_id"]][1] += r["c"]
    g_ppm = sum(x for _, x in agg.values()) * 10**6 // sum(n for n, _ in agg.values())
    for r in rows:
        n, x = agg[r["user_id"]]
        assert (r["n"], r["x"]) == (n, x)
        assert r["shrunk_ppm"] == (x * 10**6 + 20 * g_ppm) // (n + 20)
        lo, hi = sorted((r["raw_ppm"], g_ppm))
        assert lo - 1 <= r["shrunk_ppm"] <= hi + 1


def test_expected_calibration_error_consistency(spark, sf_dir):
    """E342: ECE replayed from the bins relation; worst-bin gap equals
    max gap; ECE <= max gap."""
    from parquet_to_csv_spark.operators import text as textops

    bins = textops.calibration_bins(spark, sf_dir).collect()
    (r,) = textops.expected_calibration_error(spark, sf_dir).collect()
    gaps = {
        b["bin"]: abs(b["pos_rate_ppm"] - b["mean_score_e4"] * 100) for b in bins
    }
    n = sum(b["n_docs"] for b in bins)
    ece = sum(b["n_docs"] * gaps[b["bin"]] for b in bins) // n
    assert r["ece_ppm"] == ece
    assert r["max_gap_ppm"] == max(gaps.values())
    assert gaps[r["worst_bin"]] == r["max_gap_ppm"]
    assert r["ece_ppm"] <= r["max_gap_ppm"]
    assert r["n_docs"] == n and r["n_bins"] == len(bins)
