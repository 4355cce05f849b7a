"""Batch-J tests: span-level dedup scrub, bigram LM scoring."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from parquet_to_csv_spark.operators import corpus
from parquet_to_csv_spark.sources.tables import load_table


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def test_span_dedup_scrub_replay(spark, sf_dir):
    n, min_docs = 4, 3
    docs = {r.doc_id: _toks(r.text) for r in load_table(spark, sf_dir, "documents").collect()}
    gram_docs: dict[tuple, set] = {}
    for d, t in docs.items():
        for i in range(len(t) - n + 1):
            gram_docs.setdefault(tuple(t[i : i + n]), set()).add(d)
    hot = {g for g, ds in gram_docs.items() if len(ds) >= min_docs}
    expect = {}
    for d, t in docs.items():
        covered = set()
        for i in range(len(t) - n + 1):
            if tuple(t[i : i + n]) in hot:
                covered.update(range(i, i + n))
        kept = [t[i] for i in range(len(t)) if i not in covered]
        if len(covered) > 0:
            fp = hashlib.md5(" ".join(kept).encode()).hexdigest()
            expect[d] = (len(t), len(covered), fp)
    rows = corpus.span_dedup_scrub(spark, sf_dir, n=n, min_docs=min_docs).collect()
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.scrubbed_fp) for r in rows}
    assert got == expect
    assert expect, "fixture must exercise at least one hot span"


def test_bigram_lm_score_replay(spark, sf_dir):
    docs = {r.doc_id: _toks(r.text) for r in load_table(spark, sf_dir, "documents").collect()}
    big: Counter = Counter()
    vocab = set()
    for t in docs.values():
        vocab.update(t)
        big.update(zip(t, t[1:]))
    c1: Counter = Counter()
    for (w1, _), c in big.items():
        c1[w1] += c
    v = len(vocab)
    expect = {}
    for d, t in docs.items():
        if len(t) < 2:
            continue
        units = 0
        for pair in zip(t, t[1:]):
            lp = math.log((big[pair] + 1) / (c1[pair[0]] + v))
            units += int(round(lp * 1e6))
        nb = len(t) - 1
        expect[d] = (nb, math.floor(units / nb) / 1e6)
    rows = corpus.bigram_lm_score(spark, sf_dir).collect()
    got = {r.doc_id: (r.n_bigrams, r.avg_logprob) for r in rows}
    assert got == expect


def test_bigram_lm_penalizes_unattested_order(spark, sf_dir):
    # every score is a strictly negative mean log-probability
    rows = corpus.bigram_lm_score(spark, sf_dir).collect()
    assert rows and all(r.avg_logprob < 0 for r in rows)


def test_chi2_distinctive_tokens_replay(spark, sf_dir):
    import math as _math

    from parquet_to_csv_spark.operators import text as text_ops

    docs = [(r.doc_id, r.lang, set(_toks(r.text)))
            for r in load_table(spark, sf_dir, "documents").collect()]
    n_total = len(docs)
    n_lang: Counter = Counter(l for _, l, _ in docs)
    a: Counter = Counter()
    for _, l, ts in docs:
        for t in ts:
            a[(l, t)] += 1
    n_tok: Counter = Counter()
    for (l, t), c in a.items():
        n_tok[t] += c
    scored = []
    for (l, t), av in a.items():
        if av < 5 or n_tok[t] >= n_total or n_lang[l] >= n_total:
            continue
        det = av * n_total - n_lang[l] * n_tok[t]
        if det <= 0:
            continue
        chi2 = (
            float(n_total) * float(det) * float(det)
            / (float(n_lang[l]) * float(n_total - n_lang[l])
               * float(n_tok[t]) * float(n_total - n_tok[t]))
            * 1000.0
        )
        scored.append((l, t, av, _math.floor(chi2)))
    expect = {}
    by_lang: dict[str, list] = {}
    for l, t, av, c in scored:
        by_lang.setdefault(l, []).append((c, t, av))
    for l, xs in by_lang.items():
        xs.sort(key=lambda x: (-x[0], x[1]))
        for rnk, (c, t, av) in enumerate(xs[:10], 1):
            expect[(l, rnk)] = (t, av, c)
    rows = text_ops.chi2_distinctive_tokens(spark, sf_dir).collect()
    got = {(r.lang, r.rnk): (r.token, r.n_docs_in, r.chi2_milli) for r in rows}
    assert got == expect


def test_seasonal_naive_backtest_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import timeops

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type").collect()
    daily: Counter = Counter()
    for r in ev:
        daily[(r.event_type, (r.ts // 1000) // 86400000000)] += 1
    per: dict[str, list] = {}
    for (et, d), n in daily.items():
        np = daily.get((et, d - 7))
        if np is not None:
            per.setdefault(et, []).append((abs(n - np), abs(n - np) * 1000000 // n))
    expect = {
        et: (len(xs), sum(e for e, _ in xs) * 1000 // len(xs),
             sum(p for _, p in xs) // len(xs))
        for et, xs in per.items()
    }
    rows = timeops.seasonal_naive_backtest(spark, sf_dir).collect()
    got = {r.event_type: (r.n_days, r.mae_milli, r.mape_ppm) for r in rows}
    assert got == expect
    assert got, "fixture must span at least one lagged week"


def test_ks_source_pairs_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import mlmetrics

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars").collect()
    by_src: dict[str, list] = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r.n_chars)
    vals = sorted({r.n_chars for r in docs})
    srcs = sorted(by_src)
    ecdf = {
        s: [sum(1 for x in by_src[s] if x <= v) for v in vals] for s in srcs
    }
    expect = {}
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1:]:
            n1, n2 = len(by_src[s1]), len(by_src[s2])
            mx = max(abs(c1 * n2 - c2 * n1) for c1, c2 in zip(ecdf[s1], ecdf[s2]))
            expect[(s1, s2)] = (n1, n2, mx * 1000000 // (n1 * n2))
    rows = mlmetrics.ks_source_pairs(spark, sf_dir).collect()
    got = {(r.source_a, r.source_b): (r.n_a, r.n_b, r.ks_d_ppm) for r in rows}
    assert got == expect


def test_event_sequence_lm_replay(spark, sf_dir):
    import math as _math

    from parquet_to_csv_spark.operators import mlmetrics

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    ).collect()
    by_user: dict[int, list] = {}
    kinds = set()
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
        kinds.add(r.event_type)
    cab: Counter = Counter()
    user_pairs: dict[int, list] = {}
    for u, xs in by_user.items():
        xs.sort()
        ps = list(zip((t for _, _, t in xs), (t for _, _, t in xs[1:])))
        user_pairs[u] = ps
        cab.update(ps)
    ca: Counter = Counter()
    for (a, _), c in cab.items():
        ca[a] += c
    k = len(kinds)
    expect = {}
    for u, ps in user_pairs.items():
        if not ps:
            continue
        units = sum(int(round(_math.log((cab[p] + 1) / (ca[p[0]] + k)) * 1e6)) for p in ps)
        expect[u] = (len(ps), _math.floor(units / len(ps)) / 1e6)
    rows = mlmetrics.event_sequence_lm_score(spark, sf_dir).collect()
    got = {r.user_id: (r.n_transitions, r.avg_logprob) for r in rows}
    assert got == expect


def _cents(v: float) -> int:
    import math as _math

    return int(_math.floor(v * 100 + 0.5))


def test_grouped_ols_replay(spark, sf_dir):
    import math as _math

    from parquet_to_csv_spark.operators import mlmetrics

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    stats: dict[str, list] = {}
    for r in ev:
        x1 = (r.ts // 3600000000000) % 24
        x2 = ((r.ts // 86400000000000) + 4) % 7
        y = _cents(r.value)
        stats.setdefault(r.event_type, []).append((x1, x2, y))
    expect = {}
    for et, xs in stats.items():
        n = len(xs)
        s1 = sum(x1 for x1, _, _ in xs); s2 = sum(x2 for _, x2, _ in xs)
        s11 = sum(x1 * x1 for x1, _, _ in xs); s22 = sum(x2 * x2 for _, x2, _ in xs)
        s12 = sum(x1 * x2 for x1, x2, _ in xs); sy = sum(y for _, _, y in xs)
        s1y = sum(x1 * y for x1, _, y in xs); s2y = sum(x2 * y for _, x2, y in xs)
        def det3(a, b, c, d, e, f, g, h, i):
            return (float(a) * (float(e) * float(i) - float(f) * float(h))
                    - float(b) * (float(d) * float(i) - float(f) * float(g))
                    + float(c) * (float(d) * float(h) - float(e) * float(g)))
        # matrix [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], rhs [sy,s1y,s2y]
        dd = (float(n) * (float(s11) * float(s22) - float(s12) * float(s12))
              - float(s1) * (float(s1) * float(s22) - float(s12) * float(s2))
              + float(s2) * (float(s1) * float(s12) - float(s11) * float(s2)))
        d0 = (float(sy) * (float(s11) * float(s22) - float(s12) * float(s12))
              - float(s1) * (float(s1y) * float(s22) - float(s12) * float(s2y))
              + float(s2) * (float(s1y) * float(s12) - float(s11) * float(s2y)))
        d1 = (float(n) * (float(s1y) * float(s22) - float(s12) * float(s2y))
              - float(sy) * (float(s1) * float(s22) - float(s12) * float(s2))
              + float(s2) * (float(s1) * float(s2y) - float(s1y) * float(s2)))
        d2 = (float(n) * (float(s11) * float(s2y) - float(s1y) * float(s12))
              - float(s1) * (float(s1) * float(s2y) - float(s1y) * float(s2))
              + float(sy) * (float(s1) * float(s12) - float(s11) * float(s2)))
        if dd != 0.0:
            expect[et] = (n, _math.floor(d0 / dd * 1e6), _math.floor(d1 / dd * 1e6),
                          _math.floor(d2 / dd * 1e6))
    rows = mlmetrics.grouped_ols_features(spark, sf_dir).collect()
    got = {r.event_type: (r.n, r.b0_micro, r.b1_micro, r.b2_micro) for r in rows}
    assert got == expect


def test_spearman_replay_and_range(spark, sf_dir):
    import math as _math

    from parquet_to_csv_spark.operators import mlmetrics

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    groups: dict[str, list] = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(
            ((r.ts // 3600000000000) % 24, _cents(r.value))
        )
    def ranks2(vals):
        # 2*tie-averaged-rank per original position
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        out = [0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            r2 = (i + 1) + j  # 2*avg of ranks i+1..j
            for t in range(i, j):
                out[order[t]] = r2
            i = j
        return out
    expect = {}
    for et, xs in groups.items():
        rx = ranks2([a for a, _ in xs]); ry = ranks2([b for _, b in xs])
        n = len(xs)
        sx, sy = sum(rx), sum(ry)
        sxx = sum(a * a for a in rx); syy = sum(b * b for b in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        den = _math.sqrt((float(n) * float(sxx) - float(sx) * float(sx))
                         * (float(n) * float(syy) - float(sy) * float(sy)))
        if den != 0.0:
            num = float(n) * float(sxy) - float(sx) * float(sy)
            expect[et] = (n, _math.floor(num / den * 1e6))
    rows = mlmetrics.spearman_by_group(spark, sf_dir).collect()
    got = {r.event_type: (r.n, r.rho_micro) for r in rows}
    assert got == expect
    assert all(-1_000_000 <= v[1] <= 1_000_000 for v in got.values())


def test_cluster_topic_terms_consistency(spark, sf_dir):
    from parquet_to_csv_spark.operators import similarity

    rows = similarity.cluster_topic_terms(spark, sf_dir).collect()
    assert rows, "clusters must surface at least one distinctive term"
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    for cell, xs in by_cell.items():
        xs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in xs] == list(range(1, len(xs) + 1))
        # ranked by lift desc, term asc
        key = [(-r.lift_ppm, r.term) for r in xs]
        assert key == sorted(key)
        assert all(r.n_docs_in >= 3 for r in xs)


def test_assortativity_replay(spark, sf_dir):
    import math as _math

    from parquet_to_csv_spark.operators import dedup

    edges = [
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir, threshold=0.8).collect()
    ]
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    m = len(edges)
    sx = sum(deg[a] + deg[b] for a, b in edges)
    sxx = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
    sab = sum(deg[a] * deg[b] for a, b in edges)
    num = 2.0 * float(m) * (2.0 * float(sab)) - float(sx) * float(sx)
    den = 2.0 * float(m) * float(sxx) - float(sx) * float(sx)
    rows = dedup.neardup_graph_assortativity(spark, sf_dir).collect()
    if den == 0.0:
        assert rows == []
    else:
        assert len(rows) == 1
        r = rows[0]
        assert (r.n_nodes, r.n_edges) == (len(deg), m)
        assert r.assortativity_micro == _math.floor(num / den * 1e6)
        assert -1_000_000 <= r.assortativity_micro <= 1_000_000


def test_conversion_survival_replay(spark, sf_dir):
    import math as _math

    from parquet_to_csv_spark.operators import timeops

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts").collect()
    views: dict[int, int] = {}
    horizon = max(r.ts for r in ev)
    for r in ev:
        if r.event_type == "view":
            views[r.user_id] = min(views.get(r.user_id, r.ts), r.ts)
    first_buy: dict[int, int] = {}
    for r in ev:
        if r.event_type == "purchase" and r.user_id in views and r.ts >= views[r.user_id]:
            first_buy[r.user_id] = min(first_buy.get(r.user_id, r.ts), r.ts)
    durs = []
    for u, v in views.items():
        if u in first_buy:
            durs.append(((first_buy[u] - v) // 86400000000000, 1))
        else:
            durs.append(((horizon - v) // 86400000000000, 0))
    steps: dict[int, list] = {}
    for d, e in durs:
        s = steps.setdefault(d, [0, 0])
        s[0] += e
        s[1] += 1 - e
    total = len(durs)
    seen = 0
    cum = 0
    expect = {}
    for d in sorted(steps):
        ev_n, c_n = steps[d]
        n_risk = total - seen
        seen += ev_n + c_n
        if ev_n > 0 and n_risk > ev_n:
            cum += int(round(_math.log((n_risk - ev_n) / n_risk) * 1e6))
            expect[d] = (n_risk, ev_n, cum)
    rows = timeops.conversion_survival_curve(spark, sf_dir).collect()
    got = {r.duration_days: (r.n_risk, r.n_events, r.log_surv_micro) for r in rows}
    assert got == expect
    assert expect, "fixture must produce at least one KM step"
    # log-survival is monotone nonincreasing
    vals = [v[2] for _, v in sorted(expect.items())]
    assert all(b <= a for a, b in zip(vals, vals[1:]))


def test_benford_audit_consistency(spark, sf_dir):
    from parquet_to_csv_spark.operators import relational

    rows = relational.benford_price_audit(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_ppm for r in rows) - 1_000_000) <= len(rows)
    for r in rows:
        assert r.dev_ppm == r.obs_ppm - r.exp_ppm
        assert r.exp_ppm == relational.BENFORD_PPM[r.digit]


def test_k_anonymity_audit_replay(spark, sf_dir):
    rows = corpus.k_anonymity_audit(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    sizes: Counter = Counter()
    for r in docs:
        sizes[(r.lang, r.source, r.n_chars // 100)] += 1
    total = len(docs)
    expect = {}
    for k in (2, 5, 10):
        g = sum(1 for s in sizes.values() if s < k)
        d = sum(s for s in sizes.values() if s < k)
        expect[k] = (g, d, d * 1000000 // total)
    got = {r.k: (r.n_groups_below, r.n_docs_at_risk, r.risk_share_ppm) for r in rows}
    assert got == expect
    # risk is monotone in k
    assert expect[2][1] <= expect[5][1] <= expect[10][1]


def test_quintile_transitions_conservation(spark, sf_dir):
    from parquet_to_csv_spark.operators import relational
    from pyspark.sql import functions as F

    out = relational.value_quintile_transitions(spark, sf_dir)
    rows = out.collect()
    assert rows
    assert all(1 <= r.q_from <= 5 and 1 <= r.q_to <= 5 for r in rows)
    # users transitioning out of month m == users active in both m and m+1
    orders = load_table(spark, sf_dir, "orders")
    per = (
        orders.select(
            "o_custkey",
            (F.year(F.expr("cast(o_orderdate as timestamp)")) * 12
             + F.month(F.expr("cast(o_orderdate as timestamp)"))).alias("m"),
        )
        .distinct()
    )
    a = per.alias("a")
    b = per.select("o_custkey", (F.col("m") - 1).alias("m")).alias("b")
    both = a.join(b, ["o_custkey", "m"]).groupBy("m").count().collect()
    expect_m = {r.m: r["count"] for r in both}
    got_m: Counter = Counter()
    for r in rows:
        got_m[r.m_from] += r.n_users
    assert dict(got_m) == expect_m


def test_top_event_trigrams_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import timeops

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    occ: Counter = Counter()
    users: dict[tuple, set] = {}
    for u, xs in by_user.items():
        xs.sort()
        types = [t for _, _, t in xs]
        for i in range(len(types) - 2):
            tri = (types[i], types[i + 1], types[i + 2])
            occ[tri] += 1
            users.setdefault(tri, set()).add(u)
    ranked = sorted(occ, key=lambda t: (-len(users[t]), -occ[t], t))[:20]
    expect = {
        tri: (occ[tri], len(users[tri]), i + 1) for i, tri in enumerate(ranked)
    }
    rows = timeops.top_event_trigrams(spark, sf_dir).collect()
    got = {(r.e1, r.e2, r.e3): (r.n_occurrences, r.n_users, r.rnk) for r in rows}
    assert got == expect


def test_session_entry_exit_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import timeops

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts // 1000, r.event_id, r.event_type))
    agg: dict[tuple, list] = {}
    for u, xs in by_user.items():
        xs.sort()
        sessions = []
        cur = [xs[0]]
        for prev, nxt in zip(xs, xs[1:]):
            if nxt[0] - prev[0] >= 1800000000:
                sessions.append(cur)
                cur = [nxt]
            else:
                cur.append(nxt)
        sessions.append(cur)
        for s in sessions:
            key = (s[0][2], s[-1][2])
            a = agg.setdefault(key, [0, 0, 0])
            a[0] += 1
            a[1] += len(s)
            a[2] += s[-1][0] - s[0][0]
    expect = {
        k: (n, e, d // (n * 1000)) for k, (n, e, d) in agg.items()
    }
    rows = timeops.session_entry_exit(spark, sf_dir).collect()
    got = {
        (r.entry_type, r.exit_type): (r.n_sessions, r.n_events, r.mean_dur_ms)
        for r in rows
    }
    assert got == expect


def test_phash_dup_groups_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    bins: dict[int, list] = {}
    totals: dict[int, int] = {}
    corpus = [0] * 16
    for r in docs:
        b = (r.text or "").encode()
        c = [0] * 16
        for byte in b:
            c[byte >> 4] += 1
        bins[r.doc_id] = c
        totals[r.doc_id] = len(b)
        for i in range(16):
            corpus[i] += c[i]
    corpus_total = sum(corpus)
    groups: dict[int, list] = {}
    for d, c in bins.items():
        h = 0
        for i in range(16):
            if c[i] * corpus_total > corpus[i] * totals[d]:
                h |= 1 << i
        groups.setdefault(h, []).append(d)
    expect = {
        h: (len(ds), min(ds), max(ds), sum(totals[d] for d in ds))
        for h, ds in groups.items()
        if len(ds) >= 2
    }
    rows = multimodal.phash_dup_groups(spark, sf_dir).collect()
    got = {r.phash: (r.n_payloads, r.min_doc, r.max_doc, r.total_bytes) for r in rows}
    assert got == expect
    # the corpus-relative threshold must not be degenerate
    assert len(groups) > 1


def test_weighted_sample_fixed_k_replay(spark, sf_dir):
    import hashlib as _hl
    import math as _math

    from parquet_to_csv_spark.operators import corpus as corpus_ops

    docs = load_table(spark, sf_dir, "documents").collect()
    scored = []
    for r in docs:
        w = len(_toks(r.text))
        if w == 0:
            continue
        h48 = int(_hl.md5(str(r.doc_id).encode()).hexdigest()[:12], 16)
        key = _math.floor(_math.log((h48 + 1.0) / 281474976710656.0) / float(w) * 1e9)
        scored.append((key, r.doc_id, w))
    scored.sort(key=lambda x: (-x[0], x[1]))
    expect = [(d, w, k) for k, d, w in scored[:50]]
    rows = corpus_ops.weighted_sample_fixed_k(spark, sf_dir).collect()
    got = [(r.doc_id, r.w, r.key_nano) for r in rows]
    assert got == expect
    # heavier docs are over-represented vs a uniform draw of the same size
    sel_w = {d for d, _, _ in expect}
    mean_sel = sum(w for _, w, _ in expect) / len(expect)
    all_w = [len(_toks(r.text)) for r in docs if len(_toks(r.text)) > 0]
    assert mean_sel > sum(all_w) / len(all_w)


def test_embedding_standardize_replay(spark, sf_dir):
    import decimal as _dec
    import hashlib as _hl
    import math as _math

    from parquet_to_csv_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings").collect()
    dim = len(emb[0].embedding)
    n = len(emb)
    mus, sds = [], []
    for i in range(dim):
        s = sum(_dec.Decimal(repr(float(v.embedding[i]))) for v in emb)
        ssq = sum(
            _dec.Decimal(repr(float(v.embedding[i]))) ** 2 for v in emb
        )
        mu = round(float(s) / n, 6)
        sd = _math.sqrt(
            (float(ssq) - float(n) * (float(s) / float(n)) * (float(s) / float(n)))
            / float(n)
        )
        mus.append(mu)
        sds.append(sd)
    expect = {}
    for v in emb:
        zs = []
        for i in range(dim):
            if sds[i] > 0:
                zs.append(
                    (i, _math.floor((float(v.embedding[i]) - mus[i]) / sds[i] * 1000.0))
                )
        outl = sum(1 for _, z in zs if z >= 3000 or z < -3000)
        fp = _hl.md5(",".join(str(z) for _, z in sorted(zs)).encode()).hexdigest()
        expect[v.vec_id] = (len(zs), outl, fp)
    rows = similarity.embedding_standardize(spark, sf_dir).collect()
    got = {r.vec_id: (r.n_dims, r.n_outlier_dims, r.z_fp) for r in rows}
    assert got == expect


def test_weighted_jaccard_favors_rare_overlap(spark, sf_dir):
    import math as _math

    from parquet_to_csv_spark.operators import dedup

    rows = dedup.weighted_jaccard_pairs(spark, sf_dir).collect()
    assert rows
    assert all(500 <= r.wjaccard_milli <= 1000 for r in rows)
    # exact replay on the pair with the largest weighted similarity
    docs = {r.doc_id: r for r in load_table(spark, sf_dir, "documents").collect()}
    df: Counter = Counter()
    sets = {}
    for d, r in docs.items():
        ts = set(_toks(r.text))
        sets[d] = ts
        df.update(ts)
    n_total = len(docs)
    idf = {t: int(round(_math.log(n_total / c) * 1000)) for t, c in df.items()}
    top = max(rows, key=lambda r: (r.wjaccard_milli, -r.doc_a))
    a, b = sets[top.doc_a], sets[top.doc_b]
    w_shared = sum(idf[t] for t in a & b)
    w_union = sum(idf[t] for t in a) + sum(idf[t] for t in b) - w_shared
    assert top.wjaccard_milli == w_shared * 1000 // w_union
    assert top.n_shared == len(a & b)


def test_skew_key_profile_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import relational

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    counts: Counter = Counter(r.l_orderkey for r in li)
    n_keys, total = len(counts), sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = [
        (k, c, c * 1000000 // total, c * n_keys * 1000000 // total) for k, c in top
    ]
    rows = relational.skew_key_profile(spark, sf_dir).collect()
    got = [(r.key, r.cnt, r.share_ppm, r.vs_mean_ppm) for r in rows]
    assert got == expect


def test_incremental_dedup_conservation(spark, sf_dir):
    from parquet_to_csv_spark.operators import dedup

    rows = dedup.incremental_dedup_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            r.n_new_unique + r.n_dup_vs_history + r.n_dup_in_delta == r.n_delta
        )
        assert 0 <= r.drop_ppm <= 1_000_000
    # delta split covers ~20% of the corpus
    n_docs = load_table(spark, sf_dir, "documents").count()
    n_delta = sum(r.n_delta for r in rows)
    assert 0 < n_delta < n_docs


def test_kfold_and_ladder_nesting(spark, sf_dir):
    rows = corpus.kfold_balance_report(spark, sf_dir).collect()
    assert {r.fold for r in rows} <= set(range(5))
    # folds partition each stratum
    docs = load_table(spark, sf_dir, "documents")
    by_lang = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    got_lang: Counter = Counter()
    for r in rows:
        got_lang[r.lang] += r.cnt
    assert dict(got_lang) == by_lang
    ladder = {r.target_pct: r for r in corpus.sampling_ladder(spark, sf_dir).collect()}
    assert list(sorted(ladder)) == [10, 20, 40, 80]
    # nested: each rung strictly extends the previous
    for a, b in [(10, 20), (20, 40), (40, 80)]:
        assert ladder[a].n_docs <= ladder[b].n_docs
        assert ladder[a].n_tokens <= ladder[b].n_tokens
    for pct, r in ladder.items():
        assert abs(r.realized_ppm - pct * 10000) < 100000


def test_decayed_trend_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import timeops

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    h_day = max(r.ts // 86400000000000 for r in ev)
    daily: Counter = Counter()
    for r in ev:
        daily[(r.event_type, r.ts // 86400000000000)] += 1
    agg: dict[str, list] = {}
    for (et, day), n in daily.items():
        w = int(round(2.0 ** (-float(h_day - day) / 7.0) * 1000000.0))
        a = agg.setdefault(et, [0, 0])
        a[0] += n
        a[1] += n * w
    expect = {et: (n, s // 1000000, s) for et, (n, s) in agg.items()}
    rows = timeops.decayed_event_trend(spark, sf_dir).collect()
    got = {r.event_type: (r.n_events, r.trend_score, r.score_e6) for r in rows}
    assert got == expect
    # decayed score never exceeds the raw count
    assert all(s[1] <= s[0] for s in got.values())


def test_daily_value_bands_replay(spark, sf_dir):
    import math as _math

    from parquet_to_csv_spark.operators import timeops

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    groups: dict[tuple, list] = {}
    for r in ev:
        groups.setdefault((r.ts // 86400000000000, r.event_type), []).append(
            _cents(r.value)
        )
    expect = {}
    for key, cs in groups.items():
        cs.sort()
        n = len(cs)
        def pick(p):
            return cs[int(_math.floor(float(n - 1) * p))]
        expect[key] = (n, pick(0.5), pick(0.9), pick(0.99))
    rows = timeops.daily_value_bands(spark, sf_dir).collect()
    got = {
        (r.day, r.event_type): (r.n_events, r.p50_cents, r.p90_cents, r.p99_cents)
        for r in rows
    }
    assert got == expect
    for n, p50, p90, p99 in got.values():
        assert p50 <= p90 <= p99


def test_windowed_conversion_rate_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import timeops

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts").collect()
    views: dict[int, int] = {}
    for r in ev:
        if r.event_type == "view":
            views[r.user_id] = min(views.get(r.user_id, r.ts), r.ts)
    fb: dict[int, int] = {}
    for r in ev:
        if r.event_type == "purchase" and r.user_id in views and r.ts >= views[r.user_id]:
            fb[r.user_id] = min(fb.get(r.user_id, r.ts), r.ts)
    agg: dict[int, list] = {}
    for u, v in views.items():
        day = (v // 1000) // 86400000000
        a = agg.setdefault(day, [0, 0])
        a[0] += 1
        p = fb.get(u)
        # op compares in ns, oracle in us — both floor the same events
        if p is not None and p - v < 24 * 3600 * 10**9:
            a[1] += 1
    expect = {d: (n, c, c * 1000000 // n) for d, (n, c) in agg.items()}
    rows = timeops.windowed_conversion_rate(spark, sf_dir).collect()
    got = {r.cohort_day: (r.n_cohort, r.n_converted, r.cvr_ppm) for r in rows}
    assert got == expect


def test_psi_value_drift_properties(spark, sf_dir):
    from parquet_to_csv_spark.operators import mlmetrics

    rows = mlmetrics.psi_value_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # PSI is a sum of (p-q)ln(p/q) terms, each nonnegative
        assert r.psi_micro >= 0
        assert r.worst_bin_micro >= 0
        assert r.worst_bin_micro <= r.psi_micro


def test_theil_sen_trend_replay(spark, sf_dir):
    import math as _math

    from parquet_to_csv_spark.operators import mlmetrics

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily: Counter = Counter()
    for r in ev:
        daily[(r.event_type, (r.ts // 1000) // 86400000000)] += 1
    by_type: dict[str, list] = {}
    for (et, d), n in daily.items():
        by_type.setdefault(et, []).append((d, n))
    expect = {}
    for et, xs in by_type.items():
        xs.sort()
        slopes = []
        for i, (d1, n1) in enumerate(xs):
            for d2, n2 in xs[i + 1:]:
                slopes.append((float(n2 - n1) / float(d2 - d1), d1, d2))
        if not slopes:
            continue
        slopes.sort()
        np_ = len(slopes)
        med = slopes[int(_math.floor(float(np_ - 1) * 0.5))][0]
        expect[et] = (np_, _math.floor(med * 1e6))
    rows = mlmetrics.theil_sen_trend(spark, sf_dir).collect()
    got = {r.event_type: (r.n_pairs, r.slope_micro) for r in rows}
    assert got == expect


def test_udtf_chunks_matches_relational(spark, sf_dir):
    from parquet_to_csv_spark.operators import pandas_ops

    udtf_rows = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
        for r in pandas_ops.udtf_chunks(spark, sf_dir).collect()
    )
    rel_rows = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
        for r in corpus.doc_chunks(spark, sf_dir).collect()
    )
    assert udtf_rows == rel_rows and udtf_rows


def test_rolling_hll_error_bound(spark, sf_dir):
    from parquet_to_csv_spark.operators import sketch

    rows = sketch.rolling_distinct_hll(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 256 registers -> ~6.5% standard error; allow 4 sigma
        assert abs(r.hll_estimate - r.n_exact) <= max(0.30 * r.n_exact, 8)
    # rolling window must cover at least as many users as any single day
    days = sorted(r.day for r in rows)
    assert len(days) == len(set(days))


def test_partition_advisor_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import relational

    rows = {r.table_name: r for r in relational.partition_layout_advisor(spark, sf_dir).collect()}
    assert set(rows) == {"documents", "events", "orders", "lineitem"}
    docs = load_table(spark, sf_dir, "documents").collect()
    est = sum(8 + len(r.text) + len(r.lang) + len(r.source) + 8 for r in docs)
    r = rows["documents"]
    assert (r.n_rows, r.est_bytes) == (len(docs), est)
    assert r.parts_128mb == (est + 134217728 - 1) // 134217728
    assert r.avg_row_bytes == est // len(docs)


def test_conversion_ztest_replay(spark, sf_dir):
    import math as _math

    from parquet_to_csv_spark.operators import mlmetrics

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts").collect()
    views: dict[int, int] = {}
    for r in ev:
        if r.event_type == "view":
            views[r.user_id] = min(views.get(r.user_id, r.ts), r.ts)
    fb: dict[int, int] = {}
    for r in ev:
        if r.event_type == "purchase" and r.user_id in views and r.ts >= views[r.user_id]:
            fb[r.user_id] = min(fb.get(r.user_id, r.ts), r.ts)
    arms = {0: [0, 0], 1: [0, 0]}
    for u, v in views.items():
        wk = 1 if ((v // 86400000000000) + 4) % 7 >= 5 else 0
        arms[wk][0] += 1
        p = fb.get(u)
        if p is not None and p - v < 86400 * 10**9:
            arms[wk][1] += 1
    (n1, x1), (n2, x2) = arms[1], arms[0]
    p_pool = float(x1 + x2) / float(n1 + n2)
    z = (float(x1) / float(n1) - float(x2) / float(n2)) / _math.sqrt(
        p_pool * (1.0 - p_pool) * (1.0 / float(n1) + 1.0 / float(n2))
    )
    rows = mlmetrics.conversion_ztest(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n1, r.x1, r.n2, r.x2) == (n1, x1, n2, x2)
    assert r.z_milli == _math.floor(z * 1000.0)


def test_dedup_strategy_tiers_disjoint(spark, sf_dir):
    from parquet_to_csv_spark.operators import dedup

    rows = {r.tier: r for r in dedup.dedup_strategy_report(spark, sf_dir).collect()}
    assert set(rows) == {"exact", "normalized", "near_dup_j08"}
    n_docs = load_table(spark, sf_dir, "documents").count()
    total_removable = sum(r.n_docs_removable for r in rows.values())
    assert total_removable < n_docs
    for r in rows.values():
        assert r.n_docs_removable >= 0 and r.tokens_removable >= 0


def test_product_quantization_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import similarity

    emb = {r.vec_id: [float(x) for x in r.embedding]
           for r in load_table(spark, sf_dir, "embeddings").collect()}
    cents = {i: emb[i] for i in range(16) if i in emb}
    expect = {}
    for vid, v in emb.items():
        codes, err_total = [], 0
        for s in range(8):
            sv = v[s * 8 : s * 8 + 8]
            best = None
            for cid, c in sorted(cents.items()):
                cs = c[s * 8 : s * 8 + 8]
                d = sum((x - y) * (x - y) for x, y in zip(sv, cs))
                if best is None or d < best[0]:
                    best = (d, cid, cs)
            codes.append(best[1])
            err_total += sum(
                int(round((x - y) * 1e6)) ** 2 for x, y in zip(sv, best[2])
            )
        expect[vid] = ("-".join(str(c) for c in codes), err_total)
    rows = similarity.product_quantization(spark, sf_dir).collect()
    got = {r.vec_id: (r.code_word, r.recon_err_e12) for r in rows}
    assert got == expect
    # centroid vectors must encode themselves with zero error
    for i in cents:
        assert got[i][1] == 0


def test_ann_recall_report_consistency(spark, sf_dir):
    from parquet_to_csv_spark.operators import similarity

    rows = similarity.ann_recall_report(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_common <= r.n_exact == 5
        assert r.recall_ppm == r.n_common * 1000000 // r.n_exact
    # IVF with nprobe=4/16 cells should find most exact neighbors
    mean_recall = sum(r.recall_ppm for r in rows) / len(rows)
    assert mean_recall >= 400000


def test_truncation_quality_monotone(spark, sf_dir):
    from parquet_to_csv_spark.operators import similarity

    rows = {r.prefix_dims: r for r in similarity.truncation_quality(spark, sf_dir).collect()}
    assert set(rows) == {8, 16, 32}
    # more dims -> closer to the full cosine
    assert rows[8].mean_absdelta_micro >= rows[16].mean_absdelta_micro
    assert rows[16].mean_absdelta_micro >= rows[32].mean_absdelta_micro
    for r in rows.values():
        assert 0 <= r.mean_absdelta_micro <= r.max_absdelta_micro


def test_cohort_ltv_curve_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import relational

    orders = load_table(spark, sf_dir, "orders").collect()
    per: dict[tuple, int] = {}
    for r in orders:
        m = r.o_orderdate.year * 12 + r.o_orderdate.month
        per[(r.o_custkey, m)] = per.get((r.o_custkey, m), 0) + _cents(r.o_totalprice)
    m0: dict[int, int] = {}
    for (cu, m) in per:
        m0[cu] = min(m0.get(cu, m), m)
    sizes: Counter = Counter(m0.values())
    inc: dict[tuple, int] = {}
    for (cu, m), s in per.items():
        key = (m0[cu], m - m0[cu])
        inc[key] = inc.get(key, 0) + s
    expect = {}
    for c0 in sizes:
        cum = 0
        for t in sorted(t for (cc, t) in inc if cc == c0):
            cum += inc[(c0, t)]
            expect[(c0, t)] = (sizes[c0], cum, cum // sizes[c0])
    rows = relational.cohort_ltv_curve(spark, sf_dir).collect()
    got = {
        (r.cohort_month, r.tenure): (r.n_users, r.cum_cents, r.avg_ltv_cents)
        for r in rows
    }
    assert got == expect


def test_duplicate_payment_pairs_finds_planted(spark, sf_dir):
    from parquet_to_csv_spark.operators import relational

    rows = relational.duplicate_payment_pairs(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").collect()
    planted = {r.o_orderkey for r in orders if r.o_orderkey % 97 == 0}
    assert rows and len(rows) == len(planted)
    for r in rows:
        assert r.order_b == r.order_a + 1000000000
        assert r.order_a in planted
        assert r.day_gap == 1


def test_taint_closure_consistency(spark, sf_dir):
    from parquet_to_csv_spark.operators import dedup

    rows = dedup.taint_closure_report(spark, sf_dir).collect()
    clusters = dedup.dup_clusters(spark, sf_dir).collect()
    docs = {r.doc_id: r.source for r in load_table(spark, sf_dir, "documents").collect()}
    by_cluster: dict[int, list] = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    expect = {}
    for cid, members in by_cluster.items():
        tainted = [d for d in members if docs[d].endswith("3")]
        if tainted:
            expect[cid] = (len(members), len(tainted), len(members) - len(tainted))
    got = {r.cluster_id: (r.n_docs, r.n_tainted_direct, r.n_tainted_via_closure)
           for r in rows}
    assert got == expect


def test_source_centroid_distances_symmetry(spark, sf_dir):
    from parquet_to_csv_spark.operators import similarity

    rows = similarity.source_centroid_distances(spark, sf_dir).collect()
    srcs = {r["source"] for r in load_table(spark, sf_dir, "documents").select("source").distinct().collect()}
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b
        assert r.dist_sq_e12 >= 0


def test_novelty_scores_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import dedup

    pairs = dedup.ngram_jaccard_pairs(spark, sf_dir, threshold=0.5).collect()
    agg: dict[int, list] = {}
    for p in pairs:
        later, earlier = max(p.doc_a, p.doc_b), min(p.doc_a, p.doc_b)
        import math as _math
        jm = int(_math.floor(p.jaccard * 1000 + 0.5))  # HALF_UP like both engines
        a = agg.setdefault(later, [])
        a.append((jm, earlier))
    expect = {}
    for d, xs in agg.items():
        xs.sort(key=lambda x: (-x[0], x[1]))
        expect[d] = (xs[0][1], len(xs), 1000 - xs[0][0])
    rows = dedup.novelty_scores(spark, sf_dir).collect()
    got = {r.doc_id: (r.nearest_earlier, r.n_earlier_matches, r.novelty_milli)
           for r in rows}
    assert got == expect
    assert all(0 <= v[2] <= 500 for v in got.values())


def test_fold_auc_partition_and_sanity(spark, sf_dir):
    from parquet_to_csv_spark.operators import mlmetrics

    rows = mlmetrics.fold_auc_variance(spark, sf_dir).collect()
    assert len(rows) == 5
    assert {r.fold for r in rows} == set(range(5))
    # deviations sum to ~0 (floored mean introduces at most k-1 ppm slack)
    assert abs(sum(r.dev_ppm for r in rows)) < 5 * 5
    docs = load_table(spark, sf_dir, "documents")
    n_en = docs.filter("lang = 'en'").count()
    assert sum(r.pos_n for r in rows) == n_en
    for r in rows:
        assert 0 <= r.auc_ppm <= 1_000_000


def test_packing_efficiency_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import corpus as corpus_ops

    docs = load_table(spark, sf_dir, "documents").collect()
    nts = [len(_toks(r.text)) for r in docs if _toks(r.text)]
    total = sum(nts)
    rows = {r.ctx_len: r for r in corpus_ops.packing_efficiency(spark, sf_dir).collect()}
    for c in (128, 256, 512):
        r = rows[c]
        pad = sum((nt + c - 1) // c for nt in nts)
        packed = (total + c - 1) // c
        assert (r.n_docs, r.total_tokens) == (len(nts), total)
        assert r.padded_seqs == pad
        assert r.packed_seqs == packed
        assert r.padded_waste_ppm == (pad * c - total) * 1000000 // (pad * c)
        assert r.packed_waste_ppm == (packed * c - total) * 1000000 // (packed * c)
        # packing never needs more sequences than padding
        assert packed <= pad


def test_cluster_quality_cohesion_bound(spark, sf_dir):
    from parquet_to_csv_spark.operators import similarity

    rows = similarity.cluster_quality_index(spark, sf_dir).collect()
    assert rows
    emb_n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in rows) == emb_n
    for r in rows:
        # separation ratio is own/other; a usable clustering keeps it < 1
        assert r.mean_own_dsq_e12 >= 0 and r.mean_other_dsq_e12 > 0
        assert r.separation_ppm == r.mean_own_dsq_e12 * 1000000 // r.mean_other_dsq_e12


def test_transition_dwell_replay(spark, sf_dir):
    import math as _math

    from parquet_to_csv_spark.operators import timeops

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts // 1000, r.event_id, r.event_type))
    gaps: dict[tuple, list] = {}
    for xs in by_user.values():
        xs.sort()
        for (t1, _, e1), (t2, _, e2) in zip(xs, xs[1:]):
            gaps.setdefault((e1, e2), []).append((t2 - t1) // 1000000)
    expect = {}
    for k, gs in gaps.items():
        gs.sort()
        n = len(gs)
        expect[k] = (
            n,
            gs[int(_math.floor(float(n - 1) * 0.5))],
            gs[int(_math.floor(float(n - 1) * 0.9))],
        )
    rows = timeops.transition_dwell_percentiles(spark, sf_dir).collect()
    got = {
        (r.prev_type, r.next_type): (r.n_transitions, r.p50_gap_s, r.p90_gap_s)
        for r in rows
    }
    assert got == expect


def test_region_share_sums_to_unity(spark, sf_dir):
    from parquet_to_csv_spark.operators import relational

    rows = relational.region_share_report(spark, sf_dir).collect()
    assert rows
    by_month: dict[int, int] = {}
    for r in rows:
        by_month[r.ym] = by_month.get(r.ym, 0) + r.month_share_ppm
    # floored shares sum to 1e6 within |regions| ppm slack
    for ym, s in by_month.items():
        assert 1_000_000 - 5 <= s <= 1_000_000
    for r in rows:
        assert 0 <= r.ytd_share_ppm <= 1_000_000


def test_token_rank_movers_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents").collect()
    mid = (min(r.doc_id for r in docs) + max(r.doc_id for r in docs) + 1) // 2
    counts = {0: Counter(), 1: Counter()}
    for r in docs:
        counts[1 if r.doc_id >= mid else 0].update(_toks(r.text))
    ranks = {}
    for h, c in counts.items():
        order = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        ranks[h] = {t: (i + 1, f) for i, (t, f) in enumerate(order)}
    joined = [
        (t, ranks[0][t][0], ranks[1][t][0], ranks[0][t][1], ranks[1][t][1])
        for t in set(ranks[0]) & set(ranks[1])
    ]
    joined.sort(key=lambda x: (-abs(x[1] - x[2]), x[0]))
    expect = {
        t: (re, rl, rl - re, fe, fl, i + 1)
        for i, (t, re, rl, fe, fl) in enumerate(joined[:20])
    }
    rows = text_ops.token_rank_movers(spark, sf_dir).collect()
    got = {
        r.token: (r.rank_early, r.rank_late, r.rank_delta, r.freq_early,
                  r.freq_late, r.mover_rnk)
        for r in rows
    }
    assert got == expect


def test_annotation_batch_stratification(spark, sf_dir):
    from parquet_to_csv_spark.operators import dedup

    rows = dedup.annotation_batch(spark, sf_dir).collect()
    assert rows
    by_band: dict[int, list] = {}
    for r in rows:
        by_band.setdefault(r.band, []).append(r)
        assert r.band == r.j_milli // 100
        assert 500 <= r.j_milli <= 1000
    for band, xs in by_band.items():
        assert len(xs) <= 3
        assert sorted(r.sample_rank for r in xs) == list(range(1, len(xs) + 1))
    # the sample spans more than one similarity band
    assert len(by_band) >= 2


def test_shared_frame_pairs_replay(spark, sf_dir):
    import hashlib as _hl

    from parquet_to_csv_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").collect()
    frames: dict[str, list] = {}
    for r in docs:
        b = (r.text or "").encode()
        n_frames = (len(b) + 63) // 64
        for i in range(0, n_frames, 2):
            h = _hl.md5(b[i * 64 : (i + 1) * 64]).hexdigest()
            frames.setdefault(h, []).append(r.doc_id)
    expect: Counter = Counter()
    for ds in frames.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b2 in ds[i + 1:]:
                if a != b2:
                    expect[(a, b2)] += 1
    rows = multimodal.shared_frame_pairs(spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b): r.n_shared_frames for r in rows}
    assert got == dict(expect)
    assert got, "fixture must contain at least one shared frame"


def test_props_typed_promotion_replay(spark, sf_dir):
    import json as _json

    from parquet_to_csv_spark.operators import semistruct

    ev = load_table(spark, sf_dir, "events").select("event_type", "props").collect()
    counts: Counter = Counter()
    unparsed = 0
    for r in ev:
        try:
            k = _json.loads(r.props).get("k")
        except (TypeError, ValueError):
            k = None
        if k is None:
            unparsed += 1
        else:
            counts[(r.event_type, k // 10)] += 1
    rows = semistruct.props_typed_promotion(spark, sf_dir).collect()
    got = {(r.event_type, r.k_band): r.n_events for r in rows}
    assert got == dict(counts)
    assert all(r.n_unparsed == unparsed for r in rows)


def test_join_fanout_matches_actual_join(spark, sf_dir):
    from parquet_to_csv_spark.operators import relational

    r = relational.join_fanout_estimate(spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    actual = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert r.est_join_rows == actual
    assert r.max_key_fanout >= r.est_join_rows // max(r.n_matching_keys, 1)


def test_blocklist_screen_replay(spark, sf_dir):
    rows = corpus.blocklist_screen(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    bl = set(corpus.BLOCKLIST)
    agg: dict[str, list] = {}
    for r in docs:
        ts = _toks(r.text)
        hits = sum(1 for t in ts if t in bl)
        a = agg.setdefault(r.source, [0, 0, 0])
        a[0] += 1
        if set(ts) & bl:
            a[1] += 1
        a[2] += hits
    expect = {
        s: (n, f, h, f * 1000000 // n) for s, (n, f, h) in agg.items()
    }
    got = {r.source: (r.n_docs, r.n_flagged, r.total_hits, r.flagged_ppm)
           for r in rows}
    assert got == expect
    assert any(v[1] > 0 for v in got.values()), "blocklist must be non-vacuous"


def test_release_manifest_agrees_with_components(spark, sf_dir):
    from parquet_to_csv_spark.operators import dedup
    from pyspark.sql import functions as F

    m = corpus.release_manifest(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    assert m.n_docs == docs.count()
    # dup rate agrees with the exact-dedup operator
    n_unique = dedup.exact_dedup(spark, sf_dir).count()
    assert m.dup_ppm == (m.n_docs - n_unique) * 1000000 // m.n_docs
    # pii incidence agrees with pii_scan
    n_pii = corpus.pii_scan(spark, sf_dir).count()
    assert m.pii_ppm == n_pii * 1000000 // m.n_docs
    # quality pass rate agrees with the source card roll-up
    card = corpus.source_quality_report(spark, sf_dir).collect()
    n_ok = sum(r.quality_ok_ppm * r.n_docs for r in card)  # approx check
    assert 0 <= m.quality_ok_ppm <= 1_000_000
    # k-risk agrees with the k-anonymity audit at k=5
    k5 = {r.k: r for r in corpus.k_anonymity_audit(spark, sf_dir).collect()}[5]
    assert m.k5_risk_ppm == k5.n_docs_at_risk * 1000000 // m.n_docs


def test_discount_elasticity_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import relational

    li = load_table(spark, sf_dir, "lineitem").select("l_discount", "l_quantity").collect()
    agg: dict[int, list] = {}
    for r in li:
        b = int(round(r.l_discount * 100))
        a = agg.setdefault(b, [0, 0])
        a[0] += 1
        a[1] += _cents(r.l_quantity)
    b_n, b_q = agg[0]
    expect = {
        b: (n, q * 10 // n, (q * b_n) * 1000000 // (b_q * n))
        for b, (n, q) in agg.items()
    }
    rows = relational.discount_elasticity(spark, sf_dir).collect()
    got = {r.disc_pct: (r.n_lines, r.avg_qty_milli, r.lift_vs_base_ppm) for r in rows}
    assert got == expect
    assert got[0][2] == 1_000_000  # baseline lift is exactly 1


def test_supplier_variability_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import relational

    orders = {r.o_orderkey: r.o_orderdate for r in load_table(spark, sf_dir, "orders").collect()}
    li = load_table(spark, sf_dir, "lineitem").collect()
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    lags: dict[int, list] = {}
    for r in li:
        od = (orders[r.l_orderkey] - epoch).days
        sd = (r.l_shipdate - epoch).days
        lags.setdefault(r.l_suppkey, []).append(sd - od)
    scored = []
    for s, xs in lags.items():
        if len(xs) < 2:
            continue
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        scored.append((s, n, sx * 1000 // n, (n * sxx - sx * sx) * 1000 // (n * n)))
    scored.sort(key=lambda x: (-x[3], x[0]))
    expect = scored[:15]
    rows = relational.supplier_leadtime_variability(spark, sf_dir).collect()
    got = [(r.l_suppkey, r.n, r.mean_lag_milli, r.var_milli) for r in rows]
    assert got == expect


def test_markov_accuracy_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import mlmetrics

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    pairs = []
    for xs in by_user.values():
        xs.sort()
        pairs.extend(zip((t for _, _, t in xs), (t for _, _, t in xs[1:])))
    trans: Counter = Counter(pairs)
    per_prev: dict[str, Counter] = {}
    for (a, b), c in trans.items():
        per_prev.setdefault(a, Counter())[b] = c
    g_counts: Counter = Counter(b for _, b in pairs)
    g_pred = max(g_counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
    expect = {}
    for a, cs in per_prev.items():
        pred, top_c = max(cs.items(), key=lambda kv: (kv[1], kv[0]))
        n = sum(cs.values())
        acc = top_c * 1000000 // n
        base = cs.get(g_pred, 0) * 1000000 // n
        expect[a] = (pred, n, acc, base, acc - base)
    rows = mlmetrics.markov_prediction_accuracy(spark, sf_dir).collect()
    got = {
        r.prev: (r.predicted, r.n_transitions, r.accuracy_ppm, r.baseline_ppm,
                 r.lift_ppm)
        for r in rows
    }
    assert got == expect
    # the conditional model can never lose to its own baseline
    assert all(v[4] >= 0 for v in got.values())


def test_value_qq_table_monotone(spark, sf_dir):
    from parquet_to_csv_spark.operators import mlmetrics

    rows = sorted(mlmetrics.value_qq_table(spark, sf_dir).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 10))
    views = [r.view_cents for r in rows]
    buys = [r.purchase_cents for r in rows]
    assert views == sorted(views) and buys == sorted(buys)
    for r in rows:
        assert r.ratio_ppm == r.purchase_cents * 1000000 // r.view_cents


def test_curation_ledger_monotone(spark, sf_dir):
    rows = {r.stage: r for r in corpus.curation_ledger(spark, sf_dir).collect()}
    assert [rows[s].stage_name for s in sorted(rows)] == [
        "raw", "quality", "deduped", "sampled"
    ]
    counts = [rows[s].n_docs for s in sorted(rows)]
    assert counts == sorted(counts, reverse=True)
    assert rows[1].n_docs == load_table(spark, sf_dir, "documents").count()
    for s in (2, 3, 4):
        assert rows[s].retained_ppm == rows[s].n_docs * 1000000 // rows[s - 1].n_docs
    # ledger's final stage agrees with the capstone pipeline's doc count
    cap = corpus.corpus_curation_pipeline(spark, sf_dir).collect()
    # capstone also applies alpha-free quality (same two predicates) then
    # chunks; distinct docs there == sampled survivors here
    assert sum(r.n_docs for r in cap) == rows[4].n_docs


def test_filter_selectivity_advisor_replay(spark, sf_dir):
    rows = {r.predicate: r for r in corpus.filter_selectivity_advisor(spark, sf_dir).collect()}
    assert set(rows) == {"min_tokens", "unique_ratio", "alpha_ratio", "ALL"}
    # conjunction can never pass more than any single predicate
    for p in ("min_tokens", "unique_ratio", "alpha_ratio"):
        assert rows["ALL"].pass_ppm <= rows[p].pass_ppm


def test_embedding_norm_audit_replay(spark, sf_dir):
    import math as _math

    from parquet_to_csv_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings").collect()
    bands: Counter = Counter()
    zeros: Counter = Counter()
    for v in emb:
        n = _math.sqrt(sum(float(x) * float(x) for x in v.embedding))
        b = int(_math.floor(n * 10.0))
        bands[b] += 1
        if n == 0.0:
            zeros[b] += 1
    total = len(emb)
    expect = {
        b: (c, zeros.get(b, 0), c * 1000000 // total) for b, c in bands.items()
    }
    rows = similarity.embedding_norm_audit(spark, sf_dir).collect()
    got = {r.norm_band: (r.n_vectors, r.n_zero, r.share_ppm) for r in rows}
    assert got == expect


def test_length_bias_audit_consistency(spark, sf_dir):
    rows = corpus.length_bias_audit(spark, sf_dir).collect()
    assert rows
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    total_pass = sum(r.n_pass for r in rows)
    for r in rows:
        assert 0 <= r.pass_ppm <= 1_000_000
        assert r.share_of_pass_ppm == r.n_pass * 1000000 // total_pass


def test_cluster_size_distribution_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import dedup

    clusters = dedup.dup_clusters(spark, sf_dir).collect()
    sizes: Counter = Counter()
    for r in clusters:
        sizes[r.cluster_id] += 1
    hist: Counter = Counter(sizes.values())
    n_clustered = sum(sizes.values())
    expect = {
        sz: (c, sz * c, sz * c * 1000000 // n_clustered) for sz, c in hist.items()
    }
    rows = dedup.cluster_size_distribution(spark, sf_dir).collect()
    got = {r.cluster_size: (r.n_clusters, r.n_docs, r.doc_share_ppm) for r in rows}
    assert got == expect
    assert min(got) >= 2  # a cluster needs at least one pair


def test_sampler_representativeness_consistency(spark, sf_dir):
    rows = corpus.sampler_representativeness(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_pop for r in rows) == n_docs
    sampled = corpus.deterministic_sample(spark, sf_dir).count()
    assert sum(r.n_samp for r in rows) == sampled
    for r in rows:
        assert r.dev_ppm == r.samp_share_ppm - r.pop_share_ppm
        assert 0 <= r.n_samp <= r.n_pop


def test_vocab_growth_curve_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import text as text_ops

    docs = sorted(load_table(spark, sf_dir, "documents").collect(),
                  key=lambda r: r.doc_id)
    lo, hi = docs[0].doc_id, docs[-1].doc_id + 1
    firsts: dict[str, int] = {}
    tokens_per: Counter = Counter()
    for r in docs:
        d = min((r.doc_id - lo) * 10 // (hi - lo), 9)
        for t in _toks(r.text):
            tokens_per[d] += 1
            if t not in firsts:
                firsts[t] = d
    new_types: Counter = Counter(firsts.values())
    expect = {}
    vs = ct = 0
    for d in sorted(set(new_types) | set(tokens_per)):
        vs += new_types.get(d, 0)
        ct += tokens_per.get(d, 0)
        expect[d] = (new_types.get(d, 0), tokens_per.get(d, 0), vs, ct)
    rows = text_ops.vocab_growth_curve(spark, sf_dir).collect()
    got = {r.decile: (r.n_new_types, r.n_tokens, r.vocab_size, r.cum_tokens)
           for r in rows}
    assert got == expect
    # vocabulary growth is monotone and concave-ish: later deciles add fewer
    assert expect[max(expect)][0] <= expect[min(expect)][0]


def test_return_rate_leaders_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import relational

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag").collect()
    per: dict[int, list] = {}
    for r in li:
        a = per.setdefault(r.l_partkey, [0, 0])
        a[0] += 1
        if r.l_returnflag == "R":
            a[1] += 1
    scored = [
        (p, n, ret, ret * 1000000 // n)
        for p, (n, ret) in per.items() if n >= 5
    ]
    scored.sort(key=lambda x: (-x[3], x[0]))
    expect = scored[:15]
    rows = relational.return_rate_leaders(spark, sf_dir).collect()
    got = [(r.l_partkey, r.n_lines, r.n_returned, r.return_ppm) for r in rows]
    assert got == expect


def test_canonical_quality_gap_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import dedup

    clusters = dedup.dup_clusters(spark, sf_dir).collect()
    docs = {r.doc_id: len(_toks(r.text))
            for r in load_table(spark, sf_dir, "documents").collect()}
    by_cluster: dict[int, list] = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append((r.doc_id, r.is_canonical))
    expect = {}
    for cid, ms in by_cluster.items():
        canon = next(docs[d] for d, c in ms if c)
        best = max(docs[d] for d, _ in ms)
        expect[cid] = (len(ms), canon, best, best - canon,
                       (best - canon) * 1000000 // best)
    rows = dedup.canonical_quality_gap(spark, sf_dir).collect()
    got = {r.cluster_id: (r.n_docs, r.canon_nt, r.best_nt, r.gap_tokens, r.gap_ppm)
           for r in rows}
    assert got == expect


def test_engagement_curve_covers_all_users(spark, sf_dir):
    from parquet_to_csv_spark.operators import timeops

    rows = timeops.engagement_conversion_curve(spark, sf_dir).collect()
    assert len(rows) >= 2, "bucketing must spread users across bands"
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 0 <= r.cvr_ppm <= 1_000_000
        assert r.cvr_ppm == r.n_converted * 1000000 // r.n_users


def test_bursty_token_leaders_replay(spark, sf_dir):
    from parquet_to_csv_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents").collect()
    tf: Counter = Counter()
    df_sets: dict[str, set] = {}
    for r in docs:
        ts = _toks(r.text)
        tf.update(ts)
        for t in set(ts):
            df_sets.setdefault(t, set()).add(r.doc_id)
    scored = [
        (t, c, len(df_sets[t]), c * 1000 // len(df_sets[t]))
        for t, c in tf.items() if c >= 50
    ]
    scored.sort(key=lambda x: (-x[3], x[0]))
    expect = scored[:20]
    rows = text_ops.bursty_token_leaders(spark, sf_dir).collect()
    got = [(r.token, r.tf, r.df, r.burst_milli) for r in rows]
    assert got == expect


def test_rollup_lattice_agrees(spark, sf_dir):
    from parquet_to_csv_spark.operators import timeops

    rows = {r.grain: r for r in timeops.rollup_lattice_check(spark, sf_dir).collect()}
    assert set(rows) == {"raw", "hourly", "daily"}
    base = (rows["raw"].n_events, rows["raw"].sum_cents)
    for g in ("hourly", "daily"):
        assert (rows[g].n_events, rows[g].sum_cents) == base
