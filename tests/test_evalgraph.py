"""Batch tests: ranking eval (NDCG), quota sampling, classifier-eval
confusion, association rules, clustering coefficient."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import corpus, dedup, relational, similarity, text
from parquet_to_csv_spark.sources.tables import load_table


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_ndcg_matches_python_replay(spark, sf_dir):
    k = 10
    ranked = similarity.cosine_topk(spark, sf_dir, n_queries=5, k=k).collect()
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    lab_n: dict[int, int] = {}
    for v in labels.values():
        lab_n[v] = lab_n.get(v, 0) + 1

    def d(i: int) -> int:
        return round(1e6 / math.log2(i + 1))

    expect = {}
    by_q: dict[int, list] = {}
    for r in ranked:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        dcg = sum(d(r.rnk) for r in rs if labels[r.cand_id] == labels[q])
        n_rel = sum(1 for r in rs if labels[r.cand_id] == labels[q])
        slots = min(k, lab_n[labels[q]] - 1)
        idcg = sum(d(i) for i in range(1, slots + 1))
        expect[q] = (n_rel, dcg, dcg * 1_000_000 // idcg if idcg > 0 else None)
    got = {
        r.query_id: (r.n_rel_at_k, r.dcg_units, r.ndcg_ppm)
        for r in similarity.ndcg_label_match(spark, sf_dir).collect()
    }
    assert got == expect
    assert all(v[2] is None or 0 <= v[2] <= 1_000_000 for v in got.values())


def test_group_sample_quota_and_nesting(spark, sf_dir):
    s20 = corpus.group_sample_fixed(spark, sf_dir, n=20).collect()
    s5 = corpus.group_sample_fixed(spark, sf_dir, n=5).collect()
    sizes = (
        load_table(spark, sf_dir, "documents").groupBy("lang").count().collect()
    )
    per_lang = {r.lang: r["count"] for r in sizes}
    got20: dict[str, set] = {}
    for r in s20:
        got20.setdefault(r.lang, set()).add(r.doc_id)
    for lang, ids in got20.items():
        assert len(ids) == min(20, per_lang[lang])
    # nested: the 5-sample is a subset of the 20-sample
    for r in s5:
        assert r.doc_id in got20[r.lang]


def test_langid_confusion_shares_sum(spark, sf_dir):
    rows = text.langid_confusion(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    by_true: dict[str, list] = {}
    for r in rows:
        by_true.setdefault(r.true_lang, []).append(r)
    for rs in by_true.values():
        total = sum(r.n_docs for r in rs)
        # floored ppm shares sum to within len(rs) ulps of 1e6
        s = sum(r.share_ppm for r in rs)
        assert 1_000_000 - len(rs) < s <= 1_000_000
        for r in rs:
            assert r.share_ppm == r.n_docs * 1_000_000 // total


def test_association_rules_measures(spark, sf_dir):
    rows = relational.association_rules(spark, sf_dir, min_pair=2, k=50).collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    item: dict[int, int] = {}
    for parts in baskets.values():
        for p in parts:
            item[p] = item.get(p, 0) + 1
    n_orders = len(baskets)
    for r in rows:
        c_ab = sum(
            1
            for parts in baskets.values()
            if r.antecedent in parts and r.consequent in parts
        )
        assert r.c_ab == c_ab
        assert r.support_ppm == c_ab * 1_000_000 // n_orders
        assert r.confidence_ppm == c_ab * 1_000_000 // item[r.antecedent]
        assert (
            r.lift_ppm
            == c_ab * n_orders * 1_000_000 // (item[r.antecedent] * item[r.consequent])
        )
    plan = _physical(relational.association_rules(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_clustering_coefficient_replay(spark, sf_dir):
    rows = dedup.clustering_coefficient(spark, sf_dir).collect()
    edges = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {r.doc_id: r for r in rows}
    assert set(got) == set(adj)
    for v, nbrs in adj.items():
        d = len(nbrs)
        t = sum(1 for x in nbrs for y in nbrs if x < y and y in adj.get(x, set()))
        r = got[v]
        assert r.degree == d and r.n_triangles == t
        if d >= 2:
            assert r.cc_ppm == 2 * t * 1_000_000 // (d * (d - 1))
        else:
            assert r.cc_ppm is None
