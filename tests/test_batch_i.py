"""Batch tests: distance-to-centroid outlier replay, source card
consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import corpus, similarity
from parquet_to_csv_spark.sources.tables import load_table


def test_outlier_scores_replay(spark, sf_dir):
    rows = similarity.embedding_outlier_scores(spark, sf_dir, k=3).collect()
    emb = load_table(spark, sf_dir, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(r)
    import decimal

    expect: dict[int, list] = {}
    for label, vs in by_label.items():
        dim = len(vs[0].embedding)
        mus = []
        for i in range(dim):
            s = sum(decimal.Decimal(repr(float(v.embedding[i]))) for v in vs)
            # replay the engine's decimal-sum -> double -> round(.,6)
            mus.append(round(float(s) / len(vs), 6))
        scored = []
        for v in vs:
            d = sum(
                round((float(v.embedding[i]) - mus[i]) * 1e6) ** 2
                for i in range(dim)
            )
            scored.append((d, v.vec_id))
        scored.sort(key=lambda x: (-x[0], x[1]))
        expect[label] = scored[:3]
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.label, r.rnk)):
        got.setdefault(r.label, []).append((r.dist_sq_e12, r.vec_id))
    assert got == expect


def test_source_quality_report_consistency(spark, sf_dir):
    rows = corpus.source_quality_report(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r.dup_ppm <= 1_000_000
        assert 0 <= r.quality_ok_ppm <= 1_000_000
        assert r.total_tokens > 0
