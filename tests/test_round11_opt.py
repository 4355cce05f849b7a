"""Round-11/12 optimization invariants.

1. Round 12 DELETED the round-11 ``spark.graft.vectors.unrollDim``
   fast path (verdict item 8 — integrated measurement showed the
   unrolled Catalyst trees regress every consumer). The ``dim=``
   parameter survives as an inert seam: passing any value (right,
   wrong, or None) must be a no-op, and the old conf must do nothing.
2. The PPJoin positional filter added to ``ngram_jaccard_pairs`` must
   not change the verified pair relation (it only prunes candidate rows
   that can never verify): pinned against a filter-free replica of the
   original candidate join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_to_csv_spark.functions.vectors import dot_product, l2_norm
from parquet_to_csv_spark.operators import dedup, similarity
from parquet_to_csv_spark.sources.tables import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_dim_param_inert_expressions(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("a") % 7 == F.col("b") % 7)
    slow = pairs.select(
        "a", "b",
        dot_product(F.col("ea"), F.col("eb")).alias("d"),
        l2_norm(F.col("ea")).alias("n"),
        similarity._sqdist(F.col("ea"), F.col("eb")).alias("s"),
    )
    fast = pairs.select(
        "a", "b",
        dot_product(F.col("ea"), F.col("eb"), 64).alias("d"),
        l2_norm(F.col("ea"), 64).alias("n"),
        similarity._sqdist(F.col("ea"), F.col("eb"), 64).alias("s"),
    )
    assert _rows(slow) == _rows(fast)  # exact ==, not approx: bit parity


def test_dim_param_wrong_value_inert(spark, sf_dir):
    """Even a wrong dim must be a no-op — the parameter is dead."""
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    wrong = emb.select(dot_product(F.col("embedding"), F.col("embedding"), 63).alias("d"))
    right = emb.select(dot_product(F.col("embedding"), F.col("embedding")).alias("d"))
    assert _rows(wrong) == _rows(right)


def test_unroll_conf_deleted(spark, sf_dir):
    """The old conf must change nothing: _emb_dim is constant None and
    cosine_topk plans/results are identical with the conf set."""
    assert similarity._emb_dim(spark, sf_dir) is None
    base = _rows(similarity.cosine_topk(spark, sf_dir))
    spark.conf.set("spark.graft.vectors.unrollDim", "true")
    try:
        assert similarity._emb_dim(spark, sf_dir) is None
        fast = _rows(similarity.cosine_topk(spark, sf_dir))
    finally:
        spark.conf.unset("spark.graft.vectors.unrollDim")
    assert base == fast


@pytest.fixture(scope="module")
def token_base(spark, sf_dir):
    return dedup._token_base(spark, sf_dir)


def test_positional_filter_preserves_pairs(spark, sf_dir, token_base):
    """ngram_jaccard_pairs (with the PPJoin positional filter) must
    produce exactly the pair relation of the unfiltered candidate join
    at every tier threshold, blocked and unblocked."""
    base = token_base
    for threshold, blocked in ((0.8, False), (0.8, True), (0.5, True)):
        plen = (
            F.col("sz") - F.floor(F.lit(threshold) * F.col("sz")) + 1
        ).cast("int")
        pref = base.select(
            "doc_id", "lang", "source", "sz",
            F.explode(F.slice("toks", F.lit(1), plen)).alias("ptok"),
        )
        a, b = pref.alias("a"), pref.alias("b")
        eps = 1e-9
        cond = (
            (F.col("a.ptok") == F.col("b.ptok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.sz") >= F.lit(threshold) * F.col("b.sz") - F.lit(eps))
            & (F.col("b.sz") >= F.lit(threshold) * F.col("a.sz") - F.lit(eps))
        )
        if blocked:
            cond = (
                (F.col("a.lang") == F.col("b.lang"))
                & (F.col("a.source") == F.col("b.source"))
                & cond
            )
        cand = (
            a.join(b, cond)
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        sa = base.select(
            F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a")
        )
        sb = base.select(
            F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b")
        )
        inter = F.size(F.array_intersect("toks_a", "toks_b"))
        union = F.size("toks_a") + F.size("toks_b") - inter
        jac = F.when(union > 0, inter / union.cast("double"))
        reference = (
            cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
        )
        got = dedup.ngram_jaccard_pairs(spark, sf_dir, threshold, blocked=blocked)
        assert _rows(got) == _rows(reference), (threshold, blocked)
