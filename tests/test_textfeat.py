"""Batch tests for the collocation / hashing / leakage / gap-fill ops:
semantics vs independent recomputation + the plan-shape contracts."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import corpus, text, timeops
from parquet_to_csv_spark.sources.tables import load_table


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _toks(s: str) -> list[str]:
    return [t for t in re.split(r"\s+", s.lower()) if t]


def test_pmi_matches_python_replay(spark, sf_dir):
    rows = text.pmi_bigrams(spark, sf_dir).collect()
    docs = [r.text for r in load_table(spark, sf_dir, "documents").collect()]
    bi: Counter = Counter()
    uni: Counter = Counter()
    for d in docs:
        ts = _toks(d)
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    t_bi = sum(bi.values())
    t_uni = sum(uni.values())

    def u(k: int) -> int:
        return round(math.log(k) * 1e6)

    expect = sorted(
        (
            (u(c) + 2 * u(t_uni) - u(t_bi) - u(uni[w1]) - u(uni[w2]), w1, w2, c)
            for (w1, w2), c in bi.items()
            if c >= 5
        ),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:20]
    got = [(r.pmi_unats, r.w1, r.w2, r.n_xy) for r in rows]
    assert got == expect
    # top-k must plan as TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in _physical(text.pmi_bigrams(spark, sf_dir))


def test_feature_hashing_digest_replay(spark, sf_dir):
    rows = {r.doc_id: r for r in text.feature_hashing(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    hexd = "0123456789abcdef"

    def bucket(s: str, m: int) -> int:
        h = hashlib.md5(s.encode()).hexdigest()
        v = sum(hexd.index(h[i]) * w for i, w in enumerate((4096, 256, 16, 1)))
        return v % m

    for d in docs[:25]:
        vec: Counter = Counter()
        for t in _toks(d.text):
            sgn = 1 if bucket("sign:" + t, 2) == 0 else -1
            vec[bucket(t, 1024)] += sgn
        entries = sorted((i, v) for i, v in vec.items() if v != 0)
        digest = hashlib.md5(
            ",".join(f"{i}:{v}" for i, v in entries).encode()
        ).hexdigest()
        r = rows[d.doc_id]
        assert (r.nnz, r.l1, r.vec_digest) == (
            len(entries),
            sum(abs(v) for _, v in entries),
            digest,
        )


def test_split_leakage_sides_disjoint(spark, sf_dir):
    rows = corpus.split_leakage(spark, sf_dir).collect()
    b = corpus.md5_bucket(F.col("doc_id"), 100)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", b.alias("bucket")
    )
    val_ids = {r.doc_id for r in docs.filter("bucket >= 80").collect()}
    train_ids = {r.doc_id for r in docs.filter("bucket < 80").collect()}
    for r in rows:
        assert r.val_doc in val_ids
        assert r.train_doc in train_ids
        assert 500_000 <= r.containment_ppm <= 1_000_000
    # no quadratic join in the plan
    plan = _physical(corpus.split_leakage(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gapfill_dense_and_carries_forward(spark, sf_dir):
    out = timeops.daily_balance_gapfill(spark, sf_dir)
    rows = sorted(
        out.collect(), key=lambda r: (r.user_id, r.day)
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in by_user.items():
        days = [r.day for r in rs]
        # dense calendar: every day between min and max present exactly once
        assert days == list(range(days[0], days[-1] + 1))
        # first day is an observation; gaps carry the previous fill
        assert rs[0].is_gap is False
        prev = rs[0].filled_cents
        for r in rs[1:]:
            if r.is_gap:
                assert r.filled_cents == prev
            prev = r.filled_cents
    # spot-check one observed day against raw recomputation
    ev = load_table(spark, sf_dir, "events")
    raw = (
        ev.filter("event_type = 'purchase'")
        .select(
            "user_id",
            F.expr("ts div 1000 div 86400000000").alias("day"),
            F.floor(F.col("value") * 100 + 0.5).alias("cents"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("cents").alias("c"))
        .collect()
    )
    raw_map = {(r.user_id, r.day): r.c for r in raw}
    for r in rows:
        if not r.is_gap:
            assert r.filled_cents == raw_map[(r.user_id, r.day)]
