"""Training-data pipeline operators (operators/corpus.py)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import corpus
from parquet_to_csv_spark.sources.tables import load_table


def test_doc_chunks_reconstruct(spark, sf_dir):
    """Taking the first `stride` tokens of every chunk (all of the
    last) rebuilds the document's token sequence exactly — i.e. the
    sliding windows cover everything, in order, with the declared
    overlap and no gaps."""
    chunks = corpus.doc_chunks(spark, sf_dir, chunk_size=64, overlap=16)
    got = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"].split(" ")
        for r in chunks.collect()
    }
    docs = {
        r["doc_id"]: [t for t in r["text"].lower().split() if t]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    checked = 0
    for doc_id, toks in docs.items():
        if not toks:
            assert (doc_id, 0) not in got
            continue
        idxs = sorted(i for (d, i) in got if d == doc_id)
        assert idxs == list(range(len(idxs)))
        rebuilt: list[str] = []
        for i in idxs:
            c = got[(doc_id, i)]
            assert len(c) <= 64
            rebuilt.extend(c[:48] if i < idxs[-1] else c)
        assert rebuilt == toks
        checked += 1
    assert checked > 0


def test_deterministic_sample_is_stable(spark, sf_dir):
    a = {r["doc_id"] for r in corpus.deterministic_sample(spark, sf_dir).collect()}
    b = {r["doc_id"] for r in corpus.deterministic_sample(spark, sf_dir).collect()}
    n = load_table(spark, sf_dir, "documents").count()
    assert a == b
    assert 0 < len(a) < n
    buckets = corpus.deterministic_sample(spark, sf_dir).agg(
        F.max("sample_bucket")
    ).collect()[0][0]
    assert buckets < 10


def test_pii_scan_counts_and_redaction(spark, sf_dir):
    rows = {r["doc_id"]: r for r in corpus.pii_scan(spark, sf_dir).collect()}
    # doc 0 divides 7, 11, 13 and 17 — every kind planted exactly once.
    assert rows[0]["n_email"] == 1
    assert rows[0]["n_phone"] == 1
    assert rows[0]["n_ssn"] == 1
    assert rows[0]["n_ip"] == 1
    # a doc with no planted PII never surfaces (1 is coprime to all).
    assert 1 not in rows
    # redaction removed every match: recompute one redaction in Python.
    aug = corpus._augmented_text()
    docs = load_table(spark, sf_dir, "documents")
    sample = docs.filter(F.col("doc_id") == 0).select(aug.alias("aug")).collect()[0]["aug"]
    red = sample
    for k in corpus.PII_ORDER:
        red = re.sub(corpus.PII_PATTERNS[k], f"[{k.upper()}]", red)
    for p in corpus.PII_PATTERNS.values():
        assert not re.search(p, red)
    import hashlib

    assert rows[0]["redacted_fp"] == hashlib.md5(red.encode()).hexdigest()


def test_unigram_lm_score_bounds(spark, sf_dir):
    scored = corpus.unigram_lm_score(spark, sf_dir)
    bad = scored.filter(
        (F.col("avg_logprob") >= 0) | (F.col("n_tokens") <= 0)
    ).count()
    assert bad == 0
    # n_tokens agrees with the independent per-doc tokenizer count.
    from parquet_to_csv_spark.operators.text import token_counts

    tc = token_counts(spark, sf_dir).select("doc_id", "n_tokens_ws")
    diff = (
        scored.join(tc, "doc_id")
        .filter(F.col("n_tokens") != F.col("n_tokens_ws"))
        .count()
    )
    assert diff == 0


def test_ewma_matches_local_fold(spark, sf_dir):
    """The grouped-pandas EWMA equals a driver-side replay of the same
    float64 recurrence over the same (ts, event_id) order."""
    from collections import defaultdict

    from parquet_to_csv_spark.operators.pandas_ops import user_value_ewma
    from parquet_to_csv_spark.sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_id", "user_id", "ts div 1000 AS ts_us", "value")
        .collect()
    )
    series = defaultdict(list)
    for r in ev:
        series[r["user_id"]].append((r["ts_us"], r["event_id"], r["value"]))
    expect = {}
    for uid, rows in series.items():
        prev = None
        for ts, eid, x in sorted(rows):
            prev = float(x) if prev is None else 0.1 * float(x) + 0.9 * prev
            expect[eid] = prev
    got = user_value_ewma(spark, sf_dir).collect()
    assert len(got) == len(ev)
    for r in got:
        assert r["ewma"] == round(expect[r["event_id"]], 6) or abs(
            r["ewma"] - expect[r["event_id"]]
        ) < 1e-9


def test_jsonl_roundtrip_rowlevel(spark, sf_dir, tmp_path):
    """Row-exact JSONL round-trip (not just the aggregated gate)."""
    from parquet_to_csv_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    stage = str(tmp_path / "jl")
    docs.write.json(stage)
    back = spark.read.schema("doc_id long, lang string, source string, text string").json(stage)
    orig = docs.select("doc_id", "lang", "source", "text")
    assert back.count() == orig.count()
    assert back.exceptAll(orig).count() == 0


def test_sequence_packing_gapless_and_partition_independent(spark, sf_dir):
    rows = sorted(
        corpus.sequence_packing(spark, sf_dir, ctx_len=256, n_parts=8).collect(),
        key=lambda r: r["doc_id"],
    )
    # gapless concatenation: each doc starts where the previous ended
    cum = 0
    for r in rows:
        assert r["cum_before"] == cum
        assert r["seq_id"] == cum // 256 and r["seq_offset"] == cum % 256
        assert r["n_seqs"] == (cum + r["n_tokens"] - 1) // 256 - cum // 256 + 1
        cum += r["n_tokens"]
    # the layout is a property of the DATA, not the partitioning:
    # a different scan-partition count must produce identical offsets
    alt = sorted(
        corpus.sequence_packing(spark, sf_dir, ctx_len=256, n_parts=3).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in alt] == [tuple(r) for r in rows]


def test_sequence_packing_reuses_range_exchange(spark, sf_dir):
    df = corpus.sequence_packing(spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    final = executed.split("== Initial Plan ==")[0]
    # one tokenization pass: the totals branch reads the range shuffle
    # again instead of re-scanning + re-tokenizing the corpus
    assert "ReusedExchange" in final
    assert final.count("FileScan parquet") == 1
    # and the big-side prefix sum is windowed per partition id — never
    # an unpartitioned global window over the corpus relation
    assert "windowspecdefinition(pid" in final
