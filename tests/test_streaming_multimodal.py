"""Streaming wiring + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from parquet_to_csv_spark.operators import multimodal, timeops
from parquet_to_csv_spark.sources.tables import load_table
from parquet_to_csv_spark.streaming import stream as streaming


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    """Copy the events fixture into a plain directory (streaming wants a
    directory source it can list)."""
    out = str(tmp_path_factory.mktemp("evstream"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_streaming_tumbling_matches_batch(spark, sf_dir, event_dir):
    """The streaming aggregation, drained with availableNow, must equal
    the batch tumbling aggregation over the same data."""
    s = streaming.read_event_stream(spark, event_dir)
    out = streaming.run_to_memory(
        streaming.streaming_tumbling_counts(s), "t_stream_tumble", spark
    )
    got = {
        (r["ws_ms"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    batch = {
        (r["ws_ms"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in timeops.tumbling_window_stats(spark, sf_dir).collect()
    }
    assert got == batch


def test_streaming_sessions_run(spark, event_dir):
    s = streaming.read_event_stream(spark, event_dir)
    out = streaming.run_to_memory(streaming.streaming_sessions(s), "t_stream_sess", spark)
    rows = out.collect()
    assert rows and all(r["n_events"] >= 1 for r in rows)


def test_multimodal_feature_extraction(spark, sf_dir):
    payloads = multimodal.attach_payloads(load_table(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(payloads)
    assert feats.schema == multimodal.FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == payloads.count()
    for r in rows[:20]:
        assert len(r["features"]) == multimodal.N_FEATURES
        if r["n_bytes"] > 0:
            assert abs(sum(r["features"]) - 1.0) < 1e-5  # normalized histogram
    # deterministic across runs
    again = {r["doc_id"]: r["payload_sha"] for r in feats.collect()}
    assert {r["doc_id"]: r["payload_sha"] for r in rows} == again


def test_multimodal_no_shuffle(spark, sf_dir):
    payloads = multimodal.attach_payloads(load_table(spark, sf_dir, "documents"))
    plan = multimodal.extract_features(payloads)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # decode fan-out must not reshuffle


def test_decode_media_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG", "image")


def test_stateful_user_totals_matches_batch(spark, sf_dir, event_dir):
    """applyInPandasWithState running totals, drained to completion,
    must equal the batch groupBy over the same events (update-mode sink
    may emit intermediates — the per-user max is the final state)."""
    from parquet_to_csv_spark.streaming import stateful

    s = streaming.read_event_stream(spark, event_dir)
    out = (
        stateful.stateful_user_totals(s)
        .writeStream.format("memory")
        .queryName("t_stateful_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination()
    got_df = spark.table("t_stateful_totals")
    final = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["last_ts_us"])
        for r in got_df.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        ).filter("rn = 1").collect()
    }
    batch = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["last_ts_us"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max(F.expr("ts div 1000")).alias("last_ts_us"),
        )
        .collect()
    }
    assert final == batch


def test_streaming_dedup_drops_staged_duplicates(spark, sf_dir):
    from parquet_to_csv_spark.sources.tables import load_table
    from parquet_to_csv_spark.streaming.stream import dedup_drain_query

    got = dedup_drain_query(spark, sf_dir)
    n_events = load_table(spark, sf_dir, "events").count()
    assert got.count() == n_events
    assert got.select("event_id").distinct().count() == n_events


def test_embedding_quantize_fidelity(spark, sf_dir):
    """Dequantized values are within half a quantization step, and the
    int8 range is fully used (max |q| == 127 for non-zero vectors)."""
    from pyspark.sql import functions as F

    from parquet_to_csv_spark.operators.similarity import embedding_quantize
    from parquet_to_csv_spark.sources.tables import load_table

    q = embedding_quantize(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    j = q.join(emb, "vec_id").filter(F.col("scale") > 0)
    err = j.select(
        F.array_max(
            F.zip_with(
                "q",
                "embedding",
                lambda qi, xi: F.abs(qi / F.col("scale") - xi.cast("double")),
            )
        ).alias("max_err"),
        (F.array_max(F.transform("q", F.abs)) == 127).alias("full_range"),
        (F.lit(0.5) / F.col("scale")).alias("half_step"),
    )
    bad = err.filter(
        (F.col("max_err") > F.col("half_step") + 1e-9) | ~F.col("full_range")
    ).count()
    assert bad == 0


def test_frame_sample_digests_and_fanout(spark, sf_dir):
    """Frame rows reproduce driver-side byte slicing exactly (offset
    geometry AND per-frame md5), including the 1→N Arrow fan-out."""
    import hashlib

    from parquet_to_csv_spark.operators.multimodal import attach_payloads, frame_sample
    from parquet_to_csv_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    texts = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    rows = frame_sample(attach_payloads(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, frames in by_doc.items():
        p = texts[doc_id]
        n_frames = (len(p) + 255) // 256
        assert sorted(r["frame_idx"] for r in frames) == list(range(0, n_frames, 2))
        for r in frames:
            chunk = p[r["frame_off"] : r["frame_off"] + 256]
            assert r["frame_len"] == len(chunk)
            assert r["frame_md5"] == hashlib.md5(chunk).hexdigest()


def test_foreach_batch_idempotent_sink(spark, sf_dir, tmp_path):
    """Draining the same staged input twice through the idempotent
    foreachBatch sink leaves exactly one copy per batch partition
    (the replayed batch overwrites itself, never duplicates)."""
    import os

    from parquet_to_csv_spark.sources.tables import load_table
    from parquet_to_csv_spark.streaming.stream import (
        read_event_stream,
        stream_to_parquet_idempotent,
    )

    stage = str(tmp_path / "ev_in")
    out = str(tmp_path / "ev_out")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("long").alias("ts"), "user_id",
        "event_type", "value", F.lit(None).cast("string").alias("props"),
    )
    ev.coalesce(2).write.parquet(stage)
    stream_to_parquet_idempotent(read_event_stream(spark, stage), out, spark)
    first = spark.read.parquet(out)
    n = ev.count()
    assert first.count() == n
    # replay: wipe the checkpoint so the SAME input reprocesses under
    # the same batch ids — rows must overwrite, not append
    import shutil

    shutil.rmtree(out + "_chk")
    stream_to_parquet_idempotent(read_event_stream(spark, stage), out, spark)
    again = spark.read.parquet(out)
    assert again.count() == n
    assert again.select("event_id").distinct().count() == n


def test_sorted_export_total_order(spark, sf_dir, tmp_path):
    from parquet_to_csv_spark.sources.layout import write_sorted_export
    from parquet_to_csv_spark.sources.tables import load_table

    out = str(tmp_path / "sorted")
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    write_sorted_export(ev, out, 4, "event_id")
    import glob

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    prev_max = None
    total = 0
    for f in files:
        pdf = spark.read.parquet(f).toPandas()
        total += len(pdf)
        assert (pdf["event_id"].values[:-1] <= pdf["event_id"].values[1:]).all()
        if prev_max is not None and len(pdf):
            assert pdf["event_id"].min() > prev_max
        if len(pdf):
            prev_max = pdf["event_id"].max()
    assert total == ev.count()


def test_resize_thumbnails_deterministic(spark, sf_dir):
    import hashlib

    from parquet_to_csv_spark.operators.multimodal import (
        attach_payloads,
        resize_thumbnails,
    )
    from parquet_to_csv_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    texts = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    rows = resize_thumbnails(attach_payloads(docs)).collect()
    assert len(rows) == len(texts)
    for r in rows:
        p = texts[r["doc_id"]]
        if len(p) <= 64:
            expect = p
        else:
            stride = len(p) / 64
            expect = bytes(p[int(i * stride)] for i in range(64))
        assert bytes(r["thumb"]) == expect
        assert r["thumb_len"] == len(expect) and r["thumb_len"] <= 64
        assert r["thumb_sha"] == hashlib.sha256(expect).hexdigest()


def test_stream_static_enrich_matches_batch_join(spark, sf_dir, event_dir):
    drained = streaming.run_to_memory(
        streaming.streaming_static_enrich(
            streaming.read_event_stream(spark, event_dir),
            load_table(spark, sf_dir, "customer"),
        ),
        "t_static_enrich_test",
        spark,
        output_mode="append",
    )
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    expected = ev.join(cust, ev.user_id == cust.c_custkey).count()
    assert drained.count() == expected
    # stateless: every drained row carries its dim attributes
    assert drained.filter(F.col("c_mktsegment").isNull()).count() == 0


def test_stateful_idle_eviction_times_out_and_emits_totals(spark, sf_dir, tmp_path):
    """EventTimeTimeout eviction: stage events so each user's rows
    land in exactly ONE micro-batch (user-bucketed files,
    maxFilesPerTrigger=1), then a sentinel batch whose far-future
    event time pushes the watermark past every real user's
    ``last event + IDLE_GAP_MS`` deadline. The trailing no-data batch
    must evict each user exactly once with totals equal to the batch
    groupBy — while the sentinel itself (deadline still ahead of the
    final watermark) must not be emitted at all."""
    import shutil
    from pathlib import Path

    from parquet_to_csv_spark.streaming import stateful

    ev = load_table(spark, sf_dir, "events")
    stage = tmp_path / "evict_stage"
    stage.mkdir()
    k = 3
    for b in range(k):
        part = tmp_path / f"bucket{b}"
        ev.filter(F.pmod(F.col("user_id"), F.lit(k)) == b).coalesce(1).write.parquet(
            str(part)
        )
        src = next(Path(part).glob("part-*.parquet"))
        # zero-padded names keep listing order == write order
        shutil.copy(src, stage / f"{b:02d}.parquet")
    # sentinel event time = global max + ~10 years (ns): advances the
    # watermark past every user's idle deadline while its own deadline
    # stays ahead of the final watermark (gap > 0), so it is never
    # evicted before the drain ends.
    max_ts_ns = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(-(10**6), max_ts_ns + 315 * 10**15, -1, "noop", 0.0, "{}")],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    sdir = tmp_path / "sentinel"
    sentinel.coalesce(1).write.parquet(str(sdir))
    shutil.copy(next(Path(sdir).glob("part-*.parquet")), stage / f"{k:02d}.parquet")

    s = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stage))
    )
    q = (
        # delay > the fixture's full time span: the user-bucketed files
        # are time-interleaved, so a tight disorder bound would drop
        # later buckets' rows as late.
        stateful.stateful_idle_eviction(s, watermark_delay="90 days")
        .writeStream.format("memory")
        .queryName("t_evict")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["last_ts_us"])
        for r in spark.table("t_evict").collect()
    }
    assert -1 not in got  # sentinel never evicted (stream ended first)
    batch = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["last_ts_us"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "sum_value"
            ),
            F.max(F.expr("ts div 1000")).alias("last_ts_us"),
        )
        .collect()
    }
    assert got == batch
    # exactly-once close-out: no duplicate emissions per user
    assert spark.table("t_evict").count() == len(batch)


def test_multibatch_out_of_order_stream_matches_batch(spark, sf_dir, tmp_path):
    """Statefulness across micro-batches under out-of-order arrival:
    stage the events REVERSE-time-ordered into 5 files, feed them one
    file per trigger (5 micro-batches, each batch older than the
    last), aggregate in complete mode with an effectively-unbounded
    watermark — the final emission must equal the batch aggregation
    exactly. This is the incremental-state guarantee the single-batch
    drains can't exercise."""
    stage = str(tmp_path / "ooo")
    ev = load_table(spark, sf_dir, "events")
    (
        ev.orderBy(F.desc("ts"))
        .repartitionByRange(5, F.desc("ts"))
        .write.mode("overwrite")
        .parquet(stage)
    )
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    from parquet_to_csv_spark.functions.stable import stable_sum_2dp

    agg = (
        streaming.with_event_time(s)
        .withWatermark("event_time", "3650 days")
        .groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            stable_sum_2dp(F.col("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("ws_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    out = streaming.run_to_memory(agg, "t_ooo_multibatch", spark, "complete")
    got = sorted(map(tuple, out.collect()))
    want = sorted(
        map(tuple, timeops.tumbling_window_stats(spark, sf_dir)
            .select("ws_ms", "event_type", "n_events", "sum_value").collect())
    )
    assert got == want


def test_tight_watermark_drops_late_rows_predictably(spark, sf_dir, tmp_path):
    """Watermark SEMANTICS, not just wiring: with newest data arriving
    in batch 1 and older data in later batches, a tight watermark must
    drop aggregates for windows older than (max_seen_event_time −
    delay) — and the surviving window set must match the closed-form
    prediction computed from the data."""
    import glob
    import os
    import shutil

    stage = str(tmp_path / "late")
    os.makedirs(stage)
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    third = (hi - lo) // 3 + 1
    # FileStreamSource orders files by (mtime, path): write each time
    # range to its own single file and FORCE newest-data-first
    # processing with explicit mtimes (task-completion mtimes are
    # nondeterministic — this test was flaky without the utime pin)
    base = 1_000_000_000
    for i in range(3):  # i=0 newest range
        r_lo = hi - (i + 1) * third + 1
        r_hi = hi - i * third
        tmp = str(tmp_path / f"w{i}")
        ev.filter((F.col("ts") >= r_lo) & (F.col("ts") <= r_hi)).coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        (src_file,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dst = os.path.join(stage, f"batch{i}.parquet")
        shutil.copy(src_file, dst)
        os.utime(dst, (base + i, base + i))
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(stage)
    )
    delay_ms = 24 * 3600 * 1000
    agg = (
        streaming.with_event_time(s)
        .withWatermark("event_time", "24 hours")
        .groupBy(F.window("event_time", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_millis(F.col("w.start")).alias("ws_ms"), "n")
    )
    out = streaming.run_to_memory(agg, "t_late_drop", spark, "append")
    got = {r["ws_ms"] for r in out.collect()}

    # semantic invariants (robust to the exact range-partition split):
    # the FINAL watermark is global_max_event_time − delay (the newest
    # rows arrived in batch 1), so (1) every emitted window must close
    # at or below that bar; (2) the window holding the global max must
    # NOT emit; (3) late arrival must have dropped strictly more than
    # the above-the-bar windows alone — i.e. some below-the-bar window
    # is missing too (its rows arrived in a later batch, below the
    # already-advanced watermark).
    ms = [r["ts"] // 1_000_000 for r in ev.select("ts").collect()]
    final_wm = max(ms) - delay_ms
    assert got, "append-mode drain emitted nothing"
    assert all(w + 3600000 <= final_wm for w in got)
    all_windows = {m // 3600000 * 3600000 for m in ms}
    newest_window = max(ms) // 3600000 * 3600000
    assert newest_window not in got
    below_bar = {w for w in all_windows if w + 3600000 <= final_wm}
    assert got < below_bar, "no late rows were dropped — watermark inert"


def test_backfill_batch_half_builds_without_jobs(spark, sf_dir):
    """Round-4 regression gate for the E337 plan-build collect: the
    batch half's cutoff is an in-plan broadcast bounds join, so
    CONSTRUCTING it must run zero Spark jobs (round 3 collected the
    day bounds eagerly — a full events scan before the query ran)."""
    sc = spark.sparkContext
    # first touch of a parquet table can run a footer/schema-read job;
    # warm it so the probe counts only plan-construction jobs
    load_table(spark, sf_dir, "events").schema
    sc.setJobGroup("bf_build_probe", "backfill plan build")
    try:
        batch_half, ev, cut = streaming._backfill_batch_half(spark, sf_dir)
        _schema = batch_half.schema  # analysis only — still no job
    finally:
        sc.setJobGroup(None, None)
    assert sc.statusTracker().getJobIdsForGroup("bf_build_probe") == []
    # and the plan really carries the bounds join, not a literal cutoff
    plan = batch_half._sc._jvm.PythonSQLUtils.explainString(
        batch_half._jdf.queryExecution(), "formatted"
    )
    assert "cutoff_ns" in plan
