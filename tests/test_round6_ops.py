"""Round-6 operators E419–E423 — targeted semantics tests
(the registry oracle gate covers value parity; these pin the claims
the oracle can't express)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_approx_percentile_guarantee_flags(spark):
    from parquet_to_csv_spark.operators.relational import approx_percentile_audit

    rows = approx_percentile_audit(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["p50_within_guarantee"] and r["p90_within_guarantee"]
        assert r["p50_exact"] <= r["p90_exact"]


def test_pipe_syntax_equals_nested_spelling(spark):
    from parquet_to_csv_spark.plans.sqlapi import pipe_syntax_report
    from parquet_to_csv_spark.sources.tables import register_views

    piped = {tuple(r) for r in pipe_syntax_report(spark, SF_DIR).collect()}
    register_views(spark, SF_DIR)
    nested = {
        tuple(r)
        for r in spark.sql(
            """
            SELECT cast(year(l_shipdate) as int) AS ship_year,
                   CAST(count(*) AS BIGINT) AS n_returned_lines,
                   CAST(sum(cast(floor(l_extendedprice * (1 - l_discount)
                        * 100 + 0.5) as long)) AS BIGINT)
                     AS returned_charge_cents
            FROM lineitem WHERE l_returnflag = 'R'
            GROUP BY 1 HAVING count(*) > 10
            """
        ).collect()
    }
    assert piped == nested and piped


def test_statestore_read_matches_batch_counts(spark):
    from parquet_to_csv_spark.sources.tables import load_table
    from parquet_to_csv_spark.streaming.stream import (
        statestore_introspection_drain,
    )

    got = {
        r["event_type"]: r["n_events"]
        for r in statestore_introspection_drain(spark, SF_DIR).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and got


def test_embedding_contamination_matches_numpy(spark):
    from parquet_to_csv_spark.operators.similarity import (
        embedding_contamination_report,
    )
    from parquet_to_csv_spark.sources.tables import load_table

    got = {
        r["label"]: (r["n_vectors"], r["n_contaminated"])
        for r in embedding_contamination_report(spark, SF_DIR).collect()
    }
    pdf = load_table(spark, SF_DIR, "embeddings").toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bench = mat[pdf["label"] == 0]
    want = {}
    for lbl in sorted(set(pdf["label"]) - {0}):
        rows = mat[pdf["label"] == lbl]
        sims = np.round(rows @ bench.T, 6)
        mx = sims.max(axis=1)
        want[lbl] = (len(rows), int((mx >= 0.35).sum()))
    assert got == want and got


def test_sequential_patterns_match_bruteforce(spark):
    from parquet_to_csv_spark.operators.timeops import sequential_pattern_topk
    from parquet_to_csv_spark.sources.tables import load_table

    got = {
        (r["step_1"], r["step_2"], r["step_3"]): r["support"]
        for r in sequential_pattern_topk(spark, SF_DIR, k=10).collect()
    }
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "event_type",
                F.expr("ts div 1000").alias("us"))
        .collect()
    )
    seqs: dict = {}
    for r in sorted(ev, key=lambda r: (r["us"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append(r["event_type"])

    def supports(seq, pat):
        i = 0
        for s in seq:
            if s == pat[i]:
                i += 1
                if i == 3:
                    return True
        return False

    from collections import Counter

    types = sorted({r["event_type"] for r in ev})
    support: Counter = Counter()
    for seq in seqs.values():
        for a in types:
            for b in types:
                for c in types:
                    if supports(seq, (a, b, c)):
                        support[(a, b, c)] += 1
    for pat, s in got.items():
        assert support[pat] == s, (pat, s, support[pat])
    # top-k really is the top: no unreported pattern beats the cutoff
    if got:
        cutoff = min(got.values())
        better = [p for p, s in support.items() if s > cutoff and p not in got]
        assert not better


def test_doremi_weights_exact_ppm_and_monotone(spark):
    from parquet_to_csv_spark.operators.corpus import doremi_lite_weights

    rows = doremi_lite_weights(spark, SF_DIR).collect()
    assert sum(r["weight_ppm"] for r in rows) == 1_000_000
    hardest = max(rows, key=lambda r: r["excess_micro"])
    easiest = min(rows, key=lambda r: r["excess_micro"])
    assert hardest["weight_ppm"] >= max(r["weight_ppm"] for r in rows) - 1
    assert easiest["weight_ppm"] <= hardest["weight_ppm"]


def test_position_delete_lifecycle(spark, tmp_path):
    from parquet_to_csv_spark.sources.layout import (
        commit_deletes,
        commit_version,
        read_version,
    )

    tdir = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(10)], "id long, tag string"
    )
    v0 = commit_version(spark, tdir, df)
    v1 = commit_deletes(spark, tdir, "tag = 'drop'")
    assert (v0, v1) == (0, 1)
    assert read_version(spark, tdir, 1).count() == 5
    # time travel: pre-delete snapshot untouched
    assert read_version(spark, tdir, 0).count() == 10
    # append AFTER the delete: new rows visible even when they would
    # match the old predicate — position semantics, not value semantics
    spark_df2 = spark.createDataFrame([(100, "drop"), (101, "keep")],
                                      "id long, tag string")
    v2 = commit_version(spark, tdir, spark_df2, mode="append")
    assert v2 == 2
    final = read_version(spark, tdir)
    assert final.count() == 7
    assert final.filter("tag = 'drop'").count() == 1  # only the appended one
    # a second delete layers on top of the first
    commit_deletes(spark, tdir, "id = 1")
    assert read_version(spark, tdir).count() == 6


def test_rake_phrases_contain_no_stopwords(spark):
    import pyspark.sql.functions as F

    from parquet_to_csv_spark.functions.textfn import tokens_col
    from parquet_to_csv_spark.operators.text import rake_keywords
    from parquet_to_csv_spark.sources.tables import load_table

    rows = rake_keywords(spark, SF_DIR).collect()
    assert rows and all(1 <= len(r["phrase"].split()) <= 4 for r in rows)
    tok = load_table(spark, SF_DIR, "documents").select(
        F.explode(tokens_col("text")).alias("w"), "doc_id"
    )
    stop = {
        r["w"]
        for r in tok.groupBy("w")
        .agg(F.count_distinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), "w")
        .limit(15)
        .collect()
    }
    for r in rows:
        assert not (set(r["phrase"].split()) & stop), r["phrase"]
    scores = [r["score_milli"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_cluster_modularity_matches_python(spark):
    from parquet_to_csv_spark.operators.dedup import (
        cluster_modularity_report,
        connected_components,
        dedup_edges,
    )
    import math

    got = cluster_modularity_report(spark, SF_DIR).collect()[0]
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_edges(spark, SF_DIR, 0.8).collect()
    ]
    import pyspark.sql.functions as F  # noqa: F401

    lbl = {
        r["v"]: r["cluster_id"]
        for r in connected_components(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    m = len(edges)
    deg: dict = {}
    e_c: dict = {}
    for a, b in edges:
        ca, cb = lbl[a], lbl[b]
        deg[ca] = deg.get(ca, 0) + 1
        deg[cb] = deg.get(cb, 0) + 1
        if ca == cb:
            e_c[ca] = e_c.get(ca, 0) + 1
    se = sum(e_c.values())
    sd2 = sum(d * d for d in deg.values())
    q = se / m - sd2 / (4.0 * m * m)
    assert got["m_edges"] == m
    assert got["modularity_micro"] == math.floor(q * 1e6 + 0.5)


def test_identifier_clause_rejects_injection(spark):
    import pytest
    from parquet_to_csv_spark.plans.sqlapi import identifier_parameterized_report

    ok = identifier_parameterized_report(spark, SF_DIR).collect()
    assert ok
    with pytest.raises(Exception):
        identifier_parameterized_report(
            spark, SF_DIR, table="orders WHERE 1=1; DROP TABLE orders"
        ).collect()


def test_wav_codec_roundtrip_and_boundaries(spark):
    import numpy as np
    import pytest
    import struct

    from parquet_to_csv_spark.functions import audiocodec as ac

    # mono + stereo round-trips
    mono = (np.arange(1000) % 7 * 100 - 300).astype(np.int16)
    rate, ch, got = ac.decode_wav(ac.encode_wav(mono, 16000))
    assert (rate, ch) == (16000, 1) and np.array_equal(got[:, 0], mono)
    st = np.stack([mono, -mono], axis=1)
    rate, ch, got = ac.decode_wav(ac.encode_wav(st, 44100))
    assert (rate, ch) == (44100, 2) and np.array_equal(got, st)
    # ancillary chunk before data is skipped (word-aligned walk)
    raw = ac.encode_wav(mono, 8000)
    body = raw[12:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = b"RIFF" + struct.pack("<I", 4 + len(extra) + len(body)) + b"WAVE" + extra + body
    rate, ch, got = ac.decode_wav(patched)
    assert rate == 8000 and np.array_equal(got[:, 0], mono)
    # compressed formats stay honest boundaries
    with pytest.raises(NotImplementedError):
        ac.decode_audio(b"ID3\x04" + b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        ac.decode_audio(b"OggS" + b"\x00" * 64)


def test_hilbert_key_matches_reference_and_is_continuous(spark):
    from parquet_to_csv_spark.sources.layout import hilbert_key_df

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    n = 16
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x int, y int"
    )
    got = {
        (r["x"], r["y"]): r["hkey"]
        for r in hilbert_key_df(grid, "x", "y", bits=4).collect()
    }
    want = {(x, y): xy2d(n, x, y) for x in range(n) for y in range(n)}
    assert got == want
    # continuity: consecutive keys are grid-adjacent (the property that
    # beats Z-order's quadrant seams)
    inv = {d: xy for xy, d in got.items()}
    assert all(
        abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
        for d in range(n * n - 1)
    )


def test_cbo_stats_propagate_after_analyze(spark):
    import shutil

    from parquet_to_csv_spark.sources.tables import load_table

    # in-memory catalog forgets tables across sessions but leaves the
    # warehouse directory behind (the write_bucketed gotcha)
    spark.sql("DROP TABLE IF EXISTS t_cbo_nation")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        wh.removeprefix("file:").lstrip(":") + "/t_cbo_nation",
        ignore_errors=True,
    )
    load_table(spark, SF_DIR, "nation").write.mode("overwrite").saveAsTable(
        "t_cbo_nation"
    )
    spark.sql("ANALYZE TABLE t_cbo_nation COMPUTE STATISTICS")
    n = spark.table("t_cbo_nation").count()
    prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        # the ANALYZE-computed exact rowCount reaches the optimizer's
        # cost model (only surfaced when CBO is on)
        cost = spark.sql(
            "EXPLAIN COST SELECT * FROM t_cbo_nation"
        ).collect()[0][0]
        assert f"rowCount={n}" in cost
        joined = spark.sql(
            """
            SELECT count(*) AS n FROM t_cbo_nation a
            JOIN t_cbo_nation b ON a.n_regionkey = b.n_regionkey
            """
        ).collect()[0]["n"]
        assert joined > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)
        spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
        spark.sql("DROP TABLE IF EXISTS t_cbo_nation")


def test_native_parquet_bloom_filter_write(spark, tmp_path):
    import os

    from parquet_to_csv_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    plain = str(tmp_path / "plain")
    bloomed = str(tmp_path / "bloomed")
    ev.coalesce(1).write.parquet(plain)
    (
        ev.coalesce(1)
        .write.option("parquet.bloom.filter.enabled#event_id", "true")
        .option("parquet.bloom.filter.expected.ndv#event_id", "10000")
        .parquet(bloomed)
    )

    def psize(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    # the bloom filter physically lands in the footer region
    assert psize(bloomed) > psize(plain) + 1000
    # and the file stays a verbatim-readable parquet table
    a = sorted(r["event_id"] for r in spark.read.parquet(bloomed).collect())
    b = sorted(r["event_id"] for r in ev.collect())
    assert a == b


def test_rebalance_hint_splits_skewed_write(spark, tmp_path):
    """E437: the AQE REBALANCE hint — write-side skew remediation. A
    plain repartition(key) write puts each key in ONE task/file, so a
    hot key produces one giant file (the small-files problem's evil
    twin); /*+ REBALANCE(key) */ lets AQE split oversized partitions
    at the advisory size, bounding the largest output file while
    keeping same-key rows mostly together."""
    import os

    import pyspark.sql.functions as F

    from parquet_to_csv_spark.sources.tables import load_table

    # fan the input across mappers first: AQE splits skewed REBALANCE
    # partitions at map-output block granularity, so a single-mapper
    # input physically cannot be split
    ev = (
        load_table(spark, "/root/testdata/sf0.01", "events")
        .repartition(16)
        .withColumn(
            "skew", F.when(F.col("event_id") % 10 < 9, "hot").otherwise("cold")
        )
    )
    plain_dir = str(tmp_path / "plain")
    reb_dir = str(tmp_path / "reb")
    prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    try:
        ev.repartition("skew").write.mode("overwrite").parquet(plain_dir)
        ev.createOrReplaceTempView("t_reb_events")
        spark.sql(
            "SELECT /*+ REBALANCE(skew) */ * FROM t_reb_events"
        ).write.mode("overwrite").parquet(reb_dir)
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev)

    def files(d):
        return [
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        ]

    plain, reb = files(plain_dir), files(reb_dir)
    # repartition(key): ~2 populated files, the hot one huge;
    # REBALANCE: the hot partition split at the advisory size
    assert len(reb) > len([s for s in plain if s > 1000])
    assert max(reb) < max(plain)
    # and nothing was lost
    assert spark.read.parquet(reb_dir).count() == ev.count()


def test_mp4_parser_roundtrip_and_boundaries():
    import pytest

    from parquet_to_csv_spark.functions import videomd as vm

    raw = vm.build_mp4(30000, 123456, 3, b"mp42")
    meta = vm.parse_mp4_meta(raw)
    assert meta == {
        "major_brand": "mp42", "timescale": 30000,
        "duration": 123456, "n_tracks": 3,
    }
    with pytest.raises(NotImplementedError):
        vm.parse_mp4_meta(b"\x00" * 32)  # not ISO-BMFF
    with pytest.raises(NotImplementedError):
        vm.decode_video_frames(raw)  # frame decode stays a boundary
    # truncated moov (no mvhd) is a loud failure, not a silent zero
    ftyp_only = raw[:raw.index(b"moov") - 4]
    with pytest.raises(NotImplementedError):
        vm.parse_mp4_meta(ftyp_only)


def test_dp_release_reproducible_and_bounded(spark):
    from parquet_to_csv_spark.operators.mlmetrics import dp_release_counts
    from parquet_to_csv_spark.sources.tables import load_table

    a = {r["event_type"]: tuple(r) for r in dp_release_counts(spark, SF_DIR).collect()}
    b = {r["event_type"]: tuple(r) for r in dp_release_counts(spark, SF_DIR).collect()}
    assert a == b and a  # reproducible release — no fresh budget burned
    true = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for et, row in a.items():
        noise_micro, released = row[1], row[2]
        # Laplace(1) inverse-CDF from u16 is bounded by ln(65537) ≈ 11.09
        assert abs(noise_micro) <= 11_100_000
        assert abs(released - true[et]) <= 12


def test_hilbert_prunes_no_worse_than_morton(spark):
    import pyspark.sql.functions as F

    from parquet_to_csv_spark.sources.layout import curve_pruning_comparison

    tot = {
        r["curve"]: (r["files"], r["rows"])
        for r in curve_pruning_comparison(spark, "/root/testdata/sf0.1")
        .groupBy("curve")
        .agg(F.sum("n_files_kept").alias("files"),
             F.sum("n_rows_scanned").alias("rows"))
        .collect()
    }
    # continuity pays: across the box workload Hilbert never scans
    # more than Morton (individual boxes may flip — measured honesty)
    assert tot["hilbert"][0] <= tot["morton"][0]
    assert tot["hilbert"][1] <= tot["morton"][1]


def test_shallow_clone_zero_copy_and_divergence(spark, tmp_path):
    import json
    import os

    from parquet_to_csv_spark.sources.layout import (
        clone_table,
        commit_deletes,
        commit_version,
        latest_version,
        read_version,
        _man_delete_files,
        _man_files,
        _manifest_path,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "clone")
    df = spark.createDataFrame(
        [(i, "drop" if i % 3 == 0 else "keep") for i in range(12)],
        "id long, tag string",
    )
    commit_version(spark, src, df)
    commit_deletes(spark, src, "tag = 'drop'")
    clone_table(src, dst)
    # zero copy: the clone's manifest references the SOURCE's files and
    # the clone dir holds no data of its own
    man = json.load(open(_manifest_path(dst, 0)))
    assert all(f.startswith(src) for f in _man_files(dst, man))
    assert all(f.startswith(src) for f in _man_delete_files(dst, man))
    assert not os.path.isdir(os.path.join(dst, "data"))
    # delete vector inherited
    assert read_version(spark, dst).count() == 8
    # divergence: appends to one side are invisible to the other
    commit_version(spark, dst,
                   spark.createDataFrame([(100, "clone-only")], "id long, tag string"),
                   mode="append")
    commit_version(spark, src,
                   spark.createDataFrame([(200, "src-only")], "id long, tag string"),
                   mode="append")
    assert read_version(spark, dst).filter("tag = 'src-only'").count() == 0
    assert read_version(spark, src).filter("tag = 'clone-only'").count() == 0
    assert (latest_version(src), latest_version(dst)) == (2, 1)
