"""Persisted IVF index (round-3): build / load / query / staleness.

The production ANN lifecycle the fixed-rule ``ivf_topk`` defers:
centroids k-means-refined once and WRITTEN as parquet, vectors
pre-assigned, queries served from the persisted tables. Pins:
(a) the index round-trips through parquet (schema + row counts),
(b) the indexed query equals a from-scratch rebuild (determinism),
(c) staleness is zero when scored against the index's own data and
    positive when the index is stale (built from a subset).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from parquet_to_csv_spark.operators import similarity
from parquet_to_csv_spark.sources.tables import load_table


def test_index_roundtrip_and_query(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(spark, sf_dir, idx, n_cells=8, n_iter=2)
    cents, assign = similarity.load_ivf_index(spark, idx)
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    assert cents.count() == 8
    assert assign.count() == n_vec
    assert set(cents.columns) == {"cell", "c"}
    assert set(assign.columns) == {"vec_id", "cell"}
    # every assignment points at an existing cell
    assert assign.join(cents, "cell", "left_anti").count() == 0

    out = similarity.ivf_indexed_topk(
        spark, sf_dir, n_cells=8, nprobe=2, k=3, index_dir=idx
    ).collect()
    assert len(out) > 0
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        ranks = sorted(r["rnk"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        cos = [r["cosine"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert cos == sorted(cos, reverse=True)


def test_indexed_query_deterministic_across_rebuilds(spark, sf_dir, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    similarity.build_ivf_index(spark, sf_dir, a, n_cells=8, n_iter=2)
    similarity.build_ivf_index(spark, sf_dir, b, n_cells=8, n_iter=2)
    ra = sorted(
        map(tuple, similarity.ivf_indexed_topk(spark, sf_dir, n_cells=8, index_dir=a).collect())
    )
    rb = sorted(
        map(tuple, similarity.ivf_indexed_topk(spark, sf_dir, n_cells=8, index_dir=b).collect())
    )
    assert ra == rb


def test_staleness_detects_drift(spark, sf_dir, tmp_path):
    """An index built from HALF the data must show drift against the
    full table, and larger drift than a fresh full-table index shows
    against itself (which is just one more Lloyd step — small)."""
    full = str(tmp_path / "full")
    similarity.build_ivf_index(spark, sf_dir, full, n_cells=4, n_iter=2)
    fresh = similarity.ivf_index_staleness(
        spark, sf_dir, n_cells=4, index_dir=full
    ).collect()
    assert len(fresh) > 0

    # stale index: built against a SHIFTED copy of the table (the data
    # distribution moved since the build — the scenario a refresh
    # scheduler exists for)
    shifted_dir = str(tmp_path / "shifted")
    os.makedirs(shifted_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x + F.lit(3.0))
    ).write.parquet(os.path.join(shifted_dir, "embeddings.parquet"))
    stale_idx = str(tmp_path / "stale")
    similarity.build_ivf_index(spark, shifted_dir, stale_idx, n_cells=4, n_iter=2)
    # staleness assigns TODAY's (full) data to yesterday's (half-built)
    # centroids — every vector is scored, deterministic result
    stale = similarity.ivf_index_staleness(
        spark, sf_dir, n_cells=4, index_dir=stale_idx
    ).collect()
    n_vec = emb.count()
    assert sum(r["n_members"] for r in stale) == n_vec
    assert sum(r["n_members"] for r in fresh) == n_vec
    tot_fresh = sum(r["drift_sqdist"] for r in fresh)
    tot_stale = sum(r["drift_sqdist"] for r in stale)
    assert tot_stale > tot_fresh > 0
