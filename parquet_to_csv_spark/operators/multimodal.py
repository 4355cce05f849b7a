"""Multimodal columns — opaque binary payloads with typed metadata.

North-star requirement: a 100 TB training-data pipeline carries
image/audio/video as ``binary`` columns next to typed metadata, and
runs decode / feature-extraction / resize / frame-sampling as
Arrow-batched Pandas functions over ``mapInPandas``.

What is REAL here (and tested): the schema contract, the Arrow batch
path, the partition-parallel execution, deterministic feature output,
the metadata-only fast path (never decodes when the question is
answerable from metadata) — and, since round 3, ACTUAL image decoding
for PNG and BMP via the pure-Python codec in
``functions/imagecodec.py`` (stdlib zlib + numpy; no PIL needed).
``decode_media`` decodes those two formats for real; feature
extraction and thumbnailing use real pixels when a payload decodes
and fall back to the deterministic byte-level stand-in otherwise
(the fixture payloads are text bytes, so gate queries keep their
oracle semantics; the real path is pinned by pytest with generated
PNG/BMP payloads through the same ``mapInPandas`` plumbing).
JPEG/WebP/audio/video remain the honest ``NotImplementedError``
boundary — they need native libs this container lacks.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from parquet_to_csv_spark.functions import imagecodec
from parquet_to_csv_spark.sources.tables import load_table

N_FEATURES = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_media(payload: bytes, modality: str):
    """Decoder hook: REAL for PNG, BMP, JPEG (sequential +
    progressive) and WebP-lossless (pure-Python codecs —
    ``functions/imagecodec.py`` + ``functions/webpcodec.py``),
    returning an (H, W, C) uint8 numpy array; ``NotImplementedError``
    for formats that need native libs (lossy WebP/audio/video — no
    PIL/librosa/ffmpeg in this container)."""
    if modality in ("image", "text") and imagecodec.sniff_format(payload):
        return imagecodec.decode_image(payload)
    raise NotImplementedError(
        "only PNG/BMP/JPEG/WebP-lossless decode in this container "
        "(pure-Python codecs); lossy WebP/audio/video need "
        "PIL/librosa/ffmpeg"
    )


def fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode+embed: a 16-bin byte histogram
    normalized to sum 1. Stable across runs/machines, so the Spark-side
    plumbing is testable without media libraries."""
    if payload is None or len(payload) == 0:
        return [0.0] * N_FEATURES
    counts = [0] * N_FEATURES
    for b in payload:
        counts[b >> 4] += 1
    total = float(len(payload))
    return [c / total for c in counts]


def decode_features(payload: bytes) -> list[float]:
    """Feature vector for a payload: REAL pixel features when the
    payload is a decodable image (16-bin luminance histogram of the
    decoded pixels, normalized — a crude but genuine visual
    signature: two renderings of the same image with different byte
    encodings get the same features, which the byte stand-in cannot
    do), else the byte-histogram stand-in."""
    if payload and imagecodec.sniff_format(payload):
        import numpy as np

        try:
            img = imagecodec.decode_image(payload)
        except Exception:
            # sniffed-but-undecodable (truncated IDAT, header lies the
            # sniff can't see): fall back to the byte stand-in instead
            # of failing the whole Spark job on one bad payload
            return fake_decode_features(payload)
        flat = imagecodec.luma(img).reshape(-1)
        binned = np.bincount(flat >> 4, minlength=N_FEATURES)
        total = float(flat.size)
        return [int(c) / total for c in binned[:N_FEATURES]]
    return fake_decode_features(payload)


def attach_payloads(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treats each document's utf-8 bytes as an opaque
    payload with metadata — the shape a real image/audio table has."""
    return docs.select(
        "doc_id",
        F.lit("text").alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def extract_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``.

    Each partition streams in as pandas batches; per batch we compute
    byte stats + the decoded feature vector (REAL pixel features for
    PNG/BMP payloads, byte-histogram stand-in otherwise). No shuffle —
    output partitioning follows the input, so a downstream ANN index
    build can co-partition for free.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads_col = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads_col.map(lambda p: 0 if p is None else len(p)),
                    "payload_sha": payloads_col.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "features": payloads_col.map(decode_features),
                }
            )

    return payloads.mapInPandas(_extract, FEATURE_SCHEMA)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only pass (oracle-checkable): byte length + content md5
    per payload — never touches a decoder. At scale this is the cheap
    pre-filter before any decode fan-out."""
    payloads = attach_payloads(load_table(spark, sf_dir, "documents"))
    return payloads.select(
        "doc_id",
        "modality",
        F.octet_length(F.col("payload")).alias("n_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
        F.col("meta")["source"].alias("source"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_off", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def frame_sample(
    payloads: DataFrame, frame_bytes: int = 256, stride: int = 2
) -> DataFrame:
    """Frame sampling over ``mapInPandas`` — the video-style 1→N batch
    shape (each payload row yields several frame rows; Arrow batches
    out more rows than in, no shuffle, partitioning preserved).

    Framing is the deterministic stand-in for a real demuxer (no ffmpeg
    in this container): a "frame" is a fixed ``frame_bytes`` window of
    the payload and we keep every ``stride``-th one — the exact
    plumbing (schema, offsets, per-frame digest, fan-out batching) a
    real frame extractor drops into by replacing ONE inner function.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens, md5s = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = payload or b""
                n_frames = (len(p) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    chunk = p[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(i * frame_bytes)
                    lens.append(len(chunk))
                    md5s.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_off": offs,
                    "frame_len": lens,
                    "frame_md5": md5s,
                }
            )

    return payloads.mapInPandas(_frames, FRAME_SCHEMA)


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query for the frame-sampling plumbing: frame geometry
    (count, offsets, lengths) is pure byte arithmetic the oracle
    replays from ``octet_length``; the per-frame md5 is pinned by
    pytest instead (DuckDB lacks BLOB slicing)."""
    payloads = attach_payloads(load_table(spark, sf_dir, "documents"))
    return frame_sample(payloads).select("doc_id", "frame_idx", "frame_off", "frame_len")


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("thumb_len", T.LongType()),
        T.StructField("thumb_sha", T.StringType()),
    ]
)


def resize_thumbnails(
    payloads: DataFrame, target_bytes: int = 64, thumb_px: int = 8
) -> DataFrame:
    """Resize/downsample over ``mapInPandas``. For PNG/BMP payloads
    this is the REAL image path: decode → nearest-neighbor resample to
    ``thumb_px``×``thumb_px`` → re-encode as BMP (deterministic byte
    output, so digests are pinnable). Non-image payloads keep the
    deterministic strided byte selection down to ``target_bytes`` —
    the Spark-side contract (binary in → smaller binary out, 1:1 rows,
    partitioning preserved, per-thumb digest) is identical either
    way."""

    def _thumb(p: bytes) -> bytes:
        if p and imagecodec.sniff_format(p):
            try:
                img = imagecodec.decode_image(p)
                return imagecodec.encode_bmp(
                    imagecodec.resize_nearest(img, thumb_px, thumb_px)
                )
            except Exception:
                pass  # undecodable despite the sniff — strided bytes below
        if len(p) <= target_bytes:
            return p
        stride = len(p) / target_bytes
        return bytes(p[int(i * stride)] for i in range(target_bytes))

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [_thumb(p or b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_len": [len(t) for t in thumbs],
                    "thumb_sha": [hashlib.sha256(t).hexdigest() for t in thumbs],
                }
            )

    return payloads.mapInPandas(_resize, RESIZE_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("bins", T.ArrayType(T.LongType())),
    ]
)


def byte_histogram(payloads: DataFrame) -> DataFrame:
    """16-bin byte histogram per payload over the Arrow-batched decode
    path — the stand-in for decode+feature-extract that keeps the REAL
    ``mapInPandas`` plumbing (swap the histogram for DCT-of-pixels and
    nothing else changes). No shuffle; output partitioning follows the
    input. Counts are exact longs, so everything downstream is
    oracle-checkable integer arithmetic.
    """

    def _hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, bins = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = payload or b""
                counts = [0] * 16
                for byte in b:
                    counts[byte >> 4] += 1
                ids.append(doc_id)
                sizes.append(len(b))
                bins.append(counts)
            yield pd.DataFrame({"doc_id": ids, "n_bytes": sizes, "bins": bins})

    return payloads.mapInPandas(_hist, PHASH_SCHEMA)


def phash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup groups over the multimodal payload path
    — the media twin of content-hash dedup: payloads whose coarse
    byte-distribution signature collides are duplicate candidates (for
    real images: same pHash ⇒ visually identical up to compression).

    Signature: bit ``i`` is set iff the payload's bin-``i`` SHARE
    exceeds the corpus-wide bin-``i`` share — the mean-threshold step
    of classic pHash, relative to the corpus so the bits split ~50/50
    (a uniform threshold degenerates: near-identical histograms set
    identical bits). The comparison is exact cross-multiplied longs
    (``c_i·total_corpus > corpus_i·n_bytes``) — no float shares.

    Decode runs in the pandas plumbing (:func:`byte_histogram`); the
    thresholding is relational: one posexplode (16 rows/payload), a
    one-row broadcast of corpus bin totals, one groupBy(doc) to fold
    bits, one groupBy(phash) — domain-bounded — for the groups.
    """
    payloads = attach_payloads(load_table(spark, sf_dir, "documents"))
    hist = byte_histogram(payloads)
    bins = hist.select(
        "doc_id", "n_bytes", F.posexplode("bins").alias("b", "c")
    )
    corpus = F.broadcast(
        bins.groupBy("b").agg(F.sum("c").alias("corpus_c")).groupBy().agg(
            F.sum("corpus_c").alias("corpus_total"),
            F.map_from_arrays(
                F.collect_list("b"), F.collect_list("corpus_c")
            ).alias("corpus_map"),
        )
    )
    per_doc = (
        bins.join(corpus)
        .select(
            "doc_id",
            "n_bytes",
            F.when(
                F.col("c") * F.col("corpus_total")
                > F.element_at("corpus_map", F.col("b")) * F.col("n_bytes"),
                F.expr("shiftleft(CAST(1 AS BIGINT), b)"),
            )
            .otherwise(F.lit(0))
            .alias("bit"),
        )
        .groupBy("doc_id", "n_bytes")
        .agg(F.sum("bit").alias("phash"))
    )
    return (
        per_doc.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .filter(F.col("n_payloads") >= 2)
    )


def shared_frame_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level payload near-dup: payload pairs sharing at least
    one sampled FRAME digest — the video-dedup shape (two videos
    sharing scenes) applied through the real frame-sampling plumbing
    (:func:`frame_sample`, 64-byte frames, every 2nd kept).

    The join keys on the frame md5 (high cardinality, parallel); pair
    aggregation counts shared frames. Because the stand-in framing is
    byte-window slicing of the payload, the DuckDB oracle replays the
    EXACT per-frame digests from text substrings (ASCII fixture ⇒
    chars ≡ bytes) — upgrading frame-level multimodal coverage from
    pytest-only to gate-checked.
    """
    payloads = attach_payloads(load_table(spark, sf_dir, "documents"))
    frames = frame_sample(payloads, frame_bytes=64, stride=2).select(
        "doc_id", "frame_idx", "frame_md5"
    )
    a = frames.select(
        F.col("doc_id").alias("doc_a"),
        F.col("frame_idx").alias("idx_a"),
        "frame_md5",
    )
    b = frames.select(
        F.col("doc_id").alias("doc_b"),
        F.col("frame_idx").alias("idx_b"),
        "frame_md5",
    )
    return (
        a.join(b, "frame_md5")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_frames"))
    )


DECODE_GATE_SCHEMA = T.StructType(
    [
        T.StructField("img_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("bin", T.LongType()),
        T.StructField("n_px", T.LongType()),
    ]
)


def multimodal_real_decode(spark: SparkSession, sf_dir: str, n_images: int = 16) -> DataFrame:
    """EXT E309 + E343: gate query for the REAL image-decode paths.

    PNG leg: ``n_images`` deterministic gradient images are ENCODED to
    PNG bytes inside the plan (``mapInPandas``), decoded back through
    :func:`decode_media` (zlib inflate + unfiltering — the real codec)
    and reduced to per-image integer luma histograms.

    JPEG leg (round 4): per-8×8-constant grayscale images are encoded
    by the pure-Python baseline JPEG encoder (flat quant=1) and
    decoded back through the full marker/Huffman/IDCT pipeline —
    quant=1 DC-only blocks round-trip EXACTLY, so the decoded
    histogram is formula-predictable with no lossy tolerance.

    The DuckDB oracle computes BOTH legs' histograms independently
    from the generating formulas, never touching a byte. Any
    pixel-level decode defect (filter reconstruction, channel order,
    row direction, stride, Huffman table handling, DC prediction,
    dequantization, IDCT scaling) shifts a histogram bin and fails the
    value hash.

    (``sf_dir`` is unused — the workload is generated; the parameter
    keeps the registry signature uniform.)

    Scale shape: generation/encode/decode are a stateless
    ``mapInPandas`` fan-out over ``spark.range`` (embarrassingly
    parallel, no shuffle); the histogram rows (2×16 per image) feed
    one tiny aggregation-free projection.
    """
    import numpy as np

    from parquet_to_csv_spark.functions import imagecodec as ic

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fmts, hs, ws, bins, cnts = [], [], [], [], [], []

            def emit(img_id, fmt, h, w, hist):
                for b in range(16):
                    ids.append(img_id)
                    fmts.append(fmt)
                    hs.append(h)
                    ws.append(w)
                    bins.append(b)
                    cnts.append(int(hist[b]))

            for img_id in pdf["id"]:
                img_id = int(img_id)
                # --- PNG leg: RGB gradient ---
                h = 8 + img_id % 5
                w = 8 + (img_id * 3) % 7
                img = np.zeros((h, w, 3), dtype=np.uint8)
                for y in range(h):
                    for x in range(w):
                        img[y, x, 0] = (x * 255) // (w - 1)
                        img[y, x, 1] = (y * 255) // (h - 1)
                        img[y, x, 2] = ((x + y) * 255) // (w + h - 2)
                decoded = decode_media(ic.encode_png(img), "image")
                lum = ic.luma(decoded).reshape(-1)
                emit(img_id, "png", h, w, np.bincount(lum >> 4, minlength=16))
                # --- JPEG leg: constant 8x8 tiles, grayscale ---
                ht = 1 + img_id % 3
                wt = 1 + (img_id * 2) % 4
                jimg = np.zeros((ht * 8, wt * 8), dtype=np.uint8)
                for ty in range(ht):
                    for tx in range(wt):
                        jimg[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8] = (
                            (img_id * 37 + ty * 19 + tx * 7) % 256
                        )
                jdec = decode_media(ic.encode_jpeg(jimg), "image")
                jl = ic.luma(jdec).reshape(-1)
                emit(img_id, "jpeg", ht * 8, wt * 8, np.bincount(jl >> 4, minlength=16))
                # --- progressive JPEG leg (round 5): a DIFFERENT
                # constant-tile formula, encoded through the four-scan
                # SOF2 script and decoded through the full progressive
                # pipeline (DC first/refine, AC band first/refine,
                # EOB runs) — quant=1 DC-only blocks stay exact, so the
                # histogram is formula-predictable with no tolerance.
                pt = 1 + (img_id * 3) % 3
                pw = 1 + img_id % 4
                pimg = np.zeros((pt * 8, pw * 8), dtype=np.uint8)
                for ty in range(pt):
                    for tx in range(pw):
                        pimg[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8] = (
                            (img_id * 53 + ty * 11 + tx * 29) % 256
                        )
                pdec = decode_media(ic.encode_jpeg_progressive(pimg), "image")
                pl = ic.luma(pdec).reshape(-1)
                emit(img_id, "jpegp", pt * 8, pw * 8, np.bincount(pl >> 4, minlength=16))
            yield pd.DataFrame(
                {"img_id": ids, "fmt": fmts, "height": hs, "width": ws,
                 "bin": bins, "n_px": cnts}
            )

    return spark.range(n_images).mapInPandas(_gen, DECODE_GATE_SCHEMA)


AUDIO_GATE_SCHEMA = (
    "clip_id long, channels int, sample_rate int, n_samples long, "
    "sum_abs long, max_abs long, n_zero_cross long"
)


def multimodal_audio_decode(
    spark: SparkSession, sf_dir: str, n_clips: int = 16
) -> DataFrame:
    """EXT E429: gate query for the REAL audio-decode path — the audio
    twin of E309/E343/E400. Per clip, a deterministic square wave
    (amplitude 500·(id+1), half-period 2+id%5, length 400·(1+id%4),
    mono for even ids / interleaved stereo with an inverted right
    channel for odd ids) is ENCODED to RIFF/WAVE PCM bytes inside the
    plan, parsed back through the chunk-walking WAV decoder
    (``functions/audiocodec.py`` — real RIFF parsing: fmt/data chunk
    walk, word alignment, PCM validation), and reduced to exact
    integer features: sample counts, Σ|s|, max|s|, zero crossings.

    The DuckDB oracle regenerates the waveforms from the same formula
    set-wise, never touching a byte — any parser defect (chunk stride,
    channel de-interleave, sample width, truncation) shifts an integer
    and fails the hash. Compressed audio (MP3/Ogg) remains the honest
    ``NotImplementedError`` boundary (SURVEY §2.7).

    Scale shape: stateless ``mapInPandas`` over ``spark.range`` —
    embarrassingly parallel, no shuffle; this is exactly how a real
    100 TB audio corpus would fan a decode+featurize pass.
    """
    import numpy as np

    from parquet_to_csv_spark.functions import audiocodec as ac

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "clip_id", "channels", "sample_rate", "n_samples",
                "sum_abs", "max_abs", "n_zero_cross",
            )}
            for cid in pdf["id"]:
                cid = int(cid)
                amp = 500 * (cid + 1)
                half = 2 + cid % 5
                n = 400 * (1 + cid % 4)
                rate = 8000 + 1000 * (cid % 3)
                t = np.arange(n)
                mono = np.where((t // half) % 2 == 0, amp, -amp).astype(np.int16)
                stereo = cid % 2 == 1
                samples = np.stack([mono, -mono], axis=1) if stereo else mono
                payload = ac.encode_wav(samples, rate)
                drate, dch, dec = ac.decode_audio(payload)
                flat = dec.astype(np.int64)
                left = flat[:, 0]
                out["clip_id"].append(cid)
                out["channels"].append(dch)
                out["sample_rate"].append(drate)
                out["n_samples"].append(int(flat.shape[0]))
                out["sum_abs"].append(int(np.abs(flat).sum()))
                out["max_abs"].append(int(np.abs(flat).max()))
                out["n_zero_cross"].append(
                    int((np.sign(left[1:]) != np.sign(left[:-1])).sum())
                )
            yield pd.DataFrame(out)

    return spark.range(n_clips).mapInPandas(_gen, AUDIO_GATE_SCHEMA)


def multimodal_flac_decode(
    spark: SparkSession, sf_dir: str, n_clips: int = 16
) -> DataFrame:
    """EXT E523: gate query for the pure-Python FLAC decode path —
    the compressed-audio sibling of E429 (WAV). Per clip, a
    deterministic waveform (constant amplitude 300·(id+1) for id ≡ 0
    mod 5, else a square wave with half-period 2+id%5; length
    400·(1+id%4); mono for even ids, inverted-right stereo for odd) is
    ENCODED to a spec-correct FLAC stream inside the plan — the
    encoder cycles subframe strategies per frame (best-FIXED with
    2-partition Rice, FIXED-0 with forced escape partitions, explicit
    LPC, VERBATIM; CONSTANT arises on the flat clips) and uses
    mid/side decorrelation on odd stereo frames — then decoded back
    through the full bitstream machinery (``functions/flaccodec.py``:
    UTF-8 frame numbers, CRC-8/16 verification, Rice partitions incl.
    escapes, fixed+LPC predictors, stereo reconstruction, STREAMINFO
    MD5 check) and reduced to exact integer features.

    The DuckDB oracle regenerates the features from the waveform
    formulas set-wise, never touching a byte — any bitstream defect
    (partition stride, zigzag, predictor order, channel
    decorrelation, CRC placement) shifts an integer and fails the
    hash. Lossy codecs (MP3/Ogg/AAC) remain the honest
    ``NotImplementedError`` boundary (SURVEY §2.7).

    Scale shape: stateless ``mapInPandas`` over ``spark.range`` — the
    same embarrassingly-parallel decode+featurize fan-out as E429.
    """
    import numpy as np

    from parquet_to_csv_spark.functions import audiocodec as ac
    from parquet_to_csv_spark.functions import flaccodec as fc

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "clip_id", "channels", "sample_rate", "n_samples",
                "sum_abs", "max_abs", "n_zero_cross",
            )}
            for cid in pdf["id"]:
                cid = int(cid)
                amp = 300 * (cid + 1)
                half = 2 + cid % 5
                n = 400 * (1 + cid % 4)
                rate = 8000 + 1000 * (cid % 3)
                t = np.arange(n)
                if cid % 5 == 0:
                    mono = np.full(n, amp, dtype=np.int16)
                else:
                    mono = np.where(
                        (t // half) % 2 == 0, amp, -amp
                    ).astype(np.int16)
                stereo = cid % 2 == 1
                samples = (
                    np.stack([mono, -mono], axis=1) if stereo else mono
                )
                payload = fc.encode_flac(samples, rate, block_size=256)
                drate, dch, dec = ac.decode_audio(payload)
                flat = dec.astype(np.int64)
                left = flat[:, 0]
                out["clip_id"].append(cid)
                out["channels"].append(dch)
                out["sample_rate"].append(drate)
                out["n_samples"].append(int(flat.shape[0]))
                out["sum_abs"].append(int(np.abs(flat).sum()))
                out["max_abs"].append(int(np.abs(flat).max()))
                out["n_zero_cross"].append(
                    int((np.sign(left[1:]) != np.sign(left[:-1])).sum())
                )
            yield pd.DataFrame(out)

    return spark.range(n_clips).mapInPandas(_gen, AUDIO_GATE_SCHEMA)


VIDEO_META_SCHEMA = (
    "clip_id long, major_brand string, timescale int, duration long, "
    "n_tracks int, duration_ms long"
)


def multimodal_video_meta(
    spark: SparkSession, sf_dir: str, n_clips: int = 16
) -> DataFrame:
    """EXT E438: REAL MP4 container-metadata extraction — the video
    sibling of E429 (WAV) and E309 (PNG): deterministic clips are
    BUILT as ISO-BMFF byte streams in-plan (ftyp + free + moov with
    mvhd and a variable trak count), then parsed back through the box
    walker (``functions/videomd.py`` — 32-bit box sizes, unknown-box
    skipping, container recursion) into the fields a video corpus
    pipeline needs before any codec runs: brand, timescale, duration,
    track count, derived duration_ms (exact integer div). The DuckDB
    oracle recomputes every field from the generating formulas without
    touching a byte; FRAME decode remains the honest boundary.

    Scale shape: stateless ``mapInPandas`` over ``spark.range`` — the
    same embarrassingly-parallel fan-out a 100 TB video-manifest pass
    would run.
    """
    from parquet_to_csv_spark.functions import videomd as vm

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "clip_id", "major_brand", "timescale", "duration",
                "n_tracks", "duration_ms",
            )}
            for cid in pdf["id"]:
                cid = int(cid)
                ts = 1000 * (1 + cid % 3)
                dur = 2500 * (cid + 1)
                ntr = 1 + cid % 2
                brand = b"isom" if cid % 2 == 0 else b"mp42"
                meta = vm.parse_mp4_meta(vm.build_mp4(ts, dur, ntr, brand))
                out["clip_id"].append(cid)
                out["major_brand"].append(meta["major_brand"])
                out["timescale"].append(meta["timescale"])
                out["duration"].append(meta["duration"])
                out["n_tracks"].append(meta["n_tracks"])
                out["duration_ms"].append(meta["duration"] * 1000 // meta["timescale"])
            yield pd.DataFrame(out)

    return spark.range(n_clips).mapInPandas(_gen, VIDEO_META_SCHEMA)


def multimodal_webp_decode(
    spark: SparkSession, sf_dir: str, n_images: int = 16
) -> DataFrame:
    """EXT E524 (round 10): gate query for the REAL WebP-lossless
    (VP8L) decode path — the WebP twin of E309/E343/E400/E429/E523.

    Per image id, a deterministic RGB image is generated with 4-pixel
    horizontal runs (so the encoder's LZ77 references actually fire),
    encoded by the pure-Python VP8L encoder (``functions/webpcodec``)
    with id-varied options — SUBTRACT_GREEN on even ids, color-cache
    bits cycling 0/4/8 — and decoded back through the full container +
    prefix-code + LZ77 + inverse-transform pipeline via
    :func:`decode_media`. VP8L is LOSSLESS, so the decoded pixels must
    equal the generating formula EXACTLY; the reduced per-image
    16-bin integer luma histogram is what the DuckDB oracle recomputes
    from the same formula without touching a byte. Any defect in the
    bit reader, canonical code reconstruction, distance mapping,
    cache hashing, or transform inversion shifts a bin and fails the
    value hash.

    (``sf_dir`` is unused — the workload is generated; the parameter
    keeps the registry signature uniform.)

    Scale shape: generation/encode/decode are a stateless
    ``mapInPandas`` fan-out over ``spark.range`` — embarrassingly
    parallel, no shuffle, exactly the 100 TB decode-sweep shape."""
    import numpy as np

    from parquet_to_csv_spark.functions import webpcodec as wc

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fmts, hs, ws, bins, cnts = [], [], [], [], [], []
            for img_id in pdf["id"]:
                img_id = int(img_id)
                h = 8 + img_id % 5
                w = 8 + (img_id * 5) % 9
                img = np.zeros((h, w, 3), dtype=np.uint8)
                for y in range(h):
                    for x in range(w):
                        img[y, x, 0] = ((x // 4) * 40 + img_id * 7) % 256
                        img[y, x, 1] = ((y // 2) * 23 + img_id * 11) % 256
                        img[y, x, 2] = ((x // 4) + y * 3 + img_id) % 256
                payload = wc.encode_vp8l(
                    img,
                    subtract_green=(img_id % 2 == 0),
                    cache_bits=(img_id % 3) * 4,
                    use_lz77=True,
                )
                decoded = decode_media(payload, "image")
                lum = imagecodec.luma(decoded).reshape(-1)
                hist = np.bincount(lum >> 4, minlength=16)
                for b in range(16):
                    ids.append(img_id)
                    fmts.append("vp8l")
                    hs.append(h)
                    ws.append(w)
                    bins.append(b)
                    cnts.append(int(hist[b]))
            yield pd.DataFrame(
                {"img_id": ids, "fmt": fmts, "height": hs, "width": ws,
                 "bin": bins, "n_px": cnts}
            )

    return spark.range(n_images).mapInPandas(_gen, DECODE_GATE_SCHEMA)
