"""Round 11: pure-Python baseline TIFF codec (functions/tiffcodec.py).

No TIFF oracle exists in this container (no PIL/tifffile), so the
evidence pattern is the FLAC one: encoder round-trips across every
(compression × predictor × photometric × strip-size) cell, plus
hand-built streams and raw-codec pins for decoder-only paths
(big-endian IFDs, WhiteIsZero polarity, PackBits no-op, LZW
early-change boundaries crossed by construction)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

import parquet_to_csv_spark.functions.tiffcodec as tc


def _img(h, w, c, seed, n_colors=None):
    rng = np.random.default_rng(seed)
    if n_colors:
        pal = rng.integers(0, 256, size=(n_colors, 3 if c == 3 else 1),
                           dtype=np.uint8)
        return pal[rng.integers(0, n_colors, size=(h, w))].reshape(h, w, c)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


# --- raw codecs ----------------------------------------------------------------


def test_packbits_spec_example_and_roundtrip():
    # the classic Apple PackBits spec example
    data = bytes.fromhex("aaaaaa80002aaaaaaaaaaaaa80002a22aaaaaaaaaaaaaaaaaaaa")
    enc = tc.packbits_encode(data)
    assert bytes(tc.packbits_decode(enc, len(data))) == data
    # 128 (0x80) in the stream is a NO-OP on decode
    assert bytes(tc.packbits_decode(b"\x80\x00A\x80\xfeB", 4)) == b"ABBB"
    rng = np.random.default_rng(1)
    for k in range(30):
        n = rng.integers(0, 2000)
        style = k % 3
        if style == 0:
            d = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        elif style == 1:
            d = rng.integers(0, 3, size=n, dtype=np.uint8).tobytes()
        else:
            d = b"\x00" * int(n)
        enc = tc.packbits_encode(d)
        assert bytes(tc.packbits_decode(enc, len(d))) == d


def test_tiff_lzw_roundtrip_and_early_change():
    rng = np.random.default_rng(2)
    # random bytes force the dictionary through EVERY width boundary
    # (258 -> 4094) and the 4094 reset, so the early-change points are
    # crossed many times in both directions
    for n in (0, 1, 300, 5_000, 60_000):
        d = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        assert bytes(tc.tiff_lzw_decode(tc.tiff_lzw_encode(d), n)) == d
    rep = b"abcab" * 8000  # phrase-heavy: deep dictionary chains
    assert bytes(
        tc.tiff_lzw_decode(tc.tiff_lzw_encode(rep), len(rep))
    ) == rep
    with pytest.raises(ValueError, match="truncated|short"):
        tc.tiff_lzw_decode(tc.tiff_lzw_encode(b"abcabc")[:2], 6)


def test_tiff_lzw_hand_pins():
    # Clear(256) then 'A'(65) then EOI(257) at width 9, MSB-first:
    # 100000000 001000001 100000001 -> pad to bytes
    bits = "100000000" + format(65, "09b") + "100000001"
    bits += "0" * ((8 - len(bits) % 8) % 8)
    raw = int(bits, 2).to_bytes(len(bits) // 8, "big")
    assert bytes(tc.tiff_lzw_decode(raw, 1)) == b"A"


# --- container round-trips ------------------------------------------------------


@pytest.mark.parametrize("compression", [1, 5, 32773])
@pytest.mark.parametrize("predictor", [1, 2])
def test_roundtrip_rgb(compression, predictor):
    img = _img(21, 13, 3, compression * 10 + predictor)
    enc = tc.encode_tiff(img, compression=compression, predictor=predictor)
    assert (tc.decode_tiff(enc) == img).all()
    info = tc.tiff_info(enc)
    assert (info["width"], info["height"]) == (13, 21)
    assert info["compression"] == compression
    assert info["samples_per_pixel"] == 3 and info["n_ifds"] == 1


def test_roundtrip_gray_and_strips():
    img = _img(37, 9, 1, 5)
    for rps in (1, 4, 37, 100):
        enc = tc.encode_tiff(img, compression=5, rows_per_strip=rps)
        assert (tc.decode_tiff(enc) == img).all()


def test_roundtrip_palette():
    img = _img(12, 12, 3, 6, n_colors=17)
    enc = tc.encode_tiff(img, compression=32773, palette=True)
    info = tc.tiff_info(enc)
    assert info["photometric"] == 3
    assert (tc.decode_tiff(enc) == img).all()


def test_deterministic_bytes():
    img = _img(8, 8, 3, 7)
    assert tc.encode_tiff(img) == tc.encode_tiff(img)


# --- decoder-only paths ---------------------------------------------------------


def test_big_endian_hand_built():
    # 2x2 gray, uncompressed, MM byte order, WhiteIsZero photometric
    px = bytes([0, 64, 128, 255])
    ifd_off = 8
    n = 7
    strip_off = ifd_off + 2 + 12 * n + 4

    def ent(tag, typ, count, val):
        return struct.pack(">HHII", tag, typ, count, val)

    buf = b"MM\x00*" + struct.pack(">I", ifd_off)
    buf += struct.pack(">H", n)
    # SHORT inline values live in the HIGH half on big-endian
    buf += ent(256, 3, 1, 2 << 16)
    buf += ent(257, 3, 1, 2 << 16)
    buf += ent(258, 3, 1, 8 << 16)
    buf += ent(259, 3, 1, 1 << 16)
    buf += ent(262, 3, 1, 0)          # WhiteIsZero
    buf += ent(273, 4, 1, strip_off)
    buf += ent(279, 4, 1, 4)
    buf += struct.pack(">I", 0)
    buf += px
    out = tc.decode_tiff(buf)
    assert out.shape == (2, 2, 1)
    assert out.reshape(-1).tolist() == [255, 191, 127, 0]  # inverted
    info = tc.tiff_info(buf)
    assert info["byte_order"] == "big" and info["photometric"] == 0


def test_unsupported_and_sniff():
    img = _img(4, 4, 3, 8)
    assert tc.tiff_info(tc.encode_tiff(img))["n_ifds"] == 1
    with pytest.raises(NotImplementedError, match="compression"):
        bad = bytearray(tc.encode_tiff(img))
        # compression tag value -> 7 (JPEG-in-TIFF)
        i = bytes(bad).index(struct.pack("<HHI", 259, 3, 1))
        bad[i + 8] = 7
        tc.decode_tiff(bytes(bad))
    assert tc.sniff_tiff(b"not a tiff") is None


def test_decode_image_and_image_info_dispatch():
    from parquet_to_csv_spark.functions import imagecodec as ic

    img = _img(6, 10, 3, 9)
    enc = tc.encode_tiff(img, compression=5, predictor=2)
    assert ic.sniff_format(enc) == "tiff"
    assert (ic.decode_image(enc) == img).all()
    info = ic.image_info(enc)
    assert (info["format"], info["width"], info["height"]) == ("tiff", 10, 6)
