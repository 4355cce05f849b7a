"""Round 11: pure-Python GIF codec (functions/gifcodec.py).

Same evidence pattern as FLAC (E523) / WebP-lossless (E524): encoder
round-trips exercise the common paths; decoder-only paths (interlace
placement, KwKwK, deferred width growth, disposal methods, local
color tables, truncated/corrupt streams) are pinned by hand-built
bitstreams derived from the public GIF89a specification."""

from __future__ import annotations

import struct

import numpy as np
import pytest

import parquet_to_csv_spark.functions.gifcodec as gc
from parquet_to_csv_spark.functions import imagecodec as ic


def _rand_img(h, w, n_colors, seed, channels=3):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    img = palette[idx]
    if channels == 4:
        img = np.dstack([img, np.full((h, w), 255, dtype=np.uint8)])
    return np.ascontiguousarray(img)


# --- spec pins / hand-built streams -------------------------------------------


def test_sniff_and_header():
    img = _rand_img(3, 5, 4, 0)
    enc = gc.encode_gif(img)
    assert enc[:6] == b"GIF89a"
    meta = gc.sniff_gif(enc)
    assert (meta["width"], meta["height"]) == (5, 3)
    assert ic.sniff_format(enc) == "gif"
    assert gc.sniff_gif(b"GIF89a") is None  # too short
    assert gc.sniff_gif(b"not a gif, not at all") is None


def test_lzw_wikipedia_style_roundtrip_all_code_sizes():
    rng = np.random.default_rng(1)
    for mcs in range(2, 9):
        n_sym = 1 << mcs
        data = rng.integers(0, n_sym, size=4096, dtype=np.uint8).tobytes()
        enc = gc._lzw_encode(data, mcs)
        dec = gc._lzw_decode(enc, mcs, len(data))
        assert bytes(dec) == data


def test_lzw_kwkwk_case():
    # 'aaaa...' forces the code == next_code (KwKwK) branch immediately
    data = b"\x00" * 64
    enc = gc._lzw_encode(data, 2)
    assert bytes(gc._lzw_decode(enc, 2, 64)) == data


def test_lzw_dictionary_reset_at_4096():
    # enough distinct phrases to overflow the 12-bit dictionary
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=120_000, dtype=np.uint8).tobytes()
    enc = gc._lzw_encode(data, 8)
    assert bytes(gc._lzw_decode(enc, 8, len(data))) == data


def test_lzw_truncation_and_bad_first_code_raise():
    enc = gc._lzw_encode(b"\x00\x01\x02\x03" * 8, 2)
    with pytest.raises(ValueError, match="truncated|EOI"):
        gc._lzw_decode(enc[: len(enc) // 4], 2, 32)
    # hand-build: CLEAR (100b) then code 6 (> literals) at width 3
    # bits LSB-first: 4 then 6 -> 0b110_100 = 0x34
    with pytest.raises(ValueError, match="not literal"):
        gc._lzw_decode(bytes([0x34]), 2, 4)


def test_hand_built_minimal_gif_87a():
    # 2x2, 2-color global table, codes: CLEAR 1 0 0 1 EOI at width 3
    # (mcs=2 per spec minimum even for 1-bit palettes)
    px = [1, 0, 0, 1]
    lzw = gc._lzw_encode(bytes(px), 2)
    buf = bytearray()
    buf += b"GIF87a" + struct.pack("<HH", 2, 2)
    buf += bytes([0x80, 0, 0])  # GCT present, size 2
    buf += bytes([10, 20, 30, 200, 210, 220])
    buf += b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
    buf += bytes([2, len(lzw)]) + lzw + b"\x00"
    buf += b"\x3b"
    out = gc.decode_gif(bytes(buf))
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [200, 210, 220]
    assert out[0, 1].tolist() == [10, 20, 30]
    assert out[1, 1].tolist() == [200, 210, 220]


def test_local_color_table_overrides_global():
    img = _rand_img(4, 4, 8, 3)
    enc = bytearray(gc.encode_gif(img))
    # rebuild by hand: move the GCT into a local table with different
    # global colors — decode must use the local one
    meta_end = 13
    packed = enc[10]
    n = 2 << (packed & 0x07)
    gct = bytes(enc[meta_end : meta_end + 3 * n])
    body = bytes(enc[meta_end + 3 * n :])
    assert body[0] == 0x2C
    rebuilt = bytearray()
    rebuilt += enc[:10] + bytes([packed]) + enc[11:13]
    rebuilt += b"\xff" * (3 * n)  # poisoned global table
    rebuilt += body[:9]
    ipacked = body[9] | 0x80 | (packed & 0x07)  # local table, same size
    rebuilt += bytes([ipacked]) + gct + body[10:]
    out = gc.decode_gif(bytes(rebuilt))
    assert (out == img).all()


def test_unknown_block_raises():
    img = _rand_img(2, 2, 2, 4)
    enc = bytearray(gc.encode_gif(img))
    n = 2 << (enc[10] & 0x07)
    enc[13 + 3 * n] = 0x7E  # clobber the image-descriptor introducer
    with pytest.raises(ValueError, match="unknown block"):
        gc.decode_gif(bytes(enc))


# --- encoder round-trips -------------------------------------------------------


@pytest.mark.parametrize("n_colors", [2, 3, 16, 256])
def test_roundtrip_palette_sizes(n_colors):
    img = _rand_img(13, 17, n_colors, n_colors)
    assert (gc.decode_gif(gc.encode_gif(img)) == img).all()


def test_roundtrip_interlaced():
    # heights hitting every interlace pass boundary
    for h in (1, 2, 3, 5, 8, 9, 17):
        img = _rand_img(h, 7, 11, h)
        enc = gc.encode_gif(img, interlace=True)
        assert (gc.decode_gif(enc) == img).all()


def test_roundtrip_rgba_input_drops_alpha():
    img = _rand_img(6, 6, 5, 7, channels=4)
    out = gc.decode_gif(gc.encode_gif(img))
    assert (out == img[:, :, :3]).all()


def test_too_many_colors_raises():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256"):
        gc.encode_gif(img)


def test_transparency_roundtrip():
    img = _rand_img(5, 5, 4, 9)
    tcolor = tuple(int(v) for v in img[0, 0])
    enc = gc.encode_gif(img, transparent_color=tcolor)
    out = gc.decode_gif(enc)
    assert out.shape[2] == 4  # transparency -> RGBA
    mask = (img == np.array(tcolor, dtype=np.uint8)).all(axis=2)
    assert (out[:, :, 3] == np.where(mask, 0, 255)).all()
    assert (out[:, :, :3][~mask] == img[~mask]).all()


def test_deterministic_bytes():
    img = _rand_img(9, 9, 12, 10)
    assert gc.encode_gif(img) == gc.encode_gif(img)


# --- animations / disposal -----------------------------------------------------


def test_multiframe_do_not_dispose_composites():
    base = _rand_img(8, 8, 6, 11)
    f2 = base.copy()
    f2[2:5, 2:5] = base[0, 0]
    enc = gc.encode_gif(base, frames=[f2])
    frames = gc.decode_gif_frames(enc)
    assert len(frames) == 2
    assert (frames[0][:, :, :3] == base).all()
    assert (frames[1][:, :, :3] == f2).all()
    assert b"NETSCAPE2.0" in enc


def test_disposal_restore_background_and_previous():
    # hand-build: full-screen frame A, then a 1x1 patch with disposal 3
    # (restore previous), then another 1x1 patch elsewhere — the third
    # frame must see A restored under it, not the second patch
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    table, size_field = gc._color_table_bytes(pal)
    buf = bytearray()
    buf += b"GIF89a" + struct.pack("<HH", 3, 3)
    buf += bytes([0x80 | size_field, 0, 0]) + table

    def frame(left, top, w, h, idxs, disposal):
        buf.extend(b"\x21\xf9\x04")
        buf.append(disposal << 2)
        buf.extend(b"\x00\x00\x00\x00")
        buf.extend(b"\x2c" + struct.pack("<HHHH", left, top, w, h) + b"\x00")
        lzw = gc._lzw_encode(bytes(idxs), 2)
        buf.append(2)
        buf.append(len(lzw))
        buf.extend(lzw + b"\x00")

    frame(0, 0, 3, 3, [1] * 9, 0)        # all red
    frame(1, 1, 1, 1, [2], 3)            # green patch, restore-previous
    frame(0, 0, 1, 1, [2], 0)            # green corner
    buf += b"\x3b"
    frames = gc.decode_gif_frames(bytes(buf))
    assert len(frames) == 3
    assert frames[0][1, 1, :3].tolist() == [255, 0, 0]
    assert frames[1][1, 1, :3].tolist() == [0, 255, 0]
    # restore-previous: the patched cell is red again in frame 3
    assert frames[2][1, 1, :3].tolist() == [255, 0, 0]
    assert frames[2][0, 0, :3].tolist() == [0, 255, 0]


def test_decode_image_dispatch_and_luma():
    img = _rand_img(6, 4, 9, 12)
    enc = gc.encode_gif(img)
    out = ic.decode_image(enc)
    assert (out == img).all()
    assert ic.luma(out).shape == (6, 4)
