"""Round-10 verdict item 5: pure-Python WebP-lossless (VP8L) codec.

Round-trip tests drive the deterministic encoder through the full
decoder; the decoder-only paths the encoder never emits (PREDICTOR /
COLOR / COLOR_INDEXING transforms, meta-prefix selection, 2D
neighborhood distance codes) are exercised with HAND-BUILT bitstreams
assembled from the codec's own bit-writer + prefix-code emitters, with
expected pixels computed from the spec's forward transforms in the
test itself.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

import parquet_to_csv_spark.functions.webpcodec as wc
from parquet_to_csv_spark.functions import imagecodec as ic


# --- spec pins ----------------------------------------------------------------


def test_distance_map_matches_spec_prefix():
    """First 22 entries of the 120-entry neighborhood map, exactly as
    listed in the WebP Lossless Bitstream Specification §4.2.2."""
    expect = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    assert wc.DISTANCE_MAP[:22] == expect
    assert len(wc.DISTANCE_MAP) == 120
    assert len(set(wc.DISTANCE_MAP)) == 120


def test_prefix_int_coding_roundtrip():
    for v in list(range(1, 50)) + [63, 64, 65, 127, 1024, 4095]:
        sym, nbits, extra = wc._prefix_encode(v)
        bw = wc._BitWriter()
        bw.write(extra, nbits)
        br = wc._BitReader(bw.finish() or b"\x00")
        assert wc._prefix_decode(sym, br) == v, v


def test_container_shape():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    enc = wc.encode_vp8l(img)
    assert enc[:4] == b"RIFF" and enc[8:12] == b"WEBP"
    assert enc[12:16] == b"VP8L"
    (riff_size,) = struct.unpack("<I", enc[4:8])
    assert riff_size == len(enc) - 8
    assert wc.sniff_webp(enc) == "vp8l"
    assert ic.sniff_format(enc) == "webp"


# --- encoder<->decoder round-trips ---------------------------------------------


@pytest.mark.parametrize("sg", [False, True])
@pytest.mark.parametrize("cache_bits", [0, 5])
def test_roundtrip_random_rgb(sg, cache_bits):
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(13, 17, 3)).astype(np.uint8)
    out = wc.decode_vp8l(
        wc.encode_vp8l(img, subtract_green=sg, cache_bits=cache_bits)
    )
    assert out.shape == (13, 17, 3)
    assert (out == img).all()


def test_roundtrip_rgba_preserves_alpha():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(9, 6, 4)).astype(np.uint8)
    out = wc.decode_vp8l(wc.encode_vp8l(img))
    assert out.shape == (9, 6, 4)
    assert (out == img).all()


def test_roundtrip_runs_use_lz77_and_shrink():
    img = np.zeros((32, 64, 3), dtype=np.uint8)
    img[10:20, :] = 99
    with_lz = wc.encode_vp8l(img, use_lz77=True)
    without = wc.encode_vp8l(img, use_lz77=False)
    assert (wc.decode_vp8l(with_lz) == img).all()
    assert (wc.decode_vp8l(without) == img).all()
    assert len(with_lz) < len(without) / 4  # the refs actually fired


def test_roundtrip_deterministic_bytes():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
    assert wc.encode_vp8l(img, cache_bits=4) == wc.encode_vp8l(img, cache_bits=4)


def test_single_pixel_and_constant_images():
    one = np.array([[[5, 250, 17]]], dtype=np.uint8)
    assert (wc.decode_vp8l(wc.encode_vp8l(one)) == one).all()
    const = np.full((7, 11, 3), 123, dtype=np.uint8)
    assert (wc.decode_vp8l(wc.encode_vp8l(const)) == const).all()


def test_decode_image_dispatch():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(6, 6, 3)).astype(np.uint8)
    assert (ic.decode_image(wc.encode_vp8l(img)) == img).all()


def test_lossy_webp_still_raises():
    fake = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12
    with pytest.raises(NotImplementedError):
        wc.decode_vp8l(fake)
    with pytest.raises(NotImplementedError):
        ic.decode_image(fake)


# --- hand-built streams for decoder-only paths ---------------------------------


def _emit_literal_image(bw, pixels, level0=False, dist_syms=None):
    """Emit one entropy-coded image as pure literals (helper mirrors
    the encoder's channel split; dist_syms seeds the distance code's
    frequency table when the caller will append refs by hand)."""
    bw.write(0, 1)  # no color cache
    if level0:
        bw.write(0, 1)  # no meta-prefix
    freqs = [dict() for _ in range(4)]
    for px in pixels:
        for d, sh in zip(freqs, (8, 16, 0, 24)):
            s = (px >> sh) & 0xFF
            d[s] = d.get(s, 0) + 1
    g_codes = wc._emit_prefix_code(bw, freqs[0], 256 + 24)
    r_codes = wc._emit_prefix_code(bw, freqs[1], 256)
    b_codes = wc._emit_prefix_code(bw, freqs[2], 256)
    a_codes = wc._emit_prefix_code(bw, freqs[3], 256)
    d_codes = wc._emit_prefix_code(bw, dist_syms or {}, 40)
    for px in pixels:
        wc._emit_symbol(bw, g_codes, (px >> 8) & 0xFF)
        wc._emit_symbol(bw, r_codes, (px >> 16) & 0xFF)
        wc._emit_symbol(bw, b_codes, px & 0xFF)
        wc._emit_symbol(bw, a_codes, (px >> 24) & 0xFF)
    return g_codes, d_codes


def _wrap(w, h, body_bits: "_LoggingWriter", alpha=0) -> bytes:
    # splice: re-write the logged body bit-by-bit after the header
    merged = wc._BitWriter()
    merged.write(w - 1, 14)
    merged.write(h - 1, 14)
    merged.write(alpha, 1)
    merged.write(0, 3)
    for i in range(body_bits.nbits_total):
        byte = body_bits.log[i]
        merged.write(byte, 1)
    stream = bytes([wc.VP8L_SIGNATURE]) + merged.finish()
    chunk = wc.VP8L_FOURCC + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    riff = wc.WEBP_FOURCC + chunk
    return wc.WEBP_RIFF + struct.pack("<I", len(riff)) + riff


class _LoggingWriter(wc._BitWriter):
    """BitWriter that also logs every bit so a stream can be spliced
    after an arbitrary-length header."""

    def __init__(self):
        super().__init__()
        self.log: list[int] = []
        self.nbits_total = 0

    def write(self, v, n):
        for i in range(n):
            self.log.append((v >> i) & 1)
        self.nbits_total += n
        super().write(v, n)


def _argb(r, g, b, a=255):
    return (a << 24) | (r << 16) | (g << 8) | b


def _channels(px):
    return ((px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF)


def _sub_pixels(px, pred):
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((px >> sh) & 0xFF) - ((pred >> sh) & 0xFF)) & 0xFF) << sh
    return out


@pytest.mark.parametrize("mode", range(14))
def test_predictor_transform_all_modes(mode):
    """Forward-transform a known 8x8 image with one predictor tile
    (residual = pixel - predict, per spec), hand-emit the stream, and
    require the decoder to reconstruct the original exactly."""
    rng = np.random.RandomState(100 + mode)
    w = h = 8
    img = [
        _argb(*rng.randint(0, 256, size=3))
        for _ in range(w * h)
    ]
    # forward pass mirrors the decoder's scan order and edge rules
    residuals = []
    for i, px in enumerate(img):
        x, y = i % w, i // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = img[i - 1]
        elif x == 0:
            pred = img[i - w]
        else:
            pred = wc._predict(
                mode, img[i - 1], img[i - w], img[i - w - 1], img[i - w + 1]
            )
        residuals.append(_sub_pixels(px, pred))
    bw = _LoggingWriter()
    bw.write(1, 1)  # a transform follows
    bw.write(wc.T_PREDICTOR, 2)
    bw.write(1, 3)  # size_bits = 2 + 1 = 3 -> one 8x8 tile
    _emit_literal_image(bw, [_argb(0, mode, 0, 0)])  # tile: mode in green
    bw.write(0, 1)  # end of transforms
    _emit_literal_image(bw, residuals, level0=True)
    out = wc.decode_vp8l(_wrap(w, h, bw))
    expect = np.array(
        [_channels(px)[1:] for px in img], dtype=np.uint8
    ).reshape(h, w, 3)
    assert (out == expect).all(), f"mode {mode}"


def test_color_transform_inverse():
    """One cross-color tile over a 4x4 image; residuals computed by the
    spec's forward transform (delta = (int8(t)*int8(c)) >> 5)."""
    rng = np.random.RandomState(9)
    w = h = 4
    g2r, g2b, r2b = 0x90, 0x23, 0xF1  # mixed-sign int8 multipliers
    img = [_argb(*rng.randint(0, 256, size=3)) for _ in range(w * h)]
    residuals = []
    for px in img:
        _, r, g, b = _channels(px)
        rr = (r - wc._ct_delta(g2r, g)) & 0xFF
        bb = (b - wc._ct_delta(g2b, g) - wc._ct_delta(r2b, r)) & 0xFF
        residuals.append((px & 0xFF00FF00) | (rr << 16) | bb)
    bw = _LoggingWriter()
    bw.write(1, 1)
    bw.write(wc.T_COLOR, 2)
    bw.write(0, 3)  # size_bits = 2 -> one 4x4 tile
    cte = (r2b << 16) | (g2b << 8) | g2r
    _emit_literal_image(bw, [cte])
    bw.write(0, 1)
    _emit_literal_image(bw, residuals, level0=True)
    out = wc.decode_vp8l(_wrap(w, h, bw))
    expect = np.array(
        [_channels(px)[1:] for px in img], dtype=np.uint8
    ).reshape(h, w, 3)
    assert (out == expect).all()


@pytest.mark.parametrize(
    "n_colors,width_bits", [(2, 3), (3, 2), (12, 1), (40, 0)]
)
def test_color_indexing_transform(n_colors, width_bits):
    """Palette lookup incl. sub-byte bundling for small palettes."""
    rng = np.random.RandomState(n_colors)
    w, h = 11, 3
    palette = [
        _argb(*rng.randint(0, 256, size=3)) for _ in range(n_colors)
    ]
    indices = rng.randint(0, n_colors, size=w * h).tolist()
    # palette entries are DELTA-coded per channel
    deltas = [palette[0]] + [
        _sub_pixels(palette[i], palette[i - 1]) for i in range(1, n_colors)
    ]
    bw = _LoggingWriter()
    bw.write(1, 1)
    bw.write(wc.T_COLOR_INDEXING, 2)
    bw.write(n_colors - 1, 8)
    _emit_literal_image(bw, deltas)
    bw.write(0, 1)  # end of transforms
    # bundle indices into packed green bytes
    if width_bits:
        bpp = 8 >> width_bits
        per = 1 << width_bits
        packed_w = (w + per - 1) >> width_bits
        pixels = []
        for y in range(h):
            for px_i in range(packed_w):
                green = 0
                for k in range(per):
                    x = (px_i << width_bits) + k
                    if x < w:
                        green |= indices[y * w + x] << (k * bpp)
                pixels.append(_argb(0, green, 0, 0))
    else:
        packed_w = w
        pixels = [_argb(0, idx, 0, 0) for idx in indices]
    _emit_literal_image(bw, pixels, level0=True)
    out = wc.decode_vp8l(_wrap(w, h, bw))
    expect = np.array(
        [_channels(palette[i])[1:] for i in indices], dtype=np.uint8
    ).reshape(h, w, 3)
    assert (out == expect).all()


def test_neighborhood_distance_codes():
    """A backward reference through the 2D distance map: code 1 =
    (0, 1) = one full row up. Build: row 0 literal, then one ref
    copying row 0 into row 1."""
    w, h = 5, 2
    rng = np.random.RandomState(21)
    row = [_argb(*rng.randint(0, 256, size=3)) for _ in range(w)]
    bw = _LoggingWriter()
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta (level0)
    lsym, lnbits, lextra = wc._prefix_encode(w)  # copy length = 5
    freqs = [dict() for _ in range(4)]
    for px in row:
        for d, sh in zip(freqs, (8, 16, 0, 24)):
            s = (px >> sh) & 0xFF
            d[s] = d.get(s, 0) + 1
    freqs[0][256 + lsym] = freqs[0].get(256 + lsym, 0) + 1
    g_codes = wc._emit_prefix_code(bw, freqs[0], 256 + 24)
    r_codes = wc._emit_prefix_code(bw, freqs[1], 256)
    b_codes = wc._emit_prefix_code(bw, freqs[2], 256)
    a_codes = wc._emit_prefix_code(bw, freqs[3], 256)
    d_codes = wc._emit_prefix_code(bw, {0: 1}, 40)
    for px in row:
        wc._emit_symbol(bw, g_codes, (px >> 8) & 0xFF)
        wc._emit_symbol(bw, r_codes, (px >> 16) & 0xFF)
        wc._emit_symbol(bw, b_codes, px & 0xFF)
        wc._emit_symbol(bw, a_codes, (px >> 24) & 0xFF)
    wc._emit_symbol(bw, g_codes, 256 + lsym)
    if lnbits:
        bw.write(lextra, lnbits)
    wc._emit_symbol(bw, d_codes, 0)  # dist prefix sym 0 -> dist_code 1
    out = wc.decode_vp8l(_wrap(w, h, bw))
    expect = np.array(
        [_channels(px)[1:] for px in row + row], dtype=np.uint8
    ).reshape(h, w, 3)
    assert (out == expect).all()


def test_meta_prefix_selects_groups():
    """Two prefix groups selected by the entropy image: a 8x2 image
    whose left/right 4-pixel tiles use different constant colors, with
    each group's codes only able to express its own tile's color —
    decoding proves the (red<<8|green) group lookup routes correctly."""
    w, h = 8, 2
    left_px = _argb(10, 20, 30)
    right_px = _argb(200, 210, 220)
    bw = _LoggingWriter()
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta-prefix present
    bw.write(0, 3)  # huffman_bits = 2 -> 4x4 tiles -> 2x1 entropy image
    # entropy image pixels: group ids 0, 1 in (red<<8|green)
    _emit_literal_image(bw, [_argb(0, 0, 0, 0), _argb(0, 1, 0, 0)])
    for px in (left_px, right_px):  # group 0, group 1
        _, r, g, b = _channels(px)
        wc._emit_prefix_code(bw, {g: 1}, 256 + 24)
        wc._emit_prefix_code(bw, {r: 1}, 256)
        wc._emit_prefix_code(bw, {b: 1}, 256)
        wc._emit_prefix_code(bw, {255: 1}, 256)
        wc._emit_prefix_code(bw, {}, 40)
    # all five codes in both groups are single-symbol (zero bits), so
    # the 16 pixels cost no payload bits at all — pure structure test
    out = wc.decode_vp8l(_wrap(w, h, bw))
    expect = np.zeros((h, w, 3), dtype=np.uint8)
    expect[:, :4] = _channels(left_px)[1:]
    expect[:, 4:] = _channels(right_px)[1:]
    assert (out == expect).all()


def test_corrupt_streams_raise():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    enc = bytearray(wc.encode_vp8l(img))
    with pytest.raises(ValueError):
        wc.decode_vp8l(bytes(enc[:20] + b"\x00" + enc[21:]))  # bad signature
    assert wc.sniff_webp(b"not a webp at all") is None


def test_length_limited_huffman_skewed_freqs():
    # Fibonacci frequencies force unrestricted Huffman depth ~n — with
    # ~25 live symbols the deepest code would exceed the VP8L 15-bit
    # cap. The length-limited constructor must clamp + renormalize.
    a, b = 1, 1
    freqs = {}
    for sym in range(25):
        freqs[sym] = a
        a, b = b, a + b
    for cap in (15, 7):
        lengths = wc._code_lengths_from_freqs(freqs, cap)
        assert set(lengths) == set(freqs)
        assert max(lengths.values()) <= cap
        # Kraft-complete at the cap (what the canonical reader needs)
        assert sum(1 << (cap - ln) for ln in lengths.values()) == 1 << cap
        # most frequent symbol gets the shortest code
        top = max(freqs, key=freqs.get)
        assert lengths[top] == min(lengths.values())
    # unskewed input is untouched by the repair path
    flat = wc._code_lengths_from_freqs({s: 1 for s in range(8)}, 15)
    assert set(flat.values()) == {3}


def test_roundtrip_fibonacci_skewed_image():
    # the advisor's repro class: one channel with Fibonacci-distributed
    # values — encode used to raise ValueError('prefix code depth > 15')
    rng = np.random.default_rng(11)
    h, w = 256, 768
    img = np.zeros((h, w, 3), dtype=np.uint8)
    a, b = 1, 1
    counts = []
    for sym in range(24):
        counts.append((sym, a))
        a, b = b, a + b
    total = h * w
    weights = np.array([c for _, c in counts], dtype=np.float64)
    weights /= weights.sum()
    g = rng.choice([s for s, _ in counts], size=total, p=weights)
    img[:, :, 1] = g.reshape(h, w).astype(np.uint8)
    img[:, :, 0] = rng.integers(0, 4, size=(h, w), dtype=np.uint8)
    for sg in (False, True):
        enc = wc.encode_vp8l(img, subtract_green=sg)
        out = wc.decode_vp8l(enc)
        assert (out == img).all()
