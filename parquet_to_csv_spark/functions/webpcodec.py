"""Pure-Python WebP-LOSSLESS (VP8L) codec — decode + deterministic
encode.

Round-10 verdict item 5: VP8L was the one remaining IMAGE boundary in
SURVEY §2.7 that needs no native library — the format is pure-integer
LZ77 + canonical prefix (Huffman) coding + reversible pixel transforms
(public spec: "WebP Lossless Bitstream Specification", RFC 9649 §4;
reference container format RIFF/WEBP). The FLAC (functions/
flaccodec.py) and JPEG (functions/imagecodec.py) decoders are the
in-repo precedent for this kind of from-spec implementation.

Decoder scope (the full lossless core):
- RIFF/WEBP container with a VP8L chunk (VP8X-wrapped lossless and
  lossy VP8 still raise NotImplementedError — the §2.7 boundary
  shrinks to lossy codecs + video).
- All four transforms, inverse-applied in reverse stream order:
  PREDICTOR (all 14 modes), COLOR (cross-color deltas), SUBTRACT_GREEN,
  COLOR_INDEXING (incl. sub-byte pixel bundling for palettes ≤ 16).
- Entropy-coded images: simple (1–2 symbol) and normal prefix codes
  (code-length codes with 16/17/18 repeats, optional max_symbol),
  single-symbol codes read ZERO bits (spec: degenerate trees),
  meta-prefix (entropy image) selection, color cache (hash
  0x1e35a7bd·argb >> (32−bits)), LZ77 backward references with both
  the 120-entry 2D neighborhood distance map and plain dist+120 codes.

Encoder scope (deterministic, bounded — the round-trip half of the
oracle gate, like ``encode_jpeg``/``encode_png``):
- optional SUBTRACT_GREEN transform, optional color cache,
  run-length LZ77 (distance 1) for pixel runs, per-channel canonical
  prefix codes (simple codes when ≤2 distinct byte symbols, else
  normal codes emitted through a code-length code with 17/18 zero-run
  tokens). No meta-prefix. Output is byte-exactly reproducible for a
  given image + options.

Decoded form matches ``imagecodec``: numpy uint8 (H, W, C), C = 4 when
the header's alpha flag is set, else 3.
"""

from __future__ import annotations

import struct

import numpy as np

WEBP_RIFF = b"RIFF"
WEBP_FOURCC = b"WEBP"
VP8L_FOURCC = b"VP8L"
VP8L_SIGNATURE = 0x2F

# transform types (spec §4.1)
T_PREDICTOR = 0
T_COLOR = 1
T_SUBTRACT_GREEN = 2
T_COLOR_INDEXING = 3

# code-length-code read order (spec §5.2.2)
CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# The 120-entry 2D distance map (spec §4.2.2): codes 1..120 address the
# close pixel neighborhood; larger codes are 1D distances minus 120.
# The published table is exactly the neighborhood {y=0: x in 1..8;
# y in 1..7: x in -7..8} sorted by (x²+y², -y, -x) — generated here and
# PINNED against the spec's listed prefix in tests/test_webpcodec.py.
DISTANCE_MAP: list[tuple[int, int]] = sorted(
    [(x, 0) for x in range(1, 9)]
    + [(x, y) for y in range(1, 8) for x in range(-7, 9)],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]),
)
assert len(DISTANCE_MAP) == 120


def sniff_webp(payload: bytes) -> str | None:
    """'vp8l' for a lossless WebP, 'webp' for any other WebP flavor,
    None otherwise."""
    if (
        payload is None
        or len(payload) < 16
        or payload[:4] != WEBP_RIFF
        or payload[8:12] != WEBP_FOURCC
    ):
        return None
    return "vp8l" if payload[12:16] == VP8L_FOURCC else "webp"


# ---------------------------------------------------------------------------
# bit I/O — VP8L is LSB-first within each byte
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


class _PrefixCode:
    """Canonical prefix decoder from a per-symbol length array.
    Codes are assigned in (length, symbol) order, read MSB-first.
    A single-symbol code reads ZERO bits (spec: degenerate tree)."""

    def __init__(self, lengths: list[int]):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("prefix code with no symbols")
        if len(nz) == 1:
            self.single: int | None = nz[0][1]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        nz.sort()
        code = 0
        prev_len = nz[0][0]
        self.table = {}
        # Kraft check while assigning — an over-/under-subscribed code
        # is a corrupt stream, not a decoder bug
        for ln, sym in nz:
            code <<= ln - prev_len
            prev_len = ln
            self.table[(ln, code)] = sym
            code += 1
        if code != (1 << prev_len):
            raise ValueError("incomplete prefix code")

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("prefix code desync")


def _code_lengths_from_freqs(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Length-limited Huffman code lengths; symbols with zero frequency
    get no code. Plain Huffman depth grows with frequency SKEW (a
    Fibonacci-distributed channel exceeds 15 with ~25 live symbols), so
    when the cap is hit the counts-per-length histogram is repaired
    (clamp + Kraft renormalize, the zlib/miniz enforce-max-code-size
    move) and lengths are reassigned shortest-first to the most
    frequent symbols. The result is always Kraft-complete at max_len,
    which is what the VP8L canonical-code reader requires."""
    import heapq

    items = [(f, sym) for sym, f in freqs.items() if f > 0]
    if not items:
        return {}
    if len(items) == 1:
        return {items[0][1]: 1}  # paired with a dummy by the caller
    heap = [(f, sym, None, None) for f, sym in items]
    heapq.heapify(heap)
    nodes = []
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        nodes.append((a, b))
        heapq.heappush(heap, (a[0] + b[0], -len(nodes), a, b))
    lengths: dict[int, int] = {}

    def walk(node, depth):
        if node[2] is None and node[3] is None:
            lengths[node[1]] = max(depth, 1)
        else:
            walk(node[2], depth + 1)
            walk(node[3], depth + 1)

    walk(heap[0], 0)
    if max(lengths.values()) <= max_len:
        return lengths
    # Over-deep: clamp every length to max_len, then repair the Kraft
    # sum. Each repair step retires one code at max_len and splits one
    # shallower code into two children one level deeper — symbol count
    # is preserved and the weighted total (in units of 2^-max_len)
    # drops by exactly 1 per step until the code is complete.
    counts = [0] * (max_len + 1)
    for ln in lengths.values():
        counts[min(ln, max_len)] += 1
    total = sum(counts[ln] << (max_len - ln) for ln in range(1, max_len + 1))
    cap = 1 << max_len
    while total > cap:
        counts[max_len] -= 1
        for ln in range(max_len - 1, 0, -1):
            if counts[ln]:
                counts[ln] -= 1
                counts[ln + 1] += 2
                break
        total -= 1
    # shortest lengths to the most frequent symbols (ties: symbol order)
    syms = sorted(lengths, key=lambda s: (-freqs[s], s))
    out: dict[int, int] = {}
    i = 0
    for ln in range(1, max_len + 1):
        for _ in range(counts[ln]):
            out[syms[i]] = ln
            i += 1
    return out


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical (length, symbol) order."""
    nz = sorted((ln, sym) for sym, ln in lengths.items())
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev = nz[0][0]
    for ln, sym in nz:
        code <<= ln - prev
        prev = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


# ---------------------------------------------------------------------------
# prefix-coded integers (lengths & distances, spec §4.2.2)
# ---------------------------------------------------------------------------


def _prefix_decode(sym: int, br: _BitReader) -> int:
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value -> (symbol, n_extra_bits, extra_value)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    bits = v.bit_length() - 1
    extra = bits - 1
    rem = v - (1 << bits)
    if rem < (1 << extra):
        return 2 * bits, extra, rem
    return 2 * bits + 1, extra, rem - (1 << extra)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        n_sym = br.read(1) + 1
        first = br.read(8) if br.read(1) else br.read(1)
        lengths = [0] * alphabet_size
        if n_sym == 1:
            lengths[first] = 1
            pc = _PrefixCode.__new__(_PrefixCode)
            pc.single = first
            pc.table = {}
            return pc
        second = br.read(8)
        lengths[first] = 1
        lengths[second] = 1
        pc = _PrefixCode.__new__(_PrefixCode)
        pc.single = None
        # simple 2-symbol code: first symbol READ gets bit 0 (stream
        # order, not canonical symbol order)
        pc.table = {(1, 0): first, (1, 1): second}
        return pc
    # normal code: code-length code first
    n_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(n_cl):
        cl_lengths[CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # bounded symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    sym = 0
    prev_len = 8
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            lengths[sym : sym + rep] = [prev_len] * min(rep, alphabet_size - sym)
            sym += rep
        elif cl == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    return _PrefixCode(lengths)


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _hash_argb(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_image_stream(
    br: _BitReader, w: int, h: int, is_level0: bool
) -> np.ndarray:
    """DecodeImageStream (spec §7 pseudocode): optional transforms only
    at level 0 are handled by the caller; here: color cache, meta
    prefix (level 0 only), prefix-code groups, LZ77 pixel loop.
    Returns flat uint32 ARGB of length w*h."""
    # color cache (all levels)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color-cache bits {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    # meta prefix (level 0 only)
    meta = None
    huffman_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):
        huffman_bits = 2 + br.read(3)
        mw = _subsample_size(w, huffman_bits)
        mh = _subsample_size(h, huffman_bits)
        meta = _decode_image_stream(br, mw, mh, False)
        n_groups = 1 + max((int(p) >> 8) & 0xFFFF for p in meta)
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, 256 + 24 + cache_size),  # green
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )
    n = w * h
    out = np.zeros(n, dtype=np.uint64)  # uint64: avoids uint32 overflow fuss
    pos = 0
    mw = _subsample_size(w, huffman_bits) if meta is not None else 0

    def group_at(p: int):
        if meta is None:
            return groups[0]
        x, y = p % w, p // w
        mp = int(meta[(y >> huffman_bits) * mw + (x >> huffman_bits)])
        return groups[(mp >> 8) & 0xFFFF]

    def cache_insert(argb: int) -> None:
        if cache is not None:
            cache[_hash_argb(argb, cache_bits)] = argb

    while pos < n:
        g_code, r_code, b_code, a_code, d_code = group_at(pos)
        s = g_code.read(br)
        if s < 256:  # literal
            red = r_code.read(br)
            blue = b_code.read(br)
            alpha = a_code.read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = argb
            cache_insert(argb)
            pos += 1
        elif s < 256 + 24:  # backward reference
            length = _prefix_decode(s - 256, br)
            dist_code = _prefix_decode(d_code.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = DISTANCE_MAP[dist_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("LZ77 reference out of range")
            for _ in range(length):
                argb = int(out[pos - dist])
                out[pos] = argb
                cache_insert(argb)
                pos += 1
        else:  # color-cache hit
            if cache is None:
                raise ValueError("cache symbol without a cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) >> 1)
    )


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _select(left: int, top: int, tl: int) -> int:
    s_l = sum(
        abs(((left >> sh) & 0xFF) - ((tl >> sh) & 0xFF)) for sh in (24, 16, 8, 0)
    )
    s_t = sum(
        abs(((top >> sh) & 0xFF) - ((tl >> sh) & 0xFF)) for sh in (24, 16, 8, 0)
    )
    # spec: predict TOP when left is at-least-as-close to the corner
    return top if s_l <= s_t else left


def _clamp_add_sub_full(left: int, top: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp255(((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= c << sh
    return out


def _clamp_add_sub_half(left: int, top: int, tl: int) -> int:
    ave = _avg2(left, top)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)  # C trunc-toward-zero
        out |= _clamp255(a + half) << sh
    return out


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:
        return _select(left, top, tl)
    if mode == 12:
        return _clamp_add_sub_full(left, top, tl)
    if mode == 13:
        return _clamp_add_sub_half(left, top, tl)
    raise ValueError(f"predictor mode {mode}")


def _add_pixels(residual: int, pred: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((residual >> sh) & 0xFF) + ((pred >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _inverse_predictor(pix: np.ndarray, w: int, h: int, bits: int, tiles: np.ndarray) -> None:
    tw = _subsample_size(w, bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(pix[i - 1])  # left
            elif x == 0:
                pred = int(pix[i - w])  # top
            else:
                mode = (int(tiles[(y >> bits) * tw + (x >> bits)]) >> 8) & 0xFF
                left = int(pix[i - 1])
                top = int(pix[i - w])
                tl = int(pix[i - w - 1])
                # top-right of the last column wraps to this row's
                # first pixel in the flat buffer — already decoded
                tr = int(pix[i - w + 1])
                pred = _predict(mode, left, top, tl, tr)
            pix[i] = _add_pixels(int(pix[i]), pred)


def _ct_delta(t: int, c: int) -> int:
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_color_transform(pix: np.ndarray, w: int, h: int, bits: int, tiles: np.ndarray) -> None:
    tw = _subsample_size(w, bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = int(tiles[(y >> bits) * tw + (x >> bits)])
            g2r = cte & 0xFF  # blue channel
            g2b = (cte >> 8) & 0xFF  # green channel
            r2b = (cte >> 16) & 0xFF  # red channel
            p = int(pix[i])
            g = (p >> 8) & 0xFF
            r = (p >> 16) & 0xFF
            b = p & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            pix[i] = (p & 0xFF00FF00) | (r << 16) | b


def _inverse_subtract_green(pix: np.ndarray) -> None:
    g = (pix >> np.uint64(8)) & np.uint64(0xFF)
    r = ((pix >> np.uint64(16)) & np.uint64(0xFF)) + g
    b = (pix & np.uint64(0xFF)) + g
    pix[:] = (
        (pix & np.uint64(0xFF00FF00))
        | ((r & np.uint64(0xFF)) << np.uint64(16))
        | (b & np.uint64(0xFF))
    )


def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode a lossless WebP (RIFF + VP8L) to (H, W, C) uint8,
    C = 4 when the stream's alpha flag is set, else 3."""
    kind = sniff_webp(payload)
    if kind is None:
        raise ValueError("not a WebP payload")
    if kind != "vp8l":
        raise NotImplementedError(
            "only the lossless (VP8L) WebP flavor has a pure-Python "
            "decoder; lossy VP8 / VP8X-extended need libwebp"
        )
    (chunk_size,) = struct.unpack("<I", payload[16:20])
    data = payload[20 : 20 + chunk_size]
    if not data or data[0] != VP8L_SIGNATURE:
        raise ValueError("bad VP8L signature")
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_used = br.read(1)
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")

    # transforms (each type at most once; inverse-applied in reverse)
    transforms: list[tuple[int, object]] = []
    cur_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in (T_PREDICTOR, T_COLOR):
            bits = 2 + br.read(3)
            tw = _subsample_size(cur_w, bits)
            th = _subsample_size(h, bits)
            tiles = _decode_image_stream(br, tw, th, False)
            transforms.append((ttype, (bits, tiles)))
        elif ttype == T_SUBTRACT_GREEN:
            transforms.append((ttype, None))
        elif ttype == T_COLOR_INDEXING:
            n_colors = br.read(8) + 1
            deltas = _decode_image_stream(br, n_colors, 1, False)
            palette = np.zeros(n_colors, dtype=np.uint64)
            prev = 0
            for i in range(n_colors):
                prev = _add_pixels(int(deltas[i]), prev)
                palette[i] = prev
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((ttype, (width_bits, palette, cur_w)))
            cur_w = _subsample_size(cur_w, width_bits)
        else:
            raise ValueError(f"transform type {ttype}")

    pix = _decode_image_stream(br, cur_w, h, True)

    for ttype, tdata in reversed(transforms):
        if ttype == T_COLOR_INDEXING:
            width_bits, palette, full_w = tdata
            if width_bits:
                bpp = 8 >> width_bits
                mask = (1 << bpp) - 1
                out = np.zeros(full_w * h, dtype=np.uint64)
                for y in range(h):
                    for x in range(full_w):
                        packed = int(pix[y * cur_w + (x >> width_bits)])
                        green = (packed >> 8) & 0xFF
                        idx = (green >> ((x & ((1 << width_bits) - 1)) * bpp)) & mask
                        out[y * full_w + x] = (
                            palette[idx] if idx < len(palette) else 0
                        )
                pix = out
            else:
                idxs = ((pix >> np.uint64(8)) & np.uint64(0xFF)).astype(np.int64)
                safe = np.where(idxs < len(palette), idxs, 0)
                pix = np.where(
                    idxs < len(palette), palette[safe], np.uint64(0)
                ).astype(np.uint64)
            cur_w = full_w
        elif ttype == T_SUBTRACT_GREEN:
            _inverse_subtract_green(pix)
        elif ttype == T_COLOR:
            bits, tiles = tdata
            _inverse_color_transform(pix, cur_w, h, bits, tiles)
        elif ttype == T_PREDICTOR:
            bits, tiles = tdata
            _inverse_predictor(pix, cur_w, h, bits, tiles)

    a = ((pix >> np.uint64(24)) & np.uint64(0xFF)).astype(np.uint8)
    r = ((pix >> np.uint64(16)) & np.uint64(0xFF)).astype(np.uint8)
    g = ((pix >> np.uint64(8)) & np.uint64(0xFF)).astype(np.uint8)
    b = (pix & np.uint64(0xFF)).astype(np.uint8)
    if alpha_used:
        img = np.stack([r, g, b, a], axis=-1)
        return img.reshape(h, w, 4)
    return np.stack([r, g, b], axis=-1).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _emit_prefix_code(
    bw: _BitWriter, freqs: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Write one prefix-code definition; return symbol -> (code, len)
    for the payload emission that follows."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]  # a code must exist even if never read
    if len(used) <= 2 and max(used) <= 255:
        # simple code
        bw.write(1, 1)
        bw.write(len(used) - 1, 1)
        if used[0] <= 1 and len(used) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}  # zero-bit code
        bw.write(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    # normal code
    lengths = _code_lengths_from_freqs(freqs, 15)
    if len(lengths) == 1:
        # degenerate high-symbol code: pair with a dummy for a
        # complete 1-bit code (symbol 0 never emitted)
        only = next(iter(lengths))
        dummy = 0 if only != 0 else 1
        lengths = {only: 1, dummy: 1}
    codes = _canonical_codes(lengths)
    # token stream over the per-symbol length array
    seq = [lengths.get(s, 0) for s in range(alphabet_size)]
    # trim trailing zeros — cheaper via max_symbol? keep simple: emit
    # zero-runs with 17/18 instead (no max_symbol header field)
    tokens: list[tuple[int, int, int]] = []  # (cl_symbol, extra_bits, extra)
    i = 0
    while i < len(seq):
        if seq[i] == 0:
            j = i
            while j < len(seq) and seq[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                tokens.append((18, 7, r - 11))
                run -= r
            while run >= 3:
                r = min(run, 10)
                tokens.append((17, 3, r - 3))
                run -= r
            for _ in range(run):
                tokens.append((0, 0, 0))
            i = j
        else:
            tokens.append((seq[i], 0, 0))
            i += 1
    cl_freqs: dict[int, int] = {}
    for t, _, _ in tokens:
        cl_freqs[t] = cl_freqs.get(t, 0) + 1
    cl_lengths = _code_lengths_from_freqs(cl_freqs, 7)
    if len(cl_lengths) == 1:
        only = next(iter(cl_lengths))
        dummy = 0 if only != 0 else 1
        cl_lengths = {only: 1, dummy: 1}
    cl_codes = _canonical_codes(cl_lengths)
    bw.write(0, 1)  # normal code marker
    n_cl = max(
        (CL_ORDER.index(s) + 1 for s, ln in cl_lengths.items() if ln > 0),
        default=4,
    )
    n_cl = max(n_cl, 4)
    bw.write(n_cl - 4, 4)
    for k in range(n_cl):
        bw.write(cl_lengths.get(CL_ORDER[k], 0), 3)
    bw.write(0, 1)  # no max_symbol bound — tokens cover the alphabet
    for t, nbits, extra in tokens:
        c, ln = cl_codes[t]
        bw.write(_reverse_code(c, ln), ln)
        if nbits:
            bw.write(extra, nbits)
    return codes


def _reverse_code(code: int, length: int) -> int:
    """Prefix-code bits are read MSB-first while the writer packs
    LSB-first — reverse so the reader sees MSB first."""
    out = 0
    for _ in range(length):
        out = (out << 1) | (code & 1)
        code >>= 1
    return out


def _emit_symbol(bw: _BitWriter, codes: dict[int, tuple[int, int]], sym: int) -> None:
    code, ln = codes[sym]
    if ln:
        bw.write(_reverse_code(code, ln), ln)


def encode_vp8l(
    img: np.ndarray,
    subtract_green: bool = False,
    cache_bits: int = 0,
    use_lz77: bool = True,
) -> bytes:
    """Deterministic VP8L encoder: optional SUBTRACT_GREEN transform,
    optional color cache, run-length LZ77 (distance 1), per-channel
    canonical prefix codes, no meta-prefix. Lossless by construction —
    the decoder returns the input exactly (alpha channel preserved for
    (H, W, 4) inputs)."""
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("expected (H, W, 3|4) uint8")
    h, w = img.shape[:2]
    if not (1 <= w <= (1 << 14) and 1 <= h <= (1 << 14)):
        raise ValueError("VP8L dimensions are 14-bit")
    has_alpha = img.shape[2] == 4
    a = img[:, :, 3].astype(np.uint64) if has_alpha else np.full(
        (h, w), 255, dtype=np.uint64
    )
    r = img[:, :, 0].astype(np.uint64)
    g = img[:, :, 1].astype(np.uint64)
    b = img[:, :, 2].astype(np.uint64)
    if subtract_green:
        r = (r - g) & np.uint64(0xFF)
        b = (b - g) & np.uint64(0xFF)
    argb = ((a << np.uint64(24)) | (r << np.uint64(16)) | (g << np.uint64(8)) | b).reshape(-1)

    # token pass: literals / dist-1 runs / cache hits
    cache = [None] * (1 << cache_bits) if cache_bits else None
    ops: list[tuple] = []  # ("lit", argb) | ("copy", length) | ("hit", idx)
    g_freq: dict[int, int] = {}
    r_freq: dict[int, int] = {}
    b_freq: dict[int, int] = {}
    a_freq: dict[int, int] = {}
    d_freq: dict[int, int] = {}

    def bump(d: dict[int, int], s: int) -> None:
        d[s] = d.get(s, 0) + 1

    n = len(argb)
    i = 0
    while i < n:
        px = int(argb[i])
        if use_lz77 and i > 0 and px == int(argb[i - 1]):
            run = 1
            while i + run < n and int(argb[i + run]) == px and run < 4095:
                run += 1
            if run >= 3:
                sym, _, _ = _prefix_encode(run)
                bump(g_freq, 256 + sym)
                dsym, _, _ = _prefix_encode(121)  # dist 1 -> code 121
                bump(d_freq, dsym)
                ops.append(("copy", run))
                if cache is not None:
                    cache[_hash_argb(px, cache_bits)] = px
                i += run
                continue
        if cache is not None:
            idx = _hash_argb(px, cache_bits)
            if cache[idx] == px:
                bump(g_freq, 256 + 24 + idx)
                ops.append(("hit", idx))
                i += 1
                continue
            cache[idx] = px
        ops.append(("lit", px))
        bump(g_freq, (px >> 8) & 0xFF)
        bump(r_freq, (px >> 16) & 0xFF)
        bump(b_freq, px & 0xFF)
        bump(a_freq, (px >> 24) & 0xFF)
        i += 1

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)  # transform present
        bw.write(T_SUBTRACT_GREEN, 2)
    bw.write(0, 1)  # end of transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # no meta-prefix
    cache_size = (1 << cache_bits) if cache_bits else 0
    g_codes = _emit_prefix_code(bw, g_freq, 256 + 24 + cache_size)
    r_codes = _emit_prefix_code(bw, r_freq, 256)
    b_codes = _emit_prefix_code(bw, b_freq, 256)
    a_codes = _emit_prefix_code(bw, a_freq, 256)
    d_codes = _emit_prefix_code(bw, d_freq, 40)
    for op in ops:
        if op[0] == "lit":
            px = op[1]
            _emit_symbol(bw, g_codes, (px >> 8) & 0xFF)
            _emit_symbol(bw, r_codes, (px >> 16) & 0xFF)
            _emit_symbol(bw, b_codes, px & 0xFF)
            _emit_symbol(bw, a_codes, (px >> 24) & 0xFF)
        elif op[0] == "copy":
            run = op[1]
            sym, nbits, extra = _prefix_encode(run)
            _emit_symbol(bw, g_codes, 256 + sym)
            if nbits:
                bw.write(extra, nbits)
            dsym, dnbits, dextra = _prefix_encode(121)
            _emit_symbol(bw, d_codes, dsym)
            if dnbits:
                bw.write(dextra, dnbits)
        else:  # cache hit
            _emit_symbol(bw, g_codes, 256 + 24 + op[1])
    stream = bytes([VP8L_SIGNATURE]) + bw.finish()
    chunk = VP8L_FOURCC + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    riff = WEBP_FOURCC + chunk
    return WEBP_RIFF + struct.pack("<I", len(riff)) + riff
