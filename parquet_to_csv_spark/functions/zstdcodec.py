"""Pure-Python Zstandard DECODER (RFC 8878) + store-mode writer — round 11.

Closes the SURVEY §2.7 "zstd TEXT codec — libzstd absent" boundary on
the read side from-spec, the same way FLAC (E523) / WebP-lossless
(E524) / Avro (E525) / GIF closed theirs. Everything here follows the
public Zstandard format specification (RFC 8878) — no native library:

- frames: magic, frame-header descriptor (single-segment, content
  size, dictionary-id, checksum flags), window descriptor, skippable
  frames, multi-frame concatenation, xxHash64-based content-checksum
  VERIFICATION (xxh64 implemented below, also public);
- blocks: raw / RLE / compressed, last-block chaining;
- literals: raw / RLE / Huffman-compressed / treeless (table reuse),
  1-stream and 4-stream (jump table) variants, both size formats of
  each header shape;
- Huffman: direct 4-bit weight lists AND FSE-compressed weight
  streams (two alternating states, backward bitstream), canonical
  table build with the implicit last weight;
- FSE: table description (forward bitstream, variable-bit probability
  coding with the small-value threshold trick, -1 "less-than-one"
  probabilities, zero-repeat flags) and decode-table construction
  (spread step (size>>1)+(size>>3)+3, high-threshold placement);
- sequences: predefined / RLE / FSE-compressed / repeat table modes
  for LL/OF/ML, the RFC baseline+extra-bit code tables, interleaved
  state updates (LL→ML→OF), offset history with the three repeat
  offsets and the literals-length-0 shift rule, overlapping match
  copies.

The ENCODER half is deliberately store-mode only (`zstd_compress_store`
emits spec-legal frames of raw blocks + checksum that any zstd reads):
entropy-optimal encoding is a tuning problem, not a format boundary,
and pyarrow's bundled real zstd cross-checks both directions in tests.

Decompression performance note: this is the boundary-closing
correctness path for `.zst` TEXT sidecars (the hot parquet-zstd path
is Spark/Arrow-native and unaffected). Per-file decode runs inside
executors via the `pyzst` DataSource (see sources/zstdsource.py), so
throughput scales with files × cores exactly like every
container-format source.
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_LO = 0x184D2A50
SKIPPABLE_HI = 0x184D2A5F


# ---------------------------------------------------------------------------
# xxHash64 (public algorithm; content-checksum = low 32 bits of XXH64(data))
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for _ in range(1):
                a, b, c, d = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + a * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + b * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + c * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + d * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# bitstreams
# ---------------------------------------------------------------------------


class _FwdBits:
    """Forward LSB-first bit reader (FSE table descriptions)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        out = 0
        for k in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("zstd: FSE description overruns its buffer")
            out |= ((self.data[byte] >> (self.pos & 7)) & 1) << k
            self.pos += 1
        return out

    def peek(self, n: int) -> int:
        save = self.pos
        try:
            return self.read(n)
        finally:
            self.pos = save

    @property
    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


class _BackBits:
    """Backward bit reader (Huffman / FSE payload bitstreams): the
    LAST byte carries a 1-bit end marker in its highest set bit;
    reading proceeds from just below that marker toward byte 0. Reads
    past the start return zero bits and raise the ``overflowed``
    flag — the FSE weight flush rule needs exactly that behavior."""

    def __init__(self, data: bytes):
        if not data:
            raise ValueError("zstd: empty bitstream")
        last = data[-1]
        if last == 0:
            raise ValueError("zstd: bitstream end marker missing")
        marker = last.bit_length() - 1
        self.data = data
        self.bits = (len(data) - 1) * 8 + marker  # readable bits
        self.overflowed = False

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if n > self.bits:
            self.overflowed = True
            got = self.bits
            lo_pad = n - got
            val = self._take(got) if got else 0
            self.bits = 0
            return val << lo_pad  # zero-pad the missing LOW bits
        return self._take(n)

    def peek(self, n: int) -> int:
        """Next ``n`` bits without consuming; zero-padded LOW bits when
        fewer remain (the Huffman table lookup window near the end)."""
        got = min(n, self.bits)
        start = self.bits - got
        out = 0
        for k in range(got):
            p = start + k
            out |= ((self.data[p >> 3] >> (p & 7)) & 1) << k
        return out << (n - got)

    def skip(self, n: int) -> None:
        if n > self.bits:
            raise ValueError("zstd: bitstream overrun")
        self.bits -= n

    def _take(self, n: int) -> int:
        self.bits -= n
        start = self.bits
        out = 0
        for k in range(n):
            p = start + k
            out |= ((self.data[p >> 3] >> (p & 7)) & 1) << k
        return out


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------


def _fse_read_description(data: bytes, max_log: int):
    """(probs, accuracy_log, bytes_consumed) from a forward bitstream
    (RFC 8878 §4.1.1)."""
    br = _FwdBits(data)
    accuracy_log = 5 + br.read(4)
    if accuracy_log > max_log:
        raise ValueError(f"zstd: accuracy log {accuracy_log} > {max_log}")
    remaining = (1 << accuracy_log) + 1
    threshold = 1 << accuracy_log
    nbits = accuracy_log + 1
    probs: list[int] = []
    while remaining > 1:
        # FSE_readNCount: values in [0, remaining] with the small-value
        # trick — ``max_small`` low values use one bit less
        max_small = (threshold << 1) - 1 - remaining
        low = br.peek(nbits)
        if (low & (threshold - 1)) < max_small:
            br.read(nbits - 1)
            value = low & (threshold - 1)
        else:
            value = br.read(nbits)
            if value >= threshold:
                value -= max_small
        prob = value - 1
        probs.append(prob)
        remaining -= -prob if prob < 0 else prob
        if prob == 0:
            while True:
                rep = br.read(2)
                probs.extend([0] * rep)
                if rep < 3:
                    break
        if len(probs) > 256:
            raise ValueError("zstd: FSE description too long")
        while remaining < threshold and remaining > 1:
            nbits -= 1
            threshold >>= 1
    return probs, accuracy_log, br.bytes_consumed


def _fse_build_decode_table(probs: list[int], accuracy_log: int):
    """[(symbol, nbits, base_state)] per state (RFC 8878 §4.1.1)."""
    size = 1 << accuracy_log
    symbols = [0] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(probs):
        for _ in range(max(p, 0)):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE table spread did not complete")
    counter = [max(p, 0) if p != -1 else 1 for p in probs]
    table = []
    for state in range(size):
        s = symbols[state]
        nxt = counter[s]
        counter[s] += 1
        nbits = accuracy_log - (nxt.bit_length() - 1)
        base = (nxt << nbits) - size
        table.append((s, nbits, base))
    return table


class _FseState:
    __slots__ = ("table", "state")

    def __init__(self, table, br: _BackBits, accuracy_log: int):
        self.table = table
        self.state = br.read(accuracy_log)

    @property
    def symbol(self) -> int:
        return self.table[self.state][0]

    def update(self, br: _BackBits) -> None:
        _s, nbits, base = self.table[self.state]
        self.state = base + br.read(nbits)


def _fse_decode_interleaved(table, accuracy_log: int, data: bytes,
                            limit: int = 255) -> list[int]:
    """Two alternating FSE states over a backward bitstream (the
    Huffman-weight stream, RFC 8878 §4.2.1.3): stop when a state
    update overruns the stream — the final symbol comes from the
    OTHER state."""
    br = _BackBits(data)
    s1 = _FseState(table, br, accuracy_log)
    s2 = _FseState(table, br, accuracy_log)
    out: list[int] = []
    while len(out) <= limit:
        out.append(s1.symbol)
        s1.update(br)
        if br.overflowed:
            out.append(s2.symbol)
            return out
        s1, s2 = s2, s1
    raise ValueError("zstd: runaway FSE weight stream")


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


class _HufTable:
    """Canonical Huffman decode table (RFC 8878 §4.2.1): weight w>0 →
    code length max_bits+1-w; ranges assigned low-weight-first in
    symbol order; table lookup peeks max_bits and consumes nbits."""

    def __init__(self, weights: list[int]):
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ValueError("zstd: empty Huffman weights")
        # the LAST symbol's weight is implicit: it completes ``total``
        # to the next power of two (RFC 8878 §4.2.1) — so max_bits is
        # bit_length(total) and the completion must itself be a power
        # of two (2^(last_weight-1))
        max_bits = total.bit_length()
        left = (1 << max_bits) - total
        if left <= 0 or (left & (left - 1)):
            raise ValueError("zstd: non-completable Huffman weights")
        last_w = left.bit_length()  # 2^(last_w-1) == left
        weights = weights + [last_w]
        if max_bits > 11:
            raise ValueError("zstd: Huffman depth > 11")
        self.max_bits = max_bits
        order = sorted(
            (w, s) for s, w in enumerate(weights) if w > 0
        )
        self.table: list[tuple[int, int]] = [(-1, 0)] * (1 << max_bits)
        pos = 0
        for w, s in order:
            nbits = max_bits + 1 - w
            span = 1 << (max_bits - nbits)
            for k in range(span):
                self.table[pos + k] = (s, nbits)
            pos += span
        if pos != 1 << max_bits:
            raise ValueError("zstd: Huffman table incomplete")

    def decode_stream(self, data: bytes, n_out: int) -> bytearray:
        br = _BackBits(data)
        out = bytearray()
        mb = self.max_bits
        table = self.table
        while len(out) < n_out:
            sym, nbits = table[br.peek(mb)]
            if sym < 0:
                raise ValueError("zstd: invalid Huffman code")
            br.skip(nbits)  # raises on overrun
            out.append(sym)
        return out


def _read_huffman(data: bytes):
    """(HufTable, bytes_consumed) from a Huffman_Tree_Description."""
    hbyte = data[0]
    if hbyte >= 128:  # direct: 4-bit weights
        n = hbyte - 127
        nbytes = (n + 1) // 2
        weights = []
        for i in range(n):
            b = data[1 + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        return _HufTable(weights), 1 + nbytes
    # FSE-compressed weights
    comp = data[1 : 1 + hbyte]
    probs, al, used = _fse_read_description(comp, 6)
    table = _fse_build_decode_table(probs, al)
    weights = _fse_decode_interleaved(table, al, comp[used:])
    return _HufTable(weights), 1 + hbyte


# ---------------------------------------------------------------------------
# sequences: predefined code tables (RFC 8878 §3.1.1.3.2.1.1)
# ---------------------------------------------------------------------------

_LL_BASELINE = (
    list(range(16))
    + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
       2048, 4096, 8192, 16384, 32768, 65536]
)
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12,
                       13, 14, 15, 16]
_ML_BASELINE = (
    [m + 3 for m in range(32)]
    + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
       2051, 4099, 8195, 16387, 32771, 65539]
)
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11,
                       12, 13, 14, 15, 16]

_LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
               2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
_OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, -1, -1, -1, -1, -1]
_ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1]
_LL_DEFAULT_LOG, _OF_DEFAULT_LOG, _ML_DEFAULT_LOG = 6, 5, 6
_MAX_LOG = {"ll": 9, "of": 8, "ml": 9}


def _seq_table(mode: int, data: bytes, pos: int, kind: str, prev):
    """Resolve one of LL/OF/ML per its compression mode; returns
    ((table, accuracy_log) | ('rle', byte), new_pos)."""
    if mode == 0:  # predefined
        probs, log = {
            "ll": (_LL_DEFAULT, _LL_DEFAULT_LOG),
            "of": (_OF_DEFAULT, _OF_DEFAULT_LOG),
            "ml": (_ML_DEFAULT, _ML_DEFAULT_LOG),
        }[kind]
        return (_fse_build_decode_table(probs, log), log), pos
    if mode == 1:  # RLE
        return ("rle", data[pos]), pos + 1
    if mode == 2:  # FSE-compressed
        probs, log, used = _fse_read_description(
            data[pos:], _MAX_LOG[kind]
        )
        return (_fse_build_decode_table(probs, log), log), pos + used
    if prev is None:
        raise ValueError(f"zstd: repeat {kind} table with no prior table")
    return prev, pos


class _SeqDecoder:
    """One of the three interleaved sequence code streams."""

    def __init__(self, spec, br: _BackBits):
        if spec[0] == "rle":
            self.rle = spec[1]
            self.fse = None
        else:
            self.rle = None
            self.fse = _FseState(spec[0], br, spec[1])

    @property
    def code(self) -> int:
        return self.rle if self.fse is None else self.fse.symbol

    def update(self, br: _BackBits) -> None:
        if self.fse is not None:
            self.fse.update(br)


# ---------------------------------------------------------------------------
# block / frame decoding
# ---------------------------------------------------------------------------


class _FrameCtx:
    """Per-frame mutable decoder state (table reuse across blocks)."""

    def __init__(self):
        self.huffman: _HufTable | None = None
        self.ll = self.of = self.ml = None
        self.rep = [1, 4, 8]


def _decode_literals(data: bytes, pos: int, ctx: _FrameCtx):
    """(literals, new_pos) for one compressed block."""
    b0 = data[pos]
    ltype = b0 & 0x03
    sformat = (b0 >> 2) & 0x03
    if ltype in (0, 1):  # Raw / RLE
        if sformat in (0, 2):
            rs = b0 >> 3
            pos += 1
        elif sformat == 1:
            rs = (b0 >> 4) | (data[pos + 1] << 4)
            pos += 2
        else:
            rs = (b0 >> 4) | (data[pos + 1] << 4) | (data[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            lits = bytes(data[pos : pos + rs])
            if len(lits) != rs:
                raise ValueError("zstd: raw literals truncated")
            return lits, pos + rs
        return bytes([data[pos]]) * rs, pos + 1
    # Compressed (2) / Treeless (3)
    if sformat == 0:
        rs = (b0 >> 4) | ((data[pos + 1] & 0x3F) << 4)
        cs = (data[pos + 1] >> 6) | (data[pos + 2] << 2)
        streams, pos = 1, pos + 3
    elif sformat == 1:
        rs = (b0 >> 4) | ((data[pos + 1] & 0x3F) << 4)
        cs = (data[pos + 1] >> 6) | (data[pos + 2] << 2)
        streams, pos = 4, pos + 3
    elif sformat == 2:
        rs = (b0 >> 4) | (data[pos + 1] << 4) | ((data[pos + 2] & 0x03) << 12)
        cs = (data[pos + 2] >> 2) | (data[pos + 3] << 6)
        streams, pos = 4, pos + 4
    else:
        rs = (b0 >> 4) | (data[pos + 1] << 4) | ((data[pos + 2] & 0x3F) << 12)
        cs = (data[pos + 2] >> 6) | (data[pos + 3] << 2) | (data[pos + 4] << 10)
        streams, pos = 4, pos + 5
    payload = bytes(data[pos : pos + cs])
    if len(payload) != cs:
        raise ValueError("zstd: compressed literals truncated")
    pos += cs
    off = 0
    if ltype == 2:
        ctx.huffman, off = _read_huffman(payload)
    elif ctx.huffman is None:
        raise ValueError("zstd: treeless literals with no prior table")
    huf = ctx.huffman
    body = payload[off:]
    if streams == 1:
        return bytes(huf.decode_stream(body, rs)), pos
    if len(body) < 6:
        raise ValueError("zstd: 4-stream jump table truncated")
    s1, s2, s3 = struct.unpack_from("<HHH", body, 0)
    chunks = []
    cuts = [6, 6 + s1, 6 + s1 + s2, 6 + s1 + s2 + s3, len(body)]
    per = (rs + 3) // 4
    sizes = [per, per, per, rs - 3 * per]
    if sizes[3] < 0:
        raise ValueError("zstd: bad 4-stream regenerated size")
    for k in range(4):
        part = body[cuts[k] : cuts[k + 1]]
        chunks.append(huf.decode_stream(part, sizes[k]))
    return bytes(b"".join(bytes(c) for c in chunks)), pos


def _decode_block(data: bytes, out: bytearray, ctx: _FrameCtx) -> None:
    lits, pos = _decode_literals(data, 0, ctx)
    # sequence count
    b0 = data[pos]
    if b0 < 128:
        nseq, pos = b0, pos + 1
    elif b0 < 255:
        nseq, pos = ((b0 - 128) << 8) + data[pos + 1], pos + 2
    else:
        nseq = data[pos + 1] + (data[pos + 2] << 8) + 0x7F00
        pos += 3
    if nseq == 0:
        out += lits
        return
    modes = data[pos]
    pos += 1
    if modes & 0x03:
        raise ValueError("zstd: reserved sequence-mode bits set")
    ll_spec, pos = _seq_table((modes >> 6) & 3, data, pos, "ll", ctx.ll)
    of_spec, pos = _seq_table((modes >> 4) & 3, data, pos, "of", ctx.of)
    ml_spec, pos = _seq_table((modes >> 2) & 3, data, pos, "ml", ctx.ml)
    ctx.ll, ctx.of, ctx.ml = ll_spec, of_spec, ml_spec
    br = _BackBits(data[pos:])
    ll = _SeqDecoder(ll_spec, br)
    of = _SeqDecoder(of_spec, br)
    ml = _SeqDecoder(ml_spec, br)
    lit_pos = 0
    rep = ctx.rep
    for i in range(nseq):
        of_code = of.code
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        offset_value = (1 << of_code) + br.read(of_code)
        match_len = _ML_BASELINE[ml.code] + br.read(_ML_BITS[ml.code])
        lit_len = _LL_BASELINE[ll.code] + br.read(_LL_BITS[ll.code])
        if br.overflowed:
            raise ValueError("zstd: sequence bitstream overrun")
        # resolve offset against the repeat history
        if offset_value > 3:
            offset = offset_value - 3
            rep[2], rep[1], rep[0] = rep[1], rep[0], offset
        else:
            ov = offset_value + (1 if lit_len == 0 else 0)
            if ov == 1:
                offset = rep[0]
            elif ov == 2:
                offset = rep[1]
                rep[1], rep[0] = rep[0], offset
            elif ov == 3:
                offset = rep[2]
                rep[2], rep[1], rep[0] = rep[1], rep[0], offset
            else:  # ov == 4: Repeated_Offset1 - 1
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: zero repeat offset")
                rep[2], rep[1], rep[0] = rep[1], rep[0], offset
        out += lits[lit_pos : lit_pos + lit_len]
        lit_pos += lit_len
        if offset > len(out):
            raise ValueError("zstd: match offset beyond output start")
        start = len(out) - offset
        if offset >= match_len:
            out += out[start : start + match_len]
        else:  # overlapping copy: byte-at-a-time semantics
            for k in range(match_len):
                out.append(out[start + k])
        if i + 1 < nseq:
            ll.update(br)
            ml.update(br)
            of.update(br)
            if br.overflowed:
                raise ValueError("zstd: sequence state underflow")
    out += lits[lit_pos:]


def zstd_decompress(payload: bytes) -> bytes:
    """Decompress a (possibly multi-frame) Zstandard payload. Content
    checksums, when present, are VERIFIED (xxh64 low 32 bits).
    Dictionary frames are out of scope (raises)."""
    out = bytearray()
    pos = 0
    n = len(payload)
    while pos < n:
        (magic,) = struct.unpack_from("<I", payload, pos)
        if SKIPPABLE_LO <= magic <= SKIPPABLE_HI:
            (sz,) = struct.unpack_from("<I", payload, pos + 4)
            pos += 8 + sz
            continue
        if magic != ZSTD_MAGIC:
            raise ValueError(f"zstd: bad magic 0x{magic:08x}")
        pos += 4
        fhd = payload[pos]
        pos += 1
        single_segment = (fhd >> 5) & 1
        checksum_flag = (fhd >> 2) & 1
        did_size = (0, 1, 2, 4)[fhd & 3]
        fcs_flag = fhd >> 6
        if fhd & 0x08:
            raise ValueError("zstd: reserved frame-header bit set")
        if not single_segment:
            pos += 1  # window descriptor (we keep everything in memory)
        if did_size:
            raise ValueError("zstd: dictionary frames not supported")
        fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
        content_size = None
        if fcs_size:
            content_size = int.from_bytes(
                payload[pos : pos + fcs_size], "little"
            )
            if fcs_size == 2:
                content_size += 256
            pos += fcs_size
        frame_start = len(out)
        ctx = _FrameCtx()
        while True:
            hdr = int.from_bytes(payload[pos : pos + 3], "little")
            pos += 3
            last = hdr & 1
            btype = (hdr >> 1) & 3
            bsize = hdr >> 3
            if btype == 0:  # raw
                out += payload[pos : pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE
                out += payload[pos : pos + 1] * bsize
                pos += 1
            elif btype == 2:
                _decode_block(payload[pos : pos + bsize], out, ctx)
                pos += bsize
            else:
                raise ValueError("zstd: reserved block type")
            if last:
                break
        frame_out = bytes(out[frame_start:])
        if content_size is not None and len(frame_out) != content_size:
            raise ValueError(
                f"zstd: content size mismatch "
                f"({len(frame_out)} != {content_size})"
            )
        if checksum_flag:
            (want,) = struct.unpack_from("<I", payload, pos)
            pos += 4
            got = xxh64(frame_out) & 0xFFFFFFFF
            if got != want:
                raise ValueError("zstd: content checksum mismatch")
    return bytes(out)


# ---------------------------------------------------------------------------
# store-mode writer (spec-legal frames of raw blocks)
# ---------------------------------------------------------------------------


def zstd_compress_store(data: bytes, checksum: bool = True) -> bytes:
    """A valid single-frame Zstandard payload using RAW blocks only
    (plus the content size and an xxh64 checksum) — the format's
    store mode. Every conformant zstd implementation reads it; the
    entropy-coded ENCODER is deliberately out of scope (format
    boundary closed by the decoder; real compression in this
    container comes from pyarrow's bundled zstd where available)."""
    out = bytearray()
    out += struct.pack("<I", ZSTD_MAGIC)
    fhd = (3 << 6) | (1 << 5) | ((1 if checksum else 0) << 2)
    out.append(fhd)
    out += struct.pack("<Q", len(data))
    max_block = 128 * 1024
    if not data:
        out += (1).to_bytes(3, "little")  # empty raw last-block
    for i in range(0, len(data), max_block):
        chunk = data[i : i + max_block]
        last = 1 if i + max_block >= len(data) else 0
        out += ((len(chunk) << 3) | last).to_bytes(3, "little")
        out += chunk
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)
