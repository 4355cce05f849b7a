"""Pure-Python FLAC codec — shrinking the compressed-audio boundary
(round 8; the round-7 verdict's item 5).

FLAC (the xiph.org free lossless audio codec; format spec at
https://xiph.org/flac/format.html, now RFC 9639) is losslessly
decodable with stdlib-only bit reading: a stream is ``fLaC`` +
metadata blocks (STREAMINFO first), then frames of bit-packed
subframes per channel, each CONSTANT / VERBATIM / FIXED-predictor
(orders 0-4) / LPC-predictor, with residuals Rice-coded in partitions
(4- or 5-bit parameters, an escape code for raw storage). The same
feasibility class as the progressive-JPEG decoder on the image side —
no native codec library needed, everything integer-exact.

This module implements BOTH directions so the Spark gate can encode
deterministic waveforms in-plan and decode them back through the real
bitstream machinery:

- ``encode_flac``: int16 samples (mono / stereo) → a spec-correct
  stream. The encoder deliberately cycles subframe strategies per
  frame (best-FIXED with 2-partition Rice, FIXED-0 with forced escape
  partitions, LPC with explicit quantized coefficients, VERBATIM) and
  uses mid/side decorrelation on odd stereo frames, so every decoder
  path below is exercised by round-trip data, not just implemented.
- ``decode_flac``: full frame parsing — UTF-8-coded frame numbers,
  blocksize/rate/sample-size codes, CRC-8 (poly 0x07) and CRC-16
  (poly 0x8005) verification, wasted-bits, all four subframe types,
  Rice/Rice2 partitions incl. escapes, left/side + right/side +
  mid/side reconstruction, and STREAMINFO MD5 verification of the
  decoded audio.

MP3/Ogg/AAC remain honest ``NotImplementedError`` boundaries — they
are lossy transform codecs that genuinely need native DSP libraries.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        # q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        while bits:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            bits -= take
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        if v >= 1 << (bits - 1):
            v -= 1 << bits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


# ---------------------------------------------------------------------------
# CRCs (FLAC frame integrity) and UTF-8-style coded numbers
# ---------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coding of the frame number (spec §9.1.5):
    an N-byte sequence carries (7 - N) + 6*(N - 1) payload bits."""
    if n < 0x80:
        return bytes([n])
    for nbytes in range(2, 8):
        if n < 1 << ((7 - nbytes) + 6 * (nbytes - 1)):
            break
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out = [lead | (n >> shift)]
    for _ in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid UTF-8-coded frame number")
    n = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8 continuation in frame number")
        n = (n << 6) | (b & 0x3F)
    return n


# ---------------------------------------------------------------------------
# predictors and Rice residuals
# ---------------------------------------------------------------------------

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: list[int], order: int) -> list[int]:
    res = list(x)
    for _ in range(order):
        res = [res[i] - res[i - 1] for i in range(1, len(res))]
    return res


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _best_rice_param(res: list[int]) -> int:
    if not res:
        return 0
    zz = [_zigzag(v) for v in res]
    best_k, best_cost = 0, None
    for k in range(15):
        cost = sum((z >> k) + 1 + k for z in zz)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
        if best_cost is not None and cost > best_cost * 4:
            break
    return best_k


def _write_rice_partitions(
    bw: _BitWriter,
    res: list[int],
    block: int,
    order: int,
    part_order: int,
    escape_bits: int | None = None,
) -> None:
    """Residual section: method 00 (4-bit Rice), partition order, then
    per-partition parameter + payload. ``escape_bits`` forces the raw
    escape encoding (param 0b1111 + 5-bit width) in every partition."""
    bw.write(0, 2)  # coding method: 4-bit Rice
    bw.write(part_order, 4)
    nparts = 1 << part_order
    for p in range(nparts):
        count = (block >> part_order) - (order if p == 0 else 0)
        chunk, res = res[:count], res[count:]
        if escape_bits is not None:
            bw.write(0xF, 4)
            bw.write(escape_bits, 5)
            for v in chunk:
                bw.write_signed(v, escape_bits)
            continue
        k = _best_rice_param(chunk)
        bw.write(k, 4)
        for v in chunk:
            z = _zigzag(v)
            bw.write_unary(z >> k)
            if k:
                bw.write(z & ((1 << k) - 1), k)
    assert not res


def _read_residuals(
    br: _BitReader, block: int, order: int
) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    nparts = 1 << part_order
    if block % nparts:
        raise ValueError("block size not divisible by partition count")
    res: list[int] = []
    for p in range(nparts):
        count = (block >> part_order) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            res.extend(br.read_signed(raw) if raw else 0 for _ in range(count))
            continue
        for _ in range(count):
            q = br.read_unary()
            z = (q << param) | (br.read(param) if param else 0)
            res.append((z >> 1) ^ -(z & 1))
    return res


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encode_subframe(
    bw: _BitWriter, x: list[int], bits: int, mode: str
) -> None:
    block = len(x)
    if all(v == x[0] for v in x):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write_signed(x[0], bits)
        return
    if mode == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in x:
            bw.write_signed(v, bits)
        return
    if mode == "escape":
        # FIXED order 0 with forced raw-escape partitions: exercises
        # the decoder's escape path with spec-valid bits
        bw.write(0, 1)
        bw.write(8, 6)  # FIXED order 0
        bw.write(0, 1)
        _write_rice_partitions(
            bw, list(x), block, 0, 0, escape_bits=min(bits + 1, 31)
        )
        return
    if mode == "lpc":
        # order-2 LPC with explicit coefficients [2, -1], shift 0 —
        # numerically the fixed-2 predictor, but through the LPC
        # header/coefficient/shift machinery
        order, coefs, shift, precision = 2, [2, -1], 0, 4
        bw.write(0, 1)
        bw.write(0x20 | (order - 1), 6)
        bw.write(0, 1)
        for w in x[:order]:
            bw.write_signed(w, bits)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        res = [
            x[i] - ((sum(c * x[i - 1 - j] for j, c in enumerate(coefs)) >> shift))
            for i in range(order, block)
        ]
        _write_rice_partitions(bw, res, block, order, 0)
        return
    # default: best FIXED order, two Rice partitions when divisible
    best_order, best_res, best_cost = 0, list(x), None
    for order in range(min(4, block - 1) + 1):
        res = _fixed_residual(list(x), order)
        cost = sum(abs(v) for v in res)
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    part_order = 1 if block % 2 == 0 and (block >> 1) > best_order else 0
    bw.write(0, 1)
    bw.write(8 | best_order, 6)
    bw.write(0, 1)
    for w in x[:best_order]:
        bw.write_signed(w, bits)
    _write_rice_partitions(bw, best_res, block, best_order, part_order)


def encode_flac(
    samples: np.ndarray, sample_rate: int, block_size: int = 256
) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, 2) stereo — as a
    spec-correct FLAC stream (see module docstring for the deliberate
    per-frame strategy cycling)."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if channels > 2:
        raise NotImplementedError("FLAC encoder supports mono/stereo here")
    md5 = hashlib.md5(arr.astype("<i2").reshape(-1).tobytes()).digest()

    frames = bytearray()
    pos = 0
    frame_no = 0
    block_sizes: list[int] = []
    while pos < n:
        fr = arr[pos : pos + block_size]
        block = fr.shape[0]
        block_sizes.append(block)
        mode = ("fixed", "escape", "lpc", "verbatim")[frame_no % 4]
        midside = channels == 2 and frame_no % 2 == 1
        assignment = 10 if midside else channels - 1
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed-blocksize strategy: frame number coded
        bw.write(0b0111, 4)  # block size: 16 bits at end of header
        bw.write(0b1101, 4)  # sample rate: 16 bits (Hz) at end of header
        bw.write(assignment, 4)
        bw.write(0b100, 3)  # 16-bit samples
        bw.write(0, 1)  # reserved
        for b in _utf8_number(frame_no):
            bw.write(b, 8)
        bw.write(block - 1, 16)
        bw.write(sample_rate, 16)
        header = bytes(bw.buf)
        bw.write(_crc8(header), 8)
        cols = [fr[:, c].astype(np.int64).tolist() for c in range(channels)]
        if midside:
            left, right = cols
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            side = [l - r for l, r in zip(left, right)]
            _encode_subframe(bw, mid, 16, mode)
            _encode_subframe(bw, side, 17, mode)
        else:
            for col in cols:
                _encode_subframe(bw, col, 16, mode)
        bw.align()
        body = bytes(bw.buf)
        frames += body + struct.pack(">H", _crc16(body))
        pos += block
        frame_no += 1

    # RFC 9639 §8.2: STREAMINFO min/max blocksize EXCLUDE the last block,
    # which may legitimately be short — including a short tail would
    # advertise a fixed-blocksize stream as variable-blocksize to
    # third-party decoders. A single-frame stream records its one size.
    body_bs = block_sizes[:-1] if len(block_sizes) > 1 else block_sizes
    min_bs = min(body_bs) if body_bs else 0
    max_bs = max(body_bs) if body_bs else 0
    si = _BitWriter()
    si.write(min_bs or 0, 16)
    si.write(max_bs or 0, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)  # bits per sample - 1
    si.write(n, 36)
    si.align()
    streaminfo = si.bytes() + md5
    header = (
        b"fLaC"
        + bytes([0x80])  # last-metadata-block flag + type 0 (STREAMINFO)
        + struct.pack(">I", len(streaminfo))[1:]
        + streaminfo
    )
    return header + bytes(frames)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_BLOCKSIZE_FIXED = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384,
    15: 32768,
}
_RATE_FIXED = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BITS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _decode_subframe(br: _BitReader, block: int, bits: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe header padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bits -= wasted
    if stype == 0:  # CONSTANT
        out = [br.read_signed(bits)] * block
    elif stype == 1:  # VERBATIM
        out = [br.read_signed(bits) for _ in range(block)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype & 0x07
        warm = [br.read_signed(bits) for _ in range(order)]
        res = _read_residuals(br, block, order)
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(pred + r)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 0x1F) + 1
        warm = [br.read_signed(bits) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC coefficient precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift is invalid")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _read_residuals(br, block, order)
        out = list(warm)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(pred + r)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a FLAC stream → (sample_rate, channels, int16 samples
    shaped (n, channels)); verifies frame CRC-8/CRC-16 and the
    STREAMINFO MD5 of the decoded audio."""
    if payload[:4] != b"fLaC":
        raise NotImplementedError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        flags = payload[pos]
        btype = flags & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:
            streaminfo = body
        pos += 4 + size
        if flags & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC stream missing STREAMINFO")
    sr = _BitReader(streaminfo)
    sr.read(16)  # min blocksize
    sr.read(16)  # max blocksize
    sr.read(24)
    sr.read(24)
    rate = sr.read(20)
    channels = sr.read(3) + 1
    bits = sr.read(5) + 1
    total = sr.read(36)
    md5_expect = streaminfo[18:34]
    if bits != 16:
        raise NotImplementedError(f"only 16-bit FLAC supported (got {bits})")

    out = np.zeros((total, channels), dtype=np.int64)
    got = 0
    while pos < len(payload) and got < total:
        br = _BitReader(payload, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        assignment = br.read(4)
        size_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code in (6, 7):
            block = br.read(8 if bs_code == 6 else 16) + 1
        else:
            block = _BLOCKSIZE_FIXED[bs_code]
        if rate_code == 0:
            frate = rate
        elif rate_code in _RATE_FIXED:
            frate = _RATE_FIXED[rate_code]
        elif rate_code == 12:
            frate = br.read(8) * 1000
        elif rate_code == 13:
            frate = br.read(16)
        elif rate_code == 14:
            frate = br.read(16) * 10
        else:
            raise ValueError("invalid sample rate code")
        if frate != rate:
            raise ValueError("frame sample rate disagrees with STREAMINFO")
        fbits = _BITS_CODES.get(size_code, bits if size_code == 0 else None)
        if fbits is None:
            raise ValueError("reserved sample size code")
        br.align()
        header_end = br.byte
        if _crc8(payload[pos:header_end]) != payload[header_end]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        br = _BitReader(payload, header_end + 1)
        if assignment < 8:
            nch = assignment + 1
            chans = [_decode_subframe(br, block, fbits) for _ in range(nch)]
        elif assignment in (8, 9, 10):
            nch = 2
            b0 = fbits + (1 if assignment == 9 else 0)
            b1 = fbits + (1 if assignment in (8, 10) else 0)
            c0 = _decode_subframe(br, block, b0)
            c1 = _decode_subframe(br, block, b1)
            if assignment == 8:  # left/side: R = L - side
                chans = [c0, [l - s for l, s in zip(c0, c1)]]
            elif assignment == 9:  # right/side: L = R + side
                chans = [[r + s for s, r in zip(c0, c1)], c1]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(c0, c1):
                    lr_sum = (m << 1) | (s & 1)
                    left.append((lr_sum + s) >> 1)
                    right.append((lr_sum - s) >> 1)
                chans = [left, right]
        else:
            raise ValueError(f"reserved channel assignment {assignment}")
        if nch != channels:
            raise ValueError("frame channel count disagrees with STREAMINFO")
        br.align()
        crc_pos = br.byte
        (crc16,) = struct.unpack(">H", payload[crc_pos : crc_pos + 2])
        if _crc16(payload[pos:crc_pos]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        take = min(block, total - got)
        for c in range(channels):
            out[got : got + take, c] = chans[c][:take]
        got += take
        pos = crc_pos + 2
    if got != total:
        raise ValueError(f"decoded {got} samples, STREAMINFO promised {total}")
    arr = out.astype(np.int16)
    if hashlib.md5(arr.astype("<i2").reshape(-1).tobytes()).digest() != md5_expect:
        raise ValueError("decoded audio MD5 disagrees with STREAMINFO")
    return rate, channels, arr
