"""Pure-Python LZ4 decoder (frame + block formats) — round 11.

Companion to ``functions/zstdcodec.py``: with zstd closed, LZ4 is the
other ubiquitous compressed-text sidecar format whose Hadoop codec
needs a native library. Both public formats (lz4.github.io frame and
block specs) are tiny:

- frame: magic 0x184D2204, FLG/BD descriptor (version 01, block
  independence, block checksums, content size, content checksum,
  dictionary id), header-checksum byte (xxh32(descriptor)>>8 & 0xFF,
  VERIFIED), data blocks (4-byte size, high bit = stored/uncompressed),
  optional per-block xxh32, EndMark, optional content xxh32
  (VERIFIED); skippable frames (0x184D2A50-5F); legacy frames are out
  of scope (pre-2015 format).
- block: token byte (literal-length nibble / match-length nibble),
  255-chained length extensions, 2-byte little-endian match offsets,
  overlap-tolerant copies, the no-match final sequence.

Linked blocks (independence flag 0) fall out naturally: the whole
frame decodes into one output buffer, so cross-block matches resolve
against it. The writer half is ``lz4_compress_store`` (stored-block
frames any LZ4 reads — same store-mode stance as the zstd writer);
real compression comes from pyarrow's bundled lz4 when available.
xxh32 is implemented below against the published test vectors.
"""

from __future__ import annotations

import struct

LZ4_MAGIC = 0x184D2204
SKIP_LO = 0x184D2A50
SKIP_HI = 0x184D2A5F

_Q1 = 2654435761
_Q2 = 2246822519
_Q3 = 3266489917
_Q4 = 668265263
_Q5 = 374761393
_M32 = (1 << 32) - 1


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _Q1 + _Q2) & _M32
        v2 = (seed + _Q2) & _M32
        v3 = seed & _M32
        v4 = (seed - _Q1) & _M32
        while i + 16 <= n:
            a, b, c, d = struct.unpack_from("<IIII", data, i)
            v1 = (_rotl32((v1 + a * _Q2) & _M32, 13) * _Q1) & _M32
            v2 = (_rotl32((v2 + b * _Q2) & _M32, 13) * _Q1) & _M32
            v3 = (_rotl32((v3 + c * _Q2) & _M32, 13) * _Q1) & _M32
            v4 = (_rotl32((v4 + d * _Q2) & _M32, 13) * _Q1) & _M32
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
             + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _Q5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl32((h + k * _Q3) & _M32, 17) * _Q4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _Q5) & _M32, 11) * _Q1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _Q2) & _M32
    h ^= h >> 13
    h = (h * _Q3) & _M32
    h ^= h >> 16
    return h


def lz4_block_decompress(data: bytes, out: bytearray | None = None) -> bytearray:
    """Decode one LZ4 BLOCK into/onto ``out`` (passed for linked
    blocks, where matches may reach into earlier blocks' output)."""
    if out is None:
        out = bytearray()
    pos = 0
    n = len(data)
    base = 0  # matches may reach the whole buffer (linked blocks)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        out += data[pos : pos + lit_len]
        if len(out) - base < 0 or pos + lit_len > n:
            raise ValueError("lz4: literal run overruns block")
        pos += lit_len
        if pos == n:
            return out  # final sequence carries no match
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = data[pos] | (data[pos + 1] << 8)
        pos += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset")
        match_len = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("lz4: match offset beyond output start")
        if offset >= match_len:
            out += out[start : start + match_len]
        else:
            for k in range(match_len):
                out.append(out[start + k])
    return out


def lz4_decompress(payload: bytes) -> bytes:
    """Decompress a (possibly multi-frame) LZ4 FRAME payload, verifying
    the header checksum and any block / content xxh32 checksums."""
    out = bytearray()
    pos = 0
    n = len(payload)
    while pos < n:
        (magic,) = struct.unpack_from("<I", payload, pos)
        if SKIP_LO <= magic <= SKIP_HI:
            (sz,) = struct.unpack_from("<I", payload, pos + 4)
            pos += 8 + sz
            continue
        if magic != LZ4_MAGIC:
            raise ValueError(f"lz4: bad magic 0x{magic:08x}")
        pos += 4
        desc_start = pos
        flg = payload[pos]
        bd = payload[pos + 1]
        pos += 2
        if flg >> 6 != 0b01:
            raise ValueError("lz4: unsupported frame version")
        block_checksum = (flg >> 4) & 1
        content_size_flag = (flg >> 3) & 1
        content_checksum = (flg >> 2) & 1
        if flg & 0x02:
            raise ValueError("lz4: reserved FLG bit set")
        if flg & 0x01:
            raise ValueError("lz4: dictionary frames not supported")
        if bd & 0x8F:
            raise ValueError("lz4: reserved BD bits set")
        content_size = None
        if content_size_flag:
            (content_size,) = struct.unpack_from("<Q", payload, pos)
            pos += 8
        hc = payload[pos]
        pos += 1
        want_hc = (xxh32(payload[desc_start:pos - 1]) >> 8) & 0xFF
        if hc != want_hc:
            raise ValueError("lz4: header checksum mismatch")
        frame_start = len(out)
        while True:
            (bsize,) = struct.unpack_from("<I", payload, pos)
            pos += 4
            if bsize == 0:
                break  # EndMark
            stored = bsize >> 31
            bsize &= 0x7FFFFFFF
            block = payload[pos : pos + bsize]
            if len(block) != bsize:
                raise ValueError("lz4: truncated block")
            pos += bsize
            if block_checksum:
                (want,) = struct.unpack_from("<I", payload, pos)
                pos += 4
                if xxh32(block) != want:
                    raise ValueError("lz4: block checksum mismatch")
            if stored:
                out += block
            else:
                lz4_block_decompress(block, out)
        frame_out = bytes(out[frame_start:])
        if content_size is not None and len(frame_out) != content_size:
            raise ValueError("lz4: content size mismatch")
        if content_checksum:
            (want,) = struct.unpack_from("<I", payload, pos)
            pos += 4
            if xxh32(frame_out) != want:
                raise ValueError("lz4: content checksum mismatch")
    return bytes(out)


def lz4_compress_store(data: bytes, block_size: int = 1 << 20) -> bytes:
    """A valid LZ4 frame of STORED blocks + content checksum (the
    format's store mode; every conformant LZ4 reads it)."""
    out = bytearray(struct.pack("<I", LZ4_MAGIC))
    flg = (0b01 << 6) | (1 << 5) | (1 << 3) | (1 << 2)  # indep+size+cksum
    bd = 7 << 4  # 4 MiB max block size bucket
    desc = bytes([flg, bd]) + struct.pack("<Q", len(data))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for i in range(0, len(data), block_size):
        chunk = data[i : i + block_size]
        out += struct.pack("<I", (1 << 31) | len(chunk))
        out += chunk
    out += struct.pack("<I", 0)  # EndMark
    out += struct.pack("<I", xxh32(data))
    return bytes(out)
