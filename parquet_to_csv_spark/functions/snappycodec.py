"""Pure-Python Snappy (raw format) codec.

Round 10 (continuation of E525): the Avro ``snappy`` codec was the one
remaining common Avro codec out of scope. Snappy's RAW format (public
spec: google/snappy format_description.txt) is byte-oriented LZ77 with
NO entropy coding — a preamble varint of the uncompressed length, then
a tag stream:

  tag & 3 == 0  literal; length-1 in the tag's upper 6 bits, with
                60..63 meaning 1..4 extra little-endian length bytes
  tag & 3 == 1  copy, 1-byte offset: len 4..11 in bits 2..4,
                offset = (tag>>5)<<8 | next byte   (11-bit offset)
  tag & 3 == 2  copy, 2-byte LE offset; len-1 in bits 2..7
  tag & 3 == 3  copy, 4-byte LE offset; len-1 in bits 2..7

Copies may overlap forward (offset < length) — byte-at-a-time
semantics, exactly like LZ77 in VP8L.

The encoder is deliberately simple and deterministic: a greedy
hash-of-4-bytes matcher emitting 2-byte-offset copies (the format
permits ANY valid tagging; all-literals is legal Snappy too), matching
the encode-half discipline of the FLAC/VP8L/Avro codecs. Avro's
snappy codec frames each block as ``snappy(data) + crc32(data)``
(4-byte big-endian CRC of the UNCOMPRESSED bytes) — handled in
``sources/avrocodec.py``.
"""

from __future__ import annotations


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def snappy_decompress(buf: bytes) -> bytes:
    n, pos = _read_varint(buf, 0)
    out = bytearray()
    while pos < len(buf):
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:
                extra = ln - 60
                ln = int.from_bytes(buf[pos : pos + extra], "little") + 1
                pos += extra
            out += buf[pos : pos + ln]
            pos += ln
        else:
            if kind == 1:
                ln = ((tag >> 2) & 0x7) + 4
                off = ((tag >> 5) << 8) | buf[pos]
                pos += 1
            elif kind == 2:
                ln = (tag >> 2) + 1
                off = int.from_bytes(buf[pos : pos + 2], "little")
                pos += 2
            else:
                ln = (tag >> 2) + 1
                off = int.from_bytes(buf[pos : pos + 4], "little")
                pos += 4
            if off == 0 or off > len(out):
                raise ValueError("snappy: copy offset out of range")
            for _ in range(ln):  # may overlap forward
                out.append(out[-off])
    if len(out) != n:
        raise ValueError(
            f"snappy: length mismatch (preamble {n}, decoded {len(out)})"
        )
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Greedy hash-match encoder: 4-byte-hash table, 2-byte-offset
    copies (offset ≤ 65535), literals for the rest. Deterministic."""
    out = bytearray(_write_varint(len(data)))

    def emit_literal(chunk: bytes) -> None:
        i = 0
        while i < len(chunk):
            piece = chunk[i : i + 65536]
            ln = len(piece)
            if ln <= 60:
                out.append(((ln - 1) << 2) | 0)
            else:
                nbytes = ((ln - 1).bit_length() + 7) // 8
                out.append(((59 + nbytes) << 2) | 0)
                out.extend((ln - 1).to_bytes(nbytes, "little"))
            out.extend(piece)
            i += ln

    n = len(data)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 65535 and data[j : j + 4] == key:
            if i > lit_start:
                emit_literal(data[lit_start:i])
            # extend the match
            ln = 4
            while i + ln < n and ln < 64 and data[j + ln] == data[i + ln]:
                ln += 1
            off = i - j
            out.append(((ln - 1) << 2) | 2)
            out.extend(off.to_bytes(2, "little"))
            i += ln
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        emit_literal(data[lit_start:])
    return bytes(out)
