"""Pure-Python baseline TIFF codec (TIFF 6.0) — round 11.

Continues the still-image series (PNG/BMP/JPEG/WebP-lossless/GIF):
TIFF is the remaining ubiquitous LOSSLESS corpus format, and its
baseline profile is IFD walking + three byte-exact compressions — no
native library needed. Implemented from the public TIFF 6.0
specification:

- header: ``II`` (little) / ``MM`` (big) endian, magic 42, IFD chain;
- IFD entries: BYTE/ASCII/SHORT/LONG/RATIONAL types, inline-vs-offset
  values by size, multi-IFD files (first image decoded, count
  reported);
- tags: ImageWidth/Length, BitsPerSample, Compression (1 = none,
  5 = LZW, 32773 = PackBits), PhotometricInterpretation (gray with
  both WhiteIsZero and BlackIsZero polarity, RGB, palette),
  StripOffsets/StripByteCounts/RowsPerStrip, SamplesPerPixel,
  Predictor (1 = none, 2 = horizontal differencing), ColorMap
  (16-bit per channel, expanded by >>8);
- TIFF-variant LZW: MSB-first codes, Clear = 256 / EOI = 257, 9→12
  bit widths with the spec's EARLY-CHANGE rule (width bumps at
  2^n - 1, one code earlier than GIF's LSB variant), table reset at
  4094 per the spec's "write Clear when the table fills" guidance;
- PackBits: the classic Apple RLE (n ≥ 0: literal run of n+1;
  -127 ≤ n < 0: repeat next byte 1-n times; -128: no-op).

The encoder writes all three compressions (+ optional horizontal
predictor, gray/RGB/palette photometrics, configurable RowsPerStrip)
so every decoder path is round-trip-exercised; hand-built streams pin
the decoder-only paths (big-endian files, WhiteIsZero inversion,
PackBits no-op bytes, early-change boundaries). 8-bit samples only —
baseline TIFF; 16-bit/float/tiled/JPEG-in-TIFF raise the honest
``NotImplementedError``.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# ---------------------------------------------------------------------------
# TIFF-variant LZW (MSB-first, early change)
# ---------------------------------------------------------------------------

_CLEAR, _EOI = 256, 257


def tiff_lzw_decode(data: bytes, expected: int) -> bytearray:
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        next_code = 258

    width = 9
    next_code = 258
    reset()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("tiff: LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _CLEAR:
            reset()
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("tiff: first LZW code after clear not literal")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError("tiff: LZW code out of range")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            next_code += 1
        # EARLY CHANGE: width grows when the NEXT code would not fit
        # counting the one about to be added (spec: at 510/1022/2046)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError("tiff: LZW output short")
    return out


def tiff_lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_CLEAR)
    w = b""
    for b in data:
        k = w + bytes([b])
        if k in table:
            w = k
            continue
        emit(table[w])
        table[k] = next_code
        next_code += 1
        # the decoder's table lags one entry behind (it adds the entry
        # for code N while processing code N+1), so the encoder bumps
        # ONE ENTRY LATER than the decoder's early-change point for
        # the transmitted widths to line up
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # spec: emit Clear as the table fills
            emit(_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w])
    emit(_EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# PackBits
# ---------------------------------------------------------------------------


def packbits_decode(data: bytes, expected: int) -> bytearray:
    out = bytearray()
    pos = 0
    n = len(data)
    while len(out) < expected and pos < n:
        h = data[pos]
        pos += 1
        if h == 128:
            continue  # no-op
        if h < 128:
            out += data[pos : pos + h + 1]
            pos += h + 1
        else:
            out += data[pos : pos + 1] * (257 - h)
            pos += 1
    if len(out) < expected:
        raise ValueError("tiff: PackBits output short")
    return out


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i = j
            continue
        # literal run until the next >=3 repeat (2-runs inside
        # literals are cheaper left literal)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def sniff_tiff(payload: bytes) -> str | None:
    if len(payload) < 8:
        return None
    if payload[:4] == b"II*\x00":
        return "little"
    if payload[:4] == b"MM\x00*":
        return "big"
    return None


def _read_ifd(payload: bytes, off: int, e: str):
    (n,) = struct.unpack_from(e + "H", payload, off)
    tags = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(e + "HHI", payload, base)
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            raw = payload[base + 8 : base + 8 + size]
        else:
            (voff,) = struct.unpack_from(e + "I", payload, base + 8)
            raw = payload[voff : voff + size]
        if typ == 3:
            vals = list(struct.unpack(e + "H" * count, raw))
        elif typ == 4:
            vals = list(struct.unpack(e + "I" * count, raw))
        elif typ == 1:
            vals = list(raw)
        elif typ == 5:
            vals = [
                struct.unpack_from(e + "II", raw, 8 * k) for k in range(count)
            ]
        else:
            vals = [raw]
        tags[tag] = vals
    (nxt,) = struct.unpack_from(e + "I", payload, off + 2 + 12 * n)
    return tags, nxt


def tiff_info(payload: bytes) -> dict:
    """Header/IFD metadata without decoding strips (the `image_info`
    tier): width, height, compression, photometric, samples,
    bits-per-sample, n_ifds."""
    order = sniff_tiff(payload)
    if order is None:
        raise ValueError("not a TIFF payload")
    e = "<" if order == "little" else ">"
    (off,) = struct.unpack_from(e + "I", payload, 4)
    tags, nxt = _read_ifd(payload, off, e)
    n_ifds = 1
    walk = nxt
    while walk:
        _t, walk = _read_ifd(payload, walk, e)
        n_ifds += 1
    return {
        "format": "tiff",
        "byte_order": order,
        "width": tags[256][0],
        "height": tags[257][0],
        "compression": tags.get(259, [1])[0],
        "photometric": tags.get(262, [1])[0],
        "samples_per_pixel": tags.get(277, [1])[0],
        "bits_per_sample": tags.get(258, [1])[0],
        "n_ifds": n_ifds,
    }


def decode_tiff(payload: bytes) -> np.ndarray:
    """First IFD to (H, W, C) uint8 (C = 1 gray, 3 RGB incl. palette
    expansion)."""
    order = sniff_tiff(payload)
    if order is None:
        raise ValueError("not a TIFF payload")
    e = "<" if order == "little" else ">"
    (off,) = struct.unpack_from(e + "I", payload, 4)
    tags, _nxt = _read_ifd(payload, off, e)
    w = tags[256][0]
    h = tags[257][0]
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [1] * spp)
    predictor = tags.get(317, [1])[0]
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"tiff: only 8-bit samples (got {bps})")
    if compression not in (1, 5, 32773):
        raise NotImplementedError(f"tiff: compression {compression}")
    offsets = tags[273]
    counts = tags.get(279)
    rows_per_strip = tags.get(278, [h])[0]
    row_bytes = w * spp
    raw = bytearray()
    for si, soff in enumerate(offsets):
        strip_rows = min(rows_per_strip, h - si * rows_per_strip)
        expected = strip_rows * row_bytes
        chunk = payload[
            soff : soff + (counts[si] if counts else len(payload) - soff)
        ]
        if compression == 1:
            strip = bytearray(chunk[:expected])
            if len(strip) < expected:
                raise ValueError("tiff: strip short")
        elif compression == 5:
            strip = tiff_lzw_decode(chunk, expected)
        else:
            strip = packbits_decode(chunk, expected)
        if predictor == 2:
            arr = np.frombuffer(bytes(strip), dtype=np.uint8).reshape(
                strip_rows, w, spp
            )
            strip = np.cumsum(arr, axis=1, dtype=np.uint8).tobytes()
        raw += strip[:expected]
    img = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, spp)
    if photometric == 0:  # WhiteIsZero
        img = 255 - img
    elif photometric == 3:  # palette
        cmap = tags[320]
        ncolors = len(cmap) // 3
        pal = np.array(
            [
                [cmap[k] >> 8, cmap[ncolors + k] >> 8, cmap[2 * ncolors + k] >> 8]
                for k in range(ncolors)
            ],
            dtype=np.uint8,
        )
        img = pal[img[:, :, 0]]
    return np.ascontiguousarray(img)


def encode_tiff(
    img: np.ndarray,
    compression: int = 5,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    palette: bool = False,
) -> bytes:
    """Deterministic little-endian baseline TIFF writer (lossless by
    construction). ``palette=True`` writes PhotometricInterpretation 3
    with an exact ≤256-color map (gray input only becomes palette via
    its own values)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    if rows_per_strip is None:
        rows_per_strip = max(1, min(h, 8192 // max(1, w * spp)))
    photometric = 1 if spp == 1 else 2
    extra_entries = []
    body = img
    if palette:
        if spp != 1:
            flat = img.reshape(-1, spp)
            colors, inverse = np.unique(flat, axis=0, return_inverse=True)
            if len(colors) > 256:
                raise ValueError("tiff palette: more than 256 colors")
            body = inverse.astype(np.uint8).reshape(h, w, 1)
        else:
            colors = np.arange(256, dtype=np.uint8)[:, None].repeat(3, 1)
            body = img
        photometric = 3
        spp = 1
        cmap = np.zeros(3 * 256, dtype=np.uint16)
        for k, c in enumerate(colors):
            cmap[k] = int(c[0]) << 8
            cmap[256 + k] = int(c[1]) << 8
            cmap[512 + k] = int(c[2]) << 8
        extra_entries.append((320, 3, list(cmap)))
    strips = []
    for top in range(0, h, rows_per_strip):
        block = body[top : top + rows_per_strip]
        if predictor == 2:
            d = block.astype(np.int16)
            d[:, 1:] -= block[:, :-1].astype(np.int16)
            block = (d & 0xFF).astype(np.uint8)
        raw = block.tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(tiff_lzw_encode(raw))
        elif compression == 32773:
            strips.append(packbits_encode(raw))
        else:
            raise NotImplementedError(f"tiff: compression {compression}")
    entries = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [8] * spp),
        (259, 3, [compression]),
        (262, 3, [photometric]),
        (277, 3, [spp]),
        (278, 4, [rows_per_strip]),
        (279, 4, [len(s) for s in strips]),
        (317, 3, [predictor]),
    ] + extra_entries
    # layout: header(8) + IFD + value spill + strip data
    n_entries = len(entries) + 1  # + StripOffsets
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    spill = bytearray()
    spill_base = ifd_off + ifd_size

    def value_bytes(typ, vals):
        fmt = {3: "H", 4: "I", 1: "B"}[typ]
        return b"".join(struct.pack("<" + fmt, v) for v in vals)

    # strip data goes after the spill; compute spill for everything
    # including StripOffsets placeholder resolved in a second pass
    fixed = []
    for tag, typ, vals in entries:
        fixed.append([tag, typ, vals, None])
    data_off_entry = [273, 4, [0] * len(strips), None]
    all_entries = fixed + [data_off_entry]
    all_entries.sort(key=lambda x: x[0])
    # first pass: assign spill offsets
    for ent in all_entries:
        _tag, typ, vals, _ = ent
        vb = value_bytes(typ, vals)
        if len(vb) > 4:
            ent[3] = spill_base + len(spill)
            spill += vb
    data_base = spill_base + len(spill)
    # resolve strip offsets now that data_base is known
    cur = data_base
    offsets = []
    for s in strips:
        offsets.append(cur)
        cur += len(s)
    data_off_entry[2] = offsets
    vb = value_bytes(4, offsets)
    if len(vb) > 4 and data_off_entry[3] is not None:
        spill[
            data_off_entry[3] - spill_base : data_off_entry[3]
            - spill_base
            + len(vb)
        ] = vb
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n_entries)
    for tag, typ, vals, spill_off in all_entries:
        vb = value_bytes(typ, vals)
        out += struct.pack("<HHI", tag, typ, len(vals))
        if len(vb) <= 4:
            out += vb + b"\x00" * (4 - len(vb))
        else:
            out += struct.pack("<I", spill_off)
    out += struct.pack("<I", 0)  # no next IFD
    out += spill
    for s in strips:
        out += s
    return bytes(out)
