"""Pure-Python image codec (PNG decode, BMP decode/encode).

The container has no PIL/libjpeg, but PNG's format needs only stdlib
``zlib`` plus the per-scanline unfiltering pass, and uncompressed BMP
is plain byte layout — so these two formats get REAL decoders and the
multimodal operators (`operators/multimodal.py`) gain actual
capability for them; other formats (JPEG/WebP/audio/video) still raise
``NotImplementedError`` from the decode hook.

Scope (deliberately bounded to what the multimodal tier needs):
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
  6 (RGBA); no interlace. Filters 0-4 (None/Sub/Up/Average/Paeth)
  fully implemented.
- BMP: uncompressed 24-bit BI_RGB, bottom-up row order, and the
  matching encoder (used to emit real thumbnails).

Decoded form: ``numpy.ndarray`` of shape (H, W, C), dtype uint8 —
C in {1, 3, 4}.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
BMP_MAGIC = b"BM"


def _valid_bmp_header(payload: bytes) -> bool:
    """Full header validation, not just magic bytes: any document whose
    TEXT happens to start with 'BM' (>=54 bytes) would otherwise reach
    decode_bmp, which sizes its pixel buffer from payload-controlled
    width/height — a garbage header can demand a multi-GB allocation
    or walk past the buffer and fail the whole Spark job. Only a
    payload this function accepts is claimed as 'bmp'."""
    try:
        (data_off,) = struct.unpack("<I", payload[10:14])
        (hdr_size,) = struct.unpack("<I", payload[14:18])
        width, height = struct.unpack("<ii", payload[18:26])
        _planes, bpp = struct.unpack("<HH", payload[26:30])
        (compression,) = struct.unpack("<I", payload[30:34])
    except struct.error:
        return False
    if hdr_size < 40 or bpp != 24 or compression != 0:
        return False
    h = abs(height)
    if width <= 0 or h <= 0 or width > 1 << 15 or h > 1 << 15:
        return False
    row_bytes = (width * 3 + 3) & ~3
    return (
        14 + hdr_size <= data_off <= len(payload)
        and data_off + h * row_bytes <= len(payload)
    )


def sniff_format(payload: bytes) -> str | None:
    """'png' / 'bmp' / None — magic bytes, plus full header validation
    for BMP (the 2-byte 'BM' magic collides with ordinary text)."""
    if payload is None:
        return None
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:2] == BMP_MAGIC and len(payload) >= 54 and _valid_bmp_header(payload):
        return "bmp"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (H, W, C) uint8."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG variant not supported (depth={bit_depth}, "
            f"color={color_type}, interlace={interlace})"
        )
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    img = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        filt = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if filt == 0:  # None
            cur = line
        elif filt == 1:  # Sub — sequential along the line
            cur = line
            for x in range(nch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - nch])) & 0xFF
        elif filt == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif filt == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {filt}")
        img[y] = cur
        prev = img[y]
    out = img.reshape(height, width, nch)
    if color_type == 3:
        if palette is None:
            raise ValueError("paletted PNG without PLTE")
        out = palette[out[:, :, 0]]
    return out


def encode_png(img: np.ndarray) -> bytes:
    """Encode (H, W, C) uint8 (C in {1,3,4}) as a filter-0 PNG —
    deterministic (fixed zlib level), used by tests and thumbnail
    emission."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    comp = zlib.compress(raw, 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to (H, W, 3) uint8 (RGB)."""
    if payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variant not supported")
    width, height = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    flip = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    # defense in depth (sniff_format already validates): bound the
    # allocation and the pixel walk BEFORE np.zeros sizes a buffer
    # from payload-controlled dims
    if (
        width <= 0
        or height <= 0
        or width > 1 << 15
        or height > 1 << 15
        or data_off + height * row_bytes > len(payload)
    ):
        raise ValueError("BMP header dims/offsets inconsistent with payload size")
    img = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        off = data_off + y * row_bytes
        row = np.frombuffer(payload, dtype=np.uint8, count=width * 3, offset=off)
        tgt = height - 1 - y if flip else y
        img[tgt] = row.reshape(width, 3)[:, ::-1]  # BGR → RGB
    return img


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode uint8 pixels as bottom-up 24-bit BMP — deterministic
    byte-for-byte. Accepts (H, W), (H, W, 1), (H, W, 3), (H, W, 4)
    (gray replicated, alpha dropped)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    elif img.shape[2] == 4:
        img = np.ascontiguousarray(img[:, :, :3])
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    body = b"".join(
        img[y][:, ::-1].tobytes() + pad for y in range(h - 1, -1, -1)
    )
    data_off = 14 + 40
    file_size = data_off + len(body)
    header = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def decode_image(payload: bytes) -> np.ndarray:
    """Decode PNG or BMP; raises ``NotImplementedError`` for anything
    else — the honest boundary for formats needing native libs."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    raise NotImplementedError(
        "only PNG and BMP have pure-Python decoders in this container; "
        "JPEG/WebP/audio/video need PIL/librosa/ffmpeg"
    )


def luma(img: np.ndarray) -> np.ndarray:
    """Integer Rec.601-ish luminance (exact: (299R+587G+114B)//1000) —
    (H, W) uint8; gray/alpha channels handled."""
    if img.shape[2] == 1:
        return img[:, :, 0]
    r = img[:, :, 0].astype(np.int32)
    g = img[:, :, 1].astype(np.int32)
    b = img[:, :, 2].astype(np.int32)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample (floor index map)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]
