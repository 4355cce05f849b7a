"""Pure-Python GIF codec (GIF87a/GIF89a) — round 11.

Continues the boundary-shrinking series (FLAC E523, WebP-lossless
E524, Avro E525): GIF is palette + LZW — integer-only, no native lib
needed — so the "image formats beyond PNG/BMP/JPEG/WebP-lossless"
boundary shrinks again. Implemented from the public GIF89a
specification (W3C/CompuServe, 1990):

- logical screen descriptor + global/local color tables (any size
  2..256, sort/resolution bits tolerated);
- LZW decompression: LSB-first variable-width codes (3..12 bits),
  clear / end-of-information codes, deferred clear handling, the
  first-code-after-clear rule and the KwKwK case;
- interlaced images (the 4-pass 8/8/4/2 row schedule);
- GIF89a extensions: Graphic Control (disposal methods 0-3,
  transparency index), application / comment / plain-text extensions
  skipped as sub-block chains;
- multi-frame animations: ``decode_gif_frames`` composites each frame
  per its predecessor's disposal method (none/keep, restore-background,
  restore-previous) over the logical screen;
- a deterministic encoder (``encode_gif``) writing GIF89a with an
  exact palette (raises on >256 distinct colors — lossless by
  construction), optional interlace, optional transparency index, and
  optional multi-frame output, so every decoder path is
  round-trip-exercised by tests.

Reference parity note: the reference repo (AlexC-ux/parquet-to-csv)
has no image handling at all — this extends the multimodal EXT
surface (SURVEY §2.5 E22/E309) the same way the other codecs do.
"""

from __future__ import annotations

import struct

import numpy as np

GIF87 = b"GIF87a"
GIF89 = b"GIF89a"


def sniff_gif(payload: bytes) -> dict | None:
    """Header metadata (width/height/version/n_frames-less) or None."""
    if payload is None or len(payload) < 13:
        return None
    if payload[:6] not in (GIF87, GIF89):
        return None
    w, h = struct.unpack_from("<HH", payload, 6)
    return {"format": "gif", "version": payload[3:6].decode(), "width": w,
            "height": h}


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first, variable 3..12-bit codes)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytearray:
    """Decode a GIF LZW stream into ``expected`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # dictionary: code -> bytes; rebuilt on CLEAR
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = eoi + 1
    width = min_code_size + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # truncated stream: spec-tolerant decoders stop here
                if len(out) < expected:
                    raise ValueError("GIF: LZW stream truncated")
                return out
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = dict(base)
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            if len(out) < expected:
                raise ValueError("GIF: EOI before all pixels decoded")
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("GIF: first code after clear not literal")
            out += entry
            prev = entry
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("GIF: LZW code out of range")
            out += entry
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
        if len(out) >= expected:
            return out


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF LZW encoder (emits CLEAR up front, resets at 4096 —
    the canonical deterministic strategy)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for idx in indices:
        k = w + bytes([idx])
        if k in table:
            w = k
            continue
        emit(table[w])
        if next_code < 4096:
            table[k] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([idx])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container walk
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("GIF: unterminated sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos : pos + n])
        pos += n


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    out = np.empty_like(idx)
    out[rows] = idx
    return out


def decode_gif_frames(payload: bytes):
    """All frames of a GIF, composited per disposal method, as a list
    of (H, W, 4) uint8 RGBA arrays over the logical screen (alpha 0
    only where no frame has painted yet / transparency persists)."""
    meta = sniff_gif(payload)
    if meta is None:
        raise ValueError("not a GIF payload")
    sw, sh = meta["width"], meta["height"]
    pos = 10
    packed = payload[pos]
    bg_index = payload[pos + 1]
    pos += 3
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        gct = gct.reshape(-1, 3).copy()
        pos += 3 * n

    screen = np.zeros((sh, sw, 4), dtype=np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gpacked = data[0]
                disposal = (gpacked >> 2) & 0x07
                transparent = data[3] if gpacked & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", payload, pos)
        ipacked = payload[pos + 8]
        pos += 9
        palette = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3).copy()
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF: image has no color table")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"GIF: bad LZW min code size {mcs}")
        data, pos = _read_subblocks(payload, pos)
        idx = np.frombuffer(
            bytes(_lzw_decode(data, mcs, w * h)), dtype=np.uint8
        )[: w * h].reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx, h)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("GIF: palette index out of range")
        # composite onto the screen
        before = screen.copy() if disposal == 3 else None
        rgba = np.empty((h, w, 4), dtype=np.uint8)
        rgba[:, :, :3] = palette[idx]
        rgba[:, :, 3] = 255
        region = screen[top : top + h, left : left + w]
        if transparent is not None:
            keep = idx == transparent
            rgba[keep] = region[keep]
        screen[top : top + h, left : left + w] = rgba
        frames.append(screen.copy())
        # disposal applies AFTER the frame is shown
        if disposal == 2:  # restore to background
            patch = screen[top : top + h, left : left + w]
            if gct is not None and transparent is None and bg_index < len(gct):
                patch[:, :, :3] = gct[bg_index]
                patch[:, :, 3] = 255
            else:
                patch[:] = 0
        elif disposal == 3 and before is not None:  # restore previous
            screen[:] = before
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF: no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame as (H, W, 3) uint8 (RGBA when it has transparent
    pixels) — the same contract as the other still-image decoders."""
    frame = decode_gif_frames(payload)[0]
    if bool((frame[:, :, 3] != 255).any()):
        return frame
    return np.ascontiguousarray(frame[:, :, :3])


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _palette_of(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    flat = img.reshape(-1, img.shape[2])[:, :3]
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"encode_gif is exact-palette (lossless): {len(colors)} > 256 "
            "distinct colors"
        )
    return colors.astype(np.uint8), inverse.astype(np.uint16)


def _color_table_bytes(palette: np.ndarray) -> tuple[bytes, int]:
    """Pad to the next power of two ≥ 2; returns (bytes, size_field)."""
    n = max(2, int(palette.shape[0]))
    size = 0
    while (2 << size) < n:
        size += 1
    padded = np.zeros((2 << size, 3), dtype=np.uint8)
    padded[: palette.shape[0]] = palette
    return padded.tobytes(), size


def _interlace_rows(h: int) -> list[int]:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def encode_gif(
    img: np.ndarray,
    interlace: bool = False,
    transparent_color: tuple[int, int, int] | None = None,
    frames: list[np.ndarray] | None = None,
    delay_cs: int = 4,
) -> bytes:
    """Deterministic GIF89a encoder. Single image by default; pass
    ``frames`` (list of (H, W, 3) arrays, all screen-sized, sharing
    one ≤256-color palette across ALL frames) for an animation.
    ``transparent_color`` marks that exact RGB as transparent via a
    Graphic Control Extension. Lossless by construction — decode
    returns the input exactly."""
    all_imgs = [img] + list(frames or [])
    for a in all_imgs:
        if a.ndim != 3 or a.shape[2] not in (3, 4):
            raise ValueError("expected (H, W, 3|4) uint8")
        if a.shape[:2] != all_imgs[0].shape[:2]:
            raise ValueError("all frames must be screen-sized")
    h, w = all_imgs[0].shape[:2]
    stacked = np.concatenate([a.reshape(-1, a.shape[2])[:, :3]
                              for a in all_imgs])
    palette, inverse = _palette_of(stacked.reshape(1, -1, 3))
    table_bytes, size_field = _color_table_bytes(palette)
    trans_idx = None
    if transparent_color is not None:
        want = np.array(transparent_color, dtype=np.uint8)
        hits = np.nonzero((palette == want).all(axis=1))[0]
        if len(hits) == 0:
            raise ValueError("transparent_color not present in the image")
        trans_idx = int(hits[0])

    out = bytearray()
    out += GIF89
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | size_field, 0, 0])  # GCT flag+size, bg=0, aspect=0
    out += table_bytes
    if frames:
        # NETSCAPE2.0 loop extension (loop forever) — the de-facto
        # public convention for animations
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    mcs = max(2, size_field + 1)
    per_frame = len(inverse) // len(all_imgs)
    for fi, frame in enumerate(all_imgs):
        if frames or trans_idx is not None:
            gpacked = 0x01 if trans_idx is not None else 0x00
            if frames:
                gpacked |= 0x04  # disposal: do not dispose
            out += b"\x21\xf9\x04"
            out += bytes([gpacked])
            out += struct.pack("<H", delay_cs if frames else 0)
            out += bytes([trans_idx or 0, 0])
        ipacked = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([ipacked])
        idx = inverse[fi * per_frame : (fi + 1) * per_frame].reshape(h, w)
        if interlace:
            idx = idx[_interlace_rows(h)]
        out.append(mcs)
        lzw = _lzw_encode(idx.astype(np.uint8).reshape(-1).tobytes(), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
