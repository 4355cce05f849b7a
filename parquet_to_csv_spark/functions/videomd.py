"""Pure-Python MP4 (ISO-BMFF) container METADATA parser — round 6,
E438.

The video boundary splits in two: FRAME DECODE needs native codecs
(H.264/VP9 — honestly out of scope in this container), but the
CONTAINER is just a box tree (size|type|payload, recursing under
``moov``/``trak``…), and a training-data pipeline's first video pass
is exactly container-level: duration, timescale, track count, brand —
the fields that drive sampling, deduplication and cost estimates
before a single frame is touched. This module implements that walk
for real:

- ``build_mp4``: a minimal spec-shaped writer (ftyp + free + moov
  [mvhd + N·trak]) used by the gate to synthesize deterministic
  clips;
- ``parse_mp4_meta``: a box walker (32-bit sizes, unknown boxes
  skipped by size, one recursion level per container box) extracting
  (major_brand, timescale, duration, n_tracks).

Frame decode remains ``NotImplementedError`` (SURVEY §2.7).
"""

from __future__ import annotations

import struct

_CONTAINER_BOXES = {b"moov", b"trak", b"mdia"}


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_mp4(
    timescale: int, duration: int, n_tracks: int, brand: bytes = b"isom"
) -> bytes:
    """Minimal ftyp + free + moov(mvhd + n·trak(tkhd)) byte stream."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0x200) + b"isomiso2")
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0, flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + b"\x00" * 78,  # volume/reserved/matrix/predefines/next_track
    )
    traks = b"".join(
        _box(b"trak", _box(b"tkhd", struct.pack(">B3x", 0) + b"\x00" * 80))
        for _ in range(n_tracks)
    )
    moov = _box(b"moov", mvhd + traks)
    free = _box(b"free", b"\x00" * 16)
    return ftyp + free + moov


def parse_mp4_meta(payload: bytes) -> dict:
    """Walk the box tree; return major_brand, timescale, duration,
    n_tracks. Raises ``NotImplementedError`` for non-MP4 payloads and
    for 64-bit (largesize) boxes."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise NotImplementedError("not an ISO-BMFF (MP4) stream")
    meta = {"major_brand": payload[8:12].decode("latin1"),
            "timescale": None, "duration": None, "n_tracks": 0}

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", buf[pos:pos + 4])
            btype = buf[pos + 4:pos + 8]
            if size == 1:
                raise NotImplementedError("64-bit largesize boxes")
            if size < 8:
                break
            if btype == b"mvhd":
                ver = buf[pos + 8]
                if ver != 0:
                    raise NotImplementedError("mvhd version 1 (64-bit times)")
                ts, dur = struct.unpack(">II", buf[pos + 20:pos + 28])
                meta["timescale"], meta["duration"] = ts, dur
            elif btype == b"trak":
                meta["n_tracks"] += 1
            if btype in _CONTAINER_BOXES and btype != b"trak":
                walk(buf, pos + 8, pos + size)
            pos += size

    walk(payload, 0, len(payload))
    if meta["timescale"] is None:
        raise NotImplementedError("MP4 stream without a moov/mvhd box")
    return meta


def decode_video_frames(payload: bytes):
    """Honest boundary: frame decode needs native codecs."""
    raise NotImplementedError(
        "video FRAME decode needs native codecs (H.264/VP9 via ffmpeg); "
        "container metadata is available via parse_mp4_meta"
    )
