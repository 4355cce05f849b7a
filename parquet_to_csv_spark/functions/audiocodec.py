"""Pure-Python WAV (RIFF PCM) audio codec — the audio half of the
multimodal tier (round 6, E429).

The round-5 boundary said "audio needs librosa/ffmpeg"; that is true
for COMPRESSED audio (MP3/Opus/AAC), but linear-PCM WAV is a plain
RIFF container and deserves a real decoder, same as PNG/BMP/JPEG got
on the image side. This module implements:

- ``encode_wav``: int16 PCM samples (mono or interleaved stereo) → a
  spec-correct RIFF/WAVE byte stream (fmt + data chunks);
- ``decode_wav``: a chunk-walking parser (handles unknown/padded
  ancillary chunks the way real encoders emit them) → (sample_rate,
  channels, int16 sample array).

Everything is integer-exact, so decoded features (sums, extrema, zero
crossings) are formula-predictable and DuckDB-oracle-checkable with no
tolerance. Compressed audio and video remain honest
``NotImplementedError`` boundaries (``decode_audio``).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, channels) — as a
    PCM RIFF/WAVE byte stream."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    payload = arr.reshape(-1).tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    if len(payload) % 2:
        body += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE byte stream → (sample_rate, channels, samples)
    with samples shaped (n, channels) int16. Only PCM (format 1) at 16
    bits is supported; ancillary chunks are skipped per the RIFF
    walk rules (word alignment included)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise NotImplementedError("WAVE stream missing fmt/data chunk")
    audio_format, channels, rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV is supported (format={audio_format}, "
            f"bits={bits}); compressed audio needs native codecs"
        )
    arr = np.frombuffer(data, dtype="<i2")
    n = len(arr) // channels
    return rate, channels, arr[: n * channels].reshape(n, channels)


def sniff_audio(payload: bytes) -> str | None:
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:3] == b"ID3" or payload[:2] in (b"\xff\xfb", b"\xff\xf3"):
        return "mp3"
    if payload[:4] == b"OggS":
        return "ogg"
    return None


def decode_audio(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode WAV (PCM) or FLAC (lossless, pure-Python bitstream
    decoder since round 8 — ``functions/flaccodec.py``); raise the
    honest boundary for lossy transform codecs (MP3/Ogg/AAC), which
    genuinely need native DSP libraries."""
    fmt = sniff_audio(payload)
    if fmt == "wav":
        return decode_wav(payload)
    if fmt == "flac":
        from parquet_to_csv_spark.functions.flaccodec import decode_flac

        return decode_flac(payload)
    raise NotImplementedError(
        f"only PCM WAV and FLAC have pure-Python decoders in this "
        f"container (got {fmt or 'unknown'}); MP3/Ogg/AAC need "
        "ffmpeg/librosa"
    )


def audio_info(payload: bytes) -> dict:
    """Container-level metadata for ANY sniffable audio payload —
    the curation-pipeline companion of :func:`decode_audio` (round
    11): WAV/FLAC report from their decoded headers (both decode for
    real), MP3/Ogg report through the frame/page walkers in
    ``functions/mediainfo.py`` WITHOUT decoding audio — exactly the
    duration/bitrate/codec layer a 100 TB corpus partitions on before
    any lossy DSP runs (which remains the documented boundary)."""
    fmt = sniff_audio(payload)
    if fmt == "wav":
        rate, channels, frames = decode_wav(payload)
        return {
            "format": "wav", "sample_rate": rate, "channels": channels,
            "duration_ms": len(frames) * 1000 // rate,
        }
    if fmt == "flac":
        from parquet_to_csv_spark.functions.flaccodec import decode_flac

        rate, channels, frames = decode_flac(payload)
        return {
            "format": "flac", "sample_rate": rate, "channels": channels,
            "duration_ms": len(frames) * 1000 // rate,
        }
    if fmt == "mp3":
        from parquet_to_csv_spark.functions.mediainfo import mp3_info

        return {"format": "mp3", **mp3_info(payload)}
    if fmt == "ogg":
        from parquet_to_csv_spark.functions.mediainfo import ogg_info

        return {"format": "ogg", **ogg_info(payload)}
    raise ValueError("unrecognized audio payload")
