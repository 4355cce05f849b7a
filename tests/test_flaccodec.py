"""Round-8 FLAC codec: exact round trips across subframe strategies,
stereo decorrelation, multi-frame streams; integrity checks (CRC-8/16,
MD5, truncation) fail loudly; decode_audio dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_to_csv_spark.functions.audiocodec import decode_audio, sniff_audio
from parquet_to_csv_spark.functions.flaccodec import (
    _crc8,
    _read_utf8_number,
    _utf8_number,
    _BitReader,
    decode_flac,
    encode_flac,
)


def _square(n, amp, half):
    t = np.arange(n)
    return np.where((t // half) % 2 == 0, amp, -amp).astype(np.int16)


@pytest.mark.parametrize(
    "samples,rate",
    [
        (_square(1000, 700, 3), 9000),                       # mono square
        (np.full(500, 123, dtype=np.int16), 8000),           # constant
        (np.full(500, -32768, dtype=np.int16), 8000),        # int16 min
        (np.stack([_square(777, 450, 4), -_square(777, 450, 4)], axis=1), 44100),
        (((1103515245 * np.arange(1200) + 12345) % 65536 - 32768)
         .astype(np.int16), 8000),                           # LCG noise
        (_square(37, 90, 2), 8000),                          # shorter than block
        (np.array([5], dtype=np.int16), 8000),               # single sample
    ],
)
def test_flac_roundtrip_exact(samples, rate):
    payload = encode_flac(samples, rate, block_size=256)
    r, ch, dec = decode_flac(payload)
    want = samples if samples.ndim == 2 else samples[:, None]
    assert (r, ch) == (rate, want.shape[1])
    assert np.array_equal(dec, want)


def test_flac_multiframe_cycles_all_strategies():
    """>= 5 frames so the encoder's per-frame strategy cycle (fixed,
    escape, lpc, verbatim) plus mid/side on odd stereo frames are all
    actually present in the stream — pinned by scanning subframe types
    is overkill; the lossless round trip across the cycle IS the gate."""
    s = _square(256 * 5 + 100, 1200, 5)
    st = np.stack([s, -s], axis=1)
    payload = encode_flac(st, 22050, block_size=256)
    r, ch, dec = decode_flac(payload)
    assert np.array_equal(dec, st)


def test_flac_crc16_corruption_detected():
    payload = bytearray(encode_flac(_square(300, 500, 3), 8000))
    # flip a bit in the last frame's payload (well past the metadata)
    payload[-10] ^= 0x40
    with pytest.raises(ValueError, match="CRC|sync|truncated|MD5"):
        decode_flac(bytes(payload))


def test_flac_header_crc8_detected():
    payload = bytearray(encode_flac(_square(300, 500, 3), 8000))
    # find the first frame: metadata is 4 + 4 + 34 bytes for STREAMINFO
    frame0 = 4 + 4 + 34
    assert payload[frame0] == 0xFF  # sync
    payload[frame0 + 4] ^= 0x01  # corrupt a header byte (frame number)
    with pytest.raises(ValueError, match="CRC-8|frame number"):
        decode_flac(bytes(payload))


def test_flac_truncation_detected():
    payload = encode_flac(_square(1000, 500, 3), 8000)
    with pytest.raises(ValueError, match="truncated|promised|sync"):
        decode_flac(payload[: len(payload) - 30])


def test_flac_streaminfo_md5_detected():
    payload = bytearray(encode_flac(_square(300, 500, 3), 8000))
    payload[8 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(payload))


def test_utf8_frame_numbers_roundtrip():
    for n in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1):
        br = _BitReader(_utf8_number(n))
        assert _read_utf8_number(br) == n


def test_decode_audio_dispatches_flac_and_keeps_boundaries():
    s = _square(400, 250, 2)
    payload = encode_flac(s, 8000)
    assert sniff_audio(payload) == "flac"
    r, ch, dec = decode_audio(payload)
    assert r == 8000 and ch == 1 and np.array_equal(dec[:, 0], s)
    with pytest.raises(NotImplementedError, match="mp3|MP3|ffmpeg"):
        decode_audio(b"ID3\x04\x00" + b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        decode_audio(b"OggS" + b"\x00" * 64)


def test_crc8_known_vector():
    # CRC-8/ATM (poly 0x07, init 0): crc8("123456789") = 0xF4
    assert _crc8(b"123456789") == 0xF4


# --- property-based round trips (no reference decoder exists in this
# container, so exhaustive randomized round-trip exactness is the
# load-bearing verification of the bitstream machinery) --------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=1500),
    channels=st.sampled_from([1, 2]),
    block=st.sampled_from([64, 192, 256, 1000]),
    rate=st.sampled_from([8000, 44100, 65535]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    kind=st.sampled_from(["noise", "walk", "square", "mixed"]),
)
def test_flac_roundtrip_random(n, channels, block, rate, seed, kind):
    rng = np.random.default_rng(seed)
    if kind == "noise":
        s = rng.integers(-32768, 32768, size=(n, channels), dtype=np.int64)
    elif kind == "walk":
        s = np.cumsum(
            rng.integers(-300, 301, size=(n, channels), dtype=np.int64), axis=0
        )
        s = np.clip(s, -32768, 32767)
    elif kind == "square":
        t = np.arange(n)
        amp = int(rng.integers(1, 32768))
        half = int(rng.integers(1, 50))
        col = np.where((t // half) % 2 == 0, amp, -amp)
        s = np.stack([col] * channels, axis=1)
    else:  # mixed: constant prefix + noise suffix (CONSTANT + other types)
        cut = n // 2
        s = np.concatenate(
            [
                np.full((cut, channels), int(rng.integers(-100, 100))),
                rng.integers(-32768, 32768, size=(n - cut, channels)),
            ]
        )
    s = s.astype(np.int16)
    if channels == 1:
        s = s[:, 0]
    payload = encode_flac(s, rate, block_size=block)
    r, ch, dec = decode_flac(payload)
    want = s if s.ndim == 2 else s[:, None]
    assert (r, ch) == (rate, want.shape[1])
    assert np.array_equal(dec, want)


def test_flac_streaminfo_blocksize_excludes_short_tail():
    """RFC 9639 §8.2: min/max blocksize in STREAMINFO exclude the final
    (possibly short) frame, so a fixed-blocksize stream with a short
    tail still advertises min == max == block_size. Single-frame streams
    record their one (short) size."""
    import struct

    def _streaminfo_bs(payload: bytes) -> tuple[int, int]:
        # fLaC magic (4) + block header (4) -> STREAMINFO starts at 8
        mn, mx = struct.unpack(">HH", payload[8:12])
        return mn, mx

    tail = encode_flac(_square(256 * 3 + 50, 600, 4), 8000, block_size=256)
    assert _streaminfo_bs(tail) == (256, 256)

    exact = encode_flac(_square(256 * 2, 600, 4), 8000, block_size=256)
    assert _streaminfo_bs(exact) == (256, 256)

    single = encode_flac(_square(37, 90, 2), 8000, block_size=256)
    assert _streaminfo_bs(single) == (37, 37)
