"""Round 11: MP3 / Ogg container-metadata walkers (functions/mediainfo.py).

Deterministic synthesis in the E438 style: MPEG frames are BUILT from
the published header tables (so every field the walker reports is
recomputable from the generating formula), Ogg pages are assembled by
the module's own spec-correct page builder and then VERIFIED
independently (CRC corruption must fail the walk)."""

from __future__ import annotations

import struct

import pytest

import parquet_to_csv_spark.functions.mediainfo as mi


def _mp3_frame(bitrate_idx=9, sr_idx=0, padding=0, mono=False,
               version_bits=3, layer_bits=1, fill=b"\x00"):
    h = (
        (0x7FF << 21) | (version_bits << 19) | (layer_bits << 17)
        | (1 << 16) | (bitrate_idx << 12) | (sr_idx << 10)
        | (padding << 9) | ((3 if mono else 0) << 6)
    )
    hdr = struct.pack(">I", h)
    parsed = mi._parse_frame_header(hdr + b"\x00" * 8, 0)
    assert parsed is not None
    frame_bytes = parsed[0]
    return hdr + fill * (frame_bytes - 4)


def test_mp3_cbr_walk_and_exact_duration():
    # 40 frames, MPEG1 Layer III, 128 kbps, 44.1 kHz, stereo
    frames = b"".join(_mp3_frame() for _ in range(40))
    info = mi.mp3_info(frames)
    assert info["n_frames"] == 40
    assert info["version"] == "MPEG1" and info["layer"] == 3
    assert info["sample_rate"] == 44100 and info["channels"] == 2
    assert not info["is_vbr"]
    assert info["duration_ms"] == 40 * 1152 * 1000 // 44100
    # frame length formula pin: 144*128000//44100 = 417 (+1 padded)
    assert len(_mp3_frame()) == 417
    assert len(_mp3_frame(padding=1)) == 418


def test_mp3_id3v2_skip_and_trailing_tag():
    tag_body = b"\x00" * 100
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + tag_body
    frames = b"".join(_mp3_frame() for _ in range(5))
    id3v1 = b"TAG" + b"\x00" * 125
    info = mi.mp3_info(id3 + frames + id3v1)
    assert info["n_frames"] == 5
    assert info["id3v2_bytes"] == 110


def test_mp3_vbr_and_mpeg2():
    # mixed bitrates -> VBR; duration still exact per-frame sum
    frames = (_mp3_frame(bitrate_idx=9) + _mp3_frame(bitrate_idx=12)
              + _mp3_frame(bitrate_idx=9))
    info = mi.mp3_info(frames)
    assert info["is_vbr"] and info["n_frames"] == 3
    # MPEG2 Layer III: 576 samples per frame, its own bitrate table
    f2 = b"".join(
        _mp3_frame(version_bits=2, sr_idx=0, bitrate_idx=8)
        for _ in range(10)
    )
    info2 = mi.mp3_info(f2)
    assert info2["version"] == "MPEG2" and info2["sample_rate"] == 22050
    assert info2["duration_ms"] == 10 * 576 * 1000 // 22050


def test_mp3_xing_header():
    first = bytearray(_mp3_frame())
    off = 4 + 32  # MPEG1 stereo side info
    first[off : off + 4] = b"Xing"
    first[off + 4 : off + 8] = struct.pack(">I", 1)  # frames flag
    first[off + 8 : off + 12] = struct.pack(">I", 1234)
    info = mi.mp3_info(bytes(first) + _mp3_frame() * 3)
    assert info["xing_tag"] == "Xing" and info["xing_frames"] == 1234


def test_mp3_resync_and_garbage():
    junk = b"not audio at all, just text padding.."
    frames = b"".join(_mp3_frame() for _ in range(3))
    assert mi.mp3_info(junk + frames)["n_frames"] == 3
    with pytest.raises(ValueError, match="no MPEG audio frame"):
        mi.mp3_info(junk)


def _vorbis_ident(channels=2, rate=44100, nominal=128000):
    return (b"\x01vorbis" + struct.pack("<IBI", 0, channels, rate)
            + struct.pack("<iii", -1, nominal, -1) + b"\xb8\x01")


def _opus_ident(channels=2, pre_skip=312, rate=48000):
    return (b"OpusHead" + bytes([1, channels])
            + struct.pack("<H", pre_skip) + struct.pack("<I", rate)
            + b"\x00\x00\x00")


def test_ogg_vorbis_stream_walk():
    pages = (
        mi.build_ogg_page(7, 0, 0, [_vorbis_ident()], header_type=2)
        + mi.build_ogg_page(7, 1, 44100, [b"\x00" * 300, b"\x01" * 10])
        + mi.build_ogg_page(7, 2, 88200, [b"\x02" * 50], header_type=4)
    )
    info = mi.ogg_info(pages)
    assert info["n_pages"] == 3
    (st,) = info["streams"]
    assert st["codec"] == "vorbis" and st["channels"] == 2
    assert st["sample_rate"] == 44100 and st["eos"]
    assert st["duration_ms"] == 88200 * 1000 // 44100 == 2000
    assert st["bitrate_nominal"] == 128000


def test_ogg_opus_and_multiplexed_streams():
    pages = (
        mi.build_ogg_page(1, 0, 0, [_opus_ident()], header_type=2)
        + mi.build_ogg_page(2, 0, 0, [_vorbis_ident(1, 8000)], header_type=2)
        + mi.build_ogg_page(1, 1, 48000 + 312, [b"x" * 20], header_type=4)
        + mi.build_ogg_page(2, 1, 4000, [b"y" * 20], header_type=4)
    )
    info = mi.ogg_info(pages)
    assert info["n_pages"] == 4
    opus, vorb = info["streams"]
    assert opus["codec"] == "opus" and opus["pre_skip"] == 312
    assert opus["duration_ms"] == 1000  # (granule - preskip) @48k
    assert vorb["codec"] == "vorbis" and vorb["duration_ms"] == 500


def test_ogg_crc_verification_and_corruption():
    page = mi.build_ogg_page(3, 0, 0, [_vorbis_ident()], header_type=2)
    mi.ogg_info(page)  # verifies
    bad = bytearray(page)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        mi.ogg_info(bytes(bad))
    assert mi.ogg_info(bytes(bad), verify_crc=False)["n_pages"] == 1
    with pytest.raises(ValueError, match="lost page sync"):
        mi.ogg_info(b"NotOggData" + page)


def test_ogg_packet_spanning_255_lacing():
    # a packet of exactly 510 bytes -> lacing [255, 255, 0]
    pk = b"z" * 510
    page = mi.build_ogg_page(9, 0, 0, [_vorbis_ident(), pk])
    info = mi.ogg_info(page)
    assert info["streams"][0]["codec"] == "vorbis"
    # a long first packet still assembles across lacing values
    long_ident = _vorbis_ident() + b"\x00" * 400
    page2 = mi.build_ogg_page(10, 0, 0, [long_ident])
    assert mi.ogg_info(page2)["streams"][0]["codec"] == "vorbis"


def test_audio_info_dispatch():
    from parquet_to_csv_spark.functions import audiocodec as ac

    frames = b"".join(_mp3_frame() for _ in range(4))
    info = ac.audio_info(frames)
    assert info["format"] == "mp3" and info["n_frames"] == 4
    page = mi.build_ogg_page(5, 0, 0, [_vorbis_ident()], header_type=2)
    assert ac.audio_info(page)["format"] == "ogg"
    with pytest.raises(ValueError, match="unrecognized"):
        ac.audio_info(b"plainly not audio")


def test_image_info_headers_only():
    import numpy as np

    from parquet_to_csv_spark.functions import imagecodec as ic
    import parquet_to_csv_spark.functions.gifcodec as gcodec
    import parquet_to_csv_spark.functions.webpcodec as wcodec

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    png = ic.encode_png(img)
    assert ic.image_info(png) == {
        "format": "png", "width": 11, "height": 7, "bit_depth": 8,
        "color_type": 2, "interlaced": False,
    }
    bmp = ic.encode_bmp(img)
    got = ic.image_info(bmp)
    assert (got["format"], got["width"], got["height"], got["bpp"]) == (
        "bmp", 11, 7, 24,
    )
    jpg = ic.encode_jpeg(img)
    j = ic.image_info(jpg)
    assert (j["format"], j["width"], j["height"]) == ("jpeg", 11, 7)
    assert j["progressive"] is False and j["n_components"] == 3
    webp = wcodec.encode_vp8l(img)
    assert ic.image_info(webp) == {
        "format": "webp", "width": 11, "height": 7,
        "webp_variant": "lossless",
    }
    pal = img[:, :, 0] % 4
    gimg = np.stack([pal * 60, pal * 50, pal * 40], axis=2).astype(np.uint8)
    gif1 = gcodec.encode_gif(gimg)
    g = ic.image_info(gif1)
    assert (g["width"], g["height"], g["n_frames"], g["animated"]) == (
        11, 7, 1, False,
    )
    gif2 = gcodec.encode_gif(gimg, frames=[gimg])
    assert ic.image_info(gif2)["n_frames"] == 2
    assert ic.image_info(gif2)["animated"] is True
    with pytest.raises(ValueError, match="unrecognized"):
        ic.image_info(b"not an image")
