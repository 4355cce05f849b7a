"""MP3 / Ogg container-METADATA walkers (no DSP decode) — round 11.

The audio siblings of ``functions/videomd.py`` (E438 MP4 boxes): a
100 TB multimodal corpus pipeline needs per-file duration / bitrate /
codec / channel metadata long before any lossy decode runs, and both
containers expose it structurally from the public specs:

- **MP3** (`mp3_info`): ID3v2 tag skip (syncsafe sizes, footer flag),
  MPEG frame-header walk (versions 1/2/2.5 × layers I/II/III, the
  published bitrate/sample-rate index tables, padding, frame-length
  formulas per layer), Xing/Info VBR header (frame/byte counts, the
  side-info offset by version × channel mode), CBR/VBR detection and
  exact-integer duration math.
- **Ogg** (`ogg_info`): page walk ("OggS", version 0, header-type
  flags, 64-bit granule, serial, sequence, segment lacing) with page
  CRC VERIFICATION (the Ogg CRC-32: poly 0x04C11DB7, non-reflected,
  init/xorout 0 — implemented below and pinned in tests), per-stream
  packet assembly for the FIRST packet, and identification-header
  parsing for Vorbis (``\\x01vorbis``: channels, sample rate,
  bitrates) and Opus (``OpusHead``: channels, pre-skip, input rate);
  duration derives from the final granule per stream (PCM samples for
  Vorbis; 48 kHz ticks minus pre-skip for Opus).

Audio DECODE of these lossy families stays the documented §2.7
boundary; what ships here is the metadata layer a curation pipeline
actually partitions and filters on.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------

# bitrate kbps tables, index 1..14 (0 = free, 15 = bad) — ISO/IEC 11172-3
_BITRATE = {
    # (version_group, layer): row   version_group: 1 = MPEG1, 2 = MPEG2/2.5
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
}
_SAMPLE_RATE = {  # version bits -> [idx0, idx1, idx2]
    3: [44100, 48000, 32000],   # MPEG1
    2: [22050, 24000, 16000],   # MPEG2
    0: [11025, 12000, 8000],    # MPEG2.5
}
_VERSION_NAME = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _skip_id3v2(payload: bytes) -> tuple[int, int]:
    """(offset past the tag, tag byte length incl. header/footer)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0, 0
    flags = payload[5]
    size = _syncsafe(payload[6:10]) + 10
    if flags & 0x10:  # footer present
        size += 10
    return size, size


def _parse_frame_header(payload: bytes, pos: int):
    """(frame_bytes, samples, sample_rate, bitrate_bps, version, layer,
    channels) or None when ``pos`` is not a valid frame sync."""
    if pos + 4 > len(payload):
        return None
    h = struct.unpack_from(">I", payload, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    vbits = (h >> 19) & 3
    layer_bits = (h >> 17) & 3
    if vbits == 1 or layer_bits == 0:
        return None  # reserved
    layer = 4 - layer_bits  # 3->I, 2->II, 1->III
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / bad
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    channels = 1 if mode == 3 else 2
    vgroup = 1 if vbits == 3 else 2
    bitrate = _BITRATE[(vgroup, layer)][br_idx] * 1000
    sample_rate = _SAMPLE_RATE[vbits][sr_idx]
    if layer == 1:
        samples = 384
        frame_bytes = (12 * bitrate // sample_rate + padding) * 4
    elif layer == 2:
        samples = 1152
        frame_bytes = 144 * bitrate // sample_rate + padding
    else:  # layer III
        samples = 1152 if vgroup == 1 else 576
        per = 144 if vgroup == 1 else 72
        frame_bytes = per * bitrate // sample_rate + padding
    return (frame_bytes, samples, sample_rate, bitrate,
            _VERSION_NAME[vbits], layer, channels)


def _xing_offset(version: str, channels: int) -> int:
    """Side-info length after the 4-byte header (Layer III)."""
    if version == "MPEG1":
        return 17 if channels == 1 else 32
    return 9 if channels == 1 else 17


def mp3_info(payload: bytes) -> dict:
    """Walk every MPEG audio frame; returns n_frames, duration_ms
    (exact integer: sum(samples)*1000 // sample_rate), sample_rate,
    channels, version, layer, mean bitrate, is_vbr, id3v2 byte size,
    and xing frame count when a Xing/Info header is present."""
    start, id3_size = _skip_id3v2(payload)
    pos = start
    n = len(payload)
    n_frames = 0
    total_samples = 0
    bitrates = set()
    total_bits = 0
    meta: dict = {"id3v2_bytes": id3_size}
    xing_frames = None
    while pos + 4 <= n:
        fh = _parse_frame_header(payload, pos)
        if fh is None:
            if n_frames == 0:
                pos += 1  # resync until the first real frame
                continue
            break  # trailing junk (e.g. ID3v1) ends the walk
        frame_bytes, samples, sr, br, version, layer, ch = fh
        if n_frames == 0:
            meta.update(
                sample_rate=sr, version=version, layer=layer, channels=ch
            )
            if layer == 3:
                off = pos + 4 + _xing_offset(version, ch)
                tag = payload[off : off + 4]
                if tag in (b"Xing", b"Info"):
                    flags = struct.unpack_from(">I", payload, off + 4)[0]
                    if flags & 1:
                        xing_frames = struct.unpack_from(
                            ">I", payload, off + 8
                        )[0]
                    meta["xing_tag"] = tag.decode()
        if frame_bytes <= 0 or pos + frame_bytes > n:
            break
        n_frames += 1
        total_samples += samples
        bitrates.add(br)
        total_bits += frame_bytes * 8
        pos += frame_bytes
    if n_frames == 0:
        raise ValueError("mp3: no MPEG audio frame found")
    sr = meta["sample_rate"]
    meta.update(
        n_frames=n_frames,
        duration_ms=total_samples * 1000 // sr,
        is_vbr=len(bitrates) > 1,
        mean_bitrate=total_bits * sr // total_samples if total_samples else 0,
    )
    if xing_frames is not None:
        meta["xing_frames"] = xing_frames
    return meta


# ---------------------------------------------------------------------------
# Ogg
# ---------------------------------------------------------------------------

_OGG_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
        _r &= 0xFFFFFFFF
    _OGG_CRC_TABLE.append(_r)


def ogg_crc(data: bytes) -> int:
    """The Ogg page CRC-32: polynomial 0x04C11DB7, NOT reflected,
    initial and final value 0 (RFC 3533 §6)."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[(crc >> 24) ^ b]
    return crc


def build_ogg_page(
    serial: int,
    seq: int,
    granule: int,
    packets: list[bytes],
    header_type: int = 0,
) -> bytes:
    """Assemble one spec-correct Ogg page (lacing + CRC) — used by the
    tests to synthesize streams and by any fixture builder."""
    lacing = bytearray()
    body = bytearray()
    for pk in packets:
        q, r = divmod(len(pk), 255)
        lacing += b"\xff" * q + bytes([r])
        body += pk
    if len(lacing) > 255:
        raise ValueError("ogg: too many lacing values for one page")
    hdr = bytearray(b"OggS\x00")
    hdr.append(header_type)
    hdr += struct.pack("<q", granule)
    hdr += struct.pack("<I", serial)
    hdr += struct.pack("<I", seq)
    hdr += b"\x00\x00\x00\x00"  # CRC placeholder
    hdr.append(len(lacing))
    hdr += lacing
    page = bytes(hdr) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def _parse_ident(packet: bytes) -> dict:
    if packet[:7] == b"\x01vorbis":
        version, channels, rate = struct.unpack_from("<IBI", packet, 7)
        br_max, br_nom, br_min = struct.unpack_from("<iii", packet, 16)
        return {
            "codec": "vorbis",
            "channels": channels,
            "sample_rate": rate,
            "bitrate_nominal": br_nom,
        }
    if packet[:8] == b"OpusHead":
        version = packet[8]
        channels = packet[9]
        (pre_skip,) = struct.unpack_from("<H", packet, 10)
        (input_rate,) = struct.unpack_from("<I", packet, 12)
        return {
            "codec": "opus",
            "channels": channels,
            "sample_rate": input_rate,
            "pre_skip": pre_skip,
        }
    return {"codec": "unknown"}


def ogg_info(payload: bytes, verify_crc: bool = True) -> dict:
    """Walk every Ogg page; returns per-stream codec metadata and
    durations. Duration math: Vorbis granule = PCM sample count →
    ms = granule*1000 // rate; Opus granule counts 48 kHz ticks and
    subtracts the ident header's pre-skip."""
    pos = 0
    n = len(payload)
    streams: dict[int, dict] = {}
    n_pages = 0
    while pos + 27 <= n:
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError("ogg: lost page sync")
        if payload[pos + 4] != 0:
            raise ValueError("ogg: unsupported stream structure version")
        header_type = payload[pos + 5]
        (granule,) = struct.unpack_from("<q", payload, pos + 6)
        (serial,) = struct.unpack_from("<I", payload, pos + 14)
        (seq,) = struct.unpack_from("<I", payload, pos + 18)
        (crc,) = struct.unpack_from("<I", payload, pos + 22)
        nseg = payload[pos + 26]
        lacing = payload[pos + 27 : pos + 27 + nseg]
        body_len = sum(lacing)
        page_end = pos + 27 + nseg + body_len
        if page_end > n:
            raise ValueError("ogg: truncated page")
        if verify_crc:
            zeroed = (
                payload[pos : pos + 22]
                + b"\x00\x00\x00\x00"
                + payload[pos + 26 : page_end]
            )
            if ogg_crc(zeroed) != crc:
                raise ValueError(f"ogg: page CRC mismatch (page {n_pages})")
        st = streams.setdefault(
            serial,
            {"serial": serial, "n_pages": 0, "first_packet": b"",
             "first_done": False, "last_granule": 0},
        )
        st["n_pages"] += 1
        if not st["first_done"]:
            body = payload[pos + 27 + nseg : page_end]
            off = 0
            for lv in lacing:
                st["first_packet"] += body[off : off + lv]
                off += lv
                if lv < 255:
                    st["first_done"] = True
                    break
        if granule >= 0:
            st["last_granule"] = max(st["last_granule"], granule)
        if header_type & 0x04:
            st["eos"] = True
        n_pages += 1
        pos = page_end
    if n_pages == 0:
        raise ValueError("ogg: no pages found")
    out_streams = []
    for st in streams.values():
        ident = _parse_ident(bytes(st["first_packet"]))
        info = {
            "serial": st["serial"],
            "n_pages": st["n_pages"],
            "eos": st.get("eos", False),
            **ident,
        }
        g = st["last_granule"]
        if ident["codec"] == "vorbis" and ident.get("sample_rate"):
            info["duration_ms"] = g * 1000 // ident["sample_rate"]
        elif ident["codec"] == "opus":
            info["duration_ms"] = max(0, g - ident["pre_skip"]) * 1000 // 48000
        out_streams.append(info)
    return {"n_pages": n_pages, "streams": sorted(
        out_streams, key=lambda s: s["serial"]
    )}
