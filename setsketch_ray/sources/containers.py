"""Ogg / MP3 / Matroska(WebM) METADATA probes, pure Python.

Same honest contract as ``sources/mp4.py``: these are the web's other
dominant media containers, their framing is simple public spec (RFC 3533,
ISO 11172-3 / 13818-3 frame headers, the Matroska EBML spec), and a
curation pipeline wants to filter/route by codec, resolution, sample rate
or duration BEFORE any decode attempt — especially for payload codecs this
environment cannot decode (Vorbis/Opus/Theora/VP9/AAC...).  Each probe
walks headers only and never touches payload bits.

Exception: **FLAC-in-Ogg decodes for real** — ``decode_ogg_flac`` /
``encode_ogg_flac`` wrap the engine's own lossless FLAC codec
(``sources/flac.py``) in the spec Ogg mapping via full packet reassembly.

``build_ogg_stub`` / ``build_mp3_stub`` / ``build_mkv_stub`` write
minimal-but-valid files (real page CRCs, real frame headers, real EBML
trees) so tests and corpora exercise the parsers without encoded media.
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------- Ogg
# page CRC: poly 0x04C11DB7, init 0, no reflection, no final xor (RFC 3533)
_OGG_CRC = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
    _OGG_CRC.append(_r & 0xFFFFFFFF)


def _ogg_crc(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _OGG_CRC[((r >> 24) ^ b) & 0xFF]
    return r


def _ogg_page_raw(serial: int, seq: int, granule: int, segs: list[int],
                  body: bytes, header_type: int = 0) -> bytes:
    hdr = (b"OggS\x00" + bytes([header_type])
           + struct.pack("<q", granule) + struct.pack("<III", serial, seq, 0)
           + bytes([len(segs)]) + bytes(segs))
    page = hdr + body
    crc = _ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def _ogg_page(serial: int, seq: int, granule: int, body: bytes,
              header_type: int = 0) -> bytes:
    segs = [255] * (len(body) // 255)
    segs.append(len(body) % 255)  # final lacing < 255 terminates the packet
    return _ogg_page_raw(serial, seq, granule, segs, body, header_type)


def _ogg_pages_for_packet(serial: int, seq: int, packet: bytes,
                          granule: int, first_header_type: int = 0,
                          eos: bool = False) -> tuple[bytes, int]:
    """Page out ONE (possibly large) packet: 255-byte lacing, up to 255
    segments per page, continuation flag on follow-on pages, granule -1 on
    pages where the packet has not ended.  Returns (bytes, next_seq)."""
    segs = [255] * (len(packet) // 255) + [len(packet) % 255]
    out = []
    off = 0
    i = 0
    while i < len(segs):
        chunk = segs[i:i + 255]
        size = sum(chunk)
        last = i + 255 >= len(segs)
        ht = first_header_type if i == 0 else 0x01
        if last and eos:
            ht |= 0x04
        out.append(_ogg_page_raw(serial, seq, granule if last else -1,
                                 chunk, packet[off:off + size], ht))
        off += size
        seq += 1
        i += 255
    return b"".join(out), seq


def _ogg_packets(data: bytes, serial: int) -> list[bytes]:
    """Reassemble the logical packet stream of ONE serial from the page
    sequence (255-lacing continuation, cross-page continued packets)."""
    packets: list[bytes] = []
    cur = b""
    pos = 0
    n = len(data)
    while pos + 27 <= n:
        if data[pos:pos + 4] != b"OggS":
            nxt = data.find(b"OggS", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        (ser,) = struct.unpack("<I", data[pos + 14:pos + 18])
        nseg = data[pos + 26]
        segs = data[pos + 27:pos + 27 + nseg]
        body_start = pos + 27 + nseg
        body_len = sum(segs)
        body = data[body_start:body_start + body_len]
        pos = body_start + body_len
        if ser != serial:
            continue
        off = 0
        for s in segs:
            cur += body[off:off + s]
            off += s
            if s < 255:
                packets.append(cur)
                cur = b""
    if cur:
        packets.append(cur)  # truncated final packet: surface as-is
    return packets


def decode_ogg_flac(data: bytes):
    """REAL payload decode for FLAC-in-Ogg (the one Ogg mapping whose codec
    this engine owns): find the FLAC logical stream (BOS packet
    ``\\x7fFLAC``), reassemble its packets, rebuild a native ``fLaC``
    stream (STREAMINFO from the mapping header, last-metadata flag set,
    frame packets concatenated — FLAC frames are self-delimiting) and hand
    it to ``sources/flac.decode_flac`` (CRC-8/16 + MD5 verified there).
    Returns ``(pcm (n, nch) int32, rate, bps)``."""
    from .flac import decode_flac

    if data[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    # find the FLAC stream's serial from its BOS page
    serial = None
    pos = 0
    while pos + 27 <= len(data):
        if data[pos:pos + 4] != b"OggS":
            break
        header_type = data[pos + 5]
        (ser,) = struct.unpack("<I", data[pos + 14:pos + 18])
        nseg = data[pos + 26]
        segs = data[pos + 27:pos + 27 + nseg]
        body_start = pos + 27 + nseg
        if header_type & 0x02 and \
                data[body_start:body_start + 5] == b"\x7fFLAC":
            serial = ser
            break
        pos = body_start + sum(segs)
    if serial is None:
        raise NotImplementedError("Ogg stream carries no FLAC mapping")
    packets = _ogg_packets(data, serial)
    first = packets[0]
    if first[:5] != b"\x7fFLAC" or first[9:13] != b"fLaC":
        raise ValueError("corrupt Ogg-FLAC mapping header")
    (nheaders,) = struct.unpack(">H", first[7:9])
    streaminfo = first[13 + 4:13 + 4 + 34]
    body = packets[1 + nheaders:]
    if nheaders == 0:
        # nheaders==0 means "unknown header count" per the Ogg-FLAC
        # mapping spec — skip leading metadata packets until one starts
        # with the FLAC frame sync (0xFF 0xF8-0xFB).
        body = packets[1:]
        while body and not (len(body[0]) >= 2 and body[0][0] == 0xFF
                            and 0xF8 <= body[0][1] <= 0xFB):
            body = body[1:]
    native = (b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:]
              + streaminfo + b"".join(body))
    return decode_flac(native)


def encode_ogg_flac(pcm, rate: int, serial: int = 1) -> bytes:
    """Encode PCM as FLAC-in-Ogg: the engine's own lossless FLAC encoder
    wrapped in the spec Ogg mapping (``\\x7fFLAC`` first packet with the
    native STREAMINFO, one VORBIS_COMMENT header packet, frame payload
    paged with proper lacing/continuation, EOS granule = total samples)."""
    from .flac import encode_flac

    native = encode_flac(pcm, rate)
    # native layout: "fLaC" + 0x80-flagged 34-byte STREAMINFO block + frames
    streaminfo = native[8:8 + 34]
    frames = native[8 + 34:]
    n_samples = _streaminfo_total_samples(streaminfo)
    first = (b"\x7fFLAC" + bytes([1, 0]) + struct.pack(">H", 1)
             + b"fLaC" + bytes([0x00]) + struct.pack(">I", 34)[1:]
             + streaminfo)
    vendor = b"setsketch-ray"
    vc_body = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", 0)
    vc = bytes([0x84]) + struct.pack(">I", len(vc_body))[1:] + vc_body
    out = _ogg_page(serial, 0, 0, first, header_type=0x02)
    out += _ogg_page(serial, 1, 0, vc)
    pages, _ = _ogg_pages_for_packet(serial, 2, frames, n_samples, eos=True)
    return out + pages


def _streaminfo_total_samples(streaminfo: bytes) -> int:
    """Total-samples field (36 bits at offset 13.5 bytes of STREAMINFO)."""
    hi = streaminfo[13] & 0x0F
    return (hi << 32) | int.from_bytes(streaminfo[14:18], "big")


def ogg_info(data: bytes) -> dict:
    """Walk every Ogg page: per-stream codec identification from the BOS
    packet (Vorbis/Opus/Theora/FLAC/Speex id headers), rate/channels/
    dimensions from those headers, duration from each stream's last
    granule position.  Headers only — no payload packet is parsed."""
    if data[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    streams: dict[int, dict] = {}
    pos = 0
    n = len(data)
    while pos + 27 <= n:
        if data[pos:pos + 4] != b"OggS":
            nxt = data.find(b"OggS", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        header_type = data[pos + 5]
        (granule,) = struct.unpack("<q", data[pos + 6:pos + 14])
        (serial,) = struct.unpack("<I", data[pos + 14:pos + 18])
        nseg = data[pos + 26]
        segs = data[pos + 27:pos + 27 + nseg]
        body_start = pos + 27 + nseg
        body_len = sum(segs)
        body = data[body_start:body_start + body_len]
        pos = body_start + body_len
        st = streams.setdefault(serial, {
            "codec": "", "kind": "audio", "rate": 0, "channels": 0,
            "w": 0, "h": 0, "fps": 0.0, "preskip": 0, "kfgshift": 0,
            "last_granule": 0})
        if header_type & 0x02:  # BOS: first packet is the id header
            if body[:7] == b"\x01vorbis":
                st["codec"] = "vorbis"
                st["channels"] = body[11]
                (st["rate"],) = struct.unpack("<I", body[12:16])
            elif body[:8] == b"OpusHead":
                st["codec"] = "opus"
                st["channels"] = body[9]
                (st["preskip"],) = struct.unpack("<H", body[10:12])
                st["rate"] = 48000  # granule clock is always 48 kHz
            elif body[:7] == b"\x80theora":
                st["codec"] = "theora"
                st["kind"] = "video"
                st["w"] = int.from_bytes(body[14:17], "big")   # PICW
                st["h"] = int.from_bytes(body[17:20], "big")   # PICH
                frn, frd = struct.unpack(">II", body[22:30])
                st["fps"] = frn / frd if frd else 0.0
                (q_kfg,) = struct.unpack(">H", body[40:42])
                st["kfgshift"] = (q_kfg >> 5) & 0x1F
            elif body[:5] == b"\x7fFLAC":
                st["codec"] = "flac"
                # mapping header wraps a native fLaC STREAMINFO at offset 9
                if body[9:13] == b"fLaC":
                    si = body[17:]  # past the 4-byte metadata block header
                    st["rate"] = (si[10] << 12) | (si[11] << 4) \
                        | (si[12] >> 4)
                    st["channels"] = ((si[12] >> 1) & 0x07) + 1
            elif body[:8] == b"Speex   ":
                st["codec"] = "speex"
                (st["rate"],) = struct.unpack("<I", body[36:40])
                (st["channels"],) = struct.unpack("<I", body[48:52])
            else:
                st["codec"] = "unknown"
        if granule > 0:
            st["last_granule"] = max(st["last_granule"], granule)
    out_streams = []
    for st in streams.values():
        gp = st["last_granule"]
        if st["codec"] == "theora":
            shift = st["kfgshift"]
            frames = (gp >> shift) + (gp & ((1 << shift) - 1))
            dur = frames / st["fps"] if st["fps"] else 0.0
        elif st["codec"] == "opus":
            dur = max(0, gp - st["preskip"]) / 48000.0
        elif st["rate"]:
            dur = gp / st["rate"]
        else:
            dur = 0.0
        st = dict(st)
        st["duration_s"] = dur
        out_streams.append(st)
    vids = [s for s in out_streams if s["kind"] == "video"]
    primary = vids[0] if vids else (out_streams[0] if out_streams else None)
    return {"container": "ogg",
            "kind": primary["kind"] if primary else "unknown",
            "codec": primary["codec"] if primary else "",
            "w": primary["w"] if primary else 0,
            "h": primary["h"] if primary else 0,
            "duration_s": max((s["duration_s"] for s in out_streams),
                              default=0.0),
            "streams": out_streams}


def build_ogg_stub(codec: str, duration_s: float, rate: int = 44100,
                   channels: int = 2, w: int = 0, h: int = 0,
                   fps: float = 24.0, serial: int = 1) -> bytes:
    """Valid Ogg framing (real page CRCs) around a real codec id header
    plus an EOS page whose granule position encodes ``duration_s`` — no
    payload packets (the parsers above never read them anyway)."""
    if codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
                 + struct.pack("<I", rate) + struct.pack("<iii", 0, 0, 0)
                 + b"\xb8\x01")
        granule = round(duration_s * rate)
    elif codec == "opus":
        ident = (b"OpusHead" + bytes([1, channels])
                 + struct.pack("<H", 312) + struct.pack("<I", rate)
                 + struct.pack("<h", 0) + b"\x00")
        granule = round(duration_s * 48000) + 312
    elif codec == "theora":
        kfg = 6
        ident = (b"\x80theora" + bytes([3, 2, 1])
                 + struct.pack(">HH", (w + 15) // 16, (h + 15) // 16)
                 + w.to_bytes(3, "big") + h.to_bytes(3, "big")
                 + bytes([0, 0]) + struct.pack(">II", round(fps * 1000),
                                               1000)
                 + b"\x00" * 6 + bytes([0]) + b"\x00" * 3
                 + struct.pack(">H", (63 << 10) | (kfg << 5)))
        granule = round(duration_s * fps) << kfg
    else:
        raise ValueError(f"unsupported ogg stub codec {codec!r}")
    return (_ogg_page(serial, 0, 0, ident, header_type=0x02)
            + _ogg_page(serial, 1, granule, b"", header_type=0x04))


# --------------------------------------------------------------------- MP3
_MP3_BITRATES = {
    # (version_group, layer): kbps by index 1..14
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {3: (44100, 48000, 32000),    # MPEG1
              2: (22050, 24000, 16000),    # MPEG2
              0: (11025, 12000, 8000)}     # MPEG2.5


def _mp3_frame(data: bytes, pos: int):
    """Parse one frame header at pos; returns (frame_len, samples, rate,
    kbps, layer, channels) or None if not a valid header."""
    if pos + 4 > len(data) or data[pos] != 0xFF \
            or (data[pos + 1] & 0xE0) != 0xE0:
        return None
    b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
    ver_bits = (b1 >> 3) & 3
    layer_bits = (b1 >> 1) & 3
    if ver_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits  # 1/2/3
    vgroup = 1 if ver_bits == 3 else 2
    br_idx = b2 >> 4
    rate_idx = (b2 >> 2) & 3
    if br_idx in (0, 15) or rate_idx == 3:
        return None
    kbps = _MP3_BITRATES[(vgroup, layer)][br_idx - 1]
    rate = _MP3_RATES[ver_bits][rate_idx]
    pad = (b2 >> 1) & 1
    channels = 1 if (b3 >> 6) == 3 else 2
    if layer == 1:
        samples = 384
        frame_len = (12 * kbps * 1000 // rate + pad) * 4
    else:
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        frame_len = samples // 8 * kbps * 1000 // rate + pad
    return frame_len, samples, rate, kbps, layer, channels


def mp3_info(data: bytes) -> dict:
    """Frame-header walk: skips a leading ID3v2 tag, resyncs across
    garbage, counts frames and sums their sample durations.  Returns
    layer/rate/channels/mean bitrate/duration — payload bits untouched."""
    pos = 0
    if data[:3] == b"ID3":
        sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + sz
    n_frames = 0
    dur = 0.0
    kbps_sum = 0
    rate = channels = layer = 0
    synced = False
    while pos + 4 <= len(data):
        fr = _mp3_frame(data, pos)
        if fr is None:
            pos += 1  # resync
            synced = False
            continue
        frame_len, samples, rate, kbps, layer, channels = fr
        if frame_len <= 0:
            pos += 1
            synced = False
            continue
        # standard MP3 sync heuristic: at stream start or after a resync,
        # require the NEXT header to also parse before counting, so
        # sync-shaped garbage (0xFF 0xEx) is not counted as audio.
        if not synced and pos + frame_len + 4 <= len(data) \
                and _mp3_frame(data, pos + frame_len) is None:
            pos += 1
            continue
        synced = True
        n_frames += 1
        dur += samples / rate
        kbps_sum += kbps
        pos += frame_len
    if n_frames == 0:
        raise ValueError("no MPEG audio frames found")
    return {"container": "mp3", "kind": "audio",
            "codec": {1: "mp1", 2: "mp2", 3: "mp3"}[layer],
            "rate": rate, "channels": channels, "n_frames": n_frames,
            "bitrate_kbps": kbps_sum // n_frames, "duration_s": dur,
            "w": 0, "h": 0}


def build_mp3_stub(duration_s: float, kbps: int = 128, rate: int = 44100,
                   channels: int = 2, with_id3: bool = False) -> bytes:
    """MPEG1 Layer III frames (real headers, zeroed payloads) totalling
    ``duration_s``; optionally preceded by an empty ID3v2 tag."""
    br_idx = _MP3_BITRATES[(1, 3)].index(kbps) + 1
    rate_idx = _MP3_RATES[3].index(rate)
    mode = 3 if channels == 1 else 0
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (rate_idx << 2),
                 mode << 6])
    frame_len = 1152 // 8 * kbps * 1000 // rate
    frame = hdr + b"\x00" * (frame_len - 4)
    n = max(1, round(duration_s * rate / 1152))
    id3 = b""
    if with_id3:
        body = b"\x00" * 37
        id3 = b"ID3\x04\x00\x00" + bytes(
            [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
             (len(body) >> 7) & 0x7F, len(body) & 0x7F]) + body
    return id3 + frame * n


# ------------------------------------------------------- Matroska / WebM
_EBML_HEADER = 0x1A45DFA3
_SEGMENT = 0x18538067
_SEG_INFO = 0x1549A966
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_DOCTYPE = 0x4282
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_AUDIO = 0xE1
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_SAMPLING = 0xB5
_CHANNELS = 0x9F


def _ebml_read(data: bytes, pos: int, keep_marker: bool):
    """Read one EBML variable-length integer; returns (value, new_pos).
    value is None for an unknown-size marker (all value bits set)."""
    b0 = data[pos]
    if b0 == 0:
        raise ValueError("invalid EBML varint")
    ln = 1
    mask = 0x80
    while not (b0 & mask):
        ln += 1
        mask >>= 1
    raw = int.from_bytes(data[pos:pos + ln], "big")
    if keep_marker:
        return raw, pos + ln
    val = raw - (1 << (7 * ln))  # strip the marker bit
    if val == (1 << (7 * ln)) - 1:
        return None, pos + ln  # unknown size (streamed files)
    return val, pos + ln


def _ebml_iter(data: bytes, pos: int, end: int):
    while pos < end:
        eid, pos = _ebml_read(data, pos, keep_marker=True)
        size, pos = _ebml_read(data, pos, keep_marker=False)
        q = end if size is None else pos + size
        yield eid, pos, q
        pos = q


def _ebml_uint(data: bytes, p: int, q: int) -> int:
    return int.from_bytes(data[p:q], "big")


def _ebml_float(data: bytes, p: int, q: int) -> float:
    if q - p == 4:
        return struct.unpack(">f", data[p:q])[0]
    if q - p == 8:
        return struct.unpack(">d", data[p:q])[0]
    return 0.0


def mkv_info(data: bytes) -> dict:
    """EBML walk of a Matroska/WebM file: DocType, segment duration
    (TimestampScale x Duration), per-track type/CodecID/dimensions/audio
    params.  Cluster (payload) elements are skipped wholesale."""
    if data[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("not an EBML (Matroska/WebM) stream")
    doctype = "matroska"
    scale = 1_000_000
    duration_units = 0.0
    tracks = []

    def walk_track(p, q):
        tr = {"kind": "", "codec": "", "w": 0, "h": 0, "rate": 0.0,
              "channels": 0}
        for eid, a, b in _ebml_iter(data, p, q):
            if eid == _TRACK_TYPE:
                tr["kind"] = {1: "video", 2: "audio",
                              0x11: "subtitle"}.get(
                    _ebml_uint(data, a, b), "other")
            elif eid == _CODEC_ID:
                tr["codec"] = data[a:b].decode("latin1").rstrip("\x00")
            elif eid == _VIDEO:
                for e2, c, d in _ebml_iter(data, a, b):
                    if e2 == _PIXEL_W:
                        tr["w"] = _ebml_uint(data, c, d)
                    elif e2 == _PIXEL_H:
                        tr["h"] = _ebml_uint(data, c, d)
            elif eid == _AUDIO:
                for e2, c, d in _ebml_iter(data, a, b):
                    if e2 == _SAMPLING:
                        tr["rate"] = _ebml_float(data, c, d)
                    elif e2 == _CHANNELS:
                        tr["channels"] = _ebml_uint(data, c, d)
        return tr

    for eid, p, q in _ebml_iter(data, 0, len(data)):
        if eid == _EBML_HEADER:
            for e2, a, b in _ebml_iter(data, p, q):
                if e2 == _DOCTYPE:
                    doctype = data[a:b].decode("latin1").rstrip("\x00")
        elif eid == _SEGMENT:
            for e2, a, b in _ebml_iter(data, p, q):
                if e2 == _SEG_INFO:
                    for e3, c, d in _ebml_iter(data, a, b):
                        if e3 == _TS_SCALE:
                            scale = _ebml_uint(data, c, d)
                        elif e3 == _DURATION:
                            duration_units = _ebml_float(data, c, d)
                elif e2 == _TRACKS:
                    for e3, c, d in _ebml_iter(data, a, b):
                        if e3 == _TRACK_ENTRY:
                            tracks.append(walk_track(c, d))
    return {"container": "webm" if doctype == "webm" else "mkv",
            "doctype": doctype,
            "duration_s": duration_units * scale / 1e9,
            "tracks": tracks}


def _eb(eid: int, payload: bytes) -> bytes:
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(payload)
    ln = 1
    while n >= (1 << (7 * ln)) - 1:
        ln += 1
    size = (n | (1 << (7 * ln))).to_bytes(ln, "big")
    return idb + size + payload


def _eb_uint(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def build_mkv_stub(w: int, h: int, duration_s: float,
                   codec: str = "V_VP9", webm: bool = True,
                   with_audio: bool = False,
                   audio_codec: str = "A_OPUS") -> bytes:
    """Valid EBML tree (header + segment info + tracks, no clusters)."""
    doctype = b"webm" if webm else b"matroska"
    ebml = _eb(_EBML_HEADER,
               _eb(0x4286, _eb_uint(1)) + _eb(0x42F7, _eb_uint(1))
               + _eb(0x42F2, _eb_uint(4)) + _eb(0x42F3, _eb_uint(8))
               + _eb(_DOCTYPE, doctype)
               + _eb(0x4287, _eb_uint(4)) + _eb(0x4285, _eb_uint(2)))
    info = _eb(_SEG_INFO,
               _eb(_TS_SCALE, _eb_uint(1_000_000))
               + _eb(_DURATION, struct.pack(">d", duration_s * 1000.0)))
    vid = _eb(_TRACK_ENTRY,
              _eb(0xD7, _eb_uint(1)) + _eb(0x73C5, _eb_uint(1))
              + _eb(_TRACK_TYPE, _eb_uint(1))
              + _eb(_CODEC_ID, codec.encode())
              + _eb(_VIDEO, _eb(_PIXEL_W, _eb_uint(w))
                    + _eb(_PIXEL_H, _eb_uint(h))))
    tracks = vid
    if with_audio:
        tracks += _eb(_TRACK_ENTRY,
                      _eb(0xD7, _eb_uint(2)) + _eb(0x73C5, _eb_uint(2))
                      + _eb(_TRACK_TYPE, _eb_uint(2))
                      + _eb(_CODEC_ID, audio_codec.encode())
                      + _eb(_AUDIO,
                            _eb(_SAMPLING, struct.pack(">f", 48000.0))
                            + _eb(_CHANNELS, _eb_uint(2))))
    segment = _eb(_SEGMENT, info + _eb(_TRACKS, tracks))
    return ebml + segment
