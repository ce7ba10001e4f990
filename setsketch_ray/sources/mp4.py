"""ISO Base Media File Format (MP4/MOV) METADATA parser, pure Python.

An honest middle ground for containers whose codecs we cannot decode (AVC/
HEVC/AAC need licensed codec machinery that does not exist here): the box
structure itself is simple public spec (ISO/IEC 14496-12), so a curation
pipeline can still read TYPED METADATA — brand, movie duration, per-track
kind/codec fourcc/dimensions/timescale — and filter/route clips by
resolution, duration or codec BEFORE ever attempting pixel work.  Pixel
decode for these containers remains a clearly-marked stub
(``VideoFrameSampleStage`` raises ``NotImplementedError``).

``build_mp4_stub`` writes a minimal-but-valid ISO-BMFF metadata skeleton
(ftyp + moov with mvhd/trak/tkhd/mdia/mdhd/hdlr/stsd, empty mdat) so tests
and corpora can exercise the parser without real encoded media.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts",
               b"udta", b"mvex"}


def _iter_boxes(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < hdr:
            raise ValueError("corrupt ISO-BMFF box size")
        yield typ, pos + hdr, pos + size
        pos += size


def parse_mp4(data: bytes) -> dict:
    """Returns {brand, duration_s, tracks: [{kind, codec, w, h,
    duration_s, timescale}]} — metadata only, no sample data touched."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (ftyp) blob")
    info: dict = {"brand": data[8:12].decode("latin1"), "duration_s": 0.0,
                  "tracks": []}

    def walk_track(pos, end):
        tr = {"kind": "", "codec": "", "w": 0, "h": 0,
              "duration_s": 0.0, "timescale": 0}
        dur_units = 0

        def walk(pos, end):
            nonlocal dur_units
            for typ, p, q in _iter_boxes(data, pos, end):
                if typ in _CONTAINERS:
                    walk(p, q)
                elif typ == b"tkhd":
                    ver = data[p]
                    off = p + 4 + (8 if ver else 4) * 2 + 4 + 4
                    # width/height: 16.16 fixed, last 8 bytes of the box
                    w16, h16 = struct.unpack(">II", data[q - 8:q])
                    tr["w"] = tr["w"] or w16 >> 16
                    tr["h"] = tr["h"] or h16 >> 16
                    del off
                elif typ == b"mdhd":
                    ver = data[p]
                    if ver:
                        ts, du = struct.unpack(">IQ", data[p + 20:p + 32])
                    else:
                        ts, du = struct.unpack(">II", data[p + 12:p + 20])
                    tr["timescale"] = ts
                    dur_units = du
                elif typ == b"hdlr":
                    handler = data[p + 8:p + 12]
                    tr["kind"] = {b"vide": "video", b"soun": "audio",
                                  b"text": "text"}.get(handler,
                                                       handler.decode(
                                                           "latin1"))
                elif typ == b"stsd":
                    n = struct.unpack(">I", data[p + 4:p + 8])[0]
                    if n >= 1 and q - p >= 16:
                        tr["codec"] = data[p + 12:p + 16].decode("latin1")
                        if tr["kind"] != "audio" and q - p >= 44:
                            # visual sample entry: width/height u16 at
                            # offsets 24/26 of the entry twice removed
                            w, h = struct.unpack(">HH", data[p + 40:p + 44])
                            tr["w"] = tr["w"] or w
                            tr["h"] = tr["h"] or h

        walk(pos, end)
        if tr["timescale"]:
            tr["duration_s"] = dur_units / tr["timescale"]
        return tr

    def walk_top(pos, end):
        for typ, p, q in _iter_boxes(data, pos, end):
            if typ == b"moov":
                for t2, p2, q2 in _iter_boxes(data, p, q):
                    if t2 == b"mvhd":
                        ver = data[p2]
                        if ver:
                            ts, du = struct.unpack(">IQ",
                                                   data[p2 + 20:p2 + 32])
                        else:
                            ts, du = struct.unpack(">II",
                                                   data[p2 + 12:p2 + 20])
                        if ts:
                            info["duration_s"] = du / ts
                    elif t2 == b"trak":
                        info["tracks"].append(walk_track(p2, q2))

    walk_top(0, len(data))
    return info


# ------------------------------------------------------------ stub builder
def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def build_mp4_stub(w: int, h: int, duration_s: float, fps: float = 24.0,
                   codec: bytes = b"avc1", with_audio: bool = False) -> bytes:
    """Valid ISO-BMFF metadata skeleton (no sample data): enough structure
    for any spec-compliant demuxer to report brand/duration/tracks."""
    ts = 1000
    du = int(round(duration_s * ts))

    def full(ver_flags: int) -> bytes:
        return struct.pack(">I", ver_flags)

    mvhd = _box(b"mvhd", full(0) + struct.pack(">II", 0, 0)
                + struct.pack(">II", ts, du)
                + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                + b"\x00" * 10 + struct.pack(">9I", 0x10000, 0, 0, 0,
                                             0x10000, 0, 0, 0, 0x40000000)
                + b"\x00" * 24 + struct.pack(">I", 3))

    def track(track_id: int, kind: bytes, codec4: bytes,
              tw: int, th: int) -> bytes:
        tkhd = _box(b"tkhd", full(7) + struct.pack(">II", 0, 0)
                    + struct.pack(">I", track_id) + b"\x00" * 4
                    + struct.pack(">I", du) + b"\x00" * 8
                    + struct.pack(">hh", 0, 0) + struct.pack(">h", 0x0100)
                    + b"\x00" * 2
                    + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                                  0, 0, 0x40000000)
                    + struct.pack(">II", tw << 16, th << 16))
        mdhd = _box(b"mdhd", full(0) + struct.pack(">II", 0, 0)
                    + struct.pack(">II", ts, du)
                    + struct.pack(">HH", 0x55C4, 0))
        hdlr = _box(b"hdlr", full(0) + b"\x00" * 4 + kind
                    + b"\x00" * 12 + b"stub\x00")
        if kind == b"vide":
            entry = _box(codec4, b"\x00" * 6 + struct.pack(">H", 1)
                         + b"\x00" * 16 + struct.pack(">HH", tw, th)
                         + struct.pack(">II", 0x480000, 0x480000)
                         + b"\x00" * 4 + struct.pack(">H", 1)
                         + b"\x00" * 32 + struct.pack(">Hh", 24, -1))
        else:
            entry = _box(codec4, b"\x00" * 6 + struct.pack(">H", 1)
                         + b"\x00" * 8 + struct.pack(">HH", 2, 16)
                         + b"\x00" * 4 + struct.pack(">I", 44100 << 16))
        stsd = _box(b"stsd", full(0) + struct.pack(">I", 1) + entry)
        stbl = _box(b"stbl", stsd
                    + _box(b"stts", full(0) + struct.pack(">I", 0))
                    + _box(b"stsc", full(0) + struct.pack(">I", 0))
                    + _box(b"stsz", full(0) + struct.pack(">II", 0, 0))
                    + _box(b"stco", full(0) + struct.pack(">I", 0)))
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    traks = track(1, b"vide", codec, w, h)
    if with_audio:
        traks += track(2, b"soun", b"mp4a", 0, 0)
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov + _box(b"mdat", b"")


def heif_info(data: bytes) -> dict:
    """AVIF/HEIC (ISO-BMFF image) metadata: brand + primary image
    dimensions from the ``meta/iprp/ipco/ispe`` property box.  Payload
    (AV1/HEVC intra) has no decoder here — probe-only, same contract as
    :func:`parse_mp4`."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF blob")
    brand = data[8:12].decode("latin1")
    w = h = 0

    def walk(pos, end):
        nonlocal w, h
        for typ, p, q in _iter_boxes(data, pos, end):
            if typ == b"meta":
                walk(p + 4, q)  # FullBox: skip version/flags
            elif typ in (b"iprp", b"ipco"):
                walk(p, q)
            elif typ == b"ispe" and q - p >= 12:
                iw, ih = struct.unpack(">II", data[p + 4:p + 12])
                if w == 0:  # first ispe = primary item
                    w, h = iw, ih

    walk(0, len(data))
    return {"brand": brand, "w": w, "h": h}


def build_heif_stub(w: int, h: int, brand: bytes = b"avif") -> bytes:
    """Minimal valid AVIF/HEIC metadata skeleton (ftyp + meta/iprp/ipco/
    ispe), payload-free — exercises the probe without encoded media."""
    ispe = _box(b"ispe", struct.pack(">I", 0) + struct.pack(">II", w, h))
    ipco = _box(b"ipco", ispe)
    iprp = _box(b"iprp", ipco)
    hdlr = _box(b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"pict"
                + b"\x00" * 12 + b"stub\x00")
    meta = _box(b"meta", struct.pack(">I", 0) + hdlr + iprp)
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")
    return ftyp + meta + _box(b"mdat", b"")
