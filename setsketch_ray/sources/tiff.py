"""Baseline TIFF codec, pure Python/NumPy.

Decoder covers the baseline-TIFF shapes that dominate scanned/scientific
corpora: II/MM byte orders, strip-organized chunky (PlanarConfig=1)
images, Compression 1 (none), 5 (TIFF-LZW: MSB-first codes with the
early-change rule — NOT the GIF LZW variant) and 32773 (PackBits),
Photometric 0/1 (grayscale, incl. white-is-zero inversion), 2 (RGB,
alpha extra sample dropped) and 3 (palette via the 16-bit ColorMap),
8-bit samples, optional Predictor 2 (horizontal differencing).  Tiled,
16-bit, planar and JPEG-in-TIFF variants raise ``NotImplementedError``
loudly.

Encoder writes a minimal single-strip uncompressed little-endian RGB
TIFF (lossless round trips for tests/corpora).
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}


def _read_ifd_value(data: bytes, endian: str, typ: int, count: int,
                    raw: bytes):
    size = _TYPE_SIZES.get(typ, 1) * count
    if size > 4:
        (off,) = struct.unpack(endian + "I", raw)
        buf = data[off:off + size]
    else:
        buf = raw[:size]
    if typ == 3:
        return list(struct.unpack(endian + "H" * count, buf))
    if typ == 4:
        return list(struct.unpack(endian + "I" * count, buf))
    if typ == 1:
        return list(buf)
    return buf


def _unpackbits_decode(src: bytes, expect: int) -> bytes:
    """PackBits (Apple RLE) per the TIFF spec."""
    out = bytearray()
    i = 0
    n = len(src)
    while i < n and len(out) < expect:
        b = src[i]
        i += 1
        if b < 128:
            out += src[i:i + b + 1]
            i += b + 1
        elif b > 128:
            out += bytes([src[i]]) * (257 - b)
            i += 1
        # 128: no-op
    return bytes(out[:expect])


def _lzw_decode(src: bytes, expect: int) -> bytes:
    """TIFF-variant LZW: 8-bit data, MSB-first code packing, Clear=256,
    EOI=257, and the EARLY-CHANGE rule (code width bumps one code before
    the table fills)."""
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
    prev: bytes | None = None
    for byte in src:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # Clear
                reset()
                prev = None
                continue
            if code == 257:  # EOI
                return bytes(out[:expect])
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table.append(prev + entry[:1])
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            else:
                raise ValueError("TIFF LZW: invalid code")
            out += entry
            prev = entry
            # early change: width grows when next_code == 2^width - 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            if len(out) >= expect:
                return bytes(out[:expect])
    return bytes(out[:expect])


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode a baseline TIFF to (h, w, 3) uint8 (first IFD only)."""
    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack(endian + "I", data[4:8])
    (n_entries,) = struct.unpack(endian + "H", data[ifd_off:ifd_off + 2])
    tags = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, typ = struct.unpack(endian + "HH", data[e:e + 4])
        (count,) = struct.unpack(endian + "I", data[e + 4:e + 8])
        tags[tag] = _read_ifd_value(data, endian, typ, count,
                                    data[e + 8:e + 12])

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            return default
        return v[0] if isinstance(v, list) else v

    w = int(one(256))
    h = int(one(257))
    bps = tags.get(258, [8])
    if any(int(b) != 8 for b in bps):
        raise NotImplementedError(f"TIFF bits-per-sample {bps}")
    comp = int(one(259, 1))
    photo = int(one(262, 1))
    spp = int(one(277, 1))
    rows_per_strip = int(one(278, h))
    planar = int(one(284, 1))
    predictor = int(one(317, 1))
    if planar != 1:
        raise NotImplementedError("TIFF planar configuration 2")
    if 322 in tags or 324 in tags:
        raise NotImplementedError("tiled TIFF")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp}")
    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None:
        raise ValueError("TIFF without strip offsets/counts")
    raw = bytearray()
    remaining_rows = h
    for off, cnt in zip(offsets, counts):
        strip_rows = min(rows_per_strip, remaining_rows)
        expect = strip_rows * w * spp
        chunk = bytes(data[off:off + cnt])
        if comp == 1:
            raw += chunk[:expect]
        elif comp == 5:
            raw += _lzw_decode(chunk, expect)
        else:
            raw += _unpackbits_decode(chunk, expect)
        remaining_rows -= strip_rows
    a = np.frombuffer(bytes(raw), np.uint8, count=h * w * spp) \
        .reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing: cumulative sum mod 256 per row/sample
        a = (np.cumsum(a.astype(np.int64), axis=1) % 256).astype(np.uint8)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if photo == 3:  # palette via 16-bit ColorMap (3 * 2^bps entries)
        cmap = tags.get(320)
        if cmap is None:
            raise ValueError("palette TIFF without ColorMap")
        cm = np.array(cmap, np.uint32).reshape(3, -1)
        lut = (cm >> 8).astype(np.uint8).T  # 16-bit -> 8-bit
        return np.ascontiguousarray(lut[a[:, :, 0]])
    if photo in (0, 1):
        g = a[:, :, 0]
        if photo == 0:  # white-is-zero
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with <3 samples")
        return np.ascontiguousarray(a[:, :, :3])  # extra samples dropped
    raise NotImplementedError(f"TIFF photometric {photo}")


def encode_tiff(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> minimal single-strip uncompressed LE TIFF."""
    h, w, _ = pixels.shape
    body = np.ascontiguousarray(pixels).tobytes()

    def short(v):
        return struct.pack("<HH", v, 0)

    # layout: header(8) + pixel strip + bps array(6) + IFD
    strip_off = 8
    bps_off = strip_off + len(body)
    ifd_off = bps_off + 6
    entries = [
        (256, 4, 1, struct.pack("<I", w)),
        (257, 4, 1, struct.pack("<I", h)),
        (258, 3, 3, struct.pack("<I", bps_off)),
        (259, 3, 1, short(1)),
        (262, 3, 1, short(2)),
        (273, 4, 1, struct.pack("<I", strip_off)),
        (277, 3, 1, short(3)),
        (278, 4, 1, struct.pack("<I", h)),
        (279, 4, 1, struct.pack("<I", len(body))),
        (284, 3, 1, short(1)),
    ]
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += body
    out += struct.pack("<HHH", 8, 8, 8)
    out += struct.pack("<H", len(entries))
    for tag, typ, count, raw in entries:
        out += struct.pack("<HHI", tag, typ, count) + raw
    out += struct.pack("<I", 0)  # next IFD
    return bytes(out)


def tiff_info(data: bytes) -> dict:
    """Header probe: dims/compression/photometric without strip decode."""
    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack(endian + "I", data[4:8])
    (n,) = struct.unpack(endian + "H", data[ifd_off:ifd_off + 2])
    vals = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        tag, typ = struct.unpack(endian + "HH", data[e:e + 4])
        (count,) = struct.unpack(endian + "I", data[e + 4:e + 8])
        if tag in (256, 257, 259, 262):
            v = _read_ifd_value(data, endian, typ, count, data[e + 8:e + 12])
            vals[tag] = v[0] if isinstance(v, list) else v
    return {"w": int(vals.get(256, 0)), "h": int(vals.get(257, 0)),
            "compression": int(vals.get(259, 1)),
            "photometric": int(vals.get(262, 1))}
