"""Exif APP1 metadata: build, inject into JPEG, and probe back.

Exif (CIPA DC-008 / JEITA CP-3451, public spec) stores camera metadata as
a TIFF IFD structure inside a JPEG APP1 segment tagged ``Exif\\0\\0``.
This module implements the metadata path only — a generic little/big-endian
IFD builder (IFD0 + the 0x8769 Exif sub-IFD, inline values <= 4 bytes,
pointer values in a trailing data area) and a segment-walking prober that
reuses ``sources/tiff._read_ifd_value`` for value decoding (same IFD wire
format; TIFF is the container Exif borrowed).  No pixel decode anywhere —
this is the filter/catalog shape: at 100 TB you read 64 KB heads, never
payloads.

Tags covered (the interoperability baseline set):
  IFD0:  0x010F Make (ASCII), 0x0110 Model (ASCII), 0x0112 Orientation
         (SHORT), 0x011A XResolution (RATIONAL), 0x0132 DateTime (ASCII),
         0x8769 ExifIFDPointer (LONG)
  Exif:  0x8827 ISOSpeedRatings (SHORT), 0x9003 DateTimeOriginal (ASCII)
"""

from __future__ import annotations

import struct

from .tiff import _read_ifd_value

_ASCII = 2
_SHORT = 3
_LONG = 4
_RATIONAL = 5

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_XRES = 0x011A
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_ISO = 0x8827
TAG_DATETIME_ORIG = 0x9003


def _pack_entries(entries, endian: str, data_start: int):
    """entries: list of (tag, type, count, payload_bytes).  Returns
    (ifd_bytes_without_next_ptr, deferred_data_bytes, next_data_start).
    Values <= 4 bytes inline (zero-padded right); larger values go to the
    data area at ``data_start``."""
    out = [struct.pack(endian + "H", len(entries))]
    deferred = bytearray()
    for tag, typ, count, payload in entries:
        out.append(struct.pack(endian + "HHI", tag, typ, count))
        if len(payload) <= 4:
            out.append(payload.ljust(4, b"\x00"))
        else:
            out.append(struct.pack(endian + "I", data_start + len(deferred)))
            deferred += payload
    return b"".join(out), bytes(deferred), data_start + len(deferred)


def build_exif_app1(make: str, model: str, orientation: int,
                    xres: tuple, datetime: str, iso: int,
                    datetime_original: str, endian: str = "<") -> bytes:
    """Build the full APP1 payload (``Exif\\0\\0`` + TIFF structure).
    ``endian`` is "<" (II) or ">" (MM).  ASCII values carry the spec's
    trailing NUL; short ASCII/SHORT values exercise the inline path,
    longer ones the pointer path."""
    mk = make.encode() + b"\x00"
    md = model.encode() + b"\x00"
    dt = datetime.encode() + b"\x00"
    dto = datetime_original.encode() + b"\x00"

    ifd0_entries = [
        (TAG_MAKE, _ASCII, len(mk), mk),
        (TAG_MODEL, _ASCII, len(md), md),
        (TAG_ORIENTATION, _SHORT, 1, struct.pack(endian + "H", orientation)),
        (TAG_XRES, _RATIONAL, 1,
         struct.pack(endian + "II", xres[0], xres[1])),
        (TAG_DATETIME, _ASCII, len(dt), dt),
        (TAG_EXIF_IFD, _LONG, 1, b""),  # patched below
    ]
    exif_entries = [
        (TAG_ISO, _SHORT, 1, struct.pack(endian + "H", iso)),
        (TAG_DATETIME_ORIG, _ASCII, len(dto), dto),
    ]

    ifd0_size = 2 + 12 * len(ifd0_entries) + 4
    exif_size = 2 + 12 * len(exif_entries) + 4
    ifd0_off = 8
    exif_off = ifd0_off + ifd0_size
    data_start = exif_off + exif_size

    ifd0_entries[-1] = (TAG_EXIF_IFD, _LONG, 1,
                        struct.pack(endian + "I", exif_off))
    ifd0, d0, nxt = _pack_entries(ifd0_entries, endian, data_start)
    exif, d1, _ = _pack_entries(exif_entries, endian, nxt)

    hdr = b"II*\x00" if endian == "<" else b"MM\x00*"
    tiff = hdr + struct.pack(endian + "I", ifd0_off) + \
        ifd0 + struct.pack(endian + "I", 0) + \
        exif + struct.pack(endian + "I", 0) + d0 + d1
    return b"Exif\x00\x00" + tiff


def inject_app1(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Insert an APP1 segment immediately after SOI (the Exif placement
    rule).  Pure byte splice — the entropy stream is untouched."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    seg = b"\xff\xe1" + struct.pack(">H", len(app1_payload) + 2) + \
        app1_payload
    return jpeg[:2] + seg + jpeg[2:]


def _walk_ifd(data: bytes, endian: str, off: int) -> dict:
    (n,) = struct.unpack(endian + "H", data[off:off + 2])
    tags = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ = struct.unpack(endian + "HH", data[e:e + 4])
        (count,) = struct.unpack(endian + "I", data[e + 4:e + 8])
        tags[tag] = _read_ifd_value(data, endian, typ, count,
                                    data[e + 8:e + 12])
    return tags


def _ascii(v) -> str:
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).split(b"\x00", 1)[0].decode("ascii", "replace")
    if isinstance(v, list):  # inline type-1 path returns byte ints
        return bytes(v).split(b"\x00", 1)[0].decode("ascii", "replace")
    return str(v)


def exif_info(jpeg: bytes) -> dict:
    """Walk JPEG segments for the Exif APP1 and parse IFD0 + Exif sub-IFD.
    Returns {} when no Exif APP1 exists.  Never decodes entropy data —
    the walk stops at SOS."""
    if jpeg[:2] != b"\xff\xd8":
        return {}
    pos = 2
    payload = None
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            break
        marker = jpeg[pos + 1]
        if marker == 0xDA:  # SOS — entropy follows, metadata is over
            break
        (seglen,) = struct.unpack(">H", jpeg[pos + 2:pos + 4])
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == b"Exif\x00\x00":
            payload = jpeg[pos + 10:pos + 2 + seglen]
            break
        pos += 2 + seglen
    if payload is None:
        return {}
    if payload[:4] == b"II*\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00*":
        endian = ">"
    else:
        return {}
    (ifd0_off,) = struct.unpack(endian + "I", payload[4:8])
    tags = _walk_ifd(payload, endian, ifd0_off)
    out = {
        "endian": "II" if endian == "<" else "MM",
        "make": _ascii(tags.get(TAG_MAKE, b"")),
        "model": _ascii(tags.get(TAG_MODEL, b"")),
        "orientation": int(tags[TAG_ORIENTATION][0])
        if TAG_ORIENTATION in tags else 0,
        "n_tags0": len(tags),
    }
    if TAG_XRES in tags:
        raw = tags[TAG_XRES]
        num, den = struct.unpack(endian + "II", bytes(raw)[:8])
        out["xres_num"], out["xres_den"] = int(num), int(den)
    else:
        out["xres_num"] = out["xres_den"] = 0
    out["datetime"] = _ascii(tags.get(TAG_DATETIME, b""))
    if TAG_EXIF_IFD in tags:
        sub = _walk_ifd(payload, endian, int(tags[TAG_EXIF_IFD][0]))
        out["iso"] = int(sub[TAG_ISO][0]) if TAG_ISO in sub else 0
        out["datetime_original"] = _ascii(sub.get(TAG_DATETIME_ORIG, b""))
    else:
        out["iso"] = 0
        out["datetime_original"] = ""
    return out
