"""Baseline-TIFF decoder coverage: hand-built files whose compression /
prediction / layout are produced by INDEPENDENT test-side encoders (no
codec bug cancellation)."""

import struct

import numpy as np
import pytest

from setsketch_ray.sources.tiff import decode_tiff, encode_tiff, tiff_info


def _lzw_encode_literals(data: bytes) -> bytes:
    """Independent TIFF-LZW writer: Clear + literal codes + EOI, MSB-first
    packing with the EARLY-CHANGE width rule.  Literal-only streams still
    grow the decoder's table (one entry per code after the first), so
    width bumps are exercised on inputs > ~253 bytes."""
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    width = 9
    next_code = 258
    put(256, width)  # Clear
    first = True
    for b in data:
        put(b, width)
        if first:
            first = False  # decoder adds NO entry for the first code
        else:
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        if next_code == 4093:  # stay clear of table exhaustion
            put(256, width)
            width, next_code, first = 9, 258, True
    put(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Independent PackBits writer: runs >=3 as replicates, else literals."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while j < n and (j - i) < 128:
                r = 1
                while j + r < n and data[j + r] == data[j] and r < 3:
                    r += 1
                if r >= 3:
                    break
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


def _build_tiff(strips, w, h, spp, photo, comp, endian="<",
                rows_per_strip=None, predictor=1, colormap=None):
    """Hand-build a TIFF with explicit strips (already compressed)."""
    e = endian
    hdr_magic = b"II*\x00" if e == "<" else b"MM\x00*"
    rows_per_strip = rows_per_strip or h
    body = b"".join(strips)
    offs, cnts, pos = [], [], 8
    for sdata in strips:
        offs.append(pos)
        cnts.append(len(sdata))
        pos += len(sdata)
    extra = bytearray()
    extra_off = pos

    def arr(fmt_char, values, size_each):
        nonlocal extra, extra_off
        raw = b"".join(struct.pack(e + fmt_char, v) for v in values)
        if len(raw) <= 4:
            return raw.ljust(4, b"\x00")
        off = extra_off
        extra += raw
        extra_off += len(raw)
        return struct.pack(e + "I", off)

    entries = [
        (256, 4, 1, struct.pack(e + "I", w)),
        (257, 4, 1, struct.pack(e + "I", h)),
        (258, 3, spp, arr("H", [8] * spp, 2)),
        (259, 3, 1, struct.pack(e + "H", comp).ljust(4, b"\x00")),
        (262, 3, 1, struct.pack(e + "H", photo).ljust(4, b"\x00")),
        (273, 4, len(offs), arr("I", offs, 4)),
        (277, 3, 1, struct.pack(e + "H", spp).ljust(4, b"\x00")),
        (278, 4, 1, struct.pack(e + "I", rows_per_strip)),
        (279, 4, len(cnts), arr("I", cnts, 4)),
        (284, 3, 1, struct.pack(e + "H", 1).ljust(4, b"\x00")),
    ]
    if predictor != 1:
        entries.append((317, 3, 1,
                        struct.pack(e + "H", predictor).ljust(4, b"\x00")))
    if colormap is not None:
        entries.append((320, 3, len(colormap), arr("H", colormap, 2)))
    entries.sort()
    ifd_off = extra_off
    out = bytearray()
    out += hdr_magic + struct.pack(e + "I", ifd_off)
    out += body
    out += extra
    out += struct.pack(e + "H", len(entries))
    for tag, typ, count, raw in entries:
        out += struct.pack(e + "HHI", tag, typ, count) + raw
    out += struct.pack(e + "I", 0)
    return bytes(out)


def test_tiff_roundtrip_and_info():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    blob = encode_tiff(img)
    assert np.array_equal(decode_tiff(blob), img)
    assert tiff_info(blob) == {"w": 21, "h": 13, "compression": 1,
                               "photometric": 2}


def test_tiff_lzw_and_predictor():
    rng = np.random.default_rng(5)
    # smooth-ish content so predictor-2 residuals vary
    img = (np.cumsum(rng.integers(-4, 5, (9, 300, 3)), axis=1) % 256) \
        .astype(np.uint8)
    h, w, _ = img.shape
    # forward predictor 2 (independent): residual row diffs mod 256
    res = img.astype(np.int64)
    res[:, 1:] = (res[:, 1:] - res[:, :-1]) % 256
    res = res.astype(np.uint8)
    strip = _lzw_encode_literals(res.tobytes())
    blob = _build_tiff([strip], w, h, 3, 2, 5, predictor=2)
    assert np.array_equal(decode_tiff(blob), img)


def test_tiff_packbits_multistrip_bigendian():
    rng = np.random.default_rng(7)
    img = np.repeat(rng.integers(0, 256, (8, 6, 3), dtype=np.uint8),
                    3, axis=1)  # runs for PackBits
    h, w, _ = img.shape
    rows_per_strip = 3
    strips = []
    for y0 in range(0, h, rows_per_strip):
        chunk = img[y0:y0 + rows_per_strip].tobytes()
        strips.append(_packbits_encode(chunk))
    blob = _build_tiff(strips, w, h, 3, 2, 32773, endian=">",
                       rows_per_strip=rows_per_strip)
    assert np.array_equal(decode_tiff(blob), img)


def test_tiff_gray_and_palette():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (7, 11), dtype=np.uint8)
    blob = _build_tiff([g.tobytes()], 11, 7, 1, 1, 1)
    assert np.array_equal(decode_tiff(blob), np.repeat(g[:, :, None], 3, 2))
    # white-is-zero inverts
    blob = _build_tiff([g.tobytes()], 11, 7, 1, 0, 1)
    assert np.array_equal(decode_tiff(blob),
                          np.repeat((255 - g)[:, :, None], 3, 2))
    # palette: 16-bit colormap, high byte is the 8-bit channel
    idx = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    pal8 = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    cmap = list((pal8[:, 0].astype(np.uint32) << 8)) \
        + list((pal8[:, 1].astype(np.uint32) << 8)) \
        + list((pal8[:, 2].astype(np.uint32) << 8))
    blob = _build_tiff([idx.tobytes()], 9, 5, 1, 3, 1,
                       colormap=[int(v) for v in cmap])
    assert np.array_equal(decode_tiff(blob), pal8[idx])


def test_tiff_gated_variants_and_dispatch():
    from setsketch_ray.sources.codec import decode_image, encode_image

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    blob = encode_image(img, "tiff")
    assert np.array_equal(decode_image(blob, "tiff"), img)
    assert np.array_equal(decode_image(blob, ""), img)  # magic sniff
    # unsupported compression (JPEG-in-TIFF) refuses loudly
    g = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    bad = _build_tiff([g.tobytes()], 4, 4, 1, 1, 7)
    with pytest.raises(NotImplementedError):
        decode_tiff(bad)


def test_tiff_property_sweep():
    """Deterministic random sweep: dims x endian x compression x strip
    layout all reconstruct exactly through independent forward encoders."""
    rng = np.random.default_rng(21)
    for trial in range(10):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        endian = "<" if trial % 2 else ">"
        comp = (1, 5, 32773)[trial % 3]
        rows_per_strip = int(rng.integers(1, h + 1))
        strips = []
        for y0 in range(0, h, rows_per_strip):
            chunk = img[y0:y0 + rows_per_strip].tobytes()
            if comp == 5:
                strips.append(_lzw_encode_literals(chunk))
            elif comp == 32773:
                strips.append(_packbits_encode(chunk))
            else:
                strips.append(chunk)
        blob = _build_tiff(strips, w, h, 3, 2, comp, endian=endian,
                           rows_per_strip=rows_per_strip)
        assert np.array_equal(decode_tiff(blob), img), \
            (trial, h, w, comp, endian, rows_per_strip)
