"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure NumPy — real-world codec
coverage without PIL/libjpeg (neither exists in this environment).

* :func:`encode_jpeg` — baseline sequential DCT, 4:4:4 sampling, standard
  Annex-K quantization + Huffman tables, quality scaling per the IJG rule.
  Output is a format-conformant JFIF file any real decoder reads.
* :func:`decode_jpeg` — sequential (SOF0/SOF1) AND progressive (SOF2)
  decoder: 4:4:4 / 4:2:2 / 4:2:0 and grayscale sampling, restart markers
  (DRI/RSTn), multiple DQT/DHT segments.  Progressive covers the full
  T.81 Annex G Huffman procedure: spectral selection, successive
  approximation (DC + AC first and refinement scans), EOB runs, and
  per-scan restart intervals — the layout libjpeg's standard progression
  script emits, which dominates real-world progressive files.  Arithmetic
  coding and hierarchical/lossless SOFs raise ``NotImplementedError``
  (honestly gated, same contract as sources/codec.py).
* ``encode_jpeg(..., progressive=True)`` writes a spectral-selection +
  successive-approximation progressive file (libjpeg-style 10-scan
  script); because successive approximation transmits the quantized
  coefficients losslessly, its decode is asserted BIT-IDENTICAL to the
  baseline encode/decode of the same pixels in tests.

Reference semantics: the reference repo has no image codecs (its inputs are
synthetic element streams); this exists for the pipeline brief's image+
caption corpus (BASELINE.json input_hint: decoded-pixel PSNR >= 40 dB for
lossy formats — asserted in tests/test_image_ops.py).

The DCT/IDCT, quantization and color transforms are vectorized over all
8x8 blocks at once (einsum); only the entropy coder walks the bit-stream
serially, which is inherent to Huffman decoding.  Decode cost is therefore
O(pixels) NumPy + O(coefficients) Python — acceptable for the gated
foreign-format path (the engine's own corpora use png/ljpg, which are fully
vectorized).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables
# Annex K.1 / K.2 base quantization tables (luminance, chrominance)
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# zig-zag order: _ZZ[k] = raster index of the k-th zig-zag coefficient
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_ZZ_INV = np.argsort(_ZZ)

# Annex K.3 standard Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# Huffman table for ALL progressive AC scans (encoder side): every symbol a
# progressive scan can emit — EOBn (r<<4, r 0..14), ZRL (0xF0), and
# (run<<4)|size for size 1..10 — at a flat 8-bit code length (176 codes,
# Kraft 176/256; canonical, so any conformant decoder reads it).  Flat codes
# trade compression for simplicity; this encoder exists to produce
# spec-conformant progressive fixtures/corpora, not to rival libjpeg's
# optimized tables.
_AC_PROG = ([0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
            [r << 4 for r in range(15)] + [0xF0]
            + [(r << 4) | s for r in range(16) for s in range(1, 11)])

# 8x8 type-II DCT basis: _DCTM @ block @ _DCTM.T = 2-D DCT coefficients
_k = np.arange(8)
_DCTM = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_DCTM[0] *= 1 / np.sqrt(2)


def _build_code_table(bits, huffval):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DEC_LUT_CACHE: dict[bytes, list] = {}


def _build_decode_lut(bits, huffval):
    """(BITS, HUFFVAL) -> 65536-entry peek table: the next 16 bits of the
    stream index straight to ``(code_length << 8) | symbol`` (0 = invalid
    prefix).  One list lookup replaces the old bit-at-a-time tree walk
    (~6.5k Huffman symbols per 64x64 image); cached by table bytes since a
    corpus shares its DHT segments across files."""
    key = bytes(bits) + bytes(huffval)
    lut = _DEC_LUT_CACHE.get(key)
    if lut is None:
        arr = np.zeros(65536, dtype=np.int32)
        code = 0
        k = 0
        for length in range(1, 17):
            shift = 16 - length
            for _ in range(bits[length - 1]):
                arr[code << shift:(code + 1) << shift] = \
                    (length << 8) | huffval[k]
                code += 1
                k += 1
            code <<= 1
        lut = arr.tolist()  # plain-int list indexing beats ndarray scalars
        _DEC_LUT_CACHE[key] = lut
    return lut


def _quality_scale(q_base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 -> base table, 100 -> all-ones."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (q_base * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (n_blocks, 8, 8), raster order."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)


def _unblockify(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return blocks.reshape(h8 // 8, w8 // 8, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(h8, w8)


def _fdct_quant(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward DCT + quantization over ALL blocks at once -> int32 zig-zag
    coefficients (n_blocks, 64)."""
    coef = np.einsum("ij,njk,lk->nil", _DCTM, blocks - 128.0, _DCTM)
    quant = np.round(coef / q.reshape(8, 8)).astype(np.int32)
    return quant.reshape(-1, 64)[:, _ZZ]


def _dequant_idct(zz: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Zig-zag int coefficients (n_blocks, 64) -> pixel blocks (n, 8, 8)."""
    coef = (zz[:, _ZZ_INV] * q[_ZZ_INV]).reshape(-1, 8, 8).astype(np.float64)
    pix = np.einsum("ji,njk,kl->nil", _DCTM, coef, _DCTM) + 128.0
    return np.clip(np.round(pix), 0, 255).astype(np.uint8)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81 F.1.2.3


def _magnitude(v: int) -> tuple[int, int]:
    """Value -> (size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw, blk, pred_ci, dc_tab, ac_tab):
    """Entropy-code one 64-coef zig-zag block; returns the new DC pred."""
    dc = int(blk[0])
    size, bits = _magnitude(dc - pred_ci)
    code, length = dc_tab[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = np.flatnonzero(blk[1:])
    end = (last_nz[-1] + 2) if len(last_nz) else 1
    for k in range(1, end):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_tab[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if end < 64:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return dc


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a baseline or progressive JFIF JPEG.

    ``subsampling``: ``"444"`` (no chroma subsampling, 1-block MCUs),
    ``"422"`` (horizontal 2x1 chroma downsampling, 16x8 MCUs — the digital-
    camera layout) or ``"420"`` (2x2, 16x16 MCUs — the layout that
    dominates real-world JPEGs).  ``progressive=True`` emits SOF2 with the
    libjpeg-style 10-scan spectral-selection + successive-approximation
    script; the quantized coefficients are transmitted losslessly, so the
    decoded pixels are bit-identical to the baseline encoding's.

    A 2-D array (or (h, w, 1)) encodes as single-component grayscale —
    progressive grayscale uses non-interleaved DC scans (ns=1), the layout
    real grayscale progressive files carry."""
    if pixels.ndim == 3 and pixels.shape[2] == 1:
        pixels = pixels[..., 0]
    if pixels.ndim == 2:
        return _encode_gray(pixels, quality, restart_interval, progressive)
    h, w = pixels.shape[:2]
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_jpeg needs (h, w, 3) RGB or (h, w) gray")
    samp = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}.get(subsampling)
    if samp is None:
        raise ValueError(
            f"subsampling {subsampling!r}: use '444', '422' or '420'")
    yh, yv = samp
    qy = _quality_scale(_QY, quality)
    qc = _quality_scale(_QC, quality)

    # pad to MCU multiples by edge replication
    hp = (h + 8 * yv - 1) // (8 * yv) * (8 * yv)
    wp = (w + 8 * yh - 1) // (8 * yh) * (8 * yh)
    pad = np.pad(pixels, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(pad)
    yplane = ycc[..., 0]
    if yh == 1 and yv == 1:
        chroma = [ycc[..., 1], ycc[..., 2]]
    else:  # box-mean chroma downsample (yv x yh)
        chroma = [ycc[..., ci].reshape(hp // yv, yv, wp // yh, yh)
                  .mean(axis=(1, 3)) for ci in (1, 2)]
    # qy/qc are raster-order 8x8 tables (_QY is Annex K.1 as printed);
    # _fdct_quant consumes raster order, the DQT writer zig-zags at emit
    ycoef = _fdct_quant(_blockify(yplane), qy)
    ccoef = [_fdct_quant(_blockify(c), qc) for c in chroma]

    if progressive:
        return _encode_progressive(h, w, hp, wp, yh, yv, qy, qc, ycoef,
                                   ccoef, restart_interval)

    dc_lum = _build_code_table(*_DC_LUM)
    ac_lum = _build_code_table(*_AC_LUM)
    dc_chr = _build_code_table(*_DC_CHR)
    ac_chr = _build_code_table(*_AC_CHR)

    bw = _BitWriter()
    pred = [0, 0, 0]
    mcu_i = 0
    rst_n = 0

    def maybe_rst():
        nonlocal mcu_i, rst_n, pred
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            bw.flush()  # byte-align (1-padded)
            bw.out += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) % 8
            pred = [0, 0, 0]
        mcu_i += 1

    ybx = wp // 8  # Y blocks per row
    cbx = wp // (8 * yh)
    for my in range(hp // (8 * yv)):
        for mx in range(wp // (8 * yh)):
            maybe_rst()
            for v in range(yv):
                for hh in range(yh):
                    blk = ycoef[(yv * my + v) * ybx + yh * mx + hh]
                    pred[0] = _encode_block(bw, blk, pred[0],
                                            dc_lum, ac_lum)
            for ci in range(2):
                blk = ccoef[ci][my * cbx + mx]
                pred[ci + 1] = _encode_block(bw, blk, pred[ci + 1],
                                             dc_chr, ac_chr)
    bw.flush()

    out = bytearray()
    out += b"\xFF\xD8"  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in q[_ZZ])
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    ysamp = (yh << 4) | yv
    for cid, cs, tq in ((1, ysamp, 0), (2, 0x11, 1), (3, 0x11, 1)):
        out += bytes([cid, cs, tq])
    for cls, tid, (bits, vals) in ((0, 0, _DC_LUM), (1, 0, _AC_LUM),
                                   (0, 1, _DC_CHR), (1, 1, _AC_CHR)):
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals),
                                         (cls << 4) | tid) \
            + bytes(bits) + bytes(vals)
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tabs])
    out += b"\x00\x3F\x00"  # Ss=0 Se=63 Ah/Al=0
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# libjpeg-style progression script: (component indices, Ss, Se, Ah, Al).
# DC coarse (interleaved) -> coarse AC bands -> AC refinements -> DC refine.
# Every coefficient bit is eventually transmitted (ends at Al=0 for all
# bands), so the decode is exact w.r.t. the quantized coefficients.
_PROG_SCRIPT = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _enc_dc_scan(bw, comp_blocks, mcu_order, dc_tabs, ah, al,
                 restart_interval):
    """Interleaved DC scan: first pass (Ah=0) codes (dc >> Al) diffs, the
    refinement pass sends bit Al of each DC coefficient.  ``mcu_order`` is a
    list of MCUs, each a list of (comp_index, block_index)."""
    pred = [0, 0, 0]
    rst_n = 0
    for unit, mcu in enumerate(mcu_order):
        if restart_interval and unit and unit % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) % 8
            pred = [0, 0, 0]
        for ci, bi in mcu:
            dc = int(comp_blocks[ci][bi][0]) >> al  # arithmetic shift (T.81)
            if ah == 0:
                diff = dc - pred[ci]
                pred[ci] = dc
                size, bits = _magnitude(diff)
                code, length = dc_tabs[ci][size]
                bw.write(code, length)
                if size:
                    bw.write(bits, size)
            else:
                bw.write(dc & 1, 1)


def _enc_ac_scan(bw, blocks, ac_tab, ss, se, ah, al, restart_interval):
    """Non-interleaved AC scan over one component's (non-padded) blocks.
    Ah=0: spectral-selection first pass with point transform |v| >> Al and
    EOB-run accumulation.  Ah>0: successive-approximation refinement with
    positionally-buffered correction bits (T.81 G.1.2.3 flow)."""
    eobrun = 0
    pend: list[int] = []  # correction bits buffered across an EOB run
    rst_n = 0

    def flush_eob():
        nonlocal eobrun, pend
        if eobrun:
            r = eobrun.bit_length() - 1
            code, length = ac_tab[r << 4]
            bw.write(code, length)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0
        for b in pend:
            bw.write(b, 1)
        pend = []

    for unit, blk in enumerate(blocks):
        if restart_interval and unit and unit % restart_interval == 0:
            flush_eob()
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) % 8
        if ah == 0:
            r = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    code, length = ac_tab[0xF0]
                    bw.write(code, length)
                    r -= 16
                size, bits = _magnitude(t if v > 0 else -t)
                code, length = ac_tab[(r << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                r = 0
            if r:
                eobrun += 1
                if eobrun == 32767:
                    flush_eob()
        else:
            # last newly-nonzero position; runs beyond it fold into the EOB
            eobpos = ss - 1
            for k in range(ss, se + 1):
                if (abs(int(blk[k])) >> al) == 1:
                    eobpos = k
            br_bits: list[int] = []
            r = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobpos:
                    flush_eob()
                    code, length = ac_tab[0xF0]
                    bw.write(code, length)
                    for b in br_bits:
                        bw.write(b, 1)
                    br_bits = []
                    r -= 16
                if t > 1:  # history-nonzero: emit its next magnitude bit
                    br_bits.append(t & 1)
                    continue
                flush_eob()
                code, length = ac_tab[(r << 4) | 1]
                bw.write(code, length)
                bw.write(1 if v > 0 else 0, 1)
                for b in br_bits:
                    bw.write(b, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                eobrun += 1
                pend.extend(br_bits)
                if eobrun == 32767:
                    flush_eob()
    flush_eob()


def _encode_progressive(h, w, hp, wp, yh, yv, qy, qc, ycoef, ccoef,
                        restart_interval) -> bytes:
    """Assemble the SOF2 file: shared headers, then the _PROG_SCRIPT scans."""
    comp_blocks = [ycoef, ccoef[0], ccoef[1]]
    cgw = wp // (8 * yh)
    gw = [wp // 8, cgw, cgw]
    # non-padded per-component block grids (non-interleaved scan coverage)
    dims = []
    for ci in range(3):
        cw = (w + yh - 1) // yh if ci else w
        ch = (h + yv - 1) // yv if ci else h
        dims.append(((cw + 7) // 8, (ch + 7) // 8))
    mcu_order = []
    for my in range(hp // (8 * yv)):
        for mx in range(wp // (8 * yh)):
            mcu = [(0, (yv * my + v) * gw[0] + yh * mx + hh)
                   for v in range(yv) for hh in range(yh)]
            mcu += [(1, my * gw[1] + mx), (2, my * gw[2] + mx)]
            mcu_order.append(mcu)

    dc_tabs = [_build_code_table(*_DC_LUM), _build_code_table(*_DC_CHR),
               _build_code_table(*_DC_CHR)]
    ac_prog = _build_code_table(*_AC_PROG)

    out = bytearray()
    out += b"\xFF\xD8"
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in q[_ZZ])
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF2
    ysamp = (yh << 4) | yv
    for cid, cs, tq in ((1, ysamp, 0), (2, 0x11, 1), (3, 0x11, 1)):
        out += bytes([cid, cs, tq])
    for cls, tid, (bits, vals) in ((0, 0, _DC_LUM), (0, 1, _DC_CHR),
                                   (1, 0, _AC_PROG)):
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals),
                                         (cls << 4) | tid) \
            + bytes(bits) + bytes(vals)

    for comps, ss, se, ah, al in _PROG_SCRIPT:
        ns = len(comps)
        out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comps:
            # DC table id: 0 for Y, 1 for chroma; AC table id always 0
            out += bytes([ci + 1, ((0 if ci == 0 else 1) << 4) | 0])
        out += bytes([ss, se, (ah << 4) | al])
        bw = _BitWriter()
        if ss == 0:
            _enc_dc_scan(bw, comp_blocks, mcu_order, dc_tabs, ah, al,
                         restart_interval)
        else:
            ci = comps[0]
            nbx, nby = dims[ci]
            blocks = [comp_blocks[ci][by * gw[ci] + bx]
                      for by in range(nby) for bx in range(nbx)]
            _enc_ac_scan(bw, blocks, ac_prog, ss, se, ah, al,
                         restart_interval)
        bw.flush()
        out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)


def _encode_gray(pixels: np.ndarray, quality: int, restart_interval: int,
                 progressive: bool) -> bytes:
    """Single-component (grayscale) JFIF encode, baseline or progressive.
    Progressive grayscale emits non-interleaved ns=1 DC scans — the layout
    real grayscale progressive files carry (and the decoder path nothing
    else exercises)."""
    h, w = pixels.shape
    q = _quality_scale(_QY, quality)
    hp = (h + 7) // 8 * 8
    wp = (w + 7) // 8 * 8
    pad = np.pad(pixels.astype(np.float64), ((0, hp - h), (0, wp - w)),
                 mode="edge")
    coef = _fdct_quant(_blockify(pad), q)

    out = bytearray()
    out += b"\xFF\xD8"
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xFF\xDB" + struct.pack(">HB", 67, 0) \
        + bytes(int(x) for x in q[_ZZ])
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    sof = 0xC2 if progressive else 0xC0
    out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 11, 8, h, w, 1) \
        + bytes([1, 0x11, 0])
    if progressive:
        for cls, tid, (bits, vals) in ((0, 0, _DC_LUM), (1, 0, _AC_PROG)):
            out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals),
                                             (cls << 4) | tid) \
                + bytes(bits) + bytes(vals)
        dc_tabs = [_build_code_table(*_DC_LUM)]
        ac_prog = _build_code_table(*_AC_PROG)
        blocks = [coef[i] for i in range(coef.shape[0])]
        mcu_order = [[(0, i)] for i in range(coef.shape[0])]
        script = [(0, 0, 0, 1), (1, 5, 0, 2), (6, 63, 0, 2),
                  (1, 63, 2, 1), (0, 0, 1, 0), (1, 63, 1, 0)]
        for ss, se, ah, al in script:
            out += b"\xFF\xDA" + struct.pack(">HB", 8, 1) \
                + bytes([1, 0x00, ss, se, (ah << 4) | al])
            bw = _BitWriter()
            if ss == 0:
                _enc_dc_scan(bw, [coef], mcu_order, dc_tabs, ah, al,
                             restart_interval)
            else:
                _enc_ac_scan(bw, blocks, ac_prog, ss, se, ah, al,
                             restart_interval)
            bw.flush()
            out += bw.out
    else:
        for cls, tid, (bits, vals) in ((0, 0, _DC_LUM), (1, 0, _AC_LUM)):
            out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals),
                                             (cls << 4) | tid) \
                + bytes(bits) + bytes(vals)
        out += b"\xFF\xDA" + struct.pack(">HB", 8, 1) \
            + bytes([1, 0x00]) + b"\x00\x3F\x00"
        bw = _BitWriter()
        dc_t = _build_code_table(*_DC_LUM)
        ac_t = _build_code_table(*_AC_LUM)
        pred = 0
        rst_n = 0
        for i in range(coef.shape[0]):
            if restart_interval and i and i % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                pred = 0
            pred = _encode_block(bw, coef[i], pred, dc_t, ac_t)
        bw.flush()
        out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment (0xFF00 unstuffed,
    RST markers surfaced via ``at_marker``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        # trim consumed high bits so acc stays a machine-word-sized int
        self.acc &= (1 << self.nbits) - 1
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # marker: stop filling, pad with 1s
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()  # fill guarantees >= 25 bits; n <= 16
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def decode_huff(self, lut: list) -> int:
        """Decode one symbol via the 16-bit peek LUT from
        ``_build_decode_lut`` (entry = (length << 8) | symbol, 0 invalid)."""
        if self.nbits < 16:
            self._fill()
        entry = lut[(self.acc >> (self.nbits - 16)) & 0xFFFF]
        if entry == 0:
            raise ValueError("invalid Huffman code")
        self.nbits -= entry >> 8
        return entry & 0xFF

    def sync_to_rst(self):
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected RST marker")


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF JPEG to (h, w, 3) uint8 RGB
    (grayscale files are replicated to 3 channels)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec == 0:
                    q = np.frombuffer(seg[p:p + 64], np.uint8) \
                        .astype(np.int32)
                    p += 64
                else:
                    q = np.frombuffer(seg[p:p + 128], ">u2") \
                        .astype(np.int32)
                    p += 128
                qtables[tid] = q  # zig-zag order as stored
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nval = sum(bits)
                vals = list(seg[p + 17:p + 17 + nval])
                htables[(cls, tid)] = _build_decode_lut(bits, vals)
                p += 17 + nval
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive SOF
            prec, h, w, nc = seg[0], \
                struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "hs": samp >> 4, "vs": samp & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02X} not supported (sequential "
                "and progressive Huffman only)")
        elif marker == 0xDA:  # SOS — entropy data follows
            scomps = []
            ns = seg[0]
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scomps.append({"id": cid, "dc": tabs >> 4, "ac": tabs & 0xF})
            pos += seglen
            if not frame.get("progressive"):
                return _decode_scan(data, pos, frame, scomps, qtables,
                                    htables, restart_interval)
            p = 1 + 2 * ns
            ss, se, ahal = seg[p], seg[p + 1], seg[p + 2]
            _scan_geometry(frame)
            pos = _decode_scan_progressive(
                data, pos, frame, scomps, htables, restart_interval,
                ss, se, ahal >> 4, ahal & 0xF)
            continue
        pos += seglen
    if frame is not None and frame.get("progressive") and "hmax" in frame:
        return _reconstruct(frame, qtables)
    raise ValueError("no scan data found")


def _scan_geometry(frame):
    """Compute (once) the MCU grid, per-component padded block grids and
    coefficient storage, plus the NON-padded block counts (``nbx``/``nby``)
    that non-interleaved progressive scans cover (T.81 A.2.2: a
    non-interleaved scan codes ceil(component samples / 8) blocks, not the
    MCU-padded grid)."""
    if "hmax" in frame:
        return
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcus_x"] = (w + 8 * hmax - 1) // (8 * hmax)
    frame["mcus_y"] = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["blocks_x"] = frame["mcus_x"] * c["hs"]
        c["blocks_y"] = frame["mcus_y"] * c["vs"]
        cw = (w * c["hs"] + hmax - 1) // hmax
        ch = (h * c["vs"] + vmax - 1) // vmax
        c["nbx"] = (cw + 7) // 8
        c["nby"] = (ch + 7) // 8
        c["coef"] = np.zeros((c["blocks_y"] * c["blocks_x"], 64),
                             dtype=np.int32)


def _reconstruct(frame, qtables):
    """Dequantize + IDCT every component and assemble RGB (shared by the
    sequential and progressive paths)."""
    h, w = frame["h"], frame["w"]
    planes = []
    for c in frame["comps"]:
        q = qtables[c["tq"]]
        pix = _dequant_idct(c["coef"], q)
        plane = _unblockify(pix, c["blocks_y"] * 8, c["blocks_x"] * 8)
        ry, rx = frame["vmax"] // c["vs"], frame["hmax"] // c["hs"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = planes[0]
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(np.stack(planes[:3], axis=-1))


def _decode_scan(data, pos, frame, scomps, qtables, htables,
                 restart_interval):
    _scan_geometry(frame)
    comps = frame["comps"]
    mcus_x, mcus_y = frame["mcus_x"], frame["mcus_y"]
    by_id = {c["id"]: c for c in comps}
    for sc in scomps:
        c = by_id[sc["id"]]
        c["dc_tab"] = htables[(0, sc["dc"])]
        c["ac_tab"] = htables[(1, sc["ac"])]

    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.sync_to_rst()
                pred = {c["id"]: 0 for c in comps}
            for sc in scomps:
                c = by_id[sc["id"]]
                for v in range(c["vs"]):
                    for hh in range(c["hs"]):
                        blk = np.zeros(64, dtype=np.int32)
                        size = br.decode_huff(c["dc_tab"])
                        diff = _extend(br.read_bits(size), size)
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(c["ac_tab"])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0xF
                            if k > 63:
                                raise ValueError("AC run past block end")
                            blk[k] = _extend(br.read_bits(size), size)
                            k += 1
                        bx = mx * c["hs"] + hh
                        by = my * c["vs"] + v
                        c["coef"][by * c["blocks_x"] + bx] = blk
            mcu_count += 1

    return _reconstruct(frame, qtables)


# -------------------------------------------------- progressive scan decode
def _dec_ac_first(br, lut, blk, ss, se, al, eobrun):
    """AC spectral-selection first pass for one block (T.81 G.2.2 /
    decode path of :func:`_enc_ac_scan`); returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_huff(lut)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _dec_ac_refine(br, lut, blk, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block.  Every
    nonzero-history coefficient traversed — by a run, a ZRL, or the EOB
    tail — consumes one positional correction bit."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode_huff(lut)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: skip 16 zero-history coefficients
            else:  # s == 1: a coefficient newly nonzero at this precision
                newval = p1 if br.read_bit() else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if br.read_bit() and not (v & p1):
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # refine the band remainder, then count this block
            v = int(blk[k])
            if v != 0:
                if br.read_bit() and not (v & p1):
                    blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan_progressive(data, pos, frame, scomps, htables,
                             restart_interval, ss, se, ah, al):
    """Decode one progressive scan into the frame's coefficient arrays and
    return the stream position of the next marker."""
    by_id = {c["id"]: c for c in frame["comps"]}
    br = _BitReader(data, pos)
    if ss == 0:  # DC scan (Se must be 0)
        first = ah == 0
        luts = {sc["id"]: htables[(0, sc["dc"])] if first else None
                for sc in scomps}
        pred = {sc["id"]: 0 for sc in scomps}

        def dc_block(c, idx, cid):
            row = c["coef"][idx]
            if first:
                size = br.decode_huff(luts[cid])
                pred[cid] += _extend(br.read_bits(size), size)
                row[0] = pred[cid] << al
            elif br.read_bit():
                row[0] = int(row[0]) | (1 << al)

        if len(scomps) > 1:  # interleaved over MCUs
            unit = 0
            for my in range(frame["mcus_y"]):
                for mx in range(frame["mcus_x"]):
                    if restart_interval and unit and \
                            unit % restart_interval == 0:
                        br.sync_to_rst()
                        pred = {sc["id"]: 0 for sc in scomps}
                    for sc in scomps:
                        c = by_id[sc["id"]]
                        for v in range(c["vs"]):
                            for hh in range(c["hs"]):
                                idx = (my * c["vs"] + v) * c["blocks_x"] \
                                    + mx * c["hs"] + hh
                                dc_block(c, idx, sc["id"])
                    unit += 1
        else:  # single-component: non-padded block raster
            c = by_id[scomps[0]["id"]]
            unit = 0
            for by in range(c["nby"]):
                for bx in range(c["nbx"]):
                    if restart_interval and unit and \
                            unit % restart_interval == 0:
                        br.sync_to_rst()
                        pred = {sc["id"]: 0 for sc in scomps}
                    dc_block(c, by * c["blocks_x"] + bx, scomps[0]["id"])
                    unit += 1
    else:  # AC scan: always exactly one component
        if len(scomps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        c = by_id[scomps[0]["id"]]
        lut = htables[(1, scomps[0]["ac"])]
        eobrun = 0
        unit = 0
        for by in range(c["nby"]):
            for bx in range(c["nbx"]):
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    br.sync_to_rst()
                    eobrun = 0
                blk = c["coef"][by * c["blocks_x"] + bx]
                if ah == 0:
                    eobrun = _dec_ac_first(br, lut, blk, ss, se, al, eobrun)
                else:
                    eobrun = _dec_ac_refine(br, lut, blk, ss, se, al, eobrun)
                unit += 1

    # advance to the next marker (skip stuffed 0xFF00 and stray RSTn)
    p = br.pos
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            break
        p += 1
    return p
