"""WebP lossless (VP8L) codec, pure Python/NumPy.

Decoder implements the public VP8L bitstream spec (the WebP Lossless
Bitstream Specification): LSB-first bit reading, simple + normal prefix
codes (code-length codes with 16/17/18 repeats, canonical assignment),
color cache, LZ77 backward references with the 120-entry 2D distance map,
meta prefix codes, and all four transforms (predictor ×14 modes, color
transform, subtract-green, color-indexing incl. sub-byte pixel packing).
Alpha is decoded then dropped (engine-wide (h, w, 3) contract).

Encoder writes a minimal-but-valid VP8L stream: no transforms, no color
cache, single prefix group, flat two-level canonical codes, every pixel a
literal — bit-exact lossless at ~4 B/px (fine for corpora/tests; the
point is the DECODER, which must read anyone's files).

``webp_info`` probes the RIFF container (VP8L lossless, VP8 lossy key
frames, VP8X extended) without payload decode; lossy VP8 payloads remain
honestly undecodable here.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------- bit reader
class _BitReader:
    """LSB-first bit reader over bytes (VP8L convention): rolling 64-bit
    accumulator refilled bytewise (the jpeg.py technique) so prefix-code
    decode can PEEK many bits at once for the LUT fast path."""

    __slots__ = ("data", "byte", "acc", "nbits", "_n")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.acc = 0
        self.nbits = 0
        self._n = len(data)

    def _fill(self, need: int):
        while self.nbits < need:
            if self.byte > self._n + 8:
                # a zero-padded tail tolerates a final over-peek; walking
                # well past the payload means the stream is truncated
                raise ValueError("VP8L: bitstream truncated")
            b = self.data[self.byte] if self.byte < self._n else 0
            self.acc |= b << self.nbits
            self.nbits += 8
            self.byte += 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def peek(self, n: int) -> int:
        self._fill(n)
        return self.acc & ((1 << n) - 1)

    def consume(self, n: int):
        self.acc >>= n
        self.nbits -= n


# --------------------------------------------------------- canonical codes
class _PrefixCode:
    """Canonical prefix code (spec canonical rule: numerically increasing
    codes, symbol order within a length).  Decode via ONE peek of max_len
    stream bits into a bit-reversed LUT (code bits arrive MSB-first as
    the stream's LSB-first bits, so the table is indexed by the reversed
    code plus all fillers — the classic DEFLATE fast path)."""

    __slots__ = ("single", "lut", "max_len")

    def __init__(self, lengths):
        lengths = np.asarray(lengths, np.int32)
        syms = np.flatnonzero(lengths > 0)
        if len(syms) == 0:
            raise ValueError("VP8L: empty prefix code")
        if len(syms) == 1:
            self.single = int(syms[0])
            self.lut = None
            self.max_len = 0
            return
        self.single = None
        max_len = int(lengths.max())
        if max_len > 15:
            raise ValueError("VP8L: code length > 15")
        self.max_len = max_len
        bl_count = np.bincount(lengths[syms], minlength=max_len + 1)
        next_code = np.zeros(max_len + 1, np.int64)
        code = 0
        for ln in range(1, max_len + 1):
            code = (code + int(bl_count[ln - 1])) << 1
            next_code[ln] = code
        lut = np.full(1 << max_len, -1, np.int32)  # (sym << 4) | len
        for s in syms:
            ln = int(lengths[s])
            c = int(next_code[ln])
            next_code[ln] += 1
            # reverse the ln code bits (first-read bit = code MSB = stream
            # bit 0), then every filler of the remaining high bits hits it
            rev = 0
            for i in range(ln):
                rev |= ((c >> i) & 1) << (ln - 1 - i)
            entry = (int(s) << 4) | ln
            step = 1 << ln
            lut[rev::step] = entry
        if (lut < 0).any():
            raise ValueError("VP8L: incomplete prefix code")
        self.lut = lut.tolist()  # list indexing beats numpy scalars here

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        entry = self.lut[br.peek(self.max_len)]
        br.consume(entry & 0xF)
        return entry >> 4


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        lengths = np.zeros(alphabet_size, np.int32)
        if num_symbols == 1:
            lengths[s0] = 1  # 0-bit code; _PrefixCode single path
            return _PrefixCode(lengths)
        s1 = br.read(8)
        lengths[s0] = 1
        lengths[s1] = 1
        pc = _PrefixCode(lengths)
        return pc
    num_cl = 4 + br.read(4)
    cl_lengths = np.zeros(19, np.int32)
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    lengths = np.zeros(alphabet_size, np.int32)
    if br.read(1):  # length-limited stream
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    sym = 0
    prev_len = 8
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            lengths[sym:sym + rep] = prev_len
            sym += rep
        elif s == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    return _PrefixCode(lengths)


# --------------------------------------------------- LZ77 value mappings
def _prefix_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding: code -> value (1-based)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# the spec's 120-entry close-neighborhood (x, y) offsets for dist codes 1..120
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))


def _plane_code_to_distance(xsize: int, dist_code: int) -> int:
    """Distance-code -> scan-order pixel distance: codes 1..120 are the
    close-neighborhood 2D map; larger codes are literal distances + 120."""
    if dist_code > 120:
        return dist_code - 120
    x, y = _DIST_MAP[dist_code - 1]
    dist = y * xsize + x
    return dist if dist >= 1 else 1


# ------------------------------------------------------------ color cache
class _ColorCache:
    def __init__(self, bits: int):
        self.bits = bits
        self.table = np.zeros(1 << bits, np.uint32)

    def insert(self, argb: int):
        key = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - self.bits)
        self.table[key] = argb

    def get(self, idx: int) -> int:
        return int(self.table[idx])


# ------------------------------------------------- entropy-coded image
_GREEN_BASE = 256 + 24


def _read_groups(br: _BitReader, cache_bits: int, n_groups: int):
    groups = []
    green_alpha = _GREEN_BASE + ((1 << cache_bits) if cache_bits else 0)
    for _ in range(n_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))
    return groups


def _decode_entropy_image(br: _BitReader, w: int, h: int,
                          is_level0: bool) -> np.ndarray:
    """Decode one entropy-coded ARGB image to a flat uint32 array of
    length w*h (scan order).  is_level0 enables meta prefix codes (main
    image only, per spec)."""
    use_cache = br.read(1)
    cache_bits = br.read(4) if use_cache else 0
    if cache_bits and not (1 <= cache_bits <= 11):
        raise ValueError("VP8L: invalid color cache size")
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):  # meta prefix codes
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
        meta_w = mw
    groups = _read_groups(br, cache_bits, n_groups)
    cache = _ColorCache(cache_bits) if cache_bits else None
    out = np.zeros(w * h, np.uint32)
    pos = 0
    total = w * h
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])
            g_code, r_code, b_code, a_code, d_code = groups[gi]
        else:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        s = g_code.read(br)
        if s < 256:
            red = r_code.read(br)
            blue = b_code.read(br)
            alpha = a_code.read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = argb
            if cache:
                cache.insert(argb)
            pos += 1
        elif s < _GREEN_BASE:
            length = _prefix_value(s - 256, br)
            # distance: prefix_value over the 40-symbol code FIRST, then
            # the 2D plane mapping
            dcode = d_code.read(br)
            dist = _plane_code_to_distance(w, _prefix_value(dcode, br))
            if dist > pos or pos + length > total:
                raise ValueError("VP8L: invalid backward reference")
            for i in range(length):
                v = out[pos - dist]
                out[pos] = v
                if cache:
                    cache.insert(int(v))
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without cache")
            argb = cache.get(s - _GREEN_BASE)
            out[pos] = argb
            pos += 1
    return out


# ---------------------------------------------------------- transforms
def _apply_predictor_inverse(res: np.ndarray, w: int, h: int,
                             size_bits: int,
                             pred_img: np.ndarray) -> np.ndarray:
    """Inverse predictor transform on (h*w,) uint32 residuals (inherently
    sequential per spec).  Plain-int channel arithmetic in a Python list —
    every real-web lossless file takes this path, so no per-pixel numpy
    allocations."""
    out = res.astype(np.int64).tolist()
    bw = (w + (1 << size_bits) - 1) >> size_bits
    modes = ((pred_img >> 8) & 0xFF).astype(np.int64).tolist()

    def unp(v):
        return (v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, \
            v & 0xFF

    for pos in range(w * h):
        x = pos % w
        y = pos // w
        if x == 0 and y == 0:
            pa_, pr, pg, pb = 0xFF, 0, 0, 0
        elif y == 0:
            pa_, pr, pg, pb = unp(out[pos - 1])           # L
        elif x == 0:
            pa_, pr, pg, pb = unp(out[pos - w])           # T
        else:
            mode = modes[(y >> size_bits) * bw + (x >> size_bits)]
            la, lr, lg, lb = unp(out[pos - 1])
            ta, tr_, tg, tb = unp(out[pos - w])
            if mode == 0:
                pa_, pr, pg, pb = 0xFF, 0, 0, 0
            elif mode == 1:
                pa_, pr, pg, pb = la, lr, lg, lb
            elif mode == 2:
                pa_, pr, pg, pb = ta, tr_, tg, tb
            elif mode == 3:
                pa_, pr, pg, pb = unp(out[pos - w + 1])
            elif mode == 4:
                pa_, pr, pg, pb = unp(out[pos - w - 1])
            elif mode == 5:
                ra, rr, rg, rb = unp(out[pos - w + 1])
                pa_ = (((la + ra) >> 1) + ta) >> 1
                pr = (((lr + rr) >> 1) + tr_) >> 1
                pg = (((lg + rg) >> 1) + tg) >> 1
                pb = (((lb + rb) >> 1) + tb) >> 1
            elif mode == 6:
                ua, ur, ug, ub = unp(out[pos - w - 1])
                pa_, pr, pg, pb = (la + ua) >> 1, (lr + ur) >> 1, \
                    (lg + ug) >> 1, (lb + ub) >> 1
            elif mode == 7:
                pa_, pr, pg, pb = (la + ta) >> 1, (lr + tr_) >> 1, \
                    (lg + tg) >> 1, (lb + tb) >> 1
            elif mode == 8:
                ua, ur, ug, ub = unp(out[pos - w - 1])
                pa_, pr, pg, pb = (ua + ta) >> 1, (ur + tr_) >> 1, \
                    (ug + tg) >> 1, (ub + tb) >> 1
            elif mode == 9:
                ra, rr, rg, rb = unp(out[pos - w + 1])
                pa_, pr, pg, pb = (ta + ra) >> 1, (tr_ + rr) >> 1, \
                    (tg + rg) >> 1, (tb + rb) >> 1
            elif mode == 10:
                ua, ur, ug, ub = unp(out[pos - w - 1])
                ra, rr, rg, rb = unp(out[pos - w + 1])
                pa_ = (((la + ua) >> 1) + ((ta + ra) >> 1)) >> 1
                pr = (((lr + ur) >> 1) + ((tr_ + rr) >> 1)) >> 1
                pg = (((lg + ug) >> 1) + ((tg + rg) >> 1)) >> 1
                pb = (((lb + ub) >> 1) + ((tb + rb) >> 1)) >> 1
            elif mode == 11:  # Select
                ua, ur, ug, ub = unp(out[pos - w - 1])
                qa, qr, qg, qb = la + ta - ua, lr + tr_ - ur, \
                    lg + tg - ug, lb + tb - ub
                pl = abs(qa - la) + abs(qr - lr) + abs(qg - lg) \
                    + abs(qb - lb)
                pt = abs(qa - ta) + abs(qr - tr_) + abs(qg - tg) \
                    + abs(qb - tb)
                if pl <= pt:
                    pa_, pr, pg, pb = la, lr, lg, lb
                else:
                    pa_, pr, pg, pb = ta, tr_, tg, tb
            elif mode == 12:  # ClampAddSubtractFull
                ua, ur, ug, ub = unp(out[pos - w - 1])
                pa_ = min(255, max(0, la + ta - ua))
                pr = min(255, max(0, lr + tr_ - ur))
                pg = min(255, max(0, lg + tg - ug))
                pb = min(255, max(0, lb + tb - ub))
            elif mode == 13:  # ClampAddSubtractHalf
                ua, ur, ug, ub = unp(out[pos - w - 1])
                va = (la + ta) >> 1
                vr = (lr + tr_) >> 1
                vg = (lg + tg) >> 1
                vb = (lb + tb) >> 1
                pa_ = min(255, max(0, va + ((va - ua) >> 1)))
                pr = min(255, max(0, vr + ((vr - ur) >> 1)))
                pg = min(255, max(0, vg + ((vg - ug) >> 1)))
                pb = min(255, max(0, vb + ((vb - ub) >> 1)))
            else:
                raise ValueError(f"VP8L: predictor mode {mode}")
        v = out[pos]
        out[pos] = (((((v >> 24) & 0xFF) + pa_) & 0xFF) << 24) \
            | (((((v >> 16) & 0xFF) + pr) & 0xFF) << 16) \
            | (((((v >> 8) & 0xFF) + pg) & 0xFF) << 8) \
            | (((v & 0xFF) + pb) & 0xFF)
    return np.asarray(out, np.uint32)


def _apply_color_inverse(res: np.ndarray, w: int, h: int, size_bits: int,
                         ct_img: np.ndarray) -> np.ndarray:
    out = res.copy()
    bw = (w + (1 << size_bits) - 1) >> size_bits

    def s8(v):
        v &= 0xFF
        return v - 256 if v >= 128 else v

    def delta(t, c):
        # (signed t * signed c) >> 5, per spec
        cs = c - 256 if c >= 128 else c
        return (t * cs) >> 5

    for pos in range(w * h):
        x, y = pos % w, pos // w
        ct = int(ct_img[(y >> size_bits) * bw + (x >> size_bits)])
        # ColorTransformElement packing (spec/libwebp): blue byte =
        # green_to_red, green byte = green_to_blue, red byte = red_to_blue
        g2r = s8(ct)
        g2b = s8(ct >> 8)
        r2b = s8(ct >> 16)
        v = int(out[pos])
        a = (v >> 24) & 0xFF
        r = (v >> 16) & 0xFF
        g = (v >> 8) & 0xFF
        b = v & 0xFF
        r = (r + delta(g2r, g)) & 0xFF
        b = (b + delta(g2b, g)) & 0xFF
        b = (b + delta(r2b, r)) & 0xFF
        out[pos] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _apply_subtract_green_inverse(res: np.ndarray) -> np.ndarray:
    a = (res >> 24) & 0xFF
    r = (res >> 16) & 0xFF
    g = (res >> 8) & 0xFF
    b = res & 0xFF
    r = (r + g) & 0xFF
    b = (b + g) & 0xFF
    return (a << 24) | (r << 16) | (g << 8) | b


def _apply_color_indexing(res: np.ndarray, w: int, h: int,
                          palette: np.ndarray,
                          packed_w: int) -> np.ndarray:
    n = len(palette)
    if n <= 2:
        width_bits = 3
    elif n <= 4:
        width_bits = 2
    elif n <= 16:
        width_bits = 1
    else:
        width_bits = 0
    if width_bits == 0:
        idx = (res >> 8) & 0xFF
        bad = idx >= n
        if bad.any():
            raise ValueError("VP8L: palette index out of range")
        return palette[idx]
    px_per = 1 << width_bits
    bits = 8 >> width_bits
    mask = (1 << bits) - 1
    out = np.zeros(w * h, np.uint32)
    greens = (res >> 8) & 0xFF
    for y in range(h):
        for x in range(w):
            packed = int(greens[y * packed_w + (x >> width_bits)])
            i = (packed >> (bits * (x & (px_per - 1)))) & mask
            if i >= n:
                raise ValueError("VP8L: palette index out of range")
            out[y * w + x] = palette[i]
    return out


# --------------------------------------------------------------- decoder
def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode a raw VP8L chunk payload to (h, w, 3) uint8 (alpha dropped)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = _BitReader(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")
    # transforms (each at most once, applied inverse in reverse read order)
    transforms = []
    seen = set()
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            size_bits = br.read(3) + 2
            bw = (xsize + (1 << size_bits) - 1) >> size_bits
            bh = (h + (1 << size_bits) - 1) >> size_bits
            sub = _decode_entropy_image(br, bw, bh, False)
            transforms.append(("pred", size_bits, sub))
        elif ttype == 1:  # color transform
            size_bits = br.read(3) + 2
            bw = (xsize + (1 << size_bits) - 1) >> size_bits
            bh = (h + (1 << size_bits) - 1) >> size_bits
            sub = _decode_entropy_image(br, bw, bh, False)
            transforms.append(("color", size_bits, sub))
        elif ttype == 2:
            transforms.append(("subgreen",))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_res = _decode_entropy_image(br, n_colors, 1, False)
            # palette entries are component-wise delta-coded
            pal = np.zeros(n_colors, np.uint32)
            prev = 0
            for i in range(n_colors):
                v = int(pal_res[i])
                a = (((prev >> 24) + (v >> 24)) & 0xFF) << 24
                r = ((((prev >> 16) & 0xFF) + ((v >> 16) & 0xFF))
                     & 0xFF) << 16
                g = ((((prev >> 8) & 0xFF) + ((v >> 8) & 0xFF))
                     & 0xFF) << 8
                b = ((prev & 0xFF) + (v & 0xFF)) & 0xFF
                prev = a | r | g | b
                pal[i] = prev
            if n_colors <= 2:
                wb = 3
            elif n_colors <= 4:
                wb = 2
            elif n_colors <= 16:
                wb = 1
            else:
                wb = 0
            packed_w = (xsize + (1 << wb) - 1) >> wb if wb else xsize
            transforms.append(("palette", pal, xsize))
            xsize = packed_w
        if len(seen) == 4:
            break
    argb = _decode_entropy_image(br, xsize, h, True)
    # inverse transforms, reverse order
    for tr in reversed(transforms):
        if tr[0] == "palette":
            _, pal, real_w = tr
            argb = _apply_color_indexing(argb, real_w, h, pal, xsize)
            xsize = real_w
        elif tr[0] == "subgreen":
            argb = _apply_subtract_green_inverse(argb)
        elif tr[0] == "color":
            argb = _apply_color_inverse(argb, xsize, h, tr[1], tr[2])
        elif tr[0] == "pred":
            argb = _apply_predictor_inverse(argb, xsize, h, tr[1], tr[2])
    img = argb.reshape(h, xsize)
    rgb = np.stack([(img >> 16) & 0xFF, (img >> 8) & 0xFF, img & 0xFF],
                   axis=2).astype(np.uint8)
    return rgb


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a RIFF/WEBP container: VP8L (lossless) for real; VP8 (lossy)
    and VP8X-wrapped lossy raise NotImplementedError (no VP8 intra codec
    in this environment)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            raise NotImplementedError(
                "WebP lossy (VP8) payload: no VP8 intra decoder here")
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container without VP8/VP8L chunk")


# --------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def bytes_(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _flat_lengths(n: int) -> np.ndarray:
    """Complete canonical code lengths for n symbols: k = ceil(log2 n);
    the first (2^k - n) symbols get length k-1, the rest k (Kraft = 1)."""
    if n == 1:
        return np.array([1], np.int32)
    k = int(np.ceil(np.log2(n)))
    short = (1 << k) - n
    lengths = np.full(n, k, np.int32)
    lengths[:short] = k - 1
    return lengths


def _write_code_lengths(bw: _BitWriter, lengths: np.ndarray):
    """Emit a normal (non-simple) prefix code: code-length code covering
    the two lengths used by _flat_lengths."""
    bw.write(0, 1)  # not simple
    used = sorted(set(int(x) for x in lengths if x > 0))
    # code-length alphabet code: give each used length a 1-bit (or single
    # 0-bit) code; order constraint: emit num_cl entries of _CL_ORDER
    cl_len = {u: (1 if len(used) > 1 else 1) for u in used}
    # find how many leading _CL_ORDER entries we must emit to cover `used`
    need = max(_CL_ORDER.index(u) for u in used) + 1
    num_cl = max(4, need)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        sym = _CL_ORDER[i]
        bw.write(cl_len.get(sym, 0), 3)
    # canonical 1-bit codes over `used` (or 0-bit single)
    if len(used) == 1:
        codes = {used[0]: (0, 0)}  # 0-bit code
    else:
        codes = {used[0]: (0, 1), used[1]: (1, 1)}
    bw.write(0, 1)  # no length limit
    for ln in lengths:
        c, nb = codes[int(ln)]
        # prefix codes are read MSB-first via tree walk: write bits of the
        # canonical code from MSB to LSB
        for i in range(nb - 1, -1, -1):
            bw.write((c >> i) & 1, 1)


class _Encoder:
    """Symbol emitter for one flat canonical code."""

    def __init__(self, lengths: np.ndarray):
        self.lengths = lengths
        max_len = int(lengths.max())
        bl_count = np.bincount(lengths[lengths > 0], minlength=max_len + 1)
        next_code = np.zeros(max_len + 1, np.int64)
        code = 0
        for ln in range(1, max_len + 1):
            code = (code + int(bl_count[ln - 1])) << 1
            next_code[ln] = code
        self.codes = {}
        for s in range(len(lengths)):
            ln = int(lengths[s])
            if ln:
                self.codes[s] = (int(next_code[ln]), ln)
                next_code[ln] += 1

    def emit(self, bw: _BitWriter, sym: int):
        c, nb = self.codes[sym]
        for i in range(nb - 1, -1, -1):
            bw.write((c >> i) & 1, 1)


def encode_webp_lossless(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> minimal valid VP8L-in-RIFF (all-literal)."""
    h, w, _ = pixels.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L: dimensions out of range")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transform
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    g_len = _flat_lengths(_GREEN_BASE)
    c_len = _flat_lengths(256)
    d_len = _flat_lengths(40)
    _write_code_lengths(bw, g_len)
    for _ in range(3):
        _write_code_lengths(bw, c_len)
    _write_code_lengths(bw, d_len)
    genc = _Encoder(g_len)
    cenc = _Encoder(c_len)
    flat = pixels.reshape(-1, 3)
    for r, g, b in flat:
        genc.emit(bw, int(g))
        cenc.emit(bw, int(r))
        cenc.emit(bw, int(b))
        cenc.emit(bw, 255)  # alpha
    payload = bw.bytes_()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ----------------------------------------------------------------- probe
def webp_info(data: bytes) -> dict:
    """RIFF/WEBP metadata without payload decode: kind (lossless/lossy/
    extended), dims, alpha/animation flags."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    info = {"container": "webp", "kind": "image", "codec": "",
            "w": 0, "h": 0, "animation": False, "alpha": False,
            "decodable": False, "n_frames": 0, "duration_s": 0.0}
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if tag == b"VP8L" and body and body[0] == 0x2F:
            bits = int.from_bytes(body[1:5], "little")
            info.update(codec="vp8l", w=(bits & 0x3FFF) + 1,
                        h=((bits >> 14) & 0x3FFF) + 1,
                        alpha=bool((bits >> 28) & 1), decodable=True)
            return info
        if tag == b"VP8 " and len(body) >= 10:
            # lossy key frame: sync 9D 01 2A then 14-bit dims
            if body[3:6] == b"\x9d\x01\x2a":
                wd = struct.unpack("<H", body[6:8])[0] & 0x3FFF
                ht = struct.unpack("<H", body[8:10])[0] & 0x3FFF
                info.update(codec="vp8", w=wd, h=ht, decodable=False)
            else:
                info.update(codec="vp8")
            return info
        if tag == b"VP8X" and len(body) >= 10:
            flags = body[0]
            info["alpha"] = bool(flags & 0x10)
            info["animation"] = bool(flags & 0x02)
            info["w"] = int.from_bytes(body[4:7], "little") + 1
            info["h"] = int.from_bytes(body[7:10], "little") + 1
            info["codec"] = "vp8x"
            if info["animation"]:
                info["kind"] = "video"
            # keep walking: inner VP8/VP8L/ANMF chunks refine the probe
        if tag == b"ANMF" and len(body) >= 16:
            info["n_frames"] = info.get("n_frames", 0) + 1
            info["duration_s"] = info.get("duration_s", 0.0) \
                + int.from_bytes(body[12:15], "little") / 1000.0
            # full-canvas VP8L frames decode for real here
            if body[16:20] == b"VP8L":
                info["codec"] = "vp8l"
                info["decodable"] = True
        pos += 8 + size + (size & 1)
    return info


# ------------------------------------------------------- animated WebP
def encode_awebp(frames, durations_s) -> bytes:
    """Animated WebP: VP8X(ANIM) + ANIM + one ANMF per FULL-CANVAS VP8L
    lossless frame (no blending, dispose-to-none) — the animation shape
    this engine can also decode.  ``durations_s`` per frame (ms
    resolution per spec)."""
    frames = list(frames)
    if not frames:
        raise ValueError("cannot encode an empty animation")
    h, w, _ = frames[0].shape

    def u24(v: int) -> bytes:
        return struct.pack("<I", v)[:3]

    def chunk(tag: bytes, body: bytes) -> bytes:
        out = tag + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            out += b"\x00"
        return out

    anmfs = []
    for f, dur in zip(frames, durations_s):
        if f.shape[:2] != (h, w):
            raise ValueError("all animation frames must share the canvas")
        riff = encode_webp_lossless(f)
        vp8l = riff[12:]  # the VP8L chunk (fourcc + size + payload)
        hdr = (u24(0) + u24(0) + u24(w - 1) + u24(h - 1)
               + u24(max(1, round(dur * 1000)))
               + bytes([0x02]))  # B=1 (no blend), D=0 (keep)
        anmfs.append(chunk(b"ANMF", hdr + vp8l))
    vp8x = chunk(b"VP8X", bytes([0x02]) + b"\x00" * 3
                 + u24(w - 1) + u24(h - 1))
    anim = chunk(b"ANIM", struct.pack("<IH", 0xFFFFFFFF, 0))
    body = b"WEBP" + vp8x + anim + b"".join(anmfs)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_awebp(data: bytes):
    """Walk ANMF chunks: returns (canvas_w, canvas_h, frames) with frames
    = [(vp8l_chunk_bytes, duration_s, x, y, w, h)] — header walk only,
    no pixel decode."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    cw = ch = 0
    frames = []
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if tag == b"VP8X" and len(body) >= 10:
            cw = int.from_bytes(body[4:7], "little") + 1
            ch = int.from_bytes(body[7:10], "little") + 1
        elif tag == b"ANMF" and len(body) >= 16:
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            dur = int.from_bytes(body[12:15], "little") / 1000.0
            frames.append((body[16:], dur, fx, fy, fw, fh))
        pos += 8 + size + (size & 1)
    return cw, ch, frames


def sample_awebp_frames(data: bytes, every_n_seconds: float = 1.0,
                        max_frames: int | None = None):
    """Sample animation frames along the duration timeline WITHOUT
    decoding unsampled frames: each sampled frame's VP8L chunk is
    re-wrapped as a standalone RIFF/WEBP blob (byte slice + 20-byte
    header, no re-encode).  Only full-canvas VP8L frames are decodable
    here; frames using lossy VP8 payloads raise at decode time."""
    cw, ch, frames = parse_awebp(data)
    if not frames:
        raise ValueError("WebP container has no ANMF frames")
    durs = np.array([f[1] for f in frames])
    starts = np.concatenate([[0.0], np.cumsum(durs)[:-1]])
    total = float(durs.sum())
    targets = np.arange(0.0, max(total, 1e-9), max(every_n_seconds, 1e-9))
    idxs = np.unique(np.searchsorted(starts, targets, side="right") - 1)
    if max_frames is not None:
        idxs = idxs[:max_frames]
    blobs, ts = [], []
    for i in idxs:
        payload, dur, fx, fy, fw, fh = frames[i]
        if not (fx == 0 and fy == 0 and fw == cw and fh == ch):
            raise NotImplementedError(
                "animated WebP with partial-canvas frames (compositing) "
                "is not supported here")
        body = b"WEBP" + payload
        blobs.append(b"RIFF" + struct.pack("<I", len(body)) + body)
        ts.append(float(starts[i]))
    return blobs, ts
