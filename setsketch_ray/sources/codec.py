"""Pure-NumPy image codecs + DCT perceptual hash.

The engine treats images as opaque ``binary`` columns with typed metadata
(``image_id, bytes, w, h, fmt, caption, phash`` — BASELINE.json input_hint).
No image libraries exist in this environment, so the codecs are our own:

* ``png``  — real PNG: encoder (8-bit RGB, filter 0), COMPLETE decoder —
  all five color types (incl. palette), bit depths 1/2/4/8/16, all five
  filter types, non-interlaced and Adam7 interlaced;
* ``jpg``/``pjpg`` — real ITU T.81 JPEG, baseline AND progressive, all
  common subsamplings (``sources/jpeg.py``);
* ``gif``  — real GIF87a/89a LZW incl. animation (``sources/gif.py``);
* ``bmp``  — uncompressed 24/32-bit BI_RGB;
* ``ljpg`` — this engine's own lossy codec ("LJP1"): 8×8 block DCT-II,
  quality-scaled quantization, zlib-compressed coefficients;
* ``phash`` — 64-bit DCT perceptual hash (32×32 grayscale → 8×8 low-band →
  median threshold).

* ``webp`` — real WebP lossless (VP8L, ``sources/webp.py``): full decoder
  (all transforms, color cache, LZ77, meta prefix codes) + a minimal
  all-literal encoder; lossy VP8 stays honestly stubbed;
* ``tiff`` — baseline TIFF (``sources/tiff.py``): II/MM strip images,
  none/LZW/PackBits compression, predictor 2, gray/RGB/palette; tiled,
  16-bit and JPEG-in-TIFF stay loud NotImplementedError.

:func:`decode_image` sniffs magic bytes ahead of the ``fmt`` tag and raises
``NotImplementedError`` for formats with no codec here (AVIF/HEIC/...),
keeping the Ray-side plumbing fully real and honestly bounded.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_LJP_MAGIC = b"LJP1"

# classic JPEG luminance quantization table (public domain, ITU T.81 Annex K)
_QTABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    c[0, :] /= np.sqrt(2.0)
    return c


_DCT8 = _dct_matrix(8)


# ------------------------------------------------------------------ PNG (real)
def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a valid minimal PNG (filter 0)."""
    h, w, _ = pixels.shape
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


# Adam7 pass geometry: (x_origin, y_origin, x_step, y_step) per pass
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

# legal bit depths per color type (PNG spec §11.2.2)
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}


def _png_unfilter(raw: bytes, n_rows: int, stride: int, bpp: int,
                  offset: int = 0) -> np.ndarray:
    """Reconstruct ``n_rows`` filtered scanlines of ``stride`` data bytes
    each (one leading filter byte per line) starting at ``offset`` in the
    inflated stream.  ``bpp`` is the filter unit in BYTES (``max(1,
    channels*depth//8)`` per spec).  Returns an (n_rows, stride) uint8
    array."""
    a = np.frombuffer(raw, dtype=np.uint8, count=n_rows * (stride + 1),
                      offset=offset).reshape(n_rows, stride + 1)
    filters = a[:, 0]
    body = a[:, 1:]
    if not filters.any():
        # all filter 0 (what encode_png writes): zero reconstruction work
        return body
    # uint8 arithmetic wraps mod 256, exactly the PNG reconstruction
    # rule; Sub/Average/Paeth have an in-row carry -> per-pixel loop,
    # None/Up stay vectorized (the common big-image cases)
    out = body.copy()
    for y in range(n_rows):
        f = filters[y]
        row = out[y]
        up = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            continue
        if f == 2:  # Up
            row += up
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + ((left + int(up[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                above = int(up[i])
                ul = int(up[i - bpp]) if i >= bpp else 0
                p = left + above - ul
                pa, pb, pc = abs(p - left), abs(p - above), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else \
                    (above if pb <= pc else ul)
                row[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter {f}")
    return out


def _png_expand(rows: np.ndarray, width: int, nch: int,
                depth: int) -> np.ndarray:
    """Unpack reconstructed scanline bytes to (n_rows, width, nch) uint8
    samples.  16-bit samples reduce to their high byte (the standard
    16→8 strip); 1/2/4-bit samples (single-channel only per spec) unpack
    MSB-first."""
    n_rows = rows.shape[0]
    if depth == 8:
        return rows[:, :width * nch].reshape(n_rows, width, nch)
    if depth == 16:
        return rows[:, :width * nch * 2].reshape(
            n_rows, width, nch, 2)[..., 0]
    bits = np.unpackbits(np.ascontiguousarray(rows), axis=1)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (bits.reshape(n_rows, -1, depth) * weights).sum(
        axis=2, dtype=np.uint8)
    return vals[:, :width].reshape(n_rows, width, 1)


def _png_to_rgb(samples: np.ndarray, color: int, depth: int,
                plte: np.ndarray | None) -> np.ndarray:
    """Samples -> (n, w, 3) uint8 RGB.  Alpha dropped, grayscale broadcast,
    sub-8-bit gray rescaled to full range, palette indices looked up."""
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return plte[samples[:, :, 0]]
    if color == 0:
        g = samples[:, :, 0]
        if depth < 8:
            # 255/(2^d - 1) is exactly an integer for d in {1,2,4}
            g = g * np.uint8({1: 255, 2: 85, 4: 17}[depth])
        return np.repeat(g[:, :, None], 3, axis=2)
    if color == 4:
        return np.repeat(samples[:, :, :1], 3, axis=2)
    if color == 6:
        return samples[:, :, :3]
    return samples  # color 2 (RGB)


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG: all five color types (grayscale / RGB / palette /
    gray+alpha / RGBA), all legal bit depths (1/2/4/8/16), ALL five filter
    types (None/Sub/Up/Average/Paeth), and both interlace methods (none /
    Adam7).  Alpha is dropped, grayscale broadcast to RGB, 16-bit samples
    stripped to their high byte — output is always (h, w, 3) uint8."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color, depth, interlace = 2, 8, 0
    plte = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth not in _PNG_DEPTHS.get(color, ()):
                raise ValueError(
                    f"illegal PNG depth {depth} for color type {color}")
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bpp = max(1, nch * depth // 8)
    if not interlace:
        stride = (w * nch * depth + 7) // 8
        if len(raw) != h * (stride + 1):
            raise ValueError("corrupt PNG stream")
        rows = _png_unfilter(raw, h, stride, bpp)
        return np.ascontiguousarray(
            _png_to_rgb(_png_expand(rows, w, nch, depth), color, depth,
                        plte))
    # Adam7: seven independently-filtered sub-images, scattered back onto
    # the output grid by each pass's (origin, step) lattice
    out = np.zeros((h, w, 3), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # pass is empty for small images
        stride = (pw * nch * depth + 7) // 8
        if off + ph * (stride + 1) > len(raw):
            raise ValueError("corrupt interlaced PNG stream")
        rows = _png_unfilter(raw, ph, stride, bpp, offset=off)
        off += ph * (stride + 1)
        out[y0::dy, x0::dx] = _png_to_rgb(
            _png_expand(rows, pw, nch, depth), color, depth, plte)
    return out


# ------------------------------------------------------- LJP1 (lossy, real DCT)
def _quality_scale(quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((_QTABLE * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _to_blocks(ch: np.ndarray) -> np.ndarray:
    h, w = ch.shape
    return ch.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _from_blocks(blocks: np.ndarray) -> np.ndarray:
    bh, bw, _, _ = blocks.shape
    return blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)


def encode_ljpg(pixels: np.ndarray, quality: int = 85) -> bytes:
    """Encode (h, w, 3) uint8 as LJP1: blockwise DCT + quantization + zlib."""
    h, w, _ = pixels.shape
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = np.pad(pixels.astype(np.float64) - 128.0,
                    ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    qt = _quality_scale(quality)
    coeffs = []
    for c in range(3):
        blocks = _to_blocks(padded[:, :, c])
        dct = _DCT8 @ blocks @ _DCT8.T   # batched BLAS matmul over blocks
        coeffs.append(np.round(dct / qt).astype(np.int16))
    payload = zlib.compress(np.concatenate([c.ravel() for c in coeffs]).tobytes(), 6)
    return _LJP_MAGIC + struct.pack(">HHB", w, h, quality) + payload


def decode_ljpg(data: bytes) -> np.ndarray:
    if data[:4] != _LJP_MAGIC:
        raise ValueError("not an LJP1 payload")
    w, h, quality = struct.unpack(">HHB", data[4:9])
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    n = ph * pw
    # float32 throughout: the map stage is DRAM-bandwidth-bound at high
    # concurrency and this halves the decode's memory traffic; LJP1 is a
    # LOSSY codec (PSNR-checked), and f32 keeps ~1e-3 pixel accuracy vs the
    # quantization error of ~1.0
    arr = np.frombuffer(zlib.decompress(data[9:]), dtype=np.int16) \
        .astype(np.float32)
    qt = _quality_scale(quality).astype(np.float32)
    dct8 = _DCT8.astype(np.float32)
    out = np.empty((ph, pw, 3), dtype=np.float32)
    scratch = np.empty((ph // 8, pw // 8, 8, 8), dtype=np.float32)
    for c in range(3):
        blocks = arr[c * n:(c + 1) * n].reshape(ph // 8, pw // 8, 8, 8)
        np.multiply(blocks, qt, out=blocks)
        np.matmul(dct8.T, blocks, out=scratch)
        np.matmul(scratch, dct8, out=blocks)
        out[:, :, c] = _from_blocks(blocks)
    np.add(out, np.float32(128.0), out=out)
    np.round(out, out=out)
    np.clip(out, 0, 255, out=out)
    return out.astype(np.uint8)[:h, :w]


# ------------------------------------------------------------------- dispatch
def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode image bytes to (h, w, 3) uint8 pixels.

    Formats produced by this engine decode for real; foreign formats (actual
    libjpeg JPEG, WebP, ...) are STUBBED — no codec libraries exist in this
    environment.
    """
    # magic-byte sniff first: containers (video frame extraction, foreign
    # tables) routinely carry blobs whose fmt tag is stale or generic
    if fmt == "png" or data[:8] == _PNG_SIG:
        return decode_png(data)
    if fmt == "ljpg" or data[:4] == _LJP_MAGIC:
        return decode_ljpg(data)
    if fmt == "gif" or data[:4] == b"GIF8":
        from .gif import decode_gif

        return decode_gif(data)  # first composited frame
    if fmt == "bmp" or (data[:2] == b"BM" and len(data) >= 26):
        return decode_bmp(data)
    if fmt == "webp" or (data[:4] == b"RIFF" and data[8:12] == b"WEBP"):
        from .webp import decode_webp

        return decode_webp(data)  # VP8L real; VP8 lossy raises
    if fmt in ("tif", "tiff") or data[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff

        return decode_tiff(data)
    if fmt in ("jpg", "jpeg", "pjpg") or data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        try:
            return decode_jpeg(data)  # sequential AND progressive (SOF2)
        except NotImplementedError:
            pass  # arithmetic/hierarchical: PIL fallback below if present
    try:  # pragma: no cover - PIL not installed in this environment
        from PIL import Image
        import io

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            f"format {fmt!r}: no codec available (PIL not installed); "
            "png/ljpg are supported natively")


def encode_image(pixels: np.ndarray, fmt: str, quality: int = 85) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "ljpg":
        return encode_ljpg(pixels, quality)
    if fmt in ("jpg", "jpeg"):
        from .jpeg import encode_jpeg

        return encode_jpeg(pixels, quality)
    if fmt == "pjpg":  # progressive JPEG (SOF2, 10-scan libjpeg-style script)
        from .jpeg import encode_jpeg

        return encode_jpeg(pixels, quality, progressive=True)
    if fmt == "gif":  # lossless exact-palette LZW (<= 256 distinct colors)
        from .gif import encode_gif

        return encode_gif(pixels)
    if fmt == "bmp":  # uncompressed 24-bit, lossless
        return encode_bmp(pixels)
    if fmt == "webp":  # VP8L lossless (minimal all-literal stream)
        from .webp import encode_webp_lossless

        return encode_webp_lossless(pixels)
    if fmt in ("tif", "tiff"):  # single-strip uncompressed, lossless
        from .tiff import encode_tiff

        return encode_tiff(pixels)
    raise NotImplementedError(f"format {fmt!r} not supported for encoding")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


# ---------------------------------------------------------------------- phash
_DCT32 = _dct_matrix(32)


def _resize_gray(pixels: np.ndarray, size: int = 32) -> np.ndarray:
    """Area-mean resize of the grayscale image to (size, size)."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(size + 1) * h // size)
    xs = (np.arange(size + 1) * w // size)
    csum = np.zeros((h + 1, w + 1))
    csum[1:, 1:] = gray.cumsum(0).cumsum(1)
    out = (csum[ys[1:], :][:, xs[1:]] - csum[ys[:-1], :][:, xs[1:]]
           - csum[ys[1:], :][:, xs[:-1]] + csum[ys[:-1], :][:, xs[:-1]])
    areas = np.outer(np.diff(ys), np.diff(xs))
    return out / np.maximum(areas, 1)


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash: low-frequency 8×8 block of the 32×32 DCT,
    thresholded at its median (DC excluded from the median)."""
    small = _resize_gray(pixels, 32)
    dct = _DCT32 @ small @ _DCT32.T
    block = dct[:8, :8].copy()
    med = np.median(block.ravel()[1:])
    bits = (block.ravel() > med).astype(np.uint64)
    h = np.uint64(0)
    for i, b in enumerate(bits):
        h |= b << np.uint64(i)
    return int(h)


def phash64_batch(stack: np.ndarray) -> np.ndarray:
    """Vectorized :func:`phash64` over an (n, h, w, 3) uint8 stack —
    bit-identical per image (same op order: gray dot, integral-image area
    resize, 32x32 DCT, median threshold), one batched pass each.  Chunked so
    the f64 gray/integral temporaries stay cache-resident (a whole-batch
    pass is DRAM-bound and slower than the scalar loop)."""
    n, h, w, _ = stack.shape
    chunk = max(16, (4 << 20) // (8 * (h + 1) * (w + 1)))
    if n > chunk:
        return np.concatenate([phash64_batch(stack[lo:lo + chunk])
                               for lo in range(0, n, chunk)])
    gray = stack.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    ys = np.arange(33) * h // 32
    xs = np.arange(33) * w // 32
    csum = np.zeros((n, h + 1, w + 1))
    csum[:, 1:, 1:] = gray.cumsum(1).cumsum(2)
    out = (csum[:, ys[1:], :][:, :, xs[1:]]
           - csum[:, ys[:-1], :][:, :, xs[1:]]
           - csum[:, ys[1:], :][:, :, xs[:-1]]
           + csum[:, ys[:-1], :][:, :, xs[:-1]])
    areas = np.outer(np.diff(ys), np.diff(xs))
    small = out / np.maximum(areas, 1)
    dct = _DCT32 @ small @ _DCT32.T          # batched (n, 32, 32)
    block = dct[:, :8, :8].reshape(n, 64)
    med = np.median(block[:, 1:], axis=1)
    bits = block > med[:, None]
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    # bits are disjoint powers of two, so the sum is exact (it's an OR)
    return (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)


def phash_to_int64(h: int) -> int:
    """Bit-cast uint64 phash to int64 for Arrow storage."""
    return int(np.uint64(h).astype(np.int64))


def int64_to_phash(v) -> np.ndarray:
    """Vectorized inverse bit-cast (column helper)."""
    return np.asarray(v, dtype=np.int64).astype(np.uint64)


# ------------------------------------------------------------------ BMP
def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 as an uncompressed 24-bit bottom-up BMP."""
    h, w, _ = pixels.shape
    pad = (-(w * 3)) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(pixels[y, :, ::-1].tobytes() + b"\x00" * pad)
    body = b"".join(rows)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + dib + body


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode uncompressed (BI_RGB) 24/32-bit BMPs, bottom-up or top-down."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    dib_size, w, h = struct.unpack("<Iii", data[14:26])
    if dib_size < 40:
        raise NotImplementedError("BMP core-header variant")
    bitcount, compression = struct.unpack("<HI", data[28:34])
    if compression != 0 or bitcount not in (24, 32):
        raise NotImplementedError(
            f"BMP bitcount={bitcount} compression={compression}")
    top_down = h < 0
    h = abs(h)
    nch = bitcount // 8
    stride = (w * nch + 3) // 4 * 4
    a = np.frombuffer(data, np.uint8, count=stride * h, offset=offset)
    rows = a.reshape(h, stride)[:, :w * nch].reshape(h, w, nch)
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)
