"""Real GIF codec (GIF87a/89a, LZW), pure Python/NumPy.

Covers the remaining big web image format after JPEG/PNG: palette-indexed
LZW with variable code sizes (the format's actual compression), interlaced
frames, local/global color tables, transparency and multi-frame GIF89a
animations (graphic-control delays, disposal none/keep/background).

Encoding is LOSSLESS and supports images with <= 256 distinct colors (an
exact palette is built from the pixels; adaptive color quantization is out
of scope and raises ``NotImplementedError`` — never silently lossy).
Decode supports anything the spec allows for these features.

All from the public GIF89a specification (CompuServe, 1990).
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------- LZW
def _lzw_decode(data: bytes, min_code: int, n_expected: int) -> np.ndarray:
    """GIF LZW: variable code width from min_code+1 up to 12 bits.

    Codes are pulled LSB-first from an integer accumulator refilled a byte
    at a time (no per-bit indexing — the accumulator never exceeds 19 bits,
    so this stays small-int arithmetic)."""
    clear = 1 << min_code
    end = clear + 1
    acc = 0
    accbits = 0
    bytepos = 0
    nbytes = len(data)
    out = np.empty(n_expected, dtype=np.uint16)
    n_out = 0

    table: list[bytes] = []
    code_size = min_code + 1
    prev: bytes | None = None

    def reset():
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code + 1
        prev = None

    reset()
    while n_out < n_expected:
        while accbits < code_size:
            if bytepos >= nbytes:
                break
            acc |= data[bytepos] << accbits
            accbits += 8
            bytepos += 1
        if accbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        accbits -= code_size
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        take = min(len(entry), n_expected - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    if n_out < n_expected:
        raise ValueError("GIF frame truncated")
    return out


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    clear = 1 << min_code
    end = clear + 1
    out_bits: list[int] = []

    code_size = min_code + 1
    table: dict[bytes, int] = {}
    next_code = end + 1

    def emit(code):
        for b in range(code_size):
            out_bits.append((code >> b) & 1)

    def reset():
        nonlocal table, next_code, code_size
        table = {bytes([i]): i for i in range(clear)}
        next_code = end + 1
        code_size = min_code + 1

    emit(clear)
    reset()
    data = indices.astype(np.uint8).tobytes()
    buf = b""
    for i in range(len(data)):
        nxt = buf + data[i:i + 1]
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf])
        table[nxt] = next_code
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        next_code += 1
        if next_code > 4095:
            emit(clear)
            reset()
        buf = data[i:i + 1]
    if buf:
        emit(table[buf])
    emit(end)
    arr = np.array(out_bits, dtype=np.uint8)
    payload = np.packbits(arr, bitorder="little").tobytes()
    # 255-byte sub-blocks + terminator
    chunks = [payload[i:i + 255] for i in range(0, len(payload), 255)]
    return b"".join(bytes([len(c)]) + c for c in chunks) + b"\x00"


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE:
        n = len(range(start, h, step))
        out[start::step] = rows[src:src + n]
        src += n
    return out


# ----------------------------------------------------------------- decode
def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(data[pos:pos + n])
        pos += n


def decode_gif_frames(data: bytes):
    """Decode all frames.  Returns ``(frames, delays_s)`` — each frame a
    composited (h, w, 3) uint8 canvas, delays in seconds (GIF89a GCE,
    0.0 for plain GIF87a frames)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames, delays = [], []
    transparent = None
    delay = 0.0
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:
                pk, d = struct.unpack("<BH", body[:3])
                disposal = (pk >> 2) & 7
                transparent = body[3] if pk & 1 else None
                delay = d / 100.0
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, fw, fh, fpk = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        ct = gct
        if fpk & 0x80:
            n = 2 << (fpk & 7)
            ct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without a color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(lzw, min_code, fw * fh).reshape(fh, fw)
        if fpk & 0x40:
            idx = _deinterlace(idx)
        prev = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + fh, left:left + fw]
        px = ct[np.minimum(idx, len(ct) - 1)]
        if transparent is not None:
            keep = idx == transparent
            px = np.where(keep[:, :, None], region, px)
        canvas[top:top + fh, left:left + fw] = px
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore background (black canvas region)
            canvas[top:top + fh, left:left + fw] = 0
        elif disposal == 3 and prev is not None:
            canvas = prev
        transparent = None
        delay = 0.0
        disposal = 0
    if not frames:
        raise ValueError("GIF without image data")
    return frames, delays


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8."""
    return decode_gif_frames(data)[0][0]


# ----------------------------------------------------------------- encode
def _exact_palette(frames) -> tuple[np.ndarray, list[np.ndarray]]:
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise NotImplementedError(
            f"{len(palette)} distinct colors: exact-palette GIF encode "
            "supports <= 256 (no adaptive quantization)")
    idx_frames = []
    off = 0
    for f in frames:
        n = f.shape[0] * f.shape[1]
        idx_frames.append(inverse[off:off + n].reshape(f.shape[:2]))
        off += n
    return palette, idx_frames


def encode_gif(frames, delays_s=None, loop: bool = True) -> bytes:
    """Encode one frame (``(h, w, 3)`` array) or a list of frames (animated
    GIF89a with per-frame delays, default 0.1 s) — lossless, exact palette."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all GIF frames must share one (h, w)")
    if delays_s is None:
        delays_s = [0.1] * len(frames)
    palette, idx_frames = _exact_palette(frames)
    depth = max(int(np.ceil(np.log2(max(len(palette), 2)))), 1)
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[:len(palette)] = palette
    out = [b"GIF89a",
           struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0),
           table.tobytes()]
    if len(frames) > 1 and loop:
        out.append(b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
    min_code = max(depth, 2)
    for idx, delay in zip(idx_frames, delays_s):
        if len(frames) > 1:
            out.append(b"\x21\xf9\x04" + struct.pack(
                "<BHB", 1 << 2, int(round(delay * 100)), 0) + b"\x00")
        out.append(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
        out.append(bytes([min_code]))
        out.append(_lzw_encode(idx, min_code))
    out.append(b"\x3b")
    return b"".join(out)


def gif_info(data: bytes):
    """Container metadata WITHOUT pixel work: walks the block structure
    skipping LZW payloads.  Returns (w, h, n_frames, duration_s)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed = struct.unpack("<HHB", data[6:11])
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 7))
    n_frames = 0
    duration = 0.0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:
                duration += struct.unpack("<H", body[1:3])[0] / 100.0
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        fpk = data[pos + 8]
        pos += 9
        if fpk & 0x80:
            pos += 3 * (2 << (fpk & 7))
        pos += 1  # LZW min code size
        _, pos = _sub_blocks(data, pos)  # skip compressed payload
        n_frames += 1
    return w, h, n_frames, duration
