"""Real video container codec: Motion-JPEG in AVI (RIFF), pure Python/NumPy.

The reference has no video at all; the pipeline brief requires multimodal
frame-sampling stages.  Round 2 shipped the stage CONTRACT with a declared
stub ("no video codec in this environment").  This module closes that gap
with a genuinely decodable format: AVI 1.0 (Microsoft RIFF container,
public spec) carrying one 'vids' stream whose frames are baseline JPEGs
produced/consumed by the engine's own T.81 codec (``sources/jpeg.py``).

Design points that matter at 100 TB:

* **Frame sampling never decodes unsampled frames.**  :func:`sample_frames`
  walks the RIFF chunk index, picks the frame indices for the requested
  timestamps, and slices ONLY those '00dc' chunks out of the blob.  Pixel
  decode is the caller's choice (the sampled frames are themselves valid
  JPEG blobs that flow through the existing image stages as ``fmt="jpg"``
  rows) — so a 1-frame-per-minute sample of an hour-long clip costs 60
  container-header reads + 60 JPEG decodes, not 108 000.
* **Zero-copy-ish extraction**: sampled frames are ``bytes`` slices of the
  input blob; no re-encode.

Format notes (all public: MS AVI RIFF spec / OpenDML): ``RIFF('AVI ' LIST
('hdrl' avih LIST('strl' strh strf)) LIST('movi' 00dc...) idx1)``.  Chunks
are word-aligned (odd sizes padded with one byte).  fps = strh.dwRate /
strh.dwScale.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(frames, fps: float = 10.0, quality: int = 85) -> bytes:
    """Encode an iterable of (h, w, 3) uint8 frames as an MJPEG AVI.

    All frames must share one shape (AVI streams are fixed-dimension).
    ``fps`` is stored as a dwRate/dwScale rational (scale 1000).
    """
    frames = list(frames)
    if not frames:
        raise ValueError("cannot encode an empty AVI")
    h, w = frames[0].shape[:2]
    jpegs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all AVI frames must share one (h, w)")
        jpegs.append(encode_jpeg(np.ascontiguousarray(f), quality))
    scale = 1000
    rate = int(round(fps * scale))
    max_sz = max(len(j) for j in jpegs)
    usec_per_frame = int(round(1e6 * scale / max(rate, 1)))

    avih = struct.pack(
        "<14I", usec_per_frame, max_sz * int(np.ceil(fps)), 0,
        0x10,  # AVIF_HASINDEX
        len(jpegs), 0, 1, max_sz, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, scale, rate, 0,
                          len(jpegs), max_sz, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    # BITMAPINFOHEADER, biCompression='MJPG'
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_chunks = []
    idx = []
    # idx1 offsets are relative to the start of the 'movi' fourcc
    off = 4
    for j in jpegs:
        c = _chunk(b"00dc", j)
        movi_chunks.append(c)
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += len(c)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, list_kind_or_None, payload_start, payload_len)."""
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if tag in (b"LIST", b"RIFF"):
            yield tag, data[pos + 8:pos + 12], pos + 12, size - 4
        else:
            yield tag, None, pos + 8, size
        pos += 8 + size + (size & 1)


class AviInfo:
    """Parsed container metadata + frame chunk locations (no pixel work)."""

    __slots__ = ("width", "height", "fps", "n_frames", "frame_spans")

    def __init__(self, width, height, fps, frame_spans):
        self.width = width
        self.height = height
        self.fps = fps
        self.frame_spans = frame_spans  # list of (start, length) into blob
        self.n_frames = len(frame_spans)


def parse_avi(data: bytes) -> AviInfo:
    """Walk the RIFF tree; return stream geometry + per-frame byte spans."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') blob")
    width = height = 0
    fps = 0.0
    usec = 0
    spans: list[tuple[int, int]] = []

    def walk(pos, end):
        nonlocal width, height, fps, usec
        for tag, kind, p, ln in _iter_chunks(data, pos, end):
            if tag == b"LIST" and kind in (b"hdrl", b"strl", b"movi",
                                           b"rec "):
                walk(p, p + ln)
            elif tag == b"avih":
                (usec,) = struct.unpack("<I", data[p:p + 4])
                width, height = struct.unpack("<II", data[p + 32:p + 40])
            elif tag == b"strh" and data[p:p + 4] == b"vids":
                scale, rate = struct.unpack("<II", data[p + 20:p + 28])
                if scale:
                    fps = rate / scale
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                spans.append((p, ln))

    walk(12, len(data))
    if not fps:
        fps = 1e6 / usec if usec else 25.0
    return AviInfo(width, height, fps, spans)


def sample_frames(data: bytes, every_n_seconds: float = 1.0,
                  max_frames: int | None = None):
    """Sample frames at a fixed period WITHOUT decoding pixels.

    Returns ``(frame_blobs, timestamps)`` — each blob is the raw baseline
    JPEG for that frame (a bytes slice of the container), each timestamp the
    frame's presentation time in seconds.  The first frame is always
    included.  At most one frame per container frame (periods shorter than
    the frame interval degrade to every-frame).
    """
    info = parse_avi(data)
    if info.n_frames == 0:
        return [], []
    step = max(int(round(every_n_seconds * info.fps)), 1)
    idxs = range(0, info.n_frames, step)
    if max_frames is not None:
        idxs = list(idxs)[:max_frames]
    blobs, ts = [], []
    for i in idxs:
        s, ln = info.frame_spans[i]
        blobs.append(data[s:s + ln])
        ts.append(i / info.fps)
    return blobs, ts


def decode_avi_frames(data: bytes, every_n_seconds: float = 1.0,
                      max_frames: int | None = None):
    """Sample + pixel-decode: returns ``(list[(h,w,3) uint8], timestamps)``."""
    blobs, ts = sample_frames(data, every_n_seconds, max_frames)
    return [decode_jpeg(b) for b in blobs], ts


def probe_media(blob: bytes) -> dict:
    """ffprobe-lite over every container this engine understands: typed
    metadata WITHOUT decoding payloads.  Keys: container, kind, codec, w,
    h, duration_s, n_frames (0 if unknown), decodable (whether this
    engine's codecs can produce pixels/samples for it).

    AVI/GIF/WAV/FLAC metadata AND payloads are fully real; ISO-BMFF
    (mp4/mov), Ogg (Vorbis/Opus/Theora/FLAC/Speex), Matroska/WebM and
    MPEG audio (mp3) are metadata-only (``sources/mp4.py`` /
    ``sources/containers.py`` — their payload codecs have no decoder in
    this environment), letting a curation pipeline filter by
    resolution/duration/codec before any decode attempt.
    """
    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
        info = parse_avi(blob)
        return {"container": "avi", "kind": "video", "codec": "mjpeg",
                "w": info.width, "h": info.height,
                "duration_s": info.n_frames / info.fps if info.fps else 0.0,
                "n_frames": info.n_frames, "decodable": True}
    if blob[:4] == b"GIF8":
        from .gif import gif_info

        w, h, n, dur = gif_info(blob)
        return {"container": "gif", "kind": "video" if n > 1 else "image",
                "codec": "lzw", "w": w, "h": h, "duration_s": dur,
                "n_frames": n, "decodable": True}
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        from .audio import _WAV_TAGS, wav_info

        wi = wav_info(blob)
        return {"container": "wav", "kind": "audio", "codec": wi["codec"],
                "w": 0, "h": 0, "duration_s": wi["duration_s"],
                "n_frames": 0,
                "decodable": wi["codec"] in set(_WAV_TAGS.values())}
    if blob[:4] == b"fLaC":
        from .flac import flac_info

        fi = flac_info(blob)
        return {"container": "flac", "kind": "audio", "codec": "flac",
                "w": 0, "h": 0, "duration_s": fi["duration_s"],
                "n_frames": 0, "decodable": True}
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        from .webp import webp_info

        wi = webp_info(blob)
        return {"container": "webp", "kind": wi["kind"],
                "codec": wi["codec"], "w": wi["w"], "h": wi["h"],
                "duration_s": wi["duration_s"], "n_frames": wi["n_frames"],
                # VP8L stills AND full-canvas-VP8L animations decode for
                # real (sources/webp.py); lossy VP8 payloads do not
                "decodable": wi["decodable"]}
    if blob[:4] == b"OggS":
        from .containers import ogg_info

        oi = ogg_info(blob)
        return {"container": "ogg", "kind": oi["kind"],
                "codec": oi["codec"], "w": oi["w"], "h": oi["h"],
                "duration_s": oi["duration_s"], "n_frames": 0,
                # FLAC-in-Ogg decodes for real (containers.decode_ogg_flac
                # -> our native FLAC decoder); Vorbis/Opus/Theora have no
                # codec in this environment
                "decodable": oi["codec"] == "flac"}
    if blob[:4] == b"\x1aE\xdf\xa3":
        from .containers import mkv_info

        mi = mkv_info(blob)
        vid = next((t for t in mi["tracks"] if t["kind"] == "video"),
                   None)
        first = vid or (mi["tracks"][0] if mi["tracks"] else None)
        return {"container": mi["container"],
                "kind": first["kind"] if first else "unknown",
                "codec": first["codec"] if first else "",
                "w": vid["w"] if vid else 0, "h": vid["h"] if vid else 0,
                "duration_s": mi["duration_s"], "n_frames": 0,
                "decodable": False}  # no VP8/VP9/AV1/Opus codec here
    if len(blob) >= 12 and blob[4:8] == b"ftyp" \
            and blob[8:12] in (b"avif", b"avis", b"heic", b"heix",
                               b"mif1", b"msf1"):
        from .mp4 import heif_info

        hi = heif_info(blob)
        return {"container": "heif",
                "kind": "video" if hi["brand"] in ("avis", "msf1")
                else "image",
                "codec": hi["brand"], "w": hi["w"], "h": hi["h"],
                "duration_s": 0.0, "n_frames": 0,
                "decodable": False}  # no AV1/HEVC intra decoder here
    if len(blob) >= 12 and blob[4:8] == b"ftyp":
        from .mp4 import parse_mp4

        info = parse_mp4(blob)
        vid = next((t for t in info["tracks"] if t["kind"] == "video"),
                   None)
        first = vid or (info["tracks"][0] if info["tracks"] else None)
        return {"container": "mp4",
                "kind": first["kind"] if first else "unknown",
                "codec": first["codec"] if first else "",
                "w": vid["w"] if vid else 0, "h": vid["h"] if vid else 0,
                "duration_s": info["duration_s"], "n_frames": 0,
                "decodable": False}  # honest: no AVC/HEVC/AAC codec here
    # MPEG audio LAST: the sync-word test is permissive (0xFF 0xEx-0xFx
    # prefixes collide with other binary formats), so only blobs no other
    # container claimed get the frame walk.  ID3-tagged files are
    # unambiguous.
    if blob[:3] == b"ID3" or (len(blob) >= 4 and blob[0] == 0xFF
                              and (blob[1] & 0xE0) == 0xE0):
        from .containers import mp3_info

        ai = mp3_info(blob)  # raises ValueError if no frames parse
        return {"container": "mp3", "kind": "audio", "codec": ai["codec"],
                "w": 0, "h": 0, "duration_s": ai["duration_s"],
                "n_frames": ai["n_frames"],
                "decodable": False}  # no MPEG audio decoder here
    raise ValueError("unrecognized media container")
