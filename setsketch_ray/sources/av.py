"""Deterministic synthetic video (MJPEG/AVI) and audio (WAV) corpora.

Same contract as ``sources/images.py``: every row is a pure function of
(seed, index) via counter-mode hashing (``sketchlib/hashing.mix2``), so
distributed generation, retries and re-runs are bit-identical — no
worker-local RNG state (CLAUDE.md determinism rule).

Videos: each clip is a smooth gradient scene with a bright square moving
one step per frame (content the JPEG codec holds >= 40 dB on at q90),
encoded as real MJPEG-in-AVI (``sources/video.py``) or, for ~1/4 of
clips, as a posterized animated GIF (``sources/gif.py``).  Audio: 2-tone
signals stored across the four real WAV codecs (PCM16 / G.711 mu-law /
A-law / IMA ADPCM, ``sources/audio.py``) — a corpus whose decode path
exercises every compressed branch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketchlib.hashing import mix2
from .audio import (encode_wav_alaw, encode_wav_ima, encode_wav_pcm16,
                    encode_wav_ulaw)
from .gif import encode_gif
from .video import encode_avi_mjpeg


def _u(seed: int, idx, tag: int) -> np.ndarray:
    return mix2(mix2(np.asarray(idx, dtype=np.uint64), seed), tag)


# ------------------------------------------------------------------ video
def video_frames(seed: int, idx: int, size: int = 32):
    """The clip's frames + fps + container, derived purely from (seed, idx).

    ~1/4 of clips are animated GIFs (posterized so the exact-palette
    encoder applies), the rest MJPEG/AVI — both real decode paths."""
    h0 = int(_u(seed, idx, 11))
    n_frames = 4 + h0 % 5                      # 4..8
    fps = float(2 + (h0 >> 8) % 3)             # 2/3/4 fps
    fmt = "gif" if (h0 >> 56) % 4 == 0 else "avi"
    gx = 80 + (h0 >> 16) % 120
    gy = 20 + (h0 >> 24) % 60
    tint = np.array([(h0 >> 32) % 40, (h0 >> 40) % 40, (h0 >> 48) % 40],
                    dtype=np.float64)
    base = (np.linspace(0, gx, size)[None, :, None]
            + np.linspace(0, gy, size)[:, None, None] + tint[None, None, :])
    frames = []
    side = max(size // 4, 2)
    for i in range(n_frames):
        f = base.copy()
        x = (2 + (side // 2) * i) % max(size - side, 1)
        y = (size - side) // 2
        f[y:y + side, x:x + side] = 235.0
        f = np.clip(np.round(f), 0, 255).astype(np.uint8)
        if fmt == "gif":
            f = (f >> 5) << 5  # posterize: <= 256 distinct colors
        frames.append(f)
    return frames, fps, fmt


def generate_video_rows(indices, seed: int = 42, size: int = 32) -> pa.Table:
    ids, blobs, ws, hs, fmts, nfs, fpss = [], [], [], [], [], [], []
    for idx in np.asarray(indices, dtype=np.int64):
        idx = int(idx)
        frames, fps, fmt = video_frames(seed, idx, size)
        if fmt == "gif":
            blobs.append(encode_gif(frames, delays_s=[1.0 / fps] * len(frames)))
        else:
            blobs.append(encode_avi_mjpeg(frames, fps=fps, quality=90))
        ids.append(f"vid{idx:010d}")
        ws.append(size)
        hs.append(size)
        fmts.append(fmt)
        nfs.append(len(frames))
        fpss.append(fps)
    return pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "n_frames": pa.array(nfs, pa.int32()),
        "fps": pa.array(fpss, pa.float64()),
    })


def videos_dataset(n_rows: int, seed: int = 42, size: int = 32,
                   parallelism: int = 16):
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return generate_video_rows(batch["id"].to_numpy(), seed, size)

    # batch_size=None: one batch per generation block (see images.py note
    # on the bundling parallelism collapse)
    return rd.range(n_rows, override_num_blocks=parallelism).map_batches(
        gen, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------------------ audio
_AUDIO_FMTS = ("pcm16", "ulaw", "alaw", "ima")
# block_align 256 keeps the ADPCM state machine's sequential span short
# (505 lockstep steps/block instead of 2041): encode AND decode cost per
# clip drops ~4x with identical audio semantics
_AUDIO_ENC = {"pcm16": encode_wav_pcm16, "ulaw": encode_wav_ulaw,
              "alaw": encode_wav_alaw,
              "ima": lambda pcm, rate: encode_wav_ima(pcm, rate, 256)}


def audio_signal(seed: int, idx: int, rate: int = 8000,
                 seconds: float = 0.5) -> np.ndarray:
    """Deterministic 2-tone int16 signal for row ``idx``."""
    h = int(_u(seed, idx, 21))
    f1 = 150.0 + (h % 1800)
    f2 = 150.0 + ((h >> 16) % 1800)
    amp = 12000 + (h >> 32) % 12000
    t = np.arange(int(rate * seconds)) / rate
    sig = 0.7 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    return np.round(amp * sig).astype(np.int16)


def generate_audio_rows(indices, seed: int = 42, rate: int = 8000) -> pa.Table:
    ids, blobs, fmts = [], [], []
    for idx in np.asarray(indices, dtype=np.int64):
        idx = int(idx)
        fmt = _AUDIO_FMTS[int(_u(seed, idx, 22)) % len(_AUDIO_FMTS)]
        pcm = audio_signal(seed, idx, rate)
        blobs.append(_AUDIO_ENC[fmt](pcm, rate))
        ids.append(f"aud{idx:010d}")
        fmts.append(fmt)
    return pa.table({
        "audio_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "fmt": pa.array(fmts, pa.string()),
        "rate": pa.array([rate] * len(ids), pa.int32()),
    })


def audio_dataset(n_rows: int, seed: int = 42, rate: int = 8000,
                  parallelism: int = 16):
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return generate_audio_rows(batch["id"].to_numpy(), seed, rate)

    return rd.range(n_rows, override_num_blocks=parallelism).map_batches(
        gen, batch_format="pyarrow", batch_size=None)
