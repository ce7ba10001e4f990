"""Deterministic synthetic video (MJPEG/AVI) and audio (WAV) corpora.

Same contract as ``sources/images.py``: every row is a pure function of
(seed, index) via counter-mode hashing (``sketchlib/hashing.mix2``), so
distributed generation, retries and re-runs are bit-identical — no
worker-local RNG state (CLAUDE.md determinism rule).

Videos: each clip is a smooth gradient scene with a bright square moving
one step per frame (content the JPEG codec holds >= 40 dB on at q90),
encoded as real MJPEG-in-AVI (``sources/video.py``), posterized animated
GIF (``sources/gif.py``) or lossless animated WebP (``sources/webp.py``)
— three real containers through the same dedup pipeline.  Audio: 2-tone
signals stored across six real codecs — the four WAV codecs (PCM16 /
G.711 mu-law / A-law / IMA ADPCM, ``sources/audio.py``), native FLAC
(``sources/flac.py``) and FLAC-in-Ogg (``sources/containers.py``) — a
corpus whose decode path exercises every compressed branch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketchlib.hashing import mix2
from .audio import (encode_wav_alaw, encode_wav_ima, encode_wav_pcm16,
                    encode_wav_ulaw)
from .containers import encode_ogg_flac
from .flac import encode_flac
from .gif import encode_gif
from .video import encode_avi_mjpeg


def _u(seed: int, idx, tag: int) -> np.ndarray:
    return mix2(mix2(np.asarray(idx, dtype=np.uint64), seed), tag)


# ------------------------------------------------------------------ video
_VBLOCK = 8


def _vcluster_size(seed: int, block: int) -> int:
    h = int(_u(seed, block, 111))
    return 1 if h % 100 < 65 else 2 + (h // 100) % 3  # 2..4


def _video_role(seed: int, idx: int):
    """-> (base_key, variant, cluster_id or -1) — images.py block scheme."""
    block = idx // _VBLOCK
    pos = idx % _VBLOCK
    s = _vcluster_size(seed, block)
    if s >= 2 and pos < s:
        return int(_u(seed, block, 222)), pos, block
    return int(_u(seed, idx, 333)), 0, -1


def video_frames(seed: int, idx: int, size: int = 32):
    """The clip's frames + fps + container, purely from (seed, idx).

    Scenes are the images corpus's blocky-noise generator panned 3 px/frame
    (phash-separable across clips; cross-clip min Hamming >= ~14).  Planted
    near-dup variants per cluster: v0 original AVI q90, v1 lossy AVI q75
    re-encode, v2 container swap (posterized animated GIF or LOSSLESS
    animated WebP by base-key parity), v3 first-frame trim.  Singletons
    mix ~1/4 GIF + ~1/4 animated WebP for container diversity."""
    from .images import _synth_pixels

    base_key, variant, cluster = _video_role(seed, idx)
    n_frames = 4 + base_key % 5                      # 4..8
    fps = float(2 + (base_key >> 8) % 3)             # 2/3/4 fps
    scene = _synth_pixels(base_key, size)
    frames = [np.roll(scene, 3 * i, axis=1) for i in range(n_frames)]
    if variant == 1:
        return frames, fps, "avi75"
    if variant == 2:
        # container swap: animated GIF or (lossless) animated WebP
        return frames, fps, ("gif" if base_key & 1 else "awebp")
    if variant == 3:
        return frames[1:], fps, "avi"
    if cluster < 0:
        mix = int(_u(seed, idx, 444)) % 4
        if mix == 0:
            return frames, fps, "gif"
        if mix == 1:
            return frames, fps, "awebp"
    return frames, fps, "avi"


def _encode_clip(frames, fps: float, fmt: str) -> tuple[bytes, str]:
    if fmt == "gif":
        post = [(f >> 4) << 4 for f in frames]
        try:
            return encode_gif(post, delays_s=[1.0 / fps] * len(post)), "gif"
        except NotImplementedError:  # > 256 colors: posterize harder
            post = [(f >> 5) << 5 for f in frames]
            return encode_gif(post, delays_s=[1.0 / fps] * len(post)), "gif"
    if fmt == "awebp":
        from .webp import encode_awebp

        return encode_awebp(frames, [1.0 / fps] * len(frames)), "webp"
    q = 75 if fmt == "avi75" else 90
    return encode_avi_mjpeg(frames, fps=fps, quality=q), "avi"


def generate_video_rows(indices, seed: int = 42, size: int = 32) -> pa.Table:
    ids, blobs, ws, hs, fmts, nfs, fpss = [], [], [], [], [], [], []
    for idx in np.asarray(indices, dtype=np.int64):
        idx = int(idx)
        frames, fps, fmt = video_frames(seed, idx, size)
        blob, stored_fmt = _encode_clip(frames, fps, fmt)
        blobs.append(blob)
        ids.append(f"vid{idx:010d}")
        ws.append(size)
        hs.append(size)
        fmts.append(stored_fmt)
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


def truth_video_pairs(n_rows: int, seed: int = 42) -> pa.Table:
    """All intra-cluster (id_a < id_b) pairs — analytic, no video synthesis."""
    id_a, id_b, cid = [], [], []
    for block in range((n_rows + _VBLOCK - 1) // _VBLOCK):
        s = _vcluster_size(seed, block)
        if s < 2:
            continue
        members = [block * _VBLOCK + p for p in range(s)
                   if block * _VBLOCK + p < n_rows]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                id_a.append(f"vid{members[i]:010d}")
                id_b.append(f"vid{members[j]:010d}")
                cid.append(block)
    return pa.table({
        "id_a": pa.array(id_a, pa.string()),
        "id_b": pa.array(id_b, pa.string()),
        "cluster_id": pa.array(cid, pa.int64()),
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
_AUDIO_FMTS = ("pcm16", "ulaw", "alaw", "ima", "flac", "oggflac")
# block_align 256 keeps the ADPCM state machine's sequential span short
# (505 lockstep steps/block instead of 2041): encode AND decode cost per
# clip drops ~4x with identical audio semantics
_AUDIO_ENC = {"pcm16": encode_wav_pcm16, "ulaw": encode_wav_ulaw,
              "alaw": encode_wav_alaw,
              "ima": lambda pcm, rate: encode_wav_ima(pcm, rate, 256),
              "flac": encode_flac, "oggflac": encode_ogg_flac}


def _tone_signal(h: int, rate: int = 8000,
                 seconds: float = 0.5) -> np.ndarray:
    """Deterministic 2-tone int16 signal from a 64-bit key."""
    f1 = 150.0 + (h % 1800)
    f2 = 150.0 + ((h >> 16) % 1800)
    amp = 12000 + (h >> 32) % 12000
    t = np.arange(int(rate * seconds)) / rate
    sig = 0.7 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    return np.round(amp * sig).astype(np.int16)


def audio_signal(seed: int, idx: int, rate: int = 8000,
                 seconds: float = 0.5) -> np.ndarray:
    """Deterministic 2-tone int16 signal for row ``idx``."""
    return _tone_signal(int(_u(seed, idx, 21)), rate, seconds)


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


# --------------------------------------------------- audio dedup corpus
_ADBLOCK = 8


def _acluster_size(seed: int, block: int) -> int:
    h = int(_u(seed, block, 555))
    return 1 if h % 100 < 65 else 2 + (h // 100) % 3  # 2..4


def _audio_role(seed: int, idx: int):
    """-> (base_key, variant, cluster_id or -1) — the video-corpus block
    scheme over audio clips."""
    block = idx // _ADBLOCK
    pos = idx % _ADBLOCK
    s = _acluster_size(seed, block)
    if s >= 2 and pos < s:
        return int(_u(seed, block, 666)), pos, block
    return int(_u(seed, idx, 777)), 0, -1


def audio_dedup_clip(seed: int, idx: int, rate: int = 8000):
    """Waveform + codec for the dedup corpus row ``idx``.

    Cluster members share the base waveform (pure function of the block
    key, 1 Hz tone granularity): v0 = PCM16 original, v1 = lossy G.711
    mu-law re-encode, v2 = IMA ADPCM re-encode, v3 = 50 ms head trim
    (PCM16).  Singletons rotate through all six codecs for diversity."""
    base_key, variant, cluster = _audio_role(seed, idx)
    sig = _tone_signal(base_key, rate)
    if variant == 1:
        return sig, "ulaw"
    if variant == 2:
        return sig, "ima"
    if variant == 3:
        return sig[int(rate * 0.05):], "pcm16"
    if cluster < 0:
        return sig, _AUDIO_FMTS[int(_u(seed, idx, 888)) % len(_AUDIO_FMTS)]
    return sig, "pcm16"


def generate_audio_dedup_rows(indices, seed: int = 42,
                              rate: int = 8000) -> pa.Table:
    ids, blobs, fmts = [], [], []
    for idx in np.asarray(indices, dtype=np.int64):
        idx = int(idx)
        sig, fmt = audio_dedup_clip(seed, idx, rate)
        blobs.append(_AUDIO_ENC[fmt](sig, rate))
        ids.append(f"aud{idx:010d}")
        fmts.append(fmt)
    return pa.table({
        "audio_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "fmt": pa.array(fmts, pa.string()),
        "rate": pa.array([rate] * len(ids), pa.int32()),
    })


def truth_audio_pairs(n_rows: int, seed: int = 42) -> pa.Table:
    """All intra-cluster (id_a < id_b) pairs — analytic, no synthesis."""
    id_a, id_b, cid = [], [], []
    for block in range((n_rows + _ADBLOCK - 1) // _ADBLOCK):
        s = _acluster_size(seed, block)
        if s < 2:
            continue
        members = [block * _ADBLOCK + p for p in range(s)
                   if block * _ADBLOCK + p < n_rows]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                id_a.append(f"aud{members[i]:010d}")
                id_b.append(f"aud{members[j]:010d}")
                cid.append(block)
    return pa.table({
        "id_a": pa.array(id_a, pa.string()),
        "id_b": pa.array(id_b, pa.string()),
        "cluster_id": pa.array(cid, pa.int64()),
    })


def audio_dedup_dataset(n_rows: int, seed: int = 42, rate: int = 8000,
                        parallelism: int = 16):
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return generate_audio_dedup_rows(batch["id"].to_numpy(), seed, rate)

    return rd.range(n_rows, override_num_blocks=parallelism).map_batches(
        gen, batch_format="pyarrow", batch_size=None)
