"""Image decode / perceptual-feature stage (actor pool).

The 100 TB pipeline's dominant cost is decoding + feature extraction, not
sketching (north_star: "map_batches over zero-copy Arrow batches computes
per-image ... registers ... from caption shingles and phash-derived visual
shingles").  This stage decodes the ``bytes`` column with the engine's
native codecs (``sources/codec.py``: real PNG + LJP1; foreign formats are
stubbed — no PIL/libjpeg in this environment) and recomputes the 64-bit
perceptual hash from the decoded pixels.

Per-row invariant vs the stored metadata (BASELINE.json input_hint): decoded
pixel dims match (w, h) and the recomputed phash matches the stored ``phash``
column bit-for-bit (lossless) — validated in tests and surfaced per row via
``decode_ok``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.codec import (decode_image, phash64, phash64_batch,
                             phash_to_int64)


class DecodeStage:
    """``map_batches`` actor stage: decode -> recompute phash.

    Replaces the ``phash`` column with the freshly computed value (falls back
    to the stored one when no codec is available for a row's format) and
    appends ``decode_ok``.  Runs as an actor pool purely for worker placement
    (codec state is trivial here; a real deployment warms its codecs in
    ``__init__``).
    """

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 phash_col: str = "phash"):
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.phash_col = phash_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        stored = batch[self.phash_col].to_pylist() \
            if self.phash_col in batch.column_names else [0] * len(blobs)
        out_hash = np.empty(len(blobs), dtype=np.int64)
        ok = np.zeros(len(blobs), dtype=bool)
        # decode per row (codec work), then phash in shape-grouped BATCHES
        # (one gray/resize/DCT/median pass per shape — bit-identical to the
        # scalar phash64, ~3x cheaper)
        by_shape: dict = {}
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            try:
                pixels = decode_image(blob, fmt)
                by_shape.setdefault(pixels.shape, ([], []))
                by_shape[pixels.shape][0].append(i)
                by_shape[pixels.shape][1].append(pixels)
                ok[i] = True
            except (NotImplementedError, ValueError):
                out_hash[i] = stored[i]
        for _shape, (idxs, pix) in by_shape.items():
            hashes = phash64_batch(np.stack(pix)).astype(np.int64)
            out_hash[np.asarray(idxs)] = hashes
        cols = {c: batch[c] for c in batch.column_names}
        cols[self.phash_col] = pa.array(out_hash, pa.int64())
        cols["decode_ok"] = pa.array(ok, pa.bool_())
        return pa.table(cols)


def resize_area(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-mean resize of an (h, w, 3) uint8 image (integral-image based;
    exact block means, no interpolation artifacts)."""
    h, w, _ = pixels.shape
    ys = np.arange(out_h + 1) * h // out_h
    xs = np.arange(out_w + 1) * w // out_w
    csum = np.zeros((h + 1, w + 1, 3))
    csum[1:, 1:] = pixels.astype(np.float64).cumsum(0).cumsum(1)
    block = (csum[ys[1:], :][:, xs[1:]] - csum[ys[:-1], :][:, xs[1:]]
             - csum[ys[1:], :][:, xs[:-1]] + csum[ys[:-1], :][:, xs[:-1]])
    areas = np.outer(np.diff(ys), np.diff(xs))[:, :, None]
    return np.clip(np.round(block / np.maximum(areas, 1)), 0, 255).astype(np.uint8)


class ResizeStage:
    """Actor stage: decode -> area resize -> re-encode (PNG).  Output columns
    ``bytes``/``w``/``h``/``fmt`` are replaced; undecodable rows pass through
    untouched with ``resize_ok = False``."""

    def __init__(self, out_h: int = 16, out_w: int = 16,
                 bytes_col: str = "bytes", fmt_col: str = "fmt"):
        self.out_h = out_h
        self.out_w = out_w
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.codec import encode_png

        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out_b, out_f, ok = [], [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                px = decode_image(blob, fmt)
                out_b.append(encode_png(resize_area(px, self.out_h, self.out_w)))
                out_f.append("png")
                ok.append(True)
            except (NotImplementedError, ValueError):
                out_b.append(blob)
                out_f.append(fmt)
                ok.append(False)
        n = batch.num_rows
        cols = {c: batch[c] for c in batch.column_names}
        cols[self.bytes_col] = pa.array(out_b, pa.binary())
        cols[self.fmt_col] = pa.array(out_f, pa.string())
        cols["w"] = pa.array([self.out_w] * n, pa.int32())
        cols["h"] = pa.array([self.out_h] * n, pa.int32())
        cols["resize_ok"] = pa.array(ok, pa.bool_())
        return pa.table(cols)


class ImageFeatureStage:
    """Actor stage: decode -> fixed-length feature vector per image
    (mean RGB, std RGB, 8-bin luminance histogram -> 14 floats) as an
    ``image_features: list<float>`` column — the hand-rolled stand-in for a
    model-embedding stage (a real deployment loads its vision model once per
    actor in ``__init__``; the Ray plumbing here is identical)."""

    DIM = 14

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt"):
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for blob, fmt in zip(batch[self.bytes_col].to_pylist(),
                             batch[self.fmt_col].to_pylist()):
            try:
                px = decode_image(blob, fmt).astype(np.float64)
                lum = px @ np.array([0.299, 0.587, 0.114])
                hist, _ = np.histogram(lum, bins=8, range=(0, 256))
                hist = hist / max(lum.size, 1)
                f = np.concatenate([px.mean(axis=(0, 1)) / 255.0,
                                    px.std(axis=(0, 1)) / 255.0, hist])
            except (NotImplementedError, ValueError):
                f = np.zeros(self.DIM)
            feats.append([float(x) for x in f])
        return batch.append_column(
            "image_features", pa.array(feats, pa.list_(pa.float32())))


class ImageStatsStage:
    """Actor stage: decode -> INTEGER sufficient statistics per image
    (channel-value sum, sum of squares, min, max, count as int64).

    Integer stats make downstream exposure/contrast verdicts pure integer
    inequalities (mean < t  <=>  sum < t*n; var < v  <=>  n*sumsq - sum^2
    < v*n^2), so an image-curation filter built on them is exactly
    reproducible across engines — the image-side analog of the text
    QualityScore contract.  Rows whose format has no codec in this
    environment get n_vals=0 (callers route them to an 'undecodable'
    class rather than silently keeping them)."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt"):
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        m = len(blobs)
        s = np.zeros(m, dtype=np.int64)
        ss = np.zeros(m, dtype=np.int64)
        mn = np.full(m, -1, dtype=np.int64)
        mx = np.full(m, -1, dtype=np.int64)
        nv = np.zeros(m, dtype=np.int64)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            try:
                px = decode_image(blob, fmt).astype(np.int64, copy=False)
            except (NotImplementedError, ValueError):
                continue
            flat = px.ravel()
            s[i] = int(flat.sum())
            ss[i] = int((flat * flat).sum())
            mn[i] = int(flat.min())
            mx[i] = int(flat.max())
            nv[i] = flat.size
        cols = {c: batch[c] for c in batch.column_names
                if c != self.bytes_col}  # drop the payload right here
        cols["px_sum"] = pa.array(s, pa.int64())
        cols["px_sumsq"] = pa.array(ss, pa.int64())
        cols["px_min"] = pa.array(mn, pa.int64())
        cols["px_max"] = pa.array(mx, pa.int64())
        cols["n_vals"] = pa.array(nv, pa.int64())
        return pa.table(cols)


class VideoFrameSampleStage:
    """Video frame sampling (``map_batches`` actor stage).

    REAL paths —

    * MJPEG-in-AVI (``sources/video.py``: RIFF container + the engine's own
      T.81 JPEG codec): sampled frames are extracted as raw JPEG byte
      slices from the container index WITHOUT decoding unsampled frames, so
      cost scales with frames *kept*, not clip length.
    * animated GIF (``sources/gif.py``): composited canvases sampled along
      the GCE delay timeline, re-encoded as standalone PNG blobs.
    * animated WebP (``sources/webp.py``): full-canvas VP8L frames sampled
      along the ANMF duration timeline as re-wrapped byte slices —
      unsampled frames never decode.

    Output schema: ``frames: list<binary>`` (each element a standalone
    image blob downstream stages decode as jpg/png) and
    ``frame_ts: list<float>`` (presentation seconds).

    Other containers (mp4/mkv/webm — inter-frame codecs) remain a
    clearly-marked stub: ``NotImplementedError`` at decode time, or a
    deterministic fake with ``fake=True`` for plumbing tests.
    """

    def __init__(self, every_n_seconds: float = 1.0, fake: bool = False,
                 max_frames: int | None = None):
        self.every = every_n_seconds
        self.fake = fake
        self.max_frames = max_frames

    def _decode_frames(self, blob: bytes, fmt: str):
        if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
            from ..sources.video import sample_frames

            return sample_frames(blob, self.every, self.max_frames)
        if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
            # animated WebP with full-canvas VP8L frames: sampled frames
            # are re-wrapped byte slices (no re-encode, unsampled frames
            # never decode); lossy-VP8 animations raise at decode time
            from ..sources.webp import sample_awebp_frames

            return sample_awebp_frames(blob, self.every, self.max_frames)
        if blob[:4] == b"GIF8":
            # animated GIF (sources/gif.py): composited canvases sampled by
            # their GCE delay timeline, re-encoded as standalone PNG blobs
            # (GIF frames are palette patches, not self-contained images)
            from ..sources.codec import encode_png
            from ..sources.gif import decode_gif_frames

            frames, delays = decode_gif_frames(blob)
            starts = np.concatenate([[0.0], np.cumsum(delays)[:-1]])
            total = float(np.sum(delays))
            targets = np.arange(0.0, max(total, 1e-9),
                                max(self.every, 1e-9))
            idxs = np.unique(np.searchsorted(starts, targets,
                                             side="right") - 1)
            if self.max_frames is not None:
                idxs = idxs[:self.max_frames]
            return ([encode_png(frames[i]) for i in idxs],
                    [float(starts[i]) for i in idxs])
        if self.fake:
            # deterministic fake: derive 3 "frames" (byte slices) per blob
            k = max(len(blob) // 3, 1)
            return [blob[i * k:(i + 1) * k] or b"\0" for i in range(3)], \
                [i * self.every for i in range(3)]
        raise NotImplementedError(
            f"video format {fmt!r}: only MJPEG/AVI decodes in this "
            "environment (inter-frame codecs stubbed; fake=True for "
            "plumbing tests)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames, tss = [], []
        for blob, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            f, ts = self._decode_frames(blob, fmt)
            frames.append(f)
            tss.append(ts)
        out = batch.append_column("frames",
                                  pa.array(frames, pa.list_(pa.binary())))
        return out.append_column("frame_ts",
                                 pa.array(tss, pa.list_(pa.float64())))


class AudioFeatureStage:
    """Audio feature extraction over raw audio bytes (actor-pool
    ``map_batches`` stage).

    REAL paths — RIFF/WAVE via the engine's own parser+codecs
    (``sources/audio.py``): integer PCM 8/16/24/32-bit, IEEE float, G.711
    mu-law / A-law, IMA/DVI ADPCM (4-bit, any channel count, decoded in
    lockstep across blocks); and FLAC (``sources/flac.py`` — full lossless
    decode incl. LPC, CRC + MD5 verified).  The signal is downmixed to
    mono and summarized as DIM=16 features — ``[duration_s, rms,
    zero_crossing_rate, 13 log-magnitude spectral band energies]`` from the
    mean rfft magnitude over 2048-sample frames.

    Remaining foreign formats (mp3/ogg/aac) are a clearly-marked stub: no
    codec exists in this environment, so they raise ``NotImplementedError``
    (or, with ``fake=True``, produce a deterministic pseudo-feature for
    plumbing tests — never silently wrong output).
    """

    DIM = 16
    _N_BANDS = 13
    _FRAME = 2048

    def __init__(self, fake: bool = False, fmt_col: str | None = None):
        self.fake = fake
        self.fmt_col = fmt_col

    def _wav_features(self, blob: bytes) -> list[float]:
        from ..sources.audio import decode_wav

        sig, rate = decode_wav(blob)
        return self._signal_features(sig, rate)

    def _signal_features(self, sig: np.ndarray, rate: int) -> list[float]:
        n = len(sig)
        if n == 0:
            return [0.0] * self.DIM
        duration = n / rate
        rms = float(np.sqrt(np.mean(sig ** 2)))
        zcr = float(np.mean(np.signbit(sig[1:]) != np.signbit(sig[:-1])))
        # mean magnitude spectrum over fixed frames -> log-spaced band energy
        F = self._FRAME
        nfr = max(n // F, 1)
        frames = np.zeros((nfr, F))
        usable = sig[:nfr * F]
        frames[:len(usable) // F] = usable[:len(usable) // F * F] \
            .reshape(-1, F)
        mag = np.abs(np.fft.rfft(frames, axis=1)).mean(axis=0)
        edges = np.unique(np.geomspace(1, len(mag) - 1,
                                       self._N_BANDS + 1).astype(np.int64))
        bands = np.zeros(self._N_BANDS)
        for i in range(min(self._N_BANDS, len(edges) - 1)):
            bands[i] = mag[edges[i]:edges[i + 1] + 1].mean()
        bands = np.log1p(bands)
        return [duration, rms, zcr] + [float(b) for b in bands]

    def _features(self, blob: bytes, fmt: str | None) -> list[float]:
        if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            return self._wav_features(blob)
        if blob[:4] == b"fLaC" or blob[:4] == b"OggS":
            # native FLAC, or FLAC-in-Ogg (the one Ogg mapping whose codec
            # we own — containers.decode_ogg_flac raises
            # NotImplementedError for Vorbis/Opus streams)
            if blob[:4] == b"fLaC":
                from ..sources.flac import decode_flac

                pcm, rate, bps = decode_flac(blob)
            else:
                from ..sources.containers import decode_ogg_flac

                pcm, rate, bps = decode_ogg_flac(blob)
            sig = pcm.astype(np.float64).mean(axis=1) / float(1 << (bps - 1))
            return self._signal_features(sig, rate)
        if self.fake:
            arr = np.frombuffer(blob[:1024].ljust(1024, b"\0"), dtype=np.uint8)
            spec = np.abs(np.fft.rfft(arr.astype(np.float64)))[:self.DIM]
            return [float(x) for x in spec / (spec.max() or 1.0)]
        raise NotImplementedError(
            f"audio format {fmt or blob[:4]!r}: RIFF/WAVE "
            "(PCM/float/G.711/IMA-ADPCM), FLAC and Ogg-FLAC decode in this "
            "environment (mp3/ogg-vorbis/aac stubbed; fake=True for "
            "plumbing)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch[self.fmt_col].to_pylist() if self.fmt_col and \
            self.fmt_col in batch.column_names else [None] * batch.num_rows
        feats = [self._features(blob, fmt)
                 for blob, fmt in zip(batch["bytes"].to_pylist(), fmts)]
        return batch.append_column(
            "audio_features", pa.array(feats, pa.list_(pa.float32())))


class MediaProbeStage:
    """Typed container metadata per blob WITHOUT decoding payloads
    (``sources/video.probe_media``): the filter-before-decode curation op —
    route/drop clips by resolution, duration or codec before any pixel or
    sample work.  Handles AVI / GIF / WAV (fully decodable here) and
    ISO-BMFF mp4/mov (metadata real, payload codecs honestly absent).
    Unknown containers probe as ``container="unknown"`` instead of raising:
    probing IS the classification step."""

    def __init__(self, bytes_col: str = "bytes"):
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.video import probe_media

        rows = {"container": [], "kind": [], "codec": [], "w": [], "h": [],
                "duration_ms": [], "n_frames": [], "decodable": []}
        for blob in batch[self.bytes_col].to_pylist():
            try:
                m = probe_media(blob)
            except (ValueError, NotImplementedError):
                m = {"container": "unknown", "kind": "unknown", "codec": "",
                     "w": 0, "h": 0, "duration_s": 0.0, "n_frames": 0,
                     "decodable": False}
            rows["container"].append(m["container"])
            rows["kind"].append(m["kind"])
            rows["codec"].append(m["codec"])
            rows["w"].append(m["w"])
            rows["h"].append(m["h"])
            rows["duration_ms"].append(
                int(np.floor(m["duration_s"] * 1000 + 0.5)))
            rows["n_frames"].append(m["n_frames"])
            rows["decodable"].append(m["decodable"])
        out = batch
        for name, typ in (("container", pa.string()), ("kind", pa.string()),
                          ("codec", pa.string()), ("w", pa.int32()),
                          ("h", pa.int32()), ("duration_ms", pa.int64()),
                          ("n_frames", pa.int32()),
                          ("decodable", pa.bool_())):
            col = f"media_{name}" if name in out.column_names else name
            out = out.append_column(col, pa.array(rows[name], typ))
        return out
