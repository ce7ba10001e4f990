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

from ..sources.codec import decode_image, phash64, phash_to_int64


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
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            try:
                pixels = decode_image(blob, fmt)
                out_hash[i] = phash_to_int64(phash64(pixels))
                ok[i] = True
            except (NotImplementedError, ValueError):
                out_hash[i] = stored[i]
        cols = {c: batch[c] for c in batch.column_names}
        cols[self.phash_col] = pa.array(out_hash, pa.int64())
        cols["decode_ok"] = pa.array(ok, pa.bool_())
        return pa.table(cols)
