"""Sketch-construction stage: shingle sets -> MinHash signatures (one per
modality) + SetSketch registers (+ cardinality estimate) per row.

This is the engine's equivalent of the reference's ``add``/``addAll`` folds
(SURVEY.md §2.1) lifted to a batch: one sketch per row, vectorized over the
whole batch.  It is a callable CLASS — run via
``ds.map_batches(SketchStage(cfg), batch_format="pyarrow", concurrency=N)``
so the per-family constant tables (base powers, grids, permutation domains —
the reference's Config objects, ``sketch.hpp:903-960``) are built once per
actor, not once per batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..sketchlib.estimator import SetSketchEstimator
from ..sketchlib.registers import binary_to_rows
from ..sketchlib.sketches import GHLL, MinHash, SetSketch1, SetSketch2


@dataclass(frozen=True)
class Modality:
    """One LSH modality: a shingle column with its own MinHash signature and
    band layout.  Dup pairs matching in ANY modality become candidates."""

    name: str
    shingle_col: str
    minhash_m: int = 128
    num_bands: int = 32
    rows_per_band: int = 4
    threshold: float = 0.55

    @property
    def sig_col(self) -> str:
        return f"minhash_{self.name}"

    @property
    def jaccard_col(self) -> str:
        return f"jaccard_{self.name}"


DEFAULT_MODALITIES = (
    # thresholds apply to EXACT shingle Jaccard (pair verification); LSH
    # banding over the MinHash signature only has to over-generate candidates.
    # cap: stopword-filtered captions leave ~10 shingles; a one-word
    # paraphrase sits near J=0.55, so 48 narrow bands keep band-catch >= 99.5%
    # at that J while exact verification holds the precision line.
    Modality("cap", "shingles_cap", minhash_m=192, num_bands=48,
             rows_per_band=4, threshold=0.50),
    Modality("vis", "shingles_vis", minhash_m=64, num_bands=16,
             rows_per_band=4, threshold=0.60),
)


@dataclass(frozen=True)
class SketchConfig:
    """Pipeline sketch configuration (mirrors the reference configs)."""

    modalities: tuple = DEFAULT_MODALITIES
    family: str = "ghll"          # registers family: ghll | setsketch1 | setsketch2
    m: int = 256
    base: float = 2.0
    q: int = 62
    a: float = 20.0               # ignored for ghll (a = 1/m)
    compute_registers: bool = True

    def make_registers_sketch(self):
        if self.family == "ghll":
            return GHLL(m=self.m, base=self.base, q=self.q)
        if self.family == "setsketch1":
            return SetSketch1(m=self.m, base=self.base, a=self.a, q=self.q)
        if self.family == "setsketch2":
            return SetSketch2(m=self.m, base=self.base, a=self.a, q=self.q)
        raise ValueError(self.family)

    def make_estimator(self) -> SetSketchEstimator:
        a_eff = 1.0 / self.m if self.family == "ghll" else self.a
        return SetSketchEstimator(self.q, a_eff, self.base, self.m,
                                  card_range_correction=(self.family == "ghll"),
                                  joint_range_correction=(self.family == "ghll"))


def list_column_to_flat(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (values, offsets) view of a list<uint64> Arrow column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = np.asarray(arr.offsets, dtype=np.int64)
    values = np.asarray(arr.values, dtype=np.uint64)
    # a sliced ListArray's offsets don't start at 0; normalize
    if offsets[0] != 0:
        values = values[offsets[0]:offsets[-1]]
        offsets = offsets - offsets[0]
    return values, offsets


def list_u64_to_binary(col) -> pa.Array:
    """list<uint64> -> binary (one little-endian u64 blob per row).  Arrow's
    acero hash join cannot carry list columns as payload; binary works."""
    values, offsets = list_column_to_flat(col)
    byte_offsets = (offsets * 8).astype(np.int32)
    buf = np.ascontiguousarray(values).tobytes()
    return pa.BinaryArray.from_buffers(
        pa.binary(), len(offsets) - 1,
        [None, pa.py_buffer(byte_offsets.tobytes()), pa.py_buffer(buf)])


def binary_to_flat_u64(col) -> tuple[np.ndarray, np.ndarray]:
    """binary column of u64 blobs -> (flat values, element offsets)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    bufs = arr.buffers()
    byte_offsets = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset:arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint64)
    offsets = (byte_offsets.astype(np.int64) // 8)
    values = data[offsets[0]:offsets[-1]]
    return values, offsets - offsets[0]


def matrix_to_fixed_binary(mat: np.ndarray) -> pa.FixedSizeBinaryArray:
    """(rows, m) matrix -> fixed_size_binary column (contiguous buffer)."""
    mat = np.ascontiguousarray(mat)
    width = mat.shape[1] * mat.dtype.itemsize
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(width), mat.shape[0], [None, pa.py_buffer(mat.tobytes())])


def fixed_binary_to_matrix(col, dtype, m: int) -> np.ndarray:
    """fixed_size_binary column -> (rows, m) matrix view (zero-copy)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr.type, pa.FixedSizeBinaryType):
        width = arr.type.byte_width
        buf = arr.buffers()[1]
        flat = np.frombuffer(buf, dtype=dtype)
        start = arr.offset * (width // np.dtype(dtype).itemsize)
        return flat[start:start + len(arr) * m].reshape(len(arr), m)
    # variable-width binary fallback (e.g. after a cast)
    return binary_to_rows([arr[i].as_py() for i in range(len(arr))], dtype, m)


class SketchStage:
    """shingle lists -> ``minhash_<mod>`` signature columns, ``regs``
    (SetSketch registers over the union of all modality sets), ``cardinality``
    (simple-estimator distinct-shingle count); drops the shingle lists."""

    def __init__(self, cfg: SketchConfig = SketchConfig(), drop_shingles: bool = True):
        self.cfg = cfg
        self.minhashes = {mod.name: MinHash(mod.minhash_m)
                          for mod in cfg.modalities}
        self.regs_sketch = cfg.make_registers_sketch() if cfg.compute_registers else None
        self.estimator = cfg.make_estimator() if cfg.compute_registers else None
        self.drop_shingles = drop_shingles

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch
        union_vals, union_offs = [], None
        for mod in self.cfg.modalities:
            if mod.shingle_col not in batch.column_names:
                continue
            values, offsets = list_column_to_flat(batch[mod.shingle_col])
            sig = self.minhashes[mod.name].sketch_rows(values, offsets)
            out = out.append_column(mod.sig_col, matrix_to_fixed_binary(sig))
            union_vals.append((values, offsets))
        if self.regs_sketch is not None and union_vals:
            # union set per row across modalities
            n = batch.num_rows
            sizes = sum(np.diff(o) for _, o in union_vals)
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(sizes, out=offsets[1:])
            flat = np.empty(offsets[-1], dtype=np.uint64)
            cursor = offsets[:-1].copy()
            for vals, offs in union_vals:
                ln = np.diff(offs)
                for i in range(n):
                    if ln[i]:
                        flat[cursor[i]:cursor[i] + ln[i]] = vals[offs[i]:offs[i + 1]]
                        cursor[i] += ln[i]
            regs = self.regs_sketch.sketch_rows(flat, offsets)
            card = self.estimator.estimate_cardinality_simple(regs)
            out = out.append_column("regs", matrix_to_fixed_binary(regs))
            out = out.append_column("cardinality", pa.array(card, pa.float64()))
        if self.drop_shingles:
            out = out.drop_columns([m.shingle_col for m in self.cfg.modalities
                                    if m.shingle_col in out.column_names])
        return out


class FusedDecodeShingleSketch:
    """decode -> drop-heavy -> shingle -> sketch in ONE map stage.

    The separate stages pay two extra object-store round trips for the
    hottest intermediates (4 KB/image pixel tables, then shingle lists);
    at full 32-core occupancy the map path is DRAM-bandwidth-bound
    (BASELINE.md scaling forensics), so keeping those intermediates in the
    worker heap trades nothing and removes ~2/3 of the shared-memory
    traffic.  Enable via ``DedupConfig(fuse_map=True)``; results are
    bit-identical to the unfused path (same kernels, same batch rows).
    """

    def __init__(self, cfg: SketchConfig, ngrams=(1, 2),
                 use_phash: bool = True, drop_shingles: bool = False):
        from .image import DecodeStage
        from .shingle import ShingleStage

        self.decode = DecodeStage()
        self.shingle = ShingleStage(ngrams=ngrams, use_phash=use_phash)
        self.sketch = SketchStage(cfg, drop_shingles=drop_shingles)
        self._heavy = ("bytes", "w", "h", "fmt", "decode_ok")

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.decode(batch)
        drop = [c for c in self._heavy if c in t.column_names]
        if drop:
            t = t.drop_columns(drop)
        t = self.shingle(t)
        return self.sketch(t)
