"""Register-matrix helpers.

The reference stores one sketch as ``std::vector<R>`` of m registers
(``/root/reference/c++/sketch.hpp:767-894``).  The engine stores a *batch* of
sketches as a single ``(rows, m)`` NumPy matrix so all per-batch work is
vectorized; merge is a register-wise max (min for MinHash), cf.
``sketch.hpp:817-825, 876-881, 1599-1603``.
"""

from __future__ import annotations

import numpy as np


def scatter_max(regs_flat: np.ndarray, idx: np.ndarray, vals: np.ndarray) -> None:
    """regs_flat[idx] = max(regs_flat[idx], vals), with duplicate indices.

    ``np.maximum.at`` is correct but slow; instead we pack (idx, val) into a
    single uint64 key, sort, and keep the last (= max val) entry per index,
    after which indices are unique and fancy assignment applies.
    Requires vals < 2**24 (register levels are <= q+1 <= 65535, and
    HyperMinHash packed values need <= 17 bits).
    """
    if len(idx) == 0:
        return
    small_vals = np.max(vals, initial=0) < 64
    if small_vals and len(regs_flat) * 64 <= (1 << 24):
        # tiny-target fast path (dataset-level sketches): histogram presence
        # of (register, level) pairs, then per-register max level — one
        # bincount pass instead of a sort
        key = idx.astype(np.int64) * 64 + vals.astype(np.int64)
        counts = np.bincount(key, minlength=len(regs_flat) * 64)
        present = counts.reshape(len(regs_flat), 64) > 0
        has_any = present.any(axis=1)
        kmax = 63 - np.argmax(present[:, ::-1], axis=1)
        upd = has_any & (kmax > regs_flat)
        regs_flat[upd] = kmax[upd].astype(regs_flat.dtype)
        return
    if small_vals and len(regs_flat) < (1 << 26):
        # compact fast path: (idx, val) fits a uint32 key -> ~2x faster sort
        key32 = ((idx.astype(np.uint32) << np.uint32(6))
                 | vals.astype(np.uint32))
        key32.sort(kind="stable")
        i = (key32 >> np.uint32(6)).astype(np.int64)
        v = key32 & np.uint32(0x3F)
        last = np.empty(len(i), dtype=bool)
        last[:-1] = i[1:] != i[:-1]
        last[-1] = True
        iu = i[last]
        vu = v[last].astype(regs_flat.dtype)
        regs_flat[iu] = np.maximum(regs_flat[iu], vu)
        return
    key = (idx.astype(np.uint64) << np.uint64(24)) | vals.astype(np.uint64)
    key.sort(kind="stable")
    i = (key >> np.uint64(24)).astype(np.int64)
    v = key & np.uint64(0xFFFFFF)
    last = np.empty(len(i), dtype=bool)
    last[:-1] = i[1:] != i[:-1]
    last[-1] = True
    iu = i[last]
    vu = v[last].astype(regs_flat.dtype)
    regs_flat[iu] = np.maximum(regs_flat[iu], vu)


def value_dtype(q: int):
    """Smallest unsigned dtype that can hold register values 0..q+1
    (cf. register value types chosen per config, ``cardinality_test.cpp:107-123``)."""
    if q + 1 <= np.iinfo(np.uint8).max:
        return np.uint8
    if q + 1 <= np.iinfo(np.uint16).max:
        return np.uint16
    return np.uint32


def rows_to_binary(regs: np.ndarray) -> list[bytes]:
    """Serialize each row of a register matrix to bytes (for Arrow binary
    columns carried through shuffles)."""
    return [row.tobytes() for row in np.ascontiguousarray(regs)]


def binary_to_rows(buffers, dtype, m: int) -> np.ndarray:
    """Inverse of :func:`rows_to_binary`: stack binary buffers into (rows, m)."""
    if len(buffers) == 0:
        return np.empty((0, m), dtype=dtype)
    joined = b"".join(buffers)
    out = np.frombuffer(joined, dtype=dtype).reshape(len(buffers), m)
    return out
