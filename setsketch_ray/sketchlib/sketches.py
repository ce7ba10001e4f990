"""The five sketch families: batch-vectorized construction + merge algebra.

Semantics follow the reference (file:line cites below are relative to
``/root/reference/c++/``), re-expressed as NumPy batch kernels:

* a *row* is one set; a batch of rows is sketched into a ``(rows, m)``
  register matrix in one vectorized pass;
* all randomness is counter-mode hashing of the element value
  (:mod:`.hashing`), so a sketch is a pure function of its element multiset —
  stream/bulk/merge equivalence holds by construction
  (cf. ``bulk_update_test.cpp:86``);
* merge is register-wise max (min for MinHash): commutative, associative,
  idempotent (``sketch.hpp:817-825, 876-881, 1599-1603, 1962-1967``).

Rows are given Arrow-style: a flat uint64 ``values`` array plus int64
``offsets`` of length rows+1 (zero-copy from ``pa.list_(pa.uint64())``).
"""

from __future__ import annotations

import numpy as np

from .hashing import (
    FeistelPermutation,
    bounded_uint,
    exponential,
    mix2,
    mix_columns,
    trailing_ones,
    truncated_exponential,
    uniform_double,
)
from .registers import scatter_max, value_dtype

U64 = np.uint64

# counter-space layout for per-element draws (keep disjoint per purpose)
_CTR_POINT = 1          # GHLL uniform draw / HMH geometric draw
_CTR_INDEX = 2          # register-index draw
_CTR_AUG = 3            # HyperMinHash sub-bucket bits
_CTR_PERM = 7           # Feistel permutation key derivation
_CTR_SS1 = 1 << 20      # SetSketch1 exponential draws (slot i -> _CTR_SS1 + i)
_CTR_SS2 = 1 << 21      # SetSketch2 truncated-exp draws (slot i -> _CTR_SS2 + i)

_BULK_SUCCESS_P = 0.95  # bulkAddFirstAttemptSuccessProbability, sketch.hpp:1085
_GOLDEN_SEED = U64(0x9E3779B97F4A7C15)


def _sizes(offsets: np.ndarray) -> np.ndarray:
    return np.diff(offsets)


def _row_ids(offsets: np.ndarray) -> np.ndarray:
    sizes = _sizes(offsets)
    return np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)


def _seg_indices(starts: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Flat element indices of variable-size segments, no Python loop."""
    out_off = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=out_off[1:])
    return (np.arange(out_off[-1], dtype=np.int64)
            - np.repeat(out_off[:-1], sizes)
            + np.repeat(starts, sizes))


class _MaxMergeSketch:
    """Shared behavior for register-max sketches (GHLL/HLL/SetSketch/HMH)."""

    m: int
    dtype: type

    def empty(self, rows: int) -> np.ndarray:
        return np.zeros((rows, self.m), dtype=self.dtype)

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Register-wise max (``sketch.hpp:817-825, 876-881``)."""
        return np.maximum(a, b)

    def merge_rows(self, regs: np.ndarray) -> np.ndarray:
        """Union of all row sketches into one (dataset-level aggregate)."""
        if regs.shape[0] == 0:
            return np.zeros(self.m, dtype=self.dtype)
        return regs.max(axis=0)

    def sketch_rows(self, values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        regs = self.empty(len(offsets) - 1)
        self.add_flat(regs, _row_ids(offsets), values)
        return regs


class _LogMapping:
    """Discretization x -> level k with b^-k < x <= b^-(k-1), capped at q+1.

    Closed-form equivalent of the reference's table-walk ``Mapping::map``
    (``sketch.hpp:722-759``): k = floor(-log_b(x)) + 1 clipped to [0, q+1],
    with x <= b^-q (incl. x == 0) mapping to q+1 and x > 1 mapping to 0
    (level 0 == "no update").
    """

    def __init__(self, base: float, q: int):
        self.base = float(base)
        self.q = int(q)
        self.inv_log_base = 1.0 / np.log(base)

    def map_levels(self, x: np.ndarray) -> np.ndarray:
        with np.errstate(divide="ignore"):
            k = np.floor(-np.log(x) * self.inv_log_base) + 1.0
        k = np.where(np.isnan(k), 0.0, k)
        return np.clip(k, 0.0, self.q + 1).astype(np.int64)


class GHLL(_MaxMergeSketch):
    """GeneralizedHyperLogLog (``sketch.hpp:1034-1061``): per element one
    uniform draw discretized geometrically, one uniform register index."""

    name = "GeneralizedHyperLogLog"

    def __init__(self, m: int, base: float = 2.0, q: int = 62):
        self.m = int(m)
        self.base = float(base)
        self.q = int(q)
        self.a = 1.0 / m
        self.dtype = value_dtype(q)
        self.mapping = _LogMapping(base, q)

    # L2-cache-sized element chunks: the per-element math is ~15 vector
    # passes; chunking keeps intermediates cache-resident so concurrent
    # workers don't fight for DRAM bandwidth (measured 5-10x slowdown at 32
    # concurrent tasks without it on bandwidth-limited hosts)
    _cache_chunk = 1 << 17

    def add_flat(self, regs: np.ndarray, row_ids: np.ndarray, values: np.ndarray) -> None:
        n = len(values)
        if n == 0:
            return
        regs_flat = regs.reshape(-1)
        # vectorized lower-bound fast path (RegistersWithLowerBound,
        # sketch.hpp:767-841 / early exit sketch.hpp:1047): an element whose
        # level is <= the row's current MIN register can't update anything,
        # so it skips the index draw and the scatter sort entirely.  The
        # cached minima are refreshed per chunk (stale-low minima only make
        # the filter conservative, never wrong); as a sketch saturates the
        # surviving fraction ~ m*q/n -> 0 and cost/element falls like the
        # reference's O(1) amortized insert.
        #
        # The survivor filter runs BEFORE floor/clip/cast: for an integer
        # row minimum rmin >= 0, clip(floor(y)+1, 0, q+1) > rmin is exactly
        # y >= rmin in IEEE (floor(y) >= rmin <=> y >= rmin for integral
        # rmin), so the steady-state per-element cost is one mix, one
        # uniform draw, one log, one in-place multiply, one compare — the
        # level discretization and second hash run only on the surviving
        # ~m*q/n fraction.  (y = log(u) * -inv_log_base is bit-identical
        # to -log(u) * inv_log_base: IEEE sign flips commute with *.)
        row_min = regs.min(axis=1).astype(np.int64)
        single = regs.shape[0] == 1
        neg_inv = -self.mapping.inv_log_base
        qp1 = float(self.q + 1)
        for lo in range(0, n, self._cache_chunk):
            hi = min(lo + self._cache_chunk, n)
            v = values[lo:hi]
            u = uniform_double(mix2(v, _CTR_POINT))
            with np.errstate(divide="ignore"):
                np.log(u, out=u)
            u *= neg_inv
            if single:
                rel = u >= float(row_min[0])
            else:
                rel = u >= row_min[row_ids[lo:hi]]
            if not rel.any():
                continue
            v, y = v[rel], u[rel]
            k = np.floor(y)
            k += 1.0
            np.clip(k, 0.0, qp1, out=k)
            k = k.astype(np.int64)
            idx = bounded_uint(mix2(v, _CTR_INDEX), self.m)
            if single:
                scatter_max(regs_flat, idx.astype(np.int64), k)
                row_min[0] = regs_flat.min()
            else:
                rid = row_ids[lo:hi][rel]
                flat = rid * self.m + idx.astype(np.int64)
                scatter_max(regs_flat, flat, k)
                touched = np.unique(rid)
                row_min[touched] = regs[touched].min(axis=1)


class HLL(_MaxMergeSketch):
    """Classic HyperLogLog (``sketch.hpp:1063-1083``): register index = top p
    bits of the element hash, value = 1 + trailing ones of the low bits."""

    name = "HyperLogLog"

    def __init__(self, p: int, q: int):
        assert p + q <= 64
        self.p = int(p)
        self.q = int(q)
        self.m = 1 << p
        self.base = 2.0
        self.a = 1.0 / self.m
        self.dtype = value_dtype(q)

    _cache_chunk = 1 << 18

    def add_flat(self, regs: np.ndarray, row_ids: np.ndarray, values: np.ndarray) -> None:
        n = len(values)
        if n == 0:
            return
        regs_flat = regs.reshape(-1)
        # lower-bound fast path as in GHLL (guarded insert, sketch.hpp:1072);
        # single-row sketches compare against a SCALAR minimum (no gather)
        row_min = regs.min(axis=1).astype(np.int64)
        single = regs.shape[0] == 1
        for lo in range(0, n, self._cache_chunk):
            d = np.asarray(values[lo:lo + self._cache_chunk], dtype=np.uint64)
            k = trailing_ones(d, self.q) + 1
            if single:
                rel = k > row_min[0]
            else:
                rel = k > row_min[row_ids[lo:lo + self._cache_chunk]]
            if not rel.any():
                continue
            d, k = d[rel], k[rel]
            idx = (d >> U64(64 - self.p)).astype(np.int64)
            if single:
                scatter_max(regs_flat, idx, k)
                row_min[0] = regs_flat.min()
            else:
                rid = row_ids[lo:lo + self._cache_chunk][rel]
                flat = rid * self.m + idx
                scatter_max(regs_flat, flat, k)
                touched = np.unique(rid)
                row_min[touched] = regs[touched].min(axis=1)


class _BulkLimitSketch(_MaxMergeSketch):
    """Shared bulk path for the SetSketch variants: process only points below
    a per-row limit, verify, retry with a raised limit (``addAll``,
    ``sketch.hpp:1200-1221``); provably identical to the unbounded stream."""

    def sketch_rows(self, values: np.ndarray, offsets: np.ndarray,
                    attempts_out: np.ndarray | None = None) -> np.ndarray:
        """``attempts_out`` (int64, len rows) receives the per-row attempt
        count like the reference's ``addAll`` numAttempts out-param
        (``sketch.hpp:1201``, measured in ``data/bulk_update_test*.csv``)."""
        rows = len(offsets) - 1
        regs = self.empty(rows)
        sizes = _sizes(offsets)
        row_ids = _row_ids(offsets)
        values = np.asarray(values, dtype=np.uint64)
        limit_inc_row = np.where(sizes > 0,
                                 self.limit_factor / np.maximum(sizes, 1),
                                 np.inf)
        attempt = np.ones(rows, dtype=np.int64)
        todo = np.flatnonzero(sizes > 0)
        while todo.size:
            limits_row = limit_inc_row * attempt
            sel = np.isin(row_ids, todo)
            self._process(regs, row_ids[sel], values[sel],
                          limits_row[row_ids[sel]])
            # bulk verification (sketch.hpp:1210-1214): success iff the limit
            # maps to a level <= the row's min register level, i.e. no point
            # above the limit could still update any register.
            klow = regs[todo].min(axis=1).astype(np.int64)
            lim = limits_row[todo]
            failed = (klow <= self.q) & \
                (lim <= self.base ** (-klow.astype(np.float64)))
            todo = todo[failed]
            attempt[todo] += 1
        if attempts_out is not None:
            attempts_out[:] = attempt
        return regs


class SetSketch1(_BulkLimitSketch):
    """SetSketch variant 1 (``sketch.hpp:1087-1222``): per element a sequence
    of order-statistic points x_i = sum_{j<=i} Exp_j / (a (m-j)), each mapped
    to a geometric level and scattered to a without-replacement register slot
    (Feistel permutation standing in for ``PermutationStream``,
    ``bitstream_random.hpp:279-330``).

    ``sketch_rows`` uses the reference's bulk point-limit heuristic
    (``addAll``, ``sketch.hpp:1200-1221``): only points below a per-row limit
    are processed, with a per-row verification + retry loop; the result is
    provably identical to the unbounded stream (``bulk_update_test.cpp:86``).
    """

    name = "SetSketch1"
    _chunk = 32

    def __init__(self, m: int, base: float = 2.0, a: float = 20.0, q: int = 62):
        self.m = int(m)
        self.base = float(base)
        self.a = float(a)
        self.q = int(q)
        self.dtype = value_dtype(q)
        self.mapping = _LogMapping(base, q)
        # 1/(a(m-i)), sketch.hpp:1122
        self.factors = 1.0 / (a * (m - np.arange(m, dtype=np.float64)))
        # limit formula, sketch.hpp:1114
        self.limit_factor = -np.log1p(-_BULK_SUCCESS_P ** (1.0 / m)) / a
        self.perm = FeistelPermutation(self.m)

    def _process(self, regs: np.ndarray, row_ids: np.ndarray, values: np.ndarray,
                 limits: np.ndarray, dynamic_stop: bool = False) -> None:
        """Scatter all points of ``values`` with x <= limits into ``regs``."""
        n = len(values)
        if n == 0:
            return
        perm_keys = mix2(values, _CTR_PERM)
        active = np.arange(n)
        x = np.zeros(n, dtype=np.float64)
        regs_flat = regs.reshape(-1)
        i = 0
        chunk = 4
        while i < self.m and active.size:
            c = min(chunk, self.m - i)
            chunk = min(chunk * 2, 128)
            va = values[active]
            ctr = np.arange(_CTR_SS1 + i, _CTR_SS1 + i + c, dtype=np.uint64)
            draws = exponential(mix2(va[:, None], ctr[None, :]))
            xs = x[active, None] + np.cumsum(draws * self.factors[i:i + c], axis=1)
            inlimit = xs <= limits[active, None]
            if inlimit.any():
                e_sel, c_sel = np.nonzero(inlimit)
                k = self.mapping.map_levels(xs[e_sel, c_sel])
                rel = k > 0
                e_sel, c_sel, k = e_sel[rel], c_sel[rel], k[rel]
                ridx = self.perm.apply(perm_keys[active[e_sel]],
                                       (i + c_sel).astype(np.uint64)).astype(np.int64)
                flat = row_ids[active[e_sel]] * self.m + ridx
                scatter_max(regs_flat, flat, k)
            x[active] = xs[:, -1]
            keep = inlimit[:, -1]
            # the reference's lower-bound early exit (sketch.hpp:1182-1184):
            # once an element's running point maps to a level <= the row's
            # min register, no future (larger) point can update anything.
            # Streaming mode only — the bulk point limit already truncates.
            if dynamic_stop and active.size:
                k_last = self.mapping.map_levels(xs[:, -1])
                row_min = regs.min(axis=1).astype(np.int64)
                keep = keep & (k_last > row_min[row_ids[active]])
            active = active[keep]
            i += c

    def add_flat(self, regs: np.ndarray, row_ids: np.ndarray, values: np.ndarray) -> None:
        """Streaming add (no point limit) — matches ``SetSketch1::add``
        (``sketch.hpp:1196-1198``) including the lower-bound early exit."""
        limits = np.full(len(values), np.inf)
        self._process(regs, np.asarray(row_ids, dtype=np.int64),
                      np.asarray(values, dtype=np.uint64), limits,
                      dynamic_stop=True)


class SetSketch2(_BulkLimitSketch):
    """SetSketch variant 2 (``sketch.hpp:1224-1372``): points sit on the fixed
    grid gamma_i/a = log1p(i/(m-i))/a with truncated-exponential interpolation
    between grid points and a plain exponential tail after the last one."""

    name = "SetSketch2"
    _chunk = 32

    def __init__(self, m: int, base: float = 2.0, a: float = 20.0, q: int = 62):
        self.m = int(m)
        self.base = float(base)
        self.a = float(a)
        self.q = int(q)
        self.dtype = value_dtype(q)
        self.mapping = _LogMapping(base, q)
        i = np.arange(m, dtype=np.float64)
        # gammaTimesAInv grid, sketch.hpp:1264-1265
        self.grid = np.log1p(i / (m - i)) / a
        # truncated-exp rates per gap, sketch.hpp:1263
        self.rates = np.log1p(1.0 / (m - 1 - np.arange(m - 1, dtype=np.float64)))
        self.widths = np.diff(self.grid)
        self.a_inv = 1.0 / a
        self.limit_factor = -np.log1p(-_BULK_SUCCESS_P ** (1.0 / m)) / a
        self.perm = FeistelPermutation(self.m)

    def _points_chunk(self, va: np.ndarray, i: int, c: int) -> np.ndarray:
        """Points for slots [i, i+c) for each element in va -> (len(va), c)."""
        ctr = np.arange(_CTR_SS2 + i, _CTR_SS2 + i + c, dtype=np.uint64)
        h = mix2(va[:, None], ctr[None, :])
        if i + c <= self.m - 1:
            return self.grid[i:i + c] + self.widths[i:i + c] * \
                truncated_exponential(h, self.rates[i:i + c])
        # last slot uses an untruncated exponential tail (sketch.hpp:1330)
        xs = np.empty((len(va), c), dtype=np.float64)
        if c > 1:
            xs[:, :-1] = self.grid[i:i + c - 1] + self.widths[i:i + c - 1] * \
                truncated_exponential(h[:, :-1], self.rates[i:i + c - 1])
        xs[:, -1] = self.grid[-1] + self.a_inv * exponential(h[:, -1])
        return xs

    def _process(self, regs: np.ndarray, row_ids: np.ndarray, values: np.ndarray,
                 limits: np.ndarray, dynamic_stop: bool = False) -> None:
        n = len(values)
        if n == 0:
            return
        perm_keys = mix2(values, _CTR_PERM)
        active = np.arange(n)
        regs_flat = regs.reshape(-1)
        i = 0
        chunk = 4
        while i < self.m and active.size:
            c = min(chunk, self.m - i)
            chunk = min(chunk * 2, 128)
            xs = self._points_chunk(values[active], i, c)
            inlimit = xs <= limits[active, None]
            if inlimit.any():
                e_sel, c_sel = np.nonzero(inlimit)
                k = self.mapping.map_levels(xs[e_sel, c_sel])
                rel = k > 0
                e_sel, c_sel, k = e_sel[rel], c_sel[rel], k[rel]
                ridx = self.perm.apply(perm_keys[active[e_sel]],
                                       (i + c_sel).astype(np.uint64)).astype(np.int64)
                flat = row_ids[active[e_sel]] * self.m + ridx
                scatter_max(regs_flat, flat, k)
            keep = inlimit[:, -1]
            # lower-bound early exit, streaming mode (see SetSketch1._process)
            if dynamic_stop and active.size:
                k_last = self.mapping.map_levels(xs[:, -1])
                row_min = regs.min(axis=1).astype(np.int64)
                keep = keep & (k_last > row_min[row_ids[active]])
            active = active[keep]
            i += c

    def add_flat(self, regs: np.ndarray, row_ids: np.ndarray, values: np.ndarray) -> None:
        limits = np.full(len(values), np.inf)
        self._process(regs, np.asarray(row_ids, dtype=np.int64),
                      np.asarray(values, dtype=np.uint64), limits,
                      dynamic_stop=True)


class MinHash:
    """Classic m-permutation MinHash (``sketch.hpp:1579-1612``): register j of
    element d is an independent 64-bit draw keyed by (d, j); state =
    element-wise minimum.  Draws use the cheap column mix (the O(n*m) draw
    matrix is the family's entire cost, ``performance_test`` MinHash rows in
    BASELINE.md)."""

    name = "MinHash"
    dtype = np.uint64
    _tile_bytes = 1 << 20  # both draw buffers together (~L2; tuned r2)

    def __init__(self, m: int):
        from .hashing import mix64 as _mix64

        self.m = int(m)
        self.seeds = _mix64(np.arange(m, dtype=np.uint64) * _GOLDEN_SEED
                            + U64(0xA076_1D64_78BD_642F))
        # elements per draw tile so BOTH (m, tile) u64 buffers stay
        # L2-resident (empirically the fastest point at m=128..1024)
        self._tile = max(64, self._tile_bytes // (16 * self.m))

    def empty(self, rows: int) -> np.ndarray:
        return np.full((rows, self.m), np.iinfo(np.uint64).max, dtype=np.uint64)

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Register-wise min (``sketch.hpp:1599-1603``)."""
        return np.minimum(a, b)

    def merge_rows(self, regs: np.ndarray) -> np.ndarray:
        if regs.shape[0] == 0:
            return np.full(self.m, np.iinfo(np.uint64).max, dtype=np.uint64)
        return regs.min(axis=0)

    def _min_into(self, vals: np.ndarray, out_row: np.ndarray,
                  buf: np.ndarray, tmp: np.ndarray) -> None:
        """Fold all draws of ``vals`` into ``out_row`` (m,) register-wise min,
        tile by tile so the draw matrix never leaves cache.  ``buf``/``tmp``
        are FLAT pools reshaped per tile — slicing a 2-D buffer would give
        non-contiguous views that drop numpy to its strided slow path."""
        from .hashing import mix_columns_into

        for lo in range(0, len(vals), self._tile):
            w = min(self._tile, len(vals) - lo)
            b = buf[:self.m * w].reshape(self.m, w)
            t = tmp[:self.m * w].reshape(self.m, w)
            mix_columns_into(vals[lo:lo + w], self.seeds, b, t)
            np.minimum(out_row, b.min(axis=1), out=out_row)

    def sketch_rows(self, values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Per-row signature minima, cache-tiled (VERDICT r1 perf item):
        rows are processed in SIZE-SORTED groups padded to the group's max
        row width — padding repeats each row's own first element, so the
        min is unchanged and no mask pass is needed — and reduced with one
        strided ``min(axis=2)`` instead of ``np.minimum.reduceat`` (whose
        per-element inner loop dominated the old kernel).  The (m, tile)
        draw buffers are reused across groups and stay cache-resident.
        Empty rows keep the empty signature (all-max) by construction."""
        rows = len(offsets) - 1
        out = self.empty(rows)
        values = np.asarray(values, dtype=np.uint64)
        offsets = np.asarray(offsets, dtype=np.int64)
        sizes = np.diff(offsets)
        order = np.argsort(sizes, kind="stable")
        order = order[sizes[order] > 0]
        if len(order) == 0:
            return out
        from .hashing import mix_columns_into

        buf = np.empty(self.m * self._tile, dtype=np.uint64)
        tmp = np.empty_like(buf)
        i = 0
        while i < len(order):
            if sizes[order[i]] > self._tile:
                r = order[i]
                self._min_into(values[offsets[r]:offsets[r + 1]], out[r],
                               buf, tmp)
                i += 1
                continue
            j = i + 1
            while j < len(order) and \
                    (j - i + 1) * sizes[order[j]] <= self._tile:
                j += 1
            rs = order[i:j]
            szs = sizes[rs]
            P = int(szs[-1])  # sorted: last is the group max
            R = len(rs)
            src = _seg_indices(offsets[rs], szs)
            vals_pad = np.repeat(values[offsets[rs]], P)  # own-first padding
            dst = _seg_indices(np.arange(R, dtype=np.int64) * P, szs)
            vals_pad[dst] = values[src]
            b = buf[:self.m * R * P].reshape(self.m, R * P)
            t = tmp[:self.m * R * P].reshape(self.m, R * P)
            mix_columns_into(vals_pad, self.seeds, b, t)
            out[rs] = b.reshape(self.m, R, P).min(axis=2).T
            i = j
        return out

    def add_flat(self, regs: np.ndarray, row_ids: np.ndarray, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        order = np.argsort(row_ids, kind="stable")
        vals = np.asarray(values, dtype=np.uint64)[order]
        rid = np.asarray(row_ids)[order]
        uniq, starts = np.unique(rid, return_index=True)
        mins = self.sketch_rows(vals, np.append(starts, len(vals)))
        regs[uniq] = np.minimum(regs[uniq], mins)


class HyperMinHash(_MaxMergeSketch):
    """HyperMinHash (``sketch.hpp:1873-1960``): HLL geometric value (capped at
    2^bucketsize) packed with ``subbucketsize`` extra uniform bits."""

    name = "HyperMinHash"

    def __init__(self, bucketbits: int = 12, bucketsize: int = 6, subbucketsize: int = 10):
        assert 1 <= bucketsize <= 6 and bucketbits + subbucketsize <= 64
        self.bucketbits = bucketbits
        self.bucketsize = bucketsize
        self.subbucketsize = subbucketsize
        self.m = 1 << bucketbits
        self.dtype = np.uint32
        self.max_val = 1 << bucketsize
        self.sub_mask = (1 << subbucketsize) - 1

    def add_flat(self, regs: np.ndarray, row_ids: np.ndarray, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        d = np.asarray(values, dtype=np.uint64)
        y = mix2(d, _CTR_POINT)
        # val = 1 + trailing ones, capped at 2^bucketsize (sketch.hpp:1945-1952)
        val = trailing_ones(y, self.max_val - 1) + 1
        idx = (mix2(d, _CTR_INDEX) >> U64(64 - self.bucketbits)).astype(np.int64)
        aug = (mix2(d, _CTR_AUG) & U64(self.sub_mask)).astype(np.int64)
        update = (val << self.subbucketsize) | aug
        flat = row_ids * self.m + idx
        scatter_max(regs.reshape(-1), flat, update)


def make_sketch(name: str, **kwargs):
    """Factory by family name (mirrors the reference's config templates)."""
    families = {
        "ghll": GHLL, "hll": HLL, "setsketch1": SetSketch1,
        "setsketch2": SetSketch2, "minhash": MinHash, "hyperminhash": HyperMinHash,
    }
    return families[name.lower()](**kwargs)
