"""Mergeable approximate-quantile sketch (KLL-style compactor stack).

The exact distributed quantiles in ``functions/relational.py``
(``quantiles_fixedpoint``) shuffle one row per DISTINCT value — right for
fixed-point money/score columns, wrong for unbounded float domains at
100 TB.  This sketch is the scale path for those: a compactor stack in the
KLL / Manku-Rajagopalan-Lindsay family (Karnin-Lang-Liberty, FOCS 2016;
public algorithm), fully mergeable (partial sketches per block ->
associative merge -> one tiny final state), with O(k log(n/k)) space and
uniform rank error ~ O(1/k) at the default geometry.

Determinism is load-bearing in this engine (CLAUDE.md): instead of RNG
state, compaction's odd/even choice comes from counter-mode hashing of
(level, compaction counter, seed) — bit-identical results across workers,
reruns and merge orders of the same multiset stream, with the same error
guarantees in practice (the classic deterministic-alternation variant;
rank-error bounds are asserted empirically in tests up to 10^6 values).

Weights are exact: a level-L item represents 2^L input values, and
``rank()`` sums weights below the query point, so n is preserved exactly.
"""

from __future__ import annotations

import numpy as np

from .hashing import mix2


class KllSketch:
    """Approximate quantiles over float64 values.

    ``k`` is the top-compactor capacity; lower levels shrink geometrically
    (factor 2/3, floor 8).  Typical error at k=200: |est_rank - true_rank|
    <= ~1% of n (asserted in tests).
    """

    _DECAY_NUM, _DECAY_DEN = 2, 3
    _MIN_CAP = 8

    def __init__(self, k: int = 200, seed: int = 0):
        if k < self._MIN_CAP:
            raise ValueError(f"k must be >= {self._MIN_CAP}")
        self.k = int(k)
        self.seed = int(seed)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self._compactions = 0

    # ------------------------------------------------------------- capacity
    def _capacity(self, level: int) -> int:
        """Capacity of ``level`` counted from the TOP of the stack."""
        depth = len(self.levels) - 1 - level
        cap = self.k
        for _ in range(depth):
            cap = cap * self._DECAY_NUM // self._DECAY_DEN
        return max(cap, self._MIN_CAP)

    # ----------------------------------------------------------------- add
    def add_flat(self, values: np.ndarray) -> None:
        """Bulk-add a float64 array (NaNs rejected — define a policy
        upstream; nulls should be dropped before the sketch)."""
        v = np.asarray(values, np.float64).ravel()
        if np.isnan(v).any():
            raise ValueError("KllSketch: NaN values are not rankable")
        if v.size == 0:
            return
        self.n += v.size
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    # ------------------------------------------------------------ compress
    def _compress(self) -> None:
        lvl = 0
        while lvl < len(self.levels):
            if self.levels[lvl].size <= self._capacity(lvl):
                lvl += 1
                continue
            buf = np.sort(self.levels[lvl], kind="stable")
            if buf.size % 2:
                # hold one item back so pairs are exact halves
                keep_last, buf = buf[-1:], buf[:-1]
            else:
                keep_last = np.empty(0, np.float64)
            # deterministic "coin": counter-mode hash of (level,
            # compaction counter) — no RNG state anywhere
            coin = int(mix2(np.uint64(lvl + 1),
                            (self._compactions << 8) ^ self.seed)) & 1
            self._compactions += 1
            promoted = buf[coin::2]
            self.levels[lvl] = keep_last
            if lvl + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[lvl + 1] = np.concatenate(
                [self.levels[lvl + 1], promoted])
            lvl += 1

    # --------------------------------------------------------------- merge
    def merge(self, other: "KllSketch") -> "KllSketch":
        """Associative merge (level-wise concatenate, then compress)."""
        if other.k != self.k:
            raise ValueError("merging KLL sketches of different k")
        out = KllSketch(self.k, self.seed)
        out.n = self.n + other.n
        out._compactions = self._compactions + other._compactions
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        for lv in range(depth):
            a = self.levels[lv] if lv < len(self.levels) \
                else np.empty(0, np.float64)
            b = other.levels[lv] if lv < len(other.levels) \
                else np.empty(0, np.float64)
            out.levels.append(np.concatenate([a, b]))
        out._compress()
        return out

    # ------------------------------------------------------------- queries
    def _weighted_items(self):
        items = []
        weights = []
        for lv, buf in enumerate(self.levels):
            if buf.size:
                items.append(buf)
                weights.append(np.full(buf.size, 1 << lv, np.int64))
        if not items:
            return (np.empty(0, np.float64), np.empty(0, np.int64))
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def rank(self, value: float) -> int:
        """Estimated number of inputs <= value."""
        it, wt = self._weighted_items()
        return int(wt[it <= value].sum())

    def quantile(self, phi: float) -> float:
        """Value whose estimated rank is ``ceil(phi * n)`` (phi in (0, 1];
        phi=0 returns the smallest retained item)."""
        it, wt = self._weighted_items()
        if it.size == 0:
            raise ValueError("empty sketch")
        target = max(1, int(np.ceil(phi * self.n)))
        cum = np.cumsum(wt)
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(it[min(idx, it.size - 1)])

    def quantiles(self, phis) -> np.ndarray:
        return np.array([self.quantile(p) for p in phis], np.float64)

    # ------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        """Compact binary state (for Arrow binary columns / object store):
        header (k, seed, n, compactions, n_levels) + per-level arrays."""
        import struct

        head = struct.pack("<qqqqq", self.k, self.seed, self.n,
                           self._compactions, len(self.levels))
        parts = [head]
        for buf in self.levels:
            parts.append(struct.pack("<q", buf.size))
            parts.append(np.ascontiguousarray(buf).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KllSketch":
        import struct

        k, seed, n, comps, n_levels = struct.unpack_from("<qqqqq", blob, 0)
        off = 40
        out = cls(k, seed)
        out.n = n
        out._compactions = comps
        out.levels = []
        for _ in range(n_levels):
            (sz,) = struct.unpack_from("<q", blob, off)
            off += 8
            out.levels.append(np.frombuffer(blob, np.float64, count=sz,
                                            offset=off).copy())
            off += 8 * sz
        return out
