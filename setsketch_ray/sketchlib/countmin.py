"""Count-Min sketch — mergeable approximate-frequency sketch.

The engine's counting family so far: exact distributed wordcount
(``functions/text.word_topk``), exact two-pass heavy hitters (Misra-Gries
sweep + certified recount) and cardinality sketches (GHLL/SetSketch/...).
The Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch and its applications", J. Algorithms 2005 —
public algorithm) fills the remaining slot: *point-frequency estimates over
an unbounded key domain in fixed memory*, the scale path when even the
distinct (word, cnt) pairs of an exact wordcount are too wide to shuffle
(10^9+ token vocabularies with URL/hash tokens at 100 TB).

Properties used by the engine:

- **Linear sketch**: the counter matrix of a union stream is the
  elementwise SUM of the matrices of its parts, so per-block partials
  merge associatively/commutatively — one ``map_batches`` pass emits a
  fixed-size blob per block and the driver (or a combine tree) sums them.
- **One-sided error**: ``estimate(k) >= true(k)`` always (each of the
  ``depth`` counters only ever over-counts); the over-estimate of the
  row-``r`` counter is the colliding mass ``sum_{k': h_r(k')=h_r(k)}
  true(k')``, expected ``(n - true(k)) / width`` per row, and the final
  ``min`` over rows makes large overshoots exponentially unlikely
  (``P[err > e*n/width] <= exp(-depth)``).
- **Determinism** (load-bearing repo convention): the ``depth`` hash rows
  are counter-mode draws ``mix2(key, row_salt)`` (``hashing.py``), so the
  sketch — and hence every estimate — is a pure function of the input
  multiset, identical across workers, merge orders and reruns.

No conservative update: it would break linearity (merge-by-sum), which is
what makes the sketch a one-pass distributed aggregate here.
"""

from __future__ import annotations

import numpy as np

from .hashing import U64, mix2, mix64

_MAGIC = b"CMS1"


class CountMinSketch:
    """Approximate frequencies of uint64 keys in ``depth * width`` int64
    counters.  ``width`` must be a power of two (mask indexing)."""

    def __init__(self, width: int = 1 << 13, depth: int = 5, seed: int = 0):
        if width < 2 or width & (width - 1):
            raise ValueError("width must be a power of two >= 2")
        if not 1 <= depth <= 64:
            raise ValueError("depth must be in [1, 64]")
        self.width = int(width)
        self.depth = int(depth)
        self.seed = int(seed)
        self.table = np.zeros((self.depth, self.width), np.int64)
        self.n = 0  # total weight added (exact)

    # ------------------------------------------------------------ internals
    def _row_salts(self) -> np.ndarray:
        # one independent counter-mode stream per row; mix64 decorrelates
        # (seed, row) pairs across sketch configs sharing a seed.
        base = U64((self.seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        return mix64(base + np.arange(self.depth, dtype=np.uint64))

    def _indices(self, keys: np.ndarray) -> np.ndarray:
        """(depth, n) counter indices for ``keys`` (uint64)."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        mask = U64(self.width - 1)
        salts = self._row_salts()
        out = np.empty((self.depth, len(keys)), np.int64)
        for r in range(self.depth):  # depth is tiny; each row is vectorized
            out[r] = (mix2(keys, salts[r]) & mask).astype(np.int64)
        return out

    # ----------------------------------------------------------------- add
    def add_flat(self, keys: np.ndarray,
                 counts: np.ndarray | None = None) -> None:
        """Add ``counts[i]`` (default 1) occurrences of ``keys[i]``.
        Duplicate keys in one call accumulate correctly (``np.add.at``)."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return
        if counts is None:
            counts = np.ones(len(keys), np.int64)
        else:
            counts = np.ascontiguousarray(counts, dtype=np.int64)
            if counts.shape != keys.shape:
                raise ValueError("counts shape mismatch")
        idx = self._indices(keys)
        for r in range(self.depth):
            np.add.at(self.table[r], idx[r], counts)
        self.n += int(counts.sum())

    # ------------------------------------------------------------ estimate
    def estimate(self, keys: np.ndarray) -> np.ndarray:
        """Point estimates (int64, >= true count) for ``keys``."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return np.empty(0, np.int64)
        idx = self._indices(keys)
        vals = np.empty((self.depth, len(keys)), np.int64)
        for r in range(self.depth):
            vals[r] = self.table[r, idx[r]]
        return vals.min(axis=0)

    # --------------------------------------------------------------- merge
    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        """Union (linear): elementwise counter sum.  Config must match."""
        if (self.width, self.depth, self.seed) != \
                (other.width, other.depth, other.seed):
            raise ValueError("config mismatch")
        out = CountMinSketch(self.width, self.depth, self.seed)
        np.add(self.table, other.table, out=out.table)
        out.n = self.n + other.n
        return out

    # ------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        head = np.array([self.width, self.depth, self.seed, self.n],
                        np.int64)
        return _MAGIC + head.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMinSketch":
        if blob[:4] != _MAGIC:
            raise ValueError("not a CountMinSketch blob")
        head = np.frombuffer(blob, np.int64, count=4, offset=4)
        sk = cls(int(head[0]), int(head[1]), int(head[2]))
        sk.table = np.frombuffer(
            blob, np.int64, offset=4 + 32).reshape(
            sk.depth, sk.width).copy()
        sk.n = int(head[3])
        return sk
