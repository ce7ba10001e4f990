"""KMV / Theta sketch: a bottom-k distinct-hash sample supporting full set
algebra — union, intersection AND difference cardinality estimates (the one
the GHLL/SetSketch joint estimator cannot give directly).

Public-knowledge basis: the k-minimum-values estimator of Beyer, Haas,
Reinwald, Sismanis & Gemulla (SIGMOD 2007, "On synopses for distinct-value
estimation under multiset operations") and the Apache DataSketches theta
generalization (Dasgupta, Lang, Rhodes & Thaler 2016).  Re-derived here on
NumPy; no reference-repo counterpart (the paper's sketches estimate joint
quantities from register values, not hash samples).

Properties that make it a Ray-native aggregate:

* **Exactly mergeable**: the bottom-k distinct hashes of a concatenated
  stream equal the bottom-k of the union of per-block bottom-k sets, so
  per-block partials combine associatively/commutatively/idempotently in
  any tree order — bit-identical to a single-pass build.
* **Deterministic**: input hashes come from the repo's counter-mode hashing
  (``aggregates._column_u64``); a sketch is a pure function of the distinct
  key set.
* **Small**: ``8k`` bytes at most, exact below ``k`` distinct keys.

Estimator conventions (KMV, exclusive-threshold form):

* A full sketch stores the ``k`` smallest distinct hashes; the sampling
  threshold ``cut`` is the k-th smallest itself (exclusive), so the sample
  region ``[0, cut)`` holds exactly ``k-1`` points and the unbiased
  cardinality estimate is ``(k-1) / (cut / 2^64)``.
* Set ops restrict both sketches to the SHARED region
  ``cut = min(cut_a, cut_b)``; within it each sketch is a uniform distinct
  sample, so ``|S_A ∩ S_B| / (cut/2^64)`` estimates the intersection and
  ``|S_A \\ S_B| / (cut/2^64)`` the difference.  When both sketches are
  below ``k`` the estimates are EXACT (cut = 2^64).
"""

from __future__ import annotations

import numpy as np

_TWO64 = float(2 ** 64)
_FULL_CUT = 2 ** 64  # exclusive threshold when the sketch is not yet full


class ThetaSketch:
    """Bottom-``k`` distinct uint64 hash sample (sorted ascending)."""

    __slots__ = ("k", "hashes")

    def __init__(self, k: int, hashes: np.ndarray | None = None):
        self.k = int(k)
        self.hashes = np.empty(0, np.uint64) if hashes is None \
            else np.asarray(hashes, np.uint64)

    @classmethod
    def from_hashed(cls, k: int, h: np.ndarray) -> "ThetaSketch":
        u = np.unique(np.asarray(h, np.uint64))  # unique() sorts
        return cls(k, u[:k])

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if self.k != other.k:
            raise ValueError("k mismatch")
        u = np.union1d(self.hashes, other.hashes)
        return ThetaSketch(self.k, u[:self.k])

    @property
    def cut(self) -> int:
        """Exclusive uint64 sampling threshold (2^64 while below k)."""
        return int(self.hashes[self.k - 1]) if len(self.hashes) >= self.k \
            else _FULL_CUT

    def sample(self, cut: int) -> np.ndarray:
        """Hashes strictly below ``cut`` (a uniform distinct sample there)."""
        if cut >= _FULL_CUT:
            return self.hashes
        return self.hashes[self.hashes < np.uint64(cut)]

    def estimate(self) -> float:
        cut = self.cut
        if cut >= _FULL_CUT:
            return float(len(self.hashes))
        return (self.k - 1) / (cut / _TWO64)

    # ------------------------------------------------------------ wire form
    def to_bytes(self) -> bytes:
        return self.hashes.tobytes()

    @classmethod
    def from_bytes(cls, k: int, b: bytes) -> "ThetaSketch":
        return cls(k, np.frombuffer(b, np.uint64))


def _shared_samples(a: ThetaSketch, b: ThetaSketch):
    cut = min(a.cut, b.cut)
    return a.sample(cut), b.sample(cut), cut


def theta_union_estimate(a: ThetaSketch, b: ThetaSketch) -> float:
    """|A ∪ B| via the merged sketch (the exact-bottom-k property makes the
    merge indistinguishable from sketching the concatenated stream)."""
    return a.merge(b).estimate()


def theta_intersection_estimate(a: ThetaSketch, b: ThetaSketch) -> float:
    sa, sb, cut = _shared_samples(a, b)
    n = len(np.intersect1d(sa, sb))
    return float(n) if cut >= _FULL_CUT else n / (cut / _TWO64)


def theta_difference_estimate(a: ThetaSketch, b: ThetaSketch) -> float:
    """|A \\ B| (directional)."""
    sa, sb, cut = _shared_samples(a, b)
    n = len(sa) - len(np.intersect1d(sa, sb))
    return float(n) if cut >= _FULL_CUT else n / (cut / _TWO64)
