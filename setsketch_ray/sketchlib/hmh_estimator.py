"""HyperMinHash estimators (``/root/reference/c++/sketch.hpp:1623-1871``).

HyperMinHash registers pack an HLL geometric value with ``subbucketsize``
extra uniform bits; estimators work through two state transforms:

* HLL projection (``transformToHyperLogLogState``, ``sketch.hpp:1692-1699``)
  for cardinalities;
* GHLL view with effective base ``2^(1/2^sub)`` (``sketch.hpp:1677-1689``)
  for the paper's joint ML estimator.
"""

from __future__ import annotations

import math

import numpy as np

from .estimator import JointEstimationResult, SetSketchEstimator


def _hmh_alpha(m: int) -> float:
    """HLL bias constant (``sketch.hpp:1637-1647``)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


class HyperMinHashEstimator:
    def __init__(self, bucketbits: int, bucketsize: int, subbucketsize: int):
        self.m = 1 << bucketbits
        self.bucketbits = bucketbits
        self.bucketsize = bucketsize
        self.subbucketsize = subbucketsize
        self.alpha = _hmh_alpha(self.m)
        self.sub_mask = (1 << subbucketsize) - 1
        self.limit = 2.0 ** (bucketbits + 10)
        self.effective_q = ((1 << bucketsize) - 1) * (1 << subbucketsize)
        self.effective_base = 2.0 ** (1.0 / (1 << subbucketsize))
        self.effective_a = 1.0 / self.m
        # joint estimator over the GHLL view (sketch.hpp:1714)
        self.joint_estimator = SetSketchEstimator(
            self.effective_q, self.effective_a, self.effective_base, self.m,
            card_range_correction=True)
        # cardinality estimator over the HLL projection (sketch.hpp:1715)
        self.cardinality_estimator = SetSketchEstimator(
            (1 << bucketsize) - 1, self.effective_a, 2.0, self.m,
            card_range_correction=True)

    # ------------------------------------------------------- state transforms
    def to_hll_state(self, regs: np.ndarray) -> np.ndarray:
        return np.atleast_2d(regs).astype(np.int64) >> self.subbucketsize

    def to_ghll_state(self, regs: np.ndarray) -> np.ndarray:
        r = np.atleast_2d(regs).astype(np.int64)
        r_hll = r >> self.subbucketsize
        out = np.minimum(r - self.sub_mask, self.effective_q + 1)
        return np.where(r_hll == 0, 0, out)

    # ----------------------------------------------------------- cardinality
    def _hll_estimator(self, regs: np.ndarray) -> np.ndarray:
        """Original HyperMinHash HLL estimate with linear-counting / large-
        range corrections (``sketch.hpp:1650-1674``)."""
        r_hll = self.to_hll_state(regs)
        s = np.power(2.0, -r_hll.astype(np.float64)).sum(axis=1)
        v = (r_hll == 0).sum(axis=1)
        m = self.m
        res = self.alpha * m * m / s
        lin = np.where(v > 0, m * np.log(np.where(v > 0, m / np.maximum(v, 1), 1.0)),
                       res)
        res2 = np.where(res <= 2.5 * m, lin, res)
        big = res2 > (1.0 / 30.0) * 2.0 ** 32
        with np.errstate(invalid="ignore"):
            corrected = -(2.0 ** 32) * np.log1p(-res2 / 2.0 ** 32)
        return np.where(big, corrected, res2)

    def estimate_cardinality_original(self, regs: np.ndarray) -> np.ndarray:
        """(``sketch.hpp:1721-1735``)."""
        regs = np.atleast_2d(regs)
        hll_count = self._hll_estimator(regs)
        r = regs.astype(np.int64)
        r_hll = r >> self.subbucketsize
        x = r & self.sub_mask
        frac = (1.0 + x / float(1 << self.subbucketsize)) \
            / np.power(2.0, r_hll.astype(np.float64))
        minhash_count = self.m * self.m / frac.sum(axis=1)
        use_hll = (hll_count < self.limit) & (self.bucketsize > 0)
        return np.where(use_hll, hll_count, minhash_count)

    def estimate_cardinality_new(self, regs: np.ndarray) -> np.ndarray:
        """(``sketch.hpp:1823-1826``): simple estimator on the HLL projection."""
        return self.cardinality_estimator.estimate_cardinality_simple(
            self.to_hll_state(regs))

    # ----------------------------------------------------------------- joint
    def _collision_estimate_hll_divided(self, x_size: float, y_size: float) -> float:
        """(``sketch.hpp:1738-1762``)."""
        cp = 0.0
        num_hll_buckets = 2.0 ** self.bucketsize
        for i_ in range(int(num_hll_buckets)):
            i = i_ + 1
            if i != num_hll_buckets:
                b1 = 2.0 ** -i
                b2 = 2.0 ** -(i - 1)
            else:
                b1 = 0.0
                b2 = 2.0 ** -(i - 1)
            b1 /= self.m
            b2 /= self.m
            pr_x = (1 - b1) ** x_size - (1 - b2) ** x_size
            pr_y = (1 - b1) ** y_size - (1 - b2) ** y_size
            cp += pr_x * pr_y
        return (cp * self.m) / 2.0 ** self.subbucketsize

    def _collision_estimate_final(self, x_size: float, y_size: float) -> float:
        """(``sketch.hpp:1765-1778``)."""
        n = max(x_size, y_size)
        m_ = min(x_size, y_size)
        if n > self.m * 32.0:
            ratio = n / m_
            ratio_factor = 4.0 * ratio / (1.0 + ratio) ** 2
            return (0.169919487159739093975315012348630288992889 * self.m
                    * ratio_factor) / 2.0 ** self.subbucketsize
        return self._collision_estimate_hll_divided(x_size, y_size)

    def estimate_joint_original(self, regs1, regs2, card1=None, card2=None):
        """Collision-corrected matching-bucket estimator
        (``sketch.hpp:1781-1813``)."""
        r1 = np.atleast_2d(regs1).astype(np.int64)
        r2 = np.atleast_2d(regs2).astype(np.int64)
        if card1 is None:
            card1 = self.estimate_cardinality_new(r1)
        else:
            card1 = np.atleast_1d(np.asarray(card1, dtype=np.float64))
        if card2 is None:
            card2 = self.estimate_cardinality_new(r2)
        else:
            card2 = np.atleast_1d(np.asarray(card2, dtype=np.float64))
        match_num = ((r1 != 0) & (r1 == r2)).sum(axis=1).astype(np.float64)
        union_filled = ((r1 != 0) | (r2 != 0)).sum(axis=1).astype(np.float64)
        jac = np.empty(len(match_num))
        for i in range(len(jac)):
            collisions = self._collision_estimate_final(float(card1[i]),
                                                        float(card2[i]))
            intersect = match_num[i] - collisions
            if intersect > 0 and union_filled[i] > 0:
                jac[i] = intersect / union_filled[i]
            else:
                jac[i] = 0.0
        return JointEstimationResult.from_cardinalities_and_jaccard(card1, card2, jac)

    def estimate_joint_new(self, regs1, regs2, card1=None, card2=None):
        """Paper's joint ML estimator via the GHLL view (``sketch.hpp:1836-1847``)."""
        g1 = self.to_ghll_state(regs1)
        g2 = self.to_ghll_state(regs2)
        if card1 is None:
            card1 = self.estimate_cardinality_new(regs1)
        if card2 is None:
            card2 = self.estimate_cardinality_new(regs2)
        return self.joint_estimator.estimate_joint_new(g1, g2, card1, card2)

    def estimate_joint_incl_excl(self, regs1, regs2):
        """(``sketch.hpp:1849-1852``)."""
        return self.cardinality_estimator.estimate_joint_incl_excl(
            self.to_hll_state(regs1), self.to_hll_state(regs2))
