"""Cardinality and joint-similarity estimators.

Re-implements the reference's estimator suite with the same log1p/expm1
numerics (file:line cites relative to ``/root/reference/c++/sketch.hpp``):

* ``SetSketchEstimator`` — simple/ML cardinality (``:320-381``), inclusion-
  exclusion joint (``:391-410``), the paper's joint ML estimator "new"
  (``:484-522``) with its small-set correction (``:578-633``), the deprecated
  simple/ML joint estimators (``:412-482``) and the equal-register Jaccard
  bounds (``:697-719``);
* ``MinHashEstimator`` (``:1374-1543``) — all closed-form, fully vectorized
  over pair batches (the engine's primary dup-pair verifier);
* ``HyperMinHashEstimator`` (``:1623-1871``) — via state transforms.

Register batches are ``(rows, m)`` matrices; pair functions take two aligned
``(pairs, m)`` matrices.
"""

from __future__ import annotations

import math

import numpy as np

from .solvers import bisect, brent_minimize, brentq


def x_div_expm1(x: float) -> float:
    """x / (e^x - 1)  (``sketch.hpp:53-55``)."""
    return x / math.expm1(x) if x != 0.0 else 1.0


def expm1_div_x(x):
    """(e^x - 1) / x  (``sketch.hpp:57-60``), vectorized."""
    x = np.asarray(x, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        r = np.expm1(x) / x
    return np.where(x == 0.0, 1.0, r)


def log1p_div_x(x: float) -> float:
    """log(1+x) / x  (``sketch.hpp:62-65``)."""
    return math.log1p(x) / x if x != 0.0 else 1.0


class JointEstimationResult:
    """Vectorized analogue of the reference's ``JointEstimationResult``
    (``sketch.hpp:67-146``): arrays of (|A∖B|, |B∖A|, |A∩B|) with derived
    quantities."""

    __slots__ = ("difference1", "difference2", "intersection")

    def __init__(self, difference1, difference2, intersection):
        self.difference1 = np.asarray(difference1, dtype=np.float64)
        self.difference2 = np.asarray(difference2, dtype=np.float64)
        self.intersection = np.asarray(intersection, dtype=np.float64)

    @property
    def union(self):
        return self.difference1 + self.difference2 + self.intersection

    @property
    def cardinality1(self):
        return self.difference1 + self.intersection

    @property
    def cardinality2(self):
        return self.difference2 + self.intersection

    @property
    def jaccard(self):
        with np.errstate(invalid="ignore", divide="ignore"):
            j = self.intersection / self.union
        return np.where(self.intersection > 0, j, 0.0)

    @property
    def cosine(self):
        with np.errstate(invalid="ignore", divide="ignore"):
            c = self.intersection / np.sqrt(self.cardinality1 * self.cardinality2)
        return np.where(self.intersection > 0, c, 0.0)

    @property
    def inclusion1(self):
        with np.errstate(invalid="ignore", divide="ignore"):
            c = self.intersection / self.cardinality1
        return np.where(self.intersection > 0, c, 0.0)

    @property
    def inclusion2(self):
        with np.errstate(invalid="ignore", divide="ignore"):
            c = self.intersection / self.cardinality2
        return np.where(self.intersection > 0, c, 0.0)

    @property
    def alpha(self):
        with np.errstate(invalid="ignore", divide="ignore"):
            a = self.difference1 / self.union
        return np.where(self.difference1 > 0, a, 0.0)

    @property
    def beta(self):
        with np.errstate(invalid="ignore", divide="ignore"):
            b = self.difference2 / self.union
        return np.where(self.difference2 > 0, b, 0.0)

    @staticmethod
    def from_cardinalities_and_jaccard(card1, card2, jaccard):
        """``createFromCardinalitiesAndJaccardSimilarity`` (``sketch.hpp:111-123``):
        trim J to the feasible region, split into differences/intersection."""
        card1 = np.asarray(card1, dtype=np.float64)
        card2 = np.asarray(card2, dtype=np.float64)
        jaccard = np.asarray(jaccard, dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            jmax = np.minimum(card1 / card2, card2 / card1)
        jmax = np.where((card1 == 0) & (card2 == 0), 0.0, jmax)
        j = np.clip(jaccard, 0.0, jmax)
        y = 1.0 / (1.0 + j)
        d1 = np.maximum(0.0, card1 - card2 * j) * y
        d2 = np.maximum(0.0, card2 - card1 * j) * y
        inter = (card1 + card2) * j * y
        return JointEstimationResult(d1, d2, inter)

    @staticmethod
    def from_cardinalities_and_union(card1, card2, card_union):
        """``createFromCardinalitiesAndUnion`` (``sketch.hpp:125-130``)."""
        card1 = np.asarray(card1, dtype=np.float64)
        card2 = np.asarray(card2, dtype=np.float64)
        card_union = np.asarray(card_union, dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            j = (card1 + card2 - card_union) / card_union
        j = np.where(card_union > 0, j, 0.0)
        return JointEstimationResult.from_cardinalities_and_jaccard(card1, card2, j)

    @staticmethod
    def from_cardinalities_and_alpha_beta(card1, card2, alpha, beta):
        """``createFromCardinalitiesAndAlphaBetaDeprecated`` (``sketch.hpp:132-141``)."""
        card1 = np.asarray(card1, dtype=np.float64)
        card2 = np.asarray(card2, dtype=np.float64)
        alpha = np.asarray(alpha, dtype=np.float64)
        beta = np.asarray(beta, dtype=np.float64)
        z = 1.0 - alpha - beta
        with np.errstate(invalid="ignore", divide="ignore"):
            cu = (card1 + card2) / (1.0 + z)
        ok = z >= 0
        d1 = np.where(ok, cu * alpha, card1)
        d2 = np.where(ok, cu * beta, card2)
        inter = np.where(ok, cu * z, 0.0)
        return JointEstimationResult(d1, d2, inter)


def _vector_sigma(x: np.ndarray, base: float, max_iter: int = 1_000_000) -> np.ndarray:
    """sigma series (``sketch.hpp:246-266``), vectorized over x in [0, 1)."""
    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    active = (x > 0) & (x < 1)
    xbk = x[active].copy()
    ssum = np.zeros_like(xbk)
    bkm1 = 1.0
    idx = np.flatnonzero(active)
    for _ in range(max_iter):
        if idx.size == 0:
            break
        old = ssum.copy()
        xbk = xbk ** base
        ssum = ssum + xbk * bkm1
        done = ssum == old
        if done.any():
            out[idx[done]] = x[idx[done]] + (base - 1.0) * ssum[done]
            keep = ~done
            idx, xbk, ssum = idx[keep], xbk[keep], ssum[keep]
        bkm1 *= base
    out[x == 1.0] = np.inf
    return out


def _vector_tau(x: np.ndarray, base: float, max_iter: int = 1_000_000) -> np.ndarray:
    """tau series (``sketch.hpp:268-284``), vectorized over x in (0, 1)."""
    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    active = (x > 0) & (x < 1)
    base_inv = 1.0 / base
    xbmk = x[active].copy()
    ssum = np.zeros_like(xbmk)
    bmk = base_inv
    idx = np.flatnonzero(active)
    for _ in range(max_iter):
        if idx.size == 0:
            break
        old = ssum.copy()
        ssum = ssum + (xbmk - 1.0) * bmk
        done = ssum == old
        if done.any():
            out[idx[done]] = (1.0 - x[idx[done]]) + (base - 1.0) * ssum[done]
            keep = ~done
            idx, xbmk, ssum = idx[keep], xbmk[keep], ssum[keep]
        xbmk = xbmk ** base_inv
        bmk *= base_inv
    return out


class SetSketchEstimator:
    """Estimator shared by GHLL / HLL / SetSketch1 / SetSketch2
    (``sketch.hpp:148-720``).  Constants are precomputed once (this object is
    the per-actor state of verification stages)."""

    def __init__(self, q: int, a: float, base: float, m: int,
                 card_range_correction: bool = False,
                 joint_range_correction: bool = False,
                 joint_fallback: bool = False):
        self.q = int(q)
        self.a = float(a)
        self.base = float(base)
        self.base_inverse = 1.0 / base
        self.m = int(m)
        self.log_base = math.log(base)
        self.inv_log_base = 1.0 / self.log_base
        self.log_base_div_base_m1 = log1p_div_x(base - 1.0)
        self.factor = m / (base * self.log_base_div_base_m1 * a)
        self.base_inv_powers = base ** (-np.arange(q + 2, dtype=np.float64))
        self.card_range_correction = card_range_correction
        self.joint_range_correction = joint_range_correction
        self.joint_fallback = joint_fallback
        self._sigma_values = None
        self._tau_values = None

    # --- range-correction tables (sketch.hpp:313-316), built lazily because
    # --- the sigma/tau series are expensive for bases close to 1.
    @property
    def sigma_values(self):
        if self._sigma_values is None:
            i = np.arange(self.m + 1, dtype=np.float64)
            self._sigma_values = self.m * _vector_sigma(i / self.m, self.base)
        return self._sigma_values

    @property
    def tau_values(self):
        if self._tau_values is None:
            i = np.arange(self.m + 1, dtype=np.float64)
            self._tau_values = self.m * self.base_inv_powers[self.q] * _vector_tau(
                (self.m - i) / self.m, self.base)
        return self._tau_values

    # ------------------------------------------------------------------ cards
    def _contrib_tables(self):
        """Lookup tables indexed directly by the register dtype (one fancy-
        index pass per batch instead of astype + clip + masks)."""
        if not hasattr(self, "_tab_plain"):
            hi = self.q + 2
            plain = np.zeros(max(hi, 256), dtype=np.float64)
            plain[:hi] = self.base_inv_powers
            plain[hi:] = self.base_inv_powers[self.q + 1]
            corrected = plain.copy()
            corrected[0] = 0.0
            corrected[self.q + 1:] = 0.0
            self._tab_plain = plain
            self._tab_corrected = corrected
        return self._tab_plain, self._tab_corrected

    def estimate_cardinality_simple(self, regs: np.ndarray) -> np.ndarray:
        """GHLL-style estimator (``sketch.hpp:320-338``), vectorized over rows:
        card = factor / sum_i b^-K_i, with optional sigma/tau corrections."""
        regs = np.atleast_2d(regs)
        plain, corrected = self._contrib_tables()
        if self.card_range_correction:
            s = corrected[regs].sum(axis=1)
            n_min = (regs == 0).sum(axis=1)
            n_max = (regs > self.q).sum(axis=1)
            s = s + self.sigma_values[n_min] + self.tau_values[n_max]
        else:
            s = plain[np.minimum(regs, self.q + 1)].sum(axis=1) \
                if regs.dtype.itemsize > 1 and regs.max(initial=0) > self.q + 1 \
                else plain[regs].sum(axis=1)
        with np.errstate(divide="ignore"):
            return self.factor / s

    def _ml_one(self, hist: np.ndarray) -> float:
        """ML cardinality for one register histogram (``sketch.hpp:341-381``)."""
        q = self.q
        z = 0.0
        count0 = 0
        nz = np.flatnonzero(hist)
        for v in nz:
            freq = int(hist[v])
            if not self.card_range_correction or v <= q:
                if self.card_range_correction and v == 0:
                    count0 = freq
                    if count0 == self.m:
                        return 0.0
                z += freq * self.base_inv_powers[v]
            else:
                if freq == self.m:
                    return math.inf
        z *= self.a
        upper = (self.m - count0) / z

        bm1 = self.base - 1.0

        def f(n: float) -> float:
            na = n * self.a
            nabasem1 = na * bm1
            y = 0.0
            for v in nz:
                freq = int(hist[v])
                if self.card_range_correction and v == q + 1:
                    y += freq * x_div_expm1(na * self.base_inv_powers[q])
                elif not self.card_range_correction or v > 0:
                    y += freq * x_div_expm1(nabasem1 * self.base_inv_powers[v])
            return y - n * z

        if f(upper) >= 0.0:
            return upper
        return brentq(f, 0.0, upper, xtol=0.0, rtol=1e-9)

    def estimate_cardinality_ml(self, regs: np.ndarray) -> np.ndarray:
        """Batch ML cardinality — fully vectorized (r5): per-row histograms
        via ONE bincount over row-major keys, the same likelihood as
        ``_ml_one`` evaluated as an (rows x levels) ``x/(e^x-1)`` matrix,
        and a monotone bisection (f is strictly decreasing; 80 halvings of
        [0, upper] reach machine precision).  ``_ml_one`` stays as the
        scalar oracle (``test_cardinality_ml_batch_matches_scalar``)."""
        regs = np.atleast_2d(regs)
        rows = regs.shape[0]
        q = self.q
        nlev = q + 2
        clipped = np.minimum(regs.astype(np.int64), q + 1)
        keys = (np.arange(rows)[:, None] * nlev + clipped).ravel()
        hists = np.bincount(keys, minlength=rows * nlev) \
            .reshape(rows, nlev).astype(np.float64)

        corr = self.card_range_correction
        inv_pows = self.base_inv_powers[:nlev]
        # z: sum over contributing levels (all levels without range
        # correction; v <= q with it), scaled by a
        zmask = np.ones(nlev)
        if corr:
            zmask[q + 1] = 0.0
        z = self.a * (hists * (inv_pows * zmask)).sum(axis=1)
        count0 = hists[:, 0] if corr else np.zeros(rows)

        out = np.empty(rows)
        if corr:
            out[hists[:, q + 1] == self.m] = math.inf
            out[count0 == self.m] = 0.0
            live = (hists[:, q + 1] != self.m) & (count0 != self.m)
        else:
            live = np.ones(rows, dtype=bool)
        if not live.any():
            return out

        h = hists[live]
        zl = z[live]
        upper = (self.m - count0[live]) / zl
        bm1 = self.base - 1.0
        # per-level coefficient of n inside x/(e^x-1); 0 drops the term
        coef = bm1 * self.a * inv_pows
        if corr:
            coef = coef.copy()
            coef[0] = 0.0
            coef[q + 1] = self.a * self.base_inv_powers[q]

        def f_vec(n: np.ndarray, hh: np.ndarray, zz: np.ndarray) -> np.ndarray:
            x = n[:, None] * coef[None, :]
            with np.errstate(invalid="ignore", divide="ignore"):
                t = x / np.expm1(x)
            t = np.where(x == 0.0, 1.0, t)
            return (hh * t).sum(axis=1) - n * zz

        res = upper.copy()
        open_ = f_vec(upper, h, zl) < 0.0  # root strictly inside (0, upper)
        if open_.any():
            hs, zs = h[open_], zl[open_]
            lo = np.zeros(int(open_.sum()))
            hi = upper[open_]
            for _ in range(80):
                mid = 0.5 * (lo + hi)
                pos = f_vec(mid, hs, zs) >= 0.0
                lo = np.where(pos, mid, lo)
                hi = np.where(pos, hi, mid)
            res[open_] = 0.5 * (lo + hi)
        out[live] = res
        return out

    # ------------------------------------------------------------------ joint
    def pair_counts(self, regs1: np.ndarray, regs2: np.ndarray):
        """Vectorized register comparisons for pair batches
        (cf. ``sketch.hpp:644-667``)."""
        r1 = np.atleast_2d(regs1).astype(np.int64)
        r2 = np.atleast_2d(regs2).astype(np.int64)
        less = (r1 < r2).sum(axis=1)
        greater = (r1 > r2).sum(axis=1)
        eq = r1 == r2
        both_min = (eq & (r1 == 0)).sum(axis=1)
        both_max = (eq & (r1 == self.q + 1)).sum(axis=1)
        return less, greater, both_min, both_max

    def estimate_joint_incl_excl(self, regs1, regs2, card1=None, card2=None):
        """Inclusion-exclusion estimator (``sketch.hpp:391-410``): union sketch
        = register-wise max, J from the three simple cardinalities."""
        r1 = np.atleast_2d(regs1)
        r2 = np.atleast_2d(regs2)
        if card1 is None:
            card1 = self.estimate_cardinality_simple(r1)
        if card2 is None:
            card2 = self.estimate_cardinality_simple(r2)
        cu = self.estimate_cardinality_simple(np.maximum(r1, r2))
        return JointEstimationResult.from_cardinalities_and_union(card1, card2, cu)

    def _joint_new_one(self, n_less: int, n_greater: int, card1: float,
                       card2: float) -> float:
        """1-D ML for the Jaccard similarity (``sketch.hpp:484-522``); returns
        the estimated J."""
        n_eq = self.m - n_less - n_greater
        if card1 == 0.0 and card2 == 0.0:
            return 0.0
        z = (1.0 - self.base_inverse) / (card1 + card2)
        dmax = card2 / card1 if card1 >= card2 else card1 / card2

        ilb = self.inv_log_base

        def nll(j: float) -> float:
            try:
                l1 = ilb * math.log1p((card2 * j - card1) * z) \
                    if (n_eq > 0 or n_greater > 0) else 0.0
                l2 = ilb * math.log1p((card1 * j - card2) * z) \
                    if (n_eq > 0 or n_less > 0) else 0.0
                ret = 0.0
                if n_eq > 0:
                    ret += n_eq * math.log1p(l1 + l2)
                if n_greater > 0:
                    ret += n_greater * math.log(-l1)
                if n_less > 0:
                    ret += n_less * math.log(-l2)
            except ValueError:
                return math.inf
            if math.isnan(ret):
                return math.inf
            return -ret

        return brent_minimize(nll, 0.0, dmax)

    def _mu(self, x: float, y: float) -> float:
        """mu series for the small-set corrected likelihood
        (``sketch.hpp:537-576``)."""
        if x == y:
            return 0.0
        swapped = x > y
        if swapped:
            x, y = y, x
        result = 0.0
        if x > 0:
            zz = math.log(math.log(x / y) / (x - y)) * self.inv_log_base
            k_mid = int(math.floor(max(0.0, zz)))
        else:
            k_mid = 0
        pow_mid = self.base_inverse ** k_mid
        p = pow_mid
        while True:
            old = result
            result -= math.exp(-x * p) * math.expm1((x - y) * p)
            if old == result:
                break
            p *= self.base_inverse
        p = pow_mid
        k = k_mid
        while k != 0:
            p *= self.base
            old = result
            result -= math.exp(-x * p) * math.expm1((x - y) * p)
            if old == result:
                break
            k -= 1
        return -result if swapped else result

    def _joint_new_corrected_one(self, n_less_nz: int, n_greater_nz: int,
                                 n_both_zero: int, card1: float,
                                 card2: float) -> float:
        """Corrected likelihood when some registers are 0 in both sketches
        (``sketch.hpp:578-633``); returns the estimated J."""
        if card1 == 0.0 and card2 == 0.0:
            return 0.0
        dmax = card2 / card1 if card1 >= card2 else card1 / card2
        n_eq_nz = self.m - n_less_nz - n_greater_nz - n_both_zero
        a = self.a
        b = self.base

        def nll(j: float) -> float:
            c = a * (card1 + card2) / (1.0 + j)
            p_greater = self._mu(a * (max(0.0, card1 - card2 * j) / (b * (1.0 + j))
                                      + card2), c) \
                if (n_greater_nz > 0 or n_eq_nz > 0) else 0.0
            p_less = self._mu(a * (max(0.0, card2 - card1 * j) / (b * (1.0 + j))
                                   + card1), c) \
                if (n_less_nz > 0 or n_eq_nz > 0) else 0.0
            try:
                ret = -c * n_both_zero
                if n_less_nz > 0:
                    ret += n_less_nz * math.log(p_less)
                if n_greater_nz > 0:
                    ret += n_greater_nz * math.log(p_greater)
                if n_eq_nz > 0:
                    ret += n_eq_nz * math.log1p(-p_greater - p_less - math.exp(-c))
            except ValueError:
                return math.inf
            if math.isnan(ret):
                return math.inf
            return -ret

        return brent_minimize(nll, 0.0, dmax)

    def estimate_joint_new(self, regs1, regs2, card1=None, card2=None) -> JointEstimationResult:
        """The paper's joint ML estimator with extreme-value dispatch
        (``sketch.hpp:635-678``), over a pair batch."""
        r1 = np.atleast_2d(regs1)
        r2 = np.atleast_2d(regs2)
        if card1 is None:
            card1 = self.estimate_cardinality_simple(r1)
        else:
            card1 = np.atleast_1d(np.asarray(card1, dtype=np.float64))
        if card2 is None:
            card2 = self.estimate_cardinality_simple(r2)
        else:
            card2 = np.atleast_1d(np.asarray(card2, dtype=np.float64))
        less, greater, both_min, both_max = self.pair_counts(r1, r2)
        n = r1.shape[0]
        jac = np.empty(n)
        fallback_rows = []
        for i in range(n):
            if both_min[i] > 0 or both_max[i] > 0:
                if self.joint_range_correction and both_max[i] == 0:
                    jac[i] = self._joint_new_corrected_one(
                        int(less[i]), int(greater[i]), int(both_min[i]),
                        float(card1[i]), float(card2[i]))
                    continue
                elif self.joint_fallback:
                    fallback_rows.append(i)
                    continue
            jac[i] = self._joint_new_one(int(less[i]), int(greater[i]),
                                         float(card1[i]), float(card2[i]))
        result = JointEstimationResult.from_cardinalities_and_jaccard(card1, card2, jac)
        if fallback_rows:
            fb = np.asarray(fallback_rows)
            sub = self.estimate_joint_incl_excl(r1[fb], r2[fb], card1[fb], card2[fb])
            result.difference1[fb] = sub.difference1
            result.difference2[fb] = sub.difference2
            result.intersection[fb] = sub.intersection
        return result

    # ------------------------------------------- vectorized joint ML (r4)
    # SURVEY §7.4's plan: evaluate the likelihood over a per-pair Jaccard
    # grid across the WHOLE pair batch, then a vectorized golden-section
    # refine — no per-pair Python/Brent calls.  The scalar
    # ``estimate_joint_new`` path above stays as the tolerance oracle
    # (``tests/test_estimators.py`` asserts agreement).

    def _nll_plain_vec(self, j, less, greater, eq, card1, card2):
        """Vectorized ``_joint_new_one`` negative log likelihood; ``j`` is
        (n, G), per-pair scalars are (n, 1).  Invalid points -> +inf."""
        z = (1.0 - self.base_inverse) / (card1 + card2)
        ilb = self.inv_log_base
        need1 = (eq > 0) | (greater > 0)
        need2 = (eq > 0) | (less > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            l1 = np.where(need1, ilb * np.log1p((card2 * j - card1) * z), 0.0)
            l2 = np.where(need2, ilb * np.log1p((card1 * j - card2) * z), 0.0)
            ret = np.zeros_like(j)
            ret = ret + np.where(eq > 0, eq * np.log1p(l1 + l2), 0.0)
            ret = ret + np.where(greater > 0, greater * np.log(-l1), 0.0)
            ret = ret + np.where(less > 0, less * np.log(-l2), 0.0)
        nll = -ret
        nll[~np.isfinite(nll)] = np.inf
        return nll

    def _mu_vec(self, x, y):
        """Vectorized ``_mu`` series (``sketch.hpp:537-576``): the two
        convergence loops run on a progressively COMPRESSED active subset
        (each element stops exactly where the scalar loop stops — float
        convergence of its partial sum — and drops out of the working
        arrays, so late iterations only touch the stragglers)."""
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        shape = np.broadcast(x, y).shape
        xb = np.broadcast_to(x, shape).ravel()
        yb = np.broadcast_to(y, shape).ravel()
        swapped = xb > yb
        xl = np.where(swapped, yb, xb)
        yl = np.where(swapped, xb, yb)
        res = np.zeros(xl.size)
        neq = np.nonzero(xl != yl)[0]
        if neq.size:
            xs, ys = xl[neq], yl[neq]
            with np.errstate(invalid="ignore", divide="ignore"):
                zz = np.log(np.log(xs / ys) / (xs - ys)) * self.inv_log_base
            k_mid = np.where(xs > 0, np.floor(np.maximum(0.0, zz)), 0.0)
            k_mid = np.nan_to_num(k_mid, nan=0.0)
            pow_mid = self.base_inverse ** k_mid
            acc = np.zeros(neq.size)

            def run(p0, step, k0=None):
                idx = np.arange(neq.size)
                cx, cy, p = xs.copy(), ys.copy(), p0.copy()
                k = k0.copy() if k0 is not None else None
                if k is not None:
                    keep = k > 0
                    idx, cx, cy, p, k = idx[keep], cx[keep], cy[keep], \
                        p[keep], k[keep]
                while idx.size:
                    # scalar: result -= exp(-x p)*expm1((x-y) p) == += term
                    term = -np.exp(-cx * p) * np.expm1((cx - cy) * p)
                    new = acc[idx] + term
                    keep = new != acc[idx]
                    acc[idx] = new
                    if k is not None:
                        k = k[keep] - 1
                        idx, cx, cy, p = idx[keep], cx[keep], cy[keep], \
                            p[keep] * step
                        keep = k > 0
                        idx, cx, cy, p, k = idx[keep], cx[keep], cy[keep], \
                            p[keep], k[keep]
                    else:
                        idx, cx, cy, p = idx[keep], cx[keep], cy[keep], \
                            p[keep] * step

            run(pow_mid, self.base_inverse)              # downward
            run(pow_mid * self.base, self.base, k_mid)   # upward k_mid..1
            res[neq] = acc
        return np.where(swapped, -res, res).reshape(shape)

    def _nll_corrected_vec(self, j, less_nz, greater_nz, both_zero,
                           card1, card2):
        """Vectorized ``_joint_new_corrected_one`` nll over (n, G) grids."""
        eq_nz = self.m - less_nz - greater_nz - both_zero
        a = self.a
        b = self.base
        c = a * (card1 + card2) / (1.0 + j)
        with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
            need_g = (greater_nz > 0) | (eq_nz > 0)
            need_l = (less_nz > 0) | (eq_nz > 0)
            xg = a * (np.maximum(0.0, card1 - card2 * j)
                      / (b * (1.0 + j)) + card2)
            xle = a * (np.maximum(0.0, card2 - card1 * j)
                       / (b * (1.0 + j)) + card1)
            cb = np.broadcast_to(c, xg.shape)
            # one fused mu pass for both tails (shared loop machinery)
            mu = self._mu_vec(np.concatenate([xg, xle], axis=0),
                              np.concatenate([cb, cb], axis=0))
            p_greater = np.where(need_g, mu[:len(xg)], 0.0)
            p_less = np.where(need_l, mu[len(xg):], 0.0)
            ret = -c * both_zero
            ret = ret + np.where(less_nz > 0, less_nz * np.log(p_less), 0.0)
            ret = ret + np.where(greater_nz > 0,
                                 greater_nz * np.log(p_greater), 0.0)
            ret = ret + np.where(
                eq_nz > 0,
                eq_nz * np.log1p(-p_greater - p_less - np.exp(-c)), 0.0)
        nll = -ret
        nll[~np.isfinite(nll)] = np.inf
        return nll

    @staticmethod
    def _grid_minimize_vec(nll, dmax, n_grid: int = 33, iters: int = 48,
                           zoom: bool = False):
        """argmin of a per-pair unimodal-ish nll over [0, dmax]: coarse
        per-pair grid bracket, then either vectorized golden-section (one
        (n,1) nll eval per iteration) or, with ``zoom=True``, batched
        9-point grid-zoom rounds — fewer, wider nll calls, which wins when
        each call carries loop overhead (the mu-series corrected nll)."""
        n = len(dmax)
        grid = np.linspace(0.0, 1.0, n_grid)
        J = dmax[:, None] * grid[None, :]
        F = nll(J)
        k = np.argmin(F, axis=1)
        rows = np.arange(n)
        a = J[rows, np.maximum(k - 1, 0)]
        b = J[rows, np.minimum(k + 1, n_grid - 1)]
        if zoom:
            for _ in range(11):
                P = a[:, None] + (b - a)[:, None] \
                    * np.linspace(0.0, 1.0, 9)[None, :]
                Fz = nll(P)
                kz = np.argmin(Fz, axis=1)
                a = P[rows, np.maximum(kz - 1, 0)]
                b = P[rows, np.minimum(kz + 1, 8)]
            return 0.5 * (a + b)
        gr = 0.6180339887498949
        x1 = b - gr * (b - a)
        x2 = a + gr * (b - a)
        f1 = nll(x1[:, None])[:, 0]
        f2 = nll(x2[:, None])[:, 0]
        for _ in range(iters):
            m = f1 < f2
            a_new = np.where(m, a, x1)
            b_new = np.where(m, x2, b)
            x_eval = np.where(m, b_new - gr * (b_new - a_new),
                              a_new + gr * (b_new - a_new))
            f_eval = nll(x_eval[:, None])[:, 0]
            x1_new = np.where(m, x_eval, x2)
            f1_new = np.where(m, f_eval, f2)
            x2_new = np.where(m, x1, x_eval)
            f2_new = np.where(m, f1, f_eval)
            a, b, x1, x2, f1, f2 = a_new, b_new, x1_new, x2_new, \
                f1_new, f2_new
        return np.where(f1 < f2, x1, x2)

    def estimate_joint_new_batch(self, regs1, regs2, card1=None,
                                 card2=None) -> JointEstimationResult:
        """Vectorized ``estimate_joint_new``: same extreme-value dispatch
        (``sketch.hpp:635-678``), the per-pair 1-D ML solved by grid +
        golden-section over the whole batch instead of per-pair Brent.
        Agrees with the scalar path to ~1e-6 in J (tolerance-tested)."""
        r1 = np.atleast_2d(regs1)
        r2 = np.atleast_2d(regs2)
        if card1 is None:
            card1 = self.estimate_cardinality_simple(r1)
        else:
            card1 = np.atleast_1d(np.asarray(card1, dtype=np.float64))
        if card2 is None:
            card2 = self.estimate_cardinality_simple(r2)
        else:
            card2 = np.atleast_1d(np.asarray(card2, dtype=np.float64))
        less, greater, both_min, both_max = self.pair_counts(r1, r2)
        n = r1.shape[0]
        jac = np.zeros(n)
        with np.errstate(invalid="ignore", divide="ignore"):
            dmax = np.where(card1 >= card2, card2 / card1, card1 / card2)
        dmax = np.nan_to_num(dmax, nan=0.0)
        nonzero = (card1 > 0) | (card2 > 0)

        extreme = (both_min > 0) | (both_max > 0)
        corrected = extreme & (both_max == 0) if self.joint_range_correction \
            else np.zeros(n, bool)
        fallback = extreme & ~corrected if self.joint_fallback \
            else np.zeros(n, bool)
        plain = ~corrected & ~fallback & nonzero

        if plain.any():
            idx = np.nonzero(plain)[0]
            eq = self.m - less - greater
            jac[idx] = self._grid_minimize_vec(
                lambda J: self._nll_plain_vec(
                    J, less[idx, None], greater[idx, None], eq[idx, None],
                    card1[idx, None], card2[idx, None]),
                dmax[idx])
        corr = corrected & nonzero
        if corr.any():
            idx = np.nonzero(corr)[0]
            jac[idx] = self._grid_minimize_vec(
                lambda J: self._nll_corrected_vec(
                    J, less[idx, None], greater[idx, None],
                    both_min[idx, None], card1[idx, None], card2[idx, None]),
                dmax[idx], zoom=True)
        result = JointEstimationResult.from_cardinalities_and_jaccard(
            card1, card2, jac)
        if fallback.any():
            fb = np.nonzero(fallback)[0]
            sub = self.estimate_joint_incl_excl(r1[fb], r2[fb],
                                                card1[fb], card2[fb])
            result.difference1[fb] = sub.difference1
            result.difference2[fb] = sub.difference2
            result.intersection[fb] = sub.intersection
        return result

    # -------------------------------------------------- deprecated estimators
    def _p_inv1(self, y):
        """(``sketch.hpp:167-169``)."""
        return np.minimum(1.0, -np.expm1(-self.log_base * np.asarray(y, dtype=np.float64))
                          * (self.base / (self.base - 1.0)))

    def _u_prime(self, b1mxm1: float, onembmx: float, bmx: float, level: int) -> float:
        """(``sketch.hpp:174-197``)."""
        bip = self.base_inv_powers
        om_m1 = onembmx * bip[level - 1]
        om = onembmx * bip[level]
        basem1p2 = (self.base - 1.0) ** 2
        basem1p3 = basem1p2 * (self.base - 1.0)
        numerator = bip[level] * bmx * basem1p3 * (b1mxm1 - om_m1)
        hh1 = b1mxm1 + om
        hh2 = b1mxm1 + om_m1
        hh3 = b1mxm1 + om_m1 * self.base
        log_b = math.log1p(b1mxm1 * om * basem1p2 / (hh2 * hh2)) * self.inv_log_base
        return numerator / (log_b * hh1 * hh2 * hh3)

    def _solve_joint_ml_equation(self, num_equal: int, hist_1g2: dict,
                                 hist_2g1: dict) -> float:
        """(``sketch.hpp:199-244``)."""
        if not hist_1g2:
            return 0.0

        def g(alpha: float) -> float:
            if alpha <= 0:
                return -math.inf
            if alpha >= 1:
                return math.inf
            b1m = math.expm1(self.log_base * (1.0 - alpha))
            onem = -math.expm1(-self.log_base * alpha)
            bma = 1.0 - onem
            sum1 = sum(freq * self._u_prime(b1m, onem, bma, lvl)
                       for lvl, freq in hist_1g2.items())
            if num_equal == 0:
                return -sum1
            if not hist_2g1:
                return num_equal / (1.0 - alpha) - sum1
            if sum1 <= 0:
                return math.inf
            beta = 1.0 - alpha - num_equal / sum1
            if beta <= 0:
                return math.inf
            b1mb = math.expm1(self.log_base * (1.0 - beta))
            onemb = -math.expm1(-self.log_base * beta)
            bmb = 1.0 - onemb
            sum2 = sum(freq * self._u_prime(b1mb, onemb, bmb, lvl)
                       for lvl, freq in hist_2g1.items())
            return sum2 - sum1

        return bisect(g, 0.0, 1.0)

    def estimate_joint_simple_deprecated(self, regs1, regs2) -> JointEstimationResult:
        """(``sketch.hpp:412-445``)."""
        r1 = np.atleast_2d(regs1).astype(np.int64)
        r2 = np.atleast_2d(regs2).astype(np.int64)
        less = (r1 < r2).sum(axis=1)
        greater = (r1 > r2).sum(axis=1)
        eq_extreme = ((r1 == r2) & ((r1 == 0) | (r1 == self.q + 1))).any(axis=1)
        alpha = self._p_inv1(greater / self.m)
        beta = self._p_inv1(less / self.m)
        card1 = self.estimate_cardinality_simple(r1)
        card2 = self.estimate_cardinality_simple(r2)
        result = JointEstimationResult.from_cardinalities_and_alpha_beta(
            card1, card2, alpha, beta)
        if self.joint_fallback and eq_extreme.any():
            fb = np.flatnonzero(eq_extreme)
            sub = self.estimate_joint_incl_excl(r1[fb], r2[fb], card1[fb], card2[fb])
            result.difference1[fb] = sub.difference1
            result.difference2[fb] = sub.difference2
            result.intersection[fb] = sub.intersection
        return result

    def estimate_joint_ml_deprecated(self, regs1, regs2) -> JointEstimationResult:
        """(``sketch.hpp:447-482``)."""
        r1 = np.atleast_2d(regs1).astype(np.int64)
        r2 = np.atleast_2d(regs2).astype(np.int64)
        card1 = self.estimate_cardinality_simple(r1)
        card2 = self.estimate_cardinality_simple(r2)
        n = r1.shape[0]
        alphas = np.empty(n)
        betas = np.empty(n)
        fallback = np.zeros(n, dtype=bool)
        for i in range(n):
            d = r1[i] - r2[i]
            extreme = ((r1[i] == 0) | (r1[i] == self.q + 1)
                       | (r2[i] == 0) | (r2[i] == self.q + 1)).any()
            if self.joint_fallback and extreme:
                fallback[i] = True
                alphas[i] = betas[i] = 0.0
                continue
            d1g2 = d[d > 0]
            d2g1 = -d[d < 0]
            num_equal = int((d == 0).sum())
            h1 = {int(v): int(c) for v, c in zip(*np.unique(d1g2, return_counts=True))}
            h2 = {int(v): int(c) for v, c in zip(*np.unique(d2g1, return_counts=True))}
            alphas[i] = self._p_inv1(self._solve_joint_ml_equation(num_equal, h1, h2))
            betas[i] = self._p_inv1(self._solve_joint_ml_equation(num_equal, h2, h1))
        result = JointEstimationResult.from_cardinalities_and_alpha_beta(
            card1, card2, alphas, betas)
        if fallback.any():
            fb = np.flatnonzero(fallback)
            sub = self.estimate_joint_incl_excl(r1[fb], r2[fb], card1[fb], card2[fb])
            result.difference1[fb] = sub.difference1
            result.difference2[fb] = sub.difference2
            result.intersection[fb] = sub.intersection
        return result

    # --------------------------------------------------- equal-register bounds
    def estimate_jaccard_equal_registers(self, regs1, regs2):
        """Lower/upper Jaccard bounds from the fraction of equal registers
        (``sketch.hpp:697-719``); the engine's cheap pre-filter."""
        r1 = np.atleast_2d(regs1)
        r2 = np.atleast_2d(regs2)
        g = (r1 == r2).sum(axis=1) / self.m
        h = (g + 1.0) * 0.5
        lb = np.maximum(0.0, 2.0 * (expm1_div_x(self.log_base * h)
                                    * self.log_base_div_base_m1 * h) - 1.0)
        ub = expm1_div_x(self.log_base * g) * self.log_base_div_base_m1 * g
        return lb, ub


class MinHashEstimator:
    """MinHash estimators (``sketch.hpp:1374-1543``) — closed-form, fully
    vectorized over pair batches."""

    _LOG2_64 = math.log(2.0) * 64

    def __init__(self, m: int):
        self.m = int(m)

    def estimate_cardinality(self, regs: np.ndarray) -> np.ndarray:
        """card = m / sum_j (64 ln2 - ln(~r_j))  (``sketch.hpp:1383-1389``)."""
        r = np.atleast_2d(np.asarray(regs, dtype=np.uint64))
        inv = (~r).astype(np.float64)
        with np.errstate(divide="ignore"):
            s = (self._LOG2_64 - np.log(inv)).sum(axis=1)
        return self.m / s

    def estimate_joint_original(self, regs1, regs2, card1=None, card2=None):
        """Classic MinHash: J = matching-register fraction
        (``sketch.hpp:1452-1467``)."""
        r1 = np.atleast_2d(np.asarray(regs1, dtype=np.uint64))
        r2 = np.atleast_2d(np.asarray(regs2, dtype=np.uint64))
        if card1 is None:
            card1 = self.estimate_cardinality(r1)
        if card2 is None:
            card2 = self.estimate_cardinality(r2)
        j = (r1 == r2).sum(axis=1) / self.m
        return JointEstimationResult.from_cardinalities_and_jaccard(card1, card2, j)

    def estimate_joint_new(self, regs1, regs2, card1=None, card2=None):
        """The paper's joint estimator specialized to MinHash — closed-form
        quadratic solution (``sketch.hpp:1475-1503``)."""
        r1 = np.atleast_2d(np.asarray(regs1, dtype=np.uint64))
        r2 = np.atleast_2d(np.asarray(regs2, dtype=np.uint64))
        if card1 is None:
            card1 = self.estimate_cardinality(r1)
        else:
            card1 = np.atleast_1d(np.asarray(card1, dtype=np.float64))
        if card2 is None:
            card2 = self.estimate_cardinality(r2)
        else:
            card2 = np.atleast_1d(np.asarray(card2, dtype=np.float64))
        dp = (r1 < r2).sum(axis=1).astype(np.float64)
        dm = (r1 > r2).sum(axis=1).astype(np.float64)
        d0 = self.m - dp - dm
        na2 = card1 * card1
        nb2 = card2 * card2
        xa = na2 * (d0 + dm)
        xb = nb2 * (d0 + dp)
        with np.errstate(invalid="ignore", divide="ignore"):
            j = (xa + xb - np.sqrt((xa - xb) ** 2 + 4.0 * dp * dm * na2 * nb2)) \
                / (2.0 * self.m * card1 * card2)
        j = np.clip(np.nan_to_num(j, nan=0.0), 0.0, 1.0)
        return JointEstimationResult.from_cardinalities_and_jaccard(card1, card2, j)

    def estimate_joint_incl_excl(self, regs1, regs2, card1=None, card2=None):
        """Union sketch = register-wise min (``sketch.hpp:1414-1427``)."""
        r1 = np.atleast_2d(np.asarray(regs1, dtype=np.uint64))
        r2 = np.atleast_2d(np.asarray(regs2, dtype=np.uint64))
        if card1 is None:
            card1 = self.estimate_cardinality(r1)
        if card2 is None:
            card2 = self.estimate_cardinality(r2)
        cu = self.estimate_cardinality(np.minimum(r1, r2))
        return JointEstimationResult.from_cardinalities_and_union(card1, card2, cu)

    def estimate_joint_simple_deprecated(self, regs1, regs2):
        """(``sketch.hpp:1429-1450``)."""
        r1 = np.atleast_2d(np.asarray(regs1, dtype=np.uint64))
        r2 = np.atleast_2d(np.asarray(regs2, dtype=np.uint64))
        less = (r1 < r2).sum(axis=1) / self.m
        greater = (r1 > r2).sum(axis=1) / self.m
        card1 = self.estimate_cardinality(r1)
        card2 = self.estimate_cardinality(r2)
        return JointEstimationResult.from_cardinalities_and_alpha_beta(
            card1, card2, less, greater)

    def estimate_jaccard_equal_registers(self, regs1, regs2):
        """For MinHash lower == upper == matching fraction (``sketch.hpp:1531-1543``)."""
        r1 = np.atleast_2d(np.asarray(regs1, dtype=np.uint64))
        r2 = np.atleast_2d(np.asarray(regs2, dtype=np.uint64))
        g = (r1 == r2).sum(axis=1) / self.m
        return g, g
