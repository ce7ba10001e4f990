"""AMS tug-of-war sketch for the second frequency moment F2 = sum c_w^2.

Alon, Matias & Szegedy (STOC'96): each estimator e draws a pairwise-
independent sign per key, maintains X_e = sum_w sign_e(w) * c_w, and
E[X_e^2] = F2 with Var[X_e^2] <= 2 F2^2.  Averaging ``s1`` estimators and
taking the median of ``s2`` averages gives the classic (eps, delta)
guarantee.  The sketch is LINEAR: the partial vector of a block (or of a
partition's full counts) sums componentwise to the global vector — so at
100 TB the whole estimator folds from one small int64 vector per task with
NO shuffle of its own (it rides whatever pass already sees the counts).

Signs come from the repo's counter-mode hash stream (sketchlib/hashing):
group g of 64 estimators uses the 64 bits of ``mix2(hash(word), g)``, so
the draw is a pure function of the key — deterministic across block
layouts, the repo's determinism contract.  All estimator squares and the
median fold are driver-side Python ints: exact, overflow-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import hash_str_u64, mix2

AMS_SEED = 0xA535_5EED


def _key_hash(arr) -> np.ndarray:
    """uint64 key hash: counter-mode string hash for string keys, mix2
    for integer keys — the same draw either way, a pure function of the
    key VALUE (two tables sketching the same key domain get the same
    signs, which is what makes cross-table inner products work)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Array) and pa.types.is_integer(arr.type):
        arr = arr.to_numpy(zero_copy_only=False)
    if isinstance(arr, np.ndarray):
        return mix2(arr.astype(np.uint64), np.uint64(AMS_SEED))
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr)
    return hash_str_u64(arr, seed=AMS_SEED)


def ams_partial(words, cnts: np.ndarray, s1: int = 256, s2: int = 9) -> \
        np.ndarray:
    """Partial AMS vector (length s1*s2, int64) over (word, count) pairs:
    entry e = sum_w sign_e(w) * c_w.  Componentwise-additive across
    disjoint word sets AND across partial counts of the same word
    (linearity), so any partition of the corpus folds exactly."""
    n_est = s1 * s2
    n_grp = (n_est + 63) // 64
    if len(cnts) == 0:
        return np.zeros(n_est, np.int64)
    h = _key_hash(words)
    c = np.ascontiguousarray(cnts, dtype=np.int64)
    total = int(c.sum())
    out = np.empty(n_grp * 64, np.int64)
    for g in range(n_grp):
        m = mix2(h, np.uint64(g))
        bits = np.unpackbits(m.view(np.uint8).reshape(-1, 8), axis=1,
                             bitorder="little").astype(np.int64)
        # sign = 1 - 2*bit  =>  sum sign*c = total - 2 * (c @ bits)
        out[g * 64:(g + 1) * 64] = total - 2 * (c @ bits)
    return out[:n_est]


def ams_median_numerator(acc, s1: int = 256, s2: int = 9) -> int:
    """Fold the summed global vector into the median-of-means estimate,
    returned as the exact integer NUMERATOR ``median_g sum_{e in g} X_e^2``
    (the estimate itself is numerator / s1).  Keeping the integer
    numerator lets certificates compare |num - s1*F2| against bounds in
    pure integer arithmetic — no float association anywhere."""
    xs = [int(v) for v in acc]
    assert len(xs) == s1 * s2
    sums = sorted(sum(v * v for v in xs[i * s1:(i + 1) * s1])
                  for i in range(s2))
    return sums[s2 // 2]


def ams_inner_numerator(acc_a, acc_b, s1: int = 256, s2: int = 9) -> int:
    """Inner-product (equi-join size) estimate from two AMS vectors over
    the SAME sign draw: E[X_e * Y_e] = sum_k a_k * b_k.  Returns the
    exact integer numerator ``median_g sum_{e in g} X_e * Y_e`` (the
    estimate is numerator / s1) — pure-integer certificates, as with
    ams_median_numerator.  Note the numerator may be negative on tiny
    inputs (the median of signed products)."""
    xs = [int(v) for v in acc_a]
    ys = [int(v) for v in acc_b]
    assert len(xs) == len(ys) == s1 * s2
    sums = sorted(sum(x * y for x, y in zip(xs[i * s1:(i + 1) * s1],
                                            ys[i * s1:(i + 1) * s1]))
                  for i in range(s2))
    return sums[s2 // 2]
