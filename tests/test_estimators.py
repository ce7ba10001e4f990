"""Monte-Carlo estimator-quality tests against the paper's closed-form
expectations (reference test strategy #3, SURVEY.md §5):

* cardinality relative standard deviation ≈ sqrt(((b+1)/(b-1)·ln b − 1)/m)
  (``/root/reference/python/cardinality_error_charts.py:81-82``);
* MinHash Jaccard RMSE ≈ sqrt((1−J)/(J·m))
  (``/root/reference/python/joint_charts.py:67-68``);
* joint estimators recover planted (diff1, diff2, intersection) tuples
  (reduced grid of ``joint_estimation_test.cpp:48-102``).

Trial counts are reduced vs the paper (hundreds, not 10000); bounds carry a
1.35× headroom factor to keep flake probability negligible.
"""

import math

import numpy as np
import pytest

from setsketch_ray.sketchlib import (
    GHLL,
    MinHash,
    SetSketch1,
    SetSketch2,
    MinHashEstimator,
    SetSketchEstimator,
    mix2,
    mix64,
)

HEADROOM = 1.35


def _trial_sets(n_trials, cardinality, tag):
    """values/offsets for n_trials disjoint pseudo-random sets."""
    total = n_trials * cardinality
    base = mix2(np.arange(total, dtype=np.uint64), tag)
    offsets = np.arange(0, total + 1, cardinality)
    return base, offsets


def expected_rsd(base: float, m: int) -> float:
    return math.sqrt(((base + 1) / (base - 1) * math.log(base) - 1.0) / m)


@pytest.mark.parametrize("sketch,base", [
    (GHLL(m=1024, base=2.0, q=62), 2.0),
    (SetSketch1(m=1024, base=2.0, a=20.0, q=62), 2.0),
    (SetSketch2(m=1024, base=2.0, a=20.0, q=62), 2.0),
])
@pytest.mark.parametrize("cardinality", [1000, 10000])
def test_cardinality_rsd_within_bound(sketch, base, cardinality):
    n_trials = 150
    vals, offsets = _trial_sets(n_trials, cardinality, 42)
    regs = sketch.sketch_rows(vals, offsets)
    est = SetSketchEstimator(sketch.q, sketch.a, sketch.base, sketch.m,
                             card_range_correction=isinstance(sketch, GHLL))
    cards = est.estimate_cardinality_simple(regs)
    rel_err = cards / cardinality - 1.0
    rsd_bound = expected_rsd(base, sketch.m)
    assert abs(rel_err.mean()) < 3.0 * rsd_bound / math.sqrt(n_trials) + 0.01
    assert rel_err.std() < HEADROOM * rsd_bound


def test_cardinality_ml_batch_matches_scalar():
    """The r5 vectorized ML path must agree with the per-row brentq oracle
    (_ml_one) to the solver tolerance, on both correction settings and on
    the 0 / inf sentinel rows."""
    sketch = GHLL(m=256, base=2.0, q=62)
    vals, offsets = _trial_sets(40, 3000, 99)
    regs = sketch.sketch_rows(vals, offsets)
    for corr in (True, False):
        est = SetSketchEstimator(62, 1 / 256, 2.0, 256,
                                 card_range_correction=corr)
        batch = est.estimate_cardinality_ml(regs)
        for i in range(regs.shape[0]):
            hist = np.bincount(np.minimum(regs[i].astype(np.int64), 63),
                               minlength=64)
            ref = est._ml_one(hist)
            assert abs(batch[i] - ref) <= 1e-8 * max(ref, 1.0), \
                (corr, i, batch[i], ref)
    # sentinels (range-corrected): all-zero regs -> 0, all-saturated -> inf
    est = SetSketchEstimator(62, 1 / 256, 2.0, 256,
                             card_range_correction=True)
    sent = np.vstack([np.zeros(256, np.int64),
                      np.full(256, 63, np.int64)])
    got = est.estimate_cardinality_ml(sent)
    assert got[0] == 0.0 and got[1] == math.inf


def test_cardinality_ml_close_to_simple():
    sketch = GHLL(m=1024, base=2.0, q=62)
    vals, offsets = _trial_sets(50, 10000, 77)
    regs = sketch.sketch_rows(vals, offsets)
    est = SetSketchEstimator(62, 1 / 1024, 2.0, 1024, card_range_correction=True)
    simple = est.estimate_cardinality_simple(regs)
    ml = est.estimate_cardinality_ml(regs)
    rel = ml / 10000 - 1.0
    assert abs(rel.mean()) < 0.02
    assert np.abs(ml - simple).max() / 10000 < 0.1


def test_cardinality_small_range_correction():
    """Small sets: range-corrected estimator must be near-exact (linear
    counting regime)."""
    sketch = GHLL(m=4096, base=2.0, q=62)
    est = SetSketchEstimator(62, 1 / 4096, 2.0, 4096, card_range_correction=True)
    for n in [0, 1, 5, 50, 500]:
        vals, offsets = _trial_sets(20, n, 99) if n else (np.array([], dtype=np.uint64),
                                                          np.zeros(21, dtype=np.int64))
        regs = sketch.sketch_rows(vals, offsets)
        cards = est.estimate_cardinality_simple(regs)
        if n == 0:
            assert np.all(cards == 0)
        else:
            assert np.allclose(cards.mean(), n, rtol=0.15, atol=1.5)


def _pair_sets(n_trials, d1, d2, inter, tag):
    """Element arrays for pairs (A = D1 ∪ X, B = D2 ∪ X) with disjoint
    universes, mirroring joint_estimation_test.cpp:157-201."""
    u1 = mix2(np.arange(n_trials * d1, dtype=np.uint64), tag * 1000 + 1)
    u2 = mix2(np.arange(n_trials * d2, dtype=np.uint64), tag * 1000 + 2)
    ux = mix2(np.arange(n_trials * inter, dtype=np.uint64), tag * 1000 + 3)
    a_vals, a_off, b_vals, b_off = [], [0], [], [0]
    for t in range(n_trials):
        a = np.concatenate([u1[t * d1:(t + 1) * d1], ux[t * inter:(t + 1) * inter]])
        b = np.concatenate([u2[t * d2:(t + 1) * d2], ux[t * inter:(t + 1) * inter]])
        a_vals.append(a)
        b_vals.append(b)
        a_off.append(a_off[-1] + len(a))
        b_off.append(b_off[-1] + len(b))
    return (np.concatenate(a_vals), np.array(a_off),
            np.concatenate(b_vals), np.array(b_off))


@pytest.mark.parametrize("d1,d2,inter,true_j", [
    (500, 500, 1000, 0.5),
    (900, 900, 200, 0.1),
    (100, 1900, 1000, 1000 / 3000),
])
def test_minhash_joint_rmse(d1, d2, inter, true_j):
    m = 256
    n_trials = 60
    mh = MinHash(m)
    est = MinHashEstimator(m)
    av, ao, bv, bo = _pair_sets(n_trials, d1, d2, inter, 1)
    ra = mh.sketch_rows(av, ao)
    rb = mh.sketch_rows(bv, bo)
    jac = est.estimate_joint_original(ra, rb).jaccard
    rmse_bound = math.sqrt((1 - true_j) / (true_j * m))
    rmse = math.sqrt(((jac - true_j) ** 2).mean())
    assert rmse < HEADROOM * rmse_bound
    # the paper's "new" estimator should not be (much) worse
    jac_new = est.estimate_joint_new(ra, rb).jaccard
    rmse_new = math.sqrt(((jac_new - true_j) ** 2).mean())
    assert rmse_new < 1.5 * rmse_bound


@pytest.mark.parametrize("family", ["ghll", "ss1", "ss2"])
@pytest.mark.parametrize("d1,d2,inter", [
    (500, 500, 1000),
    (900, 900, 200),
])
def test_setsketch_joint_new_recovers_jaccard(family, d1, d2, inter):
    # m = 256 so that sets of ~2000 elements fill every register: the plain
    # "new" estimator (corrections off, as in the SetSketch configs
    # sketch.hpp:1111/1250) is unbiased only without both-zero registers.
    m, b, q, a = 256, 2.0, 62, 20.0
    if family == "ghll":
        sk = GHLL(m=m, base=b, q=q)
        a_eff = 1.0 / m
    elif family == "ss1":
        sk = SetSketch1(m=m, base=b, a=a, q=q)
        a_eff = a
    else:
        sk = SetSketch2(m=m, base=b, a=a, q=q)
        a_eff = a
    n_trials = 40
    true_j = inter / (d1 + d2 + inter)
    av, ao, bv, bo = _pair_sets(n_trials, d1, d2, inter, 2)
    ra = sk.sketch_rows(av, ao)
    rb = sk.sketch_rows(bv, bo)
    # GHLL uses the small/large-range cardinality correction (sketch.hpp:925);
    # SetSketch1/2 do not (sketch.hpp:1111, 1250).
    est = SetSketchEstimator(q, a_eff, b, m,
                             card_range_correction=(family == "ghll"))
    res = est.estimate_joint_new(ra, rb)
    # Fisher-information bound for b=2, m=1024 is ~2.2% absolute on J here;
    # just require small bias + sane RMSE.
    assert abs(res.jaccard.mean() - true_j) < 0.03
    rmse = math.sqrt(((res.jaccard - true_j) ** 2).mean())
    assert rmse < 0.09
    # inclusion-exclusion agrees on average
    res_ie = est.estimate_joint_incl_excl(ra, rb)
    assert abs(res_ie.jaccard.mean() - true_j) < 0.06


def test_joint_new_corrected_fixes_sparse_bias():
    """With many both-zero registers the plain estimator is biased; the
    small-set corrected likelihood (``sketch.hpp:578-633``) must not be."""
    m, b, q = 1024, 2.0, 62
    sk = GHLL(m=m, base=b, q=q)
    av, ao, bv, bo = _pair_sets(40, 500, 500, 1000, 6)
    ra = sk.sketch_rows(av, ao)
    rb = sk.sketch_rows(bv, bo)
    plain = SetSketchEstimator(q, 1.0 / m, b, m, card_range_correction=True)
    corrected = SetSketchEstimator(q, 1.0 / m, b, m, card_range_correction=True,
                                   joint_range_correction=True)
    j_plain = plain.estimate_joint_new(ra, rb).jaccard.mean()
    j_corr = corrected.estimate_joint_new(ra, rb).jaccard.mean()
    assert abs(j_corr - 0.5) < 0.02
    assert abs(j_corr - 0.5) < abs(j_plain - 0.5)  # correction helps


def test_equal_register_bounds_bracket_true_jaccard():
    # m small enough that ~2000-element sets touch every register (the
    # equal-register bounds assume no both-zero registers)
    m, b, q = 256, 2.0, 62
    sk = GHLL(m=m, base=b, q=q)
    est = SetSketchEstimator(q, 1.0 / m, b, m)
    av, ao, bv, bo = _pair_sets(30, 500, 500, 1000, 3)
    ra = sk.sketch_rows(av, ao)
    rb = sk.sketch_rows(bv, bo)
    lb, ub = est.estimate_jaccard_equal_registers(ra, rb)
    true_j = 0.5
    assert lb.mean() < true_j < ub.mean()
    assert lb.mean() > true_j - 0.15
    assert ub.mean() < true_j + 0.2


def test_joint_result_derived_quantities():
    from setsketch_ray.sketchlib import JointEstimationResult

    r = JointEstimationResult.from_cardinalities_and_jaccard([300.0], [700.0], [0.25])
    assert np.isclose(r.jaccard, 0.25)
    assert np.isclose(r.cardinality1, 300.0)
    assert np.isclose(r.cardinality2, 700.0)
    assert np.isclose(r.union, r.difference1 + r.difference2 + r.intersection)
    assert np.isclose(r.cosine,
                      r.intersection / math.sqrt(r.cardinality1 * r.cardinality2))
    # infeasible J is trimmed to min(c1/c2, c2/c1)
    r2 = JointEstimationResult.from_cardinalities_and_jaccard([10.0], [1000.0], [0.9])
    assert np.isclose(r2.jaccard, 0.01)


def test_deprecated_estimators_sane():
    m, b, q = 1024, 2.0, 62
    sk = GHLL(m=m, base=b, q=q)
    est = SetSketchEstimator(q, 1.0 / m, b, m)
    av, ao, bv, bo = _pair_sets(10, 500, 500, 1000, 4)
    ra = sk.sketch_rows(av, ao)
    rb = sk.sketch_rows(bv, bo)
    for fn in (est.estimate_joint_simple_deprecated, est.estimate_joint_ml_deprecated):
        res = fn(ra, rb)
        assert abs(res.jaccard.mean() - 0.5) < 0.12, fn.__name__


def test_hyperminhash_joint():
    from setsketch_ray.sketchlib import HyperMinHash
    from setsketch_ray.sketchlib.hmh_estimator import HyperMinHashEstimator

    hm = HyperMinHash(bucketbits=10, bucketsize=6, subbucketsize=6)
    est = HyperMinHashEstimator(10, 6, 6)
    av, ao, bv, bo = _pair_sets(15, 1000, 1000, 2000, 5)
    ra = hm.sketch_rows(av, ao)
    rb = hm.sketch_rows(bv, bo)
    for fn in (est.estimate_joint_original, est.estimate_joint_new):
        res = fn(ra, rb)
        assert abs(res.jaccard.mean() - 0.5) < 0.08, fn.__name__
    cards = est.estimate_cardinality_new(ra)
    assert abs(cards.mean() / 3000 - 1) < 0.1


def _synth_register_pairs(n_pairs, m, overlap_frac, card_lo, card_hi,
                          seed0=0):
    """Register pairs from real GHLL sketches over sets with a controlled
    overlap fraction (shared machinery for the vectorized-joint tests)."""
    from setsketch_ray.sketchlib.sketches import make_sketch

    rng = np.random.default_rng(7 + seed0)
    sk = make_sketch("ghll", m=m)
    regs = sk.empty(2 * n_pairs)
    rows_all, vals_all = [], []
    for i in range(n_pairs):
        n1 = int(rng.integers(card_lo, card_hi))
        n2 = int(rng.integers(card_lo, card_hi))
        ov = int(min(n1, n2) * overlap_frac)
        base = (seed0 + i) << 32
        s1 = np.arange(base, base + n1, dtype=np.uint64)
        s2 = np.arange(base + n1 - ov, base + n1 - ov + n2,
                       dtype=np.uint64)
        rows_all.append(np.full(n1, 2 * i, np.int64))
        vals_all.append(s1)
        rows_all.append(np.full(n2, 2 * i + 1, np.int64))
        vals_all.append(s2)
    sk.add_flat(regs, np.concatenate(rows_all), np.concatenate(vals_all))
    return regs[0::2], regs[1::2]


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(joint_range_correction=True),
    dict(joint_range_correction=True, joint_fallback=True),
    dict(joint_fallback=True),
])
@pytest.mark.parametrize("overlap", [0.0, 0.3, 0.9])
def test_estimate_joint_new_batch_matches_scalar(kwargs, overlap):
    """The vectorized grid+refine batch scorer agrees with the scalar
    Brent path on every dispatch branch (plain / corrected / fallback) —
    the scalar path is the tolerance oracle (SURVEY §7.4)."""
    from setsketch_ray.sketchlib.estimator import SetSketchEstimator

    est = SetSketchEstimator(62, 1.0 / 256, 2.0, 256,
                             card_range_correction=True, **kwargs)
    ra, rb = _synth_register_pairs(150, 256, overlap, 20, 3000)
    s = est.estimate_joint_new(ra, rb)
    v = est.estimate_joint_new_batch(ra, rb)
    np.testing.assert_allclose(v.jaccard, s.jaccard, atol=1e-6)
    np.testing.assert_allclose(v.intersection, s.intersection,
                               rtol=1e-4, atol=1e-6)


def test_estimate_joint_new_batch_edge_cases():
    """Empty sketches (card 0), identical sketches, and disjoint small
    sets all dispatch without error and match the scalar path."""
    from setsketch_ray.sketchlib.estimator import SetSketchEstimator
    from setsketch_ray.sketchlib.sketches import make_sketch

    est = SetSketchEstimator(62, 1.0 / 64, 2.0, 64,
                             card_range_correction=True,
                             joint_range_correction=True)
    sk = make_sketch("ghll", m=64)
    regs = sk.empty(4)
    sk.add_flat(regs,
                np.array([1, 1, 1, 2, 3, 3], np.int64),
                np.array([11, 12, 13, 21, 11, 12], np.uint64))
    # pairs: (empty, nonempty), (same, same), (disjoint a, b)
    ra = regs[[0, 1, 1]]
    rb = regs[[1, 1, 2]]
    s = est.estimate_joint_new(ra, rb)
    v = est.estimate_joint_new_batch(ra, rb)
    np.testing.assert_allclose(v.jaccard, s.jaccard, atol=1e-6)
