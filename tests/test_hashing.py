"""Randomness goodness-of-fit tests, mirroring the reference's statistical
test strategy (``/root/reference/c++/random_test.cpp`` +
``/root/reference/python/random_test.py``: chi-square / KS / binomial at
significance 0.01).  scipy is unavailable, so KS and chi-square statistics
are computed directly against their asymptotic critical values.
"""

import numpy as np
import pytest

from setsketch_ray.sketchlib import (
    FeistelPermutation,
    bounded_uint,
    exponential,
    mix2,
    mix64,
    truncated_exponential,
    uniform_double,
)

N = 200_000


def _ks_statistic(samples: np.ndarray, cdf) -> float:
    x = np.sort(samples)
    n = len(x)
    c = cdf(x)
    emp_hi = np.arange(1, n + 1) / n
    emp_lo = np.arange(0, n) / n
    return max(np.max(emp_hi - c), np.max(c - emp_lo))


# asymptotic KS critical value at alpha=0.01: 1.628 / sqrt(n)
def _ks_ok(samples, cdf):
    return _ks_statistic(samples, cdf) < 1.628 / np.sqrt(len(samples))


def test_uniform_double_ks():
    u = uniform_double(mix64(np.arange(N, dtype=np.uint64)))
    assert np.all((u >= 0) & (u < 1))
    assert _ks_ok(u, lambda x: x)


def test_exponential_ks():
    e = exponential(mix2(np.arange(N, dtype=np.uint64), 7))
    assert _ks_ok(e, lambda x: -np.expm1(-x))


@pytest.mark.parametrize("rate", [0.1, 0.5, 1.0, 2.0])
def test_truncated_exponential_ks(rate):
    t = truncated_exponential(mix2(np.arange(N, dtype=np.uint64), 11), rate)
    assert np.all((t >= 0) & (t <= 1))

    def cdf(x):
        return np.expm1(-rate * x) / np.expm1(-rate)

    assert _ks_ok(t, cdf)


def test_truncated_exponential_rate_zero_is_uniform():
    t = truncated_exponential(mix2(np.arange(N, dtype=np.uint64), 13), 0.0)
    assert _ks_ok(t, lambda x: x)


@pytest.mark.parametrize("n", [3, 10, 256, 1000])
def test_bounded_uint_chi_square(n):
    v = bounded_uint(mix2(np.arange(N, dtype=np.uint64), 17), n)
    counts = np.bincount(v.astype(np.int64), minlength=n)
    assert counts.sum() == N
    expected = N / n
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # chi-square critical value at alpha=1e-3 ~ df + 3.1*sqrt(2*df) for large df
    df = n - 1
    assert chi2 < df + 3.3 * np.sqrt(2 * df) + 10


@pytest.mark.parametrize("p", [0.1, 0.5, 0.9])
def test_bernoulli_binomial(p):
    """Binomial test analogue (``random_test.py:64-70``): observed success
    count within 4 sigma of N*p."""
    from setsketch_ray.sketchlib.hashing import bernoulli

    draws = bernoulli(mix2(np.arange(N, dtype=np.uint64), 23), p)
    k = draws.sum()
    sigma = np.sqrt(N * p * (1 - p))
    assert abs(k - N * p) < 4 * sigma


def test_mix64_bijective_sample():
    x = np.arange(N, dtype=np.uint64)
    assert len(np.unique(mix64(x))) == N


@pytest.mark.parametrize("m", [5, 64, 256, 1000, 4096])
def test_feistel_is_permutation(m):
    perm = FeistelPermutation(m)
    keys = np.full(m, 12345, dtype=np.uint64)
    out = perm.apply(keys, np.arange(m, dtype=np.uint64))
    assert sorted(out.tolist()) == list(range(m))


def test_feistel_differs_by_key():
    m = 256
    perm = FeistelPermutation(m)
    idx = np.arange(m, dtype=np.uint64)
    a = perm.apply(np.full(m, 1, dtype=np.uint64), idx)
    b = perm.apply(np.full(m, 2, dtype=np.uint64), idx)
    assert not np.array_equal(a, b)


def test_feistel_uniform_first_slot():
    """First permutation entry should be ~uniform over [0, m)."""
    m = 64
    perm = FeistelPermutation(m)
    keys = mix64(np.arange(50_000, dtype=np.uint64))
    first = perm.apply(keys, np.zeros(50_000, dtype=np.uint64))
    counts = np.bincount(first.astype(np.int64), minlength=m)
    expected = 50_000 / m
    chi2 = ((counts - expected) ** 2 / expected).sum()
    df = m - 1
    assert chi2 < df + 3.3 * np.sqrt(2 * df) + 10


def test_hash_str_u64_matches_scalar_fnv():
    """The vectorized column-walk FNV-1a must be bit-identical to the scalar
    definition (checkpoint partition lineage + band keys depend on it)."""
    import pyarrow as pa

    from setsketch_ray.sketchlib.hashing import hash_str_u64

    def scalar(values, seed=0):
        out = np.empty(len(values), dtype=np.uint64)
        off = 0xCBF29CE484222325 ^ (seed * 0x9E3779B97F4A7C15
                                    & 0xFFFFFFFFFFFFFFFF)
        for i, v in enumerate(values):
            h = off
            for b in v.encode("utf-8") if isinstance(v, str) else v:
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            out[i] = h
        return mix64(out)

    cases = ["", "a", "img000000000042", "abc" * 80, "日本語テキスト",
             "word " * 50]
    assert (hash_str_u64(cases) == scalar(cases)).all()
    assert (hash_str_u64(cases, seed=99) == scalar(cases, seed=99)).all()
    assert (hash_str_u64([b"", b"\x00\xff", bytes(range(256))])
            == scalar([b"", b"\x00\xff", bytes(range(256))])).all()
    arr = pa.array(cases)
    assert (hash_str_u64(arr) == scalar(cases)).all()
    sl = arr.slice(2, 3)  # non-zero offset view
    assert (hash_str_u64(sl) == scalar(cases[2:5])).all()
    assert (hash_str_u64(pa.chunked_array([arr[:3], arr[3:]]))
            == scalar(cases)).all()
    assert hash_str_u64([]).shape == (0,)
