"""Sketch-algebra property tests, mirroring the reference's exact-equivalence
strategy (``/root/reference/c++/bulk_update_test.cpp:45-108``): stream == bulk,
merge laws (commutative / associative / idempotent), permutation invariance,
register bounds, and merge-composition (``composeSketch`` trick,
``joint_estimation_test.cpp:104-114``).
"""

import numpy as np
import pytest

from setsketch_ray.sketchlib import (
    GHLL,
    HLL,
    HyperMinHash,
    MinHash,
    SetSketch1,
    SetSketch2,
    mix64,
)

FAMILIES = [
    GHLL(m=256, base=2.0, q=62),
    GHLL(m=64, base=1.001, q=1000),
    HLL(p=8, q=56),
    SetSketch1(m=256, base=2.0, a=20.0, q=62),
    SetSketch1(m=64, base=1.2, a=30.0, q=300),
    SetSketch2(m=256, base=2.0, a=20.0, q=62),
    SetSketch2(m=64, base=1.2, a=30.0, q=300),
    MinHash(m=64),
    HyperMinHash(bucketbits=8, bucketsize=6, subbucketsize=4),
]

IDS = [f"{type(s).__name__}-m{s.m}" for s in FAMILIES]


def _elements(seed, n):
    return mix64(np.arange(seed * 10_000_000, seed * 10_000_000 + n,
                           dtype=np.uint64))


@pytest.mark.parametrize("sk", FAMILIES, ids=IDS)
@pytest.mark.parametrize("n", [0, 1, 10, 500, 5000])
def test_stream_equals_bulk(sk, n):
    vals = _elements(1, n)
    bulk = sk.sketch_rows(vals, np.array([0, n]))
    stream = sk.empty(1)
    sk.add_flat(stream, np.zeros(n, dtype=np.int64), vals)
    assert np.array_equal(bulk, stream)


@pytest.mark.parametrize("sk", FAMILIES, ids=IDS)
def test_permutation_invariance(sk):
    vals = _elements(2, 2000)
    shuffled = vals[np.random.default_rng(0).permutation(len(vals))]
    a = sk.sketch_rows(vals, np.array([0, 2000]))
    b = sk.sketch_rows(shuffled, np.array([0, 2000]))
    assert np.array_equal(a, b)


@pytest.mark.parametrize("sk", FAMILIES, ids=IDS)
def test_merge_laws(sk):
    a = sk.sketch_rows(_elements(3, 1000), np.array([0, 1000]))
    b = sk.sketch_rows(_elements(4, 800), np.array([0, 800]))
    c = sk.sketch_rows(_elements(5, 600), np.array([0, 600]))
    # commutative
    assert np.array_equal(sk.merge(a, b), sk.merge(b, a))
    # associative
    assert np.array_equal(sk.merge(sk.merge(a, b), c), sk.merge(a, sk.merge(b, c)))
    # idempotent
    assert np.array_equal(sk.merge(a, a), a)


@pytest.mark.parametrize("sk", FAMILIES, ids=IDS)
def test_merge_equals_union_sketch(sk):
    """sketch(S1 ∪ S2) == merge(sketch(S1), sketch(S2)) exactly — the property
    the reference's composeSketch trick relies on."""
    u = _elements(6, 3000)
    s1, s2 = u[:2000], u[1500:]  # overlapping
    a = sk.sketch_rows(s1, np.array([0, len(s1)]))
    b = sk.sketch_rows(s2, np.array([0, len(s2)]))
    full = sk.sketch_rows(u, np.array([0, len(u)]))
    assert np.array_equal(sk.merge(a, b), full)


@pytest.mark.parametrize("sk", FAMILIES, ids=IDS)
def test_multi_row_batch_equals_per_row(sk):
    """Batched sketch_rows over several rows == each row sketched alone."""
    vals = _elements(7, 900)
    offsets = np.array([0, 100, 100, 600, 900])  # includes an empty row
    batch = sk.sketch_rows(vals, offsets)
    for i in range(4):
        lo, hi = offsets[i], offsets[i + 1]
        single = sk.sketch_rows(vals[lo:hi], np.array([0, hi - lo]))
        assert np.array_equal(batch[i], single[0]), f"row {i}"


@pytest.mark.parametrize("sk", FAMILIES, ids=IDS)
def test_trailing_empty_rows(sk):
    """Empty rows at the END of a batch (all-stopword caption / blocklisted
    shingles) must not crash or perturb neighbors — regression for the
    reduceat offset==len edge (ADVICE r1)."""
    vals = _elements(11, 700)
    for offsets in ([0, 0], [0, 700, 700], [0, 0, 700, 700, 700],
                    [0, 300, 300, 700, 700]):
        offs = np.array(offsets)
        batch = sk.sketch_rows(vals[:offs[-1]], offs)
        for i in range(len(offs) - 1):
            lo, hi = offs[i], offs[i + 1]
            single = sk.sketch_rows(vals[lo:hi], np.array([0, hi - lo]))
            assert np.array_equal(batch[i], single[0]), (offsets, i)


def test_content_keys_layout_independent():
    """content_keys must not depend on batch layout (trailing/leading empty
    rows) — regression for the clipped-offset xor truncation (ADVICE r1)."""
    from setsketch_ray.stages.shingle import content_keys

    vals = _elements(12, 50)
    solo = content_keys(vals, np.array([0, 50]))[0]
    with_trailing = content_keys(vals, np.array([0, 50, 50]))
    with_leading = content_keys(vals, np.array([0, 0, 50]))
    assert with_trailing[0] == solo
    assert with_leading[1] == solo
    # empty rows all get the same (distinct) key
    assert with_trailing[1] == with_leading[0]
    assert with_trailing[1] != solo
    # keys of distinct sets differ; sandwiched empties don't shift neighbors
    k = content_keys(vals, np.array([0, 20, 20, 50]))
    assert k[0] == content_keys(vals[:20], np.array([0, 20]))[0]
    assert k[2] == content_keys(vals[20:], np.array([0, 30]))[0]


@pytest.mark.parametrize("sk", [f for f in FAMILIES
                                if not isinstance(f, MinHash)], ids=[
    i for i, f in zip(IDS, FAMILIES) if not isinstance(f, MinHash)])
def test_register_bounds(sk):
    vals = _elements(8, 20000)
    regs = sk.sketch_rows(vals, np.array([0, 20000]))
    assert regs.min() >= 0
    if isinstance(sk, HyperMinHash):
        max_packed = (1 << sk.bucketsize) << sk.subbucketsize | sk.sub_mask
        assert regs.max() <= max_packed
    else:
        assert regs.max() <= sk.q + 1


def test_setsketch_bulk_retry_path():
    """Force the bulk limit-retry loop (tiny success probability) and check the
    result still equals streaming — the reference's addAll guarantee
    (``sketch.hpp:1200-1221``)."""
    import setsketch_ray.sketchlib.sketches as sk_mod

    s = SetSketch1(m=64, base=2.0, a=20.0, q=62)
    s.limit_factor = s.limit_factor / 50.0  # force many retries
    vals = _elements(9, 300)
    bulk = s.sketch_rows(vals, np.array([0, 300]))
    stream = s.empty(1)
    s.add_flat(stream, np.zeros(300, dtype=np.int64), vals)
    assert np.array_equal(bulk, stream)


@pytest.mark.parametrize("cls", [SetSketch1, SetSketch2])
def test_bulk_first_attempt_success_probability(cls):
    """The point-limit formula targets >= 95 % first-attempt success
    (``sketch.hpp:1085, 1114``); measure it like data/bulk_update_test*.csv
    (the SetSketch2 limit is an approximation — allow a small margin)."""
    sk = cls(m=256, base=2.0, a=20.0, q=62)
    n_rows, per_row = 300, 500
    vals = _elements(12, n_rows * per_row)
    offsets = np.arange(0, n_rows * per_row + 1, per_row)
    attempts = np.zeros(n_rows, dtype=np.int64)
    sk.sketch_rows(vals, offsets, attempts_out=attempts)
    success = (attempts == 1).mean()
    assert success >= 0.85, f"first-attempt success {success}"
    assert attempts.max() <= 5


def test_kll_quantile_sketch():
    """Mergeable KLL compactor stack: rank error <= 1.5% at k=200 over
    10^6 heavy-tailed values, exact n, merge parity, bit-stable serde,
    deterministic across identical reruns."""
    import numpy as np

    from setsketch_ray.sketchlib.quantiles import KllSketch

    rng = np.random.default_rng(5)
    x = rng.lognormal(0, 2, 1_000_000)
    xs = np.sort(x)

    def build(chunks):
        sk = KllSketch(200)
        for c in chunks:
            sk.add_flat(c)
        return sk

    sk = build(x[lo:lo + 65536] for lo in range(0, x.size, 65536))
    assert sk.n == x.size
    for phi in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.quantile(phi)
        r = np.searchsorted(xs, est, side="right")
        assert abs(r - phi * x.size) / x.size <= 0.015, (phi, r)
    # sketch stays tiny
    assert sum(b.size for b in sk.levels) < 3 * 200

    # merge of 8 disjoint partials agrees within the bound; n exact
    parts = [KllSketch(200) for _ in range(8)]
    for i, p in enumerate(parts):
        p.add_flat(x[i::8])
    m = parts[0]
    for p in parts[1:]:
        m = m.merge(p)
    assert m.n == x.size
    for phi in (0.1, 0.5, 0.9):
        r = np.searchsorted(xs, m.quantile(phi), side="right")
        assert abs(r - phi * x.size) / x.size <= 0.02, phi

    # serde is bit-exact; rebuild of the same stream is bit-identical
    blob = sk.to_bytes()
    back = KllSketch.from_bytes(blob)
    assert back.to_bytes() == blob and back.quantile(0.5) == sk.quantile(0.5)
    sk2 = build(x[lo:lo + 65536] for lo in range(0, x.size, 65536))
    assert sk2.to_bytes() == blob  # no RNG state anywhere

    import pytest

    with pytest.raises(ValueError):
        KllSketch(200).add_flat(np.array([1.0, np.nan]))
    with pytest.raises(ValueError):
        KllSketch(200).merge(KllSketch(100))


def test_countmin_properties():
    """CMS: one-sided error, linear merge == bulk, weighted == repeated,
    serialization round trip, deterministic across add order."""
    import numpy as np

    from setsketch_ray.sketchlib.countmin import CountMinSketch

    rng = np.random.default_rng(7)
    keys = (rng.zipf(1.3, 100000) % 30000).astype(np.uint64)
    sk = CountMinSketch(1 << 12, 5, seed=3)
    sk.add_flat(keys)
    uq, cnt = np.unique(keys, return_counts=True)
    est = sk.estimate(uq)
    assert (est >= cnt).all()                        # never under-counts
    assert sk.n == len(keys)
    # expected per-row collision mass is n/width; min over 5 rows stays
    # well under 8x that for every key on this distribution
    assert int((est - cnt).max()) * (1 << 12) <= 8 * sk.n

    # linearity: partials summed == bulk, any split, any merge order
    a = CountMinSketch(1 << 12, 5, seed=3)
    b = CountMinSketch(1 << 12, 5, seed=3)
    a.add_flat(keys[:41737])
    b.add_flat(keys[41737:])
    for m in (a.merge(b), b.merge(a)):
        assert (m.table == sk.table).all() and m.n == sk.n

    # weighted add == repeated add
    w1 = CountMinSketch(256, 3, seed=1)
    w1.add_flat(np.array([5, 9, 5, 5], np.uint64))
    w2 = CountMinSketch(256, 3, seed=1)
    w2.add_flat(np.array([9, 5], np.uint64), np.array([1, 3]))
    assert (w1.table == w2.table).all()

    # bytes round trip
    rt = CountMinSketch.from_bytes(sk.to_bytes())
    assert (rt.table == sk.table).all() and rt.n == sk.n \
        and (rt.width, rt.depth, rt.seed) == (sk.width, sk.depth, sk.seed)

    # order invariance (pure function of the multiset)
    sh = CountMinSketch(1 << 12, 5, seed=3)
    sh.add_flat(keys[::-1].copy())
    assert (sh.table == sk.table).all()

    # config mismatch refuses to merge
    import pytest
    with pytest.raises(ValueError):
        sk.merge(CountMinSketch(1 << 11, 5, seed=3))


def test_theta_sketch_properties():
    """KMV/theta (sketchlib/theta.py): exact below k, exact bottom-k merge
    (any split of the stream gives a bit-identical sketch), estimator and
    set-op accuracy, determinism."""
    import numpy as np

    from setsketch_ray.sketchlib.hashing import mix64
    from setsketch_ray.sketchlib.theta import (
        ThetaSketch, theta_difference_estimate,
        theta_intersection_estimate, theta_union_estimate)

    k = 512
    ha = mix64(np.arange(0, 30_000, dtype=np.uint64))
    hb = mix64(np.arange(20_000, 45_000, dtype=np.uint64))

    # exact regime: below k the sketch IS the distinct set
    small = ThetaSketch.from_hashed(k, ha[:300])
    assert small.estimate() == 300.0
    assert small.cut == 2 ** 64

    # merge exactness: any block split folds to the single-pass sketch
    one = ThetaSketch.from_hashed(k, ha)
    parts = [ThetaSketch.from_hashed(k, c) for c in np.array_split(ha, 7)]
    folded = parts[0]
    for p in parts[1:]:
        folded = folded.merge(p)
    assert np.array_equal(folded.hashes, one.hashes)

    # duplicate inputs are absorbed (distinct semantics)
    dup = ThetaSketch.from_hashed(k, np.concatenate([ha, ha]))
    assert np.array_equal(dup.hashes, one.hashes)

    # wire form round trip
    rt = ThetaSketch.from_bytes(k, one.to_bytes())
    assert np.array_equal(rt.hashes, one.hashes)

    # estimator accuracy: rel std ~ 1/sqrt(k-2) ~ 4.4%; assert 4 sigma
    sa, sb = one, ThetaSketch.from_hashed(k, hb)
    assert abs(sa.estimate() / 30_000 - 1) < 0.18
    assert abs(theta_union_estimate(sa, sb) / 45_000 - 1) < 0.18
    inter = theta_intersection_estimate(sa, sb)
    # set-op estimates spread wider (smaller effective sample): loose band
    assert abs(inter / 10_000 - 1) < 0.3
    assert abs(theta_difference_estimate(sa, sb) / 20_000 - 1) < 0.3
    assert abs(theta_difference_estimate(sb, sa) / 15_000 - 1) < 0.3

    # inclusion-exclusion coherence within the shared cut region
    cut = min(sa.cut, sb.cut)
    na, nb = len(sa.sample(cut)), len(sb.sample(cut))
    ni = len(np.intersect1d(sa.sample(cut), sb.sample(cut)))
    assert len(np.union1d(sa.sample(cut), sb.sample(cut))) == na + nb - ni
