"""Counter-mode 64-bit hashing kernels and hash-derived random draws.

The reference engine derives all per-element randomness from a lazily
evaluated wyrand bitstream seeded by the element value
(``/root/reference/c++/bitstream_random.hpp:188-232``).  This engine uses an
equivalent but vectorization-friendly scheme: a *counter-mode* mix — every
draw ``j`` for element ``d`` is ``mix2(d, j)`` where ``mix2`` is a strong
64-bit finalizer (murmur3 fmix64 composition).  Sketches built this way are
deterministic pure functions of the element hashes, so stream/bulk/merge
equivalence and cross-worker reproducibility hold by construction
(cf. ``/root/reference/c++/bulk_update_test.cpp:86``).

All kernels are NumPy-vectorized over uint64 arrays; integer overflow wraps
mod 2**64 which is exactly the arithmetic we want.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64

_M1 = U64(0xFF51AFD7ED558CCD)
_M2 = U64(0xC4CEB9FE1A85EC53)
_GOLDEN = U64(0x9E3779B97F4A7C15)
_C2 = U64(0x2545F4914F6CDD1D)

_S33 = U64(33)
_S11 = U64(11)

# 2^-53: converts a 53-bit integer into a double in [0, 1)
_INV_2_53 = float(np.ldexp(1.0, -53))


def mix64(x: np.ndarray | int) -> np.ndarray:
    """murmur3 fmix64 finalizer — bijective on uint64."""
    x = np.asarray(x, dtype=np.uint64).copy()
    x ^= x >> _S33
    x *= _M1
    x ^= x >> _S33
    x *= _M2
    x ^= x >> _S33
    return x


def mix2(a: np.ndarray | int, b: np.ndarray | int) -> np.ndarray:
    """Counter-mode combine: draw ``b`` of stream seeded by ``a``.

    Equivalent role to the reference's per-element ``WyrandBitStream``
    (``bitstream_random.hpp:188-232``): the sequence ``mix2(d, 0), mix2(d, 1),
    ...`` is the canonical draw sequence for element ``d``.
    """
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    return mix64((a + b * _GOLDEN) ^ _C2)


_FAST_M = U64(0xD6E8FEB86659FD93)
_S32 = U64(32)


def mix_columns(vals: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """(n,) values x (m,) seeds -> (m, n) draw matrix with a cheap 2-round
    multiply-xorshift mix (splittable-hash structure).  Used where the full
    fmix64 costs too much per draw (MinHash's m draws per element); the
    2-round variant still passes the bucket chi-square tests."""
    out = np.empty((len(seeds), len(vals)), dtype=np.uint64)
    mix_columns_into(vals, seeds, out, np.empty_like(out))
    return out


def mix_columns_into(vals: np.ndarray, seeds: np.ndarray,
                     out: np.ndarray, tmp: np.ndarray) -> None:
    """In-place ``mix_columns`` into preallocated (m, n) buffers — same draw
    values, zero temporary allocations (the allocating expression form made
    ~5 full-matrix temporaries, turning the kernel DRAM-bound)."""
    np.bitwise_xor(seeds[:, None], vals[None, :], out=out)
    np.multiply(out, _FAST_M, out=out)
    np.right_shift(out, _S32, out=tmp)
    np.bitwise_xor(out, tmp, out=out)
    np.multiply(out, _FAST_M, out=out)
    np.right_shift(out, _S32, out=tmp)
    np.bitwise_xor(out, tmp, out=out)


def hash_str_u64(values, seed: int = 0) -> np.ndarray:
    """Hash strings/bytes to uint64 (for shingles/ids): FNV-1a over UTF-8
    bytes followed by ``mix64`` — deterministic across workers and runs
    (Python's builtin hash is salted per-process).

    Accepts a Python list OR a ``pyarrow`` string/binary array.  Vectorized
    across rows: the byte matrix is walked column-wise, so the inner loop is
    ``max_len`` NumPy passes instead of ``total_bytes`` Python ops.  uint64
    wraparound reproduces the masked Python arithmetic bit-exactly.
    """
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = list(values)
        has_bytes = any(isinstance(v, bytes) for v in values)
        if has_bytes:
            # mixed str/bytes lists hash by UTF-8 byte content: encode strs
            # so pa.array gets a homogeneous binary list
            values = [v.encode("utf-8") if isinstance(v, str) else v
                      for v in values]
        values = pa.array(values, pa.binary() if has_bytes else pa.string())
    n = len(values)
    fnv_offset = U64(0xCBF29CE484222325
                     ^ (seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
    fnv_prime = U64(0x100000001B3)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if pa.types.is_large_string(values.type) or \
            pa.types.is_large_binary(values.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    offs = np.frombuffer(values.buffers()[1], off_dtype)[
        values.offset:values.offset + n + 1].astype(np.int64)
    data = np.frombuffer(values.buffers()[2] or b"", np.uint8)
    lens = np.diff(offs)
    h = np.full(n, fnv_offset, dtype=np.uint64)
    max_len = int(lens.max()) if n else 0
    # chunk rows so the padded byte matrix stays cache-friendly
    rows_per_chunk = max(1, (1 << 22) // max(max_len, 1))
    with np.errstate(over="ignore"):
        for lo in range(0, n, rows_per_chunk):
            hi = min(lo + rows_per_chunk, n)
            L = lens[lo:hi]
            ml = int(L.max())
            if ml == 0:
                continue
            m = hi - lo
            mat = np.zeros((m, ml), dtype=np.uint8)
            mask2d = np.arange(ml) < L[:, None]
            # string rows are contiguous in the value buffer
            mat[mask2d] = data[offs[lo]:offs[hi]]
            hc = h[lo:hi]
            for j in range(ml):
                active = j < L
                nh = (hc ^ mat[:, j].astype(np.uint64)) * fnv_prime
                hc = np.where(active, nh, hc)
            h[lo:hi] = hc
    return mix64(h)


def uniform_double(h: np.ndarray) -> np.ndarray:
    """Map uint64 hashes to doubles uniform in [0, 1) via the 53-bit mantissa
    trick (semantics of ``getUniformDouble``, ``bitstream_random.hpp:43-49``)."""
    h = np.asarray(h, dtype=np.uint64)
    return (h >> _S11).astype(np.float64) * _INV_2_53


def exponential(h: np.ndarray) -> np.ndarray:
    """Exp(1) draw from a uint64 hash via inverse CDF ``-log1p(-u)``.

    Distributionally identical to the reference's ziggurat sampler
    (``exponential_distribution.hpp:192-230``); the ziggurat exists only to
    save random bits, which costs us nothing in counter mode.
    """
    return -np.log1p(-uniform_double(h))


def truncated_exponential(h: np.ndarray, rate) -> np.ndarray:
    """Truncated-exponential draw on [0, 1] with given rate, via inverse CDF.

    Matches the distribution of ``TruncatedExponentialDistribution``
    (``bitstream_random.hpp:234-276``): density ∝ exp(-rate·x) on [0,1];
    rate == 0 degenerates to uniform.
    """
    u = uniform_double(h)
    rate = np.asarray(rate, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        x = -np.log1p(u * np.expm1(-rate)) / rate
    return np.where(rate == 0.0, u, x)


def bounded_uint(h: np.ndarray, n: int) -> np.ndarray:
    """Uniform integer in [0, n) from a uint64 hash (Lemire multiply-shift,
    semantics of ``getUniformLemire``, ``bitstream_random.hpp:169-182``).

    Counter-mode hashes are uniform on the full 64-bit range, so the
    multiply-high trick gives an (essentially) unbiased bounded draw without
    rejection.
    """
    h = np.asarray(h, dtype=np.uint64)
    # n always fits in 32 bits (register counts), so Lemire reduces to one
    # 64-bit multiply of the hash's high 32 bits: ((h >> 32) * n) >> 32.
    if n > 0xFFFFFFFF:
        raise ValueError("bounded_uint supports n <= 2^32")
    s32 = U64(32)
    return ((h >> s32) * U64(n)) >> s32


def bernoulli(h: np.ndarray, p: float) -> np.ndarray:
    """Bernoulli(p) draw (cf. ``getBernoulli``, ``bitstream_random.hpp:56-70``)."""
    return uniform_double(h) < p


def trailing_ones(d: np.ndarray, cap: int) -> np.ndarray:
    """Count of trailing 1-bits of each uint64, capped at ``cap``.

    Used by the HLL/HyperMinHash register-value draw
    (``sketch.hpp:1076-1079``, ``sketch.hpp:1945-1952``).
    """
    d = np.asarray(d, dtype=np.uint64)
    inv = ~d
    # lowest set bit of inv == first 0-bit of d; inv & (-inv) isolates it.
    low = inv & (U64(0) - inv)
    # log2 of a power of two is exact in float64 (values up to 2^63)
    with np.errstate(divide="ignore"):
        t = np.where(low == 0, 64.0, np.log2(low.astype(np.float64)))
    return np.minimum(t.astype(np.int64), cap)


class FeistelPermutation:
    """Format-preserving pseudorandom permutation of [0, m) keyed per element.

    Plays the role of the reference's incremental Fisher–Yates
    ``PermutationStream`` (``bitstream_random.hpp:279-330``): SetSketch draws
    register slots *without replacement*, one slot per order-statistic point.
    A 4-round Feistel network over the smallest even-width bit domain
    covering m, with cycle-walking back into [0, m), gives O(1) random access
    ``perm_key(i)`` — vectorizable over (element, i) pairs, which an
    incremental Fisher–Yates is not.
    """

    ROUNDS = 4

    def __init__(self, m: int):
        if m <= 0:
            raise ValueError("m must be positive")
        self.m = m
        nbits = max(2, int(np.ceil(np.log2(max(m, 2)))))
        if nbits % 2:
            nbits += 1
        self.half = U64(nbits // 2)
        self.half_mask = U64((1 << (nbits // 2)) - 1)
        self.domain = 1 << nbits

    _ROUND_KEYS = tuple(U64((r * 0x6A09E667F3BCC909) & 0xFFFFFFFFFFFFFFFF)
                        for r in range(ROUNDS))

    def _feistel(self, keys: np.ndarray, x: np.ndarray) -> np.ndarray:
        left = x >> self.half
        right = x & self.half_mask
        for rk in self._ROUND_KEYS:
            f = mix2(keys + rk, right) & self.half_mask
            left, right = right, left ^ f
        return (left << self.half) | right

    def apply(self, keys: np.ndarray, idx: np.ndarray) -> np.ndarray:
        """perm_keys[i](idx[i]) for parallel arrays of keys and indices."""
        keys = np.asarray(keys, dtype=np.uint64)
        x = np.asarray(idx, dtype=np.uint64).copy()
        if self.domain == self.m:
            return self._feistel(keys, x)
        x = self._feistel(keys, x)
        out = np.where(x < self.m, x, U64(0))
        pending = x >= self.m
        # cycle-walk: re-encrypt until the value lands inside [0, m).
        # domain <= 4m, so expected walks < 4; bound loop for safety.
        for _ in range(128):
            if not pending.any():
                break
            x2 = self._feistel(keys[pending], x[pending])
            x[pending] = x2
            done = x2 < self.m
            idxp = np.flatnonzero(pending)
            out[idxp[done]] = x2[done]
            pending[idxp[done]] = False
        return out
