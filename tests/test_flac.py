"""FLAC codec: bit-exact round trips through our encoder, plus
decoder-coverage tests over hand-crafted spec features our encoder never
emits (LPC subframes, mid/left/right-side stereo, Rice2 partitions,
escape-to-raw partitions, wasted bits)."""

import struct

import numpy as np
import pytest

from setsketch_ray.sources import flac as F
from setsketch_ray.sources.flac import decode_flac, encode_flac, flac_info


def _tone(n, freq, rate, amp=20000, phase=0.0):
    return np.round(amp * np.sin(2 * np.pi * freq * np.arange(n) / rate
                                 + phase)).astype(np.int16)


# ------------------------------------------------------------ round trips
@pytest.mark.parametrize("nch", [1, 2])
def test_flac_roundtrip_bit_exact(nch):
    rate = 16000
    pcm = _tone(rate + 137, 440, rate)  # > 1 block, odd tail
    if nch == 2:
        pcm = np.stack([pcm, _tone(rate + 137, 700, rate, 9000)], axis=1)
    blob = encode_flac(pcm, rate)
    dec, r, bps = decode_flac(blob)
    assert (r, bps) == (rate, 16)
    ref = pcm.astype(np.int32) if nch == 2 else pcm.astype(np.int32)[:, None]
    assert np.array_equal(dec, ref)
    info = flac_info(blob)
    assert info["channels"] == nch
    assert info["duration_s"] == pytest.approx((rate + 137) / rate)


def test_flac_roundtrip_extremes():
    # noise (verbatim-ish cost), constant, full-scale values
    rng = np.random.default_rng(3)
    for sig in (rng.integers(-32768, 32768, 4097).astype(np.int16),
                np.full(5000, 12345, np.int16),
                np.array([-32768, 32767, -32768, 32767] * 100, np.int16)):
        dec, _, _ = decode_flac(encode_flac(sig, 8000))
        assert np.array_equal(dec[:, 0], sig.astype(np.int32))


def test_flac_md5_guard():
    blob = bytearray(encode_flac(_tone(3000, 300, 8000), 8000))
    # corrupt one audio byte while keeping CRCs "recomputable": corrupting
    # payload must trip CRC-16 (before MD5 even runs)
    blob[-3] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def test_flac_property_roundtrip():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(n=st.integers(1, 9000), seed=st.integers(0, 2**31 - 1),
           nch=st.sampled_from([1, 2]),
           kind=st.sampled_from(["tone", "noise", "ramp"]))
    def check(n, seed, nch, kind):
        rng = np.random.default_rng(seed)
        if kind == "tone":
            sig = _tone(n, float(rng.uniform(50, 3000)), 8000,
                        int(rng.integers(100, 32000)))
        elif kind == "noise":
            sig = rng.integers(-32768, 32768, n).astype(np.int16)
        else:
            sig = (np.arange(n) % 30000 - 15000).astype(np.int16)
        pcm = sig if nch == 1 else np.stack([sig, sig[::-1]], axis=1)
        dec, _, _ = decode_flac(encode_flac(pcm, 8000))
        ref = pcm.astype(np.int32)
        assert np.array_equal(dec, ref if nch == 2 else ref[:, None])

    check()


# -------------------------------------------- hand-crafted decoder coverage
def _hand_stream(nch, blocksize, write_subframes, ch_code=None,
                 rate=8000, bps=16):
    si = F._Writer()
    si.bits(blocksize, 16)
    si.bits(blocksize, 16)
    si.bits(0, 24)
    si.bits(0, 24)
    si.bits(rate, 20)
    si.bits(nch - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(blocksize, 36)
    streaminfo = si.bytes_() + b"\x00" * 16  # md5 zeros -> check skipped
    head = (b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
            + streaminfo)
    w = F._Writer()
    w.bits(0x3FFE, 14)
    w.bits(0, 2)
    w.bits(7, 4)              # blocksize-1 as 16 bits at end
    w.bits(0, 4)              # rate from STREAMINFO
    w.bits(ch_code if ch_code is not None else nch - 1, 4)
    w.bits(4, 3)              # 16-bit samples
    w.bits(0, 1)
    w.bits(0, 8)              # frame number 0
    w.bits(blocksize - 1, 16)
    hdr = w.bytes_()
    w2 = F._Writer()
    w2.out = bytearray(hdr)
    w2.bits(F._crc8(hdr), 8)
    write_subframes(w2)
    w2.align()
    body = w2.bytes_()
    return head + body + struct.pack(">H", F._crc16(body))


def _write_verbatim(w, sig, bps=16):
    w.bits(0, 1)
    w.bits(1, 6)
    w.bits(0, 1)
    for v in sig:
        w.bits(int(v) & ((1 << bps) - 1), bps)


def test_flac_lpc_subframe_decode():
    """LPC subframe: decoder reconstruction must equal the reference
    recurrence out[i] = res[i] + ((sum c_k * out[i-1-k]) >> shift)."""
    rng = np.random.default_rng(11)
    # stable filter: sum|coefs| / 2^shift < 1 so the recurrence stays
    # bounded (an unstable one overflows int64 and proves nothing)
    order, prec, shift = 3, 12, 10
    coefs = [500, -200, 80]
    warm = [100, -50, 75]
    res = rng.integers(-40, 40, 61).astype(np.int64)
    expect = np.empty(64, dtype=np.int64)
    expect[:3] = warm
    for i in range(3, 64):
        pred = sum(int(coefs[k]) * int(expect[i - 1 - k])
                   for k in range(order))
        expect[i] = res[i - 3] + (pred >> shift)
    assert np.abs(expect).max() < 1 << 20  # bounded: int64-safe

    def sub(w):
        w.bits(0, 1)
        w.bits(31 + order, 6)      # LPC, order 3
        w.bits(0, 1)               # no wasted bits
        for v in warm:
            w.bits(v & 0xFFFF, 16)
        w.bits(prec - 1, 4)
        w.bits(shift & 0x1F, 5)
        for c in coefs:
            w.bits(c & ((1 << prec) - 1), prec)
        w.bits(0, 2)               # rice method 0
        w.bits(0, 4)               # partition order 0
        param = F._best_rice_param(res)
        w.bits(param, 4)
        F._write_rice(w, res, param)

    dec, _, _ = decode_flac(_hand_stream(1, 64, sub))
    assert np.array_equal(dec[:, 0], expect.astype(np.int32))


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_flac_stereo_decorrelation_decode(ch_code):
    """left/side, right/side and mid/side frames reconstruct (L, R)."""
    rng = np.random.default_rng(ch_code)
    left = rng.integers(-3000, 3000, 48).astype(np.int64)
    right = rng.integers(-3000, 3000, 48).astype(np.int64)
    side = left - right
    if ch_code == 8:
        ch0, ch1, side_flags = left, side, (False, True)
    elif ch_code == 9:
        ch0, ch1, side_flags = side, right, (True, False)
    else:
        ch0, ch1, side_flags = (left + right) >> 1, side, (False, True)

    def sub(w):
        _write_verbatim(w, ch0, 16 + (1 if side_flags[0] else 0))
        _write_verbatim(w, ch1, 16 + (1 if side_flags[1] else 0))

    dec, _, _ = decode_flac(_hand_stream(2, 48, sub, ch_code=ch_code))
    assert np.array_equal(dec[:, 0], left.astype(np.int32))
    assert np.array_equal(dec[:, 1], right.astype(np.int32))


def test_flac_rice2_partitions_and_escape():
    """FIXED-order-1 subframe with Rice2 (method 1), partition order 1:
    first partition normal 5-bit param, second escaped to raw 7-bit."""
    warm = [10]
    res = np.concatenate([np.arange(-8, 23), np.arange(-16, 16)]) \
        .astype(np.int64)  # 31 + 32 = 63 residuals, blocksize 64
    expect = np.empty(64, dtype=np.int64)
    expect[0] = warm[0]
    for i in range(1, 64):
        expect[i] = res[i - 1] + expect[i - 1]

    def sub(w):
        w.bits(0, 1)
        w.bits(8 + 1, 6)          # FIXED order 1
        w.bits(0, 1)
        w.bits(warm[0] & 0xFFFF, 16)
        w.bits(1, 2)              # rice2
        w.bits(1, 4)              # partition order 1 -> 2 partitions
        w.bits(3, 5)              # partition 1: param 3
        F._write_rice(w, res[:31], 3)
        w.bits(31, 5)             # partition 2: escape (11111)
        w.bits(7, 5)              # raw 7 bits per residual
        for v in res[31:]:
            w.bits(int(v) & 0x7F, 7)

    dec, _, _ = decode_flac(_hand_stream(1, 64, sub))
    assert np.array_equal(dec[:, 0], expect.astype(np.int32))


def test_flac_wasted_bits_decode():
    sig = (np.arange(-16, 16) * 4).astype(np.int64)  # all multiples of 4

    def sub(w):
        w.bits(0, 1)
        w.bits(1, 6)              # VERBATIM
        w.bits(1, 1)              # wasted-bits flag
        w.bits(1, 2)              # unary 2: one 0 then 1 -> wasted = 2
        for v in (sig >> 2):
            w.bits(int(v) & 0x3FFF, 14)

    dec, _, _ = decode_flac(_hand_stream(1, 32, sub))
    assert np.array_equal(dec[:, 0], sig.astype(np.int32))
