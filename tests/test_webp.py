"""VP8L decoder coverage: hand-crafted bitstreams for the paths our
minimal encoder never writes (simple codes, color cache, LZ77 backrefs,
all four transforms, meta prefix codes).  Forward transforms are
re-implemented HERE independently so encoder/decoder bug-cancellation is
impossible for these paths."""

import numpy as np
import pytest

from setsketch_ray.sources.webp import (
    _BitWriter,
    _Encoder,
    _flat_lengths,
    _write_code_lengths,
    decode_webp,
    encode_webp_lossless,
)


def _wrap_riff(payload: bytes) -> bytes:
    import struct

    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw: _BitWriter, w: int, h: int):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


class _LiteralImageWriter:
    """Write one entropy-coded image region as all-literals with flat
    codes (and optionally a color cache / extra symbols emitted by the
    caller through .green/.chan)."""

    def __init__(self, bw: _BitWriter, cache_bits: int = 0,
                 level0: bool = True):
        self.bw = bw
        bw.write(1 if cache_bits else 0, 1)
        if cache_bits:
            bw.write(cache_bits, 4)
        if level0:
            bw.write(0, 1)  # no meta prefix codes (level-0 images only)
        green_n = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
        self.g_len = _flat_lengths(green_n)
        self.c_len = _flat_lengths(256)
        self.d_len = _flat_lengths(40)
        _write_code_lengths(bw, self.g_len)
        for _ in range(3):
            _write_code_lengths(bw, self.c_len)
        _write_code_lengths(bw, self.d_len)
        self.green = _Encoder(self.g_len)
        self.chan = _Encoder(self.c_len)
        self.dist = _Encoder(self.d_len)

    def literal(self, a: int, r: int, g: int, b: int):
        self.green.emit(self.bw, g)
        self.chan.emit(self.bw, r)
        self.chan.emit(self.bw, b)
        self.chan.emit(self.bw, a)

    def literal_argb(self, argb: int):
        self.literal((argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                     (argb >> 8) & 0xFF, argb & 0xFF)


def _sub_image(bw: _BitWriter, argbs):
    """Auxiliary (non-level0) entropy image: no meta bit is read by the
    decoder, so just cache bit + codes + literals."""
    wimg = _LiteralImageWriter(bw, level0=False)
    for v in argbs:
        wimg.literal_argb(int(v))


def test_simple_prefix_codes_stream():
    """Green via a 2-symbol SIMPLE code, channels via 1-symbol simple
    codes (zero bits per read)."""
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transform
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green: simple, 2 symbols (10, 200), first as 8-bit
    bw.write(1, 1)
    bw.write(1, 1)   # num_symbols-1 = 1
    bw.write(1, 1)   # first symbol is 8-bit
    bw.write(10, 8)
    bw.write(200, 8)
    # r, b, a: simple, 1 symbol each (5, 6, 255)
    for sym in (5, 6, 255):
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    # distance: simple, 1 symbol (0)
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # pixels greens: 10, 200, 200, 10 -> canonical 1-bit codes: 10->0,
    # 200->1 (symbol order)
    for bit in (0, 1, 1, 0):
        bw.write(bit, 1)
    img = decode_webp(_wrap_riff(bw.bytes_()))
    want = np.array([[[5, 10, 6], [5, 200, 6], [5, 200, 6], [5, 10, 6]]],
                    np.uint8)
    assert np.array_equal(img, want)


def test_lz77_and_color_cache_stream():
    """Backward reference through the 2D distance map + cache hits."""
    bw = _BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transform
    w = _LiteralImageWriter(bw, cache_bits=4)
    p0 = (255 << 24) | (1 << 16) | (2 << 8) | 3
    p1 = (255 << 24) | (9 << 16) | (8 << 8) | 7
    w.literal_argb(p0)
    w.literal_argb(p1)
    # LZ77: length 4, distance 2 -> copies p0 p1 p0 p1
    w.green.emit(bw, 256 + 3)      # length code 3 -> value 4, no extras
    # distance value 6 -> map entry (2,0) -> dist 2: symbol 4 + extra 1
    w.dist.emit(bw, 4)
    bw.write(1, 1)
    # cache hits for p0 and p1
    key0 = ((0x1E35A7BD * p0) & 0xFFFFFFFF) >> 28
    key1 = ((0x1E35A7BD * p1) & 0xFFFFFFFF) >> 28
    assert key0 != key1
    w.green.emit(bw, 280 + key0)
    w.green.emit(bw, 280 + key1)
    img = decode_webp(_wrap_riff(bw.bytes_()))
    pix = lambda p: [(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF]  # noqa
    want = np.array([[pix(p0), pix(p1), pix(p0), pix(p1), pix(p0),
                      pix(p1), pix(p0), pix(p1)]], np.uint8)
    assert np.array_equal(img, want)


def test_subtract_green_stream():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (3, 7, 3), dtype=np.uint8)
    # forward transform (independent implementation)
    r = (img[:, :, 0].astype(np.int32) - img[:, :, 1]) % 256
    b = (img[:, :, 2].astype(np.int32) - img[:, :, 1]) % 256
    bw = _BitWriter()
    _header(bw, 7, 3)
    bw.write(1, 1)
    bw.write(2, 2)   # subtract green
    bw.write(0, 1)   # no more transforms
    w = _LiteralImageWriter(bw)
    for y in range(3):
        for x in range(7):
            w.literal(255, int(r[y, x]), int(img[y, x, 1]), int(b[y, x]))
    out = decode_webp(_wrap_riff(bw.bytes_()))
    assert np.array_equal(out, img)


def _forward_predict(img: np.ndarray, size_bits: int,
                     modes: np.ndarray) -> np.ndarray:
    """Independent forward predictor: residual = pixel - pred (mod 256),
    scanning in decode order against the ORIGINAL image (prediction uses
    reconstructed = original pixels)."""
    h, w, _ = img.shape
    bw_blocks = (w + (1 << size_bits) - 1) >> size_bits
    a = np.full((h, w), 255, np.int32)
    px = img.astype(np.int32)
    flat = np.concatenate([a[..., None], px], axis=2)  # ARGB

    def avg2(u, v):
        return (u + v) // 2

    res = np.zeros_like(flat)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = flat[0, x - 1]
            elif x == 0:
                pred = flat[y - 1, 0]
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                L = flat[y, x - 1]
                T = flat[y - 1, x]
                TL = flat[y - 1, x - 1]
                TR = flat[y - 1, x + 1] if x + 1 < w else flat[y, 0]
                if mode == 0:
                    pred = np.array([255, 0, 0, 0])
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:
                    p = L + T - TL
                    pred = L if np.abs(p - L).sum() <= np.abs(p - T).sum() \
                        else T
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:
                    ave = avg2(L, T)
                    pred = np.clip(ave + ((ave - TL) >> 1), 0, 255)
            res[y, x] = (flat[y, x] - pred) % 256
    del bw_blocks
    return res  # ARGB residuals


def test_predictor_stream_all_modes():
    rng = np.random.default_rng(7)
    h, w = 8, 12
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    size_bits = 2  # 4x4 blocks -> 2x3 block grid
    modes = np.array([[1, 5, 11], [12, 13, 7]], np.int64)
    res = _forward_predict(img, size_bits, modes)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)            # predictor transform
    bw.write(size_bits - 2, 3)
    # block image: modes in the green channel
    _sub_image(bw, [(255 << 24) | (int(m) << 8)
                    for m in modes.reshape(-1)])
    bw.write(0, 1)            # no more transforms
    wimg = _LiteralImageWriter(bw)
    for y in range(h):
        for x in range(w):
            a, r, g, b = res[y, x]
            wimg.literal(int(a), int(r), int(g), int(b))
    out = decode_webp(_wrap_riff(bw.bytes_()))
    assert np.array_equal(out, img)


def test_color_transform_stream():
    rng = np.random.default_rng(11)
    h, w = 6, 9
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    size_bits = 3  # one 8x8-ish block grid: 2x1 blocks
    g2r, g2b, r2b = 23, -17, 5  # signed int8 elements

    def s8mul(t, c):
        cs = c - 256 if c >= 128 else c
        return (t * cs) >> 5

    # forward: subtract the deltas (order: blue loses r2b of the ORIGINAL
    # red AND g2b of green; red loses g2r of green)
    res = img.astype(np.int32).copy()
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            new_r = (r - s8mul(g2r, g)) % 256
            # the inverse adds r2b of the inverse-RECOVERED red, which
            # equals the original red — so forward subtracts r2b(orig red)
            new_b = (b - s8mul(g2b, g) - s8mul(r2b, r)) % 256
            res[y, x] = (new_r, g, new_b)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)            # color transform
    bw.write(size_bits - 2, 3)
    bw_blocks = (w + (1 << size_bits) - 1) >> size_bits
    bh_blocks = (h + (1 << size_bits) - 1) >> size_bits
    cte = ((255 << 24) | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8)
           | (g2r & 0xFF))
    _sub_image(bw, [cte] * (bw_blocks * bh_blocks))
    bw.write(0, 1)
    wimg = _LiteralImageWriter(bw)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in res[y, x])
            wimg.literal(255, r, g, b)
    out = decode_webp(_wrap_riff(bw.bytes_()))
    assert np.array_equal(out, img)


def test_color_indexing_packed_stream():
    """3-color palette -> 2-bit packed indices (4 px per green byte)."""
    palette = np.array([(255, 10, 20, 30), (255, 200, 100, 50),
                        (255, 0, 0, 255)], np.int64)
    h, w = 3, 10
    rng = np.random.default_rng(13)
    idx = rng.integers(0, 3, (h, w))
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)            # color indexing
    bw.write(3 - 1, 8)        # n_colors - 1
    # palette entries are DELTA coded component-wise
    deltas = []
    prev = np.zeros(4, np.int64)
    for p in palette:
        d = (p - prev) % 256
        deltas.append((int(d[0]) << 24) | (int(d[1]) << 16)
                      | (int(d[2]) << 8) | int(d[3]))
        prev = p
    _sub_image(bw, deltas)
    bw.write(0, 1)            # no more transforms
    # packed image: width ceil(10/4)=3, 2-bit indices LSB-first in green
    packed_w = (w + 3) // 4
    wimg = _LiteralImageWriter(bw)
    for y in range(h):
        for px in range(packed_w):
            g = 0
            for j in range(4):
                x = px * 4 + j
                if x < w:
                    g |= int(idx[y, x]) << (2 * j)
            wimg.literal(255, 0, g, 0)
    out = decode_webp(_wrap_riff(bw.bytes_()))
    want = palette[idx][:, :, 1:4].astype(np.uint8)
    assert np.array_equal(out, want)


def test_meta_prefix_codes_stream():
    """Two prefix groups selected by the meta image (block size 4)."""
    bw = _BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transform
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix codes present
    bw.write(0, 3)  # huffman_bits = 2 -> 4px blocks -> meta image 2x1
    _sub_image(bw, [(0 << 8), (1 << 8)])  # group ids 0, 1 in (r<<8|g)
    # group 0: green simple 1-symbol 50; group 1: green simple 1-symbol 99
    for gsym in (50, 99):
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(gsym, 8)
        for sym in (1, 2, 255):   # r, b, a single-symbol codes
            bw.write(1, 1)
            bw.write(0, 1)
            bw.write(1, 1)
            bw.write(sym, 8)
        bw.write(1, 1)            # distance single-symbol
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
    # 8 pixels, zero bits each (all codes single-symbol)
    img = decode_webp(_wrap_riff(bw.bytes_()))
    want = np.zeros((1, 8, 3), np.uint8)
    want[0, :4] = (1, 50, 2)
    want[0, 4:] = (1, 99, 2)
    assert np.array_equal(img, want)


def test_webp_property_roundtrip_and_dispatch():
    from setsketch_ray.sources.codec import decode_image

    rng = np.random.default_rng(17)
    for _ in range(4):
        hgt = int(rng.integers(1, 40))
        wid = int(rng.integers(1, 40))
        img = rng.integers(0, 256, (hgt, wid, 3), dtype=np.uint8)
        blob = encode_webp_lossless(img)
        assert np.array_equal(decode_webp(blob), img)
        # magic-byte dispatch through the engine seam
        assert np.array_equal(decode_image(blob, "webp"), img)


def test_webp_lossy_still_gated():
    import struct

    body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 64, 48)
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    from setsketch_ray.sources.webp import webp_info

    info = webp_info(riff)
    assert (info["codec"], info["w"], info["h"], info["decodable"]) == \
        ("vp8", 64, 48, False)
    with pytest.raises(NotImplementedError):
        decode_webp(riff)


def test_webp_through_decode_stage(ray_session):
    """Raw-WebP rows flow through the real DecodeStage actor path with
    correct recomputed phash."""
    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.sources.codec import phash64, phash_to_int64
    from setsketch_ray.stages.image import DecodeStage

    rng = np.random.default_rng(23)
    imgs = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            for _ in range(3)]
    t = pa.table({
        "image_id": ["a", "b", "c"],
        "bytes": pa.array([encode_webp_lossless(i) for i in imgs],
                          pa.binary()),
        "w": [32] * 3, "h": [32] * 3, "fmt": ["webp"] * 3,
        "caption": ["x", "y", "z"],
        "phash": pa.array([0, 0, 0], pa.int64())})
    out = rd.from_arrow(t).map_batches(
        DecodeStage, concurrency=1, batch_size=None,
        batch_format="pyarrow").take_all()
    got = {r["image_id"]: r["phash"] for r in out}
    for iid, px in zip(["a", "b", "c"], imgs):
        assert got[iid] == phash_to_int64(phash64(px))


def test_webp_probe_media_dispatch():
    from setsketch_ray.sources.video import probe_media

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    p = probe_media(encode_webp_lossless(img))
    assert (p["container"], p["codec"], p["w"], p["h"],
            p["decodable"]) == ("webp", "vp8l", 30, 20, True)


def test_flagship_on_webp_corpus(ray_session):
    """The near-dup flagship runs a WebP-majority corpus (fmt_profile=
    'webp': 3/4 of rows real VP8L files) at full recall/precision through
    the decode=True path."""
    import ray.data as rd

    from setsketch_ray.pipelines.dedup import (DedupConfig,
                                               evaluate_recall,
                                               near_dup_pipeline)
    from setsketch_ray.sources.images import generate_rows, truth_pairs

    n = 600
    t = generate_rows(range(n), fmt_profile="webp")
    fmts = set(t["fmt"].to_pylist())
    assert "webp" in fmts
    ds = rd.from_arrow(t).repartition(4)
    clustered, _, mapping = near_dup_pipeline(ds, DedupConfig(decode=True))
    assert clustered.count() == n
    rec = evaluate_recall(mapping, truth_pairs(n))
    assert rec["recall"] >= 0.99, rec
    assert rec["precision"] >= 0.95, rec


def test_animated_webp_sampling_and_stage(ray_session):
    """Animated WebP (ANMF + full-canvas VP8L frames): duration-timeline
    sampling without decoding unsampled frames, probe metadata, and the
    VideoFrameSampleStage path."""
    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.sources.video import probe_media
    from setsketch_ray.sources.webp import (
        encode_awebp,
        sample_awebp_frames,
    )
    from setsketch_ray.stages.image import VideoFrameSampleStage

    rng = np.random.default_rng(31)
    frames = [rng.integers(0, 256, (12, 18, 3), dtype=np.uint8)
              for _ in range(6)]
    blob = encode_awebp(frames, [0.5] * 6)

    p = probe_media(blob)
    assert (p["container"], p["kind"], p["codec"], p["n_frames"],
            p["decodable"]) == ("webp", "video", "vp8l", 6, True)
    assert p["duration_s"] == pytest.approx(3.0)

    blobs, ts = sample_awebp_frames(blob, every_n_seconds=1.0)
    assert ts == [0.0, 1.0, 2.0]
    for b, i in zip(blobs, (0, 2, 4)):
        assert np.array_equal(decode_webp(b), frames[i])

    t = pa.table({"video_id": ["v1"],
                  "bytes": pa.array([blob], pa.binary()),
                  "fmt": ["webp"]})
    out = rd.from_arrow(t).map_batches(
        VideoFrameSampleStage(every_n_seconds=1.0), concurrency=1,
        batch_format="pyarrow").take_all()
    assert out[0]["frame_ts"] == [0.0, 1.0, 2.0]
    assert np.array_equal(decode_webp(out[0]["frames"][0]), frames[0])
