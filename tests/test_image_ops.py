"""Multimodal stage tests: decode, resize, feature extraction, and the
clearly-marked video/audio stubs (real Ray plumbing, fake decoders)."""

import numpy as np
import pyarrow as pa
import pytest

from setsketch_ray.sources import cached_images_parquet
from setsketch_ray.sources.codec import decode_image
from setsketch_ray.stages.image import (
    AudioFeatureStage,
    DecodeStage,
    ImageFeatureStage,
    ResizeStage,
    VideoFrameSampleStage,
    resize_area,
)


@pytest.fixture(scope="module")
def img_table():
    import pyarrow.parquet as pq

    return pq.read_table(cached_images_parquet(200))


def test_decode_stage_recomputes_phash(img_table):
    out = DecodeStage()(img_table.slice(0, 50))
    assert out["decode_ok"].to_pylist() == [True] * 50
    # lossless consistency: recomputed phash equals the stored column
    assert out["phash"].to_pylist() == img_table.slice(0, 50)["phash"].to_pylist()


def test_jpeg_codec_roundtrip_psnr():
    """Baseline JPEG codec (pure NumPy, no PIL): smooth content round-trips
    at PSNR >= 40 dB (the BASELINE.json input_hint bound for lossy formats)
    at q>=90, shape preserved for non-multiple-of-8 dims, and q=100 is
    near-lossless."""
    from setsketch_ray.sources.jpeg import decode_jpeg, encode_jpeg

    x, y = np.meshgrid(np.arange(80), np.arange(72))
    img = np.stack([x * 2 % 256, (y + 40) % 256, (x + y) % 256],
                   -1).astype(np.uint8)

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)

    dec = decode_jpeg(encode_jpeg(img, 90))
    assert dec.shape == img.shape
    assert psnr(dec, img) >= 40.0
    assert psnr(decode_jpeg(encode_jpeg(img, 100)), img) >= 50.0

    # quality must be monotone (regression: the encoder once quantized with
    # a zig-zag-permuted table while DQT/decoder used raster order, which
    # made q95 WORSE than q90 on smooth content; only q100's flat table hid
    # the mismatch)
    grad = np.stack([np.tile(np.linspace(0, 255, 32), (32, 1))] * 3,
                    -1).astype(np.uint8)
    p = {q: psnr(decode_jpeg(encode_jpeg(grad, q)), grad)
         for q in (50, 75, 90, 95)}
    assert p[50] <= p[75] + 0.5 and p[75] <= p[90] + 0.5 and p[90] < p[95]
    assert p[90] >= 48.0


def test_jpeg_codec_420_and_restart_markers():
    """4:2:0 subsampled streams decode (chroma upsample path), and restart
    markers (DRI/RSTn) are consumed with DC-predictor resets — decoded
    pixels bit-identical to the marker-free stream."""
    from setsketch_ray.sources.jpeg import decode_jpeg, encode_jpeg

    x, y = np.meshgrid(np.arange(80), np.arange(72))
    img = np.stack([x * 2 % 256, (y + 40) % 256, (x + y) % 256],
                   -1).astype(np.uint8)
    d420 = decode_jpeg(encode_jpeg(img, 90, subsampling="420"))
    assert d420.shape == img.shape
    mse = np.mean((d420.astype(np.float64) - img.astype(np.float64)) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) >= 35.0
    for sub in ("444", "420"):
        ref = decode_jpeg(encode_jpeg(img, 90, sub))
        for ri in (1, 3):
            got = decode_jpeg(encode_jpeg(img, 90, sub, restart_interval=ri))
            assert np.array_equal(got, ref)


def test_jpeg_progressive_bit_identical():
    """Progressive (SOF2, spectral selection + successive approximation)
    transmits the quantized coefficients losslessly, so its decode must be
    BIT-IDENTICAL to the baseline encode/decode of the same pixels — the
    strongest possible check on every scan type in the 10-scan script."""
    from setsketch_ray.sources.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    for shape in [(64, 64), (50, 61), (17, 23)]:
        h, w = shape
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(yy * 3 + xx * 2) % 256, np.full((h, w), 128),
                        (xx * 5) % 256], axis=-1).astype(np.uint8)
        img[h // 2:, :w // 2] = rng.integers(0, 256, (h - h // 2, w // 2, 3))
        for sub in ("444", "420"):
            for q in (90, 75):
                base = decode_jpeg(encode_jpeg(img, q, sub))
                prog = decode_jpeg(encode_jpeg(img, q, sub,
                                               progressive=True))
                assert np.array_equal(base, prog), (shape, sub, q)


def test_jpeg_progressive_restarts_and_eob_runs(monkeypatch):
    """Restart markers inside progressive scans, multi-block EOB runs in
    both AC-first and AC-refinement scans, and cross-block buffered
    correction bits all decode exactly (instrumented to prove the paths
    actually run, not just that they are unreachable)."""
    import setsketch_ray.sources.jpeg as J

    stats = {"first_max": 0, "refine_max": 0, "runs_with_history": 0}
    orig_first, orig_refine = J._dec_ac_first, J._dec_ac_refine

    def first(br, lut, blk, ss, se, al, eobrun):
        r = orig_first(br, lut, blk, ss, se, al, eobrun)
        stats["first_max"] = max(stats["first_max"], r)
        return r

    def refine(br, lut, blk, ss, se, al, eobrun):
        if eobrun > 0 and np.any(blk[ss:se + 1]):
            stats["runs_with_history"] += 1
        r = orig_refine(br, lut, blk, ss, se, al, eobrun)
        stats["refine_max"] = max(stats["refine_max"], r)
        return r

    monkeypatch.setattr(J, "_dec_ac_first", first)
    monkeypatch.setattr(J, "_dec_ac_refine", refine)

    rng = np.random.default_rng(11)
    # strong stripes in scattered cells on a flat background: long EOB runs
    # whose blocks still hold history coefficients needing correction bits
    img = np.full((128, 128, 3), 120, np.uint8)
    for _ in range(30):
        by, bx = rng.integers(0, 16, 2)
        cell = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
        cell[:, ::2] = 30
        cell[:, 1::2] = 220
    for sub in ("444", "420"):
        for ri in (0, 4):
            base = J.decode_jpeg(J.encode_jpeg(img, 92, sub,
                                               restart_interval=ri))
            prog = J.decode_jpeg(J.encode_jpeg(
                img, 92, sub, restart_interval=ri, progressive=True))
            assert np.array_equal(base, prog), (sub, ri)
    assert stats["first_max"] > 1      # EOB runs spanning blocks (first)
    assert stats["refine_max"] > 1     # EOB runs spanning blocks (refine)
    assert stats["runs_with_history"] > 0  # buffered correction bits


def test_decode_image_pjpg_seam(img_table):
    """fmt='pjpg' rows decode through the DecodeStage seam with phash
    equal to a near-lossless reference (same contract as real-JPEG rows)."""
    from setsketch_ray.sources.codec import decode_image, encode_image
    from setsketch_ray.sources.jpeg import decode_jpeg

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    data = encode_image(px, "pjpg", 95)
    assert np.array_equal(decode_image(data, "pjpg"), decode_jpeg(data))


def test_jpeg_lossless_sof_still_gated():
    """Non-Huffman-DCT SOFs (e.g. SOF3 lossless) still raise
    NotImplementedError — no silent garbage."""
    from setsketch_ray.sources.jpeg import decode_jpeg, encode_jpeg

    data = bytearray(encode_jpeg(np.zeros((16, 16, 3), np.uint8), 90))
    sof = data.find(b"\xFF\xC0")
    data[sof + 1] = 0xC3  # rewrite marker to SOF3 (lossless sequential)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_decode_stage_handles_real_jpeg_rows(img_table):
    """DecodeStage over rows whose bytes are REAL baseline JPEGs (fmt='jpg'):
    decode_ok everywhere and the recomputed phash matches the phash of the
    decoded (lossy) pixels — the multimodal plumbing is format-agnostic."""
    from setsketch_ray.sources.codec import decode_image
    from setsketch_ray.sources.jpeg import encode_jpeg
    from setsketch_ray.stages.image import phash64

    n = 12
    rows = img_table.slice(0, n)
    jpg_bytes, expect_hash = [], []
    for blob, fmt in zip(rows["bytes"].to_pylist(), rows["fmt"].to_pylist()):
        px = decode_image(blob, fmt)
        data = encode_jpeg(px, 95)
        jpg_bytes.append(data)
        expect_hash.append(
            int(np.uint64(phash64(decode_image(data, "jpg")))
                .astype(np.int64)))
    t = pa.table({
        "image_id": rows["image_id"],
        "bytes": pa.array(jpg_bytes, pa.binary()),
        "fmt": pa.array(["jpg"] * n, pa.string()),
        "phash": rows["phash"],
        "caption": rows["caption"],
        "w": rows["w"], "h": rows["h"],
    })
    out = DecodeStage()(t)
    assert out["decode_ok"].to_pylist() == [True] * n
    assert out["phash"].to_pylist() == expect_hash


def test_resize_stage_roundtrip(img_table):
    out = ResizeStage(out_h=8, out_w=8)(img_table.slice(0, 20))
    assert out["resize_ok"].to_pylist() == [True] * 20
    assert out["w"].to_pylist() == [8] * 20
    px = decode_image(out["bytes"][0].as_py(), out["fmt"][0].as_py())
    assert px.shape == (8, 8, 3)


def test_resize_area_exact_block_mean():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    small = resize_area(img, 2, 2)
    expected = img.reshape(2, 2, 2, 2, 3).transpose(0, 2, 1, 3, 4) \
        .reshape(2, 2, 4, 3).mean(axis=2).round()
    assert np.array_equal(small, expected.astype(np.uint8))


def test_image_feature_stage(img_table):
    out = ImageFeatureStage()(img_table.slice(0, 10))
    feats = out["image_features"].to_pylist()
    assert all(len(f) == ImageFeatureStage.DIM for f in feats)
    assert all(0.0 <= v <= 1.001 for f in feats for v in f)
    # deterministic
    again = ImageFeatureStage()(img_table.slice(0, 10))["image_features"].to_pylist()
    assert feats == again


def test_video_stub_contract(ray_session):
    import ray.data as rd

    t = pa.table({"bytes": pa.array([b"x" * 30, b"y" * 12], pa.binary()),
                  "fmt": pa.array(["mp4", "mp4"])})
    # real path raises a clear NotImplementedError
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage()(t)
    # fake path exercises the full Ray plumbing (actor pool, list<binary>)
    ds = rd.from_arrow(t).map_batches(
        VideoFrameSampleStage, fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow", concurrency=1)
    out = ds.take_all()
    assert len(out[0]["frames"]) == 3
    assert out[0]["frame_ts"] == [0.0, 1.0, 2.0]


def test_audio_stub_contract(ray_session):
    import ray.data as rd

    t = pa.table({"bytes": pa.array([bytes(range(256)) * 4], pa.binary())})
    with pytest.raises(NotImplementedError):
        AudioFeatureStage()(t)
    ds = rd.from_arrow(t).map_batches(
        AudioFeatureStage, fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow", concurrency=1)
    out = ds.take_all()
    assert len(out[0]["audio_features"]) == AudioFeatureStage.DIM


def _make_wav(freq_hz: float, seconds: float = 0.5, rate: int = 16000,
              width: int = 2, nch: int = 1) -> bytes:
    import io
    import wave

    import numpy as np

    n = int(seconds * rate)
    sig = np.sin(2 * np.pi * freq_hz * np.arange(n) / rate)
    if width == 2:
        frames = (sig * 30000).astype("<i2")
    else:
        frames = ((sig * 120) + 128).astype(np.uint8)
    if nch > 1:
        frames = np.repeat(frames, nch)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(frames.tobytes())
    return buf.getvalue()


def test_audio_wav_features_real_decode(ray_session):
    """PCM WAV is REALLY decoded (stdlib wave + numpy): duration/rms/zcr
    are physically meaningful and the spectral bands separate tones."""
    import ray.data as rd

    lo = _make_wav(200.0)
    hi = _make_wav(4000.0)
    stereo8 = _make_wav(1000.0, width=1, nch=2)
    t = pa.table({"bytes": pa.array([lo, hi, stereo8], pa.binary())})
    out = rd.from_arrow(t).map_batches(
        AudioFeatureStage, batch_format="pyarrow",
        concurrency=1).take_all()
    for row in out:
        f = row["audio_features"]
        assert len(f) == AudioFeatureStage.DIM
        assert abs(f[0] - 0.5) < 0.01          # duration
    assert abs(out[0]["audio_features"][1] - 0.65) < 0.1  # sine rms ~0.707
    # zero-crossing rate scales with frequency
    assert out[1]["audio_features"][2] > 4 * out[0]["audio_features"][2]
    # dominant spectral band differs between the 200 Hz and 4 kHz tones
    b_lo = np.argmax(out[0]["audio_features"][3:])
    b_hi = np.argmax(out[1]["audio_features"][3:])
    assert b_hi > b_lo
    # deterministic
    out2 = rd.from_arrow(t).map_batches(
        AudioFeatureStage, batch_format="pyarrow", concurrency=1).take_all()
    assert out2[0]["audio_features"] == out[0]["audio_features"]


def test_jpeg_grayscale_baseline_and_progressive():
    """Single-component encode (2-D input): baseline and progressive
    (non-interleaved ns=1 DC scans — the path color files never take)
    decode bit-identically; output is gray replicated to 3 channels."""
    from setsketch_ray.sources.codec import psnr
    from setsketch_ray.sources.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(9)
    for shape in [(64, 64), (41, 53)]:
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]]
        for img in (rng.integers(0, 256, shape).astype(np.uint8),
                    ((yy * 2 + xx * 3) % 256).astype(np.uint8)):
            for ri in (0, 5):
                base = decode_jpeg(encode_jpeg(img, 90, restart_interval=ri))
                prog = decode_jpeg(encode_jpeg(img, 90, restart_interval=ri,
                                               progressive=True))
                assert np.array_equal(base, prog)
                assert base.shape == shape + (3,)
                assert np.array_equal(base[..., 0], base[..., 1])
                assert psnr(base[..., 0], img) >= 33.0
    # (h, w, 1) routes to grayscale too
    one = rng.integers(0, 256, (24, 24, 1)).astype(np.uint8)
    assert decode_jpeg(encode_jpeg(one, 90)).shape == (24, 24, 3)


def test_jpeg_422_baseline_and_progressive():
    """4:2:2 (horizontal-only chroma subsampling, hs=2/vs=1 — the layout
    the decoder claimed but nothing exercised): round-trips at sane PSNR,
    restart markers bit-stable, progressive bit-identical to baseline."""
    from setsketch_ray.sources.codec import psnr
    from setsketch_ray.sources.jpeg import decode_jpeg, encode_jpeg

    x, y = np.meshgrid(np.arange(80), np.arange(72))
    img = np.stack([x * 2 % 256, (y + 40) % 256, (x + y) % 256],
                   -1).astype(np.uint8)
    ref = decode_jpeg(encode_jpeg(img, 90, "422"))
    assert ref.shape == img.shape
    assert psnr(ref, img) >= 40.0
    for ri in (0, 3):
        base = decode_jpeg(encode_jpeg(img, 90, "422", restart_interval=ri))
        prog = decode_jpeg(encode_jpeg(img, 90, "422", restart_interval=ri,
                                       progressive=True))
        assert np.array_equal(base, ref)
        assert np.array_equal(base, prog)


def test_jpeg_property_random_roundtrips():
    """Property sweep (hypothesis): random small images x quality x
    subsampling x restart interval — decode(encode) keeps shape/dtype and
    progressive stays bit-identical to baseline."""
    from hypothesis import given, settings, strategies as st

    from setsketch_ray.sources.jpeg import decode_jpeg, encode_jpeg

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(9, 40), w=st.integers(9, 40),
        seed=st.integers(0, 2**31 - 1),
        quality=st.sampled_from([50, 75, 90, 100]),
        sub=st.sampled_from(["444", "422", "420"]),
        ri=st.sampled_from([0, 2, 7]),
        gray=st.booleans(),
    )
    def check(h, w, seed, quality, sub, ri, gray):
        rng = np.random.default_rng(seed)
        shape = (h, w) if gray else (h, w, 3)
        img = rng.integers(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality, sub,
                                       restart_interval=ri))
        prog = decode_jpeg(encode_jpeg(img, quality, sub,
                                       restart_interval=ri,
                                       progressive=True))
        assert base.shape == (h, w, 3)
        assert base.dtype == np.uint8
        assert np.array_equal(base, prog)

    check()


def test_png_all_filters_and_color_types():
    """Decoder handles every PNG filter (None/Sub/Up/Average/Paeth) and
    color types 0/2/4/6 — hand-filtered streams must reconstruct exactly."""
    import struct
    import zlib

    import numpy as np

    from setsketch_ray.sources.codec import _PNG_SIG, decode_png

    def build_png(pixels, color_type, filter_of_row):
        h, w = pixels.shape[:2]
        nch = pixels.shape[2] if pixels.ndim == 3 else 1
        flat = pixels.reshape(h, w * nch).astype(np.int32)
        bpp = nch
        lines = []
        prev = np.zeros(w * nch, dtype=np.int32)
        for y in range(h):
            row = flat[y]
            f = filter_of_row(y)
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            if f == 0:
                enc = row
            elif f == 1:
                enc = row - left
            elif f == 2:
                enc = row - prev
            elif f == 3:
                enc = row - ((left + prev) >> 1)
            else:  # Paeth
                p = left + prev - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), \
                    np.abs(p - ul)
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, prev, ul))
                enc = row - pred
            lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8)
                         .tobytes())
            prev = row

        def chunk(tag, payload):
            body = tag + payload
            return (struct.pack(">I", len(payload)) + body
                    + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (_PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"".join(lines)))
                + chunk(b"IEND", b""))

    rng = np.random.default_rng(17)
    rgb = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    # every filter type cycles through the rows
    blob = build_png(rgb, 2, lambda y: y % 5)
    assert np.array_equal(decode_png(blob), rgb)
    # grayscale (type 0) broadcasts to RGB
    gray = rng.integers(0, 256, (7, 11, 1), dtype=np.uint8)
    got = decode_png(build_png(gray, 0, lambda y: 4))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))
    # RGBA (type 6) drops alpha
    rgba = rng.integers(0, 256, (6, 5, 4), dtype=np.uint8)
    got = decode_png(build_png(rgba, 6, lambda y: 3))
    assert np.array_equal(got, rgba[:, :, :3])
    # gray+alpha (type 4)
    ga = rng.integers(0, 256, (5, 8, 2), dtype=np.uint8)
    got = decode_png(build_png(ga, 4, lambda y: (y % 4) + 1))
    assert np.array_equal(got, np.repeat(ga[:, :, :1], 3, axis=2))


def _build_png_general(samples, color_type, depth, interlace,
                       filter_of_row, palette=None):
    """Hand-build a PNG at any legal (color_type, depth, interlace):
    samples is (h, w, nch) ints (palette indices for type 3).  Filtering
    is byte-wise per spec (bpp = max(1, nch*depth//8)); each scanline's
    filter comes from filter_of_row(pass_idx, y)."""
    import struct
    import zlib

    import numpy as np

    from setsketch_ray.sources.codec import _ADAM7, _PNG_SIG

    h, w, nch = samples.shape

    def row_bytes(sub):
        ph, pw = sub.shape[:2]
        if depth == 8:
            return sub.reshape(ph, pw * nch).astype(np.uint8)
        if depth == 16:
            flat = sub.reshape(ph, pw * nch).astype(np.uint16)
            out = np.empty((ph, pw * nch * 2), np.uint8)
            out[:, 0::2] = flat >> 8
            out[:, 1::2] = flat & 0xFF
            return out
        # 1/2/4-bit single channel, MSB-first, rows padded to a byte
        flat = sub.reshape(ph, pw).astype(np.uint8)
        per_byte = 8 // depth
        padded_w = -(-pw // per_byte) * per_byte
        padded = np.zeros((ph, padded_w), np.uint8)
        padded[:, :pw] = flat
        bits = ((padded[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1)
        return np.packbits(bits.reshape(ph, -1), axis=1)

    def filter_pass(sub, pidx):
        ph = sub.shape[0]
        rb = row_bytes(sub).astype(np.int32)
        stride = rb.shape[1]
        bpp = max(1, nch * depth // 8)
        prev = np.zeros(stride, np.int32)
        lines = []
        for y in range(ph):
            row = rb[y]
            f = filter_of_row(pidx, y)
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]]) \
                if stride > bpp else np.zeros(stride, np.int32)
            ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]]) \
                if stride > bpp else np.zeros(stride, np.int32)
            if f == 0:
                enc = row
            elif f == 1:
                enc = row - left
            elif f == 2:
                enc = row - prev
            elif f == 3:
                enc = row - ((left + prev) >> 1)
            else:
                p = left + prev - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), \
                    np.abs(p - ul)
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, prev, ul))
                enc = row - pred
            lines.append(bytes([f])
                         + (enc & 0xFF).astype(np.uint8).tobytes())
            prev = row
        return b"".join(lines)

    if interlace:
        payload = b""
        for pidx, (x0, y0, dx, dy) in enumerate(_ADAM7):
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                payload += filter_pass(sub, pidx)
    else:
        payload = filter_pass(samples, 0)

    def chunk(tag, body):
        full = tag + body
        return (struct.pack(">I", len(body)) + full
                + struct.pack(">I", zlib.crc32(full) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       1 if interlace else 0)
    blob = _PNG_SIG + chunk(b"IHDR", ihdr)
    if palette is not None:
        blob += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return blob + chunk(b"IDAT", zlib.compress(payload)) \
        + chunk(b"IEND", b"")


def test_png_palette_and_low_depths():
    """Palette (type 3) at depths 8/4/2/1 and grayscale at 4/2/1 —
    exact reconstruction incl. the sub-8-bit rescale (17/85/255)."""
    import numpy as np

    from setsketch_ray.sources.codec import decode_png

    rng = np.random.default_rng(23)
    for depth in (8, 4, 2, 1):
        ncol = min(256, 1 << depth)
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, (11, 7, 1), dtype=np.uint8)
        blob = _build_png_general(idx, 3, depth, False,
                                  lambda p, y: y % 5, palette=pal)
        assert np.array_equal(decode_png(blob), pal[idx[:, :, 0]])
    for depth, scale in ((4, 17), (2, 85), (1, 255)):
        g = rng.integers(0, 1 << depth, (9, 13, 1), dtype=np.uint8)
        blob = _build_png_general(g, 0, depth, False, lambda p, y: y % 3)
        want = np.repeat(g * np.uint8(scale), 3, axis=2)
        assert np.array_equal(decode_png(blob), want)


def test_png_16bit():
    """16-bit RGB / grayscale / RGBA decode to the high byte; the filter
    unit is 2 bytes per channel (bpp=6 for RGB16)."""
    import numpy as np

    from setsketch_ray.sources.codec import decode_png

    rng = np.random.default_rng(29)
    rgb16 = rng.integers(0, 1 << 16, (10, 6, 3), dtype=np.uint16)
    blob = _build_png_general(rgb16, 2, 16, False, lambda p, y: y % 5)
    assert np.array_equal(decode_png(blob), (rgb16 >> 8).astype(np.uint8))
    g16 = rng.integers(0, 1 << 16, (7, 9, 1), dtype=np.uint16)
    blob = _build_png_general(g16, 0, 16, False, lambda p, y: 4)
    want = np.repeat((g16 >> 8).astype(np.uint8), 3, axis=2)
    assert np.array_equal(decode_png(blob), want)
    rgba16 = rng.integers(0, 1 << 16, (5, 8, 4), dtype=np.uint16)
    blob = _build_png_general(rgba16, 6, 16, False, lambda p, y: 3)
    want = (rgba16[:, :, :3] >> 8).astype(np.uint8)
    assert np.array_equal(decode_png(blob), want)


def test_png_adam7_interlaced():
    """Adam7: per-pass filtered sub-images scatter back exactly — RGB8
    with every filter type, palette-4bit, 16-bit gray, and images smaller
    than one 8x8 tile (empty passes)."""
    import numpy as np

    from setsketch_ray.sources.codec import decode_png

    rng = np.random.default_rng(31)
    rgb = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    blob = _build_png_general(rgb, 2, 8, True, lambda p, y: (p + y) % 5)
    assert np.array_equal(decode_png(blob), rgb)
    # palette 4-bit interlaced (odd pass widths exercise bit padding)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (17, 11, 1), dtype=np.uint8)
    blob = _build_png_general(idx, 3, 4, True, lambda p, y: y % 3,
                              palette=pal)
    assert np.array_equal(decode_png(blob), pal[idx[:, :, 0]])
    # 16-bit grayscale interlaced
    g16 = rng.integers(0, 1 << 16, (12, 19, 1), dtype=np.uint16)
    blob = _build_png_general(g16, 0, 16, True, lambda p, y: (p * y) % 5)
    want = np.repeat((g16 >> 8).astype(np.uint8), 3, axis=2)
    assert np.array_equal(decode_png(blob), want)
    # tiny images: passes with zero rows/cols must be skipped, not read
    for shape in ((1, 1), (3, 2), (5, 5), (8, 1), (2, 9)):
        tiny = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        blob = _build_png_general(tiny, 2, 8, True, lambda p, y: 4)
        assert np.array_equal(decode_png(blob), tiny)


def test_png_illegal_depth_rejected():
    import struct
    import zlib

    import pytest

    from setsketch_ray.sources.codec import _PNG_SIG, decode_png

    def chunk(tag, body):
        full = tag + body
        return (struct.pack(">I", len(body)) + full
                + struct.pack(">I", zlib.crc32(full) & 0xFFFFFFFF))

    # depth 4 RGB is illegal per spec
    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)
    blob = (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 40))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="illegal PNG depth"):
        decode_png(blob)
    # palette PNG without PLTE
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = zlib.compress(bytes([0, 0, 0, 0, 0, 0]))
    blob = (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(blob)


def test_bmp_roundtrip_and_dispatch():
    import numpy as np

    from setsketch_ray.sources.codec import (decode_bmp, decode_image,
                                             encode_bmp, encode_image)

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)  # odd stride pad
    blob = encode_bmp(img)
    assert np.array_equal(decode_bmp(blob), img)
    assert np.array_equal(decode_image(encode_image(img, "bmp"), "bmp"), img)
    # magic sniff (wrong fmt tag)
    assert np.array_equal(decode_image(blob, "unknown"), img)
    # top-down 32-bit variant (hand-built)
    import struct
    bgra = np.dstack([img[:, :, ::-1],
                      np.full(img.shape[:2], 255, np.uint8)])
    body = bgra.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, 7, -13, 1, 32, 0, len(body),
                      0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    assert np.array_equal(decode_bmp(hdr + dib + body), img)


def test_image_stats_stage_integer_sufficient_stats():
    import numpy as np

    from setsketch_ray.sources.codec import decode_image
    from setsketch_ray.sources.images import generate_rows
    from setsketch_ray.stages.image import ImageStatsStage

    t = generate_rows(np.arange(24), seed=42, size=16)
    out = ImageStatsStage()(t)
    assert "bytes" not in out.column_names  # payload dropped in-stage
    for i in range(24):
        px = decode_image(t["bytes"][i].as_py(),
                          t["fmt"][i].as_py()).astype(np.int64)
        assert out["px_sum"][i].as_py() == int(px.sum())
        assert out["px_sumsq"][i].as_py() == int((px * px).sum())
        assert out["px_min"][i].as_py() == int(px.min())
        assert out["px_max"][i].as_py() == int(px.max())
        assert out["n_vals"][i].as_py() == px.size
    # undecodable rows are flagged with n_vals=0, not silently kept
    bad = t.set_column(t.column_names.index("bytes"), "bytes",
                       __import__("pyarrow").array([b"\x00\x01"] * 24))
    ob = ImageStatsStage()(bad)
    assert all(v.as_py() == 0 for v in ob["n_vals"])
    assert all(v.as_py() == -1 for v in ob["px_min"])


def test_resize_area_sum_preservation_bound():
    """The thumbnail certificate's bound: for h,w divisible by the output
    dims, |4*sum_out - sum_in| <= 2 * out_h * out_w per channel (each
    output pixel is round(mean of an exact 2x2 block))."""
    import numpy as np

    rng = np.random.default_rng(21)
    for _ in range(20):
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        th = resize_area(img, 16, 16)
        sin = img.astype(np.int64).sum(axis=(0, 1))
        sout = th.astype(np.int64).sum(axis=(0, 1))
        assert (np.abs(4 * sout - sin) <= 2 * 16 * 16).all()
