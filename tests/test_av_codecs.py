"""Real video (MJPEG/AVI) and compressed-audio (G.711, IMA ADPCM) codecs.

These replace the round-2 declared stubs: frames/samples decode for real
through the engine's own T.81 JPEG codec and RIFF parsers.  Per-row
invariant (BASELINE.json input_hint): decoded pixels PSNR >= 40 dB for
lossy codecs on smooth content.
"""

import numpy as np
import pyarrow as pa
import pytest

from setsketch_ray.sources.audio import (alaw_decode, alaw_encode,
                                         decode_wav, encode_wav_alaw,
                                         encode_wav_ima, encode_wav_pcm16,
                                         encode_wav_ulaw, ima_adpcm_decode,
                                         ima_adpcm_encode, ulaw_decode,
                                         ulaw_encode)
from setsketch_ray.sources.codec import decode_image, encode_image, psnr
from setsketch_ray.sources.video import (decode_avi_frames, encode_avi_mjpeg,
                                         parse_avi, sample_frames)
from setsketch_ray.stages.image import AudioFeatureStage, VideoFrameSampleStage


def _smooth_frames(n=9, h=48, w=64):
    """Gradient frames with a moving bright square (smooth content — the
    regime where the JPEG codec must hold >= 40 dB at q90)."""
    base = (np.linspace(0, 200, w)[None, :, None]
            + np.linspace(0, 55, h)[:, None, None]
            + np.array([0.0, 10.0, 20.0])[None, None, :])
    frames = []
    for i in range(n):
        f = base.copy()
        x = 4 + 5 * i
        f[10:26, x:x + 12] = 240.0
        frames.append(np.clip(np.round(f), 0, 255).astype(np.uint8))
    return frames


def _snr(ref, got):
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    n = min(len(ref), len(got))
    ref, got = ref[:n], got[:n]
    return 10 * np.log10((ref ** 2).mean() /
                         max(((ref - got) ** 2).mean(), 1e-300))


def _tone_pcm(rate=8000, seconds=1.0, freqs=(440.0,), amp=24000):
    t = np.arange(int(rate * seconds)) / rate
    sig = sum(np.sin(2 * np.pi * f * t + i) for i, f in enumerate(freqs))
    return np.round(amp * sig / len(freqs)).astype(np.int16)


# ----------------------------------------------------------------- video
def test_avi_mjpeg_roundtrip_psnr40():
    frames = _smooth_frames()
    blob = encode_avi_mjpeg(frames, fps=3.0, quality=90)
    info = parse_avi(blob)
    assert (info.width, info.height, info.fps, info.n_frames) == (64, 48, 3.0, 9)
    pix, ts = decode_avi_frames(blob, every_n_seconds=0.0)  # every frame
    assert len(pix) == 9 and ts == [i / 3.0 for i in range(9)]
    for p, f in zip(pix, frames):
        assert p.shape == f.shape
        assert psnr(p, f) >= 40.0


def test_avi_sample_frames_are_raw_jpeg_slices():
    frames = _smooth_frames(n=12)
    blob = encode_avi_mjpeg(frames, fps=4.0, quality=85)
    fb, ts = sample_frames(blob, every_n_seconds=1.0)
    assert ts == [0.0, 1.0, 2.0]  # frames 0, 4, 8
    for b in fb:
        assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"  # SOI..EOI
    # each sampled blob is a standalone JPEG the image stages can decode
    for b, i in zip(fb, (0, 4, 8)):
        assert psnr(decode_image(b, "jpg"), frames[i]) >= 38.0
    # max_frames caps the sample
    fb2, ts2 = sample_frames(blob, 1.0, max_frames=2)
    assert len(fb2) == 2 and ts2 == [0.0, 1.0]
    # sub-frame-interval periods degrade to every-frame, never duplicates
    fb3, _ = sample_frames(blob, 0.01)
    assert len(fb3) == 12


def test_video_stage_real_avi(ray_session):
    import ray.data as rd

    frames = _smooth_frames()
    clips = [encode_avi_mjpeg(frames[:6], fps=2.0, quality=90),
             encode_avi_mjpeg(frames[3:], fps=3.0, quality=90)]
    t = pa.table({"video_id": ["a", "b"],
                  "bytes": pa.array(clips, pa.binary()),
                  "fmt": ["avi", "avi"]})
    out = rd.from_arrow(t).map_batches(
        VideoFrameSampleStage, fn_constructor_kwargs={"every_n_seconds": 1.0},
        batch_format="pyarrow", concurrency=1).take_all()
    assert out[0]["frame_ts"] == [0.0, 1.0, 2.0]
    assert out[1]["frame_ts"] == [0.0, 1.0]
    # sampled frames flow through the image decode path as fmt="jpg"
    got = decode_image(out[0]["frames"][1], "jpg")
    assert psnr(got, frames[2]) >= 40.0
    # non-AVI formats still fail loudly
    t2 = pa.table({"bytes": pa.array([b"\x00\x00\x00 ftypmp42"], pa.binary()),
                   "fmt": ["mp4"]})
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage()(t2)


# ----------------------------------------------------------------- G.711
def test_g711_roundtrip_snr():
    pcm = _tone_pcm(freqs=(440.0, 1200.0))
    assert _snr(pcm, ulaw_decode(ulaw_encode(pcm))) >= 33.0
    assert _snr(pcm, alaw_decode(alaw_encode(pcm))) >= 33.0


def test_g711_code_involution():
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(alaw_encode(alaw_decode(codes)), codes)
    re = ulaw_encode(ulaw_decode(codes))
    bad = np.nonzero(re != codes)[0]
    # the one canonical exception: -0 (0x7F) re-encodes as +0 (0xFF),
    # exactly as the reference Sun g711.c tables collapse it
    assert list(bad) == [0x7F] and re[0x7F] == 0xFF
    assert ulaw_decode(np.array([0x7F, 0xFF], np.uint8)).tolist() == [0, 0]


def test_g711_monotone_decode():
    # decoded magnitudes are monotone within each sign half
    dec = ulaw_decode(np.arange(128, dtype=np.uint8))  # negative half
    assert np.all(np.diff(dec) > 0)
    dec_a = alaw_decode(np.array([0x55 ^ i for i in range(128)], np.uint8))
    assert np.all(dec_a < 0)


# ------------------------------------------------------------- IMA ADPCM
@pytest.mark.parametrize("nch", [1, 2])
def test_ima_adpcm_roundtrip(nch):
    pcm = _tone_pcm(freqs=(330.0,), amp=16000)
    if nch == 2:
        pcm = np.stack([pcm, np.roll(pcm, 7)], axis=1)
    blob = ima_adpcm_encode(pcm, block_align=512)
    dec = ima_adpcm_decode(blob, nch, 512)
    ref = pcm if nch > 1 else pcm[:, None]
    # ~17-25 dB is the expected fidelity band for 4-bit IMA ADPCM
    assert _snr(ref.ravel()[:dec.size], dec.ravel()[:ref.size]) >= 15.0


def test_ima_adpcm_blocks_self_seeding():
    """Each block header re-seeds the decoder: decoding any block suffix
    alone matches the same span of the full decode (resumable streams)."""
    pcm = _tone_pcm(freqs=(250.0,), seconds=2.0, amp=12000)
    blob = ima_adpcm_encode(pcm, block_align=256)
    full = ima_adpcm_decode(blob, 1, 256)
    spb = (256 - 4) // 4 * 8 + 1
    tail = ima_adpcm_decode(blob[3 * 256:], 1, 256)
    assert np.array_equal(full[3 * spb:], tail)


# ----------------------------------------------------------- WAV container
def test_decode_wav_pcm_depths_and_float():
    pcm = _tone_pcm(freqs=(500.0,))
    ref = pcm.astype(np.float64) / 32768.0
    mono, rate = decode_wav(encode_wav_pcm16(pcm, 8000))
    assert rate == 8000 and _snr(ref, mono) >= 90.0
    # hand-rolled float32 container
    import struct
    f32 = ref.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(f32)) + f32)
    mono_f, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert _snr(ref, mono_f) >= 90.0
    # 24-bit PCM container
    v24 = (ref * (1 << 23)).astype(np.int32)
    b24 = np.zeros((len(v24), 3), np.uint8)
    b24[:, 0] = v24 & 0xFF
    b24[:, 1] = (v24 >> 8) & 0xFF
    b24[:, 2] = (v24 >> 16) & 0xFF
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
    d = b24.tobytes()
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(d)) + d)
    mono24, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert _snr(ref, mono24) >= 90.0


def test_audio_stage_decodes_compressed_wavs(ray_session):
    """mu-law / A-law / IMA-ADPCM WAVs produce features that agree with the
    PCM16 features of the same signal (same duration, same dominant band)."""
    import ray.data as rd

    pcm = _tone_pcm(rate=16000, freqs=(3000.0,), amp=20000)
    blobs = [encode_wav_pcm16(pcm, 16000), encode_wav_ulaw(pcm, 16000),
             encode_wav_alaw(pcm, 16000), encode_wav_ima(pcm, 16000)]
    t = pa.table({"bytes": pa.array(blobs, pa.binary())})
    out = rd.from_arrow(t).map_batches(
        AudioFeatureStage, batch_format="pyarrow", concurrency=1).take_all()
    ref = out[0]["audio_features"]
    band_ref = int(np.argmax(ref[3:]))
    for row in out[1:]:
        f = row["audio_features"]
        assert len(f) == AudioFeatureStage.DIM
        assert abs(f[0] - ref[0]) < 0.1          # duration (ADPCM pads)
        assert abs(f[1] - ref[1]) < 0.05         # rms
        assert int(np.argmax(f[3:])) == band_ref  # dominant spectral band


# ------------------------------------------------------------------- GIF
def _paletted(shape, n_colors, seed=5):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal, pal[rng.integers(0, n_colors, shape)]


def test_gif_static_lossless_roundtrip():
    from setsketch_ray.sources.gif import decode_gif, encode_gif

    _, img = _paletted((37, 53), 40)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    # through the codec dispatch (fmt tag AND magic sniff)
    blob = encode_image(img, "gif")
    assert np.array_equal(decode_image(blob, "gif"), img)
    assert np.array_equal(decode_image(blob, "unknown"), img)  # GIF8 sniff
    # degenerate single-color palette
    one = np.full((8, 8, 3), 7, np.uint8)
    assert np.array_equal(decode_gif(encode_gif(one)), one)
    # >256 distinct colors: loud, never silently lossy
    rng = np.random.default_rng(0)
    with pytest.raises(NotImplementedError):
        encode_gif(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))


def test_gif_animation_roundtrip_and_delays():
    from setsketch_ray.sources.gif import decode_gif_frames, encode_gif

    pal, _ = _paletted((1, 1), 16)
    rng = np.random.default_rng(9)
    frames = [pal[rng.integers(0, 16, (24, 24))] for _ in range(5)]
    blob = encode_gif(frames, delays_s=[0.2, 0.1, 0.3, 0.2, 0.2])
    dec, delays = decode_gif_frames(blob)
    assert delays == [0.2, 0.1, 0.3, 0.2, 0.2]
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames))


def test_gif_interlaced_decode():
    """Hand-build an interlaced frame (encoder writes sequential only):
    rows permuted into pass order + interlace flag set must decode back to
    the original raster order."""
    import struct

    from setsketch_ray.sources.gif import _lzw_encode, decode_gif

    pal, img = _paletted((16, 8), 4, seed=11)
    _, inverse = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
    palette = np.unique(img.reshape(-1, 3), axis=0)
    idx = inverse.reshape(16, 8)
    order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for y in range(start, 16, step)]
    interlaced = idx[order]
    table = np.zeros((4, 3), np.uint8)
    table[:len(palette)] = palette
    blob = (b"GIF89a" + struct.pack("<HHBBB", 8, 16, 0x80 | 1, 0, 0)
            + table.tobytes()
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, 8, 16, 0x40)
            + bytes([2]) + _lzw_encode(interlaced, 2) + b"\x3b")
    assert np.array_equal(decode_gif(blob), img)


def test_gif_transparency_composes_over_previous_frame():
    import struct

    from setsketch_ray.sources.gif import _lzw_encode, decode_gif_frames

    # palette: 0=red 1=green 2=blue(transparent marker)
    table = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [0, 0, 0]],
                     np.uint8)
    f0 = np.zeros((4, 4), np.uint8)          # all red
    f1 = np.full((4, 4), 2, np.uint8)        # transparent everywhere...
    f1[1, 1] = 1                             # ...except one green pixel
    gce = b"\x21\xf9\x04" + struct.pack("<BHB", (1 << 2) | 1, 10, 2) + b"\x00"
    img = lambda idx: (b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
                       + bytes([2]) + _lzw_encode(idx, 2))
    blob = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)
            + table.tobytes() + img(f0) + gce + img(f1) + b"\x3b")
    frames, delays = decode_gif_frames(blob)
    assert len(frames) == 2 and delays == [0.0, 0.1]
    assert np.array_equal(frames[0], np.tile([255, 0, 0], (4, 4, 1)))
    expect = np.tile([255, 0, 0], (4, 4, 1)).astype(np.uint8)
    expect[1, 1] = [0, 255, 0]               # only the green pixel lands
    assert np.array_equal(frames[1], expect)


def test_video_stage_animated_gif(ray_session):
    import ray.data as rd

    from setsketch_ray.sources.gif import encode_gif

    pal, _ = _paletted((1, 1), 12, seed=3)
    rng = np.random.default_rng(4)
    frames = [pal[rng.integers(0, 12, (16, 16))] for _ in range(6)]
    blob = encode_gif(frames, delays_s=[0.5] * 6)  # 3 s clip
    t = pa.table({"bytes": pa.array([blob], pa.binary()),
                  "fmt": ["gif"]})
    out = rd.from_arrow(t).map_batches(
        VideoFrameSampleStage, fn_constructor_kwargs={"every_n_seconds": 1.0},
        batch_format="pyarrow", concurrency=1).take_all()
    assert out[0]["frame_ts"] == [0.0, 1.0, 2.0]  # frames 0, 2, 4
    for b, i in zip(out[0]["frames"], (0, 2, 4)):
        got = decode_image(b, "png")              # PNG re-encode, lossless
        assert np.array_equal(got, frames[i])


# ------------------------------------------------------- property sweeps
def test_gif_property_roundtrip():
    """Hypothesis sweep: random palette sizes x dims x frame counts —
    encode/decode is lossless for every <=256-color input."""
    from hypothesis import given, settings, strategies as st

    from setsketch_ray.sources.gif import decode_gif_frames, encode_gif

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40), w=st.integers(1, 40),
        n_colors=st.sampled_from([1, 2, 3, 4, 17, 128, 256]),
        n_frames=st.integers(1, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, n_colors, n_frames, seed):
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        frames = [pal[rng.integers(0, n_colors, (h, w))]
                  for _ in range(n_frames)]
        dec, delays = decode_gif_frames(
            encode_gif(frames, delays_s=[0.1] * n_frames))
        assert len(dec) == n_frames
        for a, b in zip(dec, frames):
            assert np.array_equal(a, b)

    check()


def test_audio_property_roundtrip():
    """Hypothesis sweep: random signals x amplitudes x codecs — every WAV
    container decodes, G.711 involution holds on re-encode, ADPCM SNR stays
    in its fidelity band for tonal content."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        amp=st.sampled_from([500, 8000, 24000, 32000]),
        rate=st.sampled_from([8000, 16000]),
        codec=st.sampled_from(["pcm16", "ulaw", "alaw", "ima"]),
        nch=st.sampled_from([1, 2]),
    )
    def check(seed, amp, rate, codec, nch):
        rng = np.random.default_rng(seed)
        f = float(rng.uniform(100, rate / 4))
        t = np.arange(rate // 2) / rate
        pcm = np.round(amp * np.sin(2 * np.pi * f * t)).astype(np.int16)
        if codec == "pcm16":
            blob = encode_wav_pcm16(
                pcm if nch == 1 else np.stack([pcm, pcm], axis=1), rate)
        elif codec == "ulaw":
            blob = encode_wav_ulaw(pcm, rate)
        elif codec == "alaw":
            blob = encode_wav_alaw(pcm, rate)
        else:
            blob = encode_wav_ima(
                pcm if nch == 1 else np.stack([pcm, pcm], axis=1), rate, 256)
        mono, r = decode_wav(blob)
        assert r == rate and len(mono) >= len(pcm)
        ref = pcm.astype(np.float64) / 32768.0
        floor = {"pcm16": 90.0, "ulaw": 25.0, "alaw": 25.0, "ima": 10.0}
        if amp >= 8000:  # companding/ADPCM SNR floors assume real levels
            assert _snr(ref, mono[:len(ref)]) >= floor[codec]

    check()


# ----------------------------------------------------------- media probe
def test_mp4_metadata_parse():
    from setsketch_ray.sources.mp4 import build_mp4_stub, parse_mp4

    blob = build_mp4_stub(1920, 1080, 42.5, codec=b"hev1", with_audio=True)
    info = parse_mp4(blob)
    assert info["brand"] == "isom"
    assert info["duration_s"] == pytest.approx(42.5)
    v = [t for t in info["tracks"] if t["kind"] == "video"][0]
    a = [t for t in info["tracks"] if t["kind"] == "audio"][0]
    assert (v["codec"], v["w"], v["h"]) == ("hev1", 1920, 1080)
    assert a["codec"] == "mp4a"
    assert v["duration_s"] == pytest.approx(42.5)
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 32)


def test_probe_media_all_containers():
    from setsketch_ray.sources.gif import encode_gif
    from setsketch_ray.sources.mp4 import build_mp4_stub
    from setsketch_ray.sources.video import probe_media

    frames = _smooth_frames(n=6, h=16, w=16)
    p = probe_media(encode_avi_mjpeg(frames, fps=3.0))
    assert (p["container"], p["codec"], p["n_frames"],
            p["duration_s"], p["decodable"]) == ("avi", "mjpeg", 6, 2.0,
                                                 True)
    post = [(f >> 5) << 5 for f in frames]
    g = probe_media(encode_gif(post, delays_s=[0.5] * 6))
    assert (g["container"], g["kind"], g["n_frames"], g["duration_s"]) == \
        ("gif", "video", 6, 3.0)
    m = probe_media(build_mp4_stub(640, 480, 10.0))
    assert (m["container"], m["codec"], m["w"], m["h"],
            m["decodable"]) == ("mp4", "avc1", 640, 480, False)
    w = probe_media(encode_wav_ulaw(_tone_pcm(seconds=0.5), 8000))
    assert (w["container"], w["codec"], w["decodable"]) == \
        ("wav", "ulaw", True)
    assert w["duration_s"] == pytest.approx(0.5)
    with pytest.raises(ValueError):
        probe_media(b"\x00\x00\x00 ftXpmp42")


def test_media_probe_stage(ray_session):
    import ray.data as rd

    from setsketch_ray.sources.mp4 import build_mp4_stub
    from setsketch_ray.stages.image import MediaProbeStage

    frames = _smooth_frames(n=4, h=16, w=16)
    t = pa.table({"media_id": ["a", "b", "c"],
                  "bytes": pa.array([encode_avi_mjpeg(frames, 2.0),
                                     build_mp4_stub(320, 240, 5.0),
                                     b"not media at all"], pa.binary())})
    out = rd.from_arrow(t).map_batches(
        MediaProbeStage, batch_format="pyarrow", concurrency=1) \
        .sort("media_id").take_all()
    assert [r["container"] for r in out] == ["avi", "mp4", "unknown"]
    assert [r["decodable"] for r in out] == [True, False, False]
    assert out[0]["duration_ms"] == 2000 and out[1]["duration_ms"] == 5000


def test_ogg_info_vorbis_opus_theora():
    from setsketch_ray.sources.containers import build_ogg_stub, ogg_info

    v = ogg_info(build_ogg_stub("vorbis", 12.5, rate=44100, channels=2))
    assert (v["kind"], v["codec"]) == ("audio", "vorbis")
    assert v["streams"][0]["rate"] == 44100
    assert v["streams"][0]["channels"] == 2
    assert v["duration_s"] == pytest.approx(12.5, abs=1e-4)

    o = ogg_info(build_ogg_stub("opus", 3.25, rate=48000, channels=1))
    assert o["codec"] == "opus"
    assert o["duration_s"] == pytest.approx(3.25, abs=1e-4)

    t = ogg_info(build_ogg_stub("theora", 8.0, w=640, h=360, fps=25.0))
    assert (t["kind"], t["codec"], t["w"], t["h"]) == \
        ("video", "theora", 640, 360)
    assert t["duration_s"] == pytest.approx(8.0, abs=0.05)
    assert t["streams"][0]["fps"] == pytest.approx(25.0)

    # multiplexed A+V: video stream is primary, duration is the max
    blob = build_ogg_stub("theora", 6.0, w=320, h=240, fps=24.0,
                          serial=7) \
        + build_ogg_stub("vorbis", 6.5, rate=48000, serial=9)
    m = ogg_info(blob)
    assert (m["kind"], m["codec"]) == ("video", "theora")
    assert m["duration_s"] == pytest.approx(6.5, abs=0.05)
    assert len(m["streams"]) == 2

    with pytest.raises(ValueError):
        ogg_info(b"not an ogg")


def test_ogg_page_crc_is_spec_exact():
    """CRC over a known page must match an independent bit-by-bit
    computation of the RFC 3533 polynomial (0x04C11DB7, init/xorout 0)."""
    from setsketch_ray.sources.containers import _ogg_crc

    def crc_ref(data):
        r = 0
        for byte in data:
            r ^= byte << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 \
                    else (r << 1)
                r &= 0xFFFFFFFF
        return r

    for blob in (b"", b"OggS\x00\x02" + bytes(range(40)),
                 bytes(255) + b"\xff" * 33):
        assert _ogg_crc(blob) == crc_ref(blob)


def test_mp3_info_walk():
    from setsketch_ray.sources.containers import build_mp3_stub, mp3_info

    i = mp3_info(build_mp3_stub(30.0, kbps=128, rate=44100, channels=2))
    assert (i["codec"], i["rate"], i["channels"],
            i["bitrate_kbps"]) == ("mp3", 44100, 2, 128)
    assert i["duration_s"] == pytest.approx(30.0, abs=0.05)
    assert i["n_frames"] == round(30.0 * 44100 / 1152)

    # ID3v2-tagged + mono + different bitrate/rate
    i = mp3_info(build_mp3_stub(5.0, kbps=320, rate=48000, channels=1,
                                with_id3=True))
    assert (i["rate"], i["channels"], i["bitrate_kbps"]) == (48000, 1, 320)
    assert i["duration_s"] == pytest.approx(5.0, abs=0.05)

    # garbage between tag and first frame: the walk resyncs
    blob = build_mp3_stub(2.0)
    assert mp3_info(b"\x00\x12\x34" + blob)["n_frames"] == \
        mp3_info(blob)["n_frames"]

    with pytest.raises(ValueError):
        mp3_info(b"ID3\x04\x00\x00\x00\x00\x00\x00no frames here")


def test_mkv_info_tree():
    from setsketch_ray.sources.containers import build_mkv_stub, mkv_info

    m = mkv_info(build_mkv_stub(1280, 720, 95.5, codec="V_VP9",
                                webm=True, with_audio=True))
    assert (m["container"], m["doctype"]) == ("webm", "webm")
    assert m["duration_s"] == pytest.approx(95.5)
    v = [t for t in m["tracks"] if t["kind"] == "video"][0]
    a = [t for t in m["tracks"] if t["kind"] == "audio"][0]
    assert (v["codec"], v["w"], v["h"]) == ("V_VP9", 1280, 720)
    assert (a["codec"], a["channels"]) == ("A_OPUS", 2)
    assert a["rate"] == pytest.approx(48000.0)

    m = mkv_info(build_mkv_stub(720, 576, 1.0, codec="V_MPEG4/ISO/AVC",
                                webm=False))
    assert (m["container"], m["tracks"][0]["codec"]) == \
        ("mkv", "V_MPEG4/ISO/AVC")

    with pytest.raises(ValueError):
        mkv_info(b"\x00" * 16)


def test_probe_media_new_containers():
    from setsketch_ray.sources.containers import (
        build_mkv_stub,
        build_mp3_stub,
        build_ogg_stub,
    )
    from setsketch_ray.sources.video import probe_media

    o = probe_media(build_ogg_stub("opus", 7.0))
    assert (o["container"], o["kind"], o["codec"],
            o["decodable"]) == ("ogg", "audio", "opus", False)
    assert o["duration_s"] == pytest.approx(7.0, abs=1e-4)

    k = probe_media(build_mkv_stub(1920, 1080, 33.0, codec="V_AV1"))
    assert (k["container"], k["codec"], k["w"], k["h"],
            k["decodable"]) == ("webm", "V_AV1", 1920, 1080, False)
    assert k["duration_s"] == pytest.approx(33.0)

    a = probe_media(build_mp3_stub(4.0, with_id3=True))
    assert (a["container"], a["codec"], a["decodable"]) == \
        ("mp3", "mp3", False)
    assert a["duration_s"] == pytest.approx(4.0, abs=0.05)

    # a JPEG's 0xFF 0xD8 prefix must NOT probe as mp3 (sync test is
    # 0xFF 0xEx/0xFx) — it stays unrecognized
    with pytest.raises(ValueError):
        probe_media(b"\xff\xd8\xff\xe0" + b"\x00" * 32)


def test_ogg_flac_roundtrip_bit_exact():
    """FLAC-in-Ogg: our FLAC encoder wrapped in spec Ogg pages decodes
    back bit-exactly through packet reassembly (incl. a payload large
    enough to span multiple pages / 255-lacing continuation)."""
    import numpy as np

    from setsketch_ray.sources.containers import (
        decode_ogg_flac,
        encode_ogg_flac,
        ogg_info,
    )

    rng = np.random.default_rng(41)
    # > 65 KB of frames so the frame packet spans several pages
    n = 48000 * 3
    t = np.arange(n)
    sig = (3000 * np.sin(2 * np.pi * 440 * t / 48000)
           + rng.integers(-200, 200, n)).astype(np.int16)
    stereo = np.stack([sig, (sig >> 1).astype(np.int16)], axis=1)
    blob = encode_ogg_flac(stereo, 48000)
    pcm, rate, bps = decode_ogg_flac(blob)
    assert (rate, bps) == (48000, 16)
    assert np.array_equal(pcm, stereo.astype(np.int32))
    # and the metadata probe agrees
    oi = ogg_info(blob)
    assert oi["codec"] == "flac"
    assert oi["streams"][0]["rate"] == 48000
    assert oi["streams"][0]["channels"] == 2
    assert oi["duration_s"] == pytest.approx(3.0, abs=1e-6)


def test_ogg_flac_probe_and_stage():
    import numpy as np

    from setsketch_ray.sources.containers import (
        build_ogg_stub,
        encode_ogg_flac,
    )
    from setsketch_ray.sources.video import probe_media
    from setsketch_ray.stages.image import AudioFeatureStage

    sig = (2000 * np.sin(np.linspace(0, 300, 8000))).astype(np.int16)
    blob = encode_ogg_flac(sig, 16000)
    p = probe_media(blob)
    assert (p["container"], p["codec"], p["decodable"]) == \
        ("ogg", "flac", True)
    st = AudioFeatureStage()
    feats = st._features(blob, "ogg")
    assert feats[0] == pytest.approx(0.5, abs=1e-6)  # duration
    assert feats[1] > 0  # rms
    # a vorbis stream still refuses loudly
    with pytest.raises(NotImplementedError):
        st._features(build_ogg_stub("vorbis", 2.0), "ogg")


def test_heif_avif_probe():
    from setsketch_ray.sources.mp4 import build_heif_stub, heif_info
    from setsketch_ray.sources.video import probe_media

    blob = build_heif_stub(1024, 768, b"avif")
    hi = heif_info(blob)
    assert (hi["brand"], hi["w"], hi["h"]) == ("avif", 1024, 768)
    p = probe_media(blob)
    assert (p["container"], p["kind"], p["codec"], p["w"], p["h"],
            p["decodable"]) == ("heif", "image", "avif", 1024, 768, False)
    p = probe_media(build_heif_stub(320, 200, b"heic"))
    assert (p["codec"], p["w"]) == ("heic", 320)
    # plain mp4 ftyp brands still take the movie path
    from setsketch_ray.sources.mp4 import build_mp4_stub

    m = probe_media(build_mp4_stub(640, 480, 5.0))
    assert m["container"] == "mp4"


def test_ogg_flac_nheaders_zero_decodes():
    """The Ogg-FLAC mapping allows nheaders == 0 ('unknown'); the decoder
    must then skip leading metadata packets by scanning for the FLAC frame
    sync instead of trusting the count (ADVICE r3)."""
    import numpy as np

    from setsketch_ray.sources.containers import (
        decode_ogg_flac,
        encode_ogg_flac,
    )

    sig = (1000 * np.sin(2 * np.pi * 440 * np.arange(4800) / 48000)) \
        .astype(np.int16).reshape(-1, 1)
    blob = bytearray(encode_ogg_flac(sig, 48000))
    # first page: 27-byte header + 1 lacing byte, mapping packet follows;
    # nheaders is big-endian at packet offset 7 (encoder writes 1)
    assert blob[28 + 7:28 + 9] == b"\x00\x01"
    blob[28 + 7:28 + 9] = b"\x00\x00"
    pcm, rate, bps = decode_ogg_flac(bytes(blob))
    assert (rate, bps) == (48000, 16)
    assert np.array_equal(pcm, sig.astype(np.int32))


def test_mp3_info_rejects_sync_shaped_garbage():
    """A lone sync-shaped header with no valid consecutive frame must not
    count as audio (two-frame sync heuristic, ADVICE r3) — and real frames
    after garbage still count exactly."""
    from setsketch_ray.sources.containers import build_mp3_stub, mp3_info

    with pytest.raises(ValueError):
        mp3_info(b"\xff\xfb\x10\x00" + b"\x00" * 200)

    blob = build_mp3_stub(2.0)
    noisy = b"\xff\xfb\x10\x00" + b"\x00" * 50 + blob
    assert mp3_info(noisy)["n_frames"] == mp3_info(blob)["n_frames"]
