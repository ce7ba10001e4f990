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
