"""Near-dup video pipeline: planted clusters (lossy AVI re-encode,
GIF container swap, first-frame trim) must be found exactly."""

import numpy as np
import pytest

from setsketch_ray.pipelines.videodedup import (_overlap_fraction,
                                                near_dup_videos)
from setsketch_ray.sources.av import truth_video_pairs, videos_dataset


def test_overlap_fraction_semantics():
    a = np.array([8, 16, 1 << 40], np.uint64)
    assert _overlap_fraction(a, a, 0) == 1.0
    # subset containment is symmetric-min: 2 of 3 vs 2 of 2 -> 2/3
    assert _overlap_fraction(a, a[:2], 0) == pytest.approx(2 / 3)
    assert _overlap_fraction(a, np.array([], np.uint64), 8) == 0.0
    # hamming tolerance (xor-by-3 keeps the two sets disjoint here)
    b = a ^ np.uint64(0b11)
    assert _overlap_fraction(a, b, 2) == 1.0
    assert _overlap_fraction(a, b, 1) == 0.0


def test_near_dup_videos_planted_clusters(ray_session):
    n = 160
    pairs = near_dup_videos(videos_dataset(n, parallelism=4),
                            every_n_seconds=0.25)
    got = pairs.to_pandas()
    truth = truth_video_pairs(n).to_pandas()
    gs = set(zip(got.id_a, got.id_b))
    ts = set(zip(truth.id_a, truth.id_b))
    assert gs == ts  # recall 1.0 AND precision 1.0
    assert (got.overlap_milli >= 500).all()
    # deterministic across runs (counter-mode hashing end to end)
    again = near_dup_videos(videos_dataset(n, parallelism=4),
                            every_n_seconds=0.25).to_pandas()
    assert set(zip(again.id_a, again.id_b)) == gs


def test_hash_join_strategy_matches_broadcast(ray_session):
    n = 96
    a = near_dup_videos(videos_dataset(n, parallelism=4),
                        every_n_seconds=0.25).to_pandas()
    b = near_dup_videos(videos_dataset(n, parallelism=4),
                        every_n_seconds=0.25,
                        join_strategy="hash").to_pandas()
    key = ["id_a", "id_b", "overlap_milli"]
    assert sorted(map(tuple, a[key].values.tolist())) == \
        sorted(map(tuple, b[key].values.tolist()))
    assert len(a) > 0
