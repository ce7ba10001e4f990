"""Incremental dedup: a base checkpointed run extended with a delta corpus
must produce the SAME cluster partition as a from-scratch run on the union
— including duplicate pairs that cross the base|delta boundary — while
re-sketching only the delta."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from setsketch_ray.pipelines.checkpointed import run_checkpointed
from setsketch_ray.pipelines.dedup import DedupConfig
from setsketch_ray.pipelines.incremental import incremental_near_dup
from setsketch_ray.sources import cached_images_parquet, truth_pairs

N = 800


def _partition_of(mapping: dict) -> set:
    comp = {}
    for k, v in mapping.items():
        comp.setdefault(v, set()).add(k)
    return {frozenset(s) for s in comp.values()}


@pytest.fixture(scope="module")
def inc_env(ray_session, tmp_path_factory):
    src = cached_images_parquet(N)
    full = pq.read_table(src)
    truth = truth_pairs(N)
    # choose the split so a true dup pair crosses the base|delta boundary:
    # pairs have id_a < id_b, so split = id_b of a middle pair guarantees
    # id_a lands in the base and id_b in the delta
    bs = sorted(int(x[3:]) for x in truth["id_b"].to_pylist())
    split = bs[len(bs) // 2]
    import numpy as np

    nums = np.array([int(x[3:]) for x in full["image_id"].to_pylist()])
    root = tmp_path_factory.mktemp("inc")
    a_path = str(root / "base.parquet")
    b_path = str(root / "delta.parquet")
    pq.write_table(full.filter(pa.array(nums < split)), a_path)
    pq.write_table(full.filter(pa.array(nums >= split)), b_path)
    return src, a_path, b_path, split, str(root)


def test_incremental_matches_from_scratch(inc_env):
    src, a_path, b_path, split, root = inc_env
    cfg = DedupConfig(sketch_concurrency=None, num_partitions=16)

    run_checkpointed(a_path, f"{root}/base_run", cfg, num_partitions=8)
    edges_inc, map_inc = incremental_near_dup(f"{root}/base_run", b_path,
                                              cfg)
    _, _, map_full = run_checkpointed(src, f"{root}/full_run", cfg,
                                      num_partitions=8)
    assert _partition_of(map_inc) == _partition_of(map_full)

    # a cross-boundary dup pair exists AND landed in one cluster
    truth = truth_pairs(N)
    crossing = [(a, b) for a, b in zip(truth["id_a"].to_pylist(),
                                       truth["id_b"].to_pylist())
                if int(a[3:]) < split <= int(b[3:])]
    assert crossing, "split must cut through at least one true dup pair"
    hits = sum(map_inc.get(a) is not None
               and map_inc.get(a) == map_inc.get(b) for a, b in crossing)
    assert hits / len(crossing) >= 0.99   # north-rule recall on the seam

    # delta edges touch the base side (not just delta x delta)
    ea = edges_inc["id_a"].to_pylist()
    eb = edges_inc["id_b"].to_pylist()
    assert any(int(a[3:]) < split <= int(b[3:]) for a, b in zip(ea, eb))


def test_chained_increments_compose(inc_env, tmp_path_factory):
    """Two increments in sequence (base -> +B1 -> +B2), each persisting its
    delta's sketch table + edges via out_root, equal a from-scratch run."""
    import numpy as np
    import pyarrow.parquet as pq

    src, a_path, b_path, split, root = inc_env
    # split the delta again so round 2 exists and crosses boundaries
    full_b = pq.read_table(b_path)
    nums = np.array([int(x[3:]) for x in full_b["image_id"].to_pylist()])
    mid = int(np.median(nums))
    r2 = tmp_path_factory.mktemp("inc2")
    b1, b2 = str(r2 / "b1.parquet"), str(r2 / "b2.parquet")
    pq.write_table(full_b.filter(pa.array(nums < mid)), b1)
    pq.write_table(full_b.filter(pa.array(nums >= mid)), b2)

    cfg = DedupConfig(sketch_concurrency=None, num_partitions=16)
    base_root = f"{root}/base_run"          # built by the first test
    run_checkpointed(a_path, base_root, cfg, num_partitions=8)  # no-op if done
    inc1_root = str(r2 / "inc1")
    incremental_near_dup(base_root, b1, cfg, out_root=inc1_root)
    _, map_chain = incremental_near_dup([base_root, inc1_root], b2, cfg)
    _, _, map_full = run_checkpointed(src, f"{root}/full_run", cfg,
                                      num_partitions=8)  # cached from test 1
    assert _partition_of(map_chain) == _partition_of(map_full)
