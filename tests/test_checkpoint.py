"""Checkpoint/lineage layer tests: full run, mid-run resume (partition
deleted), lineage invalidation (config change), and determinism of the
resumed output (north_rule: resumable with per-partition lineage + metrics).
"""

import json
import os
import shutil

import pyarrow as pa
import pytest

from setsketch_ray.pipelines.checkpointed import run_checkpointed
from setsketch_ray.pipelines.dedup import DedupConfig, evaluate_recall
from setsketch_ray.sources import cached_images_parquet, truth_pairs

N = 800


@pytest.fixture(scope="module")
def ckpt_env(ray_session, tmp_path_factory):
    src = cached_images_parquet(N)
    root = str(tmp_path_factory.mktemp("ckpt"))
    return src, root


def _run(src, root, **kw):
    cfg = DedupConfig(sketch_concurrency=None, num_partitions=16, **kw)
    return run_checkpointed(src, root, cfg, num_partitions=8)


def test_full_run_writes_manifests_and_is_correct(ckpt_env):
    src, root = ckpt_env
    clusters, edges, mapping = _run(src, root)
    assert clusters.count() == N
    rec = evaluate_recall(mapping, truth_pairs(N))
    assert rec["recall"] >= 0.99
    for stage in ("sketched", "pairs", "edges", "clusters"):
        mpath = os.path.join(root, stage, "_MANIFEST.json")
        assert os.path.exists(mpath), stage
        m = json.load(open(mpath))
        assert m["partitions"], stage
        assert all("rows" in p for p in m["partitions"].values())


def test_resume_skips_complete_stages(ckpt_env):
    src, root = ckpt_env
    # all stages complete -> resume must not rewrite anything
    mtimes = {s: os.path.getmtime(os.path.join(root, s, "_MANIFEST.json"))
              for s in ("sketched", "pairs")}
    _run(src, root)
    for s, t0 in mtimes.items():
        assert os.path.getmtime(os.path.join(root, s, "_MANIFEST.json")) == t0


def test_resume_recomputes_only_missing_partition(ckpt_env):
    src, root = ckpt_env
    edges_before = _collect_edges(src, root)
    # simulate a crash that lost one sketch partition + its manifest entry
    victim = os.path.join(root, "sketched", "sk_part=3")
    shutil.rmtree(victim)
    os.remove(os.path.join(root, "sketched", "_MANIFEST.json"))
    # downstream stages are stale now; remove them so they rebuild
    for stage in ("pairs", "edges", "clusters"):
        shutil.rmtree(os.path.join(root, stage))
    untouched = os.path.join(root, "sketched", "sk_part=1")
    mtime_before = max(os.path.getmtime(os.path.join(untouched, f))
                       for f in os.listdir(untouched))
    clusters, edges, mapping = _run(src, root)
    # partition 1 files were not rewritten (only missing partition 3 was)
    mtime_after = max(os.path.getmtime(os.path.join(untouched, f))
                      for f in os.listdir(untouched))
    assert mtime_after == mtime_before
    assert os.path.isdir(victim)
    # resumed output identical to the uninterrupted run
    assert _edges_set(edges) == edges_before


def test_config_change_invalidates_stage(ckpt_env):
    src, root = ckpt_env
    _run(src, root, group_cap=63)  # different config hash
    m = json.load(open(os.path.join(root, "sketched", "_MANIFEST.json")))
    from setsketch_ray.state.checkpoint import fingerprint_config

    assert m["config_hash"] == fingerprint_config(
        DedupConfig(sketch_concurrency=None, num_partitions=16, group_cap=63))


def _collect_edges(src, root):
    _, edges, _ = _run(src, root)
    return _edges_set(edges)


def _edges_set(edges: pa.Table):
    return set(zip(edges["id_a"].to_pylist(), edges["id_b"].to_pylist()))
