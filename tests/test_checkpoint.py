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


def test_partial_write_crash_resume_neither_loses_nor_duplicates(ckpt_env):
    """A crash MID-write leaves a partition dir without its _DONE marker and
    with an incomplete/duplicated file set; resume must discard and recompute
    it (ADVICE r1: bare-directory presence used to count as complete)."""
    import ray.data as rd

    src, root = ckpt_env
    clean_edges = _collect_edges(src, root)  # rebuilds with default config
    sk_dir = os.path.join(root, "sketched")
    victim = os.path.join(sk_dir, "sk_part=5")
    # simulate the crash: marker missing + a stray duplicated data file
    os.remove(os.path.join(victim, "_DONE"))
    pq = [f for f in os.listdir(victim) if f.endswith(".parquet")]
    shutil.copy(os.path.join(victim, pq[0]),
                os.path.join(victim, "crashdup_" + pq[0]))
    os.remove(os.path.join(sk_dir, "_MANIFEST.json"))
    for stage in ("pairs", "edges", "clusters"):
        shutil.rmtree(os.path.join(root, stage))
    clusters, edges, _ = _run(src, root)
    # no duplicated rows survived (the unmarked dir was rebuilt from scratch)
    assert rd.read_parquet(sk_dir).count() == N
    assert not any(f.startswith("crashdup_") for f in os.listdir(victim))
    assert os.path.exists(os.path.join(victim, "_DONE"))
    assert _edges_set(edges) == clean_edges


def test_checkpointed_verify_ml_matches_live_pipeline(ckpt_env,
                                                      tmp_path_factory):
    """The checkpointed edge stage must apply the SAME acceptance rule as
    verified_edges() — with verify_ml on, the joint-ML gate must run
    (ADVICE r1: it was silently skipped)."""
    import ray.data as rd

    from setsketch_ray.pipelines.dedup import near_dup_pipeline

    src, _ = ckpt_env
    root = str(tmp_path_factory.mktemp("ckpt_ml"))
    cfg = DedupConfig(sketch_concurrency=None, num_partitions=16,
                      verify_ml=True, ml_threshold=0.3)
    _, edges_ck, map_ck = run_checkpointed(src, root, cfg, num_partitions=8)
    _, edges_live, map_live = near_dup_pipeline(rd.read_parquet(src), cfg)
    assert _edges_set(edges_ck) == _edges_set(edges_live)
    assert map_ck == map_live
    assert "jaccard_ml" in edges_ck.column_names


def _collect_edges(src, root):
    _, edges, _ = _run(src, root)
    return _edges_set(edges)


def _edges_set(edges: pa.Table):
    return set(zip(edges["id_a"].to_pylist(), edges["id_b"].to_pylist()))
