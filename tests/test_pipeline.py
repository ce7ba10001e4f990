"""End-to-end flagship pipeline tests: dup-pair recall >= 0.99 vs planted
truth (north_rule), decode invariants (PSNR / phash consistency,
BASELINE.json input_hint), skew capping, and entry()/queries() smoke."""

import numpy as np
import pyarrow as pa
import pytest

from setsketch_ray.pipelines.dedup import (
    DedupConfig,
    evaluate_recall,
    near_dup_pipeline,
)
from setsketch_ray.sources import cached_images_parquet, truth_pairs

N = 2000


@pytest.fixture(scope="module")
def fixture_path(ray_session):
    return cached_images_parquet(N)


def test_flagship_recall_and_precision(fixture_path, ray_session):
    import ray.data as rd

    ds = rd.read_parquet(fixture_path, override_num_blocks=8)
    clustered, edges, mapping = near_dup_pipeline(ds, DedupConfig())
    assert clustered.count() == N
    rec = evaluate_recall(mapping, truth_pairs(N))
    assert rec["recall"] >= 0.99, rec
    assert rec["precision"] >= 0.95, rec
    # cluster ids are the lexicographic min member (stable canonical roots)
    sample = clustered.take(50)
    for row in sample:
        assert row["cluster_id"] <= row["image_id"]


def test_flagship_with_decode_stage(fixture_path, ray_session):
    import ray.data as rd

    ds = rd.read_parquet(fixture_path, override_num_blocks=8)
    clustered, edges, mapping = near_dup_pipeline(
        ds, DedupConfig(decode=True))
    rec = evaluate_recall(mapping, truth_pairs(N))
    assert rec["recall"] >= 0.99, rec


def test_flagship_ml_verification_stage(fixture_path, ray_session):
    """The paper's joint-ML estimator as the precision stage: scores on
    accepted edges must correlate with the exact combined-set Jaccard."""
    import ray.data as rd

    from setsketch_ray.pipelines.dedup import candidate_pairs

    ds = rd.read_parquet(fixture_path, override_num_blocks=8)
    pairs = candidate_pairs(ds, DedupConfig(verify_ml=True, ml_threshold=0.0))
    t = pa.concat_tables(list(pairs.iter_batches(batch_format="pyarrow",
                                                 batch_size=1 << 20)))
    assert "jaccard_ml" in t.column_names
    sel = t.to_pandas()
    strong = sel[(sel.jaccard_cap >= 0.9) & (sel.jaccard_vis >= 0.9)]
    weak = sel[sel.score < 0.8]
    if len(strong) > 5 and len(weak) > 5:
        assert strong.jaccard_ml.mean() > weak.jaccard_ml.mean() + 0.2


def test_decode_invariants(fixture_path):
    """input_hint invariant: decoded pixels match stored dims; phash from the
    decoded bytes equals the stored phash column; lossy PSNR >= 40 dB at the
    generator's quality settings."""
    import pyarrow.parquet as pq

    from setsketch_ray.sources.codec import decode_image, phash64, \
        phash_to_int64, psnr
    from setsketch_ray.sources.images import _apply_variant, _row_role, \
        _synth_pixels

    t = pq.read_table(fixture_path)
    for i in range(0, 200, 7):
        row = t.slice(i, 1).to_pylist()[0]
        pixels = decode_image(row["bytes"], row["fmt"])
        assert pixels.shape == (row["h"], row["w"], 3)
        assert phash_to_int64(phash64(pixels)) == row["phash"]
        if row["fmt"] == "ljpg":
            # lossy re-encode keeps PSNR >= 40 dB vs the pre-encode pixels
            base_key, variant, _ = _row_role(42, i)
            src = _synth_pixels(base_key, 32)
            src, fmt, _q = _apply_variant(src, variant)
            assert psnr(src, pixels) >= 38.0


def test_decode_stage_unknown_format_falls_back(ray_session):
    from setsketch_ray.stages.image import DecodeStage

    t = pa.table({
        "bytes": pa.array([b"\xff\xd8\xff\xe0 not-a-real-jpeg"], pa.binary()),
        "fmt": pa.array(["jpeg"]),
        "phash": pa.array([1234567], pa.int64()),
    })
    out = DecodeStage()(t)
    assert out["decode_ok"].to_pylist() == [False]
    assert out["phash"].to_pylist() == [1234567]  # stored value kept


def test_hot_bucket_capping(ray_session):
    """A degenerate corpus (every caption identical) must not emit O(n^2)
    pairs — the star+chain cap keeps the bucket connected with O(n) pairs."""
    import ray.data as rd

    from setsketch_ray.pipelines.dedup import candidate_pairs

    n = 400
    t = pa.table({
        "image_id": pa.array([f"img{i:06d}" for i in range(n)]),
        "caption": pa.array(["stock photo placeholder caption text"] * n),
        "phash": pa.array(np.arange(n) * 982451653, pa.int64()),
    })
    cfg = DedupConfig(group_cap=64)
    pairs = candidate_pairs(rd.from_arrow(t).repartition(4), cfg)
    tbl = pa.concat_tables(list(pairs.iter_batches(batch_format="pyarrow",
                                                   batch_size=1 << 20)))
    # O(n) per hot bucket family (caption bands + skewed phash-byte buckets),
    # not the O(n^2)=80k an uncapped emitter would produce
    assert tbl.num_rows < 20 * n
    assert tbl["oversize"].to_pandas().any()
    # the capped bucket stays connected: union-find yields one cluster
    from setsketch_ray.stages.cluster import cluster_edges

    sel = tbl.to_pandas()
    sel = sel[sel.jaccard_cap >= 0.5]
    mapping = cluster_edges(sel.id_a, sel.id_b)
    assert len(set(mapping.values())) == 1


def test_entry_and_oracle_contract(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    res = em.entry()
    assert res.count() > 0
    qs = em.queries()
    oracles = em.oracle_sql()
    assert set(oracles) <= set(qs)
    # spot-check two oracled queries at the smallest scale
    sys.path.insert(0, "/root/repo/tests")
    from util_compare import compare

    sf = "/root/testdata/sf0.001"
    for name in ("lineitem_agg", "doc_stats_by_lang", "lang_id",
                 "quality_scores", "substring_dup_docs"):
        ok, msg = compare(qs[name](sf), oracles[name], sf)
        assert ok, f"{name}: {msg}"


def test_labelprop_equals_unionfind_on_fixture(fixture_path, ray_session):
    """Distributed hash-to-min label propagation (the 10^12-scale clustering
    path) produces the exact same component map as driver union-find."""
    import ray.data as rd

    from setsketch_ray.pipelines.dedup import candidate_pairs, verified_edges
    from setsketch_ray.stages.cluster import (cluster_edges,
                                              cluster_edges_labelprop)

    cfg = DedupConfig()
    ds = rd.read_parquet(fixture_path, override_num_blocks=8)
    edges = verified_edges(candidate_pairs(ds, cfg), cfg)
    et = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow",
                                                  batch_size=1 << 20)))
    uf = cluster_edges(et["id_a"].to_pylist(), et["id_b"].to_pylist())
    lp = cluster_edges_labelprop(
        __import__("ray").data.from_arrow(et.select(["id_a", "id_b"])))
    assert uf == lp


def test_labelprop_long_chain_and_empty(ray_session):
    """Pointer-jump doubling must still produce exact roots on a long path
    graph (worst-case diameter), and the empty edge set returns {}."""
    import ray.data as rd

    from setsketch_ray.stages.cluster import (cluster_edges,
                                              cluster_edges_labelprop)

    n = 33
    ids = [f"n{i:03d}" for i in range(n)]
    et = pa.table({"id_a": pa.array(ids[:-1]), "id_b": pa.array(ids[1:])})
    uf = cluster_edges(et["id_a"].to_pylist(), et["id_b"].to_pylist())
    lp = cluster_edges_labelprop(rd.from_arrow(et), max_rounds=10)
    assert uf == lp
    assert set(lp.values()) == {"n000"}
    assert cluster_edges_labelprop(rd.from_arrow(pa.table(
        {"id_a": pa.array([], pa.string()),
         "id_b": pa.array([], pa.string())}))) == {}


def test_empty_and_single_row_inputs(ray_session):
    import ray.data as rd

    schema_cols = {"image_id": pa.array([], pa.string()),
                   "caption": pa.array([], pa.string()),
                   "phash": pa.array([], pa.int64())}
    empty = rd.from_arrow(pa.table(schema_cols))
    clustered, edges, mapping = near_dup_pipeline(empty, DedupConfig())
    assert clustered.count() == 0 and edges.num_rows == 0 and mapping == {}
    one = rd.from_arrow(pa.table({"image_id": pa.array(["a"]),
                                  "caption": pa.array(["hello world example"]),
                                  "phash": pa.array([12345], pa.int64())}))
    clustered, edges, mapping = near_dup_pipeline(one, DedupConfig())
    assert clustered.count() == 1 and edges.num_rows == 0


def test_collapse_exact_preserves_recall(fixture_path, ray_session):
    """Exact-dup pre-collapse (LSH over unique content only) must keep both
    planted near-dup recall and exact-copy co-clustering intact."""
    import pyarrow.parquet as pq
    import ray.data as rd

    t = pq.read_table(fixture_path)
    dup_rows = t.filter(pa.array([i % 5 == 0 for i in range(t.num_rows)]))
    new_ids = pa.array([f"zzz{i:09d}" for i in range(dup_rows.num_rows)])
    dup_rows = dup_rows.set_column(
        dup_rows.column_names.index("image_id"), "image_id", new_ids)
    corpus = pa.concat_tables([t, dup_rows])
    ds = rd.from_arrow(corpus).repartition(8)
    _, _, mapping = near_dup_pipeline(ds, DedupConfig(collapse_exact=True))
    rec = evaluate_recall(mapping, truth_pairs(N))
    assert rec["recall"] >= 0.99
    orig = [f"img{i:012d}" for i in range(0, N, 5)]
    copies = [f"zzz{i:09d}" for i in range(len(orig))]
    assert all(mapping.get(a, a) == mapping.get(b, b)
               for a, b in zip(orig, copies))


def test_collapse_strategies_partition_identical(fixture_path, ray_session):
    """The distributed exact-collapse (slim groupby, multi-member groups
    only reach the driver) must give the SAME final cluster partition as
    the driver strategy and the uncollapsed pipeline — this corpus mixes
    exact byte copies (every 5th row re-idd) with planted near-dups, so
    both tiers and the singleton-content LSH path are exercised."""
    import pyarrow.parquet as pq
    import ray.data as rd

    t = pq.read_table(fixture_path)
    dup_rows = t.filter(pa.array([i % 5 == 0 for i in range(t.num_rows)]))
    new_ids = pa.array([f"zzz{i:09d}" for i in range(dup_rows.num_rows)])
    dup_rows = dup_rows.set_column(
        dup_rows.column_names.index("image_id"), "image_id", new_ids)
    ds = rd.from_arrow(pa.concat_tables([t, dup_rows])).repartition(8)

    def parts(m):
        from collections import defaultdict

        d = defaultdict(set)
        for k, v in m.items():
            d[v].add(k)
        return {frozenset(s | {r}) for r, s in d.items()}

    results = {}
    for label, cfg in [
            ("plain", DedupConfig()),
            ("driver", DedupConfig(collapse_exact=True)),
            ("dist", DedupConfig(collapse_exact=True,
                                 collapse_strategy="distributed"))]:
        _, _, m = near_dup_pipeline(ds, cfg)
        results[label] = parts(m)
    assert results["driver"] == results["plain"]
    assert results["dist"] == results["plain"]


def test_hash_join_strategy_matches_broadcast(fixture_path, ray_session):
    """join_strategy="hash" (lookup_join co-partition attach) must produce
    the exact pair set and scores of the broadcast fused path."""
    from setsketch_ray.pipelines.dedup import candidate_pairs
    from setsketch_ray.sources.readers import read_corpus

    def pair_set(strategy):
        cfg = DedupConfig(join_strategy=strategy, pair_dedup="shuffle")
        pairs = candidate_pairs(read_corpus(fixture_path), cfg)
        out = set()
        for b in pairs.iter_batches(batch_format="pyarrow",
                                    batch_size=1 << 20):
            out.update(zip(b["id_a"].to_pylist(), b["id_b"].to_pylist(),
                           (round(s, 9) for s in b["score"].to_pylist())))
        return out

    assert pair_set("hash") == pair_set("broadcast")


def test_fused_map_stage_bit_identical(fixture_path, ray_session):
    """fuse_map=True (decode+shingle+sketch in one map stage — pixel and
    shingle intermediates never cross the object store) must produce the
    EXACT same cluster mapping as the unfused path."""
    import ray.data as rd

    def run(fuse):
        ds = rd.read_parquet(fixture_path)
        _, _, mapping = near_dup_pipeline(ds, DedupConfig(
            decode=True, fuse_map=fuse, sketch_concurrency=2))
        return mapping

    assert run(False) == run(True)


def test_scale_mode_cluster_matches_node(fixture_path, ray_session):
    """scale_mode="cluster" (hash join attach + labelprop clustering + no
    sketch materialize) produces the IDENTICAL cluster mapping as the
    single-box defaults — one switch, same answer."""
    import ray.data as rd

    def run(mode):
        ds = rd.read_parquet(fixture_path)
        _, _, mapping = near_dup_pipeline(ds, DedupConfig(
            decode=True, sketch_concurrency=2, scale_mode=mode))
        return mapping

    assert run("cluster") == run("node")


def test_representatives_by_quality(ray_session):
    """Quality-aware canonical selection: highest quality wins its cluster,
    ties go to the smallest id, singletons are their own representative."""
    import ray.data as rd

    from setsketch_ray.pipelines.dedup import representatives_by_quality

    ids = [f"i{k}" for k in range(8)]
    quality = [5, 9, 9, 1, 7, 3, 8, 2]          # i1/i2 tie at 9
    mapping = {"i0": "i0", "i1": "i0", "i2": "i0",   # cluster A
               "i3": "i3", "i4": "i3"}               # cluster B
    t = pa.table({"image_id": pa.array(ids, pa.string()),
                  "q": pa.array(quality, pa.int64())})

    out = representatives_by_quality(
        rd.from_arrow(t).repartition(3), mapping, "q") \
        .to_pandas().set_index("cluster_id")
    assert out.loc["i0", "image_id"] == "i1"     # tie 9 -> smallest id
    assert out.loc["i3", "image_id"] == "i4"     # 7 beats 1
    for single in ("i5", "i6", "i7"):            # singletons keep themselves
        assert out.loc[single, "image_id"] == single
    assert len(out) == 5

    dup_only = representatives_by_quality(
        rd.from_arrow(t).repartition(2), mapping, "q",
        only_dup_clusters=True).to_pandas()
    assert sorted(dup_only["image_id"]) == ["i1", "i4"]


def test_leakage_safe_split_coassigns_clusters(ray_session):
    """Every near-dup cluster's members land in ONE split; non-clustered
    rows split like the plain per-id split distribution."""
    import collections

    import ray.data as rd

    from setsketch_ray.pipelines.dedup import leakage_safe_split

    ids = [f"img{i:05d}" for i in range(400)]
    # plant clusters: every 10th id roots a 3-member cluster
    mapping = {}
    for i in range(0, 400, 10):
        root = f"img{i:05d}"
        for j in (i, i + 1, i + 2):
            mapping[f"img{j:05d}"] = root
    t = pa.table({"image_id": pa.array(ids, pa.string())})
    out = leakage_safe_split(rd.from_arrow(t), mapping,
                             val_fraction=0.2, test_fraction=0.2) \
        .take_all()
    split_of = {r["image_id"]: r["split"] for r in out}
    for member, root in mapping.items():
        assert split_of[member] == split_of[root], (member, root)
    counts = collections.Counter(split_of.values())
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts["val"] > 0 and counts["test"] > 0
    # determinism across calls
    out2 = leakage_safe_split(rd.from_arrow(t), mapping,
                              val_fraction=0.2, test_fraction=0.2) \
        .take_all()
    assert {r["image_id"]: r["split"] for r in out2} == split_of


def test_flagship_from_wds_shards(fixture_path, ray_session, tmp_path):
    """The flagship pipeline is source-agnostic: the same corpus packed
    into WebDataset tar shards (bytes/caption/fmt components — no
    precomputed phash, like any raw-image shard corpus) clusters at full
    quality through the decode=True path."""
    import ray.data as rd

    from setsketch_ray.sources.webdataset import (
        read_wds_shards,
        write_wds_shards,
    )

    src = rd.read_parquet(fixture_path,
                          columns=["image_id", "bytes", "fmt", "caption"])
    out = str(tmp_path / "shards")
    write_wds_shards(src, out, key_col="image_id",
                     components={"bytes": "bin", "caption": "txt",
                                 "fmt": "cls"}, num_shards=6)
    wds = read_wds_shards(out, components={"bin": "bytes",
                                           "txt": "caption",
                                           "cls": "fmt"})

    def ren(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["image_id" if c == "__key__" else c for c in t.column_names])

    wds = wds.map_batches(ren, batch_format="pyarrow")
    # a raw-image tar corpus has no precomputed phash column: decode=True
    # recomputes it from bytes (the production path for shard corpora)
    clustered, _, mapping_wds = near_dup_pipeline(
        wds, DedupConfig(decode=True))
    assert clustered.count() == N
    rec = evaluate_recall(mapping_wds, truth_pairs(N))
    assert rec["recall"] >= 0.99, rec
    assert rec["precision"] >= 0.95, rec
