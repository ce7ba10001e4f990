"""Checkpointed, resumable flagship pipeline.

Wraps the near-dup stage graph in :class:`~setsketch_ray.state.checkpoint.
StageCheckpoint` stages so a killed run resumes from the last complete
partition (north_rule).  Stage outputs:

    <out_root>/sketched/sk_part=<k>/   shingles + signatures + registers
    <out_root>/pairs/pair_part=<k>/    deduped, exactly-verified pairs
    <out_root>/edges/part=0/           accepted dup edges (small)
    <out_root>/clusters/cl_part=<k>/   final cluster assignments

Each directory carries a ``_MANIFEST.json`` with the stage's config hash,
input fingerprint and per-partition row/byte metrics.  The expensive stages
(decode+sketch; pair verification) recompute ONLY missing partitions: the
sketch stage prunes its INPUT by id-hash partition, the pair stage prunes
the emitted candidate stream by ``pair_part`` before dedup + verification.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketchlib.hashing import hash_str_u64, mix64
from ..sources.readers import read_corpus
from ..state.checkpoint import (
    StageCheckpoint,
    fingerprint_config,
    fingerprint_input,
)
from .dedup import DedupConfig, evaluate_recall  # noqa: F401 (re-export)


def _id_partition(ids, num_partitions: int) -> np.ndarray:
    return (mix64(hash_str_u64(ids)) % num_partitions).astype(np.int64)


def run_checkpointed(input_path: str, out_root: str,
                     cfg: DedupConfig = DedupConfig(),
                     id_col: str = "image_id", num_partitions: int = 32):
    """Run (or resume) the flagship pipeline with per-partition checkpoints.

    Returns (clusters_dataset, edges_table, mapping).
    """
    import ray
    import ray.data as rd

    from ..stages.cluster import AssignClusters, cluster_edges
    from ..stages.lsh import BandExpand, EmitPairsPartition, VerifyPairsExact, \
        VerifyPairsML, dedup_pairs_partition
    from ..stages.shingle import ShingleStage
    from ..stages.sketch_stage import SketchStage
    from .dedup import _AttachPayloadBroadcast, _rename_payload, verified_edges

    cfg_hash = fingerprint_config(cfg)
    in_fp = fingerprint_input(input_path)
    mods = cfg.sketch.modalities
    carry_regs = cfg.verify_ml and cfg.sketch.compute_registers
    if cfg.verify_ml and not cfg.sketch.compute_registers:
        raise ValueError("verify_ml requires sketch.compute_registers")

    # ---------------------------------------------------------- stage 1: sketch
    sk_ckpt = StageCheckpoint(out_root, "sketched", cfg_hash, in_fp,
                              "sk_part", num_partitions)

    def compute_sketched(missing):
        ds = read_corpus(input_path)
        # input column names captured from the bare read: asking for the
        # schema AFTER the lazy filter chain executes a probe block, which
        # can return None on a resume whose first block filters empty
        in_names = set(ds.schema().names)

        def add_part(t: pa.Table) -> pa.Table:
            part = _id_partition(t[id_col], num_partitions)
            return t.append_column("sk_part", pa.array(part, pa.int64()))

        ds = ds.map_batches(add_part, batch_format="pyarrow")
        if missing is not None:
            keep = set(missing)

            def filt(t: pa.Table) -> pa.Table:
                mask = pa.array([v in keep for v in t["sk_part"].to_pylist()])
                return t.filter(mask)

            ds = ds.map_batches(filt, batch_format="pyarrow")
        if cfg.decode:
            from ..stages.image import DecodeStage

            ds = ds.map_batches(DecodeStage(), batch_format="pyarrow",
                                batch_size=1024)
        avail = in_names | ({"decode_ok"} if cfg.decode else set())
        drop = [c for c in ("bytes", "w", "h", "fmt", "decode_ok")
                if c in avail]
        if drop:  # blobs dropped right after decode: bandwidth, not needed
            ds = ds.drop_columns(drop)
        ds = ds.map_batches(ShingleStage(ngrams=cfg.ngrams,
                                         use_phash=cfg.use_phash),
                            batch_format="pyarrow")
        return ds.map_batches(SketchStage(cfg.sketch, drop_shingles=False),
                              batch_format="pyarrow", batch_size=2048)

    sketched = sk_ckpt.run(compute_sketched)
    sk_fp = fingerprint_input(sk_ckpt.dir)

    # ------------------------------------------------------------ stage 2: pairs
    pair_ckpt = StageCheckpoint(out_root, "pairs", cfg_hash, sk_fp,
                                "pair_part", cfg.num_partitions)

    def compute_pairs(missing):
        ds = sk_ckpt.read()
        bands = ds.map_batches(
            BandExpand(mods, id_col=id_col, num_partitions=cfg.num_partitions),
            batch_format="pyarrow")
        emitter = EmitPairsPartition(mods, id_col=id_col,
                                     group_cap=cfg.group_cap,
                                     num_partitions=cfg.num_partitions)

        def emit(p: pa.Table) -> pa.Table:
            return emitter(p)

        pairs = bands.groupby("part").map_groups(emit, batch_format="pyarrow")
        if missing is not None:
            keep = set(missing)

            def filt(t: pa.Table) -> pa.Table:
                mask = pa.array([int(v) in keep
                                 for v in t["pair_part"].to_pylist()])
                return t.filter(mask)

            pairs = pairs.map_batches(filt, batch_format="pyarrow")
        # keep pair_part through dedup for the partitioned write
        deduped = pairs.groupby("pair_part").map_groups(
            _dedup_keep_part, batch_format="pyarrow")
        # broadcast payload attach + exact verify (+ joint-ML gate when on)
        from ..stages.sketch_stage import list_u64_to_binary

        payload_cols = [id_col] + [m.shingle_col for m in mods]
        if carry_regs:
            payload_cols += ["regs", "cardinality"]
        payload = ds.select_columns(payload_cols)

        def to_bin(t: pa.Table) -> pa.Table:
            return pa.table({
                c: (list_u64_to_binary(t[c]) if c.startswith("shingles")
                    else t[c]) for c in t.column_names})

        ptbl = pa.concat_tables([to_bin(b) for b in payload.iter_batches(
            batch_format="pyarrow", batch_size=262144)])
        ref = ray.put(ptbl)
        deduped = deduped.map_batches(
            _AttachPayloadBroadcast, fn_constructor_args=(ref, id_col),
            batch_format="pyarrow", batch_size=16384, concurrency=2)
        verified = deduped.map_batches(VerifyPairsExact(mods),
                                       batch_format="pyarrow", batch_size=8192)
        if carry_regs:
            verified = verified.map_batches(VerifyPairsML(cfg.sketch),
                                            batch_format="pyarrow",
                                            batch_size=2048)
        return verified

    pairs = pair_ckpt.run(compute_pairs)
    pair_fp = fingerprint_input(pair_ckpt.dir)

    # ------------------------------------------------------------ stage 3: edges
    edge_ckpt = StageCheckpoint(out_root, "edges", cfg_hash, pair_fp,
                                "e_part", 1)

    def compute_edges(_missing):
        # SAME acceptance rule as the non-checkpointed pipeline: exact-
        # Jaccard score plus the optional multimodal_support / joint-ML
        # gates (ADVICE r1: score>=1 alone silently skipped verify_ml)
        edges = verified_edges(pairs, cfg)

        def add_part(t: pa.Table) -> pa.Table:
            return t.append_column("e_part",
                                   pa.array(np.zeros(t.num_rows,
                                                     dtype=np.int64)))

        return edges.map_batches(add_part, batch_format="pyarrow")

    edges_ds = edge_ckpt.run(compute_edges)
    edges_table = pa.concat_tables(
        list(edges_ds.iter_batches(batch_format="pyarrow", batch_size=65536))
        or [pa.table({"id_a": pa.array([], pa.string()),
                      "id_b": pa.array([], pa.string())})])

    # --------------------------------------------------------- stage 4: clusters
    mapping = cluster_edges(edges_table["id_a"].to_pylist(),
                            edges_table["id_b"].to_pylist())
    cl_ckpt = StageCheckpoint(out_root, "clusters", cfg_hash,
                              fingerprint_input(edge_ckpt.dir),
                              "cl_part", num_partitions)

    def compute_clusters(missing):
        mref = ray.put(mapping)
        ds = read_corpus(input_path, columns=[id_col])

        def add_part(t: pa.Table) -> pa.Table:
            part = _id_partition(t[id_col], num_partitions)
            return t.append_column("cl_part", pa.array(part, pa.int64()))

        ds = ds.map_batches(add_part, batch_format="pyarrow")
        if missing is not None:
            keep = set(missing)

            def filt(t: pa.Table) -> pa.Table:
                mask = pa.array([v in keep for v in t["cl_part"].to_pylist()])
                return t.filter(mask)

            ds = ds.map_batches(filt, batch_format="pyarrow")
        return ds.map_batches(AssignClusters, fn_constructor_args=(mref, id_col),
                              batch_format="pyarrow", concurrency=2)

    clusters = cl_ckpt.run(compute_clusters)
    return clusters, edges_table, mapping


def _dedup_keep_part(partition: pa.Table) -> pa.Table:
    """Pair dedup that keeps the pair_part column (needed for the partitioned
    checkpoint write)."""
    if partition.num_rows == 0:
        return partition
    keys = partition["pair_key"].to_numpy()
    _, first_idx = np.unique(keys, return_index=True)
    return partition.take(pa.array(np.sort(first_idx)))
