"""Flagship pipeline: near-duplicate detection + clustering over an
image+caption table (BASELINE.json north_star).

Stage graph (all lazy; ONE wide shuffle at the band groupby):

  read (parquet/lance)
    -> ShingleStage            map_batches, tasks       (caption+phash -> set)
    -> SketchStage             map_batches, ACTOR POOL  (MinHash + SetSketch)
    -> drop bytes/wide cols                             (never shuffle blobs)
    -> BandExpand              map_batches, tasks       (x num_bands rows)
    -> groupby(band_key)       THE shuffle
    -> EmitPairs               map_groups               (pairs + sig Jaccard)
    -> groupby(id_a,id_b) first                         (pair dedup, light)
    -> [VerifyPairsML]         map_batches              (paper's joint ML)
    -> threshold filter -> edges (small)
    -> union-find (driver) -> broadcast -> AssignClusters

Scale notes (10^12 rows): the band groupby is hash-partitioned on band_key;
hot buckets are capped with a star+chain topology (see ``stages/lsh.py``);
cluster assignment at that scale replaces driver union-find with iterative
hash-to-min label propagation: repeat
``edges.groupby(dst).aggregate(min(src))`` joins until labels fix — each
round is one small shuffle over the (sparse) edge list only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..stages.cluster import AssignClusters, cluster_edges
from ..stages.lsh import (
    BandExpand,
    EmitPairsPartition,
    VerifyPairsML,
    dedup_pairs_partition,
)
from ..stages.shingle import ShingleStage
from ..stages.sketch_stage import SketchConfig, SketchStage


@dataclass(frozen=True)
class DedupConfig:
    sketch: SketchConfig = field(default_factory=SketchConfig)
    group_cap: int = 64           # LSH bucket size cap (skew guard)
    num_partitions: int = 128     # shuffle partitions (rule: 4 x total cores)
    verify_ml: bool = False       # run the SetSketch joint-ML precision stage
    ml_threshold: float = 0.5     # min jaccard_ml when verify_ml is on
    ngrams: tuple = (1, 2)
    use_phash: bool = True
    sketch_concurrency: int | None = None  # actor-pool size (None = tasks)


def candidate_pairs(ds, cfg: DedupConfig = DedupConfig(), id_col: str = "image_id"):
    """read-through to the deduped, exactly-verified candidate pair dataset."""
    heavy = [c for c in ("bytes", "w", "h", "fmt") if c in ds.schema().names]
    ds = ds.map_batches(ShingleStage(ngrams=cfg.ngrams, use_phash=cfg.use_phash),
                        batch_format="pyarrow")
    sketch_kwargs = dict(batch_format="pyarrow", batch_size=4096)
    if cfg.sketch_concurrency:
        sketch_kwargs["concurrency"] = cfg.sketch_concurrency
    carry_regs = cfg.verify_ml and cfg.sketch.compute_registers
    ds = ds.map_batches(SketchStage(cfg.sketch, drop_shingles=False),
                        **sketch_kwargs)
    if heavy:
        ds = ds.drop_columns(heavy)  # blobs must not enter the shuffle
    mods = cfg.sketch.modalities
    ds = ds.map_batches(
        BandExpand(mods, id_col=id_col, num_partitions=cfg.num_partitions,
                   carry_regs=carry_regs),
        batch_format="pyarrow")
    emitter = EmitPairsPartition(mods, id_col=id_col, group_cap=cfg.group_cap,
                                 num_partitions=cfg.num_partitions,
                                 carry_regs=carry_regs)

    def emit_pairs(partition: pa.Table) -> pa.Table:
        return emitter(partition)

    pairs = ds.groupby("part").map_groups(emit_pairs, batch_format="pyarrow")
    pairs = pairs.groupby("pair_part").map_groups(
        dedup_pairs_partition, batch_format="pyarrow")
    if carry_regs:
        pairs = pairs.map_batches(VerifyPairsML(cfg.sketch),
                                  batch_format="pyarrow", batch_size=2048)
    return pairs


def verified_edges(pairs, cfg: DedupConfig):
    """Filter candidate pairs to accepted duplicate edges: signature Jaccard
    over threshold in ANY modality (score >= 1), and — when the joint-ML
    precision stage ran — jaccard_ml over its threshold too."""
    import pyarrow.compute as pc

    def filt(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(t["score"], pa.scalar(1.0))
        if "jaccard_ml" in t.column_names:
            mask = pc.and_(mask, pc.greater_equal(
                t["jaccard_ml"], pa.scalar(cfg.ml_threshold)))
        return t.filter(mask)

    return pairs.map_batches(filt, batch_format="pyarrow")


def near_dup_pipeline(ds, cfg: DedupConfig = DedupConfig(),
                      id_col: str = "image_id"):
    """Full pipeline.  Returns (clustered_dataset, edges_table, mapping).

    ``clustered_dataset`` = input ids + cluster_id + is_canonical;
    ``edges_table``       = accepted dup pairs (small, materialized);
    ``mapping``           = {id: cluster_root} for evaluation.
    """
    import ray

    pairs = candidate_pairs(ds, cfg, id_col=id_col)
    edges = verified_edges(pairs, cfg)
    # the verified edge list is sparse — safe to materialize driver-side
    batches = [b for b in edges.iter_batches(batch_format="pyarrow",
                                             batch_size=65536)]
    if batches:
        edges_table = pa.concat_tables(batches)
        mapping = cluster_edges(edges_table["id_a"].to_pylist(),
                                edges_table["id_b"].to_pylist())
    else:
        edges_table = pa.table({"id_a": pa.array([], pa.string()),
                                "id_b": pa.array([], pa.string())})
        mapping = {}
    mapping_ref = ray.put(mapping)
    clustered = ds.select_columns([id_col]).map_batches(
        AssignClusters, fn_constructor_args=(mapping_ref, id_col),
        batch_format="pyarrow", concurrency=2)
    return clustered, edges_table, mapping


def evaluate_recall(mapping: dict, truth: pa.Table) -> dict:
    """Dup-pair recall/precision of the transitive cluster graph vs a
    truth_pairs table (north_rule: recall >= 0.99)."""
    from ..stages.cluster import transitive_pairs

    predicted = transitive_pairs(mapping)
    truth_set = set(zip(truth["id_a"].to_pylist(), truth["id_b"].to_pylist()))
    tp = len(predicted & truth_set)
    recall = tp / len(truth_set) if truth_set else 1.0
    precision = tp / len(predicted) if predicted else 1.0
    return {"recall": recall, "precision": precision,
            "true_pairs": len(truth_set), "predicted_pairs": len(predicted),
            "matched_pairs": tp}
