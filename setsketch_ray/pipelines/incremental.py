"""Incremental near-dup: extend a FINISHED checkpointed run with a delta
corpus, without re-decoding or re-sketching the old corpus.

The daily-increment shape a 100 TB training-data pipeline actually runs:
the base corpus was sketched once (``pipelines/checkpointed.py`` leaves
``<old_root>/sketched/`` — signatures + shingles, no image bytes); a new
batch of rows arrives and must be deduplicated BOTH against itself and
against everything already ingested.

Plan (all existing machinery, one new knob):

1. sketch ONLY the delta (decode -> shingle -> sketch — the expensive part
   runs on new rows alone);
2. band-expand the OLD signatures straight from the stored sketch table (a
   cheap column read, ~100 B/row — no decode) and the delta's, tagged with
   an int8 ``is_new`` flag;
3. one bucket shuffle over the union; ``EmitPairsPartition(new_col=...)``
   emits only pairs touching >= 1 new row — old x old pairs were already
   found by the base run.  In oversized buckets the star hub still pairs
   with every new member, so new-row connectivity matches the base run's
   guarantee;
4. verify with payloads unioned from the stored sketch table + the delta
   (same broadcast attach + exact [+ joint-ML] gates);
5. union the base run's accepted edges with the delta edges and re-run
   union-find over the (sparse) combined edge list.

Determinism: same counter-mode hashing end to end — the test asserts the
incremental cluster partition EQUALS a from-scratch run on the union
corpus.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..sources.readers import read_corpus
from .dedup import DedupConfig, _AttachPayloadBroadcast, verified_edges


def sketch_corpus(input_path: str, cfg: DedupConfig,
                  id_col: str = "image_id"):
    """The base run's sketch stage graph (decode -> drop blobs -> shingle ->
    sketch, shingles kept for verification), without the checkpoint wrapper.
    Mirrors ``checkpointed.run_checkpointed``'s stage 1."""
    from ..stages.shingle import ShingleStage
    from ..stages.sketch_stage import SketchStage

    ds = read_corpus(input_path)
    if cfg.decode:
        from ..stages.image import DecodeStage

        ds = ds.map_batches(DecodeStage(), batch_format="pyarrow",
                            batch_size=1024)
    drop = [c for c in ("bytes", "w", "h", "fmt", "decode_ok")
            if c in ds.schema().names]
    if drop:
        ds = ds.drop_columns(drop)
    ds = ds.map_batches(ShingleStage(ngrams=cfg.ngrams,
                                     use_phash=cfg.use_phash),
                        batch_format="pyarrow")
    return ds.map_batches(SketchStage(cfg.sketch, drop_shingles=False),
                          batch_format="pyarrow", batch_size=2048)


def incremental_near_dup(old_roots, delta_path: str,
                         cfg: DedupConfig = DedupConfig(),
                         id_col: str = "image_id",
                         out_root: str | None = None):
    """Dedup a delta corpus against itself AND one or more finished runs.

    ``old_roots``: the ``out_root`` of a completed
    :func:`~setsketch_ray.pipelines.checkpointed.run_checkpointed` run, or
    a LIST of roots — the base run plus any earlier increments'
    ``out_root``s, so daily increments COMPOSE: each round reads every
    prior round's stored signatures and edges, sketches only its own
    delta, and (with ``out_root``) persists its delta's sketch table +
    accepted edges in the same layout for the next round.

    Returns ``(edges_table, mapping)`` over the COMBINED corpus — the same
    contract as the base run's (edges, mapping).
    """
    import ray
    import ray.data as rd

    from ..stages.cluster import cluster_edges
    from ..stages.lsh import (
        BandExpand,
        EmitPairsPartition,
        VerifyPairsExact,
        VerifyPairsML,
        dedup_pairs_partition,
    )
    from ..stages.sketch_stage import list_u64_to_binary

    mods = cfg.sketch.modalities
    carry_regs = cfg.verify_ml and cfg.sketch.compute_registers
    if cfg.verify_ml and not cfg.sketch.compute_registers:
        raise ValueError("verify_ml requires sketch.compute_registers")

    roots = [old_roots] if isinstance(old_roots, str) else list(old_roots)
    # one read per root (read_parquet expands a single directory, not a
    # list of them), then a lazy union
    sks = [rd.read_parquet(os.path.join(r, "sketched")) for r in roots]
    old_sk = sks[0] if len(sks) == 1 else sks[0].union(*sks[1:])
    delta_sk = sketch_corpus(delta_path, cfg, id_col)
    if out_root is not None:
        # persist the delta's sketch table in the base layout so the NEXT
        # increment can band-expand it without re-sketching
        from ..state.checkpoint import (
            StageCheckpoint,
            fingerprint_config,
            fingerprint_input,
        )

        sk_ckpt = StageCheckpoint(out_root, "sketched",
                                  fingerprint_config(cfg),
                                  fingerprint_input(delta_path),
                                  "sk_part", 8)

        def compute(_missing):
            from ..pipelines.checkpointed import _id_partition

            def add_part(t: pa.Table) -> pa.Table:
                part = _id_partition(t[id_col], 8)
                return t.append_column("sk_part",
                                       pa.array(part, pa.int64()))

            return delta_sk.map_batches(add_part, batch_format="pyarrow")

        delta_sk = sk_ckpt.run(compute)
    else:
        # no checkpoint root: the lazy plan is consumed twice below (band
        # expansion + payload broadcast) — materialize once so the expensive
        # decode+shingle+sketch of the delta doesn't re-execute
        delta_sk = delta_sk.materialize()

    # ---- band rows from both sides, tagged; ONLY ~41 B rows shuffle
    def bandify(is_new: int):
        be = BandExpand(mods, id_col=id_col,
                        num_partitions=cfg.num_partitions)

        def fn(t: pa.Table) -> pa.Table:
            out = be(t)
            return out.append_column("is_new", pa.array(
                np.full(out.num_rows, is_new, np.int8), pa.int8()))

        return fn

    bands = old_sk.map_batches(bandify(0), batch_format="pyarrow").union(
        delta_sk.map_batches(bandify(1), batch_format="pyarrow"))
    emitter = EmitPairsPartition(mods, id_col=id_col,
                                 group_cap=cfg.group_cap,
                                 num_partitions=cfg.num_partitions,
                                 new_col="is_new")

    def emit(p: pa.Table) -> pa.Table:
        return emitter(p)

    pairs = bands.groupby("part").map_groups(emit, batch_format="pyarrow")
    pairs = pairs.groupby("pair_part").map_groups(dedup_pairs_partition,
                                                  batch_format="pyarrow")

    # ---- verification payload: stored sketches + delta sketches
    payload_cols = [id_col] + [m.shingle_col for m in mods]
    if carry_regs:
        payload_cols += ["regs", "cardinality"]

    def to_bin(t: pa.Table) -> pa.Table:
        return pa.table({
            c: (list_u64_to_binary(t[c]) if c.startswith("shingles")
                else t[c]) for c in payload_cols})

    ptbl = pa.concat_tables(
        [to_bin(b) for src in (old_sk, delta_sk)
         for b in src.select_columns(payload_cols).iter_batches(
             batch_format="pyarrow", batch_size=262144)])
    ref = ray.put(ptbl)
    pairs = pairs.map_batches(
        _AttachPayloadBroadcast, fn_constructor_args=(ref, id_col),
        batch_format="pyarrow", batch_size=16384, concurrency=2)
    pairs = pairs.map_batches(VerifyPairsExact(mods),
                              batch_format="pyarrow", batch_size=8192)
    if carry_regs:
        pairs = pairs.map_batches(VerifyPairsML(cfg.sketch),
                                  batch_format="pyarrow", batch_size=2048)

    delta_edges = pa.concat_tables(list(
        verified_edges(pairs, cfg).iter_batches(
            batch_format="pyarrow", batch_size=65536))
        or [pa.table({"id_a": pa.array([], pa.string()),
                      "id_b": pa.array([], pa.string())})])
    if out_root is not None:
        # persist this round's accepted edges for the next increment
        import pyarrow.parquet as pq

        edir = os.path.join(out_root, "edges", "e_part=0")
        os.makedirs(edir, exist_ok=True)
        pq.write_table(delta_edges.select(["id_a", "id_b"]),
                       os.path.join(edir, "edges.parquet"))
    base_edges = pa.concat_tables(
        [pa.table({"id_a": pa.array([], pa.string()),
                   "id_b": pa.array([], pa.string())})]
        + [pa.concat_tables(list(
            rd.read_parquet(os.path.join(r, "edges"))
            .select_columns(["id_a", "id_b"]).iter_batches(
                batch_format="pyarrow", batch_size=65536))
            or [pa.table({"id_a": pa.array([], pa.string()),
                          "id_b": pa.array([], pa.string())})])
           for r in roots])

    id_a = base_edges["id_a"].to_pylist() + delta_edges["id_a"].to_pylist()
    id_b = base_edges["id_b"].to_pylist() + delta_edges["id_b"].to_pylist()
    mapping = cluster_edges(id_a, id_b)
    edges = pa.table({"id_a": pa.array(id_a, pa.string()),
                      "id_b": pa.array(id_b, pa.string())})
    return edges, mapping
