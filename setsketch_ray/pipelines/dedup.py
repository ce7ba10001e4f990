"""Flagship pipeline: near-duplicate detection + clustering over an
image+caption table (BASELINE.json north_star).

Stage graph (all lazy; ONE wide shuffle at the band groupby):

  read (parquet/lance)
    -> [DecodeStage]           map_batches, ACTOR POOL  (bytes -> pixels+phash)
    -> drop bytes/wide cols                             (blobs never cross
                                                         another boundary)
    -> ShingleStage            map_batches, tasks       (caption+phash -> set)
    -> SketchStage             map_batches, ACTOR POOL  (MinHash + SetSketch)
    -> BandExpand              map_batches, tasks       (x num_bands rows)
    -> groupby(band_key)       THE shuffle
    -> EmitPairs               map_groups               (pairs, skew-capped)
    -> groupby(pair_key) first                          (pair dedup, light)
    -> VerifyPairsAgainstPayload map_batches            (FUSED broadcast
                                  attach + exact Jaccard; or attach+verify
                                  [+joint-ML] when regs are carried)
    -> threshold filter (+ multimodal support gate) -> edges (small)
    -> union-find (driver) / labelprop (distributed) -> AssignClusters

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
    VerifyPairsExact,
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
    decode: bool = False          # decode bytes + recompute phash (actor pool)
    # caption-driven acceptance additionally needs this much visual overlap.
    # Default ON since round 2: at web scale caption-coincidence pairs grow
    # ~n^2 (measured: ALL false edges at 200k/500k rows have jaccard_vis
    # <= 0.035 while paraphrase true pairs keep >= ~0.1), so a tiny support
    # requirement separates them exactly.  IDENTICAL caption sets
    # (jaccard_cap >= exact_caption_exempt) stay accepted without visual
    # support — geometric edits (1 px shift) can destroy the phash entirely
    # and exact-dup captions are the strongest caption evidence.  Set to
    # None to accept on caption similarity alone.
    multimodal_support: float | None = 0.05
    exact_caption_exempt: float = 0.999
    sketch_concurrency: int | None = None  # actor-pool size (None = tasks)
    # batch size for the decode / fused map stages.  None = format-profile
    # defaults (1024 unfused / 4096 fused — right for the cheap png/ljpg
    # corpus).  Real-JPEG corpora decode at ~3 ms/row, so a 1024-row batch
    # is a 3+ s task: set ~256 there to keep task granularity ~1 s.
    map_batch_size: int | None = None
    # fuse decode+shingle+sketch into ONE map stage (pixel/shingle
    # intermediates never cross the object store; bit-identical results).
    # None = near_dup_pipeline auto-decides by the measured rule
    # "fuse when rows / 4096 >= ~1.5 x cores" (fused wins when there are
    # enough 4096-row bundles to keep every core on a task; below that the
    # bundling costs task granularity — BASELINE.md A/B rows); explicit
    # True/False pins it (candidate_pairs treats None as False)
    fuse_map: bool | None = None
    # payload attachment for pair verification:
    #   "broadcast" — ray.put the id->payload map once, look up per batch.
    #     Right whenever the corpus payload fits comfortably in the object
    #     store (<= ~10M rows); zero shuffle.
    #   "hash"      — two Dataset.join hash joins.  The 10^12-row path: the
    #     payload can never be broadcast, but pairs after dedup are sparse so
    #     the join shuffles O(corpus) once at ~300B/row.
    join_strategy: str = "broadcast"
    # pin the sketched table so bands and payload don't recompute it; at
    # corpus scale disable and checkpoint to parquet instead (state/checkpoint)
    materialize_sketches: bool = True
    # "shuffle": global pair-dedup all-to-all before verification (cheap now
    # that emit dedups within partitions first — and it bounds the x num_bands
    # duplicate blowup of EXACT duplicates, which dominate web corpora);
    # "edges": skip it and dedup at the accepted-edge level only
    pair_dedup: str = "shuffle"
    # collapse rows with IDENTICAL shingle content to one representative
    # before banding (web corpora are dominated by exact duplicates; LSH then
    # runs over unique content only) and expand the cluster map through the
    # exact groups afterwards
    collapse_exact: bool = False
    # "driver": pull (id, 8-byte content key) for every row and group
    #   driver-side — fine to ~10^8 rows, zero shuffle.
    # "distributed": one slim groupby(content_key) exchange; only MULTI-
    #   member group rows reach the driver (the exact-dup mass — the same
    #   class as the dup-cluster mapping broadcast).  The 10^12-row path.
    collapse_strategy: str = "driver"
    # "unionfind" collects the sparse edge list to the driver;
    # "labelprop" runs distributed hash-to-min label propagation over the
    # edge dataset (the 10^12-row path: only edges shuffle, O(diameter)
    # join rounds) — results are identical (tested)
    cluster_strategy: str = "unionfind"
    # ONE switch for the multi-node profile: "cluster" resolves (at
    # near_dup_pipeline entry) to join_strategy="hash",
    # cluster_strategy="labelprop", materialize_sketches=False — no
    # driver-side pull bigger than the sparse edge list, no broadcast that
    # assumes the corpus payload fits one heap.  "node" keeps the
    # single-box defaults above.  Results are identical (tested).
    scale_mode: str = "node"


def _rename_payload(suffix: str, id_col: str, list_cols: tuple = ()):
    """Rename payload columns with a side suffix and convert shingle list
    columns to binary blobs (acero joins cannot carry list payloads)."""
    from ..stages.sketch_stage import list_u64_to_binary

    def rename(t: pa.Table) -> pa.Table:
        cols = {}
        for c in t.column_names:
            name = c if c == id_col else f"{c}{suffix}"
            cols[name] = list_u64_to_binary(t[c]) if c in list_cols else t[c]
        return pa.table(cols)

    return rename


def sketched_dataset(ds, cfg: DedupConfig = DedupConfig(),
                     id_col: str = "image_id"):
    """The decode -> shingle -> sketch map chain (fused or staged),
    producing the LSH-ready table with shingle list columns retained.
    Extracted from :func:`candidate_pairs` so tiered callers
    (``collapse_exact``) can run it ONCE and share the result between the
    exact-collapse keys and the LSH stage instead of decoding twice."""
    heavy = [c for c in ("bytes", "w", "h", "fmt", "decode_ok")
             if c in ds.schema().names]
    if cfg.decode and cfg.fuse_map:
        # one fused stage: pixel tables + shingle lists stay in the worker
        # heap instead of crossing the object store twice (the map path is
        # DRAM-bandwidth-bound at full occupancy — BASELINE.md forensics)
        from ..stages.sketch_stage import FusedDecodeShingleSketch

        # 4096 beats 1024 here (sketch-kernel amortization dominates; the
        # decoded 4096x4KB pixel table is 16 MB heap — fine)
        fused_kwargs = dict(batch_format="pyarrow",
                            batch_size=cfg.map_batch_size or 4096)
        if cfg.sketch_concurrency:
            fused_kwargs["concurrency"] = cfg.sketch_concurrency
        ds = ds.map_batches(
            FusedDecodeShingleSketch(cfg.sketch, ngrams=cfg.ngrams,
                                     use_phash=cfg.use_phash,
                                     drop_shingles=False), **fused_kwargs)
    else:
        if cfg.decode:
            from ..stages.image import DecodeStage

            decode_kwargs = dict(batch_format="pyarrow",
                                 batch_size=cfg.map_batch_size or 1024)
            if cfg.sketch_concurrency:
                decode_kwargs["concurrency"] = cfg.sketch_concurrency
            ds = ds.map_batches(DecodeStage(), **decode_kwargs)
            heavy = list(dict.fromkeys(heavy + ["decode_ok"]))
        # drop blobs IMMEDIATELY: after decode only (caption, phash) matter,
        # and carrying ~10 KB/row of bytes across two more map-stage
        # object-store boundaries is pure shared-memory bandwidth waste
        if heavy:
            ds = ds.drop_columns(heavy)
        ds = ds.map_batches(ShingleStage(ngrams=cfg.ngrams,
                                         use_phash=cfg.use_phash),
                            batch_format="pyarrow")
        sketch_kwargs = dict(batch_format="pyarrow", batch_size=4096)
        if cfg.sketch_concurrency:
            sketch_kwargs["concurrency"] = cfg.sketch_concurrency
        ds = ds.map_batches(SketchStage(cfg.sketch, drop_shingles=False),
                            **sketch_kwargs)
    return ds


def candidate_pairs(ds, cfg: DedupConfig = DedupConfig(),
                    id_col: str = "image_id", pre_sketched: bool = False):
    """read-through to the deduped, exactly-verified candidate pair dataset.

    Only ~40-byte (band_key, part, id) rows enter the wide shuffle; the
    verification payload (shingle sets [+ registers]) is hash-joined onto the
    already-deduplicated pairs — at corpus scale this is the difference
    between shuffling bytes O(corpus x num_bands x payload) and
    O(corpus x 40 B) + O(dups x payload).

    ``pre_sketched=True`` skips the decode/shingle/sketch map chain — the
    input already IS a :func:`sketched_dataset` output (the tiered
    ``collapse_exact`` path, which shares one chain between the collapse
    keys and LSH).
    """
    carry_regs = cfg.verify_ml and cfg.sketch.compute_registers
    if not pre_sketched:
        ds = sketched_dataset(ds, cfg, id_col)
    mods = cfg.sketch.modalities
    if cfg.materialize_sketches:
        ds = ds.materialize()

    # verification payload: shingle sets (+ registers for the ML stage)
    schema = ds.schema()
    schema_names = schema.names if schema is not None else \
        [m.shingle_col for m in mods]  # empty dataset: assume full schema
    payload_cols = [id_col] + [m.shingle_col for m in mods
                               if m.shingle_col in schema_names]
    if carry_regs and cfg.join_strategy != "broadcast":
        # hash path attaches registers with the shingle payload; the
        # broadcast path broadcasts them as a separate register pool and
        # scores fused (VerifyPairsMLFromPool) — no per-pair regs copies
        payload_cols += ["regs", "cardinality"]
    payload = ds.select_columns(payload_cols)

    bands = ds.map_batches(
        BandExpand(mods, id_col=id_col, num_partitions=cfg.num_partitions),
        batch_format="pyarrow")
    emitter = EmitPairsPartition(mods, id_col=id_col, group_cap=cfg.group_cap,
                                 num_partitions=cfg.num_partitions)

    def emit_pairs(partition: pa.Table) -> pa.Table:
        return emitter(partition)

    # groupby output parallelism follows the input block count — callers must
    # read with enough blocks (>= cluster cores; bench uses 2x cores).  Band
    # expansion multiplies rows ~50x but keeps the block structure.
    pairs = bands.groupby("part").map_groups(emit_pairs, batch_format="pyarrow")
    if cfg.pair_dedup == "shuffle":
        # exact global pair uniqueness before verification (checkpointed /
        # pair-consuming queries); the flagship skips this all-to-all and
        # dedups at the (tiny) edge level instead — duplicate candidates
        # from different bands just re-verify vectorized
        pairs = pairs.groupby("pair_part").map_groups(
            dedup_pairs_partition, batch_format="pyarrow")

    # attach the verification payload onto both pair sides
    list_cols = tuple(m.shingle_col for m in mods)
    if cfg.join_strategy == "broadcast":
        import ray

        from ..stages.sketch_stage import list_u64_to_binary

        # pull the payload as ARROW (no per-row Python on the driver: this
        # pull is the pipeline's only serial section) and broadcast the table
        def to_binary_cols(t: pa.Table) -> pa.Table:
            return pa.table({
                c: (list_u64_to_binary(t[c]) if c in list_cols else t[c])
                for c in t.column_names})

        payload_batches = [to_binary_cols(b) for b in payload.iter_batches(
            batch_format="pyarrow", batch_size=262144)]
        if not payload_batches:  # empty input corpus
            payload_batches = [pa.table(
                {c: pa.array([], pa.string() if c == id_col else pa.binary())
                 for c in payload_cols})]
        payload_tbl = pa.concat_tables(payload_batches)
        lookup_ref = ray.put(payload_tbl)

        # FUSED attach+verify: candidates outnumber rows ~20x at web
        # scale, so materializing two payload copies per pair dominated
        # the whole pipeline; the fused stage gathers shingle elements
        # straight from the broadcast pool (stages/lsh.py)
        from ..stages.lsh import VerifyPairsAgainstPayload

        pairs = pairs.map_batches(
            VerifyPairsAgainstPayload(lookup_ref, mods, id_col),
            batch_format="pyarrow", batch_size=16384)
        if carry_regs:
            # joint-ML precision stage fused against a broadcast REGISTER
            # pool — scores only score>=1 pairs (r4; was an attach path
            # that re-materialized two m-byte register copies per pair and
            # cost ~2.4x the whole exact pipeline at 200k)
            from ..stages.lsh import VerifyPairsMLFromPool

            regs_batches = list(
                ds.select_columns([id_col, "regs", "cardinality"])
                .iter_batches(batch_format="pyarrow", batch_size=262144))
            if not regs_batches:  # empty input corpus
                regs_batches = [pa.table(
                    {id_col: pa.array([], pa.string()),
                     "regs": pa.array([], pa.binary()),
                     "cardinality": pa.array([], pa.float64())})]
            regs_ref = ray.put(pa.concat_tables(regs_batches))
            pairs = pairs.map_batches(
                VerifyPairsMLFromPool(regs_ref, cfg.sketch, id_col),
                batch_format="pyarrow", batch_size=8192)
        return pairs
    else:
        from ..functions.relational import lookup_join
        from ..stages.sketch_stage import list_u64_to_binary

        npart = max(cfg.num_partitions // 2, 8)
        # ONE slim verification table (id + binary shingles [+regs]),
        # materialized ONCE: both join sides read from it, so the decode->
        # sketch chain runs exactly once for verification instead of once
        # per side (measured: the chain re-execution, not bytes, dominated
        # the 500k cluster profile).  O(corpus x ~0.7 KB) — the same class
        # the checkpointed pipeline PERSISTS per partition; at 10^12 rows
        # this table lives in the sketch checkpoint, not the object store.
        payload = _slim_verification_table(
            ds, mods, id_col, payload_cols, list_cols).materialize()
        list_cols = ()   # shingles already binary in the slim table
        pay_a = payload.map_batches(_rename_payload("_a", id_col, list_cols),
                                    batch_format="pyarrow")
        pay_b = payload.map_batches(_rename_payload("_b", id_col, list_cols),
                                    batch_format="pyarrow")
        # deduped pairs are consumed by two co-partition joins and their
        # schema feeds lookup_join — one materialize, no re-execution
        pairs = pairs.materialize()
        pairs_schema = pairs.schema().base_schema
        base = schema.base_schema if schema is not None else pa.schema(
            [(id_col, pa.string())]
            + [(c, pa.binary()) for c in payload_cols if c != id_col])

        shingle_cols = tuple(m.shingle_col for m in mods)

        def _pay_schema(suffix: str) -> pa.Schema:
            # shingle columns travel as binary blobs on this path whether
            # converted by _rename_payload (list_cols) or already binary in
            # the slim verification table (prefilter branch)
            fields = []
            for c in payload_cols:
                typ = pa.binary() if c in shingle_cols \
                    else base.field(c).type
                name = c if c == id_col else f"{c}{suffix}"
                fields.append((name, typ))
            return pa.schema(fields)

        pairs = lookup_join(pairs, pay_a, "id_a", id_col,
                            num_partitions=npart,
                            left_schema=pairs_schema,
                            right_schema=_pay_schema("_a"))
        mid_fields = list(zip(pairs_schema.names, pairs_schema.types)) + [
            (f.name, f.type) for f in _pay_schema("_a") if f.name != id_col]
        pairs = lookup_join(pairs, pay_b, "id_b", id_col,
                            num_partitions=npart,
                            left_schema=pa.schema(mid_fields),
                            right_schema=_pay_schema("_b"))
    pairs = pairs.map_batches(VerifyPairsExact(mods), batch_format="pyarrow",
                              batch_size=8192)
    if carry_regs:
        pairs = pairs.map_batches(VerifyPairsML(cfg.sketch),
                                  batch_format="pyarrow", batch_size=2048)
    return pairs


_WORKER_CACHE: dict = {}


def _slim_verification_table(ds, mods, id_col: str, payload_cols,
                             list_cols):
    """Project the sketched dataset down to the hash-attach verification
    columns — id + shingle sets as binary blobs (+regs when the ML gate
    is on) — in ONE map over the chain.  ~0.7 KB/row; the single
    materialization every hash-path join side reads from.

    A truncated-signature candidate PREFILTER before the payload joins
    was prototyped here and measured OUT (r5): on this corpus 90% of the
    LSH candidates sit at caption-Jaccard 0.05-0.25 — a mid-similarity
    mass that narrow 4-row bands inevitably over-generate when the accept
    threshold is as low as 0.5 (LSH S-curve physics) — and separating
    0.2 from 0.5 at 6-sigma confidence needs ~200 one-byte MinHash slots
    per side, which costs MORE exchange bytes than the 80-byte exact
    caption payload itself.  The cascade that would pay at 10^12 rows is
    exact-cheap-modality-first (captions), gating the expensive modality
    payload — noted for a future round."""
    from ..stages.sketch_stage import list_u64_to_binary

    def slim(t: pa.Table) -> pa.Table:
        cols = {id_col: t[id_col]}
        for c in payload_cols:
            if c == id_col:
                continue
            cols[c] = list_u64_to_binary(t[c]) if c in list_cols else t[c]
        return pa.table(cols)

    need = [id_col] + [c for c in payload_cols if c != id_col]
    return ds.select_columns(need).map_batches(slim, batch_format="pyarrow")


def _attach_payload(batch: pa.Table, lookup_ref, id_col: str) -> pa.Table:
    """Append ``<payload>_a`` / ``<payload>_b`` columns by Arrow ``take``
    from the broadcast payload table.  The (table, key array) pair is cached
    per worker process keyed by the object ref — reused across tasks with no
    actor pool.  Lookups are vectorized ``pc.index_in`` (C++ hash join), not
    per-row Python dict probes."""
    import pyarrow.compute as pc
    import ray

    key = ("payload", lookup_ref.hex() if hasattr(lookup_ref, "hex")
           else id(lookup_ref))
    cached = _WORKER_CACHE.get(key)
    if cached is None:
        table: pa.Table = ray.get(lookup_ref) \
            if not isinstance(lookup_ref, pa.Table) else lookup_ref
        keys = table[id_col].combine_chunks() \
            if isinstance(table[id_col], pa.ChunkedArray) else table[id_col]
        cached = (table, keys)
        _WORKER_CACHE.clear()
        _WORKER_CACHE[key] = cached
    table, keys = cached
    value_cols = [c for c in table.column_names if c != id_col]
    out = batch
    for side in ("a", "b"):
        rows = pc.index_in(batch[f"id_{side}"], value_set=keys)
        taken = table.take(rows)
        for cname in value_cols:
            out = out.append_column(f"{cname}_{side}", taken[cname])
    return out


class _AttachPayloadBroadcast:
    """Actor-pool variant kept for the checkpointed pipeline (explicit
    construction)."""

    def __init__(self, lookup_ref, id_col: str):
        import ray

        self.table: pa.Table = ray.get(lookup_ref)
        self.id_col = id_col
        k = self.table[id_col]
        self.keys = k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
        self.value_cols = [c for c in self.table.column_names if c != id_col]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = batch
        for side in ("a", "b"):
            rows = pc.index_in(batch[f"id_{side}"], value_set=self.keys)
            taken = self.table.take(rows)
            for cname in self.value_cols:
                out = out.append_column(f"{cname}_{side}", taken[cname])
        return out


def verified_edges(pairs, cfg: DedupConfig):
    """Filter candidate pairs to accepted duplicate edges.

    Rule: exact Jaccard over threshold in any modality (score >= 1); when
    both modalities exist and ``multimodal_support`` is set, caption-driven
    acceptance additionally requires minimal visual overlap — except for
    near-IDENTICAL caption sets (>= ``exact_caption_exempt``), which pass on
    caption evidence alone.  The optional joint-ML precision stage gates on
    ``jaccard_ml`` too."""
    import pyarrow.compute as pc

    mods = {m.name: m for m in cfg.sketch.modalities}

    def filt(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(t["score"], pa.scalar(1.0))
        if (cfg.multimodal_support is not None and "jaccard_cap" in
                t.column_names and "jaccard_vis" in t.column_names):
            vis_ok = pc.greater_equal(t["jaccard_vis"],
                                      pa.scalar(mods["vis"].threshold))
            cap_ok = pc.and_(
                pc.greater_equal(t["jaccard_cap"],
                                 pa.scalar(mods["cap"].threshold)),
                pc.or_(pc.greater_equal(t["jaccard_vis"],
                                        pa.scalar(cfg.multimodal_support)),
                       pc.greater_equal(t["jaccard_cap"],
                                        pa.scalar(cfg.exact_caption_exempt))))
            mask = pc.and_(mask, pc.or_(vis_ok, cap_ok))
        if "jaccard_ml" in t.column_names:
            mask = pc.and_(mask, pc.greater_equal(
                t["jaccard_ml"], pa.scalar(cfg.ml_threshold)))
        return t.filter(mask)

    return pairs.map_batches(filt, batch_format="pyarrow")


def _exact_groups(ds, cfg: DedupConfig, id_col: str):
    """(member -> representative) map for rows with identical shingle
    content, shingling the raw corpus (stored phash, no decode).  The
    tiered pipeline path uses :func:`_exact_groups_from_sketched` on the
    shared decoded chain instead."""
    from ..stages.shingle import ShingleStage

    sh = ds.map_batches(ShingleStage(ngrams=cfg.ngrams,
                                     use_phash=cfg.use_phash),
                        batch_format="pyarrow")
    return _exact_groups_from_sketched(sh, cfg, id_col)


def _content_keys_fn(cfg: DedupConfig, id_col: str):
    """Row-local (id, content_key) projection over shingle list columns
    (xor-folded per-modality content hashes)."""
    from ..stages.shingle import content_keys
    from ..stages.sketch_stage import list_column_to_flat

    def keys(t: pa.Table) -> pa.Table:
        import numpy as np

        agg = np.zeros(t.num_rows, dtype=np.uint64)
        for mod in cfg.sketch.modalities:
            if mod.shingle_col in t.column_names:
                vals, offs = list_column_to_flat(t[mod.shingle_col])
                agg ^= content_keys(vals, offs)
        return pa.table({id_col: t[id_col],
                         "content_key": pa.array(agg, pa.uint64())})

    return keys


def _exact_groups_distributed(sh, cfg: DedupConfig, id_col: str,
                              num_partitions: int = 64):
    """(member -> representative) over MULTI-member exact-content groups
    ONLY, via one slim distributed exchange: (content_key, id) rows
    hash-partition by key, each partition emits the rows of groups with
    >= 2 members (rep = min id).  Driver cost is O(exact-dup members) —
    the same class as the dup-cluster mapping the pipeline already
    broadcasts — instead of the driver strategy's O(corpus) pull.
    Singleton-content rows never leave the cluster."""
    import numpy as np

    keys = _content_keys_fn(cfg, id_col)

    def add_part(t: pa.Table) -> pa.Table:
        k = t["content_key"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__part", pa.array((k % np.uint64(num_partitions))
                               .astype(np.uint32), pa.uint32()))

    def mark(part: pa.Table) -> pa.Table:
        ids = np.asarray(part[id_col].to_pylist())
        ks = part["content_key"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ks))
        ks, ids = ks[order], ids[order]
        start = np.empty(len(ks), bool)
        if len(ks):
            start[0] = True
            start[1:] = ks[1:] != ks[:-1]
        gid = np.cumsum(start) - 1
        sizes = np.bincount(gid)
        multi = sizes[gid] >= 2
        rep = ids[np.searchsorted(gid, gid)]  # first (min-id) per group
        return pa.table({
            id_col: pa.array(ids[multi]),
            "rep": pa.array(rep[multi])})

    rows = sh.map_batches(keys, batch_format="pyarrow") \
        .map_batches(add_part, batch_format="pyarrow") \
        .groupby("__part").map_groups(mark, batch_format="pyarrow") \
        .take_all()
    return {r[id_col]: r["rep"] for r in rows}


def _exact_groups_from_sketched(sh, cfg: DedupConfig, id_col: str):
    """(member -> representative) map from a dataset that already carries
    the shingle list columns.  Driver-side at test scale (ids + 8-byte
    keys only); ``collapse_strategy="distributed"`` replaces the pull with
    :func:`_exact_groups_distributed`."""
    keys = _content_keys_fn(cfg, id_col)

    kt = pa.concat_tables(list(sh.map_batches(keys, batch_format="pyarrow")
                               .iter_batches(batch_format="pyarrow",
                                             batch_size=1 << 20)))
    rep_of_key: dict = {}
    ids = kt[id_col].to_pylist()
    cks = kt["content_key"].to_pylist()
    for i, k in zip(ids, cks):
        if k not in rep_of_key or i < rep_of_key[k]:
            rep_of_key[k] = i
    member_rep = {i: rep_of_key[k] for i, k in zip(ids, cks)}
    return member_rep


def near_dup_pipeline(ds, cfg: DedupConfig = DedupConfig(),
                      id_col: str = "image_id"):
    """Full pipeline.  Returns (clustered_dataset, edges_table, mapping).

    ``clustered_dataset`` = input ids + cluster_id + is_canonical;
    ``edges_table``       = accepted dup pairs (small, materialized);
    ``mapping``           = {id: cluster_root} for evaluation.
    """
    import ray

    if getattr(cfg, "scale_mode", "node") == "cluster":
        import dataclasses

        cfg = dataclasses.replace(
            cfg, scale_mode="node", join_strategy="hash",
            cluster_strategy="labelprop", materialize_sketches=False,
            collapse_strategy="distributed")

    if cfg.fuse_map is None:
        import dataclasses

        fuse = False
        if cfg.decode:
            # auto rule (BASELINE.md A/B): fuse once the corpus yields
            # enough 4096-row bundles to occupy the session (~1.5 bundles
            # per core); ds.count() is metadata-cheap on the parquet-read
            # inputs this pipeline takes at scale
            try:
                n_rows = ds.count()
            except Exception:
                n_rows = None
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            fuse = n_rows is not None and \
                n_rows / 4096 >= 1.5 * ncpu
        cfg = dataclasses.replace(cfg, fuse_map=fuse)

    member_rep = None
    if cfg.collapse_exact:
        import pyarrow.compute as pc

        # ONE decode+shingle+sketch chain shared between the exact-collapse
        # keys and the LSH stage (was two: _exact_groups shingled the raw
        # corpus separately).  Collapse keys now derive from the DECODED
        # phash — consistent with what LSH bands see.
        sk = sketched_dataset(ds, cfg, id_col)
        if cfg.materialize_sketches:
            sk = sk.materialize()
        if cfg.collapse_strategy == "distributed":
            # multi-member groups only; singletons are implicitly their
            # own representative (absent from the map)
            member_rep = _exact_groups_distributed(sk, cfg, id_col)
            drop_ref = ray.put(pa.array(
                sorted(m for m, r in member_rep.items() if m != r),
                pa.string()))

            def only_reps(t: pa.Table) -> pa.Table:
                key = ("xdrop", drop_ref.hex())
                d = _WORKER_CACHE.get(key)
                if d is None:
                    d = ray.get(drop_ref)
                    for k in [k for k in _WORKER_CACHE
                              if k[0] == "xdrop"]:
                        del _WORKER_CACHE[k]
                    _WORKER_CACHE[key] = d
                return t.filter(
                    pc.invert(pc.is_in(t[id_col], value_set=d)))
        else:
            member_rep = _exact_groups_from_sketched(sk, cfg, id_col)
            reps_ref = ray.put(pa.array(
                sorted(frozenset(member_rep.values())), pa.string()))

            def only_reps(t: pa.Table) -> pa.Table:
                key = ("reps", reps_ref.hex())
                r = _WORKER_CACHE.get(key)
                if r is None:
                    r = ray.get(reps_ref)
                    for k in [k for k in _WORKER_CACHE if k[0] == "reps"]:
                        del _WORKER_CACHE[k]
                    _WORKER_CACHE[key] = r
                return t.filter(pc.is_in(t[id_col], value_set=r))

        lsh_input = sk.map_batches(only_reps, batch_format="pyarrow")
        pairs = candidate_pairs(lsh_input, cfg, id_col=id_col,
                                pre_sketched=True)
    else:
        pairs = candidate_pairs(ds, cfg, id_col=id_col)
    edges = verified_edges(pairs, cfg)
    # the verified edge list is sparse — safe to materialize driver-side
    batches = [b for b in edges.iter_batches(batch_format="pyarrow",
                                             batch_size=65536)]
    if batches:
        edges_table = pa.concat_tables(batches)
        if cfg.pair_dedup == "edges" and "pair_key" in edges_table.column_names:
            keys = edges_table["pair_key"].to_numpy()
            _, first = np.unique(keys, return_index=True)
            edges_table = edges_table.take(pa.array(np.sort(first)))
        if cfg.cluster_strategy == "labelprop":
            import ray.data as rd

            from ..stages.cluster import cluster_edges_labelprop

            mapping = cluster_edges_labelprop(rd.from_arrow(
                edges_table.select(["id_a", "id_b"])))
        else:
            mapping = cluster_edges(edges_table["id_a"].to_pylist(),
                                    edges_table["id_b"].to_pylist())
    else:
        edges_table = pa.table({"id_a": pa.array([], pa.string()),
                                "id_b": pa.array([], pa.string())})
        mapping = {}
    if member_rep is not None:
        # expand the representative-space clusters through the exact groups,
        # then re-canonicalize roots to the min member of each full cluster
        from collections import Counter

        full = {m: mapping.get(rep, rep) for m, rep in member_rep.items()}
        # distributed collapse maps MULTI-member groups only: LSH-dup rows
        # with singleton content enter through the mapping itself (no-op
        # under the driver strategy, whose member_rep covers every row)
        for m, root in mapping.items():
            full.setdefault(m, root)
        root_min: dict = {}
        for member, root in full.items():
            if root not in root_min or member < root_min[root]:
                root_min[root] = member
        expanded = {m: root_min[r] for m, r in full.items()}
        sizes = Counter(expanded.values())
        mapping = {m: r for m, r in expanded.items() if sizes[r] > 1}
    mapping_ref = ray.put(mapping)

    def assign(batch: pa.Table) -> pa.Table:
        # stateless tasks; the broadcast map is fetched once per worker
        key = ("clmap", mapping_ref.hex())
        m = _WORKER_CACHE.get(key)
        if m is None:
            m = ray.get(mapping_ref)
            _WORKER_CACHE[key] = m
        ids = batch[id_col].to_pylist()
        cluster = [m.get(i, i) for i in ids]
        out = batch.append_column("cluster_id", pa.array(cluster, pa.string()))
        return out.append_column(
            "is_canonical",
            pa.array([c == i for c, i in zip(cluster, ids)], pa.bool_()))

    clustered = ds.select_columns([id_col]).map_batches(
        assign, batch_format="pyarrow")
    return clustered, edges_table, mapping


def representatives_by_quality(ds, mapping: dict, quality_col: str,
                               id_col: str = "image_id",
                               only_dup_clusters: bool = False):
    """Quality-aware canonical selection: instead of the min-id cluster root
    (``near_dup_pipeline``'s ``is_canonical``), keep the HIGHEST-quality
    member of each dup cluster (ties -> smallest id) — the variant a
    training-data pipeline actually wants to retain (e.g. ``quality_col`` =
    ``w * h`` keeps the highest-resolution copy of each duplicated image,
    a per-batch arithmetic column added upstream).

    ``ds`` needs ``id_col`` + ``quality_col``; ``mapping`` is the
    near_dup_pipeline output ({member -> cluster root}, broadcast once via
    ray.put and cached per worker).  Rows outside any dup cluster are their
    own cluster (trivially canonical); ``only_dup_clusters=True`` restricts
    the output to clusters with >= 2 members.  Selection is ONE distributed
    ``top_k_per_group`` (k=1) pass — no driver-side loop over clusters.

    Returns a Dataset with one row per cluster: (cluster_id, id_col,
    quality_col).
    """
    import ray

    from ..functions.relational import top_k_per_group

    mapping_ref = ray.put(mapping)

    def tag(batch: pa.Table) -> pa.Table:
        key = ("repmap", mapping_ref.hex())
        m = _WORKER_CACHE.get(key)
        if m is None:
            # evict prior mappings before caching (long-lived workers see
            # many mapping_refs across calls; unbounded growth otherwise)
            for k in [k for k in _WORKER_CACHE if k[0] == "repmap"]:
                del _WORKER_CACHE[k]
            m = ray.get(mapping_ref)
            _WORKER_CACHE[key] = m
        ids = batch[id_col].to_pylist()
        cluster = [m.get(i) for i in ids]
        if only_dup_clusters:
            keep = pa.array([c is not None for c in cluster])
            batch = batch.filter(keep)
            cluster = [c for c in cluster if c is not None]
        else:
            cluster = [c if c is not None else i
                       for c, i in zip(cluster, ids)]
        return pa.table({"cluster_id": pa.array(cluster, pa.string()),
                         id_col: batch[id_col],
                         quality_col: batch[quality_col]})

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return top_k_per_group(tagged, "cluster_id", quality_col, k=1,
                           tiebreak_col=id_col)


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


def leakage_safe_split(ds, mapping: dict, id_col: str = "image_id",
                       val_fraction: float = 0.05,
                       test_fraction: float = 0.05,
                       seed: int = 97):
    """Cluster-aware train/val/test split: the split key is the row's
    near-dup CLUSTER ROOT (the ``near_dup_pipeline`` mapping), so
    near-duplicates can NEVER straddle train and eval — the contamination
    channel a plain per-row split leaves open (a test item whose near-copy
    sits in train is a leaked label).  Rows outside any dup cluster key by
    their own id, making the split identical in distribution to
    ``relational.train_val_test_split`` for them.

    ``mapping`` ({member -> cluster root}) is broadcast once via
    ``ray.put`` and cached per worker; the split fraction is the
    counter-mode string hash of the root — deterministic across reruns
    and cluster sizes.  Appends a ``split`` column.
    """
    import ray

    from ..sketchlib.hashing import hash_str_u64

    mapping_ref = ray.put(mapping)

    def tag(batch: pa.Table) -> pa.Table:
        key = ("splitmap", mapping_ref.hex())
        m = _WORKER_CACHE.get(key)
        if m is None:
            for k in [k for k in _WORKER_CACHE if k[0] == "splitmap"]:
                del _WORKER_CACHE[k]
            m = ray.get(mapping_ref)
            _WORKER_CACHE[key] = m
        ids = batch[id_col].to_pylist()
        roots = [m.get(i, i) for i in ids]
        h = hash_str_u64(roots, seed=seed)
        f = h.astype(np.float64) / float(1 << 64)
        split = np.where(f < test_fraction, "test",
                         np.where(f < test_fraction + val_fraction,
                                  "val", "train"))
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")
