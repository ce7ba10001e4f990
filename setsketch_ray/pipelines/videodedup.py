"""Near-duplicate VIDEO detection: frame sampling -> per-frame perceptual
hash -> banded Hamming LSH over frame hashes -> frame-set overlap verify.

The video analogue of the image flagship, composed from the engine's real
container codecs (MJPEG/AVI + animated GIF, ``sources/video.py`` /
``sources/gif.py``).  Catches lossy re-encodes, container swaps and
temporal trims: a pair is a candidate if ANY sampled frame of A shares a
SimHash-style octet-pair band with any frame of B (pigeonhole guarantee
for frame pairs within Hamming 6, probabilistic above — and a clip only
needs one of its frames to collide), then verified by symmetric frame-set
containment: the fraction of each clip's frames whose nearest counterpart
is within ``max_hamming`` bits.

100 TB design (the rules this repo holds everywhere):

* clip ``bytes`` NEVER enter a shuffle — the wide exchange carries only
  ``(band_key, part, video_id)`` rows;
* frame hashes are tiny (8 x 8 B per clip) and attach to candidate pairs
  via the broadcast worker-cache pool (``pipelines/dedup._WORKER_CACHE``
  pattern); a beyond-memory catalog swaps that for
  ``functions.relational.lookup_join`` exactly as
  ``embedding_near_dup_pairs(join_strategy="hash")`` does;
* hot bands degrade to star+chain topology (id-sorted) instead of being
  dropped, as in ``functions/dedup.simhash_pairs``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.dedup import _OCTET_PAIRS, _hamming64
from ..sketchlib.hashing import hash_str_u64, mix2
from .dedup import _WORKER_CACHE

_BAND_SALT = 314159


def frame_phashes(ds, id_col: str = "video_id", bytes_col: str = "bytes",
                  fmt_col: str = "fmt", every_n_seconds: float = 0.5,
                  max_frames: int | None = None, concurrency=None):
    """Sample + decode + phash each clip's frames (actor-pool map stage).

    Returns a slim Dataset ``(id_col, frame_phashes: list<int64>)``;
    undecodable rows keep an empty list."""
    from ..sources.codec import decode_image, phash64_batch
    from ..stages.image import VideoFrameSampleStage

    if concurrency is None:
        import ray

        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)

    class _Stage:
        def __init__(self):
            self.sampler = VideoFrameSampleStage(every_n_seconds,
                                                 max_frames=max_frames)

        def __call__(self, batch: pa.Table) -> pa.Table:
            fmts = batch[fmt_col].to_pylist() \
                if fmt_col in batch.column_names \
                else [""] * batch.num_rows
            out = []
            for blob, fmt in zip(batch[bytes_col].to_pylist(), fmts):
                try:
                    fb, _ts = self.sampler._decode_frames(blob, fmt)
                    # frame blobs are JPEG slices / PNG re-encodes; the
                    # codec dispatch sniffs magic bytes
                    pix = np.stack([decode_image(b, "jpg") for b in fb])
                    out.append(phash64_batch(pix).astype(np.int64).tolist())
                except (NotImplementedError, ValueError):
                    out.append([])
            return pa.table({
                id_col: batch[id_col],
                "frame_phashes": pa.array(out, pa.list_(pa.int64())),
            })

    return ds.map_batches(_Stage, batch_format="pyarrow",
                          concurrency=concurrency)


def _overlap_fraction(ha: np.ndarray, hb: np.ndarray,
                      max_hamming: int) -> float:
    """Symmetric frame-set containment: min over both directions of the
    fraction of frames whose nearest counterpart is within max_hamming."""
    if len(ha) == 0 or len(hb) == 0:
        return 0.0
    d = _hamming64(ha[:, None].repeat(len(hb), 1).ravel().astype(np.uint64),
                   np.tile(hb, len(ha)).astype(np.uint64)) \
        .reshape(len(ha), len(hb))
    fa = float((d.min(axis=1) <= max_hamming).mean())
    fb = float((d.min(axis=0) <= max_hamming).mean())
    return min(fa, fb)


def near_dup_videos(ds, id_col: str = "video_id", bytes_col: str = "bytes",
                    fmt_col: str = "fmt", every_n_seconds: float = 0.5,
                    max_hamming: int = 8, min_overlap: float = 0.5,
                    num_partitions: int = 64, bucket_cap: int = 256,
                    concurrency=None, join_strategy: str = "broadcast"):
    """Near-dup clip pairs.  Returns (id_a, id_b, overlap_milli) with
    ``overlap_milli = floor(overlap * 1000 + 0.5) >= min_overlap * 1000``.

    ``join_strategy="broadcast"`` (default) attaches frame hashes to pairs
    from a broadcast worker-cache pool; ``"hash"`` runs two ``lookup_join``
    co-partition passes with the hashes packed as int64-LE binary — the
    beyond-broadcast-memory catalog path (bit-identical output, parity
    tested)."""
    import ray

    ph = frame_phashes(ds, id_col, bytes_col, fmt_col, every_n_seconds,
                       concurrency=concurrency)
    # materialized ONCE: consumed by both the band expansion and the
    # broadcast verify pool; ~70 B/clip — the slim representation, never
    # the clip bytes
    ph = ph.materialize()

    def expand(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        arr = t["frame_phashes"]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
            else arr
        # Arrow offsets + one values view — no Python list round trip
        offs = np.asarray(arr.offsets, dtype=np.int64)
        counts = np.diff(offs)
        if counts.sum() == 0:
            return pa.table({
                "band_key": pa.array([], pa.uint64()),
                "part": pa.array([], pa.uint32()),
                id_col: pa.array([], t.schema.field(id_col).type),
            })
        row_of = np.repeat(np.arange(len(counts)), counts)
        hv = np.asarray(arr.values, dtype=np.int64)[offs[0]:offs[-1]] \
            .astype(np.uint64)
        octets = [(hv >> np.uint64(8 * k)) & np.uint64(0xFF)
                  for k in range(8)]
        keys = np.empty((len(_OCTET_PAIRS), len(hv)), dtype=np.uint64)
        for b, (i, j) in enumerate(_OCTET_PAIRS):
            band = octets[i] | (octets[j] << np.uint64(8)) \
                | np.uint64(b << 24)
            keys[b] = mix2(band, _BAND_SALT)
        rows_t = np.tile(row_of, len(_OCTET_PAIRS))
        flat = keys.reshape(-1)
        # one (row, band_key) emission per clip even if several frames
        # share the band
        order = np.lexsort((flat, rows_t))
        flat, rows_t = flat[order], rows_t[order]
        keep = np.ones(len(flat), dtype=bool)
        keep[1:] = (flat[1:] != flat[:-1]) | (rows_t[1:] != rows_t[:-1])
        flat, rows_t = flat[keep], rows_t[keep]
        return pa.table({
            "band_key": pa.array(flat, pa.uint64()),
            "part": pa.array((flat % num_partitions).astype(np.uint32),
                             pa.uint32()),
            id_col: pa.array(ids[rows_t]),
        })

    bands = ph.map_batches(expand, batch_format="pyarrow")

    def emit(partition: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.string()),
                          "id_b": pa.array([], pa.string())})
        if partition.num_rows < 2:
            return empty
        order = pc.sort_indices(partition,
                                sort_keys=[("band_key", "ascending"),
                                           (id_col, "ascending")])
        t = partition.take(order)
        keys = t["band_key"].to_numpy()
        starts = np.concatenate([[0], np.flatnonzero(np.diff(keys)) + 1])
        sizes = np.diff(np.concatenate([starts, [len(keys)]]))
        ii, jj = [], []
        for s, n in zip(starts, sizes):
            if n < 2:
                continue
            if n <= bucket_cap:
                a, b = np.triu_indices(n, k=1)
            else:  # star + chain over id-sorted members (hot band)
                a = np.concatenate([np.zeros(n - 1, dtype=np.int64),
                                    np.arange(1, n - 1, dtype=np.int64)])
                b = np.concatenate([np.arange(1, n, dtype=np.int64),
                                    np.arange(2, n, dtype=np.int64)])
            ii.append(s + a)
            jj.append(s + b)
        if not ii:
            return empty
        i = np.concatenate(ii)
        j = np.concatenate(jj)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        keep = ids[i] != ids[j]
        return pa.table({
            "id_a": pa.array(np.minimum(ids[i][keep], ids[j][keep])),
            "id_b": pa.array(np.maximum(ids[i][keep], ids[j][keep])),
        })

    pairs = bands.groupby("part").map_groups(emit, batch_format="pyarrow")

    def add_pp(t: pa.Table) -> pa.Table:
        a = hash_str_u64(t["id_a"])   # straight off Arrow string buffers
        b = hash_str_u64(t["id_b"])
        return t.append_column("pp", pa.array(
            (mix2(a, b) % np.uint64(16)).astype(np.uint32), pa.uint32()))

    def dedup(partition: pa.Table) -> pa.Table:
        partition = partition.drop_columns(["pp"])
        if partition.num_rows == 0:
            return partition
        key = mix2(hash_str_u64(partition["id_a"]),
                   hash_str_u64(partition["id_b"]))
        _, first = np.unique(key, return_index=True)
        return partition.take(pa.array(np.sort(first)))

    pairs = pairs.map_batches(add_pp, batch_format="pyarrow") \
        .groupby("pp").map_groups(dedup, batch_format="pyarrow")

    if join_strategy == "hash":
        return _verify_overlap_hash(ph, pairs, id_col, max_hamming,
                                    min_overlap, num_partitions)
    if join_strategy != "broadcast":
        raise ValueError(f"unknown join_strategy {join_strategy!r}")

    # broadcast the slim (id -> frame hashes) table once; verify per pair
    lookup_ref = ray.put(pa.concat_tables(
        ph.iter_batches(batch_format="pyarrow", batch_size=1 << 20)))

    def verify(batch: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.string()),
                          "id_b": pa.array([], pa.string()),
                          "overlap_milli": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        ck = ("vid_phash", lookup_ref.hex())
        cached = _WORKER_CACHE.get(ck)
        if cached is None:
            table = ray.get(lookup_ref)
            keys = table[id_col].combine_chunks()
            vals = _list_col_u64(table["frame_phashes"])
            for k in [k for k in _WORKER_CACHE if k[0] == "vid_phash"]:
                del _WORKER_CACHE[k]
            cached = (keys, vals)
            _WORKER_CACHE[ck] = cached
        keys, vals = cached
        ia = pc.index_in(batch["id_a"], value_set=keys).to_numpy(
            zero_copy_only=False)
        ib = pc.index_in(batch["id_b"], value_set=keys).to_numpy(
            zero_copy_only=False)
        scores = np.zeros(batch.num_rows, dtype=np.int64)
        for r, (xa, xb) in enumerate(zip(ia, ib)):
            if xa is None or xb is None:
                continue
            f = _overlap_fraction(vals[int(xa)], vals[int(xb)], max_hamming)
            scores[r] = int(np.floor(f * 1000 + 0.5))
        keep = scores >= int(np.floor(min_overlap * 1000 + 0.5))
        kept = batch.filter(pa.array(keep))
        return pa.table({
            "id_a": kept["id_a"],
            "id_b": kept["id_b"],
            "overlap_milli": pa.array(scores[keep], pa.int64()),
        })

    return pairs.map_batches(verify, batch_format="pyarrow")


def _list_col_u64(col) -> list:
    """list<int64> column -> per-row uint64 views over ONE flat buffer
    (Arrow list offsets, no per-element as_py)."""
    lst = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]          # sliced arrays carry absolute offsets
    flat = lst.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    return [flat[offs[i]:offs[i + 1]] for i in range(len(lst))]


def _unpack_binary_u64(col) -> list:
    """Binary column of packed int64-LE hash sets -> per-row uint64 views
    over the column's single data buffer (offsets arithmetic, no as_py).
    Every value is a whole number of int64s, so all byte offsets are
    multiples of 8 and the flat buffer reads as one "<i8" vector."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.frombuffer(arr.buffers()[1], np.int32,
                         count=len(arr) + 1,
                         offset=arr.offset * 4).astype(np.int64)
    base = offs[0]
    flat = np.frombuffer(arr.buffers()[2], "<i8",
                         count=int(offs[-1] - base) // 8,
                         offset=int(base)).astype(np.uint64)
    e = (offs - base) // 8
    return [flat[e[i]:e[i + 1]] for i in range(len(arr))]


def _verify_overlap_hash(ph, pairs, id_col: str, max_hamming: int,
                         min_overlap: float, num_partitions: int):
    """Beyond-broadcast verify: frame-hash sets attach to both pair sides
    via two lookup_join co-partition passes (packed int64-LE binary), then
    the same symmetric containment score as the broadcast path."""
    from ..functions.relational import lookup_join

    def pack(suffix: str):
        def fn(t: pa.Table) -> pa.Table:
            # the packed-binary layout IS the list layout: data = the flat
            # int64 values as LE bytes, offsets = list offsets * 8
            lst = t["frame_phashes"].combine_chunks() \
                if isinstance(t["frame_phashes"], pa.ChunkedArray) \
                else t["frame_phashes"]
            loffs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            loffs = loffs - loffs[0]
            flat = lst.flatten().to_numpy(zero_copy_only=False) \
                .astype("<i8")
            bin_arr = pa.Array.from_buffers(
                pa.binary(), len(lst),
                [None, pa.py_buffer((loffs * 8).astype(np.int32).tobytes()),
                 pa.py_buffer(flat.tobytes())])
            return pa.table({id_col: t[id_col], f"ph{suffix}": bin_arr})
        return fn

    pairs_schema = pa.schema([("id_a", pa.string()), ("id_b", pa.string())])
    right_a = ph.map_batches(pack("_a"), batch_format="pyarrow")
    right_b = ph.map_batches(pack("_b"), batch_format="pyarrow")
    npart = max(num_partitions // 4, 8)
    pairs = pairs.materialize()  # sparse edge list; consumed by two joins
    out = lookup_join(pairs, right_a, "id_a", id_col,
                      num_partitions=npart, left_schema=pairs_schema,
                      right_schema=pa.schema([(id_col, pa.string()),
                                              ("ph_a", pa.binary())]))
    mid = pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                     ("ph_a", pa.binary())])
    out = lookup_join(out, right_b, "id_b", id_col,
                      num_partitions=npart, left_schema=mid,
                      right_schema=pa.schema([(id_col, pa.string()),
                                              ("ph_b", pa.binary())]))

    def verify(batch: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.string()),
                          "id_b": pa.array([], pa.string()),
                          "overlap_milli": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        ha = _unpack_binary_u64(batch["ph_a"])
        hb = _unpack_binary_u64(batch["ph_b"])
        scores = np.fromiter(
            (int(np.floor(_overlap_fraction(a, b, max_hamming) * 1000
                          + 0.5)) for a, b in zip(ha, hb)),
            np.int64, count=batch.num_rows)
        keep = scores >= int(np.floor(min_overlap * 1000 + 0.5))
        kept = batch.filter(pa.array(keep))
        return pa.table({
            "id_a": kept["id_a"],
            "id_b": kept["id_b"],
            "overlap_milli": pa.array(scores[keep], pa.int64()),
        })

    return out.map_batches(verify, batch_format="pyarrow")
