"""Near-duplicate AUDIO detection: decode -> spectral fingerprint ->
frequency-cell LSH -> sparse-spectrum cosine verify.

The audio member of the modality family (near_dup_docs / near_dup_images /
near_dup_videos), composed from the engine's real audio codecs (WAV
PCM/G.711/ADPCM via ``sources/audio.py``, FLAC via ``sources/flac.py``,
FLAC-in-Ogg via ``sources/containers.py``).  Catches lossy re-encodes,
codec/container swaps and head trims.

Fingerprint (one per clip, computed on a FIXED 8192-bin rfft grid so
different clip lengths — trims — land on a common frequency axis):

* ``f1_milli`` — the dominant spectral peak, parabolic-interpolated
  (measured stability across G.711/ADPCM re-encodes and 50 ms trims:
  |Δf| <= 0.01 Hz on the synthetic corpus);
* a top-``64`` sparse magnitude spectrum (bin indices + magnitudes) —
  the verify payload, ~0.5 KB/clip.

Candidate generation uses the two-shifted-grid trick over the peak
frequency: cells of ``cell_hz`` in two grids offset by ``cell_hz/2``
guarantee that any two clips whose peaks differ by <= ``cell_hz/2`` share
at least one cell — EXACT recall for the planted tolerance, no
probabilistic banding needed for a 1-D key.  Verification scores sparse
spectral cosine (scale-invariant: amplitude/codec gain drops out) against
``min_cosine`` (measured gap on the corpus: true pairs >= 0.991, false
pairs <= 0.845).

100 TB shape — the repo's standing rules: clip bytes never shuffle (the
exchange carries only (band_key, part, id)); fingerprints attach to the
deduped candidate pairs via the broadcast worker-cache pool; hot cells
degrade to star+chain.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketchlib.hashing import hash_str_u64, mix2
from .dedup import _WORKER_CACHE

_NFFT = 8192
_TOPK = 64
_BAND_SALT = 2718281


def decode_audio_any(blob: bytes):
    """WAV (PCM/float/G.711/IMA-ADPCM) / FLAC / Ogg-FLAC -> (float64 mono
    signal, rate) — the same real-codec dispatch as
    ``stages.image.AudioFeatureStage``."""
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        from ..sources.audio import decode_wav

        sig, rate = decode_wav(blob)
        return np.asarray(sig, np.float64), rate
    if blob[:4] == b"fLaC":
        from ..sources.flac import decode_flac

        pcm, rate, _bps = decode_flac(blob)
        return pcm.astype(np.float64).mean(axis=1), rate
    if blob[:4] == b"OggS":
        from ..sources.containers import decode_ogg_flac

        pcm, rate, _bps = decode_ogg_flac(blob)
        return pcm.astype(np.float64).mean(axis=1), rate
    raise NotImplementedError(
        f"audio container {blob[:4]!r}: WAV/FLAC/Ogg-FLAC decode here")


def _fingerprint(sig: np.ndarray, rate: int):
    """(peak_freq_hz, top-k bins int32, top-k magnitudes float32)."""
    if len(sig) == 0:
        return 0.0, np.zeros(0, np.int32), np.zeros(0, np.float32)
    w = np.hanning(len(sig))
    mag = np.abs(np.fft.rfft(sig * w, _NFFT))
    k = int(np.argmax(mag))
    d = 0.0
    if 1 <= k < len(mag) - 1:
        den = mag[k - 1] - 2 * mag[k] + mag[k + 1]
        if den != 0.0:
            d = 0.5 * (mag[k - 1] - mag[k + 1]) / den
    f1 = (k + d) * rate / _NFFT
    top = np.sort(np.argpartition(mag, -_TOPK)[-_TOPK:])
    return f1, top.astype(np.int32), mag[top].astype(np.float32)


def audio_fingerprints(ds, id_col: str = "audio_id",
                       bytes_col: str = "bytes", concurrency=None):
    """Decode + fingerprint each clip (actor-pool map stage).  Returns a
    slim Dataset (id, f1_milli, spec_bins, spec_mags); undecodable rows
    keep empty spectra (they can never verify)."""
    if concurrency is None:
        import ray

        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)

    class _Stage:
        def __call__(self, batch: pa.Table) -> pa.Table:
            f1s, bins, mags = [], [], []
            for blob in batch[bytes_col].to_pylist():
                try:
                    sig, rate = decode_audio_any(blob)
                    f1, b, m = _fingerprint(sig, rate)
                except (NotImplementedError, ValueError):
                    f1, b, m = 0.0, np.zeros(0, np.int32), \
                        np.zeros(0, np.float32)
                f1s.append(int(np.floor(f1 * 1000 + 0.5)))
                bins.append(b)
                mags.append(m)
            return pa.table({
                id_col: batch[id_col],
                "f1_milli": pa.array(f1s, pa.int64()),
                "spec_bins": pa.array([b.tolist() for b in bins],
                                      pa.list_(pa.int32())),
                "spec_mags": pa.array([m.tolist() for m in mags],
                                      pa.list_(pa.float32())),
            })

    return ds.map_batches(_Stage, batch_format="pyarrow",
                          concurrency=concurrency)


def _sparse_cosine(ba, ma, bb, mb) -> float:
    if len(ba) == 0 or len(bb) == 0:
        return 0.0
    common, ia, ib = np.intersect1d(ba, bb, assume_unique=True,
                                    return_indices=True)
    if len(common) == 0:
        return 0.0
    num = float(np.dot(ma[ia].astype(np.float64),
                       mb[ib].astype(np.float64)))
    return num / (float(np.linalg.norm(ma.astype(np.float64))) *
                  float(np.linalg.norm(mb.astype(np.float64))))


def near_dup_audio(ds, id_col: str = "audio_id", bytes_col: str = "bytes",
                   cell_hz: float = 4.0, min_cosine: float = 0.92,
                   num_partitions: int = 32, bucket_cap: int = 256,
                   concurrency=None, join_strategy: str = "broadcast"):
    """Near-dup clip pairs (id_a, id_b, cosine_milli >= min_cosine*1000).

    Exact-recall candidate generation for peak drift <= ``cell_hz/2``
    (two shifted grids), sparse spectral cosine verify via the broadcast
    worker-cache pool.  ``join_strategy="hash"`` swaps the broadcast for
    two ``lookup_join`` co-partition passes (fingerprints packed as
    binary) — the beyond-broadcast-memory catalog path, bit-identical
    output (parity tested)."""
    import ray

    fp = audio_fingerprints(ds, id_col, bytes_col,
                            concurrency=concurrency)
    fp = fp.materialize()  # slim (~0.6 KB/clip); feeds bands AND verify

    cell_milli = int(cell_hz * 1000)

    def expand(t: pa.Table) -> pa.Table:
        f1 = t["f1_milli"].to_numpy(zero_copy_only=False)
        ids = t[id_col]
        keys, rows = [], []
        for g, shift in enumerate((0, cell_milli // 2)):
            cell = ((f1 + shift) // cell_milli).astype(np.uint64)
            keys.append(mix2(cell | (np.uint64(g) << np.uint64(60)),
                             _BAND_SALT))
            rows.append(np.arange(len(f1)))
        flat = np.concatenate(keys)
        rows_t = np.concatenate(rows)
        return pa.table({
            "band_key": pa.array(flat, pa.uint64()),
            "part": pa.array((flat % num_partitions).astype(np.uint32),
                             pa.uint32()),
            id_col: ids.take(pa.array(rows_t, pa.int64())),
        })

    bands = fp.map_batches(expand, batch_format="pyarrow")

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
            else:  # star + chain over id-sorted members (hot cell)
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
        a = hash_str_u64(t["id_a"])
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
        return _verify_cosine_hash(fp, pairs, id_col, min_cosine,
                                   num_partitions)
    if join_strategy != "broadcast":
        raise ValueError(f"unknown join_strategy {join_strategy!r}")

    lookup_ref = ray.put(pa.concat_tables(
        fp.iter_batches(batch_format="pyarrow", batch_size=1 << 20)))

    def verify(batch: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.string()),
                          "id_b": pa.array([], pa.string()),
                          "cosine_milli": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        ck = ("aud_fp", lookup_ref.hex())
        cached = _WORKER_CACHE.get(ck)
        if cached is None:
            table = ray.get(lookup_ref)
            keys = table[id_col].combine_chunks()
            sb = table["spec_bins"].combine_chunks()
            sm = table["spec_mags"].combine_chunks()
            bo = np.asarray(sb.offsets, np.int64)
            bins_flat = np.asarray(sb.values, np.int32)
            mags_flat = np.asarray(sm.values, np.float32)
            vals = [(bins_flat[bo[r]:bo[r + 1]], mags_flat[bo[r]:bo[r + 1]])
                    for r in range(len(keys))]
            for k in [k for k in _WORKER_CACHE if k[0] == "aud_fp"]:
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
            ba, ma = vals[int(xa)]
            bb, mb = vals[int(xb)]
            c = _sparse_cosine(ba, ma, bb, mb)
            scores[r] = int(np.floor(c * 1000 + 0.5))
        keep = scores >= int(np.floor(min_cosine * 1000 + 0.5))
        kept = batch.filter(pa.array(keep))
        return pa.table({
            "id_a": kept["id_a"],
            "id_b": kept["id_b"],
            "cosine_milli": pa.array(scores[keep], pa.int64()),
        })

    return pairs.map_batches(verify, batch_format="pyarrow")


def _pack_fp(t: pa.Table, id_col: str, suffix: str) -> pa.Table:
    """(bins int32[], mags float32[]) -> one binary column per side:
    n * (4B bin + 4B mag) little-endian pairs."""
    sb = t["spec_bins"].combine_chunks() if \
        isinstance(t["spec_bins"], pa.ChunkedArray) else t["spec_bins"]
    sm = t["spec_mags"].combine_chunks() if \
        isinstance(t["spec_mags"], pa.ChunkedArray) else t["spec_mags"]
    bo = np.asarray(sb.offsets, np.int64)
    bins_flat = np.asarray(sb.values, np.int32)
    mags_flat = np.asarray(sm.values, np.float32)
    parts = []
    for r in range(len(sb)):
        b = bins_flat[bo[r]:bo[r + 1]].astype("<i4").tobytes()
        m = mags_flat[bo[r]:bo[r + 1]].astype("<f4").tobytes()
        parts.append(b + m)
    offs = np.zeros(len(parts) + 1, np.int32)
    np.cumsum([len(p) for p in parts], out=offs[1:])
    bin_arr = pa.Array.from_buffers(
        pa.binary(), len(parts),
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(b"".join(parts))])
    return pa.table({id_col: t[id_col], f"fp{suffix}": bin_arr})


def _unpack_fp(blob: bytes):
    half = len(blob) // 2
    return (np.frombuffer(blob[:half], "<i4"),
            np.frombuffer(blob[half:], "<f4"))


def _verify_cosine_hash(fp, pairs, id_col: str, min_cosine: float,
                        num_partitions: int):
    """Beyond-broadcast verify: fingerprints attach to both pair sides via
    two lookup_join co-partition passes, then the same sparse-cosine score
    as the broadcast path (bit-identical output)."""
    from ..functions.relational import lookup_join

    pairs_schema = pa.schema([("id_a", pa.string()), ("id_b", pa.string())])
    right_a = fp.map_batches(lambda t: _pack_fp(t, id_col, "_a"),
                             batch_format="pyarrow")
    right_b = fp.map_batches(lambda t: _pack_fp(t, id_col, "_b"),
                             batch_format="pyarrow")
    npart = max(num_partitions // 4, 8)
    pairs = pairs.materialize()  # sparse edge list; consumed by two joins
    out = lookup_join(pairs, right_a, "id_a", id_col,
                      num_partitions=npart, left_schema=pairs_schema,
                      right_schema=pa.schema([(id_col, pa.string()),
                                              ("fp_a", pa.binary())]))
    mid = pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                     ("fp_a", pa.binary())])
    out = lookup_join(out, right_b, "id_b", id_col,
                      num_partitions=npart, left_schema=mid,
                      right_schema=pa.schema([(id_col, pa.string()),
                                              ("fp_b", pa.binary())]))

    def verify(batch: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.string()),
                          "id_b": pa.array([], pa.string()),
                          "cosine_milli": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        scores = np.zeros(batch.num_rows, np.int64)
        for r, (ba_, bb_) in enumerate(zip(batch["fp_a"].to_pylist(),
                                           batch["fp_b"].to_pylist())):
            if ba_ is None or bb_ is None:
                continue
            ba, ma = _unpack_fp(ba_)
            bb, mb = _unpack_fp(bb_)
            c = _sparse_cosine(ba, ma, bb, mb)
            scores[r] = int(np.floor(c * 1000 + 0.5))
        keep = scores >= int(np.floor(min_cosine * 1000 + 0.5))
        kept = batch.filter(pa.array(keep))
        return pa.table({
            "id_a": kept["id_a"],
            "id_b": kept["id_b"],
            "cosine_milli": pa.array(scores[keep], pa.int64()),
        })

    return out.map_batches(verify, batch_format="pyarrow")
