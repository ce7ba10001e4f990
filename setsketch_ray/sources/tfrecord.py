"""TFRecord / tf.Example source+sink (pure NumPy+Python — no tensorflow
or crc32c package in this environment).

TFRecord is the canonical TensorFlow training-data container; tf.Example
is its standard record payload.  Both are public formats: the record
framing is ``<len:uint64le><masked_crc32c(len)><data><masked_crc32c(data)>``
with CRC32C (Castagnoli) masked as ``((c >> 15) | (c << 17)) + 0xa282ead8``
(TensorFlow ``tensorflow/core/lib/hash/crc32c.h``), and tf.Example is the
protobuf ``Example{ Features{ map<string, Feature> } }`` with ``Feature``
one of BytesList / FloatList / Int64List
(``tensorflow/core/example/example.proto`` — wire format per the protobuf
encoding spec).

Implementation notes:

- **CRC32C is vectorized ACROSS records** (the ``hash_str_u64`` byte-matrix
  walk: the inner loop is ``max_record_len`` NumPy passes over all records
  of a file, not ``total_bytes`` Python ops) — both on write and on read
  (every record's two checksums are verified; corrupt frames raise).
- tf.Example encode/decode is a hand-rolled wire-format walk over the
  small fixed schema (the ``google.protobuf`` runtime is present but the
  TF message descriptors are not).  Scope: int64 / float32 / string /
  binary scalars and ``list<int64>`` / ``list<float32>`` columns; float64
  is REFUSED loudly (FloatList is float32 — a silent cast would betray
  the round-trip contract).
- Writes are bit-reproducible (sorted feature keys, deterministic shard
  assignment + in-shard key sort, atomic rename — the ORC/Avro layout).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------------ crc32c
_POLY = np.uint32(0x82F63B78)


def _make_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, (t >> np.uint32(1)) ^ _POLY, t >> np.uint32(1))
    return t


_TABLE = _make_table()
_MASK_DELTA = np.uint32(0xA282EAD8)


def crc32c_many(blobs: list[bytes]) -> np.ndarray:
    """CRC32C of every blob, vectorized across blobs (column-wise byte
    walk; the inner loop runs max_len times over all rows at once)."""
    n = len(blobs)
    if n == 0:
        return np.empty(0, np.uint32)
    lens = np.fromiter((len(b) for b in blobs), np.int64, n)
    crc = np.full(n, 0xFFFFFFFF, np.uint32)
    max_len = int(lens.max()) if n else 0
    if max_len:
        rows_per_chunk = max(1, (1 << 22) // max(max_len, 1))
        for lo in range(0, n, rows_per_chunk):
            hi = min(lo + rows_per_chunk, n)
            L = lens[lo:hi]
            ml = int(L.max())
            if ml == 0:
                continue
            m = hi - lo
            mat = np.zeros((m, ml), np.uint8)
            mask2d = np.arange(ml) < L[:, None]
            mat[mask2d] = np.frombuffer(b"".join(blobs[lo:hi]), np.uint8)
            c = crc[lo:hi]
            for j in range(ml):
                active = j < L
                nc = _TABLE[(c ^ mat[:, j]) & np.uint32(0xFF)] \
                    ^ (c >> np.uint32(8))
                c = np.where(active, nc, c)
            crc[lo:hi] = c
    return crc ^ np.uint32(0xFFFFFFFF)


def masked_crc32c_many(blobs: list[bytes]) -> np.ndarray:
    c = crc32c_many(blobs)
    with np.errstate(over="ignore"):
        return ((c >> np.uint32(15)) | (c << np.uint32(17))) + _MASK_DELTA


# ------------------------------------------------------- protobuf primitives
def _varint(v: int) -> bytes:
    out = bytearray()
    v &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(tag: int, payload: bytes) -> bytes:
    """LEN-delimited field."""
    return _varint((tag << 3) | 2) + _varint(len(payload)) + payload


def _feature_bytes(vals: list[bytes]) -> bytes:
    inner = b"".join(_ld(1, v) for v in vals)        # BytesList.value
    return _ld(1, inner)                             # Feature.bytes_list


def _feature_floats(vals: np.ndarray) -> bytes:
    inner = _ld(1, vals.astype("<f4").tobytes())     # FloatList.value packed
    return _ld(2, inner)                             # Feature.float_list


def _feature_ints(vals) -> bytes:
    inner = _ld(1, b"".join(_varint(int(v)) for v in vals))
    return _ld(3, inner)                             # Feature.int64_list


def encode_examples(t: pa.Table) -> list[bytes]:
    """One tf.Example blob per row of ``t`` (sorted feature keys)."""
    cols = []
    for name in sorted(t.column_names):
        f = t.schema.field(name)
        arr = t[name]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
            else arr
        ty = f.type
        if pa.types.is_float64(ty) or (
                pa.types.is_list(ty)
                and pa.types.is_float64(ty.value_type)):
            raise NotImplementedError(
                f"tf.Example FloatList is float32; cast column {name!r} "
                "explicitly instead of losing precision silently")
        cols.append((name.encode(), ty, arr))
    out = []
    for i in range(t.num_rows):
        feats = bytearray()
        for key, ty, arr in cols:
            v = arr[i].as_py()
            if v is None:
                raise ValueError("tf.Example has no null encoding "
                                 f"(column {key!r})")
            if pa.types.is_int64(ty) or pa.types.is_int32(ty):
                feat = _feature_ints([v])
            elif pa.types.is_float32(ty):
                feat = _feature_floats(np.array([v]))
            elif pa.types.is_string(ty):
                feat = _feature_bytes([v.encode("utf-8")])
            elif pa.types.is_binary(ty):
                feat = _feature_bytes([v])
            elif pa.types.is_list(ty) and pa.types.is_int64(ty.value_type):
                feat = _feature_ints(v)
            elif pa.types.is_list(ty) and \
                    pa.types.is_float32(ty.value_type):
                feat = _feature_floats(np.asarray(v, np.float32))
            else:
                raise NotImplementedError(
                    f"tf.Example: unsupported Arrow type {ty}")
            entry = _ld(1, key) + _ld(2, bytes(feat))  # map key, value
            feats += _ld(1, entry)                     # Features.feature
        out.append(_ld(1, bytes(feats)))               # Example.features
    return out


class _Walk:
    __slots__ = ("b", "pos", "end")

    def __init__(self, b, pos=0, end=None):
        self.b = b
        self.pos = pos
        self.end = len(b) if end is None else end

    def varint(self) -> int:
        acc = 0
        shift = 0
        while True:
            byte = self.b[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                return acc
            shift += 7

    def skip(self, wire: int) -> None:
        if wire == 0:
            self.varint()
        elif wire == 2:
            self.pos += self.varint()
        elif wire == 5:
            self.pos += 4
        elif wire == 1:
            self.pos += 8
        else:
            raise ValueError(f"tfrecord: wire type {wire}")


def decode_example(blob: bytes) -> dict:
    """tf.Example blob -> {name: list[int] | list[float] | list[bytes]}."""
    out: dict[str, list] = {}
    w = _Walk(blob)
    while w.pos < w.end:
        tag = w.varint()
        if tag >> 3 != 1:
            w.skip(tag & 7)
            continue
        fend = w.pos + w.varint()       # Features
        while w.pos < fend:
            t2 = w.varint()
            if t2 >> 3 != 1:
                w.skip(t2 & 7)
                continue
            eend = w.pos + w.varint()   # map entry
            key = None
            vals: list = []
            while w.pos < eend:
                t3 = w.varint()
                if t3 >> 3 == 1:        # key
                    ln = w.varint()
                    key = w.b[w.pos:w.pos + ln].decode("utf-8")
                    w.pos += ln
                elif t3 >> 3 == 2:      # Feature
                    vend = w.pos + w.varint()
                    while w.pos < vend:
                        t4 = w.varint()
                        kind = t4 >> 3
                        lend = w.pos + w.varint()
                        while w.pos < lend:
                            t5 = w.varint()
                            if kind == 1:          # BytesList
                                ln = w.varint()
                                vals.append(
                                    bytes(w.b[w.pos:w.pos + ln]))
                                w.pos += ln
                            elif kind == 2:        # FloatList
                                if t5 & 7 == 2:    # packed
                                    ln = w.varint()
                                    vals.extend(np.frombuffer(
                                        w.b, "<f4", ln // 4,
                                        w.pos).tolist())
                                    w.pos += ln
                                else:
                                    vals.append(struct.unpack_from(
                                        "<f", w.b, w.pos)[0])
                                    w.pos += 4
                            elif kind == 3:        # Int64List
                                if t5 & 7 == 2:    # packed
                                    ln = w.varint()
                                    stop = w.pos + ln
                                    while w.pos < stop:
                                        u = w.varint()
                                        vals.append(
                                            u - (1 << 64)
                                            if u >= (1 << 63) else u)
                                else:
                                    u = w.varint()
                                    vals.append(u - (1 << 64)
                                                if u >= (1 << 63) else u)
                            else:
                                raise NotImplementedError(
                                    f"Feature kind {kind}")
                else:
                    w.skip(t3 & 7)
            out[key] = vals
    return out


# -------------------------------------------------------------- file layer
def write_tfrecord_file(t: pa.Table, path: str) -> int:
    """Write one TFRecord file (one tf.Example per row); returns bytes."""
    records = encode_examples(t)
    len_blobs = [struct.pack("<Q", len(r)) for r in records]
    len_crcs = masked_crc32c_many(len_blobs)
    data_crcs = masked_crc32c_many(records)
    parts = []
    for lb, lc, r, dc in zip(len_blobs, len_crcs, records, data_crcs):
        parts.append(lb)
        parts.append(struct.pack("<I", int(lc)))
        parts.append(r)
        parts.append(struct.pack("<I", int(dc)))
    blob = b"".join(parts)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return len(blob)


def read_tfrecord_blobs(blob: bytes) -> list[bytes]:
    """Split a TFRecord file into record payloads, verifying BOTH masked
    CRC32C checksums of every record (vectorized across records)."""
    recs: list[bytes] = []
    len_blobs: list[bytes] = []
    len_crcs: list[int] = []
    data_crcs: list[int] = []
    pos = 0
    n = len(blob)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("tfrecord: truncated header")
        (ln,) = struct.unpack_from("<Q", blob, pos)
        len_blobs.append(blob[pos:pos + 8])
        (lc,) = struct.unpack_from("<I", blob, pos + 8)
        len_crcs.append(lc)
        pos += 12
        if pos + ln + 4 > n:
            raise ValueError("tfrecord: truncated record")
        recs.append(blob[pos:pos + ln])
        (dc,) = struct.unpack_from("<I", blob, pos + ln)
        data_crcs.append(dc)
        pos += ln + 4
    if not np.array_equal(masked_crc32c_many(len_blobs),
                          np.array(len_crcs, np.uint32)):
        raise ValueError("tfrecord: length-crc mismatch")
    if not np.array_equal(masked_crc32c_many(recs),
                          np.array(data_crcs, np.uint32)):
        raise ValueError("tfrecord: data-crc mismatch")
    return recs


def examples_to_table(blobs: list[bytes],
                      schema: pa.Schema | None = None) -> pa.Table:
    """Decode tf.Example blobs into a Table.  ``schema`` (recommended —
    TFRecord carries none) coerces types: string vs binary, scalar vs
    list.  Without it: single-element Int64List -> int64, FloatList ->
    float32, BytesList -> binary; multi-element lists stay lists."""
    rows = [decode_example(b) for b in blobs]
    names = sorted({k for r in rows for k in r}) if schema is None \
        else [f.name for f in schema]
    cols = {}
    for name in names:
        vals = [r.get(name) for r in rows]
        if schema is not None:
            ty = schema.field(name).type
            if pa.types.is_string(ty):
                cols[name] = pa.array(
                    [v[0].decode("utf-8") for v in vals], ty)
            elif pa.types.is_binary(ty):
                cols[name] = pa.array([v[0] for v in vals], ty)
            elif pa.types.is_list(ty):
                cols[name] = pa.array(vals, ty)
            else:
                cols[name] = pa.array([v[0] for v in vals], ty)
            continue
        scalar = all(v is not None and len(v) == 1 for v in vals)
        sample = next(v[0] for v in vals if v)
        if isinstance(sample, bytes):
            cols[name] = pa.array([v[0] if scalar else v for v in vals])
        elif isinstance(sample, float):
            ty = pa.float32() if scalar else pa.list_(pa.float32())
            cols[name] = pa.array(
                [v[0] for v in vals] if scalar else vals, ty)
        else:
            ty = pa.int64() if scalar else pa.list_(pa.int64())
            cols[name] = pa.array(
                [v[0] for v in vals] if scalar else vals, ty)
    return pa.table(cols)


# ---------------------------------------------------------------- Ray glue
def read_tfrecord_files(path: str, schema: pa.Schema | None = None,
                        override_num_blocks: "int | None" = None):
    """Read ``.tfrecord`` file(s) as a Ray Dataset — one file per task,
    both checksums of every record verified."""
    import ray.data as rd

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks

    def parse(t: pa.Table) -> pa.Table:
        tables = [examples_to_table(read_tfrecord_blobs(blob), schema)
                  for blob in t["bytes"].to_pylist()]
        return pa.concat_tables(tables, promote_options="default")

    blobs = rd.read_binary_files(path, file_extensions=["tfrecord"],
                                 **kwargs)
    return blobs.map_batches(parse, batch_format="pyarrow",
                             batch_size=None)


def write_tfrecord_shards(ds, out_dir: str, key_col: str,
                          num_shards: int = 16) -> list:
    """Write a Dataset as deterministic TFRecord shards (counter-mode
    key-hash assignment, in-shard key sort, one writer task per shard,
    atomic rename — the ORC/Avro layout)."""
    from ..sketchlib.hashing import hash_str_u64

    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        keys = [str(v) for v in t[key_col].to_pylist()]
        h = hash_str_u64(keys, seed=53)
        return t.append_column("__shard", pa.array(
            (h % np.uint64(num_shards)).astype(np.int64), pa.int64()))

    def write_shard(t: pa.Table) -> pa.Table:
        shard_id = int(t["__shard"][0].as_py())
        t = t.drop_columns(["__shard"])
        t = t.take(pc.sort_indices(t, sort_keys=[(key_col, "ascending")]))
        path = os.path.join(out_dir, f"part-{shard_id:05d}.tfrecord")
        n = write_tfrecord_file(t.combine_chunks(), path)
        return pa.table({"shard": pa.array([os.path.basename(path)],
                                           pa.string()),
                         "n_rows": pa.array([t.num_rows], pa.int64()),
                         "n_bytes": pa.array([n], pa.int64())})

    manifest = ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("__shard").map_groups(write_shard, batch_format="pyarrow")
    return sorted(manifest.take_all(), key=lambda r: r["shard"])
