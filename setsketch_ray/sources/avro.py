"""Apache Avro Object Container File source/sink (pure Python, no
third-party Avro library in this environment).

Avro is the remaining mainstream ROW-oriented interchange format beside
the columnar ones this engine already reads (parquet / ORC / Arrow IPC)
and the streaming/archival ones (WebDataset tar, WARC, CSV, JSONL) —
Kafka pipelines and Sqoop/warehouse exports commonly land as ``*.avro``
container files.  Implemented from the public specification
(https://avro.apache.org/docs/1.11.1/specification/): magic ``Obj\\x01``,
file-metadata map (``avro.schema`` JSON + ``avro.codec``), 16-byte sync
marker, then blocks of ``<count:long><size:long><payload><sync>`` with
zigzag-varint longs; ``deflate`` codec is raw zlib (wbits=-15).

Scope (loud errors beyond it): flat records of primitives — boolean /
int / long / float / double / string / bytes — each either plain or the
canonical nullable union ``["null", T]``, plus ``timestamp-micros`` as a
long logicalType (Arrow ``timestamp[us]`` round-trips).  Decode is a
per-file Python walk (varint streams resist NumPy vectorization the way
this repo's other entropy codecs do — same honest floor as JPEG/GIF;
one file per read task amortizes it across the pool).  Writes are
bit-reproducible: pinned metadata order, sync marker = counter-mode hash
of the shard name (the WARC convention), rows sorted by key within a
shard.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MAGIC = b"Obj\x01"

_ARROW_TO_AVRO = [
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_int32, "int"),
    (pa.types.is_int64, "long"),
    (pa.types.is_float32, "float"),
    (pa.types.is_float64, "double"),
    (pa.types.is_string, "string"),
    (pa.types.is_binary, "bytes"),
]


def _avro_type(field: pa.Field):
    if pa.types.is_timestamp(field.type):
        if field.type.unit != "us":
            raise NotImplementedError(
                f"avro: only timestamp[us] supported, got {field.type}")
        base: "str | dict" = {"type": "long",
                              "logicalType": "timestamp-micros"}
    else:
        for pred, name in _ARROW_TO_AVRO:
            if pred(field.type):
                base = name
                break
        else:
            raise NotImplementedError(
                f"avro: unsupported Arrow type {field.type} "
                f"(field {field.name!r})")
    return ["null", base] if field.nullable else base


def avro_schema_for(schema: pa.Schema, name: str = "Row") -> dict:
    """Avro record schema (as a dict) for a flat Arrow schema."""
    return {"type": "record", "name": name,
            "fields": [{"name": f.name, "type": _avro_type(f)}
                       for f in schema]}


# ---------------------------------------------------------------- encoding
def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _write_long(buf: bytearray, v: int) -> None:
    z = _zigzag(int(v)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _encode_rows(t: pa.Table) -> bytes:
    """Avro binary encoding of every row of ``t`` (record per row)."""
    cols = []
    for f in t.schema:
        arr = t[f.name]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
            else arr
        cols.append((f, arr))
    out = bytearray()
    for i in range(t.num_rows):
        for f, arr in cols:
            v = arr[i].as_py()
            if f.nullable:
                if v is None:
                    _write_long(out, 0)
                    continue
                _write_long(out, 1)
            elif v is None:
                raise ValueError(f"null in non-nullable field {f.name!r}")
            ty = f.type
            if pa.types.is_boolean(ty):
                out.append(1 if v else 0)
            elif pa.types.is_int32(ty) or pa.types.is_int64(ty):
                _write_long(out, v)
            elif pa.types.is_timestamp(ty):
                _write_long(out, arr[i].value)  # raw int64 micros
            elif pa.types.is_float32(ty):
                out += struct.pack("<f", v)
            elif pa.types.is_float64(ty):
                out += struct.pack("<d", v)
            elif pa.types.is_string(ty):
                b = v.encode("utf-8")
                _write_long(out, len(b))
                out += b
            elif pa.types.is_binary(ty):
                _write_long(out, len(v))
                out += v
            else:  # pragma: no cover - _avro_type already refused
                raise NotImplementedError(str(ty))
    return bytes(out)


def write_avro(t: pa.Table, path: str, codec: str = "deflate",
               sync: bytes | None = None,
               block_rows: int = 4096) -> int:
    """Write ``t`` as one Avro container file; returns bytes written.
    Deterministic for a deterministic input (pinned metadata order;
    caller-pinned or name-derived sync marker)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unknown codec {codec!r}")
    if sync is None:
        from ..sketchlib.hashing import hash_str_u64, mix2
        h1 = int(hash_str_u64([os.path.basename(path)], seed=7)[0])
        h2 = int(mix2(np.uint64(h1), np.uint64(1)))
        sync = struct.pack("<QQ", h1, h2)
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    schema_json = json.dumps(avro_schema_for(t.schema),
                             separators=(",", ":"), sort_keys=True)
    head = bytearray(_MAGIC)
    meta = [("avro.codec", codec.encode()),
            ("avro.schema", schema_json.encode())]
    _write_long(head, len(meta))
    for k, v in meta:
        kb = k.encode()
        _write_long(head, len(kb))
        head += kb
        _write_long(head, len(v))
        head += v
    _write_long(head, 0)
    head += sync
    body = bytearray()
    for off in range(0, max(t.num_rows, 1), block_rows):
        chunk = t.slice(off, block_rows)
        if chunk.num_rows == 0:
            break
        payload = _encode_rows(chunk)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        _write_long(body, chunk.num_rows)
        _write_long(body, len(payload))
        body += payload
        body += sync
    blob = bytes(head + body)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return len(blob)


# ---------------------------------------------------------------- decoding
class _Reader:
    __slots__ = ("b", "pos")

    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0

    def long(self) -> int:
        b = self.b
        pos = self.pos
        shift = 0
        acc = 0
        while True:
            byte = b[pos]
            pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        self.pos = pos
        return (acc >> 1) ^ -(acc & 1)

    def read(self, n: int) -> bytes:
        out = self.b[self.pos:self.pos + n]
        if len(out) != n:
            raise ValueError("avro: truncated data")
        self.pos += n
        return out


def _parse_field_type(ft):
    """-> (nullable, base) where base is a primitive name or
    ('timestamp-micros',)."""
    nullable = False
    if isinstance(ft, list):
        if len(ft) != 2 or ft[0] != "null":
            raise NotImplementedError(f"avro: unsupported union {ft}")
        nullable, ft = True, ft[1]
    if isinstance(ft, dict):
        if ft.get("logicalType") == "timestamp-micros" \
                and ft.get("type") == "long":
            return nullable, "timestamp-micros"
        ft = ft.get("type")
    if ft not in ("boolean", "int", "long", "float", "double",
                  "string", "bytes"):
        raise NotImplementedError(f"avro: unsupported type {ft!r}")
    return nullable, ft


_ARROW_FOR = {"boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
              "float": pa.float32(), "double": pa.float64(),
              "string": pa.string(), "bytes": pa.binary(),
              "timestamp-micros": pa.timestamp("us")}


def read_avro_table(blob: bytes, columns=None) -> pa.Table:
    """Decode one Avro container file into a pyarrow Table."""
    if blob[:4] != _MAGIC:
        raise ValueError("avro: bad magic")
    r = _Reader(blob)
    r.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:  # block with explicit byte size (spec allows)
            n = -n
            r.long()
        for _ in range(n):
            k = r.read(r.long()).decode()
            meta[k] = r.read(r.long())
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r}")
    fields = [(f["name"], *_parse_field_type(f["type"]))
              for f in schema["fields"]]
    data: dict[str, list] = {name: [] for name, _, _ in fields}
    while r.pos < len(blob):
        nrows = r.long()
        nbytes = r.long()
        payload = r.read(nbytes)
        if r.read(16) != sync:
            raise ValueError("avro: sync marker mismatch")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        rr = _Reader(payload)
        for _ in range(nrows):
            for name, nullable, base in fields:
                if nullable and rr.long() == 0:
                    data[name].append(None)
                    continue
                if base == "boolean":
                    data[name].append(rr.read(1) == b"\x01")
                elif base in ("int", "long", "timestamp-micros"):
                    data[name].append(rr.long())
                elif base == "float":
                    data[name].append(struct.unpack("<f", rr.read(4))[0])
                elif base == "double":
                    data[name].append(struct.unpack("<d", rr.read(8))[0])
                elif base == "string":
                    data[name].append(rr.read(rr.long()).decode("utf-8"))
                else:  # bytes
                    data[name].append(rr.read(rr.long()))
    names = [n for n, _, _ in fields]
    if columns is not None:
        names = [n for n in names if n in set(columns)]
    arrow_fields = {n: pa.field(n, _ARROW_FOR[b], nullable=nu)
                    for n, nu, b in fields}
    return pa.table({n: pa.array(data[n], arrow_fields[n].type)
                     for n in names})


# ---------------------------------------------------------------- Ray glue
def read_avro(path: str, columns=None,
              override_num_blocks: "int | None" = None):
    """Read a ``.avro`` file or directory of ``*.avro`` files as a Ray
    Dataset — one file per read task (the ORC/WARC convention)."""
    import ray.data as rd

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks

    def parse(t: pa.Table) -> pa.Table:
        tables = [read_avro_table(blob, columns=columns)
                  for blob in t["bytes"].to_pylist()]
        return pa.concat_tables(tables, promote_options="default")

    blobs = rd.read_binary_files(path, file_extensions=["avro"], **kwargs)
    return blobs.map_batches(parse, batch_format="pyarrow",
                             batch_size=None)


def write_avro_shards(ds, out_dir: str, key_col: str,
                      num_shards: int = 16,
                      codec: str = "deflate") -> list:
    """Write a Dataset as ``num_shards`` deterministic Avro container
    files (counter-mode key-hash shard assignment, in-shard key sort,
    one writer task per shard, atomic rename — the ORC/WebDataset
    layout).  Returns the manifest sorted by shard name."""
    from ..sketchlib.hashing import hash_str_u64

    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        keys = [str(v) for v in t[key_col].to_pylist()]
        h = hash_str_u64(keys, seed=47)
        return t.append_column("__shard", pa.array(
            (h % np.uint64(num_shards)).astype(np.int64), pa.int64()))

    def write_shard(t: pa.Table) -> pa.Table:
        shard_id = int(t["__shard"][0].as_py())
        t = t.drop_columns(["__shard"])
        t = t.take(pc.sort_indices(t, sort_keys=[(key_col, "ascending")]))
        path = os.path.join(out_dir, f"part-{shard_id:05d}.avro")
        n = write_avro(t.combine_chunks(), path, codec=codec)
        return pa.table({"shard": pa.array([os.path.basename(path)],
                                           pa.string()),
                         "n_rows": pa.array([t.num_rows], pa.int64()),
                         "n_bytes": pa.array([n], pa.int64())})

    manifest = ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("__shard").map_groups(write_shard, batch_format="pyarrow")
    return sorted(manifest.take_all(), key=lambda r: r["shard"])
