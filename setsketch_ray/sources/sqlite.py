"""SQLite source/sink (stdlib ``sqlite3``; the SQLite file format is public,
sqlite.org/fileformat2.html).

Many curated corpora and scraped datasets ship as SQLite files (one DB per
crawl slice / annotation batch).  The natural Ray mapping makes the FILE the
unit of parallelism, exactly like the tar/WARC/Avro sources:

* **read**: ``from_items`` over the ``*.sqlite`` listing -> one file per
  task -> one Arrow block per file (``SELECT ... ORDER BY rowid`` inside
  the task; column pruning pushes into the SELECT list);
* **write**: deterministic shard assignment (counter-mode key hash), one
  writer task per shard DB, rows inserted key-sorted inside a single
  transaction with pinned pragmas — shard bytes are bit-reproducible —
  then an atomic rename (a crashed run leaves no torn DB).

Arrow dtypes round-trip exactly: each column's declared SQLite type carries
the Arrow type name (SQLite accepts arbitrary declared types and resolves
storage by affinity — ``INT64``/``INT32`` -> INTEGER, ``FLOAT64`` -> REAL,
``TEXT`` -> TEXT, ``BLOB`` -> BLOB, ``BOOL``/``TIMESTAMP_US`` -> NUMERIC),
so the reader restores int32 as int32, timestamps as timestamp[us], etc.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Arrow type <-> declared SQLite column type (affinity in parentheses):
_DECL_OF_ARROW = {
    pa.int8(): "INT8", pa.int16(): "INT16", pa.int32(): "INT32",
    pa.int64(): "INT64", pa.uint8(): "UINT8", pa.uint16(): "UINT16",
    pa.uint32(): "UINT32", pa.uint64(): "UINT64",
    pa.float32(): "FLOAT32", pa.float64(): "FLOAT64",
    pa.string(): "TEXT", pa.large_string(): "LARGETEXT",
    pa.binary(): "BLOB", pa.large_binary(): "LARGEBLOB",
    pa.bool_(): "BOOL", pa.timestamp("us"): "TIMESTAMP_US",
}
_ARROW_OF_DECL = {v: k for k, v in _DECL_OF_ARROW.items()}


def _key_hash_u64(arr: pa.Array) -> np.ndarray:
    from ..sketchlib.hashing import hash_str_u64, mix64

    vals = arr.to_numpy(zero_copy_only=False)
    if vals.dtype.kind in "iu":
        return mix64(vals.astype(np.uint64))
    return hash_str_u64([str(v) for v in vals], seed=43)


def _to_storage(col: pa.ChunkedArray | pa.Array, typ: pa.DataType) -> list:
    """Column -> list of Python values in SQLite storage form."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(typ):
        arr = pc.cast(arr, pa.int64())  # microseconds since epoch
    elif pa.types.is_boolean(typ):
        arr = pc.cast(arr, pa.int64())
    return arr.to_pylist()


def _from_storage(vals: list, typ: pa.DataType) -> pa.Array:
    if pa.types.is_timestamp(typ) or pa.types.is_boolean(typ):
        return pc.cast(pa.array(vals, pa.int64()), typ)
    return pa.array(vals, typ)


def write_sqlite_shards(ds, out_dir: str, key_col: str,
                        table: str = "corpus", num_shards: int = 16):
    """Write a Dataset as ``shard-{i:05d}.sqlite`` files under ``out_dir``.

    Shard by counter-mode hash of ``key_col`` (stable across runs and
    cluster sizes); rows are key-sorted within a shard and inserted in one
    transaction with pinned pragmas, so shard bytes are bit-reproducible.
    One ``groupby`` exchange, one writer task per shard, no driver-side
    data pull.  Returns the manifest ``[{shard, n_rows, n_bytes}, ...]``.
    """
    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        arr = t[key_col]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
            else arr
        h = _key_hash_u64(arr)
        return t.append_column(
            "__shard", pa.array((h % np.uint64(num_shards)).astype(np.int64),
                                pa.int64()))

    def write_shard(t: pa.Table) -> pa.Table:
        shard_id = int(t["__shard"][0].as_py())
        t = t.drop_columns(["__shard"])
        t = t.take(pc.sort_indices(t[key_col]))
        for f in t.schema:
            if f.type not in _DECL_OF_ARROW:
                raise TypeError(
                    f"write_sqlite_shards: unsupported column type "
                    f"{f.name}: {f.type}")
        path = os.path.join(out_dir, f"shard-{shard_id:05d}.sqlite")
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            os.remove(tmp)
        con = sqlite3.connect(tmp)
        try:
            con.execute("PRAGMA journal_mode=MEMORY")
            con.execute("PRAGMA page_size=4096")
            cols = ", ".join(
                f'"{f.name}" {_DECL_OF_ARROW[f.type]}' for f in t.schema)
            con.execute(f'CREATE TABLE "{table}" ({cols})')
            rows = list(zip(*(
                _to_storage(t[f.name], f.type) for f in t.schema)))
            ph = ", ".join("?" * t.num_columns)
            with con:  # single transaction: deterministic page layout
                con.executemany(
                    f'INSERT INTO "{table}" VALUES ({ph})', rows)
        finally:
            con.close()
        os.replace(tmp, path)  # atomic: a crashed run leaves no torn DB
        return pa.table({
            "shard": pa.array([os.path.basename(path)], pa.string()),
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "n_bytes": pa.array([os.path.getsize(path)], pa.int64())})

    manifest = ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("__shard").map_groups(write_shard, batch_format="pyarrow")
    return sorted(manifest.take_all(), key=lambda r: r["shard"])


def _read_one(path: str, table: str | None, columns) -> pa.Table:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        if table is None:
            names = [r[0] for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table' "
                "ORDER BY name")]
            if not names:
                raise ValueError(f"{path}: no tables")
            table = names[0]
        info = list(con.execute(f'PRAGMA table_info("{table}")'))
        types = {r[1]: _ARROW_OF_DECL.get((r[2] or "").upper())
                 for r in info}
        names = [r[1] for r in info] if columns is None else list(columns)
        sel = ", ".join(f'"{c}"' for c in names)
        rows = con.execute(
            f'SELECT {sel} FROM "{table}" ORDER BY rowid').fetchall()
        cols = list(zip(*rows)) if rows else [[] for _ in names]
        return pa.table({
            c: _from_storage(list(v), types.get(c) or pa.string())
            if types.get(c) is not None
            else pa.array(list(v))
            for c, v in zip(names, cols)})
    finally:
        con.close()


def read_sqlite_files(path, table: str | None = None, columns=None,
                      override_num_blocks: int | None = None):
    """Read SQLite file(s) into a Dataset: a ``.sqlite``/``.db`` file, a
    directory of them, or a list of paths.  One file per task; column
    pruning pushes into the SELECT list; declared column types restore the
    exact Arrow dtypes written by :func:`write_sqlite_shards` (foreign DBs
    with plain INTEGER/REAL/TEXT/BLOB decltypes map to
    int64/float64/string/binary)."""
    import ray.data as rd

    if isinstance(path, str) and os.path.isdir(path):
        paths = sorted(
            os.path.join(path, n) for n in os.listdir(path)
            if n.endswith((".sqlite", ".db")))
    elif isinstance(path, str):
        paths = [path]
    else:
        paths = sorted(path)
    if not paths:
        raise ValueError(f"no .sqlite/.db files under {path!r}")

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    items = rd.from_items([{"path": p} for p in paths], **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [_read_one(p, table, columns)
                  for p in batch["path"].to_pylist()]
        return pa.concat_tables(tables, promote_options="default")

    return items.map_batches(parse, batch_format="pyarrow")


# foreign decltypes (affinity names) -> Arrow
_ARROW_OF_DECL.setdefault("INTEGER", pa.int64())
_ARROW_OF_DECL.setdefault("REAL", pa.float64())
_ARROW_OF_DECL.setdefault("DOUBLE", pa.float64())
_ARROW_OF_DECL.setdefault("VARCHAR", pa.string())
