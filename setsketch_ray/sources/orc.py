"""Apache ORC source/sink (pyarrow.orc).

ORC is the remaining mainstream columnar interchange format beside
parquet / Arrow IPC; warehouse exports (Hive/Trino) commonly arrive as
directories of ``*.orc`` files.  Reader: one file per task via
``read_binary_files`` + an in-task ``pyarrow.orc`` parse with column
pruning (ORC is columnar, so ``columns=`` prunes at the decode even
though the blob ships whole — stripe-level split is the production
extension for multi-GB files).  Writer: deterministic hash-sharded
layout mirroring ``sources/webdataset.write_wds_shards`` — shard
assignment is the counter-mode key hash (stable across runs and cluster
sizes), rows within a shard sort by key, one writer task per shard,
atomic rename, ``_SUCCESS``-friendly manifest return.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def read_orc(path: str, columns=None, override_num_blocks: "int | None" = None):
    """Read a ``.orc`` file or a directory of ``*.orc`` files as a Ray
    Dataset — one file per read task."""
    import ray.data as rd

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks

    def parse(t: pa.Table) -> pa.Table:
        import io as _io

        import pyarrow.orc as orc

        tables = []
        for blob in t["bytes"].to_pylist():
            f = orc.ORCFile(_io.BytesIO(blob))
            tb = f.read(columns=list(columns)) if columns is not None \
                else f.read()
            tables.append(tb.replace_schema_metadata(None))
        return pa.concat_tables(tables, promote_options="default")

    blobs = rd.read_binary_files(path, file_extensions=["orc"], **kwargs)
    return blobs.map_batches(parse, batch_format="pyarrow",
                             batch_size=None)


def write_orc_shards(ds, out_dir: str, key_col: str,
                     num_shards: int = 16) -> list:
    """Write a Dataset as ``num_shards`` deterministic ORC shards.

    Shard = counter-mode hash of ``key_col`` (a pure function of the key
    set — partitioning/resume invariant); rows within a shard sort by
    key; each shard is written by its own task and renamed into place
    atomically (a crashed run leaves no torn file).  Returns the manifest
    as ``[{shard, n_rows, n_bytes}, ...]`` sorted by shard name.
    """
    import io as _io

    import numpy as np
    import pyarrow.orc as orc

    from ..sketchlib.hashing import hash_str_u64

    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        keys = [str(v) for v in t[key_col].to_pylist()]
        h = hash_str_u64(keys, seed=43)
        return t.append_column("__shard", pa.array(
            (h % np.uint64(num_shards)).astype(np.int64), pa.int64()))

    def write_shard(t: pa.Table) -> pa.Table:
        shard_id = int(t["__shard"][0].as_py())
        t = t.drop_columns(["__shard"])
        t = t.take(pc.sort_indices(t, sort_keys=[(key_col, "ascending")]))
        path = os.path.join(out_dir, f"part-{shard_id:05d}.orc")
        buf = _io.BytesIO()
        orc.write_table(t.combine_chunks(), buf)
        body = buf.getvalue()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, path)
        return pa.table({"shard": pa.array([os.path.basename(path)],
                                           pa.string()),
                         "n_rows": pa.array([t.num_rows], pa.int64()),
                         "n_bytes": pa.array([len(body)], pa.int64())})

    manifest = ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("__shard").map_groups(write_shard, batch_format="pyarrow")
    return sorted(manifest.take_all(), key=lambda r: r["shard"])
