"""Arrow IPC (Feather v2) shard sink — the write half of the ``*.arrow``
source in ``readers.read_corpus`` (public format: the Arrow IPC file
format, arrow.apache.org/docs/format/Columnar.html).

Same deterministic layout as the ORC/Avro/TFRecord/SQLite sinks:
counter-mode key-hash shard assignment (a pure function of the key set —
partitioning/resume invariant), in-shard key sort, one writer task per
shard, atomic rename.  IPC files are zero-copy mappable on read — the
natural interchange format for handing a corpus to another Arrow-native
engine without a parse step.
"""

from __future__ import annotations

import io
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.ipc as ipc


def write_arrow_shards(ds, out_dir: str, key_col: str,
                       num_shards: int = 16) -> list:
    """Write a Dataset as ``part-{i:05d}.arrow`` IPC files.  Returns the
    manifest ``[{shard, n_rows, n_bytes}, ...]`` sorted by shard name."""
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
        t = t.replace_schema_metadata(None)  # reproducible bytes
        path = os.path.join(out_dir, f"part-{shard_id:05d}.arrow")
        buf = io.BytesIO()
        with ipc.new_file(buf, t.schema) as w:
            w.write_table(t.combine_chunks())
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
