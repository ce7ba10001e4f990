"""Compressed JSONL shard sink — the write half of the ``*.jsonl.zst`` /
``*.jsonl.gz`` sources in ``readers.read_corpus`` (newline-delimited JSON,
the interchange format of the public text-corpus world: Dolma, RedPajama,
OSCAR all ship it).

Same deterministic layout as the Arrow/ORC/Avro/TFRecord/SQLite sinks:
counter-mode key-hash shard assignment, in-shard key sort, one writer task
per shard, atomic rename.  Serialization is vectorized through polars'
``write_ndjson`` (no per-row Python json.dumps); compression streams
through Arrow's codec output stream — the exact inverse of the read path —
with the level pinned so bytes are reproducible across runs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EXT = {"zstd": "zst", "gzip": "gz", "bz2": "bz2", None: ""}


def write_jsonl_shards(ds, out_dir: str, key_col: str,
                       num_shards: int = 16,
                       compression: str | None = "zstd") -> list:
    """Write a Dataset as ``part-{i:05d}.jsonl[.zst|.gz|.bz2]`` shards.
    Returns the manifest ``[{shard, n_rows, n_bytes}, ...]`` sorted by
    shard name."""
    import polars as pl

    from ..sketchlib.hashing import hash_str_u64

    if compression not in _EXT:
        raise ValueError(f"write_jsonl_shards: bad compression "
                         f"{compression!r}")
    os.makedirs(out_dir, exist_ok=True)
    ext = ".jsonl" + ("." + _EXT[compression] if compression else "")

    def assign(t: pa.Table) -> pa.Table:
        keys = [str(v) for v in t[key_col].to_pylist()]
        h = hash_str_u64(keys, seed=53)
        return t.append_column("__shard", pa.array(
            (h % np.uint64(num_shards)).astype(np.int64), pa.int64()))

    def write_shard(t: pa.Table) -> pa.Table:
        shard_id = int(t["__shard"][0].as_py())
        t = t.drop_columns(["__shard"])
        t = t.take(pc.sort_indices(t, sort_keys=[(key_col, "ascending")]))
        t = t.replace_schema_metadata(None)
        raw = pl.from_arrow(t.combine_chunks()).write_ndjson().encode()
        if compression:
            sink = pa.BufferOutputStream()
            with pa.CompressedOutputStream(sink, compression) as cs:
                cs.write(raw)
            body = sink.getvalue().to_pybytes()
        else:
            body = raw
        path = os.path.join(out_dir, f"part-{shard_id:05d}{ext}")
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
