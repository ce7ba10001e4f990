"""WebDataset-style tar-shard source/sink.

The de-facto layout for web-scale multimodal training corpora (the public
WebDataset convention, github.com/webdataset/webdataset): a corpus is a set
of POSIX tar files ("shards"); members named ``<key>.<ext>`` with the same
key form one sample (``00042.jpg`` + ``00042.txt`` + ``00042.json``).  A
100 TB corpus is ~100k shards of ~1 GB — the shard is the unit of task
parallelism, exactly Ray Data's block granularity, so:

* **read**: ``ray.data.read_binary_files`` over the ``*.tar`` listing (one
  shard per task, streaming with backpressure like any other source) +
  a per-blob ``tarfile`` walk that groups members into samples — one Arrow
  block out per shard, binary columns zero-copied from the tar buffer;
* **write**: deterministic shard assignment (counter-mode key hash — NOT
  Python's salted ``hash``) so a re-run lands every sample in the same
  shard, then one ``map_groups`` pass writes each shard independently:
  resumable, no driver state, no cross-shard coordination.  Tar metadata
  (mtime/uid/gid) is pinned so shard bytes are bit-reproducible.

Missing components in a sample become nulls; text-like extensions decode
to utf-8 strings, everything else stays ``binary``.
"""

from __future__ import annotations

import io
import os
import tarfile

import pyarrow as pa
import pyarrow.compute as pc

_TEXT_EXTS = frozenset({"txt", "text", "caption", "json", "jsonl", "cls",
                        "lang"})


def _split_member(name: str):
    """WebDataset key/extension split: the key is everything up to the
    FIRST dot of the basename (directories included in the key), the
    extension is the rest (may itself contain dots, e.g. ``seg.png``)."""
    d, b = os.path.split(name)
    if "." not in b:
        return name, ""
    stem, ext = b.split(".", 1)
    return (os.path.join(d, stem) if d else stem), ext


def read_wds_shards(path, components=None,
                    override_num_blocks: int | None = None,
                    on_error: str = "raise"):
    """Read tar shards into a Dataset of samples.

    ``path``: a ``.tar`` file, a directory of them, or a list of paths.
    ``components``: optional ``{ext: column_name}`` mapping; extensions not
    listed are dropped.  Default: every extension seen in a shard becomes a
    column named after it (dots -> underscores), text-like extensions
    (txt/json/cls/...) as utf-8 strings, the rest binary.  The sample key
    lands in ``__key__`` (string), per the WebDataset convention.

    One shard -> one task -> one output block; shards never concatenate
    driver-side.

    ``on_error``: ``"raise"`` (default) propagates a corrupt/truncated
    shard; ``"skip"`` drops it with a logged warning — at 100 TB one bad
    shard must not kill the job, and the shard-level granularity makes the
    skip auditable (re-run the logged path alone after repair).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    import ray.data as rd

    if isinstance(path, str) and os.path.isdir(path):
        paths = sorted(
            os.path.join(path, n) for n in os.listdir(path)
            if n.endswith(".tar"))
    elif isinstance(path, str):
        paths = [path]
    else:
        paths = sorted(path)
    if not paths:
        raise ValueError(f"no .tar shards under {path!r}")
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    blobs = rd.read_binary_files(paths, **kwargs)

    def parse_shard(batch: pa.Table) -> pa.Table:
        tables = []
        for blob in batch["bytes"].to_pylist():
            try:
                tables.append(_parse_tar(blob, components))
            except (tarfile.TarError, EOFError, OSError):
                if on_error == "raise":
                    raise
                import logging

                logging.getLogger(__name__).warning(
                    "read_wds_shards: skipping corrupt shard "
                    "(%d bytes)", len(blob))
        if not tables:
            return _empty_samples(components)
        return pa.concat_tables(tables, promote_options="default")

    return blobs.map_batches(parse_shard, batch_format="pyarrow",
                             batch_size=None)


def _col_name(ext: str, components) -> str | None:
    if components is not None:
        return components.get(ext)
    return ext.replace(".", "_") if ext else None


def _empty_samples(components) -> pa.Table:
    cols = {"__key__": pa.array([], pa.string())}
    if components:
        for ext, name in components.items():
            typ = pa.string() if ext.split(".")[-1] in _TEXT_EXTS \
                else pa.binary()
            cols[name] = pa.array([], typ)
    return pa.table(cols)


def _parse_tar(blob: bytes, components) -> pa.Table:
    """One tar shard -> one Arrow table of samples.  Members are grouped by
    key in file order (the WebDataset contract: a sample's members are
    adjacent); a key change closes the sample."""
    samples: list[dict] = []
    cur_key = None
    cur: dict = {}
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r") as tf:
        for m in tf:
            if not m.isfile():
                continue
            key, ext = _split_member(m.name)
            col = _col_name(ext, components)
            if key != cur_key:
                if cur_key is not None:
                    samples.append(cur)
                cur_key, cur = key, {"__key__": key}
            if col is None:
                continue
            data = tf.extractfile(m).read()
            if ext.split(".")[-1] in _TEXT_EXTS:
                cur[col] = data.decode("utf-8")
            else:
                cur[col] = data
    if cur_key is not None:
        samples.append(cur)
    names = ["__key__"]
    seen = {"__key__"}
    for s in samples:
        for k in s:
            if k not in seen:
                names.append(k)
                seen.add(k)
    cols = {}
    for name in names:
        vals = [s.get(name) for s in samples]
        if name == "__key__":
            cols[name] = pa.array(vals, pa.string())
        elif any(isinstance(v, str) for v in vals):
            cols[name] = pa.array(vals, pa.string())
        else:
            cols[name] = pa.array(vals, pa.binary())
    return pa.table(cols)


def write_wds_shards(ds, out_dir: str, key_col: str, components: dict,
                     num_shards: int = 64, key_format: str = "{}"):
    """Write a Dataset as WebDataset tar shards.

    ``components``: ``{column_name: extension}`` — string columns are
    written utf-8, binary columns raw.  Samples land in
    ``shard-{i:05d}.tar`` by counter-mode hash of ``key_col`` (stable
    across runs and cluster sizes); within a shard, samples are sorted by
    key so shard bytes are deterministic.  Each shard is written by its own
    task (one groupby exchange; no driver-side data pull).  Returns the
    manifest as a list of ``{shard, n_samples, n_bytes}`` dicts (one row
    per shard — small by construction).
    """
    import numpy as np

    from ..sketchlib.hashing import hash_str_u64

    os.makedirs(out_dir, exist_ok=True)
    cols = [key_col] + [c for c in components if c != key_col]

    def assign(t: pa.Table) -> pa.Table:
        keys = [key_format.format(v) for v in t[key_col].to_pylist()]
        h = hash_str_u64(keys, seed=41)
        return pa.table({
            "__shard": pa.array((h % np.uint64(num_shards)).astype(
                np.int64), pa.int64()),
            "__key__": pa.array(keys, pa.string()),
            **{c: t[c] for c in cols}})

    def write_shard(t: pa.Table) -> pa.Table:
        shard_id = int(t["__shard"][0].as_py())
        order = pc.sort_indices(t["__key__"])
        t = t.take(order)
        path = os.path.join(out_dir, f"shard-{shard_id:05d}.tar")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for i in range(t.num_rows):
                key = t["__key__"][i].as_py()
                for col, ext in components.items():
                    v = t[col][i].as_py()
                    if v is None:
                        continue
                    data = v.encode("utf-8") if isinstance(v, str) else v
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # pinned: shard bytes are reproducible
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tf.addfile(info, io.BytesIO(data))
        body = buf.getvalue()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, path)  # atomic: a crashed run leaves no torn shard
        return pa.table({"shard": pa.array([os.path.basename(path)],
                                           pa.string()),
                         "n_samples": pa.array([t.num_rows], pa.int64()),
                         "n_bytes": pa.array([len(body)], pa.int64())})

    manifest = ds.select_columns(cols) \
        .map_batches(assign, batch_format="pyarrow") \
        .groupby("__shard").map_groups(write_shard, batch_format="pyarrow")
    return sorted(manifest.take_all(), key=lambda r: r["shard"])
