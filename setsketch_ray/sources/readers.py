"""Corpus readers: Lance first (the production input format per
BASELINE.json input_hint), parquet fallback (this sandbox has no lance
package — the reader is import-gated, not stubbed away), plus CSV and
JSONL for text-schema corpora (delimited formats cannot carry binary
image payloads; those stay Lance/parquet).
"""

from __future__ import annotations

import os

# extension suffix -> Arrow codec name for delimited-text streams
_TEXT_CODECS = {".gz": "gzip", ".zst": "zstd", ".bz2": "bz2",
                ".br": "brotli", ".lz4": "lz4"}


def _text_codec(path: str) -> str | None:
    for suf, codec in _TEXT_CODECS.items():
        if path.endswith(suf):
            return codec
    return None


def read_corpus(path: str, columns=None, override_num_blocks: int | None = None):
    """Read an image+caption corpus as a Ray Dataset.

    * ``*.lance`` / Lance dataset directories -> ``ray.data.read_lance``
      (requires the ``lance`` package; production path);
    * ``*.csv`` (+ ``.gz``/``.zst``/``.bz2``/``.br``/``.lz4``) ->
      ``ray.data.read_csv``;
    * ``*.jsonl`` / ``*.json`` (+ the same compression suffixes) ->
      ``ray.data.read_json`` (newline-delimited; compressed streams
      decompress in-task through Arrow's codec input stream — a
      compressed file is one task, the natural unit since none of these
      framings are splittable);
    * ``*.tar`` file or a directory of tar shards -> WebDataset samples
      (``sources/webdataset.read_wds_shards``; one shard per task);
    * ``*.warc`` / ``*.warc.gz`` file or directory -> WARC records
      (``sources/warc.read_warc_files``; the Common Crawl layout, one
      file per task);
    * ``*.orc`` file or a directory of ORC files -> ``sources/orc.read_orc``
      (one file per task, column pruning at the in-task decode);
    * ``*.sqlite`` / ``*.db`` file or directory ->
      ``sources/sqlite.read_sqlite_files`` (one DB per task, column pruning
      pushed into the SELECT list);
    * ``*.arrow`` / ``*.feather`` -> Arrow IPC via ``read_binary_files`` +
      a zero-copy in-task ``RecordBatchFileReader`` (one file per task);
    * parquet file or directory -> ``ray.data.read_parquet``.
    """
    import ray.data as rd

    kwargs = {}
    if columns is not None:
        kwargs["columns"] = columns
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks

    is_lance = path.endswith(".lance") or (
        os.path.isdir(path) and any(n.endswith(".lance") or n == "_versions"
                                    for n in os.listdir(path)))
    if is_lance:
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "lance is not installed in this environment; the corpus "
                "reader supports Lance in production and parquet here"
            ) from e
        ds = rd.read_lance(path, **kwargs)
        # Strip file-embedded schema metadata: unhashable metadata dicts
        # defeat Ray Data's schema-dedup fast path and spam a warning per
        # task.  Zero-copy; fuses with the read operator.
        return ds.map_batches(_strip_schema_metadata,
                              batch_format="pyarrow")
    if path.endswith(".csv") or (_text_codec(path) and
                                 ".csv." in os.path.basename(path)):
        # delimited text: no binary payload columns; column pruning happens
        # post-parse (CSV has no column projection at the read); compressed
        # variants stream through Arrow's codec input stream (a compressed
        # file is one task — the natural unit, these framings are not
        # splittable)
        codec = _text_codec(path)
        extra = {"arrow_open_stream_args": {"compression": codec}} \
            if codec else {}
        ds = rd.read_csv(path, **{k: v for k, v in kwargs.items()
                                  if k != "columns"}, **extra)
        if columns is not None:
            ds = ds.select_columns(list(columns))
        return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")
    _is_jsonl = path.endswith((".jsonl", ".json")) or (
        _text_codec(path) and (".jsonl." in os.path.basename(path) or
                               ".json." in os.path.basename(path)))
    if _is_jsonl:
        return _read_jsonl_sources([path], columns, kwargs)
    if path.endswith(".tar") or (
            os.path.isdir(path) and any(n.endswith(".tar")
                                        for n in os.listdir(path))):
        from .webdataset import read_wds_shards

        ds = read_wds_shards(path, override_num_blocks=override_num_blocks)
        if columns is not None:
            ds = ds.select_columns(list(columns))
        return ds
    if path.endswith((".warc", ".warc.gz")) or (
            os.path.isdir(path) and any(n.endswith((".warc", ".warc.gz"))
                                        for n in os.listdir(path))):
        from .warc import read_warc_files

        ds = read_warc_files(path, override_num_blocks=override_num_blocks)
        if columns is not None:
            ds = ds.select_columns(list(columns))
        return ds
    if path.endswith(".orc") or (
            os.path.isdir(path) and any(n.endswith(".orc")
                                        for n in os.listdir(path))):
        from .orc import read_orc

        return read_orc(path, columns=columns,
                        override_num_blocks=override_num_blocks)
    if path.endswith(".tfrecord") or (
            os.path.isdir(path) and any(n.endswith(".tfrecord")
                                        for n in os.listdir(path))):
        from .tfrecord import read_tfrecord_files

        # TFRecord carries no schema; callers needing typed columns use
        # sources/tfrecord.read_tfrecord_files(path, schema=...) directly
        ds = read_tfrecord_files(path,
                                 override_num_blocks=override_num_blocks)
        if columns is not None:
            ds = ds.select_columns(list(columns))
        return ds
    if path.endswith(".avro") or (
            os.path.isdir(path) and any(n.endswith(".avro")
                                        for n in os.listdir(path))):
        from .avro import read_avro

        return read_avro(path, columns=columns,
                         override_num_blocks=override_num_blocks)
    if path.endswith((".sqlite", ".db")) or (
            os.path.isdir(path) and any(n.endswith((".sqlite", ".db"))
                                        for n in os.listdir(path))):
        from .sqlite import read_sqlite_files

        return read_sqlite_files(path, columns=columns,
                                 override_num_blocks=override_num_blocks)
    if path.endswith((".arrow", ".feather")) or (
            os.path.isdir(path) and any(n.endswith((".arrow", ".feather"))
                                        for n in os.listdir(path))):
        # Arrow IPC file(s) (= Feather v2); one file per read task
        def parse_ipc(t):
            import io as _io

            import pyarrow as pa
            import pyarrow.ipc as ipc

            tables = []
            for blob in t["bytes"].to_pylist():
                rb = ipc.open_file(_io.BytesIO(blob)).read_all()
                rb = rb.replace_schema_metadata(None)
                if columns is not None:
                    rb = rb.select(list(columns))
                tables.append(rb)
            return pa.concat_tables(tables, promote_options="default")

        paths = sorted(
            os.path.join(path, n) for n in os.listdir(path)
            if n.endswith((".arrow", ".feather"))) \
            if os.path.isdir(path) else [path]
        blobs = rd.read_binary_files(paths)
        return blobs.map_batches(parse_ipc, batch_format="pyarrow",
                                 batch_size=None)
    # jsonl DIRECTORIES dispatch last among the container types: a corpus
    # dir holding a .json/.jsonl sidecar (e.g. a manifest) next to tar/
    # warc/orc/... payload files must route to the payload reader above,
    # not be silently swallowed by read_json.
    _JL = tuple(".jsonl" + s for s in ("", *_TEXT_CODECS)) + \
        tuple(".json" + s for s in ("", *_TEXT_CODECS))
    if os.path.isdir(path) and any(
            n.endswith(_JL) for n in os.listdir(path)):
        sources = sorted(
            os.path.join(path, n) for n in os.listdir(path)
            if n.endswith(_JL))
        return _read_jsonl_sources(sources, columns, kwargs)
    # parquet: pass an explicit metadata-stripped schema so blocks come out
    # of ReadParquet already clean — a post-read strip map cannot reach the
    # warnings raised inside the fused ReadParquet->SplitBlocks operator
    if "schema" not in kwargs and os.path.isfile(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        full = pq.ParquetFile(path).schema_arrow.remove_metadata()
        kwargs["schema"] = pa.schema(
            [full.field(n) for n in columns]) if columns else full
    ds = rd.read_parquet(path, **kwargs)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")


def _read_jsonl_sources(sources, columns, kwargs):
    """Read jsonl files, deriving the codec PER FILE: a mixed-compression
    directory (plain + .gz + .zst ...) reads each codec group with its own
    Arrow input-stream codec and unions the results — sources[0]'s codec
    must never be applied to every file."""
    import ray.data as rd

    by_codec = {}
    for p in sources:
        by_codec.setdefault(_text_codec(p), []).append(p)
    parts = []
    base = {k: v for k, v in kwargs.items() if k != "columns"}
    for codec, paths in sorted(by_codec.items(), key=lambda kv: kv[1][0]):
        extra = {"arrow_open_stream_args": {"compression": codec}} \
            if codec else {}
        # the dispatch already matched suffixes; Ray's own extension
        # filter doesn't know .bz2/.br/.lz4
        extra["file_extensions"] = None
        parts.append(rd.read_json(paths, **base, **extra))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")


def _strip_schema_metadata(t):
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def write_corpus(ds, path: str, partition_cols=None):
    """Write a dataset as Lance (if available and path endswith .lance) or
    partitioned parquet."""
    if path.endswith(".lance"):
        try:
            import lance  # noqa: F401

            return ds.write_lance(path)
        except ImportError as e:
            raise ImportError("lance is not installed; write parquet") from e
    kwargs = {"partition_cols": partition_cols} if partition_cols else {}
    return ds.write_parquet(path, **kwargs)
