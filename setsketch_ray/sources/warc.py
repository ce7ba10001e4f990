"""WARC (Web ARChive, ISO 28500) source/sink — the Common Crawl layout.

The standard container for web-scale text corpora (Common Crawl publishes
~100 TB/crawl as ``*.warc.gz``): a WARC file is a sequence of records,
each a ``WARC/1.0`` header block (named fields, CRLF-terminated) + a
``Content-Length``-framed payload, records separated by a blank line.  The
``.warc.gz`` convention compresses EACH RECORD as its own gzip member and
concatenates the members, so a reader can seek to any record offset — and
Python's zlib/gzip handle the concatenation natively.

Ray Data mapping (same shape as ``webdataset.py``):

* **read**: ``ray.data.read_binary_files`` over the ``*.warc(.gz)``
  listing — one file per task, one Arrow block out per file, streaming
  with backpressure; a pure-Python record parser (the format is
  line-framed headers + length-framed payloads, no codec work).
* **write**: deterministic file assignment by counter-mode hash of the
  record key (NOT Python's salted ``hash``), one writer task per file
  (single ``groupby`` exchange, no driver-side data pull), atomic
  ``os.replace`` publish.  ``WARC-Date`` and the gzip MTIME are pinned and
  ``WARC-Record-ID`` is derived from the key, so file bytes are
  bit-reproducible — a re-run lands every record in the same file with the
  same bytes (checkpoint-resume safe).

Header names follow the WARC 1.1 spec (iipc/warc-specifications), incl.
``WARC-Identified-Content-Language`` for per-record language tags.
"""

from __future__ import annotations

import gzip
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"
_PINNED_DATE = "2024-01-01T00:00:00Z"


def _record_uuid(key: str) -> str:
    """Deterministic urn:uuid for a record key (counter-mode hash, RFC 4122
    version-4 variant bits set so downstream UUID parsers accept it)."""
    from ..sketchlib.hashing import hash_str_u64

    a = int(hash_str_u64([key], seed=59)[0])
    b = int(hash_str_u64([key], seed=60)[0])
    raw = bytearray(a.to_bytes(8, "big") + b.to_bytes(8, "big"))
    raw[6] = (raw[6] & 0x0F) | 0x40
    raw[8] = (raw[8] & 0x3F) | 0x80
    h = raw.hex()
    return (f"urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}")


def build_warc_record(warc_type: str, payload: bytes,
                      headers: dict[str, str]) -> bytes:
    """One spec-shaped WARC/1.0 record: version line, named fields,
    blank line, payload, record separator."""
    lines = [b"WARC/1.0",
             b"WARC-Type: " + warc_type.encode()]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode())
    lines.append(f"Content-Length: {len(payload)}".encode())
    return _CRLF.join(lines) + _SEP + payload + _SEP


def parse_warc_records(data: bytes):
    """Parse a (decompressed) WARC byte stream into
    ``(headers_dict, payload_bytes)`` tuples.  Loud on malformed framing —
    a truncated record raises instead of yielding silent garbage."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        end = data.find(_SEP, pos)
        if end < 0:
            raise ValueError("WARC: unterminated record header")
        header = data[pos:end].decode("utf-8")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"WARC: bad version line {lines[0]!r}")
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip()] = v.strip()
        try:
            length = int(fields["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError("WARC: missing/bad Content-Length")
        body_start = end + len(_SEP)
        if body_start + length > n:
            raise ValueError("WARC: truncated payload")
        out.append((fields, data[body_start:body_start + length]))
        pos = body_start + length
    return out


def _maybe_gunzip(blob: bytes) -> bytes:
    if blob[:2] == b"\x1f\x8b":
        # multi-member concatenated gzip (one member per record, the
        # Common Crawl convention) — gzip.decompress consumes all members
        return gzip.decompress(blob)
    return blob


def read_warc_files(path, override_num_blocks: int | None = None,
                    on_error: str = "raise"):
    """Read WARC files into a Dataset of records.

    ``path``: a ``.warc``/``.warc.gz`` file, a directory of them, or a
    list of paths.  One file -> one task -> one output block.  Columns:
    ``warc_type``, ``record_id``, ``uri``, ``date``, ``content_type``,
    ``language`` (string, "" when untagged) and ``payload`` (binary).

    ``on_error``: ``"raise"`` (default) propagates a corrupt/truncated
    file; ``"skip"`` drops it with a logged warning — at 100 TB one bad
    file must not kill the job, and the file granularity makes the skip
    auditable (re-run the logged path alone after repair).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    import ray.data as rd

    if isinstance(path, str) and os.path.isdir(path):
        paths = sorted(
            os.path.join(path, nm) for nm in os.listdir(path)
            if nm.endswith((".warc", ".warc.gz")))
    elif isinstance(path, str):
        paths = [path]
    else:
        paths = sorted(path)
    if not paths:
        raise ValueError(f"no .warc(.gz) files under {path!r}")
    # one file per task, raw bytes: ray.data.read_binary_files force-
    # inflates *.gz at the Arrow layer (its compression=None means
    # "detect from path"), which would crash the whole read on one corrupt
    # member — open through pyarrow fs with compression explicitly OFF so
    # corrupt files hit OUR parser and on_error="skip" stays effective
    blobs = rd.from_items(paths, override_num_blocks=override_num_blocks
                          or len(paths))

    def parse_file(batch: pa.Table) -> pa.Table:
        from pyarrow import fs as pafs
        cols = {"warc_type": [], "record_id": [], "uri": [], "date": [],
                "content_type": [], "language": [], "payload": []}
        for p in batch["item"].to_pylist():
            try:
                if "://" in p:
                    filesystem, fp = pafs.FileSystem.from_uri(p)
                else:
                    filesystem, fp = pafs.LocalFileSystem(), p
                with filesystem.open_input_stream(
                        fp, compression=None) as f:
                    blob = f.read()
                recs = parse_warc_records(_maybe_gunzip(blob))
            except (ValueError, zlib.error, EOFError, gzip.BadGzipFile,
                    OSError):
                if on_error == "raise":
                    raise
                import logging

                logging.getLogger(__name__).warning(
                    "read_warc_files: skipping corrupt file %s", p)
                continue
            for fields, payload in recs:
                cols["warc_type"].append(fields.get("WARC-Type", ""))
                cols["record_id"].append(fields.get("WARC-Record-ID", ""))
                cols["uri"].append(fields.get("WARC-Target-URI", ""))
                cols["date"].append(fields.get("WARC-Date", ""))
                cols["content_type"].append(fields.get("Content-Type", ""))
                cols["language"].append(
                    fields.get("WARC-Identified-Content-Language", ""))
                cols["payload"].append(payload)
        return pa.table({
            "warc_type": pa.array(cols["warc_type"], pa.string()),
            "record_id": pa.array(cols["record_id"], pa.string()),
            "uri": pa.array(cols["uri"], pa.string()),
            "date": pa.array(cols["date"], pa.string()),
            "content_type": pa.array(cols["content_type"], pa.string()),
            "language": pa.array(cols["language"], pa.string()),
            "payload": pa.array(cols["payload"], pa.binary())})

    return blobs.map_batches(parse_file, batch_format="pyarrow",
                             batch_size=None)


def write_warc_files(ds, out_dir: str, key_col: str, payload_col: str,
                     num_files: int = 64, uri_format: str = "{}",
                     content_type: str = "text/plain",
                     language_col: str | None = None,
                     warc_type: str = "conversion",
                     compress: bool = True):
    """Write a Dataset as WARC files (``records-{i:05d}.warc[.gz]``).

    Records land in files by counter-mode hash of ``key_col`` (stable
    across runs and cluster sizes); within a file, records sort by key so
    file bytes are deterministic.  Each file opens with a spec-shaped
    ``warcinfo`` record and is written by its own task (one groupby
    exchange).  ``compress=True`` gzips EACH record as its own member
    (MTIME pinned to 0) per the Common Crawl seekable convention.

    Returns the manifest as ``{file, n_records, n_bytes}`` rows (one per
    file — small by construction).
    """
    from ..sketchlib.hashing import hash_str_u64

    os.makedirs(out_dir, exist_ok=True)
    cols = [key_col, payload_col] + (
        [language_col] if language_col and language_col not in
        (key_col, payload_col) else [])

    def assign(t: pa.Table) -> pa.Table:
        keys = [uri_format.format(v) for v in t[key_col].to_pylist()]
        h = hash_str_u64(keys, seed=58)
        return pa.table({
            "__file": pa.array((h % np.uint64(num_files)).astype(np.int64),
                               pa.int64()),
            "__uri": pa.array(keys, pa.string()),
            **{c: t[c] for c in cols}})

    suffix = ".warc.gz" if compress else ".warc"

    def gz(record: bytes) -> bytes:
        return gzip.compress(record, mtime=0) if compress else record

    def write_file(t: pa.Table) -> pa.Table:
        file_id = int(t["__file"][0].as_py())
        t = t.take(pc.sort_indices(t["__uri"]))
        name = f"records-{file_id:05d}{suffix}"
        path = os.path.join(out_dir, name)
        parts = [gz(build_warc_record("warcinfo", b"software: setsketch-ray",
                    {"WARC-Record-ID": _record_uuid(f"warcinfo:{name}"),
                     "WARC-Date": _PINNED_DATE,
                     "WARC-Filename": name,
                     "Content-Type": "application/warc-fields"}))]
        for i in range(t.num_rows):
            uri = t["__uri"][i].as_py()
            v = t[payload_col][i].as_py()
            payload = v.encode("utf-8") if isinstance(v, str) else (v or b"")
            headers = {"WARC-Record-ID": _record_uuid(uri),
                       "WARC-Date": _PINNED_DATE,
                       "WARC-Target-URI": uri,
                       "Content-Type": content_type}
            if language_col is not None:
                lang = t[language_col][i].as_py()
                if lang:
                    headers["WARC-Identified-Content-Language"] = lang
            parts.append(gz(build_warc_record(warc_type, payload, headers)))
        body = b"".join(parts)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, path)  # atomic: a crashed run leaves no torn file
        return pa.table({
            "file": pa.array([name], pa.string()),
            "n_records": pa.array([t.num_rows], pa.int64()),
            "n_bytes": pa.array([len(body)], pa.int64())})

    manifest = ds.select_columns(cols) \
        .map_batches(assign, batch_format="pyarrow") \
        .groupby("__file").map_groups(write_file, batch_format="pyarrow")
    rows = manifest.take_all()
    return sorted(rows, key=lambda r: r["file"])
