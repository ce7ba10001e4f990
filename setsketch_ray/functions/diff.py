"""Keyed table diff — the data-versioning primitive (what changed between
two snapshots of a corpus: rows added, removed, changed, unchanged).

Distributed shape: each side maps to slim ``(key, content_hash, side)``
rows (the content hash folds the selected value columns through
counter-mode mixing — payloads never enter the exchange), one hash
co-partition by key so both versions of a key meet exactly once, and a
vectorized per-partition set classification (``np.intersect1d`` on the
key arrays).  Output is one ``(key, status)`` row per distinct key with
``status in {added, removed, changed, unchanged}``.

Assumes ``key_col`` is unique within each side (the snapshot contract);
``changed`` vs ``unchanged`` compares 64-bit content hashes — identical
content always classifies ``unchanged`` (hashes are deterministic), and a
false ``unchanged`` needs a mix2 collision between two versions of the
SAME key (~2^-64 per changed key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketchlib.hashing import hash_str_u64, mix2, mix64


def _col_hash(arr) -> np.ndarray:
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_string(a.type) or pa.types.is_large_string(a.type) \
            or pa.types.is_binary(a.type):
        return hash_str_u64(a)
    return mix64(a.to_numpy(zero_copy_only=False).astype(np.uint64))


def diff_tables(a, b, key_col: str, content_cols: list[str],
                num_partitions: int = 32):
    """Diff two Datasets by ``key_col``, comparing ``content_cols``.
    Returns a Dataset of ``(key_col, status:string)`` — one row per key
    present in either side."""
    key_type = a.schema().base_schema.field(key_col).type

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            h = np.zeros(t.num_rows, np.uint64)
            for c in content_cols:
                h = mix2(h, _col_hash(t[c]))
            kh = _col_hash(t[key_col])
            return pa.table({
                key_col: t[key_col],
                "__h": pa.array(h, pa.uint64()),
                "__side": pa.array(
                    np.full(t.num_rows, side, np.int8), pa.int8()),
                "__part": pa.array(
                    (kh % np.uint64(num_partitions)).astype(np.uint32),
                    pa.uint32())})
        return fn

    cols = [key_col] + [c for c in content_cols if c != key_col]
    tagged = a.select_columns(cols).map_batches(
        tag(0), batch_format="pyarrow").union(
        b.select_columns(cols).map_batches(tag(1), batch_format="pyarrow"))

    def classify(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy()
        # keys classified through their uint64 hash-order image would
        # collide across values; classify on the raw key values
        keys = t[key_col].combine_chunks() if \
            isinstance(t[key_col], pa.ChunkedArray) else t[key_col]
        kv = keys.to_numpy(zero_copy_only=False)
        h = t["__h"].to_numpy()
        ma = side == 0
        ka, ha = kv[ma], h[ma]
        kb, hb = kv[~ma], h[~ma]
        common, ia, ib = np.intersect1d(ka, kb, return_indices=True)
        out_keys: list[np.ndarray] = []
        out_status: list[np.ndarray] = []
        rem = np.setdiff1d(ka, common, assume_unique=True)
        add = np.setdiff1d(kb, common, assume_unique=True)
        ch = ha[ia] != hb[ib]
        for arr, label in ((rem, "removed"), (add, "added"),
                           (common[ch], "changed"),
                           (common[~ch], "unchanged")):
            if len(arr):
                out_keys.append(arr)
                out_status.append(np.full(len(arr), label, object))
        if not out_keys:
            return pa.table({key_col: pa.array([], key_type),
                             "status": pa.array([], pa.string())})
        return pa.table({
            key_col: pa.array(np.concatenate(out_keys)).cast(key_type),
            "status": pa.array(np.concatenate(out_status), pa.string())})

    return tagged.groupby("__part").map_groups(
        classify, batch_format="pyarrow")
