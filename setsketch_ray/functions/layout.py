"""Space-filling-curve data layout + zone-map data skipping.

The 100 TB problem this solves: a selective 2-D box query (geo ranges,
composite numeric predicates) over hash-laid-out parquet touches EVERY
file, because neither column is clustered.  Writing the table Z-ORDERED
(Morton-interleaved bits of the two columns) makes each file a spatial
tile, and a per-file (min, max) ZONE MAP turns the box query into "read
only the intersecting tiles" — the Delta/Iceberg `OPTIMIZE ZORDER BY`
+ data-skipping-statistics pattern, built here from Ray Data primitives:

* layout  = one deterministic map (bit-interleave, pure int64) + the
  engine's hash exchange on the z-range file id — one all-to-all, then
  one writer task per file (no global sort needed: equal-width z ranges
  make file assignment a PURE FUNCTION of the row, so the layout is
  partition/resume invariant and bit-reproducible);
* zone map = per-file min/max collected from the written rows (one slim
  (file, 4 ints) row per file);
* scan    = manifest prune on the driver (tiny), then ``read_parquet``
  over ONLY the surviving files + an exact residual filter.

Everything — the interleave, the file assignment, the zone-map prune,
the residual box — is exact BIGINT arithmetic, so a SQL oracle can
recompute the full scan result AND the pruning statistics.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_M16 = np.uint64(0x0000FFFF0000FFFF)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M2 = np.uint64(0x3333333333333333)
_M1 = np.uint64(0x5555555555555555)


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each value onto the even bit positions
    of a uint64 (Morton encoding half)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & _M16
    v = (v | (v << np.uint64(8))) & _M8
    v = (v | (v << np.uint64(4))) & _M4
    v = (v | (v << np.uint64(2))) & _M2
    v = (v | (v << np.uint64(1))) & _M1
    return v


def zorder_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton / Z-order interleave of two non-negative int arrays
    (< 2^31 each): bit i of x lands at position 2i, bit i of y at 2i+1.
    Returns int64 (values < 2^62 so the sign bit never sets)."""
    xs = np.asarray(x)
    ys = np.asarray(y)
    if len(xs) and (xs.min() < 0 or ys.min() < 0
                    or xs.max() >= (1 << 31) or ys.max() >= (1 << 31)):
        raise ValueError("zorder_key: inputs must be in [0, 2^31)")
    z = _spread_bits(xs) | (_spread_bits(ys) << np.uint64(1))
    return z.astype(np.int64)


def zorder_sql(x_expr: str, y_expr: str, bits: int) -> str:
    """The identical interleave as ANSI-SQL BIGINT arithmetic (unrolled
    ``((x >> i) & 1) * 2^(2i)`` terms) — the oracle mirror of
    :func:`zorder_key` for inputs known to fit in ``bits`` bits."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x_expr} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y_expr} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def write_zordered(ds, root: str, x_col: str, y_col: str,
                   bits: int, num_files: int = 64) -> pa.Table:
    """Write ``ds`` as a Z-ordered parquet layout under ``root``: file
    assignment is the equal-width z-range ``z // (4^bits // num_files)``
    (a pure function of the row — deterministic under any partitioning),
    one writer task per nonempty file, plus a zone-map manifest parquet
    (``_manifest.parquet``: file id, min/max of both columns, row count;
    underscore prefix so dataset scans of ``root`` skip it).  Returns the
    manifest table.  A ``_SUCCESS`` marker commits the layout — partial
    directories from crashed runs are wiped and rebuilt."""
    import shutil

    if (1 << (2 * bits)) % num_files:
        raise ValueError("write_zordered: num_files must divide 4^bits")
    step = (1 << (2 * bits)) // num_files

    if os.path.isdir(root) and not os.path.exists(f"{root}/_SUCCESS"):
        shutil.rmtree(root)
    os.makedirs(root, exist_ok=True)

    def tag(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and (x.max() >= (1 << bits) or y.max() >= (1 << bits)):
            raise ValueError(f"write_zordered: values exceed {bits} bits")
        z = zorder_key(x, y)
        return t.append_column("__f", pa.array(z // step, pa.int64()))

    def write_file(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        if t.num_rows == 0:
            return pa.table({
                "f": pa.array([], pa.int64()),
                "min_x": pa.array([], pa.int64()),
                "max_x": pa.array([], pa.int64()),
                "min_y": pa.array([], pa.int64()),
                "max_y": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())})
        f = int(t["__f"][0].as_py())
        # rows inside a file sort by (z, first column) — deterministic bytes
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        z = zorder_key(x, y)
        first = t[t.column_names[0]].to_numpy(zero_copy_only=False)
        order = np.lexsort((first, z))
        body = t.drop_columns(["__f"]).take(pa.array(order))
        tmp = f"{root}/.f{f:05d}.parquet.tmp"
        pq.write_table(body, tmp)
        os.replace(tmp, f"{root}/f{f:05d}.parquet")
        return pa.table({
            "f": pa.array([f], pa.int64()),
            "min_x": pa.array([int(x.min())], pa.int64()),
            "max_x": pa.array([int(x.max())], pa.int64()),
            "min_y": pa.array([int(y.min())], pa.int64()),
            "max_y": pa.array([int(y.max())], pa.int64()),
            "n": pa.array([len(x)], pa.int64())})

    import pyarrow.parquet as pq

    manifest = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__f").map_groups(write_file, batch_format="pyarrow") \
        .sort("f")
    mtab = pa.Table.from_pandas(manifest.to_pandas(),
                                preserve_index=False)
    mtab = mtab.cast(pa.schema([(c, pa.int64())
                                for c in mtab.column_names]))
    pq.write_table(mtab, f"{root}/_manifest.parquet")
    with open(f"{root}/_SUCCESS", "w", encoding="utf-8") as fh:
        fh.write("ok")
    return mtab


def zonemap_scan(root: str, x_col: str, y_col: str,
                 x_range: tuple[int, int], y_range: tuple[int, int]):
    """Box scan over a :func:`write_zordered` layout: prune files whose
    zone-map rectangle misses the box (driver-side, manifest only), then
    ``read_parquet`` over ONLY the survivors with the exact residual
    filter.  Returns (dataset_of_matching_rows, n_files_scanned,
    n_files_total)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    x1, x2 = x_range
    y1, y2 = y_range
    man = pq.read_table(f"{root}/_manifest.parquet")
    mnx = man["min_x"].to_numpy()
    mxx = man["max_x"].to_numpy()
    mny = man["min_y"].to_numpy()
    mxy = man["max_y"].to_numpy()
    hit = (mxx >= x1) & (mnx <= x2) & (mxy >= y1) & (mny <= y2)
    files = [f"{root}/f{int(f):05d}.parquet"
             for f in man["f"].to_numpy()[hit]]
    n_total = man.num_rows

    def residual(t: pa.Table) -> pa.Table:
        mx = pc.and_(pc.greater_equal(t[x_col], pa.scalar(x1)),
                     pc.less_equal(t[x_col], pa.scalar(x2)))
        my = pc.and_(pc.greater_equal(t[y_col], pa.scalar(y1)),
                     pc.less_equal(t[y_col], pa.scalar(y2)))
        return t.filter(pc.and_(mx, my))

    if not files:
        empty = pq.read_table(
            f"{root}/f{int(man['f'][0].as_py()):05d}.parquet",
            columns=None).schema.empty_table()
        return rd.from_arrow(empty), 0, n_total
    ds = rd.read_parquet(files) \
        .map_batches(residual, batch_format="pyarrow")
    return ds, len(files), n_total


def compact_parquet_files(src_files: list, dst_dir: str,
                          target_rows: int) -> pa.Table:
    """Small-file compaction (the table-maintenance op every lake runs):
    merge many small parquet files into ``ceil(total/target_rows)`` files
    of ``target_rows`` rows each (last file short), PRESERVING global row
    order — output file f holds exactly global rows
    [f*target_rows, (f+1)*target_rows).

    Plan: source row counts come from parquet FOOTER metadata only (no
    data read on the driver — the file list itself is metadata-sized even
    at 100 TB); each source file is one read task that tags its rows with
    their global index (file offset + arange, a pure function of the
    sorted file list); a target-file-id co-partition then writes one
    output file per group, rows sorted by global index — bytes are
    deterministic under any task interleaving.  A ``_SUCCESS`` marker
    commits the layout; partial directories are wiped and rebuilt.

    Returns the manifest (f, n) table.
    """
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    if target_rows <= 0:
        raise ValueError("compact_parquet_files: target_rows must be >= 1")
    src_files = sorted(src_files)
    counts = [pq.ParquetFile(f).metadata.num_rows for f in src_files]
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    # Unconditionally wipe any existing layout (committed or partial):
    # re-running into a previously committed dir with a different
    # target_rows would otherwise leave stale part-*.parquet from the old
    # layout next to the new manifest under the old _SUCCESS, and readers
    # globbing part files would see duplicated rows.
    if os.path.isdir(dst_dir):
        shutil.rmtree(dst_dir)
    os.makedirs(dst_dir, exist_ok=True)

    items = [{"path": p, "off": int(o)}
             for p, o in zip(src_files, offsets[:-1])]

    def read_tag(t: pa.Table) -> pa.Table:
        outs = []
        for path, off in zip(t["path"].to_pylist(), t["off"].to_pylist()):
            body = pq.read_table(path).replace_schema_metadata(None)
            gidx = off + np.arange(body.num_rows, dtype=np.int64)
            outs.append(body
                        .append_column("__g", pa.array(gidx, pa.int64()))
                        .append_column("__f", pa.array(
                            gidx // target_rows, pa.int64())))
        return pa.concat_tables(outs) if outs else pa.table(
            {"__g": pa.array([], pa.int64()),
             "__f": pa.array([], pa.int64())})

    def write_file(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"f": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        f = int(t["__f"][0].as_py())
        order = pc.sort_indices(t, sort_keys=[("__g", "ascending")])
        body = t.take(order).drop_columns(["__g", "__f"]).combine_chunks()
        tmp = f"{dst_dir}/.part-{f:05d}.parquet.tmp"
        pq.write_table(body, tmp)
        os.replace(tmp, f"{dst_dir}/part-{f:05d}.parquet")
        return pa.table({"f": pa.array([f], pa.int64()),
                         "n": pa.array([body.num_rows], pa.int64())})

    manifest = rd.from_items(items, override_num_blocks=len(items)) \
        .map_batches(read_tag, batch_format="pyarrow", batch_size=None) \
        .groupby("__f").map_groups(write_file, batch_format="pyarrow")
    mtab = pa.concat_tables(list(manifest.iter_batches(
        batch_format="pyarrow", batch_size=1 << 20)))
    mtab = mtab.take(pc.sort_indices(mtab, sort_keys=[("f", "ascending")]))
    pq.write_table(mtab.combine_chunks(), f"{dst_dir}/_manifest.parquet")
    with open(f"{dst_dir}/_SUCCESS", "w", encoding="utf-8") as fh:
        fh.write("ok")
    return mtab
