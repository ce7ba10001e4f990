"""Stream-shaped operators over ordered event logs.

Ray Data has no event-time windows/watermarks (ray_guide "Streaming-shaped
workloads"); windows are expressed as grouped computations over per-key
sorted groups.  Ordering assumption: events of one key fit one partition
group and are sorted there (hash-partition by key, sort within partition) —
stated per operator.

* tumbling windows     -> vectorized temporal floor + grouped aggregate
  (``events_hourly`` query);
* session windows      -> :func:`sessionize` below (gap-based);
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(ds, user_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value", gap_seconds: float = 1800.0,
               num_partitions: int = 32, value_scale: int | None = None):
    """Gap-based session windows: a new session starts when the inter-event
    gap within a key exceeds ``gap_seconds``.

    Returns (user_id, session_id [1-based per user], n_events,
    session_start, session_end, total_value).  Implementation: hash-partition
    by user, then ONE vectorized pass per partition (sort by (user, ts),
    boundary mask, cumulative session numbering) — no per-user Python.

    ``value_scale``: when the value column is a fixed-point decimal stored as
    float (e.g. cents -> scale 100), sum round(v*scale) as int64 and divide
    back, so total_value is exact and independent of summation order (float
    reduceat over ts-sorted rows associates differently than an engine
    summing in scan order — same convention as the oracled money sums).
    """
    def add_part(t: pa.Table) -> pa.Table:
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        from ..sketchlib.hashing import mix64

        return t.append_column(
            "__part", pa.array((mix64(u) % num_partitions).astype(np.uint32),
                               pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        order = pc.sort_indices(t, sort_keys=[(user_col, "ascending"),
                                              (ts_col, "ascending")])
        t = t.take(order)
        users = t[user_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        vals = t[value_col].to_numpy(zero_copy_only=False)
        n = len(users)
        if n == 0:
            return pa.table({user_col: pa.array([], pa.int64()),
                             "session_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "session_start": pa.array([], pa.timestamp("us")),
                             "session_end": pa.array([], pa.timestamp("us")),
                             "total_value": pa.array([], pa.float64())})
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        gap = np.empty(n, dtype=np.float64)
        gap[0] = np.inf
        gap[1:] = (ts[1:] - ts[:-1]) / np.timedelta64(1, "s")
        new_sess = new_user | (gap > gap_seconds)
        # per-user 1-based session numbering: cumulative new-session count
        # minus the count at the user's first row
        sess_cum = np.cumsum(new_sess)
        user_start = np.maximum.accumulate(np.where(new_user,
                                                    np.arange(n), 0))
        session_id = sess_cum - sess_cum[user_start] + 1
        # aggregate per (run of equal session): boundaries are new_sess
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n)
        out_user = users[starts]
        out_sid = session_id[starts]
        out_n = (ends - starts).astype(np.int64)
        out_start = ts[starts]
        out_end = ts[ends - 1]
        if value_scale is not None:
            cents = np.rint(vals * value_scale).astype(np.int64)
            out_val = np.add.reduceat(cents, starts) / float(value_scale)
        else:
            out_val = np.add.reduceat(vals, starts)
        return pa.table({
            user_col: pa.array(out_user),
            "session_id": pa.array(out_sid, pa.int64()),
            "n_events": pa.array(out_n, pa.int64()),
            "session_start": pa.array(out_start, pa.timestamp("us")),
            "session_end": pa.array(out_end, pa.timestamp("us")),
            "total_value": pa.array(out_val, pa.float64()),
        })

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("__part").map_groups(per_partition,
                                           batch_format="pyarrow")


def hopping_window_aggregate(ds, key_col: str, ts_col: str,
                             window_us: int, hop_us: int,
                             value_col: str | None = None,
                             value_scale: int | None = 100):
    """Hopping (sliding) event-time windows: aggregate per ``key`` over
    windows of length ``window_us`` starting at every multiple of ``hop_us``
    (``window_us`` must be a multiple of ``hop_us``).  An event at time ``t``
    belongs to exactly ``window_us // hop_us`` windows, so the expansion
    factor is a small constant known up front — each batch repeats its rows
    k times vectorized (``np.repeat``) and tags the window start, then the
    engine's combiner-style :func:`grouped_aggregate
    <setsketch_ray.functions.relational.grouped_aggregate>` collapses to
    (#blocks x #keys x #windows) partial rows before anything shuffles.
    No sort, no per-key state; late/out-of-order events are handled by
    construction (window membership is a pure function of ``t``).

    ``value_scale`` integer-scales the value sums (deterministic parallel
    association, the engine-wide convention); the output ``total_value_c``
    stays in scaled integer units.

    Returns a pyarrow Table: (key, window_start, n_events[, total_value_c]).
    """
    from .relational import grouped_aggregate

    if window_us % hop_us:
        raise ValueError("window_us must be a multiple of hop_us")
    k = window_us // hop_us

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        s0 = ts // hop_us * hop_us
        idx = np.repeat(np.arange(n), k)
        offs = np.tile(np.arange(k, dtype=np.int64) * hop_us, n)
        cols = {
            key_col: t[key_col].take(pa.array(idx, pa.int64())),
            "window_start": pa.array(np.repeat(s0, k) - offs,
                                     pa.int64()).cast(pa.timestamp("us")),
        }
        if value_col is not None:
            v = t[value_col].to_numpy(zero_copy_only=False)
            if value_scale is not None:
                vc = np.rint(v * value_scale).astype(np.int64)
            else:
                vc = v.astype(np.int64)
            cols["__vc"] = pa.array(np.repeat(vc, k), pa.int64())
        return pa.table(cols)

    spec = {"n_events": ("count", None)}
    if value_col is not None:
        spec["total_value_c"] = ("sum", "__vc")
    return grouped_aggregate(ds.map_batches(expand, batch_format="pyarrow"),
                             [key_col, "window_start"], spec)


def running_sum(ds, key_col: str, ts_col: str, value_col: str,
                order_tiebreak: str, value_scale: int = 100,
                num_partitions: int = 32):
    """Per-key running total (the SQL ``SUM(v) OVER (PARTITION BY key ORDER
    BY ts, tiebreak ROWS UNBOUNDED PRECEDING)``): hash-partition by key,
    then per partition ONE vectorized lexsort by (key, ts, tiebreak) and a
    cumulative sum with per-key offsets — no per-key Python, no global sort.
    ``order_tiebreak`` pins determinism at equal timestamps; values are
    integer-scaled (``value_scale``) so the running total is exact and
    association-free, emitted as scaled int64 ``running_c``.
    """
    from ..sketchlib.hashing import mix64

    def add_part(t: pa.Table) -> pa.Table:
        g = t[key_col].to_numpy(zero_copy_only=False)
        h = mix64(g.astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        out_schema = pa.schema(
            [(n, t.schema.field(n).type) for n in t.column_names]
            + [("running_c", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tie = t[order_tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, keys))
        t = t.take(pa.array(order, pa.int64()))
        k = keys[order]
        v = np.rint(t[value_col].to_numpy(zero_copy_only=False)
                    * value_scale).astype(np.int64)
        cum = np.cumsum(v)
        new_key = np.empty(len(k), bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        idx = np.arange(len(k))
        start = np.maximum.accumulate(np.where(new_key, idx, 0))
        base = np.where(start > 0, cum[np.maximum(start - 1, 0)], 0)
        running = cum - base
        return t.append_column("running_c", pa.array(running, pa.int64()))

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("__part").map_groups(per_partition,
                                           batch_format="pyarrow")


def lag_lead(ds, key_col: str, ts_col: str, value_col: str,
             order_tiebreak: str, num_partitions: int = 32):
    """Per-key LAG/LEAD window (the SQL ``LAG(v) OVER (PARTITION BY key
    ORDER BY ts, tiebreak)`` / ``LEAD(v) OVER ...``): hash-partition by key,
    then per partition ONE vectorized lexsort by (key, ts, tiebreak) and two
    masked shifts — null at each key's first (lag) / last (lead) row.  Pure
    value copies, no arithmetic, so floats round-trip bit-exactly.
    ``order_tiebreak`` pins determinism at equal timestamps.  Appends
    ``prev_value`` / ``next_value`` with ``value_col``'s type.  Scale shape
    identical to :func:`running_sum` (shuffle volume = selected columns,
    per-partition work one lexsort).
    """
    from ..sketchlib.hashing import mix64

    def add_part(t: pa.Table) -> pa.Table:
        g = t[key_col].to_numpy(zero_copy_only=False)
        h = mix64(g.astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        vt = t.schema.field(value_col).type
        out_schema = pa.schema(
            [(n, t.schema.field(n).type) for n in t.column_names]
            + [("prev_value", vt), ("next_value", vt)])
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tie = t[order_tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, keys))
        t = t.take(pa.array(order, pa.int64()))
        k = keys[order]
        v = t[value_col].to_numpy(zero_copy_only=False)
        first = np.empty(len(k), bool)          # first row of its key
        first[0] = True
        first[1:] = k[1:] != k[:-1]
        last = np.empty(len(k), bool)           # last row of its key
        last[-1] = True
        last[:-1] = first[1:]
        prev = np.roll(v, 1)
        nxt = np.roll(v, -1)
        return t.append_column(
            "prev_value", pa.array(np.where(first, v, prev), vt,
                                   mask=first)) \
            .append_column(
            "next_value", pa.array(np.where(last, v, nxt), vt, mask=last))

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("__part").map_groups(per_partition,
                                           batch_format="pyarrow")


def debounce(ds, key_cols: list, ts_col: str, order_tiebreak: str,
             window_seconds: float, num_partitions: int = 32):
    """Event debouncing / throttling: drop a row whose PREVIOUS occurrence
    in its composite-key group is within ``window_seconds`` (the SQL
    ``lag(ts) OVER (PARTITION BY keys ORDER BY ts, tiebreak)`` filter —
    the stream-curation step that collapses repeat-fire events before
    they inflate downstream counts).

    Plain LAG semantics: each row compares against its immediate
    predecessor whether or not that predecessor was itself kept (exactly
    what the SQL window expresses; a kept-predecessor "strict debounce"
    chain is sequential by nature and intentionally not this operator).

    Scale shape: hash-partition by the composite key (one slim exchange
    of the selected columns), ONE vectorized lexsort + shifted compare
    per partition.  Returns the kept rows with original columns.
    """
    from ..sketchlib.hashing import hash_str_u64, mix2, mix64

    win_us = int(round(window_seconds * 1_000_000))

    def _key_hash(t: pa.Table) -> np.ndarray:
        h = None
        for c in key_cols:
            arr = t[c]
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
                else arr
            vals = arr.to_numpy(zero_copy_only=False)
            hc = mix64(vals.astype(np.uint64)) if vals.dtype.kind in "iu" \
                else hash_str_u64(arr)
            h = hc if h is None else mix2(h, hc)
        return h

    def add_part(t: pa.Table) -> pa.Table:
        h = _key_hash(t)
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        n = t.num_rows
        if n == 0:
            return t
        # group identity compares the REAL key columns (never a 64-bit
        # hash — collision-free by construction, repo convention)
        order = pc.sort_indices(t, sort_keys=[
            (c, "ascending") for c in key_cols]
            + [(ts_col, "ascending"), (order_tiebreak, "ascending")])
        t = t.take(order)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        same = np.ones(n - 1, bool) if n > 1 else np.zeros(0, bool)
        for c in key_cols:
            arr = t[c]
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
                else arr
            same &= pc.equal(arr.slice(1), arr.slice(0, n - 1)) \
                .to_numpy(zero_copy_only=False)
        keep = np.ones(n, bool)
        if n > 1:
            keep[1:] = ~(same & (ts[1:] - ts[:-1] <= win_us))
        return t.filter(pa.array(keep))

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("__part").map_groups(per_partition,
                                           batch_format="pyarrow")


def window_rank(ds, key_col: str, ts_col: str, order_tiebreak: str,
                num_partitions: int = 32):
    """Per-key ROW_NUMBER + PERCENT_RANK window (the SQL ``row_number()
    OVER (PARTITION BY key ORDER BY ts, tiebreak)`` pair): hash-partition by
    key, one lexsort per partition, ranks from per-key index offsets.
    ``percent_rank`` = (row_number-1)/(n-1) computed as one float64 division
    of identical integer operands on both engines (IEEE-identical); a
    single-row key emits 0.0 (the SQL convention).  ``order_tiebreak`` makes
    row numbering deterministic at equal timestamps.
    """
    from ..sketchlib.hashing import mix64

    def add_part(t: pa.Table) -> pa.Table:
        g = t[key_col].to_numpy(zero_copy_only=False)
        h = mix64(g.astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        out_schema = pa.schema(
            [(n, t.schema.field(n).type) for n in t.column_names]
            + [("row_number", pa.int64()), ("percent_rank", pa.float64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tie = t[order_tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, keys))
        t = t.take(pa.array(order, pa.int64()))
        k = keys[order]
        n = len(k)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_key, idx, 0))
        rn = idx - start + 1
        # key sizes scattered back to rows: end offset of each key's run
        starts = np.flatnonzero(new_key)
        sizes = np.diff(np.append(starts, n))
        per_row_n = np.repeat(sizes, sizes)
        pr = np.where(per_row_n > 1,
                      (rn - 1) / np.maximum(per_row_n - 1, 1), 0.0)
        return t.append_column("row_number", pa.array(rn, pa.int64())) \
            .append_column("percent_rank", pa.array(pr, pa.float64()))

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("__part").map_groups(per_partition,
                                           batch_format="pyarrow")


def window_cume_nth(ds, key_col: str, order_col: str, order_tiebreak: str,
                    nth: int, nth_out: str = "nth_id",
                    num_partitions: int = 32):
    """Per-key CUME_DIST + NTH_VALUE window: hash-partition by key, ONE
    lexsort per partition, both outputs from pure integer offsets.

    ``cume_dist`` follows the SQL tie rule — ties on ``order_col`` ALONE
    share the value (count of rows with order value <= current, / n) — and
    is one float64 division of identical integer operands on both engines.
    ``nth_value`` uses the (order_col, order_tiebreak) TOTAL order over the
    whole partition (the SQL ``ROWS BETWEEN UNBOUNDED PRECEDING AND
    UNBOUNDED FOLLOWING`` frame) and is null for keys with fewer than
    ``nth`` rows; the tiebreak pins determinism where SQL nth_value at
    equal order keys is implementation-defined.
    """
    from ..sketchlib.hashing import hash_str_u64, mix64

    def add_part(t: pa.Table) -> pa.Table:
        karr = t[key_col]
        karr = karr.combine_chunks() if isinstance(karr, pa.ChunkedArray) \
            else karr
        if pa.types.is_string(karr.type) \
                or pa.types.is_large_string(karr.type):
            h = hash_str_u64(karr)
        else:
            h = mix64(karr.to_numpy(zero_copy_only=False).astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        tie_type = t.schema.field(order_tiebreak).type
        out_schema = pa.schema(
            [(n, t.schema.field(n).type) for n in t.column_names]
            + [("cume_dist", pa.float64()), (nth_out, tie_type)])
        if t.num_rows == 0:
            return out_schema.empty_table()
        karr = t[key_col]
        karr = karr.combine_chunks() if isinstance(karr, pa.ChunkedArray) \
            else karr
        if pa.types.is_string(karr.type) \
                or pa.types.is_large_string(karr.type):
            keys = hash_str_u64(karr)          # sort key only (grouping)
        else:
            keys = karr.to_numpy(zero_copy_only=False)
        val = t[order_col].to_numpy(zero_copy_only=False)
        tie = t[order_tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, val, keys))
        t = t.take(pa.array(order, pa.int64()))
        k, v = keys[order], val[order]
        n = len(k)
        idx = np.arange(n, dtype=np.int64)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        key_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        starts = np.flatnonzero(new_key)
        sizes = np.diff(np.append(starts, n))
        key_n = np.repeat(sizes, sizes)
        # cume_dist: end rank (1-based, within key) of the order-value run
        new_run = new_key.copy()
        new_run[1:] |= v[1:] != v[:-1]
        run_starts = np.flatnonzero(new_run)
        run_ends = np.append(run_starts[1:], n)     # exclusive
        per_row_end = np.repeat(run_ends, np.diff(np.append(run_starts, n)))
        cume = (per_row_end - key_start) / key_n
        # nth_value over the whole partition: absolute index per key
        tie_sorted = t[order_tiebreak]
        nth_idx = key_start + (nth - 1)
        ok = key_n >= nth
        gather = pa.array(np.where(ok, nth_idx, 0), pa.int64())
        nth_vals = tie_sorted.take(gather)
        if not ok.all():
            nth_vals = pa.chunked_array([nth_vals]).combine_chunks() \
                if isinstance(nth_vals, pa.ChunkedArray) else nth_vals
            import pyarrow.compute as pc

            nth_vals = pc.if_else(pa.array(ok), nth_vals,
                                  pa.scalar(None, tie_type))
        return t.append_column("cume_dist", pa.array(cume, pa.float64())) \
            .append_column(nth_out, nth_vals)

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("__part").map_groups(per_partition,
                                           batch_format="pyarrow")


def window_ntile(ds, key_col: str, order_col: str, order_tiebreak: str,
                 n_tiles: int, num_partitions: int = 32):
    """Per-key NTILE window (the SQL ``ntile(n) OVER (PARTITION BY key ORDER
    BY col, tiebreak)``): hash-partition by key, one lexsort per partition,
    then the tile from pure integer arithmetic — with group size ``c`` and
    ``q, rem = divmod(c, n)``, the first ``rem`` tiles take ``q+1`` rows and
    the rest ``q`` (the SQL bucketing rule).  ``order_tiebreak`` pins a total
    order so tiles are deterministic (SQL ntile at equal order keys is
    implementation-defined).  Appends int64 ``tile``.
    """
    from ..sketchlib.hashing import hash_str_u64, mix64

    def add_part(t: pa.Table) -> pa.Table:
        karr = t[key_col]
        karr = karr.combine_chunks() if isinstance(karr, pa.ChunkedArray) \
            else karr
        if pa.types.is_string(karr.type) \
                or pa.types.is_large_string(karr.type):
            h = hash_str_u64(karr)
        else:
            h = mix64(karr.to_numpy(zero_copy_only=False).astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        out_schema = pa.schema(
            [(n, t.schema.field(n).type) for n in t.column_names]
            + [("tile", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        karr = t[key_col]
        karr = karr.combine_chunks() if isinstance(karr, pa.ChunkedArray) \
            else karr
        if pa.types.is_string(karr.type) \
                or pa.types.is_large_string(karr.type):
            # lexsort needs numeric keys; dictionary codes group equal keys
            # exactly (code ORDER is arbitrary — only run grouping matters)
            keys = karr.dictionary_encode().indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
        else:
            keys = karr.to_numpy(zero_copy_only=False)
        oc = t[order_col]
        if pa.types.is_timestamp(oc.type):
            oc = oc.cast(pa.int64())
        ov = oc.to_numpy(zero_copy_only=False)
        tie = t[order_tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ov, keys))
        t = t.take(pa.array(order, pa.int64()))
        k = keys[order]
        n = len(k)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_key, idx, 0))
        r0 = idx - start                     # 0-based rank within key
        starts = np.flatnonzero(new_key)
        sizes = np.diff(np.append(starts, n))
        c = np.repeat(sizes, sizes)          # group size per row
        q, rem = c // n_tiles, c % n_tiles
        cut = rem * (q + 1)                  # rows covered by the big tiles
        tile = np.where(
            r0 < cut,
            r0 // (q + 1) + 1,
            rem + (r0 - cut) // np.maximum(q, 1) + 1)
        return t.append_column("tile", pa.array(tile, pa.int64()))

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("__part").map_groups(per_partition,
                                           batch_format="pyarrow")


def rolling_sum(ds, key_col: str, ts_col: str, value_col: str,
                order_tiebreak: str, window_rows: int,
                value_scale: int = 100, num_partitions: int = 32):
    """Per-key bounded moving sum (the SQL ``SUM(v) OVER (PARTITION BY key
    ORDER BY ts, tiebreak ROWS BETWEEN window_rows PRECEDING AND CURRENT
    ROW)``): hash-partition by key, one lexsort per partition, then the
    window sum as a cumulative-sum DIFFERENCE — ``cum[i] - cum[lo-1]`` with
    ``lo = max(i - window_rows, key_start)`` — O(n) per partition, no
    per-row loop, no window materialization.  Values ride the
    integer-scaled domain (``value_scale``) so the sums are exact and
    association-free; emitted as scaled int64 ``rolling_c``.
    """
    from ..sketchlib.hashing import mix64

    def add_part(t: pa.Table) -> pa.Table:
        g = t[key_col].to_numpy(zero_copy_only=False)
        h = mix64(g.astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        out_schema = pa.schema(
            [(n, t.schema.field(n).type) for n in t.column_names]
            + [("rolling_c", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tie = t[order_tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, keys))
        t = t.take(pa.array(order, pa.int64()))
        k = keys[order]
        v = np.rint(t[value_col].to_numpy(zero_copy_only=False)
                    * value_scale).astype(np.int64)
        cum = np.cumsum(v)
        n = len(k)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_key, idx, 0))
        lo = np.maximum(idx - window_rows, start)
        base = np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        rolling = cum - base
        return t.append_column("rolling_c", pa.array(rolling, pa.int64()))

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("__part").map_groups(per_partition,
                                           batch_format="pyarrow")


def funnel_users(ds, key_col: str, ts_col: str, type_col: str,
                 steps: list[str], num_partitions: int = 32):
    """Ordered-funnel completion (the product-analytics classic): keys that
    performed ``steps[0]``, then ``steps[1]`` STRICTLY after it, then ... —
    each step anchored at the EARLIEST qualifying timestamp (the unique
    greedy choice, so results are deterministic without a tiebreak column).

    Hash-partition by key, one lexsort per partition, then one vectorized
    pass per step: ``np.minimum.at`` folds each step's qualifying rows to a
    per-key threshold for the next step — O(steps x rows), no per-user
    Python, rows never leave their key partition.

    Returns a Dataset of (key, ``ts_<i>_<step>`` for each step) — one row
    per completing key.
    """
    from ..sketchlib.hashing import mix64

    def add_part(t: pa.Table) -> pa.Table:
        g = t[key_col].to_numpy(zero_copy_only=False)
        h = mix64(g.astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    step_cols = [f"ts_{i}_{s}" for i, s in enumerate(steps)]

    def per_partition(t: pa.Table) -> pa.Table:
        key_t = t.schema.field(key_col).type
        ts_t = t.schema.field(ts_col).type
        empty = pa.table(
            {key_col: pa.array([], key_t),
             **{c: pa.array([], ts_t) for c in step_cols}})
        if t.num_rows == 0:
            return empty
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, keys))
        k = keys[order]
        ts = ts[order]
        typ = t[type_col].take(pa.array(order, pa.int64()))
        typ = typ.combine_chunks() if isinstance(typ, pa.ChunkedArray) \
            else typ
        n = len(k)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        kcode = np.cumsum(new_key) - 1          # dense per-partition key id
        n_keys = kcode[-1] + 1
        NONE = np.iinfo(np.int64).max
        thr = np.full(n_keys, np.iinfo(np.int64).min)
        hit_ts = []
        alive = np.ones(n_keys, bool)
        for si, step in enumerate(steps):
            is_step = pc.equal(typ, step).to_numpy(zero_copy_only=False)
            sel = is_step & (ts > thr[kcode]) & alive[kcode]
            nxt = np.full(n_keys, NONE)
            np.minimum.at(nxt, kcode[sel], ts[sel])
            alive &= nxt != NONE
            thr = nxt
            hit_ts.append(nxt)
        surv = np.flatnonzero(alive)
        if len(surv) == 0:
            return empty
        first_rows = np.flatnonzero(new_key)[surv]
        cols = {key_col: pa.array(k[first_rows]).cast(key_t)}
        for c, h in zip(step_cols, hit_ts):
            cols[c] = pa.array(h[surv], pa.int64()).cast(ts_t)
        return pa.table(cols)

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("__part").map_groups(per_partition,
                                           batch_format="pyarrow")


def weekly_retention(ds, key_col: str, ts_col: str,
                     bucket_us: int = 604_800_000_000,
                     num_partitions: int = 32) -> pa.Table:
    """Cohort retention: for every time bucket (default epoch week), how
    many distinct keys were active, and how many of those are active again
    in the NEXT bucket.  Per-batch (key, bucket) dedup partials, key-hash
    co-partition (a key's whole timeline meets in one partition), one
    lexsort + adjacent-difference pass, then a tiny per-bucket combine.
    Only distinct (key, bucket) pairs cross the shuffle.

    Returns a pyarrow Table (bucket int64, n_users, n_retained).
    """
    from ..sketchlib.hashing import mix64

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        pairs = pa.table({key_col: t[key_col],
                          "bucket": pa.array(ts // bucket_us, pa.int64())})
        uniq = pairs.group_by([key_col, "bucket"]).aggregate([])
        u = uniq[key_col].to_numpy(zero_copy_only=False)
        return uniq.append_column("__part", pa.array(
            (mix64(u.astype(np.uint64)) % np.uint64(num_partitions))
            .astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64()),
                             "n_retained": pa.array([], pa.int64())})
        k = t[key_col].to_numpy(zero_copy_only=False)
        b = t["bucket"].to_numpy(zero_copy_only=False)
        # global dedup of (key, bucket): batch partials can repeat a pair
        kb = np.stack([k, b], axis=1)
        kb = np.unique(kb, axis=0)
        k, b = kb[:, 0], kb[:, 1]
        # sorted by (key, bucket) from np.unique's lexicographic order
        same_key = k[1:] == k[:-1]
        retained = same_key & (b[1:] == b[:-1] + 1)
        # per-bucket counts: active keys, and keys retained into bucket+1
        buckets, n_users = np.unique(b, return_counts=True)
        ret_b, ret_n = np.unique(b[:-1][retained], return_counts=True)
        ret_map = dict(zip(ret_b.tolist(), ret_n.tolist()))
        n_ret = np.array([ret_map.get(x, 0) for x in buckets.tolist()],
                         dtype=np.int64)
        return pa.table({"bucket": pa.array(buckets, pa.int64()),
                         "n_users": pa.array(n_users.astype(np.int64)),
                         "n_retained": pa.array(n_ret)})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__part").map_groups(per_partition, batch_format="pyarrow")
    merged = pa.concat_tables(list(
        parts.iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    if merged.num_rows == 0:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64()),
                         "n_retained": pa.array([], pa.int64())})
    agg = merged.group_by(["bucket"]).aggregate(
        [("n_users", "sum"), ("n_retained", "sum")])
    agg = agg.take(pc.sort_indices(agg, sort_keys=[("bucket", "ascending")]))
    return pa.table({"bucket": agg["bucket"],
                     "n_users": agg["n_users_sum"].cast(pa.int64()),
                     "n_retained": agg["n_retained_sum"].cast(pa.int64())})


def dense_rank_first_value(ds, key_col: str, ts_col: str,
                           order_tiebreak: str, value_col: str,
                           value_scale: int = 100,
                           num_partitions: int = 32):
    """Per-key DENSE_RANK (over the integer-scaled value) + FIRST_VALUE
    (over time): hash-partition by key, then TWO lexsorts per partition —
    one by (key, value) for dense ranks (cumulative count of value-change
    boundaries within the key run), one by (key, ts, tiebreak) for the
    first value — each scattered back to the original row order through
    the inverse permutation.  No extra shuffle; appends int64
    ``dense_rank`` and ``first_value_c`` (scaled integer units).
    """
    from ..sketchlib.hashing import mix64

    def add_part(t: pa.Table) -> pa.Table:
        g = t[key_col].to_numpy(zero_copy_only=False)
        h = mix64(g.astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        out_schema = pa.schema(
            [(n, t.schema.field(n).type) for n in t.column_names]
            + [("dense_rank", pa.int64()), ("first_value_c", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tie = t[order_tiebreak].to_numpy(zero_copy_only=False)
        vc = np.rint(t[value_col].to_numpy(zero_copy_only=False)
                     * value_scale).astype(np.int64)
        n = len(keys)

        # dense_rank: sort by (key, value); boundary = new key OR new value
        o1 = np.lexsort((vc, keys))
        k1, v1 = keys[o1], vc[o1]
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = k1[1:] != k1[:-1]
        change = new_key.copy()
        change[1:] |= v1[1:] != v1[:-1]
        cum = np.cumsum(change)
        key_start_cum = np.maximum.accumulate(np.where(new_key, cum, 0))
        dr_sorted = cum - key_start_cum + 1
        dr = np.empty(n, np.int64)
        dr[o1] = dr_sorted

        # first_value: sort by (key, ts, tiebreak); repeat each key's first
        o2 = np.lexsort((tie, ts, keys))
        k2, v2 = keys[o2], vc[o2]
        nk2 = np.empty(n, bool)
        nk2[0] = True
        nk2[1:] = k2[1:] != k2[:-1]
        starts = np.flatnonzero(nk2)
        sizes = np.diff(np.append(starts, n))
        fv_sorted = np.repeat(v2[starts], sizes)
        fv = np.empty(n, np.int64)
        fv[o2] = fv_sorted

        return t.append_column("dense_rank", pa.array(dr, pa.int64())) \
            .append_column("first_value_c", pa.array(fv, pa.int64()))

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("__part").map_groups(per_partition,
                                           batch_format="pyarrow")


def global_prefix_sum(ds, order_col: str, value_col: str,
                      out_col: str = "cum", exclusive: bool = False,
                      num_partitions: int = 32):
    """Distributed prefix sum over a GLOBAL total order (the SQL
    ``SUM(v) OVER (ORDER BY order_col ROWS UNBOUNDED PRECEDING)`` with a
    unique integer order column) — the classic two-pass scan, no global
    sort of the data:

    1. two cheap metadata passes over the two columns only: per-block
       (min, max) of ``order_col`` → uniform range boundaries; then
       per-block per-range value sums → the driver's EXCLUSIVE
       per-partition offsets (a ``num_partitions``-element scan — tiny by
       construction; feed a materialized/cheap ``ds``, the plan executes
       once per pass);
    2. one ``groupby(range_partition)`` pass: each partition sorts its own
       rows by ``order_col``, cumsums, and adds its broadcast offset.

    Values must already be integers (scale upstream); ``order_col`` must
    be unique (ties would make the order — and therefore the scan —
    ambiguous).  ``exclusive=True`` emits the sum of strictly-preceding
    rows (the "start offset" form sequence packing needs).
    """
    import ray

    # ---- pass 1: range bounds + per-partition totals (metadata only)
    def block_stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        k = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"lo": pa.array([int(k.min())], pa.int64()),
                         "hi": pa.array([int(k.max())], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64()),
                         "s": pa.array([int(v.sum())], pa.int64())})

    stats = ds.select_columns([order_col, value_col]).map_batches(
        block_stats, batch_format="pyarrow").take_all()
    stats = [r for r in stats if r["n"] > 0]
    if not stats:
        return ds.map_batches(
            lambda t: t.append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow")
    lo = min(r["lo"] for r in stats)
    hi = max(r["hi"] for r in stats)
    span = hi - lo + 1
    if span > (1 << 62) // num_partitions:
        # (k - lo) * num_partitions must fit int64; key domains this wide
        # need a hashed-then-sorted layout instead of uniform ranges
        raise ValueError("global_prefix_sum: order_col span too wide for "
                         "uniform range partitioning")

    def part_of(k: np.ndarray) -> np.ndarray:
        return ((k - lo) * num_partitions // span).astype(np.int64)

    # per-partition totals: one more cheap pass (value sums per range)
    def part_sums(t: pa.Table) -> pa.Table:
        k = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # exact int64 per-partition sums (bincount weights= would go
        # through float64 and lose exactness past 2^53)
        exact = np.zeros(num_partitions, np.int64)
        np.add.at(exact, part_of(k), v)
        return pa.table({"p": pa.array(np.arange(num_partitions),
                                       pa.int64()),
                         "s": pa.array(exact, pa.int64())})

    partials = ds.select_columns([order_col, value_col]).map_batches(
        part_sums, batch_format="pyarrow").take_all()
    totals = np.zeros(num_partitions, np.int64)
    for r in partials:
        totals[r["p"]] += r["s"]
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])
    offsets_ref = ray.put(offsets)

    # ---- pass 2: per-partition sort + cumsum + broadcast offset
    def add_part(t: pa.Table) -> pa.Table:
        k = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__part", pa.array(part_of(k), pa.int64()))

    def per_partition(t: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref)
        p = int(t["__part"][0].as_py())
        t = t.drop_columns(["__part"])
        k = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(np.unique(k)) != len(k):
            raise ValueError("global_prefix_sum: order_col must be unique")
        order = np.argsort(k)
        t = t.take(pa.array(order, pa.int64()))
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(v) + offs[p]
        if exclusive:
            cum = cum - v
        return t.append_column(out_col, pa.array(cum, pa.int64()))

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def pack_sequences(ds, order_col: str, token_col: str, budget: int,
                   num_partitions: int = 32):
    """GPT-style sequence packing: documents are virtually concatenated in
    ``order_col`` order and the token stream is chunked every ``budget``
    tokens; each document reports its start offset in the stream and the
    chunk its first token lands in (training shard assignment).  One
    :func:`global_prefix_sum` (exclusive) — no driver-side data pull, no
    global sort.  Emits (order_col, token_col, ``start_tok``,
    ``chunk_id``)."""
    out = global_prefix_sum(ds, order_col, token_col, out_col="start_tok",
                            exclusive=True, num_partitions=num_partitions)

    def chunk(t: pa.Table) -> pa.Table:
        start = t["start_tok"].to_numpy(zero_copy_only=False)
        return pa.table({
            order_col: t[order_col],
            token_col: t[token_col],
            "start_tok": t["start_tok"],
            "chunk_id": pa.array(start // budget, pa.int64())})

    return out.map_batches(chunk, batch_format="pyarrow")


def gap_fill_ffill(ds, key_col: str, ts_col: str, value_col: str,
                   every_seconds: float, scale: int = 100,
                   num_partitions: int = 32):
    """Time-series resample with gap filling + forward fill (the SQL
    ``generate_series`` grid + ``last_value(x IGNORE NULLS)`` window): per
    key, bucket rows into fixed epoch-aligned windows of ``every_seconds``,
    then emit EVERY bucket in the key's [min, max] occupied range — empty
    buckets carry ``n = 0`` and the last occupied bucket's value sum
    (forward fill).  Output: ``(key, bucket, n, v_sum_c)`` with the value
    integer-scaled by ``scale`` (oracle convention: floor(v*scale+0.5)).

    Scale shape: per-block partial aggregation to (key, bucket, n, s) slim
    rows BEFORE the exchange (the raw event table never shuffles), one
    key-hash co-partition exchange of those partials, then one vectorized
    sort + np.repeat grid expansion + maximum.accumulate forward fill per
    partition.  Grid size is bounded by the key's active time span over
    ``every_seconds`` — the caller picks a bucket width that keeps
    span/width sane (a 100 TB event log at 1-minute buckets is ~0.5M rows
    per key-year: fine).  The first grid slot of every key is occupied by
    construction (the range starts at the min occupied bucket), so the
    forward fill never crosses a key boundary.
    """
    from ..sketchlib.hashing import hash_str_u64, mix64

    every_us = int(round(every_seconds * 1_000_000))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], t.schema.field(key_col).type),
                             "b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        # normalize to µs FIRST — a bare int64 cast yields the column's own
        # unit (a timestamp[s] column would come out in seconds)
        ts = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False)
        tbl = pa.table({
            key_col: t[key_col],
            "b": pa.array(ts // every_us, pa.int64()),
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "s": pa.array(np.floor(v * scale + 0.5).astype(np.int64)),
        })
        agg = tbl.group_by([key_col, "b"]).aggregate([("n", "sum"),
                                                      ("s", "sum")])
        return pa.table({key_col: agg[key_col], "b": agg["b"],
                         "n": agg["n_sum"], "s": agg["s_sum"]})

    def add_part(t: pa.Table) -> pa.Table:
        arr = t[key_col]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        vals = arr.to_numpy(zero_copy_only=False) \
            if not pa.types.is_string(arr.type) else None
        h = hash_str_u64(arr) if vals is None else \
            mix64(vals.astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        empty = pa.table({key_col: pa.array([], t.schema.field(key_col).type),
                          "bucket": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "v_sum_c": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        # final combine of the per-block partials, then sort by (key, b)
        agg = t.group_by([key_col, "b"]).aggregate([("n", "sum"),
                                                    ("s", "sum")])
        agg = agg.sort_by([(key_col, "ascending"), ("b", "ascending")])
        key = agg[key_col].combine_chunks() if isinstance(
            agg[key_col], pa.ChunkedArray) else agg[key_col]
        b = agg["b"].to_numpy(zero_copy_only=False)
        n = agg["n_sum"].to_numpy(zero_copy_only=False)
        s = agg["s_sum"].to_numpy(zero_copy_only=False)
        m = len(b)
        starts = np.ones(m, bool)
        if m > 1:
            starts[1:] = ~pc.equal(key.slice(1), key.slice(0, m - 1)) \
                .to_numpy(zero_copy_only=False)
        start_idx = np.nonzero(starts)[0]
        end_idx = np.append(start_idx[1:], m) - 1
        b0, b1 = b[start_idx], b[end_idx]
        counts = b1 - b0 + 1
        total = int(counts.sum())
        ngroups = len(start_idx)
        cumstarts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        # full grid: bucket = b0[g] + offset within group
        grp_of_slot = np.repeat(np.arange(ngroups), counts)
        bucket = np.repeat(b0, counts) + \
            (np.arange(total) - np.repeat(cumstarts, counts))
        # scatter occupied rows into their grid slots
        grp_of_row = np.repeat(np.arange(ngroups), end_idx - start_idx + 1)
        pos = cumstarts[grp_of_row] + (b - b0[grp_of_row])
        n_full = np.zeros(total, np.int64)
        n_full[pos] = n
        s_full = np.zeros(total, np.int64)
        s_full[pos] = s
        valid = np.zeros(total, bool)
        valid[pos] = True
        last = np.maximum.accumulate(np.where(valid, np.arange(total), -1))
        out_key = key.take(pa.array(start_idx)).take(pa.array(grp_of_slot))
        return pa.table({key_col: out_key,
                         "bucket": pa.array(bucket, pa.int64()),
                         "n": pa.array(n_full, pa.int64()),
                         "v_sum_c": pa.array(s_full[last], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    partials = partials.map_batches(add_part, batch_format="pyarrow")
    return partials.groupby("__part").map_groups(per_partition,
                                                 batch_format="pyarrow")


def rolling_stats(ds, key_col: str, ts_col: str, value_col: str,
                  order_tiebreak: str, window_rows: int,
                  value_scale: int = 100, num_partitions: int = 32):
    """Per-key bounded moving count/sum/sum-of-squares in ONE pass (the
    sufficient statistics for rolling mean/variance/z-score): the same
    hash-partition + lexsort + cumulative-difference plan as
    :func:`rolling_sum`, with two cumsums instead of one.  Integer-scaled
    domain, so every statistic is exact and association-free.  Appends
    ``rolling_n`` / ``rolling_s`` / ``rolling_ss`` (int64; the squares are
    in scaled-units^2)."""
    from ..sketchlib.hashing import mix64

    def add_part(t: pa.Table) -> pa.Table:
        g = t[key_col].to_numpy(zero_copy_only=False)
        h = mix64(g.astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        out_schema = pa.schema(
            [(n, t.schema.field(n).type) for n in t.column_names]
            + [("rolling_n", pa.int64()), ("rolling_s", pa.int64()),
               ("rolling_ss", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tie = t[order_tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, keys))
        t = t.take(pa.array(order, pa.int64()))
        k = keys[order]
        v = np.rint(t[value_col].to_numpy(zero_copy_only=False)
                    * value_scale).astype(np.int64)
        cum = np.cumsum(v)
        cum2 = np.cumsum(v * v)
        n = len(k)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_key, idx, 0))
        lo = np.maximum(idx - window_rows, start)
        base = np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        base2 = np.where(lo > 0, cum2[np.maximum(lo - 1, 0)], 0)
        return t.append_column(
            "rolling_n", pa.array(idx - lo + 1, pa.int64())) \
            .append_column("rolling_s", pa.array(cum - base, pa.int64())) \
            .append_column("rolling_ss",
                           pa.array(cum2 - base2, pa.int64()))

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("__part").map_groups(per_partition, batch_format="pyarrow")
