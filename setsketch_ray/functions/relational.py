"""Relational helpers: partial (combiner-style) grouped aggregation.

Ray Data's built-in ``groupby().aggregate(...)`` is a sort-based all-to-all
over every row — measured ~420 ms per 9k-row block on string keys.  For
low-cardinality groupings the right plan (ray_guide "Aggregation at scale")
is: vectorized pyarrow ``Table.group_by`` partials inside ``map_batches``
(one row per key per block), then a tiny final combine.  600k rows collapse
to (#blocks x #groups) partial rows before anything shuffles.

``final="driver"`` combines the partials on the driver with one pyarrow
group_by (they are tiny); ``final="ray"`` keeps the combine distributed for
high-cardinality keys at 100 TB scale.
"""

from __future__ import annotations

import pyarrow as pa

_COMBINE_OP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def grouped_aggregate(ds, keys: list[str], spec: dict[str, tuple[str, str | None]],
                      final: str = "driver"):
    """Distributed grouped aggregation with per-batch partials.

    ``spec``: {out_col: (op, in_col)} with op in sum|count|min|max|mean
    (``in_col`` may be None for count).  Returns a pyarrow Table
    (final="driver") or a Ray Dataset (final="ray").
    """
    # physical partial ops, deduplicated by (op, col): one partial column can
    # serve several output columns (e.g. mean + sum of the same input)
    physical: dict[tuple[str, str], str] = {}     # (op, col) -> partial name
    finals: dict[str, tuple] = {}                 # out -> ("plain", p) | ("mean", s, c)

    def _phys(op: str, col: str) -> str:
        key = (op, col)
        if key not in physical:
            physical[key] = f"__p{len(physical)}_{op}_{col}"
        return physical[key]

    for out, (op, col) in spec.items():
        if op == "mean":
            finals[out] = ("mean", _phys("sum", col), _phys("count", col))
        elif op == "count":
            finals[out] = ("plain", _phys("count", col or keys[0]))
        else:
            finals[out] = ("plain", _phys(op, col))

    # arrow group_by names outputs "<col>_<op>"; ordering follows the agg list
    agg_list = [(col, op) for (op, col) in physical.keys()]
    partial_names = list(physical.values())

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(keys).aggregate(agg_list)
        # positional rename: aggregate outputs come first, keys last (arrow
        # appends key columns after aggregates)
        out_cols = {}
        non_key = [n for n in agg.column_names if n not in keys]
        assert len(non_key) == len(partial_names)
        for arrow_name, pname in zip(non_key, partial_names):
            out_cols[pname] = agg[arrow_name]
        for k in keys:
            out_cols[k] = agg[k]
        return pa.table(out_cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def combine(table: pa.Table) -> pa.Table:
        combine_list = []
        combined_name = {}
        for (op, col), pname in physical.items():
            cop = _COMBINE_OP[op]
            combine_list.append((pname, cop))
            combined_name[pname] = f"{pname}_{cop}"
        combined = table.group_by(keys).aggregate(combine_list)
        cols = {k: combined[k] for k in keys}
        for out, how in finals.items():
            if how[0] == "plain":
                cols[out] = combined[combined_name[how[1]]]
            else:
                import pyarrow.compute as pc

                s = combined[combined_name[how[1]]]
                c = combined[combined_name[how[2]]]
                cols[out] = pc.divide(pc.cast(s, pa.float64()),
                                      pc.cast(c, pa.float64()))
        return pa.table(cols)

    if final == "driver":
        batches = list(partials.iter_batches(batch_format="pyarrow",
                                             batch_size=1 << 20))
        if not batches:
            return pa.table({})
        return combine(pa.concat_tables(batches))
    # distributed final: one more (much smaller) shuffle
    return partials.repartition(1).map_batches(combine, batch_format="pyarrow")


def top_k_per_group(ds, group_col: str, order_col: str, k: int,
                    tiebreak_col: str | None = None,
                    num_partitions: int = 32):
    """Top-k rows per group by ``order_col`` descending (ties broken by
    ``tiebreak_col`` ascending): hash-partition by group, then ONE vectorized
    lexsort + rank pass per partition — no per-group Python, no global sort.
    """
    import numpy as np

    from ..sketchlib.hashing import mix64

    def add_part(t: pa.Table) -> pa.Table:
        garr = t[group_col]
        garr = garr.combine_chunks() if isinstance(garr, pa.ChunkedArray) \
            else garr
        if pa.types.is_string(garr.type) \
                or pa.types.is_large_string(garr.type):
            from ..sketchlib.hashing import hash_str_u64

            h = hash_str_u64(garr)      # vectorized over the Arrow buffer
        else:
            h = mix64(garr.to_numpy(zero_copy_only=False).astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % num_partitions).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        if t.num_rows == 0:
            return t
        import pyarrow.compute as pc

        keys = [(group_col, "ascending"), (order_col, "descending")]
        if tiebreak_col:
            keys.append((tiebreak_col, "ascending"))
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        g = t[group_col].to_numpy(zero_copy_only=False)
        new_g = np.empty(len(g), dtype=bool)
        new_g[0] = True
        new_g[1:] = g[1:] != g[:-1]
        # rank within group = index - index of group start
        idx = np.arange(len(g))
        start = np.maximum.accumulate(np.where(new_g, idx, 0))
        rank = idx - start
        return t.filter(pa.array(rank < k))

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("__part").map_groups(per_partition,
                                           batch_format="pyarrow")


_KNUTH = 2654435761  # Knuth multiplicative hash constant (SQL-expressible)


def hash_fraction_column(t: pa.Table, key_col: str) -> "np.ndarray":
    """Deterministic per-row uniform fraction in [0, 1): Knuth multiplicative
    hash of an integer key, mod 2^32.  The SAME arithmetic is expressible in
    ANSI SQL (``(key * 2654435761) % 4294967296 / 4294967296.0``), so
    sampling/splitting operators built on it have exact DuckDB oracles —
    unlike our 64-bit mixers."""
    import numpy as np

    k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = (k * np.uint64(_KNUTH)) % np.uint64(1 << 32)
    return h.astype(np.float64) / float(1 << 32)


def bottom_k_sample(ds, key_col: str, k: int, num_partitions: int = 32):
    """Exact-size uniform row sample as a MERGEABLE bottom-k sketch: rank
    every row by the SQL-expressible Knuth hash of its unique integer key
    (``hash_fraction_column``'s arithmetic) and keep the k smallest.

    Mergeable (union partials, keep k smallest overall) and independent of
    partitioning — the sample is a pure function of the key set, so resumed
    / re-partitioned runs reproduce it bit-identically, and DuckDB can
    oracle it exactly: ``ORDER BY (key * 2654435761) % 4294967296, key
    LIMIT k``.  Per-batch combiner keeps <= k rows per block, so the final
    sort sees k x blocks rows, never the dataset.

    Contract: ``key_col`` is a unique non-negative int64 (ids).  Overflow
    guard: key * 2654435761 must stay < 2^63 (key < ~3.5e9) so the engine's
    uint64 arithmetic and DuckDB's non-wrapping BIGINT agree; asserted per
    batch.
    """
    import numpy as np

    def local_k(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__h", pa.array([], pa.uint64()))
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        if key.max(initial=0) >= (1 << 63) // _KNUTH:
            raise ValueError(
                "bottom_k_sample: key too large for the SQL-expressible hash")
        h = (key * np.uint64(_KNUTH)) % np.uint64(1 << 32)
        if t.num_rows > k:
            order = np.lexsort((key, h))[:k]
            t = t.take(pa.array(order))
            h = h[order]
        return t.append_column("__h", pa.array(h, pa.uint64()))

    partials = ds.map_batches(local_k, batch_format="pyarrow")
    return partials.sort(key=["__h", key_col]).limit(k) \
        .drop_columns(["__h"])


def weighted_bottom_k_sample(ds, key_col: str, weight_col: str, k: int,
                             mode: str = "integer_race", salt: int = 0):
    """Deterministic weighted bottom-k sample (weighted reservoir shape).

    ``mode="integer_race"`` (default — exactly SQL-oracle-able): rank each
    row by the PURE-INTEGER priority ``p = (h << 20) // w`` where ``h`` is
    the SQL-expressible Knuth 32-bit hash of the unique integer key and
    ``w`` the positive int64 weight; keep the k smallest by ``(p, key)``.
    Heavier rows draw stochastically smaller priorities (the u/w uniform
    race), so inclusion probability rises monotonically with weight — but
    NOT exactly proportionally (that needs the exponential race below).
    The spec is a pure function of the (key, weight) set: mergeable,
    partition/resume invariant, and bit-reproducible in ANSI SQL as
    ``ORDER BY ((key*2654435761)%4294967296)*1048576 // w, key LIMIT k``.
    ``h * 2^20 < 2^52`` keeps every product inside exact BIGINT range.

    ``mode="exp_race"``: Efraimidis–Spirakis without-replacement sampling
    with EXACT proportional inclusion: ``p = -ln((h+0.5)/2^32) / w``.
    Float priorities — numpy's SIMD log and an engine's libm are not
    bitwise-identical, so this mode is for library callers and statistical
    tests, never the oracle path.  ``salt`` selects an independent replicate
    (exp_race draws ride the NONLINEAR 64-bit mixer — the Knuth hash is
    linear, so salted copies of it are perfectly correlated across keys and
    useless as replicates; integer_race ignores ``salt`` nonlinearity since
    its single draw must stay SQL-expressible).

    Contract: ``key_col`` unique non-negative int64 small enough for the
    non-wrapping hash (asserted); ``weight_col`` positive int64.
    """
    import numpy as np

    if mode not in ("integer_race", "exp_race"):
        raise ValueError(f"weighted_bottom_k_sample: bad mode {mode!r}")

    def local_k(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            typ = pa.uint64() if mode == "integer_race" else pa.float64()
            return t.append_column("__p", pa.array([], typ))
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if w.min(initial=1) <= 0:
            raise ValueError("weighted_bottom_k_sample: weights must be > 0")
        if mode == "integer_race":
            ks = key + salt * 1000003
            if ks.max(initial=0) >= (1 << 63) // int(_KNUTH) or ks.min() < 0:
                raise ValueError(
                    "weighted_bottom_k_sample: key outside the SQL-safe "
                    "range")
            h = (ks.astype(np.uint64) * np.uint64(_KNUTH)) \
                % np.uint64(1 << 32)
            p = ((h.astype(np.int64) << 20) // w).astype(np.uint64)
            parr = pa.array(p, pa.uint64())
        else:
            from ..sketchlib.hashing import mix64

            h = mix64(key.astype(np.uint64)
                      ^ np.uint64(salt * 0x9E3779B97F4A7C15 % (1 << 64)))
            u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) \
                / float(1 << 53)
            p = -np.log(u) / w
            parr = pa.array(p, pa.float64())
        if t.num_rows > k:
            order = np.lexsort((key, p))[:k]
            t = t.take(pa.array(order))
            parr = parr.take(pa.array(order))
        return t.append_column("__p", parr)

    partials = ds.map_batches(local_k, batch_format="pyarrow")
    return partials.sort(key=["__p", key_col]).limit(k) \
        .drop_columns(["__p"])


def stratified_sample(ds, group_col: str, key_col: str, k: int,
                      num_partitions: int = 32):
    """Deterministic stratified sample: the k hash-smallest rows of EVERY
    group (same SQL-expressible Knuth hash as :func:`bottom_k_sample`, so
    DuckDB oracles it exactly with ``QUALIFY row_number() OVER (PARTITION BY
    group ORDER BY (key * 2654435761) % 4294967296, key) <= k``).

    Two-phase: a per-batch combiner keeps <= k rows per group per block
    (the shuffle then carries at most k * groups * blocks rows, never the
    dataset), then one hash co-partition by group + the same vectorized
    rank pass finishes each group.  Partitioning/resume invariant — the
    sample is a pure function of each group's key set.
    """
    import numpy as np

    from ..sketchlib.hashing import hash_str_u64, mix64

    def _keep_k_smallest(t: pa.Table) -> pa.Table:
        """Rows with rank < k within group by (hash, key) ascending."""
        if t.num_rows == 0:
            return t
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        if key.max(initial=0) >= (1 << 63) // _KNUTH:
            raise ValueError(
                "stratified_sample: key too large for the SQL-expressible "
                "hash")
        h = (key * np.uint64(_KNUTH)) % np.uint64(1 << 32)
        garr = t[group_col]
        garr = garr.combine_chunks() if isinstance(garr, pa.ChunkedArray) \
            else garr
        if pa.types.is_string(garr.type) or pa.types.is_large_string(garr.type):
            g = hash_str_u64(garr)
        else:
            g = mix64(garr.to_numpy(zero_copy_only=False).astype(np.uint64))
        order = np.lexsort((key, h, g))
        gs = g[order]
        new_g = np.empty(len(gs), dtype=bool)
        new_g[0] = True
        new_g[1:] = gs[1:] != gs[:-1]
        idx = np.arange(len(gs))
        start = np.maximum.accumulate(np.where(new_g, idx, 0))
        keep = order[(idx - start) < k]
        return t.take(pa.array(np.sort(keep)))

    def _part(t: pa.Table) -> pa.Table:
        garr = t[group_col]
        garr = garr.combine_chunks() if isinstance(garr, pa.ChunkedArray) \
            else garr
        if pa.types.is_string(garr.type) or pa.types.is_large_string(garr.type):
            g = hash_str_u64(garr)
        else:
            import numpy as _np

            g = mix64(garr.to_numpy(zero_copy_only=False).astype(_np.uint64))
        return t.append_column("__part", pa.array(
            (g % num_partitions).astype(np.uint32), pa.uint32()))

    local = ds.map_batches(
        lambda t: _part(_keep_k_smallest(t)), batch_format="pyarrow")
    return local.groupby("__part").map_groups(
        lambda t: _keep_k_smallest(t.drop_columns(["__part"])),
        batch_format="pyarrow")


def sample_by_key(ds, key_col: str, fraction: float):
    """Deterministic Bernoulli sample: keep rows whose hash fraction falls
    below ``fraction``.  Reproducible across runs/workers and restartable —
    no RNG state, membership is a pure function of the key."""

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(hash_fraction_column(t, key_col) < fraction))

    return ds.map_batches(filt, batch_format="pyarrow")


def train_val_test_split(ds, key_col: str, val_fraction: float = 0.05,
                         test_fraction: float = 0.05):
    """Append a deterministic ``split`` column (train/val/test) keyed by the
    row's hash fraction — the standard leakage-safe corpus split (same key
    always lands in the same split, across reruns and cluster sizes)."""

    def add_split(t: pa.Table) -> pa.Table:
        import numpy as np

        f = hash_fraction_column(t, key_col)
        split = np.where(f < test_fraction, "test",
                         np.where(f < test_fraction + val_fraction,
                                  "val", "train"))
        return t.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(add_split, batch_format="pyarrow")


def count_distinct(ds, column: str, num_partitions: int = 64) -> int:
    """Exact distinct count, fully distributed: per-batch unique partials ->
    hash-partition by value -> per-partition unique count -> sum of tiny
    per-partition counts.  No driver-side value set (VERDICT r1 #7: the old
    Python set was unbounded for high-cardinality columns)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..sketchlib.hashing import hash_str_u64, mix64

    def uniq(batch: pa.Table) -> pa.Table:
        vals = pc.unique(batch[column])
        v = vals.to_numpy(zero_copy_only=False)
        if v.dtype.kind in "iu":
            h = mix64(v.astype(np.uint64))
        elif v.dtype.kind == "f":
            h = mix64(v.view(np.uint64))
        else:
            h = hash_str_u64([str(x) for x in v])
        return pa.table({column: vals,
                         "__part": pa.array((h % num_partitions)
                                            .astype(np.uint32), pa.uint32())})

    def part_count(t: pa.Table) -> pa.Table:
        n = len(pc.unique(t[column]))
        return pa.table({"n": pa.array([n], pa.int64())})

    parts = ds.map_batches(uniq, batch_format="pyarrow")
    counts = parts.groupby("__part").map_groups(part_count,
                                                batch_format="pyarrow")
    total = 0
    for b in counts.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        total += int(pc.sum(b["n"]).as_py() or 0)
    return total


_BCJOIN_WORKER_CACHE: dict = {}


def broadcast_join(left, right: pa.Table, left_key: str, right_key: str,
                   how: str = "inner"):
    """Map-side equi-join against a SMALL in-memory right table: the right
    side is ``ray.put`` ONCE and each task gathers matches with a vectorized
    ``pc.index_in`` — the big left never enters an exchange.  This is the
    "share one exchange across chained joins" fix for the TPC-H chains
    (Q5/Q8/Q9): the first join co-partitions the fact table once
    (:func:`lookup_join`); every later dimension side (supplier, part,
    nation) attaches map-side, so the fact rows are shuffled exactly once.

    Use when ``right`` fits a worker heap (dimension tables; the object
    store shares one copy per node).  :func:`lookup_join` is the
    beyond-broadcast path.  Contract: ``right`` unique on ``right_key``, no
    null keys.  Output: left columns + right columns minus ``right_key``
    (``how="inner"`` drops unmatched left rows; ``how="left"`` null-pads).
    """
    import pyarrow.compute as pc
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join: bad how {how!r}")
    right = right.combine_chunks()
    rref = ray.put(right)
    out_cols = [c for c in right.column_names if c != right_key]

    def join(t: pa.Table) -> pa.Table:
        key = ("bcjoin", rref.hex())
        r = _BCJOIN_WORKER_CACHE.get(key)
        if r is None:
            _BCJOIN_WORKER_CACHE.clear()
            r = ray.get(rref)
            _BCJOIN_WORKER_CACHE[key] = r
        idx = pc.index_in(t[left_key], value_set=r[right_key])
        if how == "inner":
            valid = pc.is_valid(idx)
            t = t.filter(valid)
            idx = idx.filter(valid)
        for c in out_cols:
            t = t.append_column(c, pc.take(r[c], idx))
        return t

    return left.map_batches(join, batch_format="pyarrow")


def lookup_join(left, right, left_key: str, right_key: str,
                num_partitions: int = 32,
                left_schema: "pa.Schema | None" = None,
                right_schema: "pa.Schema | None" = None,
                how: str = "inner"):
    """Distributed inner / left outer (``how="left"``) / full outer
    (``how="full"``) equi-join against a UNIQUE-keyed right side, built from the primitives this engine already
    shuffles with: hash co-partition both sides, one union, one
    ``groupby("__part")``, and a vectorized ``pc.index_in`` gather inside
    each partition.  ``how="left"`` keeps unmatched left rows with
    null-padded right columns (the gather rides the same index array — a
    null index takes null, no extra pass); ``how="full"`` additionally
    appends right rows no left row matched (null left columns) and keeps
    ``right_key`` in the output — the SQL FULL JOIN layout.

    Why not ``ray.data.Dataset.join``: each call spins up a fresh pool of
    ``num_partitions`` aggregator ACTORS (cold-start measured ~20 s at small
    scale, and pool churn per call in iterative algorithms like label
    propagation); this task-based plan ships the same bytes through the same
    all-to-all with no pool to warm.

    Contract: ``right`` is unique on ``right_key`` (lookup semantics;
    duplicates would multiply rows — asserted per partition); key columns
    contain no nulls; overlapping output names must be pre-renamed by the
    caller.  Output columns: all left columns + right columns minus
    ``right_key``.

    Pass ``left_schema``/``right_schema`` (pyarrow) when the input is a lazy
    Dataset whose schema you already know — ``ds.schema()`` on a lazy plan
    executes its first block, which matters in iterative callers.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..sketchlib.hashing import hash_str_u64, mix64

    if how not in ("inner", "left", "full"):
        raise ValueError(f"lookup_join: bad how {how!r}")
    lschema = left_schema if left_schema is not None \
        else left.schema().base_schema
    rschema = right_schema if right_schema is not None \
        else right.schema().base_schema
    left_cols = list(lschema.names)
    right_out = [n for n in rschema.names if n != right_key]
    # unified (null-padded) schema for the tagged union
    fields = [(n, lschema.field(n).type) for n in left_cols]
    fields += [(n, rschema.field(n).type) for n in rschema.names
               if n not in left_cols]

    def _key_hash(arr) -> "np.ndarray":
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_string(a.type) or pa.types.is_large_string(a.type) \
                or pa.types.is_binary(a.type):
            return hash_str_u64(a)
        return mix64(a.to_numpy(zero_copy_only=False).astype(np.uint64))

    def _tag(side: int, key_col: str):
        def fn(t: pa.Table) -> pa.Table:
            h = _key_hash(t[key_col])
            cols = {}
            for name, typ in fields:
                if name in t.column_names:
                    cols[name] = t[name]
                else:
                    cols[name] = pa.nulls(t.num_rows, typ)
            cols["__side"] = pa.array(
                np.full(t.num_rows, side, np.int8), pa.int8())
            cols["__part"] = pa.array(
                (h % np.uint64(num_partitions)).astype(np.uint32),
                pa.uint32())
            return pa.table(cols)
        return fn

    tagged = left.map_batches(_tag(0, left_key), batch_format="pyarrow") \
        .union(right.map_batches(_tag(1, right_key), batch_format="pyarrow"))

    # how="full" keeps right_key in the output (right-only rows carry a null
    # left key, so the join key must survive on the right side — SQL FULL
    # JOIN layout); inner/left drop it as before
    keep_right = right_out if how != "full" else \
        [n for n in rschema.names]
    out_names = left_cols + [n for n in keep_right if n not in left_cols]
    out_types = {n: t for n, t in fields}

    def merge(t: pa.Table) -> pa.Table:
        empty = pa.table({n: pa.array([], out_types[n]) for n in out_names})
        if t.num_rows == 0:
            return empty
        side = t["__side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0))
        rt = t.filter(pa.array(side == 1))
        if lt.num_rows == 0:
            if how != "full" or rt.num_rows == 0:
                return empty
            cols = {n: pa.nulls(rt.num_rows, out_types[n])
                    if n not in keep_right else rt[n] for n in out_names}
            return pa.table(cols)
        if rt.num_rows == 0:
            if how == "inner":
                return empty
            cols = {n: lt[n] if n in left_cols
                    else pa.nulls(lt.num_rows, out_types[n])
                    for n in out_names}
            return pa.table(cols)
        rkeys = rt[right_key]
        rkeys = rkeys.combine_chunks() if isinstance(rkeys, pa.ChunkedArray) \
            else rkeys
        assert len(pc.unique(rkeys)) == len(rkeys), \
            f"lookup_join: right side not unique on {right_key}"
        idx = pc.index_in(lt[left_key], value_set=rkeys)
        if how == "inner":
            valid = pc.is_valid(idx)
            lt = lt.filter(valid)
            idx = pc.filter(idx, valid) if isinstance(idx, pa.ChunkedArray) \
                else idx.filter(valid)
        # how="left"/"full": null indices gather as nulls — unmatched left
        # rows keep their columns and take null right columns
        cols = {n: lt[n] for n in left_cols}
        for n in keep_right:
            if n not in left_cols:
                cols[n] = rt[n].take(idx)
        out = pa.table({n: cols[n] for n in out_names})
        if how == "full":
            # append right-only rows: right keys no left row pointed at
            lkeys = lt[left_key]
            lkeys = lkeys.combine_chunks() if \
                isinstance(lkeys, pa.ChunkedArray) else lkeys
            ronly = rt.filter(pc.invert(
                pc.is_in(rkeys, value_set=pc.unique(lkeys).cast(rkeys.type))))
            if ronly.num_rows:
                rcols = {n: pa.nulls(ronly.num_rows, out_types[n])
                         if n not in keep_right else ronly[n]
                         for n in out_names}
                out = pa.concat_tables([out, pa.table(rcols)])
        return out

    return tagged.groupby("__part").map_groups(merge, batch_format="pyarrow")


def quantiles_fixedpoint(ds, column: str, qs: list[float],
                         scale: int = 100) -> pa.Table:
    """Exact discrete quantiles of a fixed-point-decimal float column (e.g.
    money cents), fully distributed.

    Plan: per-batch value counts over the INTEGER-SCALED domain (one row per
    distinct scaled value per block), tree-combined by
    :func:`grouped_aggregate`, then a tiny driver-side cumulative walk over
    the sorted distinct values.  The shuffled key domain is the number of
    DISTINCT values (bounded for fixed-point columns: price ranges, scores),
    never the row count — at 100 TB the partial rows stay ~#blocks x #values.

    Quantile definition matches DuckDB ``quantile_disc``: 0-based index
    ``ceil(q*n) - 1`` into the sorted multiset (verified empirically across
    n and q, see tests).  ``scale`` must make the column integer-exact
    (``round(x*scale)/scale == x``), which also makes the result independent
    of float summation order.

    Returns ``pa.table({"q": float64, "value": float64})``.
    """
    import math

    import numpy as np
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        v = pc.round(pc.multiply(t[column], pa.scalar(float(scale)))) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq, pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())})

    counts = grouped_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                               ["v"], {"cnt": ("sum", "cnt")})
    v = counts["v"].to_numpy(zero_copy_only=False)
    c = counts["cnt"].to_numpy(zero_copy_only=False)
    order = np.argsort(v)
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            out_q.append(float(q))
            out_v.append(float("nan"))
            continue
        k = max(1, math.ceil(q * n))            # 1-based rank, clamped
        i = int(np.searchsorted(cum, k))        # first cum >= k
        out_q.append(float(q))
        out_v.append(float(v[i]) / scale)
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


def quantiles_cont_fixedpoint(ds, column: str, qs: list[float],
                              scale: int = 100) -> pa.Table:
    """Exact CONTINUOUS (interpolated) quantiles of a fixed-point-decimal
    float column — same distinct-value-count plan as
    :func:`quantiles_fixedpoint`, but finishing with DuckDB
    ``quantile_cont``'s exact interpolation, verified empirically (800/800
    probes): ``pos = q*(n-1)``, ``frac = pos - floor(pos)``, ``value =
    (1-frac)*x_lo + frac*x_hi`` — note the SYMMETRIC form; ``x_lo +
    (x_hi-x_lo)*frac`` differs in the last ulp on ~9% of inputs.  The
    interpolation runs on the ORIGINAL double values (``v/scale`` — exact
    by the fixed-point contract), so results are bit-identical.
    """
    import math

    import numpy as np
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        v = pc.round(pc.multiply(t[column], pa.scalar(float(scale)))) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq, pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())})

    counts = grouped_aggregate(ds.map_batches(partial,
                                              batch_format="pyarrow"),
                               ["v"], {"cnt": ("sum", "cnt")})
    v = counts["v"].to_numpy(zero_copy_only=False)
    c = counts["cnt"].to_numpy(zero_copy_only=False)
    order = np.argsort(v)
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0

    def value_at(rank0: int) -> float:
        i = int(np.searchsorted(cum, rank0 + 1))
        return float(v[i]) / scale

    out_q, out_v = [], []
    for q in qs:
        out_q.append(float(q))
        if n == 0:
            out_v.append(float("nan"))
            continue
        pos = q * (n - 1)
        lo = int(math.floor(pos))
        hi = int(math.ceil(pos))
        frac = pos - lo
        out_v.append((1.0 - frac) * value_at(lo) + frac * value_at(hi))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


def asof_join(left, right, on: str, left_ts: str, right_ts: str,
              right_cols: list[str], tie_col: str | None = None,
              num_partitions: int = 32, how: str = "inner",
              left_schema: "pa.Schema | None" = None,
              right_schema: "pa.Schema | None" = None):
    """Distributed backward as-of join: for each left row, attach the right
    row with the same ``on`` key and the greatest ``right_ts`` <=
    ``left_ts``.  Ties on ``right_ts`` are broken by the greatest
    ``tie_col`` (pass one whenever the right side can repeat (key, ts) —
    DuckDB/pandas ASOF are nondeterministic there, this operator is not).

    Ray Data has no as-of join; the scale shape is the engine's standard
    tagged hash co-partition (see :func:`lookup_join` for why not
    ``Dataset.join``): one union + one ``groupby("__part")`` all-to-all,
    then a per-partition merge that is pure vectorized NumPy — a single
    lexsort of the partition's (group, ts, side, tie) tuples and a
    cumulative count of right rows gives every left row its within-group
    "number of right rows at or before me"; index ``-1`` into the group's
    (ts, tie)-sorted right rows is exactly the as-of match.  No per-group
    Python loop, no per-row work, skew bounded by the key-hash partitioning
    like every other shuffle here.

    ``how``: "inner" drops unmatched left rows (DuckDB ASOF JOIN default);
    "left" keeps them with nulls in ``right_cols``.

    Output columns: all left columns + ``right_cols`` (caller pre-renames
    collisions).  Timestamps may be any type with exact int64 cast order
    (timestamp[us], int, date).
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..sketchlib.hashing import hash_str_u64, mix64

    lschema = left_schema if left_schema is not None \
        else left.schema().base_schema
    rschema = right_schema if right_schema is not None \
        else right.schema().base_schema
    left_out = list(lschema.names)
    for c in right_cols:
        if c in left_out:
            raise ValueError(f"asof_join: output name collision on {c!r}")
    rkeep = [on, right_ts] + [c for c in right_cols
                              if c not in (on, right_ts)]
    if tie_col is not None and tie_col not in rkeep:
        rkeep.append(tie_col)

    fields = [(n, lschema.field(n).type) for n in left_out]
    fields += [(n, rschema.field(n).type) for n in rkeep if n not in left_out]
    # the union needs identical schemas on both sides: null-pad and carry
    # private __k/__t copies of the join/time columns so left and right
    # column sets line up even when names differ between the sides
    key_t = lschema.field(on).type if on in left_out \
        else rschema.field(on).type

    def _key_hash(arr) -> "np.ndarray":
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_string(a.type) or pa.types.is_large_string(a.type) \
                or pa.types.is_binary(a.type):
            return hash_str_u64(a)
        return mix64(a.to_numpy(zero_copy_only=False).astype(np.uint64))

    def _tag(side: int, ts_col: str):
        def fn(t: pa.Table) -> pa.Table:
            h = _key_hash(t[on])
            cols = {}
            for name, typ in fields:
                if name in t.column_names:
                    cols[name] = t[name]
                else:
                    cols[name] = pa.nulls(t.num_rows, typ)
            cols["__ts"] = t[ts_col].cast(pa.int64())
            cols["__side"] = pa.array(
                np.full(t.num_rows, side, np.int8), pa.int8())
            cols["__part"] = pa.array(
                (h % np.uint64(num_partitions)).astype(np.uint32),
                pa.uint32())
            return pa.table(cols)
        return fn

    tagged = left.map_batches(_tag(0, left_ts), batch_format="pyarrow") \
        .union(right.map_batches(_tag(1, right_ts), batch_format="pyarrow"))

    out_names = left_out + [n for n in right_cols if n not in left_out]
    out_types = {n: t for n, t in fields}

    def merge(t: pa.Table) -> pa.Table:
        empty = pa.table({n: pa.array([], out_types[n]) for n in out_names})
        if t.num_rows == 0:
            return empty
        side = t["__side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0))
        rt = t.filter(pa.array(side == 1))
        if rt.num_rows == 0 or lt.num_rows == 0:
            if how == "inner" or lt.num_rows == 0:
                return empty
            cols = {n: lt[n] for n in left_out}
            for n in out_names[len(left_out):]:
                cols[n] = pa.nulls(lt.num_rows, out_types[n])
            return pa.table(cols)

        nl, nr = lt.num_rows, rt.num_rows
        lk = _key_hash(lt[on])          # hashed key = dense-group domain
        rk = _key_hash(rt[on])
        lts = lt["__ts"].to_numpy(zero_copy_only=False)
        rts = rt["__ts"].to_numpy(zero_copy_only=False)
        rtie = (rt[tie_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
                if tie_col is not None else np.zeros(nr, np.int64))

        uk, inv = np.unique(np.concatenate([rk, lk]), return_inverse=True)
        gr, gl = inv[:nr], inv[nr:]
        # one global lexsort of (group, ts, right-before-left, tie)
        gid = np.concatenate([gr, gl])
        tss = np.concatenate([rts, lts])
        isl = np.concatenate([np.zeros(nr, np.int8), np.ones(nl, np.int8)])
        tie = np.concatenate([rtie, np.zeros(nl, np.int64)])
        order = np.lexsort((tie, isl, tss, gid))
        isl_sorted = isl[order]
        rights_incl = np.cumsum((isl_sorted == 0).astype(np.int64))
        pos_of = np.empty(nr + nl, np.int64)
        pos_of[order] = np.arange(nr + nl)
        # rights in global (group, ts, tie) sorted sequence, as rt indices
        r_seq = order[isl_sorted == 0]
        rights_per_group = np.bincount(gr, minlength=len(uk))
        group_base = np.concatenate([[0],
                                     np.cumsum(rights_per_group)])[:-1]
        p = pos_of[nr:]                           # left rows' sorted slots
        idx_in_group = rights_incl[p] - group_base[gl]
        matched = idx_in_group > 0
        midx = r_seq[group_base[gl[matched]] + idx_in_group[matched] - 1]

        if how == "inner":
            lt = lt.filter(pa.array(matched))
            take = pa.array(midx, pa.int64())
            cols = {n: lt[n] for n in left_out}
            for n in out_names[len(left_out):]:
                cols[n] = rt[n].take(take)
            return pa.table(cols)
        # left: scatter matches, nulls elsewhere
        full = np.full(nl, -1, np.int64)
        full[matched] = midx
        take = pa.array(np.where(full >= 0, full, 0), pa.int64())
        sel = pa.array(full >= 0)
        cols = {n: lt[n] for n in left_out}
        for n in out_names[len(left_out):]:
            picked = rt[n].take(take)
            cols[n] = pc.if_else(sel, picked.combine_chunks()
                                 if isinstance(picked, pa.ChunkedArray)
                                 else picked, pa.nulls(1, out_types[n])[0])
        return pa.table(cols)

    return tagged.groupby("__part").map_groups(merge, batch_format="pyarrow")


def range_join_aggregate(left, right, on: str, left_ts: str, right_ts: str,
                         window: tuple[int, int],
                         aggs: dict[str, tuple[str, str | None]],
                         num_partitions: int = 32, how: str = "left",
                         left_schema: "pa.Schema | None" = None,
                         right_schema: "pa.Schema | None" = None):
    """Distributed range (interval) join with aggregation push-down: for each
    left row, aggregate the right rows sharing its ``on`` key whose
    ``right_ts`` falls in ``[left_ts + window[0], left_ts + window[1])``
    (int64 units of the ts columns, e.g. microseconds).

    The classic range join explodes to O(pairs) before any aggregate; at
    dense windows that is the scale-killer.  This operator never materializes
    the pairs: after the engine's standard tagged hash co-partition, each
    partition sorts its right rows once by (group, ts), builds exclusive
    prefix sums per agg column, and computes every left row's two window
    ranks with one vectorized lexsort + cumsum each — count and sums are
    prefix differences, so per-partition cost is O((nl+nr) log(nl+nr))
    regardless of how many pairs the window covers.

    ``aggs``: {out_col: ("count", None) | ("sum", right_col)} — sum columns
    are cast to int64 (pre-scale floats to fixed-point for deterministic
    parallel sums).  ``how``: "left" keeps zero-count left rows (count 0,
    sum 0); "inner" drops them.  Bounds are half-open: a right row exactly
    at ``left_ts + window[1]`` is excluded, at ``+ window[0]`` included.
    """
    import numpy as np

    from ..sketchlib.hashing import hash_str_u64, mix64

    lo_off, hi_off = int(window[0]), int(window[1])
    if hi_off <= lo_off:
        raise ValueError("range_join_aggregate: empty window")
    lschema = left_schema if left_schema is not None \
        else left.schema().base_schema
    rschema = right_schema if right_schema is not None \
        else right.schema().base_schema
    left_out = list(lschema.names)
    for out in aggs:
        if out in left_out:
            raise ValueError(f"range_join_aggregate: collision on {out!r}")
    sum_cols = sorted({c for (op, c) in aggs.values() if op == "sum"})

    fields = [(n, lschema.field(n).type) for n in left_out]
    for c in sum_cols:
        if c not in left_out:
            fields.append((c, rschema.field(c).type))

    def _key_hash(arr) -> "np.ndarray":
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_string(a.type) or pa.types.is_large_string(a.type) \
                or pa.types.is_binary(a.type):
            return hash_str_u64(a)
        return mix64(a.to_numpy(zero_copy_only=False).astype(np.uint64))

    def _tag(side: int, ts_col: str):
        def fn(t: pa.Table) -> pa.Table:
            h = _key_hash(t[on])
            cols = {}
            for name, typ in fields:
                cols[name] = t[name] if name in t.column_names \
                    else pa.nulls(t.num_rows, typ)
            cols["__ts"] = t[ts_col].cast(pa.int64())
            cols["__side"] = pa.array(
                np.full(t.num_rows, side, np.int8), pa.int8())
            cols["__part"] = pa.array(
                (h % np.uint64(num_partitions)).astype(np.uint32),
                pa.uint32())
            return pa.table(cols)
        return fn

    tagged = left.map_batches(_tag(0, left_ts), batch_format="pyarrow") \
        .union(right.map_batches(_tag(1, right_ts), batch_format="pyarrow"))

    out_names = left_out + list(aggs.keys())
    out_types = {n: t for n, t in fields}
    for out, (op, _c) in aggs.items():
        out_types[out] = pa.int64()

    def merge(t: pa.Table) -> pa.Table:
        empty = pa.table({n: pa.array([], out_types[n]) for n in out_names})
        if t.num_rows == 0:
            return empty
        side = t["__side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0))
        rt = t.filter(pa.array(side == 1))
        nl, nr = lt.num_rows, rt.num_rows
        if nl == 0:
            return empty
        lts = lt["__ts"].to_numpy(zero_copy_only=False)
        if nr == 0:
            if how == "inner":
                return empty
            cols = {n: lt[n] for n in left_out}
            for out in aggs:
                cols[out] = pa.array(np.zeros(nl, np.int64), pa.int64())
            return pa.table(cols)
        lk, rk = _key_hash(lt[on]), _key_hash(rt[on])
        rts = rt["__ts"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(np.concatenate([rk, lk]), return_inverse=True)
        gr, gl = inv[:nr], inv[nr:]
        rights_per_group = np.bincount(gr, minlength=len(uk))
        group_base = np.concatenate([[0],
                                     np.cumsum(rights_per_group)])[:-1]
        rsort = np.lexsort((rts, gr))        # group-contiguous, ts-sorted
        prefixes = {}
        for c in sum_cols:
            v = rt[c].cast(pa.int64()).to_numpy(zero_copy_only=False)[rsort]
            prefixes[c] = np.concatenate([[0], np.cumsum(v)])

        def rank(bounds: "np.ndarray") -> "np.ndarray":
            """Per left row: #rights in its group with ts < bound (strict),
            as a group-local index usable against the rsort order."""
            gid = np.concatenate([gr, gl])
            ts = np.concatenate([rts, bounds])
            pri = np.concatenate([np.ones(nr, np.int8),
                                  np.zeros(nl, np.int8)])
            order = np.lexsort((pri, ts, gid))
            cum = np.cumsum((pri[order] == 1).astype(np.int64))
            pos = np.empty(nr + nl, np.int64)
            pos[order] = np.arange(nr + nl)
            return cum[pos[nr:]] - group_base[gl]

        c0 = rank(lts + lo_off)
        c1 = rank(lts + hi_off)
        cnt = c1 - c0
        keep = np.ones(nl, bool) if how == "left" else cnt > 0
        base = group_base[gl]
        cols = {n: lt.filter(pa.array(keep))[n] for n in left_out}
        for out, (op, c) in aggs.items():
            if op == "count":
                cols[out] = pa.array(cnt[keep], pa.int64())
            else:
                p = prefixes[c]
                s = p[(base + c1)[keep]] - p[(base + c0)[keep]]
                cols[out] = pa.array(s, pa.int64())
        return pa.table(cols)

    return tagged.groupby("__part").map_groups(merge, batch_format="pyarrow")


def semi_anti_join(left, right, left_key: str, right_key: str,
                   mode: str = "semi", num_partitions: int = 32,
                   left_schema: "pa.Schema | None" = None):
    """Distributed semi / anti join: keep left rows whose key does (semi) or
    does not (anti) appear in ``right``.  Same tagged hash co-partition as
    :func:`lookup_join`; the right side ships ONLY its key column (pruned
    here, so callers can pass the full dataset), and the per-partition merge
    is one ``pc.is_in`` against the partition's unique right keys — no
    payload movement, no row multiplication, duplicate right keys welcome.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..sketchlib.hashing import hash_str_u64, mix64

    if mode not in ("semi", "anti"):
        raise ValueError(f"semi_anti_join: bad mode {mode!r}")
    lschema = left_schema if left_schema is not None \
        else left.schema().base_schema
    left_cols = list(lschema.names)
    key_type = lschema.field(left_key).type

    def _key_hash(arr) -> "np.ndarray":
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_string(a.type) or pa.types.is_large_string(a.type) \
                or pa.types.is_binary(a.type):
            return hash_str_u64(a)
        return mix64(a.to_numpy(zero_copy_only=False).astype(np.uint64))

    fields = [(n, lschema.field(n).type) for n in left_cols]

    def _tag_left(t: pa.Table) -> pa.Table:
        h = _key_hash(t[left_key])
        cols = {n: t[n] for n in left_cols}
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8), pa.int8())
        cols["__part"] = pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32())
        return pa.table(cols)

    def _tag_right(t: pa.Table) -> pa.Table:
        # prune to the key column, dedup per batch (semi/anti only need
        # membership), rename into the left key slot
        keys = pc.unique(t[right_key].combine_chunks()
                         if isinstance(t[right_key], pa.ChunkedArray)
                         else t[right_key]).cast(key_type)
        h = _key_hash(keys)
        cols = {}
        for n, typ in fields:
            cols[n] = keys if n == left_key else pa.nulls(len(keys), typ)
        cols["__side"] = pa.array(np.ones(len(keys), np.int8), pa.int8())
        cols["__part"] = pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32())
        return pa.table(cols)

    tagged = left.map_batches(_tag_left, batch_format="pyarrow") \
        .union(right.map_batches(_tag_right, batch_format="pyarrow"))

    def merge(t: pa.Table) -> pa.Table:
        empty = pa.table({n: pa.array([], typ) for n, typ in fields})
        if t.num_rows == 0:
            return empty
        side = t["__side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).drop_columns(["__side", "__part"])
        if lt.num_rows == 0:
            return empty
        rkeys = t.filter(pa.array(side == 1))[left_key]
        rkeys = rkeys.combine_chunks() if isinstance(rkeys, pa.ChunkedArray) \
            else rkeys
        if len(rkeys) == 0:
            return empty if mode == "semi" else lt
        hit = pc.is_in(lt[left_key], value_set=pc.unique(rkeys))
        return lt.filter(hit if mode == "semi" else pc.invert(hit))

    return tagged.groupby("__part").map_groups(merge, batch_format="pyarrow")


def grouped_count_distinct(ds, key_col: "str | list[str]", value_col: str,
                           num_partitions: int = 64) -> pa.Table:
    """Exact per-group COUNT(DISTINCT value), fully distributed: per-batch
    (key, value) dedup (combiner — the shuffle then carries distinct pairs,
    not rows) -> hash co-partition by the PAIR hash -> per-partition global
    dedup + per-key partial counts -> tiny final sum per key.  Pair-hash
    partitioning means one key's values spread over all partitions (no hot
    key), and the per-partition partial counts are disjoint by construction,
    so summing them is exact.

    ``key_col`` may be a single column or a list (composite GROUP BY key,
    e.g. TPC-H Q16's ``(p_brand, p_type, p_size)``); the partition hash
    mixes every key column plus the value column.
    """
    import numpy as np

    from ..sketchlib.hashing import hash_str_u64, mix64

    keys = [key_col] if isinstance(key_col, str) else list(key_col)

    def _h(arr) -> "np.ndarray":
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_string(a.type) or pa.types.is_large_string(a.type) \
                or pa.types.is_binary(a.type):
            return hash_str_u64(a)
        return mix64(a.to_numpy(zero_copy_only=False).astype(np.uint64))

    PHI = np.uint64(0x9E3779B97F4A7C15)

    def uniq_tag(t: pa.Table) -> pa.Table:
        u = t.select(keys + [value_col]) \
             .group_by(keys + [value_col]).aggregate([])
        h = _h(u[value_col]) * PHI
        for k in keys:
            h = mix64(h ^ _h(u[k]))
        return u.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_part(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        if t.num_rows == 0:
            cols = {k: pa.array([], t.schema.field(k).type) for k in keys}
            cols["__n"] = pa.array([], pa.int64())
            return pa.table(cols)
        u = t.group_by(keys + [value_col]).aggregate([])
        c = u.group_by(keys).aggregate([(value_col, "count")])
        cols = {k: c[k] for k in keys}
        cols["__n"] = c[f"{value_col}_count"].cast(pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(uniq_tag, batch_format="pyarrow") \
        .groupby("__part").map_groups(per_part, batch_format="pyarrow")
    return grouped_aggregate(partials, keys,
                             {"n_distinct": ("sum", "__n")})


def grouped_quantiles_fixedpoint(ds, key_col: str, column: str,
                                 qs: list[float],
                                 scale: int = 100,
                                 cont: bool = False) -> pa.Table:
    """Per-group exact discrete quantiles of a fixed-point-decimal column —
    the grouped form of :func:`quantiles_fixedpoint`, same contract
    (``quantile_disc`` rule ``ceil(q*n)-1``, ``round(x*scale)/scale == x``).
    Per-batch (key, scaled-value) counts collapse the shuffle to the number
    of distinct (group, value) pairs; the final walk is one vectorized
    lexsort over those distinct pairs + a per-(group, q) searchsorted into
    each group's cumulative slice — driver work is O(distinct pairs), never
    O(rows).

    ``cont=True`` switches to CONTINUOUS quantiles with DuckDB
    ``quantile_cont``'s exact interpolation (the verified symmetric form —
    see :func:`quantiles_cont_fixedpoint`).

    Returns ``pa.table({key_col, "q": float64, "value": float64})`` with
    len(qs) rows per group.
    """
    import math

    import numpy as np
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        v = pc.round(pc.multiply(t[column], pa.scalar(float(scale)))) \
            .cast(pa.int64())
        u = pa.table({key_col: t[key_col], "v": v}) \
            .group_by([key_col, "v"]).aggregate([("v", "count")])
        return pa.table({key_col: u[key_col], "v": u["v"],
                         "cnt": u["v_count"].cast(pa.int64())})

    counts = grouped_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                               [key_col, "v"], {"cnt": ("sum", "cnt")})
    keys = counts[key_col].to_numpy(zero_copy_only=False)
    v = counts["v"].to_numpy(zero_copy_only=False)
    c = counts["cnt"].to_numpy(zero_copy_only=False)
    order = np.lexsort((v, keys))
    keys, v, c = keys[order], v[order], c[order]
    new = np.empty(len(keys), bool)
    if len(keys):
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], len(keys))
    cum = np.cumsum(c)
    base = np.concatenate([[0], cum[ends[:-1] - 1]]) if len(starts) else \
        np.empty(0, np.int64)
    out_k, out_q, out_v = [], [], []
    for g, (s, e) in enumerate(zip(starts, ends)):
        gcum = cum[s:e] - base[g]
        n = int(gcum[-1])
        for q in qs:
            out_k.append(keys[s])
            out_q.append(float(q))
            if cont:
                pos = q * (n - 1)
                lo = int(math.floor(pos))
                hi = int(math.ceil(pos))
                frac = pos - lo
                xlo = float(v[s + int(np.searchsorted(gcum, lo + 1))]) \
                    / scale
                xhi = float(v[s + int(np.searchsorted(gcum, hi + 1))]) \
                    / scale
                out_v.append((1.0 - frac) * xlo + frac * xhi)
            else:
                k = max(1, math.ceil(q * n))
                i = int(np.searchsorted(gcum, k))
                out_v.append(float(v[s + i]) / scale)
    return pa.table({key_col: pa.array(out_k,
                                       counts[key_col].type),
                     "q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


def grouped_mad_fixedpoint(ds, key_col: str, column: str,
                           scale: int = 100) -> pa.Table:
    """Per-group MEDIAN and MAD (median absolute deviation — the robust
    dispersion statistic outlier rules should use instead of sigma when
    the distribution is skewed), exact on the fixed-point integer domain.

    Two passes over the same machinery as
    :func:`grouped_quantiles_fixedpoint` (``quantile_disc`` rule, distinct
    (group, value)-count shuffles — never rows): pass 1 takes each group's
    median in scaled-integer form; pass 2 re-scans with a vectorized
    ``|v_c - median_c|`` map (medians broadcast as a tiny per-group array,
    looked up via ``pc.index_in``) and takes the median of the deviations.

    Returns ``pa.table({key_col, median_c: int64, mad_c: int64})`` —
    integer cents, exactly SQL-expressible.
    """
    import numpy as np
    import pyarrow.compute as pc

    med = grouped_quantiles_fixedpoint(ds, key_col, column, [0.5],
                                       scale=scale)
    gkeys = med[key_col].combine_chunks() if \
        isinstance(med[key_col], pa.ChunkedArray) else med[key_col]
    med_c = np.round(med["value"].to_numpy() * scale).astype(np.int64)

    def dev(t: pa.Table) -> pa.Table:
        v_c = pc.round(pc.multiply(t[column], pa.scalar(float(scale)))) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        gi = pc.index_in(t[key_col], value_set=gkeys) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.abs(v_c - med_c[gi]).astype(np.float64)
        return pa.table({key_col: t[key_col],
                         "dev": pa.array(d, pa.float64())})

    mad = grouped_quantiles_fixedpoint(
        ds.map_batches(dev, batch_format="pyarrow"), key_col, "dev",
        [0.5], scale=1)
    med = med.sort_by(key_col)
    mad = mad.sort_by(key_col)
    assert med[key_col].to_pylist() == mad[key_col].to_pylist()
    return pa.table({
        key_col: med[key_col],
        "median_c": pa.array(
            np.round(med["value"].to_numpy() * scale).astype(np.int64),
            pa.int64()),
        "mad_c": pa.array(np.round(mad["value"].to_numpy()).astype(
            np.int64), pa.int64())})


def pivot_aggregate(ds, key_col: str, pivot_col: str,
                    pivot_values: list, value_col: str | None = None,
                    value_scale: int = 100, prefix: str = "n_") -> pa.Table:
    """Pivot (conditional aggregation): one output row per key, one column
    per pivot value — ``count(*) FILTER (WHERE pivot = v)`` (default) or,
    with ``value_col``, ``sum(value) FILTER (...)`` on the integer-scaled
    domain (exact, association-free; result divided back by
    ``value_scale``).  Scale shape: a vectorized one-hot expansion per batch
    (``pc.equal`` per pivot value — the pivot domain must be small and
    known, the usual pivot contract) followed by :func:`grouped_aggregate`'s
    partial-sum combine — shuffle volume is one partial row per (block,
    key), never the input rows.
    """
    import pyarrow.compute as pc

    names = [f"{prefix}{v}" for v in pivot_values]

    def onehot(t: pa.Table) -> pa.Table:
        cols = {key_col: t[key_col]}
        if value_col is not None:
            scaled = pc.round(pc.multiply(
                t[value_col], pa.scalar(float(value_scale)))) \
                .cast(pa.int64())
        for v, name in zip(pivot_values, names):
            m = pc.equal(t[pivot_col], pa.scalar(v)).cast(pa.int64())
            cols[name] = m if value_col is None else \
                pc.multiply(m, scaled)
        return pa.table(cols)

    expanded = ds.map_batches(onehot, batch_format="pyarrow")
    out = grouped_aggregate(expanded, [key_col],
                            {n: ("sum", n) for n in names})
    if value_col is not None:
        out = pa.table(
            {key_col: out[key_col],
             **{n: pc.divide(pc.cast(out[n], pa.float64()),
                             pa.scalar(float(value_scale)))
                for n in names}})
    return out


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_name: str = "measure", value_name: str = "value"):
    """Wide -> long (SQL UNPIVOT / pandas melt): each input row becomes
    ``len(value_cols)`` rows of (id columns, measure name, float64 value).
    Pure per-batch expansion — one ``take`` on a repeated index for the id
    columns, one tiled name column, one strided value interleave; values are
    verbatim copies (bit-exact), nothing shuffles, the stream stays a
    stream.  Constant expansion factor, so block sizes grow by a known k —
    same memory contract as :func:`hopping_window_aggregate
    <setsketch_ray.functions.streaming.hopping_window_aggregate>`.
    """
    import numpy as np

    k = len(value_cols)
    names = np.array(value_cols, dtype=object)

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k),
                       pa.int64())
        cols = {c: t[c].take(idx) for c in id_cols}
        cols[var_name] = pa.array(np.tile(names, n), pa.string())
        vals = np.empty(n * k, np.float64)
        for j, c in enumerate(value_cols):
            vals[j::k] = t[c].to_numpy(zero_copy_only=False)
        cols[value_name] = pa.array(vals, pa.float64())
        return pa.table(cols)

    return ds.map_batches(melt, batch_format="pyarrow")


def heavy_hitters(ds, column: str, top_n: int, k: int = 4096,
                  id_is_string: bool = False):
    """EXACT distributed top-N most-frequent values in two passes — the
    100 TB shape for frequency ranking when the distinct domain is too big
    to shuffle:

    1. **Misra-Gries candidate sweep**: each block emits its value counts
       compressed to ``k`` counters (subtract the (k+1)-th largest count,
       drop non-positive — the batch form of the MG decrement); the driver
       merges the tiny per-block summaries and compresses once more.  For
       the merged summary, every value with true frequency above
       ``delta = (n_total - stored_mass) / (k + 1)`` is guaranteed present
       (MG invariant: stored counts undercount by at most ``delta``).
    2. **Exact recount**: the candidate set (<= k values) is broadcast and
       each block emits exact counts for candidates only — shuffle volume
       <= k rows per block regardless of the domain size.

    The result is CERTIFIED exact when the N-th recounted frequency exceeds
    ``delta`` (no non-candidate can reach it); otherwise raises
    ``ValueError`` — raise ``k``.  With ``k`` >= the distinct count the
    sweep never decrements, ``delta == 0``, and certification is
    unconditional.  Ties in the top-N are broken by value ascending
    (deterministic, oracle-friendly).

    Returns ``pa.table({column, "n": int64})`` with ``top_n`` rows sorted
    by (n desc, value asc).
    """
    import numpy as np
    import pyarrow.compute as pc

    def _counts(col) -> pa.Table:
        a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vc = pc.value_counts(a)
        return pa.table({"v": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    def _compress(t: pa.Table, limit: int) -> pa.Table:
        if t.num_rows <= limit:
            return t
        c = t["c"].to_numpy(zero_copy_only=False)
        thresh = np.partition(c, len(c) - limit - 1)[len(c) - limit - 1]
        kept = c - thresh
        mask = kept > 0
        return pa.table({"v": t["v"].filter(pa.array(mask)),
                         "c": pa.array(kept[mask], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"v": pa.array([], t.schema.field(column).type),
                             "c": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        out = _compress(_counts(t[column]), k)
        if out.num_rows == 0:
            # every count hit the decrement threshold (e.g. all singletons);
            # keep one zero counter so the block's row count still ships
            out = pa.table({"v": t[column].slice(0, 1),
                            "c": pa.array([0], pa.int64())})
        n_rows = np.zeros(out.num_rows, np.int64)
        n_rows[0] = t.num_rows
        return out.append_column("n_rows", pa.array(n_rows, pa.int64()))

    parts = pa.concat_tables(list(
        ds.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    n_total = int(pc.sum(parts["n_rows"]).as_py() or 0)
    merged = parts.select(["v", "c"]).group_by("v").aggregate([("c", "sum")])
    merged = pa.table({"v": merged["v"],
                       "c": merged["c_sum"].cast(pa.int64())})
    merged = _compress(merged, k)
    stored = int(pc.sum(merged["c"]).as_py() or 0)
    delta = (n_total - stored) / (k + 1)

    # pass 2: exact recount of the candidate set only
    import ray

    cand = merged["v"].combine_chunks() if \
        isinstance(merged["v"], pa.ChunkedArray) else merged["v"]
    cref = ray.put(cand)

    class Recount:
        def __init__(self, ref):
            self.cand = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t[column].combine_chunks() if \
                isinstance(t[column], pa.ChunkedArray) else t[column]
            hit = pc.is_in(col, value_set=self.cand)
            return _counts(col.filter(hit))

    exact = pa.concat_tables(list(
        ds.map_batches(Recount, fn_constructor_args=(cref,),
                       batch_format="pyarrow", concurrency=2)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
        .group_by("v").aggregate([("c", "sum")])
    order = pc.sort_indices(exact, sort_keys=[("c_sum", "descending"),
                                              ("v", "ascending")])
    top = exact.take(order[:top_n])
    nth = top["c_sum"][top.num_rows - 1].as_py() if top.num_rows else 0
    # exact iff no non-candidate (true freq <= delta) could displace rank N:
    # needs N certified candidates, the N-th strictly above the bound
    if (top.num_rows < top_n and delta > 0) or \
            (top.num_rows == top_n and nth <= delta):
        raise ValueError(
            f"heavy_hitters: top-{top_n} not certifiable ({top.num_rows} "
            f"candidates, nth count {nth} vs MG error bound {delta:.1f}); "
            f"raise k (k={k})")
    return pa.table({column: top["v"],
                     "n": top["c_sum"].cast(pa.int64())})


def _bloom_positions(keys: "np.ndarray", n_bits: int, n_hashes: int):
    """(len(keys), n_hashes) bit positions via double hashing — counter-mode
    (engine-wide convention, no RNG state)."""
    import numpy as np

    from ..sketchlib.hashing import mix2

    h1 = mix2(keys, 0x9E3779B97F4A7C15)
    h2 = mix2(keys, 0xC2B2AE3D27D4EB4F) | np.uint64(1)
    j = np.arange(n_hashes, dtype=np.uint64)
    return (h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(n_bits)


def _right_key_bitmap(right, right_key: str, n_bits: int, n_hashes: int):
    """OR-merged Bloom bitmap of a dataset's key column: each block ships an
    n_bits/8-byte partial (never the keys), merged on the driver, broadcast
    once via ray.put.  Integer keys only."""
    import numpy as np
    import ray

    def bitmap_partial(t: pa.Table) -> pa.Table:
        keys = t[right_key].to_numpy(zero_copy_only=False).astype(np.uint64)
        bm = np.zeros(n_bits // 8, np.uint8)
        pos = _bloom_positions(keys, n_bits, n_hashes).ravel()
        np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    bitmap = np.zeros(n_bits // 8, np.uint8)
    for b in right.map_batches(bitmap_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        for raw in b["bm"].to_pylist():
            bitmap |= np.frombuffer(raw, np.uint8)
    return ray.put(bitmap)


def _bloom_mask_fn(bref, left_key: str, n_bits: int, n_hashes: int,
                   want_hit: bool):
    """Per-batch task keeping bloom-hit (or bloom-miss) rows; the broadcast
    bitmap read is a zero-copy shared-memory ray.get per task."""
    import numpy as np
    import ray

    def fn(t: pa.Table) -> pa.Table:
        bm = ray.get(bref)
        keys = t[left_key].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = _bloom_positions(keys, n_bits, n_hashes)
        bits = (bm[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        hit = bits.all(axis=1)
        return t.filter(pa.array(hit == want_hit))
    return fn


def bloom_semi_prefilter(left, right, left_key: str, right_key: str,
                         n_bits: int = 1 << 20, n_hashes: int = 4):
    """Bloom PRE-filter for an inner join: drop left rows whose key is
    definitely absent from ``right`` BEFORE the join shuffle — the 100 TB
    probe-side reduction when the build side's key set fits a bitmap.
    Bloom false positives survive here and are dropped by the exact join
    downstream, so composition with :func:`lookup_join` (inner) or
    :func:`semi_anti_join` stays EXACT.

    ``right`` is consumed once to build the bitmap; pass a materialized
    Dataset if it is also the join's build side (a lazy plan would
    re-execute for each consumer).  Integer keys only.
    """
    bref = _right_key_bitmap(right, right_key, n_bits, n_hashes)
    return left.map_batches(
        _bloom_mask_fn(bref, left_key, n_bits, n_hashes, True),
        batch_format="pyarrow")


def bloom_anti_join(left, right, left_key: str, right_key: str,
                    n_bits: int = 1 << 20, n_hashes: int = 4,
                    num_partitions: int = 32,
                    left_schema: "pa.Schema | None" = None):
    """Anti join with a Bloom pre-filter — the 100 TB shape when the right
    side is large but its key set fits a bitmap: each right block emits an
    ``n_bits``-bit partial bitmap (``n_bits/8`` bytes per block, OR-merged
    on the driver — never the keys themselves), the merged filter is
    broadcast once (``ray.put``), and left rows split on membership:

    * bloom-NEGATIVE rows are *definitely* absent from the right — they are
      emitted directly, touching no shuffle at all;
    * bloom-POSITIVE rows (true matches + the ~``(1-e^{-kn/m})^k`` false
      positives) go through the exact :func:`semi_anti_join` — so the final
      result is EXACT, and the all-to-all carries only the positive
      fraction instead of the whole left side.

    Integer keys only (hashes ride ``mix2`` on the uint64 domain).
    """
    lschema = left_schema if left_schema is not None \
        else left.schema().base_schema

    # plain tasks, not actor pools: two concurrent pools would reserve CPUs
    # the downstream shuffle needs (deadlocks small sessions), and the
    # per-task ray.get of the bitmap is a zero-copy shared-memory read
    bref = _right_key_bitmap(right, right_key, n_bits, n_hashes)
    negatives = left.map_batches(
        _bloom_mask_fn(bref, left_key, n_bits, n_hashes, False),
        batch_format="pyarrow")
    positives = left.map_batches(
        _bloom_mask_fn(bref, left_key, n_bits, n_hashes, True),
        batch_format="pyarrow")
    survivors = semi_anti_join(positives, right, left_key, right_key,
                               mode="anti", num_partitions=num_partitions,
                               left_schema=lschema)
    return negatives.union(survivors)


def grouping_sets_aggregate(ds, keys: list[str], sets: list[list[str]],
                            spec: dict) -> pa.Table:
    """GROUP BY GROUPING SETS: the finest level (all ``keys``) runs through
    :func:`grouped_aggregate` ONCE (one distributed pass; partial rows per
    (block, key-tuple) through the shuffle), and every requested grouping
    set re-combines the finest driver-side table (tiny: one row per
    distinct key tuple) with plain Arrow ``group_by``.  Keys absent from a
    set are null, as in SQL.  ``spec`` ops are limited to the re-combinable
    sum/count/min/max (count re-combines as sum; mean is NOT re-combinable
    from finalized outputs — derive it from sum+count columns yourself).
    """
    import pyarrow.compute as pc

    _recombine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (op, _col) in spec.items():
        if op not in _recombine:
            raise ValueError(
                f"grouping_sets_aggregate: op {op!r} not re-combinable")

    finest = grouped_aggregate(ds, keys, spec)
    out_names = keys + list(spec)
    key_type = {k: finest.schema.field(k).type for k in keys}
    levels = []
    for kept in sets:
        if sorted(kept) == sorted(keys):
            levels.append(finest.select(out_names))
            continue
        aggs = [(out, _recombine[op]) for out, (op, _c) in spec.items()]
        if kept:
            g = finest.group_by(list(kept)).aggregate(aggs)
        else:
            # grand total: aggregate each column over the whole table
            g = pa.table({f"{out}_{cop}": pa.array(
                [getattr(pc, cop)(finest[out]).as_py()])
                for out, cop in aggs})
        cols = {}
        for k in keys:
            cols[k] = g[k] if k in kept else pa.nulls(g.num_rows,
                                                      key_type[k])
        for out, (op, _c) in spec.items():
            cols[out] = g[f"{out}_{_recombine[op]}"]
        levels.append(pa.table(cols))
    return pa.concat_tables(levels)


def rollup_aggregate(ds, keys: list[str], spec: dict) -> pa.Table:
    """GROUP BY ROLLUP: the prefix grouping sets of ``keys`` down to the
    grand total (see :func:`grouping_sets_aggregate` for the plan shape)."""
    sets = [keys[:n] for n in range(len(keys), -1, -1)]
    return grouping_sets_aggregate(ds, keys, sets, spec)


def cube_aggregate(ds, keys: list[str], spec: dict) -> pa.Table:
    """GROUP BY CUBE: every subset of ``keys`` (see
    :func:`grouping_sets_aggregate` for the plan shape)."""
    from itertools import combinations

    sets = [list(c) for n in range(len(keys), -1, -1)
            for c in combinations(keys, n)]
    return grouping_sets_aggregate(ds, keys, sets, spec)


def set_op(left, right, cols: list[str], op: str = "intersect",
           num_partitions: int = 32):
    """Multi-column SQL set operation with DISTINCT semantics —
    ``INTERSECT`` (rows present on both sides) or ``EXCEPT`` (distinct left
    rows absent from the right).  Each side is deduplicated per batch
    (``group_by(cols)`` combiner), rows are hash co-partitioned on the
    COMBINED column hash (equal tuples co-locate), and the per-partition
    merge is one Arrow ``group_by`` over the tuple columns with per-side
    presence flags — no pair materialization, shuffle volume = distinct
    tuples per block.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..sketchlib.hashing import hash_str_u64, mix2, mix64

    if op not in ("intersect", "except"):
        raise ValueError(f"set_op: bad op {op!r}")

    def _row_hash(t: pa.Table) -> "np.ndarray":
        acc = np.full(t.num_rows, 0x243F6A8885A308D3, np.uint64)
        for c in cols:
            a = t[c].combine_chunks() if \
                isinstance(t[c], pa.ChunkedArray) else t[c]
            if pa.types.is_string(a.type) or pa.types.is_large_string(a.type) \
                    or pa.types.is_binary(a.type):
                h = hash_str_u64(a)
            else:
                h = mix64(a.to_numpy(zero_copy_only=False).astype(np.uint64))
            acc = mix2(acc, h)
        return acc

    def _tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            u = t.select(cols).group_by(cols).aggregate([])  # batch dedup
            h = _row_hash(u)
            return u.append_column(
                "__side", pa.array(np.full(u.num_rows, side, np.int8),
                                   pa.int8())) \
                .append_column("__part", pa.array(
                    (h % np.uint64(num_partitions)).astype(np.uint32),
                    pa.uint32()))
        return fn

    tagged = left.map_batches(_tag(0), batch_format="pyarrow") \
        .union(right.map_batches(_tag(1), batch_format="pyarrow"))

    def merge(t: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.array([], t.schema.field(c).type)
                          for c in cols})
        if t.num_rows == 0:
            return empty
        side = t["__side"].to_numpy(zero_copy_only=False)
        flags = pa.table({**{c: t[c] for c in cols},
                          "__a": pa.array((side == 0).astype(np.int8)),
                          "__b": pa.array((side == 1).astype(np.int8))})
        g = flags.group_by(cols).aggregate([("__a", "max"), ("__b", "max")])
        a = g["__a_max"].to_numpy(zero_copy_only=False).astype(bool)
        b = g["__b_max"].to_numpy(zero_copy_only=False).astype(bool)
        keep = (a & b) if op == "intersect" else (a & ~b)
        return g.filter(pa.array(keep)).select(cols)

    return tagged.groupby("__part").map_groups(merge, batch_format="pyarrow")


def grouped_string_agg(ds, key_col: str, value_col: str, ts_col: str,
                       order_tiebreak: str, sep: str = ",",
                       num_partitions: int = 32):
    """Per-key ordered string concatenation (the SQL ``string_agg(v, sep
    ORDER BY ts, tiebreak) GROUP BY key``): hash-partition by key, one
    lexsort per partition, then ONE ``pc.binary_join`` over a ListArray
    built from the key run offsets — no per-group Python, the join is a
    single Arrow kernel.  ``order_tiebreak`` pins element order at equal
    timestamps (required — without it the concatenation is
    nondeterministic across engines).

    Returns a Dataset of (key, ``agg``) — one row per key.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..sketchlib.hashing import mix64

    def add_part(t: pa.Table) -> pa.Table:
        g = t[key_col].to_numpy(zero_copy_only=False)
        h = mix64(g.astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        key_t = t.schema.field(key_col).type
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], key_t),
                             "agg": pa.array([], pa.string())})
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tie = t[order_tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, keys))
        k = keys[order]
        vals = t[value_col].take(pa.array(order, pa.int64()))
        vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) \
            else vals
        n = len(k)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new_key).astype(np.int32)
        offsets = pa.array(np.append(starts, n).astype(np.int32),
                           pa.int32())
        lists = pa.ListArray.from_arrays(offsets, vals)
        joined = pc.binary_join(lists, pa.scalar(sep))
        return pa.table({key_col: pa.array(k[starts], key_t),
                         "agg": joined})

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    return ds.groupby("__part").map_groups(per_partition,
                                           batch_format="pyarrow")


def grouped_mode(ds, key_col: str, value_col: str,
                 num_partitions: int = 32):
    """Per-key MODE (most frequent value, ties broken by smallest value —
    the deterministic total order SQL's ``mode()`` lacks): per-batch
    (key, value) count partials (arrow ``group_by``), hash co-partition by
    KEY ONLY so every count of a key meets, one combine ``group_by`` plus a
    lexsort-and-first-of-run pass per partition.  Only the distinct
    (key, value, count) triples cross the shuffle — never rows.

    Returns a Dataset of (key, ``mode_value``, ``cnt``).
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..sketchlib.hashing import hash_str_u64, mix64

    def partial(t: pa.Table) -> pa.Table:
        pairs = pa.table({key_col: t[key_col], value_col: t[value_col]})
        agg = pairs.group_by([key_col, value_col]).aggregate(
            [([], "count_all")])
        cnt_name = [n for n in agg.column_names
                    if n not in (key_col, value_col)][0]
        g = agg[key_col].to_numpy(zero_copy_only=False)
        if g.dtype.kind in "iu":
            h = mix64(g.astype(np.uint64))
        else:
            karr = agg[key_col]
            karr = karr.combine_chunks() if \
                isinstance(karr, pa.ChunkedArray) else karr
            h = hash_str_u64(karr)
        return pa.table({key_col: agg[key_col], value_col: agg[value_col],
                         "cnt": agg[cnt_name].cast(pa.int64()),
                         "__part": pa.array(
                             (h % np.uint64(num_partitions)).astype(
                                 np.uint32), pa.uint32())})

    def per_partition(t: pa.Table) -> pa.Table:
        key_t = t.schema.field(key_col).type
        val_t = t.schema.field(value_col).type
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], key_t),
                             "mode_value": pa.array([], val_t),
                             "cnt": pa.array([], pa.int64())})
        comb = t.group_by([key_col, value_col]).aggregate([("cnt", "sum")])
        comb = comb.take(pc.sort_indices(comb, sort_keys=[
            (key_col, "ascending"), ("cnt_sum", "descending"),
            (value_col, "ascending")]))
        k = comb[key_col].to_numpy(zero_copy_only=False)
        n = len(k)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        first = np.flatnonzero(new_key)
        top = comb.take(pa.array(first, pa.int64()))
        return pa.table({key_col: top[key_col],
                         "mode_value": top[value_col],
                         "cnt": top["cnt_sum"].cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("__part").map_groups(per_partition,
                                              batch_format="pyarrow")


def approx_quantiles(ds, column: str, phis, k: int = 200) -> pa.Table:
    """Approximate quantiles of an UNBOUNDED float column via the
    mergeable KLL compactor sketch (``sketchlib/quantiles.py``) — the
    scale path where :func:`quantiles_fixedpoint`'s exact distinct-value
    shuffle does not apply (arbitrary float domains: embedding norms,
    scores, latencies).

    One ``map_batches`` pass emits a ~k-item sketch per block; the driver
    merges the tiny partials in a deterministic (bytewise-sorted) order —
    no shuffle, no distinct-value blowup, rank error ~1%/k=200 (asserted
    in tests).  Returns (phi, value, n) — n is exact (weights preserve
    counts)."""
    import numpy as np

    from ..sketchlib.quantiles import KllSketch

    def partial(t: pa.Table) -> pa.Table:
        sk = KllSketch(k)
        col = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
        col = col[~np.isnan(col)]
        sk.add_flat(col)
        return pa.table({"blob": pa.array([sk.to_bytes()], pa.binary())})

    parts = ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow").take_all()
    sk = KllSketch(k)
    for blob in sorted(r["blob"] for r in parts):
        sk = sk.merge(KllSketch.from_bytes(blob))
    phis = list(phis)
    vals = sk.quantiles(phis) if sk.n else np.full(len(phis), np.nan)
    return pa.table({"phi": pa.array(phis, pa.float64()),
                     "value": pa.array(vals, pa.float64()),
                     "n": pa.array([sk.n] * len(phis), pa.int64())})


def mix_corpus(ds, key_col: str, group_col: str, weights: dict,
               total: int):
    """Deterministic corpus mixing (The Pile / Dolma style source
    weighting): choose per-group acceptance rates so the EXPECTED output
    is ``total`` rows distributed as ``weights`` (each rate capped at 1.0
    — a group can't contribute more rows than it has), then keep exactly
    the rows whose SQL-expressible Knuth hash fraction of ``key_col``
    falls under the group's rate.

    Fully oracled: the rate is ``least(1.0, total * weight / group_count)``
    and the keep test is ``(key*2654435761 % 2^32)/2^32 < rate`` — both
    computable in ANSI SQL with the identical float expression, so the
    SAMPLE ITSELF is exact (same convention as ``sample_by_key`` /
    ``bottom_k_sample``).  Deterministic across reruns and cluster sizes;
    groups missing from ``weights`` get rate 0.  One cheap metadata pass
    for group counts (few groups by construction), then one shuffle-free
    filter pass.
    """
    import numpy as np
    import pyarrow.compute as pc

    def cnt(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t[group_col])
        return pa.table({"g": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts: dict = {}
    for r in ds.select_columns([group_col]).map_batches(
            cnt, batch_format="pyarrow").take_all():
        counts[r["g"]] = counts.get(r["g"], 0) + r["n"]
    rates = {g: min(1.0, total * float(weights.get(g, 0.0)) / c)
             for g, c in counts.items()}

    def filt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        f = hash_fraction_column(t, key_col)
        col = t[group_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        lut = np.array([rates.get(x, 0.0)
                        for x in enc.dictionary.to_pylist()], np.float64)
        rate = lut[enc.indices.to_numpy(zero_copy_only=False)]
        return t.filter(pa.array(f < rate))

    return ds.map_batches(filt, batch_format="pyarrow")


def approx_quantiles_by(ds, key_col: str, column: str, phis,
                        k: int = 200, num_partitions: int = 32):
    """Per-group approximate quantiles via mergeable KLL sketches: each
    batch folds its rows into ONE ~k-item sketch PER KEY present (values
    group-sorted, one pass), the tiny binary partials hash-partition by
    key, and each partition merges its blobs in deterministic bytewise
    order and emits the group's quantiles.  The shuffle carries
    (#blocks x #keys-per-block) ~1.8 KB sketch rows — never the data;
    the scale shape for unbounded float domains where
    :func:`grouped_quantiles`-style exact plans would shuffle every
    distinct value.  Returns (key, phi, value, n); n per group is exact.
    """
    import numpy as np

    from ..sketchlib.hashing import hash_str_u64, mix64
    from ..sketchlib.quantiles import KllSketch

    key_type = ds.schema().base_schema.field(key_col).type
    phis = list(phis)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], key_type),
                             "__sk": pa.array([], pa.binary())})
        karr = t[key_col].combine_chunks() if isinstance(
            t[key_col], pa.ChunkedArray) else t[key_col]
        kn = karr.to_numpy(zero_copy_only=False)
        v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        kn, v = kn[ok], v[ok]
        karr = karr.filter(pa.array(ok))
        order = np.argsort(kn, kind="stable")
        ks, vs = kn[order], v[order]
        new = np.empty(len(ks), bool)
        if len(ks):
            new[0] = True
            new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ks))
        blobs = []
        for s, e in zip(starts, ends):
            sk = KllSketch(k)
            sk.add_flat(vs[s:e])
            blobs.append(sk.to_bytes())
        return pa.table({
            key_col: karr.take(pa.array(order[starts], pa.int64())),
            "__sk": pa.array(blobs, pa.binary())})

    def add_part(t: pa.Table) -> pa.Table:
        karr = t[key_col]
        karr = karr.combine_chunks() if isinstance(
            karr, pa.ChunkedArray) else karr
        if pa.types.is_string(karr.type) or \
                pa.types.is_large_string(karr.type):
            h = hash_str_u64(karr)
        else:
            h = mix64(karr.to_numpy(zero_copy_only=False)
                      .astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32),
            pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        out_schema = pa.schema([(key_col, key_type),
                                ("phi", pa.float64()),
                                ("value", pa.float64()),
                                ("n", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = t[key_col].to_pylist()
        blobs = t["__sk"].to_pylist()
        by_key: dict = {}
        for kk, b in zip(keys, blobs):
            by_key.setdefault(kk, []).append(b)
        out_k, out_phi, out_v, out_n = [], [], [], []
        for kk in sorted(by_key):
            sk = KllSketch(k)
            for b in sorted(by_key[kk]):  # deterministic merge order
                sk = sk.merge(KllSketch.from_bytes(b))
            q = sk.quantiles(phis)
            out_k += [kk] * len(phis)
            out_phi += phis
            out_v += [float(x) for x in q]
            out_n += [sk.n] * len(phis)
        return pa.table({key_col: pa.array(out_k, key_type),
                         "phi": pa.array(out_phi, pa.float64()),
                         "value": pa.array(out_v, pa.float64()),
                         "n": pa.array(out_n, pa.int64())})

    partials = ds.select_columns([key_col, column]).map_batches(
        partial, batch_format="pyarrow").map_batches(
        add_part, batch_format="pyarrow")
    return partials.groupby("__part").map_groups(per_partition,
                                                 batch_format="pyarrow")


def value_ranks(ds, column: str, targets, key_col: "str | None" = None
                ) -> pa.Table:
    """Exact distributed rank bounds of given target values: for each
    target ``t`` (optionally with a distinct target list per key group)
    the counts of rows with ``value < t`` (``n_lt``) and ``value <= t``
    (``n_le``).  One combiner ``map_batches`` pass — each batch sorts its
    (per-group) values once and answers every target with two
    ``np.searchsorted`` calls — then a driver sum of the tiny partials
    (#blocks x #targets rows of three ints); no shuffle, the data never
    moves.  The scale path for auditing approximate-quantile answers
    (rank error certificates) without a global sort.

    ``targets``: a sequence of floats, or (with ``key_col``) a dict
    ``{key: sequence}``.  Returns ``(key?, target_idx, n_lt, n_le)``
    sorted by (key, target_idx).
    """
    import numpy as np

    if key_col is None:
        tgt = np.asarray(list(targets), np.float64)

        def partial(t: pa.Table) -> pa.Table:
            v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
            v = np.sort(v[~np.isnan(v)])
            return pa.table({
                "target_idx": pa.array(np.arange(len(tgt)), pa.int64()),
                "n_lt": pa.array(np.searchsorted(v, tgt, side="left"),
                                 pa.int64()),
                "n_le": pa.array(np.searchsorted(v, tgt, side="right"),
                                 pa.int64())})

        parts = ds.select_columns([column]).map_batches(
            partial, batch_format="pyarrow").take_all()
        acc_lt = np.zeros(len(tgt), np.int64)
        acc_le = np.zeros(len(tgt), np.int64)
        for r in parts:
            acc_lt[r["target_idx"]] += r["n_lt"]
            acc_le[r["target_idx"]] += r["n_le"]
        return pa.table({"target_idx": pa.array(np.arange(len(tgt)),
                                                pa.int64()),
                         "n_lt": pa.array(acc_lt, pa.int64()),
                         "n_le": pa.array(acc_le, pa.int64())})

    tmap = {k: np.asarray(list(v), np.float64) for k, v in targets.items()}

    def partial_by(t: pa.Table) -> pa.Table:
        keys_out, idx_out, lt_out, le_out = [], [], [], []
        if t.num_rows:
            kn = t[key_col].to_numpy(zero_copy_only=False)
            v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
            order = np.argsort(kn, kind="stable")
            ks, vs = kn[order], v[order]
            new = np.empty(len(ks), bool)
            new[0] = True
            new[1:] = ks[1:] != ks[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], len(ks))
            for s, e in zip(starts, ends):
                tg = tmap.get(ks[s])
                if tg is None:
                    continue
                seg = np.sort(vs[s:e])
                seg = seg[~np.isnan(seg)]
                keys_out.extend([ks[s]] * len(tg))
                idx_out.extend(range(len(tg)))
                lt_out.extend(np.searchsorted(seg, tg, side="left"))
                le_out.extend(np.searchsorted(seg, tg, side="right"))
        return pa.table({key_col: pa.array(keys_out, pa.string()),
                         "target_idx": pa.array(idx_out, pa.int64()),
                         "n_lt": pa.array(lt_out, pa.int64()),
                         "n_le": pa.array(le_out, pa.int64())})

    parts = ds.select_columns([key_col, column]).map_batches(
        partial_by, batch_format="pyarrow").take_all()
    acc: dict = {}
    for r in parts:
        k = (r[key_col], r["target_idx"])
        lt, le = acc.get(k, (0, 0))
        acc[k] = (lt + r["n_lt"], le + r["n_le"])
    rows = sorted(acc.items())
    return pa.table({
        key_col: pa.array([k for (k, _i), _ in rows], pa.string()),
        "target_idx": pa.array([i for (_k, i), _ in rows], pa.int64()),
        "n_lt": pa.array([v[0] for _, v in rows], pa.int64()),
        "n_le": pa.array([v[1] for _, v in rows], pa.int64())})


def profile_columns(ds, cols, m: int = 4096, num_partitions: int = 64):
    """Distributed column profiler (the data-quality pass a 100 TB ingest
    runs before anything else): per column — row count, null count,
    min/max, EXACT distinct count and a GHLL approximate distinct.

    Plan: two passes over the pruned columns, no payload exchange.

    * stats+sketch map: one ``map_batches`` emits per-(block, column)
      partial rows (counts, typed min/max, m packed GHLL registers);
      the driver folds blocks x columns tiny rows.
    * exact distincts: ONE slim exchange for ALL columns — (col_idx,
      value-hash) rows hash-partition, each partition counts unique
      hashes per column, counts sum (the :func:`count_distinct` plan
      generalized by a column tag; exact modulo 2^-64 hash collisions,
      the engine-wide caveat).

    Returns a pyarrow Table: (column, n, n_null, n_distinct, min_str,
    max_str, approx_distinct).  min/max cast to string driver-side so one
    output schema covers int and string columns exactly (profiled columns
    should be int or string; float casts are not oracle-stable).
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..sketchlib.estimator import SetSketchEstimator
    from ..sketchlib.hashing import hash_str_u64, mix64
    from ..sketchlib.sketches import GHLL

    cols = list(cols)
    sketch = GHLL(m=m, base=2.0, q=62)
    estimator = SetSketchEstimator(62, 1.0 / m, 2.0, m,
                                   card_range_correction=True)

    def col_hash(arr) -> np.ndarray:
        v = arr.to_numpy(zero_copy_only=False)
        if v.dtype.kind in "iu":
            return mix64(v.astype(np.uint64))
        if v.dtype.kind == "f":
            return mix64(v.astype(np.float64).view(np.uint64))
        return hash_str_u64(arr)

    def stats_partial(t: pa.Table) -> pa.Table:
        rows = {"col_idx": [], "n": [], "n_null": [], "mn": [], "mx": [],
                "regs": []}
        for ci, c in enumerate(cols):
            arr = t[c]
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
                else arr
            valid = arr.drop_null()
            mm = pc.min_max(arr)
            regs = np.zeros((1, m), dtype=sketch.dtype)
            if len(valid):
                h = col_hash(valid)
                sketch.add_flat(regs, np.zeros(len(h), dtype=np.int64), h)
            rows["col_idx"].append(ci)
            rows["n"].append(t.num_rows)
            rows["n_null"].append(arr.null_count)
            rows["mn"].append("" if mm["min"].as_py() is None
                              else str(mm["min"].as_py()))
            rows["mx"].append("" if mm["max"].as_py() is None
                              else str(mm["max"].as_py()))
            rows["regs"].append(regs.tobytes())
        return pa.table({
            "col_idx": pa.array(rows["col_idx"], pa.int32()),
            "n": pa.array(rows["n"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "mn": pa.array(rows["mn"], pa.string()),
            "mx": pa.array(rows["mx"], pa.string()),
            "regs": pa.array(rows["regs"], pa.binary())})

    # ---- exact distinct: one slim exchange for all columns -------------
    def hash_rows(t: pa.Table) -> pa.Table:
        hs, cis = [], []
        for ci, c in enumerate(cols):
            arr = t[c]
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
                else arr
            u = pc.unique(arr.drop_null())
            if len(u):
                hs.append(np.unique(col_hash(u)))
                cis.append(np.full(len(hs[-1]), ci, dtype=np.int32))
        if not hs:
            return pa.table({"col_idx": pa.array([], pa.int32()),
                             "h": pa.array([], pa.uint64()),
                             "__part": pa.array([], pa.uint32())})
        h = np.concatenate(hs)
        return pa.table({
            "col_idx": pa.array(np.concatenate(cis), pa.int32()),
            "h": pa.array(h, pa.uint64()),
            "__part": pa.array((h % np.uint64(num_partitions))
                               .astype(np.uint32), pa.uint32())})

    def part_counts(t: pa.Table) -> pa.Table:
        ci = t["col_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["h"].to_numpy(zero_copy_only=False)
        pair = np.unique(np.stack([ci, h.view(np.int64)], axis=1), axis=0)
        cnt = np.bincount(pair[:, 0], minlength=len(cols))
        return pa.table({
            "col_idx": pa.array(np.arange(len(cols), dtype=np.int32)),
            "nd": pa.array(cnt.astype(np.int64), pa.int64())})

    distinct = np.zeros(len(cols), dtype=np.int64)
    counts = ds.map_batches(hash_rows, batch_format="pyarrow") \
        .groupby("__part").map_groups(part_counts, batch_format="pyarrow")
    for b in counts.iter_batches(batch_format="pyarrow",
                                 batch_size=1 << 20):
        np.add.at(distinct, b["col_idx"].to_numpy(zero_copy_only=False),
                  b["nd"].to_numpy(zero_copy_only=False))

    # ---- fold the stats partials ---------------------------------------
    n = np.zeros(len(cols), dtype=np.int64)
    n_null = np.zeros(len(cols), dtype=np.int64)
    mn: list = [None] * len(cols)
    mx: list = [None] * len(cols)
    regs_acc = np.zeros((len(cols), m), dtype=sketch.dtype)
    for b in ds.map_batches(stats_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        cis = b["col_idx"].to_numpy(zero_copy_only=False)
        np.add.at(n, cis, b["n"].to_numpy(zero_copy_only=False))
        np.add.at(n_null, cis, b["n_null"].to_numpy(zero_copy_only=False))
        for ci, mn_s, mx_s, rb in zip(cis, b["mn"].to_pylist(),
                                      b["mx"].to_pylist(),
                                      b["regs"].to_pylist()):
            if mn_s != "":
                mn[ci] = mn_s if mn[ci] is None else _typed_min(
                    cols, ci, mn[ci], mn_s)
            if mx_s != "":
                mx[ci] = mx_s if mx[ci] is None else _typed_max(
                    cols, ci, mx[ci], mx_s)
            regs_acc[ci] = np.maximum(
                regs_acc[ci], np.frombuffer(rb, dtype=sketch.dtype))
    est = estimator.estimate_cardinality_simple(regs_acc)
    return pa.table({
        "column": pa.array(cols, pa.string()),
        "n": pa.array(n, pa.int64()),
        "n_null": pa.array(n_null, pa.int64()),
        "n_distinct": pa.array(distinct, pa.int64()),
        "min_str": pa.array(["" if v is None else v for v in mn],
                            pa.string()),
        "max_str": pa.array(["" if v is None else v for v in mx],
                            pa.string()),
        "approx_distinct": pa.array(est, pa.float64())})


def _typed_min(cols, ci, a: str, b: str) -> str:
    """Combine stringified block minima under the ORIGINAL type's order:
    numeric strings compare as ints, everything else lexicographically
    (matching SQL's binary collation for VARCHAR)."""
    try:
        return a if int(a) <= int(b) else b
    except ValueError:
        return a if a <= b else b


def _typed_max(cols, ci, a: str, b: str) -> str:
    try:
        return a if int(a) >= int(b) else b
    except ValueError:
        return a if a >= b else b


# --------------------------------------------------------------------- skyline
def _pareto_front(pts):
    """Lex-sorted distinct rows of ``pts`` that are Pareto-minimal.

    All dimensions minimize.  Exactness hinges on two facts: (a) among
    DISTINCT points, a dominator is strictly lex-smaller than every point
    it dominates, so a single lex-order sweep sees dominators first; and
    (b) dominance is transitive, so testing against already-dominated
    rows never produces a false positive.  2-D gets the classic O(n log n)
    cummin sweep; d > 2 a chunked frontier test (each chunk compares
    against the running frontier with one broadcast, then intra-chunk
    with one (c x c x d) matrix).
    """
    import numpy as np

    p = np.unique(pts, axis=0)          # distinct + lex-sorted
    n, d = p.shape
    if n == 0:
        return p
    keep = np.ones(n, bool)
    if d == 2:
        cm = np.minimum.accumulate(p[:, 1])
        keep[1:] = p[1:, 1] < cm[:-1]
        return p[keep]
    front = np.empty((0, d), p.dtype)
    out = []
    for s in range(0, n, 512):
        c = p[s:s + 512]
        dom = (front[None, :, :] <= c[:, None, :]).all(2).any(1) \
            if len(front) else np.zeros(len(c), bool)
        m = (c[None, :, :] <= c[:, None, :]).all(2)   # m[i, j]: j <= i
        dom |= np.tril(m, -1).any(1)
        survivors = c[~dom]
        out.append(survivors)
        front = np.concatenate([front, survivors])
    return np.concatenate(out)


def skyline(ds, dims: list[tuple[str, str]]) -> pa.Table:
    """Distributed skyline (Pareto frontier) over ``dims`` —
    ``[(col, 'min'|'max'), ...]``; returns the DISTINCT non-dominated
    points as a lex-sorted Arrow table.

    Exactly mergeable with no shuffle at all: skyline(A + B) is a subset
    of skyline(A) + skyline(B), so each block emits its local frontier
    (a map_batches partial, typically ~sqrt-of-block-size rows for
    anti-correlated dims) and one final pass over the concatenated
    partials finishes on the driver.  At 100 TB the partials stay tiny
    relative to blocks; a tree-combine level could be inserted like
    aggregates.multi_sketch_union if frontiers ever grew, but frontier
    size is data- not scale-bound (it never exceeds the true skyline
    times the block count).

    Integer dims only (the repo's fixed-point convention) so dominance
    comparisons are exact on both engines.
    """
    import numpy as np

    cols = [c for c, _ in dims]
    signs = np.array([1 if s == "min" else -1 for _, s in dims],
                     dtype=np.int64)

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        pts = np.stack([t[c].to_numpy().astype(np.int64) for c in cols],
                       axis=1) * signs
        f = _pareto_front(pts) * signs
        return pa.table({c: pa.array(f[:, i], pa.int64())
                         for i, c in enumerate(cols)})

    parts = ds.map_batches(local, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    pts = np.stack([np.array([r[c] for r in parts], dtype=np.int64)
                    for c in cols], axis=1) * signs
    f = _pareto_front(pts) * signs
    return pa.table({c: pa.array(f[:, i], pa.int64())
                     for i, c in enumerate(cols)})


def join_size_estimate(ds_a, ds_b, key_a: str, key_b: str,
                       s1: int = 256, s2: int = 9, rel_err_pct: int = 25,
                       num_partitions: int = 32):
    """Exact equi-join cardinality |A JOIN B ON key| = sum_k a_k * b_k
    (the query-optimizer statistic) plus an AMS inner-product estimate
    (sketchlib/ams.ams_inner_numerator — both sides sketched with the
    SAME counter-mode sign draw, so E[X_e Y_e] is exactly the join size)
    certified against the exact value in pure integer arithmetic.

    Shape: per-block (key, ca, cb) count partials from each side (rows
    never cross — only slim count pairs), ONE key-hash co-partition
    combines to full per-key counts, each partition emits one row of
    integer partials (join-size / F2 sums + its two linear AMS vectors);
    the driver folds Python-int exact.  The AMS vectors are what you'd
    keep at 100 TB to estimate join sizes WITHOUT the exchange — here the
    exact pass doubles as the certificate's ground truth.

    Returns a 1-row pa.Table (join_size, f2_a, f2_b, ams_ok).
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..sketchlib.ams import ams_inner_numerator, ams_partial
    from ..sketchlib.hashing import mix64

    n_est = s1 * s2

    def _count_partial(side: int):
        key = key_a if side == 0 else key_b

        def fn(t: pa.Table) -> pa.Table:
            agg = t.select([key]).group_by([key]) \
                .aggregate([([], "count_all")])
            k = agg[key]
            k = k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
            c = agg["count_all"].cast(pa.int64())
            z = pa.array(np.zeros(agg.num_rows, np.int64), pa.int64())
            h = mix64(k.to_numpy(zero_copy_only=False).astype(np.uint64))
            return pa.table({
                "k": k.cast(pa.int64()),
                "ca": c if side == 0 else z,
                "cb": z if side == 0 else c,
                "__part": pa.array((h % np.uint64(num_partitions)).astype(
                    np.uint32), pa.uint32())})
        return fn

    both = ds_a.map_batches(_count_partial(0), batch_format="pyarrow") \
        .union(ds_b.map_batches(_count_partial(1), batch_format="pyarrow"))

    def per_partition(t: pa.Table) -> pa.Table:
        empty_vec = np.zeros(n_est, np.int64).tobytes()
        if t.num_rows == 0:
            return pa.table({"js": pa.array([0], pa.int64()),
                             "f2a": pa.array([0], pa.int64()),
                             "f2b": pa.array([0], pa.int64()),
                             "ams_a": pa.array([empty_vec], pa.binary()),
                             "ams_b": pa.array([empty_vec], pa.binary())})
        comb = t.select(["k", "ca", "cb"]).group_by(["k"]) \
            .aggregate([("ca", "sum"), ("cb", "sum")])
        k = comb["k"]
        k = k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
        ca = comb["ca_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = comb["cb_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        js = int(np.sum(ca.astype(object) * cb.astype(object)))
        f2a = int(np.sum(ca.astype(object) * ca.astype(object)))
        f2b = int(np.sum(cb.astype(object) * cb.astype(object)))
        va = ams_partial(k.to_numpy(zero_copy_only=False), ca, s1=s1, s2=s2)
        vb = ams_partial(k.to_numpy(zero_copy_only=False), cb, s1=s1, s2=s2)
        return pa.table({"js": pa.array([js], pa.int64()),
                         "f2a": pa.array([f2a], pa.int64()),
                         "f2b": pa.array([f2b], pa.int64()),
                         "ams_a": pa.array([va.tobytes()], pa.binary()),
                         "ams_b": pa.array([vb.tobytes()], pa.binary())})

    rows = pa.concat_tables(list(
        both.groupby("__part").map_groups(per_partition,
                                          batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    js = sum(int(v) for v in rows["js"].to_pylist())
    f2a = sum(int(v) for v in rows["f2a"].to_pylist())
    f2b = sum(int(v) for v in rows["f2b"].to_pylist())
    acc_a = [0] * n_est
    acc_b = [0] * n_est
    for blob_a, blob_b in zip(rows["ams_a"].to_pylist(),
                              rows["ams_b"].to_pylist()):
        va = np.frombuffer(blob_a, np.int64)
        vb = np.frombuffer(blob_b, np.int64)
        for i in range(n_est):
            acc_a[i] += int(va[i])
            acc_b[i] += int(vb[i])
    num = ams_inner_numerator(acc_a, acc_b, s1=s1, s2=s2)
    if js > 0:
        ok = 1 if abs(num - s1 * js) * 100 <= s1 * js * rel_err_pct else 0
    else:
        # zero (or disjoint-domain) join: the estimate is zero-mean with
        # std <= sqrt(F2(a) F2(b) / s1) — certify against that scale
        import math

        bound = s1 * (3 * math.isqrt(f2a * f2b) // max(1, math.isqrt(s1)))
        ok = 1 if abs(num) <= max(bound, 1) else 0
    return pa.table({"join_size": pa.array([js], pa.int64()),
                     "f2_a": pa.array([f2a], pa.int64()),
                     "f2_b": pa.array([f2b], pa.int64()),
                     "ams_ok": pa.array([ok], pa.int64())})
