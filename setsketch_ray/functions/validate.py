"""Distributed data-validation / constraint checking (the Great-Expectations
/ Deequ-shaped pass a 100 TB ingest runs before anything else).

Declarative rules evaluated over a ``ray.data.Dataset`` in THREE cost
classes, each with the cheapest distributed shape that is still exact:

- **row-local rules** (``not_null`` / ``range`` / ``in_set`` / ``regex``):
  ONE vectorized ``map_batches`` pass over the pruned input computes
  per-block (checked, violations) partials for ALL such rules at once;
  only a handful of counter rows per block leave the workers.
- **uniqueness** (single or composite key): the distinct composite tuples
  of each block enter one slim hash-partitioned exchange (the
  ``profile_columns`` shape) — exact, no 64-bit-hash collision risk
  because the exchange carries the key VALUES, pre-deduplicated per
  block, never full rows.
- **referential integrity** (``fk``): one :func:`semi_anti_join` in
  ``anti`` mode against the (key-pruned) reference table — counts left
  rows with no match; the right side ships only its key column.

Every rule's result is a pure count pair, so the whole report is exactly
SQL-expressible (see ``validate_lineitem`` in ``__ray_entry__``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketchlib.hashing import hash_str_u64, mix2, mix64


def _col_hash(arr) -> np.ndarray:
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_string(a.type) or pa.types.is_large_string(a.type) \
            or pa.types.is_binary(a.type):
        return hash_str_u64(a)
    return mix64(a.to_numpy(zero_copy_only=False).astype(np.uint64))


def distinct_count(ds, cols: list[str], num_partitions: int = 32) -> int:
    """Exact distinct count of the composite key ``cols``: per-block local
    dedup (Arrow ``group_by``), hash-partition by the combined key hash so
    equal tuples meet exactly once, per-partition dedup + count, driver sum
    of ``num_partitions`` integers.  The exchange carries pre-deduplicated
    key VALUES (not hashes), so the count is exact."""
    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {c: pa.array([], t.schema.field(c).type) for c in cols}
                | {"__part": pa.array([], pa.uint32())})
        d = t.select(cols).group_by(cols).aggregate([])
        h = np.zeros(d.num_rows, np.uint64)
        for c in cols:
            h = mix2(h, _col_hash(d[c]))
        return d.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def per_part(t: pa.Table) -> pa.Table:
        n = t.select(cols).group_by(cols).aggregate([]).num_rows
        return pa.table({"cnt": pa.array([n], pa.int64())})

    parts = ds.map_batches(local, batch_format="pyarrow") \
        .groupby("__part").map_groups(per_part, batch_format="pyarrow")
    return sum(r["cnt"] for r in parts.take_all())


def validate_table(ds, rules: list[tuple], refs: dict | None = None,
                   num_partitions: int = 32) -> pa.Table:
    """Evaluate ``rules`` over ``ds``; returns one row per rule:
    ``(rule, col, n_checked, n_violations, ok)`` sorted by (rule, col).

    Rule forms (tuples)::

        ("not_null", col)
        ("range", col, lo, hi)           # inclusive; None = open side
        ("in_set", col, values)          # non-null values must be in set
        ("regex", col, pattern)          # full match, RE2 (SQL
                                         #   regexp_full_match parity)
        ("unique", [col, ...])           # composite-key uniqueness
        ("fk", col, ref_name, ref_col)   # refs[ref_name] is the ref Dataset

    ``n_checked`` is the number of rows the rule examined (all rows for
    ``not_null``/``unique``, non-null values otherwise); ``n_violations``
    counts failures; ``ok = int(n_violations == 0)``.
    """
    refs = refs or {}
    local_rules = [r for r in rules if r[0] in
                   ("not_null", "range", "in_set", "regex")]
    out_rows: list[tuple[str, str, int, int]] = []

    if local_rules:
        def partial(t: pa.Table) -> pa.Table:
            labels, cols_, checked, viol = [], [], [], []
            for r in local_rules:
                kind, col = r[0], r[1]
                arr = t[col]
                arr = arr.combine_chunks() \
                    if isinstance(arr, pa.ChunkedArray) else arr
                nn = len(arr) - arr.null_count
                if kind == "not_null":
                    c, v = len(arr), arr.null_count
                elif kind == "range":
                    lo, hi = r[2], r[3]
                    bad = pa.array(np.zeros(len(arr), np.bool_))
                    if lo is not None:
                        bad = pc.or_(bad, pc.less(arr, lo))
                    if hi is not None:
                        bad = pc.or_(bad, pc.greater(arr, hi))
                    c, v = nn, pc.sum(bad).as_py() or 0
                elif kind == "in_set":
                    ok_ = pc.is_in(arr, value_set=pa.array(r[2], arr.type))
                    c, v = nn, nn - (pc.sum(ok_).as_py() or 0)
                else:  # regex (full match)
                    m = pc.match_substring_regex(
                        arr, "^(?:" + r[2] + ")$")
                    c, v = nn, nn - (pc.sum(m).as_py() or 0)
                labels.append(kind)
                cols_.append(col)
                checked.append(int(c))
                viol.append(int(v))
            return pa.table({
                "rule": pa.array(labels, pa.string()),
                "col": pa.array(cols_, pa.string()),
                "n_checked": pa.array(checked, pa.int64()),
                "n_violations": pa.array(viol, pa.int64())})

        need = sorted({r[1] for r in local_rules})
        parts = ds.select_columns(need).map_batches(
            partial, batch_format="pyarrow").take_all()
        acc: dict[tuple[str, str], list[int]] = {}
        for row in parts:
            k = (row["rule"], row["col"])
            a = acc.setdefault(k, [0, 0])
            a[0] += row["n_checked"]
            a[1] += row["n_violations"]
        out_rows += [(k[0], k[1], a[0], a[1]) for k, a in acc.items()]

    for r in rules:
        if r[0] == "unique":
            cols = list(r[1])
            n = ds.count()
            nd = distinct_count(ds, cols, num_partitions)
            out_rows.append(("unique", ",".join(cols), n, n - nd))
        elif r[0] == "fk":
            from .relational import semi_anti_join
            _, col, ref_name, ref_col = r

            def drop_nulls(t: pa.Table, c: str = col) -> pa.Table:
                return t.filter(pc.is_valid(t[c]))

            left = ds.select_columns([col]).map_batches(
                drop_nulls, batch_format="pyarrow")
            n_checked = left.count()
            # violations = non-null keys with no reference match
            miss = semi_anti_join(
                left, refs[ref_name].select_columns([ref_col]),
                col, ref_col, mode="anti",
                num_partitions=num_partitions).count()
            out_rows.append(
                ("fk", f"{col}->{ref_name}.{ref_col}", n_checked, miss))

    out_rows.sort()
    return pa.table({
        "rule": pa.array([r[0] for r in out_rows], pa.string()),
        "col": pa.array([r[1] for r in out_rows], pa.string()),
        "n_checked": pa.array([r[2] for r in out_rows], pa.int64()),
        "n_violations": pa.array([r[3] for r in out_rows], pa.int64()),
        "ok": pa.array([int(r[3] == 0) for r in out_rows], pa.int64())})


def zscore_outliers(ds, group_col: str, value_col: str,
                    k_sigma: float = 3.0) -> pa.Table:
    """Per-group 3-sigma outlier counts over an INTEGER-SCALED value
    column (the distribution-shaped data-quality rule that
    :func:`validate_table`'s row-local bounds can't express: the bound
    itself is computed from the data).

    Two passes: (1) one grouped partial-aggregate collects integer
    sufficient statistics (n, sum, sum of squares) per group — exact
    int64, every value < 2^53; (2) one broadcast map pass counts rows
    with ``(n*v - sum)^2 > k^2 * (n*sumsq - sum^2)`` — i.e.
    ``|v - mean| > k * sigma_pop`` cleared of every division.  The left
    side is exact int64 cast to double; the right side is the IDENTICAL
    float expression tree a SQL oracle can mirror (each int operand
    < 2^53, so the doubles are exact and every IEEE op matches bit-
    for-bit — the ``value_variance_by_type`` convention).

    Returns (group, n, n_outliers) sorted by group."""
    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy().astype(np.int64)
        g = t[group_col]
        agg = pa.table({group_col: g,
                        "n1": pa.array(np.ones(len(v), np.int64)),
                        "s": pa.array(v, pa.int64()),
                        "ss": pa.array(v * v, pa.int64())}) \
            .group_by([group_col]).aggregate(
            [("n1", "sum"), ("s", "sum"), ("ss", "sum")])
        return agg.rename_columns([group_col, "n", "sum_c", "sumsq_c"])

    parts = pa.concat_tables(
        [pa.table(b) for b in
         ds.map_batches(partial, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=1 << 20)])
    stats = parts.group_by([group_col]).aggregate(
        [("n", "sum"), ("sum_c", "sum"), ("sumsq_c", "sum")])
    group_keys = stats[group_col].combine_chunks()
    ns_arr = stats["n_sum"].to_numpy().astype(np.int64)
    sum_arr = stats["sum_c_sum"].to_numpy().astype(np.int64)
    ssq_arr = stats["sumsq_c_sum"].to_numpy().astype(np.int64)
    k2 = float(k_sigma) * float(k_sigma)

    def count_out(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy().astype(np.int64)
        gi = pc.index_in(t[group_col], value_set=group_keys) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ns = ns_arr[gi]
        sums = sum_arr[gi]
        ssqs = ssq_arr[gi]
        lhs = (ns * v - sums).astype(np.float64)
        rhs = k2 * (ns.astype(np.float64) * ssqs.astype(np.float64)
                    - sums.astype(np.float64) * sums.astype(np.float64))
        out = (lhs * lhs > rhs).astype(np.int64)
        return pa.table({group_col: t[group_col],
                         "o": pa.array(out, pa.int64())}) \
            .group_by([group_col]).aggregate([("o", "sum")]) \
            .rename_columns([group_col, "n_outliers"])

    outs = pa.concat_tables(
        [pa.table(b) for b in
         ds.map_batches(count_out, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=1 << 20)])
    fin = outs.group_by([group_col]).aggregate([("n_outliers", "sum")])
    n_map = dict(zip(group_keys.to_pylist(), ns_arr.tolist()))
    keys = fin[group_col].to_pylist()
    return pa.table({
        group_col: pa.array(keys, stats[group_col].type),
        "n": pa.array([n_map[k] for k in keys], pa.int64()),
        "n_outliers": fin["n_outliers_sum"].cast(pa.int64()),
    }).sort_by(group_col)
