"""Fuzzy string matching: exact edit-distance<=1 pair discovery over a
column's distinct values via deletion-variant blocking (the SymSpell /
spell-correction trick, public: Garbe 2012; also the classic
Mor-Fraenkel 1982 single-error dictionary method).

Two strings are within Levenshtein distance 1 iff they are equal or share a
member of their {original + all single-deletion variants} sets with the
right length relation, so blocking on deletion variants has EXACT recall
for d<=1 — no all-pairs comparison, no similarity threshold tuning.  Shared
variants can also arise from distance-2 substitution pairs ("ab"/"ba" share
"b"), so candidates verify with an exact distance check before emission.

Scale shape: the variant exchange carries (variant, value) rows for the
DISTINCT value set only — vocabulary-sized, not corpus-sized (the standard
spell-correction argument); candidate pairs group-verify inside their
variant partition's co-partition, vectorized over padded byte matrices.

ASCII contract: verification compares utf-8 BYTES; for single-byte text
(identifiers, names — the intended inputs) byte distance == character
distance.  Multi-byte input raises loudly rather than silently over-count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketchlib.hashing import hash_str_u64


def _deletion_variants(vals: pa.Array) -> pa.Table:
    """(variant, value) rows: the value itself + every single-deletion
    string.  Vectorized: one pass per deletion position (max_len passes,
    each an Arrow slice+concat kernel over all long-enough rows)."""
    n = len(vals)
    lens = pc.binary_length(vals).to_numpy(zero_copy_only=False)
    out_var = [vals]
    out_val = [vals]
    max_len = int(lens.max()) if n else 0
    for i in range(max_len):
        mask = pa.array(lens > i)
        sub = vals.filter(mask)
        var = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(sub, 0, i),
            pc.utf8_slice_codeunits(sub, i + 1, np.iinfo(np.int32).max),
            "")
        out_var.append(var)
        out_val.append(sub)
    return pa.table({"variant": pa.concat_arrays(out_var),
                     "value": pa.concat_arrays(out_val)})


def _verify_d1(a: pa.Array, b: pa.Array) -> np.ndarray:
    """Vectorized exact Levenshtein<=1 over utf-8 bytes for candidate
    pairs whose lengths differ by at most 1 (guaranteed by the variant
    construction).  Returns a bool mask."""
    n = len(a)
    if n == 0:
        return np.zeros(0, bool)
    la = pc.binary_length(a).to_numpy(zero_copy_only=False)
    lb = pc.binary_length(b).to_numpy(zero_copy_only=False)
    width = int(max(la.max(), lb.max())) + 1

    def mat(arr, lens):
        arr = pc.cast(arr, pa.binary())
        combined = arr.combine_chunks() if \
            isinstance(arr, pa.ChunkedArray) else arr
        all_offs = np.frombuffer(combined.buffers()[1], np.int32)
        offs = all_offs[combined.offset:combined.offset + n + 1]
        data = np.frombuffer(combined.buffers()[2], np.uint8)
        m = np.zeros((n, width), np.uint8)
        idx = np.repeat(np.arange(n), lens)
        pos = np.arange(lens.sum()) - np.repeat(
            np.cumsum(lens) - lens, lens)
        m[idx, pos] = data[np.repeat(offs[:-1], lens) + pos]
        return m

    A, B = mat(a, la), mat(b, lb)
    ok = np.zeros(n, bool)
    same = la == lb
    if same.any():
        ok[same] = (A[same] != B[same]).sum(axis=1) <= 1
    # length differs by one: orient L = longer, S = shorter
    diff = ~same
    if diff.any():
        swap = lb > la
        L = np.where(swap[:, None], B, A)[diff]
        S = np.where(swap[:, None], A, B)[diff]
        ls = np.minimum(la, lb)[diff]
        # p = length of common prefix
        neq = L[:, :-1] != S[:, :-1]
        p = np.where(neq.any(axis=1), neq.argmax(axis=1), width - 1)
        # suffix: need L[j+1] == S[j] for all j in [p, ls-1]; padding
        # bytes are 0 == 0 so the True-run extends to the right edge and
        # the condition reduces to "last False index < p"
        m2 = L[:, 1:] != S[:, :-1]
        last_false = np.where(
            m2.any(axis=1), width - 2 - m2[:, ::-1].argmax(axis=1), -1)
        ok[diff] = (last_false < p) | (p >= ls)
    return ok


def edit_distance_pairs(ds, col: str, num_partitions: int = 32):
    """All unordered pairs of DISTINCT ``col`` values within Levenshtein
    distance 1 (excluding equal pairs).

    Returns a Dataset of (value_a, value_b) with value_a < value_b,
    deduplicated.  Pipeline: per-block distinct -> one (variant, value)
    exchange partitioned by hash(variant) -> per-partition global variant
    grouping emits verified candidate pairs -> one slim pair exchange
    dedups.  Exactly SQL-expressible (self-join on levenshtein<=1)."""
    def distinct_block(t: pa.Table) -> pa.Table:
        vals = t[col]
        vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) \
            else vals
        vals = pc.unique(pc.drop_null(vals))
        if len(vals) and not pc.all(
                pc.string_is_ascii(vals)).as_py():
            raise ValueError(
                "edit_distance_pairs: non-ASCII values; byte-domain "
                "verification would miscount multi-byte characters")
        tab = _deletion_variants(vals)
        part = (hash_str_u64(tab["variant"]) % num_partitions) \
            .astype(np.uint32)
        return tab.append_column("__part", pa.array(part, pa.uint32()))

    def emit_pairs(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        # blocks may repeat (variant, value) rows (per-block distinct is
        # local); dedup rows first, then group by variant
        t = pa.table({"variant": t["variant"], "value": t["value"]}) \
            .group_by(["variant", "value"]).aggregate([]) \
            .sort_by([("variant", "ascending"), ("value", "ascending")])
        var = t["variant"]
        var = var.combine_chunks() if isinstance(var, pa.ChunkedArray) \
            else var
        n = len(var)
        if n == 0:
            return pa.table({"value_a": pa.array([], pa.string()),
                             "value_b": pa.array([], pa.string()),
                             "__part": pa.array([], pa.uint32())})
        new = np.ones(n, bool)
        if n > 1:
            new[1:] = ~pc.equal(var.slice(1), var.slice(0, n - 1)) \
                .to_numpy(zero_copy_only=False)
        gid = np.cumsum(new) - 1
        sizes = np.bincount(gid)
        first = np.cumsum(sizes) - sizes
        # all within-group index pairs (i < j), vectorized
        gs = sizes[sizes > 1]
        gf = first[sizes > 1]
        if len(gs) == 0:
            return pa.table({"value_a": pa.array([], pa.string()),
                             "value_b": pa.array([], pa.string()),
                             "__part": pa.array([], pa.uint32())})
        npairs = (gs * (gs - 1)) // 2
        grp = np.repeat(np.arange(len(gs)), npairs)
        k = np.arange(npairs.sum()) - np.repeat(
            np.cumsum(npairs) - npairs, npairs)
        # triangular unrank within each group: i = row of pair index k in
        # the (s-1)-row triangle, via quadratic inversion of the cumulative
        # pair counts C(i) = i*s - i*(i+1)/2, then a +-1 integer correction
        # (the float sqrt can land one off at exact-square boundaries)
        s = gs[grp]
        ii = np.floor(
            (2 * s - 1 - np.sqrt((2 * s - 1) ** 2 - 8 * k)) / 2) \
            .astype(np.int64)
        cum = lambda r: r * s - (r * (r + 1)) // 2  # noqa: E731
        ii -= cum(ii) > k
        ii += cum(ii + 1) <= k
        off = cum(ii)
        jj = k - off + ii + 1
        ia = gf[grp] + ii
        ib = gf[grp] + jj
        vals = t["value"]
        vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) \
            else vals
        a = vals.take(pa.array(ia, pa.int64()))
        b = vals.take(pa.array(ib, pa.int64()))
        keep = pc.not_equal(a, b).to_numpy(zero_copy_only=False)
        keep &= _verify_d1(a, b)
        a, b = a.filter(pa.array(keep)), b.filter(pa.array(keep))
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        part = (hash_str_u64(lo) % num_partitions).astype(np.uint32)
        return pa.table({"value_a": lo, "value_b": hi,
                         "__part": pa.array(part, pa.uint32())})

    def dedup(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        return t.group_by(["value_a", "value_b"]).aggregate([])

    return ds.select_columns([col]) \
        .map_batches(distinct_block, batch_format="pyarrow") \
        .groupby("__part").map_groups(emit_pairs, batch_format="pyarrow") \
        .groupby("__part").map_groups(dedup, batch_format="pyarrow")
