"""Distributed graph operators: co-occurrence edges + triangle counting.

Triangle counting is the canonical "wide" graph kernel: the naive plan
joins the edge table against itself twice (all-to-all on a potentially
skewed key).  The scale-safe plan used here is degree orientation
(Cohen / "node-iterator++"): orient every edge from its lower-(degree,
id) endpoint to the higher one, so every node's OUT-degree is at most
O(sqrt(m)) regardless of how skewed the in-degrees are, and the number
of generated wedges is bounded by sum C(outdeg, 2) <= O(m^1.5) — the hot
celebrity node that would explode a groupby stays bounded.  Wedges then
close against the distinct edge set in one co-partitioned hash exchange;
nothing ever materializes on the driver except per-partition counters.

All exchanges carry only int64 keys (u, v packed as (u << 32) | v), so
the operator is exactly SQL-oracle-able (edges/wedges/triangles are pure
integer set algebra).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from setsketch_ray.functions.spatial import _segment_cross

_KNUTH = np.uint64(2654435761)


def _part_of(key: np.ndarray, num_partitions: int) -> np.ndarray:
    return (((key.astype(np.uint64) * _KNUTH) >> np.uint64(16))
            % np.uint64(num_partitions)).astype(np.uint32)


def cooccurrence_edges(ds, group_col: str, item_col: str,
                       num_partitions: int = 64):
    """DISTINCT canonical (u < v) item pairs co-occurring in a group
    (market-basket / co-purchase edge derivation).  Two slim exchanges:
    co-locate rows by group, emit per-group distinct-item pairs, then
    dedup edges by edge-key partition.  Group fan-out is C(k, 2) per
    group — callers cap pathological group sizes upstream."""

    def tag_group(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy().astype(np.int64)
        return pa.table({
            "g": pa.array(g, pa.int64()),
            "i": pa.array(t[item_col].to_numpy().astype(np.int64),
                          pa.int64()),
            "__part": pa.array(_part_of(g, num_partitions), pa.uint32())})

    edge_empty = pa.table({"u": pa.array([], pa.int64()),
                           "v": pa.array([], pa.int64()),
                           "__part": pa.array([], pa.uint32())})

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return edge_empty
        g = t["g"].to_numpy()
        i = t["i"].to_numpy()
        # distinct (g, i), grouped by g via the lex sort inside unique
        gi = np.unique(np.stack([g, i], axis=1), axis=0)
        g, i = gi[:, 0], gi[:, 1]
        off = np.concatenate([[0], np.nonzero(np.diff(g))[0] + 1])
        cnt = np.diff(np.concatenate([off, [len(g)]]))
        ia, ib = _segment_cross(off, cnt, off, cnt)
        keep = ia < ib
        u, v = i[ia[keep]], i[ib[keep]]   # sorted within group => u < v
        key = u * (1 << 32) + v
        return pa.table({
            "u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
            "__part": pa.array(_part_of(key, num_partitions), pa.uint32())})

    def dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return edge_empty.drop_columns(["__part"])
        key = t["u"].to_numpy() * (1 << 32) + t["v"].to_numpy()
        k = np.unique(key)
        return pa.table({"u": pa.array(k >> 32, pa.int64()),
                         "v": pa.array(k & ((1 << 32) - 1), pa.int64())})

    co = ds.map_batches(tag_group, batch_format="pyarrow") \
        .groupby("__part").map_groups(emit, batch_format="pyarrow")
    return co.groupby("__part").map_groups(dedup, batch_format="pyarrow")


def pagerank_fixedpoint(edges, iters: int = 3, scale: int = 10 ** 12,
                        damping: tuple[int, int] = (85, 100),
                        num_partitions: int = 64, top_k: int = 20,
                        seed_mod: int | None = None, seed_rem: int = 0):
    """Distributed PageRank power iteration over an undirected DISTINCT
    canonical (u < v) edge dataset, in PURE-INTEGER fixpoint arithmetic so
    every iteration is exactly SQL-oracle-able (unrolled CTEs).

    Spec (deterministic, engine-independent):
        n       = number of nodes;  r0 = scale // n  for every node
        base    = (dnum_c * (scale // n)) // dden  with (dnum, dden) =
                  damping and dnum_c = dden - dnum (teleport mass)
        r'[v]   = base + (dnum * sum_{(u,v) in E} (r[u] // deg[u])) // dden
    Integer floor division makes the fixpoint a pure function of the edge
    set — no float association, no HUGEINT-to-DOUBLE hazard (the oracle
    keeps DuckDB's HUGEINT sums integral until the final BIGINT cast).

    Scale shape: the directed edge table (16 B/edge + outdeg) is built and
    hash-partitioned ONCE; each iteration is one slim co-partitioned
    ``lookup_join`` (ranks are (node, r) int64 pairs) plus one combiner
    ``grouped_aggregate`` — per-node state never touches the driver.  The
    undirected expansion gives every node out-degree >= 1, so there is no
    dangling-mass redistribution exchange.

    Returns the top ``top_k`` (node, pr) rows by (pr DESC, node ASC) as a
    sorted Ray Dataset.  Reference framing: standard power-iteration
    PageRank (Brin & Page 1998), re-expressed as Ray Data exchanges.

    ``seed_mod``/``seed_rem`` switch to PERSONALIZED PageRank (teleport
    mass concentrated on the seed set {v : v % seed_mod == seed_rem}
    instead of uniform): r0 and the teleport base become per-node values
    (scale // n_seeds on seeds, 0 elsewhere) — the seed predicate stays
    integer arithmetic so the SQL oracle mirrors it as a CASE, never a
    literal node list.
    """
    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join)

    def both_dirs(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy().astype(np.int64)
        v = t["v"].to_numpy().astype(np.int64)
        return pa.table({
            "s": pa.array(np.concatenate([u, v]), pa.int64()),
            "d": pa.array(np.concatenate([v, u]), pa.int64())})

    de = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()
    deg = grouped_aggregate(de, ["s"], {"dg": ("count", None)}, final="ray") \
        .materialize()
    n_nodes = int(deg.count())
    if n_nodes == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "pr": pa.array([], pa.int64())})
    dnum, dden = damping
    if seed_mod is None:
        r0 = scale // n_nodes
    else:
        n_seeds = int(deg.map_batches(
            lambda t: pa.table({"c": pa.array(
                [int(np.sum(t["s"].to_numpy() % seed_mod == seed_rem))],
                pa.int64())}), batch_format="pyarrow").sum("c"))
        if n_seeds == 0:
            raise ValueError("pagerank_fixedpoint: empty seed set")
        r0 = scale // n_seeds
    base = (dden - dnum) * r0 // dden

    de_schema = pa.schema([("s", pa.int64()), ("d", pa.int64())])
    dg_schema = pa.schema([("s", pa.int64()), ("dg", pa.int64())])
    edg_schema = pa.schema([("s", pa.int64()), ("d", pa.int64()),
                            ("dg", pa.int64())])
    rank_schema = pa.schema([("node", pa.int64()), ("r", pa.int64())])

    # outdeg rides the edge table once — never re-attached per iteration
    de_dg = lookup_join(de, deg, "s", "s",
                        num_partitions=num_partitions,
                        left_schema=de_schema, right_schema=dg_schema) \
        .materialize()

    def init_ranks(t: pa.Table) -> pa.Table:
        if seed_mod is None:
            r = np.full(t.num_rows, r0, np.int64)
        else:
            s = t["s"].to_numpy().astype(np.int64)
            r = np.where(s % seed_mod == seed_rem, r0, 0).astype(np.int64)
        return pa.table({"node": t["s"], "r": pa.array(r, pa.int64())})

    ranks = deg.map_batches(init_ranks, batch_format="pyarrow")

    def contrib_partial(t: pa.Table) -> pa.Table:
        """Per-batch combiner: sum contributions by destination BEFORE the
        shuffle, tag with the destination's hash partition."""
        r = t["r"].to_numpy().astype(np.int64)
        dg = t["dg"].to_numpy().astype(np.int64)
        part = pa.table({"d": t["d"],
                         "c": pa.array(r // dg, pa.int64())}) \
            .group_by(["d"]).aggregate([("c", "sum")])
        dst = part["d"].to_numpy().astype(np.int64)
        return pa.table({
            "d": part["d"], "c": part["c_sum"],
            "__part": pa.array(_part_of(dst, num_partitions), pa.uint32())})

    rank_empty = pa.table({"node": pa.array([], pa.int64()),
                           "r": pa.array([], pa.int64())})

    def finish_partition(t: pa.Table) -> pa.Table:
        """Per-partition final sum + damping formula — rank state stays
        partition-parallel (never a single block / the driver)."""
        if t.num_rows == 0:
            return rank_empty
        agg = t.group_by(["d"]).aggregate([("c", "sum")])
        sc = agg["c_sum"].to_numpy().astype(np.int64)
        if seed_mod is None:
            bb = base
        else:
            d = agg["d"].to_numpy().astype(np.int64)
            bb = np.where(d % seed_mod == seed_rem, base, 0)
        return pa.table({
            "node": agg["d"],
            "r": pa.array(bb + dnum * sc // dden, pa.int64())})

    for _ in range(iters):
        ed_r = lookup_join(de_dg, ranks, "s", "node",
                           num_partitions=num_partitions,
                           left_schema=edg_schema,
                           right_schema=rank_schema)
        ranks = ed_r.map_batches(contrib_partial, batch_format="pyarrow") \
            .groupby("__part") \
            .map_groups(finish_partition, batch_format="pyarrow")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "pr"])

    return ranks.map_batches(rename, batch_format="pyarrow") \
        .sort(["pr", "node"], descending=[True, False]).limit(top_k)


def triangle_count(edges, u_col: str = "u", v_col: str = "v",
                   num_partitions: int = 64) -> pa.Table:
    """Exact triangle / wedge / edge / node counts over a DISTINCT
    canonical (u < v) edge dataset.  Returns one row: n_nodes, n_edges,
    n_wedges (sum C(deg, 2) — orientation-free), n_triangles."""
    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join)

    edges = edges.materialize()   # consumed three times below

    def node_rows(t: pa.Table) -> pa.Table:
        n = np.concatenate([t[u_col].to_numpy(), t[v_col].to_numpy()])
        return pa.table({"node": pa.array(n.astype(np.int64), pa.int64())})

    deg = grouped_aggregate(
        edges.map_batches(node_rows, batch_format="pyarrow"),
        ["node"], {"d": ("count", None)}, final="ray")

    deg = deg.materialize()

    def _ren(name):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(["node", name])
        return fn

    ed = lookup_join(edges, deg.map_batches(_ren("d_u"),
                                            batch_format="pyarrow"),
                     u_col, "node", how="inner")
    ed = lookup_join(ed, deg.map_batches(_ren("d_v"),
                                         batch_format="pyarrow"),
                     v_col, "node", how="inner")

    def orient(t: pa.Table) -> pa.Table:
        u = t[u_col].to_numpy().astype(np.int64)
        v = t[v_col].to_numpy().astype(np.int64)
        du = t["d_u"].to_numpy().astype(np.int64)
        dv = t["d_v"].to_numpy().astype(np.int64)
        # lower (degree, id) endpoint becomes the wedge source
        fwd = (du < dv) | ((du == dv) & (u < v))
        src = np.where(fwd, u, v)
        dst = np.where(fwd, v, u)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "__part": pa.array(_part_of(src, num_partitions), pa.uint32())})

    probe_empty = pa.table({"k": pa.array([], pa.int64()),
                            "side": pa.array([], pa.int8()),
                            "__part": pa.array([], pa.uint32())})

    def wedges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return probe_empty
        sd = np.unique(np.stack([t["src"].to_numpy(),
                                 t["dst"].to_numpy()], axis=1), axis=0)
        s, d = sd[:, 0], sd[:, 1]
        off = np.concatenate([[0], np.nonzero(np.diff(s))[0] + 1])
        cnt = np.diff(np.concatenate([off, [len(s)]]))
        ia, ib = _segment_cross(off, cnt, off, cnt)
        keep = ia < ib
        a, b = d[ia[keep]], d[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        k = lo * (1 << 32) + hi
        return pa.table({
            "k": pa.array(k, pa.int64()),
            "side": pa.array(np.ones(len(k), np.int8), pa.int8()),
            "__part": pa.array(_part_of(k, num_partitions), pa.uint32())})

    def edge_keys(t: pa.Table) -> pa.Table:
        k = t[u_col].to_numpy().astype(np.int64) * (1 << 32) \
            + t[v_col].to_numpy().astype(np.int64)
        return pa.table({
            "k": pa.array(k, pa.int64()),
            "side": pa.array(np.zeros(len(k), np.int8), pa.int8()),
            "__part": pa.array(_part_of(k, num_partitions), pa.uint32())})

    count_empty = pa.table({"n": pa.array([], pa.int64())})

    def close_count(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return count_empty
        side = t["side"].to_numpy()
        k = t["k"].to_numpy()
        ek = np.unique(k[side == 0])
        wk = k[side == 1]
        pos = np.searchsorted(ek, wk)
        pos[pos >= len(ek)] = 0 if len(ek) else 0
        n = int((ek[pos] == wk).sum()) if len(ek) else 0
        return pa.table({"n": pa.array([n], pa.int64())})

    w = ed.map_batches(orient, batch_format="pyarrow") \
        .groupby("__part").map_groups(wedges, batch_format="pyarrow")
    e = edges.map_batches(edge_keys, batch_format="pyarrow")
    tri = int(sum(r["n"] for r in
                  w.union(e).groupby("__part")
                  .map_groups(close_count, batch_format="pyarrow")
                  .take_all()))

    dtab = deg.to_pandas() if hasattr(deg, "to_pandas") else deg
    dvals = np.asarray(dtab["d"], dtype=np.int64)
    return pa.table({
        "n_nodes": pa.array([len(dvals)], pa.int64()),
        "n_edges": pa.array([int(edges.count())], pa.int64()),
        "n_wedges": pa.array([int((dvals * (dvals - 1) // 2).sum())],
                             pa.int64()),
        "n_triangles": pa.array([tri], pa.int64())})


def connected_components_sweeps(edges, iters: int = 5,
                                num_partitions: int = 64):
    """Distributed min-label propagation over a DISTINCT canonical (u < v)
    edge dataset: ``label_0(v) = v``; each sweep sets ``label_{i+1}(v) =
    min(label_i(v), min over neighbors u of label_i(u))``.  After
    ``diameter`` sweeps the labels are the connected components; running a
    FIXED ``iters`` sweeps keeps the result an exact pure function of the
    edge set on both engines (the SQL oracle unrolls one UNION-ALL + GROUP
    BY min CTE per sweep), converged or not — the caller sizes ``iters``
    to the expected diameter.  (Near-dup clustering's label propagation in
    ``stages/cluster.py`` is the doubling variant of the same fixpoint;
    this is the graph-query surface over explicit edges.)

    Scale shape: the directed edge table is built and hash-partitioned
    ONCE; each sweep is one slim co-partitioned ``lookup_join`` of (node,
    label) int64 pairs, a per-batch min combiner BEFORE the exchange, and
    a per-partition final min — label state never touches the driver.

    Returns a Ray Dataset of (node, label) sorted by node.
    """
    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join)

    def both_dirs(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy().astype(np.int64)
        v = t["v"].to_numpy().astype(np.int64)
        return pa.table({
            "s": pa.array(np.concatenate([u, v]), pa.int64()),
            "d": pa.array(np.concatenate([v, u]), pa.int64())})

    de = edges.map_batches(both_dirs, batch_format="pyarrow")
    nodes = grouped_aggregate(de, ["s"], {"_n": ("count", None)},
                              final="ray").materialize()

    def self_loops(t: pa.Table) -> pa.Table:
        return pa.table({"s": t["s"], "d": t["s"]})

    # self-loops fold the node's OWN label into the same neighbor-min pass,
    # so each sweep consumes the label state exactly once (no union side,
    # no per-sweep materialize, no double-execution of the lazy lineage)
    de = de.union(nodes.map_batches(self_loops, batch_format="pyarrow")) \
        .materialize()

    de_schema = pa.schema([("s", pa.int64()), ("d", pa.int64())])
    lab_schema = pa.schema([("node", pa.int64()), ("l", pa.int64())])

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["s"], "l": t["s"]})

    labels = nodes.map_batches(init_labels, batch_format="pyarrow")

    def neighbor_partial(t: pa.Table) -> pa.Table:
        """Neighbor label mins by destination BEFORE the shuffle (the
        node's own label rides the same pass via its self-loop edge)."""
        lab = pa.table({"d": t["d"], "c": t["l"]}) \
            .group_by(["d"]).aggregate([("c", "min")])
        dst = lab["d"].to_numpy().astype(np.int64)
        return pa.table({
            "d": lab["d"], "c": lab["c_min"],
            "__part": pa.array(_part_of(dst, num_partitions), pa.uint32())})

    lab_empty = pa.table({"node": pa.array([], pa.int64()),
                          "l": pa.array([], pa.int64())})

    def finish_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return lab_empty
        agg = t.group_by(["d"]).aggregate([("c", "min")])
        return pa.table({"node": agg["d"], "l": agg["c_min"]})

    for _ in range(iters):
        ed_l = lookup_join(de, labels, "s", "node",
                           num_partitions=num_partitions,
                           left_schema=de_schema, right_schema=lab_schema)
        labels = ed_l.map_batches(neighbor_partial, batch_format="pyarrow") \
            .groupby("__part") \
            .map_groups(finish_partition, batch_format="pyarrow")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "label"])

    return labels.map_batches(rename, batch_format="pyarrow").sort("node")


def connected_components_doubling(edges, rounds: int = 4,
                                  num_partitions: int = 64):
    """Connected components by min-label propagation WITH pointer-jump
    doubling (the ``stages/cluster.py`` labelprop trick ported to the
    explicit-edge graph surface): each round sets ``label_{i+1}(v) =
    min(label_i(v), min over neighbors u of label_i(u),
    label_i(label_i(v)))``.  The extra label-of-label term makes label
    trees halve in height per round, so convergence is **O(log diameter)**
    rounds instead of the O(diameter) sweeps of
    :func:`connected_components_sweeps` — the variant a 100x-scale
    high-diameter graph needs.  A FIXED ``rounds`` keeps the result an
    exact pure function of the edge set on both engines (the SQL oracle
    unrolls, per round, one UNION-ALL of the self + neighbor CTE and a
    labels-self-join jump CTE, then GROUP BY min), converged or not.

    Scale shape: the directed edge table (+ self-loops) is built,
    hash-partitioned by source and materialized ONCE; each round is ONE
    tagged co-partition exchange where edge rows, label rows, and jump
    REQUEST rows (labels re-keyed by their label value) meet in the same
    ``groupby(part)`` and a vectorized ``index_in`` resolves both the
    neighbor and the jump lookups, followed by one (node, min) combine
    exchange with per-batch partials.  Label state never touches the
    driver.

    Returns a Ray Dataset of (node, label) sorted by node.
    """
    from setsketch_ray.functions.relational import grouped_aggregate

    def both_dirs(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy().astype(np.int64)
        v = t["v"].to_numpy().astype(np.int64)
        return pa.table({
            "s": pa.array(np.concatenate([u, v]), pa.int64()),
            "d": pa.array(np.concatenate([v, u]), pa.int64())})

    de = edges.map_batches(both_dirs, batch_format="pyarrow")
    nodes = grouped_aggregate(de, ["s"], {"_n": ("count", None)},
                              final="ray").materialize()

    # tagged static edge rows: key = s (where the label lives), val = d
    # (the proposal target); tag 1.  Self-loops are implicit: the label
    # row itself (tag 0) doubles as the node's own candidate.
    def edge_rows(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy().astype(np.int64)
        return pa.table({
            "key": t["s"], "val": t["d"],
            "tag": pa.array(np.full(t.num_rows, 1, np.int8), pa.int8()),
            "part": pa.array(_part_of(s, num_partitions), pa.uint32())})

    edge_tagged = de.map_batches(edge_rows,
                                 batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["s"], "l": t["s"]})

    labels = nodes.map_batches(init_labels, batch_format="pyarrow")

    # label rows per round: tag 0 = lookup side (key=node, val=label);
    # tag 2 = pointer-jump request (key=label, val=node) — resolved at the
    # label's OWN partition against the same round's label state
    def label_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy().astype(np.int64)
        lab = t["l"].to_numpy().astype(np.int64)
        return pa.table({
            "key": pa.array(np.concatenate([node, lab]), pa.int64()),
            "val": pa.array(np.concatenate([lab, node]), pa.int64()),
            "tag": pa.array(np.concatenate([
                np.full(len(node), 0, np.int8),
                np.full(len(node), 2, np.int8)]), pa.int8()),
            "part": pa.array(np.concatenate([
                _part_of(node, num_partitions),
                _part_of(lab, num_partitions)]), pa.uint32())})

    import pyarrow.compute as pc

    prop_empty = pa.table({"d": pa.array([], pa.int64()),
                           "c": pa.array([], pa.int64()),
                           "__part": pa.array([], pa.uint32())})

    def propagate(t: pa.Table) -> pa.Table:
        """Resolve neighbor + jump lookups against this partition's label
        rows, emit (target, candidate) with per-target min partials and
        the target's hash partition BEFORE the combine exchange."""
        if t.num_rows == 0:
            return prop_empty
        tag = t["tag"].to_numpy(zero_copy_only=False)
        lk = t.filter(pa.array(tag == 0))       # labels living here
        rq = t.filter(pa.array(tag != 0))       # neighbor + jump requests
        if lk.num_rows == 0:
            return prop_empty
        # the node's own label rides as a candidate for itself
        own = pa.table({"d": lk["key"], "c": lk["val"]})
        parts = [own]
        if rq.num_rows:
            keys = lk["key"].combine_chunks() \
                if isinstance(lk["key"], pa.ChunkedArray) else lk["key"]
            idx = pc.index_in(rq["key"], value_set=keys)
            valid = pc.is_valid(idx)
            rq = rq.filter(valid)
            idx = idx.filter(valid) if isinstance(idx, pa.Array) \
                else pc.filter(idx, valid)
            # requester (val) adopts the looked-up label
            parts.append(pa.table({"d": rq["val"],
                                   "c": lk["val"].take(idx)}))
        cand = pa.concat_tables(parts)
        agg = cand.group_by(["d"]).aggregate([("c", "min")])
        dst = agg["d"].to_numpy().astype(np.int64)
        return pa.table({
            "d": agg["d"], "c": agg["c_min"],
            "__part": pa.array(_part_of(dst, num_partitions), pa.uint32())})

    lab_empty = pa.table({"node": pa.array([], pa.int64()),
                          "l": pa.array([], pa.int64())})

    def finish_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return lab_empty
        agg = t.group_by(["d"]).aggregate([("c", "min")])
        return pa.table({"node": agg["d"], "l": agg["c_min"]})

    for _ in range(rounds):
        tagged = edge_tagged.union(
            labels.map_batches(label_rows, batch_format="pyarrow"))
        labels = tagged.groupby("part") \
            .map_groups(propagate, batch_format="pyarrow") \
            .groupby("__part") \
            .map_groups(finish_partition, batch_format="pyarrow")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "label"])

    return labels.map_batches(rename, batch_format="pyarrow").sort("node")


def k_core_sweeps(edges, k: int, iters: int = 5, num_partitions: int = 64):
    """Distributed k-core decomposition by fixed-sweep peeling over a
    DISTINCT canonical (u < v) edge dataset: ``alive_0(v) = 1``; each
    sweep recomputes the degree RESTRICTED to alive endpoints and sets
    ``alive_{i+1}(v) = alive_i(v) AND deg_alive_i(v) >= k``.  Running a
    FIXED ``iters`` sweeps keeps the result an exact pure function of the
    edge set on both engines (the SQL oracle unrolls one LEFT JOIN +
    filtered count CTE per sweep); the returned per-node ``stable`` flag
    certifies local convergence (sweep iters+1 agrees with sweep iters),
    so an under-sized ``iters`` turns the row red instead of silently
    shipping a non-core.

    Scale shape (same contract as connected_components_sweeps): the
    directed edge table is built and hash-partitioned ONCE with self-loop
    rows so each node's own alive state rides the same co-partitioned
    ``lookup_join`` stream as its neighbors' — per sweep ONE slim (s, d,
    a) join + per-batch degree partials BEFORE the exchange; alive state
    never touches the driver.  Self-loops carry cnt=0 (they mark state,
    never degree).

    Returns a Ray Dataset of (node, in_core, stable) sorted by node.
    """
    from .relational import grouped_aggregate, lookup_join

    def both_dirs(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy().astype(np.int64)
        v = t["v"].to_numpy().astype(np.int64)
        return pa.table({
            "s": pa.array(np.concatenate([u, v]), pa.int64()),
            "d": pa.array(np.concatenate([v, u]), pa.int64())})

    de = edges.map_batches(both_dirs, batch_format="pyarrow")
    nodes = grouped_aggregate(de, ["s"], {"_n": ("count", None)},
                              final="ray").materialize()

    def self_loops(t: pa.Table) -> pa.Table:
        return pa.table({"s": t["s"], "d": t["s"]})

    de = de.union(nodes.map_batches(self_loops, batch_format="pyarrow")) \
        .materialize()

    de_schema = pa.schema([("s", pa.int64()), ("d", pa.int64())])
    st_schema = pa.schema([("node", pa.int64()), ("a", pa.int64())])

    def init_alive(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["s"],
                         "a": pa.array(np.ones(t.num_rows, np.int64),
                                       pa.int64())})

    alive = nodes.map_batches(init_alive, batch_format="pyarrow")

    def degree_partial(t: pa.Table) -> pa.Table:
        """Per-batch: self-loop rows become state markers (cnt 0,
        st = a+1); alive-source edges pre-count by destination."""
        s = t["s"].to_numpy().astype(np.int64)
        d = t["d"].to_numpy().astype(np.int64)
        a = t["a"].to_numpy().astype(np.int64)
        selfm = s == d
        state = pa.table({
            "d": pa.array(d[selfm], pa.int64()),
            "cnt": pa.array(np.zeros(int(selfm.sum()), np.int64),
                            pa.int64()),
            "st": pa.array(a[selfm] + 1, pa.int64())})
        em = (~selfm) & (a == 1)
        if em.any():
            agg = pa.table({"d": pa.array(d[em], pa.int64())}) \
                .group_by(["d"]).aggregate([([], "count_all")])
            deg = pa.table({
                "d": agg["d"], "cnt": agg["count_all"].cast(pa.int64()),
                "st": pa.array(np.zeros(agg.num_rows, np.int64),
                               pa.int64())})
            out = pa.concat_tables([state, deg])
        else:
            out = state
        dst = out["d"].to_numpy().astype(np.int64)
        return out.append_column(
            "__part", pa.array(_part_of(dst, num_partitions), pa.uint32()))

    st_empty = pa.table({"node": pa.array([], pa.int64()),
                         "a": pa.array([], pa.int64())})

    def finish_partition(t: pa.Table, _k=k) -> pa.Table:
        if t.num_rows == 0:
            return st_empty
        agg = t.group_by(["d"]).aggregate([("cnt", "sum"), ("st", "max")])
        a_old = agg["st_max"].to_numpy().astype(np.int64) - 1
        deg = agg["cnt_sum"].to_numpy().astype(np.int64)
        new_a = ((a_old == 1) & (deg >= _k)).astype(np.int64)
        return pa.table({"node": agg["d"],
                         "a": pa.array(new_a, pa.int64())})

    def sweep(state):
        ed = lookup_join(de, state, "s", "node",
                         num_partitions=num_partitions,
                         left_schema=de_schema, right_schema=st_schema)
        return ed.map_batches(degree_partial, batch_format="pyarrow") \
            .groupby("__part") \
            .map_groups(finish_partition, batch_format="pyarrow")

    for _ in range(iters):
        alive = sweep(alive)
    alive = alive.materialize()      # consumed twice below
    nxt = sweep(alive)

    def ren_next(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "a_next"])

    nxt_schema = pa.schema([("node", pa.int64()), ("a_next", pa.int64())])
    joined = lookup_join(alive, nxt.map_batches(ren_next,
                                                batch_format="pyarrow"),
                         "node", "node", num_partitions=num_partitions,
                         left_schema=st_schema, right_schema=nxt_schema)

    def finalize(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy().astype(np.int64)
        an = t["a_next"].to_numpy().astype(np.int64)
        return pa.table({
            "node": t["node"],
            "in_core": pa.array(a, pa.int64()),
            "stable": pa.array((a == an).astype(np.int64), pa.int64())})

    return joined.map_batches(finalize, batch_format="pyarrow").sort("node")
