"""Duplicate-group clustering: union-find over verified pair edges + a
broadcast cluster-assignment stage.

At test scale the verified edge list is tiny (dup pairs are sparse after
thresholding), so union-find runs on the driver and the id -> cluster map is
broadcast once via ``ray.put`` and read inside an actor-pool ``map_batches``
(no shuffle join; SURVEY.md §7.3).  The 10^12-row design is iterative
hash-to-min label propagation (a groupby loop over edges), documented in
``pipelines/dedup.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class UnionFind:
    """Path-compressing union-find over arbitrary hashable ids."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        root = x
        while p != root:
            root, p = p, self.parent[p]
        # compress
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # canonical root = lexicographic min, so cluster ids are stable
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo

    def components(self) -> dict:
        return {x: self.find(x) for x in list(self.parent)}


def cluster_edges(id_a, id_b) -> dict:
    """Edges -> {member_id: cluster_root_id} (roots are lexicographic minima)."""
    uf = UnionFind()
    for a, b in zip(id_a, id_b):
        uf.union(a, b)
    return uf.components()


class AssignClusters:
    """Actor-pool stage: append ``cluster_id`` (root member id; singleton rows
    get their own id).  The mapping is fetched from the object store once per
    actor in ``__init__`` — broadcast, not re-shipped per batch."""

    def __init__(self, mapping_ref, id_col: str = "image_id"):
        import ray

        self.mapping = ray.get(mapping_ref) if not isinstance(mapping_ref, dict) \
            else mapping_ref
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        m = self.mapping
        cluster = [m.get(i, i) for i in ids]
        out = batch.append_column("cluster_id", pa.array(cluster, pa.string()))
        return out.append_column(
            "is_canonical",
            pa.array([c == i for c, i in zip(cluster, ids)], pa.bool_()))


def cluster_edges_labelprop(edges_ds, num_partitions: int | None = None,
                            max_rounds: int = 50) -> dict:
    """Distributed hash-to-min label propagation over the edge dataset — the
    10^12-scale alternative to driver union-find (only the sparse edge list
    ever shuffles; no full-corpus state).

    Each round: every node's label becomes the min of its own and its
    neighbors' labels (``grouped_aggregate`` min over the edge-expanded
    (node, neighbor_label) stream); labels are re-attached to edges by a
    hash join.  Converges in O(component diameter) rounds — near-dup
    clusters are tiny, so a handful.

    Returns {member_id: root_id} like :func:`cluster_edges` (and is asserted
    equal to it in tests).
    """
    import ray
    import ray.data as rd

    from ..functions.relational import grouped_aggregate

    if num_partitions is None:
        # each Dataset.join spawns num_partitions aggregator actors per round;
        # keep the pool well under the cpu count
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)

    # initial labels: every endpoint labels itself
    def init_labels(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([t["id_a"].combine_chunks()
                                if isinstance(t["id_a"], pa.ChunkedArray)
                                else t["id_a"],
                                t["id_b"].combine_chunks()
                                if isinstance(t["id_b"], pa.ChunkedArray)
                                else t["id_b"]])
        return pa.table({"node": ids, "label": ids})

    edge_tbl = pa.concat_tables(
        list(edges_ds.select_columns(["id_a", "id_b"]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20))
        or [pa.table({"id_a": pa.array([], pa.string()),
                      "id_b": pa.array([], pa.string())})])
    if edge_tbl.num_rows == 0:
        return {}
    labels = grouped_aggregate(rd.from_arrow(init_labels(edge_tbl)),
                               ["node"], {"label": ("min", "label")})
    edges = rd.from_arrow(edge_tbl)

    for _round in range(max_rounds):
        lab_ds = rd.from_arrow(labels)
        # attach current labels to both edge endpoints (hash joins)
        withl = edges.join(
            lab_ds.map_batches(lambda t: t.rename_columns(["node_a", "label_a"]),
                               batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions,
            on=("id_a",), right_on=("node_a",))
        withl = withl.join(
            lab_ds.map_batches(lambda t: t.rename_columns(["node_b", "label_b"]),
                               batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions,
            on=("id_b",), right_on=("node_b",))

        # each endpoint proposes its neighbor's label
        def proposals(t: pa.Table) -> pa.Table:
            node = pa.concat_arrays([
                t["id_a"].combine_chunks() if isinstance(t["id_a"], pa.ChunkedArray) else t["id_a"],
                t["id_b"].combine_chunks() if isinstance(t["id_b"], pa.ChunkedArray) else t["id_b"]])
            lab = pa.concat_arrays([
                t["label_b"].combine_chunks() if isinstance(t["label_b"], pa.ChunkedArray) else t["label_b"],
                t["label_a"].combine_chunks() if isinstance(t["label_a"], pa.ChunkedArray) else t["label_a"]])
            return pa.table({"node": node, "label": lab})

        prop = withl.map_batches(proposals, batch_format="pyarrow")
        both = prop.union(rd.from_arrow(labels))
        new_labels = grouped_aggregate(both, ["node"], {"label": ("min", "label")})
        if new_labels.sort_by("node").equals(labels.sort_by("node")):
            break
        labels = new_labels

    # path-compress: labels propagate to the true root via pointer jumping
    lab = dict(zip(labels["node"].to_pylist(), labels["label"].to_pylist()))
    for node in list(lab):
        root = node
        while lab.get(root, root) != root:
            root = lab[root]
        lab[node] = root
    return {k: v for k, v in lab.items()}


def transitive_pairs(mapping: dict) -> set:
    """All unordered intra-cluster pairs implied by a component map (for
    recall evaluation against a truth_pairs table)."""
    from collections import defaultdict

    groups = defaultdict(list)
    for member, root in mapping.items():
        groups[root].append(member)
    pairs = set()
    for members in groups.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs
