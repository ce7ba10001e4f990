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
