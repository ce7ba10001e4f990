from setsketch_ray.functions.graph import (connected_components_doubling,
                                           connected_components_sweeps)


def _labels(edges, iters, ray_session):
    import ray.data as rd

    ds = rd.from_items([{"u": u, "v": v} for u, v in edges])
    out = connected_components_sweeps(ds, iters=iters, num_partitions=8) \
        .to_pandas()
    return dict(zip(out["node"], out["label"]))


def _labels_doubling(edges, rounds, ray_session):
    import ray.data as rd

    ds = rd.from_items([{"u": u, "v": v} for u, v in edges])
    out = connected_components_doubling(ds, rounds=rounds,
                                        num_partitions=8).to_pandas()
    return dict(zip(out["node"], out["label"]))


def test_cc_doubling_matches_converged_sweeps(ray_session):
    # triangle + pair: both variants at convergence give the components
    edges = [(1, 2), (2, 3), (1, 3), (10, 11)]
    lab = _labels_doubling(edges, rounds=2, ray_session=ray_session)
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_doubling_log_diameter(ray_session):
    # path 1-...-15 has diameter 14: plain sweeps need 14, the pointer
    # jump reaches it in 5 rounds (label-tree reach 1,2,4,8,16) — the
    # O(log d) property the 100x-scale variant exists for
    edges = [(i, i + 1) for i in range(1, 15)]
    lab = _labels_doubling(edges, rounds=5, ray_session=ray_session)
    assert set(lab.values()) == {1}
    # under-iterated is a pure deterministic function too (fixed rounds)
    lab3 = _labels_doubling(edges, rounds=3, ray_session=ray_session)
    assert lab3[15] == 15 - 4  # reach after 3 rounds is 4


def test_cc_two_components_converged(ray_session):
    # component {1,2,3} (triangle) + component {10, 11}
    lab = _labels([(1, 2), (2, 3), (1, 3), (10, 11)], iters=3,
                  ray_session=ray_session)
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_fixed_sweeps_not_converged(ray_session):
    # path 1-2-3-4-5-6-7: label_k(v) = min over <=k-hop neighborhood,
    # so after 2 sweeps node 7 sees only {5, 6, 7}
    edges = [(i, i + 1) for i in range(1, 7)]
    lab = _labels(edges, iters=2, ray_session=ray_session)
    assert lab[7] == 5 and lab[3] == 1 and lab[1] == 1
    # and after 6 sweeps the path is fully converged
    lab = _labels(edges, iters=6, ray_session=ray_session)
    assert set(lab.values()) == {1}


def _kcore(edges, k, iters, ray_session):
    import ray.data as rd

    from setsketch_ray.functions.graph import k_core_sweeps

    ds = rd.from_items([{"u": u, "v": v} for u, v in edges])
    out = k_core_sweeps(ds, k=k, iters=iters, num_partitions=8).to_pandas()
    return (dict(zip(out["node"], out["in_core"])),
            dict(zip(out["node"], out["stable"])))


def _scalar_peel(edges, k, iters):
    import numpy as np

    nodes = sorted({x for e in edges for x in e})
    alive = {n: 1 for n in nodes}
    hist = []
    for _ in range(iters + 1):
        # the engine counts deg over alive SOURCES only (the dest's own
        # aliveness gates separately via a_old)
        deg = {n: 0 for n in nodes}
        for u, v in edges:
            if alive[u]:
                deg[v] += 1
            if alive[v]:
                deg[u] += 1
        alive = {n: 1 if alive[n] and deg[n] >= k else 0 for n in nodes}
        hist.append(dict(alive))
    return hist


def test_kcore_planted_clique_plus_tail(ray_session):
    # 6-clique (each node degree 5) + a path tail 100-101-102 hanging off
    # node 0 + pendant 200 off node 1.  k=3: tail and pendant peel away,
    # clique survives.
    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    edges = clique + [(0, 100), (100, 101), (101, 102), (1, 200)]
    core, stable = _kcore(edges, k=3, iters=4, ray_session=ray_session)
    hist = _scalar_peel(edges, 3, 4)
    assert core == hist[3]          # sweep `iters` state
    assert all(v == 1 for v in stable.values())
    assert {n for n, v in core.items() if v} == set(range(6))


def test_kcore_under_iterated_flags_unstable(ray_session):
    # chain of 30 nodes: k=2 peels one endpoint layer per sweep, so
    # iters=2 is far from fixpoint -> stable must flag the frontier
    edges = [(i, i + 1) for i in range(30)]
    core, stable = _kcore(edges, k=2, iters=2, ray_session=ray_session)
    hist = _scalar_peel(edges, 2, 2)
    assert core == hist[1]
    assert hist[1] != hist[2]          # not converged after 2 sweeps
    assert 0 in stable.values()        # certificate catches it


def test_kcore_whole_graph_is_core(ray_session):
    # 4-cycle at k=2: nothing peels, one sweep converges
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    core, stable = _kcore(edges, k=2, iters=1, ray_session=ray_session)
    assert core == {0: 1, 1: 1, 2: 1, 3: 1}
    assert all(v == 1 for v in stable.values())
