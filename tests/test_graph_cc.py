from setsketch_ray.functions.graph import connected_components_sweeps


def _labels(edges, iters, ray_session):
    import ray.data as rd

    ds = rd.from_items([{"u": u, "v": v} for u, v in edges])
    out = connected_components_sweeps(ds, iters=iters, num_partitions=8) \
        .to_pandas()
    return dict(zip(out["node"], out["label"]))


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
