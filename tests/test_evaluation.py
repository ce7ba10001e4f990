"""Monte-Carlo evaluation pipelines vs the paper's closed-form bounds
(reference test strategy #3): distributed analogues of cardinality_test and
joint_estimation_test at reduced trial counts."""

import math

import numpy as np


def test_cardinality_error_pipeline_within_bound(ray_session):
    from setsketch_ray.pipelines.evaluation import cardinality_error_pipeline

    m = 1024
    tbl = cardinality_error_pipeline(family="ghll", m=m, n_trials=60,
                                     max_cardinality=30000, parallelism=8)
    bound = math.sqrt((3 * math.log(2) - 1) / m)
    card = tbl["cardinality"].to_numpy()
    rmse = tbl["rmse"].to_numpy()
    bias = tbl["relative_bias"].to_numpy()
    sel = card >= 1000  # plain GHLL regime (small range is linear counting)
    assert (rmse[sel] <= 1.35 * bound).all()
    assert np.abs(bias[sel]).max() <= 3.0 * bound / math.sqrt(60) + 0.01
    # small range correction keeps tiny cardinalities near-exact
    small = card <= 10
    assert np.abs(bias[small]).max() < 0.05


def test_joint_error_pipeline_recovers_jaccard(ray_session):
    from setsketch_ray.pipelines.evaluation import joint_error_pipeline

    tbl = joint_error_pipeline(family="ghll", m=1024, n_trials=30,
                               tuples=((500, 500, 1000), (900, 900, 200)),
                               parallelism=8)
    df = tbl.to_pandas()
    assert (df["bias_new"].abs() < 0.02).all()
    assert (df["rmse_new"] < 0.05).all()
    # the reference's headline result: joint ML beats inclusion-exclusion
    assert (df["rmse_new"] <= df["rmse_incl_excl"] * 1.1).all()


def test_config_keyed_result_sink(ray_session, tmp_path):
    import os

    import pyarrow as pa

    from setsketch_ray.pipelines.evaluation import write_results

    t = pa.table({"cardinality": pa.array([1, 2], type=pa.int64()),
                  "rmse": pa.array([0.1, 0.2])})
    p = write_results(t, "cardinality_test", "ghll", 4096, 2.0, 62, 20.0,
                      str(tmp_path))
    assert os.path.exists(p)
    assert "name=GeneralizedHyperLogLog;numRegisters=4096;q=62" in p
    lines = open(p).read().strip().splitlines()
    assert lines[0] == "cardinality;rmse"
    assert len(lines) == 3
