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
    # small-set regime (union ~ m): the plain "new" estimator is biased by
    # design (the golden CSVs show the same); the mu-series CORRECTED
    # variant is the accurate one here
    bias = df["newCorrectedMeanJaccard"] - df["trueJaccard"]
    rmse = np.sqrt(df["newCorrectedMSEJaccard"])
    assert bias.abs().max() < 0.02
    assert (rmse < 0.05).all()
    # the reference's headline result: joint ML beats inclusion-exclusion
    assert (rmse <= np.sqrt(df["inclExclMSEJaccard"]) * 1.1).all()
    # known-card variants present + equal-register bounds bracket truth
    assert {"newKnownCardMSEJaccard", "inclExclKnownCardMeanUnion",
            "mlDeprecatedMeanJaccard", "simpleDeprecatedMSEJaccard",
            "collLowerBoundMeanJaccard", "collUpperBoundMeanJaccard"} \
        <= set(df.columns)
    assert (df["collLowerBoundMeanJaccard"]
            <= df["collUpperBoundMeanJaccard"] + 1e-12).all()


def test_joint_tuple_grid_matches_reference_shape(ray_session):
    """The generator reproduces the reference's grid structure
    (``joint_estimation_test.cpp:48-102``): at the reference's own union
    sizes the tuple count and a few spot tuples must match."""
    from setsketch_ray.pipelines.evaluation import joint_cardinality_tuples

    full = joint_cardinality_tuples()
    # grid properties: every tuple's union is one of the two union sizes
    unions = {d1 + d2 + ix for d1, d2, ix in full}
    assert unions == {1_000_000, 1_000}
    # reference's ratio=1 starting tuples are present
    assert (250000, 250000, 500000) in full
    assert (250, 250, 500) in full
    # intersection fractions 50/10/1/0.1 %
    assert {ix for _d1, _d2, ix in full if _d1 + _d2 + ix == 1000} \
        == {500, 100, 10, 1}


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
