"""SVG chart regeneration (pipelines/charts.py): renderer validity, the
theory overlays from the reference chart scripts, and the end-to-end
figure set over the real evaluation pipelines."""

import math
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from setsketch_ray.pipelines.charts import (
    cardinality_bias_chart, cardinality_rmse_chart,
    collision_probability_chart, collision_probability_lower_bound,
    collision_probability_upper_bound, cramer_rao_relative_rmse_jaccard,
    expected_relative_rmse_cardinality, joint_rmse_chart, line_chart,
    minhash_relative_rmse_jaccard)

_SVG_NS = "{http://www.w3.org/2000/svg}"


def _polylines(svg: str):
    root = ET.fromstring(svg)
    assert root.tag == f"{_SVG_NS}svg"
    return root.iter(f"{_SVG_NS}polyline")


def test_line_chart_svg_valid_and_complete():
    svg = line_chart(
        [{"label": "a", "x": [1, 10, 100], "y": [1.0, 2.0, 1.5]},
         {"label": "b", "x": [1, 10, 100], "y": [0.5, 0.7, 0.9]}],
        title="t", x_label="x", y_label="y", x_log=True,
        ref_lines=[(1.0, "ref")])
    # 2 series polylines + 2 legend strokes as <line>; ref line dashed
    polys = list(_polylines(svg))
    assert len(polys) == 2
    for p in polys:
        pts = p.attrib["points"].split()
        assert len(pts) == 3
    assert "stroke-dasharray" in svg  # the reference guide line


def test_line_chart_drops_nonfinite_points():
    svg = line_chart([{"label": "a", "x": [1, 2, 3, 4],
                       "y": [1.0, float("nan"), float("inf"), 2.0]}])
    (p,) = _polylines(svg)
    assert len(p.attrib["points"].split()) == 2


def test_theory_overlays_match_reference_formulas():
    # cardinality RMSE guide (cardinality_error_charts.py:81-82)
    m, b = 256, 2.0
    exp = math.sqrt(((b + 1) / (b - 1) * math.log(b) - 1) / m)
    assert abs(expected_relative_rmse_cardinality(m, b) - exp) < 1e-15

    # MinHash bound (joint_charts.py:67-68)
    assert abs(minhash_relative_rmse_jaccard(0.1, 256)
               - math.sqrt(0.9 / (0.1 * 256))) < 1e-15

    # Cramér-Rao bound: positive, below the MinHash bound for b -> 1
    # (SetSketch paper: the ML estimator attains the MinHash rate as b -> 1)
    for ratio in (0.1, 1.0, 10.0):
        cr_b1 = cramer_rao_relative_rmse_jaccard(ratio, 0.1, 256, 1.0001)
        assert 0 < cr_b1 <= minhash_relative_rmse_jaccard(0.1, 256) * 1.05
        # coarser base loses information -> larger bound
        assert cramer_rao_relative_rmse_jaccard(ratio, 0.1, 256, 2.0) \
            > cr_b1

    # collision bounds (collision_probability.py:61-65): lower <= upper,
    # both -> J as b -> 1, exact endpoints
    for b_ in (2.0, 1.2):
        for j in (0.0, 0.25, 0.5, 1.0):
            lo = collision_probability_lower_bound(j, b_)
            hi = collision_probability_upper_bound(j, b_)
            assert lo <= hi + 1e-12
        assert collision_probability_lower_bound(1.0, b_) == 1.0
        assert collision_probability_lower_bound(0.0, b_) == 0.0
    j = 0.3
    assert abs(collision_probability_lower_bound(j, 1.000001) - j) < 1e-5
    assert abs(collision_probability_upper_bound(j, 1.000001) - j) < 1e-5


def test_collision_probability_chart_pure_theory():
    svg = collision_probability_chart(b_values=(2.0, 1.2))
    # 2 bases x (lower, upper) + diagonal = 5 polylines
    assert len(list(_polylines(svg))) == 5


def test_cardinality_charts_from_stats_table():
    t = pa.table({
        "cardinality": pa.array([1, 10, 100, 1000], pa.int64()),
        "relative_bias": pa.array([0.01, -0.005, 0.002, 0.0]),
        "rmse": pa.array([0.06, 0.055, 0.052, 0.05]),
    })
    tables = {"GHLL": t, "SetSketch1": t}
    for fn in (cardinality_bias_chart, cardinality_rmse_chart):
        svg = fn(tables, 256, 2.0)
        assert len(list(_polylines(svg))) == 2


def test_joint_rmse_chart_row_selection():
    # synthetic grid: union 1000, J=0.1 (inter=100), ratio sweep
    d1 = np.array([450, 600, 800, 450], np.float64)
    d2 = np.array([450, 300, 100, 450], np.float64)
    ix = np.array([100, 100, 100, 400], np.float64)  # last row J=0.31
    t = pa.table({
        "trueDifference1": pa.array(d1), "trueDifference2": pa.array(d2),
        "trueIntersection": pa.array(ix),
        "newMSEJaccard": pa.array([1e-4, 1.2e-4, 2e-4, 9e-5]),
    })
    svg = joint_rmse_chart(t, 256, 2.0, jaccard=0.1, union_size=1000)
    polys = list(_polylines(svg))
    assert len(polys) == 2  # measured + Cramér-Rao overlay
    # only the 3 J=0.1 rows enter the measured series
    assert len(polys[0].attrib["points"].split()) == 3

    import pytest

    with pytest.raises(ValueError):
        joint_rmse_chart(t, 256, 2.0, jaccard=0.9, union_size=1000)


def test_make_charts_end_to_end(tmp_path, ray_session):
    from setsketch_ray.pipelines.charts import make_charts

    out = make_charts(str(tmp_path), m=64, b=2.0, n_trials=4,
                      max_cardinality=2000, union_size=200)
    assert set(out) == {"cardinality_bias", "cardinality_rmse",
                        "joint_rmse", "collision_probability"}
    for path in out.values():
        root = ET.parse(path).getroot()
        assert root.tag == f"{_SVG_NS}svg"
        assert any(True for _ in root.iter(f"{_SVG_NS}polyline"))
