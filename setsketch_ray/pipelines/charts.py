"""Chart regeneration for the evaluation pipelines — pure-Python SVG.

The reference renders its paper figures with matplotlib
(``python/cardinality_error_charts.py:120-149`` bias + RMSE panels,
``python/joint_charts.py:124-135`` joint RMSE vs the Cramér-Rao bound,
``python/collision_probability.py`` theory curves).  This environment has
no matplotlib, so the renderer here is a small hand-rolled SVG line-chart
writer; the *semantics* — which series, which reference overlays, which
axes — follow the reference scripts cited on each function.

All chart functions take the engine's own evaluation tables
(``cardinality_error_pipeline`` / ``joint_error_pipeline`` output) and
return SVG text; ``write`` is a path convenience.
"""

from __future__ import annotations

import cmath
import math

import numpy as np

# categorical series colors (chosen for >= 4.5:1 contrast on white)
_COLORS = ("#3e5bd9", "#c23d2e", "#1e7d3c", "#8a4bb8", "#b07c10", "#0e7f8a")
_REF_COLOR = "#888888"


# ---------------------------------------------------------------- theory
# closed forms from the reference chart scripts (used as overlay lines)

def expected_relative_rmse_cardinality(m: int, b: float) -> float:
    """sqrt(((b+1)/(b-1) ln b - 1) / m) — the asymptotic relative RMSE of
    the simple cardinality estimator (cardinality_error_charts.py:81-82)."""
    if b <= 1.0:
        return math.sqrt(1.0 / m)  # b -> 1 limit of (b+1)/(b-1)*ln b is 2
    return math.sqrt(((b + 1.0) / (b - 1.0) * math.log(b) - 1.0) / m)


def minhash_relative_rmse_jaccard(j: float, m: int) -> float:
    """sqrt((1-J)/(J m)) — the classic MinHash bound
    (joint_charts.py:67-68)."""
    return math.sqrt((1.0 - j) / (j * m))


def _p(b: float, x: float) -> float:
    if b > 1.0:
        return -math.log1p(-x * (b - 1.0) / b) / math.log(b)
    return x


def cramer_rao_relative_rmse_jaccard(alpha_beta_ratio: float, j: float,
                                     m: int, b: float) -> float:
    """Cramér-Rao lower bound on the relative standard error of the joint
    ML Jaccard estimator (joint_charts.py:124-135, term for term)."""
    u = (alpha_beta_ratio + j) / (1.0 + alpha_beta_ratio)
    v = (1.0 + j * alpha_beta_ratio) / (1.0 + alpha_beta_ratio)
    uu = u / (u + v)
    vv = v / (u + v)
    factor = (b - 1.0) / (b * math.log(b)) if b > 1.0 else 1.0
    pu = _p(b, uu - vv * j)
    pv = _p(b, vv - uu * j)
    bu = b ** pu
    bv = b ** pv
    fisher = m * factor ** 2 * ((vv * bu + uu * bv) ** 2 / (1.0 - pu - pv)
                                + (vv * bu) ** 2 / pu + (uu * bv) ** 2 / pv)
    return math.sqrt(1.0 / fisher) / j


def collision_probability_lower_bound(j: float, b: float) -> float:
    """ln(1 + J(b-1)) / ln(b) — lower bound on P(register_1 == register_2)
    for equal-size sets (collision_probability.py:61-62
    ``prob_lower_bound``)."""
    if b <= 1.0:
        return j
    return math.log1p(j * (b - 1.0)) / math.log(b)


def collision_probability_upper_bound(j: float, b: float) -> float:
    """ln(1 + J(b-1) + (1-J)^2 (b-1)^2 / (4b)) / ln(b) — upper bound
    (collision_probability.py:64-65 ``prob_upper_bound``)."""
    if b <= 1.0:
        return j
    return math.log(1.0 + j * (b - 1.0)
                    + (1.0 - j) ** 2 * (b - 1.0) ** 2 / (4.0 * b)) \
        / math.log(b)


# ---------------------------------------------------------------- renderer

def _log_ticks(lo: float, hi: float):
    """Decade ticks covering [lo, hi] (log10)."""
    lo_e = int(math.floor(math.log10(lo)))
    hi_e = int(math.ceil(math.log10(hi)))
    return [10.0 ** e for e in range(lo_e, hi_e + 1)]


def _lin_ticks(lo: float, hi: float, n: int = 6):
    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / n
    mag = 10.0 ** math.floor(math.log10(raw))
    step = min(s for s in (mag, 2 * mag, 2.5 * mag, 5 * mag, 10 * mag)
               if s >= raw)
    first = math.ceil(lo / step) * step
    out = []
    t = first
    while t <= hi + 1e-12 * step:
        out.append(round(t, 12))
        t += step
    return out


def _fmt(v: float) -> str:
    if v == 0:
        return "0"
    a = abs(v)
    if a >= 1e4 or a < 1e-3:
        e = int(math.floor(math.log10(a)))
        mant = v / 10.0 ** e
        return f"{mant:g}e{e}"
    return f"{v:g}"


def line_chart(series: list[dict], *, title: str = "", x_label: str = "",
               y_label: str = "", x_log: bool = False, y_log: bool = False,
               ref_lines: list[tuple[float, str]] = (),
               width: int = 680, height: int = 420) -> str:
    """Render line series to SVG text.

    ``series``: [{"label", "x": seq, "y": seq, "color"?, "dash"?}].
    ``ref_lines``: horizontal dashed guides [(y_value, label)].
    Non-finite points are dropped per series.
    """
    ml, mr, mt, mb = 64, 16, 28 if title else 12, 46
    pw, ph = width - ml - mr, height - mt - mb

    clean = []
    for s in series:
        x = np.asarray(s["x"], dtype=np.float64)
        y = np.asarray(s["y"], dtype=np.float64)
        keep = np.isfinite(x) & np.isfinite(y)
        if x_log:
            keep &= x > 0
        if y_log:
            keep &= y > 0
        clean.append({**s, "x": x[keep], "y": y[keep]})
    xs = np.concatenate([s["x"] for s in clean if len(s["x"])] or [np.array([1.0])])
    ys_all = [s["y"] for s in clean if len(s["y"])]
    ys_all += [np.array([v for v, _lb in ref_lines])] if ref_lines else []
    ys = np.concatenate(ys_all or [np.array([1.0])])

    x_lo, x_hi = float(xs.min()), float(xs.max())
    y_lo, y_hi = float(ys.min()), float(ys.max())
    if not y_log:
        pad = 0.06 * (y_hi - y_lo or abs(y_hi) or 1.0)
        y_lo, y_hi = y_lo - pad, y_hi + pad
    if x_lo == x_hi:
        x_hi = x_lo + 1.0

    def sx(v):
        if x_log:
            f = (math.log10(v) - math.log10(x_lo)) / \
                (math.log10(x_hi) - math.log10(x_lo))
        else:
            f = (v - x_lo) / (x_hi - x_lo)
        return ml + f * pw

    def sy(v):
        if y_log:
            f = (math.log10(v) - math.log10(y_lo)) / \
                (math.log10(y_hi) - math.log10(y_lo))
        else:
            f = (v - y_lo) / (y_hi - y_lo)
        return mt + (1.0 - f) * ph

    e = []
    e.append(f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
             f'height="{height}" viewBox="0 0 {width} {height}" '
             f'font-family="sans-serif" font-size="11">')
    e.append(f'<rect width="{width}" height="{height}" fill="white"/>')
    if title:
        e.append(f'<text x="{width / 2}" y="17" text-anchor="middle" '
                 f'font-size="13">{title}</text>')

    xticks = _log_ticks(x_lo, x_hi) if x_log else _lin_ticks(x_lo, x_hi)
    yticks = _log_ticks(y_lo, y_hi) if y_log else _lin_ticks(y_lo, y_hi)
    for t in xticks:
        if not (x_lo <= t <= x_hi):
            continue
        px = sx(t)
        e.append(f'<line x1="{px:.1f}" y1="{mt}" x2="{px:.1f}" '
                 f'y2="{mt + ph}" stroke="#eeeeee"/>')
        e.append(f'<text x="{px:.1f}" y="{mt + ph + 14}" '
                 f'text-anchor="middle">{_fmt(t)}</text>')
    for t in yticks:
        if not (y_lo <= t <= y_hi):
            continue
        py = sy(t)
        e.append(f'<line x1="{ml}" y1="{py:.1f}" x2="{ml + pw}" '
                 f'y2="{py:.1f}" stroke="#eeeeee"/>')
        e.append(f'<text x="{ml - 6}" y="{py + 3.5:.1f}" '
                 f'text-anchor="end">{_fmt(t)}</text>')
    e.append(f'<rect x="{ml}" y="{mt}" width="{pw}" height="{ph}" '
             f'fill="none" stroke="#444444"/>')
    if x_label:
        e.append(f'<text x="{ml + pw / 2}" y="{height - 8}" '
                 f'text-anchor="middle">{x_label}</text>')
    if y_label:
        e.append(f'<text x="14" y="{mt + ph / 2}" text-anchor="middle" '
                 f'transform="rotate(-90 14 {mt + ph / 2})">{y_label}</text>')

    for rv, _lb in ref_lines:
        if not (y_lo <= rv <= y_hi):
            continue
        py = sy(rv)
        e.append(f'<line x1="{ml}" y1="{py:.1f}" x2="{ml + pw}" '
                 f'y2="{py:.1f}" stroke="{_REF_COLOR}" stroke-width="1.5" '
                 f'stroke-dasharray="2 4"/>')

    for i, s in enumerate(clean):
        if not len(s["x"]):
            continue
        color = s.get("color") or _COLORS[i % len(_COLORS)]
        dash = ' stroke-dasharray="6 3"' if s.get("dash") else ""
        pts = " ".join(f"{sx(float(px)):.1f},{sy(float(py)):.1f}"
                       for px, py in zip(s["x"], s["y"]))
        e.append(f'<polyline points="{pts}" fill="none" stroke="{color}" '
                 f'stroke-width="1.5"{dash}/>')
        ly = mt + 14 + 14 * i
        e.append(f'<line x1="{ml + pw - 120}" y1="{ly - 3}" '
                 f'x2="{ml + pw - 100}" y2="{ly - 3}" stroke="{color}" '
                 f'stroke-width="2"{dash}/>')
        e.append(f'<text x="{ml + pw - 95}" y="{ly}">{s["label"]}</text>')
    e.append("</svg>")
    return "\n".join(e)


# ---------------------------------------------------------------- charts

def cardinality_bias_chart(tables: dict, m: int, b: float) -> str:
    """Relative bias (%) of the simple cardinality estimator vs true
    cardinality, one series per family, zero guide — the reference's bias
    panel (cardinality_error_charts.py:120-133).  ``tables`` maps family
    label -> ``cardinality_error_pipeline`` output."""
    series = []
    for label, t in tables.items():
        card = t["cardinality"].to_numpy().astype(np.float64)
        bias = t["relative_bias"].to_numpy()
        order = np.argsort(card)
        keep = card[order] > 0  # log x-axis
        series.append({"label": label, "x": card[order][keep],
                       "y": 100.0 * bias[order][keep]})
    return line_chart(
        series, title=f"cardinality bias, m={m}, b={b:g}",
        x_label="true cardinality", y_label="relative bias (%)",
        x_log=True, ref_lines=[(0.0, "unbiased")])


def cardinality_rmse_chart(tables: dict, m: int, b: float) -> str:
    """Relative RMSE (%) vs true cardinality with the theoretical
    sqrt(((b+1)/(b-1) ln b - 1)/m) guide
    (cardinality_error_charts.py:135-149)."""
    series = []
    for label, t in tables.items():
        card = t["cardinality"].to_numpy().astype(np.float64)
        rmse = t["rmse"].to_numpy()
        order = np.argsort(card)
        keep = card[order] > 0
        series.append({"label": label, "x": card[order][keep],
                       "y": 100.0 * rmse[order][keep]})
    expected = 100.0 * expected_relative_rmse_cardinality(m, b)
    return line_chart(
        series, title=f"cardinality RMSE, m={m}, b={b:g}",
        x_label="true cardinality", y_label="relative RMSE (%)",
        x_log=True, ref_lines=[(expected, "theory")])


def joint_rmse_chart(table, m: int, b: float, *, jaccard: float,
                     union_size: int, label: str = "new",
                     rel_tol: float = 0.02) -> str:
    """Relative RMSE of the joint Jaccard estimator vs the difference
    ratio alpha/beta, overlaid with the Cramér-Rao bound and the classic
    MinHash bound (joint_charts.py:124-135, 67-68, 160-200).

    ``table`` is ``joint_error_pipeline`` output; rows are selected by
    true Jaccard ~= ``jaccard`` and true union ~= ``union_size`` (the grid
    tuples are integer-rounded, hence ``rel_tol``)."""
    d1 = table["trueDifference1"].to_numpy()
    d2 = table["trueDifference2"].to_numpy()
    ix = table["trueIntersection"].to_numpy()
    union = d1 + d2 + ix
    with np.errstate(divide="ignore", invalid="ignore"):
        true_j = np.where(union > 0, ix / union, 0.0)
    sel = (np.abs(true_j - jaccard) <= rel_tol * max(jaccard, 1e-12)) & \
          (np.abs(union - union_size) <= rel_tol * union_size) & (d2 > 0)
    if not sel.any():
        raise ValueError(
            f"no grid rows with jaccard~{jaccard} union~{union_size}")
    ratio = d1[sel] / d2[sel]
    mse = table[f"{label}MSEJaccard"].to_numpy()[sel]
    order = np.argsort(ratio)
    measured = np.sqrt(mse[order]) / jaccard

    ratios = ratio[order]
    theory = np.array([cramer_rao_relative_rmse_jaccard(r, jaccard, m, b)
                       for r in ratios])
    mh = minhash_relative_rmse_jaccard(jaccard, m)
    series = [
        {"label": label, "x": ratios, "y": measured},
        {"label": "Cramér-Rao", "x": ratios, "y": theory,
         "color": _REF_COLOR, "dash": True},
    ]
    return line_chart(
        series,
        title=f"Jaccard RMSE, m={m}, b={b:g}, J={jaccard:g}, "
              f"u={union_size}",
        x_label="difference ratio α/β", y_label="relative RMSE",
        x_log=True, ref_lines=[(mh, "MinHash")])


def collision_probability_chart(b_values=(2.0, 1.2, 1.001),
                                n_points: int = 200) -> str:
    """Register collision probability bounds vs Jaccard similarity per
    base b for equal-size sets — the reference's theory figure
    (collision_probability.py:61-65).  Pure closed form; no simulation
    input.  The two bounds converge to the diagonal J as b -> 1 (MinHash
    behaviour)."""
    js = np.linspace(0.0, 1.0, n_points)
    series = []
    for i, b in enumerate(b_values):
        lo = np.array([collision_probability_lower_bound(j, b) for j in js])
        hi = np.array([collision_probability_upper_bound(j, b) for j in js])
        color = _COLORS[i % len(_COLORS)]
        series.append({"label": f"b={b:g} lower", "x": js, "y": lo,
                       "color": color})
        series.append({"label": f"b={b:g} upper", "x": js, "y": hi,
                       "color": color, "dash": True})
    series.append({"label": "J (b→1)", "x": js, "y": js,
                   "color": _REF_COLOR, "dash": True})
    return line_chart(
        series, title="register collision probability bounds (equal set "
                      "sizes)",
        x_label="Jaccard similarity J", y_label="P(collision)")


def write(svg: str, path: str) -> str:
    with open(path, "w") as f:
        f.write(svg)
    return path


def make_charts(out_dir: str, *, m: int = 256, b: float = 2.0,
                n_trials: int = 20, seed: int = 42,
                max_cardinality: int = 20_000,
                union_size: int = 1_000) -> dict:
    """Regenerate the reference figure set at reduced scale: runs the two
    evaluation pipelines for GHLL/SetSketch1/SetSketch2 and writes the four
    SVGs.  Returns {chart_name: path}."""
    import os

    from .evaluation import cardinality_error_pipeline, joint_error_pipeline

    os.makedirs(out_dir, exist_ok=True)
    tables = {}
    for fam, lab in (("ghll", "GHLL"), ("setsketch1", "SetSketch1"),
                     ("setsketch2", "SetSketch2")):
        tables[lab] = cardinality_error_pipeline(
            fam, m=m, base=b, max_cardinality=max_cardinality,
            n_trials=n_trials, seed=seed)
    joint = joint_error_pipeline(
        "ghll", m=m, base=b, union_cardinalities=(union_size,),
        n_trials=n_trials, seed=seed)
    out = {
        "cardinality_bias": write(
            cardinality_bias_chart(tables, m, b),
            os.path.join(out_dir, "cardinality_bias.svg")),
        "cardinality_rmse": write(
            cardinality_rmse_chart(tables, m, b),
            os.path.join(out_dir, "cardinality_rmse.svg")),
        "joint_rmse": write(
            joint_rmse_chart(joint, m, b, jaccard=0.1,
                             union_size=union_size),
            os.path.join(out_dir, "joint_rmse.svg")),
        "collision_probability": write(
            collision_probability_chart(),
            os.path.join(out_dir, "collision_probability.svg")),
        "helper_func_error": write(
            helper_func_error_chart(),
            os.path.join(out_dir, "helper_func_error.svg")),
        "performance": write(
            performance_chart(),
            os.path.join(out_dir, "performance.svg")),
    }
    for name, svg in probability_density_charts().items():
        out[name] = write(svg, os.path.join(out_dir, f"{name}.svg"))
    return out


# ------------------------------------------------- probability densities
# register-value distributions (probability_densities.py:47-66)

def pdf_ghll(base: float, k: int) -> float:
    """P[K = k] for a GHLL register over one geometric level
    (probability_densities.py:47-56): cdf(k) = 1 - b^-k for k > 0."""
    def cdf(kk):
        return 0.0 if kk <= 0 else 1.0 - base ** (-kk)
    return cdf(k) - cdf(k - 1)


def pdf_setsketch(base: float, a: float, k: int) -> float:
    """P[K = k] for a SetSketch register
    (probability_densities.py:58-62): cdf(k) = exp(-a b^-k)."""
    return math.exp(-a * base ** (-k)) - math.exp(-a * base ** (-(k - 1)))


def pdf_hyperminhash(r: int, k: int) -> float:
    """P[K = k] for a HyperMinHash register with r sub-bucket bits
    (probability_densities.py:64-66): the GHLL(b=2) level spread uniformly
    over the 2^r sub-buckets."""
    n = 2 ** r
    return pdf_ghll(2.0, (k + n - 1) // n) / n


def bar_chart(groups: list[dict], *, title: str = "", x_label: str = "",
              y_label: str = "", y_log: bool = True,
              width: int = 680, height: int = 420) -> str:
    """Grouped-bar SVG (the probability-density panels): ``groups`` is
    [{"label", "x": ints, "y": values, "color"?}] — bars of each series
    interleave at every x."""
    ml, mr, mt, mb = 64, 16, 28 if title else 12, 46
    pw, ph = width - ml - mr, height - mt - mb
    xs = np.concatenate([np.asarray(g["x"], np.float64) for g in groups])
    ys = np.concatenate([np.asarray(g["y"], np.float64) for g in groups])
    pos = ys[ys > 0]
    y_lo = float(pos.min()) if y_log else 0.0
    y_hi = float(ys.max())
    x_lo, x_hi = float(xs.min()) - 0.5, float(xs.max()) + 0.5
    ns = len(groups)
    bw = 0.8 / ns  # bar width in x units

    def sx(v):
        return ml + (v - x_lo) / (x_hi - x_lo) * pw

    def sy(v):
        if y_log:
            if v <= 0:
                return mt + ph
            f = (math.log10(v) - math.log10(y_lo)) / \
                (math.log10(y_hi) - math.log10(y_lo) or 1.0)
        else:
            f = v / (y_hi or 1.0)
        return mt + (1.0 - max(0.0, min(1.0, f))) * ph

    e = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
         f'height="{height}" viewBox="0 0 {width} {height}" '
         f'font-family="sans-serif" font-size="11">',
         f'<rect width="{width}" height="{height}" fill="white"/>']
    if title:
        e.append(f'<text x="{width / 2}" y="17" text-anchor="middle" '
                 f'font-size="13">{title}</text>')
    yticks = _log_ticks(y_lo, y_hi) if y_log else _lin_ticks(0, y_hi)
    for t in yticks:
        py = sy(t)
        e.append(f'<line x1="{ml}" y1="{py:.1f}" x2="{ml + pw}" '
                 f'y2="{py:.1f}" stroke="#eeeeee"/>')
        e.append(f'<text x="{ml - 6}" y="{py + 3.5:.1f}" '
                 f'text-anchor="end">{_fmt(t)}</text>')
    step = max(1, int(round((x_hi - x_lo) / 16)))
    for t in range(int(math.ceil(x_lo)), int(x_hi) + 1, step):
        px = sx(t)
        e.append(f'<text x="{px:.1f}" y="{mt + ph + 14}" '
                 f'text-anchor="middle">{t}</text>')
    e.append(f'<rect x="{ml}" y="{mt}" width="{pw}" height="{ph}" '
             f'fill="none" stroke="#444444"/>')
    if x_label:
        e.append(f'<text x="{ml + pw / 2}" y="{height - 8}" '
                 f'text-anchor="middle">{x_label}</text>')
    if y_label:
        e.append(f'<text x="14" y="{mt + ph / 2}" text-anchor="middle" '
                 f'transform="rotate(-90 14 {mt + ph / 2})">{y_label}</text>')
    for i, g in enumerate(groups):
        color = g.get("color") or _COLORS[i % len(_COLORS)]
        for xv, yv in zip(g["x"], g["y"]):
            if yv <= 0:
                continue
            x0 = sx(xv - 0.4 + i * bw)
            x1 = sx(xv - 0.4 + (i + 1) * bw)
            y0 = sy(yv)
            e.append(f'<rect x="{x0:.1f}" y="{y0:.1f}" '
                     f'width="{x1 - x0:.1f}" '
                     f'height="{mt + ph - y0:.1f}" fill="{color}"/>')
        ly = mt + 14 + 14 * i
        e.append(f'<rect x="{ml + pw - 120}" y="{ly - 9}" width="18" '
                 f'height="8" fill="{color}"/>')
        e.append(f'<text x="{ml + pw - 95}" y="{ly}">{g["label"]}</text>')
    e.append("</svg>")
    return "\n".join(e)


def probability_density_charts() -> dict:
    """The two register-distribution panels
    (probability_densities.py:68-88): GHLL at b=sqrt(2) vs HyperMinHash
    r=1 (k 0..15), and GHLL at b=2^(1/8) vs HyperMinHash r=3 (k 0..60).
    Returns {name: svg}."""
    out = {}
    for name, b, r, kmax in (
            ("probability_densities_r1", 2.0 ** 0.5, 1, 15),
            ("probability_densities_r3", 2.0 ** 0.125, 3, 60)):
        ks = list(range(0, kmax + 1))
        out[name] = bar_chart(
            [{"label": f"GHLL b=2^(1/{2 ** r})",
              "x": ks, "y": [pdf_ghll(b, k) for k in ks],
              "color": _COLORS[0]},
             {"label": f"HyperMinHash r={r}",
              "x": ks, "y": [pdf_hyperminhash(r, k) for k in ks],
              "color": _COLORS[1]}],
            title="register value distribution",
            x_label="register value k", y_label="probability")
    return out


# ------------------------------------------------- helper-function error
# periodic relative error of the xi helper function via its Fourier series
# (helper_func_error.py:39-58); needs Gamma at complex arguments — scipy is
# not in this environment, so the Lanczos approximation (g=7, n=9; public
# coefficients) stands in (validated against known values in tests).

_LANCZOS_C = (
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)


def _cgamma(z: complex) -> complex:
    """Gamma(z) for complex z (Lanczos, g=7) — accurate to ~1e-13 on the
    strips these series need."""
    if z.real < 0.5:
        return math.pi / (cmath.sin(math.pi * z) * _cgamma(1.0 - z))
    z = z - 1.0
    x = _LANCZOS_C[0]
    for i in range(1, len(_LANCZOS_C)):
        x += _LANCZOS_C[i] / (z + i)
    t = z + 7.5
    return math.sqrt(2.0 * math.pi) * t ** (z + 0.5) * cmath.exp(-t) * x


def xi_squared_error(x: float, b: float, r: int) -> float:
    """(xi_b^r(x) - 1)^2 via the Fourier series
    (helper_func_error.py:39-50): sum_l Gamma(r + i c1 l) e^{i l c2},
    c1 = -2 pi / ln b, c2 = 2 pi x; squared amplitude of the periodic
    relative error of the helper function."""
    s = complex(0.0, 0.0)
    c1 = -2.0 * math.pi / math.log(b)
    c2 = 2.0 * math.pi * x
    l = 1
    while True:
        old = s
        s += _cgamma(complex(r, c1 * l)) * cmath.exp(complex(0.0, l * c2))
        if s == old:
            break
        l += 1
    return (2.0 / math.gamma(r) * s.real) ** 2


def max_amplitude_xi(b: float, r: int) -> float:
    """max_x |xi_b^r(x) - 1| (helper_func_error.py:52-58): dense grid over
    one period + Brent refine of the best bracket."""
    from ..sketchlib.solvers import brent_minimize

    grid = np.linspace(0.0, 1.0, 101)
    vals = [xi_squared_error(float(g), b, r) for g in grid]
    k = int(np.argmax(vals))
    lo = grid[max(0, k - 1)]
    hi = grid[min(len(grid) - 1, k + 1)]
    xbest = brent_minimize(lambda z: -xi_squared_error(z, b, r),
                           float(lo), float(hi))
    return math.sqrt(max(vals[k], xi_squared_error(xbest, b, r)))


def helper_func_error_chart(n_bases: int = 40) -> str:
    """max_x |xi_b^r(x)-1| over b in [1.2, 5] for r=1 and r=2
    (helper_func_error.py:103-125) — the periodic-error amplitude chart."""
    bases = np.linspace(1.2, 5.0, n_bases)
    return line_chart(
        [{"label": "r=1", "x": bases,
          "y": [max_amplitude_xi(float(b), 1) for b in bases]},
         {"label": "r=2", "x": bases,
          "y": [max_amplitude_xi(float(b), 2) for b in bases],
          "dash": True}],
        title="max|xi(x)-1| periodic relative error",
        x_label="base b", y_label="relative approx. error", y_log=True)


# ------------------------------------------------- performance chart
def measure_time_per_element(family: str, m: int,
                             cardinalities=(100, 1000, 10000, 100000,
                                            1000000)) -> list[float]:
    """Single-core recording time per element of this engine's batch
    kernels at each cardinality (the engine-side series of the
    time-per-element chart, cf. performance_charts.py:117)."""
    import time

    from ..sketchlib.hashing import mix2
    from ..sketchlib.sketches import make_sketch

    out = []
    for n in cardinalities:
        if family == "hll":  # HLL is parameterized (p, q), m = 2^p
            p = int(math.log2(m))
            sk = make_sketch("hll", p=p, q=64 - p)
        else:
            sk = make_sketch(family, m=m)
        vals = mix2(np.arange(n, dtype=np.uint64), 99)
        regs = sk.empty(1)
        rows = np.zeros(n, np.int64)
        t0 = time.perf_counter()
        sk.add_flat(regs, rows, vals)
        out.append((time.perf_counter() - t0) / n)
    return out


def read_reference_performance(data_dir: str, name: str, m: int,
                               base: float | None = 2.0,
                               mode: str = "stream"):
    """Parse the reference's published performance CSVs
    (``data/performance_test(...).csv``: cardinality; incl; excl; states)
    into (cardinalities, time-per-element) for one config — the overlay
    series of the time-per-element chart."""
    import glob
    import os

    for path in glob.glob(os.path.join(data_dir, "performance_test(*.csv")):
        fn = os.path.basename(path)
        if f"name={name};" not in fn or f"numRegisters={m};" not in fn:
            continue
        if f"aggregationMode={mode};" not in fn:
            continue
        # the reference formats base as %.17e in the filename
        if base is not None and f"base={base:.17e}" not in fn:
            continue
        if name != "MinHash" and "registerStateType=registers with lower" \
                not in fn:
            continue
        cards, tpe = [], []
        with open(path) as fh:
            lines = fh.read().splitlines()
        for ln in lines[2:]:
            parts = ln.split(";")
            if len(parts) < 3 or not parts[0].strip().isdigit():
                continue
            n = int(parts[0])
            cards.append(n)
            tpe.append(float(parts[2]) / n)
        return np.asarray(cards, np.float64), np.asarray(tpe, np.float64)
    return None


def performance_chart(data_dir: str = "/root/reference/data",
                      m: int = 256) -> str:
    """Time-per-element vs cardinality (performance_charts.py:117): this
    engine's single-core batch kernels beside the reference's published
    single-thread C++ numbers (stream mode, b=2 / lower-bound state) —
    the honest substrate comparison BASELINE.md tabulates."""
    cards = (100, 1000, 10000, 100000, 1000000)
    series = []
    fams = [("ghll", "GeneralizedHyperLogLog", 2.0),
            ("hll", "HyperLogLog", 2.0),
            ("setsketch1", "SetSketch1", 2.0),
            ("setsketch2", "SetSketch2", 2.0)]
    for i, (fam, ref_name, base) in enumerate(fams):
        tpe = measure_time_per_element(fam, m, cards)
        series.append({"label": f"{fam} (engine)", "x": list(cards),
                       "y": tpe, "color": _COLORS[i % len(_COLORS)]})
        ref = read_reference_performance(data_dir, ref_name, m, base)
        if ref is not None:
            series.append({"label": f"{fam} (ref C++)", "x": ref[0],
                           "y": ref[1], "color": _COLORS[i % len(_COLORS)],
                           "dash": True})
    return line_chart(series,
                      title=f"recording time per element (m={m})",
                      x_label="cardinality", y_label="time (s) / element",
                      x_log=True, y_log=True)
