"""Monte-Carlo estimator-evaluation pipelines — the reference's experiment
drivers re-expressed as Ray Data pipelines:

* :func:`cardinality_error_pipeline` == ``cardinality_test.cpp:45-101`` (A1):
  ``ray.data.range(n_trials)`` -> per-trial sketch fold + estimate at each
  grid cardinality -> grouped mean / relative bias / RMSE / std / kurtosis
  (the ``util.hpp:33-76`` reducers, as vectorized partial aggregates);
* :func:`joint_error_pipeline` == ``joint_estimation_test.cpp:48-339`` (A3):
  planted (diff1, diff2, intersection) tuples, all joint estimators, grouped
  error stats.  Set composition uses disjoint hashed universes exactly like
  the reference's ``composeSketch`` construction (``:157-201``).

Each trial's randomness is a pure function of (seed, trial, index) — no
worker-local RNG state — so results are reproducible across any scheduling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketchlib.estimator import MinHashEstimator, SetSketchEstimator
from ..sketchlib.hashing import mix2
from ..sketchlib.sketches import GHLL, MinHash, SetSketch1, SetSketch2


def config_string(family: str, m: int, base: float, q: int, a: float) -> str:
    """Reference-style config key for result sinks (mirrors ``appendInfo``,
    ``sketch.hpp:1969-1981``)."""
    names = {"ghll": "GeneralizedHyperLogLog", "setsketch1": "SetSketch1",
             "setsketch2": "SetSketch2", "minhash": "MinHash", "hll": "HyperLogLog"}
    a_eff = (1.0 / m) if family in ("ghll", "hll") else a
    return (f"name={names[family]};numRegisters={m};q={q};"
            f"base={base:.17e};a={a_eff:.17e};")


def write_results(table: pa.Table, kind: str, family: str, m: int,
                  base: float, q: int, a: float, out_dir: str) -> str:
    """Config-keyed result sink (the engine's analogue of the reference's
    ``data/<test>(<config>).csv`` files, ``cardinality_test.cpp:36-43``):
    one CSV per (experiment kind, config), written atomically."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir,
                        f"{kind}({config_string(family, m, base, q, a)}).csv")
    import csv as _csv

    tmp = path + ".tmp"
    cols = table.column_names
    with open(tmp, "w", newline="") as f:
        w = _csv.writer(f, delimiter=";")
        w.writerow(cols)
        for row in table.to_pylist():
            w.writerow([row[c] for c in cols])
    os.replace(tmp, path)
    return path


def geometric_cardinalities(max_cardinality: int, relative_increment: float = 0.3):
    """Geometric grid {1, ...} like ``util.hpp:78-85`` (coarser increment for
    test speed)."""
    out = [1]
    c = 1.0
    while out[-1] < max_cardinality:
        c = max(c * (1 + relative_increment), c + 1)
        v = min(int(c), max_cardinality)
        if v != out[-1]:
            out.append(v)
    return out


def _make_sketch(family: str, m: int, base: float, q: int, a: float):
    if family == "ghll":
        return GHLL(m=m, base=base, q=q)
    if family == "setsketch1":
        return SetSketch1(m=m, base=base, a=a, q=q)
    if family == "setsketch2":
        return SetSketch2(m=m, base=base, a=a, q=q)
    if family == "minhash":
        return MinHash(m=m)
    raise ValueError(family)


class _CardinalityTrials:
    """Actor stage: for each trial id, sketch sets at every grid cardinality
    and emit (cardinality, estimate) rows.  Bigger grid points reuse the
    smaller sets' elements (incremental growth, like the reference's loop)."""

    def __init__(self, family, m, base, q, a, cardinalities, seed):
        self.sketch = _make_sketch(family, m, base, q, a)
        self.family = family
        if family == "minhash":
            self.estimator = MinHashEstimator(m)
        else:
            self.estimator = SetSketchEstimator(
                q, (1.0 / m) if family == "ghll" else a, base, m,
                card_range_correction=(family == "ghll"))
        self.cardinalities = cardinalities
        self.seed = seed

    def __call__(self, batch) -> pa.Table:
        trials = batch["id"].to_numpy()
        rows_c, rows_e, rows_t = [], [], []
        cmax = self.cardinalities[-1]
        for t in trials:
            elems = mix2(np.arange(cmax, dtype=np.uint64),
                         int(t) * 0x9E3779B9 + self.seed)
            offsets = np.array([0] + list(self.cardinalities))
            # each grid cardinality is its own row-set: sketch all at once
            vals = np.concatenate([elems[:c] for c in self.cardinalities])
            offs = np.zeros(len(self.cardinalities) + 1, dtype=np.int64)
            np.cumsum(self.cardinalities, out=offs[1:])
            regs = self.sketch.sketch_rows(vals, offs)
            if self.family == "minhash":
                est = self.estimator.estimate_cardinality(regs)
            else:
                est = self.estimator.estimate_cardinality_simple(regs)
            rows_c += list(self.cardinalities)
            rows_e += list(est)
            rows_t += [int(t)] * len(self.cardinalities)
        return pa.table({
            "cardinality": pa.array(rows_c, pa.int64()),
            "estimate": pa.array(rows_e, pa.float64()),
            "trial": pa.array(rows_t, pa.int64()),
        })


def error_stats(ds, key: str, value: str, true_col: str | None = None):
    """Grouped mean/bias/RMSE/std/kurtosis — the ``util.hpp:33-76`` reducers
    as moment partial-aggregates (sums of powers 1..4 per batch, tiny final)."""
    from ..functions.relational import grouped_aggregate

    def add_moments(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = t[value]
        cols = {c: t[c] for c in t.column_names}
        if true_col:
            rel = pc.subtract(pc.divide(pc.cast(v, pa.float64()),
                                        pc.cast(t[true_col], pa.float64())),
                              pa.scalar(1.0))
        else:
            rel = pc.cast(v, pa.float64())
        cols["rel"] = rel
        cols["rel2"] = pc.power(rel, pa.scalar(2.0))
        cols["rel3"] = pc.power(rel, pa.scalar(3.0))
        cols["rel4"] = pc.power(rel, pa.scalar(4.0))
        return pa.table(cols)

    ds = ds.map_batches(add_moments, batch_format="pyarrow")
    agg = grouped_aggregate(ds, [key], {
        "n": ("count", None),
        "m1": ("mean", "rel"),
        "m2": ("mean", "rel2"),
        "m3": ("mean", "rel3"),
        "m4": ("mean", "rel4"),
        "mean_estimate": ("mean", value),
    })
    import pyarrow.compute as pc

    m1 = agg["m1"].to_numpy()
    m2 = agg["m2"].to_numpy()
    m3 = agg["m3"].to_numpy()
    m4 = agg["m4"].to_numpy()
    var = np.maximum(m2 - m1 ** 2, 0.0)
    # central 4th moment from raw moments
    mu4 = m4 - 4 * m3 * m1 + 6 * m2 * m1 ** 2 - 3 * m1 ** 4
    with np.errstate(invalid="ignore", divide="ignore"):
        kurtosis = np.where(var > 0, mu4 / var ** 2, 0.0)
    out = pa.table({
        key: agg[key],
        "n": agg["n"],
        "mean_estimate": agg["mean_estimate"],
        "relative_bias": pa.array(m1, pa.float64()),
        "rmse": pa.array(np.sqrt(m2), pa.float64()),
        "std": pa.array(np.sqrt(var), pa.float64()),
        "kurtosis": pa.array(kurtosis, pa.float64()),
    })
    return out


def cardinality_error_pipeline(family: str = "ghll", m: int = 1024,
                               base: float = 2.0, q: int = 62, a: float = 20.0,
                               max_cardinality: int = 100_000,
                               n_trials: int = 100, seed: int = 42,
                               parallelism: int = 32) -> pa.Table:
    """Distributed analogue of ``gradle runCardinalityTest`` at reduced scale.

    Returns per-grid-cardinality (relative_bias, rmse, std, kurtosis); the
    rmse column is checked against sqrt(((b+1)/(b-1) ln b - 1)/m) in tests.
    """
    import ray.data as rd

    grid = geometric_cardinalities(max_cardinality)
    trials = rd.range(n_trials, override_num_blocks=parallelism)
    est = trials.map_batches(
        _CardinalityTrials,
        fn_constructor_args=(family, m, base, q, a, grid, seed),
        batch_format="pyarrow", batch_size=8, concurrency=2)
    return error_stats(est, "cardinality", "estimate", true_col="cardinality")


def joint_cardinality_tuples(union_cardinalities=(1_000_000, 1_000),
                             intersection_fractions=(0.5, 0.1, 0.01, 0.001),
                             ratio_factor: float = 1.2,
                             max_ratio: float = 1000.0):
    """The reference's (diff1, diff2, intersection) evaluation grid
    (``joint_estimation_test.cpp:48-102``): per union size and intersection
    fraction, sweep the difference ratio geometrically up to ``max_ratio``.
    ``union_cardinalities`` is the size knob — the reference's full grid is
    the default; tests/queries pass smaller unions for speed."""
    import math

    tuples = set()
    for u in union_cardinalities:
        for frac in intersection_fractions:
            inter = int(u * frac)
            if inter < 1:
                continue
            ratio = 1.0
            while True:
                diff1 = int(math.floor((u - inter) / (1.0 + 1.0 / ratio)))
                diff2 = u - inter - diff1
                tuples.add((diff1, diff2, inter))
                if diff2 == 0 or diff1 / diff2 >= max_ratio:
                    break
                ratio *= ratio_factor
    return sorted(tuples)


# the 12 derived quantities of a JointEstimationResult, in the reference's
# CSV order (``joint_estimation_test.cpp:230-241``)
_QUANTITIES = (
    ("Difference1", "difference1"), ("Difference2", "difference2"),
    ("Intersection", "intersection"), ("1", "cardinality1"),
    ("2", "cardinality2"), ("Union", "union"), ("Jaccard", "jaccard"),
    ("Cosine", "cosine"), ("InclusionCoefficient1", "inclusion1"),
    ("InclusionCoefficient2", "inclusion2"), ("Alpha", "alpha"),
    ("Beta", "beta"))


def _joint_estimator_calls(family):
    """(label, estimator_kind, fn(est, r1, r2, c1, c2)) per family.

    ``new``/``inclExcl`` labels mirror the reference's
    ``getJointEstimateLabels`` exactly (``sketch.hpp:689-696, 1516-1528``)
    and run on the PLAIN estimator (no small-set dispatch) so the wide CSV is
    comparable to the golden files; the μ-series corrected variant
    (``estimateJointNewCorrected``, ``sketch.hpp:578-633``) is emitted under
    its own ``newCorrected*`` labels, and the deprecated estimators under
    ``simpleDeprecated``/``mlDeprecated``."""
    base = [
        ("new", "plain",
         lambda e, r1, r2, c1, c2: e.estimate_joint_new(r1, r2)),
        ("newKnownCard", "plain",
         lambda e, r1, r2, c1, c2: e.estimate_joint_new(r1, r2, c1, c2)),
        ("inclExcl", "plain",
         lambda e, r1, r2, c1, c2: e.estimate_joint_incl_excl(r1, r2)),
        ("inclExclKnownCard", "plain",
         lambda e, r1, r2, c1, c2: e.estimate_joint_incl_excl(r1, r2, c1, c2)),
    ]
    if family == "minhash":
        base += [
            ("simpleDeprecated", "plain",
             lambda e, r1, r2, c1, c2: e.estimate_joint_simple_deprecated(
                 r1, r2)),
            ("original", "plain",
             lambda e, r1, r2, c1, c2: e.estimate_joint_original(r1, r2)),
            ("originalKnownCard", "plain",
             lambda e, r1, r2, c1, c2: e.estimate_joint_original(
                 r1, r2, c1, c2)),
        ]
    else:
        base += [
            ("newCorrected", "corr",
             lambda e, r1, r2, c1, c2: e.estimate_joint_new(r1, r2)),
            ("newCorrectedKnownCard", "corr",
             lambda e, r1, r2, c1, c2: e.estimate_joint_new(r1, r2, c1, c2)),
            ("simpleDeprecated", "plain",
             lambda e, r1, r2, c1, c2: e.estimate_joint_simple_deprecated(
                 r1, r2)),
            ("mlDeprecated", "plain",
             lambda e, r1, r2, c1, c2: e.estimate_joint_ml_deprecated(
                 r1, r2)),
        ]
    return base


class _JointTrials:
    """Actor stage — the reference's trial loop (A3+A4): per trial, build
    power-of-2 sketches for three disjoint element universes A/B/X with ONE
    ``sketch_rows`` call each, compose every tuple's operand sketch by
    merging the binary expansion of its cardinality (``composeSketch``,
    ``joint_estimation_test.cpp:104-114`` — exercising merge correctness in
    the evaluation loop itself), and run every joint estimator VECTORIZED
    over all tuples at once."""

    def __init__(self, family, m, base, q, a, tuples, seed):
        self.sketch = _make_sketch(family, m, base, q, a)
        self.family = family
        if family == "minhash":
            self.estimators = {"plain": MinHashEstimator(m)}
        else:
            a_eff = (1.0 / m) if family == "ghll" else a
            rc = family == "ghll"
            self.estimators = {
                "plain": SetSketchEstimator(q, a_eff, base, m,
                                            card_range_correction=rc),
                "corr": SetSketchEstimator(q, a_eff, base, m,
                                           card_range_correction=rc,
                                           joint_range_correction=True),
            }
        self.tuples = tuples
        self.d1 = np.array([t[0] for t in tuples], dtype=np.int64)
        self.d2 = np.array([t[1] for t in tuples], dtype=np.int64)
        self.ix = np.array([t[2] for t in tuples], dtype=np.int64)
        self.seed = seed
        self.calls = _joint_estimator_calls(family)

    def _pow2_sketches(self, trial: int, universe: int, max_card: int):
        """Register rows for fresh disjoint sets of sizes 1, 2, 4, ...,
        2^floor(log2(max_card)) — one vectorized sketch_rows call."""
        if max_card < 1:
            return self.sketch.empty(0)
        kmax = int(max_card).bit_length() - 1
        counts = [1 << k for k in range(kmax + 1)]
        total = sum(counts)
        tag = (int(trial) * 8 + universe) * 0x9E3779B9 + self.seed
        vals = mix2(np.arange(total, dtype=np.uint64), tag)
        offs = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        return self.sketch.sketch_rows(vals, offs)

    def _compose(self, pows: np.ndarray, ns: np.ndarray) -> np.ndarray:
        """composeSketch for a whole vector of target cardinalities: row t
        is the merge of the power-of-2 sketches in ns[t]'s binary expansion."""
        out = self.sketch.empty(len(ns))
        for k in range(pows.shape[0]):
            mask = (ns >> k) & 1 == 1
            if mask.any():
                out[mask] = self.sketch.merge(out[mask], pows[k][None, :])
        return out

    def __call__(self, batch) -> pa.Table:
        trials = batch["id"].to_numpy()
        tables = []
        c1 = (self.d1 + self.ix).astype(np.float64)
        c2 = (self.d2 + self.ix).astype(np.float64)
        for t in trials:
            powsA = self._pow2_sketches(int(t), 1, int(self.d1.max()))
            powsB = self._pow2_sketches(int(t), 2, int(self.d2.max()))
            powsX = self._pow2_sketches(int(t), 3, int(self.ix.max()))
            s1 = self._compose(powsA, self.d1)
            s2 = self._compose(powsB, self.d2)
            sx = self._compose(powsX, self.ix)
            r1 = self.sketch.merge(s1, sx)
            r2 = self.sketch.merge(s2, sx)
            cols = {
                "trial": pa.array(np.full(len(self.d1), int(t)), pa.int64()),
                "d1": pa.array(self.d1, pa.int64()),
                "d2": pa.array(self.d2, pa.int64()),
                "inter": pa.array(self.ix, pa.int64()),
            }
            for label, kind, fn in self.calls:
                res = fn(self.estimators[kind], r1, r2, c1, c2)
                for qname, attr in _QUANTITIES:
                    cols[f"{label}{qname}"] = pa.array(
                        np.asarray(getattr(res, attr), dtype=np.float64),
                        pa.float64())
            lo, hi = self.estimators["plain"] \
                .estimate_jaccard_equal_registers(r1, r2)
            cols["collLowerBoundJaccard"] = pa.array(lo, pa.float64())
            cols["collUpperBoundJaccard"] = pa.array(hi, pa.float64())
            tables.append(pa.table(cols))
        return pa.concat_tables(tables)


def joint_error_pipeline(family: str = "ghll", m: int = 1024, base: float = 2.0,
                         q: int = 62, a: float = 20.0,
                         tuples=None,
                         union_cardinalities=(10_000, 1_000),
                         n_trials: int = 50, seed: int = 42,
                         parallelism: int = 16,
                         concurrency: int = 2) -> pa.Table:
    """Distributed analogue of ``gradle runJointTest``: the full reference
    grid shape (scaled by ``union_cardinalities``), composeSketch-built
    operands, and the reference's WIDE output — per tuple the 12 true
    quantities plus Mean and MSE of each estimator x quantity
    (``joint_estimation_test.cpp:225-339``) and the equal-register bound
    columns."""
    import ray.data as rd

    from ..functions.relational import grouped_aggregate
    from ..sketchlib.estimator import JointEstimationResult

    if tuples is None:
        tuples = joint_cardinality_tuples(union_cardinalities)
    tuples = [tuple(t) for t in tuples]
    trials = rd.range(n_trials, override_num_blocks=parallelism)
    est = trials.map_batches(
        _JointTrials, fn_constructor_args=(family, m, base, q, a,
                                           tuple(tuples), seed),
        batch_format="pyarrow", batch_size=4, concurrency=concurrency)

    labels = [lb for lb, _k, _fn in _joint_estimator_calls(family)]
    col_quantity = {f"{lb}{q}": q for lb in labels for q, _a in _QUANTITIES}
    col_quantity["collLowerBoundJaccard"] = "Jaccard"
    col_quantity["collUpperBoundJaccard"] = "Jaccard"
    value_cols = list(col_quantity)

    def add_sq_err(t: pa.Table) -> pa.Table:
        """Append per-row squared errors vs the tuple's true quantities."""
        d1 = t["d1"].to_numpy().astype(np.float64)
        d2 = t["d2"].to_numpy().astype(np.float64)
        ix = t["inter"].to_numpy().astype(np.float64)
        true = JointEstimationResult(d1, d2, ix)
        true_q = {q: np.asarray(getattr(true, attr), dtype=np.float64)
                  for q, attr in _QUANTITIES}
        cols = {c: t[c] for c in t.column_names}
        for c in value_cols:
            err = t[c].to_numpy() - true_q[col_quantity[c]]
            cols[f"__sq_{c}"] = pa.array(err * err, pa.float64())
        return pa.table(cols)

    est = est.map_batches(add_sq_err, batch_format="pyarrow")
    spec = {"n": ("count", None)}
    for c in value_cols:
        spec[f"{c}__mean"] = ("mean", c)
        spec[f"{c}__mse"] = ("mean", f"__sq_{c}")
    agg = grouped_aggregate(est, ["d1", "d2", "inter"], spec)

    # final layout: reference column names (trueX, <label>MeanX, <label>MSEX)
    d1 = agg["d1"].to_numpy().astype(np.float64)
    d2 = agg["d2"].to_numpy().astype(np.float64)
    ix = agg["inter"].to_numpy().astype(np.float64)
    true = JointEstimationResult(d1, d2, ix)
    out = {"n": agg["n"]}
    for qname, attr in _QUANTITIES:
        out[f"true{qname}"] = pa.array(
            np.asarray(getattr(true, attr), dtype=np.float64), pa.float64())
    for lb in labels:
        for qname, _a in _QUANTITIES:
            out[f"{lb}Mean{qname}"] = agg[f"{lb}{qname}__mean"]
        for qname, _a in _QUANTITIES:
            out[f"{lb}MSE{qname}"] = agg[f"{lb}{qname}__mse"]
    for c in ("collLowerBoundJaccard", "collUpperBoundJaccard"):
        side = c.replace("Jaccard", "")
        out[f"{side}MeanJaccard"] = agg[f"{c}__mean"]
        out[f"{side}MSEJaccard"] = agg[f"{c}__mse"]
    tbl = pa.table(out)
    return tbl.take(pa.compute.sort_indices(
        tbl, sort_keys=[("trueIntersection", "ascending"),
                        ("trueDifference1", "ascending")]))
