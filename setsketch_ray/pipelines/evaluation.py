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


class _JointTrials:
    """Actor stage: per (tuple, trial) build A = D1 ∪ X, B = D2 ∪ X from
    disjoint hashed universes and run the joint estimators."""

    def __init__(self, family, m, base, q, a, tuples, seed):
        self.sketch = _make_sketch(family, m, base, q, a)
        self.family = family
        if family == "minhash":
            self.estimator = MinHashEstimator(m)
        else:
            self.estimator = SetSketchEstimator(
                q, (1.0 / m) if family == "ghll" else a, base, m,
                card_range_correction=(family == "ghll"),
                joint_range_correction=(family == "ghll"))
        self.tuples = tuples
        self.seed = seed

    def __call__(self, batch) -> pa.Table:
        trials = batch["id"].to_numpy()
        out = {k: [] for k in ("trial", "d1", "d2", "inter", "true_jaccard",
                               "jaccard_new", "jaccard_incl_excl",
                               "cosine_new", "intersection_new")}
        for t in trials:
            for ti, (d1, d2, inter) in enumerate(self.tuples):
                tag = (int(t) * 1000 + ti) * 16 + self.seed
                u1 = mix2(np.arange(d1, dtype=np.uint64), tag * 4 + 1)
                u2 = mix2(np.arange(d2, dtype=np.uint64), tag * 4 + 2)
                ux = mix2(np.arange(inter, dtype=np.uint64), tag * 4 + 3)
                av = np.concatenate([u1, ux])
                bv = np.concatenate([u2, ux])
                ra = self.sketch.sketch_rows(av, np.array([0, len(av)]))
                rb = self.sketch.sketch_rows(bv, np.array([0, len(bv)]))
                if self.family == "minhash":
                    new = self.estimator.estimate_joint_new(ra, rb)
                    ie = self.estimator.estimate_joint_incl_excl(ra, rb)
                else:
                    new = self.estimator.estimate_joint_new(ra, rb)
                    ie = self.estimator.estimate_joint_incl_excl(ra, rb)
                out["trial"].append(int(t))
                out["d1"].append(d1)
                out["d2"].append(d2)
                out["inter"].append(inter)
                out["true_jaccard"].append(inter / (d1 + d2 + inter))
                out["jaccard_new"].append(float(new.jaccard[0]))
                out["jaccard_incl_excl"].append(float(ie.jaccard[0]))
                out["cosine_new"].append(float(new.cosine[0]))
                out["intersection_new"].append(float(new.intersection[0]))
        return pa.table({k: pa.array(v) for k, v in out.items()})


def joint_error_pipeline(family: str = "ghll", m: int = 1024, base: float = 2.0,
                         q: int = 62, a: float = 20.0,
                         tuples=((500, 500, 1000), (900, 900, 200),
                                 (2000, 2000, 1000)),
                         n_trials: int = 50, seed: int = 42,
                         parallelism: int = 16) -> pa.Table:
    """Distributed analogue of ``gradle runJointTest`` at reduced scale:
    per-tuple bias/RMSE of the paper's joint estimators."""
    import ray.data as rd

    trials = rd.range(n_trials, override_num_blocks=parallelism)
    est = trials.map_batches(
        _JointTrials, fn_constructor_args=(family, m, base, q, a,
                                           tuple(tuples), seed),
        batch_format="pyarrow", batch_size=4, concurrency=2)

    def add_err(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {c: t[c] for c in t.column_names}
        cols["err_new"] = pc.subtract(t["jaccard_new"], t["true_jaccard"])
        cols["err_ie"] = pc.subtract(t["jaccard_incl_excl"], t["true_jaccard"])
        cols["err_new2"] = pc.power(cols["err_new"], pa.scalar(2.0))
        cols["err_ie2"] = pc.power(cols["err_ie"], pa.scalar(2.0))
        return pa.table(cols)

    from ..functions.relational import grouped_aggregate

    est = est.map_batches(add_err, batch_format="pyarrow")
    agg = grouped_aggregate(est, ["inter"], {
        "n": ("count", None),
        "true_jaccard": ("mean", "true_jaccard"),
        "bias_new": ("mean", "err_new"),
        "mse_new": ("mean", "err_new2"),
        "bias_incl_excl": ("mean", "err_ie"),
        "mse_incl_excl": ("mean", "err_ie2"),
    })
    import pyarrow.compute as pc

    cols = {c: agg[c] for c in agg.column_names}
    cols["rmse_new"] = pc.sqrt(agg["mse_new"])
    cols["rmse_incl_excl"] = pc.sqrt(agg["mse_incl_excl"])
    return pa.table(cols)
