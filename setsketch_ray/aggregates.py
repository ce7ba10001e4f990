"""Dataset-level sketch aggregates: distributed sketch union + approx distinct.

Sketch ``merge`` is a textbook partial+final distributed aggregate
(SURVEY.md §2.5): every block folds its values into one local sketch
(``accumulate_block``), partials merge register-wise (``merge`` — max, or min
for MinHash; ``/root/reference/c++/sketch.hpp:817-825, 1599-1603``), and the
final state is estimated once (``finalize`` -> E1,
``sketch.hpp:320-338``).  State crossing tasks is m bytes, not the data.
"""

from __future__ import annotations

import numpy as np
from ray.data.aggregate import AggregateFn

from .sketchlib.estimator import SetSketchEstimator
from .sketchlib.hashing import mix64
from .sketchlib.sketches import GHLL


def _column_u64(block, column: str) -> np.ndarray:
    """Extract a column as uint64 hash values (hashes numerics by value)."""
    import pyarrow as pa

    if isinstance(block, pa.Table):
        arr = block[column].combine_chunks()
        np_vals = arr.to_numpy(zero_copy_only=False)
    else:  # pandas
        np_vals = block[column].to_numpy()
    if np_vals.dtype.kind in "iu":
        return mix64(np_vals.astype(np.uint64))
    if np_vals.dtype.kind == "f":
        return mix64(np_vals.view(np.uint64))
    from .sketchlib.hashing import hash_str_u64

    return hash_str_u64([str(v) for v in np_vals])


class SketchUnion(AggregateFn):
    """``ds.aggregate(SketchUnion("col"))`` / ``ds.groupby(k).aggregate(...)``
    -> merged register state (list) per group; use ``ApproxDistinct`` for the
    finalized cardinality."""

    def __init__(self, column: str, m: int = 4096, base: float = 2.0,
                 q: int = 62, name: str | None = None, finalize_estimate: bool = True):
        sketch = GHLL(m=m, base=base, q=q)
        estimator = SetSketchEstimator(q, 1.0 / m, base, m,
                                       card_range_correction=True)

        def init(_key):
            return np.zeros(m, dtype=sketch.dtype)

        def accumulate_block(state, block):
            vals = _column_u64(block, column)
            regs = state[None, :].copy()
            sketch.add_flat(regs, np.zeros(len(vals), dtype=np.int64), vals)
            return regs[0]

        def merge(a, b):
            return np.maximum(a, b)

        def finalize(state):
            if finalize_estimate:
                return float(estimator.estimate_cardinality_simple(
                    state[None, :])[0])
            return state.tolist()

        super().__init__(init=init, merge=merge,
                         accumulate_block=accumulate_block,
                         finalize=finalize,
                         name=name or f"approx_distinct({column})")


def approx_distinct(ds, column: str, m: int = 4096, base: float = 2.0,
                    q: int = 62) -> float:
    """Approximate COUNT(DISTINCT column) via a distributed GHLL union.

    Deterministic (counter-mode hashing): the same input always yields the
    same estimate.  Expected relative error ~= 1.04/sqrt(m) (BASELINE.md:
    RSD = sqrt(((b+1)/(b-1) ln b - 1)/m)).
    """
    res = ds.aggregate(SketchUnion(column, m=m, base=base, q=q))
    if isinstance(res, dict):
        return res[f"approx_distinct({column})"]
    return float(res)
