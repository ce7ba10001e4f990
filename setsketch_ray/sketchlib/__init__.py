"""Pure-NumPy numeric core: hashing kernels, sketch families, estimators.

No Ray dependencies — everything here is per-batch math used inside
``map_batches`` stages (see :mod:`setsketch_ray.stages`).
"""

from .estimator import (  # noqa: F401
    JointEstimationResult,
    MinHashEstimator,
    SetSketchEstimator,
)
from .hashing import (  # noqa: F401
    FeistelPermutation,
    bounded_uint,
    exponential,
    hash_str_u64,
    mix2,
    mix64,
    truncated_exponential,
    uniform_double,
)
from .sketches import (  # noqa: F401
    GHLL,
    HLL,
    HyperMinHash,
    MinHash,
    SetSketch1,
    SetSketch2,
    make_sketch,
)
