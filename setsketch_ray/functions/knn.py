"""Similarity search over embedding columns (``list<float>``).

* :func:`knn_bruteforce` — exact cosine top-k: the query matrix is broadcast
  (``ray.put`` once, read per actor), each batch computes a vectorized
  matmul, emits its local top-k, and a final sort+limit over the tiny
  partials yields the global answer.  Baseline path.
* :func:`knn_lsh` — random-hyperplane (SimHash) bucketing: candidates only
  from matching buckets — the 100 TB path where a full scan per query is
  off the table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketchlib.hashing import mix2


def _embedding_matrix(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = np.asarray(arr.offsets, dtype=np.int64)
    values = np.asarray(arr.values, dtype=np.float32)
    if offsets[0] != 0:
        values = values[offsets[0]:offsets[-1]]
        offsets = offsets - offsets[0]
    dim = offsets[1] - offsets[0]
    return values.reshape(len(arr), dim).astype(np.float64)


class _ScoreBatch:
    """Append cosine similarity to a broadcast query vector; keep local top-k."""

    def __init__(self, qvec_ref, k: int, exclude_id, id_col: str):
        import ray

        self.q = ray.get(qvec_ref) if not isinstance(qvec_ref, np.ndarray) \
            else qvec_ref
        self.qn = self.q / np.linalg.norm(self.q)
        self.k = k
        self.exclude_id = exclude_id
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _embedding_matrix(batch["embedding"])
        norms = np.linalg.norm(emb, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = (emb @ self.qn) / norms
        cos = np.nan_to_num(cos, nan=-1.0)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        mask = ids != self.exclude_id
        cos, ids = cos[mask], ids[mask]
        if len(ids) > self.k:
            top = np.argpartition(-cos, self.k)[:self.k]
            cos, ids = cos[top], ids[top]
        return pa.table({self.id_col: pa.array(ids),
                         "cosine": pa.array(cos, pa.float64())})


def knn_bruteforce(ds, query_vec_id: int, k: int = 10, id_col: str = "vec_id"):
    """Exact top-k cosine neighbors of a row of the dataset itself.

    Returns (vec_id, rank) — ranks 1..k, ties broken by vec_id (deterministic,
    oracle-friendly: float scores stay internal).
    """
    import ray

    qrow = ds.filter(expr=f"{id_col} == {query_vec_id}").take(1)
    if not qrow:
        raise ValueError(f"query id {query_vec_id} not found")
    qvec = np.asarray(qrow[0]["embedding"], dtype=np.float64)
    qref = ray.put(qvec)
    scored = ds.map_batches(
        _ScoreBatch, fn_constructor_args=(qref, k, query_vec_id, id_col),
        batch_format="pyarrow", batch_size=8192, concurrency=2)
    top = scored.sort(["cosine", id_col], descending=[True, False]).limit(k)
    t = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    return pa.table({
        id_col: t[id_col],
        "rank": pa.array(np.arange(1, t.num_rows + 1), pa.int64()),
    })


class _HyperplaneBucket:
    """SimHash bucketing stage: ``bucket = sign-bits of R @ v`` (R broadcast,
    built once per actor from a seed)."""

    def __init__(self, dim: int, n_bits: int = 16, seed: int = 7):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.standard_normal((n_bits, dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _embedding_matrix(batch["embedding"])
        proj = emb @ self.planes.T
        bits = (proj > 0).astype(np.uint64)
        bucket = np.zeros(len(emb), dtype=np.uint64)
        for b in range(bits.shape[1]):
            bucket |= bits[:, b] << np.uint64(b)
        return batch.append_column("bucket", pa.array(bucket, pa.uint64()))


def embedding_buckets(ds, dim: int, n_bits: int = 16, seed: int = 7):
    """Scale path for ANN: bucket rows by random-hyperplane SimHash; queries
    probe only their own (and near-by, via multi-probe) buckets."""
    return ds.map_batches(_HyperplaneBucket,
                          fn_constructor_args=(dim, n_bits, seed),
                          batch_format="pyarrow", concurrency=2)
