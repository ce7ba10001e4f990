"""Distributed positional inverted index + phrase search.

The search-engine counterpart of the ANN family: ``build_inverted_index``
writes a hive-bucketed positional posting layout (``bucket=N`` parquet
directories keyed by token hash, rows ``(token, doc_id, pos)`` sorted so
parquet row-group stats prune by token inside a bucket), and
``phrase_search`` answers an n-token phrase by reading ONLY the phrase
tokens' buckets and intersecting postings positionally (normalize
``pos - term_idx``; a doc matches where every term of the phrase lands on
one normalized position).  Nothing ever scans the corpus at query time,
and the intersection is a slim ``(term_idx, doc_id, pos)`` co-partition —
the classic web-index shape expressed as Ray Data primitives.

Split contract: tokens are the single-space word split (matching SQL
``string_split(text, ' ')`` — the corpus contract used by the other text
operators); empty tokens dropped.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketchlib.hashing import hash_str_u64


def _token_bucket(tokens, num_buckets: int) -> np.ndarray:
    arr = tokens if isinstance(tokens, pa.Array) else pa.array(tokens)
    return (hash_str_u64(arr) % np.uint64(num_buckets)).astype(np.int64)


def build_inverted_index(ds, id_col: str, text_col: str, out_dir: str,
                         num_buckets: int = 32) -> list:
    """Build the positional index: one ``(token, doc_id, pos)`` explode
    pass (vectorized split, no Python token loops), hash-partition by
    TOKEN so each token's postings land in exactly one bucket, one writer
    task per bucket (hive ``bucket=N/`` parquet, sorted by
    (token, doc_id, pos)).  Returns the bucket manifest."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    def explode(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) \
            else txt
        toks = pc.split_pattern(pc.fill_null(txt, ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        sizes = np.diff(offs)
        row_of = np.repeat(np.arange(t.num_rows), sizes)
        # positions are 1-based WITHIN the original split (empties keep
        # their slot so positions match SQL range(1, len+1))
        pos = np.arange(len(flat), dtype=np.int64) - \
            np.repeat(offs[:-1], sizes) + 1
        ne = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        flat, row_of, pos = flat.filter(pa.array(ne)), row_of[ne], pos[ne]
        ids = t[id_col].take(pa.array(row_of))
        return pa.table({
            "token": flat,
            "doc_id": ids,
            "pos": pa.array(pos, pa.int64()),
            "__b": pa.array(_token_bucket(flat, num_buckets), pa.int64())})

    def write_bucket(t: pa.Table) -> pa.Table:
        b = int(t["__b"][0].as_py())
        t = t.drop_columns(["__b"])
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("token", "ascending"), ("doc_id", "ascending"),
            ("pos", "ascending")]))
        d = os.path.join(out_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "postings.parquet")
        tmp = path + ".tmp"
        pq.write_table(t.combine_chunks(), tmp, row_group_size=65536)
        os.replace(tmp, path)
        return pa.table({"bucket": pa.array([b], pa.int64()),
                         "n_postings": pa.array([t.num_rows], pa.int64())})

    manifest = ds.select_columns([id_col, text_col]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("__b").map_groups(write_bucket, batch_format="pyarrow")
    rows = sorted(manifest.take_all(), key=lambda r: r["bucket"])
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as fh:
        fh.write(f"{num_buckets}\n")
    return rows


def phrase_search(index_dir: str, phrase: str, num_buckets: int = 32,
                  num_partitions: int = 16):
    """Exact phrase match over the positional index: reads ONLY the
    phrase tokens' bucket files (with a parquet ``token ==`` filter, so
    row-group stats prune inside the bucket), then one doc-hash
    co-partition intersects postings positionally.  Returns a Dataset of
    matching ``doc_id`` (distinct)."""
    import ray.data as rd

    terms = [w for w in phrase.split(" ") if w]
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    k = len(terms)

    parts = []
    for ti, term in enumerate(terms):
        b = int(_token_bucket([term], num_buckets)[0])
        files = sorted(glob.glob(
            os.path.join(index_dir, f"bucket={b}", "*.parquet")))
        if not files:
            return rd.from_arrow(pa.table({"doc_id": pa.array([],
                                                              pa.int64())}))
        import pyarrow.dataset as pads

        sub = rd.read_parquet(files, columns=["token", "doc_id", "pos"],
                              filter=pads.field("token") == term)

        def tag(t: pa.Table, _ti=ti) -> pa.Table:
            # normalized position: a phrase occurrence puts every term on
            # the same (doc_id, pos - term_idx) point
            p = t["pos"].to_numpy(zero_copy_only=False) - _ti
            return pa.table({
                "doc_id": t["doc_id"],
                "npos": pa.array(p, pa.int64()),
                "ti": pa.array(np.full(t.num_rows, _ti, np.int64),
                               pa.int64())})

        parts.append(sub.map_batches(tag, batch_format="pyarrow"))

    all_postings = parts[0]
    for p in parts[1:]:
        all_postings = all_postings.union(p)

    def add_part(t: pa.Table) -> pa.Table:
        h = (t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.uint32), pa.uint32()))

    def intersect(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        p = t["npos"].to_numpy(zero_copy_only=False)
        ti = t["ti"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, p, d))
        d, p, ti = d[order], p[order], ti[order]
        # dedup (doc, npos, ti) then count distinct terms per (doc, npos)
        keep = np.ones(len(d), bool)
        keep[1:] = (d[1:] != d[:-1]) | (p[1:] != p[:-1]) | (ti[1:] != ti[:-1])
        d, p = d[keep], p[keep]
        new = np.ones(len(d), bool)
        new[1:] = (d[1:] != d[:-1]) | (p[1:] != p[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(d)))
        hit_docs = np.unique(d[starts[counts == k]])
        return pa.table({"doc_id": pa.array(hit_docs, pa.int64())})

    return all_postings.map_batches(add_part, batch_format="pyarrow") \
        .groupby("__part").map_groups(intersect, batch_format="pyarrow")


# ------------------------------------------------------------- BM25 retrieval
def bm25_topk(ds, id_col: str, text_col: str, terms: list,
              k: int = 20, k1: float = 1.2, b: float = 0.75):
    """BM25 top-k retrieval (Lucene variant: idf = ln(1 + (N-df+0.5)/(df+0.5)),
    always positive) — the ranked-retrieval counterpart of ``phrase_search``.

    Distributed shape (the 100 TB contract):
    1. ONE tokenize pass emits a slim per-doc row ``(id, dl, tf_0..tf_m)``
       (8 + 8*(m+1) bytes/doc — the text never leaves the map stage).  The
       slim table is materialized once and consumed twice.
    2. Global stats (N, sum_dl, df per term) come from 1-row-per-block
       partials folded on the driver — no shuffle.
    3. Scoring is a broadcast-scalar map over the slim table; per-block
       top-k keeps only ``k`` rows per block, the driver merges k*blocks
       rows.  Nothing global ever sorts.

    Float contract (oracle parity): idf via ``math.log`` (glibc, same libm
    DuckDB's ``ln`` calls), all constants materialized as the same double
    literals on both sides, per-term contributions added in fixed term
    order, final score fixed-pointed as ``floor(score*1e6 + 0.5)``.  A
    zero tf contributes exactly ``0.0`` (no branch needed: the denominator
    is strictly positive).

    Returns a pa.Table ``(id_col, dl, score_c)`` of the k highest-scoring
    docs among those containing >= 1 query term (ties broken by id).
    """
    import math

    m = len(terms)
    if m == 0:
        raise ValueError("bm25_topk: empty term list")
    k1 = np.float64(k1)
    b = np.float64(b)

    tf_names = [f"__tf{j}" for j in range(m)]

    def per_doc(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) \
            else txt
        toks = pc.split_pattern(pc.fill_null(txt, ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        sizes = np.diff(offs)
        row_of = np.repeat(np.arange(t.num_rows), sizes)
        ne = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        flat, row_of = flat.filter(pa.array(ne)), row_of[ne]
        dl = np.bincount(row_of, minlength=t.num_rows).astype(np.int64)
        cols = {id_col: t[id_col],
                "dl": pa.array(dl, pa.int64())}
        for j, term in enumerate(terms):
            mask = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(row_of[mask],
                             minlength=t.num_rows).astype(np.int64)
            cols[tf_names[j]] = pa.array(tf, pa.int64())
        return pa.table(cols)

    def partial(t: pa.Table) -> pa.Table:
        cols = {"n": pa.array([t.num_rows], pa.int64()),
                "sum_dl": pa.array(
                    [int(np.sum(t["dl"].to_numpy(zero_copy_only=False)))],
                    pa.int64())}
        for j in range(m):
            tf = t[tf_names[j]].to_numpy(zero_copy_only=False)
            cols[f"df{j}"] = pa.array([int(np.count_nonzero(tf))], pa.int64())
        return pa.table(cols)

    slim = ds.map_batches(per_doc, batch_format="pyarrow").materialize()
    parts = pa.concat_tables(list(
        slim.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))
    n_docs = int(np.sum(parts["n"].to_numpy(zero_copy_only=False)))
    sum_dl = int(np.sum(parts["sum_dl"].to_numpy(zero_copy_only=False)))
    dfs = [int(np.sum(parts[f"df{j}"].to_numpy(zero_copy_only=False)))
           for j in range(m)]
    if n_docs == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "dl": pa.array([], pa.int64()),
                         "score_c": pa.array([], pa.int64())})
    avgdl = np.float64(float(sum_dl) / float(n_docs))
    idfs = [np.float64(math.log(
        1.0 + (float(n_docs - df) + 0.5) / (float(df) + 0.5)))
        for df in dfs]

    def score_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64()),
                             "score_c": pa.array([], pa.int64())})
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        # denominator factor: (1 - b) + b * (dl / avgdl), matching the SQL
        # parse of "1 - b + b * (dl / avgdl)" term for term
        norm = (np.float64(1.0) - b) + b * (dl / avgdl)
        score = np.zeros(t.num_rows, np.float64)
        any_tf = np.zeros(t.num_rows, bool)
        for j in range(m):
            tf = t[tf_names[j]].to_numpy(zero_copy_only=False)
            any_tf |= tf > 0
            tff = tf.astype(np.float64)
            score = score + (idfs[j] * (tff * (k1 + 1))) / (tff + k1 * norm)
        score_c = np.floor(score * 1e6 + 0.5).astype(np.int64)
        out = pa.table({id_col: t[id_col],
                        "dl": t["dl"],
                        "score_c": pa.array(score_c, pa.int64())})
        out = out.filter(pa.array(any_tf))
        out = out.take(pc.sort_indices(out, sort_keys=[
            ("score_c", "descending"), (id_col, "ascending")]))
        return out.slice(0, k)

    top = pa.concat_tables(list(
        slim.map_batches(score_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))
    if top.num_rows == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "dl": pa.array([], pa.int64()),
                         "score_c": pa.array([], pa.int64())})
    top = top.take(pc.sort_indices(top, sort_keys=[
        ("score_c", "descending"), (id_col, "ascending")]))
    return top.slice(0, k).combine_chunks()


def rrf_fuse(rankings: list, id_col: str = "doc_id", rank_col: str = "r",
             k: int = 20, k_rrf: int = 60, scale: int = 10 ** 9):
    """Reciprocal-rank fusion (Cormack et al. 2009 — the hybrid-search
    combiner): fused(d) = sum_i 1/(k_rrf + rank_i(d)) over the input
    ranking tables, a document absent from a list contributing exactly
    0.0.  The inputs are top-k tables (driver-small by construction —
    the DISTRIBUTED work is producing them); fusion itself is k-sized.

    Float contract: per-list terms are one IEEE division each, added in
    FIXED list order (0.0 + x == x exactly, so absence never perturbs
    bits), then fixed-pointed as floor(s*scale + 0.5) — the oracle
    mirrors the same tree via FULL OUTER JOIN + CASE 0 terms.

    Returns a pa.Table (id_col, rrf_c) of the k highest-fused docs,
    ties by id.
    """
    terms = {}
    for li, tbl in enumerate(rankings):
        ids = tbl[id_col].to_pylist()
        rs = tbl[rank_col].to_pylist()
        for did, r in zip(ids, rs):
            if did not in terms:
                terms[did] = [0.0] * len(rankings)
            terms[did][li] = 1.0 / float(k_rrf + int(r))
    rows = []
    for did, ts in terms.items():
        s = 0.0
        for t in ts:           # fixed list order
            s = s + t
        rows.append((did, int(np.floor(s * scale + 0.5))))
    rows.sort(key=lambda x: (-x[1], x[0]))
    rows = rows[:k]
    return pa.table({
        id_col: pa.array([r[0] for r in rows], pa.int64()),
        "rrf_c": pa.array([r[1] for r in rows], pa.int64())})
