"""Shingling stages: caption word n-grams + phash-derived visual shingles.

The reference sketches sets of ``uint64`` elements (``sketch.hpp:1040`` etc.);
the engine's sets are per-row shingle sets: word 3-grams of the normalized
caption plus byte-window shingles of the 64-bit perceptual hash
(BASELINE.json north_star: "MinHash signatures from caption shingles and
phash-derived visual shingles").

Stateless ``map_batches`` transforms; Arrow in / Arrow out.  Token hashing is
the only per-token Python work (FNV over UTF-8); n-gram combination and
phash shingles are vectorized with counter-mode mixing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketchlib.hashing import hash_str_u64, mix2

# namespace tags so caption / visual shingles never collide
_TAG_WORD1 = 11
_TAG_WORD3 = 13
_TAG_PHASH = 17

# function words carry no dedup signal but dominate LSH bucket collisions on
# short template-y captions (hot-shingle skew); dropped before shingling by
# default.  At 100 TB the list is augmented by a corpus document-frequency
# pass (top-K hot shingles -> broadcast blocklist).
STOPWORDS = frozenset(
    "a an and are as at be by for from has he her his i in is it its my of on "
    "or our she that the their they this to was we were will with you your "
    "near under over above below between into onto upon about after before "
    "during while than then there here not no so if but".split())
_STOP_ARR = pa.array(sorted(STOPWORDS), pa.string())


def _token_lists(captions: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """lowercase -> strip non-alnum -> whitespace split."""
    arr = captions.combine_chunks() if isinstance(captions, pa.ChunkedArray) else captions
    lowered = pc.utf8_lower(arr)
    cleaned = pc.replace_substring_regex(lowered, r"[^a-z0-9]+", " ")
    trimmed = pc.utf8_trim_whitespace(cleaned)
    tokens = pc.split_pattern(trimmed, " ")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    return tokens


def caption_shingles(captions, ngrams: tuple = (1, 2),
                     drop_stopwords: bool = True):
    """-> (flat uint64 shingle values, int64 offsets per row).

    Word n-gram shingles of the normalized caption for every n in ``ngrams``,
    over the stopword-filtered token sequence.  Captions are short documents,
    so unigrams+bigrams (default) keep high overlap under a one-word
    paraphrase — coarser shingles would not.
    """
    tokens = _token_lists(captions)
    flat_tokens = tokens.flatten()
    tok_offsets = np.asarray(tokens.offsets, dtype=np.int64)
    n_rows = len(tok_offsets) - 1
    sizes0 = np.diff(tok_offsets)

    if drop_stopwords and len(flat_tokens):
        # vectorized membership test (C++ hash set) instead of per-token
        # Python `in`
        keep_tok = pc.invert(pc.is_in(flat_tokens, value_set=_STOP_ARR)) \
            .to_numpy(zero_copy_only=False)
        row_of0 = np.repeat(np.arange(n_rows), sizes0)
        flat_kept = flat_tokens.filter(pa.array(keep_tok))
        row_of_kept = row_of0[keep_tok]
        sizes = np.bincount(row_of_kept, minlength=n_rows).astype(np.int64)
        tok_offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(sizes, out=tok_offsets[1:])
    else:
        flat_kept = flat_tokens
        sizes = sizes0

    # hash each UNIQUE token once (the FNV kernel is per-byte Python), then
    # gather by dictionary code — bit-identical, ~#occurrences/#uniques faster
    if len(flat_kept):
        enc = pc.dictionary_encode(flat_kept)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq_hash = hash_str_u64(enc.dictionary)
        tok_hashes = uniq_hash[enc.indices.to_numpy(zero_copy_only=False)]
    else:
        tok_hashes = np.empty(0, dtype=np.uint64)

    sel_rows_parts, sel_vals_parts = [], []
    if len(tok_hashes):
        row_of = np.repeat(np.arange(n_rows), sizes)
        pos = np.arange(len(tok_hashes)) - tok_offsets[:-1][row_of]
        for ngram in ngrams:
            grams = tok_hashes.copy()
            for j in range(1, ngram):
                shifted = np.empty_like(tok_hashes)
                shifted[:-j] = tok_hashes[j:]
                if j:
                    shifted[-j:] = 0
                grams = mix2(grams, shifted)
            grams = mix2(grams, _TAG_WORD3 + ngram)
            keep = pos + ngram <= sizes[row_of]
            sel_rows_parts.append(row_of[keep])
            sel_vals_parts.append(grams[keep])

    if sel_rows_parts:
        sel_rows = np.concatenate(sel_rows_parts)
        sel_vals = np.concatenate(sel_vals_parts)
        # per-row sorted unique: shingle columns are SETS (repeated words must
        # not double-count in exact-Jaccard verification)
        order = np.lexsort((sel_vals, sel_rows))
        sel_rows = sel_rows[order]
        sel_vals = sel_vals[order]
        keep = np.empty(len(sel_rows), dtype=bool)
        keep[0] = True
        keep[1:] = (sel_rows[1:] != sel_rows[:-1]) | (sel_vals[1:] != sel_vals[:-1])
        sel_rows = sel_rows[keep]
        out_vals = sel_vals[keep]
        out_sizes = np.bincount(sel_rows, minlength=n_rows).astype(np.int64)
    else:
        out_vals = np.empty(0, dtype=np.uint64)
        out_sizes = np.zeros(n_rows, dtype=np.int64)

    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(out_sizes, out=offsets[1:])
    return out_vals, offsets


def phash_shingles(phash_int64) -> np.ndarray:
    """-> (rows, 15) uint64 visual shingles from the 64-bit phash: the 8
    single bytes + 7 overlapping 2-byte windows, each position-tagged.
    Near-dup images differ in a few phash bits, so most byte windows agree."""
    ph = np.asarray(phash_int64, dtype=np.int64).astype(np.uint64)
    n = len(ph)
    shingles = np.empty((n, 15), dtype=np.uint64)
    bytes_ = np.empty((n, 8), dtype=np.uint64)
    for i in range(8):
        bytes_[:, i] = (ph >> np.uint64(8 * i)) & np.uint64(0xFF)
    for i in range(8):
        shingles[:, i] = mix2(bytes_[:, i] | np.uint64(i << 16), _TAG_PHASH)
    for i in range(7):
        w = bytes_[:, i] | (bytes_[:, i + 1] << np.uint64(8)) | np.uint64((8 + i) << 20)
        shingles[:, 8 + i] = mix2(w, _TAG_PHASH)
    return shingles


def combined_shingles(captions, phash_int64, ngrams: tuple = (1, 2),
                      use_phash: bool = True):
    """Caption n-gram shingles ∪ visual shingles -> (values, offsets).

    Used for the SetSketch register sketch (one set per image spanning both
    modalities) and for ``approx_distinct`` style aggregates.
    """
    cap_vals, cap_off = caption_shingles(captions, ngrams)
    if not use_phash:
        return cap_vals, cap_off
    vis = phash_shingles(phash_int64)
    n_rows = vis.shape[0]
    sizes = np.diff(cap_off) + vis.shape[1]
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    out = np.empty(offsets[-1], dtype=np.uint64)
    for i in range(n_rows):
        lo = offsets[i]
        cl = cap_off[i + 1] - cap_off[i]
        out[lo:lo + cl] = cap_vals[cap_off[i]:cap_off[i + 1]]
        out[lo + cl:offsets[i + 1]] = vis[i]
    return out, offsets


def hot_shingle_blocklist(ds, cfg_modalities, caption_col: str = "caption",
                          phash_col: str = "phash", ngrams: tuple = (1, 2),
                          min_doc_fraction: float = 0.02,
                          top_k: int = 4096) -> frozenset:
    """Document-frequency pass: shingles appearing in more than
    ``min_doc_fraction`` of documents (capped at ``top_k``) — the corpus-
    specific complement to the static stopword list.  Hot shingles carry no
    dedup signal but cause LSH bucket skew.

    Implementation: per-batch (shingle, 1) partials deduped per row ->
    pyarrow partial counts -> driver combine (the candidate set is bounded
    by per-batch uniques).  Broadcast the result and pass as ``blocklist``
    to :class:`ShingleStage`.
    """
    import pyarrow.compute as pc

    stage = ShingleStage(caption_col=caption_col, phash_col=phash_col,
                         ngrams=ngrams)

    def partial(t: pa.Table) -> pa.Table:
        sh = stage(t)
        us, cs = [], []
        for mod_col in ("shingles_cap", "shingles_vis"):
            if mod_col not in sh.column_names:
                continue
            arr = sh[mod_col].combine_chunks()
            flat = np.asarray(arr.values, dtype=np.uint64)
            u, c = np.unique(flat, return_counts=True)
            us.append(u)
            cs.append(c)
        if not us:
            return pa.table({"shingle": pa.array([], pa.uint64()),
                             "df": pa.array([], pa.int64())})
        u = np.concatenate(us)
        c = np.concatenate(cs)
        order = np.argsort(-c, kind="stable")[:top_k * 4]
        return pa.table({
            "shingle": pa.array(u[order], pa.uint64()),
            "df": pa.array(c[order], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    batches = list(parts.iter_batches(batch_format="pyarrow",
                                      batch_size=1 << 20))
    n_docs = ds.count()
    if n_docs == 0 or not batches:
        return frozenset()
    # vectorized combine (one Arrow group_by) instead of a Python dict loop
    agg = pa.concat_tables(batches).group_by("shingle") \
        .aggregate([("df", "sum")])
    sh_v = agg["shingle"].to_numpy(zero_copy_only=False)
    df_v = agg["df_sum"].to_numpy(zero_copy_only=False)
    thr = max(2, int(min_doc_fraction * n_docs))
    hot_mask = df_v >= thr
    sh_v, df_v = sh_v[hot_mask], df_v[hot_mask]
    order = np.argsort(-df_v, kind="stable")[:top_k]
    return frozenset(int(x) for x in sh_v[order])


def content_keys(vals: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Order-independent 64-bit content key per row-set (XOR-aggregate of the
    mixed shingle values + cardinality mix): identical sets -> identical key;
    used by the exact-duplicate pre-collapse."""
    mixed = mix2(vals, 40499)
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.uint64)
    sizes = np.diff(offsets)
    nonempty = sizes > 0
    if len(mixed) and nonempty.any():
        # reduceat only over nonempty rows' offsets: clipping a trailing
        # empty row's offset (== len) down would truncate the preceding
        # row's xor segment, making keys batch-layout-dependent
        out[nonempty] = np.bitwise_xor.reduceat(mixed, offsets[:-1][nonempty])
    return mix2(out, sizes.astype(np.uint64))


def _list_array(vals: np.ndarray, offsets: np.ndarray) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()) if offsets[-1] < 2**31
        else pa.array(offsets, pa.int64()),
        pa.array(vals, pa.uint64()))


class ShingleStage:
    """``map_batches`` callable adding per-modality shingle list columns:
    ``shingles_cap`` (caption n-grams) and ``shingles_vis`` (phash windows).

    Near-duplicates can differ in exactly one modality (re-encoded image with
    identical caption; paraphrased caption on identical pixels), so LSH runs
    per modality and candidates are unioned — one combined set would dilute
    the Jaccard of single-modality dups below LSH reach.
    """

    def __init__(self, caption_col: str = "caption", phash_col: str = "phash",
                 ngrams: tuple = (1, 2), use_phash: bool = True,
                 drop_stopwords: bool = True, blocklist: frozenset | None = None):
        self.caption_col = caption_col
        self.phash_col = phash_col
        self.ngrams = ngrams
        self.use_phash = use_phash
        self.drop_stopwords = drop_stopwords
        # corpus-specific hot shingles (document-frequency pass,
        # :func:`hot_shingle_blocklist`) dropped from BOTH modalities
        self.blocklist = np.fromiter(blocklist, dtype=np.uint64) \
            if blocklist else None
        if self.blocklist is not None:
            self.blocklist.sort()

    def _filter_hot(self, vals: np.ndarray, offsets: np.ndarray):
        if self.blocklist is None or len(vals) == 0:
            return vals, offsets
        pos = np.searchsorted(self.blocklist, vals)
        pos = np.minimum(pos, len(self.blocklist) - 1)
        keep = self.blocklist[pos] != vals
        n = len(offsets) - 1
        row_of = np.repeat(np.arange(n), np.diff(offsets))
        sizes = np.bincount(row_of[keep], minlength=n)
        new_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=new_off[1:])
        return vals[keep], new_off

    def __call__(self, batch: pa.Table) -> pa.Table:
        cap_vals, cap_off = caption_shingles(batch[self.caption_col], self.ngrams,
                                             self.drop_stopwords)
        cap_vals, cap_off = self._filter_hot(cap_vals, cap_off)
        out = batch.append_column("shingles_cap", _list_array(cap_vals, cap_off))
        if self.use_phash and self.phash_col in batch.column_names:
            vis = phash_shingles(batch[self.phash_col])
            n, k = vis.shape
            vis_off = np.arange(0, (n + 1) * k, k, dtype=np.int64)
            vis_vals, vis_off = self._filter_hot(vis.reshape(-1), vis_off)
            out = out.append_column("shingles_vis",
                                    _list_array(vis_vals, vis_off))
        return out
