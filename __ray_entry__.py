"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

``entry()``      — flagship near-dup pipeline on /root/testdata/sf0.001.
``queries()``    — one callable per implemented operator/pipeline
                   (SURVEY.md §2); each takes ``sf_dir``.
``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible queries;
                   approximate/sketch/LSH ops are rows-only checked.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa


_READ_SCHEMA_CACHE: dict = {}


def _read(sf_dir: str, table: str, columns=None, predicate=None):
    """Column-pruned parquet read.  Block count defaults to the session's CPU
    count: Ray's auto-split makes ~tiny blocks at test scale and per-task
    overhead dominates (at 100 TB the file/row-group layout governs instead).

    ``predicate``: optional ``pyarrow.dataset`` expression pushed into the
    fragment scan (``read_parquet(filter=...)``) — row groups whose column
    statistics exclude the predicate are skipped entirely and surviving
    pages filter before block materialization.  At 100 TB this is the
    difference between scanning a table and scanning the ~selectivity
    fraction of it; the local testdata is a single row group, so here it
    only exercises the code path (verified value-identical to the post-read
    filter on every migrated query)."""
    import os

    import ray
    import ray.data as rd

    nb = int(os.environ.get("RAY_GRAFT_BLOCKS", "0")) or \
        max(4, int(ray.cluster_resources().get("CPU", 8)))
    # The driver's pandas-written parquet embeds b'pandas' schema metadata,
    # which makes pa.Schema unhashable and defeats Ray Data's schema-dedup
    # fast path (a logged warning per read task).  Passing an explicit
    # metadata-stripped schema kills it at the source — blocks come out of
    # ReadParquet already clean (the old post-read strip map couldn't reach
    # inside the fused ReadParquet->SplitBlocks operator).
    path = f"{sf_dir}/{table}.parquet"
    key = (path, tuple(columns) if columns else None)
    sch = _READ_SCHEMA_CACHE.get(key)
    if sch is None:
        import pyarrow.parquet as pq

        full = pq.ParquetFile(path).schema_arrow.remove_metadata()
        sch = pa.schema([full.field(n) for n in columns]) if columns \
            else full
        _READ_SCHEMA_CACHE[key] = sch
    kwargs = {"filter": predicate} if predicate is not None else {}
    return rd.read_parquet(path, columns=columns, schema=sch,
                           override_num_blocks=nb, **kwargs)


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


# --------------------------------------------------------------------- entry
def entry() -> Any:
    """Flagship: near-duplicate detection + clustering over the sf0.001
    documents table (text modality; the image+caption variant runs in
    ``queries()['near_dup_images']`` on the synthetic Lance-schema table)."""
    from setsketch_ray.pipelines.dedup import DedupConfig, near_dup_pipeline
    from setsketch_ray.stages.sketch_stage import Modality, SketchConfig

    ds = _read("/root/testdata/sf0.001", "documents", ["doc_id", "text"])
    ds = ds.map_batches(_docs_as_captions, batch_format="pyarrow")
    cfg = DedupConfig(
        sketch=SketchConfig(modalities=(
            Modality("cap", "shingles_cap", minhash_m=128, num_bands=16,
                     rows_per_band=8, threshold=0.7),)),
        use_phash=False)
    clustered, edges, mapping = near_dup_pipeline(ds, cfg, id_col="image_id")
    return clustered


def _docs_as_captions(t: pa.Table) -> pa.Table:
    ids = pa.array([f"doc{int(i):012d}" for i in t["doc_id"].to_pylist()],
                   pa.string())
    return pa.table({"image_id": ids, "caption": t["text"]})


# ------------------------------------------------------------------- queries
def _q_exact_dedup_docs(sf_dir: str):
    """Exact dedup: keep the smallest doc_id per identical text
    (hash-partitioned groupby + min; SURVEY.md §2.5 'set ops / dedup')."""
    from setsketch_ray.functions.relational import grouped_aggregate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return grouped_aggregate(ds, ["text"], {"doc_id": ("min", "doc_id")})


def _q_bigram_lm_scores(sf_dir: str):
    """Bigram LM fluency scoring (functions/text.bigram_lm_stats — the
    CCNet/KenLM quality-filter shape): train top-512 add-one-smoothed
    bigram conditionals on the corpus in one combiner shuffle, score every
    doc with an actor-pool stage.  ORACLED exactly: n_bigrams / n_oov are
    integers, and sum_p_e9 pre-scales each DISTINCT bigram's probability
    to an int (one IEEE division + one floor, identical expression tree in
    the SQL) so the per-doc sums are exact integer arithmetic on both
    engines.  The float logprob_sum column stays library-side (tests)."""
    from setsketch_ray.functions.text import bigram_lm_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    scored, _table = bigram_lm_stats(ds, "text", top_bigrams=512)
    return scored.select_columns(
        ["doc_id", "n_bigrams", "n_oov", "sum_p_e9"]).sort("doc_id")


def _q_phrase_search(sf_dir: str):
    """Positional inverted index + exact phrase search (functions/
    search.py): the index is a hive bucket=N parquet layout keyed by
    token hash ((token, doc_id, pos) postings, one writer task per
    bucket, built ONCE per sf_dir under /tmp behind a _SUCCESS marker);
    each phrase query reads ONLY its tokens' buckets (parquet token==
    filter prunes row groups) and intersects postings positionally in a
    doc-hash co-partition — the corpus is never scanned at query time.
    ORACLED exactly: phrase matches equal the SQL positional self-join
    over string_split (single-spaced corpus contract)."""
    import hashlib
    import os
    import shutil

    import pyarrow.compute as pc

    from setsketch_ray.functions.search import (build_inverted_index,
                                                phrase_search)

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|invidx32".encode()) \
        .hexdigest()[:12]
    root = f"/tmp/inv_index_{fp}"
    if not os.path.isfile(os.path.join(root, "_SUCCESS")):
        shutil.rmtree(root, ignore_errors=True)
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        build_inverted_index(ds, "doc_id", "text", root, num_buckets=32)

    phrases = ["hash join", "merge sort", "table scan"]
    out = []
    for ph in phrases:
        hits = phrase_search(root, ph, num_buckets=32)
        t = pa.concat_tables(
            list(hits.iter_batches(batch_format="pyarrow",
                                   batch_size=1 << 20)) or
            [pa.table({"doc_id": pa.array([], pa.int64())})])
        out.append(pa.table({
            "phrase": pa.array([ph] * t.num_rows, pa.string()),
            "doc_id": t["doc_id"]}))
    res = pa.concat_tables(out)
    return res.take(pc.sort_indices(res, sort_keys=[
        ("phrase", "ascending"), ("doc_id", "ascending")]))


def _q_orc_roundtrip(sf_dir: str):
    """Documents round-tripped through deterministic hash-sharded Apache
    ORC files (sources/orc.py: write_orc_shards -> read_orc via
    read_corpus dispatch; one writer/reader task per shard).  ORACLED:
    the round trip is lossless, so per-doc byte counts and lang match
    strlen(text) straight off the parquet — any ORC encode/decode or
    shard-assignment bug breaks the hash.  Shards build once per sf_dir
    under /tmp behind a _SUCCESS marker (partial dirs wiped+rebuilt)."""
    import hashlib
    import os
    import shutil

    import pyarrow.compute as pc

    from setsketch_ray.sources.orc import write_orc_shards
    from setsketch_ray.sources.readers import read_corpus

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|orc8".encode()) \
        .hexdigest()[:12]
    root = f"/tmp/orc_shards_{fp}"
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.isfile(marker):
        shutil.rmtree(root, ignore_errors=True)
        ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        write_orc_shards(ds, root, key_col="doc_id", num_shards=8)
        with open(marker, "w") as fh:
            fh.write("8 shards\n")

    def summarize(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "n_bytes": pc.cast(pc.binary_length(
                pc.cast(t["text"], pa.binary())), pa.int64())})

    back = read_corpus(root, columns=["doc_id", "text", "lang"])
    return back.map_batches(summarize,
                            batch_format="pyarrow").sort("doc_id")


def _q_tfrecord_roundtrip(sf_dir: str):
    """Documents round-tripped through deterministic hash-sharded TFRecord
    files of tf.Example records (sources/tfrecord.py: pure-NumPy codec —
    masked-CRC32C framing with BOTH checksums of every record verified on
    read, CRC vectorized ACROSS records; hand-rolled example.proto wire
    format; Ray's own read_tfrecords needs tensorflow, absent here).
    ORACLED: lossless round trip, so per-doc byte counts and lang match
    strlen(text) straight off the parquet.  Shards build once per sf_dir
    under /tmp behind a _SUCCESS marker."""
    import hashlib
    import os
    import shutil

    import pyarrow.compute as pc

    from setsketch_ray.sources.tfrecord import (read_tfrecord_files,
                                                write_tfrecord_shards)

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|tfr8".encode()) \
        .hexdigest()[:12]
    root = f"/tmp/tfrecord_shards_{fp}"
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.isfile(marker):
        shutil.rmtree(root, ignore_errors=True)
        ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        write_tfrecord_shards(ds, root, key_col="doc_id", num_shards=8)
        with open(marker, "w") as fh:
            fh.write("8 shards\n")

    def summarize(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "n_bytes": pc.cast(pc.binary_length(
                pc.cast(t["text"], pa.binary())), pa.int64())})

    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string())])
    back = read_tfrecord_files(root, schema=schema)
    return back.map_batches(summarize,
                            batch_format="pyarrow").sort("doc_id")


def _q_containment_docs(sf_dir: str):
    """Directional window-containment join (functions/dedup.
    containment_pairs — clone/quote detection, the asymmetric complement
    of Jaccard dedup): (id_a, id_b) where doc b contains >= 9/10 of doc
    a's distinct 16-token windows, scored by the exact integer
    inequality 10*shared >= 9*n_w_a.  Candidates from shared-window
    buckets (recall 1 by construction, UNCAPPED per the certificate
    lesson), both directions of each candidate scored.  ORACLED EXACTLY:
    pairs AND integer scores mirror as a distinct-window self-join."""
    from setsketch_ray.functions.dedup import containment_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return containment_pairs(ds, "doc_id", "text", window=16,
                             num=9, den=10).sort(["id_a", "id_b"])


def _q_avro_roundtrip(sf_dir: str):
    """Documents round-tripped through deterministic hash-sharded Apache
    Avro container files (sources/avro.py: pure-Python spec codec —
    zigzag varints, deflate blocks, sync markers; write_avro_shards ->
    read_corpus dispatch, one writer/reader task per shard).  ORACLED:
    the round trip is lossless, so per-doc byte counts and lang match
    strlen(text) straight off the parquet — any encode/decode, varint or
    shard-assignment bug breaks the hash.  Shards build once per sf_dir
    under /tmp behind a _SUCCESS marker (partial dirs wiped+rebuilt)."""
    import hashlib
    import os
    import shutil

    import pyarrow.compute as pc

    from setsketch_ray.sources.avro import write_avro_shards
    from setsketch_ray.sources.readers import read_corpus

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|avro8".encode()) \
        .hexdigest()[:12]
    root = f"/tmp/avro_shards_{fp}"
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.isfile(marker):
        shutil.rmtree(root, ignore_errors=True)
        ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        write_avro_shards(ds, root, key_col="doc_id", num_shards=8)
        with open(marker, "w") as fh:
            fh.write("8 shards\n")

    def summarize(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "n_bytes": pc.cast(pc.binary_length(
                pc.cast(t["text"], pa.binary())), pa.int64())})

    back = read_corpus(root, columns=["doc_id", "text", "lang"])
    return back.map_batches(summarize,
                            batch_format="pyarrow").sort("doc_id")


def _q_bpe_tokenize(sf_dir: str):
    """Distributed BPE tokenizer (functions/text.train_bpe + BpeEncode —
    Sennrich et al. 2016): learn 64 merges from the corpus word histogram
    (one (word, cnt) combiner shuffle, never tokens; the histogram is
    vocabulary-sized so driver-side merge learning is the standard shape),
    then tokenize every doc with an actor-pool encode stage (per-actor
    merge table + distinct-word cache).  The merges themselves are not
    SQL-expressible (iterative argmax), but the ENCODE is certifiable:
    BPE is a segmentation, so concatenating a word's tokens must
    reproduce the word (roundtrip_ok — recomputed per distinct word from
    the broadcast merge list), and n_words <= n_bpe_tokens <= non-space
    chars (bounds_ok).  ORACLED as invariant rows: per-doc ``n_words`` is
    exact SQL; the two certificates must be 1 on every row (the trainer
    additionally reproduces the canonical Sennrich example in
    tests/test_functions.py)."""
    from setsketch_ray.functions.text import (_BPE_EOW, bpe_encode_word,
                                              bpe_token_counts)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out, merges = bpe_token_counts(ds, "text", n_merges=64)
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def grade(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = t["text"]
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) \
            else txt
        toks = pc.split_pattern(pc.fill_null(txt, ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        row_of = np.repeat(np.arange(t.num_rows), np.diff(offs))
        ne = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        flat, row_of = flat.filter(pa.array(ne)), row_of[ne]
        n_words = np.bincount(row_of, minlength=t.num_rows).astype(np.int64)
        rt_ok = np.ones(t.num_rows, dtype=bool)
        nchars = np.zeros(t.num_rows, dtype=np.int64)
        if len(flat):
            enc = pc.dictionary_encode(flat)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            wl = enc.dictionary.to_pylist()
            # tokens carry the </w> end-of-word marker: a correct
            # segmentation concatenates back to word + EOW exactly
            w_rt = np.array(
                ["".join(bpe_encode_word(w, ranks)) == w + _BPE_EOW
                 for w in wl])
            codes = enc.indices.to_numpy(zero_copy_only=False)
            np.logical_and.at(rt_ok, row_of, w_rt[codes])
            wlen = pc.utf8_length(enc.dictionary) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(nchars, row_of, wlen[codes])
        nb = t["n_bpe_tokens"].to_numpy(zero_copy_only=False)
        # per word: 1 <= len(tokens) <= len(word) + 1 (the EOW marker)
        bounds = (n_words <= nb) & (nb <= nchars + n_words)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "bounds_ok": pa.array(bounds.astype(np.int64), pa.int64()),
            "roundtrip_ok": pa.array(rt_ok.astype(np.int64), pa.int64())})

    return out.map_batches(grade, batch_format="pyarrow").sort("doc_id")


def _q_tiered_dedup_docs(sf_dir: str):
    """Web-scale tiered dedup cascade (functions/dedup.tiered_dedup — the
    RefinedWeb/CCNet shape): tier 1 exact content dedup (earlier doc wins,
    (id, hash)-only shuffle), tier 2 shingle-Jaccard near-dup over the
    tier-1 survivors (shared-16-token-window candidates have recall 1 by
    construction; verification is the exact integer inequality
    2*shared >= union).  ORACLED exactly: one row per doc with its
    drop_tier — the SQL mirror is a window-function dedup + the same
    distinct-window self-join + integer Jaccard (exact modulo 2^-64 hash
    collisions and the >256-doc bucket cap, neither reachable here)."""
    from setsketch_ray.functions.dedup import tiered_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tiered_dedup(ds, "doc_id", "text", window=16,
                        jaccard_num=1, jaccard_den=2).sort("doc_id")


def _cardinality_grid_sql() -> str:
    """Constant-SQL mirror of _q_cardinality_eval's output shape: the
    geometric cardinality grid (a pure function of max_cardinality=20000)
    as a VALUES list, with the rmse/bias bound certificates (computed
    Ray-side against the paper's closed-form RSD) asserted green."""
    from setsketch_ray.pipelines.evaluation import geometric_cardinalities

    vals = ", ".join(f"({c})" for c in geometric_cardinalities(20000))
    return ("SELECT CAST(c.cardinality AS BIGINT) AS cardinality, "
            "CAST(1 AS BIGINT) AS rmse_ok, CAST(1 AS BIGINT) AS bias_ok "
            f"FROM (VALUES {vals}) c(cardinality) ORDER BY c.cardinality")


def _audio_truth_sql() -> str:
    """Constant-SQL mirror of _q_near_dup_audio: the planted-truth pair
    count is analytic (sources/av.truth_audio_pairs — pure function of
    the corpus construction, no audio synthesis); the exact-set-equality
    certificates are computed Ray-side."""
    from setsketch_ray.sources.av import truth_audio_pairs

    n = truth_audio_pairs(192).num_rows
    return (f"SELECT CAST({n} AS BIGINT) AS n_true_pairs, "
            "CAST(1 AS BIGINT) AS recall_ok, "
            "CAST(1 AS BIGINT) AS precision_ok")


def _video_truth_sql() -> str:
    """Constant-SQL mirror of _q_near_dup_videos: the planted-truth pair
    count is analytic (sources/av.truth_video_pairs — pure function of the
    corpus construction, no video synthesis); the exact-set-equality
    certificates are computed Ray-side."""
    from setsketch_ray.sources.av import truth_video_pairs

    n = truth_video_pairs(160).num_rows
    return (f"SELECT CAST({n} AS BIGINT) AS n_true_pairs, "
            "CAST(1 AS BIGINT) AS recall_ok, "
            "CAST(1 AS BIGINT) AS precision_ok")


def _audio_fp_sql() -> str:
    """Constant-SQL mirror of _q_audio_fingerprint's per-fmt shape: clip
    counts per codec are a pure corpus-definition function (the same
    counter-mode hash that assigns formats in sources/av.generate_audio_rows)
    mirrored into the VALUES list; the decode-fidelity certificates are
    computed Ray-side against the raw-waveform truth."""
    from collections import Counter

    from setsketch_ray.sources.av import _AUDIO_FMTS, _u

    cnt = Counter(_AUDIO_FMTS[int(_u(42, i, 22)) % len(_AUDIO_FMTS)]
                  for i in range(256))
    vals = ", ".join(f"('{f}', {cnt[f]})" for f in sorted(cnt))
    return ("SELECT c.fmt, CAST(c.n_clips AS BIGINT) AS n_clips, "
            "CAST(1 AS BIGINT) AS duration_ok, "
            "CAST(1 AS BIGINT) AS lossless_exact_ok, "
            "CAST(1 AS BIGINT) AS rms_ok, CAST(1 AS BIGINT) AS zcr_ok, "
            "CAST(1 AS BIGINT) AS band_ok "
            f"FROM (VALUES {vals}) c(fmt, n_clips) ORDER BY c.fmt")


def _ssjoin_oracle_sql(num: int, den: int) -> str:
    """SQL mirror of ssjoin_jaccard_pairs: same normalized stopword-filtered
    unigram+bigram gram sets (strings instead of u64 hashes — Jaccard equal
    modulo 2^-64 collisions), same df-ordered prefix + length + positional
    filters (each exactness-preserving, so both sides reach the identical
    verified pair set), same integer verify inequality."""
    from setsketch_ray.stages.shingle import STOPWORDS

    sl = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    return f"""
WITH raw AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text),
    '[^a-z0-9]+', ' ', 'g')), ' ') AS ws FROM documents),
toks AS (
  SELECT doc_id, w, pos FROM (
    SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws)+1)) AS pos
    FROM raw) t
  WHERE w NOT IN ({sl}) AND w <> ''),
r AS MATERIALIZED (SELECT doc_id, w,
      row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rp FROM toks),
uni AS (SELECT DISTINCT doc_id, 'u:' || w AS g FROM r),
bi AS (SELECT DISTINCT a.doc_id, 'b:' || a.w || ' ' || b.w AS g
       FROM r a JOIN r b ON b.doc_id = a.doc_id AND b.rp = a.rp + 1),
grams AS MATERIALIZED (SELECT * FROM uni UNION ALL SELECT * FROM bi),
sets AS MATERIALIZED (SELECT doc_id, count(*) AS n
         FROM grams GROUP BY doc_id),
df AS MATERIALIZED (SELECT g, count(*) AS df FROM grams GROUP BY g),
ord AS (SELECT gr.doc_id, gr.g,
        row_number() OVER (PARTITION BY gr.doc_id ORDER BY d.df, gr.g)
          AS rk, s.n
        FROM grams gr JOIN df d USING (g) JOIN sets s USING (doc_id)),
pref AS MATERIALIZED (SELECT doc_id, g, rk, n FROM ord
         WHERE rk <= n - (({num}*n+{den}-1)//{den}) + 1),
cand AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                min(a.rk) AS ra, min(b.rk) AS rb,
                min(a.n) AS na, min(b.n) AS nb
         FROM pref a JOIN pref b ON a.g = b.g AND a.doc_id < b.doc_id
           AND {den}*least(a.n, b.n) >= {num}*greatest(a.n, b.n)
         GROUP BY ia, ib
         HAVING {den}*(1 + least(na - ra, nb - rb))
                >= {num}*(na + nb - (1 + least(na - ra, nb - rb)))),
scored AS (SELECT c.ia, c.ib, count(*) AS s,
           min(c.na) AS na, min(c.nb) AS nb FROM cand c
           JOIN grams ga ON ga.doc_id = c.ia
           JOIN grams gb ON gb.doc_id = c.ib AND gb.g = ga.g
           GROUP BY c.ia, c.ib)
SELECT ia AS id_a, ib AS id_b, CAST(s AS BIGINT) AS n_shared,
       CAST(na + nb - s AS BIGINT) AS n_union
FROM scored WHERE {den}*s >= {num}*(na + nb - s) ORDER BY id_a, id_b"""


def _q_ssjoin_pairs(sf_dir: str):
    """EXACT set-similarity self-join over documents (functions/dedup.
    ssjoin_jaccard_pairs — the AllPairs/PPJoin family, Bayardo et al.
    WWW'07 / Xiao et al. WWW'08): every pair with word-unigram+bigram
    shingle Jaccard >= 0.85, found via document-frequency-ordered prefix
    filtering + length + positional filters, all three exactness-
    preserving.  Unlike the LSH near-dup family, recall AND precision are
    1 by construction — and the integer (n_shared, n_union) scores ship
    in the output, so the PAIRS AND SCORES are oracled bit-for-bit (the
    SQL mirror builds the same stopword-filtered gram sets and runs the
    same three filters; equal modulo 2^-64 shingle-hash collisions)."""
    from setsketch_ray.functions.dedup import ssjoin_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ssjoin_jaccard_pairs(ds, "doc_id", "text",
                                jaccard_num=17, jaccard_den=20) \
        .sort(["id_a", "id_b"])


def _q_distinct_parts(sf_dir: str):
    """Exact COUNT(DISTINCT): the baseline `approx_distinct` is checked
    against (rows-only query below)."""
    ds = _read(sf_dir, "lineitem", ["l_partkey"])
    n = len(ds.unique("l_partkey"))
    return pa.table({"n_distinct": pa.array([n], pa.int64())})


def _q_doc_stats_by_lang(sf_dir: str):
    from setsketch_ray.functions.relational import grouped_aggregate

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return grouped_aggregate(ds, ["lang"], {
        "n_docs": ("count", None),
        "avg_chars": ("mean", "n_chars"),
        "total_chars": ("sum", "n_chars"),
    })


def _q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-flavored wide aggregate: vectorized derived columns inside
    map_batches, then grouped partial+final aggregation.

    Money/quantity sums run on an INTEGER-SCALED domain (x100 / x10000,
    round, int64) so the result is exact and independent of how parallel
    partial sums associate — float64 partial sums hash-mismatched the
    sequential DuckDB oracle in round 1 (VERDICT r1 #1).  The oracle does
    the identical scaling."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def scaled(t: pa.Table) -> pa.Table:
        def s(expr, factor):
            return pc.round(pc.multiply(expr, pa.scalar(float(factor)))) \
                .cast(pa.int64())

        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty_s": s(t["l_quantity"], 100),
            "price_s": s(t["l_extendedprice"], 100),
            "disc_price_s": s(disc_price, 10000),
            "disc_s": s(t["l_discount"], 10000),
        })

    ds = ds.map_batches(scaled, batch_format="pyarrow")
    agg = grouped_aggregate(ds, ["l_returnflag", "l_linestatus"], {
        "sum_qty_s": ("sum", "qty_s"),
        "sum_base_price_s": ("sum", "price_s"),
        "sum_disc_price_s": ("sum", "disc_price_s"),
        "sum_disc_s": ("sum", "disc_s"),
        "count_order": ("count", None),
    })
    f64 = pa.float64()
    cnt = pc.cast(agg["count_order"], f64)
    return pa.table({
        "l_returnflag": agg["l_returnflag"],
        "l_linestatus": agg["l_linestatus"],
        "sum_qty": pc.divide(pc.cast(agg["sum_qty_s"], f64), 100.0),
        "sum_base_price": pc.divide(pc.cast(agg["sum_base_price_s"], f64),
                                    100.0),
        "sum_disc_price": pc.divide(pc.cast(agg["sum_disc_price_s"], f64),
                                    10000.0),
        "avg_disc": pc.divide(
            pc.divide(pc.cast(agg["sum_disc_s"], f64), 10000.0), cnt),
        "count_order": agg["count_order"],
    })


def _q_top_users(sf_dir: str):
    """Grouped aggregate -> global sort -> limit (top-k).

    ``value`` is exact cents, so the sum runs integer-scaled (x100, int64)
    for association-independent hashing; the oracle scales identically."""
    import pyarrow.compute as pc
    import ray.data as rd

    from setsketch_ray.functions.relational import grouped_aggregate

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def scaled(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "value_s": pc.round(pc.multiply(t["value"], pa.scalar(100.0)))
            .cast(pa.int64()),
        })

    agg = grouped_aggregate(ds.map_batches(scaled, batch_format="pyarrow"),
                            ["user_id"], {
        "n_events": ("count", None), "total_value_s": ("sum", "value_s")})
    agg = pa.table({
        "user_id": agg["user_id"], "n_events": agg["n_events"],
        "total_value": pc.divide(pc.cast(agg["total_value_s"], pa.float64()),
                                 100.0)})
    top = rd.from_arrow(agg).sort(["n_events", "user_id"],
                                  descending=[True, False]).limit(10)
    return top


def _q_token_counts(sf_dir: str):
    """Per-document whitespace token count (vectorized separator count)."""
    from setsketch_ray.functions.text import AddTokenStats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(AddTokenStats(), batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_tokens"])


def _q_knn_batch(sf_dir: str):
    """Batched brute-force kNN (functions/knn.knn_bruteforce_batch): the
    evaluation-set shape — 4 query vectors broadcast as ONE normalized
    matrix, every corpus batch scores all queries in one matmul, the
    corpus streams once regardless of query count; per-batch m*k partials
    feed a distributed top_k_per_group.  ORACLED: rank-only output (ties
    by vec_id, float scores internal), DOUBLE-cast cosine in SQL."""
    from setsketch_ray.functions.knn import knn_bruteforce_batch

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_bruteforce_batch(ds, [0, 7, 23, 41], k=10)
    return out.sort(["query_id", "rank"])


def _q_value_quantiles_kll(sf_dir: str):
    """Approximate quantiles of events.value via the mergeable KLL
    compactor sketch (sketchlib/quantiles.py + relational.approx_quantiles)
    — the unbounded-float-domain scale path beside the exact
    value_quantiles (whose distinct-value shuffle needs a fixed-point
    domain).  One sketch partial per block (~1.8 KB each), deterministic
    bytewise-sorted driver merge.  ORACLED as invariant rows: n is exact
    (matches DuckDB COUNT(*)), and each answer carries a rank CERTIFICATE —
    a second shuffle-free value_ranks pass counts rows <,<= the KLL answer
    and ``rank_ok`` flips to 0 unless ceil(phi*n) lies within 2% x n of the
    answer's true rank interval (the sketch's guarantee is ~1% at k=200,
    asserted tighter in tests/test_sketches.py)."""
    from setsketch_ray.functions.relational import (approx_quantiles,
                                                    value_ranks)

    phis = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    ds = _read(sf_dir, "events", ["value"])
    res = approx_quantiles(ds, "value", phis)
    n = res["n"][0].as_py()
    ranks = value_ranks(ds, "value", res["value"].to_pylist())
    eps_n = 0.02 * n
    ok = []
    for i, phi in enumerate(phis):
        target = max(1, int(np.ceil(phi * n)))
        lo, hi = ranks["n_lt"][i].as_py(), ranks["n_le"][i].as_py()
        ok.append(int(lo - eps_n <= target <= hi + eps_n))
    return pa.table({
        "phi_scaled": pa.array([int(round(p * 10000)) for p in phis],
                               pa.int64()),
        "n": pa.array([n] * len(phis), pa.int64()),
        "rank_ok": pa.array(ok, pa.int64())})


def _q_value_quantiles_kll_by_type(sf_dir: str):
    """Per-group approximate quantiles of events.value by event_type
    (relational.approx_quantiles_by): one ~1.8 KB KLL sketch per (block,
    key) through the shuffle — never the data.  ORACLED as invariant rows:
    per-group n is exact (matches DuckDB), and each per-group answer
    carries a rank certificate via a grouped value_ranks pass (``rank_ok``
    flips to 0 past 2% x n_group rank error; the sketch guarantees ~1% at
    k=200, asserted tighter in tests/test_functions.py)."""
    from setsketch_ray.functions.relational import (approx_quantiles_by,
                                                    value_ranks)

    phis = [0.1, 0.5, 0.9]
    ds = _read(sf_dir, "events", ["event_type", "value"])
    res = approx_quantiles_by(ds, "event_type", "value", phis) \
        .sort(["event_type", "phi"])
    rows = res.take_all()
    answers: dict[str, list[float]] = {}
    n_by: dict[str, int] = {}
    for r in rows:
        answers.setdefault(r["event_type"], []).append(r["value"])
        n_by[r["event_type"]] = r["n"]
    ranks = value_ranks(ds, "value", answers, key_col="event_type")
    bounds = {(ranks["event_type"][i].as_py(),
               ranks["target_idx"][i].as_py()):
              (ranks["n_lt"][i].as_py(), ranks["n_le"][i].as_py())
              for i in range(ranks.num_rows)}
    types, phi_s, ns, ok = [], [], [], []
    for t in sorted(answers):
        n = n_by[t]
        for i, phi in enumerate(phis):
            lo, hi = bounds[(t, i)]
            target = max(1, int(np.ceil(phi * n)))
            types.append(t)
            phi_s.append(int(round(phi * 10000)))
            ns.append(n)
            ok.append(int(lo - 0.02 * n <= target <= hi + 0.02 * n))
    return pa.table({"event_type": pa.array(types, pa.string()),
                     "phi_scaled": pa.array(phi_s, pa.int64()),
                     "n": pa.array(ns, pa.int64()),
                     "rank_ok": pa.array(ok, pa.int64())})


def _q_pack_sequences(sf_dir: str):
    """GPT-style sequence packing over documents: virtual concatenation in
    doc_id order chunked every 2048 tokens (functions/streaming.
    pack_sequences — a distributed two-pass global prefix sum, no global
    sort, no driver-side data pull).  ORACLED: start_tok is exactly the
    SQL exclusive running sum over doc_id order; chunk_id = start_tok //
    2048, all-integer on both sides."""
    from setsketch_ray.functions.streaming import pack_sequences
    from setsketch_ray.functions.text import AddTokenStats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(AddTokenStats(), batch_format="pyarrow") \
        .select_columns(["doc_id", "n_tokens"]).materialize()
    return pack_sequences(ds, "doc_id", "n_tokens", budget=2048) \
        .sort("doc_id")


def _q_knn_bruteforce(sf_dir: str):
    """Brute-force cosine top-10 neighbors of vec_id 0 (numpy matmul per
    batch against a broadcast query vector; global top-k via sort+limit)."""
    from setsketch_ray.functions.knn import knn_bruteforce

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_bruteforce(ds, query_vec_id=0, k=10)


def _q_cosine_pairs(sf_dir: str):
    """Exact all-pairs cosine-similarity join (cos >= 0.3) over the
    embeddings table — the brute-force baseline that anchors the approximate
    embedding near-dup paths.  Emits integer (id_a, id_b) only, so the
    result hashes identically against the DuckDB cross-join oracle."""
    from setsketch_ray.functions.knn import cosine_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_pairs(ds, threshold=0.3)


def _ivf_exact_subset_topk(sf_dir: str, centroids, qids, k: int,
                           n_probe: int):
    """Invariant harness for the oracled ANN rows: exact cosine top-k
    RESTRICTED to the probed cells, computed independently (driver-side
    numpy over the small sf embeddings table) with the same cell
    assignment / tie rules as the index.  Returns {qid: [vec_id...]}."""
    from setsketch_ray.functions.knn import _embedding_matrix

    tbl = pa.concat_tables(list(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    ids = tbl["vec_id"].to_numpy()
    m = _embedding_matrix(tbl["embedding"])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cell = np.argmax(m @ centroids.T, axis=1)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30)
    out = {}
    for q in qids:
        qv = m[ids == q][0]
        probe = np.argsort(-(cn @ (qv / np.linalg.norm(qv))))[:n_probe]
        sub = np.isin(cell, probe) & (ids != q)
        cos = mn[sub] @ (qv / np.linalg.norm(qv))
        sid = ids[sub]
        out[q] = sid[np.lexsort((sid, -cos))[:k]].tolist()
    return out


def _q_knn_ivf(sf_dir: str):
    """IVF approximate top-10 — the 100 TB ANN scale path: a one-pass build
    writes the corpus hive-partitioned by nearest-centroid cell
    (build_ivf_index), then the probe READS ONLY the n_probe probed cells'
    files (knn_ivf_pruned) instead of scanning the corpus.  The index is
    built once per sf_dir and reused (idempotent layout; _centroids.npy is
    written LAST, so its presence implies a complete index).

    ORACLED INVARIANT (r4): for 10 fixed query ids the probe result must
    EQUAL exact brute-force cosine top-10 restricted to the probed cells
    (same tie rule) — the machinery-parity property of IVF, independent of
    the data geometry (the sf embeddings are near-orthogonal, so absolute
    recall is not the checkable quantity).  Emits (query_id, rank, ok=1)
    per result slot; any routing / pruned-read / merge / ranking bug turns
    ok to 0 and fails the hash against the constant-truth oracle."""
    import hashlib
    import os

    from setsketch_ray.functions.knn import build_ivf_index, knn_ivf_pruned

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|32|4|11".encode()) \
        .hexdigest()[:12]
    index_root = f"/tmp/ivf_index_{fp}"
    if not os.path.exists(os.path.join(index_root, "_centroids.npy")):
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        build_ivf_index(ds, index_root, n_centroids=32, n_iters=4, seed=11)
    centroids = np.load(os.path.join(index_root, "_centroids.npy"))
    qids = list(range(10))
    expect = _ivf_exact_subset_topk(sf_dir, centroids, qids, 10, 8)
    rows_q, rows_r, rows_ok = [], [], []
    for q in qids:
        got = knn_ivf_pruned(index_root, query_vec_id=q,
                             k=10)["vec_id"].to_pylist()
        for r in range(len(got)):
            rows_q.append(q)
            rows_r.append(r + 1)
            rows_ok.append(1 if (r < len(expect[q])
                                 and got[r] == expect[q][r]) else 0)
    return pa.table({"query_id": pa.array(rows_q, pa.int64()),
                     "rank": pa.array(rows_r, pa.int64()),
                     "ok": pa.array(rows_ok, pa.int64())})


def _q_knn_ivfpq(sf_dir: str):
    """IVF-PQ compressed ANN (functions/knn.build_ivfpq_index +
    knn_ivfpq_pruned): probed cells hold 8-byte PQ codes instead of 256-
    byte vectors (asymmetric-distance LUT scoring, vectors never load),
    then the top k*8 shortlist exact-re-ranks against the true embeddings.

    ORACLED INVARIANT (r4): aggregate overlap between the PQ-shortlisted
    top-10 and exact brute force restricted to the same probed cells, for
    10 fixed query ids, reported as milli-overlap CAPPED at 850 — the
    compressed shortlist is lossy by design (measured 900-1000 across the
    sf tables at the production refine_factor=8; a broken ADC LUT / codes
    / refine path drops far below the floor and fails the hash)."""
    import hashlib
    import os

    from setsketch_ray.functions.knn import (build_ivfpq_index,
                                             knn_ivfpq_pruned)

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|ivfpq".encode()) \
        .hexdigest()[:12]
    root = f"/tmp/ivfpq_index_{fp}"
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    if not os.path.exists(os.path.join(root, "_codebooks.npy")):
        build_ivfpq_index(ds, root, n_centroids=32, m_sub=8, n_codes=64,
                          seed=11)
    centroids = np.load(os.path.join(root, "_centroids.npy"))
    qids = list(range(10))
    expect = _ivf_exact_subset_topk(sf_dir, centroids, qids, 10, 8)
    qtbl = pa.concat_tables(list(
        ds.filter(expr=" or ".join(f"vec_id == {q}" for q in qids))
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    qvecs = {int(i): np.asarray(e, np.float64)
             for i, e in zip(qtbl["vec_id"].to_pylist(),
                             qtbl["embedding"].to_pylist())}
    hits = total = 0
    for q in qids:
        got = knn_ivfpq_pruned(root, ds, qvecs[q], k=10, n_probe=8,
                               exclude_id=q)["vec_id"].to_pylist()
        hits += len(set(got) & set(expect[q]))
        total += len(expect[q])
    milli = 1000 * hits // max(1, total)
    return pa.table({
        "k": pa.array([10], pa.int64()),
        "n_probe": pa.array([8], pa.int64()),
        "n_queries": pa.array([len(qids)], pa.int64()),
        "milli_overlap_capped": pa.array([min(milli, 850)], pa.int64())})


def _near_dup_docs_production(sf_dir: str):
    """The PRODUCTION text near-dup path (MinHash-LSH + exact
    shingle-Jaccard verify at threshold 0.85) — returned as a Dataset of
    verified (id_a, id_b) edges so bench.py can time it WITHOUT the
    in-query exact-truth grading (the ssjoin certificate is 4-5x the
    production cost at test scale and belongs in a separate bench row).

    32 bands x 8 rows (m=256): per-pair band-hit probability at the
    J=0.85 boundary is 1-(1-0.85^8)^32 = 0.999963, so the expected miss
    count over the sf truth sets (tens-hundreds of pairs) is <<1 — this
    is what honestly backs the 0.99 recall certificate (16x8's 0.994
    measured 0.96-1.0: one boundary pair missed occasionally)."""
    from setsketch_ray.pipelines.dedup import (DedupConfig, candidate_pairs,
                                               verified_edges)
    from setsketch_ray.stages.sketch_stage import Modality, SketchConfig

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    caps = ds.map_batches(_docs_as_captions, batch_format="pyarrow")
    cfg = DedupConfig(
        sketch=SketchConfig(modalities=(
            Modality("cap", "shingles_cap", minhash_m=256, num_bands=32,
                     rows_per_band=8, threshold=0.85),)),
        use_phash=False, pair_dedup="shuffle")  # exact pair-unique output
    # candidate_pairs APPENDS jaccard/score; verified_edges applies the
    # threshold filter (a raw candidate set is NOT precision-guaranteed —
    # band collisions below threshold appear at sf0.1 corpus sizes)
    return verified_edges(candidate_pairs(caps, cfg, id_col="image_id"),
                          cfg).select_columns(["id_a", "id_b"])


def _q_near_dup_docs(sf_dir: str):
    """Near-dup pairs over documents (MinHash-LSH + exact shingle-Jaccard
    verify at threshold 0.85), GRADED IN-QUERY against the exact truth from
    the set-similarity join (functions/dedup.ssjoin_jaccard_pairs at
    J >= 17/20 — recall/precision 1 by construction over the SAME
    caption_shingles gram sets).  ORACLED as invariant rows:
    ``n_true_pairs`` is the exact pair count the SQL mirror recomputes
    independently; ``precision_ok`` flips to 0 if the LSH+verify path ever
    emits a pair outside the truth set (the verify is exact, so this is a
    hard invariant); ``recall_floor_ok`` flips to 0 below 99% recall —
    honest at 32 bands x 8 rows: per-pair hit probability 0.999963 at the
    J=0.85 boundary (see _near_dup_docs_production)."""
    from setsketch_ray.functions.dedup import ssjoin_jaccard_pairs

    lsh_rows = _near_dup_docs_production(sf_dir).take_all()
    # image_id format is "doc%012d" (_docs_as_captions)
    lsh = {tuple(sorted((int(r["id_a"][3:]), int(r["id_b"][3:]))))
           for r in lsh_rows}
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    truth_rows = ssjoin_jaccard_pairs(ds, "doc_id", "text",
                                      jaccard_num=17, jaccard_den=20) \
        .select_columns(["id_a", "id_b"]).take_all()
    truth = {tuple(sorted((int(r["id_a"]), int(r["id_b"]))))
             for r in truth_rows}
    recall = len(lsh & truth) / len(truth) if truth else 1.0
    return pa.table({
        "n_true_pairs": pa.array([len(truth)], pa.int64()),
        "precision_ok": pa.array([int(not (lsh - truth))], pa.int64()),
        "recall_floor_ok": pa.array([int(recall >= 0.99)], pa.int64())})


def _q_near_dup_images(sf_dir: str):
    """The flagship image+caption pipeline over the deterministic synthetic
    Lance-schema table (BASELINE.json input_hint) with planted near-dups,
    GRADED IN-QUERY against the analytic planted truth
    (sources/images.truth_pairs — derived from the corpus construction, not
    from the pipeline).  ORACLED as invariant rows (constant SQL): LSH +
    sketch verification over decoded image bytes is not SQL-expressible,
    but the north-rule CONTRACT is — ``recall_ok``/``precision_ok`` flip to
    0 below the 0.99 dup-pair bar (measured 1.0/1.0 from 1k through 1M
    images, bench.py --stress) and ``all_rows_kept_ok`` certifies the
    clustered output is a full relabeling, not a filter."""
    import ray.data as rd

    from setsketch_ray.pipelines.dedup import (DedupConfig, evaluate_recall,
                                               near_dup_pipeline)
    from setsketch_ray.sources import cached_images_parquet
    from setsketch_ray.sources.images import truth_pairs

    n = 1000
    ds = rd.read_parquet(cached_images_parquet(n))
    clustered, edges, mapping = near_dup_pipeline(ds, DedupConfig())
    rec = evaluate_recall(mapping, truth_pairs(n))
    return pa.table({
        "n_images": pa.array([n], pa.int64()),
        "recall_ok": pa.array([int(rec["recall"] >= 0.99)], pa.int64()),
        "precision_ok": pa.array([int(rec["precision"] >= 0.99)],
                                 pa.int64()),
        "all_rows_kept_ok": pa.array([int(clustered.count() == n)],
                                     pa.int64())})


def _q_approx_distinct_parts(sf_dir: str):
    """GHLL approx distinct (m=4096, b=2) checked against the exact
    distributed COUNT(DISTINCT) in the SAME query.  ORACLED as invariant
    rows: the exact count must match DuckDB bit-for-bit and ``est_err_ok``
    flips to 0 if the deterministic estimate drifts past 6% relative error
    (expected RSD ~1.6%; measured <=2.6% at every sf — a broken estimator
    or hash kernel turns the row red)."""
    from setsketch_ray.aggregates import approx_distinct
    from setsketch_ray.functions.relational import count_distinct

    ds = _read(sf_dir, "lineitem", ["l_partkey"])
    est = approx_distinct(ds, "l_partkey")
    exact = count_distinct(ds, "l_partkey")
    ok = int(abs(est / exact - 1.0) <= 0.06)
    return pa.table({"exact_n_distinct": pa.array([exact], pa.int64()),
                     "est_err_ok": pa.array([ok], pa.int64())})


def _q_char_jaccard_pairs(sf_dir: str):
    """Character-set Jaccard between consecutive documents — exact SQL oracle
    via DuckDB's ``jaccard()`` (n-gram Jaccard with n=1)."""
    from setsketch_ray.functions.dedup import char_ngram_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return char_ngram_jaccard_pairs(ds, "doc_id", "text", n=1)


def _q_simhash_dup_docs(sf_dir: str):
    """SimHash near-dup pairs (octet-pair Hamming LSH + exact Hamming
    verify), GRADED IN-QUERY against the brute-force all-pairs Hamming
    truth over the same fingerprints.  ORACLED as invariant rows:
    ``n_docs`` anchors to the table; ``precision_ok`` flips to 0 if the
    LSH path emits any pair outside the exact Hamming<=10 truth (or with
    a wrong distance); ``pigeonhole_ok`` flips to 0 if any truth pair at
    Hamming<=6 is missed — 6 is the HARD guarantee of the 28 octet-pair
    bands (two fingerprints within distance 6 always share a clean octet
    pair), so this certifies the band construction, not luck.  The query
    runs with the hot-bucket cap DISABLED: the guarantee is a property of
    the uncapped all-pairs emit, while the production default
    (bucket_cap=256, star+chain over fingerprint-sorted members) trades
    the tail of it for O(n)-per-bucket work at web scale — that heuristic
    is covered by its own connectivity tests, not this certificate.  The
    brute-force certificate is N^2/2 SWAR popcounts over an N x 8-byte
    driver pull — a grading device for the invariant, not the dedup path."""
    from setsketch_ray.functions.dedup import AddSimHash, _hamming64, \
        simhash_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    fp_rows = ds.map_batches(AddSimHash("text"), batch_format="pyarrow") \
        .select_columns(["doc_id", "simhash"]).take_all()
    ids = np.array([r["doc_id"] for r in fp_rows], dtype=np.int64)
    fps = np.array([r["simhash"] for r in fp_rows],
                   dtype=np.int64).astype(np.uint64)
    order = np.argsort(ids)
    ids, fps = ids[order], fps[order]
    truth10, truth6 = {}, set()
    for i in range(len(ids) - 1):
        h = _hamming64(fps[i], fps[i + 1:])
        for off in np.flatnonzero(h <= 10):
            pair = (int(ids[i]), int(ids[i + 1 + off]))
            truth10[pair] = int(h[off])
            if h[off] <= 6:
                truth6.add(pair)
    got_rows = simhash_pairs(ds, "doc_id", "text", max_hamming=10,
                             bucket_cap=1 << 30).take_all()
    got = {tuple(sorted((int(r["id_a"]), int(r["id_b"])))): int(r["hamming"])
           for r in got_rows}
    precision_ok = int(all(truth10.get(p) == h for p, h in got.items()))
    pigeonhole_ok = int(truth6 <= set(got))
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "precision_ok": pa.array([precision_ok], pa.int64()),
        "pigeonhole_ok": pa.array([pigeonhole_ok], pa.int64())})


def _q_embedding_near_dup(sf_dir: str):
    """Embedding-cosine near-dup via hyperplane-bucket LSH + exact cosine
    verify, graded in-query against the exact all-pairs truth
    (functions/knn.cosine_pairs — the same distributed matmul the
    cosine_pairs query oracles).  ORACLED as invariant rows: n_true_pairs
    is the exact cosine>=0.35 pair count (bit-for-bit vs DuckDB in f64);
    precision_ok flips to 0 if the LSH+verify path ever emits a pair
    outside the truth set (the verify is exact, so this is a hard
    invariant); recall_floor_ok flips to 0 below 30% recall (the seeded
    hyperplanes are deterministic; measured 0.376-0.391 on the
    near-orthogonal sf tables — planted near-identical vectors reach ~1.0
    in tests/test_functions.py)."""
    from setsketch_ray.functions.dedup import embedding_near_dup_pairs
    from setsketch_ray.functions.knn import cosine_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = embedding_near_dup_pairs(ds, cosine_threshold=0.35, n_bits=6,
                                     n_tables=8)
    lsh = {tuple(sorted((r["id_a"], r["id_b"]))) for r in pairs.take_all()}
    exact = cosine_pairs(ds, threshold=0.35).to_pandas()
    truth = {tuple(sorted(p)) for p in zip(exact["id_a"], exact["id_b"])}
    recall = len(lsh & truth) / len(truth) if truth else 1.0
    return pa.table({
        "n_true_pairs": pa.array([len(truth)], pa.int64()),
        "precision_ok": pa.array([int(not (lsh - truth))], pa.int64()),
        "recall_floor_ok": pa.array([int(recall >= 0.30)], pa.int64())})


def _q_events_dow_hour(sf_dir: str):
    """Day-of-week x hour activity heatmap over events: pure integer epoch
    math (dow = (epoch_days + 4) % 7 with Sunday=0, matching DuckDB
    dayofweek; hour = (epoch_us // 3600e6) % 24), combiner-style count +
    integer-cent sums.  ORACLED exactly — every value is an integer on
    both sides."""
    from setsketch_ray.functions.relational import grouped_aggregate

    ds = _read(sf_dir, "events", ["ts", "value"])

    def keys(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = us // 86_400_000_000
        dow = (days + 4) % 7
        hr = (us // 3_600_000_000) % 24
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        return pa.table({"dow": pa.array(dow, pa.int64()),
                         "hr": pa.array(hr, pa.int64()),
                         "vc": pa.array(cents, pa.int64())})

    out = grouped_aggregate(ds.map_batches(keys, batch_format="pyarrow"),
                            ["dow", "hr"],
                            {"n_events": ("count", None),
                             "sum_value_c": ("sum", "vc")})
    order = pa.compute.sort_indices(out, sort_keys=[("dow", "ascending"),
                                                    ("hr", "ascending")])
    return out.take(order)


def _q_events_hourly(sf_dir: str):
    """Tumbling-window (hourly) grouped aggregate over the events stream
    table — vectorized temporal floor + partial aggregation."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def add_hour(t: pa.Table) -> pa.Table:
        # cents are exact -> integer-scaled sum, association-independent
        return pa.table({
            "user_id": t["user_id"],
            "hour": pc.floor_temporal(t["ts"], unit="hour"),
            "value_s": pc.round(pc.multiply(t["value"], pa.scalar(100.0)))
            .cast(pa.int64()),
        })

    ds = ds.map_batches(add_hour, batch_format="pyarrow")
    agg = grouped_aggregate(ds, ["user_id", "hour"], {
        "n_events": ("count", None), "total_value_s": ("sum", "value_s")})
    return pa.table({
        "user_id": agg["user_id"], "hour": agg["hour"],
        "n_events": agg["n_events"],
        "total_value": pc.divide(pc.cast(agg["total_value_s"], pa.float64()),
                                 100.0)})


def _q_orders_by_segment(sf_dir: str):
    """Broadcast join (small customer side via ray.put + vectorized
    pc.index_in/take lookup per batch) feeding a grouped aggregate.

    total_price sums integer-scaled cents (exact, association-independent —
    VERDICT r1 #2); the oracle scales identically."""
    import pyarrow.compute as pc
    import ray

    from setsketch_ray.functions.relational import grouped_aggregate

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust_tbl = pa.concat_tables(list(
        cust.iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    ref = ray.put(cust_tbl)

    class AddSegment:
        def __init__(self, r):
            import ray as _r

            tbl = _r.get(r)
            self.keys = tbl["c_custkey"].combine_chunks()
            self.segs = tbl["c_mktsegment"].combine_chunks()

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["o_custkey"], value_set=self.keys)
            seg = pc.take(self.segs, idx)
            out = t.append_column("c_mktsegment", seg)
            price_s = pc.round(pc.multiply(t["o_totalprice"],
                                           pa.scalar(100.0))).cast(pa.int64())
            return out.append_column("price_s", price_s)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    from setsketch_ray.functions.knn import _pool_size

    joined = orders.map_batches(AddSegment, fn_constructor_args=(ref,),
                                batch_format="pyarrow",
                                concurrency=_pool_size())
    agg = grouped_aggregate(joined, ["c_mktsegment"], {
        "n_orders": ("count", None), "total_price_s": ("sum", "price_s")})
    return pa.table({
        "c_mktsegment": agg["c_mktsegment"],
        "n_orders": agg["n_orders"],
        "total_price": pc.divide(pc.cast(agg["total_price_s"], pa.float64()),
                                 100.0),
    })


def _q_lineitem_orders_join(sf_dir: str):
    """Large-large equi-join (task-based lookup_join co-partition; orders is
    unique on o_orderkey) + grouped aggregate."""
    from setsketch_ray.functions.relational import grouped_aggregate, \
        lookup_join

    import pyarrow.dataset as pads

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"],
               predicate=pads.field("l_quantity") > 45)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = lookup_join(
        li, orders, "l_orderkey", "o_orderkey", num_partitions=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_quantity", pa.float64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderpriority", pa.string())]))
    return grouped_aggregate(joined, ["o_orderpriority"],
                             {"n_items": ("count", None)})


def _q_asof_last_order(sf_dir: str):
    """Backward as-of join: each event picks the customer's most recent order
    at or before the event timestamp (ties on o_orderdate broken by greatest
    o_orderkey — pinned on both sides; naked DuckDB ASOF JOIN is
    nondeterministic under ties).  Ray Data has no as-of join; this is the
    engine's tagged hash co-partition + one vectorized lexsort/cumsum-rank
    merge per partition (functions/relational.asof_join)."""
    from setsketch_ray.functions.relational import asof_join

    events = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def ren(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["o_orderkey", "user_id", "o_orderdate", "o_totalprice"])

    orders = orders.map_batches(ren, batch_format="pyarrow")
    return asof_join(
        events, orders, on="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
        tie_col="o_orderkey", how="inner",
        left_schema=pa.schema([("event_id", pa.int64()),
                               ("ts", pa.timestamp("us")),
                               ("user_id", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("user_id", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_totalprice", pa.float64())]))


def _q_events_prev_24h(sf_dir: str):
    """Self range join with aggregation push-down: per event, count + cent-sum
    of the SAME user's events in the trailing 24 h window [ts-24h, ts).
    The pairs are never materialized (prefix-difference merge,
    functions/relational.range_join_aggregate) — at a dense window the
    exploded join is O(pairs), this stays O(rows log rows) per partition."""
    from setsketch_ray.functions.relational import range_join_aggregate

    left = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    right = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def scale(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "user_id": t["user_id"], "ts": t["ts"],
            "value_c": pc.round(pc.multiply(t["value"], pa.scalar(100.0)))
                         .cast(pa.int64())})

    right = right.map_batches(scale, batch_format="pyarrow")
    hour_us = 3_600_000_000
    return range_join_aggregate(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        window=(-24 * hour_us, 0),
        aggs={"n_prev": ("count", None),
              "prev_value_cents": ("sum", "value_c")},
        how="left",
        left_schema=pa.schema([("event_id", pa.int64()),
                               ("ts", pa.timestamp("us")),
                               ("user_id", pa.int64())]),
        right_schema=pa.schema([("user_id", pa.int64()),
                                ("ts", pa.timestamp("us")),
                                ("value_c", pa.int64())]))


def _q_events_hopping(sf_dir: str):
    """Hopping-window aggregate (1 h windows, 15 min hop): each event lands
    in exactly 4 windows — vectorized np.repeat expansion + combiner-style
    grouped aggregate, no sort and no per-key state
    (functions/streaming.hopping_window_aggregate)."""
    from setsketch_ray.functions.streaming import hopping_window_aggregate

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    return hopping_window_aggregate(
        ds, key_col="user_id", ts_col="ts",
        window_us=3_600_000_000, hop_us=900_000_000,
        value_col="value", value_scale=100)


def _q_events_hopping_distinct(sf_dir: str):
    """Distinct users per hopping window (1 h / 15 min) — windowed COUNT
    DISTINCT, the streaming-analytics classic: constant-factor np.repeat
    window expansion (each event lands in exactly 4 windows), then the
    exact pair-hash-partitioned grouped_count_distinct; only distinct
    (window, user) pairs cross the shuffle."""
    import numpy as np

    from setsketch_ray.functions.relational import grouped_count_distinct

    window_us, hop_us = 3_600_000_000, 900_000_000
    k = window_us // hop_us

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        s0 = ts // hop_us * hop_us
        idx = np.repeat(np.arange(n), k)
        offs = np.tile(np.arange(k, dtype=np.int64) * hop_us, n)
        return pa.table({
            "window_start": pa.array(np.repeat(s0, k) - offs, pa.int64())
            .cast(pa.timestamp("us")),
            "user_id": t["user_id"].take(pa.array(idx, pa.int64()))})

    ds = _read(sf_dir, "events", ["user_id", "ts"]) \
        .map_batches(expand, batch_format="pyarrow")
    agg = grouped_count_distinct(ds, "window_start", "user_id")
    return pa.table({"window_start": agg["window_start"],
                     "n_users": agg["n_distinct"].cast(pa.int64())})


def _q_parts_never_ordered(sf_dir: str):
    """Distributed ANTI join: parts that no high-quantity lineitem references
    (functions/relational.semi_anti_join — right side ships only its pruned
    key column, merge is one pc.is_in per partition)."""
    from setsketch_ray.functions.relational import semi_anti_join

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    import pyarrow.dataset as pads

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"],
               predicate=pads.field("l_quantity") > 48) \
        .select_columns(["l_partkey"])
    return semi_anti_join(
        part, li, "p_partkey", "l_partkey", mode="anti",
        left_schema=pa.schema([("p_partkey", pa.int64()),
                               ("p_name", pa.string())]))


def _q_parts_hot_ordered(sf_dir: str):
    """Distributed SEMI join: parts referenced by at least one high-quantity
    lineitem (same machinery as the anti query)."""
    from setsketch_ray.functions.relational import semi_anti_join

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    import pyarrow.dataset as pads

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"],
               predicate=pads.field("l_quantity") > 48) \
        .select_columns(["l_partkey"])
    return semi_anti_join(
        part, li, "p_partkey", "l_partkey", mode="semi",
        left_schema=pa.schema([("p_partkey", pa.int64()),
                               ("p_name", pa.string())]))


def _q_events_running_total(sf_dir: str):
    """Per-user running total (SUM OVER window): hash-partition + one
    lexsort + cumsum with per-key offsets (functions/streaming.running_sum);
    cent-scaled so parallel association cannot flip the hash."""
    from setsketch_ray.functions.streaming import running_sum

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = running_sum(ds, key_col="user_id", ts_col="ts",
                      value_col="value", order_tiebreak="event_id",
                      value_scale=100)
    return out.select_columns(["event_id", "user_id", "ts", "running_c"])


def _q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: 3-table join (customer semi-filter -> orders ->
    lineitem lookup_join), revenue = sum(extendedprice*(1-discount)) on the
    1e-4-scaled integer domain (floor(x*1e4+0.5) both sides — IEEE-identical
    per row, association-free sum), top 10 orders by revenue with l_orderkey
    pinning ties."""
    import numpy as np
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join,
                                                    semi_anti_join)

    from datetime import datetime

    import pyarrow.dataset as pads

    cutoff = pa.scalar(datetime(1998, 1, 1), pa.timestamp("us"))
    # predicates pushed into the parquet fragment scan (row-group pruning
    # at 100 TB); value-identical to the former post-read filters
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"],
                 predicate=pads.field("c_mktsegment") == "BUILDING")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"],
                   predicate=pads.field("o_orderdate") < cutoff)
    orders_b = semi_anti_join(
        orders, cust, "o_custkey", "c_custkey", mode="semi",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64()),
                               ("o_orderdate", pa.timestamp("us"))]))
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate"],
               predicate=pads.field("l_shipdate") > cutoff)
    joined = lookup_join(
        li, orders_b, "l_orderkey", "o_orderkey", num_partitions=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]))

    def rev(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        c = np.floor(x * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "o_orderdate": t["o_orderdate"],
                         "rev_c": pa.array(c, pa.int64())})

    agg = grouped_aggregate(joined.map_batches(rev, batch_format="pyarrow"),
                            ["l_orderkey", "o_orderdate"],
                            {"revenue_c": ("sum", "rev_c")})
    order = pc.sort_indices(agg, sort_keys=[("revenue_c", "descending"),
                                            ("l_orderkey", "ascending")])
    return agg.take(order[:10]).select(
        ["l_orderkey", "o_orderdate", "revenue_c"])


def _q_orders_customers_full(sf_dir: str):
    """FULL OUTER join: big orders (o_totalprice > 250000) x rich customers
    (c_acctbal > 5000) — both sides contribute unmatched rows
    (functions/relational.lookup_join how='full'; right-only rows appended
    per partition with null left columns, right key kept)."""
    from setsketch_ray.functions.relational import lookup_join

    import pyarrow.dataset as pads

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"],
                   predicate=pads.field("o_totalprice") > 250000) \
        .select_columns(["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"],
                 predicate=pads.field("c_acctbal") > 5000) \
        .select_columns(["c_custkey"])
    return lookup_join(
        orders, cust, "o_custkey", "c_custkey", how="full",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64())]))


def _q_lineitem_rollup(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): one distributed pass at
    the finest level, coarser prefixes + grand total re-combined from the
    tiny finest table (functions/relational.rollup_aggregate); qty summed
    cent-scaled (exact, association-free)."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import rollup_aggregate

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])

    def scaled(t: pa.Table) -> pa.Table:
        q = pc.round(pc.multiply(t["l_quantity"], pa.scalar(100.0))) \
            .cast(pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "l_linestatus": t["l_linestatus"], "qty_s": q})

    return rollup_aggregate(
        ds.map_batches(scaled, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {"sum_qty_s": ("sum", "qty_s"), "n_items": ("count", None)})


def _q_orders_cube(sf_dir: str):
    """GROUP BY CUBE(o_orderstatus, o_orderpriority): all four grouping
    sets from one distributed finest pass
    (functions/relational.cube_aggregate); totalprice summed cent-scaled."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import cube_aggregate

    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def scaled(t: pa.Table) -> pa.Table:
        p = pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))) \
            .cast(pa.int64())
        return pa.table({"o_orderstatus": t["o_orderstatus"],
                         "o_orderpriority": t["o_orderpriority"],
                         "price_s": p})

    return cube_aggregate(
        ds.map_batches(scaled, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        {"sum_price_s": ("sum", "price_s"), "n_orders": ("count", None)})


def _q_lineitem_left_join(sf_dir: str):
    """LEFT OUTER lookup join: every lineitem keeps its row, priority of
    big orders (o_totalprice > 250000) attached, null elsewhere — the
    unmatched gather rides the same pc.index_in null index
    (functions/relational.lookup_join how='left')."""
    from setsketch_ray.functions.relational import lookup_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    import pyarrow.dataset as pads

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_totalprice", "o_orderpriority"],
                   predicate=pads.field("o_totalprice") > 250000) \
        .select_columns(["o_orderkey", "o_orderpriority"])
    return lookup_join(
        li, orders, "l_orderkey", "o_orderkey", how="left",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_linenumber", pa.int32())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderpriority", pa.string())]))


def _q_parts_never_ordered_bloom(sf_dir: str):
    """Same anti join as parts_never_ordered, through the Bloom pre-filter
    path (functions/relational.bloom_anti_join): right blocks ship n_bits/8-
    byte partial bitmaps, bloom-negative left rows bypass the shuffle
    entirely, bloom-positives get the exact confirm — result EXACT, same
    oracle."""
    from setsketch_ray.functions.relational import bloom_anti_join

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    import pyarrow.dataset as pads

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"],
               predicate=pads.field("l_quantity") > 48) \
        .select_columns(["l_partkey"])
    return bloom_anti_join(
        part, li, "p_partkey", "l_partkey", n_bits=1 << 18,
        left_schema=pa.schema([("p_partkey", pa.int64()),
                               ("p_name", pa.string())]))


def _q_heavy_users(sf_dir: str):
    """Exact top-20 users by event count via the two-pass Misra-Gries
    sweep + candidate recount (functions/relational.heavy_hitters) — the
    100 TB shape for frequency ranking over domains too large to shuffle;
    certification bound delta = 0 here (k >= distinct users)."""
    from setsketch_ray.functions.relational import heavy_hitters

    ds = _read(sf_dir, "events", ["user_id"])
    return heavy_hitters(ds, "user_id", top_n=20, k=4096)


def _q_lineitem_unpivot(sf_dir: str):
    """Wide -> long (UNPIVOT): per-batch constant-factor expansion, values
    verbatim copies, no shuffle (functions/relational.unpivot)."""
    from setsketch_ray.functions.relational import unpivot

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax"])
    return unpivot(ds, ["l_orderkey", "l_linenumber"],
                   ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])


def _q_events_rank(sf_dir: str):
    """Per-user ROW_NUMBER + PERCENT_RANK window: hash-partition + one
    lexsort + per-key index offsets (functions/streaming.window_rank);
    percent_rank is one float64 division of identical integer operands on
    both engines; event_id pins order at equal ts."""
    from setsketch_ray.functions.streaming import window_rank

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    out = window_rank(ds, key_col="user_id", ts_col="ts",
                      order_tiebreak="event_id")
    return out.select_columns(
        ["event_id", "user_id", "row_number", "percent_rank"])


def _q_events_dense_rank(sf_dir: str):
    """Per-user DENSE_RANK over the cents value + FIRST_VALUE over time
    (functions/streaming.dense_rank_first_value): two lexsorts per key
    partition, inverse-permutation scatter, no extra shuffle."""
    from setsketch_ray.functions.streaming import dense_rank_first_value

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = dense_rank_first_value(ds, "user_id", "ts", "event_id", "value")
    return out.select_columns(["event_id", "dense_rank", "first_value_c"])


def _q_events_ntile(sf_dir: str):
    """Per-type NTILE(4) over value (functions/streaming.window_ntile): one
    lexsort per key-partition + pure integer tile arithmetic (the SQL
    bucketing rule — first c%n tiles take one extra row); event_id pins the
    total order so tiles are deterministic at equal values."""
    from setsketch_ray.functions.streaming import window_ntile

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    out = window_ntile(ds, key_col="event_type", order_col="value",
                       order_tiebreak="event_id", n_tiles=4)
    return out.select_columns(["event_id", "tile"])


def _q_mode_action_per_user(sf_dir: str):
    """Per-user most frequent event_type with deterministic tie-break
    (count desc, value asc) — functions/relational.grouped_mode: per-batch
    count partials, key-hash co-partition, one combine + first-of-run pass;
    only distinct (key, value, cnt) triples cross the shuffle."""
    from setsketch_ray.functions.relational import grouped_mode

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return grouped_mode(ds, "user_id", "event_type")


def _q_top_words(sf_dir: str):
    """Corpus top-100 words (split on single spaces, empties dropped):
    explode + per-batch local counts, word-hash shuffle of (word, cnt)
    pairs only, per-partition top-k, driver merge of <= k x parts rows
    (functions/text.word_topk).  Exact under the (cnt desc, word asc)
    total order."""
    from setsketch_ray.functions.text import word_topk

    ds = _read(sf_dir, "documents", ["text"])
    return word_topk(ds, "text", k=100)


def _q_small_quantity_revenue(sf_dir: str):
    """TPC-H Q17 shape (correlated avg-subquery, decorrelated into a grouped
    aggregate + lookup_join): revenue of lineitems whose quantity is below
    20% of their part's average quantity, by returnflag.  The threshold
    compare runs as a PURE INTEGER inequality on both engines —
    ``qty_c * 5 * cnt < sum_qty_c`` is exactly ``qty < 0.2 * avg`` with no
    float division to flip hashes."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join)

    def scaled(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["l_partkey"],
            "l_returnflag": t["l_returnflag"],
            "qty_c": pc.round(pc.multiply(t["l_quantity"], 100.0))
            .cast(pa.int64()),
            "price_c": pc.round(pc.multiply(t["l_extendedprice"], 100.0))
            .cast(pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_returnflag", "l_quantity",
                "l_extendedprice"]) \
        .map_batches(scaled, batch_format="pyarrow")
    stats = grouped_aggregate(li, ["l_partkey"], {
        "cnt": ("count", None),
        "sum_qty_c": ("sum", "qty_c"),
    }, final="ray").map_batches(
        lambda t: pa.table({"pk": t["l_partkey"],
                            "cnt": t["cnt"].cast(pa.int64()),
                            "sum_qty_c": t["sum_qty_c"].cast(pa.int64())}),
        batch_format="pyarrow")
    joined = lookup_join(
        li, stats, "l_partkey", "pk",
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_returnflag", pa.string()),
                               ("qty_c", pa.int64()),
                               ("price_c", pa.int64())]),
        right_schema=pa.schema([("pk", pa.int64()), ("cnt", pa.int64()),
                                ("sum_qty_c", pa.int64())]))
    small = joined.map_batches(
        lambda t: t.filter(pc.less(
            pc.multiply(pc.multiply(t["qty_c"], pa.scalar(5, pa.int64())),
                        t["cnt"]), t["sum_qty_c"])),
        batch_format="pyarrow")
    agg = grouped_aggregate(small, ["l_returnflag"], {
        "revenue_c": ("sum", "price_c"),
        "n": ("count", None),
    })
    return pa.table({"l_returnflag": agg["l_returnflag"],
                     "revenue_c": agg["revenue_c"].cast(pa.int64()),
                     "n": agg["n"].cast(pa.int64())})


def _q_funnel_view_click_purchase(sf_dir: str):
    """Ordered funnel (view -> click -> purchase, each strictly after the
    previous step's EARLIEST qualifying event — the unique greedy anchor, so
    no tiebreak needed): functions/streaming.funnel_users, one lexsort +
    one np.minimum.at pass per step per key partition."""
    from setsketch_ray.functions.streaming import funnel_users

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return funnel_users(ds, "user_id", "ts", "event_type",
                        ["view", "click", "purchase"])


def _q_approx_key_overlap(sf_dir: str):
    """Sketch-based overlap of orders.o_custkey vs customer.c_custkey
    distinct key sets (aggregates.approx_key_overlap): one GHLL union per
    side, the paper's joint ML estimator (E4) on the register pair.
    ORACLED as invariant rows: the exact per-side/intersection/union
    distinct counts (distributed count_distinct + set_op intersect) must
    match DuckDB bit-for-bit, and ``est_ok`` flips to 0 if any of the four
    deterministic sketch estimates drifts past 6% of its exact value
    (measured <=0.5%; accuracy also asserted in
    tests/test_functions.py::test_approx_key_overlap_accuracy)."""
    from setsketch_ray.aggregates import approx_key_overlap
    from setsketch_ray.functions.relational import count_distinct, set_op

    orders = _read(sf_dir, "orders", ["o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    res = approx_key_overlap(orders, "o_custkey", cust, "c_custkey")
    exact_a = count_distinct(orders, "o_custkey")
    exact_b = count_distinct(cust, "c_custkey")
    inter = set_op(orders.select_columns(["o_custkey"]),
                   cust.rename_columns({"c_custkey": "o_custkey"}),
                   ["o_custkey"], op="intersect")
    exact_i = inter.count()
    exact_u = exact_a + exact_b - exact_i
    pairs = [(res["card_left"], exact_a), (res["card_right"], exact_b),
             (res["intersection"], exact_i), (res["union"], exact_u)]
    ok = int(all(abs(est / ex - 1.0) <= 0.06 for est, ex in pairs))
    return pa.table({
        "exact_card_left": pa.array([exact_a], pa.int64()),
        "exact_card_right": pa.array([exact_b], pa.int64()),
        "exact_intersection": pa.array([exact_i], pa.int64()),
        "exact_union": pa.array([exact_u], pa.int64()),
        "est_ok": pa.array([ok], pa.int64())})


def _q_events_debounce(sf_dir: str):
    """Event debouncing (functions/streaming.debounce — the
    stream-curation step collapsing repeat-fire events): drop an event
    whose previous (user_id, event_type) occurrence is within 1 hour,
    plain LAG semantics.  One composite-key hash exchange, one vectorized
    lexsort + shifted compare per partition; group identity compares the
    real key columns, never a 64-bit hash.  ORACLED EXACTLY: the SQL
    lag() window filter with the identical (ts, event_id) tiebreak."""
    from setsketch_ray.functions.streaming import debounce

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "event_type", "ts"])
    out = debounce(ev, ["user_id", "event_type"], "ts", "event_id",
                   window_seconds=3600.0)
    return out.sort("event_id")


def _q_events_mad_by_type(sf_dir: str):
    """Per-group median + MAD (functions/relational.grouped_mad_fixedpoint
    — the robust dispersion statistic for skewed distributions, composed
    from two exact grouped-quantile passes over distinct (group, value)
    counts; medians broadcast into a vectorized |v - median| map between
    them).  ORACLED EXACTLY: integer cents end-to-end, quantile_disc rule
    on both engines."""
    from setsketch_ray.functions.relational import grouped_mad_fixedpoint

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_mad_fixedpoint(ev, "event_type", "value", scale=100)


def _q_word_cooccurrence(sf_dir: str):
    """Collocation mining (functions/text.word_cooccurrence): top-20 word
    pairs by distinct-document co-occurrence over the exact top-64
    vocabulary.  The co-occurrence matrix is computed as the Gram matrix
    of the binary doc x vocab membership matrix — one V x V int64 matmul
    partial per block, V(V+1)/2 slim rows through a combiner tree; tokens
    never shuffle, the pair space never explodes.  ORACLED EXACTLY:
    integer counts, deterministic (n_docs desc, word_a, word_b) top-k on
    both engines."""
    from setsketch_ray.functions.text import word_cooccurrence

    ds = _read(sf_dir, "documents", ["text"])
    return word_cooccurrence(ds, "text", vocab_size=64, k=20)


def _q_embedding_gram(sf_dir: str):
    """Distributed EXACT Gram matrix of the embeddings table
    (functions/knn.embedding_gram) — the covariance/PCA sufficient
    statistic: per-block int64 matmuls over floor(x*1e6+0.5)-fixed
    elements, upper-triangle (i, j, sumprod_c) partials through one
    combiner-tree grouped sum; the vectors never shuffle.  Diagonal rows
    carry the per-dimension sums and the (0,0) row the count, so
    cov = G/n - mean mean^T reconstructs downstream.  ORACLED EXACTLY:
    integer arithmetic end-to-end (the rounding is the repo's oracle
    convention, identical float tree both engines; sums < 2^63)."""
    from setsketch_ray.functions.knn import embedding_gram

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_gram(ds, "embedding").sort_by(
        [("i", "ascending"), ("j", "ascending")])


def _q_fuzzy_name_pairs(sf_dir: str):
    """Exact edit-distance<=1 pair discovery over distinct supplier names
    (functions/fuzzy.edit_distance_pairs — deletion-variant blocking, the
    SymSpell / Mor-Fraenkel single-error dictionary method): variants give
    EXACT d<=1 recall without all-pairs comparison; candidates verify with
    a vectorized padded-byte-matrix distance check.  The (variant, value)
    exchange is vocabulary-sized, not corpus-sized.  ORACLED EXACTLY: the
    DuckDB self-join on levenshtein(a,b) <= 1 over distinct names (ASCII
    contract: byte distance == character distance)."""
    from setsketch_ray.functions.fuzzy import edit_distance_pairs

    ds = _read(sf_dir, "supplier", ["s_name"])
    return edit_distance_pairs(ds, "s_name").sort(
        ["value_a", "value_b"])


def _q_theta_setops_orders(sf_dir: str):
    """KMV/theta sketch set algebra (sketchlib/theta.py, Beyer et al. 2007
    / DataSketches theta shape; aggregates.theta_key_setops): union,
    intersection AND both directional differences of the returned ('R')
    vs available ('A') order-key sets — difference is the quantity the
    register-based
    joint estimator cannot expose.  Two map-side bottom-k folds (<=32 KB
    partials, exactly mergeable in any tree order), data never shuffles.
    ORACLED as invariant rows: the exact distinct counts (distributed
    count_distinct + set_op intersect) match DuckDB bit-for-bit;
    ``est_ok`` flips to 0 if any of the six deterministic estimates
    drifts past 10% of its exact value (measured <=4.7% at k=4096 at
    every sf; exact below k by construction)."""
    import pyarrow.dataset as pads

    from setsketch_ray.aggregates import theta_key_setops
    from setsketch_ray.functions.relational import count_distinct, set_op

    A = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"],
              predicate=pads.field("l_returnflag") == "R") \
        .select_columns(["l_orderkey"])
    B = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"],
              predicate=pads.field("l_returnflag") == "A") \
        .select_columns(["l_orderkey"])
    res = theta_key_setops(A, "l_orderkey", B, "l_orderkey", k=4096)
    exact_a = count_distinct(A, "l_orderkey")
    exact_b = count_distinct(B, "l_orderkey")
    exact_i = set_op(A.select_columns(["l_orderkey"]),
                     B.select_columns(["l_orderkey"]),
                     ["l_orderkey"], op="intersect").count()
    exact = {"card_left": exact_a, "card_right": exact_b,
             "union": exact_a + exact_b - exact_i,
             "intersection": exact_i,
             "diff_left": exact_a - exact_i,
             "diff_right": exact_b - exact_i}
    ok = int(all(abs(res[kk] / exact[kk] - 1.0) <= 0.10 for kk in exact))
    return pa.table({
        "exact_card_left": pa.array([exact_a], pa.int64()),
        "exact_card_right": pa.array([exact_b], pa.int64()),
        "exact_union": pa.array([exact["union"]], pa.int64()),
        "exact_intersection": pa.array([exact_i], pa.int64()),
        "exact_diff_left": pa.array([exact["diff_left"]], pa.int64()),
        "exact_diff_right": pa.array([exact["diff_right"]], pa.int64()),
        "est_ok": pa.array([ok], pa.int64())})


def _q_docs_regex_by_lang(sf_dir: str):
    """Regex-filtered doc counts per language: one RE2
    ``match_substring_regex`` kernel per batch (DuckDB's regexp_matches is
    also RE2 — identical match semantics), then a partial+final grouped
    count."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate

    pattern = r"(fast|slow) (join|merge)"

    def flt(t: pa.Table) -> pa.Table:
        txt = t["text"]
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) \
            else txt
        return t.filter(pc.match_substring_regex(txt, pattern))

    ds = _read(sf_dir, "documents", ["lang", "text"]) \
        .map_batches(flt, batch_format="pyarrow")
    agg = grouped_aggregate(ds, ["lang"], {"n": ("count", None)})
    return pa.table({"lang": agg["lang"], "n": agg["n"].cast(pa.int64())})


def _q_weekly_retention(sf_dir: str):
    """Weekly cohort retention (active users per epoch week + how many
    return the following week): per-batch (user, week) dedup partials,
    user-hash co-partition, one np.unique + adjacent-difference pass
    (functions/streaming.weekly_retention); only distinct pairs shuffle."""
    from setsketch_ray.functions.streaming import weekly_retention

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return weekly_retention(ds, "user_id", "ts")


def _q_value_variance_by_type(sf_dir: str):
    """Distributed population variance/stddev per event_type from integer
    sufficient statistics (n, sum_c, sumsq_c — cents domain, associativity
    -proof), finished with an IDENTICAL float expression tree on both
    engines: msq = sumsq/n, mean = sum/n, var = msq - mean*mean, std =
    sqrt(var).  All integers stay < 2^53 so the int->double conversions are
    exact (DuckDB's HUGEINT->DOUBLE cast is NOT correctly rounded — tested;
    that is why the oracle casts the BIGINT sums, never HUGEINT products)."""
    import numpy as np
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate

    def scaled(t: pa.Table) -> pa.Table:
        vc = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64())
        return pa.table({"event_type": t["event_type"], "vc": vc,
                         "vsq": pc.multiply(vc, vc)})

    ds = _read(sf_dir, "events", ["event_type", "value"]) \
        .map_batches(scaled, batch_format="pyarrow")
    agg = grouped_aggregate(ds, ["event_type"], {
        "n": ("count", None),
        "sum_c": ("sum", "vc"),
        "sumsq_c": ("sum", "vsq"),
    })
    n = agg["n"].cast(pa.int64()).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    s = agg["sum_c"].cast(pa.int64()).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    sq = agg["sumsq_c"].cast(pa.int64()).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    mean_c = s / n
    msq_c = sq / n
    var_c2 = msq_c - mean_c * mean_c
    return pa.table({
        "event_type": agg["event_type"],
        "n": agg["n"].cast(pa.int64()),
        "mean_c": pa.array(mean_c, pa.float64()),
        "var_c2": pa.array(var_c2, pa.float64()),
        "std_c": pa.array(np.sqrt(var_c2), pa.float64())})


def _q_value_hour_corr_by_type(sf_dir: str):
    """Distributed Pearson correlation (value cents x hour-of-day) per
    event_type from FIVE integer sufficient statistics (n, sx, sy, sxy,
    sxx, syy — all associativity-proof int64 sums < 2^53), finished with an
    identical float expression tree on both engines (same technique as
    value_variance_by_type)."""
    import numpy as np
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate

    def stats(t: pa.Table) -> pa.Table:
        x = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64())
        y = pc.hour(t["ts"]).cast(pa.int64())
        return pa.table({"event_type": t["event_type"], "x": x, "y": y,
                         "xy": pc.multiply(x, y),
                         "xx": pc.multiply(x, x),
                         "yy": pc.multiply(y, y)})

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"]) \
        .map_batches(stats, batch_format="pyarrow")
    agg = grouped_aggregate(ds, ["event_type"], {
        "n": ("count", None), "sx": ("sum", "x"), "sy": ("sum", "y"),
        "sxy": ("sum", "xy"), "sxx": ("sum", "xx"), "syy": ("sum", "yy"),
    })

    def f(col):
        return agg[col].cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.float64)

    n, sx, sy = f("n"), f("sx"), f("sy")
    mx, my = sx / n, sy / n
    cov = f("sxy") / n - mx * my
    vx = f("sxx") / n - mx * mx
    vy = f("syy") / n - my * my
    corr = cov / np.sqrt(vx * vy)
    return pa.table({"event_type": agg["event_type"],
                     "n": agg["n"].cast(pa.int64()),
                     "corr_value_hour": pa.array(corr, pa.float64())})


def _q_value_histogram(sf_dir: str):
    """Fixed-width value histogram per event_type (width_bucket shape):
    bucket = cents // 1000 — pure integer floor division on both engines,
    then a partial+final grouped count."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate

    def bucketize(t: pa.Table) -> pa.Table:
        import numpy as np

        vc = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "bucket": pa.array(vc // 1000, pa.int64())})

    ds = _read(sf_dir, "events", ["event_type", "value"]) \
        .map_batches(bucketize, batch_format="pyarrow")
    agg = grouped_aggregate(ds, ["event_type", "bucket"],
                            {"n": ("count", None)})
    return pa.table({"event_type": agg["event_type"],
                     "bucket": agg["bucket"],
                     "n": agg["n"].cast(pa.int64())})


def _q_distinctive_terms(sf_dir: str):
    """Most distinctive term per document (integer-only TF-IDF surrogate:
    tf desc, df asc, term asc — functions/text.distinctive_terms): explode
    with complete per-batch tf, word-hash co-partition computes AND attaches
    df in one pass, doc-hash co-partition takes the top term with one
    multi-key Arrow sort.  Only (doc, word, tf, df) tuples shuffle."""
    from setsketch_ray.functions.text import distinctive_terms

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return distinctive_terms(ds, "doc_id", "text")


def _q_events_pivot(sf_dir: str):
    """Pivot per user: count per event_type as wide columns (conditional
    aggregation — functions/relational.pivot_aggregate; one-hot expansion
    partial, shuffle volume one row per (block, user))."""
    from setsketch_ray.functions.relational import pivot_aggregate

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return pivot_aggregate(
        ds, "user_id", "event_type",
        ["click", "view", "purchase", "signup", "error"])


def _q_props_k_stats(sf_dir: str):
    """JSON field extraction at scale: events.props is a JSON string
    ({"k": N}); one vectorized RE2 pc.extract_regex per batch pulls the
    integer field (no per-row json.loads), then combiner-partial grouped
    sum/max — oracle uses DuckDB's native json_extract on the same field."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        s = t["props"].combine_chunks() if \
            isinstance(t["props"], pa.ChunkedArray) else t["props"]
        m = pc.extract_regex(s, r'"k":\s*(?P<k>\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    return grouped_aggregate(
        ds.map_batches(extract, batch_format="pyarrow"), ["event_type"],
        {"sum_k": ("sum", "k"), "max_k": ("max", "k"),
         "n": ("count", None)})


def _q_user_event_paths(sf_dir: str):
    """Per-user ordered action path: string_agg(event_type ORDER BY ts,
    event_id) via one lexsort + one pc.binary_join over key-run list
    offsets (functions/relational.grouped_string_agg) — no per-group
    Python."""
    from setsketch_ray.functions.relational import grouped_string_agg

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return grouped_string_agg(ds, "user_id", "event_type", "ts",
                              "event_id", sep=",")


def _q_repeat_actions(sf_dir: str):
    """Multi-column INTERSECT: (user, event_type) pairs active BOTH before
    and after 2024-01-16 (functions/relational.set_op — per-batch dedup
    combiner, combined-column-hash co-partition, per-side presence flags;
    shuffle volume = distinct tuples per block)."""
    import pyarrow.compute as pc
    from datetime import datetime

    from setsketch_ray.functions.relational import set_op

    cutoff = pa.scalar(datetime(2024, 1, 16), pa.timestamp("us"))
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    before = ds.map_batches(
        lambda t: t.filter(pc.less(t["ts"], cutoff)).select(
            ["user_id", "event_type"]), batch_format="pyarrow")
    after = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["ts"], cutoff)).select(
            ["user_id", "event_type"]), batch_format="pyarrow")
    return set_op(before, after, ["user_id", "event_type"], op="intersect")


def _q_dropped_actions(sf_dir: str):
    """Multi-column EXCEPT: (user, event_type) pairs active before
    2024-01-28 but never after (same machinery as repeat_actions,
    op='except')."""
    import pyarrow.compute as pc
    from datetime import datetime

    from setsketch_ray.functions.relational import set_op

    cutoff = pa.scalar(datetime(2024, 1, 28), pa.timestamp("us"))
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    before = ds.map_batches(
        lambda t: t.filter(pc.less(t["ts"], cutoff)).select(
            ["user_id", "event_type"]), batch_format="pyarrow")
    after = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["ts"], cutoff)).select(
            ["user_id", "event_type"]), batch_format="pyarrow")
    return set_op(before, after, ["user_id", "event_type"], op="except")


def _q_events_rolling_10(sf_dir: str):
    """Per-user moving sum over the last 10 rows (ROWS BETWEEN 9 PRECEDING):
    hash-partition + one lexsort + cumsum DIFFERENCE with per-key window
    clamps (functions/streaming.rolling_sum); cent-scaled so parallel
    association cannot flip the hash."""
    from setsketch_ray.functions.streaming import rolling_sum

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = rolling_sum(ds, key_col="user_id", ts_col="ts",
                      value_col="value", order_tiebreak="event_id",
                      window_rows=9, value_scale=100)
    return out.select_columns(["event_id", "user_id", "rolling_c"])


def _q_events_lag_lead(sf_dir: str):
    """Per-user LAG/LEAD window: hash-partition + one lexsort + two masked
    shifts (functions/streaming.lag_lead); pure value copies so floats
    round-trip bit-exactly; event_id pins order at equal ts."""
    from setsketch_ray.functions.streaming import lag_lead

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = lag_lead(ds, key_col="user_id", ts_col="ts", value_col="value",
                   order_tiebreak="event_id")
    return out.select_columns(
        ["event_id", "user_id", "prev_value", "next_value"])


def _q_distinct_users_by_type(sf_dir: str):
    """Exact per-group COUNT(DISTINCT): per-batch pair dedup combiner ->
    pair-hash co-partition (no hot key: one key's values spread across all
    partitions) -> disjoint partial counts -> sum
    (functions/relational.grouped_count_distinct)."""
    from setsketch_ray.functions.relational import grouped_count_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return grouped_count_distinct(ds, "event_type", "user_id")


def _q_approx_users_by_type(sf_dir: str):
    """Per-group approximate distinct via GHLL register rows (m bytes per
    key per block through the shuffle, never the data) checked against the
    exact distributed grouped COUNT(DISTINCT) in the same query.  ORACLED
    as invariant rows: exact per-group counts match DuckDB bit-for-bit;
    ``est_err_ok`` flips to 0 if the deterministic per-group estimate
    drifts past 6% relative error (expected RSD ~1.6% at m=4096)."""
    from setsketch_ray.aggregates import approx_distinct_by
    from setsketch_ray.functions.relational import grouped_count_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    est = {r["event_type"]: r["approx_n_distinct"]
           for r in approx_distinct_by(
               ds, "event_type", "user_id").take_all()}
    exact = grouped_count_distinct(ds, "event_type", "user_id")
    exact = exact.sort_by([("event_type", "ascending")])
    types = exact["event_type"].to_pylist()
    counts = exact["n_distinct"].to_pylist()
    ok = [int(abs(est[t] / n - 1.0) <= 0.06) for t, n in zip(types, counts)]
    return pa.table({"event_type": pa.array(types, pa.string()),
                     "exact_n_users": pa.array(counts, pa.int64()),
                     "est_err_ok": pa.array(ok, pa.int64())})


def _q_normalized_docs(sf_dir: str):
    """Stop-word removal + whitespace collapse, RE2 kernels on both sides
    (pyarrow.compute and DuckDB regexp_replace are both RE2 — bit-identical
    output; functions/text.normalize_text)."""
    from setsketch_ray.functions.text import normalize_text

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return normalize_text(ds).select_columns(["doc_id", "norm_text"])


def _q_dedup_keep_longest(sf_dir: str):
    """Normalized-text dedup keeping the BEST representative (longest
    original, ties to smallest doc_id) — the keep-best flavor real
    training-data dedup uses (vs exact_dedup_docs' keep-first):
    normalize (RE2, oracled), then ONE hash-partitioned lexsort+rank pass
    (functions/relational.top_k_per_group, k=1)."""
    from setsketch_ray.functions.relational import top_k_per_group
    from setsketch_ray.functions.text import normalize_text

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    norm = normalize_text(ds).select_columns(
        ["doc_id", "n_chars", "norm_text"])
    kept = top_k_per_group(norm, "norm_text", "n_chars", k=1,
                           tiebreak_col="doc_id")
    return kept.select_columns(["doc_id", "n_chars"])


def _q_lang_id(sf_dir: str):
    """Heuristic language ID (actor-pool stage).  Oracled: the trigram
    presence votes + first-max-wins argmax + CJK/empty overrides translate
    to CASE expressions over strpos() (both sides integer arithmetic)."""
    from setsketch_ray.functions.text import LangId

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(LangId(), batch_format="pyarrow").select_columns(
        ["doc_id", "lang_pred"])


def _q_scrub_pii(sf_dir: str):
    """PII scrubbing (functions/text.scrub_pii): URLs -> <URL>, emails ->
    <EMAIL>, >=6-digit runs -> <NUM>, plus per-doc match counts.  The
    plain-word corpus carries no PII, so the query plants deterministic
    synthetic PII (doc_id-derived email/URL/number appended to the text)
    with the IDENTICAL concat in the SQL oracle.  ORACLED exactly: Arrow
    and DuckDB regex kernels are both RE2 (non-overlapping leftmost), so
    scrubbed strings and counts match bit-for-bit."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.text import scrub_pii

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.string())
        aug = pc.binary_join_element_wise(
            t["text"], pc.binary_join_element_wise(
                "contact u", did, "@example.com via https://ex.org/d/",
                did, " ref 12345678", ""), " ")
        return pa.table({"doc_id": t["doc_id"], "text": aug})

    return scrub_pii(ds.map_batches(plant, batch_format="pyarrow")) \
        .sort("doc_id")


def _q_gopher_repetition(sf_dir: str):
    """Gopher/MassiveText repetition filters over documents
    (functions/text.repetition_scores): per doc the word count, the
    most-frequent-word occupancy and the duplicate-bigram occupancy, both
    as floor(x*1e6+0.5) ints.  ORACLED: word identity via the exact
    single-space split contract; the oracle rebuilds bigrams with a
    positional self-join and runs the IDENTICAL one-multiply-one-divide
    float expression."""
    from setsketch_ray.functions.text import repetition_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return repetition_scores(ds).sort("doc_id")


def _q_quality_scores(sf_dir: str):
    """Document quality features + score, integer-scaled to 1e-6 so the
    DuckDB oracle hash-matches: every feature is per-row rational arithmetic
    (IEEE-exact on both engines); the one libm call (exp in the word-length
    gaussian) is absorbed by the e6 scaling.  floor(x*1e6+0.5) on BOTH sides
    (pc.round / numpy round are half-even, DuckDB ROUND is half-away)."""
    from setsketch_ray.functions.text import QualityScore

    def scale(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        def e6(col):
            x = pc.multiply(t[col], 1000000.0)
            return pc.cast(pc.floor(pc.add(x, 0.5)), pa.int64())
        return pa.table({
            "doc_id": t["doc_id"],
            "alpha_ratio_e6": e6("alpha_ratio"),
            "stop_ratio_e6": e6("stop_ratio"),
            "repetition_ratio_e6": e6("repetition_ratio"),
            "quality_score_e6": e6("quality_score"),
        })

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(QualityScore(), batch_format="pyarrow") \
        .map_batches(scale, batch_format="pyarrow")


def _q_decontaminate(sf_dir: str):
    """Test-set decontamination: flag documents sharing any word 8-gram
    with the benchmark subset (doc_id % 13 == 0) — the GPT-3/Llama overlap
    rule.  Benchmark gram hashes broadcast once (ray.put), corpus side is a
    shuffle-free streaming filter; oracled exactly (the corpus is
    single-spaced so string_split(text, ' ') is the tokenizer both sides)."""
    from setsketch_ray.functions.text import ngram_contamination

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_contamination(ds, n=8, benchmark_mod=13)


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic dedup over the embeddings table: k-means
    clusters (broadcast Lloyd's), exact per-cluster count pass with
    similarity-split of oversized clusters, ONE (group, id, packed-f32)
    exchange, chunked-matmul greedy cosine prune at 0.3 (the sf tables are
    near-orthogonal — max cos ~0.51 — so only genuine near-pairs drop).

    ORACLED INVARIANT (r4): per row, ``ok=1`` iff the output is
    self-consistent — kept rows carry dup_of=-1; dropped rows point to an
    earlier (smaller-id) KEPT row in the same level-1 cluster whose true
    f64 cosine with them is >= the threshold.  Any greedy-order, split,
    exchange or packing bug yields ok=0 for some row and fails the hash
    against the all-ones oracle.  (k-means itself is not SQL-expressible;
    planted-duplicate recall is asserted in tests/test_functions.py.)"""
    from setsketch_ray.functions.dedup import semantic_dedup
    from setsketch_ray.functions.knn import _embedding_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = pa.concat_tables(list(
        semantic_dedup(ds, n_centroids=16, threshold=0.3)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    emb = pa.concat_tables(list(
        ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    eids = emb["vec_id"].to_numpy()
    m = _embedding_matrix(emb["embedding"])
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    pos = np.full(int(eids.max()) + 2, -1, np.int64)
    pos[eids] = np.arange(len(eids))

    ids = out["vec_id"].to_numpy()
    kept = np.asarray(out["kept"].to_pylist())
    dup_of = out["dup_of"].to_numpy()
    cluster = out["cluster"].to_numpy()
    kept_ids = set(ids[kept].tolist())
    cl_of = dict(zip(ids.tolist(), cluster.tolist()))

    ok = np.zeros(len(ids), np.int64)
    ok[kept & (dup_of == -1)] = 1
    drop = ~kept
    di = dup_of[drop]
    valid = (di >= 0) & (di < ids[drop])
    valid &= np.asarray([d in kept_ids and cl_of.get(d) == c
                         for d, c in zip(di.tolist(),
                                         cluster[drop].tolist())])
    cos = np.einsum("ij,ij->i", mn[pos[ids[drop]]], mn[pos[np.maximum(di, 0)]])
    valid &= cos >= 0.3 - 1e-9
    ok[np.nonzero(drop)[0][valid]] = 1
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "ok": pa.array(ok, pa.int64())})


def _q_corpus_curation(sf_dir: str):
    """End-to-end training-corpus curation composite: exact-dedup winners
    (one text-keyed shuffle, min doc_id), then LangId + QualityScore on the
    survivors only, then the keep filter (lang 'en', quality >= 0.7,
    100 <= n_chars <= 520).  Oracled by composing the SAME lang_id /
    quality_scores SQL fragments those stages are individually verified
    against, so the composite is exact by construction."""
    from setsketch_ray.functions.relational import grouped_aggregate
    from setsketch_ray.functions.text import LangId, QualityScore

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    winners = grouped_aggregate(ds, ["text"],
                                {"doc_id": ("min", "doc_id"),
                                 "n_chars": ("min", "n_chars")},
                                final="ray")
    scored = winners.map_batches(LangId(), batch_format="pyarrow") \
        .map_batches(QualityScore(), batch_format="pyarrow")

    def filt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        q = pc.cast(pc.floor(pc.add(pc.multiply(
            t["quality_score"], 1000000.0), 0.5)), pa.int64())
        mask = pc.and_(
            pc.and_(pc.equal(t["lang_pred"], "en"),
                    pc.greater_equal(q, 700000)),
            pc.and_(pc.greater_equal(t["n_chars"], 100),
                    pc.less_equal(t["n_chars"], 520)))
        out = pa.table({"doc_id": t["doc_id"], "lang_pred": t["lang_pred"],
                        "quality_score_e6": q, "n_chars": t["n_chars"]})
        return out.filter(mask)

    return scored.map_batches(filt, batch_format="pyarrow")


def _q_cardinality_eval(sf_dir: str):
    """Monte-Carlo cardinality-estimator evaluation (reduced
    cardinality_test).  ORACLED as invariant rows: one row per grid
    cardinality (the geometric grid is a pure function mirrored into the
    SQL VALUES list) whose ``rmse_ok`` flips to 0 if the measured RMSE
    exceeds 1.35x the paper's closed-form bound sqrt((3 ln 2 - 1)/m) in the
    plain-GHLL regime (>= 1000; the small range is near-exact linear
    counting, gated at the same absolute bound) and ``bias_ok`` flips past
    |bias| 0.02 (measured 0.007 max at 40 deterministic counter-hash
    trials).  A broken estimator, register kernel or hash stream turns
    grid rows red."""
    import math

    from setsketch_ray.pipelines.evaluation import cardinality_error_pipeline

    m = 1024
    tbl = cardinality_error_pipeline(family="ghll", m=m, n_trials=40,
                                     max_cardinality=20000, parallelism=8)
    bound = math.sqrt((3 * math.log(2) - 1) / m)
    card = tbl["cardinality"].to_numpy()
    rmse = tbl["rmse"].to_numpy()
    bias = np.abs(tbl["relative_bias"].to_numpy())
    order = np.argsort(card)
    return pa.table({
        "cardinality": pa.array(card[order].astype(np.int64)),
        "rmse_ok": pa.array((rmse[order] <= 1.35 * bound).astype(np.int64)),
        "bias_ok": pa.array((bias[order] <= 0.02).astype(np.int64))})


def _q_joint_eval(sf_dir: str):
    """Monte-Carlo joint-estimator evaluation: the reference's FULL grid —
    294 tuples (ratio sweep x intersection fractions x unions {10^6, 10^3},
    joint_estimation_test.cpp:48-102), composeSketch-composed operands
    (per-trial cost O(union), not O(tuples x union)), and the wide
    per-tuple Mean/MSE output over every estimator (new / corrected /
    incl-excl / deprecated / equal-register bounds).  ORACLED as invariant
    rows (constant SQL): the Monte-Carlo grid itself is not
    SQL-expressible, but its contract is — all 294 reference tuples come
    back (``n_tuples``), every estimator x quantity cell is finite
    (``finite_ok``), and the normalized Jaccard RMSE sqrt(MSE)*sqrt(m) of
    the headline joint-ML estimator stays inside the paper's band
    (``rmse_median_ok`` <= 1.0, measured 0.32-0.42; ``rmse_max_ok`` <= 50,
    measured 8.7 — the max sits on the extreme-ratio tuples by design).
    48 trials of this grid run in ~28 s at 32 cpus (BASELINE.md).

    Driver-budget default is 4 Monte-Carlo trials over the FULL tuple grid
    (was the sweep's heaviest query at 12); set GRAFT_JOINT_EVAL_TRIALS
    for the deep runs (bench/evaluation use 12-48)."""
    import os

    import ray

    from setsketch_ray.pipelines.evaluation import joint_error_pipeline

    n_trials = int(os.environ.get("GRAFT_JOINT_EVAL_TRIALS", "4"))
    # size the trial pool to the session: each actor runs whole-grid trials,
    # so concurrency == busy cores (at 6 this was the sweep's slowest query)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    conc = max(4, min(12, ncpu - 2))
    m = 1024
    tbl = joint_error_pipeline(family="ghll", m=m, n_trials=n_trials,
                               union_cardinalities=(1_000_000, 1_000),
                               parallelism=max(4, n_trials),
                               concurrency=conc)
    num = np.column_stack([
        tbl[c].to_numpy() for c, t in zip(tbl.column_names, tbl.schema.types)
        if pa.types.is_floating(t) or pa.types.is_integer(t)])
    nrmse = np.sqrt(tbl["newMSEJaccard"].to_numpy()) * np.sqrt(m)
    return pa.table({
        "n_tuples": pa.array([tbl.num_rows], pa.int64()),
        "finite_ok": pa.array([int(np.isfinite(num).all())], pa.int64()),
        "rmse_median_ok": pa.array([int(np.median(nrmse) <= 1.0)],
                                   pa.int64()),
        "rmse_max_ok": pa.array([int(nrmse.max() <= 50.0)], pa.int64())})


def _q_charts(sf_dir: str):
    """Regenerate the reference figure set (bias/RMSE panels, joint RMSE vs
    Cramér-Rao, collision-probability bounds — python/joint_charts.py:124-135,
    cardinality_error_charts.py:81-82, collision_probability.py:47-67) as
    SVGs under /tmp via the Monte-Carlo evaluation pipelines; returns one
    row per chart with a well-formedness certificate.  ORACLED as
    invariant rows (constant SQL): the artifact is a figure, not a
    relation, but the CONTRACT is checkable — the full 8-chart reference
    set must come back, each file non-trivial (> 500 bytes) and parsing
    as XML with an ``svg`` root.  The underlying numbers are golden-parity
    tested (tests/test_charts.py)."""
    import os
    import xml.etree.ElementTree as ET

    import pandas as pd

    from setsketch_ray.pipelines.charts import make_charts

    out = make_charts("/tmp/setsketch_charts", m=256, n_trials=8,
                      max_cardinality=5_000, union_size=500)
    rows = []
    for k, v in sorted(out.items()):
        ok = 0
        try:
            if os.path.getsize(v) > 500:
                root = ET.parse(v).getroot()
                ok = int(root.tag.endswith("svg"))
        except Exception:
            ok = 0
        rows.append({"chart": k, "svg_ok": ok})
    df = pd.DataFrame(rows)
    df["svg_ok"] = df["svg_ok"].astype("int64")
    return df


def _q_top_events_per_user(sf_dir: str):
    """Top-3 events per user by value (hash-partitioned vectorized rank —
    no global sort); oracle via QUALIFY row_number()."""
    from setsketch_ray.functions.relational import top_k_per_group

    ds = _read(sf_dir, "events", ["user_id", "event_id", "value"])
    return top_k_per_group(ds, "user_id", "value", 3,
                           tiebreak_col="event_id")


def _q_mix_corpus(sf_dir: str):
    """Deterministic corpus mixing (relational.mix_corpus): resample
    documents to a 50% en / 12.5%-each de-es-fr-zh language mix at a
    budget of half the corpus.  ORACLED: the acceptance rate
    least(1.0, total*w/count) and the Knuth-hash keep test are the
    identical float expressions in SQL, so the sample itself hashes
    exactly."""
    from setsketch_ray.functions.relational import mix_corpus

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    total = ds.count() // 2
    out = mix_corpus(ds, "doc_id", "lang",
                     {"en": 0.5, "de": 0.125, "es": 0.125, "fr": 0.125,
                      "zh": 0.125}, total)
    return out.sort("doc_id")


def _q_sample_split_docs(sf_dir: str):
    """Deterministic 20% Bernoulli sample of documents + leakage-safe
    train/val/test split column — Knuth multiplicative hash on doc_id, the
    same arithmetic the SQL oracle computes (no RNG state anywhere)."""
    from setsketch_ray.functions.relational import (sample_by_key,
                                                    train_val_test_split)

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    sampled = sample_by_key(ds, "doc_id", 0.2)
    return train_val_test_split(sampled, "doc_id", val_fraction=0.05,
                                test_fraction=0.05)


def _q_sessionize(sf_dir: str):
    """Gap-based session windows over the events stream (30-min gap):
    hash-partition by user, one vectorized sessionization pass per partition.
    Oracle: lag/cumsum window SQL."""
    from setsketch_ray.functions.streaming import sessionize

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    return sessionize(ds, gap_seconds=1800.0, value_scale=100)


def _q_value_quantiles(sf_dir: str):
    """Exact discrete quantiles of events.value (cents-exact fixed point):
    distributed scaled value-count partials + tiny driver walk.  Oracle:
    DuckDB quantile_disc over the same list of q's (same ceil(q*n)-1
    discrete rule, verified empirically)."""
    from setsketch_ray.functions.relational import quantiles_fixedpoint

    ds = _read(sf_dir, "events", ["value"])
    return quantiles_fixedpoint(
        ds, "value", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99], scale=100)


def _q_value_equidepth_histogram(sf_dir: str):
    """Equi-depth histogram of events.value: EXACT quartile boundaries
    (quantiles_fixedpoint — the distributed distinct-count plan) define 4
    right-closed buckets; one vectorized searchsorted pass assigns rows
    and a combiner grouped_aggregate counts + cent-sums per bucket.
    ORACLED: the SQL recomputes the same quantile_disc boundaries and the
    same right-closed CASE bucketing; sums are integer cents on both
    sides."""
    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    quantiles_fixedpoint)

    ds = _read(sf_dir, "events", ["value"])
    qt = quantiles_fixedpoint(ds, "value", [0.25, 0.5, 0.75], scale=100)
    bounds = np.asarray(qt["value"].to_pylist(), np.float64)

    def bucketize(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.searchsorted(bounds, v, side="left").astype(np.int64)
        c = np.rint(v * 100).astype(np.int64)
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "vc": pa.array(c, pa.int64())})

    out = grouped_aggregate(ds.map_batches(bucketize,
                                           batch_format="pyarrow"),
                            ["bucket"],
                            {"n_rows": ("count", None),
                             "sum_value_c": ("sum", "vc")})
    order = pa.compute.sort_indices(out, sort_keys=[("bucket",
                                                     "ascending")])
    return out.take(order)


def _q_value_quantiles_cont(sf_dir: str):
    """Exact CONTINUOUS quantiles (DuckDB quantile_cont parity): same
    distinct-count plan as value_quantiles plus the verified symmetric
    interpolation (1-frac)*lo + frac*hi on the original doubles — bit-exact
    (relational.quantiles_cont_fixedpoint)."""
    from setsketch_ray.functions.relational import quantiles_cont_fixedpoint

    ds = _read(sf_dir, "events", ["value"])
    return quantiles_cont_fixedpoint(
        ds, "value", [0.1, 0.25, 0.5, 0.75, 0.9], scale=100)


def _q_value_quantiles_by_type(sf_dir: str):
    """Per-group exact discrete quantiles (grouped form of value_quantiles;
    shuffle volume = distinct (group, value) pairs, final walk one lexsort
    — functions/relational.grouped_quantiles_fixedpoint)."""
    from setsketch_ray.functions.relational import \
        grouped_quantiles_fixedpoint

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantiles_fixedpoint(
        ds, "event_type", "value", [0.25, 0.5, 0.9], scale=100)


def _q_value_quantiles_cont_by_type(sf_dir: str):
    """Per-group exact CONTINUOUS quantiles (cont=True: DuckDB
    quantile_cont's verified symmetric interpolation per group)."""
    from setsketch_ray.functions.relational import \
        grouped_quantiles_fixedpoint

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantiles_fixedpoint(
        ds, "event_type", "value", [0.25, 0.5, 0.9], scale=100, cont=True)


def _q_approx_distinct_methods(sf_dir: str):
    """Distinct l_partkey estimated by every sketch family (GHLL / HLL /
    SetSketch1 / SetSketch2 / MinHash / HyperMinHash) in ONE pass: the
    column is hashed once per block and feeds all six families' partials,
    which fold through a single distributed Ray AggregateFn (register-wise
    max / min) instead of a driver-side to_pylist loop (VERDICT r1 'weak'
    #5).  ORACLED as invariant rows: the exact distributed COUNT(DISTINCT)
    matches DuckDB bit-for-bit and each family's ``est_err_ok`` flips to 0
    if its deterministic estimate drifts past 6% relative error (measured
    <=2.6% across all six families at every sf)."""
    import numpy as np

    from setsketch_ray.aggregates import multi_sketch_union
    from setsketch_ray.sketchlib import (GHLL, HLL, HyperMinHash, MinHash,
                                         SetSketch1, SetSketch2,
                                         MinHashEstimator, SetSketchEstimator)
    from setsketch_ray.sketchlib.hmh_estimator import HyperMinHashEstimator

    ds = _read(sf_dir, "lineitem", ["l_partkey"])
    families = {
        "ghll": (GHLL(m=4096), SetSketchEstimator(62, 1 / 4096, 2.0, 4096,
                                                  card_range_correction=True)),
        "hll": (HLL(p=12, q=52), SetSketchEstimator(52, 1 / 4096, 2.0, 4096,
                                                    card_range_correction=True)),
        "setsketch1": (SetSketch1(m=4096), SetSketchEstimator(62, 20.0, 2.0, 4096)),
        "setsketch2": (SetSketch2(m=4096), SetSketchEstimator(62, 20.0, 2.0, 4096)),
        "minhash": (MinHash(m=1024), MinHashEstimator(1024)),
        "hyperminhash": (HyperMinHash(), HyperMinHashEstimator(12, 6, 10)),
    }
    sketches = {name: sk for name, (sk, _e) in families.items()}
    merged = multi_sketch_union(ds, "l_partkey", sketches)
    from setsketch_ray.functions.relational import count_distinct
    exact = count_distinct(ds, "l_partkey")
    methods, oks = [], []
    for name, (sk, est) in sorted(families.items()):
        regs = np.asarray(merged[name])[None, :]
        if name == "minhash":
            e = float(est.estimate_cardinality(regs)[0])
        elif name == "hyperminhash":
            e = float(est.estimate_cardinality_new(regs)[0])
        else:
            e = float(est.estimate_cardinality_simple(regs)[0])
        methods.append(name)
        oks.append(int(abs(e / exact - 1.0) <= 0.06))
    return pa.table({"method": pa.array(methods),
                     "exact_n_distinct": pa.array([exact] * len(methods),
                                                  pa.int64()),
                     "est_err_ok": pa.array(oks, pa.int64())})


def _q_substring_dup_docs(sf_dir: str):
    """Documents sharing a >=16-token substring (rolling-window buckets, the
    distributed suffix-array-dedup stand-in).  Oracled: the window keys are
    content hashes, so the pair set equals a DuckDB self-join of the distinct
    (doc, 16-token-window) relation (exact modulo 2^-64 hash collisions and
    the >256-doc bucket cap, neither reachable on the sf tables)."""
    from setsketch_ray.functions.dedup import substring_dup_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = substring_dup_pairs(ds, "doc_id", window=16)
    batches = list(pairs.iter_batches(batch_format="pyarrow",
                                      batch_size=1 << 20))
    if batches:
        return pa.concat_tables(batches)
    return pa.table({"id_a": pa.array([], pa.int64()),
                     "id_b": pa.array([], pa.int64()),
                     "shared_windows": pa.array([], pa.int64())})


def _q_suffix_dup_spans(sf_dir: str):
    """Suffix-array-style substring dedup with maximal shared-span lengths
    per doc pair (Lee et al. 2021 corpus-dedup semantics).  Oracled: matched
    16-token windows merged along diagonals equal a DuckDB gaps-and-islands
    query over the window self-join (exact modulo 2^-64 key collisions and
    the hot-window bucket cap, neither reachable on the sf tables)."""
    from setsketch_ray.functions.dedup import suffix_array_dup_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = suffix_array_dup_spans(ds, "doc_id", window=16)
    batches = list(out.iter_batches(batch_format="pyarrow",
                                    batch_size=1 << 20))
    if batches:
        return pa.concat_tables(batches)
    return pa.table({"id_a": pa.array([], pa.int64()),
                     "id_b": pa.array([], pa.int64()),
                     "n_matches": pa.array([], pa.int64()),
                     "max_run_tokens": pa.array([], pa.int64())})


def _q_doc_fingerprints(sf_dir: str):
    """MOSS winnowing fingerprints (k=8-token grams, window w=4, md5 gram
    hash).  Oracled: DuckDB computes the identical md5 gram hashes
    (md5_number_lower = bytes 8:16 little-endian) and the identical windowed
    min + distinct selection."""
    from setsketch_ray.functions.text import winnow_fingerprints

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = winnow_fingerprints(ds, "doc_id", k=8, w=4)
    batches = list(out.iter_batches(batch_format="pyarrow",
                                    batch_size=1 << 20))
    if batches:
        return pa.concat_tables(batches)
    return pa.table({"doc_id": pa.array([], pa.int64()),
                     "fingerprint": pa.array([], pa.int64())})


# ---------------------------------------------------------- TPC-H late-r2 set
def _ts(y: int, m: int, d: int):
    from datetime import datetime

    return pa.scalar(datetime(y, m, d), pa.timestamp("us"))


def _scalar_sum_count(ds, col: str) -> tuple[int, int]:
    """Global (sum, count) of an int64 column: per-batch partials (combiner),
    tiny final on the driver.  The shuffle carries one row per block."""
    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "s": pa.array([pc.sum(t[col]).as_py() or 0], pa.int64()),
            "n": pa.array([t.num_rows], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return (sum(int(r["s"]) for r in parts), sum(int(r["n"]) for r in parts))


def _q_revenue_by_nation(sf_dir: str):
    """TPC-H Q5 shape: 6-table chain (region->nation broadcast, customer ->
    orders -> lineitem -> supplier lookup_joins), local-supplier condition
    c_nationkey == s_nationkey, revenue on the 1e-4-scaled integer domain.
    Dimension tables (nation x region, 25 rows) are broadcast as an Arrow
    lookup inside map_batches — never shuffled."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join)

    lo, hi = _ts(1996, 1, 1), _ts(1998, 1, 1)
    # broadcast side: nations in ASIA (regionkey join done driver-side on the
    # 25x5-row dimension tables)
    nation = pq.read_table(f"{sf_dir}/nation.parquet").combine_chunks()
    region = pq.read_table(f"{sf_dir}/region.parquet").combine_chunks()
    asia = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"]
    nat = nation.filter(pc.is_in(nation["n_regionkey"], value_set=asia))
    nat_keys = nat["n_nationkey"].combine_chunks()
    nat_names = nat["n_name"].combine_chunks()

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    import pyarrow.dataset as pads

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"],
                   predicate=(pads.field("o_orderdate") >= lo)
                   & (pads.field("o_orderdate") < hi)) \
        .map_batches(lambda t: t.drop_columns(["o_orderdate"]),
                     batch_format="pyarrow")
    orders_c = lookup_join(
        orders, cust, "o_custkey", "c_custkey", num_partitions=32,
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_nationkey", pa.int32())])) \
        .select_columns(["o_orderkey", "c_nationkey"])
    def pre_rev(t: pa.Table) -> pa.Table:
        # scale revenue to ONE int64 before any shuffle: 24 B/row instead
        # of 40 through both join exchanges, and the float math runs once
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        c = np.floor(x * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev_c": pa.array(c, pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]) \
        .map_batches(pre_rev, batch_format="pyarrow")
    # NOTE: a bloom_semi_prefilter on l_orderkey was measured here and
    # reverted — at ~35% window selectivity the extra lineitem pass +
    # materialize barrier cost more than the shuffle it saved; the
    # prefilter pays at high selectivity (see urgent_lineitem_revenue)
    j1 = lookup_join(
        li, orders_c, "l_orderkey", "o_orderkey", num_partitions=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("rev_c", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("c_nationkey", pa.int32())]))
    # supplier is a dimension side: attach it MAP-SIDE (broadcast_join) so
    # lineitem rows enter exactly ONE exchange (the l_orderkey co-partition)
    # instead of re-shuffling for a second key; beyond broadcastable
    # supplier sizes flip this back to lookup_join
    from setsketch_ray.functions.relational import broadcast_join

    supp_tbl = pq.read_table(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_nationkey"])
    j2 = broadcast_join(j1, supp_tbl, "l_suppkey", "s_suppkey")

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.equal(t["c_nationkey"], t["s_nationkey"]),
            pc.is_in(t["c_nationkey"], value_set=nat_keys)))
        idx = pc.index_in(t["c_nationkey"], value_set=nat_keys)
        return pa.table({"n_name": nat_names.take(idx),
                         "rev_c": t["rev_c"]})

    return grouped_aggregate(j2.map_batches(rev, batch_format="pyarrow"),
                             ["n_name"], {"revenue_c": ("sum", "rev_c")})


def _q_order_priority_counts(sf_dir: str):
    """TPC-H Q4 shape: EXISTS semi-join — orders in a one-year window having
    at least one returned lineitem (l_returnflag='R'; the synthetic schema
    has no commit/receipt dates), counted per o_orderpriority.  The right
    side ships only its key column (semi_anti_join prunes it)."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    semi_anti_join)

    import pyarrow.dataset as pads

    lo, hi = _ts(1996, 1, 1), _ts(1997, 1, 1)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"],
                   predicate=(pads.field("o_orderdate") >= lo)
                   & (pads.field("o_orderdate") < hi)) \
        .map_batches(lambda t: t.drop_columns(["o_orderdate"]),
                     batch_format="pyarrow")
    li_r = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"],
                 predicate=pads.field("l_returnflag") == "R")
    hit = semi_anti_join(
        orders, li_r, "o_orderkey", "l_orderkey", mode="semi",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_orderpriority", pa.string())]))
    return grouped_aggregate(hit, ["o_orderpriority"],
                             {"n_orders": ("count", None)})


def _q_custdist(sf_dir: str):
    """TPC-H Q13 shape: distribution of customers by how many non-urgent
    orders they placed (including zero).  Per-custkey counts stay a Dataset
    (grouped_aggregate final='ray'); customers LEFT-join the counts so
    order-less customers survive with c_count=0; the final distribution
    groupby runs over one small row per customer."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join)

    import pyarrow.dataset as pads

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"],
                   predicate=pads.field("o_orderpriority") != "1-URGENT") \
        .select_columns(["o_custkey"])
    counts = grouped_aggregate(orders, ["o_custkey"],
                               {"c_count": ("count", None)}, final="ray")
    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = lookup_join(
        cust, counts, "c_custkey", "o_custkey", num_partitions=32,
        how="left",
        left_schema=pa.schema([("c_custkey", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64()),
                                ("c_count", pa.int64())]))

    def fill0(t: pa.Table) -> pa.Table:
        return pa.table({"c_count": pc.coalesce(t["c_count"],
                                                pa.scalar(0, pa.int64()))})

    filled = joined.map_batches(fill0, batch_format="pyarrow")
    return grouped_aggregate(filled, ["c_count"],
                             {"custdist": ("count", None)})


def _q_part_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape: suppliers per (p_brand, p_type, p_size) via the
    lineitem association (no partsupp table in the synthetic schema), brand
    exclusion + size IN-list filter, exact composite-key COUNT(DISTINCT)
    (grouped_count_distinct with a key list — pair-hash partition, only
    distinct (key, supplier) pairs shuffle)."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (grouped_count_distinct,
                                                    lookup_join)

    sizes = pa.array([1, 5, 11, 18, 23, 32, 45], pa.int32())
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]) \
        .map_batches(lambda t: t.filter(pc.and_(
            pc.not_equal(t["p_brand"], "Brand#2"),
            pc.is_in(t["p_size"], value_set=sizes))),
            batch_format="pyarrow")
    pairs = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    joined = lookup_join(
        pairs, part, "l_partkey", "p_partkey", num_partitions=32,
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_suppkey", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("p_brand", pa.string()),
                                ("p_type", pa.string()),
                                ("p_size", pa.int32())]))
    out = grouped_count_distinct(joined, ["p_brand", "p_type", "p_size"],
                                 "l_suppkey")
    return out.rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])


def _q_global_sales_opportunity(sf_dir: str):
    """TPC-H Q22 shape: customers with above-average positive balance and no
    order since 2001-01-01, grouped by nation.  The global avg threshold is
    decorrelated into two integer scalars (sum_c, n) broadcast into a PURE
    INTEGER row filter acctbal_c * n > sum_c (exactly acctbal > avg, no
    division); the recent-orders anti-join ships key columns only."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    semi_anti_join)

    def scaled(t: pa.Table) -> pa.Table:
        x = t["c_acctbal"].to_numpy(zero_copy_only=False)
        c = np.floor(x * 100.0 + 0.5).astype(np.int64)
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_nationkey": t["c_nationkey"],
                         "bal_c": pa.array(c, pa.int64())})

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"]) \
        .map_batches(scaled, batch_format="pyarrow")
    sum_c, n_pos = _scalar_sum_count(
        cust.filter(expr="bal_c > 0").select_columns(["bal_c"]), "bal_c")
    rich = cust.map_batches(
        lambda t, s=sum_c, n=n_pos: t.filter(
            pc.greater(pc.multiply(t["bal_c"], pa.scalar(n, pa.int64())),
                       pa.scalar(s, pa.int64()))),
        batch_format="pyarrow")
    recent = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]) \
        .map_batches(lambda t: t.filter(
            pc.greater_equal(t["o_orderdate"], _ts(2001, 1, 1))),
            batch_format="pyarrow")
    lonely = semi_anti_join(
        rich, recent, "c_custkey", "o_custkey", mode="anti",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("c_nationkey", pa.int32()),
                               ("bal_c", pa.int64())]))
    return grouped_aggregate(lonely, ["c_nationkey"],
                             {"n_cust": ("count", None),
                              "total_acctbal_c": ("sum", "bal_c")})


def _q_important_parts(sf_dir: str):
    """TPC-H Q11 shape: parts whose lineitem revenue exceeds 1.5x the
    per-part average (scale-free — a fixed fraction-of-total cutoff returns
    0 rows at sf0.1, and an empty oracled result is forbidden: it loses its
    schema through to_pandas).  One distributed grouped sum on the
    cent-scaled integer domain; the HAVING threshold is the pure-integer
    inequality value_c * nparts * 2 > 3 * total_c (exactly
    value > 1.5 * total/nparts, no division); total and nparts come from
    the per-part sums — no second pass over lineitem."""
    def scaled(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        c = np.floor(x * 100.0 + 0.5).astype(np.int64)
        return pa.table({"l_partkey": t["l_partkey"],
                         "val_c": pa.array(c, pa.int64())})

    from setsketch_ray.functions.relational import grouped_aggregate

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"]) \
        .map_batches(scaled, batch_format="pyarrow")
    per_part = grouped_aggregate(li, ["l_partkey"],
                                 {"value_c": ("sum", "val_c")})
    import pyarrow.compute as pc

    total = int(pc.sum(per_part["value_c"]).as_py())
    nparts = per_part.num_rows
    keep = pc.greater(pc.multiply(per_part["value_c"],
                                  pa.scalar(2 * nparts, pa.int64())),
                      pa.scalar(3 * total, pa.int64()))
    return per_part.filter(keep)


def _q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: percentage of a quarter's revenue from ECONOMY-type
    parts (the synthetic p_type domain has no 'PROMO%').  Both revenue sums
    run on the 1e-4-scaled integer domain; the percentage is ONE IEEE
    division of two exactly-representable integers (promo_c*100 < 2^53), so
    the float final is bit-exact against the oracle."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import lookup_join

    lo, hi = _ts(1997, 1, 1), _ts(1997, 7, 1)
    import pyarrow.dataset as pads

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
               predicate=(pads.field("l_shipdate") >= lo)
               & (pads.field("l_shipdate") < hi)) \
        .map_batches(lambda t: t.drop_columns(["l_shipdate"]),
                     batch_format="pyarrow")
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    joined = lookup_join(
        li, part, "l_partkey", "p_partkey", num_partitions=32,
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("p_type", pa.string())]))

    def partial(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        c = np.floor(x * 10000.0 + 0.5).astype(np.int64)
        promo = pc.equal(t["p_type"], "ECONOMY").to_numpy(
            zero_copy_only=False)
        return pa.table({"p": pa.array([int(c[promo].sum())], pa.int64()),
                         "t": pa.array([int(c.sum())], pa.int64())})

    parts = joined.map_batches(partial, batch_format="pyarrow").take_all()
    promo_c = sum(int(r["p"]) for r in parts)
    total_c = sum(int(r["t"]) for r in parts)
    pct = np.float64(promo_c * 100) / np.float64(total_c)
    return pa.table({"promo_pct": pa.array([pct], pa.float64())})


def _q_returned_revenue_customers(sf_dir: str):
    """TPC-H Q10 shape: top 20 customers by returned revenue in one year
    (l_returnflag='R' -> orders -> per-customer cent-scaled sum -> top 20 by
    revenue desc, custkey pinning ties), customer attributes attached to the
    20 survivors with a broadcast is_in filter — never a full join."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join)

    lo, hi = _ts(1996, 1, 1), _ts(1997, 1, 1)
    import pyarrow.dataset as pads

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_returnflag", "l_shipdate"],
               predicate=(pads.field("l_returnflag") == "R")
               & (pads.field("l_shipdate") >= lo)
               & (pads.field("l_shipdate") < hi)) \
        .map_batches(lambda t: t.drop_columns(["l_returnflag",
                                               "l_shipdate"]),
                     batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = lookup_join(
        li, orders, "l_orderkey", "o_orderkey", num_partitions=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]))

    def rev(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        c = np.floor(x * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"o_custkey": t["o_custkey"],
                         "rev_c": pa.array(c, pa.int64())})

    agg = grouped_aggregate(joined.map_batches(rev, batch_format="pyarrow"),
                            ["o_custkey"], {"revenue_c": ("sum", "rev_c")})
    order = pc.sort_indices(agg, sort_keys=[("revenue_c", "descending"),
                                            ("o_custkey", "ascending")])
    top = agg.take(order[:20])
    # attrs for 20 survivors: broadcast is_in filter, tiny driver-side gather
    keys = top["o_custkey"].combine_chunks()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]) \
        .map_batches(lambda t: t.filter(
            pc.is_in(t["c_custkey"], value_set=keys)),
            batch_format="pyarrow").take_all()
    by_key = {int(r["c_custkey"]): r for r in cust}
    names = pa.array([by_key[int(k.as_py())]["c_name"] for k in keys],
                     pa.string())
    bals = pa.array([by_key[int(k.as_py())]["c_acctbal"] for k in keys],
                    pa.float64())
    return pa.table({"c_custkey": keys, "c_name": names,
                     "c_acctbal": bals, "revenue_c": top["revenue_c"]})


def _q_events_cume_dist(sf_dir: str):
    """CUME_DIST + NTH_VALUE window per event_type (one lexsort per key
    partition; cume_dist ties on value ALONE share the SQL value — one IEEE
    division of identical int operands; nth_value over the whole-partition
    frame with event_id pinning determinism)."""
    from setsketch_ray.functions.streaming import window_cume_nth

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return window_cume_nth(ds, "event_type", "value", "event_id", nth=3)


def _q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: single-table predicate-pushdown aggregate — one year
    of lineitem, discount band, quantity cap, revenue = sum(price*discount)
    on the 1e-6-scaled integer domain (price*discount needs two float
    multiplies — floor(x*1e6+0.5) is IEEE-identical per row).  No shuffle
    at all: per-batch partial sums, tiny driver fold."""
    import pyarrow.compute as pc

    lo, hi = _ts(1996, 1, 1), _ts(1997, 1, 1)

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(
            pc.greater_equal(t["l_shipdate"], lo),
            pc.less(t["l_shipdate"], hi)), pc.and_(
            pc.and_(pc.greater_equal(t["l_discount"], 0.02),
                    pc.less_equal(t["l_discount"], 0.06)),
            pc.less(t["l_quantity"], 24.0)))
        t = t.filter(m)
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            * t["l_discount"].to_numpy(zero_copy_only=False)
        c = np.floor(x * 1e6 + 0.5).astype(np.int64)
        return pa.table({"s": pa.array([int(c.sum())], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table({
        "revenue_c": pa.array([sum(int(r["s"]) for r in parts)], pa.int64()),
        "n_items": pa.array([sum(int(r["n"]) for r in parts)], pa.int64())})


def _q_cheapest_supplier_per_part(sf_dir: str):
    """TPC-H Q2 shape (argmin join): per part, the supplier with the LOWEST
    account balance among suppliers who ever shipped it (lineitem is the
    association; ties -> smallest suppkey).  Distinct (part, supp) pairs
    through the shuffle, supplier attrs attached by lookup_join, then one
    top_k_per_group k=1 pass on the negated balance (argmin via argmax)."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (lookup_join,
                                                    top_k_per_group)

    pairs = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]) \
        .map_batches(lambda t: t.group_by(
            ["l_partkey", "l_suppkey"]).aggregate([]),
            batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    joined = lookup_join(
        pairs, supp, "l_suppkey", "s_suppkey", num_partitions=32,
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_suppkey", pa.int64())]),
        right_schema=pa.schema([("s_suppkey", pa.int64()),
                                ("s_acctbal", pa.float64())]))

    def dedup_neg(t: pa.Table) -> pa.Table:
        # batch-level pair dedup again post-join + negate for argmin
        t = t.group_by(["l_partkey", "l_suppkey", "s_acctbal"]).aggregate([])
        return t.append_column(
            "__neg_bal", pc.negate(t["s_acctbal"]))

    best = top_k_per_group(
        joined.map_batches(dedup_neg, batch_format="pyarrow"),
        "l_partkey", "__neg_bal", k=1, tiebreak_col="l_suppkey")
    return best.map_batches(
        lambda t: t.drop_columns(["__neg_bal"]), batch_format="pyarrow")


def _q_top_supplier_revenue(sf_dir: str):
    """TPC-H Q15 shape (max over an aggregated view): suppliers whose
    one-year revenue equals the global maximum.  One distributed cent-scaled
    grouped sum; the max + equality filter run on the tiny per-supplier
    table — pure integer comparison, so ties (if any) all survive, exactly
    like the SQL."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate

    lo, hi = _ts(1996, 1, 1), _ts(1996, 4, 1)

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        c = np.floor(x * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"l_suppkey": t["l_suppkey"],
                         "rev_c": pa.array(c, pa.int64())})

    ds = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])
    agg = grouped_aggregate(ds.map_batches(rev, batch_format="pyarrow"),
                            ["l_suppkey"], {"total_rev_c": ("sum", "rev_c")})
    mx = pc.max(agg["total_rev_c"])
    return agg.filter(pc.equal(agg["total_rev_c"], mx))


def _q_special_revenue(sf_dir: str):
    """TPC-H Q19 shape: OR of conjunctive multi-table predicate branches
    (brand x size-band x quantity-band), revenue on the scaled integer
    domain.  The part attributes ride one lookup_join; the disjunction is
    three vectorized masks OR-ed per batch."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import lookup_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    joined = lookup_join(
        li, part, "l_partkey", "p_partkey", num_partitions=32,
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_quantity", pa.float64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("p_brand", pa.string()),
                                ("p_size", pa.int32())]))

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"]
        b1 = pc.and_(pc.and_(pc.equal(t["p_brand"], "Brand#12"),
                             pc.less_equal(t["p_size"], 5)),
                     pc.and_(pc.greater_equal(q, 1.0),
                             pc.less_equal(q, 11.0)))
        b2 = pc.and_(pc.and_(pc.equal(t["p_brand"], "Brand#23"),
                             pc.less_equal(t["p_size"], 10)),
                     pc.and_(pc.greater_equal(q, 10.0),
                             pc.less_equal(q, 20.0)))
        b3 = pc.and_(pc.and_(pc.equal(t["p_brand"], "Brand#3"),
                             pc.less_equal(t["p_size"], 15)),
                     pc.and_(pc.greater_equal(q, 20.0),
                             pc.less_equal(q, 30.0)))
        t = t.filter(pc.or_(pc.or_(b1, b2), b3))
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        c = np.floor(x * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"s": pa.array([int(c.sum())], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    parts = joined.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table({
        "revenue_c": pa.array([sum(int(r["s"]) for r in parts)], pa.int64()),
        "n_items": pa.array([sum(int(r["n"]) for r in parts)], pa.int64())})


def _q_sole_blame_suppliers(sf_dir: str):
    """TPC-H Q21 shape (EXISTS + NOT EXISTS self-joins on the same order):
    per supplier, count multi-supplier orders where THIS supplier returned
    items ('R') and NO other supplier did.  Distinct (order, supplier[, R])
    pairs shuffle once; the per-order supplier/blame counts collapse in one
    grouped pass; the EXISTS/NOT-EXISTS pair becomes the vectorized filter
    n_supp >= 2 AND n_blame_supp == 1 applied on the blamed supplier's row."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey",
                                    "l_returnflag"])

    def pairs(t: pa.Table) -> pa.Table:
        r = pc.equal(t["l_returnflag"], "R").cast(pa.int64())
        u = pa.table({"l_orderkey": t["l_orderkey"],
                      "l_suppkey": t["l_suppkey"], "is_r": r}) \
            .group_by(["l_orderkey", "l_suppkey"]) \
            .aggregate([("is_r", "max")])
        # arrow puts aggregate outputs before keys — select by NAME
        return pa.table({"l_orderkey": u["l_orderkey"],
                         "l_suppkey": u["l_suppkey"],
                         "is_r": u["is_r_max"].cast(pa.int64())})

    # distinct (order, supplier, returned?) rows; global dedup via the
    # grouped max (a supplier returning in one batch and not another)
    ps = grouped_aggregate(li.map_batches(pairs, batch_format="pyarrow"),
                           ["l_orderkey", "l_suppkey"],
                           {"is_r": ("max", "is_r")}, final="ray")
    per_order = grouped_aggregate(ps, ["l_orderkey"],
                                  {"n_supp": ("count", None),
                                   "n_blame": ("sum", "is_r")}, final="ray")
    blamed = ps.filter(expr="is_r == 1")
    joined = lookup_join(
        blamed, per_order, "l_orderkey", "l_orderkey", num_partitions=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("is_r", pa.int64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("n_supp", pa.int64()),
                                ("n_blame", pa.int64())]))
    culprits = joined.map_batches(
        lambda t: t.filter(pc.and_(pc.greater_equal(t["n_supp"], 2),
                                   pc.equal(t["n_blame"], 1))),
        batch_format="pyarrow")
    return grouped_aggregate(culprits, ["l_suppkey"],
                             {"numwait": ("count", None)})


def _q_nation_trade_volume(sf_dir: str):
    """TPC-H Q7 shape: shipping volume between two nation pairs per year
    (customer nation x supplier nation, both directions), revenue scaled.
    Same join chain as Q5 (orders->customer, lineitem->orders, ->supplier);
    the year comes from a vectorized timestamp floor."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join)

    n1, n2 = 3, 7   # NATION_3 <-> NATION_7
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    orders_c = lookup_join(
        orders, cust, "o_custkey", "c_custkey", num_partitions=32,
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_nationkey", pa.int32())])) \
        .map_batches(lambda t: t.filter(pc.is_in(
            t["c_nationkey"], value_set=pa.array([n1, n2], pa.int32()))),
            batch_format="pyarrow") \
        .select_columns(["o_orderkey", "c_nationkey"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                "l_shipdate"])
    j1 = lookup_join(
        li, orders_c, "l_orderkey", "o_orderkey", num_partitions=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("c_nationkey", pa.int32())]))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j2 = lookup_join(
        j1, supp, "l_suppkey", "s_suppkey", num_partitions=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64()),
                               ("l_shipdate", pa.timestamp("us")),
                               ("c_nationkey", pa.int32())]),
        right_schema=pa.schema([("s_suppkey", pa.int64()),
                                ("s_nationkey", pa.int32())]))

    def vol(t: pa.Table) -> pa.Table:
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False)
        sn = t["s_nationkey"].to_numpy(zero_copy_only=False)
        keep = ((cn == n1) & (sn == n2)) | ((cn == n2) & (sn == n1))
        t = t.filter(pa.array(keep))
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        c = np.floor(x * 10000.0 + 0.5).astype(np.int64)
        yr = pc.year(t["l_shipdate"]).cast(pa.int64())
        return pa.table({"cust_nation": t["c_nationkey"].cast(pa.int64()),
                         "supp_nation": t["s_nationkey"].cast(pa.int64()),
                         "l_year": yr,
                         "vol_c": pa.array(c, pa.int64())})

    return grouped_aggregate(j2.map_batches(vol, batch_format="pyarrow"),
                             ["cust_nation", "supp_nation", "l_year"],
                             {"volume_c": ("sum", "vol_c")})


def _q_urgent_lineitem_revenue(sf_dir: str):
    """Bloom-prefiltered INNER join (functions/relational.
    bloom_semi_prefilter): revenue by returnflag over lineitems of urgent
    orders in one quarter (~5% of orders) — the probe side drops its
    definitely-non-matching rows BEFORE the join shuffle; bloom false
    positives fall out of the exact lookup_join, so the result is exact."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (bloom_semi_prefilter,
                                                    grouped_aggregate,
                                                    lookup_join)

    lo, hi = _ts(1996, 1, 1), _ts(1996, 7, 1)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(lambda t: t.filter(pc.and_(
            pc.equal(t["o_orderpriority"], "1-URGENT"), pc.and_(
                pc.greater_equal(t["o_orderdate"], lo),
                pc.less(t["o_orderdate"], hi)))) \
            .select(["o_orderkey"]), batch_format="pyarrow") \
        .materialize()   # consumed twice: bloom bitmap + join build side
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"])
    li = bloom_semi_prefilter(li, orders, "l_orderkey", "o_orderkey")
    joined = lookup_join(
        li, orders, "l_orderkey", "o_orderkey", num_partitions=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_returnflag", pa.string()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64())]))

    def rev(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        c = np.floor(x * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "rev_c": pa.array(c, pa.int64())})

    return grouped_aggregate(joined.map_batches(rev, batch_format="pyarrow"),
                             ["l_returnflag"],
                             {"revenue_c": ("sum", "rev_c"),
                              "n_items": ("count", None)})


def _q_large_volume_customers(sf_dir: str):
    """TPC-H Q18 shape (HAVING-sum semi filter up a join chain): orders
    whose total lineitem quantity exceeds 200 (cent-scaled integer sum),
    joined back to orders for the customer.  The per-order sums collapse in
    one distributed grouped pass; only qualifying orders ride the join."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join)

    import ray.data as rd

    def scaled(t: pa.Table) -> pa.Table:
        q = pc.round(pc.multiply(t["l_quantity"], pa.scalar(100.0))) \
            .cast(pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"], "qty_c": q})

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]) \
        .map_batches(scaled, batch_format="pyarrow")
    per_order = grouped_aggregate(li, ["l_orderkey"],
                                  {"sum_qty_c": ("sum", "qty_c")},
                                  final="ray") \
        .filter(expr="sum_qty_c > 20000")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    return lookup_join(
        per_order, orders, "l_orderkey", "o_orderkey", num_partitions=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("sum_qty_c", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_totalprice", pa.float64())]))


def _q_product_profit(sf_dir: str):
    """TPC-H Q9 shape adapted to the schema (no partsupp/supplycost —
    retailprice*quantity stands in for cost): profit per (supplier nation,
    ship year).  amount = floor(rev*1e4+0.5) - floor(cost*1e4+0.5) per ROW
    (floor of a difference != difference of floors; the per-row identical
    expression keeps both engines exact), then one distributed grouped
    sum."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"])
    part = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])
    j1 = lookup_join(
        li, part, "l_partkey", "p_partkey", num_partitions=32,
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("l_quantity", pa.float64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("p_retailprice", pa.float64())]))
    # dimension side attaches map-side: lineitem enters ONE exchange (the
    # l_partkey co-partition), not two (see broadcast_join)
    import pyarrow.parquet as pq

    from setsketch_ray.functions.relational import broadcast_join

    supp_tbl = pq.read_table(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_nationkey"])
    j2 = broadcast_join(j1, supp_tbl, "l_suppkey", "s_suppkey")

    def amount(t: pa.Table) -> pa.Table:
        rev = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        cost = t["p_retailprice"].to_numpy(zero_copy_only=False) \
            * t["l_quantity"].to_numpy(zero_copy_only=False)
        a = np.floor(rev * 10000.0 + 0.5).astype(np.int64) \
            - np.floor(cost * 10000.0 + 0.5).astype(np.int64)
        yr = pc.year(t["l_shipdate"]).cast(pa.int64())
        return pa.table({"supp_nation": t["s_nationkey"].cast(pa.int64()),
                         "l_year": yr,
                         "amount_c": pa.array(a, pa.int64())})

    return grouped_aggregate(j2.map_batches(amount, batch_format="pyarrow"),
                             ["supp_nation", "l_year"],
                             {"profit_c": ("sum", "amount_c")})


def _q_market_share(sf_dir: str):
    """TPC-H Q8 shape adapted: per ship year, NATION_7 suppliers' share of
    all revenue to ASIA-region customers.  The share is ONE IEEE division
    of two exactly-representable integer sums per year (same chain as Q5;
    the conditional numerator is a vectorized sum_if partial)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from setsketch_ray.functions.relational import (grouped_aggregate,
                                                    lookup_join)

    nation = pq.read_table(f"{sf_dir}/nation.parquet").combine_chunks()
    region = pq.read_table(f"{sf_dir}/region.parquet").combine_chunks()
    asia = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"]
    nat_keys = nation.filter(pc.is_in(nation["n_regionkey"],
                                      value_set=asia))["n_nationkey"] \
        .combine_chunks()

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda t: t.filter(pc.is_in(
            t["c_nationkey"], value_set=nat_keys)) \
            .select(["c_custkey"]), batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    from setsketch_ray.functions.relational import semi_anti_join

    orders_a = semi_anti_join(
        orders, cust, "o_custkey", "c_custkey", mode="semi",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64())])) \
        .select_columns(["o_orderkey"])
    def pre_vol(t: pa.Table) -> pa.Table:
        # int64 revenue + int64 ship year replace two floats + a timestamp
        # through both join exchanges (same trick as revenue_by_nation)
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        c = np.floor(x * 10000.0 + 0.5).astype(np.int64)
        yr = pc.year(t["l_shipdate"]).cast(pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "l_year": yr,
                         "rev_c": pa.array(c, pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                "l_shipdate"]) \
        .map_batches(pre_vol, batch_format="pyarrow")
    j1 = lookup_join(
        li, orders_a, "l_orderkey", "o_orderkey", num_partitions=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("l_year", pa.int64()),
                               ("rev_c", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64())]))
    # dimension side attaches map-side: lineitem enters ONE exchange (the
    # l_orderkey co-partition), not two (see broadcast_join)
    from setsketch_ray.functions.relational import broadcast_join

    supp_tbl = pq.read_table(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_nationkey"])
    j2 = broadcast_join(j1, supp_tbl, "l_suppkey", "s_suppkey")

    def vol(t: pa.Table) -> pa.Table:
        c = t["rev_c"].to_numpy(zero_copy_only=False)
        sn = t["s_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({"l_year": t["l_year"],
                         "n7_c": pa.array(np.where(sn == 7, c, 0),
                                          pa.int64()),
                         "tot_c": t["rev_c"]})

    agg = grouped_aggregate(j2.map_batches(vol, batch_format="pyarrow"),
                            ["l_year"], {"n7_c": ("sum", "n7_c"),
                                         "tot_c": ("sum", "tot_c")})
    share = agg["n7_c"].to_numpy().astype(np.float64) \
        / agg["tot_c"].to_numpy().astype(np.float64)
    return pa.table({"l_year": agg["l_year"],
                     "mkt_share": pa.array(share, pa.float64())})


def _q_doc_tokens(sf_dir: str):
    """Explode/flat_map: one (doc_id, pos, word) row per token (split on
    single spaces, empties dropped AFTER positions are assigned — the
    unnest + generate_subscripts contract).  Fully vectorized: one Arrow
    split_pattern per batch, doc ids and 1-based positions from np.repeat
    over the list offsets, zero-copy value slice — no per-row Python."""
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "word": pa.array([], pa.string())})
        txt = t["text"]
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) \
            else txt
        lst = pc.split_pattern(txt, " ")
        lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) \
            else lst
        o = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = lst.values.slice(o[0], o[-1] - o[0])
        idx = o - o[0]
        sizes = np.diff(idx)
        doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), sizes)
        pos = np.arange(len(flat), dtype=np.int64) \
            - np.repeat(idx[:-1], sizes) + 1
        out = pa.table({"doc_id": pa.array(doc, pa.int64()),
                        "pos": pa.array(pos, pa.int64()),
                        "word": flat})
        return out.filter(pc.not_equal(out["word"], ""))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(explode, batch_format="pyarrow")


def _q_embedding_norm_stats(sf_dir: str):
    """Vectorized list-column kernel: per-vector squared L2 norm on the
    1e-6-scaled integer domain (exact both sides: CAST(FLOAT AS DOUBLE) is
    widening, floor(y*1e6+0.5) is IEEE-identical per element, and the
    integer square-sums associate freely), grouped per label.  One
    zero-copy pass over the flat Arrow list buffer — np.add.reduceat over
    NONEMPTY row offsets (CLAUDE.md reduceat rule), no per-row Python."""
    from setsketch_ray.functions.relational import grouped_aggregate

    def norm2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int32()),
                             "n2": pa.array([], pa.int64())})
        col = t["embedding"].combine_chunks()
        o = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = o[0]
        idx = o - base
        vals = col.values.to_numpy(zero_copy_only=False) \
            [base:o[-1]].astype(np.float64)
        e = np.floor(vals * 1e6 + 0.5).astype(np.int64)
        sq = e * e
        n = t.num_rows
        out = np.zeros(n, dtype=np.int64)
        sizes = np.diff(idx)
        nz = sizes > 0
        if nz.any():
            out[nz] = np.add.reduceat(sq, idx[:-1][nz])
        return pa.table({"label": t["label"],
                         "n2": pa.array(out, pa.int64())})

    ds = _read(sf_dir, "embeddings", ["embedding", "label"])
    return grouped_aggregate(ds.map_batches(norm2, batch_format="pyarrow"),
                             ["label"], {"n_vecs": ("count", None),
                                         "norm2_scaled": ("sum", "n2")})


def _q_events_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: the 256 hash-smallest events of
    EVERY event_type (functions/relational.stratified_sample — per-batch
    combiner keeps <= k rows per group per block, one group co-partition
    finishes).  Exactly oracled via QUALIFY row_number() over the same
    SQL-expressible Knuth hash order."""
    from setsketch_ray.functions.relational import stratified_sample

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return stratified_sample(ds, "event_type", "event_id", 256)


def _q_video_frame_phash(sf_dir: str):
    """Video frame sampling + perceptual hashing over a deterministic
    mixed-container corpus (~3/4 MJPEG-in-AVI, ~1/4 animated GIF): the REAL
    container paths (sources/video.py RIFF index slicing — unsampled frames
    are never decoded — and sources/gif.py LZW timeline compositing)
    produce standalone image blobs which are then pixel-decoded with the
    engine's own codecs and phashed.  ORACLED as invariant rows (constant
    SQL): binary container/codec work is not SQL-expressible, but the
    sampling contract is — every clip yields >= 1 frame with exactly one
    phash per sampled frame (``coverage_ok``), presentation timestamps are
    strictly increasing and inside [0, (n_frames-1)/fps] per the corpus
    metadata (``ts_ok``), and the hash stream is non-degenerate
    (``diversity_ok``: >= n_clips distinct phashes across the corpus).
    Codec fidelity (PSNR >= 40 dB at q90 / lossless GIF) is asserted in
    tests/test_av_codecs.py."""
    from setsketch_ray.functions.knn import _pool_size
    from setsketch_ray.sources.av import videos_dataset
    from setsketch_ray.sources.codec import decode_image, phash64_batch
    from setsketch_ray.stages.image import VideoFrameSampleStage

    ds = videos_dataset(96, parallelism=8).map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"every_n_seconds": 1.0},
        batch_format="pyarrow", concurrency=_pool_size())

    def explode(t: pa.Table) -> pa.Table:
        vids, tss, hashes, nf, fps = [], [], [], [], []
        for vid, frames, ts, n_frames, clip_fps in zip(
                t["video_id"].to_pylist(), t["frames"].to_pylist(),
                t["frame_ts"].to_pylist(), t["n_frames"].to_pylist(),
                t["fps"].to_pylist()):
            # decode_image sniffs magic: AVI frames are JPEG slices, GIF
            # frames are PNG re-encodes
            pix = np.stack([decode_image(b, "jpg") for b in frames])
            vids.extend([vid] * len(frames))
            tss.extend(ts)
            nf.extend([n_frames] * len(frames))
            fps.extend([clip_fps] * len(frames))
            hashes.extend(phash64_batch(pix).astype(np.int64).tolist())
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "frame_ts": pa.array(tss, pa.float64()),
            "phash": pa.array(hashes, pa.int64()),
            "n_frames": pa.array(nf, pa.int64()),
            "fps": pa.array(fps, pa.float64()),
        })

    rows = ds.map_batches(explode, batch_format="pyarrow") \
        .sort(["video_id", "frame_ts"]).take_all()
    per_clip: dict = {}
    for r in rows:
        per_clip.setdefault(r["video_id"], []).append(r)
    coverage = all(1 <= len(v) <= v[0]["n_frames"]
                   for v in per_clip.values())
    ts_ok = all(
        all(b["frame_ts"] > a["frame_ts"] for a, b in zip(v, v[1:]))
        and v[0]["frame_ts"] >= 0.0
        and v[-1]["frame_ts"] <= (v[0]["n_frames"] - 1) / v[0]["fps"] + 1e-6
        for v in per_clip.values())
    diversity = len({r["phash"] for r in rows}) >= len(per_clip)
    return pa.table({
        "n_clips": pa.array([len(per_clip)], pa.int64()),
        "coverage_ok": pa.array([int(coverage)], pa.int64()),
        "ts_ok": pa.array([int(ts_ok)], pa.int64()),
        "diversity_ok": pa.array([int(diversity)], pa.int64())})


def _q_near_dup_videos(sf_dir: str):
    """Near-duplicate video detection (pipelines/videodedup.py): frame
    sampling through the real AVI/GIF container codecs -> per-frame phash
    -> octet-pair Hamming LSH over frame hashes (only (band_key, part, id)
    rows shuffle) -> symmetric frame-set containment verify via the
    broadcast worker-cache pool.  Catches lossy re-encodes, container swaps
    and temporal trims.  ORACLED as invariant rows: codec + LSH are not
    SQL-expressible, but the planted truth IS analytic
    (sources/av.truth_video_pairs — derived from the corpus construction,
    no video synthesis, mirrored into the oracle's pair count) —
    ``recall_ok``/``precision_ok`` certify exact set equality of the
    detected pairs vs that truth (measured 1.0/1.0 across AVI q75
    re-encode, GIF/aWebP container swaps and first-frame trims)."""
    from setsketch_ray.pipelines.videodedup import near_dup_videos
    from setsketch_ray.sources.av import truth_video_pairs, videos_dataset

    n = 160
    pairs = near_dup_videos(videos_dataset(n, parallelism=8),
                            every_n_seconds=0.25).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    truth = truth_video_pairs(n)
    ts = set(zip(truth["id_a"].to_pylist(), truth["id_b"].to_pylist()))
    return pa.table({
        "n_true_pairs": pa.array([len(ts)], pa.int64()),
        "recall_ok": pa.array([int(ts <= got)], pa.int64()),
        "precision_ok": pa.array([int(got <= ts)], pa.int64())})


def _q_near_dup_audio(sf_dir: str):
    """Near-duplicate audio detection (pipelines/audiodedup.py — the audio
    member of the modality family): real-codec decode (WAV PCM/G.711/
    ADPCM + FLAC + FLAC-in-Ogg) -> fixed-grid spectral fingerprint (top
    peak + top-64 sparse spectrum) -> two-shifted-grid frequency-cell LSH
    (EXACT recall for peak drift <= 2 Hz; measured drift <= 0.01 Hz) ->
    sparse spectral cosine verify via the broadcast worker-cache pool
    (measured gap: true pairs >= 0.991, false <= 0.845; threshold 0.92).
    Catches G.711/ADPCM lossy re-encodes, codec swaps and 50 ms head
    trims.  ORACLED as invariant rows: codecs + FFT are not
    SQL-expressible, but the planted truth is analytic
    (sources/av.truth_audio_pairs — a pure function of the corpus
    construction, mirrored into the oracle's pair count);
    recall_ok/precision_ok certify exact pair-set equality."""
    from setsketch_ray.pipelines.audiodedup import near_dup_audio
    from setsketch_ray.sources.av import audio_dedup_dataset, \
        truth_audio_pairs

    n = 192
    pairs = near_dup_audio(audio_dedup_dataset(n, parallelism=8)).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    truth = truth_audio_pairs(n)
    ts = set(zip(truth["id_a"].to_pylist(), truth["id_b"].to_pylist()))
    return pa.table({
        "n_true_pairs": pa.array([len(ts)], pa.int64()),
        "recall_ok": pa.array([int(ts <= got)], pa.int64()),
        "precision_ok": pa.array([int(got <= ts)], pa.int64())})


def _q_audio_fingerprint(sf_dir: str):
    """Audio feature extraction over a 6-codec corpus — PCM16, G.711
    mu-law, G.711 A-law, IMA ADPCM (sources/audio.py; ADPCM advances every
    block's state machine in lockstep), FLAC (sources/flac.py — full
    lossless decode, CRC+MD5 verified) and FLAC-in-Ogg
    (sources/containers.py — page/packet reassembly into the native
    decoder) rows all REALLY decoded by the engine's own parsers.  Emits
    integer-scaled scalar features plus the dominant spectral band per
    clip, then certifies them per codec against an INDEPENDENT truth: the
    same feature function over the raw synthetic waveform
    (sources/av.audio_signal), bypassing every codec.  ORACLED as
    invariant rows (per-fmt counts are a pure corpus-definition function
    mirrored into the VALUES list): lossless codecs (pcm16 / FLAC /
    FLAC-in-Ogg) must match the truth features EXACTLY after integer
    scaling (``lossless_exact_ok``); G.711 stays within 1 milli-rms with
    exact zcr + dominant band; IMA ADPCM within 5 milli-rms / 12
    milli-zcr and +8 ms block padding (measured maxima 0.9 / 4.2 / 11.2
    milli — the band check is waived for ADPCM, whose quantization noise
    can flip the argmax between two near-equal tones)."""
    from setsketch_ray.functions.knn import _pool_size
    from setsketch_ray.sources.av import audio_dataset
    from setsketch_ray.stages.image import AudioFeatureStage

    ds = audio_dataset(256, parallelism=8).map_batches(
        AudioFeatureStage, batch_format="pyarrow", concurrency=_pool_size())

    def project(t: pa.Table) -> pa.Table:
        f = np.asarray(t["audio_features"].to_pylist(), dtype=np.float64)
        return pa.table({
            "audio_id": t["audio_id"],
            "fmt": t["fmt"],
            "duration_ms": pa.array(
                np.floor(f[:, 0] * 1000 + 0.5).astype(np.int64)),
            "rms_milli": pa.array(
                np.floor(f[:, 1] * 1000 + 0.5).astype(np.int64)),
            "zcr_milli": pa.array(
                np.floor(f[:, 2] * 1000 + 0.5).astype(np.int64)),
            "dominant_band": pa.array(
                np.argmax(f[:, 3:], axis=1).astype(np.int64)),
        })

    rows = ds.map_batches(project, batch_format="pyarrow") \
        .sort("audio_id").take_all()

    from setsketch_ray.sources.av import audio_signal
    from setsketch_ray.stages.image import AudioFeatureStage

    feat_fn = AudioFeatureStage()._signal_features
    lossless = {"pcm16", "flac", "oggflac"}
    stats: dict = {}
    for r in rows:
        idx = int(r["audio_id"][3:])
        f = feat_fn(audio_signal(42, idx, 8000).astype(np.float64)
                    / 32768.0, 8000)
        t_dur = int(np.floor(f[0] * 1000 + 0.5))
        t_rms = int(np.floor(f[1] * 1000 + 0.5))
        t_zcr = int(np.floor(f[2] * 1000 + 0.5))
        t_band = int(np.argmax(np.asarray(f[3:])))
        fmt = r["fmt"]
        s = stats.setdefault(fmt, {"n": 0, "dur": True, "exact": True,
                                   "rms": True, "zcr": True, "band": True})
        s["n"] += 1
        s["dur"] &= (r["duration_ms"] - t_dur <= 8 if fmt == "ima"
                     else r["duration_ms"] == t_dur) and t_dur == 500
        if fmt in lossless:
            s["exact"] &= ((r["duration_ms"], r["rms_milli"],
                            r["zcr_milli"], r["dominant_band"])
                           == (t_dur, t_rms, t_zcr, t_band))
        rms_tol, zcr_tol = (5, 12) if fmt == "ima" else (1, 0)
        s["rms"] &= abs(r["rms_milli"] - t_rms) <= rms_tol
        s["zcr"] &= abs(r["zcr_milli"] - t_zcr) <= zcr_tol
        if fmt != "ima":
            s["band"] &= r["dominant_band"] == t_band
    fmts = sorted(stats)
    return pa.table({
        "fmt": pa.array(fmts, pa.string()),
        "n_clips": pa.array([stats[f]["n"] for f in fmts], pa.int64()),
        "duration_ok": pa.array(
            [int(stats[f]["dur"]) for f in fmts], pa.int64()),
        "lossless_exact_ok": pa.array(
            [int(stats[f]["exact"]) for f in fmts], pa.int64()),
        "rms_ok": pa.array([int(stats[f]["rms"]) for f in fmts], pa.int64()),
        "zcr_ok": pa.array([int(stats[f]["zcr"]) for f in fmts], pa.int64()),
        "band_ok": pa.array(
            [int(stats[f]["band"]) for f in fmts], pa.int64())})


def _q_arrow_roundtrip(sf_dir: str):
    """Documents round-tripped through Arrow IPC (Feather v2) shards
    (sources/arrow_ipc.py write + the read_corpus ``*.arrow`` source):
    hash-assigned deterministic shards, one writer task per shard, atomic
    renames; reads are one-file-per-task with an in-task zero-copy
    RecordBatchFileReader.  ORACLED: lossless round trip — per-doc byte
    counts and lang match strlen(text) straight off the parquet.  Shards
    build once per sf_dir under /tmp behind a _SUCCESS marker."""
    import hashlib
    import os

    import pyarrow.compute as pc

    from setsketch_ray.sources.arrow_ipc import write_arrow_shards
    from setsketch_ray.sources.readers import read_corpus

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|arrow8".encode()) \
        .hexdigest()[:12]
    root = f"/tmp/arrow_shards_{fp}"
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.isfile(marker):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        write_arrow_shards(ds, root, key_col="doc_id", num_shards=8)
        with open(marker, "w") as fh:
            fh.write("8 shards\n")

    def summarize(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "n_bytes": pc.cast(pc.binary_length(
                pc.cast(t["text"], pa.binary())), pa.int64())})

    return read_corpus(root).map_batches(
        summarize, batch_format="pyarrow").sort("doc_id")


def _q_sqlite_roundtrip(sf_dir: str):
    """Documents round-tripped through SQLite shard DBs (sources/sqlite.py
    — stdlib codec over the public SQLite file format; the layout many
    annotation/crawl-slice corpora ship in): write_sqlite_shards
    hash-assigns every doc to one of 8 deterministic shard DBs (one
    groupby exchange, one writer task per shard, single-transaction
    inserts with pinned pragmas = bit-reproducible bytes, atomic rename),
    read_corpus dispatches the directory back one-file-per-task with the
    declared-type mapping restoring exact Arrow dtypes.  ORACLED: the
    round trip is lossless, so per-doc byte counts and lang must match
    strlen(text) straight off the parquet.  Shards build once per sf_dir
    under /tmp behind a _SUCCESS marker."""
    import hashlib
    import os

    import pyarrow.compute as pc

    from setsketch_ray.sources.readers import read_corpus
    from setsketch_ray.sources.sqlite import write_sqlite_shards

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|sqlite8".encode()) \
        .hexdigest()[:12]
    root = f"/tmp/sqlite_shards_{fp}"
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.isfile(marker):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        write_sqlite_shards(ds, root, key_col="doc_id", num_shards=8)
        with open(marker, "w") as fh:
            fh.write("8 shards\n")

    def summarize(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "n_bytes": pc.cast(pc.binary_length(
                pc.cast(t["text"], pa.binary())), pa.int64())})

    return read_corpus(root).map_batches(
        summarize, batch_format="pyarrow").sort("doc_id")


def _q_wds_roundtrip(sf_dir: str):
    """Documents round-tripped through WebDataset tar shards (the standard
    layout for web-scale multimodal training corpora): write_wds_shards
    hash-assigns every doc to one of 16 deterministic tar shards (one
    groupby exchange, one writer task per shard, bit-reproducible bytes),
    read_wds_shards reads them back one-shard-per-task.  ORACLED: the
    round trip is lossless, so per-doc utf-8 byte counts and lang must
    match octet_length(text) straight off the parquet — any tar framing,
    key-grouping or encoding bug breaks the hash.  Shards are built once
    per sf_dir under /tmp and reused (idempotent layout, sources/
    webdataset.py)."""
    import hashlib
    import os

    import pyarrow.compute as pc

    from setsketch_ray.sources.webdataset import (
        read_wds_shards,
        write_wds_shards,
    )

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|wds16".encode()) \
        .hexdigest()[:12]
    root = f"/tmp/wds_shards_{fp}"
    # cache validity = a _SUCCESS marker written AFTER the full shard set
    # landed; a crash mid-write leaves a partial directory without it,
    # which is wiped and rebuilt instead of being reused forever.
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.isfile(marker):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        write_wds_shards(ds, root, key_col="doc_id",
                         components={"text": "txt", "lang": "lang"},
                         num_shards=16, key_format="{:012d}")
        with open(marker, "w") as fh:
            fh.write("16 shards\n")

    def summarize(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["__key__"], pa.int64()),
            "lang": t["lang"],
            "n_bytes": pc.cast(pc.binary_length(
                pc.cast(t["txt"], pa.binary())), pa.int64())})

    return read_wds_shards(root).map_batches(
        summarize, batch_format="pyarrow").sort("doc_id")


def _messy_urls(sf_dir: str):
    """Deterministic messy-URL table from doc_id arithmetic (mixed-case
    scheme/host, default + explicit ports, dot-segments, unsorted query
    params, fragments) — the synthesis is the corpus definition, shared
    verbatim with the SQL mirror's CANONICAL construction."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        urls = []
        for i in t["doc_id"].to_pylist():
            i = int(i)
            scheme = "HTTPS" if i % 2 else "http"
            www = "WWW." if i % 3 == 0 else ""
            port = (":443" if i % 2 else ":80") if i % 4 == 0 \
                else (":8080" if i % 4 == 1 else "")
            frag = "#sec" if i % 2 else ""
            urls.append(
                f"{scheme}://{www}H{i % 23}.Example.COM{port}"
                f"/a/./b{i % 7}/../c{i % 11}?z={i % 5}&a={i % 3}{frag}")
        return t.append_column("url", pa.array(urls, pa.string()))

    return ds.map_batches(synth, batch_format="pyarrow")


def _q_url_normalize(sf_dir: str):
    """URL canonicalization (functions/text.normalize_urls — RFC 3986 §6
    subset: lowercase scheme+host, default-port strip, dot-segment removal,
    stable query-param sort, fragment drop) over a deterministic messy-URL
    table derived from doc_id.  ORACLED EXACTLY: the PARSER normalizes the
    messy string; the SQL mirror CONSTRUCTS the canonical form straight
    from the same doc_id arithmetic — any parser bug (port logic, dot
    segments, param order, case) breaks the string hash."""
    from setsketch_ray.functions.text import normalize_urls

    return normalize_urls(_messy_urls(sf_dir)) \
        .select_columns(["doc_id", "url_norm", "host"]).sort("doc_id")


def _q_domain_cap_docs(sf_dir: str):
    """Per-domain frequency capping (web-corpus curation: bound any single
    host's contribution): normalize URLs, keep the 3 smallest doc_ids per
    canonical host (functions/relational.top_k_per_group — hash-partition
    by host, one vectorized lexsort+rank pass, no global sort).  ORACLED:
    row_number() OVER (PARTITION BY host ORDER BY doc_id) <= 3 on the
    SQL-constructed canonical hosts."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import top_k_per_group
    from setsketch_ray.functions.text import normalize_urls

    urls = normalize_urls(_messy_urls(sf_dir)) \
        .select_columns(["doc_id", "host"])

    def add_neg(t: pa.Table) -> pa.Table:
        return t.append_column(
            "neg_id", pc.negate_checked(t["doc_id"]))

    capped = top_k_per_group(urls.map_batches(add_neg,
                                              batch_format="pyarrow"),
                             "host", "neg_id", k=3)
    return capped.select_columns(["doc_id", "host"]).sort("doc_id")


def _q_lineitem_profile(sf_dir: str):
    """Distributed column profiler over lineitem
    (functions/relational.profile_columns — the data-quality pass a 100 TB
    ingest runs first): per column row/null counts, typed min/max, EXACT
    distinct (one slim (col, hash) exchange for ALL columns) and a GHLL
    approximate distinct riding the same stats pass.  ORACLED EXACTLY on
    counts/min/max/distincts; the m=4096 estimate is certified by
    ``est_ok`` (<= 6% relative error; expected RSD ~1.6%)."""
    from setsketch_ray.functions.relational import profile_columns

    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
            "l_linestatus"]
    t = profile_columns(_read(sf_dir, "lineitem", cols), cols)
    exact = t["n_distinct"].to_numpy()
    est = t["approx_distinct"].to_numpy()
    ok = (np.abs(est / exact - 1.0) <= 0.06).astype(np.int64)
    return pa.table({
        "col": t["column"],
        "n": t["n"],
        "n_null": t["n_null"],
        "n_distinct": t["n_distinct"],
        "min_str": t["min_str"],
        "max_str": t["max_str"],
        "est_ok": pa.array(ok, pa.int64())}).sort_by("col")


def _q_word_freq_cms(sf_dir: str):
    """Count-Min sketch word frequencies certified against the exact
    distributed wordcount (sketchlib/countmin.py — Cormode & Muthukrishnan
    2005; the fixed-memory scale path when even distinct (word, cnt) pairs
    are too wide to shuffle).  One map_batches pass emits a 320 KB linear
    partial per block; the driver sums them (merge order irrelevant by
    linearity).  ORACLED: exact top-20 (word, cnt) mirror in SQL plus two
    structural certificates — ``over_ok`` (CMS never under-counts, holds
    by construction) and ``bound_ok`` (measured overshoot <= 8x the
    expected single-row collision mass n/width; the min over depth=5 rows
    makes a top word's overshoot ~0 — measured 0 at every sf)."""
    from setsketch_ray.functions.text import word_freq_cms

    return word_freq_cms(_read(sf_dir, "documents", ["text"]), "text", k=20)


def _q_cdc_bytes_images(sf_dir: str):
    """Byte-domain gear-hash CDC dedup stats over the deterministic
    256-image binary corpus (functions/dedup.gear_cdc_boundaries /
    cdc_bytes_stats — the FastCDC storage-dedup primitive, Xia et al.
    2016; the word-domain sibling `cdc_chunk_stats` carries the exact SQL
    oracle, this one exercises the production byte predicate).  The gear
    recurrence is vectorized via the 64-shift window identity.  ORACLED
    as invariant rows: the gear hash is not SQL-expressible, so the
    certificates are (a) vectorized hashes == the independent per-byte
    scalar reference on a deterministic 1/4 blob subsample, (b) chunks
    reassemble bit-exactly to every blob, (c) all sizes within the
    [avg/4, 4*avg] FastCDC bounds, (d) count/byte consistency; n_blobs
    mirrors the corpus constant."""
    from setsketch_ray.functions.dedup import cdc_bytes_stats
    from setsketch_ray.sources.images import images_dataset

    res = cdc_bytes_stats(images_dataset(256, seed=42, parallelism=8),
                          "image_id", "bytes", avg_bits=9,
                          scalar_check_mod=4)
    consistent = int(
        res["distinct_chunks"] <= res["total_chunks"]
        and res["distinct_bytes"] <= res["total_bytes"]
        and res["total_chunks"] > 0)
    return pa.table({
        "n_blobs": pa.array([res["n_blobs"]], pa.int64()),
        "reassembly_ok": pa.array([res["reassembly_ok"]], pa.int64()),
        "bounds_ok": pa.array([res["bounds_ok"]], pa.int64()),
        "vec_scalar_ok": pa.array([res["vec_scalar_ok"]], pa.int64()),
        "dedup_consistent": pa.array([consistent], pa.int64())})


def _q_cdc_chunk_stats(sf_dir: str):
    """Content-defined chunking dedup statistics (functions/dedup.
    cdc_chunk_stats — the rsync/LBFS storage-dedup primitive): docs split
    at content-defined word boundaries (insertion-stable, unlike fixed
    blocks), chunks deduped corpus-wide; top-10 chunks by occurrence plus
    the global total/distinct chunk counts.  One vectorized derive pass
    (the line_dedup offsets trick), per-block (chunk, doc, cnt) combine,
    ONE slim hash(chunk) exchange.  ORACLED EXACTLY: the boundary rule is
    a word regexp, so the SQL window-sum reconstruction mirrors it
    bit-for-bit (integer counts, deterministic top-k tiebreak)."""
    from setsketch_ray.functions.dedup import cdc_chunk_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return cdc_chunk_stats(ds, "doc_id", "text")


def _q_line_dedup_docs(sf_dir: str):
    """Corpus-level duplicated-line removal (functions/text.line_dedup —
    the CCNet / RefinedWeb curation step: boilerplate lines repeated
    across pages are dropped from EVERY carrying doc).  Lines are
    10-word windows of the single-spaced corpus; a line duplicated in
    >= 2 DISTINCT docs is removed everywhere and each doc's text is
    rebuilt from its kept lines.  Two slim all-to-all exchanges (by
    hash(line) then hash(doc_id)); each line string ships at most once,
    dropped occurrences travel as (id, line_no, NULL) tombstones — no
    driver set, no broadcast of the (corpus-sized at 100 TB) dup-line
    head.  ORACLED EXACTLY: pure string/integer ops, mirrored by the
    SQL list-slice + string_agg reconstruction."""
    from setsketch_ray.functions.text import line_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return line_dedup(ds, "doc_id", "text", words_per_line=10,
                      min_docs=2).sort("doc_id")


def _q_events_outliers(sf_dir: str):
    """Per-group 3-sigma outlier counts (functions/validate.zscore_outliers
    — the distribution-shaped data-quality rule where the bound itself
    comes from the data): integer sufficient statistics per event_type,
    then one broadcast map pass counting ``(n*v - sum)^2 > 9*(n*sumsq -
    sum^2)`` — |v - mean| > 3 sigma with every division cleared.  ORACLED
    EXACTLY: the comparison is the IDENTICAL float expression tree on
    both engines over int64 operands < 2^53 (the value_variance_by_type
    convention), so the verdict bit matches row for row."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.validate import zscore_outliers

    def scaled(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "v_c": pc.round(pc.multiply(t["value"], 100.0))
            .cast(pa.int64())})

    ev = _read(sf_dir, "events", ["event_type", "value"]) \
        .map_batches(scaled, batch_format="pyarrow")
    return zscore_outliers(ev, "event_type", "v_c", k_sigma=3.0)


def _q_table_diff_docs(sf_dir: str):
    """Keyed snapshot diff (functions/diff.py — the data-versioning
    primitive): documents vs a deterministically perturbed next version
    (drop doc_id%97==0, append ' MOD' to text of doc_id%89==0, add new
    rows at doc_id+10M for doc_id%101==0), classified added / removed /
    changed / unchanged in one slim (key, content-hash) co-partition
    exchange — payloads never move.  ORACLED EXACTLY: the oracle builds
    the SAME version-B with identical integer arithmetic and classifies
    via FULL OUTER JOIN; per-class row count + key checksum (sum of
    doc_ids, < 2^53) pin every key to its class."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.diff import diff_tables
    from setsketch_ray.functions.relational import grouped_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def make_b(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        mod = pc.if_else(pa.array(did % 89 == 0),
                         pc.binary_join_element_wise(
                             t["text"], pa.scalar(" MOD"), ""),
                         t["text"])
        base = pa.table({"doc_id": t["doc_id"], "text": mod}) \
            .filter(pa.array(did % 97 != 0))
        new_ids = did[did % 101 == 0] + 10_000_000
        added = pa.table({
            "doc_id": pa.array(new_ids, pa.int64()),
            "text": pa.array(["new row"] * len(new_ids), pa.string())})
        return pa.concat_tables([base, added])

    b = docs.map_batches(make_b, batch_format="pyarrow")
    d = diff_tables(docs, b, "doc_id", ["text"])
    g = grouped_aggregate(d, ["status"], {
        "n": ("count", None), "key_sum": ("sum", "doc_id")}, final="ray")
    return g.sort("status")


def _q_validate_lineitem(sf_dir: str):
    """Distributed data-validation report (functions/validate.py — the
    Deequ/Great-Expectations-shaped constraint pass a 100 TB ingest runs
    first): all row-local rules (not_null / range / in_set / RE2
    full-match regex) in ONE vectorized map pass emitting counter rows
    only; composite-key uniqueness via one slim pre-deduplicated
    value exchange (exact, no hash-collision risk); referential
    integrity via one anti-mode semi_anti_join (right side ships only
    its key column).  ORACLED EXACTLY: every rule is a SQL count pair
    (the rule mix is deliberately part-violating — qty/discount ranges
    and the returnflag set fail on real rows, linestatus regex and the
    orders FK pass, and (l_orderkey, l_linenumber) is genuinely
    non-unique in this synthetic table)."""
    from setsketch_ray.functions.validate import validate_table

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity", "l_discount",
                "l_returnflag", "l_linestatus"])
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    return validate_table(li, [
        ("not_null", "l_orderkey"),
        ("range", "l_quantity", 1.0, 45.0),
        ("range", "l_discount", 0.0, 0.08),
        ("in_set", "l_returnflag", ["A", "N"]),
        ("regex", "l_linestatus", "[OF]"),
        ("unique", ["l_orderkey", "l_linenumber"]),
        ("fk", "l_orderkey", "orders", "o_orderkey"),
    ], refs={"orders": orders})


def _q_image_quality_filter(sf_dir: str):
    """Image-side quality curation (the multimodal analog of the text
    QualityScore filter): decode every image ONCE in the map stage
    (stages/image.ImageStatsStage) into INTEGER sufficient statistics —
    channel sum, sum of squares, min, max, count — classify exposure /
    contrast with PURE INTEGER inequalities (dark: mean < 120  <=>
    sum < 120*n; bright: mean > 136; flat: var < 70^2  <=>
    n*sumsq - sum^2 < 4900*n^2 — no float ever enters a verdict), then
    aggregate per (fmt, verdict): count + exact int64 pixel-sum totals.
    ORACLED as invariant rows (VALUES mirror): the 2000-image corpus is
    a pure function of seed 42 and both codecs are deterministic, so
    the class counts AND the exact aggregate sums are corpus constants
    — one pixel off anywhere in any decode path shifts sum_px/sum_sq
    and turns a row red.  The bytes column is dropped inside the decode
    stage itself, so only ~40 B/row of integer stats reach the
    exchange."""
    import ray.data as rd

    from setsketch_ray.functions.relational import grouped_aggregate
    from setsketch_ray.sources import cached_images_parquet
    from setsketch_ray.stages.image import ImageStatsStage

    ds = rd.read_parquet(cached_images_parquet(2000))
    stats = ds.map_batches(ImageStatsStage(), batch_format="pyarrow",
                           batch_size=256)

    def verdict(t: pa.Table) -> pa.Table:
        s = t["px_sum"].to_numpy()
        ss = t["px_sumsq"].to_numpy()
        n = t["n_vals"].to_numpy()
        v = np.select(
            [n == 0, s < 120 * n, s > 136 * n,
             n * ss - s * s < 4900 * n * n],
            ["undecodable", "dark", "bright", "flat"], default="ok")
        return pa.table({
            "fmt": t["fmt"],
            "verdict": pa.array(v.astype(object), pa.string()),
            "px_sum": t["px_sum"], "px_sumsq": t["px_sumsq"]})

    g = grouped_aggregate(
        stats.map_batches(verdict, batch_format="pyarrow"),
        ["fmt", "verdict"],
        {"n": ("count", None), "sum_px": ("sum", "px_sum"),
         "sum_sq": ("sum", "px_sumsq")}, final="ray")
    return g.sort(["fmt", "verdict"])


def _q_tiered_dedup_images(sf_dir: str):
    """Tiered IMAGE dedup cascade (the graft's title axis, image side):
    tier 1 exact raw bytes+caption, tier 2 exact decoded content
    (xor-folded shingle content keys over phash-visual + caption
    modalities — catches re-encodes with identical perceptual content;
    pipelines/dedup._exact_groups / DedupConfig(collapse_exact=True)),
    tier 3 MinHash-LSH near-dup over the tier-2 representatives only,
    with clusters re-expanded through the exact groups.  ORACLED as
    invariant rows: tier counts are deterministic corpus constants
    (t1=0 — the synthetic variants are never byte-identical, t2=70,
    t3=64 of 2 000 images); ``monotone_ok`` certifies tier nesting
    (byte-equal implies content-equal); ``recall_ok``/``precision_ok``
    hold the north-rule >= 0.99 bar vs the analytic planted truth; and
    ``partition_equal_ok`` certifies the STRONG cascade contract — the
    tiered pipeline's final cluster partition is IDENTICAL to the
    untiered flagship's (collapsing exact groups before LSH must never
    change the answer, only the work).  Perf: the collapse shares ONE
    decode+shingle+sketch chain with LSH (candidate_pairs pre_sketched
    path), so tiering is ~free at this corpus's ~7% dup mass (20k warm
    A/B: 2.44 s plain / 2.49 s tiered) and wins outright at web scale
    where exact-dup mass dominates the LSH input."""
    import hashlib

    import ray.data as rd

    from setsketch_ray.pipelines.dedup import (DedupConfig, _exact_groups,
                                               evaluate_recall,
                                               near_dup_pipeline)
    from setsketch_ray.sources import cached_images_parquet
    from setsketch_ray.sources.images import truth_pairs

    n = 2000
    ds = rd.read_parquet(cached_images_parquet(n))
    _, _, map_plain = near_dup_pipeline(ds, DedupConfig())
    _, _, map_tier = near_dup_pipeline(
        ds, DedupConfig(collapse_exact=True))

    def partition(m: dict) -> set:
        from collections import defaultdict

        d = defaultdict(set)
        for k, v in m.items():
            d[v].add(k)
        return {frozenset(s | {r}) for r, s in d.items()}

    part_eq = partition(map_plain) == partition(map_tier)
    rec = evaluate_recall(map_tier, truth_pairs(n))

    # tier attribution (first tier that would drop each non-canonical row)
    member_rep = _exact_groups(ds, DedupConfig(), "image_id")
    t2 = {m for m, r in member_rep.items() if r != m}
    by_hash: dict = {}
    for r in ds.select_columns(["image_id", "bytes", "caption"]) \
            .iter_rows():
        key = hashlib.sha1(r["bytes"] + r["caption"].encode()).digest()
        by_hash.setdefault(key, []).append(r["image_id"])
    t1 = {i for v in by_hash.values() if len(v) > 1 for i in sorted(v)[1:]}
    t3 = {m for m, r in map_tier.items() if r != m} - t2 - t1
    return pa.table({
        "n_images": pa.array([n], pa.int64()),
        "n_t1": pa.array([len(t1)], pa.int64()),
        "n_t2": pa.array([len(t2)], pa.int64()),
        "n_t3": pa.array([len(t3)], pa.int64()),
        "monotone_ok": pa.array([int(t1 <= t2)], pa.int64()),
        "recall_ok": pa.array([int(rec["recall"] >= 0.99)], pa.int64()),
        "precision_ok": pa.array([int(rec["precision"] >= 0.99)],
                                 pa.int64()),
        "partition_equal_ok": pa.array([int(part_eq)], pa.int64())})


def _synth_html(t: pa.Table) -> pa.Table:
    """Deterministic entity-safe HTML page per doc (shared by
    html_extract and web_pipeline): title, nav/script/style noise
    blocks, the text split across two <p> paragraphs at the word
    midpoint.  Extraction of these pages is LOSSLESS on the
    single-spaced corpus — the contract both queries are oracled on."""
    htmls = []
    for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        enc = (txt.replace("&", "&amp;").replace("<", "&lt;")
               .replace(">", "&gt;"))
        words = enc.split(" ")
        mid = max(1, len(words) // 2)
        p1, p2 = " ".join(words[:mid]), " ".join(words[mid:])
        htmls.append(
            f"<html><head><title>Doc {int(i)}</title>"
            f"<style>p {{color: red}}</style>"
            f"<script>var x = 1 < 2 && 3 > 0;</script></head>\n"
            f"<body>\n<div class=\"nav\"><!-- chrome --></div>\n"
            f"<p>{p1}</p>\n<p>{p2}</p>\n</body></html>")
    return pa.table({"doc_id": t["doc_id"],
                     "text": t["text"],
                     "html": pa.array(htmls, pa.string())})


def _q_html_extract(sf_dir: str):
    """HTML -> text extraction (functions/text.html_to_text, the Common
    Crawl WET shape) driven as a LOSSLESS round trip: each doc's text is
    entity-encoded (& first, then < >) and wrapped in deterministic markup
    — title, nav/script/style noise blocks, the text split across two <p>
    paragraphs at the word midpoint — and extraction must recover the
    EXACT original string (single-spaced corpus contract makes whitespace
    collapse the identity).  ORACLED: title and byte count reconstruct
    from doc_id/text in SQL; extracted_ok certifies string equality
    Ray-side (a tag-strip, entity-order or collapse bug flips it)."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.text import html_to_text

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    out = html_to_text(ds.map_batches(_synth_html, batch_format="pyarrow"))

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "title": t["title"],
            "n_bytes": pc.cast(pc.binary_length(t["text_extracted"]),
                               pa.int64()),
            "extracted_ok": pc.cast(
                pc.equal(t["text_extracted"], t["text"]), pa.int64())})

    return out.map_batches(project, batch_format="pyarrow").sort("doc_id")


def _q_warc_roundtrip(sf_dir: str):
    """Documents round-tripped through WARC files (the Common Crawl layout
    for web-scale text corpora, ISO 28500): write_warc_files hash-assigns
    every doc to one of 16 deterministic ``.warc.gz`` files (one groupby
    exchange, one writer task per file, one gzip member per record,
    bit-reproducible bytes), read_warc_files reads them back one file per
    task with decompression under the parser's control.  ORACLED: the
    round trip is lossless, so per-doc utf-8 byte counts and the
    WARC-Identified-Content-Language tag must match strlen(text) / lang
    straight off the parquet — any framing, Content-Length or gzip-member
    bug breaks the hash.  Files are built once per sf_dir under /tmp and
    reused behind a _SUCCESS marker (partial dirs wiped + rebuilt)."""
    import hashlib
    import os

    import pyarrow.compute as pc

    from setsketch_ray.sources.warc import (read_warc_files,
                                            write_warc_files)

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|warc16".encode()) \
        .hexdigest()[:12]
    root = f"/tmp/warc_files_{fp}"
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.isfile(marker):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        write_warc_files(ds, root, key_col="doc_id", payload_col="text",
                         num_files=16,
                         uri_format="https://example.com/doc/{:012d}",
                         language_col="lang")
        with open(marker, "w") as fh:
            fh.write("16 files\n")

    def summarize(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["warc_type"], "conversion")
        t = t.filter(keep)
        # doc_id = the zero-padded tail of the record URI
        ids = [int(u.rsplit("/", 1)[1]) for u in t["uri"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "lang": t["language"],
            "n_bytes": pc.cast(pc.binary_length(t["payload"]), pa.int64())})

    return read_warc_files(root).map_batches(
        summarize, batch_format="pyarrow").sort("doc_id")


def _q_web_pipeline(sf_dir: str):
    """End-to-end web-corpus curation — the full Common Crawl shape in
    ONE streaming chain: documents render to deterministic HTML pages
    (the same entity-safe synthesis html_extract verifies), frame into
    16 gzipped WARC response files (write_warc_files, ISO 28500), then
    the pipeline reads the WARC back one file per task, extracts visible
    text (html_to_text, the WET step), exact-dedups on the EXTRACTED
    text (one text-keyed shuffle, min doc_id — survivors only proceed),
    scores LangId + QualityScore on the winners, and keeps lang 'en',
    quality >= 0.7, 100 <= bytes <= 520.  ORACLED exactly by
    composition: extraction is lossless on the single-spaced corpus, so
    the oracle is the SAME lang_id / quality_scores fragments + dedup
    winners + strlen band straight off the parquet — any WARC framing,
    gzip-member, tag-strip, dedup, scoring or filter bug surfaces as a
    value mismatch.  WARC files build once per sf_dir under /tmp behind
    a _SUCCESS marker (partial dirs wiped + rebuilt)."""
    import hashlib
    import os

    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate
    from setsketch_ray.functions.text import (LangId, QualityScore,
                                              html_to_text)
    from setsketch_ray.sources.warc import (read_warc_files,
                                            write_warc_files)

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|webpipe16".encode()) \
        .hexdigest()[:12]
    root = f"/tmp/warc_html_{fp}"
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.isfile(marker):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        write_warc_files(
            ds.map_batches(_synth_html, batch_format="pyarrow"),
            root, key_col="doc_id", payload_col="html", num_files=16,
            uri_format="https://example.com/page/{:012d}",
            content_type="text/html", warc_type="response")
        with open(marker, "w") as fh:
            fh.write("16 files\n")

    def to_docs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["warc_type"], "response"))
        ids = [int(u.rsplit("/", 1)[1]) for u in t["uri"].to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "html": t["payload"].cast(pa.string())})

    pages = read_warc_files(root).map_batches(
        to_docs, batch_format="pyarrow")

    def slim(t: pa.Table) -> pa.Table:
        # drop the heavy html column BEFORE the dedup shuffle
        return pa.table({"doc_id": t["doc_id"],
                         "text": t["text_extracted"]})

    winners = grouped_aggregate(
        html_to_text(pages).map_batches(slim, batch_format="pyarrow"),
        ["text"], {"doc_id": ("min", "doc_id")}, final="ray")
    scored = winners.map_batches(LangId(), batch_format="pyarrow") \
        .map_batches(QualityScore(), batch_format="pyarrow")

    def filt(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.floor(pc.add(pc.multiply(
            t["quality_score"], 1000000.0), 0.5)), pa.int64())
        nb = pc.cast(pc.binary_length(t["text"]), pa.int64())
        mask = pc.and_(
            pc.and_(pc.equal(t["lang_pred"], "en"),
                    pc.greater_equal(q, 700000)),
            pc.and_(pc.greater_equal(nb, 100), pc.less_equal(nb, 520)))
        out = pa.table({"doc_id": t["doc_id"], "lang_pred": t["lang_pred"],
                        "quality_score_e6": q, "n_bytes": nb})
        return out.filter(mask)

    return scored.map_batches(filt, batch_format="pyarrow").sort("doc_id")


def _q_media_probe(sf_dir: str):
    """Container-metadata probe over a mixed media corpus (AVI + animated
    GIF + 4-codec WAV + ISO-BMFF mp4 metadata stubs + Ogg Vorbis/Opus/
    Theora + Matroska/WebM + ID3-tagged MP3): typed metadata — container,
    kind, codec, dims, duration, frame count, decodability — WITHOUT
    decoding any payload (sources/video.probe_media walks the RIFF / GIF
    block / ISO box / Ogg page / EBML / MPEG-frame structures only).  The
    filter-before-decode curation op.  ORACLED as invariant rows (per-
    (container, kind) counts of the deterministic 208-blob corpus): binary
    container parsing is not SQL-expressible, but every generator KNOWS the
    parameters it encoded — each blob carries its expected container /
    kind / codec / dims / duration / frame count / decodability alongside
    the bytes, and the certificate columns flip red if the probe's parse
    of the BYTES disagrees with the generation parameters anywhere in the
    group (a mis-classified container also shifts the group counts off the
    VALUES list).  Parser exactness is additionally asserted in
    tests/test_av_codecs.py."""
    import ray.data as rd

    from setsketch_ray.sketchlib.hashing import mix2
    from setsketch_ray.sources.av import audio_dataset, videos_dataset
    from setsketch_ray.stages.image import MediaProbeStage

    def _exp(ids, blobs, cont, kind, codec, w, h, dur_ms, nf, dec):
        n = len(ids)

        def col(v, typ):
            return pa.array(v if isinstance(v, list) else [v] * n, typ)

        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "exp_container": col(cont, pa.string()),
            "exp_kind": col(kind, pa.string()),
            "exp_codec": col(codec, pa.string()),
            "exp_w": col(w, pa.int32()), "exp_h": col(h, pa.int32()),
            "exp_dur_ms": col(dur_ms, pa.int64()),
            "exp_nf": col(nf, pa.int32()),
            "exp_dec": col(dec, pa.int8())})

    def vid_exp(t: pa.Table) -> pa.Table:
        # stored fmt IS the container name (avi / gif / webp)
        return _exp(t["video_id"].to_pylist(), t["bytes"].to_pylist(),
                    t["fmt"].to_pylist(), "video", "",
                    t["w"].to_pylist(), t["h"].to_pylist(), -1,
                    t["n_frames"].to_pylist(), 1)

    _AUD_CONT = {"pcm16": "wav", "ulaw": "wav", "alaw": "wav",
                 "ima": "wav", "flac": "flac", "oggflac": "ogg"}

    def aud_exp(t: pa.Table) -> pa.Table:
        fmts = t["fmt"].to_pylist()
        # IMA ADPCM pads to whole blocks: block_align 256 mono carries
        # (256-4)*2+1 = 505 samples/block, so 4000 samples -> 8 blocks =
        # 4040 samples = 505 ms; every other codec is sample-exact 500 ms
        durs = [505 if f == "ima" else 500 for f in fmts]
        return _exp(t["audio_id"].to_pylist(), t["bytes"].to_pylist(),
                    [_AUD_CONT[f] for f in fmts], "audio", "",
                    0, 0, durs, -1, 1)

    vids = videos_dataset(64, parallelism=8).map_batches(
        vid_exp, batch_format="pyarrow")
    auds = audio_dataset(64, parallelism=8).map_batches(
        aud_exp, batch_format="pyarrow")

    def gen_mp4(batch: pa.Table) -> pa.Table:
        from setsketch_ray.sources.mp4 import build_mp4_stub

        ids, blobs, ws, hs, durs, codecs = [], [], [], [], [], []
        for i in batch["id"].to_pylist():
            h = int(mix2(np.uint64(i), 77))
            w, ht = 320 + 16 * (h % 60), 240 + 16 * ((h >> 8) % 40)
            dur = round(1 + (h >> 16) % 300, 1)
            codec = b"avc1" if h % 2 else b"hev1"
            blobs.append(build_mp4_stub(
                w, ht, duration_s=dur, codec=codec,
                with_audio=bool((h >> 24) % 2)))
            ids.append(f"mp4{i:010d}")
            ws.append(w)
            hs.append(ht)
            durs.append(int(round(dur * 1000)))
            codecs.append(codec.decode())
        return _exp(ids, blobs, "mp4", "video", codecs, ws, hs, durs,
                    -1, 0)

    mp4s = rd.range(32, override_num_blocks=4).map_batches(
        gen_mp4, batch_format="pyarrow", batch_size=None)

    def gen_web(batch: pa.Table) -> pa.Table:
        from setsketch_ray.sources.containers import (
            build_mkv_stub,
            build_mp3_stub,
            build_ogg_stub,
        )

        ids, blobs = [], []
        conts, kinds, codecs, ws, hs, durs, decs = [], [], [], [], [], [], []
        for i in batch["id"].to_pylist():
            h = int(mix2(np.uint64(i), 78))
            kind = h % 5
            dur = round(1 + (h >> 8) % 200, 1)
            if kind == 0:
                codec = ("vorbis", "opus", "theora")[(h >> 16) % 3]
                w, ht = 320 + 16 * ((h >> 24) % 40), 240 + 16 * ((h >> 28) % 20)
                blobs.append(build_ogg_stub(
                    codec, dur, rate=44100 if codec == "vorbis" else 48000,
                    channels=1 + (h >> 20) % 2, w=w, h=ht, fps=24.0))
                ids.append(f"ogg{i:010d}")
                conts.append("ogg")
                kinds.append("video" if codec == "theora" else "audio")
                codecs.append(codec)
                ws.append(w if codec == "theora" else 0)
                hs.append(ht if codec == "theora" else 0)
                durs.append(int(round(dur * 1000)))
                decs.append(0)
            elif kind == 1:
                w, ht = 320 + 16 * ((h >> 16) % 60), 240 + 16 * ((h >> 22) % 40)
                codec = ("V_VP9", "V_AV1")[(h >> 28) % 2]
                webm = bool((h >> 30) % 2)
                blobs.append(build_mkv_stub(
                    w, ht, dur, codec=codec, webm=webm,
                    with_audio=bool((h >> 31) % 2)))
                ids.append(f"mkv{i:010d}")
                conts.append("webm" if webm else "mkv")
                kinds.append("video")
                codecs.append(codec)
                ws.append(w)
                hs.append(ht)
                durs.append(int(round(dur * 1000)))
                decs.append(0)
            elif kind == 2:
                rate = (44100, 48000, 32000)[(h >> 20) % 3]
                mdur = min(dur, 30.0)
                blobs.append(build_mp3_stub(
                    mdur, kbps=(96, 128, 192, 320)[(h >> 16) % 4],
                    rate=rate, channels=1 + (h >> 24) % 2,
                    with_id3=bool((h >> 28) % 2)))
                ids.append(f"mp3{i:010d}")
                conts.append("mp3")
                kinds.append("audio")
                # MPEG-1 Layer III frames are 1152 samples: the builder
                # emits round(dur*rate/1152) whole frames
                n_fr = int(round(mdur * rate / 1152.0))
                codecs.append("")
                ws.append(0)
                hs.append(0)
                durs.append(int(round(n_fr * 1152.0 / rate * 1000)))
                decs.append(0)
            elif kind == 3:
                from setsketch_ray.sources.mp4 import build_heif_stub

                w, ht = 256 + 16 * ((h >> 16) % 60), 256 + 16 * ((h >> 22) % 40)
                brand = (b"avif", b"heic")[(h >> 30) % 2]
                blobs.append(build_heif_stub(w, ht, brand=brand))
                ids.append(f"hif{i:010d}")
                conts.append("heif")
                kinds.append("image")
                codecs.append("")
                ws.append(w)
                hs.append(ht)
                durs.append(-1)
                decs.append(0)
            else:
                from setsketch_ray.sources.webp import (
                    encode_webp_lossless,
                )

                rng = np.random.default_rng((h >> 16) & 0xFFFF)
                img = rng.integers(0, 256, (8 + (h >> 33) % 24,
                                            8 + (h >> 38) % 24, 3),
                                   dtype=np.uint8)
                blobs.append(encode_webp_lossless(img))
                ids.append(f"web{i:010d}")
                conts.append("webp")
                kinds.append("image")
                codecs.append("")
                ws.append(int(img.shape[1]))
                hs.append(int(img.shape[0]))
                durs.append(-1)
                decs.append(1)
        return _exp(ids, blobs, conts, kinds, codecs, ws, hs, durs, -1,
                    decs)

    webs = rd.range(48, override_num_blocks=4).map_batches(
        gen_web, batch_format="pyarrow", batch_size=None)
    probed = vids.union(auds).union(mp4s).union(webs).map_batches(
        MediaProbeStage, batch_format="pyarrow", concurrency=2)
    rows = probed.drop_columns(["bytes"]).take_all()

    stats: dict = {}
    for r in rows:
        key = (r["container"], r["kind"])
        s = stats.setdefault(key, {"n": 0, "parse": True, "codec": True,
                                   "dims": True, "dur": True,
                                   "frames": True, "dec": True})
        s["n"] += 1
        s["parse"] &= (r["container"] == r["exp_container"]
                       and r["kind"] == r["exp_kind"])
        s["codec"] &= (r["exp_codec"] == "" or r["codec"] == r["exp_codec"])
        s["dims"] &= (r["w"], r["h"]) == (r["exp_w"], r["exp_h"])
        s["dur"] &= (r["exp_dur_ms"] < 0
                     or r["duration_ms"] == r["exp_dur_ms"])
        s["frames"] &= r["exp_nf"] < 0 or r["n_frames"] == r["exp_nf"]
        s["dec"] &= int(r["decodable"]) == r["exp_dec"]
    keys = sorted(stats)
    return pa.table({
        "container": pa.array([k[0] for k in keys], pa.string()),
        "kind": pa.array([k[1] for k in keys], pa.string()),
        "n_media": pa.array([stats[k]["n"] for k in keys], pa.int64()),
        "parse_ok": pa.array(
            [int(stats[k]["parse"]) for k in keys], pa.int64()),
        "codec_ok": pa.array(
            [int(stats[k]["codec"]) for k in keys], pa.int64()),
        "dims_ok": pa.array(
            [int(stats[k]["dims"]) for k in keys], pa.int64()),
        "duration_ok": pa.array(
            [int(stats[k]["dur"]) for k in keys], pa.int64()),
        "frames_ok": pa.array(
            [int(stats[k]["frames"]) for k in keys], pa.int64()),
        "decodable_ok": pa.array(
            [int(stats[k]["dec"]) for k in keys], pa.int64())})


def _q_image_cluster_representatives(sf_dir: str):
    """Quality-aware canonical selection over the flagship's dup clusters:
    keep the highest-resolution (w*h) member of each near-dup image cluster,
    ties to the smallest id (pipelines/dedup.representatives_by_quality —
    one distributed top_k_per_group pass).  ORACLED as invariant rows
    (constant SQL): the clusters come from the non-SQL LSH pipeline, but
    the selection CONTRACT is checkable — exactly one representative per
    dup cluster (``one_per_cluster_ok``), every representative is a member
    of its own cluster (``member_ok``), and each is the argmax-quality
    member with ties to the smallest id (``argmax_ok``), re-verified here
    against an independent driver-side recomputation from the mapping +
    the corpus (w, h) columns (1k rows — certificate-sized)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from setsketch_ray.pipelines.dedup import (DedupConfig,
                                               near_dup_pipeline,
                                               representatives_by_quality)
    from setsketch_ray.sources import cached_images_parquet

    ds = rd.read_parquet(cached_images_parquet(1000))
    _, _, mapping = near_dup_pipeline(ds, DedupConfig())

    def add_quality(t: pa.Table) -> pa.Table:
        q = pc.multiply(t["w"].cast(pa.int64()), t["h"].cast(pa.int64()))
        return pa.table({"image_id": t["image_id"], "quality": q})

    quality = rd.read_parquet(cached_images_parquet(1000),
                              columns=["image_id", "w", "h"]) \
        .map_batches(add_quality, batch_format="pyarrow")
    reps = representatives_by_quality(quality, mapping, "quality",
                                      only_dup_clusters=True).take_all()

    # independent recomputation: argmax quality per cluster, tie -> min id
    qtbl = quality.take_all()
    qual = {r["image_id"]: int(r["quality"]) for r in qtbl}
    best: dict = {}
    for member, root in mapping.items():
        cand = (-qual[member], member)
        if root not in best or cand < best[root]:
            best[root] = cand
    expect = {root: (mid, -negq) for root, (negq, mid) in best.items()}
    one_per = (len(reps) == len(expect)
               and len({r["cluster_id"] for r in reps}) == len(reps))
    member_ok = all(mapping.get(r["image_id"]) == r["cluster_id"]
                    for r in reps)
    argmax_ok = all(
        expect.get(r["cluster_id"]) == (r["image_id"], int(r["quality"]))
        for r in reps)
    return pa.table({
        "n_images": pa.array([1000], pa.int64()),
        "one_per_cluster_ok": pa.array([int(one_per)], pa.int64()),
        "member_ok": pa.array([int(member_ok)], pa.int64()),
        "argmax_ok": pa.array([int(argmax_ok)], pa.int64())})


def _q_leakage_safe_split(sf_dir: str):
    """Cluster-aware train/val/test split over the flagship's near-dup
    clusters (pipelines/dedup.leakage_safe_split): the split key is the
    CLUSTER ROOT, so near-duplicate images can never straddle train and
    eval — the dedup-aware counterpart of sample_split_docs.  ORACLED as
    invariant rows (constant SQL): the clusters come from the non-SQL LSH
    pipeline, but the leakage CONTRACT is checkable — ``n_images`` is the
    fixed corpus size and ``n_cluster_violations`` is computed genuinely
    (grouped_count_distinct of split per cluster root; any root whose
    members straddle splits flips the row red).  Per-split co-assignment
    is also asserted in tests/test_pipeline.py."""
    import ray.data as rd

    from setsketch_ray.functions.relational import grouped_count_distinct
    from setsketch_ray.pipelines.dedup import (DedupConfig,
                                               leakage_safe_split,
                                               near_dup_pipeline)
    from setsketch_ray.sources import cached_images_parquet

    ds = rd.read_parquet(cached_images_parquet(1000))
    _, _, mapping = near_dup_pipeline(ds, DedupConfig())
    base = rd.read_parquet(cached_images_parquet(1000),
                           columns=["image_id"])
    import ray

    split = leakage_safe_split(base, mapping)
    mref = ray.put(mapping)

    def add_root(t: pa.Table) -> pa.Table:
        m = ray.get(mref)
        roots = [m.get(i, i) for i in t["image_id"].to_pylist()]
        return t.append_column("root", pa.array(roots, pa.string()))

    tagged = split.map_batches(add_root, batch_format="pyarrow")
    per_root = grouped_count_distinct(tagged, "root", "split")
    n_viol = int((per_root["n_distinct"].to_numpy() > 1).sum())
    n_images = base.count()
    return pa.table({"n_images": pa.array([n_images], pa.int64()),
                     "n_cluster_violations": pa.array([n_viol],
                                                      pa.int64())})


def _q_events_sample_bottomk(sf_dir: str):
    """Exact-size uniform row sample as a mergeable bottom-k sketch over the
    SQL-expressible Knuth hash (functions/relational.bottom_k_sample): the
    sample is a pure function of the key set — partitioning/resume
    invariant — and the oracle reproduces it with ORDER BY hash LIMIT k."""
    from setsketch_ray.functions.relational import bottom_k_sample

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return bottom_k_sample(ds, "event_id", 2048)


def _q_events_weighted_sample(sf_dir: str):
    """Weight-biased deterministic sample
    (relational.weighted_bottom_k_sample, integer_race mode): rank rows by
    the pure-integer priority (knuth_hash(event_id) << 20) // w_cents and
    keep the 1024 smallest — heavier rows (exact integer cents of
    events.value) win the race stochastically more often.  Mergeable
    bottom-k partials (<= k rows leave each block); the sample is a pure
    function of the (key, weight) set, so it is partition/resume invariant
    and the oracle reproduces it with ORDER BY priority, key LIMIT k.
    The exact-proportional Efraimidis–Spirakis mode (float exponential
    race) is library-side (mode="exp_race", statistical test)."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import weighted_bottom_k_sample

    ds = _read(sf_dir, "events", ["event_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        # +1 keeps the weight strictly positive (a handful of rows carry
        # value == 0.0 at sf0.1); the oracle shifts identically
        return pa.table({
            "event_id": t["event_id"],
            "w_cents": pc.add(
                pc.round(pc.multiply(t["value"], pa.scalar(100.0)))
                .cast(pa.int64()), pa.scalar(1, pa.int64()))})

    return weighted_bottom_k_sample(
        ds.map_batches(cents, batch_format="pyarrow"),
        "event_id", "w_cents", 1024)


def _q_value_quantiles_sampled(sf_dir: str):
    """Approximate quantiles from the bottom-k uniform sample (rank error
    O(1/sqrt(k)) vs the full data, asserted in tests) — but EXACTLY oracled,
    because the sample itself is deterministic and SQL-expressible; the
    quantile rule is the verified quantile_disc ceil(q*n)-1 walk."""
    from setsketch_ray.functions.relational import (bottom_k_sample,
                                                    quantiles_fixedpoint)

    ds = _read(sf_dir, "events", ["event_id", "value"])
    sample = bottom_k_sample(ds, "event_id", 2048) \
        .select_columns(["value"])
    return quantiles_fixedpoint(sample, "value",
                                [0.1, 0.25, 0.5, 0.75, 0.9, 0.99],
                                scale=100)


def _q_parts_skyline(sf_dir: str):
    """Skyline / Pareto frontier (relational.skyline — the classic
    multi-criteria optimization operator: parts where no other part is
    both cheaper AND larger): minimize retail price (integer cents),
    maximize size.  Shuffle-FREE distributed plan — skyline(union) is a
    subset of union(local skylines), so each block emits its local
    frontier and one driver pass finishes.  ORACLED EXACTLY: on the
    DISTINCT (price_c, p_size) point set sorted (price asc, size desc),
    a point is dominated iff max(size) over the strict prefix >= its
    size — one window function, pure integers."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import skyline

    def scaled(t: pa.Table) -> pa.Table:
        return pa.table({
            "price_c": pc.round(pc.multiply(t["p_retailprice"], 100.0))
            .cast(pa.int64()),
            "p_size": t["p_size"].cast(pa.int64())})

    ds = _read(sf_dir, "part", ["p_retailprice", "p_size"]) \
        .map_batches(scaled, batch_format="pyarrow")
    return skyline(ds, [("price_c", "min"), ("p_size", "max")])


def _q_orders_geo_pairs(sf_dir: str):
    """Spatial within-radius pair join (functions/spatial.grid_radius_pairs
    — the geo-dedup / proximity-blocking primitive): orders get
    deterministic fixed-point coordinates from an SQL-expressible
    xor-fold hash (Knuth multiply, fold the high half down, remix — the
    plain Knuth lattice puts consecutive keys on a LINE and the pair set
    explodes 100x), then ALL pairs within L-inf radius 2000 come out of
    one slim grid-cell exchange (5 replicas/point, half-stencil — no
    pair dedup needed).  ORACLED EXACTLY: same integer coordinates in
    SQL (xor()/>>/% keep every product < 2^63), DuckDB IEJoin on the two
    BETWEEN ranges."""
    from setsketch_ray.functions.spatial import grid_radius_pairs

    def coords(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy().astype(np.uint64)
        m32, a, b = np.uint64(1 << 32), np.uint64(2654435761), \
            np.uint64(40503)
        h = (k * a) % m32
        x = ((h ^ (h >> np.uint64(16))) * b) % m32 % np.uint64(1_000_000)
        h2 = ((k + np.uint64(1000003)) * a) % m32
        y = ((h2 ^ (h2 >> np.uint64(16))) * b) % m32 \
            % np.uint64(1_000_000)
        return pa.table({"id": t["o_orderkey"],
                         "x": pa.array(x.astype(np.int64), pa.int64()),
                         "y": pa.array(y.astype(np.int64), pa.int64())})

    ds = _read(sf_dir, "orders", ["o_orderkey"]) \
        .map_batches(coords, batch_format="pyarrow")
    return grid_radius_pairs(ds, "id", "x", "y", radius=2000,
                             metric="linf")


def _q_zorder_scan_orders(sf_dir: str):
    """Z-order layout + zone-map data skipping (functions/layout.py — the
    Delta/Iceberg OPTIMIZE ZORDER BY + skipping-statistics pattern, built
    from Ray Data primitives): orders get the same xor-fold integer
    coordinates as orders_geo_pairs, the table is written as 64 Morton-
    tiled parquet files (file id = z // 2^34, a PURE FUNCTION of the row
    — layout is partition/resume invariant), and a box query reads ONLY
    the files whose zone-map rectangle intersects the box.  ORACLED
    EXACTLY: the interleave is unrolled BIGINT bit arithmetic, the prune
    is min/max set algebra, so n_rows / sum_id / n_files_scanned /
    n_files_total all reproduce in SQL — the oracle certifies both the
    ANSWER and the SKIPPING."""
    import hashlib
    import os

    from setsketch_ray.functions.layout import write_zordered, zonemap_scan

    def coords(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy().astype(np.uint64)
        m32, a, b = np.uint64(1 << 32), np.uint64(2654435761), \
            np.uint64(40503)
        h = (k * a) % m32
        x = ((h ^ (h >> np.uint64(16))) * b) % m32 % np.uint64(1_000_000)
        h2 = ((k + np.uint64(1000003)) * a) % m32
        y = ((h2 ^ (h2 >> np.uint64(16))) * b) % m32 \
            % np.uint64(1_000_000)
        return pa.table({"id": t["o_orderkey"],
                         "x": pa.array(x.astype(np.int64), pa.int64()),
                         "y": pa.array(y.astype(np.int64), pa.int64())})

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|zorder1".encode()) \
        .hexdigest()[:12]
    root = f"/tmp/zorder_orders_{fp}"
    if not os.path.exists(f"{root}/_SUCCESS"):
        ds = _read(sf_dir, "orders", ["o_orderkey"]) \
            .map_batches(coords, batch_format="pyarrow")
        write_zordered(ds, root, "x", "y", bits=20, num_files=64)

    rows, n_scanned, n_total = zonemap_scan(
        root, "x", "y", (200_000, 400_000), (500_000, 800_000))

    def partial(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"n": pa.array([len(ids)], pa.int64()),
                         "s": pa.array([int(ids.sum())], pa.int64())})

    parts = rows.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table({
        "n_rows": pa.array([sum(r["n"] for r in parts)], pa.int64()),
        "sum_id": pa.array([sum(r["s"] for r in parts)], pa.int64()),
        "n_files_scanned": pa.array([n_scanned], pa.int64()),
        "n_files_total": pa.array([n_total], pa.int64())})


def _zorder_scan_oracle() -> str:
    """SQL mirror of _q_zorder_scan_orders: unrolled Morton interleave,
    equal-width z-range file assignment, min/max zone-map prune."""
    from setsketch_ray.functions.layout import zorder_sql

    z = zorder_sql("x", "y", 20)
    step = (1 << 40) // 64
    box = ("x BETWEEN 200000 AND 400000 AND y BETWEEN 500000 AND 800000")
    return (
        "WITH h AS (SELECT o_orderkey AS id, "
        "(o_orderkey * 2654435761) % 4294967296 AS h1, "
        "((o_orderkey + 1000003) * 2654435761) % 4294967296 AS h2 "
        "FROM orders), "
        "p AS (SELECT id, "
        "(xor(h1, h1 >> 16) * 40503) % 4294967296 % 1000000 AS x, "
        "(xor(h2, h2 >> 16) * 40503) % 4294967296 % 1000000 AS y "
        "FROM h), "
        f"zf AS (SELECT id, x, y, {z} // {step} AS f FROM p), "
        "zm AS (SELECT f, min(x) AS mnx, max(x) AS mxx, "
        "min(y) AS mny, max(y) AS mxy FROM zf GROUP BY f) "
        f"SELECT (SELECT count(*) FROM zf WHERE {box}) AS n_rows, "
        f"(SELECT CAST(coalesce(sum(id), 0) AS BIGINT) FROM zf "
        f"WHERE {box}) AS sum_id, "
        "(SELECT count(*) FROM zm WHERE mxx >= 200000 AND mnx <= 400000 "
        "AND mxy >= 500000 AND mny <= 800000) AS n_files_scanned, "
        "(SELECT count(*) FROM zm) AS n_files_total")


def _q_part_triangles(sf_dir: str):
    """Distributed triangle counting (functions/graph.py — the classic
    wide graph kernel) over the part co-purchase graph (distinct part
    pairs sharing an order, parts restricted to partkey%10==0 to keep
    the graph sparse-but-triangled at every sf): degree-ORIENTED wedge
    generation bounds per-node fan-out at O(sqrt(m)) — the celebrity-
    node explosion that kills a naive groupby — then wedges close
    against the edge set in one co-partitioned key exchange; only int64
    keys ever shuffle.  ORACLED EXACTLY: edges/wedges/triangles are pure
    integer set algebra (DISTINCT self-join + 3-way equi-join)."""
    from setsketch_ray.functions.graph import (cooccurrence_edges,
                                               triangle_count)

    def keep(t: pa.Table) -> pa.Table:
        m = t["l_partkey"].to_numpy() % 10 == 0
        return t.filter(pa.array(m))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(keep, batch_format="pyarrow")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return triangle_count(edges, "u", "v")


def _q_pagerank_parts(sf_dir: str):
    """Distributed PageRank (functions/graph.pagerank_fixedpoint) over the
    same part co-purchase graph as part_triangles, 3 power iterations in
    PURE-INTEGER fixpoint arithmetic (rank scale 1e12, damping 85/100,
    floor division everywhere) so the whole iteration chain is exactly
    SQL-oracle-able as unrolled CTEs.  Per iteration: ONE slim
    co-partitioned lookup_join (ranks are (node, r) int64 pairs) + a
    combiner-first hash-partitioned sum — per-node state never collapses
    to a single block or the driver.  Top-20 by (pr DESC, node ASC)."""
    from setsketch_ray.functions.graph import (cooccurrence_edges,
                                               pagerank_fixedpoint)

    def keep(t: pa.Table) -> pa.Table:
        m = t["l_partkey"].to_numpy() % 10 == 0
        return t.filter(pa.array(m))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(keep, batch_format="pyarrow")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    # the co-purchase graph is node-sparse at every sf (parts%10==0):
    # 16 rank partitions keep the 3 per-iteration exchanges task-light;
    # at real scale callers raise num_partitions with the node count
    return pagerank_fixedpoint(edges, iters=3, num_partitions=16)


def _q_part_components(sf_dir: str):
    """Connected components by distributed min-label propagation WITH
    pointer-jump doubling (functions/graph.connected_components_doubling)
    over the same part co-purchase graph as part_triangles/pagerank_parts:
    4 fixed rounds of label_{i+1}(v) = min(label_i(v), min_{(u,v)}
    label_i(u), label_i(label_i(v))) — the label-of-label term halves
    label-tree height per round, so 4 rounds reach the fixpoint this graph
    needs 5-6 plain sweeps for (probed per sf), and a 100x-diameter graph
    needs only O(log d).  Per round ONE tagged co-partition exchange
    resolves both the neighbor and the jump lookups + one min-combine
    exchange.  The fixed round count makes the labels a pure function of
    the edge set on both engines — ORACLED EXACTLY as 4 unrolled
    (UNION ALL self + neighbor + labels-self-join jump) GROUP BY min
    CTEs."""
    from setsketch_ray.functions.graph import (connected_components_doubling,
                                               cooccurrence_edges)

    def keep(t: pa.Table) -> pa.Table:
        m = t["l_partkey"].to_numpy() % 10 == 0
        return t.filter(pa.array(m))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(keep, batch_format="pyarrow")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return connected_components_doubling(edges, rounds=4, num_partitions=16)


def _q_part_kcore(sf_dir: str):
    """k-core decomposition (k=6) by distributed fixed-sweep peeling
    (functions/graph.k_core_sweeps) over the same part co-purchase graph
    as part_components/pagerank_parts: each of the 3 sweeps recomputes
    alive-restricted degrees via ONE slim co-partitioned lookup_join
    (self-loop rows carry the node's own alive state in the same stream,
    cnt=0 so they never count as degree) + per-batch degree partials
    before the exchange.  The fixed sweep count is a pure function of the
    edge set on both engines — ORACLED EXACTLY as 3 unrolled LEFT JOIN +
    alive-filtered-count CTEs; the per-node `stable` flag (sweep 4 ==
    sweep 3, constant-1 mirror) certifies the peeling actually reached
    the k-core fixpoint (measured: fixpoint in <= 3 sweeps at every sf)."""
    from setsketch_ray.functions.graph import (cooccurrence_edges,
                                               k_core_sweeps)

    def keep(t: pa.Table) -> pa.Table:
        m = t["l_partkey"].to_numpy() % 10 == 0
        return t.filter(pa.array(m))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(keep, batch_format="pyarrow")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return k_core_sweeps(edges, k=6, iters=3, num_partitions=8)


def _kcore_oracle(k: int = 6, iters: int = 5) -> str:
    """Unrolled peeling CTE chain mirroring functions/graph.k_core_sweeps
    over the part co-purchase graph: per sweep one LEFT JOIN against the
    alive-filtered degree count — pure int64, exact.  The final SELECT
    joins sweep iters against sweep iters+1 for the stable certificate."""
    sql = (
        "WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        "FROM lineitem WHERE l_partkey % 10 = 0), "
        "e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a "
        "JOIN li b ON a.o = b.o AND a.p < b.p), "
        "de AS (SELECT u AS s, v AS d FROM e "
        "UNION ALL SELECT v AS s, u AS d FROM e), "
        "a0 AS (SELECT DISTINCT s AS node, 1 AS a FROM de)")
    for i in range(1, iters + 2):
        sql += (
            f", a{i} AS (SELECT n.node, CASE WHEN n.a = 1 AND "
            f"coalesce(dg.c, 0) >= {k} THEN 1 ELSE 0 END AS a "
            f"FROM a{i - 1} n LEFT JOIN ("
            f"SELECT de.d AS node, count(*) AS c FROM de "
            f"JOIN a{i - 1} x ON x.node = de.s AND x.a = 1 "
            f"GROUP BY de.d) dg ON dg.node = n.node)")
    return sql + (
        f" SELECT a{iters}.node, CAST(a{iters}.a AS BIGINT) AS in_core, "
        f"CAST(CASE WHEN a{iters}.a = a{iters + 1}.a THEN 1 ELSE 0 END "
        f"AS BIGINT) AS stable FROM a{iters} "
        f"JOIN a{iters + 1} ON a{iters}.node = a{iters + 1}.node "
        f"ORDER BY a{iters}.node")


def _components_oracle(rounds: int = 4) -> str:
    """Unrolled min-label-propagation-with-doubling CTE chain mirroring
    functions/graph.connected_components_doubling over the part
    co-purchase graph: per round one UNION ALL of the self term, the
    neighbor term, and the labels-self-join pointer-jump term
    (label_i(label_i(v))), then GROUP BY min — pure int64, exact."""
    # every l{i} is referenced 4x by l{i+1} (self + neighbor probe + both
    # jump sides); MATERIALIZED stops DuckDB inlining the whole chain per
    # reference (4^rounds plan blowup — measured 19 s vs <1 s at sf0.1)
    sql = (
        "WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
        "l_partkey AS p FROM lineitem WHERE l_partkey % 10 = 0), "
        "e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM li a "
        "JOIN li b ON a.o = b.o AND a.p < b.p), "
        "de AS MATERIALIZED (SELECT u AS s, v AS d FROM e "
        "UNION ALL SELECT v AS s, u AS d FROM e), "
        "l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS l FROM de)")
    for i in range(1, rounds + 1):
        sql += (
            f", l{i} AS MATERIALIZED (SELECT node, min(l) AS l FROM ("
            f"SELECT node, l FROM l{i - 1} "
            f"UNION ALL SELECT de.d AS node, p.l AS l FROM de "
            f"JOIN l{i - 1} p ON p.node = de.s "
            f"UNION ALL SELECT c.node AS node, p.l AS l FROM l{i - 1} c "
            f"JOIN l{i - 1} p ON p.node = c.l) GROUP BY node)")
    return sql + (f" SELECT node, l AS label FROM l{rounds} ORDER BY node")


def _pagerank_oracle(iters: int = 3) -> str:
    """Unrolled integer-fixpoint PageRank CTE chain mirroring
    functions/graph.pagerank_fixedpoint over the part co-purchase graph.
    All arithmetic stays integral (HUGEINT sums, floor division) until the
    final BIGINT cast — no float association, engine-exact."""
    sql = (
        "WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        "FROM lineitem WHERE l_partkey % 10 = 0), "
        "e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a "
        "JOIN li b ON a.o = b.o AND a.p < b.p), "
        "de AS (SELECT u AS s, v AS d FROM e "
        "UNION ALL SELECT v AS s, u AS d FROM e), "
        "dg AS (SELECT s, count(*) AS dg FROM de GROUP BY s), "
        "cc AS (SELECT CAST(1000000000000 // count(*) AS BIGINT) AS rr, "
        "CAST(15 * (1000000000000 // count(*)) // 100 AS BIGINT) AS bb "
        "FROM dg), "
        "r0 AS (SELECT s AS node, (SELECT rr FROM cc) AS r FROM dg)")
    for i in range(1, iters + 1):
        sql += (
            f", r{i} AS (SELECT de.d AS node, "
            f"CAST((SELECT bb FROM cc) + 85 * sum(r{i - 1}.r // dg.dg) "
            f"// 100 AS BIGINT) AS r FROM de "
            f"JOIN r{i - 1} ON r{i - 1}.node = de.s "
            f"JOIN dg ON dg.s = de.s GROUP BY de.d)")
    return sql + (f" SELECT node, r AS pr FROM r{iters} "
                  "ORDER BY pr DESC, node LIMIT 20")


def _q_pagerank_personalized(sf_dir: str):
    """Personalized PageRank (the recommendation/proximity variant of
    pagerank_parts): teleport mass concentrated on the seed set
    {part : part % 50 == 0} — r0 and the per-node teleport base are
    scale//n_seeds on seeds and 0 elsewhere (functions/graph.
    pagerank_fixedpoint(seed_mod=50)).  Same pure-integer fixpoint and
    exchange plan as the uniform variant (one slim co-partitioned
    lookup_join + combiner aggregate per iteration); the seed predicate
    stays integer arithmetic, so the oracle mirrors it as a CASE — never
    a literal node list.  ORACLED EXACTLY via unrolled CTEs."""
    from setsketch_ray.functions.graph import (cooccurrence_edges,
                                               pagerank_fixedpoint)

    def keep(t: pa.Table) -> pa.Table:
        m = t["l_partkey"].to_numpy() % 10 == 0
        return t.filter(pa.array(m))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(keep, batch_format="pyarrow")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return pagerank_fixedpoint(edges, iters=3, num_partitions=16,
                               top_k=20, seed_mod=50, seed_rem=0)


def _ppr_oracle(iters: int = 3, seed_mod: int = 50) -> str:
    """Unrolled personalized-PageRank CTE chain: identical to
    _pagerank_oracle except r0/base become CASE node % seed_mod = 0."""
    sql = (
        "WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        "FROM lineitem WHERE l_partkey % 10 = 0), "
        "e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a "
        "JOIN li b ON a.o = b.o AND a.p < b.p), "
        "de AS (SELECT u AS s, v AS d FROM e "
        "UNION ALL SELECT v AS s, u AS d FROM e), "
        "dg AS (SELECT s, count(*) AS dg FROM de GROUP BY s), "
        f"cc AS (SELECT CAST(1000000000000 // sum(CASE WHEN "
        f"s % {seed_mod} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS rr, "
        f"CAST(15 * (1000000000000 // sum(CASE WHEN s % {seed_mod} = 0 "
        f"THEN 1 ELSE 0 END)) // 100 AS BIGINT) AS bb FROM dg), "
        f"r0 AS (SELECT s AS node, CASE WHEN s % {seed_mod} = 0 THEN "
        "(SELECT rr FROM cc) ELSE 0 END AS r FROM dg)")
    for i in range(1, iters + 1):
        sql += (
            f", r{i} AS (SELECT de.d AS node, "
            f"CAST((CASE WHEN de.d % {seed_mod} = 0 THEN "
            f"(SELECT bb FROM cc) ELSE 0 END) + "
            f"85 * sum(r{i - 1}.r // dg.dg) // 100 AS BIGINT) AS r "
            f"FROM de JOIN r{i - 1} ON r{i - 1}.node = de.s "
            f"JOIN dg ON dg.s = de.s GROUP BY de.d)")
    return sql + (f" SELECT node, r AS pr FROM r{iters} "
                  "ORDER BY pr DESC, node LIMIT 20")


def _q_bigram_pmi(sf_dir: str):
    """Collocation mining by pointwise mutual information: top-20 word
    bigrams (c_xy >= 5) by pmi = ln(c_xy*N / (c_x*c_y)).  Two slim count
    exchanges (bigram pairs co-partitioned by pair hash; unigram counts
    are vocabulary-bounded and fold on the driver, then broadcast into
    the scoring pass); the log happens once per surviving pair through
    glibc ln (the probed-parity libm trick), everything else exact
    integers — all products < 2^53 at this corpus scale (documented
    bound).  ORACLED EXACTLY against the positional self-join +
    identical ln expression."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate
    from setsketch_ray.sketchlib.hashing import hash_str_u64

    ds = _read(sf_dir, "documents", ["text"])

    def explode_bigrams(t: pa.Table) -> pa.Table:
        txt = t["text"]
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) \
            else txt
        toks = pc.split_pattern(pc.fill_null(txt, ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = np.diff(offs)
        row_of = np.repeat(np.arange(t.num_rows), sizes)
        ne = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        if len(row_of) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        valid = (row_of[:-1] == row_of[1:]) & ne[:-1] & ne[1:]
        idx = np.flatnonzero(valid)
        pairs = pa.table({
            "w1": flat.take(pa.array(idx)),
            "w2": flat.take(pa.array(idx + 1))})
        agg = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return pa.table({"w1": agg["w1"], "w2": agg["w2"],
                         "cnt": agg["count_all"].cast(pa.int64())})

    def explode_unigrams(t: pa.Table) -> pa.Table:
        txt = t["text"]
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) \
            else txt
        flat = pc.list_flatten(pc.split_pattern(pc.fill_null(txt, ""), " "))
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        agg = pa.table({"w": flat}).group_by(["w"]) \
            .aggregate([([], "count_all")])
        return pa.table({"w": agg["w"],
                         "cnt": agg["count_all"].cast(pa.int64())})

    # unigram counts: vocabulary-bounded, driver fold then broadcast
    ug = grouped_aggregate(ds.map_batches(explode_unigrams,
                                          batch_format="pyarrow"),
                           ["w"], {"c": ("sum", "cnt")})
    uni = dict(zip(ug["w"].to_pylist(),
                   (int(v) for v in ug["c"].to_pylist())))
    n_total = sum(uni.values())

    bg = grouped_aggregate(ds.map_batches(explode_bigrams,
                                          batch_format="pyarrow"),
                           ["w1", "w2"], {"c_xy": ("sum", "cnt")})
    keep = pc.greater_equal(bg["c_xy"], 5)
    bg = bg.filter(keep)
    import math

    w1 = bg["w1"].to_pylist()
    w2 = bg["w2"].to_pylist()
    cxy = [int(v) for v in bg["c_xy"].to_pylist()]
    pmi = [int(math.floor(math.log(
        float(c * n_total) / float(uni[a] * uni[b])) * 1e9 + 0.5))
        for a, b, c in zip(w1, w2, cxy)]
    out = pa.table({"w1": pa.array(w1, pa.string()),
                    "w2": pa.array(w2, pa.string()),
                    "c_xy": pa.array(cxy, pa.int64()),
                    "pmi_e9": pa.array(pmi, pa.int64())})
    out = out.take(pc.sort_indices(out, sort_keys=[
        ("pmi_e9", "descending"), ("w1", "ascending"),
        ("w2", "ascending")]))
    return out.slice(0, 20).combine_chunks()


def _q_user_twap(sf_dir: str):
    """Per-user time-weighted average value (the TWAP/metering shape):
    trapezoid integral over consecutive event gaps — twap_num =
    sum (v_i + v_{i+1}) * dt_s, twap_den = 2 * sum dt_s, all exact
    integers (gaps floored to whole seconds keep the products < 2^63 at
    any corpus scale), one hash co-partition + one lexsort per partition.
    Users with no positive-length span drop (HAVING den > 0 both sides).
    twap itself is the one IEEE division at the end.  ORACLED EXACTLY
    against the LEAD-window form."""
    import pyarrow.compute as pc

    from setsketch_ray.sketchlib.hashing import mix64

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    npart = 16

    def add_part(t: pa.Table) -> pa.Table:
        g = t["user_id"].to_numpy(zero_copy_only=False)
        h = mix64(g.astype(np.uint64))
        return t.append_column("__part", pa.array(
            (h % np.uint64(npart)).astype(np.uint32), pa.uint32()))

    def per_partition(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "twap_num": pa.array([], pa.int64()),
                          "twap_den": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.drop_columns(["__part"])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        v = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, v = u[order], ts[order], v[order]
        same = u[1:] == u[:-1]
        dt = (ts[1:] - ts[:-1]) // 1_000_000
        seg = (v[:-1] + v[1:]) * dt
        num = np.zeros(len(u), np.int64)
        den = np.zeros(len(u), np.int64)
        np.add.at(num, np.flatnonzero(same), seg[same])
        np.add.at(den, np.flatnonzero(same), dt[same])
        # collapse per user (first row of each run accumulates via add.at
        # on the PAIR index — fold by user id)
        uniq, inv = np.unique(u, return_inverse=True)
        num_u = np.zeros(len(uniq), np.int64)
        den_u = np.zeros(len(uniq), np.int64)
        np.add.at(num_u, inv, num)
        np.add.at(den_u, inv, den)
        keep = den_u > 0
        return pa.table({
            "user_id": pa.array(uniq[keep], pa.int64()),
            "twap_num": pa.array(num_u[keep], pa.int64()),
            "twap_den": pa.array(2 * den_u[keep], pa.int64())})

    parts = ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("__part").map_groups(per_partition,
                                      batch_format="pyarrow")
    out = pa.concat_tables(list(parts.iter_batches(
        batch_format="pyarrow", batch_size=1 << 20)))
    num = out["twap_num"].to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    den = out["twap_den"].to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    out = out.append_column("twap", pa.array(num / den, pa.float64()))
    return out.take(pc.sort_indices(out, sort_keys=[
        ("user_id", "ascending")])).combine_chunks()


def _q_events_ks_drift(sf_dir: str):
    """Distribution-drift monitor: EXACT two-sample Kolmogorov-Smirnov
    statistic of the value distribution, early vs late period, per
    event_type.  D rides pure integer cross-multiplication —
    max_v |cumA(v)*nB - cumB(v)*nA| over the distinct-value grid — so the
    max is association-free; ks_milli is the one IEEE division at the
    end.  Shape: slim (type, cents, ca, cb) count partials, ONE
    type-hash co-partition (cumulatives need a type's values together;
    distinct values per type are bounded), driver sees 5 rows.  ORACLED
    EXACTLY against the SQL window-cumulative form."""
    import pyarrow.compute as pc
    from datetime import datetime

    cutoff = pa.scalar(datetime(2024, 1, 15), pa.timestamp("us"))
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    npart = 8

    def partial(t: pa.Table) -> pa.Table:
        from setsketch_ray.sketchlib.hashing import hash_str_u64

        ia = pc.less(t["ts"], cutoff).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vc = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64())
        g = pa.table({"event_type": t["event_type"], "v": vc,
                      "ca": pa.array(ia, pa.int64()),
                      "cb": pa.array(1 - ia, pa.int64())}) \
            .group_by(["event_type", "v"]) \
            .aggregate([("ca", "sum"), ("cb", "sum")])
        et = g["event_type"]
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        h = hash_str_u64(et)
        return pa.table({
            "event_type": et, "v": g["v"],
            "ca": g["ca_sum"], "cb": g["cb_sum"],
            "__part": pa.array((h % np.uint64(npart)).astype(np.uint32),
                               pa.uint32())})

    def per_partition(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "na": pa.array([], pa.int64()),
                          "nb": pa.array([], pa.int64()),
                          "d_num": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        comb = t.select(["event_type", "v", "ca", "cb"]) \
            .group_by(["event_type", "v"]) \
            .aggregate([("ca", "sum"), ("cb", "sum")])
        comb = comb.take(pc.sort_indices(comb, sort_keys=[
            ("event_type", "ascending"), ("v", "ascending")]))
        et = comb["event_type"].to_pylist()
        ca = comb["ca_sum"].to_numpy(zero_copy_only=False)
        cb = comb["cb_sum"].to_numpy(zero_copy_only=False)
        rows = {"event_type": [], "na": [], "nb": [], "d_num": []}
        i = 0
        n = len(et)
        while i < n:
            j = i
            while j < n and et[j] == et[i]:
                j += 1
            cuma = np.cumsum(ca[i:j])
            cumb = np.cumsum(cb[i:j])
            na, nb = int(cuma[-1]), int(cumb[-1])
            d = int(np.max(np.abs(cuma * nb - cumb * na)))
            rows["event_type"].append(et[i])
            rows["na"].append(na)
            rows["nb"].append(nb)
            rows["d_num"].append(d)
            i = j
        return pa.table({
            "event_type": pa.array(rows["event_type"], pa.string()),
            "na": pa.array(rows["na"], pa.int64()),
            "nb": pa.array(rows["nb"], pa.int64()),
            "d_num": pa.array(rows["d_num"], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__part").map_groups(per_partition,
                                      batch_format="pyarrow")
    out = pa.concat_tables(list(parts.iter_batches(
        batch_format="pyarrow", batch_size=1 << 20)))
    d = out["d_num"].to_numpy(zero_copy_only=False).astype(np.float64)
    na = out["na"].to_numpy(zero_copy_only=False).astype(np.float64)
    nb = out["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
    ks = np.floor(d / (na * nb) * 1000 + 0.5).astype(np.int64)
    out = out.append_column("ks_milli", pa.array(ks, pa.int64()))
    return out.take(pc.sort_indices(out, sort_keys=[
        ("event_type", "ascending")])).combine_chunks()


def _q_orders_global_rank(sf_dir: str):
    """Global row_number over (o_totalprice DESC, o_orderkey) WITHOUT a
    global data sort: the composite order packs into ONE int64
    ((1e8 - cents) * 2^27 + orderkey — valid while cents <= 1e8 and
    orderkey < 2^27, asserted), then the two-pass distributed scan
    (functions/streaming.global_prefix_sum with value 1) assigns ranks —
    two metadata passes + one range-partitioned cumsum, the rows
    themselves shuffle once.  ORACLED EXACTLY against the row_number
    window."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.streaming import global_prefix_sum

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def pack(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["o_totalprice"], 100.0)) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        key = t["o_orderkey"].to_numpy(zero_copy_only=False)
        assert cents.max(initial=0) <= 10 ** 8 and \
            key.max(initial=0) < (1 << 27)
        ordv = (10 ** 8 - cents) * (1 << 27) + key
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "ord": pa.array(ordv, pa.int64()),
                         "one": pa.array(np.ones(t.num_rows, np.int64),
                                         pa.int64())})

    ranked = global_prefix_sum(
        ds.map_batches(pack, batch_format="pyarrow").materialize(),
        "ord", "one", out_col="rank", num_partitions=16)

    def emit(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "rank": t["rank"].cast(pa.int64())})

    return ranked.map_batches(emit, batch_format="pyarrow") \
        .sort("o_orderkey")


def _q_events_ntile_global(sf_dir: str):
    """Global NTILE(8) equal-frequency bucketing over all events by
    (value, event_id) WITHOUT a global data sort: the composite order
    packs into ONE int64 (cents * 2^37 + event_id, asserted in range),
    the two-pass distributed scan (functions/streaming.global_prefix_sum)
    assigns row numbers, and the NTILE bucket is pure integer arithmetic
    on (rn, n, k) — the first n%k buckets take ceil(n/k) rows, exactly
    the SQL NTILE contract.  ORACLED EXACTLY against the window
    function."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.streaming import global_prefix_sum

    k = 8
    ds = _read(sf_dir, "events", ["event_id", "value"])
    n = ds.count()

    def pack(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["value"], 100.0)) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        assert cents.max(initial=0) < (1 << 26) and \
            eid.max(initial=0) < (1 << 37)
        ordv = cents * (1 << 37) + eid
        return pa.table({"event_id": t["event_id"],
                         "ord": pa.array(ordv, pa.int64()),
                         "one": pa.array(np.ones(t.num_rows, np.int64),
                                         pa.int64())})

    ranked = global_prefix_sum(
        ds.map_batches(pack, batch_format="pyarrow").materialize(),
        "ord", "one", out_col="rn", num_partitions=16)
    q, r = divmod(n, k)

    def emit(t: pa.Table) -> pa.Table:
        rn0 = t["rn"].cast(pa.int64()).to_numpy(zero_copy_only=False) - 1
        cut = r * (q + 1)
        big = rn0 < cut                      # first r buckets: q+1 rows
        tile = np.where(big, rn0 // max(q + 1, 1) + 1,
                        r + (rn0 - cut) // max(q, 1) + 1)
        return pa.table({"event_id": t["event_id"],
                         "tile": pa.array(tile.astype(np.int64),
                                          pa.int64())})

    return ranked.map_batches(emit, batch_format="pyarrow") \
        .sort("event_id")


def _q_audio_resample(sf_dir: str):
    """Sample-rate normalization over the 6-codec audio corpus (sources/
    audio.resample_linear — the float-domain linear resampler): each clip
    decodes (PCM16/G.711/ADPCM/FLAC/Ogg-FLAC), upsamples 2x (n -> 2n-1,
    same duration), and certifies with EXACT math: len_ok (the grid
    arithmetic), roundtrip_ok (2x up then down is bit-exact IDENTITY —
    interior grid points copy samples with lerp weight 0), and freq_ok
    (the dominant spectral peak moves <= 1 Hz; measured worst 0.35 Hz —
    linearity preserves tones).  ORACLED per row via idx-arithmetic
    audio_id + constant certificate mirrors."""
    from setsketch_ray.pipelines.audiodedup import (_fingerprint,
                                                    decode_audio_any)
    from setsketch_ray.sources.audio import resample_linear
    from setsketch_ray.sources.av import audio_dataset

    def work(t: pa.Table) -> pa.Table:
        ids = t["audio_id"].to_pylist()
        len_ok, rt_ok, fr_ok = [], [], []
        for blob in t["bytes"].to_pylist():
            try:
                sig, rate = decode_audio_any(blob)
                sig = np.asarray(sig, np.float64)
                n = len(sig)
                up = resample_linear(sig, 2 * n - 1)
                len_ok.append(1 if len(up) == 2 * n - 1 else 0)
                down = resample_linear(up, n)
                rt_ok.append(1 if np.array_equal(down, sig) else 0)
                f0, _, _ = _fingerprint(sig, rate)
                # the endpoint-spanning grid j*(n_in-1)/(n_out-1) preserves
                # DURATION, so 2n-1 samples over the same span is exactly
                # rate 2*rate — (2n-1)*rate/n would fold a spurious
                # ~rate/(2n) bookkeeping drift into the certificate
                f1, _, _ = _fingerprint(up, 2 * rate)
                drift_milli = int(np.floor(abs(f1 - f0) * 1000 + 0.5))
                fr_ok.append(1 if drift_milli <= 1000 else 0)
            except (NotImplementedError, ValueError):
                len_ok.append(0)
                rt_ok.append(0)
                fr_ok.append(0)
        return pa.table({
            "audio_id": pa.array(ids, pa.string()),
            "len_ok": pa.array(len_ok, pa.int64()),
            "roundtrip_ok": pa.array(rt_ok, pa.int64()),
            "freq_ok": pa.array(fr_ok, pa.int64())})

    ds = audio_dataset(96, parallelism=8)
    return ds.map_batches(work, batch_format="pyarrow", batch_size=None)


def _q_augment_images(sf_dir: str):
    """Deterministic image augmentation (flip-horizontal + rot90 — the
    training-time augmentation ops) over a real-JPEG corpus, certified by
    EXACT pixel algebra: flips and rotations are permutations, so (a)
    flip(flip(x)) == x byte-for-byte, (b) rot90^4(x) == x, (c) per-channel
    integer pixel sums are invariant under both, and (d) the augmented
    frame PNG round-trips losslessly.  Every certificate is exact integer
    arithmetic over the actually-decoded pixels — a codec or augmentation
    drift flips a row red.  ORACLED per row via idx-arithmetic image_id +
    constant certificate mirrors."""
    from setsketch_ray.sources.codec import decode_image, encode_png
    from setsketch_ray.sources.images import images_dataset

    def augment(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        blobs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        flip_ok, rot_ok, sum_ok, png_ok = [], [], [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                px = decode_image(blob, fmt)
                fl = px[:, ::-1]
                rt = np.rot90(px)
                flip_ok.append(1 if np.array_equal(fl[:, ::-1], px) else 0)
                r4 = np.rot90(np.rot90(np.rot90(rt)))
                rot_ok.append(1 if np.array_equal(r4, px) else 0)
                s0 = px.astype(np.int64).sum(axis=(0, 1))
                sum_ok.append(1 if np.array_equal(
                    fl.astype(np.int64).sum(axis=(0, 1)), s0) and
                    np.array_equal(rt.astype(np.int64).sum(axis=(0, 1)),
                                   s0) else 0)
                back = decode_image(encode_png(np.ascontiguousarray(fl)),
                                    "png")
                png_ok.append(1 if np.array_equal(back, fl) else 0)
            except (NotImplementedError, ValueError):
                flip_ok.append(0)
                rot_ok.append(0)
                sum_ok.append(0)
                png_ok.append(0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "flip_involution_ok": pa.array(flip_ok, pa.int64()),
            "rot_cycle_ok": pa.array(rot_ok, pa.int64()),
            "sum_invariant_ok": pa.array(sum_ok, pa.int64()),
            "png_roundtrip_ok": pa.array(png_ok, pa.int64())})

    ds = images_dataset(200, parallelism=8, fmt_profile="jpeg")
    return ds.map_batches(augment, batch_format="pyarrow",
                          batch_size=None)


def _q_key_skew_profile(sf_dir: str):
    """Shuffle-planning skew profile of the three lineitem join keys (the
    statistic that decides salting / broadcast / co-partition at 100 TB):
    per key column the row count, distinct keys, HOTTEST key multiplicity
    and the F2 concentration sum(c^2) — one slim (col_id, key, cnt)
    partial exchange for ALL columns together (lineitem_profile's
    one-exchange trick), per-partition combine + 1-row partials, driver
    fold.  concentration = CAST(f2 AS DOUBLE)/(n*n) is the expected
    fraction of pair collisions — the salting decision number.  ORACLED
    EXACTLY per column."""
    import pyarrow.compute as pc

    cols = ["l_orderkey", "l_partkey", "l_suppkey"]
    ds = _read(sf_dir, "lineitem", cols)
    npart = 16

    def explode(t: pa.Table) -> pa.Table:
        from setsketch_ray.sketchlib.hashing import mix64

        outs = []
        for ci, c in enumerate(cols):
            agg = t.select([c]).group_by([c]) \
                .aggregate([([], "count_all")])
            k = agg[c].cast(pa.int64())
            kh = mix64(k.to_numpy(zero_copy_only=False).astype(np.uint64)
                       + np.uint64(ci))
            outs.append(pa.table({
                "col_id": pa.array(np.full(agg.num_rows, ci, np.int64),
                                   pa.int64()),
                "k": k,
                "cnt": agg["count_all"].cast(pa.int64()),
                "__part": pa.array((kh % np.uint64(npart)).astype(
                    np.uint32), pa.uint32())}))
        return pa.concat_tables(outs)

    def per_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"col_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "n_distinct": pa.array([], pa.int64()),
                             "max_cnt": pa.array([], pa.int64()),
                             "f2": pa.array([], pa.int64())})
        comb = t.select(["col_id", "k", "cnt"]) \
            .group_by(["col_id", "k"]).aggregate([("cnt", "sum")])
        ci = comb["col_id"].to_numpy(zero_copy_only=False)
        c = comb["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = []
        for col in np.unique(ci):
            m = ci == col
            rows.append((int(col), int(c[m].sum()), int(m.sum()),
                         int(c[m].max()),
                         int(np.sum(c[m].astype(object) ** 2))))
        return pa.table({
            "col_id": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "n_distinct": pa.array([r[2] for r in rows], pa.int64()),
            "max_cnt": pa.array([r[3] for r in rows], pa.int64()),
            "f2": pa.array([r[4] for r in rows], pa.int64())})

    parts = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("__part").map_groups(per_partition,
                                      batch_format="pyarrow")
    rows = pa.concat_tables(list(parts.iter_batches(
        batch_format="pyarrow", batch_size=1 << 20)))
    ci = rows["col_id"].to_numpy(zero_copy_only=False)
    out = {"col_name": [], "n": [], "n_distinct": [], "max_cnt": [],
           "f2": [], "concentration": []}
    for col in range(len(cols)):
        m = ci == col
        n = int(np.sum(rows["n"].to_numpy(zero_copy_only=False)[m]))
        f2 = sum(int(v) for v, keep in zip(rows["f2"].to_pylist(), m)
                 if keep)
        out["col_name"].append(cols[col])
        out["n"].append(n)
        out["n_distinct"].append(int(np.sum(
            rows["n_distinct"].to_numpy(zero_copy_only=False)[m])))
        out["max_cnt"].append(int(np.max(
            rows["max_cnt"].to_numpy(zero_copy_only=False)[m])))
        out["f2"].append(f2)
        out["concentration"].append(
            float(np.float64(float(f2)) /
                  (np.float64(float(n)) * np.float64(float(n)))))
    return pa.table({
        "col_name": pa.array(out["col_name"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "n_distinct": pa.array(out["n_distinct"], pa.int64()),
        "max_cnt": pa.array(out["max_cnt"], pa.int64()),
        "f2": pa.array(out["f2"], pa.int64()),
        "concentration": pa.array(out["concentration"], pa.float64())})


def _q_events_value_percentile(sf_dir: str):
    """Global PERCENT_RANK of every event's value WITHOUT a global sort:
    one slim (cents, count) exchange builds the exact value distribution
    (distinct cents, bounded domain), the driver folds it into a
    cumulative table (driver work = O(distinct values), never O(rows)),
    and a broadcast searchsorted map assigns each row rows_less/(n-1) —
    one IEEE division of exact integers, identical on both engines.
    The global-window analytic re-expressed as distribution broadcast —
    at 100 TB this replaces an all-to-all sort with a combiner exchange.
    ORACLED EXACTLY against PERCENT_RANK() OVER (ORDER BY value)."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate

    ds = _read(sf_dir, "events", ["event_id", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"vc": pc.round(pc.multiply(t["value"], 100.0))
                         .cast(pa.int64())})

    dist = grouped_aggregate(ds.map_batches(to_cents,
                                            batch_format="pyarrow"),
                             ["vc"], {"cnt": ("count", None)})
    dist = dist.take(pc.sort_indices(dist, sort_keys=[("vc", "ascending")]))
    vals = dist["vc"].to_numpy(zero_copy_only=False)
    cnts = dist["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    less = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    n_total = int(cnts.sum())

    def rank(t: pa.Table) -> pa.Table:
        vc = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vals, vc)
        pr = less[idx].astype(np.float64) / np.float64(n_total - 1)
        return pa.table({"event_id": t["event_id"],
                         "pct_rank": pa.array(pr, pa.float64())})

    return ds.map_batches(rank, batch_format="pyarrow").sort("event_id")


def _q_events_props_extract(sf_dir: str):
    """JSON payload extraction (functions/semistructured.json_extract — the
    typed-column flattening step for telemetry/event payload columns): one
    RE2 ``pc.extract_regex`` pass per key per batch, never a per-row
    json.loads loop (the loads fallback serves only escaped/nested rows —
    zero on this corpus), then a grouped integer aggregate keyed by
    (event_type, k % 16) so every extracted value is pinned through
    sum/min/max.  ORACLED EXACTLY: DuckDB ``json_extract_string`` + CAST
    with identical integer aggregates."""
    from setsketch_ray.functions.relational import grouped_aggregate
    from setsketch_ray.functions.semistructured import json_extract

    ev = _read(sf_dir, "events", ["event_type", "props"])
    ev = json_extract(ev, "props", {"k": ("k", pa.int64())}, drop=True)

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False)
        return batch.append_column("k_bucket", pa.array(k % 16, pa.int64()))

    ev = ev.map_batches(bucket, batch_format="pyarrow")
    out = grouped_aggregate(ev, ["event_type", "k_bucket"], {
        "n": ("count", None),
        "k_sum": ("sum", "k"),
        "k_min": ("min", "k"),
        "k_max": ("max", "k"),
    })
    return out.sort_by([("event_type", "ascending"),
                        ("k_bucket", "ascending")])


def _q_merge_orders_changes(sf_dir: str):
    """MERGE INTO / CDC apply (functions/merge.merge_changes — the lakehouse
    upsert step): a deterministically derived change stream (price-bump
    upserts for keys %10==3, deletes for %10==7, a SECOND higher-seq
    full-row upsert for %20==3 proving latest-wins-replace rather than
    fold, and brand-new inserted keys for %10==1) applies to the orders
    base table via ONE key-hash co-partition exchange + one vectorized
    (key asc, seq desc) sort per partition.  ORACLED EXACTLY: SQL
    row_number-latest FULL OUTER JOIN merge, integer cents."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.merge import merge_changes

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice"])

    def to_base(t: pa.Table) -> pa.Table:
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_orderstatus": t["o_orderstatus"],
            "price_c": pa.array(np.floor(price * 100 + 0.5).astype(np.int64),
                                pa.int64())})

    base = orders.map_batches(to_base, batch_format="pyarrow")

    def to_changes(t: pa.Table) -> pa.Table:
        t = to_base(t)
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        parts = []
        m3 = k % 10 == 3
        if m3.any():
            s = t.filter(pa.array(m3))
            parts.append(pa.table({
                "o_orderkey": s["o_orderkey"],
                "o_custkey": s["o_custkey"],
                "o_orderstatus": s["o_orderstatus"],
                "price_c": pc.add(s["price_c"], pa.scalar(100000, pa.int64())),
                "seq": pa.array(np.ones(s.num_rows, np.int64)),
                "op": pa.array(["upsert"] * s.num_rows, pa.string())}))
        m7 = k % 10 == 7
        if m7.any():
            s = t.filter(pa.array(m7))
            parts.append(pa.table({
                "o_orderkey": s["o_orderkey"],
                "o_custkey": pa.nulls(s.num_rows, pa.int64()),
                "o_orderstatus": pa.nulls(s.num_rows, pa.string()),
                "price_c": pa.nulls(s.num_rows, pa.int64()),
                "seq": pa.array(np.ones(s.num_rows, np.int64)),
                "op": pa.array(["delete"] * s.num_rows, pa.string())}))
        m20 = k % 20 == 3
        if m20.any():
            s = t.filter(pa.array(m20))
            parts.append(pa.table({
                "o_orderkey": s["o_orderkey"],
                "o_custkey": s["o_custkey"],
                "o_orderstatus": pa.array(["X"] * s.num_rows, pa.string()),
                "price_c": s["price_c"],
                "seq": pa.array(np.full(s.num_rows, 2, np.int64)),
                "op": pa.array(["upsert"] * s.num_rows, pa.string())}))
        m1 = k % 10 == 1
        if m1.any():
            s = t.filter(pa.array(m1))
            parts.append(pa.table({
                "o_orderkey": pc.add(s["o_orderkey"],
                                     pa.scalar(1_000_000_000, pa.int64())),
                "o_custkey": s["o_custkey"],
                "o_orderstatus": pa.array(["N"] * s.num_rows, pa.string()),
                "price_c": pa.array(np.full(s.num_rows, 12345, np.int64)),
                "seq": pa.array(np.ones(s.num_rows, np.int64)),
                "op": pa.array(["upsert"] * s.num_rows, pa.string())}))
        if not parts:
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "o_custkey": pa.array([], pa.int64()),
                "o_orderstatus": pa.array([], pa.string()),
                "price_c": pa.array([], pa.int64()),
                "seq": pa.array([], pa.int64()),
                "op": pa.array([], pa.string())})
        return pa.concat_tables(parts)

    changes = orders.map_batches(to_changes, batch_format="pyarrow")
    merged = merge_changes(base, changes, "o_orderkey")
    return merged.sort("o_orderkey")


def _q_events_gapfill(sf_dir: str):
    """Time-series resample + gap fill + forward fill
    (functions/streaming.gap_fill_ffill — the SQL generate_series grid +
    last_value(IGNORE NULLS) window): per event_type, 60-second buckets
    over the key's occupied range; empty buckets emit n=0 with the last
    occupied bucket's integer-cents value sum carried forward.  Per-block
    partial aggregation BEFORE the exchange (raw events never shuffle),
    one key-hash co-partition, one vectorized grid expansion + ffill per
    partition.  ORACLED EXACTLY: integer cents, identical bucket rule."""
    from setsketch_ray.functions.streaming import gap_fill_ffill

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    out = gap_fill_ffill(ev, "event_type", "ts", "value",
                         every_seconds=60, scale=100)
    return out.sort(["event_type", "bucket"])


def _q_top_words_by_lang(sf_dir: str):
    """Grouped heavy hitters (functions/text.word_topk_by_group): exact
    top-5 words per language over documents.  Per-block (lang, word, cnt)
    partials, ONE composite-key hash exchange (tokens never shuffle),
    per-partition combine + per-group rank filter, driver re-rank of the
    <= k*partitions survivors.  ORACLED EXACTLY: row_number window with
    the identical (cnt DESC, word ASC) tiebreak."""
    from setsketch_ray.functions.text import word_topk_by_group

    ds = _read(sf_dir, "documents", ["lang", "text"])
    return word_topk_by_group(ds, "text", "lang", k=5)


def _q_bm25_search(sf_dir: str):
    """BM25 top-20 retrieval over documents for the fixed query set
    {hash, merge, scan, window} (functions/search.bm25_topk — the ranked-
    retrieval counterpart of phrase_search, Lucene idf variant
    ln(1 + (N-df+0.5)/(df+0.5))).  ONE tokenize pass emits a slim
    (doc_id, dl, tf_j) table consumed twice: 1-row-per-block stats
    partials folded on the driver (N, sum_dl, df_j — no shuffle), then a
    broadcast-scalar scoring map with per-block top-k (the text never
    crosses an exchange and nothing sorts globally).  ORACLED EXACTLY:
    idf's ln is the same glibc libm call on both engines, every constant
    is the same double literal (CAST(1.2 AS DOUBLE) — never a DECIMAL
    literal), per-term contributions add in fixed term order, and the
    score fixed-points as floor(score*1e6 + 0.5) (per-row rational
    arithmetic is IEEE-exact across engines)."""
    from setsketch_ray.functions.search import bm25_topk

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, "doc_id", "text",
                     ["hash", "merge", "scan", "window"], k=20)


def _q_chunk_documents(sf_dir: str):
    """RAG sliding-window chunker (functions/text.chunk_documents):
    40-word windows advancing by 30 (10-word overlap), last chunk
    truncated — the retrieval-ingestion shape.  SHUFFLE-FREE: the same
    map task that tokenizes gathers the flat word buffer with a
    repeat/arange index (overlapping windows can't share one offsets
    array) and rebuilds chunk texts via ListArray offsets +
    binary_join.  ORACLED EXACTLY: DuckDB 1-based inclusive list slices
    ws[start+1 : least(start+40, n)] + array_to_string, chunk counts by
    the identical floor-division formula."""
    from setsketch_ray.functions.text import chunk_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(ds, "doc_id", "text", window=40, stride=30)


def _q_word_moments(sf_dir: str):
    """Frequency moments of the corpus word distribution (functions/
    text.word_moments): exact F0/F1/F2 via one slim (word, cnt) partial
    exchange + per-partition Python-int fold, AND an AMS tug-of-war F2
    estimate (sketchlib/ams.py — the classic STOC'96 linear sketch; the
    s1*s2=2304-entry partial vector folds componentwise with NO shuffle
    of its own).  ORACLED EXACTLY: f0/f1/f2 match SQL group counts
    bit-for-bit; ams_ok certifies |median-of-means - F2| <= 20% of F2 in
    pure integer arithmetic (deterministic counter-mode signs, so the
    certificate is stable across runs and block layouts)."""
    from setsketch_ray.functions.text import word_moments

    ds = _read(sf_dir, "documents", ["text"])
    return word_moments(ds, "text", s1=256, s2=9, rel_err_pct=20)


def _q_image_exif(sf_dir: str):
    """Exif APP1 metadata probe over a real-JPEG corpus (sources/exif.py —
    CIPA DC-008 TIFF-IFD wire format, built on the TIFF parser's IFD value
    decoder): a map stage splices a deterministic Exif APP1 into each
    encoded JPEG (pure byte insert after SOI — entropy untouched,
    decode-parity tested), then the probe walks segments to SOS and parses
    IFD0 + the 0x8769 sub-IFD WITHOUT any pixel decode — the 100 TB
    catalog shape (read heads, never payloads).  Alternating II/MM endian,
    inline (<=4 byte) and pointer value paths both exercised.  ORACLED
    EXACTLY per row: every field derives from the image index, so the SQL
    CONSTRUCTS the expected values from the same idx arithmetic the engine
    PARSES out of the bytes (url_normalize precedent)."""
    from setsketch_ray.sources.exif import (build_exif_app1, exif_info,
                                            inject_app1)
    from setsketch_ray.sources.images import images_dataset

    def inject_probe(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        blobs = t["bytes"].to_pylist()
        cols = {k: [] for k in
                ("endian", "make", "model", "orientation", "xres_num",
                 "xres_den", "datetime", "iso", "datetime_original")}
        for iid, blob in zip(ids, blobs):
            idx = int(iid[3:])
            dt = f"2024:01:{1 + idx % 28:02d} 12:{idx % 60:02d}:00"
            dto = f"2024:01:{1 + idx % 28:02d} 11:{idx % 60:02d}:59"
            app1 = build_exif_app1(
                make=f"CAM{idx % 5}", model=f"M{idx % 7}",
                orientation=1 + idx % 8, xres=(72 + idx % 4, 1),
                datetime=dt, iso=100 * (1 + idx % 16),
                datetime_original=dto,
                endian="<" if idx % 2 == 0 else ">")
            info = exif_info(inject_app1(blob, app1))
            for k in cols:
                cols[k].append(info[k])
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "endian": pa.array(cols["endian"], pa.string()),
            "make": pa.array(cols["make"], pa.string()),
            "model": pa.array(cols["model"], pa.string()),
            "orientation": pa.array(cols["orientation"], pa.int64()),
            "xres_num": pa.array(cols["xres_num"], pa.int64()),
            "xres_den": pa.array(cols["xres_den"], pa.int64()),
            "datetime": pa.array(cols["datetime"], pa.string()),
            "iso": pa.array(cols["iso"], pa.int64()),
            "datetime_original": pa.array(cols["datetime_original"],
                                          pa.string())})

    ds = images_dataset(160, parallelism=8, fmt_profile="jpeg")
    return ds.map_batches(inject_probe, batch_format="pyarrow",
                          batch_size=None)


def _q_embedding_centroids(sf_dir: str):
    """Per-language embedding centroids (functions/knn.
    embedding_group_centroids): ONE co-partitioned lookup_join attaches
    documents.lang to each vector (inner — the SQL JOIN drops unlabeled
    ids at sf0.1 where embeddings is a subset), then per-block group-wise
    int64 column sums over floor(x*1e6+0.5)-fixed elements; the exchange
    carries 5 langs x 64 dims slim rows per block, vectors never shuffle.
    ORACLED EXACTLY: integer sums both sides (DuckDB parallel unnest zip,
    embedding CAST to DOUBLE before scaling — the list<float> caveat);
    mean is the one IEEE division of identical operands."""
    from setsketch_ray.functions.knn import embedding_group_centroids

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return embedding_group_centroids(emb, docs, num_partitions=16)


def _q_join_size_lineitem(sf_dir: str):
    """Equi-join cardinality estimation (functions/relational.
    join_size_estimate — the query-optimizer statistic): exact
    |A JOIN B ON l_partkey| = sum_k a_k*b_k for A = returned lineitems,
    B = bulk lineitems (quantity > 25), via per-block slim (key, ca, cb)
    count partials + ONE key-hash co-partition; each partition also emits
    its two linear AMS tug-of-war vectors (SAME sign draw both sides, so
    E[X_e*Y_e] = join size) and the driver certifies the sketch estimate
    against the exact value in pure integer arithmetic (measured error
    <= 6% at every sf vs the 25% bound).  ORACLED EXACTLY: join_size /
    f2_a / f2_b match SQL bit-for-bit, ams_ok mirrors constant 1."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import join_size_estimate

    li_a = _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t["l_returnflag"], "R")).select(["l_partkey"]),
            batch_format="pyarrow")
    li_b = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"]) \
        .map_batches(lambda t: t.filter(
            pc.greater(t["l_quantity"], 25)).select(["l_partkey"]),
            batch_format="pyarrow")
    return join_size_estimate(li_a, li_b, "l_partkey", "l_partkey",
                              num_partitions=16)


def _q_char_entropy(sf_dir: str):
    """Per-document character entropy as the integer statistic n*H in e9
    fixed point (functions/text.char_entropy_scores — the mojibake /
    low-diversity quality filter).  Vectorized and SHUFFLE-FREE: ONE
    bincount over the Arrow string data buffer per batch (ASCII corpus
    contract: byte == char), with log2 evaluated once per DISTINCT
    (cnt, n) pair through the same glibc libm call DuckDB makes — the
    bigram-LM oracle trick, so the per-doc sums are exact integer
    arithmetic on both engines.  ORACLED EXACTLY."""
    from setsketch_ray.functions.text import char_entropy_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return char_entropy_scores(ds, "doc_id", "text").sort("doc_id")


def _q_rrf_fusion(sf_dir: str):
    """Hybrid-retrieval rank fusion (functions/search.rrf_fuse, RRF —
    Cormack et al. 2009): fuse the BM25 lexical top-20 (bm25_search's
    exact pipeline) with the embedding cosine top-20 of query vec 0
    (knn_bruteforce's broadcast-matmul pipeline) as fused(d) =
    1/(60+r_bm25) + 1/(60+r_knn), absent lists contributing exactly 0.0.
    The distributed work is producing the two rankings; fusion is k-sized
    driver algebra.  ORACLED EXACTLY: the SQL recomputes BOTH rankings
    (the bm25 statement inlined as a subquery, the cosine rank() window)
    and mirrors the identical fixed-order float tree, fixed-pointed as
    floor(s*1e9 + 0.5)."""
    from setsketch_ray.functions.knn import knn_bruteforce
    from setsketch_ray.functions.search import bm25_topk, rrf_fuse

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bm = bm25_topk(docs, "doc_id", "text",
                   ["hash", "merge", "scan", "window"], k=20)
    bm_ranked = pa.table({
        "doc_id": bm["doc_id"],
        "r": pa.array(np.arange(1, bm.num_rows + 1), pa.int64())})
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    kn = knn_bruteforce(emb, query_vec_id=0, k=20)
    kn_ranked = pa.table({"doc_id": kn["vec_id"], "r": kn["rank"]})
    return rrf_fuse([bm_ranked, kn_ranked], k=20)


def _q_events_regression_by_type(sf_dir: str):
    """Grouped ordinary-least-squares fit (value cents ~ hour-of-day) per
    event_type from FOUR integer sufficient statistics (n, sx, sy, sxy,
    sxx — associativity-proof int64 sums), finished with an identical
    float expression tree on both engines (the value_hour_corr technique):
    slope = (mxy - mx*my)/(mxx - mx*mx), intercept = my - slope*mx.
    ORACLED EXACTLY — every division/multiply is the same IEEE op of the
    same operands in the same order."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate

    def stats(t: pa.Table) -> pa.Table:
        x = pc.hour(t["ts"]).cast(pa.int64())
        y = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64())
        return pa.table({"event_type": t["event_type"], "x": x, "y": y,
                         "xy": pc.multiply(x, y),
                         "xx": pc.multiply(x, x)})

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"]) \
        .map_batches(stats, batch_format="pyarrow")
    agg = grouped_aggregate(ds, ["event_type"], {
        "n": ("count", None), "sx": ("sum", "x"), "sy": ("sum", "y"),
        "sxy": ("sum", "xy"), "sxx": ("sum", "xx")})

    def f(col):
        return agg[col].cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.float64)

    n, sx, sy, sxy, sxx = f("n"), f("sx"), f("sy"), f("sxy"), f("sxx")
    mx, my = sx / n, sy / n
    mxy, mxx = sxy / n, sxx / n
    slope = (mxy - mx * my) / (mxx - mx * mx)
    intercept = my - slope * mx
    out = pa.table({"event_type": agg["event_type"],
                    "n": agg["n"].cast(pa.int64()),
                    "slope": pa.array(slope, pa.float64()),
                    "intercept": pa.array(intercept, pa.float64())})
    return out.take(pc.sort_indices(out, sort_keys=[
        ("event_type", "ascending")])).combine_chunks()


def _q_thumbnail_images(sf_dir: str):
    """Thumbnail generation over a real-JPEG corpus (stages/image.
    resize_area — integral-image exact block means — + the PNG encoder):
    decode -> 16x16 area resize -> PNG re-encode -> decode BACK, with
    three per-image integer certificates: dims_ok (the round-tripped
    thumbnail is exactly 16x16x3), mean_ok (area resize preserves the
    global pixel sum: each output pixel is round(mean of a 2x2 block), so
    |4*sum_out - sum_in| <= 2*256 per channel — the rounding bound, exact
    integer compare), and resize_ok (decode succeeded).  ORACLED EXACTLY
    per row: image_id from the range arithmetic, every certificate a
    constant-1 mirror that flips red if any codec or the resize kernel
    drifts."""
    from setsketch_ray.sources.codec import decode_image, encode_png
    from setsketch_ray.sources.images import images_dataset
    from setsketch_ray.stages.image import resize_area

    def thumb(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        blobs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        ok_r, ok_d, ok_m = [], [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                px = decode_image(blob, fmt)
                th = resize_area(px, 16, 16)
                rt = decode_image(encode_png(th), "png")
                ok_r.append(1)
                ok_d.append(1 if rt.shape == (16, 16, 3) else 0)
                sin = px.astype(np.int64).sum(axis=(0, 1))
                sout = rt.astype(np.int64).sum(axis=(0, 1))
                bound = 2 * 16 * 16
                ok_m.append(1 if bool(
                    (np.abs(4 * sout - sin) <= bound).all()) else 0)
            except (NotImplementedError, ValueError):
                ok_r.append(0)
                ok_d.append(0)
                ok_m.append(0)
        n = t.num_rows
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "w": pa.array([16] * n, pa.int64()),
            "h": pa.array([16] * n, pa.int64()),
            "fmt": pa.array(["png"] * n, pa.string()),
            "resize_ok": pa.array(ok_r, pa.int64()),
            "dims_ok": pa.array(ok_d, pa.int64()),
            "mean_ok": pa.array(ok_m, pa.int64())})

    ds = images_dataset(200, parallelism=8, fmt_profile="jpeg")
    return ds.map_batches(thumb, batch_format="pyarrow", batch_size=None)


def _q_referential_integrity(sf_dir: str):
    """Whole-schema referential-integrity profile (the data-quality sweep
    a warehouse runs nightly): for each of the 7 foreign keys of this
    star schema, the child row count and the orphan count via
    functions/relational.semi_anti_join(mode='anti') — the right side
    ships only its key column, the per-partition merge is one pc.is_in,
    no payload ever moves.  ORACLED EXACTLY: per-FK NOT EXISTS counts
    (all zero on this corpus — a generator or join-machinery drift flips
    a row nonzero and the count mismatch turns it red)."""
    from setsketch_ray.functions.relational import semi_anti_join

    fks = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
    names, n_child, n_orphan = [], [], []
    for fk, child, ckey, parent, pkey in fks:
        c = _read(sf_dir, child, [ckey])
        p = _read(sf_dir, parent, [pkey])
        names.append(fk)
        n_child.append(c.count())
        n_orphan.append(semi_anti_join(c, p, ckey, pkey, mode="anti",
                                       num_partitions=8).count())
    return pa.table({"fk": pa.array(names, pa.string()),
                     "n_child": pa.array(n_child, pa.int64()),
                     "n_orphan": pa.array(n_orphan, pa.int64())})


def _q_compact_orders_files(sf_dir: str):
    """Small-file compaction (functions/layout.compact_parquet_files —
    the lake-maintenance op): a 32-fragment copy of orders compacts into
    4 row-balanced files, global row order preserved (output file f holds
    exactly global rows [f*target, (f+1)*target)); source counts come
    from parquet FOOTERS only, one read task per fragment, one writer
    task per output file, _SUCCESS-committed and crash-rebuildable.
    Certified by a DISTRIBUTED multiset checksum: per-block (count,
    wrapping key-hash sum, cents sum) partials over source and compacted
    layouts must fold to identical totals (content_ok).  ORACLED EXACTLY:
    n_rows from SQL, file counts and content_ok constants that flip red
    on any row loss, duplication, or value corruption."""
    import glob
    import hashlib
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from setsketch_ray.functions.layout import compact_parquet_files
    from setsketch_ray.sketchlib.hashing import mix64

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|frag32".encode()) \
        .hexdigest()[:12]
    frag_dir = f"/tmp/orders_frag_{fp}"
    if not os.path.exists(f"{frag_dir}/_SUCCESS"):
        import shutil

        shutil.rmtree(frag_dir, ignore_errors=True)
        os.makedirs(frag_dir, exist_ok=True)
        src = pq.read_table(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey",
                                     "o_totalprice"])
        n = src.num_rows
        step = -(-n // 32)
        for i in range(32):
            part = src.slice(i * step, step)
            if part.num_rows:
                pq.write_table(part, f"{frag_dir}/frag-{i:05d}.parquet")
        with open(f"{frag_dir}/_SUCCESS", "w", encoding="utf-8") as fh:
            fh.write("ok")

    files = sorted(glob.glob(f"{frag_dir}/frag-*.parquet"))
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    target = -(-total // 4)
    dst_dir = f"/tmp/orders_compact_{fp}"
    import shutil

    shutil.rmtree(dst_dir, ignore_errors=True)
    manifest = compact_parquet_files(files, dst_dir, target)

    def checksum(ds) -> tuple:
        def partial(t: pa.Table) -> pa.Table:
            k = t["o_orderkey"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            c = pc.round(pc.multiply(t["o_totalprice"], 100.0)) \
                .cast(pa.int64()).to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                ks = np.bitwise_xor.reduce(mix64(k)) if len(k) else 0
            return pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "ks": pa.array([int(ks)], pa.uint64()),
                "cs": pa.array([int(c.sum())], pa.int64())})

        rows = pa.concat_tables(list(
            ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=1 << 20)))
        n = int(np.sum(rows["n"].to_numpy(zero_copy_only=False)))
        ks = 0
        for v in rows["ks"].to_pylist():
            ks ^= int(v)
        cs = sum(int(v) for v in rows["cs"].to_pylist())
        return n, ks, cs

    import ray.data as rd

    src_sum = checksum(_read(sf_dir, "orders",
                             ["o_orderkey", "o_totalprice"]))
    dst_files = sorted(glob.glob(f"{dst_dir}/part-*.parquet"))
    dst_sum = checksum(rd.read_parquet(dst_files,
                                       columns=["o_orderkey",
                                                "o_totalprice"]))
    content_ok = 1 if src_sum == dst_sum else 0
    return pa.table({
        "n_files_in": pa.array([len(files)], pa.int64()),
        "n_files_out": pa.array([manifest.num_rows], pa.int64()),
        "n_rows": pa.array([src_sum[0]], pa.int64()),
        "content_ok": pa.array([content_ok], pa.int64())})


def _q_event_transitions(sf_dir: str):
    """Markov transition counts over per-user event sequences (the
    behavioral-model sufficient statistic): LAG of event_type within each
    user's (ts, event_id)-ordered stream (functions/streaming.lag_lead —
    one hash co-partition + one lexsort, pure value copies), then a
    combiner-partial grouped count over (from_type, to_type).  ORACLED
    EXACTLY against the LAG window + GROUP BY."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate
    from setsketch_ray.functions.streaming import lag_lead

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type"])
    w = lag_lead(ds, "user_id", "ts", "event_type", "event_id",
                 num_partitions=16)

    def pairs(t: pa.Table) -> pa.Table:
        keep = pc.is_valid(t["prev_value"])
        t = t.filter(keep)
        return pa.table({"from_type": t["prev_value"],
                         "to_type": t["event_type"]})

    agg = grouped_aggregate(w.map_batches(pairs, batch_format="pyarrow"),
                            ["from_type", "to_type"],
                            {"n": ("count", None)})
    return agg.take(pc.sort_indices(agg, sort_keys=[
        ("from_type", "ascending"),
        ("to_type", "ascending")])).combine_chunks()


def _q_events_iqr_outliers(sf_dir: str):
    """Per-group Tukey-fence (1.5*IQR) outlier counts — the
    distribution-shaped data-quality rule where the bound comes from the
    data itself: exact grouped q1/q3 via the distinct-count quantile plan
    (relational.grouped_quantiles_fixedpoint, quantile_disc rule), then
    the fences ride PURE INTEGER half-cent arithmetic (2*v < 2*q1 -
    3*(q3-q1) — the 1.5 factor never becomes a float) in one broadcast
    filter pass with combiner partials.  ORACLED EXACTLY: identical
    integer comparisons over quantile_disc cents on both engines."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import (
        grouped_aggregate, grouped_quantiles_fixedpoint)

    ds = _read(sf_dir, "events", ["event_type", "value"])
    qt = grouped_quantiles_fixedpoint(ds, "event_type", "value",
                                      [0.25, 0.75], scale=100)
    fences = {}
    for et, q, v in zip(qt["event_type"].to_pylist(),
                        qt["q"].to_pylist(), qt["value"].to_pylist()):
        c = int(np.floor(v * 100 + 0.5))
        fences.setdefault(et, {})[q] = c
    keys = sorted(fences)
    key_arr = pa.array(keys, pa.string())
    q1_by_key = np.array([fences[k][0.25] for k in keys], np.int64)
    q3_by_key = np.array([fences[k][0.75] for k in keys], np.int64)

    def flag(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        vc = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        gi = pc.index_in(et, key_arr).to_numpy(zero_copy_only=False)
        q1 = q1_by_key[gi]
        q3 = q3_by_key[gi]
        lo = 2 * q1 - 3 * (q3 - q1)
        hi = 2 * q3 + 3 * (q3 - q1)
        return pa.table({
            "event_type": et,
            "q1_c": pa.array(q1, pa.int64()),
            "q3_c": pa.array(q3, pa.int64()),
            "low": pa.array((2 * vc < lo).astype(np.int64), pa.int64()),
            "high": pa.array((2 * vc > hi).astype(np.int64), pa.int64())})

    agg = grouped_aggregate(ds.map_batches(flag, batch_format="pyarrow"),
                            ["event_type", "q1_c", "q3_c"],
                            {"n_low": ("sum", "low"),
                             "n_high": ("sum", "high"),
                             "n": ("count", None)})
    return agg.take(pc.sort_indices(agg, sort_keys=[
        ("event_type", "ascending")])).combine_chunks()


def _q_jsonl_zst_roundtrip(sf_dir: str):
    """Zstandard-compressed JSONL shard round trip (sources/jsonl.
    write_jsonl_shards + the generalized read_corpus codec dispatch —
    .gz/.zst/.bz2/.br/.lz4 all stream through Arrow's codec input
    stream, one unsplittable file per task): documents write as 8
    deterministic .jsonl.zst shards (counter-mode key-hash assignment,
    in-shard key sort, polars vectorized ndjson — no per-row json.dumps,
    pinned compression level, atomic renames) and read back through
    read_corpus.  ORACLED EXACTLY: the full row content (id, text, lang,
    n_chars) must match the source table bit-for-bit — any serializer,
    codec, or dispatch drift is a value mismatch."""
    import hashlib
    import os
    import shutil

    from setsketch_ray.sources.jsonl import write_jsonl_shards
    from setsketch_ray.sources.readers import read_corpus

    fp = hashlib.sha1(f"{os.path.abspath(sf_dir)}|jsonlzst8".encode()) \
        .hexdigest()[:12]
    root = f"/tmp/jsonl_zst_{fp}"
    if not os.path.exists(f"{root}/_SUCCESS"):
        shutil.rmtree(root, ignore_errors=True)
        ds = _read(sf_dir, "documents",
                   ["doc_id", "text", "lang", "n_chars"])
        write_jsonl_shards(ds, root, "doc_id", num_shards=8,
                           compression="zstd")
        with open(f"{root}/_SUCCESS", "w", encoding="utf-8") as fh:
            fh.write("ok")
    back = read_corpus(root, columns=["doc_id", "text", "lang", "n_chars"])
    return back.sort("doc_id")


def _q_events_rolling_outliers(sf_dir: str):
    """Per-user rolling z-score anomaly flags (the streaming-monitoring
    shape): ONE hash-partition + lexsort pass computes the window
    count/sum/sum-of-squares sufficient statistics over the trailing 11
    rows (functions/streaming.rolling_stats — cumulative-difference, no
    per-row loop), then the 2-sigma test rides PURE INTEGER arithmetic:
    (n*v - s)^2 > 4*(n*ss - s^2) — no sqrt, no float, no association
    hazard.  ORACLED EXACTLY against the SQL window frame with the
    identical integer comparison."""
    import pyarrow.compute as pc

    from setsketch_ray.functions.streaming import rolling_stats

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    w = rolling_stats(ds, "user_id", "ts", "value", "event_id",
                      window_rows=10, value_scale=100, num_partitions=16)

    def flag(t: pa.Table) -> pa.Table:
        v = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = t["rolling_n"].to_numpy(zero_copy_only=False)
        s = t["rolling_s"].to_numpy(zero_copy_only=False)
        ss = t["rolling_ss"].to_numpy(zero_copy_only=False)
        d = n * v - s
        out = (d * d > 4 * (n * ss - s * s)).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "rolling_n": t["rolling_n"],
                         "is_outlier": pa.array(out, pa.int64())})

    return w.map_batches(flag, batch_format="pyarrow").sort("event_id")


def _q_user_decay_scores(sf_dir: str):
    """Per-user exponentially time-decayed engagement value (the
    recommender/feature-store freshness score): term = cents *
    floor(0.9^days_ago * 1e6 + 0.5), days_ago measured in integer epoch
    days from the corpus max timestamp (one slim max pass, driver
    scalar).  The decay factor is evaluated once per DISTINCT day gap
    through glibc pow (parity vs DuckDB power probed exact over 400
    gaps — the bigram-LM trick again), so the per-user sums are exact
    integer arithmetic on both engines.  ORACLED EXACTLY."""
    import math

    import pyarrow.compute as pc

    from setsketch_ray.functions.relational import grouped_aggregate

    US_PER_DAY = 86_400_000_000
    ts_ds = _read(sf_dir, "events", ["ts"])

    def max_partial(t: pa.Table) -> pa.Table:
        d = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array(
            [int(d.max()) if len(d) else -(1 << 62)], pa.int64())})

    parts = pa.concat_tables(list(ts_ds.map_batches(
        max_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=1 << 20)))
    max_day = int(np.max(parts["m"].to_numpy(
        zero_copy_only=False))) // US_PER_DAY

    def score(t: pa.Table) -> pa.Table:
        epoch = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = max_day - epoch // US_PER_DAY
        cents = pc.round(pc.multiply(t["value"], 100.0)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(days, return_inverse=True)
        dec = np.array([math.floor(math.pow(0.9, float(d)) * 1e6 + 0.5)
                        for d in uniq], np.int64)
        term = cents * dec[inv]
        return pa.table({"user_id": t["user_id"],
                         "term": pa.array(term, pa.int64())})

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    agg = grouped_aggregate(ds.map_batches(score, batch_format="pyarrow"),
                            ["user_id"],
                            {"decayed_c6": ("sum", "term"),
                             "n": ("count", None)})
    return agg.take(pc.sort_indices(agg, sort_keys=[
        ("user_id", "ascending")])).combine_chunks()


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "bigram_pmi": _q_bigram_pmi,
        "user_twap": _q_user_twap,
        "events_ks_drift": _q_events_ks_drift,
        "orders_global_rank": _q_orders_global_rank,
        "audio_resample": _q_audio_resample,
        "augment_images": _q_augment_images,
        "key_skew_profile": _q_key_skew_profile,
        "events_value_percentile": _q_events_value_percentile,
        "events_ntile_global": _q_events_ntile_global,
        "pagerank_personalized": _q_pagerank_personalized,
        "user_decay_scores": _q_user_decay_scores,
        "events_rolling_outliers": _q_events_rolling_outliers,
        "jsonl_zst_roundtrip": _q_jsonl_zst_roundtrip,
        "events_iqr_outliers": _q_events_iqr_outliers,
        "event_transitions": _q_event_transitions,
        "compact_orders_files": _q_compact_orders_files,
        "referential_integrity": _q_referential_integrity,
        "thumbnail_images": _q_thumbnail_images,
        "events_regression_by_type": _q_events_regression_by_type,
        "rrf_fusion": _q_rrf_fusion,
        "char_entropy": _q_char_entropy,
        "join_size_lineitem": _q_join_size_lineitem,
        "embedding_centroids": _q_embedding_centroids,
        "image_exif": _q_image_exif,
        "word_moments": _q_word_moments,
        "chunk_documents": _q_chunk_documents,
        "bm25_search": _q_bm25_search,
        "top_words_by_lang": _q_top_words_by_lang,
        "events_gapfill": _q_events_gapfill,
        "part_components": _q_part_components,
        "part_kcore": _q_part_kcore,
        "merge_orders_changes": _q_merge_orders_changes,
        "events_props_extract": _q_events_props_extract,
        "parts_skyline": _q_parts_skyline,
        "pagerank_parts": _q_pagerank_parts,
        "zorder_scan_orders": _q_zorder_scan_orders,
        "orders_geo_pairs": _q_orders_geo_pairs,
        "part_triangles": _q_part_triangles,
        "exact_dedup_docs": _q_exact_dedup_docs,
        "tiered_dedup_docs": _q_tiered_dedup_docs,
        "ssjoin_pairs": _q_ssjoin_pairs,
        "bpe_tokenize": _q_bpe_tokenize,
        "orc_roundtrip": _q_orc_roundtrip,
        "avro_roundtrip": _q_avro_roundtrip,
        "containment_docs": _q_containment_docs,
        "tfrecord_roundtrip": _q_tfrecord_roundtrip,
        "phrase_search": _q_phrase_search,
        "bigram_lm_scores": _q_bigram_lm_scores,
        "decontaminate": _q_decontaminate,
        "semantic_dedup": _q_semantic_dedup,
        "corpus_curation": _q_corpus_curation,
        "distinct_parts": _q_distinct_parts,
        "doc_stats_by_lang": _q_doc_stats_by_lang,
        "lineitem_agg": _q_lineitem_agg,
        "top_users": _q_top_users,
        "token_counts": _q_token_counts,
        "pack_sequences": _q_pack_sequences,
        "knn_bruteforce": _q_knn_bruteforce,
        "knn_batch": _q_knn_batch,
        "knn_ivf": _q_knn_ivf,
        "knn_ivfpq": _q_knn_ivfpq,
        "cosine_pairs": _q_cosine_pairs,
        "char_jaccard_pairs": _q_char_jaccard_pairs,
        "events_hourly": _q_events_hourly,
        "events_dow_hour": _q_events_dow_hour,
        "orders_by_segment": _q_orders_by_segment,
        "lineitem_orders_join": _q_lineitem_orders_join,
        "asof_last_order": _q_asof_last_order,
        "events_prev_24h": _q_events_prev_24h,
        "events_hopping": _q_events_hopping,
        "events_hopping_distinct": _q_events_hopping_distinct,
        "parts_never_ordered": _q_parts_never_ordered,
        "parts_hot_ordered": _q_parts_hot_ordered,
        "events_running_total": _q_events_running_total,
        "events_lag_lead": _q_events_lag_lead,
        "events_rolling_10": _q_events_rolling_10,
        "repeat_actions": _q_repeat_actions,
        "user_event_paths": _q_user_event_paths,
        "props_k_stats": _q_props_k_stats,
        "dropped_actions": _q_dropped_actions,
        "events_pivot": _q_events_pivot,
        "shipping_priority": _q_shipping_priority,
        "events_rank": _q_events_rank,
        "lineitem_unpivot": _q_lineitem_unpivot,
        "heavy_users": _q_heavy_users,
        "parts_never_ordered_bloom": _q_parts_never_ordered_bloom,
        "lineitem_left_join": _q_lineitem_left_join,
        "lineitem_rollup": _q_lineitem_rollup,
        "orders_customers_full": _q_orders_customers_full,
        "events_ntile": _q_events_ntile,
        "events_dense_rank": _q_events_dense_rank,
        "mode_action_per_user": _q_mode_action_per_user,
        "top_words": _q_top_words,
        "small_quantity_revenue": _q_small_quantity_revenue,
        "distinctive_terms": _q_distinctive_terms,
        "value_variance_by_type": _q_value_variance_by_type,
        "value_hour_corr_by_type": _q_value_hour_corr_by_type,
        "funnel_view_click_purchase": _q_funnel_view_click_purchase,
        "weekly_retention": _q_weekly_retention,
        "docs_regex_by_lang": _q_docs_regex_by_lang,
        "value_quantiles_cont": _q_value_quantiles_cont,
        "approx_key_overlap": _q_approx_key_overlap,
        "theta_setops_orders": _q_theta_setops_orders,
        "fuzzy_name_pairs": _q_fuzzy_name_pairs,
        "embedding_gram": _q_embedding_gram,
        "word_cooccurrence": _q_word_cooccurrence,
        "events_mad_by_type": _q_events_mad_by_type,
        "events_debounce": _q_events_debounce,
        "value_histogram": _q_value_histogram,
        "orders_cube": _q_orders_cube,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "approx_users_by_type": _q_approx_users_by_type,
        "normalized_docs": _q_normalized_docs,
        "dedup_keep_longest": _q_dedup_keep_longest,
        "near_dup_docs": _q_near_dup_docs,
        "near_dup_images": _q_near_dup_images,
        "video_frame_phash": _q_video_frame_phash,
        "near_dup_videos": _q_near_dup_videos,
        "near_dup_audio": _q_near_dup_audio,
        "media_probe": _q_media_probe,
        "wds_roundtrip": _q_wds_roundtrip,
        "sqlite_roundtrip": _q_sqlite_roundtrip,
        "arrow_roundtrip": _q_arrow_roundtrip,
        "warc_roundtrip": _q_warc_roundtrip,
        "html_extract": _q_html_extract,
        "web_pipeline": _q_web_pipeline,
        "image_quality_filter": _q_image_quality_filter,
        "tiered_dedup_images": _q_tiered_dedup_images,
        "lineitem_profile": _q_lineitem_profile,
        "word_freq_cms": _q_word_freq_cms,
        "line_dedup_docs": _q_line_dedup_docs,
        "cdc_chunk_stats": _q_cdc_chunk_stats,
        "cdc_bytes_images": _q_cdc_bytes_images,
        "validate_lineitem": _q_validate_lineitem,
        "table_diff_docs": _q_table_diff_docs,
        "events_outliers": _q_events_outliers,
        "url_normalize": _q_url_normalize,
        "domain_cap_docs": _q_domain_cap_docs,
        "audio_fingerprint": _q_audio_fingerprint,
        "approx_distinct_parts": _q_approx_distinct_parts,
        "simhash_dup_docs": _q_simhash_dup_docs,
        "embedding_near_dup": _q_embedding_near_dup,
        "lang_id": _q_lang_id,
        "quality_scores": _q_quality_scores,
        "gopher_repetition": _q_gopher_repetition,
        "scrub_pii": _q_scrub_pii,
        "cardinality_eval": _q_cardinality_eval,
        "joint_eval": _q_joint_eval,
        "charts": _q_charts,
        "approx_distinct_methods": _q_approx_distinct_methods,
        "substring_dup_docs": _q_substring_dup_docs,
        "suffix_dup_spans": _q_suffix_dup_spans,
        "doc_fingerprints": _q_doc_fingerprints,
        "mix_corpus": _q_mix_corpus,
        "sample_split_docs": _q_sample_split_docs,
        "leakage_safe_split": _q_leakage_safe_split,
        "sessionize": _q_sessionize,
        "value_quantiles": _q_value_quantiles,
        "value_equidepth_histogram": _q_value_equidepth_histogram,
        "value_quantiles_kll": _q_value_quantiles_kll,
        "value_quantiles_kll_by_type": _q_value_quantiles_kll_by_type,
        "value_quantiles_by_type": _q_value_quantiles_by_type,
        "value_quantiles_cont_by_type": _q_value_quantiles_cont_by_type,
        "top_events_per_user": _q_top_events_per_user,
        "revenue_by_nation": _q_revenue_by_nation,
        "order_priority_counts": _q_order_priority_counts,
        "custdist": _q_custdist,
        "part_supplier_counts": _q_part_supplier_counts,
        "global_sales_opportunity": _q_global_sales_opportunity,
        "important_parts": _q_important_parts,
        "promo_revenue": _q_promo_revenue,
        "returned_revenue_customers": _q_returned_revenue_customers,
        "events_sample_bottomk": _q_events_sample_bottomk,
        "events_weighted_sample": _q_events_weighted_sample,
        "value_quantiles_sampled": _q_value_quantiles_sampled,
        "image_cluster_representatives": _q_image_cluster_representatives,
        "events_stratified_sample": _q_events_stratified_sample,
        "embedding_norm_stats": _q_embedding_norm_stats,
        "events_cume_dist": _q_events_cume_dist,
        "doc_tokens": _q_doc_tokens,
        "forecast_revenue": _q_forecast_revenue,
        "cheapest_supplier_per_part": _q_cheapest_supplier_per_part,
        "top_supplier_revenue": _q_top_supplier_revenue,
        "special_revenue": _q_special_revenue,
        "sole_blame_suppliers": _q_sole_blame_suppliers,
        "nation_trade_volume": _q_nation_trade_volume,
        "large_volume_customers": _q_large_volume_customers,
        "product_profit": _q_product_profit,
        "market_share": _q_market_share,
        "urgent_lineitem_revenue": _q_urgent_lineitem_revenue,
    }


def _compose_rrf_oracle(d: dict) -> str:
    """RRF = FULL OUTER JOIN of the two recomputed rankings with the
    identical fixed-order float tree (bm25 term + knn term).  The bm25
    ranking inlines the bm25_search oracle statement as a subquery; the
    knn ranking is the knn_bruteforce window at k=20."""
    knn20 = (
        "WITH q AS (SELECT embedding AS qv FROM embeddings "
        "WHERE vec_id = 0) "
        "SELECT e.vec_id AS doc_id, CAST(rank() OVER (ORDER BY "
        "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
        "CAST(q.qv AS DOUBLE[])) DESC, e.vec_id) "
        "AS BIGINT) AS r FROM embeddings e, q WHERE e.vec_id <> 0 "
        "ORDER BY r LIMIT 20")
    return (
        f"WITH bm AS (SELECT doc_id, CAST(row_number() OVER ("
        f"ORDER BY score_c DESC, doc_id) AS BIGINT) AS r "
        f"FROM ({d['bm25_search']})), "
        f"kn AS (SELECT doc_id, r FROM ({knn20})), "
        "u AS (SELECT coalesce(bm.doc_id, kn.doc_id) AS doc_id, "
        "(CASE WHEN bm.r IS NULL THEN CAST(0 AS DOUBLE) ELSE "
        "CAST(1 AS DOUBLE) / CAST(60 + bm.r AS DOUBLE) END) + "
        "(CASE WHEN kn.r IS NULL THEN CAST(0 AS DOUBLE) ELSE "
        "CAST(1 AS DOUBLE) / CAST(60 + kn.r AS DOUBLE) END) AS s "
        "FROM bm FULL OUTER JOIN kn ON bm.doc_id = kn.doc_id) "
        "SELECT doc_id, CAST(floor(s * 1000000000.0 + 0.5) AS BIGINT) "
        "AS rrf_c FROM u ORDER BY rrf_c DESC, doc_id LIMIT 20")


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    d["corpus_curation"] = _compose_curation_oracle(d)
    d["web_pipeline"] = _compose_web_pipeline_oracle(d)
    d["rrf_fusion"] = _compose_rrf_oracle(d)
    return d


def _oracle_sql_base() -> dict[str, str]:
    return {
        # PMI collocations: positional self-join + same-libm ln
        "bigram_pmi":
            "WITH w AS (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS word, "
            "unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos "
            "FROM documents), "
            "bg AS (SELECT a.word AS w1, b.word AS w2, "
            "CAST(count(*) AS BIGINT) AS c_xy FROM w a "
            "JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 "
            "WHERE a.word <> '' AND b.word <> '' GROUP BY w1, w2), "
            "ug AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM w "
            "WHERE word <> '' GROUP BY word), "
            "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w "
            "WHERE word <> '') "
            "SELECT bg.w1, bg.w2, bg.c_xy, "
            "CAST(floor(ln(CAST(bg.c_xy * nn.n AS DOUBLE) / "
            "CAST(ua.c * ub.c AS DOUBLE)) * 1000000000.0 + 0.5) "
            "AS BIGINT) AS pmi_e9 "
            "FROM bg, nn JOIN ug ua ON ua.word = bg.w1 "
            "JOIN ug ub ON ub.word = bg.w2 WHERE bg.c_xy >= 5 "
            "ORDER BY pmi_e9 DESC, bg.w1, bg.w2 LIMIT 20",
        # TWAP: exact trapezoid integers, one IEEE division
        "user_twap":
            "WITH w AS (SELECT user_id, epoch_us(ts) AS t, "
            "CAST(round(value * 100) AS BIGINT) AS v, "
            "lead(epoch_us(ts)) OVER win AS t2, "
            "lead(CAST(round(value * 100) AS BIGINT)) OVER win AS v2 "
            "FROM events WINDOW win AS (PARTITION BY user_id "
            "ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, "
            "CAST(sum((v + v2) * ((t2 - t) // 1000000)) AS BIGINT) "
            "AS twap_num, "
            "CAST(2 * sum((t2 - t) // 1000000) AS BIGINT) AS twap_den "
            "FROM w WHERE t2 IS NOT NULL GROUP BY user_id) "
            "SELECT user_id, twap_num, twap_den, "
            "CAST(twap_num AS DOUBLE) / CAST(twap_den AS DOUBLE) AS twap "
            "FROM s WHERE twap_den > 0 ORDER BY user_id",
        # exact two-sample KS: integer cross-multiplied max, one IEEE
        # division for the milli statistic
        "events_ks_drift":
            "WITH e AS (SELECT event_type, "
            "CAST(round(value * 100) AS BIGINT) AS v, "
            "CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END "
            "AS ia FROM events), "
            "c AS (SELECT event_type, v, CAST(sum(ia) AS BIGINT) AS ca, "
            "CAST(sum(1 - ia) AS BIGINT) AS cb FROM e "
            "GROUP BY event_type, v), "
            "t AS (SELECT event_type, CAST(sum(ca) AS BIGINT) AS na, "
            "CAST(sum(cb) AS BIGINT) AS nb FROM c GROUP BY event_type), "
            "w AS (SELECT c.event_type, "
            "sum(ca) OVER (PARTITION BY c.event_type ORDER BY v) AS cuma, "
            "sum(cb) OVER (PARTITION BY c.event_type ORDER BY v) AS cumb "
            "FROM c), "
            "d AS (SELECT w.event_type, t.na, t.nb, "
            "CAST(max(abs(cuma * t.nb - cumb * t.na)) AS BIGINT) AS d_num "
            "FROM w JOIN t USING (event_type) "
            "GROUP BY w.event_type, t.na, t.nb) "
            "SELECT event_type, na, nb, d_num, "
            "CAST(floor(CAST(d_num AS DOUBLE) / "
            "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * 1000 + 0.5) "
            "AS BIGINT) AS ks_milli FROM d ORDER BY event_type",
        # global rank: row_number window, identical composite order
        "orders_global_rank":
            "SELECT o_orderkey, CAST(row_number() OVER ("
            "ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank "
            "FROM orders ORDER BY o_orderkey",
        # resample: constant mirror; certificates are exact grid /
        # identity / spectral-drift math over actually-decoded samples
        "audio_resample":
            "WITH i AS (SELECT unnest(range(96)) AS idx) "
            "SELECT 'aud' || lpad(CAST(idx AS VARCHAR), 10, '0') "
            "AS audio_id, CAST(1 AS BIGINT) AS len_ok, "
            "CAST(1 AS BIGINT) AS roundtrip_ok, "
            "CAST(1 AS BIGINT) AS freq_ok FROM i",
        # augmentation: constant mirror; certificates are exact pixel
        # algebra over the actually-decoded frames
        "augment_images":
            "WITH i AS (SELECT unnest(range(200)) AS idx) "
            "SELECT 'img' || lpad(CAST(idx AS VARCHAR), 12, '0') "
            "AS image_id, CAST(1 AS BIGINT) AS flip_involution_ok, "
            "CAST(1 AS BIGINT) AS rot_cycle_ok, "
            "CAST(1 AS BIGINT) AS sum_invariant_ok, "
            "CAST(1 AS BIGINT) AS png_roundtrip_ok FROM i",
        # skew profile: exact per-key-column multiplicity stats
        "key_skew_profile": """SELECT 'l_orderkey' AS col_name, n, n_distinct, max_cnt, f2, CAST(f2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS concentration FROM (SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(cnt) AS BIGINT) AS max_cnt, CAST(sum(cnt * cnt) AS BIGINT) AS f2 FROM (SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_orderkey))  UNION ALL SELECT 'l_partkey' AS col_name, n, n_distinct, max_cnt, f2, CAST(f2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS concentration FROM (SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(cnt) AS BIGINT) AS max_cnt, CAST(sum(cnt * cnt) AS BIGINT) AS f2 FROM (SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_partkey))  UNION ALL SELECT 'l_suppkey' AS col_name, n, n_distinct, max_cnt, f2, CAST(f2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS concentration FROM (SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(cnt) AS BIGINT) AS max_cnt, CAST(sum(cnt * cnt) AS BIGINT) AS f2 FROM (SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_suppkey)) """,
        # global percent_rank: one float division of identical ints
        "events_value_percentile":
            "SELECT event_id, percent_rank() OVER (ORDER BY value) "
            "AS pct_rank FROM events ORDER BY event_id",
        # global NTILE via composite int64 order key + distributed scan
        # (the pre-existing events_ntile is the PARTITIONED ntile(4); this
        # one is the global equal-frequency bucketing over one total order)
        "events_ntile_global":
            "SELECT event_id, CAST(ntile(8) OVER "
            "(ORDER BY CAST(round(value * 100) AS BIGINT), event_id) "
            "AS BIGINT) AS tile FROM events ORDER BY event_id",
        # decayed engagement: per-distinct-gap libm pow, integer sums
        "user_decay_scores":
            "WITH mx AS (SELECT max(epoch_us(ts) // 86400000000) AS md "
            "FROM events), "
            "e AS (SELECT user_id, "
            "CAST(round(value * 100) AS BIGINT) * "
            "CAST(floor(power(0.9, CAST(mx.md - "
            "epoch_us(ts) // 86400000000 AS DOUBLE)) * 1000000.0 + 0.5) "
            "AS BIGINT) AS term FROM events, mx) "
            "SELECT user_id, CAST(sum(term) AS BIGINT) AS decayed_c6, "
            "CAST(count(*) AS BIGINT) AS n FROM e GROUP BY user_id "
            "ORDER BY user_id",
        # rolling z-score: window sufficient stats + pure integer test
        "events_rolling_outliers":
            "WITH w AS (SELECT event_id, user_id, "
            "CAST(round(value * 100) AS BIGINT) AS v, "
            "count(*) OVER win AS n, "
            "sum(CAST(round(value * 100) AS BIGINT)) OVER win AS s, "
            "sum(CAST(round(value * 100) AS BIGINT) * "
            "CAST(round(value * 100) AS BIGINT)) OVER win AS ss "
            "FROM events WINDOW win AS (PARTITION BY user_id "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)) "
            "SELECT event_id, user_id, CAST(n AS BIGINT) AS rolling_n, "
            "CAST(CASE WHEN (n*v - s)*(n*v - s) > 4*(n*ss - s*s) "
            "THEN 1 ELSE 0 END AS BIGINT) AS is_outlier "
            "FROM w ORDER BY event_id",
        # lossless compressed-JSONL round trip: full content equality
        "jsonl_zst_roundtrip":
            "SELECT doc_id, text, lang, n_chars FROM documents "
            "ORDER BY doc_id",
        # Tukey fences: quantile_disc cents + pure integer half-cent
        # comparisons (the 1.5 factor never becomes a float)
        "events_iqr_outliers":
            "WITH q AS (SELECT event_type, "
            "CAST(round(quantile_disc(value, 0.25) * 100) AS BIGINT) "
            "AS q1_c, "
            "CAST(round(quantile_disc(value, 0.75) * 100) AS BIGINT) "
            "AS q3_c FROM events GROUP BY event_type) "
            "SELECT e.event_type, q.q1_c, q.q3_c, "
            "CAST(sum(CASE WHEN 2 * CAST(round(e.value * 100) AS BIGINT) "
            "< 2 * q.q1_c - 3 * (q.q3_c - q.q1_c) THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_low, "
            "CAST(sum(CASE WHEN 2 * CAST(round(e.value * 100) AS BIGINT) "
            "> 2 * q.q3_c + 3 * (q.q3_c - q.q1_c) THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_high, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM events e JOIN q USING (event_type) "
            "GROUP BY e.event_type, q.q1_c, q.q3_c ORDER BY e.event_type",
        # Markov transitions: LAG window + grouped count
        "event_transitions":
            "WITH w AS (SELECT user_id, event_type, lag(event_type) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev "
            "FROM events) "
            "SELECT prev AS from_type, event_type AS to_type, "
            "CAST(count(*) AS BIGINT) AS n FROM w WHERE prev IS NOT NULL "
            "GROUP BY from_type, to_type ORDER BY from_type, to_type",
        # compaction: exact row count; file counts + the distributed
        # multiset-checksum certificate mirror as constants
        "compact_orders_files":
            "SELECT CAST(32 AS BIGINT) AS n_files_in, "
            "CAST(4 AS BIGINT) AS n_files_out, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(1 AS BIGINT) AS content_ok FROM orders",
        # whole-schema FK profile: per-FK NOT EXISTS orphan counts
        "referential_integrity":
            "SELECT 'lineitem.l_orderkey->orders' AS fk, "
            "(SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child, "
            "(SELECT CAST(count(*) AS BIGINT) FROM lineitem l WHERE NOT "
            "EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_orderkey = l.l_orderkey)) AS n_orphan "
            "UNION ALL SELECT 'lineitem.l_partkey->part', "
            "(SELECT CAST(count(*) AS BIGINT) FROM lineitem), "
            "(SELECT CAST(count(*) AS BIGINT) FROM lineitem l WHERE NOT "
            "EXISTS (SELECT 1 FROM part p "
            "WHERE p.p_partkey = l.l_partkey)) "
            "UNION ALL SELECT 'lineitem.l_suppkey->supplier', "
            "(SELECT CAST(count(*) AS BIGINT) FROM lineitem), "
            "(SELECT CAST(count(*) AS BIGINT) FROM lineitem l WHERE NOT "
            "EXISTS (SELECT 1 FROM supplier s "
            "WHERE s.s_suppkey = l.l_suppkey)) "
            "UNION ALL SELECT 'orders.o_custkey->customer', "
            "(SELECT CAST(count(*) AS BIGINT) FROM orders), "
            "(SELECT CAST(count(*) AS BIGINT) FROM orders o WHERE NOT "
            "EXISTS (SELECT 1 FROM customer c "
            "WHERE c.c_custkey = o.o_custkey)) "
            "UNION ALL SELECT 'customer.c_nationkey->nation', "
            "(SELECT CAST(count(*) AS BIGINT) FROM customer), "
            "(SELECT CAST(count(*) AS BIGINT) FROM customer c WHERE NOT "
            "EXISTS (SELECT 1 FROM nation n "
            "WHERE n.n_nationkey = c.c_nationkey)) "
            "UNION ALL SELECT 'supplier.s_nationkey->nation', "
            "(SELECT CAST(count(*) AS BIGINT) FROM supplier), "
            "(SELECT CAST(count(*) AS BIGINT) FROM supplier s WHERE NOT "
            "EXISTS (SELECT 1 FROM nation n "
            "WHERE n.n_nationkey = s.s_nationkey)) "
            "UNION ALL SELECT 'nation.n_regionkey->region', "
            "(SELECT CAST(count(*) AS BIGINT) FROM nation), "
            "(SELECT CAST(count(*) AS BIGINT) FROM nation n WHERE NOT "
            "EXISTS (SELECT 1 FROM region r "
            "WHERE r.r_regionkey = n.n_regionkey))",
        # thumbnail pipeline: constant mirror; certificates computed
        # Ray-side from the actual decode/resize/encode round trip
        "thumbnail_images":
            "WITH i AS (SELECT unnest(range(200)) AS idx) "
            "SELECT 'img' || lpad(CAST(idx AS VARCHAR), 12, '0') "
            "AS image_id, CAST(16 AS BIGINT) AS w, CAST(16 AS BIGINT) "
            "AS h, 'png' AS fmt, CAST(1 AS BIGINT) AS resize_ok, "
            "CAST(1 AS BIGINT) AS dims_ok, CAST(1 AS BIGINT) AS mean_ok "
            "FROM i",
        # grouped OLS: integer sufficient stats + identical float tree
        "events_regression_by_type":
            "WITH s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(extract(hour FROM ts) AS BIGINT)) AS BIGINT) "
            "AS sx, "
            "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sy, "
            "CAST(sum(CAST(extract(hour FROM ts) AS BIGINT) * "
            "CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sxy, "
            "CAST(sum(CAST(extract(hour FROM ts) AS BIGINT) * "
            "CAST(extract(hour FROM ts) AS BIGINT)) AS BIGINT) AS sxx "
            "FROM events GROUP BY event_type), "
            "m AS (SELECT event_type, n, "
            "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx, "
            "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my, "
            "CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) AS mxy, "
            "CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) AS mxx FROM s), "
            "r AS (SELECT event_type, n, "
            "(mxy - mx * my) / (mxx - mx * mx) AS slope, mx, my FROM m) "
            "SELECT event_type, n, slope, my - slope * mx AS intercept "
            "FROM r ORDER BY event_type",
        # n*H entropy in e9 fixed point: one libm log2 per distinct
        # (cnt, n) pair, integer sums both sides
        "char_entropy":
            "WITH ch AS (SELECT doc_id, "
            "unnest(string_split_regex(text, '')) AS c FROM documents), "
            "cc AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt "
            "FROM ch WHERE length(c) > 0 GROUP BY doc_id, c), "
            "nn AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n "
            "FROM cc GROUP BY doc_id) "
            "SELECT cc.doc_id, nn.n AS n_chars, "
            "CAST(sum(cnt * CAST(floor((-log2("
            "CAST(cnt AS DOUBLE) / CAST(nn.n AS DOUBLE))) "
            "* 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS ent_e9 "
            "FROM cc JOIN nn USING (doc_id) GROUP BY cc.doc_id, nn.n "
            "ORDER BY cc.doc_id",
        # exact join cardinality + F2s; ams_ok is the Ray-side integer
        # certificate (constant 1 mirror)
        "join_size_lineitem":
            "WITH a AS (SELECT l_partkey AS k, "
            "CAST(count(*) AS BIGINT) AS c FROM lineitem "
            "WHERE l_returnflag = 'R' GROUP BY k), "
            "b AS (SELECT l_partkey AS k, "
            "CAST(count(*) AS BIGINT) AS c FROM lineitem "
            "WHERE l_quantity > 25 GROUP BY k) "
            "SELECT CAST(coalesce((SELECT sum(a.c * b.c) FROM a "
            "JOIN b ON a.k = b.k), 0) AS BIGINT) AS join_size, "
            "(SELECT CAST(sum(c * c) AS BIGINT) FROM a) AS f2_a, "
            "(SELECT CAST(sum(c * c) AS BIGINT) FROM b) AS f2_b, "
            "CAST(1 AS BIGINT) AS ams_ok",
        # grouped centroids: integer fixed-point sums, one IEEE division
        "embedding_centroids":
            "WITH e AS (SELECT vec_id, unnest(embedding) AS v, "
            "unnest(range(len(embedding))) AS dim FROM embeddings), "
            "j AS (SELECT d.lang, CAST(e.dim AS BIGINT) AS dim, "
            "CAST(floor(CAST(e.v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) "
            "AS cv FROM e JOIN documents d ON e.vec_id = d.doc_id) "
            "SELECT lang, dim, CAST(sum(cv) AS BIGINT) AS sum_c, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(CAST(sum(cv) AS BIGINT) AS DOUBLE) / "
            "CAST(count(*) AS DOUBLE) AS mean "
            "FROM j GROUP BY lang, dim ORDER BY lang, dim",
        # Exif probe: SQL constructs every field from the same idx
        # arithmetic the engine parses out of the APP1 bytes
        "image_exif":
            "WITH i AS (SELECT unnest(range(160)) AS idx) "
            "SELECT 'img' || lpad(CAST(idx AS VARCHAR), 12, '0') "
            "AS image_id, "
            "CASE WHEN idx % 2 = 0 THEN 'II' ELSE 'MM' END AS endian, "
            "'CAM' || CAST(idx % 5 AS VARCHAR) AS make, "
            "'M' || CAST(idx % 7 AS VARCHAR) AS model, "
            "CAST(1 + idx % 8 AS BIGINT) AS orientation, "
            "CAST(72 + idx % 4 AS BIGINT) AS xres_num, "
            "CAST(1 AS BIGINT) AS xres_den, "
            "'2024:01:' || lpad(CAST(1 + idx % 28 AS VARCHAR), 2, '0') || "
            "' 12:' || lpad(CAST(idx % 60 AS VARCHAR), 2, '0') || ':00' "
            "AS datetime, "
            "CAST(100 * (1 + idx % 16) AS BIGINT) AS iso, "
            "'2024:01:' || lpad(CAST(1 + idx % 28 AS VARCHAR), 2, '0') || "
            "' 11:' || lpad(CAST(idx % 60 AS VARCHAR), 2, '0') || ':59' "
            "AS datetime_original FROM i",
        # frequency moments: exact integer f0/f1/f2; ams_ok is the
        # Ray-side integer certificate (constant 1 mirror)
        "word_moments":
            "WITH w AS (SELECT unnest(string_split(text, ' ')) AS word "
            "FROM documents), "
            "c AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w "
            "WHERE word <> '' GROUP BY word) "
            "SELECT CAST(count(*) AS BIGINT) AS f0, "
            "CAST(sum(cnt) AS BIGINT) AS f1, "
            "CAST(sum(cnt * cnt) AS BIGINT) AS f2, "
            "CAST(1 AS BIGINT) AS ams_ok FROM c",
        # sliding-window chunker: identical floor-division chunk count,
        # 1-based inclusive list slices + array_to_string
        "chunk_documents":
            "WITH w AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS ws "
            "FROM documents), "
            "n AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n "
            "FROM w WHERE len(ws) >= 1), "
            "c AS (SELECT doc_id, ws, n, unnest(range(0, "
            "1 + greatest(0, (n - 40 + 29) // 30))) AS chunk_id FROM n) "
            "SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, "
            "CAST(least(chunk_id * 30 + 40, n) - chunk_id * 30 AS BIGINT) "
            "AS n_words, "
            "array_to_string(ws[chunk_id * 30 + 1 : "
            "least(chunk_id * 30 + 40, n)], ' ') AS chunk_text FROM c",
        # BM25 (Lucene idf): same libm ln, same double literals, fixed
        # term-order adds, floor(score*1e6+0.5) fixed point on both sides
        "bm25_search":
            "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS word FROM documents), "
            "wn AS (SELECT doc_id, word FROM w WHERE word <> ''), "
            "tf AS (SELECT doc_id, "
            "CAST(sum(CASE WHEN word = 'hash' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS tf0, "
            "CAST(sum(CASE WHEN word = 'merge' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS tf1, "
            "CAST(sum(CASE WHEN word = 'scan' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS tf2, "
            "CAST(sum(CASE WHEN word = 'window' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS tf3, "
            "CAST(count(*) AS BIGINT) AS dl FROM wn GROUP BY doc_id), "
            "g AS (SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) "
            "AS n, CAST(count(*) AS BIGINT) AS sum_dl FROM wn), "
            "s AS (SELECT CAST(g.sum_dl AS DOUBLE) / CAST(g.n AS DOUBLE) "
            "AS avgdl, "
            "ln(1 + (CAST(g.n - (SELECT count(*) FROM tf WHERE tf0 > 0) "
            "AS DOUBLE) + 0.5) / (CAST((SELECT count(*) FROM tf "
            "WHERE tf0 > 0) AS DOUBLE) + 0.5)) AS idf0, "
            "ln(1 + (CAST(g.n - (SELECT count(*) FROM tf WHERE tf1 > 0) "
            "AS DOUBLE) + 0.5) / (CAST((SELECT count(*) FROM tf "
            "WHERE tf1 > 0) AS DOUBLE) + 0.5)) AS idf1, "
            "ln(1 + (CAST(g.n - (SELECT count(*) FROM tf WHERE tf2 > 0) "
            "AS DOUBLE) + 0.5) / (CAST((SELECT count(*) FROM tf "
            "WHERE tf2 > 0) AS DOUBLE) + 0.5)) AS idf2, "
            "ln(1 + (CAST(g.n - (SELECT count(*) FROM tf WHERE tf3 > 0) "
            "AS DOUBLE) + 0.5) / (CAST((SELECT count(*) FROM tf "
            "WHERE tf3 > 0) AS DOUBLE) + 0.5)) AS idf3 FROM g), "
            "sc AS (SELECT tf.doc_id, tf.dl, CAST(floor(("
            "(s.idf0 * (CAST(tf.tf0 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1)))"
            " / (CAST(tf.tf0 AS DOUBLE) + CAST(1.2 AS DOUBLE) * "
            "((1 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE) * "
            "(CAST(tf.dl AS DOUBLE) / s.avgdl))) + "
            "(s.idf1 * (CAST(tf.tf1 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1)))"
            " / (CAST(tf.tf1 AS DOUBLE) + CAST(1.2 AS DOUBLE) * "
            "((1 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE) * "
            "(CAST(tf.dl AS DOUBLE) / s.avgdl))) + "
            "(s.idf2 * (CAST(tf.tf2 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1)))"
            " / (CAST(tf.tf2 AS DOUBLE) + CAST(1.2 AS DOUBLE) * "
            "((1 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE) * "
            "(CAST(tf.dl AS DOUBLE) / s.avgdl))) + "
            "(s.idf3 * (CAST(tf.tf3 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1)))"
            " / (CAST(tf.tf3 AS DOUBLE) + CAST(1.2 AS DOUBLE) * "
            "((1 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE) * "
            "(CAST(tf.dl AS DOUBLE) / s.avgdl)))"
            ") * 1000000 + 0.5) AS BIGINT) AS score_c "
            "FROM tf, s WHERE tf.tf0 + tf.tf1 + tf.tf2 + tf.tf3 > 0) "
            "SELECT doc_id, dl, score_c FROM sc "
            "ORDER BY score_c DESC, doc_id LIMIT 20",
        # grouped heavy hitters: row_number window, identical tiebreak
        "top_words_by_lang":
            "WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS word "
            "FROM documents), "
            "c AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS cnt "
            "FROM w WHERE word <> '' GROUP BY lang, word) "
            "SELECT lang, word, cnt FROM (SELECT *, row_number() OVER ("
            "PARTITION BY lang ORDER BY cnt DESC, word) AS rn FROM c) "
            "WHERE rn <= 5 ORDER BY lang, cnt DESC, word",
        # generate_series grid + IGNORE-NULLS forward fill, integer cents
        "events_gapfill":
            "WITH agg AS (SELECT event_type, "
            "epoch_us(ts) // 60000000 AS b, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS s FROM events GROUP BY event_type, b), "
            "bounds AS (SELECT event_type, min(b) AS b0, max(b) AS b1 "
            "FROM agg GROUP BY event_type), "
            "grid AS (SELECT event_type, unnest(range(b0, b1 + 1)) AS bucket "
            "FROM bounds), "
            "j AS (SELECT g.event_type, g.bucket, coalesce(a.n, 0) AS n, "
            "a.s FROM grid g LEFT JOIN agg a "
            "ON g.event_type = a.event_type AND g.bucket = a.b) "
            "SELECT event_type, bucket, n, "
            "last_value(s IGNORE NULLS) OVER (PARTITION BY event_type "
            "ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS v_sum_c "
            "FROM j ORDER BY event_type, bucket",
        # MERGE/CDC apply: latest-seq-wins full-row replace, FULL OUTER
        # JOIN merge in SQL; change stream derived from orders on both sides
        "merge_orders_changes":
            "WITH b AS (SELECT o_orderkey, o_custkey, o_orderstatus, "
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c "
            "FROM orders), "
            "ch AS ("
            "SELECT o_orderkey, o_custkey, o_orderstatus, "
            "price_c + 100000 AS price_c, 1 AS seq, 'upsert' AS op "
            "FROM b WHERE o_orderkey % 10 = 3 "
            "UNION ALL SELECT o_orderkey, CAST(NULL AS BIGINT), "
            "CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), 1, 'delete' "
            "FROM b WHERE o_orderkey % 10 = 7 "
            "UNION ALL SELECT o_orderkey, o_custkey, 'X', price_c, 2, "
            "'upsert' FROM b WHERE o_orderkey % 20 = 3 "
            "UNION ALL SELECT o_orderkey + 1000000000, o_custkey, 'N', "
            "12345, 1, 'upsert' FROM b WHERE o_orderkey % 10 = 1), "
            "latest AS (SELECT * FROM (SELECT *, row_number() OVER ("
            "PARTITION BY o_orderkey ORDER BY seq DESC) AS rn FROM ch) "
            "WHERE rn = 1) "
            "SELECT o_orderkey, "
            "CASE WHEN l.op IS NOT NULL THEN l.o_custkey "
            "ELSE b.o_custkey END AS o_custkey, "
            "CASE WHEN l.op IS NOT NULL THEN l.o_orderstatus "
            "ELSE b.o_orderstatus END AS o_orderstatus, "
            "CASE WHEN l.op IS NOT NULL THEN l.price_c "
            "ELSE b.price_c END AS price_c "
            "FROM b FULL OUTER JOIN latest l USING (o_orderkey) "
            "WHERE l.op IS NULL OR l.op <> 'delete' "
            "ORDER BY o_orderkey",
        # vectorized JSON field extraction vs DuckDB json_extract_string;
        # every extracted value pinned through integer aggregates
        "events_props_extract":
            "WITH p AS (SELECT event_type, "
            "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k "
            "FROM events) "
            "SELECT event_type, k % 16 AS k_bucket, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(k) AS BIGINT) AS k_sum, "
            "CAST(min(k) AS BIGINT) AS k_min, "
            "CAST(max(k) AS BIGINT) AS k_max "
            "FROM p GROUP BY event_type, k_bucket "
            "ORDER BY event_type, k_bucket",
        # integer-fixpoint power iteration, unrolled CTE per iteration
        "pagerank_parts": _pagerank_oracle(3),
        # unrolled min-label propagation, one CTE per sweep
        "part_components": _components_oracle(4),
        "part_kcore": _kcore_oracle(6, 3),
        "pagerank_personalized": _ppr_oracle(3, 50),
        # unrolled Morton interleave + zone-map prune, both sides
        "zorder_scan_orders": _zorder_scan_oracle(),
        # triangles = canonical edges joined 3-ways; wedges = sum C(d,2)
        "part_triangles":
            "WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
            "FROM lineitem WHERE l_partkey % 10 = 0), "
            "e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a "
            "JOIN li b ON a.o = b.o AND a.p < b.p), "
            "deg AS (SELECT x, count(*) AS d FROM ("
            "SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) "
            "GROUP BY x) "
            "SELECT (SELECT count(*) FROM deg) AS n_nodes, "
            "(SELECT count(*) FROM e) AS n_edges, "
            "(SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) "
            "AS n_wedges, "
            "(SELECT count(*) FROM e e1 JOIN e e2 ON e2.u = e1.v "
            "JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles",
        # same xor-fold coordinates both sides; IEJoin on the ranges
        "orders_geo_pairs":
            "WITH h AS (SELECT o_orderkey AS id, "
            "(o_orderkey * 2654435761) % 4294967296 AS h1, "
            "((o_orderkey + 1000003) * 2654435761) % 4294967296 AS h2 "
            "FROM orders), "
            "p AS (SELECT id, "
            "(xor(h1, h1 >> 16) * 40503) % 4294967296 % 1000000 AS x, "
            "(xor(h2, h2 >> 16) * 40503) % 4294967296 % 1000000 AS y "
            "FROM h), "
            "c AS (SELECT id, x, y, x // 2000 AS cx, y // 2000 AS cy "
            "FROM p), "
            "o(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),"
            "(0,1),(1,-1),(1,0),(1,1)), "
            "r AS (SELECT c.id, c.x, c.y, c.cx + o.dx AS gx, "
            "c.cy + o.dy AS gy FROM c, o) "
            "SELECT a.id AS id_a, b.id AS id_b "
            "FROM c a JOIN r b ON a.cx = b.gx AND a.cy = b.gy "
            "WHERE a.id < b.id AND abs(a.x - b.x) <= 2000 "
            "AND abs(a.y - b.y) <= 2000 ORDER BY id_a, id_b",
        # skyline over DISTINCT points: sorted (price asc, size desc),
        # dominated iff prefix-max(size) >= size (pure-integer window)
        "parts_skyline":
            "WITH d AS (SELECT DISTINCT "
            "CAST(round(p_retailprice * 100) AS BIGINT) AS price_c, "
            "CAST(p_size AS BIGINT) AS p_size FROM part), "
            "m AS (SELECT price_c, p_size, max(p_size) OVER ("
            "ORDER BY price_c ASC, p_size DESC "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm "
            "FROM d) "
            "SELECT price_c, p_size FROM m "
            "WHERE pm IS NULL OR pm < p_size ORDER BY price_c",
        "exact_dedup_docs":
            "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text",
        # tiered cascade: window-fn exact dedup, then the same distinct-
        # window self-join + INTEGER Jaccard inequality as the engine
        "tiered_dedup_docs":
            "WITH t1 AS (SELECT doc_id, text, CASE WHEN doc_id = "
            "min(doc_id) OVER (PARTITION BY text) THEN 0 ELSE 1 END AS t1d "
            "FROM documents), "
            "surv AS (SELECT doc_id, text FROM t1 WHERE t1d = 0), "
            "toks AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "t -> t <> '') AS tk FROM surv), "
            "idx AS (SELECT doc_id, tk, unnest(generate_series(1, "
            "len(tk) - 15)) AS i FROM toks WHERE len(tk) >= 16), "
            "w AS (SELECT doc_id, array_to_string(tk[i:i+15], ' ') AS win "
            "FROM idx), "
            "wd AS (SELECT DISTINCT doc_id, win FROM w), "
            "nw AS (SELECT doc_id, count(*) AS n FROM wd GROUP BY doc_id), "
            "pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) "
            "AS sw FROM wd a JOIN wd b ON a.win = b.win AND "
            "a.doc_id < b.doc_id GROUP BY 1, 2), "
            "d2 AS (SELECT DISTINCT p.ib AS doc_id FROM pairs p "
            "JOIN nw na ON na.doc_id = p.ia JOIN nw nb ON nb.doc_id = p.ib "
            "WHERE 2 * p.sw >= na.n + nb.n - p.sw) "
            "SELECT t1.doc_id, CAST(CASE WHEN t1.t1d = 1 THEN 1 "
            "WHEN t1.doc_id IN (SELECT doc_id FROM d2) THEN 2 ELSE 0 END "
            "AS BIGINT) AS drop_tier FROM t1 ORDER BY doc_id",
        # exact set-similarity join: pairs AND integer scores, same
        # prefix/length/positional-filtered plan on both sides
        "ssjoin_pairs": _ssjoin_oracle_sql(17, 20),
        # directional containment: same distinct-window machinery as the
        # tiered mirror, threshold on the CONTAINED side's window count
        "containment_docs":
            "WITH toks AS (SELECT doc_id, list_filter("
            "string_split(text, ' '), t -> t <> '') AS tk "
            "FROM documents), "
            "idx AS (SELECT doc_id, tk, unnest(generate_series(1, "
            "len(tk) - 15)) AS i FROM toks WHERE len(tk) >= 16), "
            "w AS (SELECT doc_id, array_to_string(tk[i:i+15], ' ') AS win "
            "FROM idx), "
            "wd AS (SELECT DISTINCT doc_id, win FROM w), "
            "nw AS (SELECT doc_id, count(*) AS n FROM wd GROUP BY doc_id), "
            "pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) "
            "AS sw FROM wd a JOIN wd b ON a.win = b.win AND "
            "a.doc_id <> b.doc_id GROUP BY 1, 2) "
            "SELECT p.ia AS id_a, p.ib AS id_b, "
            "CAST(p.sw AS BIGINT) AS shared_w, "
            "CAST(na.n AS BIGINT) AS n_w_a "
            "FROM pairs p JOIN nw na ON na.doc_id = p.ia "
            "WHERE 10 * p.sw >= 9 * na.n ORDER BY id_a, id_b",
        # invariant rows: per-doc n_words exact SQL; the segmentation
        # roundtrip and token-count bounds certificates computed Ray-side
        "bpe_tokenize":
            "SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), "
            "w -> w <> '')) AS BIGINT) AS n_words, "
            "CAST(1 AS BIGINT) AS bounds_ok, "
            "CAST(1 AS BIGINT) AS roundtrip_ok "
            "FROM documents ORDER BY doc_id",
        # invariant rows: brute-force Hamming truth + the 28-band octet-pair
        # pigeonhole guarantee (h<=6) certified Ray-side
        "simhash_dup_docs":
            "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(1 AS BIGINT) AS precision_ok, "
            "CAST(1 AS BIGINT) AS pigeonhole_ok FROM documents",
        # constant-SQL invariant: the full 8-chart reference figure set,
        # each SVG well-formed (names are the reference chart inventory)
        "charts":
            "SELECT c.chart, CAST(1 AS BIGINT) AS svg_ok FROM (VALUES "
            "('cardinality_bias'), ('cardinality_rmse'), "
            "('collision_probability'), ('helper_func_error'), "
            "('joint_rmse'), ('performance'), "
            "('probability_densities_r1'), ('probability_densities_r3')"
            ") c(chart) ORDER BY c.chart",
        # invariant rows: the truth count is the ssjoin recomputed
        # independently in SQL; precision/recall certificates Ray-side
        "near_dup_docs":
            "SELECT CAST(count(*) AS BIGINT) AS n_true_pairs, "
            "CAST(1 AS BIGINT) AS precision_ok, "
            "CAST(1 AS BIGINT) AS recall_floor_ok FROM ("
            + _ssjoin_oracle_sql(17, 20) + ")",
        # constant-SQL invariants: the flagship's north-rule contract —
        # recall/precision >= 0.99 vs the analytic planted truth and a
        # full relabeling (no rows dropped); certificates computed Ray-side
        "near_dup_images":
            "SELECT CAST(1000 AS BIGINT) AS n_images, "
            "CAST(1 AS BIGINT) AS recall_ok, "
            "CAST(1 AS BIGINT) AS precision_ok, "
            "CAST(1 AS BIGINT) AS all_rows_kept_ok",
        # the geometric grid is a pure function (geometric_cardinalities)
        # mirrored into the VALUES list; rmse/bias bound certificates
        # computed Ray-side against the paper's closed-form RSD
        "cardinality_eval": _cardinality_grid_sql(),
        # 294 = the full reference joint tuple grid
        # (joint_estimation_test.cpp:48-102 sweep, a pure function)
        "joint_eval":
            "SELECT CAST(294 AS BIGINT) AS n_tuples, "
            "CAST(1 AS BIGINT) AS finite_ok, "
            "CAST(1 AS BIGINT) AS rmse_median_ok, "
            "CAST(1 AS BIGINT) AS rmse_max_ok",
        # analytic planted-truth pair count + exact-set-equality
        # certificates (recall AND precision 1.0 across re-encode /
        # container-swap / trim variants)
        "near_dup_videos": _video_truth_sql(),
        "near_dup_audio": _audio_truth_sql(),
        # per-(container, kind) blob counts of the deterministic 208-blob
        # mixed corpus; parse/codec/dims/duration/frames/decodability
        # certificates vs the generation parameters computed Ray-side
        "media_probe":
            "SELECT c.container, c.kind, CAST(c.n_media AS BIGINT) "
            "AS n_media, CAST(1 AS BIGINT) AS parse_ok, "
            "CAST(1 AS BIGINT) AS codec_ok, CAST(1 AS BIGINT) AS dims_ok, "
            "CAST(1 AS BIGINT) AS duration_ok, "
            "CAST(1 AS BIGINT) AS frames_ok, "
            "CAST(1 AS BIGINT) AS decodable_ok FROM (VALUES "
            "('avi', 'video', 29), ('flac', 'audio', 14), "
            "('gif', 'video', 18), ('heif', 'image', 12), "
            "('mkv', 'video', 2), ('mp3', 'audio', 7), "
            "('mp4', 'video', 32), ('ogg', 'audio', 20), "
            "('ogg', 'video', 3), ('wav', 'audio', 40), "
            "('webm', 'video', 4), ('webp', 'image', 10), "
            "('webp', 'video', 17)) c(container, kind, n_media) "
            "ORDER BY c.container, c.kind",
        # per-codec clip counts (pure corpus-definition function) +
        # decode-fidelity-vs-raw-waveform certificates
        "audio_fingerprint": _audio_fp_sql(),
        # 96 = the deterministic mixed-container video corpus size
        "video_frame_phash":
            "SELECT CAST(96 AS BIGINT) AS n_clips, "
            "CAST(1 AS BIGINT) AS coverage_ok, "
            "CAST(1 AS BIGINT) AS ts_ok, "
            "CAST(1 AS BIGINT) AS diversity_ok",
        # selection contract re-verified Ray-side against an independent
        # driver recomputation (argmax quality per cluster, tie -> min id)
        "image_cluster_representatives":
            "SELECT CAST(1000 AS BIGINT) AS n_images, "
            "CAST(1 AS BIGINT) AS one_per_cluster_ok, "
            "CAST(1 AS BIGINT) AS member_ok, "
            "CAST(1 AS BIGINT) AS argmax_ok",
        # RE2 on both sides: identical patterns -> identical strings/counts
        "scrub_pii":
            "WITH aug AS (SELECT doc_id, text || ' contact u' || doc_id "
            "|| '@example.com via https://ex.org/d/' || doc_id "
            "|| ' ref 12345678' AS t FROM documents) "
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(t, 'https?://[^ ]+')) AS BIGINT) "
            "AS n_urls, "
            "CAST(len(regexp_extract_all(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) "
            "AS n_emails, "
            "CAST(len(regexp_extract_all(t, '[0-9]{6,}')) AS BIGINT) "
            "AS n_nums, "
            "regexp_replace(regexp_replace(regexp_replace(t, "
            "'https?://[^ ]+', '<URL>', 'g'), "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
            "'<EMAIL>', 'g'), '[0-9]{6,}', '<NUM>', 'g') AS scrubbed "
            "FROM aug ORDER BY doc_id",
        # mixing sampler: identical rate + hash-fraction expressions
        "mix_corpus":
            "WITH tot AS (SELECT count(*) // 2 AS t FROM documents), "
            "cnt AS (SELECT lang, count(*) AS c FROM documents "
            "        GROUP BY lang), "
            "r AS (SELECT lang, least(1.0, (SELECT t FROM tot) * "
            "(CASE lang WHEN 'en' THEN 0.5 ELSE 0.125 END) / c) AS rate "
            "FROM cnt) "
            "SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang) "
            "WHERE (d.doc_id * 2654435761 % 4294967296) / 4294967296.0 "
            "< r.rate ORDER BY d.doc_id",
        # pure-integer dow/hour keys; cents sums on both sides
        "events_dow_hour":
            "SELECT CAST(dayofweek(ts) AS BIGINT) AS dow, "
            "CAST(hour(ts) AS BIGINT) AS hr, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_value_c FROM events GROUP BY 1, 2 ORDER BY dow, hr",
        # equi-depth histogram: identical quantile_disc boundaries and
        # right-closed CASE bucketing; integer-cent sums on both sides
        "value_equidepth_histogram":
            "WITH b AS (SELECT quantile_disc(value, [0.25, 0.5, 0.75]) "
            "AS q FROM events) "
            "SELECT CAST(CASE WHEN value <= q[1] THEN 0 "
            "WHEN value <= q[2] THEN 1 WHEN value <= q[3] THEN 2 "
            "ELSE 3 END AS BIGINT) AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_value_c FROM events, b GROUP BY 1 ORDER BY bucket",
        # Gopher repetition signals: exact word split + positional bigram
        # self-join; the fraction is ONE double multiply+divide of exactly
        # representable ints, identical on both engines
        "gopher_repetition":
            "WITH words AS ("
            "  SELECT doc_id, unnest(string_split(text, ' ')) AS w, "
            "         unnest(range(1, len(string_split(text, ' ')) + 1))"
            "         AS pos FROM documents), "
            "per_word AS (SELECT doc_id, w, count(*) AS cnt FROM words "
            "             GROUP BY doc_id, w), "
            "wstats AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,"
            "           max(cnt) AS top_cnt FROM per_word GROUP BY doc_id),"
            "bigrams AS (SELECT a.doc_id, a.w || ' ' || b.w AS bg "
            "            FROM words a JOIN words b ON a.doc_id = b.doc_id "
            "            AND b.pos = a.pos + 1), "
            "per_bg AS (SELECT doc_id, bg, count(*) AS cnt FROM bigrams "
            "           GROUP BY doc_id, bg), "
            "bstats AS (SELECT doc_id, sum(cnt) AS n_bg, "
            "           sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) "
            "           AS dup_occ FROM per_bg GROUP BY doc_id) "
            "SELECT w.doc_id, w.n_words, "
            "CAST(floor(1000000.0 * w.top_cnt / w.n_words + 0.5) AS BIGINT)"
            " AS top_word_frac_e6, "
            "CAST(CASE WHEN coalesce(b.n_bg, 0) > 0 THEN "
            "floor(1000000.0 * b.dup_occ / b.n_bg + 0.5) ELSE 0 END "
            "AS BIGINT) AS dup_bigram_frac_e6 "
            "FROM wstats w LEFT JOIN bstats b USING (doc_id) "
            "ORDER BY doc_id",
        # lossless tar round trip: byte counts straight off the base table
        "wds_roundtrip":
            "SELECT doc_id, lang, CAST(strlen(text) AS BIGINT) "  # bytes
            "AS n_bytes FROM documents ORDER BY doc_id",
        "orc_roundtrip":
            "SELECT doc_id, lang, CAST(strlen(text) AS BIGINT) "
            "AS n_bytes FROM documents ORDER BY doc_id",
        "avro_roundtrip":
            "SELECT doc_id, lang, CAST(strlen(text) AS BIGINT) "
            "AS n_bytes FROM documents ORDER BY doc_id",
        "sqlite_roundtrip":
            "SELECT doc_id, lang, CAST(strlen(text) AS BIGINT) "
            "AS n_bytes FROM documents ORDER BY doc_id",
        "arrow_roundtrip":
            "SELECT doc_id, lang, CAST(strlen(text) AS BIGINT) "
            "AS n_bytes FROM documents ORDER BY doc_id",
        "tfrecord_roundtrip":
            "SELECT doc_id, lang, CAST(strlen(text) AS BIGINT) "
            "AS n_bytes FROM documents ORDER BY doc_id",
        "warc_roundtrip":
            "SELECT doc_id, lang, CAST(strlen(text) AS BIGINT) "
            "AS n_bytes FROM documents ORDER BY doc_id",
        # counts/min/max/exact-distincts mirror per column; GHLL
        # estimate certified Ray-side
        "lineitem_profile":
            "SELECT * FROM ("
            "SELECT 'l_orderkey' AS col, CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(*) - count(l_orderkey) AS BIGINT) AS n_null, "
            "CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct, "
            "CAST(min(l_orderkey) AS VARCHAR) AS min_str, "
            "CAST(max(l_orderkey) AS VARCHAR) AS max_str, "
            "CAST(1 AS BIGINT) AS est_ok FROM lineitem"
            " UNION ALL "
            "SELECT 'l_partkey' AS col, CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(*) - count(l_partkey) AS BIGINT) AS n_null, "
            "CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct, "
            "CAST(min(l_partkey) AS VARCHAR) AS min_str, "
            "CAST(max(l_partkey) AS VARCHAR) AS max_str, "
            "CAST(1 AS BIGINT) AS est_ok FROM lineitem"
            " UNION ALL "
            "SELECT 'l_suppkey' AS col, CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(*) - count(l_suppkey) AS BIGINT) AS n_null, "
            "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_distinct, "
            "CAST(min(l_suppkey) AS VARCHAR) AS min_str, "
            "CAST(max(l_suppkey) AS VARCHAR) AS max_str, "
            "CAST(1 AS BIGINT) AS est_ok FROM lineitem"
            " UNION ALL "
            "SELECT 'l_returnflag' AS col, CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(*) - count(l_returnflag) AS BIGINT) AS n_null, "
            "CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_distinct, "
            "CAST(min(l_returnflag) AS VARCHAR) AS min_str, "
            "CAST(max(l_returnflag) AS VARCHAR) AS max_str, "
            "CAST(1 AS BIGINT) AS est_ok FROM lineitem"
            " UNION ALL "
            "SELECT 'l_linestatus' AS col, CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(*) - count(l_linestatus) AS BIGINT) AS n_null, "
            "CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_distinct, "
            "CAST(min(l_linestatus) AS VARCHAR) AS min_str, "
            "CAST(max(l_linestatus) AS VARCHAR) AS max_str, "
            "CAST(1 AS BIGINT) AS est_ok FROM lineitem" +
            ") ORDER BY col",
        # exact top-20 words mirror; the CMS estimates stay internal and
        # are certified by the constant over_ok/bound_ok columns
        "word_freq_cms":
            "SELECT word, cnt, CAST(1 AS BIGINT) AS over_ok, "
            "CAST(1 AS BIGINT) AS bound_ok FROM ("
            "SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM ("
            "SELECT unnest(string_split(text, ' ')) AS word "
            "FROM documents) WHERE word <> '' GROUP BY word) "
            "ORDER BY cnt DESC, word LIMIT 20",
        # byte-CDC certificates: scalar-reference parity, reassembly,
        # FastCDC size bounds; n_blobs is the corpus constant
        "cdc_bytes_images":
            "SELECT CAST(256 AS BIGINT) AS n_blobs, "
            "CAST(1 AS BIGINT) AS reassembly_ok, "
            "CAST(1 AS BIGINT) AS bounds_ok, "
            "CAST(1 AS BIGINT) AS vec_scalar_ok, "
            "CAST(1 AS BIGINT) AS dedup_consistent",
        # CDC chunks via the window-sum boundary reconstruction; integer
        # counts, (n_occ desc, chunk) top-k tiebreak on both engines
        "cdc_chunk_stats":
            "WITH w AS (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS word, "
            "unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos "
            "FROM documents), "
            "b AS (SELECT doc_id, word, pos, CASE WHEN "
            "regexp_matches(word, '[aeiou]$') THEN 1 ELSE 0 END AS isb "
            "FROM w), "
            "c AS (SELECT doc_id, word, pos, coalesce(sum(isb) OVER ("
            "PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING), 0) AS chunk_no FROM b), "
            "chunks AS (SELECT doc_id, chunk_no, "
            "string_agg(word, ' ' ORDER BY pos) AS chunk FROM c "
            "GROUP BY doc_id, chunk_no), "
            "stats AS (SELECT chunk, CAST(count(*) AS BIGINT) AS n_occ, "
            "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs "
            "FROM chunks GROUP BY chunk), "
            "summ AS (SELECT CAST(sum(n_occ) AS BIGINT) AS total_chunks, "
            "CAST(count(*) AS BIGINT) AS distinct_chunks FROM stats) "
            "SELECT s.chunk, s.n_occ, s.n_docs, m.total_chunks, "
            "m.distinct_chunks FROM stats s, summ m "
            "ORDER BY s.n_occ DESC, s.chunk LIMIT 10",
        # pure string/integer ops: 10-word line windows via list slices,
        # dup = line in >=2 distinct docs, docs rebuilt by string_agg
        "line_dedup_docs":
            "WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w "
            "FROM documents), "
            "lines AS (SELECT doc_id, ln AS line_no, "
            "array_to_string(w[ln*10+1 : least((ln+1)*10, len(w))], ' ') "
            "AS line "
            "FROM ws, LATERAL (SELECT unnest(range((len(w)+9)//10)) AS ln"
            ") t), "
            "dup AS (SELECT line FROM lines GROUP BY line "
            "HAVING count(DISTINCT doc_id) >= 2) "
            "SELECT l.doc_id, CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(count(*) FILTER (WHERE d.line IS NOT NULL) AS BIGINT) "
            "AS n_dropped, "
            "coalesce(string_agg(l.line, ' ' ORDER BY l.line_no) "
            "FILTER (WHERE d.line IS NULL), '') AS text_dedup "
            "FROM lines l LEFT JOIN dup d USING (line) "
            "GROUP BY l.doc_id ORDER BY l.doc_id",
        # identical float expression tree over int64 sufficient stats
        # < 2^53 on both sides (value_variance_by_type convention)
        "events_outliers":
            "WITH s AS (SELECT event_type, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) "
            "AS sum_c, "
            "CAST(sum(CAST(round(value*100) AS BIGINT) * "
            "CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sumsq_c "
            "FROM events GROUP BY event_type) "
            "SELECT e.event_type, min(s.n) AS n, "
            "CAST(coalesce(sum(CASE WHEN "
            "CAST(s.n * CAST(round(e.value*100) AS BIGINT) - s.sum_c "
            "AS DOUBLE) * "
            "CAST(s.n * CAST(round(e.value*100) AS BIGINT) - s.sum_c "
            "AS DOUBLE) > "
            "9.0 * (CAST(s.n AS DOUBLE) * CAST(s.sumsq_c AS DOUBLE) - "
            "CAST(s.sum_c AS DOUBLE) * CAST(s.sum_c AS DOUBLE)) "
            "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_outliers "
            "FROM events e JOIN s ON e.event_type = s.event_type "
            "GROUP BY e.event_type ORDER BY e.event_type",
        # the oracle constructs the same version-B snapshot and
        # classifies via FULL OUTER JOIN
        "table_diff_docs":
            "WITH b AS ("
            "SELECT doc_id, CASE WHEN doc_id % 89 = 0 THEN text || ' MOD' "
            "ELSE text END AS text FROM documents WHERE doc_id % 97 <> 0"
            " UNION ALL "
            "SELECT doc_id + 10000000 AS doc_id, 'new row' AS text "
            "FROM documents WHERE doc_id % 101 = 0) "
            "SELECT status, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(k) AS BIGINT) AS key_sum FROM ("
            "SELECT coalesce(a.doc_id, b.doc_id) AS k, "
            "CASE WHEN a.doc_id IS NULL THEN 'added' "
            "WHEN b.doc_id IS NULL THEN 'removed' "
            "WHEN a.text = b.text THEN 'unchanged' "
            "ELSE 'changed' END AS status "
            "FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id) "
            "GROUP BY status ORDER BY status",
        # every validation rule is a SQL count pair
        "validate_lineitem":
            "SELECT rule, col, n_checked, n_violations, "
            "CAST(n_violations = 0 AS BIGINT) AS ok FROM ("
            "SELECT 'fk' AS rule, 'l_orderkey->orders.o_orderkey' AS col, "
            "CAST(count(l_orderkey) AS BIGINT) AS n_checked, "
            "CAST((SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN "
            "(SELECT o_orderkey FROM orders)) AS BIGINT) AS n_violations "
            "FROM lineitem"
            " UNION ALL "
            "SELECT 'in_set', 'l_returnflag', "
            "CAST(count(l_returnflag) AS BIGINT), "
            "CAST(coalesce(sum(CASE WHEN l_returnflag NOT IN ('A','N') "
            "THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem"
            " UNION ALL "
            "SELECT 'not_null', 'l_orderkey', CAST(count(*) AS BIGINT), "
            "CAST(count(*) - count(l_orderkey) AS BIGINT) FROM lineitem"
            " UNION ALL "
            "SELECT 'range', 'l_discount', "
            "CAST(count(l_discount) AS BIGINT), "
            "CAST(coalesce(sum(CASE WHEN l_discount < CAST(0.0 AS DOUBLE) "
            "OR l_discount > CAST(0.08 AS DOUBLE) THEN 1 ELSE 0 END), 0) "
            "AS BIGINT) FROM lineitem"
            " UNION ALL "
            "SELECT 'range', 'l_quantity', "
            "CAST(count(l_quantity) AS BIGINT), "
            "CAST(coalesce(sum(CASE WHEN l_quantity < CAST(1.0 AS DOUBLE) "
            "OR l_quantity > CAST(45.0 AS DOUBLE) THEN 1 ELSE 0 END), 0) "
            "AS BIGINT) FROM lineitem"
            " UNION ALL "
            "SELECT 'regex', 'l_linestatus', "
            "CAST(count(l_linestatus) AS BIGINT), "
            "CAST(coalesce(sum(CASE WHEN NOT "
            "regexp_full_match(l_linestatus, '[OF]') THEN 1 ELSE 0 END), "
            "0) AS BIGINT) FROM lineitem"
            " UNION ALL "
            "SELECT 'unique', 'l_orderkey,l_linenumber', "
            "CAST(count(*) AS BIGINT), CAST(count(*) - count(DISTINCT "
            "(l_orderkey, l_linenumber)) AS BIGINT) FROM lineitem"
            ") ORDER BY rule, col",
        # image quality curation: the 2000-image corpus is a pure function
        # of seed 42 and the codecs are deterministic, so per-(fmt,verdict)
        # counts AND exact int64 pixel-sum totals are corpus constants
        "image_quality_filter":
            "SELECT * FROM (VALUES "
            "('ljpg','bright',CAST(19 AS BIGINT),CAST(8104537 AS BIGINT),"
            "CAST(1457195869 AS BIGINT)),"
            "('ljpg','dark',CAST(20 AS BIGINT),CAST(7218852 AS BIGINT),"
            "CAST(1180589984 AS BIGINT)),"
            "('ljpg','flat',CAST(9 AS BIGINT),CAST(3594427 AS BIGINT),"
            "CAST(599013917 AS BIGINT)),"
            "('ljpg','ok',CAST(64 AS BIGINT),CAST(25050729 AS BIGINT),"
            "CAST(4280337025 AS BIGINT)),"
            "('png','bright',CAST(209 AS BIGINT),CAST(89709416 AS BIGINT),"
            "CAST(15985440768 AS BIGINT)),"
            "('png','dark',CAST(262 AS BIGINT),CAST(93356060 AS BIGINT),"
            "CAST(15151970600 AS BIGINT)),"
            "('png','flat',CAST(182 AS BIGINT),CAST(71546217 AS BIGINT),"
            "CAST(11760363477 AS BIGINT)),"
            "('png','ok',CAST(1235 AS BIGINT),CAST(484845367 AS BIGINT),"
            "CAST(82997662791 AS BIGINT))"
            ") AS t(fmt, verdict, n, sum_px, sum_sq) "
            "ORDER BY fmt, verdict",
        # tiered image cascade: deterministic tier counts + north-rule
        # + partition-equality-vs-untiered certificates Ray-side
        "tiered_dedup_images":
            "SELECT CAST(2000 AS BIGINT) AS n_images, "
            "CAST(0 AS BIGINT) AS n_t1, CAST(70 AS BIGINT) AS n_t2, "
            "CAST(64 AS BIGINT) AS n_t3, "
            "CAST(1 AS BIGINT) AS monotone_ok, "
            "CAST(1 AS BIGINT) AS recall_ok, "
            "CAST(1 AS BIGINT) AS precision_ok, "
            "CAST(1 AS BIGINT) AS partition_equal_ok",
        # lossless WET round trip: title + byte count reconstruct in
        # SQL; exact-string certificate computed Ray-side
        "html_extract":
            "SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) "
            "AS title, CAST(strlen(text) AS BIGINT) AS n_bytes, "
            "CAST(1 AS BIGINT) AS extracted_ok "
            "FROM documents ORDER BY doc_id",
        # the oracle CONSTRUCTS the canonical URL straight from doc_id
        # arithmetic; the engine PARSES the messy synthesis of the same
        # arithmetic — exact string equality certifies the normalizer
        "url_normalize":
            "SELECT doc_id, " + "CASE WHEN doc_id%2=1 THEN 'https' ELSE 'http' END || '://' || "
            "CASE WHEN doc_id%3=0 THEN 'www.' ELSE '' END || 'h' || "
            "CAST(doc_id%23 AS VARCHAR) || '.example.com' || "
            "CASE WHEN doc_id%4=1 THEN ':8080' ELSE '' END || "
            "'/a/c' || CAST(doc_id%11 AS VARCHAR) || '?a=' || "
            "CAST(doc_id%3 AS VARCHAR) || '&z=' || "
            "CAST(doc_id%5 AS VARCHAR)" + " AS url_norm, "
            + "CASE WHEN doc_id%3=0 THEN 'www.' ELSE '' END || 'h' || "
            "CAST(doc_id%23 AS VARCHAR) || '.example.com'" + " AS host "
            "FROM documents ORDER BY doc_id",
        "domain_cap_docs":
            "SELECT doc_id, host FROM (SELECT doc_id, " + "CASE WHEN doc_id%3=0 THEN 'www.' ELSE '' END || 'h' || "
            "CAST(doc_id%23 AS VARCHAR) || '.example.com'"
            + " AS host FROM documents) "
            "QUALIFY row_number() OVER (PARTITION BY host "
            "ORDER BY doc_id) <= 3 ORDER BY doc_id",
        # bigram LM: identical count + rank + (c_ab+1)/(c_a+V) e9-scale
        # expression tree on both sides; per-doc sums are integer-exact
        "bigram_lm_scores":
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk "
            "FROM documents), "
            "words AS (SELECT doc_id, unnest(tk) AS w, "
            "unnest(range(1, len(tk) + 1)) AS pos FROM toks), "
            "uni AS (SELECT w, count(*) AS c FROM words GROUP BY w), "
            "v AS (SELECT count(*) AS nv FROM uni), "
            "bgr AS (SELECT a.doc_id, a.w AS wa, b.w AS wb FROM words a "
            "JOIN words b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1), "
            "bgc AS (SELECT wa, wb, count(*) AS c FROM bgr "
            "GROUP BY wa, wb), "
            "topk AS (SELECT wa, wb, c FROM bgc "
            "QUALIFY row_number() OVER (ORDER BY c DESC, "
            "wa || chr(31) || wb ASC) <= 512), "
            "p AS (SELECT t.wa, t.wb, CAST(floor((t.c + 1) / "
            "(u.c + (SELECT nv FROM v)) * 1000000000 + 0.5) AS BIGINT) "
            "AS pe9 FROM topk t JOIN uni u ON u.w = t.wa), "
            "scored AS (SELECT g.doc_id, count(*) AS nb, "
            "sum(CASE WHEN p.pe9 IS NULL THEN 1 ELSE 0 END) AS oov, "
            "coalesce(sum(p.pe9), 0) AS spe9 FROM bgr g LEFT JOIN p "
            "ON p.wa = g.wa AND p.wb = g.wb GROUP BY g.doc_id) "
            "SELECT d.doc_id, CAST(coalesce(s.nb, 0) AS BIGINT) "
            "AS n_bigrams, CAST(coalesce(s.oov, 0) AS BIGINT) AS n_oov, "
            "CAST(coalesce(s.spe9, 0) AS BIGINT) AS sum_p_e9 "
            "FROM documents d LEFT JOIN scored s USING (doc_id) "
            "ORDER BY d.doc_id",
        # exact phrase match: positional self-join over the single-space
        # split — the same positions the inverted index stores
        "phrase_search":
            "WITH words AS (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS w, "
            "unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos "
            "FROM documents), "
            "ph AS (SELECT * FROM (VALUES ('hash join'), ('merge sort'), "
            "('table scan')) p(phrase)) "
            "SELECT p.phrase, a.doc_id FROM ph p "
            "JOIN words a ON a.w = string_split(p.phrase, ' ')[1] "
            "JOIN words b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 "
            "AND b.w = string_split(p.phrase, ' ')[2] "
            "GROUP BY p.phrase, a.doc_id ORDER BY p.phrase, a.doc_id",
        "distinct_parts":
            "SELECT count(DISTINCT l_partkey) AS n_distinct FROM lineitem",
        # invariant rows: exact count oracled bit-for-bit; the Ray side
        # flips est_err_ok to 0 if the deterministic GHLL estimate drifts
        # past 6% of it (a broken estimator/hash turns the row red)
        "approx_distinct_parts":
            "SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) "
            "AS exact_n_distinct, CAST(1 AS BIGINT) AS est_err_ok "
            "FROM lineitem",
        "approx_distinct_methods":
            "SELECT m.method, e.exact_n_distinct, "
            "CAST(1 AS BIGINT) AS est_err_ok FROM "
            "(VALUES ('ghll'), ('hll'), ('hyperminhash'), ('minhash'), "
            "('setsketch1'), ('setsketch2')) m(method) CROSS JOIN "
            "(SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) "
            "AS exact_n_distinct FROM lineitem) e ORDER BY m.method",
        "approx_users_by_type":
            "SELECT event_type, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS exact_n_users, "
            "CAST(1 AS BIGINT) AS est_err_ok "
            "FROM events GROUP BY event_type ORDER BY event_type",
        # invariant rows: exact pair count in f64 (the list<float> cast
        # caveat from cosine_pairs applies); precision/recall certificates
        # computed Ray-side against the same truth set
        "embedding_near_dup":
            "SELECT CAST(count(*) AS BIGINT) AS n_true_pairs, "
            "CAST(1 AS BIGINT) AS precision_ok, "
            "CAST(1 AS BIGINT) AS recall_floor_ok "
            "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id "
            "AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.35",
        "approx_key_overlap":
            "WITH a AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) "
            "AS n FROM orders), "
            "b AS (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) AS n "
            "FROM customer), "
            "i AS (SELECT CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) "
            "SELECT a.n AS exact_card_left, b.n AS exact_card_right, "
            "i.n AS exact_intersection, a.n + b.n - i.n AS exact_union, "
            "CAST(1 AS BIGINT) AS est_ok FROM a, b, i",
        # theta/KMV set algebra: exact distinct counts mirrored; the six
        # sketch estimates certify via the constant est_ok column
        "theta_setops_orders":
            "WITH a AS (SELECT DISTINCT l_orderkey AS k FROM lineitem "
            "WHERE l_returnflag = 'R'), "
            "b AS (SELECT DISTINCT l_orderkey AS k FROM lineitem "
            "WHERE l_returnflag = 'A'), "
            "na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM a), "
            "nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b), "
            "ni AS (SELECT CAST(count(*) AS BIGINT) AS n "
            "FROM a JOIN b USING (k)) "
            "SELECT na.n AS exact_card_left, nb.n AS exact_card_right, "
            "na.n + nb.n - ni.n AS exact_union, "
            "ni.n AS exact_intersection, "
            "na.n - ni.n AS exact_diff_left, "
            "nb.n - ni.n AS exact_diff_right, "
            "CAST(1 AS BIGINT) AS est_ok FROM na, nb, ni",
        # LAG-window debounce filter, identical tiebreak both engines
        "events_debounce":
            "SELECT event_id, user_id, event_type, ts FROM ("
            "SELECT event_id, user_id, event_type, ts, "
            "lag(ts) OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) AS pts FROM events) "
            "WHERE pts IS NULL OR "
            "epoch_us(ts) - epoch_us(pts) > CAST(3600 AS BIGINT)*1000000 "
            "ORDER BY event_id",
        # exact integer-cents median + MAD per group (quantile_disc rule)
        "events_mad_by_type":
            "WITH c AS (SELECT event_type, "
            "CAST(round(value*100) AS BIGINT) AS v_c FROM events), "
            "m AS (SELECT event_type, "
            "CAST(quantile_disc(v_c, 0.5) AS BIGINT) AS median_c "
            "FROM c GROUP BY event_type), "
            "d AS (SELECT c.event_type, abs(c.v_c - m.median_c) AS dev "
            "FROM c JOIN m USING (event_type)) "
            "SELECT m.event_type, m.median_c, "
            "CAST(quantile_disc(d.dev, 0.5) AS BIGINT) AS mad_c "
            "FROM d JOIN m USING (event_type) "
            "GROUP BY m.event_type, m.median_c ORDER BY m.event_type",
        # distinct-doc co-occurrence counts over the exact top-64 vocab;
        # deterministic (cnt desc, word) orderings on both engines
        "word_cooccurrence":
            "WITH v AS (SELECT word FROM (SELECT word, count(*) AS cnt "
            "FROM (SELECT unnest(string_split(text, ' ')) AS word "
            "FROM documents) WHERE word <> '' GROUP BY word) "
            "ORDER BY cnt DESC, word LIMIT 64), "
            "dw AS (SELECT DISTINCT doc_id, word FROM ("
            "SELECT doc_id, unnest(string_split(text, ' ')) AS word "
            "FROM documents) WHERE word IN (SELECT word FROM v)) "
            "SELECT a.word AS word_a, b.word AS word_b, "
            "CAST(count(*) AS BIGINT) AS n_docs "
            "FROM dw a JOIN dw b ON a.doc_id = b.doc_id "
            "AND a.word < b.word "
            "GROUP BY a.word, b.word "
            "ORDER BY n_docs DESC, word_a, word_b LIMIT 20",
        # integer-fixed Gram matrix: identical floor(x*1e6+0.5) fixing on
        # both engines, then pure BIGINT products/sums (< 2^63)
        "embedding_gram":
            "WITH e AS (SELECT vec_id, unnest(embedding) AS v, "
            "unnest(range(len(embedding))) AS i FROM embeddings), "
            "c AS (SELECT vec_id, CAST(i AS BIGINT) AS i, "
            "CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) "
            "AS cv FROM e), "
            "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings) "
            "SELECT a.i AS i, b.i AS j, "
            "CAST(sum(a.cv * b.cv) AS BIGINT) AS sumprod_c, "
            "CASE WHEN a.i = b.i THEN CAST(sum(a.cv) AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END AS sum_i_c, "
            "CASE WHEN a.i = 0 AND b.i = 0 THEN (SELECT n FROM nn) "
            "ELSE CAST(0 AS BIGINT) END AS n "
            "FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.i <= b.i "
            "GROUP BY a.i, b.i ORDER BY i, j",
        # exact d<=1 self-join over the distinct name vocabulary
        "fuzzy_name_pairs":
            "WITH v AS (SELECT DISTINCT s_name FROM supplier) "
            "SELECT a.s_name AS value_a, b.s_name AS value_b "
            "FROM v a JOIN v b ON a.s_name < b.s_name "
            "AND levenshtein(a.s_name, b.s_name) <= 1 "
            "ORDER BY value_a, value_b",
        # rank CERTIFICATES: n exact on both sides; rank_ok computed
        # Ray-side from a distributed value_ranks pass over the KLL answers
        "value_quantiles_kll":
            "SELECT CAST(v.phi_scaled AS BIGINT) AS phi_scaled, e.n, "
            "CAST(1 AS BIGINT) AS rank_ok FROM "
            "(VALUES (100), (1000), (2500), (5000), (7500), (9000), "
            "(9900)) v(phi_scaled) CROSS JOIN "
            "(SELECT CAST(count(*) AS BIGINT) AS n FROM events "
            "WHERE value = value) e ORDER BY phi_scaled",
        "value_quantiles_kll_by_type":
            "SELECT g.event_type, CAST(v.phi_scaled AS BIGINT) "
            "AS phi_scaled, g.n, CAST(1 AS BIGINT) AS rank_ok FROM "
            "(SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events "
            "WHERE value = value GROUP BY event_type) g CROSS JOIN "
            "(VALUES (1000), (5000), (9000)) v(phi_scaled) "
            "ORDER BY g.event_type, phi_scaled",
        # constant-SQL invariant: 1000-image corpus, zero cluster-straddle
        # violations (the Ray side computes the violation count genuinely
        # from the LSH clusters + split assignment)
        "leakage_safe_split":
            "SELECT CAST(1000 AS BIGINT) AS n_images, "
            "CAST(0 AS BIGINT) AS n_cluster_violations",
        "doc_stats_by_lang":
            "SELECT lang, count(*) AS n_docs, avg(n_chars) AS avg_chars, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY lang",
        # money sums on an integer-scaled domain, exactly as the engine does:
        # parallel partial float sums associate differently than DuckDB's
        # sequential sum, flipping the value hash (round-1 failure)
        "lineitem_agg":
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)"
            " / 100.0 AS sum_qty, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
            " / 100.0 AS sum_base_price, "
            "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) "
            "AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price, "
            "CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT)"
            " / 10000.0 / count(*) AS avg_disc, "
            "count(*) AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus",
        "top_users":
            "SELECT user_id, count(*) AS n_events, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            " / 100.0 AS total_value "
            "FROM events GROUP BY user_id "
            "ORDER BY n_events DESC, user_id LIMIT 10",
        "token_counts":
            "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens "
            "FROM documents",
        # GPT-style packing: exclusive running token sum over doc_id order
        "pack_sequences":
            "WITH t AS (SELECT doc_id, len(string_split(text, ' ')) "
            "AS n_tokens FROM documents), "
            "c AS (SELECT doc_id, n_tokens, CAST(coalesce(SUM(n_tokens) "
            "OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS BIGINT) AS start_tok FROM t) "
            "SELECT doc_id, n_tokens, start_tok, "
            "CAST(start_tok // 2048 AS BIGINT) AS chunk_id "
            "FROM c ORDER BY doc_id",
        "knn_batch":
            "WITH q AS (SELECT vec_id AS query_id, "
            "CAST(embedding AS DOUBLE[]) AS qv FROM embeddings "
            "WHERE vec_id IN (0, 7, 23, 41)), "
            "s AS (SELECT q.query_id, e.vec_id, "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) "
            "AS c FROM embeddings e, q WHERE e.vec_id <> q.query_id) "
            "SELECT query_id, vec_id, CAST(row_number() OVER "
            "(PARTITION BY query_id ORDER BY c DESC, vec_id) AS BIGINT) "
            "AS rank FROM s QUALIFY rank <= 10 ORDER BY query_id, rank",
        "knn_bruteforce":
            "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
            "SELECT e.vec_id, rank() OVER (ORDER BY "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.qv AS DOUBLE[])) DESC, e.vec_id) AS rank "
            "FROM embeddings e, q WHERE e.vec_id <> 0 "
            "ORDER BY rank LIMIT 10",
        "cosine_pairs":
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b "
            "FROM embeddings a, embeddings b "
            "WHERE a.vec_id < b.vec_id "
            "AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.3",
        # ANN / semantic invariant rows (r4): the Ray side computes a
        # machinery-parity / self-consistency check in-query; the oracle is
        # the constant truth those invariants must reach (see docstrings)
        "knn_ivf":
            "SELECT q.query_id, r.rank, CAST(1 AS BIGINT) AS ok "
            "FROM (SELECT unnest(generate_series(0, 9)) AS query_id) q, "
            "(SELECT unnest(generate_series(1, 10)) AS rank) r "
            "ORDER BY query_id, rank",
        "knn_ivfpq":
            "SELECT CAST(10 AS BIGINT) AS k, CAST(8 AS BIGINT) AS n_probe, "
            "CAST(10 AS BIGINT) AS n_queries, "
            "CAST(850 AS BIGINT) AS milli_overlap_capped",
        "semantic_dedup":
            "SELECT vec_id, CAST(1 AS BIGINT) AS ok FROM embeddings "
            "ORDER BY vec_id",
        "char_jaccard_pairs":
            "SELECT doc_id AS id_a, "
            "lead(doc_id) OVER (ORDER BY doc_id) AS id_b, "
            "jaccard(text, lead(text) OVER (ORDER BY doc_id)) AS jaccard "
            "FROM documents QUALIFY id_b IS NOT NULL",
        "events_hourly":
            "SELECT user_id, date_trunc('hour', ts) AS hour, "
            "count(*) AS n_events, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            " / 100.0 AS total_value "
            "FROM events GROUP BY user_id, date_trunc('hour', ts)",
        "orders_by_segment":
            "SELECT c_mktsegment, count(*) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            " / 100.0 AS total_price "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment",
        "lineitem_orders_join":
            "SELECT o_orderpriority, count(*) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_quantity > 45 GROUP BY o_orderpriority",
        # pinned tie-break (o_orderdate DESC, o_orderkey DESC) instead of a
        # naked ASOF JOIN: DuckDB ASOF is nondeterministic when a customer
        # has two orders on the same date (32 such groups at sf0.01)
        "asof_last_order":
            "SELECT e.event_id, e.ts, e.user_id, o.o_orderkey, "
            "o.o_orderdate, o.o_totalprice "
            "FROM events e JOIN orders o ON e.user_id = o.o_custkey "
            "AND o.o_orderdate <= e.ts "
            "QUALIFY row_number() OVER (PARTITION BY e.event_id "
            "ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1",
        # half-open window [ts-24h, ts): the strict upper bound excludes the
        # row itself; cent-sums integer-scaled on both sides as always
        "events_prev_24h":
            "SELECT a.event_id, a.ts, a.user_id, "
            "count(b.ts) AS n_prev, "
            "CAST(coalesce(sum(CAST(round(b.value * 100) AS BIGINT)), 0) "
            "AS BIGINT) AS prev_value_cents "
            "FROM events a LEFT JOIN events b ON a.user_id = b.user_id "
            "AND b.ts >= a.ts - INTERVAL 24 HOUR AND b.ts < a.ts "
            "GROUP BY a.event_id, a.ts, a.user_id",
        # every event belongs to exactly window/hop = 4 hopping windows:
        # s_i = floor(t/hop)*hop - i*hop, i in 0..3
        "events_hopping":
            "SELECT user_id, make_timestamp(epoch_us(ts) // 900000000 "
            "* 900000000 - i * 900000000) AS window_start, "
            "count(*) AS n_events, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS total_value_c "
            "FROM events CROSS JOIN "
            "(SELECT unnest(generate_series(0, 3)) AS i) g "
            "GROUP BY user_id, window_start",
        "events_hopping_distinct":
            "SELECT make_timestamp(epoch_us(ts) // 900000000 * 900000000 "
            "- i * 900000000) AS window_start, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events CROSS JOIN "
            "(SELECT unnest(generate_series(0, 3)) AS i) g "
            "GROUP BY window_start",
        "parts_never_ordered":
            "SELECT p_partkey, p_name FROM part WHERE p_partkey NOT IN "
            "(SELECT l_partkey FROM lineitem WHERE l_quantity > 48)",
        "parts_hot_ordered":
            "SELECT p_partkey, p_name FROM part WHERE p_partkey IN "
            "(SELECT l_partkey FROM lineitem WHERE l_quantity > 48)",
        # running total over cents; event_id pins order at equal ts
        "events_running_total":
            "SELECT event_id, user_id, ts, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_c "
            "FROM events",
        "user_event_paths":
            "SELECT user_id, string_agg(event_type, ',' "
            "ORDER BY ts, event_id) AS agg FROM events GROUP BY user_id",
        "props_k_stats":
            "SELECT event_type, "
            "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) "
            "AS BIGINT) AS sum_k, "
            "max(CAST(json_extract_string(props, '$.k') AS BIGINT)) "
            "AS max_k, CAST(count(*) AS BIGINT) AS n "
            "FROM events GROUP BY event_type",
        "repeat_actions":
            "SELECT user_id, event_type FROM events "
            "WHERE ts < TIMESTAMP '2024-01-16' INTERSECT "
            "SELECT user_id, event_type FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-16'",
        "dropped_actions":
            "SELECT user_id, event_type FROM events "
            "WHERE ts < TIMESTAMP '2024-01-28' EXCEPT "
            "SELECT user_id, event_type FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-28'",
        "events_rolling_10":
            "SELECT event_id, user_id, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS rolling_c FROM events",
        "events_lag_lead":
            "SELECT event_id, user_id, "
            "lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS prev_value, "
            "lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS next_value FROM events",
        "events_pivot":
            "SELECT user_id, "
            "count(*) FILTER (WHERE event_type = 'click') AS n_click, "
            "count(*) FILTER (WHERE event_type = 'view') AS n_view, "
            "count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase, "
            "count(*) FILTER (WHERE event_type = 'signup') AS n_signup, "
            "count(*) FILTER (WHERE event_type = 'error') AS n_error "
            "FROM events GROUP BY user_id",
        # revenue on the 1e-4-scaled integer domain, identical per-row IEEE
        # formula both sides; l_orderkey pins ties in the top-10
        "shipping_priority":
            "SELECT l_orderkey, o_orderdate, revenue_c FROM ("
            "SELECT l_orderkey, o_orderdate, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 "
            "+ 0.5) AS BIGINT)) AS BIGINT) AS revenue_c "
            "FROM customer, orders, lineitem "
            "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey "
            "AND l_orderkey = o_orderkey "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "AND l_shipdate > TIMESTAMP '1998-01-01' "
            "GROUP BY l_orderkey, o_orderdate) "
            "ORDER BY revenue_c DESC, l_orderkey LIMIT 10",
        "events_rank":
            "SELECT event_id, user_id, "
            "row_number() OVER w AS row_number, "
            "percent_rank() OVER w AS percent_rank FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)",
        "lineitem_unpivot":
            "SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, "
            "l_quantity AS value FROM lineitem UNION ALL "
            "SELECT l_orderkey, l_linenumber, 'l_extendedprice', "
            "l_extendedprice FROM lineitem UNION ALL "
            "SELECT l_orderkey, l_linenumber, 'l_discount', l_discount "
            "FROM lineitem UNION ALL "
            "SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem",
        "heavy_users":
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events "
            "GROUP BY user_id ORDER BY n DESC, user_id LIMIT 20",
        "parts_never_ordered_bloom":
            "SELECT p_partkey, p_name FROM part WHERE p_partkey NOT IN "
            "(SELECT l_partkey FROM lineitem WHERE l_quantity > 48)",
        "lineitem_left_join":
            "SELECT l_orderkey, l_linenumber, o_orderpriority "
            "FROM lineitem LEFT JOIN "
            "(SELECT o_orderkey, o_orderpriority FROM orders "
            "WHERE o_totalprice > 250000) o ON l_orderkey = o_orderkey",
        "orders_customers_full":
            "SELECT o_orderkey, o_custkey, c_custkey FROM "
            "(SELECT o_orderkey, o_custkey FROM orders "
            "WHERE o_totalprice > 250000) o FULL JOIN "
            "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000) c "
            "ON o_custkey = c_custkey",
        "events_ntile":
            "SELECT event_id, CAST(ntile(4) OVER (PARTITION BY event_type "
            "ORDER BY value, event_id) AS BIGINT) AS tile FROM events",
        "events_dense_rank":
            "SELECT event_id, "
            "CAST(dense_rank() OVER (PARTITION BY user_id "
            "ORDER BY CAST(round(value*100) AS BIGINT)) AS BIGINT) "
            "AS dense_rank, "
            "first_value(CAST(round(value*100) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS first_value_c "
            "FROM events",
        "mode_action_per_user":
            "SELECT user_id, mode_value, cnt FROM ("
            "SELECT user_id, event_type AS mode_value, "
            "CAST(count(*) AS BIGINT) AS cnt, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY count(*) DESC, event_type) AS rn "
            "FROM events GROUP BY user_id, event_type) WHERE rn = 1",
        "top_words":
            "SELECT word, cnt FROM ("
            "SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM ("
            "SELECT unnest(string_split(text, ' ')) AS word "
            "FROM documents) WHERE word <> '' GROUP BY word) "
            "ORDER BY cnt DESC, word LIMIT 100",
        "small_quantity_revenue":
            "WITH g AS (SELECT l_partkey AS pk, "
            "CAST(count(*) AS BIGINT) AS cnt, "
            "CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) "
            "AS sum_qty_c FROM lineitem GROUP BY l_partkey) "
            "SELECT l_returnflag, "
            "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) "
            "AS BIGINT) AS revenue_c, CAST(count(*) AS BIGINT) AS n "
            "FROM lineitem JOIN g ON l_partkey = pk "
            "WHERE CAST(round(l_quantity*100) AS BIGINT) * 5 * cnt "
            "< sum_qty_c GROUP BY l_returnflag",
        "value_variance_by_type":
            "WITH s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) "
            "AS sum_c, "
            "CAST(sum(CAST(round(value*100) AS BIGINT) * "
            "CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sumsq_c "
            "FROM events GROUP BY event_type), "
            "m AS (SELECT event_type, n, "
            "CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c, "
            "CAST(sumsq_c AS DOUBLE) / CAST(n AS DOUBLE) AS msq_c FROM s) "
            "SELECT event_type, n, mean_c, "
            "msq_c - mean_c * mean_c AS var_c2, "
            "sqrt(msq_c - mean_c * mean_c) AS std_c FROM m",
        "docs_regex_by_lang":
            "SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents "
            "WHERE regexp_matches(text, '(fast|slow) (join|merge)') GROUP BY lang",
        "value_quantiles_cont":
            " UNION ALL ".join(
                f"SELECT CAST({q} AS DOUBLE) AS q, "
                f"quantile_cont(value, {q}) AS value FROM events"
                for q in (0.1, 0.25, 0.5, 0.75, 0.9)),
        "weekly_retention":
            "WITH uw AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 604800000000 AS bucket FROM events) "
            "SELECT a.bucket, CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_retained "
            "FROM uw a LEFT JOIN uw b ON a.user_id = b.user_id "
            "AND b.bucket = a.bucket + 1 GROUP BY a.bucket",
        "funnel_view_click_purchase":
            "WITH v AS (SELECT user_id, min(ts) AS t0 FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "c AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e "
            "JOIN v ON e.user_id = v.user_id "
            "WHERE e.event_type = 'click' AND e.ts > v.t0 "
            "GROUP BY e.user_id), "
            "p AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
            "JOIN c ON e.user_id = c.user_id "
            "WHERE e.event_type = 'purchase' AND e.ts > c.t1 "
            "GROUP BY e.user_id) "
            "SELECT v.user_id, v.t0 AS ts_0_view, c.t1 AS ts_1_click, "
            "p.t2 AS ts_2_purchase FROM v "
            "JOIN c ON v.user_id = c.user_id "
            "JOIN p ON c.user_id = p.user_id",
        "value_hour_corr_by_type":
            "WITH s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sx, "
            "CAST(sum(CAST(extract(hour FROM ts) AS BIGINT)) AS BIGINT) "
            "AS sy, "
            "CAST(sum(CAST(round(value*100) AS BIGINT) * "
            "CAST(extract(hour FROM ts) AS BIGINT)) AS BIGINT) AS sxy, "
            "CAST(sum(CAST(round(value*100) AS BIGINT) * "
            "CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sxx, "
            "CAST(sum(CAST(extract(hour FROM ts) AS BIGINT) * "
            "CAST(extract(hour FROM ts) AS BIGINT)) AS BIGINT) AS syy "
            "FROM events GROUP BY event_type), "
            "m AS (SELECT event_type, n, "
            "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx, "
            "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my, "
            "CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) AS mxy, "
            "CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) AS mxx, "
            "CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) AS myy FROM s) "
            "SELECT event_type, n, (mxy - mx * my) / "
            "sqrt((mxx - mx * mx) * (myy - my * my)) AS corr_value_hour "
            "FROM m",
        "value_histogram":
            "SELECT event_type, "
            "CAST(round(value*100) AS BIGINT) // 1000 AS bucket, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM events GROUP BY event_type, bucket",
        "distinctive_terms":
            "WITH dw AS (SELECT doc_id, word, "
            "CAST(count(*) AS BIGINT) AS tf FROM ("
            "SELECT doc_id, unnest(string_split(text, ' ')) AS word "
            "FROM documents) WHERE word <> '' GROUP BY doc_id, word), "
            "dfs AS (SELECT word, CAST(count(*) AS BIGINT) AS df "
            "FROM dw GROUP BY word) "
            "SELECT doc_id, word, tf, df FROM ("
            "SELECT dw.doc_id, dw.word, dw.tf, dfs.df, "
            "row_number() OVER (PARTITION BY dw.doc_id "
            "ORDER BY dw.tf DESC, dfs.df ASC, dw.word) AS rn "
            "FROM dw JOIN dfs USING (word)) WHERE rn = 1",
        "lineitem_rollup":
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_qty_s, CAST(count(*) AS BIGINT) AS n_items "
            "FROM lineitem "
            "GROUP BY ROLLUP(l_returnflag, l_linestatus)",
        "orders_cube":
            "SELECT o_orderstatus, o_orderpriority, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_price_s, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)",
        "distinct_users_by_type":
            "SELECT event_type, count(DISTINCT user_id) AS n_distinct "
            "FROM events GROUP BY event_type",
        "normalized_docs":
            r"SELECT doc_id, trim(regexp_replace(regexp_replace(text, "
            r"'\b(a|the)\b', '', 'g'), ' +', ' ', 'g')) AS norm_text "
            "FROM documents",
        "dedup_keep_longest":
            r"WITH n AS (SELECT doc_id, n_chars, "
            r"trim(regexp_replace(regexp_replace(text, '\b(a|the)\b', '', "
            r"'g'), ' +', ' ', 'g')) AS norm_text FROM documents) "
            "SELECT doc_id, n_chars FROM ("
            "SELECT doc_id, n_chars, row_number() OVER ("
            "PARTITION BY norm_text ORDER BY n_chars DESC, doc_id) AS rn "
            "FROM n) WHERE rn = 1",
        "lang_id":
            # mirrors functions/text.py LangId: per-language trigram presence
            # votes over lower(text[:400]), first-max-wins in profile order
            # (en,fr,de,es), overridden by CJK density then by empty text
            "WITH b AS (SELECT doc_id, coalesce(text,'') AS t, "
            "lower(substr(coalesce(text,''), 1, 400)) AS low FROM documents), "
            "s AS (SELECT doc_id, t, "
            "length(regexp_replace(substr(t,1,200), '[^一-鿿]', '', 'g')) "
            "AS cjk, length(substr(t,1,200)) AS hlen, "
            "(CASE WHEN strpos(low,'the')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'and')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'ing')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'ion')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'is ')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,' th')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'er ')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'of ')>0 THEN 1 ELSE 0 END) AS s_en, "
            "(CASE WHEN strpos(low,'le ')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'de ')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'es ')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'ent')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'la ')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,' et')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'une')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'ais')>0 THEN 1 ELSE 0 END) AS s_fr, "
            "(CASE WHEN strpos(low,'der')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'die')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'und')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'ein')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'sch')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'ich')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'en ')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'cht')>0 THEN 1 ELSE 0 END) AS s_de, "
            "(CASE WHEN strpos(low,'de ')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'la ')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'el ')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'que')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'os ')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'ión')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,'ar ')>0 THEN 1 ELSE 0 END)"
            "+(CASE WHEN strpos(low,' es')>0 THEN 1 ELSE 0 END) AS s_es "
            "FROM b) "
            "SELECT doc_id, CASE WHEN length(t) = 0 THEN 'und' "
            "WHEN CAST(cjk AS DOUBLE) > hlen * 0.2 THEN 'zh' "
            "WHEN greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und' "
            "WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en' "
            "WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr' "
            "WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS lang_pred FROM s",
        "quality_scores":
            # mirrors functions/text.py QualityScore exactly: rational
            # features (IEEE-exact), floor(x*1e6+0.5) scaling on both sides
            "WITH toks AS (SELECT doc_id, length(text) AS n_chars, "
            "length(regexp_replace(text, '\\P{L}', '', 'g')) AS n_alpha, "
            "list_filter(string_split(text, ' '), t -> t <> '') AS tk "
            "FROM documents), "
            "f AS (SELECT doc_id, n_chars, n_alpha, len(tk) AS n_tok, "
            "CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE) "
            "AS tok_total, "
            "len(list_filter(tk, t -> lower(t) IN ('the','a','an','and','or',"
            "'of','to','in','is','are','was','were','be','been','it','this',"
            "'that','for','on','with','as','at','by','from'))) AS n_stop, "
            "len(list_distinct(tk)) AS n_uniq FROM toks), "
            "g AS (SELECT doc_id, "
            "CASE WHEN n_chars > 0 THEN CAST(n_alpha AS DOUBLE) / n_chars "
            "ELSE 0.0 END AS alpha_ratio, "
            "CASE WHEN n_tok > 0 THEN CAST(n_stop AS DOUBLE) / n_tok "
            "ELSE 0.0 END AS stop_ratio, "
            "CASE WHEN n_tok > 0 THEN 1.0 - CAST(n_uniq AS DOUBLE) / n_tok "
            "ELSE 0.0 END AS rep_ratio, "
            "CASE WHEN n_tok > 0 THEN tok_total / n_tok ELSE 0.0 END "
            "AS mean_wlen, "
            "LEAST(GREATEST((n_tok - 5) / 45.0, 0.0), 1.0) AS len_ok "
            "FROM f) "
            "SELECT doc_id, "
            "CAST(FLOOR(alpha_ratio * 1000000.0 + 0.5) AS BIGINT) "
            "AS alpha_ratio_e6, "
            "CAST(FLOOR(stop_ratio * 1000000.0 + 0.5) AS BIGINT) "
            "AS stop_ratio_e6, "
            "CAST(FLOOR(rep_ratio * 1000000.0 + 0.5) AS BIGINT) "
            "AS repetition_ratio_e6, "
            "CAST(FLOOR((0.3 * len_ok + 0.25 * alpha_ratio "
            "+ 0.2 * (1.0 - rep_ratio) "
            "+ 0.25 * exp(-0.5 * (((mean_wlen - 5.0) / 3.0) "
            "* ((mean_wlen - 5.0) / 3.0)))) * 1000000.0 + 0.5) AS BIGINT) "
            "AS quality_score_e6 FROM g",
        "substring_dup_docs":
            # distinct 16-token windows per doc, self-joined: pair (min,max)
            # with the count of shared windows — mirrors functions/dedup.py
            # substring_dup_pairs (hash-bucketed rolling windows)
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), t -> t <> '') AS tk "
            "FROM documents), "
            "idx AS (SELECT doc_id, tk, "
            "unnest(generate_series(1, len(tk) - 15)) AS i "
            "FROM toks WHERE len(tk) >= 16), "
            "w AS (SELECT doc_id, array_to_string(tk[i:i+15], ' ') AS win "
            "FROM idx), "
            "wd AS (SELECT DISTINCT doc_id, win FROM w) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "count(*) AS shared_windows "
            "FROM wd a JOIN wd b ON a.win = b.win AND a.doc_id < b.doc_id "
            "GROUP BY a.doc_id, b.doc_id",
        "suffix_dup_spans":
            # gaps-and-islands over the matched-window self-join: runs of
            # consecutive positions along a diagonal (pa-pb const) are
            # maximal shared substrings — mirrors functions/dedup.py
            # suffix_array_dup_spans
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), t -> t <> '') AS tk "
            "FROM documents), "
            "idx AS (SELECT doc_id, tk, "
            "unnest(generate_series(1, len(tk) - 15)) AS i "
            "FROM toks WHERE len(tk) >= 16), "
            "w AS (SELECT doc_id, i, array_to_string(tk[i:i+15], ' ') AS win "
            "FROM idx), "
            "m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "a.i AS pa, b.i AS pb "
            "FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id), "
            "r AS (SELECT id_a, id_b, pa - pb AS diag, "
            "pa - row_number() OVER (PARTITION BY id_a, id_b, pa - pb "
            "ORDER BY pa) AS grp FROM m), "
            "runs AS (SELECT id_a, id_b, diag, grp, count(*) AS rl "
            "FROM r GROUP BY id_a, id_b, diag, grp) "
            "SELECT id_a, id_b, CAST(sum(rl) AS BIGINT) AS n_matches, "
            "CAST(max(rl) + 15 AS BIGINT) AS max_run_tokens "
            "FROM runs GROUP BY id_a, id_b",
        "doc_fingerprints":
            # winnowing: md5 hash per 8-token gram, min per 4-gram window
            # (clipped to one window for docs with < 4 grams), distinct
            # selected hashes — mirrors functions/text.py winnow_fingerprints
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), t -> t <> '') AS tk "
            "FROM documents), "
            "g AS (SELECT doc_id, len(tk) - 7 AS ng, tk, "
            "unnest(generate_series(1, len(tk) - 7)) AS i "
            "FROM toks WHERE len(tk) >= 8), "
            "f AS (SELECT doc_id, ng, i, "
            "md5_number_lower(array_to_string(tk[i:i+7], ' ')) "
            "% CAST(9223372036854775808 AS HUGEINT) AS fp FROM g), "
            "sel AS (SELECT doc_id, ng, i, "
            "CAST(min(fp) OVER (PARTITION BY doc_id ORDER BY i "
            "ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS BIGINT) "
            "AS fingerprint FROM f) "
            "SELECT DISTINCT doc_id, fingerprint FROM sel "
            "WHERE i <= greatest(1, ng - 3)",
        "sample_split_docs":
            "WITH f AS (SELECT doc_id, n_chars, "
            "((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296) "
            "/ 4294967296.0 AS frac FROM documents) "
            "SELECT doc_id, n_chars, CASE WHEN frac < 0.05 THEN 'test' "
            "WHEN frac < 0.10 THEN 'val' ELSE 'train' END AS split "
            "FROM f WHERE frac < 0.2",
        "sessionize":
            "WITH marked AS ("
            "  SELECT user_id, ts, value,"
            "    CASE WHEN lag(ts) OVER w IS NULL"
            "      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE"
            "    THEN 1 ELSE 0 END AS new_s"
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)"
            "), sess AS ("
            "  SELECT user_id, ts, value,"
            "    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts "
            "      ROWS UNBOUNDED PRECEDING) AS session_id"
            "  FROM marked)"
            "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, "
            "count(*) AS n_events,"
            "  min(ts) AS session_start, max(ts) AS session_end,"
            "  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            "    / 100.0 AS total_value "
            "FROM sess GROUP BY user_id, session_id",
        "top_events_per_user":
            "SELECT user_id, event_id, value FROM events "
            "QUALIFY row_number() OVER (PARTITION BY user_id "
            "ORDER BY value DESC, event_id) <= 3",
        "value_quantiles":
            "SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q, "
            "unnest(quantile_disc(value, "
            "[0.1, 0.25, 0.5, 0.75, 0.9, 0.99])) AS value FROM events",
        "value_quantiles_by_type":
            "SELECT event_type, unnest([0.25, 0.5, 0.9]) AS q, "
            "unnest(quantile_disc(value, [0.25, 0.5, 0.9])) AS value "
            "FROM events GROUP BY event_type",
        "value_quantiles_cont_by_type":
            "SELECT event_type, unnest([0.25, 0.5, 0.9]) AS q, "
            "unnest(quantile_cont(value, [0.25, 0.5, 0.9])) AS value "
            "FROM events GROUP BY event_type",
        # TPC-H Q5 shape; revenue int-scaled floor(x*1e4+0.5) on both sides
        "revenue_by_nation":
            "SELECT n_name, CAST(sum(CAST(floor(l_extendedprice * "
            "(1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS revenue_c "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' AND s_nationkey = c_nationkey "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "GROUP BY n_name",
        # TPC-H Q4 shape (EXISTS adapted to l_returnflag — the synthetic
        # lineitem has no commit/receipt dates)
        "order_priority_counts":
            "SELECT o_orderpriority, count(*) AS n_orders FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "AND EXISTS (SELECT 1 FROM lineitem "
            "  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') "
            "GROUP BY o_orderpriority",
        # TPC-H Q13 shape
        "custdist":
            "SELECT c_count, count(*) AS custdist FROM ("
            "  SELECT c_custkey, count(o_orderkey) AS c_count "
            "  FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "    AND o_orderpriority <> '1-URGENT' "
            "  GROUP BY c_custkey) GROUP BY c_count",
        # TPC-H Q16 shape (supplier association via lineitem; no partsupp)
        "part_supplier_counts":
            "SELECT p_brand, p_type, p_size, "
            "count(DISTINCT l_suppkey) AS supplier_cnt "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE p_brand <> 'Brand#2' "
            "AND p_size IN (1, 5, 11, 18, 23, 32, 45) "
            "GROUP BY p_brand, p_type, p_size",
        # TPC-H Q22 shape: avg threshold decorrelated into the pure-integer
        # inequality bal_c * n > sum_c (exactly bal > avg, no division)
        "global_sales_opportunity":
            "WITH pos AS (SELECT CAST(sum(CAST(floor(c_acctbal * 100.0 "
            "+ 0.5) AS BIGINT)) AS BIGINT) AS s, count(*) AS n "
            "FROM customer WHERE floor(c_acctbal * 100.0 + 0.5) > 0) "
            "SELECT c_nationkey, count(*) AS n_cust, "
            "CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS total_acctbal_c "
            "FROM customer, pos "
            "WHERE CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) * pos.n "
            "> pos.s "
            "AND NOT EXISTS (SELECT 1 FROM orders "
            "  WHERE o_custkey = c_custkey "
            "  AND o_orderdate >= TIMESTAMP '2001-01-01') "
            "GROUP BY c_nationkey",
        # TPC-H Q11 shape: HAVING sum > 1.5*avg as a pure-integer compare
        "important_parts":
            "SELECT l_partkey, CAST(sum(CAST(floor(l_extendedprice * 100.0 "
            "+ 0.5) AS BIGINT)) AS BIGINT) AS value_c "
            "FROM lineitem GROUP BY l_partkey "
            "HAVING sum(CAST(floor(l_extendedprice * 100.0 + 0.5) "
            "AS BIGINT)) * 2 * (SELECT count(DISTINCT l_partkey) "
            "FROM lineitem) > 3 * (SELECT sum(CAST(floor(l_extendedprice "
            "* 100.0 + 0.5) AS BIGINT)) FROM lineitem)",
        # TPC-H Q14 shape: one IEEE division of two int-exact operands
        "promo_revenue":
            "WITH r AS (SELECT CAST(floor(l_extendedprice * "
            "(1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT) AS c, p_type "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-07-01') "
            "SELECT CAST(CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN c "
            "ELSE 0 END) AS BIGINT) * 100 AS DOUBLE) "
            "/ CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS promo_pct FROM r",
        # TPC-H Q10 shape: top 20 by returned revenue, custkey pins ties
        "returned_revenue_customers":
            "SELECT c_custkey, c_name, c_acctbal, revenue_c FROM ("
            "  SELECT o_custkey, CAST(sum(CAST(floor(l_extendedprice * "
            "(1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS revenue_c "
            "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "  WHERE l_returnflag = 'R' "
            "  AND l_shipdate >= TIMESTAMP '1996-01-01' "
            "  AND l_shipdate < TIMESTAMP '1997-01-01' "
            "  GROUP BY o_custkey "
            "  ORDER BY revenue_c DESC, o_custkey LIMIT 20) "
            "JOIN customer ON o_custkey = c_custkey",
        # bottom-k sample over the SQL-expressible Knuth hash: the sample is
        # a pure function of the key set, so the oracle reproduces it
        "events_sample_bottomk":
            "SELECT event_id, value FROM events "
            "ORDER BY (event_id * 2654435761) % 4294967296, event_id "
            "LIMIT 2048",
        # weighted integer race: priority = (hash << 20) // weight, pure
        # BIGINT arithmetic (hash*2^20 < 2^52), ties by key
        "events_weighted_sample":
            "SELECT event_id, "
            "CAST(round(value * 100) AS BIGINT) + 1 AS w_cents FROM events "
            "ORDER BY (((event_id * 2654435761) % 4294967296) * 1048576) "
            "// (CAST(round(value * 100) AS BIGINT) + 1), event_id "
            "LIMIT 1024",
        "value_quantiles_sampled":
            "WITH s AS (SELECT value FROM events "
            "ORDER BY (event_id * 2654435761) % 4294967296, event_id "
            "LIMIT 2048) "
            "SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q, "
            "unnest(quantile_disc(value, "
            "[0.1, 0.25, 0.5, 0.75, 0.9, 0.99])) AS value FROM s",
        "events_stratified_sample":
            "SELECT event_id, event_type, value FROM events "
            "QUALIFY row_number() OVER (PARTITION BY event_type "
            "ORDER BY (event_id * 2654435761) % 4294967296, event_id) "
            "<= 256",
        # list-column norms on the 1e-6-scaled integer domain (FLOAT->DOUBLE
        # is widening, floor(y*1e6+0.5) IEEE-identical per element)
        "embedding_norm_stats":
            "SELECT label, count(*) AS n_vecs, "
            "CAST(sum(list_aggregate(list_transform("
            "CAST(embedding AS DOUBLE[]), "
            "y -> CAST(floor(y * 1000000.0 + 0.5) AS BIGINT) * "
            "CAST(floor(y * 1000000.0 + 0.5) AS BIGINT)), 'sum')) "
            "AS BIGINT) AS norm2_scaled "
            "FROM embeddings GROUP BY label",
        "events_cume_dist":
            "SELECT event_id, event_type, value, "
            "cume_dist() OVER (PARTITION BY event_type ORDER BY value) "
            "AS cume_dist, "
            "nth_value(event_id, 3) OVER (PARTITION BY event_type "
            "ORDER BY value, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND UNBOUNDED FOLLOWING) AS nth_id "
            "FROM events",
        "doc_tokens":
            "WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks "
            "FROM documents) "
            "SELECT doc_id, pos, word FROM ("
            "SELECT doc_id, unnest(toks) AS word, "
            "unnest(range(1, len(toks) + 1)) AS pos FROM s) "
            "WHERE word <> ''",
        # TPC-H Q6 shape: pushed-down predicate aggregate, no shuffle
        "forecast_revenue":
            "SELECT COALESCE(CAST(sum(CAST(floor(l_extendedprice * "
            "l_discount * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT), 0) "
            "AS revenue_c, count(*) AS n_items FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND l_discount >= 0.02 AND l_discount <= 0.06 "
            "AND l_quantity < 24.0",
        # TPC-H Q2 shape: argmin join (lowest-balance supplier per part)
        "cheapest_supplier_per_part":
            "SELECT l_partkey, l_suppkey, s_acctbal FROM ("
            "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "QUALIFY row_number() OVER (PARTITION BY l_partkey "
            "ORDER BY s_acctbal, l_suppkey) = 1",
        # TPC-H Q15 shape: max over an aggregated view; integer ties survive
        "top_supplier_revenue":
            "WITH r AS (SELECT l_suppkey, CAST(sum(CAST(floor("
            "l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) "
            "AS BIGINT)) AS BIGINT) AS total_rev_c FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
            "SELECT * FROM r "
            "WHERE total_rev_c = (SELECT max(total_rev_c) FROM r)",
        # TPC-H Q19 shape: OR of conjunctive predicate branches
        "special_revenue":
            "SELECT COALESCE(CAST(sum(CAST(floor(l_extendedprice * "
            "(1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT), 0)"
            " AS revenue_c, count(*) AS n_items "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#12' AND p_size <= 5 "
            "  AND l_quantity >= 1.0 AND l_quantity <= 11.0) "
            "OR (p_brand = 'Brand#23' AND p_size <= 10 "
            "  AND l_quantity >= 10.0 AND l_quantity <= 20.0) "
            "OR (p_brand = 'Brand#3' AND p_size <= 15 "
            "  AND l_quantity >= 20.0 AND l_quantity <= 30.0)",
        # TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins on the order
        "sole_blame_suppliers":
            "WITH ps AS (SELECT DISTINCT l_orderkey, l_suppkey, "
            "  max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
            "  OVER (PARTITION BY l_orderkey, l_suppkey) AS is_r "
            "  FROM lineitem), "
            "o AS (SELECT l_orderkey, count(*) AS n_supp, "
            "  CAST(sum(is_r) AS BIGINT) AS n_blame FROM ps "
            "  GROUP BY l_orderkey) "
            "SELECT l_suppkey, count(*) AS numwait FROM ps JOIN o "
            "USING (l_orderkey) "
            "WHERE ps.is_r = 1 AND o.n_supp >= 2 AND o.n_blame = 1 "
            "GROUP BY l_suppkey",
        # TPC-H Q7 shape: bidirectional nation-pair volume per ship year
        "nation_trade_volume":
            "SELECT CAST(c_nationkey AS BIGINT) AS cust_nation, "
            "CAST(s_nationkey AS BIGINT) AS supp_nation, "
            "CAST(year(l_shipdate) AS BIGINT) AS l_year, "
            "CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) "
            "* 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS volume_c "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "WHERE (c_nationkey = 3 AND s_nationkey = 7) "
            "OR (c_nationkey = 7 AND s_nationkey = 3) "
            "GROUP BY c_nationkey, s_nationkey, year(l_shipdate)",
        # TPC-H Q18 shape: HAVING-sum semi filter, then the join back
        "large_volume_customers":
            "WITH g AS (SELECT l_orderkey, CAST(sum(CAST(round("
            "l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c "
            "FROM lineitem GROUP BY l_orderkey) "
            "SELECT l_orderkey, sum_qty_c, o_custkey, o_totalprice "
            "FROM g JOIN orders ON l_orderkey = o_orderkey "
            "WHERE sum_qty_c > 20000",
        # TPC-H Q9 shape (retailprice*qty stands in for supplycost);
        # amount = per-row floor difference, identical on both sides
        "product_profit":
            "SELECT CAST(s_nationkey AS BIGINT) AS supp_nation, "
            "CAST(year(l_shipdate) AS BIGINT) AS l_year, "
            "CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) "
            "* 10000.0 + 0.5) AS BIGINT) - CAST(floor(p_retailprice "
            "* l_quantity * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS profit_c "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "GROUP BY s_nationkey, year(l_shipdate)",
        # TPC-H Q8 shape: per-year share = ONE IEEE division of two
        # exactly-representable integer sums
        "market_share":
            "WITH v AS (SELECT year(l_shipdate) AS l_year, "
            "CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 "
            "+ 0.5) AS BIGINT) AS c, s_nationkey "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA') "
            "SELECT CAST(l_year AS BIGINT) AS l_year, "
            "CAST(CAST(sum(CASE WHEN s_nationkey = 7 THEN c ELSE 0 END) "
            "AS BIGINT) AS DOUBLE) / CAST(CAST(sum(c) AS BIGINT) "
            "AS DOUBLE) AS mkt_share FROM v GROUP BY l_year",
        # bloom-prefiltered inner join (probe-side reduction, exact result)
        "urgent_lineitem_revenue":
            "SELECT l_returnflag, CAST(sum(CAST(floor(l_extendedprice * "
            "(1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS revenue_c, count(*) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_orderpriority = '1-URGENT' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-07-01' "
            "GROUP BY l_returnflag",
        # test-set decontamination: word-8-gram overlap with the benchmark
        # subset (doc_id % 13 == 0); single-spaced corpus contract makes
        # string_split(text, ' ') the exact tokenizer on both sides
        "decontaminate":
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "g AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g8 "
            "FROM toks, LATERAL (SELECT unnest(generate_series(1, "
            "greatest(len(t) - 7, 0))) AS i) s), "
            "bench AS (SELECT DISTINCT g8 FROM g WHERE doc_id % 13 = 0), "
            "gd AS (SELECT DISTINCT doc_id, g8 FROM g "
            "WHERE doc_id % 13 <> 0) "
            "SELECT doc_id, count(*) AS n_shared "
            "FROM gd JOIN bench USING (g8) GROUP BY doc_id",
    }


def _compose_curation_oracle(d: dict[str, str]) -> str:
    """corpus_curation = lang_id + quality_scores + exact-dedup winners +
    length band, composed from the SAME oracle fragments those queries are
    verified against (so the composite stays exact by construction)."""
    return (
        "WITH lang AS (" + d["lang_id"] + "), "
        "qual AS (" + d["quality_scores"] + "), "
        "winners AS (SELECT min(doc_id) AS doc_id FROM documents "
        "GROUP BY text) "
        "SELECT d.doc_id, l.lang_pred, q.quality_score_e6, d.n_chars "
        "FROM documents d JOIN winners USING (doc_id) "
        "JOIN lang l USING (doc_id) JOIN qual q USING (doc_id) "
        "WHERE l.lang_pred = 'en' AND q.quality_score_e6 >= 700000 "
        "AND d.n_chars BETWEEN 100 AND 520")


def _compose_web_pipeline_oracle(d: dict[str, str]) -> str:
    """web_pipeline = WARC round trip (lossless, so a no-op over the base
    table) + WET extraction (lossless on the single-spaced corpus) +
    exact-dedup winners + lang_id + quality_scores + byte-length band,
    composed from the SAME oracle fragments those stages are individually
    verified against — the composite stays exact by construction."""
    return (
        "WITH lang AS (" + d["lang_id"] + "), "
        "qual AS (" + d["quality_scores"] + "), "
        "winners AS (SELECT min(doc_id) AS doc_id FROM documents "
        "GROUP BY text) "
        "SELECT d.doc_id, l.lang_pred, q.quality_score_e6, "
        "CAST(strlen(d.text) AS BIGINT) AS n_bytes "
        "FROM documents d JOIN winners USING (doc_id) "
        "JOIN lang l USING (doc_id) JOIN qual q USING (doc_id) "
        "WHERE l.lang_pred = 'en' AND q.quality_score_e6 >= 700000 "
        "AND strlen(d.text) BETWEEN 100 AND 520 ORDER BY doc_id")
