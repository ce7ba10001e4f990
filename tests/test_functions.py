"""Tests for the training-data operator family: dedup variants, similarity
search, text analysis, relational helpers."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


def test_simhash_finds_planted_near_dups(rd):
    from setsketch_ray.functions.dedup import simhash_pairs

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest before nightfall").split()
    texts, ids = [], []
    for i in range(50):
        words = [w + str(i) for w in base]  # distinct docs
        texts.append(" ".join(words))
        ids.append(2 * i)
        dup = list(words)
        dup[3] = "cat"  # one-token edit -> small Hamming distance
        texts.append(" ".join(dup))
        ids.append(2 * i + 1)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    pairs = pa.concat_tables(list(simhash_pairs(ds, "doc_id", max_hamming=12)
                                  .iter_batches(batch_format="pyarrow",
                                                batch_size=1 << 20)))
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    planted = {(2 * i, 2 * i + 1) for i in range(50)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, f"simhash recall {recall}"


def test_simhash_hot_bucket_stays_connected(rd):
    """>bucket_cap identical fingerprints must stay transitively connected
    (star+chain) instead of being dropped (ADVICE r1)."""
    from setsketch_ray.functions.dedup import simhash_pairs
    from setsketch_ray.stages.cluster import cluster_edges

    n_hot = 40
    texts = ["exact duplicate stock caption text here"] * n_hot
    ids = list(range(n_hot))
    # plus unrelated singletons so buckets aren't all-hot
    for i in range(20):
        texts.append(f"completely different document number {i} "
                     f"about topic{i} and subject{i * 7}")
        ids.append(n_hot + i)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    pairs = pa.concat_tables(list(
        simhash_pairs(ds, "doc_id", max_hamming=4, bucket_cap=8)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    mapping = cluster_edges(pairs["id_a"].to_pylist(),
                            pairs["id_b"].to_pylist())
    roots = {mapping.get(i, i) for i in range(n_hot)}
    assert len(roots) == 1, f"hot bucket fragmented into {len(roots)} clusters"
    # emitted pairs stayed O(n), not O(n^2)
    assert pairs.num_rows < 28 * 3 * n_hot


@pytest.mark.parametrize("n", [1, 2])
def test_char_ngram_jaccard_distributed_matches_bruteforce(rd, n):
    """Distributed consecutive-pair scorer (range partition + boundary carry)
    vs the obvious single-process reference — ids are GAPPY so successors
    cross empty id ranges and partition boundaries."""
    from setsketch_ray.functions.dedup import char_ngram_jaccard_pairs

    rng = np.random.default_rng(5)
    # sparse ids over a huge range -> most value-range partitions are empty
    ids = np.sort(rng.choice(10_000_000, size=120, replace=False))
    vocab = "abcdefg hij"
    texts = ["".join(rng.choice(list(vocab), size=rng.integers(0, 40)))
             for _ in ids]
    texts[5] = ""  # empty doc edge case
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    ds = ds.repartition(6)  # several blocks: exercises the histogram combine
    got = pa.concat_tables(list(
        char_ngram_jaccard_pairs(ds, "doc_id", n=n, num_partitions=16)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    got = got.take(pa.compute.sort_indices(got["id_a"]))

    exp_a, exp_b, exp_j = [], [], []
    for i in range(len(ids) - 1):
        sa = {texts[i][j:j + n] for j in range(max(len(texts[i]) - n + 1, 0))}
        sb = {texts[i + 1][j:j + n]
              for j in range(max(len(texts[i + 1]) - n + 1, 0))}
        u = len(sa | sb)
        exp_a.append(int(ids[i]))
        exp_b.append(int(ids[i + 1]))
        exp_j.append(len(sa & sb) / u if u else 0.0)
    assert got["id_a"].to_pylist() == exp_a
    assert got["id_b"].to_pylist() == exp_b
    assert np.allclose(got["jaccard"].to_numpy(), exp_j, atol=1e-12)


def test_embedding_near_dup_recall(rd):
    from setsketch_ray.functions.dedup import embedding_near_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 32))
    vecs, ids = [], []
    for i in range(40):
        vecs.append(base[i])
        ids.append(2 * i)
        vecs.append(base[i] + 0.05 * rng.standard_normal(32))  # near-dup
        ids.append(2 * i + 1)
    emb = pa.array([list(map(float, v)) for v in vecs],
                   pa.list_(pa.float32()))
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(ids, pa.int64()),
                                 "embedding": emb}))
    pairs = pa.concat_tables(list(
        embedding_near_dup_pairs(ds, cosine_threshold=0.95, n_bits=8,
                                 n_tables=6)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    planted = {(2 * i, 2 * i + 1) for i in range(40)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.95, f"embedding near-dup recall {recall}"
    # precision: random base vectors are near-orthogonal
    assert len(got - planted) <= 2


def test_cosine_pairs_matches_numpy(rd):
    from setsketch_ray.functions.knn import cosine_pairs

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((120, 16))
    vecs[11] = vecs[3] + 0.01 * rng.standard_normal(16)  # planted near-dup
    vecs[77] = -vecs[20]                                  # anti-correlated
    emb = pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32()))
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(range(120), pa.int64()),
                                 "embedding": emb}))
    out = pa.concat_tables(list(
        cosine_pairs(ds, threshold=0.4)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    got = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    v32 = vecs.astype(np.float32).astype(np.float64)
    n = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
    sims = n @ n.T
    ia, ib = np.nonzero(np.triu(sims >= 0.4, k=1))
    expected = set(zip(ia.tolist(), ib.tolist()))
    assert got == expected
    assert (3, 11) in got and (20, 77) not in got


def test_knn_bruteforce_matches_numpy(rd):
    from setsketch_ray.functions.knn import knn_bruteforce

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((200, 16))
    emb = pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32()))
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(range(200), pa.int64()),
                                 "embedding": emb}))
    res = knn_bruteforce(ds, query_vec_id=7, k=5)
    # numpy reference (float32-quantized inputs like the column)
    v32 = vecs.astype(np.float32).astype(np.float64)
    q = v32[7]
    cos = (v32 @ q) / (np.linalg.norm(v32, axis=1) * np.linalg.norm(q))
    cos[7] = -np.inf
    expected = list(np.argsort(-cos)[:5])
    assert res["vec_id"].to_pylist() == expected
    assert res["rank"].to_pylist() == [1, 2, 3, 4, 5]


def test_exact_dedup(rd):
    from setsketch_ray.functions.dedup import exact_dedup

    t = pa.table({"text": pa.array(["a", "b", "a", "c", "b", "a"]),
                  "doc_id": pa.array([5, 2, 1, 9, 7, 3], pa.int64())})
    out = exact_dedup(rd.from_arrow(t), "text", "doc_id").to_pandas()
    got = dict(zip(out["text"], out["doc_id"]))
    assert got == {"a": 1, "b": 2, "c": 9}


def test_token_stats_and_fingerprint(rd):
    from setsketch_ray.functions.text import AddTokenStats, fingerprint_column

    t = pa.table({"text": pa.array(["one two three", "hello", "a b c d",
                                    "GPT-4 costs $0.03/1k tokens!", ""])})
    out = AddTokenStats()(t)
    assert out["n_tokens"].to_pylist() == [3, 1, 4, 4, 1]
    assert out["n_chars_engine"].to_pylist() == [13, 5, 7, 28, 0]
    # BPE-ish count == Python re.findall of the same pattern
    import re

    from setsketch_ray.functions.text import _BPE_ISH

    expect = [len(_BPE_ISH.findall(s)) for s in t["text"].to_pylist()]
    assert out["n_tokens_bpe"].to_pylist() == expect
    assert expect[3] > 4  # symbols/digit-runs split into subword-ish pieces
    fp1 = fingerprint_column(["x", "y", "x"]).to_pylist()
    assert fp1[0] == fp1[2] != fp1[1]


def test_lang_id_deterministic_and_sane(rd):
    from setsketch_ray.functions.text import LangId

    li = LangId()
    t = pa.table({"text": pa.array([
        "the cat is on the mat and the dog is there",
        "le chat est sur la table et il est la",
        "der hund und die katze sind schnell und gut",
        "你好 世界 这是 一段 中文 文本 测试 内容 很多 汉字",
    ])})
    out = li(t)["lang_pred"].to_pylist()
    assert out[0] == "en"
    assert out[3] == "zh"
    assert li(t)["lang_pred"].to_pylist() == out  # deterministic


def test_grouped_aggregate_matches_pandas(rd):
    import pandas as pd

    from setsketch_ray.functions.relational import grouped_aggregate

    rng = np.random.default_rng(0)
    df = pd.DataFrame({"k": rng.integers(0, 5, 1000),
                       "v": rng.standard_normal(1000)})
    ds = rd.from_pandas(df).repartition(7)
    out = grouped_aggregate(ds, ["k"], {
        "n": ("count", None), "s": ("sum", "v"), "m": ("mean", "v"),
        "mx": ("max", "v"), "mn": ("min", "v")}).to_pandas().set_index("k")
    ref = df.groupby("k")["v"].agg(["count", "sum", "mean", "max", "min"])
    for k in ref.index:
        assert out.loc[k, "n"] == ref.loc[k, "count"]
        assert np.isclose(out.loc[k, "s"], ref.loc[k, "sum"])
        assert np.isclose(out.loc[k, "m"], ref.loc[k, "mean"])
        assert np.isclose(out.loc[k, "mx"], ref.loc[k, "max"])
        assert np.isclose(out.loc[k, "mn"], ref.loc[k, "min"])


def test_knn_ivf_recall_vs_bruteforce(rd):
    """IVF probe path recovers (almost all of) the exact top-k on clustered
    vectors, and is deterministic across runs."""
    from setsketch_ray.functions.knn import knn_bruteforce, knn_ivf

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 24)) * 4
    vecs = np.concatenate([
        centers[i % 8] + rng.standard_normal(24) * 0.4
        for i in range(400)]).reshape(400, 24)
    t = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                  "embedding": pa.array(list(vecs.astype(np.float32)))})
    ds = rd.from_arrow(t).repartition(4)
    exact = knn_bruteforce(ds, query_vec_id=0, k=10)["vec_id"].to_pylist()
    approx = knn_ivf(ds, query_vec_id=0, k=10, n_centroids=16, n_probe=4)
    got = approx["vec_id"].to_pylist()
    recall = len(set(exact) & set(got)) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall}"
    again = knn_ivf(ds, query_vec_id=0, k=10, n_centroids=16,
                    n_probe=4)["vec_id"].to_pylist()
    assert got == again  # deterministic


def test_knn_ivf_pruned_matches_instream(rd, tmp_path):
    """The partition-pruned layout (build_ivf_index + knn_ivf_pruned) gives
    the IDENTICAL ranked answer as the in-stream knn_ivf probe at the same
    centroid config, reading only the probed cells' files; both the
    by-vector and by-id query paths agree."""
    import os

    from setsketch_ray.functions.knn import (build_ivf_index, knn_ivf,
                                             knn_ivf_pruned)

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 24)) * 4
    vecs = np.concatenate([
        centers[i % 8] + rng.standard_normal(24) * 0.4
        for i in range(400)]).reshape(400, 24)
    t = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                  "embedding": pa.array(list(vecs.astype(np.float32)))})
    ds = rd.from_arrow(t).repartition(4)
    instream = knn_ivf(ds, query_vec_id=0, k=10, n_centroids=16,
                       n_probe=4)["vec_id"].to_pylist()
    root = str(tmp_path / "ivf")
    build_ivf_index(ds, root, n_centroids=16)
    # layout exists and is hive-partitioned by cell
    cells = [d for d in os.listdir(root) if d.startswith("cell=")]
    assert len(cells) > 1
    by_id = knn_ivf_pruned(root, query_vec_id=0, k=10,
                           n_probe=4)["vec_id"].to_pylist()
    assert by_id == instream
    by_vec = knn_ivf_pruned(root, query_vec=vecs[0], query_vec_id=0, k=10,
                            n_probe=4)["vec_id"].to_pylist()
    assert by_vec == instream


def test_sample_and_split_deterministic(rd):
    """Hash sampling/splitting: reproducible, RNG-free, block-layout
    independent, and the splits partition the sample."""
    from setsketch_ray.functions.relational import (sample_by_key,
                                                    train_val_test_split)

    t = pa.table({"k": pa.array(range(10_000), pa.int64())})
    a = pa.concat_tables(list(sample_by_key(rd.from_arrow(t), "k", 0.3)
                              .iter_batches(batch_format="pyarrow")))
    b = pa.concat_tables(list(
        sample_by_key(rd.from_arrow(t).repartition(7), "k", 0.3)
        .iter_batches(batch_format="pyarrow")))
    assert sorted(a["k"].to_pylist()) == sorted(b["k"].to_pylist())
    assert 0.25 < len(a) / 10_000 < 0.35
    sp = pa.concat_tables(list(
        train_val_test_split(rd.from_arrow(t), "k", 0.1, 0.1)
        .iter_batches(batch_format="pyarrow")))
    counts = dict(zip(*np.unique(sp["split"].to_numpy(zero_copy_only=False),
                                 return_counts=True)))
    assert set(counts) == {"train", "val", "test"}
    assert 0.07 < counts["test"] / 10_000 < 0.13
    assert counts["train"] + counts["val"] + counts["test"] == 10_000


def test_count_distinct(rd):
    from setsketch_ray.functions.relational import count_distinct

    t = pa.table({"x": pa.array([1, 2, 2, 3, 3, 3, 4], pa.int64())})
    assert count_distinct(rd.from_arrow(t).repartition(3), "x") == 4
    # string column + duplicates split across blocks (partition-merge path)
    s = pa.table({"x": pa.array([f"k{i % 37}" for i in range(400)])})
    assert count_distinct(rd.from_arrow(s).repartition(5), "x") == 37


def test_approx_distinct_accuracy(rd):
    from setsketch_ray.aggregates import approx_distinct

    n = 50_000
    t = pa.table({"x": pa.array(np.arange(n) % 10_000, pa.int64())})
    est = approx_distinct(rd.from_arrow(t).repartition(8), "x")
    assert abs(est / 10_000 - 1) < 0.08
    # deterministic
    est2 = approx_distinct(rd.from_arrow(t).repartition(4), "x")
    assert est == est2


def test_substring_dup_pairs(rd):
    from setsketch_ray.functions.dedup import substring_dup_pairs

    rng = np.random.default_rng(11)
    vocab = [f"w{k}" for k in range(500)]
    docs, ids = [], []
    shared_run = " ".join(vocab[k] for k in rng.integers(0, 500, 20))
    for i in range(30):
        filler = " ".join(vocab[k] for k in rng.integers(0, 500, 40))
        if i < 10:  # ten docs embed the same 20-token run
            docs.append(filler + " " + shared_run)
        else:
            docs.append(filler + " " + " ".join(
                vocab[k] for k in rng.integers(0, 500, 20)))
        ids.append(i)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(docs)}))
    pairs = pa.concat_tables(list(
        substring_dup_pairs(ds, "doc_id", window=16)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    expected = {(i, j) for i in range(10) for j in range(i + 1, 10)}
    assert expected <= got                       # all sharers found
    assert all(a < 10 and b < 10 for a, b in got)  # and nothing else
    assert min(pairs["shared_windows"].to_pylist()) >= 1


def test_suffix_array_dup_spans(rd):
    from setsketch_ray.functions.dedup import suffix_array_dup_spans

    rng = np.random.default_rng(5)
    vocab = [f"w{k}" for k in range(300)]
    base = [vocab[k] for k in rng.integers(0, 300, 60)]
    docs = [" ".join(vocab[k] for k in rng.integers(0, 300, 50))
            for _ in range(6)]
    # docs 6+7 share a 30-token run; doc 8 repeats a 16-token run twice
    docs.append(" ".join([vocab[k] for k in rng.integers(0, 300, 10)]
                         + base[:30]))
    docs.append(" ".join(base[:30] + ["t1", "t2"]))
    rep = " ".join(base[:16])
    docs.append(rep + " zz " + rep)
    docs.append("a b c")   # < window tokens
    docs.append("")        # empty (trailing)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs)}))
    out = pa.concat_tables(list(
        suffix_array_dup_spans(ds, "doc_id", window=16)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    rows = {(a, b): (n, r) for a, b, n, r in zip(
        out["id_a"].to_pylist(), out["id_b"].to_pylist(),
        out["n_matches"].to_pylist(), out["max_run_tokens"].to_pylist())}
    # the 30-token shared run: 15 window matches merged to one 30-token span
    assert rows[(6, 7)] == (15, 30)
    # doc 8 holds base[:16] twice -> two matches vs each of 6 and 7
    assert rows[(6, 8)] == (2, 16) and rows[(7, 8)] == (2, 16)
    # no pair involves the random, short or empty docs
    assert set(rows) == {(6, 7), (6, 8), (7, 8)}


def test_suffix_dup_spans_oracle_sf0001(rd):
    """End-to-end vs the registered DuckDB oracle on the real sf0.001 table."""
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    from util_compare import compare

    sf = os.environ.get("GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    res = entry.queries()["suffix_dup_spans"](sf)
    ok, msg = compare(res, entry.oracle_sql()["suffix_dup_spans"], sf)
    assert ok, msg


def test_winnow_fingerprints(rd):
    from setsketch_ray.functions.text import winnow_fingerprints

    rng = np.random.default_rng(9)
    vocab = [f"w{k}" for k in range(400)]
    shared = [vocab[k] for k in rng.integers(0, 400, 11)]  # k + w - 1 = 11
    docs = []
    for i in range(4):
        filler = [vocab[k] for k in rng.integers(0, 400, 40)]
        docs.append(" ".join(filler[:20] + shared + filler[20:]))
    docs.append(" ".join(vocab[k] for k in rng.integers(0, 400, 40)))
    docs.append("a b c d e f g h i")   # 9 tokens -> 2 grams < w: clipped
    docs.append("short doc")           # < k tokens: no fingerprints
    docs.append("")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs)}))
    out = pa.concat_tables(list(
        winnow_fingerprints(ds, "doc_id", k=8, w=4)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    fps = {}
    for d, f in zip(out["doc_id"].to_pylist(),
                    out["fingerprint"].to_pylist()):
        fps.setdefault(d, set()).add(f)
    # winnowing guarantee: a shared run of k+w-1 tokens => shared fingerprint
    common = fps[0] & fps[1] & fps[2] & fps[3]
    assert common, "docs sharing an 11-token run must share a fingerprint"
    assert 5 in fps and len(fps[5]) == 1   # clipped single window
    assert 6 not in fps and 7 not in fps   # too short / empty
    # fnv path: same selection semantics, deterministic
    out2 = pa.concat_tables(list(
        winnow_fingerprints(ds, "doc_id", k=8, w=4, hash_name="fnv")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    fps2 = {}
    for d, f in zip(out2["doc_id"].to_pylist(),
                    out2["fingerprint"].to_pylist()):
        fps2.setdefault(d, set()).add(f)
    assert fps2[0] & fps2[1] & fps2[2] & fps2[3]
    assert set(fps2) == set(fps)


def test_doc_fingerprints_oracle_sf0001(rd):
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    from util_compare import compare

    sf = os.environ.get("GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    res = entry.queries()["doc_fingerprints"](sf)
    ok, msg = compare(res, entry.oracle_sql()["doc_fingerprints"], sf)
    assert ok, msg


def test_read_corpus_parquet_and_lance_gate(rd, tmp_path):
    import pytest as _pytest

    from setsketch_ray.sources import cached_images_parquet
    from setsketch_ray.sources.readers import read_corpus

    ds = read_corpus(cached_images_parquet(200), columns=["image_id"])
    assert ds.count() == 200
    with _pytest.raises(ImportError):
        read_corpus(str(tmp_path / "corpus.lance"))


def test_read_corpus_csv_and_jsonl_roundtrip(rd, tmp_path):
    """CSV / JSONL sources round-trip a text-schema corpus through
    read_corpus with identical values and support column pruning."""
    import pyarrow.csv as pacsv

    from setsketch_ray.sources.readers import read_corpus

    t = pa.table({"doc_id": pa.array(np.arange(50), pa.int64()),
                  "text": pa.array([f"doc number {i} body" for i in
                                    range(50)]),
                  "score": pa.array(np.linspace(0, 1, 50), pa.float64())})
    csv_path = str(tmp_path / "docs.csv")
    pacsv.write_csv(t, csv_path)
    got = read_corpus(csv_path).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == list(range(50))
    assert got["text"].tolist() == t["text"].to_pylist()
    assert (got["score"].to_numpy() == t["score"].to_numpy()).all()

    jsonl_path = str(tmp_path / "docs.jsonl")
    with open(jsonl_path, "w") as f:
        import json as _json

        for row in t.to_pylist():
            f.write(_json.dumps(row) + "\n")
    got2 = read_corpus(jsonl_path, columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got2.columns) == ["doc_id", "text"]
    assert got2["text"].tolist() == t["text"].to_pylist()

    # gzip variants: same values through Arrow's in-task gzip stream
    import gzip as _gzip

    gz_jsonl = str(tmp_path / "docs.jsonl.gz")
    with open(jsonl_path, "rb") as src, _gzip.open(gz_jsonl, "wb") as dst:
        dst.write(src.read())
    got3 = read_corpus(gz_jsonl, columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got3.equals(got2)

    gz_csv = str(tmp_path / "docs.csv.gz")
    with open(csv_path, "rb") as src, _gzip.open(gz_csv, "wb") as dst:
        dst.write(src.read())
    got4 = read_corpus(gz_csv).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got4["text"].tolist() == t["text"].to_pylist()


def test_top_k_per_group(rd):
    import pandas as pd

    from setsketch_ray.functions.relational import top_k_per_group

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"g": rng.integers(0, 20, 500),
                       "eid": np.arange(500),
                       "v": rng.standard_normal(500)})
    out = top_k_per_group(rd.from_pandas(df).repartition(5), "g", "v", 3,
                          tiebreak_col="eid").to_pandas()
    ref = df.sort_values(["g", "v", "eid"], ascending=[True, False, True]) \
        .groupby("g").head(3)
    assert sorted(out["eid"]) == sorted(ref["eid"])


def test_hot_shingle_blocklist(rd):
    """DF pass finds corpus-hot shingles; ShingleStage(blocklist=...) drops
    them from both modalities while keeping rare shingles intact."""
    import pyarrow.parquet as pq

    from setsketch_ray.sources import cached_images_parquet
    from setsketch_ray.stages.shingle import (ShingleStage,
                                              hot_shingle_blocklist)
    from setsketch_ray.stages.sketch_stage import (DEFAULT_MODALITIES,
                                                   list_column_to_flat)

    # every caption gets a shared hot token injected
    t = pq.read_table(cached_images_parquet(400))
    caps = pa.array([c + " megahotword" for c in t["caption"].to_pylist()])
    t = t.set_column(t.column_names.index("caption"), "caption", caps)
    ds = rd.from_arrow(t).repartition(4)
    block = hot_shingle_blocklist(ds, DEFAULT_MODALITIES,
                                  min_doc_fraction=0.5)
    assert len(block) >= 1  # at least the injected unigram

    plain = ShingleStage()(t)
    filtered = ShingleStage(blocklist=block)(t)
    v0, o0 = list_column_to_flat(plain["shingles_cap"])
    v1, o1 = list_column_to_flat(filtered["shingles_cap"])
    assert len(v1) < len(v0)
    assert not (set(v1.tolist()) & set(block))
    # rare shingles survive
    assert len(v1) > 0.5 * len(v0)


def test_lookup_join_matches_pandas(rd):
    import pandas as pd

    from setsketch_ray.functions.relational import lookup_join

    rng = np.random.default_rng(17)
    lt = pa.table({"k": pa.array(rng.integers(0, 60, 500), pa.int64()),
                   "v": pa.array(rng.standard_normal(500))})
    rt = pa.table({"rk": pa.array(np.arange(40), pa.int64()),
                   "w": pa.array([f"s{i}" for i in range(40)])})
    out = pa.concat_tables(list(
        lookup_join(rd.from_arrow(lt).repartition(5),
                    rd.from_arrow(rt).repartition(3), "k", "rk", 8)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    exp = lt.to_pandas().merge(rt.to_pandas(), left_on="k",
                               right_on="rk").drop(columns=["rk"])
    srt = lambda d: d.sort_values(["k", "v", "w"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(srt(out.to_pandas()), srt(exp))

    # no matches at all -> empty, schema preserved
    rt2 = pa.table({"rk": pa.array([1000, 1001], pa.int64()),
                    "w": pa.array(["a", "b"])})
    ds2 = lookup_join(rd.from_arrow(lt), rd.from_arrow(rt2), "k", "rk", 4)
    assert ds2.count() == 0
    assert set(ds2.schema().names) >= {"k", "v", "w"}


def test_lookup_join_left_outer_matches_pandas(rd):
    """how='left' keeps unmatched rows with null right columns — including
    partitions whose right side is entirely empty."""
    import pandas as pd

    from setsketch_ray.functions.relational import lookup_join

    rng = np.random.default_rng(18)
    lt = pa.table({"k": pa.array(rng.integers(0, 60, 400), pa.int64()),
                   "v": pa.array(rng.standard_normal(400))})
    rt = pa.table({"rk": pa.array(np.arange(15), pa.int64()),  # sparse right
                   "w": pa.array([f"s{i}" for i in range(15)])})
    out = pa.concat_tables(list(
        lookup_join(rd.from_arrow(lt).repartition(5),
                    rd.from_arrow(rt).repartition(3), "k", "rk", 8,
                    how="left")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    exp = lt.to_pandas().merge(rt.to_pandas(), left_on="k", right_on="rk",
                               how="left").drop(columns=["rk"])
    srt = lambda d: d.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(srt(out.to_pandas()), srt(exp))
    assert out.num_rows == 400                      # every left row kept


def test_lookup_join_full_outer_matches_pandas(rd):
    """how='full' keeps unmatched rows from BOTH sides (right-only rows get
    null left columns and keep the right key) — including partitions that
    are entirely one-sided."""
    import pandas as pd

    from setsketch_ray.functions.relational import lookup_join

    rng = np.random.default_rng(19)
    # left keys 0..39, right keys 20..79: both sides have unmatched rows
    lt = pa.table({"k": pa.array(rng.integers(0, 40, 300), pa.int64()),
                   "v": pa.array(rng.standard_normal(300))})
    rt = pa.table({"rk": pa.array(np.arange(20, 80), pa.int64()),
                   "w": pa.array([f"s{i}" for i in range(60)])})
    out = pa.concat_tables(list(
        lookup_join(rd.from_arrow(lt).repartition(5),
                    rd.from_arrow(rt).repartition(3), "k", "rk", 8,
                    how="full")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    exp = lt.to_pandas().merge(rt.to_pandas(), left_on="k", right_on="rk",
                               how="outer")
    assert set(out.column_names) == {"k", "v", "rk", "w"}
    srt = lambda d: d.sort_values(["k", "rk", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        srt(out.to_pandas())[["k", "v", "rk", "w"]],
        srt(exp)[["k", "v", "rk", "w"]])
    # right-only rows present with null left key
    n_right_only = int(out.to_pandas()["k"].isna().sum())
    assert n_right_only == len([x for x in range(20, 80)
                                if x not in set(lt["k"].to_pylist())])


def test_lookup_join_rejects_duplicate_right_keys(rd):
    import pytest as _pytest
    import ray

    from setsketch_ray.functions.relational import lookup_join

    lt = pa.table({"k": pa.array([1, 2], pa.int64())})
    rt = pa.table({"rk": pa.array([1, 1], pa.int64()),
                   "w": pa.array(["a", "b"])})
    ds = lookup_join(rd.from_arrow(lt), rd.from_arrow(rt), "k", "rk", 2)
    with _pytest.raises((ray.exceptions.RayTaskError, AssertionError)):
        ds.materialize()


def test_sessionize_boundaries_and_scaled_sums(rd):
    from setsketch_ray.functions.streaming import sessionize

    # user 1: two sessions (gap 3600 s > 1800); user 2: one session.
    ts = np.array([0, 600, 1200, 1200 + 3600, 1200 + 4200, 0, 900],
                  dtype="datetime64[s]").astype("datetime64[us]")
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array(ts),
        # cents-exact floats whose naive float sum is inexact (0.1+0.2)
        "value": pa.array([0.10, 0.20, 0.30, 1.10, 2.20, 0.70, 0.10]),
    })
    out = pa.concat_tables(list(
        sessionize(rd.from_arrow(t).repartition(3), gap_seconds=1800.0,
                   num_partitions=4, value_scale=100)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
        .to_pandas().sort_values(["user_id", "session_id"]) \
        .reset_index(drop=True)
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["session_id"].tolist() == [1, 2, 1]
    assert out["n_events"].tolist() == [3, 2, 2]
    # integer-scaled sums are exact: 0.1+0.2+0.3 == 0.6 bit-exact
    assert out["total_value"].tolist() == [0.6, 3.3, 0.8]
    # unscaled path still sums (approximately) the same
    out2 = pa.concat_tables(list(
        sessionize(rd.from_arrow(t), gap_seconds=1800.0, num_partitions=4)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    assert np.allclose(sorted(out2["total_value"].to_pylist()),
                       [0.6, 0.8, 3.3])


def test_quantiles_fixedpoint_matches_duckdb(rd):
    """Distributed scaled-count quantiles == DuckDB quantile_disc, across
    awkward n (ties, tiny partitions, values repeating across blocks)."""
    import duckdb

    from setsketch_ray.functions.relational import quantiles_fixedpoint

    rng = np.random.default_rng(11)
    # canonical decimal doubles (d/100): the operator's stated input contract
    # is round(x*scale)/scale == x bit-exact (true for the cents-valued
    # events table; d/100 is the nearest-double of the decimal)
    vals = rng.integers(1, 50_000, size=1237).astype(np.float64) / 100.0
    vals[:50] = 7.77  # heavy tie
    t = pa.table({"value": pa.array(vals, pa.float64())})
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = quantiles_fixedpoint(rd.from_arrow(t).repartition(7), "value", qs,
                               scale=100)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(
        f"SELECT unnest({qs}) AS q, unnest(quantile_disc(value, {qs})) "
        "AS value FROM t").df()
    assert got["q"].to_pylist() == exp["q"].tolist()
    assert got["value"].to_pylist() == exp["value"].tolist()  # bit-exact


def test_json_field_extract_handles_missing_keys(rd):
    """The vectorized RE2 json-field pull nulls out rows without the key,
    matching DuckDB json_extract_string NULL semantics in sum/max."""
    import duckdb
    import pyarrow.compute as pc

    t = pa.table({"g": pa.array(["a", "a", "b", "b"]),
                  "props": pa.array(['{"k": 3}', '{"other": 1}',
                                     '{"k": 10}', '{"k": 7}'])})
    m = pc.extract_regex(t["props"].combine_chunks(), r'"k":\s*(?P<k>\d+)')
    k = pc.struct_field(m, "k").cast(pa.int64())
    got = pa.table({"g": t["g"], "k": k}).group_by("g") \
        .aggregate([("k", "sum"), ("k", "max")]).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(
        "SELECT g, sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) "
        "AS s, max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS m "
        "FROM t GROUP BY g ORDER BY g").df()
    assert got["k_sum"].tolist() == exp["s"].tolist()
    assert got["k_max"].tolist() == exp["m"].tolist()


def test_grouped_string_agg_matches_duckdb(rd):
    """Ordered per-key concatenation == DuckDB string_agg(... ORDER BY),
    across partitions with equal-ts ties pinned by the tiebreak."""
    import duckdb

    from setsketch_ray.functions.relational import grouped_string_agg

    rng = np.random.default_rng(22)
    n = 400
    t = pa.table({
        "k": pa.array(rng.integers(0, 15, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 20, n), pa.int64()),  # heavy ties
        "tie": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.choice(["a", "bb", "ccc"], n)),
    })
    got = pa.concat_tables(list(
        grouped_string_agg(rd.from_arrow(t).repartition(5), "k", "v", "ts",
                           "tie", sep="|", num_partitions=8)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(
        "SELECT k, string_agg(v, '|' ORDER BY ts, tie) AS agg FROM t "
        "GROUP BY k ORDER BY k").df()
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["agg"].tolist() == exp["agg"].tolist()


def test_set_op_intersect_except_match_duckdb(rd):
    """Multi-column INTERSECT / EXCEPT with distinct semantics (duplicate
    input rows collapse; tuples co-locate by combined column hash)."""
    import duckdb

    from setsketch_ray.functions.relational import set_op

    rng = np.random.default_rng(21)
    n = 700
    # domain (400 x 3) >> n so EXCEPT is nonempty (at 40 x 3 both sides
    # saturate every tuple and EXCEPT is legitimately empty)
    mk = lambda seed: pa.table({
        "a": pa.array(rng.integers(0, 400, n), pa.int64()),
        "b": pa.array(rng.choice(["x", "y", "z"], n)),
    })
    lt, rt = mk(1), mk(2)
    con = duckdb.connect()
    con.register("lt", lt)
    con.register("rt", rt)
    for op, sql_op in (("intersect", "INTERSECT"), ("except", "EXCEPT")):
        out = pa.concat_tables(list(
            set_op(rd.from_arrow(lt).repartition(4),
                   rd.from_arrow(rt).repartition(3), ["a", "b"], op=op,
                   num_partitions=8)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        exp = con.sql(f"SELECT a, b FROM lt {sql_op} SELECT a, b FROM rt "
                      "ORDER BY a, b").df()
        assert len(out) > 0, op                   # nontrivial both ways
        assert out["a"].tolist() == exp["a"].tolist(), op
        assert out["b"].tolist() == exp["b"].tolist(), op


def test_rollup_aggregate_matches_duckdb(rd):
    """ROLLUP levels (finest, each prefix, grand total) match DuckDB for
    every re-combinable op; mean is rejected."""
    import duckdb
    import pytest

    from setsketch_ray.functions.relational import rollup_aggregate

    rng = np.random.default_rng(19)
    n = 500
    t = pa.table({"a": pa.array(rng.choice(["x", "y"], n)),
                  "b": pa.array(rng.integers(0, 3, n), pa.int64()),
                  "v": pa.array(rng.integers(-50, 50, n), pa.int64())})
    got = rollup_aggregate(
        rd.from_arrow(t).repartition(4), ["a", "b"],
        {"s": ("sum", "v"), "n": ("count", None),
         "lo": ("min", "v"), "hi": ("max", "v")}) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(
        "SELECT a, b, CAST(sum(v) AS BIGINT) AS s, "
        "CAST(count(*) AS BIGINT) AS n, min(v) AS lo, max(v) AS hi "
        "FROM t GROUP BY ROLLUP(a, b) ORDER BY a, b").df()
    assert len(got) == len(exp)
    for c in ("s", "n", "lo", "hi"):
        assert got[c].tolist() == exp[c].tolist(), c
    with pytest.raises(ValueError, match="not re-combinable"):
        rollup_aggregate(rd.from_arrow(t), ["a"], {"m": ("mean", "v")})
    # CUBE adds the non-prefix set {b}: 2*3 + 2 + 3 + 1 rows
    from setsketch_ray.functions.relational import cube_aggregate

    cube = cube_aggregate(rd.from_arrow(t).repartition(4), ["a", "b"],
                          {"s": ("sum", "v")}).to_pandas()
    expc = con.sql(
        "SELECT a, b, CAST(sum(v) AS BIGINT) AS s FROM t "
        "GROUP BY CUBE(a, b) ORDER BY a, b, s").df()
    cube = cube.sort_values(["a", "b", "s"]).reset_index(drop=True)
    assert cube["s"].tolist() == expc["s"].tolist()


def test_bloom_anti_join_exact_even_with_tiny_filter(rd):
    """Bloom-prefiltered anti join == plain anti join, including with a
    deliberately tiny bitmap (high false-positive rate) — positives go
    through the exact confirm, so the result never degrades."""
    from setsketch_ray.functions.relational import bloom_anti_join

    rng = np.random.default_rng(17)
    left = pa.table({"k": pa.array(np.arange(2000), pa.int64()),
                     "x": pa.array(rng.integers(0, 9, 2000), pa.int64())})
    right = pa.table({"rk": pa.array(
        rng.choice(2000, 700, replace=False).astype(np.int64))})
    expect = sorted(set(range(2000)) - set(right["rk"].to_pylist()))
    for n_bits in (1 << 16, 256):          # roomy and saturated bitmaps
        out = pa.concat_tables(list(
            bloom_anti_join(rd.from_arrow(left).repartition(4),
                            rd.from_arrow(right).repartition(3),
                            "k", "rk", n_bits=n_bits, num_partitions=8)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
        assert sorted(out["k"].to_pylist()) == expect, n_bits


def test_heavy_hitters_exact_on_zipf(rd):
    """Two-pass MG heavy hitters return the EXACT top-N on a Zipf stream
    even when k << distinct (the decrement path runs), and raise when the
    certification bound cannot separate the tail."""
    from setsketch_ray.functions.relational import heavy_hitters

    rng = np.random.default_rng(16)
    vals = rng.zipf(1.5, size=40_000)
    vals = vals[vals < 100_000].astype(np.int64)
    t = pa.table({"v": pa.array(vals, pa.int64())})
    ds = rd.from_arrow(t).repartition(7)
    got = heavy_hitters(ds, "v", top_n=10, k=64)
    # exact reference: counts, ties broken by value ascending
    import collections
    cnt = collections.Counter(vals.tolist())
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got["v"].to_pylist() == [v for v, _ in exp]
    assert got["n"].to_pylist() == [c for _, c in exp]
    # k=2 on a heavy-tail stream cannot certify 10 ranks
    import pytest
    with pytest.raises(ValueError, match="not certifiable"):
        heavy_hitters(ds, "v", top_n=10, k=2)


def test_unpivot_wide_to_long(rd):
    """melt: k rows out per row in, verbatim value copies, id columns
    repeated, measure names cycling in declaration order."""
    from setsketch_ray.functions.relational import unpivot

    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "a": pa.array([0.1, 0.2]),
                  "b": pa.array([10.0, 20.0])})
    out = pa.concat_tables(list(
        unpivot(rd.from_arrow(t), ["id"], ["a", "b"])
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    assert out["id"].to_pylist() == [1, 1, 2, 2]
    assert out["measure"].to_pylist() == ["a", "b", "a", "b"]
    assert out["value"].to_pylist() == [0.1, 10.0, 0.2, 20.0]


def test_rolling_sum_matches_duckdb(rd):
    """Bounded moving sum == DuckDB ROWS BETWEEN window, with windows
    clamped at key starts and keys shorter than the window."""
    import duckdb

    from setsketch_ray.functions.streaming import rolling_sum

    rng = np.random.default_rng(20)
    n = 500
    t = pa.table({
        "k": pa.array(rng.integers(0, 30, n), pa.int64()),  # short keys
        "ts": pa.array(rng.integers(0, 40, n), pa.int64()),
        "tie": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.integers(-500, 500, n).astype(np.float64) / 100),
    })
    got = pa.concat_tables(list(
        rolling_sum(rd.from_arrow(t).repartition(5), "k", "ts", "v", "tie",
                    window_rows=3, num_partitions=8)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
        .to_pandas().sort_values("tie").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(
        "SELECT tie, CAST(sum(CAST(round(v * 100) AS BIGINT)) OVER "
        "(PARTITION BY k ORDER BY ts, tie "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS rc "
        "FROM t ORDER BY tie").df()
    assert got["rolling_c"].tolist() == exp["rc"].tolist()


def test_window_rank_matches_duckdb(rd):
    """Per-key ROW_NUMBER/PERCENT_RANK == DuckDB windows, with equal-ts
    ties pinned by the tiebreak and single-row keys emitting 0.0."""
    import duckdb

    from setsketch_ray.functions.streaming import window_rank

    rng = np.random.default_rng(15)
    n = 600
    keys = rng.integers(0, 25, n)
    keys[0] = 999                         # singleton key -> percent_rank 0.0
    t = pa.table({
        "k": pa.array(keys, pa.int64()),
        "ts": pa.array(rng.integers(0, 40, n), pa.int64()),  # heavy ties
        "tie": pa.array(np.arange(n), pa.int64()),
    })
    got = pa.concat_tables(list(
        window_rank(rd.from_arrow(t).repartition(5), "k", "ts", "tie",
                    num_partitions=8)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
        .to_pandas().sort_values("tie").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(
        "SELECT tie, row_number() OVER w AS rn, "
        "percent_rank() OVER w AS pr FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY ts, tie) ORDER BY tie").df()
    assert got["row_number"].tolist() == exp["rn"].tolist()
    assert np.array_equal(got["percent_rank"].to_numpy(),
                          exp["pr"].to_numpy())  # bit-exact IEEE division
    assert got.loc[got["k"] == 999, "percent_rank"].tolist() == [0.0]


def test_pivot_aggregate_matches_duckdb(rd):
    """Pivot counts and cent-exact pivot sums == DuckDB FILTER aggregates,
    including a pivot value absent from the data (all-zero column)."""
    import duckdb

    from setsketch_ray.functions.relational import pivot_aggregate

    rng = np.random.default_rng(14)
    n = 800
    t = pa.table({
        "k": pa.array(rng.integers(0, 37, n), pa.int64()),
        "p": pa.array(rng.choice(["a", "b", "c"], n)),
        "v": pa.array(rng.integers(0, 10_000, n).astype(np.float64) / 100),
    })
    pvs = ["a", "b", "c", "zzz"]          # zzz never occurs
    con = duckdb.connect()
    con.register("t", t)
    for value_col in (None, "v"):
        got = pivot_aggregate(rd.from_arrow(t).repartition(5), "k", "p",
                              pvs, value_col=value_col) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        def agg(pv):
            if value_col is None:
                return f"count(*) FILTER (WHERE p = '{pv}')"
            return ("coalesce(sum(CAST(round(v*100) AS BIGINT)) "
                    f"FILTER (WHERE p = '{pv}'), 0)/100.0")
        exp = con.sql(
            "SELECT k, " + ", ".join(
                f"{agg(pv)} AS n_{pv}" for pv in pvs)
            + " FROM t GROUP BY k ORDER BY k").df()
        assert got["k"].tolist() == exp["k"].tolist()
        for pv in pvs:
            assert np.array_equal(
                got[f"n_{pv}"].to_numpy().astype(np.float64),
                exp[f"n_{pv}"].to_numpy().astype(np.float64)), (value_col, pv)


def test_lag_lead_matches_duckdb(rd):
    """Per-key LAG/LEAD == DuckDB window, across partitions, with equal-ts
    ties pinned by the tiebreak column and nulls at key edges."""
    import duckdb

    from setsketch_ray.functions.streaming import lag_lead

    rng = np.random.default_rng(13)
    n = 500
    t = pa.table({
        "k": pa.array(rng.integers(0, 20, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 50, n), pa.int64()),  # heavy ties
        "tie": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.integers(0, 1000, n).astype(np.float64) / 100),
    })
    got = pa.concat_tables(list(
        lag_lead(rd.from_arrow(t).repartition(5), "k", "ts", "v", "tie",
                 num_partitions=8)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
        .to_pandas().sort_values("tie").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(
        "SELECT tie, lag(v) OVER w AS prev_value, "
        "lead(v) OVER w AS next_value FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY ts, tie) ORDER BY tie").df()
    for c in ("prev_value", "next_value"):
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        assert np.array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(a)
        assert np.array_equal(a[m], b[m])  # bit-exact copies


def test_grouped_quantiles_fixedpoint_matches_duckdb(rd):
    """Per-group distributed quantiles == DuckDB quantile_disc GROUP BY,
    including a singleton group and a group that is one heavy tie."""
    import duckdb

    from setsketch_ray.functions.relational import grouped_quantiles_fixedpoint

    rng = np.random.default_rng(12)
    n = 997
    keys = rng.choice(["a", "b", "c"], size=n).astype(object)
    vals = rng.integers(1, 10_000, size=n).astype(np.float64) / 100.0
    keys[0] = "solo"                      # singleton group
    vals[keys == "b"] = 3.33              # whole group one tie
    t = pa.table({"k": pa.array(list(keys)), "value": pa.array(vals)})
    qs = [0.1, 0.5, 0.9, 1.0]
    got = grouped_quantiles_fixedpoint(
        rd.from_arrow(t).repartition(6), "k", "value", qs, scale=100) \
        .to_pandas().sort_values(["k", "q"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(
        f"SELECT k, unnest({qs}) AS q, unnest(quantile_disc(value, {qs})) "
        "AS value FROM t GROUP BY k ORDER BY k, q").df()
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["q"].tolist() == exp["q"].tolist()
    assert got["value"].tolist() == exp["value"].tolist()  # bit-exact


def test_embedding_hot_bucket_stays_connected(rd):
    """>bucket_cap identical embeddings land in one LSH bucket in every
    table; star+chain keeps the cluster connected instead of dropping it."""
    from setsketch_ray.functions.dedup import embedding_near_dup_pairs
    from setsketch_ray.stages.cluster import cluster_edges

    rng = np.random.default_rng(9)
    n_hot = 30
    vecs = [list(map(float, np.ones(16)))] * n_hot
    ids = list(range(n_hot))
    for i in range(20):  # unrelated background vectors
        vecs.append(list(map(float, rng.standard_normal(16))))
        ids.append(n_hot + i)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32()))}))
    pairs = pa.concat_tables(list(
        embedding_near_dup_pairs(ds, cosine_threshold=0.99, n_bits=6,
                                 n_tables=4, bucket_cap=8)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    mapping = cluster_edges(pairs["id_a"].to_pylist(),
                            pairs["id_b"].to_pylist())
    roots = {mapping.get(i, i) for i in range(n_hot)}
    assert len(roots) == 1, f"hot bucket fragmented into {len(roots)}"
    # O(n) per bucket per table, not O(n^2)
    assert pairs.num_rows < 4 * (2 * n_hot)


def test_embedding_near_dup_hash_matches_broadcast(rd):
    """join_strategy='hash' (lookup_join vector attach) emits the identical
    pair set + bit-exact cosines as the broadcast-pool default."""
    from setsketch_ray.functions.dedup import embedding_near_dup_pairs

    rng = np.random.default_rng(17)
    base = rng.standard_normal((30, 24))
    vecs, ids = [], []
    for i in range(30):
        vecs.append(base[i])
        ids.append(2 * i)
        vecs.append(base[i] + 0.04 * rng.standard_normal(24))
        ids.append(2 * i + 1)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}))

    def run(strategy):
        t = pa.concat_tables(list(
            embedding_near_dup_pairs(ds, cosine_threshold=0.9, n_bits=6,
                                     n_tables=6, join_strategy=strategy)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
        return {(a, b): c for a, b, c in
                zip(t["id_a"].to_pylist(), t["id_b"].to_pylist(),
                    t["cosine"].to_pylist())}

    bc, hj = run("broadcast"), run("hash")
    assert bc.keys() == hj.keys() and len(bc) > 0
    for k in bc:
        assert bc[k] == hj[k]  # bit-exact


def test_asof_join_matches_pandas_merge_asof(rd):
    import pandas as pd

    from setsketch_ray.functions.relational import asof_join

    rng = np.random.default_rng(23)
    nl, nr = 400, 150
    lt = pa.table({
        "k": pa.array(rng.integers(0, 25, nl), pa.int64()),
        "t": pa.array(rng.integers(0, 1000, nl), pa.int64()),
        "lid": pa.array(np.arange(nl), pa.int64())})
    # right side with deliberate (k, t) ties — tie broken by greatest rid
    rt = pa.table({
        "k": pa.array(rng.integers(0, 20, nr), pa.int64()),
        "rt": pa.array(rng.integers(0, 1000, nr) // 50 * 50, pa.int64()),
        "rid": pa.array(np.arange(nr), pa.int64()),
        "w": pa.array([f"p{i}" for i in range(nr)])})

    out = pa.concat_tables(list(
        asof_join(rd.from_arrow(lt).repartition(5),
                  rd.from_arrow(rt).repartition(3),
                  on="k", left_ts="t", right_ts="rt",
                  right_cols=["rid", "w"], tie_col="rid",
                  num_partitions=8, how="inner")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))

    # reference: pandas merge on key with time filter, pick max (rt, rid)
    lp, rp = lt.to_pandas(), rt.to_pandas()
    m = lp.merge(rp, on="k")
    m = m[m["rt"] <= m["t"]]
    m = m.sort_values(["lid", "rt", "rid"]).groupby("lid").tail(1)
    exp = m[["k", "t", "lid", "rid", "w"]].reset_index(drop=True)
    got = out.to_pandas().sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values("lid").reset_index(drop=True)[exp.columns], exp)

    # left-outer keeps unmatched rows with nulls
    outl = pa.concat_tables(list(
        asof_join(rd.from_arrow(lt), rd.from_arrow(rt),
                  on="k", left_ts="t", right_ts="rt",
                  right_cols=["rid", "w"], tie_col="rid",
                  num_partitions=8, how="left")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    assert outl.num_rows == nl
    gotl = outl.to_pandas().sort_values("lid").reset_index(drop=True)
    matched = gotl["rid"].notna()
    assert matched.sum() == len(exp)
    pd.testing.assert_frame_equal(
        gotl[matched][exp.columns].reset_index(drop=True).astype(
            {"rid": np.int64}), exp)


def test_asof_join_empty_and_collision_guard(rd):
    import pytest as _pytest

    from setsketch_ray.functions.relational import asof_join

    lt = pa.table({"k": pa.array([1, 2], pa.int64()),
                   "t": pa.array([10, 20], pa.int64())})
    rt = pa.table({"k": pa.array([7], pa.int64()),
                   "rt": pa.array([5], pa.int64()),
                   "w": pa.array(["x"])})
    # disjoint keys -> empty inner result, schema preserved
    ds = asof_join(rd.from_arrow(lt), rd.from_arrow(rt), on="k",
                   left_ts="t", right_ts="rt", right_cols=["w"],
                   num_partitions=4)
    assert ds.count() == 0
    assert set(ds.schema().names) >= {"k", "t", "w"}

    with _pytest.raises(ValueError, match="collision"):
        asof_join(rd.from_arrow(lt), rd.from_arrow(rt), on="k",
                  left_ts="t", right_ts="rt", right_cols=["t"])


def test_range_join_aggregate_matches_pandas(rd):
    import pandas as pd

    from setsketch_ray.functions.relational import range_join_aggregate

    rng = np.random.default_rng(31)
    nl, nr = 300, 500
    lt = pa.table({"k": pa.array(rng.integers(0, 12, nl), pa.int64()),
                   "t": pa.array(rng.integers(0, 500, nl), pa.int64()),
                   "lid": pa.array(np.arange(nl), pa.int64())})
    rt = pa.table({"k": pa.array(rng.integers(0, 15, nr), pa.int64()),
                   "rt": pa.array(rng.integers(0, 500, nr), pa.int64()),
                   "v": pa.array(rng.integers(-50, 50, nr), pa.int64())})
    lo, hi = -40, 10          # window [t-40, t+10): spans both sides of t

    out = pa.concat_tables(list(
        range_join_aggregate(rd.from_arrow(lt).repartition(4),
                             rd.from_arrow(rt).repartition(3),
                             on="k", left_ts="t", right_ts="rt",
                             window=(lo, hi),
                             aggs={"n_w": ("count", None),
                                   "sum_v": ("sum", "v")},
                             num_partitions=8, how="left")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    assert out.num_rows == nl

    lp, rp = lt.to_pandas(), rt.to_pandas()
    m = lp.merge(rp, on="k", how="left")
    inw = (m["rt"] >= m["t"] + lo) & (m["rt"] < m["t"] + hi)
    m.loc[~inw.fillna(False), ["rt", "v"]] = np.nan
    g = m.groupby("lid").agg(n_w=("rt", "count"),
                             sum_v=("v", "sum")).reset_index()
    g["sum_v"] = g["sum_v"].fillna(0).astype(np.int64)
    g["n_w"] = g["n_w"].astype(np.int64)
    exp = lp.merge(g, on="lid").sort_values("lid").reset_index(drop=True)
    got = out.to_pandas().sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)

    # inner drops zero-count rows
    inner = pa.concat_tables(list(
        range_join_aggregate(rd.from_arrow(lt), rd.from_arrow(rt),
                             on="k", left_ts="t", right_ts="rt",
                             window=(lo, hi),
                             aggs={"n_w": ("count", None)},
                             num_partitions=8, how="inner")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    assert inner.num_rows == int((exp["n_w"] > 0).sum())


def test_hopping_window_aggregate_matches_bruteforce(rd):
    from setsketch_ray.functions.streaming import hopping_window_aggregate

    rng = np.random.default_rng(41)
    n = 400
    W, H = 100, 25                      # 4 windows per event
    ts = rng.integers(0, 2000, n).astype(np.int64)
    ts[0] = 0                           # exactly on a hop boundary
    ts[1] = 100                         # exactly on a window end
    key = rng.integers(0, 7, n).astype(np.int64)
    val = (rng.integers(0, 500, n) / 100.0)  # exact cents
    t = pa.table({"k": pa.array(key), 
                  "ts": pa.array(ts).cast(pa.timestamp("us")),
                  "v": pa.array(val)})
    out = hopping_window_aggregate(
        rd.from_arrow(t).repartition(5), key_col="k", ts_col="ts",
        window_us=W, hop_us=H, value_col="v", value_scale=100)
    ws_us = out["window_start"].cast(pa.int64()).to_pylist()
    got = {(k_, s_): (n_, v_) for k_, s_, n_, v_ in zip(
        out["k"].to_pylist(), ws_us, out["n_events"].to_pylist(),
        out["total_value_c"].to_pylist())}

    # brute force: every window start s (multiple of H), events with
    # s <= t < s+W
    from collections import defaultdict
    exp = defaultdict(lambda: [0, 0])
    for kk, tt, vv in zip(key, ts, val):
        s0 = tt // H * H
        for i in range(W // H):
            s = s0 - i * H
            exp[(kk, s)][0] += 1
            exp[(kk, s)][1] += round(vv * 100)
    assert len(got) == len(exp)
    for (kk, s), (c, sv) in exp.items():
        import datetime
        # window_start in got is a datetime from pyarrow -> compare via us
        match = [v for (gk, gs), v in got.items()
                 if gk == kk and int(gs) == s]
        assert match and match[0] == (c, sv), (kk, s, match, (c, sv))


def test_semi_anti_join_matches_pandas(rd):
    import pandas as pd

    from setsketch_ray.functions.relational import semi_anti_join

    rng = np.random.default_rng(53)
    lt = pa.table({"k": pa.array(rng.integers(0, 40, 300), pa.int64()),
                   "v": pa.array(rng.standard_normal(300))})
    # right with duplicate keys (membership only) and keys missing from left
    rt = pa.table({"rk": pa.array(rng.integers(20, 60, 500), pa.int64())})
    rset = set(rt["rk"].to_pylist())
    for mode in ("semi", "anti"):
        out = pa.concat_tables(list(
            semi_anti_join(rd.from_arrow(lt).repartition(4),
                           rd.from_arrow(rt).repartition(3),
                           "k", "rk", mode=mode, num_partitions=8)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
        lp = lt.to_pandas()
        keep = lp["k"].isin(rset) if mode == "semi" \
            else ~lp["k"].isin(rset)
        exp = lp[keep].sort_values(["k", "v"]).reset_index(drop=True)
        got = out.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)
    # empty right: semi -> nothing, anti -> everything
    rt0 = pa.table({"rk": pa.array([], pa.int64())})
    assert semi_anti_join(rd.from_arrow(lt), rd.from_arrow(rt0),
                          "k", "rk", mode="semi").count() == 0
    assert semi_anti_join(rd.from_arrow(lt), rd.from_arrow(rt0),
                          "k", "rk", mode="anti").count() == 300


def test_running_sum_matches_pandas(rd):
    import pandas as pd

    from setsketch_ray.functions.streaming import running_sum

    rng = np.random.default_rng(67)
    n = 500
    t = pa.table({
        "eid": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(rng.integers(0, 9, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 50, n).astype(np.int64))
              .cast(pa.timestamp("us")),   # heavy ts ties -> tiebreak matters
        "v": pa.array(rng.integers(-200, 200, n) / 100.0)})
    out = pa.concat_tables(list(
        running_sum(rd.from_arrow(t).repartition(5), key_col="k",
                    ts_col="ts", value_col="v", order_tiebreak="eid",
                    value_scale=100, num_partitions=8)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    got = out.to_pandas().sort_values("eid").reset_index(drop=True)

    lp = t.to_pandas().sort_values(["k", "ts", "eid"])
    lp["c"] = np.rint(lp["v"] * 100).astype(np.int64)
    lp["running_c"] = lp.groupby("k")["c"].cumsum()
    exp = lp.sort_values("eid").reset_index(drop=True)
    assert (got["running_c"].to_numpy()
            == exp["running_c"].to_numpy()).all()


def test_grouped_count_distinct_matches_pandas(rd):
    from setsketch_ray.functions.relational import grouped_count_distinct

    rng = np.random.default_rng(71)
    n = 3000
    t = pa.table({"k": pa.array(rng.integers(0, 8, n), pa.int64()),
                  "v": pa.array(rng.integers(0, 300, n), pa.int64())})
    got = grouped_count_distinct(rd.from_arrow(t).repartition(6),
                                 "k", "v", num_partitions=16)
    gm = dict(zip(got["k"].to_pylist(), got["n_distinct"].to_pylist()))
    exp = t.to_pandas().groupby("k")["v"].nunique().to_dict()
    assert gm == exp

    # string values too (different hash path)
    t2 = pa.table({"k": pa.array(rng.integers(0, 4, 800), pa.int64()),
                   "v": pa.array([f"u{i % 97}" for i in range(800)])})
    got2 = grouped_count_distinct(rd.from_arrow(t2), "k", "v",
                                  num_partitions=8)
    gm2 = dict(zip(got2["k"].to_pylist(), got2["n_distinct"].to_pylist()))
    exp2 = t2.to_pandas().groupby("k")["v"].nunique().to_dict()
    assert gm2 == exp2

    # composite (multi-column) group key — TPC-H Q16 shape
    t3 = pa.table({"a": pa.array(rng.integers(0, 3, 2000), pa.int64()),
                   "b": pa.array([f"g{i % 5}" for i in
                                  rng.integers(0, 5, 2000)]),
                   "v": pa.array(rng.integers(0, 60, 2000), pa.int64())})
    got3 = grouped_count_distinct(rd.from_arrow(t3).repartition(5),
                                  ["a", "b"], "v", num_partitions=16)
    gm3 = {(a, b): n for a, b, n in zip(got3["a"].to_pylist(),
                                        got3["b"].to_pylist(),
                                        got3["n_distinct"].to_pylist())}
    exp3 = t3.to_pandas().groupby(["a", "b"])["v"].nunique().to_dict()
    assert gm3 == exp3


def test_bottom_k_sample_deterministic_mergeable_accurate(rd):
    from setsketch_ray.functions.relational import (_KNUTH, bottom_k_sample)

    rng = np.random.default_rng(77)
    n, k = 50_000, 1024
    vals = rng.normal(100.0, 15.0, n).round(2)
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(vals, pa.float64())})

    # partitioning-invariant: identical sample under different block counts
    s1 = bottom_k_sample(rd.from_arrow(t).repartition(3), "id", k) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    s2 = bottom_k_sample(rd.from_arrow(t).repartition(11), "id", k) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert len(s1) == k and s1["id"].tolist() == s2["id"].tolist()

    # matches the SQL-expressible definition exactly
    h = (np.arange(n).astype(np.uint64) * np.uint64(_KNUTH)) \
        % np.uint64(1 << 32)
    expect = set(np.lexsort((np.arange(n), h))[:k].tolist())
    assert set(s1["id"].tolist()) == expect

    # mergeable: bottom-k of the two halves' bottom-k samples == direct
    a, b = t.slice(0, n // 2), t.slice(n // 2)
    sa = bottom_k_sample(rd.from_arrow(a), "id", k).to_pandas()
    sb = bottom_k_sample(rd.from_arrow(b), "id", k).to_pandas()
    un = np.concatenate([sa["id"].to_numpy(), sb["id"].to_numpy()])
    hu = (un.astype(np.uint64) * np.uint64(_KNUTH)) % np.uint64(1 << 32)
    merged = set(un[np.lexsort((un, hu))[:k]].tolist())
    assert merged == expect

    # rank accuracy of sampled quantiles: O(1/sqrt(k))
    sample_v = np.sort(s1["v"].to_numpy())
    full_sorted = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        est = sample_v[int(np.ceil(q * k)) - 1]
        true_rank = np.searchsorted(full_sorted, est, side="right") / n
        assert abs(true_rank - q) < 4.0 / np.sqrt(k), (q, true_rank)


def test_bloom_semi_prefilter_keeps_all_matches(rd):
    """Probe-side bloom prefilter: NO true match is ever dropped (bloom has
    no false negatives); survivors composed with the exact join equal the
    plain join result."""
    from setsketch_ray.functions.relational import (bloom_semi_prefilter,
                                                    lookup_join)

    rng = np.random.default_rng(83)
    left = pa.table({"k": pa.array(rng.integers(0, 10_000, 5000), pa.int64()),
                     "v": pa.array(np.arange(5000), pa.int64())})
    rkeys = np.unique(rng.integers(0, 10_000, 300))
    right = pa.table({"rk": pa.array(rkeys, pa.int64()),
                      "w": pa.array(rkeys * 7, pa.int64())})

    filtered = bloom_semi_prefilter(
        rd.from_arrow(left).repartition(4), rd.from_arrow(right),
        "k", "rk", n_bits=1 << 14)
    surv = filtered.to_pandas()
    matches = set(rkeys.tolist())
    # every true match survives
    lt = left.to_pandas()
    assert set(lt[lt["k"].isin(matches)]["v"]) <= set(surv["v"])

    joined = lookup_join(
        bloom_semi_prefilter(rd.from_arrow(left).repartition(4),
                             rd.from_arrow(right), "k", "rk",
                             n_bits=1 << 14),
        rd.from_arrow(right), "k", "rk",
        left_schema=left.schema, right_schema=right.schema) \
        .to_pandas().sort_values("v").reset_index(drop=True)
    plain = lookup_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", "rk",
        left_schema=left.schema, right_schema=right.schema) \
        .to_pandas().sort_values("v").reset_index(drop=True)
    assert joined["v"].tolist() == plain["v"].tolist()
    assert joined["w"].tolist() == plain["w"].tolist()


def test_stratified_sample_deterministic_and_exact(rd):
    from setsketch_ray.functions.relational import _KNUTH, stratified_sample

    rng = np.random.default_rng(79)
    n, k = 20_000, 64
    groups = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, n)]
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "g": pa.array(groups, pa.string()),
                  "v": pa.array(rng.normal(0, 1, n), pa.float64())})

    s1 = stratified_sample(rd.from_arrow(t).repartition(3), "g", "id", k) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    s2 = stratified_sample(rd.from_arrow(t).repartition(13), "g", "id", k) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert s1["id"].tolist() == s2["id"].tolist()
    assert (s1.groupby("g").size() == k).all()

    # matches the SQL-expressible definition: k hash-smallest ids per group
    h = (np.arange(n).astype(np.uint64) * np.uint64(_KNUTH)) \
        % np.uint64(1 << 32)
    expect = set()
    for g in "abcd":
        ids = np.flatnonzero(groups == g)
        expect.update(ids[np.lexsort((ids, h[ids]))[:k]].tolist())
    assert set(s1["id"].tolist()) == expect


def test_approx_distinct_by_accuracy(rd):
    from setsketch_ray.aggregates import approx_distinct_by

    rng = np.random.default_rng(73)
    # skewed per-key cardinalities: 10, 100, 2000
    ks, vs = [], []
    for key, card, reps in [("a", 10, 300), ("b", 100, 40), ("c", 2000, 3)]:
        vals = np.tile(np.arange(card), reps)
        ks += [key] * len(vals)
        vs += list(rng.permutation(vals))
    t = pa.table({"k": pa.array(ks), "v": pa.array(vs, pa.int64())})
    out = pa.concat_tables(list(
        approx_distinct_by(rd.from_arrow(t).repartition(7), "k", "v")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    got = dict(zip(out["k"].to_pylist(),
                   out["approx_n_distinct"].to_pylist()))
    for key, card in [("a", 10), ("b", 100), ("c", 2000)]:
        relerr = abs(got[key] - card) / card
        assert relerr < 0.12, (key, got[key], card)


def test_normalize_text_semantics(rd):
    from setsketch_ray.functions.text import normalize_text

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array([
                      "the quick a fox the",      # boundary words both ends
                      "a",                        # collapses to empty
                      "theater a cathedral",      # substrings NOT removed
                      ""])})
    out = pa.concat_tables(list(
        normalize_text(rd.from_arrow(t))
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    got = dict(zip(out["doc_id"].to_pylist(), out["norm_text"].to_pylist()))
    assert got == {1: "quick fox", 2: "", 3: "theater cathedral", 4: ""}


def test_window_cume_nth_matches_duckdb(rd):
    """cume_dist tie rule (ties on the order value ALONE share the value)
    and whole-partition nth_value (null when the key has < nth rows)."""
    rng = np.random.default_rng(29)
    n = 600
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b", "c"], n)),
        # coarse values force many ties
        "v": pa.array(rng.integers(0, 12, n).astype(np.float64)),
        "id": pa.array(np.arange(n), pa.int64())})
    # a 2-row key: nth=3 must be null there
    t = pa.concat_tables([t, pa.table({
        "k": pa.array(["zz", "zz"]), "v": pa.array([5.0, 1.0]),
        "id": pa.array([n, n + 1], pa.int64())})])
    from setsketch_ray.functions.streaming import window_cume_nth

    out = pa.concat_tables(list(
        window_cume_nth(rd.from_arrow(t).repartition(4), "k", "v", "id",
                        nth=3)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    import duckdb

    exp = duckdb.sql(
        "SELECT id, cume_dist() OVER (PARTITION BY k ORDER BY v) AS cd, "
        "nth_value(id, 3) OVER (PARTITION BY k ORDER BY v, id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nid "
        "FROM t ORDER BY id").df()
    assert (out["cume_dist"].to_numpy() == exp["cd"].to_numpy()).all()
    got_n = out["nth_id"].to_numpy()
    exp_n = exp["nid"].to_numpy()
    both_nan = np.isnan(got_n.astype(np.float64)) \
        & np.isnan(exp_n.astype(np.float64))
    assert np.all(both_nan | (got_n == exp_n))
    assert np.isnan(out.loc[out["id"] >= n, "nth_id"]).all()


def test_window_ntile_matches_sql_rule(rd):
    """ntile bucketing: first c%n tiles take one extra row; deterministic
    under the (order, tiebreak) total order; string keys supported."""
    rng = np.random.default_rng(23)
    n = 500
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b", "c"], n)),
        "v": pa.array(rng.integers(0, 50, n).astype(np.float64)),
        "id": pa.array(np.arange(n), pa.int64())})
    from setsketch_ray.functions.streaming import window_ntile

    out = pa.concat_tables(list(
        window_ntile(rd.from_arrow(t).repartition(4), "k", "v", "id", 4)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    import duckdb

    exp = duckdb.sql(
        "SELECT id, ntile(4) OVER (PARTITION BY k ORDER BY v, id) AS tile "
        "FROM t ORDER BY id").df()
    assert (out["tile"].to_numpy() == exp["tile"].to_numpy()).all()
    # tiny group: fewer rows than tiles -> one row per tile
    t2 = pa.table({"k": pa.array(["z", "z"]),
                   "v": pa.array([2.0, 1.0]),
                   "id": pa.array([0, 1], pa.int64())})
    out2 = pa.concat_tables(list(
        window_ntile(rd.from_arrow(t2), "k", "v", "id", 4)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    got = dict(zip(out2["id"].to_pylist(), out2["tile"].to_pylist()))
    assert got == {1: 1, 0: 2}


def test_grouped_mode_tiebreak_and_counts(rd):
    """Most frequent value per key; ties broken by smallest value."""
    rng = np.random.default_rng(29)
    n = 2000
    k = rng.integers(0, 40, n)
    v = rng.choice(["x", "y", "z", "w"], n)
    t = pa.table({"k": pa.array(k, pa.int64()), "v": pa.array(v)})
    from setsketch_ray.functions.relational import grouped_mode

    out = pa.concat_tables(list(
        grouped_mode(rd.from_arrow(t).repartition(6), "k", "v")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    import pandas as pd

    df = pd.DataFrame({"k": k, "v": v})
    cnt = df.groupby(["k", "v"]).size().reset_index(name="c")
    cnt = cnt.sort_values(["k", "c", "v"],
                          ascending=[True, False, True])
    exp = cnt.groupby("k").first().reset_index()
    assert (out["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert list(out["mode_value"]) == list(exp["v"])
    assert (out["cnt"].to_numpy() == exp["c"].to_numpy()).all()


def test_word_topk_exact_counts(rd):
    """Exact global top-k across the word-hash shuffle, ties by word asc."""
    docs = ["b b a", "a c  c", "", "c b", "d"] * 7    # double space -> empty
    t = pa.table({"text": pa.array(docs)})
    from setsketch_ray.functions.text import word_topk

    out = word_topk(rd.from_arrow(t).repartition(3), "text", k=3)
    # counts: a=14, b=21, c=21, d=7 -> top3 = b(21), c(21), a(14)
    assert out["word"].to_pylist() == ["b", "c", "a"]
    assert out["cnt"].to_pylist() == [21, 21, 14]


def test_distinctive_terms_tf_df_ranking(rd):
    """tf desc, df asc, word asc — one row per doc, integer-only ranking."""
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        # 'the' is frequent everywhere (high df); doc-specific terms win
        "text": pa.array(["the the cat cat cat",
                          "the dog dog bird",
                          "the the the"])})
    from setsketch_ray.functions.text import distinctive_terms

    out = pa.concat_tables(list(
        distinctive_terms(rd.from_arrow(t).repartition(2), "doc_id", "text")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc0: cat tf=3 > the tf=2 -> cat (df of cat = 1)
    # doc1: dog tf=2 > the/bird tf=1 -> dog
    # doc2: the tf=3, df=3
    assert list(out["word"]) == ["cat", "dog", "the"]
    assert list(out["tf"]) == [3, 2, 3]
    assert list(out["df"]) == [1, 1, 3]


def test_grouped_mode_string_keys(rd):
    """String grouping keys ride hash_str_u64 partitioning."""
    t = pa.table({"k": pa.array(["a", "a", "a", "b", "b"]),
                  "v": pa.array([3, 3, 1, 2, 1], pa.int64())})
    from setsketch_ray.functions.relational import grouped_mode

    out = pa.concat_tables(list(
        grouped_mode(rd.from_arrow(t).repartition(2), "k", "v")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == ["a", "b"]
    assert list(out["mode_value"]) == [3, 1]   # b ties 2/1 -> smallest value
    assert list(out["cnt"]) == [2, 1]


def test_funnel_users_order_and_strictness(rd):
    """Steps must occur strictly after the previous step's earliest hit;
    out-of-order and equal-timestamp events do not count."""
    import datetime as dt

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: clean funnel a -> b -> c
        (1, T(1), "a"), (1, T(2), "b"), (1, T(3), "c"),
        # user 2: b before a only -> no funnel
        (2, T(1), "b"), (2, T(2), "a"), (2, T(3), "c"),
        # user 3: b at SAME ts as first a -> strict > fails, later b ok
        (3, T(1), "a"), (3, T(1), "b"), (3, T(5), "b"), (3, T(6), "c"),
        # user 4: missing c
        (4, T(1), "a"), (4, T(2), "b"),
        # user 5: two a's; funnel anchors on the EARLIEST a
        (5, T(4), "a"), (5, T(2), "a"), (5, T(3), "b"), (5, T(9), "c"),
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "typ": pa.array([r[2] for r in rows])})
    from setsketch_ray.functions.streaming import funnel_users

    out = pa.concat_tables(list(
        funnel_users(rd.from_arrow(t).repartition(3), "u", "ts", "typ",
                     ["a", "b", "c"])
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
        .to_pandas().sort_values("u").reset_index(drop=True)
    assert list(out["u"]) == [1, 3, 5]
    assert list(out["ts_1_b"]) == [T(2), T(5), T(3)]
    # user 5's anchor is the earlier a at T(2), so b at T(3) qualifies
    assert out.loc[out["u"] == 5, "ts_0_a"].iloc[0] == T(2)


def test_approx_key_overlap_accuracy(rd):
    """Joint-estimator overlap of two key columns lands within the sketch's
    expected relative error of the exact intersection."""
    rng = np.random.default_rng(31)
    a = np.arange(0, 30_000, dtype=np.int64)            # A = [0, 30k)
    b = np.arange(20_000, 60_000, dtype=np.int64)       # B = [20k, 60k)
    # true: |A|=30k, |B|=40k, inter=10k, union=60k, J=1/6
    ta = pa.table({"k": pa.array(rng.permutation(a))})
    tb = pa.table({"k": pa.array(rng.permutation(b))})
    from setsketch_ray.aggregates import approx_key_overlap

    res = approx_key_overlap(rd.from_arrow(ta).repartition(4), "k",
                             rd.from_arrow(tb).repartition(4), "k")
    assert abs(res["card_left"] / 30_000 - 1) < 0.10
    assert abs(res["card_right"] / 40_000 - 1) < 0.10
    assert abs(res["intersection"] / 10_000 - 1) < 0.25
    assert abs(res["jaccard"] / (1 / 6) - 1) < 0.25
    # determinism: same input -> bit-identical estimate
    res2 = approx_key_overlap(rd.from_arrow(ta).repartition(2), "k",
                              rd.from_arrow(tb).repartition(7), "k")
    assert res2 == res


def test_semantic_dedup_planted(rd):
    """Planted near-duplicates drop to their base (keep-lowest-id rule);
    orthogonal-ish bases survive.  Clusters come from deterministic k-means,
    so the whole output is reproducible bit-for-bit."""
    from setsketch_ray.functions.dedup import semantic_dedup

    rng = np.random.default_rng(5)
    base = rng.standard_normal((30, 24))
    vecs, ids = [], []
    for i in range(30):
        vecs.append(base[i])
        ids.append(2 * i)
        vecs.append(base[i] + 0.02 * rng.standard_normal(24))  # near-dup
        ids.append(2 * i + 1)
    emb = pa.array([list(map(float, v)) for v in vecs],
                   pa.list_(pa.float32()))
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(ids, pa.int64()),
                                 "embedding": emb}))
    out = pa.concat_tables(list(
        semantic_dedup(ds, n_centroids=8, threshold=0.95)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    by_id = {v: (k, d) for v, k, d in zip(out["vec_id"].to_pylist(),
                                          out["kept"].to_pylist(),
                                          out["dup_of"].to_pylist())}
    assert len(by_id) == 60
    # the duplicate lands in the base's cluster (same direction), so every
    # odd id must be dropped onto its even base
    dropped = [i for i in ids if not by_id[i][0]]
    assert len(dropped) == 30
    for i in dropped:
        assert i % 2 == 1, "keep-lowest-id rule violated"
        assert by_id[i][1] == i - 1
    for i in range(30):
        assert by_id[2 * i][0] and by_id[2 * i][1] == -1


def test_ngram_contamination_planted(rd):
    from setsketch_ray.functions.text import ngram_contamination

    gram = "one two three four five six seven eight"
    docs = {
        0: "prefix words " + gram + " trailing tail",      # benchmark (0%13)
        1: "alpha " + gram + " beta gamma",                # contaminated
        2: "totally unrelated words with no overlap here at all",
        3: "short doc",                                    # < 8 tokens
        13: gram + " another benchmark entry",             # benchmark too
        14: gram,                                          # exactly 8 tokens
    }
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()), pa.string())})
    out = pa.concat_tables(list(
        ngram_contamination(rd.from_arrow(t), n=8, benchmark_mod=13)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    got = dict(zip(out["doc_id"].to_pylist(), out["n_shared"].to_pylist()))
    # benchmark docs never appear; doc 1 and 14 share exactly the one gram
    assert got == {1: 1, 14: 1}


def test_ngram_contamination_matches_duckdb(rd):
    """Random small corpus vs the exact SQL oracle the driver runs."""
    import duckdb

    from setsketch_ray.functions.text import ngram_contamination

    rng = np.random.default_rng(11)
    words = ["w%d" % i for i in range(40)]
    phrase = "p0 p1 p2 p3 p4 p5 p6 p7"  # planted shared 8-gram
    texts, ids = [], []
    for i in range(120):
        k = int(rng.integers(3, 30))
        body = " ".join(rng.choice(words, k))
        if i % 9 == 0:  # hits benchmark ids (i%13==0) and corpus ids alike
            body = body + " " + phrase
        texts.append(body)
        ids.append(i)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = pa.concat_tables(list(
        ngram_contamination(rd.from_arrow(t), n=8, benchmark_mod=13)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    got = sorted(zip(out["doc_id"].to_pylist(), out["n_shared"].to_pylist()))

    con = duckdb.connect()
    con.register("documents", t)
    exp = con.sql(
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
        "FROM documents), "
        "g AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g8 "
        "FROM toks, LATERAL (SELECT unnest(generate_series(1, "
        "greatest(len(t) - 7, 0))) AS i) s), "
        "bench AS (SELECT DISTINCT g8 FROM g WHERE doc_id % 13 = 0), "
        "gd AS (SELECT DISTINCT doc_id, g8 FROM g WHERE doc_id % 13 <> 0) "
        "SELECT doc_id, count(*) AS n_shared FROM gd JOIN bench USING (g8) "
        "GROUP BY doc_id ORDER BY doc_id").fetchall()
    assert got == [(int(a), int(b)) for a, b in exp]


def test_ngram_contamination_separate_benchmark_table(rd):
    """Production shape: benchmark grams from a SEPARATE small dataset —
    the big corpus is scanned once and corpus ids are never excluded."""
    from setsketch_ray.functions.text import ngram_contamination

    gram = "one two three four five six seven eight"
    corpus = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),  # 0 would be excluded
        "text": pa.array(["x " + gram + " y",       # in in-corpus mode
                          "clean words only here with nothing shared at all",
                          gram], pa.string())})
    bench = pa.table({"doc_id": pa.array([100], pa.int64()),
                      "text": pa.array(["pre " + gram + " post"],
                                       pa.string())})
    out = pa.concat_tables(list(
        ngram_contamination(rd.from_arrow(corpus), n=8,
                            benchmark_ds=rd.from_arrow(bench))
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    got = dict(zip(out["doc_id"].to_pylist(), out["n_shared"].to_pylist()))
    assert got == {0: 1, 2: 1}


def test_knn_stages_tolerate_empty_blocks(rd):
    """Filters/splits can hand map_batches an EMPTY block; the embedding
    scorers and semantic_dedup must pass it through instead of crashing
    (regression: _embedding_matrix indexed offsets[1] on empty input)."""
    from setsketch_ray.functions.dedup import semantic_dedup
    from setsketch_ray.functions.knn import knn_bruteforce

    rng = np.random.default_rng(2)
    emb = pa.array([list(map(float, rng.standard_normal(16)))
                    for _ in range(20)], pa.list_(pa.float32()))
    t = pa.table({"vec_id": pa.array(list(range(20)), pa.int64()),
                  "embedding": emb})
    # a filter that empties some blocks entirely
    ds = rd.from_arrow(t).repartition(8) \
        .filter(lambda r: r["vec_id"] < 5)
    top = knn_bruteforce(ds, query_vec_id=0, k=3)
    assert len(top) == 3
    out = pa.concat_tables(list(
        semantic_dedup(ds, n_centroids=2, threshold=0.99)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    assert out.num_rows == 5


def test_repetition_scores_gopher(rd):
    from setsketch_ray.functions.text import repetition_scores

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array([
                      # 6 words, top word 'a' x3; bigrams: "a a","a b",
                      # "b a","a c","c a" -> "a a" unique... none repeat
                      "a a b a c a",
                      # heavy bigram repetition: "x y" x3 of 5 bigrams
                      "x y x y x y",
                      "unique words only here",
                      "solo"])})
    out = repetition_scores(rd.from_arrow(t)).sort("doc_id").take_all()
    got = {r["doc_id"]: r for r in out}
    assert got[1]["n_words"] == 6
    # doc 1: 'a' appears 4 times (positions 0,1,3,5) -> floor(4e6/6+.5)
    assert got[1]["top_word_frac_e6"] == 666667
    # bigrams of doc1: aa ab ba ac ca -> all distinct except none
    assert got[1]["dup_bigram_frac_e6"] == 0
    assert got[2]["n_words"] == 6
    # 'x' and 'y' each x3 -> top 3/6
    assert got[2]["top_word_frac_e6"] == 500000
    # bigrams: xy yx xy yx xy -> xy x3 + yx x2, all 5 occurrences dup
    assert got[2]["dup_bigram_frac_e6"] == 1000000
    assert got[3]["top_word_frac_e6"] == 250000
    assert got[3]["dup_bigram_frac_e6"] == 0
    assert got[4]["n_words"] == 1
    assert got[4]["dup_bigram_frac_e6"] == 0  # no bigrams

    # empty batch passes through with a stable schema
    empty = rd.from_arrow(t.slice(0, 0))
    assert repetition_scores(empty).count() == 0


def test_read_corpus_wds_and_arrow_ipc(rd, tmp_path):
    """read_corpus dispatches .tar shard dirs to the WebDataset reader and
    .arrow/.feather files to a zero-copy IPC parse, values identical to
    the source table."""
    import pyarrow.ipc as ipc

    from setsketch_ray.sources.readers import read_corpus
    from setsketch_ray.sources.webdataset import write_wds_shards

    t = pa.table({"doc_id": pa.array([f"d{i}" for i in range(30)]),
                  "text": pa.array([f"text number {i}" for i in range(30)]),
                  "payload": pa.array([bytes([i]) * i for i in range(30)],
                                      pa.binary())})
    # WebDataset shards
    shard_dir = str(tmp_path / "shards")
    write_wds_shards(rd.from_arrow(t), shard_dir, key_col="doc_id",
                     components={"text": "txt", "payload": "bin"},
                     num_shards=3)
    back = read_corpus(shard_dir).sort("__key__").take_all()
    assert len(back) == 30
    want = {t["doc_id"][i].as_py(): (t["text"][i].as_py(),
                                     t["payload"][i].as_py())
            for i in range(30)}
    for r in back:
        txt, pl = want[r["__key__"]]
        assert r["txt"] == txt and r["bin"] == pl
    # column pruning through the dispatch
    only = read_corpus(shard_dir, columns=["__key__", "txt"]).take(1)[0]
    assert set(only.keys()) == {"__key__", "txt"}

    # Arrow IPC file (Feather v2)
    ipc_path = str(tmp_path / "corpus.arrow")
    with ipc.new_file(ipc_path, t.schema) as w:
        w.write_table(t)
    got = read_corpus(ipc_path).sort("doc_id").take_all()
    assert [r["doc_id"] for r in got] == \
        sorted(f"d{i}" for i in range(30))  # lexicographic
    by_id = {r["doc_id"]: r for r in got}
    assert by_id["d7"]["payload"] == bytes([7]) * 7
    assert by_id["d9"]["text"] == "text number 9"
    pruned = read_corpus(ipc_path, columns=["doc_id"]).take(1)[0]
    assert set(pruned.keys()) == {"doc_id"}


def test_global_prefix_sum_and_pack_sequences(rd):
    from setsketch_ray.functions.streaming import (
        global_prefix_sum,
        pack_sequences,
    )

    rng = np.random.default_rng(13)
    # non-contiguous, shuffled keys across many blocks
    keys = rng.permutation(np.arange(0, 3000, 3))
    vals = rng.integers(1, 500, len(keys))
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    ds = rd.from_arrow(t).repartition(8)
    out = global_prefix_sum(ds, "k", "v", out_col="cum",
                            num_partitions=16).sort("k").take_all()
    order = np.argsort(keys)
    want = np.cumsum(vals[order])
    got = np.array([r["cum"] for r in out])
    assert np.array_equal(got, want)
    # exclusive form
    out = global_prefix_sum(ds, "k", "v", out_col="cum", exclusive=True,
                            num_partitions=16).sort("k").take_all()
    assert np.array_equal(np.array([r["cum"] for r in out]), want - vals[order])

    # duplicate order keys refuse loudly
    bad = rd.from_arrow(pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                                  "v": pa.array([5, 5, 5], pa.int64())}))
    import pytest as _pt
    import ray.exceptions
    with _pt.raises((ValueError, ray.exceptions.RayTaskError)):
        global_prefix_sum(bad, "k", "v").take_all()

    # packing: chunk boundaries at the budget
    packed = pack_sequences(rd.from_arrow(t).repartition(4), "k", "v",
                            budget=1000, num_partitions=8) \
        .sort("k").take_all()
    starts = np.array([r["start_tok"] for r in packed])
    chunks = np.array([r["chunk_id"] for r in packed])
    assert np.array_equal(starts, want - vals[order])
    assert np.array_equal(chunks, starts // 1000)
    assert chunks[0] == 0 and chunks[-1] == starts[-1] // 1000


def test_scrub_pii(rd):
    from setsketch_ray.functions.text import scrub_pii

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array([
                      "mail a.b+c@ex-1.org and see https://x.y/z?q=1 now",
                      "digits 123456789 and 12345 stay short",
                      "no pii at all",
                      None])})
    out = {r["doc_id"]: r
           for r in scrub_pii(rd.from_arrow(t)).take_all()}
    assert out[1]["scrubbed"] == "mail <EMAIL> and see <URL> now"
    assert (out[1]["n_emails"], out[1]["n_urls"]) == (1, 1)
    # >=6 digits redact, 5 digits survive
    assert out[2]["scrubbed"] == "digits <NUM> and 12345 stay short"
    assert out[2]["n_nums"] == 1
    assert out[3]["scrubbed"] == "no pii at all"
    assert (out[3]["n_urls"], out[3]["n_emails"], out[3]["n_nums"]) == \
        (0, 0, 0)
    assert out[4]["scrubbed"] == ""  # null -> empty, stable schema


def test_mix_corpus_rates_and_caps(rd):
    from setsketch_ray.functions.relational import mix_corpus

    # 3 groups: a=600, b=300, c=100 rows; budget 400 at weights
    # a:0.25, b:0.25, c:0.5 -> target 100/100/200 but c caps at 100
    rows_g = [("a", 600), ("b", 300), ("c", 100)]
    keys, groups = [], []
    k = 0
    for g, n in rows_g:
        for _ in range(n):
            keys.append(k)
            groups.append(g)
            k += 1
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "g": pa.array(groups, pa.string())})
    out = mix_corpus(rd.from_arrow(t).repartition(4), "k", "g",
                     {"a": 0.25, "b": 0.25, "c": 0.5}, total=400) \
        .take_all()
    import collections
    got = collections.Counter(r["g"] for r in out)
    # c's rate caps at 1.0 -> ALL 100 rows kept deterministically
    assert got["c"] == 100
    # a,b expected 100 each (rate 1/6 and 1/3); Knuth hash is uniform
    assert 70 <= got["a"] <= 130 and 70 <= got["b"] <= 130, got
    # unknown group -> rate 0
    out2 = mix_corpus(rd.from_arrow(t), "k", "g", {"zzz": 1.0}, 100) \
        .take_all()
    assert out2 == []
    # deterministic across reruns
    out3 = mix_corpus(rd.from_arrow(t).repartition(4), "k", "g",
                      {"a": 0.25, "b": 0.25, "c": 0.5}, total=400) \
        .take_all()
    assert sorted(r["k"] for r in out3) == sorted(r["k"] for r in out)


def test_knn_bruteforce_batch_matches_single(rd):
    """The batched multi-query kNN agrees with knn_bruteforce per query
    and survives a group split across partitions."""
    from setsketch_ray.functions.knn import (
        knn_bruteforce,
        knn_bruteforce_batch,
    )

    rng = np.random.default_rng(3)
    n, d = 300, 16
    emb = rng.normal(size=(n, d)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "embedding": pa.array(list(emb),
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(6)
    qids = [0, 13, 250]
    batch = knn_bruteforce_batch(ds, qids, k=7).take_all()
    assert len(batch) == len(qids) * 7
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for q in qids:
        single = knn_bruteforce(rd.from_arrow(t), q, k=7)  # pa.Table
        want = list(zip(single["rank"].to_pylist(),
                        single["vec_id"].to_pylist()))
        assert sorted(by_q[q]) == sorted(want), q
    import pytest as _pt
    with _pt.raises(ValueError, match="not found"):
        knn_bruteforce_batch(ds, [0, 99999], k=3).take_all()


def test_knn_ivfpq_recall(rd, tmp_path):
    """IVF-PQ compressed probe (8-byte codes instead of 96-byte vectors)
    recovers the exact top-k on clustered vectors after the exact
    refinement pass, and is deterministic."""
    from setsketch_ray.functions.knn import (
        build_ivfpq_index,
        knn_bruteforce,
        knn_ivfpq_pruned,
    )

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 24)) * 4
    vecs = np.concatenate([
        centers[i % 8] + rng.standard_normal(24) * 0.4
        for i in range(400)]).reshape(400, 24)
    t = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                  "embedding": pa.array(list(vecs.astype(np.float32)))})
    ds = rd.from_arrow(t).repartition(4)
    root = str(tmp_path / "ivfpq")
    build_ivfpq_index(ds, root, n_centroids=16, m_sub=8, n_codes=32,
                      sample_cap=400)
    q = vecs[0]
    exact = knn_bruteforce(ds, query_vec_id=0, k=10)["vec_id"].to_pylist()
    got = knn_ivfpq_pruned(root, ds, q, k=10, n_probe=6, refine_factor=8,
                           exclude_id=0)
    ids = got["vec_id"].to_pylist()
    recall = len(set(exact) & set(ids)) / len(exact)
    assert recall >= 0.9, f"IVF-PQ recall {recall}"
    again = knn_ivfpq_pruned(root, ds, q, k=10, n_probe=6,
                             refine_factor=8, exclude_id=0)
    assert ids == again["vec_id"].to_pylist()
    # index really is compressed: codes are 8 bytes vs 96-byte f32 vectors
    import glob as _g
    import os as _os

    import pyarrow.parquet as _pq
    f = _g.glob(_os.path.join(root, "cell=*", "*.parquet"))[0]
    sch = _pq.ParquetFile(f).schema_arrow
    assert "embedding" not in sch.names and "code" in sch.names


def test_approx_quantiles_by_group(rd):
    """Per-group KLL quantiles: rank error within bound per group,
    exact per-group n, deterministic across reruns."""
    from setsketch_ray.functions.relational import approx_quantiles_by

    rng = np.random.default_rng(11)
    groups = np.repeat(np.array(["a", "b", "c"]), [40000, 25000, 8000])
    vals = np.concatenate([rng.lognormal(0, 1, 40000),
                           rng.normal(100, 5, 25000),
                           rng.uniform(-1, 1, 8000)])
    t = pa.table({"g": pa.array(groups), "v": pa.array(vals, pa.float64())})
    ds = rd.from_arrow(t).repartition(8)
    out = approx_quantiles_by(ds, "g", "v", [0.1, 0.5, 0.9]) \
        .sort(["g", "phi"]).take_all()
    assert len(out) == 9
    per_g = {"a": vals[:40000], "b": vals[40000:65000], "c": vals[65000:]}
    for r in out:
        xs = np.sort(per_g[r["g"]])
        assert r["n"] == len(xs)
        rank = np.searchsorted(xs, r["value"], side="right")
        assert abs(rank - r["phi"] * len(xs)) / len(xs) <= 0.02, r
    again = approx_quantiles_by(ds, "g", "v", [0.1, 0.5, 0.9]) \
        .sort(["g", "phi"]).take_all()
    assert again == out


def test_semantic_dedup_matches_naive_greedy(rd):
    """Single-cluster semantic_dedup == a naive per-row greedy reference
    (the chunked-matmul prune is an implementation of the same rule)."""
    from setsketch_ray.functions.dedup import semantic_dedup

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((120, 16))
    # densify similarity: mix rows toward a handful of shared directions
    basis = rng.standard_normal((5, 16))
    for i in range(120):
        vecs[i] = 0.4 * vecs[i] + basis[i % 5]
    ids = rng.permutation(120 * 3)[:120].astype(np.int64)
    emb = pa.array([list(map(float, v)) for v in vecs],
                   pa.list_(pa.float32()))
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(ids, pa.int64()),
                                 "embedding": emb}))
    out = pa.concat_tables(list(
        semantic_dedup(ds, n_centroids=1, threshold=0.9, prune_chunk=16)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    got = {v: (k, d) for v, k, d in zip(out["vec_id"].to_pylist(),
                                        out["kept"].to_pylist(),
                                        out["dup_of"].to_pylist())}

    # naive reference: ascending-id greedy, f32-packed then normalized
    # (the pipeline packs vectors <f4 through the exchange)
    m = np.asarray([list(map(np.float32, v)) for v in vecs], np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    order = np.argsort(ids, kind="stable")
    kept_rows, kept_ids = [], []
    want = {}
    for i in order:
        if kept_rows:
            sims = np.asarray(kept_rows) @ mn[i]
            j = int(np.argmax(sims))
            if sims[j] >= 0.9:
                want[int(ids[i])] = (False, int(kept_ids[j]))
                continue
        kept_rows.append(mn[i])
        kept_ids.append(int(ids[i]))
        want[int(ids[i])] = (True, -1)
    assert got == want


def test_semantic_dedup_split_oversized(rd):
    """Clusters above max_cluster_size get similarity-SPLIT (second-level
    k-means) before the per-group prune.  Partition-independent invariants
    must hold: no false merges across directions, every octet minimum
    kept, dedup quality stays near the unsplit run, fully deterministic —
    and the split path provably engages (output differs from the
    effectively-unsplit run)."""
    from setsketch_ray.functions.dedup import semantic_dedup

    rng = np.random.default_rng(13)
    base = rng.standard_normal((40, 24))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, ids = [], []
    nid = 0
    for i in range(40):
        for rep in range(8):
            vecs.append(base[i] + 0.01 * rng.standard_normal(24))
            ids.append(nid)
            nid += 1
    emb = pa.array([list(map(float, v)) for v in vecs],
                   pa.list_(pa.float32()))
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(ids, pa.int64()),
                                 "embedding": emb}))

    def run(mcs):
        return pa.concat_tables(list(
            semantic_dedup(ds, n_centroids=4, threshold=0.95,
                           max_cluster_size=mcs, sub_sample=64,
                           emit_group=True)
            .iter_batches(batch_format="pyarrow", batch_size=1 << 20))) \
            .sort_by("vec_id")

    out = run(32)
    assert out.num_rows == 320
    kept = np.asarray(out["kept"].to_pylist())
    dup_of = np.asarray(out["dup_of"].to_pylist())
    vid = np.asarray(out["vec_id"].to_pylist())
    # (1) no false merges: a dropped row only ever lands on its own
    # direction's octet (cross-direction cosine << 0.95)
    dropped = ~kept
    assert (dup_of[dropped] // 8 == vid[dropped] // 8).all()
    assert (dup_of[dropped] < vid[dropped]).all()
    # (2) each direction's minimum id is always kept
    assert kept[::8].all()
    # (3) boundary splits may keep a few extra reps, but dedup quality
    # stays: >= 75% of the 280 planted dups drop
    assert 40 <= kept.sum() <= 80
    # (4) deterministic end to end
    assert run(32).equals(out)
    # (5) the split path really engaged AND bounded the groups: every
    # final group (emit_group) is a split key with a bounded member count,
    # while the effectively-unsplit run keeps whole oversized clusters
    groups = np.asarray(out["group"].to_pylist())
    _, gcounts = np.unique(groups, return_counts=True)
    assert gcounts.max() <= 2 * 32  # salt estimate tolerance
    un = run(1 << 30)
    _, ucounts = np.unique(np.asarray(un["group"].to_pylist()),
                           return_counts=True)
    assert ucounts.max() > 32
    assert np.asarray(un["kept"].to_pylist()).sum() <= kept.sum()


def test_semantic_dedup_auto_centroids(rd):
    """n_centroids=None auto-scales with the corpus size (small corpus ->
    floor of 16) and keeps the planted-pair semantics: bases always
    survive, dropped copies land on their base, most pairs dedup (a pair
    straddling a k-means cluster boundary is legitimately missed —
    the SemDeDup trade)."""
    from setsketch_ray.functions.dedup import semantic_dedup

    rng = np.random.default_rng(5)
    base = rng.standard_normal((20, 24))
    rows = [(2 * i + j, base[i] + j * 0.02 * rng.standard_normal(24))
            for i in range(20) for j in (0, 1)]
    emb = pa.array([list(map(float, v)) for _, v in rows],
                   pa.list_(pa.float32()))
    ds = rd.from_arrow(pa.table(
        {"vec_id": pa.array([r[0] for r in rows], pa.int64()),
         "embedding": emb}))
    out = pa.concat_tables(list(
        semantic_dedup(ds, threshold=0.95)
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    kept = dict(zip(out["vec_id"].to_pylist(), out["kept"].to_pylist()))
    dup = dict(zip(out["vec_id"].to_pylist(), out["dup_of"].to_pylist()))
    assert all(kept[2 * i] for i in range(20))
    n_dropped = sum(1 for i in range(20) if not kept[2 * i + 1])
    assert n_dropped >= 15  # boundary-straddling pairs may survive
    for i in range(20):
        if not kept[2 * i + 1]:
            assert dup[2 * i + 1] == 2 * i


def _clustered_vectors(n, d=24, n_centers=8, seed=9):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, d)) * 4
    vecs = np.concatenate([
        centers[i % n_centers] + rng.standard_normal(d) * 0.4
        for i in range(n)]).reshape(n, d)
    return pa.table({"vec_id": pa.array(range(n), pa.int64()),
                     "embedding": pa.array(list(vecs.astype(np.float32)))})


def test_append_ivf_index_query_parity(rd, tmp_path):
    """Index freshness: build on part A, append part B — every probe must
    answer IDENTICALLY to a from-scratch build over A+B at the same
    centroids (appended rows land in the same cells and the probed-cell
    glob picks up the new files)."""
    from setsketch_ray.functions.knn import (
        append_ivf_index,
        build_ivf_index,
        knn_ivf_pruned,
    )

    t = _clustered_vectors(500)
    a = rd.from_arrow(t.slice(0, 400)).repartition(4)
    b = rd.from_arrow(t.slice(400)).repartition(2)
    both = rd.from_arrow(t).repartition(4)

    root_inc = str(tmp_path / "ivf_inc")
    build_ivf_index(a, root_inc, n_centroids=16)
    append_ivf_index(b, root_inc)

    cents = np.load(f"{root_inc}/_centroids.npy")
    root_full = str(tmp_path / "ivf_full")
    build_ivf_index(both, root_full, centroids=cents)

    for q in (0, 7, 450, 499):
        gi = knn_ivf_pruned(root_inc, query_vec_id=q, k=10, n_probe=6)
        gf = knn_ivf_pruned(root_full, query_vec_id=q, k=10, n_probe=6)
        assert gi["vec_id"].to_pylist() == gf["vec_id"].to_pylist(), q


def test_append_ivfpq_index_query_parity(rd, tmp_path):
    """IVF-PQ freshness: append encodes new rows with the EXISTING
    codebooks — probes over the grown index match a from-scratch encode of
    A+B under the same centroids+codebooks."""
    import shutil

    from setsketch_ray.functions.knn import (
        append_ivfpq_index,
        build_ivfpq_index,
        knn_ivfpq_pruned,
    )

    t = _clustered_vectors(500)
    a = rd.from_arrow(t.slice(0, 400)).repartition(4)
    b = rd.from_arrow(t.slice(400)).repartition(2)
    both = rd.from_arrow(t).repartition(4)

    root_inc = str(tmp_path / "pq_inc")
    build_ivfpq_index(a, root_inc, n_centroids=16, m_sub=8, n_codes=32,
                      sample_cap=400)
    append_ivfpq_index(b, root_inc)

    # from-scratch with the SAME trained state: re-encode everything by
    # appending A+B into an empty layout that carries the trained npy files
    root_full = str(tmp_path / "pq_full")
    import os

    os.makedirs(root_full)
    shutil.copy(f"{root_inc}/_centroids.npy", f"{root_full}/_centroids.npy")
    shutil.copy(f"{root_inc}/_codebooks.npy", f"{root_full}/_codebooks.npy")
    append_ivfpq_index(both, root_full)

    emb = t["embedding"]
    for q in (0, 7, 450, 499):
        qv = np.asarray(emb[q].as_py(), np.float64)
        gi = knn_ivfpq_pruned(root_inc, both, qv, k=10, n_probe=6,
                              exclude_id=q)
        gf = knn_ivfpq_pruned(root_full, both, qv, k=10, n_probe=6,
                              exclude_id=q)
        assert gi["vec_id"].to_pylist() == gf["vec_id"].to_pylist(), q


def test_refresh_ivf_index_improves_fit(rd, tmp_path):
    """The centroid-refresh job warm-starts Lloyd from the saved centroids
    over the grown corpus, rebuilds, and stays deterministic."""
    from setsketch_ray.functions.knn import (
        build_ivf_index,
        knn_ivf_pruned,
        refresh_ivf_index,
    )

    t = _clustered_vectors(500)
    a = rd.from_arrow(t.slice(0, 250)).repartition(2)
    both = rd.from_arrow(t).repartition(4)
    root = str(tmp_path / "ivf_r")
    build_ivf_index(a, root, n_centroids=16)
    old = np.load(f"{root}/_centroids.npy")
    new = refresh_ivf_index(both, root, n_iters=2)
    assert new.shape == old.shape and not np.array_equal(new, old)
    assert np.array_equal(np.load(f"{root}/_centroids.npy"), new)
    # the rebuilt layout answers probes over the full corpus
    got = knn_ivf_pruned(root, query_vec_id=499, k=5, n_probe=8)
    assert got.num_rows == 5


def test_semantic_dedup_empty_corpus(rd):
    """Empty input: auto-centroid mode returns an empty stable-schema
    result; explicit n_centroids raises the clear k-means error instead of
    an Arrow concat crash."""
    from setsketch_ray.functions.dedup import semantic_dedup
    from setsketch_ray.functions.knn import kmeans_centroids

    empty = rd.from_arrow(pa.table(
        {"vec_id": pa.array([], pa.int64()),
         "embedding": pa.array([], pa.list_(pa.float32()))}))
    out = semantic_dedup(empty, threshold=0.5)
    assert out.count() == 0
    assert out.schema().names == ["vec_id", "cluster", "kept", "dup_of"]
    with pytest.raises(ValueError, match="empty input"):
        kmeans_centroids(empty, 4)


def test_value_ranks_global_and_grouped(rd):
    """value_ranks == numpy searchsorted on the whole column, globally and
    per group, with targets inside, between and outside the value range."""
    from setsketch_ray.functions.relational import value_ranks

    rng = np.random.default_rng(21)
    groups = np.repeat(np.array(["x", "y"]), [3000, 2000])
    vals = np.concatenate([rng.integers(0, 50, 3000).astype(np.float64),
                           rng.normal(10, 3, 2000)])
    t = pa.table({"g": pa.array(groups), "v": pa.array(vals, pa.float64())})
    ds = rd.from_arrow(t).repartition(7)

    targets = [-5.0, 0.0, 10.0, 25.5, 49.0, 1e9]
    out = value_ranks(ds, "v", targets)
    xs = np.sort(vals)
    for i, tg in enumerate(targets):
        assert out["n_lt"][i].as_py() == np.searchsorted(xs, tg, "left")
        assert out["n_le"][i].as_py() == np.searchsorted(xs, tg, "right")

    per = {"x": [0.0, 10.0, 60.0], "y": [9.5, 20.0]}
    outg = value_ranks(ds, "v", per, key_col="g")
    assert outg.num_rows == 5
    ref = {"x": np.sort(vals[:3000]), "y": np.sort(vals[3000:])}
    for i in range(outg.num_rows):
        g = outg["g"][i].as_py()
        tg = per[g][outg["target_idx"][i].as_py()]
        assert outg["n_lt"][i].as_py() == np.searchsorted(ref[g], tg, "left")
        assert outg["n_le"][i].as_py() == np.searchsorted(ref[g], tg,
                                                          "right")


def test_tiered_dedup_planted_cascade(rd):
    """tiered_dedup: exact dups -> tier 1, high-Jaccard shingle near-dups
    -> tier 2, unique docs kept; equals the naive reference rule and is
    partitioning-invariant."""
    from setsketch_ray.functions.dedup import tiered_dedup

    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray yankee zulu").split()
    docs = {}
    rng = np.random.default_rng(5)
    for i in range(20):  # unique base docs, 40 tokens each
        docs[i] = " ".join(rng.choice(words, 40))
    docs[100] = docs[3]                       # exact dup -> tier 1
    docs[101] = docs[7]                       # exact dup -> tier 1
    # near dup: copy doc 5, change the last 4 tokens (high window overlap)
    tail = docs[5].split()
    tail[-4:] = ["zzz1", "zzz2", "zzz3", "zzz4"]
    docs[102] = " ".join(tail)
    ids = sorted(docs)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array([docs[i] for i in ids])})

    # naive reference
    def ref_tiers():
        t1 = {}
        seen = {}
        for i in ids:
            if docs[i] in seen:
                t1[i] = 1
            else:
                seen[docs[i]] = i
                t1[i] = 0
        surv = [i for i in ids if t1[i] == 0]

        def wins(s):
            tk = s.split()
            return {" ".join(tk[j:j + 16]) for j in range(len(tk) - 15)}

        tiers = dict(t1)
        for b in surv:
            for a in surv:
                if a >= b:
                    continue
                wa, wb = wins(docs[a]), wins(docs[b])
                inter = len(wa & wb)
                if inter and 2 * inter >= len(wa | wb):
                    tiers[b] = 2
                    break
        return tiers

    expect = ref_tiers()
    assert sorted(expect.values()).count(1) == 2
    assert sorted(expect.values()).count(2) >= 1

    for nparts in (1, 5):
        ds = rd.from_arrow(t).repartition(nparts)
        out = tiered_dedup(ds, "doc_id", "text").sort("doc_id").take_all()
        got = {r["doc_id"]: r["drop_tier"] for r in out}
        assert got == expect, (nparts, got, expect)


def test_train_bpe_sennrich_example():
    """train_bpe reproduces the canonical Sennrich et al. (2016) corpus:
    low x5, lower x2, newest x6, widest x3 — first merges are (e,s),
    (es,t), (est,</w>) and 'lowest' encodes to [low, est</w>]."""
    from setsketch_ray.functions.text import bpe_encode_word, train_bpe

    h = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    m = train_bpe(h, 10)
    assert m[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    ranks = {tuple(p): i for i, p in enumerate(m)}
    assert bpe_encode_word("lowest", ranks) == ["low", "est</w>"]
    # determinism: same histogram -> identical merge list
    assert train_bpe(dict(h), 10) == m


def test_bpe_token_counts_matches_naive(rd):
    """Distributed BPE pipeline == naive reference (train on the exact
    word histogram, encode each word greedily), partitioning-invariant."""
    from setsketch_ray.functions.text import (bpe_encode_word,
                                              bpe_token_counts, train_bpe)

    rng = np.random.default_rng(13)
    words = ["hash", "join", "merge", "sort", "scan", "batch", "stream",
             "window", "shuffle", "spill"]
    texts = [" ".join(rng.choice(words, rng.integers(5, 30)))
             for _ in range(200)]
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(texts)})

    hist: dict = {}
    for s in texts:
        for w in s.split():
            hist[w] = hist.get(w, 0) + 1
    merges = train_bpe(hist, 32)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    expect = [sum(len(bpe_encode_word(w, ranks)) for w in s.split())
              for s in texts]

    for nparts in (1, 6):
        ds = rd.from_arrow(t).repartition(nparts)
        out, m = bpe_token_counts(ds, "text", n_merges=32, concurrency=2)
        assert m == merges
        got = {r["doc_id"]: r["n_bpe_tokens"]
               for r in out.select_columns(
                   ["doc_id", "n_bpe_tokens"]).take_all()}
        assert [got[i] for i in range(200)] == expect


def test_inverted_index_phrase_search(rd, tmp_path):
    """Positional index phrase search == naive substring-of-token-list
    scan: 2-term, 3-term, duplicate-term and absent-term phrases,
    partitioning-invariant."""
    from setsketch_ray.functions.search import (build_inverted_index,
                                                phrase_search)

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = [" ".join(rng.choice(words, 30)) for _ in range(150)]
    texts[7] = "alpha alpha beta " + texts[7]     # duplicate-term phrase
    t = pa.table({"doc_id": pa.array(range(150), pa.int64()),
                  "text": pa.array(texts)})

    def naive(phrase):
        terms = phrase.split()
        hits = []
        for i, s in enumerate(texts):
            tk = s.split()
            if any(tk[j:j + len(terms)] == terms
                   for j in range(len(tk) - len(terms) + 1)):
                hits.append(i)
        return hits

    for nparts in (1, 4):
        root = str(tmp_path / f"idx{nparts}")
        ds = rd.from_arrow(t).repartition(nparts)
        build_inverted_index(ds, "doc_id", "text", root, num_buckets=8)
        for phrase in ["alpha beta", "beta gamma delta", "alpha alpha",
                       "zeta beta"]:
            got = sorted(r["doc_id"] for r in phrase_search(
                root, phrase, num_buckets=8).take_all())
            assert got == naive(phrase), (nparts, phrase)


def test_bigram_lm_stats_matches_naive(rd):
    """Distributed bigram LM == naive reference: counts, OOV under the
    top-K cap, e9-scaled probability sums and float logprob sums,
    partitioning-invariant."""
    import math

    from setsketch_ray.functions.text import _BG_SEP, bigram_lm_stats

    rng = np.random.default_rng(17)
    words = ["red", "green", "blue", "cyan", "teal", "plum"]
    texts = [" ".join(rng.choice(words, rng.integers(2, 40)))
             for _ in range(120)]
    t = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                  "text": pa.array(texts)})

    # naive reference with the same top-K rule
    uni: dict = {}
    bgc: dict = {}
    for s in texts:
        tk = s.split()
        for w in tk:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(tk, tk[1:]):
            bgc[(a, b)] = bgc.get((a, b), 0) + 1
    K = 12  # < 36 possible bigrams -> real OOV
    top = sorted(bgc.items(),
                 key=lambda kv: (-kv[1], kv[0][0] + _BG_SEP + kv[0][1]))[:K]
    v = len(uni)
    pe9 = {ab: int(math.floor((c + 1) / (uni[ab[0]] + v) * 1e9 + 0.5))
           for ab, c in top}

    def ref(s):
        tk = s.split()
        nb = len(tk) - 1
        oov = sp = 0
        lp = 0.0
        for ab in zip(tk, tk[1:]):
            if ab in pe9:
                sp += pe9[ab]
                lp += math.log(pe9[ab] * 1e-9)
            else:
                oov += 1
        return nb, oov, sp, lp

    for nparts in (1, 5):
        ds = rd.from_arrow(t).repartition(nparts)
        scored, table = bigram_lm_stats(ds, "text", top_bigrams=K,
                                        concurrency=2)
        assert table == {a + _BG_SEP + b: x for (a, b), x in pe9.items()}
        rows = {r["doc_id"]: r for r in scored.take_all()}
        for i, s in enumerate(texts):
            nb, oov, sp, lp = ref(s)
            r = rows[i]
            assert (r["n_bigrams"], r["n_oov"], r["sum_p_e9"]) == \
                (nb, oov, sp), i
            assert abs(r["logprob_sum"] - lp) < 1e-9, i


def test_ssjoin_exact_vs_bruteforce(rd):
    """ssjoin_jaccard_pairs equals brute-force exact Jaccard over the same
    caption_shingles gram sets — pairs AND (n_shared, n_union) — at three
    thresholds, across a partitioned input (prefix + length + positional
    filters must all be exactness-preserving)."""
    from setsketch_ray.functions.dedup import ssjoin_jaccard_pairs
    from setsketch_ray.stages.shingle import caption_shingles

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
             "theta", "iota", "kappa", "the", "a", "and", "row", "scan",
             "merge", "sort", "hash", "join", "table"]
    docs = [" ".join(rng.choice(vocab, rng.integers(8, 30)))
            for _ in range(120)]
    for i in range(0, 30, 3):           # planted near-dups: one-word edit
        w = docs[i].split()
        if len(w) > 2:
            w[1] = "edited"
        docs.append(" ".join(w))
    docs.append("")                      # empty doc: no grams, no pairs
    docs.append("the a and of")          # all-stopword doc: empty gram set
    ids = list(range(len(docs)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(docs)})

    vals, offs = caption_shingles(t["text"])
    sets = [set(vals[offs[i]:offs[i + 1]].tolist()) for i in ids]
    ds = rd.from_arrow(t).repartition(6)
    for num, den in [(1, 2), (17, 20), (1, 3)]:
        truth = {}
        for i in ids:
            for j in ids[i + 1:]:
                s = len(sets[i] & sets[j])
                u = len(sets[i] | sets[j])
                if u > 0 and den * s >= num * u:
                    truth[(i, j)] = (s, u)
        out = ssjoin_jaccard_pairs(ds, "doc_id", "text", jaccard_num=num,
                                   jaccard_den=den).to_pandas()
        got = {(int(r.id_a), int(r.id_b)): (int(r.n_shared), int(r.n_union))
               for r in out.itertuples()}
        assert got == truth, (num, den)


def test_ssjoin_empty_corpus(rd):
    from setsketch_ray.functions.dedup import ssjoin_jaccard_pairs

    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    out = ssjoin_jaccard_pairs(rd.from_arrow(t), "doc_id", "text")
    # NB: Dataset.to_pandas drops columns entirely on 0-row datasets (known
    # Ray behavior) — the stable contract is schema() + count()
    assert out.count() == 0
    assert out.schema().names == ["id_a", "id_b", "n_shared", "n_union"]


def test_validate_table_rules(rd):
    """Every rule kind of functions/validate.validate_table on a toy table
    with known violations: null id, duplicate key, out-of-range values,
    out-of-set category, regex mismatch, dangling FK."""
    from setsketch_ray.functions.validate import validate_table

    t = pa.table({
        "id": [1, 2, 3, 4, 5, 5, 7, None],
        "qty": [1.0, 50.0, 51.0, -1.0, 10.0, 10.0, None, 3.0],
        "flag": ["A", "N", "R", "A", "N", "X", None, "A"],
        "code": ["ab", "cd", "e1", "zz", "ab", "cd", "ab", "q!"],
    })
    ds = rd.from_arrow(t).repartition(3)
    ref = rd.from_arrow(pa.table({"rid": [1, 2, 3, 4, 7]}))
    res = validate_table(ds, [
        ("not_null", "id"),
        ("range", "qty", 0.0, 50.0),
        ("in_set", "flag", ["A", "N", "R"]),
        ("regex", "code", "[a-z]{2}"),
        ("unique", ["id"]),
        ("fk", "id", "ref", "rid"),
    ], refs={"ref": ref})
    rows = {(r["rule"], r["col"]): (r["n_checked"], r["n_violations"],
                                    r["ok"]) for r in res.to_pylist()}
    assert rows[("not_null", "id")] == (8, 1, 0)
    assert rows[("range", "qty")] == (7, 2, 0)            # 51, -1
    assert rows[("in_set", "flag")] == (7, 1, 0)          # X (null skipped)
    assert rows[("regex", "code")] == (8, 2, 0)           # e1, q!
    # distinct ids: {1,2,3,4,5,7,null} -> 7 of 8
    assert rows[("unique", "id")] == (8, 1, 0)
    # non-null ids 1,2,3,4,5,5,7; 5 has no ref match (x2)
    assert rows[("fk", "id->ref.rid")] == (7, 2, 0)

    # all-clean rules report ok=1
    clean = validate_table(ds, [("regex", "code", ".*")])
    assert clean.to_pylist()[0]["ok"] == 1


def test_word_freq_cms_certificates(rd):
    """word_freq_cms: exact counts match a local wordcount; both CMS
    certificates hold; estimates are deterministic across block layouts."""
    from collections import Counter

    from setsketch_ray.functions.text import word_freq_cms

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(500)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(5, 40)))
            for _ in range(300)]
    exact = Counter(w for d in docs for w in d.split())
    t = pa.table({"text": docs})
    for parts in (2, 7):
        res = word_freq_cms(rd.from_arrow(t).repartition(parts),
                            "text", k=15).to_pylist()
        assert len(res) == 15
        top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
        assert [(r["word"], r["cnt"]) for r in res] == top
        assert all(r["over_ok"] == 1 and r["bound_ok"] == 1 for r in res)


def test_diff_tables_classification(rd):
    """diff_tables: added/removed/changed/unchanged over int AND string
    keys, against a brute-force dict diff; per-key rows, exactly one row
    per distinct key."""
    from setsketch_ray.functions.diff import diff_tables

    rng = np.random.default_rng(11)
    n = 500
    keys = np.arange(n, dtype=np.int64)
    vals = rng.integers(0, 1000, n)
    a = pa.table({"k": keys, "v": vals,
                  "s": [f"s{v}" for v in vals]})
    # b: drop k%7==0, change v of k%5==0, add 100 new keys
    mask = keys % 7 != 0
    bk = keys[mask]
    bv = vals[mask].copy()
    bv[bk % 5 == 0] += 1
    bk = np.concatenate([bk, np.arange(n, n + 100, dtype=np.int64)])
    bv = np.concatenate([bv, np.zeros(100, np.int64)])
    b = pa.table({"k": bk, "v": bv, "s": [f"s{v}" for v in bv]})

    out = diff_tables(rd.from_arrow(a).repartition(4),
                      rd.from_arrow(b).repartition(3),
                      "k", ["v", "s"], num_partitions=8)
    got = {r["k"]: r["status"] for r in out.take_all()}
    assert len(got) == len(set(keys) | set(bk.tolist()))
    for k in range(n):
        if k % 7 == 0:
            assert got[k] == "removed"
        elif k % 5 == 0:
            assert got[k] == "changed"
        else:
            assert got[k] == "unchanged"
    assert all(got[k] == "added" for k in range(n, n + 100))

    # string keys ride the same path
    sa = pa.table({"k": ["a", "b", "c"], "v": [1, 2, 3]})
    sb = pa.table({"k": ["b", "c", "d"], "v": [2, 9, 4]})
    got2 = {r["k"]: r["status"] for r in diff_tables(
        rd.from_arrow(sa), rd.from_arrow(sb), "k", ["v"]).take_all()}
    assert got2 == {"a": "removed", "b": "unchanged",
                    "c": "changed", "d": "added"}


def test_zscore_outliers_matches_numpy(rd):
    """zscore_outliers == brute-force |v - mean| > 3*sigma_pop per group
    (population sigma, division-free integer/float-parity form)."""
    from setsketch_ray.functions.validate import zscore_outliers

    rng = np.random.default_rng(3)
    g = np.repeat(["a", "b", "c"], 400)
    v = rng.integers(90, 110, 1200).astype(np.int64)
    v[::97] += 300                      # planted outliers
    t = pa.table({"g": g, "v": v})
    out = zscore_outliers(rd.from_arrow(t).repartition(5), "g", "v",
                          k_sigma=3.0)
    got = {r["g"]: (r["n"], r["n_outliers"]) for r in out.to_pylist()}
    for key in ("a", "b", "c"):
        vals = v[g == key].astype(np.float64)
        mu, sd = vals.mean(), vals.std()
        expect = int((np.abs(vals - mu) > 3.0 * sd).sum())
        assert got[key] == (len(vals), expect)


def test_containment_pairs_directional(rd):
    """containment_pairs: a short doc fully embedded in a much longer one
    is found in the contained->container direction only (Jaccard would
    miss it); unrelated docs stay out; scores are exact."""
    from setsketch_ray.functions.dedup import containment_pairs

    core = " ".join(f"tok{i}" for i in range(30))          # 30 tokens
    filler = " ".join(f"pad{i}" for i in range(300))       # long wrapper
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([core,                       # contained
                          filler + " " + core + " " + filler,  # container
                          " ".join(f"z{i}" for i in range(100))],
                         pa.string())})
    out = containment_pairs(rd.from_arrow(t).repartition(2), "doc_id",
                            "text", window=16, num=9, den=10,
                            num_partitions=4).take_all()
    got = {(r["id_a"], r["id_b"]): (r["shared_w"], r["n_w_a"])
           for r in out}
    # doc 1 has 15 distinct 16-token windows, all inside doc 2
    assert got == {(1, 2): (15, 15)}


def test_embedding_gram_exact_and_layout_independent(ray_session):
    """embedding_gram == single-shot numpy Gram over fixed ints, identical
    at different block layouts (int64 partials are association-free)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.functions.knn import embedding_gram

    rng = np.random.default_rng(17)
    n, d = 257, 9
    emb = rng.normal(scale=0.3, size=(n, d)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), pa.float32()), d).cast(
                pa.list_(pa.float32()))})
    c = np.floor(emb.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    want = c.T @ c
    results = []
    for blocks in (1, 7):
        ds = rd.from_arrow(t).repartition(blocks)
        got = embedding_gram(ds, "embedding").sort_by(
            [("i", "ascending"), ("j", "ascending")])
        results.append(got)
        iu, ju = got["i"].to_numpy(), got["j"].to_numpy()
        assert (got["sumprod_c"].to_numpy() == want[iu, ju]).all()
        diag = iu == ju
        assert (got["sum_i_c"].to_numpy()[diag] == c.sum(axis=0)).all()
        assert (got["sum_i_c"].to_numpy()[~diag] == 0).all()
        assert got["n"].to_numpy().sum() == n
    assert results[0].equals(results[1])


def test_grouped_mad_fixedpoint_bruteforce(ray_session):
    """grouped_mad == per-group numpy median/MAD under the quantile_disc
    rule (index ceil(0.5 n)-1 of the sorted values)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.functions.relational import grouped_mad_fixedpoint

    rng = np.random.default_rng(23)
    keys = rng.choice(["a", "b", "c"], size=501)
    vals = np.round(rng.normal(10, 3, size=501) * 100) / 100

    def disc_median(x):
        xs = np.sort(x)
        return xs[int(np.ceil(0.5 * len(xs))) - 1]

    ds = rd.from_arrow(pa.table({"k": pa.array(keys),
                                 "value": pa.array(vals, pa.float64())}))
    got = grouped_mad_fixedpoint(ds, "k", "value", scale=100)
    for row in got.to_pylist():
        x = np.round(vals[keys == row["k"]] * 100).astype(np.int64)
        m = disc_median(x)
        assert row["median_c"] == m
        assert row["mad_c"] == disc_median(np.abs(x - m))


def test_debounce_bruteforce(ray_session):
    """debounce == per-group LAG filter computed brute-force; ties at
    equal ts resolve by the tiebreak column; layout independent."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.functions.streaming import debounce

    rng = np.random.default_rng(31)
    n = 400
    keys = rng.choice(["u1", "u2", "u3"], size=n)
    types = rng.choice(["a", "b"], size=n)
    ts = np.sort(rng.integers(0, 10_000, size=n)).astype("datetime64[s]") \
        .astype("datetime64[us]")
    eid = np.arange(n)
    rng.shuffle(eid)  # tiebreak column not in ts order

    rows = sorted(zip(keys, types, ts, eid),
                  key=lambda r: (r[0], r[1], r[2], r[3]))
    win = np.timedelta64(300, "s")
    want = set()
    prev = {}
    for k, ty, t, e in rows:
        p = prev.get((k, ty))
        if p is None or t - p > win:
            want.add(int(e))
        prev[(k, ty)] = t

    t_in = pa.table({"user": pa.array(keys), "etype": pa.array(types),
                     "ts": pa.array(ts, pa.timestamp("us")),
                     "event_id": pa.array(eid, pa.int64())})
    for blocks in (1, 5):
        ds = rd.from_arrow(t_in).repartition(blocks)
        out = debounce(ds, ["user", "etype"], "ts", "event_id", 300.0)
        got = {r["event_id"] for r in out.take_all()}
        assert got == want


def test_arrow_ipc_shard_roundtrip(ray_session, tmp_path):
    """write_arrow_shards -> read_corpus dir dispatch: lossless typed
    round trip, deterministic shard bytes on rewrite."""
    import hashlib
    import os
    import shutil

    import ray.data as rd

    from setsketch_ray.sources.arrow_ipc import write_arrow_shards
    from setsketch_ray.sources.readers import read_corpus

    t = pa.table({
        "doc_id": pa.array(range(37), pa.int64()),
        "text": pa.array([f"body {i}" for i in range(37)]),
        "score": pa.array(np.linspace(-1, 1, 37), pa.float64())})
    root = str(tmp_path / "ipc")
    m = write_arrow_shards(rd.from_arrow(t), root, "doc_id", num_shards=3)
    assert sum(r["n_rows"] for r in m) == 37
    back = pa.concat_tables(list(read_corpus(root).iter_batches(
        batch_format="pyarrow", batch_size=1 << 20))).sort_by("doc_id")
    assert back.equals(t)
    got2 = pa.concat_tables(list(
        read_corpus(root, columns=["doc_id"]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))
    assert got2.column_names == ["doc_id"]

    def hashes():
        return {n: hashlib.sha1(
            open(os.path.join(root, n), "rb").read()).hexdigest()
            for n in sorted(os.listdir(root))}

    h1 = hashes()
    shutil.rmtree(root)
    write_arrow_shards(rd.from_arrow(t), root, "doc_id", num_shards=3)
    assert hashes() == h1


def test_cdc_chunk_stats_bruteforce(ray_session):
    """cdc_chunk_stats == brute-force content-defined chunking: boundary
    after a word matching the regex; insertion-stability demonstrated
    (chunks after the insertion point are unchanged)."""
    import re

    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.functions.dedup import cdc_chunk_stats

    docs = {1: "foo bar baza qux nee",   # baza ends 'a' -> boundary
            2: "tip baza qux nee",
            3: "foo bar baza tip extra"}

    def chunks_of(text):
        out, cur = [], []
        for w in text.split():
            cur.append(w)
            if re.search("[aeiou]$", w):
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    want = {}
    for d, text in docs.items():
        for c in chunks_of(text):
            occ, ds_ = want.get(c, (0, set()))
            ds_.add(d)
            want[c] = (occ + 1, ds_)

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()))})).repartition(2)
    got = cdc_chunk_stats(ds, top_k=100)
    assert got["total_chunks"][0].as_py() == sum(
        v[0] for v in want.values())
    assert got["distinct_chunks"][0].as_py() == len(want)
    rows = {r["chunk"]: (r["n_occ"], r["n_docs"])
            for r in got.to_pylist()}
    assert rows == {c: (occ, len(dset)) for c, (occ, dset) in want.items()}
    # insertion stability: "qux nee" appears in docs 1 AND 2 even though
    # doc 2's prefix differs — a fixed-size blocker would have missed it
    assert rows["qux nee"] == (2, 2)


def test_gear_cdc_properties(ray_session):
    """Gear CDC: vectorized == scalar reference, boundaries respect
    min/max, chunks reassemble, insertion stability, corpus stats find
    the planted duplicate blob."""
    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.functions.dedup import (_gear_hashes_scalar,
                                               cdc_bytes_stats,
                                               gear_cdc_boundaries,
                                               gear_hashes)

    rng = np.random.default_rng(13)
    d = rng.integers(0, 256, 30_000, dtype=np.uint8).tobytes()
    assert (gear_hashes(d) == _gear_hashes_scalar(d)).all()

    cuts = gear_cdc_boundaries(d, avg_bits=9)
    sizes = np.diff(np.concatenate([[0], cuts]))
    assert int(cuts[-1]) == len(d)
    assert (sizes <= 4 * 512).all() and (sizes[:-1] >= 512 // 4).all()

    # insertion stability: cuts after the edit realign (shifted) exactly
    cuts2 = gear_cdc_boundaries(b"PREFIX!!" + d, avg_bits=9)
    tail = {int(c) for c in cuts}
    tail2 = {int(c) - 8 for c in cuts2}
    assert len(tail & tail2) >= len(tail) - 4

    # corpus stats: one blob duplicated 3x -> distinct < total by >= its
    # chunk count; certificates all pass
    blobs = [d, d, d,
             rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes()]
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array(range(4), pa.int64()),
        "bytes": pa.array(blobs, pa.binary())})).repartition(2)
    res = cdc_bytes_stats(ds, "image_id", "bytes", avg_bits=9,
                          scalar_check_mod=1)
    assert res["n_blobs"] == 4
    assert res["reassembly_ok"] and res["bounds_ok"] \
        and res["vec_scalar_ok"]
    assert res["total_chunks"] - res["distinct_chunks"] >= 2 * len(cuts)
    assert res["total_bytes"] == sum(len(b) for b in blobs)
    assert res["distinct_bytes"] <= res["total_bytes"] - 2 * len(d)


def test_skyline_matches_bruteforce(rd):
    """skyline == brute-force Pareto frontier on distinct points, across
    min/max direction mixes and a multi-block layout (merge exactness)."""
    from setsketch_ray.functions.relational import skyline

    rng = np.random.default_rng(7)
    x = rng.integers(0, 40, 600).astype(np.int64)
    y = rng.integers(0, 40, 600).astype(np.int64)
    z = rng.integers(0, 8, 600).astype(np.int64)
    t = pa.table({"x": x, "y": y, "z": z})
    for dims in ([("x", "min"), ("y", "max")],
                 [("x", "max"), ("y", "min"), ("z", "max")]):
        got = skyline(rd.from_arrow(t).repartition(7), dims)
        sign = np.array([1 if s == "min" else -1 for _, s in dims])
        pts = np.unique(
            np.stack([t[c].to_numpy() for c, _ in dims], 1) * sign, axis=0)
        dom = ((pts[None, :, :] <= pts[:, None, :]).all(2)
               & (pts[None, :, :] < pts[:, None, :]).any(2)).any(1)
        want = pts[~dom] * sign
        have = np.stack([got[c].to_numpy() for c, _ in dims], 1)
        assert np.array_equal(np.sort(have, 0), np.sort(want, 0))


def test_grid_radius_pairs_bruteforce(rd):
    """grid_radius_pairs == brute-force within-radius pair set for both
    metrics, across a multi-block layout, with coordinate ties and
    cell-border points present."""
    from setsketch_ray.functions.spatial import grid_radius_pairs

    rng = np.random.default_rng(11)
    n, r = 900, 50
    x = rng.integers(0, 2000, n).astype(np.int64)
    y = rng.integers(0, 2000, n).astype(np.int64)
    x[::37] = (x[::37] // r) * r            # exact cell borders
    x[1] , y[1] = x[0], y[0]                # duplicate coordinates
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    t = pa.table({"id": ids, "x": x, "y": y})
    dx = np.abs(x[:, None] - x[None, :])
    dy = np.abs(y[:, None] - y[None, :])
    for metric in ("linf", "l2"):
        got = grid_radius_pairs(
            rd.from_arrow(t).repartition(6), "id", "x", "y", r,
            metric=metric, num_partitions=8).to_pandas()
        m = (np.maximum(dx, dy) <= r) if metric == "linf" else \
            (dx.astype(np.int64) ** 2 + dy.astype(np.int64) ** 2 <= r * r)
        ia, ib = np.nonzero(np.triu(m, 1))
        want = set(zip(np.minimum(ids[ia], ids[ib]),
                       np.maximum(ids[ia], ids[ib])))
        have = set(zip(got["id_a"], got["id_b"]))
        assert have == want and len(got) == len(have)


def test_triangle_count_bruteforce(rd):
    """triangle_count == adjacency-matrix trace/6 on a random graph;
    wedge count == sum C(deg,2); cooccurrence_edges derives the distinct
    canonical pair set (duplicate group memberships collapse)."""
    from setsketch_ray.functions.graph import (cooccurrence_edges,
                                               triangle_count)

    rng = np.random.default_rng(5)
    pairs = set()
    while len(pairs) < 300:
        a, b = rng.integers(0, 60, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    u = np.array([p[0] for p in sorted(pairs)], np.int64)
    v = np.array([p[1] for p in sorted(pairs)], np.int64)
    adj = np.zeros((60, 60), np.int64)
    adj[u, v] = adj[v, u] = 1
    deg = adj.sum(1)
    out = triangle_count(
        rd.from_arrow(pa.table({"u": u, "v": v})).repartition(5),
        "u", "v", num_partitions=8).to_pydict()
    assert out == {
        "n_nodes": [int((deg > 0).sum())], "n_edges": [len(pairs)],
        "n_wedges": [int((deg * (deg - 1) // 2).sum())],
        "n_triangles": [int(np.trace(adj @ adj @ adj)) // 6]}

    # co-occurrence edge derivation: groups -> distinct item pairs
    g = np.array([1, 1, 1, 2, 2, 2, 3, 3], np.int64)
    i = np.array([10, 11, 10, 11, 12, 11, 10, 12], np.int64)
    e = cooccurrence_edges(
        rd.from_arrow(pa.table({"g": g, "i": i})).repartition(3),
        "g", "i", num_partitions=4).to_pandas()
    have = set(zip(e["u"], e["v"]))
    assert have == {(10, 11), (11, 12), (10, 12)}


def test_pagerank_fixedpoint_bruteforce(rd):
    """pagerank_fixedpoint == a serial numpy re-derivation of the same
    integer-fixpoint spec on a random graph (exact int64 equality), and
    the damping sanity holds (hub node outranks leaves on a star)."""
    from setsketch_ray.functions.graph import pagerank_fixedpoint

    rng = np.random.default_rng(11)
    pairs = set()
    while len(pairs) < 200:
        a, b = rng.integers(0, 50, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    u = np.array([p[0] for p in sorted(pairs)], np.int64)
    v = np.array([p[1] for p in sorted(pairs)], np.int64)

    # serial reference: identical integer-floor spec
    nodes = np.unique(np.concatenate([u, v]))
    n = len(nodes)
    idx = {int(x): i for i, x in enumerate(nodes)}
    s = np.array([idx[int(x)] for x in np.concatenate([u, v])])
    d = np.array([idx[int(x)] for x in np.concatenate([v, u])])
    deg = np.bincount(s, minlength=n).astype(np.int64)
    scale = 10 ** 12
    r = np.full(n, scale // n, np.int64)
    base = 15 * (scale // n) // 100
    for _ in range(3):
        contrib = r[s] // deg[s]
        sums = np.zeros(n, np.int64)
        np.add.at(sums, d, contrib)
        r = base + 85 * sums // 100
    order = np.lexsort((nodes, -r))[:20]
    want = list(zip(nodes[order], r[order]))

    out = pagerank_fixedpoint(
        rd.from_arrow(pa.table({"u": u, "v": v})).repartition(5),
        iters=3, num_partitions=8, top_k=20).to_pandas()
    have = list(zip(out["node"], out["pr"]))
    assert have == want

    # star graph: the hub strictly outranks every leaf
    hub_u = np.zeros(9, np.int64)
    hub_v = np.arange(1, 10, dtype=np.int64)
    star = pagerank_fixedpoint(
        rd.from_arrow(pa.table({"u": hub_u, "v": hub_v})),
        iters=3, num_partitions=4, top_k=10).to_pandas()
    assert star["node"][0] == 0
    assert star["pr"][0] > star["pr"][1]


def test_weighted_bottom_k_sample(rd):
    """integer_race: partition-invariant, equals a serial re-derivation of
    the same integer spec.  exp_race: Efraimidis-Spirakis inclusion
    frequencies are proportional to weight across salt replicates."""
    from setsketch_ray.functions.relational import weighted_bottom_k_sample

    key = np.arange(1, 401, dtype=np.int64)
    w = ((key * 7) % 50 + 1).astype(np.int64)
    t = pa.table({"k": key, "w": w})

    h = (key.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    p = (h.astype(np.int64) << 20) // w
    want = key[np.lexsort((key, p))[:32]].tolist()

    for nparts in (1, 4, 13):
        got = weighted_bottom_k_sample(
            rd.from_arrow(t).repartition(nparts), "k", "w", 32).to_pandas()
        assert got["k"].tolist() == want

    # exp_race through Ray == the serial numpy re-derivation (same formula,
    # same draws -> bit-exact), partition-invariant
    from setsketch_ray.sketchlib.hashing import mix64

    def exp_priorities(keys, ws, s):
        h = mix64(keys.astype(np.uint64)
                  ^ np.uint64(s * 0x9E3779B97F4A7C15 % (1 << 64)))
        u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)
        return -np.log(u) / ws

    pe = exp_priorities(key, w, 7)
    want_e = key[np.lexsort((key, pe))[:32]].tolist()
    got_e = weighted_bottom_k_sample(
        rd.from_arrow(t).repartition(6), "k", "w", 32,
        mode="exp_race", salt=7).to_pandas()
    assert got_e["k"].tolist() == want_e

    # Efraimidis-Spirakis proportionality (serial replicates of the same
    # formula): weights 1 vs 3 -> heavier row wins the k=1 race ~3/4
    k2 = np.array([1, 2], np.int64)
    w2 = np.array([1, 3], np.int64)
    wins = sum(int(np.argmin(exp_priorities(k2, w2, s)) == 1)
               for s in range(4096))
    frac = wins / 4096
    assert 0.72 <= frac <= 0.78, frac


def test_zorder_layout_and_zonemap_scan(rd, tmp_path):
    """zorder_key == naive per-bit interleave; write_zordered produces a
    partition-invariant layout whose zone-map scan returns exactly the
    box rows while skipping non-intersecting files; a partial directory
    (no _SUCCESS) is wiped and rebuilt."""
    from setsketch_ray.functions.layout import (write_zordered,
                                                zonemap_scan, zorder_key)

    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 12, 500).astype(np.int64)
    y = rng.integers(0, 1 << 12, 500).astype(np.int64)

    def naive(xv, yv):
        z = 0
        for i in range(32):
            z |= ((int(xv) >> i) & 1) << (2 * i)
            z |= ((int(yv) >> i) & 1) << (2 * i + 1)
        return z

    zk = zorder_key(x, y)
    assert zk.tolist() == [naive(a, b) for a, b in zip(x, y)]

    ids = np.arange(500, dtype=np.int64)
    t = pa.table({"id": ids, "x": x, "y": y})
    root = str(tmp_path / "zl")
    man = write_zordered(rd.from_arrow(t).repartition(7), root,
                         "x", "y", bits=12, num_files=16)
    assert int(man["n"].to_numpy().sum()) == 500

    box_x, box_y = (500, 2000), (1000, 3000)
    got, n_scan, n_total = zonemap_scan(root, "x", "y", box_x, box_y)
    gdf = got.to_pandas().sort_values("id").reset_index(drop=True)
    m = (x >= 500) & (x <= 2000) & (y >= 1000) & (y <= 3000)
    assert gdf["id"].tolist() == ids[m].tolist()
    assert 0 < n_scan <= n_total == man.num_rows

    # layout invariance: different partitioning -> identical file bytes
    import hashlib
    import os
    h1 = {f: hashlib.sha1(open(os.path.join(root, f), "rb").read())
          .hexdigest() for f in sorted(os.listdir(root))
          if f.endswith(".parquet") and not f.startswith("_")}
    root2 = str(tmp_path / "zl2")
    write_zordered(rd.from_arrow(t).repartition(2), root2,
                   "x", "y", bits=12, num_files=16)
    h2 = {f: hashlib.sha1(open(os.path.join(root2, f), "rb").read())
          .hexdigest() for f in sorted(os.listdir(root2))
          if f.endswith(".parquet") and not f.startswith("_")}
    assert h1 == h2

    # crash resume: remove _SUCCESS + corrupt a file -> rebuild is clean
    os.remove(f"{root}/_SUCCESS")
    victim = next(f for f in sorted(os.listdir(root))
                  if f.endswith(".parquet") and not f.startswith("_"))
    with open(os.path.join(root, victim), "wb") as fh:
        fh.write(b"garbage")
    write_zordered(rd.from_arrow(t), root, "x", "y",
                   bits=12, num_files=16)
    got2, _, _ = zonemap_scan(root, "x", "y", box_x, box_y)
    assert sorted(got2.to_pandas()["id"]) == ids[m].tolist()


def test_bm25_topk_matches_scalar_reference(rd):
    """bm25_topk == a scalar pure-Python BM25 (same idf variant, same
    fixed-point rule), including tie handling and repartition
    invariance; docs without any query term never appear."""
    import math

    from setsketch_ray.functions.search import bm25_topk

    rng = np.random.default_rng(7)
    vocab = ["hash", "merge", "scan", "window", "row", "table", "fast"]
    texts, ids = [], []
    for i in range(60):
        n = int(rng.integers(3, 30))
        texts.append(" ".join(rng.choice(vocab, n)))
        ids.append(i)
    texts[5] = "row table fast row"          # no query terms -> excluded
    texts[6] = ""                            # empty doc -> dl 0, excluded
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})

    terms = ["hash", "merge", "scan", "window"]
    k1, b = 1.2, 0.75

    toks = [[w for w in s.split(" ") if w] for s in texts]
    dl = [len(ws) for ws in toks]
    n_docs = len(texts)
    sum_dl = sum(dl)
    avgdl = float(sum_dl) / float(n_docs)
    tfs = [[ws.count(term) for ws in toks] for term in terms]
    dfs = [sum(1 for v in tf if v > 0) for tf in tfs]
    idfs = [math.log(1.0 + (float(n_docs - df) + 0.5) / (float(df) + 0.5))
            for df in dfs]
    expect = []
    for i in range(n_docs):
        if sum(tf[i] for tf in tfs) == 0:
            continue
        s = 0.0
        for j in range(len(terms)):
            tff = float(tfs[j][i])
            s = s + (idfs[j] * (tff * (k1 + 1))) / (
                tff + k1 * ((1.0 - b) + b * (dl[i] / avgdl)))
        expect.append((i, dl[i], int(math.floor(s * 1e6 + 0.5))))
    expect.sort(key=lambda r: (-r[2], r[0]))
    expect = expect[:10]

    for nparts in (1, 4):
        out = bm25_topk(rd.from_arrow(t).repartition(nparts),
                        "doc_id", "text", terms, k=10)
        got = list(zip(out["doc_id"].to_pylist(), out["dl"].to_pylist(),
                       out["score_c"].to_pylist()))
        assert got == expect


def test_chunk_documents_matches_scalar_reference(rd):
    """chunk_documents == scalar sliding-window reference across the
    boundary cases (empty, shorter-than-window, exact window, window+1,
    multi-chunk), repartition-invariant."""
    from setsketch_ray.functions.text import chunk_documents

    rng = np.random.default_rng(11)
    vocab = ["a", "b", "c", "d", "e"]
    lengths = [0, 1, 5, 39, 40, 41, 70, 71, 100, 130]
    lengths += [int(rng.integers(1, 120)) for _ in range(30)]
    texts = [" ".join(rng.choice(vocab, n)) for n in lengths]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    W, S = 40, 30
    expect = []
    for i, s in enumerate(texts):
        ws = [w for w in s.split(" ") if w]
        n = len(ws)
        if n == 0:
            continue
        n_chunks = 1 + max(0, -((-(n - W)) // S) if n > W else 0)
        for c in range(n_chunks):
            st = c * S
            en = min(st + W, n)
            expect.append((i, c, en - st, " ".join(ws[st:en])))

    for nparts in (1, 4):
        out = chunk_documents(rd.from_arrow(t).repartition(nparts),
                              "doc_id", "text", window=W, stride=S)
        tb = pa.concat_tables(list(out.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))
        got = sorted(zip(tb["doc_id"].to_pylist(), tb["chunk_id"].to_pylist(),
                         tb["n_words"].to_pylist(),
                         tb["chunk_text"].to_pylist()))
        assert got == sorted(expect)


def test_ams_sketch_linearity_and_estimate():
    """AMS partial vectors are linear (disjoint word sets AND split
    counts of the same word fold exactly) and the median-of-means
    numerator lands within the theoretical band on a skewed planted
    distribution."""
    from setsketch_ray.sketchlib.ams import ams_median_numerator, ams_partial

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(400)]
    cnts = np.sort(rng.integers(1, 500, 400))[::-1].astype(np.int64)
    whole = ams_partial(pa.array(words), cnts)

    # disjoint split
    a = ams_partial(pa.array(words[:150]), cnts[:150])
    b = ams_partial(pa.array(words[150:]), cnts[150:])
    assert np.array_equal(a + b, whole)

    # split counts of the SAME words (partial counts per block)
    c1 = cnts // 3
    c2 = cnts - c1
    p1 = ams_partial(pa.array(words), c1)
    p2 = ams_partial(pa.array(words), c2)
    assert np.array_equal(p1 + p2, whole)

    f2 = int(np.sum(cnts.astype(object) * cnts.astype(object)))
    num = ams_median_numerator(whole)
    assert abs(num - 256 * f2) * 100 <= 256 * f2 * 20


def test_word_moments_exact_and_certified(rd):
    """word_moments == scalar moment computation, layout-invariant, and
    the AMS certificate holds."""
    from setsketch_ray.functions.text import word_moments

    rng = np.random.default_rng(5)
    vocab = [f"t{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(1, 60))))
             for _ in range(300)] + [""]
    t = pa.table({"text": pa.array(texts, pa.string())})

    from collections import Counter
    cnt = Counter(w for s in texts for w in s.split(" ") if w)
    f0 = len(cnt)
    f1 = sum(cnt.values())
    f2 = sum(v * v for v in cnt.values())

    for nparts in (1, 5):
        out = word_moments(rd.from_arrow(t).repartition(nparts), "text")
        assert out["f0"][0].as_py() == f0
        assert out["f1"][0].as_py() == f1
        assert out["f2"][0].as_py() == f2
        assert out["ams_ok"][0].as_py() == 1


def test_embedding_group_centroids_exact(rd):
    """Grouped centroids == scalar fixed-point reference; inner-join
    semantics drop unlabeled vectors; layout-invariant."""
    from setsketch_ray.functions.knn import embedding_group_centroids

    rng = np.random.default_rng(9)
    n, d = 120, 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    labels = [f"g{i % 3}" for i in range(90)]  # ids 90..119 unlabeled
    emb = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(list(vecs),
                                          pa.list_(pa.float32()))})
    grp = pa.table({"doc_id": pa.array(range(90), pa.int64()),
                    "lang": pa.array(labels, pa.string())})

    c = np.floor(vecs[:90].astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    expect = {}
    for g in ("g0", "g1", "g2"):
        idx = [i for i in range(90) if labels[i] == g]
        expect[g] = (c[idx].sum(axis=0), len(idx))

    for nparts in (1, 4):
        out = embedding_group_centroids(
            rd.from_arrow(emb).repartition(nparts), rd.from_arrow(grp),
            num_partitions=8)
        assert out.num_rows == 3 * d
        for g in ("g0", "g1", "g2"):
            sub = out.filter(pa.compute.equal(out["lang"], g))
            s, cnt = expect[g]
            assert sub["sum_c"].to_pylist() == s.tolist()
            assert sub["n"].to_pylist() == [cnt] * d
            got_mean = np.array(sub["mean"].to_pylist())
            ref_mean = s.astype(np.float64) / np.float64(cnt)
            assert np.array_equal(got_mean, ref_mean)


def test_join_size_estimate_exact_and_certified(rd):
    """join_size_estimate == scalar sum_k a_k*b_k on a planted skewed key
    distribution; the AMS cross-sketch certificate holds; disjoint key
    sets give join_size 0 with a clean certificate."""
    from setsketch_ray.functions.relational import join_size_estimate

    rng = np.random.default_rng(13)
    ka = rng.integers(0, 60, 4000).astype(np.int64)
    kb = np.concatenate([rng.integers(0, 60, 3000),
                         rng.integers(100, 120, 500)]).astype(np.int64)
    ta = pa.table({"k": pa.array(ka, pa.int64())})
    tb = pa.table({"k": pa.array(kb, pa.int64())})

    from collections import Counter
    ca, cb = Counter(ka.tolist()), Counter(kb.tolist())
    js = sum(v * cb.get(k, 0) for k, v in ca.items())
    f2a = sum(v * v for v in ca.values())
    f2b = sum(v * v for v in cb.values())

    for nparts in (1, 4):
        out = join_size_estimate(rd.from_arrow(ta).repartition(nparts),
                                 rd.from_arrow(tb), "k", "k",
                                 num_partitions=8)
        assert out["join_size"][0].as_py() == js
        assert out["f2_a"][0].as_py() == f2a
        assert out["f2_b"][0].as_py() == f2b
        assert out["ams_ok"][0].as_py() == 1

    # disjoint key domains
    tc = pa.table({"k": pa.array(np.arange(500, 540), pa.int64())})
    out = join_size_estimate(rd.from_arrow(ta), rd.from_arrow(tc),
                             "k", "k", num_partitions=8)
    assert out["join_size"][0].as_py() == 0
    assert out["ams_ok"][0].as_py() == 1   # 3-sigma zero-case certificate


def test_char_entropy_scores_matches_scalar(rd):
    """char_entropy_scores == scalar Counter+math.log2 reference,
    including single-class (zero-entropy) and empty-doc drop."""
    import math
    from collections import Counter

    from setsketch_ray.functions.text import char_entropy_scores

    texts = ["aaaa", "", "abab", "the quick brown fox", "zzzzzzzzzy",
             "a b a b  ", "0123456789" * 7]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    expect = {}
    for i, s in enumerate(texts):
        if not s:
            continue
        cnt = Counter(s)
        n = len(s)
        expect[i] = (n, sum(
            c * math.floor((-math.log2(c / n)) * 1e9 + 0.5)
            for c in cnt.values()))

    for nparts in (1, 3):
        out = char_entropy_scores(rd.from_arrow(t).repartition(nparts),
                                  "doc_id", "text")
        tb = pa.concat_tables(list(out.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))
        got = {d: (n, e) for d, n, e in zip(
            tb["doc_id"].to_pylist(), tb["n_chars"].to_pylist(),
            tb["ent_e9"].to_pylist())}
        assert got == expect
    assert expect[0][1] == 0          # single class -> zero entropy


def test_rrf_fuse_matches_scalar():
    """rrf_fuse == scalar fusion with absence handling, tie-by-id, and
    exact fixed-point parity."""
    from setsketch_ray.functions.search import rrf_fuse

    a = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "r": pa.array([1, 2, 3], pa.int64())})
    b = pa.table({"doc_id": pa.array([3, 4, 1], pa.int64()),
                  "r": pa.array([1, 2, 3], pa.int64())})
    out = rrf_fuse([a, b], k=10)

    import math
    exp = {}
    for did in (1, 2, 3, 4):
        ra = {1: 1, 2: 2, 3: 3}.get(did)
        rb = {3: 1, 4: 2, 1: 3}.get(did)
        s = 0.0
        s = s + (1.0 / float(60 + ra) if ra else 0.0)
        s = s + (1.0 / float(60 + rb) if rb else 0.0)
        exp[did] = int(math.floor(s * 1e9 + 0.5))
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(zip(out["doc_id"].to_pylist(),
                    out["rrf_c"].to_pylist())) == want
    # doc in both lists outranks single-list docs here
    assert out["doc_id"][0].as_py() in (1, 3)


def test_compact_parquet_files_order_and_resume(rd, tmp_path):
    """Compaction preserves exact global row order, balances file sizes
    (last short), produces deterministic bytes, and rebuilds cleanly
    after a simulated crash (partial dir without _SUCCESS)."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from setsketch_ray.functions.layout import compact_parquet_files

    rng = np.random.default_rng(17)
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    vals = rng.integers(0, 10 ** 6, 1000).astype(np.int64)
    files = []
    off = 0
    for i, sz in enumerate([37, 263, 100, 400, 200]):
        t = pa.table({"k": pa.array(np.arange(off, off + sz), pa.int64()),
                      "v": pa.array(vals[off:off + sz], pa.int64())})
        p = str(src_dir / f"s-{i:03d}.parquet")
        pq.write_table(t, p)
        files.append(p)
        off += sz

    dst = str(tmp_path / "dst")
    man = compact_parquet_files(files, dst, target_rows=300)
    assert man["f"].to_pylist() == [0, 1, 2, 3]
    assert man["n"].to_pylist() == [300, 300, 300, 100]
    parts = sorted(f for f in os.listdir(dst) if f.startswith("part-"))
    got = pa.concat_tables([pq.read_table(f"{dst}/{f}") for f in parts])
    assert got["k"].to_pylist() == list(range(1000))
    assert got["v"].to_pylist() == vals.tolist()
    h1 = {f: hashlib.sha1(open(f"{dst}/{f}", "rb").read()).hexdigest()
          for f in parts}

    # crash resume: drop _SUCCESS + corrupt one part -> full clean rebuild
    os.remove(f"{dst}/_SUCCESS")
    with open(f"{dst}/{parts[1]}", "wb") as fh:
        fh.write(b"garbage")
    compact_parquet_files(files, dst, target_rows=300)
    h2 = {f: hashlib.sha1(open(f"{dst}/{f}", "rb").read()).hexdigest()
          for f in parts}
    assert h1 == h2


def test_rolling_stats_matches_scalar(rd):
    """rolling_stats == scalar trailing-window sufficient statistics,
    window clamped at each key's start; layout-invariant."""
    from setsketch_ray.functions.streaming import rolling_stats

    rng = np.random.default_rng(23)
    n = 200
    keys = rng.integers(0, 5, n).astype(np.int64)
    ts = rng.integers(0, 1000, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    vals = (rng.integers(0, 5000, n) / 100.0)
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "ts": pa.array(ts, pa.int64()),
                  "eid": pa.array(ids, pa.int64()),
                  "v": pa.array(vals, pa.float64())})

    expect = {}
    for key in set(keys.tolist()):
        rows = sorted([(ts[i], ids[i], int(round(vals[i] * 100)))
                       for i in range(n) if keys[i] == key])
        for i, (_, eid, _) in enumerate(rows):
            win = rows[max(0, i - 3):i + 1]
            vs = [r[2] for r in win]
            expect[eid] = (len(vs), sum(vs), sum(x * x for x in vs))

    for nparts in (1, 4):
        out = rolling_stats(rd.from_arrow(t).repartition(nparts),
                            "k", "ts", "v", "eid", window_rows=3,
                            num_partitions=8)
        tb = pa.concat_tables(list(out.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))
        got = {e: (a, b, c) for e, a, b, c in zip(
            tb["eid"].to_pylist(), tb["rolling_n"].to_pylist(),
            tb["rolling_s"].to_pylist(), tb["rolling_ss"].to_pylist())}
        assert got == expect


def test_resample_linear_identity_and_endpoints():
    """2x-up-then-down is bit-exact identity; endpoints are preserved;
    a constant signal stays constant under any ratio."""
    from setsketch_ray.sources.audio import resample_linear

    rng = np.random.default_rng(29)
    sig = rng.standard_normal(1000)
    up = resample_linear(sig, 1999)
    assert np.array_equal(resample_linear(up, 1000), sig)
    assert up[0] == sig[0] and up[-1] == sig[-1]
    assert np.array_equal(up[::2], sig)          # even grid points copy
    const = np.full(333, 0.25)
    assert np.array_equal(resample_linear(const, 777), np.full(777, 0.25))
