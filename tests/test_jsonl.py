"""Compressed JSONL shard sink + generalized codec dispatch
(sources/jsonl.py, readers.read_corpus)."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pytest

from setsketch_ray.sources.jsonl import write_jsonl_shards
from setsketch_ray.sources.readers import read_corpus


@pytest.fixture()
def rd(ray_session):
    import ray.data

    return ray.data


@pytest.fixture()
def doc_table():
    rng = np.random.default_rng(19)
    n = 300
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([" ".join(rng.choice(["a", "b", "quote\"d",
                                               "unié", "tab\tx"],
                                              5)) for _ in range(n)],
                         pa.string()),
        "n": pa.array(rng.integers(0, 100, n), pa.int64())})


@pytest.mark.parametrize("compression,ext", [
    ("zstd", ".jsonl.zst"), ("gzip", ".jsonl.gz"), ("bz2", ".jsonl.bz2"),
    (None, ".jsonl")])
def test_jsonl_shard_roundtrip(rd, tmp_path, doc_table, compression, ext):
    out = str(tmp_path / "shards")
    man = write_jsonl_shards(rd.from_arrow(doc_table).repartition(3), out,
                             "doc_id", num_shards=4,
                             compression=compression)
    assert [m["shard"] for m in man] == \
        [f"part-{i:05d}{ext}" for i in range(4)]
    assert sum(m["n_rows"] for m in man) == doc_table.num_rows
    back = read_corpus(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    src = doc_table.to_pandas()
    assert back["text"].tolist() == src["text"].tolist()
    assert back["n"].tolist() == src["n"].tolist()


def test_jsonl_shards_bit_reproducible(rd, tmp_path, doc_table):
    h = []
    for sub in ("a", "b"):
        out = str(tmp_path / sub)
        write_jsonl_shards(rd.from_arrow(doc_table).repartition(
            2 if sub == "a" else 5), out, "doc_id", num_shards=4)
        h.append({f: hashlib.sha1(open(os.path.join(out, f), "rb").read())
                  .hexdigest() for f in sorted(os.listdir(out))})
    assert h[0] == h[1]


def test_csv_zst_read(rd, tmp_path):
    import pyarrow.csv as pacsv

    t = pa.table({"x": pa.array([1, 2, 3], pa.int64()),
                  "s": pa.array(["p", "q", "r"], pa.string())})
    path = str(tmp_path / "t.csv.zst")
    sink = pa.BufferOutputStream()
    with pa.CompressedOutputStream(sink, "zstd") as cs:
        pacsv.write_csv(t, cs)
    with open(path, "wb") as f:
        f.write(sink.getvalue().to_pybytes())
    back = read_corpus(path).to_pandas().sort_values("x")
    assert back["s"].tolist() == ["p", "q", "r"]
