"""SQLite source/sink (sources/sqlite.py): lossless typed round trip,
bit-reproducible shard bytes, column pruning, read_corpus dispatch."""
import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest


def _corpus_table():
    return pa.table({
        "doc_id": pa.array([3, 1, 4, 1 + 4, 9, 2, 6], pa.int64()),
        "small": pa.array([1, None, 3, 4, 5, 6, 7], pa.int32()),
        "score": pa.array([0.5, 1.25, None, -2.0, 3.5, 0.0, 9.0],
                          pa.float32()),
        "text": pa.array(["a", "b", None, "d", "e", "f", "g"], pa.string()),
        "blob": pa.array([b"\x00\xff", b"", None, b"xyz", b"q", b"r", b"s"],
                         pa.binary()),
        "flag": pa.array([True, False, None, True, False, True, None],
                         pa.bool_()),
        "ts": pa.array(np.array([1, 2, 3, 4, 5, 6, 7], "datetime64[us]"),
                       pa.timestamp("us"))})


def _shard_hashes(root):
    return {n: hashlib.sha1(open(os.path.join(root, n), "rb").read())
            .hexdigest() for n in sorted(os.listdir(root))}


def test_sqlite_roundtrip_typed(ray_session, tmp_path):
    import ray.data as rd

    from setsketch_ray.sources.sqlite import (read_sqlite_files,
                                              write_sqlite_shards)

    t = _corpus_table()
    root = str(tmp_path / "shards")
    m = write_sqlite_shards(rd.from_arrow(t), root, "doc_id", num_shards=3)
    assert sum(r["n_rows"] for r in m) == t.num_rows
    back = pa.concat_tables(list(read_sqlite_files(root).iter_batches(
        batch_format="pyarrow", batch_size=1 << 20)))
    assert back.sort_by("doc_id").equals(t.sort_by("doc_id"))

    # bit-reproducible: rewrite -> identical shard bytes
    h1 = _shard_hashes(root)
    shutil.rmtree(root)
    write_sqlite_shards(rd.from_arrow(t), root, "doc_id", num_shards=3)
    assert _shard_hashes(root) == h1


def test_sqlite_column_pruning_and_dispatch(ray_session, tmp_path):
    import ray.data as rd

    from setsketch_ray.sources.readers import read_corpus
    from setsketch_ray.sources.sqlite import write_sqlite_shards

    t = _corpus_table()
    root = str(tmp_path / "shards2")
    write_sqlite_shards(rd.from_arrow(t), root, "doc_id", num_shards=2)
    got = pa.concat_tables(list(
        read_corpus(root, columns=["doc_id", "small"]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20))).sort_by("doc_id")
    assert got.column_names == ["doc_id", "small"]
    assert got["small"].type == pa.int32()
    assert got.equals(t.select(["doc_id", "small"]).sort_by("doc_id"))


def test_sqlite_unsupported_type_is_loud(ray_session, tmp_path):
    import ray.data as rd

    from setsketch_ray.sources.sqlite import write_sqlite_shards

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "v": pa.array([[1, 2]], pa.list_(pa.int64()))})
    with pytest.raises(Exception, match="unsupported column type"):
        write_sqlite_shards(rd.from_arrow(t), str(tmp_path / "x"), "doc_id",
                            num_shards=1)


def test_sqlite_foreign_decltypes(ray_session, tmp_path):
    """A DB written by another tool (plain INTEGER/REAL/TEXT decltypes)
    maps to int64/float64/string."""
    import sqlite3

    from setsketch_ray.sources.sqlite import read_sqlite_files

    p = str(tmp_path / "foreign.sqlite")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE t (id INTEGER, x REAL, s TEXT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)",
                    [(1, 0.5, "a"), (2, None, None)])
    con.commit(); con.close()
    got = pa.concat_tables(list(read_sqlite_files(p).iter_batches(
        batch_format="pyarrow", batch_size=10)))
    assert got.schema.types == [pa.int64(), pa.float64(), pa.string()]
    assert got["id"].to_pylist() == [1, 2]
