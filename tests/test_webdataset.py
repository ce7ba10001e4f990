"""WebDataset tar-shard source/sink: round trips, determinism, nulls."""

import os

import numpy as np
import pyarrow as pa
import pytest

from setsketch_ray.sources.webdataset import (
    _split_member,
    read_wds_shards,
    write_wds_shards,
)


def _corpus_table(n=40, seed=3):
    rng = np.random.default_rng(seed)
    ids = [f"img{i:06d}" for i in range(n)]
    blobs = [rng.integers(0, 256, int(rng.integers(5, 200)),
                          dtype=np.uint8).tobytes() for _ in range(n)]
    caps = [f"caption {i} with text" for i in range(n)]
    return pa.table({"image_id": pa.array(ids, pa.string()),
                     "bytes": pa.array(blobs, pa.binary()),
                     "caption": pa.array(caps, pa.string())})


def test_split_member_convention():
    assert _split_member("00042.jpg") == ("00042", "jpg")
    assert _split_member("a/b/00042.seg.png") == ("a/b/00042", "seg.png")
    assert _split_member("noext") == ("noext", "")


def test_wds_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    t = _corpus_table()
    out = str(tmp_path / "shards")
    manifest = write_wds_shards(
        rd.from_arrow(t), out, key_col="image_id",
        components={"bytes": "bin", "caption": "txt"}, num_shards=5)
    assert sum(m["n_samples"] for m in manifest) == t.num_rows
    assert all(m["n_bytes"] > 0 for m in manifest)
    assert sorted(os.listdir(out)) == [m["shard"] for m in manifest]

    back = read_wds_shards(out).sort("__key__").take_all()
    assert len(back) == t.num_rows
    want = {t["image_id"][i].as_py():
            (t["bytes"][i].as_py(), t["caption"][i].as_py())
            for i in range(t.num_rows)}
    for r in back:
        b, c = want[r["__key__"]]
        assert r["bin"] == b and r["txt"] == c


def test_wds_write_is_deterministic(ray_session, tmp_path):
    import ray.data as rd

    t = _corpus_table(seed=9)
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        write_wds_shards(rd.from_arrow(t), out, key_col="image_id",
                         components={"bytes": "bin", "caption": "txt"},
                         num_shards=4)
        outs.append(out)
    for shard in sorted(os.listdir(outs[0])):
        with open(os.path.join(outs[0], shard), "rb") as f0, \
                open(os.path.join(outs[1], shard), "rb") as f1:
            assert f0.read() == f1.read(), shard


def test_wds_missing_components_are_null(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table({"k": ["a", "b", "c"],
                  "payload": pa.array([b"x", None, b"z"], pa.binary()),
                  "caption": pa.array(["ca", "cb", None], pa.string())})
    out = str(tmp_path / "s")
    write_wds_shards(rd.from_arrow(t), out, key_col="k",
                     components={"payload": "bin", "caption": "txt"},
                     num_shards=2)
    back = {r["__key__"]: r for r in read_wds_shards(out).take_all()}
    assert back["b"]["bin"] is None and back["b"]["txt"] == "cb"
    assert back["c"]["txt"] is None and back["c"]["bin"] == b"z"


def test_wds_component_selection_and_rename(ray_session, tmp_path):
    import ray.data as rd

    t = _corpus_table(n=10)
    out = str(tmp_path / "s")
    write_wds_shards(rd.from_arrow(t), out, key_col="image_id",
                     components={"bytes": "bin", "caption": "txt"},
                     num_shards=2)
    back = read_wds_shards(out, components={"txt": "caption"}) \
        .sort("__key__").take_all()
    assert set(back[0].keys()) == {"__key__", "caption"}
    assert back[0]["caption"].startswith("caption ")


def test_wds_empty_dir_raises(tmp_path):
    with pytest.raises(ValueError, match="no .tar shards"):
        read_wds_shards(str(tmp_path))


def test_wds_corrupt_shard_skip(ray_session, tmp_path):
    """on_error='skip' drops a truncated tar instead of killing the job;
    the default still raises."""
    import ray.data as rd

    t = _corpus_table(n=20)
    out = str(tmp_path / "s")
    write_wds_shards(rd.from_arrow(t), out, key_col="image_id",
                     components={"bytes": "bin", "caption": "txt"},
                     num_shards=3)
    shards = sorted(os.listdir(out))
    victim = os.path.join(out, shards[0])
    good_rows = 20 - sum(
        1 for r in read_wds_shards(victim).take_all())
    with open(victim, "r+b") as f:
        f.truncate(100)  # torn mid-header: tarfile raises

    kept = read_wds_shards(out, on_error="skip").take_all()
    assert len(kept) == good_rows
    with pytest.raises((Exception,)):
        read_wds_shards(out).take_all()  # default: propagate
    with pytest.raises(ValueError, match="on_error"):
        read_wds_shards(out, on_error="ignore")


def test_wds_property_roundtrip(ray_session, tmp_path):
    """Hypothesis-style sweep (deterministic grid): random component
    subsets, binary sizes incl. empty payloads, utf-8 text with
    non-ASCII, and 1..5 shard counts all round-trip exactly."""
    import numpy as np
    import ray.data as rd

    rng = np.random.default_rng(77)
    for trial in range(6):
        n = int(rng.integers(1, 60))
        n_shards = int(rng.integers(1, 6))
        ids = [f"k{trial}_{i:04d}" for i in range(n)]
        blobs = [rng.integers(0, 256, int(rng.integers(0, 300)),
                              dtype=np.uint8).tobytes() for _ in range(n)]
        caps = [f"ünïcode {i} – ☃" if i % 3 == 0 else f"plain {i}"
                for i in range(n)]
        t = pa.table({"id": pa.array(ids), "payload": pa.array(
            blobs, pa.binary()), "caption": pa.array(caps)})
        out = str(tmp_path / f"t{trial}")
        write_wds_shards(rd.from_arrow(t), out, key_col="id",
                         components={"payload": "bin", "caption": "txt"},
                         num_shards=n_shards)
        back = {r["__key__"]: r for r in read_wds_shards(out).take_all()}
        assert len(back) == n
        for i, k in enumerate(ids):
            assert back[k]["bin"] == blobs[i]
            assert back[k]["txt"] == caps[i]


def test_orc_roundtrip_deterministic(ray_session, tmp_path):
    """ORC shard sink -> read_corpus round trip is lossless; shard bytes
    are bit-reproducible across rewrites; column pruning works."""
    import os

    import ray.data as rd

    from setsketch_ray.sources.orc import read_orc, write_orc_shards
    from setsketch_ray.sources.readers import read_corpus

    t = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([f"doc {i} " + "x" * (i % 17) for i in range(100)]),
        "score": pa.array([i * 0.5 for i in range(100)], pa.float64())})
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_orc_shards(rd.from_arrow(t).repartition(5), d1,
                          key_col="doc_id", num_shards=4)
    m2 = write_orc_shards(rd.from_arrow(t).repartition(3), d2,
                          key_col="doc_id", num_shards=4)
    assert [r["shard"] for r in m1] == [r["shard"] for r in m2]
    for r1, r2 in zip(m1, m2):
        b1 = open(os.path.join(d1, r1["shard"]), "rb").read()
        b2 = open(os.path.join(d2, r2["shard"]), "rb").read()
        assert b1 == b2  # partitioning-invariant bytes
    back = read_corpus(d1).sort("doc_id")
    got = pa.Table.from_pandas(back.to_pandas())
    assert got.select(["doc_id", "text", "score"]).equals(
        t.cast(got.select(["doc_id", "text", "score"]).schema))
    pruned = read_orc(d1, columns=["doc_id"]).schema().base_schema
    assert pruned.names == ["doc_id"]
