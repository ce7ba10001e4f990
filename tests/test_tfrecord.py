"""TFRecord / tf.Example codec tests: CRC32C known vectors, frame-level
corruption detection, tf.Example wire-format round trips (all supported
types), determinism, and the Ray shard source/sink.  Ray's own
``read_tfrecords`` requires tensorflow (absent here) — this pure codec is
the only working TFRecord path in this environment."""
import struct

import numpy as np
import pyarrow as pa
import pytest

from setsketch_ray.sources.tfrecord import (crc32c_many, decode_example,
                                            encode_examples,
                                            examples_to_table,
                                            masked_crc32c_many,
                                            read_tfrecord_blobs,
                                            write_tfrecord_file)


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


def test_crc32c_known_vectors():
    # RFC 3720 / Castagnoli reference vectors
    assert int(crc32c_many([b"123456789"])[0]) == 0xE3069283
    assert int(crc32c_many([b""])[0]) == 0
    assert int(crc32c_many([b"\x00" * 32])[0]) == 0x8A9136AA
    assert int(crc32c_many([b"\xff" * 32])[0]) == 0x62A8AB43
    # vectorized == one-at-a-time, mixed lengths
    blobs = [bytes(np.random.default_rng(i).integers(0, 256, i * 7 % 97,
                                                     dtype=np.uint8))
             for i in range(40)]
    batch = crc32c_many(blobs)
    singles = np.array([crc32c_many([b])[0] for b in blobs], np.uint32)
    assert np.array_equal(batch, singles)
    # TF mask formula
    c = int(crc32c_many([b"123456789"])[0])
    expect = (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert int(masked_crc32c_many([b"123456789"])[0]) == expect


def test_tfrecord_roundtrip_and_corruption(tmp_path):
    t = pa.table({
        "doc_id": pa.array([1, 2, -3], pa.int64()),
        "text": pa.array(["hello", "wörld", ""], pa.string()),
        "emb": pa.array([[1.5, 2.5], [0.25], []], pa.list_(pa.float32())),
        "ids": pa.array([[1, 2, 3], [], [9]], pa.list_(pa.int64())),
        "raw": pa.array([b"\x00\xff", b"", b"xyz"], pa.binary()),
        "f": pa.array([1.5, -2.25, 0.0], pa.float32())})
    path = str(tmp_path / "t.tfrecord")
    write_tfrecord_file(t, path)
    blob = open(path, "rb").read()
    back = examples_to_table(read_tfrecord_blobs(blob), schema=t.schema)
    assert back.select(sorted(t.column_names)).to_pydict() == \
        t.select(sorted(t.column_names)).to_pydict()
    # schema-free inference: scalars infer, strings come back as bytes
    inferred = examples_to_table(read_tfrecord_blobs(blob))
    assert inferred["doc_id"].to_pylist() == [1, 2, -3]
    assert inferred["text"].to_pylist() == [b"hello",
                                            "wörld".encode(), b""]
    # flip one payload byte -> data-crc mismatch
    (ln,) = struct.unpack_from("<Q", blob, 0)
    bad = bytearray(blob)
    bad[12 + ln // 2] ^= 0x40
    with pytest.raises(ValueError, match="crc"):
        read_tfrecord_blobs(bytes(bad))
    # truncation detected
    with pytest.raises(ValueError, match="truncated"):
        read_tfrecord_blobs(blob[:-2])
    # float64 refused loudly (FloatList is float32)
    with pytest.raises(NotImplementedError):
        encode_examples(pa.table({"x": pa.array([1.0], pa.float64())}))
    # deterministic bytes
    p2 = str(tmp_path / "t2.tfrecord")
    write_tfrecord_file(t, p2)
    assert open(p2, "rb").read() == blob


def test_tf_example_wire_format():
    """Hand-decode one encoded Example: field numbers and wire types
    match example.proto (features=1; map key=1 value=2; bytes_list=1,
    float_list=2, int64_list=3; inner value field=1)."""
    t = pa.table({"k": pa.array([7], pa.int64())})
    blob = encode_examples(t)[0]
    # Example: tag 0x0A (field 1 LEN) -> Features
    assert blob[0] == 0x0A
    # Features: tag 0x0A (map entry), entry: 0x0A len 'k', 0x12 Feature
    inner = blob[2:]
    assert inner[0] == 0x0A
    entry = inner[2:]
    assert entry[0] == 0x0A and entry[1] == 1 and entry[2:3] == b"k"
    assert entry[3] == 0x12         # map value (Feature, field 2 LEN)
    feat = entry[5:]
    assert feat[0] == 0x1A          # Feature.int64_list (field 3 LEN)
    il = feat[2:]
    assert il[0] == 0x0A            # Int64List.value packed (field 1 LEN)
    assert il[1] == 1 and il[2] == 7
    assert decode_example(blob) == {"k": [7]}


def test_tfrecord_shards_ray_roundtrip(rd, tmp_path):
    from setsketch_ray.sources.tfrecord import (read_tfrecord_files,
                                                write_tfrecord_shards)

    t = pa.table({
        "doc_id": pa.array(np.arange(300), pa.int64()),
        "text": pa.array([f"doc {i} çontent" * (i % 3 + 1)
                          for i in range(300)], pa.string())})
    out = str(tmp_path / "shards")
    manifest = write_tfrecord_shards(rd.from_arrow(t).repartition(5), out,
                                     key_col="doc_id", num_shards=4)
    assert sum(m["n_rows"] for m in manifest) == 300 and len(manifest) == 4
    back = read_tfrecord_files(out, schema=t.schema).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert back["text"].tolist() == t["text"].to_pylist()
    # read_corpus dispatch (schema-free: text arrives as binary)
    from setsketch_ray.sources.readers import read_corpus
    rc = read_corpus(out).to_pandas().sort_values("doc_id",
                                                  ignore_index=True)
    assert [b.decode() for b in rc["text"]] == t["text"].to_pylist()
    # bit-reproducible across block layouts
    import os
    out2 = str(tmp_path / "shards2")
    write_tfrecord_shards(rd.from_arrow(t).repartition(9), out2,
                          key_col="doc_id", num_shards=4)
    for m in manifest:
        assert open(os.path.join(out, m["shard"]), "rb").read() == \
            open(os.path.join(out2, m["shard"]), "rb").read()
