"""WARC source/sink: framing, multi-member gzip, round trips,
bit-reproducibility, corrupt-file handling."""
import gzip
import os
import re

import pyarrow as pa
import pytest

from setsketch_ray.sources.warc import (_record_uuid, build_warc_record,
                                        parse_warc_records, read_warc_files,
                                        write_warc_files)


def _docs_table():
    return pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "text": pa.array([f"doc {i} body " + "x" * (i % 7) for i in
                          range(20)], pa.string()),
        "lang": pa.array(["en" if i % 3 else "de" for i in range(20)],
                         pa.string())})


def test_record_framing_roundtrip():
    recs = [build_warc_record(
        "conversion", f"payload {i}".encode(),
        {"WARC-Record-ID": _record_uuid(str(i)),
         "WARC-Target-URI": f"https://example.com/{i}",
         "WARC-Date": "2024-01-01T00:00:00Z"}) for i in range(5)]
    parsed = parse_warc_records(b"".join(recs))
    assert len(parsed) == 5
    for i, (fields, payload) in enumerate(parsed):
        assert payload == f"payload {i}".encode()
        assert fields["WARC-Type"] == "conversion"
        assert fields["WARC-Target-URI"] == f"https://example.com/{i}"
        assert int(fields["Content-Length"]) == len(payload)


def test_payload_may_contain_separator_bytes():
    # Content-Length framing must win over any \r\n\r\n inside the payload
    tricky = b"a\r\n\r\nWARC/1.0\r\n\r\nb"
    rec = build_warc_record("resource", tricky, {"WARC-Record-ID": "x"})
    (fields, payload), = parse_warc_records(rec)
    assert payload == tricky


def test_truncated_and_malformed_raise():
    rec = build_warc_record("resource", b"12345", {"WARC-Record-ID": "x"})
    with pytest.raises(ValueError):
        parse_warc_records(rec[:len(rec) - 10])
    with pytest.raises(ValueError):
        parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\nnope")


def test_record_uuid_shape_and_determinism():
    u = _record_uuid("https://example.com/1")
    assert u == _record_uuid("https://example.com/1")
    assert u != _record_uuid("https://example.com/2")
    assert re.fullmatch(
        r"urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}"
        r"-[89ab][0-9a-f]{3}-[0-9a-f]{12}", u)


@pytest.mark.parametrize("compress", [True, False])
def test_write_read_roundtrip(ray_session, tmp_path, compress):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table())
    out = str(tmp_path / ("gz" if compress else "plain"))
    manifest = write_warc_files(
        ds, out, key_col="doc_id", payload_col="text", num_files=4,
        uri_format="https://example.com/doc/{}", language_col="lang",
        compress=compress)
    assert sum(r["n_records"] for r in manifest) == 20
    back = read_warc_files(out).take_all()
    convs = [r for r in back if r["warc_type"] == "conversion"]
    infos = [r for r in back if r["warc_type"] == "warcinfo"]
    assert len(infos) == 4 and len(convs) == 20
    by_uri = {r["uri"]: r for r in convs}
    src = _docs_table()
    for i in range(20):
        r = by_uri[f"https://example.com/doc/{i}"]
        assert r["payload"] == src["text"][i].as_py().encode()
        assert r["language"] == src["lang"][i].as_py()
        assert r["record_id"].startswith("urn:uuid:")
        assert r["date"] == "2024-01-01T00:00:00Z"


def test_write_is_bit_reproducible(ray_session, tmp_path):
    import ray.data as rd

    outs = []
    for sub in ("a", "b"):
        out = str(tmp_path / sub)
        write_warc_files(rd.from_arrow(_docs_table()), out,
                         key_col="doc_id", payload_col="text", num_files=3,
                         uri_format="https://example.com/doc/{}")
        outs.append(out)
    names = sorted(os.listdir(outs[0]))
    assert names == sorted(os.listdir(outs[1])) and names
    for nm in names:
        with open(os.path.join(outs[0], nm), "rb") as fa, \
                open(os.path.join(outs[1], nm), "rb") as fb:
            assert fa.read() == fb.read()


def test_gzip_members_are_per_record(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "gz")
    write_warc_files(rd.from_arrow(_docs_table()), out, key_col="doc_id",
                     payload_col="text", num_files=1,
                     uri_format="https://example.com/doc/{}")
    path = os.path.join(out, sorted(os.listdir(out))[0])
    with open(path, "rb") as f:
        blob = f.read()
    # the CC seekable convention: one gzip member per record -> the raw
    # file contains one gzip magic per record (+1 for warcinfo)
    assert blob.count(b"\x1f\x8b\x08") == 21
    assert len(parse_warc_records(gzip.decompress(blob))) == 21


def test_corrupt_file_skip_and_raise(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "w")
    write_warc_files(rd.from_arrow(_docs_table()), out, key_col="doc_id",
                     payload_col="text", num_files=2,
                     uri_format="https://example.com/doc/{}")
    bad = os.path.join(out, "records-99999.warc.gz")
    with open(bad, "wb") as f:
        f.write(b"\x1f\x8b\x08garbage not gzip at all")
    with pytest.raises(Exception):
        read_warc_files(out).take_all()
    kept = read_warc_files(out, on_error="skip").take_all()
    assert len([r for r in kept if r["warc_type"] == "conversion"]) == 20
