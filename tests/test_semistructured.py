import json

import pyarrow as pa
import pytest

from setsketch_ray.functions.semistructured import _extract_one, json_extract


def test_extract_one_scalar_forms():
    col = pa.array([
        '{"k": 87}',
        '{"k": -3.5e2, "x": 1}',
        '{"k": "hello"}',
        '{"k": true}',
        '{"k": false}',
        '{"k": null}',
        '{"x": 1}',          # missing key
        None,                 # null row
        '{ "k" :  42 }',      # whitespace
    ])
    out = _extract_one(col, "k").to_pylist()
    assert out == ["87", "-3.5e2", "hello", "true", "false", None, None,
                   None, "42"]


def test_extract_one_fallback_paths():
    # escaped string, nested object, nested array -> json.loads fallback
    col = pa.array([
        '{"k": "a\\"b"}',
        '{"k": {"n": 1}}',
        '{"k": [1, 2]}',
        '{"other": "mentions \\"k\\" not a key"}',
        'not json at all "k"',
    ])
    out = _extract_one(col, "k").to_pylist()
    assert out[0] == 'a"b'
    assert json.loads(out[1]) == {"n": 1}
    assert json.loads(out[2]) == [1, 2]
    assert out[3] is None
    assert out[4] is None


def test_extract_one_key_is_regex_escaped():
    col = pa.array(['{"a.b": 7, "axb": 9}'])
    assert _extract_one(col, "a.b").to_pylist() == ["7"]


def test_json_extract_typed(ray_session):
    import ray.data as rd

    rows = [{"props": json.dumps({"k": i, "name": f"u{i}", "hot": i % 2 == 0})}
            for i in range(50)]
    rows.append({"props": '{"name": "missing-k"}'})
    ds = rd.from_items(rows)
    out = json_extract(ds, "props", {
        "k": ("k", pa.int64()),
        "name": ("name", pa.string()),
        "hot": ("hot", pa.bool_()),
    }, drop=True).to_pandas()
    assert "props" not in out.columns
    assert out["k"].sum() == sum(range(50))
    assert out["k"].isna().sum() == 1
    out = out.dropna(subset=["k"]).sort_values("k").reset_index(drop=True)
    assert out["name"].iloc[3] == "u3"
    assert bool(out["hot"].iloc[4]) is True and bool(out["hot"].iloc[3]) is False


def test_json_extract_matches_duckdb_semantics():
    import duckdb

    texts = ['{"k": 87}', '{"k": "x y"}', '{"k": null}', '{"j": 1}',
             '{"k": 1.25}', '{"k": true}']
    ours = _extract_one(pa.array(texts), "k").to_pylist()
    theirs = [duckdb.sql(
        f"select json_extract_string('{t}', '$.k')").fetchone()[0]
        for t in texts]
    assert ours == theirs
