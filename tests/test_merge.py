import pandas as pd

from setsketch_ray.functions.merge import merge_changes


def test_merge_changes_semantics(ray_session):
    import ray.data as rd

    base = rd.from_items([
        {"k": 1, "val": "a", "n": 10},
        {"k": 2, "val": "b", "n": 20},
        {"k": 3, "val": "c", "n": 30},
        {"k": 4, "val": "d", "n": 40},
    ])
    changes = rd.from_items([
        # latest-wins: seq 2 overrides seq 1 for k=1 (full-row replace)
        {"k": 1, "val": "a1", "n": 11, "seq": 1, "op": "upsert"},
        {"k": 1, "val": "a2", "n": 12, "seq": 2, "op": "upsert"},
        # delete k=2; delete-then-reinsert k=3 (seq order decides)
        {"k": 2, "val": None, "n": None, "seq": 1, "op": "delete"},
        {"k": 3, "val": None, "n": None, "seq": 1, "op": "delete"},
        {"k": 3, "val": "c2", "n": 31, "seq": 2, "op": "upsert"},
        # insert of a brand-new key; delete of an absent key is a no-op
        {"k": 9, "val": "z", "n": 90, "seq": 1, "op": "upsert"},
        {"k": 8, "val": None, "n": None, "seq": 1, "op": "delete"},
    ])
    out = merge_changes(base, changes, "k", num_partitions=16) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = pd.DataFrame({
        "k": [1, 3, 4, 9],
        "val": ["a2", "c2", "d", "z"],
        "n": [12, 31, 40, 90],
    })
    assert list(out.columns) == ["k", "val", "n"]
    assert out["k"].tolist() == exp["k"].tolist()
    assert out["val"].tolist() == exp["val"].tolist()
    assert [int(x) for x in out["n"]] == exp["n"].tolist()


def test_merge_changes_no_changes_passthrough(ray_session):
    import ray.data as rd

    base = rd.from_items([{"k": i, "v": i * 2} for i in range(100)])
    changes = rd.from_items(
        [{"k": -1, "v": 0, "seq": 1, "op": "delete"}]).filter(
        lambda r: False)
    out = merge_changes(base, changes, "k").to_pandas()
    assert sorted(out["k"]) == list(range(100))
    assert sorted(out["v"]) == [i * 2 for i in range(100)]
