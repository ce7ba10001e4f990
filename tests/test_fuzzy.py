"""edit_distance_pairs (functions/fuzzy.py): exact d<=1 parity with
brute-force Levenshtein, ASCII guard, duplicate absorption."""
import itertools
import random

import numpy as np
import pyarrow as pa
import pytest


def _lev(a, b):
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev = d[0]
        d[0] = i
        for j in range(1, lb + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i-1] != b[j-1]))
            prev = cur
    return d[lb]


def test_verify_d1_fuzz_matches_bruteforce():
    from setsketch_ray.functions.fuzzy import _verify_d1

    rng = random.Random(11)
    words = ["".join(rng.choice("abc") for _ in range(rng.randint(0, 5)))
             for _ in range(500)]
    pairs = [(x, y) for x, y in zip(words, words[1:])
             if abs(len(x) - len(y)) <= 1]
    got = _verify_d1(pa.array([p[0] for p in pairs]),
                     pa.array([p[1] for p in pairs]))
    want = np.array([_lev(x, y) <= 1 for x, y in pairs])
    assert (got == want).all()


def test_edit_distance_pairs_fuzz(ray_session):
    import ray.data as rd

    from setsketch_ray.functions.fuzzy import edit_distance_pairs

    rng = random.Random(5)
    vocab = list({"".join(rng.choice("abcd")
                          for _ in range(rng.randint(1, 6)))
                  for _ in range(250)})
    # corpus repeats values: distinct semantics must absorb duplicates
    ds = rd.from_arrow(pa.table({"w": pa.array(vocab * 3)}))
    got = sorted((r["value_a"], r["value_b"])
                 for r in edit_distance_pairs(ds, "w").take_all())
    want = sorted((min(x, y), max(x, y))
                  for x, y in itertools.combinations(sorted(vocab), 2)
                  if abs(len(x) - len(y)) <= 1 and _lev(x, y) <= 1)
    assert got == want


def test_edit_distance_pairs_non_ascii_is_loud(ray_session):
    import ray.data as rd

    from setsketch_ray.functions.fuzzy import edit_distance_pairs

    ds = rd.from_arrow(pa.table({"w": pa.array(["abc", "abé"])}))
    with pytest.raises(Exception, match="non-ASCII"):
        edit_distance_pairs(ds, "w").take_all()
