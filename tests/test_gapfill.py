import datetime as dt

import numpy as np

from setsketch_ray.functions.streaming import gap_fill_ffill


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute, 30)


def test_gap_fill_ffill_hand_case(ray_session):
    import ray.data as rd

    rows = [
        # key a: buckets 0, 3 occupied -> grid 0..3, ffill through 1, 2
        {"k": "a", "ts": _ts(0), "v": 1.25},
        {"k": "a", "ts": _ts(0), "v": 2.00},
        {"k": "a", "ts": _ts(3), "v": 0.50},
        # key b: single bucket
        {"k": "b", "ts": _ts(5), "v": 4.00},
    ]
    out = gap_fill_ffill(rd.from_items(rows), "k", "ts", "v",
                         every_seconds=60, scale=100) \
        .to_pandas().sort_values(["k", "bucket"]).reset_index(drop=True)
    base = dt.datetime(2024, 1, 1).timestamp() * 1e6 // 60e6
    assert out["k"].tolist() == ["a", "a", "a", "a", "b"]
    assert (out["bucket"] - base).tolist() == [0, 1, 2, 3, 5]
    assert out["n"].tolist() == [2, 0, 0, 1, 1]
    assert out["v_sum_c"].tolist() == [325, 325, 325, 50, 400]


def test_gap_fill_ffill_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 2000
    df = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400 * 2, n), unit="s"),
        "v": np.round(rng.uniform(0, 50, n), 2),
    })
    ours = gap_fill_ffill(rd.from_pandas(df), "k", "ts", "v",
                          every_seconds=3600, scale=100) \
        .to_pandas().sort_values(["k", "bucket"]).reset_index(drop=True)
    theirs = duckdb.sql("""
        WITH agg AS (
          SELECT k, epoch_us(ts) // 3600000000 AS b,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(floor(v * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
          FROM df GROUP BY k, b),
        bounds AS (SELECT k, min(b) b0, max(b) b1 FROM agg GROUP BY k),
        grid AS (SELECT k, unnest(range(b0, b1 + 1)) AS bucket FROM bounds),
        j AS (SELECT g.k, g.bucket, coalesce(a.n, 0) AS n, a.s
              FROM grid g LEFT JOIN agg a ON g.k = a.k AND g.bucket = a.b)
        SELECT k, bucket, n,
               last_value(s IGNORE NULLS) OVER (
                 PARTITION BY k ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS v_sum_c
        FROM j ORDER BY k, bucket
    """).df()
    assert ours["k"].tolist() == theirs["k"].tolist()
    assert ours["bucket"].tolist() == theirs["bucket"].tolist()
    assert ours["n"].tolist() == theirs["n"].tolist()
    assert ours["v_sum_c"].tolist() == theirs["v_sum_c"].tolist()
