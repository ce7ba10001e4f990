"""Driver-style compare: Ray query result vs DuckDB oracle (row count, schema,
order-insensitive values)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(ray_result, sql: str, sf_dir: str, atol: float = 1e-6) -> tuple[bool, str]:
    a = canonicalize(to_pandas(ray_result))
    b = canonicalize(run_oracle(sql, sf_dir))
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype.kind in "fc":
            if not np.allclose(av, bv.astype(av.dtype), atol=atol, rtol=1e-9,
                               equal_nan=True):
                return False, f"values differ in float column {c}"
        else:
            if not (av == bv).all():
                return False, f"values differ in column {c}"
    return True, "ok"
