"""Mirror of the driver's correctness gate: run every queries() entry and its
oracle_sql() twin on the same parquet tables, compare row-count + schema +
order-insensitive values. Runs at sf0.001 for speed (driver uses sf0.01)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if pd.isna(a) or pd.isna(b):
        return bool(pd.isna(a)) and bool(pd.isna(b))
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)
    return a == b


def _compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame):
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    )
    a = _canon(ray_df)
    b = _canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" and bv.dtype.kind == "f":
            ok = (av == bv) | (np.isnan(av) & np.isnan(bv))
            assert ok.all(), f"{name}.{c}: {np.count_nonzero(~ok)} value mismatches, first at {np.nonzero(~ok)[0][:3]}: {av[~ok][:3]} vs {bv[~ok][:3]}"
        else:
            mism = [
                (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)
            ]
            assert not mism, f"{name}.{c}: first mismatches {mism[:3]}"


def _query_names():
    import __ray_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as e

    q = e.queries()[name]
    oracles = e.oracle_sql()
    ray_df = _to_pandas(q(SF_DIR))
    if name not in oracles:
        assert len(ray_df) >= 0  # rows-only check (driver does the same)
        return
    con = _duck(SF_DIR)
    sql_df = con.sql(oracles[name]).df()
    _compare(name, ray_df, sql_df)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert "features" in df.columns
