"""Replicates the driver's correctness gate: every queries() entry with
an oracle_sql() twin must match DuckDB row-for-row (order-insensitive,
columns sorted by name) on sf0.01; rows-only entries must run and
return rows. Also smoke-checks entry()."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

import __ray_entry__ as entrymod

SF = os.environ.get("GRAFT_SF_DIR_TEST_CONTRACT", "/root/testdata/sf0.01")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def to_df(res) -> pd.DataFrame:
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(con, name):
    got = canon(to_df(entrymod.queries()[name](SF)))
    want = canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            np.testing.assert_allclose(
                a.astype(float), b.astype(float), atol=2e-6,
                err_msg=f"{name}.{c}")
        else:
            np.testing.assert_array_equal(a, b, err_msg=f"{name}.{c}")


ROWS_ONLY = sorted(set(entrymod.queries()) - set(SQL_CHECKED))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    df = to_df(entrymod.queries()[name](SF))
    assert len(df) >= 0 and len(df.columns) > 0


def test_entry_smoke():
    df = entrymod.entry()
    assert len(df) > 0
    assert {"vid", "rank"} <= set(df.columns)
    assert np.isfinite(df["rank"]).all()
