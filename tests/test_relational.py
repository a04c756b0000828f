"""Relational pipeline queries (pipelines/relational.py) vs DuckDB."""

import duckdb
import pandas as pd

import ray.data  # noqa: F401  (session fixture)

from graphscope_ray.pipelines.relational import (
    NATION_REVENUE_SQL, nation_revenue, pricing_summary,
    pricing_summary_sql)

SF = "/root/testdata/sf0.001"


def _con():
    c = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "nation"]:
        c.sql(f"CREATE VIEW {t} AS"
              f" SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_pricing_summary_matches_sql():
    got = canon(pricing_summary(SF).to_pandas())
    want = canon(_con().execute(pricing_summary_sql()).df())
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert len(got) == 6  # 3 returnflags x 2 linestatuses


def test_nation_revenue_matches_sql():
    got = canon(nation_revenue(SF).to_pandas())
    want = canon(_con().execute(NATION_REVENUE_SQL).df())
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_shipping_priority_matches_sql():
    from graphscope_ray.pipelines.relational import (
        shipping_priority, shipping_priority_sql)
    for cutoff, seg, k in [("1998-06-01", "BUILDING", 10),
                           ("1997-01-01", "MACHINERY", 5),
                           ("1995-01-01", "HOUSEHOLD", 3)]:  # empty o side
        got = canon(shipping_priority(
            SF, cutoff=cutoff, segment=seg, k=k).to_pandas())
        want = canon(_con().execute(
            shipping_priority_sql(cutoff, seg, k)).df())
        assert len(got) == len(want), (cutoff, seg, k)
        if len(got):
            pd.testing.assert_frame_equal(
                got, want.astype(got.dtypes.to_dict()))
