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


def test_local_supplier_volume_matches_sql():
    from graphscope_ray.pipelines.relational import (
        LOCAL_SUPPLIER_VOLUME_SQL, local_supplier_volume)

    c = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "supplier", "nation",
              "region"]:
        c.sql(f"CREATE VIEW {t} AS"
              f" SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = canon(local_supplier_volume(SF).to_pandas())
    want = canon(c.execute(LOCAL_SUPPLIER_VOLUME_SQL).df())
    assert len(got) == len(want)
    if len(got):
        pd.testing.assert_frame_equal(
            got, want.astype(got.dtypes.to_dict()))
    # a different region/window also matches (param coverage)
    got2 = canon(local_supplier_volume(
        SF, region="EUROPE", date_lo="1997-01-01",
        date_hi="1999-01-01").to_pandas())
    want2 = canon(c.execute(
        LOCAL_SUPPLIER_VOLUME_SQL
        .replace("'ASIA'", "'EUROPE'")
        .replace("DATE '1997-01-01'", "DATE '1999-01-01'")
        .replace("DATE '1996-01-01'", "DATE '1997-01-01'")).df())
    assert len(got2) == len(want2)
    if len(got2):
        pd.testing.assert_frame_equal(
            got2, want2.astype(got2.dtypes.to_dict()))
