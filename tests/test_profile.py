"""column_profile vs DuckDB: exact moments and quantile_disc
semantics across int/float columns, nulls, ties, many partitions."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from graphscope_ray.data.profile import column_profile

QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def _oracle(df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute("""
      SELECT count(*)::BIGINT AS n,
             (count(*) - count(x))::BIGINT AS nulls,
             min(x) AS min, max(x) AS max,
             round(avg(x), 6) AS mean,
             quantile_disc(x, 0.25) AS q25,
             quantile_disc(x, 0.50) AS q50,
             quantile_disc(x, 0.75) AS q75,
             quantile_disc(x, 0.90) AS q90,
             quantile_disc(x, 0.99) AS q99
      FROM t""").df()


def _check(df: pd.DataFrame, parallelism: int):
    ds = ray.data.from_pandas(df).repartition(parallelism)
    got = column_profile(ds, "x", quantiles=QS).to_pandas()
    want = _oracle(df)
    pd.testing.assert_frame_equal(
        got.astype(want.dtypes.to_dict()), want)


def test_ints_with_ties(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"x": rng.integers(0, 40, size=777).astype(np.int64)})
    _check(df, 7)


def test_floats(ray_session):
    rng = np.random.default_rng(6)
    df = pd.DataFrame({"x": np.round(rng.random(300), 3)})
    _check(df, 5)


def test_nulls(ray_session):
    df = pd.DataFrame({"x": pd.array(
        [1, None, 3, None, 5, 2, 2, 9], dtype="Int64")})
    _check(df, 3)


def test_tiny_and_single(ray_session):
    _check(pd.DataFrame({"x": np.array([42], dtype=np.int64)}), 1)
    _check(pd.DataFrame({"x": np.arange(5, dtype=np.int64)}), 5)


def test_randomized_vs_duckdb(ray_session):
    rng = np.random.default_rng(17)
    for _ in range(4):
        n = int(rng.integers(2, 2000))
        df = pd.DataFrame(
            {"x": rng.integers(-1000, 1000, size=n).astype(np.int64)})
        _check(df, int(rng.integers(1, 14)))
