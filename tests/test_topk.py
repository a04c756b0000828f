"""topk_per_group vs DuckDB row_number(), including tie storms and
groups smaller than k."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from graphscope_ray.data.curate import topk_per_group


def _oracle(df: pd.DataFrame, k: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(f"""
      SELECT grp, score, id, rn FROM (
        SELECT grp, score, id,
               row_number() OVER (PARTITION BY grp
                                  ORDER BY score DESC, id) AS rn
        FROM t) WHERE rn <= {k}
      ORDER BY grp, rn""").df()


def _run(df: pd.DataFrame, k: int, parallelism: int) -> pd.DataFrame:
    ds = ray.data.from_pandas(df).repartition(parallelism)
    out = topk_per_group(ds, group="grp", score="score", key="id", k=k)
    return (out.to_pandas()[["grp", "score", "id", "rn"]]
            .sort_values(["grp", "rn"]).reset_index(drop=True))


def _check(df, k, parallelism):
    got = _run(df, k, parallelism)
    want = _oracle(df, k)
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_like=False)


def test_basic(ray_session):
    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame({
        "grp": rng.choice([f"d{i}" for i in range(12)], size=n),
        # coarse scores → many exact ties, exercising the id tie-break
        "score": rng.integers(0, 5, size=n).astype(np.float64) / 4.0,
        "id": np.arange(n, dtype=np.int64),
    })
    _check(df, 3, 8)


def test_small_groups_and_single_block(ray_session):
    df = pd.DataFrame({
        "grp": ["a", "a", "b", "c", "c", "c", "c"],
        "score": [1.0, 1.0, 0.5, 0.1, 0.9, 0.9, 0.2],
        "id": np.arange(7, dtype=np.int64),
    })
    _check(df, 3, 1)
    _check(df, 1, 3)


def test_randomized_many_partitions(ray_session):
    rng = np.random.default_rng(11)
    for trial in range(4):
        n = int(rng.integers(50, 800))
        df = pd.DataFrame({
            "grp": rng.choice(
                [f"g{i}" for i in range(int(rng.integers(1, 40)))], size=n),
            "score": np.round(rng.random(n), 2),
            "id": rng.permutation(n).astype(np.int64),
        })
        _check(df, int(rng.integers(1, 6)), int(rng.integers(1, 12)))
