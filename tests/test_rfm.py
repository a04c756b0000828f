"""rfm_segments vs a pandas replay of the explicit-threshold scoring."""

import math
import os

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.pipelines.relational import rfm_segments
from graphscope_ray.util import round_half_away


def _orders(rng, n_cust, n_orders):
    base = np.datetime64("2023-01-01", "ns")
    return pd.DataFrame({
        "o_orderkey": np.arange(n_orders, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_orders),
        "o_orderdate": base + rng.integers(0, 700, n_orders).astype(
            "timedelta64[D]").astype("timedelta64[ns]"),
        "o_totalprice": np.round(rng.uniform(10, 5000, n_orders), 2),
    })


def _oracle(df):
    cents = round_half_away(df["o_totalprice"].to_numpy() * 100.0,
                            0).astype(np.int64)
    d = df.assign(cents=cents)
    c = d.groupby("o_custkey").agg(
        rec=("o_orderdate", "max"), freq=("o_orderkey", "count"),
        mon=("cents", "sum")).reset_index()
    n = len(c)

    def th(s):
        v = np.sort(s.to_numpy())
        return [v[max(0, math.ceil(q * n) - 1)] for q in (.25, .5, .75)]

    out = {}
    tr, tf, tm = th(c["rec"]), th(c["freq"]), th(c["mon"])
    for _, row in c.iterrows():
        r = 1 + sum(row["rec"] > t for t in tr)
        f = 1 + sum(row["freq"] > t for t in tf)
        m = 1 + sum(row["mon"] > t for t in tm)
        out[int(row["o_custkey"])] = (r, f, m, 100 * r + 10 * f + m)
    return out


@pytest.mark.parametrize("n_cust,n_orders", [(40, 300), (7, 50)])
def test_rfm_vs_replay(tmp_path, n_cust, n_orders):
    rng = np.random.default_rng(n_orders)
    df = _orders(rng, n_cust, n_orders)
    sf = str(tmp_path)
    df.to_parquet(os.path.join(sf, "orders.parquet"))
    got = rfm_segments(sf).to_pandas()
    got_map = {int(r.cust): (int(r.r_score), int(r.f_score),
                             int(r.m_score), int(r.rfm))
               for r in got.itertuples()}
    assert got_map == _oracle(df)
    assert set(got["r_score"]) <= {1, 2, 3, 4}
