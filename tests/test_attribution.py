"""attribute_conversions vs a per-conversion pandas replay."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.data.temporal import attribute_conversions


def _events(rng, n_users, n_events):
    base = np.datetime64("2024-01-01", "ns")
    ts = base + rng.integers(0, 30 * 86400, n_events).astype(
        "timedelta64[s]").astype("timedelta64[ns]")
    return pd.DataFrame({
        "event_id": np.arange(n_events, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_users, n_events),
        "event_type": rng.choice(["click", "view", "purchase", "error"],
                                 n_events),
        "value": np.round(rng.uniform(0, 50, n_events), 2),
    })


def _oracle(df, window):
    w = np.timedelta64(window).astype("timedelta64[ns]")
    out = []
    touches = df[df["event_type"].isin(("click", "view"))]
    for _, c in df[df["event_type"] == "purchase"].iterrows():
        t = touches[(touches["user_id"] == c["user_id"])
                    & (touches["ts"] <= c["ts"])
                    & (touches["ts"] >= c["ts"] - w)]
        if not len(t):
            continue
        t = t.sort_values(["ts", "event_id"], kind="mergesort")
        out.append((int(c["event_id"]), int(c["user_id"]),
                    int(t["event_id"].iloc[0]), int(t["event_id"].iloc[-1]),
                    float(c["value"])))
    return sorted(out)


@pytest.mark.parametrize("n_users,n_events,blocks,window", [
    (10, 200, 2, np.timedelta64(7, "D")),
    (40, 600, 5, np.timedelta64(1, "D")),
    (3, 100, 1, np.timedelta64(30, "m")),
])
def test_attribution_vs_oracle(n_users, n_events, blocks, window):
    rng = np.random.default_rng(n_events)
    df = _events(rng, n_users, n_events)
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = attribute_conversions(ds, window=window).to_pandas()
    if not len(got):  # all-empty blocks drop the schema (Ray wart)
        assert _oracle(df, window) == []
        return
    got_l = sorted(zip(got["conv_id"].astype(int),
                       got["user_id"].astype(int),
                       got["first_touch_id"].astype(int),
                       got["last_touch_id"].astype(int),
                       got["value"].astype(float)))
    assert got_l == _oracle(df, window)


def test_attribution_window_boundary_inclusive():
    base = np.datetime64("2024-01-01T00:00:00", "ns")
    day = np.timedelta64(1, "D")
    df = pd.DataFrame({
        "event_id": [0, 1, 2],
        "ts": [base, base + day, base + day],
        "user_id": [1, 1, 1],
        "event_type": ["click", "purchase", "view"],
        "value": [0.0, 9.0, 0.0],
    })
    got = attribute_conversions(ray.data.from_pandas(df),
                                window=day).to_pandas()
    # the click exactly window-ago AND the same-instant view both count
    assert len(got) == 1
    assert int(got["first_touch_id"].iloc[0]) == 0
    assert int(got["last_touch_id"].iloc[0]) == 2


def test_user_zscores_vs_pandas():
    """user_zscores vs a pandas stddev-samp replay (integer cents)."""
    from graphscope_ray.data.temporal import user_zscores
    from graphscope_ray.util import round_half_away
    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, n),
        "value": np.round(rng.uniform(0, 99, n), 2)})
    # one single-event user and one zero-variance user
    df.loc[0, "user_id"] = 999
    df.loc[1:3, "user_id"] = 998
    df.loc[1:3, "value"] = 5.0
    got = user_zscores(ray.data.from_pandas(df).repartition(4)).to_pandas()
    cents = round_half_away(df["value"].to_numpy() * 100.0, 0).astype(np.int64)
    d = df.assign(c=cents)
    want = {}
    for uid, g in d.groupby("user_id"):
        nn = len(g)
        if nn < 2:
            continue
        sx, sxx = int(g["c"].sum()), int((g["c"] ** 2).sum())
        if nn * sxx - sx * sx <= 0:
            continue
        sd = np.sqrt(float(nn * sxx - sx * sx) / float(nn * (nn - 1)))
        for eid, c in zip(g["event_id"], g["c"]):
            want[int(eid)] = float(round_half_away(
                float(c * nn - sx) / (sd * nn), 6))
    got_map = dict(zip(got["event_id"].astype(int), got["z"]))
    assert got_map == want
    assert 0 not in got_map and 1 not in got_map  # dropped rows


def test_hll_window_ids_vs_replay():
    """Windowed HLL registers vs a numpy per-window replay; estimates
    within HLL error of exact daily distinct counts."""
    from graphscope_ray.data.hashing import B, fmix64
    from graphscope_ray.data.sketch import hll_estimate, hll_fold, \
        hll_window_ids
    rng = np.random.default_rng(2)
    n = 3000
    base = np.datetime64("2024-01-01", "ns")
    ts = base + rng.integers(0, 5 * 86400, n).astype(
        "timedelta64[s]").astype("timedelta64[ns]")
    uid = rng.integers(0, 400, n)
    df = pd.DataFrame({"ts": ts, "user_id": uid})
    got = hll_window_ids(ray.data.from_pandas(df).repartition(4),
                         p=8, seed=5)
    wns = np.timedelta64(1, "D").astype("timedelta64[ns]").astype(np.int64)
    wid = ts.astype(np.int64) // wns
    for w in np.unique(wid):
        ids = uid[wid == w]
        h = fmix64(ids.astype(np.uint64) * B + np.uint64(5))
        regs = hll_fold(h, 8)
        sub = got[got["wid"] == w].sort_values("reg_idx")
        assert (sub["reg"].to_numpy() == regs.astype(np.int64)).all()
        exact = len(np.unique(ids))
        est = hll_estimate(regs)
        assert abs(est - exact) / exact < 0.3  # 1.04/sqrt(256) ≈ 6.5%
