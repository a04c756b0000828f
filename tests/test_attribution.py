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
