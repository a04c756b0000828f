"""Session-window and as-of-join operators (data/temporal.py)."""

import duckdb
import numpy as np
import pandas as pd

import ray.data

from graphscope_ray.data.temporal import asof_join, session_windows

SF = "/root/testdata/sf0.001"


def test_session_windows_matches_sql_and_bucket_invariant():
    ev = ray.data.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"])
    want = duckdb.sql(f"""
WITH e AS (SELECT * FROM read_parquet('{SF}/events.parquet')),
o AS (SELECT user_id, ts, value, event_id,
  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM e),
s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid FROM o)
SELECT user_id, min(ts) AS session_start, count(*)::BIGINT AS n_events
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""").df()
    for nb in (1, 64):
        got = (session_windows(ev, num_buckets=nb).to_pandas()
               .sort_values(["user_id", "session_start"])
               .reset_index(drop=True))
        np.testing.assert_array_equal(got["user_id"], want["user_id"])
        np.testing.assert_array_equal(got["n_events"], want["n_events"])
        np.testing.assert_array_equal(
            got["session_start"].to_numpy("datetime64[us]"),
            want["session_start"].to_numpy("datetime64[us]"))


def test_asof_join_matches_sql():
    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = ray.data.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"])
    got = (asof_join(ev, orders, by="user_id", right_by="o_custkey",
                     on="ts", right_on="o_orderdate",
                     value_cols=("o_orderkey",), tiebreak=("o_orderkey",))
           .to_pandas())
    got["o_orderkey"] = got["o_orderkey"].fillna(-1).astype("int64")
    got = got.sort_values("event_id").reset_index(drop=True)
    want = duckdb.sql(f"""
WITH e AS (SELECT * FROM read_parquet('{SF}/events.parquet')),
o AS (SELECT * FROM read_parquet('{SF}/orders.parquet')),
j AS (SELECT e.event_id, o.o_orderkey,
        row_number() OVER (PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM e JOIN o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
SELECT e.event_id, coalesce(j.o_orderkey, -1)::BIGINT AS o_orderkey
FROM e LEFT JOIN j ON j.event_id = e.event_id AND j.rn = 1
ORDER BY e.event_id""").df()
    np.testing.assert_array_equal(got["event_id"], want["event_id"])
    np.testing.assert_array_equal(got["o_orderkey"], want["o_orderkey"])


def test_range_join_count_matches_sql():
    from graphscope_ray.data.temporal import range_join_count
    left = ray.data.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    right = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    got = (range_join_count(left, right, by="o_custkey", on="o_orderdate",
                            window=np.timedelta64(90, "D"),
                            out_col="n90")
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    want = duckdb.sql(f"""
WITH o AS (SELECT * FROM read_parquet('{SF}/orders.parquet'))
SELECT l.o_orderkey, count(r.o_orderdate)::BIGINT AS n90
FROM o l JOIN o r ON r.o_custkey = l.o_custkey
 AND r.o_orderdate > l.o_orderdate - INTERVAL 90 DAY
 AND r.o_orderdate <= l.o_orderdate
GROUP BY l.o_orderkey ORDER BY l.o_orderkey""").df()
    np.testing.assert_array_equal(got["o_orderkey"], want["o_orderkey"])
    np.testing.assert_array_equal(got["n90"], want["n90"])
    assert got["o_orderkey"].dtype == np.int64


def test_asof_join_forward_direction():
    left = ray.data.from_pandas(pd.DataFrame({
        "k": [1, 1, 2], "t": [10, 50, 10], "lid": [0, 1, 2]}))
    right = ray.data.from_pandas(pd.DataFrame({
        "k": [1, 1, 2], "t": [20, 60, 5], "rid": [100, 101, 102]}))
    out = (asof_join(left, right, by="k", on="t",
                     value_cols=("rid",), direction="forward")
           .to_pandas().sort_values("lid"))
    assert out["rid"].fillna(-1).astype(int).tolist() == [100, 101, -1]


def test_hopping_windows_matches_sql():
    from graphscope_ray.data.temporal import hopping_windows
    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    got = (hopping_windows(ev, size_us=3600 * 1_000_000,
                           hop_us=900 * 1_000_000)
           .to_pandas().sort_values(["user_id", "wstart_us"])
           .reset_index(drop=True))
    want = duckdb.sql(f"""
WITH e AS (SELECT * FROM read_parquet('{SF}/events.parquet'))
SELECT user_id,
       (((epoch_us(ts) // 900000000) - j) * 900000000)::BIGINT AS wstart_us,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value
FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js
GROUP BY 1, 2 ORDER BY 1, 2""").df()
    np.testing.assert_array_equal(got["user_id"], want["user_id"])
    np.testing.assert_array_equal(got["wstart_us"], want["wstart_us"])
    np.testing.assert_array_equal(got["n_events"], want["n_events"])
    np.testing.assert_allclose(got["sum_value"], want["sum_value"],
                               atol=1e-9)
    # every event appears in exactly size/hop = 4 windows
    assert got["n_events"].sum() == 4 * ev.count()


def test_hopping_windows_rejects_misaligned_hop():
    import pytest
    from graphscope_ray.data.temporal import hopping_windows
    ev = ray.data.from_pandas(pd.DataFrame(
        {"user_id": [1], "ts": [np.datetime64("2024-01-01", "us")],
         "value": [1.0]}))
    with pytest.raises(ValueError):
        hopping_windows(ev, size_us=1000, hop_us=300)


def test_funnel_matches_sql_on_adversarial_orderings():
    from graphscope_ray.data.temporal import funnel
    from graphscope_ray import oracle_sql as osql
    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    rows = []
    # u0: clean a->b->c inside horizon (3 steps)
    rows += [(0, base, "a"), (0, base + H, "b"), (0, base + 2 * H, "c")]
    # u1: b before a — b must not count (1 step)
    rows += [(1, base, "b"), (1, base + H, "a")]
    # u2: c arrives past the horizon from t0 (2 steps)
    rows += [(2, base, "a"), (2, base + H, "b"),
             (2, base + np.timedelta64(80, "h"), "c")]
    # u3: never does a, plenty of b/c (0 steps)
    rows += [(3, base, "b"), (3, base + H, "c")]
    # u4: repeated a's — earliest starts the clock; c ties b's ts
    #     exactly (strict > means the tie does NOT advance) (2 steps)
    rows += [(4, base + H, "a"), (4, base, "a"),
             (4, base + 2 * H, "b"), (4, base + 2 * H, "c")]
    # u5: a then c with no b (1 step)
    rows += [(5, base, "a"), (5, base + H, "c")]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    got = (funnel(ray.data.from_pandas(df).repartition(3),
                  ["a", "b", "c"], horizon=np.timedelta64(72, "h"))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute(osql.funnel_sql(["a", "b", "c"], 72)).df()
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    assert (got["steps_completed"].to_numpy()
            == want["steps_completed"].to_numpy()).all()
    assert got["steps_completed"].tolist() == [3, 1, 2, 0, 2, 1]


def test_retention_matches_python_oracle(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.data.temporal import retention

    rng = np.random.default_rng(9)
    n = 600
    users = rng.integers(0, 40, size=n)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    offs = rng.integers(0, 90 * 86400, size=n).astype("timedelta64[s]")
    df = pd.DataFrame({"user_id": users.astype(np.int64),
                       "ts": base + offs.astype("timedelta64[us]")})
    got = (retention(ray.data.from_pandas(
        np.array_split(df, 4)), unit_days=7).to_pandas()
        .sort_values(["cohort", "offset_p"]).reset_index(drop=True))

    per = df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64) // 7
    o = pd.DataFrame({"user_id": df["user_id"], "per": per})
    first = o.groupby("user_id")["per"].transform("min")
    o["cohort"], o["offset_p"] = first, o["per"] - first
    want = (o[["user_id", "cohort", "offset_p"]].drop_duplicates()
            .groupby(["cohort", "offset_p"]).size().rename("n_users")
            .reset_index().sort_values(["cohort", "offset_p"])
            .reset_index(drop=True))
    assert got.shape == want.shape
    for c in ["cohort", "offset_p", "n_users"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # offset 0 of every cohort counts the whole cohort (every user is
    # active in their own first period)
    z = got[got["offset_p"] == 0]
    cohort_sizes = o.drop_duplicates("user_id").groupby("cohort").size()
    assert (z.set_index("cohort")["n_users"] == cohort_sizes).all()


def test_rolling_window_matches_python_oracle(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.data.temporal import rolling_window

    rng = np.random.default_rng(31)
    n = 500
    base = np.datetime64("2024-03-01T00:00:00", "us")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, size=n).astype(np.int64),
        # coarse grid forces exact ts ties within users
        "ts": base + (rng.integers(0, 40, size=n) * 43_200_000_000
                      ).astype("timedelta64[us]"),
        "value": np.round(rng.normal(10, 5, size=n), 3),
    })
    w = np.timedelta64(7, "D")
    got = (rolling_window(ray.data.from_pandas(np.array_split(df, 3)),
                          window=w).to_pandas()
           .sort_values("event_id").reset_index(drop=True))

    # brute-force oracle: closed frame [t-w, t], all ts peers included
    e6 = np.floor(np.abs(df["value"].to_numpy() * 1e6) + 0.5).astype(np.int64) \
        * np.sign(df["value"].to_numpy()).astype(np.int64)
    cnt = np.zeros(n, dtype=np.int64)
    sm = np.zeros(n, dtype=np.int64)
    u = df["user_id"].to_numpy()
    t = df["ts"].to_numpy()
    for i in range(n):
        m = (u == u[i]) & (t >= t[i] - w) & (t <= t[i])
        cnt[i] = m.sum()
        sm[i] = e6[m].sum()
    assert (got["w_count"].to_numpy() == cnt).all()
    assert (got["w_sum_e6"].to_numpy() == sm).all()


def test_rolling_window_bucket_invariance(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.data import temporal as T

    rng = np.random.default_rng(33)
    n = 300
    base = np.datetime64("2024-03-01T00:00:00", "us")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 50, size=n).astype(np.int64),
        "ts": base + rng.integers(0, 10**9, size=n).astype("timedelta64[us]"),
        "value": rng.normal(size=n),
    })
    w = np.timedelta64(1, "h")
    fast = (T.rolling_window(ray.data.from_pandas(df), window=w,
                             num_buckets=4).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    # bucket-count invariance: one bucket co-locates every key, so any
    # fast-path-vs-layout discrepancy would show as a diff here
    slow = (T.rolling_window(ray.data.from_pandas(df), window=w,
                             num_buckets=1).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    for c in ["w_count", "w_sum_e6"]:
        assert (fast[c].to_numpy() == slow[c].to_numpy()).all()
