"""Campaign 3: temporal ops vs DuckDB on random frames (ties, gaps, dups)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd, duckdb
import ray, ray.data
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False
from graphscope_ray.data.temporal import session_windows, hopping_windows, asof_join

rng = np.random.default_rng(7)
fails = []
t0 = time.time(); trial = 0
while time.time() - t0 < 360:
    trial += 1
    n = int(rng.integers(1, 400))
    nk = int(rng.integers(1, 8))
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 3*3600, size=n).astype("timedelta64[s]").astype("timedelta64[us]")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, nk, size=n).astype(np.int64),
        "ts": ts, "value": np.round(rng.normal(0, 50, n), 3)})
    ds = ray.data.from_pandas(df)
    con = duckdb.connect(); con.register("events", df)
    tag = f"t{trial} n={n} k={nk}"
    try:
        # sessions (30 min gap)
        got = (session_windows(ds).to_pandas()
               .sort_values(["user_id","session_start"]).reset_index(drop=True))
        want = con.execute("""
WITH o AS (SELECT user_id, ts, value, event_id,
  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM events),
s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS UNBOUNDED PRECEDING) AS sid FROM o)
SELECT user_id, min(ts) session_start, max(ts) session_end,
       count(*)::BIGINT n_events, round(sum(value),6) sum_value
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""").df()
        if not (len(got)==len(want)
                and np.array_equal(got["user_id"], want["user_id"])
                and np.array_equal(got["n_events"], want["n_events"])
                and np.allclose(got["sum_value"], want["sum_value"], atol=1e-6)):
            fails.append((tag, "sessions"))
        # hopping 1h/15min
        got = (hopping_windows(ds).to_pandas()
               .sort_values(["user_id","wstart_us"]).reset_index(drop=True))
        want = con.execute("""
SELECT user_id, (((epoch_us(ts) // 900000000) - j) * 900000000)::BIGINT wstart_us,
       count(*)::BIGINT n_events, round(sum(value),6) sum_value
FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) j) js
GROUP BY 1,2 ORDER BY 1,2""").df()
        if not (len(got)==len(want)
                and np.array_equal(got["wstart_us"], want["wstart_us"])
                and np.array_equal(got["n_events"], want["n_events"])
                and np.allclose(got["sum_value"], want["sum_value"], atol=1e-6)):
            fails.append((tag, "hopping"))
        # asof: right table random
        nr = int(rng.integers(1, 200))
        rdf = pd.DataFrame({
            "k": rng.integers(0, nk, size=nr).astype(np.int64),
            "t": base + rng.integers(0, 3*3600, size=nr).astype("timedelta64[s]").astype("timedelta64[us]"),
            "rid": np.arange(nr, dtype=np.int64)})
        con.register("rt", rdf)
        got = (asof_join(ds, ray.data.from_pandas(rdf),
                         by="user_id", right_by="k", on="ts", right_on="t",
                         value_cols=("rid",), tiebreak=("rid",))
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        want = con.execute("""
WITH j AS (SELECT e.event_id, r.rid,
  row_number() OVER (PARTITION BY e.event_id ORDER BY r.t DESC, r.rid DESC) rn
  FROM events e JOIN rt r ON r.k = e.user_id AND r.t <= e.ts)
SELECT e.event_id, coalesce(j.rid, -1)::BIGINT AS rid
FROM events e LEFT JOIN j ON j.event_id = e.event_id AND j.rn = 1
ORDER BY e.event_id""").df()
        g = got["rid"].fillna(-1).astype(np.int64).to_numpy()
        if not np.array_equal(g, want["rid"].to_numpy()):
            fails.append((tag, "asof"))
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    if len(fails) > 4: break
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]: print(" ", f)
ray.shutdown()
