"""Campaign 18: cohort retention + trailing rolling-window aggregate
vs DuckDB over randomized event streams — dense ts-tie grids, lone
users, single-event cohorts, negative values, 1-4 block layouts,
window sizes from minutes to months."""
import sys

sys.path.insert(0, "/root/repo")
import duckdb
import numpy as np
import pandas as pd
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

from graphscope_ray.data.temporal import retention, rolling_window  # noqa: E402
from graphscope_ray.oracle_sql import retention_sql, rolling_window_sql  # noqa: E402

fails, trial = [], 0
rng = np.random.default_rng(18)
for trial in range(1, 41):
    tag = f"t{trial}"
    try:
        n = int(rng.integers(1, 800))
        nu = int(rng.integers(1, 60))
        base = np.datetime64("2023-06-01T00:00:00", "us")
        # mix of fine-grained and coarse-grid timestamps (forces ties)
        grid = int(rng.choice([1, 3_600_000_000, 86_400_000_000]))
        span = int(rng.integers(1, 200)) * 86_400_000_000
        ts = base + ((rng.integers(0, max(span // grid, 1), size=n)
                      * grid).astype("timedelta64[us]"))
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, nu, size=n).astype(np.int64),
            "ts": ts,
            "value": np.round(rng.normal(0, 50, size=n), 4),
        })
        nblocks = int(rng.integers(1, 5))
        ds = ray.data.from_pandas(
            np.array_split(df, nblocks) if n >= nblocks else [df])
        con = duckdb.connect()
        con.register("events", df)

        # --- retention
        unit = int(rng.choice([1, 7, 30]))
        got = (retention(ds, unit_days=unit).to_pandas()
               .sort_values(["cohort", "offset_p"]).reset_index(drop=True))
        want = con.execute(retention_sql(unit)).df()
        if not (got.shape == want.shape and all(
                (got[c].to_numpy() == want[c].to_numpy()).all()
                for c in ["cohort", "offset_p", "n_users"])):
            fails.append((tag, "retention vs sql")); continue

        # --- rolling window
        wdays = int(rng.choice([1, 7, 45]))
        gotr = (rolling_window(
            ds, window=np.timedelta64(wdays, "D"),
            num_buckets=int(rng.choice([1, 4, 64]))).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
        wantr = con.execute(rolling_window_sql(wdays)).df()
        if not all((gotr[c].to_numpy() == wantr[c].to_numpy()).all()
                   for c in ["event_id", "user_id", "w_count", "w_sum_e6"]):
            fails.append((tag, "rolling vs sql")); continue
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    if len(fails) > 4:
        break
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]:
    print(" ", f)
ray.shutdown()
