"""Campaign 11: cogroup_join and dedup_pair_rows vs pandas oracles.

cogroup_join (union + coarse-bucket groupby + vectorized multi-group
cross product) must equal pandas' inner merge row-for-row on random
one-to-many key sets with sparse/empty sides, mixed dtypes in the
carried columns, and key skew; dedup_pair_rows must equal
drop_duplicates on (a, b)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd
import ray, ray.data
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False
from graphscope_ray.graph.joins import cogroup_join
from graphscope_ray.data.dedup import dedup_pair_rows

rng = np.random.default_rng(47)
fails = []
t0 = time.time(); trial = 0
while time.time() - t0 < 300:
    trial += 1
    tag = f"t{trial}"
    try:
        nl = int(rng.integers(0, 60))
        nr = int(rng.integers(0, 60))
        kspace = int(rng.integers(1, 20))  # small keyspace => fan-out
        left = pd.DataFrame({
            "k": rng.integers(0, kspace, nl).astype(np.int64),
            "lx": rng.integers(-5, 5, nl).astype(np.int64),
            "ls": pd.Series([f"s{i % 7}" for i in range(nl)],
                            dtype=object)})
        right = pd.DataFrame({
            "rk": rng.integers(0, kspace, nr).astype(np.int64),
            "rv": rng.standard_normal(nr),
            "rw": rng.integers(0, 9, nr).astype(np.int64)})
        lds = ray.data.from_pandas(left) if nl else \
            ray.data.from_pandas(left)
        rds = ray.data.from_pandas(right)
        got = cogroup_join(lds, rds, on="k", right_on="rk",
                           value_cols=["rv", "rw"]).to_pandas()
        want = left.merge(right, left_on="k", right_on="rk",
                          how="inner").drop(columns=["rk"])
        cols = ["k", "lx", "ls", "rv", "rw"]
        if not len(want):
            # empty-stream to_pandas drops columns entirely (Ray 2.49)
            if len(got):
                fails.append((tag, "cogroup_join nonempty"))
            continue
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        if not (len(got) == len(want)
                and np.array_equal(got["k"], want["k"])
                and np.array_equal(got["lx"], want["lx"])
                and (got["ls"] == want["ls"]).all()
                and np.allclose(got["rv"], want["rv"])
                and np.array_equal(got["rw"], want["rw"])):
            fails.append((tag, "cogroup_join")); continue

        npair = int(rng.integers(1, 80))
        pr = pd.DataFrame({
            "a": rng.integers(-10, 10, npair).astype(np.int64),
            "b": rng.integers(-10, 10, npair).astype(np.int64)})
        pr["extra"] = pr["a"] * 1000 + pr["b"]  # function of the pair
        nchunks = int(rng.integers(1, 4))
        parts = np.array_split(pr, nchunks)
        dd = dedup_pair_rows(ray.data.from_pandas(
            [p.reset_index(drop=True) for p in parts])).to_pandas()
        want2 = pr.drop_duplicates(subset=["a", "b"])
        key = ["a", "b", "extra"]
        dd = dd[key].sort_values(key).reset_index(drop=True)
        want2 = want2[key].sort_values(key).reset_index(drop=True)
        if not dd.equals(want2):
            fails.append((tag, "dedup_pair_rows"))
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    if len(fails) > 4:
        break
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]:
    print(" ", f)
ray.shutdown()
