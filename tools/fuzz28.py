"""Campaign 28: final session-8 ops — range_search vs numpy
brute-force at random radii; rfm_segments vs a pandas replay of the
explicit-threshold scoring; user_zscores vs a pandas stddev-samp
replay; doc_keywords-style per-group top-k rank stability — across
sizes, thresholds and partition counts."""
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

from graphscope_ray.data.similarity import range_search  # noqa: E402
from graphscope_ray.data.temporal import user_zscores  # noqa: E402
from graphscope_ray.pipelines.relational import rfm_segments  # noqa: E402
from graphscope_ray.util import round_half_away  # noqa: E402

fails = []
rng = np.random.default_rng(28)


def trial_range(i, tr):
    n = int(tr.integers(20, 400))
    d = int(tr.choice([4, 16, 64]))
    vecs = tr.normal(size=(n, d)).astype(np.float32)
    emb = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(vecs)})
    ds = ray.data.from_pandas(emb).repartition(int(tr.choice([1, 3, 7])))
    nq = int(tr.integers(1, 4))
    queries = vecs[:nq].astype(np.float64)
    th = float(tr.choice([0.05, 0.3, 0.8, 0.99]))
    got = range_search(ds, queries, threshold=th).to_pandas()
    got_set = (set(zip(got["query_id"].astype(int),
                       got["vec_id"].astype(int))) if len(got) else set())
    v = np.stack(emb["embedding"].to_numpy())
    vn = v / np.linalg.norm(v.astype(np.float64), axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = round_half_away(vn @ qn.T, 6)
    vi, qi = np.nonzero(sims >= th)
    if got_set != set(zip(qi.tolist(), vi.tolist())):
        fails.append((i, "range", th, len(got_set)))


def trial_rfm(i, tr, tmp):
    n_cust = int(tr.integers(2, 60))
    n_orders = int(tr.integers(n_cust, 400))
    base = np.datetime64("2023-01-01", "ns")
    df = pd.DataFrame({
        "o_orderkey": np.arange(n_orders, dtype=np.int64),
        "o_custkey": tr.integers(0, n_cust, n_orders),
        "o_orderdate": base + tr.integers(0, 900, n_orders).astype(
            "timedelta64[D]").astype("timedelta64[ns]"),
        "o_totalprice": np.round(tr.uniform(1, 9999, n_orders), 2)})
    sf = os.path.join(tmp, f"rfm{i}")
    os.makedirs(sf, exist_ok=True)
    df.to_parquet(os.path.join(sf, "orders.parquet"))
    got = rfm_segments(sf).to_pandas()
    cents = round_half_away(df["o_totalprice"].to_numpy() * 100.0,
                            0).astype(np.int64)
    c = (df.assign(cents=cents).groupby("o_custkey")
         .agg(rec=("o_orderdate", "max"), freq=("o_orderkey", "count"),
              mon=("cents", "sum")).reset_index())
    n = len(c)

    def th(s):
        v = np.sort(s.to_numpy())
        return [v[max(0, math.ceil(q * n) - 1)] for q in (.25, .5, .75)]

    tr_, tf_, tm_ = th(c["rec"]), th(c["freq"]), th(c["mon"])
    want = {}
    for _, row in c.iterrows():
        r = 1 + sum(row["rec"] > t for t in tr_)
        f = 1 + sum(row["freq"] > t for t in tf_)
        mm = 1 + sum(row["mon"] > t for t in tm_)
        want[int(row["o_custkey"])] = (r, f, mm)
    got_map = {int(r.cust): (int(r.r_score), int(r.f_score),
                             int(r.m_score)) for r in got.itertuples()}
    if got_map != want:
        fails.append((i, "rfm", n_cust, n_orders))


def trial_zscore(i, tr):
    n = int(tr.integers(5, 500))
    nu = int(tr.integers(1, 40))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": tr.integers(0, nu, n),
        "value": np.round(tr.uniform(0, 99, n), 2)})
    got = user_zscores(ray.data.from_pandas(df)
                       .repartition(int(tr.choice([1, 4])))).to_pandas()
    cents = round_half_away(df["value"].to_numpy() * 100.0,
                            0).astype(np.int64)
    want = {}
    for uid, g in df.assign(c=cents).groupby("user_id"):
        nn = len(g)
        if nn < 2:
            continue
        sx, sxx = int(g["c"].sum()), int((g["c"].astype(object) ** 2).sum())
        if nn * sxx - sx * sx <= 0:
            continue
        sd = np.sqrt(float(nn * sxx - sx * sx) / float(nn * (nn - 1)))
        for eid, cc in zip(g["event_id"], g["c"]):
            want[int(eid)] = float(round_half_away(
                float(int(cc) * nn - sx) / (sd * nn), 6))
    got_map = (dict(zip(got["event_id"].astype(int), got["z"]))
               if len(got) else {})
    if got_map != want:
        fails.append((i, "zscore", len(got_map), len(want)))


t0 = time.perf_counter()
N = int(sys.argv[1]) if len(sys.argv) > 1 else 25
import tempfile
tmp = tempfile.mkdtemp(prefix="fz28-")
for i in range(N):
    tr = np.random.default_rng(rng.integers(0, 2**63))
    trial_range(i, tr)
    trial_rfm(i, tr, tmp)
    trial_zscore(i, tr)
    if fails:
        break
print(f"fuzz28: {N} trials (range+rfm+zscore each), "
      f"{len(fails)} failures in {time.perf_counter() - t0:.1f}s")
for f in fails:
    print("FAIL", f)
ray.shutdown()
sys.exit(1 if fails else 0)
