"""Campaign 27: late-session-8 ops — square_count vs networkx
simple_cycles(4); modularity vs nx.community.modularity on random
labelings; attribute_conversions vs a pandas replay; NearestSeedProgram
vs a python multi-source BFS — across shapes and partition counts."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

import networkx as nx  # noqa: E402

from graphscope_ray.data.temporal import attribute_conversions  # noqa: E402
from graphscope_ray.graph.api import Graph, modularity, square_count  # noqa: E402
from graphscope_ray.graph.program import NearestSeedProgram  # noqa: E402

fails = []
rng = np.random.default_rng(27)


def rand_edges(tr):
    n = int(tr.integers(5, 90))
    m = int(tr.integers(4, max(5, n * 3)))
    src = tr.integers(0, n, m)
    dst = tr.integers(0, n, m)
    keep = src != dst
    if not keep.any():
        return None
    return (pd.DataFrame({"src": src[keep], "dst": dst[keep]})
            .drop_duplicates().reset_index(drop=True))


def trial_squares(i, tr):
    df = rand_edges(tr)
    if df is None:
        return
    P = int(tr.choice([1, 3, 6]))
    got = int(square_count(ray.data.from_pandas(df).repartition(P))
              ["squares"].iloc[0])
    G = nx.Graph()
    G.add_edges_from(zip(df["src"], df["dst"]))
    want = sum(1 for c in nx.simple_cycles(G, length_bound=4)
               if len(c) == 4)
    if got != want:
        fails.append((i, "squares", got, want))


def trial_modularity(i, tr):
    df = rand_edges(tr)
    if df is None:
        return
    verts = np.unique(np.r_[df["src"], df["dst"]])
    k = int(tr.integers(1, 6))
    labv = tr.integers(0, k, len(verts))
    lab = pd.DataFrame({"vid": verts, "label": labv})
    got = modularity(ray.data.from_pandas(df),
                     ray.data.from_pandas(lab))["modularity"].iloc[0]
    G = nx.Graph()
    G.add_edges_from(zip(df["src"], df["dst"]))
    comms = [set(verts[labv == j]) & set(G.nodes) for j in range(k)]
    want = nx.algorithms.community.modularity(
        G, [c for c in comms if c])
    if abs(got - want) > 1e-9:
        fails.append((i, "modularity", got, want))


def trial_attrib(i, tr):
    n_users = int(tr.integers(2, 30))
    n_events = int(tr.integers(10, 300))
    base = np.datetime64("2024-01-01", "ns")
    ts = base + tr.integers(0, 20 * 86400, n_events).astype(
        "timedelta64[s]").astype("timedelta64[ns]")
    df = pd.DataFrame({
        "event_id": np.arange(n_events, dtype=np.int64), "ts": ts,
        "user_id": tr.integers(0, n_users, n_events),
        "event_type": tr.choice(["click", "view", "purchase", "x"],
                                n_events),
        "value": np.round(tr.uniform(0, 9, n_events), 2)})
    w = np.timedelta64(int(tr.integers(1, 10)), "D")
    got = attribute_conversions(
        ray.data.from_pandas(df).repartition(int(tr.choice([1, 4]))),
        window=w).to_pandas()
    got_l = sorted(zip(got["conv_id"].astype(int),
                       got["first_touch_id"].astype(int),
                       got["last_touch_id"].astype(int))) if len(got) \
        else []
    wns = np.timedelta64(w).astype("timedelta64[ns]")
    want = []
    touches = df[df["event_type"].isin(("click", "view"))]
    for _, c in df[df["event_type"] == "purchase"].iterrows():
        t = touches[(touches["user_id"] == c["user_id"])
                    & (touches["ts"] <= c["ts"])
                    & (touches["ts"] >= c["ts"] - wns)]
        if len(t):
            t = t.sort_values(["ts", "event_id"], kind="mergesort")
            want.append((int(c["event_id"]), int(t["event_id"].iloc[0]),
                         int(t["event_id"].iloc[-1])))
    if got_l != sorted(want):
        fails.append((i, "attrib", len(got_l), len(want)))


def trial_nearest(i, tr):
    df = rand_edges(tr)
    if df is None:
        return
    P = int(tr.choice([1, 2, 4]))
    k = int(tr.integers(1, 5))
    g = Graph.from_edges(ray.data.from_pandas(df),
                         workdir=f"/tmp/fz27-{i}", num_parts=P,
                         symmetrize=True)
    try:
        V = g.store.num_vertices
        if V < k:
            return
        prog = NearestSeedProgram(np.arange(k),
                                  np.arange(k, dtype=float),
                                  scale=float(V))
        ds = g.engine.run_program(prog, max_round=200,
                                  stop_when_zero=True)

        def dec(t):
            p = t["packed"].to_numpy()
            ok = np.isfinite(p)
            return pa.table({"vid": t["vid"].to_numpy()[ok],
                             "dist": (p[ok] // V).astype(np.int64),
                             "seed": (p[ok] % V).astype(np.int64)})

        out = g.to_oid(ds.map_batches(dec, batch_format="pyarrow"),
                       vid_cols=("vid", "seed")).to_pandas()
        oids = np.sort(np.unique(np.r_[df["src"], df["dst"]]))
    finally:
        g.close()
    # python multi-source BFS oracle
    adj = {}
    for s, d in zip(df["src"], df["dst"]):
        adj.setdefault(int(s), set()).add(int(d))
        adj.setdefault(int(d), set()).add(int(s))
    from collections import deque
    best = {}
    for j in range(k):
        sv = int(oids[j])
        dist = {sv: 0}
        q = deque([sv])
        while q:
            u = q.popleft()
            for w2 in adj.get(u, ()):
                if w2 not in dist:
                    dist[w2] = dist[u] + 1
                    q.append(w2)
        for v, d in dist.items():
            if v not in best or (d, sv) < best[v]:
                best[v] = (d, sv)
    got = {int(v): (int(d), int(s)) for v, d, s in
           zip(out["vid"], out["dist"], out["seed"])}
    if got != best:
        fails.append((i, "nearest", len(got), len(best)))


t0 = time.perf_counter()
N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
for i in range(N):
    tr = np.random.default_rng(rng.integers(0, 2**63))
    trial_squares(i, tr)
    trial_modularity(i, tr)
    trial_attrib(i, tr)
    trial_nearest(i, tr)
    if fails:
        break
print(f"fuzz27: {N} trials (squares+modularity+attrib+nearest each), "
      f"{len(fails)} failures in {time.perf_counter() - t0:.1f}s")
for f in fails:
    print("FAIL", f)
ray.shutdown()
sys.exit(1 if fails else 0)
