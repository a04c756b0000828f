"""Campaign 24: the session-7 operators — SCC (FW-BW-Trim coloring)
vs networkx Tarjan over random digraph shapes × partition counts ×
trim on/off; tc_pregel (Pregel triangle messages) vs a literal Python
replay of the reference loop; weighted_sample (Efraimidis-Spirakis)
vs a numpy replay across block layouts."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

import networkx as nx  # noqa: E402

from graphscope_ray.data.curate import _row_hash, weighted_sample  # noqa: E402
from graphscope_ray.graph.api import Graph, tc_pregel  # noqa: E402
from graphscope_ray.util import round_half_away  # noqa: E402

fails = []
rng = np.random.default_rng(24)


def rand_digraph(tr):
    n = int(tr.integers(5, 80))
    shape = tr.choice(["gnm", "cycle_chain", "dense", "dag"])
    seed = int(tr.integers(0, 10_000))
    if shape == "gnm":
        m = int(tr.integers(n, n * 3))
        h = nx.gnm_random_graph(n, m, seed=seed, directed=True)
        edges = list(h.edges)
    elif shape == "cycle_chain":
        # chained cycles with random bridges: many mid-size SCCs
        edges, base = [], 0
        while base < n - 2:
            k = int(tr.integers(2, min(8, n - base)))
            edges += [(base + i, base + (i + 1) % k) for i in range(k)]
            if base:
                edges.append((base - 1, base))
            base += k
        edges += [(int(tr.integers(0, base)), int(tr.integers(0, base)))
                  for _ in range(n // 3)]
        edges = [(a, b) for a, b in edges if a != b]
    elif shape == "dense":
        m = int(tr.integers(n * 3, n * 6))
        h = nx.gnm_random_graph(n, m, seed=seed, directed=True)
        edges = list(h.edges)
    else:
        h = nx.gnm_random_graph(n, 2 * n, seed=seed, directed=True)
        edges = [(min(a, b), max(a, b)) for a, b in h.edges if a != b]
    return sorted(set(edges))


def trial_scc(i, tr):
    edges = rand_digraph(tr)
    if not edges:
        return None
    P = int(tr.integers(1, 5))
    trim = bool(tr.integers(0, 2))
    g = nx.DiGraph()
    g.add_edges_from(edges)
    want = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for v in comp:
            want[v] = m
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64())}))
    eg = Graph.from_edges(ds, workdir=f"/tmp/gsr-f24-{i}",
                          directions="both", num_parts=P)
    try:
        out = eg.to_oid(eg.scc(trim=trim),
                        vid_cols=("vid", "scc_id")).to_pandas()
    finally:
        eg.close()
    got = dict(zip(out["vid"].astype(int), out["scc_id"].astype(int)))
    if got != want:
        return f"scc mismatch P={P} trim={trim} |E|={len(edges)}"
    return None


def brute_tc(edges):
    out, inn = {}, {}
    verts = set()
    for s, d in edges:
        out.setdefault(s, []).append(d)
        inn.setdefault(d, []).append(s)
        verts.update((s, d))
    counter = {v: 0 for v in verts}
    for v in verts:
        for b in out.get(v, []):
            vst = set()
            for c in inn.get(v, []) + out.get(v, []):
                if c in vst:
                    continue
                vst.add(c)
                if b in out.get(c, []):
                    counter[c] += 1
    return {v: counter[v] // 2 for v in verts}


def trial_tc(i, tr):
    edges = rand_digraph(tr)
    if tr.integers(0, 2):  # symmetrize half the trials
        edges = sorted(set(edges) | {(b, a) for a, b in edges})
    if not edges:
        return None
    want = brute_tc(edges)
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64())}))
    lim = 0 if tr.integers(0, 4) == 0 else 20_000_000  # join path 25%
    pdf = tc_pregel(ds, broadcast_edge_limit=lim).to_pandas()
    got = dict(zip(pdf["vid"].astype(int), pdf["tc"].astype(int)))
    if got != want:
        return f"tc_pregel mismatch lim={lim} |E|={len(edges)}"
    return None


def trial_ws(i, tr):
    n = int(tr.integers(20, 800))
    k = int(tr.integers(1, n + 5))
    seed = int(tr.integers(0, 1000))
    ids = np.arange(n, dtype=np.int64) * int(tr.integers(1, 7)) + 3
    w = tr.choice([1.0, 0.5])
    w = tr.integers(0, 10_000, n).astype(np.float64) / 7.0
    h = _row_hash(ids, seed)
    u = np.maximum((h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53,
                   2.0 ** -53)
    keep = w > 0
    s = round_half_away(np.log(u[keep]) / w[keep], 9)
    ii = ids[keep]
    order = np.lexsort((ii, -s))[: k]
    want = set(ii[order].tolist())
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "w": w}))
    ds = ds.repartition(int(tr.integers(1, 9)))
    out = weighted_sample(ds, k, weight_col="w", seed=seed).to_pandas()
    got = set(out["doc_id"].astype(int))
    if got != want:
        return f"weighted_sample mismatch n={n} k={k} seed={seed}"
    return None


TRIALS = [("scc", trial_scc, 16), ("tc", trial_tc, 12), ("ws", trial_ws, 12)]
t0 = time.time()
total = 0
for name, fn, cnt in TRIALS:
    for i in range(cnt):
        tr = np.random.default_rng(rng.integers(0, 2 ** 31))
        try:
            err = fn(i, tr)
        except Exception as e:  # noqa: BLE001
            err = f"exception: {type(e).__name__}: {e}"
        total += 1
        if err:
            fails.append(f"[{name}#{i}] {err}")
            print(f"FAIL [{name}#{i}] {err}", flush=True)

print(f"{total} trials, {len(fails)} failures in {time.time() - t0:.0f}s")
if fails:
    sys.exit(1)
print("fuzz24 CLEAN")
ray.shutdown()
