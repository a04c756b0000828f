"""Campaign 6: lpa, dfs, bfs_generic, hits, sssp_path, incremental sssp."""
import sys, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd
import pyarrow as pa
import ray, ray.data
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False
from graphscope_ray import oracle
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine
from graphscope_ray.graph import api

def edges_ds(e, weights=None):
    cols = {"src": pa.array(e[:,0].astype("int64")), "dst": pa.array(e[:,1].astype("int64"))}
    if weights is not None: cols["weight"] = pa.array(np.asarray(weights, "float64"))
    return ray.data.from_arrow(pa.table(cols))

def collect(ds, col, n, fill=None):
    pdf = ds.to_pandas().sort_values("vid")
    if fill is None:
        assert len(pdf) == n, (len(pdf), n)
        return pdf[col].to_numpy()
    out = np.full(n, fill, dtype=np.asarray(pdf[col]).dtype)
    out[pdf["vid"].to_numpy()] = pdf[col].to_numpy()
    return out

rng = np.random.default_rng(31)
fails = []
t0 = time.time(); trial = 0
while time.time() - t0 < 360:
    trial += 1
    n = int(rng.integers(6, 70))
    m = int(rng.integers(2, n * 3))
    e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
    e = np.unique(e[e[:,0] != e[:,1]], axis=0)
    if len(e) < 2: continue
    P = int(rng.choice([1, 2, 5]))
    src = int(e[0, 0])
    tag = f"t{trial} n={n} m={len(e)} P={P}"
    d = tempfile.mkdtemp(prefix="fz6-")
    try:
        w = rng.integers(1, 8, size=len(e)).astype(np.float64)
        # incremental sssp: split edges, run, append, resume; vs full
        half = len(e) // 2
        if half >= 1:
            st = build_graph(edges_ds(e[:half], w[:half]), d+"/inc", num_parts=P,
                             num_vertices=n, weight_col="weight")
            eng = BSPEngine(st)
            _ = eng.sssp(src)
            seeds = eng.append_edges(edges_ds(e[half:], weights=w[half:]), weight_col="weight")
            got = collect(eng.sssp_incremental(seeds), "dist", n)
            want = oracle.sssp(e, n, src, weights=w)
            gg = np.where(np.isfinite(got), got, -1); ww_ = np.where(np.isfinite(want), want, -1)
            if not np.allclose(gg, ww_, atol=1e-9): fails.append((tag, "sssp_inc"))
            # sssp_path: parents must reconstruct the oracle distances
            pth = eng.sssp_path(src).to_pandas()
            dist = dict(zip(pth["vid"], pth["dist"]))
            par = dict(zip(pth["vid"], pth["pred"]))
            wmap = {}
            for (a, b), ww2 in zip(e, w):
                wmap[(int(a), int(b))] = min(wmap.get((int(a), int(b)), np.inf), ww2)
            ok = True
            for v, dv in dist.items():
                if not np.isfinite(dv) or v == src: continue
                p = par[v]
                if p < 0 or (p, v) not in wmap or \
                   abs(dist[p] + wmap[(p, v)] - dv) > 1e-9: ok = False; break
            if not ok: fails.append((tag, "sssp_path"))
            eng.shutdown()
        # dfs + bfs_generic on directed store
        st2 = build_graph(edges_ds(e), d+"/dir", num_parts=P, num_vertices=n)
        eng2 = BSPEngine(st2)
        bt = eng2.bfs_generic(src, output_format="predecessors").to_pandas()
        dep = oracle.bfs_depth(e, n, src)
        # every reached (non-src) vertex's pred must be at depth-1 with an edge
        es = set(map(tuple, e.tolist()))
        ok = True
        for _, r in bt.iterrows():
            v, p = int(r["node"]), int(r["predecessor"])
            pass
            if dep[v] < 0 or (p, v) not in es or dep[p] != dep[v] - 1: ok = False; break
        reached = {int(v) for v in bt["node"]} | {src}
        if ok: ok = reached == {i for i in range(n) if dep[i] >= 0}
        if not ok: fails.append((tag, "bfs_generic"))
        eng2.shutdown()
        # dfs (driver util, deterministic ascending-neighbor preorder)
        ranks = api.dfs(edges_ds(e), src, output_format="ranks").to_pandas()
        # oracle: iterative dfs ascending
        adj = {}
        for a, b in e: adj.setdefault(int(a), []).append(int(b))
        for k2 in adj: adj[k2].sort()
        seen, order_l, stack = set(), [], [src]
        while stack:
            v = stack.pop()
            if v in seen: continue
            seen.add(v); order_l.append(v)
            for u in reversed(adj.get(v, [])):
                if u not in seen: stack.append(u)
        want_rank = {v: i for i, v in enumerate(order_l)}
        got_rank = dict(zip(ranks["vid"].astype(int), ranks["rank"].astype(int)))
        if got_rank != want_rank: fails.append((tag, "dfs"))
        # hits on dual store
        st3 = build_graph(edges_ds(e), d+"/dual", num_parts=P, num_vertices=n,
                          directions="both")
        eng3 = BSPEngine(st3)
        out = eng3.hits(tolerance=1e-10, max_round=60).to_pandas().sort_values("vid")
        oa, oh = oracle.hits(e, n, tolerance=1e-10, max_round=60)
        if not (np.allclose(out["hub"], oh, atol=1e-6) and np.allclose(out["auth"], oa, atol=1e-6)):
            fails.append((tag, "hits"))
        eng3.shutdown()
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    if len(fails) > 4: break
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]: print(" ", f)
ray.shutdown()
