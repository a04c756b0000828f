"""Randomized differential campaign: random graphs x random P vs numpy
oracles for pagerank/wcc/cdlp/sssp/bfs/triangles/kcore."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa
import ray, ray.data
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False
from graphscope_ray import oracle
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine
import tempfile, shutil

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

def sym_rows(e):
    b = np.vstack([e, e[:, ::-1]])
    b = b[b[:,0] != b[:,1]]
    return np.unique(b, axis=0)

def canon_pairs(e):
    lo = np.minimum(e[:,0], e[:,1]); hi = np.maximum(e[:,0], e[:,1])
    keep = lo != hi
    return np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)

rng = np.random.default_rng(20260817)
fails = []
t_start = time.time()
trial = 0
while time.time() - t_start < 600:
    trial += 1
    n = int(rng.integers(5, 120))
    m = int(rng.integers(1, max(2, n * int(rng.integers(1, 6)))))
    e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
    e = e[e[:,0] != e[:,1]]
    if len(e) == 0: continue
    e = np.unique(e, axis=0)
    P = int(rng.choice([1, 2, 3, 5, 8]))
    hub = int(rng.choice([0, 2, 10**9]))  # 0 -> everything hubs? threshold>deg; use None-ish
    hub_threshold = {0: 1, 2: 2, 10**9: None}[hub]
    tag = f"trial{trial} n={n} m={len(e)} P={P} hub={hub_threshold}"
    d = tempfile.mkdtemp(prefix="fuzz-")
    try:
        # directed store for pagerank/sssp/bfs
        st = build_graph(edges_ds(e), d + "/dir", num_parts=P, num_vertices=n,
                         hub_threshold=hub_threshold)
        eng = BSPEngine(st)
        got = collect(eng.pagerank(delta=0.85, max_round=8), "rank", n)
        want = oracle.pagerank(e, n, delta=0.85, max_round=8)
        if not np.allclose(got, want, atol=1e-10): fails.append((tag, "pagerank"))
        src = int(e[0,0])
        got = collect(eng.bfs(src), "depth", n, fill=np.int64(-1))
        want = oracle.bfs_depth(e, n, src)
        want = np.where(np.isfinite(want), want, -1).astype(np.int64) if want.dtype != np.int64 else want
        if not np.array_equal(got, want): fails.append((tag, "bfs"))
        eng.shutdown()
        # symmetrized store for wcc/cdlp/kcore/triangles
        st2 = build_graph(edges_ds(e), d + "/sym", num_parts=P, num_vertices=n,
                          symmetrize=True, hub_threshold=hub_threshold)
        eng2 = BSPEngine(st2)
        got = collect(eng2.wcc(), "comp", n)
        if not np.array_equal(got, oracle.wcc(e, n)): fails.append((tag, "wcc"))
        got = collect(eng2.cdlp(max_round=5), "label", n)
        if not np.array_equal(got, oracle.cdlp(sym_rows(e), n, max_round=5)):
            fails.append((tag, "cdlp"))
        got = collect(eng2.triangles(), "tri_cnt", n)
        if not np.array_equal(got, oracle.triangles_per_vertex(canon_pairs(e), n)):
            fails.append((tag, "triangles"))
        eng2.shutdown()
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    if fails and len(fails) > 4: break
print("trials:", trial, "failures:", len(fails))
for f in fails[:10]: print(" ", f)
ray.shutdown()
