"""Campaign 2: weighted sssp, kcore, louvain, eigenvector, vertex programs."""
import sys, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa
import ray, ray.data
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False
from graphscope_ray import oracle
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine
from graphscope_ray.graph.program import PIEWCCProgram, PageRankProgram

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

def canon_pairs(e):
    lo = np.minimum(e[:,0], e[:,1]); hi = np.maximum(e[:,0], e[:,1])
    keep = lo != hi
    return np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)

rng = np.random.default_rng(99)
fails = []
t_start = time.time(); trial = 0
while time.time() - t_start < 420:
    trial += 1
    n = int(rng.integers(5, 100))
    m = int(rng.integers(1, max(2, n * int(rng.integers(1, 5)))))
    e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
    e = e[e[:,0] != e[:,1]]
    if len(e) == 0: continue
    e = np.unique(e, axis=0)
    w = rng.integers(1, 10, size=len(e)).astype(np.float64)
    P = int(rng.choice([1, 2, 4, 7]))
    kk = int(rng.integers(1, 5))
    tag = f"t{trial} n={n} m={len(e)} P={P}"
    d = tempfile.mkdtemp(prefix="fz2-")
    try:
        st = build_graph(edges_ds(e, w), d+"/dir", num_parts=P, num_vertices=n, weight_col="weight")
        eng = BSPEngine(st)
        src = int(e[0,0])
        got = collect(eng.sssp(src), "dist", n)
        want = oracle.sssp(e, n, src, weights=w)
        if not np.allclose(np.where(np.isfinite(got), got, -1),
                           np.where(np.isfinite(want), want, -1), atol=1e-9):
            fails.append((tag, "sssp_w"))
        # vertex program (pregel pagerank, no dangling handling)
        out = eng.run_program(PageRankProgram(0.85), max_round=6)
        got = collect(out, "rank", n)
        outdeg = np.zeros(n, np.int64); np.add.at(outdeg, e[:,0], 1)
        r = np.full(n, 1.0/n)
        for _ in range(6):
            contrib = np.zeros(n)
            nz = outdeg[e[:,0]] > 0
            np.add.at(contrib, e[:,1][nz], (r[e[:,0]]/np.maximum(outdeg[e[:,0]],1))[nz])
            r = 0.85*contrib + 0.15/n
        if not np.allclose(got, r, atol=1e-12): fails.append((tag, "program_pr"))
        eng.shutdown()
        st2 = build_graph(edges_ds(e), d+"/sym", num_parts=P, num_vertices=n, symmetrize=True)
        eng2 = BSPEngine(st2)
        got = collect(eng2.kcore(kk), "in_core", n).astype(bool)
        want = oracle.kcore_members(canon_pairs(e), n, kk).astype(bool)
        if not np.array_equal(got, want): fails.append((tag, f"kcore k={kk}"))
        got = collect(eng2.run_program(PIEWCCProgram(), max_round=1000, stop_when_zero=True),
                      "label", n).astype(np.int64)
        if not np.array_equal(got, oracle.wcc(e, n)): fails.append((tag, "pie_wcc"))
        eng2.shutdown()
        # louvain: engine vs driver variant equality (both deterministic)
        from graphscope_ray.graph.louvain import louvain
        ce = canon_pairs(e)
        if len(ce):
            st3 = build_graph(edges_ds(ce), d+"/lv", num_parts=P, num_vertices=n, symmetrize=True)
            eng3 = BSPEngine(st3)
            v1, l1, q1 = louvain(edges_ds(ce), engine=eng3)
            v2, l2, q2 = louvain(edges_ds(ce))
            # driver path vertices = only endpoints; engine = all dense vids
            iso = np.setdiff1d(v1, v2)
            m1 = dict(zip(v1.tolist(), l1.tolist())); m2 = dict(zip(v2.tolist(), l2.tolist()))
            bad = [v for v in v2 if m1.get(v) != m2[v]] + [v for v in iso if m1[v] != v]
            if bad or abs(q1-q2) > 1e-12: fails.append((tag, f"louvain {bad[:3]} dq={q1-q2:.2e}"))
            eng3.shutdown()
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    if len(fails) > 4: break
print("trials:", trial, "failures:", len(fails))
for f in fails[:8]: print(" ", f)
ray.shutdown()
