"""Campaign 9: dynamic mutation — random delete/update/remove-vertex
sequences applied in place on the resident pool vs a full rebuild from
the equivalently mutated edge table (numpy oracles)."""
import sys, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa
import ray, ray.data
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False
from graphscope_ray import oracle
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine


def edges_ds(e, weights=None):
    cols = {"src": pa.array(e[:, 0].astype("int64")),
            "dst": pa.array(e[:, 1].astype("int64"))}
    if weights is not None:
        cols["weight"] = pa.array(np.asarray(weights, "float64"))
    return ray.data.from_arrow(pa.table(cols))


def collect(ds, col, n, fill=None):
    pdf = ds.to_pandas().sort_values("vid")
    if fill is None:
        assert len(pdf) == n, (len(pdf), n)
        return pdf[col].to_numpy()
    out = np.full(n, fill, dtype=np.asarray(pdf[col]).dtype)
    out[pdf["vid"].to_numpy()] = pdf[col].to_numpy()
    return out


rng = np.random.default_rng(101)
fails = []
t0 = time.time(); trial = 0
while time.time() - t0 < 360:
    trial += 1
    n = int(rng.integers(8, 80))
    m = int(rng.integers(4, n * 3))
    e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
    e = np.unique(e[e[:, 0] != e[:, 1]], axis=0)
    if len(e) < 4:
        continue
    P = int(rng.choice([1, 2, 5]))
    hub = int(rng.choice([0, 3]))  # 0 = no hub split
    tag = f"t{trial} n={n} m={len(e)} P={P} hub={hub}"
    d = tempfile.mkdtemp(prefix="fz9-")
    try:
        w = rng.integers(1, 9, size=len(e)).astype(np.float64)
        st = build_graph(edges_ds(e, w), d + "/g", num_parts=P,
                         num_vertices=n, weight_col="weight",
                         hub_threshold=hub or None)
        eng = BSPEngine(st)

        # 1) random edge deletion (some ghosts mixed in)
        kill = rng.random(len(e)) < rng.uniform(0.1, 0.6)
        ghosts = rng.integers(0, n, size=(3, 2)).astype(np.int64)
        key_e = e[:, 0] * n + e[:, 1]
        ghosts = ghosts[~np.isin(ghosts[:, 0] * n + ghosts[:, 1], key_e)]
        req = np.r_[e[kill], ghosts] if len(ghosts) else e[kill]
        removed = eng.remove_edges(edges_ds(req))
        if removed != int(kill.sum()):
            fails.append((tag, "rm_count", removed, int(kill.sum())))
        kept, wk = e[~kill], w[~kill]

        got = collect(eng.pagerank(max_round=4), "rank", n)
        want = oracle.pagerank(kept, n, 0.85, 4)
        if not np.allclose(got, want, atol=1e-9):
            fails.append((tag, "pr_after_rm"))

        # 2) random weight updates on surviving edges
        if len(kept):
            upd = rng.random(len(kept)) < 0.5
            if upd.any():
                nw = rng.integers(1, 9, size=int(upd.sum())).astype(np.float64)
                wk = wk.copy(); wk[upd] = nw
                eng.update_edge_weights(edges_ds(kept[upd], weights=nw))
            src = int(kept[0, 0])
            got = collect(eng.sssp(src), "dist", n)
            want = oracle.sssp(kept, n, src, weights=wk)
            gg = np.where(np.isfinite(got), got, -1.0)
            ww = np.where(np.isfinite(want), want, -1.0)
            if not np.allclose(gg, ww, atol=1e-9):
                fails.append((tag, "sssp_after_upd"))

        # 3) random vertex deletion, then PageRank vs oracle on the
        # remnant (NOT wcc: the engine's WCC needs a symmetrized store,
        # this harness builds directed ones)
        victims = np.unique(rng.integers(0, n, size=int(rng.integers(1, 5))))
        eng.remove_vertices(victims)
        inc = np.isin(kept[:, 0], victims) | np.isin(kept[:, 1], victims)
        rem = kept[~inc]
        pdf = eng.pagerank(max_round=4).to_pandas().sort_values("vid")
        if np.isin(victims, pdf["vid"].to_numpy()).any():
            fails.append((tag, "victim_in_result"))
        if len(pdf) != n - len(victims):
            fails.append((tag, "row_count", len(pdf)))
        else:
            want = oracle.pagerank(rem, n, 0.85, 4)
            surv = pdf["vid"].to_numpy()
            if not np.allclose(pdf["rank"].to_numpy(), want[surv],
                               atol=1e-9):
                fails.append((tag, "pr_after_rmv"))

        # 4) append back the deleted edges: pagerank over rem+killed
        eng.append_edges(edges_ds(e[kill], weights=w[kill]),
                         weight_col="weight")
        e2 = np.r_[rem, e[kill]]
        pdf = eng.pagerank(max_round=4).to_pandas().sort_values("vid")
        want = oracle.pagerank(e2, n, 0.85, 4)
        if not np.allclose(pdf["rank"].to_numpy(),
                           want[pdf["vid"].to_numpy()], atol=1e-9):
            fails.append((tag, "pr_roundtrip"))

        eng.shutdown()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    if fails and len(fails) > 8:
        break

print("trials:", trial, "failures:", len(fails))
for f in fails[:8]:
    print("  FAIL", f)
ray.shutdown()
