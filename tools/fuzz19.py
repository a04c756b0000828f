"""Campaign 19: session-5 graph ops — k-truss, landmark closeness,
feature propagation — vs brute-force python/numpy oracles over random
graphs (disconnected pieces, multi-edges, stores with hub splits and
P ∈ {1..4})."""
import collections
import sys
import tempfile

sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

from graphscope_ray.graph.api import feature_propagate, ktruss  # noqa: E402
from graphscope_ray.graph.build import build_graph  # noqa: E402
from graphscope_ray.graph.engine import BSPEngine  # noqa: E402

fails, trial = [], 0
rng = np.random.default_rng(19)
for trial in range(1, 31):
    tag = f"t{trial}"
    try:
        n = int(rng.integers(5, 60))
        m = int(rng.integers(2, n * 4))
        e = rng.integers(0, n, size=(m, 2))
        e = e[e[:, 0] != e[:, 1]]
        if not len(e):
            continue
        edf = pd.DataFrame({"src": e[:, 0].astype(np.int64),
                            "dst": e[:, 1].astype(np.int64)})
        canon = {(min(a, b), max(a, b)) for a, b in e.tolist()}
        eds = ray.data.from_pandas(
            np.array_split(edf, int(rng.integers(1, 4))))

        # --- k-truss vs python peeling
        k = int(rng.integers(3, 7))
        E = set(canon)
        while True:
            adj = collections.defaultdict(set)
            for a, b in E:
                adj[a].add(b); adj[b].add(a)
            drop = {(a, b) for (a, b) in E
                    if len(adj[a] & adj[b]) < k - 2}
            if not drop:
                break
            E -= drop
        got = ktruss(eds, k).to_pandas()
        gset = (set() if len(got) == 0 else
                {(min(a, b), max(a, b))
                 for a, b in got[["src", "dst"]].to_numpy().tolist()})
        if gset != E:
            fails.append((tag, f"ktruss k={k}")); continue

        # --- landmark closeness vs numpy BFS
        nl = int(rng.integers(1, 4))
        lms = sorted(rng.choice(n, size=nl, replace=False).tolist())
        P = int(rng.integers(1, 5))
        hub = int(rng.choice([0, 4])) or None
        with tempfile.TemporaryDirectory() as td:
            store = build_graph(eds, td + "/s", num_parts=P,
                                num_vertices=n, symmetrize=True,
                                hub_threshold=hub)
            eng = BSPEngine(store)
            gc = (eng.closeness_landmarks(np.array(lms), unit=True)
                  .to_pandas().sort_values("vid").reset_index(drop=True))
            eng.shutdown()
        adj = collections.defaultdict(set)
        for a, b in canon:
            adj[a].add(b); adj[b].add(a)
        cnt = np.zeros(n, dtype=np.int64)
        sm = np.zeros(n)
        for l in lms:
            dist = np.full(n, np.inf); dist[l] = 0
            fr = [l]
            while fr:
                nxt = []
                for u in fr:
                    for w2 in adj[u]:
                        if dist[w2] == np.inf:
                            dist[w2] = dist[u] + 1; nxt.append(w2)
                fr = nxt
            fin = np.isfinite(dist)
            cnt[fin] += 1; sm[fin] += dist[fin]
        if not ((gc["reached"].to_numpy() == cnt).all()
                and np.allclose(gc["dist_sum"].to_numpy(), sm, atol=2e-6)):
            fails.append((tag, "closeness")); continue

        # --- sampled Brandes betweenness vs classic per-source oracle
        with tempfile.TemporaryDirectory() as td:
            store = build_graph(eds, td + "/s", num_parts=P,
                                num_vertices=n, symmetrize=True,
                                hub_threshold=hub)
            eng = BSPEngine(store)
            gb = (eng.betweenness_sources(np.array(lms)).to_pandas()
                  .sort_values("vid").reset_index(drop=True))
            eng.shutdown()
        bc = np.zeros(n)
        for s0 in lms:
            lvl = np.full(n, -1); lvl[s0] = 0
            fr = [s0]
            while fr:
                nxt = []
                for u in fr:
                    for w2 in adj[u]:
                        if lvl[w2] == -1:
                            lvl[w2] = lvl[u] + 1; nxt.append(w2)
                fr = nxt
            sig = np.zeros(n); sig[s0] = 1.0
            for L in range(0, max(lvl.max(), 0)):
                for u in range(n):
                    if lvl[u] == L:
                        for w2 in adj[u]:
                            if lvl[w2] == L + 1:
                                sig[w2] += sig[u]
            dl = np.zeros(n)
            for L in range(max(lvl.max(), 0), 0, -1):
                for v2 in range(n):
                    if lvl[v2] == L:
                        for u in adj[v2]:
                            if lvl[u] == L - 1:
                                dl[u] += sig[u] / sig[v2] * (1 + dl[v2])
            dl[s0] = 0.0
            bc += dl
        if not np.allclose(gb["betweenness"].to_numpy(), bc, atol=1e-9):
            fails.append((tag, "betweenness")); continue

        # --- feature propagation vs dense numpy
        d = int(rng.integers(1, 4))
        rounds = int(rng.integers(1, 4))
        X = rng.normal(size=(n, d))
        fcols = [f"f{i}" for i in range(d)]
        feats = pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                              **{c: X[:, i] for i, c in enumerate(fcols)}})
        gf = (feature_propagate(eds, ray.data.from_pandas(feats),
                                feat_cols=fcols, rounds=rounds,
                                weight_col=None).to_pandas()
              .sort_values("vid").reset_index(drop=True))
        A = np.zeros((n, n))
        for a, b in e.tolist():
            A[a, b] += 1  # multi-edges count per occurrence
        indeg = A.sum(axis=0)
        Y = X.copy()
        for _ in range(rounds):
            Y = (Y + A.T @ Y) / (1 + indeg)[:, None]
        if not np.allclose(gf[fcols].to_numpy(), Y, atol=2e-6):
            fails.append((tag, "feature_prop")); continue
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    if len(fails) > 4:
        break
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]:
    print(" ", f)
ray.shutdown()
