"""NearestSeedProgram vs a python multi-source-BFS oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.graph.api import Graph
from graphscope_ray.graph.program import NearestSeedProgram


def _oracle(df, seeds_labels):
    adj = {}
    for s, d in zip(df["src"], df["dst"]):
        adj.setdefault(int(s), set()).add(int(d))
        adj.setdefault(int(d), set()).add(int(s))
    best = {}  # v -> (dist, label)
    from collections import deque
    # multi-source BFS over (dist, label) lexicographic order:
    # process seeds in label order so smaller labels win ties
    for sv, lab in sorted(seeds_labels, key=lambda x: x[1]):
        dist = {sv: 0}
        q = deque([sv])
        while q:
            u = q.popleft()
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for v, d in dist.items():
            if v not in best or (d, lab) < best[v]:
                best[v] = (d, lab)
    return {v: dl for v, dl in best.items()}


@pytest.mark.parametrize("n,m,P,k", [(40, 100, 2, 3), (120, 360, 4, 6)])
def test_nearest_seed_vs_bfs(tmp_path, n, m, P, k):
    rng = np.random.default_rng(n + m)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    df = pd.DataFrame({"src": src[keep], "dst": dst[keep]}).drop_duplicates()
    g = Graph.from_edges(ray.data.from_pandas(df), workdir=str(tmp_path),
                         num_parts=P, symmetrize=True)
    try:
        V = g.store.num_vertices
        seeds = np.arange(k)  # vids 0..k-1 = k smallest oids
        prog = NearestSeedProgram(seeds, seeds.astype(float),
                                  scale=float(V))
        ds = g.engine.run_program(prog, max_round=200,
                                  stop_when_zero=True)

        def dec(t: pa.Table) -> pa.Table:
            p = t["packed"].to_numpy()
            ok = np.isfinite(p)
            return pa.table({"vid": t["vid"].to_numpy()[ok],
                             "dist": (p[ok] // V).astype(np.int64),
                             "seed": (p[ok] % V).astype(np.int64)})

        out = g.to_oid(ds.map_batches(dec, batch_format="pyarrow"),
                       vid_cols=("vid", "seed")).to_pandas()
        oids = np.sort(np.unique(np.r_[df["src"], df["dst"]]))
        want = _oracle(df, [(int(oids[i]), int(oids[i]))
                            for i in range(k)])
    finally:
        g.close()
    got = {int(v): (int(d), int(s)) for v, d, s in
           zip(out["vid"], out["dist"], out["seed"])}
    assert got == want
