"""Minimum spanning forest (distributed Boruvka on the BSP actors) vs
a driver-side Kruskal under the same deterministic total edge order
(w, min(u,v), max(u,v)) — the MSF is unique under a total order, so
the two must agree edge-for-edge at any partition count."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.graph.api import Graph


def _kruskal(oids, src, dst, w):
    """Unique MSF under (w, min(u,v), max(u,v)) via union-find."""
    remap = {o: i for i, o in enumerate(oids)}
    s = np.array([remap[x] for x in src])
    d = np.array([remap[x] for x in dst])
    order = np.lexsort((np.maximum(src, dst), np.minimum(src, dst), w))
    par = np.arange(len(oids))

    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    out = []
    for i in order:
        u, v = find(s[i]), find(d[i])
        if u != v:
            par[u] = v
            out.append((min(src[i], dst[i]), max(src[i], dst[i]),
                        float(w[i])))
    return sorted(out)


def _rand_edges(rng, n, m, weighted=True, oid_offset=0):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep] + oid_offset, dst[keep] + oid_offset
    w = (rng.integers(1, 8, len(src)).astype(np.float64)
         if weighted else np.ones(len(src)))
    df = pd.DataFrame({"src": np.minimum(src, dst),
                       "dst": np.maximum(src, dst), "weight": w})
    return df.groupby(["src", "dst"], as_index=False)["weight"].min()


def _run(df, tmp, P):
    ds = ray.data.from_pandas(df)
    g = Graph.from_edges(ds, workdir=str(tmp), num_parts=P,
                         weight_col="weight", symmetrize=True)
    try:
        out = g.to_oid(g.msf(), vid_cols=("src", "dst")).to_pandas()
        return sorted(zip(out["src"].astype(int),
                          out["dst"].astype(int),
                          out["weight"].astype(float)))
    finally:
        g.close()


@pytest.mark.parametrize("n,m,P,weighted", [
    (40, 100, 1, True),
    (150, 500, 3, True),
    (200, 700, 4, False),
    (400, 300, 4, True),   # disconnected: many components
])
def test_msf_matches_kruskal(tmp_path, n, m, P, weighted):
    rng = np.random.default_rng(n * 7 + m)
    df = _rand_edges(rng, n, m, weighted)
    got = _run(df, tmp_path, P)
    oids = np.unique(np.r_[df["src"].to_numpy(), df["dst"].to_numpy()])
    want = _kruskal(oids, df["src"].to_numpy(), df["dst"].to_numpy(),
                    df["weight"].to_numpy())
    assert got == want
    # forest invariant: |E| = |V| - #components
    assert len(got) <= len(oids) - 1


def test_msf_partition_count_independent(tmp_path):
    rng = np.random.default_rng(99)
    df = _rand_edges(rng, 120, 400)
    results = [_run(df, tmp_path / f"p{P}", P) for P in (1, 2, 5)]
    assert results[0] == results[1] == results[2]


def test_msf_heavy_tie_weights(tmp_path):
    """All weights equal → tie-break falls entirely to (a, b); the
    forest must still be the unique lexicographically-least one."""
    rng = np.random.default_rng(5)
    df = _rand_edges(rng, 80, 500, weighted=False)
    got = _run(df, tmp_path, 3)
    oids = np.unique(np.r_[df["src"].to_numpy(), df["dst"].to_numpy()])
    want = _kruskal(oids, df["src"].to_numpy(), df["dst"].to_numpy(),
                    df["weight"].to_numpy())
    assert got == want


def test_msf_two_vertices(tmp_path):
    df = pd.DataFrame({"src": [10], "dst": [20], "weight": [3.0]})
    assert _run(df, tmp_path, 2) == [(10, 20, 3.0)]


def test_msf_total_weight_vs_networkx(tmp_path):
    """Weight sum (tie-break-independent) against networkx Kruskal."""
    nx = pytest.importorskip("networkx")
    rng = np.random.default_rng(17)
    df = _rand_edges(rng, 100, 350)
    got = _run(df, tmp_path, 4)
    G = nx.Graph()
    for s, d, w in df.itertuples(index=False):
        G.add_edge(int(s), int(d), weight=float(w))
    want = sum(d["weight"] for _, _, d in
               nx.minimum_spanning_edges(G, data=True))
    assert abs(sum(w for _, _, w in got) - want) < 1e-9
