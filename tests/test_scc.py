"""SCC (FW-BW-Trim coloring on the BSP actors) vs networkx's Tarjan,
over random digraphs at multiple densities / partition counts, with
and without the Trim phase."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

import networkx as nx

from graphscope_ray.graph.api import Graph


def _oracle(edges, n):
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(edges)
    want = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for v in comp:
            want[v] = m
    return want


def _run(edges, tmp, *, P=None, trim=True):
    src = pa.array([a for a, _ in edges], pa.int64())
    dst = pa.array([b for _, b in edges], pa.int64())
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    kw = {"num_parts": P} if P else {}
    g = Graph.from_edges(ds, workdir=str(tmp), directions="both", **kw)
    try:
        out = g.to_oid(g.scc(trim=trim),
                       vid_cols=("vid", "scc_id")).to_pandas()
        return dict(zip(out["vid"].astype(int), out["scc_id"].astype(int)))
    finally:
        g.close()


@pytest.mark.parametrize("seed,n,m,P,trim", [
    (1, 40, 60, 1, True),     # sparse: many small SCCs + tendrils
    (2, 40, 120, 3, True),    # denser: giant SCC emerges
    (3, 60, 75, 2, True),     # sub-critical
    (4, 30, 200, 4, True),    # strongly connected whp
    (5, 50, 70, 3, False),    # no trim: pure coloring must still agree
])
def test_random_digraph_vs_networkx(tmp_path, seed, n, m, P, trim):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    keep = s != d
    edges = list({(int(a), int(b)) for a, b in zip(s[keep], d[keep])})
    want = _oracle(edges, n)
    got = _run(edges, tmp_path / f"g{seed}", P=P, trim=trim)
    # vertices that appear in no edge are absent from the engine graph
    touched = {v for e in edges for v in e}
    assert got == {v: c for v, c in want.items() if v in touched}


def test_long_chain_trim(tmp_path):
    # pure DAG chain: Trim must resolve it without O(n) coloring rounds
    n = 30
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run(edges, tmp_path / "chain")
    assert got == {v: v for v in range(n)}


def test_two_cycles_bridge(tmp_path):
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)]
    got = _run(edges, tmp_path / "bridge", P=2)
    assert got == {0: 0, 1: 0, 2: 2, 3: 2}
