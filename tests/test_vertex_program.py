"""User vertex-program surface: examples vs oracles."""

import numpy as np
import pytest

from graphscope_ray import oracle
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine
from graphscope_ray.graph.program import MinLabelProgram, PageRankProgram

from conftest import collect, edges_ds, random_graph


def pregel_pagerank_oracle(edges, n, delta, rounds):
    """Textbook variant (pagerank_pregel.h): no dangling handling."""
    outdeg = np.zeros(n, dtype=np.int64)
    np.add.at(outdeg, edges[:, 0], 1)
    r = np.full(n, 1.0 / n)
    for _ in range(rounds):
        contrib = np.zeros(n)
        nz = outdeg[edges[:, 0]] > 0
        vals = r[edges[:, 0]] / np.maximum(outdeg[edges[:, 0]], 1)
        np.add.at(contrib, edges[:, 1][nz], vals[nz])
        r = delta * contrib + (1 - delta) / n
    return r


@pytest.mark.parametrize("P", [1, 4])
def test_pagerank_program(tmp_path, P):
    e, n = random_graph(seed=51), 60
    store = build_graph(edges_ds(e), str(tmp_path / f"vp{P}"),
                        num_parts=P, num_vertices=n)
    eng = BSPEngine(store)
    out = eng.run_program(PageRankProgram(0.85), max_round=10)
    got = collect(out, "rank", n)
    want = pregel_pagerank_oracle(e, n, 0.85, 10)
    np.testing.assert_allclose(got, want, atol=1e-12)
    eng.shutdown()


def test_min_label_program_equals_wcc(tmp_path):
    e, n = random_graph(seed=53), 60
    store = build_graph(edges_ds(e), str(tmp_path / "vpw"),
                        num_parts=3, num_vertices=n, symmetrize=True)
    eng = BSPEngine(store)
    out = eng.run_program(MinLabelProgram(), max_round=1000,
                          stop_when_zero=True)
    got = collect(out, "label", n).astype(np.int64)
    want = oracle.wcc(e, n)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()


@pytest.mark.parametrize("P", [1, 4])
def test_pie_wcc_program(tmp_path, P):
    from graphscope_ray.graph.program import PIEWCCProgram
    e, n = random_graph(seed=57), 60
    store = build_graph(edges_ds(e), str(tmp_path / f"pie{P}"),
                        num_parts=P, num_vertices=n, symmetrize=True)
    eng = BSPEngine(store)
    out = eng.run_program(PIEWCCProgram(), max_round=1000,
                          stop_when_zero=True)
    got = collect(out, "label", n).astype(np.int64)
    np.testing.assert_array_equal(got, oracle.wcc(e, n))
    # PEval on P=1 sees the whole (symmetrized) graph — every label is
    # final before the first superstep, so IncEval stops after ONE
    # zero-changed reconciliation round; that is the PIE split working
    if P == 1:
        assert eng.supersteps == 1
    eng.shutdown()


@pytest.mark.parametrize("P", [1, 4])
def test_sssp_pregel_program(tmp_path, P):
    """SSSPPregelProgram (sssp_pregel.h twin: min-combine, use_weight
    scatter) converges to the Bellman-Ford fixpoint on a weighted
    symmetrized store."""
    from graphscope_ray.graph.program import SSSPPregelProgram
    rng = np.random.default_rng(61)
    e, n = random_graph(seed=61), 60
    # canonical undirected pairs (a<b), one weight each — otherwise
    # symmetrize would hold two copies of a directed pair with
    # different weights (partgraph-shape input)
    e = np.unique(np.sort(e, axis=1), axis=0)
    w = rng.integers(1, 9, size=len(e)).astype(np.float64)
    store = build_graph(edges_ds(e, weights=w), str(tmp_path / f"sp{P}"),
                        num_parts=P, num_vertices=n, symmetrize=True,
                        weight_col="weight")
    eng = BSPEngine(store)
    out = eng.run_program(SSSPPregelProgram(0), max_round=1000,
                          stop_when_zero=True)
    got = collect(out, "dist", n, fill=np.inf)
    ew = np.concatenate([w, w])
    want = oracle.sssp(np.concatenate([e, e[:, ::-1]]), n, 0, weights=ew)
    np.testing.assert_allclose(got, want)
    eng.shutdown()


def test_sssp_pregel_unweighted_is_bfs(tmp_path):
    """use_weight on an unweighted store = unit weights = BFS depths."""
    from graphscope_ray.graph.program import SSSPPregelProgram
    e, n = random_graph(seed=63), 60
    store = build_graph(edges_ds(e), str(tmp_path / "spu"),
                        num_parts=3, num_vertices=n, symmetrize=True)
    eng = BSPEngine(store)
    out = eng.run_program(SSSPPregelProgram(0), max_round=1000,
                          stop_when_zero=True)
    got = collect(out, "dist", n, fill=np.inf)
    want = oracle.sssp(np.concatenate([e, e[:, ::-1]]), n, 0)
    np.testing.assert_allclose(got, want)
    eng.shutdown()


def test_program_with_hub_split(tmp_path):
    from conftest import STAR_HUB
    store = build_graph(edges_ds(STAR_HUB), str(tmp_path / "vph"),
                        num_parts=3, num_vertices=9, hub_threshold=2)
    eng = BSPEngine(store)
    out = eng.run_program(PageRankProgram(0.85), max_round=10)
    got = collect(out, "rank", 9)
    want = pregel_pagerank_oracle(STAR_HUB, 9, 0.85, 10)
    np.testing.assert_allclose(got, want, atol=1e-12)
    eng.shutdown()


def _mis_oracle(n, edges, seed):
    """Sequential Luby replay with the same fmix64 priorities."""
    import numpy as np
    from graphscope_ray.data.hashing import fmix64

    pri = (fmix64(np.arange(n, dtype=np.int64).view(np.uint64)
                  ^ np.uint64(seed)) >> np.uint64(11)).astype(float)
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    status = np.zeros(n, dtype=int)
    while (status == 0).any():
        join = []
        for v in range(n):
            if status[v]:
                continue
            mx = max((pri[u] for u in adj[v] if status[u] == 0),
                     default=-1.0)
            if pri[v] > mx:
                join.append(v)
        if not join:
            break
        for v in join:
            status[v] = 1
        for v in join:
            for u in adj[v]:
                if status[u] == 0:
                    status[u] = 2
    return status


@pytest.mark.parametrize("parts", [1, 4])
def test_mis_program(ray_session, parts, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.graph.api import Graph

    rng = np.random.default_rng(25)
    n = 60
    e = rng.integers(0, n, size=(150, 2))
    e = e[e[:, 0] != e[:, 1]]
    eds = ray.data.from_pandas(pd.DataFrame(
        {"src": e[:, 0].astype(np.int64),
         "dst": e[:, 1].astype(np.int64)}))
    g = Graph.from_edges(eds, workdir=str(tmp_path / f"m{parts}"),
                         num_parts=parts, symmetrize=True)
    try:
        got = (g.to_oid(g.mis(seed=7)).to_pandas()
               .sort_values("vid").reset_index(drop=True))
        oids = sorted(set(e[:, 0]) | set(e[:, 1]))
        vid_of = {o: i for i, o in enumerate(oids)}
        # oracle over the dense-vid graph (priority keys off vids)
        dense_edges = [(vid_of[a], vid_of[b]) for a, b in e.tolist()]
        want = _mis_oracle(len(oids), dense_edges, 7)
        assert got["status"].tolist() == want.tolist()
        # independence: no edge inside the MIS
        in_mis = set(got.loc[got.status == 1, "vid"])
        assert not any(a in in_mis and b in in_mis for a, b in e.tolist())
        # maximality: every non-MIS vertex has an MIS neighbor
        adj = {}
        for a, b in e.tolist():
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for v in got.loc[got.status == 2, "vid"]:
            assert adj[v] & in_mis
        assert (got["status"] != 0).all()
    finally:
        g.close()
