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
