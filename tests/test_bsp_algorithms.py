"""Engine vs independent numpy/scipy oracle on micro + random graphs,
at multiple partition counts (replicates the reference's worker-count
invariance test, /root/reference/python/tests/test_scalability.py:40-59).
"""

import numpy as np
import pytest

from graphscope_ray import oracle
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine

from conftest import (
    CHAIN_10,
    DANGLING_PAIR,
    STAR_HUB,
    TWO_TRIANGLES_BRIDGE,
    collect,
    edges_ds,
    random_graph,
)


def make_engine(tmp_path, edges_np, n, P, symmetrize=False, weights=None,
                hub_threshold=None):
    ds = edges_ds(edges_np, weights)
    store = build_graph(
        ds,
        str(tmp_path / f"store-{P}-{symmetrize}"),
        num_parts=P,
        num_vertices=n,
        symmetrize=symmetrize,
        weight_col="weight" if weights is not None else None,
        hub_threshold=hub_threshold,
    )
    return BSPEngine(store)


def symm(e):
    return np.unique(np.r_[e, e[:, ::-1]], axis=0)


@pytest.mark.parametrize("P", [1, 2, 5])
@pytest.mark.parametrize(
    "edges,n",
    [
        (DANGLING_PAIR, 3),
        (STAR_HUB, 9),
        (random_graph(), 60),
    ],
)
def test_pagerank_fixed_round(tmp_path, P, edges, n):
    eng = make_engine(tmp_path, edges, n, P)
    got = collect(eng.pagerank(delta=0.85, max_round=10), "rank", n)
    want = oracle.pagerank(edges, n, 0.85, 10)
    np.testing.assert_allclose(got, want, atol=1e-12)
    eng.shutdown()


def test_pagerank_tol_mode(tmp_path):
    e, n = random_graph(), 60
    eng = make_engine(tmp_path, e, n, 3)
    got = collect(eng.pagerank(delta=0.85, tol=1e-6), "rank", n)
    want = oracle.pagerank(e, n, 0.85, tol=1e-6)
    np.testing.assert_allclose(got, want, atol=1e-9)
    eng.shutdown()


def test_pagerank_hub_split_invariance(tmp_path):
    """Splitting hub out-edges across partitions must not change results."""
    e, n = STAR_HUB, 9
    plain = make_engine(tmp_path, e, n, 3)
    split = make_engine(tmp_path, e, n, 3, hub_threshold=2)
    assert len(split.store.meta["hubs"]) > 0
    a = collect(plain.pagerank(max_round=10), "rank", n)
    b = collect(split.pagerank(max_round=10), "rank", n)
    np.testing.assert_allclose(a, b, atol=1e-14)
    plain.shutdown()
    split.shutdown()


@pytest.mark.parametrize("P", [1, 2, 5])
@pytest.mark.parametrize(
    "edges,n",
    [
        (TWO_TRIANGLES_BRIDGE, 6),
        (CHAIN_10, 10),
        (random_graph(), 60),
    ],
)
def test_wcc(tmp_path, P, edges, n):
    eng = make_engine(tmp_path, edges, n, P, symmetrize=True)
    got = collect(eng.wcc(), "comp", n)
    want = oracle.wcc(edges, n)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()


def test_wcc_isolated_vertices(tmp_path):
    # vertices 6,7 have no edges: each its own component
    eng = make_engine(tmp_path, TWO_TRIANGLES_BRIDGE, 8, 3, symmetrize=True)
    got = collect(eng.wcc(), "comp", 8)
    assert got[6] == 6 and got[7] == 7
    eng.shutdown()


@pytest.mark.parametrize("P", [2, 4])
def test_cdlp(tmp_path, P):
    e, n = random_graph(seed=11), 60
    eng = make_engine(tmp_path, e, n, P, symmetrize=True)
    got = collect(eng.cdlp(max_round=10), "label", n)
    want = oracle.cdlp(symm(e), n, max_round=10)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()


def test_lpa_weighted(tmp_path):
    e = TWO_TRIANGLES_BRIDGE
    w = np.array([1.0, 2.0, 1.0, 3.0, 1.0, 1.0, 0.5])
    n = 6
    eng = make_engine(tmp_path, e, n, 2, symmetrize=True, weights=w)
    got = collect(eng.cdlp(max_round=5, weighted=True), "label", n)
    es = np.r_[e, e[:, ::-1]]
    ws = np.r_[w, w]
    want = oracle.cdlp(es, n, max_round=5, weights=ws)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()


@pytest.mark.parametrize("P", [1, 3])
def test_sssp_weighted(tmp_path, P):
    e, n = random_graph(seed=3), 60
    rng = np.random.default_rng(5)
    w = rng.uniform(0.5, 3.0, size=len(e))
    eng = make_engine(tmp_path, e, n, P, weights=w)
    got = collect(eng.sssp(0), "dist", n)
    want = oracle.sssp(e, n, 0, w)
    np.testing.assert_allclose(got, want, atol=1e-12)
    eng.shutdown()


def test_bfs(tmp_path):
    e, n = CHAIN_10, 10
    eng = make_engine(tmp_path, e, n, 2)
    got = collect(eng.bfs(0), "depth", n)
    want = oracle.bfs_depth(e, n, 0)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()


@pytest.mark.parametrize("k", [2, 3])
def test_kcore(tmp_path, k):
    e, n = random_graph(seed=13, ensure_dangling=False), 60
    eng = make_engine(tmp_path, e, n, 3, symmetrize=True)
    got = collect(eng.kcore(k), "in_core", n)
    uv = np.unique(np.sort(e, axis=1), axis=0)
    want = oracle.kcore_members(uv, n, k)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()


def test_kshell(tmp_path):
    e, n = random_graph(seed=13, ensure_dangling=False), 60
    eng = make_engine(tmp_path, e, n, 3, symmetrize=True)
    got = collect(eng.kshell(2), "in_shell", n)
    uv = np.unique(np.sort(e, axis=1), axis=0)
    want = oracle.kcore_members(uv, n, 2) & ~oracle.kcore_members(uv, n, 3)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()


def test_pagerank_checkpoint_resume(tmp_path):
    """Kill after round 4 (simulated), resume from checkpoint, results
    must equal the uninterrupted run (north-rule resumability)."""
    e, n = random_graph(seed=21), 60
    ck = str(tmp_path / "ckpt")
    eng = make_engine(tmp_path, e, n, 3)
    full = collect(eng.pagerank(max_round=10), "rank", n)
    eng.shutdown()

    eng1 = make_engine(tmp_path, e, n, 3)
    eng1.pagerank(max_round=4, checkpoint_dir=ck, checkpoint_every=2)
    eng1.shutdown()  # "crash"

    eng2 = make_engine(tmp_path, e, n, 3)
    got = collect(
        eng2.pagerank(max_round=10, checkpoint_dir=ck, checkpoint_every=2,
                      resume=True),
        "rank", n,
    )
    np.testing.assert_allclose(got, full, atol=1e-14)
    eng2.shutdown()


def test_ppr_matches_numpy_power_iteration(tmp_path):
    e, n = random_graph(seed=17), 60
    eng = make_engine(tmp_path, e, n, 3, symmetrize=True)
    seeds = [0, 5, 9]
    got = collect(eng.ppr(seeds, delta=0.85, max_round=6), "rank", n)
    # numpy oracle on the symmetrized simple graph
    und = set()
    for a, b in e:
        if a != b:
            und.add((a, b)); und.add((b, a))
    A = np.zeros((n, n))
    for a, b in und:
        A[a, b] = 1.0
    outdeg = A.sum(axis=1)
    P = np.divide(A, outdeg[:, None], out=np.zeros_like(A),
                  where=outdeg[:, None] > 0)
    base = np.zeros(n)
    base[seeds] = 1.0 / len(seeds)
    r = base.copy()
    for _ in range(6):
        r = 0.15 * base + 0.85 * (P.T @ r)
    np.testing.assert_allclose(got, r, atol=1e-12)
    eng.shutdown()
