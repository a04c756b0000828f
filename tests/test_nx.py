"""Differential tests: graphscope_ray.nx vs the real networkx package.

The reference validates its NX layer by running the upstream networkx
test-suite against it (python/graphscope/nx/tests/). The analogue
here: every bridge function is compared against networkx itself on
random graphs (gnm, fixed seeds). networkx's scipy-backed entry
points (pagerank, hits) use their pure-python/numpy twins because
scipy is not in this container.
"""
import numpy as np
import pytest

import networkx as nx
from networkx.algorithms.link_analysis.hits_alg import _hits_numpy
from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

import graphscope_ray.nx as gnx


def _pair(nxg, num_parts=2):
    """(facade graph, nx graph) with identical edges/nodes."""
    g = gnx.DiGraph(num_parts=num_parts) if nxg.is_directed() \
        else gnx.Graph(num_parts=num_parts)
    g.add_nodes_from(nxg.nodes)
    g.add_edges_from((u, v, dict(d)) for u, v, d in nxg.edges(data=True))
    return g, nxg


@pytest.fixture(scope="module")
def und():
    """Random undirected graph + facade twin (has an isolated node)."""
    h = nx.gnm_random_graph(40, 120, seed=11)
    h.add_node(99)  # isolated
    g, h = _pair(h)
    yield g, h
    g.close()


@pytest.fixture(scope="module")
def und_conn(und):
    """Giant component of `und` (connected, for eigen/apl tests)."""
    _, h = und
    giant = h.subgraph(max(nx.connected_components(h), key=len)).copy()
    g, giant = _pair(giant)
    yield g, giant
    g.close()


@pytest.fixture(scope="module")
def dig():
    h = nx.gnm_random_graph(40, 160, seed=13, directed=True)
    g, h = _pair(h)
    yield g, h
    g.close()


def _close(a: dict, b: dict, tol=1e-8):
    assert set(a) == set(b)
    return max(abs(a[n] - b[n]) for n in a) <= tol if a else True


# ---- bookkeeping (no engine) ------------------------------------------


def test_bookkeeping_matches_networkx(und, dig):
    for g, h in (und, dig):
        assert len(g) == len(h)
        assert g.number_of_edges() == h.number_of_edges()
        assert sorted(g.nodes) == sorted(h.nodes)
        assert sorted(map(tuple, map(sorted, g.edges))) == \
            sorted(map(tuple, map(sorted, h.edges)))
        assert dict(g.degree()) == dict(h.degree())
        for n in list(h)[:5]:
            assert sorted(g.neighbors(n)) == sorted(h.neighbors(n))
            assert g.has_node(n) and n in g
    g, h = dig
    assert dict(g.in_degree()) == dict(h.in_degree())
    assert dict(g.out_degree()) == dict(h.out_degree())


def test_subgraph_reverse_to_undirected(dig):
    g, h = dig
    keep = list(h)[:15]
    gs, hs = g.subgraph(keep), h.subgraph(keep)
    assert sorted(gs.edges) == sorted(hs.edges)
    gr, hr = g.reverse(), h.reverse()
    assert sorted(gr.edges) == sorted(hr.edges)
    gu, hu = g.to_undirected(), h.to_undirected()
    assert gu.number_of_edges() == hu.number_of_edges()


def test_size_weighted():
    g = gnx.Graph()
    g.add_weighted_edges_from([(0, 1, 2.5), (1, 2, 1.5), (2, 2, 3.0)])
    h = nx.Graph()
    h.add_weighted_edges_from([(0, 1, 2.5), (1, 2, 1.5), (2, 2, 3.0)])
    assert g.size(weight="weight") == h.size(weight="weight")
    assert g.degree(2) == h.degree(2)  # self-loop counts twice


# ---- ranking / centrality ---------------------------------------------


def test_pagerank(und, dig):
    for g, h in (und, dig):
        a = gnx.pagerank(g, tol=1e-12, max_iter=200)
        b = _pagerank_python(h, tol=1e-13, max_iter=500)
        assert _close(a, b, 1e-8)


def test_pagerank_dangling():
    """Directed sinks: nx redistributes dangling in-mass uniformly
    (NXPageRankProgram), unlike the GAE benchmark PageRank which is
    why the reference nx bridge leaves pagerank unimplemented
    (nx/algorithms/builtin.py:48-50)."""
    h = nx.DiGraph([(0, 1), (0, 2), (1, 2), (3, 2), (2, 4)])
    h.add_node(5)  # isolated = dangling too
    g = gnx.DiGraph(num_parts=2)
    g.add_nodes_from(h.nodes)
    g.add_edges_from(h.edges)
    try:
        a = gnx.pagerank(g, tol=1e-12, max_iter=300)
        b = _pagerank_python(h, tol=1e-13, max_iter=600)
        assert _close(a, b, 1e-8)
    finally:
        g.close()


def test_hits(dig):
    g, h = dig
    hub_g, auth_g = gnx.hits(g, tol=1e-13, max_iter=1000)
    hub_h, auth_h = _hits_numpy(h, normalized=True)
    assert _close(hub_g, hub_h, 1e-7)
    assert _close(auth_g, auth_h, 1e-7)


def test_degree_centrality(und, dig):
    for g, h in (und, dig):
        assert _close(gnx.degree_centrality(g), nx.degree_centrality(h))
    g, h = dig
    assert _close(gnx.in_degree_centrality(g), nx.in_degree_centrality(h))
    assert _close(gnx.out_degree_centrality(g), nx.out_degree_centrality(h))


def test_eigenvector_centrality(und_conn):
    g, h = und_conn
    a = gnx.eigenvector_centrality(g, tol=1e-12, max_iter=10_000)
    b = nx.eigenvector_centrality(h, tol=1e-13, max_iter=10_000)
    assert _close(a, b, 1e-6)


def test_katz_centrality(und, dig):
    for g, h in (und, dig):
        a = gnx.katz_centrality(g, alpha=0.05, tol=1e-12, max_iter=5000)
        b = nx.katz_centrality(h, alpha=0.05, tol=1e-13, max_iter=5000)
        assert _close(a, b, 1e-7)


# ---- paths -------------------------------------------------------------


def test_sssp_lengths_unit_and_weighted(und, dig):
    for g, h in (und, dig):
        src = min(h)
        a = gnx.single_source_dijkstra_path_length(g, src)
        b = dict(nx.single_source_dijkstra_path_length(h, src))
        assert a == {k: float(v) for k, v in b.items()}
    # weighted: deterministic weights from the edge key
    g, h = und
    hw = nx.Graph()
    hw.add_weighted_edges_from(
        (u, v, 1.0 + ((u * 7 + v * 13) % 5)) for u, v in h.edges)
    gw, hw = _pair(hw)
    try:
        src = min(hw)
        a = gnx.single_source_dijkstra_path_length(gw, src)
        b = dict(nx.single_source_dijkstra_path_length(hw, src))
        assert _close(a, {k: float(v) for k, v in b.items()}, 1e-12)
    finally:
        gw.close()


def test_shortest_path_valid(und):
    g, h = und
    src = min(h)
    paths = gnx.shortest_path(g, src)
    lens = dict(nx.single_source_shortest_path_length(h, src))
    assert set(paths) == set(lens)
    for n, p in paths.items():
        assert p[0] == src and p[-1] == n
        assert len(p) - 1 == lens[n]           # shortest
        for u, v in zip(p, p[1:]):             # a real path
            assert h.has_edge(u, v)


def test_has_path(und):
    g, h = und
    src = min(h)
    for tgt in list(h)[:8] + [99]:
        assert gnx.has_path(g, src, tgt) == nx.has_path(h, src, tgt)


def test_average_shortest_path_length(und_conn, und):
    g, h = und_conn
    assert abs(gnx.average_shortest_path_length(g)
               - nx.average_shortest_path_length(h)) < 1e-9
    gd, _ = und
    with pytest.raises(nx.NetworkXError):
        gnx.average_shortest_path_length(gd)  # disconnected


def test_bfs(und):
    g, h = und
    src = min(h)
    edges = gnx.bfs_edges(g, src)
    depth_nx = dict(nx.single_source_shortest_path_length(h, src))
    depth = {src: 0}
    for u, v in edges:   # parents must appear before children
        assert u in depth
        depth[v] = depth[u] + 1
        assert h.has_edge(u, v)
    assert depth == depth_nx
    # depth_limit
    lim = gnx.bfs_edges(g, src, depth_limit=2)
    assert {v for _, v in lim} == {n for n, d in depth_nx.items()
                                   if 0 < d <= 2}
    # predecessors / successors / tree agree with the edge list
    assert gnx.bfs_predecessors(g, src) == [(v, u) for u, v in edges]
    succ = dict(gnx.bfs_successors(g, src))
    assert sorted((u, v) for u, vs in succ.items() for v in vs) == \
        sorted(edges)
    T = gnx.bfs_tree(g, src)
    assert sorted(T.edges) == sorted(edges)
    assert T.has_node(src)


# ---- cores / clustering -------------------------------------------------


def test_k_core_and_core_number(und):
    g, h = und
    for k in (1, 2, 3, None):
        sg = gnx.k_core(g, k)
        sh = nx.k_core(h, k)
        assert sorted(sg.nodes) == sorted(sh.nodes)
        assert sorted(map(tuple, map(sorted, sg.edges))) == \
            sorted(map(tuple, map(sorted, sh.edges)))
    assert gnx.core_number(g) == nx.core_number(h)


def test_clustering_family(und):
    g, h = und
    assert gnx.triangles(g) == nx.triangles(h)
    assert gnx.triangles(g, [0, 1, 2]) == {n: nx.triangles(h, n)
                                           for n in [0, 1, 2]}
    assert _close(gnx.clustering(g), nx.clustering(h), 1e-12)
    assert abs(gnx.transitivity(g) - nx.transitivity(h)) < 1e-12
    assert abs(gnx.average_clustering(g)
               - nx.average_clustering(h)) < 1e-12
    assert abs(gnx.average_clustering(g, count_zeros=False)
               - nx.average_clustering(h, count_zeros=False)) < 1e-12
    with pytest.raises(nx.NetworkXNotImplemented):
        gnx.clustering(gnx.DiGraph([(0, 1)]))


# ---- connectivity --------------------------------------------------------


def test_connected_components(und, dig):
    g, h = und
    a = sorted(map(sorted, gnx.connected_components(g)))
    b = sorted(map(sorted, nx.connected_components(h)))
    assert a == b
    assert gnx.number_connected_components(g) == \
        nx.number_connected_components(h)
    assert gnx.is_connected(g) == nx.is_connected(h)
    g, h = dig
    a = sorted(map(sorted, gnx.weakly_connected_components(g)))
    b = sorted(map(sorted, nx.weakly_connected_components(h)))
    assert a == b
    assert gnx.is_weakly_connected(g) == nx.is_weakly_connected(h)


def test_strongly_connected_components(dig):
    g, h = dig
    a = sorted(map(sorted, gnx.strongly_connected_components(g)))
    b = sorted(map(sorted, nx.strongly_connected_components(h)))
    assert a == b
    assert gnx.number_strongly_connected_components(g) == \
        nx.number_strongly_connected_components(h)
    assert gnx.is_strongly_connected(g) == nx.is_strongly_connected(h)


def test_scc_sparse_with_isolated():
    h = nx.gnm_random_graph(30, 45, seed=21, directed=True)
    h.add_node(77)  # isolated: its own SCC
    g, h = _pair(h, num_parts=3)
    try:
        a = sorted(map(sorted, gnx.strongly_connected_components(g)))
        b = sorted(map(sorted, nx.strongly_connected_components(h)))
        assert a == b
    finally:
        g.close()


def test_scc_rejects_undirected(und):
    g, _ = und
    with pytest.raises(nx.NetworkXNotImplemented, match="DiGraph"):
        list(gnx.strongly_connected_components(g))


# ---- mutation invalidates the backing -----------------------------------


def test_mutation_invalidation():
    h = nx.gnm_random_graph(20, 50, seed=5)
    g, h = _pair(h)
    try:
        assert _close(gnx.pagerank(g, tol=1e-12),
                      _pagerank_python(h, tol=1e-13))
        # mutate both the same way; facade must rebuild its backing
        rm = list(h.edges)[:5]
        g.remove_edges_from(rm)
        h.remove_edges_from(rm)
        g.remove_node(3)
        h.remove_node(3)
        g.add_edge(100, 101)
        h.add_edge(100, 101)
        assert _close(gnx.pagerank(g, tol=1e-12),
                      _pagerank_python(h, tol=1e-13))
        assert sorted(map(sorted, gnx.connected_components(g))) == \
            sorted(map(sorted, nx.connected_components(h)))
    finally:
        g.close()


def test_string_node_ids():
    """String oids flow through the whole bridge (reference
    oid_type=string, framework/graph.py:108-111)."""
    h = nx.gnm_random_graph(15, 40, seed=3)
    hs = nx.relabel_nodes(h, {n: f"node-{n:02d}" for n in h})
    g, hs = _pair(hs)
    try:
        assert _close(gnx.pagerank(g, tol=1e-12),
                      _pagerank_python(hs, tol=1e-13))
        assert gnx.triangles(g) == nx.triangles(hs)
        assert sorted(map(sorted, gnx.connected_components(g))) == \
            sorted(map(sorted, nx.connected_components(hs)))
    finally:
        g.close()


def test_mixed_node_types_rejected():
    g = gnx.Graph([(1, "a")])
    with pytest.raises(TypeError):
        gnx.pagerank(g)


def test_empty_and_tiny():
    g = gnx.Graph()
    assert gnx.pagerank(g) == {}
    assert gnx.degree_centrality(g) == {}
    g.add_node(7)
    # networkx convention: single-node graphs score 1
    assert gnx.degree_centrality(g) == {7: 1}
    try:
        assert gnx.pagerank(g) == {7: 1.0}
        assert list(gnx.connected_components(g)) == [{7}]
    finally:
        g.close()


def test_maximal_independent_set(ray_session):
    import numpy as np

    import graphscope_ray.nx as gnx

    rng = np.random.default_rng(28)
    G = gnx.Graph()
    n = 40
    edges = rng.integers(0, n, size=(90, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    G.add_edges_from(map(tuple, edges.tolist()))
    mis = gnx.maximal_independent_set(G)
    s = set(mis)
    assert mis == sorted(mis)
    # independence
    for a, b in G.edges():
        assert not (a in s and b in s)
    # maximality: every non-member has a member neighbor
    for v in G.nodes():
        if v not in s:
            assert any(u in s for u in G.neighbors(v))
    # deterministic
    assert gnx.maximal_independent_set(G) == mis
    # directed graphs are rejected
    D = gnx.DiGraph()
    D.add_edge(1, 2)
    import pytest as _pytest
    with _pytest.raises(nx.NetworkXNotImplemented):
        gnx.maximal_independent_set(D)


def test_minimum_spanning_edges_and_tree(ray_session):
    rng = np.random.default_rng(33)
    h = nx.gnm_random_graph(35, 90, seed=5)
    for u, v in h.edges():
        h[u][v]["weight"] = float(rng.integers(1, 50))
    h.add_node(77)  # isolated — forest, not tree
    g, h = _pair(h)
    try:
        got = gnx.minimum_spanning_edges(g, data=True)
        want = list(nx.minimum_spanning_edges(h, data=True))
        # total weight always matches; edge sets match here because the
        # integer weights of this seed have no cross-cut ties that
        # change Kruskal's choice set
        assert abs(sum(d["weight"] for *_, d in got)
                   - sum(d["weight"] for *_, d in want)) < 1e-9
        assert len(got) == len(want)
        T = gnx.minimum_spanning_tree(g)
        try:
            assert set(T.nodes) == set(h.nodes)
            assert T.number_of_edges() == len(want)
        finally:
            T.close()
        # no-data form
        pairs = gnx.minimum_spanning_edges(g, data=False)
        assert len(pairs) == len(got)
        assert all(isinstance(p, tuple) and len(p) == 2 for p in pairs)
    finally:
        g.close()


def test_maximal_matching(ray_session):
    h = nx.gnm_random_graph(40, 110, seed=9)
    g, h = _pair(h)
    try:
        got = gnx.maximal_matching(g)
        # matching: each vertex at most once
        flat = [v for e in got for v in e]
        assert len(flat) == len(set(flat))
        matched = set(flat)
        # maximal: every edge touches a matched vertex
        for u, v in h.edges():
            assert u in matched or v in matched
        # size within the 2-approximation band of nx's greedy
        ref = nx.maximal_matching(h)
        assert len(got) * 2 >= len(ref)
        # deterministic
        assert gnx.maximal_matching(g) == got
    finally:
        g.close()
