"""Eigenvector / Katz / HITS / degree centrality + triangles/clustering
vs the numpy oracle."""

import numpy as np
import pytest

import ray.data

from graphscope_ray import oracle
from graphscope_ray.graph import api
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine

from conftest import TWO_TRIANGLES_BRIDGE, collect, edges_ds, random_graph


def make_engine(tmp_path, edges_np, n, P, tag="", **kw):
    store = build_graph(edges_ds(edges_np), str(tmp_path / f"s{P}{tag}"),
                        num_parts=P, num_vertices=n, **kw)
    return BSPEngine(store)


@pytest.mark.parametrize("P", [1, 3])
def test_eigenvector(tmp_path, P):
    e, n = random_graph(seed=17, ensure_dangling=False), 60
    eng = make_engine(tmp_path, e, n, P)
    got = collect(eng.eigenvector_centrality(tol=1e-6, max_round=100),
                  "centrality", n)
    want = oracle.eigenvector(e, n, tol=1e-6, max_round=100)
    np.testing.assert_allclose(got, want, atol=1e-9)
    eng.shutdown()


@pytest.mark.parametrize("P", [1, 3])
def test_katz(tmp_path, P):
    e, n = random_graph(seed=19, ensure_dangling=False), 60
    eng = make_engine(tmp_path, e, n, P)
    got = collect(eng.katz_centrality(alpha=0.05, beta=1.0, tol=1e-6),
                  "centrality", n)
    want = oracle.katz(e, n, alpha=0.05, beta=1.0, tol=1e-6)
    np.testing.assert_allclose(got, want, atol=1e-9)
    eng.shutdown()


@pytest.mark.parametrize("P", [1, 3])
def test_hits(tmp_path, P):
    e, n = random_graph(seed=23, ensure_dangling=False), 60
    eng = make_engine(tmp_path, e, n, P, directions="both")
    pdf = eng.hits(tolerance=1e-8, max_round=50).to_pandas().sort_values("vid")
    want_auth, want_hub = oracle.hits(e, n, tolerance=1e-8, max_round=50)
    np.testing.assert_allclose(pdf["auth"].to_numpy(), want_auth, atol=1e-9)
    np.testing.assert_allclose(pdf["hub"].to_numpy(), want_hub, atol=1e-9)
    eng.shutdown()


def test_degree_centrality():
    e, n = random_graph(seed=29), 60
    ds = edges_ds(e)
    got = api.degree_centrality(ds, n, mode="both").to_pandas()
    deg = np.zeros(n)
    np.add.at(deg, e[:, 0], 1)
    np.add.at(deg, e[:, 1], 1)
    got_full = np.zeros(n)
    got_full[got["vid"].to_numpy()] = got["centrality"].to_numpy()
    present = deg > 0
    np.testing.assert_allclose(got_full[present], (deg / (n - 1))[present])


def test_triangles_and_clustering():
    e = TWO_TRIANGLES_BRIDGE
    n = 6
    ds = api.canonical_undirected(edges_ds(e))
    tv = api.triangles(ds, num_partitions=2).to_pandas().sort_values("vid")
    want = oracle.triangles_per_vertex(np.sort(e, axis=1), n)
    np.testing.assert_array_equal(tv["tri_cnt"].to_numpy(), want)
    assert api.triangle_total(ds, num_partitions=2) == 2

    cl = api.clustering(ds, num_partitions=2).to_pandas().sort_values("vid")
    deg = np.zeros(n)
    np.add.at(deg, e[:, 0], 1)
    np.add.at(deg, e[:, 1], 1)
    want_cl = np.where(deg > 1, 2.0 * want / np.maximum(deg * (deg - 1), 1), 0)
    np.testing.assert_allclose(cl["clustering"].to_numpy(), want_cl)


def test_triangles_random():
    e, n = random_graph(seed=31, ensure_dangling=False), 60
    uv = np.unique(np.sort(e, axis=1), axis=0)
    uv = uv[uv[:, 0] != uv[:, 1]]
    ds = api.canonical_undirected(edges_ds(e))
    tv = api.triangles(ds, num_partitions=4).to_pandas()
    want = oracle.triangles_per_vertex(uv, n)
    got = np.zeros(n, dtype=np.int64)
    got[tv["vid"].to_numpy()] = tv["tri_cnt"].to_numpy()
    present = np.zeros(n, dtype=bool)
    present[np.unique(uv)] = True
    np.testing.assert_array_equal(got[present], want[present])


def test_graph_management_ops():
    e = np.array([[0, 1], [1, 0], [1, 2], [2, 2]])
    ds = edges_ds(e)
    rep = api.report_graph(ds)
    assert rep == {"node_num": 3, "edge_num": 4, "selfloops_num": 1}
    und = api.to_undirected(ds).to_pandas().sort_values(["src", "dst"])
    assert [tuple(r) for r in und.to_numpy()] == [
        (0, 1), (1, 0), (1, 2), (2, 1), (2, 2)]
    rev = api.reverse_edges(ds).to_pandas().sort_values(["src", "dst"])
    assert sorted(map(tuple, rev[["src", "dst"]].to_numpy())) == sorted(
        map(tuple, e[:, ::-1]))
    sub = api.induce_subgraph(ds, [0, 1]).to_pandas()
    assert sorted(map(tuple, sub[["src", "dst"]].to_numpy())) == [(0, 1), (1, 0)]


def test_edge_link_features_matches_bruteforce():
    e, n = random_graph(seed=77), 60
    got = (api.edge_link_features(edges_ds(e)).to_pandas()
           .sort_values(["src", "dst"]).reset_index(drop=True))
    # brute-force neighbor sets
    import collections
    adj = collections.defaultdict(set)
    und = set()
    for a, b in e:
        if a != b:
            lo, hi = min(a, b), max(a, b)
            und.add((lo, hi))
            adj[a].add(b)
            adj[b].add(a)
    assert len(got) == len(und)
    for _, row in got.iterrows():
        u, v = int(row["src"]), int(row["dst"])
        common = len(adj[u] & adj[v])
        union = len(adj[u] | adj[v])
        assert row["common_nbrs"] == common, (u, v)
        np.testing.assert_allclose(row["jaccard"], round(common / union, 6),
                                   atol=5e-7)
        assert union == len(adj[u]) + len(adj[v]) - common


def test_edge_link_features_routes_agree():
    e = random_graph(seed=99)
    a = (api.edge_link_features(edges_ds(e)).to_pandas()
         .sort_values(["src", "dst"]).reset_index(drop=True))
    b = (api.edge_link_features(edges_ds(e), broadcast_edge_limit=0)
         .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True))
    assert a.equals(b)


def test_link_features_pool_route_matches_dataset_route(tmp_path):
    from graphscope_ray.graph.api import Graph
    e = random_graph(seed=111)
    g = Graph.from_edges(edges_ds(e), symmetrize=True,
                         workdir=str(tmp_path / "lf"), num_parts=3)
    try:
        pool = (g.link_features().to_pandas()
                .sort_values(["src", "dst"]).reset_index(drop=True))
        dset = (api.edge_link_features(edges_ds(e)).to_pandas()
                .sort_values(["src", "dst"]).reset_index(drop=True))
        assert (pool["src"].to_numpy() == dset["src"].to_numpy()).all()
        assert (pool["dst"].to_numpy() == dset["dst"].to_numpy()).all()
        assert (pool["common_nbrs"].to_numpy()
                == dset["common_nbrs"].to_numpy()).all()
        np.testing.assert_allclose(pool["jaccard"], dset["jaccard"],
                                   atol=0)
    finally:
        g.close()


def test_closeness_landmarks_matches_numpy(ray_session):
    import collections
    import tempfile

    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.graph.build import build_graph
    from graphscope_ray.graph.engine import BSPEngine

    rng = np.random.default_rng(21)
    n = 40
    e = rng.integers(0, n, size=(140, 2))
    e = e[e[:, 0] != e[:, 1]]
    eds = ray.data.from_pandas(pd.DataFrame(
        {"src": e[:, 0].astype(np.int64), "dst": e[:, 1].astype(np.int64)}))
    lms = [0, 3, 7]
    with tempfile.TemporaryDirectory() as td:
        store = build_graph(eds, td + "/s", num_parts=3, num_vertices=n,
                            symmetrize=True)
        eng = BSPEngine(store)
        got = (eng.closeness_landmarks(np.array(lms), unit=True)
               .to_pandas().sort_values("vid").reset_index(drop=True))
        eng.shutdown()

    # numpy BFS oracle over the symmetric graph
    adj = collections.defaultdict(set)
    for a, b in e.tolist():
        adj[a].add(b)
        adj[b].add(a)
    cnt = np.zeros(n, dtype=np.int64)
    sm = np.zeros(n)
    for l in lms:
        dist = np.full(n, np.inf)
        dist[l] = 0
        frontier = [l]
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if dist[w] == np.inf:
                        dist[w] = dist[u] + 1
                        nxt.append(w)
            frontier = nxt
        fin = np.isfinite(dist)
        cnt[fin] += 1
        sm[fin] += dist[fin]
    clo = np.where(sm > 0, cnt / np.maximum(sm, 1e-300), 0.0)
    assert (got["reached"].to_numpy() == cnt).all()
    np.testing.assert_allclose(got["dist_sum"].to_numpy(), sm, atol=2e-6)
    np.testing.assert_allclose(got["closeness"].to_numpy(), clo, atol=2e-6)


def test_betweenness_sources_matches_brandes(ray_session):
    import collections
    import tempfile

    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.graph.build import build_graph
    from graphscope_ray.graph.engine import BSPEngine

    rng = np.random.default_rng(29)
    for trial in range(3):
        n = int(rng.integers(8, 45))
        m = int(rng.integers(n, n * 4))
        e = rng.integers(0, n, size=(m, 2))
        e = e[e[:, 0] != e[:, 1]]
        if not len(e):
            continue
        eds = ray.data.from_pandas(pd.DataFrame(
            {"src": e[:, 0].astype(np.int64),
             "dst": e[:, 1].astype(np.int64)}))
        adj = collections.defaultdict(set)
        for a, b in e.tolist():
            adj[a].add(b)
            adj[b].add(a)
        srcs = sorted(rng.choice(n, size=int(rng.integers(1, 4)),
                                 replace=False).tolist())
        P = int(rng.integers(1, 5))
        hub = int(rng.choice([0, 4])) or None
        with tempfile.TemporaryDirectory() as td:
            store = build_graph(eds, td + "/s", num_parts=P,
                                num_vertices=n, symmetrize=True,
                                hub_threshold=hub)
            eng = BSPEngine(store)
            got = (eng.betweenness_sources(np.array(srcs)).to_pandas()
                   .sort_values("vid").reset_index(drop=True))
            eng.shutdown()

        # classic per-source Brandes oracle
        bc = np.zeros(n)
        for s in srcs:
            lvl = np.full(n, -1)
            lvl[s] = 0
            fr = [s]
            while fr:
                nxt = []
                for u in fr:
                    for w in adj[u]:
                        if lvl[w] == -1:
                            lvl[w] = lvl[u] + 1
                            nxt.append(w)
                fr = nxt
            sig = np.zeros(n)
            sig[s] = 1.0
            for L in range(0, max(lvl.max(), 0)):
                for u in range(n):
                    if lvl[u] == L:
                        for w in adj[u]:
                            if lvl[w] == L + 1:
                                sig[w] += sig[u]
            delta = np.zeros(n)
            for L in range(max(lvl.max(), 0), 0, -1):
                for v in range(n):
                    if lvl[v] == L:
                        for u in adj[v]:
                            if lvl[u] == L - 1:
                                delta[u] += sig[u] / sig[v] * (1 + delta[v])
            delta[s] = 0.0
            bc += delta
        np.testing.assert_allclose(got["betweenness"].to_numpy(), bc,
                                   atol=1e-9, err_msg=str((trial, srcs, P)))


def test_harmonic_landmarks_matches_numpy(ray_session):
    import collections
    import tempfile

    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.graph.build import build_graph
    from graphscope_ray.graph.engine import BSPEngine

    rng = np.random.default_rng(23)
    n = 40
    e = rng.integers(0, n, size=(120, 2))
    e = e[e[:, 0] != e[:, 1]]
    # isolate vertex n-1 so an unreachable landmark contributes 0
    e = e[(e[:, 0] != n - 1) & (e[:, 1] != n - 1)]
    eds = ray.data.from_pandas(pd.DataFrame(
        {"src": e[:, 0].astype(np.int64), "dst": e[:, 1].astype(np.int64)}))
    lms = [0, 3, n - 1]
    with tempfile.TemporaryDirectory() as td:
        store = build_graph(eds, td + "/s", num_parts=3, num_vertices=n,
                            symmetrize=True)
        eng = BSPEngine(store)
        got = (eng.harmonic_landmarks(np.array(lms), unit=True)
               .to_pandas().sort_values("vid").reset_index(drop=True))
        eng.shutdown()

    adj = collections.defaultdict(set)
    for a, b in e.tolist():
        adj[a].add(b)
        adj[b].add(a)
    cnt = np.zeros(n, dtype=np.int64)
    hs = np.zeros(n)
    for l in lms:
        dist = np.full(n, np.inf)
        dist[l] = 0
        frontier = [l]
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if dist[w] == np.inf:
                        dist[w] = dist[u] + 1
                        nxt.append(w)
            frontier = nxt
        pos = np.isfinite(dist) & (dist > 0)
        cnt[pos] += 1
        hs[pos] += 1.0 / dist[pos]
    assert (got["reached"].to_numpy() == cnt).all()
    np.testing.assert_allclose(got["harmonic"].to_numpy(), hs, atol=2e-6)
    # the isolated landmark's own row: reached counts only others
    assert got.loc[n - 1, "harmonic"] == 0.0
