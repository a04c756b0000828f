"""Campaign 20: the NetworkX facade (graphscope_ray.nx) vs the real
networkx package over random graphs — gnm/power-law/tree shapes,
undirected and directed, isolated nodes, string relabelings, and a
mutation step mid-trial. Each trial draws a subset of the bridge
functions so the campaign stays minutes-sized; a full pass of every
function lives in tests/test_nx.py."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

import networkx as nx  # noqa: E402
from networkx.algorithms.link_analysis.hits_alg import _hits_numpy  # noqa: E402
from networkx.algorithms.link_analysis.pagerank_alg import (  # noqa: E402
    _pagerank_python,
)

import graphscope_ray.nx as gnx  # noqa: E402

fails = []
rng = np.random.default_rng(20)


def close_maps(a, b, tol):
    if set(a) != set(b):
        return f"key sets differ: {set(a) ^ set(b)}"
    d = max((abs(a[n] - b[n]) for n in a), default=0.0)
    return None if d <= tol else f"maxdiff {d}"


def make_graph(trial_rng):
    n = int(trial_rng.integers(6, 70))
    shape = trial_rng.choice(["gnm", "ba", "tree", "sparse"])
    seed = int(trial_rng.integers(0, 10_000))
    directed = bool(trial_rng.integers(0, 2))
    if shape == "gnm":
        m = int(trial_rng.integers(n, n * 4))
        h = nx.gnm_random_graph(n, m, seed=seed, directed=directed)
    elif shape == "ba":
        h = nx.barabasi_albert_graph(n, min(3, n - 1), seed=seed)
        h = h.to_directed() if directed else h
    elif shape == "tree":
        h = nx.random_labeled_tree(n, seed=seed)
        h = h.to_directed() if directed else h
    else:
        m = max(2, n // 2)
        h = nx.gnm_random_graph(n, m, seed=seed, directed=directed)
    if trial_rng.integers(0, 2):
        h.add_node(n + 1000)  # isolated
    if trial_rng.integers(0, 3) == 0:
        h = nx.relabel_nodes(h, {u: f"v{u:04d}" for u in h})
    g = gnx.DiGraph(num_parts=2) if h.is_directed() else gnx.Graph(num_parts=2)
    g.add_nodes_from(h.nodes)
    g.add_edges_from(h.edges)
    return g, h


for trial in range(1, 26):
    tag = f"t{trial}"
    trial_rng = np.random.default_rng(2000 + trial)
    g, h = make_graph(trial_rng)
    try:
        if trial_rng.integers(0, 3) == 0 and h.number_of_edges() > 4:
            rm = list(h.edges)[:2]
            g.remove_edges_from(rm)
            h.remove_edges_from(rm)

        checks = set(trial_rng.choice(
            ["pr", "cc", "deg", "katz", "sssp", "bfs", "tri", "core",
             "hits"], size=4, replace=False))
        if "pr" in checks:
            err = close_maps(gnx.pagerank(g, tol=1e-12, max_iter=300),
                             _pagerank_python(h, tol=1e-13, max_iter=600),
                             1e-7)
            if err:
                fails.append(f"{tag} pagerank: {err}")
        if "cc" in checks:
            a = sorted(map(sorted, gnx.weakly_connected_components(g)))
            comp = (nx.weakly_connected_components(h) if h.is_directed()
                    else nx.connected_components(h))
            if a != sorted(map(sorted, comp)):
                fails.append(f"{tag} components differ")
        if "deg" in checks:
            err = close_maps(gnx.degree_centrality(g),
                             nx.degree_centrality(h), 1e-12)
            if err:
                fails.append(f"{tag} degree_centrality: {err}")
        if "katz" in checks:
            err = close_maps(
                gnx.katz_centrality(g, alpha=0.03, tol=1e-12,
                                    max_iter=5000),
                nx.katz_centrality(h, alpha=0.03, tol=1e-13,
                                   max_iter=5000), 1e-7)
            if err:
                fails.append(f"{tag} katz: {err}")
        if "sssp" in checks and len(h):
            src = min(h)
            a = gnx.single_source_dijkstra_path_length(g, src)
            b = {k: float(v) for k, v in
                 nx.single_source_dijkstra_path_length(h, src).items()}
            if a != b:
                fails.append(f"{tag} sssp lengths differ")
        if "bfs" in checks and len(h):
            src = min(h)
            depth = {src: 0}
            for u, v in gnx.bfs_edges(g, src):
                if u not in depth or not h.has_edge(u, v):
                    fails.append(f"{tag} bfs edge order/validity")
                    break
                depth[v] = depth[u] + 1
            if depth != dict(nx.single_source_shortest_path_length(h, src)):
                fails.append(f"{tag} bfs depths differ")
        if "tri" in checks and not h.is_directed():
            if gnx.triangles(g) != nx.triangles(h):
                fails.append(f"{tag} triangles differ")
        if "core" in checks and not h.is_directed():
            if gnx.core_number(g) != nx.core_number(h):
                fails.append(f"{tag} core_number differs")
        if "hits" in checks and h.number_of_edges() > 0:
            # the HITS fixpoint is unique only when AᵀA has a spectral
            # gap; degenerate spectra (equal disjoint pieces, bipartite
            # ties) admit many valid fixpoints — there, verify the
            # fixpoint property instead of matching eigendecomposition.
            nodes = sorted(h)
            idx = {u: i for i, u in enumerate(nodes)}
            A = np.zeros((len(nodes), len(nodes)))
            for u, v in h.edges:
                A[idx[u], idx[v]] = 1.0
                if not h.is_directed():
                    A[idx[v], idx[u]] = 1.0
            lam = np.linalg.eigvalsh(A.T @ A)
            gap_ok = len(lam) < 2 or \
                (lam[-1] - lam[-2]) > 1e-6 * max(lam[-1], 1e-12)
            hg, ag = gnx.hits(g, tol=1e-13, max_iter=3000)
            if gap_ok:
                hh, ah = _hits_numpy(h, normalized=True)
                err = close_maps(hg, hh, 1e-6) or close_maps(ag, ah, 1e-6)
                if err:
                    fails.append(f"{tag} hits: {err}")
            else:
                hv = np.array([hg[u] for u in nodes])
                av = np.array([ag[u] for u in nodes])
                a2 = A.T @ hv
                a2 = a2 / a2.sum() if a2.sum() > 0 else a2
                h2 = A @ av
                h2 = h2 / h2.sum() if h2.sum() > 0 else h2
                if max(np.abs(a2 - av).max(initial=0),
                       np.abs(h2 - hv).max(initial=0)) > 1e-6:
                    fails.append(f"{tag} hits fixpoint violated "
                                 "(degenerate spectrum)")
        print(f"{tag} ok ({'d' if h.is_directed() else 'u'}"
              f"{len(h)}v/{h.number_of_edges()}e {sorted(checks)})",
              flush=True)
    except Exception as e:  # noqa: BLE001
        fails.append(f"{tag} EXCEPTION {type(e).__name__}: {e}")
        print(fails[-1], flush=True)
    finally:
        g.close()

print(f"\n{25 - len(fails)}/25 trials clean")
if fails:
    print("FAILURES:")
    for f in fails:
        print(" ", f)
    sys.exit(1)
print("fuzz20: all clean")
ray.shutdown()
