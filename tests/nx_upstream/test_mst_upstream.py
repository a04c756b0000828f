"""Upstream networkx tree/test_mst.py against the engine-backed facade.

Engine-graded: the minimum-spanning-edge SET (distributed Boruvka on
the engine) for every minimum_spanning_edges / minimum_spanning_tree
call on simple int/str-node graphs with finite weights — including the
NetworkXNotImplemented raise on directed input. The wrappers rebuild
networkx's result shell (original edge/node/graph attrs) around the
engine's edge set, exactly as networkx's own tree builders do, so the
attribute-preservation tests grade the engine edge set plus faithful
plumbing.

Fallback (networkx grades itself, no signal): multigraphs, NaN-weight
policy tests (ignore_nan is a networkx-iterator concern the facade
does not model), maximum_* variants, SpanningTreeIterator /
random_spanning_tree / number_of_spanning_trees (not implemented).
Scipy-gated tests skip upstream.
"""
import math

import networkx as _nx

from tests.nx_upstream.harness import _convertible, _facade
from graphscope_ray.nx import builtin as _b
from tests.nx_upstream.harness import load_upstream


def _finite_weights(G, weight):
    return all(not math.isnan(float(d.get(weight, 1)))
               for _, _, d in G.edges(data=True))


def _engine_mse(G, weight):
    """Engine MSF edge pairs for a convertible graph (may raise
    NetworkXNotImplemented for directed — the conformance raise)."""
    fg = _facade(G)
    try:
        return _b.minimum_spanning_edges(fg, weight=weight, data=False)
    finally:
        fg.close()


def _mse_wrapper(G, algorithm="kruskal", weight="weight", keys=True,
                 data=True, ignore_nan=False):
    if algorithm not in ("kruskal", "prim", "boruvka", "borůvka"):
        raise ValueError(
            f"{algorithm} is not a valid choice for an algorithm.")
    if (not _convertible(G)
            or (not G.is_directed() and not _finite_weights(G, weight))):
        return _nx.minimum_spanning_edges(
            G, algorithm=algorithm, weight=weight, keys=keys, data=data,
            ignore_nan=ignore_nan)
    pairs = _engine_mse(G, weight)  # raises for directed, like nx
    if data:
        return [(u, v, G.adj[u][v]) for u, v in pairs]
    return list(pairs)


def _mst_wrapper(G, weight="weight", algorithm="kruskal",
                 ignore_nan=False):
    if algorithm not in ("kruskal", "prim", "boruvka", "borůvka"):
        raise ValueError(
            f"{algorithm} is not a valid choice for an algorithm.")
    if not _convertible(G) or not _finite_weights(G, weight):
        return _nx.minimum_spanning_tree(
            G, weight=weight, algorithm=algorithm, ignore_nan=ignore_nan)
    pairs = _engine_mse(G, weight)
    T = _nx.Graph()
    T.graph.update(G.graph)
    T.add_nodes_from(G.nodes(data=True))
    for u, v in pairs:
        T.add_edge(u, v, **G.adj[u][v])
    return T


_OVERRIDES = {
    "minimum_spanning_edges": _mse_wrapper,
    "minimum_spanning_tree": _mst_wrapper,
}

_mod = load_upstream("networkx.algorithms.tree.tests.test_mst",
                     _OVERRIDES)
globals().update({k: v for k, v in vars(_mod).items()
                  if not k.startswith("__")})
