"""Upstream networkx test_cluster.py against the engine-backed facade.

Engine-graded: triangles / clustering / transitivity /
average_clustering on simple undirected unweighted int/str-node graphs
(the engine's modeled domain). Fallback (networkx grades itself):
directed and weighted variants, per-node selections beyond the facade
signature, square_clustering / generalized_degree (not implemented).
"""
from tests.nx_upstream.harness import engine_wrap, load_upstream

import networkx as _nx


def _simple_und(G, *a, **k):
    return (not G.is_directed() and not a and not k
            and _nx.number_of_selfloops(G) == 0)


def _avg_ok(G, *a, **k):
    return (not G.is_directed() and not a
            and set(k) <= {"count_zeros", "nodes"}
            and _nx.number_of_selfloops(G) == 0)


_OVERRIDES = {
    "triangles": engine_wrap(
        "triangles",
        supports=lambda G, *a, **k: (not G.is_directed()
                                     and not k
                                     and _nx.number_of_selfloops(G) == 0)),
    "clustering": engine_wrap("clustering", supports=_simple_und),
    "transitivity": engine_wrap("transitivity", supports=_simple_und),
    "average_clustering": engine_wrap("average_clustering",
                                      supports=_avg_ok),
}

_mod = load_upstream("networkx.algorithms.tests.test_cluster", _OVERRIDES)
globals().update({k: v for k, v in vars(_mod).items()
                  if not k.startswith("__")})
