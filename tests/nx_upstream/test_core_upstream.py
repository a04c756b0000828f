"""Upstream networkx test_core.py run against the engine-backed facade
(reference pattern: python/graphscope/nx/tests/algorithms/builtin/).

Engine-graded: core_number / find_cores / k_core on simple int/str-node
graphs without self loops. Fallback (networkx grades itself, no
signal): multigraphs, self-loop graphs (upstream asserts networkx's own
raise), the k_shell/k_crust/k_corona/k_truss/onion_layers families the
facade does not implement, and k_core calls passing a precomputed
core_number.
"""
from tests.nx_upstream.harness import (engine_wrap, load_upstream,
                                       no_kwargs)

import networkx as _nx


def _no_self_loops(G, *a, **k):
    # directed core_number (in+out degree peeling) is outside the
    # facade's undirected k-core engine app
    return not G.is_directed() and _nx.number_of_selfloops(G) == 0


def _k_core_ok(G, k=None, core_number=None):
    return (core_number is None and not G.is_directed()
            and _nx.number_of_selfloops(G) == 0)


_OVERRIDES = {
    "core_number": engine_wrap("core_number", supports=_no_self_loops),
    "k_core": engine_wrap("k_core", graph_result=True,
                          supports=_k_core_ok),
}

_mod = load_upstream("networkx.algorithms.tests.test_core", _OVERRIDES)
globals().update({k: v for k, v in vars(_mod).items()
                  if not k.startswith("__")})
