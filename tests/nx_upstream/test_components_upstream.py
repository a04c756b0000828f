"""Upstream networkx strongly/weakly-connected test modules against the
engine-backed facade.

Engine-graded: (weakly_/strongly_)connected_components,
number_*, is_* — including the NetworkXNotImplemented raises on
undirected input and NetworkXPointlessConcept on the null graph, all
with networkx's own exception types. Fallback (no signal):
kosaraju_* and condensation (not implemented), non-int/str nodes.
"""
from tests.nx_upstream.harness import engine_wrap, load_upstream

_SCC_OVERRIDES = {
    "strongly_connected_components": engine_wrap(
        "strongly_connected_components"),
    "number_strongly_connected_components": engine_wrap(
        "number_strongly_connected_components"),
    "is_strongly_connected": engine_wrap("is_strongly_connected"),
}

_scc = load_upstream(
    "networkx.algorithms.components.tests.test_strongly_connected",
    _SCC_OVERRIDES)
globals().update({("Scc_" + k if k.startswith("test_") else k): v
                  for k, v in vars(_scc).items()
                  if not k.startswith("__")})

_WCC_OVERRIDES = {
    "weakly_connected_components": engine_wrap(
        "weakly_connected_components"),
    "number_weakly_connected_components": engine_wrap(
        "number_weakly_connected_components"),
    "is_weakly_connected": engine_wrap("is_weakly_connected"),
}

_wcc = load_upstream(
    "networkx.algorithms.components.tests.test_weakly_connected",
    _WCC_OVERRIDES)
globals().update({("Wcc_" + k if k.startswith("test_") else k): v
                  for k, v in vars(_wcc).items()
                  if not k.startswith("__")})
