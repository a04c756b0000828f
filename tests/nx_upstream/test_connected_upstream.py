"""Upstream networkx components/test_connected.py against the
engine-backed facade.

Engine-graded: connected_components / number_connected_components /
is_connected — including the NetworkXNotImplemented raise on directed
input and NetworkXPointlessConcept on the null graph, which the facade
now raises with networkx's own exception types. Fallback:
node_connected_component (not implemented) and non-int/str node ids
(the engine keys vertices by int64/string oids).
"""
from tests.nx_upstream.harness import engine_wrap, load_upstream

_OVERRIDES = {
    "connected_components": engine_wrap("connected_components"),
    "number_connected_components": engine_wrap(
        "number_connected_components"),
    "is_connected": engine_wrap("is_connected"),
}

_mod = load_upstream(
    "networkx.algorithms.components.tests.test_connected", _OVERRIDES)
globals().update({k: v for k, v in vars(_mod).items()
                  if not k.startswith("__")})
