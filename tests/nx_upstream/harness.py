"""Upstream networkx test-suite conformance harness.

The reference validates its NX layer by forwarding the REAL networkx
algorithm test modules at its implementations
(`python/graphscope/nx/tests/algorithms/builtin/`). The analogue here:
each upstream module is re-imported with ``sys.modules['networkx']``
temporarily replaced by a SHIM — identical to networkx except that the
functions the facade implements are swapped for wrappers that rebuild
the graph on the distributed engine (``graphscope_ray.nx``) and return
the engine's answer, converted back to real networkx types. Upstream
test logic and expected values then grade the engine.

Wrappers fall back to the real networkx implementation ONLY for inputs
the facade does not model — multigraphs, non-int/str node ids, or
kwargs outside the facade signature (each override lists its
``supports`` predicate). Those cases grade networkx against itself and
carry no conformance signal; everything else runs on the engine.
"""
from __future__ import annotations

import functools
import importlib.util
import sys
import types

import numpy as np

import networkx as _real_nx

import graphscope_ray.nx as gnx
from graphscope_ray.nx import builtin as _b


def _convertible(G) -> bool:
    return (isinstance(G, _real_nx.Graph)
            and not G.is_multigraph()
            and all(isinstance(n, (int, np.integer, str)) for n in G))


def _facade(G):
    fg = gnx.DiGraph() if G.is_directed() else gnx.Graph()
    for n, d in G.nodes(data=True):
        fg.add_node(n, **d)
    for u, v, d in G.edges(data=True):
        fg.add_edge(u, v, **d)
    return fg


def _back_to_nx(fg):
    """Facade graph result → real networkx graph (so upstream tests can
    feed it to any networkx function)."""
    H = _real_nx.DiGraph() if fg.is_directed() else _real_nx.Graph()
    for n, d in fg._node.items():
        H.add_node(n, **d)
    for u, v, d in fg._edge_tuples(data=True):
        H.add_edge(u, v, **d)
    return H


def engine_wrap(name, *, graph_result: bool = False, supports=None,
                facade_name: str | None = None):
    """Override for shim attribute ``name``: run on the engine when the
    input/arguments are in the facade's modeled domain, else fall back
    to real networkx (no conformance signal, but no false failure)."""
    facade_fn = getattr(_b, facade_name or name)
    real_fn = getattr(_real_nx, name)

    @functools.wraps(real_fn)
    def inner(G, *args, **kwargs):
        use = _convertible(G)
        if use and supports is not None:
            use = supports(G, *args, **kwargs)
        if not use:
            return real_fn(G, *args, **kwargs)
        fg = _facade(G)
        try:
            r = facade_fn(fg, *args, **kwargs)
            if graph_result:
                r = _back_to_nx(r)
            elif isinstance(r, types.GeneratorType):
                r = list(r)  # drain before the backing closes
            return r
        finally:
            fg.close()

    return inner


def make_shim(overrides: dict) -> types.ModuleType:
    shim = types.ModuleType("networkx")
    shim.__dict__.update(_real_nx.__dict__)
    shim.__dict__.update(overrides)
    return shim


def load_upstream(name: str, overrides: dict) -> types.ModuleType:
    """Import upstream test module ``name`` with the shim installed as
    ``networkx``; return the loaded module (copy its vars() into a test
    file's globals() so pytest collects the classes/functions)."""
    spec = importlib.util.find_spec(name)
    mod = importlib.util.module_from_spec(spec)
    shim = make_shim(overrides)
    saved = sys.modules.get("networkx")
    sys.modules["networkx"] = shim
    try:
        spec.loader.exec_module(mod)
    finally:
        if saved is not None:
            sys.modules["networkx"] = saved
    return mod


def no_kwargs(*allowed):
    """supports-predicate: positional args beyond G are absent and only
    the listed kwargs appear."""
    def pred(G, *args, **kwargs):
        return not args and set(kwargs) <= set(allowed)
    return pred
