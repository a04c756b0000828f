"""NetworkX-compatible facade over the Ray-Data engine.

The engine's counterpart of the reference's ``graphscope.nx`` layer
(``python/graphscope/nx/``): ``Graph``/``DiGraph`` classes with the
networkx mutation/query API (driver-side adjacency, like networkx
itself) and an algorithm bridge that runs every computation on the
distributed engine (``nx/algorithms/builtin.py:33-720`` in the
reference). See :mod:`graphscope_ray.nx.classes` for the scope
statement.

>>> import graphscope_ray.nx as gnx
>>> G = gnx.Graph([(0, 1), (1, 2), (2, 0), (3, 4)])
>>> gnx.number_connected_components(G)
2
"""
from graphscope_ray.nx.builtin import *  # noqa: F401,F403
from graphscope_ray.nx.builtin import __all__ as _builtin_all
from graphscope_ray.nx.classes import DiGraph, Graph

__all__ = ["Graph", "DiGraph"] + list(_builtin_all)
