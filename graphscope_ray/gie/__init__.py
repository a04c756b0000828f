"""GIE-lite: the reference interactive engine's core Gremlin traversal
subset (query_flow.proto:65-116) re-expressed as streaming Ray Data
pipelines. See traversal.py for the operator-by-operator mapping."""

from graphscope_ray.gie.traversal import P, PropertyGraph, Traversal, unfold
from graphscope_ray.gie.gremlin import GremlinParseError
from graphscope_ray.gie.gremlin import run as run_gremlin

# NOTE: the text-frontend entry point is exported as ``run_gremlin`` —
# naming it ``gremlin`` would shadow the ``graphscope_ray.gie.gremlin``
# SUBMODULE attribute and break ``import graphscope_ray.gie.gremlin
# as gm`` style access.
__all__ = ["P", "PropertyGraph", "Traversal", "unfold", "run_gremlin",
           "GremlinParseError"]
