"""NetworkX-compatible graph facade over the Ray-Data engine.

The reference ships a NetworkX emulation layer (``python/graphscope/nx/``:
``classes/graph.py`` with a mutable ``DynamicFragment`` behind it,
algorithm bridge ``nx/algorithms/builtin.py:33-720``). This module is
the engine's take on that surface:

- ``Graph`` / ``DiGraph`` keep adjacency DRIVER-SIDE in plain dicts,
  exactly like networkx itself: this is the interactive convenience
  layer, sized for graphs a person builds node by node. Bulk pipelines
  load edges through ``graphscope_ray.graph.Graph.from_edges`` over a
  Ray Dataset instead — the facade deliberately does not pretend a
  per-call ``add_edge`` surface scales to 100 TB.
- every algorithm in :mod:`graphscope_ray.nx.builtin` runs
  DISTRIBUTED: the facade lazily builds (and caches) a backing
  :class:`graphscope_ray.graph.Graph` — dense vids = rank of the
  sorted node ids, the reference's oid→gid convention
  (``core/vertex_map/arrow_projected_vertex_map.h:89-101``) — and
  delegates to the resident actor-pool engine.

Node ids must be all-int or all-str within one graph (the reference
restricts ``oid_type`` the same way, ``framework/graph.py:108-111``).
Supported is a documented subset of the networkx mutation/query API;
views are minimal (iterable / sized / membership), not the full
reportview classes.
"""
from typing import Optional

import numpy as np
import pyarrow as pa

import ray

__all__ = ["Graph", "DiGraph"]


class _View:
    """Minimal NodeView/EdgeView stand-in: iterable, sized, membership
    and calling (returns itself) — the subset most networkx-written
    code touches."""

    def __init__(self, items):
        self._items = items

    def __iter__(self):
        return iter(self._items)

    def __len__(self):
        return len(self._items)

    def __contains__(self, x):
        return x in self._items

    def __call__(self):
        return self

    def __repr__(self):
        return repr(list(self._items))


class Graph:
    """Undirected facade graph (networkx.Graph API subset).

    ``incoming_edges``: optional iterable of ``(u, v)`` /
    ``(u, v, attrs)`` tuples, or another facade graph to copy.
    ``num_parts`` sizes the backing engine's actor pool (default:
    small — facade graphs are interactive-sized)."""

    def __init__(self, incoming_edges=None, *, num_parts: Optional[int] = None):
        self._node: dict = {}   # node -> attr dict
        self._adj: dict = {}    # node -> {nbr: shared edge-attr dict}
        self._n_edges = 0
        self._num_parts = num_parts
        self._backings: dict = {}
        if incoming_edges is not None:
            if isinstance(incoming_edges, Graph):
                self.add_nodes_from(incoming_edges._node)
                self.add_edges_from(incoming_edges._edge_tuples(data=True))
            else:
                self.add_edges_from(incoming_edges)

    # -- flags ----------------------------------------------------------
    def is_directed(self) -> bool:
        return False

    def is_multigraph(self) -> bool:
        return False

    # -- backing-cache invalidation --------------------------------------
    def _dirty(self) -> None:
        for g in self._backings.values():
            g.close()
        self._backings.clear()

    def close(self) -> None:
        """Release the backing engine actor pools (call when done; any
        later algorithm call rebuilds them)."""
        self._dirty()

    # -- mutation ---------------------------------------------------------
    def add_node(self, n, **attr) -> None:
        if n not in self._node:
            self._dirty()
            self._node[n] = {}
            self._adj[n] = {}
        if attr:
            self._node[n].update(attr)

    def add_nodes_from(self, nodes, **attr) -> None:
        for n in nodes:
            self.add_node(n, **attr)

    def add_edge(self, u, v, **attr) -> None:
        self.add_node(u)
        self.add_node(v)
        if v not in self._adj[u]:
            self._dirty()
            d: dict = {}
            self._adj[u][v] = d
            self._adj[v][u] = d  # shared attr dict, like networkx
            self._n_edges += 1
        if attr:
            self._dirty()  # weight changes invalidate weighted backings
            self._adj[u][v].update(attr)

    def add_edges_from(self, ebunch, **attr) -> None:
        for e in ebunch:
            if len(e) == 3:
                u, v, d = e
                self.add_edge(u, v, **{**attr, **d})
            else:
                u, v = e
                self.add_edge(u, v, **attr)

    def add_weighted_edges_from(self, ebunch, weight: str = "weight") -> None:
        for u, v, w in ebunch:
            self.add_edge(u, v, **{weight: w})

    def remove_edge(self, u, v) -> None:
        try:
            del self._adj[u][v]
        except KeyError:
            raise KeyError(f"edge ({u!r}, {v!r}) not in graph") from None
        if u != v:
            del self._adj[v][u]
        self._n_edges -= 1
        self._dirty()

    def remove_edges_from(self, ebunch) -> None:
        for u, v in ebunch:
            if u in self._adj and v in self._adj[u]:
                self.remove_edge(u, v)

    def remove_node(self, n) -> None:
        if n not in self._node:
            raise KeyError(f"node {n!r} not in graph")
        self._dirty()
        for nbr in list(self._adj[n]):
            if nbr != n:
                del self._adj[nbr][n]
            self._n_edges -= 1
        del self._adj[n]
        del self._node[n]

    def remove_nodes_from(self, nodes) -> None:
        for n in nodes:
            if n in self._node:
                self.remove_node(n)

    def clear(self) -> None:
        self._dirty()
        self._node.clear()
        self._adj.clear()
        self._n_edges = 0

    def clear_edges(self) -> None:
        self._dirty()
        for n in self._adj:
            self._adj[n].clear()
        self._n_edges = 0

    # -- queries ----------------------------------------------------------
    def number_of_nodes(self) -> int:
        return len(self._node)

    def order(self) -> int:
        return len(self._node)

    def __len__(self) -> int:
        return len(self._node)

    def __iter__(self):
        return iter(self._node)

    def __contains__(self, n) -> bool:
        return n in self._node

    def __getitem__(self, n) -> dict:
        return self._adj[n]

    def number_of_edges(self) -> int:
        return self._n_edges

    def size(self, weight: Optional[str] = None):
        if weight is None:
            return self._n_edges
        # self-loops count once in size(weight) (networkx convention)
        return sum(d.get(weight, 1) for _, _, d in self._edge_tuples(data=True))

    def has_node(self, n) -> bool:
        return n in self._node

    def has_edge(self, u, v) -> bool:
        return u in self._adj and v in self._adj[u]

    def neighbors(self, n):
        return iter(self._adj[n])

    @property
    def nodes(self) -> _View:
        return _View(self._node)

    @property
    def edges(self) -> _View:
        return _View(self._edge_tuples())

    def _edge_tuples(self, data: bool = False):
        out, seen = [], set()
        for u in self._adj:
            for v, d in self._adj[u].items():
                if v not in seen:
                    out.append((u, v, d) if data else (u, v))
            seen.add(u)
        return out

    def degree(self, n=None, weight: Optional[str] = None):
        """Degree of ``n``, or a list of ``(node, degree)`` pairs.
        Self-loops count twice (networkx convention)."""
        if n is not None:
            return self._deg(n, weight)
        return [(m, self._deg(m, weight)) for m in self._node]

    def _deg(self, n, weight):
        adj = self._adj[n]
        if weight is None:
            return len(adj) + (1 if n in adj else 0)
        return (sum(d.get(weight, 1) for d in adj.values())
                + (adj[n].get(weight, 1) if n in adj else 0))

    # -- derivation ---------------------------------------------------------
    def copy(self) -> "Graph":
        g = self.__class__(num_parts=self._num_parts)
        for n, d in self._node.items():
            g.add_node(n, **d)
        for u, v, d in self._edge_tuples(data=True):
            g.add_edge(u, v, **dict(d))
        return g

    def subgraph(self, nodes) -> "Graph":
        keep = set(nodes)
        g = self.__class__(num_parts=self._num_parts)
        for n in keep:
            if n in self._node:
                g.add_node(n, **self._node[n])
        for u, v, d in self._edge_tuples(data=True):
            if u in keep and v in keep:
                g.add_edge(u, v, **dict(d))
        return g

    def to_directed(self) -> "DiGraph":
        g = DiGraph(num_parts=self._num_parts)
        for n, d in self._node.items():
            g.add_node(n, **d)
        for u, v, d in self._edge_tuples(data=True):
            g.add_edge(u, v, **dict(d))
            g.add_edge(v, u, **dict(d))
        return g

    def to_undirected(self) -> "Graph":
        return self.copy()

    # -- engine bridge --------------------------------------------------
    def _sorted_nodes(self) -> np.ndarray:
        nodes = list(self._node)
        kinds = {type(n) for n in nodes}
        if not kinds <= {int, str} or len(kinds) > 1:
            # same restriction as the reference's oid_type
            # (framework/graph.py:108-111)
            raise TypeError(
                "node ids must be all-int or all-str within one graph")
        return np.array(sorted(nodes))

    def _directed_rows(self, data: bool):
        """Native edge rows: one per undirected edge here; per directed
        edge on DiGraph (overridden)."""
        return self._edge_tuples(data=data)

    def _vid_rows(self, weight: Optional[str] = None):
        """(sorted nodes array, src vids, dst vids, weights-or-None) for
        the native edge rows (one per undirected edge / per directed
        edge)."""
        nodes = self._sorted_nodes()
        idx = {n: i for i, n in enumerate(nodes)}
        rows = self._directed_rows(data=weight is not None)
        if weight is not None:
            src = [idx[u] for u, v, _ in rows]
            dst = [idx[v] for u, v, _ in rows]
            w = [float(d.get(weight, 1.0)) for _, _, d in rows]
        else:
            src = [idx[u] for u, v in rows]
            dst = [idx[v] for u, v in rows]
            w = None
        return nodes, src, dst, w

    def _vid_edge_ds(self, weight: Optional[str] = None,
                     drop_self_loops: bool = False):
        """(sorted nodes, Ray Dataset of native rows in vid space)."""
        nodes, src, dst, w = self._vid_rows(weight)
        if drop_self_loops:
            keep = [i for i in range(len(src)) if src[i] != dst[i]]
            src = [src[i] for i in keep]
            dst = [dst[i] for i in keep]
            if w is not None:
                w = [w[i] for i in keep]
        cols = {"src": pa.array(np.asarray(src, dtype=np.int64)),
                "dst": pa.array(np.asarray(dst, dtype=np.int64))}
        if w is not None:
            cols["weight"] = pa.array(np.asarray(w, dtype=np.float64))
        return nodes, ray.data.from_arrow(pa.table(cols))

    def _backing(self, mode: str = "main", weight: Optional[str] = None):
        """Backing engine graph (cached until mutation).

        mode 'main': undirected → symmetrized store; directed →
        forward store. mode 'sym' (DiGraph): symmetrized, for
        weak-connectivity ops. mode 'both': dual-direction store
        (``directions='both'``) for HITS-style in+out access."""
        key = (mode, weight)
        if key in self._backings:
            return self._backings[key]
        from graphscope_ray.graph.api import Graph as EngineGraph
        from graphscope_ray.graph.api import _default_parts

        nodes, src, dst, w = self._vid_rows(weight)
        directed = self.is_directed()
        symmetrize = (not directed) or mode == "sym"
        directions = "forward"
        if mode == "both":
            symmetrize = False
            directions = "both"
            if not directed:  # expand to explicit symmetric rows
                loops = [i for i in range(len(src)) if src[i] == dst[i]]
                keep = [i for i in range(len(src)) if src[i] != dst[i]]
                src, dst, w0 = (
                    [src[i] for i in keep] + [dst[i] for i in keep]
                    + [src[i] for i in loops],
                    [dst[i] for i in keep] + [src[i] for i in keep]
                    + [dst[i] for i in loops],
                    w,
                )
                if w0 is not None:
                    w = ([w0[i] for i in keep] * 2) + [w0[i] for i in loops]
        cols = {"src": pa.array(np.asarray(src, dtype=np.int64)),
                "dst": pa.array(np.asarray(dst, dtype=np.int64))}
        if w is not None:
            cols["weight"] = pa.array(np.asarray(w, dtype=np.float64))
        ds = ray.data.from_arrow(pa.table(cols))
        g = EngineGraph.from_edges(
            ds,
            oid_space=False,
            num_vertices=len(nodes),
            num_parts=self._num_parts or min(_default_parts(), 4),
            symmetrize=symmetrize,
            directions=directions,
            weight_col="weight" if w is not None else None,
            # many interactive facade graphs must coexist without
            # starving Ray Data's 1-CPU tasks: reserve ~nothing (the
            # pool-budget deadlock note on BSPEngine.__init__)
            engine_num_cpus=0.01,
        )
        self._backings[key] = g
        return g


class DiGraph(Graph):
    """Directed facade graph (networkx.DiGraph API subset)."""

    def __init__(self, incoming_edges=None, *, num_parts: Optional[int] = None):
        self._pred: dict = {}   # node -> {nbr: shared edge-attr dict}
        super().__init__(incoming_edges, num_parts=num_parts)

    def is_directed(self) -> bool:
        return True

    # -- mutation overrides ----------------------------------------------
    def add_node(self, n, **attr) -> None:
        if n not in self._node:
            self._dirty()
            self._node[n] = {}
            self._adj[n] = {}
            self._pred[n] = {}
        if attr:
            self._node[n].update(attr)

    def add_edge(self, u, v, **attr) -> None:
        self.add_node(u)
        self.add_node(v)
        if v not in self._adj[u]:
            self._dirty()
            d: dict = {}
            self._adj[u][v] = d
            self._pred[v][u] = d
            self._n_edges += 1
        if attr:
            self._dirty()
            self._adj[u][v].update(attr)

    def remove_edge(self, u, v) -> None:
        try:
            del self._adj[u][v]
        except KeyError:
            raise KeyError(f"edge ({u!r}, {v!r}) not in graph") from None
        del self._pred[v][u]
        self._n_edges -= 1
        self._dirty()

    def remove_node(self, n) -> None:
        if n not in self._node:
            raise KeyError(f"node {n!r} not in graph")
        self._dirty()
        for v in list(self._adj[n]):
            del self._pred[v][n]
            self._n_edges -= 1
        for u in list(self._pred[n]):
            if u != n:
                del self._adj[u][n]
                self._n_edges -= 1
        del self._adj[n]
        del self._pred[n]
        del self._node[n]

    def clear(self) -> None:
        super().clear()
        self._pred.clear()

    def clear_edges(self) -> None:
        super().clear_edges()
        for n in self._pred:
            self._pred[n].clear()

    # -- query overrides ----------------------------------------------------
    def _edge_tuples(self, data: bool = False):
        return [
            (u, v, d) if data else (u, v)
            for u in self._adj
            for v, d in self._adj[u].items()
        ]

    def successors(self, n):
        return iter(self._adj[n])

    def predecessors(self, n):
        return iter(self._pred[n])

    def out_degree(self, n=None, weight: Optional[str] = None):
        return self._dir_deg(self._adj, n, weight)

    def in_degree(self, n=None, weight: Optional[str] = None):
        return self._dir_deg(self._pred, n, weight)

    def _dir_deg(self, amap, n, weight):
        def one(m):
            if weight is None:
                return len(amap[m])
            return sum(d.get(weight, 1) for d in amap[m].values())
        if n is not None:
            return one(n)
        return [(m, one(m)) for m in self._node]

    def degree(self, n=None, weight: Optional[str] = None):
        if n is not None:
            return self.in_degree(n, weight) + self.out_degree(n, weight)
        ind = dict(self.in_degree(weight=weight))
        return [(m, ind[m] + o) for m, o in self.out_degree(weight=weight)]

    def _deg(self, n, weight):
        return self.in_degree(n, weight) + self.out_degree(n, weight)

    # -- derivation overrides ------------------------------------------------
    def to_undirected(self) -> Graph:
        g = Graph(num_parts=self._num_parts)
        for n, d in self._node.items():
            g.add_node(n, **d)
        for u, v, d in self._edge_tuples(data=True):
            g.add_edge(u, v, **dict(d))
        return g

    def to_directed(self) -> "DiGraph":
        return self.copy()

    def reverse(self) -> "DiGraph":
        g = DiGraph(num_parts=self._num_parts)
        for n, d in self._node.items():
            g.add_node(n, **d)
        for u, v, d in self._edge_tuples(data=True):
            g.add_edge(v, u, **dict(d))
        return g
