"""Per-vertex scalar Pregel UDF compat shim.

Reference surface: ``python/graphscope/analytical/udf/decorators.py:116``
(the ``@pregel(vd_type, md_type)`` class decorator), invocation pattern
``python/tests/test_udf_app.py:994-1008`` (``a1 = SSSP_Pregel();
ctx = a1(graph, src=6); ctx.to_dataframe(...)``), and the per-vertex
API used by the reference's example apps
(``test_udf_app.py:100-128, 340-460``): ``v.id() / v.value() /
v.set_value() / v.send(e.vertex(), msg) / v.vote_to_halt() /
v.outgoing_edges(label_id)``, ``e.vertex() / e.get_int(i) /
e.get_double(i) / e.get_str(i)``, ``context.superstep() /
get_config() / edge_label_num() / register_aggregator() /
aggregate() / get_aggregated_value()`` and the
``PregelAggregatorType`` zoo.

Execution model (honest about cost): the reference compiles these
callbacks to Cython running inside the C++ engine; this shim RUNS THE
USER'S PYTHON PER ACTIVE VERTEX. Message routing, adjacency lookup and
activity tracking are vectorized numpy on hash-partitioned actors
(ids -> crc32 % P, message blocks exchanged as per-destination-
partition arrays, classic BSP), but each active vertex costs one
Python call per superstep. For frontier algorithms (SSSP/BFS) the
active set shrinks fast and this is fine at millions of vertices; for
always-active algorithms (PageRank) prefer the vectorized
:class:`~graphscope_ray.graph.program.VertexProgram` surface — same
semantics, no per-row Python. This trade is by design: the decorator
exists so reference UDF code runs UNMODIFIED.
"""

from __future__ import annotations

import inspect
import zlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


class AppAssets:
    """No-op compat base so reference app classes (``class
    SSSP_Pregel(AppAssets)``) run unmodified."""


class PregelAggregatorType:
    """Names mirror the reference enum (``pregel cimport
    PregelAggregatorType``)."""

    kInt64SumAggregator = "int64_sum"
    kInt64MaxAggregator = "int64_max"
    kInt64MinAggregator = "int64_min"
    kInt64ProductAggregator = "int64_product"
    kInt64OverwriteAggregator = "int64_overwrite"
    kDoubleSumAggregator = "double_sum"
    kDoubleMaxAggregator = "double_max"
    kDoubleMinAggregator = "double_min"
    kDoubleProductAggregator = "double_product"
    kDoubleOverwriteAggregator = "double_overwrite"
    kBoolAndAggregator = "bool_and"
    kBoolOrAggregator = "bool_or"
    kBoolOverwriteAggregator = "bool_overwrite"
    kTextAppendAggregator = "text_append"


_AGG_OPS = {
    "sum": lambda a, b: a + b,
    "max": max,
    "min": min,
    "product": lambda a, b: a * b,
    "overwrite": lambda a, b: b,
    "and": lambda a, b: a and b,
    "or": lambda a, b: a or b,
    "append": lambda a, b: a + b,
}


def _agg_op(kind: str):
    return _AGG_OPS[kind.split("_", 1)[1] if "_" in kind else kind]


def _merge_aggs(registered: dict, parts: list) -> dict:
    """Fold per-partition {name: value} dicts (non-sticky Pregel
    semantics: each superstep's reads see ONLY the previous
    superstep's aggregation)."""
    out = {}
    for d in parts:
        for name, val in d.items():
            op = _agg_op(registered[name])
            out[name] = val if name not in out else op(out[name], val)
    return out


def _part_of(ids: np.ndarray, nparts: int) -> np.ndarray:
    """Deterministic partition of arbitrary (int or string) vertex
    ids: crc32 of the decimal/utf-8 form, stable across processes."""
    if ids.dtype.kind in "iu":
        return (ids.astype(np.uint64) % np.uint64(nparts)).astype(
            np.int64)
    return np.fromiter(
        (zlib.crc32(str(x).encode()) % nparts for x in ids),
        dtype=np.int64, count=len(ids))


class _Edge:
    __slots__ = ("_dst", "_props")

    def __init__(self, dst, props):
        self._dst = dst
        self._props = props  # full edge-table row (src, dst, *rest)

    def vertex(self):
        """The far endpoint (pass to ``v.send``)."""
        return self._dst

    def get_int(self, i: int) -> int:
        return int(self._props[i])

    def get_double(self, i: int) -> float:
        return float(self._props[i])

    def get_str(self, i: int) -> str:
        return str(self._props[i])


class _Vertex:
    __slots__ = ("_id", "_ix", "_part", "_halt")

    def __init__(self, vid, ix, part):
        self._id = vid
        self._ix = ix
        self._part = part
        self._halt = False

    def id(self):
        return self._id

    def value(self):
        return self._part.values[self._ix]

    def set_value(self, x):
        self._part.values[self._ix] = x

    def vote_to_halt(self):
        self._halt = True

    def send(self, target, msg):
        self._part.out_dst.append(target)
        self._part.out_msg.append(msg)

    def outgoing_edges(self, e_label_id: int = 0):
        lo, hi = self._part.adj_bounds(self._id)
        rows = self._part.edge_rows
        return [_Edge(rows[1][j], tuple(c[j] for c in rows))
                for j in range(lo, hi)]

    def label(self):
        return self._part.vlabel

    def label_id(self):
        return 0

    def properties(self):
        return []


class _Context:
    """Per-partition view of the global compute context."""

    def __init__(self, part, superstep, config, agg_values):
        self._part = part
        self._superstep = superstep
        self._config = config
        self._agg_values = agg_values

    def superstep(self) -> int:
        return self._superstep

    def get_config(self, key):
        if key in self._config:
            return self._config[key]
        alt = (key.decode() if isinstance(key, bytes)
               else str(key).encode())
        return self._config.get(alt)

    def edge_label_num(self) -> int:
        return 1

    def vertex_label_num(self) -> int:
        return 1

    def get_total_vertices_num(self) -> int:
        return self._part.total_vertices

    def register_aggregator(self, name, kind) -> None:
        self._part.agg_registered[name] = kind

    def aggregate(self, name, value) -> None:
        loc = self._part.agg_local
        if name in loc:
            loc[name] = _agg_op(
                self._part.agg_registered[name])(loc[name], value)
        else:
            loc[name] = value

    def get_aggregated_value(self, name):
        return self._agg_values.get(name)


@ray.remote(num_cpus=0)
class _PregelPartition:
    """One hash partition: its vertices' values/halted flags plus the
    out-adjacency of every LOCAL vertex (edge rows stored as column
    arrays, src-sorted; per-vertex slices via searchsorted on ints or
    a prebuilt index for strings)."""

    def __init__(self, part_id: int, nparts: int, vids: np.ndarray,
                 edge_cols: list, total_vertices: int,
                 vlabel: str = "_V"):
        self.part_id = part_id
        self.nparts = nparts
        self.vids = vids
        self.vix = {v: i for i, v in enumerate(vids)}
        self.values = np.empty(len(vids), dtype=object)
        self.halted = np.zeros(len(vids), dtype=bool)
        self.edge_rows = edge_cols  # [src, dst, *props], src-sorted
        self.total_vertices = total_vertices
        self.vlabel = vlabel
        src = edge_cols[0]
        # adjacency index: contiguous src runs
        self._adj = {}
        if len(src):
            s = np.asarray(src)
            bounds = np.flatnonzero(s[1:] != s[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(s)]))
            for k, lo, hi in zip(s[starts], starts, ends):
                self._adj[k] = (int(lo), int(hi))
        self.agg_registered = {}
        self.agg_local = {}
        self.out_dst = []
        self.out_msg = []

    def adj_bounds(self, vid):
        return self._adj.get(vid, (0, 0))

    def _route_sends(self):
        """Split buffered sends into per-destination-partition
        (dst, msg) arrays."""
        if not self.out_dst:
            empty = (np.empty(0, dtype=object),
                     np.empty(0, dtype=object))
            return [empty] * self.nparts
        # let numpy re-infer the dtype: _part_of must see integer ids
        # as integers (routing = id % P), matching the partitioning
        # used for vertex assignment in run_pregel
        dst = np.asarray(self.out_dst)
        if dst.dtype.kind not in "iuUS":
            dst = np.array(self.out_dst, dtype=object)
        msg = np.array(self.out_msg, dtype=object)
        self.out_dst, self.out_msg = [], []
        pid = _part_of(dst, self.nparts)
        return [(dst[pid == p], msg[pid == p])
                for p in range(self.nparts)]

    def _resolve(self, app_payload: bytes):
        if getattr(self, "_app_key", None) != app_payload:
            from ray import cloudpickle
            self._app = cloudpickle.loads(app_payload)
            self._app_key = app_payload
        return self._app

    def run_init(self, app_payload, config):
        app_cls = self._resolve(app_payload)
        ctx = _Context(self, 0, config, {})
        init = app_cls.Init
        for i, vid in enumerate(self.vids):
            v = _Vertex(vid, i, self)
            init(v, ctx)
        out = self._route_sends()
        stats = {"aggs": dict(self.agg_local),
                 "registered": dict(self.agg_registered),
                 "sent": sum(len(d) for d, _ in out)}
        self.agg_local = {}
        return out, stats

    def compute(self, app_payload, superstep, config, agg_values,
                msg_blocks):
        """One superstep: group incoming messages per local vertex,
        call the user's Compute for every ACTIVE vertex (has messages,
        or not halted), buffer sends, return routed blocks + stats."""
        app_cls = self._resolve(app_payload)
        # gather per-vertex message lists (vectorized grouping)
        inbox = {}
        for dsts, msgs in msg_blocks:
            for d, m in zip(dsts, msgs):
                inbox.setdefault(d, []).append(m)
        combine = getattr(app_cls, "Combine", None)
        if combine is not None:
            inbox = {d: [combine(ms)] for d, ms in inbox.items()}
        ctx = _Context(self, superstep, config, agg_values)
        compute_fn = app_cls.Compute
        n_active = 0
        for i, vid in enumerate(self.vids):
            msgs = inbox.get(vid)
            if msgs is None:
                if self.halted[i]:
                    continue  # halted + no mail: stays asleep
                msgs = []
            n_active += 1
            v = _Vertex(vid, i, self)
            compute_fn(msgs, v, ctx)
            self.halted[i] = v._halt
        out = self._route_sends()
        stats = {"aggs": dict(self.agg_local),
                 "active": n_active,
                 "halted": int(self.halted.sum()),
                 "n": len(self.vids),
                 "sent": sum(len(d) for d, _ in out)}
        self.agg_local = {}
        return out, stats

    def result_table(self, vd_type: str):
        typ = {"double": pa.float64(), "int": pa.int64(),
               "int64_t": pa.int64()}.get(vd_type)
        vals = self.values
        if typ is not None:
            arr = pa.array([None if x is None else x for x in vals],
                           typ)
        else:
            arr = pa.array([None if x is None else str(x)
                            for x in vals], pa.string())
        # type empty partitions explicitly (pa.array([]) is null-typed
        # and would poison concat)
        id_t = (pa.int64() if np.asarray(self.vids).dtype.kind in "iu"
                else pa.string())
        ids = pa.array(list(self.vids), id_t)
        return pa.table({"id": ids, "value": arr})


class PregelResult:
    """What ``app(graph, **config)`` returns — a thin context with the
    reference's ``to_dataframe(selector)`` shape."""

    def __init__(self, tables: list):
        self._tables = tables

    def dataset(self) -> ray.data.Dataset:
        return ray.data.from_arrow(self._tables)

    def to_dataframe(self, selector: Optional[dict] = None
                     ) -> pd.DataFrame:
        df = (pa.concat_tables(self._tables).to_pandas()
              .sort_values("id").reset_index(drop=True))
        if selector is None:
            return df
        # reference selector dict: {"node": "v:label.id", "r":
        # "r:label"} — v:*.id -> the id column, r:* -> the value
        out = {}
        for name, sel in selector.items():
            if sel.startswith("v:"):
                out[name] = df["id"]
            elif sel.startswith("r"):
                out[name] = df["value"]
            else:
                raise ValueError(f"unsupported selector: {sel!r}")
        return pd.DataFrame(out)


def run_pregel(app_cls, edges, *, vertices=None, max_round: int = 100,
               num_parts: int = 4, **config) -> PregelResult:
    """Run a ``@pregel``-decorated class over an edge table.

    ``edges``: pandas DataFrame / pyarrow Table / ray Dataset whose
    first two columns are (src, dst); remaining columns are edge
    properties addressed positionally by ``e.get_int(i)`` etc. (index
    = column position in the table, matching the reference's
    property-id addressing). ``vertices``: optional iterable of extra
    vertex ids (edge-less vertices)."""
    if not getattr(app_cls, "__decorated__", False):
        raise ValueError("run_pregel needs a @pregel-decorated class")
    # ship the user class BY VALUE: module-level classes pickle by
    # reference, and the user's script module is not importable on
    # Ray workers (their sys.path starts at the worker cwd)
    import sys

    from ray import cloudpickle
    mod = sys.modules.get(app_cls.__module__)
    registered = False
    if mod is not None and app_cls.__module__ != "__main__":
        try:
            cloudpickle.register_pickle_by_value(mod)
            registered = True
        except Exception:
            pass
    try:
        app_payload = cloudpickle.dumps(app_cls)
    finally:
        if registered:
            cloudpickle.unregister_pickle_by_value(mod)
    if isinstance(edges, ray.data.Dataset):
        edges = edges.to_pandas()
    elif isinstance(edges, pa.Table):
        edges = edges.to_pandas()
    cols = [edges[c].to_numpy() for c in edges.columns]
    src, dst = cols[0], cols[1]
    vids = pd.unique(np.concatenate([src, dst]))
    if vertices is not None:
        vids = pd.unique(np.concatenate(
            [vids, np.asarray(list(vertices))]))
    total = len(vids)
    vpart = _part_of(np.asarray(vids), num_parts)
    order = np.argsort(src, kind="stable")
    epart = _part_of(src[order], num_parts)
    parts = []
    for p in range(num_parts):
        sel = order[epart == p]
        parts.append(_PregelPartition.remote(
            p, num_parts, vids[vpart == p], [c[sel] for c in cols],
            total))
    try:
        outs = ray.get([a.run_init.remote(app_payload, config)
                        for a in parts])
        registered = {}
        for _, st in outs:
            registered.update(st["registered"])
        agg_values = _merge_aggs(registered,
                                 [st["aggs"] for _, st in outs])
        blocks = [o for o, _ in outs]
        pending = sum(st["sent"] for _, st in outs)
        for superstep in range(max_round):
            routed = [[blocks[q][p] for q in range(num_parts)]
                      for p in range(num_parts)]
            outs = ray.get([
                a.compute.remote(app_payload, superstep, config,
                                 agg_values, routed[p])
                for p, a in enumerate(parts)])
            agg_values = _merge_aggs(
                registered, [st["aggs"] for _, st in outs])
            blocks = [o for o, _ in outs]
            pending = sum(st["sent"] for _, st in outs)
            all_halted = all(st["halted"] == st["n"] for _, st in outs)
            if pending == 0 and all_halted:
                break
        tables = ray.get([a.result_table.remote(
            getattr(app_cls, "_vd_type", "double")) for a in parts])
    finally:
        for a in parts:
            ray.kill(a)
    return PregelResult(tables)


_PREGEL_REQUIRED = ("Init", "Compute")


def pregel(vd_type: str, md_type: str):
    """The reference decorator (``udf/decorators.py:116``): validates
    the class shape (staticmethod ``Init(v, context)`` /
    ``Compute(messages, v, context)``, optional
    ``Combine(messages)``), records the declared types, and makes
    instances callable as ``app(graph_or_edges, **config)``."""

    def wrap(cls):
        if getattr(cls, "__decorated__", False):
            raise RuntimeError("Can't decorate on decorated class.")
        if not inspect.isclass(cls):
            raise ValueError(
                'The decorator "pregel" must be used on a class '
                'definition')
        for need in _PREGEL_REQUIRED:
            member = inspect.getattr_static(cls, need, None)
            if member is None:
                raise ValueError(
                    f"Missing necessary definition of method {need}")
            if not isinstance(member, staticmethod):
                raise ValueError(
                    f"Missing `staticmethod` decorator on {need}")
        cls.__decorated__ = True
        cls._vd_type = vd_type
        cls._md_type = md_type

        def _call(self, graph, **kwargs):
            edges = getattr(graph, "edges", graph)
            verts = getattr(graph, "vertices", None)
            vert_ids = None
            if verts is not None:
                vt = verts
                if isinstance(vt, ray.data.Dataset):
                    vt = vt.to_pandas()
                vert_ids = vt[vt.columns[0]].to_numpy()
            return run_pregel(type(self), edges, vertices=vert_ids,
                              **kwargs)

        cls.__call__ = _call
        return cls

    return wrap
