"""Gremlin-style traversal core compiled to Ray Data (GIE-lite).

The reference's interactive engine (GIE) compiles Gremlin traversals
to a dataflow of operators — ``interactive_engine/src/common/proto/
query_flow.proto:65-116`` enumerates V/E/OUT/IN/BOTH/OUT_E/IN_E/
OUT_V/IN_V/HAS/WHERE/FILTER/DEDUP/COUNT/ORDER/RANGE/UNION/
GROUP_COUNT/SELECT/PROP_VALUE/REPEAT/SIMPLE_PATH/PATH_OUT — executed
by a Rust dataflow runtime (``src/executor/runtime/src/dataflow/plan/
query_plan.rs``). SURVEY.md §2.7 scopes the full Gremlin engine out;
this module re-expresses the *core traversal subset* Ray-Data-first:

- a **traverser bag is a Dataset**: one row per traverser (Gremlin bag
  semantics — multiplicities preserved), columns ``t`` (current
  vertex id), ``tag_<name>`` (``as_`` labels), ``p<i>`` (optional path
  history), or ``e_src/e_dst/e_<prop>`` for edge traversers;
- a **hop is one exchange at most**: adjacency ≤ ``broadcast_limit``
  edges per (direction, label) is broadcast once as a CSR triple
  (``ray.put``, zero-copy reads in every task) and expanded with
  ``searchsorted`` + ``np.repeat`` inside ``map_batches`` — zero
  shuffle; above the limit the hop routes to ``cogroup_join`` (one
  hash-co-grouping shuffle, never a driver materialization);
- **dedup / group_count** use the house coarse-bucket kernels
  (``util.bucketed_distinct`` / ``bucketed_sum``) so any key
  cardinality stays vectorized;
- **order().limit(n)** trims top-n per block first (combiner), then
  performs one small global sort — ≤ n·#blocks rows ever shuffle.

100 TB notes: property lookups ride ``joins.attach_values`` which
broadcasts small vertex tables and falls back to a hash join above
``BROADCAST_ROWS``; traverser datasets stream block-by-block through
every step (no step materializes the bag). Path tracking widens each
traverser row by one int64 per hop — bound hops when tracking paths.
"""

from __future__ import annotations

import operator
import re
from typing import Callable, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from graphscope_ray.graph.joins import attach_values, cogroup_join
from graphscope_ray.util import bucketed_distinct, bucketed_sum

_BROADCAST_EDGES = 20_000_000


@ray.remote
def _assemble_csr(*tables):
    """Concatenate + src-sort edge blocks into the broadcast CSR pair
    — runs as a task so the driver heap never sees O(E) data; the
    result lands directly in the object store."""
    parts = [t for t in tables if t is not None and len(t)]
    if not parts:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    src = np.concatenate([
        t["src"].to_numpy(zero_copy_only=False) for t in parts
    ]).astype(np.int64, copy=False)
    dst = np.concatenate([
        t["dst"].to_numpy(zero_copy_only=False) for t in parts
    ]).astype(np.int64, copy=False)
    order = np.argsort(src, kind="stable")
    return (src[order], dst[order])


def unfold(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """UNFOLD (op 28): flatten a LIST column (e.g. a
    :meth:`Traversal.fold_by_key` result) back to one row per element;
    the other columns repeat per element. Pure Arrow kernel per batch
    (``list_value_length`` + ``take`` + ``list_flatten``) — zero
    Python per row, zero shuffle."""
    import pyarrow.compute as pc

    def flat(t: pa.Table) -> pa.Table:
        lens = pc.list_value_length(t[col]).combine_chunks()
        lens_np = lens.fill_null(0).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(len(t)), lens_np)
        out = {n: t[n].take(pa.array(idx)) for n in t.schema.names
               if n != col}
        out[col] = pc.list_flatten(t[col])
        return pa.table(out)

    return ds.map_batches(flat, batch_format="pyarrow")


class P:
    """Gremlin-style predicate over a property column (HAS=20 /
    FILTER=30 operands), applied vectorized to a numpy array."""

    def __init__(self, fn: Callable[[np.ndarray], np.ndarray], repr_: str):
        self._fn = fn
        self._repr = repr_

    def __call__(self, arr: np.ndarray) -> np.ndarray:
        return self._fn(arr)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"P({self._repr})"

    @staticmethod
    def eq(v):
        return P(lambda a: a == v, f"== {v!r}")

    @staticmethod
    def neq(v):
        return P(lambda a: a != v, f"!= {v!r}")

    @staticmethod
    def gt(v):
        return P(lambda a: a > v, f"> {v!r}")

    @staticmethod
    def gte(v):
        return P(lambda a: a >= v, f">= {v!r}")

    @staticmethod
    def lt(v):
        return P(lambda a: a < v, f"< {v!r}")

    @staticmethod
    def lte(v):
        return P(lambda a: a <= v, f"<= {v!r}")

    @staticmethod
    def within(*vs):
        vals = list(vs[0]) if len(vs) == 1 and isinstance(
            vs[0], (list, tuple, set)) else list(vs)
        return P(lambda a: np.isin(a, vals), f"within {vals!r}")

    @staticmethod
    def between(lo, hi):
        """Inclusive-exclusive, like Gremlin's P.between."""
        return P(lambda a: (a >= lo) & (a < hi), f"[{lo!r}, {hi!r})")

    # -- composition (reference AndTreeNode.java / OrTreeNode.java:
    # Gremlin P.and()/P.or() and the text forms and(gt(0), lt(10))) ---

    @staticmethod
    def and_(*ps: "P") -> "P":
        ps = [_as_pred(p) for p in ps]

        def fn(a):
            m = ps[0](a)
            for p in ps[1:]:
                m = m & p(a)
            return m

        return P(fn, " & ".join(p._repr for p in ps))

    @staticmethod
    def or_(*ps: "P") -> "P":
        ps = [_as_pred(p) for p in ps]

        def fn(a):
            m = ps[0](a)
            for p in ps[1:]:
                m = m | p(a)
            return m

        return P(fn, " | ".join(p._repr for p in ps))

    @staticmethod
    def not_(p: "P") -> "P":
        p = _as_pred(p)
        return P(lambda a: ~p(a), f"not({p._repr})")

    def __and__(self, other) -> "P":
        return P.and_(self, other)

    def __or__(self, other) -> "P":
        return P.or_(self, other)

    def __invert__(self) -> "P":
        return P.not_(self)


def _as_pred(value) -> P:
    return value if isinstance(value, P) else P.eq(value)


_MATH_FNS = {
    "abs": np.abs, "ceil": np.ceil, "floor": np.floor,
    "sqrt": np.sqrt, "exp": np.exp, "log": np.log, "log10": np.log10,
    "sin": np.sin, "cos": np.cos, "tan": np.tan, "signum": np.sign,
}
_MATH_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+\.\d+|\d+)|(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op>[-+*/%^()]))")


def _compile_math(expr: str):
    """Tiny exp4j-subset compiler (reference MathTreeNode.java): an
    arithmetic expression over ``_`` (the incoming value) → a
    vectorized numpy closure. No ``eval``."""
    toks = []
    i = 0
    while i < len(expr):
        m = _MATH_TOKEN.match(expr, i)
        if not m or m.end() == i:
            if expr[i:].strip():
                raise ValueError(f"bad math token at {expr[i:]!r}")
            break
        i = m.end()
        toks.append(m.group("num") or m.group("name") or m.group("op"))
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def take():
        t = peek()
        pos[0] += 1
        return t

    def atom():
        t = take()
        if t == "(":
            e = add()
            if take() != ")":
                raise ValueError(f"unbalanced parens in {expr!r}")
            return e
        if t == "-":
            e = atom()
            return lambda x: -e(x)
        if t == "_":
            return lambda x: x
        if t in _MATH_FNS:
            if take() != "(":
                raise ValueError(f"{t} needs parentheses in {expr!r}")
            e = add()
            if take() != ")":
                raise ValueError(f"unbalanced parens in {expr!r}")
            fn = _MATH_FNS[t]
            return lambda x: fn(e(x))
        if t is None:
            raise ValueError(f"truncated expression {expr!r}")
        try:
            v = float(t)
        except ValueError:
            raise ValueError(f"unsupported math name {t!r}") from None
        return lambda x, _v=v: np.full_like(x, _v, dtype=np.float64) \
            if isinstance(x, np.ndarray) else _v

    def power():
        e = atom()
        if peek() == "^":
            take()
            rhs = power()  # right-associative
            return lambda x: e(x) ** rhs(x)
        return e

    def mul():
        e = power()
        while peek() in ("*", "/", "%"):
            op = take()
            rhs = power()
            if op == "*":
                e = (lambda a, b: lambda x: a(x) * b(x))(e, rhs)
            elif op == "/":
                e = (lambda a, b: lambda x: a(x) / b(x))(e, rhs)
            else:
                e = (lambda a, b: lambda x: np.mod(a(x), b(x)))(e, rhs)
        return e

    def add():
        e = mul()
        while peek() in ("+", "-"):
            op = take()
            rhs = mul()
            if op == "+":
                e = (lambda a, b: lambda x: a(x) + b(x))(e, rhs)
            else:
                e = (lambda a, b: lambda x: a(x) - b(x))(e, rhs)
        return e

    out = add()
    if pos[0] != len(toks):
        raise ValueError(f"trailing tokens in {expr!r}")
    return out


def _names(ds: ray.data.Dataset) -> list:
    """Column names, [] for a schemaless empty bag. A fully-filtered
    pandas block chain can lose its schema (Ray 2.49 reports
    ``PandasBlockSchema(names=[])`` and ``Dataset.schema()`` returns
    None); every step that inspects the schema must survive that."""
    sch = ds.schema(fetch_if_missing=False) or ds.schema()
    return list(sch.names) if sch is not None else []


def _empty_v() -> ray.data.Dataset:
    """A typed empty vertex-traverser bag."""
    return ray.data.from_pandas(
        pd.DataFrame({"t": pd.Series([], dtype="int64")}))


class PropertyGraph:
    """A labeled property graph over two Datasets.

    ``vertices``: columns ``(id:int64, label:string, <props>...)``.
    ``edges``: columns ``(src:int64, dst:int64, label:string,
    <props>...)``.  Vertex ids must be unique ACROSS labels (callers
    namespace, e.g. ``key * 4 + label_code`` — SQL-replayable).

    Mirrors the loading contract of the reference's interactive graph
    (vineyard htap fragment: vertex/edge tables per label); here both
    sides stay Ray Datasets and every traversal step streams.
    """

    def __init__(self, vertices: ray.data.Dataset,
                 edges: ray.data.Dataset, *,
                 broadcast_limit: int = _BROADCAST_EDGES):
        self.vertices = vertices
        self.edges = edges
        self.broadcast_limit = broadcast_limit
        self._csr_cache: dict = {}
        self._edge_count: Optional[int] = None

    # -- sources ----------------------------------------------------

    def V(self, *labels: str, track_path: bool = False) -> "Traversal":
        """V (op 0): one traverser per vertex (of ``labels``, if
        given)."""
        ds = self.vertices
        if labels:
            labs = list(labels)

            def keep(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                return t.filter(pc.is_in(t["label"],
                                         value_set=pa.array(labs)))

            ds = ds.map_batches(keep, batch_format="pyarrow")

        def to_trav(t: pa.Table) -> pa.Table:
            cols = {"t": t["id"]}
            if track_path:
                cols["p0"] = t["id"]
            return pa.table(cols)

        return Traversal(self, ds.map_batches(to_trav,
                                              batch_format="pyarrow"),
                         kind="v", path_len=1 if track_path else 0)

    def E(self, *labels: str) -> "Traversal":
        """E (op 1): one traverser per edge."""
        ds = self.edges
        if labels:
            labs = list(labels)

            def keep(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                return t.filter(pc.is_in(t["label"],
                                         value_set=pa.array(labs)))

            ds = ds.map_batches(keep, batch_format="pyarrow")

        def to_trav(t: pa.Table) -> pa.Table:
            cols = {"e_src": t["src"], "e_dst": t["dst"],
                    "e_label": t["label"]}
            for name in t.schema.names:
                if name not in ("src", "dst", "label"):
                    cols[f"e_{name}"] = t[name]
            return pa.table(cols)

        return Traversal(self, ds.map_batches(to_trav,
                                              batch_format="pyarrow"),
                         kind="e")

    # -- adjacency routing -------------------------------------------

    def _edges_for(self, direction: str, label: Optional[str]
                   ) -> ray.data.Dataset:
        ds = self.edges
        if label is not None:
            lab = label

            def keep(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                return t.filter(pc.equal(t["label"], lab))

            ds = ds.map_batches(keep, batch_format="pyarrow")
        if direction == "in":
            from graphscope_ray.util import rename
            ds = rename(ds.select_columns(["src", "dst"]),
                        {"src": "dst", "dst": "src"})
        else:
            ds = ds.select_columns(["src", "dst"])
        return ds

    def _csr(self, direction: str, label: Optional[str]):
        """Broadcast CSR for one (direction, label): sorted src array +
        aligned dst array, built ONCE in a remote task (the edge blocks
        and the assembled arrays live in the object store — the driver
        never holds an O(E) buffer) and probed zero-copy per batch."""
        key = (direction, label)
        if key not in self._csr_cache:
            refs = self._edges_for(direction, label).to_arrow_refs()
            self._csr_cache[key] = _assemble_csr.remote(*refs)
        return self._csr_cache[key]

    def _use_broadcast(self) -> bool:
        if self._edge_count is None:
            self._edge_count = self.edges.count()
        return self._edge_count <= self.broadcast_limit

    # -- vertex programs ---------------------------------------------

    def program(self, app: str, **kw) -> ray.data.Dataset:
        """PROGRAM_GRAPH_* (query_flow.proto ops 10000-10007): hand
        this traversal graph to the analytical engine, the way the
        reference compiles Gremlin ``program()`` steps to vertex
        programs (``compiler/tree/PageRankVertexProgramTreeNode.java``,
        ``LpaVertexProgramTreeNode.java``).

        Builds a ``graph.Graph`` over THIS graph's edge table (vertex
        ids are the oids), runs the named app on the resident actor
        pool, decodes vids back to ids, and closes the pool. Apps:

        - ``'wcc'`` (PROGRAM_CC/PROGRAM_GRAPH_CC): min-id component
          per vertex — INCLUDING edge-less vertices of the vertex
          table, which become their own singleton component;
        - ``'pagerank'`` (PROGRAM_GRAPH_PAGERANK): directed
          benchmark-semantics PageRank over the edge-endpoint vertex
          set (kw: delta, max_round, tol);
        - ``'cdlp'`` (PROGRAM_GRAPH_LPA): LDBC label propagation,
          undirected (kw: max_round);
        - ``'hits'`` (PROGRAM_GRAPH_HITS): auth/hub scores (kw: tol,
          max_round, normalized);
        - ``'sssp'`` (reference
          ``ShortestPathVertexProgramTreeNode.java``): single-source
          shortest distances from ``source=<vertex id>`` (kw:
          ``unit=True`` for hop counts, ``weight='<edge prop>'`` for
          weighted edges; unreachable = +inf);
        - ``'lpa'`` (reference ``LpaVertexProgramTreeNode.java`` /
          ``PeerPressureVertexProgramTreeNode.java``):
          weighted-label-vote propagation, undirected (kw: max_round,
          ``weight='<edge prop>'``; without a weight every vote
          counts 1).

        One engine run per call — callers cache the result Dataset,
        not this method."""
        from graphscope_ray.graph.api import Graph
        apps = ("wcc", "pagerank", "cdlp", "hits", "sssp", "lpa")
        if app not in apps:
            raise ValueError(f"program app must be one of {apps}")
        weight = kw.pop("weight", None)
        cols = ["src", "dst"] + ([weight] if weight else [])
        edges = self.edges.select_columns(cols)
        g = Graph.from_edges(
            edges,
            weight_col=weight,
            symmetrize=app in ("wcc", "cdlp", "lpa"),
            directions="both" if app == "hits" else "forward")
        try:
            if app == "wcc":
                res = g.to_oid(g.wcc(), vid_cols=("vid", "comp"))
            elif app == "pagerank":
                res = g.to_oid(g.pagerank(**kw), vid_cols=("vid",))
            elif app == "cdlp":
                res = g.to_oid(g.cdlp(**kw), vid_cols=("vid", "label"))
            elif app == "sssp":
                res = g.to_oid(g.sssp(kw.pop("source"), **kw),
                               vid_cols=("vid",))
            elif app == "lpa":
                res = g.to_oid(g.lpa(**kw), vid_cols=("vid", "label"))
            else:
                res = g.to_oid(g.engine.hits(**kw), vid_cols=("vid",))
            from graphscope_ray.util import rename as _rn
            res = _rn(res, {"vid": "id"}).materialize()
        finally:
            g.close()
        if app != "wcc":
            return res
        # singleton components for vertices absent from the edge table
        sent = np.iinfo(np.int64).min
        withc = attach_values(
            self.vertices.select_columns(["id"]), res, on="id",
            table_key="id", value_names=["comp"],
            defaults={"comp": sent})

        def fix(t: pa.Table) -> pa.Table:
            ids = t["id"].to_numpy()
            comp = t["comp"].to_numpy()
            return pa.table({
                "id": ids,
                "comp": pa.array(np.where(comp == sent, ids, comp))})

        return withc.map_batches(fix, batch_format="pyarrow")


class Traversal:
    """A lazy traverser bag. Every step returns a new Traversal; the
    underlying Dataset executes as one streaming pipeline on the first
    terminal (``count`` / ``to_pandas`` / ``dataset``)."""

    def __init__(self, graph: PropertyGraph, ds: ray.data.Dataset, *,
                 kind: str, path_len: int = 0):
        self.graph = graph
        self.ds = ds
        self.kind = kind  # 'v' | 'e' | 'value'
        self.path_len = path_len

    # -- internals ----------------------------------------------------

    def _require(self, kind: str, step: str) -> None:
        if self.kind != kind:
            raise TypeError(
                f"{step}() needs a {kind!r}-traverser, have {self.kind!r}")

    def _hop(self, direction: str, label: Optional[str]) -> "Traversal":
        """OUT/IN (ops 2-3): expand each traverser along adjacency.
        Broadcast-CSR (zero shuffle) or one cogroup_join exchange."""
        self._require("v", direction)
        if not _names(self.ds):  # schemaless empty bag: propagate it
            # as-is (cogroup_join can't take a schemaless left side,
            # and fabricating a typed bag would drop unknowable tag
            # columns — downstream steps all handle schemaless-empty)
            return Traversal(self.graph, self.ds, kind="v", path_len=0)
        new_p = f"p{self.path_len}" if self.path_len else None
        if self.graph._use_broadcast():
            ref = self.graph._csr(direction, label)

            def expand(df: pd.DataFrame) -> pd.DataFrame:
                src, dst = ray.get(ref)
                t = df["t"].to_numpy()
                lo = np.searchsorted(src, t, side="left")
                hi = np.searchsorted(src, t, side="right")
                cnt = hi - lo
                total = int(cnt.sum())
                rows = np.repeat(np.arange(len(df)), cnt)
                out = df.iloc[rows].reset_index(drop=True)
                if total:
                    offs = np.arange(total) - np.repeat(
                        np.cumsum(cnt) - cnt, cnt)
                    nt = dst[np.repeat(lo, cnt) + offs]
                else:
                    nt = np.empty(0, dtype=np.int64)
                out["t"] = nt
                if new_p:
                    out[new_p] = nt
                return out

            nds = self.ds.map_batches(expand, batch_format="pandas")
        else:
            edges = self.graph._edges_for(direction, label)
            joined = cogroup_join(self.ds, edges, on="t",
                                  right_on="src", value_cols=["dst"])

            def finish(df: pd.DataFrame) -> pd.DataFrame:
                df = df.drop(columns=["t"]).rename(columns={"dst": "t"})
                if new_p:
                    df[new_p] = df["t"].to_numpy()
                return df

            nds = joined.map_batches(finish, batch_format="pandas")
        return Traversal(self.graph, nds, kind="v",
                         path_len=self.path_len + 1 if self.path_len
                         else 0)

    def _attach_vprops(self, props: Sequence[str],
                       out_names: Sequence[str]) -> ray.data.Dataset:
        """Pull vertex properties onto traverser rows (PROP_FILL=42):
        broadcast-or-join via attach_values."""
        vt = self.graph.vertices.select_columns(["id", *props])
        from graphscope_ray.util import rename as _rn
        if list(props) != list(out_names):
            vt = _rn(vt, dict(zip(props, out_names)))
        return attach_values(self.ds, vt, on="t", table_key="id",
                             value_names=list(out_names))

    # -- steps: movement ---------------------------------------------

    def out(self, label: Optional[str] = None) -> "Traversal":
        return self._hop("out", label)

    def in_(self, label: Optional[str] = None) -> "Traversal":
        return self._hop("in", label)

    def both(self, label: Optional[str] = None) -> "Traversal":
        """BOTH (op 4): one traverser per incident edge in each
        direction — the union of the out- and in-expansions."""
        a = self._hop("out", label)
        b = self._hop("in", label)
        return Traversal(self.graph, a.ds.union(b.ds), kind="v",
                         path_len=a.path_len)

    def _edge_move(self, direction: str, label: Optional[str]
                   ) -> "Traversal":
        """OUT_E / IN_E (ops 5-6): move onto incident edges, carrying
        edge properties as ``e_<prop>``, the edge label as ``e_label``
        and the anchor vertex as ``e_from`` (OTHER_V needs it)."""
        self._require("v", "outE" if direction == "out" else "inE")
        if not _names(self.ds):  # schemaless empty bag → empty edges
            return Traversal(self.graph, self.ds, kind="e", path_len=0)
        edges = self.graph.edges
        if label is not None:
            lab = label

            def keep(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                return t.filter(pc.equal(t["label"], lab))

            edges = edges.map_batches(keep, batch_format="pyarrow")
        prop_cols = [c for c in edges.schema().names
                     if c not in ("src", "dst", "label")]
        from graphscope_ray.util import rename as _rn
        far = "dst" if direction == "out" else "src"
        near = "src" if direction == "out" else "dst"
        edges = _rn(edges, {far: f"e_{far}", "label": "e_label",
                            **{c: f"e_{c}" for c in prop_cols}})
        vals = [f"e_{far}", "e_label"] + [f"e_{c}" for c in prop_cols]
        joined = cogroup_join(self.ds, edges, on="t", right_on=near,
                              value_cols=vals)

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy(deep=False)
            df["e_from"] = df["t"].to_numpy()
            return df.rename(columns={"t": f"e_{near}"})

        return Traversal(self.graph,
                         joined.map_batches(finish,
                                            batch_format="pandas"),
                         kind="e", path_len=0)

    def outE(self, label: Optional[str] = None) -> "Traversal":
        """OUT_E (op 5): move onto the outgoing edges."""
        return self._edge_move("out", label)

    def inE(self, label: Optional[str] = None) -> "Traversal":
        """IN_E (op 6): move onto the incoming edges."""
        return self._edge_move("in", label)

    def bothE(self, label: Optional[str] = None) -> "Traversal":
        """BOTH_E (op 7): incident edges in either direction (an edge
        whose endpoints are both in the bag appears once per side,
        Gremlin bag semantics)."""
        a = self._edge_move("out", label)
        b = self._edge_move("in", label)
        # Union needs one column order on both sides.
        cols = sorted(_names(a.ds) or _names(b.ds))
        if not cols:  # both sides schemaless-empty
            return Traversal(self.graph, a.ds.union(b.ds),
                             kind="e", path_len=0)
        return Traversal(self.graph,
                         a.ds.select_columns(cols).union(
                             b.ds.select_columns(cols)),
                         kind="e", path_len=0)

    def inV(self) -> "Traversal":
        """IN_V (op 9): edge traverser → its destination vertex."""
        self._require("e", "inV")

        def mv(df: pd.DataFrame) -> pd.DataFrame:
            keep = [c for c in df.columns if not c.startswith("e_")]
            out = df[keep].copy(deep=False)
            out["t"] = df["e_dst"].to_numpy()
            return out

        return Traversal(self.graph,
                         self.ds.map_batches(mv, batch_format="pandas"),
                         kind="v")

    def outV(self) -> "Traversal":
        """OUT_V (op 8): edge traverser → its source vertex."""
        self._require("e", "outV")

        def mv(df: pd.DataFrame) -> pd.DataFrame:
            keep = [c for c in df.columns if not c.startswith("e_")]
            out = df[keep].copy(deep=False)
            out["t"] = df["e_src"].to_numpy()
            return out

        return Traversal(self.graph,
                         self.ds.map_batches(mv, batch_format="pandas"),
                         kind="v")

    def bothV(self) -> "Traversal":
        """BOTH_V (op 10): edge traverser → both endpoints (two
        traversers per edge)."""
        self._require("e", "bothV")

        def mv(df: pd.DataFrame) -> pd.DataFrame:
            keep = [c for c in df.columns if not c.startswith("e_")]
            a = df[keep].copy(deep=False)
            a["t"] = df["e_src"].to_numpy()
            b = df[keep].copy(deep=False)
            b["t"] = df["e_dst"].to_numpy()
            return pd.concat([a, b], ignore_index=True)

        return Traversal(self.graph,
                         self.ds.map_batches(mv, batch_format="pandas"),
                         kind="v")

    def otherV(self) -> "Traversal":
        """OTHER_V (op 48): edge traverser → the endpoint the
        traversal did NOT arrive from. Needs the ``e_from`` anchor,
        i.e. an ``outE``/``inE``/``bothE`` hop (a plain ``E()`` source
        has no arrival side)."""
        self._require("e", "otherV")
        names = _names(self.ds)
        if not names:  # schemaless empty bag → empty vertex bag
            return Traversal(self.graph, _empty_v(), kind="v")
        if "e_from" not in names:
            raise ValueError("otherV() needs an outE/inE/bothE hop "
                             "(E() traversers have no arrival side)")

        def mv(df: pd.DataFrame) -> pd.DataFrame:
            keep = [c for c in df.columns if not c.startswith("e_")]
            out = df[keep].copy(deep=False)
            src = df["e_src"].to_numpy()
            dst = df["e_dst"].to_numpy()
            out["t"] = np.where(df["e_from"].to_numpy() == src, dst, src)
            return out

        return Traversal(self.graph,
                         self.ds.map_batches(mv, batch_format="pandas"),
                         kind="v")

    # -- steps: filtering ---------------------------------------------

    def has(self, prop: str, value) -> "Traversal":
        """HAS (op 20): keep traversers whose element's property
        satisfies the predicate (``P.*`` or equality literal)."""
        pred = _as_pred(value)
        if self.kind == "e":
            col = f"e_{prop}"

            def keep_e(df: pd.DataFrame) -> pd.DataFrame:
                return df[pred(df[col].to_numpy())]

            return Traversal(self.graph,
                             self.ds.map_batches(keep_e,
                                                 batch_format="pandas"),
                             kind="e")
        self._require("v", "has")
        tmp = "_has_val"
        withp = self._attach_vprops([prop], [tmp])

        def keep_v(df: pd.DataFrame) -> pd.DataFrame:
            return df[pred(df[tmp].to_numpy())].drop(columns=[tmp])

        return Traversal(self.graph,
                         withp.map_batches(keep_v,
                                           batch_format="pandas"),
                         kind="v", path_len=self.path_len)

    def has_label(self, *labels: str) -> "Traversal":
        """WHERE_LABEL (op 27): filter vertex traversers by the vertex
        table's label column."""
        return self.has("label", P.within(*labels))

    def has_id(self, *ids) -> "Traversal":
        self._require("v", "has_id")
        pred = P.within(*ids)

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[pred(df["t"].to_numpy())]

        return Traversal(self.graph,
                         self.ds.map_batches(keep,
                                             batch_format="pandas"),
                         kind="v", path_len=self.path_len)

    def where(self, tag_a: str, op: str, tag_b: str) -> "Traversal":
        """WHERE (op 24): compare two tagged positions of each
        traverser (e.g. ``where('a', '!=', 'b')`` for cycle checks)."""
        ops = {"==": operator.eq, "!=": operator.ne,
               "<": operator.lt, "<=": operator.le,
               ">": operator.gt, ">=": operator.ge}
        fn = ops[op]
        ca = "t" if tag_a == "." else f"tag_{tag_a}"
        cb = "t" if tag_b == "." else f"tag_{tag_b}"

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[fn(df[ca].to_numpy(), df[cb].to_numpy())]

        return Traversal(self.graph,
                         self.ds.map_batches(keep,
                                             batch_format="pandas"),
                         kind=self.kind, path_len=self.path_len)

    def filter_col(self, name: str, value) -> "Traversal":
        """FILTER (op 30) on an existing traverser column (a tag, a
        ``degree_local`` count, a carried ``e_<prop>``)."""
        pred = _as_pred(value)

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[pred(df[name].to_numpy())]

        return Traversal(self.graph,
                         self.ds.map_batches(keep,
                                             batch_format="pandas"),
                         kind=self.kind, path_len=self.path_len)

    def _elem_hash(self, seed: int) -> Callable[[pd.DataFrame],
                                                np.ndarray]:
        """Deterministic per-traverser uint64. Vertex traversers use
        fmix64(t ^ seed) — SQL-replayable (the pg_sampling recipe);
        other kinds combine their element columns via the stable
        pandas hash."""
        from graphscope_ray.data.hashing import fmix64
        if self.kind == "v":
            def h(df: pd.DataFrame) -> np.ndarray:
                if not len(df):  # schemaless empty block
                    return np.empty(0, dtype=np.uint64)
                t = df["t"].to_numpy().astype(np.int64, copy=False)
                return fmix64(t.view(np.uint64) ^ np.uint64(seed))
            return h
        names = _names(self.ds)
        cols = (["e_src", "e_dst"] if self.kind == "e"
                else names[:1])

        def h(df: pd.DataFrame) -> np.ndarray:
            if not len(df):  # schemaless empty block
                return np.empty(0, dtype=np.uint64)
            acc = np.full(len(df), np.uint64(seed))
            for c in cols:
                acc = acc * np.uint64(1099511628211) ^ \
                    pd.util.hash_array(df[c].to_numpy())
            return fmix64(acc)
        return h

    def sample(self, n: int, *, seed: int = 1) -> "Traversal":
        """SAMPLE (op 75), deterministic: the n traversers with the
        smallest fmix64 hash of their element. Per-block trim first,
        so ≤ n·#blocks rows reach the one small global sort."""
        hash_fn = self._elem_hash(seed)

        def trim(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy(deep=False)
            df["_h"] = hash_fn(df).view(np.int64)
            return df.nsmallest(n, "_h", keep="first")

        ds = (self.ds.map_batches(trim, batch_format="pandas")
              .sort("_h").limit(n).drop_columns(["_h"]))
        return Traversal(self.graph, ds, kind=self.kind,
                         path_len=self.path_len)

    def coin(self, p: float, *, seed: int = 1) -> "Traversal":
        """COIN: keep each traverser independently with probability
        ``p`` (deterministic hash threshold, same datum on replay)."""
        if p >= 1.0:
            return self
        hash_fn = self._elem_hash(seed)
        # strict < so p=0 keeps nothing even for a zero-valued hash;
        # clamp the float product into the u64 domain
        thresh = np.uint64(min(max(int(p * float(2**64)), 0),
                               2**64 - 1))

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[hash_fn(df) < thresh]

        return Traversal(self.graph,
                         self.ds.map_batches(keep,
                                             batch_format="pandas"),
                         kind=self.kind, path_len=self.path_len)

    def degree_local(self, direction: str = "out",
                     label: Optional[str] = None, *,
                     name: str = "deg") -> "Traversal":
        """OUT_COUNT / IN_COUNT / BOTH_COUNT (ops 66-68): append each
        vertex traverser's incident-edge count as column ``name``.
        Broadcast path: two searchsorted probes per batch against the
        CSR; scale path: one bucketed count + broadcast-or-join
        attach (missing vertices get 0)."""
        self._require("v", "degree_local")
        dirs = ["out", "in"] if direction == "both" else [direction]
        if self.graph._use_broadcast():
            refs = [self.graph._csr(d, label) for d in dirs]

            def count(df: pd.DataFrame) -> pd.DataFrame:
                t = df["t"].to_numpy()
                deg = np.zeros(len(df), dtype=np.int64)
                for ref in refs:
                    src, _ = ray.get(ref)
                    deg += (np.searchsorted(src, t, side="right")
                            - np.searchsorted(src, t, side="left"))
                out = df.copy(deep=False)
                out[name] = deg
                return out

            nds = self.ds.map_batches(count, batch_format="pandas")
        else:
            parts = [self.graph._edges_for(d, label).select_columns(
                ["src"]) for d in dirs]
            allsrc = parts[0] if len(parts) == 1 else \
                parts[0].union(parts[1])
            # pin: attach_values reads its table twice (count + read)
            degs = bucketed_sum(allsrc, ["src"],
                                count_as=name).materialize()
            nds = attach_values(self.ds, degs, on="t",
                                table_key="src", value_names=[name],
                                defaults={name: 0})
        return Traversal(self.graph, nds, kind="v",
                         path_len=self.path_len)

    def _sub_filter(self, fn: Callable[["Traversal"], "Traversal"],
                    want: bool) -> "Traversal":
        """JOIN_DIRECT_FILTER / _NEGATE (ops 46/70): keep traversers
        for which the sub-traversal produces ≥1 result (or none, for
        the negated form). Each row is keyed by a 64-bit hash of ALL
        its columns (identical traversers filter identically — bag
        semantics hold); the sub-traversal must be column-preserving
        (hops and filters; not values/group_count). Survivor keys
        dedup via the coarse-bucket kernel, then one
        broadcast-or-join flag attach — no driver materialization."""
        return self._sub_filter_multi([fn], "and", want=want)

    def where_exists(self, fn: Callable[["Traversal"], "Traversal"]
                     ) -> "Traversal":
        """Gremlin ``where(<traversal>)``: keep traversers whose
        sub-traversal is non-empty (JOIN_DIRECT_FILTER, op 46)."""
        return self._sub_filter(fn, want=True)

    def where_not_exists(self, fn: Callable[["Traversal"], "Traversal"]
                         ) -> "Traversal":
        """Gremlin ``not(<traversal>)`` (NOT=47 /
        JOIN_DIRECT_FILTER_NEGATE=70)."""
        return self._sub_filter(fn, want=False)

    def _stamp_keys(self) -> tuple:
        """Hash-stamp every traverser row with a 64-bit key of ALL its
        columns (bag semantics: identical rows share fate) and pin the
        stamped bag — the sub-filter steps consume it once per branch
        plus once for the final flag attach. The key column name is
        chosen fresh per nesting level (where(and(__...)) stamps
        inside a stamped bag; reusing ``_wk`` would overwrite — and
        later drop — the outer key). Returns (cols, key_name, keyed)."""
        cols = _names(self.ds)
        wk = "_wk"
        n = 2
        while wk in cols:
            wk = f"_wk{n}"
            n += 1

        def stamp(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy(deep=False)
            h = np.zeros(len(df), dtype=np.uint64)
            for c in cols:
                h = h * np.uint64(1099511628211) ^ \
                    pd.util.hash_array(df[c].to_numpy())
            df[wk] = h.view(np.int64)
            return df

        keyed = self.ds.map_batches(
            stamp, batch_format="pandas").materialize()
        return cols, wk, keyed

    def _hit_keys(self, keyed, wk: str, fn, colname: str):
        """Distinct survivor key values of one sub-traversal, flagged
        1 under ``colname`` (pinned — attach_values reads it twice)."""
        base = Traversal(self.graph, keyed, kind=self.kind,
                         path_len=self.path_len)
        sub = fn(base)
        hits = bucketed_distinct(sub.ds.select_columns([wk]), [wk])

        def flag(t: pa.Table) -> pa.Table:
            return t.append_column(
                colname, pa.array(np.ones(len(t), dtype=np.int64)))

        return hits.map_batches(flag,
                                batch_format="pyarrow").materialize()

    def _sub_filter_multi(self, fns, mode: str, *,
                          want: bool = True) -> "Traversal":
        """AND/OR over ≥1 sub-traversals (reference AndTreeNode.java /
        OrTreeNode.java): keep traversers for which ALL (``and``) or
        ANY (``or``) branches produce ≥1 result (``want=False``
        inverts — the not() form). One flag attach per branch on the
        hash-stamped bag; branch count is query-sized (2-3), not
        data-sized."""
        if not _names(self.ds):  # schemaless empty bag: no-op
            return self
        cols, wk, keyed = self._stamp_keys()
        flag_cols = []
        flagged = keyed
        for i, fn in enumerate(fns):
            name = f"_h{i}"
            flag_cols.append(name)
            hits = self._hit_keys(keyed, wk, fn, name)
            flagged = attach_values(flagged, hits, on=wk,
                                    table_key=wk,
                                    value_names=[name],
                                    defaults={name: 0})
        combine = np.logical_and if mode == "and" else np.logical_or

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            m = df[flag_cols[0]].to_numpy() == 1
            for c in flag_cols[1:]:
                m = combine(m, df[c].to_numpy() == 1)
            if not want:
                m = ~m
            return df[m].drop(columns=[wk, *flag_cols])

        return Traversal(self.graph,
                         flagged.map_batches(keep,
                                             batch_format="pandas"),
                         kind=self.kind, path_len=self.path_len)

    def and_where(self, *fns) -> "Traversal":
        """Gremlin ``and(__...., __....)`` (AndTreeNode.java): every
        branch must match."""
        if not fns:
            raise ValueError("and_where() needs >=1 sub-traversal")
        return self._sub_filter_multi(fns, "and")

    def or_where(self, *fns) -> "Traversal":
        """Gremlin ``or(__...., __....)`` (OrTreeNode.java): at least
        one branch must match."""
        if not fns:
            raise ValueError("or_where() needs >=1 sub-traversal")
        return self._sub_filter_multi(fns, "or")

    def optional(self, fn: Callable[["Traversal"], "Traversal"]
                 ) -> "Traversal":
        """Gremlin ``optional(<traversal>)`` (OptionalTreeNode.java):
        traversers whose sub-traversal matches are REPLACED by its
        results; the rest pass through unchanged. The sub-traversal
        must be column-preserving and end at the same element kind
        (hops/filters), and the parent must not be in tracked-path
        mode (the two union sides would disagree on path columns)."""
        if self.path_len:
            raise TypeError(
                "optional() is not supported on tracked-path "
                "traversals (the matched and unmatched sides would "
                "have different path columns)")
        if not _names(self.ds):  # schemaless empty bag: no-op
            return self
        cols, wk, keyed = self._stamp_keys()
        base = Traversal(self.graph, keyed, kind=self.kind,
                         path_len=0)
        sub = fn(base)
        if sub.kind != self.kind:
            raise TypeError(
                f"optional() sub-traversal must end at the same "
                f"element kind ({self.kind!r}), got {sub.kind!r}")
        hits = bucketed_distinct(sub.ds.select_columns([wk]), [wk])

        def flag(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_hit", pa.array(np.ones(len(t), dtype=np.int64)))

        hits = hits.map_batches(flag,
                                batch_format="pyarrow").materialize()
        flagged = attach_values(keyed, hits, on=wk,
                                table_key=wk, value_names=["_hit"],
                                defaults={"_hit": 0})

        def keep_miss(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["_hit"].to_numpy() == 0][cols]

        misses = flagged.map_batches(keep_miss, batch_format="pandas")

        def strip(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):  # schemaless empty block from an empty sub
                return df.reindex(columns=cols)
            return df[cols]

        matched = sub.ds.map_batches(strip, batch_format="pandas")
        return Traversal(self.graph, misses.union(matched),
                         kind=self.kind, path_len=0)

    def group_by(self, by: Optional[str] = None,
                 value: Optional[str] = None, agg: str = "fold", *,
                 limit: Optional[int] = None,
                 name: Optional[str] = None):
        """General ``group().by(key).by(value-agg)`` (reference
        GroupTreeNode.java — non-count group values): group the bag by
        a key column/property and aggregate a value column/property
        per key. ``agg``: ``fold`` (sorted LIST per key — Gremlin's
        default group value), ``sum``/``max``/``min``/``mean``, or
        ``count`` (= :meth:`group_count`). Defaults group the current
        element and fold element ids. Executes on the coarse-bucket
        kernels — one exchange at any key cardinality."""
        have = _names(self.ds)

        def resolve(c: str) -> str:
            # Gremlin text uses bare names; the bag stores as_() tags
            # as tag_<name>, edge properties as e_<prop>, and the
            # current vertex id as t
            if c in have:
                return c
            if f"tag_{c}" in have:
                return f"tag_{c}"
            if self.kind == "e" and f"e_{c}" in have:
                return f"e_{c}"
            if self.kind == "v" and c == "id":
                return "t"
            return c

        by_disp = by or ("t" if self.kind == "v" else have[0])
        by = resolve(by_disp)
        if agg == "count":
            out = self.group_count(by)
        else:
            val_disp = value or ("t" if self.kind == "v" else have[0])
            value = resolve(val_disp)
            if agg == "fold":
                out = self.fold_by_key(by, value, limit=limit,
                                       name=name or f"fold_{val_disp}")
            elif agg in ("sum", "max", "min", "mean"):
                out = self.group_agg(by, value, agg,
                                     name=name or f"{agg}_{val_disp}")
            else:
                raise ValueError(
                    f"unsupported group aggregate: {agg!r}")
        if by != by_disp:
            from graphscope_ray.util import rename as _rn
            out = _rn(out, {by: by_disp})
        return out

    def simple_path(self) -> "Traversal":
        """SIMPLE_PATH (op 32): keep traversers whose tracked path has
        no repeated vertex (needs ``V(track_path=True)``)."""
        if not self.path_len:
            raise ValueError("simple_path() needs V(track_path=True)")
        k = self.path_len
        cols = [f"p{i}" for i in range(k)]

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            m = np.column_stack([df[c].to_numpy() for c in cols])
            m.sort(axis=1)
            ok = (m[:, 1:] != m[:, :-1]).all(axis=1)
            return df[ok]

        return Traversal(self.graph,
                         self.ds.map_batches(keep,
                                             batch_format="pandas"),
                         kind=self.kind, path_len=k)

    # -- steps: transformation -----------------------------------------

    def as_(self, name: str) -> "Traversal":
        """Tag the current position (the SELECT/JOIN_LABEL store).
        Vertex traversers only — an edge has no single id to tag."""
        self._require("v", "as_")
        col = f"tag_{name}"

        def tag(t: pa.Table) -> pa.Table:
            return t.append_column(col, t["t"])

        return Traversal(self.graph,
                         self.ds.map_batches(tag,
                                             batch_format="pyarrow"),
                         kind=self.kind, path_len=self.path_len)

    def select(self, name: str) -> "Traversal":
        """SELECT_ONE (op 11): jump back to a tagged position."""
        col = f"tag_{name}"

        def mv(df: pd.DataFrame) -> pd.DataFrame:
            keep = [c for c in df.columns
                    if not c.startswith("e_") and c != "t"]
            out = df[keep].copy(deep=False)
            out["t"] = df[col].to_numpy()
            return out

        return Traversal(self.graph,
                         self.ds.map_batches(mv, batch_format="pandas"),
                         kind="v", path_len=self.path_len)

    def values(self, prop: str) -> "Traversal":
        """PROP_VALUE (op 25): map each traverser to a property value;
        the bag becomes a value bag (column named ``prop``)."""
        if not _names(self.ds):  # schemaless empty bag
            return Traversal(self.graph, ray.data.from_pandas(
                pd.DataFrame({prop: pd.Series([], dtype="float64")})),
                kind="value")
        if self.kind == "e":
            col = f"e_{prop}"
            nds = self.ds.select_columns([col])
            from graphscope_ray.util import rename as _rn
            nds = _rn(nds, {col: prop})
        else:
            self._require("v", "values")
            withp = self._attach_vprops([prop], [prop])
            nds = withp.select_columns([prop])
        return Traversal(self.graph, nds, kind="value")

    def path(self) -> ray.data.Dataset:
        """PATH_OUT (op 29): the tracked path columns ``p0..pk``."""
        if not self.path_len:
            raise ValueError("path() needs V(track_path=True)")
        return self.ds.select_columns(
            [f"p{i}" for i in range(self.path_len)])

    # -- steps: bag algebra ---------------------------------------------

    def dedup(self) -> "Traversal":
        """DEDUP (op 18) by the current element. Tag/path history is
        dropped (a deterministic choice; Gremlin keeps the first
        arrival, which is execution-order-dependent)."""
        names = _names(self.ds)
        if not names:  # schemaless empty bag: dedup is a no-op
            return self
        keys = (["t"] if self.kind == "v"
                else ["e_src", "e_dst"] if self.kind == "e"
                else names[:1])
        return Traversal(self.graph,
                         bucketed_distinct(self.ds, keys),
                         kind=self.kind)

    def union(self, other: "Traversal") -> "Traversal":
        """UNION (op 17): bag union (schemas must match)."""
        if other.kind != self.kind:
            raise TypeError("union of different traverser kinds")
        return Traversal(self.graph, self.ds.union(other.ds),
                         kind=self.kind)

    def repeat(self, step: Callable[["Traversal"], "Traversal"],
               times: int) -> "Traversal":
        """REPEAT … times(k) (ops 21-22, loop-unrolled)."""
        t = self
        for _ in range(times):
            t = step(t)
        return t

    def repeat_until(self, step: Callable[["Traversal"], "Traversal"],
                     cond: Callable[["Traversal"], "Traversal"],
                     *, max_times: int = 16) -> "Traversal":
        """REPEAT … UNTIL (the dynamic-termination loop of the
        reference's Gremlin surface — interactive_engine repeat/until;
        the fixed-times form is :meth:`repeat`). Post-check semantics:
        apply ``step``, traversers for which the ``cond``
        sub-traversal is non-empty leave the loop, the rest iterate —
        one driver round (a count) per iteration, exactly a BSP
        superstep. Traversers still looping after ``max_times`` are
        kept (Gremlin keeps in-flight traversers when a times-guard
        fires first). The result bag is the union of every exit
        round."""
        t = self
        done: list[ray.data.Dataset] = []
        empty = None
        kind = None
        for _ in range(max_times):
            t = step(t)
            kind = t.kind
            exited = t.where_exists(cond)
            t = t.where_not_exists(cond)
            # pin the frontier: the next round must not re-execute
            # this round's (lazy) expansion chain per consumer
            t = Traversal(self.graph, t.ds.materialize(), kind=t.kind,
                          path_len=t.path_len)
            # skip empty exit rounds: unioning a schemaless empty
            # block poisons downstream schema inference
            if exited.count() > 0:
                done.append(exited.ds.materialize())
            else:
                empty = exited.ds
            if t.count() == 0:
                t = None
                break
        if t is not None:
            done.append(t.ds)
        if not done:
            return Traversal(self.graph, empty, kind=kind,
                             path_len=None)
        out = done[0]
        for d in done[1:]:
            out = out.union(d)
        return Traversal(self.graph, out, kind=kind,
                         path_len=None)

    def range_(self, lo: int, hi: int) -> "Traversal":
        """RANGE (op 15) with a non-zero low end — the paging slice
        ``[lo, hi)`` of the current (ordered) bag. ``hi`` is required
        (finite): the bag is first cut to ``hi`` rows (block-local
        trims upstream in order_by keep that cheap), then the ≤ hi
        survivors coalesce into one block to drop the first ``lo`` —
        a driver-adjacent step sized by the page, never the corpus."""
        if not (0 <= lo < hi):
            raise ValueError("range_ needs 0 <= lo < hi (finite hi)")
        ds = self.ds.limit(hi)
        if lo:
            n = lo

            def drop(df: pd.DataFrame) -> pd.DataFrame:
                return df.iloc[n:]

            ds = ds.repartition(1).map_batches(drop,
                                               batch_format="pandas")
        return Traversal(self.graph, ds, kind=self.kind,
                         path_len=self.path_len)

    def select_map(self, *names: str,
                   current: Optional[str] = None) -> ray.data.Dataset:
        """Multi-tag SELECT (Gremlin ``select('a','b')`` — op 11's
        n-ary form): project the tagged positions into a Dataset with
        one column per tag name; ``current=<name>`` additionally emits
        the current element under that name."""
        cols = {n: f"tag_{n}" for n in names}
        missing = [c for c in cols.values() if c not in _names(self.ds)]
        if missing:
            raise KeyError(f"unknown tags: {missing}")
        proj = self.ds.select_columns(list(cols.values()))
        from graphscope_ray.util import rename as _rn
        out = _rn(proj, {v: k for k, v in cols.items()})
        if current is not None:
            self._require("v", "select_map(current=...)")
            cur = _rn(self.ds.select_columns(
                list(cols.values()) + ["t"]), {"t": current})
            out = _rn(cur, {v: k for k, v in cols.items()})
        return out

    def project(self, specs: dict) -> ray.data.Dataset:
        """Gremlin ``project('a','b').by(...).by(...)`` (reference
        ``ProjectTreeNode`` compile path): one output row per
        traverser with one column per projection. Supported by-forms
        (the overwhelmingly common idioms, each vectorized):

        - ``"id"`` / ``None`` — the current element id;
        - ``"<prop>"`` — a vertex property (attached broadcast-or-join);
        - ``("count", direction[, label])`` — the incident-edge count
          (``__.out(label).count()``, via :meth:`degree_local`).
        """
        self._require("v", "project")
        t = self
        outs = []
        for out, spec in specs.items():
            if isinstance(spec, tuple) and spec and spec[0] == "count":
                direction = spec[1] if len(spec) > 1 else "out"
                label = spec[2] if len(spec) > 2 else None
                t = t.degree_local(direction, label, name=out)
            elif spec in (None, "id"):
                def copy_id(df: pd.DataFrame, _o=out) -> pd.DataFrame:
                    df = df.copy(deep=False)
                    df[_o] = df["t"].to_numpy()
                    return df
                t = Traversal(self.graph,
                              t.ds.map_batches(copy_id,
                                               batch_format="pandas"),
                              kind="v", path_len=t.path_len)
            else:
                nds = t._attach_vprops([spec], [out])
                t = Traversal(self.graph, nds, kind="v",
                              path_len=t.path_len)
            outs.append(out)
        return t.ds.select_columns(outs)

    # -- steps: user lambdas (ops 1000-1002) -------------------------------

    def lambda_filter(self, fn: Callable[[pd.DataFrame], np.ndarray]
                      ) -> "Traversal":
        """LAMBDA_FILTER (op 1000): keep traversers where the user
        function returns True. ``fn`` receives a whole pandas batch of
        traverser rows and returns a boolean mask — vectorized by
        contract (the reference ships single-traverser Gremlin
        lambdas to the executor; here the batch IS the unit, so user
        code runs at kernel speed)."""
        def keep(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df
            return df[np.asarray(fn(df), dtype=bool)]

        return Traversal(self.graph,
                         self.ds.map_batches(keep,
                                             batch_format="pandas"),
                         kind=self.kind, path_len=self.path_len)

    def lambda_map(self, name: str,
                   fn: Callable[[pd.DataFrame], np.ndarray]
                   ) -> "Traversal":
        """LAMBDA_MAP (op 1001): append column ``name`` computed by a
        vectorized user function over each traverser batch."""
        def add(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy(deep=False)
            df[name] = (fn(df) if len(df)
                        else pd.Series([], dtype="float64"))
            return df

        return Traversal(self.graph,
                         self.ds.map_batches(add, batch_format="pandas"),
                         kind=self.kind, path_len=self.path_len)

    def lambda_flatmap(self, fn: Callable[[pd.DataFrame], pd.DataFrame]
                       ) -> "Traversal":
        """LAMBDA_FLATMAP (op 1002): user function maps each traverser
        batch to ANY number of output traverser rows (same columns);
        the bag re-forms from the concatenation."""
        def flat(df: pd.DataFrame) -> pd.DataFrame:
            return fn(df) if len(df) else df

        return Traversal(self.graph,
                         self.ds.map_batches(flat,
                                             batch_format="pandas"),
                         kind=self.kind, path_len=self.path_len)

    # -- steps: ordering / aggregation -----------------------------------

    def order_by(self, key: Optional[str] = None, *,
                 ascending: bool = True,
                 limit: Optional[int] = None) -> "Traversal":
        """ORDER (op 14) + RANGE (op 15). ``key``: a property name
        (vertex traversers attach it first), an existing column, or
        None for the current element. With ``limit``, each block trims
        to its local top-n first, so ≤ n·#blocks rows reach the sort.
        Ties broken by the current element id for determinism."""
        names = _names(self.ds)
        if not names:  # schemaless empty bag: ordering is a no-op
            return self
        if key is None:
            col, ds = ("t" if self.kind == "v"
                       else names[0]), self.ds
        elif key in names:
            col, ds = key, self.ds
        else:
            self._require("v", "order_by(property)")
            col, ds = key, self._attach_vprops([key], [key])
        tie = "t" if self.kind == "v" and col != "t" else None
        if limit is not None:
            n = limit
            asc = ascending

            def trim(df: pd.DataFrame) -> pd.DataFrame:
                by = [col] + ([tie] if tie else [])
                df = df.sort_values(by, ascending=[asc] + [True] *
                                    (len(by) - 1), kind="mergesort")
                return df.head(n)

            ds = ds.map_batches(trim, batch_format="pandas")
        sort_keys = [col] + ([tie] if tie else [])
        ds = ds.sort(sort_keys, descending=[not ascending] +
                     [False] * (len(sort_keys) - 1))
        if limit is not None:
            ds = ds.limit(limit)
        return Traversal(self.graph, ds, kind=self.kind,
                         path_len=self.path_len)

    def limit(self, n: int) -> "Traversal":
        """RANGE (op 15) low=0: an arbitrary-n cut (deterministic only
        after order_by)."""
        return Traversal(self.graph, self.ds.limit(n), kind=self.kind,
                         path_len=self.path_len)

    def group_count(self, by: Optional[str] = None) -> ray.data.Dataset:
        """GROUP_COUNT (op 19): counts per current element, or per
        property/tag/value column when ``by`` is given. One
        coarse-bucket exchange at any key cardinality."""
        names = _names(self.ds)
        if not names:  # schemaless empty bag → typed empty counts
            key = by or ("t" if self.kind == "v" else "e_src")
            return ray.data.from_pandas(pd.DataFrame({
                key: pd.Series([], dtype="int64"),
                "count": pd.Series([], dtype="int64")}))
        if by is None:
            keys = (["t"] if self.kind == "v"
                    else ["e_src", "e_dst"] if self.kind == "e"
                    else names[:1])
            ds = self.ds
        elif by in names:
            keys, ds = [by], self.ds
        else:
            self._require("v", "group_count(property)")
            keys, ds = [by], self._attach_vprops([by], [by])
        return bucketed_sum(ds.select_columns(keys), keys,
                            count_as="count")

    def group_agg(self, by: str, value: str, agg: str, *,
                  name: Optional[str] = None) -> ray.data.Dataset:
        """SUM_BY_KEY / MAX_BY_KEY / MIN_BY_KEY (ops 53/56/57) and
        mean: grouped aggregate of a property/column over a key
        column (a tag, a property, or the current element via
        ``by='t'``). One coarse-bucket exchange at any cardinality;
        mean decomposes into sum+count partials."""
        from graphscope_ray.util import bucketed_agg
        name = name or f"{agg}_{value}"
        have = _names(self.ds)
        if not have:  # schemaless empty bag → typed empty aggregate
            return ray.data.from_pandas(pd.DataFrame({
                by: pd.Series([], dtype="int64"),
                name: pd.Series([], dtype="float64")}))
        need_attach = [c for c in (by, value)
                       if c not in have and c != "t"]
        ds = self.ds
        if need_attach:
            self._require("v", "group_agg(property)")
            ds = Traversal(self.graph, ds, kind="v",
                           path_len=self.path_len)._attach_vprops(
                need_attach, need_attach)
        if agg == "mean":
            parts = bucketed_agg(ds, [by], {
                "_s": (value, "sum"), "_n": (value, "count")})

            def div(df: pd.DataFrame) -> pd.DataFrame:
                out = df[[by]].copy(deep=False)
                out[name] = df["_s"].to_numpy() / df["_n"].to_numpy()
                return out

            return parts.map_batches(div, batch_format="pandas")
        return bucketed_agg(ds, [by], {name: (value, agg)})

    def fold_by_key(self, by: str, value: str, *,
                    limit: Optional[int] = None,
                    name: Optional[str] = None,
                    num_buckets: int = 32) -> ray.data.Dataset:
        """FOLD_BY_KEY (op 52): group by ``by`` and collect ``value``
        into a LIST column per key. The list is ascending-sorted
        (ORDER_LOCAL, op 39 — Gremlin's fold order is execution-order-
        dependent; sorting makes the fold deterministic and
        SQL-replayable via ``list(x ORDER BY x)``), and ``limit`` keeps
        only the first k sorted values (RANGE_LOCAL, op 38).

        Shape: one coarse-bucket exchange (a bucket owns every row of
        its keys, so in-bucket folds are global), then ONE vectorized
        kernel per bucket — lexsort + boundary offsets +
        ``pa.ListArray.from_arrays``; no per-key Python loop at any
        key cardinality."""
        name = name or f"fold_{value}"
        by_c, val_c, out_c, nb = by, value, name, num_buckets
        have = _names(self.ds)
        if not have:  # schemaless empty bag → typed empty fold
            return ray.data.from_arrow(pa.table({
                by_c: pa.array([], pa.int64()),
                out_c: pa.array([], pa.list_(pa.int64()))}))
        need_attach = [c for c in (by, value)
                       if c not in have and c != "t"]
        ds = self.ds
        if need_attach:
            self._require("v", "fold_by_key(property)")
            ds = self._attach_vprops(need_attach, need_attach)

        def bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df[[by_c, val_c]].copy(deep=False)
            h = pd.util.hash_array(df[by_c].to_numpy())
            df["_b"] = (h % np.uint64(nb)).astype(np.int64)
            return df

        def kernel(g: pd.DataFrame) -> pa.Table:
            k = g[by_c].to_numpy()
            v = g[val_c].to_numpy()
            order = np.lexsort((v, k))
            k, v = k[order], v[order]
            bounds = np.flatnonzero(k[1:] != k[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            if limit is not None:
                # rank of each row within its key group, then drop
                # ranks >= limit (RANGE_LOCAL on the sorted fold)
                cnt = np.diff(np.concatenate((starts, [len(k)])))
                rank = np.arange(len(k)) - np.repeat(starts, cnt)
                keep = rank < limit
                k, v = k[keep], v[keep]
                bounds = np.flatnonzero(k[1:] != k[:-1]) + 1
                starts = np.concatenate(([0], bounds))
            offsets = np.concatenate((starts, [len(k)])).astype(np.int32)
            lists = pa.ListArray.from_arrays(pa.array(offsets),
                                             pa.array(v))
            return pa.table({by_c: pa.array(k[starts]), out_c: lists})

        return (ds.map_batches(bucket, batch_format="pandas")
                .groupby("_b").map_groups(kernel, batch_format="pandas"))

    def identity(self) -> "Traversal":
        """IdentityStep: the bag unchanged (useful as a choose()/
        coalesce() branch)."""
        return self

    def is_(self, value) -> "Traversal":
        """Gremlin ``is(P)`` on a value bag: keep values satisfying
        the predicate (IsStep)."""
        self._require("value", "is_")
        pred = _as_pred(value)
        col = _names(self.ds)[0]

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[pred(df[col].to_numpy())]

        return Traversal(self.graph,
                         self.ds.map_batches(keep,
                                             batch_format="pandas"),
                         kind="value")

    def has_not(self, prop: str) -> "Traversal":
        """Gremlin ``hasNot('prop')``: keep elements whose property is
        null/absent (HasStep with containerless key)."""
        self._require("v", "has_not")
        tmp = "_hasnot_val"
        withp = self._attach_vprops([prop], [tmp])

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[df[tmp].isna()].drop(columns=[tmp])

        return Traversal(self.graph,
                         withp.map_batches(keep,
                                           batch_format="pandas"),
                         kind="v", path_len=self.path_len)

    def coalesce(self, *fns) -> "Traversal":
        """Gremlin ``coalesce(b1, b2, ...)`` (CoalesceStep): each
        traverser takes the FIRST branch that yields ≥1 result.
        Composition of :meth:`choose` — branch k runs on the
        traversers missed by branches 1..k-1; a traverser missed by
        every branch is dropped. Same constraints as choose
        (column-preserving branches, one element kind, no tracked
        path)."""
        if not fns:
            raise ValueError("coalesce() needs >=1 branch")
        if len(fns) == 1:
            # last branch: apply directly — traversers it misses yield
            # no rows, which IS the drop semantics
            return fns[0](self)
        rest = fns[1:]
        return self.choose(fns[0], fns[0],
                           lambda t: t.coalesce(*rest))

    def constant(self, value, *, name: str = "constant") -> "Traversal":
        """CONSTANT (reference ConstantTreeNode.java — MAP every
        traverser to a literal): the bag becomes a value bag holding
        ``value`` once per traverser (bag cardinality preserved)."""
        if not _names(self.ds):  # schemaless empty bag
            dtype = ("float64" if isinstance(value, float) else
                     "int64" if isinstance(value, int) else "object")
            return Traversal(self.graph, ray.data.from_pandas(
                pd.DataFrame({name: pd.Series([], dtype=dtype)})),
                kind="value")
        v, n = value, name

        def mk(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({n: np.full(len(df), v)})

        return Traversal(self.graph,
                         self.ds.map_batches(mk, batch_format="pandas"),
                         kind="value")

    def math(self, expr: str) -> "Traversal":
        """MATH (reference MathTreeNode.java — the TinkerPop ``math``
        step's exp4j expression over the incoming numeric value
        ``_``): vectorized arithmetic on the value bag. Supported:
        ``+ - * / % ^``, parentheses, unary minus, and the functions
        abs/ceil/floor/sqrt/exp/log/log10/sin/cos/tan/signum."""
        self._require("value", "math")
        col = _names(self.ds)[0]
        fn = _compile_math(expr)

        def apply(df: pd.DataFrame) -> pd.DataFrame:
            x = df[col].to_numpy().astype(np.float64)
            return pd.DataFrame({col: fn(x)})

        return Traversal(self.graph,
                         self.ds.map_batches(apply,
                                             batch_format="pandas"),
                         kind="value")

    def choose(self, pred_fn, true_fn, false_fn=None) -> "Traversal":
        """CHOOSE (reference BranchTreeNode.java /
        CaseWhenTreeNode.java): traversers whose predicate
        sub-traversal matches run the true branch; the rest run the
        false branch (identity when omitted); results union. Both
        branches must be column-preserving and end at the same
        element kind; tracked-path mode is unsupported (as
        :meth:`optional`)."""
        if self.path_len:
            raise TypeError(
                "choose() is not supported on tracked-path traversals")
        if not _names(self.ds):
            return self
        cols, wk, keyed = self._stamp_keys()
        base = Traversal(self.graph, keyed, kind=self.kind, path_len=0)
        hits = bucketed_distinct(
            pred_fn(base).ds.select_columns([wk]), [wk])

        def flag(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_hit", pa.array(np.ones(len(t), dtype=np.int64)))

        hits = hits.map_batches(flag,
                                batch_format="pyarrow").materialize()
        flagged = attach_values(keyed, hits, on=wk,
                                table_key=wk, value_names=["_hit"],
                                defaults={"_hit": 0}).materialize()

        def side(want: int):
            def keep(df: pd.DataFrame) -> pd.DataFrame:
                return df[df["_hit"].to_numpy() == want].drop(
                    columns=[wk, "_hit"])
            return Traversal(
                self.graph,
                flagged.map_batches(keep, batch_format="pandas"),
                kind=self.kind, path_len=0)

        t_out = true_fn(side(1))
        f_out = side(0) if false_fn is None else false_fn(side(0))
        if t_out.kind != f_out.kind:
            raise TypeError(
                f"choose() branches end at different kinds: "
                f"{t_out.kind!r} vs {f_out.kind!r}")

        def trim(cs):
            def f(df: pd.DataFrame) -> pd.DataFrame:
                if not len(df):
                    # an all-empty branch yields SCHEMALESS pandas
                    # blocks; reindex restores the shared columns so
                    # the union schema holds
                    return df.reindex(columns=cs)
                return df[cs]
            return f

        # an entirely-empty side reports no schema — its column list
        # must not erase the live side's columns
        t_names = _names(t_out.ds)
        f_names = _names(f_out.ds)
        if not t_names:
            shared = f_names
        elif not f_names:
            shared = t_names
        else:
            shared = [c for c in t_names if c in f_names]
        a = t_out.ds.map_batches(trim(shared), batch_format="pandas")
        b = f_out.ds.map_batches(trim(shared), batch_format="pandas")
        return Traversal(self.graph, a.union(b), kind=t_out.kind,
                         path_len=0)

    def sum_(self, prop: Optional[str] = None) -> float:
        """SUM (op 49) over a value bag (or ``values(prop)`` first)."""
        t = self if prop is None else self.values(prop)
        t._require("value", "sum_")
        return t.ds.sum(_names(t.ds)[0])

    def max_(self, prop: Optional[str] = None):
        """MAX (op 54)."""
        t = self if prop is None else self.values(prop)
        t._require("value", "max_")
        return t.ds.max(_names(t.ds)[0])

    def min_(self, prop: Optional[str] = None):
        """MIN (op 55)."""
        t = self if prop is None else self.values(prop)
        t._require("value", "min_")
        return t.ds.min(_names(t.ds)[0])

    def mean_(self, prop: Optional[str] = None) -> float:
        """FOLDMAP-style mean over a value bag."""
        t = self if prop is None else self.values(prop)
        t._require("value", "mean_")
        return t.ds.mean(_names(t.ds)[0])

    def value_map(self, *props: str) -> ray.data.Dataset:
        """PROP_MAP_VALUE (op 33): the current vertices with the named
        properties as columns (``t`` + one column per property)."""
        self._require("v", "value_map")
        withp = self._attach_vprops(list(props), list(props))
        return withp.select_columns(["t", *props])

    def subgraph(self) -> "PropertyGraph":
        """SUBGRAPH (op 80): materialize the edge bag as a new
        PropertyGraph — distinct traversed edges (with their labels
        and properties) plus the incident vertex rows. Both sides
        stay Datasets; the vertex cut is one flag attach."""
        self._require("e", "subgraph")
        names = _names(self.ds)
        if not names:  # schemaless empty bag → empty graph
            return PropertyGraph(
                self.graph.vertices.limit(0),
                self.graph.edges.limit(0),
                broadcast_limit=self.graph.broadcast_limit)
        ecols = [c for c in names
                 if c.startswith("e_") and c != "e_from"]
        eds = bucketed_distinct(self.ds.select_columns(ecols), ecols)
        from graphscope_ray.util import rename as _rn
        edges = _rn(eds, {c: c[2:] for c in ecols})
        ends = bucketed_distinct(
            edges.select_columns(["src"]).union(
                _rn(edges.select_columns(["dst"]), {"dst": "src"})),
            ["src"])

        def flag(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_hit", pa.array(np.ones(len(t), dtype=np.int64)))

        ends = ends.map_batches(flag, batch_format="pyarrow")
        verts = attach_values(self.graph.vertices, ends, on="id",
                              table_key="src", value_names=["_hit"],
                              defaults={"_hit": 0})

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["_hit"].to_numpy() == 1].drop(
                columns=["_hit"])

        verts = verts.map_batches(keep, batch_format="pandas")
        return PropertyGraph(verts, edges,
                             broadcast_limit=self.graph.broadcast_limit)

    # -- terminals --------------------------------------------------------

    def count(self) -> int:
        """COUNT/FOLD (op 37): bag size."""
        return self.ds.count()

    def count_limit(self, n: int) -> int:
        """COUNT_LIMIT (op 69): ``min(bag size, n)`` — the early-exit
        count. The ``limit`` pushes down, so Ray's streaming executor
        stops feeding upstream operators once n rows exist (a
        has-at-least-n probe never scans a 100 TB bag)."""
        return self.ds.limit(n).count()

    def estimate_count(self, *, p: int = 12, seed: int = 1) -> float:
        """ESTIMATE_COUNT (op 94): approximate DISTINCT-element count
        via the house HyperLogLog fold (``data/sketch.hll_fold``) over
        the deterministic per-element hash — 2^p-byte accumulators
        merged through ONE native ``Dataset.aggregate``, zero shuffle
        at any bag size (the exact alternative, ``dedup().count()``,
        is a bucket exchange). Std err ≈ 1.04/√2^p."""
        from ray.data.aggregate import AggregateFn

        from graphscope_ray.data.sketch import hll_estimate, hll_fold
        m = 1 << p
        hash_fn = self._elem_hash(seed)

        def accumulate_block(acc: np.ndarray, block) -> np.ndarray:
            df = (block.to_pandas() if isinstance(block, pa.Table)
                  else block)
            return hll_fold(hash_fn(df), p, acc.copy())

        agg = AggregateFn(
            init=lambda k: np.zeros(m, dtype=np.uint8),
            merge=lambda a, b: np.maximum(a, b),
            accumulate_block=accumulate_block,
            name="hll_regs",
        )
        out = self.ds.aggregate(agg)
        return hll_estimate(np.asarray(out["hll_regs"], dtype=np.uint8))

    def dataset(self) -> ray.data.Dataset:
        return self.ds

    def to_pandas(self) -> pd.DataFrame:
        return self.ds.to_pandas()

    def id_values(self) -> pd.DataFrame:
        """The current element ids as a one-column frame (driver/test
        convenience)."""
        self._require("v", "id_values")
        if not _names(self.ds):  # schemaless empty bag
            return pd.DataFrame({"t": pd.Series([], dtype="int64")})
        df = self.ds.select_columns(["t"]).to_pandas()
        if "t" not in df.columns:  # empty to_pandas drops columns
            return pd.DataFrame({"t": pd.Series([], dtype="int64")})
        return df
