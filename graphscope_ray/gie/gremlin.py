"""Gremlin-string frontend over GIE-lite.

The reference's user surface is Gremlin text compiled by the Java
frontend (`interactive_engine/src/frontend`, ops enumerated in
`src/common/proto/query_flow.proto:65-116`). This module closes that
last user-visible gap for the covered subset: a recursive-descent
parser turns a traversal string into the step list, and a compiler
applies it to :class:`~graphscope_ray.gie.traversal.PropertyGraph` /
``Traversal`` — every step executes on the same Ray-Data kernels as
the builder DSL, so the string form inherits its scale shape
(broadcast-CSR hops, coarse-bucket dedup/group_count, top-n-combiner
order+limit).

Covered Gremlin steps::

    g.V('label'...) g.E('label')
    out/in/both[E]('label'?) inV outV bothV otherV
    has('prop', v) has('prop', gt(v)|gte|lt|lte|eq|neq|within(..)|
                       between(a,b))
    hasLabel('l'...) hasId(id...) dedup() simplePath()
    where(__.out()...) not(__.out()...)          # (anti-)semi-join
    where('a', '==', 'b')                        # tag compare (ext. form)
    union(__.out('x'), __.out('y'))
    as('t') select('t') select('a','b'...)       # tag / jump / project
    values('prop') valueMap('a','b')
    order().by('prop'[, desc|asc]) limit(n) range(lo, hi)
    repeat(__.out()).times(k) repeat(__.out()).until(__.hasLabel('x'))
    and(__.out('x'), __.has(...)) or(__.out('x'), __.out('y'))
    and(gt(0), lt(10)) / or(eq(1), eq(5))     # predicate composition
    optional(__.out('x'))                     # pass-through on miss
    groupCount([  ]) groupCount().by('col')
    group().by('key').by(__.values('x').sum()|max|min|mean|fold())
    group().by('key').by(__.count())          # == groupCount().by
    choose(__.has(...), __.out(), __.in())    # per-traverser branch
    project('a','b').by(__.id()|__.values('p')|__.out('l').count())
    coalesce(__.out('a'), __.out('b'))        # first non-empty branch
    identity() hasNot('prop') values('x').is(gt(5))
    constant(v) values('x').math('_ * 2 + 1') # map steps
    count() sum() max() min() mean() path() sample(n) coin(p)

Documented extensions (1:1 with the builder DSL, used where standard
Gremlin has no concise text form): ``degreeLocal(dir, label, name)``,
``filterCol(name, pred)``, ``groupAgg(by, value, agg, name)``,
``foldByKey(by, value, limit, name)``, ``unfold(col)``,
``program('wcc'|...)``, ``estimateCount()``.

Unsupported steps raise :class:`GremlinParseError` naming the op.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from graphscope_ray.gie.traversal import P, PropertyGraph, Traversal, unfold


class GremlinParseError(ValueError):
    pass


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<num>-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+|-?\d+)
    | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
    | (?P<punct>__\.|[().,])
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    )""", re.VERBOSE)


def _tokenize(s: str) -> List[Tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None:
            if s[pos:].strip() == "":
                break
            raise GremlinParseError(
                f"cannot tokenize at ...{s[pos:pos + 20]!r}")
        pos = m.end()
        for kind in ("num", "str", "name", "punct"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


# ---------------------------------------------------------------------------
# parser → step list;  a step is (name, [args]);  an arg is a python
# literal, a P predicate, an _Order sentinel, or a Chain (anonymous
# sub-traversal for repeat/until/where/not)
# ---------------------------------------------------------------------------

class Chain:
    def __init__(self, steps):
        self.steps = steps

    def __repr__(self):
        return f"Chain({self.steps!r})"


class _Order:
    def __init__(self, desc: bool):
        self.desc = desc


_PREDICATES = {"eq", "neq", "gt", "gte", "lt", "lte", "within",
               "between", "inside", "without", "and", "or"}
_KEYWORDS = {"true": True, "false": False, "True": True, "False": False,
             "None": None, "none": None}


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, value):
        kind, v = self.next()
        if v != value:
            raise GremlinParseError(f"expected {value!r}, got {v!r}")

    def parse_query(self) -> List[Tuple[str, list]]:
        kind, v = self.next()
        if v != "g":
            raise GremlinParseError(f"query must start with 'g', got {v!r}")
        steps = []
        while self.peek()[1] == ".":
            self.next()
            steps.append(self.parse_step())
        if self.i != len(self.toks):
            raise GremlinParseError(
                f"trailing tokens from {self.toks[self.i]!r}")
        return steps

    def parse_step(self):
        kind, name = self.next()
        if kind != "name":
            raise GremlinParseError(f"expected step name, got {name!r}")
        self.expect("(")
        args = []
        if self.peek()[1] != ")":
            args.append(self.parse_arg())
            while self.peek()[1] == ",":
                self.next()
                args.append(self.parse_arg())
        self.expect(")")
        return (name, args)

    def parse_chain(self) -> Chain:
        steps = [self.parse_step()]
        while self.peek()[1] == ".":
            self.next()
            steps.append(self.parse_step())
        return Chain(steps)

    def parse_arg(self):
        kind, v = self.peek()
        if kind == "num":
            self.next()
            return float(v) if ("." in v or "e" in v or "E" in v) else int(v)
        if kind == "str":
            self.next()
            body = v[1:-1]
            return re.sub(r"\\(.)", r"\1", body)
        if v == "__.":
            self.next()
            return self.parse_chain()
        if kind == "name":
            nxt = self.toks[self.i + 1][1] if self.i + 1 < len(self.toks) \
                else None
            if v in ("desc", "decr"):
                self.next()
                return _Order(True)
            if v in ("asc", "incr"):
                self.next()
                return _Order(False)
            if v in _KEYWORDS and nxt != "(":
                self.next()
                return _KEYWORDS[v]
            if nxt == "(":
                if v in _PREDICATES:
                    name, args = self.parse_step()
                    return self._pred(name, args)
                # bare anonymous traversal: repeat(out('co'))
                return self.parse_chain()
        raise GremlinParseError(f"cannot parse argument at {v!r}")

    @staticmethod
    def _pred(name, args):
        if name == "inside":
            # Gremlin P.inside is EXCLUSIVE on both ends (a < x < b);
            # P.between is inclusive-exclusive, so compose gt & lt
            # (must be a real P instance — Traversal's _as_pred wraps
            # any other object in P.eq)
            lo, hi = args
            g, l = P.gt(lo), P.lt(hi)
            return P(lambda arr: g(arr) & l(arr), f"inside({lo},{hi})")
        if name == "without":
            raise GremlinParseError("unsupported predicate: without")
        if name in ("and", "or"):
            # predicate composition (AndTreeNode.java/OrTreeNode.java):
            # and(gt(0), lt(10)) inside has(); with anonymous-traversal
            # args the same text is a filter step — re-wrap as a Chain
            # so where(and(__.out(), __.in())) keeps working
            if args and all(isinstance(a, Chain) for a in args):
                return Chain([(name, args)])
            if args and all(isinstance(a, P) for a in args):
                return (P.and_ if name == "and" else P.or_)(*args)
            raise GremlinParseError(
                f"{name}() takes all-predicate or all-traversal "
                f"arguments")
        return getattr(P, name)(*args)


def parse(query: str) -> List[Tuple[str, list]]:
    return _Parser(_tokenize(query)).parse_query()


# ---------------------------------------------------------------------------
# compiler: step list → Traversal/Dataset/scalar on a PropertyGraph
# ---------------------------------------------------------------------------

_HOPS = {"out": "out", "in": "in_", "both": "both", "outE": "outE",
         "inE": "inE", "bothE": "bothE", "inV": "inV", "outV": "outV",
         "bothV": "bothV", "otherV": "otherV"}


def _as_chain_fn(chain: Chain):
    if not isinstance(chain, Chain):
        raise GremlinParseError(
            f"expected an anonymous traversal (__....), got {chain!r}")

    def fn(t: Traversal) -> Traversal:
        return _apply_steps(t, chain.steps)

    return fn


def _needs_path(steps) -> bool:
    """True if any step (including inside nested Chain arguments, e.g.
    repeat(__.out().simplePath())) requires per-hop path history."""
    for name, args in steps:
        if name in ("path", "simplePath"):
            return True
        for a in args:
            if isinstance(a, Chain) and _needs_path(a.steps):
                return True
    return False


def _project_spec(args):
    """One project().by(...) modulator → Traversal.project spec:
    'prop' | __.values('p') | __.id() | __.out/in/both('l'?).count()."""
    if not args:
        return "id"
    a = args[0]
    if isinstance(a, str):
        return a
    if isinstance(a, Chain):
        steps = a.steps
        if len(steps) == 1 and steps[0][0] == "values":
            return steps[0][1][0]
        if len(steps) == 1 and steps[0][0] == "id":
            return "id"
        if (len(steps) == 2 and steps[0][0] in ("out", "in", "both")
                and steps[1][0] == "count"):
            lab = steps[0][1][0] if steps[0][1] else None
            return ("count", steps[0][0], lab)
    raise GremlinParseError(
        f"unsupported project().by() form: {a!r} (use a property "
        f"name, __.values('p'), __.id(), or __.out('l').count())")


def _group_key(args):
    """Key selector of group().by(...): a property/tag name, or an
    anonymous __.values('p') chain."""
    if not args:
        return None
    a = args[0]
    if isinstance(a, str):
        return a
    if isinstance(a, Chain) and len(a.steps) == 1 \
            and a.steps[0][0] == "values":
        return a.steps[0][1][0]
    raise GremlinParseError(
        f"group().by(key) takes a property name or __.values('p'), "
        f"got {a!r}")


def _group_value(args):
    """Value aggregate of the second group().by(...): returns
    (value_col, agg, limit)."""
    if not args:
        return None, "fold", None
    a = args[0]
    if isinstance(a, str):  # by('prop') folds that property
        return a, "fold", None
    if not isinstance(a, Chain):
        raise GremlinParseError(
            f"group().by(value) takes __.values('x').<agg>() or a "
            f"property name, got {a!r}")
    steps = list(a.steps)
    value = None
    if steps and steps[0][0] == "values":
        value = steps[0][1][0]
        steps = steps[1:]
    if not steps:  # __.values('x') alone folds the property
        return value, "fold", None
    name, sargs = steps[0]
    limit = None
    if name in ("sum", "max", "min", "mean", "count", "fold"):
        if len(steps) > 1 and steps[1][0] == "limit":
            limit = steps[1][1][0]
            steps = steps[1:]
        if len(steps) > 1:
            raise GremlinParseError(
                f"unsupported step after group value aggregate: "
                f"{steps[1][0]}")
        return value, name, limit
    raise GremlinParseError(
        f"unsupported group value aggregate: {name}")


def _apply_steps(state, steps):
    i = 0
    while i < len(steps):
        name, args = steps[i]

        # --- source steps (PropertyGraph state) -------------------------
        if isinstance(state, PropertyGraph):
            if name == "V":
                # path()/simplePath() downstream need per-hop history,
                # which only V(track_path=True) records; the step may
                # be nested inside repeat(__...)/where(__...) chains,
                # so recurse through Chain args (ADVICE r04)
                track = _needs_path(steps[i + 1:])
                state = state.V(*args, track_path=track)
            elif name == "E":
                state = state.E(*args)
            elif name == "program":
                state = state.program(*args)
            else:
                raise GremlinParseError(
                    f"unsupported source step: {name} (expected V/E/"
                    "program)")
            i += 1
            continue

        # --- post-terminal steps (Dataset state) ------------------------
        if not isinstance(state, Traversal):
            if name == "unfold":
                state = unfold(state, *args)
                i += 1
                continue
            raise GremlinParseError(
                f"unsupported step after a terminal step: {name}")

        t: Traversal = state
        if name in _HOPS:
            state = getattr(t, _HOPS[name])(*args)
        elif name == "has":
            state = t.has(*args)
        elif name == "hasLabel":
            state = t.has_label(*args)
        elif name == "hasId":
            state = t.has_id(*args)
        elif name == "dedup":
            state = t.dedup()
        elif name == "simplePath":
            state = t.simple_path()
        elif name == "where":
            if len(args) == 3 and all(isinstance(a, str) for a in args):
                # documented extension: where('a', '==', 'b') compares
                # two tagged positions (the builder's tag-compare WHERE,
                # op 24 — standard Gremlin's where('a', eq('b')) form
                # cannot survive parsing because the predicate hides
                # the tag name)
                state = t.where(*args)
            else:
                state = t.where_exists(_as_chain_fn(args[0]))
        elif name == "not":
            state = t.where_not_exists(_as_chain_fn(args[0]))
        elif name == "and":
            state = t.and_where(*[_as_chain_fn(c) for c in args])
        elif name == "or":
            state = t.or_where(*[_as_chain_fn(c) for c in args])
        elif name == "optional":
            state = t.optional(_as_chain_fn(args[0]))
        elif name == "choose":
            if len(args) < 2 or len(args) > 3:
                raise GremlinParseError(
                    "choose() takes (predicate, trueBranch[, "
                    "falseBranch]) anonymous traversals")
            fns = [_as_chain_fn(a) for a in args]
            state = t.choose(*fns)
        elif name == "coalesce":
            state = t.coalesce(*[_as_chain_fn(a) for a in args])
        elif name == "identity":
            state = t.identity()
        elif name == "is":
            state = t.is_(args[0])
        elif name == "hasNot":
            state = t.has_not(args[0])
        elif name == "constant":
            state = t.constant(args[0])
        elif name == "math":
            if not isinstance(args[0], str):
                raise GremlinParseError("math() takes an expression "
                                        "string")
            state = t.math(args[0])
        elif name == "union":
            branches = [_apply_steps(t, c.steps) if isinstance(c, Chain)
                        else None for c in args]
            if any(b is None for b in branches) or not branches:
                raise GremlinParseError(
                    "union() takes anonymous traversals (__....)")
            state = branches[0]
            for b in branches[1:]:
                state = state.union(b)
        elif name == "as":
            state = t.as_(*args)
        elif name == "select":
            if len(args) == 1:
                state = t.select(args[0])
            else:
                state = t.select_map(*args)
        elif name == "values":
            state = t.values(*args)
        elif name == "valueMap":
            state = t.value_map(*args)
        elif name == "order":
            # fuse order().by(key[, desc]) [.limit(n)] into the
            # top-n-combiner order_by
            key, desc = None, False
            j = i + 1
            if j < len(steps) and steps[j][0] == "by":
                for a in steps[j][1]:
                    if isinstance(a, _Order):
                        desc = a.desc
                    else:
                        key = a
                j += 1
            lim = None
            if j < len(steps) and steps[j][0] == "limit":
                lim = steps[j][1][0]
                j += 1
            state = t.order_by(key, ascending=not desc, limit=lim)
            i = j
            continue
        elif name == "limit":
            state = t.limit(*args)
        elif name == "range":
            state = t.range_(*args)
        elif name == "repeat":
            fn = _as_chain_fn(args[0])
            j = i + 1
            if j < len(steps) and steps[j][0] == "times":
                state = t.repeat(fn, steps[j][1][0])
            elif j < len(steps) and steps[j][0] == "until":
                state = t.repeat_until(fn, _as_chain_fn(steps[j][1][0]))
            else:
                raise GremlinParseError(
                    "repeat() needs a following times(k) or until(...)")
            i = j + 1
            continue
        elif name == "project":
            if not args or not all(isinstance(a, str) for a in args):
                raise GremlinParseError(
                    "project() takes output-name strings")
            mods = []
            j = i + 1
            while j < len(steps) and steps[j][0] == "by":
                mods.append(steps[j][1])
                j += 1
            if len(mods) != len(args):
                raise GremlinParseError(
                    f"project() needs one by() per name "
                    f"({len(args)} names, {len(mods)} by)")
            state = t.project({n: _project_spec(m)
                               for n, m in zip(args, mods)})
            i = j
            continue
        elif name == "groupCount":
            by = None
            j = i + 1
            if j < len(steps) and steps[j][0] == "by":
                by = steps[j][1][0]
                j += 1
            state = t.group_count(by)
            i = j
            continue
        elif name == "group":
            # general group().by(key).by(value-agg)
            # (GroupTreeNode.java): first by = key selector (string, or
            # __.values('p')); second by = value aggregate
            # (__.values('x').sum()/max/min/mean/fold, __.count(),
            # __.fold()). Defaults: key = current element, value =
            # fold of element ids.
            mods = []
            j = i + 1
            while j < len(steps) and steps[j][0] == "by":
                mods.append(steps[j][1])
                j += 1
            key = _group_key(mods[0]) if mods else None
            value, agg, lim = (_group_value(mods[1]) if len(mods) > 1
                               else (None, "fold", None))
            state = t.group_by(key, value, agg, limit=lim)
            i = j
            continue
        elif name == "count":
            state = t.count()
        elif name == "sum":
            state = t.sum_(*args)
        elif name == "max":
            state = t.max_(*args)
        elif name == "min":
            state = t.min_(*args)
        elif name == "mean":
            state = t.mean_(*args)
        elif name == "path":
            state = t.path()
        elif name == "sample":
            state = t.sample(*args)
        elif name == "coin":
            state = t.coin(*args)
        # --- documented extensions (builder-DSL text forms) -------------
        elif name == "degreeLocal":
            state = t.degree_local(*args[:2], name=args[2]
                                   if len(args) > 2 else "degree")
        elif name == "filterCol":
            state = t.filter_col(*args)
        elif name == "groupAgg":
            state = t.group_agg(*args[:3], name=args[3]
                                if len(args) > 3 else None)
        elif name == "foldByKey":
            state = t.fold_by_key(
                args[0], args[1],
                limit=args[2] if len(args) > 2 else None,
                name=args[3] if len(args) > 3 else None)
        elif name == "estimateCount":
            state = t.estimate_count()
        else:
            raise GremlinParseError(f"unsupported step: {name}")
        i += 1
    return state


def run(graph: PropertyGraph, query: str):
    """Parse + execute ``query`` against ``graph``. Returns whatever
    the final step yields: a :class:`Traversal` (call ``.dataset()`` /
    ``.to_pandas()``), a ``ray.data.Dataset`` (terminal aggregates),
    or a scalar (count/sum/...)."""
    return _apply_steps(graph, parse(query))
