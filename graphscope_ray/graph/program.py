"""User-defined vertex programs — the engine's extension surface.

The reference exposes Python Pregel/PIE UDFs (``@pregel(vd_type,
md_type)`` with per-vertex ``Init``/``Compute`` —
``/root/reference/python/graphscope/analytical/udf/decorators.py:116``,
examples ``python/tests/test_udf_app.py:102-128``) compiled to Cython
server-side. Here the same capability is exposed *vectorized*: a
program works on whole per-partition numpy arrays instead of single
vertices, so user code runs at engine speed with no codegen step.

Contract (all methods take a :class:`ProgramContext`):

- ``init(ctx) -> dict[str, np.ndarray]`` — per-partition state arrays
  (each of length ``ctx.nlocal``);
- ``message(ctx, state) -> np.ndarray | None`` — per-OWNED-VERTEX
  values to send along out-edges this round (the engine gathers them
  per edge, pre-combines per destination with ``combine`` ∈
  {"sum", "min"}, and shuffles); ``None`` sends nothing;
- ``apply(ctx, state, incoming, agg) -> (changed, local_agg)`` —
  update state from the combined incoming vector (``sum``: dense
  length-``nlocal`` array; ``min``: dense array with +inf for
  no-message); ``agg`` is the previous round's global aggregate
  (driver-side sum of all ``local_agg`` values — the analogue of the
  reference's Pregel aggregators,
  ``analytical_engine/core/app/pregel/aggregators/aggregator.h``);
- ``result_columns`` — names of state arrays to emit as the result.

Programs must be picklable (plain classes, module-level).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ProgramContext:
    part_id: int
    num_parts: int
    num_vertices: int
    nlocal: int
    local_vids: np.ndarray
    out_deg: np.ndarray
    round: int = 0


@dataclass
class LocalEdges:
    """The partition's edge fragment, handed to ``peval`` — the PIE
    model's ``frag`` argument (``@pie`` UDFs receive (frag, context);
    python/graphscope/analytical/udf/decorators.py:35-70). ``src`` is
    owned by the partition (src % P == part_id) except for re-spread
    hub edges; ``dst`` is arbitrary. ``weight`` is None on unweighted
    stores. Arrays are the actor's resident layout — treat as
    read-only."""
    src: np.ndarray
    dst: np.ndarray
    weight: "np.ndarray | None"


#: global-aggregator ops — the reference's Pregel aggregator zoo
#: (core/app/pregel/aggregators/{numeric,bool}_aggregator.h, exercised
#: by python/tests/test_udf_app.py:374-420): min/max/sum/product over
#: numerics, and/or over bools, overwrite (last-writer, highest
#: partition id wins for determinism).
AGG_OPS = {
    "sum": lambda vals: float(np.sum(vals)),
    "prod": lambda vals: float(np.prod(vals)),
    "min": lambda vals: float(np.min(vals)),
    "max": lambda vals: float(np.max(vals)),
    "and": lambda vals: bool(np.all(vals)),
    "or": lambda vals: bool(np.any(vals)),
    "overwrite": lambda vals: vals[-1],
    # TextAppendAggregator (text_aggregator.h:29-40): empty-delimiter
    # concat in partition order (deterministic: vals arrive p=0..P-1)
    "text_append": lambda vals: "".join(str(v) for v in vals),
}


class VertexProgram:
    combine: str = "sum"          # "sum" | "min"
    #: when True, the engine adds the per-edge weight to each gathered
    #: message before combining (msg = value(src) + w(edge)) — the
    #: shape of the reference's Pregel SSSP
    #: (apps/pregel/sssp_pregel.h:77-82: ``v.send(e.vertex(),
    #: dist + e.get_int(0))``). Unweighted stores use unit weight
    #: (min-plus BFS, as partition.py's relaxation kernel documents).
    use_weight: bool = False
    result_columns = ("value",)
    #: optional named global aggregators: {name: op} with op in
    #: AGG_OPS. When non-empty, ``apply`` must return
    #: ``(changed, {name: local_value})`` and receives the combined
    #: dict (previous round) as ``agg``; when empty, the r01 contract
    #: holds: ``apply`` returns ``(changed, float)`` and ``agg`` is the
    #: summed float.
    aggregators: dict = {}

    def init(self, ctx: ProgramContext) -> dict:
        raise NotImplementedError

    def message(self, ctx: ProgramContext, state: dict):
        raise NotImplementedError

    def apply(self, ctx: ProgramContext, state: dict, incoming, agg):
        raise NotImplementedError

    def peval(self, ctx: ProgramContext, state: dict,
              edges: LocalEdges) -> None:
        """Optional PIE PEval hook (`@pie` decorator analogue,
        python/graphscope/analytical/udf/decorators.py:35-70: Init /
        PEval / IncEval over (frag, context)): runs once per partition
        after ``init`` and before the first superstep, with the
        partition's resident edge fragment; every superstep after it
        is the IncEval. Default: no-op (pure Pregel shape)."""


class PageRankProgram(VertexProgram):
    """Example: textbook PageRank without dangling redistribution —
    the reference's *Pregel* variant
    (``analytical_engine/apps/pregel/pagerank_pregel.h:43-94``:
    value = δ·Σmsgs + (1−δ)/N, messages value/outdeg, sum combiner)."""

    combine = "sum"
    result_columns = ("rank",)

    def __init__(self, delta: float = 0.85):
        self.delta = delta

    def init(self, ctx):
        return {"rank": np.full(ctx.nlocal, 1.0 / ctx.num_vertices)}

    def message(self, ctx, state):
        out = np.zeros(ctx.nlocal)
        nz = ctx.out_deg > 0
        out[nz] = state["rank"][nz] / ctx.out_deg[nz]
        return out

    def apply(self, ctx, state, incoming, agg):
        new = self.delta * incoming + (1 - self.delta) / ctx.num_vertices
        delta_max = float(np.abs(new - state["rank"]).max(initial=0.0))
        state["rank"] = new
        return delta_max, 0.0


class NXPageRankProgram(VertexProgram):
    """networkx-exact PageRank (uniform personalization): dangling
    vertices KEEP their incoming mass and their mass is redistributed
    uniformly each round via a global ``sum`` aggregator —
    ``x' = δ·(xP + D(x)/N·1) + (1−δ)/N·1`` with ``D(x) = Σ_dangling x``.

    This is deliberately NOT the reference benchmark PageRank
    (``benchmarks/apps/pagerank/pagerank.h:160-170`` stores only
    ``base`` on dangling vertices, ignoring their in-mass), which is
    why the reference's nx bridge leaves ``pagerank`` unimplemented
    (``nx/algorithms/builtin.py:48-50``). The nx facade
    (graphscope_ray.nx) uses this program to close that gap.

    Round 1 only publishes the initial dangling mass (state unchanged);
    updates run from round 2 — callers add one to ``max_round``."""

    combine = "sum"
    result_columns = ("rank",)
    aggregators = {"dangling": "sum"}

    def __init__(self, delta: float = 0.85):
        self.delta = delta

    def init(self, ctx):
        return {"rank": np.full(ctx.nlocal, 1.0 / ctx.num_vertices)}

    def message(self, ctx, state):
        if ctx.round == 1:
            return None  # publish-only round
        out = np.zeros(ctx.nlocal)
        nz = ctx.out_deg > 0
        out[nz] = state["rank"][nz] / ctx.out_deg[nz]
        return out

    def apply(self, ctx, state, incoming, agg):
        dang = ctx.out_deg == 0
        if ctx.round == 1:
            return 1.0, {"dangling": float(state["rank"][dang].sum())}
        d_mass = agg["dangling"] if agg else 0.0
        new = (self.delta * (incoming + d_mass / ctx.num_vertices)
               + (1 - self.delta) / ctx.num_vertices)
        delta_max = float(np.abs(new - state["rank"]).max(initial=0.0))
        state["rank"] = new
        return delta_max, {"dangling": float(new[dang].sum())}


class MISProgram(VertexProgram):
    """Luby-style maximal independent set over a SYMMETRIZED store,
    written as a user-level vectorized VertexProgram (the extension
    surface's 'novel algorithm' demo — not a reference app; Luby
    1986). Deterministic and SQL-replayable:

    ``priority(v) = fmix64(vid ^ seed) >> 11`` — 53 bits, exactly
    float64-representable, the shared hash family oracle_sql replays.

    Alternating supersteps (the min-combiner carries −priority, so
    the combined min is −max; +inf = silence):

    - odd (join): undecided v with priority > max priority among its
      undecided neighbors joins the MIS (no undecided neighbor ⇒
      join — the identity +inf combines to −inf);
    - even (remove): undecided neighbors of in-MIS vertices leave.

    ``status``: 0 undecided → 1 in-MIS / 2 removed. Assumes priorities
    are pairwise distinct among neighbors (a 53-bit hash collision on
    an edge could strand both endpoints undecided until ``max_round``
    — probability ~E/2^53; the SQL twin replays identical priorities,
    so engine/oracle parity holds regardless)."""

    combine = "min"
    result_columns = ("status",)

    def __init__(self, seed: int = 7):
        self.seed = seed

    def init(self, ctx):
        from graphscope_ray.data.hashing import fmix64
        pri = (fmix64(ctx.local_vids.astype(np.int64).view(np.uint64)
                      ^ np.uint64(self.seed))
               >> np.uint64(11)).astype(np.float64)
        return {"status": np.zeros(ctx.nlocal), "pri": pri}

    def message(self, ctx, state):
        out = np.full(ctx.nlocal, np.inf)
        if ctx.round % 2 == 1:
            und = state["status"] == 0
            out[und] = -state["pri"][und]
        else:
            out[state["status"] == 1] = -np.inf
        return out

    def apply(self, ctx, state, incoming, agg):
        und = state["status"] == 0
        if ctx.round % 2 == 1:
            nbr_max = -incoming  # −inf where no undecided neighbor
            join = und & (state["pri"] > nbr_max)
            state["status"][join] = 1.0
            return float(join.sum()), 0.0
        hit = und & np.isneginf(incoming)
        state["status"][hit] = 2.0
        # keep looping while anything is still undecided
        return float(und.sum()), 0.0


class GlobalStatsProgram(VertexProgram):
    """Example exercising the aggregator zoo: round 1 publishes each
    partition's local-vid sum plus two flags; round 2 writes the
    combined global min/max/sum/and/or back into every vertex."""

    combine = "sum"
    result_columns = ("gmin", "gmax", "gsum", "gand", "gor")
    aggregators = {"mn": "min", "mx": "max", "sm": "sum",
                   "al": "and", "an": "or"}

    def init(self, ctx):
        z = np.zeros(ctx.nlocal)
        return {"gmin": z.copy(), "gmax": z.copy(), "gsum": z.copy(),
                "gand": z.copy(), "gor": z.copy()}

    def message(self, ctx, state):
        return None

    def apply(self, ctx, state, incoming, agg):
        if ctx.round == 2 and agg:
            state["gmin"][:] = agg["mn"]
            state["gmax"][:] = agg["mx"]
            state["gsum"][:] = agg["sm"]
            state["gand"][:] = float(agg["al"])
            state["gor"][:] = float(agg["an"])
        local = float(ctx.local_vids.sum())
        return 1, {"mn": local, "mx": local, "sm": local,
                   "al": ctx.part_id % 2 == 0, "an": ctx.part_id == 0}


class SSSPPregelProgram(VertexProgram):
    """The reference's SECOND SSSP — the Pregel variant
    (``apps/pregel/sssp_pregel.h:46-85``: init MAX, source seeds 0 at
    superstep 0, min over messages, send ``dist + edge_weight`` along
    out-edges). Vectorized: every vertex publishes its distance each
    round (min-combine makes re-sends of already-incorporated values
    idempotent, so the per-round state matches the reference's
    updated-only sends exactly); the engine adds the edge weight
    during the scatter (``use_weight``). Run with
    ``stop_when_zero=True`` — converged distances are the weighted
    shortest paths (Bellman-Ford fixpoint)."""

    combine = "min"
    use_weight = True
    result_columns = ("dist",)

    def __init__(self, source_vid: int):
        self.source_vid = int(source_vid)

    def init(self, ctx):
        d = np.full(ctx.nlocal, np.inf)
        d[ctx.local_vids == self.source_vid] = 0.0
        return {"dist": d}

    def message(self, ctx, state):
        return state["dist"]

    def apply(self, ctx, state, incoming, agg):
        new = np.minimum(state["dist"], incoming)
        changed = int((new < state["dist"]).sum())
        state["dist"] = new
        return changed, 0.0


class MinLabelProgram(VertexProgram):
    """Example: min-label propagation (WCC when run on a symmetrized
    store) via the user-program surface."""

    combine = "min"
    result_columns = ("label",)

    def init(self, ctx):
        return {"label": ctx.local_vids.astype(np.float64)}

    def message(self, ctx, state):
        return state["label"]

    def apply(self, ctx, state, incoming, agg):
        new = np.minimum(state["label"], incoming)
        changed = int((new < state["label"]).sum())
        state["label"] = new
        return changed, 0.0


class PIEWCCProgram(MinLabelProgram):
    """PIE-shaped WCC: PEval converges min-labels over the edges whose
    BOTH endpoints are partition-local (the fragment's induced
    subgraph), then the IncEval supersteps only reconcile across
    partition boundaries — the PEval/IncEval split of the reference's
    ``@pie`` UDFs (decorators.py:35-70) and its C++ apps
    (``PEval(frag, ctx)`` then repeated ``IncEval``; e.g.
    ``analytical_engine/benchmarks/apps/wcc/wcc.h``). On a
    locality-preserving partitioning PEval removes almost all rounds;
    run on a symmetrized store."""

    def peval(self, ctx, state, edges):
        P, p = ctx.num_parts, ctx.part_id
        local = (edges.src % P == p) & (edges.dst % P == p)
        s_loc = edges.src[local] // P
        d_loc = edges.dst[local] // P
        labels = state["label"]
        while True:
            new = labels.copy()
            np.minimum.at(new, d_loc, labels[s_loc])
            if np.array_equal(new, labels):
                break
            labels = new
        state["label"] = labels


class NearestSeedProgram(VertexProgram):
    """Nearest-seed assignment (multi-source BFS Voronoi / seeded
    label assignment): every vertex adopts the label of its CLOSEST
    seed, ties to the smallest label — the seed-expansion primitive
    of landmark labeling and semi-supervised propagation. Written
    entirely on the user-program surface: state is ONE float,
    ``packed = dist · scale + label`` — lexicographic (dist, label)
    ordering under the engine's min-combine — and each hop's message
    is ``packed + scale`` (dist + 1, same label). Exact while
    ``(max_dist + 1) · scale < 2^53`` (float64 integer range);
    ``scale`` must exceed every label."""

    combine = "min"
    result_columns = ("packed",)

    def __init__(self, seed_vids, labels, scale: float):
        order = np.argsort(np.asarray(seed_vids, np.int64))
        self.sv = np.asarray(seed_vids, np.int64)[order]
        self.lab = np.asarray(labels, np.float64)[order]
        if len(self.lab) and self.lab.max() >= scale:
            raise ValueError("scale must exceed every label")
        self.scale = float(scale)

    def init(self, ctx):
        p = np.full(ctx.nlocal, np.inf)
        ix = np.searchsorted(self.sv, ctx.local_vids)
        ix = np.minimum(ix, max(len(self.sv) - 1, 0))
        m = (self.sv[ix] == ctx.local_vids) if len(self.sv) else \
            np.zeros(ctx.nlocal, dtype=bool)
        p[m] = self.lab[ix[m]]
        return {"packed": p}

    def message(self, ctx, state):
        return state["packed"] + self.scale

    def apply(self, ctx, state, incoming, agg):
        new = np.minimum(state["packed"], incoming)
        changed = int((new < state["packed"]).sum())
        state["packed"] = new
        return changed, 0.0
