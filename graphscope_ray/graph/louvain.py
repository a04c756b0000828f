"""Louvain community detection (deterministic synchronous variant).

The reference ships a distributed Pregel-style Louvain
(`/root/reference/analytical_engine/apps/pregel/louvain/louvain.h` +
`louvain_app_base.h`, ~1,226 LoC) whose output depends on execution
order. This engine implements a *deterministic* synchronous variant so
results are reproducible at any parallelism and exactly testable:

- vertices are processed in two parity classes per sweep
  (``node_id % 2``), moves within a class are simultaneous and
  computed against the pre-sweep state (prevents the classic
  synchronous oscillation);
- a vertex moves to the neighbor community with maximal modularity
  gain, ties broken by smallest community id; moves require
  gain > 1e-12;
- when a level converges, communities contract into a weighted graph
  (internal edges become self-loops) and the process repeats;
- final community labels are the minimum ORIGINAL vertex id of the
  community (partition-count-independent, SURVEY.md §5 convention).

Representation: a symmetric row list where every undirected edge
{u,v}, u≠v appears in both directions and every self-loop appears
twice; then k_v = Σ row weights at v, m = Σ rows / 2, and contraction
is a plain groupby-sum — one consistent convention end to end.

Scale note: the initial symmetric aggregation runs as Ray Data
batch transforms; level sweeps run vectorized on the driver and are
guarded to ≤ ``max_driver_rows`` rows (Louvain levels shrink
geometrically, so only level 0 is ever large — a BSP-actor level-0
sweep is the documented follow-on for >10⁸-edge graphs).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data


def _sym_rows(edges: ray.data.Dataset, weight_col: Optional[str]):
    """→ driver arrays (src, dst, w) in symmetric-row convention."""
    from graphscope_ray.util import bucketed_sum

    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    e = edges.select_columns(cols)

    def sym(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64, copy=False)
        d = t["dst"].to_numpy().astype(np.int64, copy=False)
        w = (t[weight_col].to_numpy().astype(np.float64, copy=False)
             if weight_col else np.ones(len(s)))
        # both directions; self-loops emitted twice by the same rule
        return pa.table({
            "s": np.r_[s, d], "t": np.r_[d, s], "w": np.r_[w, w],
        })

    agg = bucketed_sum(e.map_batches(sym, batch_format="pyarrow"),
                       ["s", "t"], "w")
    pdf = agg.to_pandas()
    return (pdf["s"].to_numpy(np.int64), pdf["t"].to_numpy(np.int64),
            pdf["w"].to_numpy(np.float64))


def _modularity(src, dst, w, comm, m) -> float:
    k = np.bincount(src, weights=w, minlength=comm.size)
    internal = w[comm[src] == comm[dst]].sum()
    tot = np.bincount(comm, weights=k)
    return internal / (2 * m) - float(np.square(tot / (2 * m)).sum())


def _one_level(src, dst, w, n, m, max_sweeps: int, parity_of=None):
    """Local-moving phase on the current level; returns (comm, moved?).

    ``parity_of``: per-node parity class (default: node index % 2).
    The driver path passes ORIGINAL vids at level 0 so its parity
    classes match the engine path's dense-vid parity even when the
    compacted endpoint set skips vids (isolated vertices would
    otherwise shift every later node into the other class and the two
    deterministic paths would legitimately diverge)."""
    comm = np.arange(n, dtype=np.int64)
    k = np.bincount(src, weights=w, minlength=n)
    par = (np.arange(n, dtype=np.int64) % 2 if parity_of is None
           else np.asarray(parity_of, dtype=np.int64) % 2)
    any_move = False
    for _ in range(max_sweeps):
        moved = 0
        for parity in (0, 1):
            tot = np.bincount(comm, weights=k, minlength=n)
            csrc = comm[src]
            # k_{v,C}: sum of weights from v to community C (no self rows)
            nz = src != dst
            key = dst[nz] * np.int64(n) + csrc[nz]
            uk, inv = np.unique(key, return_inverse=True)
            kvc = np.bincount(inv, weights=w[nz])
            vv = (uk // n).astype(np.int64)
            cc = (uk % n).astype(np.int64)
            # candidate scores: move v into C → k_vC/m − k_v·tot'_C/(2m²)
            totc = tot[cc] - np.where(cc == comm[vv], k[vv], 0.0)
            score = kvc / m - k[vv] * totc / (2 * m * m)
            sel = par[vv] == parity
            vv, cc, score = vv[sel], cc[sel], score[sel]
            if not len(vv):
                continue
            order = np.lexsort((cc, -score, vv))
            vv, cc, score = vv[order], cc[order], score[order]
            first = np.empty(len(vv), dtype=bool)
            first[0] = True
            first[1:] = vv[1:] != vv[:-1]
            bv, bc, bs = vv[first], cc[first], score[first]
            # score of staying (computed from the same candidate rows)
            stay = np.zeros(len(bv))
            stay_rows = cc == comm[vv]
            sv = vv[stay_rows]
            pos = np.searchsorted(bv, sv)
            stay_score = score[stay_rows]
            stay[pos] = stay_score
            # vertices with no same-comm neighbor rows: staying score =
            # 0/m − k_v·(tot_D − k_v)/(2m²)
            has_stay = np.zeros(len(bv), dtype=bool)
            has_stay[pos] = True
            no_stay = ~has_stay
            if no_stay.any():
                v0 = bv[no_stay]
                stay[no_stay] = -k[v0] * (tot[comm[v0]] - k[v0]) / (2 * m * m)
            do = (bs > stay + 1e-12) & (bc != comm[bv])
            if do.any():
                comm[bv[do]] = bc[do]
                moved += int(do.sum())
        if moved == 0:
            break
        any_move = True
    return comm, any_move


def _level0_bsp(engine, max_sweeps: int):
    """Level-0 local-moving phase on the resident GraphPartition
    actors (r01 VERDICT #8, r02 VERDICT #8): comm/k/tot live ON the
    actors (lv_init once per level — the only O(V) transfer), weighted
    votes combined per destination on its owner
    (partition.lv_votes/lv_moves — the cdlp machinery), and each
    half-sweep exchanges only the SPARSE move list (O(moved) driver
    traffic, applied as incremental community-mass deltas by
    lv_apply). Returns (comm, k, m, moved_any).

    Exactly equivalent to _one_level for integer weights (all sums —
    including the incremental tot — are exact regardless of combine
    order); for float weights the distributed sums may differ in the
    last ulp at score ties."""
    import ray

    actors = engine.actors
    V = engine.V
    parts = ray.get([a.lv_degree_part.remote() for a in actors])
    k = np.zeros(V)
    for vids_, acc in parts:
        np.add.at(k, vids_, acc)
    m = k.sum() / 2.0
    if m == 0:
        return np.arange(V, dtype=np.int64), k, m, False
    k_ref = ray.put(k)  # once per level, zero-copy on read
    ray.get([a.lv_init.remote(k_ref, m) for a in actors])
    any_move = False
    for _ in range(max_sweeps):
        moved = 0
        for parity in (0, 1):
            blocks = [a.lv_votes.remote() for a in actors]
            moves = ray.get([a.lv_moves.remote(parity, *blocks)
                             for a in actors])
            mv = np.concatenate([b for b, _ in moves])
            mc = np.concatenate([c for _, c in moves])
            if len(mv):
                mref = ray.put((mv, mc))
                ray.get([a.lv_apply.remote(mref) for a in actors])
                moved += len(mv)
        if moved == 0:
            break
        any_move = True
    comm = ray.get(actors[0].lv_comm.remote()) if actors else \
        np.arange(V, dtype=np.int64)
    return np.asarray(comm, dtype=np.int64), k, m, any_move


def louvain(
    edges: ray.data.Dataset,
    *,
    weight_col: Optional[str] = None,
    max_levels: int = 10,
    max_sweeps: int = 10,
    max_driver_rows: int = 20_000_000,
    engine=None,
) -> Tuple["np.ndarray", "np.ndarray", float]:
    """→ (vertex ids, community labels = min original member id,
    final modularity).

    ``engine``: a BSPEngine over the SAME graph (symmetrized weighted
    store, dense vids, simple graph — no self loops / duplicate
    rows). When given, the level-0 local-moving phase — the only
    level that is ever large — runs on the resident actors and only
    the contracted graph (communities × communities) comes back to
    the driver, removing the ``max_driver_rows`` ceiling."""
    if engine is not None:
        import ray
        comm0, k0, m, moved = _level0_bsp(engine, max_sweeps)
        V = engine.V
        vids = np.arange(V, dtype=np.int64)
        if m == 0:
            return vids, vids.copy(), 0.0
        # contract on the actors; driver merges community-graph rows.
        # Zero-mass communities (isolated vertices) are inert — nothing
        # can join them and they never move — so they are excluded from
        # the level-1 node numbering; otherwise the contracted node set
        # (and with it every later parity class) would differ from the
        # driver path's compacted endpoint set.
        ksum = np.bincount(comm0, weights=k0, minlength=V)
        uniq = np.unique(comm0[ksum[comm0] > 0])
        pos = np.searchsorted(uniq, comm0)
        pos_c = np.clip(pos, 0, max(0, len(uniq) - 1))
        comp = np.where(
            (len(uniq) > 0) & (uniq[pos_c] == comm0), pos_c, -1
        ).astype(np.int64)  # -1 = inert isolated vertex
        cref = ray.put(comp)
        parts = ray.get([a.lv_contract_part.remote(cref)
                         for a in engine.actors])
        n = len(uniq)
        csrc_l, cdst_l, cw_l = [], [], []
        for cs, cd, acc in parts:
            csrc_l.append(cs)
            cdst_l.append(cd)
            cw_l.append(acc)
        key = np.concatenate(csrc_l) * np.int64(n) + np.concatenate(cdst_l)
        uk, kinv = np.unique(key, return_inverse=True)
        cw = np.bincount(kinv, weights=np.concatenate(cw_l))
        csrc = (uk // n).astype(np.int64)
        cdst = (uk % n).astype(np.int64)
        assign = comp  # original dense vid -> level-1 node
        if not moved:
            q = _modularity(csrc, cdst, cw, np.arange(n), m)
            return vids, vids.copy(), float(q)
        start_level = 1
    else:
        src, dst, w = _sym_rows(edges, weight_col)
        if len(src) > max_driver_rows:
            raise NotImplementedError(
                f"{len(src)} symmetric rows exceed max_driver_rows; pass "
                "engine=... to run the level-0 sweep on the actor pool")
        vids, inv = np.unique(np.r_[src, dst], return_inverse=True)
        src_c = inv[: len(src)].astype(np.int64)
        dst_c = inv[len(src):].astype(np.int64)
        n0 = len(vids)
        m = w.sum() / 2.0
        if m == 0:
            return vids, vids.copy(), 0.0
        assign = np.arange(n0, dtype=np.int64)
        csrc, cdst, cw, n = src_c, dst_c, w, n0
        start_level = 0

    for level in range(start_level, max_levels):
        # level 0 (driver path): parity by ORIGINAL vid, matching the
        # engine path's dense-vid parity on sparse vid covers
        par = vids if level == 0 else None
        comm, moved = _one_level(csrc, cdst, cw, n, m, max_sweeps,
                                 parity_of=par)
        if not moved:
            break
        # contract: relabel communities compactly, rebuild weighted rows
        uniq, comp = np.unique(comm, return_inverse=True)
        assign = np.where(assign >= 0, comp[np.clip(assign, 0, None)], -1)
        key = comp[csrc] * np.int64(len(uniq)) + comp[cdst]
        uk, kinv = np.unique(key, return_inverse=True)
        cw = np.bincount(kinv, weights=cw)
        csrc = (uk // len(uniq)).astype(np.int64)
        cdst = (uk % len(uniq)).astype(np.int64)
        n = len(uniq)
        if n == 1:
            break

    q = _modularity(csrc, cdst, cw, np.arange(n), m)
    # label = min original vid per final community; inert isolated
    # vertices (assign == -1, engine path only) label as themselves
    labels = np.full(n, np.iinfo(np.int64).max)
    live = assign >= 0
    np.minimum.at(labels, assign[live], vids[live])
    out = np.where(live, labels[np.clip(assign, 0, None)], vids)
    return vids, out, float(q)
