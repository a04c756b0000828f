"""Per-partition graph state + vectorized BSP kernels (runs as a Ray actor).

This is the Ray-native analogue of the reference's resident *fragment*
(CSR both ways + vertex arrays, loaded once and reused across apps —
``/root/reference/analytical_engine/core/fragment/arrow_projected_fragment.h:431-485``,
``core/grape_instance.cc:200-214``) plus the per-app contexts
(``benchmarks/apps/pagerank/pagerank.h:29-79``).

Layout built once in ``__init__`` (state amortized across all rounds):

- edges of this partition sorted by ``(dst % P, dst)``;
- ``grp_start`` boundaries of equal-dst runs → per-destination combine
  is a single ``np.add.reduceat`` / ``np.minimum.reduceat`` (the
  combiner that makes the per-round shuffle O(distinct dst) instead of
  O(E) — message pre-aggregation, SURVEY.md §4);
- per-destination-partition slices so a scatter returns exactly P
  pre-combined message blocks (shipped actor→actor through the object
  store; the driver only routes ObjectRefs);
- foreign-source (split hub) edges resolve their source value from a
  per-round broadcast hub vector (``ray.put`` once per round).

All kernels are numpy-vectorized; no Python loop touches edges.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

INT_SENTINEL = np.iinfo(np.int64).max
FLT_SENTINEL = np.float64(np.inf)


def _part_order(part: np.ndarray, P: int) -> np.ndarray:
    """Stable order by destination-partition id. uint8 keys take
    numpy's single-pass radix argsort when P <= 256 (vs multi-pass
    merge on int64) — this sort sits on every packed-scatter path."""
    key = part.astype(np.uint8) if P <= 256 else part
    return np.argsort(key, kind="stable")


class GraphPartition:
    def __init__(self, store_path=None, part_id: int = 0,
                 edge_table=None, deg_table=None):
        """``edge_table`` / ``deg_table``: optional in-memory Arrow
        tables (freshly built stores hand their exchange output refs
        straight to the pool — Ray dereferences them to plasma-backed
        tables, zero-copy for the int64 columns — skipping the
        parquet round-trip; VERDICT r04 ask #2). Without them the
        partition reads the on-disk store layout.

        ``store_path=None`` builds an EMPTY SHELL: the process fork +
        module imports happen now (overlapping earlier pipeline
        stages — engine.prespawn_partitions), and a later
        ``load_store`` call attaches the data."""
        if store_path is not None:
            self.load_store(store_path, part_id, edge_table, deg_table)

    def load_store(self, store_path: str, part_id: int,
                   edge_table=None, deg_table=None) -> bool:
        import json

        with open(os.path.join(store_path, "meta.json")) as f:
            self.meta = json.load(f)
        self.p = int(part_id)
        self.P = int(self.meta["num_parts"])
        self.V = int(self.meta["num_vertices"])
        self.nlocal = len(range(self.p, self.V, self.P))
        self.hubs = np.asarray(self.meta["hubs"], dtype=np.int64)  # sorted
        self.has_weight = bool(self.meta["has_weight"])

        edir = os.path.join(store_path, "edges", f"part={self.p}")
        t = edge_table
        if t is None and os.path.isdir(edir):
            cols = ["src", "dst"] + (["weight"] if self.has_weight else [])
            if self.meta.get("has_dir"):
                cols.append("dir")
            t = pq.read_table(edir, columns=cols)
        if t is not None:
            src = t["src"].to_numpy().astype(np.int64, copy=False)
            dst = t["dst"].to_numpy().astype(np.int64, copy=False)
            w = (
                t["weight"].to_numpy().astype(np.float64, copy=False)
                if self.has_weight
                else None
            )
            dirs = (
                t["dir"].to_numpy().astype(np.int8, copy=False)
                if self.meta.get("has_dir")
                else None
            )
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
            w = np.array([], dtype=np.float64) if self.has_weight else None
            dirs = None

        self._build_layout(src, dst, w, dirs)

        # hubs owned by this partition (their values get published per round)
        hub_owned_mask = (self.hubs % self.P) == self.p
        self.hub_own_pos = np.flatnonzero(hub_owned_mask)
        self.hub_own_local = self.hubs[hub_owned_mask] // self.P

        # global out-degrees of owned vertices
        ddir = os.path.join(store_path, "degrees", f"part={self.p}")
        self.out_deg = np.zeros(self.nlocal, dtype=np.int64)
        dt = deg_table
        if dt is None and os.path.isdir(ddir):
            dt = pq.read_table(ddir, columns=["vid", "out_deg"])
        if dt is not None and dt.num_rows:
            vid = dt["vid"].to_numpy().astype(np.int64, copy=False)
            deg = dt["out_deg"].to_numpy().astype(np.int64, copy=False)
            self.out_deg[vid // self.P] = deg

        self.state: dict = {}
        # message packing mode: True → scatter returns ONE compact
        # ("P", bounds, col...) tuple (few big buffers; cheap to
        # (de)serialize); False → list of per-destination slices for
        # num_returns=P routing (per-node locality on large clusters)
        self.packed = True
        return True

    def _build_layout(self, src, dst, w, dirs):
        """(Re)build the (dst % P, dst)-sorted edge layout + group /
        routing structures from raw arrays (also used by the
        append-only path, apps/property/sssp_property_append.h
        analogue)."""
        order = np.lexsort((dst, dst % self.P))
        self.src = src[order]
        self.dst = dst[order]
        self.w = w[order] if w is not None else None
        self.dirs = dirs[order] if dirs is not None else None
        self.E = len(self.src)

        # group boundaries = runs of equal dst in (dst % P, dst) layout
        # order (np.unique would re-sort by value and break the layout)
        if self.E:
            change = np.empty(self.E, dtype=bool)
            change[0] = True
            np.not_equal(self.dst[1:], self.dst[:-1], out=change[1:])
            self.grp_start = np.flatnonzero(change)
            self.uniq_dst = self.dst[self.grp_start]
        else:
            self.grp_start = np.array([], dtype=np.int64)
            self.uniq_dst = np.array([], dtype=np.int64)
        self.G = len(self.uniq_dst)
        grp_sizes = np.diff(np.append(self.grp_start, self.E))
        self.edge_grp = np.repeat(np.arange(self.G, dtype=np.int64), grp_sizes)
        part_of_grp = self.uniq_dst % self.P
        # nondecreasing by construction of the (dst % P, dst) sort
        self.part_slices = np.searchsorted(part_of_grp, np.arange(self.P + 1))
        self.part_of_grp = part_of_grp

        owned = (self.src % self.P) == self.p
        self.owned = owned
        self.src_local = np.where(owned, self.src // self.P, 0)
        self.foreign_idx = np.flatnonzero(~owned)
        if len(self.foreign_idx):
            fsrc = self.src[self.foreign_idx]
            pos = np.searchsorted(self.hubs, fsrc)
            if not np.array_equal(self.hubs[pos], fsrc):
                raise RuntimeError("foreign-source edge whose src is not a hub")
            self.foreign_hub_pos = pos
        else:
            self.foreign_hub_pos = np.array([], dtype=np.int64)

    def set_packed(self, flag: bool):
        self.packed = bool(flag)

    # ------------------------------------------------------------------
    # append-only edge mutation (the reference's only streaming-ish
    # surface: core/fragment/append_only_arrow_fragment.h +
    # apps/property/sssp_property_append.h). Vertices are fixed (vids
    # < V); appended rows re-enter the sorted layout, degrees update at
    # the source's owner.
    # ------------------------------------------------------------------

    def append_rows(self, src, dst, w=None):
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if src.max(initial=-1) >= self.V or dst.max(initial=-1) >= self.V:
            raise ValueError("appended edges must stay within the "
                             "existing vertex space (vid < V)")
        new_src = np.concatenate([self.src, src])
        new_dst = np.concatenate([self.dst, dst])
        if self.w is not None:
            wa = (np.asarray(w, dtype=np.float64) if w is not None
                  else np.ones(len(src)))
            new_w = np.concatenate([self.w, wa])
        else:
            new_w = None
        if self.dirs is not None:
            raise NotImplementedError("append on dual-direction stores")
        self._build_layout(new_src, new_dst, new_w, None)
        return len(src)

    def add_out_deg(self, vids, cnt):
        vids = np.asarray(vids, dtype=np.int64)
        np.add.at(self.out_deg, vids // self.P,
                  np.asarray(cnt, dtype=np.int64))
        return True

    # ------------------------------------------------------------------
    # full dynamic mutation (the reference's MODIFY_EDGES /
    # MODIFY_VERTICES over DynamicFragment: core/fragment/
    # dynamic_fragment.h:220-233, grape_instance.cc:247-296). Edge
    # delete/update route here by the same layout rule append_rows
    # uses; vertex deletion is a full local scan (the reference walks
    # adjacency the same way). All kernels are vectorized
    # (searchsorted membership, never a Python row loop) and rebuild
    # the sorted layout once per call.
    # ------------------------------------------------------------------

    def _pair_keys(self, src, dst):
        if self.V >= 3_000_000_000:
            raise NotImplementedError(
                "packed (src, dst) keys need V < 3e9; mutate via the "
                "Dataset rebuild path instead")
        return src * np.int64(self.V) + dst

    def remove_rows(self, src, dst):
        """Delete EVERY stored copy of each (src, dst) pair from this
        partition's layout (DynamicFragment del-edge semantics — a
        missing pair is a silent no-op, NetworkX-style). Returns
        (unique removed source vids, per-source removed counts) so the
        engine can decrement degrees at each source's owner."""
        if self.dirs is not None:
            raise NotImplementedError("mutation on dual-direction stores")
        empty = np.array([], dtype=np.int64)
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if self.E == 0 or not len(src):
            return empty, empty
        qkeys = np.unique(self._pair_keys(src, dst))
        keys = self._pair_keys(self.src, self.dst)
        pos = np.clip(np.searchsorted(qkeys, keys), 0, len(qkeys) - 1)
        hit = qkeys[pos] == keys
        if not hit.any():
            return empty, empty
        rsrc = self.src[hit]
        keep = ~hit
        self._build_layout(self.src[keep], self.dst[keep],
                           self.w[keep] if self.w is not None else None,
                           None)
        dvids, dcnt = np.unique(rsrc, return_counts=True)
        return dvids, dcnt

    def update_rows_weight(self, src, dst, w):
        """Set the weight of every stored copy of each (src, dst) pair
        (MODIFY_EDGES update semantics; missing pairs are no-ops).
        Duplicate pairs in one call: the last value wins. Returns the
        number of layout rows updated."""
        if self.dirs is not None:
            raise NotImplementedError("mutation on dual-direction stores")
        if self.w is None:
            raise ValueError("graph was built without weights")
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        w = np.asarray(w, dtype=np.float64)
        if self.E == 0 or not len(src):
            return 0
        qk = self._pair_keys(src, dst)
        # stable sort + take the LAST occurrence of each key
        order = np.argsort(qk, kind="stable")
        qk_s, w_s = qk[order], w[order]
        last = np.r_[qk_s[1:] != qk_s[:-1], True]
        qk_u, w_u = qk_s[last], w_s[last]
        keys = self._pair_keys(self.src, self.dst)
        pos = np.clip(np.searchsorted(qk_u, keys), 0, len(qk_u) - 1)
        hit = qk_u[pos] == keys
        if hit.any():
            self.w[hit] = w_u[pos[hit]]
        return int(hit.sum())

    def remove_incident(self, vids):
        """Remove ALL edges whose source OR destination is in ``vids``
        (vertex deletion: DynamicFragment del-vertex). Full local scan,
        O(E_p log |vids|) vectorized. Returns (unique removed source
        vids, counts) for the degree fixup."""
        if self.dirs is not None:
            raise NotImplementedError("mutation on dual-direction stores")
        empty = np.array([], dtype=np.int64)
        q = np.unique(np.asarray(vids, dtype=np.int64))
        if self.E == 0 or not len(q):
            return empty, empty

        def in_sorted(a):
            pos = np.clip(np.searchsorted(q, a), 0, len(q) - 1)
            return q[pos] == a

        hit = in_sorted(self.src) | in_sorted(self.dst)
        if not hit.any():
            return empty, empty
        rsrc = self.src[hit]
        keep = ~hit
        self._build_layout(self.src[keep], self.dst[keep],
                           self.w[keep] if self.w is not None else None,
                           None)
        dvids, dcnt = np.unique(rsrc, return_counts=True)
        return dvids, dcnt

    def clear_edges(self):
        """CLEAR_EDGES (grape_instance.cc:704-752): drop every edge,
        zero all degrees; the vertex space is untouched."""
        if self.dirs is not None:
            raise NotImplementedError("mutation on dual-direction stores")
        empty = np.array([], dtype=np.int64)
        self._build_layout(
            empty, empty,
            np.array([], dtype=np.float64) if self.w is not None else None,
            None)
        self.out_deg[:] = 0
        return True

    def grow_vertices(self, n_new: int):
        """Extend the vertex space by ``n_new`` fresh, isolated vids
        (V..V+n_new-1) — MODIFY_VERTICES insert. New vids follow the
        same vid%P ownership; per-app state is allocated per run, so
        only V/nlocal/out_deg need extending here. NOTE: in-place adds
        assign vids in arrival order, so the build-time 'vid = rank of
        sorted oid' invariant holds only for the original id range."""
        old_nlocal = self.nlocal
        self.V = int(self.V + n_new)
        self.nlocal = len(range(self.p, self.V, self.P))
        if self.nlocal > old_nlocal:
            self.out_deg = np.concatenate([
                self.out_deg,
                np.zeros(self.nlocal - old_nlocal, dtype=np.int64)])
        return self.nlocal

    def vec_set(self, name: str, vids, vals):
        """Sparse owner-side vertex-value update (MODIFY_VERTICES
        update analogue): overwrite state[name] at the owned subset of
        ``vids``. The state must already exist (vec_init)."""
        s = self.state[name]
        vids = np.asarray(vids, dtype=np.int64)
        vals = np.asarray(vals, dtype=np.float64)
        mine = (vids % self.P) == self.p
        s["x"][vids[mine] // self.P] = vals[mine]
        return int(mine.sum())

    def sssp_seed(self, vids):
        """Mark owned, already-reached vertices as frontier so an
        incremental SSSP resumes relaxation only from the appended
        edges' sources (sssp_property_append.h semantics)."""
        s = self.state["sssp"]
        vids = np.asarray(vids, dtype=np.int64)
        mine = vids[(vids % self.P) == self.p] // self.P
        frontier = np.zeros(self.nlocal, dtype=bool)
        frontier[mine] = np.isfinite(s["dist"][mine])
        s["frontier"] = frontier
        return int(frontier.sum())

    def wcc_seed(self, vids):
        """Incremental-WCC warm start after append_edges: mark owned
        appended-edge endpoints as frontier; labels carry over from
        the prior run. Min-label propagation is monotone under edge
        insertion, so this converges to the full-recompute fixpoint
        (the WCC analogue of sssp_property_append.h — every vertex
        that decreases re-broadcasts via wcc_apply, and an unchanged
        endpoint broadcasts across its new edges in round 1 because
        it IS a seed)."""
        s = self.state["wcc"]
        vids = np.asarray(vids, dtype=np.int64)
        mine = vids[(vids % self.P) == self.p] // self.P
        frontier = np.zeros(self.nlocal, dtype=bool)
        frontier[mine] = True
        s["frontier"] = frontier
        return int(frontier.sum())

    # ------------------------------------------------------------------
    # shared kernels
    # ------------------------------------------------------------------

    def local_vids(self) -> np.ndarray:
        return np.arange(self.p, self.V, self.P, dtype=np.int64)

    def _norm_hub(self, hub_parts):
        """() → None; (array,) → array; (part, part, ...) → list of
        (positions, values) parts (pipelined mode)."""
        if not hub_parts:
            return None
        if len(hub_parts) == 1 and isinstance(hub_parts[0], np.ndarray):
            return hub_parts[0]
        if len(hub_parts) == 1 and hub_parts[0] is None:
            return None
        return list(hub_parts)

    def _edge_src_vals(
        self, local_vals: np.ndarray, hub_vals
    ) -> np.ndarray:
        # Gather into a per-dtype buffer reused across supersteps: a
        # fresh E×8B allocation per round is mmap'd+unmapped by glibc
        # and page-faults every superstep (measured 1.8× on this
        # host); the buffer faults once per actor lifetime. Safe
        # because no caller retains the gathered array past its own
        # round (all consume via reduceat/where/arith into new arrays)
        # and actor tasks run serially.
        bufs = getattr(self, "_gather_bufs", None)
        if bufs is None:
            bufs = self._gather_bufs = {}
        buf = bufs.get(local_vals.dtype.str)
        if buf is None or len(buf) != self.E:
            buf = bufs[local_vals.dtype.str] = np.empty(
                self.E, dtype=local_vals.dtype)
        out = np.take(local_vals, self.src_local, out=buf)
        if len(self.foreign_idx):
            if hub_vals is None:
                raise RuntimeError("hub values required but not provided")
            if isinstance(hub_vals, (list, tuple)):
                # pipelined mode: per-owner (positions, values) parts —
                # assemble the hub vector locally (tiny)
                arr = np.zeros(len(self.hubs))
                for pos, vals in hub_vals:
                    if len(pos):
                        arr[pos] = vals
                hub_vals = arr
            out[self.foreign_idx] = hub_vals[self.foreign_hub_pos]
        return out

    def _ones_edges(self) -> np.ndarray:
        """Cached all-ones E-vector (unweighted CDLP rounds) — fresh
        E×8B per round would page-fault each superstep (see
        _edge_src_vals). Callers must not mutate it."""
        buf = getattr(self, "_ones_E", None)
        if buf is None or len(buf) != self.E:
            buf = self._ones_E = np.ones(self.E)
        return buf

    def _empty_msgs(self):
        if self.packed:
            return ("P", np.zeros(self.P + 1, np.int64))
        return [None] * self.P

    def _split_groups(self, combined: np.ndarray):
        """Split per-group combined values into P (dst_ids, vals) blocks."""
        msgs = []
        for q in range(self.P):
            a, b = self.part_slices[q], self.part_slices[q + 1]
            if a == b:
                msgs.append(None)
            else:
                msgs.append((self.uniq_dst[a:b], combined[a:b]))
        return msgs

    def _scatter_sum(self, edge_vals: np.ndarray):
        if self.E == 0:
            return self._empty_msgs()
        sums = np.add.reduceat(edge_vals, self.grp_start)
        if self.packed:
            return ("P", self.part_slices, self.uniq_dst, sums)
        return self._split_groups(sums)

    def _scatter_min(self, edge_vals: np.ndarray, sentinel):
        """Min-combine; groups whose min is the sentinel are dropped."""
        if self.E == 0:
            return self._empty_msgs()
        mins = np.minimum.reduceat(edge_vals, self.grp_start)
        live = mins != sentinel
        if self.packed:
            dst = self.uniq_dst[live]
            vals = mins[live]
            bounds = np.searchsorted(self.part_of_grp[live],
                                     np.arange(self.P + 1))
            return ("P", bounds, dst, vals)
        msgs = []
        for q in range(self.P):
            a, b = self.part_slices[q], self.part_slices[q + 1]
            lv = live[a:b]
            if a == b or not lv.any():
                msgs.append(None)
            else:
                msgs.append((self.uniq_dst[a:b][lv], mins[a:b][lv]))
        return msgs

    def _unpack(self, msgs):
        """Packed-mode support: a compact ("P", bounds, col...) message
        is a full scatter output — slice this partition's rows out of
        the shared buffers. Plain tuples/None pass through (sliced)."""
        out = []
        for m in msgs:
            if (isinstance(m, tuple) and len(m) >= 2
                    and isinstance(m[0], str) and m[0] == "P"):
                if len(m) == 2:
                    out.append(None)
                    continue
                a, b = int(m[1][self.p]), int(m[1][self.p + 1])
                out.append(None if a == b
                           else tuple(arr[a:b] for arr in m[2:]))
            elif isinstance(m, list):
                out.append(m[self.p])
            else:
                out.append(m)
        return out

    def _concat_msgs(self, msgs):
        msgs = self._unpack(msgs)
        parts = [m for m in msgs if m is not None and len(m[0])]
        if not parts:
            return None, None
        dst = np.concatenate([m[0] for m in parts])
        vals = np.concatenate([m[1] for m in parts])
        return dst, vals

    def _apply_sum(self, msgs) -> np.ndarray:
        acc = np.zeros(self.nlocal, dtype=np.float64)
        dst, vals = self._concat_msgs(msgs)
        if dst is not None:
            np.add.at(acc, dst // self.P, vals)  # ≤ P entries per dst
        return acc

    def _apply_min(self, current: np.ndarray, msgs) -> np.ndarray:
        dst, vals = self._concat_msgs(msgs)
        if dst is None:
            return current
        out = current.copy()
        np.minimum.at(out, dst // self.P, vals)
        return out

    # ------------------------------------------------------------------
    # PageRank — exact reference semantics (reported space):
    #   base_t = (1-δ)/N + δ·dangling_sum_t/N
    #   rank'(u) = δ·Σ_{v→u} rank(v)/outdeg(v) + base   (outdeg(u) > 0)
    #   rank'(u) = base                                  (dangling — the
    #     reference drops incoming mass to dangling vertices:
    #     benchmarks/apps/pagerank/pagerank.h:160-166)
    #   dangling_sum_{t+1} = base_t · dangling_vnum
    # ------------------------------------------------------------------

    def pr_init(self):
        r = np.full(self.nlocal, 1.0 / self.V)
        dangling = self.out_deg == 0
        inv_deg = np.zeros(self.nlocal)
        nz = ~dangling
        inv_deg[nz] = 1.0 / self.out_deg[nz]
        self.state["pr"] = {
            "rank": r,
            "dangling": dangling,
            "inv_deg": inv_deg,
        }
        return int(dangling.sum())

    def ppr_init(self, seeds, n_seeds: int, delta: float):
        """Personalized PageRank state: rank starts as the uniform
        seed-indicator distribution; the per-vertex restart base
        ``(1−δ)·e_S`` replaces PageRank's scalar base. Reuses the pr
        scatter/result surface (same rank/inv_deg layout)."""
        self.pr_init()
        s = self.state["pr"]
        base = np.zeros(self.nlocal)
        seeds = np.asarray(seeds, dtype=np.int64)
        mine = seeds[(seeds % self.P) == self.p] // self.P
        if len(mine):
            base[mine] = 1.0 / float(n_seeds)
        s["rank"] = base.copy()
        s["ppr_base"] = (1.0 - delta) * base

    def ppr_apply(self, delta: float, *msgs):
        """r ← (1−δ)·e_S + δ·Aᵀr. Dangling out-mass is dropped (their
        inv_deg is 0 in pr_scatter) — the documented convention the
        SQL twin shares."""
        s = self.state["pr"]
        inc = self._apply_sum(msgs)
        new = delta * inc + s["ppr_base"]
        dmax = float(np.max(np.abs(new - s["rank"]))) if self.nlocal else 0.0
        s["rank"] = new
        return dmax

    def pr_scatter(self, *hub_parts):
        hub_vals = self._norm_hub(hub_parts)
        s = self.state["pr"]
        v = s["rank"] * s["inv_deg"]  # rank/outdeg; 0 for dangling (no out-edges anyway)
        return self._scatter_sum(self._edge_src_vals(v, hub_vals))

    def pr_get_hub_vals(self):
        s = self.state["pr"]
        v = s["rank"] * s["inv_deg"]
        return self.hub_own_pos, v[self.hub_own_local]

    def pr_apply(self, base: float, delta: float, *msgs):
        s = self.state["pr"]
        inc = self._apply_sum(msgs)
        new = delta * inc + base
        new[s["dangling"]] = base
        delta_max = float(np.max(np.abs(new - s["rank"]))) if self.nlocal else 0.0
        s["rank"] = new
        return delta_max

    def pr_step(self, base, delta: float, *msgs):
        """Fused apply+scatter for the pipelined fixed-round loop: one
        actor task per round. ``base=None`` → first round (scatter
        only); messages are the previous round's packed scatter
        outputs, applied with the previous round's ``base``."""
        if base is not None:
            self.pr_apply(base, delta, *msgs)
        return self.pr_scatter()

    def pr_result(self):
        return self.local_vids(), self.state["pr"]["rank"]

    # ------------------------------------------------------------------
    # WCC — min-label propagation over both edge directions (store must
    # be symmetrized); frontier-based like the reference
    # (benchmarks/apps/wcc/wcc.h:58-169) but labels are min-vid ≡
    # min-oid (SURVEY.md §5 partition-independence caveat).
    # ------------------------------------------------------------------

    def wcc_init(self):
        self.state["wcc"] = {
            "label": self.local_vids().copy(),
            "frontier": np.ones(self.nlocal, dtype=bool),
        }

    def wcc_scatter(self, *hub_parts):
        hub_vals = self._norm_hub(hub_parts)
        s = self.state["wcc"]
        if self.E == 0:
            return self._empty_msgs()
        vals = self._edge_src_vals(s["label"], hub_vals)
        # non-frontier sources are masked to the sentinel (dropped groups)
        active = s["frontier"][self.src_local]
        if len(self.foreign_idx):
            active = active.copy()
            active[self.foreign_idx] = True  # hubs always ship (cheap, few)
        vals = np.where(active, vals, INT_SENTINEL)
        return self._scatter_min(vals, INT_SENTINEL)

    def wcc_get_hub_vals(self):
        s = self.state["wcc"]
        return self.hub_own_pos, s["label"][self.hub_own_local]

    def wcc_apply(self, *msgs):
        s = self.state["wcc"]
        new = self._apply_min(s["label"], msgs)
        changed = new < s["label"]
        s["label"] = new
        s["frontier"] = changed
        return int(changed.sum())

    def wcc_result(self):
        return self.local_vids(), self.state["wcc"]["label"]

    # ------------------------------------------------------------------
    # SCC — FW-BW-Trim coloring (Orzan'04 / Pregel-style; extension op,
    # the reference's nx layer exposes strongly_connected_components).
    # Requires a directions="both" store: dir==0 rows are the original
    # orientation, dir==1 rows its reversed copies. State: color (fwd
    # min-label), scc (-1 = active), visited/bfront (backward BFS).
    # The backward phase ships DISTINCT (dst, color) pairs — colors
    # must NOT min-combine across classes, so it bypasses _scatter_min.
    # ------------------------------------------------------------------

    def scc_init(self):
        self.state["scc"] = {
            "color": self.local_vids().copy(),
            "scc": np.full(self.nlocal, -1, dtype=np.int64),
            "visited": np.zeros(self.nlocal, dtype=bool),
            "bfront": np.zeros(self.nlocal, dtype=bool),
        }

    def _scc_edge_mask(self, flags: np.ndarray, direction: int) -> np.ndarray:
        """Per-edge mask: src has ``flags`` set AND edge runs in
        ``direction`` (0 = original, 1 = reversed copy)."""
        m = flags[self.src_local]
        if self.dirs is not None:
            m = m & (self.dirs == direction)
        return m

    def scc_trim_scatter(self, direction: int):
        """Sum-combine 1 from every ACTIVE source along ``direction``
        — at the dst this is its active in-degree (dir 0) or active
        out-degree (dir 1)."""
        s = self.state["scc"]
        if self.E == 0:
            return self._empty_msgs()
        act = s["scc"] == -1
        ones = self._scc_edge_mask(act, direction).astype(np.float64)
        return self._scatter_sum(ones)

    def scc_trim_apply(self, chan: str, *msgs):
        s = self.state["scc"]
        s[chan] = self._apply_sum(msgs)
        return 0

    def scc_trim_finish(self):
        """Deactivate active vertices with no active in- or out-edges:
        they are singleton SCCs (the Trim step)."""
        s = self.state["scc"]
        act = s["scc"] == -1
        dead = act & ((s["t_in"] == 0) | (s["t_out"] == 0))
        s["scc"][dead] = self.local_vids()[dead]
        s["color"] = np.where(s["scc"] == -1, self.local_vids(), s["color"])
        return int(dead.sum())

    def scc_fwd_scatter(self):
        s = self.state["scc"]
        if self.E == 0:
            return self._empty_msgs()
        act = s["scc"] == -1
        vals = self._edge_src_vals(s["color"], None)
        mask = self._scc_edge_mask(act, 0)
        vals = np.where(mask, vals, INT_SENTINEL)
        return self._scatter_min(vals, INT_SENTINEL)

    def scc_fwd_apply(self, *msgs):
        s = self.state["scc"]
        act = s["scc"] == -1
        new = self._apply_min(s["color"], msgs)
        new = np.where(act, new, s["color"])
        changed = new < s["color"]
        s["color"] = new
        return int(changed.sum())

    def scc_mark_roots(self):
        s = self.state["scc"]
        roots = (s["scc"] == -1) & (s["color"] == self.local_vids())
        s["visited"] = roots.copy()
        s["bfront"] = roots.copy()
        return int(roots.sum())

    def scc_bwd_scatter(self):
        """Backward frontier: ship DISTINCT (dst, color) pairs along
        reversed edges — a receiver joins iff a pair matches its own
        color, so colors of different classes must survive side by
        side (no min-combine)."""
        s = self.state["scc"]
        if self.E == 0:
            return self._empty_msgs()
        mask = self._scc_edge_mask(s["bfront"], 1)
        idx = np.nonzero(mask)[0]
        if not len(idx):
            return self._empty_msgs()
        vals = self._edge_src_vals(s["color"], None)
        dst = self.uniq_dst[self.edge_grp[idx]].astype(np.int64)
        key = dst * np.int64(self.V + 1) + vals[idx]
        uk = np.unique(key)
        d = uk // np.int64(self.V + 1)
        c = uk % np.int64(self.V + 1)
        part = (d % self.P).astype(np.int64)
        order = np.argsort(part, kind="stable")
        d, c, part = d[order], c[order], part[order]
        if self.packed:
            bounds = np.searchsorted(part, np.arange(self.P + 1))
            return ("P", bounds, d, c)
        msgs = []
        for q in range(self.P):
            a, b = np.searchsorted(part, q), np.searchsorted(part, q + 1)
            msgs.append(None if a == b else (d[a:b], c[a:b]))
        return msgs

    def scc_bwd_apply(self, *msgs):
        s = self.state["scc"]
        s["bfront"] = np.zeros(self.nlocal, dtype=bool)
        dst, vals = self._concat_msgs(msgs)
        if dst is None:
            return 0
        li = dst // self.P
        ok = (~s["visited"][li]) & (s["scc"][li] == -1) \
            & (s["color"][li] == vals)
        newly = np.unique(li[ok])
        s["visited"][newly] = True
        s["bfront"][newly] = True
        return int(len(newly))

    def scc_finalize_round(self):
        s = self.state["scc"]
        fin = s["visited"] & (s["scc"] == -1)
        s["scc"][fin] = s["color"][fin]
        s["visited"][:] = False
        s["bfront"][:] = False
        act = s["scc"] == -1
        s["color"] = np.where(act, self.local_vids(), s["color"])
        return int(act.sum())

    def scc_result(self):
        return self.local_vids(), self.state["scc"]["scc"]

    # ------------------------------------------------------------------
    # CDLP (LDBC community detection by label propagation): label init =
    # own id; each synchronous round adopt the most frequent neighbor
    # label, ties → smallest label; fixed number of rounds.
    # LPA-weighted variant: frequency = sum of edge weights.
    # ------------------------------------------------------------------

    def cdlp_init(self, weighted: bool = False):
        self.state["cdlp"] = {
            "label": self.local_vids().copy(),
            "weighted": bool(weighted) and self.has_weight,
        }

    def cdlp_set_weighted(self, weighted: bool):
        self.state.setdefault("cdlp", {})["weighted"] = (
            bool(weighted) and self.has_weight
        )

    def cdlp_scatter(self, *hub_parts):
        hub_vals = self._norm_hub(hub_parts)
        s = self.state["cdlp"]
        if self.E == 0:
            return self._empty_msgs()
        labels = self._edge_src_vals(s["label"], hub_vals)
        wts = self.w if s["weighted"] else self._ones_edges()
        # partial (group, label) → count/weight-sum, vectorized
        if self.G and (self.G + 1) < 2**62 // (self.V + 1):
            key = self.edge_grp * np.int64(self.V + 1) + labels
            uk, inv = np.unique(key, return_inverse=True)
            cnt = np.bincount(inv, weights=wts)
            g = (uk // (self.V + 1)).astype(np.int64)
            lab = (uk % (self.V + 1)).astype(np.int64)
        else:  # overflow-safe fallback
            order = np.lexsort((labels, self.edge_grp))
            g_s, l_s, w_s = self.edge_grp[order], labels[order], wts[order]
            newg = np.empty(len(g_s), dtype=bool)
            newg[0] = True
            newg[1:] = (g_s[1:] != g_s[:-1]) | (l_s[1:] != l_s[:-1])
            starts = np.flatnonzero(newg)
            cnt = np.add.reduceat(w_s, starts)
            g, lab = g_s[starts], l_s[starts]
        # g ascending → still in (dst % P, dst) order
        dsts = self.uniq_dst[g]
        bounds = np.searchsorted(self.part_of_grp[g], np.arange(self.P + 1))
        if self.packed:
            return ("P", bounds, dsts, lab, cnt)
        msgs = []
        for q in range(self.P):
            a, b = bounds[q], bounds[q + 1]
            msgs.append(None if a == b else (dsts[a:b], lab[a:b], cnt[a:b]))
        return msgs

    def cdlp_get_hub_vals(self):
        s = self.state["cdlp"]
        return self.hub_own_pos, s["label"][self.hub_own_local]

    def cdlp_apply(self, *msgs):
        s = self.state["cdlp"]
        msgs = self._unpack(msgs)
        parts = [m for m in msgs if m is not None and len(m[0])]
        if not parts:
            return 0
        dst = np.concatenate([m[0] for m in parts])
        lab = np.concatenate([m[1] for m in parts])
        cnt = np.concatenate([m[2] for m in parts])
        dl = dst // self.P
        # merge partial counts: sort by (dst, label), reduceat sums
        order = np.lexsort((lab, dl))
        dl, lab, cnt = dl[order], lab[order], cnt[order]
        newg = np.empty(len(dl), dtype=bool)
        newg[0] = True
        newg[1:] = (dl[1:] != dl[:-1]) | (lab[1:] != lab[:-1])
        starts = np.flatnonzero(newg)
        tot = np.add.reduceat(cnt, starts)
        dl, lab = dl[starts], lab[starts]
        # argmax per dst with min-label tiebreak: sort (dst, -count, label)
        order = np.lexsort((lab, -tot, dl))
        dl, lab = dl[order], lab[order]
        first = np.empty(len(dl), dtype=bool)
        first[0] = True
        first[1:] = dl[1:] != dl[:-1]
        sel = np.flatnonzero(first)
        winners_dst, winners_lab = dl[sel], lab[sel]
        changed = int(
            (self.state["cdlp"]["label"][winners_dst] != winners_lab).sum()
        )
        s["label"][winners_dst] = winners_lab
        return changed

    def cdlp_result(self):
        return self.local_vids(), self.state["cdlp"]["label"]

    # ------------------------------------------------------------------
    # Min-plus relaxation (SSSP with weights; BFS with unit weight) —
    # reference: apps/projected/sssp_projected.h, benchmarks/apps/bfs.
    # ------------------------------------------------------------------

    def sssp_init(self, source: int, unit: bool):
        dist = np.full(self.nlocal, FLT_SENTINEL)
        if source % self.P == self.p:
            dist[source // self.P] = 0.0
        self.state["sssp"] = {
            "dist": dist,
            "frontier": np.isfinite(dist),
            "unit": bool(unit),
        }

    def sssp_scatter(self, *hub_parts):
        hub_vals = self._norm_hub(hub_parts)
        s = self.state["sssp"]
        if self.E == 0:
            return self._empty_msgs()
        d = self._edge_src_vals(s["dist"], hub_vals)
        active = s["frontier"][self.src_local]
        if len(self.foreign_idx):
            active = active.copy()
            active[self.foreign_idx] = True
        step = (
            np.ones(self.E)
            if (s["unit"] or self.w is None)
            else self.w
        )
        cand = np.where(active & np.isfinite(d), d + step, FLT_SENTINEL)
        return self._scatter_min(cand, FLT_SENTINEL)

    def sssp_get_hub_vals(self):
        s = self.state["sssp"]
        return self.hub_own_pos, s["dist"][self.hub_own_local]

    def sssp_apply(self, *msgs):
        s = self.state["sssp"]
        new = self._apply_min(s["dist"], msgs)
        changed = new < s["dist"]
        s["dist"] = new
        s["frontier"] = changed
        return int(changed.sum())

    def sssp_result(self):
        return self.local_vids(), self.state["sssp"]["dist"]

    # ------------------------------------------------------------------
    # SSSP with predecessor tracking (apps/sssp/sssp_path.h:41-163:
    # relax keeps the predecessor; ties broken by min predecessor id so
    # results are partition-count-independent).
    # ------------------------------------------------------------------

    def spath_init(self, source: int, unit: bool):
        dist = np.full(self.nlocal, FLT_SENTINEL)
        pred = np.full(self.nlocal, -1, dtype=np.int64)
        if source % self.P == self.p:
            dist[source // self.P] = 0.0
            pred[source // self.P] = source
        self.state["spath"] = {
            "dist": dist, "pred": pred,
            "frontier": np.isfinite(dist), "unit": bool(unit),
        }

    def spath_scatter(self, *hub_parts):
        hub_vals = self._norm_hub(hub_parts)
        s = self.state["spath"]
        if self.E == 0:
            return self._empty_msgs()
        d = self._edge_src_vals(s["dist"], hub_vals)
        active = s["frontier"][self.src_local]
        if len(self.foreign_idx):
            active = active.copy()
            active[self.foreign_idx] = True
        step = np.ones(self.E) if (s["unit"] or self.w is None) else self.w
        cand = np.where(active & np.isfinite(d), d + step, FLT_SENTINEL)
        # per-group argmin with min-parent tiebreak
        order = np.lexsort((self.src, cand, self.edge_grp))
        first = np.empty(self.E, dtype=bool)
        first[0] = True
        g_o = self.edge_grp[order]
        first[1:] = g_o[1:] != g_o[:-1]
        sel = order[np.flatnonzero(first)]
        live = cand[sel] != FLT_SENTINEL
        sel = sel[live]
        dst = self.dst[sel]
        bounds = np.searchsorted(dst % self.P, np.arange(self.P + 1))
        payload = (dst, cand[sel], self.src[sel])
        if self.packed:
            return ("P", bounds) + payload
        return [
            None if bounds[q] == bounds[q + 1]
            else tuple(arr[bounds[q]:bounds[q + 1]] for arr in payload)
            for q in range(self.P)
        ]

    def spath_get_hub_vals(self):
        s = self.state["spath"]
        return self.hub_own_pos, s["dist"][self.hub_own_local]

    def spath_apply(self, *msgs):
        s = self.state["spath"]
        msgs = self._unpack(msgs)
        parts = [m for m in msgs if m is not None and len(m[0])]
        if not parts:
            s["frontier"] = np.zeros(self.nlocal, dtype=bool)
            return 0
        dst = np.concatenate([m[0] for m in parts])
        dist = np.concatenate([m[1] for m in parts])
        pred = np.concatenate([m[2] for m in parts])
        dl = dst // self.P
        order = np.lexsort((pred, dist, dl))
        dl, dist, pred = dl[order], dist[order], pred[order]
        first = np.empty(len(dl), dtype=bool)
        first[0] = True
        first[1:] = dl[1:] != dl[:-1]
        sel = np.flatnonzero(first)
        dl, dist, pred = dl[sel], dist[sel], pred[sel]
        better = dist < s["dist"][dl]
        # equal-distance min-parent tie (determinism across P)
        tie = (dist == s["dist"][dl]) & (pred < s["pred"][dl])
        upd = better | tie
        s["dist"][dl[upd]] = dist[upd]
        s["pred"][dl[upd]] = pred[upd]
        frontier = np.zeros(self.nlocal, dtype=bool)
        frontier[dl[better]] = True
        s["frontier"] = frontier
        return int(better.sum())

    def spath_result(self):
        s = self.state["spath"]
        return self.local_vids(), s["dist"], s["pred"]

    # ------------------------------------------------------------------
    # multi-source SSSP (K sources at once; dist is nlocal × K) — the
    # building block for sssp_average_length's all-pairs sweep
    # (apps/sssp/sssp_average_length.h).
    # ------------------------------------------------------------------

    def msssp_init(self, sources: np.ndarray, unit: bool):
        K = len(sources)
        dist = np.full((self.nlocal, K), FLT_SENTINEL)
        owned = sources % self.P == self.p
        dist[sources[owned] // self.P, np.flatnonzero(owned)] = 0.0
        self.state["msssp"] = {
            "dist": dist, "unit": bool(unit),
            "frontier": np.isfinite(dist).any(axis=1),
        }

    def msssp_scatter(self, *hub_parts):
        hub_vals = self._norm_hub(hub_parts)
        s = self.state["msssp"]
        if self.E == 0:
            return self._empty_msgs()
        dmat = s["dist"][self.src_local]  # E × K (fancy-index copy)
        if len(self.foreign_idx):
            # split hubs: foreign-source rows resolve their K-vector
            # from the per-round (n_hubs × K) broadcast
            if hub_vals is None:
                raise RuntimeError("hub values required but not provided")
            if isinstance(hub_vals, (list, tuple)):
                arr = np.full((len(self.hubs), s["dist"].shape[1]),
                              FLT_SENTINEL)
                for pos, vals in hub_vals:
                    if len(pos):
                        arr[pos] = vals
                hub_vals = arr
            dmat[self.foreign_idx] = hub_vals[self.foreign_hub_pos]
        step = (np.ones(self.E) if (s["unit"] or self.w is None)
                else self.w)[:, None]
        cand = np.where(np.isfinite(dmat), dmat + step, FLT_SENTINEL)
        mins = np.minimum.reduceat(cand, self.grp_start, axis=0)
        live = np.isfinite(mins).any(axis=1)
        if self.packed:
            bounds = np.searchsorted(self.part_of_grp[live],
                                     np.arange(self.P + 1))
            return ("P", bounds, self.uniq_dst[live], mins[live])
        msgs = []
        dstl = self.uniq_dst[live]
        minl = mins[live]
        bounds = np.searchsorted(dstl % self.P, np.arange(self.P + 1))
        for q in range(self.P):
            a, b = bounds[q], bounds[q + 1]
            msgs.append(None if a == b else (dstl[a:b], minl[a:b]))
        return msgs

    def msssp_get_hub_vals(self):
        s = self.state["msssp"]
        return self.hub_own_pos, s["dist"][self.hub_own_local]

    def msssp_apply(self, *msgs):
        s = self.state["msssp"]
        msgs = self._unpack(msgs)
        parts = [m for m in msgs if m is not None and len(m[0])]
        if not parts:
            return 0
        dst = np.concatenate([m[0] for m in parts])
        vals = np.concatenate([m[1] for m in parts], axis=0)
        dl = dst // self.P
        old = s["dist"][dl].copy()
        np.minimum.at(s["dist"], dl, vals)
        changed = (s["dist"][dl] < old).any(axis=1)
        return int(np.unique(dl[changed]).size)

    def msssp_sums(self):
        """(Σ finite dists, count finite, per partition) excluding the
        source-to-self zeros handled driver-side."""
        d = self.state["msssp"]["dist"]
        finite = np.isfinite(d)
        return float(d[finite].sum()), int(finite.sum())

    def msssp_closeness(self):
        """Per-owned-vertex (vids, n_reached, dist_sum) over the
        current multi-source state — the landmark-closeness reduce
        (finite entries only; self-distances contribute 0)."""
        d = self.state["msssp"]["dist"]
        fin = np.isfinite(d)
        return (self.local_vids(), fin.sum(axis=1).astype(np.int64),
                np.where(fin, d, 0.0).sum(axis=1))

    def msssp_harmonic(self):
        """Per-owned-vertex (vids, n_reached, Σ 1/d) over the current
        multi-source state — the landmark-harmonic reduce (finite
        POSITIVE distances only; a landmark's self-distance 0
        contributes nothing, matching nx harmonic_centrality)."""
        d = self.state["msssp"]["dist"]
        pos = np.isfinite(d) & (d > 0)
        inv = np.where(pos, 1.0 / np.where(pos, d, 1.0), 0.0)
        return (self.local_vids(), pos.sum(axis=1).astype(np.int64),
                inv.sum(axis=1))

    # ------------------------------------------------------------------
    # Sampled Brandes betweenness (unit shortest paths from K sources):
    # forward BFS levels + path counts sigma, then level-descending
    # dependency back-propagation. All state is (nlocal x K); hub-split
    # foreign rows resolve (lvl, sigma[, delta]) from per-round packed
    # broadcasts.
    # ------------------------------------------------------------------

    def brandes_init(self, sources: np.ndarray):
        K = len(sources)
        lvl = np.full((self.nlocal, K), -1, dtype=np.int64)
        sig = np.zeros((self.nlocal, K))
        owned = sources % self.P == self.p
        lvl[sources[owned] // self.P, np.flatnonzero(owned)] = 0
        sig[sources[owned] // self.P, np.flatnonzero(owned)] = 1.0
        self.state["brandes"] = {"lvl": lvl, "sig": sig, "delta": None,
                                 "sources": np.asarray(sources)}

    def _brandes_gather(self, names, hub_vals):
        """Edge-source rows of the named (nlocal x K) state matrices,
        with foreign (split-hub) rows resolved from the packed
        (n_hubs x len(names)*K) broadcast."""
        s = self.state["brandes"]
        K = s["sig"].shape[1]
        mats = [s[n][self.src_local].astype(np.float64) for n in names]
        if len(self.foreign_idx):
            if hub_vals is None:
                raise RuntimeError("hub values required but not provided")
            if isinstance(hub_vals, (list, tuple)):
                arr = np.zeros((len(self.hubs), len(names) * K))
                for pos, vals in hub_vals:
                    if len(pos):
                        arr[pos] = vals
                hub_vals = arr
            for i, m in enumerate(mats):
                m[self.foreign_idx] = hub_vals[
                    self.foreign_hub_pos, i * K:(i + 1) * K]
        return mats

    def brandes_fwd_hub_vals(self):
        s = self.state["brandes"]
        return self.hub_own_pos, np.concatenate(
            [s["lvl"][self.hub_own_local].astype(np.float64),
             s["sig"][self.hub_own_local]], axis=1)

    def brandes_fwd_scatter(self, cur_level: int, *hub_parts):
        hub_vals = self._norm_hub(hub_parts)
        if self.E == 0:
            return self._empty_msgs()
        lvl, sig = self._brandes_gather(["lvl", "sig"], hub_vals)
        cand = np.where(lvl == cur_level, sig, 0.0)
        sums = np.add.reduceat(cand, self.grp_start, axis=0)
        live = (sums > 0).any(axis=1)
        if self.packed:
            bounds = np.searchsorted(self.part_of_grp[live],
                                     np.arange(self.P + 1))
            return ("P", bounds, self.uniq_dst[live], sums[live])
        dstl = self.uniq_dst[live]
        suml = sums[live]
        bounds = np.searchsorted(dstl % self.P, np.arange(self.P + 1))
        return [None if bounds[q] == bounds[q + 1] else
                (dstl[bounds[q]:bounds[q + 1]],
                 suml[bounds[q]:bounds[q + 1]])
                for q in range(self.P)]

    def brandes_fwd_apply(self, cur_level: int, *msgs):
        s = self.state["brandes"]
        msgs = self._unpack(msgs)
        parts = [m for m in msgs if m is not None and len(m[0])]
        if not parts:
            return 0
        tmp = np.zeros_like(s["sig"])
        for dst, vals in parts:
            np.add.at(tmp, dst // self.P, vals)
        newly = (s["lvl"] == -1) & (tmp > 0)
        s["sig"][newly] = tmp[newly]
        s["lvl"][newly] = cur_level + 1
        return int(newly.sum())

    def brandes_back_init(self):
        s = self.state["brandes"]
        s["delta"] = np.zeros_like(s["sig"])

    def brandes_back_hub_vals(self):
        s = self.state["brandes"]
        return self.hub_own_pos, np.concatenate(
            [s["lvl"][self.hub_own_local].astype(np.float64),
             s["sig"][self.hub_own_local],
             s["delta"][self.hub_own_local]], axis=1)

    def brandes_back_scatter(self, cur_level: int, *hub_parts):
        hub_vals = self._norm_hub(hub_parts)
        if self.E == 0:
            return self._empty_msgs()
        lvl, sig, delta = self._brandes_gather(
            ["lvl", "sig", "delta"], hub_vals)
        on = lvl == cur_level
        cand = np.zeros_like(sig)
        cand[on] = (1.0 + delta[on]) / sig[on]
        sums = np.add.reduceat(cand, self.grp_start, axis=0)
        live = (sums > 0).any(axis=1)
        if self.packed:
            bounds = np.searchsorted(self.part_of_grp[live],
                                     np.arange(self.P + 1))
            return ("P", bounds, self.uniq_dst[live], sums[live])
        dstl = self.uniq_dst[live]
        suml = sums[live]
        bounds = np.searchsorted(dstl % self.P, np.arange(self.P + 1))
        return [None if bounds[q] == bounds[q + 1] else
                (dstl[bounds[q]:bounds[q + 1]],
                 suml[bounds[q]:bounds[q + 1]])
                for q in range(self.P)]

    def brandes_back_apply(self, cur_level: int, *msgs):
        s = self.state["brandes"]
        msgs = self._unpack(msgs)
        parts = [m for m in msgs if m is not None and len(m[0])]
        if not parts:
            return 0
        tmp = np.zeros_like(s["sig"])
        for dst, vals in parts:
            np.add.at(tmp, dst // self.P, vals)
        pred = s["lvl"] == cur_level - 1
        s["delta"][pred] += tmp[pred] * s["sig"][pred]
        return int(pred.any(axis=1).sum())

    def brandes_max_level(self) -> int:
        lv = self.state["brandes"]["lvl"]
        return int(lv.max(initial=-1))

    def brandes_result(self):
        s = self.state["brandes"]
        delta = s["delta"].copy()
        src = s["sources"]
        owned = src % self.P == self.p
        delta[src[owned] // self.P, np.flatnonzero(owned)] = 0.0
        return self.local_vids(), delta.sum(axis=1)

    # ------------------------------------------------------------------
    # k-core peeling (apps/kcore/kcore.h:31-129): iteratively drop
    # vertices with degree < k; messages are degree decrements.
    # ------------------------------------------------------------------

    def kcore_init(self):
        self.state["kcore"] = {
            "alive": np.ones(self.nlocal, dtype=bool),
            "deg": self.out_deg.astype(np.int64).copy(),
        }

    def kcore_peel_start(self, k: int):
        s = self.state["kcore"]
        doomed = s["alive"] & (s["deg"] < k)
        s["doomed"] = doomed
        return int(doomed.sum())

    def kcore_scatter(self, *hub_parts):
        hub_vals = self._norm_hub(hub_parts)
        s = self.state["kcore"]
        if self.E == 0:
            s["alive"] &= ~s["doomed"]
            return self._empty_msgs()
        removed = s["doomed"][self.src_local].astype(np.float64)
        if len(self.foreign_idx):
            removed[self.foreign_idx] = hub_vals[self.foreign_hub_pos]
        s["alive"] &= ~s["doomed"]
        return self._scatter_sum(removed)

    def kcore_get_hub_vals(self):
        s = self.state["kcore"]
        return self.hub_own_pos, s["doomed"][self.hub_own_local].astype(np.float64)

    def kcore_apply(self, *msgs):
        s = self.state["kcore"]
        dec = self._apply_sum(msgs)
        s["deg"] = s["deg"] - dec.astype(np.int64)
        return 0

    def kcore_result(self):
        return self.local_vids(), self.state["kcore"]["alive"].copy()

    # ------------------------------------------------------------------
    # Weighted-sum power iterations (eigenvector / Katz / HITS halves).
    # state name keyed so HITS can hold two vectors.
    # ------------------------------------------------------------------

    def vec_init(self, name: str, value: float):
        self.state[name] = {"x": np.full(self.nlocal, float(value))}

    def vec_scatter(self, name: str, *hub_parts,
                    direction: Optional[int] = None,
                    use_weight: bool = False):
        hub_vals = self._norm_hub(hub_parts)
        s = self.state[name]
        if self.E == 0:
            return self._empty_msgs()
        vals = self._edge_src_vals(s["x"], hub_vals)
        if use_weight and self.w is not None:
            vals = vals * self.w
        if direction is not None and self.dirs is not None:
            vals = np.where(self.dirs == direction, vals, 0.0)
        return self._scatter_sum(vals)

    def vec_get_hub_vals(self, name: str):
        s = self.state[name]
        return self.hub_own_pos, s["x"][self.hub_own_local]

    def vec_apply(self, name: str, *msgs, alpha: float = 1.0, beta: float = 0.0,
                  scale: float = 1.0, add_self: bool = False, into: Optional[str] = None):
        """x' = alpha·(incoming·scale) + beta [+ x]; writes into state
        ``into`` (default ``name``); returns (Σx', Σx'², max|Δ| vs old)."""
        s = self.state[name]
        inc = self._apply_sum(msgs)
        new = alpha * inc * scale + beta
        if add_self:
            new = new + s["x"]
        delta = float(np.max(np.abs(new - s["x"]))) if self.nlocal else 0.0
        self.state[into or name] = {"x": new}
        return float(new.sum()), float(np.square(new).sum()), delta

    def vec_rescale(self, name: str, factor: float):
        s = self.state[name]
        s["x"] = s["x"] * factor
        return float(np.max(np.abs(s["x"]))) if self.nlocal else 0.0

    def vec_stats(self, name: str):
        x = self.state[name]["x"]
        return float(x.sum()), float(np.square(x).sum()), float(np.abs(x).max(initial=0.0))

    def vec_result(self, name: str):
        return self.local_vids(), self.state[name]["x"]

    def vec_delta_vs(self, name_a: str, name_b: str):
        a, b = self.state[name_a]["x"], self.state[name_b]["x"]
        return float(np.max(np.abs(a - b))) if self.nlocal else 0.0

    def vec_l1_vs(self, name_a: str, name_b: str):
        a, b = self.state[name_a]["x"], self.state[name_b]["x"]
        return float(np.abs(a - b).sum())

    def vec_copy(self, src: str, dst: str):
        self.state[dst] = {"x": self.state[src]["x"].copy()}

    # combined HITS helpers (fewer driver barriers per step)
    def hits_maxes(self):
        h = self.state["hub"]["x"]
        a = self.state["auth"]["x"]
        return (float(h.max(initial=0.0)), float(a.max(initial=0.0)))

    def hits_finish_step(self, scale_h: float, scale_a: float):
        self.state["hub"]["x"] = self.state["hub"]["x"] * scale_h
        self.state["auth"]["x"] = self.state["auth"]["x"] * scale_a
        return float(np.abs(self.state["hub"]["x"]
                            - self.state["hub_last"]["x"]).sum())

    # ------------------------------------------------------------------
    # user vertex programs (graphscope_ray.graph.program) — the
    # vectorized analogue of the reference's Pregel UDF surface
    # (python/graphscope/analytical/udf/decorators.py:116)
    # ------------------------------------------------------------------

    def vp_init(self, program):
        from graphscope_ray.graph.program import ProgramContext

        ctx = ProgramContext(
            part_id=self.p, num_parts=self.P, num_vertices=self.V,
            nlocal=self.nlocal, local_vids=self.local_vids(),
            out_deg=self.out_deg,
        )
        arrays = program.init(ctx)
        # PIE split (SURVEY §2.6 #3): an optional PEval hook runs once
        # per partition before the first superstep (the reference's
        # PEval / IncEval distinction; rounds are IncEval)
        peval = getattr(program, "peval", None)
        if callable(peval):
            from graphscope_ray.graph.program import LocalEdges
            peval(ctx, arrays, LocalEdges(self.src, self.dst, self.w))
        self.state["vp"] = {
            "prog": program, "ctx": ctx,
            "arrays": arrays,
        }

    def vp_scatter(self, rnd: int, *hub_parts):
        hub_vals = self._norm_hub(hub_parts)
        s = self.state["vp"]
        s["ctx"].round = rnd
        vals = s["prog"].message(s["ctx"], s["arrays"])
        if vals is None or self.E == 0:
            return self._empty_msgs()
        edge_vals = self._edge_src_vals(np.asarray(vals, np.float64),
                                        hub_vals)
        if getattr(s["prog"], "use_weight", False):
            # msg = value(src) + w(edge) — sssp_pregel.h:77-82; unit
            # weight on unweighted stores (min-plus BFS); in-place on
            # the reused gather buffer (rewritten next round)
            np.add(edge_vals, self.w if self.w is not None else 1.0,
                   out=edge_vals)
        if s["prog"].combine == "min":
            return self._scatter_min(edge_vals, FLT_SENTINEL)
        return self._scatter_sum(edge_vals)

    def vp_get_hub_vals(self):
        s = self.state["vp"]
        vals = s["prog"].message(s["ctx"], s["arrays"])
        if vals is None:
            vals = np.zeros(self.nlocal)
        return self.hub_own_pos, np.asarray(vals, np.float64)[self.hub_own_local]

    def vp_apply(self, agg, *msgs):
        s = self.state["vp"]
        if s["prog"].combine == "min":
            incoming = self._apply_min(
                np.full(self.nlocal, FLT_SENTINEL), msgs)
        else:
            incoming = self._apply_sum(msgs)
        return s["prog"].apply(s["ctx"], s["arrays"], incoming, agg)

    def vp_result(self):
        s = self.state["vp"]
        cols = {"vid": self.local_vids()}
        for name in s["prog"].result_columns:
            cols[name] = s["arrays"][name]
        return cols

    # ------------------------------------------------------------------
    # partition-walk path sampling (the scale variant of
    # api.sampling_path — apps/sampling_path/sampling_path.h): walkers
    # flow actor→actor as packed blocks keyed by the next vertex's
    # owner; each owner picks the deterministic hash-min successor from
    # its out-adjacency. One-time adjacency exchange reunites hub-split
    # out-edges with their owner.
    # ------------------------------------------------------------------

    def walk_extract(self):
        """Foreign (hub-source) rows shipped to their owners, packed."""
        idx = self.foreign_idx
        src = self.src[idx]
        dst = self.dst[idx]
        part = src % self.P
        order = _part_order(part, self.P)
        src, dst, part = src[order], dst[order], part[order]
        bounds = np.searchsorted(part, np.arange(self.P + 1))
        return ("P", bounds, src, dst)

    def walk_adopt(self, *blocks):
        """Out-CSR over owned sources (local owned rows + received hub
        rows), neighbor lists sorted ascending by dst (the broadcast
        variant's tie order)."""
        msgs = self._unpack(blocks)
        srcs = [self.src[self.owned]]
        dsts = [self.dst[self.owned]]
        for m in msgs:
            if m is not None and len(m[0]):
                srcs.append(m[0])
                dsts.append(m[1])
        s = np.concatenate(srcs)
        d = np.concatenate(dsts)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        sl = s // self.P
        indptr = np.zeros(self.nlocal + 1, dtype=np.int64)
        np.add.at(indptr, sl + 1, 1)
        np.cumsum(indptr, out=indptr)
        self.state["walk"] = {"indptr": indptr, "nbr": d,
                              "out": [], "walkers": None}
        return True

    def walk_seed(self, pids, vids):
        s = self.state["walk"]
        pids = np.asarray(pids, dtype=np.int64)
        vids = np.asarray(vids, dtype=np.int64)
        s["walkers"] = (pids, vids)
        s["out"].append((pids, np.zeros(len(pids), dtype=np.int64), vids))
        return len(pids)

    def walk_step(self, hop: int, seed: int, *blocks):
        """Advance walkers one hop; returns packed (pid, nxt) blocks by
        next owner. Successor rule identical to api.sampling_path."""
        s = self.state["walk"]
        if s["walkers"] is not None:
            pid, cur = s["walkers"]
            s["walkers"] = None
        else:
            msgs = self._unpack(blocks)
            parts = [m for m in msgs if m is not None and len(m[0])]
            if not parts:
                return self._empty_msgs()
            pid = np.concatenate([m[0] for m in parts])
            cur = np.concatenate([m[1] for m in parts])
        if not len(pid):
            return self._empty_msgs()
        local = cur // self.P
        ip, nbr = s["indptr"], s["nbr"]
        starts, ends = ip[local], ip[local + 1]
        cnt = ends - starts
        live = cnt > 0
        pid, cur, starts, cnt = pid[live], cur[live], starts[live], cnt[live]
        tot = int(cnt.sum())
        if tot == 0:
            return self._empty_msgs()
        rep = np.repeat(np.arange(len(pid)), cnt)
        offs = (np.arange(tot, dtype=np.int64)
                - np.repeat(np.cumsum(cnt) - cnt, cnt))
        cand = nbr[starts[rep] + offs]
        from graphscope_ray.data.hashing import walk_hash
        h = walk_hash(cand, pid[rep], hop, seed)
        order = np.lexsort((cand, h, rep))
        first = np.empty(tot, dtype=bool)
        first[0] = True
        ro = rep[order]
        first[1:] = ro[1:] != ro[:-1]
        nxt = cand[order][first]
        s["out"].append((pid, np.full(len(pid), hop, dtype=np.int64), nxt))
        part = nxt % self.P
        order2 = _part_order(part, self.P)
        p_s, n_s, part = pid[order2], nxt[order2], part[order2]
        bounds = np.searchsorted(part, np.arange(self.P + 1))
        return ("P", bounds, p_s, n_s)

    def walk_emissions(self):
        s = self.state["walk"]
        if not s["out"]:
            e = np.array([], dtype=np.int64)
            return e, e.copy(), e.copy()
        pid = np.concatenate([o[0] for o in s["out"]])
        hop = np.concatenate([o[1] for o in s["out"]])
        vid = np.concatenate([o[2] for o in s["out"]])
        return pid, hop, vid

    # ------------------------------------------------------------------
    # Louvain level-0 local-moving sweep (r01 VERDICT #8, r02 VERDICT
    # #8): the weighted community-vote machinery (same shape as
    # cdlp_scatter/apply) with RESIDENT comm/k/tot state per actor —
    # built once per level by lv_init, then only sparse move lists move
    # per half-sweep (no O(V) ray.put per phase). Moves are computed at
    # each destination's owner and returned sparse. Driver:
    # louvain.louvain(engine=...). Assumes the store's dense-vid
    # convention (vid == compact node index).
    # ------------------------------------------------------------------

    def lv_degree_part(self):
        """Weighted degree partials of this partition's rows, grouped
        by (global) src — summed driver-side into the k vector."""
        w = self.w if self.w is not None else np.ones(self.E)
        v, inv = np.unique(self.src, return_inverse=True)
        acc = np.zeros(len(v))
        np.add.at(acc, inv, w)
        return v, acc

    def lv_init(self, k: np.ndarray, m: float):
        """Resident Louvain state: full singleton comm + tot copies
        (tot starts equal to k). One O(V) transfer per LEVEL (k is
        plasma-shared, read zero-copy), not per half-sweep."""
        self.state["lv"] = {
            "comm": np.arange(len(k), dtype=np.int64),
            "k": k,                  # read-only (zero-copy plasma view)
            "tot": k.copy(),
            "m": float(m),
        }

    def lv_apply(self, moves):
        """Apply a sparse move list to the resident state: comm
        reassignments plus incremental community-mass deltas. For
        integer weights the incremental tot equals a bincount recompute
        exactly; for float weights it may differ in the last ulp (the
        same caveat as the distributed vote sums)."""
        s = self.state["lv"]
        mv, mc = moves
        if not len(mv):
            return
        kv = s["k"][mv]
        np.subtract.at(s["tot"], s["comm"][mv], kv)
        np.add.at(s["tot"], mc, kv)
        s["comm"][mv] = mc

    def lv_comm(self):
        return self.state["lv"]["comm"]

    def lv_votes(self):
        """Per-(dst, community-of-src) weight sums of non-self rows,
        packed by dst % P (cdlp_scatter against the resident community
        vector)."""
        if self.E == 0:
            return self._empty_msgs()
        comm = self.state["lv"]["comm"]
        w = self.w if self.w is not None else np.ones(self.E)
        nz = self.src != self.dst
        g = self.edge_grp[nz]
        lab = comm[self.src[nz]]
        ww = w[nz]
        order = np.lexsort((lab, g))
        g_s, l_s, w_s = g[order], lab[order], ww[order]
        if not len(g_s):
            return self._empty_msgs()
        newg = np.empty(len(g_s), dtype=bool)
        newg[0] = True
        newg[1:] = (g_s[1:] != g_s[:-1]) | (l_s[1:] != l_s[:-1])
        starts = np.flatnonzero(newg)
        wsum = np.add.reduceat(w_s, starts)
        gg, ll = g_s[starts], l_s[starts]
        dsts = self.uniq_dst[gg]
        bounds = np.searchsorted(self.part_of_grp[gg],
                                 np.arange(self.P + 1))
        if self.packed:
            return ("P", bounds, dsts, ll, wsum)
        return [None if bounds[q] == bounds[q + 1]
                else (dsts[bounds[q]:bounds[q + 1]],
                      ll[bounds[q]:bounds[q + 1]],
                      wsum[bounds[q]:bounds[q + 1]])
                for q in range(self.P)]

    def lv_moves(self, parity: int, *msgs):
        """Merge vote partials for owned destinations, score candidate
        moves against the RESIDENT comm/k/tot exactly like
        louvain._one_level; returns sparse (vid, new_comm)."""
        s = self.state["lv"]
        comm, k, tot, m = s["comm"], s["k"], s["tot"], s["m"]
        msgs = self._unpack(msgs)
        parts = [mm for mm in msgs if mm is not None and len(mm[0])]
        empty = (np.array([], dtype=np.int64),) * 2
        if not parts:
            return empty
        dst = np.concatenate([mm[0] for mm in parts])
        lab = np.concatenate([mm[1] for mm in parts])
        ws = np.concatenate([mm[2] for mm in parts])
        order = np.lexsort((lab, dst))
        dst, lab, ws = dst[order], lab[order], ws[order]
        newg = np.empty(len(dst), dtype=bool)
        newg[0] = True
        newg[1:] = (dst[1:] != dst[:-1]) | (lab[1:] != lab[:-1])
        starts = np.flatnonzero(newg)
        kvc = np.add.reduceat(ws, starts)
        vv, cc = dst[starts], lab[starts]
        totc = tot[cc] - np.where(cc == comm[vv], k[vv], 0.0)
        score = kvc / m - k[vv] * totc / (2 * m * m)
        sel = (vv % 2) == parity
        vv, cc, score = vv[sel], cc[sel], score[sel]
        if not len(vv):
            return empty
        order = np.lexsort((cc, -score, vv))
        vv, cc, score = vv[order], cc[order], score[order]
        first = np.empty(len(vv), dtype=bool)
        first[0] = True
        first[1:] = vv[1:] != vv[:-1]
        bv, bc, bs = vv[first], cc[first], score[first]
        stay = np.zeros(len(bv))
        stay_rows = cc == comm[vv]
        pos = np.searchsorted(bv, vv[stay_rows])
        stay[pos] = score[stay_rows]
        has_stay = np.zeros(len(bv), dtype=bool)
        has_stay[pos] = True
        no_stay = ~has_stay
        if no_stay.any():
            v0 = bv[no_stay]
            stay[no_stay] = -k[v0] * (tot[comm[v0]] - k[v0]) / (2 * m * m)
        do = (bs > stay + 1e-12) & (bc != comm[bv])
        return bv[do], bc[do]

    def lv_contract_part(self, comm):
        """(comm[src], comm[dst], Σw) partials over ALL local rows."""
        w = self.w if self.w is not None else np.ones(self.E)
        cs = comm[self.src]
        cd = comm[self.dst]
        ncomm = np.int64(comm.max() + 1) if len(comm) else np.int64(1)
        key = cs * ncomm + cd
        uk, inv = np.unique(key, return_inverse=True)
        acc = np.bincount(inv, weights=w)
        return (uk // ncomm).astype(np.int64), (uk % ncomm).astype(np.int64), acc

    # ------------------------------------------------------------------
    # Partition-local triangle counting (apps/clustering/triangles.h:
    # 43-157 re-expressed on the resident actors — r01 VERDICT #4: no
    # driver to_pandas; the oriented CSR lives in the pool).
    #
    # Protocol (driver: engine.BSPEngine.triangles):
    #   tri_deg_part   → (owned vids, undirected degree) slice
    #   tri_ingest     → orient local edges by (deg, vid), ship each
    #                    oriented edge to owner a % P (handles
    #                    hub-split rows whose src is foreign)
    #   tri_adopt      → build oriented CSR (nbr lists sorted by
    #                    orientation rank) + sorted a*V+b key set
    #   tri_wedges     → next ≤chunk wedges (u;v,w), probes (u, key)
    #                    routed to owner v % P
    #   tri_probe      → binary-search closing edges, credit u/v/w in
    #                    a dense per-actor count vector (O(V) per
    #                    worker, like the reference's stage-0 degree
    #                    broadcast)
    #   tri_counts/tri_collect → sparse per-owner count exchange
    # ------------------------------------------------------------------

    def tri_deg_part(self):
        """Undirected degree of owned vertices (symmetrized store:
        degree == global out-degree)."""
        return self.local_vids(), self.out_deg

    def tri_ingest(self, *deg_parts):
        if self.V >= 3_000_000_000:
            raise NotImplementedError(
                "a*V+b probe keys need V < 3e9; use the join path")
        deg = np.zeros(self.V, dtype=np.int64)
        for vids, d in deg_parts:
            if len(vids):
                deg[vids] = d
        self.state["tri_deg"] = deg
        s, d = self.src, self.dst
        # orientation rank: (deg, vid) total order; keep the copy where
        # ord(src) < ord(dst) — exactly one per undirected edge
        fwd = ((deg[s] < deg[d]) | ((deg[s] == deg[d]) & (s < d)))
        a, b = s[fwd], d[fwd]
        part = a % self.P
        order = _part_order(part, self.P)
        a, b, part = a[order], b[order], part[order]
        bounds = np.searchsorted(part, np.arange(self.P + 1))
        return ("P", bounds, a, b)

    def tri_adopt(self, *blocks):
        msgs = self._unpack(blocks)
        parts = [m for m in msgs if m is not None and len(m[0])]
        deg = self.state["tri_deg"]
        if parts:
            a = np.concatenate([m[0] for m in parts])
            b = np.concatenate([m[1] for m in parts])
        else:
            a = np.array([], dtype=np.int64)
            b = np.array([], dtype=np.int64)
        # sort adjacency by (a, orientation-rank of b) so wedge pairs
        # (i < j) satisfy ord(v) < ord(w)
        order = np.lexsort((b, deg[b], a))
        a, b = a[order], b[order]
        al = a // self.P
        indptr = np.zeros(self.nlocal + 1, dtype=np.int64)
        np.add.at(indptr, al + 1, 1)
        np.cumsum(indptr, out=indptr)
        keys = np.sort(a * np.int64(self.V) + b)
        outdeg = np.diff(indptr)
        wc = outdeg * (outdeg - 1) // 2
        self.state["tri"] = {
            "indptr": indptr, "nbr": b, "keys": keys,
            "outdeg": outdeg,
            "wc": wc, "wc_cum": np.cumsum(wc),
            "cursor": 0,  # next wedge (flat index over local sources)
            "credit": np.zeros(self.V, dtype=np.int64),
            # perf counters (seconds inside the two hot methods; read
            # back by tri_stats for the orchestration-overhead split)
            "t_wedge": 0.0, "t_probe": 0.0, "n_probe_rows": 0,
        }
        return int(wc.sum())

    def _tri_enum(self, lo: int, hi: int):
        """Vectorized wedge enumeration for the flat wedge range
        ``[lo, hi)`` over this partition's oriented CSR → ``(u, v, w)``
        with ord(v) < ord(w) — triangular-index inversion, no Python
        loop over wedges."""
        s = self.state["tri"]
        wc_cum = s["wc_cum"]
        # sources overlapping the flat wedge range [lo, hi)
        first = int(np.searchsorted(wc_cum, lo, side="right"))
        last = int(np.searchsorted(wc_cum, hi - 1, side="right"))
        srcs = np.arange(first, last + 1, dtype=np.int64)
        start_w = wc_cum[srcs] - s["wc"][srcs]   # first wedge of src
        take_lo = np.maximum(lo, start_w)
        take_hi = np.minimum(hi, wc_cum[srcs])
        cnt = take_hi - take_lo
        keep = cnt > 0
        srcs, start_w, take_lo, cnt = (srcs[keep], start_w[keep],
                                       take_lo[keep], cnt[keep])
        T = int(cnt.sum())
        if T == 0:
            return None
        src_rep = np.repeat(srcs, cnt)
        k = (np.arange(T, dtype=np.int64)
             - np.repeat(np.cumsum(cnt) - cnt, cnt)
             + np.repeat(take_lo - start_w, cnt))  # pair idx in source
        d = s["outdeg"][src_rep].astype(np.float64)
        # invert triangular index k -> (i, j), 0 <= i < j < d
        i = (d - 2 - np.floor(
            (np.sqrt(4 * d * (d - 1) - 8 * k.astype(np.float64) - 7) - 1)
            / 2)).astype(np.int64)
        j = (k + i + 1 - (d.astype(np.int64) * (d.astype(np.int64) - 1)) // 2
             + ((d.astype(np.int64) - i) * (d.astype(np.int64) - i - 1)) // 2)
        base = s["indptr"][src_rep]
        v = s["nbr"][base + i]
        w = s["nbr"][base + j]
        u = src_rep * self.P + self.p  # local source -> global vid
        return u, v, w

    def tri_wedges(self, chunk: int):
        """Enumerate the next ≤``chunk`` wedges → ``(has_more, block)``
        where block is the packed probe rows (u, key=v*V+w) grouped by
        owner v % P, or None when this call produced nothing. Called
        with ``num_returns=2`` so the DRIVER only ever reads the tiny
        has_more flag — the block object routes actor→actor through
        plasma (the r03 fix: the old single-return protocol made the
        driver ray.get every wedge block and re-ship it by value to
        all P probe actors)."""
        import time as _time
        _t0 = _time.perf_counter()
        s = self.state["tri"]
        total = int(s["wc_cum"][-1]) if len(s["wc_cum"]) else 0
        lo = s["cursor"]
        if lo >= total:
            return False, None
        hi = min(lo + chunk, total)
        s["cursor"] = hi
        has_more = hi < total
        enum = self._tri_enum(lo, hi)
        if enum is None:
            return has_more, None
        u, v, w = enum
        key = v * np.int64(self.V) + w
        part = v % self.P
        order = _part_order(part, self.P)
        u, key, part = u[order], key[order], part[order]
        bounds = np.searchsorted(part, np.arange(self.P + 1))
        s["t_wedge"] += _time.perf_counter() - _t0
        return has_more, ("P", bounds, u, key)

    def tri_keys(self):
        """This partition's sorted oriented-edge key shard (for the
        local-closing fast path — the driver fans the P shard refs back
        to every actor, which merges them once)."""
        return self.state["tri"]["keys"]

    def tri_merge_keys(self, *shards):
        """Merge all P sorted key shards into one sorted global key
        array held locally. O(E_oriented) memory PER ACTOR (per node
        via plasma-shared inputs; the merged copy is private) — the
        driver only takes this route below ``local_keys_limit``; above
        it the routed tri_wedges/tri_probe protocol keeps per-actor
        memory at O(E/P)."""
        parts = [sh for sh in shards if len(sh)]
        gk = (np.concatenate(parts) if parts
              else np.array([], dtype=np.int64))
        gk.sort()
        self.state["tri"]["gkeys"] = gk
        return len(gk)

    def tri_count_local(self, chunk: int = 262_144) -> int:
        """Close ALL of this partition's wedges against the merged
        global key set — zero probe shipping, zero driver rounds. The
        page-fault-aware fast path (r03 profile: tri_wedges was ~99%
        of the 9.7 s clean-window triangles wall, and that time is
        first-touch page faults on ~400 MB of fresh temporaries per
        actor, not CPU): small internal chunks keep the scratch
        high-water mark at ~30×chunk×8 B, faulted once and then reused
        by glibc across the remaining iterations (mallopt in
        graphscope_ray.__init__ pins large blocks to the heap)."""
        import time as _time
        _t0 = _time.perf_counter()
        s = self.state["tri"]
        gk = s["gkeys"]
        total = int(s["wc_cum"][-1]) if len(s["wc_cum"]) else 0
        credit = s["credit"]
        V = np.int64(self.V)
        hits = 0
        small_v = self.V <= 16_000_000
        for lo in range(0, total, chunk):
            enum = self._tri_enum(lo, min(lo + chunk, total))
            if enum is None:
                continue
            u, v, w = enum
            key = v * V + w
            if len(gk):
                pos = np.searchsorted(gk, key)
                pos = np.clip(pos, 0, len(gk) - 1)
                closed = gk[pos] == key
            else:
                closed = np.zeros(len(key), dtype=bool)
            n = int(closed.sum())
            if n:
                corners = np.concatenate(
                    (u[closed], v[closed], w[closed]))
                if small_v:
                    credit += np.bincount(corners, minlength=self.V)
                else:
                    np.add.at(credit, corners, 1)
                hits += n
        s["n_probe_rows"] += total
        s["t_wedge"] += _time.perf_counter() - _t0
        return hits

    def tri_deg_table(self) -> pa.Table:
        """Owned (vid, degree) rows as Arrow (for Dataset-side joins)."""
        return pa.table({"vid": pa.array(self.local_vids()),
                         "degree": pa.array(self.out_deg)})

    def tri_edge_local(self, chunk: int = 262_144) -> pa.Table:
        """Per-EDGE triangle counts for this partition's wedges — the
        link-features kernel. Same local-closing loop (and scratch
        discipline) as ``tri_count_local``, but each closed wedge
        credits its THREE edges, keyed ``min·V + max`` (canonical vid
        order). The accumulator is seeded with this actor's owned
        oriented edges at 0 so zero-triangle edges appear exactly once
        across the pool. Returns a local-partial (key, cnt) table —
        callers sum partials across actors (an increment can land on a
        different owner than the edge's seed)."""
        import time as _time
        _t0 = _time.perf_counter()
        s = self.state["tri"]
        gk = s["gkeys"]
        total = int(s["wc_cum"][-1]) if len(s["wc_cum"]) else 0
        V = np.int64(self.V)
        al = np.repeat(np.arange(self.nlocal, dtype=np.int64),
                       s["outdeg"])
        a = al * self.P + self.p
        b = s["nbr"]
        acc_k = [np.minimum(a, b) * V + np.maximum(a, b)]
        acc_c = [np.zeros(len(b), dtype=np.int64)]
        for lo in range(0, total, chunk):
            enum = self._tri_enum(lo, min(lo + chunk, total))
            if enum is None:
                continue
            u, v, w = enum
            key = v * V + w
            if len(gk):
                pos = np.clip(np.searchsorted(gk, key), 0, len(gk) - 1)
                closed = gk[pos] == key
            else:
                closed = np.zeros(len(key), dtype=bool)
            if closed.any():
                u2, v2, w2 = u[closed], v[closed], w[closed]
                allk = np.concatenate((
                    np.minimum(u2, v2) * V + np.maximum(u2, v2),
                    np.minimum(u2, w2) * V + np.maximum(u2, w2),
                    np.minimum(v2, w2) * V + np.maximum(v2, w2)))
                uk, cc = np.unique(allk, return_counts=True)
                acc_k.append(uk)
                acc_c.append(cc.astype(np.int64))
        k = np.concatenate(acc_k)
        c = np.concatenate(acc_c)
        uk, inv = np.unique(k, return_inverse=True)
        cc = np.bincount(inv, weights=c).astype(np.int64)
        s["t_wedge"] += _time.perf_counter() - _t0
        return pa.table({"key": pa.array(uk), "cnt": pa.array(cc)})

    def tri_probe(self, *blocks):
        """Close wedges against the local key set; credit all three
        corners in the dense per-actor credit vector. Corner credits
        accumulate via one bincount pass when V is small enough that
        the V-length scratch is cheap (bincount streams ~10× faster
        than np.add.at's per-element scatter); huge-V graphs fall back
        to add.at rather than allocating GB-scale scratch per call."""
        import time as _time
        _t0 = _time.perf_counter()
        s = self.state["tri"]
        msgs = self._unpack(blocks)
        parts = [m for m in msgs if m is not None and len(m[0])]
        hits = 0
        corner_blocks = []
        for u, key in parts:
            if not len(key):
                continue
            pos = np.searchsorted(s["keys"], key)
            pos = np.clip(pos, 0, max(0, len(s["keys"]) - 1))
            closed = (s["keys"][pos] == key) if len(s["keys"]) else \
                np.zeros(len(key), dtype=bool)
            if closed.any():
                kc = key[closed]
                corner_blocks.append(u[closed])
                corner_blocks.append(kc // np.int64(self.V))
                corner_blocks.append(kc % np.int64(self.V))
                hits += int(closed.sum())
        if corner_blocks:
            corners = np.concatenate(corner_blocks)
            if self.V <= 16_000_000:
                s["credit"] += np.bincount(corners, minlength=self.V)
            else:
                np.add.at(s["credit"], corners, 1)
        s["t_probe"] += _time.perf_counter() - _t0
        s["n_probe_rows"] += sum(len(m[0]) for m in parts)
        return hits

    def tri_stats(self):
        """Perf counters: seconds spent inside tri_wedges / tri_probe
        on this actor plus probe-row volume (profiling aid)."""
        s = self.state.get("tri", {})
        return {"t_wedge": s.get("t_wedge", 0.0),
                "t_probe": s.get("t_probe", 0.0),
                "n_probe_rows": s.get("n_probe_rows", 0),
                "wedges": int(s["wc"].sum()) if "wc" in s else 0}

    def tri_counts(self):
        """Split the credit vector into sparse per-owner slices."""
        s = self.state["tri"]
        nz = np.flatnonzero(s["credit"])
        vals = s["credit"][nz]
        part = nz % self.P
        order = _part_order(part, self.P)
        nz, vals, part = nz[order], vals[order], part[order]
        bounds = np.searchsorted(part, np.arange(self.P + 1))
        return ("P", bounds, nz, vals)

    def tri_collect(self, *blocks):
        msgs = self._unpack(blocks)
        counts = np.zeros(self.nlocal, dtype=np.int64)
        for m in msgs:
            if m is None or not len(m[0]):
                continue
            vid, val = m
            np.add.at(counts, vid // self.P, val)
        self.state["tri"]["counts"] = counts
        return int(counts.sum())

    def tri_result(self):
        return self.local_vids(), self.state["tri"]["counts"]

    # ------------------------------------------------------------------
    # checkpoint / restore (north rule: per-superstep, per-partition
    # vertex state + lineage; the reference has no mid-computation
    # checkpoint — this is new capability)
    # ------------------------------------------------------------------

    _STATE_KEYS = {
        "pr": ["rank"],
        "wcc": ["label", "frontier"],
        "cdlp": ["label"],
        "sssp": ["dist", "frontier"],
        "kcore": ["alive", "deg"],
    }

    def save_state(self, algo: str, ckpt_dir: str, rnd: int) -> str:
        import pyarrow as pa

        keys = self._STATE_KEYS.get(algo) or ["x"]
        s = self.state[algo]
        cols = {"vid": self.local_vids()}
        for k in keys:
            cols[k] = s[k]
        out_dir = os.path.join(ckpt_dir, f"round={rnd}")
        os.makedirs(out_dir, exist_ok=True)
        fp = os.path.join(out_dir, f"part-{self.p}.parquet")
        tmp = fp + ".tmp"
        pq.write_table(pa.table(cols), tmp)
        os.replace(tmp, fp)
        return fp

    def load_state(self, algo: str, ckpt_dir: str, rnd: int):
        keys = self._STATE_KEYS.get(algo) or ["x"]
        fp = os.path.join(ckpt_dir, f"round={rnd}", f"part-{self.p}.parquet")
        t = pq.read_table(fp)
        s = self.state.setdefault(algo, {})
        for k in keys:
            arr = t[k].to_numpy(zero_copy_only=False)
            s[k] = arr.copy()
        if algo == "pr":
            dangling = self.out_deg == 0
            inv_deg = np.zeros(self.nlocal)
            inv_deg[~dangling] = 1.0 / self.out_deg[~dangling]
            s.setdefault("dangling", dangling)
            s.setdefault("inv_deg", inv_deg)
        return True

    # ------------------------------------------------------------------
    # Minimum spanning forest — distributed Boruvka (extension op; the
    # reference exposes MST through its NetworkX layer only). All state
    # is actor-resident and every exchange is sparse:
    #   * a STATIC halo (component labels of this partition's distinct
    #     edge destinations, request pattern fixed at init — the
    #     classic ghost-vertex exchange, O(boundary) per round);
    #   * per-component candidate mins routed to the component's owner
    #     (comp % P) and min-merged there;
    #   * hook cycle-breaking, pointer jumping, and vertex relabeling
    #     as sharded key→value fetches (owner = key % P).
    # Determinism: edges are totally ordered by (w, min(u,v),
    # max(u,v)), so the forest is THE unique MSF under that order and
    # is partition-count-independent.
    # ------------------------------------------------------------------

    def _msf_route(self, keys: np.ndarray, payload=()):
        """Sort (keys, payload...) by owner = key % P; returns
        (sorted_order, per-owner slices list)."""
        owner = (keys % self.P).astype(np.int64)
        order = np.argsort(owner, kind="stable")
        bounds = np.searchsorted(owner[order], np.arange(self.P + 1))
        sk = keys[order]
        sp = [col[order] for col in payload]
        slices = []
        for q in range(self.P):
            a, b = bounds[q], bounds[q + 1]
            slices.append((sk[a:b],) + tuple(col[a:b] for col in sp))
        return order, slices

    def msf_init(self):
        self.state["msf"] = {
            "comp": self.local_vids().copy(),
            "parent": self.local_vids().copy(),
            "halo": np.zeros(self.G, dtype=np.int64),
            "serve_idx": [np.zeros(0, np.int64)] * self.P,
            "forest_a": [], "forest_b": [], "forest_w": [],
        }
        return True

    def msf_halo_requests(self):
        # per-owner slices of uniq_dst — contiguous in the
        # (dst % P, dst) edge layout, so no sort is needed
        return [self.uniq_dst[self.part_slices[q]:self.part_slices[q + 1]]
                for q in range(self.P)]

    def msf_store_requests(self, *reqs):
        self.state["msf"]["serve_idx"] = [
            np.asarray(r, np.int64) // self.P for r in reqs]
        return True

    def msf_halo_serve(self):
        s = self.state["msf"]
        return [s["comp"][ix] for ix in s["serve_idx"]]

    def msf_halo_apply(self, *slices):
        s = self.state["msf"]
        s["halo"] = np.concatenate(
            [np.asarray(x, np.int64) for x in slices])
        return True

    def msf_candidates(self):
        """Per-component min cross-edge among this partition's owned
        edges, routed to the component owner. Returns P tuples
        (comp, w, a, b, other_comp)."""
        s = self.state["msf"]
        Z = (np.zeros(0, np.int64), np.zeros(0, np.float64),
             np.zeros(0, np.int64), np.zeros(0, np.int64),
             np.zeros(0, np.int64))
        if self.E == 0:
            return [Z] * self.P
        csrc = s["comp"][self.src_local]
        cdst = s["halo"][self.edge_grp]
        idx = np.flatnonzero(csrc != cdst)
        if not len(idx):
            return [Z] * self.P
        w = (self.w[idx] if self.w is not None
             else np.ones(len(idx), np.float64))
        a = np.minimum(self.src[idx], self.dst[idx])
        b = np.maximum(self.src[idx], self.dst[idx])
        c = csrc[idx]
        oc = cdst[idx]
        order = np.lexsort((b, a, w, c))
        c, w, a, b, oc = (c[order], w[order], a[order], b[order],
                          oc[order])
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        first[1:] = c[1:] != c[:-1]
        f = np.flatnonzero(first)
        _, slices = self._msf_route(c[f], (w[f], a[f], b[f], oc[f]))
        return slices

    def msf_merge(self, *slices):
        """Global min per owned component; resets this round's parent
        to identity and records hook target + chosen edge. Returns the
        number of hooked components."""
        s = self.state["msf"]
        s["parent"] = self.local_vids().copy()
        c = np.concatenate([np.asarray(x[0], np.int64) for x in slices])
        target = np.full(self.nlocal, -1, np.int64)
        ca = np.zeros(self.nlocal, np.int64)
        cb = np.zeros(self.nlocal, np.int64)
        cw = np.zeros(self.nlocal, np.float64)
        if len(c):
            w = np.concatenate([np.asarray(x[1], np.float64)
                                for x in slices])
            a = np.concatenate([np.asarray(x[2], np.int64)
                                for x in slices])
            b = np.concatenate([np.asarray(x[3], np.int64)
                                for x in slices])
            oc = np.concatenate([np.asarray(x[4], np.int64)
                                 for x in slices])
            order = np.lexsort((b, a, w, c))
            c, w, a, b, oc = (c[order], w[order], a[order], b[order],
                              oc[order])
            first = np.empty(len(c), dtype=bool)
            first[0] = True
            first[1:] = c[1:] != c[:-1]
            f = np.flatnonzero(first)
            li = c[f] // self.P
            target[li] = oc[f]
            ca[li], cb[li], cw[li] = a[f], b[f], w[f]
        s["target"], s["ca"], s["cb"], s["cw"] = target, ca, cb, cw
        return int((target >= 0).sum())

    def msf_hook_queries(self):
        s = self.state["msf"]
        hooked = np.flatnonzero(s["target"] >= 0)
        keys = s["target"][hooked]
        order, slices = self._msf_route(keys)
        s["hook_idx"] = hooked[order]
        return [x[0] for x in slices]

    def msf_hook_answer(self, *qry):
        s = self.state["msf"]
        return [s["target"][np.asarray(k, np.int64) // self.P]
                for k in qry]

    def msf_hook_apply(self, *answers):
        """Cycle break + hook: mutual-choice pairs (the only cycles a
        deterministic total edge order allows) keep their smaller comp
        as root; every non-root hooked comp contributes exactly its
        chosen edge to the forest (so the mutual pair's edge is added
        once, by the larger comp)."""
        s = self.state["msf"]
        idx = s["hook_idx"]
        if not len(idx):
            return 0
        ans = np.concatenate([np.asarray(x, np.int64) for x in answers])
        cglob = self.p + idx * self.P
        tgt = s["target"][idx]
        root_stay = (ans == cglob) & (cglob < tgt)
        s["parent"][idx] = np.where(root_stay, cglob, tgt)
        add = ~root_stay
        s["forest_a"].append(s["ca"][idx[add]])
        s["forest_b"].append(s["cb"][idx[add]])
        s["forest_w"].append(s["cw"][idx[add]])
        return int(add.sum())

    def msf_jump_queries(self):
        s = self.state["msf"]
        act = np.flatnonzero(s["parent"] != self.local_vids())
        keys = s["parent"][act]
        order, slices = self._msf_route(keys)
        s["jump_idx"] = act[order]
        return [x[0] for x in slices]

    def msf_jump_answer(self, *qry):
        s = self.state["msf"]
        return [s["parent"][np.asarray(k, np.int64) // self.P]
                for k in qry]

    def msf_jump_apply(self, *answers):
        s = self.state["msf"]
        idx = s["jump_idx"]
        if not len(idx):
            return 0
        new = np.concatenate([np.asarray(x, np.int64) for x in answers])
        old = s["parent"][idx]
        s["parent"][idx] = new
        return int((new != old).sum())

    def msf_relabel_queries(self):
        s = self.state["msf"]
        dcomp, inv = np.unique(s["comp"], return_inverse=True)
        s["rel_inv"] = inv
        order, slices = self._msf_route(dcomp)
        s["rel_order"] = order
        return [x[0] for x in slices]

    def msf_relabel_answer(self, *qry):
        s = self.state["msf"]
        return [s["parent"][np.asarray(k, np.int64) // self.P]
                for k in qry]

    def msf_relabel_apply(self, *answers):
        s = self.state["msf"]
        roots_sorted = np.concatenate(
            [np.asarray(x, np.int64) for x in answers])
        roots = np.empty(len(roots_sorted), np.int64)
        roots[s["rel_order"]] = roots_sorted
        s["comp"] = roots[s["rel_inv"]] if len(roots) else s["comp"]
        return True

    def msf_result(self):
        s = self.state["msf"]
        cat = (lambda lst, dt: np.concatenate(lst).astype(dt)
               if lst else np.zeros(0, dt))
        return {"src": cat(s["forest_a"], np.int64),
                "dst": cat(s["forest_b"], np.int64),
                "weight": cat(s["forest_w"], np.float64)}

    # ------------------------------------------------------------------
    # Greedy maximal matching — locally-dominant edge matching (Preis
    # 1999 / Manne-Bisseling 2007 shape; extension op — the reference
    # exposes matching through its NetworkX layer only). Under the
    # total edge order (w, fmix64(pack(a, b)), a, b) the locally-dominant
    # fixpoint IS the sequential greedy matching, so the result is
    # unique and partition-count-independent. Per round: ghost-exchange
    # the alive flags of edge destinations (static request pattern,
    # O(boundary)), each alive vertex proposes its minimum incident
    # edge to an alive neighbor, one sharded fetch reads the proposal
    # of every proposal target, and mutual pairs marry (the smaller
    # endpoint emits the edge). The globally minimal alive-alive edge
    # is always mutual, so progress is guaranteed while any alive pair
    # remains. Nothing O(V) lands on the driver.
    # ------------------------------------------------------------------

    def mm_init(self):
        self.state["mm"] = {
            "alive": np.ones(self.nlocal, dtype=bool),
            "mate": np.full(self.nlocal, -1, np.int64),
            "halo": np.ones(self.G, dtype=bool),
            "serve_idx": [np.zeros(0, np.int64)] * self.P,
            "match_a": [], "match_b": [], "match_w": [],
        }
        return True

    def mm_halo_requests(self):
        return [self.uniq_dst[self.part_slices[q]:self.part_slices[q + 1]]
                for q in range(self.P)]

    def mm_store_requests(self, *reqs):
        self.state["mm"]["serve_idx"] = [
            np.asarray(r, np.int64) // self.P for r in reqs]
        return True

    def mm_halo_serve(self):
        s = self.state["mm"]
        return [s["alive"][ix] for ix in s["serve_idx"]]

    def mm_halo_apply(self, *slices):
        self.state["mm"]["halo"] = np.concatenate(
            [np.asarray(x, bool) for x in slices])
        return True

    def mm_propose(self):
        """Per alive owned vertex: min incident edge to an alive
        neighbor under (w, a, b). Stores the proposal target (global
        vid) + chosen edge; returns the number of proposals."""
        from graphscope_ray.data.hashing import fmix64
        s = self.state["mm"]
        prop = np.full(self.nlocal, -1, np.int64)
        prop_a = np.zeros(self.nlocal, np.int64)
        prop_b = np.zeros(self.nlocal, np.int64)
        pw = np.zeros(self.nlocal, np.float64)
        if self.E:
            ok = s["alive"][self.src_local] & s["halo"][self.edge_grp]
            idx = np.flatnonzero(ok)
            if len(idx):
                w = (self.w[idx] if self.w is not None
                     else np.ones(len(idx), np.float64))
                a = np.minimum(self.src[idx], self.dst[idx])
                b = np.maximum(self.src[idx], self.dst[idx])
                # tie-break by fmix64 of the packed pair, not by
                # (a, b): with heavy weight ties a raw-id order makes
                # every vertex propose to the lowest id (≈1 match per
                # round on tied cliques); the hash spreads proposals
                # so the mutual rate behaves like random weights
                # (O(log n) expected rounds). Still a total order —
                # the fixpoint is still THE greedy matching under
                # (w, h, a, b). vids are dense sorted-oid ranks, so
                # the SQL twin replays h over row_number ranks.
                h = fmix64((a.astype(np.uint64) << np.uint64(32))
                           | b.astype(np.uint64))
                u = self.src_local[idx]
                order = np.lexsort((b, a, h, w, u))
                us = u[order]
                first = np.empty(len(us), dtype=bool)
                first[0] = True
                first[1:] = us[1:] != us[:-1]
                f = order[np.flatnonzero(first)]
                ul = self.src_local[idx[f]]
                prop[ul] = self.dst[idx[f]]
                prop_a[ul] = np.minimum(self.src[idx[f]], self.dst[idx[f]])
                prop_b[ul] = np.maximum(self.src[idx[f]], self.dst[idx[f]])
                pw[ul] = (self.w[idx[f]] if self.w is not None
                          else 1.0)
        s["prop"], s["pa"], s["pb"], s["pw"] = prop, prop_a, prop_b, pw
        return int((prop >= 0).sum())

    def mm_match_queries(self):
        s = self.state["mm"]
        proposing = np.flatnonzero(s["prop"] >= 0)
        keys = s["prop"][proposing]
        order, slices = self._msf_route(keys)
        s["prop_idx"] = proposing[order]
        return [x[0] for x in slices]

    def mm_match_answer(self, *qry):
        s = self.state["mm"]
        return [s["prop"][np.asarray(k, np.int64) // self.P]
                for k in qry]

    def mm_match_apply(self, *answers):
        """Mutual proposals marry: both endpoints die, the smaller
        (vid-order) endpoint emits the matched edge once."""
        s = self.state["mm"]
        idx = s["prop_idx"]
        if not len(idx):
            return 0
        ans = np.concatenate([np.asarray(x, np.int64) for x in answers])
        uglob = self.p + idx * self.P
        mutual = ans == uglob
        mi = idx[mutual]
        s["alive"][mi] = False
        s["mate"][mi] = s["prop"][mi]
        emit = mi[uglob[mutual] < s["prop"][mi]]
        s["match_a"].append(s["pa"][emit])
        s["match_b"].append(s["pb"][emit])
        s["match_w"].append(s["pw"][emit])
        return int(mutual.sum())

    def mm_result(self):
        s = self.state["mm"]
        cat = (lambda lst, dt: np.concatenate(lst).astype(dt)
               if lst else np.zeros(0, dt))
        return {"src": cat(s["match_a"], np.int64),
                "dst": cat(s["match_b"], np.int64),
                "weight": cat(s["match_w"], np.float64)}

    def mm_mates(self):
        """Per owned vertex: matched partner vid (-1 = unmatched)."""
        s = self.state["mm"]
        return {"vid": self.local_vids(), "mate": s["mate"]}

    def pr_warm_init(self):
        """PageRank warm start after ``append_edges``: recompute the
        degree-derived arrays (out_deg changed) but KEEP the converged
        rank vector — power iteration from a near-fixpoint needs far
        fewer supersteps to re-converge, and the fixpoint is unique so
        the result equals a cold recompute at the same tolerance.
        Falls back to pr_init when no prior PageRank state exists."""
        s = self.state.get("pr")
        if not s or "rank" not in s:
            cnt = self.pr_init()
            return cnt, cnt / self.V  # uniform ranks → mass = cnt/V
        dangling = self.out_deg == 0
        inv_deg = np.zeros(self.nlocal)
        nz = ~dangling
        inv_deg[nz] = 1.0 / self.out_deg[nz]
        s["dangling"] = dangling
        s["inv_deg"] = inv_deg
        return int(dangling.sum()), float(s["rank"][dangling].sum())
