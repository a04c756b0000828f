"""BSP superstep driver over a pool of GraphPartition actors.

Replicates the reference's worker loop (PEval / IncEval supersteps with
MPI messaging until quiescence — ``/root/reference/analytical_engine/
core/grape_instance.cc:200-222`` + grape's BSP worker) with Ray actors:

- one ``GraphPartition`` actor per partition (resident CSR-style state,
  like the reference's fragment held in vineyard across app runs);
- per superstep the driver launches ``scatter`` on every actor with
  ``num_returns=P`` → a P×P matrix of ObjectRefs of *pre-combined*
  message blocks; it then routes column ``p`` of the matrix into actor
  ``p``'s ``apply``. Message payloads move actor→actor through the
  object store; the driver only touches refs and tiny metric scalars;
- global scalars (dangling sum, convergence deltas, changed counts)
  are reduced driver-side — the analogue of ``grape::Communicator::Sum``
  (``benchmarks/apps/pagerank/pagerank.h:125,192``);
- split-hub source values are gathered from their owners and broadcast
  once per round via a single ``ray.put`` (skew mitigation, SURVEY §4);
- optional per-superstep checkpointing: per-partition Parquet +
  atomically written ``lineage.json`` (round, metrics, scalars, files)
  so a killed run resumes from the last complete superstep.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

from graphscope_ray.graph.build import GraphStore
from graphscope_ray.graph.partition import GraphPartition


@ray.remote
def _pair_to_table(pair, name: str, dtype=None) -> pa.Table:
    vids, vals = pair
    if dtype is not None:
        vals = vals.astype(dtype)
    return pa.table({"vid": pa.array(vids), name: pa.array(vals)})


@ray.remote
def _closeness_table(trip, round_to: int = 6) -> pa.Table:
    from graphscope_ray.util import round_half_away
    vids, cnt, sm = trip
    clo = np.zeros(len(vids))
    nz = sm > 0
    clo[nz] = cnt[nz] / sm[nz]
    return pa.table({"vid": pa.array(vids),
                     "reached": pa.array(cnt),
                     "dist_sum": pa.array(round_half_away(sm, round_to)),
                     "closeness": pa.array(round_half_away(clo, round_to))})


@ray.remote
def _harmonic_table(trip, round_to: int = 6) -> pa.Table:
    from graphscope_ray.util import round_half_away
    vids, cnt, hs = trip
    return pa.table({"vid": pa.array(vids),
                     "reached": pa.array(cnt),
                     "harmonic": pa.array(round_half_away(hs, round_to))})


@ray.remote
def _nth(lst, i):
    return lst[i]


@ray.remote
def _dict_table(cols: dict) -> pa.Table:
    return pa.table({k: pa.array(v) for k, v in cols.items()})


@ray.remote
def _spath_table(triple) -> pa.Table:
    vids, dist, pred = triple
    return pa.table({"vid": pa.array(vids), "dist": pa.array(dist),
                     "pred": pa.array(pred)})


@ray.remote
def _two_col_table(pair_a, pair_b, name_a: str, name_b: str) -> pa.Table:
    vids, a = pair_a
    _, b = pair_b
    return pa.table({"vid": pa.array(vids), name_a: pa.array(a),
                     name_b: pa.array(b)})


@ray.remote
def _walk_table(triple) -> pa.Table:
    pid, hop, vid = triple
    return pa.table({"path_id": pa.array(pid), "hop": pa.array(hop),
                     "vid": pa.array(vid)})


@ray.remote
def _shell_table(core_k, core_k1) -> pa.Table:
    vids, a = core_k
    _, b = core_k1
    return pa.table({"vid": pa.array(vids), "in_shell": pa.array(a & ~b)})


class Lineage:
    """Atomic per-run lineage file: which supersteps completed, their
    metrics and driver-side scalars. Resume scans for the max complete
    round."""

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = ckpt_dir
        self.path = os.path.join(ckpt_dir, "lineage.json")
        self.doc = {"rounds": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.doc = json.load(f)

    def record(self, rnd: int, files, metrics: dict, scalars: dict):
        self.doc["rounds"][str(rnd)] = {
            "files": list(files),
            "metrics": metrics,
            "scalars": scalars,
            "ts": time.time(),
        }
        tmp = self.path + ".tmp"
        os.makedirs(self.ckpt_dir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(self.doc, f)
        os.replace(tmp, self.path)

    def set_header(self, **kw):
        self.doc.update(kw)

    def last_round(self) -> Optional[int]:
        rounds = [int(r) for r in self.doc["rounds"]]
        return max(rounds) if rounds else None

    def scalars(self, rnd: int) -> dict:
        return self.doc["rounds"][str(rnd)]["scalars"]


def _default_actor_cpus(P: int) -> float:
    """Reserve deliberately little: the pool must be fully schedulable
    (or the BSP barrier blocks forever) and CPUs must stay free for
    Ray Data stages and other engines. Reservation ≠ usage — during a
    superstep all P actor processes compute regardless of the
    fractional claim."""
    avail = ray.cluster_resources().get("CPU", P)
    return min(0.25, max(0.05, avail / (4.0 * P)))


def prespawn_partitions(P: int,
                        num_cpus_per_actor: Optional[float] = None
                        ) -> list:
    """Spawn P EMPTY GraphPartition shells so the actor process forks
    + module imports (the measured ~2 s pool-warm slice of a fresh
    build, at any parallelism) overlap earlier pipeline stages; hand
    the list to ``BSPEngine(..., prespawned=...)`` which fills them
    via ``load_store``. Returns immediately — nothing is waited on."""
    if num_cpus_per_actor is None:
        num_cpus_per_actor = _default_actor_cpus(P)
    actor_cls = ray.remote(num_cpus=num_cpus_per_actor)(GraphPartition)
    return [actor_cls.remote() for _ in range(P)]


class BSPEngine:
    def __init__(self, store: "GraphStore | str",
                 *, num_cpus_per_actor: Optional[float] = None,
                 msg_mode: str = "packed", prespawned=None):
        if isinstance(store, str):
            store = GraphStore(store)
        self.store = store
        self.P = store.num_parts
        self.V = store.num_vertices
        if num_cpus_per_actor is None:
            num_cpus_per_actor = _default_actor_cpus(self.P)
        self.has_hubs = len(store.meta["hubs"]) > 0
        self.n_hubs = len(store.meta["hubs"])
        self.msg_mode = msg_mode
        # freshly built stores hand their exchange refs straight to
        # the pool (no parquet re-read); opened stores load from disk
        erefs = getattr(store, "edge_refs", None) or [None] * self.P
        drefs = getattr(store, "deg_refs", None) or [None] * self.P
        if prespawned is not None and len(prespawned) >= self.P:
            self.actors = list(prespawned[:self.P])
            for a in prespawned[self.P:]:  # over-provisioned shells
                ray.kill(a)
            loads = [
                self.actors[p].load_store.remote(
                    store.path, p, erefs[p], drefs[p])
                for p in range(self.P)
            ]
        else:
            if prespawned:  # fewer shells than partitions: discard
                for a in prespawned:
                    ray.kill(a)
            actor_cls = ray.remote(
                num_cpus=num_cpus_per_actor)(GraphPartition)
            self.actors = [
                actor_cls.remote(store.path, p, erefs[p], drefs[p])
                for p in range(self.P)
            ]
            loads = []
        # force construction errors to surface now + set message mode
        ray.get(loads + [a.set_packed.remote(self.msg_mode == "packed")
                         for a in self.actors])
        self.superstep_seconds = 0.0
        self.supersteps = 0
        # vids deleted in-place (MODIFY_VERTICES); per-vertex results
        # filter these out. Driver-held: deletion lists are
        # caller-supplied and small relative to V by assumption.
        self.removed_vids = np.array([], dtype=np.int64)

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []

    # -- plumbing ------------------------------------------------------

    def _hub_ref(self, method: str, margs=()):
        """Gather split-hub owners' values → one broadcast array ref.
        Values may be per-hub scalars (1-D) or per-hub vectors (2-D,
        e.g. the msssp K-source distance rows); every hub position has
        exactly one owner, so all rows get written."""
        if not self.has_hubs:
            return None
        parts = ray.get([getattr(a, method).remote(*margs) for a in self.actors])
        first = next((v for p, v in parts if len(p)), None)
        shape = ((self.n_hubs,) if first is None or first.ndim == 1
                 else (self.n_hubs,) + first.shape[1:])
        arr = np.zeros(shape)
        for pos, vals in parts:
            if len(pos):
                arr[pos] = vals
        return ray.put(arr)

    def _exchange(self, scatter: str, apply_: str, scatter_args=(),
                  apply_args=(), hub_method: Optional[str] = None,
                  hub_args=(), scatter_kwargs=None, apply_kwargs=None):
        """One superstep: scatter on all actors, route, apply. Returns
        the list of apply results (one per partition)."""
        hub_ref = self._hub_ref(hub_method, hub_args) if hub_method else None
        sargs = tuple(scatter_args) + ((hub_ref,) if hub_method else ())
        skw = scatter_kwargs or {}
        akw = apply_kwargs or {}
        if self.msg_mode == "packed":
            # One object per source actor holding all P destination
            # slices; receivers read the shared plasma buffer and take
            # their slice (partition.GraphPartition._unpack). P objects
            # per round instead of P² — the right trade locally and on
            # small clusters; "sliced" ships only each destination's
            # slice and is the per-node-locality mode for large
            # clusters.
            packed = [getattr(a, scatter).remote(*sargs, **skw)
                      for a in self.actors]
            results = [
                getattr(self.actors[p], apply_).remote(
                    *apply_args, *packed, **akw)
                for p in range(self.P)
            ]
            return ray.get(results)
        if self.P == 1:
            # num_returns=1 would wrap the whole list; unwrap explicitly
            matrix = [
                [_nth.remote(getattr(a, scatter).remote(*sargs, **skw), 0)]
                for a in self.actors
            ]
        else:
            matrix = [
                getattr(a, scatter).options(num_returns=self.P).remote(
                    *sargs, **skw)
                for a in self.actors
            ]
        results = [
            getattr(self.actors[p], apply_).remote(
                *apply_args, *[matrix[q][p] for q in range(self.P)], **akw
            )
            for p in range(self.P)
        ]
        return ray.get(results)

    def _finish_ds(self, tables) -> ray.data.Dataset:
        """Assemble per-partition result tables; drop rows for vids
        deleted by remove_vertices (per-vertex result surfaces only)."""
        ds = ray.data.from_arrow_refs(tables)
        if len(self.removed_vids):
            removed = np.sort(self.removed_vids)

            def drop(t: pa.Table) -> pa.Table:
                vid = t["vid"].to_numpy()
                pos = np.clip(np.searchsorted(removed, vid),
                              0, len(removed) - 1)
                return t.filter(~(removed[pos] == vid))

            ds = ds.map_batches(drop, batch_format="pyarrow")
        return ds

    def _result_ds(self, method: str, name: str, args=(), dtype=None) -> ray.data.Dataset:
        pairs = [getattr(a, method).remote(*args) for a in self.actors]
        tables = [_pair_to_table.remote(pr, name, dtype) for pr in pairs]
        return self._finish_ds(tables)

    def _maybe_checkpoint(self, algo, lineage, ckpt_dir, every, rnd, metrics, scalars):
        if lineage is None or every is None or rnd % every != 0:
            return
        files = ray.get(
            [a.save_state.remote(algo, ckpt_dir, rnd) for a in self.actors]
        )
        lineage.record(rnd, files, metrics, scalars)

    # -- PageRank ------------------------------------------------------

    def pagerank(
        self,
        delta: float = 0.85,
        max_round: int = 10,
        tol: Optional[float] = None,
        max_iter: int = 1000,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: Optional[int] = None,
        resume: bool = False,
    ) -> ray.data.Dataset:
        """Reference-exact PageRank (SURVEY.md §2.2); ``tol=None`` runs
        exactly ``max_round`` rounds (golden-match mode), ``tol`` set
        runs to ``max|Δr| < tol`` (the benchmark's convergence mode)."""
        lineage = Lineage(checkpoint_dir) if checkpoint_dir else None
        start_round = 0
        if resume and lineage is not None and lineage.last_round() is not None:
            start_round = lineage.last_round()
            ray.get(
                [a.load_state.remote("pr", checkpoint_dir, start_round)
                 for a in self.actors]
            )
            sc = lineage.scalars(start_round)
            dangling_vnum = sc["dangling_vnum"]
            dangling_sum = sc["dangling_sum"]
        else:
            counts = ray.get([a.pr_init.remote() for a in self.actors])
            dangling_vnum = int(sum(counts))
            dangling_sum = dangling_vnum / self.V
            if lineage is not None:
                lineage.set_header(algo="pagerank", delta=delta, V=self.V,
                                   P=self.P, tol=tol, max_round=max_round)

        limit = max_iter if tol is not None else max_round
        rnd = start_round
        t0 = time.perf_counter()
        if tol is None and checkpoint_every is None and not self.has_hubs:
            # Fixed-round fast path: the dangling-sum sequence is a
            # closed-form recurrence, so every round's `base` is known
            # up front — submit ALL rounds as ONE fused apply+scatter
            # task per actor per round, no driver round-trips (actor
            # FIFO ordering preserves BSP semantics); single final
            # barrier.
            bases = []
            while rnd < limit:
                rnd += 1
                base = (1.0 - delta) / self.V + delta * dangling_sum / self.V
                bases.append(base)
                dangling_sum = base * dangling_vnum
            packed = [a.pr_step.remote(None, delta) for a in self.actors]
            for base in bases[:-1]:
                packed = [
                    self.actors[p].pr_step.remote(base, delta, *packed)
                    for p in range(self.P)
                ]
            if bases:
                ray.get([
                    self.actors[p].pr_apply.remote(bases[-1], delta, *packed)
                    for p in range(self.P)
                ])
        elif tol is None and checkpoint_every is None:
            # hub-split variant: per-round hub gather rides the pipeline
            last_deltas = None
            while rnd < limit:
                rnd += 1
                base = (1.0 - delta) / self.V + delta * dangling_sum / self.V
                hub_parts = [a.pr_get_hub_vals.remote() for a in self.actors]
                packed = [a.pr_scatter.remote(*hub_parts)
                          for a in self.actors]
                last_deltas = [
                    self.actors[p].pr_apply.remote(base, delta, *packed)
                    for p in range(self.P)
                ]
                dangling_sum = base * dangling_vnum
            if last_deltas is not None:
                ray.get(last_deltas)
        elif checkpoint_every is None and self.msg_mode == "packed":
            # Tol mode with the convergence barrier OVERLAPPED
            # (r04 VERDICT ask #3): round k+1's hub gather + scatter
            # are READ-ONLY w.r.t. actor state, so they are submitted
            # speculatively right after round k's applies — actor FIFO
            # ordering runs them after the applies — and execute WHILE
            # the driver reduces round k's convergence scalar. On
            # convergence the in-flight scatter outputs are simply
            # dropped (state untouched → results bit-identical to the
            # barriered loop; cost = one wasted scatter).
            packed = None
            while rnd < limit:
                rnd += 1
                base = (1.0 - delta) / self.V + delta * dangling_sum / self.V
                if packed is None:  # first round: no messages yet
                    hub_parts = ([a.pr_get_hub_vals.remote()
                                  for a in self.actors]
                                 if self.has_hubs else [])
                    packed = [a.pr_scatter.remote(*hub_parts)
                              for a in self.actors]
                md_refs = [
                    self.actors[p].pr_apply.remote(base, delta, *packed)
                    for p in range(self.P)
                ]
                hub_parts = ([a.pr_get_hub_vals.remote()
                              for a in self.actors]
                             if self.has_hubs else [])
                packed = [a.pr_scatter.remote(*hub_parts)
                          for a in self.actors]
                dangling_sum = base * dangling_vnum
                max_delta = max(ray.get(md_refs))
                if tol is not None and max_delta < tol:
                    break
        else:
            while rnd < limit:
                rnd += 1
                base = (1.0 - delta) / self.V + delta * dangling_sum / self.V
                deltas = self._exchange(
                    "pr_scatter", "pr_apply", apply_args=(base, delta),
                    hub_method="pr_get_hub_vals" if self.has_hubs else None,
                )
                dangling_sum = base * dangling_vnum
                max_delta = max(deltas)
                self._maybe_checkpoint(
                    "pr", lineage, checkpoint_dir, checkpoint_every, rnd,
                    {"max_delta": max_delta},
                    {"dangling_sum": dangling_sum,
                     "dangling_vnum": dangling_vnum, "delta": delta},
                )
                if tol is not None and max_delta < tol:
                    break
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rnd - start_round
        return self._result_ds("pr_result", "rank")

    def pagerank_incremental(self, *, delta: float = 0.85,
                             tol: float = 1e-6, max_iter: int = 1000
                             ) -> ray.data.Dataset:
        """Resume PageRank after ``append_edges`` — the PR member of
        the incremental family (sssp_incremental / wcc_incremental):
        power iteration warm-starts from the previous converged ranks
        with freshly recomputed degree arrays (pr_warm_init); the
        fixpoint is unique, so the result equals a cold recompute at
        the same tolerance, in far fewer supersteps (the warm vector
        is already near the new fixpoint). The first round's dangling
        mass is the WARM Σ rank over dangling vertices (not the
        uniform vnum/V); after one application the closed-form
        recurrence resumes. Falls back to a cold run when no prior
        PageRank state exists."""
        res = ray.get([a.pr_warm_init.remote() for a in self.actors])
        dangling_vnum = int(sum(r[0] for r in res))
        dangling_sum = float(sum(r[1] for r in res))
        rnd = 0
        t0 = time.perf_counter()
        while rnd < max_iter:
            rnd += 1
            base = (1.0 - delta) / self.V + delta * dangling_sum / self.V
            deltas = self._exchange(
                "pr_scatter", "pr_apply", apply_args=(base, delta),
                hub_method="pr_get_hub_vals" if self.has_hubs else None,
            )
            dangling_sum = base * dangling_vnum
            if max(deltas) < tol:
                break
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rnd
        return self._result_ds("pr_result", "rank")

    def ppr(self, seeds, *, delta: float = 0.85, max_round: int = 10,
            tol: Optional[float] = None, max_iter: int = 1000
            ) -> ray.data.Dataset:
        """Personalized PageRank from a seed set: ``r = (1−δ)·e_S +
        δ·Aᵀ r`` with a uniform restart over ``seeds``; dangling
        out-mass is dropped (both oracle sides share the convention).
        Not a reference app — the GLE-adjacent seed-biased relevance
        op; same superstep exchange as PageRank (pr_scatter reused)."""
        seeds = np.asarray(list(seeds), dtype=np.int64)
        if not len(seeds):
            raise ValueError("ppr needs at least one seed")
        ray.get([a.ppr_init.remote(seeds, len(seeds), delta)
                 for a in self.actors])
        limit = max_iter if tol is not None else max_round
        rnd = 0
        t0 = time.perf_counter()
        while rnd < limit:
            rnd += 1
            deltas = self._exchange(
                "pr_scatter", "ppr_apply", apply_args=(delta,),
                hub_method="pr_get_hub_vals" if self.has_hubs else None,
            )
            if tol is not None and max(deltas) < tol:
                break
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rnd
        return self._result_ds("pr_result", "rank")

    # -- WCC -----------------------------------------------------------

    def wcc(
        self,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: Optional[int] = None,
        resume: bool = False,
        max_iter: int = 10_000,
    ) -> ray.data.Dataset:
        lineage = Lineage(checkpoint_dir) if checkpoint_dir else None
        start_round = 0
        if resume and lineage is not None and lineage.last_round() is not None:
            start_round = lineage.last_round()
            ray.get([a.load_state.remote("wcc", checkpoint_dir, start_round)
                     for a in self.actors])
        else:
            ray.get([a.wcc_init.remote() for a in self.actors])
            if lineage is not None:
                lineage.set_header(algo="wcc", V=self.V, P=self.P)
        rnd = start_round
        t0 = time.perf_counter()
        while rnd < max_iter:
            rnd += 1
            changed = self._exchange(
                "wcc_scatter", "wcc_apply",
                hub_method="wcc_get_hub_vals" if self.has_hubs else None,
            )
            total = int(sum(changed))
            self._maybe_checkpoint("wcc", lineage, checkpoint_dir,
                                   checkpoint_every, rnd,
                                   {"changed": total}, {})
            if total == 0:
                break
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rnd - start_round
        return self._result_ds("wcc_result", "comp")

    # -- CDLP / weighted LPA -------------------------------------------

    def cdlp(
        self,
        max_round: int = 10,
        weighted: bool = False,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: Optional[int] = None,
        resume: bool = False,
    ) -> ray.data.Dataset:
        lineage = Lineage(checkpoint_dir) if checkpoint_dir else None
        start_round = 0
        if resume and lineage is not None and lineage.last_round() is not None:
            start_round = lineage.last_round()
            ray.get([a.load_state.remote("cdlp", checkpoint_dir, start_round)
                     for a in self.actors])
            ray.get([a.cdlp_set_weighted.remote(weighted) for a in self.actors])
        else:
            ray.get([a.cdlp_init.remote(weighted) for a in self.actors])
            if lineage is not None:
                lineage.set_header(algo="cdlp", V=self.V, P=self.P,
                                   weighted=weighted, max_round=max_round)
        t0 = time.perf_counter()
        if checkpoint_every is None:
            # fixed-round pipelined submission (no per-round scalars)
            last = None
            for rnd in range(start_round + 1, max_round + 1):
                if self.has_hubs:
                    hub_parts = [a.cdlp_get_hub_vals.remote()
                                 for a in self.actors]
                    packed = [a.cdlp_scatter.remote(*hub_parts)
                              for a in self.actors]
                else:
                    packed = [a.cdlp_scatter.remote() for a in self.actors]
                last = [self.actors[p].cdlp_apply.remote(*packed)
                        for p in range(self.P)]
            if last is not None:
                ray.get(last)
        else:
            for rnd in range(start_round + 1, max_round + 1):
                changed = self._exchange(
                    "cdlp_scatter", "cdlp_apply",
                    hub_method="cdlp_get_hub_vals" if self.has_hubs else None,
                )
                self._maybe_checkpoint("cdlp", lineage, checkpoint_dir,
                                       checkpoint_every, rnd,
                                       {"changed": int(sum(changed))}, {})
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += max_round - start_round
        return self._result_ds("cdlp_result", "label")

    # -- SSSP / BFS ----------------------------------------------------

    def sssp(self, source: int, *, unit: bool = False,
             max_iter: int = 100_000) -> ray.data.Dataset:
        ray.get([a.sssp_init.remote(int(source), unit) for a in self.actors])
        rnd = 0
        t0 = time.perf_counter()
        while rnd < max_iter:
            rnd += 1
            changed = self._exchange(
                "sssp_scatter", "sssp_apply",
                hub_method="sssp_get_hub_vals" if self.has_hubs else None,
            )
            if int(sum(changed)) == 0:
                break
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rnd
        return self._result_ds("sssp_result", "dist")

    def append_edges(self, edges: ray.data.Dataset,
                     weight_col: Optional[str] = None) -> np.ndarray:
        """Append-only edge mutation (the reference's
        append_only_arrow_fragment surface): rows route to their layout
        partition (hub sources keep the (src+dst) % P spread), degree
        increments route to each source's owner. Streams the delta
        batch-by-batch — only one batch at a time touches the driver.
        Returns the unique appended source vids (the incremental-SSSP
        seed set)."""
        hubs = self.store.hubs
        seeds = []
        cols = ["src", "dst"] + ([weight_col] if weight_col else [])
        for t in edges.select_columns(cols).iter_batches(
                batch_format="pyarrow"):
            src = t["src"].to_numpy().astype(np.int64, copy=False)
            dst = t["dst"].to_numpy().astype(np.int64, copy=False)
            w = (t[weight_col].to_numpy().astype(np.float64, copy=False)
                 if weight_col else None)
            if len(hubs):
                pos = np.clip(np.searchsorted(hubs, src), 0, len(hubs) - 1)
                is_hub = hubs[pos] == src
                part = np.where(is_hub, (src + dst) % self.P,
                                src % self.P)
            else:
                part = src % self.P
            calls = []
            for p in range(self.P):
                m = part == p
                if m.any():
                    calls.append(self.actors[p].append_rows.remote(
                        src[m], dst[m], w[m] if w is not None else None))
            dvids, dcnt = np.unique(src, return_counts=True)
            owner = dvids % self.P
            for p in range(self.P):
                m = owner == p
                if m.any():
                    calls.append(self.actors[p].add_out_deg.remote(
                        dvids[m], dcnt[m]))
            ray.get(calls)
            seeds.append(dvids)
        return (np.unique(np.concatenate(seeds)) if seeds
                else np.array([], dtype=np.int64))

    def sssp_incremental(self, seed_vids, *, max_iter: int = 100_000
                         ) -> ray.data.Dataset:
        """Resume a previously computed SSSP after append_edges —
        apps/property/sssp_property_append.h: relaxation restarts only
        from the appended edges' (already-reached) sources instead of
        from scratch."""
        ray.get([a.sssp_seed.remote(np.asarray(seed_vids, dtype=np.int64))
                 for a in self.actors])
        rnd = 0
        t0 = time.perf_counter()
        while rnd < max_iter:
            rnd += 1
            changed = self._exchange(
                "sssp_scatter", "sssp_apply",
                hub_method="sssp_get_hub_vals" if self.has_hubs else None,
            )
            if int(sum(changed)) == 0:
                break
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rnd
        return self._result_ds("sssp_result", "dist")

    def wcc_incremental(self, seed_vids, *, max_iter: int = 10_000
                        ) -> ray.data.Dataset:
        """Resume a previously computed WCC after append_edges.
        Min-label propagation is monotone under edge insertion, so
        warm-starting from the carried-over labels with the appended
        endpoints as the frontier reaches the full-recompute fixpoint
        — only the merged components' vertices ever re-exchange (the
        WCC analogue of apps/property/sssp_property_append.h)."""
        ray.get([a.wcc_seed.remote(np.asarray(seed_vids, dtype=np.int64))
                 for a in self.actors])
        rnd = 0
        t0 = time.perf_counter()
        while rnd < max_iter:
            rnd += 1
            changed = self._exchange(
                "wcc_scatter", "wcc_apply",
                hub_method="wcc_get_hub_vals" if self.has_hubs else None,
            )
            if int(sum(changed)) == 0:
                break
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rnd
        return self._result_ds("wcc_result", "comp")

    # -- full dynamic mutation (MODIFY_EDGES / MODIFY_VERTICES) --------
    #
    # The reference's DynamicFragment surface (core/fragment/
    # dynamic_fragment.h:220-233, dispatched by grape_instance.cc:
    # 247-296): edge delete/update and vertex insert/delete/update,
    # in place on the resident pool. Deletion pairs route to their
    # layout partition exactly like append_edges; per-vertex results
    # after remove_vertices exclude the deleted ids.

    def _layout_parts(self, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
        """Partition that stores edge (src, dst) under the build
        layout: src % P, except hub sources spread over (src+dst) % P."""
        hubs = self.store.hubs
        if len(hubs):
            pos = np.clip(np.searchsorted(hubs, src), 0, len(hubs) - 1)
            is_hub = hubs[pos] == src
            return np.where(is_hub, (src + dst) % self.P, src % self.P)
        return src % self.P

    def _apply_deg_deltas(self, removed_pairs, sign: int = -1):
        """Combine (vids, counts) slices from a mutation round and
        route the (signed) degree deltas to each vertex's owner."""
        parts = [r for r in removed_pairs if len(r[0])]
        if not parts:
            return 0
        dv = np.concatenate([r[0] for r in parts])
        dc = np.concatenate([r[1] for r in parts])
        u, inv = np.unique(dv, return_inverse=True)
        cnt = np.bincount(inv, weights=dc).astype(np.int64)
        owner = u % self.P
        calls = []
        for p in range(self.P):
            m = owner == p
            if m.any():
                calls.append(self.actors[p].add_out_deg.remote(
                    u[m], sign * cnt[m]))
        ray.get(calls)
        return int(cnt.sum())

    def remove_edges(self, edges: ray.data.Dataset) -> int:
        """Delete (src, dst) vid pairs in place (every stored copy;
        missing pairs are silent no-ops, NetworkX-style). Streams the
        deletion set batch-by-batch; degrees decrement at each source's
        owner by the actually-removed counts. Returns rows removed."""
        total = 0
        for t in edges.select_columns(["src", "dst"]).iter_batches(
                batch_format="pyarrow"):
            src = t["src"].to_numpy().astype(np.int64, copy=False)
            dst = t["dst"].to_numpy().astype(np.int64, copy=False)
            part = self._layout_parts(src, dst)
            refs = []
            for p in range(self.P):
                m = part == p
                if m.any():
                    refs.append(self.actors[p].remove_rows.remote(
                        src[m], dst[m]))
            total += self._apply_deg_deltas(ray.get(refs))
        return total

    def update_edge_weights(self, edges: ray.data.Dataset,
                            weight_col: str = "weight") -> int:
        """Overwrite the weight of existing (src, dst) vid pairs in
        place (MODIFY_EDGES update; missing pairs are no-ops). Returns
        the number of layout rows updated."""
        total = 0
        for t in edges.select_columns(["src", "dst", weight_col]
                                      ).iter_batches(batch_format="pyarrow"):
            src = t["src"].to_numpy().astype(np.int64, copy=False)
            dst = t["dst"].to_numpy().astype(np.int64, copy=False)
            w = t[weight_col].to_numpy().astype(np.float64, copy=False)
            part = self._layout_parts(src, dst)
            refs = []
            for p in range(self.P):
                m = part == p
                if m.any():
                    refs.append(self.actors[p].update_rows_weight.remote(
                        src[m], dst[m], w[m]))
            total += sum(ray.get(refs))
        return total

    def remove_vertices(self, vids) -> int:
        """Delete vertices in place: every incident edge goes (full
        per-partition scan — the reference walks adjacency the same
        way), degrees fix up at the surviving sources' owners, and the
        ids are excluded from subsequent per-vertex results. The vid
        space itself is unchanged (dense ids keep their rank meaning).
        Returns the number of edges removed."""
        vids = np.unique(np.asarray(vids, dtype=np.int64))
        if not len(vids):
            return 0
        removed = ray.get([a.remove_incident.remote(vids)
                           for a in self.actors])
        n = self._apply_deg_deltas(removed)
        self.removed_vids = np.union1d(self.removed_vids, vids)
        return n

    def clear_edges(self) -> None:
        """CLEAR_EDGES: drop every edge, zero all degrees."""
        ray.get([a.clear_edges.remote() for a in self.actors])

    def add_vertices(self, n_new: int) -> int:
        """MODIFY_VERTICES insert: extend the vertex space by ``n_new``
        isolated vids (V..V+n_new-1, arrival order — see
        GraphPartition.grow_vertices for the id-invariant caveat).
        Returns the new V."""
        ray.get([a.grow_vertices.remote(int(n_new)) for a in self.actors])
        self.V = int(self.V + n_new)
        return self.V

    def set_vertex_values(self, name: str, vids, vals) -> None:
        """MODIFY_VERTICES update: sparse overwrite of a named vertex
        state vector at its owners (state must exist, e.g. vec_init)."""
        vids = np.asarray(vids, dtype=np.int64)
        vals = np.asarray(vals, dtype=np.float64)
        ray.get([a.vec_set.remote(name, vids, vals) for a in self.actors])

    def bfs(self, source: int, **kw) -> ray.data.Dataset:
        ds = self.sssp(source, unit=True, **kw)

        def to_depth(t: pa.Table) -> pa.Table:
            d = t["dist"].to_numpy()
            depth = np.where(np.isfinite(d), d, -1.0).astype(np.int64)
            return pa.table({"vid": t["vid"], "depth": pa.array(depth)})

        return ds.map_batches(to_depth, batch_format="pyarrow")

    def sssp_path(self, source: int, *, unit: bool = False,
                  max_iter: int = 100_000) -> ray.data.Dataset:
        """SSSP with predecessors — apps/sssp/sssp_path.h (output rows
        (vid, dist, pred); pred = -1 when unreachable)."""
        ray.get([a.spath_init.remote(int(source), unit)
                 for a in self.actors])
        rnd = 0
        t0 = time.perf_counter()
        while rnd < max_iter:
            rnd += 1
            changed = self._exchange(
                "spath_scatter", "spath_apply",
                hub_method="spath_get_hub_vals" if self.has_hubs else None,
            )
            if int(sum(changed)) == 0:
                break
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rnd
        pairs = [a.spath_result.remote() for a in self.actors]
        tables = [_spath_table.remote(pr) for pr in pairs]
        return self._finish_ds(tables)

    def sssp_has_path(self, source: int, target: int, **kw) -> bool:
        """apps/sssp/sssp_has_path.h — reachability via the dist map."""
        ds = self.sssp(source, unit=True, **kw)
        import pyarrow.compute as pc

        def pick(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["vid"], target))

        rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
        return bool(rows) and np.isfinite(rows[0]["dist"])

    def sssp_average_length(self, *, unit: bool = False, batch_k: int = 64,
                            max_sources: Optional[int] = None,
                            max_iter: int = 10_000) -> float:
        """Average shortest-path length over all (source, target) pairs
        with finite distance — apps/sssp/sssp_average_length.h ("time
        consuming" in the reference too). Runs multi-source sweeps of
        ``batch_k`` sources; ``max_sources`` subsamples deterministically
        (first k vids) for large graphs."""
        sources = np.arange(self.V, dtype=np.int64)
        if max_sources is not None:
            sources = sources[:max_sources]
        total, count = 0.0, 0
        t0 = time.perf_counter()
        for i in range(0, len(sources), batch_k):
            batch = sources[i: i + batch_k]
            ray.get([a.msssp_init.remote(batch, unit) for a in self.actors])
            rnd = 0
            hub = "msssp_get_hub_vals" if self.has_hubs else None
            while rnd < max_iter:
                rnd += 1
                changed = self._exchange("msssp_scatter", "msssp_apply",
                                         hub_method=hub)
                if int(sum(changed)) == 0:
                    break
            self.supersteps += rnd
            sums = ray.get([a.msssp_sums.remote() for a in self.actors])
            total += sum(s[0] for s in sums)
            count += sum(s[1] for s in sums)
        self.superstep_seconds += time.perf_counter() - t0
        # finite self-distances (the diagonal zeros) are excluded
        count -= len(sources)
        return total / count if count > 0 else 0.0

    def closeness_landmarks(self, landmarks=None, *, k: int = 3,
                            unit: bool = True, max_iter: int = 10_000
                            ) -> ray.data.Dataset:
        """Landmark (pivot) closeness centrality: one multi-source
        sweep from ``landmarks`` (default: the k smallest vids — the
        ppr seed convention), then per vertex
        ``closeness = n_landmarks_reached / Σ finite dist`` (0 when no
        positive distance mass). The classic scalable approximation of
        closeness (Indyk pivoting); exact closeness is all-pairs and
        intentionally not offered as a driver surface.

        Shape: the msssp superstep exchange (O(distinct dst) combined
        messages per round) + ONE per-partition vectorized reduce —
        the (V × k) distance matrix never leaves its owners."""
        self._msssp_sweep(landmarks, k, unit, max_iter, "closeness")
        trips = [a.msssp_closeness.remote() for a in self.actors]
        return self._finish_ds([_closeness_table.remote(t) for t in trips])

    def harmonic_landmarks(self, landmarks=None, *, k: int = 3,
                           unit: bool = True, max_iter: int = 10_000
                           ) -> ray.data.Dataset:
        """Landmark harmonic centrality: the same multi-source sweep
        as :meth:`closeness_landmarks`, reduced to per vertex
        ``Σ_{landmarks at finite positive distance} 1/dist`` —
        harmonic centrality's sampled/pivot form (Boldi & Vigna 2014;
        nx ``harmonic_centrality`` restricted to the landmark set).
        Harmonic handles disconnected graphs gracefully (unreachable
        landmarks contribute 0 instead of poisoning the mean), which
        is exactly the regime where closeness degrades.

        Shape: identical to closeness — msssp superstep exchange +
        ONE per-partition vectorized reduce; the (V × k) distance
        matrix never leaves its owners."""
        self._msssp_sweep(landmarks, k, unit, max_iter, "harmonic")
        trips = [a.msssp_harmonic.remote() for a in self.actors]
        return self._finish_ds([_harmonic_table.remote(t) for t in trips])

    def _msssp_sweep(self, landmarks, k, unit, max_iter, what):
        if landmarks is None:
            landmarks = np.arange(min(k, self.V), dtype=np.int64)
        landmarks = np.asarray(list(landmarks), dtype=np.int64)
        if not len(landmarks):
            raise ValueError(f"{what} needs at least one landmark")
        ray.get([a.msssp_init.remote(landmarks, unit)
                 for a in self.actors])
        rnd = 0
        t0 = time.perf_counter()
        hub = "msssp_get_hub_vals" if self.has_hubs else None
        while rnd < max_iter:
            rnd += 1
            changed = self._exchange("msssp_scatter", "msssp_apply",
                                     hub_method=hub)
            if int(sum(changed)) == 0:
                break
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rnd

    def betweenness_sources(self, sources=None, *, k: int = 3,
                            max_iter: int = 10_000) -> ray.data.Dataset:
        """Sampled Brandes betweenness over unit shortest paths:
        forward multi-source BFS accumulating path counts sigma, then
        level-descending dependency back-propagation; result is the
        per-vertex dependency sum over the source sample (Brandes
        2001 / Brandes-Pich pivot sampling — exact betweenness is V
        BFS sweeps and intentionally not a driver surface; sources
        default to the k smallest vids).

        Shape: the same (V x K)-state superstep exchange as msssp —
        pre-combined per-destination sums per round, per-round packed
        hub broadcasts of (lvl, sigma[, delta]) for split hubs, one
        per-partition reduce at the end."""
        if sources is None:
            sources = np.arange(min(k, self.V), dtype=np.int64)
        sources = np.asarray(list(sources), dtype=np.int64)
        if not len(sources):
            raise ValueError("betweenness needs at least one source")
        ray.get([a.brandes_init.remote(sources) for a in self.actors])
        hub_f = "brandes_fwd_hub_vals" if self.has_hubs else None
        hub_b = "brandes_back_hub_vals" if self.has_hubs else None
        t0 = time.perf_counter()
        rnd = 0
        level = 0
        while rnd < max_iter:
            rnd += 1
            changed = self._exchange(
                "brandes_fwd_scatter", "brandes_fwd_apply",
                scatter_args=(level,), apply_args=(level,),
                hub_method=hub_f)
            if int(sum(changed)) == 0:
                break
            level += 1
        max_lv = max(ray.get(
            [a.brandes_max_level.remote() for a in self.actors]))
        ray.get([a.brandes_back_init.remote() for a in self.actors])
        for lv in range(max_lv, 0, -1):
            rnd += 1
            self._exchange(
                "brandes_back_scatter", "brandes_back_apply",
                scatter_args=(lv,), apply_args=(lv,), hub_method=hub_b)
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rnd
        return self._result_ds("brandes_result", "betweenness")

    def bfs_generic(self, source: int, *, output_format: str = "edges",
                    depth_limit: Optional[int] = None) -> ray.data.Dataset:
        """BFS tree outputs — apps/bfs/bfs_generic.h:36-199: formats
        'edges' (pred → node), 'predecessors' (node, pred),
        'successors' (node, succ)."""
        ds = self.sssp_path(source, unit=True,
                            max_iter=depth_limit or 100_000)

        def fmt(t: pa.Table) -> pa.Table:
            vid = t["vid"].to_numpy()
            dist = t["dist"].to_numpy()
            pred = t["pred"].to_numpy()
            keep = np.isfinite(dist) & (vid != source)
            if depth_limit is not None:
                keep &= dist <= depth_limit
            vid, pred = vid[keep], pred[keep]
            if output_format == "edges":
                return pa.table({"src": pa.array(pred), "dst": pa.array(vid)})
            if output_format == "predecessors":
                return pa.table({"node": pa.array(vid),
                                 "predecessor": pa.array(pred)})
            if output_format == "successors":
                return pa.table({"node": pa.array(pred),
                                 "successor": pa.array(vid)})
            raise ValueError(output_format)

        return ds.map_batches(fmt, batch_format="pyarrow")

    # -- k-core / k-shell ---------------------------------------------

    def _peel_to(self, k: int, max_iter: int = 100_000):
        rnd = 0
        while rnd < max_iter:
            rnd += 1
            doomed = ray.get(
                [a.kcore_peel_start.remote(k) for a in self.actors]
            )
            if int(sum(doomed)) == 0:
                break
            self._exchange(
                "kcore_scatter", "kcore_apply",
                hub_method="kcore_get_hub_vals" if self.has_hubs else None,
            )
        self.supersteps += rnd

    def scc(self, *, max_outer: int = 200, max_prop: int = 100_000,
            trim: bool = True) -> ray.data.Dataset:
        """Strongly connected components — FW-BW-Trim coloring on the
        BSP actors (extension op; the reference exposes SCC through its
        NetworkX layer). Per outer round: (1) Trim — deactivate active
        vertices with zero active in- OR out-degree (singleton SCCs,
        the web-graph tendril killer) to fixpoint; (2) forward min-color
        propagation to fixpoint over the remaining active subgraph;
        (3) roots (color == own vid) start a backward BFS along
        reversed edges restricted to their own color class — everything
        reached is exactly the root's SCC (color r ⇒ r reaches v; the
        restricted backward path ⇒ v reaches r). Each round finalizes
        every root SCC, so rounds ≤ #SCCs on the longest condensation
        chain that Trim can't shorten. Requires directions='both'.
        Returns (vid, scc_id) with scc_id = min member vid."""
        if self.has_hubs:
            raise NotImplementedError(
                "scc: hub-split stores not wired (build without "
                "hub_threshold)")
        if not self.store.meta.get("has_dir"):
            raise ValueError("scc needs build_graph(directions='both')")
        ray.get([a.scc_init.remote() for a in self.actors])
        t0 = time.perf_counter()
        rounds = 0
        remaining = self.V
        for _outer in range(max_outer):
            if trim:
                while True:
                    rounds += 1
                    self._exchange("scc_trim_scatter", "scc_trim_apply",
                                   scatter_args=(0,), apply_args=("t_in",))
                    self._exchange("scc_trim_scatter", "scc_trim_apply",
                                   scatter_args=(1,), apply_args=("t_out",))
                    ntrim = sum(ray.get([a.scc_trim_finish.remote()
                                         for a in self.actors]))
                    if ntrim == 0:
                        break
            for _ in range(max_prop):
                rounds += 1
                if sum(self._exchange("scc_fwd_scatter",
                                      "scc_fwd_apply")) == 0:
                    break
            nroots = sum(ray.get([a.scc_mark_roots.remote()
                                  for a in self.actors]))
            if nroots:
                for _ in range(max_prop):
                    rounds += 1
                    if sum(self._exchange("scc_bwd_scatter",
                                          "scc_bwd_apply")) == 0:
                        break
            remaining = sum(ray.get([a.scc_finalize_round.remote()
                                     for a in self.actors]))
            if remaining == 0:
                break
        if remaining:
            raise RuntimeError(
                f"scc: {remaining} vertices unresolved after "
                f"{max_outer} outer rounds")
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rounds
        return self._result_ds("scc_result", "scc_id")

    def msf(self, *, max_round: int = 64,
            max_jump: int = 10_000) -> ray.data.Dataset:
        """Minimum spanning forest — distributed Boruvka on the BSP
        actors (extension op; the reference exposes minimum spanning
        trees only through its NetworkX layer). Edges carry the total
        order (w, min(u,v), max(u,v)), so the forest is unique and
        partition-count-independent; on unweighted stores w = 1 and
        the result is a (lexicographically least) spanning forest.

        Per Boruvka round: halo-refresh component labels of edge
        destinations (static ghost pattern, O(boundary)); per-component
        min cross-edge locally, min-merged on the component's owner;
        hook + 2-cycle break (one sharded fetch); pointer jumping to
        the hook-forest roots (O(log chain) sharded fetches); vertex
        relabel (one sharded fetch keyed by distinct component).
        Rounds ≤ ceil(log2 V) since components at least halve. Nothing
        O(V) ever lands on the driver; forest edges accumulate on
        their owners and stream out as the result Dataset. Requires a
        symmetrized store (build with symmetrize=True)."""
        if self.has_hubs:
            raise NotImplementedError(
                "msf: hub-split stores not wired (build without "
                "hub_threshold)")
        if self.store.meta.get("has_dir"):
            raise ValueError("msf needs a symmetrized store "
                             "(from_edges(..., symmetrize=True))")
        actors = self.actors
        P = self.P

        def matrix(method, argcols=None):
            out = []
            for i, a in enumerate(actors):
                args = argcols[i] if argcols is not None else ()
                if P == 1:
                    r = getattr(a, method).remote(*args)
                    out.append([_nth.remote(r, 0)])
                else:
                    out.append(getattr(a, method)
                               .options(num_returns=P).remote(*args))
            return out

        def col(m, p):
            return [m[q][p] for q in range(P)]

        ray.get([a.msf_init.remote() for a in actors])
        reqs = matrix("msf_halo_requests")
        ray.get([actors[q].msf_store_requests.remote(*col(reqs, q))
                 for q in range(P)])
        t0 = time.perf_counter()
        rounds = 0
        done = False
        for _ in range(max_round):
            rounds += 1
            serv = matrix("msf_halo_serve")
            ray.get([actors[p].msf_halo_apply.remote(*col(serv, p))
                     for p in range(P)])
            cand = matrix("msf_candidates")
            hooked = ray.get([actors[q].msf_merge.remote(*col(cand, q))
                              for q in range(P)])
            if sum(hooked) == 0:
                done = True
                break
            hq = matrix("msf_hook_queries")
            ha = matrix("msf_hook_answer",
                        [col(hq, q) for q in range(P)])
            ray.get([actors[p].msf_hook_apply.remote(*col(ha, p))
                     for p in range(P)])
            for _j in range(max_jump):
                rounds += 1
                jq = matrix("msf_jump_queries")
                ja = matrix("msf_jump_answer",
                            [col(jq, q) for q in range(P)])
                ch = ray.get([actors[p].msf_jump_apply.remote(
                    *col(ja, p)) for p in range(P)])
                if sum(ch) == 0:
                    break
            else:
                raise RuntimeError("msf: pointer jumping did not "
                                   "converge")
            rq = matrix("msf_relabel_queries")
            ra = matrix("msf_relabel_answer",
                        [col(rq, q) for q in range(P)])
            ray.get([actors[p].msf_relabel_apply.remote(*col(ra, p))
                     for p in range(P)])
        if not done:
            raise RuntimeError(
                f"msf did not converge in {max_round} rounds")
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rounds
        refs = [a.msf_result.remote() for a in actors]
        tables = [_dict_table.remote(r) for r in refs]
        return ray.data.from_arrow_refs(tables)

    def matching(self, *, max_round: int = 512,
                 mates: bool = False) -> ray.data.Dataset:
        """Greedy maximal matching — locally-dominant edges under the
        total order (w, fmix64(pack(a, b)), a, b) (extension op; the
        reference exposes matching through its NetworkX layer only).
        The fixpoint equals the sequential greedy matching, so the
        result is unique and partition-count-independent. Per round:
        one ghost exchange of alive flags (static pattern), a local
        vectorized min-incident-edge proposal, one sharded
        proposal-of-target fetch; mutual pairs marry. The globally
        minimal alive-alive edge is always mutual, so every round
        makes progress; rounds are graph-dependent (≤ longest
        monotone augmenting chain — O(log n) expected on random
        graphs, O(n) worst-case paths, hence the generous cap).
        Returns matched edges (src, dst, weight) with src < dst in vid
        order; with ``mates=True`` returns per-vertex (vid, mate)
        instead (-1 = unmatched). Requires a symmetrized store."""
        if self.has_hubs:
            raise NotImplementedError(
                "matching: hub-split stores not wired (build without "
                "hub_threshold)")
        if self.store.meta.get("has_dir"):
            raise ValueError("matching needs a symmetrized store "
                             "(from_edges(..., symmetrize=True))")
        actors = self.actors
        P = self.P

        def matrix(method, argcols=None):
            out = []
            for i, a in enumerate(actors):
                args = argcols[i] if argcols is not None else ()
                if P == 1:
                    r = getattr(a, method).remote(*args)
                    out.append([_nth.remote(r, 0)])
                else:
                    out.append(getattr(a, method)
                               .options(num_returns=P).remote(*args))
            return out

        def col(m, p):
            return [m[q][p] for q in range(P)]

        ray.get([a.mm_init.remote() for a in actors])
        reqs = matrix("mm_halo_requests")
        ray.get([actors[q].mm_store_requests.remote(*col(reqs, q))
                 for q in range(P)])
        t0 = time.perf_counter()
        rounds = 0
        done = False
        for _ in range(max_round):
            rounds += 1
            serv = matrix("mm_halo_serve")
            ray.get([actors[p].mm_halo_apply.remote(*col(serv, p))
                     for p in range(P)])
            n_prop = ray.get([a.mm_propose.remote() for a in actors])
            if sum(n_prop) == 0:
                done = True
                break
            mq = matrix("mm_match_queries")
            ma = matrix("mm_match_answer",
                        [col(mq, q) for q in range(P)])
            n_match = ray.get([actors[p].mm_match_apply.remote(
                *col(ma, p)) for p in range(P)])
            if sum(n_match) == 0:
                raise RuntimeError(
                    "matching: proposals without a mutual pair — "
                    "total-order invariant violated")
        if not done:
            raise RuntimeError(
                f"matching did not converge in {max_round} rounds")
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rounds
        method = "mm_mates" if mates else "mm_result"
        refs = [getattr(a, method).remote() for a in actors]
        tables = [_dict_table.remote(r) for r in refs]
        return ray.data.from_arrow_refs(tables)

    def kcore(self, k: int) -> ray.data.Dataset:
        ray.get([a.kcore_init.remote() for a in self.actors])
        t0 = time.perf_counter()
        self._peel_to(k)
        self.superstep_seconds += time.perf_counter() - t0
        return self._result_ds("kcore_result", "in_core")

    # -- partition-walk path sampling ----------------------------------

    def sampling_path(self, roots, *, length: int = 3, seed: int = 42
                      ) -> ray.data.Dataset:
        """Deterministic path sampling on the resident actors — the
        scale variant of api.sampling_path (identical successor rule,
        verified equal in tests): walkers move actor→actor per hop as
        packed blocks, no broadcast CSR, no O(E) driver traffic."""
        t0 = time.perf_counter()
        ext = [a.walk_extract.remote() for a in self.actors]
        ray.get([a.walk_adopt.remote(*ext) for a in self.actors])
        roots = np.asarray(list(roots), dtype=np.int64)
        pids = np.arange(len(roots), dtype=np.int64)
        owner = roots % self.P
        ray.get([
            self.actors[p].walk_seed.remote(pids[owner == p],
                                            roots[owner == p])
            for p in range(self.P)
        ])
        blocks = [a.walk_step.remote(1, seed) for a in self.actors]
        for hop in range(2, length + 1):
            blocks = [a.walk_step.remote(hop, seed, *blocks)
                      for a in self.actors]
        ray.get(blocks)
        self.superstep_seconds += time.perf_counter() - t0
        cols = [a.walk_emissions.remote() for a in self.actors]
        tables = [_walk_table.remote(c) for c in cols]
        return ray.data.from_arrow_refs(tables)

    # -- triangles (partition-local oriented CSR) ----------------------

    def triangles(self, *, chunk: Optional[int] = None,
                  local_keys_limit: int = 64_000_000,
                  local_chunk: int = 262_144) -> ray.data.Dataset:
        """Per-vertex triangle counts on the resident actor pool —
        apps/clustering/triangles.h:43-157 (degree-ordered orientation,
        adjacency intersection via sorted-key probes). No driver-side
        edge materialization. Two routes, auto-picked by oriented edge
        count:

        * **local closing** (≤ ``local_keys_limit`` oriented edges):
          every actor merges the P sorted key shards once (O(E) per
          actor — the shard refs themselves are plasma-shared per
          node) and closes its own wedges with zero probe shipping and
          zero driver rounds. This is the page-fault-aware path: the
          r03 profile showed the routed loop's wall was ~99% first-touch
          faults on per-chunk temporaries + plasma probe blocks.
        * **routed probes** (above the limit): oriented edges shipped
          actor→actor once, wedges enumerated in ``chunk``-bounded
          rounds, probes routed to the closing edge's owner — per-actor
          memory stays O(E/P); this is the 100×-scale shape.

        Requires a symmetrized store (undirected degree == out-degree).
        """
        if not self.store.meta.get("symmetrized"):
            raise ValueError("triangles needs build_graph(symmetrize=True)")
        t0 = time.perf_counter()
        deg_parts = [a.tri_deg_part.remote() for a in self.actors]
        blocks = [a.tri_ingest.remote(*deg_parts) for a in self.actors]
        wedge_counts = ray.get(
            [a.tri_adopt.remote(*blocks) for a in self.actors])
        if chunk is None:
            # adaptive routed-path chunk: small enough that the
            # per-chunk scratch is faulted once and reused from the
            # worker heap (cold A/B at sf0.1: 50 s at 1.5M vs 1.8 s at
            # 262k), large enough to bound the driver loop to ~64
            # rounds at any scale
            chunk = min(4_000_000,
                        max(262_144,
                            max(wedge_counts, default=0) // 64 + 1))
        oriented_e = self.store.meta["num_edges"] // 2
        if oriented_e <= local_keys_limit:
            key_refs = [a.tri_keys.remote() for a in self.actors]
            ray.get([a.tri_merge_keys.remote(*key_refs)
                     for a in self.actors])
            ray.get([a.tri_count_local.remote(local_chunk)
                     for a in self.actors])
        else:
            # probes only ACCUMULATE into per-actor credit vectors, so
            # rounds need no ordering: submit the next wedge chunk
            # before collecting probes and only barrier once at the
            # end. tri_wedges uses num_returns=2 so the driver reads
            # only the tiny has_more flag; the packed wedge block
            # routes actor→actor by reference through plasma (every
            # probe actor maps the same buffer read-only and slices
            # its rows — no driver relay, no P× re-shipping).
            alive = list(range(self.P))
            probe_refs = []
            wedge_refs = {
                p: self.actors[p].tri_wedges.options(
                    num_returns=2).remote(chunk)
                for p in alive}
            while alive:
                more = ray.get([wedge_refs[p][0] for p in alive])
                round_blocks = [wedge_refs[p][1] for p in alive]
                nxt = [p for p, m in zip(alive, more) if m]
                wedge_refs = {
                    p: self.actors[p].tri_wedges.options(
                        num_returns=2).remote(chunk)
                    for p in nxt}
                probe_refs.extend(
                    a.tri_probe.remote(*round_blocks) for a in self.actors)
                alive = nxt
            ray.get(probe_refs)
        slices = [a.tri_counts.remote() for a in self.actors]
        ray.get([a.tri_collect.remote(*slices) for a in self.actors])
        self.superstep_seconds += time.perf_counter() - t0
        return self._result_ds("tri_result", "tri_cnt")

    def link_features(self, *, local_keys_limit: int = 64_000_000,
                      local_chunk: int = 262_144) -> ray.data.Dataset:
        """Per-edge link-prediction features (common neighbors +
        neighborhood Jaccard) on the resident pool — the local-closing
        triangles machinery with per-EDGE credits (a common neighbor w
        of (u, v) IS a triangle {u, v, w}). Returns vid-space
        (src, dst, common_nbrs, jaccard), src < dst. Above
        ``local_keys_limit`` oriented edges, use
        ``graph.api.edge_link_features``'s pair-key co-shuffle route
        instead (this route merges all key shards per actor)."""
        if not self.store.meta.get("symmetrized"):
            raise ValueError(
                "link_features needs build_graph(symmetrize=True)")
        oriented_e = self.store.meta["num_edges"] // 2
        if oriented_e > local_keys_limit:
            raise ValueError(
                "oriented edge count exceeds local_keys_limit; use "
                "graph.api.edge_link_features (co-shuffle scale route)")
        t0 = time.perf_counter()
        deg_parts = [a.tri_deg_part.remote() for a in self.actors]
        blocks = [a.tri_ingest.remote(*deg_parts) for a in self.actors]
        ray.get([a.tri_adopt.remote(*blocks) for a in self.actors])
        key_refs = [a.tri_keys.remote() for a in self.actors]
        ray.get([a.tri_merge_keys.remote(*key_refs)
                 for a in self.actors])
        tables = [a.tri_edge_local.remote(local_chunk)
                  for a in self.actors]
        counts = ray.data.from_arrow_refs(tables)
        from graphscope_ray.util import bucketed_sum
        counts = bucketed_sum(counts, "key", "cnt")
        V = np.int64(self.store.num_vertices)

        def unpack(t: pa.Table) -> pa.Table:
            k = t["key"].to_numpy()
            return pa.table({
                "src": pa.array(k // V), "dst": pa.array(k % V),
                "common_nbrs": pa.array(
                    t["cnt"].to_numpy().astype(np.int64))})

        out = counts.map_batches(unpack, batch_format="pyarrow")
        deg_ds = ray.data.from_arrow_refs(
            [a.tri_deg_table.remote() for a in self.actors])
        from graphscope_ray.graph.joins import attach_values
        from graphscope_ray.util import rename, round_half_away
        out = rename(attach_values(out, deg_ds, on="src",
                                   table_key="vid",
                                   value_names=["degree"]),
                     {"degree": "_du"})
        out = rename(attach_values(out, deg_ds, on="dst",
                                   table_key="vid",
                                   value_names=["degree"]),
                     {"degree": "_dv"})

        def jac(t: pa.Table) -> pa.Table:
            c = t["common_nbrs"].to_numpy().astype(np.float64)
            du = t["_du"].to_numpy().astype(np.float64)
            dv = t["_dv"].to_numpy().astype(np.float64)
            return pa.table({
                "src": t["src"], "dst": t["dst"],
                "common_nbrs": t["common_nbrs"],
                "jaccard": pa.array(
                    round_half_away(c / (du + dv - c), 6))})

        out = out.map_batches(jac, batch_format="pyarrow")
        self.superstep_seconds += time.perf_counter() - t0
        return out

    # -- user vertex programs ------------------------------------------

    def run_program(self, program, *, max_round: int = 100,
                    stop_when_zero: bool = False,
                    tol: Optional[float] = None) -> ray.data.Dataset:
        """Run a :class:`graphscope_ray.graph.program.VertexProgram` to
        ``max_round`` supersteps; stop early when the summed per-round
        'changed' value hits zero (``stop_when_zero``) or drops below
        ``tol``. The summed local aggregates are fed back as ``agg``
        next round (Pregel-aggregator analogue)."""
        ray.get([a.vp_init.remote(program) for a in self.actors])
        agg_spec = getattr(program, "aggregators", {}) or {}
        if agg_spec:
            from graphscope_ray.graph.program import AGG_OPS
            for name, op in agg_spec.items():
                if op not in AGG_OPS:
                    raise ValueError(f"unknown aggregator op {op!r}")
            agg: "float | dict" = {}
        else:
            agg = 0.0
        rnd = 0
        t0 = time.perf_counter()
        while rnd < max_round:
            rnd += 1
            results = self._exchange(
                "vp_scatter", "vp_apply",
                scatter_args=(rnd,),
                apply_args=(agg,),
                hub_method="vp_get_hub_vals" if self.has_hubs else None,
            )
            changed = sum(r[0] for r in results)
            if agg_spec:
                from graphscope_ray.graph.program import AGG_OPS
                agg = {
                    name: AGG_OPS[op]([r[1][name] for r in results])
                    for name, op in agg_spec.items()
                }
            else:
                agg = sum(r[1] for r in results)
            if stop_when_zero and changed == 0:
                break
            if tol is not None and changed < tol:
                break
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rnd
        cols_list = [a.vp_result.remote() for a in self.actors]
        tables = [_dict_table.remote(c) for c in cols_list]
        return self._finish_ds(tables)

    # -- power-iteration centralities ----------------------------------

    def eigenvector_centrality(self, tol: float = 1e-6, max_round: int = 100,
                               weighted: bool = False) -> ray.data.Dataset:
        """x' = x + Aᵀx, L2-normalized, stop when Σ|Δ| < N·tol or
        ``max_round`` pulls — apps/centrality/eigenvector/
        eigenvector_centrality.h:50-100 (x₀ = 1/N)."""
        ray.get([a.vec_init.remote("eig", 1.0 / self.V) for a in self.actors])
        rounds = 0
        t0 = time.perf_counter()
        while True:
            rounds += 1
            ray.get([a.vec_copy.remote("eig", "eig_last") for a in self.actors])
            stats = self._exchange(
                "vec_scatter", "vec_apply",
                scatter_args=("eig",), apply_args=("eig",),
                hub_method="vec_get_hub_vals" if self.has_hubs else None,
                hub_args=("eig",),
                scatter_kwargs={"use_weight": weighted},
                apply_kwargs={"add_self": True},
            )
            sumsq = sum(s[1] for s in stats)
            norm = float(np.sqrt(sumsq))
            if norm <= 0:
                raise RuntimeError("eigenvector norm collapsed to 0")
            ray.get([a.vec_rescale.remote("eig", 1.0 / norm)
                     for a in self.actors])
            l1 = sum(ray.get([a.vec_l1_vs.remote("eig", "eig_last")
                              for a in self.actors]))
            if l1 < self.V * tol or rounds >= max_round:
                break
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rounds
        return self._result_ds("vec_result", "centrality", args=("eig",))

    def katz_centrality(self, alpha: float = 0.1, beta: float = 1.0,
                        tol: float = 1e-6, max_round: int = 100,
                        normalized: bool = True,
                        weighted: bool = False,
                        raise_on_no_convergence: bool = False
                        ) -> ray.data.Dataset:
        """x' = α·Aᵀx + β from x₀ = 0; stop when Σ|Δ| < N·tol or
        ``max_round``; optional final L2 normalization —
        apps/centrality/katz/katz_centrality.h:48-160.
        ``raise_on_no_convergence`` adopts networkx's contract
        (PowerIterationFailedConvergence analogue) instead of
        returning the last iterate."""
        if raise_on_no_convergence and max_round <= 0:
            raise RuntimeError(
                "katz power iteration failed to converge in 0 rounds")
        ray.get([a.vec_init.remote("katz", 0.0) for a in self.actors])
        rounds = 0
        t0 = time.perf_counter()
        while True:
            rounds += 1
            ray.get([a.vec_copy.remote("katz", "katz_last")
                     for a in self.actors])
            self._exchange(
                "vec_scatter", "vec_apply",
                scatter_args=("katz",), apply_args=("katz",),
                hub_method="vec_get_hub_vals" if self.has_hubs else None,
                hub_args=("katz",),
                scatter_kwargs={"use_weight": weighted},
                apply_kwargs={"alpha": alpha, "beta": beta},
            )
            l1 = sum(ray.get([a.vec_l1_vs.remote("katz", "katz_last")
                              for a in self.actors]))
            if l1 < self.V * tol:
                break
            if rounds >= max_round:
                if raise_on_no_convergence:
                    raise RuntimeError(
                        f"katz power iteration failed to converge "
                        f"in {max_round} rounds")
                break
        if normalized:
            sumsq = sum(s[1] for s in ray.get(
                [a.vec_stats.remote("katz") for a in self.actors]))
            if sumsq > 0:
                ray.get([a.vec_rescale.remote("katz", 1.0 / float(np.sqrt(sumsq)))
                         for a in self.actors])
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += rounds
        return self._result_ds("vec_result", "centrality", args=("katz",))

    def hits(self, tolerance: float = 0.01, max_round: int = 100,
             normalized: bool = True) -> ray.data.Dataset:
        """HITS — apps/hits/hits.h:35-204 (defaults per
        python/graphscope/analytical/app/hits.py:29). Per step:
        auth = Σ_in hub_last; hub = Σ_out auth; each max-normalized;
        stop when Σ|hub−hub_last| ≤ tolerance or ``max_round``; final
        sum-normalization when ``normalized``. Requires a store built
        with ``directions="both"``."""
        if not self.store.meta.get("has_dir"):
            raise ValueError("hits needs build_graph(directions='both')")
        ray.get([a.vec_init.remote("hub", 1.0 / self.V) for a in self.actors])
        ray.get([a.vec_init.remote("auth", 0.0) for a in self.actors])
        step = 0
        t0 = time.perf_counter()
        while True:
            ray.get([a.vec_copy.remote("hub", "hub_last")
                     for a in self.actors])
            # auth(u) = Σ_{v→u} hub(v): scatter hub along forward edges
            self._exchange(
                "vec_scatter", "vec_apply",
                scatter_args=("hub",), apply_args=("auth",),
                hub_method="vec_get_hub_vals" if self.has_hubs else None,
                hub_args=("hub",),
                scatter_kwargs={"direction": 0},
            )
            # hub(u) = Σ_{u→v} auth(v): scatter auth along reversed edges
            self._exchange(
                "vec_scatter", "vec_apply",
                scatter_args=("auth",), apply_args=("hub",),
                hub_method="vec_get_hub_vals" if self.has_hubs else None,
                hub_args=("auth",),
                scatter_kwargs={"direction": 1},
            )
            maxes = ray.get([a.hits_maxes.remote() for a in self.actors])
            max_h = max(m[0] for m in maxes)
            max_a = max(m[1] for m in maxes)
            eps = sum(ray.get([
                a.hits_finish_step.remote(
                    1.0 / max_h if max_h > 0 else 1.0,
                    1.0 / max_a if max_a > 0 else 1.0)
                for a in self.actors]))
            step += 1
            if eps <= tolerance or step >= max_round:
                break
        if normalized:
            sum_h = sum(s[0] for s in ray.get(
                [a.vec_stats.remote("hub") for a in self.actors]))
            sum_a = sum(s[0] for s in ray.get(
                [a.vec_stats.remote("auth") for a in self.actors]))
            if sum_h:
                ray.get([a.vec_rescale.remote("hub", 1.0 / sum_h)
                         for a in self.actors])
            if sum_a:
                ray.get([a.vec_rescale.remote("auth", 1.0 / sum_a)
                         for a in self.actors])
        self.superstep_seconds += time.perf_counter() - t0
        self.supersteps += 2 * step
        auth = [a.vec_result.remote("auth") for a in self.actors]
        hub = [a.vec_result.remote("hub") for a in self.actors]
        tables = [
            _two_col_table.remote(x, y, "auth", "hub")
            for x, y in zip(auth, hub)
        ]
        return self._finish_ds(tables)

    def kshell(self, k: int) -> ray.data.Dataset:
        """Shell k = k-core minus (k+1)-core (peel continues in place)."""
        ray.get([a.kcore_init.remote() for a in self.actors])
        t0 = time.perf_counter()
        self._peel_to(k)
        core_k = [a.kcore_result.remote() for a in self.actors]
        self._peel_to(k + 1)
        core_k1 = [a.kcore_result.remote() for a in self.actors]
        self.superstep_seconds += time.perf_counter() - t0
        tables = [
            _shell_table.remote(a, b) for a, b in zip(core_k, core_k1)
        ]
        return self._finish_ds(tables)
