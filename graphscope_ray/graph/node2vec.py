"""node2vec second-order biased random walks (Grover & Leskovec 2016,
KDD) — the graph-ML walk-corpus generator the reference's sampling
surface (apps/sampling_path/sampling_path.h) does not cover.

DETERMINISTIC: the next step is the Efraimidis-Spirakis argmax over
the candidate neighbors — key = round(ln(u)/α, 9) with
u = uniform from the shared ``walk_hash(cand, walk_id, hop, seed)``
family (data/hashing.py) and α the node2vec bias (1/p for the return
step, 1 for a triangle-closing step, 1/q otherwise) — so walks are
reproducible at any parallelism AND replayable bit-for-bit by a
DuckDB twin (walk_hash_sql + the same rounded key). With p, q chosen
as powers of two the α division is exact scaling, so the only float
op is ln(u), the convention every ES-sampling oracle in this repo
already uses.

Shape: the symmetric CSR (indptr, sorted neighbor array) and a packed
sorted (v << 32 | n) edge-key array are built from the Dataset once
and broadcast via ``ray.put``; each hop is one stateless
``map_batches`` over the walker Dataset — candidate expansion by
``np.repeat`` over CSR slices, the triangle-membership test ONE
``np.searchsorted`` against the packed keys, the per-walker argmax a
segmented lexsort-first. Nothing per-row-Python; the walker table
(|seeds|·walks_per_seed rows) is the only state that moves between
hops. 100 TB note: broadcast-CSR bounds this route to graphs whose
adjacency fits a worker (the same documented bound as the
sampling_path broadcast route); beyond it the partition-walk actor
variant (engine.sampling route) is the template — second-order state
doubles the routed payload (prev, cur) but not the pattern.
Vertex-id bound: ids must fit 32 bits for the packed membership key
(dense ranks are used internally, so 4B vertices).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from graphscope_ray.data.hashing import walk_hash

TWO_M53 = 2.0 ** -53


def _csr(edges: ray.data.Dataset):
    """(oids, indptr, nbr_ranks, packed) from a directed edge table —
    symmetrized, deduped, self-loops dropped; all in dense-rank space
    with ``oids`` the rank→oid decode table. Assembled in one remote
    task (no O(E) driver buffer — the GIE CSR recipe)."""

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        keep = s != d
        return pa.table({"src": s[keep], "dst": d[keep]})

    ds = edges.select_columns(["src", "dst"]).map_batches(
        canon, batch_format="pyarrow")

    @ray.remote
    def build(*refs):
        # varargs so Ray resolves each block ref to its table; blocks
        # may arrive as Table, RecordBatch, OR pandas (pandas-backed
        # upstream pipelines keep their block type through
        # to_arrow_refs despite the name)
        tabs = []
        for b in refs:
            if isinstance(b, pa.Table):
                tabs.append(b)
            elif isinstance(b, pa.RecordBatch):
                tabs.append(pa.Table.from_batches([b]))
            else:
                tabs.append(pa.Table.from_pandas(b, preserve_index=False))
        t = pa.concat_tables(tabs, promote_options="default")
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        oids = np.unique(np.r_[s, d])
        rs = np.searchsorted(oids, s).astype(np.int64)
        rd = np.searchsorted(oids, d).astype(np.int64)
        a = np.r_[rs, rd]
        b = np.r_[rd, rs]
        packed = np.unique((a.astype(np.uint64) << np.uint64(32))
                           | b.astype(np.uint64))
        av = (packed >> np.uint64(32)).astype(np.int64)
        bv = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
        indptr = np.searchsorted(av, np.arange(len(oids) + 1))
        return oids, indptr, bv, packed

    blocks = list(ds.to_arrow_refs())
    return ray.get(build.remote(*blocks))


def node2vec_walks(edges: ray.data.Dataset, seeds, *, length: int = 5,
                   walks_per_seed: int = 1, p: float = 2.0,
                   q: float = 0.5, seed: int = 7) -> ray.data.Dataset:
    """→ (walk_id, hop, vid) rows, hop 0 = the seed vertex. Walks stop
    early only at isolated vertices (a symmetric graph walks forever
    otherwise). ``p``/``q`` SHOULD be powers of two (exact α scaling —
    see module docstring); any positive value is accepted."""
    oids, indptr, nbrs, packed = _csr(edges)
    ref = ray.put((oids, indptr, nbrs, packed))
    inv_p, inv_q = 1.0 / p, 1.0 / q

    seeds = np.unique(np.asarray(list(seeds), dtype=np.int64))
    idx = np.searchsorted(oids, seeds)
    # a seed oid absent from the edge table would otherwise either raise
    # an opaque IndexError (seed > max oid) or silently walk from an
    # unrelated vertex (seed between oids)
    bad = (idx >= len(oids)) | (oids[np.clip(idx, 0, len(oids) - 1)] != seeds)
    if bad.any():
        raise KeyError(f"seed oids not present in the edge table: "
                       f"{seeds[bad][:10].tolist()}")
    n_walk = len(seeds) * walks_per_seed
    walk_id = np.arange(n_walk, dtype=np.int64)
    start = np.repeat(idx, walks_per_seed)
    state = pd.DataFrame({"walk_id": walk_id,
                          "prev": np.full(n_walk, -1, np.int64),
                          "cur": start})
    rows = [pd.DataFrame({"walk_id": walk_id, "hop": np.int64(0),
                          "vid": oids[start]})]

    def step(df: pd.DataFrame, _hop: int) -> pd.DataFrame:
        o, ip, nb, pk = ray.get(ref)
        cur = df["cur"].to_numpy()
        prev = df["prev"].to_numpy()
        wid = df["walk_id"].to_numpy()
        deg = ip[cur + 1] - ip[cur]
        alive = deg > 0
        cur, prev, wid, deg = cur[alive], prev[alive], wid[alive], deg[alive]
        if not len(cur):
            return pd.DataFrame({"walk_id": wid, "prev": cur, "cur": cur})
        rep = np.repeat(np.arange(len(cur)), deg)
        # flat CSR gather: start-of-segment + within-segment offset
        offs = np.arange(len(rep)) - np.repeat(
            np.cumsum(deg) - deg, deg)
        cand = nb[ip[cur][rep] + offs]
        pr = prev[rep]
        # α: return step 1/p; triangle (cand ∈ N(prev)) 1; else 1/q.
        # hop 1 (prev = -1) is the uniform first step (α = 1).
        key = ((np.maximum(pr, 0).astype(np.uint64) << np.uint64(32))
               | cand.astype(np.uint64))
        pos = np.searchsorted(pk, key)
        member = (pos < len(pk)) & (pk[np.minimum(pos, len(pk) - 1)]
                                    == key)
        alpha = np.where(cand == pr, inv_p,
                         np.where(member, 1.0, inv_q))
        alpha = np.where(pr < 0, 1.0, alpha)
        h = walk_hash(o[cand], wid[rep], _hop, seed)
        u = np.maximum((h >> np.uint64(11)).astype(np.float64) * TWO_M53,
                       TWO_M53)
        from graphscope_ray.util import round_half_away
        es = round_half_away(np.log(u) / alpha, 9)
        # per-walker argmax of (es desc, cand asc): lexsort then first
        order = np.lexsort((cand, -es, rep))
        first = np.r_[True, rep[order][1:] != rep[order][:-1]]
        sel = order[first]
        return pd.DataFrame({"walk_id": wid[rep[sel]],
                             "prev": cur[rep[sel]],
                             "cur": cand[sel]})

    for hop in range(1, length + 1):
        nxt = ray.data.from_pandas(state).map_batches(
            lambda df, _h=hop: step(df, _h),
            batch_format="pandas").to_pandas()
        if not len(nxt):
            break
        state = nxt.sort_values("walk_id").reset_index(drop=True)
        rows.append(pd.DataFrame({
            "walk_id": state["walk_id"].to_numpy(),
            "hop": np.int64(hop),
            "vid": oids[state["cur"].to_numpy()]}))

    out = (pd.concat(rows, ignore_index=True)
           .sort_values(["walk_id", "hop"]).reset_index(drop=True))
    return ray.data.from_pandas(out)
