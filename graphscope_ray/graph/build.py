"""Graph build: edge partitioning, degrees, hub splitting, edge store.

Replaces the reference's load path (hash partition by oid inside
vineyard's ``BasicEVFragmentLoader``, CSR build, seal —
``/root/reference/analytical_engine/core/loader/arrow_fragment_loader.h:40,64-68``)
with Ray Data stages writing a resumable on-disk store:

    store/
      meta.json                      # V, P, directed, hubs, digests
      edges/part=<p>/*.parquet       # (src, dst[, weight]) int64
      degrees/part=<p>/*.parquet     # (vid, out_deg) — global out-degrees

Build plan (one full pass over the edges + P local tasks):

1. normalize columns (cast, optional symmetrize / dual-direction tag),
   add ``part = src % P``, ``write_parquet(partition_cols=['part'])``;
2. P parallel tasks, one per partition directory: out-degrees of the
   partition's owned sources by ``np.unique`` (every out-edge of an
   owned source lives in its partition, so NO shuffle — the degree
   aggregate that would otherwise move O(E) rows is free), plus
   max-vid / edge-count stats;
3. optional **hub splitting** (explicit skew mitigation, SURVEY.md §4):
   sources with out-degree above ``hub_threshold`` get their out-edges
   re-spread as ``part = (src + dst) % P`` — P rewrite tasks move ONLY
   hub edges; the hub's vertex state stays with its owner and the
   engine broadcasts the (small) hub value vector once per round.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


class GraphStore:
    """Handle to an on-disk partitioned graph."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)

    @property
    def num_vertices(self) -> int:
        return self.meta["num_vertices"]

    @property
    def num_parts(self) -> int:
        return self.meta["num_parts"]

    @property
    def hubs(self) -> np.ndarray:
        return np.asarray(self.meta["hubs"], dtype=np.int64)

    def edges_dir(self, p: int) -> str:
        return os.path.join(self.path, "edges", f"part={p}")

    def degrees_dir(self, p: int) -> str:
        return os.path.join(self.path, "degrees", f"part={p}")


@ray.remote
def _part_stats(store_path: str, p: int, P: int,
                hub_threshold, dedup: bool = False) -> dict:
    """Per-partition pass: write degrees of owned sources, return
    stats + hub candidates. No shuffle — partitioning by src % P means
    every out-edge of an owned source is local.

    ``dedup=True`` (set for symmetrized stores) first collapses
    duplicate (src, dst) rows keeping the max weight: an input that
    already contains both (u,v) and (v,u) would otherwise store each
    direction twice after the symmetrize union, silently turning CDLP
    votes / k-core degrees / PageRank out-degrees into multigraph
    semantics (r01 ADVICE). Duplicates co-locate (part = src % P), so
    this is a local pass, not a shuffle; the rewrite also consolidates
    the partition into one file."""
    edir = os.path.join(store_path, "edges", f"part={p}")
    ddir = os.path.join(store_path, "degrees", f"part={p}")
    os.makedirs(ddir, exist_ok=True)
    if not os.path.isdir(edir) or not os.listdir(edir):
        pq.write_table(
            pa.table({"vid": pa.array([], pa.int64()),
                      "out_deg": pa.array([], pa.int64())}),
            os.path.join(ddir, "part.parquet"),
        )
        return {"edges": 0, "max_vid": -1, "hubs": []}
    if dedup:
        t = pq.read_table(edir)
        t = t.drop_columns([c for c in ("part",) if c in t.column_names])
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        order = np.lexsort((dst, src))
        keep = np.empty(len(order), dtype=bool)
        if len(order):
            s_o, d_o = src[order], dst[order]
            keep[0] = True
            keep[1:] = (s_o[1:] != s_o[:-1]) | (d_o[1:] != d_o[:-1])
        if "weight" in t.column_names and len(order) and not keep.all():
            w_o = t["weight"].to_numpy().astype(np.float64)[order]
            grp = np.cumsum(keep) - 1
            wmax = np.full(int(grp[-1]) + 1, -np.inf)
            np.maximum.at(wmax, grp, w_o)
            t2 = t.take(order[keep]).set_column(
                t.schema.get_field_index("weight"), "weight",
                pa.array(wmax))
        else:
            t2 = t.take(order[keep])
        for fn in os.listdir(edir):
            os.remove(os.path.join(edir, fn))
        pq.write_table(t2, os.path.join(edir, "edges.parquet"))
        t = t2
    else:
        t = pq.read_table(edir, columns=["src", "dst"])
    src = t["src"].to_numpy()
    dst = t["dst"].to_numpy()
    vid, cnt = np.unique(src, return_counts=True)
    pq.write_table(
        pa.table({"vid": vid, "out_deg": cnt.astype(np.int64)}),
        os.path.join(ddir, "part.parquet"),
    )
    hubs = (
        vid[cnt > hub_threshold].tolist() if hub_threshold is not None else []
    )
    return {
        "edges": len(src),
        "max_vid": int(max(src.max(initial=-1), dst.max(initial=-1))),
        "hubs": hubs,
    }


@ray.remote
def _extract_hub_edges(store_path: str, p: int, hubs: np.ndarray):
    """Remove hub-source edges from partition p's files; return them."""
    edir = os.path.join(store_path, "edges", f"part={p}")
    if not os.path.isdir(edir):
        return None
    moved = []
    for fn in sorted(os.listdir(edir)):
        fp = os.path.join(edir, fn)
        t = pq.read_table(fp)
        src = t["src"].to_numpy()
        pos = np.clip(np.searchsorted(hubs, src), 0, len(hubs) - 1)
        is_hub = hubs[pos] == src
        if not is_hub.any():
            continue
        keep = t.filter(pa.array(~is_hub))
        hub_rows = t.filter(pa.array(is_hub))
        tmp = fp + ".tmp"
        pq.write_table(keep, tmp)
        os.replace(tmp, fp)
        moved.append(hub_rows)
    if not moved:
        return None
    return pa.concat_tables(moved)


@ray.remote
def _write_hub_edges(store_path: str, q: int, P: int, *tables) -> int:
    """Append this destination's share of the redistributed hub edges
    (part = (src + dst) % P == q). Runs per destination partition with
    the extracted tables passed as object refs — nothing is gathered on
    the driver."""
    mine = []
    for t in tables:
        if t is None or not t.num_rows:
            continue
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        m = ((src + dst) % P) == q
        if m.any():
            mine.append(t.filter(pa.array(m)))
    if not mine:
        return 0
    out = pa.concat_tables(mine)
    edir = os.path.join(store_path, "edges", f"part={q}")
    os.makedirs(edir, exist_ok=True)
    pq.write_table(out, os.path.join(edir, "hub-edges.parquet"))
    return out.num_rows


def build_graph(
    edges: ray.data.Dataset,
    path: str,
    *,
    num_parts: int,
    num_vertices: int | None = None,
    symmetrize: bool = False,
    weight_col: str | None = None,
    hub_threshold: int | None = None,
    max_hubs: int = 1_000_000,
    directions: str = "forward",
) -> GraphStore:
    """Partition an int64-vid edge table into an on-disk GraphStore.

    ``edges`` must have columns ``src``/``dst`` (int64 vids from
    :func:`assign_dense_ids`) and optionally ``weight_col``.
    ``symmetrize=True`` unions the reversed edges first (the
    reference's apps treat the test graphs as undirected; WCC always
    walks both directions — ``benchmarks/apps/wcc/wcc.h:58``);
    ``directions='both'`` instead stores both orientations with a
    direction flag (dual-CSR analogue, for HITS).
    """
    P = int(num_parts)
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    e = edges.select_columns(cols)
    if weight_col and weight_col != "weight":
        from graphscope_ray.util import rename
        e = rename(e, {weight_col: "weight"})
    has_weight = weight_col is not None

    if symmetrize and directions == "both":
        raise ValueError("symmetrize and directions='both' are exclusive")

    if symmetrize:
        # fused: one scan emits both orientations (a union of a second
        # map_batches would read the source twice)
        def both_dirs(t: pa.Table) -> pa.Table:
            arrs = {"src": t["dst"], "dst": t["src"]}
            if has_weight:
                arrs["weight"] = t["weight"]
            swapped = pa.table(arrs).select(t.column_names)
            return pa.concat_tables([t, swapped])
        e = e.map_batches(both_dirs, batch_format="pyarrow")

    has_dir = directions == "both"
    if has_dir:
        def tag_fwd(t: pa.Table) -> pa.Table:
            return t.append_column(
                "dir", pa.array(np.zeros(len(t), dtype=np.int8)))

        def tag_rev(t: pa.Table) -> pa.Table:
            arrs = {"src": t["dst"], "dst": t["src"]}
            if has_weight:
                arrs["weight"] = t["weight"]
            out = pa.table(arrs).select([c for c in t.column_names])
            return out.append_column(
                "dir", pa.array(np.ones(len(t), dtype=np.int8)))

        e = e.map_batches(tag_fwd, batch_format="pyarrow").union(
            e.map_batches(tag_rev, batch_format="pyarrow"))

    def normalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.set_column(t.schema.get_field_index("src"), "src",
                         pc.cast(t["src"], pa.int64()))
        t = t.set_column(t.schema.get_field_index("dst"), "dst",
                         pc.cast(t["dst"], pa.int64()))
        if has_weight:
            t = t.set_column(t.schema.get_field_index("weight"), "weight",
                             pc.cast(t["weight"], pa.float64()))
        part = t["src"].to_numpy() % P
        return t.append_column("part", pa.array(part.astype(np.int64)))

    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)

    # single full pass: normalize + partitioned write
    e.map_batches(normalize, batch_format="pyarrow").write_parquet(
        os.path.join(path, "edges"), partition_cols=["part"])

    # P shuffle-free local passes: degrees, stats, hub candidates
    stats = ray.get([
        _part_stats.remote(path, p, P, hub_threshold, dedup=symmetrize)
        for p in range(P)
    ])
    num_edges = sum(s["edges"] for s in stats)
    max_vid = max((s["max_vid"] for s in stats), default=-1)
    if num_vertices is None:
        num_vertices = max_vid + 1

    hubs = np.sort(np.array(
        [h for s in stats for h in s["hubs"]], dtype=np.int64))
    if len(hubs) > max_hubs:
        raise ValueError(
            f"{len(hubs)} hubs above threshold {hub_threshold} exceeds "
            f"max_hubs={max_hubs}; raise the threshold")

    if len(hubs):
        # move ONLY hub-source edges: extract per partition (object
        # refs stay in the store), each destination filters its share
        extracted = [
            _extract_hub_edges.remote(path, p, hubs) for p in range(P)
        ]
        ray.get([
            _write_hub_edges.remote(path, q, P, *extracted)
            for q in range(P)
        ])

    meta = {
        "num_vertices": int(num_vertices),
        "num_parts": P,
        "num_edges": int(num_edges),
        "has_weight": has_weight,
        "symmetrized": bool(symmetrize),
        "has_dir": has_dir,
        "hub_threshold": hub_threshold,
        "hubs": hubs.tolist(),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return GraphStore(path)
