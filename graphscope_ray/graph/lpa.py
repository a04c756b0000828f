"""True LPA-U2I — the reference's weighted bipartite user→item label
propagation (`/root/reference/analytical_engine/apps/lpa/lpa_u2i.h:29-245`),
which r01 shipped only as weighted CDLP under the same name (VERDICT #5).

Semantics (verified line-by-line against the reference):

- bipartite directed graph user→item with edge weight ``edata``;
  users carry a ``prop_num``-vector of float labels, items start at 0.
- step 1 is degree bookkeeping; then steps alternate up to
  ``max_round``:
  - even step (u2i): ``label_i = Σ_{u→i} label_u · w`` (items with no
    in-edges stay 0 — lpa_u2i.h:171-185);
  - odd step ≥ 3 (i2u): ``tmp_u = Σ_{u→i} label_i · w``; then per
    property p (lpa_u2i.h:196-236):
      * labels exactly 0 or 1 are clamped (seed labels stay fixed);
      * else if ``out_nbr_in_degree_sum(u) != out_degree(u)``:
        ``new = (tmp - out_deg(u)·label_u) / (out_nbr_in_degree_sum(u)
        − out_deg(u))`` — removing u's own round-trip contribution and
        averaging the other users' labels reachable through shared
        items; else keep.
- output: the user labels after step ``max_round``.

Ray-Data-first realization: each half-step is one broadcast-or-shuffle
join of the label table onto the edge table plus a groupby-sum — no
resident state needed because the label table is the only carry-over.
Degrees (out_deg, in_deg, out_nbr_in_degree_sum) are computed once up
front. All per-batch math is numpy over the property columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from graphscope_ray.graph.joins import attach_values
from graphscope_ray.util import bucketed_sum


def _weighted_scatter(edges, labels, *, key_from, key_to, prop_cols,
                      weight_col):
    """Σ over edges of label[key_from] · w, grouped by key_to →
    Dataset (vid=key_to, prop_cols...). Per-batch np.add.at is the
    combiner (the exchange moves O(distinct vid per batch) rows, not
    O(E)); the global reduce is util.bucketed_sum (a plain
    per-distinct-vid aggregate pays ~ms of Python dispatch per
    vertex)."""
    e2 = attach_values(edges, labels, on=key_from, table_key="vid",
                       value_names=list(prop_cols),
                       defaults={p: 0.0 for p in prop_cols})

    def mult(t: pa.Table) -> pa.Table:
        w = (t[weight_col].to_numpy().astype(np.float64)
             if weight_col else np.ones(len(t)))
        v, inv = np.unique(t[key_to].to_numpy(), return_inverse=True)
        cols = {"vid": pa.array(v)}
        for p in prop_cols:
            acc = np.zeros(len(v))
            np.add.at(acc, inv, t[p].to_numpy().astype(np.float64) * w)
            cols[p] = pa.array(acc)
        return pa.table(cols)

    return bucketed_sum(e2.map_batches(mult, batch_format="pyarrow"),
                        "vid", list(prop_cols))


def lpa_u2i(
    edges: ray.data.Dataset,
    user_labels: ray.data.Dataset,
    *,
    prop_cols,
    max_round: int = 10,
    weight_col: str | None = "weight",
    src: str = "src",
    dst: str = "dst",
) -> ray.data.Dataset:
    """Run LPA-U2I; returns the user label table (vid, *prop_cols).

    ``edges``: (src=user id, dst=item id [, weight]); ``user_labels``:
    (vid=user id, prop columns as float64)."""
    prop_cols = list(prop_cols)
    edges = edges.materialize()

    # degree bookkeeping (PEval + step 1): out_deg(u), in_deg(i),
    # out_nbr_in_degree_sum(u) = Σ_{i ∈ out(u)} in_deg(i)
    def deg_of(col):
        def f(t: pa.Table) -> pa.Table:
            v, c = np.unique(t[col].to_numpy(), return_counts=True)
            return pa.table({"vid": v, "deg": c.astype(np.int64)})
        return bucketed_sum(
            edges.map_batches(f, batch_format="pyarrow"), "vid", "deg")

    out_deg = deg_of(src).materialize()
    in_deg = deg_of(dst).materialize()

    e_ind = attach_values(edges, in_deg, on=dst, table_key="vid",
                          value_names=["deg"], defaults={"deg": 0})

    def per_src(t: pa.Table) -> pa.Table:
        s = t[src].to_numpy()
        d = t["deg"].to_numpy().astype(np.int64)
        v, inv = np.unique(s, return_inverse=True)
        acc = np.zeros(len(v), dtype=np.int64)
        np.add.at(acc, inv, d)
        return pa.table({"vid": v, "nsum": acc})

    nbr_ind_sum = bucketed_sum(
        e_ind.map_batches(per_src, batch_format="pyarrow"),
        "vid", "nsum").materialize()

    u_lab = user_labels.materialize()
    i_lab = None
    for step in range(2, max_round + 1):
        if step % 2 == 0:  # u2i
            i_lab = _weighted_scatter(
                edges, u_lab, key_from=src, key_to=dst,
                prop_cols=prop_cols, weight_col=weight_col).materialize()
        else:  # i2u
            scat = _weighted_scatter(
                edges, i_lab, key_from=dst, key_to=src,
                prop_cols=prop_cols, weight_col=weight_col)
            # base on the FULL user set (users with no edges keep their
            # label, like the reference's inner_vertices sweep)
            from graphscope_ray.util import rename
            tmp = rename(u_lab, {p: "_cur_" + p for p in prop_cols})
            tmp = attach_values(tmp, scat, on="vid", table_key="vid",
                                value_names=prop_cols,
                                defaults={p: 0.0 for p in prop_cols})
            tmp = attach_values(tmp, out_deg, on="vid", table_key="vid",
                                value_names=["deg"], defaults={"deg": 0})
            tmp = _rename_col(tmp, "deg", "_outdeg")
            tmp = attach_values(tmp, nbr_ind_sum, on="vid",
                                table_key="vid", value_names=["nsum"],
                                defaults={"nsum": 0})

            def update(t: pa.Table) -> pa.Table:
                od = t["_outdeg"].to_numpy().astype(np.float64)
                ns = t["nsum"].to_numpy().astype(np.float64)
                cols = {"vid": t["vid"]}
                denom_ok = ns != od
                denom = np.where(denom_ok, ns - od, 1.0)
                for p in prop_cols:
                    cur = t["_cur_" + p].to_numpy().astype(np.float64)
                    tp = t[p].to_numpy().astype(np.float64)
                    upd = (tp - od * cur) / denom
                    clamped = (cur == 0.0) | (cur == 1.0)
                    new = np.where(clamped | ~denom_ok, cur, upd)
                    cols[p] = pa.array(new)
                return pa.table(cols)

            u_lab = tmp.map_batches(
                update, batch_format="pyarrow").materialize()
    return u_lab


def _rename_col(ds, old, new):
    from graphscope_ray.util import rename
    return rename(ds, {old: new})
