"""Deterministic dense vertex-id assignment and oid→vid joins.

The reference's vertex map assigns gids with the fragment id in the
high bits (`/root/reference/analytical_engine/core/vertex_map/
arrow_projected_vertex_map.h:89-101`) — partition-dependent. Here vids
are the *rank in global sorted oid order*: independent of parallelism
(replicating the worker-count invariance the reference tests in
`python/tests/test_scalability.py:40-59`) and monotonic in oid, so
min-vid component labels translate to min-oid labels (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


@ray.remote
def _stamp_block(tbl: pa.Table, col: str, start: int) -> pa.Table:
    vids = pa.array(np.arange(start, start + tbl.num_rows, dtype=np.int64))
    return pa.table({"oid": tbl.column(col), "vid": vids})


def assign_dense_ids(ds: ray.data.Dataset, col: str = "oid",
                     *, driver_threshold: int = 20_000_000) -> ray.data.Dataset:
    """Distinct values of ``ds[col]`` → Dataset ``(oid, vid:int64)`` with
    vid = dense rank in sorted order.

    A per-batch ``unique`` combiner runs first (shrinks every later
    exchange). If the combined stream stays under ``driver_threshold``
    rows the distinct+sort collapses to one driver numpy pass — the id
    map of that size is broadcast driver-side by ``attach_vids`` anyway,
    so this spends no extra memory and saves two all-to-all exchanges.
    Scale path (above the threshold): distinct via groupby shuffle,
    global sort (range partitioned), then a per-block stamping task
    using driver-side prefix sums of block row counts — only O(#blocks)
    metadata touches the driver, never the rows.
    """
    def batch_unique(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({col: pc.unique(t[col])})

    pre = ds.select_columns([col]).map_batches(
        batch_unique, batch_format="pyarrow").materialize()
    # empty-input schema must keep the input's oid type (int64 graphs
    # were getting a string-typed idmap, breaking attach_vids joins);
    # an empty materialized stream can lose its schema → fall back to
    # the input dataset's
    sch = pre.schema() or ds.schema()
    oid_type = (dict(zip(sch.names, sch.types))[col] if sch is not None
                else pa.string())
    empty = pa.table({"oid": pa.array([], oid_type),
                      "vid": pa.array([], pa.int64())})
    n_pre = pre.count()
    if n_pre == 0:
        # to_pandas() of an empty stream drops the column entirely —
        # return the typed empty map before touching it
        return ray.data.from_arrow(empty)
    if n_pre <= driver_threshold:
        # Arrow unique + sort on the collected pre-distinct stream —
        # np.unique over object (string-oid) arrays was
        # comparison-bound; Arrow sorts UTF-8 by bytes, which equals
        # codepoint order, so the rank assignment is unchanged
        import pyarrow.compute as pc
        tabs = []
        for b in ray.get(list(pre.to_arrow_refs())):
            if isinstance(b, pa.RecordBatch):
                tabs.append(pa.Table.from_batches([b]))
            elif isinstance(b, pa.Table):
                tabs.append(b)
            else:  # pandas-backed block
                tabs.append(pa.Table.from_pandas(b, preserve_index=False))
        arr = pa.concat_tables(tabs, promote_options="default")[col]
        if arr.null_count:
            # match the strictness of the old np.unique object path,
            # which raised TypeError on None oids — a null must not be
            # silently granted a vid
            raise TypeError(
                f"assign_dense_ids: column {col!r} contains "
                f"{arr.null_count} null oid(s)")
        u = pc.unique(arr.combine_chunks())
        vals = u.take(pc.sort_indices(u))
        if len(vals) == 0:
            return ray.data.from_arrow(empty)
        chunk = 4_000_000  # keep blocks near Ray's target block size
        return ray.data.from_arrow([
            pa.table({"oid": vals.slice(lo, min(chunk, len(vals) - lo)),
                      "vid": pa.array(np.arange(
                          lo, min(lo + chunk, len(vals)), dtype=np.int64))})
            for lo in range(0, len(vals), chunk)
        ])

    from graphscope_ray.util import bucketed_distinct
    distinct = bucketed_distinct(pre, col).sort(col)
    # bucketed_distinct emits pandas blocks (map_groups); _stamp_block
    # expects Arrow — normalize the block type, preserving sort order
    # (map_batches keeps block order)
    distinct = distinct.map_batches(lambda t: t, batch_format="pyarrow")
    mat = distinct.materialize()

    blocks = []  # [(block_ref, num_rows)] in global sorted order
    for bundle in mat.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            blocks.append((block_ref, meta.num_rows))

    out_refs, offset = [], 0
    for block_ref, n in blocks:
        if n == 0:
            continue
        out_refs.append(_stamp_block.remote(block_ref, col, offset))
        offset += n
    if not out_refs:
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow_refs(out_refs)


def _broadcast_lookup_fn(idmap_ref, cols):
    """Stateless batch mapper translating oid columns to vids via a
    broadcast dictionary (``ray.put`` once; ``ray.get`` per batch is a
    zero-copy read from the local object store — deliberately NOT an
    actor pool, which would spawn dedicated worker processes per
    stage)."""

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        oids_pa, vids = ray.get(idmap_ref)
        for c in cols:
            # Arrow hash-lookup kernel: ~5-10x faster than numpy
            # searchsorted on object (string-oid) arrays — the
            # flagship's string-keyed attach was comparison-bound
            idx = pc.index_in(batch[c], value_set=oids_pa)
            nmiss = idx.null_count
            if nmiss:
                raise KeyError(
                    f"{nmiss} oids in column {c} missing from id map")
            iv = idx.to_numpy(zero_copy_only=False).astype(np.int64)
            batch = batch.set_column(
                batch.schema.get_field_index(c), c, pa.array(vids[iv])
            )
        return batch

    return f


def attach_vids(
    edges: ray.data.Dataset,
    idmap: ray.data.Dataset,
    cols=("src", "dst"),
    *,
    broadcast_threshold: int = 20_000_000,
    num_partitions: int = 32,
    idmap_count: Optional[int] = None,
) -> ray.data.Dataset:
    """Replace oid columns of ``edges`` by int64 vids.

    Small id maps (≤ ``broadcast_threshold`` rows) are broadcast once
    via ``ray.put`` and looked up with a vectorized ``searchsorted``
    inside ``map_batches``; larger maps fall back to Ray Data's
    hash-partitioned ``Dataset.join`` per column (the multi-node scale
    path — two shuffles, no driver materialization)."""
    n = idmap_count if idmap_count is not None else idmap.count()
    if n <= broadcast_threshold:
        pdf = idmap.to_pandas()
        if "oid" not in pdf.columns:
            # to_pandas() of an EMPTY stream can drop the columns
            # entirely (zero-edge graph); rebuild the typed frame so
            # the broadcast lookup still ships a well-formed map
            pdf = pd.DataFrame({"oid": pd.Series([], dtype="int64"),
                                "vid": pd.Series([], dtype="int64")})
        pdf = pdf.sort_values("oid")
        # the oid side ships as an Arrow array (pc.index_in value_set)
        ref = ray.put(
            (pa.array(pdf["oid"].to_numpy()),
             pdf["vid"].to_numpy(dtype=np.int64))
        )
        return edges.map_batches(
            _broadcast_lookup_fn(ref, list(cols)),
            batch_format="pyarrow",
        )
    from graphscope_ray.util import shuffle_partitions
    out = edges
    for c in cols:
        out = out.join(
            idmap,
            join_type="inner",
            num_partitions=shuffle_partitions(num_partitions),
            on=(c,),
            right_on=("oid",),
            right_suffix="_r",
        )
        from graphscope_ray.util import rename
        out = rename(out.drop_columns([c]), {"vid": c})
    return out
