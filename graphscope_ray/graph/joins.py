"""Broadcast-or-shuffle value attachment (the engine's join primitive).

The reference has no relational join operator; gathers over adjacency
are its implicit joins (SURVEY.md §2.5). Here small sides are broadcast
once via ``ray.put`` and probed with vectorized ``searchsorted`` inside
``map_batches`` (no shuffle); large sides fall back to Ray Data's
hash-partitioned ``Dataset.join``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

BROADCAST_ROWS = 20_000_000


def _attach_lookup_fn(ref, on, value_names, defaults):
    """Stateless broadcast-probe batch mapper (ray.get per batch is a
    zero-copy local-object-store read; avoids per-stage actor pools)."""

    def f(batch: pa.Table) -> pa.Table:
        keys, cols = ray.get(ref)
        vals = batch.column(on).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, vals)
        idx = np.clip(idx, 0, max(0, len(keys) - 1))
        hit = (
            keys[idx] == vals
            if len(keys)
            else np.zeros(len(vals), dtype=bool)
        )
        for name in value_names:
            out = np.where(hit, cols[name][idx], defaults.get(name, 0))
            batch = batch.append_column(name, pa.array(out))
        return batch

    return f


def attach_values(
    ds: ray.data.Dataset,
    table: ray.data.Dataset,
    *,
    on: str,
    table_key: str,
    value_names,
    defaults: Optional[dict] = None,
    table_count: Optional[int] = None,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Left-join ``table[value_names]`` onto ``ds`` by ``ds[on] ==
    table[table_key]`` (missing keys get ``defaults``)."""
    defaults = defaults or {}
    n = table_count if table_count is not None else table.count()
    if n <= BROADCAST_ROWS:
        pdf = table.select_columns([table_key, *value_names]).to_pandas()
        pdf = pdf.sort_values(table_key)
        ref = ray.put(
            (
                pdf[table_key].to_numpy(),
                {v: pdf[v].to_numpy() for v in value_names},
            )
        )
        return ds.map_batches(
            _attach_lookup_fn(ref, on, list(value_names), defaults),
            batch_format="pyarrow",
        )
    from graphscope_ray.util import shuffle_partitions
    joined = ds.join(
        table.select_columns([table_key, *value_names]),
        join_type="left_outer",
        num_partitions=shuffle_partitions(num_partitions),
        on=(on,),
        right_on=(table_key,),
        right_suffix="_r",
    )
    drop = table_key + "_r" if table_key == on else table_key
    if drop in joined.columns():
        joined = joined.drop_columns([drop])
    if defaults:
        # left_outer leaves nulls where the broadcast path fills
        # defaults — coalesce so both paths return identical results
        names = list(value_names)

        def fill(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            for name in names:
                col = t[name]
                if col.null_count:
                    filled = pc.fill_null(col, defaults.get(name, 0))
                    t = t.set_column(
                        t.schema.get_field_index(name), name, filled)
            return t

        joined = joined.map_batches(fill, batch_format="pyarrow")
    return joined
