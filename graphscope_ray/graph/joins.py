"""Broadcast-or-shuffle value attachment (the engine's join primitive).

The reference has no relational join operator; gathers over adjacency
are its implicit joins (SURVEY.md §2.5). Here small sides are broadcast
once via ``ray.put`` and probed with vectorized ``searchsorted`` inside
``map_batches`` (no shuffle); large sides fall back to Ray Data's
hash-partitioned ``Dataset.join``. ``cogroup_join`` is the robust
one-to-many shuffle join (union + groupby + map_groups) used where
chained ``Dataset.join`` would hit Ray 2.49's empty-partition crash.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

BROADCAST_ROWS = 20_000_000


def _sentinel_like(dtype, nrows):
    """Typed filler so every union block keeps one schema (the _kind
    flag, not the value, distinguishes the two sides)."""
    if isinstance(dtype, pa.DataType):
        if pa.types.is_integer(dtype):
            return np.full(nrows, -1, dtype=np.int64)
        if pa.types.is_floating(dtype):
            return np.full(nrows, np.nan)
        if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
            return pd.Series([""] * nrows, dtype=object)
        return pd.Series([b""] * nrows, dtype=object)
    if np.issubdtype(dtype, np.integer):
        return np.full(nrows, -1, dtype=np.int64)
    if np.issubdtype(dtype, np.floating):
        return np.full(nrows, np.nan)
    return pd.Series([""] * nrows, dtype=object)


def cogroup_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    right_on: str,
    value_cols: list,
) -> ray.data.Dataset:
    """Inner one-to-many hash join: one output row per matching
    (left row, right row) pair, carrying every left column plus
    ``value_cols`` from the right.

    Expressed as union + ``groupby(key).map_groups`` (one shuffle, like
    a hash join) instead of ``Dataset.join`` because Ray 2.49's
    hash-shuffle join aggregator crashes on partitions that receive
    rows on one side only — routine for sparse key sets."""
    lsch = left.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    lcarry = [c for c in lsch.names if c != on]
    rsch = right.schema()
    rtypes = dict(zip(rsch.names, rsch.types))

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={on: "_k"})[["_k"] + lcarry].copy()
        for c in value_cols:
            out[c] = _sentinel_like(rtypes[c], len(df))
        out["_kind"] = np.full(len(df), 0, dtype=np.int8)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"_k": df[right_on].to_numpy()})
        for c in lcarry:
            out[c] = _sentinel_like(ltypes[c], len(df))
        for c in value_cols:
            out[c] = df[c].to_numpy()
        out["_kind"] = np.full(len(df), 1, dtype=np.int8)
        return out

    def add_cb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_cb"] = np.mod(df["_k"].to_numpy(), 32).astype(np.int64)
        return df

    both = left.map_batches(tag_left, batch_format="pandas") \
        .map_batches(add_cb, batch_format="pandas").union(
            right.map_batches(tag_right, batch_format="pandas")
            .map_batches(add_cb, batch_format="pandas"))

    def expand_coarse(g: pd.DataFrame) -> pd.DataFrame:
        # every key group of one coarse (_k % 32) route expands in one
        # vectorized cross-product kernel — per-distinct-key map_groups
        # dispatch costs ~100 µs/group (see pipelines/partgraph.py)
        out_cols = [on] + lcarry + list(value_cols)
        g = g.drop(columns=["_cb"])
        if not len(g):
            return (g.rename(columns={"_k": on})
                    .drop(columns=["_kind"])[out_cols])
        k = g["_k"].to_numpy()
        kind = g["_kind"].to_numpy()
        order = np.lexsort((kind, k))  # lefts precede rights per key
        ks, kinds = k[order], kind[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        cnt = np.diff(np.r_[starts, len(ks)])
        gid = np.repeat(np.arange(len(starts)), cnt)
        is_l = kinds == 0
        l_cnt = np.bincount(gid[is_l], minlength=len(starts))
        r_cnt = cnt - l_cnt
        left_pos = np.flatnonzero(is_l)
        reps = r_cnt[gid[left_pos]]
        total = int(reps.sum())
        if total == 0:
            return (g.iloc[:0].rename(columns={"_k": on})
                    .drop(columns=["_kind"])[out_cols])
        out_left = np.repeat(left_pos, reps)          # sorted positions
        block_start = np.cumsum(reps) - reps
        woff = np.arange(total) - np.repeat(block_start, reps)
        r_start = starts + l_cnt                      # first right row
        out_right = np.repeat(r_start[gid[left_pos]], reps) + woff
        out = (g.iloc[order[out_left]]
               .rename(columns={"_k": on}).drop(columns=["_kind"]))
        for c in value_cols:
            out[c] = g[c].to_numpy()[order[out_right]]
        return out[out_cols].reset_index(drop=True)

    return both.groupby("_cb").map_groups(
        expand_coarse, batch_format="pandas")


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
            if len(keys):
                out = np.where(hit, cols[name][idx], defaults.get(name, 0))
            else:  # empty lookup: every row misses → all defaults
                out = np.full(len(vals), defaults.get(name, 0))
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
    if table_count is None:
        # the table is consumed twice (count() for route selection,
        # then the broadcast read / join) — pin it so a lazy upstream
        # pipeline doesn't execute twice; no-op-cheap when the caller
        # already materialized
        table = table.materialize()
    n = table_count if table_count is not None else table.count()
    if n <= BROADCAST_ROWS:
        pdf = table.select_columns([table_key, *value_names]).to_pandas()
        if len(pdf) == 0:
            # to_pandas() of an empty Dataset can drop its columns —
            # rebuild the empty frame so the lookup maps to all-miss
            # (every row gets defaults) instead of a KeyError
            pdf = pd.DataFrame({c: [] for c in (table_key, *value_names)})
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
