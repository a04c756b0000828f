"""Small shared utilities."""

from __future__ import annotations

import pyarrow as pa

import ray.data


def rename(ds: ray.data.Dataset, mapping: dict) -> ray.data.Dataset:
    """Rename columns via an Arrow map_batches.

    ``Dataset.rename_columns`` in Ray 2.49 calls ``rename_columns`` on
    the underlying block and crashes when the block is pandas-backed
    (e.g. downstream of ``map_groups(batch_format="pandas")``); routing
    through a pyarrow batch is safe for any block type.
    """

    def do(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(do, batch_format="pyarrow")
