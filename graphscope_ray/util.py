"""Small shared utilities."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def shuffle_partitions(requested=None) -> int:
    """Cap a hash-shuffle/join partition count by schedulable CPUs.
    ``Dataset.join`` spawns ``num_partitions`` resident shuffle actors;
    asking for more actors than the cluster has CPUs deadlocks the
    streaming executor (observed with 32 partitions on a 4-CPU local
    session)."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8))
    cap = max(2, cpus - 2)
    return min(requested or 32, cap)


def round_half_away(x, nd: int = 6):
    """Round half away from zero — the convention of SQL ``round()``
    (DuckDB, ANSI). ``np.round``/builtin ``round`` round ties to even,
    which diverges from the DuckDB oracle whenever a value lands
    exactly on a .5 boundary at ``nd`` digits (the r01 ``doc_quality``
    red row). Every float column that is hash-compared against a SQL
    ``round()`` must go through this helper."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** nd
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


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
