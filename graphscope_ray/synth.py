"""Deterministic synthetic edge generator for scale/bench runs.

Each block of edges is generated independently from ``seed + block_id``
inside ``map_batches`` over ``ray.data.range(num_blocks)`` — fully
parallel, no driver-side loops, identical output at any parallelism.
A Zipf-ish fraction of destinations concentrates on low vertex ids so
the generated graphs have realistic hub skew.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def synth_edge_dataset(
    num_vertices: int,
    num_edges: int,
    *,
    seed: int = 42,
    edges_per_block: int = 1_000_000,
    hub_fraction: float = 0.1,
    num_hubs: int = 1000,
) -> ray.data.Dataset:
    """→ Dataset (src:int64, dst:int64), dense vid space [0, V)."""
    num_blocks = max(1, (num_edges + edges_per_block - 1) // edges_per_block)

    def gen(batch: pa.Table) -> pa.Table:
        outs = []
        for bid in batch["id"].to_pylist():
            n = min(edges_per_block, num_edges - bid * edges_per_block)
            if n <= 0:
                continue
            rng = np.random.default_rng(seed * 1_000_003 + bid)
            src = rng.integers(0, num_vertices, size=n, dtype=np.int64)
            dst = rng.integers(0, num_vertices, size=n, dtype=np.int64)
            hub = rng.random(n) < hub_fraction
            dst[hub] = rng.integers(0, min(num_hubs, num_vertices),
                                    size=int(hub.sum()), dtype=np.int64)
            keep = src != dst
            outs.append(pa.table({"src": src[keep], "dst": dst[keep]}))
        if not outs:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    return ray.data.range(num_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=1
    )
