"""The canonical SQL-verifiable co-occurrence graph ("partgraph").

Vertices = distinct ``l_partkey``; an undirected edge connects two
parts that co-occur in at least one order; ``weight`` = number of
shared orders. This mirrors the corpus edge-derivation rule
(FIXTURES.md §2: repo≈order, path≈part) over a table the driver's
DuckDB oracle can also see, so every graph app gets an independent
SQL cross-check.

Derivation is expressed with Ray Data's hash-partitioned self-join
(``Dataset.join`` on the order key) + combiner-style partial counts —
no driver-side loops, no per-group python calls.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Sum

from graphscope_ray.util import rename


def partgraph_edges(sf_dir: str, *, num_partitions: int = 16) -> ray.data.Dataset:
    """→ Dataset (src:int64, dst:int64, weight:int64), src < dst."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    lp = (
        li.groupby(["l_orderkey", "l_partkey"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    ).materialize()  # consumed twice by the self-join: avoid recompute
    left = rename(lp, {"l_partkey": "src"})
    right = rename(lp, {"l_partkey": "dst"})
    joined = left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
    )

    def lower_pairs(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        keep = s < d
        s, d = s[keep], d[keep]
        # combiner: partial (src, dst) counts within the batch
        if len(s) == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "_w": pa.array([], pa.int64())})
        key = s.astype(np.int64) * (d.max() + 1) + d
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        base = d.max() + 1
        return pa.table({"src": uk // base, "dst": uk % base, "_w": cnt})

    partial = joined.map_batches(lower_pairs, batch_format="pyarrow")
    return partial.groupby(["src", "dst"]).aggregate(
        Sum("_w", alias_name="weight")
    )


def partgraph_vertices(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct endpoints (vid) of the undirected edge set."""

    def ends(t: pa.Table) -> pa.Table:
        v = np.unique(np.r_[t["src"].to_numpy(), t["dst"].to_numpy()])
        return pa.table({"vid": v})

    return (
        edges.map_batches(ends, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )
