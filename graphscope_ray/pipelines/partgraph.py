"""The canonical SQL-verifiable co-occurrence graph ("partgraph").

Vertices = distinct ``l_partkey``; an undirected edge connects two
parts that co-occur in at least one order; ``weight`` = number of
shared orders. This mirrors the corpus edge-derivation rule
(FIXTURES.md §2: repo≈order, path≈part) over a table the driver's
DuckDB oracle can also see, so every graph app gets an independent
SQL cross-check.

Derivation runs exactly TWO all-to-all exchanges: (1) bucket rows by
order key — every lineitem of an order co-locates in its bucket, so
one vectorized per-bucket kernel both dedups (order, part) AND expands
each order's within-order part pairs with partial counts (replacing
the earlier distinct-groupby + hash self-join, two extra exchanges of
O(distinct lineitem) rows); (2) a bucketed single-key groupby over the
composite ``src<<32|dst`` pair key sums the partials. Ray 2.49's
multi-column groupby costs ~25 s on 1.4M rows where the packed-key
bucket groupby takes ~2 s, with the identical shuffle shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_NUM_BUCKETS = 32


def _pair_key(s: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Bijective (s, d) → int64 pack: uint64 ``s<<32|d`` reinterpreted
    as int64 (may be negative — only equality/grouping is used, never
    order). Full 32-bit id headroom (4.29B vertices); beyond that the
    scheme must move to a two-column key."""
    if len(s) and (s.max() >= 2**32 or d.max() >= 2**32):
        raise ValueError("pair ids exceed 32 bits; widen the key scheme")
    return ((s.astype(np.uint64) << np.uint64(32))
            | d.astype(np.uint64)).view(np.int64)


def _unpack_key(uk: np.ndarray) -> tuple:
    u = uk.view(np.uint64)
    return ((u >> np.uint64(32)).astype(np.int64),
            (u & np.uint64(0xFFFFFFFF)).astype(np.int64))


def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """One bucket's kernel: dedup (order, part), expand each order's
    within-order part pairs (src < dst by sorted position),
    partial-count by pair key — one vectorized kernel, no Python loop
    over orders.

    Pair-index expansion: element i (in-group offset r_i) pairs as
    the SECOND member with each of its r_i predecessors; the first
    member's global index is its pair's ordinal among those
    predecessors plus the group start."""
    empty = pd.DataFrame({"key": np.array([], np.int64),
                          "_w": np.array([], np.int64),
                          "b2": np.array([], np.int64)})
    if not len(g):
        return empty
    uk = np.unique(
        _pair_key(g["l_orderkey"].to_numpy(), g["l_partkey"].to_numpy()))
    order, part = _unpack_key(uk)  # sorted by (order, part), distinct
    _, starts_cnt = np.unique(order, return_counts=True)
    grp_start = np.concatenate(([0], np.cumsum(starts_cnt)[:-1]))
    elem_start = np.repeat(grp_start, starts_cnt)
    r = np.arange(len(order)) - elem_start  # in-group offset
    second = np.repeat(np.arange(len(order)), r)
    off = np.cumsum(r) - r  # exclusive prefix of pair counts
    first = np.arange(len(second)) - np.repeat(off, r) \
        + np.repeat(elem_start, r)
    if len(second) == 0:
        return empty
    key = _pair_key(part[first], part[second])  # sorted ⇒ src < dst
    pk, inv = np.unique(key, return_inverse=True)
    cnt = np.bincount(inv).astype(np.int64)
    return pd.DataFrame({"key": pk, "_w": cnt,
                         "b2": (pk % _NUM_BUCKETS).astype(np.int64)})


def partgraph_edges(sf_dir: str, *, num_partitions: int = 16) -> ray.data.Dataset:
    """→ Dataset (src:int64, dst:int64, weight:int64), src < dst."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    # exchange 1: bucket by order key — an order's lineitems co-locate
    def add_bucket(t: pa.Table) -> pa.Table:
        b = t["l_orderkey"].to_numpy() % _NUM_BUCKETS
        return t.append_column("b", pa.array(b.astype(np.int64)))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy()
        w = g["_w"].to_numpy()
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=w).astype(np.int64)
        src, dst = _unpack_key(uk)
        return pd.DataFrame({"src": src, "dst": dst, "weight": tot})

    # exchange 2: sum partials per pair key (bucketed single-key groupby)
    out = (
        li.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby("b2")
        .map_groups(combine, batch_format="pandas")
    )
    return out.map_batches(lambda t: t.select(["src", "dst", "weight"]),
                           batch_format="pyarrow")


def partgraph_vertices(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct endpoints (vid) of the undirected edge set."""
    def ends(t: pa.Table) -> pa.Table:
        v = np.unique(np.r_[t["src"].to_numpy(), t["dst"].to_numpy()])
        return pa.table({"vid": v})

    from graphscope_ray.util import bucketed_distinct
    return bucketed_distinct(
        edges.map_batches(ends, batch_format="pyarrow"), "vid")
