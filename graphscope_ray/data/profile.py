"""Exact single-column profiling over a Dataset — the "know your
corpus before you train on it" op: count / nulls / min / max / mean
plus EXACT discrete quantiles, at any scale.

Moments come from a per-batch partial pass (one tiny row per batch —
the combiner shape, nothing but O(#blocks) scalars reach the driver;
integer sums accumulate as Python ints so they never overflow).
Quantiles use a distributed range-partition sort of JUST the projected
column, then the block-metadata order-statistic trick (the same shape
as graph/ids.assign_dense_ids): global offsets come from block row
counts — O(#blocks) metadata — and only the ≤ len(quantiles) blocks
that actually contain a requested rank are ever fetched. No full
materialization on the driver at any size.

Quantile semantics match DuckDB ``quantile_disc`` exactly: the sorted
value at 0-based index ``max(0, ceil(q·n) - 1)`` (verified empirically
against DuckDB 1.x for n ∈ {4,5,7,10,101}).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd  # noqa: F401  (kept for parity with sibling modules)
import pyarrow as pa

import ray
import ray.data

from graphscope_ray.util import round_half_away


def _moments(ds: ray.data.Dataset, col: str) -> dict:
    def part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        c = t[col]
        n = len(c)
        nulls = c.null_count
        valid = pc.drop_null(c)
        if len(valid) == 0:
            return pa.table({"cnt": pa.array([n], pa.int64()),
                             "nulls": pa.array([nulls], pa.int64()),
                             "mn": pa.array([None], c.type),
                             "mx": pa.array([None], c.type),
                             "sm": pa.array([None], pa.string())})
        v = valid.to_numpy()
        # integer sums as exact Python ints (stringified — immune to
        # int64 overflow when blocks × values get big)
        sm = (str(int(v.sum(dtype=object)))
              if np.issubdtype(v.dtype, np.integer)
              else repr(float(v.sum(dtype=np.float64))))
        return pa.table({"cnt": pa.array([n], pa.int64()),
                         "nulls": pa.array([nulls], pa.int64()),
                         "mn": pa.array([v.min()], c.type),
                         "mx": pa.array([v.max()], c.type),
                         "sm": pa.array([sm], pa.string())})

    rows = ds.map_batches(part, batch_format="pyarrow").take_all()
    cnt = sum(r["cnt"] for r in rows)
    nulls = sum(r["nulls"] for r in rows)
    mns = [r["mn"] for r in rows if r["mn"] is not None]
    mxs = [r["mx"] for r in rows if r["mx"] is not None]
    sms = [r["sm"] for r in rows if r["sm"] is not None]
    if not sms:
        return {"cnt": cnt, "nulls": nulls, "mn": None, "mx": None,
                "total": None}
    is_int = all("." not in s and "e" not in s and "inf" not in s
                 for s in sms)
    total = (sum(int(s) for s in sms) if is_int
             else math.fsum(float(s) for s in sms))
    return {"cnt": cnt, "nulls": nulls, "mn": min(mns), "mx": max(mxs),
            "total": total}


def _order_statistics(ds: ray.data.Dataset, col: str,
                      ranks: list[int]) -> list:
    """Values at the given 0-based global ranks of the non-null sorted
    column — fetches only the blocks containing a requested rank."""
    def drop_nulls(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_valid(t[col]))

    vals = (ds.select_columns([col])
            .map_batches(drop_nulls, batch_format="pyarrow")
            .sort(col).materialize())
    blocks = []
    for bundle in vals.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            blocks.append((block_ref, meta.num_rows))
    out, offset, bi = {}, 0, 0
    want = sorted(set(ranks))
    wi = 0
    for block_ref, n in blocks:
        hit = []
        while wi < len(want) and want[wi] < offset + n:
            hit.append(want[wi] - offset)
            wi += 1
        if hit:
            blk = ray.get(block_ref)
            arr = blk[col].to_numpy() if isinstance(blk, pa.Table) \
                else blk[col].to_numpy()
            for local, rank in zip(hit, [offset + h for h in hit]):
                out[rank] = arr[local]
        offset += n
        bi += 1
        if wi >= len(want):
            break
    return [out[r] for r in ranks]


def column_profile(ds: ray.data.Dataset, col: str, *,
                   quantiles: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
                   ) -> ray.data.Dataset:
    """One-row profile of ``col``: ``(n, nulls, min, max, mean,
    q<pct>...)`` with mean rounded half-away at 6 dp and quantiles in
    DuckDB ``quantile_disc`` semantics (sorted value at
    ``ceil(q·n)-1``). SQL twin: ``count/min/max/round(avg,6)/
    quantile_disc`` — see the driver's ``doc_profile`` oracle."""
    m = _moments(ds, col)
    n_valid = m["cnt"] - m["nulls"]
    names = [f"q{int(round(q * 100))}" for q in quantiles]
    if n_valid == 0:
        cols = {"n": pa.array([m["cnt"]], pa.int64()),
                "nulls": pa.array([m["nulls"]], pa.int64()),
                "min": pa.array([None]), "max": pa.array([None]),
                "mean": pa.array([None], pa.float64())}
        for nm in names:
            cols[nm] = pa.array([None])
        return ray.data.from_arrow(pa.table(cols))
    ranks = [max(0, math.ceil(q * n_valid) - 1) for q in quantiles]
    qvals = _order_statistics(ds, col, ranks)
    mean = float(round_half_away(m["total"] / n_valid, 6))
    cols = {"n": pa.array([m["cnt"]], pa.int64()),
            "nulls": pa.array([m["nulls"]], pa.int64()),
            "min": pa.array([m["mn"]]),
            "max": pa.array([m["mx"]]),
            "mean": pa.array([mean], pa.float64())}
    for nm, v in zip(names, qvals):
        cols[nm] = pa.array([v])
    return ray.data.from_arrow(pa.table(cols))
