"""Incremental PageRank after append_edges: equals a cold recompute
at the same tolerance, in fewer supersteps."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.graph.api import Graph


def _edges(rng, n, m):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    # canonical (min, max) so the append delta can be made disjoint
    # from the base under symmetrization (an appended reverse copy of
    # an existing edge would create a multi-edge)
    return (pd.DataFrame({"src": np.minimum(src, dst)[keep],
                          "dst": np.maximum(src, dst)[keep]})
            .drop_duplicates().reset_index(drop=True))


@pytest.mark.parametrize("P", [1, 3])
def test_pr_incremental_matches_cold(tmp_path, P):
    rng = np.random.default_rng(44)
    df = _edges(rng, 100, 400)
    # the delta must only touch existing vertices (append-only edges)
    extra = _edges(rng, 100, 80)
    key = lambda d: set(map(tuple, d.values.tolist()))
    extra = extra[~extra.apply(tuple, axis=1).isin(key(df))]

    g = Graph.from_edges(ray.data.from_pandas(df),
                         workdir=str(tmp_path / "a"), num_parts=P,
                         symmetrize=True)
    try:
        _ = g.pagerank(tol=1e-10).to_pandas()  # converge the base run
        seeds = g.append_edges(ray.data.from_pandas(extra))
        assert len(seeds)
        base_steps = g.engine.supersteps
        warm = g.to_oid(g.engine.pagerank_incremental(tol=1e-10)
                        ).to_pandas()
        warm_steps = g.engine.supersteps - base_steps
    finally:
        g.close()

    # cold recompute over the unioned edge table
    full = pd.concat([df, extra], ignore_index=True).drop_duplicates()
    g2 = Graph.from_edges(ray.data.from_pandas(full),
                          workdir=str(tmp_path / "b"), num_parts=P,
                          symmetrize=True)
    try:
        cold_base = g2.engine.supersteps
        cold = g2.to_oid(g2.pagerank(tol=1e-10)).to_pandas()
        cold_steps = g2.engine.supersteps - cold_base
    finally:
        g2.close()

    w = warm.sort_values(warm.columns[0]).reset_index(drop=True)
    c = cold.sort_values(cold.columns[0]).reset_index(drop=True)
    assert (w[w.columns[0]].to_numpy() == c[c.columns[0]].to_numpy()).all()
    np.testing.assert_allclose(w[w.columns[-1]].to_numpy(),
                               c[c.columns[-1]].to_numpy(), atol=1e-8)
    assert warm_steps < cold_steps
