"""Louvain: engine (vectorized) vs independent slow-loop oracle."""

import numpy as np
import pytest

from graphscope_ray import oracle
from graphscope_ray.graph.louvain import louvain

from conftest import TWO_TRIANGLES_BRIDGE, edges_ds, random_graph


def test_two_triangles_communities():
    vids, labels, q = louvain(edges_ds(TWO_TRIANGLES_BRIDGE))
    lut = dict(zip(vids, labels))
    # the two triangles form two communities
    assert lut[0] == lut[1] == lut[2]
    assert lut[3] == lut[4] == lut[5]
    assert lut[0] != lut[3]
    assert q > 0.2


@pytest.mark.parametrize("seed", [3, 7, 11])
def test_matches_oracle(seed):
    e = random_graph(seed=seed, ensure_dangling=False)
    uv = np.unique(np.sort(e, axis=1), axis=0)
    uv = uv[uv[:, 0] != uv[:, 1]]
    vids, labels, q = louvain(edges_ds(uv))
    ovids, olabels, oq = oracle.louvain(uv, 60)
    np.testing.assert_array_equal(vids, ovids)
    np.testing.assert_array_equal(labels, olabels)
    assert abs(q - oq) < 1e-9


def test_deterministic_and_improves_modularity():
    e = random_graph(seed=19, ensure_dangling=False)
    uv = np.unique(np.sort(e, axis=1), axis=0)
    uv = uv[uv[:, 0] != uv[:, 1]]
    r1 = louvain(edges_ds(uv))
    r2 = louvain(edges_ds(uv))
    np.testing.assert_array_equal(r1[1], r2[1])
    assert r1[2] == r2[2]
    # modularity of result beats singleton partition (which is < 0)
    assert r1[2] > 0.0
