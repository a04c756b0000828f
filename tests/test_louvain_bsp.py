"""BSP-actor Louvain level-0 sweep (r01 VERDICT #8): engine path must
produce the same labels as the driver path on dense-vid simple graphs
(integer weights ⇒ exactly equal scores)."""

import numpy as np
import pytest

from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine
from graphscope_ray.graph.louvain import louvain

from conftest import edges_ds


def dense_graph(n=40, m=200, seed=11):
    """Random simple graph covering ALL vids 0..n-1 (ring + randoms),
    unique (u < v) pairs, integer weights."""
    rng = np.random.default_rng(seed)
    ring = np.stack([np.arange(n), (np.arange(n) + 1) % n], axis=1)
    rnd = rng.integers(0, n, size=(m, 2))
    e = np.r_[ring, rnd]
    e = e[e[:, 0] != e[:, 1]]
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    e = np.unique(np.stack([lo, hi], axis=1), axis=0)
    w = (1.0 + (e[:, 0] + e[:, 1]) % 5).astype(np.float64)
    return e, w


@pytest.mark.parametrize("P", [1, 3])
def test_engine_level0_matches_driver(tmp_path, P):
    e, w = dense_graph()
    n = 40
    ds = edges_ds(e, weights=w)
    vids_d, labels_d, q_d = louvain(ds, weight_col="weight")
    store = build_graph(ds, str(tmp_path / f"lv{P}"), num_parts=P,
                        num_vertices=n, symmetrize=True,
                        weight_col="weight")
    eng = BSPEngine(store)
    vids_e, labels_e, q_e = louvain(ds, weight_col="weight", engine=eng)
    np.testing.assert_array_equal(vids_d, vids_e)
    np.testing.assert_array_equal(labels_d, labels_e)
    assert abs(q_d - q_e) < 1e-12
    eng.shutdown()


def test_engine_path_bypasses_driver_row_guard(tmp_path):
    e, w = dense_graph(seed=3)
    ds = edges_ds(e, weights=w)
    store = build_graph(ds, str(tmp_path / "lvg"), num_parts=2,
                        num_vertices=40, symmetrize=True,
                        weight_col="weight")
    eng = BSPEngine(store)
    # driver guard would reject this row count; engine path must not
    with pytest.raises(NotImplementedError):
        louvain(ds, weight_col="weight", max_driver_rows=1)
    vids, labels, q = louvain(ds, weight_col="weight", engine=eng,
                              max_driver_rows=1)
    assert len(vids) == 40 and len(labels) == 40
    eng.shutdown()


def test_engine_matches_driver_with_isolated_vertices(tmp_path):
    """Sparse vid cover: vertices 7/13/21 isolated. Level-0 parity is
    keyed on ORIGINAL vids on both paths, so the two deterministic
    paths agree even though the driver path compacts the endpoint
    set (the r02 fuzz-campaign divergence)."""
    e, w = dense_graph(n=30, m=120, seed=23)
    # re-id endpoints to leave gaps in 0..39
    gaps = np.array(sorted(set(range(40)) - {7, 13, 21}))[:30]
    e = gaps[e]
    ds = edges_ds(e, weights=w)
    vids_d, labels_d, q_d = louvain(ds, weight_col="weight")
    store = build_graph(ds, str(tmp_path / "lvi"), num_parts=3,
                        num_vertices=40, symmetrize=True,
                        weight_col="weight")
    eng = BSPEngine(store)
    vids_e, labels_e, q_e = louvain(ds, weight_col="weight", engine=eng)
    lut_e = dict(zip(vids_e.tolist(), labels_e.tolist()))
    for v, l in zip(vids_d.tolist(), labels_d.tolist()):
        assert lut_e[v] == l, (v, lut_e[v], l)
    assert abs(q_d - q_e) < 1e-12
    eng.shutdown()
