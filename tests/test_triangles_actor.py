"""Partition-local (actor-pool) triangle counting vs the independent
oracle and the broadcast path, across partition counts."""

import numpy as np
import pytest

from graphscope_ray import oracle
from graphscope_ray.graph import api
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine

from conftest import (
    CHAIN_10,
    STAR_HUB,
    TWO_TRIANGLES_BRIDGE,
    collect,
    edges_ds,
    random_graph,
)


def canon_pairs(e):
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    keep = lo != hi
    return np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)


@pytest.mark.parametrize("local_limit", [64_000_000, 0],
                         ids=["local-close", "routed-probes"])
@pytest.mark.parametrize("P", [1, 2, 5])
@pytest.mark.parametrize(
    "edges,n",
    [
        (TWO_TRIANGLES_BRIDGE, 6),
        (STAR_HUB, 9),
        (CHAIN_10, 10),
        (random_graph(), 60),
        (random_graph(seed=7, n=40, m=300), 40),
    ],
)
def test_actor_triangles_matches_oracle(tmp_path, P, edges, n, local_limit):
    store = build_graph(edges_ds(edges), str(tmp_path / f"t{P}{local_limit}"),
                        num_parts=P, num_vertices=n, symmetrize=True)
    eng = BSPEngine(store)
    got = collect(eng.triangles(chunk=64, local_keys_limit=local_limit),
                  "tri_cnt", n)
    want = oracle.triangles_per_vertex(canon_pairs(edges), n)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()


def test_actor_triangles_matches_broadcast_path(tmp_path):
    e, n = random_graph(seed=3, n=80, m=900), 80
    store = build_graph(edges_ds(e), str(tmp_path / "tb"), num_parts=3,
                        num_vertices=n, symmetrize=True)
    eng = BSPEngine(store)
    got = collect(eng.triangles(), "tri_cnt", n)
    bc = api.triangles(edges_ds(canon_pairs(e)))
    want = collect(bc, "tri_cnt", n, fill=0)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()


def test_actor_triangles_with_hub_split(tmp_path):
    e, n = STAR_HUB, 9
    store = build_graph(edges_ds(e), str(tmp_path / "th"), num_parts=3,
                        num_vertices=n, symmetrize=True, hub_threshold=4)
    assert len(store.hubs) > 0  # the hub's edges really moved
    eng = BSPEngine(store)
    got = collect(eng.triangles(), "tri_cnt", n)
    want = oracle.triangles_per_vertex(canon_pairs(e), n)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()


def test_local_close_chunk_boundaries(tmp_path):
    # force many tiny internal chunks through tri_count_local so the
    # flat-range enumeration boundaries (wedge ranges straddling
    # chunk edges) are exercised on the local-closing route
    e, n = random_graph(seed=11, n=70, m=700), 70
    store = build_graph(edges_ds(e), str(tmp_path / "tc"), num_parts=4,
                        num_vertices=n, symmetrize=True)
    eng = BSPEngine(store)
    got = collect(eng.triangles(local_chunk=37), "tri_cnt", n)
    want = oracle.triangles_per_vertex(canon_pairs(e), n)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()


def test_join_path_matches_oracle():
    # broadcast_edge_limit=0 forces the Dataset.join scale path (the
    # 100x-scale fallback had no direct coverage before)
    e, n = random_graph(seed=19, n=50, m=400), 50
    ce = canon_pairs(e)
    got = (api.triangles(edges_ds(ce), broadcast_edge_limit=0)
           .to_pandas().set_index("vid")["tri_cnt"])
    want = oracle.triangles_per_vertex(ce, n)
    full = np.zeros(n, dtype=np.int64)
    full[got.index.to_numpy()] = got.to_numpy()
    np.testing.assert_array_equal(full, want)
