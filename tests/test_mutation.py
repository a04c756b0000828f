"""Full dynamic mutation (the reference's MODIFY_EDGES /
MODIFY_VERTICES over DynamicFragment — core/fragment/
dynamic_fragment.h:220-233, grape_instance.cc:247-296): in-place
delete/update on the resident pool must equal a rebuild from the
mutated edge table, at several partition counts and with hub stores."""

import numpy as np
import pytest

from graphscope_ray import oracle
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine

from conftest import collect, edges_ds, random_graph


def _delete_mask(e: np.ndarray) -> np.ndarray:
    """Deterministic ~1/3 subset of edge rows."""
    return (e[:, 0] * 131071 + e[:, 1]) % 3 == 0


@pytest.mark.parametrize("parts", [1, 2, 5])
def test_remove_edges_equals_rebuild(tmp_path, parts):
    e, n = random_graph(seed=41), 60
    store = build_graph(edges_ds(e), str(tmp_path / f"g{parts}"),
                        num_parts=parts, num_vertices=n)
    eng = BSPEngine(store)
    kill = _delete_mask(e)
    assert kill.any() and not kill.all()
    removed = eng.remove_edges(edges_ds(e[kill]))
    assert removed == int(kill.sum())
    kept = e[~kill]
    got = collect(eng.pagerank(max_round=5), "rank", n)
    want = oracle.pagerank(kept, n, 0.85, 5)
    np.testing.assert_allclose(got, want, atol=1e-12)
    got_d = collect(eng.sssp(0, unit=True), "dist", n)
    want_d = oracle.sssp(kept, n, 0)
    np.testing.assert_allclose(got_d, want_d, atol=1e-12)
    eng.shutdown()


def test_remove_missing_pairs_is_noop(tmp_path):
    e, n = random_graph(seed=42), 60
    store = build_graph(edges_ds(e), str(tmp_path / "g"),
                        num_parts=3, num_vertices=n)
    eng = BSPEngine(store)
    ghost = np.array([[57, 58], [58, 59], [0, 59]])
    # none of these exist (random_graph drops src >= n-3)
    assert eng.remove_edges(edges_ds(ghost)) == 0
    got = collect(eng.pagerank(max_round=5), "rank", n)
    np.testing.assert_allclose(got, oracle.pagerank(e, n, 0.85, 5),
                               atol=1e-12)
    eng.shutdown()


def test_remove_edges_on_hub_store(tmp_path):
    e, n = random_graph(seed=43), 60
    store = build_graph(edges_ds(e), str(tmp_path / "h"), num_parts=3,
                        num_vertices=n, hub_threshold=5)
    assert len(store.hubs)
    eng = BSPEngine(store)
    # delete a batch that includes hub-source edges (hub spread layout)
    hub = int(store.hubs[0])
    kill = (e[:, 0] == hub) | _delete_mask(e)
    assert eng.remove_edges(edges_ds(e[kill])) == int(kill.sum())
    kept = e[~kill]
    got = collect(eng.pagerank(max_round=5), "rank", n)
    np.testing.assert_allclose(got, oracle.pagerank(kept, n, 0.85, 5),
                               atol=1e-12)
    eng.shutdown()


def test_update_edge_weights_equals_rebuild(tmp_path):
    e, n = random_graph(seed=44), 60
    w = (1.0 + (e[:, 0] + e[:, 1]) % 4).astype(float)
    store = build_graph(edges_ds(e, weights=w), str(tmp_path / "w"),
                        num_parts=3, num_vertices=n, weight_col="weight")
    eng = BSPEngine(store)
    upd = _delete_mask(e)
    new_w = w.copy()
    new_w[upd] = 0.25
    touched = eng.update_edge_weights(edges_ds(e[upd], weights=new_w[upd]))
    assert touched == int(upd.sum())
    got = collect(eng.sssp(0), "dist", n)
    want = oracle.sssp(e, n, 0, weights=new_w)
    np.testing.assert_allclose(got, want, atol=1e-12)
    # duplicate pairs in one update call: last value wins
    dup = np.array([[int(e[0, 0]), int(e[0, 1])]] * 2)
    eng.update_edge_weights(edges_ds(dup, weights=np.array([9.0, 3.0])))
    new_w[np.flatnonzero((e[:, 0] == e[0, 0]) & (e[:, 1] == e[0, 1]))] = 3.0
    got = collect(eng.sssp(0), "dist", n)
    np.testing.assert_allclose(got, oracle.sssp(e, n, 0, weights=new_w),
                               atol=1e-12)
    eng.shutdown()


@pytest.mark.parametrize("parts", [2, 5])
def test_remove_vertices_equals_rebuild(tmp_path, parts):
    e, n = random_graph(seed=45), 60
    e = np.unique(e[e[:, 0] < e[:, 1]], axis=0)  # canonical direction
    store = build_graph(edges_ds(e), str(tmp_path / f"v{parts}"),
                        num_parts=parts, num_vertices=n, symmetrize=True)
    eng = BSPEngine(store)
    victims = np.array([3, 17, 29])
    removed = eng.remove_vertices(victims)
    incident = np.isin(e[:, 0], victims) | np.isin(e[:, 1], victims)
    assert removed == 2 * int(incident.sum())  # both stored directions
    kept = e[~incident]
    und_kept = np.r_[kept, kept[:, ::-1]]
    got = eng.wcc().to_pandas().sort_values("vid")
    # deleted vids are gone from the result entirely
    assert not np.isin(victims, got["vid"].to_numpy()).any()
    assert len(got) == n - len(victims)
    want = oracle.wcc(kept, n)
    surv = got["vid"].to_numpy()
    np.testing.assert_array_equal(got["comp"].to_numpy(), want[surv])
    # degrees at surviving sources shrank by their edges into victims
    got_pr = eng.pagerank(max_round=5).to_pandas().sort_values("vid")
    want_pr = oracle.pagerank(und_kept, n, 0.85, 5)
    np.testing.assert_allclose(got_pr["rank"].to_numpy(),
                               want_pr[surv], atol=1e-12)
    eng.shutdown()


def test_clear_edges_and_regrow(tmp_path):
    e, n = random_graph(seed=46), 60
    store = build_graph(edges_ds(e), str(tmp_path / "c"),
                        num_parts=3, num_vertices=n)
    eng = BSPEngine(store)
    eng.clear_edges()
    comp = collect(eng.wcc(), "comp", n)
    np.testing.assert_array_equal(comp, np.arange(n))  # all isolated
    # append the original edges back: full round-trip
    eng.append_edges(edges_ds(e))
    got = collect(eng.pagerank(max_round=5), "rank", n)
    np.testing.assert_allclose(got, oracle.pagerank(e, n, 0.85, 5),
                               atol=1e-12)
    eng.shutdown()


def test_remove_then_append_roundtrip(tmp_path):
    e, n = random_graph(seed=47), 60
    store = build_graph(edges_ds(e), str(tmp_path / "r"),
                        num_parts=3, num_vertices=n)
    eng = BSPEngine(store)
    kill = _delete_mask(e)
    eng.remove_edges(edges_ds(e[kill]))
    eng.append_edges(edges_ds(e[kill]))
    got = collect(eng.pagerank(max_round=5), "rank", n)
    np.testing.assert_allclose(got, oracle.pagerank(e, n, 0.85, 5),
                               atol=1e-12)
    eng.shutdown()


def test_add_vertices_extends_space(tmp_path):
    e, n = random_graph(seed=48), 60
    store = build_graph(edges_ds(e), str(tmp_path / "a"),
                        num_parts=3, num_vertices=n, symmetrize=True)
    eng = BSPEngine(store)
    assert eng.add_vertices(5) == n + 5
    # new vertices are isolated; apps run over the extended space
    comp = collect(eng.wcc(), "comp", n + 5)
    np.testing.assert_array_equal(comp, oracle.wcc(e, n + 5))
    # and can immediately take appended edges (both directions on the
    # symmetrized store, like the build would)
    new = np.array([[0, n], [n, 0], [n, n + 1], [n + 1, n]])
    eng.append_edges(edges_ds(new))
    e2 = np.r_[e, [[0, n], [n, n + 1]]]
    comp2 = collect(eng.wcc(), "comp", n + 5)
    np.testing.assert_array_equal(comp2, oracle.wcc(e2, n + 5))
    eng.shutdown()


def test_graph_facade_mutation_oid_space(tmp_path):
    """Graph.remove_edges/remove_vertices in oid space on a
    symmetrized store: both stored directions go, results stay keyed
    by oid."""
    from graphscope_ray.graph.api import Graph

    rng = np.random.default_rng(49)
    e = np.unique(rng.integers(0, 40, size=(150, 2)), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    oid_e = e * 10 + 3  # sparse oids
    g = Graph.from_edges(edges_ds(oid_e),
                         workdir=str(tmp_path / "f"),
                         num_parts=3, symmetrize=True)
    kill = _delete_mask(oid_e)
    g.remove_edges(edges_ds(oid_e[kill]))
    kept = oid_e[~kill]
    got = g.to_oid(g.wcc(), vid_cols=("vid", "comp")).to_pandas()
    got = got.sort_values("vid")
    # oracle over the remaining symmetrized edges in dense-rank space
    oids = np.unique(oid_e)
    dense = np.searchsorted(oids, kept)
    und = np.r_[dense, dense[:, ::-1]]
    want = oracle.wcc(und, len(oids))
    np.testing.assert_array_equal(got["vid"].to_numpy(), oids)
    np.testing.assert_array_equal(got["comp"].to_numpy(), oids[want])
    # vertex deletion via the facade
    victims = oids[:2]
    g.remove_vertices(victims)
    got2 = g.to_oid(g.wcc(), vid_cols=("vid", "comp")).to_pandas()
    assert not np.isin(victims, got2["vid"].to_numpy()).any()
    assert len(got2) == len(oids) - 2
    g.close()
