"""Graph.save / Graph.open — reuse a built graph across sessions (the
vineyard-resident-graph analogue, grape_instance.cc:200-208)."""

import numpy as np

from graphscope_ray import oracle
from graphscope_ray.graph.api import Graph

from conftest import edges_ds, random_graph


def test_save_open_roundtrip(tmp_path):
    e = random_graph(seed=61)
    oid_e = e * 7 + 2  # sparse oids exercise the idmap
    g = Graph.from_edges(edges_ds(oid_e), workdir=str(tmp_path / "g"),
                         num_parts=3, symmetrize=True)
    want = g.to_oid(g.pagerank(max_round=5)).to_pandas().sort_values("vid")
    path = g.save()
    g.close()

    g2 = Graph.open(path)
    assert g2.idmap_count == g.idmap_count
    got = g2.to_oid(g2.pagerank(max_round=5)).to_pandas().sort_values("vid")
    np.testing.assert_array_equal(got["vid"].to_numpy(),
                                  want["vid"].to_numpy())
    np.testing.assert_allclose(got["rank"].to_numpy(),
                               want["rank"].to_numpy(), atol=1e-12)
    # reopened graphs mutate like fresh ones
    g2.remove_vertices(want["vid"].to_numpy()[:2])
    assert g2.to_oid(g2.wcc(), vid_cols=("vid", "comp")).count() == \
        len(want) - 2
    g2.close()


def test_open_vid_space_store(tmp_path):
    from graphscope_ray.graph.build import build_graph
    e, n = random_graph(seed=62), 60
    build_graph(edges_ds(e), str(tmp_path / "s"), num_parts=2,
                num_vertices=n)
    g = Graph.open(str(tmp_path / "s"))
    assert g.idmap is None
    pr = g.pagerank(max_round=4).to_pandas().sort_values("vid")
    np.testing.assert_allclose(pr["rank"].to_numpy(),
                               oracle.pagerank(e, n, 0.85, 4), atol=1e-12)
    g.close()
