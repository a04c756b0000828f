"""Append-only incremental SSSP, the CSV loader surface, ADD_LABELS
recipe, and the extended REPORT_GRAPH ops."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from graphscope_ray import io, oracle
from graphscope_ray.graph import api
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine

from conftest import collect, edges_ds, random_graph


def test_incremental_sssp_matches_full_recompute(tmp_path):
    e, n = random_graph(seed=21), 60
    w = (1.0 + (e[:, 0] + e[:, 1]) % 4).astype(float)
    store = build_graph(edges_ds(e, weights=w), str(tmp_path / "a"),
                        num_parts=3, num_vertices=n, weight_col="weight")
    eng = BSPEngine(store)
    eng.sssp(0)
    new = np.array([[0, 55], [12, 57], [55, 58]])
    new_w = np.array([1.0, 2.0, 1.0])
    seeds = eng.append_edges(edges_ds(new, weights=new_w),
                             weight_col="weight")
    got = collect(eng.sssp_incremental(seeds), "dist", n)
    all_e = np.r_[e, new]
    all_w = np.r_[w, new_w]
    want = oracle.sssp(all_e, n, 0, weights=all_w)
    np.testing.assert_allclose(got, want, atol=1e-12)
    # other apps still agree on the appended store
    got_pr = collect(eng.pagerank(max_round=5), "rank", n)
    want_pr = oracle.pagerank(all_e, n, 0.85, 5)
    np.testing.assert_allclose(got_pr, want_pr, atol=1e-12)
    eng.shutdown()


def test_incremental_sssp_with_hub_store(tmp_path):
    e, n = random_graph(seed=33), 60
    store = build_graph(edges_ds(e), str(tmp_path / "h"), num_parts=3,
                        num_vertices=n, hub_threshold=5)
    assert len(store.hubs)
    eng = BSPEngine(store)
    eng.sssp(0, unit=True)
    hub = int(store.hubs[0])
    new = np.array([[hub, 58], [58, 59]])
    seeds = eng.append_edges(edges_ds(new))
    got = collect(eng.sssp_incremental(seeds), "dist", n)
    want = oracle.sssp(np.r_[e, new], n, 0)
    np.testing.assert_allclose(got, want, atol=1e-12)
    eng.shutdown()


def test_csv_loader_options(tmp_path):
    p = tmp_path / "edges.csv"
    p.write_text("1|2|0.5\n2|3|1.5\n")
    ds = io.read_csv(str(p), delimiter="|", header=False,
                     column_names=["src", "dst", "weight"])
    pdf = ds.to_pandas()
    assert pdf["src"].tolist() == [1, 2]
    assert pdf["weight"].tolist() == [0.5, 1.5]
    ds2 = io.read_csv(str(p), delimiter="|", header=False,
                      column_names=["src", "dst", "weight"],
                      columns=["src", "dst"])
    assert set(ds2.to_pandas().columns) == {"src", "dst"}


def test_write_context_sinks(tmp_path):
    ds = ray.data.from_arrow(pa.table({"vid": pa.array([1, 2, 3]),
                                       "rank": pa.array([0.1, 0.2, 0.7])}))
    from graphscope_ray.io import write_context
    import pandas as pd
    write_context(ds, f"file://{tmp_path}/out.csv")
    got = pd.concat([pd.read_csv(f"{tmp_path}/out.csv/{f}")
                     for f in sorted(__import__('os').listdir(
                         f"{tmp_path}/out.csv"))])
    assert sorted(got["vid"].tolist()) == [1, 2, 3]
    write_context(ds, str(tmp_path / "out_pq"))
    back = ray.data.read_parquet(str(tmp_path / "out_pq")).to_pandas()
    assert sorted(back["vid"].tolist()) == [1, 2, 3]
    with pytest.raises(NotImplementedError):
        write_context(ds, "oss://bucket/key.parquet")


def test_add_labels_and_project():
    person = ray.data.from_arrow(pa.table({"vid": pa.array([1, 2])}))
    post = ray.data.from_arrow(pa.table({"vid": pa.array([10])}))
    both = io.add_labels({"person": person, "post": post})
    pdf = both.to_pandas()
    assert sorted(pdf["label"].unique()) == ["person", "post"]
    only = io.project_label(both, "person").to_pandas()
    assert only["vid"].tolist() == [1, 2]
    assert "label" not in only.columns


def test_report_graph_extended_ops():
    e = np.array([[0, 1], [1, 2], [2, 0], [3, 1]])
    ds = edges_ds(e)
    assert api.has_node(ds, 3) and not api.has_node(ds, 9)
    assert api.has_edge(ds, 1, 2) and not api.has_edge(ds, 2, 1)
    assert api.node_degree(ds, 1, mode="in") == 2
    assert api.node_degree(ds, 1, mode="out") == 1
    assert api.node_degree(ds, 1) == 3
    np.testing.assert_array_equal(api.neighbors(ds, 1, mode="succ"), [2])
    np.testing.assert_array_equal(api.neighbors(ds, 1, mode="pred"), [0, 3])
    np.testing.assert_array_equal(api.neighbors(ds, 1, mode="both"), [0, 2, 3])


def test_incremental_wcc_matches_full_recompute(tmp_path):
    e, n = random_graph(seed=44), 60
    # keep two halves disconnected, then bridge them via append
    lo = e[(e[:, 0] < 30) & (e[:, 1] < 30)]
    hi = e[(e[:, 0] >= 30) & (e[:, 1] >= 30)]
    base = np.r_[lo, hi]
    store = build_graph(edges_ds(base), str(tmp_path / "w"),
                        num_parts=3, num_vertices=n, symmetrize=True)
    eng = BSPEngine(store)
    before = collect(eng.wcc(), "comp", n)
    assert len(np.unique(before)) >= 2
    new = np.array([[7, 41], [3, 55]])
    seeds = eng.append_edges(edges_ds(new))
    got = collect(eng.wcc_incremental(seeds), "comp", n)
    want = oracle.wcc(np.r_[base, new], n)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()


def test_incremental_wcc_with_hub_store(tmp_path):
    e, n = random_graph(seed=55), 60
    lo = e[(e[:, 0] < 30) & (e[:, 1] < 30)]
    hi = e[(e[:, 0] >= 30) & (e[:, 1] >= 30)]
    base = np.r_[lo, hi]
    store = build_graph(edges_ds(base), str(tmp_path / "wh"),
                        num_parts=3, num_vertices=n, symmetrize=True,
                        hub_threshold=3)
    assert len(store.hubs)
    eng = BSPEngine(store)
    eng.wcc()
    hub = int(store.hubs[0])
    other = 59 if hub < 30 else 0
    new = np.array([[hub, other]])
    seeds = eng.append_edges(edges_ds(new))
    got = collect(eng.wcc_incremental(seeds), "comp", n)
    want = oracle.wcc(np.r_[base, new], n)
    np.testing.assert_array_equal(got, want)
    eng.shutdown()
