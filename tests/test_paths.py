"""sssp_path / has_path / average_length / bfs_generic vs oracle."""

import numpy as np
import pytest

from graphscope_ray import oracle
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine

from conftest import CHAIN_10, collect, edges_ds, random_graph


def make_engine(tmp_path, edges_np, n, P, tag="", **kw):
    store = build_graph(edges_ds(edges_np, kw.pop("weights", None)),
                        str(tmp_path / f"s{P}{tag}"),
                        num_parts=P, num_vertices=n, **kw)
    return BSPEngine(store)


@pytest.mark.parametrize("P", [1, 3])
def test_sssp_path(tmp_path, P):
    e, n = random_graph(seed=41), 60
    rng = np.random.default_rng(4)
    w = rng.uniform(0.5, 2.0, size=len(e))
    store = build_graph(edges_ds(e, w), str(tmp_path / f"sp{P}"),
                        num_parts=P, num_vertices=n, weight_col="weight")
    eng = BSPEngine(store)
    pdf = eng.sssp_path(0).to_pandas().sort_values("vid")
    dist = pdf["dist"].to_numpy()
    pred = pdf["pred"].to_numpy()
    want = oracle.sssp(e, n, 0, w)
    np.testing.assert_allclose(dist, want, atol=1e-12)
    # predecessor validity: dist[v] == dist[pred[v]] + w(pred→v)
    wmap = {(int(a), int(b)): float(x) for (a, b), x in zip(e, w)}
    for v in range(n):
        if np.isfinite(dist[v]) and v != 0:
            p = int(pred[v])
            assert p >= 0
            assert abs(dist[v] - (dist[p] + wmap[(p, v)])) < 1e-9
    eng.shutdown()


def test_sssp_path_partition_invariant(tmp_path):
    e, n = random_graph(seed=43), 60
    outs = []
    for P in (2, 5):
        eng = make_engine(tmp_path, e, n, P, tag="inv")
        pdf = eng.sssp_path(0, unit=True).to_pandas().sort_values("vid")
        outs.append(pdf[["dist", "pred"]].to_numpy())
        eng.shutdown()
    np.testing.assert_array_equal(outs[0], outs[1])


def test_sssp_has_path(tmp_path):
    e, n = CHAIN_10, 10
    eng = make_engine(tmp_path, e, n, 2)
    assert eng.sssp_has_path(0, 9)
    assert not eng.sssp_has_path(9, 0)  # directed chain
    eng.shutdown()


def test_sssp_average_length(tmp_path):
    e, n = CHAIN_10, 10
    eng = make_engine(tmp_path, e, n, 2)
    got = eng.sssp_average_length(unit=True, batch_k=4)
    # directed chain: sum over i<j of (j-i) / count
    pairs = [(j - i) for i in range(n) for j in range(i + 1, n)]
    assert abs(got - sum(pairs) / len(pairs)) < 1e-9
    eng.shutdown()


def test_bfs_generic_formats(tmp_path):
    e, n = CHAIN_10, 10
    eng = make_engine(tmp_path, e, n, 3)
    edges = eng.bfs_generic(0, output_format="edges").to_pandas()
    got = sorted(map(tuple, edges[["src", "dst"]].to_numpy()))
    assert got == [(i, i + 1) for i in range(9)]
    preds = eng.bfs_generic(0, output_format="predecessors").to_pandas()
    assert sorted(map(tuple, preds.to_numpy())) == [
        (i + 1, i) for i in range(9)]
    succs = eng.bfs_generic(0, output_format="successors").to_pandas()
    assert sorted(map(tuple, succs.to_numpy())) == [
        (i, i + 1) for i in range(9)]
    eng.shutdown()


def test_sampling_path():
    import ray.data
    from graphscope_ray.graph import api
    from conftest import CHAIN_10, edges_ds

    paths = api.sampling_path(edges_ds(CHAIN_10), roots=[0, 5], length=3)
    pdf = paths.to_pandas().sort_values(["path_id", "hop"])
    # chain: the only walk from 0 is 0,1,2,3; from 5 is 5,6,7,8
    p0 = pdf[pdf["path_id"] == 0]["vid"].to_list()
    p1 = pdf[pdf["path_id"] == 1]["vid"].to_list()
    assert p0 == [0, 1, 2, 3]
    assert p1 == [5, 6, 7, 8]
    # deterministic on a branching graph
    from conftest import random_graph
    e = random_graph(seed=2)
    a = api.sampling_path(edges_ds(e), roots=[0, 1, 2], length=4).to_pandas()
    b = api.sampling_path(edges_ds(e), roots=[0, 1, 2], length=4).to_pandas()
    key = ["path_id", "hop"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("hub_threshold", [None, 5])
def test_partition_walk_matches_broadcast_sampling(tmp_path, P,
                                                   hub_threshold):
    """engine.sampling_path (actor token walk) must equal
    api.sampling_path (broadcast CSR) — same hash-min successor rule,
    also across hub-split stores."""
    from graphscope_ray.graph import api
    from graphscope_ray.graph.build import build_graph
    from graphscope_ray.graph.engine import BSPEngine
    from conftest import edges_ds, random_graph

    e, n = random_graph(seed=17), 60
    ds = edges_ds(e)
    roots = [0, 3, 7, 11, 40]
    want = (api.sampling_path(ds, roots, length=4, seed=9).to_pandas()
            .sort_values(["path_id", "hop"]).reset_index(drop=True))
    store = build_graph(ds, str(tmp_path / f"w{P}{hub_threshold}"),
                        num_parts=P, num_vertices=n,
                        hub_threshold=hub_threshold)
    if hub_threshold is not None:
        assert len(store.hubs) > 0
    eng = BSPEngine(store)
    got = (eng.sampling_path(roots, length=4, seed=9).to_pandas()
           .sort_values(["path_id", "hop"]).reset_index(drop=True))
    assert len(got) == len(want)
    for c in ["path_id", "hop", "vid"]:
        np.testing.assert_array_equal(got[c].to_numpy(),
                                      want[c].to_numpy(), err_msg=c)
    eng.shutdown()


def test_sampling_path_auto_routes_to_partition_walk():
    """Above broadcast_edge_limit the api entry must route to the
    engine's partition walk; on dense-vid inputs both routes pick
    identical successors, so the outputs are row-identical."""
    from graphscope_ray.graph import api
    e = random_graph(seed=41, n=50, m=400)
    cols = ["path_id", "hop", "vid"]
    bc = (api.sampling_path(edges_ds(e), roots=[0, 7, 23], length=4)
          .to_pandas().sort_values(cols).reset_index(drop=True))
    pw = (api.sampling_path(edges_ds(e), roots=[0, 7, 23], length=4,
                            broadcast_edge_limit=0)
          .to_pandas().sort_values(cols).reset_index(drop=True))
    assert bc[cols].values.tolist() == pw[cols].values.tolist()


def test_khop_sample_matches_python_oracle():
    import collections

    from graphscope_ray.data.hashing import walk_hash
    from graphscope_ray.graph.api import khop_sample

    e, n = random_graph(seed=88), 60
    got = khop_sample(edges_ds(e), [0, 1, 2], hops=2, fanout=3,
                      seed=5).to_pandas()
    # python oracle: same hash, same trim rule
    adj = collections.defaultdict(set)
    for a, b in e:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    frontier = {0, 1, 2}
    want = []
    for h in (1, 2):
        nxt = set()
        for u in sorted(frontier):
            nbrs = np.array(sorted(adj[u]), dtype=np.int64)
            if not len(nbrs):
                continue
            sc = walk_hash(nbrs, np.full(len(nbrs), u, np.int64), h, 5)
            order = np.lexsort((nbrs, sc))[:3]
            for v in nbrs[order]:
                want.append((h, u, int(v)))
                nxt.add(int(v))
        frontier = nxt
    want = sorted(want)
    assert list(map(tuple, got[["hop", "src", "dst"]].to_numpy())) == want
    # fanout bound per (hop, src)
    cnt = got.groupby(["hop", "src"]).size()
    assert (cnt <= 3).all()
    # determinism across partitionings
    got2 = khop_sample(edges_ds(e).repartition(5), [0, 1, 2], hops=2,
                       fanout=3, seed=5).to_pandas()
    assert got.equals(got2)
