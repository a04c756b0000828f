"""degree_assortativity vs networkx degree_assortativity_coefficient."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.graph.api import degree_assortativity


def _rand_edges(rng, n, m):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    df = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
    return df.drop_duplicates()


@pytest.mark.parametrize("n,m,blocks", [
    (30, 80, 1), (100, 300, 4), (50, 60, 8),
])
def test_assortativity_vs_networkx(n, m, blocks):
    nx = pytest.importorskip("networkx")
    rng = np.random.default_rng(n + m)
    df = _rand_edges(rng, n, m)
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = degree_assortativity(ds)["assortativity"].iloc[0]
    G = nx.Graph()
    G.add_edges_from(zip(df["src"], df["dst"]))
    want = nx.degree_assortativity_coefficient(G)
    assert abs(got - want) < 1e-6


def test_assortativity_star_is_minus_one():
    """A star graph is perfectly disassortative (r = -1)."""
    df = pd.DataFrame({"src": np.zeros(10, np.int64),
                       "dst": np.arange(1, 11)})
    ds = ray.data.from_pandas(df)
    got = degree_assortativity(ds)["assortativity"].iloc[0]
    assert got == -1.0


def test_assortativity_regular_graph_nan():
    """All degrees equal → zero variance → NaN (networkx raises a
    warning and returns nan too)."""
    df = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 0]})
    got = degree_assortativity(ray.data.from_pandas(df))
    assert np.isnan(got["assortativity"].iloc[0])


def test_modularity_vs_networkx():
    nx = pytest.importorskip("networkx")
    from graphscope_ray.graph.api import modularity
    rng = np.random.default_rng(6)
    df = _rand_edges(rng, 60, 200)
    # labels: a hash-bucket partition into 4 groups
    verts = np.unique(np.r_[df["src"], df["dst"]])
    lab = pd.DataFrame({"vid": verts, "label": verts % 4})
    got = modularity(ray.data.from_pandas(df),
                     ray.data.from_pandas(lab))["modularity"].iloc[0]
    G = nx.Graph()
    G.add_edges_from(zip(df["src"], df["dst"]))
    comms = [set(verts[verts % 4 == i]) & set(G.nodes) for i in range(4)]
    want = nx.algorithms.community.modularity(G, [c for c in comms if c])
    assert abs(got - want) < 1e-9


def test_modularity_perfect_partition():
    """Two disjoint cliques labeled by clique → Q = 1/2."""
    from graphscope_ray.graph.api import modularity
    import itertools
    e = ([(a, b) for a, b in itertools.combinations(range(4), 2)]
         + [(a, b) for a, b in itertools.combinations(range(10, 14), 2)])
    df = pd.DataFrame(e, columns=["src", "dst"])
    verts = np.unique(np.r_[df["src"], df["dst"]])
    lab = pd.DataFrame({"vid": verts, "label": (verts >= 10).astype(int)})
    got = modularity(ray.data.from_pandas(df),
                     ray.data.from_pandas(lab))["modularity"].iloc[0]
    assert abs(got - 0.5) < 1e-12


@pytest.mark.parametrize("n,m,blocks", [(20, 50, 1), (60, 200, 4),
                                        (35, 120, 8)])
def test_square_count_vs_networkx(n, m, blocks):
    nx = pytest.importorskip("networkx")
    from graphscope_ray.graph.api import square_count
    rng = np.random.default_rng(n * m)
    df = _rand_edges(rng, n, m)
    got = int(square_count(ray.data.from_pandas(df).repartition(blocks))
              ["squares"].iloc[0])
    G = nx.Graph()
    G.add_edges_from(zip(df["src"], df["dst"]))
    want = sum(1 for c in nx.simple_cycles(G, length_bound=4)
               if len(c) == 4)
    assert got == want


def test_square_count_c4_and_k4():
    from graphscope_ray.graph.api import square_count
    # a plain 4-cycle has exactly 1 square; K4 has 3
    c4 = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 0]})
    assert int(square_count(ray.data.from_pandas(c4))
               ["squares"].iloc[0]) == 1
    import itertools
    k4 = pd.DataFrame(list(itertools.combinations(range(4), 2)),
                      columns=["src", "dst"])
    assert int(square_count(ray.data.from_pandas(k4))
               ["squares"].iloc[0]) == 3
