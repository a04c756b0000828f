"""Pregel triangle counting (apps/pregel/tc_pregel.h:40-80): the
2-superstep message formulation — v sends id(b) for each out-edge
(v, b) to every distinct neighbor c ∈ in(v) ∪ out(v); c counts
messages whose payload is one of its own out-neighbors; value =
counter // 2. Differential vs a row-at-a-time Python replay of the
reference loop, on symmetric AND oriented edge sets, both routes."""

import numpy as np
import pytest

from graphscope_ray.graph.api import tc_pregel

from conftest import edges_ds


def _brute(edges: np.ndarray) -> dict:
    """Literal replay of PregelTC::Compute (tc_pregel.h:44-80)."""
    out = {}
    inn = {}
    verts = set()
    eset = set()
    for s, d in edges:
        s, d = int(s), int(d)
        if (s, d) in eset:
            continue  # engine input contract: deduped edges
        eset.add((s, d))
        out.setdefault(s, []).append(d)
        inn.setdefault(d, []).append(s)
        verts.update((s, d))
    counter = {v: 0 for v in verts}
    for v in verts:
        for b in out.get(v, []):
            vst = set()
            # reference order: incoming first, then outgoing
            for c in inn.get(v, []) + out.get(v, []):
                if c in vst:
                    continue
                vst.add(c)
                if b in out.get(c, []):
                    counter[c] += 1
    return {v: counter[v] // 2 for v in verts}


def _run(edges: np.ndarray, **kw) -> dict:
    ds = tc_pregel(edges_ds(edges), **kw)
    pdf = ds.to_pandas()
    return dict(zip(pdf["vid"].astype(int), pdf["tc"].astype(int)))


def test_symmetric_equals_triangles():
    # K4 plus a pendant, symmetrized: per-vertex triangle counts
    und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    edges = np.array(und + [(b, a) for a, b in und])
    got = _run(edges)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0}
    assert got == _brute(edges)


def test_oriented_edges_directed_semantics():
    # src<dst orientation of a triangle: the Pregel app sees NO
    # closed message (value 0 everywhere) — directed semantics differ
    # from triangles.h, which is the point of keeping both apps.
    edges = np.array([(0, 1), (0, 2), (1, 2)])
    got = _run(edges)
    assert got == _brute(edges)
    assert set(got.values()) == {0}


@pytest.mark.parametrize("seed,n,p_sym", [(1, 24, 1.0), (2, 30, 0.5),
                                          (3, 16, 0.0), (4, 40, 0.7)])
def test_random_differential(seed, n, p_sym):
    rng = np.random.default_rng(seed)
    m = rng.integers(n, 4 * n)
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    keep = s != d
    e = np.stack([s[keep], d[keep]], axis=1)
    # symmetrize a fraction of edges
    sym = e[rng.random(len(e)) < p_sym]
    e = np.unique(np.r_[e, sym[:, ::-1]], axis=0)
    assert _run(e) == _brute(e)


def test_join_path_matches_broadcast():
    rng = np.random.default_rng(7)
    s = rng.integers(0, 20, 160)
    d = rng.integers(0, 20, 160)
    keep = s != d
    e = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
    bcast = _run(e)
    joinp = _run(e, broadcast_edge_limit=0)
    assert joinp == bcast == _brute(e)
