"""Greedy maximal matching (locally-dominant edges on the BSP actors)
vs a driver-side sequential greedy under the same total edge order
(w, min(u,v), max(u,v)) — the locally-dominant fixpoint IS the
sequential greedy matching, so they must agree edge-for-edge."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.graph.api import Graph


def _greedy(src, dst, w):
    """Sequential greedy matching under (w, fmix64(pack(ra, rb)), a, b)
    — the engine's total order, where ra/rb are dense sorted-oid
    ranks (what the engine's vids are)."""
    from graphscope_ray.data.hashing import fmix64
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    oids = np.unique(np.r_[src, dst])
    ra = np.searchsorted(oids, a).astype(np.uint64)
    rb = np.searchsorted(oids, b).astype(np.uint64)
    h = fmix64((ra << np.uint64(32)) | rb)
    order = np.lexsort((b, a, h, w))
    used = set()
    out = []
    for i in order:
        if a[i] not in used and b[i] not in used:
            used.add(a[i])
            used.add(b[i])
            out.append((int(a[i]), int(b[i]), float(w[i])))
    return sorted(out)


def _rand_edges(rng, n, m, weighted=True):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = (rng.integers(1, 8, len(src)).astype(np.float64)
         if weighted else np.ones(len(src)))
    df = pd.DataFrame({"src": np.minimum(src, dst),
                       "dst": np.maximum(src, dst), "weight": w})
    return df.groupby(["src", "dst"], as_index=False)["weight"].min()


def _run(df, tmp, P, mates=False):
    ds = ray.data.from_pandas(df)
    g = Graph.from_edges(ds, workdir=str(tmp), num_parts=P,
                         weight_col="weight", symmetrize=True)
    try:
        if mates:
            out = g.to_oid(g.matching(mates=True),
                           vid_cols=("vid", "mate")).to_pandas()
            return out
        out = g.to_oid(g.matching(), vid_cols=("src", "dst")).to_pandas()
        return sorted(zip(out["src"].astype(int), out["dst"].astype(int),
                          out["weight"].astype(float)))
    finally:
        g.close()


@pytest.mark.parametrize("n,m,P,weighted", [
    (40, 100, 1, True),
    (150, 500, 3, True),
    (200, 700, 4, False),
    (400, 250, 4, True),   # sparse: many isolated vertices
])
def test_matching_matches_greedy(tmp_path, n, m, P, weighted):
    rng = np.random.default_rng(n * 3 + m)
    df = _rand_edges(rng, n, m, weighted)
    got = _run(df, tmp_path, P)
    want = _greedy(df["src"].to_numpy(), df["dst"].to_numpy(),
                   df["weight"].to_numpy())
    assert got == want


def test_matching_partition_count_independent(tmp_path):
    rng = np.random.default_rng(41)
    df = _rand_edges(rng, 120, 400)
    res = [_run(df, tmp_path / f"p{P}", P) for P in (1, 2, 5)]
    assert res[0] == res[1] == res[2]


def test_matching_is_maximal(tmp_path):
    """No edge may have both endpoints unmatched."""
    rng = np.random.default_rng(8)
    df = _rand_edges(rng, 100, 300)
    got = _run(df, tmp_path, 3)
    matched = {v for e in got for v in e[:2]}
    for s, d, _ in df.itertuples(index=False):
        assert int(s) in matched or int(d) in matched
    # matching property: each vertex at most once
    flat = [v for e in got for v in e[:2]]
    assert len(flat) == len(set(flat))


def test_matching_mates_consistent(tmp_path):
    rng = np.random.default_rng(13)
    df = _rand_edges(rng, 80, 250)
    edges = _run(df, tmp_path / "e", 3)
    mates = _run(df, tmp_path / "m", 3, mates=True)
    mate_of = {int(v): (int(mm) if pd.notna(mm) else None)
               for v, mm in zip(mates["vid"], mates["mate"])}
    pairs = {(s, d) for s, d, _ in edges}
    # mate table and edge list describe the same matching; unmatched
    # mates translate to null (the -1 sentinel never maps to an oid)
    got_pairs = {(min(v, mm), max(v, mm))
                 for v, mm in mate_of.items() if mm is not None}
    assert got_pairs == pairs
    for s, d in pairs:
        assert mate_of[s] == d and mate_of[d] == s
    assert any(mm is None for mm in mate_of.values())


def test_matching_path_graph_worst_case(tmp_path):
    """Increasing-weight path: exactly one locally-dominant edge per
    round — exercises the multi-round convergence path."""
    n = 30
    df = pd.DataFrame({"src": np.arange(n - 1),
                       "dst": np.arange(1, n),
                       "weight": np.arange(1, n, dtype=np.float64)})
    got = _run(df, tmp_path, 3)
    want = _greedy(df["src"].to_numpy(), df["dst"].to_numpy(),
                   df["weight"].to_numpy())
    assert got == want
    # greedy on an increasing path takes edges 0-1, 2-3, 4-5, ...
    assert got == [(i, i + 1, float(i + 1)) for i in range(0, n - 1, 2)]


def test_coarsen_contract(tmp_path):
    """Coarsening invariants: supers are matched-pair minima; coarse
    weights preserve total weight minus contracted intra-pair edges;
    contraction equals a pandas replay."""
    from graphscope_ray.graph.api import contract_edges

    rng = np.random.default_rng(21)
    df = _rand_edges(rng, 60, 220)
    ds = ray.data.from_pandas(df)
    g = Graph.from_edges(ds, workdir=str(tmp_path), num_parts=3,
                         weight_col="weight", symmetrize=True)
    try:
        mapping = g.to_oid(g.coarsen_mapping(),
                           vid_cols=("vid", "super")).to_pandas()
        ce = contract_edges(ray.data.from_pandas(df),
                            ray.data.from_pandas(mapping),
                            map_count=len(mapping)).to_pandas()
        pairs = _run(df, tmp_path / "m", 3)
    finally:
        g.close()
    sup = dict(zip(mapping["vid"].astype(int),
                   mapping["super"].astype(int)))
    # mapping reflects exactly the matching
    for a, b, _ in pairs:
        assert sup[a] == a and sup[b] == a
    matched = {v for e in pairs for v in e[:2]}
    for v, s in sup.items():
        if v not in matched:
            assert s == v
    # pandas replay of the contraction
    rep = df.copy()
    rep["a"] = rep["src"].map(sup)
    rep["b"] = rep["dst"].map(sup)
    rep = rep[rep["a"] != rep["b"]]
    lo = np.minimum(rep["a"], rep["b"])
    hi = np.maximum(rep["a"], rep["b"])
    want = (pd.DataFrame({"src": lo, "dst": hi, "weight": rep["weight"]})
            .groupby(["src", "dst"], as_index=False)["weight"].sum())
    got = ce.sort_values(["src", "dst"]).reset_index(drop=True)
    want = want.sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
