"""knn_graph: exact path vs a brute-force numpy oracle (including
cosine ties from duplicated vectors), chunking invariance, the n=1
edge case, and the LSH scale route's semantic guarantees."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from graphscope_ray.data.similarity import knn_graph, _knn_graph_lsh
from graphscope_ray.util import round_half_away


def _make(n, d, seed, n_dups=0):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    for t in range(n_dups):  # exact duplicates → rounded-cosine ties
        m[(2 * t + 1) % n] = m[(2 * t) % n]
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": list(m.astype(np.float32))})


def _brute(df, k):
    ids = df["vec_id"].to_numpy()
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    sims = round_half_away(m @ m.T, 6)
    rows = []
    for i in range(len(ids)):
        order = sorted((j for j in range(len(ids)) if j != i),
                       key=lambda j: (-sims[i, j], ids[j]))[:k]
        for r, j in enumerate(order, 1):
            rows.append((ids[i], ids[j], sims[i, j], r))
    return pd.DataFrame(rows, columns=["src", "dst", "cosine", "rank"])


@pytest.mark.parametrize("n,d,k,chunk", [
    (40, 8, 5, 65536),     # one chunk
    (40, 8, 5, 7),         # many ragged chunks (chunk < k too)
    (30, 4, 3, 16),        # chunk boundary mid-matrix
    (25, 6, 30, 65536),    # k > n-1 → clamps to n-1
])
def test_knn_graph_exact_vs_brute(n, d, k, chunk):
    df = _make(n, d, seed=n + k, n_dups=4)
    ds = ray.data.from_pandas(df).repartition(3)
    got = knn_graph(ds, k=k, chunk_cols=chunk).to_pandas() \
        .sort_values(["src", "rank"]).reset_index(drop=True)
    want = _brute(df, k).sort_values(["src", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_knn_graph_single_vector_no_edges():
    ds = ray.data.from_pandas(_make(1, 4, seed=0))
    assert knn_graph(ds, k=5).count() == 0


def test_knn_graph_lsh_route_semantics():
    """Scale route: every emitted edge must carry the true rounded
    cosine, per-src lists are deduped, ≤ k long, rank-consecutive and
    sorted by (cosine desc, dst asc); on well-separated clusters the
    route recovers most true neighbors."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((4, 16)) * 8
    m = np.concatenate([c + rng.standard_normal((25, 16)) * 0.05
                        for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(100, dtype=np.int64),
                       "embedding": list(m.astype(np.float32))})
    ds = ray.data.from_pandas(df).repartition(4)
    got = _knn_graph_lsh(ds, k=5, key="vec_id", col="embedding",
                         num_planes=8, num_tables=4, seed=42) \
        .to_pandas().sort_values(["src", "rank"]).reset_index(drop=True)
    mm = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mm = mm / np.linalg.norm(mm, axis=1, keepdims=True)
    sims = round_half_away(mm @ mm.T, 6)
    # true cosine values, no self edges, no dup (src, dst)
    assert (got["src"] != got["dst"]).all()
    assert not got.duplicated(subset=["src", "dst"]).any()
    np.testing.assert_allclose(
        got["cosine"], sims[got["src"], got["dst"]], atol=0)
    # per-src ordering + rank contract
    for src, grp in got.groupby("src"):
        assert len(grp) <= 5
        assert (grp["rank"].to_numpy() == np.arange(1, len(grp) + 1)).all()
        key = list(zip(-grp["cosine"], grp["dst"]))
        assert key == sorted(key)
    # warn-and-route through the public surface
    with pytest.warns(UserWarning, match="broadcast_limit"):
        routed = knn_graph(ds, k=5, broadcast_limit=10, num_planes=8,
                           num_tables=4).to_pandas()
    assert len(routed) > 0
    # recall on separated clusters: compare against exact top-5
    want = _brute(df, 5)
    exact_pairs = set(zip(want["src"], want["dst"]))
    got_pairs = set(zip(got["src"], got["dst"]))
    recall = len(exact_pairs & got_pairs) / len(exact_pairs)
    assert recall > 0.6, recall


def test_feature_propagate_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.graph.api import feature_propagate

    rng = np.random.default_rng(12)
    n, m = 30, 120
    e = rng.integers(0, n, size=(m, 2))
    e = e[e[:, 0] != e[:, 1]]
    w = rng.integers(1, 5, size=len(e)).astype(np.int64)
    edf = pd.DataFrame({"src": e[:, 0].astype(np.int64),
                        "dst": e[:, 1].astype(np.int64), "weight": w})
    X = rng.normal(size=(n, 3))
    feats = pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                          "a": X[:, 0], "b": X[:, 1], "c": X[:, 2]})

    got = (feature_propagate(
        ray.data.from_pandas(np.array_split(edf, 3)),
        ray.data.from_pandas(feats), feat_cols=["a", "b", "c"],
        rounds=3, weight_col="weight").to_pandas()
        .sort_values("vid").reset_index(drop=True))

    # numpy oracle: X <- (X + A_w^T X) / (1 + indeg_w), 3 rounds
    A = np.zeros((n, n))
    for (s, d), wt in zip(e, w):
        A[s, d] += wt
    indeg = A.sum(axis=0)
    Y = X.copy()
    for _ in range(3):
        Y = (Y + A.T @ Y) / (1 + indeg)[:, None]
    want = np.sign(Y) * np.floor(np.abs(Y) * 1e6 + 0.5) / 1e6
    np.testing.assert_allclose(
        got[["a", "b", "c"]].to_numpy(), want, atol=2e-6)
    # no-in-edge vertices keep their feature exactly (unit self-loop)
    iso = np.flatnonzero(indeg == 0)
    if len(iso):
        np.testing.assert_allclose(
            got.loc[iso, ["a", "b", "c"]].to_numpy(),
            np.sign(X[iso]) * np.floor(np.abs(X[iso]) * 1e6 + 0.5) / 1e6,
            atol=2e-6)


def test_ktruss_matches_bruteforce(ray_session):
    import collections
    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.graph.api import ktruss

    rng = np.random.default_rng(14)
    for trial in range(4):
        n = int(rng.integers(8, 40))
        m = int(rng.integers(n, n * 4))
        e = rng.integers(0, n, size=(m, 2))
        e = e[e[:, 0] != e[:, 1]]
        canon = {(min(a, b), max(a, b)) for a, b in e.tolist()}
        k = int(rng.integers(3, 6))

        E = set(canon)
        while True:
            adj = collections.defaultdict(set)
            for a, b in E:
                adj[a].add(b)
                adj[b].add(a)
            drop = {(a, b) for (a, b) in E if len(adj[a] & adj[b]) < k - 2}
            if not drop:
                break
            E -= drop

        edf = pd.DataFrame({"src": e[:, 0].astype(np.int64),
                            "dst": e[:, 1].astype(np.int64)})
        got = ktruss(ray.data.from_pandas(edf), k).to_pandas()
        # Ray 2.49 to_pandas drops columns on fully-empty datasets
        got_set = (set() if len(got) == 0 else
                   {(min(a, b), max(a, b))
                    for a, b in got[["src", "dst"]].to_numpy().tolist()})
        assert got_set == E, (trial, k, len(got_set), len(E))


def test_pca_project_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.data.similarity import pca_project

    rng = np.random.default_rng(26)
    n, d, k = 300, 12, 4
    # anisotropic cloud so the principal axes are well separated
    basis = rng.normal(size=(d, d))
    scales = np.linspace(5.0, 0.1, d)
    X = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(X)})
    ds = ray.data.from_pandas(df).repartition(5)
    got = (pca_project(ds, k=k).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    P = np.stack(got["pca"].to_numpy())
    assert P.shape == (n, k)

    # numpy oracle with the same sign convention
    mean = X.mean(axis=0)
    cov = (X - mean).T @ (X - mean) / n
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(k)])
    comps = comps * np.where(flip == 0, 1.0, flip)
    want = (X - mean) @ comps
    np.testing.assert_allclose(P, want, atol=1e-8)

    # whiten: unit variance per kept component
    got_w = (pca_project(ds, k=k, whiten=True).to_pandas()
             .sort_values("vec_id").reset_index(drop=True))
    W = np.stack(got_w["pca"].to_numpy())
    np.testing.assert_allclose(W.var(axis=0), np.ones(k), rtol=1e-6)

    # block-count invariance (the aggregate is order-insensitive up
    # to float addition; projections agree to high precision)
    got1 = (pca_project(ray.data.from_pandas(df).repartition(1), k=k)
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    np.testing.assert_allclose(np.stack(got1["pca"].to_numpy()), P,
                               atol=1e-7)


def test_pq_ann_recall_and_determinism(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.data.similarity import (ann_topk, pq_ann_topk,
                                                pq_encode, pq_train)

    rng = np.random.default_rng(29)
    # clustered cloud: PQ codes separate well
    n_clusters, per, d = 8, 50, 16
    centers = rng.normal(size=(n_clusters, d)) * 4
    X = np.concatenate([c + 0.3 * rng.normal(size=(per, d))
                        for c in centers])
    # interleave clusters: the house kmeans init seeds from the k
    # smallest ids, which must not all fall in one cluster
    X = X[rng.permutation(len(X))]
    n = len(X)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(X)})
    ds = ray.data.from_pandas(df).repartition(4)

    books = pq_train(ds, m=4, k=16, iters=3)
    assert books.shape == (4, 16, 4)
    codes = pq_encode(ds, books)
    cdf = codes.to_pandas().sort_values("vec_id").reset_index(drop=True)
    C = np.stack(cdf["codes"].to_numpy())
    assert C.shape == (n, 4) and C.dtype == np.uint8

    # numpy replay of encode (same normalize + rounded-argmin)
    from graphscope_ray.util import round_half_away
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for j in range(4):
        seg = Xn[:, j * 4:(j + 1) * 4]
        dist = round_half_away(np.sqrt(
            ((seg[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)), 6)
        assert (C[:, j] == np.argmin(dist, axis=1)).all()

    queries = centers[:3] + 0.1 * rng.normal(size=(3, d))
    approx = pq_ann_topk(codes, queries, books, k=10)
    exact = ann_topk(ds, queries, k=50)
    # PQ cannot rank WITHIN a cluster (same-code vectors tie), so the
    # standard looser recall applies: approx top-10 ⊆ exact top-50
    # (all 50 exact hits are the query's own cluster here)
    rec = []
    for qid in range(3):
        a = set(approx[approx.query_id == qid]["vec_id"])
        e = set(exact[exact.query_id == qid]["vec_id"])
        rec.append(len(a & e) / 10.0)
    assert np.mean(rec) >= 0.9, rec
    # deterministic
    approx2 = pq_ann_topk(codes, queries, books, k=10)
    pd.testing.assert_frame_equal(approx, approx2)
    # approx_cosine in [-1, 1] + descending per query
    g = approx.groupby("query_id")["approx_cosine"]
    assert (g.apply(lambda s: (s.diff().dropna() <= 1e-12).all())).all()


def test_ivf_pq_ann(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.data.similarity import (ann_topk,
                                                ivf_pq_ann_topk,
                                                ivf_pq_index)

    rng = np.random.default_rng(30)
    n_clusters, per, d = 8, 60, 16
    centers = rng.normal(size=(n_clusters, d)) * 4
    X = np.concatenate([c + 0.3 * rng.normal(size=(per, d))
                        for c in centers])
    X = X[rng.permutation(len(X))]
    n = len(X)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(X)})
    ds = ray.data.from_pandas(df).repartition(4)

    C, books, codes = ivf_pq_index(ds, num_centroids=8,
                                   coarse_iters=3, m=4, k_codes=16,
                                   pq_iters=2)
    assert C.shape == (8, 16) and books.shape == (4, 16, 4)
    cdf = codes.to_pandas()
    assert len(cdf) == n
    assert set(cdf.columns) >= {"vec_id", "list_id", "codes"}
    assert cdf["list_id"].between(0, 7).all()

    queries = centers[:3] + 0.1 * rng.normal(size=(3, d))
    approx = ivf_pq_ann_topk(codes, queries, C, books, k=10, nprobe=2)
    exact = ann_topk(ds, queries, k=60)
    rec = []
    for qid in range(3):
        a = set(approx[approx.query_id == qid]["vec_id"])
        e = set(exact[exact.query_id == qid]["vec_id"])
        rec.append(len(a & e) / 10.0)
    # approx top-10 lands inside the exact top-60 (the query's own
    # cluster) — coarse recall, the IVF-PQ guarantee at tiny scale
    assert np.mean(rec) >= 0.9, rec
    # deterministic
    approx2 = ivf_pq_ann_topk(codes, queries, C, books, k=10, nprobe=2)
    pd.testing.assert_frame_equal(approx, approx2)
    # residual PQ beats zero-information: approx_cosine of the top hit
    # is close to the exact best cosine
    for qid in range(3):
        a1 = approx[approx.query_id == qid]["approx_cosine"].iloc[0]
        e1 = exact[exact.query_id == qid]["cosine"].iloc[0]
        assert abs(a1 - e1) < 0.2, (qid, a1, e1)


class TestMMRRound5:
    """mmr_select (Carbonell 1998) vs a direct numpy greedy replay."""

    def _pool(self, rng, n=80, d=8):
        m = rng.standard_normal((n, d))
        return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                             "embedding": list(m)})

    def _oracle(self, df, qv, k, lam):
        from graphscope_ray.util import round_half_away as r6
        m = np.stack(df["embedding"].to_numpy())
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        q = qv / np.linalg.norm(qv)
        ids = df["vec_id"].to_numpy()
        qc = r6(m @ q, 6)
        taken = np.zeros(len(ids), bool)
        sel, rows = [], []
        for rank in range(1, k + 1):
            if sel:
                div = r6(m @ m[sel].T, 6).max(axis=1)
                sc = r6(lam * qc - (1 - lam) * div, 6)
            else:
                sc = r6(lam * qc, 6)
            sc = np.where(taken, -np.inf, sc)
            best = np.lexsort((ids, -sc))[0]
            taken[best] = True
            sel.append(best)
            rows.append((rank, ids[best], sc[best]))
        return rows

    def test_matches_numpy_greedy(self):
        from graphscope_ray.data.similarity import mmr_select
        rng = np.random.default_rng(3)
        df = self._pool(rng)
        qv = rng.standard_normal(8)
        got = mmr_select(ray.data.from_pandas(df), qv, k=6,
                         lam=0.6).to_pandas()
        exp = self._oracle(df, qv, 6, 0.6)
        assert list(zip(got["rank"], got["vec_id"])) == \
            [(r, i) for r, i, _ in exp]
        for g, (_, _, s) in zip(got["score"], exp):
            assert g == pytest.approx(s, abs=2e-6)

    def test_rank1_is_top_cosine(self):
        from graphscope_ray.data.similarity import ann_topk, mmr_select
        rng = np.random.default_rng(4)
        df = self._pool(rng)
        qv = rng.standard_normal(8)
        got = mmr_select(ray.data.from_pandas(df), qv, k=3,
                         lam=0.5).to_pandas()
        top = ann_topk(ray.data.from_pandas(df), qv[None, :], k=1)
        assert got["vec_id"].iloc[0] == top["vec_id"].iloc[0]

    def test_fetch_pool_consistent(self):
        from graphscope_ray.data.similarity import mmr_select
        rng = np.random.default_rng(5)
        df = self._pool(rng, n=200)
        qv = rng.standard_normal(8)
        full = mmr_select(ray.data.from_pandas(df), qv, k=4,
                          lam=0.7).to_pandas()
        # a generous fetch pool must reproduce the full-pool picks
        pooled = mmr_select(ray.data.from_pandas(
            np.array_split(df, 4)), qv, k=4, lam=0.7,
            fetch=200).to_pandas()
        pd.testing.assert_frame_equal(full, pooled)

    def test_lambda_zero_diversifies(self):
        from graphscope_ray.data.similarity import mmr_select
        # pool of near-duplicates of q plus one orthogonal vector:
        # λ→0 must pull in the orthogonal one early
        base = np.array([1.0, 0.0, 0.0, 0.0])
        dups = [base + 1e-3 * np.random.default_rng(i)
                .standard_normal(4) for i in range(6)]
        ortho = np.array([0.0, 1.0, 0.0, 0.0])
        df = pd.DataFrame({"vec_id": np.arange(7, dtype=np.int64),
                           "embedding": dups + [ortho]})
        got = mmr_select(ray.data.from_pandas(df), base, k=2,
                         lam=0.01).to_pandas()
        assert 6 in got["vec_id"].tolist()
