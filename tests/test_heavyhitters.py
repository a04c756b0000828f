"""Misra-Gries two-pass exact top-k vs brute-force counting."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.data.heavyhitters import (exact_counts_of, mg_compress,
                                              mg_summary, mg_topk)


def _zipf_docs(rng, n_docs, vocab, words_per_doc=40):
    """Skewed corpus: token ids ~ Zipf over `vocab` words."""
    probs = 1.0 / np.arange(1, vocab + 1)
    probs /= probs.sum()
    ids = rng.choice(vocab, size=(n_docs, words_per_doc), p=probs)
    texts = [" ".join(f"w{j}" for j in row) for row in ids]
    return pd.DataFrame({"doc_id": np.arange(n_docs), "text": texts})


def _exact_topk(df, k):
    toks = (df["text"].str.lower()
            .str.findall(r"[a-z0-9]+").explode().dropna())
    vc = toks.value_counts().reset_index()
    vc.columns = ["token", "cnt"]
    vc = vc.sort_values(["cnt", "token"], ascending=[False, True],
                        kind="mergesort").head(k)
    return list(zip(vc["token"], vc["cnt"].astype(int)))


@pytest.mark.parametrize("n_docs,vocab,cap,blocks", [
    (400, 500, 256, 8),
    (200, 2000, 512, 4),
    (50, 30, 64, 2),
])
def test_mg_topk_matches_exact(n_docs, vocab, cap, blocks):
    rng = np.random.default_rng(n_docs + vocab)
    df = _zipf_docs(rng, n_docs, vocab)
    ds = ray.data.from_pandas(df).repartition(blocks)
    got, info = mg_topk(ds, k=20, capacity=cap)
    assert info["guaranteed"], info
    assert list(zip(got["token"], got["cnt"].astype(int))) == \
        _exact_topk(df, 20)


def test_mg_summary_error_bound():
    """mg_cnt <= true <= mg_cnt + D for present keys; absent <= D."""
    rng = np.random.default_rng(7)
    df = _zipf_docs(rng, 300, 800)
    ds = ray.data.from_pandas(df).repartition(6)
    summary, dec = mg_summary(ds, capacity=128)
    toks = (df["text"].str.findall(r"[a-z0-9]+").explode().dropna())
    true = toks.value_counts()
    merged = summary.set_index("token")["mg_cnt"]
    for tok, mg in merged.items():
        t = int(true.get(tok, 0))
        assert mg <= t <= mg + dec
    absent = true[~true.index.isin(merged.index)]
    assert (absent <= dec).all()


def test_mg_compress_semantics():
    toks = np.array([f"t{i}" for i in range(10)], dtype=object)
    cnts = np.arange(1, 11, dtype=np.int64)  # 1..10
    t, c, d = mg_compress(toks, cnts, capacity=3)
    # 4th largest = 7 is the decrement; survivors 8,9,10 minus 7
    assert d == 7
    assert sorted(zip(t, c)) == [("t7", 1), ("t8", 2), ("t9", 3)]
    # under capacity: untouched
    t, c, d = mg_compress(toks, cnts, capacity=10)
    assert d == 0 and len(t) == 10


def test_exact_counts_of_subset():
    df = pd.DataFrame({"text": ["a b a", "b c", "a"]})
    ds = ray.data.from_pandas(df).repartition(2)
    cands = np.array(["a", "c", "zz"], dtype=object)
    got = exact_counts_of(ds, cands)
    assert got.tolist() == [3, 1, 0]


def test_mg_topk_unguaranteed_flag():
    """Near-uniform corpus + tiny capacity → the guarantee must fail
    (decrement exceeds the k-th count), never silently pass."""
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 5000, size=(300, 40))
    texts = [" ".join(f"w{j}" for j in row) for row in ids]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(6)
    _, info = mg_topk(ds, k=50, capacity=64)
    assert not info["guaranteed"]


def test_mg_topk_empty():
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["", "", None]}))
    got, info = mg_topk(ds, k=5)
    assert len(got) == 0 and info["guaranteed"]


def test_range_search_vs_bruteforce():
    """range_search vs a numpy brute-force scan at several radii."""
    from graphscope_ray.data.similarity import range_search
    from graphscope_ray.util import round_half_away
    rng = np.random.default_rng(12)
    n, d = 300, 16
    vecs = rng.normal(size=(n, d))
    emb = pd.DataFrame({"vec_id": np.arange(n),
                        "embedding": list(vecs.astype(np.float32))})
    ds = ray.data.from_pandas(emb).repartition(5)
    queries = vecs[:2]
    for th in (0.1, 0.4, 0.95):
        got = range_search(ds, queries, threshold=th).to_pandas()
        got_set = set(zip(got["query_id"].astype(int),
                          got["vec_id"].astype(int))) if len(got) else set()
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        # the engine normalizes the float32-ingested vectors, so the
        # oracle must follow the same float path
        v32 = np.stack(emb["embedding"].to_numpy())
        vn = v32 / np.linalg.norm(v32.astype(np.float64), axis=1,
                                  keepdims=True)
        sims = round_half_away(vn @ qn.T, 6)
        vi, qi = np.nonzero(sims >= th)
        want = set(zip(qi.tolist(), vi.tolist()))
        assert got_set == want, th
