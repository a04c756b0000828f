"""Hashed TF-IDF vectorizer: sparse rows vs the DuckDB twin
(bit-exact), dense vectors vs a numpy reference, and the
text → tfidf_vectors → knn_graph composition vs brute force."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.data.text import tfidf_rows, tfidf_vectors
from graphscope_ray.data.similarity import knn_graph
from graphscope_ray.oracle_sql import tfidf_sql
from graphscope_ray.util import round_half_away

DOCS = pd.DataFrame({
    "doc_id": np.arange(8, dtype=np.int64),
    "text": [
        "the cat sat on the mat",
        "the cat sat",
        "a dog a dog a dog",
        "",                       # token-less: no sparse rows, zero vec
        "   \t  ",                # whitespace-only
        "cat dog cat dog mat",
        "unique singleton token here",
        "the the the the",
    ],
})


def _numpy_tfidf(texts, dim):
    from graphscope_ray.data.hashing import batch_token_hashes
    tok_doc, tok_hash = batch_token_hashes(list(texts))
    slot = (tok_hash % np.uint64(dim)).astype(np.int64)
    n = len(texts)
    tf = np.zeros((n, dim))
    np.add.at(tf, (tok_doc, slot), 1.0)
    df = (tf > 0).sum(axis=0)
    idf = np.log((n + 1.0) / (df + 1.0)) + 1.0
    return tf, idf


def test_sparse_rows_match_duckdb(ray_session):
    ds = ray.data.from_pandas(DOCS)
    got = (tfidf_rows(ds, dim=32).to_pandas()
           .sort_values(["doc_id", "slot"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", DOCS)
    want = con.execute(tfidf_sql(32)).df()
    assert len(got) == len(want)
    for c in ("doc_id", "slot", "tf"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert (got["tfidf"].to_numpy() == want["tfidf"].to_numpy()).all()


def test_sparse_rows_match_numpy(ray_session):
    dim = 16
    ds = ray.data.from_pandas(DOCS)
    got = tfidf_rows(ds, dim=dim).to_pandas()
    tf, idf = _numpy_tfidf(DOCS["text"], dim)
    dense = np.zeros_like(tf)
    dense[got["doc_id"], got["slot"]] = got["tfidf"]
    want = round_half_away(tf * idf, 6)
    assert np.array_equal(dense, want)
    # token-less docs contribute no rows
    assert not np.isin(got["doc_id"].to_numpy(), [3, 4]).any()


def test_dense_vectors(ray_session):
    dim = 16
    ds = ray.data.from_pandas(DOCS)
    out = (tfidf_vectors(ds, dim=dim, l2_normalize=False)
           .to_pandas().sort_values("doc_id"))
    m = np.stack(out["embedding"].to_numpy())
    tf, idf = _numpy_tfidf(DOCS["text"], dim)
    assert np.allclose(m, tf * idf)
    # normalized variant: unit rows except the token-less zero rows
    out2 = (tfidf_vectors(ds, dim=dim, l2_normalize=True)
            .to_pandas().sort_values("doc_id"))
    m2 = np.stack(out2["embedding"].to_numpy())
    norms = np.linalg.norm(m2, axis=1)
    assert np.allclose(norms[[3, 4]], 0.0)
    keep = np.ones(len(DOCS), dtype=bool)
    keep[[3, 4]] = False
    assert np.allclose(norms[keep], 1.0)
    # pure-TF variant skips the df pass entirely
    out3 = (tfidf_vectors(ds, dim=dim, use_idf=False, l2_normalize=False)
            .to_pandas().sort_values("doc_id"))
    assert np.allclose(np.stack(out3["embedding"].to_numpy()), tf)


def test_tfidf_knn_composition(ray_session):
    """text → dense tfidf → exact kNN graph equals numpy brute force."""
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(words, size=rng.integers(5, 30)))
             for _ in range(60)]
    docs = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                         "text": texts})
    vec = tfidf_vectors(ray.data.from_pandas(docs), dim=64)
    edges = knn_graph(vec, k=3, key="doc_id").to_pandas()
    assert len(edges) == 60 * 3

    m = np.stack(vec.to_pandas().sort_values("doc_id")["embedding"]
                 .to_numpy())
    sims = round_half_away(m @ m.T, 6)
    np.fill_diagonal(sims, -np.inf)
    for src in range(60):
        # engine rank: rounded cosine desc, then lower dst id
        order = np.lexsort((np.arange(60), -sims[src]))[:3]
        got = edges[edges["src"] == src].sort_values("rank")
        assert list(got["dst"]) == list(order), src
