"""bm25_scores vs a single-process numpy replay of the BM25 formula."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.data.text import bm25_scores
from graphscope_ray.util import round_half_away


def _corpus(rng, n_docs, vocab=40, wpd=25):
    ids = rng.integers(0, vocab, size=(n_docs, wpd))
    texts = [" ".join(f"w{j}" for j in row) for row in ids]
    # a few empty / null docs
    texts[0] = ""
    return pd.DataFrame({"doc_id": np.arange(n_docs), "text": texts})


def _oracle(df, terms, k1=1.2, b=0.75):
    toks = df["text"].fillna("").str.lower().str.findall(r"[a-z0-9]+")
    n = len(df)
    total = int(toks.str.len().sum())
    avgdl = float(total) / float(n)
    out = {}
    dfv = {t: int(toks.apply(lambda L: t in L).sum()) for t in terms}
    for i, (doc, L) in enumerate(zip(df["doc_id"], toks)):
        dl = float(len(L))
        s = 0
        hit = False
        for t in sorted(set(terms)):
            tf = float(L.count(t))
            if tf == 0:
                continue
            hit = True
            idf = np.log(1.0 + (n - dfv[t] + 0.5) / (dfv[t] + 0.5))
            term = (idf * tf * (k1 + 1.0)
                    / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            s += int(round_half_away(term * 1e6, 0))
        if hit:
            out[int(doc)] = s / 1e6
    return out


@pytest.mark.parametrize("n_docs,blocks,terms,k1,b", [
    (60, 2, ["w1", "w5", "w9"], 1.2, 0.75),
    (120, 6, ["w0"], 0.9, 0.4),
    (40, 1, ["w2", "nosuchtoken"], 1.5, 0.0),
])
def test_bm25_vs_oracle(n_docs, blocks, terms, k1, b):
    rng = np.random.default_rng(n_docs)
    df = _corpus(rng, n_docs)
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = bm25_scores(ds, terms, k1=k1, b=b).to_pandas()
    want = _oracle(df, terms, k1=k1, b=b)
    got_map = dict(zip(got["doc_id"].astype(int), got["score"]))
    assert got_map == want


def test_bm25_no_hits():
    df = _corpus(np.random.default_rng(1), 20)
    ds = ray.data.from_pandas(df)
    got = bm25_scores(ds, ["zzz"]).to_pandas()
    # Ray's to_pandas may drop the schema of all-empty pandas blocks
    # (same wart attach_values documents), so only the row count is
    # asserted here
    assert len(got) == 0
