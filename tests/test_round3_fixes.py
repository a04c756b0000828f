"""Round-3 fixes: SimHash guarantee-preserving sub-banding under an
adversarial bucket distribution, and the distributed n-gram Jaccard
verify stage (no driver text LUT)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from graphscope_ray.data.dedup import (
    ngram_jaccard_pairs,
    simhash_pairs_from_sigs,
)


def _brute_pairs(keys, sigs, max_hamming):
    out = set()
    for i in range(len(keys)):
        x = sigs[i] ^ sigs[i + 1:]
        ham = np.zeros(len(x), dtype=np.int64)
        for b in range(64):
            ham += ((x >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        for j in np.flatnonzero(ham <= max_hamming):
            out.add((int(keys[i]), int(keys[i + 1 + j])))
    return out


def test_simhash_subbanding_adversarial_bucket():
    """600 docs share one exact 16-bit block (overflowing the
    max_bucket=500 cap that r02 silently truncated at); the planted
    hamming<=3 pairs must still be found via the 12-bit sub-banding."""
    rng = np.random.default_rng(7)
    n = 600
    # block 0 identical for everyone → one bucket of 600 in band 0
    rest = rng.integers(0, 1 << 48, size=n, dtype=np.uint64)
    sigs = (rest << np.uint64(16)) | np.uint64(0xBEEF)
    # plant 3 near-dup pairs: flip <= 3 bits of the upper 48
    for a, b_, nbits in ((0, 1, 3), (10, 11, 2), (20, 21, 1)):
        v = sigs[a]
        for bit in rng.choice(np.arange(16, 64), size=nbits, replace=False):
            v = v ^ (np.uint64(1) << np.uint64(bit))
        sigs[b_] = v
    # make the other three 16-bit blocks collide nowhere else by
    # construction odds (2^48 space, 600 docs) — verified by brute force
    keys = np.arange(n, dtype=np.int64)
    expected = _brute_pairs(keys, sigs, max_hamming=3)
    assert {(0, 1), (10, 11), (20, 21)} <= expected

    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": keys, "simhash": sigs.view(np.int64)}))
    got = simhash_pairs_from_sigs(ds, max_hamming=3, max_bucket=500)
    got_pairs = set(zip(got["a"].astype(int), got["b"].astype(int)))
    assert got_pairs == expected, (
        got_pairs.symmetric_difference(expected))


def test_ngram_jaccard_distributed_matches_python_sets():
    """The co-grouped 64-bit gram-hash Jaccard equals the direct
    Python-set computation, with candidate pairs given as a Dataset
    (nothing but the verified pairs ever lands on the driver)."""
    rng = np.random.default_rng(13)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = []
    for i in range(300):
        base = " ".join(rng.choice(words, size=8))
        texts.append(base)
        if i % 3 == 0:
            texts[-1] = base + " tail"  # near-dups of the previous base
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))
    cand = pd.DataFrame({
        "a": np.arange(0, 120, 2, dtype=np.int64),
        "b": np.arange(1, 121, 2, dtype=np.int64)})
    cand_ds = ray.data.from_pandas(cand)
    got = ngram_jaccard_pairs(docs, cand_ds, n=3, threshold=0.0)

    def grams(s):
        return {s[i:i + 3] for i in range(max(1, len(s) - 2))}

    from graphscope_ray.util import round_half_away
    want = []
    for a, b in zip(cand["a"], cand["b"]):
        ga, gb = grams(texts[a]), grams(texts[b])
        want.append((a, b, float(round_half_away(
            np.float64(len(ga & gb) / max(1, len(ga | gb))), 6))))
    want_df = (pd.DataFrame(want, columns=["a", "b", "jaccard"])
               .sort_values(["a", "b"]).reset_index(drop=True))
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(want_df)
    assert (got["a"].to_numpy() == want_df["a"].to_numpy()).all()
    assert np.allclose(got["jaccard"], want_df["jaccard"], atol=0)


def test_ngram_jaccard_empty_and_missing_docs():
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": ["", "abc"]}))
    # pair referencing a missing doc id drops (inner semantics);
    # the ("", "abc") pair scores 0 (empty-gram vs substring grams)
    out = ngram_jaccard_pairs(
        docs, pd.DataFrame({"a": [0, 0], "b": [1, 99]}), threshold=0.0)
    assert len(out) == 1
    assert float(out["jaccard"].iloc[0]) == 0.0


def test_cogroup_join_one_to_many_and_sparse_partitions():
    from graphscope_ray.graph.joins import cogroup_join
    left = ray.data.from_pandas(pd.DataFrame({
        "k": np.array([1, 1, 5], dtype=np.int64),
        "tag": ["a", "b", "c"]}))
    right = ray.data.from_pandas(pd.DataFrame({
        "rk": np.array([1, 1, 1, 7], dtype=np.int64),
        "val": np.array([10, 20, 30, 40], dtype=np.int64)}))
    out = cogroup_join(left, right, on="k", right_on="rk",
                       value_cols=["val"]).to_pandas()
    # k=1: 2 left x 3 right = 6 rows; k=5 and rk=7 unmatched drop
    assert len(out) == 6
    assert sorted(out["val"].tolist()) == [10, 10, 20, 20, 30, 30]
    assert set(out["tag"]) == {"a", "b"}


def test_sampling_path_pattern_small():
    from graphscope_ray.graph.api import sampling_path_pattern
    verts = ray.data.from_pandas(pd.DataFrame({
        "vid": np.arange(6, dtype=np.int64),
        "label": ["A", "A", "B", "B", "C", "D"]}))
    edges = ray.data.from_pandas(pd.DataFrame({
        "src": np.array([0, 0, 1, 2, 3, 2, 0], dtype=np.int64),
        "dst": np.array([2, 3, 2, 4, 4, 5, 2], dtype=np.int64),
        "label": ["e", "e", "e", "f", "f", "f", "e"]}))  # dup 0-e-2
    out = (sampling_path_pattern(verts, edges, ["A", "e", "B", "f", "C"])
           .to_pandas().sort_values(["v0", "v1", "v2"])
           .reset_index(drop=True))
    # A-e-B: (0,2) (0,3) (1,2); B-f-C: (2,4) (3,4); 2->5 is D, dropped
    want = pd.DataFrame({"v0": [0, 0, 1], "v1": [2, 3, 2],
                         "v2": [4, 4, 4]})
    assert out.astype(np.int64).equals(want.astype(np.int64))
    capped = sampling_path_pattern(verts, edges, ["A", "e", "B", "f", "C"],
                                   max_paths=2).to_pandas()
    assert len(capped) == 2
    assert capped.sort_values(["v0", "v1"]).reset_index(drop=True)[
        "v0"].tolist() == [0, 0]


def test_dedup_pair_rows_first_per_pair():
    # the simhash/minhash scale-route pair dedup: duplicate (a, b) rows
    # arriving in different blocks collapse to one row, extra columns
    # (functions of the pair) are preserved, distinct pairs untouched
    import ray.data
    from graphscope_ray.data.dedup import dedup_pair_rows

    p1 = pd.DataFrame({"a": np.array([1, 1, 2], dtype=np.int64),
                       "b": np.array([5, 6, 7], dtype=np.int64),
                       "hamming": np.array([0, 1, 2], dtype=np.int64)})
    p2 = pd.DataFrame({"a": np.array([1, 2, 3], dtype=np.int64),
                       "b": np.array([5, 7, 9], dtype=np.int64),
                       "hamming": np.array([0, 2, 3], dtype=np.int64)})
    ds = ray.data.from_pandas([p1, p2])
    out = (dedup_pair_rows(ds).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    want = pd.DataFrame({"a": np.array([1, 1, 2, 3], dtype=np.int64),
                         "b": np.array([5, 6, 7, 9], dtype=np.int64),
                         "hamming": np.array([0, 1, 2, 3], dtype=np.int64)})
    assert out[["a", "b", "hamming"]].equals(want)


def test_minhash_sigs_chunk_boundaries_match_straightline():
    # The chunked minhash_sigs must equal the one-shot reduceat version
    # for every alignment of doc runs vs chunk edges: docs spanning a
    # chunk boundary contribute partial minima from BOTH chunks.
    from graphscope_ray.data import hashing as H

    rng = np.random.default_rng(7)
    a, b = H.minhash_perm_params(16, seed=3)

    def straightline(win_doc, win_hash, n_docs):
        vals = (win_hash[:, None] * a[None, :] + b[None, :]) % H.MERSENNE61
        starts = np.zeros(n_docs, dtype=np.int64)
        cnt = np.bincount(win_doc, minlength=n_docs)
        np.cumsum(cnt[:-1], out=starts[1:])
        return np.minimum.reduceat(vals, starts, axis=0)

    old_chunk = H._SIG_CHUNK
    try:
        H._SIG_CHUNK = 64  # force many boundaries
        H._SIG_BUFS.clear()
        for trial in range(20):
            n_docs = int(rng.integers(1, 40))
            # run lengths 1..~200 so some docs span several 64-chunks
            # and some chunks hold many whole docs
            cnt = rng.integers(1, 200, size=n_docs)
            win_doc = np.repeat(np.arange(n_docs, dtype=np.int64), cnt)
            win_hash = rng.integers(0, 2**63, size=len(win_doc),
                                    dtype=np.int64).astype(np.uint64)
            got = H.minhash_sigs(win_doc, win_hash, n_docs, a, b)
            want = straightline(win_doc, win_hash, n_docs)
            assert (got == want).all(), f"trial {trial} mismatch"
        # exact-boundary alignment: one doc ends exactly at a chunk edge
        cnt = np.array([64, 64, 1], dtype=np.int64)
        win_doc = np.repeat(np.arange(3, dtype=np.int64), cnt)
        win_hash = rng.integers(0, 2**63, size=len(win_doc),
                                dtype=np.int64).astype(np.uint64)
        assert (H.minhash_sigs(win_doc, win_hash, 3, a, b)
                == straightline(win_doc, win_hash, 3)).all()
    finally:
        H._SIG_CHUNK = old_chunk
        H._SIG_BUFS.clear()
