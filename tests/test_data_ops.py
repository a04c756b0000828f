"""Training-data ops over the driver-provided documents/embeddings
tables, with DuckDB cross-checks where the op is SQL-expressible."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from graphscope_ray.data import (
    ann_topk,
    exact_dedup,
    lang_id,
    lsh_ann_topk,
    minhash_lsh_dedup,
    quality_score,
    text_stats,
    token_count,
    fingerprint,
)
from graphscope_ray.data.dedup import (
    embedding_cosine_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from graphscope_ray.data import multimodal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def test_token_count_matches_sql(docs):
    got = token_count(docs).to_pandas().sort_values("doc_id")
    want = duckdb.sql(
        rf"""SELECT doc_id, len(list_filter(string_split_regex(text, '\s+'),
             x -> x <> ''))::BIGINT AS n_tokens
             FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"""
    ).df()
    np.testing.assert_array_equal(got["n_tokens"].to_numpy(),
                                  want["n_tokens"].to_numpy())


def test_quality_score_matches_sql(docs):
    got = quality_score(docs).to_pandas().sort_values("doc_id")
    want = duckdb.sql(
        rf"""
        SELECT doc_id, round(
          (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
             / greatest(length(text), 1))
          * least(1.0, len(list_filter(string_split_regex(text, '\s+'),
                                       x -> x <> ''))::DOUBLE / 100.0),
          6) AS quality
        FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"""
    ).df()
    # round(alpha_ratio,6)*min(...) vs round(product,6): compare loosely
    np.testing.assert_allclose(got["quality"].to_numpy(),
                               want["quality"].to_numpy(), atol=2e-6)


def test_exact_dedup_matches_sql(docs):
    got = exact_dedup(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        f"""SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS dup_count
            FROM read_parquet('{SF}/documents.parquet')
            GROUP BY text ORDER BY doc_id"""
    ).df()
    np.testing.assert_array_equal(got["doc_id"].to_numpy(), want["doc_id"].to_numpy())
    np.testing.assert_array_equal(got["dup_count"].to_numpy(),
                                  want["dup_count"].to_numpy())


def test_minhash_lsh_finds_exact_dups(docs):
    """Exact duplicates have Jaccard 1.0 → every exact-dup pair must land
    in the same MinHash group."""
    groups = minhash_lsh_dedup(docs, threshold=0.9)
    dup_sql = duckdb.sql(
        f"""SELECT list(doc_id ORDER BY doc_id) ids
            FROM read_parquet('{SF}/documents.parquet')
            GROUP BY text HAVING count(*) > 1"""
    ).df()
    lut = dict(zip(groups["doc_id"], groups["dup_group"]))
    for ids in dup_sql["ids"]:
        gs = {lut.get(i) for i in ids}
        assert len(gs) == 1 and None not in gs, f"exact dups split: {ids}"


def test_simhash_identical_distance_zero(docs):
    pairs = simhash_dedup(docs, max_hamming=0)
    want = duckdb.sql(
        f"""WITH d AS (SELECT * FROM read_parquet('{SF}/documents.parquet'))
            SELECT a.doc_id a, b.doc_id b FROM d a JOIN d b
            ON a.text = b.text AND a.doc_id < b.doc_id"""
    ).df()
    got_pairs = set(zip(pairs["a"], pairs["b"]))
    for a, b in zip(want["a"], want["b"]):
        assert (a, b) in got_pairs


def test_ngram_jaccard_verification(docs):
    cand = pd.DataFrame({"a": [0], "b": [1]})
    out = ngram_jaccard_pairs(docs, cand, threshold=0.0)
    assert len(out) == 1 and 0.0 <= out["jaccard"].iloc[0] <= 1.0
    # identical docs → jaccard 1.0
    dup = duckdb.sql(
        f"""WITH d AS (SELECT * FROM read_parquet('{SF}/documents.parquet'))
            SELECT a.doc_id a, b.doc_id b FROM d a JOIN d b
            ON a.text = b.text AND a.doc_id < b.doc_id LIMIT 1"""
    ).df()
    if len(dup):
        out = ngram_jaccard_pairs(docs, dup, threshold=0.0)
        assert out["jaccard"].iloc[0] == 1.0


def test_bpe_token_count_matches_sql(docs):
    from graphscope_ray.data.text import bpe_token_count, BPE_PATTERN
    got = bpe_token_count(docs).to_pandas().sort_values("doc_id")
    pat = BPE_PATTERN.replace("'", "''")
    want = duckdb.sql(
        f"""SELECT doc_id, len(regexp_extract_all(text, '{pat}'))::BIGINT
            AS n_bpe_tokens
            FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"""
    ).df()
    np.testing.assert_array_equal(got["n_bpe_tokens"].to_numpy(),
                                  want["n_bpe_tokens"].to_numpy())


def test_fingerprint_jaccard_pairs_matches_sql(docs):
    from graphscope_ray.data.dedup import fingerprint_jaccard_pairs
    from graphscope_ray import oracle_sql

    got = fingerprint_jaccard_pairs(docs, threshold=0.5)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.sql(oracle_sql.jaccard_pairs_sql(threshold=0.5)).df()
    assert len(got) == len(want)
    if len(got):
        np.testing.assert_array_equal(got["a"].to_numpy(),
                                      want["a"].to_numpy())
        np.testing.assert_array_equal(got["b"].to_numpy(),
                                      want["b"].to_numpy())
        np.testing.assert_allclose(got["jaccard"].to_numpy(),
                                   want["jaccard"].to_numpy(), atol=0)


def test_lang_id_schema(docs):
    out = lang_id(docs).to_pandas()
    assert set(out.columns) == {"doc_id", "lang_pred"}
    assert len(out) == docs.count()
    assert out["lang_pred"].isin(
        ["en", "de", "fr", "es", "code", "unknown"]).all()


def test_fingerprint_deterministic(docs):
    a = fingerprint(docs).to_pandas().sort_values("doc_id")
    b = fingerprint(docs).to_pandas().sort_values("doc_id")
    np.testing.assert_array_equal(a["fingerprint"].to_numpy(),
                                  b["fingerprint"].to_numpy())
    # identical texts → identical fingerprints
    dup = duckdb.sql(
        f"""WITH d AS (SELECT * FROM read_parquet('{SF}/documents.parquet'))
            SELECT a.doc_id a, b.doc_id b FROM d a JOIN d b
            ON a.text = b.text AND a.doc_id < b.doc_id LIMIT 3"""
    ).df()
    lut = dict(zip(a["doc_id"], a["fingerprint"]))
    for x, y in zip(dup["a"], dup["b"]):
        assert lut[x] == lut[y]


def test_ann_topk_matches_sql(emb):
    qdf = emb.take(3)
    queries = np.stack([np.asarray(r["embedding"]) for r in qdf])
    got = ann_topk(emb, queries, k=5)
    want = duckdb.sql(
        f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb
                   FROM read_parquet('{SF}/embeddings.parquet')),
        q AS (SELECT vec_id AS query_id, emb AS qv FROM e WHERE vec_id < 3),
        s AS (SELECT q.query_id, e.vec_id,
                     round(list_cosine_similarity(e.emb, q.qv), 6) cosine
              FROM e CROSS JOIN q),
        r AS (SELECT *, row_number() OVER
                (PARTITION BY query_id ORDER BY cosine DESC, vec_id) rank
              FROM s)
        SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 5
        ORDER BY query_id, rank"""
    ).df()
    np.testing.assert_array_equal(got["vec_id"].to_numpy(),
                                  want["vec_id"].to_numpy())
    np.testing.assert_allclose(got["cosine"].to_numpy(),
                               want["cosine"].to_numpy(), atol=2e-6)


def test_lsh_ann_recall(emb):
    qdf = emb.take(2)
    queries = np.stack([np.asarray(r["embedding"]) for r in qdf])
    exact = ann_topk(emb, queries, k=5)
    approx = lsh_ann_topk(emb, queries, k=5, num_planes=8, num_tables=8)
    # each query vector is its own nearest neighbor → must be recalled
    for qi in range(2):
        top = approx[approx["query_id"] == qi]
        assert len(top) > 0
        assert top.iloc[0]["vec_id"] == exact[exact["query_id"] == qi].iloc[0]["vec_id"]


def test_ivf_ann_subset_of_exact(emb):
    """IVF results are exact within probed lists: every (query, vec)
    the IVF path returns must carry the same cosine the brute-force
    path computes, and rank-1 recall is high when the query vector
    itself is in the corpus (it probes its own centroid)."""
    from graphscope_ray.data.similarity import ann_topk, ivf_ann_topk
    qtab = emb.filter(expr="vec_id < 2").take_batch(8, batch_format="pyarrow")
    order = np.argsort(qtab["vec_id"].to_numpy())
    queries = np.stack(qtab["embedding"].to_numpy(zero_copy_only=False))[order]
    exact = ann_topk(emb, queries, k=5)
    ivf = ivf_ann_topk(emb, queries, k=5, num_centroids=4, nprobe=2)
    ex = {(r.query_id, r.vec_id): r.cosine for r in exact.itertuples()}
    # the query's own vector (cosine 1.0) must be found — it lives in
    # the query's nearest centroid's list
    for qi in (0, 1):
        assert ivf[(ivf.query_id == qi) & (ivf["rank"] == 1)].cosine.iloc[0] == 1.0
    for r in ivf.itertuples():
        if (r.query_id, r.vec_id) in ex:
            assert abs(ex[(r.query_id, r.vec_id)] - r.cosine) < 1e-12


def test_embedding_cosine_dedup(emb):
    pairs = embedding_cosine_dedup(emb, threshold=0.99)
    want = duckdb.sql(
        f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb
                   FROM read_parquet('{SF}/embeddings.parquet'))
        SELECT a.vec_id a, b.vec_id b
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.emb, b.emb) >= 0.99
        ORDER BY a, b"""
    ).df()
    assert len(pairs) == len(want)
    if len(want):
        np.testing.assert_array_equal(pairs["a"].to_numpy(), want["a"].to_numpy())
        np.testing.assert_array_equal(pairs["b"].to_numpy(), want["b"].to_numpy())


def test_multimodal_plumbing():
    tbl = multimodal.synth_media(48)
    ds = ray.data.from_arrow(tbl)
    feats = multimodal.media_features(ds, decode="fake").to_pandas()
    assert len(feats) == 48
    assert all(len(f) == 16 for f in feats["feature"])
    # deterministic
    feats2 = multimodal.media_features(ds, decode="fake").to_pandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = feats2.sort_values("media_id").reset_index(drop=True)
    assert all(np.allclose(x, y) for x, y in zip(a["feature"], b["feature"]))
    # real decode path works end to end for all three kinds
    # (pure-numpy BMP/WAV/AVI codecs)
    real = multimodal.media_features(ds, decode="real").to_pandas()
    assert len(real) == 48
    assert all(len(f) == 16 for f in real["feature"])
    frames = multimodal.frame_sample(ds).to_pandas()
    vids = (tbl["kind"].to_pandas() == "video").sum()
    if vids:
        assert frames["media_id"].nunique() == vids
        assert (frames["ts_ms"] >= 0).all()


def test_lm_score_matches_numpy_oracle():
    from graphscope_ray.data.text import lm_score
    import itertools
    import math
    import re

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["the cat sat on the mat",
                 "the cat sat",
                 "a dog a dog a dog",   # repeated bigrams (m > 1)
                 "zzz",                  # 1 token → no bigram
                 None],                  # null text
    })
    out = (lm_score(ray.data.from_pandas(docs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # independent oracle: pure-python bigram LM with add-one smoothing
    pat = re.compile(r"[a-z0-9]+")
    toks = {r.doc_id: pat.findall((r.text or "").lower())
            for r in docs.itertuples()}
    uni, bg = {}, {}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    V = len(uni)
    for r in out.itertuples():
        ts = toks[r.doc_id]
        pairs = list(zip(ts, ts[1:]))
        assert r.n_bigrams == len(pairs)
        if not pairs:
            assert r.lm_nll == 0.0
            continue
        nll = -sum(math.log((bg[p] + 1) / (uni[p[0]] + V))
                   for p in pairs) / len(pairs)
        assert r.lm_nll == pytest.approx(nll, abs=2e-6)
    # repeated text is less surprising than singleton text
    assert (out.loc[out.doc_id == 3, "lm_nll"].iloc[0]
            < out.loc[out.doc_id == 1, "lm_nll"].iloc[0])


def test_bpe_train_matches_reference():
    """bpe_train vs a pure-python Sennrich BPE with the same
    tokenizer and tie-break."""
    import re
    from collections import Counter

    from graphscope_ray.data.text import bpe_train

    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["low lower lowest", "low low low newer",
                 "newer newest wide wider", "low newer newest",
                 None, "wide wide wide wider"]})

    def reference_bpe(texts, k):
        pat = re.compile(r"[a-z0-9]+")
        wc = Counter()
        for t in texts:
            wc.update(pat.findall((t or "").lower()))
        vocab = {tuple(list(w) + ["</w>"]): c for w, c in wc.items()}
        merges = []
        for _ in range(k):
            pc = Counter()
            for syms, c in vocab.items():
                for p in zip(syms, syms[1:]):
                    pc[p] += c
            if not pc:
                break
            best = max(pc.items(), key=lambda kv: (kv[1],
                                                   [-ord(ch) for ch in
                                                    kv[0][0]]))
            # deterministic tie-break: max count, lexicographically
            # smallest (a, b)
            mx = max(pc.values())
            cands = sorted(p for p, c in pc.items() if c == mx)
            best = cands[0]
            if pc[best] < 2:
                break
            merges.append((best[0], best[1], pc[best]))
            a, b = best
            new_vocab = {}
            for syms, c in vocab.items():
                syms = list(syms)
                i, res = 0, []
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == a
                            and syms[i + 1] == b):
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + c
            vocab = new_vocab
        return merges

    got = bpe_train(ray.data.from_pandas(docs), num_merges=12)
    want = reference_bpe(docs["text"], 12)
    assert got == want
    # the most frequent first merge involves a real bigram of 'low'
    assert got[0][2] >= 2

    # randomized trial
    rng = np.random.default_rng(27)
    vocab_words = ["ab", "abc", "abcd", "xyz", "xy", "q1", "q12",
                   "lower", "low"]
    rdocs = pd.DataFrame({
        "doc_id": range(20),
        "text": [" ".join(rng.choice(vocab_words,
                                     size=rng.integers(1, 30)))
                 for _ in range(20)]})
    got_r = bpe_train(ray.data.from_pandas(rdocs).repartition(4),
                      num_merges=8)
    want_r = reference_bpe(rdocs["text"], 8)
    assert got_r == want_r


def test_bpe_encode_matches_sequential_oracle():
    """bpe_encode (greedy lowest-rank merging, per-word memo) must
    equal the deliberately-different oracle: replaying the merges in
    TRAINING ORDER over each word (classic Sennrich equivalence)."""
    import re as _re

    from graphscope_ray.data.curate import VOCAB_TOKEN_PATTERN
    from graphscope_ray.data.text import bpe_encode, bpe_train

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the cat sat on the mat", "the catalog catalogs cats",
                 "low lower lowest", "newer newest new",
                 "", None],
    })
    ds = ray.data.from_pandas(docs)
    merges = bpe_train(ds, num_merges=12)
    got = (bpe_encode(ds, merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    def oracle_word(w):
        syms = list(w) + ["</w>"]
        for a, b, *_ in merges:   # training order, one merge at a time
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return syms

    pat = _re.compile(VOCAB_TOKEN_PATTERN)
    for _, row in docs.iterrows():
        words = pat.findall((row["text"] or "").lower())
        want = [s for w in words for s in oracle_word(w)]
        have = list(got.loc[got.doc_id == row["doc_id"],
                            "bpe_tokens"].iloc[0])
        assert have == want, (row["doc_id"], have, want)
    assert (got["n_tokens"] == got["bpe_tokens"].str.len()).all()
