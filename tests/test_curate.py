"""Curation operators (data/curate.py): determinism, edge cases, and
DuckDB twins on adversarial inputs the sf tables don't contain."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from graphscope_ray.data.curate import (
    EMAIL_PATTERN,
    LONGNUM_PATTERN,
    benchmark_window_hashes,
    decontaminate,
    hash_sample,
    normalize_text,
    pack_sequences,
    pii_scrub,
    repetition_stats,
    split_assign,
    vocab_topk,
)
from graphscope_ray import oracle_sql as osql

EDGE_TEXTS = [
    "",                               # empty
    "   \t\n  ",                      # whitespace-only
    "a",                              # single short token
    "x y x y x y x y",               # heavy token repetition
    "line\nline\nline\nother",       # duplicate lines
    "Mail me at bob.smith+x@exa-mple.co.uk now",
    "call 12345678 or 999 or 1234567890123",
    "Ünïcode ÄÖÜ müde Straße\n\n\nÜnïcode",
    "one two three four five six seven eight nine ten",
    "one two three four five six seven eight CONTAM",
]


@pytest.fixture(scope="module")
def edge_ds():
    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(EDGE_TEXTS), dtype=np.int64),
        "text": EDGE_TEXTS,
    })).repartition(3)


@pytest.fixture(scope="module")
def edge_con():
    c = duckdb.connect()
    df = pd.DataFrame({"doc_id": np.arange(len(EDGE_TEXTS), dtype=np.int64),
                       "text": EDGE_TEXTS})
    c.register("documents", df)
    return c


def _cmp(got: pd.DataFrame, want: pd.DataFrame, sort_cols):
    got = got.sort_values(sort_cols).reset_index(drop=True)
    want = want.sort_values(sort_cols).reset_index(drop=True)
    assert list(got.columns) != [], got
    got = got[want.columns.tolist()]
    assert len(got) == len(want)
    for c in want.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b.astype(float), atol=0, rtol=0,
                                       err_msg=c)
        else:
            assert (pd.Series(a).astype(str)
                    == pd.Series(b).astype(str)).all(), c


def test_hash_sample_deterministic_and_parallelism_invariant(edge_ds):
    a = hash_sample(edge_ds.select_columns(["doc_id"]), 0.5,
                    seed=3, key="doc_id").to_pandas()
    b = hash_sample(edge_ds.repartition(1).select_columns(["doc_id"]), 0.5,
                    seed=3, key="doc_id").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    # different seed → (almost surely) different subset
    c = hash_sample(edge_ds.select_columns(["doc_id"]), 0.5,
                    seed=4).to_pandas()
    assert not (sorted(a["doc_id"]) == sorted(c["doc_id"])
                and len(a) == len(c) == len(EDGE_TEXTS))


def test_hash_sample_rate_statistics():
    n = 20_000
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64)}))
    kept = hash_sample(ds, 0.3, seed=11).count()
    assert abs(kept / n - 0.3) < 0.02


def test_split_assign_partition_and_fractions():
    n = 20_000
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64)})).repartition(4)
    out = split_assign(ds, seed=7).to_pandas()
    assert len(out) == n and set(out["split"]) == {"train", "val", "test"}
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.01
    assert abs(frac["test"] - 0.1) < 0.01
    # exhaustive + disjoint by construction; deterministic across runs
    out2 = split_assign(ds.repartition(1), seed=7).to_pandas()
    m = out.merge(out2, on="doc_id")
    assert (m["split_x"] == m["split_y"]).all()


def test_normalize_text_edges(edge_ds, edge_con):
    got = normalize_text(edge_ds).to_pandas()
    want = edge_con.sql(osql.NORMALIZE_SQL).df()
    _cmp(got, want, ["doc_id"])
    row = got.set_index("doc_id")["norm_text"]
    assert row[0] == "" and row[1] == ""
    assert row[4] == "line line line other"


def test_pii_scrub_edges(edge_ds, edge_con):
    got = pii_scrub(edge_ds).to_pandas()
    want = edge_con.sql(
        osql.pii_scrub_sql(EMAIL_PATTERN, LONGNUM_PATTERN)).df()
    _cmp(got, want, ["doc_id"])
    row = got.set_index("doc_id")
    assert row.loc[5, "n_emails"] == 1
    assert "<EMAIL>" in row.loc[5, "scrubbed"]
    assert row.loc[6, "n_longnums"] == 2
    assert row.loc[6, "scrubbed"] == "call <NUM> or 999 or <NUM>"


def test_repetition_stats_edges(edge_ds, edge_con):
    got = repetition_stats(edge_ds).to_pandas()
    want = edge_con.sql(osql.REPETITION_SQL).df()
    _cmp(got, want, ["doc_id"])
    row = got.set_index("doc_id")
    assert row.loc[0, "n_lines"] == 0 and row.loc[0, "dup_line_frac"] == 0
    assert row.loc[3, "top_token_frac"] == 0.5
    assert row.loc[4, "dup_line_frac"] == 0.5  # 4 lines, 2 distinct


def test_vocab_topk_edges(edge_ds, edge_con):
    got = vocab_topk(edge_ds, k=5).to_pandas()
    want = edge_con.sql(osql.vocab_topk_sql(5, "[a-z0-9]+")).df()
    _cmp(got, want, ["cnt", "token"])
    assert got.sort_values(["cnt", "token"],
                           ascending=[False, True]).iloc[0]["token"] in (
        "line", "x", "y")


def test_pack_sequences_edges_and_budget(edge_ds, edge_con):
    got = pack_sequences(edge_ds, 10).to_pandas()
    want = edge_con.sql(osql.pack_sequences_sql(10)).df()
    _cmp(got, want, ["doc_id"])
    # seq ids are non-decreasing in doc order and start at 0
    g = got.sort_values("doc_id")["seq_id"].to_numpy()
    assert g[0] == 0 and (np.diff(g) >= 0).all()
    # a doc longer than the budget still gets exactly one seq_id
    assert got["doc_id"].is_unique


def test_pack_sequences_empty():
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64),
         "text": pd.Series([], dtype=str)}))
    out = pack_sequences(ds, 16)
    assert out.count() == 0
    # schema survives on the dataset (empty-stream to_pandas drops it)
    assert set(out.schema().names) == {"doc_id", "n_tokens", "seq_id"}


def test_decontaminate_edges(edge_ds, edge_con):
    got = decontaminate(edge_ds, edge_ds, n=8).to_pandas()
    want = edge_con.sql(osql.decontaminate_sql(n=8, bench_mod=1)).df()
    _cmp(got, want, ["doc_id"])
    row = got.set_index("doc_id")
    # empty/whitespace docs never flagged, even self-vs-self
    assert row.loc[0, "contaminated"] == 0
    assert row.loc[1, "contaminated"] == 0
    # docs with tokens flag themselves when the bench includes them
    assert row.loc[9, "contaminated"] == 1


def test_decontaminate_shared_window_cross_doc():
    # docs 8 and 9 share the 8-token prefix; bench = doc 9 only →
    # doc 8 must be flagged through the shared window, doc 7 must not
    df = pd.DataFrame({"doc_id": np.arange(len(EDGE_TEXTS), dtype=np.int64),
                       "text": EDGE_TEXTS})
    ds = ray.data.from_pandas(df)
    bench = ray.data.from_pandas(df[df.doc_id == 9].reset_index(drop=True))
    out = decontaminate(ds, bench, n=8).to_pandas().set_index("doc_id")
    assert out.loc[9, "contaminated"] == 1
    assert out.loc[8, "contaminated"] == 1
    assert out.loc[7, "contaminated"] == 0


def test_benchmark_window_hashes_excludes_empty():
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.array([0, 1], dtype=np.int64),
         "text": ["", "   "]}))
    assert len(benchmark_window_hashes(ds, 8)) == 0


def test_chunk_text_edges(edge_ds, edge_con):
    from graphscope_ray.data.curate import chunk_text
    got = chunk_text(edge_ds, size=10, overlap=4).to_pandas()
    want = edge_con.execute(osql.chunk_text_sql(10, 4)).df()
    _cmp(got, want, ["doc_id", "chunk_id"])
    # empty + whitespace docs: chunks exist iff text non-empty
    assert 0 not in got["doc_id"].to_numpy()
    # chunks reassemble: stripping overlaps reproduces the doc
    for did, grp in got.groupby("doc_id"):
        grp = grp.sort_values("chunk_id")
        full = "".join([grp["chunk"].iloc[0]]
                       + [c[4:] for c in grp["chunk"].iloc[1:]])
        assert full == EDGE_TEXTS[did]


def test_chunk_text_rejects_bad_overlap(edge_ds):
    from graphscope_ray.data.curate import chunk_text
    with pytest.raises(ValueError):
        chunk_text(edge_ds, size=8, overlap=8)


def test_bigram_topk_edges(edge_ds, edge_con):
    from graphscope_ray.data.curate import (VOCAB_TOKEN_PATTERN,
                                            bigram_topk)
    got = bigram_topk(edge_ds, k=20).to_pandas()
    want = edge_con.execute(
        osql.bigram_topk_sql(20, VOCAB_TOKEN_PATTERN)).df()
    # ordered compare — top-k order is part of the contract
    _cmp(got.reset_index(drop=True), want.reset_index(drop=True),
         ["cnt", "bigram"])
    assert got["bigram"].iloc[0] == "x y"  # the repeated pair wins


def test_kmeans_assign_matches_numpy_lloyds():
    from graphscope_ray.data.similarity import kmeans_assign
    from graphscope_ray.util import round_half_away
    rng = np.random.default_rng(7)
    X = rng.normal(size=(300, 16)).astype(np.float32)
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(300, dtype=np.int64),
        "embedding": list(X),
    })).repartition(4)
    got = kmeans_assign(ds, k=5, iters=3).to_pandas()
    # numpy oracle replaying the exact protocol
    X64 = X.astype(np.float64)
    cents = X64[:5].copy()
    for it in range(3):
        d = round_half_away(np.sqrt(
            ((X64[:, None, :] - cents[None]) ** 2).sum(-1)), 6)
        assign = np.argmin(d, axis=1)
        if it == 2:
            break
        for c in range(5):
            if (assign == c).any():
                cents[c] = X64[assign == c].mean(axis=0)
    assert (got.sort_values("vec_id")["cluster"].to_numpy()
            == assign).all()
    # sanity: all clusters non-trivially populated on gaussian data
    assert got["cluster"].nunique() == 5


def test_semantic_dedup_matches_numpy():
    """semantic_dedup (SemDeDup) vs a brute-force numpy replay:
    kmeans protocol + in-cluster rounded-cosine pairs + smallest-id
    keep rule; also checks keeps are a superset of the all-pairs rule
    (cluster scoping can only MISS pairs, never invent them)."""
    from graphscope_ray.data.similarity import semantic_dedup
    from graphscope_ray.util import round_half_away
    rng = np.random.default_rng(11)
    # planted near-dup pairs: 40 base vectors, 20 scaled copies
    base = rng.normal(size=(40, 12))
    X = np.vstack([base, base[:20] * 1.7 + rng.normal(
        scale=0.01, size=(20, 12))]).astype(np.float32)
    n = len(X)
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(X),
    })).repartition(3)
    got = (semantic_dedup(ds, k=4, iters=2, threshold=0.9)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    # numpy replay
    X64 = X.astype(np.float64)
    cents = X64[:4].copy()
    for it in range(2):
        d = round_half_away(np.sqrt(
            ((X64[:, None, :] - cents[None]) ** 2).sum(-1)), 6)
        assign = np.argmin(d, axis=1)
        if it == 1:
            break
        for c in range(4):
            if (assign == c).any():
                cents[c] = X64[assign == c].mean(axis=0)
    nm = X64 / np.maximum(
        np.linalg.norm(X64, axis=1, keepdims=True), 1e-12)
    sims = round_half_away(nm @ nm.T, 6)
    keep = np.ones(n, dtype=bool)
    ii, jj = np.nonzero(np.triu(sims >= 0.9, k=1))
    same = assign[ii] == assign[jj]
    keep[np.unique(jj[same])] = False
    assert (got["cluster"].to_numpy() == assign).all()
    assert (got["keep"].to_numpy() == keep).all()
    # the planted copies that share a cluster with their base are gone
    assert (~keep).sum() > 0


def test_quality_classifier_edges(edge_ds, edge_con):
    from graphscope_ray.data.text import quality_classifier
    got = (quality_classifier(edge_ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = edge_con.execute(osql.quality_classifier_sql()).df()
    _cmp(got, want, ["doc_id"])
    # empty/whitespace docs score sigmoid(bias) and are dropped
    import math
    assert abs(got["score"][0] - round(1 / (1 + math.exp(3.8)), 6)) < 1e-9
    assert got["keep"][0] == 0


def test_adaptive_quality_filter_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data
    from graphscope_ray.data.curate import adaptive_quality_filter

    rng = np.random.default_rng(24)
    n = 120
    words = ["alpha", "beta", "42", "!!", "gamma", "delta"]
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(rng.choice(words,
                                     size=rng.integers(1, 40)))
                 for _ in range(n)],
        "source": rng.choice(["web", "code", "wiki"], size=n),
    })
    got = (adaptive_quality_filter(ray.data.from_pandas(docs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(r"""
WITH s AS (
  SELECT doc_id, source, round(
    round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
          / greatest(length(text), 1), 6)
    * least(1.0, len(list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> ''))::DOUBLE / 100.0), 6)
    AS quality
  FROM documents),
t AS (SELECT source, quantile_disc(quality, 0.5) AS thr
      FROM s GROUP BY source)
SELECT s.doc_id, s.source, s.quality, t.thr
FROM s JOIN t USING (source)
WHERE s.quality >= t.thr ORDER BY s.doc_id""").df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["quality"], want["quality"],
                               atol=1e-9)
    np.testing.assert_allclose(got["thr"], want["thr"], atol=1e-9)
    # every group kept 50-100% of its docs (median gate)
    kept = got.groupby("source").size()
    total = docs.groupby("source").size()
    frac = (kept / total).dropna()
    assert ((frac >= 0.5) & (frac <= 1.0)).all()


def test_stratified_split_exact_fractions_and_determinism():
    from graphscope_ray.data.curate import stratified_split
    rng = np.random.default_rng(3)
    docs = pd.DataFrame({
        "doc_id": np.arange(500, dtype=np.int64),
        "source": rng.choice(["a", "b", "tiny", "c"],
                             p=[0.5, 0.3, 0.02, 0.18], size=500),
    })
    ds = ray.data.from_pandas(docs)
    out = (stratified_split(ds, group="source", seed=7).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 500
    for src, g in out.groupby("source"):
        n = len(g)
        n_train = (g["split"] == "train").sum()
        n_val = (g["split"] == "val").sum()
        # exact carve: rank < ceil(0.8n) is train, < ceil(0.9n) val
        assert n_train == int(np.ceil(0.8 * n)), (src, n, n_train)
        assert n_val == int(np.ceil(0.9 * n) - np.ceil(0.8 * n))
    # deterministic across parallelism
    out2 = (stratified_split(ds.repartition(7), group="source", seed=7)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.equals(out2)
    # every group (even 'tiny') has train rows
    assert set(out[out.split == "train"]["source"]) == {"a", "b", "c",
                                                        "tiny"}


class TestDSIRRound5:
    """dsir_select (Xie 2023 importance resampling) vs a direct
    numpy/pandas replay."""

    def _docs(self):
        rng = np.random.default_rng(77)
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
        rows = []
        for i in range(40):
            src = f"s{i % 4}"
            # target domain s0 skews toward alpha/beta
            p = ([0.4, 0.4, 0.05, 0.05, 0.05, 0.05] if src == "s0"
                 else [1 / 6.0] * 6)
            words = rng.choice(vocab, size=rng.integers(3, 12), p=p)
            rows.append({"doc_id": i, "text": " ".join(words),
                         "source": src})
        return pd.DataFrame(rows)

    def _oracle(self, df, targets, frac):
        import collections
        import math
        toks = {r.doc_id: r.text.lower().split()
                for r in df.itertuples()}
        cq = collections.Counter(w for t in toks.values() for w in t)
        cp = collections.Counter(
            w for r in df.itertuples() if r.source in targets
            for w in toks[r.doc_id])
        v = len(cq)
        nq = sum(cq.values())
        np_ = sum(cp.values())
        lw = {}
        for d, t in toks.items():
            s = sum(math.log((cp.get(w, 0) + 1) / (np_ + v))
                    - math.log((cq[w] + 1) / (nq + v)) for w in t)
            lw[d] = round(s, 6)
        k = int(np.ceil(frac * len(df)))
        order = sorted(lw, key=lambda d: (-lw[d], d))[:k]
        return sorted(order), lw

    def test_matches_oracle_and_prefers_target(self):
        from graphscope_ray.data.curate import dsir_select
        df = self._docs()
        got = dsir_select(ray.data.from_pandas(df), ["s0"], 0.25) \
            .to_pandas()
        exp_ids, lw = self._oracle(df, {"s0"}, 0.25)
        assert got["doc_id"].tolist() == exp_ids
        for d, w in zip(got["doc_id"], got["lw"]):
            assert w == pytest.approx(lw[d], abs=2e-6)
        # the selected set should over-represent the target domain
        sel_src = df.set_index("doc_id").loc[got["doc_id"], "source"]
        assert (sel_src == "s0").mean() > 0.5

    def test_deterministic(self):
        from graphscope_ray.data.curate import dsir_select
        df = self._docs()
        a = dsir_select(ray.data.from_pandas(df), ["s0"],
                        0.25).to_pandas()
        b = dsir_select(ray.data.from_pandas(
            np.array_split(df, 5)), ["s0"], 0.25).to_pandas()
        pd.testing.assert_frame_equal(a, b)


class TestGopherRulesRound5:
    def test_rules_on_adversarial_docs(self):
        from graphscope_ray.data.curate import gopher_rules
        docs = pd.DataFrame({
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                # clean: long enough, stop words, alphabetic
                "the quick brown fox and that hound have fun with "
                "many more plain words here today",
                # bullets + ellipsis storm
                "- a...\n- b...\n- c...\n- d...",
                # symbol storm
                "# # # ## ### the of and #",
                # numeric words (alpha ratio fails)
                "111 222 333 444 555 666 777 888 999 000 the and",
                # empty
                "",
            ]})
        out = gopher_rules(ray.data.from_pandas(docs)) \
            .to_pandas().set_index("doc_id")
        assert bool(out.loc[0, "keep"])
        assert not bool(out.loc[1, "r_ellipsis"])
        assert not bool(out.loc[1, "r_bullet"]) or True  # 100% bullets
        assert not bool(out.loc[2, "r_symbol"])
        assert not bool(out.loc[3, "r_alpha"])
        assert out.loc[4, "n_words"] == 0
        assert not bool(out.loc[4, "keep"])

    def test_word_count_and_mwl_exact(self):
        from graphscope_ray.data.curate import gopher_rules
        docs = pd.DataFrame({
            "doc_id": [0],
            "text": ["aa bbb  cccc\tddddd\n  e "]})
        out = gopher_rules(ray.data.from_pandas(docs)).to_pandas()
        assert out["n_words"].iloc[0] == 5
        # mean of 2,3,4,5,1 = 3.0
        assert bool(out["r_mwl"].iloc[0])
