"""Text analysis operators over a documents table.

All operators are Ray Data batch transforms; regex/lexicon state is
built once per pickled callable instance and shipped to a task pool
(actor pools are reserved for stages with genuinely expensive state —
e.g. decontamination's broadcast hash set), vectorized via pandas
string kernels / numpy inside the batch. Definitions are
chosen to be exactly reproducible in ANSI SQL where the driver's DuckDB
oracle needs to replay them (token_count, quality_score).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from graphscope_ray.util import round_half_away

def token_count(ds: ray.data.Dataset, col: str = "text",
                key: str = "doc_id") -> ray.data.Dataset:
    """(key, n_tokens): number of non-empty whitespace-separated pieces
    (= number of ``\\S+`` matches) — SQL-equivalent:
    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')).
    Fully vectorized: one Arrow re2 kernel pass, no per-row Python."""

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = pc.fill_null(t[col], "")
        toks = pc.cast(pc.count_substring_regex(s, r"\S+"), pa.int64())
        return pa.table({key: t[key], "n_tokens": toks})

    return ds.map_batches(f, batch_format="pyarrow")


# GPT-2-style pretokenizer, re2-compatible (no lookahead / unicode
# classes): contractions, letter runs, digit runs, punctuation runs —
# each optionally preceded by one space. Arrow and DuckDB both use re2,
# so the engine and the SQL oracle share this exact pattern string.
BPE_PATTERN = (r"'[sdmt]|'ll|'ve|'re"
               r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+")


def bpe_token_count(ds: ray.data.Dataset, col: str = "text",
                    key: str = "doc_id") -> ray.data.Dataset:
    """(key, n_bpe_tokens): number of non-overlapping BPE_PATTERN
    matches — a BPE-ish pretokenizer token count (the thing an LLM-data
    pipeline budgets by), cheaper than real BPE merges but tracking
    them far better than whitespace counts. One Arrow re2 pass; the
    SQL oracle counts the same pattern via regexp_extract_all."""

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = pc.fill_null(t[col], "")
        toks = pc.cast(pc.count_substring_regex(s, BPE_PATTERN), pa.int64())
        return pa.table({key: t[key], "n_bpe_tokens": toks})

    return ds.map_batches(f, batch_format="pyarrow")


def text_stats(ds: ray.data.Dataset, col: str = "text",
               key: str = "doc_id", keep: tuple = ()) -> ray.data.Dataset:
    """(key, *keep, n_chars, n_tokens, alpha_ratio) — building blocks
    for quality filtering; each component SQL-replayable. Arrow re2
    count kernels (no per-row Python). ``keep`` columns pass through
    untouched (e.g. ``source`` for per-domain selection)."""

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = pc.fill_null(t[col], "")
        n_chars = pc.cast(pc.utf8_length(s), pa.int64()).to_numpy()
        n_tokens = pc.cast(
            pc.count_substring_regex(s, r"\S+"), pa.int64())
        n_alpha = pc.cast(
            pc.count_substring_regex(s, r"[a-zA-Z]"), pa.int64()).to_numpy()
        alpha_ratio = np.where(
            n_chars > 0, n_alpha / np.maximum(n_chars, 1), 0.0)
        cols = {key: t[key]}
        for c in keep:
            cols[c] = t[c]
        cols.update({
            "n_chars": pa.array(n_chars),
            "n_tokens": n_tokens,
            "alpha_ratio": pa.array(round_half_away(alpha_ratio, 6)),
        })
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def quality_score(ds: ray.data.Dataset, col: str = "text",
                  key: str = "doc_id", keep: tuple = ()) -> ray.data.Dataset:
    """(key, *keep, quality): alpha_ratio × min(1, n_tokens/100) — a
    simple deterministic quality proxy (length + letter density),
    rounded to 6 dp so the SQL oracle hash-matches."""
    stats = text_stats(ds, col, key, keep=keep)

    def f(t: pa.Table) -> pa.Table:
        nt = t["n_tokens"].to_numpy().astype(np.float64)
        ar = t["alpha_ratio"].to_numpy()
        q = round_half_away(ar * np.minimum(1.0, nt / 100.0), 6)
        cols = {key: t[key]}
        for c in keep:
            cols[c] = t[c]
        cols["quality"] = pa.array(q)
        return pa.table(cols)

    return stats.map_batches(f, batch_format="pyarrow")


_LEXICONS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on",
           "with", "as", "this", "that", "be"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "auf",
           "ein", "eine", "nicht", "den", "im", "zu"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est",
           "pour", "dans", "que", "qui", "sur", "avec"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "en",
           "que", "por", "con", "para", "del"},
    "code": {"def", "return", "import", "class", "fn", "let", "var",
             "const", "func", "void", "int", "struct", "impl", "pub",
             "match"},
}


class _LangId:
    """Stopword-vote language id — vectorized: extract-all + explode
    against a token→language vote table (compiled once per actor), then
    per-(doc, lang) counts and an argmax with alphabetical-first
    tie-break (winner = first lang in sorted order with the strictly
    maximal count; 'unknown' when every count is 0). Exactly replayed
    by oracle_sql.langid_sql."""

    def __init__(self, col: str, key: str):
        self.col, self.key = col, key
        self.word = re.compile(r"[a-zA-ZäöüéèêàçñÄÖÜ]+")
        self.langs = sorted(_LEXICONS)
        rows = [(w, i) for i, lang in enumerate(self.langs)
                for w in _LEXICONS[lang]]
        self.vote = pd.DataFrame(rows, columns=["tok", "_lang_idx"])

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = (df[self.col].fillna("").reset_index(drop=True)
                .str.findall(self.word)
                .explode().dropna().str.lower())
        votes = toks.reset_index(name="tok").merge(self.vote, on="tok")
        counts = np.zeros((len(df), len(self.langs)), dtype=np.int64)
        if len(votes):
            np.add.at(counts,
                      (votes["index"].to_numpy(),
                       votes["_lang_idx"].to_numpy()), 1)
        best = counts.argmax(axis=1)  # first max wins = sorted-order tie
        names = np.array(self.langs + ["unknown"])
        best = np.where(counts.max(axis=1) > 0, best, len(self.langs))
        return pd.DataFrame({self.key: df[self.key].to_numpy(),
                             "lang_pred": names[best]})


def lang_id(ds: ray.data.Dataset, col: str = "text",
            key: str = "doc_id") -> ray.data.Dataset:
    # instance (task pool): the vote table is ~75 rows, so actor-pool
    # spin-up costs more than it saves (see dedup.minhash_signatures)
    return ds.map_batches(_LangId(col, key), batch_format="pandas")


class _Fingerprint:
    """Winnowing-style document fingerprint: minimum over sliding
    windows of ``k_eff = min(k, n_tokens)`` combined token hashes —
    deterministic int64 per doc (cheap near-dup prefilter). One
    vectorized codepoint pass per batch (data/hashing — no Python loop
    over tokens or rows); exactly replayed by
    oracle_sql.fingerprint_sql. Docs with no tokens fingerprint to 0."""

    def __init__(self, col: str, key: str, k: int):
        self.col, self.key, self.k = col, key, k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from graphscope_ray.data.hashing import (
            batch_token_hashes, windowed_hashes)
        texts = df[self.col].fillna("").tolist()
        tok_doc, tok_hash = batch_token_hashes(texts)
        win_doc, win_hash = windowed_hashes(tok_doc, tok_hash, self.k,
                                            len(texts))
        starts = np.zeros(len(texts), dtype=np.int64)
        cnt = np.bincount(win_doc, minlength=len(texts))
        np.cumsum(cnt[:-1], out=starts[1:])
        fps = np.minimum.reduceat(win_hash, starts) if len(win_hash) else \
            np.zeros(len(texts), dtype=np.uint64)
        return pd.DataFrame({
            self.key: df[self.key].to_numpy(),
            "fingerprint": fps.astype(np.int64),
        })


def fingerprint(ds: ray.data.Dataset, col: str = "text", key: str = "doc_id",
                k: int = 5) -> ray.data.Dataset:
    # stateless per worker → task pool (see dedup.minhash_signatures)
    return ds.map_batches(_Fingerprint(col, key, k), batch_format="pandas")


# -- hashed TF-IDF (the "hashing trick" vectorizer) ---------------------

class _TFKernel:
    """Per-batch sparse hashed term frequencies: every whitespace token
    hashes into one of ``dim`` slots (slot = fmix64(poly(token)) mod
    dim — the shared hash family, so the SQL twin replays it
    bit-exactly) and the batch emits one ``(key, slot, tf)`` row per
    (document, non-empty slot). A document's text is one row, so its
    counts complete inside the batch — TF needs NO shuffle at any
    scale."""

    def __init__(self, col: str, key: str, dim: int):
        self.col, self.key, self.dim = col, key, dim

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from graphscope_ray.data.hashing import batch_token_hashes
        texts = df[self.col].fillna("").tolist()
        tok_doc, tok_hash = batch_token_hashes(texts)
        slot = (tok_hash % np.uint64(self.dim)).astype(np.int64)
        pk = tok_doc * self.dim + slot
        uniq, tf = np.unique(pk, return_counts=True)
        di = uniq // self.dim
        return pd.DataFrame({
            self.key: df[self.key].to_numpy()[di],
            "slot": (uniq % self.dim).astype(np.int64),
            "tf": tf.astype(np.int64),
        })


def _idf_vector(tf_rows: ray.data.Dataset, n_docs: int, dim: int,
                smooth: bool = True) -> np.ndarray:
    """Document frequency per slot → idf = ln((N+1)/(df+1)) + 1
    (smooth) from the sparse TF rows. Per-batch bincount combiner →
    a ≤``dim``-row groupby — the only exchange in the whole vectorizer,
    and it moves at most #batches × dim tiny integer rows. The reduce
    is util.bucketed_sum (a plain aggregate would pay ~ms of Python
    dispatch per distinct slot — seconds at dim ≥ 4096)."""
    from graphscope_ray.util import bucketed_sum

    def dfp(t: pa.Table) -> pa.Table:
        c = np.bincount(t["slot"].to_numpy(), minlength=dim)
        nz = np.flatnonzero(c)
        return pa.table({"slot": pa.array(nz.astype(np.int64)),
                         "dfp": pa.array(c[nz].astype(np.int64))})

    parts = bucketed_sum(
        tf_rows.map_batches(dfp, batch_format="pyarrow"),
        "slot", "dfp").take_all()
    parts = [{"slot": r["slot"], "df": r["dfp"]} for r in parts]
    df = np.zeros(dim, dtype=np.float64)
    for r in parts:
        df[r["slot"]] = r["df"]
    return np.log((n_docs + 1.0) / (df + 1.0)) + 1.0


def tfidf_rows(ds: ray.data.Dataset, *, col: str = "text",
               key: str = "doc_id", dim: int = 1024) -> ray.data.Dataset:
    """Sparse hashed TF-IDF: ``(key, slot, tf, tfidf)`` rows with
    ``tfidf = round6(tf · (ln((N+1)/(df+1)) + 1))`` — smooth idf,
    half-away rounding (the repo's SQL-twin convention; see
    oracle_sql.tfidf_sql). 100 TB shape: one text pass produces the
    sparse TF rows (materialized once — integers, far smaller than the
    corpus), the df reduce is a ≤dim-row exchange, and idf attaches via
    one ``ray.put`` broadcast — the raw text is never shuffled.
    Documents with no tokens contribute no rows (both sides)."""
    n_docs = ds.count()
    rows = ds.map_batches(_TFKernel(col, key, dim),
                          batch_format="pandas").materialize()
    idf = _idf_vector(rows, n_docs, dim)
    ref = ray.put(idf)

    def attach(t: pa.Table) -> pa.Table:
        iv = ray.get(ref)
        s = t["slot"].to_numpy()
        tf = t["tf"].to_numpy()
        return t.append_column(
            "tfidf", pa.array(round_half_away(tf * iv[s], 6)))

    return rows.map_batches(attach, batch_format="pyarrow")


class _DenseTFIDF:
    """Dense hashed TF-IDF embedding per document (idf broadcast via
    ``ray.put`` once; per-batch one bincount reshape + one row-scale —
    no np.add.at, no Python loop)."""

    def __init__(self, col, key, dim, idf_ref, l2_normalize):
        self.col, self.key, self.dim = col, key, dim
        self.idf_ref, self.l2 = idf_ref, l2_normalize

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from graphscope_ray.data.hashing import batch_token_hashes
        import ray as _ray
        texts = df[self.col].fillna("").tolist()
        n = len(texts)
        tok_doc, tok_hash = batch_token_hashes(texts)
        slot = (tok_hash % np.uint64(self.dim)).astype(np.int64)
        cnt = np.bincount(tok_doc * self.dim + slot,
                          minlength=n * self.dim)
        m = cnt.reshape(n, self.dim).astype(np.float64)
        if self.idf_ref is not None:
            m *= _ray.get(self.idf_ref)
        if self.l2:
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            np.divide(m, norms, out=m, where=norms > 0)
        return pd.DataFrame({self.key: df[self.key].to_numpy(),
                             "embedding": list(m)})


def tfidf_vectors(ds: ray.data.Dataset, *, col: str = "text",
                  key: str = "doc_id", dim: int = 256,
                  use_idf: bool = True,
                  l2_normalize: bool = True) -> ray.data.Dataset:
    """Dense hashed TF-IDF embeddings ``(key, embedding: list<f64>)``
    — the text→vector bridge into the similarity family (ann_topk /
    knn_graph / embedding_cosine_dedup take this output directly; see
    tests/test_tfidf.py for the text→tfidf→kNN→WCC composition).
    Token-less documents embed as the zero vector (L2 of 0 stays 0).
    Two passes over the text (df reduce, then dense assembly) — both
    stream; only the dim-length idf vector ever sits on the driver."""
    idf_ref = None
    if use_idf:
        n_docs = ds.count()
        rows = ds.map_batches(_TFKernel(col, key, dim),
                              batch_format="pandas")
        idf_ref = ray.put(_idf_vector(rows, n_docs, dim))
    return ds.map_batches(_DenseTFIDF(col, key, dim, idf_ref,
                                      l2_normalize),
                          batch_format="pandas")


QUALITY_LOGIT_WEIGHTS = {
    "bias": -3.8,
    "log_tokens": 0.5,
    "alpha_ratio": 2.0,
    "len_sat": 1.0,
    "digit_ratio": -3.0,
}


def quality_classifier(ds: ray.data.Dataset, col: str = "text",
                       key: str = "doc_id",
                       weights: dict = None) -> ray.data.Dataset:
    """Frozen-weight logistic quality classifier — the model-inference
    stage shape (vectorized featurize → dot → sigmoid per batch; the
    weight vector rides the task closure; swap in learned weights for
    a real fastText-style gate). Features: ln(1+n_tokens),
    alpha_ratio, min(1, n_tokens/100), digit_ratio — every one an RE2
    count shared verbatim with the SQL twin
    (oracle_sql.quality_classifier_sql). → (key, score[6dp],
    keep∈{0,1})."""
    w = dict(QUALITY_LOGIT_WEIGHTS, **(weights or {}))

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = pc.fill_null(t[col], "")
        n_chars = pc.cast(pc.utf8_length(s), pa.int64()).to_numpy()
        nt = pc.cast(pc.count_substring_regex(s, r"\S+"),
                     pa.int64()).to_numpy().astype(np.float64)
        na = pc.cast(pc.count_substring_regex(s, r"[a-zA-Z]"),
                     pa.int64()).to_numpy().astype(np.float64)
        nd = pc.cast(pc.count_substring_regex(s, r"[0-9]"),
                     pa.int64()).to_numpy().astype(np.float64)
        denom = np.maximum(n_chars, 1).astype(np.float64)
        logit = (w["bias"]
                 + w["log_tokens"] * np.log(1.0 + nt)
                 + w["alpha_ratio"] * (na / denom)
                 + w["len_sat"] * np.minimum(1.0, nt / 100.0)
                 + w["digit_ratio"] * (nd / denom))
        score = 1.0 / (1.0 + np.exp(-logit))
        return pa.table({
            key: t[key],
            "score": pa.array(round_half_away(score, 6)),
            "keep": pa.array((score >= 0.5).astype(np.int64)),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def lm_score(ds: ray.data.Dataset, col: str = "text",
             key: str = "doc_id") -> ray.data.Dataset:
    """(key, n_bigrams, lm_nll): corpus-trained bigram language-model
    quality score — the CCNet-style LM filter shape (Wenzek et al.
    2020, arXiv:1911.00359): docs whose token sequences the corpus LM
    finds surprising (high per-token negative log-likelihood) are
    low-quality / out-of-domain candidates.

    Tokens are ``[a-z0-9]+`` runs of lower(text) (the shared
    VOCAB_TOKEN_PATTERN tokenizer); the model is trained on the corpus
    itself in one pass, then every doc is scored

        lm_nll = -( Σ_bigrams m·ln( (c2(w1,w2)+1) / (c1(w1)+V) ) ) / n

    with add-one smoothing: ``c2`` = corpus bigram count, ``c1`` =
    corpus unigram count (all positions), ``V`` = distinct-unigram
    count, ``m`` = the bigram's in-doc multiplicity, ``n`` = the doc's
    bigram total (tokens−1). Per-token mean, so length doesn't
    dominate; docs with <2 tokens get (0, 0.0).

    100 TB shape: a doc's bigrams never leave their batch un-reduced —
    per-(doc, bigram) multiplicities are the combiner; the two count
    tables reduce via ``bucketed_sum`` (O(distinct) rows move) and
    attach back with ``attach_values`` (broadcast under
    BROADCAST_ROWS, hash join above — the vocabulary, not the corpus,
    is what moves). Zero driver materialization of anything
    corpus-sized."""
    import re as _re

    from graphscope_ray.data.curate import VOCAB_TOKEN_PATTERN
    from graphscope_ray.graph.joins import attach_values
    from graphscope_ray.util import bucketed_sum, round_half_away

    pat = _re.compile(VOCAB_TOKEN_PATTERN)

    def doc_bigrams(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df[col].fillna("").str.lower().str.findall(pat)
        ex = toks.explode().dropna()
        if not len(ex):
            return pd.DataFrame({
                key: pd.Series([], dtype=df[key].dtype),
                "w1": pd.Series([], dtype=str),
                "bg": pd.Series([], dtype=str),
                "m": pd.Series([], dtype=np.int64)})
        idx = ex.index.to_numpy()
        vals = ex.to_numpy(dtype=object)
        same = idx[1:] == idx[:-1]
        lhs = vals[:-1][same].astype(str)
        rhs = vals[1:][same].astype(str)
        rows = pd.DataFrame({
            key: df[key].to_numpy()[idx[:-1][same]],
            "w1": lhs,
            "bg": np.char.add(np.char.add(lhs, " "), rhs)})
        out = rows.groupby([key, "w1", "bg"], sort=False).size()
        return out.rename("m").reset_index()

    def doc_unigrams(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[col].fillna("").str.lower().str.findall(pat)
        ex = toks.explode().dropna()
        vc = pd.Series(ex.to_numpy(dtype=object)).value_counts()
        return pd.DataFrame({"w": vc.index.astype(str),
                             "c1": vc.to_numpy().astype(np.int64)})

    bg_rows = ds.map_batches(doc_bigrams,
                             batch_format="pandas").materialize()
    c1 = bucketed_sum(ds.map_batches(doc_unigrams,
                                     batch_format="pandas"),
                      ["w"], vals=["c1"]).materialize()
    vocab_v = float(c1.count())
    c2 = bucketed_sum(bg_rows.select_columns(["bg", "m"]), ["bg"],
                      vals=["m"])
    from graphscope_ray.util import rename as _rn
    # pin the count tables: attach_values consumes each twice
    # (count() to pick the route, then the broadcast/to_pandas read)
    c2 = _rn(c2, {"m": "c2"}).materialize()
    rows = attach_values(bg_rows, c2, on="bg", table_key="bg",
                         value_names=["c2"])
    rows = attach_values(rows, c1, on="w1", table_key="w",
                         value_names=["c1"])

    def term(df: pd.DataFrame) -> pd.DataFrame:
        m = df["m"].to_numpy().astype(np.float64)
        s = m * np.log((df["c2"].to_numpy() + 1.0)
                       / (df["c1"].to_numpy() + vocab_v))
        return pd.DataFrame({key: df[key], "s": s,
                             "n": df["m"].to_numpy()})

    agg = bucketed_sum(rows.map_batches(term, batch_format="pandas"),
                       [key], vals=["s", "n"]).materialize()
    keys_ds = ds.select_columns([key])
    withs = attach_values(keys_ds, agg, on=key, table_key=key,
                          value_names=["s", "n"],
                          defaults={"s": 0.0, "n": 0})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy().astype(np.int64)
        s = df["s"].to_numpy()
        nll = -s / np.maximum(n, 1)
        return pd.DataFrame({
            key: df[key], "n_bigrams": n,
            "lm_nll": round_half_away(nll, 6)})

    return withs.map_batches(finish, batch_format="pandas")


def bpe_train(ds: ray.data.Dataset, num_merges: int = 50, *,
              col: str = "text") -> list:
    """Learn ``num_merges`` BPE merges from the corpus (the tokenizer-
    training stage of an LLM-data pipeline, Sennrich et al. 2016).

    Shape (100 TB): ONE corpus pass builds the distinct-WORD frequency
    table (per-batch value_counts combiner → bucketed_sum — the corpus
    itself is touched exactly once); every merge round then runs over
    that word-type table, which is orders of magnitude smaller (what
    HuggingFace trainers hold in one process, here a Dataset): pair
    counting is a per-batch combiner + one coarse-bucket sum of
    (sym_a, sym_b, cnt) rows, the argmax pair is a sort+limit(1) pull
    of ONE row, and the merge applies as an embarrassingly-parallel
    map_batches rewrite of the symbol sequences.

    Words are ``[a-z0-9]+`` runs of lower(text) (the shared
    VOCAB_TOKEN_PATTERN); symbols start as single characters with a
    ``</w>`` end-of-word marker. Tie-break: max count, then
    lexicographically smallest (a, b) — fully deterministic.
    Returns the ordered merge list ``[(a, b, count), ...]``."""
    import re as _re

    from graphscope_ray.data.curate import VOCAB_TOKEN_PATTERN
    from graphscope_ray.util import bucketed_sum

    pat = _re.compile(VOCAB_TOKEN_PATTERN)

    def word_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[col].fillna("").str.lower().str.findall(pat)
        ex = toks.explode().dropna()
        vc = pd.Series(ex.to_numpy(dtype=object)).value_counts()
        return pd.DataFrame({"word": vc.index.astype(str),
                             "cnt": vc.to_numpy().astype(np.int64)})

    words = bucketed_sum(ds.map_batches(word_counts,
                                        batch_format="pandas"),
                         ["word"], vals=["cnt"])

    def to_syms(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["syms"] = [list(w) + ["</w>"] for w in df["word"]]
        return df[["syms", "cnt"]]

    table = words.map_batches(to_syms,
                              batch_format="pandas").materialize()
    merges = []
    for _ in range(num_merges):
        def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
            rows: dict = {}
            for syms, c in zip(df["syms"], df["cnt"]):
                for a, b in zip(syms, syms[1:]):
                    rows[(a, b)] = rows.get((a, b), 0) + int(c)
            if not rows:
                return pd.DataFrame({
                    "a": pd.Series([], dtype=str),
                    "b": pd.Series([], dtype=str),
                    "cnt": pd.Series([], dtype=np.int64)})
            ks = list(rows)
            return pd.DataFrame({
                "a": [k[0] for k in ks], "b": [k[1] for k in ks],
                "cnt": np.fromiter(rows.values(), dtype=np.int64)})

        pc_ds = bucketed_sum(table.map_batches(pair_counts,
                                               batch_format="pandas"),
                             ["a", "b"], vals=["cnt"])
        top = (pc_ds.sort(["cnt", "a", "b"],
                          descending=[True, False, False])
               .limit(1).to_pandas())
        if not len(top) or int(top["cnt"].iloc[0]) < 2:
            break
        a, b, c = (str(top["a"].iloc[0]), str(top["b"].iloc[0]),
                   int(top["cnt"].iloc[0]))
        merges.append((a, b, c))
        ab = a + b

        def apply_merge(df: pd.DataFrame, a=a, b=b, ab=ab
                        ) -> pd.DataFrame:
            out = []
            for syms in df["syms"]:
                syms = list(syms)
                i, res = 0, []
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == a
                            and syms[i + 1] == b):
                        res.append(ab)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            df = df.copy(deep=False)
            df["syms"] = out
            return df

        table = table.map_batches(apply_merge,
                                  batch_format="pandas").materialize()
    return merges


def bm25_scores(ds: ray.data.Dataset, query, *, col: str = "text",
                key: str = "doc_id", k1: float = 1.2, b: float = 0.75,
                ) -> ray.data.Dataset:
    """BM25 retrieval scores for a fixed query-term set (Robertson;
    Lucene idf variant ``ln(1 + (N - df + ½)/(df + ½))``).

    100 TB shape: pass 1 is ONE native aggregate whose accumulator is
    (total_tokens, df-vector aligned to the sorted query terms) —
    KB-scale, no shuffle; pass 2 is a stateless vectorized map over
    the corpus emitting (key, score) for docs containing ≥1 query
    term. The raw text never shuffles, and nothing O(corpus) lands on
    the driver. Per-(doc, term) scores are rounded to integer 1e-6
    units before the per-doc sum, so the sum is order-independent and
    the DuckDB twin (which sums in an arbitrary order) is bit-exact —
    the tfidf_rows round6 convention taken one step further.

    Returns (key, score) rows, score = BM25 sum in 1e-6 units / 1e6.
    """
    from ray.data.aggregate import AggregateFn
    from graphscope_ray.data.curate import VOCAB_TOKEN_PATTERN

    terms = sorted(set(query))
    index = pd.Index(terms)
    pat = re.compile(VOCAB_TOKEN_PATTERN)
    n_docs = ds.count()

    def _toks(block) -> pd.Series:
        s = (block[col].to_pandas() if isinstance(block, pa.Table)
             else block[col])
        return (s.reset_index(drop=True).fillna("")
                .str.lower().str.findall(pat))

    # accumulator = one int64 vector [total_tokens, df(term_0), ...]
    # (a single ndarray serializes as Arrow; a tuple falls back to
    # pickled-object blocks with a per-task warning)
    def accumulate_block(acc: np.ndarray, block) -> np.ndarray:
        toks = _toks(block)
        out = acc.copy()
        ex = toks.explode().dropna()
        out[0] += int(ex.size)
        hit = ex[ex.isin(index)]
        if len(hit):
            # distinct (doc, term) → df increments
            pres = hit.groupby([hit.index, hit.to_numpy()]).size()
            pos = index.get_indexer(pres.index.get_level_values(1))
            np.add.at(out, pos + 1, 1)
        return out

    agg = AggregateFn(
        init=lambda k: np.zeros(len(index) + 1, dtype=np.int64),
        merge=lambda a, b2: a + b2,
        accumulate_block=accumulate_block,
        name="bm25_stats",
    )
    stats = np.asarray(ds.aggregate(agg)["bm25_stats"], dtype=np.int64)
    total_tokens, dfv = int(stats[0]), stats[1:]
    avgdl = float(total_tokens) / float(n_docs) if n_docs else 1.0
    idf = np.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
    idf_ref = ray.put(idf)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        toks = _toks(df)
        keys = df[key].reset_index(drop=True)
        dl = toks.str.len().to_numpy(np.float64)
        ex = toks.explode().dropna()
        hit = ex[ex.isin(index)]
        if not len(hit):
            return pd.DataFrame({key: keys.iloc[:0],
                                 "score": pd.Series([], dtype=np.float64)})
        tf = hit.groupby([hit.index, hit.to_numpy()]).size()
        rows = tf.index.get_level_values(0).to_numpy()
        pos = index.get_indexer(tf.index.get_level_values(1))
        tfv = tf.to_numpy(np.float64)
        iv = ray.get(idf_ref)
        term = (iv[pos] * tfv * (k1 + 1.0)
                / (tfv + k1 * (1.0 - b + b * dl[rows] / avgdl)))
        e6 = round_half_away(term * 1e6, 0).astype(np.int64)
        sums = np.zeros(len(keys), dtype=np.int64)
        np.add.at(sums, rows, e6)
        sel = np.unique(rows)
        return pd.DataFrame({key: keys.iloc[sel].to_numpy(),
                             "score": sums[sel] / 1e6})

    return ds.map_batches(score, batch_format="pandas")


class BPEEncoder:
    """Actor-pool stage: apply a trained merge list to the text column
    — the tokenizer-APPLY half of the BPE story (:func:`bpe_train`
    learns the merges; this encodes the corpus with them, the stage a
    training-data pipeline runs over all 100 TB).

    Stateful setup once per actor (the brief's actor-pool rule): the
    merge-rank table and compiled word pattern are built in
    ``__init__``; a per-WORD-TYPE memo makes the per-batch cost
    proportional to distinct words, not tokens. Greedy lowest-rank
    merging is the standard equivalent of replaying the merges in
    training order (tests prove it against a sequential oracle)."""

    def __init__(self, merges, col: str = "text", key: str = "doc_id"):
        from graphscope_ray.data.curate import VOCAB_TOKEN_PATTERN
        self.ranks = {(a, b): i for i, (a, b, *_) in enumerate(merges)}
        self.pat = re.compile(VOCAB_TOKEN_PATTERN)
        self.col, self.key = col, key
        self._memo: dict = {}

    def _encode_word(self, w: str) -> list:
        got = self._memo.get(w)
        if got is not None:
            return got
        syms = list(w) + ["</w>"]
        while len(syms) > 1:
            best_rank, best = None, None
            for p in zip(syms, syms[1:]):
                r = self.ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best = r, p
            if best is None:
                break
            a, b = best
            i, res = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        self._memo[w] = syms
        return syms

    def __call__(self, t: pa.Table) -> pa.Table:
        keys, toks, counts = [], [], []
        for k, text in zip(t[self.key].to_pylist(),
                           t[self.col].to_pylist()):
            words = self.pat.findall((text or "").lower())
            enc = [s for w in words for s in self._encode_word(w)]
            keys.append(k)
            toks.append(enc)
            counts.append(len(enc))
        return pa.table({
            self.key: pa.array(keys, t[self.key].type),
            "bpe_tokens": pa.array(toks, pa.list_(pa.string())),
            "n_tokens": pa.array(counts, pa.int64()),
        })


def bpe_encode(ds: ray.data.Dataset, merges, *, col: str = "text",
               key: str = "doc_id", batch_size: int = 256,
               concurrency=(1, 4)) -> ray.data.Dataset:
    """→ (key, bpe_tokens list<string>, n_tokens) per document, using
    the merges from :func:`bpe_train`. The merge table is tiny and
    ships once per actor via the constructor (not per batch)."""
    return ds.map_batches(
        BPEEncoder, fn_constructor_kwargs={"merges": list(merges),
                                           "col": col, "key": key},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
