"""Text analysis operators over a documents table.

All operators are Ray Data batch transforms; regex/lexicon state is
compiled once per actor (callable-class + ``concurrency``), vectorized
via pandas string kernels / numpy inside the batch. Definitions are
chosen to be exactly reproducible in ANSI SQL where the driver's DuckDB
oracle needs to replay them (token_count, quality_score).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_WS = re.compile(r"\s+")
_ALPHA = re.compile(r"[^a-zA-Z]")


def token_count(ds: ray.data.Dataset, col: str = "text",
                key: str = "doc_id") -> ray.data.Dataset:
    """(key, n_tokens): number of non-empty whitespace-separated pieces
    — SQL-equivalent: len(list_filter(string_split_regex(text, '\\s+'),
    x -> x <> ''))."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[col].fillna("").map(lambda s: len([t for t in _WS.split(s) if t]))
        return pd.DataFrame({key: df[key], "n_tokens": toks.astype("int64")})

    return ds.map_batches(f, batch_format="pandas")


def text_stats(ds: ray.data.Dataset, col: str = "text",
               key: str = "doc_id") -> ray.data.Dataset:
    """(key, n_chars, n_tokens, alpha_ratio) — building blocks for
    quality filtering; each component SQL-replayable."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col].fillna("")
        n_chars = s.str.len().astype("int64")
        n_tokens = s.map(lambda x: len([t for t in _WS.split(x) if t])).astype("int64")
        n_alpha = s.map(lambda x: len(_ALPHA.sub("", x))).astype("int64")
        alpha_ratio = np.where(n_chars > 0, n_alpha / n_chars.clip(lower=1), 0.0)
        return pd.DataFrame({
            key: df[key],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "alpha_ratio": np.round(alpha_ratio, 6),
        })

    return ds.map_batches(f, batch_format="pandas")


def quality_score(ds: ray.data.Dataset, col: str = "text",
                  key: str = "doc_id") -> ray.data.Dataset:
    """(key, quality): alpha_ratio × min(1, n_tokens/100) — a simple
    deterministic quality proxy (length + letter density), rounded to
    6 dp so the SQL oracle hash-matches."""
    stats = text_stats(ds, col, key)

    def f(t: pa.Table) -> pa.Table:
        nt = t["n_tokens"].to_numpy().astype(np.float64)
        ar = t["alpha_ratio"].to_numpy()
        q = np.round(ar * np.minimum(1.0, nt / 100.0), 6)
        return pa.table({key: t[key], "quality": pa.array(q)})

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
    """Stopword-vote language id — compiled once per actor
    (the stateful-actor-pool pattern; model-free n-gram heuristic)."""

    def __init__(self, col: str, key: str):
        self.col, self.key = col, key
        self.word = re.compile(r"[a-zA-ZäöüéèêàçñÄÖÜ]+")
        self.lex = {k: frozenset(v) for k, v in _LEXICONS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        langs = []
        for s in df[self.col].fillna(""):
            toks = [t.lower() for t in self.word.findall(s)]
            best, best_n = "unknown", 0
            for lang in sorted(self.lex):
                n = sum(t in self.lex[lang] for t in toks)
                if n > best_n:
                    best, best_n = lang, n
            langs.append(best)
        return pd.DataFrame({self.key: df[self.key], "lang_pred": langs})


def lang_id(ds: ray.data.Dataset, col: str = "text",
            key: str = "doc_id", concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(
        _LangId, fn_constructor_args=(col, key),
        batch_format="pandas", concurrency=concurrency,
    )


_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def _token_hashes(tokens) -> np.ndarray:
    """FNV-1a per token, vectorized-ish (tokens are short)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = _FP_OFFSET
        for b in t.encode("utf-8"):
            h = (h ^ np.uint64(b)) * _FP_BASE
        out[i] = h
    return out


class _Fingerprint:
    """Winnowing-style document fingerprint: rolling hash over token
    k-grams, keep the minimum window hash — deterministic int64 per
    doc (useful as a cheap near-dup prefilter)."""

    def __init__(self, col: str, key: str, k: int):
        self.col, self.key, self.k = col, key, k
        self.ws = re.compile(r"\s+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        fps = np.empty(len(df), dtype=np.uint64)
        for i, s in enumerate(df[self.col].fillna("")):
            toks = [t for t in self.ws.split(s) if t]
            if not toks:
                fps[i] = 0
                continue
            h = _token_hashes(toks)
            k = min(self.k, len(h))
            # rolling k-gram hash = combined window of token hashes
            win = h[: len(h) - k + 1].copy()
            for j in range(1, k):
                win = win * _FP_BASE + h[j: len(h) - k + 1 + j]
            fps[i] = win.min()
        return pd.DataFrame({
            self.key: df[self.key],
            "fingerprint": fps.astype(np.int64),
        })


def fingerprint(ds: ray.data.Dataset, col: str = "text", key: str = "doc_id",
                k: int = 5, concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(
        _Fingerprint, fn_constructor_args=(col, key, k),
        batch_format="pandas", concurrency=concurrency,
    )
