"""Composed training-data curation pipeline: language gate + quality
gate + exact dedup + token count in ONE streaming pass over the
documents table.

This is the composition a 100 TB curation run needs: the per-document
kernels (stopword-vote langid, quality proxy, token count, content
digest) are FUSED into one actor-pool ``map_batches`` stage so the
corpus is read once, rows failing the lang/quality gate are dropped
inside the batch (before anything shuffles), and the only exchange is
the digest groupby of the survivors — raw text never moves except
into its dedup bucket. Each component op keeps its standalone twin
(`data/text.py`, `data/dedup.py`); the composition is SQL-replayed by
``oracle_sql.curation_sql`` (driver row ``doc_curation``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from graphscope_ray.data.text import _LangId
from graphscope_ray.util import round_half_away


class _Curator:
    """Fused per-batch curation kernel (the langid vote table builds
    once per pickled instance — shipped as a task-pool callable, see
    dedup.minhash_signatures for the actor-vs-task A/B)."""

    def __init__(self, col: str, key: str, lang: str, min_quality: float):
        self.col, self.key = col, key
        self.lang, self.min_quality = lang, min_quality
        self.langid = _LangId(col, key)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc
        lang_pred = self.langid(df)["lang_pred"].to_numpy()
        s = pc.fill_null(pa.array(df[self.col], pa.string()), "")
        n_chars = pc.cast(pc.utf8_length(s), pa.int64()).to_numpy()
        n_tokens = pc.cast(
            pc.count_substring_regex(s, r"\S+"), pa.int64()).to_numpy()
        n_alpha = pc.cast(
            pc.count_substring_regex(s, r"[a-zA-Z]"), pa.int64()).to_numpy()
        ar = round_half_away(np.where(
            n_chars > 0, n_alpha / np.maximum(n_chars, 1), 0.0), 6)
        quality = round_half_away(
            ar * np.minimum(1.0, n_tokens / 100.0), 6)
        keep = (lang_pred == self.lang) & (quality >= self.min_quality)
        raw = [hashlib.md5(t.encode("utf-8", "surrogatepass")).digest()
               for t in df.loc[keep, self.col].fillna("")]
        h = (np.frombuffer(b"".join(raw), dtype=np.int64).reshape(-1, 2)
             if raw else np.empty((0, 2), dtype=np.int64))
        # dtypes pinned explicitly: an all-rejected batch would
        # otherwise emit float64 empties that break the digest sort
        return pd.DataFrame({
            self.key: df.loc[keep, self.key].to_numpy(),
            "lang_pred": pd.Series(lang_pred[keep], dtype="object"),
            "quality": quality[keep].astype(np.float64),
            "n_tokens": n_tokens[keep].astype(np.int64),
            "_h1": h[:, 0], "_h2": h[:, 1],
            "_cb": np.mod(h[:, 0], 32),
        })


def curate(ds: ray.data.Dataset, *, col: str = "text",
           key: str = "doc_id", lang: str = "en",
           min_quality: float = 0.1) -> ray.data.Dataset:
    """documents → (key, lang_pred, quality, n_tokens) of the curated
    set: ``lang``-language docs with quality ≥ ``min_quality``, exact
    duplicates collapsed to the minimum ``key`` per content digest."""
    scored = ds.map_batches(_Curator(col, key, lang, min_quality),
                            batch_format="pandas")

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized kernel per coarse digest bucket: sort by
        # (digest, key), keep each digest group's first (= min-key) row
        # — grouping stays on the full 128-bit digest, the 32-way _cb
        # bucket only routes (per-distinct-digest map_groups dispatch
        # costs ~100 µs/group; see pipelines/partgraph.py)
        g = g.drop(columns=["_cb"])
        if not len(g):
            return g.drop(columns=["_h1", "_h2"])
        h1, h2 = g["_h1"].to_numpy(), g["_h2"].to_numpy()
        order = np.lexsort((g[key].to_numpy(), h2, h1))
        h1, h2 = h1[order], h2[order]
        starts = order[np.flatnonzero(
            np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])])]
        return (g.iloc[starts].drop(columns=["_h1", "_h2"])
                .reset_index(drop=True))

    return scored.groupby("_cb").map_groups(keep_min, batch_format="pandas")
