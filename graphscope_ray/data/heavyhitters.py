"""Two-pass exact heavy hitters — the no-shuffle scale path for
global top-k over a key space too large to exchange.

``vocab_topk`` (data/curate.py) is exact but its bucketed merge still
shuffles O(distinct-keys-per-batch) partial counts; at 10^10 distinct
tokens that exchange is the bottleneck. This module answers the same
query with O(capacity) traffic total:

1. **Misra-Gries prefilter** (Misra & Gries 1982; merge rule of
   Agarwal et al. 2013 "Mergeable Summaries"): every block folds its
   token counts into a ≤ ``capacity``-entry summary; summaries
   tree-merge through ONE native ``Dataset.aggregate`` (add counts,
   then subtract the (capacity+1)-th largest and drop ≤ 0). The
   accumulated decrement ``D`` bounds the error: for every key,
   ``mg_count ≤ true_count ≤ mg_count + D``, and any key absent from
   the summary has ``true_count ≤ D``.
2. **Exact verification pass**: the ≤ capacity candidate tokens are
   broadcast and a second fold counts ONLY those tokens exactly
   (an int64 vector accumulator, again no shuffle).

If the exact count of the k-th candidate exceeds ``D``, no excluded
key can reach the top-k, so the result is provably THE exact top-k —
bit-equal to the brute-force SQL — while nothing larger than a
``capacity``-row table ever crossed the wire. The ``guaranteed`` flag
reports exactly that check; callers must treat an unguaranteed result
as approximate (raise, or re-run with a larger capacity).

Reference scope: GraphScope's Communicator covers exact global
sums/min/max (grape/communication); this extends the same mergeable
shape to frequent items for the LLM-data pipeline (top-k vocabulary
over web-scale corpora), like sketch.py does for distinct counts.

Tokens are the shared ``VOCAB_TOKEN_PATTERN`` ([a-z0-9]+ runs of
lower(text)) so the DuckDB twin is oracle_sql.vocab_topk_sql.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import AggregateFn

from graphscope_ray.data.curate import VOCAB_TOKEN_PATTERN

# accumulator = (tokens: object ndarray, counts: int64 ndarray, dec: int)
_EMPTY = (np.zeros(0, dtype=object), np.zeros(0, dtype=np.int64), 0)


def _block_tokens(block, col: str) -> pd.Series:
    if isinstance(block, pa.Table):
        texts = block[col].to_pandas()
    else:
        texts = block[col]
    pat = re.compile(VOCAB_TOKEN_PATTERN)
    return (texts.fillna("").str.lower()
            .str.findall(pat).explode().dropna())


def mg_compress(tokens: np.ndarray, counts: np.ndarray, capacity: int,
                ) -> tuple[np.ndarray, np.ndarray, int]:
    """Trim a (token, count) summary to ≤ capacity entries; returns
    (tokens, counts, decrement). Decrement = the (capacity+1)-th
    largest count, subtracted from every entry (Misra-Gries step:
    everything ≤ it drops out, everything else keeps count - dec)."""
    if len(tokens) <= capacity:
        return tokens, counts, 0
    # (capacity+1)-th largest via partition — O(n), not a full sort
    kth = np.partition(counts, len(counts) - capacity - 1)[
        len(counts) - capacity - 1]
    keep = counts > kth
    return tokens[keep], counts[keep] - kth, int(kth)


def _mg_merge(a, b, capacity: int):
    ta, ca, da = a
    tb, cb, db = b
    if not len(ta):
        merged_t, merged_c = tb, cb
    elif not len(tb):
        merged_t, merged_c = ta, ca
    else:
        s = (pd.Series(ca, index=ta)
             .add(pd.Series(cb, index=tb), fill_value=0))
        merged_t = s.index.to_numpy(dtype=object)
        merged_c = s.to_numpy(dtype=np.int64)
    t, c, d = mg_compress(merged_t, merged_c, capacity)
    return (t, c, da + db + d)


def mg_summary(ds: ray.data.Dataset, *, col: str = "text",
               capacity: int = 4096) -> tuple[pd.DataFrame, int]:
    """Distributed Misra-Gries summary: per-block value_counts folded
    and tree-merged through one native aggregate. Returns
    (DataFrame(token, mg_cnt), decrement D) with the invariant
    mg_cnt ≤ true ≤ mg_cnt + D for present keys, true ≤ D for absent."""

    def accumulate_block(acc, block):
        toks = _block_tokens(block, col)
        if not len(toks):
            return acc
        vc = toks.value_counts()
        blk = (vc.index.to_numpy(dtype=object),
               vc.to_numpy(dtype=np.int64), 0)
        return _mg_merge(acc, blk, capacity)

    agg = AggregateFn(
        init=lambda k: _EMPTY,
        merge=lambda a, b: _mg_merge(a, b, capacity),
        accumulate_block=accumulate_block,
        name="mg",
    )
    t, c, d = ds.aggregate(agg)["mg"]
    return pd.DataFrame({"token": t.astype(str), "mg_cnt": c}), int(d)


def exact_counts_of(ds: ray.data.Dataset, candidates: np.ndarray, *,
                    col: str = "text") -> np.ndarray:
    """Exact global counts of the given tokens only — one aggregate
    whose accumulator is an int64 vector aligned to ``candidates``
    (≤ capacity entries broadcast once per task; nothing shuffles)."""
    index = pd.Index(candidates)

    def accumulate_block(acc: np.ndarray, block) -> np.ndarray:
        toks = _block_tokens(block, col)
        if not len(toks):
            return acc
        vc = toks.value_counts()
        pos = index.get_indexer(vc.index)
        hit = pos >= 0
        out = acc.copy()
        np.add.at(out, pos[hit], vc.to_numpy(dtype=np.int64)[hit])
        return out

    agg = AggregateFn(
        init=lambda k: np.zeros(len(index), dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=accumulate_block,
        name="cand_counts",
    )
    return np.asarray(ds.aggregate(agg)["cand_counts"], dtype=np.int64)


def mg_topk(ds: ray.data.Dataset, k: int = 100, *, col: str = "text",
            capacity: int = 4096,
            ) -> tuple[pd.DataFrame, dict]:
    """Exact top-k tokens via MG prefilter + exact candidate counting.

    Returns (DataFrame(token, cnt) — top-k by (cnt desc, token asc) —
    and info = {decrement, n_candidates, guaranteed}). ``guaranteed``
    is True iff the k-th exact count strictly exceeds the MG decrement
    bound, which proves equality with brute-force top-k."""
    summary, dec = mg_summary(ds, col=col, capacity=capacity)
    if not len(summary):
        return (pd.DataFrame({"token": pd.Series([], dtype=str),
                              "cnt": pd.Series([], dtype=np.int64)}),
                {"decrement": dec, "n_candidates": 0, "guaranteed": True})
    cands = summary["token"].to_numpy(dtype=object)
    cnt = exact_counts_of(ds, cands, col=col)
    df = (pd.DataFrame({"token": cands.astype(str), "cnt": cnt})
          .sort_values(["cnt", "token"], ascending=[False, True],
                       kind="mergesort").head(k).reset_index(drop=True))
    kth = int(df["cnt"].iloc[-1]) if len(df) else 0
    # dec == 0 → no compression ever fired, the summary IS the exact
    # count table. Otherwise a full k rows whose k-th count beats the
    # decrement bound excludes every absent key (true ≤ dec < kth).
    # Fewer than k rows with dec > 0 is NOT a guarantee — keys may be
    # missing from the summary entirely.
    info = {"decrement": dec, "n_candidates": len(cands),
            "guaranteed": dec == 0 or (len(df) == k and kth > dec)}
    return df, info
