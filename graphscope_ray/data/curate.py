"""Corpus-curation operators for a training-data pipeline.

The ops a 100 TB LLM-data run needs between raw ingest and tokenizer:
deterministic sampling + train/val/test splits, text normalization,
PII scrubbing, repetition-based quality stats (Gopher-style), global
vocabulary building, fixed-token-budget sequence packing, and
benchmark decontamination. Every op is a streaming Ray Data transform
(map_batches over Arrow / pandas kernels — no per-row Python in hot
paths, no driver materialization of row data), and every definition is
chosen so a DuckDB SQL twin replays it bit-for-bit (the driver's
correctness gate): hash decisions reuse the fmix64/poly family from
``data/hashing`` whose SQL twins live in ``oracle_sql``.

Scale notes (100 TB shapes):
- ``hash_sample`` / ``split_assign`` / ``normalize_text`` /
  ``pii_scrub`` / ``repetition_stats`` are embarrassingly parallel —
  no shuffle at all.
- ``vocab_topk`` pre-aggregates token counts inside each batch (the
  combiner), so the global groupby shuffles only O(distinct tokens per
  batch) rows, never O(total tokens).
- ``pack_sequences`` is sort + distributed prefix sum: only
  O(#blocks) scalar sums touch the driver (same stamping pattern as
  ``graph/ids.assign_dense_ids``).
- ``decontaminate`` broadcasts the (small) benchmark n-gram hash set
  once with ``ray.put`` and probes it per batch — no join shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from graphscope_ray.data.hashing import (B, U64, batch_token_hashes,
                                         fmix64, windowed_hashes)
from graphscope_ray.util import round_half_away

# Shared regex constants — Arrow's compute kernels and DuckDB's
# regexp_* functions are both RE2, so using the *same pattern string*
# on both sides makes the SQL twins exact.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
LONGNUM_PATTERN = r"[0-9]{7,}"
VOCAB_TOKEN_PATTERN = r"[a-z0-9]+"


def _row_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    """fmix64(id·B + seed) — the deterministic per-row coin shared by
    hash_sample / split_assign (SQL twin: oracle twin in
    __ray_entry__ via oracle_sql.fmix_u64_sql)."""
    x = ids.astype(np.uint64) * B + U64(seed)
    return fmix64(x)


def hash_sample(ds: ray.data.Dataset, rate: float, *, seed: int = 1,
                key: str = "doc_id") -> ray.data.Dataset:
    """Keep each row iff fmix64(key·B + seed) % 1e6 < rate·1e6 — a
    deterministic, reproducible Bernoulli(rate) sample that needs no
    global state, no shuffle, and gives the same answer at any
    parallelism (the property a resumable 100 TB run needs)."""
    thresh = int(round(rate * 1_000_000))

    def f(t: pa.Table) -> pa.Table:
        ids = t[key].to_numpy(zero_copy_only=False)
        h = _row_hash(ids, seed) % U64(1_000_000)
        return t.filter(pa.array(h < U64(thresh)))

    return ds.map_batches(f, batch_format="pyarrow")


def split_assign(ds: ray.data.Dataset,
                 splits: list[tuple[str, float]] | None = None, *,
                 seed: int = 7, key: str = "doc_id") -> ray.data.Dataset:
    """Add a ``split`` column assigning each row to one of the named
    fractions (order matters: buckets are carved left-to-right from
    fmix64(key·B+seed) % 10000). Deterministic per key — a doc never
    migrates between train and test across runs or cluster sizes."""
    if splits is None:
        splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    names = [n for n, _ in splits]
    bounds = np.cumsum([int(round(w * 10_000)) for _, w in splits])
    bounds[-1] = 10_000  # rounding guard: last split absorbs the slack

    def f(t: pa.Table) -> pa.Table:
        ids = t[key].to_numpy(zero_copy_only=False)
        b = (_row_hash(ids, seed) % U64(10_000)).astype(np.int64)
        idx = np.searchsorted(bounds, b, side="right")
        lab = np.array(names, dtype=object)[idx]
        return t.append_column("split", pa.array(lab, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def normalize_text(ds: ray.data.Dataset, col: str = "text",
                   key: str = "doc_id") -> ray.data.Dataset:
    """(key, norm_text): lowercase, collapse whitespace runs to one
    space, trim — the canonical form most dedup/quality stages want.
    Three Arrow kernels per batch, zero-copy in/out; SQL twin:
    trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))."""

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = pc.fill_null(t[col], "")
        s = pc.utf8_lower(s)
        s = pc.replace_substring_regex(s, r"\s+", " ")
        s = pc.utf8_trim(s, " ")
        return pa.table({key: t[key], "norm_text": s})

    return ds.map_batches(f, batch_format="pyarrow")


def pii_scrub(ds: ray.data.Dataset, col: str = "text",
              key: str = "doc_id") -> ray.data.Dataset:
    """(key, scrubbed, n_emails, n_longnums): mask emails with
    ``<EMAIL>`` and 7+-digit runs with ``<NUM>`` and count what was
    masked. Both sides run the identical RE2 patterns (EMAIL_PATTERN /
    LONGNUM_PATTERN), so leftmost-non-overlapping semantics agree with
    DuckDB's regexp_replace(..., 'g') exactly."""

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = pc.fill_null(t[col], "")
        n_em = pc.cast(pc.count_substring_regex(s, EMAIL_PATTERN),
                       pa.int64())
        s = pc.replace_substring_regex(s, EMAIL_PATTERN, "<EMAIL>")
        n_num = pc.cast(pc.count_substring_regex(s, LONGNUM_PATTERN),
                        pa.int64())
        s = pc.replace_substring_regex(s, LONGNUM_PATTERN, "<NUM>")
        return pa.table({key: t[key], "scrubbed": s,
                         "n_emails": n_em, "n_longnums": n_num})

    return ds.map_batches(f, batch_format="pyarrow")


class _RepetitionStats:
    """(key, n_lines, dup_line_frac, top_token_frac) — the two
    Gopher-style repetition signals: fraction of non-distinct non-empty
    lines, and the share of the modal whitespace token. Vectorized via
    pandas explode + C-level groupby (no per-row Python); rounded to
    6 dp so the SQL twin hash-matches."""

    def __init__(self, col: str, key: str):
        import re
        self.col, self.key = col, key
        # RE2 \s exactly ([\t\n\f\r ]) — Python re's \s also matches \v
        # and unicode spaces, which would diverge from the DuckDB twin
        self.ws = re.compile(r"[\t\n\f\r ]+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        texts = df[self.col].fillna("").reset_index(drop=True)

        lines = texts.str.split("\n").explode()
        lines = lines[lines != ""]
        li = lines.index.to_numpy()
        n_lines = np.bincount(li, minlength=n) if len(li) else np.zeros(
            n, dtype=np.int64)
        uniq = lines.reset_index().drop_duplicates()
        n_uniq = np.bincount(uniq["index"].to_numpy(), minlength=n) \
            if len(uniq) else np.zeros(n, dtype=np.int64)
        dup_frac = np.where(n_lines > 0,
                            1.0 - n_uniq / np.maximum(n_lines, 1), 0.0)

        toks = texts.str.split(self.ws).explode()
        toks = toks[toks != ""]
        ti = toks.index.to_numpy()
        n_toks = np.bincount(ti, minlength=n) if len(ti) else np.zeros(
            n, dtype=np.int64)
        if len(ti):
            cnt = (toks.reset_index(name="tok")
                   .groupby(["index", "tok"], sort=False)
                   .size().reset_index(name="c"))
            top = cnt.groupby("index", sort=False)["c"].max()
            top_cnt = np.zeros(n, dtype=np.int64)
            top_cnt[top.index.to_numpy()] = top.to_numpy()
        else:
            top_cnt = np.zeros(n, dtype=np.int64)
        top_frac = np.where(n_toks > 0, top_cnt / np.maximum(n_toks, 1), 0.0)

        return pd.DataFrame({
            self.key: df[self.key].to_numpy(),
            "n_lines": n_lines.astype(np.int64),
            "dup_line_frac": round_half_away(dup_frac, 6),
            "top_token_frac": round_half_away(top_frac, 6),
        })


def repetition_stats(ds: ray.data.Dataset, col: str = "text",
                     key: str = "doc_id") -> ray.data.Dataset:
    # one compiled regex per worker → task pool (see
    # dedup.minhash_signatures for the actor-vs-task A/B)
    return ds.map_batches(_RepetitionStats(col, key),
                          batch_format="pandas")


def _counts_topk(parts: ray.data.Dataset, key_col: str, k: int,
                 num_buckets: int = 32) -> ray.data.Dataset:
    """Global top-k over per-batch partial ``(key_col, cnt)`` counts.

    Ray's ``groupby(key).aggregate`` pays ~ms of Python dispatch per
    DISTINCT key, so a 10^4-group count melts. Shape here: one
    bucket-by-key-hash shuffle (a bucket owns every partial of its
    keys, so its local sum IS the global sum), ONE vectorized pandas
    kernel per bucket that sums and trims to its local top-k (the
    global top-k is a subset of the per-bucket union), then a ≤
    num_buckets·k-row final sort. Bucket hash is pd.util.hash_array
    (fixed-key siphash — stable across worker processes, unlike
    builtin hash)."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        h = pd.util.hash_array(df[key_col].to_numpy(dtype=object))
        df["_b"] = (h % num_buckets).astype(np.int64)
        return df

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        t = (g.groupby(key_col, sort=False)["cnt"].sum()
             .reset_index())
        t = t.sort_values(["cnt", key_col], ascending=[False, True],
                          kind="mergesort").head(k)
        t["cnt"] = t["cnt"].astype(np.int64)
        return t[[key_col, "cnt"]]

    trimmed = (parts.map_batches(bucket, batch_format="pandas")
               .groupby("_b").map_groups(kernel, batch_format="pandas"))
    return trimmed.sort(["cnt", key_col],
                        descending=[True, False]).limit(k)


def vocab_topk(ds: ray.data.Dataset, k: int = 100, col: str = "text",
               ) -> ray.data.Dataset:
    """Global top-k vocabulary (token, cnt): tokens are maximal
    ``[a-z0-9]+`` runs of lower(text). Per-batch value_counts is the
    combiner — the shuffle moves O(distinct-per-batch) rows, not
    O(total tokens) — then the bucketed top-k merge (_counts_topk).
    Deterministic tie-break: cnt desc, token asc."""
    import re
    pat = re.compile(VOCAB_TOKEN_PATTERN)

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        toks = (df[col].fillna("").str.lower()
                .str.findall(pat).explode().dropna())
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "cnt": vc.to_numpy().astype(np.int64)})

    parts = ds.map_batches(combiner, batch_format="pandas")
    return _counts_topk(parts, "token", k)


def chunk_text(ds: ray.data.Dataset, *, size: int = 512,
               overlap: int = 64, col: str = "text",
               key: str = "doc_id") -> ray.data.Dataset:
    """Overlapping fixed-size chunking (RAG / pretraining context
    prep): chunk ``i`` of a doc covers codepoints
    ``[i·step, i·step+size)`` with ``step = size − overlap``; empty
    docs yield no chunks. Emits ``(key, chunk_id, pos, chunk)`` with
    1-based ``pos`` so the DuckDB ``substr`` twin is literal.

    Shape: embarrassingly parallel flat expansion — no shuffle, no
    per-row Python. Each batch loops over chunk *indices* (≤
    ceil(max_len/step) iterations), slicing the whole column per index
    with Arrow's codepoint-exact ``utf8_slice_codeunits`` kernel."""
    if overlap >= size:
        raise ValueError("overlap must be smaller than size")
    step = size - overlap
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[col], "")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        ids = t[key].to_numpy(zero_copy_only=False)
        keys, cids, poss, chunks = [], [], [], []
        i = 0
        while True:
            start = i * step
            alive = n > start
            if not alive.any():
                break
            sl = pc.utf8_slice_codeunits(txt, start, start + size)
            keys.append(ids[alive])
            cids.append(np.full(int(alive.sum()), i, dtype=np.int64))
            poss.append(np.full(int(alive.sum()), start + 1,
                                dtype=np.int64))
            chunks.append(sl.filter(pa.array(alive)))
            i += 1
        if not keys:
            return pa.table({key: pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "chunk": pa.array([], pa.string())})
        return pa.table({key: np.concatenate(keys),
                         "chunk_id": np.concatenate(cids),
                         "pos": np.concatenate(poss),
                         "chunk": pa.concat_arrays(
                             [c.combine_chunks() if isinstance(
                                 c, pa.ChunkedArray) else c
                              for c in chunks])})

    return ds.map_batches(f, batch_format="pyarrow")


def bigram_topk(ds: ray.data.Dataset, k: int = 100, col: str = "text",
                ) -> ray.data.Dataset:
    """Global top-k word bigrams (corpus n-gram statistics): tokens
    are ``[a-z0-9]+`` runs of lower(text) (the vocab_topk tokenizer);
    a bigram is two consecutive tokens of one doc joined by a space.
    Per-batch value_counts is the combiner — the groupby shuffle moves
    O(distinct bigrams per batch), never O(total tokens). Tie-break:
    cnt desc, bigram asc."""
    import re
    pat = re.compile(VOCAB_TOKEN_PATTERN)

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[col].fillna("").str.lower().str.findall(pat)
        ex = toks.explode().dropna()
        if not len(ex):
            return pd.DataFrame({"bigram": pd.Series([], dtype=str),
                                 "cnt": pd.Series([], dtype=np.int64)})
        idx = ex.index.to_numpy()
        vals = ex.to_numpy(dtype=object)
        same = idx[1:] == idx[:-1]
        lhs = vals[:-1][same].astype(str)
        rhs = vals[1:][same].astype(str)
        big = np.char.add(np.char.add(lhs, " "), rhs)
        vc = pd.Series(big).value_counts()
        return pd.DataFrame({"bigram": vc.index.astype(str),
                             "cnt": vc.to_numpy().astype(np.int64)})

    parts = ds.map_batches(combiner, batch_format="pandas")
    return _counts_topk(parts, "bigram", k)


@ray.remote
def _seq_stamp(tbl: pa.Table, start_tokens: int, budget: int) -> pa.Table:
    n = tbl["n_tokens"].to_numpy()
    cum_prev = start_tokens + np.cumsum(n) - n  # exclusive prefix sum
    seq = (cum_prev // budget).astype(np.int64)
    return tbl.append_column("seq_id", pa.array(seq))


@ray.remote
def _block_token_sum(tbl: pa.Table) -> int:
    return int(tbl["n_tokens"].to_numpy().sum())


def pack_sequences(ds: ray.data.Dataset, budget: int, *,
                   key: str = "doc_id", col: str = "text",
                   ) -> ray.data.Dataset:
    """(key, n_tokens, seq_id): contiguous-chunk sequence packing —
    docs in key order are packed greedily into sequences, a new
    sequence starting whenever the running token total crosses a
    ``budget`` boundary (seq_id = floor(exclusive-prefix-sum / budget);
    SQL twin: a window running sum). Distributed as global sort +
    per-block prefix sums: only one int per block reaches the driver,
    and each block is stamped independently — the pattern that scales
    to 10^12 rows (mirrors graph/ids.assign_dense_ids)."""
    from graphscope_ray.data.text import token_count

    toks = token_count(ds, col=col, key=key)
    mat = toks.sort(key).materialize()

    blocks = []  # block refs in global sorted order
    for bundle in mat.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows:
                blocks.append(block_ref)
    if not blocks:
        return ray.data.from_arrow(pa.table({
            key: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "seq_id": pa.array([], pa.int64())}))
    sums = ray.get([_block_token_sum.remote(b) for b in blocks])
    out_refs, offset = [], 0
    for block_ref, s in zip(blocks, sums):
        out_refs.append(_seq_stamp.remote(block_ref, offset, budget))
        offset += s
    return ray.data.from_arrow_refs(out_refs)


class _Decontaminate:
    """Flag documents sharing any ``n``-token window hash with a
    benchmark set (the standard eval-decontamination pass). The
    benchmark window-hash set is built once and broadcast by object
    ref; each batch probes it with one vectorized np.isin — no join
    shuffle, no driver text. Window hashes come from the shared
    SQL-replayable family (data/hashing), so the DuckDB twin reuses
    oracle_sql's windows CTE."""

    def __init__(self, bench_ref, n: int, col: str, key: str):
        self.bench = np.sort(ray.get(bench_ref))
        self.n, self.col, self.key = n, col, key

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df[self.col].fillna("").tolist()
        tok_doc, tok_hash = batch_token_hashes(texts)
        win_doc, win_hash = windowed_hashes(tok_doc, tok_hash, self.n,
                                            len(texts))
        # exclude the empty-doc sentinel window (hash 0 for 0 tokens)
        nz = win_hash != U64(0)
        hits = np.zeros(len(texts), dtype=np.int64)
        if nz.any() and len(self.bench):
            m = np.clip(np.searchsorted(self.bench, win_hash[nz]),
                        0, len(self.bench) - 1)
            ok = self.bench[m] == win_hash[nz]
            np.add.at(hits, win_doc[nz][ok], 1)
        return pd.DataFrame({
            self.key: df[self.key].to_numpy(),
            "n_hits": hits,
            "contaminated": (hits > 0).astype(np.int64),
        })


def benchmark_window_hashes(bench_ds: ray.data.Dataset, n: int,
                            col: str = "text") -> np.ndarray:
    """Distinct n-token window hashes of the benchmark corpus (small
    side — this is what gets broadcast). Computed distributed, only
    the distinct uint64 hashes reach the driver."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[col].fillna("").tolist()
        tok_doc, tok_hash = batch_token_hashes(texts)
        _, wh = windowed_hashes(tok_doc, tok_hash, n, len(texts))
        wh = np.unique(wh[wh != U64(0)])
        return pd.DataFrame({"h": wh.astype(np.int64)})

    parts = bench_ds.map_batches(f, batch_format="pandas").to_pandas()
    if parts.empty:  # empty-stream to_pandas drops columns entirely
        return np.array([], dtype=np.uint64)
    return np.unique(parts["h"].to_numpy().astype(np.uint64))


def decontaminate(ds: ray.data.Dataset, bench_ds: ray.data.Dataset, *,
                  n: int = 8, col: str = "text", key: str = "doc_id",
                  concurrency=(1, 4)) -> ray.data.Dataset:
    """(key, n_hits, contaminated): per-document count of n-token
    windows that appear in the benchmark corpus. Docs shorter than
    ``n`` tokens use their full-length window (min(k, len) semantics,
    matching oracle_sql._windows_cte); empty docs are never flagged."""
    bench = benchmark_window_hashes(bench_ds, n, col)
    bench_ref = ray.put(bench)
    return ds.map_batches(
        _Decontaminate, fn_constructor_args=(bench_ref, n, col, key),
        batch_format="pandas", concurrency=concurrency,
    )


def domain_mixture(ds: ray.data.Dataset, rates: dict[str, float], *,
                   default_rate: float = 1.0, seed: int = 5,
                   col: str = "source",
                   key: str = "doc_id") -> ray.data.Dataset:
    """Deterministic per-domain downsampling to a target mixture: a
    row of domain ``d`` is kept iff ``fmix64(key·B+seed) % 1e6 <
    rate_d·1e6`` with ``rate_d = rates.get(d, default_rate)``. The
    100 TB shape of "rebalance the source mixture before training":
    no shuffle, no global state, and the kept set is identical at any
    parallelism and across resumed runs — the properties a multi-epoch
    data recipe needs (SQL twin: oracle_sql.domain_mixture_sql).

    Rates > 1 are clamped to 1 (this op never upsamples; repeat-epoch
    upsampling is a reader-side concern, not a filter)."""
    thresh = {d: min(int(round(r * 1_000_000)), 1_000_000)
              for d, r in rates.items()}
    dflt = min(int(round(default_rate * 1_000_000)), 1_000_000)

    def f(t: pa.Table) -> pa.Table:
        ids = t[key].to_numpy(zero_copy_only=False)
        dom = pd.Series(t[col].to_numpy(zero_copy_only=False))
        th = dom.map(thresh).fillna(dflt).to_numpy(dtype=np.int64)
        h = (fmix64(ids.astype(np.uint64) * B + U64(seed))
             % U64(1_000_000)).astype(np.int64)
        return t.filter(pa.array(h < th))

    return ds.map_batches(f, batch_format="pyarrow")


def training_order(ds: ray.data.Dataset, *, seed: int = 11,
                   key: str = "doc_id") -> ray.data.Dataset:
    """Deterministic global shuffle for training order: stamp ``ord =
    fmix64(key·B+seed)`` (two's-complement int64) and range-sort on
    it. Unlike ``random_shuffle`` the order is a pure function of the
    keys — reproducible across runs, cluster sizes and resumes, and
    the sort is Ray Data's distributed range-partition exchange (no
    driver materialization). SQL twin: oracle_sql.training_order_sql."""

    def stamp(t: pa.Table) -> pa.Table:
        ids = t[key].to_numpy(zero_copy_only=False)
        h = fmix64(ids.astype(np.uint64) * B + U64(seed))
        return t.append_column("ord", pa.array(h.astype(np.int64)))

    return ds.map_batches(stamp, batch_format="pyarrow").sort("ord")


def topk_per_group(ds: ray.data.Dataset, *, group: str, score: str,
                   key: str, k: int, descending: bool = True,
                   num_buckets: int = 32) -> ray.data.Dataset:
    """Per-group top-k selection (stratified curation: "keep the k
    best documents of every domain"): ranks rows within each ``group``
    by ``score`` (desc by default) with ``key`` asc as the
    deterministic tie-break, and keeps rank ≤ k — exactly
    ``row_number() OVER (PARTITION BY group ORDER BY score DESC, key)
    <= k`` (SQL twin built inline by the driver's doc_topk_source
    oracle).

    100 TB shape: a per-block trim first (each block keeps ≤ k rows
    per group it sees — the combiner, so at most k·G·#blocks rows ever
    shuffle, independent of N), then ONE coarse-bucket exchange
    (hash(group) % num_buckets) co-locates each group and a vectorized
    kernel per bucket assigns final ranks — no per-group Python
    dispatch (the repo-wide coarse-bucket pattern), no global sort, no
    driver materialization."""
    asc = [True, not descending, True]
    by = [group, score, key]

    def local_trim(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(by, ascending=asc, kind="mergesort")
        rn = df.groupby(group, sort=False).cumcount()
        return df[rn.to_numpy() < k]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[group], index=False).to_numpy()
        return df.assign(
            _cb=(h % np.uint64(num_buckets)).astype(np.int64))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(by, ascending=asc, kind="mergesort")
        rn = df.groupby(group, sort=False).cumcount().to_numpy() + 1
        out = df[rn <= k].copy(deep=False)
        out["rn"] = rn[rn <= k]
        return out.drop(columns=["_cb"])

    return (ds.map_batches(local_trim, batch_format="pandas")
              .map_batches(add_bucket, batch_format="pandas")
              .groupby("_cb")
              .map_groups(final, batch_format="pandas"))


def weighted_sample(ds: ray.data.Dataset, k: int, *,
                    weight_col: str, key: str = "doc_id",
                    seed: int = 13) -> ray.data.Dataset:
    """Weighted sampling WITHOUT replacement — the Efraimidis-Spirakis
    exponential-key scheme: row i gets key ln(u_i)/w_i from a
    deterministic hash-uniform u_i = (fmix64(id·B+seed) >> 11)·2⁻⁵³,
    and the k LARGEST keys are exactly a weight-proportional sample
    (the data-mixing primitive: "draw a 10B-token budget proportional
    to per-doc length/quality"). Deterministic per (id, seed) — the
    same rows win at any parallelism, so a resumed 100 TB run draws
    the identical sample.

    Rows with weight ≤ 0 are never sampled. Keys are rounded to 9 dp
    with ``key`` asc as the tie-break so the selection boundary is
    reproducible against the SQL twin (ln ulp differences live ~7
    orders of magnitude below the rounding grid).

    100 TB shape: scoring is embarrassingly parallel; selection is
    :func:`topk_per_group` with a constant group — per-block trim to
    ≤ k first, so at most k·#blocks scored rows ever shuffle.
    → (key, weight_col, es_key, rn) for the k winners.
    """

    def score(t: pa.Table) -> pa.Table:
        ids = t[key].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h = _row_hash(ids, seed)
        u = np.maximum((h >> U64(11)).astype(np.float64) * 2.0 ** -53,
                       2.0 ** -53)
        keep = w > 0
        s = round_half_away(np.log(u[keep]) / w[keep], 9)
        return pa.table({key: pa.array(ids[keep]),
                         weight_col: pa.array(w[keep]),
                         "es_key": pa.array(s),
                         "_all": pa.array(np.zeros(int(keep.sum()),
                                                   dtype=np.int64))})

    scored = ds.map_batches(score, batch_format="pyarrow")
    top = topk_per_group(scored, group="_all", score="es_key", key=key,
                         k=k, descending=True, num_buckets=1)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=["_all"])

    return top.map_batches(fin, batch_format="pandas")


def adaptive_quality_filter(ds: ray.data.Dataset, *, col: str = "text",
                            key: str = "doc_id",
                            group: str = "source",
                            q: float = 0.5) -> ray.data.Dataset:
    """Per-domain adaptive quality gate: keep each doc whose quality
    score is ≥ its OWN group's q-quantile (default median) — the
    data-mixing trick that a single global threshold gets wrong
    (a fixed cutoff empties low-scoring domains and keeps junk from
    high-scoring ones; cf. per-source filtering in Gopher/Dolma-style
    curation). → (key, group, quality, thr) for kept docs.

    Quantile semantics are DuckDB ``quantile_disc`` (sorted value at
    0-based index ``max(0, ceil(q·n)-1)`` — the data/profile protocol),
    over 6-dp-rounded quality scores, so the ≥-comparison is exact on
    both sides.

    100 TB shape: quality is an embarrassingly-parallel pass
    (text_stats); the per-group quantile is ONE coarse-bucket exchange
    of (group, quality) pairs — a bucket owns every row of its groups,
    so in-bucket order statistics are global — and the threshold table
    (one row per domain) attaches back broadcast-or-join. The doc rows
    themselves shuffle zero times."""
    from graphscope_ray.data.text import quality_score
    from graphscope_ray.graph.joins import attach_values

    scored = quality_score(ds, col, key, keep=(group,)).materialize()

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group, "quality"]].copy(deep=False)
        h = pd.util.hash_array(df[group].to_numpy())
        df["_b"] = (h % np.uint64(32)).astype(np.int64)
        return df

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized multi-group order statistic: sort by
        # (group, quality), then index each group at ceil(q·n)-1
        k_arr = g[group].to_numpy()
        v = g["quality"].to_numpy()
        order = np.lexsort((v, k_arr))
        k_arr, v = k_arr[order], v[order]
        bounds = np.flatnonzero(k_arr[1:] != k_arr[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(k_arr)]))
        n = ends - starts
        idx = starts + np.maximum(
            0, np.ceil(q * n).astype(np.int64) - 1)
        return pd.DataFrame({group: k_arr[starts], "thr": v[idx]})

    # pin the (one-row-per-domain) threshold table: attach_values
    # consumes it twice (count() to pick the route, then the read)
    thr = (scored.map_batches(bucket, batch_format="pandas")
           .groupby("_b").map_groups(kernel, batch_format="pandas")
           .materialize())
    withthr = attach_values(scored, thr, on=group, table_key=group,
                            value_names=["thr"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["quality"].to_numpy() >= df["thr"].to_numpy()]

    return withthr.map_batches(keep, batch_format="pandas")


def stratified_split(ds: ray.data.Dataset, *,
                     group: str = "source",
                     splits: list[tuple[str, float]] | None = None,
                     seed: int = 7, key: str = "doc_id",
                     num_buckets: int = 32) -> ray.data.Dataset:
    """Per-GROUP split assignment with exact fractions: within each
    ``group`` (domain/source) rows are ranked by (fmix64(key·B+seed),
    key) and the buckets carved by rank bound ``ceil(cum_frac · n_g)``
    — every group hits its split fractions to ±1 row, the
    domain-balanced train/val carve a data-mixture pipeline needs
    (``split_assign``'s global coin only hits fractions in
    expectation, so small domains can land entirely in one split).
    Deterministic per (key, seed) at any parallelism.

    100 TB shape: the repo-wide coarse-bucket pattern — ONE
    hash(group)%num_buckets exchange co-locates each group, then a
    vectorized multi-group rank kernel per bucket; no per-group
    dispatch, no global sort. SQL twin:
    oracle_sql.stratified_split_sql (row_number window over the same
    hash, identical ceil arithmetic)."""
    if splits is None:
        splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    names = np.array([n for n, _ in splits], dtype=object)
    cum = np.cumsum([w for _, w in splits]).astype(np.float64)

    def add_cb(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[group], index=False).to_numpy()
        return df.assign(
            _cb=(h % np.uint64(num_buckets)).astype(np.int64))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[key].to_numpy()
        hh = _row_hash(ids.astype(np.int64), seed)
        grp = g[group].to_numpy()
        order = np.lexsort((ids, hh, grp))
        g = g.iloc[order].reset_index(drop=True)
        grp = grp[order]
        new = np.empty(len(g), dtype=bool)
        if len(g):
            new[0] = True
            new[1:] = grp[1:] != grp[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(g)])
        rank = np.arange(len(g)) - np.repeat(starts, counts)
        n_g = np.repeat(counts, counts).astype(np.float64)
        # bound b_i(ng) = ceil(cum_i · n_g) — same IEEE expression as
        # the SQL twin, so boundary rows cannot disagree
        idx = np.zeros(len(g), dtype=np.int64)
        assigned = np.zeros(len(g), dtype=bool)
        for i, cf in enumerate(cum[:-1]):
            take = (~assigned) & (rank < np.ceil(cf * n_g))
            idx[take] = i
            assigned |= take
        idx[~assigned] = len(cum) - 1
        out = g.drop(columns=["_cb"])
        out["split"] = names[idx]
        return out

    return (ds.map_batches(add_cb, batch_format="pandas")
              .groupby("_cb")
              .map_groups(kernel, batch_format="pandas"))


def dsir_select(ds: ray.data.Dataset, target_sources, frac: float, *,
                col: str = "text", key: str = "doc_id",
                source_col: str = "source") -> ray.data.Dataset:
    """DSIR-style importance resampling (Xie et al. 2023,
    arXiv:2302.03169 "Data Selection for Language Models via
    Importance Resampling"): score every raw document by the
    log-likelihood ratio of a target-domain bag-of-words unigram model
    over the raw-corpus model, and keep the top ``frac`` fraction.

        lw(doc) = Σ_w m_w · [ ln((c_p(w)+1)/(N_p+V))
                            − ln((c_q(w)+1)/(N_q+V)) ]

    with add-one smoothing over the SHARED raw vocabulary (V =
    distinct raw words, N = total token counts); the target model is
    fit on the docs whose ``source_col`` is in ``target_sources``.
    Tokens are the corpus-wide ``[a-z0-9]+`` runs of lower(text)
    (VOCAB_TOKEN_PATTERN — identical to the LM-filter family, so the
    DuckDB twin replays the arithmetic bit-for-bit at 6 dp).

    Deterministic selection: rank by (lw DESC, key ASC), keep
    ``ceil(frac · n_docs)`` rows (the paper's Gumbel sampling trades
    determinism for variance; the top-k variant is the reproducible
    form also used by its authors for ablations).

    100 TB shape: the corpus is touched ONCE for per-doc word
    multiplicities (per-batch value_counts combiner); both count
    tables reduce via ``bucketed_sum`` (O(distinct words) rows move)
    and attach back broadcast-or-join; the final top-k is a sort+limit
    over the (key, lw) table — O(corpus docs) scalar rows, never the
    text. Paper-scale hashing (fixed-bucket n-grams) drops in by
    replacing ``w`` with ``hash(w) % B`` before the reductions."""
    import re as _re

    from graphscope_ray.graph.joins import attach_values
    from graphscope_ray.util import bucketed_sum, round_half_away
    from graphscope_ray.util import rename as _rn

    pat = _re.compile(VOCAB_TOKEN_PATTERN)
    targets = set(target_sources)

    def doc_words(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df[col].fillna("").str.lower().str.findall(pat)
        ex = toks.explode().dropna()
        if not len(ex):
            return pd.DataFrame({
                key: pd.Series([], dtype=df[key].dtype),
                "w": pd.Series([], dtype=str),
                "m": pd.Series([], dtype=np.int64),
                "_tgt": pd.Series([], dtype=np.int64)})
        idx = ex.index.to_numpy()
        out = pd.DataFrame({
            key: df[key].to_numpy()[idx],
            "w": ex.to_numpy(dtype=object).astype(str),
            "_tgt": df[source_col].isin(targets)
            .to_numpy()[idx].astype(np.int64)})
        g = out.groupby([key, "w", "_tgt"], sort=False).size()
        return g.rename("m").reset_index()

    rows = ds.map_batches(doc_words, batch_format="pandas") \
        .materialize()

    def tgt_only(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["_tgt"] == 1][["w", "m"]]

    cq = bucketed_sum(rows.select_columns(["w", "m"]), ["w"],
                      vals=["m"])
    cq = _rn(cq, {"m": "cq"}).materialize()
    cp = bucketed_sum(rows.map_batches(tgt_only,
                                       batch_format="pandas"),
                      ["w"], vals=["m"])
    cp = _rn(cp, {"m": "cp"}).materialize()
    v = float(cq.count())
    nq = float(cq.sum("cq") or 0)
    np_tok = float(cp.sum("cp") or 0)

    scored = attach_values(rows, cp, on="w", table_key="w",
                           value_names=["cp"], defaults={"cp": 0})
    scored = attach_values(scored, cq, on="w", table_key="w",
                           value_names=["cq"])

    def term(df: pd.DataFrame) -> pd.DataFrame:
        m = df["m"].to_numpy().astype(np.float64)
        lw = m * (np.log((df["cp"].to_numpy() + 1.0) / (np_tok + v))
                  - np.log((df["cq"].to_numpy() + 1.0) / (nq + v)))
        return pd.DataFrame({key: df[key], "lw": lw})

    per_doc = bucketed_sum(
        scored.map_batches(term, batch_format="pandas"),
        [key], vals=["lw"]).materialize()
    keys_ds = ds.select_columns([key])
    n_docs = keys_ds.count()
    withw = attach_values(keys_ds, per_doc, on=key, table_key=key,
                          value_names=["lw"], defaults={"lw": 0.0})

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: df[key],
            "lw": round_half_away(df["lw"].to_numpy(), 6)})

    k = int(np.ceil(frac * n_docs))
    top = (withw.map_batches(rounded, batch_format="pandas")
           .sort(["lw", key], descending=[True, False]).limit(k))
    return top.sort(key)


def gopher_rules(ds: ray.data.Dataset, *, col: str = "text",
                 key: str = "doc_id", min_words: int = 10,
                 max_words: int = 100_000,
                 min_mean_word_len: float = 2.0,
                 max_mean_word_len: float = 12.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_ratio: float = 0.9,
                 max_ellipsis_ratio: float = 0.3,
                 min_alpha_word_ratio: float = 0.6,
                 min_stop_hits: int = 1) -> ray.data.Dataset:
    """The Gopher repetition-free quality rule set (Rae et al. 2021,
    arXiv:2112.11446 §A1.1 — the rule family later reused by
    RefinedWeb/Dolma): per-doc booleans for each rule plus the fused
    ``keep`` flag. All rules are single-pass vectorized string
    kernels, replayed bit-for-bit by the DuckDB twin:

    - ``r_words``: whitespace word count in [min_words, max_words];
    - ``r_mwl``: mean word length in [min, max] (6-dp rounded);
    - ``r_symbol``: (# + …) occurrences / words ≤ max (6 dp);
    - ``r_bullet``: fraction of lines starting with -/* ≤ max;
    - ``r_ellipsis``: fraction of lines ending with ... ≤ max;
    - ``r_alpha``: fraction of words containing [a-z] ≥ min;
    - ``r_stop``: ≥ min_stop_hits of {the, be, to, of, and, that,
      have, with} present as whole lowercase words.

    100 TB shape: embarrassingly parallel map_batches, no exchange."""
    import re as _re

    stop = ("the", "be", "to", "of", "and", "that", "have", "with")
    stop_pats = [_re.compile(rf"\b{w}\b") for w in stop]
    bullet_pat = _re.compile(r"^[ \t]*[-*•]")
    alpha_pat = _re.compile(r"[a-z]")

    def rules(df: pd.DataFrame) -> pd.DataFrame:
        from graphscope_ray.util import round_half_away
        txt = df[col].fillna("")
        low = txt.str.lower()
        # RE2 \s semantics ([ \t\n\f\r] — NOT \v, matching the
        # repo-wide tokenizer convention) so the DuckDB twin's
        # string_split_regex(..., '\s+') sees identical words
        words = low.str.split(r"[ \t\n\f\r]+", regex=True).map(
            lambda ws: [w for w in ws if w] if isinstance(ws, list)
            else [])
        n_words = words.str.len().fillna(0).astype(np.int64)
        total_chars = words.map(
            lambda ws: sum(len(w) for w in ws) if ws else 0) \
            .astype(np.int64)
        mwl = round_half_away(
            total_chars / np.maximum(n_words, 1), 6)
        n_sym = (txt.str.count("#")
                 + txt.str.count(r"\.\.\.")).astype(np.int64)
        sym_ratio = round_half_away(
            n_sym / np.maximum(n_words, 1), 6)
        lines = txt.str.split("\n")
        n_lines = lines.str.len().fillna(0).astype(np.int64)
        n_bullet = lines.map(lambda ls: sum(
            1 for l in ls if bullet_pat.match(l)) if ls else 0)
        n_ell = lines.map(lambda ls: sum(
            1 for l in ls
            if l.rstrip(" \t\r\f").endswith("...")) if ls else 0)
        bullet_ratio = round_half_away(
            n_bullet.to_numpy() / np.maximum(n_lines, 1), 6)
        ell_ratio = round_half_away(
            n_ell.to_numpy() / np.maximum(n_lines, 1), 6)
        n_alpha = words.map(lambda ws: sum(
            1 for w in ws if alpha_pat.search(w)) if ws else 0)
        alpha_ratio = round_half_away(
            n_alpha.to_numpy() / np.maximum(n_words, 1), 6)
        stop_hits = sum((low.str.contains(p).astype(np.int64))
                        for p in stop_pats)
        out = pd.DataFrame({
            key: df[key],
            "n_words": n_words,
            "r_words": ((n_words >= min_words)
                        & (n_words <= max_words)),
            "r_mwl": ((mwl >= min_mean_word_len)
                      & (mwl <= max_mean_word_len)),
            "r_symbol": sym_ratio <= max_symbol_ratio,
            "r_bullet": bullet_ratio <= max_bullet_ratio,
            "r_ellipsis": ell_ratio <= max_ellipsis_ratio,
            "r_alpha": alpha_ratio >= min_alpha_word_ratio,
            "r_stop": stop_hits.to_numpy() >= min_stop_hits,
        })
        out["keep"] = (out["r_words"] & out["r_mwl"]
                       & out["r_symbol"] & out["r_bullet"]
                       & out["r_ellipsis"] & out["r_alpha"]
                       & out["r_stop"])
        return out

    return ds.map_batches(rules, batch_format="pandas")
