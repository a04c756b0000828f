"""Mergeable sketches over a Dataset — the approximate-at-scale
answers a 100 TB corpus needs when the exact reduce is unaffordable.

HyperLogLog distinct count (Flajolet et al. 2007, the trailing-zero
Flajolet–Martin rank variant): every batch folds its token hashes into
a 2^p-register vector (``np.maximum.at`` — one pass, no Python loop),
and the vectors tree-merge through a native ``Dataset.aggregate``
elementwise max. Nothing but O(2^p)-byte accumulators ever move — no
shuffle, no driver materialization — and the register table is a pure
function of the shared ``fmix64(poly(token))`` hash family
(data/hashing.py), so a DuckDB twin replays it BIT-EXACTLY:

    idx = h & (2^p - 1)            -- low p bits pick the register
    w   = h >> p                   -- remaining 64-p bits
    rho = tz(w) + 1                -- trailing zeros, capped at 64-p+1
    reg[idx] = max(rho)

``tz`` is exact integer arithmetic on both sides (numpy SWAR popcount
of ``(w & -w) - 1``; DuckDB ``bit_count``) — no float in the sketch
itself. The float estimator runs on the final 2^p-vector only.

Reference scope: GraphScope's Communicator global aggregates
(grape/communication) cover exact sums/min/max; the sketch extends the
same mergeable-reduce shape to distinct counting for the LLM-data
pipeline (vocabulary size, per-source cardinality) where exact
``bucketed_distinct`` would shuffle every token.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import AggregateFn

from graphscope_ray.data.hashing import batch_token_hashes, fmix64

U64 = np.uint64


def _popcount64(x: np.ndarray) -> np.ndarray:
    # SWAR popcount (same kernel as dedup._popcount64, local to keep
    # the sketch module dependency-free)
    x = x.astype(np.uint64, copy=True)
    x -= (x >> U64(1)) & U64(0x5555555555555555)
    x = (x & U64(0x3333333333333333)) + ((x >> U64(2)) & U64(0x3333333333333333))
    x = (x + (x >> U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
    return (x * U64(0x0101010101010101)) >> U64(56)


def hll_fold(hashes: np.ndarray, p: int, regs: np.ndarray | None = None,
             ) -> np.ndarray:
    """Fold uint64 hashes into a 2^p register vector (max of ranks).

    rho = trailing zeros of (h >> p) + 1; h >> p == 0 (probability
    2^-(64-p)) saturates at the cap 64 - p + 1.
    """
    m = 1 << p
    if regs is None:
        regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    idx = (hashes & U64(m - 1)).astype(np.int64)
    w = hashes >> U64(p)
    low = w & (~w + U64(1))          # isolate lowest set bit (0 if w==0)
    rho = _popcount64(low - U64(1)) + U64(1)   # w==0 → popcount(~0)+1 = 65
    np.minimum(rho, U64(64 - p + 1), out=rho)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with the small-range linear-counting
    correction (large-range correction is unnecessary at 64-bit)."""
    m = len(regs)
    alpha = (0.673 if m == 16 else 0.697 if m == 32
             else 0.709 if m == 64 else 0.7213 / (1.0 + 1.079 / m))
    est = alpha * m * m / np.sum(np.ldexp(1.0, -regs.astype(np.int64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_registers(ds: ray.data.Dataset, *, col: str = "text",
                  p: int = 12) -> np.ndarray:
    """Distributed register computation: one native global aggregate,
    accumulators are 2^p bytes, blocks never leave their workers."""
    m = 1 << p

    def accumulate_block(acc: np.ndarray, block) -> np.ndarray:
        if isinstance(block, pa.Table):
            texts = block[col].to_pylist()
        else:
            texts = block[col].fillna("").tolist()
        texts = ["" if t is None else t for t in texts]
        _, tok_hash = batch_token_hashes(texts)
        return hll_fold(tok_hash, p, acc.copy())

    agg = AggregateFn(
        init=lambda k: np.zeros(m, dtype=np.uint8),
        merge=lambda a, b: np.maximum(a, b),
        accumulate_block=accumulate_block,
        name="hll_regs",
    )
    out = ds.aggregate(agg)
    return np.asarray(out["hll_regs"], dtype=np.uint8)


def hll_distinct(ds: ray.data.Dataset, *, col: str = "text",
                 p: int = 12) -> float:
    """Approximate distinct whitespace-token count (standard error
    ≈ 1.04/sqrt(2^p))."""
    return hll_estimate(hll_registers(ds, col=col, p=p))


def hll_register_rows(ds: ray.data.Dataset, *, col: str = "text",
                      p: int = 12) -> pd.DataFrame:
    """Dense (reg_idx, reg) table of the sketch — the driver-row /
    oracle-compare form (2^p rows of exact integers)."""
    regs = hll_registers(ds, col=col, p=p)
    return pd.DataFrame({
        "reg_idx": np.arange(len(regs), dtype=np.int64),
        "reg": regs.astype(np.int64),
    })


def hll_register_rows_by_key(ds: ray.data.Dataset, *, key: str,
                             col: str = "text", p: int = 10,
                             ) -> pd.DataFrame:
    """Per-group HLL registers: ``groupby(key).aggregate`` with the
    same fold/merge — one register vector per distinct group value
    (meant for LOW-cardinality keys like a source/domain column; a
    high-cardinality key would hit Ray 2.49's per-distinct-key
    dispatch cost, see util.bucketed_sum). Returns the dense
    (key, reg_idx, reg) table, key-then-index ordered."""
    m = 1 << p

    def accumulate_block(acc: np.ndarray, block) -> np.ndarray:
        if isinstance(block, pa.Table):
            texts = block[col].to_pylist()
        else:
            texts = block[col].fillna("").tolist()
        texts = ["" if t is None else t for t in texts]
        _, tok_hash = batch_token_hashes(texts)
        return hll_fold(tok_hash, p, acc.copy())

    agg = AggregateFn(
        init=lambda k: np.zeros(m, dtype=np.uint8),
        merge=lambda a, b: np.maximum(a, b),
        accumulate_block=accumulate_block,
        name="hll_regs",
    )
    rows = ds.groupby(key).aggregate(agg).take_all()
    rows.sort(key=lambda r: r[key])
    return pd.DataFrame({
        key: np.repeat([r[key] for r in rows], m),
        "reg_idx": np.tile(np.arange(m, dtype=np.int64), len(rows)),
        "reg": np.concatenate([
            np.asarray(r["hll_regs"], dtype=np.int64) for r in rows])
        if rows else np.array([], dtype=np.int64),
    })


# -- Bloom filter (broadcast-membership scale path) ----------------------

_BLOOM_SALT = U64(6364136223846793005)  # oracle_sql.C2 — shared constant


def bloom_positions(hashes: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(k × n) bit positions: probe i rehashes through
    fmix64((h + i·C2) mod 2^64) mod m_bits (SQL-replayable)."""
    # i·C2 wraps mod 2^64 BY DESIGN; numpy warns on *scalar* uint64
    # overflow (arrays wrap silently) — silence it so a future real
    # overflow elsewhere isn't drowned by this intended one
    with np.errstate(over="ignore"):
        salts = [U64(i) * _BLOOM_SALT for i in range(k)]
    return np.stack([
        (fmix64(hashes + s) % U64(m_bits)).astype(np.int64)
        for s in salts
    ])


def bloom_fold(hashes: np.ndarray, k: int, m_bits: int,
               words: np.ndarray | None = None) -> np.ndarray:
    """Fold token hashes into an m_bits bitset (uint64 words,
    mergeable by |)."""
    if words is None:
        words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    if len(hashes) == 0:
        return words
    pos = bloom_positions(hashes, k, m_bits).reshape(-1)
    np.bitwise_or.at(words, pos // 64, U64(1) << (pos % 64).astype(np.uint64))
    return words


def bloom_build(ds: ray.data.Dataset, *, col: str = "text",
                k: int = 3, m_bits: int = 1 << 16) -> np.ndarray:
    """Distributed Bloom filter over the corpus's token hashes: per-
    block bitset folds tree-merge by elementwise OR through one native
    global aggregate — m_bits/8 bytes of accumulator is all that moves.
    The result broadcasts via one ``ray.put`` to any number of probe
    tasks: the no-shuffle scale path for decontamination / blocklist
    membership at 100 TB (the exact n-gram join in data/curate.
    decontaminate stays the bit-exact small/medium route)."""

    def accumulate_block(acc: np.ndarray, block) -> np.ndarray:
        if isinstance(block, pa.Table):
            texts = block[col].to_pylist()
        else:
            texts = block[col].fillna("").tolist()
        texts = ["" if t is None else t for t in texts]
        _, tok_hash = batch_token_hashes(texts)
        return bloom_fold(tok_hash, k, m_bits, acc.copy())

    agg = AggregateFn(
        init=lambda key: np.zeros((m_bits + 63) // 64, dtype=np.uint64),
        merge=lambda a, b: a | b,
        accumulate_block=accumulate_block,
        name="bloom",
    )
    return np.asarray(ds.aggregate(agg)["bloom"], dtype=np.uint64)


def bloom_contains(words: np.ndarray, hashes: np.ndarray, *, k: int,
                   m_bits: int) -> np.ndarray:
    """Membership test per hash: True iff ALL k probe bits are set
    (no false negatives; false positives at the usual Bloom rate)."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    pos = bloom_positions(hashes, k, m_bits)
    hit = np.ones(len(hashes), dtype=bool)
    for i in range(k):
        bits = (words[pos[i] // 64] >> (pos[i] % 64).astype(np.uint64)) & U64(1)
        hit &= bits.astype(bool)
    return hit


def bloom_probe(ds: ray.data.Dataset, words: np.ndarray, *,
                col: str = "text", key: str = "doc_id",
                k: int = 3, m_bits: int = 1 << 16) -> ray.data.Dataset:
    """Per-doc contamination counts against a built filter:
    (key, n_tokens, n_hits) — the filter ships once via ``ray.put``
    and every batch probes it vectorized."""
    import ray as _ray
    ref = _ray.put(words)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        w = _ray.get(ref)
        texts = ["" if t is None else t for t in df[col].tolist()]
        tok_doc, tok_hash = batch_token_hashes(texts)
        hits = bloom_contains(w, tok_hash, k=k, m_bits=m_bits)
        n_tok = np.zeros(len(df), dtype=np.int64)
        n_hit = np.zeros(len(df), dtype=np.int64)
        np.add.at(n_tok, tok_doc, 1)
        np.add.at(n_hit, tok_doc, hits.astype(np.int64))
        return pd.DataFrame({key: df[key].to_numpy(),
                             "n_tokens": n_tok, "n_hits": n_hit})

    return ds.map_batches(probe, batch_format="pandas")


# -- count-min sketch (frequency twin of the HLL) -----------------------

_CMS_SALT = U64(2685821657736338717)  # oracle_sql.C1 — shared constant


def cms_cols(hashes: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d × n) column indices: row r rehashes every token hash through
    fmix64((h + r·C1) mod 2^64) mod w — the d pairwise-independent-ish
    hash rows, each SQL-replayable through oracle_sql.fmix_u64_sql."""
    return np.stack([
        (fmix64(hashes + U64(r) * _CMS_SALT) % U64(w)).astype(np.int64)
        for r in range(d)
    ])


def cms_fold(hashes: np.ndarray, d: int, w: int,
             counts: np.ndarray | None = None) -> np.ndarray:
    """Fold token hashes into a (d × w) count matrix (mergeable by +)."""
    if counts is None:
        counts = np.zeros((d, w), dtype=np.int64)
    if len(hashes) == 0:
        return counts
    cols = cms_cols(hashes, d, w)
    for r in range(d):
        np.add.at(counts[r], cols[r], 1)
    return counts


def cms_counts(ds: ray.data.Dataset, *, col: str = "text",
               d: int = 4, w: int = 1024) -> np.ndarray:
    """Distributed count-min sketch: per-block folds tree-merged by
    elementwise sum through one native global aggregate — d·w int64
    accumulators are the only traffic (32 KiB at the defaults)."""

    def accumulate_block(acc: np.ndarray, block) -> np.ndarray:
        if isinstance(block, pa.Table):
            texts = block[col].to_pylist()
        else:
            texts = block[col].fillna("").tolist()
        texts = ["" if t is None else t for t in texts]
        _, tok_hash = batch_token_hashes(texts)
        return cms_fold(tok_hash, d, w, acc.copy())

    agg = AggregateFn(
        init=lambda k: np.zeros((d, w), dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=accumulate_block,
        name="cms",
    )
    return np.asarray(ds.aggregate(agg)["cms"], dtype=np.int64)


def cms_lookup(counts: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point frequency estimates: min over the d rows — always ≥ the
    true count, ≤ true + ε·N with prob 1-δ (ε = e/w, δ = e^-d)."""
    d, w = counts.shape
    cols = cms_cols(hashes, d, w)
    return np.min(
        np.stack([counts[r, cols[r]] for r in range(d)]), axis=0)


def cms_rows(ds: ray.data.Dataset, *, col: str = "text",
             d: int = 4, w: int = 1024) -> pd.DataFrame:
    """Dense (row_idx, col_idx, cnt) table — the driver-row /
    oracle-compare form (d·w rows of exact integers)."""
    c = cms_counts(ds, col=col, d=d, w=w)
    return pd.DataFrame({
        "row_idx": np.repeat(np.arange(d, dtype=np.int64), c.shape[1]),
        "col_idx": np.tile(np.arange(c.shape[1], dtype=np.int64), d),
        "cnt": c.reshape(-1),
    })


def hll_window_ids(ds: ray.data.Dataset, *, ts_col: str = "ts",
                   id_col: str = "user_id",
                   width=None, p: int = 8, seed: int = 5,
                   ) -> pd.DataFrame:
    """Per-tumbling-window approximate distinct-id count — the
    sketch × temporal composition (daily/hourly active users at a
    scale where exact per-window COUNT(DISTINCT) would shuffle every
    id): events stamp their window id (epoch-ns // width), and each
    window folds ``fmix64(id·B + seed)`` hashes (data/curate._row_hash
    family — SQL-replayable) into a 2^p register vector via the
    per-key tree-merge aggregate. Only #windows · 2^p bytes of
    accumulator ever move. Returns the dense (wid, reg_idx, reg)
    register table — the driver-row / oracle-compare form; feed rows
    through :func:`hll_estimate` per window for the float estimates.
    Window count must be LOW-cardinality (tumbling days/hours — the
    per-distinct-key aggregate note on hll_register_rows_by_key)."""
    import numpy as np
    if width is None:
        width = np.timedelta64(1, "D")
    wns = int(np.timedelta64(width).astype("timedelta64[ns]")
              .astype(np.int64))
    m = 1 << p
    from graphscope_ray.data.hashing import B as _B

    def stamp(t: pa.Table) -> pa.Table:
        w = (t[ts_col].to_numpy().astype("datetime64[ns]")
             .astype(np.int64) // wns)
        return pa.table({"wid": w, id_col: t[id_col]})

    def accumulate_block(acc: np.ndarray, block) -> np.ndarray:
        ids = (block[id_col].to_numpy()
               if not isinstance(block, pa.Table)
               else block[id_col].to_numpy())
        h = fmix64(np.asarray(ids).astype(np.uint64) * _B
                   + np.uint64(seed))
        return hll_fold(h, p, acc.copy())

    agg = AggregateFn(
        init=lambda k: np.zeros(m, dtype=np.uint8),
        merge=lambda a, b: np.maximum(a, b),
        accumulate_block=accumulate_block,
        name="hll_regs",
    )
    rows = (ds.map_batches(stamp, batch_format="pyarrow")
            .groupby("wid").aggregate(agg).take_all())
    rows.sort(key=lambda r: r["wid"])
    return pd.DataFrame({
        "wid": np.repeat([r["wid"] for r in rows], m).astype(np.int64),
        "reg_idx": np.tile(np.arange(m, dtype=np.int64), len(rows)),
        "reg": np.concatenate(
            [np.asarray(r["hll_regs"], dtype=np.int64) for r in rows]),
    })
