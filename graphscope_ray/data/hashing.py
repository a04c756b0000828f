"""Vectorized, SQL-replayable text hashing primitives.

One hash family shared by fingerprint / MinHash / SimHash so that (a)
the hot loops are numpy over codepoint arrays — no Python loop over
tokens, shingles or rows (r01 VERDICT #5/#6) — and (b) every value is
exactly reproducible in DuckDB SQL (list_reduce over codepoints with
HUGEINT mod-2^64 arithmetic), which is what makes the doc_minhash /
doc_simhash / doc_fingerprint driver oracles possible.

Definitions (all arithmetic mod 2^64, wrap-around):

- ``poly(s)``: FNV-style polynomial over the token's codepoints:
  ``h = F; for cp in s: h = h*B + cp + 1`` with B = 1099511628211
  (FNV prime), F = 14695981039346656037 (FNV offset).
- ``fmix64``: xorshift-multiply finalizer (constants chosen < 2^63 so
  the SQL twin's HUGEINT products never overflow 128 bits).
- token hash = ``fmix64(poly(token))``.
- window combine over k consecutive token hashes:
  ``acc = 0; for h in window: acc = acc*B + h`` — the shingle hash
  (MinHash) and the winnowing window hash (fingerprint).

Vectorization strategy: the whole batch of texts is joined with a
separator, decoded once to a codepoint array, and token hashes are
computed via modular prefix sums — ``h(seg[a,b)) = F·B^(b-a) +
B^(b-1)·(P_b − P_a)`` where ``P_j = Σ_{i<j}(cp_i+1)·B^{−i}`` (B is odd
so B^{−1} mod 2^64 exists). Window combines reuse the same trick over
the token-hash stream. Tokenization is ASCII-whitespace (matches both
Python ``\\s`` and DuckDB RE2 ``\\s`` on ASCII corpora).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
B = U64(1099511628211)
F = U64(14695981039346656037)
C1 = U64(0x2545F4914F6CDD1D)
C2 = U64(0x5851F42D4C957F2D)
BINV = U64(pow(1099511628211, -1, 1 << 64))
MERSENNE61 = U64((1 << 61) - 1)

# Whitespace codepoints = RE2 \s exactly: \t \n \f \r space (NOT \v —
# RE2's Perl-class \s excludes cp 11, and the SQL twins tokenize with
# string_split_regex(text, '\s+'), so including it here would make
# fingerprint/MinHash/SimHash diverge from the oracles on \x0b).
_WS_CP = np.array([9, 10, 12, 13, 32], dtype=np.uint64)


def fmix64(h: np.ndarray) -> np.ndarray:
    """xorshift-multiply finalizer (SQL twin: oracle_sql.fmix_sql)."""
    h = h ^ (h >> U64(31))
    h = h * C1
    h = h ^ (h >> U64(29))
    h = h * C2
    return h ^ (h >> U64(32))


def _codepoints(texts) -> tuple[np.ndarray, np.ndarray]:
    """Join the batch with '\\n' → (codepoint array, doc start offsets).
    One encode per batch; no per-row Python work after this."""
    joined = "\n".join(texts)
    # surrogatepass: lone surrogates (e.g. from surrogateescape-decoded
    # bytes) hash as their codepoint value instead of raising; DuckDB
    # strings are UTF-8-clean so the SQL twins never see them anyway.
    cp = np.frombuffer(joined.encode("utf-32-le", "surrogatepass"),
                       dtype=np.uint32)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                       count=len(texts))
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    return cp.astype(np.uint64), starts


def _pow_arrays(n: int) -> tuple[np.ndarray, np.ndarray]:
    """B^i and B^-i mod 2^64 for i in [0, n]."""
    bp = np.empty(n + 1, dtype=np.uint64)
    bi = np.empty(n + 1, dtype=np.uint64)
    bp[0] = bi[0] = 1
    if n:
        np.multiply.accumulate(np.full(n, B), out=bp[1:])
        np.multiply.accumulate(np.full(n, BINV), out=bi[1:])
    return bp, bi


def batch_token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """All texts of a batch → (tok_doc, tok_hash): the document index
    and fmix64(poly(token)) of every whitespace token, in document
    order. Fully vectorized (one pass over the codepoint stream)."""
    n_docs = len(texts)
    if n_docs == 0:
        return (np.array([], dtype=np.int64), np.array([], dtype=np.uint64))
    cp, doc_starts = _codepoints(texts)
    L = len(cp)
    if L == 0:
        return (np.array([], dtype=np.int64), np.array([], dtype=np.uint64))
    is_ws = np.isin(cp, _WS_CP) | (cp == U64(10))
    # token boundaries
    tok_mask = ~is_ws
    prev = np.empty(L, dtype=bool)
    prev[0] = False
    prev[1:] = tok_mask[:-1]
    tok_start = np.flatnonzero(tok_mask & ~prev)
    nxt = np.empty(L, dtype=bool)
    nxt[-1] = False
    nxt[:-1] = tok_mask[1:]
    tok_end = np.flatnonzero(tok_mask & ~nxt) + 1
    if len(tok_start) == 0:
        return (np.array([], dtype=np.int64), np.array([], dtype=np.uint64))
    bp, bi = _pow_arrays(L)
    # prefix P_j = sum_{i<j} (cp_i+1) * B^-i  (mod 2^64)
    pref = np.zeros(L + 1, dtype=np.uint64)
    np.cumsum((cp + U64(1)) * bi[:L], out=pref[1:])
    seg = pref[tok_end] - pref[tok_start]
    h = F * bp[tok_end - tok_start] + bp[tok_end - 1] * seg
    tok_doc = np.searchsorted(doc_starts, tok_start, side="right") - 1
    return tok_doc.astype(np.int64), fmix64(h)


def windowed_hashes(tok_doc: np.ndarray, tok_hash: np.ndarray, k: int,
                    n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-document sliding windows of ``k_eff = min(k, n_tokens)``
    token hashes combined as ``acc = acc*B + h`` → (win_doc, win_hash),
    grouped contiguously by document. Documents with zero tokens get a
    single 0 window. Vectorized via modular prefix sums over the
    token-hash stream (no per-window loop)."""
    T = len(tok_hash)
    counts = np.bincount(tok_doc, minlength=n_docs) if T else np.zeros(
        n_docs, dtype=np.int64)
    bp, bi = _pow_arrays(T)
    pref = np.zeros(T + 1, dtype=np.uint64)
    if T:
        np.cumsum(tok_hash * bi[:T], out=pref[1:])

    def combine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """hash of token range [a, b) with acc0 = 0."""
        out = np.zeros(len(a), dtype=np.uint64)
        nz = b > a
        out[nz] = bp[b[nz] - 1] * (pref[b[nz]] - pref[a[nz]])
        return out

    doc_tok_start = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(counts[:-1], out=doc_tok_start[1:])
    parts_doc, parts_hash = [], []
    # full-k windows (docs with >= k tokens), computed batch-wide
    if T >= k:
        j = np.arange(T - k + 1, dtype=np.int64)
        valid = tok_doc[j] == tok_doc[j + k - 1]
        jv = j[valid]
        if len(jv):
            parts_doc.append(tok_doc[jv])
            parts_hash.append(combine(jv, jv + k))
    # short docs (0 < n_tokens < k): one window over all their tokens
    short = np.flatnonzero((counts > 0) & (counts < k))
    if len(short):
        a = doc_tok_start[short]
        parts_doc.append(short)
        parts_hash.append(combine(a, a + counts[short]))
    # empty docs: single 0 window
    empty = np.flatnonzero(counts == 0)
    if len(empty):
        parts_doc.append(empty)
        parts_hash.append(np.zeros(len(empty), dtype=np.uint64))
    if not parts_doc:
        return (np.array([], dtype=np.int64), np.array([], dtype=np.uint64))
    wd = np.concatenate(parts_doc)
    wh = np.concatenate(parts_hash)
    order = np.argsort(wd, kind="stable")
    return wd[order], wh[order]


def char_ngram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct character-n-gram hashes per document, vectorized (one
    codepoint pass per batch) → (gram_doc, gram_hash) sorted by
    (doc, hash) with per-doc duplicates removed.

    Gram semantics mirror ``{s[i:i+n] for i in range(max(1, len(s)-n+1))}``:
    every length-n substring; docs shorter than n contribute their whole
    text as the single gram (the empty doc contributes the empty gram).
    The hash is the same injective-per-length polynomial + fmix64 family
    as token hashes, so distinct substrings collide with probability
    ~2^-64 — Jaccard over hash sets equals Jaccard over substring sets
    for all practical purposes (collision odds per pair < 1e-9 even at
    10^5 grams/doc)."""
    n_docs = len(texts)
    if n_docs == 0:
        return (np.array([], dtype=np.int64), np.array([], dtype=np.uint64))
    cp, doc_starts = _codepoints(texts)
    L = len(cp)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                       count=n_docs)
    doc_ends = doc_starts + lens
    bp, bi = _pow_arrays(L if L else 1)
    pref = np.zeros(L + 1, dtype=np.uint64)
    if L:
        np.cumsum((cp + U64(1)) * bi[:L], out=pref[1:])

    def seg_hash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        out = np.full(len(a), F, dtype=np.uint64)  # empty segment → F
        nz = b > a
        an, bn = a[nz], b[nz]
        out[nz] = F * bp[bn - an] + bp[bn - 1] * (pref[bn] - pref[an])
        return fmix64(out)

    parts_doc, parts_hash = [], []
    # full-length windows within long-enough docs
    long_docs = lens >= n
    if long_docs.any() and L >= n:
        j = np.arange(L - n + 1, dtype=np.int64)
        dj = np.searchsorted(doc_starts, j, side="right") - 1
        valid = (j + n) <= doc_ends[dj]
        jv = j[valid]
        if len(jv):
            parts_doc.append(dj[valid])
            parts_hash.append(seg_hash(jv, jv + n))
    # short docs (len < n, incl. empty): whole text as the single gram
    short = np.flatnonzero(~long_docs)
    if len(short):
        parts_doc.append(short)
        parts_hash.append(seg_hash(doc_starts[short], doc_ends[short]))
    gd = np.concatenate(parts_doc)
    gh = np.concatenate(parts_hash)
    order = np.lexsort((gh, gd))
    gd, gh = gd[order], gh[order]
    keep = np.empty(len(gd), dtype=bool)
    keep[0] = True
    keep[1:] = (gd[1:] != gd[:-1]) | (gh[1:] != gh[:-1])
    return gd[keep].astype(np.int64), gh[keep]


def walk_hash(cand: np.ndarray, pid: np.ndarray, hop: int,
              seed: int) -> np.ndarray:
    """Deterministic path-sampling successor score: fmix64 of a
    mod-2^64 combine of (candidate vid, path id, hop, seed). Replayed
    in SQL by oracle_sql.walk_hash_sql; min (score, candidate) wins."""
    # scalar part via python ints (numpy warns on scalar u64 overflow)
    const = U64((int(hop) * int(C2) + int(seed)) % (1 << 64))
    h = cand.astype(np.uint64) * B + pid.astype(np.uint64) * C1 + const
    return fmix64(h)


def minhash_perm_params(num_perm: int, seed: int):
    """Identical to r01: a,b drawn from default_rng(seed) in [1,M61)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE61, size=num_perm, dtype=np.uint64)
    return a, b


_SIG_CHUNK = 131_072
_SIG_BUFS: dict = {}  # worker-process cache: num_perm -> scratch matrix


def minhash_sigs(win_doc: np.ndarray, win_hash: np.ndarray, n_docs: int,
                 a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_docs × num_perm) signature matrix: per permutation p, min
    over the doc's window hashes of ``(a_p·x + b_p) mod 2^64 mod M61``
    (wrap-then-mod, matching the SQL twin exactly).

    Runs in ~128k-window chunks over a worker-cached scratch matrix
    with in-place mul/add/mod: the straight-line version materialized
    three fresh windows×num_perm temporaries per batch (~1.3 GB at
    900k windows), and first-touch page faults on those dominated the
    whole dedup pipeline (43 ns/element measured ≈ fault, not
    arithmetic — the triangles lesson, BASELINE.md)."""
    num_perm = len(a)
    if len(win_doc) == 0:
        return np.zeros((n_docs, num_perm), dtype=np.uint64)
    cnt = np.bincount(win_doc, minlength=n_docs)
    # docs are contiguous runs in win_doc; reduceat needs non-empty runs
    assert (cnt > 0).all(), "every doc must have >= 1 window"
    out = np.full((n_docs, num_perm), np.uint64(0xFFFFFFFFFFFFFFFF),
                  dtype=np.uint64)
    buf = _SIG_BUFS.get(num_perm)
    if buf is None or len(buf) < _SIG_CHUNK:
        buf = _SIG_BUFS[num_perm] = np.empty((_SIG_CHUNK, num_perm),
                                             dtype=np.uint64)
    for lo in range(0, len(win_hash), _SIG_CHUNK):
        hi = min(lo + _SIG_CHUNK, len(win_hash))
        v = buf[: hi - lo]
        np.multiply(win_hash[lo:hi, None], a[None, :], out=v)
        v += b[None, :]
        v %= MERSENNE61
        docs = win_doc[lo:hi]
        st = np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]])
        mins = np.minimum.reduceat(v, st, axis=0)
        seg = docs[st]  # unique within the chunk (contiguous runs)
        np.minimum(out[seg], mins, out=mins)
        out[seg] = mins
    return out


def simhash_from_tokens(tok_doc: np.ndarray, tok_hash: np.ndarray,
                        n_docs: int) -> np.ndarray:
    """Per-doc 64-bit SimHash: bit b set iff strictly more than half of
    the doc's token hashes have bit b set (2·ones > n_tokens). Docs
    with no tokens hash to 0. Returns uint64 array of length n_docs."""
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(tok_doc) == 0:
        return out
    bits = ((tok_hash[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & U64(1)).astype(np.int64)
    ones = np.zeros((n_docs, 64), dtype=np.int64)
    np.add.at(ones, tok_doc, bits)
    n_tok = np.bincount(tok_doc, minlength=n_docs)
    majority = (2 * ones) > n_tok[:, None]
    weights = (U64(1) << np.arange(64, dtype=np.uint64))
    return (majority.astype(np.uint64) * weights[None, :]).sum(axis=1,
                                                               dtype=np.uint64)
