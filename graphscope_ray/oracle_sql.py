"""DuckDB oracle-SQL generators for the text/dedup operators.

Each generator returns ANSI-ish DuckDB SQL that exactly replays the
corresponding operator in ``graphscope_ray.data`` over the
``documents`` view — same polynomial/fmix hash family as
``data/hashing.py`` (verified bit-for-bit in tests), so the driver's
hash-compare correctness gate covers MinHash/SimHash/fingerprint/
lang-id, which were rows-only in round 1.

All mod-2^64 arithmetic goes through HUGEINT (products of a UBIGINT by
a < 2^63 constant stay below 2^127) and wraps exactly like numpy
uint64.
"""

from __future__ import annotations

from graphscope_ray.data.hashing import minhash_perm_params
from graphscope_ray.data.text import _LEXICONS

M64 = "18446744073709551616"  # 2^64
B = "1099511628211"
F = "14695981039346656037"
C1 = "2685821657736338717"   # 0x2545F4914F6CDD1D
C2 = "6364136223846793005"   # 0x5851F42D4C957F2D
MERS = str((1 << 61) - 1)

_POLY = (f"(list_reduce(list_prepend({F}::HUGEINT, "
         f"list_transform(range(1, length(t)+1), "
         f"i -> unicode(substr(t,i,1))::HUGEINT)), "
         f"(a,b) -> ((a*{B}) % {M64} + b + 1) % {M64}))::UBIGINT")


def token_hash_ctes(source: str = "documents", text_col: str = "text",
                    key: str = "doc_id") -> str:
    """CTE chain ending in ``th(doc_id, h)``: h = list of fmix64(poly)
    token hashes (layered list_transform keeps expression size linear)."""
    return f"""
t0 AS (SELECT {key} AS doc_id,
              list_filter(string_split_regex({text_col}, '\\s+'),
                          x -> x <> '') AS toks FROM {source}),
t1 AS (SELECT doc_id, list_transform(toks, t -> {_POLY}) AS h FROM t0),
t2 AS (SELECT doc_id, list_transform(h, x -> xor(x, x >> 31)) AS h FROM t1),
t3 AS (SELECT doc_id, list_transform(h,
         x -> ((x::HUGEINT * {C1}) % {M64})::UBIGINT) AS h FROM t2),
t4 AS (SELECT doc_id, list_transform(h, x -> xor(x, x >> 29)) AS h FROM t3),
t5 AS (SELECT doc_id, list_transform(h,
         x -> ((x::HUGEINT * {C2}) % {M64})::UBIGINT) AS h FROM t4),
th AS (SELECT doc_id, list_transform(h, x -> xor(x, x >> 32)) AS h FROM t5)"""


def _windows_cte(k: int) -> str:
    """From ``th`` → ``w(doc_id, wins)``: sliding windows of
    ``k_eff = min(k, len)`` token hashes combined as acc*B + h; empty
    docs get the single window [0]."""
    comb = (f"(list_reduce(list_prepend(0::HUGEINT, "
            f"list_transform(h[i : i + least({k}, len(h)) - 1], "
            f"x -> x::HUGEINT)), "
            f"(a,b) -> ((a*{B}) % {M64} + b) % {M64}))::UBIGINT")
    return f"""
w AS (SELECT doc_id,
  CASE WHEN len(h) = 0 THEN [0::UBIGINT]
       ELSE list_transform(range(1, len(h) - least({k}, len(h)) + 2),
                           i -> {comb})
  END AS wins FROM th)"""


_WRAP_I64 = ("(({x})::HUGEINT - CASE WHEN ({x}) >= 9223372036854775808 "
             f"THEN {M64} ELSE 0 END)::BIGINT")


def wrap_int64(x: str) -> str:
    """UBIGINT expr → BIGINT with two's-complement wrap (numpy
    ``astype(int64)`` semantics)."""
    return _WRAP_I64.format(x=x)


def fingerprint_sql(k: int = 5) -> str:
    return f"""
WITH {token_hash_ctes()},
{_windows_cte(k)}
SELECT doc_id, {wrap_int64('list_min(wins)')} AS fingerprint
FROM w ORDER BY doc_id"""


def simhash_expr(hs: str = "h") -> str:
    """64-term majority-vote bit sum over the token-hash list."""
    terms = []
    for b in range(64):
        terms.append(
            f"CASE WHEN 2*list_sum(list_transform({hs}, "
            f"x -> CAST((x >> {b}) & 1 AS BIGINT))) > len({hs}) "
            f"THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END")
    return "(" + " + ".join(terms) + ")"


def simhash_pairs_sql(max_hamming: int = 0) -> str:
    """Oracle for simhash_dedup at max_hamming=0: equal-simhash pairs.
    (The Python path buckets by 16-bit blocks first; at hamming 0 every
    block matches, so equality join is equivalent as long as no bucket
    exceeds the 500-doc cap — asserted in tests at sf0.01.)"""
    assert max_hamming == 0, "SQL oracle only replays the hamming=0 query"
    sim = ("CASE WHEN len(h) = 0 THEN 0::HUGEINT ELSE "
           + simhash_expr("h") + " END")
    return f"""
WITH {token_hash_ctes()},
s AS (SELECT doc_id, ({sim}) % {M64}::HUGEINT AS sim FROM th)
SELECT x.doc_id AS a, y.doc_id AS b, 0::BIGINT AS hamming
FROM s x JOIN s y ON x.sim = y.sim AND x.doc_id < y.doc_id
ORDER BY a, b"""


def minhash_dedup_sql(*, num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3, threshold: float = 0.9,
                      seed: int = 42, max_bucket: int = 200) -> str:
    """Full MinHash-LSH dedup replay: shingle windows → per-perm mins →
    band buckets (row_number-capped like the Python max_bucket guard) →
    pairs with >= threshold matching signature positions → connected
    components via recursive min-label propagation (the union-find /
    WCC twin; both label a group by its min doc_id)."""
    a, b = minhash_perm_params(num_perm, seed)
    rows = num_perm // bands
    sig_cols = ",\n  ".join(
        f"list_min(list_transform(wins, x -> "
        f"((({int(a[i])}::HUGEINT * x) % {M64} + {int(b[i])}) % {M64} "
        f"% {MERS})::UBIGINT)) AS m{i}"
        for i in range(num_perm))
    band_selects = "\nUNION ALL ".join(
        f"SELECT {bi} AS band, "
        + ", ".join(f"m{bi * rows + r} AS b{r}" for r in range(rows))
        + ", * FROM sigs"
        for bi in range(bands))
    band_key = ", ".join(["band"] + [f"b{r}" for r in range(rows)])
    match_terms = " + ".join(
        f"CASE WHEN x.m{i} = y.m{i} THEN 1 ELSE 0 END"
        for i in range(num_perm))
    return f"""
WITH RECURSIVE {token_hash_ctes()},
{_windows_cte(shingle_k)},
sigs AS (SELECT doc_id,
  {sig_cols}
FROM w),
banded AS ({band_selects}),
capped AS (SELECT *, row_number() OVER (PARTITION BY {band_key}
                                        ORDER BY doc_id) AS rn
           FROM banded QUALIFY rn <= {max_bucket}),
pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM capped x JOIN capped y
    ON x.band = y.band AND {' AND '.join(f'x.b{r} = y.b{r}' for r in range(rows))}
   AND x.doc_id < y.doc_id
  WHERE ({match_terms}) >= {threshold} * {num_perm}),
pe AS (SELECT a AS s, b AS t FROM pairs
       UNION ALL SELECT b, a FROM pairs),
members AS (SELECT DISTINCT s AS v FROM pe),
cc AS (
  SELECT v, v AS l FROM members
  UNION
  SELECT pe.t, cc.l FROM cc JOIN pe ON pe.s = cc.v WHERE cc.l < pe.t
)
SELECT v AS doc_id, min(l) AS dup_group FROM cc GROUP BY v ORDER BY doc_id"""


def jaccard_pairs_sql(*, fp_k: int = 5, n: int = 3,
                      threshold: float = 0.5,
                      max_bucket: int = 500) -> str:
    """Replay of data.dedup.fingerprint_jaccard_pairs: winnowing-
    fingerprint buckets (row_number-capped like the Python max_bucket
    guard) → candidate pairs → exact character n-gram Jaccard ≥
    threshold. Python rounds via round_half_away, matching DuckDB's
    half-away round()."""
    return f"""
WITH {token_hash_ctes()},
{_windows_cte(fp_k)},
fp AS MATERIALIZED (
  SELECT doc_id, {wrap_int64('list_min(wins)')} AS fp,
         row_number() OVER (PARTITION BY {wrap_int64('list_min(wins)')}
                            ORDER BY doc_id) AS rn
  FROM w QUALIFY rn <= {max_bucket}),
g AS MATERIALIZED (
  SELECT doc_id,
    list_distinct(list_transform(
      range(1, greatest(length(text) - {n - 1}, 1) + 1),
      i -> substr(text, i, {n}))) AS gs
  FROM documents),
cand AS (SELECT x.doc_id AS a, y.doc_id AS b
         FROM fp x JOIN fp y ON x.fp = y.fp AND x.doc_id < y.doc_id),
j AS (SELECT cand.a, cand.b,
        len(list_intersect(ga.gs, gb.gs))
          / greatest(1, len(list_distinct(list_concat(ga.gs, gb.gs))))
          AS jac
      FROM cand JOIN g ga ON ga.doc_id = cand.a
                JOIN g gb ON gb.doc_id = cand.b)
SELECT a, b, round(jac, 6) AS jaccard FROM j
WHERE jac >= {threshold} ORDER BY a, b"""


def fmix_u64_sql(x: str) -> str:
    """Inline SQL fmix64 of a UBIGINT expression (xorshift-multiply;
    the expression is substituted 8x — keep ``x`` compact)."""
    s1 = f"xor(({x}), ({x}) >> 31)"
    s2 = f"((({s1})::HUGEINT * {C1}) % {M64})::UBIGINT"
    s3 = f"xor(({s2}), ({s2}) >> 29)"
    s4 = f"((({s3})::HUGEINT * {C2}) % {M64})::UBIGINT"
    return f"xor(({s4}), ({s4}) >> 32)"


def walk_hash_sql(cand: str, pid: str, hop: int, seed: int) -> str:
    """SQL twin of data/hashing.walk_hash (sampling_path successor
    score): fmix64((cand·B + pid·C1 + hop·C2 + seed) mod 2^64)."""
    combine = (f"((({cand})::HUGEINT * {B}) % {M64}"
               f" + (({pid})::HUGEINT * {C1}) % {M64}"
               f" + ({hop}::HUGEINT * {C2}) % {M64}"
               f" + {seed}) % {M64}")
    return fmix_u64_sql(f"({combine})::UBIGINT")


def langid_sql() -> str:
    """Stopword-vote language id: per-language token-membership counts,
    winner = alphabetically-first language with the strictly maximal
    count (matching the Python iteration order), 'unknown' when all 0."""
    langs = sorted(_LEXICONS)
    counts = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in sorted(_LEXICONS[lang]))
        counts.append(
            f"len(list_filter(toks, x -> list_contains([{words}], x))) "
            f"AS c_{lang}")
    gmax = "greatest(" + ", ".join(f"c_{lg}" for lg in langs) + ")"
    cases = "\n    ".join(
        f"WHEN c_{lg} = {gmax} THEN '{lg}'" for lg in langs)
    return f"""
WITH t0 AS (SELECT doc_id,
  list_transform(regexp_extract_all(text,
      '[a-zA-ZäöüéèêàçñÄÖÜ]+'), x -> lower(x)) AS toks
  FROM documents),
c AS (SELECT doc_id, {', '.join(counts)} FROM t0)
SELECT doc_id,
  CASE WHEN {gmax} = 0 THEN 'unknown'
    {cases}
  END AS lang_pred
FROM c ORDER BY doc_id"""


def curation_sql(lang: str = "en", min_quality: float = 0.1) -> str:
    """Composed curation twin (pipelines/curation.py): language gate +
    quality gate + exact dedup (min doc_id per identical text among
    the survivors) + token count, all in one statement. Component
    expressions are copied verbatim from langid_sql and the
    doc_quality / doc_token_count twins so the fused Ray kernel and
    this SQL share every rounding decision."""
    langs = sorted(_LEXICONS)
    counts = []
    for lg in langs:
        words = ", ".join(f"'{w}'" for w in sorted(_LEXICONS[lg]))
        counts.append(
            f"len(list_filter(toks, x -> list_contains([{words}], x))) "
            f"AS c_{lg}")
    gmax = "greatest(" + ", ".join(f"c_{lg}" for lg in langs) + ")"
    cases = "\n    ".join(
        f"WHEN c_{lg} = {gmax} THEN '{lg}'" for lg in langs)
    return rf"""
WITH t0 AS (SELECT doc_id, text,
  list_transform(regexp_extract_all(text,
      '[a-zA-ZäöüéèêàçñÄÖÜ]+'), x -> lower(x)) AS toks
  FROM documents),
c AS (SELECT doc_id, text, {', '.join(counts)} FROM t0),
s AS (SELECT doc_id, text,
  CASE WHEN {gmax} = 0 THEN 'unknown'
    {cases}
  END AS lang_pred,
  round(
    round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
          / greatest(length(text), 1), 6)
    * least(1.0, len(list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> ''))::DOUBLE / 100.0), 6)
    AS quality,
  len(list_filter(string_split_regex(text, '\s+'),
                  x -> x <> ''))::BIGINT AS n_tokens
  FROM c),
f AS (SELECT * FROM s
      WHERE lang_pred = '{lang}' AND quality >= {min_quality}),
k AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY text)
SELECT f.doc_id, f.lang_pred, f.quality, f.n_tokens
FROM f JOIN k ON k.doc_id = f.doc_id ORDER BY f.doc_id"""


def _row_hash_sql(seed: int, key: str = "doc_id") -> str:
    """SQL twin of data/curate._row_hash: fmix64(key·B + seed)."""
    return fmix_u64_sql(
        f"(({key}::HUGEINT * {B} + {seed}) % {M64})::UBIGINT")


def hash_sample_sql(rate: float, seed: int = 1) -> str:
    thresh = int(round(rate * 1_000_000))
    return f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE ({_row_hash_sql(seed)}) % 1000000 < {thresh} ORDER BY doc_id"""


def split_assign_sql(splits=None, seed: int = 7) -> str:
    """Twin of data/curate.split_assign (same left-to-right bucket
    carving from fmix64(doc_id·B+seed) % 10000)."""
    if splits is None:
        splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    h = _row_hash_sql(seed)
    bound, whens = 0, []
    for name, w in splits[:-1]:
        bound += int(round(w * 10_000))
        whens.append(f"WHEN ({h}) % 10000 < {bound} THEN '{name}'")
    whens.append(f"ELSE '{splits[-1][0]}'")
    return f"""
SELECT doc_id, CASE {' '.join(whens)} END AS split
FROM documents ORDER BY doc_id"""


NORMALIZE_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS norm_text
FROM documents ORDER BY doc_id"""


def pii_scrub_sql(email_pat: str, num_pat: str) -> str:
    """Twin of data/curate.pii_scrub — identical RE2 patterns, email
    pass first, then long-number pass over the email-scrubbed text."""
    return f"""
WITH a AS (SELECT doc_id, text,
    len(regexp_extract_all(text, '{email_pat}'))::BIGINT AS n_emails,
    regexp_replace(text, '{email_pat}', '<EMAIL>', 'g') AS t1
    FROM documents)
SELECT doc_id,
    regexp_replace(t1, '{num_pat}', '<NUM>', 'g') AS scrubbed,
    n_emails,
    len(regexp_extract_all(t1, '{num_pat}'))::BIGINT AS n_longnums
FROM a ORDER BY doc_id"""


REPETITION_SQL = r"""
WITH ln AS (SELECT doc_id, unnest(list_filter(string_split(text, chr(10)),
                x -> x <> '')) AS line FROM documents),
la AS (SELECT doc_id, count(*) AS nl, count(DISTINCT line) AS nu
       FROM ln GROUP BY doc_id),
tk AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
                x -> x <> '')) AS tok FROM documents),
tc AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
ta AS (SELECT doc_id, max(c) AS mx, sum(c) AS s FROM tc GROUP BY doc_id)
SELECT d.doc_id,
  COALESCE(la.nl, 0)::BIGINT AS n_lines,
  round(CASE WHEN COALESCE(la.nl, 0) > 0
        THEN 1.0 - la.nu::DOUBLE / la.nl ELSE 0 END, 6) AS dup_line_frac,
  round(CASE WHEN COALESCE(ta.s, 0) > 0
        THEN ta.mx::DOUBLE / ta.s ELSE 0 END, 6) AS top_token_frac
FROM documents d LEFT JOIN la ON la.doc_id = d.doc_id
LEFT JOIN ta ON ta.doc_id = d.doc_id ORDER BY d.doc_id"""


def hll_registers_sql(p: int = 10, source: str = "documents") -> str:
    """Bit-exact twin of data/sketch.hll_register_rows: the full dense
    (reg_idx, reg) HyperLogLog register table over the corpus's
    whitespace-token hashes. idx = low p bits; rho = trailing zeros of
    the remaining 64-p bits + 1 (``bit_count((w & -w) - 1)`` — exact
    integer arithmetic, no floats), saturating at 64-p+1 when they are
    all zero. ``(h >> p)::BIGINT`` is safe: the shifted value is below
    2^(64-p) < 2^63 for any p ≥ 2."""
    m, cap = 1 << p, 64 - p + 1
    w = f"((h >> {p})::BIGINT)"
    return f"""
WITH {token_hash_ctes(source=source)},
tok AS (SELECT unnest(h) AS h FROM th),
rr AS (SELECT (h % {m})::BIGINT AS idx,
       CASE WHEN (h >> {p}) = 0 THEN {cap}
            ELSE least(bit_count(({w} & (-{w})) - 1) + 1, {cap})
       END AS rho
       FROM tok),
regs AS (SELECT idx, max(rho) AS reg FROM rr GROUP BY idx),
grid AS (SELECT unnest(range({m})) AS reg_idx)
SELECT grid.reg_idx::BIGINT AS reg_idx,
       coalesce(regs.reg, 0)::BIGINT AS reg
FROM grid LEFT JOIN regs ON regs.idx = grid.reg_idx
ORDER BY reg_idx"""


def hll_registers_by_key_sql(p: int = 10, key: str = "source",
                             source: str = "documents") -> str:
    """Per-group twin of hll_registers_sql: one dense register table
    per distinct value of ``key`` (the token_hash_ctes doc_id slot
    carries the group key through the hash chain)."""
    m, cap = 1 << p, 64 - p + 1
    w = f"((h >> {p})::BIGINT)"
    return f"""
WITH {token_hash_ctes(source=source, key=key)},
tok AS (SELECT doc_id AS k, unnest(h) AS h FROM th),
rr AS (SELECT k, (h % {m})::BIGINT AS idx,
       CASE WHEN (h >> {p}) = 0 THEN {cap}
            ELSE least(bit_count(({w} & (-{w})) - 1) + 1, {cap})
       END AS rho
       FROM tok),
regs AS (SELECT k, idx, max(rho) AS reg FROM rr GROUP BY k, idx),
keys AS (SELECT DISTINCT {key} AS k FROM {source}),
grid AS (SELECT k, reg_idx FROM keys, unnest(range({m})) t(reg_idx))
SELECT grid.k AS {key}, grid.reg_idx::BIGINT AS reg_idx,
       coalesce(regs.reg, 0)::BIGINT AS reg
FROM grid LEFT JOIN regs
  ON regs.k = grid.k AND regs.idx = grid.reg_idx
ORDER BY {key}, reg_idx"""


def bloom_probe_sql(k: int = 3, m_bits: int = 1 << 16,
                    bench_mod: int = 20,
                    source: str = "documents") -> str:
    """Bit-exact twin of data/sketch.bloom_build + bloom_probe with
    the filter built over the ``doc_id % bench_mod == 0`` carve (the
    decontaminate_sql convention): a token is a member iff ALL k of
    its probe positions appear in the distinct set-bit positions of
    the carve's tokens — identical semantics to the bit array,
    INCLUDING false positives. Probe i's position is
    fmix64((h + i·C2) mod 2^64) mod m_bits (sketch._BLOOM_SALT == C2)."""
    def pos(i: int) -> str:
        x = f"((h::HUGEINT + {i}::HUGEINT * {C2}) % {M64})::UBIGINT"
        return f"({fmix_u64_sql(x)} % {m_bits})::BIGINT"

    set_union = "\nUNION\n".join(
        f"SELECT {pos(i)} AS p FROM tok WHERE doc_id % {bench_mod} = 0"
        for i in range(k))
    member = " AND ".join(
        f"({pos(i)} IN (SELECT p FROM pos))" for i in range(k))
    return f"""
WITH {token_hash_ctes(source=source)},
tok AS (SELECT doc_id, unnest(h) AS h FROM th),
pos AS ({set_union}),
probed AS (SELECT doc_id, ({member})::BIGINT AS hit FROM tok),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
               sum(hit)::BIGINT AS n_hits FROM probed GROUP BY doc_id)
SELECT d.doc_id, COALESCE(agg.n_tokens, 0)::BIGINT AS n_tokens,
       COALESCE(agg.n_hits, 0)::BIGINT AS n_hits
FROM {source} d LEFT JOIN agg ON agg.doc_id = d.doc_id
ORDER BY d.doc_id"""


def cms_rows_sql(d: int = 4, w: int = 1024,
                 source: str = "documents") -> str:
    """Bit-exact twin of data/sketch.cms_rows: the dense (row_idx,
    col_idx, cnt) count-min table over the corpus's whitespace-token
    hashes. Row r's column is fmix64((h + r·C1) mod 2^64) mod w — the
    same rehash family as the Python side (sketch._CMS_SALT == C1)."""
    branches = []
    for r in range(d):
        x = f"((h::HUGEINT + {r}::HUGEINT * {C1}) % {M64})::UBIGINT"
        branches.append(
            f"SELECT {r}::BIGINT AS row_idx, "
            f"({fmix_u64_sql(x)} % {w})::BIGINT AS col_idx FROM tok")
    un = "\nUNION ALL\n".join(branches)
    return f"""
WITH {token_hash_ctes(source=source)},
tok AS (SELECT unnest(h) AS h FROM th),
hits AS ({un}),
cnts AS (SELECT row_idx, col_idx, count(*)::BIGINT AS cnt
         FROM hits GROUP BY row_idx, col_idx),
grid AS (SELECT r AS row_idx, c AS col_idx
         FROM unnest(range({d})) t1(r), unnest(range({w})) t2(c))
SELECT grid.row_idx::BIGINT AS row_idx, grid.col_idx::BIGINT AS col_idx,
       coalesce(cnts.cnt, 0)::BIGINT AS cnt
FROM grid LEFT JOIN cnts
  ON cnts.row_idx = grid.row_idx AND cnts.col_idx = grid.col_idx
ORDER BY row_idx, col_idx"""


def vocab_topk_sql(k: int, token_pat: str) -> str:
    return f"""
SELECT tok AS token, count(*)::BIGINT AS cnt FROM (
  SELECT unnest(regexp_extract_all(lower(text), '{token_pat}')) AS tok
  FROM documents)
GROUP BY tok ORDER BY cnt DESC, token LIMIT {k}"""


def pack_sequences_sql(budget: int) -> str:
    """Twin of data/curate.pack_sequences: seq_id = floor(exclusive
    running token total / budget) in doc_id order."""
    return rf"""
WITH n AS (SELECT doc_id,
    len(list_filter(string_split_regex(text, '\s+'),
        x -> x <> ''))::BIGINT AS n_tokens FROM documents),
c AS (SELECT doc_id, n_tokens,
    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      - n_tokens AS cum FROM n)
SELECT doc_id, n_tokens, (cum // {budget})::BIGINT AS seq_id
FROM c ORDER BY doc_id"""


def decontaminate_sql(n: int = 8, bench_mod: int = 20) -> str:
    """Twin of data/curate.decontaminate with the benchmark defined as
    docs where doc_id % bench_mod == 0; window hashes reuse the shared
    token-hash CTEs (min(k, len) windows, empty docs excluded)."""
    return f"""
WITH {token_hash_ctes()},{_windows_cte(n)},
bw AS (SELECT DISTINCT unnest(wins) AS h FROM w
       WHERE doc_id % {bench_mod} = 0),
ex AS (SELECT doc_id, unnest(wins) AS h FROM w),
hits AS (SELECT ex.doc_id, count(*) AS c FROM ex
         JOIN bw ON bw.h = ex.h WHERE ex.h <> 0 AND bw.h <> 0
         GROUP BY ex.doc_id)
SELECT d.doc_id, COALESCE(hits.c, 0)::BIGINT AS n_hits,
       (COALESCE(hits.c, 0) > 0)::BIGINT AS contaminated
FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id
ORDER BY d.doc_id"""


def span_dedup_sql(k: int = 8) -> str:
    """Replay of data/dedup.duplicated_spans: distinct per-doc k-token
    window hashes (the _windows_cte semantics — short docs one window,
    empty docs the [0] window); a span is duplicated iff its hash is
    held by >= 2 distinct documents."""
    return f"""
WITH {token_hash_ctes()},
{_windows_cte(k)},
wd AS (SELECT DISTINCT doc_id, wh
       FROM (SELECT doc_id, unnest(wins) AS wh FROM w)),
d AS (SELECT wh FROM wd GROUP BY wh HAVING count(*) >= 2)
SELECT wd.doc_id,
       count(*)::BIGINT AS spans,
       coalesce(sum(CASE WHEN d.wh IS NOT NULL THEN 1 ELSE 0 END),
                0)::BIGINT AS dup_spans
FROM wd LEFT JOIN d ON wd.wh = d.wh
GROUP BY wd.doc_id ORDER BY wd.doc_id"""


def domain_mixture_sql(rates: dict, default_rate: float = 1.0,
                       seed: int = 5) -> str:
    """Twin of data/curate.domain_mixture over documents(source)."""
    h = _row_hash_sql(seed)
    whens = " ".join(
        f"WHEN '{d}' THEN {min(int(round(r * 1_000_000)), 1_000_000)}"
        for d, r in rates.items())
    dflt = min(int(round(default_rate * 1_000_000)), 1_000_000)
    case = f"(CASE source {whens} ELSE {dflt} END)" if rates else str(dflt)
    return f"""
SELECT doc_id, source FROM documents
WHERE ({h}) % 1000000 < {case}
ORDER BY doc_id"""


def training_order_sql(seed: int = 11) -> str:
    """Twin of data/curate.training_order: the stamped two's-complement
    ord column (the sort key itself is the result — equal values, hence
    equal order, on both sides)."""
    h = wrap_int64(f"({_row_hash_sql(seed)})")
    return f"""
SELECT doc_id, {h} AS ord FROM documents ORDER BY ord"""


def tfidf_sql(dim: int = 1024) -> str:
    """Twin of data/text.tfidf_rows: slot = fmix64(poly(token)) % dim
    over the shared token-hash CTEs; tf per (doc, slot); smooth idf
    ln((N+1)/(df+1)) + 1; tfidf rounded half-away at 6 dp (DuckDB
    round())."""
    return f"""
WITH {token_hash_ctes()},
ex AS (SELECT doc_id, unnest(h) AS hh FROM th),
tf AS (SELECT doc_id, (hh % {dim})::BIGINT AS slot,
              count(*)::BIGINT AS tf
       FROM ex GROUP BY 1, 2),
dfc AS (SELECT slot, count(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS c FROM documents)
SELECT tf.doc_id, tf.slot, tf.tf,
       round(tf.tf * (ln((n.c + 1) / (dfc.df + 1)) + 1), 6) AS tfidf
FROM tf JOIN dfc USING (slot) CROSS JOIN n
ORDER BY doc_id, slot"""


def chunk_text_sql(size: int = 512, overlap: int = 64) -> str:
    """Twin of data/curate.chunk_text: chunk i exists iff i*step <
    length(text) (codepoints — DuckDB length/substr match Python
    slicing), pos is 1-based."""
    step = size - overlap
    return f"""
WITH x AS (
  SELECT doc_id,
         unnest(generate_series(0,
             CAST(ceil(length(text)::DOUBLE / {step}) AS BIGINT) - 1))
           AS chunk_id,
         text
  FROM documents WHERE length(text) > 0)
SELECT doc_id, chunk_id, (chunk_id * {step} + 1)::BIGINT AS pos,
       substr(text, (chunk_id * {step} + 1)::INT, {size}) AS chunk
FROM x ORDER BY doc_id, chunk_id"""


def bigram_topk_sql(k: int, token_pat: str) -> str:
    """Twin of data/curate.bigram_topk (same RE2 tokenizer as
    vocab_topk_sql)."""
    return f"""
SELECT bigram, count(*)::BIGINT AS cnt FROM (
  SELECT unnest(list_transform(generate_series(1, len(l) - 1),
                               i -> l[i] || ' ' || l[i+1])) AS bigram
  FROM (SELECT regexp_extract_all(lower(text), '{token_pat}') AS l
        FROM documents))
GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT {k}"""


def _kmeans_ctes(k: int, iters: int, dim: int) -> str:
    """Shared kmeans CTE chain (kmeans_sql / semdedup_sql): ends with
    ``afin AS (vec_id, cid)`` — the final assignment."""
    ctes = [f"""c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         embedding::DOUBLE[] AS c
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY vec_id LIMIT {k}))"""]
    prev = "c0"
    for it in range(1, iters):
        ctes.append(f"""d{it} AS (
  SELECT e.vec_id, c.cid,
         round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS dd
  FROM embeddings e CROSS JOIN {prev} c),
a{it} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) rn
    FROM d{it}) WHERE rn = 1),
m{it} AS (
  SELECT a.cid, g.i, avg(e.embedding[g.i]::DOUBLE) AS v
  FROM a{it} a JOIN embeddings e USING (vec_id),
       generate_series(1, {dim}) g(i)
  GROUP BY a.cid, g.i),
c{it} AS (
  SELECT p.cid, CASE WHEN count(m.i) = 0 THEN p.c
                ELSE list(m.v ORDER BY m.i) END AS c
  FROM {prev} p LEFT JOIN m{it} m ON m.cid = p.cid
  GROUP BY p.cid, p.c)""")
        prev = f"c{it}"
    ctes.append(f"""dfin AS (
  SELECT e.vec_id, c.cid,
         round(list_distance(e.embedding::DOUBLE[], c.c), 6) AS dd
  FROM embeddings e CROSS JOIN {prev} c),
afin AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) rn
    FROM dfin) WHERE rn = 1)""")
    return ",".join(ctes)


def kmeans_sql(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """Unrolled twin of data/similarity.kmeans_assign: init = vectors
    of the k smallest vec_ids (cid = rank); per iteration assignment =
    argmin round(list_distance, 6) with ties to the smallest cid (the
    Python side's rounded-argmin protocol); empty clusters keep the
    previous centroid; centroids are double-precision means."""
    return f"""
WITH {_kmeans_ctes(k, iters, dim)}
SELECT vec_id, cid::BIGINT AS cluster FROM afin ORDER BY vec_id"""


def semdedup_sql(k: int = 8, iters: int = 2, dim: int = 64,
                 threshold: float = 0.3) -> str:
    """Twin of data/similarity.semantic_dedup (SemDeDup,
    arXiv:2303.09540): kmeans assignment (shared CTEs), in-cluster
    pairs with rounded-6dp cosine >= threshold, keep = NOT the larger
    id of any such pair."""
    return f"""
WITH {_kmeans_ctes(k, iters, dim)},
ev AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS emb, a.cid
       FROM embeddings e JOIN afin a USING (vec_id)),
rm AS (SELECT DISTINCT b.vec_id AS v
       FROM ev a JOIN ev b
         ON a.cid = b.cid AND a.vec_id < b.vec_id
       WHERE round(list_cosine_similarity(a.emb, b.emb), 6)
             >= {threshold})
SELECT ev.vec_id, ev.cid::BIGINT AS cluster,
       (rm.v IS NULL) AS keep
FROM ev LEFT JOIN rm ON rm.v = ev.vec_id
ORDER BY ev.vec_id"""


def funnel_sql(steps, horizon_hours: int = 72) -> str:
    """Twin of data/temporal.funnel: chained min-join CTEs, one per
    step; steps_completed = deepest CTE the key reaches."""
    esc = [s.replace("'", "''") for s in steps]
    ctes = [f"""s0 AS (
  SELECT user_id, min(ts) AS t0, min(ts) AS tp FROM events
  WHERE event_type = '{esc[0]}' GROUP BY user_id)"""]
    for i, s in enumerate(esc[1:], start=1):
        ctes.append(f"""s{i} AS (
  SELECT e.user_id, s{i-1}.t0 AS t0, min(e.ts) AS tp
  FROM events e JOIN s{i-1} ON s{i-1}.user_id = e.user_id
  WHERE e.event_type = '{s}' AND e.ts > s{i-1}.tp
    AND e.ts <= s{i-1}.t0 + INTERVAL {horizon_hours} HOUR
  GROUP BY e.user_id, s{i-1}.t0)""")
    n = len(esc)
    case = "CASE " + " ".join(
        f"WHEN s{i}.user_id IS NOT NULL THEN {i + 1}"
        for i in range(n - 1, -1, -1)) + " ELSE 0 END"
    joins = " ".join(
        f"LEFT JOIN s{i} ON s{i}.user_id = u.user_id" for i in range(n))
    return f"""
WITH {','.join(ctes)},
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id, ({case})::BIGINT AS steps_completed
FROM u {joins} ORDER BY u.user_id"""


def cluster_sample_sql(k: int = 8, iters: int = 2, m: int = 10,
                       seed: int = 3, dim: int = 64) -> str:
    """Twin of data/similarity.cluster_sample: the kmeans_sql
    assignment as a nested CTE + the shared fmix64 row coin + a
    row_number per-cluster trim."""
    coin = f"({_row_hash_sql(seed, 'vec_id')}) % 1000000"
    return f"""
WITH asg AS ({kmeans_sql(k, iters, dim)})
SELECT cluster, coin, vec_id, rn FROM (
  SELECT cluster, vec_id, ({coin})::BIGINT AS coin,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY ({coin}), vec_id) AS rn
  FROM asg)
WHERE rn <= {m} ORDER BY cluster, rn"""


def quality_classifier_sql(weights: dict = None) -> str:
    """Twin of data/text.quality_classifier (same RE2 counts, same
    double-precision logistic)."""
    w = {"bias": -3.8, "log_tokens": 0.5, "alpha_ratio": 2.0,
         "len_sat": 1.0, "digit_ratio": -3.0, **(weights or {})}
    logit = (f"({w['bias']}) "
             f"+ ({w['log_tokens']}) * ln(1.0 + nt) "
             f"+ ({w['alpha_ratio']}) * (na / denom) "
             f"+ ({w['len_sat']}) * least(1.0, nt / 100.0) "
             f"+ ({w['digit_ratio']}) * (nd / denom)")
    return rf"""
WITH f AS (
  SELECT doc_id,
         len(regexp_extract_all(COALESCE(text, ''), '\S+'))::DOUBLE AS nt,
         len(regexp_extract_all(COALESCE(text, ''),
                                '[a-zA-Z]'))::DOUBLE AS na,
         len(regexp_extract_all(COALESCE(text, ''), '[0-9]'))::DOUBLE AS nd,
         greatest(length(COALESCE(text, '')), 1)::DOUBLE AS denom
  FROM documents)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-({logit}))), 6) AS score,
       (1.0 / (1.0 + exp(-({logit}))) >= 0.5)::BIGINT AS keep
FROM f ORDER BY doc_id"""


def retention_sql(unit_days: int = 7) -> str:
    """Twin of data/temporal.retention: period = epoch-day //
    unit_days (date_diff from the epoch matches numpy's
    datetime64[D] truncation for post-epoch timestamps)."""
    per = (f"(date_diff('day', DATE '1970-01-01', ts::DATE)"
           f" // {unit_days})")
    return f"""
WITH ev AS (SELECT user_id, {per}::BIGINT AS per FROM events),
f AS (SELECT user_id, min(per) AS cohort FROM ev GROUP BY user_id),
d AS (SELECT DISTINCT ev.user_id, f.cohort,
             (ev.per - f.cohort) AS offset_p
      FROM ev JOIN f ON f.user_id = ev.user_id)
SELECT cohort, offset_p, count(*)::BIGINT AS n_users
FROM d GROUP BY cohort, offset_p ORDER BY cohort, offset_p"""


def rolling_window_sql(window_days: int = 7) -> str:
    """Twin of data/temporal.rolling_window: the SQL RANGE frame with
    the e6-integer-scaled exact sum (both sides round the same IEEE
    product value*1e6 half-away before aggregating)."""
    return f"""
SELECT event_id, user_id, ts,
  count(*) OVER w AS w_count,
  CAST(sum(CAST(round(value * 1000000) AS BIGINT)) OVER w
       AS BIGINT) AS w_sum_e6
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL {window_days} DAY PRECEDING
                       AND CURRENT ROW)
ORDER BY event_id"""


def stratified_split_sql(splits=None, seed: int = 7,
                         group: str = "source") -> str:
    """Twin of data/curate.stratified_split: per-group row_number over
    (fmix64(doc_id·B+seed), doc_id) with ceil(cum_frac·n) rank bounds
    — the SAME IEEE double products as the numpy kernel (cumulative
    fractions embedded at full repr precision)."""
    import numpy as np
    if splits is None:
        splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    names = [n for n, _ in splits]
    cum = np.cumsum([w for _, w in splits]).astype(np.float64)
    cases = "\n  ".join(
        f"WHEN rn < ceil({float(cum[i])!r} * n) THEN '{names[i]}'"
        for i in range(len(names) - 1))
    return f"""
WITH h AS (SELECT doc_id, {group},
                  ({_row_hash_sql(seed)}) AS hh FROM documents),
r AS (SELECT doc_id, {group},
             row_number() OVER (PARTITION BY {group}
                                ORDER BY hh, doc_id) - 1 AS rn,
             count(*) OVER (PARTITION BY {group}) AS n
      FROM h)
SELECT doc_id, {group}, CASE
  {cases}
  ELSE '{names[-1]}' END AS split
FROM r ORDER BY doc_id"""
