"""duplicated_spans / domain_mixture / training_order: differential
checks against independent pure-Python-int oracles (not the numpy
implementation), DuckDB twins on adversarial texts, and
partitioning-invariance."""

import re

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from graphscope_ray.data.curate import domain_mixture, training_order
from graphscope_ray.data.dedup import duplicated_spans
from graphscope_ray import oracle_sql as osql

M64 = 1 << 64
B = 1099511628211
F = 14695981039346656037
C1 = 0x2545F4914F6CDD1D
C2 = 0x5851F42D4C957F2D
_WS = re.compile(r"[\t\n\f\r ]+")  # RE2 \s exactly


def _fmix(h: int) -> int:
    h ^= h >> 31
    h = (h * C1) % M64
    h ^= h >> 29
    h = (h * C2) % M64
    return h ^ (h >> 32)


def _spans_of(text: str, k: int) -> set:
    """Independent int-arithmetic replay of the window semantics."""
    hs = []
    for tok in _WS.split(text):
        if not tok:
            continue
        h = F
        for ch in tok:
            h = (h * B + ord(ch) + 1) % M64
        hs.append(_fmix(h))
    if not hs:
        return {0}
    keff = min(k, len(hs))
    out = set()
    for i in range(len(hs) - keff + 1):
        acc = 0
        for h in hs[i:i + keff]:
            acc = (acc * B + h) % M64
        out.add(acc)
    return out


def _brute(texts, k):
    spans = [_spans_of(t, k) for t in texts]
    from collections import Counter
    holders = Counter()
    for s in spans:
        for h in s:
            holders[h] += 1
    return pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "spans": [len(s) for s in spans],
        "dup_spans": [sum(1 for h in s if holders[h] >= 2) for s in spans],
    })


TEXTS = [
    "",                                   # empty → the 0 window
    "   \t\n  ",                          # whitespace-only → 0 window too
    "a b c",                              # shorter than k → one window
    "a b c",                              # exact duplicate of the above
    "one two three four five six seven eight nine ten",
    "zzz one two three four five six seven eight nine ten yyy",  # shared 8-gram
    "one two three four five six seven EIGHT nine ten",  # breaks the 8-gram
    "w " * 40,                            # one repeated window within a doc
    "unique alpha beta gamma delta epsilon zeta eta theta iota",
]


def test_duplicated_spans_vs_int_oracle():
    k = 8
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(TEXTS), dtype=np.int64),
        "text": TEXTS})).repartition(4)
    got = duplicated_spans(ds, k=k).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _brute(TEXTS, k)
    pd.testing.assert_frame_equal(got[["doc_id", "spans", "dup_spans"]],
                                  want, check_dtype=False)
    # the two empty-token docs share the 0 window → both duplicated
    assert got.loc[0, "dup_spans"] == 1 and got.loc[1, "dup_spans"] == 1
    # the exact-duplicate pair is fully duplicated
    assert got.loc[2, "dup_spans"] == got.loc[2, "spans"] == 1
    # the embedded shared 8-gram fires across docs 4 and 5
    assert got.loc[4, "dup_spans"] >= 1 and got.loc[5, "dup_spans"] >= 1
    # within-doc repetition alone does not count as duplicated
    assert got.loc[7, "dup_spans"] == 0 and got.loc[7, "spans"] == 1
    assert got.loc[8, "dup_spans"] == 0


@pytest.mark.parametrize("k", [1, 3, 8])
@pytest.mark.parametrize("parts", [1, 5])
def test_duplicated_spans_randomized(k, parts):
    rng = np.random.default_rng(k * 10 + parts)
    vocab = [f"t{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 25)))
             for _ in range(60)]
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": texts})).repartition(parts)
    got = duplicated_spans(ds, k=k).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "spans", "dup_spans"]], _brute(texts, k),
        check_dtype=False)


def test_duplicated_spans_duckdb_twin():
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({
        "doc_id": np.arange(len(TEXTS), dtype=np.int64), "text": TEXTS}))
    want = con.execute(osql.span_dedup_sql(k=8)).df()
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(TEXTS), dtype=np.int64), "text": TEXTS}))
    got = duplicated_spans(ds, k=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (got["spans"].to_numpy() == want["spans"].to_numpy()).all()
    assert (got["dup_spans"].to_numpy()
            == want["dup_spans"].to_numpy()).all()


def test_domain_mixture_exact_set_and_clamp():
    n = 400
    doms = np.array(["a", "b", "c", "d"], dtype=object)[
        np.arange(n) % 4]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "source": doms})
    rates = {"a": 0.0, "b": 1.0, "c": 0.5, "zzz": 2.0}
    got = domain_mixture(ray.data.from_pandas(df).repartition(3),
                         rates, default_rate=0.25, seed=9).to_pandas()
    keep = []
    for i, d in zip(df.doc_id, df.source):
        r = {"a": 0, "b": 1_000_000, "c": 500_000}.get(d, 250_000)
        if _fmix((i * B + 9) % M64) % 1_000_000 < r:
            keep.append(i)
    assert sorted(got["doc_id"]) == keep
    assert not (got["source"] == "a").any()          # rate 0 drops all
    assert (got["source"] == "b").sum() == n // 4    # rate 1 keeps all
    # SQL twin agrees
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(osql.domain_mixture_sql(
        rates, default_rate=0.25, seed=9)).df()
    assert sorted(want["doc_id"]) == keep


def test_training_order_is_fmix_sort_and_twin():
    n = 300
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    got = training_order(ray.data.from_pandas(df).repartition(4),
                         seed=13).to_pandas()
    stamps = np.array([_fmix((i * B + 13) % M64) for i in range(n)],
                      dtype=np.uint64)
    want_ids = np.arange(n, dtype=np.int64)[np.argsort(
        stamps.astype(np.int64), kind="stable")]
    assert (got["doc_id"].to_numpy() == want_ids).all()
    assert (np.diff(got["ord"].to_numpy()) >= 0).all()
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(osql.training_order_sql(seed=13)).df()
    assert (want["doc_id"].to_numpy() == got["doc_id"].to_numpy()).all()
    assert (want["ord"].to_numpy() == got["ord"].to_numpy()).all()
