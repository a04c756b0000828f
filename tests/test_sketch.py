"""HyperLogLog sketch: fold/merge algebra, estimator accuracy at high
cardinality (the regime the sf testdata's 31-token vocabulary never
reaches), saturation, and the distributed-aggregate path."""

import numpy as np
import pandas as pd

import ray.data

from graphscope_ray.data.sketch import (
    hll_distinct,
    hll_estimate,
    hll_fold,
    hll_register_rows,
    hll_registers,
)
from graphscope_ray.data.hashing import batch_token_hashes, fmix64


def _uniform_hashes(n: int, seed: int) -> np.ndarray:
    # fmix64 of a counter = high-quality uniform 64-bit stream, and
    # distinct inputs stay distinct (fmix64 is a bijection)
    rng_base = np.arange(n, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
    return fmix64(rng_base)


def test_estimate_accuracy_high_cardinality():
    for p, n in [(10, 50_000), (12, 200_000)]:
        h = _uniform_hashes(n, seed=p)
        est = hll_estimate(hll_fold(h, p))
        se = 1.04 / np.sqrt(1 << p)
        assert abs(est - n) / n < 5 * se, (p, n, est)


def test_fold_merge_associative():
    h = _uniform_hashes(30_000, seed=3)
    whole = hll_fold(h, 10)
    parts = [hll_fold(c, 10) for c in np.array_split(h, 7)]
    merged = parts[0]
    for q in parts[1:]:
        merged = np.maximum(merged, q)
    assert (whole == merged).all()
    # folding into an existing accumulator is the same merge
    acc = hll_fold(h[15_000:], 10, hll_fold(h[:15_000], 10))
    assert (whole == acc).all()


def test_saturation_when_high_bits_zero():
    p = 10
    # h >> p == 0  →  rho saturates at 64 - p + 1
    h = np.array([0, 1, 5, (1 << p) - 1], dtype=np.uint64)
    regs = hll_fold(h, p)
    assert regs.max() == 64 - p + 1
    idx = (h & np.uint64((1 << p) - 1)).astype(int)
    assert (regs[idx] == 64 - p + 1).all()


def test_rho_matches_naive_trailing_zeros():
    p = 10
    rng = np.random.default_rng(5)
    h = rng.integers(0, 2**63, size=2000, dtype=np.int64).astype(np.uint64)
    regs = hll_fold(h, p)
    naive = np.zeros(1 << p, dtype=np.int64)
    for x in h.tolist():
        idx = x & ((1 << p) - 1)
        w = x >> p
        if w == 0:
            rho = 64 - p + 1
        else:
            rho = 1
            while (w & 1) == 0:
                rho += 1
                w >>= 1
        naive[idx] = max(naive[idx], rho)
    assert (regs.astype(np.int64) == naive).all()


def test_dataset_path_equals_single_fold(ray_session):
    texts = [f"tok{i} tok{i % 7} shared word" for i in range(300)] + ["", "   "]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = ray.data.from_pandas([df.iloc[:100], df.iloc[100:200], df.iloc[200:]])
    regs = hll_registers(ds, p=10)
    _, th = batch_token_hashes(texts)
    want = hll_fold(th, 10)
    assert (regs == want).all()
    rows = hll_register_rows(ds, p=10)
    assert list(rows.columns) == ["reg_idx", "reg"]
    assert len(rows) == 1024 and (rows["reg"].to_numpy() == want.astype(np.int64)).all()
    # ~304 distinct tokens (300 unique + 7 + 2 shared); estimate close
    est = hll_distinct(ds, p=10)
    exact = len(np.unique(th))
    assert abs(est - exact) / exact < 0.2


def test_null_text_ignored(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b c", None, "a"]})
    regs = hll_registers(ray.data.from_pandas(df), p=10)
    _, th = batch_token_hashes(["a b c", "", "a"])
    assert (regs == hll_fold(th, 10)).all()


def test_cms_overcounts_never_undercounts():
    from graphscope_ray.data.sketch import cms_fold, cms_lookup

    # tiny width forces collisions: estimates must stay >= truth and
    # at least one must strictly overcount
    h = _uniform_hashes(5_000, seed=11)
    stream = np.repeat(h, np.arange(len(h)) % 5 + 1)  # skewed counts
    c = cms_fold(stream, d=4, w=64)
    uniq, true_cnt = np.unique(stream, return_counts=True)
    est = cms_lookup(c, uniq)
    assert (est >= true_cnt).all()
    assert (est > true_cnt).any()
    # total mass per row is exact
    assert (c.sum(axis=1) == len(stream)).all()


def test_cms_merge_is_sum():
    from graphscope_ray.data.sketch import cms_fold

    h = _uniform_hashes(8_000, seed=13)
    whole = cms_fold(h, d=4, w=256)
    parts = [cms_fold(c, d=4, w=256) for c in np.array_split(h, 5)]
    assert (whole == sum(parts)).all()
    acc = cms_fold(h[4_000:], 4, 256, cms_fold(h[:4_000], 4, 256))
    assert (whole == acc).all()


def test_cms_dataset_path_equals_single_fold(ray_session):
    from graphscope_ray.data.sketch import cms_counts, cms_fold, cms_rows

    texts = [f"w{i % 50} common" for i in range(400)] + [None, ""]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = ray.data.from_pandas([df.iloc[:150], df.iloc[150:]])
    c = cms_counts(ds, d=4, w=512)
    _, th = batch_token_hashes([t or "" for t in texts])
    want = cms_fold(th, 4, 512)
    assert (c == want).all()
    rows = cms_rows(ds, d=4, w=512)
    assert list(rows.columns) == ["row_idx", "col_idx", "cnt"]
    assert len(rows) == 4 * 512
    assert (rows["cnt"].to_numpy() == want.reshape(-1)).all()


def test_hll_by_key_matches_per_group_fold(ray_session):
    from graphscope_ray.data.sketch import hll_register_rows_by_key

    texts = {"a": ["x y z", "x q"], "b": ["m n", "m n o p"], "c": [""]}
    recs = [(k, t) for k, ts in texts.items() for t in ts]
    df = pd.DataFrame({"source": [r[0] for r in recs],
                       "text": [r[1] for r in recs]})
    rows = hll_register_rows_by_key(ray.data.from_pandas(df),
                                    key="source", p=10)
    assert len(rows) == 3 * 1024
    for k, ts in texts.items():
        _, th = batch_token_hashes(ts)
        want = hll_fold(th, 10).astype(np.int64)
        got = rows[rows["source"] == k].sort_values("reg_idx")["reg"].to_numpy()
        assert (got == want).all(), k


def test_bloom_no_false_negatives_and_fp_rate():
    from graphscope_ray.data.sketch import bloom_contains, bloom_fold

    members = _uniform_hashes(2_000, seed=21)
    others = _uniform_hashes(20_000, seed=22)[5_000:]  # disjoint w.h.p.
    others = others[~np.isin(others, members)]
    k, m = 5, 1 << 15
    words = bloom_fold(members, k, m)
    assert bloom_contains(words, members, k=k, m_bits=m).all()
    fp = bloom_contains(words, others, k=k, m_bits=m).mean()
    # theoretical fp ≈ (1 - e^{-kn/m})^k ≈ 0.6% here; allow 4x
    assert fp < 0.025, fp


def test_bloom_fold_merge_is_or():
    from graphscope_ray.data.sketch import bloom_fold

    h = _uniform_hashes(3_000, seed=23)
    whole = bloom_fold(h, 3, 1 << 12)
    parts = [bloom_fold(c, 3, 1 << 12) for c in np.array_split(h, 4)]
    merged = parts[0]
    for q in parts[1:]:
        merged = merged | q
    assert (whole == merged).all()


def test_bloom_dataset_build_and_probe(ray_session):
    from graphscope_ray.data.sketch import (bloom_build, bloom_contains,
                                            bloom_fold, bloom_probe)

    bench_texts = ["secret alpha beta", "gamma delta"]
    clean_texts = [f"clean{i} words only" for i in range(50)]
    dirty_texts = ["alpha gamma mix", "secret secret"]
    texts = bench_texts + clean_texts + dirty_texts
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = ray.data.from_pandas([df.iloc[:20], df.iloc[20:]])

    bench = ray.data.from_pandas(df.iloc[:2])
    k, m = 3, 1 << 14
    words = bloom_build(bench, k=k, m_bits=m)
    _, bh = batch_token_hashes(bench_texts)
    assert (words == bloom_fold(bh, k, m)).all()

    out = (bloom_probe(ds, words, k=k, m_bits=m).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert (out.loc[:1, "n_hits"].to_numpy()
            == out.loc[:1, "n_tokens"].to_numpy()).all()  # bench docs all-hit
    dirty = out.iloc[-2:]
    assert (dirty["n_hits"].to_numpy() == [2, 2]).all()
    # clean docs: unique tokens, tiny fp chance at this m; allow <= 1 hit
    clean = out.iloc[2:-2]
    assert (clean["n_hits"].to_numpy() <= 1).all()
    assert (out["n_tokens"].to_numpy() >= out["n_hits"].to_numpy()).all()
