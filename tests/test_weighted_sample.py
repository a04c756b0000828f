"""Efraimidis-Spirakis weighted sampling: exact top-k-by-exponential-key
vs a numpy replay, determinism across block layouts, and the
weight-proportional inclusion property."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.data.curate import _row_hash, weighted_sample
from graphscope_ray.util import round_half_away


def _replay(ids: np.ndarray, w: np.ndarray, k: int, seed: int):
    h = _row_hash(ids, seed)
    u = np.maximum((h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53,
                   2.0 ** -53)
    keep = w > 0
    s = round_half_away(np.log(u[keep]) / w[keep], 9)
    ii = ids[keep]
    order = np.lexsort((ii, -s))[:k]
    return set(ii[order].tolist())


def _run(ids, w, k, seed=13, blocks=4):
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "wt": w}))
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = weighted_sample(ds, k, weight_col="wt", seed=seed).to_pandas()
    assert len(out) == min(k, int((np.asarray(w) > 0).sum()))
    assert set(out.columns) == {"doc_id", "wt", "es_key", "rn"}
    return set(out["doc_id"].astype(int))


def test_matches_replay_and_block_invariant():
    rng = np.random.default_rng(3)
    ids = np.arange(500, dtype=np.int64)
    w = rng.integers(1, 5000, 500).astype(np.float64)
    w[::50] = 0.0  # zero-weight rows must never win
    want = _replay(ids, w, 60, 13)
    assert _run(ids, w, 60, blocks=1) == want
    assert _run(ids, w, 60, blocks=7) == want


def test_inclusion_tracks_weight():
    # two strata, weight ratio 50:1 — the heavy stratum must dominate
    ids = np.arange(400, dtype=np.int64)
    w = np.where(ids < 200, 50.0, 1.0)
    got = _run(ids, w, 50, seed=2)
    heavy = sum(1 for i in got if i < 200)
    assert heavy >= 45  # E[heavy] ≈ 49.7 under ES sampling


def test_k_exceeds_population():
    ids = np.arange(10, dtype=np.int64)
    w = np.ones(10)
    assert _run(ids, w, 25) == set(range(10))
