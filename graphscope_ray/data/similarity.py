"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — one numpy matmul per batch against
a broadcast query matrix (``ray.put`` once). Scale path: random-
hyperplane LSH bucketing, exact rerank within candidate buckets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def ann_topk(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    key: str = "vec_id",
    col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k per query → (query_id, vec_id, cosine, rank).

    Per batch: (B×D)·(D×Q) matmul + per-batch partial top-k per query
    (the combiner), then a tiny global merge — only k·Q·#batches rows
    shuffle, never the embeddings."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put(q)

    def block(t: pa.Table) -> pa.Table:
        qm = ray.get(ref)
        ids = t[key].to_numpy()
        m = _normalize(np.stack(t[col].to_numpy(zero_copy_only=False)))
        sims = m @ qm.T  # B × Q
        kk = min(k, len(ids))
        # per-query partial top-k within the batch
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # kk × Q
        qi = np.repeat(np.arange(qm.shape[0]), kk)
        vi = part.T.ravel()
        return pa.table({
            "query_id": pa.array(qi.astype(np.int64)),
            key: pa.array(ids[vi]),
            "cosine": pa.array(sims[vi, qi]),
        })

    partial = emb.select_columns([key, col]).map_batches(
        block, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        from graphscope_ray.util import round_half_away
        g = g.sort_values(["cosine", key], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = round_half_away(g["cosine"].to_numpy(), 6)
        return g

    out = partial.groupby("query_id").map_groups(merge, batch_format="pandas")
    return (out.to_pandas()
            .sort_values(["query_id", "rank"]).reset_index(drop=True))


def ivf_ann_topk(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    key: str = "vec_id",
    col: str = "embedding",
    num_centroids: int = 8,
    nprobe: int = 2,
    centroids: Optional[np.ndarray] = None,
) -> pd.DataFrame:
    """IVF-style approximate cosine top-k: vectors are assigned to
    their nearest centroid (inverted lists); each query probes only its
    ``nprobe`` nearest lists and reranks exactly within them.

    Centroids default to the embeddings of the ``num_centroids``
    smallest ``key`` values — deterministic and SQL-replayable (a real
    deployment trains them offline and passes ``centroids``). Ties
    break toward the lower centroid id; final rank orders by
    6-dp-rounded cosine then ``key`` so the DuckDB oracle replays
    bit-for-bit. Scale shape: one B×K assignment matmul per batch, the
    non-probed vectors never leave their batch, and only k·Q·#batches
    partial-top-k rows shuffle."""
    from graphscope_ray.util import round_half_away

    q = _normalize(np.asarray(queries, dtype=np.float64))
    if centroids is None:
        ctab = (emb.filter(expr=f"{key} < {num_centroids}")
                .take_batch(num_centroids * 2, batch_format="pyarrow"))
        order = np.argsort(ctab[key].to_numpy())
        centroids = np.stack(
            ctab[col].to_numpy(zero_copy_only=False))[order]
    C = _normalize(np.asarray(centroids, dtype=np.float64))
    K = C.shape[0]

    # per-query probe sets: nprobe nearest centroids, ties → lower cid.
    # Assignment/probe similarities are rounded to 6 dp BEFORE the
    # argmax/top-nprobe (here and in the SQL twin) so a near-tie between
    # two centroids can't flip a list assignment between numpy matmul
    # and DuckDB list_cosine_similarity (unrounded decision boundary).
    qc = round_half_away(q @ C.T, 6)   # Q × K
    probe = np.zeros((q.shape[0], K), dtype=bool)
    for qi in range(q.shape[0]):       # Q is small (driver-held queries)
        idx = np.lexsort((np.arange(K), -qc[qi]))[:nprobe]
        probe[qi, idx] = True
    ref = ray.put((C, q, probe))

    def block(t: pa.Table) -> pa.Table:
        C_, qm, pr = ray.get(ref)
        ids = t[key].to_numpy()
        m = _normalize(np.stack(t[col].to_numpy(zero_copy_only=False)))
        assign = np.argmax(round_half_away(m @ C_.T, 6),
                           axis=1)               # first max = lowest cid
        mask = pr[:, assign]                     # Q × B: probed per query
        keep = mask.any(axis=0)
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             key: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        ids, m, mask = ids[keep], m[keep], mask[:, keep]
        sims = m @ qm.T                          # B × Q
        sims[~mask.T] = -np.inf
        kk = min(k, len(ids))
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        qi = np.repeat(np.arange(qm.shape[0]), kk)
        vi = part.T.ravel()
        good = np.isfinite(sims[vi, qi])
        return pa.table({
            "query_id": pa.array(qi[good].astype(np.int64)),
            key: pa.array(ids[vi[good]]),
            "cosine": pa.array(sims[vi[good], qi[good]]),
        })

    partial = emb.select_columns([key, col]).map_batches(
        block, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["cosine"] = round_half_away(g["cosine"].to_numpy(), 6)
        g = g.sort_values(["cosine", key], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = partial.groupby("query_id").map_groups(merge, batch_format="pandas")
    return (out.to_pandas()
            .sort_values(["query_id", "rank"]).reset_index(drop=True))


def lsh_ann_topk(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    key: str = "vec_id",
    col: str = "embedding",
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 42,
    dim: Optional[int] = None,
) -> pd.DataFrame:
    """Approximate cosine top-k: random-hyperplane signatures bucket the
    vectors (num_tables independent tables); queries probe their
    buckets; exact rerank within candidates. Recall < 1 by design —
    the IVF/LSH scale path when brute force won't fit."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    d = dim or q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, d))
    pref = ray.put((planes, q))

    powers = (1 << np.arange(num_planes)).astype(np.int64)

    def sig(mat: np.ndarray, table: int, pl) -> np.ndarray:
        return (((mat @ pl[table].T) > 0).astype(np.int64) @ powers)

    def bucketize(t: pa.Table) -> pa.Table:
        pl, _ = ray.get(pref)
        ids = t[key].to_numpy()
        m = _normalize(np.stack(t[col].to_numpy(zero_copy_only=False)))
        out_id, out_bucket, out_vec = [], [], []
        for table in range(num_tables):
            s = sig(m, table, pl) * num_tables + table
            out_id.append(ids)
            out_bucket.append(s)
            out_vec.append(m)
        return pa.table({
            key: pa.array(np.concatenate(out_id)),
            "bucket": pa.array(np.concatenate(out_bucket)),
            col: pa.array(list(np.concatenate(out_vec))),
        })

    bucketed = emb.select_columns([key, col]).map_batches(
        bucketize, batch_format="pyarrow")

    # query buckets (driver-side: Q × num_tables keys)
    qsigs = set()
    for table in range(num_tables):
        for s in sig(q, table, planes):
            qsigs.add(int(s) * num_tables + table)
    qset_ref = ray.put(np.array(sorted(qsigs), dtype=np.int64))

    def probe(t: pa.Table) -> pa.Table:
        qs = ray.get(qset_ref)
        b = t["bucket"].to_numpy()
        pos = np.clip(np.searchsorted(qs, b), 0, len(qs) - 1)
        return t.filter(pa.array(qs[pos] == b))

    cand_ds = bucketed.map_batches(probe, batch_format="pyarrow")
    # distributed dedup (a vector appears once per matching table) and
    # distributed exact rerank — the r01 driver-side to_pandas rerank
    # is gone; only k·Q·#batches partial-top-k rows ever shuffle.
    # Dedup = one coarse 32-bucket groupby + a vectorized first-per-key
    # kernel (per-distinct-key map_groups dispatch is the slow shape;
    # see pipelines/partgraph.py)

    def add_cb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_cb"] = np.mod(df[key].to_numpy(), 32).astype(np.int64)
        return df

    def first_per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_cb"])
        if not len(g):
            return g
        kv = g[key].to_numpy()
        order = np.argsort(kv, kind="stable")
        ks = kv[order]
        starts = order[np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])]
        return g.iloc[starts].reset_index(drop=True)

    cand_ds = cand_ds.map_batches(add_cb, batch_format="pandas") \
        .groupby("_cb").map_groups(first_per_key, batch_format="pandas")
    if cand_ds.count() == 0:
        return pd.DataFrame(columns=["query_id", key, "cosine", "rank"])
    return ann_topk(cand_ds, queries, k=k, key=key, col=col)
