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


def _sq_dists(m: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Squared Euclidean distances, shape (len(m), len(c)), via the
    ``‖x‖² + ‖c‖² − 2·x@cᵀ`` expansion: one matmul and a batch×k
    result. The naive ``((m[:,None,:] - c[None,:,:])**2).sum(-1)``
    form materializes a batch×k×d float64 temporary — 25 GB at
    batch 4096, k 1024, d 768 — an OOM scale-killer on real worker
    heaps. Clamped at 0 for the cancellation case (x ≈ c)."""
    d2 = (np.einsum("ij,ij->i", m, m)[:, None]
          + np.einsum("ij,ij->i", c, c)[None, :]
          - 2.0 * (m @ c.T))
    return np.maximum(d2, 0.0)


def _merge_topk_per_query(partial: ray.data.Dataset, *, key: str,
                          k: int, score: str,
                          descending: bool) -> pd.DataFrame:
    """Global top-k per query_id over the per-batch partials via the
    house coarse-bucket :func:`~graphscope_ray.data.curate.
    topk_per_group` kernel — a per-block trim then ONE
    hash(query_id)%32 exchange with a vectorized per-bucket rank
    kernel. The previous ``groupby("query_id").map_groups(merge)``
    paid ~0.8–5 ms of dispatch per DISTINCT query (fine at 10–100
    queries, collapse at 10⁵+ query batches). Tie-break: ``key`` asc,
    matching the former merge exactly. → pandas
    (query_id, key, score, rank) sorted by (query_id, rank)."""
    from graphscope_ray.data.curate import topk_per_group

    sel = topk_per_group(partial, group="query_id", score=score,
                         key=key, k=k, descending=descending)
    df = sel.to_pandas().rename(columns={"rn": "rank"})
    df["rank"] = df["rank"].astype(np.int64)
    return (df[["query_id", key, score, "rank"]]
            .sort_values(["query_id", "rank"]).reset_index(drop=True))


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
    # select on the UNROUNDED cosine (key asc tie-break), round for
    # display after — the former merge's exact protocol
    from graphscope_ray.util import round_half_away
    df = _merge_topk_per_query(partial, key=key, k=k, score="cosine",
                               descending=True)
    df["cosine"] = round_half_away(df["cosine"].to_numpy(), 6)
    return df


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

    # this variant ROUNDS before selection (the ivf protocol), so the
    # rounding moves into a stateless map_batches ahead of the merge
    def round6(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("cosine"), "cosine",
            pa.array(round_half_away(t["cosine"].to_numpy(), 6)))

    partial = (emb.select_columns([key, col])
               .map_batches(block, batch_format="pyarrow")
               .map_batches(round6, batch_format="pyarrow"))
    return _merge_topk_per_query(partial, key=key, k=k, score="cosine",
                                 descending=True)


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


# ----------------------------------------------------------------------
# k-nearest-neighbor graph (embedding clustering substrate)
# ----------------------------------------------------------------------


def knn_graph(
    emb: ray.data.Dataset,
    *,
    k: int = 5,
    key: str = "vec_id",
    col: str = "embedding",
    broadcast_limit: int = 200_000,
    chunk_cols: int = 65_536,
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 42,
) -> ray.data.Dataset:
    """Cosine k-nearest-neighbor graph over an embedding column →
    ``(src, dst, cosine, rank)`` edge Dataset — the substrate for
    kNN-graph clustering (WCC over it = single-link clusters truncated
    at top-k; see the ``emb_knn_wcc`` driver pipeline, which feeds the
    edges straight into the BSP graph engine).

    Exact path (≤ ``broadcast_limit`` vectors): the id-sorted
    normalized matrix is ``ray.put`` ONCE; each batch runs one
    (B×D)·(D×N) matmul per ``chunk_cols`` candidate block with a
    running top-k merge — no shuffle at all, temporaries stay
    ≤ B×chunk_cols (first-touch-fault-friendly; see BASELINE.md), and
    only N·k edge rows come out. Ranking is by 6-dp-rounded cosine
    then lower dst id (both sides of the SQL twin, so near-ties can't
    flip the oracle). Self edges are excluded.

    Above the limit it warns and routes to random-hyperplane LSH
    bucketing with exact within-bucket rerank (approximate — recall
    < 1 by design; a vector's k list may miss true neighbors that
    share no bucket), the same scale shape as lsh_ann_topk: nothing
    ever materializes N×N."""
    n_total = emb.count()
    if n_total > broadcast_limit:
        import warnings
        warnings.warn(
            f"knn_graph: {n_total} vectors exceed broadcast_limit "
            f"({broadcast_limit}); routing to LSH-bucketed approximate "
            "kNN (recall < 1 by design)", stacklevel=2)
        return _knn_graph_lsh(emb, k=k, key=key, col=col,
                              num_planes=num_planes,
                              num_tables=num_tables, seed=seed)

    side = emb.select_columns([key, col]).to_pandas()
    all_ids = side[key].to_numpy()
    order = np.argsort(all_ids, kind="stable")
    all_ids = all_ids[order]
    all_mat = _normalize(np.stack(side[col].to_numpy()).astype(
        np.float64))[order]
    ref = ray.put((all_ids, all_mat))

    def block(t: pa.Table) -> pa.Table:
        ids_s, mat_s = ray.get(ref)
        n = len(ids_s)
        ids = t[key].to_numpy()
        m = _normalize(np.stack(t[col].to_numpy(
            zero_copy_only=False)).astype(np.float64))
        kk = min(k, n - 1)
        if kk <= 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64()),
                             "rank": pa.array([], pa.int64())})
        from graphscope_ray.util import round_half_away
        self_pos = np.searchsorted(ids_s, ids)  # column of each row's self
        cand_sc, cand_j = [], []
        for lo in range(0, n, chunk_cols):
            hi = min(lo + chunk_cols, n)
            ikey = np.rint(round_half_away(m @ mat_s[lo:hi].T, 6)
                           * 1e6).astype(np.int64)
            # composite int64 key: rounded-cosine desc, then position
            # (== id order: mat_s is id-sorted) asc; unique per column
            sc = ikey * np.int64(n) + np.int64(n - 1) - np.arange(
                lo, hi, dtype=np.int64)
            sm = (self_pos >= lo) & (self_pos < hi)
            # min+1, not min: argpartition works on -sc and -INT64_MIN
            # wraps back to INT64_MIN, which would rank the self FIRST
            sc[np.flatnonzero(sm), self_pos[sm] - lo] = np.int64(
                np.iinfo(np.int64).min + 1)
            cc = min(kk, hi - lo)
            part = np.argpartition(-sc, cc - 1, axis=1)[:, :cc]
            cand_sc.append(np.take_along_axis(sc, part, axis=1))
            cand_j.append(part + lo)
        sc = np.concatenate(cand_sc, axis=1)
        j = np.concatenate(cand_j, axis=1)
        top = np.argpartition(-sc, kk - 1, axis=1)[:, :kk]
        sc = np.take_along_axis(sc, top, axis=1)
        j = np.take_along_axis(j, top, axis=1)
        ord2 = np.argsort(-sc, axis=1)  # exact order within the k list
        sc = np.take_along_axis(sc, ord2, axis=1)
        j = np.take_along_axis(j, ord2, axis=1)
        cos = (sc - (np.int64(n - 1) - j)) / np.int64(n) / 1e6
        return pa.table({
            "src": pa.array(np.repeat(ids, kk)),
            "dst": pa.array(ids_s[j.ravel()]),
            "cosine": pa.array(cos.ravel()),
            "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int64),
                                     len(ids))),
        })

    return emb.select_columns([key, col]).map_batches(
        block, batch_format="pyarrow")


def _knn_graph_lsh(emb: ray.data.Dataset, *, k, key, col, num_planes,
                   num_tables, seed) -> ray.data.Dataset:
    """Approximate kNN-graph scale route: every vector lands in
    ``num_tables`` hyperplane buckets; one coarse-bucket vectorized
    kernel emits within-bucket top-k candidates per src; a final
    groupby(src % 32) kernel merges table candidates to the global
    top-k. Only candidate edges (≤ N·k·num_tables rows) shuffle."""
    from graphscope_ray.util import round_half_away
    rng = np.random.default_rng(seed)
    # dim probed from one row (cheap: a single-block take)
    d = len(emb.take(1)[0][col])
    planes = rng.standard_normal((num_tables, num_planes, d))
    pref = ray.put(planes)
    powers = (1 << np.arange(num_planes)).astype(np.int64)

    def bucketize(t: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        ids = t[key].to_numpy()
        m = _normalize(np.stack(t[col].to_numpy(
            zero_copy_only=False)).astype(np.float64))
        out = []
        for table in range(num_tables):
            s = (((m @ pl[table].T) > 0).astype(np.int64) @ powers)
            out.append(pd.DataFrame({
                key: ids, "bucket": s * num_tables + table,
                col: list(m)}))
        df = pd.concat(out, ignore_index=True)
        df["_cb"] = np.mod(df["bucket"].to_numpy(), 32).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    bucketed = emb.select_columns([key, col]).map_batches(
        bucketize, batch_format="pyarrow")

    empty = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                          "dst": pd.Series([], dtype="int64"),
                          "cosine": pd.Series([], dtype="float64")})

    def within_bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty.copy()
        bk = g["bucket"].to_numpy()
        ids = g[key].to_numpy()
        mat = np.stack(g[col].to_numpy())
        order = np.lexsort((ids, bk))
        bk, ids, mat = bk[order], ids[order], mat[order]
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], len(bk)]
        srcs, dsts, coss = [], [], []
        for lo, hi in zip(starts, ends):
            m = hi - lo
            if m < 2:
                continue
            sims = round_half_away(mat[lo:hi] @ mat[lo:hi].T, 6)
            np.fill_diagonal(sims, -np.inf)
            kk = min(k, m - 1)
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            srcs.append(np.repeat(ids[lo:hi], kk))
            dsts.append(ids[lo:hi][part.ravel()])
            coss.append(np.take_along_axis(sims, part, axis=1).ravel())
        if not srcs:
            return empty.copy()
        return pd.DataFrame({"src": np.concatenate(srcs),
                             "dst": np.concatenate(dsts),
                             "cosine": np.concatenate(coss)})

    cand = bucketed.groupby("_cb").map_groups(
        within_bucket_topk, batch_format="pandas")

    def add_sb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_sb"] = np.mod(df["src"].to_numpy(), 32).astype(np.int64)
        return df

    def merge_per_src(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return empty.assign(rank=pd.Series([], dtype="int64"))
        g = g.drop_duplicates(subset=["src", "dst"])
        g = g.sort_values(["src", "cosine", "dst"],
                          ascending=[True, False, True])
        r = g.groupby("src", sort=False).cumcount()
        g = g[r < k].reset_index(drop=True)
        g["rank"] = (g.groupby("src", sort=False).cumcount()
                     + 1).astype(np.int64)
        return g[["src", "dst", "cosine", "rank"]]

    return cand.map_batches(add_sb, batch_format="pandas") \
        .groupby("_sb").map_groups(merge_per_src, batch_format="pandas")


def _kmeans_centroids(
    emb: ray.data.Dataset,
    *,
    k: int,
    iters: int,
    key: str,
    col: str,
) -> np.ndarray:
    """Lloyd's centroid iteration shared by :func:`kmeans_assign` and
    :func:`semantic_dedup` — init = vectors of the k smallest ids;
    per-batch partial (cluster, count, vecsum) rows reduce on the
    driver (O(k × #blocks), never the embeddings)."""
    from graphscope_ray.util import round_half_away

    init = emb.select_columns([key, col]).sort(key).limit(k).to_pandas()
    cents = np.stack(init[col].to_numpy()).astype(np.float64)

    def partials_fn(ref):
        def f(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = np.stack(
                t[col].to_numpy(zero_copy_only=False)).astype(np.float64)
            d = round_half_away(np.sqrt(_sq_dists(m, c)), 6)
            assign = np.argmin(d, axis=1)  # first min = smallest cid
            uc, inv = np.unique(assign, return_inverse=True)
            cnt = np.bincount(inv)
            sums = np.zeros((len(uc), m.shape[1]))
            np.add.at(sums, inv, m)
            return pa.table({
                "cluster": pa.array(uc.astype(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
                "vecsum": pa.array(list(sums)),
            })
        return f

    for _ in range(iters - 1):
        ref = ray.put(cents)
        part = emb.select_columns([key, col]).map_batches(
            partials_fn(ref), batch_format="pyarrow").to_pandas()
        cnt = np.zeros(k)
        sums = np.zeros_like(cents)
        for cl, n, v in zip(part["cluster"], part["cnt"], part["vecsum"]):
            cnt[cl] += n
            sums[cl] += np.asarray(v, dtype=np.float64)
        live = cnt > 0
        cents = cents.copy()
        cents[live] = sums[live] / cnt[live, None]
    return cents


def kmeans_assign(
    emb: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 2,
    key: str = "vec_id",
    col: str = "embedding",
) -> ray.data.Dataset:
    """Distributed Lloyd's k-means → final ``(key, cluster)`` rows.

    Reference-class op for embedding-corpus curation (cluster-balanced
    sampling / dedup). Deterministic end to end so a DuckDB twin can
    replay it: initial centroids are the vectors of the ``k`` smallest
    ids; assignment = argmin Euclidean distance **rounded half-away to
    6 dp**, ties → smallest centroid id (the same ulp-tie protocol as
    ``ivf_ann_topk``); empty clusters keep their previous centroid.

    100 TB shape: centroids (k×D floats) are broadcast via ``ray.put``
    each iteration; each batch emits one partial ``(cluster, count,
    vecsum)`` row per non-empty cluster, so the per-iteration reduce
    moves O(k × #blocks) rows to the driver — never the embeddings.
    """
    from graphscope_ray.util import round_half_away

    cents = _kmeans_centroids(emb, k=k, iters=iters, key=key, col=col)
    ref = ray.put(cents)

    def assign_final(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = np.stack(
            t[col].to_numpy(zero_copy_only=False)).astype(np.float64)
        d = round_half_away(np.sqrt(_sq_dists(m, c)), 6)
        return pa.table({
            key: t[key],
            "cluster": pa.array(np.argmin(d, axis=1).astype(np.int64)),
        })

    return emb.select_columns([key, col]).map_batches(
        assign_final, batch_format="pyarrow").sort(key)


def semantic_dedup(
    emb: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.3,
    key: str = "vec_id",
    col: str = "embedding",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication", arXiv:2303.09540):
    k-means-cluster the embeddings, then compare pairs ONLY within a
    cluster — per-cluster pairwise cosine instead of the corpus-wide
    all-pairs matmul. Returns ``(key, cluster, keep)`` per vector:
    ``keep`` is False iff the vector is the LARGER id of some
    in-cluster pair with rounded-6dp cosine >= threshold (so each
    near-dup group keeps its smallest id — the repo's exact-dedup
    convention).

    100 TB shape: one kmeans pass (broadcast centroids, partial-sum
    reduce), one shuffle of (id, vec, cluster) grouped by
    ``cluster % num_buckets`` — the coarse-bucket pattern, so dispatch
    stays O(num_buckets) even at k ~ 1e5 — then one vectorized matmul
    per cluster slice inside the bucket kernel. Pair cost is
    sum_c |c|^2, not n^2; the embeddings never land on the driver.
    Deterministic end to end (kmeans protocol above + rounded
    threshold compare on both engine and SQL sides)."""
    from graphscope_ray.util import round_half_away

    cents = _kmeans_centroids(emb, k=k, iters=iters, key=key, col=col)
    ref = ray.put(cents)

    def assign_with_vec(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = np.stack(
            t[col].to_numpy(zero_copy_only=False)).astype(np.float64)
        d = round_half_away(np.sqrt(_sq_dists(m, c)), 6)
        cl = np.argmin(d, axis=1).astype(np.int64)
        return pa.table({key: t[key], col: t[col],
                         "cluster": pa.array(cl),
                         "_b": pa.array(cl % num_buckets)})

    def bucket_kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cluster", key], kind="stable")
        ids = g[key].to_numpy(dtype=np.int64)
        cl = g["cluster"].to_numpy(dtype=np.int64)
        mat = np.stack(g[col].to_numpy())
        mat = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        keep = np.ones(len(g), dtype=bool)
        bounds = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1], True])
        for a, b in zip(bounds[:-1], bounds[1:]):
            if b - a < 2:
                continue
            sims = round_half_away(mat[a:b] @ mat[a:b].T, 6)
            i, j = np.nonzero(np.triu(sims >= threshold, k=1))
            # ids are sorted within the cluster slice → j is the
            # larger id of each pair
            keep[a + np.unique(j)] = False
        return pd.DataFrame({key: ids, "cluster": cl, "keep": keep})

    return (emb.select_columns([key, col])
            .map_batches(assign_with_vec, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(bucket_kernel, batch_format="pandas"))


def cluster_sample(
    emb: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 2,
    m: int = 10,
    seed: int = 3,
    key: str = "vec_id",
    col: str = "embedding",
) -> ray.data.Dataset:
    """Cluster-balanced (diversity-preserving) sampling: k-means
    assignment, then keep the ``m`` rows of each cluster with the
    smallest ``(fmix64(id·B+seed) % 1e6, id)`` — the embedding-space
    stratified-subset pattern of corpus curation. Deterministic end
    to end; composes kmeans_assign with the per-group top-k trim
    (curate.topk_per_group), so nothing beyond k·m·#blocks rows ever
    moves after assignment."""
    from graphscope_ray.data.curate import _row_hash
    from graphscope_ray.data.curate import topk_per_group

    assign = kmeans_assign(emb, k=k, iters=iters, key=key, col=col)

    def coin(t: pa.Table) -> pa.Table:
        ids = t[key].to_numpy()
        h = (_row_hash(ids, seed) % np.uint64(1_000_000)).astype(np.int64)
        return pa.table({key: t[key], "cluster": t["cluster"],
                         "coin": pa.array(h)})

    scored = assign.map_batches(coin, batch_format="pyarrow")
    return topk_per_group(scored, group="cluster", score="coin",
                          key=key, k=m, descending=False)


def pca_project(ds: ray.data.Dataset, k: int = 8, *,
                col: str = "embedding", key: str = "vec_id",
                whiten: bool = False) -> ray.data.Dataset:
    """Distributed PCA projection of an embedding column → (key,
    ``pca`` list<double> of length k): the dimensionality-reduction /
    whitening front-end for the dedup-and-ANN family (e.g. reduce
    768-dim model embeddings before SemDeDup clustering).

    Shape (100 TB): mean and covariance reduce through ONE native
    ``Dataset.aggregate`` — each block folds into (n, Σx, ΣxᵀX)
    accumulators of d + d² floats, so only KB-scale state ever moves
    and the embeddings themselves never shuffle. The d×d eigh runs on
    the driver (d is the model dim, thousands at most); components
    broadcast once and each batch projects with one matmul.

    Deterministic sign convention: each component is flipped so its
    largest-|coefficient| entry is positive (numpy eigh sign is
    otherwise arbitrary). Components are ordered by DESCENDING
    eigenvalue."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc, block):
        if isinstance(block, pa.Table):
            m = np.stack(block[col].to_numpy(zero_copy_only=False))
        else:
            m = np.stack(block[col].to_numpy())
        m = m.astype(np.float64, copy=False)
        n, s, ss = acc
        return (n + len(m), s + m.sum(axis=0), ss + m.T @ m)

    agg = AggregateFn(
        init=lambda _: (0, 0.0, 0.0),
        merge=lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
        accumulate_block=accumulate_block,
        name="pca_moments",
    )
    n, s, ss = ds.aggregate(agg)["pca_moments"]
    if n == 0:
        raise ValueError("pca_project needs a non-empty dataset")
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)       # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]                  # (d, k)
    lam = np.maximum(evals[order], 1e-12)
    # deterministic sign: largest-|coeff| entry of each component > 0
    flip = np.sign(comps[np.abs(comps).argmax(axis=0),
                         np.arange(comps.shape[1])])
    comps = comps * np.where(flip == 0, 1.0, flip)
    if whiten:
        comps = comps / np.sqrt(lam)
    ref = ray.put((mean, comps))

    def project(t: pa.Table) -> pa.Table:
        mean_, comps_ = ray.get(ref)
        m = np.stack(t[col].to_numpy(zero_copy_only=False)).astype(
            np.float64, copy=False)
        p = (m - mean_) @ comps_
        return pa.table({key: t[key],
                         "pca": pa.array(list(p))})

    return ds.map_batches(project, batch_format="pyarrow")


def pq_train(emb: ray.data.Dataset, *, m: int = 4, k: int = 16,
             iters: int = 2, key: str = "vec_id",
             col: str = "embedding",
             normalize: bool = True) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al. 2011): split
    the (normalized) embedding space into ``m`` contiguous subspaces
    and run the shared Lloyd's loop (:func:`_kmeans_centroids` — same
    smallest-id init and rounded-argmin tie protocol) in each.
    Returns ``(m, k, d/m)`` float64 codebooks.

    Shape: m sequential kmeans runs, each the usual broadcast-centroid
    + per-batch partial-sum pass — embeddings never shuffle and the
    driver only sees O(m·k·d/m) = O(k·d) floats."""

    def slicer(j: int, lo: int, hi: int):
        def f(t: pa.Table) -> pa.Table:
            mat = np.stack(t[col].to_numpy(zero_copy_only=False))
            if normalize:
                mat = _normalize(mat)
            return pa.table({key: t[key],
                             col: pa.array(list(mat[:, lo:hi]))})
        return f

    first = emb.select_columns([col]).limit(1).to_pandas()
    d = len(first[col].iloc[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = np.zeros((m, k, sub))
    for j in range(m):
        ds_j = emb.select_columns([key, col]).map_batches(
            slicer(j, j * sub, (j + 1) * sub), batch_format="pyarrow")
        books[j] = _kmeans_centroids(ds_j, k=k, iters=iters,
                                     key=key, col=col)
    return books


def pq_encode(emb: ray.data.Dataset, codebooks: np.ndarray, *,
              key: str = "vec_id", col: str = "embedding",
              normalize: bool = True) -> ray.data.Dataset:
    """Encode each (normalized) embedding to ``m`` uint8 codes —
    the 100 TB compression path (d float64 → m bytes per vector;
    e.g. 768-dim → 8 bytes at m=8). One broadcast of the codebooks,
    per-batch argmin per subspace (rounded-argmin tie protocol shared
    with kmeans_assign). → (key, codes list<uint8>)."""
    from graphscope_ray.util import round_half_away
    m, k, sub = codebooks.shape
    ref = ray.put(codebooks)

    def enc(t: pa.Table) -> pa.Table:
        books = ray.get(ref)
        mat = np.stack(t[col].to_numpy(zero_copy_only=False))
        if normalize:
            mat = _normalize(mat)
        codes = np.zeros((len(mat), m), dtype=np.uint8)
        for j in range(m):
            seg = mat[:, j * sub:(j + 1) * sub]
            dist = round_half_away(np.sqrt(
                _sq_dists(seg, books[j])), 6)
            codes[:, j] = np.argmin(dist, axis=1).astype(np.uint8)
        return pa.table({key: t[key], "codes": pa.array(list(codes))})

    return emb.select_columns([key, col]).map_batches(
        enc, batch_format="pyarrow")


def pq_ann_topk(codes_ds: ray.data.Dataset, queries: np.ndarray,
                codebooks: np.ndarray, *, k: int = 10,
                key: str = "vec_id") -> pd.DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC)
    over PQ codes: per query, an ``(m, k_codes)`` lookup table of
    squared subspace distances (computed once, broadcast), then each
    batch scores B vectors with m table GATHERS — no original
    embeddings are read at query time. Vectors were normalized at
    encode time, so L2² ranks identically to cosine;
    ``approx_cosine = 1 − dist²/2`` is reported. →
    (query_id, vec_id, approx_cosine, rank), deterministic
    (rounded distances, smallest-id tie-break)."""
    from graphscope_ray.util import round_half_away
    m, kc, sub = codebooks.shape
    q = _normalize(np.asarray(queries, dtype=np.float64))
    # (Q, m, kc) squared-distance tables
    tables = np.zeros((len(q), m, kc))
    for j in range(m):
        seg = q[:, j * sub:(j + 1) * sub]
        tables[:, j, :] = ((seg[:, None, :]
                            - codebooks[j][None, :, :]) ** 2).sum(-1)
    ref = ray.put(tables)

    def block(t: pa.Table) -> pa.Table:
        tab = ray.get(ref)  # Q × m × kc
        ids = t[key].to_numpy()
        codes = np.stack(t["codes"].to_numpy(zero_copy_only=False))
        nq = tab.shape[0]
        # dist2[b, q] = Σ_j tab[q, j, codes[b, j]]
        d2 = np.zeros((len(ids), nq))
        for j in range(m):
            d2 += tab[:, j, :][:, codes[:, j]].T  # B × Q
        d2 = round_half_away(d2, 6)
        kk = min(k, len(ids))
        part = np.argpartition(d2, kk - 1, axis=0)[:kk]  # kk × Q
        qi = np.repeat(np.arange(nq), kk)
        vi = part.T.ravel()
        return pa.table({
            "query_id": pa.array(qi.astype(np.int64)),
            key: pa.array(ids[vi]),
            "_d2": pa.array(d2[vi, qi]),
        })

    partial = codes_ds.map_batches(block, batch_format="pyarrow")
    # _d2 was rounded in the block kernel; select ascending on it
    df = _merge_topk_per_query(partial, key=key, k=k, score="_d2",
                               descending=False)
    df["approx_cosine"] = round_half_away(
        1.0 - df["_d2"].to_numpy() / 2.0, 6)
    return (df.drop(columns=["_d2"])
            [["query_id", key, "approx_cosine", "rank"]])


def ivf_pq_index(emb: ray.data.Dataset, *, num_centroids: int = 8,
                 coarse_iters: int = 2, m: int = 4, k_codes: int = 16,
                 pq_iters: int = 2, key: str = "vec_id",
                 col: str = "embedding"):
    """Build an IVF-PQ index (Jégou et al. 2011 — THE billion-scale
    ANN shape): coarse quantizer (Lloyd's over the normalized
    vectors) routes each vector to an inverted list; the RESIDUAL
    ``x̂ − c_list`` is product-quantized to ``m`` uint8 codes.

    Returns ``(coarse_centroids (K, d), codebooks (m, k, d/m),
    codes_ds)`` with ``codes_ds = (key, list_id, codes)`` — the only
    per-vector state a query ever touches is m+8-ish bytes.

    Shape: coarse training is the shared broadcast-centroid partial-
    sum loop; residuals are a stateless map_batches (never
    materialized — pq_train streams them twice, encode once more);
    assignment ties break toward the lower list id on 6-dp-rounded
    similarity (the ivf_ann_topk protocol)."""
    from graphscope_ray.util import round_half_away

    base = emb.select_columns([key, col])

    def norm_fn(t: pa.Table) -> pa.Table:
        mat = _normalize(np.stack(t[col].to_numpy(zero_copy_only=False)))
        return pa.table({key: t[key], col: pa.array(list(mat))})

    normed = base.map_batches(norm_fn, batch_format="pyarrow")
    C = _normalize(_kmeans_centroids(normed, k=num_centroids,
                                     iters=coarse_iters, key=key,
                                     col=col))
    cref = ray.put(C)

    def residual(t: pa.Table) -> pa.Table:
        C_ = ray.get(cref)
        mat = _normalize(np.stack(t[col].to_numpy(zero_copy_only=False)))
        lid = np.argmax(round_half_away(mat @ C_.T, 6), axis=1)
        return pa.table({key: t[key],
                         "list_id": pa.array(lid.astype(np.int64)),
                         col: pa.array(list(mat - C_[lid]))})

    res = base.map_batches(residual, batch_format="pyarrow")
    books = pq_train(res, m=m, k=k_codes, iters=pq_iters, key=key,
                     col=col, normalize=False)
    codes = pq_encode(res, books, key=key, col=col, normalize=False)
    from graphscope_ray.graph.joins import attach_values
    codes_ds = attach_values(
        codes, res.select_columns([key, "list_id"]), on=key,
        table_key=key, value_names=["list_id"])
    return C, books, codes_ds.materialize()


def ivf_pq_ann_topk(codes_ds: ray.data.Dataset, queries: np.ndarray,
                    coarse_centroids: np.ndarray,
                    codebooks: np.ndarray, *, k: int = 10,
                    nprobe: int = 2, key: str = "vec_id"
                    ) -> pd.DataFrame:
    """Query an :func:`ivf_pq_index`: each query probes its ``nprobe``
    nearest inverted lists and scores ONLY their members by ADC over
    the residual codes — ``d²(q̂, x) ≈ Σ_j tab[list, j, code_j]`` with
    ``tab[l, j] = ||（q̂−c_l)_j − codeword||²`` (one (Q, nprobe, m, k)
    table, broadcast once; the original embeddings are never read).
    → (query_id, vec_id, approx_cosine, rank), deterministic."""
    from graphscope_ray.util import round_half_away
    m, kc, sub = codebooks.shape
    C = _normalize(np.asarray(coarse_centroids, dtype=np.float64))
    K = C.shape[0]
    q = _normalize(np.asarray(queries, dtype=np.float64))
    nq = len(q)
    qc = round_half_away(q @ C.T, 6)
    probe = np.full((nq, K), False)
    tabs = np.zeros((nq, K, m, kc))  # only probed (qi, l) slots filled
    for qi in range(nq):
        idx = np.lexsort((np.arange(K), -qc[qi]))[:nprobe]
        probe[qi, idx] = True
        for l in idx:
            r = q[qi] - C[l]
            for j in range(m):
                seg = r[j * sub:(j + 1) * sub]
                tabs[qi, l, j, :] = ((seg[None, :]
                                      - codebooks[j]) ** 2).sum(-1)
    ref = ray.put((probe, tabs))

    def block(t: pa.Table) -> pa.Table:
        pr, tb = ray.get(ref)
        ids = t[key].to_numpy()
        lids = t["list_id"].to_numpy()
        codes = np.stack(t["codes"].to_numpy(zero_copy_only=False))
        out_q, out_i, out_d = [], [], []
        for qi in range(pr.shape[0]):
            mask = pr[qi, lids]
            if not mask.any():
                continue
            sel_ids = ids[mask]
            sel_l = lids[mask]
            sel_c = codes[mask]
            d2 = np.zeros(len(sel_ids))
            for j in range(m):
                d2 += tb[qi, sel_l, j, sel_c[:, j]]
            d2 = round_half_away(d2, 6)
            kk = min(k, len(sel_ids))
            part = np.argpartition(d2, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_i.append(sel_ids[part])
            out_d.append(d2[part])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             key: pa.array([], pa.int64()),
                             "_d2": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            key: pa.array(np.concatenate(out_i)),
            "_d2": pa.array(np.concatenate(out_d))})

    partial = codes_ds.map_batches(block, batch_format="pyarrow")
    # _d2 was rounded in the block kernel; select ascending on it
    df = _merge_topk_per_query(partial, key=key, k=k, score="_d2",
                               descending=False)
    df["approx_cosine"] = round_half_away(
        1.0 - df["_d2"].to_numpy() / 2.0, 6)
    return (df.drop(columns=["_d2"])
            [["query_id", key, "approx_cosine", "rank"]])


def range_search(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    *,
    threshold: float = 0.8,
    key: str = "vec_id",
    col: str = "embedding",
) -> ray.data.Dataset:
    """Cosine RANGE search — all vectors with round6(cosine) ≥
    ``threshold`` per query (the radius sibling of :func:`ann_topk`,
    the shape dedup-audit / recall-eval jobs need when k is unknown).

    Fully streaming: one broadcast of the normalized query matrix
    (``ray.put``), a per-batch matmul + rounded-threshold filter —
    no merge stage, no top-k state, nothing but hit rows ever leaves
    a worker. The threshold compares the ROUNDED similarity on both
    engine and SQL sides, so the decision boundary is shared
    (oracle_sql round6 convention). → (query_id, vec_id, cosine)."""
    from graphscope_ray.util import round_half_away

    q = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put(q)

    def block(t: pa.Table) -> pa.Table:
        qm = ray.get(ref)
        ids = t[key].to_numpy()
        m = _normalize(np.stack(t[col].to_numpy(zero_copy_only=False)))
        sims = round_half_away(m @ qm.T, 6)  # B × Q
        vi, qi = np.nonzero(sims >= threshold)
        return pa.table({
            "query_id": pa.array(qi.astype(np.int64)),
            key: pa.array(ids[vi]),
            "cosine": pa.array(sims[vi, qi]),
        })

    return emb.select_columns([key, col]).map_batches(
        block, batch_format="pyarrow")


def mmr_select(
    emb: ray.data.Dataset,
    query: np.ndarray,
    *,
    k: int = 5,
    lam: float = 0.7,
    fetch: int | None = None,
    key: str = "vec_id",
    col: str = "embedding",
) -> pa.Table:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick ``k`` vectors maximizing

        score = round(λ·cos6(q, v) − (1−λ)·max_{s∈S} cos6(v, s), 6)

    (cos6 = cosine rounded to 6 dp — the repo-wide ANN protocol, so
    the DuckDB twin's ``round(list_cosine_similarity(..), 6)``
    arithmetic replays the greedy decisions bit-for-bit; ties break on
    ascending ``key``). Rank 1 is the plain top-cosine pick (empty
    diversity term).

    100 TB shape: ``fetch`` bounds the candidate pool — one
    distributed pass computes per-batch partial top-``fetch`` by
    query cosine (combiner) and only that pool (ids + vectors,
    fetch·D floats) reaches the driver for the O(k·fetch·D) greedy
    loop; ``fetch=None`` pulls every vector and is gated to small
    inputs by the caller."""
    from graphscope_ray.util import round_half_away

    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))
    ref = ray.put(q[0])

    def block(t: pa.Table) -> pa.Table:
        qv = ray.get(ref)
        ids = t[key].to_numpy()
        m = _normalize(np.stack(t[col].to_numpy(zero_copy_only=False)))
        qc = round_half_away(m @ qv, 6)
        if fetch is not None and len(ids) > fetch:
            # per-batch partial top-fetch (rounded-cos, id tiebreak)
            order = np.lexsort((ids, -qc))[:fetch]
            ids, m, qc = ids[order], m[order], qc[order]
        return pa.table({key: pa.array(ids), "_qc": pa.array(qc),
                         "_emb": pa.array(list(m))})

    pool = emb.select_columns([key, col]).map_batches(
        block, batch_format="pyarrow").to_pandas()
    if fetch is not None and len(pool) > fetch:
        pool = pool.sort_values([ "_qc", key],
                                ascending=[False, True],
                                kind="stable").head(fetch)
    ids = pool[key].to_numpy()
    qc = pool["_qc"].to_numpy()
    mat = np.stack(pool["_emb"].to_numpy())

    sel_idx: list = []
    out_rows = []
    taken = np.zeros(len(ids), dtype=bool)
    for rank in range(1, min(k, len(ids)) + 1):
        if sel_idx:
            pair = round_half_away(mat @ mat[sel_idx].T, 6)
            div = pair.max(axis=1)
            score = round_half_away(lam * qc - (1.0 - lam) * div, 6)
        else:
            score = round_half_away(lam * qc, 6)
        score_m = np.where(taken, -np.inf, score)
        # argmax with ascending-id tiebreak
        best = np.lexsort((ids, -score_m))[0]
        taken[best] = True
        sel_idx.append(best)
        out_rows.append((rank, ids[best], score_m[best]))
    return pa.table({
        "rank": pa.array([r for r, _, _ in out_rows], pa.int64()),
        key: pa.array([i for _, i, _ in out_rows]),
        "score": pa.array([round_half_away(s, 6)
                           for _, _, s in out_rows], pa.float64()),
    })
