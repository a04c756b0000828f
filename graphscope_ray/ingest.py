"""Corpus ingest: content-sha256 row invariant + co-occurrence edge derivation.

Mirrors the reference's load path in spirit (GraphScope derives graphs
from external tables via its loader —
``/root/reference/analytical_engine/core/loader/arrow_fragment_loader.h:51``)
but is expressed Ray-Data-first: ``read_parquet → map_batches(pyarrow)
→ groupby → map_groups → groupby-aggregate``.

Edge derivation rule (FIXTURES.md §2, fixed and itself under test):

- a *file vertex* is a distinct ``(repo, path)`` pair, oid = ``repo ++
  "::" ++ path``;
- an undirected edge connects two files of the same repo that co-occur
  in at least one commit; ``weight`` = number of shared commits;
- pair generation is capped per commit (``max_fanout``) to bound the
  quadratic blowup of giant commits — the cap is a documented skew
  guard, and the per-batch partial-count pre-aggregation keeps the
  final ``groupby(src, dst)`` shuffle small (combiner pattern).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def with_sha256(ds: ray.data.Dataset, column: str = "content") -> ray.data.Dataset:
    """Append ``content_sha256`` (hex) — the per-row invariant vs the
    reference data. sha256 has no vectorized Arrow kernel; the python
    loop is confined to the hash call itself inside a zero-copy Arrow
    batch."""

    def add_hash(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        hashes = [
            hashlib.sha256(v.encode("utf-8", "surrogatepass")).hexdigest()
            if v is not None
            else None
            for v in col.to_pylist()
        ]
        return batch.append_column("content_sha256", pa.array(hashes, pa.string()))

    return ds.map_batches(add_hash, batch_format="pyarrow")


def _pairs_of_group(g: pd.DataFrame, max_fanout: int) -> pd.DataFrame:
    """All unordered path pairs within one (repo, commit) group — the
    r01 per-group reference kernel, kept as the differential-test twin
    of the fused bucket kernel below (tests/test_ingest.py)."""
    repo = g["repo"].iloc[0]
    paths = np.unique(g["path"].to_numpy())
    if len(paths) > max_fanout:
        paths = paths[:max_fanout]
    n = len(paths)
    if n < 2:
        return pd.DataFrame({"src": pd.Series([], dtype=object),
                             "dst": pd.Series([], dtype=object)})
    i, j = np.triu_indices(n, k=1)
    pre = repo + "::"
    return pd.DataFrame({"src": pre + paths[i], "dst": pre + paths[j]})


def _derive_edges_groupby(
    corpus: ray.data.Dataset,
    *,
    max_fanout: int = 256,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """r01 derivation shape (multi-column groupby + per-(repo, commit)
    map_groups + Sum aggregate): four exchanges, a Python callable per
    commit group. Superseded by the fused two-exchange ``derive_edges``
    (measured ~2.0× faster at sf0.1 in an interleaved in-window A/B,
    BASELINE.md round-2 addendum); retained as the property-test twin."""
    occ = corpus.select_columns(["repo", "path", "commit"])

    pairs = occ.groupby(["repo", "commit"]).map_groups(
        lambda g: _pairs_of_group(g, max_fanout), batch_format="pandas"
    )

    def partial_count(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby(["src", "dst"], sort=False).size().reset_index(name="weight")
        return pa.Table.from_pandas(out, preserve_index=False)

    partial = pairs.map_batches(partial_count, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    edges = partial.groupby(["src", "dst"]).aggregate(Sum("weight", alias_name="weight"))
    return edges


def _bucket_pairs(g: pd.DataFrame, max_fanout: int) -> pd.DataFrame:
    """One commit-bucket's fused kernel (string-key port of
    pipelines/partgraph.pairs_in_bucket): dedup (repo, commit, path)
    occurrences, truncate each commit group to its first ``max_fanout``
    sorted paths, expand within-group path pairs, partial-count by
    file-id pair key — one vectorized pass, no Python loop over commits.

    Exactness: string group/dedup boundaries come from lexsort +
    change-point comparisons on the object arrays themselves (no
    separator-concat aliasing); src < dst holds because bucket-local
    file ids are ranks in sorted oid order and every pair is emitted in
    sorted-path order within a same-repo group."""
    empty = pd.DataFrame({"src": pd.Series([], dtype=object),
                          "dst": pd.Series([], dtype=object),
                          "_w": pd.Series([], dtype=np.int64)})
    if not len(g):
        return empty
    repo = g["repo"].to_numpy()
    commit = g["commit"].to_numpy()
    path = g["path"].to_numpy()
    order = np.lexsort((path, commit, repo))
    repo, commit, path = repo[order], commit[order], path[order]
    dup = np.empty(len(repo), dtype=bool)
    dup[0] = False
    dup[1:] = ((repo[1:] == repo[:-1]) & (commit[1:] == commit[:-1])
               & (path[1:] == path[:-1]))
    repo, commit, path = repo[~dup], commit[~dup], path[~dup]
    new_grp = np.empty(len(repo), dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (repo[1:] != repo[:-1]) | (commit[1:] != commit[:-1])
    grp_start = np.flatnonzero(new_grp)
    counts = np.diff(np.r_[grp_start, len(repo)])
    r = np.arange(len(repo)) - np.repeat(grp_start, counts)
    keep = r < max_fanout  # first max_fanout sorted paths per commit
    repo, path, r = repo[keep], path[keep], r[keep]
    if len(r) == 0:
        return empty
    # bucket-local file ids = rank in sorted oid order (same-repo pairs
    # ⇒ fid order == path order within a group)
    oid = np.asarray(pd.Series(repo, dtype=object) + "::"
                     + pd.Series(path, dtype=object), dtype=object)
    uoid, fid = np.unique(oid, return_inverse=True)
    idx = np.arange(len(r))
    second = np.repeat(idx, r)
    if len(second) == 0:
        return empty
    off = np.cumsum(r) - r  # exclusive prefix of per-element pair counts
    first = (np.arange(len(second)) - np.repeat(off, r)
             + np.repeat(idx - r, r))
    if len(uoid) >= 2**32:
        raise ValueError("exchange partition exceeds 2^32 distinct "
                         "files; raise derive_edges num_partitions")
    key = (fid[first].astype(np.uint64) << np.uint64(32)) | \
        fid[second].astype(np.uint64)
    uk, inv = np.unique(key, return_inverse=True)
    w = np.bincount(inv).astype(np.int64)
    s_id = (uk >> np.uint64(32)).astype(np.int64)
    d_id = (uk & np.uint64(0xFFFFFFFF)).astype(np.int64)
    src, dst = uoid[s_id], uoid[d_id]
    # exchange-2 routing is the caller's job (_task_exchange re-hashes
    # (src, dst) itself — no per-pair bucket column computed here)
    return pd.DataFrame({"src": src, "dst": dst, "_w": w})


def _typed_empty(val_name: str) -> pa.Table:
    """Typed empty pair/edge table (from_pandas on an empty object
    frame yields null-typed columns, which would poison downstream
    schemas)."""
    return pa.table({"src": pa.array([], pa.string()),
                     "dst": pa.array([], pa.string()),
                     val_name: pa.array([], pa.int64())})


@ray.remote
def _split_by_hash(nparts: int, key_cols, *tables):
    """One shuffle-map task: concat its input blocks and split the rows
    into ``nparts`` sub-tables by hash(key_cols) % nparts."""
    parts = [x if isinstance(x, pa.Table)
             else pa.Table.from_pandas(x, preserve_index=False)
             for x in tables if x is not None]
    t = pa.concat_tables(parts, promote_options="default")
    df = t.select(key_cols).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    part = (h % np.uint64(nparts)).astype(np.int64)
    out = tuple(t.filter(pa.array(part == i)) for i in range(nparts))
    # num_returns=1 stores a returned 1-tuple as ONE object — unwrap
    # so reducers always receive plain Tables
    return out[0] if nparts == 1 else out


@ray.remote
def _reduce_pairs(max_fanout: int, *tables) -> pa.Table:
    """One exchange-1 reduce task: all occurrence rows whose
    (repo, commit) hashes here → fused dedup + pair-expand + partial
    count (:func:`_bucket_pairs`)."""
    t = pa.concat_tables(list(tables), promote_options="default")
    out = _bucket_pairs(t.to_pandas(), max_fanout)
    if not len(out):
        return _typed_empty("_w")
    return pa.Table.from_pandas(out, preserve_index=False)


@ray.remote
def _reduce_weights(*tables) -> pa.Table:
    """One exchange-2 reduce task: partial counts of every (src, dst)
    pair that hashes here → one Arrow hash-aggregate sum (the C++
    grouper; measured 1.35× the pandas khash path and ~4× an
    object-array np.lexsort at this row shape — integer sums, so the
    result is bit-identical either way)."""
    t = pa.concat_tables(list(tables), promote_options="default")
    if not t.num_rows:
        return _typed_empty("weight")
    out = t.group_by(["src", "dst"]).aggregate([("_w", "sum")])
    return out.rename_columns(["src", "dst", "weight"])


def _task_exchange(refs, nparts: int, key_cols, reducer, *reducer_args):
    """ONE manual hash exchange: ~2·nparts map tasks (each splits its
    ref chunk by key hash) feeding nparts reduce tasks — the packed
    M×P object-ref exchange the BSP engine uses, applied to edge
    derivation. Dataset.groupby's sort-based all-to-all costs a fixed
    ~2.5-3 s of sample/sort/coordination PER EXCHANGE at any
    parallelism (measured: the two-sort derive took 7.6-9.4 s at 8
    CPUs where this path takes ~4 s, and the gap is
    parallelism-independent — exactly the serial slice that capped
    flagship 2→8 scaling at 0.53). On a multi-node cluster the object
    transfers are the same ones a Dataset shuffle would do; there is
    no driver materialization (refs in, refs out)."""
    k = max(1, (len(refs) + 2 * nparts - 1) // (2 * nparts))
    chunks = [refs[i:i + k] for i in range(0, len(refs), k)]
    outs = [_split_by_hash.options(num_returns=nparts)
            .remote(nparts, key_cols, *c) for c in chunks]
    return _finish_exchange(outs, nparts, reducer, *reducer_args)


def _finish_exchange(outs, nparts: int, reducer, *reducer_args):
    """Wire split-task outputs to one reducer per partition (shared by
    the list-based and streaming exchange fronts)."""
    if nparts == 1:
        outs = [[o] for o in outs]
    cols = list(zip(*outs))
    return [reducer.remote(*reducer_args, *cols[i])
            for i in range(nparts)]


def derive_edges(
    corpus: ray.data.Dataset,
    *,
    max_fanout: int = 256,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Corpus ``(repo, path, commit, ...)`` → undirected weighted edge
    table ``(src: string, dst: string, weight: int64)`` with src < dst.

    Fused two-exchange derivation (r02 VERDICT #2), r04: both
    exchanges are manual task exchanges (:func:`_task_exchange`) —
    (1) co-locate each (repo, commit)'s occurrence rows by key hash,
    fused dedup + within-commit pair expansion + partial count per
    reduce task; (2) co-locate each (src, dst) pair's partials by pair
    hash, sum. ``max_fanout`` truncation (first N sorted paths per
    commit) is the documented skew guard, identical to the r01
    semantics; outputs are bit-identical to the groupby twin
    (tests/test_ingest.py differential)."""
    occ = corpus.select_columns(["repo", "path", "commit"])
    # plain TASK exchange — not Dataset.join's resident shuffle actors
    # — so the actor-deadlock cap (cpus-2) of shuffle_partitions does
    # not apply; one reducer per core keeps the sum stage saturated
    if num_partitions is not None:
        nparts = num_partitions
    else:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else (os.cpu_count() or 8)
        nparts = max(2, min(32, cpus))
    # STREAM the upstream (read + sha + project) into the exchange-1
    # map tasks as blocks land, instead of to_arrow_refs()'s
    # materialize-then-exchange barrier — the upstream pass and the
    # split tasks overlap (measured ~2-4 s of the flagship wall at
    # both 2 and 8 CPUs)
    outs, chunk = [], []
    for bundle in occ.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            chunk.append(ref)
            if len(chunk) >= 4:
                outs.append(_split_by_hash.options(num_returns=nparts)
                            .remote(nparts, ["repo", "commit"], *chunk))
                chunk = []
    if chunk:
        outs.append(_split_by_hash.options(num_returns=nparts)
                    .remote(nparts, ["repo", "commit"], *chunk))
    if not outs:
        # empty corpus (zero blocks): the typed empty edge table the
        # superseded groupby path returned for the same input
        return ray.data.from_arrow(_typed_empty("weight"))
    pair_refs = _finish_exchange(outs, nparts, _reduce_pairs, max_fanout)
    edge_refs = _task_exchange(pair_refs, nparts, ["src", "dst"],
                               _reduce_weights)
    return ray.data.from_arrow_refs(edge_refs)


def corpus_vertices(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct file vertices ``(oid, repo, path)``."""

    def add_oid(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        oid = pc.binary_join_element_wise(batch["repo"], batch["path"], "::")
        return batch.append_column("oid", oid)

    occ = corpus.select_columns(["repo", "path"])
    occ = occ.map_batches(add_oid, batch_format="pyarrow")
    # distinct via per-batch drop_duplicates (combiner) + a bucketed
    # distinct — repo/path are functions of oid, so row-distinct over
    # the triple IS one row per oid (no per-distinct-key aggregate
    # dispatch; see util.bucketed_distinct)
    from graphscope_ray.util import bucketed_distinct

    def local_distinct(t: pa.Table) -> pa.Table:
        import numpy as np
        oids = t["oid"].to_numpy(zero_copy_only=False)
        _, first = np.unique(oids, return_index=True)
        return t.take(np.sort(first))

    occ = occ.map_batches(local_distinct, batch_format="pyarrow")
    return bucketed_distinct(occ, ["oid", "repo", "path"])
