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
    """All unordered path pairs within one (repo, commit) group.

    Paths are deduped and sorted so output is deterministic; groups
    larger than ``max_fanout`` are truncated (documented cap: a commit
    touching k files contributes C(min(k, max_fanout), 2) pairs)."""
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


def derive_edges(
    corpus: ray.data.Dataset,
    *,
    max_fanout: int = 256,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Corpus ``(repo, path, commit, ...)`` → undirected weighted edge
    table ``(src: string, dst: string, weight: int64)`` with src < dst.

    Stages: column-pruned distinct occurrences → per-(repo, commit)
    pair expansion (``map_groups``) → per-batch partial counts →
    global ``groupby(src, dst).sum`` (small after pre-aggregation).
    """
    occ = corpus.select_columns(["repo", "path", "commit"])

    pairs = occ.groupby(["repo", "commit"]).map_groups(
        lambda g: _pairs_of_group(g, max_fanout), batch_format="pandas"
    )

    # Combiner: collapse duplicate pairs within each batch before the
    # all-to-all groupby shuffle.
    def partial_count(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby(["src", "dst"], sort=False).size().reset_index(name="weight")
        return pa.Table.from_pandas(out, preserve_index=False)

    partial = pairs.map_batches(partial_count, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    edges = partial.groupby(["src", "dst"]).aggregate(Sum("weight", alias_name="weight"))
    return edges


def corpus_vertices(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct file vertices ``(oid, repo, path)``."""

    def add_oid(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        oid = pc.binary_join_element_wise(batch["repo"], batch["path"], "::")
        return batch.append_column("oid", oid)

    occ = corpus.select_columns(["repo", "path"])
    occ = occ.map_batches(add_oid, batch_format="pyarrow")
    # distinct via per-batch drop_duplicates (combiner) + a min-aggregate
    # groupby — repo/path are functions of oid, so Min reproduces them
    # exactly without a per-group pandas callable (r01 VERDICT minor)
    from ray.data.aggregate import Min

    def local_distinct(t: pa.Table) -> pa.Table:
        import numpy as np
        oids = t["oid"].to_numpy(zero_copy_only=False)
        _, first = np.unique(oids, return_index=True)
        return t.take(np.sort(first))

    occ = occ.map_batches(local_distinct, batch_format="pyarrow")
    return (occ.groupby("oid")
            .aggregate(Min("repo", alias_name="repo"),
                       Min("path", alias_name="path")))
